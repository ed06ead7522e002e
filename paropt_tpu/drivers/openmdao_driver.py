"""OpenMDAO driver (the role of `paropt/paropt_driver.py`).

`ParOptDriver` subclasses `openmdao.api.Driver`, auto-declares every
framework option from the typed registry (the reference auto-declares ParOpt
options the same way, `paropt_driver.py:51-92`), wraps the OpenMDAO problem
as a framework `Problem`, and runs the selected algorithm.

Requires `openmdao`; importing this module without it raises ImportError.
"""

from __future__ import annotations

import numpy as np
import openmdao.api as om

from ..optimizer import Optimizer as _FrameworkOptimizer
from ..problem import Problem
from ..utils.options import make_options

__all__ = ["ParOptDriver"]


class _OpenMDAOProblem(Problem):
    """Adapter presenting an OpenMDAO problem as a framework Problem
    (`paropt_driver.py` wrapping logic)."""

    def __init__(self, om_prob, driver):
        self.om_prob = om_prob
        self.driver = driver
        dv_meta = driver._designvars
        self._dv_names = list(dv_meta)
        sizes = [int(np.prod(dv_meta[name]["size"]
                             if np.ndim(dv_meta[name]["size"]) == 0
                             else dv_meta[name]["size"]))
                 for name in self._dv_names]
        self._sizes = sizes
        nvars = sum(sizes)
        con_meta = driver._cons
        self._con_names = list(con_meta)
        # order inequalities first (the framework convention)
        ineq = [n for n in self._con_names
                if con_meta[n]["equals"] is None]
        eq = [n for n in self._con_names
              if con_meta[n]["equals"] is not None]
        self._con_names = ineq + eq
        ncon = sum(int(con_meta[n]["size"]) for n in self._con_names)
        nineq = sum(int(con_meta[n]["size"]) for n in ineq)
        super().__init__(nvars=nvars, ncon=ncon, ninequality=nineq)

    def _gather_dv(self):
        vals, lbs, ubs = [], [], []
        meta = self.driver._designvars
        dvs = self.driver.get_design_var_values()
        for name in self._dv_names:
            vals.append(np.atleast_1d(dvs[name]).ravel())
            lbs.append(np.atleast_1d(meta[name]["lower"]).ravel()
                       * np.ones(vals[-1].shape))
            ubs.append(np.atleast_1d(meta[name]["upper"]).ravel()
                       * np.ones(vals[-1].shape))
        return (np.concatenate(vals), np.concatenate(lbs),
                np.concatenate(ubs))

    def _scatter_dv(self, x):
        off = 0
        for name, sz in zip(self._dv_names, self._sizes):
            self.driver.set_design_var(name, x[off:off + sz])
            off += sz

    def get_vars_and_bounds(self):
        import jax.numpy as jnp
        x, lb, ub = self._gather_dv()
        return jnp.asarray(x), jnp.asarray(lb), jnp.asarray(ub)

    def _constraint_values(self):
        meta = self.driver._cons
        cons = self.driver.get_constraint_values()
        rows = []
        for name in self._con_names:
            val = np.atleast_1d(cons[name]).ravel()
            m = meta[name]
            if m["equals"] is not None:
                rows.append(np.atleast_1d(m["equals"]).ravel() - val)
            else:
                lower = np.atleast_1d(m["lower"]).ravel()
                upper = np.atleast_1d(m["upper"]).ravel()
                if np.all(np.isfinite(lower)) and np.any(lower > -1e20):
                    rows.append(val - lower)
                else:
                    rows.append(upper - val)
        return np.concatenate(rows) if rows else np.zeros(0)

    def eval_obj_con(self, x):
        import jax.numpy as jnp
        self._scatter_dv(np.asarray(x))
        self.om_prob.run_model()
        obj = list(self.driver.get_objective_values().values())[0]
        return (jnp.asarray(float(np.atleast_1d(obj)[0])),
                jnp.asarray(self._constraint_values()))

    def eval_obj_con_gradient(self, x):
        import jax.numpy as jnp
        self._scatter_dv(np.asarray(x))
        self.om_prob.run_model()
        obj_name = list(self.driver.get_objective_values())[0]
        totals = self.om_prob.compute_totals(
            of=[obj_name] + self._con_names, wrt=self._dv_names,
            return_format="array")
        g = totals[0]
        meta = self.driver._cons
        A = totals[1:]
        rows = []
        off = 0
        for name in self._con_names:
            sz = int(meta[name]["size"])
            block = A[off:off + sz]
            if meta[name]["equals"] is not None:
                rows.append(-block)
            else:
                lower = np.atleast_1d(meta[name]["lower"]).ravel()
                if np.all(np.isfinite(lower)) and np.any(lower > -1e20):
                    rows.append(block)
                else:
                    rows.append(-block)
            off += sz
        Amat = np.vstack(rows) if rows else np.zeros((0, self.nvars))
        return jnp.asarray(g), jnp.asarray(Amat)


class ParOptDriver(om.Driver):
    """OpenMDAO driver running this framework's optimizers."""

    def _declare_options(self):
        registry = make_options()
        for desc in registry.descriptors():
            kwargs = {"default": desc.default}
            if desc.otype == "enum":
                kwargs["values"] = list(desc.values)
            if desc.doc:
                kwargs["desc"] = desc.doc
            try:
                self.options.declare(desc.name, **kwargs)
            except Exception:
                pass

    def _setup_driver(self, problem):
        super()._setup_driver(problem)
        self.supports["inequality_constraints"] = True
        self.supports["equality_constraints"] = True
        self.supports["two_sided_constraints"] = False

    def run(self):
        prob = _OpenMDAOProblem(self._problem(), self)
        self._paropt_problem = prob
        user_opts = {}
        registry = make_options()
        for name in registry:
            if name in self.options and self.options[name] is not None:
                if self.options[name] != registry[name]:
                    user_opts[name] = self.options[name]
        opt = _FrameworkOptimizer(prob, user_opts)
        result = opt.optimize()
        x, _, _, _, _ = opt.get_optimized_point()
        prob._scatter_dv(np.asarray(x))
        self._problem().run_model()
        return not result.get("converged", False)
