"""OpenMDAO driver with the separable sparse-constraint path (the role of
`paropt/paropt_sparse_driver.py:8-50`).

`ParOptSparseDriver` extends `ParOptDriver`: constraints registered through
``set_sparse_constraints(names)`` are routed to the framework's separable
sparse-constraint path (cw(x) >= 0 with a CSR Jacobian) instead of the dense
``ncon`` block.  The CSR pattern is taken from the constraint's declared
partials sparsity (OpenMDAO's ``compute_totals`` coloring metadata) when
available, and falls back to dense rows otherwise.

This keeps the many per-element constraints of a topology problem (stress
aggregates, local volume bounds, ...) out of the dense Schur complement: the
interior point factors Cw = C0 + Aw·D⁻¹·Awᵀ with the native sparse Cholesky
(`paropt_tpu.ops.sparse_native`) while the few global constraints stay dense.

Requires `openmdao`; importing this module without it raises ImportError.
"""

from __future__ import annotations

import numpy as np

from ..optimizer import Optimizer as _FrameworkOptimizer
from ..problem import CSRSparseProblem
from ..utils.options import make_options
from .openmdao_driver import ParOptDriver, _OpenMDAOProblem


__all__ = ["ParOptSparseDriver"]


class _OpenMDAOSparseProblem(CSRSparseProblem):
    """Adapter presenting an OpenMDAO problem with designated separable
    constraints as a framework `CSRSparseProblem`."""

    def __init__(self, om_prob, driver, sparse_names):
        self.om_prob = om_prob
        self.driver = driver
        # reuse the dense adapter's design-variable bookkeeping
        self._dense = _OpenMDAOProblem.__new__(_OpenMDAOProblem)
        self._dense.om_prob = om_prob
        self._dense.driver = driver
        dv_meta = driver._designvars
        self._dense._dv_names = list(dv_meta)
        sizes = [int(np.prod(dv_meta[n]["size"]
                             if np.ndim(dv_meta[n]["size"]) == 0
                             else dv_meta[n]["size"]))
                 for n in self._dense._dv_names]
        self._dense._sizes = sizes
        nvars = sum(sizes)

        con_meta = driver._cons
        # inequality names first in BOTH groups: the framework convention
        # is that the trailing ncon-ninequality / nwcon-nwinequality
        # constraints are equalities (dymos defect constraints arrive as
        # sparse `equals=` rows)
        sp = [n for n in con_meta if n in sparse_names]
        sp_ineq = [n for n in sp if con_meta[n]["equals"] is None]
        sp_eq = [n for n in sp if con_meta[n]["equals"] is not None]
        self._sparse_names = sp_ineq + sp_eq
        dense_names = [n for n in con_meta if n not in sparse_names]
        ineq = [n for n in dense_names if con_meta[n]["equals"] is None]
        eq = [n for n in dense_names if con_meta[n]["equals"] is not None]
        self._dense._con_names = ineq + eq
        ncon = sum(int(con_meta[n]["size"]) for n in self._dense._con_names)
        nineq = sum(int(con_meta[n]["size"]) for n in ineq)
        nwineq = sum(int(con_meta[n]["size"]) for n in sp_ineq)

        rowp, cols = self._sparse_pattern(nvars)
        super().__init__(nvars=nvars, ncon=ncon, rowp=rowp, cols=cols,
                         ninequality=nineq, nwinequality=nwineq)
        # forward the adapter plumbing used by the dense methods
        self._dense.nvars = nvars
        self._dense.ncon = ncon

    # -- pattern discovery ---------------------------------------------------
    def _sparse_pattern(self, nvars):
        """CSR pattern of the sparse-constraint Jacobian: per-constraint
        declared sparsity when OpenMDAO exposes it, dense rows otherwise."""
        meta = self.driver._cons
        rowp = [0]
        cols = []
        for name in self._sparse_names:
            size = int(meta[name]["size"])
            rows_cols = None
            try:  # total-derivative coloring sparsity, if computed
                coloring = self.driver._coloring_info.coloring
                if coloring is not None:
                    sub = coloring.get_subjac_sparsity()
                    rows_cols = sub.get(name)
            except Exception:
                rows_cols = None
            if rows_cols is None:
                for _ in range(size):
                    cols.extend(range(nvars))
                    rowp.append(len(cols))
            else:
                per_row = [[] for _ in range(size)]
                for _, (r_idx, c_idx, _shape) in rows_cols.items():
                    for r, c in zip(np.atleast_1d(r_idx),
                                    np.atleast_1d(c_idx)):
                        per_row[int(r)].append(int(c))
                for r in range(size):
                    cols.extend(sorted(set(per_row[r])))
                    rowp.append(len(cols))
        return (np.asarray(rowp, dtype=np.int32),
                np.asarray(cols, dtype=np.int32))

    # -- framework Problem surface -------------------------------------------
    def get_vars_and_bounds(self):
        return self._dense.get_vars_and_bounds()

    def eval_obj_con(self, x):
        return self._dense.eval_obj_con(x)

    def eval_obj_con_gradient(self, x):
        return self._dense.eval_obj_con_gradient(x)

    def _sparse_bound_shift(self, name, val):
        m = self.driver._cons[name]
        if m["equals"] is not None:
            return np.atleast_1d(m["equals"]).ravel() - val
        lower = np.atleast_1d(m["lower"]).ravel()
        if np.all(np.isfinite(lower)) and np.any(lower > -1e20):
            return val - lower
        return np.atleast_1d(m["upper"]).ravel() - val

    def eval_sparse_con(self, x):
        import jax.numpy as jnp
        self._dense._scatter_dv(np.asarray(x))
        self.om_prob.run_model()
        cons = self.driver.get_constraint_values()
        rows = [self._sparse_bound_shift(n, np.atleast_1d(cons[n]).ravel())
                for n in self._sparse_names]
        return jnp.asarray(np.concatenate(rows) if rows else np.zeros(0))

    def eval_sparse_jacobian_data(self, x):
        self._dense._scatter_dv(np.asarray(x))
        self.om_prob.run_model()
        totals = self.om_prob.compute_totals(
            of=self._sparse_names, wrt=self._dense._dv_names,
            return_format="array")
        meta = self.driver._cons
        data = np.zeros(self.csr_rowp[-1])
        off_row = 0
        pos = 0
        for name in self._sparse_names:
            size = int(meta[name]["size"])
            sign = 1.0
            if meta[name]["equals"] is not None:
                sign = -1.0
            else:
                lower = np.atleast_1d(meta[name]["lower"]).ravel()
                if not (np.all(np.isfinite(lower))
                        and np.any(lower > -1e20)):
                    sign = -1.0
            for r in range(size):
                row = totals[off_row + r]
                sl = slice(self.csr_rowp[pos], self.csr_rowp[pos + 1])
                data[sl] = sign * row[self.csr_cols[sl]]
                pos += 1
            off_row += size
        return data


class ParOptSparseDriver(ParOptDriver):
    """OpenMDAO driver routing designated constraints through the separable
    sparse path (`paropt_sparse_driver.py` role)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self._sparse_con_names = set()

    def set_sparse_constraints(self, names):
        """Mark OpenMDAO constraint names as separable sparse constraints."""
        self._sparse_con_names = set(names)

    def run(self):
        prob = _OpenMDAOSparseProblem(self._problem(), self,
                                      self._sparse_con_names)
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
        prob._dense._scatter_dv(np.asarray(x))
        self._problem().run_model()
        return not result.get("converged", False)
