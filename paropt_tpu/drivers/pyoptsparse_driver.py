"""pyOptSparse driver (the role of `paropt/paropt_pyoptsparse.py`).

Registers a `ParOpt` optimizer class with pyOptSparse.  The adapter converts
pyOptSparse's constraint convention to the framework's c(x) >= 0 form by
negating constraint values/Jacobians (`paropt_pyoptsparse.py:74-86`) and
applies the reference's starting-point clipping heuristic (move strictly
inside the bounds by half the average bound gap, `:48-72`).

Requires `pyoptsparse`; importing this module without it raises ImportError.
"""

from __future__ import annotations

import datetime

import numpy as np

from pyoptsparse.pyOpt_optimizer import Optimizer as _PyOptOptimizer
from pyoptsparse.pyOpt_utils import INFINITY

from ..optimizer import Optimizer as _FrameworkOptimizer
from ..problem import Problem
from ..utils.options import make_options

__all__ = ["ParOpt"]


def _clip_start(xs, blx, bux):
    """Starting-point clipping heuristic (`paropt_pyoptsparse.py:48-72`)."""
    n = len(xs)
    bound_sum = 0.0
    for i in range(n):
        if blx[i] <= -INFINITY or bux[i] >= INFINITY:
            bound_sum += 1.0
        else:
            bound_sum += bux[i] - blx[i]
    bound_sum /= n
    x = np.array(xs, dtype=float)
    for i in range(n):
        if xs[i] <= blx[i]:
            x[i] = blx[i] + 0.5 * min(bound_sum, bux[i] - blx[i])
        elif xs[i] >= bux[i]:
            x[i] = bux[i] - 0.5 * min(bound_sum, bux[i] - blx[i])
    return x


class _DenseAdapter(Problem):
    """Wraps pyOptSparse's _masterFunc as a dense-constraint Problem
    (`ParOptDenseProblem`, `paropt_pyoptsparse.py:92-160`)."""

    def __init__(self, ptr, nvars, ncon, ninequality, xs, blx, bux):
        super().__init__(nvars=nvars, ncon=ncon, ninequality=ninequality)
        self.ptr = ptr
        self.xs = xs
        self.blx = blx
        self.bux = bux

    def get_vars_and_bounds(self):
        import jax.numpy as jnp
        return (jnp.asarray(_clip_start(self.xs, self.blx, self.bux)),
                jnp.asarray(self.blx), jnp.asarray(self.bux))

    def eval_obj_con(self, x):
        import jax.numpy as jnp
        fobj, fcon, fail = self.ptr._masterFunc(np.asarray(x),
                                                ["fobj", "fcon"])
        if fail:
            return jnp.asarray(np.nan), jnp.full(self.ncon, np.nan)
        return jnp.asarray(float(fobj)), jnp.asarray(-np.atleast_1d(fcon))

    def eval_obj_con_gradient(self, x):
        import jax.numpy as jnp
        gobj, gcon, fail = self.ptr._masterFunc(np.asarray(x),
                                                ["gobj", "gcon"])
        g = jnp.asarray(np.asarray(gobj).reshape(self.nvars))
        A = jnp.asarray(-np.asarray(gcon).reshape(self.ncon, self.nvars))
        return g, A


class ParOpt(_PyOptOptimizer):
    """pyOptSparse-compatible optimizer class backed by this framework
    (the role of `paropt_pyoptsparse.py:156-430`).

    ``sparse=True`` routes every pyOptSparse constraint through the
    CSR sparse-constraint path (the reference's ParOptSparseProblem leg);
    the default treats them as dense global constraints."""

    def __init__(self, raiseError=True, options={}, sparse=False):
        name = "ParOpt"
        category = "Local Optimizer"
        self.sparse = sparse
        # expose every framework option as a pyoptsparse option
        defOpts = {}
        registry = make_options()
        for desc in registry.descriptors():
            defOpts[desc.name] = [type(desc.default)
                                  if desc.default is not None else str,
                                  desc.default]
        # pyoptsparse requires non-None defaults for these
        defOpts["ip_checkpoint_file"] = [str, "default.out"]
        defOpts["problem_name"] = [str, "problem"]
        if sparse:
            # trust region does not support sparse constraints
            defOpts["algorithm"] = [str, "ip"]
        # explicitly-set options, collected via _on_setOption
        self.set_options = {}
        super().__init__(name, category, defaultOptions=defOpts,
                         informs={}, options=options)
        self.jacType = "csr" if sparse else "dense2d"

    def __call__(self, optProb, sens=None, sensStep=None, sensMode=None,
                 storeHistory=None, hotStart=None, storeSens=True):
        if self.sparse and \
                str(self.set_options.get("algorithm", "ip")).lower() == "tr":
            raise ValueError(
                "Trust region algorithm does not support sparse "
                "constraints; use the interior point or MMA algorithms")
        self.startTime = datetime.datetime.now()
        self.callCounter = 0
        self.storeSens = storeSens

        self.unconstrained = len(optProb.constraints) == 0
        if self.unconstrained:
            # dummy constraint so the problem shape stays uniform
            # (`paropt_pyoptsparse.py:276-280`)
            optProb.dummyConstraint = True
        self.optProb = optProb
        self.optProb.finalize()

        self._setHistory(storeHistory, hotStart)
        self._setInitialCacheValues()
        self._setSens(sens, sensStep, sensMode)
        blx, bux, xs = self._assembleContinuousVariables()
        xs = np.minimum(np.maximum(xs, blx), bux)
        nvars = len(xs)

        if self.unconstrained:
            ncon, nineq = 1, 1
            indices = [0]
        else:
            # INEQUALITIES FIRST — the framework (like the reference)
            # declares the trailing ncon - ninequality constraints as
            # equalities (`paropt_pyoptsparse.py:306-318`)
            ineq, _, _, _ = self.optProb.getOrdering(
                ["ni", "li"], oneSided=True)
            nineq = len(ineq)
            indices, blc, buc, fact = self.optProb.getOrdering(
                ["ni", "li", "ne", "le"], oneSided=True)
            ncon = len(indices)
            self.optProb.jacIndices = indices
            self.optProb.fact = fact
            self.optProb.offset = buc

        if self.sparse and not self.unconstrained:
            # CSR pattern of the ordered constraint Jacobian
            # (`paropt_pyoptsparse.py:324-334`)
            from pyoptsparse.pyOpt_utils import extractRows, IROW, ICOL
            gcon = {}
            for iCon in self.optProb.constraints:
                gcon[iCon] = self.optProb.constraints[iCon].jac
            jac = self.optProb.processConstraintJacobian(gcon)
            jac = extractRows(jac, indices)
            rowp = jac["csr"][IROW]
            cols = jac["csr"][ICOL]
            prob = _SparseAdapter(self, nvars, rowp, cols, nineq, xs, blx,
                                  bux)
        else:
            prob = _DenseAdapter(self, nvars, ncon, nineq, xs, blx, bux)

        registry = make_options()
        user_opts = {k: v for k, v in self.set_options.items()
                     if k in registry}
        opt = _FrameworkOptimizer(prob, user_opts)
        result = opt.optimize()
        x, z, zw, zl, zu = opt.get_optimized_point()

        sol_inform = {"value": int(result.get("converged", False)),
                      "text": result.get("reason", "")}
        xstar = np.asarray(x)
        fobj, fcon, fail = self._masterFunc(xstar, ["fobj", "fcon"])
        opt_time = (datetime.datetime.now() - self.startTime).total_seconds()
        # sign-flipped multipliers: the framework solves c(x) >= 0 while
        # pyOptSparse uses g(x) = -c(x) <= 0 (`paropt_pyoptsparse.py:383-408`)
        mult = zw if self.sparse else z
        multipliers = (-np.asarray(mult) if mult is not None
                       and np.asarray(mult).size else [])
        try:
            sol = self._createSolution(opt_time, sol_inform, fobj, xstar,
                                       multipliers=multipliers)
        except TypeError:  # older pyoptsparse without multipliers kwarg
            sol = self._createSolution(opt_time, sol_inform, fobj, xstar)
        return sol

    def _on_setOption(self, name, value):
        self.set_options[name] = value


class _SparseAdapter(Problem):
    """CSR sparse-constraint adapter (`ParOptSparseProblem` in
    `paropt_pyoptsparse.py:17-90`): every pyOptSparse constraint becomes a
    sparse weighting constraint with the CSR pattern extracted from the
    problem's Jacobian structure."""

    def __init__(self, ptr, nvars, rowp, cols, nwinequality, xs, blx, bux):
        nwcon = len(rowp) - 1
        super().__init__(nvars=nvars, ncon=0, nwcon=nwcon,
                         nwinequality=nwinequality)
        import numpy as _np
        self.ptr = ptr
        self.use_csr_path = True
        self.csr_rowp = _np.asarray(rowp, _np.int32)
        self.csr_cols = _np.asarray(cols, _np.int32)
        counts = _np.diff(self.csr_rowp)
        self._kmax = int(counts.max()) if nwcon else 0
        pad = _np.zeros((nwcon, self._kmax), dtype=_np.int32)
        for i in range(nwcon):
            pad[i, :counts[i]] = self.csr_cols[
                self.csr_rowp[i]:self.csr_rowp[i + 1]]
        import jax.numpy as _jnp
        self._pad_cols = _jnp.asarray(pad)
        self._data = _np.zeros(self.csr_rowp[-1])
        self.xs, self.blx, self.bux = xs, blx, bux

    def get_vars_and_bounds(self):
        import jax.numpy as jnp
        return (jnp.asarray(_clip_start(self.xs, self.blx, self.bux)),
                jnp.asarray(self.blx), jnp.asarray(self.bux))

    def eval_obj_con(self, x):
        import jax.numpy as jnp
        xnp = np.asarray(x)
        fobj, fcon, fail = self.ptr._masterFunc(xnp, ["fobj", "fcon"])
        # cache per point so eval_sparse_con does not pay a second full
        # user evaluation (one _masterFunc call per point)
        self._cw = -np.atleast_1d(fcon)
        self._cw_x = xnp.copy()
        if fail:
            return jnp.asarray(np.nan), jnp.zeros(0)
        return jnp.asarray(float(fobj)), jnp.zeros(0)

    def eval_sparse_con(self, x):
        import jax.numpy as jnp
        xnp = np.asarray(x)
        cached = getattr(self, "_cw_x", None)
        if cached is not None and np.array_equal(cached, xnp):
            return jnp.asarray(self._cw)
        _, fcon, _ = self.ptr._masterFunc(xnp, ["fobj", "fcon"])
        return jnp.asarray(-np.atleast_1d(fcon))

    def eval_obj_con_gradient(self, x):
        import jax.numpy as jnp
        gobj, gcon, fail = self.ptr._masterFunc(np.asarray(x),
                                                ["gobj", "gcon"])
        self._data = -np.asarray(gcon).reshape(-1)
        return (jnp.asarray(np.asarray(gobj).reshape(self.nvars)),
                jnp.zeros((0, self.nvars)))

    def sparse_jacobian(self, x):
        import jax.numpy as jnp
        from ..problem import SparseJacobian
        counts = np.diff(self.csr_rowp)
        vals = np.zeros((self.nwcon, self._kmax))
        for i in range(self.nwcon):
            vals[i, :counts[i]] = self._data[
                self.csr_rowp[i]:self.csr_rowp[i + 1]]
        return SparseJacobian(self.nvars, self._pad_cols, jnp.asarray(vals),
                              nwblock=1)

    def create_quasi_def_mat(self):
        from ..ops.sparse_native import CSRQuasiDefMat
        return CSRQuasiDefMat(self.nvars, self.csr_rowp, self.csr_cols)
