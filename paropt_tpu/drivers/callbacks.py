"""Callback-style problem adapter.

The reference's primary usage mode is host callbacks into external physics
codes (FEM solvers etc., SURVEY.md §3.3).  `FunctionProblem` wraps plain
Python/numpy callables into the `Problem` interface — no JAX required from
the user; gradients may be supplied or approximated by finite differences.
This is also the base the pyOptSparse/OpenMDAO drivers build on.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..problem import Problem

__all__ = ["FunctionProblem"]


class FunctionProblem(Problem):
    """Problem from plain callables.

    Parameters
    ----------
    x0, lb, ub : arrays
    objective : f(x) -> float
    gradient : g(x) -> [n]  (optional; FD if omitted)
    constraints : c(x) -> [ncon] with c >= 0 (optional)
    jacobian : A(x) -> [ncon, n]  (optional; FD if omitted)
    ninequality : number of leading inequality constraints
    fd_step : finite-difference step for missing derivatives
    """

    def __init__(self, x0, lb, ub,
                 objective: Callable,
                 gradient: Optional[Callable] = None,
                 constraints: Optional[Callable] = None,
                 jacobian: Optional[Callable] = None,
                 ninequality: Optional[int] = None,
                 fd_step: float = 1e-7):
        x0 = np.asarray(x0, dtype=float)
        ncon = len(np.atleast_1d(constraints(x0))) if constraints else 0
        super().__init__(nvars=x0.shape[0], ncon=ncon,
                         ninequality=ninequality)
        self._x0 = x0
        self._lb = np.asarray(lb, dtype=float)
        self._ub = np.asarray(ub, dtype=float)
        self._f = objective
        self._g = gradient
        self._c = constraints
        self._J = jacobian
        self._h = fd_step
        self.neval = 0
        self.ngeval = 0

    def get_vars_and_bounds(self):
        return (jnp.asarray(self._x0), jnp.asarray(self._lb),
                jnp.asarray(self._ub))

    def eval_obj_con(self, x):
        xnp = np.asarray(x)
        self.neval += 1
        f = float(self._f(xnp))
        c = (np.atleast_1d(self._c(xnp)).astype(float) if self._c
             else np.zeros(0))
        return jnp.asarray(f), jnp.asarray(c)

    def _fd_gradient(self, fn, xnp, fx):
        n = xnp.shape[0]
        fx = np.atleast_1d(np.asarray(fx, dtype=float))
        out = np.zeros((fx.shape[0], n))
        for i in range(n):
            xp = xnp.copy()
            xp[i] += self._h
            out[:, i] = (np.atleast_1d(fn(xp)) - fx) / self._h
        return out

    def eval_obj_con_gradient(self, x):
        xnp = np.asarray(x)
        self.ngeval += 1
        if self._g is not None:
            g = np.asarray(self._g(xnp), dtype=float)
        else:
            g = self._fd_gradient(self._f, xnp, self._f(xnp))[0]
        if self.ncon == 0:
            A = np.zeros((0, self.nvars))
        elif self._J is not None:
            A = np.asarray(self._J(xnp), dtype=float).reshape(self.ncon,
                                                              self.nvars)
        else:
            A = self._fd_gradient(self._c, xnp, self._c(xnp))
        return jnp.asarray(g), jnp.asarray(A)
