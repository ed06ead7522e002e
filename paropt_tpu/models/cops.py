"""COPS 3.0 benchmark problems (the reference's `examples/COPS/`).

- `Electron`  — problem 2, distribution of electrons on a sphere
  (`examples/COPS/electron/electron.py`): minimize the Coulomb potential of n
  point charges constrained to the unit sphere (n equality constraints).
  Offered in both the dense-constraint and general-CSR sparse-constraint
  forms (the reference uses the CSR path).
- `Polygon`   — problem 1, largest small polygon
  (`examples/COPS/polygon/polygon.py`): maximize the area of a polygon of
  unit diameter in polar coordinates.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..problem import CSRSparseProblem, Problem

__all__ = ["Electron", "ElectronCSR", "Polygon"]


def _electron_objective(xyz, n, eps):
    pts = xyz.reshape(3, n).T  # [n, 3]
    diff = pts[:, None, :] - pts[None, :, :]
    dsq = jnp.sum(diff * diff, axis=-1)
    iu = np.triu_indices(n, k=1)
    d = jnp.maximum(dsq[iu], eps)
    return jnp.sum(d ** -0.5)


def _electron_start(n):
    rng = np.random.default_rng(0)
    alpha = rng.uniform(0.0, 2 * np.pi, n)
    beta = rng.uniform(-np.pi, np.pi, n)
    x = np.cos(beta) * np.cos(alpha)
    y = np.cos(beta) * np.sin(alpha)
    z = np.sin(beta)
    return np.concatenate([x, y, z])


class Electron(Problem):
    """Dense-constraint form: n sphere equality constraints."""

    def __init__(self, n: int = 10, epsilon: float = 1e-10):
        super().__init__(nvars=3 * n, ncon=n, ninequality=0)
        self.npts = n
        self.eps = epsilon

    def objective(self, x):
        return _electron_objective(x, self.npts, self.eps)

    def constraints(self, x):
        n = self.npts
        return 1.0 - (x[:n] ** 2 + x[n:2 * n] ** 2 + x[2 * n:] ** 2)

    def get_vars_and_bounds(self):
        x0 = jnp.asarray(_electron_start(self.npts))
        n3 = 3 * self.npts
        return x0, jnp.full(n3, -10.0), jnp.full(n3, 10.0)


class ElectronCSR(CSRSparseProblem):
    """General-CSR sparse-constraint form (matches the reference's usage:
    rowp/cols with 3 entries per sphere constraint, all equalities)."""

    def __init__(self, n: int = 10, epsilon: float = 1e-10):
        rowp = np.arange(n + 1, dtype=np.int32) * 3
        cols = np.concatenate(
            [[i, n + i, 2 * n + i] for i in range(n)]).astype(np.int32)
        super().__init__(nvars=3 * n, ncon=0, rowp=rowp, cols=cols,
                         nwinequality=0)
        self.npts = n
        self.eps = epsilon

    def objective(self, x):
        return _electron_objective(x, self.npts, self.eps)

    def sparse_constraints(self, x):
        n = self.npts
        return 1.0 - (x[:n] ** 2 + x[n:2 * n] ** 2 + x[2 * n:] ** 2)

    def eval_sparse_jacobian_data(self, x):
        n = self.npts
        xnp = np.asarray(x)
        data = np.zeros(3 * n)
        for i in range(n):
            data[3 * i] = -2.0 * xnp[i]
            data[3 * i + 1] = -2.0 * xnp[n + i]
            data[3 * i + 2] = -2.0 * xnp[2 * n + i]
        return data

    def get_vars_and_bounds(self):
        x0 = jnp.asarray(_electron_start(self.npts))
        n3 = 3 * self.npts
        return x0, jnp.full(n3, -10.0), jnp.full(n3, 10.0)


class Polygon(Problem):
    """Largest small polygon: vertices (r_i, θ_i), i = 0..nv-1, with r of the
    last vertex pinned by bounds.  Maximize the area

        A = 1/2 Σ r_i r_{i+1} sin(θ_{i+1} − θ_i)

    subject to unit diameter (pairwise squared distances <= 1) and ordered
    angles θ_{i+1} >= θ_i."""

    def __init__(self, nv: int = 6):
        self.nv = nv
        npairs = nv * (nv - 1) // 2
        super().__init__(nvars=2 * nv, ncon=npairs + (nv - 1))
        self._iu = np.triu_indices(nv, k=1)

    def _split(self, x):
        return x[:self.nv], x[self.nv:]

    def objective(self, x):
        r, th = self._split(x)
        return -0.5 * jnp.sum(r[:-1] * r[1:] * jnp.sin(th[1:] - th[:-1]))

    def constraints(self, x):
        r, th = self._split(x)
        ri, rj = r[self._iu[0]], r[self._iu[1]]
        ti, tj = th[self._iu[0]], th[self._iu[1]]
        dsq = ri ** 2 + rj ** 2 - 2.0 * ri * rj * jnp.cos(tj - ti)
        diameter = 1.0 - dsq
        order = th[1:] - th[:-1]
        return jnp.concatenate([diameter, order])

    def get_vars_and_bounds(self):
        nv = self.nv
        th0 = np.linspace(0.1, np.pi - 0.1, nv)
        r0 = np.full(nv, 0.5)
        x0 = jnp.asarray(np.concatenate([r0, th0]))
        lb = jnp.asarray(np.concatenate([np.full(nv, 1e-3),
                                         np.zeros(nv)]))
        ub = jnp.asarray(np.concatenate([np.ones(nv),
                                         np.full(nv, np.pi)]))
        return x0, lb, ub

    def area(self, x):
        return -float(self.objective(x))
