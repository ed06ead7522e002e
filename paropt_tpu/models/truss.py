"""Truss sizing and discrete-material (DMO) truss optimization.

The role of the reference's `examples/truss/` and `examples/dmo_truss/`
(multi-material discrete topology optimization) — the workload class ParOpt
was built for (`README.md:20-31`).  A 2-D ground-structure truss FEM in pure
JAX: the compliance objective differentiates through the linear solve, so
all gradients are exact adjoints via autodiff.

- `TrussSizing`: design = bar areas, min compliance s.t. mass <= m0.
- `DMOTruss`: design = per-bar material weights w[e, m] with SIMP-style
  penalized stiffness interpolation; one dense mass constraint and one
  sparse weighting constraint per bar  1 - Σ_m w[e, m] >= 0  (the
  partition-structured pattern => reshape-fast products).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..problem import Problem, SparseJacobian

__all__ = ["TrussSizing", "DMOTruss", "make_ground_structure"]


def make_ground_structure(nx: int = 4, ny: int = 3):
    """Grid ground structure: nodes on an nx x ny grid, bars to right /
    up / both diagonals.  Left edge fixed; unit downward load at the
    right-middle node.  Returns (xy [nn,2], bars [nb,2], fixed_dof, f)."""
    nodes = [(i, j) for j in range(ny) for i in range(nx)]
    idx = {n: k for k, n in enumerate(nodes)}
    bars = []
    for (i, j) in nodes:
        for di, dj in ((1, 0), (0, 1), (1, 1), (1, -1)):
            if (i + di, j + dj) in idx:
                bars.append((idx[(i, j)], idx[(i + di, j + dj)]))
    xy = np.asarray(nodes, dtype=float)
    bars = np.asarray(bars, dtype=np.int32)
    nn = len(nodes)
    fixed = []
    for (i, j) in nodes:
        if i == 0:
            k = idx[(i, j)]
            fixed.extend([2 * k, 2 * k + 1])
    f = np.zeros(2 * nn)
    load_node = idx[(nx - 1, ny // 2)]
    f[2 * load_node + 1] = -1.0
    return xy, bars, np.asarray(fixed, np.int32), f


class _TrussFEM:
    """Shared FEM pieces: B [nbars, ndof_free] rows of scaled direction
    incidence so K(s) = B' diag(s / L) B."""

    def __init__(self, nx, ny):
        xy, bars, fixed, f = make_ground_structure(nx, ny)
        nn = xy.shape[0]
        ndof = 2 * nn
        free = np.setdiff1d(np.arange(ndof), fixed)
        self.nbars = bars.shape[0]
        dvec = xy[bars[:, 1]] - xy[bars[:, 0]]
        L = np.linalg.norm(dvec, axis=1)
        d = dvec / L[:, None]
        B = np.zeros((self.nbars, ndof))
        for e, (a, b) in enumerate(bars):
            B[e, 2 * a:2 * a + 2] = -d[e]
            B[e, 2 * b:2 * b + 2] = d[e]
        self.B = jnp.asarray(B[:, free])
        self.L = jnp.asarray(L)
        self.f = jnp.asarray(f[free])
        self.ndof_free = len(free)

    def compliance(self, stiffness):
        """f'u with (B' diag(s/L) B + eps I) u = f."""
        K = (self.B.T * (stiffness / self.L)) @ self.B
        K = K + 1e-6 * jnp.eye(self.ndof_free, dtype=K.dtype)
        u = jnp.linalg.solve(K, self.f)
        return jnp.vdot(self.f, u)


class TrussSizing(Problem):
    """min compliance(areas) s.t. mass(areas) <= m0, a in [a_min, a_max]."""

    def __init__(self, nx: int = 4, ny: int = 3, mass_fraction: float = 0.3,
                 E: float = 10.0, rho: float = 1.0):
        self.fem = _TrussFEM(nx, ny)
        super().__init__(nvars=self.fem.nbars, ncon=1)
        self.E = E
        self.rho = rho
        a_max = 1.0
        self.m0 = mass_fraction * float(jnp.sum(rho * a_max * self.fem.L))

    def objective(self, a):
        return self.fem.compliance(self.E * a)

    def constraints(self, a):
        mass = jnp.sum(self.rho * a * self.fem.L)
        return jnp.array([1.0 - mass / self.m0])

    def get_vars_and_bounds(self):
        nb = self.nvars
        return (jnp.full(nb, 0.3), jnp.full(nb, 1e-3), jnp.ones(nb))


class DMOTruss(Problem):
    """Discrete material optimization: per-bar material weights w[e, m],
    SIMP-penalized stiffness, mass constraint + per-bar weighting
    constraints (the reference's dmo_truss pattern)."""

    def __init__(self, nx: int = 4, ny: int = 3, materials=None,
                 penalty: float = 3.0, mass_fraction: float = 0.4):
        self.fem = _TrussFEM(nx, ny)
        if materials is None:
            # (E, rho) pairs: stiff/heavy, medium, light/soft
            materials = [(10.0, 1.0), (6.0, 0.55), (3.0, 0.25)]
        self.E = jnp.asarray([m[0] for m in materials])
        self.rho = jnp.asarray([m[1] for m in materials])
        self.nmat = len(materials)
        nbars = self.fem.nbars
        nvars = nbars * self.nmat
        super().__init__(nvars=nvars, ncon=1, nwcon=nbars, nwblock=1)
        self.p = penalty
        a0 = 1.0
        self.a0 = a0
        self.m0 = mass_fraction * float(
            jnp.max(self.rho) * a0 * jnp.sum(self.fem.L))
        # weighting-constraint Jacobian: variables laid out [nbars, nmat]
        # => partition pattern (reshape-fast products)
        cols = np.arange(nvars, dtype=np.int32).reshape(nbars, self.nmat)
        self._jac = SparseJacobian(nvars, jnp.asarray(cols),
                                   -jnp.ones((nbars, self.nmat)), nwblock=1)

    def _weights(self, x):
        return x.reshape(self.fem.nbars, self.nmat)

    def objective(self, x):
        w = self._weights(x)
        stiff = self.a0 * (w ** self.p) @ self.E
        return self.fem.compliance(stiff + 1e-8)

    def constraints(self, x):
        w = self._weights(x)
        mass = self.a0 * jnp.sum((w @ self.rho) * self.fem.L)
        return jnp.array([1.0 - mass / self.m0])

    def sparse_constraints(self, x):
        w = self._weights(x)
        return 1.0 - jnp.sum(w, axis=1)

    def sparse_jacobian(self, x):
        return self._jac

    def get_vars_and_bounds(self):
        n = self.nvars
        x0 = jnp.full(n, 1.0 / (self.nmat + 1))
        return x0, jnp.full(n, 1e-4), jnp.ones(n)
