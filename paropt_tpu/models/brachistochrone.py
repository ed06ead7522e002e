"""Brachistochrone by direct collocation — the dymos-role trajectory
problem class.

The reference is driven by dymos through OpenMDAO on exactly this problem
(`examples/dymos/brachistochrone/brachistochrone.py`: GaussLobatto
transcription, theta in [0.01, 179.9] deg, duration in [0.5, 10] s,
(x, y): (0, 10) -> (10, 5), v0 = 0, g = 9.80665, converged final time
1.8016 s asserted at rel 1e-3).  dymos itself cannot be installed here, but
the PROBLEM CLASS it generates can: a transcription turns the ODE into a
sparse NLP whose collocation-defect equality constraints have a banded
Jacobian — the general-CSR sparse-constraint path (`CSRSparseProblem` →
native quasi-definite factorization), which is how the reference's
ParOptSparseDriver consumes dymos totals.

This model applies trapezoidal collocation on N uniform nodes:

    states  x, y, v at nodes (boundary-fixed values eliminated),
    control theta at nodes, and the final time tf;
    defects d_s[i] = s_{i+1} - s_i - h/2 (f_s(i) + f_s(i+1)) = 0,
    h = tf/(N-1),  with the BrachistochroneODE rates
    xdot = v sin(theta), ydot = -v cos(theta), vdot = g cos(theta).

min tf  s.t. all 3(N-1) defects == 0 (sparse equalities), bounds as above.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..problem import CSRSparseProblem

__all__ = ["BrachistochroneCollocation"]

_G = 9.80665
_DEG = np.pi / 180.0


class BrachistochroneCollocation(CSRSparseProblem):
    """Trapezoidal-collocation brachistochrone (dymos example config)."""

    def __init__(self, n_nodes: int = 48,
                 x0=(0.0, 10.0), xf=(10.0, 5.0), v0: float = 0.0,
                 g: float = _G):
        N = int(n_nodes)
        assert N >= 4
        self.N = N
        self.g = float(g)
        self.bc = (float(x0[0]), float(x0[1]), float(xf[0]), float(xf[1]),
                   float(v0))

        # variable layout (boundary-fixed states eliminated):
        #   x_1..x_{N-2} | y_1..y_{N-2} | v_1..v_{N-1} | th_0..th_{N-1} | tf
        self._ox = 0
        self._oy = N - 2
        self._ov = 2 * N - 4
        self._ot = 3 * N - 5
        self._otf = 4 * N - 5
        nvars = 4 * N - 4

        def xvar(j):   # node j in 1..N-2
            return self._ox + j - 1

        def yvar(j):
            return self._oy + j - 1

        def vvar(j):   # node j in 1..N-1
            return self._ov + j - 1

        def tvar(j):   # node j in 0..N-1
            return self._ot + j

        # CSR pattern: one row per defect, columns = the free variables the
        # defect depends on.  Row order: for each interval i, the (x, y, v)
        # defects — keeps the pattern banded for the native factorization.
        rowp = [0]
        cols = []

        def add_row(node_cols):
            cols.extend(sorted(node_cols))
            rowp.append(len(cols))

        for i in range(N - 1):
            state_x = [xvar(j) for j in (i, i + 1) if 1 <= j <= N - 2]
            state_y = [yvar(j) for j in (i, i + 1) if 1 <= j <= N - 2]
            vs = [vvar(j) for j in (i, i + 1) if 1 <= j <= N - 1]
            ths = [tvar(i), tvar(i + 1)]
            add_row(state_x + vs + ths + [self._otf])
            add_row(state_y + vs + ths + [self._otf])
            add_row(vs + ths + [self._otf])

        super().__init__(nvars=nvars, ncon=0,
                         rowp=np.asarray(rowp, np.int32),
                         cols=np.asarray(cols, np.int32), nwinequality=0)
        # colored forward-mode CSR fill: ~9 jvp's regardless of N (vs an
        # O(N^2) dense jacrev + gather)
        self._jac_fill = self.colored_jacobian_fill(self._defects)

    # -- trajectory assembly ---------------------------------------------
    def _full_states(self, xv):
        """Insert the boundary-fixed values: full x, y, v, theta node
        arrays [N] plus tf."""
        N = self.N
        x0, y0, xN, yN, v0 = self.bc
        dt = xv.dtype
        xs = jnp.concatenate([jnp.array([x0], dt),
                              xv[self._ox:self._ox + N - 2],
                              jnp.array([xN], dt)])
        ys = jnp.concatenate([jnp.array([y0], dt),
                              xv[self._oy:self._oy + N - 2],
                              jnp.array([yN], dt)])
        vs = jnp.concatenate([jnp.array([v0], dt),
                              xv[self._ov:self._ov + N - 1]])
        th = xv[self._ot:self._ot + N]
        tf = xv[self._otf]
        return xs, ys, vs, th, tf

    def _defects(self, xv):
        """[3(N-1)] trapezoidal defect residuals, interleaved (x,y,v)."""
        xs, ys, vs, th, tf = self._full_states(xv)
        h = tf / (self.N - 1)
        sin_t, cos_t = jnp.sin(th), jnp.cos(th)
        fx = vs * sin_t
        fy = -vs * cos_t
        fv = self.g * cos_t
        dx = xs[1:] - xs[:-1] - 0.5 * h * (fx[:-1] + fx[1:])
        dy = ys[1:] - ys[:-1] - 0.5 * h * (fy[:-1] + fy[1:])
        dv = vs[1:] - vs[:-1] - 0.5 * h * (fv[:-1] + fv[1:])
        return jnp.stack([dx, dy, dv], axis=1).reshape(-1)

    # -- Problem surface -------------------------------------------------
    def objective(self, x):
        return x[self._otf]

    def sparse_constraints(self, x):
        return self._defects(x)

    def eval_sparse_jacobian_data(self, x):
        return self._jac_fill(jnp.asarray(x))

    def get_vars_and_bounds(self):
        N = self.N
        x0, y0, xN, yN, v0 = self.bc
        # dymos-style linear interpolation start
        xi = np.linspace(x0, xN, N)[1:-1]
        yi = np.linspace(y0, yN, N)[1:-1]
        vi = np.linspace(v0, 9.9, N)[1:]
        ti = np.linspace(5.0, 100.5, N) * _DEG
        start = np.concatenate([xi, yi, vi, ti, [2.0]])
        big = 1e3
        lb = np.concatenate([np.full(N - 2, -big), np.full(N - 2, -big),
                             np.full(N - 1, -big),
                             np.full(N, 0.01 * _DEG), [0.5]])
        ub = np.concatenate([np.full(N - 2, big), np.full(N - 2, big),
                             np.full(N - 1, big),
                             np.full(N, 179.9 * _DEG), [10.0]])
        return (jnp.asarray(start), jnp.asarray(lb), jnp.asarray(ub))

    # -- reporting -------------------------------------------------------
    def trajectory(self, x):
        """(t, x, y, v, theta) node arrays for plotting/inspection."""
        xs, ys, vs, th, tf = self._full_states(jnp.asarray(x))
        t = np.linspace(0.0, float(tf), self.N)
        return (t, np.asarray(xs), np.asarray(ys), np.asarray(vs),
                np.asarray(th))
