"""SSTO lunar ascent by direct collocation — the second dymos-role
trajectory instance (`examples/dymos/ssto/ssto.py` in the reference).

The reference drives this through dymos/OpenMDAO with ParOptSparseDriver:
a 2-D launch vehicle (states x, y, vx, vy, m) under constant thrust with
LINEAR-TANGENT guidance — the pitch angle enters as
tan(theta)(tau) = p0 (1 - tau) + p1 tau over normalized phase time, so the
control has exactly TWO design coefficients (dymos's order-1 polynomial
control).  Boundary conditions: all states fixed at launch, final
y = 185 km, vx = 1627 m/s, vy = 0 (lunar orbit insertion), minimize the
ascent time.  The documented optimum for this configuration is
t_f ~= 481 s (dymos SSTO lunar-ascent example).

Here: trapezoidal collocation on N uniform nodes with the reference's
variable scalings (ref=1000 for x/y, 100 for vx/vy/m, defect_ref=100),
5(N-1) banded sparse defect equalities through the general-CSR path plus
3 dense boundary equalities.

    EOM (`ssto.py:77-91`): xdot = vx, ydot = vy,
        vxdot = F cos(theta)/m, vydot = F sin(theta)/m - g,
        mdot = -F/(g Isp),   g = 1.61544 (lunar), F = 3*50000*g,
        Isp = 1e6 s (near-constant mass, per the reference setup).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..problem import CSRSparseProblem

__all__ = ["SSTOCollocation"]

_G = 1.61544                    # lunar gravity, m/s^2
_THRUST = 3.0 * 50000.0 * _G    # N   (`ssto.py:223`)
_ISP = 1.0e6                    # s   (`ssto.py:226`)
_M0 = 50000.0                   # kg launch mass
_REF_XY = 1000.0                # dymos ref= for x, y
_REF_V = 100.0                  # ref= for vx, vy, m
_DEFECT_REF = 100.0
_YF, _VXF, _VYF = 1.85e5, 1627.0, 0.0


class SSTOCollocation(CSRSparseProblem):
    """Trapezoidal-collocation SSTO lunar ascent (dymos example config)."""

    def __init__(self, n_nodes: int = 40):
        N = int(n_nodes)
        assert N >= 4
        self.N = N

        # scaled variable layout (initial states eliminated — launch pad):
        #  x_1..x_{N-1} | y | vx | vy | m  (each N-1) | p0 p1 | tf
        nb = N - 1
        self._off = {s: i * nb for i, s in
                     enumerate(("x", "y", "vx", "vy", "m"))}
        self._op = 5 * nb
        self._otf = 5 * nb + 2
        nvars = 5 * nb + 3

        def var(s, j):          # node j in 1..N-1
            return self._off[s] + j - 1

        rowp = [0]
        cols = []

        def add_row(cset):
            cs = sorted(set(cset))
            cols.extend(cs)
            rowp.append(len(cols))

        tail = [self._op, self._op + 1, self._otf]   # p0, p1, tf
        for i in range(N - 1):
            def pair(s):
                return [var(s, j) for j in (i, i + 1) if j >= 1]
            vx2, vy2, m2 = pair("vx"), pair("vy"), pair("m")
            add_row(pair("x") + vx2 + [self._otf])           # x defect
            add_row(pair("y") + vy2 + [self._otf])           # y defect
            add_row(vx2 + m2 + tail)                         # vx defect
            add_row(vy2 + m2 + tail)                         # vy defect
            add_row(m2 + [self._otf])                        # m defect
        super().__init__(nvars=nvars, ncon=3,
                         rowp=np.asarray(rowp, np.int32),
                         cols=np.asarray(cols, np.int32),
                         ninequality=0, nwinequality=0)
        # colored forward-mode CSR fill: ~13 jvp's regardless of N
        self._jac_fill = self.colored_jacobian_fill(self._defects)

    # -- trajectory assembly ---------------------------------------------
    def _full_states(self, xv):
        """Physical-unit state arrays [N] (launch values prepended), the
        per-node theta, and tf."""
        N = self.N
        nb = N - 1
        dt = xv.dtype

        def full(s, ref, s0=0.0):
            o = self._off[s]
            return jnp.concatenate([jnp.array([s0], dt),
                                    ref * xv[o:o + nb]])

        xs = full("x", _REF_XY)
        ys = full("y", _REF_XY)
        vx = full("vx", _REF_V)
        vy = full("vy", _REF_V, 1e-6)
        m = full("m", _REF_V, _M0)
        p0, p1 = xv[self._op], xv[self._op + 1]
        tau = jnp.linspace(0.0, 1.0, N).astype(dt)
        theta = jnp.arctan(p0 * (1.0 - tau) + p1 * tau)
        tf = xv[self._otf]
        return xs, ys, vx, vy, m, theta, tf

    def _defects(self, xv):
        """[5(N-1)] trapezoidal defects / defect_ref, interleaved."""
        xs, ys, vx, vy, m, th, tf = self._full_states(xv)
        h = tf / (self.N - 1)
        ct, st = jnp.cos(th), jnp.sin(th)
        fx = vx
        fy = vy
        fvx = _THRUST * ct / m
        fvy = _THRUST * st / m - _G
        fm = jnp.full_like(m, -_THRUST / (_G * _ISP))

        def defect(s, f):
            return (s[1:] - s[:-1] - 0.5 * h * (f[:-1] + f[1:])) \
                / _DEFECT_REF

        d = jnp.stack([defect(xs, fx), defect(ys, fy), defect(vx, fvx),
                       defect(vy, fvy), defect(m, fm)], axis=1)
        return d.reshape(-1)

    # -- Problem surface -------------------------------------------------
    def objective(self, x):
        return 0.01 * x[self._otf]          # dymos scaler=0.01

    def constraints(self, x):
        """Final-state boundary equalities (`ssto.py:230-233`), in the
        reference's ref scalings."""
        xs, ys, vx, vy, m, th, tf = self._full_states(x)
        return jnp.stack([(ys[-1] - _YF) / 1.0e4,
                          (vx[-1] - _VXF) / _REF_V,
                          (vy[-1] - _VYF) / _REF_V])

    def sparse_constraints(self, x):
        return self._defects(x)

    def eval_sparse_jacobian_data(self, x):
        return self._jac_fill(jnp.asarray(x))

    def get_vars_and_bounds(self):
        N = self.N
        # dymos-style linear interpolation start (`ssto.py:243-250`)
        xi = np.linspace(0.0, 350000.0, N)[1:] / _REF_XY
        yi = np.linspace(0.0, 185000.0, N)[1:] / _REF_XY
        vxi = np.linspace(0.0, 1627.0, N)[1:] / _REF_V
        vyi = np.linspace(1e-6, 0.0, N)[1:] / _REF_V
        mi = np.full(N - 1, _M0) / _REF_V
        start = np.concatenate([xi, yi, vxi, vyi, mi,
                                [0.5 * np.pi, 0.0], [500.0]])
        lb = np.concatenate([np.full(N - 1, -1.0) / _REF_XY,
                             np.zeros(N - 1),
                             np.zeros(N - 1),
                             np.full(N - 1, -1e4) / _REF_V,
                             np.full(N - 1, 1.0) / _REF_V,
                             [-100.0, -100.0], [10.0]])
        ub = np.concatenate([np.full(N - 1, 1e7) / _REF_XY,
                             np.full(N - 1, 1e7) / _REF_XY,
                             np.full(N - 1, 1e4) / _REF_V,
                             np.full(N - 1, 1e4) / _REF_V,
                             np.full(N - 1, 1e6) / _REF_V,
                             [100.0, 100.0], [1000.0]])
        return (jnp.asarray(start), jnp.asarray(lb), jnp.asarray(ub))

    # -- reporting -------------------------------------------------------
    def final_time(self, x):
        return float(jnp.asarray(x)[self._otf])

    def trajectory(self, x):
        xs, ys, vx, vy, m, th, tf = self._full_states(jnp.asarray(x))
        t = np.linspace(0.0, float(tf), self.N)
        return (t,) + tuple(np.asarray(a) for a in (xs, ys, vx, vy, m, th))
