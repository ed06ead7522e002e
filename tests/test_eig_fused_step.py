"""Step-level algebra tests for the fused eigen-TR path (eig_fused.py).

The test_kkt.py discipline applied to `_merged_compact` and one
`_fused_eig_tr_step`: every model quantity (merged compact, quadratic
eigen-row model, model/actual reductions, rho, radius and adaptive-gamma
updates, accept select, KKT error) is recomputed with independent numpy
formulas on a tiny analytic problem and compared against the state the
fused step returns.  A broken model term must fail HERE naming the
equation, not just in the end-to-end FEM quality tests.

Reference algebra: `ParOptCompactEigenvalueApprox.cpp:246-318`
(getCompactMat), `:478-498` (acceptTrialStep linear-term defaults),
`ParOptTrustRegion.cpp:1231-1452` (sl1qpUpdate rho/gamma logic).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from paropt_tpu.eig import CompactEigenApprox, EigenQuasiNewton
from paropt_tpu.eig_fused import EigModel, FusedEigenTR, _merged_compact
from paropt_tpu.ip_fused import _fused_init, _fused_solve_loop
from paropt_tpu.ops import qn as qnmod
from paropt_tpu.problem import Problem
from paropt_tpu.tr import QPParams, _viol


class TinyEigProblem(Problem):
    """min sum((x-1)^2) + quartic;  c0(x) = sum(x)/n - t >= 0 (linear),
    c1(x) = r2 - |V x|^2 / 2 >= 0 (EXACT low-rank quadratic: M = -I,
    h = V), the eigen row at index 1."""

    def __init__(self, n=8, N=2, r2=1.0, quartic=0.0, seed=0):
        super().__init__(nvars=n, ncon=2)
        rng = np.random.default_rng(seed)
        self.V = jnp.asarray(rng.standard_normal((N, n)) / np.sqrt(n))
        self.N = N
        self.r2 = r2
        self.quartic = quartic

    def objective(self, x):
        f = jnp.sum((x - 1.0) ** 2)
        if self.quartic:
            f = f + self.quartic * jnp.sum(x ** 4)
        return f

    def constraints(self, x):
        vx = self.V @ x
        return jnp.array([jnp.sum(x) / self.nvars + 0.5,
                          self.r2 - 0.5 * jnp.vdot(vx, vx)])

    def get_vars_and_bounds(self):
        n = self.nvars
        return (jnp.full(n, 0.1), jnp.full(n, -10.0), jnp.full(n, 10.0))

    def eval_full(self, x):
        f, c = self.eval_obj_con(x)
        g, A = self.eval_obj_con_gradient(x)
        N = self.N
        M = -jnp.eye(N, dtype=x.dtype)
        return f, c, g, A, M, -jnp.eye(N, dtype=x.dtype), self.V


def _opts(extra=None):
    o = {"tr_output_file": None, "output_file": None, "dtype": "float64",
         "tr_max_iterations": 5, "tr_init_size": 0.5, "tr_max_size": 2.0,
         "tr_min_size": 1e-6, "abs_res_tol": 1e-10, "tr_eta": 0.25,
         "tr_l1_tol": 1e-8, "tr_linfty_tol": 1e-8,
         "tr_adaptive_gamma_update": True, "penalty_gamma": 10.0}
    if extra:
        o.update(extra)
    return o


def test_merged_compact_matches_host_eigen_quasi_newton():
    """_merged_compact == the host EigenQuasiNewton.compact() for the same
    (qn, M/Minv/h, z0), across multiplier signs and the z0->0 convention,
    and the implied product B x equals B_qn x - z0 * h' M h x."""
    n, N = 8, 3
    rng = np.random.default_rng(11)
    M = jnp.asarray(rng.standard_normal((N, N)))
    M = M @ M.T + 2 * jnp.eye(N)
    Minv = jnp.linalg.inv(M)
    h = jnp.asarray(rng.standard_normal((N, n)))

    qn0 = qnmod.qn_init(4, n)
    s = jnp.asarray(rng.standard_normal(n))
    qn0, _, _ = qnmod.qn_update(qn0, s, 1.5 * s)
    s2 = jnp.asarray(rng.standard_normal(n))
    qn0, _, _ = qnmod.qn_update(qn0, s2, 2.0 * s2 + 0.1 * s)

    eigh = CompactEigenApprox(nvars=n, N=N)
    eigh.set_approximation(M=M, Minv=Minv, hvecs=h)
    eqn = EigenQuasiNewton(qn0, eigh, index=0)
    em = EigModel(M=M, Minv=Minv, h=h)
    x = jnp.asarray(rng.standard_normal(n))

    for z0 in (0.7, -0.4, 0.0):
        eqn.update_multipliers(None, jnp.array([z0]), None)
        b0h, Zh, Mh = eqn.compact()
        b0f, Zf, Mf = _merged_compact(qn0, em, jnp.asarray(z0), jnp.float64)
        assert np.allclose(np.asarray(b0f), np.asarray(b0h), atol=1e-14), z0
        assert np.allclose(np.asarray(Zf), np.asarray(Zh), atol=1e-14), z0
        assert np.allclose(np.asarray(Mf), np.asarray(Mh), atol=1e-14), z0
        # implied product (for z0 != 0: B x = B_qn x - z0 h'Mh x)
        Bx = b0f * x - Zf.T @ jnp.linalg.solve(Mf, Zf @ x)
        if z0 != 0.0:
            want = qnmod.qn_mult(qn0, x) - z0 * (h.T @ (M @ (h @ x)))
            assert np.allclose(np.asarray(Bx), np.asarray(want),
                               atol=1e-10), z0

    # no objective QN: b0 = 0, Z = h, M = Minv/z0
    b0f, Zf, Mf = _merged_compact(None, em, jnp.asarray(0.5), jnp.float64)
    assert float(b0f) == 0.0
    assert np.allclose(np.asarray(Zf), np.asarray(h))
    assert np.allclose(np.asarray(Mf), np.asarray(Minv) / 0.5, atol=1e-14)


def _replicate_qp_solve(ftr, state):
    """Re-run the step's steering + QP inner solves OUTSIDE the fused step
    (same module functions, same inputs) to recover (p, z, best_con_infeas,
    compact) for the hand checks."""
    (eval_full, qp_model, inf_model, qp_opts, inf_opts, to, index, lbv,
     ubv, d_tmpl) = ftr._raw_step.args
    xk = state.xk
    dt = xk.dtype
    ncon = state.ck.shape[0]
    nineq = to.ninequality
    idx = jnp.arange(ncon)

    lk = jnp.maximum(-state.tr_size, lbv - xk)
    uk = jnp.minimum(state.tr_size, ubv - xk)
    p0 = 0.5 * (lk + uk)

    b0, Z, M = _merged_compact(state.qn, state.eig, state.z0, dt)
    compact = (b0, Z, M)
    params = QPParams(fk=state.fk, gk=state.gk, ck=state.ck, Ak=state.Ak,
                      cwk=jnp.zeros(0, dt), Aw_cols=None, Aw_vals=None,
                      b0=b0, Z=Z, M=M, obj_scale=jnp.asarray(1.0, dt),
                      eig_M=state.eig.M, eig_h=state.eig.h)

    best_con_infeas = jnp.zeros(ncon, dt)
    if to.adaptive_gamma:
        gamma_big = max(1e6, 1e2 * to.gamma_max)
        inf_params = params._replace(
            obj_scale=jnp.asarray(1.0 / gamma_big, dt))
        ones = jnp.ones(ncon, dt)
        d_inf = dataclasses.replace(
            d_tmpl, lb=lk, ub=uk,
            gamma_s=jnp.where(idx < nineq, 0.0, ones), gamma_t=ones)
        st_inf0 = _fused_init(inf_model, inf_opts, p0, d_inf, inf_params,
                              None, None)
        st_inf = _fused_solve_loop(inf_model, inf_opts, st_inf0, d_inf,
                                   inf_params, None)
        hp = state.eig.h @ st_inf.vars.x
        c_inf = (state.ck + state.Ak @ st_inf.vars.x).at[index].add(
            0.5 * jnp.vdot(hp, state.eig.M @ hp))
        best_con_infeas = _viol(c_inf, nineq)

    d_qp = dataclasses.replace(
        d_tmpl, lb=lk, ub=uk,
        gamma_s=jnp.where(idx < nineq, 0.0, state.gamma),
        gamma_t=state.gamma)
    st0 = _fused_init(qp_model, qp_opts, p0, d_qp, params, None, compact)
    st = _fused_solve_loop(qp_model, qp_opts, st0, d_qp, params, compact)
    return st.vars.x, st.vars.z, best_con_infeas, compact


def test_fused_eig_tr_step_accept_algebra():
    """One accepted `_fused_eig_tr_step` vs independent numpy algebra:
    quadratic eigen-row model cm, merged-compact fm, rho, z0/eig/accept
    selects, radius growth, adaptive-gamma update, normalized KKT error."""
    n, N, index = 8, 2, 1
    prob = TinyEigProblem(n=n, N=N, seed=2)
    ftr = FusedEigenTR(prob, _opts(), index=index, qn_b0=1.0)
    to = ftr._to
    s0 = ftr._state0
    s1 = ftr._step_jit(s0)

    p, z, best_con_infeas, compact = _replicate_qp_solve(ftr, s0)
    p_np = np.asarray(p, np.float64)
    z_np = np.asarray(z, np.float64)

    # hand-computed model quantities (independent numpy formulas)
    ck = np.asarray(s0.ck)
    Ak = np.asarray(s0.Ak)
    gk = np.asarray(s0.gk)
    h = np.asarray(s0.eig.h)
    Mh = np.asarray(s0.eig.M)
    hp = h @ p_np
    cm = ck + Ak @ p_np
    cm[index] += 0.5 * hp @ (Mh @ hp)            # QUADRATIC eigen row
    b0, Z, M = (np.asarray(a, np.float64) for a in compact)
    fm = (float(s0.fk) + gk @ p_np
          + 0.5 * p_np @ (b0 * p_np - Z.T @ np.linalg.solve(M, Z @ p_np)))

    gam = np.asarray(s0.gamma)
    nineq = to.ninequality

    def viol(c):
        i = np.arange(c.shape[0])
        return np.where(i < nineq, np.maximum(0.0, -c), np.abs(c))

    xt = np.asarray(s0.xk) + p_np
    ft, ct, gt, At, Mt, Minvt, ht = (np.asarray(a)
                                     for a in prob.eval_full(jnp.asarray(xt)))
    infeas_k = np.sum(gam * viol(ck))
    infeas_m = np.sum(gam * viol(cm))
    infeas_t = np.sum(gam * viol(ct))
    actual = (float(s0.fk) - ft) + (infeas_k - infeas_t)
    model = (float(s0.fk) - fm) + (infeas_k - infeas_m)
    rho = actual / model
    assert abs(float(s1.rho) - rho) < 1e-8 * max(1.0, abs(rho)), \
        (float(s1.rho), rho)
    assert rho >= to.eta, "test problem must produce an accepted first step"

    # accept select: state moves to the trial point, model refreshed from
    # the SAME eval_full, z0 <- z[index]
    assert np.allclose(np.asarray(s1.xk), xt, atol=1e-12)
    assert abs(float(s1.fk) - ft) < 1e-12
    assert np.allclose(np.asarray(s1.ck), ct, atol=1e-12)
    assert np.allclose(np.asarray(s1.gk), gt, atol=1e-12)
    assert np.allclose(np.asarray(s1.Ak), At, atol=1e-12)
    assert np.allclose(np.asarray(s1.eig.M), Mt, atol=1e-12)
    assert np.allclose(np.asarray(s1.eig.Minv), Minvt, atol=1e-12)
    assert np.allclose(np.asarray(s1.eig.h), ht, atol=1e-12)
    assert abs(float(s1.z0) - z_np[index]) < 1e-8, \
        (float(s1.z0), z_np[index])

    # radius update (rho in (0.25, 0.75] keeps, > 0.75 grows 1.5x)
    tr0 = float(s0.tr_size)
    if rho > 0.75:
        tr_want = min(1.5 * tr0, to.tr_max)
    elif rho < 0.25:
        tr_want = max(0.25 * tr0, to.tr_min)
    else:
        tr_want = tr0
    assert abs(float(s1.tr_size) - tr_want) < 1e-12

    # adaptive gamma (`sl1qpUpdate`): shrink toward |z|, grow 1.5x when the
    # steering solve promises 0.5%+ more infeasibility reduction
    zabs = np.abs(z_np)
    con_infeas = viol(ck)
    model_con_infeas = viol(cm)
    infeas_reduction = con_infeas - model_con_infeas
    best_reduction = con_infeas - np.asarray(best_con_infeas)
    gamma_want = gam.copy()
    for i in range(2):
        if (zabs[i] > to.infeas_tol and con_infeas[i] < to.infeas_tol
                and gam[i] >= 2.0 * zabs[i]):
            gamma_want[i] = max(0.5 * (gam[i] + zabs[i]), to.gamma_min)
        elif (con_infeas[i] > to.infeas_tol
              and 0.995 * best_reduction[i] > infeas_reduction[i]):
            gamma_want[i] = min(1.5 * gam[i], to.gamma_max)
    assert np.allclose(np.asarray(s1.gamma), gamma_want, atol=1e-8), \
        (np.asarray(s1.gamma), gamma_want)

    # normalized KKT error at the new point with the QP multipliers
    r = gt - At.T @ z_np
    lbv = np.asarray(ftr._raw_step.args[7])
    ubv = np.asarray(ftr._raw_step.args[8])
    r = np.where((xt <= lbv + to.bound_relax) & (r > 0.0), 0.0, r)
    r = np.where((xt >= ubv - to.bound_relax) & (r < 0.0), 0.0, r)
    zmax = max(1.0, np.max(np.abs(z_np)))
    l1 = np.sum(np.abs(r)) / max(np.sum(np.abs(gt)), zmax)
    linf = np.max(np.abs(r)) / max(np.max(np.abs(gt)), zmax)
    assert abs(float(s1.l1) - l1) < 1e-8 * max(1.0, l1), (float(s1.l1), l1)
    assert abs(float(s1.linf) - linf) < 1e-8 * max(1.0, linf)
    assert int(s1.k) == 1


def test_eig_row_model_modes_reach_same_optimum():
    """eig_row_model='quadratic' (reference parity,
    `ParOptCompactEigenvalueApprox.cpp:598-635`) and the default 'linear'
    must converge to the same KKT point on a problem whose low-rank
    constraint curvature is EXACT and active at the optimum (measured A/B:
    scripts/ab_eig_row.py — linear needs fewer iterations, hence the
    default)."""
    n, N, r2 = 32, 4, 0.05
    results = {}
    for mode in ("quadratic", "linear"):
        prob = TinyEigProblem(n=n, N=N, r2=r2, seed=4)
        ftr = FusedEigenTR(prob, _opts({"tr_max_iterations": 100,
                                        "tr_init_size": 0.5,
                                        "tr_max_size": 2.0,
                                        "tr_l1_tol": 1e-6,
                                        "tr_linfty_tol": 1e-6}),
                           index=1, qn_b0=1.0, eig_row_model=mode)
        res, state = ftr.solve()
        assert res["converged"], (mode, res)
        results[mode] = (res, state)
    rq, sq = results["quadratic"]
    rl, sl = results["linear"]
    assert abs(rq["fobj"] - rl["fobj"]) < 1e-6
    np.testing.assert_allclose(np.asarray(sq.xk), np.asarray(sl.xk),
                               atol=1e-4)
    assert abs(float(sq.z0) - float(sl.z0)) < 1e-3


def test_fused_eig_tr_step_reject_keeps_state():
    """A rejected trial (rho < eta via a steep quartic the QP model can't
    see) must leave x/f/model untouched and shrink the radius 4x."""
    n, N, index = 8, 2, 1
    prob = TinyEigProblem(n=n, N=N, seed=2, quartic=50.0)
    ftr = FusedEigenTR(prob, _opts({"tr_init_size": 2.0,
                                    "tr_max_size": 4.0}),
                       index=index, qn_b0=1.0)
    s0 = ftr._state0
    s1 = ftr._step_jit(s0)
    assert float(s1.rho) < ftr._to.eta, float(s1.rho)
    assert np.allclose(np.asarray(s1.xk), np.asarray(s0.xk), atol=0.0)
    assert float(s1.fk) == float(s0.fk)
    assert np.allclose(np.asarray(s1.eig.M), np.asarray(s0.eig.M), atol=0.0)
    assert np.allclose(np.asarray(s1.eig.h), np.asarray(s0.eig.h), atol=0.0)
    assert float(s1.z0) == float(s0.z0)
    assert abs(float(s1.tr_size)
               - max(0.25 * float(s0.tr_size), ftr._to.tr_min)) < 1e-12
    assert int(s1.k) == 1
