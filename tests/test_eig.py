"""Eigenvalue-approximation (ParOptEig-equivalent) path tests.

Uses a problem whose constraint has an exact low-rank Hessian, so the
user-callback eigen model can represent it exactly:

    min  sum((x - 1)^2)
    s.t. c(x) = r2 - |V' x|^2 / 2 >= 0      (V: [N, n] fixed)
"""

import numpy as np
import jax.numpy as jnp

from paropt_tpu.eig import CompactEigenApprox, EigenQuasiNewton, \
    EigenSubproblem
from paropt_tpu.tr import TrustRegion
from paropt_tpu.problem import Problem
from paropt_tpu.ops import qn as qnmod


class LowRankConProblem(Problem):
    def __init__(self, n=12, N=2, r2=1.0, seed=0):
        super().__init__(nvars=n, ncon=1)
        rng = np.random.default_rng(seed)
        self.V = jnp.asarray(rng.standard_normal((N, n)) / np.sqrt(n))
        self.r2 = r2

    def objective(self, x):
        return jnp.sum((x - 1.0) ** 2)

    def constraints(self, x):
        vx = self.V @ x
        return jnp.array([self.r2 - 0.5 * jnp.vdot(vx, vx)])

    def get_vars_and_bounds(self):
        n = self.nvars
        return jnp.zeros(n), jnp.full(n, -10.0), jnp.full(n, 10.0)


def _opts(extra=None):
    o = {"tr_output_file": None, "output_file": None,
         "tr_max_iterations": 100, "tr_init_size": 1.0,
         "tr_max_size": 10.0, "tr_min_size": 1e-6,
         "abs_res_tol": 1e-8, "tr_l1_tol": 1e-5, "tr_linfty_tol": 1e-5,
         "tr_adaptive_gamma_update": False}
    if extra:
        o.update(extra)
    return o


def test_eigen_subproblem_converges():
    n, N = 12, 2
    prob = LowRankConProblem(n=n, N=N)

    eigh = CompactEigenApprox(nvars=n, N=N)
    qn0 = qnmod.qn_init(10, n)
    eqn = EigenQuasiNewton(qn0, eigh, index=0)
    sub = EigenSubproblem(prob, eqn)

    V = prob.V

    def update_model(x, eigh):
        # exact low-rank model: H = -V'V  =>  M = -I, hvecs = V
        eigh.set_approximation(M=-jnp.eye(N), hvecs=V)

    sub.set_eigen_model_update(update_model)
    # initialize the model at x0 too
    x0, _, _ = prob.get_vars_and_bounds()
    f0, c0 = prob.eval_obj_con(x0)
    g0, A0 = prob.eval_obj_con_gradient(x0)
    eigh.set_approximation(c0=c0[0], g0=A0[0], M=-jnp.eye(N), hvecs=V)

    tr = TrustRegion(prob, _opts(), subproblem=sub)
    res = tr.optimize()
    assert res["converged"], res

    # compare against the standard TR path on the same problem
    tr2 = TrustRegion(LowRankConProblem(n=n, N=N), _opts())
    res2 = tr2.optimize()
    assert res2["converged"], res2
    assert np.allclose(np.asarray(res["x"]), np.asarray(res2["x"]),
                       atol=1e-3), (res["x"], res2["x"])
    # constraint active or satisfied
    assert float(prob.constraints(res["x"])[0]) > -1e-6


def test_eigen_subproblem_N5_through_optimizer_facade():
    """The reference's example wiring (`eigenvalue_opt.py:298-306`):
    opt.setTrustRegionSubproblem(EigenSubproblem(...)) with N=5 hvecs, run
    through the Optimizer facade; matches the standard TR path."""
    from paropt_tpu.optimizer import Optimizer

    n, N = 16, 5
    prob = LowRankConProblem(n=n, N=N, seed=3)
    eigh = CompactEigenApprox(nvars=n, N=N)
    qn0 = qnmod.qn_init(10, n)
    eqn = EigenQuasiNewton(qn0, eigh, index=0)
    sub = EigenSubproblem(prob, eqn)
    V = prob.V
    sub.set_eigen_model_update(
        lambda x, e: e.set_approximation(M=-jnp.eye(N), hvecs=V))
    x0, _, _ = prob.get_vars_and_bounds()
    _, c0 = prob.eval_obj_con(x0)
    _, A0 = prob.eval_obj_con_gradient(x0)
    eigh.set_approximation(c0=c0[0], g0=A0[0], M=-jnp.eye(N), hvecs=V)

    opt = Optimizer(prob, dict(_opts({"algorithm": "tr"})))
    opt.set_trust_region_subproblem(sub)
    res = opt.optimize()
    assert res["converged"], res
    x, z, zw, zl, zu = opt.get_optimized_point()

    # independent KKT check at the solution: grad f = z * grad c with the
    # constraint active (no bounds active in the interior)
    x = jnp.asarray(x)
    assert float(prob.constraints(x)[0]) > -1e-6
    g, A = prob.eval_obj_con_gradient(x)
    stat = float(jnp.max(jnp.abs(g - float(z[0]) * A[0])))
    assert stat < 1e-3, stat
    # the multiplier of the active quadratic constraint is positive, so the
    # merged Hessian actually carried the -z0*H curvature
    assert float(z[0]) > 1e-8
    # the exact low-rank constraint model is the point of this path: the
    # plain-QN TR on the same problem fails to reach the same tolerance in
    # the same budget (verified when writing the test) — no comparison leg


def test_eigen_z0_sign_and_zero_convention():
    """compact() under multiplier sign changes: z0 < 0 scales the
    constraint block by 1/z0 (curvature flips), and z0 == 0 follows the
    reference's z0->0 convention (z0inv = 1,
    `ParOptCompactEigenvalueApprox.cpp:255-257`)."""
    n, N = 8, 3
    rng = np.random.default_rng(5)
    eigh = CompactEigenApprox(nvars=n, N=N)
    M = jnp.asarray(rng.standard_normal((N, N)))
    M = M @ M.T + 2 * jnp.eye(N)
    H = jnp.asarray(rng.standard_normal((N, n)))
    eigh.set_approximation(M=M, hvecs=H)
    qn0 = qnmod.qn_init(4, n)
    s = jnp.asarray(rng.standard_normal(n))
    qn0, _, _ = qnmod.qn_update(qn0, s, 1.5 * s)
    eqn = EigenQuasiNewton(qn0, eigh, index=0)
    x = jnp.asarray(rng.standard_normal(n))

    for z0 in (0.7, -0.4):
        eqn.update_multipliers(None, jnp.array([z0]), None)
        want = qnmod.qn_mult(qn0, x) + eigh.mult_add(-z0, x)
        got = eqn.mult(x)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-10), z0

    # z0 == 0: z0inv = 1 by convention -> constraint block still present
    # with unit scaling (matches the reference's branch exactly)
    eqn.update_multipliers(None, jnp.array([0.0]), None)
    b0, Z, Mfull = eqn.compact()
    K = 2 * qn0.msub
    assert np.allclose(np.asarray(Mfull[K:, K:]), np.asarray(eigh.Minv),
                       atol=1e-12)


def test_eigen_without_qn_objective():
    """use_quasi_newton_objective=False: B = -z0*H alone (b0 = 0, only the
    hvecs block, `ParOptCompactEigenvalueApprox.h:34-84` flag) — and a full
    TR solve still converges on the low-rank problem."""
    n, N = 12, 2
    rng = np.random.default_rng(7)
    eigh = CompactEigenApprox(nvars=n, N=N)
    M = jnp.eye(N) * 2.0
    H = jnp.asarray(rng.standard_normal((N, n)))
    eigh.set_approximation(M=M, hvecs=H)
    qn0 = qnmod.qn_init(4, n)
    eqn = EigenQuasiNewton(qn0, eigh, index=0)
    eqn.use_quasi_newton_objective = False
    eqn.z0 = jnp.asarray(0.5)
    b0, Z, Mc = eqn.compact()
    assert float(b0) == 0.0
    assert Z.shape == (N, n)
    x = jnp.asarray(rng.standard_normal(n))
    want = eigh.mult_add(-0.5, x)
    assert np.allclose(np.asarray(eqn.mult(x)), np.asarray(want), atol=1e-10)

    # full TR solve with the QN-objective leg disabled
    prob = LowRankConProblem(n=n, N=N, seed=9)
    eigh2 = CompactEigenApprox(nvars=n, N=N)
    eqn2 = EigenQuasiNewton(qnmod.qn_init(10, n), eigh2, index=0)
    eqn2.use_quasi_newton_objective = False
    sub = EigenSubproblem(prob, eqn2)
    V = prob.V
    sub.set_eigen_model_update(
        lambda x, e: e.set_approximation(M=-jnp.eye(N), hvecs=V))
    x0, _, _ = prob.get_vars_and_bounds()
    _, c0 = prob.eval_obj_con(x0)
    _, A0 = prob.eval_obj_con_gradient(x0)
    eigh2.set_approximation(c0=c0[0], g0=A0[0], M=-jnp.eye(N), hvecs=V)
    tr = TrustRegion(prob, _opts(), subproblem=sub)
    res = tr.optimize()
    assert res["converged"], res
    assert float(prob.constraints(res["x"])[0]) > -1e-6


def test_eigen_quasi_newton_compact_matches_mult():
    n, N = 8, 2
    rng = np.random.default_rng(1)
    eigh = CompactEigenApprox(nvars=n, N=N)
    eigh.set_approximation(M=jnp.asarray(rng.standard_normal((N, N)))
                           @ jnp.eye(N) + 2 * jnp.eye(N),
                           hvecs=jnp.asarray(rng.standard_normal((N, n))))
    qn0 = qnmod.qn_init(4, n)
    s = jnp.asarray(rng.standard_normal(n))
    qn0, _, _ = qnmod.qn_update(qn0, s, 2.0 * s)
    eqn = EigenQuasiNewton(qn0, eigh, index=0)
    eqn.z0 = jnp.asarray(0.7)

    x = jnp.asarray(rng.standard_normal(n))
    # direct: B_qn x - z0 * H x
    want = qnmod.qn_mult(qn0, x) + eigh.mult_add(-0.7, x)
    got = eqn.mult(x)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-10)
