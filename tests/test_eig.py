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
