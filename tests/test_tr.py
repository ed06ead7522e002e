"""Trust-region (SL1QP + filter) convergence tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from paropt_tpu.tr import TrustRegion
from paropt_tpu.models.analytic import (
    Rosenbrock, SparseRosenbrock, RandomConvexQP, ScalableRosenbrock)


def _tr_opts(extra=None):
    opts = {
        "tr_output_file": None,
        "tr_init_size": 0.5,
        "tr_min_size": 1e-6,
        "tr_max_size": 10.0,
        "tr_eta": 0.25,
        "tr_max_iterations": 200,
        "tr_infeas_tol": 1e-6,
        "tr_l1_tol": 1e-5,
        "tr_linfty_tol": 1e-5,
        "abs_res_tol": 1e-8,
        "output_file": None,
    }
    if extra:
        opts.update(extra)
    return opts


def test_tr_rosenbrock_sl1qp():
    prob = Rosenbrock()
    tr = TrustRegion(prob, _tr_opts())
    res = tr.optimize()
    assert res["converged"], res
    assert np.allclose(np.asarray(res["x"]), [1.0, 1.0], atol=1e-3), res["x"]


def test_tr_rosenbrock_no_adaptive():
    prob = Rosenbrock()
    tr = TrustRegion(prob, _tr_opts({"tr_adaptive_gamma_update": False}))
    res = tr.optimize()
    assert res["converged"], res
    assert np.allclose(np.asarray(res["x"]), [1.0, 1.0], atol=1e-3)


def test_tr_rosenbrock_filter():
    prob = Rosenbrock()
    tr = TrustRegion(prob, _tr_opts(
        {"tr_accept_step_strategy": "filter_method"}))
    res = tr.optimize()
    assert res["converged"], res
    assert np.allclose(np.asarray(res["x"]), [1.0, 1.0], atol=1e-3), res["x"]


def test_tr_convex_qp():
    prob = RandomConvexQP(n=16, ncon=2, seed=11)
    tr = TrustRegion(prob, _tr_opts())
    res = tr.optimize()
    assert res["converged"], res
    # cross-check against a direct IP solve of the same problem
    from paropt_tpu import InteriorPoint
    prob2 = RandomConvexQP(n=16, ncon=2, seed=11)
    ip = InteriorPoint(prob2, {"output_file": None, "abs_res_tol": 1e-9,
                               "max_major_iters": 300})
    res_ip = ip.optimize()
    assert np.allclose(np.asarray(res["x"]), np.asarray(res_ip["x"]),
                       atol=1e-3), (res["x"], res_ip["x"])


def test_tr_sparse_constraints():
    prob = SparseRosenbrock()
    tr = TrustRegion(prob, _tr_opts())
    res = tr.optimize()
    assert res["converged"], res
    assert np.allclose(np.asarray(res["x"]), [1.0, 1.0], atol=1e-3)


def test_tr_log_contract(tmp_path):
    from paropt_tpu import unpack_tr_output
    path = str(tmp_path / "paropt.tr")
    prob = Rosenbrock()
    tr = TrustRegion(prob, _tr_opts({"tr_output_file": path}))
    res = tr.optimize()
    hist = unpack_tr_output(path)
    assert len(hist["iter"]) == res["niter"]
    assert hist["fobj"][-1] == pytest.approx(res["fobj"], rel=1e-3, abs=1e-6)


def test_tr_filter_with_soc():
    """Filter method with second-order correction enabled."""
    prob = Rosenbrock()
    tr = TrustRegion(prob, _tr_opts({
        "tr_accept_step_strategy": "filter_method",
        "tr_use_soc": True,
        "tr_max_soc_iterations": 5,
    }))
    res = tr.optimize()
    assert res["converged"], res
    assert np.allclose(np.asarray(res["x"]), [1.0, 1.0], atol=1e-3)


def test_tr_maratos_soc():
    """The Maratos problem (N&W ex 15.4, `examples/maratos_effect`): an
    equality circle constraint where full steps near x* are rejected without
    a second-order correction.  Filter + SOC must converge to (sqrt(2), 0)."""
    from paropt_tpu.models.analytic import Maratos

    prob = Maratos()
    tr = TrustRegion(prob, _tr_opts({
        "tr_accept_step_strategy": "filter_method",
        "tr_use_soc": True,
        "tr_max_soc_iterations": 5,
        "tr_init_size": 1.0,
        "tr_adaptive_gamma_update": False,
        "penalty_gamma": 100.0,
    }))
    res = tr.optimize()
    assert res["converged"], res
    x = np.asarray(res["x"])
    assert np.allclose(x, np.asarray(prob.solution()), atol=1e-3), x
    # the equality constraint holds at the solution
    assert abs(float(prob.constraints(res["x"])[0])) < 1e-4


def test_tr_maratos_soc_beats_no_soc():
    """SOC accepts steps the plain filter rejects on Maratos: with SOC the
    solve needs no more (and typically fewer) outer iterations."""
    from paropt_tpu.models.analytic import Maratos

    def solve(use_soc):
        tr = TrustRegion(Maratos(), _tr_opts({
            "tr_accept_step_strategy": "filter_method",
            "tr_use_soc": use_soc,
            "tr_max_soc_iterations": 5,
            "tr_init_size": 1.0,
            "tr_adaptive_gamma_update": False,
            "penalty_gamma": 100.0,
        }))
        res = tr.optimize()
        assert res["converged"], res
        return res["niter"]

    assert solve(True) <= solve(False)


def test_fused_tr_matches_host_loop():
    """The fully-fused SL1QP trust-region outer loop (one XLA computation,
    `FusedTR`) reproduces the host outer-loop trajectory on the synthetic
    topology problem: identical iterate, objective, and KKT errors."""
    import jax.numpy as jnp
    from paropt_tpu.models.topology import SyntheticTopology
    from paropt_tpu.tr import TrustRegion, FusedTR

    opts = {"tr_output_file": None, "output_file": None,
            "tr_max_iterations": 20, "abs_res_tol": 1e-8,
            "tr_infeas_tol": 1e-5, "tr_l1_tol": 1e-6, "tr_linfty_tol": 1e-6}
    host = TrustRegion(SyntheticTopology(n=256, block=8, dtype=jnp.float64),
                       dict(opts))
    rh = host.optimize()
    fus = FusedTR(SyntheticTopology(n=256, block=8, dtype=jnp.float64),
                  dict(opts))
    rf, st = fus.solve()
    assert rf["niter"] == rh["niter"]
    assert abs(rf["fobj"] - rh["fobj"]) < 1e-10
    assert np.max(np.abs(np.asarray(rf["x"]) - np.asarray(rh["x"]))) < 1e-9
    assert rf["linfty"] == pytest.approx(rh["linfty"], rel=1e-6, abs=1e-12)
    assert int(st.subiters) > 0


def test_fused_tr_converges_and_python_loop_mode():
    """FusedTR terminates on the normalized KKT criterion; the python-loop
    stepping mode gives the same trajectory."""
    import jax.numpy as jnp
    from paropt_tpu.models.topology import SyntheticTopology
    from paropt_tpu.tr import FusedTR

    opts = {"tr_output_file": None, "output_file": None,
            "tr_max_iterations": 60, "abs_res_tol": 1e-8,
            "tr_infeas_tol": 1e-5, "tr_l1_tol": 0.0, "tr_linfty_tol": 1e-4}
    fus = FusedTR(SyntheticTopology(n=512, block=8, dtype=jnp.float64),
                  dict(opts))
    r1, _ = fus.solve()
    assert r1["converged"], r1
    assert r1["infeas"] < 1e-5 and r1["linfty"] < 1e-4
    r2, _ = fus.solve(jit_loop=False)
    assert r2["niter"] == r1["niter"]
    assert np.allclose(np.asarray(r1["x"]), np.asarray(r2["x"]), atol=1e-12)


def test_fused_tr_fem_matches_host():
    """FusedTR on the SIMP FEM compliance problem (the flagship workload)
    matches the host TR trajectory through 15 outer iterations."""
    from paropt_tpu.models.fem_topology import FEMTopology
    from paropt_tpu.tr import TrustRegion, FusedTR

    opts = {"tr_output_file": None, "output_file": None,
            "tr_max_iterations": 15, "abs_res_tol": 1e-7,
            "tr_infeas_tol": 1e-5, "tr_l1_tol": 0.0, "tr_linfty_tol": 1e-5}
    prob = FEMTopology(nex=12, ney=6, cg_iters=300)
    rh = TrustRegion(prob, dict(opts)).optimize()
    rf, _ = FusedTR(prob, dict(opts)).solve()
    assert rf["niter"] == rh["niter"]
    assert abs(rf["fobj"] - rh["fobj"]) < 1e-8
    assert np.max(np.abs(np.asarray(rf["x"]) - np.asarray(rh["x"]))) < 1e-8


def test_fused_tr_nan_trial_fail_stop():
    """A non-finite trial evaluation (e.g. a diverged f32 CG solve) must be
    REJECTED — never accepted even at tr_min — must not poison the QN
    state, and must shrink the radius so the loop recovers (the FusedIP
    freeze's analogue; host ladder at ParOptInteriorPoint.cpp:4019-4026)."""
    import jax.numpy as jnp
    from paropt_tpu.problem import Problem
    from paropt_tpu.tr import FusedTR

    class LogBarrierBowl(Problem):
        """Quadratic pulling toward x=1.6 with a -0.01*log(1.3 - max(x))
        term: any trial beyond 1.3 evaluates to NaN."""

        def __init__(self):
            super().__init__(nvars=4, ncon=0)

        def objective(self, x):
            return (jnp.sum((x - 1.6) ** 2)
                    - 0.01 * jnp.log(1.3 - jnp.max(x)))

        def get_vars_and_bounds(self):
            return (jnp.full(4, 0.5), jnp.full(4, -2.0), jnp.full(4, 2.0))

    opts = {"tr_output_file": None, "output_file": None,
            "tr_max_iterations": 40, "tr_init_size": 0.5,
            "tr_adaptive_gamma_update": False,
            "abs_res_tol": 1e-8, "tr_infeas_tol": 1e-5,
            "tr_l1_tol": 0.0, "tr_linfty_tol": 1e-5}
    r, st = FusedTR(LogBarrierBowl(), dict(opts)).solve()
    x = np.asarray(r["x"])
    assert np.all(np.isfinite(x)), x
    assert np.isfinite(r["fobj"])
    assert np.all(x < 1.3)                     # never accepted a NaN trial
    assert x[0] > 1.0                          # and still made real progress
    assert np.all(np.isfinite(np.asarray(st.gk)))
    if st.qn is not None:
        assert bool(jnp.all(jnp.isfinite(st.qn.buf)))


def test_fused_tr_honors_inner_ip_options():
    """FusedTR maps the full registry->FusedIPOptions set the host
    TrustRegion does (shared _fused_ip_options): a non-default
    max_line_iters/barrier fraction must reach the inner QP solver."""
    from paropt_tpu.models.topology import SyntheticTopology
    from paropt_tpu.tr import FusedTR

    prob = SyntheticTopology(n=128, block=8)
    # constructing must succeed with non-default inner options...
    FusedTR(prob, {"tr_output_file": None, "output_file": None,
                   "max_line_iters": 7, "monotone_barrier_fraction": 0.1})
    # ...and the shared mapping (used by BOTH FusedTR and the host
    # TrustRegion's fused subproblem solves) must carry them through
    from paropt_tpu.tr import _fused_ip_options
    from paropt_tpu.utils.options import make_options
    o = make_options({"max_line_iters": 7,
                      "monotone_barrier_fraction": 0.1}, which="facade")
    mapped = _fused_ip_options(o, o["barrier_strategy"],
                               o["starting_point_strategy"], False)
    assert mapped.max_line_iters == 7
    assert mapped.monotone_barrier_fraction == 0.1


def test_fused_tr_solve_batched_multistart():
    """k multi-start fused TR solves as ONE vmapped while_loop: each
    instance matches its own single solve (the FusedMMA.solve_batched
    pattern)."""
    import dataclasses
    import jax.numpy as jnp
    from paropt_tpu.models.fem_topology import FEMTopology
    from paropt_tpu.tr import FusedTR

    prob = FEMTopology(nex=8, ney=4, cg_iters=200)
    fus = FusedTR(prob, {"tr_output_file": None, "output_file": None,
                         "tr_max_iterations": 10, "abs_res_tol": 1e-7,
                         "tr_infeas_tol": 1e-5, "tr_l1_tol": 0.0,
                         "tr_linfty_tol": 1e-5})
    x0, _, _ = prob.get_vars_and_bounds()
    rng = np.random.default_rng(1)
    x0s = np.clip(np.asarray(x0)[None, :]
                  * rng.uniform(0.6, 1.4, (3, prob.nvars)), 0.05, 0.95)
    res, states = fus.solve_batched(jnp.asarray(x0s))
    assert res["fobj"].shape == (3,)
    assert np.all(np.isfinite(res["fobj"]))
    assert np.all(res["infeas"] < 1e-5)

    xv = jnp.asarray(x0s[2])
    f0, c0, cw0 = fus._ev((), xv)
    g0, A0 = fus._gr((), xv)
    s0 = dataclasses.replace(fus._state0, xk=xv, fk=f0, ck=c0, gk=g0,
                             Ak=A0, cwk=cw0)
    r2, _ = fus.solve(s0)
    assert res["niter"][2] == r2["niter"]
    np.testing.assert_allclose(res["fobj"][2], r2["fobj"], rtol=1e-9)
    np.testing.assert_allclose(np.asarray(states.xk[2]),
                               np.asarray(r2["x"]), atol=1e-9)
