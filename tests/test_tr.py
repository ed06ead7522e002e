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
