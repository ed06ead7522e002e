"""MMA and Optimizer-facade tests."""

import numpy as np
import pytest

from paropt_tpu.mma import MMA
from paropt_tpu.optimizer import Optimizer
from paropt_tpu.models.analytic import (Rosenbrock, RandomConvexQP,
                                        SparseRosenbrock, SimpleQuadratic)


def test_mma_quadratic_bounds():
    prob = SimpleQuadratic(n=12)
    mma = MMA(prob, {"mma_output_file": None, "output_file": None,
                     "mma_max_iterations": 100})
    res = mma.optimize()
    assert res["converged"], res
    assert np.allclose(np.asarray(res["x"]), np.asarray(prob.solution()),
                       atol=1e-3)


def test_mma_constrained_qp():
    # MMA is a conservative separable approximation: on a strongly coupled
    # dense QP it converges linearly, so check solution quality against a
    # direct IP solve rather than a tight KKT tolerance.
    prob = RandomConvexQP(n=16, ncon=2, seed=21)
    mma = MMA(prob, {"mma_output_file": None, "output_file": None,
                     "mma_max_iterations": 100})
    res = mma.optimize()
    from paropt_tpu import InteriorPoint
    prob2 = RandomConvexQP(n=16, ncon=2, seed=21)
    ip = InteriorPoint(prob2, {"output_file": None, "abs_res_tol": 1e-9})
    res_ip = ip.optimize()
    assert res["l1"] < 1e-2, res
    assert np.allclose(np.asarray(res["x"]), np.asarray(res_ip["x"]),
                       atol=1e-2)
    assert res["fobj"] == pytest.approx(res_ip["fobj"], abs=1e-4)


def test_mma_linearized_constraints():
    prob = RandomConvexQP(n=10, ncon=2, seed=22)
    mma = MMA(prob, {"mma_output_file": None, "output_file": None,
                     "mma_use_constraint_linearization": True,
                     "mma_max_iterations": 200})
    res = mma.optimize()
    assert res["converged"], res


def test_mma_sparse_constraints():
    prob = SparseRosenbrock()
    mma = MMA(prob, {"mma_output_file": None, "output_file": None,
                     "mma_max_iterations": 300})
    res = mma.optimize()
    # MMA converges slowly on nonconvex rosenbrock; just require progress
    # toward the solution and feasibility
    x = np.asarray(res["x"])
    assert float(prob.sparse_constraints(res["x"])[0]) > -1e-6
    assert res["fobj"] < 1.0


@pytest.mark.parametrize("algo", ["ip", "tr", "mma"])
def test_optimizer_facade(algo):
    prob = RandomConvexQP(n=12, ncon=2, seed=30)
    opts = {"algorithm": algo, "output_file": None, "tr_output_file": None,
            "mma_output_file": None, "mma_max_iterations": 200}
    opt = Optimizer(prob, opts)
    res = opt.optimize()
    assert res["converged"], (algo, res)
    x, z, zw, zl, zu = opt.get_optimized_point()
    assert np.asarray(x).shape == (12,)
