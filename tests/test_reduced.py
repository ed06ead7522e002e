"""ReducedProblem: optimize over a subset of the design variables
(`examples/reduced_problem/reduced.py` role)."""

import jax.numpy as jnp
import numpy as np
import pytest

from paropt_tpu import InteriorPoint, Problem, ReducedProblem
from paropt_tpu.optimizer import Optimizer


class Quartic(Problem):
    """min x0^4 + x1^4 + x2^4  s.t.  x0 + x1 + x2 - 1 >= 0
    (`examples/reduced_problem/reduced.py:4-10` problem)."""

    def __init__(self):
        super().__init__(nvars=3, ncon=1)

    def objective(self, x):
        return jnp.sum(x ** 4)

    def constraints(self, x):
        return jnp.array([x[0] + x[1] + x[2] - 1.0])

    def get_vars_and_bounds(self):
        return jnp.ones(3), jnp.zeros(3), jnp.full(3, 10.0)


def test_reduced_matches_manual_elimination():
    # fix x0 = 0.1; optimum of the reduced problem: x1 = x2 = 0.45
    red = ReducedProblem(Quartic(), fixed_idx=[0], fixed_vals=[0.1])
    assert red.nvars == 2 and red.ncon == 1
    ip = InteriorPoint(red, {"output_file": None, "abs_res_tol": 1e-8})
    res = ip.optimize()
    assert res["converged"]
    x = np.asarray(res["x"])
    assert np.allclose(x, [0.45, 0.45], atol=1e-4)
    xfull = np.asarray(red.expand(res["x"]))
    assert np.allclose(xfull, [0.1, 0.45, 0.45], atol=1e-4)


def test_reduced_gradients_and_hvp():
    red = ReducedProblem(Quartic(), fixed_idx=[1], fixed_vals=[0.3])
    x = jnp.array([0.7, 0.2])
    g, A = red.eval_obj_con_gradient(x)
    assert np.allclose(g, [4 * 0.7 ** 3, 4 * 0.2 ** 3])
    assert np.allclose(A, [[1.0, 1.0]])
    hv = red.eval_hvec_product(x, jnp.zeros(1), None, jnp.array([1.0, 0.0]))
    assert np.allclose(hv, [12 * 0.7 ** 2, 0.0])


def test_reduced_with_tr_facade():
    red = ReducedProblem(Quartic(), fixed_idx=[0], fixed_vals=[0.1])
    opt = Optimizer(red, {"algorithm": "tr", "output_file": None,
                          "tr_output_file": None,
                          "tr_max_iterations": 100})
    res = opt.optimize()
    x = np.asarray(res["x"])
    assert np.allclose(x, [0.45, 0.45], atol=1e-3)


def test_reduced_validation():
    with pytest.raises(ValueError):
        ReducedProblem(Quartic(), fixed_idx=[0, 0], fixed_vals=[0.1, 0.2])
    with pytest.raises(ValueError):
        ReducedProblem(Quartic(), fixed_idx=[0], fixed_vals=[0.1, 0.2])
