"""Remaining reference-example anchors: sellar, maratos effect,
limited-memory, random quadratic (examples-as-tests, SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from paropt_tpu import InteriorPoint, Problem
from paropt_tpu.tr import TrustRegion


class Sellar(Problem):
    """`examples/sellar/sellar.py`: min x1^2 + x0 + x2 + exp(-x3)
    s.t. x0 + x1 - 1 >= 0."""

    def __init__(self):
        super().__init__(nvars=4, ncon=1)

    def objective(self, x):
        return x[1] ** 2 + x[0] + x[2] + jnp.exp(-x[3])

    def constraints(self, x):
        return jnp.array([x[0] + x[1] - 1.0])

    def get_vars_and_bounds(self):
        x0 = jnp.array([2.0, 1.0, 0.5, 0.5])
        lb = jnp.array([0.1, -10.0, 0.0, 0.0])
        ub = jnp.array([10.0, 10.0, 10.0, 10.0])
        return x0, lb, ub


class Maratos(Problem):
    """`examples/maratos_effect/maratos.py`: the classic Maratos example —
    min 2(x0-0.5)^2 + 2 x1^2  s.t.  x0^2 + x1^2 - 2 >= 0 (active)."""

    def __init__(self):
        super().__init__(nvars=2, ncon=1)

    def objective(self, x):
        return 2.0 * (x[0] - 0.5) ** 2 + 2.0 * x[1] ** 2

    def constraints(self, x):
        return jnp.array([x[0] ** 2 + x[1] ** 2 - 2.0])

    def get_vars_and_bounds(self):
        return (jnp.array([-1.0, 1.1]), jnp.full(2, -5.0), jnp.full(2, 5.0))


class RandomQuadratic(Problem):
    """`examples/random_quadratic/`: random PSD quadratic with bounds."""

    def __init__(self, n=20, seed=13):
        super().__init__(nvars=n, ncon=1)
        rng = np.random.default_rng(seed)
        M = rng.standard_normal((n, n)) / np.sqrt(n)
        self.Q = jnp.asarray(M @ M.T + 0.1 * np.eye(n))
        self.b = jnp.asarray(rng.standard_normal(n))

    def objective(self, x):
        return 0.5 * jnp.vdot(x, self.Q @ x) + jnp.vdot(self.b, x)

    def constraints(self, x):
        return jnp.array([jnp.sum(x) + 5.0])

    def get_vars_and_bounds(self):
        n = self.nvars
        return jnp.zeros(n), jnp.full(n, -3.0), jnp.full(n, 3.0)


def test_sellar():
    prob = Sellar()
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-8})
    res = ip.optimize()
    assert res["converged"], res
    x = np.asarray(res["x"])
    # closed form: on the active constraint x0 + x1 = 1, stationarity in
    # x1 gives x* = (0.5, 0.5, 0, 10) (x2 at lb, x3 at ub), so
    # f* = 0.75 + exp(-10)
    assert x[0] + x[1] >= 1.0 - 1e-6
    assert abs(x[2]) < 1e-5  # x2 at its lower bound 0
    assert np.allclose(x, [0.5, 0.5, 0.0, 10.0], atol=1e-4)
    assert res["fobj"] == pytest.approx(0.75 + np.exp(-10.0), rel=1e-6)


def test_maratos_ip_and_tr():
    """The Maratos problem: a curved active constraint that defeats naive
    linearized steps; both IP and TR must still converge to
    x* = (sqrt(2), 0) ... actually the minimizer on the circle closest to
    (0.5, 0): x* = (sqrt(2), 0)."""
    want = np.array([np.sqrt(2.0), 0.0])
    prob = Maratos()
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-8,
                              "max_major_iters": 300})
    res = ip.optimize()
    assert res["converged"], res
    assert np.allclose(np.asarray(res["x"]), want, atol=1e-4)

    tr = TrustRegion(Maratos(), {
        "tr_output_file": None, "output_file": None,
        "tr_max_iterations": 200, "abs_res_tol": 1e-8})
    res2 = tr.optimize()
    assert res2["converged"], res2
    assert np.allclose(np.asarray(res2["x"]), want, atol=1e-3)


@pytest.mark.parametrize("msub", [2, 5, 25])
def test_limited_memory_subspace_sizes(msub):
    """`examples/limited_memory_test/`: convergence across quasi-Newton
    subspace sizes."""
    prob = RandomQuadratic()
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-7,
                              "qn_subspace_size": msub,
                              "max_major_iters": 400})
    res = ip.optimize()
    assert res["converged"], (msub, res)


def test_limited_memory_lsr1():
    prob = RandomQuadratic(seed=17)
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-7,
                              "qn_type": "sr1", "max_major_iters": 400})
    res = ip.optimize()
    assert res["converged"], res


def test_toy_all_algorithms():
    """The two-ball toy problem (`examples/toy/toy.py` role) across ip/tr."""
    import numpy as np
    from paropt_tpu.models.analytic import Toy
    from paropt_tpu.optimizer import Optimizer

    sols = []
    for alg in ("ip", "tr"):
        opt = Optimizer(Toy(), {
            "algorithm": alg, "output_file": None, "tr_output_file": None,
            "abs_res_tol": 1e-8, "tr_max_iterations": 200})
        res = opt.optimize()
        x = np.asarray(res["x"])
        con = np.asarray(Toy().constraints(res["x"]))
        assert (con > -1e-5).all(), (alg, con)
        sols.append(x)
    assert np.allclose(sols[0], sols[1], atol=1e-3)


def test_small_problems_gallery():
    """The 2-D demo gallery (`examples/python/examples.py` role) reaches
    known optima from fixed starts."""
    import os
    import numpy as np
    import jax.numpy as jnp
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "small_problems",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "small_problems.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from paropt_tpu.optimizer import Optimizer
    # the convex quadratic has the analytic constrained optimum (0.25, 0.25)
    prob = mod.Demo2D(mod.OBJECTIVES[0][1], jnp.array([1.5, -1.0]))
    res = Optimizer(prob, {"algorithm": "ip", "output_file": None,
                           "abs_res_tol": 1e-8}).optimize()
    assert np.allclose(np.asarray(res["x"]), [0.25, 0.25], atol=1e-4)
    # rosenbrock from a feasible start
    prob = mod.Demo2D(mod.OBJECTIVES[4][1], jnp.array([-1.0, 2.0]))
    res = Optimizer(prob, {"algorithm": "ip", "output_file": None,
                           "abs_res_tol": 1e-8,
                           "max_major_iters": 400}).optimize()
    assert np.allclose(np.asarray(res["x"]), [1.0, 1.0], atol=1e-3)
