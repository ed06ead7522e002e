"""Randomized cross-algorithm consistency sweep: random convex problems with
mixed bounds/equalities solved by IP and TR must agree."""

import numpy as np
import jax.numpy as jnp
import pytest

from paropt_tpu import InteriorPoint, Problem
from paropt_tpu.tr import TrustRegion


class RandomMixed(Problem):
    """Random convex QP with a mix of inequality and equality constraints
    and partially-infinite bounds."""

    def __init__(self, n, ncon, neq, seed):
        super().__init__(nvars=n, ncon=ncon, ninequality=ncon - neq)
        rng = np.random.default_rng(seed)
        M = rng.standard_normal((n, n)) / np.sqrt(n)
        self.Q = jnp.asarray(M @ M.T + 0.3 * np.eye(n))
        self.b = jnp.asarray(rng.standard_normal(n))
        self.Amat = jnp.asarray(rng.standard_normal((ncon, n)) / np.sqrt(n))
        self.rhs = jnp.asarray(rng.standard_normal(ncon) * 0.2)
        lb = np.full(n, -2.0)
        ub = np.full(n, 2.0)
        free = rng.random(n) < 0.3
        lb[free] = -1e21   # beyond max_bound_value => unbounded below
        self.lb, self.ub = jnp.asarray(lb), jnp.asarray(ub)
        self.x0 = jnp.asarray(rng.uniform(-0.5, 0.5, n))

    def objective(self, x):
        return 0.5 * jnp.vdot(x, self.Q @ x) + jnp.vdot(self.b, x)

    def constraints(self, x):
        return self.Amat @ x - self.rhs

    def get_vars_and_bounds(self):
        return self.x0, self.lb, self.ub


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_random_mixed_ip_vs_tr(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(8, 24))
    ncon = int(rng.integers(1, 4))
    neq = int(rng.integers(0, ncon + 1))
    ip = InteriorPoint(RandomMixed(n, ncon, neq, seed),
                       {"output_file": None, "abs_res_tol": 1e-9,
                        "max_major_iters": 400})
    res_ip = ip.optimize()
    assert res_ip["converged"], (seed, res_ip)

    tr = TrustRegion(RandomMixed(n, ncon, neq, seed),
                     {"output_file": None, "tr_output_file": None,
                      "abs_res_tol": 1e-9, "tr_max_iterations": 300,
                      "tr_l1_tol": 1e-6, "tr_linfty_tol": 1e-6})
    res_tr = tr.optimize()
    assert res_tr["converged"], (seed, res_tr)
    assert np.allclose(np.asarray(res_ip["x"]), np.asarray(res_tr["x"]),
                       atol=2e-3), (seed, res_ip["fobj"], res_tr["fobj"])

    # KKT sanity at the IP solution: feasibility of both families
    prob = RandomMixed(n, ncon, neq, seed)
    c = np.asarray(prob.constraints(res_ip["x"]))
    assert (c[:ncon - neq] > -1e-6).all()          # inequalities
    if neq:
        assert np.abs(c[ncon - neq:]).max() < 1e-5  # equalities
