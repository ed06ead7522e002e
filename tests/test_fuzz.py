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


@pytest.mark.parametrize("seed", [7, 17])
def test_random_csr_sparse_problems(seed):
    """Random general-CSR sparse-constraint problems through the native
    factorization path (random overlap patterns, occasional dense column):
    IP converges and the solution is feasible + complementary."""
    import numpy as np
    import jax.numpy as jnp
    from paropt_tpu import InteriorPoint
    from paropt_tpu.problem import CSRSparseProblem

    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 50))
    m = int(rng.integers(5, 15))
    rowp = [0]
    cols = []
    for i in range(m):
        k = int(rng.integers(2, 6))
        idx = set(rng.choice(n, size=k, replace=False).tolist())
        if seed % 2 and i % 3 == 0:
            idx.add(n - 1)          # recurring variable -> dense-ish column
        cols.extend(sorted(idx))
        rowp.append(len(cols))
    rowp = np.asarray(rowp, np.int32)
    cols = np.asarray(cols, np.int32)
    w = rng.uniform(0.5, 2.0, size=len(cols))
    targets = rng.uniform(0.5, 1.5, size=n)
    caps = []
    for i in range(m):
        caps.append(float(w[rowp[i]:rowp[i + 1]].sum()) * 0.6)
    caps = np.asarray(caps)

    class RandCSR(CSRSparseProblem):
        def __init__(self):
            super().__init__(nvars=n, ncon=0, rowp=rowp, cols=cols)

        def objective(self, x):
            return jnp.sum((x - jnp.asarray(targets)) ** 2)

        def eval_sparse_con(self, x):
            out = []
            for i in range(m):
                sl = slice(rowp[i], rowp[i + 1])
                out.append(caps[i] - jnp.sum(jnp.asarray(w[sl])
                                             * x[cols[sl]]))
            return jnp.stack(out)

        def eval_sparse_jacobian_data(self, x):
            return -jnp.asarray(w)

        def get_vars_and_bounds(self):
            return (jnp.full(n, 0.3), jnp.zeros(n), jnp.ones(n))

    prob = RandCSR()
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-7,
                              "max_major_iters": 300})
    res = ip.optimize()
    assert res["converged"], res
    x = np.asarray(res["x"])
    cw = np.asarray(prob.eval_sparse_con(res["x"]))
    assert (cw > -1e-6).all()
    # complementarity: multipliers vanish on inactive constraints
    zw = np.asarray(ip.vars.zw)
    assert (np.abs(zw * cw) < 1e-4).all()
