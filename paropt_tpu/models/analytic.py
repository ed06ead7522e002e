"""Analytic benchmark problems mirroring the reference examples.

The reference uses its `examples/` tree as de-facto integration tests
(SURVEY.md §4): analytic problems with known solutions exercised across all
three algorithms.  These are re-expressed as differentiable JAX problems so
every gradient/Jacobian is autodiff-derived.

- `Rosenbrock`       — `examples/rosenbrock/rosenbrock.py`: 2 vars, 1 dense
                        constraint x0+x1+5 >= 0, bounds [-2, 2], x* = (1, 1).
- `SparseRosenbrock` — `examples/sparse/sparse_rosenbrock.py`: same objective
                        with the constraint expressed as a sparse weighting
                        constraint (nwcon=1, nwblock=1).
- `ScalableRosenbrock` — `examples/rosenbrock/rosenbrock.cpp:9-26`: n-var
                        chained Rosenbrock with sparse weighting constraints.
- `RandomConvexQP`   — `examples/random_convex`: convex QP with known
                        optimum, dense constraints.
- `Sellar`           — `examples/sellar`: small nonconvex constrained problem.
- `Maratos`          — `examples/maratos_effect/maratos.py`: Nocedal & Wright
                        example 15.4, one EQUALITY constraint on a circle;
                        full steps near x* increase both objective and
                        violation (the Maratos effect), exercising the TR
                        second-order correction.
- `RandomQuadratic`  — `examples/random_quadratic/random_quadratic.py` and
                        `examples/limited_memory_test`: quadratic with a
                        prescribed eigenvalue spectrum A = Q diag(eigs) Qᵀ and
                        one linear constraint; the spectrum controls how many
                        quasi-Newton updates are needed, which is what the
                        limited-memory study varies.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..problem import Problem, SparseJacobian

__all__ = ["Rosenbrock", "SparseRosenbrock", "ScalableRosenbrock",
           "RandomConvexQP", "Sellar", "SimpleQuadratic", "Toy",
           "Maratos", "RandomQuadratic"]


class Rosenbrock(Problem):
    """2-var Rosenbrock, one dense constraint c = x0 + x1 + 5 >= 0."""

    def __init__(self, x0=None):
        super().__init__(nvars=2, ncon=1)
        self._x0 = x0

    def objective(self, x):
        return 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2

    def constraints(self, x):
        return jnp.array([x[0] + x[1] + 5.0])

    def get_vars_and_bounds(self):
        x = (jnp.asarray(self._x0) if self._x0 is not None
             else jnp.array([-1.5, -1.0]))
        return x, jnp.full(2, -2.0), jnp.full(2, 2.0)


class SparseRosenbrock(Problem):
    """Rosenbrock with the linear constraint as a sparse weighting
    constraint (nwcon=1, nwblock=1)."""

    def __init__(self, x0=None):
        super().__init__(nvars=2, ncon=0, nwcon=1, nwblock=1)
        self._x0 = x0

    def objective(self, x):
        return 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2

    def sparse_constraints(self, x):
        return jnp.array([x[0] + x[1] + 5.0])

    def sparse_jacobian(self, x):
        return SparseJacobian(
            nvars=2, cols=jnp.array([[0, 1]]), vals=jnp.ones((1, 2)),
            nwblock=1)

    def get_vars_and_bounds(self):
        x = (jnp.asarray(self._x0) if self._x0 is not None
             else jnp.array([-1.5, -1.0]))
        return x, jnp.full(2, -2.0), jnp.full(2, 2.0)


class ScalableRosenbrock(Problem):
    """n-var chained Rosenbrock with one dense and optional sparse weighting
    constraints (the scalable C++ example, `examples/rosenbrock/
    rosenbrock.cpp:9-26`): groups of `group` consecutive variables satisfy
    sum(x_group) <= group/2, expressed as cw = group/2 - sum >= 0."""

    def __init__(self, n=64, group=4, use_sparse=True):
        assert n % group == 0
        nwcon = n // group if use_sparse else 0
        super().__init__(nvars=n, ncon=1, nwcon=nwcon, nwblock=1)
        self.group = group
        cols = np.arange(n).reshape(nwcon if use_sparse else 1, -1)
        if use_sparse:
            self._jac = SparseJacobian(
                nvars=n, cols=jnp.asarray(cols),
                vals=-jnp.ones((nwcon, group)), nwblock=1)

    def objective(self, x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1.0 - x[:-1]) ** 2)

    def constraints(self, x):
        # one dense global resource constraint
        return jnp.array([0.25 * self.nvars - jnp.sum(x ** 2)])

    def sparse_constraints(self, x):
        return (0.5 * self.group
                - jnp.sum(x.reshape(self.nwcon, self.group), axis=1))

    def sparse_jacobian(self, x):
        return self._jac

    def get_vars_and_bounds(self):
        n = self.nvars
        x = jnp.full(n, -0.5) + 0.1 * jnp.sin(jnp.arange(n, dtype=jnp.float64))
        return x, jnp.full(n, -2.0), jnp.full(n, 2.0)


class RandomConvexQP(Problem):
    """Convex QP:  min 1/2 x'Qx - b'x  s.t.  Ax - 1 >= 0, 0 <= x <= 10
    with random SPD Q (`examples/random_convex`)."""

    def __init__(self, n=32, ncon=4, seed=0):
        super().__init__(nvars=n, ncon=ncon)
        rng = np.random.default_rng(seed)
        M = rng.standard_normal((n, n)) / np.sqrt(n)
        self.Q = jnp.asarray(M @ M.T + 0.5 * np.eye(n))
        self.b = jnp.asarray(rng.standard_normal(n))
        self.Amat = jnp.asarray(np.abs(rng.standard_normal((ncon, n))) / n)

    def objective(self, x):
        return 0.5 * jnp.vdot(x, self.Q @ x) - jnp.vdot(self.b, x)

    def constraints(self, x):
        return self.Amat @ x - 1.0

    def get_vars_and_bounds(self):
        n = self.nvars
        return jnp.full(n, 2.0), jnp.zeros(n), jnp.full(n, 10.0)


class Sellar(Problem):
    """Sellar problem (`examples/sellar/sellar.py`):
    min x2^2 + x1 + x0 + exp(-x3)  (a common variant)
    Here: the classic reduced Sellar form with 2 constraints."""

    def __init__(self):
        super().__init__(nvars=4, ncon=2)

    def objective(self, x):
        return x[0] ** 2 + x[1] + x[2] + jnp.exp(-x[3])

    def constraints(self, x):
        y1 = x[1] + x[0] ** 2 + x[2] - 0.2 * x[3]
        y2 = jnp.sqrt(jnp.abs(y1) + 1e-12) + x[1] + x[2]
        return jnp.array([y1 / 3.16 - 1.0, 1.0 - y2 / 24.0])

    def get_vars_and_bounds(self):
        x = jnp.array([1.0, 5.0, 2.0, 1.0])
        lb = jnp.array([-10.0, 0.0, 0.0, -10.0])
        ub = jnp.array([10.0, 10.0, 10.0, 10.0])
        return x, lb, ub


class SimpleQuadratic(Problem):
    """min ||x - x_target||^2 with box bounds; known closed-form optimum =
    clip(x_target, lb, ub).  Pure bound-constrained sanity check."""

    def __init__(self, n=16, target_scale=2.0):
        super().__init__(nvars=n, ncon=0)
        t = np.linspace(-target_scale, target_scale, n)
        self.target = jnp.asarray(t)

    def objective(self, x):
        return jnp.sum((x - self.target) ** 2)

    def get_vars_and_bounds(self):
        n = self.nvars
        return jnp.zeros(n), jnp.full(n, -1.0), jnp.full(n, 1.0)

    def solution(self):
        return jnp.clip(self.target, -1.0, 1.0)


class Maratos(Problem):
    """Nocedal & Wright example 15.4 (`examples/maratos_effect/maratos.py`):

        min  2 (x0 - 0.5)^2 + 2 x1^2
        s.t. x0^2 + x1^2 - 2 = 0     (equality: ninequality=0)

    with x in [-10, 10]^2 from (1, 1).  The solution is x* = (sqrt(2), 0).
    Near x* a full step along the linearized constraint increases both the
    objective and the violation — the Maratos effect — so unit steps are
    rejected unless a second-order correction re-solves with the constraint
    re-expanded at the trial point (`tr_use_soc`)."""

    def __init__(self, x0=(1.0, 1.0)):
        super().__init__(nvars=2, ncon=1, ninequality=0)
        self._x0 = jnp.asarray(x0, dtype=jnp.result_type(float))

    def objective(self, x):
        return 2.0 * (x[0] - 0.5) ** 2 + 2.0 * x[1] ** 2

    def constraints(self, x):
        return jnp.array([x[0] ** 2 + x[1] ** 2 - 2.0])

    def get_vars_and_bounds(self):
        return self._x0, jnp.full(2, -10.0), jnp.full(2, 10.0)

    def solution(self):
        return jnp.array([jnp.sqrt(2.0), 0.0])


class RandomQuadratic(Problem):
    """Quadratic with a prescribed spectrum (`examples/random_quadratic/
    random_quadratic.py`, also the problem class of
    `examples/limited_memory_test`):

        min  1/2 x'Ax + b'x    A = Q diag(eigs) Q',  Q random orthogonal
        s.t. a'x + b0 >= 0,    x in [-5, 5]^n

    The eigenvalue spectrum sets the difficulty for limited-memory
    quasi-Newton methods: a spectrum with k distinct clusters is solved in
    ~k updates, so sweeping `msub`/`qn_subspace_size` against `eigs`
    reproduces the reference's limited-memory study."""

    def __init__(self, eigs, seed=0):
        eigs = np.asarray(eigs, dtype=float)
        n = eigs.size
        super().__init__(nvars=n, ncon=1)
        rng = np.random.default_rng(seed)
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        self.A = jnp.asarray(Q @ np.diag(eigs) @ Q.T)
        self.b = jnp.asarray(rng.uniform(size=n))
        self.acon = jnp.asarray(rng.uniform(size=n))
        self.bcon = float(rng.uniform())
        self._x0 = jnp.asarray(-2.0 + rng.uniform(size=n))

    def objective(self, x):
        return 0.5 * jnp.vdot(x, self.A @ x) + jnp.vdot(self.b, x)

    def constraints(self, x):
        return jnp.array([jnp.vdot(self.acon, x) + self.bcon])

    def get_vars_and_bounds(self):
        n = self.nvars
        return self._x0, jnp.full(n, -5.0), jnp.full(n, 5.0)


class Toy(Problem):
    """Min-norm point inside two intersecting balls (the reference's
    `examples/toy/toy.py` problem): min Σx² s.t. 9 - |x - c_i|² >= 0 for
    two ball centers, x in [0, 5]³."""

    def __init__(self):
        super().__init__(nvars=3, ncon=2)
        self.centers = jnp.array([[5.0, 2.0, 1.0], [3.0, 4.0, 3.0]])

    def objective(self, x):
        return jnp.sum(x ** 2)

    def constraints(self, x):
        return 9.0 - jnp.sum((x[None, :] - self.centers) ** 2, axis=1)

    def get_vars_and_bounds(self):
        return (jnp.array([4.0, 3.0, 2.0]), jnp.zeros(3), jnp.full(3, 5.0))
