"""End-to-end interior-point convergence tests on the analytic problems
(the reference's examples-as-integration-tests strategy, SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from paropt_tpu import InteriorPoint
from paropt_tpu.models.analytic import (
    Rosenbrock, SparseRosenbrock, ScalableRosenbrock, RandomConvexQP,
    SimpleQuadratic)


def test_simple_quadratic_bounds_only():
    prob = SimpleQuadratic(n=16)
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-8})
    res = ip.optimize()
    assert res["converged"], res
    x = np.asarray(res["x"])
    want = np.asarray(prob.solution())
    assert np.allclose(x, want, atol=1e-6)


@pytest.mark.parametrize("strategy", ["affine_step",
                                      "least_squares_multipliers",
                                      "no_start_strategy"])
def test_rosenbrock_dense_constraint(strategy):
    prob = Rosenbrock()
    ip = InteriorPoint(prob, {
        "output_file": None,
        "abs_res_tol": 1e-7,
        "starting_point_strategy": strategy,
    })
    res = ip.optimize()
    assert res["converged"], res
    x = np.asarray(res["x"])
    # unconstrained optimum (1,1) is interior to c >= 0
    assert np.allclose(x, [1.0, 1.0], atol=1e-4), x
    assert res["fobj"] < 1e-8


def test_rosenbrock_sparse_constraint():
    prob = SparseRosenbrock()
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-7})
    res = ip.optimize()
    assert res["converged"], res
    assert np.allclose(np.asarray(res["x"]), [1.0, 1.0], atol=1e-4)


def test_sparse_jacobian_bug_propagates():
    """A RAISING sparse_jacobian must surface, not silently demote the
    problem to the ~100x-slower callback path (the probe catches only
    NotImplementedError — the 'not provided' signal)."""
    class BuggyJacobian(SparseRosenbrock):
        def sparse_jacobian(self, x):
            raise ValueError("bug in user Jacobian")

    with pytest.raises(ValueError, match="bug in user Jacobian"):
        InteriorPoint(BuggyJacobian(), {"output_file": None})


def test_missing_sparse_jacobian_demotes_to_callback_path():
    """NotImplementedError (no structured Jacobian provided) still takes
    the eager callback path and converges.  Like the reference, a
    callback-only problem must supply the block inner product
    (`addSparseInnerProduct`, ParOptProblem.h:225-266); the Jacobian
    products fall back to jvp/vjp of sparse_constraints."""
    import jax

    class CallbackOnly(SparseRosenbrock):
        def sparse_jacobian(self, x):
            raise NotImplementedError

        def sparse_inner_product(self, x, cvec):
            Aw = jax.jacrev(self.sparse_constraints)(x)
            return ((Aw * cvec) @ Aw.T).reshape(-1, 1, 1)

    ip = InteriorPoint(CallbackOnly(), {"output_file": None,
                                        "abs_res_tol": 1e-7})
    assert ip._callback_sparse and ip._eager
    res = ip.optimize()
    assert res["converged"], res
    assert np.allclose(np.asarray(res["x"]), [1.0, 1.0], atol=1e-4)


def test_random_convex_qp_matches_reference_solver():
    prob = RandomConvexQP(n=24, ncon=3, seed=1)
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-8,
                              "max_major_iters": 300})
    res = ip.optimize()
    assert res["converged"], res
    # cross-check with scipy's reference QP solution via KKT verification:
    x = np.asarray(res["x"])
    c = np.asarray(prob.constraints(res["x"]))
    assert (c > -1e-6).all()
    assert (x > -1e-8).all() and (x < 10 + 1e-8).all()
    # stationarity: g - A'z - zl + zu = 0 with recovered multipliers
    xs, z, zw, zl, zu = ip.get_optimized_point()
    g = np.asarray(prob.Q @ res["x"] - prob.b)
    r = g - np.asarray(prob.Amat).T @ np.asarray(z) - np.asarray(zl) \
        + np.asarray(zu)
    assert np.max(np.abs(r)) < 1e-5


def test_scalable_rosenbrock_sparse():
    prob = ScalableRosenbrock(n=32, group=4)
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-6,
                              "max_major_iters": 500})
    res = ip.optimize()
    assert res["converged"], res
    # feasibility of both constraint families
    assert float(jnp.min(prob.sparse_constraints(res["x"]))) > -1e-5
    assert float(prob.constraints(res["x"])[0]) > -1e-5


def test_monotone_vs_mehrotra_same_answer():
    for strat in ("monotone", "mehrotra",
                  "mehrotra_predictor_corrector",
                  "complementarity_fraction"):
        prob = RandomConvexQP(n=12, ncon=2, seed=3)
        ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-7,
                                  "barrier_strategy": strat,
                                  "max_major_iters": 300})
        res = ip.optimize()
        assert res["converged"], (strat, res)
        if strat == "monotone":
            x_ref = np.asarray(res["x"])
        else:
            assert np.allclose(np.asarray(res["x"]), x_ref, atol=1e-4), strat


def test_equality_constraint():
    """Trailing constraints declared equalities (ninequality < ncon)."""

    class EqProb(RandomConvexQP):
        def __init__(self):
            super().__init__(n=10, ncon=1, seed=5)
            self.ninequality = 0  # the single constraint is an equality

    prob = EqProb()
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-8,
                              "max_major_iters": 300})
    res = ip.optimize()
    assert res["converged"], res
    c = float(prob.constraints(res["x"])[0])
    assert abs(c) < 1e-5, c


def test_checkpoint_roundtrip(tmp_path):
    prob = RandomConvexQP(n=12, ncon=2, seed=7)
    ip = InteriorPoint(prob, {"output_file": None, "max_major_iters": 5})
    ip.optimize()
    path = str(tmp_path / "ckpt.npz")
    ip.write_solution_file(path)
    ip2 = InteriorPoint(prob, {"output_file": None})
    ip2.read_solution_file(path)
    assert np.allclose(np.asarray(ip2.vars.x), np.asarray(ip.vars.x))
    assert ip2.mu == ip.mu


def test_output_log_contract(tmp_path):
    from paropt_tpu import unpack_output
    path = str(tmp_path / "paropt.out")
    prob = Rosenbrock()
    ip = InteriorPoint(prob, {"output_file": path, "abs_res_tol": 1e-7})
    res = ip.optimize()
    hist = unpack_output(path)
    assert len(hist["iter"]) > 3
    assert hist["fobj"][-1] == pytest.approx(res["fobj"], rel=1e-4)
    # counters are monotone
    assert (np.diff(hist["nobj"]) >= 0).all()


def test_scaled_bfgs_linear_objective():
    """scaled_bfgs: for ncon==1 + linear objective the QN models the
    constraint curvature scaled by z0 (`ParOptScaledQuasiNewton.h`)."""
    import jax.numpy as jnp
    from paropt_tpu.problem import Problem

    class LinObjProb(Problem):
        def __init__(self):
            super().__init__(nvars=8, ncon=1)

        def objective(self, x):
            return jnp.sum(x) / 8.0

        def constraints(self, x):
            return jnp.array([2.0 - jnp.sum(x ** 2)])

        def get_vars_and_bounds(self):
            n = 8
            return (jnp.full(n, 0.6), jnp.full(n, 0.01), jnp.full(n, 2.0))

    prob = LinObjProb()
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-8,
                              "qn_type": "scaled_bfgs",
                              "max_major_iters": 200})
    res = ip.optimize()
    assert res["converged"], res
    # compare with plain bfgs
    ip2 = InteriorPoint(LinObjProb(), {"output_file": None,
                                       "abs_res_tol": 1e-8,
                                       "max_major_iters": 200})
    res2 = ip2.optimize()
    assert np.allclose(np.asarray(res["x"]), np.asarray(res2["x"]),
                       atol=1e-5)


def test_complex_step_gradient_check():
    """Complex-step derivative verification (the reference's complex-build
    'sanitizer' equivalent): exact to machine precision."""
    prob = Rosenbrock()
    errs = prob.check_gradients(1e-30, mode="complex", verbose=False)
    assert errs["obj_gradient"] < 1e-14
    assert errs["con_gradient"] < 1e-14


def test_hvec_product_check_and_reproducibility():
    """check_gradients(check_hvec_product=True) verifies the Hessian-vector
    product against an FD of the Lagrangian gradient AND that repeated Hvec
    calls agree exactly — the reference's reproducibility leg
    (`ParOptProblem.cpp:319-333`)."""
    prob = Rosenbrock()
    errs = prob.check_gradients(1e-5, check_hvec_product=True, verbose=False)
    assert "hvec_repeat" in errs and errs["hvec_repeat"] == 0.0, errs
    assert errs["hvec_product"] < 1e-4, errs

    class NonDeterministicHvec(Rosenbrock):
        def __init__(self):
            super().__init__()
            self._ncalls = 0

        def eval_hvec_product(self, x, z, zw, px):
            self._ncalls += 1
            base = super().eval_hvec_product(x, z, zw, px)
            # drift on repeated calls — must be caught
            return base + 1e-3 * (self._ncalls - 1)

    bad = NonDeterministicHvec()
    errs = bad.check_gradients(1e-5, check_hvec_product=True, verbose=False)
    assert errs["hvec_repeat"] > 1e-4, errs


def test_block_coupled_sparse_constraints_nwblock2():
    """End-to-end with nwblock=2: pairs of weighting constraints share
    variable support, so Cw has coupled 2x2 blocks (the reference's
    nwblock > 1 packed-block path, ParOptSparseMat.cpp:41-224)."""
    from paropt_tpu.problem import Problem, SparseJacobian

    n, nblocks = 24, 4
    nwcon = 2 * nblocks
    per = n // nblocks  # variables per block

    class BlockProb(Problem):
        def __init__(self):
            super().__init__(nvars=n, ncon=0, nwcon=nwcon, nwblock=2)
            cols = np.zeros((nwcon, per), dtype=np.int32)
            vals = np.zeros((nwcon, per))
            for b in range(nblocks):
                sup = np.arange(b * per, (b + 1) * per)
                cols[2 * b] = sup
                cols[2 * b + 1] = sup
                vals[2 * b] = -1.0 / per          # mean bound
                w = np.linspace(0.5, 1.5, per)
                vals[2 * b + 1] = -w / w.sum()    # weighted-mean bound
            self._jac = SparseJacobian(n, jnp.asarray(cols),
                                       jnp.asarray(vals), nwblock=2)
            self._cols, self._vals = cols, vals

        def objective(self, x):
            return jnp.sum((x - 1.2) ** 2)

        def sparse_constraints(self, x):
            out = []
            for i in range(nwcon):
                out.append(0.8 + jnp.sum(
                    jnp.asarray(self._vals[i]) * x[self._cols[i]]))
            return jnp.stack(out)

        def sparse_jacobian(self, x):
            return self._jac

        def get_vars_and_bounds(self):
            return (jnp.full(n, 0.5), jnp.zeros(n), jnp.full(n, 2.0))

    prob = BlockProb()
    errs = prob.check_gradients(1e-6, verbose=False)
    assert errs["sparse_inner_product"] < 1e-10
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-7,
                              "max_major_iters": 200})
    res = ip.optimize()
    assert res["converged"], res
    cw = np.asarray(prob.sparse_constraints(res["x"]))
    assert (cw > -1e-6).all()
    assert cw.min() < 1e-4  # at least one block cap active


def test_sparse_equality_constraints_block_path():
    """Sparse equalities (nwinequality < nwcon) through the block path."""
    from paropt_tpu.models.analytic import SparseRosenbrock

    class EqSparse(SparseRosenbrock):
        def __init__(self):
            super().__init__()
            self.nwinequality = 0  # the constraint is an equality

        def sparse_constraints(self, x):
            return jnp.array([x[0] + x[1] - 1.0])

    prob = EqSparse()
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-8,
                              "max_major_iters": 300})
    res = ip.optimize()
    assert res["converged"], res
    x = np.asarray(res["x"])
    assert abs(x[0] + x[1] - 1.0) < 1e-6


def test_abs_step_tol_stopping():
    prob = RandomConvexQP(n=10, ncon=1, seed=9)
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-12,
                              "abs_step_tol": 1e-8,
                              "max_major_iters": 500})
    res = ip.optimize()
    assert res["converged"], res
    assert res["reason"] in ("step_tol", "tolerance", "no_improvement")


def test_line_search_eval_failure_recovery():
    """A user evaluation returning non-finite values during the line search
    shrinks alpha and retries (`ParOptInteriorPoint.cpp:4019-4026` role);
    the solve still converges."""
    import numpy as np
    from paropt_tpu import Problem

    class FragileRosen(Problem):
        """Rosenbrock that 'fails' (returns nan) outside |x| <= 1.8."""

        def __init__(self):
            super().__init__(nvars=2, ncon=1)
            self.nfail = 0

        def objective(self, x):
            import jax.numpy as jnp
            f = 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2
            bad = jnp.max(jnp.abs(x)) > 1.8
            return jnp.where(bad, jnp.nan, f)

        def constraints(self, x):
            import jax.numpy as jnp
            return jnp.array([x[0] + x[1] + 5.0])

        def get_vars_and_bounds(self):
            import jax.numpy as jnp
            return (jnp.array([-1.5, 1.5]), jnp.full(2, -2.0),
                    jnp.full(2, 2.0))

    ip = InteriorPoint(FragileRosen(), {"output_file": None,
                                        "abs_res_tol": 1e-7,
                                        "max_major_iters": 400})
    res = ip.optimize()
    assert res["converged"], res
    assert np.allclose(np.asarray(res["x"]), [1.0, 1.0], atol=1e-3)


def test_line_search_eval_exception_recovery():
    """A user callback that RAISES (any exception, not just
    FloatingPointError) during the line search maps to the fail path —
    shrink alpha and retry — never a raw traceback mid-solve
    (`ParOptInteriorPoint.cpp:4019-4026` treats any nonzero fail flag)."""
    import warnings
    import numpy as np
    import jax.numpy as jnp
    from paropt_tpu import Problem

    class RaisingRosen(Problem):
        """Rosenbrock whose evaluation raises outside |x| <= 1.8."""

        def __init__(self, exc_type):
            super().__init__(nvars=2, ncon=1)
            self.exc_type = exc_type
            self.nraise = 0

        def eval_obj_con(self, x):
            xnp = np.asarray(x)
            if np.max(np.abs(xnp)) > 1.8:
                self.nraise += 1
                raise self.exc_type("physics solver diverged")
            f = 100.0 * (xnp[1] - xnp[0] ** 2) ** 2 + (1.0 - xnp[0]) ** 2
            return jnp.asarray(f), jnp.array([xnp[0] + xnp[1] + 5.0])

        def eval_obj_con_gradient(self, x):
            xnp = np.asarray(x)
            g = np.array([
                -400.0 * xnp[0] * (xnp[1] - xnp[0] ** 2) - 2.0 * (1 - xnp[0]),
                200.0 * (xnp[1] - xnp[0] ** 2)])
            return jnp.asarray(g), jnp.ones((1, 2))

        def get_vars_and_bounds(self):
            return (jnp.array([-1.5, 1.5]), jnp.full(2, -2.0),
                    jnp.full(2, 2.0))

    for exc_type in (ValueError, RuntimeError):
        prob = RaisingRosen(exc_type)
        ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-7,
                                  "max_major_iters": 400})
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            res = ip.optimize()
        assert res["converged"], (exc_type, res)
        assert np.allclose(np.asarray(res["x"]), [1.0, 1.0], atol=1e-3)
        assert prob.nraise > 0  # the failure path was actually exercised


def test_initial_eval_failure_aborts():
    """A failed INITIAL evaluation aborts with a clear error
    (`ParOptInteriorPoint.cpp:4549-4561` role)."""
    import jax.numpy as jnp
    import pytest
    from paropt_tpu import Problem

    class AlwaysNan(Problem):
        def __init__(self):
            super().__init__(nvars=2, ncon=0)

        def objective(self, x):
            return jnp.nan * jnp.sum(x)

        def get_vars_and_bounds(self):
            return jnp.zeros(2), jnp.full(2, -1.0), jnp.ones(2)

    ip = InteriorPoint(AlwaysNan(), {"output_file": None})
    with pytest.raises(RuntimeError, match="initial objective"):
        ip.optimize()


def test_verification_hooks_run():
    """step/gradient verification options execute their checks and the KKT
    step error is tiny (the `checkKKTStep` / `checkGradients` runtime hooks,
    `ParOptInteriorPoint.cpp:675-682`, `:6212+`)."""
    from paropt_tpu.models.analytic import Rosenbrock

    prob = Rosenbrock()
    out_path = "/tmp/paropt_verify_test.out"
    ip = InteriorPoint(prob, {"output_file": out_path,
                              "abs_res_tol": 1e-7,
                              "step_verification_frequency": 3,
                              "gradient_verification_frequency": 5,
                              "max_major_iters": 100})
    res = ip.optimize()
    assert res["converged"]
    out = open(out_path).read()
    assert "KKT step check" in out, out[:500]
    # step error tiny at every check
    import re
    errs = [float(m) for m in re.findall(
        r"KKT step check: max \|K\*p \+ r\| = ([0-9.e+-]+)", out)]
    assert errs and max(errs) < 1e-6, errs


def test_check_merit_func_gradient():
    """FD merit-derivative verification (`checkMeritFuncGradient`,
    `ParOptInteriorPoint.cpp:3280-3436`) on a bound + dense + sparse
    constrained problem, standalone with the reference's deterministic
    probe direction."""
    prob = ScalableRosenbrock(n=16, group=4, use_sparse=True)
    ip = InteriorPoint(prob, {"output_file": None})
    fd, dm0, abs_err, rel_err = ip.check_merit_func_gradient(dh=1e-7)
    # f64 forward difference: O(dh) truncation ~1e-7 relative
    assert rel_err < 1e-5, (fd, dm0, rel_err)


def test_check_merit_func_gradient_at_point():
    prob = Rosenbrock()
    ip = InteriorPoint(prob, {"output_file": None})
    fd, dm0, abs_err, rel_err = ip.check_merit_func_gradient(
        xpt=jnp.array([0.2, -0.3]), dh=1e-7)
    assert rel_err < 1e-5, (fd, dm0, rel_err)


def test_merit_gradient_verification_in_loop(tmp_path):
    """`gradient_verification_frequency` wires the merit FD check into the
    major-iteration loop (`ParOptInteriorPoint.cpp:5177-5180`) along the
    actual scaled KKT step."""
    out = tmp_path / "paropt.out"
    prob = ScalableRosenbrock(n=16, group=4, use_sparse=True)
    ip = InteriorPoint(prob, {
        "output_file": str(out),
        "gradient_verification_frequency": 2,
        "gradient_check_step_length": 1e-7,
        "max_major_iters": 6})
    ip.optimize()
    text = out.read_text()
    assert "Merit function test" in text
    # every logged FD check along the actual step agrees with dm0
    import re
    rel_errs = [float(m) for m in re.findall(
        r"Rel err:\s*([0-9.e+-]+)", text)]
    assert rel_errs, text
    assert max(rel_errs) < 1e-4, rel_errs


def test_maratos_equality_ip():
    """IP on the Maratos problem (`examples/maratos_effect`): equality
    circle constraint, solution (sqrt(2), 0)."""
    from paropt_tpu.models.analytic import Maratos

    prob = Maratos()
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-8,
                              "max_major_iters": 200})
    res = ip.optimize()
    assert res["converged"], res
    x = np.asarray(res["x"])
    assert np.allclose(x, np.asarray(prob.solution()), atol=1e-4), x
    assert abs(float(prob.constraints(res["x"])[0])) < 1e-6


def test_limited_memory_subspace_study():
    """The reference's limited-memory study (`examples/limited_memory_test`,
    `examples/random_quadratic`): on a quadratic whose spectrum has k
    clusters, a full-memory L-BFGS converges, and enlarging the subspace
    never hurts the iteration count."""
    from paropt_tpu.models.analytic import RandomQuadratic

    n = 24
    eigs = np.linspace(1.0, n + 1.0, n)
    iters = {}
    for msub in (2, n):
        prob = RandomQuadratic(eigs, seed=3)
        ip = InteriorPoint(prob, {
            "output_file": None, "abs_res_tol": 1e-8,
            "max_major_iters": 400, "qn_subspace_size": msub,
        })
        res = ip.optimize()
        assert res["converged"], (msub, res)
        # optimality: projected KKT residual is tiny at the solution
        iters[msub] = res["niter"]
    assert iters[n] <= iters[2], iters
