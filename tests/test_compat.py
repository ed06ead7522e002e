"""Reference-API compatibility layer: reference example code ported with
only the import line changed (fill-style callbacks, fail-flag returns)."""

import numpy as np

from paropt_tpu import compat as ParOpt


class Rosenbrock(ParOpt.Problem):
    """Verbatim structure of `examples/rosenbrock/rosenbrock.py`."""

    def __init__(self):
        self.nvars = 2
        self.ncon = 1
        super(Rosenbrock, self).__init__(None, nvars=self.nvars,
                                         ncon=self.ncon)

    def getVarsAndBounds(self, x, lb, ub):
        x[:] = np.array([-1.5, -1.0])
        lb[:] = -2.0
        ub[:] = 2.0

    def evalObjCon(self, x):
        fail = 0
        con = np.zeros(1)
        fobj = 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2
        con[0] = x[0] + x[1] + 5.0
        return fail, fobj, con

    def evalObjConGradient(self, x, g, A):
        fail = 0
        g[0] = -400.0 * (x[1] - x[0] ** 2) * x[0] - 2.0 * (1.0 - x[0])
        g[1] = 200.0 * (x[1] - x[0] ** 2)
        A[0][0] = 1.0
        A[0][1] = 1.0
        return fail


def test_compat_rosenbrock_tr():
    rosen = Rosenbrock()
    options = {
        "algorithm": "tr",
        "qn_type": "bfgs",
        "qn_update_type": "damped_update",
        "tr_init_size": 0.5,
        "tr_min_size": 1e-6,
        "tr_max_size": 10.0,
        "tr_eta": 0.1,
        "tr_adaptive_gamma_update": True,
        "tr_max_iterations": 200,
        "tr_output_file": None,
        "output_file": None,
    }
    opt = ParOpt.Optimizer(rosen, options)
    res = opt.optimize()
    x, z, zw, zl, zu = opt.getOptimizedPoint()
    assert res["converged"], res
    assert np.allclose(x, [1.0, 1.0], atol=1e-3), x


def test_compat_interior_point():
    rosen = Rosenbrock()
    ip = ParOpt.InteriorPoint(rosen, {"output_file": None,
                                      "abs_res_tol": 1e-7})
    res = ip.optimize()
    x, z, zw, zl, zu = ip.getOptimizedPoint()
    assert res["converged"]
    assert np.allclose(x, [1.0, 1.0], atol=1e-4)


class ElectronCompat(ParOpt.Problem):
    """CSR sparse-constraint compat surface
    (`examples/COPS/electron/electron.py` structure)."""

    def __init__(self, n=6):
        self.n = n
        rowp = [0]
        cols = []
        for i in range(n):
            cols.extend([i, n + i, 2 * n + i])
            rowp.append(len(cols))
        super().__init__(None, nvars=3 * n, num_sparse_constraints=n,
                         num_sparse_inequalities=0, rowp=rowp, cols=cols)

    def getVarsAndBounds(self, x, lb, ub):
        np.random.seed(0)
        n = self.n
        alpha = np.random.uniform(0.0, 2 * np.pi, n)
        beta = np.random.uniform(-np.pi, np.pi, n)
        x[:n] = np.cos(beta) * np.cos(alpha)
        x[n:2 * n] = np.cos(beta) * np.sin(alpha)
        x[2 * n:] = np.sin(beta)
        lb[:] = -10.0
        ub[:] = 10.0

    def _pairs(self, x):
        n = self.n
        pts = np.stack([x[:n], x[n:2 * n], x[2 * n:]], axis=1)
        iu = np.triu_indices(n, k=1)
        d = pts[iu[0]] - pts[iu[1]]
        return iu, pts, (d * d).sum(axis=1)

    def evalSparseObjCon(self, x, sparse_con):
        n = self.n
        _, _, dsq = self._pairs(x)
        fobj = np.sum(np.maximum(dsq, 1e-10) ** -0.5)
        sparse_con[:] = 1.0 - (x[:n] ** 2 + x[n:2 * n] ** 2 + x[2 * n:] ** 2)
        return 0, fobj, []

    def evalSparseObjConGradient(self, x, g, A, data):
        n = self.n
        iu, pts, dsq = self._pairs(x)
        dsq = np.maximum(dsq, 1e-10)
        coef = -(dsq ** -1.5)
        grad = np.zeros((n, 3))
        diff = pts[iu[0]] - pts[iu[1]]
        for k in range(len(iu[0])):
            grad[iu[0][k]] += coef[k] * diff[k]
            grad[iu[1][k]] -= coef[k] * diff[k]
        g[:n] = grad[:, 0]
        g[n:2 * n] = grad[:, 1]
        g[2 * n:] = grad[:, 2]
        for i in range(n):
            data[3 * i] = -2.0 * x[i]
            data[3 * i + 1] = -2.0 * x[n + i]
            data[3 * i + 2] = -2.0 * x[2 * n + i]
        return 0


def test_compat_csr_sparse():
    prob = ElectronCompat(n=6)
    ip = ParOpt.InteriorPoint(prob, {"output_file": None,
                                     "abs_res_tol": 1e-6,
                                     "max_major_iters": 300})
    res = ip.optimize()
    assert res["converged"], res
    x = np.asarray(res["x"])
    n = 6
    radii = x[:n] ** 2 + x[n:2 * n] ** 2 + x[2 * n:] ** 2
    assert np.allclose(radii, 1.0, atol=1e-5)


class SparseRosenbrockCompat(ParOpt.Problem):
    """Block-callback sparse surface (`examples/sparse/sparse_rosenbrock.py`
    ported verbatim apart from the import)."""

    def __init__(self):
        super().__init__(None, nvars=2, ncon=0, nwcon=1, nwblock=1)

    def getVarsAndBounds(self, x, lb, ub):
        x[:] = np.array([-1.5, -1.0])
        lb[:] = -2.0
        ub[:] = 2.0

    def evalObjCon(self, x):
        fobj = 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2
        return 0, fobj, np.zeros(0)

    def evalObjConGradient(self, x, g, A):
        g[0] = -400.0 * (x[1] - x[0] ** 2) * x[0] - 2.0 * (1.0 - x[0])
        g[1] = 200.0 * (x[1] - x[0] ** 2)
        return 0

    def evalSparseCon(self, x, con):
        con[0] = x[0] + x[1] + 5.0

    def addSparseJacobian(self, alpha, x, px, con):
        con[0] += alpha * (px[0] + px[1])

    def addSparseJacobianTranspose(self, alpha, x, pz, out):
        out[0] += alpha * pz[0]
        out[1] += alpha * pz[0]

    def addSparseInnerProduct(self, alpha, x, c, A):
        A[0] += alpha * (c[0] + c[1])


def test_compat_block_callback_sparse():
    prob = SparseRosenbrockCompat()
    ip = ParOpt.InteriorPoint(prob, {"output_file": None,
                                     "abs_res_tol": 1e-7,
                                     "max_major_iters": 200})
    res = ip.optimize()
    assert res["converged"], res
    assert np.allclose(np.asarray(res["x"]), [1.0, 1.0], atol=1e-4)


def test_compat_lbfgs_lsr1_objects():
    """Reference-style LBFGS/LSR1 objects installed via setQuasiNewton
    (`ParOpt.pyx:1210-1227`, `:1347-1351`)."""
    import numpy as np
    from paropt_tpu import compat

    class Rosen(compat.Problem):
        def __init__(self):
            super().__init__(nvars=2, ncon=1)
        def getVarsAndBounds(self, x, lb, ub):
            x[:] = -1.0
            lb[:] = -2.0
            ub[:] = 2.0
        def evalObjCon(self, x):
            f = 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2
            return 0, f, [x[0] + x[1] + 5.0]
        def evalObjConGradient(self, x, g, A):
            g[0] = -400.0 * x[0] * (x[1] - x[0] ** 2) - 2.0 * (1.0 - x[0])
            g[1] = 200.0 * (x[1] - x[0] ** 2)
            A[0][:] = [1.0, 1.0]
            return 0

    for qn_cls in (compat.LBFGS, compat.LSR1):
        prob = Rosen()
        ip = compat.InteriorPoint(prob, {"output_file": None,
                                         "abs_res_tol": 1e-7,
                                         "max_major_iters": 300})
        qn = qn_cls(prob, subspace=8)
        ip.setQuasiNewton(qn)
        res = ip.optimize()
        x = np.asarray(res["x"])
        assert np.allclose(x, [1.0, 1.0], atol=1e-3), (qn_cls.__name__, x)


def test_get_options_info():
    """`getOptionsInfo()` introspection (ParOpt.pyx:447-518): every
    registered option appears with its type, default, and range/enum —
    the surface the reference's drivers auto-declare options from."""
    from paropt_tpu import compat
    from paropt_tpu.utils.options import make_options

    info = compat.getOptionsInfo()
    reg = make_options()
    names = {d.name for d in reg.descriptors()}
    assert set(info) == names
    for d in reg.descriptors():
        rec = info[d.name]
        assert rec.default == d.default, d.name
        assert rec.option_type in ("str", "bool", "int", "float"), d.name
        if d.otype == "enum":
            assert rec.option_type == "str"
            assert d.default in rec.values
        elif d.otype in ("int", "float") and d.low is not None:
            assert rec.values == [d.low, d.high]
    # spot checks against the reference registrations
    assert info["algorithm"].default == "tr"
    assert info["qn_subspace_size"].option_type == "int"
    assert info["abs_res_tol"].option_type == "float"


def test_reference_accessor_surface(tmp_path):
    """The remaining ParOpt.pyx accessors: getOptimizedSlacks,
    setMultiplePenaltyGamma, resetQuasiNewtonHessian, MMA
    getAsymptotes/getDesignHistory, unpack_checkpoint, printOptionSummary
    (`ParOpt.pyx:318-355, 417-425, 1291-1394`)."""
    import numpy as np
    from paropt_tpu import compat

    class Rosen(compat.Problem):
        def __init__(self):
            super().__init__(nvars=2, ncon=1)
        def getVarsAndBounds(self, x, lb, ub):
            x[:] = [-1.0, 1.0]; lb[:] = -2.0; ub[:] = 2.0
        def evalObjCon(self, x):
            f = 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2
            return 0, f, [x[0] + x[1] + 5.0]
        def evalObjConGradient(self, x, g, A):
            g[0] = -400.0 * x[0] * (x[1] - x[0] ** 2) - 2.0 * (1.0 - x[0])
            g[1] = 200.0 * (x[1] - x[0] ** 2)
            A[0][:] = 1.0
            return 0

    ip = compat.InteriorPoint(Rosen(), {"output_file": None,
                                        "abs_res_tol": 1e-8})
    ip.setMultiplePenaltyGamma([123.0])
    assert float(ip.gamma_t[0]) == 123.0
    res = ip.optimize()
    assert res["converged"]
    s, t, sw, tw = ip.getOptimizedSlacks()
    assert s.shape == (1,) and t.shape == (1,)
    assert s[0] > 0 and t[0] > 0
    assert sw.shape == (0,) and tw.shape == (0,)

    # checkpoint roundtrip through the reference unpack contract
    ckpt = str(tmp_path / "state.npz")
    ip.writeSolutionFile(ckpt)
    mu, s2, z2, x2, zl2, zu2 = compat.unpack_checkpoint(ckpt)
    assert mu == float(ip.get_barrier_parameter())
    assert np.allclose(x2, np.asarray(res["x"]))
    assert np.allclose(s2, s)

    ip.resetQuasiNewtonHessian()
    assert int(ip._qn_holder["state"].count) == 0

    # MMA asymptote/history accessors
    import jax.numpy as jnp
    from paropt_tpu.models.topology import SyntheticTopology
    mma = compat.MMA(SyntheticTopology(n=64, block=8),
                     {"mma_max_iterations": 3, "mma_output_file": None,
                      "output_file": None})
    mma.optimize()
    L, U = mma.getAsymptotes()
    x1, x2h = mma.getDesignHistory()
    assert L.shape == (64,) and U.shape == (64,)
    assert np.all(L < U)
    assert x1.shape == (64,) and x2h.shape == (64,)

    compat.printOptionSummary()  # must run without error


def test_tr_2nd_output_blocks(tmp_path):
    """output_level > 0 writes the Model ared/pred blocks the reference's
    unpack_tr_2nd_output parses (`ParOptTrustRegion.cpp:1316-1321`,
    `ParOpt.pyx:208-246`)."""
    import numpy as np
    from paropt_tpu import compat
    from paropt_tpu.tr import TrustRegion
    from paropt_tpu.models.topology import SyntheticTopology

    path = str(tmp_path / "run.tr")
    tr = TrustRegion(SyntheticTopology(n=64, block=8),
                     {"tr_output_file": path, "output_file": None,
                      "tr_max_iterations": 8, "output_level": 1})
    tr.optimize()
    out = compat.unpack_tr_2nd_output(path)
    assert len(out["ared(f)"]) >= 1
    assert len(out["ared(f)"]) == len(out["pred(f)"]) \
        == len(out["ared(c)"]) == len(out["pred(c)"])
    # predicted and actual objective reductions broadly agree on this
    # near-quadratic problem
    ratio = out["ared(f)"][:3] / np.where(out["pred(f)"][:3] == 0, 1,
                                          out["pred(f)"][:3])
    assert np.all(np.isfinite(ratio))


def test_reset_quasi_newton_hessian_with_eigen_provider():
    """Regression: resetQuasiNewtonHessian must go through the
    duck-typed-provider-aware reset (EigenQuasiNewton is not a QNState)."""
    import jax.numpy as jnp
    import numpy as np
    from paropt_tpu import compat
    from paropt_tpu.eig import CompactEigenApprox, EigenQuasiNewton
    from paropt_tpu.ops import qn as qnmod
    from paropt_tpu.ip import InteriorPoint
    from paropt_tpu.models.topology import SyntheticTopology

    prob = SyntheticTopology(n=64, block=8)
    ip = InteriorPoint(prob, {"output_file": None})
    eigh = CompactEigenApprox(nvars=64, N=2)
    qn0 = qnmod.qn_init(4, 64)
    s = jnp.ones(64) * 0.1
    qn0, _, _ = qnmod.qn_update(qn0, s, 2.0 * s)
    eqn = EigenQuasiNewton(qn0, eigh, index=0)
    ip.set_quasi_newton_holder({"state": eqn})
    assert int(eqn.qn.count) == 1
    ip.reset_quasi_newton_hessian()   # must NOT raise
    assert int(eqn.qn.count) == 0


def test_eval_obj_con_shape_error_surfaces():
    """Regression: a wrong-shaped constraint return is a programming
    error and must raise, not be swallowed as a failed evaluation."""
    import numpy as np
    import pytest
    from paropt_tpu.ip import InteriorPoint
    from paropt_tpu.problem import Problem
    import jax.numpy as jnp

    class BadShape(Problem):
        def __init__(self):
            super().__init__(nvars=2, ncon=1)

        def eval_obj_con(self, x):
            return jnp.asarray(1.0), jnp.zeros(3)  # ncon=1 but returns 3

        def eval_obj_con_gradient(self, x):
            return jnp.zeros(2), jnp.zeros((1, 2))

        def get_vars_and_bounds(self):
            return jnp.zeros(2), jnp.full(2, -1.0), jnp.ones(2)

    ip = InteriorPoint(BadShape(), {"output_file": None})
    with pytest.raises((TypeError, ValueError, RuntimeError)):
        ip.optimize()


def test_lbfgs_direct_drive_matches_dense_recursion():
    """The reference's `examples/limited_memory_test` usage mode: drive an
    LBFGS/LSR1 object directly with update()/mult()/multAdd() and compare
    against the dense recursion with the same b0 convention."""
    rng = np.random.default_rng(12)
    n = 14

    class Dummy(ParOpt.Problem):
        def __init__(self):
            super().__init__(None, nvars=n, ncon=0)

        def getVarsAndBounds(self, x, lb, ub):
            x[:] = 0.0
            lb[:] = -1.0
            ub[:] = 1.0

        def evalObjCon(self, x):
            return 0, 0.0, []

        def evalObjConGradient(self, x, g, A):
            g[:] = 0.0
            return 0

    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A = Q @ np.diag(np.linspace(1.0, 8.0, n)) @ Q.T
    S = rng.standard_normal((n, n))
    Y = A @ S

    for cls, kwargs in ((ParOpt.LBFGS, dict(
            update_type=ParOpt.SKIP_NEGATIVE_CURVATURE)),
            (ParOpt.LSR1, {})):
        qn = cls(Dummy(), subspace=n, **kwargs)
        for i in range(n):
            qn.update(S[:, i], Y[:, i])

        # dense recursion from B = b0*I with the same stored pairs; b0 is
        # the compact form's final yty/yts (diag_type YTY_OVER_YTS)
        s0, y0 = S[:, -1], Y[:, -1]
        B = (y0 @ y0 / (s0 @ y0)) * np.eye(n)
        for i in range(n):
            s, y = S[:, i], Y[:, i]
            if cls is ParOpt.LBFGS:
                r = B @ s
                B += -np.outer(r, r) / (s @ r) + np.outer(y, y) / (y @ s)
            else:
                w = y - B @ s
                B += np.outer(w, w) / (w @ s)

        for _ in range(4):
            x = rng.standard_normal(n)
            want = B @ x
            got = qn.mult(x)
            rel = np.linalg.norm(got - want) / np.linalg.norm(want)
            assert rel < 1e-8, (cls.__name__, rel)
            # multAdd and in-place fill conventions
            out = np.zeros(n)
            qn.mult(x, out)
            assert np.allclose(out, got)
            acc = np.ones(n)
            qn.multAdd(0.5, x, acc)
            assert np.allclose(acc, 1.0 + 0.5 * got)
