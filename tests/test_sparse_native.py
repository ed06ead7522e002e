"""Native sparse kernel tests (AMD ordering, sparse Cholesky, A·D·Aᵀ)
verified against dense numpy references."""

import numpy as np
import pytest

from paropt_tpu.ops import sparse_native as sn

pytestmark = pytest.mark.skipif(not sn.native_available(),
                                reason="native library unavailable")


def _random_spd_csr(n, density=0.2, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.random((n, n)) < density
    A = np.triu(A, 1)
    A = A + A.T
    vals = rng.standard_normal((n, n)) * A
    vals = 0.5 * (vals + vals.T)
    # diagonally dominant => SPD
    np.fill_diagonal(vals, np.abs(vals).sum(axis=1) + 1.0)
    dense = vals
    pattern = dense != 0.0
    rowp = np.zeros(n + 1, dtype=np.int32)
    cols, data = [], []
    for i in range(n):
        idx = np.nonzero(pattern[i])[0]
        cols.extend(idx.tolist())
        data.extend(dense[i, idx].tolist())
        rowp[i + 1] = len(cols)
    return dense, rowp, np.asarray(cols, np.int32), np.asarray(data)


@pytest.mark.parametrize("ordering", ["natural", "amd", "nd", "auto"])
@pytest.mark.parametrize("n", [10, 50, 200])
def test_sparse_cholesky_solve(n, ordering):
    dense, rowp, cols, data = _random_spd_csr(n, seed=n)
    chol = sn.SparseCholesky(rowp, cols, ordering=ordering)
    chol.factor(data)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n)
    x = chol.solve(b)
    assert np.allclose(dense @ x, b, atol=1e-8), np.abs(dense @ x - b).max()
    # multiple right-hand sides
    B = np.asfortranarray(rng.standard_normal((n, 3)))
    X = chol.solve(B)
    assert np.allclose(dense @ X, B, atol=1e-8)


def test_sparse_cholesky_refactor():
    dense, rowp, cols, data = _random_spd_csr(30, seed=3)
    chol = sn.SparseCholesky(rowp, cols)
    chol.factor(data)
    # scale values and refactor with the same symbolic
    chol.factor(2.0 * data)
    b = np.ones(30)
    x = chol.solve(b)
    assert np.allclose(2.0 * dense @ x, b, atol=1e-8)


def test_sparse_cholesky_not_spd():
    dense, rowp, cols, data = _random_spd_csr(10, seed=4)
    data = data.copy()
    data[rowp[5]:rowp[6]] = 0.0  # zero out a row -> singular
    chol = sn.SparseCholesky(rowp, cols)
    with pytest.raises(RuntimeError):
        chol.factor(data)


def test_amd_is_valid_permutation_and_reduces_fill():
    # arrow matrix: natural ordering causes full fill; AMD should order the
    # hub last
    n = 40
    rows = [[0] + list(range(n))] + [[0, i] for i in range(1, n)]
    rowp = np.zeros(n + 1, dtype=np.int32)
    cols = []
    for i in range(n):
        idx = sorted(set(rows[i] if i == 0 else rows[i]))
        cols.extend(idx)
        rowp[i + 1] = len(cols)
    cols = np.asarray(cols, np.int32)
    perm = sn.amd_order(rowp, cols)
    assert sorted(perm.tolist()) == list(range(n))
    assert perm[0] >= n - 2  # the hub is eliminated (nearly) last

    chol_nat = sn.SparseCholesky(rowp, cols, ordering="natural")
    chol_amd = sn.SparseCholesky(rowp, cols, ordering="amd")
    assert chol_amd.nnz < chol_nat.nnz


def test_nd_ordering_beats_amd_on_2d_laplacian():
    """Nested dissection (the reference's METIS_NodeND leg,
    `ParOptSparseCholesky.cpp:7-78`, in-house here) is what makes the
    supernodal path competitive on mesh-pattern Schur complements: on a
    2-D Laplacian with n >= 1e5, ND fill <= AMD fill, solves are correct,
    and 'auto' picks the lower-fill ordering."""
    import time
    nx = ny = 320  # n = 102,400
    rowp, cols, data = _laplacian_2d_csr(nx, ny)
    n = nx * ny
    pa = sn.amd_order(rowp, cols)
    pn = sn.nd_order(rowp, cols)
    assert sorted(pn.tolist()) == list(range(n))  # valid permutation
    fill_amd = sn.fill_count(rowp, cols, pa)
    fill_nd = sn.fill_count(rowp, cols, pn)
    assert fill_nd <= fill_amd, (fill_nd, fill_amd)

    ch_amd = sn.SparseCholesky(rowp, cols, ordering="amd")
    ch_nd = sn.SparseCholesky(rowp, cols, ordering="nd")
    ch_auto = sn.SparseCholesky(rowp, cols, ordering="auto")
    t0 = time.time()
    ch_amd.factor(data)
    t_amd = time.time() - t0
    t0 = time.time()
    ch_nd.factor(data)
    t_nd = time.time() - t0
    ch_auto.factor(data)
    assert ch_auto.nnz == ch_nd.nnz  # auto picked ND here
    b = np.random.default_rng(0).standard_normal(n)
    x_nd = ch_nd.solve(b)
    x_amd = ch_amd.solve(b)
    assert np.allclose(x_nd, x_amd, atol=1e-8)
    # factor-time improvement is the point of ND; allow slack for machine
    # noise but fail on a clear regression
    assert t_nd < 1.5 * t_amd, (t_nd, t_amd)


def test_adat_matches_dense():
    rng = np.random.default_rng(7)
    m, n = 12, 20
    A = (rng.random((m, n)) < 0.25) * rng.standard_normal((m, n))
    rowp = np.zeros(m + 1, dtype=np.int32)
    cols, vals = [], []
    for i in range(m):
        idx = np.nonzero(A[i])[0]
        cols.extend(idx.tolist())
        vals.extend(A[i, idx].tolist())
        rowp[i + 1] = len(cols)
    cols = np.asarray(cols, np.int32)
    vals = np.asarray(vals)
    d = rng.random(n) + 0.5
    cdiag = rng.random(m) + 0.1
    orp, oc, ov = sn.csr_adat(rowp, cols, vals, d, cdiag)
    got = np.zeros((m, m))
    for i in range(m):
        for p in range(orp[i], orp[i + 1]):
            got[i, oc[p]] = ov[p]
    want = A @ np.diag(d) @ A.T + np.diag(cdiag)
    assert np.allclose(got, want, atol=1e-12)


def test_quasi_def_csr_end_to_end():
    """Factor Cw = C0 + Aw D^{-1} Aw' for a general (non-block) CSR Jacobian
    and verify the quasi-definite solve against dense — the role of
    ParOptQuasiDefSparseMat (`ParOptSparseMat.cpp:231-451`)."""
    rng = np.random.default_rng(9)
    m, n = 15, 40
    Aw = (rng.random((m, n)) < 0.2) * rng.standard_normal((m, n))
    Aw[np.arange(m), rng.integers(0, n, m)] += 1.0  # no empty rows
    D = rng.random(n) + 0.5
    C0 = rng.random(m) + 0.1
    rowp = np.zeros(m + 1, dtype=np.int32)
    cols, vals = [], []
    for i in range(m):
        idx = np.nonzero(Aw[i])[0]
        cols.extend(idx.tolist())
        vals.extend(Aw[i, idx].tolist())
        rowp[i + 1] = len(cols)
    cols = np.asarray(cols, np.int32)
    vals = np.asarray(vals)

    orp, oc, ov = sn.csr_adat(rowp, cols, vals, 1.0 / D, C0)
    chol = sn.SparseCholesky(orp, oc)
    chol.factor(ov)

    bx = rng.standard_normal(n)
    bw = rng.standard_normal(m)
    # solve [[D, -Aw'], [Aw, C0]] [yx; yw] = [bx; bw]
    yw = chol.solve(bw - Aw @ (bx / D))
    yx = (bx + Aw.T @ yw) / D
    # dense check
    K = np.block([[np.diag(D), -Aw.T], [Aw, np.diag(C0)]])
    sol = np.linalg.solve(K, np.concatenate([bx, bw]))
    assert np.allclose(yx, sol[:n], atol=1e-8)
    assert np.allclose(yw, sol[n:], atol=1e-8)


def test_csr_sparse_problem_ip_end_to_end():
    """Interior point on a general-CSR sparse-constraint problem (the
    ParOptSparseProblem + ParOptQuasiDefSparseMat path): overlapping
    constraint supports, so Aw D Aw' is NOT block diagonal."""
    import jax.numpy as jnp
    from paropt_tpu import InteriorPoint
    from paropt_tpu.problem import CSRSparseProblem

    n, m = 20, 6
    # overlapping windows of 5 variables, stride 3
    rows = [list(range(3 * i, 3 * i + 5)) for i in range(m)]
    rowp = np.zeros(m + 1, dtype=np.int32)
    cols = []
    for i, r in enumerate(rows):
        cols.extend(r)
        rowp[i + 1] = len(cols)
    cols = np.asarray(cols, np.int32)

    class WindowProb(CSRSparseProblem):
        def __init__(self):
            super().__init__(nvars=n, ncon=0, rowp=rowp, cols=cols)
            self.target = jnp.asarray(np.linspace(0.5, 1.5, n))

        def objective(self, x):
            return jnp.sum((x - self.target) ** 2)

        def sparse_constraints(self, x):
            # window sums bounded: 3.0 - sum(window) >= 0
            return jnp.array([3.0 - sum(x[j] for j in rows[i])
                              for i in range(m)])

        def eval_sparse_jacobian_data(self, x):
            return -np.ones(rowp[-1])

        def get_vars_and_bounds(self):
            return (jnp.full(n, 0.5), jnp.zeros(n), jnp.full(n, 2.0))

    prob = WindowProb()
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-7,
                              "max_major_iters": 200})
    res = ip.optimize()
    assert res["converged"], res
    cw = np.asarray(prob.sparse_constraints(res["x"]))
    assert (cw > -1e-6).all()
    # at least one window constraint should be active (targets sum > 3)
    assert cw.min() < 1e-3
    assert ip._csr_mat.nfactor > 0


@pytest.mark.parametrize("method", ["simplicial", "supernodal"])
@pytest.mark.parametrize("ordering", ["natural", "amd"])
def test_cholesky_methods_agree(method, ordering):
    dense, rowp, cols, data = _random_spd_csr(120, density=0.1, seed=7)
    chol = sn.SparseCholesky(rowp, cols, ordering=ordering, method=method)
    chol.factor(data)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(120)
    x = chol.solve(b)
    assert np.allclose(dense @ x, b, atol=1e-8)


def _laplacian_2d_csr(nx, ny):
    """5-point Laplacian on an nx-by-ny grid, CSR."""
    n = nx * ny
    rowp = np.zeros(n + 1, dtype=np.int32)
    cols, data = [], []
    for j in range(ny):
        for i in range(nx):
            k = j * nx + i
            entries = [(k, 4.0 + 0.1)]
            if i > 0:
                entries.append((k - 1, -1.0))
            if i < nx - 1:
                entries.append((k + 1, -1.0))
            if j > 0:
                entries.append((k - nx, -1.0))
            if j < ny - 1:
                entries.append((k + nx, -1.0))
            entries.sort()
            for c, v in entries:
                cols.append(c)
                data.append(v)
            rowp[k + 1] = len(cols)
    return rowp, np.asarray(cols, np.int32), np.asarray(data)


def test_supernodal_laplacian():
    """Supernodal factorization on a structured grid: fewer supernodes than
    columns, identical solutions to the simplicial method."""
    nx, ny = 24, 24
    rowp, cols, data = _laplacian_2d_csr(nx, ny)
    n = nx * ny
    sup = sn.SparseCholesky(rowp, cols, ordering="amd", method="supernodal")
    sim = sn.SparseCholesky(rowp, cols, ordering="amd", method="simplicial")
    sup.factor(data)
    sim.factor(data)
    # the AMD-ordered Laplacian factor must aggregate columns substantially
    assert sup.nsupernodes < n // 2
    # relaxed amalgamation pads with explicit zeros, bounded by the tolerance
    assert sim.nnz <= sup.nnz <= int(2.0 * sim.nnz)
    rng = np.random.default_rng(5)
    B = np.asfortranarray(rng.standard_normal((n, 4)))
    Xs = sup.solve(B)
    Xm = sim.solve(B)
    assert np.allclose(Xs, Xm, atol=1e-9)


def test_quasi_def_supernodal_method():
    """CSRQuasiDefMat with the supernodal backend matches a dense solve."""
    rng = np.random.default_rng(11)
    nvars, nwcon = 40, 12
    # random sparse Aw: each row touches ~5 variables
    rowp = np.zeros(nwcon + 1, dtype=np.int32)
    cols, vals = [], []
    for i in range(nwcon):
        idx = np.sort(rng.choice(nvars, size=5, replace=False))
        cols.extend(idx.tolist())
        vals.extend(rng.standard_normal(5).tolist())
        rowp[i + 1] = len(cols)
    cols = np.asarray(cols, np.int32)
    vals = np.asarray(vals)
    Dinv = rng.random(nvars) + 0.5
    C0 = rng.random(nwcon) + 0.5
    mat = sn.CSRQuasiDefMat(nvars, rowp, cols, method="supernodal")
    mat.set_values(vals)
    mat.factor(Dinv, C0)
    Aw = np.zeros((nwcon, nvars))
    for i in range(nwcon):
        Aw[i, cols[rowp[i]:rowp[i + 1]]] = vals[rowp[i]:rowp[i + 1]]
    Cw = np.diag(C0) + Aw @ np.diag(Dinv) @ Aw.T
    b = rng.standard_normal(nwcon)
    assert np.allclose(mat.solve(b), np.linalg.solve(Cw, b), atol=1e-9)
    assert "supernodes=" in mat.get_factor_info()


def test_quasi_def_dense_column_smw():
    """A variable appearing in (nearly) every sparse constraint is split out
    of the Schur product and applied via SMW (`ParOptSparseMat.cpp:249-255`
    dense-column detection role)."""
    rng = np.random.default_rng(3)
    nvars, nwcon = 50, 40
    rowp, cols = [0], []
    for i in range(nwcon):
        idx = set(rng.choice(nvars, size=4, replace=False).tolist()) | {7}
        cols.extend(sorted(idx))
        rowp.append(len(cols))
    rowp = np.asarray(rowp, np.int32)
    cols = np.asarray(cols, np.int32)
    vals = rng.standard_normal(len(cols))
    Dinv = rng.random(nvars) + 0.5
    C0 = rng.random(nwcon) + 0.5
    Aw = np.zeros((nwcon, nvars))
    for i in range(nwcon):
        Aw[i, cols[rowp[i]:rowp[i + 1]]] = vals[rowp[i]:rowp[i + 1]]
    Cw = np.diag(C0) + Aw @ np.diag(Dinv) @ Aw.T

    m = sn.CSRQuasiDefMat(nvars, rowp, cols)
    m.set_values(vals)
    m.factor(Dinv, C0)
    assert m.dense_cols.tolist() == [7]
    assert "dense_cols=1" in m.get_factor_info()
    b = rng.standard_normal(nwcon)
    assert np.allclose(m.solve(b), np.linalg.solve(Cw, b), atol=1e-10)
    B = np.asfortranarray(rng.standard_normal((nwcon, 3)))
    assert np.allclose(m.solve(B), np.linalg.solve(Cw, B), atol=1e-10)
    # the split keeps the factored pattern sparse
    m2 = sn.CSRQuasiDefMat(nvars, rowp, cols, dense_col_fraction=2.0)
    m2.set_values(vals)
    m2.factor(Dinv, C0)
    assert int(m.get_factor_info().split("nnz(Cw)=")[1].split()[0]) < \
        int(m2.get_factor_info().split("nnz(Cw)=")[1].split()[0])
    # refactor with new values keeps SMW consistent
    vals2 = rng.standard_normal(len(cols))
    m.set_values(vals2)
    m.factor(Dinv, C0)
    Aw2 = np.zeros((nwcon, nvars))
    for i in range(nwcon):
        Aw2[i, cols[rowp[i]:rowp[i + 1]]] = vals2[rowp[i]:rowp[i + 1]]
    Cw2 = np.diag(C0) + Aw2 @ np.diag(Dinv) @ Aw2.T
    assert np.allclose(m.solve(b), np.linalg.solve(Cw2, b), atol=1e-10)


def test_nd_ordering_many_components_fast():
    """Regression: a (near-)diagonal pattern has one connected component
    per row; component peeling must be iterative, not one-per-recursion
    (the recursive form was O(c^2) and hung on 300k rows)."""
    import time
    n = 100000
    rowp = np.arange(n + 1, dtype=np.int32)
    cols = np.arange(n, dtype=np.int32)
    t0 = time.time()
    perm = sn.nd_order(rowp, cols)
    dt = time.time() - t0
    assert sorted(perm.tolist()) == list(range(n))
    assert dt < 5.0, dt  # was unbounded (hang) before the fix
