"""Python bindings for the native sparse kernels (src_native/paropt_sparse.cpp).

The general-CSR constraint path needs a fill-reducing ordering + sparse
Cholesky of the quasi-definite Schur complement Cw = C + Aw·D⁻¹·Awᵀ when Cw is
NOT block diagonal — the role of the reference's `ParOptSparseCholesky` /
`ParOptAMD` / `ParOptSparseUtils` / `ParOptQuasiDefSparseMat` (serial
per-process, `ParOptSparseMat.cpp:231-233`).  The library is compiled on
first use with g++ (cached next to this file) and driven through ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ["SparseCholesky", "csr_adat", "amd_order", "nd_order",
           "fill_count", "native_available"]

_LIB = None
_LOCK = threading.Lock()


def _source_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "src_native", "paropt_sparse.cpp")


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "_paropt_sparse.so")


def _build() -> str:
    src, out = _source_path(), _lib_path()
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", src, "-o", out]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        out = _lib_path()
        src = _source_path()
        if (not os.path.exists(out)
                or (os.path.exists(src)
                    and os.path.getmtime(src) > os.path.getmtime(out))):
            _build()
        lib = ctypes.CDLL(out)
        ip = ctypes.POINTER(ctypes.c_int)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.paropt_amd_order.restype = ctypes.c_int
        lib.paropt_amd_order.argtypes = [ctypes.c_int, ip, ip, ip]
        lib.paropt_nd_order.restype = ctypes.c_int
        lib.paropt_nd_order.argtypes = [ctypes.c_int, ip, ip, ip]
        lib.paropt_fill_count.restype = ctypes.c_longlong
        lib.paropt_fill_count.argtypes = [ctypes.c_int, ip, ip, ip]
        lib.paropt_chol_create.restype = ctypes.c_void_p
        lib.paropt_chol_create.argtypes = [ctypes.c_int, ip, ip, ctypes.c_int]
        lib.paropt_chol_nnz.restype = ctypes.c_int
        lib.paropt_chol_nnz.argtypes = [ctypes.c_void_p]
        lib.paropt_chol_factor.restype = ctypes.c_int
        lib.paropt_chol_factor.argtypes = [ctypes.c_void_p, dp]
        lib.paropt_chol_solve.restype = ctypes.c_int
        lib.paropt_chol_solve.argtypes = [ctypes.c_void_p, dp, ctypes.c_int]
        lib.paropt_chol_destroy.restype = None
        lib.paropt_chol_destroy.argtypes = [ctypes.c_void_p]
        lib.paropt_snchol_create.restype = ctypes.c_void_p
        lib.paropt_snchol_create.argtypes = [ctypes.c_int, ip, ip,
                                             ctypes.c_int]
        lib.paropt_snchol_nnz.restype = ctypes.c_int
        lib.paropt_snchol_nnz.argtypes = [ctypes.c_void_p]
        lib.paropt_snchol_nsuper.restype = ctypes.c_int
        lib.paropt_snchol_nsuper.argtypes = [ctypes.c_void_p]
        lib.paropt_snchol_factor.restype = ctypes.c_int
        lib.paropt_snchol_factor.argtypes = [ctypes.c_void_p, dp]
        lib.paropt_snchol_solve.restype = ctypes.c_int
        lib.paropt_snchol_solve.argtypes = [ctypes.c_void_p, dp, ctypes.c_int]
        lib.paropt_snchol_destroy.restype = None
        lib.paropt_snchol_destroy.argtypes = [ctypes.c_void_p]
        lib.paropt_adat_symbolic.restype = ctypes.c_int
        lib.paropt_adat_symbolic.argtypes = [ctypes.c_int, ctypes.c_int, ip,
                                             ip, ip, ip]
        lib.paropt_adat_numeric.restype = ctypes.c_int
        lib.paropt_adat_numeric.argtypes = [ctypes.c_int, ctypes.c_int, ip,
                                            ip, dp, dp, dp, ip, ip, dp]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def amd_order(rowp, cols) -> np.ndarray:
    """Minimum-degree fill-reducing ordering: perm[old] = new position
    (the role of `ParOptAMD`)."""
    lib = _load()
    rowp = np.ascontiguousarray(rowp, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    n = rowp.shape[0] - 1
    perm = np.zeros(n, dtype=np.int32)
    rc = lib.paropt_amd_order(n, _iptr(rowp), _iptr(cols), _iptr(perm))
    if rc != 0:
        raise RuntimeError("amd ordering failed")
    return perm


def nd_order(rowp, cols) -> np.ndarray:
    """Nested-dissection fill-reducing ordering: perm[old] = new position
    (the role of the reference's `METIS_NodeND` leg,
    `ParOptSparseCholesky.cpp:7-78`, implemented in-house)."""
    lib = _load()
    rowp = np.ascontiguousarray(rowp, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    n = rowp.shape[0] - 1
    perm = np.zeros(n, dtype=np.int32)
    rc = lib.paropt_nd_order(n, _iptr(rowp), _iptr(cols), _iptr(perm))
    if rc != 0:
        raise RuntimeError("nd ordering failed")
    return perm


def fill_count(rowp, cols, perm) -> int:
    """Symbolic nnz(L) (incl. diagonal) for a candidate ordering."""
    lib = _load()
    rowp = np.ascontiguousarray(rowp, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    perm = np.ascontiguousarray(perm, dtype=np.int32)
    n = rowp.shape[0] - 1
    return int(lib.paropt_fill_count(n, _iptr(rowp), _iptr(cols),
                                     _iptr(perm)))


class SparseCholesky:
    """Sparse Cholesky L·Lᵀ = P·A·Pᵀ of a symmetric positive-definite CSR
    matrix (the role of `ParOptSparseCholesky`, `ParOptSparseCholesky.h:
    29-47`): `setValues`/`factor`/`solve` with ``natural``, ``amd``
    (minimum degree), ``nd`` (in-house nested dissection — the reference's
    METIS_NodeND leg, `ParOptSparseCholesky.cpp:7-78`), or ``auto``
    (AMD vs ND picked by symbolic fill count) ordering.

    Two factorization methods, matching the reference's design choice of a
    supernodal factorization ("variables are aggregated into supernodes
    [which] enables the use of level-3 BLAS", `ParOptSparseCholesky.h:
    13-28`):

    - ``"supernodal"`` (default): fundamental supernodes with dense column
      panels; right-looking updates apply dense rank-ns outer products —
      block operations rather than scalar nonzero chasing.
    - ``"simplicial"``: column-by-column up-looking factorization; useful
      for verification and very sparse patterns with no supernode structure.
    """

    ORDER_NATURAL = 0
    ORDER_AMD = 1
    ORDER_ND = 2
    ORDER_AUTO = 3
    _ORDERINGS = {"natural": 0, "amd": 1, "nd": 2, "auto": 3}

    def __init__(self, rowp, cols, ordering: str = "amd",
                 method: str = "supernodal"):
        self._lib = _load()
        self.rowp = np.ascontiguousarray(rowp, dtype=np.int32)
        self.cols = np.ascontiguousarray(cols, dtype=np.int32)
        self.n = self.rowp.shape[0] - 1
        self.method = method
        if ordering not in self._ORDERINGS:
            raise ValueError(
                f"ordering must be one of {sorted(self._ORDERINGS)}, "
                f"got {ordering!r}")
        order = self._ORDERINGS[ordering]
        if method == "supernodal":
            self._h = self._lib.paropt_snchol_create(
                self.n, _iptr(self.rowp), _iptr(self.cols), order)
        else:
            self._h = self._lib.paropt_chol_create(
                self.n, _iptr(self.rowp), _iptr(self.cols), order)
        if not self._h:
            raise RuntimeError("sparse cholesky symbolic analysis failed")

    def _sym(self, name):
        pre = "paropt_snchol_" if self.method == "supernodal" \
            else "paropt_chol_"
        return getattr(self._lib, pre + name)

    @property
    def nnz(self) -> int:
        return int(self._sym("nnz")(self._h))

    @property
    def nsupernodes(self) -> int:
        """Number of supernodes (== n for the simplicial method)."""
        if self.method == "supernodal":
            return int(self._lib.paropt_snchol_nsuper(self._h))
        return self.n

    def factor(self, values) -> None:
        values = np.ascontiguousarray(values, dtype=np.float64)
        rc = self._sym("factor")(self._h, _dptr(values))
        if rc != 0:
            raise RuntimeError(
                f"sparse Cholesky failed: not positive definite at "
                f"column {rc - 1}")

    def solve(self, b) -> np.ndarray:
        b = np.array(b, dtype=np.float64, order="F", copy=True)
        nrhs = 1 if b.ndim == 1 else b.shape[1]
        rc = self._sym("solve")(self._h, _dptr(b), nrhs)
        if rc != 0:
            raise RuntimeError("sparse solve failed")
        return b

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._sym("destroy")(self._h)
                self._h = None
        except Exception:
            pass


def csr_adat(rowp, cols, vals, dvec, cdiag=None
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(rowp, cols, vals) of  C + A·diag(d)·Aᵀ  for CSR A [m x n]
    (the role of the symbolic/numeric products in `ParOptSparseUtils.h:
    8-49`)."""
    lib = _load()
    rowp = np.ascontiguousarray(rowp, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    dvec = np.ascontiguousarray(dvec, dtype=np.float64)
    m = rowp.shape[0] - 1
    n = dvec.shape[0]
    out_rowp = np.zeros(m + 1, dtype=np.int32)
    null_ip = ctypes.cast(None, ctypes.POINTER(ctypes.c_int))
    lib.paropt_adat_symbolic(m, n, _iptr(rowp), _iptr(cols), _iptr(out_rowp),
                             null_ip)
    out_cols = np.zeros(out_rowp[m], dtype=np.int32)
    lib.paropt_adat_symbolic(m, n, _iptr(rowp), _iptr(cols), _iptr(out_rowp),
                             _iptr(out_cols))
    out_vals = np.zeros(out_rowp[m], dtype=np.float64)
    if cdiag is not None:
        cdiag_arr = np.ascontiguousarray(cdiag, dtype=np.float64)
        cd = _dptr(cdiag_arr)
    else:
        cd = ctypes.cast(None, ctypes.POINTER(ctypes.c_double))
    lib.paropt_adat_numeric(m, n, _iptr(rowp), _iptr(cols), _dptr(vals),
                            _dptr(dvec), cd, _iptr(out_rowp),
                            _iptr(out_cols), _dptr(out_vals))
    return out_rowp, out_cols, out_vals


class CSRQuasiDefMat:
    """General-CSR quasi-definite matrix [[D, -Aw'], [Aw, C0]] factored via
    the Schur complement Cw = C0 + Aw·D⁻¹·Aw' with the native sparse
    Cholesky — the role of `ParOptQuasiDefSparseMat`
    (`ParOptSparseMat.cpp:231-451`), serial per-host like the reference."""

    def __init__(self, nvars: int, rowp, cols, ordering: str = "auto",
                 method: str = "supernodal",
                 dense_col_fraction: float = 0.25):
        self.nvars = int(nvars)
        self.rowp = np.ascontiguousarray(rowp, dtype=np.int32)
        self.cols = np.ascontiguousarray(cols, dtype=np.int32)
        self.nwcon = self.rowp.shape[0] - 1
        self._ordering = ordering
        self._method = method
        self._vals = np.zeros(self.rowp[-1])
        self._chol: Optional[SparseCholesky] = None
        self._pattern: Optional[Tuple[np.ndarray, np.ndarray]] = None
        self.nfactor = 0

        # Dense-column detection (`ParOptSparseMat.cpp:249-255` role): a
        # variable appearing in a large fraction of the sparse constraints
        # would fill Cw = C0 + Aw·D⁻¹·Awᵀ almost completely.  Split those
        # columns out of the sparse product and apply their (low-rank)
        # contribution via Sherman–Morrison–Woodbury at solve time.
        counts = np.zeros(self.nvars, dtype=np.int64)
        np.add.at(counts, self.cols, 1)
        thresh = max(16, int(dense_col_fraction * max(self.nwcon, 1)))
        self.dense_cols = np.nonzero(counts >= thresh)[0].astype(np.int32)
        self._col_is_dense = np.zeros(self.nvars, dtype=bool)
        self._col_is_dense[self.dense_cols] = True
        if self.dense_cols.size:
            keep = ~self._col_is_dense[self.cols]
            # sparse remainder pattern (same row structure, dense cols gone)
            s_rowp = np.zeros(self.nwcon + 1, dtype=np.int32)
            for i in range(self.nwcon):
                s_rowp[i + 1] = s_rowp[i] + int(
                    keep[self.rowp[i]:self.rowp[i + 1]].sum())
            self._s_keep = keep
            self._s_rowp = s_rowp
            self._s_cols = self.cols[keep]
            # map dense variable id -> column of the dense block
            self._dense_pos = {int(v): k
                               for k, v in enumerate(self.dense_cols)}
        self._smw = None  # (U, V, S_lu) at the last factorization

    def set_values(self, vals) -> None:
        """Install the current CSR Jacobian values (`setSparseJacobianData`,
        `ParOptProblem.cpp:632-676`)."""
        self._vals = np.ascontiguousarray(vals, dtype=np.float64)

    def factor(self, Dinv, C0) -> None:
        Dinv = np.asarray(Dinv, dtype=np.float64)
        C0 = np.asarray(C0, dtype=np.float64)
        if self.dense_cols.size:
            rowp, cols = self._s_rowp, self._s_cols
            vals = self._vals[self._s_keep]
        else:
            rowp, cols, vals = self.rowp, self.cols, self._vals
        orp, oc, ov = csr_adat(rowp, cols, vals, Dinv, C0)
        if self._pattern is None or len(oc) != len(self._pattern[1]) \
                or not np.array_equal(orp, self._pattern[0]):
            self._chol = SparseCholesky(orp, oc, ordering=self._ordering,
                                        method=self._method)
            self._pattern = (orp, oc)
        self._chol.factor(ov)
        if self.dense_cols.size:
            # U = Ad·diag(sqrt(Dinv_d)): Cw = Cw_sparse + U·Uᵀ.  Factor the
            # k×k capacitance S = I + Uᵀ·Cw_sparse⁻¹·U for SMW solves.
            k = self.dense_cols.size
            U = np.zeros((self.nwcon, k))
            for i in range(self.nwcon):
                for p in range(self.rowp[i], self.rowp[i + 1]):
                    c = int(self.cols[p])
                    if self._col_is_dense[c]:
                        U[i, self._dense_pos[c]] = (
                            self._vals[p] * np.sqrt(Dinv[c]))
            V = self._chol.solve(np.asfortranarray(U))
            S = np.eye(k) + U.T @ V
            self._smw = (U, V, S)  # k is small; solve directly per apply
        else:
            self._smw = None
        self.nfactor += 1

    def solve(self, b) -> np.ndarray:
        y = self._chol.solve(b)
        if self._smw is not None:
            U, V, S = self._smw
            y = y - V @ np.linalg.solve(S, U.T @ y)
        return y

    def get_factor_info(self) -> str:
        """Fill-in statistics (`getFactorInfo`, `ParOptSparseMat.cpp:
        433-451`)."""
        if self._chol is None:
            return "unfactored"
        nnz_a = int(self._pattern[0][-1])
        nnz_l = self._chol.nnz
        return (f"CSR quasi-def: n={self.nwcon} nnz(Cw)={nnz_a} "
                f"nnz(L)={nnz_l} fill={nnz_l / max(nnz_a, 1):.2f} "
                f"supernodes={self._chol.nsupernodes} "
                f"dense_cols={self.dense_cols.size}")
