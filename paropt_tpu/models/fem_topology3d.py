"""3-D SIMP topology optimization: matrix-free voxel FEM on TPU.

The reference's stated target workload is *large-scale 3-D* (multi-material)
topology optimization (`README.md:12-31`, `docs/ParOpt_theory_manual.tex:
27-28`, the Chin/Leader/Kennedy 2019 applications).  This model provides the
3-D analogue of `fem_topology.FEMTopology`:

    min  compliance(x)
    s.t. volume_fraction - mean(x) >= 0             (1 dense constraint)
         [optional] cap - regionmean(x) >= 0        (separable sparse caps)
         0 <= x <= 1

- 8-node hexahedral voxels, 3 dofs/node; K(E)·u is matrix-free:
  gather element dofs [ne, 24] → one [ne, 24]@[24, 24] batched matmul
  (full-f32 accumulation — TPU bf16 default diverges on the ill-conditioned
  SIMP system, see fem_topology.py) → scatter-add.
- Jacobi-preconditioned CG with full-precision scalar reductions and
  freeze/restart breakdown guards (same recipe as the 2-D model).
- 6-neighbor density filter via `jnp.roll` on the voxel grid (no gather).
- Compliance gradient by the self-adjoint custom VJP (no differentiation
  through CG, no adjoint solve).

Everything jits; `FusedMMA(FEMTopology3D(...))` runs the whole optimization
on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..problem import Problem, SparseJacobian
from .fem_topology import _interleave

__all__ = ["FEMTopology3D", "DMOFEMTopology3D", "hex_element_stiffness"]


def hex_element_stiffness(nu: float = 0.3) -> np.ndarray:
    """[24, 24] stiffness of a unit-cube 8-node hex with E = 1 (standard
    isoparametric 2x2x2 Gauss quadrature)."""
    # local node coordinates (standard ordering)
    nodes = np.array([[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
                      [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]],
                     dtype=float)
    # isotropic elasticity (Voigt: xx, yy, zz, yz, xz, xy)
    lam = nu / ((1 + nu) * (1 - 2 * nu))
    mu = 1.0 / (2 * (1 + nu))
    D = np.zeros((6, 6))
    D[:3, :3] = lam
    D[0, 0] = D[1, 1] = D[2, 2] = lam + 2 * mu
    D[3, 3] = D[4, 4] = D[5, 5] = mu

    g = 1.0 / np.sqrt(3.0)
    KE = np.zeros((24, 24))
    for gx in (-g, g):
        for gy in (-g, g):
            for gz in (-g, g):
                # dN/dxi at the gauss point; unit cube => dxi/dx = 2
                dN = np.zeros((3, 8))
                for i, (xi, eta, zeta) in enumerate(nodes):
                    dN[0, i] = xi * (1 + eta * gy) * (1 + zeta * gz) / 8.0
                    dN[1, i] = (1 + xi * gx) * eta * (1 + zeta * gz) / 8.0
                    dN[2, i] = (1 + xi * gx) * (1 + eta * gy) * zeta / 8.0
                dN = 2.0 * dN  # to physical coords
                B = np.zeros((6, 24))
                for i in range(8):
                    B[0, 3 * i + 0] = dN[0, i]
                    B[1, 3 * i + 1] = dN[1, i]
                    B[2, 3 * i + 2] = dN[2, i]
                    B[3, 3 * i + 1] = dN[2, i]
                    B[3, 3 * i + 2] = dN[1, i]
                    B[4, 3 * i + 0] = dN[2, i]
                    B[4, 3 * i + 2] = dN[0, i]
                    B[5, 3 * i + 0] = dN[1, i]
                    B[5, 3 * i + 1] = dN[0, i]
                KE += (B.T @ D @ B) / 8.0  # detJ = 1/8, weight 1
    return KE


# Corner order matches hex_element_stiffness's local node ordering.
_CORNERS3D = ((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
              (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1))


def _sl(a):
    return slice(1, None) if a else slice(None, -1)


def _gather3d(u, nex, ney, nez):
    """[ne, 24] element dof values via corner SLICES of the node grid."""
    ug = u.reshape(nex + 1, ney + 1, nez + 1, 3)
    ue = jnp.concatenate(
        [ug[_sl(a), _sl(b), _sl(c)] for a, b, c in _CORNERS3D], axis=-1)
    return ue.reshape(nex * ney * nez, 24)


def _scatter3d(fe, nex, ney, nez):
    """Adjoint of _gather3d: sum element-corner values into node dofs via
    eight static pads."""
    fe = fe.reshape(nex, ney, nez, 24)
    out = 0.0
    for i, (a, b, c) in enumerate(_CORNERS3D):
        out = out + jnp.pad(fe[..., 3 * i:3 * i + 3],
                            ((a, 1 - a), (b, 1 - b), (c, 1 - c), (0, 0)))
    return out.reshape(-1)


def _prolong3d(nexc, neyc, nezc):
    """Trilinear node-grid prolongation, built from interleave reshapes."""

    def prolong(c_flat):
        c = c_flat.reshape(nexc + 1, neyc + 1, nezc + 1, 3)
        for ax in range(3):
            c = _interleave(c, ax)
        return c.reshape(-1)

    return prolong


class FEMTopology3D(Problem):
    """Cantilever voxel design domain: fixed at the x = 0 face, unit
    downward load along the bottom edge of the free face."""

    def __init__(self, nex: int = 16, ney: int = 8, nez: int = 8,
                 volume_fraction: float = 0.3, penal: float = 3.0,
                 emin: float = 1e-3, e0: float = 1.0,
                 region: int = 0, region_cap: float = 0.8,
                 cg_iters: int = 400, filter_on: bool = True,
                 solver: str = "jacobi", mg_smooth: int = 2,
                 mg_omega: float = 0.4, dtype=None):
        from ..dtypes import resolve_dtype
        dt = resolve_dtype(dtype)
        ne = nex * ney * nez
        nwcon = ne // region if region > 0 else 0
        if region > 0:
            assert ne % region == 0
        super().__init__(nvars=ne, ncon=1, nwcon=nwcon, nwblock=1)
        self.nex, self.ney, self.nez = nex, ney, nez
        self.ne = ne
        self._dtype = dt
        self.penal = penal
        self.emin, self.e0 = emin, e0
        self.volume_fraction = volume_fraction
        self.region, self.region_cap = region, region_cap
        self.cg_iters = cg_iters
        self.filter_on = filter_on
        self.KE = jnp.asarray(hex_element_stiffness(), dt)

        # node numbering: node(i, j, k) for i<=nex, j<=ney, k<=nez
        nnx, nny, nnz = nex + 1, ney + 1, nez + 1
        self.ndof = 3 * nnx * nny * nnz

        def nid(i, j, k):
            return (i * nny + j) * nnz + k

        # vectorized element-dof map (local ordering must match
        # hex_element_stiffness / _CORNERS3D); a python triple loop here
        # cost 700+ s at 10^6 elements
        ii, jj, kk = np.meshgrid(np.arange(nex), np.arange(ney),
                                 np.arange(nez), indexing="ij")
        corners = np.stack([nid(ii + a, jj + b, kk + c)
                            for a, b, c in _CORNERS3D],
                           axis=-1).reshape(ne, 8)
        edofs = (3 * corners[:, :, None]
                 + np.arange(3)).reshape(ne, 24).astype(np.int32)
        self.edofs = jnp.asarray(edofs)

        # fixed: all dofs on the x = 0 face
        fixed = np.zeros(self.ndof, dtype=bool)
        for j in range(nny):
            for k in range(nnz):
                c = nid(0, j, k)
                fixed[3 * c:3 * c + 3] = True
        self.fixed_mask = jnp.asarray(fixed.astype(np.float64), dt)

        # load: unit force in -z along the bottom edge (z=0) of the free
        # face (x = nex)
        f = np.zeros(self.ndof)
        for j in range(nny):
            c = nid(nex, j, 0)
            f[3 * c + 2] = -1.0 / nny
        self.f = jnp.asarray(f, dt)

        if region > 0:
            cols = np.arange(ne, dtype=np.int32).reshape(nwcon, region)
            vals = -np.full((nwcon, region), 1.0 / region)
            self._jac = SparseJacobian(ne, jnp.asarray(cols),
                                       jnp.asarray(vals, dt), nwblock=1)

        # geometric-multigrid hierarchy (static): coarsen 2x while all
        # three element counts stay even
        assert solver in ("jacobi", "mgcg"), solver
        self.solver = solver
        self.mg_smooth = mg_smooth
        self.mg_omega = mg_omega
        dims = [(nex, ney, nez)]
        while all(d % 2 == 0 and d >= 4 for d in dims[-1]):
            dims.append(tuple(d // 2 for d in dims[-1]))
        self._mg_dims = dims
        if solver == "mgcg" and len(dims) == 1:
            import warnings
            warnings.warn(
                f"mesh {nex}x{ney}x{nez} cannot coarsen (element counts "
                "must be even and >= 4): solver='mgcg' falls back to "
                f"Jacobi-CG — cg_iters={cg_iters} sized for multigrid "
                "will NOT converge the state solve; use hundreds of "
                "iterations or an even mesh", stacklevel=2)
        # level 0 reuses the model's own Dirichlet mask; coarser levels
        # apply the same rule (x == 0 face) on the coarse node grids
        self._mg_fixed = [self.fixed_mask]
        for cx, cy, cz in dims[1:]:
            m = np.zeros(3 * (cx + 1) * (cy + 1) * (cz + 1))
            m[:3 * (cy + 1) * (cz + 1)] = 1.0   # x == 0 face nodes
            self._mg_fixed.append(jnp.asarray(m, dt))
        self._mg_prolong = [_prolong3d(*d) for d in dims[1:]]

        self._compliance = self._make_compliance()
        x0 = jnp.full(ne, volume_fraction, dt)
        self.c_scale = 1.0 / float(self._compliance(self._filter(x0)))

    # -- filter (6-neighbor average on the voxel grid) -------------------
    def _filter(self, x):
        if not self.filter_on:
            return x
        xg = x.reshape(self.nex, self.ney, self.nez)
        acc = xg
        cnt = jnp.ones_like(xg)
        for ax in (0, 1, 2):
            for sh in (1, -1):
                acc = acc + jnp.roll(xg, sh, axis=ax)
                cnt = cnt + 1.0
        return (acc / cnt).reshape(-1)

    # -- element gather/scatter --------------------------------------------
    # Regular-voxel incidence == eight corner SLICES of the node grid; both
    # directions are pure slicing/padding (no TPU gather/scatter ops).

    def _gather_elem(self, u):
        """[ne, 24] element dof values via corner slices (== u[self.edofs])."""
        return _gather3d(u, self.nex, self.ney, self.nez)

    def _scatter_elem(self, fe):
        """Adjoint of _gather_elem: sum [ne, 24] element-corner values into
        the [ndof] node vector via eight static pads."""
        return _scatter3d(fe, self.nex, self.ney, self.nez)

    # -- FEM -------------------------------------------------------------
    def _kmul(self, E, u):
        ue = self._gather_elem(u)                        # [ne, 24]
        fe = jnp.matmul(ue, self.KE,
                        precision=jax.lax.Precision.HIGHEST) * E[:, None]
        out = self._scatter_elem(fe)
        return jnp.where(self.fixed_mask > 0, u, out)

    # -- geometric multigrid ----------------------------------------------
    def _kmul_level(self, El, u, cx, cy, cz, fixed):
        """K(E_l) @ u on MG level (cx, cy, cz) with symmetric Dirichlet
        handling (zero on entry, identity on exit -> SPD coarse matrix)."""
        u0 = jnp.where(fixed > 0, 0.0, u)
        ue = _gather3d(u0, cx, cy, cz)
        fe = jnp.matmul(ue, self.KE,
                        precision=jax.lax.Precision.HIGHEST) * El[:, None]
        return jnp.where(fixed > 0, u, _scatter3d(fe, cx, cy, cz))

    def _mg_setup(self, E):
        """Per-level (E_l, diag_l): 2x2x2 mean pooling with a x2 scale per
        level (3-D stiffness scales LINEARLY with element size, so the
        rediscretized coarse operator on a 2h grid needs K_c = 2 E_c KE) +
        the dense Cholesky factor of the coarsest-level matrix."""
        Eg = E.reshape(self.nex, self.ney, self.nez)
        levels = []
        for li, (cx, cy, cz) in enumerate(self._mg_dims):
            El = Eg.reshape(-1)
            fixed = self._mg_fixed[li]
            diag = _scatter3d(jnp.diag(self.KE)[None, :] * El[:, None],
                              cx, cy, cz)
            diag = jnp.where(fixed > 0, 1.0, jnp.maximum(diag, 1e-12))
            levels.append((El, diag, fixed, cx, cy, cz))
            if li + 1 < len(self._mg_dims):
                Eg = 2.0 * Eg.reshape(cx // 2, 2, cy // 2, 2,
                                      cz // 2, 2).mean(axis=(1, 3, 5))
        El, _, fixed, cx, cy, cz = levels[-1]
        ndc = 3 * (cx + 1) * (cy + 1) * (cz + 1)
        Kc = jax.vmap(self._kmul_level,
                      in_axes=(None, 1, None, None, None, None),
                      out_axes=1)(El, jnp.eye(ndc, dtype=E.dtype),
                                  cx, cy, cz, fixed)
        chol = jax.scipy.linalg.cho_factor(Kc)
        return levels, chol

    def _mg_vcycle(self, levels, chol, r):
        """Symmetric V-cycle: weighted-Jacobi smoothing, trilinear
        transfer, dense coarse solve."""
        nu, om = self.mg_smooth, self.mg_omega

        def cycle(l, r):
            El, diag, fixed, cx, cy, cz = levels[l]
            if l == len(levels) - 1:
                e = jax.scipy.linalg.cho_solve(chol, r)
                return jnp.where(fixed > 0, 0.0, e)

            def kmul(v):
                return self._kmul_level(El, v, cx, cy, cz, fixed)

            e = (om / diag) * r
            for _ in range(nu - 1):
                e = e + (om / diag) * (r - kmul(e))
            prolong = self._mg_prolong[l]
            nxt = levels[l + 1]
            ndc = 3 * (nxt[3] + 1) * (nxt[4] + 1) * (nxt[5] + 1)
            restrict = jax.linear_transpose(
                prolong, jax.ShapeDtypeStruct((ndc,), r.dtype))
            rc, = restrict(r - kmul(e))
            rc = jnp.where(nxt[2] > 0, 0.0, rc)
            e = e + jnp.where(fixed > 0, 0.0, prolong(cycle(l + 1, rc)))
            for _ in range(nu):
                e = e + (om / diag) * (r - kmul(e))
            return e

        return cycle(0, r)

    def _solve(self, E):
        return self._cg(E, self.f)

    def _cg(self, E, b):
        """Preconditioned CG on K(E) u = b: Jacobi (solver='jacobi') or a
        geometric-multigrid V-cycle (solver='mgcg')."""
        if self.solver == "mgcg" and len(self._mg_dims) > 1:
            levels, chol = self._mg_setup(E)      # carries per-level diags

            def precond(r):
                return self._mg_vcycle(levels, chol, r)
        else:
            diag = self._scatter_elem(
                jnp.diag(self.KE)[None, :] * E[:, None])
            diag = jnp.where(self.fixed_mask > 0, 1.0,
                             jnp.maximum(diag, 1e-12))

            def precond(r):
                return r / diag
        b = jnp.where(self.fixed_mask > 0, 0.0, b)
        hi = jax.lax.Precision.HIGHEST
        tiny = float(jnp.finfo(self._dtype).tiny)

        def body(i, carry):
            u, r, p, rz = carry
            Kp = self._kmul(E, p)
            pKp = jnp.vdot(p, Kp, precision=hi)
            alpha = jnp.where(pKp > tiny,
                              rz / jnp.where(pKp > tiny, pKp, 1.0), 0.0)
            u = u + alpha * p
            r = r - alpha * Kp
            z = precond(r)
            rz_new = jnp.vdot(r, z, precision=hi)
            beta = jnp.where(rz > tiny,
                             rz_new / jnp.where(rz > tiny, rz, 1.0), 0.0)
            p = z + beta * p
            return (u, r, p, rz_new)

        u0 = jnp.zeros(self.ndof, self._dtype)
        z0 = precond(b)
        carry = (u0, b, z0, jnp.vdot(b, z0, precision=hi))
        u, _, _, _ = jax.lax.fori_loop(0, self.cg_iters, body, carry)
        return u

    def _make_compliance(self):
        def simp(xf):
            return self.emin + xf ** self.penal * (self.e0 - self.emin)

        @jax.custom_vjp
        def compliance(xf):
            u = self._solve(simp(xf))
            return jnp.vdot(self.f, u)

        def fwd(xf):
            u = self._solve(simp(xf))
            return jnp.vdot(self.f, u), (xf, u)

        def bwd(res, ct):
            xf, u = res
            ue = self._gather_elem(u)
            energies = jnp.sum(
                jnp.matmul(ue, self.KE,
                           precision=jax.lax.Precision.HIGHEST) * ue,
                axis=1)
            dE = (self.penal * xf ** (self.penal - 1.0)
                  * (self.e0 - self.emin))
            return (-ct * dE * energies,)

        compliance.defvjp(fwd, bwd)
        return compliance

    # -- Problem surface --------------------------------------------------
    def objective(self, x):
        return self.c_scale * self._compliance(self._filter(x))

    def constraints(self, x):
        return jnp.array([self.volume_fraction - jnp.mean(x)])

    def sparse_constraints(self, x):
        xb = x.reshape(self.nwcon, self.region)
        return self.region_cap - jnp.mean(xb, axis=1)

    def sparse_jacobian(self, x):
        return self._jac

    def get_vars_and_bounds(self):
        n = self.nvars
        x0 = jnp.full(n, self.volume_fraction, self._dtype)
        return x0, jnp.zeros(n, self._dtype), jnp.ones(n, self._dtype)


class DMOFEMTopology3D(Problem):
    """Multi-material (DMO) 3-D voxel compliance design — the reference's
    flagship application class ("large-scale 3D multi-material topology
    optimization", README.md:12-31) and the continuum use of the BLOCK
    weighting-constraint path: per-voxel material weights x[e, m] with one
    separable "weights sum <= 1" constraint PER VOXEL, so the sparse
    Jacobian is the partition ('blocked') pattern and Cw is diagonal.

        E_e = emin + Σ_m x[e,m]^p (E_m − emin)
        min  compliance(E)
        s.t. mass_fraction − Σ_{e,m} ρ_m x[e,m]/ne >= 0   (dense)
             1 − Σ_m x[e,m] >= 0                          (per voxel)
    """

    def __init__(self, nex: int = 12, ney: int = 6, nez: int = 6,
                 e_mats=(1.0, 0.55, 0.25), rho_mats=(1.0, 0.5, 0.2),
                 mass_fraction: float = 0.3, penal: float = 3.0,
                 cg_iters: int = 400, solver: str = "jacobi", dtype=None):
        from ..dtypes import resolve_dtype
        dt = resolve_dtype(dtype)
        self.fem = FEMTopology3D(nex=nex, ney=ney, nez=nez,
                                 cg_iters=cg_iters, filter_on=False,
                                 solver=solver, dtype=dt)
        ne = self.fem.ne
        nmat = len(e_mats)
        super().__init__(nvars=ne * nmat, ncon=1, nwcon=ne, nwblock=1)
        self.ne, self.nmat = ne, nmat
        self._dtype = dt
        self.penal = penal
        self.mass_fraction = mass_fraction
        self.e_mats = jnp.asarray(e_mats, dt)
        self.rho_mats = jnp.asarray(rho_mats, dt)
        self.emin = self.fem.emin

        cols = np.arange(ne * nmat, dtype=np.int32).reshape(ne, nmat)
        vals = -np.ones((ne, nmat))
        self._jac = SparseJacobian(ne * nmat, jnp.asarray(cols),
                                   jnp.asarray(vals, dt), nwblock=1)
        self._compliance = self._make_compliance()
        x0, _, _ = self.get_vars_and_bounds()
        self.c_scale = 1.0 / float(self._compliance(x0))

    def _modulus(self, x):
        w = x.reshape(self.ne, self.nmat) ** self.penal
        return self.emin + w @ (self.e_mats - self.emin)

    def _make_compliance(self):
        fem = self.fem

        @jax.custom_vjp
        def compliance(x):
            u = fem._solve(self._modulus(x))
            return jnp.vdot(fem.f, u)

        def fwd(x):
            u = fem._solve(self._modulus(x))
            return jnp.vdot(fem.f, u), (x, u)

        def bwd(res, ct):
            x, u = res
            ue = fem._gather_elem(u)
            energies = jnp.sum(
                jnp.matmul(ue, fem.KE,
                           precision=jax.lax.Precision.HIGHEST) * ue,
                axis=1)                               # [ne]
            xm = x.reshape(self.ne, self.nmat)
            dwdx = self.penal * xm ** (self.penal - 1.0)
            dE = dwdx * (self.e_mats - self.emin)[None, :]
            g = -ct * energies[:, None] * dE
            return (g.reshape(-1),)

        compliance.defvjp(fwd, bwd)
        return compliance

    # -- Problem surface --------------------------------------------------
    def objective(self, x):
        return self.c_scale * self._compliance(x)

    def constraints(self, x):
        mass = jnp.mean(x.reshape(self.ne, self.nmat) @ self.rho_mats)
        return jnp.array([self.mass_fraction - mass])

    def sparse_constraints(self, x):
        return 1.0 - jnp.sum(x.reshape(self.ne, self.nmat), axis=1)

    def sparse_jacobian(self, x):
        return self._jac

    def get_vars_and_bounds(self):
        n = self.nvars
        x0 = jnp.full(n, self.mass_fraction / self.nmat, self._dtype)
        return (x0, jnp.full(n, 1e-4, self._dtype),
                jnp.ones(n, self._dtype))

    def material_field(self, x):
        """[ne] argmax material index (-1 where all weights ~ void)."""
        xm = np.asarray(x).reshape(self.ne, self.nmat)
        idx = xm.argmax(axis=1)
        idx[xm.max(axis=1) < 0.3] = -1
        return idx
