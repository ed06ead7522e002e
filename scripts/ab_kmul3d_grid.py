"""A/B: grid-stencil (SoA component-grid) 3-D stiffness matvec vs the
[ne, 24] gather/matmul/scatter form.

Stage decomposition (scripts/ab_kmul3d_stages.py @160x80x80) showed the
[ne,24] form's cost is ~100% gather/scatter: every tensor has minor dim
3 or 24, so TPU (8,128) tiling runs at ~2-19% lane utilization.  The grid
form keeps ALL tensors as [nex,ney,nez]-shaped scalar grids (minor dim
nez: 63-80% lanes) and applies KE as 576 fused multiply-adds — no
[ne,24] materialization, no strided minor-dim copies.

    python scripts/ab_kmul3d_grid.py --nex 160 --ney 80 --nez 80

NOTE: the problem is constructed with layout='aos' so the 'current'
side is always the [ne, 24] matmul form regardless of the model's
auto threshold; compare against the local grid stencil.  Through the
tunnel, first compiles at >= 64^3 can take many minutes — prefer
whole-solve A/Bs (one compile) at large shapes.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",):
    os.environ.setdefault("PAROPT_TPU_NO_X64", "1")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nex", type=int, default=160)
    ap.add_argument("--ney", type=int, default=80)
    ap.add_argument("--nez", type=int, default=80)
    ap.add_argument("--loop", type=int, default=20)
    args = ap.parse_args()

    from paropt_tpu.models.fem_topology3d import (FEMTopology3D, _CORNERS3D,
                                                  _sl)

    prob = FEMTopology3D(nex=args.nex, ney=args.ney, nez=args.nez,
                         cg_iters=10, solver="jacobi", layout="aos")
    dt = prob._dtype
    nex, ney, nez = prob.nex, prob.ney, prob.nez
    nnx, nny, nnz = nex + 1, ney + 1, nez + 1
    KEh = np.asarray(prob.KE, np.float64)
    x0, _, _ = prob.get_vars_and_bounds()
    xf = prob._filter(x0)
    E = prob.emin + (prob.e0 - prob.emin) * xf ** prob.penal
    Eg = E.reshape(nex, ney, nez)
    fixed_g = jnp.moveaxis(
        prob.fixed_mask.reshape(nnx, nny, nnz, 3), -1, 0)

    def kmul_grid(Eg, ug):
        """K(E) @ u on component grids: ug [3, nnx, nny, nnz] ->
        [3, nnx, nny, nnz].  576 scalar-coefficient multiply-adds on
        element grids; output assembled via 8 static pads per component.
        Matches _kmul's semantics exactly (input NOT zeroed at fixed dofs,
        output overwritten with u there)."""
        ug0 = ug
        out = jnp.zeros_like(ug)
        for i, (a, b, c) in enumerate(_CORNERS3D):
            acc = [None, None, None]
            for j, (d, e, f2) in enumerate(_CORNERS3D):
                for cj in range(3):
                    uj = ug0[cj, _sl(d), _sl(e), _sl(f2)]
                    for ci in range(3):
                        k = float(KEh[3 * i + ci, 3 * j + cj])
                        if k == 0.0:
                            continue
                        t = k * uj
                        acc[ci] = t if acc[ci] is None else acc[ci] + t
            fe = jnp.stack([(x if x is not None else jnp.zeros_like(Eg))
                            * Eg for x in acc])
            out = out + jnp.pad(fe, ((0, 0), (a, 1 - a), (b, 1 - b),
                                     (c, 1 - c)))
        return jnp.where(fixed_g > 0, ug, out)

    # equality vs the current path
    u = jnp.asarray(prob.f, dt) + 0.5
    want = prob._kmul(E, u)
    ug = jnp.moveaxis(u.reshape(nnx, nny, nnz, 3), -1, 0)
    got = jnp.moveaxis(kmul_grid(Eg, ug), 0, -1).reshape(-1)
    err = float(jnp.max(jnp.abs(want - got))
                / (jnp.max(jnp.abs(want)) + 1e-30))
    print(f"max rel diff [ne,24] vs grid form: {err:.2e}", flush=True)
    assert err < 1e-5, err

    K = args.loop

    def bench(name, fn, *xs):
        @jax.jit
        def run(*xs):
            return jax.lax.fori_loop(
                0, K, lambda i, v: fn(*xs[:-1], v * (1.0 - 1e-7)), xs[-1])

        out = run(*xs)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            out = run(*xs)
            jax.block_until_ready(out)
            best = min(best, (time.time() - t0) / K)
        try:
            ca = run.lower(*xs).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            gb = ca.get("bytes accessed", 0.0) / 1e9 / K
        except Exception:
            gb = float("nan")
        print(f"[{name:22s}] {best * 1e3:8.2f} ms  {gb:6.3f} GB "
              f"({gb / best:6.1f} GB/s)", flush=True)

    def to_grid(u_flat):
        return jnp.moveaxis(u_flat.reshape(nnx, nny, nnz, 3), -1, 0)

    for rep in range(2):
        bench("current [ne,24]", prob._kmul, E, u)
        bench("grid stencil", kmul_grid, Eg, ug)
    bench("AoS<->SoA transpose", lambda v: to_grid(
        jnp.moveaxis(v, 0, -1).reshape(-1)), ug)


if __name__ == "__main__":
    main()
