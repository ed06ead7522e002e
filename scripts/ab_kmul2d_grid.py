"""A/B: grid-stencil (SoA component-grid) 2-D stiffness matvec vs the
[ne, 8] gather/matmul/scatter form, at the bench shapes.

Same idea as scripts/ab_kmul3d_grid.py (18.8x at 1M voxels): every tensor
stays an [nex/nny]-shaped scalar grid (minor dim nny) and KE is applied as
64 fused scalar multiply-adds — no [ne, 8] materialization.

    python scripts/ab_kmul2d_grid.py --nex 96 --ney 48
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


# element node order ll, lr, ur, ul (matches fem_topology edofs)
_CORNERS2D = ((0, 0), (1, 0), (1, 1), (0, 1))


def _sl(a):
    return slice(1, None) if a else slice(None, -1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nex", type=int, default=96)
    ap.add_argument("--ney", type=int, default=48)
    ap.add_argument("--loop", type=int, default=50)
    args = ap.parse_args()

    from paropt_tpu.models.fem_topology import FEMTopology

    prob = FEMTopology(nex=args.nex, ney=args.ney, cg_iters=10,
                       solver="jacobi")
    dt = prob._dtype
    nex, ney = prob.nex, prob.ney
    nnx, nny = nex + 1, ney + 1
    KEh = np.asarray(prob.KE, np.float64)
    x0, _, _ = prob.get_vars_and_bounds()
    xf = prob._filter(x0)
    E = prob.emin + (prob.e0 - prob.emin) * xf ** prob.penal
    Eg = E.reshape(nex, ney)
    fixed_g = jnp.moveaxis(prob.fixed_mask.reshape(nnx, nny, 2), -1, 0)

    def kmul_grid(Eg, ug):
        """K(E) @ u on [2, nnx, nny] component grids; matches _kmul's
        semantics (input NOT zeroed at fixed dofs, output overwritten
        with u there)."""
        out = jnp.zeros_like(ug)
        for i, (a, b) in enumerate(_CORNERS2D):
            acc = [None, None]
            for j, (c, d) in enumerate(_CORNERS2D):
                for cj in range(2):
                    uj = ug[cj, _sl(c), _sl(d)]
                    for ci in range(2):
                        k = float(KEh[2 * i + ci, 2 * j + cj])
                        if k == 0.0:
                            continue
                        t = k * uj
                        acc[ci] = t if acc[ci] is None else acc[ci] + t
            fe = jnp.stack([(x if x is not None else jnp.zeros_like(Eg))
                            * Eg for x in acc])
            out = out + jnp.pad(fe, ((0, 0), (a, 1 - a), (b, 1 - b)))
        return jnp.where(fixed_g > 0, ug, out)

    u = jnp.asarray(prob.f, dt) + 0.5
    want = prob._kmul(E, u)
    ug = jnp.moveaxis(u.reshape(nnx, nny, 2), -1, 0)
    got = jnp.moveaxis(kmul_grid(Eg, ug), 0, -1).reshape(-1)
    err = float(jnp.max(jnp.abs(want - got))
                / (jnp.max(jnp.abs(want)) + 1e-30))
    print(f"max rel diff [ne,8] vs grid form: {err:.2e}", flush=True)
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
        print(f"[{name:22s}] {best * 1e6:9.1f} us", flush=True)

    for rep in range(2):
        bench("current [ne,8]", prob._kmul, E, u)
        bench("grid stencil", kmul_grid, Eg, ug)


if __name__ == "__main__":
    main()
