"""A/B the 3-D stiffness matvec layout on the TPU.

Round-1 lesson (CLAUDE.md): keep the LARGE axis minor. The current
`_kmul` builds the element-dof matrix as [ne, 24] (dof minor) — measured
33 GB/s at 160x80x80 while mg_setup hits 314 GB/s on the same data
(scripts/profile_fem3d.py). Candidate: SoA/transposed form — convert the
node grid to component-major [3, nnx, nny, nnz] once, gather corner
slices into [24, ne] (ne minor), KE @ ue, scatter via component-major
pads.

    python scripts/ab_kmul3d.py --nex 160 --ney 80 --nez 80
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
                         cg_iters=10, solver="jacobi")
    dt = prob._dtype
    nex, ney, nez = prob.nex, prob.ney, prob.nez
    ne, ndof = prob.ne, prob.ndof
    KE = prob.KE
    fixed = prob.fixed_mask
    hi = jax.lax.Precision.HIGHEST
    print(f"elements {ne} dofs {ndof} dtype {dt.__name__}", flush=True)

    x0, _, _ = prob.get_vars_and_bounds()
    xf = prob._filter(x0)
    E = prob.emin + (prob.e0 - prob.emin) * xf ** prob.penal

    def kmul_t(E, u):
        """Transposed/SoA form: [24, ne] with ne minor."""
        ug = jnp.moveaxis(u.reshape(nex + 1, ney + 1, nez + 1, 3), -1, 0)
        ue = jnp.concatenate(
            [ug[:, _sl(a), _sl(b), _sl(c)].reshape(3, -1)
             for a, b, c in _CORNERS3D], axis=0)           # [24, ne]
        fe = jnp.matmul(KE, ue, precision=hi) * E[None, :]
        out = 0.0
        for i, (a, b, c) in enumerate(_CORNERS3D):
            blk = fe[3 * i:3 * i + 3].reshape(3, nex, ney, nez)
            out = out + jnp.pad(blk, ((0, 0), (a, 1 - a), (b, 1 - b),
                                      (c, 1 - c)))
        out = jnp.moveaxis(out, 0, -1).reshape(-1)
        return jnp.where(fixed > 0, u, out)

    # exact-equality check (same reduction order per output dof? the pads
    # sum in the same corner order; matmul association may differ -> allow
    # tiny fp tolerance)
    u = jnp.asarray(prob.f, dt) + 0.5
    a = prob._kmul(E, u)
    b = kmul_t(E, u)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30))
    print(f"max rel diff current vs transposed: {err:.2e}", flush=True)
    assert err < 1e-5, err

    K = args.loop

    def bench(name, fn):
        @jax.jit
        def run(E, u):
            return jax.lax.fori_loop(
                0, K, lambda i, v: fn(E, v / (1.0 + i)), u)

        out = run(E, u)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            out = run(E, u)
            jax.block_until_ready(out)
            best = min(best, (time.time() - t0) / K)
        try:
            ca = run.lower(E, u).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            gb = ca.get("bytes accessed", 0.0) / 1e9 / K
        except Exception:
            gb = float("nan")
        print(f"[{name:12s}] {best * 1e3:8.2f} ms/matvec  {gb:6.3f} GB "
              f"({gb / best:6.1f} GB/s)", flush=True)
        return best

    # interleaved A/B (tunnel variance)
    for rep in range(2):
        bench("current", prob._kmul)
        bench("transposed", kmul_t)


if __name__ == "__main__":
    main()
