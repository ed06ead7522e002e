"""Stage-level decomposition of the 3-D stiffness matvec on the TPU:
where do the 44 ms/matvec go — corner-slice gather, the [ne,24]@[24,24]
HIGHEST matmul, or the 8-pad scatter?

    python scripts/ab_kmul3d_stages.py --nex 160 --ney 80 --nez 80
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nex", type=int, default=160)
    ap.add_argument("--ney", type=int, default=80)
    ap.add_argument("--nez", type=int, default=80)
    ap.add_argument("--loop", type=int, default=20)
    args = ap.parse_args()

    from paropt_tpu.models.fem_topology3d import (FEMTopology3D, _CORNERS3D,
                                                  _sl, _gather3d, _scatter3d)

    prob = FEMTopology3D(nex=args.nex, ney=args.ney, nez=args.nez,
                         cg_iters=10, solver="jacobi")
    dt = prob._dtype
    nex, ney, nez = prob.nex, prob.ney, prob.nez
    ne = prob.ne
    KE = prob.KE
    hi = jax.lax.Precision.HIGHEST
    x0, _, _ = prob.get_vars_and_bounds()
    xf = prob._filter(x0)
    E = prob.emin + (prob.e0 - prob.emin) * xf ** prob.penal
    u = jnp.asarray(prob.f, dt) + 0.5
    ue0 = _gather3d(u, nex, ney, nez)
    K = args.loop

    def bench(name, fn, *xs):
        @jax.jit
        def run(*xs):
            def body(i, v):
                return fn(*xs[:-1], v * (1.0 - 1e-7))
            return jax.lax.fori_loop(0, K, body, xs[-1])

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
        print(f"[{name:26s}] {best * 1e3:8.2f} ms  {gb:6.3f} GB "
              f"({gb / best:6.1f} GB/s)", flush=True)

    # stage benches: each returns something shaped like its input so the
    # fori_loop can carry it
    def gather_only(u):
        ue = _gather3d(u, nex, ney, nez)
        # reduce back to node shape so the loop carries [ndof]
        return _scatter3d(ue, nex, ney, nez)   # gather+scatter pair

    def matmul_only(ue):
        return jnp.matmul(ue, KE, precision=hi)

    def matmul_default(ue):
        return jnp.matmul(ue, KE)

    def matmul_scaled(E, ue):
        return jnp.matmul(ue, KE, precision=hi) * E[:, None]

    def elementwise(ue):
        return ue * 1.000001 + 0.5

    bench("gather+scatter (no mm)", gather_only, u)
    bench("matmul HIGHEST [ne,24]", matmul_only, ue0)
    bench("matmul default [ne,24]", matmul_default, ue0)
    bench("matmul HIGHEST + E scale", matmul_scaled, E, ue0)
    bench("elementwise on [ne,24]", elementwise, ue0)
    bench("full _kmul", prob._kmul, E, u)


if __name__ == "__main__":
    main()
