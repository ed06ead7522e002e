"""SIMP compliance topology optimization with the fused trust region.

The reference's DEFAULT algorithm (`algorithm="tr"`,
`ParOptOptimizer.cpp:108-183`) on its flagship workload — here the ENTIRE
SL1QP outer loop (steering infeasibility solves, fused-IP QP solves, trial
FEM evaluations, quasi-Newton updates, radius + adaptive penalties) runs as
auto-chunked `lax.while_loop` executions on the device (`tr.FusedTR`).

    env -u PYTHONPATH -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python examples/fem_topology_tr.py --nex 24 --ney 12

Also demonstrates vmapped MULTI-START (`solve_batched`): SIMP is nonconvex,
and k random starts batched into one XLA computation routinely beat the
uniform start.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nex", type=int, default=24)
    ap.add_argument("--ney", type=int, default=12)
    ap.add_argument("--cg-iters", type=int, default=None)
    ap.add_argument("--solver", default="mgcg",
                    choices=["jacobi", "mgcg"])
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--starts", type=int, default=4,
                    help="multi-start batch size (0 = single solve only)")
    args = ap.parse_args()

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)

    from paropt_tpu.models.fem_topology import FEMTopology
    from paropt_tpu.tr import FusedTR

    cg = args.cg_iters or (40 if args.solver == "mgcg" else 400)
    prob = FEMTopology(nex=args.nex, ney=args.ney, cg_iters=cg,
                       solver=args.solver)
    x0, _, _ = prob.get_vars_and_bounds()
    f0 = float(prob.objective(jnp.asarray(x0)))
    opts = {"tr_output_file": None, "output_file": None,
            "tr_max_iterations": args.iters,
            "abs_res_tol": 1e-7, "tr_infeas_tol": 1e-5,
            "tr_l1_tol": 0.0, "tr_linfty_tol": 1e-4}
    solver = FusedTR(prob, opts)

    t0 = time.time()
    res, _ = solver.solve()
    print(f"TR: {res['niter']} outer iterations, compliance {f0:.4f} -> "
          f"{res['fobj']:.4f}, infeas {res['infeas']:.1e}, "
          f"linf {res['linfty']:.2e}, wall {time.time() - t0:.1f}s "
          f"(converged={res['converged']})")

    if args.starts > 0:
        rng = np.random.default_rng(0)
        x0s = np.clip(np.asarray(x0)[None, :]
                      * rng.uniform(0.6, 1.4, (args.starts, prob.nvars)),
                      0.05, 0.95)
        t0 = time.time()
        resb, _ = solver.solve_batched(jnp.asarray(x0s))
        best = int(np.argmin(resb["fobj"]))
        print(f"multi-start ({args.starts} batched solves, "
              f"{time.time() - t0:.1f}s): compliances "
              f"{np.round(resb['fobj'], 4)} — best start #{best} "
              f"({resb['fobj'][best]:.4f} vs uniform {res['fobj']:.4f})")


if __name__ == "__main__":
    main()
