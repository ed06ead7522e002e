"""Per-step collective traffic of the sharded FEM FusedMMA step
(SURVEY §2.3/§5.8 documentation probe): compiles the whole-outer-iteration
step over an N-device mesh and reports every collective op (all-reduce,
all-gather, collective-permute, reduce-scatter) with its payload bytes,
parsed from the optimized HLO.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/collective_bytes.py --model 2d --nex 16 --ney 8
    ... --model 3d --nex 8 --ney 4 --nez 4
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "pred": 1, "s8": 1, "u8": 1}


def _shape_bytes(shape_str):
    """'f64[128,16]' -> payload bytes (tuples handled by the caller)."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def collective_report(hlo_text):
    """{op_kind: (count, total_bytes)} over the optimized HLO."""
    out = {}
    pat = re.compile(
        r"=\s*((?:\([^)]*\)|[\w\[\],]+))\s+"
        r"(all-reduce|all-gather|reduce-scatter|collective-permute|"
        r"all-to-all)\b")
    for m in pat.finditer(hlo_text):
        shapes, kind = m.group(1), m.group(2)
        nbytes = sum(_shape_bytes(s)
                     for s in re.findall(r"\w+\[[\d,]*\]", shapes))
        c, b = out.get(kind, (0, 0))
        out[kind] = (c + 1, b + nbytes)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["2d", "3d"], default="3d")
    ap.add_argument("--nex", type=int, default=8)
    ap.add_argument("--ney", type=int, default=4)
    ap.add_argument("--nez", type=int, default=4)
    ap.add_argument("--cg-iters", type=int, default=25)
    args = ap.parse_args()

    from paropt_tpu.mma import FusedMMA
    from paropt_tpu.parallel import sharding as shlib

    if args.model == "3d":
        from paropt_tpu.models.fem_topology3d import FEMTopology3D
        prob = FEMTopology3D(nex=args.nex, ney=args.ney, nez=args.nez,
                             cg_iters=args.cg_iters, solver="mgcg")
        tag = f"3d {args.nex}x{args.ney}x{args.nez}"
    else:
        from paropt_tpu.models.fem_topology import FEMTopology
        prob = FEMTopology(nex=args.nex, ney=args.ney,
                           cg_iters=args.cg_iters, solver="mgcg")
        tag = f"2d {args.nex}x{args.ney}"

    solver = FusedMMA(prob, {"mma_max_iterations": 4,
                             "mma_output_file": None})
    mesh = shlib.design_mesh()
    n = prob.nvars

    def place(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[-1] == n:
            sh = (shlib.design_sharding(mesh) if leaf.ndim == 1
                  else shlib.row_sharding(mesh))
            return jax.device_put(leaf, sh)
        return jax.device_put(leaf, shlib.replicated_sharding(mesh))

    state = jax.tree_util.tree_map(place, solver._state0)
    compiled = jax.jit(solver._step).lower(state).compile()
    rep = collective_report(compiled.as_text())
    total = sum(b for _, b in rep.values())
    print(f"[{tag}] {len(jax.devices())}-device mesh, per outer-iteration:")
    for kind, (c, b) in sorted(rep.items()):
        print(f"  {kind:20s} x{c:4d}  {b/1e6:8.3f} MB")
    print(f"  {'TOTAL':20s}       {total/1e6:8.3f} MB")


if __name__ == "__main__":
    main()
