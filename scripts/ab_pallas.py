"""Back-to-back A/B: fused step with the Pallas quasi-def kernel on vs off
(one process, same device, interleaved windows — the only measurement the
tunnel's variance allows).  Also prints compiled bytes for both variants.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",):
    os.environ["PAROPT_TPU_NO_X64"] = "1"

import time

import jax
import jax.numpy as jnp

from paropt_tpu import ip_fused
from paropt_tpu.models.topology import SyntheticTopology
from paropt_tpu.ops import qn as qnmod
from paropt_tpu.ops import kkt


def build_step(use_pallas: bool):
    kkt._PALLAS_QD = use_pallas  # override the env-gated detection
    n = 1 << 20
    dtype = jnp.float32
    prob = SyntheticTopology(n=n, block=8, dtype=dtype)
    model = ip_fused.model_from_problem(prob)
    data, x0 = ip_fused.data_template_from_problem(prob, dtype=dtype)
    qn0 = qnmod.qn_init(10, prob.nvars, dtype=dtype)
    opts = ip_fused.FusedIPOptions(use_quasi_newton_update=True,
                                   abs_res_tol=1e-6,
                                   iterative_refinement_steps=0)
    fused = ip_fused.FusedIP(model, prob.nvars, prob.ncon, prob.nwcon,
                             prob.nwblock, opts, dtype=dtype)
    st = fused.init(x0, data, (), qn0, None)

    def step(s):
        return fused._step_jit(s, data, (), None)

    iters = 20

    @jax.jit
    def run_k(s):
        return jax.lax.fori_loop(0, iters, lambda i, t: step(t), s)

    # compile + report bytes
    ca = jax.jit(step).lower(st).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    gb = ca.get("bytes accessed", 0.0) / 1e9
    s = run_k(st)
    jax.block_until_ready(s)
    return run_k, st, gb, iters


def main():
    rk_off, st_off, gb_off, iters = build_step(False)
    rk_on, st_on, gb_on, _ = build_step(True)
    print(f"bytes/step: pallas OFF {gb_off:.2f} GB, ON {gb_on:.2f} GB",
          flush=True)
    results = {"off": [], "on": []}
    for rep in range(5):
        for name, rk, st in (("off", rk_off, st_off), ("on", rk_on, st_on)):
            t0 = time.time()
            out = rk(st)
            jax.block_until_ready(out)
            results[name].append(iters / (time.time() - t0))
    for name, vals in results.items():
        vals.sort()
        print(f"pallas {name:3s}: median {vals[len(vals)//2]:7.1f} it/s "
              f"(min {vals[0]:.1f}, max {vals[-1]:.1f})", flush=True)


if __name__ == "__main__":
    main()
