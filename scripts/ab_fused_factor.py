"""Back-to-back A/B: factor setup through the fully-fused phi_gram Pallas
kernel (PAROPT_TPU_FUSED_FACTOR=1) vs the default per-solve kernel path
(one process, same device, interleaved windows).  The quasi-def and QN roll
Pallas kernels stay at their defaults in both variants, so this isolates
the factor-setup strategy.  Also prints compiled bytes for both variants
and for the isolated qn_update computation.
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
import os as _os


def build_step(use_fused_factor: bool):
    _os.environ["PAROPT_TPU_FUSED_FACTOR"] = "1" if use_fused_factor else "0"
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

    # compile + report bytes (whole step)
    ca = jax.jit(step).lower(st).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    gb = ca.get("bytes accessed", 0.0) / 1e9

    # isolated qn_update bytes (data-as-args)
    def upd(state, s_vec, y_vec, acc):
        out, _, _ = qnmod.qn_update(state, s_vec, y_vec, accept=acc)
        return out

    v = jnp.ones(n, dtype)
    ca2 = jax.jit(upd).lower(qn0, v, v, jnp.asarray(True)).compile()\
        .cost_analysis()
    ca2 = ca2[0] if isinstance(ca2, (list, tuple)) else ca2
    gb_upd = ca2.get("bytes accessed", 0.0) / 1e9

    s = run_k(st)
    jax.block_until_ready(s)
    return run_k, st, gb, gb_upd, iters


def main():
    rk_off, st_off, gb_off, gbu_off, iters = build_step(False)
    rk_on, st_on, gb_on, gbu_on, _ = build_step(True)
    print(f"bytes/step: fused-factor OFF {gb_off:.2f} GB, ON {gb_on:.2f} GB",
          flush=True)
    print(f"bytes qn_update isolated: OFF {gbu_off:.3f} GB, "
          f"ON {gbu_on:.3f} GB", flush=True)
    results = {"off": [], "on": []}
    for rep in range(5):
        for name, rk, st in (("off", rk_off, st_off), ("on", rk_on, st_on)):
            t0 = time.time()
            out = rk(st)
            jax.block_until_ready(out)
            results[name].append(iters / (time.time() - t0))
    for name, vals in results.items():
        vals.sort()
        print(f"fused-factor {name:3s}: median {vals[len(vals)//2]:7.1f} it/s "
              f"(min {vals[0]:.1f}, max {vals[-1]:.1f})", flush=True)
    # convergence sanity: both variants reach the same state after 20 steps
    a = rk_off(st_off)
    b = rk_on(st_on)
    print(f"after {iters} steps: res OFF {float(a.res_norm):.3e} / "
          f"ON {float(b.res_norm):.3e}; fobj OFF {float(a.fobj):.6e} / "
          f"ON {float(b.fobj):.6e}", flush=True)


if __name__ == "__main__":
    main()
