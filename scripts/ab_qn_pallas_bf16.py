"""Back-to-back A/B: with bfloat16 QN storage (the shipping default at f32
on accelerator), fused step with the Pallas quasi-Newton roll kernel ON vs
OFF (jnp roll).  Decides whether the bf16-capable kernel stays default-on
for narrow storage (the f32 kernel won 3.80 -> 3.41 GB; the bf16 byte mix
may differ).  One process, interleaved windows (_ab_common)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",):
    os.environ["PAROPT_TPU_NO_X64"] = "1"

import jax.numpy as jnp  # noqa: E402

from _ab_common import run_ab  # noqa: E402


def toggle(on: bool):
    from paropt_tpu.ops import qn as qnmod
    qnmod._PALLAS_QN = on
    # narrow storage defaults to the jnp roll — the ON variant must force
    # the kernel past the dtype gate
    qnmod._FORCE_PALLAS_QN_NARROW = on
    return {"qn_storage_dtype": jnp.bfloat16}


if __name__ == "__main__":
    run_ab("qn-pallas-bf16", toggle)
