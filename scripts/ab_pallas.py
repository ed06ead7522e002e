"""Back-to-back A/B: fused step with the Pallas quasi-def kernel on vs off
(one process, same device, interleaved windows — see _ab_common).  The
QN-roll Pallas kernel stays at its default (ON single-chip) in both
variants, so this isolates the quasi-definite apply strategy.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",):
    os.environ["PAROPT_TPU_NO_X64"] = "1"

from _ab_common import run_ab  # noqa: E402


def toggle(on: bool):
    from paropt_tpu.ops import kkt
    kkt._PALLAS_QD = on  # override the env-gated detection


if __name__ == "__main__":
    run_ab("pallas", toggle)
