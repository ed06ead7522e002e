"""Back-to-back A/B: factor setup through the fully-fused phi_gram Pallas
kernel (PAROPT_TPU_FUSED_FACTOR=1) vs the default per-solve kernel path
(one process, same device, interleaved windows — see _ab_common).  The
quasi-def and QN-roll Pallas kernels stay at their defaults in both
variants, so this isolates the factor-setup strategy.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",):
    os.environ["PAROPT_TPU_NO_X64"] = "1"

from _ab_common import run_ab  # noqa: E402


def toggle(on: bool):
    # the fused factor is a pallas-qd variant: setup_kkt_factor also checks
    # the quasi-def gate (opt-in since the zero-copy compact).  Force the
    # qd kernel ON in BOTH variants so this A/B isolates the factor-setup
    # strategy alone — flipping both at once would contaminate the verdict
    # with the per-solve qd-apply delta (which ab_matrix measures).
    from paropt_tpu.ops import kkt
    kkt._PALLAS_QD = True
    os.environ["PAROPT_TPU_FUSED_FACTOR"] = "1" if on else "0"


if __name__ == "__main__":
    run_ab("fused-factor", toggle)
