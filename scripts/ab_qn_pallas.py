"""Back-to-back A/B: fused step with the Pallas quasi-Newton roll kernel on
vs off (one process, same device, interleaved windows — see _ab_common).
The quasi-def Pallas kernel stays at its DEFAULT in both variants, so this
isolates the qn_update change.  NOTE: that default flipped to OFF
(opt-in, PAROPT_TPU_PALLAS_QD) after the zero-copy compact — the
historical 198.6-vs-188.5 BASELINE row was taken with the qd kernel ON,
so new runs are not directly comparable to it; use scripts/ab_matrix.py
for the full 4-way picture.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",):
    os.environ["PAROPT_TPU_NO_X64"] = "1"

from _ab_common import run_ab  # noqa: E402


def toggle(on: bool):
    from paropt_tpu.ops import qn as qnmod
    qnmod._PALLAS_QN = on  # override the env-gated detection


if __name__ == "__main__":
    run_ab("qn-pallas", toggle)
