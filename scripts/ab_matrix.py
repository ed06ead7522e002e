"""4-way interleaved A/B over the two Pallas kernel gates (quasi-def apply
x QN roll) — one process, one device, round-robin windows.  Run after any
change to the step's byte mix: the winning combination has flipped before
(the qd kernel won pre-zero-copy-compact and lost after), so defaults must
be re-validated against THIS measurement, not historical ones.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",):
    os.environ["PAROPT_TPU_NO_X64"] = "1"

import time

import jax

from _ab_common import build_step


def toggle_pair(qd: bool, qn: bool):
    from paropt_tpu.ops import kkt
    from paropt_tpu.ops import qn as qnmod
    kkt._PALLAS_QD = qd
    qnmod._PALLAS_QN = qn


def main():
    variants = {}
    for qd in (False, True):
        for qn in (False, True):
            rk, st, gb, _, iters = build_step(
                lambda _on, _qd=qd, _qn=qn: toggle_pair(_qd, _qn), True)
            variants[(qd, qn)] = (rk, st, gb, iters)
    print("variant (qd, qn-roll): visible GB/step")
    for key, (_, _, gb, _) in variants.items():
        print(f"  qd={key[0]!s:5} qn={key[1]!s:5}: {gb:.2f} GB", flush=True)

    results = {k: [] for k in variants}
    for rep in range(5):
        for key, (rk, st, _, iters) in variants.items():
            t0 = time.time()
            out = rk(st)
            jax.block_until_ready(out)
            results[key].append(iters / (time.time() - t0))
    for key, vals in results.items():
        vals.sort()
        print(f"qd={key[0]!s:5} qn={key[1]!s:5}: "
              f"median {vals[len(vals)//2]:7.1f} it/s "
              f"(min {vals[0]:.1f}, max {vals[-1]:.1f})", flush=True)
    # convergence sanity: all variants must compute the same trajectory —
    # a plausible-looking it/s table means nothing if a kernel silently
    # diverges at a new byte mix
    for key, (rk, st, _, iters) in variants.items():
        out = rk(st)
        print(f"qd={key[0]!s:5} qn={key[1]!s:5}: after {iters} steps "
              f"res {float(out.res_norm):.3e} fobj {float(out.fobj):.6e}",
              flush=True)


if __name__ == "__main__":
    main()
