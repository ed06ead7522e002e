"""Convergence-history plotting (the role of `paropt/plot_history.py`).

Parses the fixed-width optimizer logs (`paropt.out` / `paropt.tr` /
`paropt.mma`) via the `unpack_*` contract parsers and draws multi-axis
convergence plots.  Usable as a module or CLI:

    python -m paropt_tpu.utils.plot_history paropt.out [-o out.png]
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np

from .logging import unpack_mma_output, unpack_output, unpack_tr_output

__all__ = ["plot_history", "main"]


def _detect_kind(path: str) -> str:
    if path.endswith(".tr"):
        return "tr"
    if path.endswith(".mma"):
        return "mma"
    return "ip"


def plot_history(path: str, output: Optional[str] = None, kind: str = "auto",
                 show: bool = False):
    """Plot a convergence history file; returns the matplotlib figure."""
    import matplotlib
    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if kind == "auto":
        kind = _detect_kind(path)
    if kind == "tr":
        h = unpack_tr_output(path)
        series = [("fobj", "objective", "linear"),
                  ("infeas", "infeasibility", "log"),
                  ("linfty", "l-infinity optimality", "log"),
                  ("tr", "trust region radius", "log")]
    elif kind == "mma":
        h = unpack_mma_output(path)
        series = [("fobj", "objective", "linear"),
                  ("infeas", "infeasibility", "log"),
                  ("linfty", "l-infinity optimality", "log"),
                  ("l1", "l1 optimality", "log")]
    else:
        h = unpack_output(path)
        series = [("fobj", "objective", "linear"),
                  ("infes", "infeasibility", "log"),
                  ("opt", "optimality", "log"),
                  ("mu", "barrier parameter", "log")]

    fig, axes = plt.subplots(2, 2, figsize=(10, 7), sharex=True)
    it = h["iter"]
    for ax, (key, label, scale) in zip(axes.ravel(), series):
        vals = h[key]
        mask = np.isfinite(vals)
        if scale == "log":
            mask &= vals > 0
        ax.plot(it[mask], vals[mask], "-o", ms=2.5, lw=1.0)
        ax.set_yscale(scale)
        ax.set_title(label)
        ax.grid(True, alpha=0.3)
    for ax in axes[-1]:
        ax.set_xlabel("iteration")
    fig.suptitle(os.path.basename(path))
    fig.tight_layout()
    if output:
        fig.savefig(output, dpi=140)
    if show:
        plt.show()
    return fig


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("logfile")
    p.add_argument("-o", "--output", default=None)
    p.add_argument("--kind", default="auto",
                   choices=["auto", "ip", "tr", "mma"])
    args = p.parse_args(argv)
    out = args.output or (args.logfile + ".png")
    plot_history(args.logfile, output=out, kind=args.kind)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
