"""COPS 3.0 'electrons on a sphere' (Thomson problem) — the role of the
reference's `examples/COPS/electron.py`: minimize the Coulomb potential of
np point charges constrained to the unit sphere (np equality constraints),
in both the dense-constraint and general-CSR sparse forms.

    python examples/cops_electron.py [--n 20] [--csr] [--algorithm ip|tr]
"""

import argparse
import time
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from paropt_tpu.models.cops import Electron, ElectronCSR
from paropt_tpu.optimizer import Optimizer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20, help="number of electrons")
    ap.add_argument("--csr", action="store_true",
                    help="general-CSR sparse-constraint form")
    ap.add_argument("--algorithm", default="ip", choices=["ip", "tr"])
    args = ap.parse_args()

    prob = ElectronCSR(n=args.n) if args.csr else Electron(n=args.n)
    opts = {"algorithm": args.algorithm, "output_file": None,
            "tr_output_file": None, "abs_res_tol": 1e-7,
            "max_major_iters": 500}
    t0 = time.time()
    opt = Optimizer(prob, opts)
    opt.optimize()
    x, z, zw, zl, zu = opt.get_optimized_point()
    xyz = np.asarray(x).reshape(3, args.n)
    radii = np.sqrt((xyz ** 2).sum(axis=0))
    f = float(prob.eval_obj_con(x)[0])
    print("form: %s  wall %.1fs" % ("CSR" if args.csr else "dense",
                                    time.time() - t0))
    print("potential energy: %.6f" % f)
    print("sphere violation: %.2e" % float(np.abs(radii - 1.0).max()))


if __name__ == "__main__":
    main()
