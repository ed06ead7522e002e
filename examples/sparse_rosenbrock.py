"""Rosenbrock with a sparse weighting constraint
(the role of `examples/sparse/sparse_rosenbrock.py`)."""

import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# persistent compile cache: repeat runs skip the (slow) TPU compilation
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "paropt_tpu_jax"))

from paropt_tpu import InteriorPoint
from paropt_tpu.models.analytic import SparseRosenbrock


def main():
    prob = SparseRosenbrock()
    prob.check_gradients()
    ip = InteriorPoint(prob, {"abs_res_tol": 1e-7, "output_file": "-"})
    res = ip.optimize()
    print(f"\nconverged: {res['converged']}  f* = {res['fobj']:.8e}")
    print(f"x* = {np.asarray(res['x'])}")


if __name__ == "__main__":
    main()
