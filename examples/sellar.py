"""Sellar problem (`examples/sellar/sellar.py` role)."""
import numpy as np
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# persistent compile cache: repeat runs skip the (slow) TPU compilation
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "paropt_tpu_jax"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_examples import Sellar  # noqa: E402
from paropt_tpu import InteriorPoint  # noqa: E402

ip = InteriorPoint(Sellar(), {"output_file": "-", "abs_res_tol": 1e-8})
res = ip.optimize()
print(f"\nconverged: {res['converged']}  f* = {res['fobj']:.8e}")
print("x* =", np.asarray(res["x"]))
