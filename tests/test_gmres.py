"""Newton-Krylov (GMRES + Hessian-vector product) inexact phase tests."""

import numpy as np
import jax.numpy as jnp

from paropt_tpu import InteriorPoint
from paropt_tpu.models.analytic import RandomConvexQP, Rosenbrock


def test_gmres_phase_converges_qp():
    prob = RandomConvexQP(n=20, ncon=2, seed=41)
    ip = InteriorPoint(prob, {
        "output_file": None, "abs_res_tol": 1e-9,
        "use_hvec_product": True, "gmres_subspace_size": 25,
        "nk_switch_tol": 1.0, "max_major_iters": 200,
    })
    res = ip.optimize()
    assert res["converged"], res
    assert ip.nhvec > 0, "GMRES phase never engaged"
    # same answer as the quasi-Newton-only path
    prob2 = RandomConvexQP(n=20, ncon=2, seed=41)
    ip2 = InteriorPoint(prob2, {"output_file": None, "abs_res_tol": 1e-9,
                                "max_major_iters": 200})
    res2 = ip2.optimize()
    assert np.allclose(np.asarray(res["x"]), np.asarray(res2["x"]),
                       atol=1e-6)


def test_gmres_phase_rosenbrock():
    prob = Rosenbrock()
    ip = InteriorPoint(prob, {
        "output_file": None, "abs_res_tol": 1e-8,
        "use_hvec_product": True, "gmres_subspace_size": 20,
        "nk_switch_tol": 10.0,
    })
    res = ip.optimize()
    assert res["converged"], res
    assert np.allclose(np.asarray(res["x"]), [1.0, 1.0], atol=1e-4)
    assert ip.nhvec > 0
