"""Truss sizing and DMO multi-material tests (reference `examples/truss`,
`examples/dmo_truss` analogues)."""

import numpy as np
import jax.numpy as jnp
import pytest

from paropt_tpu import InteriorPoint
from paropt_tpu.mma import MMA
from paropt_tpu.tr import TrustRegion
from paropt_tpu.models.truss import TrussSizing, DMOTruss


def test_truss_gradients_exact():
    prob = TrussSizing()
    errs = prob.check_gradients(1e-6, verbose=False)
    assert errs["obj_gradient"] < 1e-5
    assert errs["con_gradient"] < 1e-7


def test_truss_sizing_ip():
    prob = TrussSizing()
    x0, _, _ = prob.get_vars_and_bounds()
    f0 = float(prob.objective(x0))
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-6,
                              "max_major_iters": 300})
    res = ip.optimize()
    assert res["converged"], res
    assert res["fobj"] < f0  # compliance reduced
    assert float(prob.constraints(res["x"])[0]) > -1e-6  # mass feasible


def test_truss_sizing_tr():
    prob = TrussSizing()
    tr = TrustRegion(prob, {
        "tr_output_file": None, "output_file": None,
        "tr_max_iterations": 100, "tr_l1_tol": 1e-4, "tr_linfty_tol": 1e-4,
        "abs_res_tol": 1e-7})
    res = tr.optimize()
    assert res["converged"], res
    assert float(prob.constraints(res["x"])[0]) > -1e-5


def test_dmo_truss_mma():
    """Multi-material DMO with sparse per-bar weighting constraints via MMA
    (the reference's usual algorithm for this problem class)."""
    prob = DMOTruss()
    x0, _, _ = prob.get_vars_and_bounds()
    f0 = float(prob.objective(x0))
    mma = MMA(prob, {"mma_output_file": None, "output_file": None,
                     "mma_max_iterations": 60})
    res = mma.optimize()
    x = res["x"]
    assert res["fobj"] < f0
    assert float(prob.constraints(x)[0]) > -1e-4
    assert float(jnp.min(prob.sparse_constraints(x))) > -1e-4


def test_dmo_truss_ip():
    prob = DMOTruss(nx=3, ny=2)
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-5,
                              "max_major_iters": 400})
    res = ip.optimize()
    assert res["converged"], res
    x = res["x"]
    assert float(prob.constraints(x)[0]) > -1e-5
    assert float(jnp.min(prob.sparse_constraints(x))) > -1e-5
    # SIMP penalization should drive most bars toward a dominant material
    w = np.asarray(x).reshape(prob.fem.nbars, prob.nmat)
    assert w.max() > 0.5
