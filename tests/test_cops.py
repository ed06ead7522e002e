"""COPS benchmark convergence tests (the reference's examples-as-tests)."""

import numpy as np
import pytest

from paropt_tpu import InteriorPoint
from paropt_tpu.models.cops import Electron, ElectronCSR, Polygon


def test_electron_dense():
    n = 8
    prob = Electron(n=n)
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-6,
                              "max_major_iters": 300})
    res = ip.optimize()
    assert res["converged"], res
    x = np.asarray(res["x"])
    radii = x[:n] ** 2 + x[n:2 * n] ** 2 + x[2 * n:] ** 2
    assert np.allclose(radii, 1.0, atol=1e-5)
    # known optimal Coulomb energy for n=8 is ~19.675
    assert res["fobj"] < 20.5


def test_electron_csr_matches_dense():
    n = 6
    ip1 = InteriorPoint(Electron(n=n), {"output_file": None,
                                        "abs_res_tol": 1e-6,
                                        "max_major_iters": 300})
    r1 = ip1.optimize()
    ip2 = InteriorPoint(ElectronCSR(n=n), {"output_file": None,
                                           "abs_res_tol": 1e-6,
                                           "max_major_iters": 300})
    r2 = ip2.optimize()
    assert r1["converged"] and r2["converged"], (r1, r2)
    # energies agree (configurations may differ by rotation)
    assert r1["fobj"] == pytest.approx(r2["fobj"], abs=1e-3)


def test_polygon():
    prob = Polygon(nv=6)
    ip = InteriorPoint(prob, {"output_file": None, "abs_res_tol": 1e-6,
                              "max_major_iters": 500})
    res = ip.optimize()
    assert res["converged"], res
    area = prob.area(res["x"])
    c = np.asarray(prob.constraints(res["x"]))
    assert (c > -1e-5).all()
    # feasible and a substantial fraction of the known optimum for the
    # largest small hexagon (0.674981 for unit diameter)
    assert area > 0.3
