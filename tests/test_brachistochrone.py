"""Dymos-role trajectory optimization: brachistochrone by trapezoidal
collocation through the general-CSR sparse path, anchored to the
reference's own dymos assertion (final time 1.8016 s at rel 1e-3,
`examples/dymos/brachistochrone/brachistochrone.py`)."""

import numpy as np
import pytest

from paropt_tpu import InteriorPoint
from paropt_tpu.models.brachistochrone import BrachistochroneCollocation

# the option set the reference's dymos example passes to ParOptSparseDriver
_DYMOS_OPTS = {
    "algorithm": "ip",
    "output_file": None, "norm_type": "infinity",
    "qn_subspace_size": 10,
    "starting_point_strategy": "least_squares_multipliers",
    "qn_update_type": "damped_update", "abs_res_tol": 1e-6,
    "barrier_strategy": "monotone", "armijo_constant": 1e-5,
    "penalty_gamma": 100.0, "max_major_iters": 500,
}


def test_collocation_gradients():
    prob = BrachistochroneCollocation(n_nodes=12)
    errs = prob.check_gradients(1e-6, verbose=False)
    assert errs["obj_gradient"] < 1e-8, errs
    assert errs["sparse_jacobian"] < 1e-6, errs
    assert errs["sparse_adjoint"] < 1e-12, errs


def test_defects_vanish_on_integrated_trajectory():
    """The defect residuals are an actual transcription: zero (to
    quadrature order) on a trapezoid-integrated trajectory of the ODE."""
    import jax.numpy as jnp
    prob = BrachistochroneCollocation(n_nodes=24)
    x0, _, _ = prob.get_vars_and_bounds()
    # integrate the ODE under the linear theta(t) control with trapezoid
    # steps, then pack the states back into the variable vector
    _, _, _, th_full, tf = prob._full_states(x0)
    th = np.asarray(th_full)
    N, g = prob.N, prob.g
    tf = 2.0
    h = tf / (N - 1)
    xs = np.zeros(N)
    ys = np.zeros(N)
    vs = np.zeros(N)
    xs[0], ys[0] = prob.bc[0], prob.bc[1]
    vs[0] = prob.bc[4]

    def f(s, th_i):
        x, y, v = s
        return np.array([v * np.sin(th_i), -v * np.cos(th_i),
                         g * np.cos(th_i)])

    for i in range(N - 1):
        s = np.array([xs[i], ys[i], vs[i]])
        # solve the (linear-in-v) trapezoid step by fixed point
        s1 = s + h * f(s, th[i])
        for _ in range(50):
            s1 = s + 0.5 * h * (f(s, th[i]) + f(s1, th[i + 1]))
        xs[i + 1], ys[i + 1], vs[i + 1] = s1
    xv = np.asarray(x0, float).copy()
    xv[prob._ox:prob._ox + N - 2] = xs[1:-1]
    xv[prob._oy:prob._oy + N - 2] = ys[1:-1]
    xv[prob._ov:prob._ov + N - 1] = vs[1:]
    xv[prob._otf] = tf
    d = np.asarray(prob._defects(jnp.asarray(xv)))
    # every defect vanishes except the two end-state mismatches (the
    # integrated trajectory does not hit the fixed endpoint)
    mask = np.ones_like(d, dtype=bool)
    mask[3 * (N - 2)] = mask[3 * (N - 2) + 1] = False  # final x, y defects
    assert np.max(np.abs(d[mask])) < 1e-10, np.max(np.abs(d[mask]))


def test_brachistochrone_ip_hits_dymos_anchor():
    """IP on the N=48 transcription reproduces the reference's asserted
    optimum: tf = 1.8016 at rel 1e-3."""
    ip_opts = {k: v for k, v in _DYMOS_OPTS.items() if k != "algorithm"}
    prob = BrachistochroneCollocation(n_nodes=48)
    res = InteriorPoint(prob, ip_opts).optimize()
    assert res["converged"], res
    assert res["fobj"] == pytest.approx(1.8016, rel=1e-3), res["fobj"]
    # defects satisfied at the optimum
    d = np.asarray(prob._defects(res["x"]))
    assert np.max(np.abs(d)) < 1e-6


def test_fake_dymos_sparse_driver(monkeypatch):
    """ParOptSparseDriver consumes a dymos-style transcription (equality
    defect constraints through the sparse path) end-to-end."""
    import importlib
    import sys
    import types
    from tests import _fake_openmdao as fake

    om_api = types.ModuleType("openmdao.api")
    om_api.Driver = fake.Driver
    om_pkg = types.ModuleType("openmdao")
    om_pkg.api = om_api
    monkeypatch.setitem(sys.modules, "openmdao", om_pkg)
    monkeypatch.setitem(sys.modules, "openmdao.api", om_api)
    for mod in ("paropt_tpu.drivers.openmdao_driver",
                "paropt_tpu.drivers.openmdao_sparse_driver"):
        sys.modules.pop(mod, None)
    drv_mod = importlib.import_module(
        "paropt_tpu.drivers.openmdao_sparse_driver")

    om_prob = fake.TrajectoryProblem(n_nodes=16)
    driver = drv_mod.ParOptSparseDriver()
    for k, v in _DYMOS_OPTS.items():
        driver.options[k] = v
    driver._setup_driver(om_prob)
    driver.set_sparse_constraints(["defects"])
    failed = driver.run()
    assert not failed
    adapter = driver._paropt_problem
    # all defects are sparse EQUALITIES, no dense constraints
    assert adapter.nwcon == om_prob.model.nwcon
    assert adapter.nwinequality == 0
    assert adapter.ncon == 0
    tf = float(om_prob.vals["t_duration"][0])
    # N=16 trapezoid: coarser discretization, looser anchor
    assert tf == pytest.approx(1.8016, rel=2e-2), tf


def test_ssto_collocation_hits_dymos_anchor():
    """The SSTO lunar ascent (`examples/dymos/ssto/ssto.py` role):
    linear-tangent guidance + trapezoidal collocation reproduces the
    documented optimum t_f ~= 481 s (measured discretization limit
    481.76; N=40 gives 481.90)."""
    from paropt_tpu.models.ssto import SSTOCollocation

    prob = SSTOCollocation(n_nodes=40)
    errs = prob.check_gradients(1e-6, verbose=False)
    assert errs["obj_gradient"] < 1e-6, errs
    assert errs["con_gradient"] < 1e-6, errs
    assert errs["sparse_jacobian"] < 1e-6, errs

    ip_opts = {k: v for k, v in _DYMOS_OPTS.items() if k != "algorithm"}
    res = InteriorPoint(prob, ip_opts).optimize()
    assert res["converged"], res
    tf = prob.final_time(res["x"])
    assert tf == pytest.approx(481.90, rel=1e-3), tf
    d = np.asarray(prob._defects(res["x"]))
    c = np.asarray(prob.constraints(res["x"]))
    assert np.max(np.abs(d)) < 1e-6       # dynamics satisfied
    assert np.max(np.abs(c)) < 1e-6       # orbit-insertion BCs satisfied
    # linear-tangent guidance pitches DOWN monotonically (p0 > p1)
    x = np.asarray(res["x"])
    assert x[prob._op] > x[prob._op + 1]


def test_colored_jacobian_fill_generic():
    """colored_jacobian_fill is exact on any CSRSparseProblem: matches
    ElectronCSR's handwritten analytic fill and the dense jacrev on the
    collocation models, with O(1) colors."""
    import jax
    import jax.numpy as jnp
    from paropt_tpu.models.cops import ElectronCSR

    el = ElectronCSR(n=5)
    x = jnp.asarray(np.linspace(0.1, 1.0, el.nvars))
    fill = el.colored_jacobian_fill()
    np.testing.assert_allclose(np.asarray(fill(x)),
                               np.asarray(el.eval_sparse_jacobian_data(x)),
                               rtol=1e-14)

    prob = BrachistochroneCollocation(n_nodes=16)
    xv = jnp.asarray(prob.get_vars_and_bounds()[0]) * 1.03
    J = np.asarray(jax.jacrev(prob._defects)(xv))
    rows = np.repeat(np.arange(prob.nwcon), np.diff(prob.csr_rowp))
    np.testing.assert_allclose(
        np.asarray(prob.eval_sparse_jacobian_data(xv)),
        J[rows, prob.csr_cols], rtol=0, atol=1e-14)
