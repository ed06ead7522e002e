"""pyOptSparse driver logic tests against the minimal stand-in
(tests/_fake_pyoptsparse.py) — the adapter semantics of the reference's
`paropt_pyoptsparse.py`: constraint sign flips (g(x) <= 0  ->  c(x) >= 0),
inequalities-before-equalities ordering, starting-point clipping
(`paropt_pyoptsparse.py:48-86`), the CSR sparse path, and multiplier sign
flips in the returned solution."""

import numpy as np
import pytest

from . import _fake_pyoptsparse as fake


def _make_driver(monkeypatch, options=None, sparse=False):
    fake.install(monkeypatch)
    import importlib
    drv = importlib.import_module("paropt_tpu.drivers.pyoptsparse_driver")
    drv = importlib.reload(drv)  # rebind against the installed fake
    opt = drv.ParOpt(options=options or {}, sparse=sparse)
    return drv, opt


def test_dense_ineq_and_equality_ordering(monkeypatch):
    """Equality declared FIRST in the optProb must still land LAST in the
    framework's constraint ordering (trailing constraints are equalities):
    both the equality x0+x1=1 and the inequality x0<=0.25 are active at the
    optimum (0.25, 0.75)."""
    drv, opt = _make_driver(monkeypatch, options={"algorithm": "ip",
                                                  "output_file": None})

    def objfun(xdict):
        x = xdict["xvars"]
        return {"obj": (x[0] - 2.0) ** 2 + (x[1] - 2.0) ** 2,
                "eq": np.array([x[0] + x[1]]),
                "ineq": np.array([x[0]])}, False

    def sens(xdict, funcs):
        x = xdict["xvars"]
        return {"obj": {"xvars": np.array([2 * (x[0] - 2), 2 * (x[1] - 2)])},
                "eq": {"xvars": np.array([[1.0, 1.0]])},
                "ineq": {"xvars": np.array([[1.0, 0.0]])}}, False

    prob = fake.Optimization("qp", objfun)
    prob.addVarGroup("xvars", 2, value=0.0, lower=-5.0, upper=5.0)
    prob.addObj("obj")
    prob.addConGroup("eq", 1, lower=1.0, upper=1.0)       # equality FIRST
    prob.addConGroup("ineq", 1, upper=0.25)               # x0 <= 0.25
    sol = opt(prob, sens=sens)
    x = sol.xStar["xvars"]
    assert np.allclose(x, [0.25, 0.75], atol=1e-4), x
    # multipliers are sign-flipped (-z): the active <=-inequality comes
    # first and must be reported <= 0 in pyOptSparse's convention
    lam = np.asarray(sol.lambdaStar)
    assert lam.shape == (2,)
    assert lam[0] <= 1e-8


def test_lower_bounded_constraint_sign(monkeypatch):
    """g(x) >= 1 goes through the fact=-1 leg: processed -g+1 <= 0, adapter
    flips to c = g-1 >= 0.  Optimum of min |x|^2 s.t. x0+x1>=1 is
    (0.5, 0.5)."""
    drv, opt = _make_driver(monkeypatch, options={"algorithm": "ip",
                                                  "output_file": None})

    def objfun(xdict):
        x = xdict["xvars"]
        return {"obj": x[0] ** 2 + x[1] ** 2,
                "con": np.array([x[0] + x[1]])}, False

    def sens(xdict, funcs):
        x = xdict["xvars"]
        return {"obj": {"xvars": 2 * x},
                "con": {"xvars": np.array([[1.0, 1.0]])}}, False

    prob = fake.Optimization("lb", objfun)
    prob.addVarGroup("xvars", 2, value=2.0, lower=-5.0, upper=5.0)
    prob.addObj("obj")
    prob.addConGroup("con", 1, lower=1.0)
    sol = opt(prob, sens=sens)
    assert np.allclose(sol.xStar["xvars"], [0.5, 0.5], atol=1e-4)


def test_start_point_clipping(monkeypatch):
    """A start outside the bounds is clipped to the bound and then moved
    strictly inside by half the average bound gap
    (`paropt_pyoptsparse.py:48-72`): bounds [0, 2], xs=5 -> first
    evaluation at x = 2 - 0.5*min(2, 2) = 1."""
    first_x = []

    def objfun(xdict):
        x = xdict["xvars"]
        if not first_x:
            first_x.append(np.array(x))
        return {"obj": float((x[0] - 0.5) ** 2),
                "con": np.array([x[0]])}, False

    def sens(xdict, funcs):
        x = xdict["xvars"]
        return {"obj": {"xvars": np.array([2 * (x[0] - 0.5)])},
                "con": {"xvars": np.array([[1.0]])}}, False

    drv, opt = _make_driver(monkeypatch, options={"algorithm": "ip",
                                                  "output_file": None,
                                                  "max_major_iters": 20})
    prob = fake.Optimization("clip", objfun)
    prob.addVarGroup("xvars", 1, value=5.0, lower=0.0, upper=2.0)
    prob.addObj("obj")
    prob.addConGroup("con", 1, upper=10.0)
    opt(prob, sens=sens)
    assert first_x and abs(first_x[0][0] - 1.0) < 1e-12, first_x


def test_unconstrained_dummy_constraint(monkeypatch):
    """An unconstrained problem gets the dummy constraint treatment and
    still solves (`paropt_pyoptsparse.py:276-280`)."""
    def objfun(xdict):
        x = xdict["xvars"]
        return {"obj": float(np.sum((x - 1.5) ** 2))}, False

    def sens(xdict, funcs):
        x = xdict["xvars"]
        return {"obj": {"xvars": 2 * (x - 1.5)}}, False

    drv, opt = _make_driver(monkeypatch, options={"algorithm": "ip",
                                                  "output_file": None})
    prob = fake.Optimization("uncon", objfun)
    prob.addVarGroup("xvars", 3, value=0.0, lower=-5.0, upper=5.0)
    prob.addObj("obj")
    sol = opt(prob, sens=sens)
    assert np.allclose(sol.xStar["xvars"], 1.5, atol=1e-4)


def test_sparse_csr_path(monkeypatch):
    """sparse=True extracts the CSR pattern from the constraint Jacobian
    structure and routes through the sparse weighting-constraint path
    (`paropt_pyoptsparse.py:324-347`); multipliers come from zw,
    sign-flipped."""
    def objfun(xdict):
        x = xdict["xvars"]
        return {"obj": float(np.sum((x - 2.0) ** 2)),
                "con": np.array([x[0] + x[1], x[2] + x[3]])}, False

    def sens(xdict, funcs):
        x = xdict["xvars"]
        jac = np.array([[1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0]])
        return {"obj": {"xvars": 2 * (x - 2.0)},
                "con": {"xvars": jac}}, False

    drv, opt = _make_driver(monkeypatch, sparse=True,
                            options={"algorithm": "ip", "output_file": None})
    prob = fake.Optimization("sp", objfun)
    prob.addVarGroup("xvars", 4, value=0.0, lower=-5.0, upper=5.0)
    prob.addObj("obj")
    # x0+x1 <= 1, x2+x3 <= 1: both active, optimum x = 0.5 everywhere
    prob.addConGroup("con", 2, upper=1.0,
                     jac_pattern=[[1.0, 1.0, 0.0, 0.0],
                                  [0.0, 0.0, 1.0, 1.0]])
    sol = opt(prob, sens=sens)
    assert np.allclose(sol.xStar["xvars"], 0.5, atol=1e-3), sol.xStar
    lam = np.asarray(sol.lambdaStar)
    assert lam.shape == (2,)
    assert np.all(lam <= 1e-6)  # active <=-constraints: negative multipliers


def test_sparse_rejects_trust_region(monkeypatch):
    drv, opt = _make_driver(monkeypatch, sparse=True,
                            options={"algorithm": "tr"})
    prob = fake.Optimization("x", lambda xd: ({"obj": 0.0}, False))
    prob.addVarGroup("xvars", 1, value=0.0, lower=0.0, upper=1.0)
    prob.addObj("obj")
    with pytest.raises(ValueError, match="[Tt]rust region"):
        opt(prob, sens=lambda xd, f: ({"obj": {"xvars": np.zeros(1)}}, False))
