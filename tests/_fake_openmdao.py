"""Minimal stand-in for the OpenMDAO surface the drivers consume, so the
driver code paths run in CI without the real dependency.  Implements only
what `ParOptDriver`/`ParOptSparseDriver` touch: Driver base with options /
supports / design-var + constraint metadata, and a Problem with run_model /
compute_totals over a quadratic model."""

from __future__ import annotations

import numpy as np


class _Options(dict):
    def declare(self, name, default=None, values=None, desc=None, **kw):
        self[name] = default


class Driver:
    def __init__(self, **kwargs):
        self.options = _Options()
        self.supports = {}
        self._declare_options()

    def _declare_options(self):
        pass

    def _setup_driver(self, problem):
        self._prob = problem
        self._designvars = problem._dv_meta
        self._cons = problem._con_meta
        self._objs = problem._obj_names

    def _problem(self):
        return self._prob

    def get_design_var_values(self):
        return {k: np.array(self._prob.vals[k]) for k in self._designvars}

    def set_design_var(self, name, val):
        self._prob.vals[name] = np.atleast_1d(np.array(val, dtype=float))

    def get_constraint_values(self):
        self._prob.run_model()
        return {k: self._prob.outputs[k] for k in self._cons}

    def get_objective_values(self):
        self._prob.run_model()
        return {k: self._prob.outputs[k] for k in self._objs}


class QuadProblem:
    """min sum((x - t)^2)  s.t.  sum(x) - s0 >= 0 (dense 'total'),
    per-element x_i <= 0.8 ('local', suitable for the sparse path)."""

    def __init__(self, n=6, target=1.0, s0=2.0):
        self.n = n
        self.t = target
        self.s0 = s0
        self.vals = {"x": np.full(n, 0.5)}
        self._dv_meta = {"x": {"size": n, "lower": 0.0, "upper": 2.0}}
        self._con_meta = {
            "total": {"size": 1, "equals": None, "lower": 0.0,
                      "upper": 1e30},
            "local": {"size": n, "equals": None, "lower": -1e30,
                      "upper": 0.8},
        }
        self._obj_names = ["obj"]
        self.outputs = {}
        self.nruns = 0

    def run_model(self):
        x = self.vals["x"]
        self.outputs = {
            "obj": np.array([np.sum((x - self.t) ** 2)]),
            "total": np.array([np.sum(x) - self.s0]),
            "local": x.copy(),
        }
        self.nruns += 1

    def compute_totals(self, of, wrt, return_format="array"):
        x = self.vals["x"]
        rows = []
        for name in of:
            if name == "obj":
                rows.append(2.0 * (x - self.t)[None, :])
            elif name == "total":
                rows.append(np.ones((1, self.n)))
            elif name == "local":
                rows.append(np.eye(self.n))
        return np.vstack(rows)
