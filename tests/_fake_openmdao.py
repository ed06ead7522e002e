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


class TrajectoryProblem:
    """Fake dymos-transcription problem (the role of
    `examples/dymos/brachistochrone`): a trajectory phase exposed through
    the OpenMDAO surface exactly the way dymos presents it to
    ParOptSparseDriver — state/control/duration design-variable groups,
    one 'defects' EQUALITY constraint vector (the collocation defects,
    `equals=0`), and a final-time objective.  The math is backed by
    `BrachistochroneCollocation` (trapezoidal transcription)."""

    def __init__(self, n_nodes=16):
        from paropt_tpu.models.brachistochrone import (
            BrachistochroneCollocation)
        import jax
        m = BrachistochroneCollocation(n_nodes=n_nodes)
        self.model = m
        x0, lb, ub = (np.asarray(a, float) for a in m.get_vars_and_bounds())
        N = m.N
        self._slices = {
            "states:x": slice(m._ox, m._ox + N - 2),
            "states:y": slice(m._oy, m._oy + N - 2),
            "states:v": slice(m._ov, m._ov + N - 1),
            "controls:theta": slice(m._ot, m._ot + N),
            "t_duration": slice(m._otf, m._otf + 1),
        }
        self.vals = {k: x0[sl].copy() for k, sl in self._slices.items()}
        self._dv_meta = {
            k: {"size": sl.stop - sl.start, "lower": lb[sl].copy(),
                "upper": ub[sl].copy()}
            for k, sl in self._slices.items()}
        self._con_meta = {
            "defects": {"size": m.nwcon, "equals": 0.0,
                        "lower": -1e30, "upper": 1e30},
        }
        self._obj_names = ["time"]
        self.outputs = {}
        self.nruns = 0
        self._jac = jax.jit(jax.jacrev(m._defects))

    def _assemble(self):
        x = np.zeros(self.model.nvars)
        for k, sl in self._slices.items():
            x[sl] = self.vals[k]
        return x

    def run_model(self):
        x = self._assemble()
        self.outputs = {
            "time": np.array([x[self.model._otf]]),
            "defects": np.asarray(self.model._defects(x)),
        }
        self.nruns += 1

    def compute_totals(self, of, wrt, return_format="array"):
        x = self._assemble()
        J = np.asarray(self._jac(x))
        rows = []
        for name in of:
            if name == "time":
                g = np.zeros((1, self.model.nvars))
                g[0, self.model._otf] = 1.0
                rows.append(g)
            elif name == "defects":
                rows.append(J)
        return np.vstack(rows)
