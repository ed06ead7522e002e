"""Minimal pyOptSparse stand-in for exercising the pyoptsparse driver's
adapter logic (sign flips, constraint ordering, start-point clipping, CSR
extraction) without the dependency.

Mirrors only the surface `paropt_tpu.drivers.pyoptsparse_driver` touches,
with the real package's semantics:

- constraints are g(x) with bounds; `_masterFunc` returns them processed to
  the <= 0 convention via fact/offset from `getOrdering` (the driver then
  negates to the framework's c(x) >= 0 form);
- `getOrdering(['ni','li','ne','le'], oneSided=True)` returns inequality
  rows first, equalities last, with fact=+1/offset=ub for upper-bounded
  rows and fact=-1/offset=-lb for lower-bounded rows;
- `processConstraintJacobian` + `extractRows` produce a CSR pattern
  ('csr': (rowp, cols, data)) over the ordered rows.

Install with `install(monkeypatch)` BEFORE importing the driver module.
"""

from __future__ import annotations

import sys
import types
from collections import OrderedDict

import numpy as np

INFINITY = 1e20
IROW, ICOL, IDATA = 0, 1, 2


class _ConGroup:
    def __init__(self, name, ncon, lower, upper, jac_dense):
        self.name = name
        self.ncon = ncon
        low = np.full(ncon, -INFINITY) if lower is None else \
            np.broadcast_to(np.asarray(lower, float), (ncon,))
        upp = np.full(ncon, INFINITY) if upper is None else \
            np.broadcast_to(np.asarray(upper, float), (ncon,))
        self.lower = np.array(low, float)
        self.upper = np.array(upp, float)
        # dense placeholder pattern; .jac is what the driver forwards into
        # processConstraintJacobian
        self.jac = jac_dense


class Optimization:
    """Fake of pyoptsparse.Optimization: one variable group 'xvars'."""

    def __init__(self, name, objfun):
        self.name = name
        self.objfun = objfun
        self.constraints = OrderedDict()
        self.variables = {}
        self.dummyConstraint = False
        self.jacIndices = None
        self.fact = None
        self.offset = None
        self.comm = types.SimpleNamespace(rank=0)

    def addVarGroup(self, name, n, value=0.0, lower=None, upper=None):
        value = np.broadcast_to(np.asarray(value, float), (n,)).copy()
        low = (np.full(n, -INFINITY) if lower is None
               else np.broadcast_to(np.asarray(lower, float), (n,)).copy())
        upp = (np.full(n, INFINITY) if upper is None
               else np.broadcast_to(np.asarray(upper, float), (n,)).copy())
        self.variables[name] = (value, low, upp)

    def addObj(self, name):
        self.obj_name = name

    def addConGroup(self, name, ncon, lower=None, upper=None,
                    jac_pattern=None):
        nvars = sum(v[0].size for v in self.variables.values())
        jac = (np.ones((ncon, nvars)) if jac_pattern is None
               else np.asarray(jac_pattern, float))
        self.constraints[name] = _ConGroup(name, ncon, lower, upper, jac)

    def finalize(self):
        pass

    # -- ordering (real semantics for one-sided nonlinear constraints) ------
    def _rows(self):
        """(global_row, lower, upper) triples in insertion order."""
        out = []
        base = 0
        for grp in self.constraints.values():
            for i in range(grp.ncon):
                out.append((base + i, grp.lower[i], grp.upper[i]))
            base += grp.ncon
        return out

    def getOrdering(self, kinds, oneSided=True, noEquality=False):
        indices, blc, buc, fact = [], [], [], []
        rows = self._rows()
        for kind in kinds:
            for (r, lo, up) in rows:
                is_eq = lo == up and lo > -INFINITY
                if kind in ("ne", "le") and is_eq:
                    indices.append(r)
                    blc.append(lo)
                    buc.append(up)
                    fact.append(1.0)
                elif kind in ("ni", "li") and not is_eq:
                    if up < INFINITY:
                        indices.append(r)
                        blc.append(-INFINITY)
                        buc.append(up)
                        fact.append(1.0)
                    elif lo > -INFINITY:
                        # lower-bounded: -g + lo <= 0
                        indices.append(r)
                        blc.append(-INFINITY)
                        buc.append(-lo)
                        fact.append(-1.0)
            # 'le'/'li' (linear) duplicates 'ne'/'ni' here; only emit once
            if kind in ("le", "li"):
                pass
        # dedupe while keeping order (linear kinds emit nothing here, but a
        # caller listing both 'ne' and 'le' must not duplicate rows)
        seen = set()
        keep = [k for k, r in enumerate(indices)
                if not (r in seen or seen.add(r))]
        return ([indices[k] for k in keep], np.array([blc[k] for k in keep]),
                np.array([buc[k] for k in keep]),
                np.array([fact[k] for k in keep]))

    def processConstraintJacobian(self, gcon):
        """Stack the per-group dense jacs in insertion order -> CSR dict."""
        mats = [np.asarray(gcon[name], float) for name in self.constraints]
        dense = np.vstack(mats) if mats else np.zeros((0, 0))
        rowp = [0]
        cols, data = [], []
        for i in range(dense.shape[0]):
            nz = np.nonzero(dense[i])[0]
            cols.extend(nz.tolist())
            data.extend(dense[i, nz].tolist())
            rowp.append(len(cols))
        return {"csr": (np.asarray(rowp, np.int64),
                        np.asarray(cols, np.int64),
                        np.asarray(data))}


def extractRows(jac, indices):
    rowp, cols, data = jac["csr"]
    nrowp = [0]
    ncols, ndata = [], []
    for r in indices:
        ncols.extend(cols[rowp[r]:rowp[r + 1]].tolist())
        ndata.extend(data[rowp[r]:rowp[r + 1]].tolist())
        nrowp.append(len(ncols))
    return {"csr": (np.asarray(nrowp, np.int64), np.asarray(ncols, np.int64),
                    np.asarray(ndata))}


class Solution:
    def __init__(self, opt_time, sol_inform, obj, xopt, multipliers):
        self.optTime = opt_time
        self.optInform = sol_inform
        self.fStar = obj
        self.xStar = {"xvars": np.asarray(xopt)}
        self.lambdaStar = multipliers


class Optimizer:
    """Fake of pyoptsparse.pyOpt_optimizer.Optimizer."""

    def __init__(self, name, category, defaultOptions=None, informs=None,
                 options=None):
        self.name = name
        self.category = category
        self.defaultOptions = defaultOptions or {}
        self.informs = informs or {}
        self.options = {k: list(v) for k, v in self.defaultOptions.items()}
        for k, v in (options or {}).items():
            self.setOption(k, v)

    def setOption(self, name, value):
        if name not in self.defaultOptions:
            raise ValueError(f"unknown option {name!r}")
        self.options[name][1] = value
        hook = getattr(self, "_on_setOption", None)
        if hook is not None:
            hook(name, value)

    # -- pieces the driver calls -------------------------------------------
    def _setSens(self, sens, sensStep, sensMode):
        self.sens = sens

    def _setInitialCacheValues(self):
        self.cache = {"x": None, "funcs": None}

    def _setHistory(self, storeHistory, hotStart):
        self.storeHistory = None

    def _assembleContinuousVariables(self):
        value, low, upp = self.optProb.variables["xvars"]
        return low.copy(), upp.copy(), value.copy()

    def _masterFunc(self, x, evaluate):
        x = np.asarray(x, float)
        funcs, fail = self.optProb.objfun({"xvars": x})
        names = list(self.optProb.constraints)
        if "fobj" in evaluate or "fcon" in evaluate:
            fobj = float(funcs["obj"])
            if self.optProb.dummyConstraint or not names:
                fcon = np.zeros(1)
            else:
                con = np.concatenate(
                    [np.atleast_1d(np.asarray(funcs[n], float))
                     for n in names])
                fcon = (self.optProb.fact * con[self.optProb.jacIndices]
                        - self.optProb.offset)
            return fobj, fcon, int(bool(fail))
        if "gobj" in evaluate or "gcon" in evaluate:
            sens_funcs, sfail = self.sens({"xvars": x}, funcs)
            gobj = np.asarray(sens_funcs["obj"]["xvars"], float).reshape(-1)
            if self.optProb.dummyConstraint or not names:
                gcon = np.zeros((1, gobj.size))
            else:
                jac = np.vstack(
                    [np.atleast_2d(np.asarray(sens_funcs[n]["xvars"], float))
                     for n in names])
                if getattr(self, "jacType", "dense2d") == "csr":
                    # CSR-jacType optimizers receive the ordered rows'
                    # nonzero DATA (pattern from the declared jac), exactly
                    # what extractRows(processConstraintJacobian(...))
                    # enumerates
                    pattern = np.vstack([grp.jac for grp in
                                         self.optProb.constraints.values()])
                    data = []
                    for k, r in enumerate(self.optProb.jacIndices):
                        nz = np.nonzero(pattern[r])[0]
                        data.extend(
                            (self.optProb.fact[k] * jac[r, nz]).tolist())
                    gcon = np.asarray(data)
                else:
                    gcon = (self.optProb.fact[:, None]
                            * jac[self.optProb.jacIndices])
            return gobj, gcon, int(bool(sfail))
        raise ValueError(f"unsupported evaluate {evaluate}")

    def _createSolution(self, opt_time, sol_inform, obj, xopt,
                        multipliers=None):
        return Solution(opt_time, sol_inform, obj, xopt, multipliers)


def install(monkeypatch):
    """Install fake pyoptsparse modules into sys.modules."""
    pkg = types.ModuleType("pyoptsparse")
    opt_mod = types.ModuleType("pyoptsparse.pyOpt_optimizer")
    opt_mod.Optimizer = Optimizer
    utils_mod = types.ModuleType("pyoptsparse.pyOpt_utils")
    utils_mod.INFINITY = INFINITY
    utils_mod.IROW, utils_mod.ICOL, utils_mod.IDATA = IROW, ICOL, IDATA
    utils_mod.extractRows = extractRows
    pkg.pyOpt_optimizer = opt_mod
    pkg.pyOpt_utils = utils_mod
    pkg.Optimization = Optimization
    monkeypatch.setitem(sys.modules, "pyoptsparse", pkg)
    monkeypatch.setitem(sys.modules, "pyoptsparse.pyOpt_optimizer", opt_mod)
    monkeypatch.setitem(sys.modules, "pyoptsparse.pyOpt_utils", utils_mod)
    # force a clean re-import of the driver against the fake
    monkeypatch.delitem(sys.modules, "paropt_tpu.drivers.pyoptsparse_driver",
                        raising=False)
    return pkg
