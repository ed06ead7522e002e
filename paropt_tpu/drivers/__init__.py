"""Framework driver integrations (the reference's L8 pure-Python layer):

- `callbacks.FunctionProblem` — build a Problem from plain Python/numpy
  callables (the generic adapter the drivers below build upon)
- `pyoptsparse_driver.ParOpt` — pyOptSparse Optimizer subclass
  (`paropt/paropt_pyoptsparse.py` role); requires pyoptsparse
- `openmdao_driver.ParOptDriver` — OpenMDAO Driver subclass
  (`paropt/paropt_driver.py` role); requires openmdao
- `openmdao_sparse_driver.ParOptSparseDriver` — OpenMDAO driver with the
  separable sparse-constraint path (`paropt/paropt_sparse_driver.py` role);
  requires openmdao
"""

from .callbacks import FunctionProblem  # noqa: F401
