"""Benchmark problem families (the reference examples as models).

- ``analytic``      — Rosenbrock, RandomConvexQP, Toy, Sellar-style small
                      problems (`examples/rosenbrock`, `examples/toy`, ...)
- ``cops``          — COPS benchmark subset: Electron (+CSR form), Polygon
                      (`examples/COPS/`)
- ``truss``         — truss sizing + multi-material DMO truss
                      (`examples/dmo_truss/`)
- ``topology``      — SyntheticTopology (the 1M+-variable bench problem)
- ``fem_topology``  — 2-D SIMP compliance FEM (stencil matvec, multigrid)
- ``fem_topology3d``— 3-D voxel SIMP + multi-material DMO (per-level
                      grid/AoS kernel layout), the reference's headline
                      workload (`README.md:12-31`)
- ``fem_frequency`` — 2-D/3-D frequency-constrained topology (compact
                      eigenvalue approximation, `examples/eigenvalue/`)
- ``cartpole``      — cart-pole swing-up, single shooting
                      (`examples/dymos/cart_pole/`)
- ``brachistochrone`` / ``ssto`` — dymos-role trajectory NLPs by
                      trapezoidal collocation (CSR defect equalities)
"""
