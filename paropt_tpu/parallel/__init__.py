"""Mesh/sharding helpers (the SPMD replacement for the MPI layer)."""
