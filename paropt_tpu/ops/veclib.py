"""Core vector math for distributed (sharded) design vectors.

Role-equivalent to the reference's distributed vector class
(`src/ParOptVec.{h,cpp}`): norms / dots / multi-dots over a 1-D block
distributed array.  Under `jit` with `NamedSharding`, every reduction here
lowers to one XLA all-reduce over the mesh — and `mdot` deliberately batches k
dot products into a *single* stacked reduction, preserving the reference's
latency optimization (`ParOptVec::mdot`, `ParOptVec.cpp:152-170`, batches k
dots into one MPI_Allreduce).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

__all__ = ["dot", "mdot", "norm2", "l1norm", "maxabs", "norm", "safe_div"]


def dot(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """<x, y> over all elements (one all-reduce when sharded)."""
    return jnp.vdot(x, y)


def mdot(ys: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Batched inner products ``[<ys[i], x>]_i`` with ONE fused reduction.

    ``ys`` is a stacked [k, n] array (e.g. the quasi-Newton subspace vectors);
    the contraction over the sharded n-axis produces a length-k replicated
    result with a single all-reduce (the `mdot` pattern, ParOptVec.cpp:152-170).
    """
    return ys @ x


def norm2(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.vdot(x, x))


def l1norm(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.abs(x))


def maxabs(x: jnp.ndarray) -> jnp.ndarray:
    if x.size == 0:
        return jnp.zeros((), dtype=x.dtype)
    return jnp.max(jnp.abs(x))


def norm(x: jnp.ndarray, norm_type: str) -> jnp.ndarray:
    """Norm selected by the ``norm_type`` option ('infinity' | 'l1' | 'l2')."""
    if norm_type == "infinity":
        return maxabs(x)
    if norm_type == "l1":
        return l1norm(x)
    if norm_type == "l2":
        return norm2(x)
    raise ValueError(f"unknown norm_type {norm_type!r}")


def multi_norm(parts: Sequence[jnp.ndarray], norm_type: str) -> jnp.ndarray:
    """Norm of the concatenation of differently-sharded parts without
    materializing the concatenation (each part reduces locally, scalars
    combine)."""
    parts = [p for p in parts if p.size > 0]
    if not parts:
        return jnp.zeros(())
    if norm_type == "infinity":
        vals = [maxabs(p) for p in parts]
        out = vals[0]
        for v in vals[1:]:
            out = jnp.maximum(out, v)
        return out
    if norm_type == "l1":
        return sum(l1norm(p) for p in parts)
    if norm_type == "l2":
        return jnp.sqrt(sum(jnp.vdot(p, p) for p in parts))
    raise ValueError(f"unknown norm_type {norm_type!r}")


def safe_div(num: jnp.ndarray, den: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """num/den with den guarded away from exact zero (barrier quotients)."""
    if eps:
        den = jnp.where(jnp.abs(den) < eps, jnp.where(den < 0, -eps, eps), den)
    return num / den
