"""Default floating dtype resolution.

The reference is double precision everywhere; this framework follows
(float64) wherever x64 is enabled, and falls back to float32 when it is not
— notably on TPU, where f32 is the native precision and f64 linear algebra
is unavailable (see docs/design.md)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["default_float", "resolve_dtype"]


def default_float():
    """jnp.float64 when x64 is enabled, else jnp.float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def resolve_dtype(dtype):
    """Pass through an explicit dtype; resolve None to the default, and
    downgrade float64 to float32 when x64 is disabled (it would silently
    truncate anyway — this keeps the choice explicit and warning-free)."""
    if dtype is None:
        return default_float()
    if jnp.dtype(dtype) == jnp.float64 and not jax.config.jax_enable_x64:
        return jnp.float32
    return dtype
