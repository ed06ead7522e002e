"""Pallas TPU kernels for the hot KKT chains (a TPU-native tier with no
direct reference counterpart — the closest role is the per-rank fused
block apply inside `ParOptQuasiDefBlockMat::apply`,
`ParOptSparseMat.cpp:114-224`).

With the transposed-partition sparse layout ('blocked_t': design vectors
viewed as [k, nwcon] with the LARGE axis minor), the quasi-definite apply

    t  = D⁻¹ ⊙ bx
    aw = Σ_j vals_t[j] ⊙ t[j]                (Aw @ t)
    yw = Cw⁻¹ ⊙ (bw − aw)
    yx = D⁻¹ ⊙ (bx + vals_t ⊙ yw)            (bx + Awᵀ yw, rescaled)

is a single pass over nwcon-tiles.  XLA executes this as several separately
materialized [K, n] arrays; the Pallas kernel fuses the whole chain into one
read-compute-write sweep (multi-RHS batch K folded into the block).

Only the (nwblock == 1, blocked_t) case is implemented — the configuration
the large-scale topology workload uses.  Everything else falls back to the
jnp path in ops/kkt.py.  Correctness is tested against the jnp path in
tests/test_pallas.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["quasi_def_apply_blocked_t", "phi_gram_blocked_t",
           "qn_roll_update", "pallas_available", "pallas_qn_enabled"]


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        return True
    except Exception:  # pragma: no cover
        return False


def pallas_qn_enabled() -> bool:
    """Use the fused Pallas quasi-Newton roll/dot kernel: DEFAULT-ON on a
    single accelerator chip, PAROPT_TPU_PALLAS=0 forces the jnp path.
    (Unlike the quasi-def kernel, which is opt-in via
    PAROPT_TPU_PALLAS_QD=1: the 4-way A/B in scripts/ab_matrix.py shows
    the roll kernel wins in every combination while the quasi-def kernel
    lost its edge once the zero-copy compact landed.)
    Single chip only — sharded S/Y would need a shard_map wrapper."""
    import os
    flag = os.environ.get("PAROPT_TPU_PALLAS")
    if flag is not None and flag not in ("1", "true", "on"):
        return False
    try:
        return (jax.default_backend() != "cpu"
                and len(jax.devices()) == 1)
    except Exception:  # pragma: no cover
        return False


@partial(jax.jit, static_argnames=("interpret",))
def qn_roll_update(buf: jnp.ndarray, s: jnp.ndarray, y: jnp.ndarray,
                   upd: jnp.ndarray, interpret: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused quasi-Newton ring-buffer roll + select + Gram dots.

    The role of the update step inside `ParOptLBFGS::update`
    (`ParOptQuasiNewton.cpp:130-280`) — shift the (s, y) history and form
    the new Gram row/column inner products — in one memory sweep over the
    stacked [2m, n] S/Y ring buffer (rows [:m] = S, rows [m:] = Y):

      rolled = [buf[1:m]; s; buf[m+1:]; y]
      out    = upd ? rolled : buf
      dots   = rolled @ [s, y]ᵀ            ([2m, 2], accumulated over tiles)

    The dots are taken on the ROLLED buffer (the caller discards them when
    upd is false); rows m-1 / 2m-1 carry (s·s, s·y) / (y·s, y·y) — every
    scalar the Gram/b0 update needs, so nothing downstream re-reads [2m, n].

    XLA executes the equivalent jnp chain (concat-roll, two-way select
    against the pre-roll buffer, separate [2m, n] @ [n, 2] matmul) as
    ~5 full passes over the buffer; this kernel is the 2-pass minimum.

    Narrow (e.g. bfloat16) storage: ``s``/``y`` are quantized to
    ``buf.dtype`` for the roll write, while the dots accumulate in f32
    FROM THE QUANTIZED values — the Gram matrices stay exactly consistent
    with the stored history (same contract as the jnp path in
    `qn.qn_update`).

    Returns (buf_out [2m, n], dots [2m, 2] in the accumulation dtype)."""
    from jax.experimental import pallas as pl

    K, n = buf.shape
    m = K // 2
    tile = 2048
    while n % tile != 0:
        tile //= 2
    grid = (n // tile,)
    upd2 = jnp.asarray(upd).astype(jnp.int32).reshape(1, 1)
    acc_dtype = (jnp.float32 if jnp.finfo(buf.dtype).bits < 32
                 else buf.dtype)

    def kernel(upd_ref, s_ref, y_ref, buf_ref, out_ref, dots_ref):
        do = upd_ref[0, 0] > 0
        sv = s_ref[...]                # [1, T] (buf dtype)
        yv = y_ref[...]                # [1, T]
        B = buf_ref[...]               # [2m, T]
        rolled = jnp.concatenate([B[1:m], sv, B[m + 1:], yv], axis=0)
        out_ref[...] = jnp.where(do, rolled, B)
        acc = rolled.astype(acc_dtype)
        contrib = jnp.stack([
            jnp.sum(acc * sv.astype(acc_dtype), axis=1),
            jnp.sum(acc * yv.astype(acc_dtype), axis=1),
        ], axis=1)                     # [2m, 2]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            dots_ref[...] = jnp.zeros_like(dots_ref)

        dots_ref[...] += contrib

    out_shape = (
        jax.ShapeDtypeStruct((K, n), buf.dtype),
        jax.ShapeDtypeStruct((K, 2), acc_dtype),
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, tile), lambda i: (0, i)),
            pl.BlockSpec((1, tile), lambda i: (0, i)),
            pl.BlockSpec((K, tile), lambda i: (0, i)),
        ],
        out_specs=(
            pl.BlockSpec((K, tile), lambda i: (0, i)),
            pl.BlockSpec((K, 2), lambda i: (0, 0)),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(upd2, s.astype(buf.dtype).reshape(1, n),
      y.astype(buf.dtype).reshape(1, n), buf)


def _qd_kernel(dinv_ref, cwinv_ref, vals_ref, bx_ref, bw_ref,
               yx_ref, yw_ref):
    """One nwcon-tile of the fused quasi-definite apply.

    Shapes in the block:
      dinv, vals : [k, Tw]
      cwinv, bw  : [K, Tw]  (cwinv broadcast row-wise: [1, Tw])
      bx         : [K, k, Tw]
      yx         : [K, k, Tw],  yw: [K, Tw]
    """
    dinv = dinv_ref[...]          # [k, Tw]
    vals = vals_ref[...]          # [k, Tw]
    cwinv = cwinv_ref[...]        # [1, Tw]
    bx = bx_ref[...]              # [K, k, Tw]
    bw = bw_ref[...]              # [K, Tw]
    t = dinv[None, :, :] * bx
    aw = jnp.sum(vals[None, :, :] * t, axis=1)      # [K, Tw]
    yw = cwinv * (bw - aw)
    yx = dinv[None, :, :] * (bx + vals[None, :, :] * yw[:, None, :])
    yx_ref[...] = yx
    yw_ref[...] = yw


def _phi_gram_kernel(dinv_ref, cwinv_ref, vals_ref, bx_ref, bw_ref,
                     yx_ref, yw_ref, gram_ref):
    """Quasi-definite apply + Gram accumulation in one tile pass.

    gram[a, b] += Σ_tile bx[a] · yx[b]  (contracted over the k and tile
    axes) — accumulated across the sequential TPU grid; provides every
    small matrix the SMW/Schur setup needs (A@Xa', yZ@A', Z@yZ', Z@Xa')
    without re-reading the [B, n] arrays."""
    from jax.experimental import pallas as pl

    dinv = dinv_ref[...]          # [k, Tw]
    vals = vals_ref[...]          # [k, Tw]
    cwinv = cwinv_ref[...]        # [1, Tw]
    bx = bx_ref[...]              # [B, k, Tw]
    bw = bw_ref[...]              # [B, Tw]
    t = dinv[None, :, :] * bx
    aw = jnp.sum(vals[None, :, :] * t, axis=1)      # [B, Tw]
    yw = cwinv * (bw - aw)
    yx = dinv[None, :, :] * (bx + vals[None, :, :] * yw[:, None, :])
    yx_ref[...] = yx
    yw_ref[...] = yw

    B = bx.shape[0]
    contrib = jax.lax.dot_general(
        bx.reshape(B, -1), yx.reshape(B, -1),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=gram_ref.dtype)       # [B, B]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gram_ref[...] = jnp.zeros_like(gram_ref)

    gram_ref[...] += contrib


@partial(jax.jit, static_argnames=("interpret",))
def phi_gram_blocked_t(dinv_2d: jnp.ndarray, cwinv: jnp.ndarray,
                       vals_t: jnp.ndarray, bx3: jnp.ndarray,
                       bw: jnp.ndarray, interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused quasi-definite solve of a [B, n] RHS stack PLUS the [B, B]
    Gram matrix  gram[a, b] = bx_a · yx_b  in the same memory sweep.

    Used by the KKT factor setup: with the stack [Z_qn; A] this yields the
    quasi-def solves AND every inner product the Schur (Gmat), SMW
    right-hand sides, and Ce assembly need — one read of the stack, one
    write of the solves, no separate [B, n] matmuls afterwards.

    Returns (yx3 [B, k, nwcon], yw [B, nwcon], gram [B, B])."""
    from jax.experimental import pallas as pl

    B, k, nwcon = bx3.shape
    tile = 512
    while nwcon % tile != 0:
        tile //= 2
    grid = (nwcon // tile,)

    out_shape = (
        jax.ShapeDtypeStruct((B, k, nwcon), bx3.dtype),
        jax.ShapeDtypeStruct((B, nwcon), bw.dtype),
        jax.ShapeDtypeStruct((B, B), bx3.dtype),
    )
    yx3, yw, gram = pl.pallas_call(
        _phi_gram_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, tile), lambda i: (0, i)),
            pl.BlockSpec((1, tile), lambda i: (0, i)),
            pl.BlockSpec((k, tile), lambda i: (0, i)),
            pl.BlockSpec((B, k, tile), lambda i: (0, 0, i)),
            pl.BlockSpec((B, tile), lambda i: (0, i)),
        ],
        out_specs=(
            pl.BlockSpec((B, k, tile), lambda i: (0, 0, i)),
            pl.BlockSpec((B, tile), lambda i: (0, i)),
            pl.BlockSpec((B, B), lambda i: (0, 0)),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(dinv_2d, cwinv.reshape(1, nwcon), vals_t, bx3, bw)
    return yx3, yw, gram


@partial(jax.jit, static_argnames=("interpret",))
def quasi_def_apply_blocked_t(dinv_2d: jnp.ndarray, cwinv: jnp.ndarray,
                              vals_t: jnp.ndarray, bx3: jnp.ndarray,
                              bw: jnp.ndarray,
                              interpret: bool = False
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused solve of [[D, -Aw'], [Aw, C0]] [yx; yw] = [bx; bw] for the
    (nwblock=1, blocked_t) configuration.

    Parameters (all in the [k, nwcon] view):
      dinv_2d : [k, nwcon]   diagonal D^{-1}
      cwinv   : [nwcon]      (C0 + Aw D^{-1} Aw')^{-1} diagonal
      vals_t  : [k, nwcon]   Jacobian values
      bx3     : [K, k, nwcon] stacked right-hand sides
      bw      : [K, nwcon]
    Returns (yx3 [K, k, nwcon], yw [K, nwcon]).
    """
    from jax.experimental import pallas as pl

    K, k, nwcon = bx3.shape
    tile = 512
    while nwcon % tile != 0:
        tile //= 2
    grid = (nwcon // tile,)

    out_shape = (
        jax.ShapeDtypeStruct((K, k, nwcon), bx3.dtype),
        jax.ShapeDtypeStruct((K, nwcon), bw.dtype),
    )
    yx3, yw = pl.pallas_call(
        _qd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, tile), lambda i: (0, i)),
            pl.BlockSpec((1, tile), lambda i: (0, i)),
            pl.BlockSpec((k, tile), lambda i: (0, i)),
            pl.BlockSpec((K, k, tile), lambda i: (0, 0, i)),
            pl.BlockSpec((K, tile), lambda i: (0, i)),
        ],
        out_specs=(
            pl.BlockSpec((K, k, tile), lambda i: (0, 0, i)),
            pl.BlockSpec((K, tile), lambda i: (0, i)),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(dinv_2d, cwinv.reshape(1, nwcon), vals_t, bx3, bw)
    return yx3, yw
