"""Pallas fused quasi-definite apply: interpret-mode correctness vs the jnp
path (compiled execution is exercised by bench.py on real TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from paropt_tpu.ops import kkt
from paropt_tpu.ops.pallas_kernels import (pallas_available,
                                           quasi_def_apply_blocked_t)

pytestmark = pytest.mark.skipif(not pallas_available(),
                                reason="pallas unavailable")


def _setup(K=5, k=4, nwcon=256, seed=0):
    rng = np.random.default_rng(seed)
    dinv = jnp.asarray(rng.uniform(0.5, 2.0, (k, nwcon)))
    vals = jnp.asarray(rng.standard_normal((k, nwcon)))
    c0 = jnp.asarray(rng.uniform(0.5, 1.5, nwcon))
    cw = c0 + jnp.sum(vals ** 2 * dinv, axis=0)
    bx = jnp.asarray(rng.standard_normal((K, k, nwcon)))
    bw = jnp.asarray(rng.standard_normal((K, nwcon)))
    return dinv, vals, cw, bx, bw


def test_pallas_quasi_def_matches_jnp():
    dinv, vals, cw, bx, bw = _setup()
    K, k, nwcon = bx.shape
    yx, yw = quasi_def_apply_blocked_t(dinv, 1.0 / cw, vals, bx, bw,
                                       interpret=True)
    # jnp reference of the same chain
    t = dinv[None] * bx
    aw = jnp.sum(vals[None] * t, axis=1)
    yw_ref = (bw - aw) / cw
    yx_ref = dinv[None] * (bx + vals[None] * yw_ref[:, None, :])
    assert np.allclose(np.asarray(yw), np.asarray(yw_ref), atol=1e-12)
    assert np.allclose(np.asarray(yx), np.asarray(yx_ref), atol=1e-12)


def test_pallas_matches_kkt_quasi_def_solve():
    """Against the full jnp quasi_def_solve on a blocked_t ProblemData."""
    rng = np.random.default_rng(3)
    k, nwcon = 4, 128
    n = k * nwcon
    K = 7
    cols = (np.arange(nwcon, dtype=np.int32)[:, None]
            + np.arange(k, dtype=np.int32)[None, :] * nwcon)
    vals = jnp.asarray(rng.standard_normal((nwcon, k)))
    dt = jnp.float64
    d = kkt.ProblemData(
        g=jnp.zeros(n, dt), A=jnp.zeros((0, n), dt), c=jnp.zeros(0, dt),
        cw=jnp.zeros(nwcon, dt), lb=jnp.full(n, -1.0), ub=jnp.full(n, 1.0),
        lb_mask=jnp.ones(n), ub_mask=jnp.ones(n),
        gamma_s=jnp.zeros(0), gamma_t=jnp.zeros(0),
        gamma_sw=jnp.zeros(nwcon), gamma_tw=jnp.full(nwcon, 1e3),
        Aw_cols=jnp.asarray(cols), Aw_vals=vals, nwblock=1,
        Aw_layout="blocked_t")
    Dinv = jnp.asarray(rng.uniform(0.5, 2.0, n))
    C0 = jnp.asarray(rng.uniform(0.5, 1.5, nwcon))
    Cw = C0.reshape(-1, 1, 1) + d.Aw_inner_blocks(Dinv)
    f = kkt.KKTFactor(Dinv=Dinv, Gamma=None, C0=C0,
                      Cw_chol=jnp.sqrt(Cw), Xa=None, Wa=None, G_lu=None,
                      Zqn=None, Phi_x=None, Phi_z=None, Phi_w=None,
                      Ce_inv=None)
    bx = jnp.asarray(rng.standard_normal((K, n)))
    bw = jnp.asarray(rng.standard_normal((K, nwcon)))
    # jnp reference path
    yx_ref, yw_ref = kkt.quasi_def_solve(f, d, bx, bw)
    # pallas (interpret) path
    yx3, yw = quasi_def_apply_blocked_t(
        Dinv.reshape(k, nwcon), 1.0 / (jnp.sqrt(Cw)[:, 0, 0] ** 2),
        vals.T, bx.reshape(K, k, nwcon), bw, interpret=True)
    assert np.allclose(np.asarray(yx3.reshape(K, n)), np.asarray(yx_ref),
                       atol=1e-11)
    assert np.allclose(np.asarray(yw), np.asarray(yw_ref), atol=1e-11)
    # sanity: the solve actually satisfies the quasi-definite system
    yx = yx_ref[0]
    yw0 = yw_ref[0]
    lhs_x = yx / Dinv - d.Aw_rmatvec(yw0)
    lhs_w = d.Aw_matvec(yx) + C0 * yw0
    assert np.allclose(np.asarray(lhs_x), np.asarray(bx[0]), atol=1e-10)
    assert np.allclose(np.asarray(lhs_w), np.asarray(bw[0]), atol=1e-10)
