"""Verify the structured KKT solve against a dense assembled Newton system.

This is the analogue of the reference's `checkKKTStep` diagnostic
(`ParOptInteriorPoint.cpp:6212+`): the step returned by the fast
(quasi-definite + Schur + SMW) solver must satisfy the full Newton system
K p = -r equation-by-equation to machine precision.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paropt_tpu.ops import kkt
from paropt_tpu.ops.qn import qn_init, qn_update, qn_compact, qn_mult


def _rand_vars_data(rng, n, ncon, nwcon, nwblock=1, k=2):
    dt = jnp.float64

    def pos(size):
        return jnp.asarray(rng.uniform(0.3, 2.0, size), dtype=dt)

    lb = jnp.asarray(rng.uniform(-2.0, -1.0, n), dt)
    ub = jnp.asarray(rng.uniform(1.0, 2.0, n), dt)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, n), dt)
    v = kkt.IPVars(
        x=x, zl=pos(n), zu=pos(n),
        s=pos(ncon), t=pos(ncon),
        z=jnp.asarray(rng.uniform(-1, 1, ncon), dt), zs=pos(ncon),
        zt=pos(ncon), sw=pos(nwcon), tw=pos(nwcon),
        zw=jnp.asarray(rng.uniform(-1, 1, nwcon), dt),
        zsw=pos(nwcon), ztw=pos(nwcon))

    if nwcon > 0:
        # block-disjoint sparse Jacobian: block b uses columns
        # {b*nwblock*k ... } so Aw D Aw' is block diagonal
        cols = np.zeros((nwcon, k), dtype=np.int32)
        nblocks = nwcon // nwblock
        for b in range(nblocks):
            support = (np.arange(nwblock * k) + b * nwblock * k) % n
            for r in range(nwblock):
                cols[b * nwblock + r] = support[r * k:(r + 1) * k]
        vals = jnp.asarray(rng.uniform(0.5, 1.5, (nwcon, k)), dt)
        Aw_cols, Aw_vals = jnp.asarray(cols), vals
    else:
        Aw_cols = Aw_vals = None

    d = kkt.ProblemData(
        g=jnp.asarray(rng.standard_normal(n), dt),
        A=jnp.asarray(rng.standard_normal((ncon, n)), dt),
        c=jnp.asarray(rng.standard_normal(ncon), dt),
        cw=jnp.asarray(rng.standard_normal(nwcon), dt),
        lb=lb, ub=ub,
        lb_mask=jnp.ones(n, dt), ub_mask=jnp.ones(n, dt),
        gamma_s=jnp.zeros(ncon, dt), gamma_t=jnp.full(ncon, 1000.0, dt),
        gamma_sw=jnp.zeros(nwcon, dt), gamma_tw=jnp.full(nwcon, 1000.0, dt),
        Aw_cols=Aw_cols, Aw_vals=Aw_vals, nwblock=nwblock)
    return v, d


def _tree_maxabs(t):
    leaves = [jnp.max(jnp.abs(l)) for l in jax.tree_util.tree_leaves(t)
              if l.size]
    return float(jnp.max(jnp.stack(leaves)))


@pytest.mark.parametrize("n,ncon,nwcon,nwblock,use_qn", [
    (16, 0, 0, 1, False),
    (16, 3, 0, 1, False),
    (16, 3, 0, 1, True),
    (24, 2, 8, 1, True),
    (24, 0, 8, 1, True),
    (24, 2, 8, 2, True),
    (32, 4, 12, 3, True),
])
def test_kkt_step_satisfies_newton_system(n, ncon, nwcon, nwblock, use_qn):
    rng = np.random.default_rng(42 + n + ncon + nwcon)
    v, d = _rand_vars_data(rng, n, ncon, nwcon, nwblock)
    mu = 0.1

    if use_qn:
        qn = qn_init(4, n)
        for _ in range(3):
            s = jnp.asarray(rng.standard_normal(n) * 0.1)
            y = s * jnp.asarray(rng.uniform(0.5, 2.0, n))  # pos curvature
            qn, _, _ = qn_update(qn, s, y)
        compact = qn_compact(qn)
    else:
        compact = None

    r = kkt.kkt_residual(v, d, mu)
    f = kkt.setup_kkt_factor(v, d, qn_compact=compact)
    p = kkt.solve_kkt(v, d, f, r)

    Kp = kkt.apply_kkt_matrix(v, d, p, qn_compact=compact)
    err = jax.tree_util.tree_map(lambda a, b: a + b, Kp, r)
    scale = max(_tree_maxabs(r), 1.0)
    assert _tree_maxabs(err) / scale < 1e-9, (
        f"KKT step does not satisfy Newton system: {_tree_maxabs(err)}")


def test_iterative_refinement_improves():
    rng = np.random.default_rng(3)
    n, ncon, nwcon = 20, 2, 6
    v, d = _rand_vars_data(rng, n, ncon, nwcon)
    qn = qn_init(4, n)
    for _ in range(2):
        s = jnp.asarray(rng.standard_normal(n) * 0.1)
        qn, _, _ = qn_update(qn, s, s * 1.5)
    compact = qn_compact(qn)
    r = kkt.kkt_residual(v, d, 0.01)
    f = kkt.setup_kkt_factor(v, d, qn_compact=compact)
    p1 = kkt.solve_kkt(v, d, f, r, refine_steps=2, qn_compact=compact)
    Kp = kkt.apply_kkt_matrix(v, d, p1, qn_compact=compact)
    err = jax.tree_util.tree_map(lambda a, b: a + b, Kp, r)
    assert _tree_maxabs(err) < 1e-10 * max(_tree_maxabs(r), 1.0)


def test_qn_compact_matches_dense_bfgs():
    """Compact L-BFGS B agrees with a dense BFGS recursion built from the
    same (s, y) pairs."""
    rng = np.random.default_rng(0)
    n, m = 10, 5
    qn = qn_init(m, n)
    B = None
    b0 = 1.0
    pairs = []
    for i in range(4):
        s = jnp.asarray(rng.standard_normal(n))
        y = s * 2.0 + 0.1 * jnp.asarray(rng.standard_normal(n))
        if float(jnp.vdot(s, y)) <= 0:
            continue
        qn, skip, _ = qn_update(qn, s, y)
        assert int(skip) == 0
        pairs.append((np.asarray(s), np.asarray(y)))
        b0 = float(jnp.vdot(y, y) / jnp.vdot(y, s))
    # dense BFGS from scratch with the same b0 and pairs
    B = b0 * np.eye(n)
    for s, y in pairs:
        Bs = B @ s
        B = B - np.outer(Bs, Bs) / (s @ Bs) + np.outer(y, y) / (y @ s)
    xp = jnp.asarray(rng.standard_normal(n))
    got = np.asarray(qn_mult(qn, xp))
    want = B @ np.asarray(xp)
    assert np.allclose(got, want, rtol=1e-10, atol=1e-10)


def test_qn_skip_negative_curvature():
    rng = np.random.default_rng(1)
    n = 8
    qn = qn_init(3, n)
    s = jnp.asarray(rng.standard_normal(n))
    qn2, skip, _ = qn_update(qn, s, -s)  # negative curvature
    assert int(skip) == 1
    assert int(qn2.count) == 0


def test_qn_damped_update_stays_spd():
    rng = np.random.default_rng(2)
    n = 8
    qn = qn_init(3, n, update_type="damped_update")
    for i in range(6):
        s = jnp.asarray(rng.standard_normal(n))
        y = jnp.asarray(rng.standard_normal(n))  # arbitrary curvature
        qn, skip, damped = qn_update(qn, s, y)
    # B must remain positive definite under damping
    for _ in range(5):
        p = jnp.asarray(rng.standard_normal(n))
        assert float(jnp.vdot(p, qn_mult(qn, p))) > 0.0


def test_sr1_matches_dense():
    rng = np.random.default_rng(4)
    n, m = 9, 4
    qn = qn_init(m, n, qn_type="sr1")
    b0 = 1.0
    Bd = None
    pairs = []
    for i in range(3):
        s = jnp.asarray(rng.standard_normal(n))
        y = s * 1.7 + 0.2 * jnp.asarray(rng.standard_normal(n))
        qn, skip, _ = qn_update(qn, s, y)
        if int(skip) == 0:
            pairs.append((np.asarray(s), np.asarray(y)))
            b0 = float(jnp.vdot(y, y) / jnp.vdot(y, s))
    Bd = b0 * np.eye(n)
    for s, y in pairs:
        w = y - Bd @ s
        Bd = Bd + np.outer(w, w) / (w @ s)
    xp = jnp.asarray(rng.standard_normal(n))
    assert np.allclose(np.asarray(qn_mult(qn, xp)), Bd @ np.asarray(xp),
                       rtol=1e-9, atol=1e-9)


def test_max_step_fraction_to_boundary():
    rng = np.random.default_rng(5)
    v, d = _rand_vars_data(rng, 12, 2, 4)
    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape)), v)
    tau = 0.95
    ax, az = kkt.max_step_lengths(v, d, p, tau)
    ax, az = float(ax), float(az)
    assert 0 < ax <= 1 and 0 < az <= 1
    vn = v.axpy(ax, az, p)
    # all positivity constraints preserved with slack factor (1 - tau)
    assert float(jnp.min(vn.x - d.lb)) >= 0
    assert float(jnp.min(d.ub - vn.x)) >= 0
    for arr in (vn.s, vn.t, vn.sw, vn.tw, vn.zl, vn.zu, vn.zs, vn.zt,
                vn.zsw, vn.ztw):
        if arr.size:
            assert float(jnp.min(arr)) >= 0
