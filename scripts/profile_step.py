"""Localize per-iteration cost of the fused IP step on the current backend:
times step variants with phases disabled, plus isolated sub-kernels."""

import os
if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",):
    os.environ["PAROPT_TPU_NO_X64"] = "1"

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from paropt_tpu import ip_fused
from paropt_tpu.models.topology import SyntheticTopology
from paropt_tpu.ops import qn as qnmod
from paropt_tpu.ops import kkt


def timeit(label, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1e3
    print(f"{label:40s} {dt:8.2f} ms", flush=True)
    return out


def main():
    n = 1 << 20 if jax.default_backend() != "cpu" else 1 << 17
    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    prob = SyntheticTopology(n=n, block=8, dtype=dtype)
    model = ip_fused.model_from_problem(prob)
    data, x0 = ip_fused.data_template_from_problem(prob, dtype=dtype)
    qn0 = qnmod.qn_init(10, prob.nvars, dtype=dtype)
    print(f"backend={jax.default_backend()} n={n}", flush=True)

    variants = {
        "full step": ip_fused.FusedIPOptions(use_quasi_newton_update=True),
        "no refinement": ip_fused.FusedIPOptions(
            use_quasi_newton_update=True, iterative_refinement_steps=0),
        "no line search": ip_fused.FusedIPOptions(
            use_quasi_newton_update=True, use_line_search=False),
        "no qn update": ip_fused.FusedIPOptions(
            use_quasi_newton_update=False),
        "slm (no qn at all)": ip_fused.FusedIPOptions(
            sequential_linear_method=True, use_quasi_newton_update=False),
    }
    st0 = None
    for label, opts in variants.items():
        fused = ip_fused.FusedIP(model, prob.nvars, prob.ncon, prob.nwcon,
                                 prob.nwblock, opts, dtype=dtype)
        st = fused.init(x0, data, (), qn0, None)
        if st0 is None:
            st0 = st
        timeit(label, lambda s: fused._step_jit(s, data, (), None), st)

    # isolated sub-kernels at the same state
    v = st0.vars
    d = ip_fused._refresh_data(data, st0.g, st0.A, st0.c, st0.cw)
    cq = qnmod.qn_compact(st0.qn)
    mu = st0.mu

    @jax.jit
    def k_residual(v, d, mu):
        return kkt.kkt_residual(v, d, mu, 1.0)

    @jax.jit
    def k_factor(v, d, cq):
        return kkt.setup_kkt_factor(v, d, qn_compact=cq)

    @jax.jit
    def k_solve(v, d, f, r):
        return kkt.solve_kkt(v, d, f, r)

    @jax.jit
    def k_model_eval(x):
        return model.eval_obj_con((), x)

    @jax.jit
    def k_model_grad(x):
        return model.eval_grad((), x)

    @jax.jit
    def k_qn_update(qn, s, y):
        return qnmod.qn_update(qn, s, y)

    @jax.jit
    def k_maxstep(v, d, p):
        return kkt.max_step_lengths(v, d, p, jnp.asarray(0.95, v.x.dtype))

    r = timeit("kkt_residual", k_residual, v, d, mu)
    f = timeit("setup_kkt_factor", k_factor, v, d, cq)
    p = timeit("solve_kkt", k_solve, v, d, f, r)
    timeit("max_step_lengths", k_maxstep, v, d, p)
    timeit("model eval (f,c,cw)", k_model_eval, v.x)
    timeit("model grad", k_model_grad, v.x)
    timeit("qn_update", k_qn_update, st0.qn, 0.01 * p.x, 0.02 * p.x)


def submicro():
    """Micro-benchmarks of the [K, n] SMW chain pieces."""
    n = 1 << 20 if jax.default_backend() != "cpu" else 1 << 17
    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    prob = SyntheticTopology(n=n, block=8, dtype=dtype)
    model = ip_fused.model_from_problem(prob)
    data, x0 = ip_fused.data_template_from_problem(prob, dtype=dtype)
    qn0 = qnmod.qn_init(10, prob.nvars, dtype=dtype)
    opts = ip_fused.FusedIPOptions(use_quasi_newton_update=True)
    fused = ip_fused.FusedIP(model, prob.nvars, prob.ncon, prob.nwcon,
                             prob.nwblock, opts, dtype=dtype)
    st = fused.init(x0, data, (), qn0, None)
    v = st.vars
    d = ip_fused._refresh_data(data, st.g, st.A, st.c, st.cw)
    cq = qnmod.qn_compact(st.qn)
    Z = cq[1]
    K = Z.shape[0]
    print(f"--- submicro K={K} n={n}", flush=True)

    @jax.jit
    def k_elem(Z):
        return 1.3 * Z + 0.7

    @jax.jit
    def k_aw_mat(Z):
        return kkt.ProblemData.Aw_matvec(d, Z)

    @jax.jit
    def k_aw_rmat(W):
        return kkt.ProblemData.Aw_rmatvec(d, W)

    @jax.jit
    def k_zx(Z, x):
        return Z @ x

    @jax.jit
    def k_qdsolve(f, Z):
        zw = jnp.zeros((K, d.nwcon), Z.dtype)
        return kkt.quasi_def_solve(f, d, Z, zw)

    @jax.jit
    def k_compact(qn):
        return qnmod.qn_compact(qn)

    @jax.jit
    def k_factor_noqn(v, d):
        return kkt.setup_kkt_factor(v, d, qn_compact=(cq[0], None, None))

    f0 = k_factor_noqn(v, d)
    W = k_aw_mat(Z)
    timeit("elementwise [K,n]", k_elem, Z)
    timeit("Aw_matvec [K,n]", k_aw_mat, Z)
    timeit("Aw_rmatvec [K,nw]", k_aw_rmat, W)
    timeit("Z @ x (one reduction)", k_zx, Z, v.x)
    timeit("quasi_def_solve [K,n]", k_qdsolve, f0, Z)
    timeit("qn_compact", k_compact, st.qn)
    timeit("factor (no QN)", k_factor_noqn, v, d)


if __name__ == "__main__":
    main()
    submicro()
