"""Newton-Krylov (GMRES + Hessian-vector product) inexact phase tests."""

import numpy as np
import jax.numpy as jnp

from paropt_tpu import InteriorPoint
from paropt_tpu.models.analytic import RandomConvexQP, Rosenbrock


def test_gmres_phase_converges_qp():
    prob = RandomConvexQP(n=20, ncon=2, seed=41)
    ip = InteriorPoint(prob, {
        "output_file": None, "abs_res_tol": 1e-9,
        "use_hvec_product": True, "gmres_subspace_size": 25,
        "nk_switch_tol": 1.0, "max_major_iters": 200,
    })
    res = ip.optimize()
    assert res["converged"], res
    assert ip.nhvec > 0, "GMRES phase never engaged"
    # same answer as the quasi-Newton-only path
    prob2 = RandomConvexQP(n=20, ncon=2, seed=41)
    ip2 = InteriorPoint(prob2, {"output_file": None, "abs_res_tol": 1e-9,
                                "max_major_iters": 200})
    res2 = ip2.optimize()
    assert np.allclose(np.asarray(res["x"]), np.asarray(res2["x"]),
                       atol=1e-6)


def test_gmres_phase_rosenbrock():
    prob = Rosenbrock()
    ip = InteriorPoint(prob, {
        "output_file": None, "abs_res_tol": 1e-8,
        "use_hvec_product": True, "gmres_subspace_size": 20,
        "nk_switch_tol": 10.0,
    })
    res = ip.optimize()
    assert res["converged"], res
    assert np.allclose(np.asarray(res["x"]), [1.0, 1.0], atol=1e-4)
    assert ip.nhvec > 0


def test_fused_newton_krylov_phase():
    """The fused (jitted, unrolled) GMRES phase: same solution as the host
    GMRES and the QN-only fused solve, with NK iterations engaged."""
    from paropt_tpu import ip_fused
    from paropt_tpu.ops import qn as qnmod

    prob = RandomConvexQP(n=20, ncon=2, seed=41)
    model = ip_fused.model_from_problem(prob)
    data, x0 = ip_fused.data_template_from_problem(prob)
    qn0 = qnmod.qn_init(10, prob.nvars)

    opts_nk = ip_fused.FusedIPOptions(
        abs_res_tol=1e-9, max_major_iters=200,
        use_quasi_newton_update=True,
        use_hvec_product=True, gmres_subspace_size=12, nk_switch_tol=1.0)
    fused = ip_fused.FusedIP(model, prob.nvars, prob.ncon, prob.nwcon,
                             prob.nwblock, opts_nk)
    st = fused.solve(x0, data, (), qn0, None, jit_loop=True)
    assert bool(st.converged), (float(st.res_norm), int(st.k))

    opts_qn = opts_nk._replace(use_hvec_product=False)
    fused_qn = ip_fused.FusedIP(model, prob.nvars, prob.ncon, prob.nwcon,
                                prob.nwblock, opts_qn)
    st_qn = fused_qn.solve(x0, data, (), qn0, None, jit_loop=True)
    assert np.allclose(np.asarray(st.vars.x), np.asarray(st_qn.vars.x),
                       atol=1e-6)

    # the python-loop mode exposes per-iteration NK counts
    state = fused.init(x0, data, (), qn0, None)
    engaged = False
    for _ in range(200):
        state = fused.step(state, data, (), None)
        if int(state.gmres_iters) > 0:
            engaged = True
        if bool(state.converged):
            break
    assert bool(state.converged)
    assert engaged, "fused NK phase never engaged"


def test_fused_nk_matches_host_gmres():
    """Fused NK and host GMRES agree on Rosenbrock."""
    from paropt_tpu import ip_fused
    from paropt_tpu.ops import qn as qnmod

    prob = Rosenbrock()
    model = ip_fused.model_from_problem(prob)
    data, x0 = ip_fused.data_template_from_problem(prob)
    qn0 = qnmod.qn_init(10, prob.nvars)
    opts = ip_fused.FusedIPOptions(
        abs_res_tol=1e-8, max_major_iters=200,
        use_quasi_newton_update=True,
        use_hvec_product=True, gmres_subspace_size=10, nk_switch_tol=10.0)
    fused = ip_fused.FusedIP(model, prob.nvars, prob.ncon, prob.nwcon,
                             prob.nwblock, opts)
    st = fused.solve(x0, data, (), qn0, None, jit_loop=True)
    assert bool(st.converged)
    assert np.allclose(np.asarray(st.vars.x), [1.0, 1.0], atol=1e-4)


def test_nk_phase_rescues_qn_plateau():
    """Limited-memory quasi-Newton steps plateau above the requested
    tolerance on the synthetic-topology problem; the Newton-Krylov phase
    (true Hessian-vector products + preconditioned GMRES, the reference's
    terminal-convergence device, `ParOptInteriorPoint.cpp:4853-4899`)
    polishes to tolerance.  The Eisenstat-Walker gamma must be below
    max_gmres_rtol for NK to engage on a plateau (ratio ~ 1 keeps the
    forcing term at gamma) — this is the documented tuning recipe."""
    from paropt_tpu.models.topology import SyntheticTopology

    n = 1024
    qn_only = InteriorPoint(
        SyntheticTopology(n=n, block=8, dtype=jnp.float64),
        {"output_file": None, "abs_res_tol": 1e-6, "max_major_iters": 40})
    res = qn_only.optimize()
    assert not res["converged"]          # the plateau (res ~ 1e-4)
    assert res["res_norm"] > 1e-5

    nk = InteriorPoint(
        SyntheticTopology(n=n, block=8, dtype=jnp.float64),
        {"output_file": None, "abs_res_tol": 1e-6, "max_major_iters": 60,
         "use_hvec_product": True, "gmres_subspace_size": 25,
         "eisenstat_walker_gamma": 0.05, "nk_switch_tol": 1e-3})
    res2 = nk.optimize()
    assert res2["converged"], res2
    assert res2["res_norm"] < 1e-6


def test_output_level_trace_families(tmp_path):
    """Deep-verbosity trace parity (`output_level` escalation): an
    output_level=2 run emits the reference's three trace families —
    per-trial line-search rows (`ParOptInteriorPoint.cpp:3986-3994`),
    per-iteration GMRES rows with fproj/cproj (`:5904-5910, :6050-6056`),
    and `MatInfo:` factor rows for the CSR path (`:4768-4775`) — and
    `unpack_output` still parses the log."""
    import re
    from paropt_tpu.utils.logging import unpack_output
    from paropt_tpu.models.cops import ElectronCSR

    out = str(tmp_path / "paropt.out")
    prob = RandomConvexQP(n=20, ncon=2, seed=41)
    ip = InteriorPoint(prob, {
        "output_file": out, "output_level": 2, "abs_res_tol": 1e-9,
        "use_hvec_product": True, "gmres_subspace_size": 25,
        "nk_switch_tol": 1.0, "max_major_iters": 200,
    })
    res = ip.optimize()
    assert res["converged"], res
    text = open(out).read()
    # line-search family: header + numbered trial rows
    assert re.search(r"iter\s+alpha\s+merit\s+dmerit\s+\|\|px\|\|"
                     r"\s+min\(alpha\)", text), "LS header missing"
    # GMRES family: header with rtol + iteration rows with fproj/cproj
    assert re.search(r"gmres\s+nhvc\s+iter\s+res\s+rel\s+fproj\s+cproj"
                     r"\s+gmres rtol:", text), "GMRES header missing"
    gmres_rows = re.findall(
        r"^\s+\d+\s+\d+\s+[\d.e+-]+\s+[\d.e+-]+\s+[\d.e+-]+\s+[\d.e+-]+\s*$",
        text, re.M)
    assert gmres_rows, "no GMRES iteration rows with fproj/cproj"
    # the fixed-width iteration contract still parses
    data = unpack_output(out)
    assert len(data["fobj"]) > 0

    # MatInfo family requires the general-CSR sparse path
    out2 = str(tmp_path / "paropt_csr.out")
    sp = ElectronCSR(n=6)
    ip2 = InteriorPoint(sp, {"output_file": out2, "output_level": 1,
                             "abs_res_tol": 1e-6,
                             "max_major_iters": 300})
    ip2.optimize()
    text2 = open(out2).read()
    assert "MatInfo:" in text2, "MatInfo rows missing"
    assert len(unpack_output(out2)["fobj"]) > 0


def test_nk_projection_formulas():
    """_nk_projections == FD of the barrier objective along p, and the
    constraint projection equals the analytic residual-weighted derivative
    (the quantities gating the NK descent test)."""
    import jax
    import jax.numpy as jnp
    from paropt_tpu.ip import InteriorPoint as IP, _nk_projections, \
        _barrier_terms
    from paropt_tpu.ops import kkt

    prob = RandomConvexQP(n=12, ncon=2, seed=7)
    ip = IP(prob, {"output_file": None, "abs_res_tol": 1e-8})
    ip.fobj, ip.c, ip.cw = ip._eval_obj_con(ip.vars.x)
    ip.g, ip.A = ip._eval_gradients(ip.vars.x)
    d = ip._make_data()
    v = ip.vars
    mu = jnp.asarray(0.01, ip.dtype)
    rng = np.random.default_rng(2)

    def rand_like(a, scale=1e-3):
        return jnp.asarray(rng.standard_normal(a.shape) * scale, a.dtype)

    import dataclasses
    p = jax.tree_util.tree_map(rand_like, v)
    b = jax.tree_util.tree_map(rand_like, v)
    fp, cp = _nk_projections.__wrapped__(v, d, b, p, mu, 1.0)

    # fproj: finite difference of the barrier-augmented objective
    def barrier_obj(t):
        x = v.x + t * p.x
        s, tt = v.s + t * p.s, v.t + t * p.t
        sw, tw = v.sw + t * p.sw, v.tw + t * p.tw
        return (jnp.vdot(d.g, t * p.x)
                + jnp.sum(d.gamma_s * s) + jnp.sum(d.gamma_t * tt)
                + jnp.sum(d.gamma_sw * sw) + jnp.sum(d.gamma_tw * tw)
                - mu * _barrier_terms(x, s, tt, sw, tw, d, 1.0))

    h = 1e-6
    fd = (float(barrier_obj(h)) - float(barrier_obj(-h))) / (2 * h)
    assert abs(float(fp) - fd) < 1e-6 * max(1.0, abs(fd)), (float(fp), fd)

    # cproj: the reference-normalized -cscale * sum b.z (A p.x - p.s + p.t)
    # with cscale = 1/||c - s + t|| (`ParOptInteriorPoint.cpp:5866-5878`)
    cscale = 1.0 / float(jnp.linalg.norm(d.c - v.s + v.t))
    want = -cscale * float(jnp.sum(b.z * (d.A @ p.x - p.s + p.t)))
    assert abs(float(cp) - want) < 1e-12 * max(1.0, abs(want))


def test_fused_nk_step_is_newton_oriented():
    """Direction-aware regression anchor for the fused GMRES subspace
    recovery: the assembled NK step must point WITH the quasi-Newton
    direction (cos > 0), not against it — the anti-Newton sign inversion
    (K p = +r) shipped unnoticed because residual norms and final
    solutions are direction-blind."""
    import jax
    from paropt_tpu import ip_fused as ipf
    from paropt_tpu.ops import qn as qnmod, kkt

    prob = RandomConvexQP(n=20, ncon=2, seed=41)
    model = ipf.model_from_problem(prob)
    data, x0 = ipf.data_template_from_problem(prob)
    opts = ipf.FusedIPOptions(
        abs_res_tol=1e-9, max_major_iters=200,
        use_quasi_newton_update=True,
        use_hvec_product=True, gmres_subspace_size=12, nk_switch_tol=1.0)
    fused = ipf.FusedIP(model, prob.nvars, prob.ncon, prob.nwcon,
                        prob.nwblock, opts)
    state = fused.init(x0, data, (), qnmod.qn_init(10, prob.nvars), None)
    for _ in range(60):
        state = fused.step(state, data, (), None)
        if float(state.res_norm) < 1e-4:
            break
    v = state.vars
    d2 = ipf._refresh_data(data, state.g, state.A, state.c, state.cw)
    cq = ipf._get_compact(opts, model, state, (), None)
    f = kkt.setup_kkt_factor(v, d2, qn_compact=cq, qn_sigma=opts.qn_sigma)
    r = kkt.kkt_residual(v, d2, state.mu, opts.rel_bound_barrier)
    p, iters = ipf._fused_gmres(model, opts, (), v, d2, f, cq, r,
                                jnp.asarray(1e-2), state.mu)
    assert int(iters) > 0
    pq = kkt.solve_kkt(v, d2, f, r, qn_compact=cq)
    cos = float(jnp.vdot(p.x, pq.x)
                / (jnp.linalg.norm(p.x) * jnp.linalg.norm(pq.x) + 1e-30))
    assert cos > 0.5, f"fused NK step not Newton-oriented (cos={cos:.3f})"
