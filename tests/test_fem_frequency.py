"""Frequency-constrained topology: the compact-eigenvalue TR path on the
reference's real workload class (reference analogue:
`examples/eigenvalue/eigenvalue_opt.py` + `ParOptCompactEigenvalueApprox`)."""

import numpy as np
import jax
import jax.numpy as jnp

from paropt_tpu.models.fem_frequency import FrequencyTopology
from paropt_tpu.eig import CompactEigenApprox, EigenQuasiNewton, \
    EigenSubproblem
from paropt_tpu.tr import TrustRegion
from paropt_tpu.ops import qn as qnmod


def _small(nex=10, ney=5, N=3):
    return FrequencyTopology(nex=nex, ney=ney, N=N, cg_iters=300,
                             lobpcg_iters=80, dtype=jnp.float64)


def test_eigensolve_matches_dense():
    """Matrix-free shift-inverted LOBPCG == dense generalized eigensolve."""
    p = _small()
    fem = p.fem
    x = jnp.asarray(np.random.default_rng(1).uniform(0.3, 1.0, p.nvars))
    xf = fem._filter(x)
    E = fem.emin + xf ** fem.penal * (fem.e0 - fem.emin)
    I = jnp.eye(fem.ndof)
    K = jax.vmap(lambda col: fem._kmul(E, col), in_axes=1, out_axes=1)(I)
    m = p._mass_diag(xf)
    free = np.asarray(fem.fixed_mask) == 0
    Kf = np.asarray(K)[np.ix_(free, free)]
    mf = np.asarray(m)[free]
    A = Kf / np.sqrt(np.outer(mf, mf))
    lam_ref = np.sort(np.linalg.eigvalsh(0.5 * (A + A.T)))[:p.N]

    lam, W, _ = p._eig_fn(x, None)
    assert np.allclose(np.asarray(lam), lam_ref, rtol=1e-8), (lam, lam_ref)
    assert np.isfinite(np.asarray(W)).all()


def test_ks_gradient_matches_fd():
    """Analytic eigenvalue sensitivities + filter chain vs central FD."""
    p = _small()
    rng = np.random.default_rng(2)
    x = np.asarray(rng.uniform(0.3, 1.0, p.nvars))
    d = rng.standard_normal(p.nvars)
    d /= np.linalg.norm(d)
    ex = p._eval(jnp.asarray(x))["dks"] @ d
    dh = 1e-6
    c1 = p._eval(jnp.asarray(x + dh * d))["ks"]
    c0 = p._eval(jnp.asarray(x - dh * d))["ks"]
    fd = (c1 - c0) / (2 * dh)
    assert abs(fd - ex) < 1e-6 * max(1.0, abs(fd)), (fd, ex)


def test_eigen_model_update_regularized():
    """At x0 one mode dominates: eta collapses, the KS curvature matrix
    underflows — the regularized inverse must stay finite and NSD so the
    merged Hessian contribution is PSD (raw pinv overflowed to NaN)."""
    p = _small()
    eigh = CompactEigenApprox(nvars=p.nvars, N=p.N)
    x0, _, _ = p.get_vars_and_bounds()
    p.update_eigen_model(x0, eigh)
    Minv = np.asarray(eigh.Minv)
    assert np.isfinite(Minv).all()
    e = np.linalg.eigvalsh(0.5 * (Minv + Minv.T))
    assert (e < 0).all(), e  # NSD, bounded away from 0
    # and the merged compact model evaluates finite at p=0 and a step
    eqn = EigenQuasiNewton(qnmod.qn_init(5, p.nvars), eigh, index=0)
    v = jnp.ones(p.nvars)
    assert bool(jnp.isfinite(eqn.mult(v)).all())


def test_frequency_constrained_mass_min():
    """End-to-end: minimize mass s.t. KS min-frequency >= target through
    the EigenSubproblem TR path (`eigenvalue_opt.py:281-306` workflow)."""
    p = _small()          # 10x5: the 12x6/40-iter variant passes too but
    sub, eigh = p.build_tr_subproblem(msub=10)   # costs 52s vs 20s

    opts = {"tr_output_file": None, "output_file": None,
            "tr_max_iterations": 30, "tr_init_size": 0.05,
            "tr_max_size": 0.2, "tr_min_size": 1e-6, "abs_res_tol": 1e-8,
            "tr_l1_tol": 1e-4, "tr_linfty_tol": 1e-4,
            "tr_adaptive_gamma_update": True, "penalty_gamma": 10.0}
    res = TrustRegion(p, opts, subproblem=sub).optimize()
    x = res["x"]
    ev = p._eval(x)
    mass = float(jnp.mean(p.fem._filter(x)))
    # substantial mass cut with the frequency constraint held (near-)active
    assert mass < 0.45, mass
    assert ev["ks"] > -5e-4, ev["ks"]
    assert ev["lam"][0] > p.lam_target * (1.0 - 5e-3), \
        (ev["lam"][0], p.lam_target)


def test_fused_eigen_tr_matches_host_quality():
    """The WHOLE eigen-TR loop as one on-device while_loop
    (`eig_fused.FusedEigenTR`): same design quality as the host
    EigenSubproblem path on the same problem (trajectories differ by the
    documented subproblem-model delta; the converged design must agree in
    mass and hold the frequency constraint (near-)active)."""
    p = FrequencyTopology(nex=10, ney=6, N=3, cg_iters=25, solver="mgcg",
                          lobpcg_iters=50, dtype=jnp.float64)
    opts = {"tr_output_file": None, "output_file": None,
            "tr_max_iterations": 30, "tr_init_size": 0.05,
            "tr_max_size": 0.2, "tr_min_size": 1e-6, "abs_res_tol": 1e-8,
            "tr_l1_tol": 1e-4, "tr_linfty_tol": 1e-4,
            "tr_adaptive_gamma_update": True, "penalty_gamma": 10.0}

    # eval_full's constraint/gradient/model agree with the host pieces
    x0, _, _ = p.get_vars_and_bounds()
    f0, c0, g0, A0, M0, Minv0, h0, _ = p.eval_full(x0)
    ev = p._eval(x0)
    np.testing.assert_allclose(float(c0[0]), ev["ks"], atol=1e-10)
    np.testing.assert_allclose(np.asarray(A0[0]), ev["dks"], atol=1e-10)
    # Minv is the regularized inverse of the (NSD) KS curvature
    r = np.asarray(M0) @ np.asarray(Minv0) @ np.asarray(M0)
    np.testing.assert_allclose(r, np.asarray(M0), atol=1e-8)

    ftr = p.build_fused_tr(dict(opts))
    res, st = ftr.solve()
    x = res["x"]
    evx = p._eval(x)
    mass = float(jnp.mean(p.fem._filter(x)))
    assert mass < 0.45, mass
    assert evx["ks"] > -5e-4, evx["ks"]
    assert evx["lam"][0] > p.lam_target * (1.0 - 5e-3), \
        (evx["lam"][0], p.lam_target)
    # resumable: continuing from the final state stays feasible/improving
    import dataclasses as dc
    res2, _ = ftr.solve(state0=dc.replace(
        st, k=jnp.zeros((), jnp.int32)))
    assert res2["fobj"] <= res["fobj"] + 1e-6
