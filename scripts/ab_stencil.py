"""A/B on the real TPU: index-based gather/scatter FEM matvec vs the
slice/pad stencil path inside the CG loop (the MMA/TR flagship-bench hot
loop). Interleaved windows; single process, back-to-back (CLAUDE.md:
tunnel variance makes non-interleaved comparisons meaningless).

    python scripts/ab_stencil.py [--mesh3d]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("PAROPT_TPU_NO_X64", "1")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh3d", action="store_true")
    ap.add_argument("--windows", type=int, default=4)
    args = ap.parse_args()

    if args.mesh3d:
        from paropt_tpu.models.fem_topology3d import FEMTopology3D
        prob = FEMTopology3D(nex=32, ney=16, nez=16, cg_iters=400)
        nd = 24
    else:
        from paropt_tpu.models.fem_topology import FEMTopology
        prob = FEMTopology(nex=96, ney=48, cg_iters=700)
        nd = 8

    x0, _, _ = prob.get_vars_and_bounds()
    xf = prob._filter(x0)
    E = prob.emin + xf ** prob.penal * (prob.e0 - prob.emin)
    b = prob.f

    edofs, KE, fixed = prob.edofs, prob.KE, prob.fixed_mask

    def kmul_gather(E, u):
        ue = u[edofs]
        fe = jnp.matmul(ue, KE,
                        precision=jax.lax.Precision.HIGHEST) * E[:, None]
        out = jnp.zeros_like(u).at[edofs.reshape(-1)].add(fe.reshape(-1))
        return jnp.where(fixed > 0, u, out)

    def make_cg(kmul):
        hi = jax.lax.Precision.HIGHEST
        tiny = float(jnp.finfo(prob._dtype).tiny)

        def run(E):
            # E is a runtime ARGUMENT (not a baked closure constant) so all
            # three variants compare like-for-like (CLAUDE.md byte-
            # accounting caveat)
            diag = jnp.zeros(prob.ndof, prob._dtype).at[
                edofs.reshape(-1)].add(
                (jnp.diag(KE)[None, :] * E[:, None]).reshape(-1))
            diag = jnp.where(fixed > 0, 1.0, jnp.maximum(diag, 1e-12))
            bb = jnp.where(fixed > 0, 0.0, b)

            def body(i, carry):
                u, r, p, rz = carry
                Kp = kmul(E, p)
                pKp = jnp.vdot(p, Kp, precision=hi)
                alpha = jnp.where(pKp > tiny,
                                  rz / jnp.where(pKp > tiny, pKp, 1.0), 0.0)
                u = u + alpha * p
                r = r - alpha * Kp
                z = r / diag
                rz_new = jnp.vdot(r, z, precision=hi)
                beta = jnp.where(rz > tiny,
                                 rz_new / jnp.where(rz > tiny, rz, 1.0),
                                 0.0)
                return (u, r, z + beta * p, rz_new)

            u0 = jnp.zeros(prob.ndof, prob._dtype)
            z0 = bb / diag
            carry = (u0, bb, z0, jnp.vdot(bb, z0, precision=hi))
            u, _, _, _ = jax.lax.fori_loop(0, prob.cg_iters, body, carry)
            return u

        return jax.jit(run)

    f_gather = make_cg(kmul_gather)
    f_stencil = make_cg(lambda E, u: prob._kmul(E, u))

    # mgcg at the model level: same solve via the V-cycle-preconditioned CG
    if args.mesh3d:
        from paropt_tpu.models.fem_topology3d import FEMTopology3D as M
        mg = M(nex=prob.nex, ney=prob.ney, nez=prob.nez, cg_iters=20,
               solver="mgcg")
    else:
        from paropt_tpu.models.fem_topology import FEMTopology as M
        mg = M(nex=prob.nex, ney=prob.ney, cg_iters=20, solver="mgcg")
    f_mg = jax.jit(mg._solve)

    t0 = time.time()
    ug = f_gather(E)
    jax.block_until_ready(ug)
    print(f"compile gather: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    us = f_stencil(E)
    jax.block_until_ready(us)
    print(f"compile stencil: {time.time()-t0:.1f}s", flush=True)
    err = float(jnp.max(jnp.abs(ug - us)) / (1e-30 + jnp.max(jnp.abs(ug))))
    print(f"rel l_inf difference gather/stencil: {err:.2e}", flush=True)
    t0 = time.time()
    um = f_mg(E)
    jax.block_until_ready(um)
    print(f"compile mgcg(20): {time.time()-t0:.1f}s", flush=True)
    errm = float(jnp.max(jnp.abs(ug - um)) / (1e-30 + jnp.max(jnp.abs(ug))))
    print(f"rel l_inf difference cg{prob.cg_iters}/mgcg20: {errm:.2e}",
          flush=True)

    tg, ts, tm = [], [], []
    for w in range(args.windows):
        t0 = time.time()
        jax.block_until_ready(f_gather(E))
        tg.append(time.time() - t0)
        t0 = time.time()
        jax.block_until_ready(f_stencil(E))
        ts.append(time.time() - t0)
        t0 = time.time()
        jax.block_until_ready(f_mg(E))
        tm.append(time.time() - t0)
        print(f"window {w}: gather {tg[-1]*1e3:.1f} ms   "
              f"stencil {ts[-1]*1e3:.1f} ms   mgcg {tm[-1]*1e3:.1f} ms",
              flush=True)
    tg.sort(), ts.sort(), tm.sort()
    g, s, m = (t[len(t) // 2] for t in (tg, ts, tm))
    it = prob.cg_iters
    print(f"median per solve: gather cg{it} {g*1e3:.1f} ms "
          f"({g/it*1e6:.1f} us/it)  stencil cg{it} {s*1e3:.1f} ms "
          f"({s/it*1e6:.1f} us/it, {g/s:.2f}x)  mgcg20 {m*1e3:.1f} ms "
          f"({g/m:.2f}x vs gather-cg)")


if __name__ == "__main__":
    main()
