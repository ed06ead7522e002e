"""Cart-pole swing-up trajectory optimization (the reference's
`examples/cart_pole/cart_pole.py` role): single shooting through an
implicit-midpoint lax.scan with autodiff gradients."""

import jax.numpy as jnp
import numpy as np

from paropt_tpu import InteriorPoint
from paropt_tpu.models.cartpole import CartPole


def test_trajectory_physics():
    """With zero force the pendulum stays hanging; gravity accelerates a
    displaced pole."""
    prob = CartPole(nsteps=16, tfinal=1.0)
    q = np.asarray(prob.trajectory(jnp.zeros(16)))
    assert np.allclose(q, 0.0, atol=1e-10)  # equilibrium at rest
    # constant push moves the cart in +x
    q2 = np.asarray(prob.trajectory(jnp.full(16, 5.0)))
    assert q2[-1, 0] > 0.5


def test_gradients_through_scan():
    prob = CartPole(nsteps=12, tfinal=1.0)
    rep = prob.check_gradients(dh=1e-6)
    assert rep["obj_gradient"] < 1e-7
    assert rep["con_gradient"] < 1e-6


def test_swingup_small():
    """Swing-up on a coarse grid via the FUSED solver (the whole solve is
    one XLA computation; the host loop would pay hundreds of dispatch
    round-trips through the trajectory scan): terminal equality
    constraints met."""
    from paropt_tpu import ip_fused
    from paropt_tpu.ops import qn as qnmod

    prob = CartPole(nsteps=12, tfinal=2.0, newton_iters=6)
    model = ip_fused.model_from_problem(prob)
    data, x0 = ip_fused.data_template_from_problem(prob)
    opts = ip_fused.FusedIPOptions(
        abs_res_tol=1e-6, max_major_iters=300,
        use_quasi_newton_update=True, barrier_strategy="monotone",
        init_barrier_param=10.0)
    fused = ip_fused.FusedIP(model, prob.nvars, prob.ncon, prob.nwcon,
                             prob.nwblock, opts)
    st = fused.solve(x0, data, (), qnmod.qn_init(10, prob.nvars), None,
                     jit_loop=True)
    assert bool(st.converged), (float(st.res_norm), int(st.k))
    qf = np.asarray(prob.trajectory(st.vars.x)[-1])
    assert np.allclose(qf, [1.0, np.pi, 0.0, 0.0], atol=2e-3), qf
