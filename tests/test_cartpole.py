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
    """Swing-up on a coarse grid: terminal equality constraints met."""
    prob = CartPole(nsteps=16, tfinal=2.0)
    ip = InteriorPoint(prob, {"output_file": None, "max_major_iters": 300,
                              "abs_res_tol": 1e-6,
                              "barrier_strategy": "mehrotra",
                              "init_barrier_param": 10.0,
                              "starting_point_strategy":
                                  "least_squares_multipliers"})
    res = ip.optimize()
    assert res["converged"], res
    qf = np.asarray(prob.trajectory(res["x"])[-1])
    assert np.allclose(qf, [1.0, np.pi, 0.0, 0.0], atol=1e-3), qf
