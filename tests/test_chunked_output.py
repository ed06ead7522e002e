"""Mid-solve write_output + checkpoint cadence for the FUSED loops.

The reference calls `writeOutput(iter, x)` and writes a checkpoint every
`write_output_frequency` iterations during `optimize()`
(`ParOptInteriorPoint.cpp:4620-4631`, `ParOptProblem.h:278-282`).  The
fused loops' host-visible points are the `run_chunked` chunk boundaries —
these tests pin that the hook fires there with the advancing iterate, that
an Orbax checkpoint of the FULL fused state round-trips, and that a solve
resumed from a mid-solve checkpoint reproduces the uninterrupted run.
"""

import numpy as np
import jax.numpy as jnp

from paropt_tpu.models.topology import SyntheticTopology
from paropt_tpu.mma import FusedMMA
from paropt_tpu.tr import FusedTR


class _RecordingTopology(SyntheticTopology):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.writes = []

    def write_output(self, it, x):
        self.writes.append((int(it), np.asarray(x).copy()))


def _tr_opts(extra=None):
    o = {"tr_output_file": None, "output_file": None, "dtype": "float64",
         "tr_max_iterations": 12, "tr_init_size": 0.05,
         "tr_l1_tol": 0.0, "tr_linfty_tol": 1e-10, "abs_res_tol": 1e-10}
    if extra:
        o.update(extra)
    return o


def test_fused_tr_write_output_fires_at_chunk_boundaries():
    prob = _RecordingTopology(n=64, block=8, dtype=jnp.float64)
    tr = FusedTR(prob, _tr_opts({"tr_write_output_frequency": 2}))
    res, state = tr.solve(chunk=2)
    assert len(prob.writes) >= 2, prob.writes
    its = [w[0] for w in prob.writes]
    assert its == sorted(its) and len(set(its)) == len(its)
    # every write is >= the next multiple of freq after the previous one
    for a, b in zip(its, its[1:]):
        assert b - a >= 2
    # the recorded iterate advances with the solve
    assert not np.allclose(prob.writes[0][1], prob.writes[-1][1])
    # final write is at (or before) the final state
    assert its[-1] <= int(state.k)


def test_fused_tr_write_output_disabled_by_zero_freq():
    prob = _RecordingTopology(n=64, block=8, dtype=jnp.float64)
    tr = FusedTR(prob, _tr_opts({"tr_write_output_frequency": 0}))
    tr.solve(chunk=3)
    assert prob.writes == []


def test_fused_mma_checkpoint_resume_matches_uninterrupted(tmp_path):
    """Solve A uninterrupted; solve B checkpoints mid-run; solve C resumes
    from B's checkpoint and must land on A's exact trajectory."""
    from paropt_tpu.utils.checkpoint import restore_state

    def build(max_it):
        prob = SyntheticTopology(n=64, block=8, dtype=jnp.float64)
        return FusedMMA(prob, {"mma_max_iterations": max_it,
                               "mma_output_file": None, "dtype": "float64",
                               "write_output_frequency": 2,
                               "mma_linfty_tol": 1e-12,
                               "mma_l1_tol": 0.0})

    solver = build(10)
    resA, stateA = solver.solve(chunk=2)

    ckpt = str(tmp_path / "mma_ckpt")
    solverB = build(4)
    solverB.solve(chunk=2, checkpoint_path=ckpt)

    restored = restore_state(ckpt, solverB._state0)
    k_resume = int(restored.k)
    assert 0 < k_resume <= 4

    solverC = build(10)
    resC, stateC = solverC.solve(state0=restored, chunk=2)
    assert int(stateC.k) == int(stateA.k)
    np.testing.assert_allclose(np.asarray(stateC.x), np.asarray(stateA.x),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(resC["fobj"], resA["fobj"], rtol=1e-12)


def test_fused_ip_facade_write_output_and_checkpoint(tmp_path):
    """The facade fused-IP route (`fused_ip_optimize`) honors
    write_output_frequency and ip_checkpoint_file."""
    from paropt_tpu.optimizer import Optimizer
    from paropt_tpu.utils.checkpoint import restore_state

    ckpt = str(tmp_path / "ip_ckpt")
    prob = _RecordingTopology(n=64, block=8, dtype=jnp.float64)
    opt = Optimizer(prob, {"algorithm": "ip", "use_fused_loop": True,
                           "output_file": None, "dtype": "float64",
                           "write_output_frequency": 5,
                           "ip_checkpoint_file": ckpt,
                           "abs_res_tol": 1e-8})
    res = opt.optimize()
    assert res["converged"], res
    assert len(prob.writes) >= 1
    # checkpoint restores into the final state's template with x intact
    st = opt._fused_state
    restored = restore_state(ckpt, st)
    assert restored.vars.x.shape == st.vars.x.shape
    assert np.all(np.isfinite(np.asarray(restored.vars.x)))
