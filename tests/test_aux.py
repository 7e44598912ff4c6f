"""Auxiliary-subsystem tests: determinism, checkpoint/resume, metrics."""

import numpy as np
import jax.numpy as jnp

import dpilqr_tpu as dtl
from dpilqr_tpu.utils.checkpoint import (
    RhcState,
    StepDumper,
    load_rhc_state,
    save_rhc_state,
)
from dpilqr_tpu.utils.metrics import CSV_SCHEMA, csv_row, setup_csv_logger


def _scenario(n=3, dt=0.1):
    rng = np.random.default_rng(0)
    x0, xf = dtl.random_setup(n, 4, rng=rng, energy=8.0)
    fleet = dtl.homogeneous_fleet(dtl.UNICYCLE_4D, n, dt)
    cost = dtl.make_game_cost(
        xf,
        np.tile(np.eye(4), (n, 1, 1)),
        np.tile(np.eye(2), (n, 1, 1)),
        np.tile(1e3 * np.eye(4), (n, 1, 1)),
        radius=0.5,
    )
    return fleet, cost, x0, xf


def test_solve_is_deterministic():
    """Same inputs => bit-identical solve (XLA is data-race-free; no hidden
    RNG in the solver).  SURVEY.md §5 determinism contract."""
    fleet, cost, x0, xf = _scenario()
    r1 = dtl.ilqr_solve(fleet, cost, jnp.asarray(x0), N=20)
    r2 = dtl.ilqr_solve(fleet, cost, jnp.asarray(x0), N=20)
    assert float(r1.J) == float(r2.J)
    assert np.array_equal(np.asarray(r1.X), np.asarray(r2.X))
    d1 = dtl.solve_distributed(
        fleet, cost, jnp.asarray(x0)[None], jnp.zeros((20, 3, 2)), 0.5
    )
    d2 = dtl.solve_distributed(
        fleet, cost, jnp.asarray(x0)[None], jnp.zeros((20, 3, 2)), 0.5
    )
    assert np.array_equal(np.asarray(d1.X), np.asarray(d2.X))


def test_rhc_checkpoint_resume(tmp_path):
    """A checkpointed RHC run resumed mid-way must finish like the
    uninterrupted run (warm-start state is the full loop state)."""
    fleet, cost, x0, xf = _scenario(n=2)
    kwargs = dict(
        radius=0.5, centralized=True, step_size=2, dist_converge=0.15,
        t_diverge=8.0, rng=np.random.default_rng(1),
    )
    ckpt = tmp_path / "rhc.npz"
    full = dtl.solve_rhc(fleet, cost, x0, 20, checkpoint_path=ckpt, **kwargs)
    assert full.converged

    # Rerun the first few steps only, then resume from its checkpoint.
    steps_mid = max(len(full.steps) // 2, 1)

    class StopAfter:
        def __init__(self, k):
            self.k = k

        def __call__(self, info):
            self.k -= 1
            if self.k == 0:
                raise KeyboardInterrupt

    try:
        dtl.solve_rhc(
            fleet, cost, x0, 20, checkpoint_path=ckpt,
            log_fn=StopAfter(steps_mid),
            **{**kwargs, "rng": np.random.default_rng(1)},
        )
    except KeyboardInterrupt:
        pass
    state, _ = load_rhc_state(ckpt)
    assert state.step == steps_mid

    resumed = dtl.solve_rhc(
        fleet, cost, x0, 20, resume_state=state,
        **{**kwargs, "rng": np.random.default_rng(99)},  # rng unused on resume
    )
    assert resumed.converged
    # Executed histories agree on the overlap and the final states match.
    T = min(resumed.X.shape[0], full.X.shape[0])
    assert np.allclose(resumed.X[-1], full.X[-1], atol=1e-6)


def test_rhc_state_roundtrip(tmp_path):
    st = RhcState(
        xi=np.ones((2, 4)),
        X_warm=np.ones((5, 2, 4)),
        U_warm=np.zeros((4, 2, 2)),
        t=1.5,
        X_full=np.ones((3, 2, 4)),
        U_full=np.ones((3, 2, 2)),
        step=3,
    )
    p = tmp_path / "st.npz"
    save_rhc_state(p, st, extra={"note": "x"})
    st2, extra = load_rhc_state(p)
    assert extra == {"note": "x"}
    assert st2.step == 3 and st2.t == 1.5
    assert np.array_equal(st2.X_warm, st.X_warm)


def test_step_dumper(tmp_path):
    d = StepDumper(tmp_path / "dumps")
    d.dump(np.ones((3, 2, 4)), np.zeros((2, 2, 2)), 1.25, {0: [0, 1]})
    d.dump(np.ones((3, 2, 4)), np.zeros((2, 2, 2)), 0.5)
    files = sorted((tmp_path / "dumps").glob("*.npz"))
    assert len(files) == 2
    z = np.load(files[0])
    assert float(z["J"]) == 1.25


def test_csv_schema_parity(tmp_path):
    """The CSV log must match the reference's analysis schema verbatim
    (reference analysis.py:120-123)."""
    path = tmp_path / "log.csv"
    logger = setup_csv_logger(path)
    logger.info(
        csv_row("UnicycleDynamics4D", 3, 0, True, False, 0.1, 42.0, 50, 0.1,
                True, [0, 1, 2], [0.01], [[0, 1, 2]], [1.0, 2.0, 3.0])
    )
    lines = path.read_text().strip().split("\n")
    assert lines[0] == (
        "dynamics,n_agents,trial,centralized,last,t,J,horizon,dt,converged,"
        "ids,times,subgraphs,dist_left"
    )
    assert lines[1].startswith('"UnicycleDynamics4D",3,0,True,False,')


def test_rate_paces_and_counts_misses():
    """Drift-free rate pacing (reference timer_sleep.py / sleepForRate):
    absolute deadlines, overruns counted, no catch-up bursting."""
    import time

    r = dtl.Rate(100.0)  # 10 ms period
    t0 = time.monotonic()
    for _ in range(5):
        r.sleep()
    elapsed = time.monotonic() - t0
    # 5 ticks at 10 ms, first returns immediately: ~40 ms lower bound.
    assert elapsed >= 0.035
    assert r.ticks == 5 and r.missed == 0

    # A slow iteration (3 periods) registers exactly one miss and the next
    # deadline lands in the future (no burst of immediate returns).
    time.sleep(0.03)
    slack = r.sleep()
    assert slack < 0 and r.missed == 1
    assert r.remaining() > 0

    import pytest

    with pytest.raises(ValueError):
        dtl.Rate(0.0)
