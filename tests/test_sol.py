"""Unit tests for the speed-of-light accounting (utils/sol.py): the FLOP/
byte models are pure functions -- check structure and scaling; the on-chip
ceiling microbenchmarks are monkeypatched (they need the TPU)."""

import numpy as np
import pytest

from dpilqr_tpu.utils import sol


def test_backward_flop_model_scales_cubically_in_width():
    # Doubling K multiplies the dominant nuf^2(nuf+nxf) / nuf*nxf^2 terms
    # by ~8; the model should sit between quadratic and cubic growth.
    f1 = sol.backward_step_flops(4, 4, 2)
    f2 = sol.backward_step_flops(8, 4, 2)
    assert 4 * f1 < f2 < 16 * f1


def test_hbm_byte_model_counts_streams_only():
    b = sol.backward_step_hbm_bytes(8, 4, 2)
    nxf, nuf = 32, 16
    expected = (
        8 * 4 * 4 + 8 * 4 * 2 + nuf * nuf + nxf * nxf + nxf + nuf
        + nuf * nxf + nuf
    ) * 4
    assert b == expected


def test_forward_flop_model_scales_with_alphas():
    f10 = sol.forward_step_flops(8, 4, 2, 10, 5)
    f2 = sol.forward_step_flops(8, 4, 2, 2, 5)
    # Rollout work is per line-search candidate.
    assert f10 > 4 * f2


def test_kernel_sol_report(monkeypatch):
    monkeypatch.setattr(sol, "measure_vpu_peak_gflops", lambda: 1000.0)
    monkeypatch.setattr(sol, "measure_hbm_stream_gbps", lambda: 700.0)
    rep = sol.kernel_sol(
        "backward", N=50, K=8, nx_p=4, nu_p=2, S=128, n_alpha=10,
        measured_s=5e-3,
    )
    assert rep["binding_limit"] in ("vpu", "hbm")
    assert 0 < rep["sol_frac"]
    # Fields are rounded for display; compare loosely.
    assert rep["achieved_gflop_s"] == pytest.approx(
        rep["gflops"] / 5e-3, rel=1e-2
    )
    # The SOL time is the max of the compute and memory bounds.
    t_c = rep["gflops"] / 1000.0
    t_m = rep["gbytes"] / 700.0
    assert rep["sol_s"] == pytest.approx(max(t_c, t_m), rel=1e-3)
    with pytest.raises(ValueError):
        sol.kernel_sol("nope", 50, 8, 4, 2, 128, 10, 1e-3)


def test_pscan_flops_model():
    assert sol.pscan_sweep_flops(100, 32) == 2 * 100 * 11 * 2 * 32**3


def test_forward_trig_model(monkeypatch):
    # 4 dynamics evals per substep, 2 transcendentals per slot column.
    assert sol.forward_step_trig_ops(8, 4, 2, 10, 5) == 5 * 4 * 2 * 8 * 10
    # kernel_sol folds the measured transcendental rate into the compute
    # bound for the forward family (VERDICT r4 item 5).
    monkeypatch.setattr(sol, "measure_vpu_peak_gflops", lambda: 1000.0)
    monkeypatch.setattr(sol, "measure_hbm_stream_gbps", lambda: 700.0)
    monkeypatch.setattr(
        sol, "measure_vpu_transcendental_ops", lambda: 50e9
    )
    rep = sol.kernel_sol(
        "forward", N=50, K=8, nx_p=4, nu_p=2, S=128, n_alpha=10,
        measured_s=5e-3, substeps=5,
    )
    t_c = rep["gflops"] / 1000.0 + rep["trig_gops"] / 50.0
    t_m = rep["gbytes"] / 700.0
    # trig_gops is display-rounded to 3 decimals; compare loosely.
    assert rep["sol_s"] == pytest.approx(max(t_c, t_m), rel=5e-2)
    assert rep["ceiling_trig_gops_s"] == 50.0
    assert 0 < rep["trig_time_frac_of_sol"] <= 1.0


def test_diff_time_escalates_past_noise():
    # Simulated: per-call cost 1 ms, constant 30 ms barrier noise.  Small
    # rep counts give diffs below the signal floor; escalation reaches a
    # rep count whose diff clearly exceeds it and returns (d, r) with
    # d/r ~= the true per-call cost.
    calls = []

    def timed(r):
        calls.append(r)
        return 0.030 + 0.001 * r

    d, r = sol._diff_time(timed, 10, 2, min_signal=0.05)
    assert d == pytest.approx(0.001 * r, rel=1e-6)
    assert r >= 50  # escalated past 10 and 20
