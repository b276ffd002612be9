"""Experiment-layer machinery (experiments/common.py)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.common import run_sweep  # noqa: E402
from gpscore.fit import Schedule  # noqa: E402
from gpscore.utils.params import GPParams  # noqa: E402

pytestmark = pytest.mark.slow  # end-to-end experiment drivers


def _setup(rng, n=32, replicates=2):
    x = rng.standard_normal((n, 2)).astype(np.float32)
    y = np.sin(x.sum(axis=1)).astype(np.float32)
    sx = rng.standard_normal((16, 2)).astype(np.float32)
    sy = np.sin(sx.sum(axis=1)).astype(np.float32)

    def make_data(j):
        return x, y, sx, sy

    def make_params(key, d):
        return GPParams(
            log_signal_sq=jnp.ones(()),
            log_length=jax.random.uniform(key, (d,)),
            log_noise_sq=jnp.ones(()),
            inducing=None,
        )

    return make_data, make_params


def test_segmented_sweep_matches_single_program(rng):
    """Host-chunked segments (incl. a remainder segment) are numerically
    identical to the one-scan fit for deterministic rules."""
    make_data, make_params = _setup(rng)
    sched = {"crps": Schedule("crps", iters=7, lr=0.5)}
    kw = dict(replicates=2, d=2, verbose=False)

    whole = run_sweep(["crps"], "exact", sched, make_data, make_params, **kw)
    seg = run_sweep(["crps"], "exact", sched, make_data, make_params,
                    segment_iters=3, **kw)

    for f in ("crps", "logs", "smse", "msll", "coverage95"):
        np.testing.assert_allclose(seg["crps"][f], whole["crps"][f],
                                   rtol=1e-5, atol=1e-6)
    assert seg["crps"]["num_failed"] == whole["crps"]["num_failed"] == 0


def test_segmented_sweep_stochastic_rule_runs(rng):
    """ES under segmenting: different MC draws than one-program (documented),
    but finite and evaluable."""
    make_data, make_params = _setup(rng)
    sched = {"es": Schedule("es", iters=4, lr=0.05)}
    out = run_sweep(["es"], "exact", sched, make_data, make_params,
                    replicates=1, d=2, verbose=False, segment_iters=2,
                    num_sim=16)
    assert out["es"]["num_failed"] == 0
    assert np.isfinite(out["es"]["crps"])


def test_per_rule_make_params_receives_rule(rng):
    """A make_params with a ``rule`` parameter gets the current rule — the
    mechanism for the reference's per-section init policies
    (`kin40k-FULL-compare.py:226-233` vs `:321-324`)."""
    make_data, _ = _setup(rng)
    seen = []

    def make_params(key, d, rule):
        seen.append(rule)
        unit = 1.0 if rule != "crps" else 0.5
        return GPParams(
            log_signal_sq=jnp.full((), unit),
            log_length=jax.random.uniform(key, (d,)),
            log_noise_sq=jnp.full((), unit),
            inducing=None,
        )

    sched = {"crps": Schedule("crps", iters=2, lr=0.5),
             "logs": Schedule("logs", iters=2, lr=0.05)}
    out = run_sweep(["crps", "logs"], "exact", sched, make_data, make_params,
                    replicates=2, d=2, verbose=False)
    assert set(seen) == {"crps", "logs"}
    assert out["crps"]["num_failed"] == out["logs"]["num_failed"] == 0


def test_sweep_dispersion_paired_and_stall_telemetry(rng, monkeypatch):
    """Sweep records carry replicate dispersion (<metric>_se), the paired
    per-replicate delta vs NLML (same seeds -> paired by construction), and
    stall telemetry (num_stalled / max_stall_iters) — round-4 VERDICT weak
    #6/#7: per-replicate data existed at sweep time and was discarded."""
    import experiments.common as common

    make_data, make_params = _setup(rng)
    sched = {"crps": Schedule("crps", iters=4, lr=0.5),
             "nlml": Schedule("nlml", iters=4, lr=0.001)}
    out = run_sweep(["crps", "nlml"], "exact", sched, make_data, make_params,
                    replicates=3, d=2, verbose=False)
    for rule in ("crps", "nlml"):
        assert np.isfinite(out[rule]["crps_se"]) and out[rule]["crps_se"] >= 0
        assert out[rule]["num_stalled"] == 0
        assert out[rule]["max_stall_iters"] == 0
    paired = out["crps"]["paired_vs_nlml"]
    assert paired["n_pairs"] == 3
    for k in ("crps_delta", "crps_delta_se", "logs_delta", "logs_delta_se"):
        assert np.isfinite(paired[k])
    assert "paired_vs_nlml" not in out["nlml"]

    # A stalled replicate is VISIBLE in the record: force stall_iters > 0.
    real_fit_gd = common.fit_gd

    def stalled_fit_gd(*a, **kw):
        res = real_fit_gd(*a, **kw)
        return res._replace(stall_iters=jnp.asarray(3, jnp.int32))

    monkeypatch.setattr(common, "fit_gd", stalled_fit_gd)
    out2 = run_sweep(["crps"], "exact", {"crps": sched["crps"]}, make_data,
                     make_params, replicates=3, d=2, verbose=False)
    assert out2["crps"]["num_stalled"] == 3
    assert out2["crps"]["max_stall_iters"] == 3

    # ... and through the segmented path (trailing-stall accumulation rule).
    out3 = run_sweep(["crps"], "exact", {"crps": sched["crps"]}, make_data,
                     make_params, replicates=2, d=2, verbose=False,
                     segment_iters=2)
    # every 2-iter segment reports 3 (> it) -> treated as the segment's own
    # trailing count, not accumulated past the schedule length
    assert out3["crps"]["max_stall_iters"] == 3


def test_interval_schedules_registered():
    """The interval objective is first-class: schedule entries exist and the
    drivers expose it via --rules (BASELINE.json north star)."""
    from gpscore.fit.schedules import get_schedule, rules_for

    for exp in ("simple_full", "kin40k_full", "kin40k_fitc"):
        s = get_schedule(exp, "interval")
        assert s.rule == "interval" and s.iters > 0 and s.lr > 0
        assert "interval" in rules_for(exp)


def test_interval_objective_fits_synthetic(rng):
    """A short interval-score fit descends and stays finite."""
    make_data, make_params = _setup(rng)
    sched = {"interval": Schedule("interval", iters=10, lr=0.1)}
    out = run_sweep(["interval"], "exact", sched, make_data, make_params,
                    replicates=1, d=2, verbose=False)
    assert out["interval"]["num_failed"] == 0
    assert np.isfinite(out["interval"]["crps"])


def test_large_n_driver_end_to_end(tmp_path):
    """experiments/large_n.py: tiny-scale smoke of the beyond-reference driver
    (fused-core fit path + chunked large-n predictive + metrics + JSON out)."""
    from experiments import large_n

    out = tmp_path / "ln.json"
    res = large_n.main([
        "--n", "128", "--n-test", "32", "--rules", "crps", "nlml",
        "--iters", "3", "--segment-iters", "2", "--out", str(out),
    ])
    assert out.exists()
    for rule in ("crps", "nlml"):
        rec = res[rule]
        assert np.isfinite(rec["crps"]) and np.isfinite(rec["loss_last"])
        assert rec["loss_last"] < rec["loss_first"]


def test_bench_ceiling_driver_cpu(monkeypatch):
    """experiments/bench_ceiling.py end to end at toy size (the objective
    dispatch, block threading, timing loop, and --ref-grad comparison).
    _FUSED_LOO_MIN_N is lowered so the threaded block=16 core actually
    engages at n=64; the rebinds must be restored on exit (the round-3
    advisor found them leaking into later tests)."""
    import gpscore.fit.objectives as obj
    import gpscore.models.exact as exact_mod
    from experiments.bench_ceiling import main

    monkeypatch.setattr(obj, "_FUSED_LOO_MIN_N", 1)
    orig = (exact_mod.loo_exact_fused, exact_mod.nlml_exact_fused,
            exact_mod.kfold_stats_fused)
    for rule in ("dss", "crps", "nlml"):
        rec = main(["--n", "64", "--d", "2", "--block", "16", "--rule", rule,
                    "--repeats", "1", "--matmul", "f16", "--ref-grad"])
        assert np.isfinite(rec["loss"]) and rec["step_s"] >= 0
        assert rec["grad_cos"] > 0.99
    assert (exact_mod.loo_exact_fused, exact_mod.nlml_exact_fused,
            exact_mod.kfold_stats_fused) == orig


def test_bench_sharded_driver_cpu():
    """experiments/bench_sharded.py end to end on the 8-device CPU mesh:
    step factory dispatch, timing loop, HLO collective structure parse, the
    analytic ICI-traffic model, and the p-chip projection arithmetic."""
    from experiments.bench_sharded import (
        analytic_collective_bytes,
        main,
        projected_step_s,
    )

    rec = main(["--n", "256", "--d", "2", "--block", "32", "--devices", "8",
                "--repeats", "1", "--hlo-collectives", "--project", "8"])
    assert np.isfinite(rec["loss"]) and rec["step_s"] >= 0
    # XLA emitted the stage psums: at least one all-reduce in the module
    assert rec["static_collective_bytes"] > 0
    assert rec["static_collective_bytes_by_op"].get("all-reduce", 0) > 0
    # analytic model: fwd n^2(2e+4) + pivot psums + bwd 4n^2/p (fp32, crps)
    n, b, p = 256, 32, 8
    want = (12 * n * n + 4 * (n // b) * b * b) + 4 * n * n // p
    assert rec["analytic_collective_bytes"] == want
    assert rec["projected_step_s"] == round(
        projected_step_s(rec["step_s"] * 8, 8,
                         rec["analytic_collective_bytes"], 45.0), 3)
    # kfold (fold-STREAMED step): no psum_scatter term; fold-block psums in
    # fwd + bwd (2 n^2 e / 4) plus the per-row-block G gathers (n^2 e)
    kf = analytic_collective_bytes(n, b, p, "dss", 4)
    want_kf = want - 4 * n * n // p + 4 * n * n + 2 * (4 * n * n) // 4
    assert kf["analytic_collective_bytes"] == want_kf
