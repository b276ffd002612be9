"""Experiment-layer machinery (experiments/common.py)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.common import run_sweep  # noqa: E402
from gpscore.fit import Schedule  # noqa: E402
from gpscore.utils.params import GPParams  # noqa: E402


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
