"""Utility layer: profiling helpers, precision policy, schedule lookups."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpscore.fit.schedules import get_schedule, rules_for
from gpscore.utils.precision import MM_PRECISION, matmul
from gpscore.utils.profiling import timed, trace


def test_timed_measures_and_returns_result():
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    dt, out = timed(f, x, warmup=1, repeats=2)
    assert dt > 0
    np.testing.assert_allclose(float(out), 64.0**3)


def test_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "tb")
    with trace(logdir):
        jax.block_until_ready(jnp.ones((32, 32)) @ jnp.ones((32, 32)))
    # jax.profiler writes plugins/profile/<ts>/ under the logdir
    found = []
    for root, _, files in os.walk(logdir):
        found.extend(files)
    assert found, "profiler trace produced no files"


def test_matmul_uses_highest_precision():
    assert MM_PRECISION == jax.lax.Precision.HIGHEST
    a = jnp.ones((8, 8))
    np.testing.assert_allclose(np.asarray(matmul(a, a)), 8.0 * np.ones((8, 8)))


def test_rules_for_lists_reference_rules():
    # reference rules + the BASELINE.json interval-score addition
    assert set(rules_for("kin40k_fitc")) == {
        "crps", "nlml", "logs", "dss", "kc", "interval"
    }
    assert set(rules_for("simple_full")) == {"crps", "nlml", "logs", "interval"}


def test_get_schedule_error_lists_available():
    with pytest.raises(KeyError, match="available"):
        get_schedule("nope", "crps")
