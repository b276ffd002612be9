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


def test_matmul_mode_switching():
    from gpscore.utils.precision import (
        get_matmul_mode,
        matmul_mode,
        mm_precision,
        mm_precision_crit,
        set_matmul_mode,
    )

    assert get_matmul_mode() == "highest"
    assert mm_precision() == jax.lax.Precision.HIGHEST
    assert mm_precision_crit() == jax.lax.Precision.HIGHEST
    with matmul_mode("fast"):
        assert get_matmul_mode() == "fast"
        assert mm_precision() == jax.lax.Precision.DEFAULT
        # critical contractions are floored at 3-pass in fast mode
        assert mm_precision_crit() == jax.lax.Precision.HIGH
        a = jnp.ones((8, 8))
        np.testing.assert_allclose(np.asarray(matmul(a, a)), 8.0)
    assert get_matmul_mode() == "highest"
    with matmul_mode("high"):
        assert mm_precision() == jax.lax.Precision.HIGH
        assert mm_precision_crit() == jax.lax.Precision.HIGH
    with matmul_mode("bf16"):
        # bf16 STORAGE mode: one-pass native bf16 passes + bfloat16-stored
        # large-n buffers (storage_dtype()).
        from gpscore.utils.precision import storage_dtype

        assert mm_precision() == jax.lax.Precision.DEFAULT
        assert storage_dtype() == jnp.bfloat16
    from gpscore.utils.precision import storage_dtype

    assert storage_dtype() == jnp.float32
    with pytest.raises(ValueError, match="mode"):
        set_matmul_mode("fp8")
    # the context restores even on error
    try:
        with matmul_mode("fast"):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert get_matmul_mode() == "highest"


@pytest.mark.slow
def test_objective_finite_under_reduced_modes(rng):
    """The fused large-n path computes finite values/grads when traced under
    each reduced mode (numerics identical on the CPU test backend — TPU-side
    accuracy is characterized in RESULTS.md)."""
    import gpscore.fit.objectives as obj_mod
    from gpscore.fit import make_objective
    from gpscore.utils.params import GPParams
    from gpscore.utils.precision import matmul_mode

    n, d = 64, 2
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y = jnp.asarray(np.sin(np.asarray(x).sum(1)).astype(np.float32))
    p = GPParams(jnp.float32(0.3), jnp.zeros(d), jnp.float32(-1.0))
    old = obj_mod._FUSED_LOO_MIN_N
    obj_mod._FUSED_LOO_MIN_N = 1
    try:
        for mode in ("high", "fast"):
            with matmul_mode(mode):
                v, g = jax.value_and_grad(make_objective("crps"))(p, x, y, None)
            assert np.isfinite(float(v))
            assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
    finally:
        obj_mod._FUSED_LOO_MIN_N = old


def test_rules_for_lists_reference_rules():
    # reference rules + the BASELINE.json interval-score addition
    assert set(rules_for("kin40k_fitc")) == {
        "crps", "nlml", "logs", "dss", "kc", "interval"
    }
    assert set(rules_for("simple_full")) == {"crps", "nlml", "logs", "interval"}


def test_get_schedule_error_lists_available():
    with pytest.raises(KeyError, match="available"):
        get_schedule("nope", "crps")
