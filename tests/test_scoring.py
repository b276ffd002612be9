"""Scoring rules: oracle parity, formula-independent checks, and propriety."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from gpscore.scoring import (
    crps_gaussian,
    dss,
    energy_score,
    interval_score,
    logs_gaussian,
)


def test_crps_vs_oracle(rng):
    m = rng.standard_normal(50).astype(np.float32)
    v = (0.5 + rng.random(50)).astype(np.float32)
    y = rng.standard_normal(50).astype(np.float32)
    got = crps_gaussian(jnp.asarray(m), jnp.asarray(v), jnp.asarray(y))
    want = oracle.crps_gaussian(m, v, y)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_crps_closed_form_vs_numeric_integration():
    """Closed form == integral of (F - H)^2 — independent of any implementation."""
    cases = [(0.0, 1.0, 0.7), (1.3, 0.25, -0.5), (-2.0, 4.0, -2.0)]
    for mu, var, y in cases:
        got = float(crps_gaussian(jnp.float32(mu), jnp.float32(var), jnp.float32(y)))
        want = oracle.crps_numeric(mu, var, y)
        # fp32 closed form: erf/exp roundoff amplifies to ~1e-4 relative in the
        # |z| ~ 3.6 tail case; 5e-4 bounds fp32 while still catching formula bugs.
        np.testing.assert_allclose(got, want, rtol=5e-4)


def test_crps_propriety_minimized_at_truth(rng):
    """Expected CRPS over a large N(0,1) sample is minimized (over a mean/var grid)
    at the true parameters — the propriety property the paper relies on."""
    y = jnp.asarray(rng.standard_normal(20000).astype(np.float32))
    ones = jnp.ones_like(y)
    mus = np.linspace(-1.0, 1.0, 9)
    vars_ = np.linspace(0.25, 2.5, 10)
    scores = np.array(
        [[float(crps_gaussian(m * ones, v * ones, y)) for v in vars_] for m in mus]
    )
    i, j = np.unravel_index(scores.argmin(), scores.shape)
    assert abs(mus[i]) < 0.3
    assert abs(vars_[j] - 1.0) < 0.35


def test_logs_vs_oracle(rng):
    m = rng.standard_normal(50).astype(np.float32)
    v = (0.5 + rng.random(50)).astype(np.float32)
    y = rng.standard_normal(50).astype(np.float32)
    got = logs_gaussian(jnp.asarray(m), jnp.asarray(v), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(got), oracle.logs_gaussian(m, v, y), rtol=1e-6)


def test_dss_vs_scipy_mvn_logpdf(rng):
    n = 8
    A = rng.standard_normal((n, n))
    C = (A @ A.T + n * np.eye(n)).astype(np.float32)
    m = rng.standard_normal(n).astype(np.float32)
    y = rng.standard_normal(n).astype(np.float32)
    got = dss(jnp.asarray(m), jnp.asarray(C), jnp.asarray(y))
    want = oracle.dss(m, C, y)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


@pytest.mark.slow
def test_energy_score_converges_to_crps_in_1d():
    """For a univariate Gaussian with beta=1, ES == CRPS; the MC estimate must
    approach the closed form."""
    mu, var, y = 0.3, 1.44, -0.2
    want = float(crps_gaussian(jnp.float32(mu), jnp.float32(var), jnp.float32(y)))
    got = float(
        energy_score(
            jax.random.PRNGKey(7),
            jnp.array([mu], jnp.float32),
            jnp.array([[var]], jnp.float32),
            jnp.array([y], jnp.float32),
            num_sim=8000,
        )
    )
    np.testing.assert_allclose(got, want, rtol=5e-2)


@pytest.mark.slow
def test_energy_score_prefers_truth(rng):
    """ES propriety (MC): correct covariance scores better than badly wrong one."""
    n = 4
    C_true = np.eye(n, dtype=np.float32)
    C_bad = 9.0 * np.eye(n, dtype=np.float32)
    key = jax.random.PRNGKey(0)
    ys = rng.standard_normal((64, n)).astype(np.float32)
    zeros = jnp.zeros(n, jnp.float32)

    def mean_es(C):
        keys = jax.random.split(key, ys.shape[0])
        f = jax.vmap(
            lambda k, y: energy_score(k, zeros, jnp.asarray(C), jnp.asarray(y), num_sim=400)
        )
        return float(jnp.mean(f(keys, jnp.asarray(ys))))

    assert mean_es(C_true) < mean_es(C_bad)


def test_interval_score_known_values():
    # Inside the interval: score = width.
    mu, var, alpha = 0.0, 1.0, 0.05
    q = 1.959963984540054  # Phi^-1(0.975)
    got_inside = float(interval_score(jnp.float32(mu), jnp.float32(var), jnp.float32(0.0), alpha))
    np.testing.assert_allclose(got_inside, 2 * q, rtol=1e-5)
    # Above the interval: width + (2/alpha)(y - u).
    y = 3.0
    want = 2 * q + (2 / alpha) * (y - q)
    got_above = float(interval_score(jnp.float32(mu), jnp.float32(var), jnp.float32(y), alpha))
    np.testing.assert_allclose(got_above, want, rtol=1e-5)


def test_scores_are_differentiable(rng):
    m = jnp.asarray(rng.standard_normal(10).astype(np.float32))
    v = jnp.asarray((0.5 + rng.random(10)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal(10).astype(np.float32))
    for fn in (crps_gaussian, logs_gaussian, interval_score):
        g = jax.grad(lambda mm: fn(mm, v, y))(m)
        assert np.all(np.isfinite(np.asarray(g)))


def test_dss_precision_matches_cov_form(rng):
    """dss_precision(m, La, y) == dss(m, (La La^T)^-1, y)."""
    from gpscore.ops.linalg import spd_inverse
    from gpscore.scoring.rules import dss_precision

    n = 10
    A = rng.standard_normal((n, n))
    P = (A @ A.T + n * np.eye(n)).astype(np.float32)  # precision
    La = jnp.linalg.cholesky(jnp.asarray(P))
    C = spd_inverse(jnp.asarray(P))
    m = rng.standard_normal(n).astype(np.float32)
    y = rng.standard_normal(n).astype(np.float32)
    got = dss_precision(jnp.asarray(m), La, jnp.asarray(y))
    want = dss(jnp.asarray(m), C, jnp.asarray(y))
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)


@pytest.mark.slow
def test_energy_score_precision_statistically_matches_cov_form(rng):
    """Same Gaussian sampled through precision vs covariance factors: MC
    estimates agree within sampling error."""
    from gpscore.ops.linalg import spd_inverse
    from gpscore.scoring.rules import energy_score_precision

    n = 4
    A = rng.standard_normal((n, n))
    P = (A @ A.T + n * np.eye(n)).astype(np.float32)
    La = jnp.linalg.cholesky(jnp.asarray(P))
    C = spd_inverse(jnp.asarray(P))
    m = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    got = float(
        energy_score_precision(jax.random.PRNGKey(3), m, La, y, num_sim=4000)
    )
    want = float(energy_score(jax.random.PRNGKey(4), m, C, y, num_sim=4000))
    np.testing.assert_allclose(got, want, rtol=5e-2)


def test_energy_score_precision_gradient_finite(rng):
    from gpscore.scoring.rules import energy_score_precision

    n = 6
    A = rng.standard_normal((n, n))
    P = (A @ A.T + n * np.eye(n)).astype(np.float32)
    m = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def f(scale):
        La = jnp.linalg.cholesky(scale * jnp.asarray(P))
        return energy_score_precision(jax.random.PRNGKey(0), m, La, y, num_sim=64)

    g = jax.grad(f)(1.0)
    assert np.isfinite(float(g))


def test_energy_score_eigh_mode_matches_chol_statistically(rng):
    """sqrt_method='eigh' (the reference's symmetric-sqrt sampler) agrees with
    the default Cholesky sampler within MC error."""
    n = 4
    A = rng.standard_normal((n, n))
    C = jnp.asarray((A @ A.T / n + np.eye(n)).astype(np.float32))
    m = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    a = float(energy_score(jax.random.PRNGKey(0), m, C, y, num_sim=4000))
    b = float(energy_score(jax.random.PRNGKey(1), m, C, y, num_sim=4000,
                           sqrt_method="eigh"))
    np.testing.assert_allclose(a, b, rtol=5e-2)


def test_energy_score_rejects_bad_sqrt_method(rng):
    C = jnp.eye(3)
    with pytest.raises(ValueError, match="sqrt_method"):
        energy_score(jax.random.PRNGKey(0), jnp.zeros(3), C, jnp.zeros(3),
                     num_sim=8, sqrt_method="cholesky")
