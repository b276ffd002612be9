"""Scoring-rule sensitivity curves (replaces `relative-change-NEW.R`).

The R script studies how CRPS / log score / DSS / ES respond to normalized mean
error, variance error, and (for the multivariate rules) predictive-correlation
misspecification (`relative-change-NEW.R:80-214`). Here the Monte-Carlo estimates
are vmapped over the sweep values with explicit PRNG keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpscore.scoring.rules import crps_gaussian, dss, energy_score, logs_gaussian


def _mc_targets(key, n: int = 10_000):
    return jax.random.normal(key, (n,), jnp.float32)


def crps_mean_error_curve(key, pre_mu, n: int = 10_000):
    """Mean CRPS of N(mu, 1) forecasts against y ~ N(0,1), swept over mu
    (`relative-change-NEW.R:81`)."""
    y = _mc_targets(key, n)
    ones = jnp.ones_like(y)
    return jax.vmap(lambda m: crps_gaussian(m * ones, ones, y))(pre_mu)


def crps_var_error_curve(key, pre_sigma_sq, n: int = 10_000):
    y = _mc_targets(key, n)
    ones = jnp.ones_like(y)
    return jax.vmap(lambda v: crps_gaussian(0.0 * ones, v * ones, y))(pre_sigma_sq)


def logs_mean_error_curve(key, pre_mu, n: int = 10_000):
    y = _mc_targets(key, n)
    ones = jnp.ones_like(y)
    return jax.vmap(lambda m: logs_gaussian(m * ones, ones, y))(pre_mu)


def logs_var_error_curve(key, pre_sigma_sq, n: int = 10_000):
    y = _mc_targets(key, n)
    ones = jnp.ones_like(y)
    return jax.vmap(lambda v: logs_gaussian(0.0 * ones, v * ones, y))(pre_sigma_sq)


def _equicorr_cov(rho, dim: int = 2, scale: float = 1.0):
    """Equicorrelated covariance (R ``replace_corr``, `relative-change-NEW.R:63-75`)."""
    eye = jnp.eye(dim, dtype=jnp.float32)
    return scale * (eye + rho * (1.0 - eye))


def dss_correlation_curve(key, true_rho, rho_range, num_data: int = 500, dim: int = 2):
    """Relative change in mean DSS as the predictive correlation sweeps rho_range,
    for bivariate data generated at true_rho (`relative-change-NEW.R:131-144`)."""
    C_true = _equicorr_cov(true_rho, dim)
    L = jnp.linalg.cholesky(C_true)
    data = jax.random.normal(key, (num_data, dim), jnp.float32) @ L.T

    def mean_dss(rho):
        C = _equicorr_cov(rho, dim)
        return jnp.mean(
            jax.vmap(lambda d: dss(jnp.zeros(dim, jnp.float32), C, d))(data)
        )

    truth = mean_dss(true_rho)
    return jax.vmap(lambda r: (mean_dss(r) - truth) / truth)(rho_range)


def es_correlation_curve(
    key,
    true_rho,
    rho_range,
    num_data: int = 200,
    dim: int = 2,
    num_sim: int = 100,
):
    """Relative change in mean energy score vs predictive correlation
    (`relative-change-NEW.R:190-203`), with explicit keys."""
    k_data, k_es = jax.random.split(key)
    C_true = _equicorr_cov(true_rho, dim)
    L = jnp.linalg.cholesky(C_true)
    data = jax.random.normal(k_data, (num_data, dim), jnp.float32) @ L.T

    def mean_es(rho):
        C = _equicorr_cov(rho, dim)
        keys = jax.random.split(k_es, num_data)
        scores = jax.vmap(
            lambda k, d: energy_score(
                k, jnp.zeros(dim, jnp.float32), C, d, num_sim=num_sim
            )
        )(keys, data)
        return jnp.mean(scores)

    truth = mean_es(true_rho)
    return jax.vmap(lambda r: (mean_es(r) - truth) / truth)(rho_range)
