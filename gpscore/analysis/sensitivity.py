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
    """Equicorrelated covariance (R ``replace_corr``, `relative-change-NEW.R:63-75`).

    With ``scale=k`` this is also R's ``replace_diag(k)`` (`:50-62`): diagonal
    ``k``, off-diagonal ``rho * k``.
    """
    eye = jnp.eye(dim, dtype=jnp.float32)
    return scale * (eye + rho * (1.0 - eye))


def _equicorr_data(key, rho, num_data: int, dim: int, scale: float = 1.0):
    """num_data draws from N(0, equicorr(rho) * scale) via the Cholesky factor."""
    L = jnp.linalg.cholesky(_equicorr_cov(rho, dim, scale))
    return jax.random.normal(key, (num_data, dim), jnp.float32) @ L.T


def _es_r_style(key, mean_vec, cov, y, num_sim: int = 100, beta: float = 1.0):
    """Monte-Carlo energy score with the R script's distance kernel.

    `relative-change-NEW.R:32-49` measures sample distances as
    ``sum_d |x1_d - x2_d|^beta`` (component-wise power, then sum) — at beta=1
    the L1 distance — unlike the Python reference's Euclidean ``||.||^beta``
    (`kin40k-FULL-compare.py:86-97`, reproduced by
    :func:`gpscore.scoring.rules.energy_score`). Both are proper (the |.|^beta
    kernel is conditionally negative definite for beta in (0,2]); this variant
    exists solely to reproduce the R sensitivity curves. Normalization follows
    the R script exactly: first term mean over n draws, second term mean over
    the full n x n pair matrix (`:45-47`).
    """
    L = jnp.linalg.cholesky(cov)
    k1, k2 = jax.random.split(key)
    x1 = mean_vec + jax.random.normal(k1, (num_sim, cov.shape[0]), jnp.float32) @ L.T
    x2 = mean_vec + jax.random.normal(k2, (num_sim, cov.shape[0]), jnp.float32) @ L.T
    first = jnp.mean(jnp.sum(jnp.abs(x1 - y[None, :]) ** beta, axis=1))
    pair = jnp.sum(jnp.abs(x1[:, None, :] - x2[None, :, :]) ** beta, axis=2)
    return first - 0.5 * jnp.mean(pair)


def dss_mean_error_curve(
    key, pre_mu, rho: float = 0.5, num_data: int = 500, dim: int = 2,
    true_sigma_sq: float = 1.0,
):
    """Relative change in mean DSS as the predictive mean sweeps pre_mu
    (`relative-change-NEW.R:105-115`): data ~ N(0, replace_diag(sigma_sq)),
    score -log dmvnorm(data_j; mu 1, replace_diag(sigma_sq)), normalized by the
    truth at mu=0."""
    C = _equicorr_cov(rho, dim, true_sigma_sq)
    data = _equicorr_data(key, rho, num_data, dim, true_sigma_sq)

    def mean_dss(mu):
        m = jnp.full((dim,), mu, jnp.float32)
        return jnp.mean(jax.vmap(lambda d: dss(m, C, d))(data))

    truth = mean_dss(0.0)
    return jax.vmap(lambda m: (mean_dss(m) - truth) / truth)(pre_mu)


def dss_var_error_curve(
    key, pre_sigma_sq, rho: float = 0.5, num_data: int = 500, dim: int = 2,
    true_sigma_sq: float = 1.0,
):
    """Relative change in mean DSS as the predictive variance sweeps
    pre_sigma_sq with correlation held at rho (`relative-change-NEW.R:118-128`:
    covariance replace_diag(k) = k * equicorr(rho)), normalized by the truth at
    k = true_sigma_sq."""
    data = _equicorr_data(key, rho, num_data, dim, true_sigma_sq)
    zero = jnp.zeros((dim,), jnp.float32)

    def mean_dss(k):
        C = _equicorr_cov(rho, dim, k)
        return jnp.mean(jax.vmap(lambda d: dss(zero, C, d))(data))

    truth = mean_dss(true_sigma_sq)
    return jax.vmap(lambda k: (mean_dss(k) - truth) / truth)(pre_sigma_sq)


def es_mean_error_curve(
    key, pre_mu, rho: float = 0.5, num_data: int = 500, dim: int = 2,
    num_sim: int = 100, true_sigma_sq: float = 1.0,
):
    """Relative change in mean energy score vs predictive mean error
    (`relative-change-NEW.R:165-175`), R-style L1 distance kernel, common
    random numbers across the sweep (one key per datum reused for every mu —
    the R script redraws per call; CRN removes that MC jitter from the curve
    without changing its expectation)."""
    k_data, k_es = jax.random.split(key)
    C = _equicorr_cov(rho, dim, true_sigma_sq)
    data = _equicorr_data(k_data, rho, num_data, dim, true_sigma_sq)
    keys = jax.random.split(k_es, num_data)

    def mean_es(mu):
        m = jnp.full((dim,), mu, jnp.float32)
        return jnp.mean(
            jax.vmap(lambda k, d: _es_r_style(k, m, C, d, num_sim))(keys, data)
        )

    truth = mean_es(0.0)
    return jax.vmap(lambda m: (mean_es(m) - truth) / truth)(pre_mu)


def es_var_error_curve(
    key, pre_sigma_sq, rho: float = 0.5, num_data: int = 500, dim: int = 2,
    num_sim: int = 100, true_sigma_sq: float = 1.0,
):
    """Relative change in mean energy score vs predictive variance error
    (`relative-change-NEW.R:178-188`), covariance replace_diag(k)."""
    k_data, k_es = jax.random.split(key)
    data = _equicorr_data(k_data, rho, num_data, dim, true_sigma_sq)
    zero = jnp.zeros((dim,), jnp.float32)
    keys = jax.random.split(k_es, num_data)

    def mean_es(k):
        C = _equicorr_cov(rho, dim, k)
        return jnp.mean(
            jax.vmap(lambda kk, d: _es_r_style(kk, zero, C, d, num_sim))(keys, data)
        )

    truth = mean_es(true_sigma_sq)
    return jax.vmap(lambda k: (mean_es(k) - truth) / truth)(pre_sigma_sq)


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


def dss_correlation_family(
    key, true_rhos, rho_range, num_data: int = 500, dim: int = 2
):
    """Family of DSS correlation-sensitivity curves, one per true correlation
    (`relative-change-NEW.R:137-144`: res_corr rows over true_corr = 0.2..0.8,
    fresh data drawn at each truth). Returns [len(true_rhos), len(rho_range)]."""
    return jnp.stack([
        dss_correlation_curve(
            jax.random.fold_in(key, i), r, rho_range, num_data=num_data, dim=dim
        )
        for i, r in enumerate(true_rhos)
    ])


def es_correlation_family(
    key, true_rhos, rho_range, num_data: int = 200, dim: int = 2,
    num_sim: int = 100,
):
    """Family of energy-score correlation-sensitivity curves per true
    correlation (`relative-change-NEW.R:196-203`).
    Returns [len(true_rhos), len(rho_range)]."""
    return jnp.stack([
        es_correlation_curve(
            jax.random.fold_in(key, i), r, rho_range,
            num_data=num_data, dim=dim, num_sim=num_sim,
        )
        for i, r in enumerate(true_rhos)
    ])
