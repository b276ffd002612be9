"""fp64 NumPy/SciPy oracle implementations of the reference formulas.

Written independently from the math in SURVEY.md §2.3/§2.4 (reference file:line in
each docstring) — NOT copied from either the reference or the library — so that
library-vs-oracle agreement is meaningful two-sided evidence (SURVEY.md §4: parity
targets 1e-6 posterior moments, 1e-4 scores, relative to the fp64 truth).
"""

from __future__ import annotations

import math

import numpy as np
from scipy.linalg import cho_factor, cho_solve
from scipy.stats import norm


# ---- kernels -------------------------------------------------------------


def rbf_gram(x, xp, log_signal_sq, log_length_sq):
    """Isotropic RBF, exp(log_length_sq) = squared lengthscale
    (reference `rbf`, `SIMPLE-DATA FULL-comapre.py:8-21`)."""
    x = np.asarray(x, np.float64)
    xp = np.asarray(xp, np.float64)
    d2 = ((x[:, None, :] - xp[None, :, :]) ** 2).sum(-1)
    return math.exp(log_signal_sq) * np.exp(-0.5 * d2 / math.exp(log_length_sq))


def ard_gram(x, xp, log_signal_sq, log_length):
    """ARD RBF, exp(log_length) = per-dim lengthscale (reference `ARD`,
    `SIMPLE-DATA FULL-comapre.py:24-40`)."""
    x = np.asarray(x, np.float64) / np.exp(np.asarray(log_length, np.float64))
    xp = np.asarray(xp, np.float64) / np.exp(np.asarray(log_length, np.float64))
    d2 = ((x[:, None, :] - xp[None, :, :]) ** 2).sum(-1)
    return math.exp(float(log_signal_sq)) * np.exp(-0.5 * d2)


# ---- posteriors ----------------------------------------------------------


def exact_predictive(k_star_f, k_ff, k_ss, y, noise_sq):
    """`cal_mean_and_cov`, `SIMPLE-DATA FULL-comapre.py:106-111`."""
    n = k_ff.shape[0]
    K_hat = k_ff + noise_sq * np.eye(n)
    cf = cho_factor(K_hat, lower=True)
    mean = k_star_f @ cho_solve(cf, y.reshape(n))
    cov = (
        noise_sq * np.eye(k_ss.shape[0])
        + k_ss
        - k_star_f @ cho_solve(cf, k_star_f.T)
    )
    return mean, cov


def loo_brute_force(k_ff, y, noise_sq):
    """LOO by literally refitting on n-1 points per site — the strongest
    independent check of the K^-1-diagonal identities the reference uses
    (`SIMPLE-DATA FULL-comapre.py:207-211`)."""
    n = k_ff.shape[0]
    y = y.reshape(n)
    means = np.zeros(n)
    variances = np.zeros(n)
    for i in range(n):
        idx = np.r_[0:i, i + 1 : n]
        K = k_ff[np.ix_(idx, idx)] + noise_sq * np.eye(n - 1)
        k_i = k_ff[i, idx]
        cf = cho_factor(K, lower=True)
        means[i] = k_i @ cho_solve(cf, y[idx])
        variances[i] = noise_sq + k_ff[i, i] - k_i @ cho_solve(cf, k_i)
    return means, variances


def loo_identity(k_ff, y, noise_sq):
    """LOO via the inverse-diagonal identity, fp64."""
    n = k_ff.shape[0]
    K_hat = k_ff + noise_sq * np.eye(n)
    Kinv = np.linalg.inv(K_hat)
    d = np.diag(Kinv)
    mean = y.reshape(n) - (Kinv @ y.reshape(n)) / d
    return mean, 1.0 / d


def kfold_conditionals(k_ff, y, noise_sq, fold_k):
    """Block conditionals from K_hat^-1 (`kin40k-FULL-compare.py:500-530`)."""
    n = k_ff.shape[0]
    nb = n // fold_k
    y = y.reshape(n)
    Kinv = np.linalg.inv(k_ff + noise_sq * np.eye(n))
    Kinv_y = Kinv @ y
    means, covs = [], []
    for b in range(fold_k):
        sl = slice(b * nb, (b + 1) * nb)
        A = Kinv[sl, sl]
        Ainv = np.linalg.inv(A)
        means.append(y[sl] - Ainv @ Kinv_y[sl])
        covs.append(Ainv)
    return np.stack(means), np.stack(covs)


def fitc_cov_dense(x, u, log_signal_sq, log_length, noise_sq, kuu_jitter=1e-3):
    """B = Q_ff + G densely (`KIN40K-COMPARE-ALL-FITC-20.py:223-229`)."""
    K_ff = ard_gram(x, x, log_signal_sq, log_length)
    K_uu = ard_gram(u, u, log_signal_sq, log_length) + kuu_jitter * np.eye(u.shape[0])
    K_fu = ard_gram(x, u, log_signal_sq, log_length)
    Q_ff = K_fu @ np.linalg.solve(K_uu, K_fu.T)
    G = np.diag(np.diag(K_ff - Q_ff) + noise_sq)
    return Q_ff + G


def fitc_predictive(x, u, x_star, y, log_signal_sq, log_length, noise_sq):
    """`spgp_cal_mean_and_cov`, `SIMPLE-FITC--comapre.py:59-66`."""
    n = x.shape[0]
    B = fitc_cov_dense(x, u, log_signal_sq, log_length, noise_sq)
    K_uu = ard_gram(u, u, log_signal_sq, log_length) + 1e-3 * np.eye(u.shape[0])
    K_su = ard_gram(x_star, u, log_signal_sq, log_length)
    K_uf = ard_gram(u, x, log_signal_sq, log_length)
    Q_sf = K_su @ np.linalg.solve(K_uu, K_uf)
    K_ss = ard_gram(x_star, x_star, log_signal_sq, log_length)
    cf = cho_factor(B, lower=True)
    mean = Q_sf @ cho_solve(cf, y.reshape(n))
    cov = noise_sq * np.eye(x_star.shape[0]) + K_ss - Q_sf @ cho_solve(cf, Q_sf.T)
    return mean, cov


def nlml(k_ff, y, noise_sq):
    """`SIMPLE-DATA FULL-comapre.py:292-296`."""
    n = k_ff.shape[0]
    K_hat = k_ff + noise_sq * np.eye(n)
    L = np.linalg.cholesky(K_hat)
    half_logdet = np.sum(np.log(np.diag(L)))
    cf = cho_factor(K_hat, lower=True)
    quad = 0.5 * y.reshape(n) @ cho_solve(cf, y.reshape(n))
    return 0.5 * n * math.log(2 * math.pi) + half_logdet + quad


# ---- scoring rules -------------------------------------------------------


def crps_gaussian(mean, var, y):
    """`crps`, `SIMPLE-DATA FULL-comapre.py:76-84`."""
    mean = np.asarray(mean, np.float64).ravel()
    var = np.asarray(var, np.float64).ravel()
    y = np.asarray(y, np.float64).ravel()
    sigma = np.sqrt(var)
    z = (y - mean) / sigma
    return np.mean(
        sigma * (z * (2 * norm.cdf(z) - 1) + 2 * norm.pdf(z) - 1 / math.sqrt(math.pi))
    )


def crps_numeric(mean, var, y, grid_half_width=40.0, num=400_001):
    """CRPS by numerically integrating (F(t) - 1{t >= y})^2 dt — formula-independent
    cross-check of the closed form."""
    sigma = math.sqrt(var)
    t = np.linspace(
        mean - grid_half_width * sigma, mean + grid_half_width * sigma, num
    )
    F = norm.cdf((t - mean) / sigma)
    H = (t >= y).astype(np.float64)
    return np.trapezoid((F - H) ** 2, t)


def logs_gaussian(mean, var, y):
    mean = np.asarray(mean, np.float64).ravel()
    var = np.asarray(var, np.float64).ravel()
    y = np.asarray(y, np.float64).ravel()
    return np.mean(-norm.logpdf(y, loc=mean, scale=np.sqrt(var)))


def dss(mean, cov, y):
    """`dss`, `SIMPLE-DATA FULL-comapre.py:87-92` == multivariate Gaussian NLPD."""
    from scipy.stats import multivariate_normal

    return -multivariate_normal.logpdf(
        np.asarray(y, np.float64).ravel(), mean=np.asarray(mean, np.float64).ravel(),
        cov=np.asarray(cov, np.float64),
    )


def msll(mean, var, y, y_train):
    mean, var, y = (np.asarray(a, np.float64).ravel() for a in (mean, var, y))
    y_train = np.asarray(y_train, np.float64).ravel()
    m0, v0 = y_train.mean(), y_train.var(ddof=1)
    per = -norm.logpdf(y, mean, np.sqrt(var))
    triv = -norm.logpdf(y, m0, math.sqrt(v0))
    return np.mean(per - triv)
