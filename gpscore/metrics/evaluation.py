"""Test-set evaluation metric suite (reference L6; SURVEY.md §2.6).

Each (objective x replicate) in the reference records six numbers
(`kin40k-FULL-compare.py:276-292`): MSE, SMSE, test log score, test CRPS, MSLL and
95% central coverage. :func:`evaluate_predictive` computes all six in one call from
a diagonal predictive.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gpscore.scoring.rules import crps_gaussian, logs_gaussian


class EvalMetrics(NamedTuple):
    mse: jnp.ndarray
    smse: jnp.ndarray
    logs: jnp.ndarray
    crps: jnp.ndarray
    msll: jnp.ndarray
    coverage95: jnp.ndarray


def mse(mean, y):
    """`kin40k-FULL-compare.py:276`."""
    return jnp.mean((jnp.ravel(mean) - jnp.ravel(y)) ** 2)


def smse(mean, y, y_train):
    """Standardized MSE: MSE / MSE of the train-mean predictor
    (reference `SMSE`, `SIMPLE-DATA FULL-comapre.py:113-119`)."""
    trivial = jnp.mean((jnp.mean(y_train) - jnp.ravel(y)) ** 2)
    return mse(mean, y) / trivial


def msll(mean, var, y, y_train):
    """Mean standardized log loss: mean log score minus the log score of the
    trivial N(mean(y_train), var(y_train)) predictor (reference ``trivial_loss``,
    `SIMPLE-DATA FULL-comapre.py:94-103`; torch ``.var()`` is the unbiased /
    ddof=1 variance, reproduced here)."""
    mean, var, y = jnp.ravel(mean), jnp.ravel(var), jnp.ravel(y)
    y_train = jnp.ravel(y_train)
    m0 = jnp.mean(y_train)
    v0 = jnp.var(y_train, ddof=1)
    per_site = (y - mean) ** 2 / (2.0 * var) + 0.5 * jnp.log(var) + 0.5 * jnp.log(
        2.0 * jnp.pi
    )
    trivial = 0.5 * jnp.log(2.0 * jnp.pi * v0) + (y - m0) ** 2 / (2.0 * v0)
    return jnp.mean(per_site - trivial)


def coverage95(mean, var, y):
    """Fraction of test targets inside mu +/- 2 sigma (reference "res",
    `kin40k-FULL-compare.py:288-292`)."""
    mean, var, y = jnp.ravel(mean), jnp.ravel(var), jnp.ravel(y)
    sd = jnp.sqrt(var)
    inside = (y < mean + 2.0 * sd) & (y > mean - 2.0 * sd)
    return jnp.mean(inside.astype(mean.dtype))


def evaluate_predictive(mean, var, y, y_train) -> EvalMetrics:
    """All six reference metrics from a diagonal predictive."""
    return EvalMetrics(
        mse=mse(mean, y),
        smse=smse(mean, y, y_train),
        logs=logs_gaussian(mean, var, y),
        crps=crps_gaussian(mean, var, y),
        msll=msll(mean, var, y, y_train),
        coverage95=coverage95(mean, var, y),
    )
