"""CRPS-as-area illustration data (replaces `crps-plot.R`).

The R script draws the paper's explanatory figure: CRPS is the integral of
(F(t) - H(t - y))^2 between the forecast CDF F and the Heaviside CDF of the
observation, for a probabilistic N(mu, sigma^2) forecast vs a deterministic one
(`crps-plot.R:3-36`). This module produces the curve data as arrays (plotting of
all analysis figures lives in gpscore.analysis.plots, so the math stays
matplotlib-free and jit-able).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

_SQRT2 = math.sqrt(2.0)


def _norm_cdf(t, mu, sigma):
    return 0.5 * (1.0 + jax.lax.erf((t - mu) / (sigma * _SQRT2)))


class CRPSCurves(NamedTuple):
    t: jnp.ndarray  # evaluation grid
    forecast_cdf: jnp.ndarray  # F(t) of the probabilistic forecast
    deterministic_cdf: jnp.ndarray  # step CDF of a point forecast at mu
    obs_cdf: jnp.ndarray  # Heaviside H(t - y) of the observation
    integrand: jnp.ndarray  # (F - H)^2, whose area is the CRPS
    crps_numeric: jnp.ndarray  # trapezoidal integral of the integrand


def crps_illustration(
    mu: float = 0.0,
    sigma: float = 1.0,
    y: float = 1.0,
    t_lo: float = -4.0,
    t_hi: float = 4.0,
    num: int = 801,
) -> CRPSCurves:
    """Curves for the CRPS area figure (`crps-plot.R:3-36` draws exactly these:
    forecast CDF, observation Heaviside, and the shaded squared difference)."""
    t = jnp.linspace(t_lo, t_hi, num)
    F = _norm_cdf(t, mu, sigma)
    det = (t >= mu).astype(jnp.float32)
    H = (t >= y).astype(jnp.float32)
    integrand = (F - H) ** 2
    crps = jnp.trapezoid(integrand, t)
    return CRPSCurves(t, F, det, H, integrand, crps)
