"""Objective surfaces over hyperparameter grids (replaces `contour-plot.R`).

The R script evaluates NLML / LOO-CRPS / LOO-logs / "wrong" (in-sample) CRPS on a
50x50 (lengthscale, noise-sd) grid with nested sapply/mapply loops
(`contour-plot.R:88-134`). Here one vmap-of-vmap evaluates the full grid as a
single XLA program.

Conventions follow the R script: the isotropic kernel takes the *lengthscale* l
(squared inside), the grid's second coordinate is the noise *standard deviation* j
(variance j^2, `contour-plot.R:45`), and ``cal_m_logs`` adds the noise variance to
the LOO predictive variance (`contour-plot.R:81`) — a documented inconsistency with
the Python scripts' logs path, reproduced here behind ``logs_noise_in_var=True``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpscore.models.exact import exact_predictive, loo_exact
from gpscore.ops.kernels import rbf_gram
from gpscore.models.exact import nlml_exact
from gpscore.scoring.rules import crps_gaussian, logs_gaussian


def wrong_crps_objective(x, y, lengthscale, noise_sd):
    """The negative control: CRPS of the **in-sample** posterior (not LOO), the
    degenerate objective of `contour-plot.R:55-64`. Demonstrates why LOO is
    required (its surface has no interior minimum in noise)."""
    k_ff = rbf_gram(x, x, 0.0, 2.0 * jnp.log(lengthscale))
    noise_sq = noise_sd**2
    pred = exact_predictive(k_ff, k_ff, k_ff, y, noise_sq)
    return crps_gaussian(pred.mean, jnp.diagonal(pred.cov), y)


def _grid_objective(x, y, lengthscale, noise_sd, rule: str, logs_noise_in_var: bool):
    k_ff = rbf_gram(x, x, 0.0, 2.0 * jnp.log(lengthscale))
    noise_sq = noise_sd**2
    if rule == "nlml":
        return nlml_exact(k_ff, y, noise_sq)
    if rule == "wrong_crps":
        return wrong_crps_objective(x, y, lengthscale, noise_sd)
    p = loo_exact(k_ff, y, noise_sq)
    var = p.cov + (noise_sq if logs_noise_in_var and rule == "logs" else 0.0)
    if rule == "crps":
        return crps_gaussian(p.mean, var, y)
    if rule == "logs":
        return logs_gaussian(p.mean, var, y)
    raise ValueError(f"unknown rule {rule!r}")


def objective_surface(
    x,
    y,
    lengthscales,
    noise_sds,
    rule: str = "crps",
    logs_noise_in_var: bool = True,
):
    """Evaluate ``rule`` on the full (lengthscale x noise-sd) grid in one vmapped
    program. Returns [len(lengthscales), len(noise_sds)]."""
    f = lambda l, s: _grid_objective(x, y, l, s, rule, logs_noise_in_var)
    grid = jax.vmap(lambda l: jax.vmap(lambda s: f(l, s))(noise_sds))(lengthscales)
    return grid
