"""Reproduce the reference's analysis/figure suite as PNGs.

Covers the three R scripts and the Python scripts' matplotlib tails (SURVEY.md §2.8, §1 L8):

- objective-surface contours (NLML / LOO-CRPS / LOO-logs / "wrong" non-LOO CRPS)
  over a (lengthscale, noise-sd) grid with the generating truth marked
  (`contour-plot.R:88-144`), evaluated as one vmapped XLA program per rule;
- CRPS-as-area illustration (`crps-plot.R:3-36`);
- scoring-rule sensitivity curves vs mean / variance / correlation error
  (`relative-change-NEW.R:80-214`);
- predictive interval plot + inducing-migration plot from a quick FITC fit
  (`SIMPLE-FITC--comapre.py:546-622`).

Usage: python experiments/analysis_figures.py [--outdir figures] [--grid 50]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gpscore.analysis import (
    crps_illustration,
    crps_mean_error_curve,
    crps_var_error_curve,
    dss_correlation_family,
    dss_mean_error_curve,
    dss_var_error_curve,
    es_correlation_family,
    es_mean_error_curve,
    es_var_error_curve,
    logs_mean_error_curve,
    logs_var_error_curve,
    objective_surface,
)
from gpscore.analysis import plots
from gpscore.data import sample_synthetic_1d
from gpscore.fit import fit_gd, make_objective
from gpscore.models.fitc import fitc_predictive
from gpscore.utils.params import init_unit_params


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="figures")
    ap.add_argument("--grid", type=int, default=50, help="contour grid resolution")
    ap.add_argument("--n-contour", type=int, default=20,
                    help="synthetic points for the surfaces (contour-plot.R uses 20)")
    args = ap.parse_args(argv)
    os.makedirs(args.outdir, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # --- contour surfaces (contour-plot.R) ---
    d20 = sample_synthetic_1d(
        jax.random.PRNGKey(42), num_train=args.n_contour, num_test=8, num_va=8
    )
    ls = jnp.linspace(0.2, 4.0, args.grid)
    ns = jnp.linspace(0.05, 1.5, args.grid)
    fig, axes = plt.subplots(2, 2, figsize=(10, 8))
    for ax, rule, title in zip(
        axes.ravel(),
        ["nlml", "crps", "logs", "wrong_crps"],
        ["NLML", "LOO-CRPS", "LOO-logs", '"wrong" (in-sample) CRPS'],
    ):
        Z = objective_surface(d20.train_x, d20.train_y, ls, ns, rule=rule)
        plots.contour_plot(ax, ls, ns, Z, truth=(1.0, 0.3), title=title)
    plots.save_figure(fig, os.path.join(args.outdir, "objective_surfaces.png"))
    plt.close(fig)
    print("wrote objective_surfaces.png")

    # --- CRPS area illustration (crps-plot.R) ---
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    plots.crps_area_plot(axes[0], crps_illustration(sigma=1.0),
                         title="probabilistic forecast")
    plots.crps_area_plot(axes[1], crps_illustration(sigma=0.05),
                         title="(near-)deterministic forecast")
    plots.save_figure(fig, os.path.join(args.outdir, "crps_illustration.png"))
    plt.close(fig)
    print("wrote crps_illustration.png")

    # --- sensitivity curves (relative-change-NEW.R, all 12 curves) ---
    # R sweep grids verbatim (`relative-change-NEW.R:6-17`): pre_mu -5..5 by .5,
    # pre_sigma_sq = (.05..1 by .1, 1..10 by 1), true_corr .2..0.8 by .2,
    # range_corr 0..0.9 by .1; x axes are the normalized errors (`:10-11`).
    key = jax.random.PRNGKey(0)
    pre_mu = jnp.linspace(-5.0, 5.0, 21)
    pre_var = jnp.concatenate([
        jnp.arange(0.05, 1.05, 0.1), jnp.arange(1.0, 10.5, 1.0)
    ]).astype(jnp.float32)
    norm_mean_err = -pre_mu          # (true_mu - pre_mu) / true_sigma_sq
    norm_var_err = 1.0 - pre_var     # (true_sigma_sq - pre_sigma_sq) / true_sigma_sq
    true_rhos = [0.2, 0.4, 0.6, 0.8]
    range_corr = jnp.arange(0.0, 0.95, 0.1)

    fig, axes = plt.subplots(3, 3, figsize=(15, 11), constrained_layout=True)
    plots.sensitivity_plot(
        axes[0, 0], norm_mean_err,
        {"CRPS": crps_mean_error_curve(key, pre_mu),
         "log score": logs_mean_error_curve(key, pre_mu)},
        xlabel="normalized mean error", title="CRPS / log score: mean error")
    plots.sensitivity_plot(
        axes[0, 1], norm_mean_err,
        {"DSS": dss_mean_error_curve(key, pre_mu)},
        xlabel="normalized mean error", title="DSS: mean error")
    plots.sensitivity_plot(
        axes[0, 2], norm_mean_err,
        {"ES": es_mean_error_curve(key, pre_mu)},
        xlabel="normalized mean error", title="ES: mean error")
    plots.sensitivity_plot(
        axes[1, 0], norm_var_err,
        {"CRPS": crps_var_error_curve(key, pre_var),
         "log score": logs_var_error_curve(key, pre_var)},
        xlabel="normalized variance error", title="CRPS / log score: variance error")
    plots.sensitivity_plot(
        axes[1, 1], norm_var_err,
        {"DSS": dss_var_error_curve(key, pre_var)},
        xlabel="normalized variance error", title="DSS: variance error")
    # R plots ES only for pre_sigma_sq >= 0.55 (`relative-change-NEW.R:186-187`
    # slices [6:]) where the MC estimate is stable; reproduce that window.
    es_var = es_var_error_curve(key, pre_var)
    plots.sensitivity_plot(
        axes[1, 2], norm_var_err[5:],
        {"ES": es_var[5:]},
        xlabel="normalized variance error", title="ES: variance error")
    dss_fam = dss_correlation_family(key, true_rhos, range_corr)
    plots.sensitivity_plot(
        axes[2, 0], range_corr,
        {f"rho = {r}": dss_fam[i] for i, r in enumerate(true_rhos)},
        xlabel="predictive correlation", title="DSS: correlation error")
    es_fam = es_correlation_family(key, true_rhos, range_corr, num_sim=64)
    plots.sensitivity_plot(
        axes[2, 1], range_corr,
        {f"rho = {r}": es_fam[i] for i, r in enumerate(true_rhos)},
        xlabel="predictive correlation", title="ES: correlation error")
    axes[2, 2].axis("off")
    plots.save_figure(fig, os.path.join(args.outdir, "sensitivity_curves.png"))
    plt.close(fig)
    print("wrote sensitivity_curves.png")

    # --- interval + inducing-migration figures from a quick FITC fit ---
    d = sample_synthetic_1d(jax.random.PRNGKey(1))
    u0 = jnp.linspace(-3.0, 3.0, 5).reshape(5, 1)
    p0 = init_unit_params(d=1, isotropic=False, inducing=u0)
    loss = make_objective("crps", model="fitc")
    res = fit_gd(loss, p0, d.train_x, d.train_y, iters=200, lr=1.0)
    pred = fitc_predictive(d.train_x, d.train_y, d.test_x, res.params)
    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    plots.interval_plot(
        axes[0], d.test_x, pred.mean, jnp.diagonal(pred.cov),
        d.train_x, d.train_y, d.test_y, title="FITC CRPS-LOO predictive")
    plots.inducing_migration_plot(axes[1], u0, res.params.inducing)
    plots.save_figure(fig, os.path.join(args.outdir, "fitc_fit.png"))
    plt.close(fig)
    print("wrote fitc_fit.png")


if __name__ == "__main__":
    main()
