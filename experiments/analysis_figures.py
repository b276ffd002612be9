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
    dss_correlation_curve,
    es_correlation_curve,
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

    # --- sensitivity curves (relative-change-NEW.R) ---
    key = jax.random.PRNGKey(0)
    mus = jnp.linspace(-2.0, 2.0, 41)
    vs = jnp.linspace(0.25, 4.0, 41)
    rhos = jnp.linspace(-0.8, 0.95, 36)
    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    plots.sensitivity_plot(
        axes[0], mus,
        {"CRPS": crps_mean_error_curve(key, mus),
         "log score": logs_mean_error_curve(key, mus)},
        xlabel="mean error", title="sensitivity to mean error")
    plots.sensitivity_plot(
        axes[1], vs,
        {"CRPS": crps_var_error_curve(key, vs),
         "log score": logs_var_error_curve(key, vs)},
        xlabel="predictive variance (truth 1.0)", title="sensitivity to variance error")
    plots.sensitivity_plot(
        axes[2], rhos,
        {"DSS": dss_correlation_curve(key, 0.5, rhos),
         "ES": es_correlation_curve(key, 0.5, rhos, num_data=100, num_sim=64)},
        xlabel="predictive correlation (truth 0.5)",
        title="sensitivity to correlation error")
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
