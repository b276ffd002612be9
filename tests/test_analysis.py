"""Analysis suite: objective surfaces, sensitivity curves, CRPS illustration, plots."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpscore.analysis import (
    crps_illustration,
    crps_mean_error_curve,
    dss_correlation_curve,
    dss_correlation_family,
    dss_mean_error_curve,
    dss_var_error_curve,
    es_correlation_family,
    es_correlation_curve,
    es_mean_error_curve,
    es_var_error_curve,
    objective_surface,
)
from gpscore.data import sample_synthetic_1d

pytestmark = pytest.mark.slow  # statistical minima checks over parameter sweeps


@pytest.fixture(scope="module")
def small():
    # contour-plot.R uses 20 synthetic points (`:33`)
    return sample_synthetic_1d(jax.random.PRNGKey(7), num_train=20, num_test=4, num_va=4)


@pytest.mark.parametrize("rule", ["crps", "logs", "nlml", "wrong_crps"])
def test_surface_finite_grid(small, rule):
    ls = jnp.linspace(0.3, 3.0, 6)
    ns = jnp.linspace(0.1, 1.0, 5)
    Z = objective_surface(small.train_x, small.train_y, ls, ns, rule=rule)
    assert Z.shape == (6, 5)
    assert np.isfinite(np.asarray(Z)).all()


def test_loo_crps_surface_has_interior_minimum_near_truth(small):
    """The LOO-CRPS surface over (l, noise-sd) attains its minimum in the grid
    interior near the generating truth (l=1, sd=0.3) — the visual check the R
    contour script performs with red ablines (`contour-plot.R:117,125`)."""
    ls = jnp.linspace(0.2, 4.0, 16)
    ns = jnp.linspace(0.05, 1.5, 16)
    Z = np.asarray(objective_surface(small.train_x, small.train_y, ls, ns, rule="crps"))
    i, j = np.unravel_index(Z.argmin(), Z.shape)
    assert 0 < i < 15 and 0 < j < 15, (i, j)
    assert 0.3 < float(ls[i]) < 3.5
    assert float(ns[j]) < 0.8


def test_wrong_crps_degenerate_in_noise(small):
    """Negative control: the in-sample (non-LOO) CRPS decreases monotonically as
    noise -> 0 (no interior minimum in noise) — why LOO is required
    (`contour-plot.R:55-64`)."""
    ns = jnp.linspace(0.02, 1.0, 12)
    Z = np.asarray(
        objective_surface(small.train_x, small.train_y, jnp.array([1.0]), ns,
                          rule="wrong_crps")
    )[0]
    # Minimizer collapses toward zero noise, far below the generating truth 0.3
    # (the in-sample objective rewards overconfidence).
    assert float(ns[Z.argmin()]) < 0.15


def test_crps_sensitivity_minimized_at_zero_mean_error():
    mus = jnp.linspace(-2.0, 2.0, 21)
    c = np.asarray(crps_mean_error_curve(jax.random.PRNGKey(0), mus, n=4000))
    assert abs(float(mus[c.argmin()])) < 0.3


def test_dss_correlation_curve_minimized_at_truth():
    rhos = jnp.linspace(-0.6, 0.9, 16)
    c = np.asarray(
        dss_correlation_curve(jax.random.PRNGKey(1), 0.5, rhos, num_data=400)
    )
    best = float(rhos[np.argmin(np.abs(c))])
    # relative-change curve crosses zero at the truth rho=0.5
    assert 0.2 < best < 0.8


def test_es_correlation_curve_runs():
    rhos = jnp.linspace(-0.5, 0.8, 6)
    c = np.asarray(
        es_correlation_curve(jax.random.PRNGKey(2), 0.4, rhos, num_data=50, num_sim=32)
    )
    assert np.isfinite(c).all()


def test_dss_mean_error_curve_minimized_at_truth():
    """`relative-change-NEW.R:105-115`: DSS relative change is ~0 and minimal
    at zero mean error (truth mu=0)."""
    mus = jnp.linspace(-3.0, 3.0, 13)
    c = np.asarray(dss_mean_error_curve(jax.random.PRNGKey(3), mus, num_data=400))
    assert np.isfinite(c).all()
    assert abs(float(mus[c.argmin()])) < 0.6
    assert abs(float(c[np.argmin(np.abs(np.asarray(mus)))])) < 0.1


def test_dss_var_error_curve_minimized_at_truth():
    """`relative-change-NEW.R:118-128`: minimum near k = true_sigma_sq = 1."""
    ks = jnp.concatenate([jnp.linspace(0.25, 1.0, 6), jnp.linspace(1.5, 6.0, 6)])
    c = np.asarray(dss_var_error_curve(jax.random.PRNGKey(4), ks, num_data=600))
    assert np.isfinite(c).all()
    assert 0.5 < float(ks[c.argmin()]) < 2.0


def test_es_mean_error_curve_minimized_at_truth():
    """`relative-change-NEW.R:165-175` (R-style L1 energy score)."""
    mus = jnp.linspace(-3.0, 3.0, 7)
    c = np.asarray(
        es_mean_error_curve(jax.random.PRNGKey(5), mus, num_data=100, num_sim=64)
    )
    assert np.isfinite(c).all()
    assert abs(float(mus[c.argmin()])) < 1.1


def test_es_var_error_curve_minimized_near_truth():
    """`relative-change-NEW.R:178-188`."""
    ks = jnp.array([0.25, 0.5, 1.0, 2.0, 4.0, 8.0])
    c = np.asarray(
        es_var_error_curve(jax.random.PRNGKey(6), ks, num_data=150, num_sim=64)
    )
    assert np.isfinite(c).all()
    assert 0.4 < float(ks[c.argmin()]) < 2.5


def test_correlation_families_zero_at_each_truth():
    """`relative-change-NEW.R:137-144,196-203`: each family row is a relative
    change normalized at its own truth, so it crosses ~0 at rho = true_rho."""
    true_rhos = [0.2, 0.6]
    rr = jnp.arange(0.0, 0.95, 0.1)
    dfam = np.asarray(
        dss_correlation_family(jax.random.PRNGKey(7), true_rhos, rr, num_data=400)
    )
    efam = np.asarray(
        es_correlation_family(
            jax.random.PRNGKey(8), true_rhos, rr, num_data=60, num_sim=32
        )
    )
    assert dfam.shape == efam.shape == (2, len(rr))
    assert np.isfinite(dfam).all() and np.isfinite(efam).all()
    for i, tr in enumerate(true_rhos):
        j = int(np.argmin(np.abs(np.asarray(rr) - tr)))
        assert abs(dfam[i, j]) < 0.02, (i, dfam[i])


def test_crps_illustration_area_matches_closed_form():
    from gpscore.scoring.rules import crps_gaussian

    cur = crps_illustration(mu=0.0, sigma=1.0, y=1.0, t_lo=-8.0, t_hi=8.0, num=4001)
    want = float(crps_gaussian(jnp.float32(0.0), jnp.float32(1.0), jnp.float32(1.0)))
    np.testing.assert_allclose(float(cur.crps_numeric), want, rtol=5e-3)
    # CDF curves are monotone and bounded
    F = np.asarray(cur.forecast_cdf)
    # fp32 erf is monotone only to ~1 ulp (1.2e-7 near 1.0)
    assert (np.diff(F) >= -3e-7).all() and 0.0 <= F.min() and F.max() <= 1.0


def test_plots_render_to_figure(small, tmp_path):
    """The full figure suite draws without error on a headless backend."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from gpscore.analysis import plots

    fig, axes = plt.subplots(2, 2, figsize=(8, 6))
    mean = np.zeros(4)
    var = np.ones(4)
    plots.interval_plot(
        axes[0, 0], small.test_x, mean, var, small.train_x, small.train_y,
        small.test_y, title="interval",
    )
    plots.inducing_migration_plot(axes[0, 1], np.array([-1.0, 0.0]), np.array([1.0, 2.0]))
    ls = jnp.linspace(0.3, 2.0, 4)
    ns = jnp.linspace(0.1, 1.0, 4)
    Z = objective_surface(small.train_x, small.train_y, ls, ns, rule="nlml")
    plots.contour_plot(axes[1, 0], ls, ns, Z, truth=(1.0, 0.3))
    plots.crps_area_plot(axes[1, 1], crps_illustration())
    out = str(tmp_path / "fig.png")
    plots.save_figure(fig, out)
    import os

    assert os.path.getsize(out) > 1000
    plt.close(fig)
