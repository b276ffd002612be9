"""Posterior constructors vs fp64 oracle — including brute-force LOO refits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from gpscore.models import (
    exact_predictive,
    kfold_exact,
    loo_exact,
    nlml_exact,
)
from gpscore.models.fitc import (
    fitc_dense_cov,
    fitc_predictive,
    kfold_fitc,
    loo_fitc,
    nlml_fitc,
)
from gpscore.ops.kernels import ard_gram
from gpscore.utils.params import GPParams


def _problem(rng, n=32, d=2, noise_sq=0.09):
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = np.sin(x.sum(1)).astype(np.float32) + 0.1 * rng.standard_normal(n).astype(
        np.float32
    )
    log_len = (0.2 * rng.standard_normal(d)).astype(np.float32)
    return x, y, 0.15, log_len, noise_sq


def test_exact_predictive_vs_oracle(rng):
    x, y, lsig, llen, noise_sq = _problem(rng)
    xs = rng.standard_normal((10, 2)).astype(np.float32)
    k_ff = oracle.ard_gram(x, x, lsig, llen)
    k_sf = oracle.ard_gram(xs, x, lsig, llen)
    k_ss = oracle.ard_gram(xs, xs, lsig, llen)
    want_m, want_c = oracle.exact_predictive(k_sf, k_ff, k_ss, y, noise_sq)

    got = exact_predictive(
        ard_gram(jnp.asarray(xs), jnp.asarray(x), lsig, jnp.asarray(llen)),
        ard_gram(jnp.asarray(x), jnp.asarray(x), lsig, jnp.asarray(llen)),
        ard_gram(jnp.asarray(xs), jnp.asarray(xs), lsig, jnp.asarray(llen)),
        jnp.asarray(y),
        noise_sq,
    )
    np.testing.assert_allclose(np.asarray(got.mean), want_m, atol=5e-6)
    np.testing.assert_allclose(np.asarray(got.cov), want_c, atol=5e-6)


def test_loo_identity_matches_brute_force_refits(rng):
    """The K^-1-diagonal LOO identities == literally refitting on n-1 points."""
    x, y, lsig, llen, noise_sq = _problem(rng, n=20)
    k_ff64 = oracle.ard_gram(x, x, lsig, llen)
    bf_mean, bf_var = oracle.loo_brute_force(k_ff64, y, noise_sq)

    k_ff = ard_gram(jnp.asarray(x), jnp.asarray(x), lsig, jnp.asarray(llen))
    got = loo_exact(k_ff, jnp.asarray(y), noise_sq)
    np.testing.assert_allclose(np.asarray(got.mean), bf_mean, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.cov), bf_var, atol=1e-4)


def test_loo_exact_vs_oracle_identity(rng):
    x, y, lsig, llen, noise_sq = _problem(rng, n=48)
    k_ff64 = oracle.ard_gram(x, x, lsig, llen)
    want_m, want_v = oracle.loo_identity(k_ff64, y, noise_sq)
    k_ff = ard_gram(jnp.asarray(x), jnp.asarray(x), lsig, jnp.asarray(llen))
    got = loo_exact(k_ff, jnp.asarray(y), noise_sq)
    np.testing.assert_allclose(np.asarray(got.mean), want_m, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.cov), want_v, rtol=2e-5)


def test_kfold_exact_vs_oracle(rng):
    x, y, lsig, llen, noise_sq = _problem(rng, n=32)
    k_ff64 = oracle.ard_gram(x, x, lsig, llen)
    want_m, want_c = oracle.kfold_conditionals(k_ff64, y, noise_sq, fold_k=4)
    k_ff = ard_gram(jnp.asarray(x), jnp.asarray(x), lsig, jnp.asarray(llen))
    got = kfold_exact(k_ff, jnp.asarray(y), noise_sq, fold_k=4)
    np.testing.assert_allclose(np.asarray(got.mean), want_m, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.cov), want_c, atol=1e-4)


def test_kfold_is_loo_at_foldsize_one(rng):
    """fold_k == n must reduce the block conditionals to LOO."""
    x, y, lsig, llen, noise_sq = _problem(rng, n=16)
    k_ff = ard_gram(jnp.asarray(x), jnp.asarray(x), lsig, jnp.asarray(llen))
    loo = loo_exact(k_ff, jnp.asarray(y), noise_sq)
    kf = kfold_exact(k_ff, jnp.asarray(y), noise_sq, fold_k=16, diag_only=True)
    np.testing.assert_allclose(
        np.asarray(kf.mean).ravel(), np.asarray(loo.mean), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(kf.cov).ravel(), np.asarray(loo.cov), rtol=1e-5
    )


def test_nlml_vs_oracle(rng):
    x, y, lsig, llen, noise_sq = _problem(rng)
    k_ff64 = oracle.ard_gram(x, x, lsig, llen)
    want = oracle.nlml(k_ff64, y, noise_sq)
    k_ff = ard_gram(jnp.asarray(x), jnp.asarray(x), lsig, jnp.asarray(llen))
    got = nlml_exact(k_ff, jnp.asarray(y), noise_sq)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


# ---- FITC ------------------------------------------------------------------


def _fitc_params(rng, d=2, m=6):
    return GPParams(
        log_signal_sq=jnp.float32(0.15),
        log_length=jnp.asarray((0.2 * rng.standard_normal(d)).astype(np.float32)),
        log_noise_sq=jnp.float32(np.log(0.09)),
        inducing=jnp.asarray(rng.standard_normal((m, d)).astype(np.float32)),
    )


def test_fitc_dense_cov_vs_oracle(rng):
    x, y, lsig, llen, noise_sq = _problem(rng)
    p = _fitc_params(rng)
    p = p.replace(log_signal_sq=jnp.float32(lsig), log_length=jnp.asarray(llen),
                  log_noise_sq=jnp.float32(np.log(noise_sq)))
    want = oracle.fitc_cov_dense(x, np.asarray(p.inducing), lsig, llen, noise_sq)
    got = fitc_dense_cov(jnp.asarray(x), p)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)


def test_fitc_loo_woodbury_vs_dense_vs_oracle(rng):
    x, y, lsig, llen, noise_sq = _problem(rng)
    p = _fitc_params(rng).replace(
        log_signal_sq=jnp.float32(lsig),
        log_length=jnp.asarray(llen),
        log_noise_sq=jnp.float32(np.log(noise_sq)),
    )
    B64 = oracle.fitc_cov_dense(x, np.asarray(p.inducing), lsig, llen, noise_sq)
    # LOO identities applied to B in fp64:
    Binv = np.linalg.inv(B64)
    d = np.diag(Binv)
    want_mean = y - (Binv @ y) / d
    want_var = 1.0 / d

    for method in ("woodbury", "dense"):
        got = loo_fitc(jnp.asarray(x), jnp.asarray(y), p, method=method)
        np.testing.assert_allclose(np.asarray(got.mean), want_mean, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got.cov), want_var, rtol=2e-4)


def test_fitc_logs_variance_correction_is_noop(rng):
    """The reference's FITC-logs variance 'correction'
    (`KIN40K-COMPARE-ALL-FITC-20.py:441-446`) cancels algebraically; both paths
    must agree to fp32 rounding."""
    x, y, _, _, _ = _problem(rng)
    p = _fitc_params(rng)
    a = loo_fitc(jnp.asarray(x), jnp.asarray(y), p, variance_correction=False)
    b = loo_fitc(jnp.asarray(x), jnp.asarray(y), p, variance_correction=True)
    np.testing.assert_allclose(np.asarray(a.cov), np.asarray(b.cov), rtol=1e-4)


def test_fitc_predictive_vs_oracle(rng):
    x, y, lsig, llen, noise_sq = _problem(rng)
    xs = rng.standard_normal((9, 2)).astype(np.float32)
    p = _fitc_params(rng).replace(
        log_signal_sq=jnp.float32(lsig),
        log_length=jnp.asarray(llen),
        log_noise_sq=jnp.float32(np.log(noise_sq)),
    )
    want_m, want_c = oracle.fitc_predictive(
        x, np.asarray(p.inducing), xs, y, lsig, llen, noise_sq
    )
    got = fitc_predictive(jnp.asarray(x), jnp.asarray(y), jnp.asarray(xs), p)
    np.testing.assert_allclose(np.asarray(got.mean), want_m, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.cov), want_c, atol=2e-5)


def test_fitc_predictive_variance_floored_at_noise(rng):
    """Every FITC predictive variance is >= noise_sq in exact arithmetic
    (Nystrom deficit is PSD); the large-m C - C M^-1 C cancellation can
    push diagonal entries below it in fp32 (measured: m=256 full-pool DSS
    fit -> a few negative variances -> NaN test CRPS). The clamp pins the
    bound so sqrt-based metrics stay finite at any m."""
    from gpscore.utils.params import GPParams

    n, m, d, t = 128, 96, 3, 33
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y = jnp.sin(x.sum(axis=1))
    xs = jnp.asarray(rng.standard_normal((t, d)).astype(np.float32))
    # long lengthscales + tiny noise: the high-kappa regime that produced
    # the measured negatives
    p = GPParams(
        log_signal_sq=jnp.float32(1.0),
        log_length=jnp.ones(d) * 1.5,
        log_noise_sq=jnp.float32(-9.0),
        inducing=x[:m] + 0.01 * jnp.asarray(
            rng.standard_normal((m, d)).astype(np.float32)),
    )
    pred = fitc_predictive(x, y, xs, p)
    var = np.asarray(jnp.diagonal(pred.cov))
    assert np.all(np.isfinite(var))
    # the clamp lands on noise_sq up to one fp32 rounding of d + (noise - d)
    assert np.all(var >= float(p.noise_sq) * (1.0 - 1e-3))


def test_fitc_nlml_vs_oracle(rng):
    x, y, lsig, llen, noise_sq = _problem(rng)
    p = _fitc_params(rng).replace(
        log_signal_sq=jnp.float32(lsig),
        log_length=jnp.asarray(llen),
        log_noise_sq=jnp.float32(np.log(noise_sq)),
    )
    import math

    B64 = oracle.fitc_cov_dense(x, np.asarray(p.inducing), lsig, llen, noise_sq)
    L = np.linalg.cholesky(B64)
    want = (
        0.5 * 32 * math.log(2 * math.pi)
        + np.sum(np.log(np.diag(L)))
        + 0.5 * y @ np.linalg.solve(B64, y)
    )
    got = nlml_fitc(jnp.asarray(x), jnp.asarray(y), p)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


def test_kfold_fitc_vs_dense_blocks(rng):
    x, y, lsig, llen, noise_sq = _problem(rng)
    p = _fitc_params(rng).replace(
        log_signal_sq=jnp.float32(lsig),
        log_length=jnp.asarray(llen),
        log_noise_sq=jnp.float32(np.log(noise_sq)),
    )
    B64 = oracle.fitc_cov_dense(x, np.asarray(p.inducing), lsig, llen, noise_sq)
    # fold conditionals from dense B^-1 in fp64:
    n, fold_k = 32, 4
    nb = n // fold_k
    Binv = np.linalg.inv(B64)
    Binv_y = Binv @ y
    want_m, want_c = [], []
    for b in range(fold_k):
        sl = slice(b * nb, (b + 1) * nb)
        Ainv = np.linalg.inv(Binv[sl, sl])
        want_m.append(y[sl] - Ainv @ Binv_y[sl])
        want_c.append(Ainv)
    got = kfold_fitc(jnp.asarray(x), jnp.asarray(y), p, fold_k=4)
    np.testing.assert_allclose(np.asarray(got.mean), np.stack(want_m), atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.cov), np.stack(want_c), rtol=2e-3, atol=5e-4)


def test_kfold_precision_form_matches_cov_form_exact(rng):
    """Precision-form k-fold == covariance-form k-fold (exact model)."""
    from gpscore.models.exact import kfold_exact, kfold_exact_precision
    from gpscore.ops.linalg import inv_diag_from_chol, spd_inverse

    n, k = 24, 4
    x = rng.standard_normal((n, 2)).astype(np.float32)
    y = rng.standard_normal(n).astype(np.float32)
    K = np.asarray(
        __import__("gpscore.ops.kernels", fromlist=["ard_gram"]).ard_gram(
            jnp.asarray(x), jnp.asarray(x), 0.2, jnp.zeros(2)
        )
    )
    cov_form = kfold_exact(jnp.asarray(K), jnp.asarray(y), 0.3, k)
    prec_form = kfold_exact_precision(jnp.asarray(K), jnp.asarray(y), 0.3, k)
    np.testing.assert_allclose(
        np.asarray(prec_form.mean), np.asarray(cov_form.mean), atol=2e-5
    )
    # Cov_b == (La La^T)^-1 per fold
    for b in range(k):
        Ainv = np.asarray(spd_inverse(L=prec_form.chol_prec[b]))
        np.testing.assert_allclose(Ainv, np.asarray(cov_form.cov[b]), atol=2e-4)
    # diag path (kc variant)
    var = np.asarray(jax.vmap(inv_diag_from_chol)(prec_form.chol_prec))
    np.testing.assert_allclose(
        var, np.asarray(jnp.diagonal(cov_form.cov, axis1=-2, axis2=-1)), atol=2e-4
    )


def test_kfold_precision_form_matches_cov_form_fitc(rng):
    from gpscore.models.fitc import kfold_fitc, kfold_fitc_precision
    from gpscore.ops.linalg import spd_inverse
    from gpscore.utils.params import GPParams

    n, k, m = 24, 4, 5
    x = rng.standard_normal((n, 2)).astype(np.float32)
    y = rng.standard_normal(n).astype(np.float32)
    p = GPParams(
        log_signal_sq=jnp.float32(0.1),
        log_length=jnp.zeros(2),
        log_noise_sq=jnp.float32(-0.5),
        inducing=jnp.asarray(rng.standard_normal((m, 2)).astype(np.float32)),
    )
    cov_form = kfold_fitc(jnp.asarray(x), jnp.asarray(y), p, k)
    prec_form = kfold_fitc_precision(jnp.asarray(x), jnp.asarray(y), p, k)
    np.testing.assert_allclose(
        np.asarray(prec_form.mean), np.asarray(cov_form.mean), atol=2e-5
    )
    for b in range(k):
        Ainv = np.asarray(spd_inverse(L=prec_form.chol_prec[b]))
        np.testing.assert_allclose(Ainv, np.asarray(cov_form.cov[b]), atol=2e-4)


def _fitc_setup(rng, n=24, k=4, m=5):
    from gpscore.utils.params import GPParams

    x = rng.standard_normal((n, 2)).astype(np.float32)
    y = rng.standard_normal(n).astype(np.float32)
    p = GPParams(
        log_signal_sq=jnp.float32(0.1),
        log_length=jnp.zeros(2),
        log_noise_sq=jnp.float32(-0.5),
        inducing=jnp.asarray(rng.standard_normal((m, 2)).astype(np.float32)),
    )
    return jnp.asarray(x), jnp.asarray(y), p


def test_kfold_fitc_lowrank_matches_dense_forms(rng):
    """Low-rank fold machinery (det-lemma log-det, Woodbury mean/quad/diag)
    == the dense covariance-form fold quantities."""
    from gpscore.models.fitc import (
        kfold_fitc,
        kfold_fitc_lowrank,
        lowrank_fold_cov_diag,
        lowrank_fold_logdet_cov,
        lowrank_fold_quad,
    )

    k = 4
    x, y, p = _fitc_setup(rng, n=24, k=k)
    dense = kfold_fitc(x, y, p, k)  # mean [k,nb], cov [k,nb,nb] = A^-1
    low = kfold_fitc_lowrank(x, y, p, k)
    np.testing.assert_allclose(
        np.asarray(low.mean), np.asarray(dense.mean), atol=3e-5
    )
    # log det Cov
    want_logdet = np.array(
        [np.linalg.slogdet(np.asarray(dense.cov[b], np.float64))[1] for b in range(k)]
    )
    np.testing.assert_allclose(
        np.asarray(lowrank_fold_logdet_cov(low)), want_logdet, rtol=1e-4, atol=1e-4
    )
    # quadratic form r^T A r = r^T Cov^-1 r
    r = jnp.asarray(rng.standard_normal(dense.mean.shape).astype(np.float32))
    want_quad = np.array(
        [
            np.asarray(r[b], np.float64)
            @ np.linalg.solve(np.asarray(dense.cov[b], np.float64), np.asarray(r[b], np.float64))
            for b in range(k)
        ]
    )
    np.testing.assert_allclose(
        np.asarray(lowrank_fold_quad(low, r)), want_quad, rtol=2e-3
    )
    # covariance diagonal
    np.testing.assert_allclose(
        np.asarray(lowrank_fold_cov_diag(low)),
        np.asarray(jnp.diagonal(dense.cov, axis1=-2, axis2=-1)),
        rtol=2e-3,
    )


@pytest.mark.slow
def test_lowrank_fold_sampler_covariance(rng):
    """Empirical covariance of the O(nb(m+S)) sampler -> A^-1."""
    from gpscore.models.fitc import kfold_fitc, kfold_fitc_lowrank, lowrank_fold_sample

    k = 2
    x, y, p = _fitc_setup(rng, n=12, k=k)
    dense = kfold_fitc(x, y, p, k)
    low = kfold_fitc_lowrank(x, y, p, k)
    z = lowrank_fold_sample(jax.random.PRNGKey(0), low, num_sim=40000)  # [k,S,nb]
    for b in range(k):
        emp = np.cov(np.asarray(z[b]).T)
        np.testing.assert_allclose(
            emp, np.asarray(dense.cov[b]), atol=0.06, rtol=0.15
        )


def test_fitc_objectives_lowrank_match_dense_path(rng):
    """dss/kc objective values via the low-rank fold path == the same objectives
    computed from the dense covariance forms."""
    from gpscore.fit import make_objective
    from gpscore.models.fitc import kfold_fitc
    from gpscore.scoring.rules import crps_gaussian, dss

    k = 4
    x, y, p = _fitc_setup(rng, n=24, k=k)
    y_b = y.reshape(k, -1)
    dense = kfold_fitc(x, y, p, k)

    got_dss = float(make_objective("dss", model="fitc", fold_k=k)(p, x, y, None))
    want_dss = float(
        jnp.sum(jax.vmap(dss)(dense.mean, dense.cov, y_b))
    )
    np.testing.assert_allclose(got_dss, want_dss, rtol=2e-4)

    got_kc = float(make_objective("kc", model="fitc", fold_k=k)(p, x, y, None))
    var_b = jnp.diagonal(dense.cov, axis1=-2, axis2=-1)
    want_kc = float(
        jnp.sum(jax.vmap(crps_gaussian)(dense.mean, var_b, y_b))
    )
    np.testing.assert_allclose(got_kc, want_kc, rtol=2e-4)


def test_kfold_precision_fused_matches_unfused(rng):
    """Public fused precision-form constructor == the unfused one (the round-3
    regression: an undefined ``block`` made this a guaranteed NameError)."""
    from gpscore.models.exact import (
        kfold_exact_precision,
        kfold_exact_precision_fused,
    )

    n, k, d = 64, 4, 2
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    p = GPParams(jnp.float32(0.2), jnp.zeros(d), jnp.float32(-1.0))
    K = ard_gram(x, x, p.log_signal_sq, p.log_length)
    want = kfold_exact_precision(K, y, p.noise_sq, k)
    got = kfold_exact_precision_fused(x, y, p, k, block=16)
    np.testing.assert_allclose(
        np.asarray(got.mean), np.asarray(want.mean), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.chol_prec), np.asarray(want.chol_prec),
        rtol=2e-4, atol=5e-5,
    )
