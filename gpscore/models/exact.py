"""Exact-GP predictive distributions: test-time, leave-one-out, and k-fold.

All functions take explicit kernel matrices / parameters (the reference reads
``sigma_noise_sq`` and the hyperparameters from module globals, e.g.
`SIMPLE-DATA FULL-comapre.py:59-64`).

Every quantity of one training iteration derives from a *single* Cholesky
factorization of K_hat = K_ff + sigma^2 I. The reference factors the same matrix
up to three times per iteration (inverse at `SIMPLE-DATA FULL-comapre.py:209`,
solve at `:210`, and for NLML paths the log-det at `:294`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from gpscore.ops import linalg
from gpscore.utils.precision import MM_PRECISION, matmul


class Gaussian(NamedTuple):
    """A (possibly diagonal) Gaussian predictive: mean [n,] and cov.

    ``cov`` is [n] (diagonal variances) or [n, n] (full covariance)."""

    mean: jnp.ndarray
    cov: jnp.ndarray


class PrecisionGaussian(NamedTuple):
    """Gaussian in precision form: cov = (chol_prec @ chol_prec^T)^-1.

    The natural output of the k-fold block conditionals, whose covariance is the
    inverse of the available block A = [K_hat^-1]_bb — scoring rules that only
    need log-dets, quadratic forms, samples, or the covariance diagonal
    (DSS/ES/kc) consume this directly and skip the O(nb^3) inversion +
    re-factorization of the covariance path. Leading axes batch over folds."""

    mean: jnp.ndarray  # [..., nb]
    chol_prec: jnp.ndarray  # [..., nb, nb] lower


def exact_predictive(k_star_f, k_ff, k_ss, y, noise_sq, *, L=None) -> Gaussian:
    """Noise-inclusive exact GP predictive (reference ``cal_mean_and_cov``,
    `SIMPLE-DATA FULL-comapre.py:106-111`):

        mu*  = K*f (Kff + s^2 I)^-1 y
        Cov* = s^2 I + K** - K*f (Kff + s^2 I)^-1 Kf*
    """
    n = k_ff.shape[0]
    t = k_ss.shape[0]
    K_hat = k_ff + noise_sq * jnp.eye(n, dtype=k_ff.dtype)
    if L is None:
        L = linalg.chol_factor(K_hat)
    alpha = linalg.chol_solve_from_factor(L, y.reshape(n, 1))
    mean = matmul(k_star_f, alpha)[:, 0]
    V = linalg.tri_solve(L, k_star_f.T)  # [n, t]
    cov = noise_sq * jnp.eye(t, dtype=k_ss.dtype) + k_ss - matmul(V.T, V)
    return Gaussian(mean, cov)


def exact_predictive_diag_large(
    x, y, x_test, params, *, block: int = 2048, chunk: int = 2048,
    storage=None, refine: int = 0,
) -> Gaussian:
    """Diagonal noise-inclusive exact predictive at large n (ARD kernel).

    Same mu* / diag Cov* as :func:`exact_predictive` (reference
    ``cal_mean_and_cov``, `SIMPLE-DATA FULL-comapre.py:106-111`; prediction
    tail `kin40k-FULL-compare.py:267-292`, which only ever consumes the
    diagonal), but built for the post-fit evaluation of n ~ 60-85k models:

    - K_ff never materializes — the in-place potri pipeline
      (:func:`gpscore.ops.potri_inplace.ard_gram_inverse_inplace`) produces
      the full K_hat^-1 inside one n x n buffer (the bounded-trace fori
      stages at large panel counts);
    - test points stream in ``chunk``-sized blocks through GEMMs against the
      explicit inverse (an in-scan ``solve_triangular`` with an [n, chunk]
      RHS goes through XLA's expander, whose panel-chain temps measured
      32 GB at n = 30,720 — double the chip), so the t x t covariance never
      exists: var = noise + signal - k*^T K_hat^-1 k* per column.
    - ``storage`` (e.g. bfloat16/float16) halves the n^2 buffer for
      evaluating beyond-fp32-ceiling fits (n > ~62k on 16 GB); plain, the
      metrics are then 2-byte-grade — pass ``refine`` to fix that.
    - ``refine`` (with ``storage``): preconditioned-CG iterations on every
      solve, with the 2-byte-stored inverse M ~ K_hat^-1 as preconditioner
      and the EXACT fp32 K_hat recomputed panel-wise per matvec
      (:func:`~gpscore.ops.potri_inplace.ard_khat_matmul_streamed` — never
      an n^2 buffer). Plain Richardson refinement ``v += M (b - K_hat v)``
      contracts per step by rho = ||I - M K_hat|| ~ u_storage*kappa, which
      MEASURED 0.76/step at n = 57,344 on a 3-iteration smooth-kernel fit
      (f16 storage) — 30+ steps to fp32 grade; PCG on the same M converges
      at ~((sqrt(k)-1)/(sqrt(k)+1)) with k = (1+rho)/(1-rho), ~0.46 here,
      and degrades gracefully as kappa grows. refine=8 returns fp32-grade
      means/variances through the half-memory inverse (validated at
      n = 57,344 against the fp32 pipeline, RESULTS.md refinement table;
      small-n parity in tests/test_potri_inplace.py). Cost: 2 n^2 MACs per
      iteration per RHS column (one exact K_hat matvec + one M matvec) on
      top of the 1 n^2 plain chunk solve.

    Peak ~n^2 + O(n * chunk). Not differentiable (evaluation only — training
    goes through the fused LOO/k-fold/NLML cores).
    """
    from gpscore.ops.kernels import ard_gram
    from gpscore.ops.potri_inplace import (
        ard_gram_inverse_inplace,
        ard_khat_matmul_streamed,
        pad_rows,
        zero_pad,
    )
    from gpscore.utils.precision import matmul_acc32

    n = x.shape[0]
    t = x_test.shape[0]
    n_pad = -(-n // block) * block
    x_pad = pad_rows(x, n_pad)
    y_pad = zero_pad(y.reshape(n), n_pad)
    Kinv = ard_gram_inverse_inplace(
        params.log_signal_sq, params.log_length, params.log_noise_sq,
        x_pad, n, block, storage=storage,
    )

    def khat_mul(V):
        return ard_khat_matmul_streamed(
            params.log_signal_sq, params.log_length, params.log_noise_sq,
            x_pad, n, V, block,
        )

    def precond(R):
        return matmul_acc32(Kinv, R.astype(Kinv.dtype))

    def solve(B):
        """K_hat^-1 B through the stored inverse; with ``refine`` > 0 a
        SAFEGUARDED M-preconditioned CG recursion (docstring), batched over
        columns. The 2-byte-stored M can be mildly indefinite at the very
        top of the size range (measured at n = 86,016: one mean-solve
        iteration produced rz < 0 yet plain CG converged ||R|| 66 -> 0.05
        by iter 5 — negative-rz steps must be TAKEN, not masked; masking
        them stalls the column permanently since the restart direction
        Z = M R reproduces the same rz). What does explode is a roundoff
        pq <= 0 on a converged column (K_hat is SPD, so pq > 0 up to
        noise): alpha = rz/clamped-pq blows up to NaN and poisons the
        column — measured as the all-NaN 86k eval. So: pq <= 0 / non-finite
        iterations are masked per column, and the returned iterate is the
        best-residual one, never worse than the plain M b solve."""
        B = B.astype(jnp.float32)
        X = precond(B)
        if storage is None or refine <= 0:
            return X
        R = B - khat_mul(X)
        Z = precond(R)
        rb = jnp.sum(R * R, axis=0)

        def body(_, carry):
            X, R, Z, Pd, Xb, rb = carry
            Q = khat_mul(Pd)
            rz = jnp.sum(R * Z, axis=0)
            pq = jnp.sum(Pd * Q, axis=0)
            ok = (pq > 1e-30) & jnp.isfinite(pq) & jnp.isfinite(rz)
            alpha = jnp.where(ok, rz / jnp.where(ok, pq, 1.0), 0.0)
            X = X + alpha[None, :] * Pd
            R = R - alpha[None, :] * Q
            Z = precond(R)
            rz2 = jnp.sum(R * Z, axis=0)
            okb = ok & (jnp.abs(rz) > 1e-30) & jnp.isfinite(rz2)
            beta = jnp.where(okb, rz2 / jnp.where(okb, rz, 1.0), 0.0)
            Pd = Z + beta[None, :] * Pd
            rn = jnp.sum(R * R, axis=0)
            better = rn < rb
            Xb = jnp.where(better[None, :], X, Xb)
            rb = jnp.where(better, rn, rb)
            return X, R, Z, Pd, Xb, rb

        _, _, _, _, Xb, _ = lax.fori_loop(
            0, refine, body, (X, R, Z, Z, X, rb)
        )
        return Xb

    alpha = solve(y_pad.reshape(n_pad, 1))[:, 0]  # K_hat^-1 y, fp32
    signal_sq = jnp.exp(params.log_signal_sq)
    noise_sq = params.noise_sq
    realmask = None
    if n_pad > n:
        realmask = (jnp.arange(n_pad) < n).astype(x.dtype)[:, None]

    t_pad = -(-t // chunk) * chunk
    xt = pad_rows(x_test, t_pad).reshape(t_pad // chunk, chunk, x.shape[1])

    def body(_, xc):
        ks = ard_gram(x_pad, xc, params.log_signal_sq, params.log_length)
        if realmask is not None:
            ks = ks * realmask  # padded train rows contribute nothing
        mean_c = jnp.einsum("nc,n->c", ks, alpha, precision=MM_PRECISION)
        V = solve(ks)  # K_hat^-1 K_f*, fp32
        var_c = noise_sq + signal_sq - jnp.sum(ks * V, axis=0)
        return None, (mean_c, var_c)

    _, (mean, var) = jax.lax.scan(body, None, xt)
    return Gaussian(mean.reshape(t_pad)[:t], var.reshape(t_pad)[:t])


def loo_exact(k_ff, y, noise_sq) -> Gaussian:
    """Leave-one-out predictive via the Rasmussen–Williams identities
    (reference inline at `SIMPLE-DATA FULL-comapre.py:207-211`):

        mu_i     = y_i - [K_hat^-1 y]_i / [K_hat^-1]_ii
        sigma_i^2 = 1 / [K_hat^-1]_ii

    One Cholesky; K_hat^-1 y and diag(K_hat^-1) come from
    :func:`~gpscore.ops.linalg.loo_solve_diag`, whose custom VJP keeps the
    backward memory-bounded (plain autodiff of the solve chain OOMs at n ~ 10k).
    Returns a diagonal Gaussian over the n training points.
    """
    n = k_ff.shape[0]
    y = y.reshape(n)
    K_hat = k_ff + noise_sq * jnp.eye(n, dtype=k_ff.dtype)
    kinv_y, kinv_diag = linalg.loo_solve_diag(K_hat, y)
    mean = y - kinv_y / kinv_diag
    var = 1.0 / kinv_diag
    return Gaussian(mean, var)


def loo_exact_fused(x, y, params) -> Gaussian:
    """LOO predictive via the fused ARD-Gram + solve core
    (:mod:`gpscore.ops.loo_fused`): same identities as :func:`loo_exact`, but
    the Gram never persists as an autodiff residual, the forward computes
    K^-1 inside one n x n buffer (the in-place potri pipeline,
    :mod:`gpscore.ops.potri_inplace`), and the backward streams the kernel
    contraction — peak live set ~n^2 + O(n block) instead of ~4 n^2, which is
    what lets a single 16 GB chip take n = 61k (the reference caps at n = 500,
    `kin40k-FULL-compare.py:196`)."""
    from gpscore.ops.loo_fused import ard_loo_solve_diag

    y = y.reshape(x.shape[0])
    kinv_y, kinv_diag = ard_loo_solve_diag(
        params.log_signal_sq, params.log_length, params.log_noise_sq, x, y
    )
    return Gaussian(y - kinv_y / kinv_diag, 1.0 / kinv_diag)


def _kfold_blocks(k_ff, y, noise_sq, fold_k: int):
    """Shared k-fold preamble: diagonal blocks A_b = [K_hat^-1]_bb (batched
    [k, nb, nb] via reshape, no python loop), fold targets y_b, and
    [K_hat^-1 y]_b (reference `kin40k-FULL-compare.py:500-530`).

    Requires n % fold_k == 0 (the reference silently assumes this: every fold
    uses ``index1 = n // fold_k`` sized identity solves, `:521-530`).
    """
    n = k_ff.shape[0]
    if n % fold_k != 0:
        raise ValueError(f"n={n} not divisible by fold_k={fold_k}")
    nb = n // fold_k
    y = y.reshape(n)
    K_hat = k_ff + noise_sq * jnp.eye(n, dtype=k_ff.dtype)
    # Custom-VJP primitive: closed-form adjoint on the materialized K^-1
    # instead of autodiff back through the factor/solve chain (linalg.py
    # docstring has the measured speedup).
    Kinv_y, A = linalg.kfold_solve_blocks(K_hat, y, fold_k)
    return A, y.reshape(fold_k, nb), Kinv_y.reshape(fold_k, nb, 1)


def kfold_exact(k_ff, y, noise_sq, fold_k: int, *, diag_only: bool = False):
    """k-fold block conditionals (reference `kin40k-FULL-compare.py:500-530`).

        m_b   = y_b - A_b^-1 [K_hat^-1 y]_b
        Cov_b = A_b^-1            (diag(A_b^-1) if ``diag_only``, the "kc" variant,
                                   `KIN40K-COMPARE-ALL-FITC-20.py:703-706`)

    Returns a batched Gaussian with leading fold axis: mean [k, nb],
    cov [k, nb, nb] or [k, nb].
    """
    A, y_b, Kinv_y_b = _kfold_blocks(k_ff, y, noise_sq, fold_k)
    fold_k_, nb = y_b.shape
    Lb = jnp.linalg.cholesky(A)  # batched [k, nb, nb]
    eye = jnp.eye(nb, dtype=A.dtype)
    Ainv = jax.vmap(lambda Lb_: linalg.chol_solve_from_factor(Lb_, eye))(Lb)
    mean = y_b - jnp.einsum(
        "kij,kjo->kio", Ainv, Kinv_y_b, precision=MM_PRECISION
    ).reshape(fold_k_, nb)
    if diag_only:
        return Gaussian(mean, jnp.diagonal(Ainv, axis1=-2, axis2=-1))
    return Gaussian(mean, Ainv)


def kfold_exact_precision(k_ff, y, noise_sq, fold_k: int) -> PrecisionGaussian:
    """k-fold block conditionals in precision form (same math as
    :func:`kfold_exact`; the per-fold inverse is never materialized):

        A_b = [K_hat^-1]_bb = La_b La_b^T
        m_b = y_b - A_b^-1 [K_hat^-1 y]_b   (one solve with La_b)
        Cov_b = A_b^-1                       (kept implicit)
    """
    A, y_b, Kinv_y_b = _kfold_blocks(k_ff, y, noise_sq, fold_k)
    La = jnp.linalg.cholesky(A)  # batched [k, nb, nb]
    solve = jax.vmap(linalg.chol_solve_from_factor)
    mean = y_b - solve(La, Kinv_y_b)[..., 0]
    return PrecisionGaussian(mean, La)


def kfold_exact_precision_fused(
    x, y, params, fold_k: int, block=None
) -> PrecisionGaussian:
    """k-fold block conditionals in precision form via the fused ARD-Gram +
    k-fold solve core (:mod:`gpscore.ops.loo_fused`): same math as
    :func:`kfold_exact_precision`, ~2 n^2 peak HBM instead of ~4 n^2 across a
    value_and_grad.

    The large-n DSS/ES/kc *objectives* dispatch to :func:`kfold_stats_fused`
    (whose fold consumer also closes the scoring-stage adjoints); this
    constructor remains the public fused path for callers that want the
    PrecisionGaussian itself (fold-level diagnostics, custom rules).
    ``block`` is the fused core's panel width, as in :func:`kfold_stats_fused`.
    """
    from gpscore.ops.loo_fused import ard_kfold_solve_blocks

    n = x.shape[0]
    y = y.reshape(n)
    a, A = ard_kfold_solve_blocks(
        params.log_signal_sq, params.log_length, params.log_noise_sq,
        x, y, fold_k, block,
    )
    nb = n // fold_k
    La = jnp.linalg.cholesky(A)  # batched [k, nb, nb]
    solve = jax.vmap(linalg.chol_solve_from_factor)
    mean = y.reshape(fold_k, nb) - solve(La, a.reshape(fold_k, nb, 1))[..., 0]
    return PrecisionGaussian(mean, La)


def kfold_stats_fused(x, y, params, fold_k: int,
                      want_inv_diag: bool = True, block=None):
    """Fold-conditional statistics for the large-n DSS/kc objectives via the
    fold-STREAMED fused primitive
    (:func:`gpscore.ops.fold_stream.ard_fold_stats_stream`): folds are
    extracted, factored, scored, and adjoint-ed ONE AT A TIME off the n^2
    K^-1 residual — no [fold_k, nb, nb] stack exists at any point, so the
    fold rules' single-chip ceiling tracks the LOO family's instead of
    sitting 14k rows below it (RESULTS.md round-5 ceiling tables; the
    round-4 stacked composition — ard_kfold_solve_blocks +
    fold_core.fold_precision_stats — remains available for parity tests).

    Same fold conditionals as :func:`kfold_exact_precision`
    (reference `kin40k-FULL-compare.py:500-530`). ``want_inv_diag=False``
    (static) skips the fold variances (only kc reads them). ``block`` is
    the potri panel + backward streaming width.
    Returns ``(stats: FoldStats, a_b: [k, nb], y_b: [k, nb])`` with fold
    mean ``y_b - stats.e`` (``stats.z`` is an empty placeholder — the ES
    sampler lives in :func:`kfold_es_fused`).
    """
    from gpscore.ops.fold_core import FoldStats
    from gpscore.ops.fold_stream import ard_fold_stats_stream

    n = x.shape[0]
    y = y.reshape(n)
    e, hld, inv_diag, a = ard_fold_stats_stream(
        params.log_signal_sq, params.log_length, params.log_noise_sq,
        x, y, fold_k, want_inv_diag, block,
    )
    nb = n // fold_k
    z = jnp.zeros((fold_k, 0, nb), jnp.float32)
    stats = FoldStats(e, hld, inv_diag, z)
    return stats, a.reshape(fold_k, nb), y.reshape(fold_k, nb)


def kfold_es_fused(x, y, params, fold_k: int, key, num_sim: int = 300,
                   es_beta: float = 1.0, block=None):
    """Large-n ES objective via the fold-streamed fused primitive
    (:func:`gpscore.ops.fold_stream.ard_fold_es_stream`): per-fold
    conditionals AND the S(S-1)-normalized MC energy score
    (reference `kin40k-FULL-compare.py:616-657`) in one custom-VJP chain
    off the K^-1 residual. eps is drawn one fold at a time from counter
    keys derived off ``key`` and regenerated in the backward — no
    [fold_k, nb, 2S] sample stack, no fold-block stack. Returns the scalar
    summed score."""
    from gpscore.ops.fold_stream import ard_fold_es_stream

    n = x.shape[0]
    y = y.reshape(n)
    scores = ard_fold_es_stream(
        params.log_signal_sq, params.log_length, params.log_noise_sq,
        x, y, jax.random.key_data(key), fold_k, num_sim, es_beta, block,
    )
    return jnp.sum(scores)


def nlml_exact_fused(x, y, params):
    """NLML via the fused in-place core (:func:`gpscore.ops.loo_fused.ard_nlml`):
    same value as :func:`nlml_exact`, but the Gram never persists as an autodiff
    residual, the factorization runs in one n x n buffer, and the gradient's
    K_hat_bar = (K^-1 - alpha alpha^T)/2 streams off K^-1's rows with no second
    n^3 GEMM — the large-n path for the baseline objective
    (reference inline NLML, `SIMPLE-DATA FULL-comapre.py:292-296`)."""
    from gpscore.ops.loo_fused import ard_nlml

    return ard_nlml(
        params.log_signal_sq, params.log_length, params.log_noise_sq,
        x, y.reshape(x.shape[0]),
    )


def nlml_exact(k_ff, y, noise_sq):
    """Negative log marginal likelihood (reference inline,
    `SIMPLE-DATA FULL-comapre.py:292-296`):
        0.5 n log 2pi + sum log diag(chol(K_hat)) + 0.5 y^T K_hat^-1 y
    """
    n = k_ff.shape[0]
    y = y.reshape(n, 1)
    K_hat = k_ff + noise_sq * jnp.eye(n, dtype=k_ff.dtype)
    L = linalg.chol_factor(K_hat)
    quad = 0.5 * jnp.sum(y * linalg.chol_solve_from_factor(L, y))
    return 0.5 * n * jnp.log(2.0 * jnp.pi) + linalg.half_logdet(L) + quad
