"""FITC / SPGP sparse-GP posteriors.

The reference builds the FITC train covariance B = Q_ff + G densely and pays a full
O(n^3) solve every iteration even in the sparse model (`KIN40K-COMPARE-ALL-FITC-20.py:
219-232`; Q at `:32-39`; G at `:225-228`). Here the low-rank structure is exploited:

    Q_ff = V V^T,  V = K_fu L_uu^{-T},  L_uu = chol(K_uu + 1e-3 I)
    B    = G + V V^T,  G = diag(k_ff_diag - q_ff_diag + noise_sq)

and everything (solves, inverse diagonal, log-det, k-fold blocks, predictive) goes
through the Woodbury identity in O(n m^2):

    B^-1 = G^-1 - W W^T,   W = G^-1 V L_M^{-T},   M = I + V^T G^-1 V.

The 1e-3 K_uu jitter matches the reference's `Q` exactly
(`SIMPLE-DATA FULL-comapre.py:53`). A dense path (`method="dense"`) reproduces the
reference's computation order for parity testing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpscore.models.exact import Gaussian, PrecisionGaussian
from gpscore.ops import linalg
from gpscore.ops.kernels import gram, kernel_diag
from gpscore.utils.precision import MM_PRECISION, matmul

KUU_JITTER = 1e-3  # reference `Q`, `SIMPLE-DATA FULL-comapre.py:53`


class FITCTerms(NamedTuple):
    """Everything needed about B = Q_ff + G, in low-rank form."""

    V: jnp.ndarray  # [n, m]   Qff = V V^T
    g: jnp.ndarray  # [n]      diagonal of G
    kff_diag: jnp.ndarray  # [n]
    L_uu: jnp.ndarray  # [m, m]  chol(K_uu + jitter I)
    L_M: jnp.ndarray  # [m, m]  chol(I + V^T G^-1 V)
    W: jnp.ndarray  # [n, m]   B^-1 = diag(1/g) - W W^T


def fitc_terms(x, params, *, kind: str = "ard") -> FITCTerms:
    """Build the Woodbury decomposition of B = Q_ff + G from data + params."""
    u = params.inducing
    m = u.shape[0]
    K_uu = gram(u, u, params.log_signal_sq, params.log_length, kind=kind)
    K_uu = K_uu + KUU_JITTER * jnp.eye(m, dtype=K_uu.dtype)
    K_fu = gram(x, u, params.log_signal_sq, params.log_length, kind=kind)
    L_uu = linalg.chol_factor(K_uu)
    V = linalg.tri_solve(L_uu, K_fu.T).T  # [n, m]
    kff_diag = kernel_diag(x, params.log_signal_sq)
    qff_diag = jnp.sum(V * V, axis=1)
    g = kff_diag - qff_diag + params.noise_sq
    Vg = V / g[:, None]
    M = jnp.eye(m, dtype=V.dtype) + matmul(V.T, Vg)
    L_M = linalg.chol_factor(M)
    # W^T = L_M^-1 (G^-1 V)^T  =>  W = G^-1 V L_M^-T, so W W^T = G^-1 V M^-1 V^T G^-1.
    W = linalg.tri_solve(L_M, Vg.T).T  # [n, m]
    return FITCTerms(V=V, g=g, kff_diag=kff_diag, L_uu=L_uu, L_M=L_M, W=W)


def _b_inv_apply(t: FITCTerms, r):
    """B^-1 r for r [n, k] in O(n m k)."""
    rg = r / t.g[:, None]
    return rg - matmul(t.W, matmul(t.W.T, r))


def _b_inv_diag(t: FITCTerms):
    return 1.0 / t.g - jnp.sum(t.W * t.W, axis=1)


def fitc_half_logdet(t: FITCTerms):
    """0.5 log det B = sum log diag(L_M) + 0.5 sum log g  (matrix determinant
    lemma; replaces the dense potrf log-det the reference uses at
    `KIN40K-COMPARE-ALL-FITC-20.py:337`)."""
    return linalg.half_logdet(t.L_M) + 0.5 * jnp.sum(jnp.log(t.g))


def nlml_fitc(x, y, params, *, kind: str = "ard"):
    """FITC NLML: 0.5 n log 2pi + 0.5 log det B + 0.5 y^T B^-1 y
    (reference `KIN40K-COMPARE-ALL-FITC-20.py:329-340`, computed densely there)."""
    n = x.shape[0]
    t = fitc_terms(x, params, kind=kind)
    yc = y.reshape(n, 1)
    quad = 0.5 * jnp.sum(yc * _b_inv_apply(t, yc))
    return 0.5 * n * jnp.log(2.0 * jnp.pi) + fitc_half_logdet(t) + quad


def loo_fitc(
    x,
    y,
    params,
    *,
    kind: str = "ard",
    variance_correction: bool = False,
    method: str = "woodbury",
) -> Gaussian:
    """FITC leave-one-out predictive (reference `KIN40K-COMPARE-ALL-FITC-20.py:
    223-232`):

        mu_i      = y_i - [B^-1 y]_i / [B^-1]_ii
        sigma_i^2 = 1 / [B^-1]_ii

    ``variance_correction=True`` applies the logs-objective variant
    (`KIN40K-COMPARE-ALL-FITC-20.py:441-446`):
        sigma_i^2 = 1/[B^-1]_ii + noise_sq - B_ii + Kff_ii
    Note B_ii = qff_ii + g_ii = kff_ii + noise_sq, so the correction is
    *algebraically zero*; it is kept (computed literally) for bit-level parity with
    the reference and as a documented reference defect.
    """
    n = x.shape[0]
    y = y.reshape(n)
    if method == "dense":
        B = fitc_dense_cov(x, params, kind=kind)
        L = linalg.chol_factor(B)
        b_diag = linalg.inv_diag_from_chol(L)
        b_y = linalg.chol_solve_from_factor(L, y.reshape(n, 1))[:, 0]
        big_q_diag = jnp.diagonal(B)
        kff_diag = kernel_diag(x, params.log_signal_sq)
    else:
        t = fitc_terms(x, params, kind=kind)
        b_diag = _b_inv_diag(t)
        b_y = _b_inv_apply(t, y.reshape(n, 1))[:, 0]
        big_q_diag = t.kff_diag + params.noise_sq  # q_ii + g_ii, exactly
        kff_diag = t.kff_diag
    mean = y - b_y / b_diag
    var = 1.0 / b_diag
    if variance_correction:
        var = var + params.noise_sq - big_q_diag + kff_diag
    return Gaussian(mean, var)


def fitc_dense_cov(x, params, *, kind: str = "ard"):
    """Dense B = Q_ff + G exactly as the reference forms it (parity path):
    Q_ff = K_fu (K_uu + 1e-3 I)^-1 K_uf materialized n x n, then
    G = diag(K_ff - Q_ff + noise_sq I)  (`KIN40K-COMPARE-ALL-FITC-20.py:223-229`).
    """
    u = params.inducing
    n, m = x.shape[0], u.shape[0]
    K_ff = gram(x, x, params.log_signal_sq, params.log_length, kind=kind)
    K_uu = gram(u, u, params.log_signal_sq, params.log_length, kind=kind)
    K_uu = K_uu + KUU_JITTER * jnp.eye(m, dtype=K_uu.dtype)
    K_fu = gram(x, u, params.log_signal_sq, params.log_length, kind=kind)
    Q_ff = matmul(K_fu, linalg.chol_solve(K_fu.T, K_uu))
    g = jnp.diagonal(K_ff) - jnp.diagonal(Q_ff) + params.noise_sq
    return Q_ff + jnp.diag(g)


def fitc_predictive(x, y, x_star, params, *, kind: str = "ard") -> Gaussian:
    """FITC predictive (reference ``spgp_cal_mean_and_cov``,
    `SIMPLE-FITC--comapre.py:59-66`):

        mu*  = Q*f B^-1 y
        Cov* = s^2 I + K** - Q*f B^-1 Qf*

    computed in O(n m^2 + t m^2 + t^2 m) via the low-rank forms
    Q*f = V* V^T and V^T B^-1 V = C - C M^-1 C with C = M - I.
    """
    n = x.shape[0]
    nt = x_star.shape[0]
    y = y.reshape(n, 1)
    t = fitc_terms(x, params, kind=kind)
    K_su = gram(x_star, params.inducing, params.log_signal_sq, params.log_length, kind=kind)
    V_s = linalg.tri_solve(t.L_uu, K_su.T).T  # [t, m]
    # mean = V* (V^T B^-1 y)
    vby = matmul(t.V.T, _b_inv_apply(t, y))  # [m, 1]
    mean = matmul(V_s, vby)[:, 0]
    # V^T B^-1 V = C - C M^-1 C, C = M - I
    m_dim = t.V.shape[1]
    eye_m = jnp.eye(m_dim, dtype=t.V.dtype)
    M = matmul(t.L_M, t.L_M.T)
    C = M - eye_m
    CMinvC = matmul(C, linalg.chol_solve_from_factor(t.L_M, C))
    vbv = C - CMinvC
    K_ss = gram(x_star, x_star, params.log_signal_sq, params.log_length, kind=kind)
    cov = (
        params.noise_sq * jnp.eye(nt, dtype=K_ss.dtype)
        + K_ss
        - matmul(V_s, matmul(vbv, V_s.T))
    )
    # Roundoff guard: in exact arithmetic every FITC predictive variance is
    # >= noise_sq (the Nystrom deficit k** - q** is PSD, and Q* B^-1 Q*^T
    # <= q**), but the C - C M^-1 C cancellation above can push a few
    # diagonal entries below it at large m (measured: m = 256 full-pool DSS
    # fit, a handful of negative variances -> NaN test CRPS/logs). Clamp
    # the diagonal to the bound; off-diagonals are untouched.
    d = jnp.diagonal(cov)
    cov = cov + jnp.diag(jnp.maximum(params.noise_sq - d, 0.0))
    return Gaussian(mean, cov)


def kfold_fitc(
    x, y, params, fold_k: int, *, kind: str = "ard", diag_only: bool = False
):
    """k-fold block conditionals on the FITC train covariance
    (reference `KIN40K-COMPARE-ALL-FITC-20.py:539-575` for DSS, `:667-706` for kc).

    Diagonal blocks of B^-1 come from the Woodbury form in O(n m^2 / k per fold):
        [B^-1]_bb = diag(1/g)_bb - W_b W_b^T.
    """
    W_b, g_b, y_b, b_y_b = _fitc_fold_terms(x, y, params, fold_k, kind)

    def per_fold(Wb, gb, yb, byb):
        A = jnp.diag(1.0 / gb) - matmul(Wb, Wb.T)  # [nb, nb] block of B^-1
        La = linalg.chol_factor(A)
        Ainv = linalg.spd_inverse(L=La)
        mean = yb - linalg.chol_solve_from_factor(La, byb.reshape(-1, 1))[:, 0]
        return mean, Ainv

    mean, Ainv = jax.vmap(per_fold)(W_b, g_b, y_b, b_y_b)
    if diag_only:
        return Gaussian(mean, jnp.diagonal(Ainv, axis1=-2, axis2=-1))
    return Gaussian(mean, Ainv)


def _fitc_fold_terms(x, y, params, fold_k: int, kind: str):
    """Shared FITC k-fold preamble: Woodbury terms reshaped to fold batches
    (W_b [k, nb, m], g_b [k, nb], y_b [k, nb], [B^-1 y]_b [k, nb])."""
    n = x.shape[0]
    if n % fold_k != 0:
        raise ValueError(f"n={n} not divisible by fold_k={fold_k}")
    nb = n // fold_k
    y = y.reshape(n)
    t = fitc_terms(x, params, kind=kind)
    b_y = _b_inv_apply(t, y.reshape(n, 1))[:, 0]
    return (
        t.W.reshape(fold_k, nb, -1),
        t.g.reshape(fold_k, nb),
        y.reshape(fold_k, nb),
        b_y.reshape(fold_k, nb),
    )


class LowRankPrecisionGaussian(NamedTuple):
    """Per-fold Gaussian whose *precision* is diagonal-minus-low-rank:

        A_b = diag(1/g_b) - W_b W_b^T,  covariance = A_b^-1.

    This is the FITC fold block's native structure ([B^-1]_bb with
    B^-1 = diag(1/g) - W W^T): every scoring-rule quantity (log-det via the
    matrix determinant lemma, quadratic forms, covariance diagonal, samples)
    costs O(nb m + m^3) instead of the O(nb^3) chol/inverse of the dense forms.
    Leading axes batch over folds.

    ``L_Mf`` is chol(I_m - W_b^T diag(g_b) W_b) (SPD since A_b is SPD).
    """

    mean: jnp.ndarray  # [k, nb]
    g: jnp.ndarray  # [k, nb]      diag of G restricted to the fold
    W: jnp.ndarray  # [k, nb, m]
    L_Mf: jnp.ndarray  # [k, m, m]


def kfold_fitc_lowrank(
    x, y, params, fold_k: int, *, kind: str = "ard"
) -> LowRankPrecisionGaussian:
    """FITC k-fold block conditionals in diagonal-minus-low-rank precision form
    (same math as :func:`kfold_fitc`; nothing nb x nb is ever factorized).

    Mean solve per fold via Woodbury on A_b = D - W W^T with D = diag(1/g_b):
        A_b^-1 v = G v + (G W) M_f^-1 (G W)^T v,   M_f = I - W^T G W,  G = diag(g_b).
    """
    W_b, g_b, y_b, b_y_b = _fitc_fold_terms(x, y, params, fold_k, kind)

    def per_fold(W, g, yb, v):
        m = W.shape[1]
        GW = W * g[:, None]  # D^-1 W,  D^-1 = diag(g)
        Mf = jnp.eye(m, dtype=W.dtype) - matmul(W.T, GW)
        L_Mf = linalg.chol_factor(Mf)
        # A^-1 v = G v + GW Mf^-1 GW^T v
        w = linalg.chol_solve_from_factor(L_Mf, matmul(GW.T, v.reshape(-1, 1)))
        ainv_v = g * v + matmul(GW, w)[:, 0]
        mean = yb - ainv_v
        return mean, L_Mf

    mean, L_Mf = jax.vmap(per_fold)(W_b, g_b, y_b, b_y_b)
    return LowRankPrecisionGaussian(mean=mean, g=g_b, W=W_b, L_Mf=L_Mf)


def lowrank_fold_logdet_cov(p: LowRankPrecisionGaussian):
    """log det Cov_b = -log det A_b = sum log g_b - 2 sum log diag(L_Mf).
    (det lemma: det A = det(diag(1/g)) det(I - W^T diag(g) W).) [k]-vector."""
    return jnp.sum(jnp.log(p.g), axis=-1) - 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(p.L_Mf, axis1=-2, axis2=-1)), axis=-1
    )


def lowrank_fold_quad(p: LowRankPrecisionGaussian, r):
    """r^T A_b r = r^T D r - ||W^T r||^2 per fold; r [k, nb] -> [k]."""
    Wr = jnp.einsum("knm,kn->km", p.W, r, precision=MM_PRECISION)
    return jnp.sum(r * r / p.g, axis=-1) - jnp.sum(Wr * Wr, axis=-1)


def lowrank_fold_cov_diag(p: LowRankPrecisionGaussian):
    """diag(A_b^-1) = g + rowsum((GW) L_Mf^-T ∘ (GW) L_Mf^-T) per fold. [k, nb]."""

    def one(g, W, L_Mf):
        GW = W * g[:, None]
        # A^-1 = G + GW Mf^-1 GW^T; diag of the correction via the factor.
        S = linalg.tri_solve(L_Mf, GW.T)  # [m, nb] = L^-1 GW^T
        return g + jnp.sum(S * S, axis=0)

    return jax.vmap(one)(p.g, p.W, p.L_Mf)


def lowrank_fold_sample(key, p: LowRankPrecisionGaussian, num_sim: int):
    """num_sim draws z ~ N(0, A_b^-1) per fold in O(nb (m + S)):
    A^-1 = G + U Mf^-1 U^T with U = GW, so z = G^1/2 e1 + U L_Mf^-T e2.
    Returns [k, num_sim, nb]."""

    def one(k, g, W, L_Mf):
        m = W.shape[1]
        nb = W.shape[0]
        k1, k2 = jax.random.split(k)
        e1 = jax.random.normal(k1, (num_sim, nb), W.dtype)
        e2 = jax.random.normal(k2, (m, num_sim), W.dtype)
        GW = W * g[:, None]
        corr = matmul(GW, linalg.tri_solve(L_Mf, e2, trans=True))  # [nb, S]
        return jnp.sqrt(g)[None, :] * e1 + corr.T

    keys = jax.random.split(key, p.mean.shape[0])
    return jax.vmap(one)(keys, p.g, p.W, p.L_Mf)


def kfold_fitc_precision(
    x, y, params, fold_k: int, *, kind: str = "ard"
) -> PrecisionGaussian:
    """k-fold block conditionals of the FITC train covariance in precision form
    (same math as :func:`kfold_fitc`; no per-fold inverse is materialized)."""
    W_b, g_b, y_b, b_y_b = _fitc_fold_terms(x, y, params, fold_k, kind)

    def per_fold(Wb, gb, yb, byb):
        A = jnp.diag(1.0 / gb) - matmul(Wb, Wb.T)
        La = linalg.chol_factor(A)
        mean = yb - linalg.chol_solve_from_factor(La, byb.reshape(-1, 1))[:, 0]
        return mean, La

    mean, La = jax.vmap(per_fold)(W_b, g_b, y_b, b_y_b)
    return PrecisionGaussian(mean, La)
