"""In-place fused Gram -> K_hat^-1 pipeline: ~n^2 + O(n*b) peak HBM.

The fused LOO/k-fold cores (:mod:`gpscore.ops.loo_fused`) peak at ~2 n^2 live
fp32 in their forward — the Gram/factor buffer and the inverse coexist across
``chol -> tri_inverse -> Linv^T Linv`` (measured: temp = 2.01 n^2 at n = 16k;
the single-chip ceiling that implies is n = 45,056 on a 16 GB v5e, RESULTS.md).
This module computes the same ``K_hat^-1`` inside ONE n x n buffer, the
LAPACK ``potrf -> trtri -> lauum`` (= ``potri``) pipeline re-expressed for XLA:

- one buffer ``W`` carries K_hat-panels -> L -> L^-1 -> K_hat^-1; every update
  is a static-offset ``dynamic_update_slice``, which XLA buffer-assigns
  in place (each version of ``W`` has a single consumer);
- the Gram is generated panel-by-panel *inside* the factorization (left-looking
  Cholesky), so K_hat as a whole never exists;
- inner accumulations run as ``lax.scan`` over column/row panels: the scan
  serializes the thin slice reads so only ONE O(n*b) panel copy is live at a
  time (unrolled, XLA hoists all panel copies concurrently — measured 0.83 n^2
  of slice temps at n = 16k);
- every GEMM operand read from ``W`` is a thin panel (<= n*b), never a 2-D
  slice of both axes (XLA has no views — a big slice is a big copy).

Stages (all trace-time-unrolled over k = n/b outer panels, MXU GEMM bodies):

1. ``_gram_chol_inplace``  left-looking blocked Cholesky; panel j of K_hat is
   ``ard_gram(x[s:], x[s:s+b]) + noise I`` minus the rank-s left update,
   accumulated by an inner scan over prior column panels. W <- L.
2. ``_tri_inv_inplace``    blocked lower-triangular inversion, right-to-left:
   ``X[t:, s:t] = -X[t:, t:] L[t:, s:t] X_ss`` where the trailing inverse is
   read from already-overwritten panels and L from not-yet-overwritten ones.
   W <- L^-1.
3. ``_lauum_inplace``      ``K_hat^-1 = L^-T L^-1`` column-panel by column
   panel (inner scan over row panels), written lower + mirrored upper so the
   result is the FULL symmetric inverse (the streamed backward of
   ``loo_fused`` contracts whole rows of it). W <- K_hat^-1.

Exact padding: callers round n up to a multiple of ``b`` and pass the real row
count; padded rows are *masked* in the panel construction so the padded system
is exactly ``blockdiag(K_hat, (1 + noise) I)`` — cross-terms are identically
zero, hence ``K_hat^-1`` is exactly block-diagonal and the real block equals
the unpadded inverse bit-for-bit in exact arithmetic (no geometric far-point
tricks whose exactness would depend on underflow).

Reference analogue: ``chol_solve(I, big_k)`` materializing K^-1 for the LOO
diag (`SIMPLE-DATA FULL-comapre.py:209`, `kin40k-FULL-compare.py:507`) — the
O(n^3)-per-iteration + O(n^2)-memory wall this framework exists to push.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from gpscore.ops.kernels import ard_gram
from gpscore.utils.precision import matmul, matmul_crit, mm_precision


def pad_rows(x, n_pad: int):
    """Row-pad [n, ...] -> [n_pad, ...] by repeating the last row (values are
    irrelevant: panel masking zeroes every padded kernel entry)."""
    n = x.shape[0]
    if n_pad == n:
        return x
    tail = jnp.broadcast_to(x[-1:], (n_pad - n,) + x.shape[1:])
    return jnp.concatenate([x, tail], axis=0)


def zero_pad(v, n_pad: int):
    """Zero-pad a vector [n] -> [n_pad]."""
    n = v.shape[0]
    if n_pad == n:
        return v
    return jnp.concatenate([v, jnp.zeros((n_pad - n,), v.dtype)])


def _gram_chol_inplace(log_signal_sq, log_length, log_noise_sq, x, n_real, b):
    """W <- lower Cholesky factor of the masked-padded K_hat; strict upper 0.

    Also returns the half log-det of the REAL block,
    ``sum_{i < n_real} log L_ii`` (pad diagonal entries are excluded), so NLML
    callers get it for free before `_tri_inv_inplace` overwrites L.
    """
    n = x.shape[0]
    dtype = x.dtype
    noise = jnp.exp(log_noise_sq)
    eye_b = jnp.eye(b, dtype=dtype)
    W = jnp.zeros((n, n), dtype)
    half_logdet = jnp.zeros((), dtype)
    for pi in range(n // b):
        s = pi * b
        m = n - s
        P = ard_gram(x[s:], x[s : s + b], log_signal_sq, log_length)
        diag_panel = jnp.eye(m, b, dtype=dtype)  # ones at global (s+i, s+i)
        if n_real < n:
            rmask = (jnp.arange(s, n) < n_real)[:, None]
            cmask = (jnp.arange(s, s + b) < n_real)[None, :]
            P = jnp.where(rmask & cmask, P, jnp.zeros((), dtype))
            pad_diag = (jnp.arange(s, s + b) >= n_real).astype(dtype)[None, :]
            P = P + (noise + pad_diag) * diag_panel
        else:
            P = P + noise * diag_panel
        if pi:
            # left-looking update: P -= sum_{j<s} L[s:, j] L[s:s+b, j]^T,
            # one prior column panel per scan step (bounds the live copies).
            def body(Pc, j, W=W, s=s, m=m):
                col = lax.dynamic_slice(W, (s, j), (m, b))
                top = lax.slice(col, (0, 0), (b, b))
                # matmul_crit: one-pass bf16 drift in this Schur update turns
                # leaf pivots negative and NaNs the factorization (observed
                # at n = 30k in "fast" mode).
                return Pc - matmul_crit(col, top.T), None

            P, _ = lax.scan(body, P, b * jnp.arange(pi))
        Ljj = jnp.linalg.cholesky(lax.slice(P, (0, 0), (b, b)))
        ld = jnp.log(jnp.diagonal(Ljj))
        if n_real < n:
            ld = ld * (jnp.arange(s, s + b) < n_real).astype(dtype)
        half_logdet = half_logdet + jnp.sum(ld)
        if m > b:
            # L[s+b:, s:s+b] = P[b:] L_ss^-T via the explicit panel inverse
            # (bounded memory; the whole current pipeline already forms the
            # full explicit L^-1, so a panel inverse is no looser).
            Ljj_inv = solve_triangular(Ljj, eye_b, lower=True)
            # matmul_crit: this panel feeds every later Schur update — its
            # one-pass errors compound into indefinite trailing blocks.
            below = matmul_crit(lax.slice(P, (b, 0), (m, b)), Ljj_inv.T)
            col = jnp.concatenate([Ljj, below], axis=0)
        else:
            col = Ljj
        W = lax.dynamic_update_slice(W, col, (s, s))
    return W, half_logdet


def _tri_inv_inplace(W, b):
    """W: L (lower, zero strict upper) -> L^-1, in place, right-to-left."""
    n = W.shape[0]
    k = n // b
    eye_b = jnp.eye(b, dtype=W.dtype)
    for pi in range(k - 1, -1, -1):
        s = pi * b
        t = s + b
        Ljj = lax.slice(W, (s, s), (t, t))
        Xjj = solve_triangular(Ljj, eye_b, lower=True)
        if t < n:
            m = n - t
            L_col = lax.slice(W, (t, s), (n, t))  # original L, read pre-write

            # X[t:, s:t] = -X[t:, t:] L[t:, s:t] X_ss: trailing-inverse column
            # panels (already written) times b x b blocks of the original L.
            def body(acc, j, W=W, L_col=L_col, t=t, m=m):
                Xj = lax.dynamic_slice(W, (t, j), (m, b))
                Lblk = lax.dynamic_slice(L_col, (j - t, 0), (b, b))
                return acc + matmul(Xj, Lblk), None

            js = t + b * jnp.arange(k - pi - 1)
            acc, _ = lax.scan(body, jnp.zeros((m, b), W.dtype), js)
            col = jnp.concatenate([Xjj, -matmul(acc, Xjj)], axis=0)
        else:
            col = Xjj
        W = lax.dynamic_update_slice(W, col, (s, s))
    return W


def _lauum_inplace(W, b):
    """W: L^-1 (lower) -> K_hat^-1 = L^-T L^-1, full symmetric, in place.

    Column panel s reads only columns >= s (still L^-1) and writes column s
    (lower+diag) plus its mirrored row into the strict upper — regions never
    read by later panels.
    """
    n = W.shape[0]
    for pi in range(n // b):
        s = pi * b
        m = n - s

        # B = L^-1[s:, s:]^T @ L^-1[s:, s:s+b], one b-row panel per scan step.
        def body(acc, r, W=W, s=s, m=m):
            rows = lax.dynamic_slice(W, (r, s), (b, m))
            rcol = lax.slice(rows, (0, 0), (b, b))
            return (
                acc + jnp.einsum("rm,rc->mc", rows, rcol,
                                 precision=mm_precision()),
                None,
            )

        B, _ = lax.scan(body, jnp.zeros((m, b), W.dtype),
                        s + b * jnp.arange(m // b))
        W = lax.dynamic_update_slice(W, B, (s, s))
        if s + b < n:
            W = lax.dynamic_update_slice(W, B[b:].T, (s, s + b))
    return W


def _check_padded(n, n_real, block):
    if n % block:
        raise ValueError(f"padded n={n} must be a multiple of block={block}")
    if not 0 < n_real <= n:
        raise ValueError(f"n_real={n_real} out of range for padded n={n}")


def ard_gram_inverse_inplace(
    log_signal_sq, log_length, log_noise_sq, x, n_real: int, block: int = 2048,
    return_half_logdet: bool = False,
):
    """K_hat^-1 for K_hat = K_ard(x[:n_real]) + noise I, padded block-diagonal.

    ``x`` must be row-padded to a multiple of ``block`` (see :func:`pad_rows`);
    rows >= ``n_real`` are masked so the padded system is exactly
    ``blockdiag(K_hat, (1 + noise) I)``. Returns the full [n_pad, n_pad]
    symmetric inverse; the top-left [n_real, n_real] block is K_hat^-1.
    With ``return_half_logdet=True`` returns ``(Kinv, half_logdet)`` where the
    half log-det covers the real block only (the NLML log-det term).

    Not differentiable — this is the forward of the :mod:`gpscore.ops.loo_fused`
    custom-VJP cores, whose backward streams the parameter contraction off the
    returned inverse.
    """
    _check_padded(x.shape[0], n_real, block)
    W, hld = _gram_chol_inplace(log_signal_sq, log_length, log_noise_sq, x,
                                n_real, block)
    W = _tri_inv_inplace(W, block)
    Kinv = _lauum_inplace(W, block)
    if return_half_logdet:
        return Kinv, hld
    return Kinv


def ard_gram_chol_inplace(
    log_signal_sq, log_length, log_noise_sq, x, n_real: int, block: int = 2048
):
    """(L, half_logdet) for the masked-padded K_hat, ~n^2 + O(n*block) peak.

    Stage 1 only — for consumers that need triangular solves against K_hat
    rather than its explicit inverse (fused NLML primal, large-n predictive).
    """
    _check_padded(x.shape[0], n_real, block)
    return _gram_chol_inplace(log_signal_sq, log_length, log_noise_sq, x,
                              n_real, block)
