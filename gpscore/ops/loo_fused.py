"""Fused ARD-Gram + solve cores for the large-n dense path (LOO and k-fold).

The composed objective ``params -> K -> solve core -> score`` built from
:func:`gpscore.ops.kernels.gram` + :func:`gpscore.ops.linalg.loo_solve_diag`
(or ``kfold_solve_blocks``) holds, across a value_and_grad, FOUR n^2 fp32
buffers at peak: the Gram K (kept as the kernel's autodiff residual), K^-1
(the solve core's residual), the materialized cotangent K_bar, and a matmul
temp. At n = 30k that is ~14.4 GB — beyond one v5e chip (measured round-1
ceiling: n = 20k).

This module fuses each segment into ONE custom-VJP function so the residual
set is chosen by hand:

- forward: K_hat is built, factored, and inverted — then *discarded*; only
  (K^-1, a) are saved. Peak live set: 2 n^2; at n >= _INPLACE_MIN_N the
  forward instead runs the in-place potri pipeline
  (:mod:`gpscore.ops.potri_inplace`), peaking at ~n^2 + O(n block).
- backward: the parameter gradient is the contraction
      theta_bar = sum_ij K_hat_bar_ij * dK_hat_ij/dtheta,
      K_hat_bar = -(K^-1 a_bar) a^T - K^-1 S(cot) K^-1
  with S(cot) = diag(d_bar) for LOO and blockdiag(A_bar) for k-fold. It
  streams over ROW BLOCKS: each block recomputes its Gram rows from x
  (O(nb n d), trivial), forms its K_hat_bar rows (the one O(n^2 nb) GEMM —
  summed over blocks this is the same n^3 GEMM the unfused path does), and
  reduces into the O(d) parameter gradient. Neither K_bar nor K is ever
  materialized: peak live set n^2 + O(block * n).

The ARD chain rule, with z = x * exp(-log_length) the scaled inputs and
C = K_hat_bar ∘ K (elementwise):

    dK_ij/dlog_signal_sq = K_ij
    dK_ij/dlog_length_k  = K_ij (z_ik - z_jk)^2
    dK_hat_ii/dlog_noise = exp(log_noise_sq)

    log_signal_bar = sum(C)
    log_length_bar_k = sum_i r_i z_ik^2 + sum_j c_j z_jk^2 - 2 sum_i z_ik (Cz)_ik
                       (r/c = row/col sums of C — the expand-and-subtract
                        trick applied to the *gradient* contraction)
    log_noise_bar  = exp(log_noise_sq) * trace(K_hat_bar)

Replaces the reference's O(n^3)-per-iteration dense CPU LOO/k-fold that caps
it at n = 500 (`kin40k-FULL-compare.py:196,209,507`); selected automatically
by ``make_objective`` for exact-model ARD objectives at large n.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gpscore.ops import linalg
from gpscore.ops.block_cholesky import tri_inverse_lower
from gpscore.ops.kernels import ard_gram, gram
from gpscore.utils.precision import matmul, matmul_acc32, storage_dtype


# At and above this n, the forward routes through the in-place potri pipeline
# (gpscore.ops.potri_inplace). Measured on one v5e chip (CRPS-LOO
# value_and_grad, d=8, block=2048): temp 1.45-1.56 n^2 vs 2.01 n^2 AND
# 1.6-1.7x faster than the tri_inverse + square-GEMM forward (n=8192:
# 0.120 s vs 0.191 s; n=16384: 0.627 s vs 1.079 s) — the potri stages do
# ~n^3 MACs total where the standard forward spends ~2 n^3 on the full
# square L^-T L^-1 GEMM alone. So it is the default whenever the fused core
# itself engages; the memory headroom moves the single-chip HBM ceiling from
# n = 45k to ~60k (RESULTS.md ceiling table).
_INPLACE_MIN_N = 8192


def _resolve_inplace(n: int, inplace):
    return (n >= _INPLACE_MIN_N) if inplace is None else bool(inplace)


# Auto panel-width envelope (one 16 GB v5e chip). The ceiling-size runs used
# to need a hand-chosen --block (61,440 fp32 wants 1024, 62,464 wants 512 —
# RESULTS.md); the fold path's divisor-aware _panel_width moved three
# ceilings, so the same policy applies here: widest pad-free width whose
# stream temps still fit next to the n^2 residual.
_HBM_BYTES = 15.75e9
# ~4 fp32 [n, block] stream temps live at the peak (backward row panel +
# Gram rows + sandwich partials; measured envelope at the 57-62k ceilings).
_STREAM_TEMP_ROWS = 4


def auto_block(n: int, storage_bytes: int | None = None) -> int:
    """Divisor-aware panel/stream width for the fused cores at size ``n``.

    Candidates 2048/1024/512 (the measured expander-temp knee bounds them
    below; wider panels only help while the O(n * block) temps are noise).
    Pick the WIDEST candidate that (a) divides n — zero padding, no
    pad-slice copies — and (b) leaves its ~4 fp32 [n, block] stream temps
    inside the HBM budget next to the n^2 storage-dtype residual. When the
    budget admits none (the absolute-ceiling sizes), the narrowest divisor
    wins; when nothing divides, 2048 (padded) — pre-auto behavior.
    """
    if storage_bytes is None:
        storage_bytes = jnp.dtype(storage_dtype()).itemsize
    cands = [c for c in (2048, 1024, 512) if n % c == 0]
    if not cands:
        return 2048
    free = _HBM_BYTES - float(n) * n * storage_bytes
    for c in cands:
        if _STREAM_TEMP_ROWS * 4.0 * n * c <= free:
            return c
    return cands[-1]


def _resolve_block(n: int, block) -> int:
    return auto_block(n) if block is None else int(block)


def _gram_inverse(log_signal_sq, log_length, log_noise_sq, x, y,
                  block=2048, inplace=False):
    """(a, Kinv, x_maybe_padded) for K_hat = K_ard(x) + noise I. K_hat is dead
    after the factorization — the callers save only Kinv.

    With ``inplace=True`` the whole Gram -> factor -> inverse chain runs in one
    n x n buffer (padded up to a multiple of ``block`` with exactly-masked
    rows); ``a`` and ``Kinv`` come back padded and the returned ``x`` is the
    padded design, so the streamed backward runs on the padded system (padded
    cotangent rows are identically zero — see gpscore/ops/potri_inplace.py)."""
    n = x.shape[0]
    if inplace:
        from gpscore.ops import potri_inplace as pp

        n_pad = -(-n // block) * block
        x_pad = pp.pad_rows(x, n_pad)
        y_pad = pp.zero_pad(y.reshape(n), n_pad)
        # storage_dtype() is trace-time: bfloat16 under matmul_mode("bf16"),
        # halving the n^2 HBM term (K^-1 residual AND the forward's working
        # buffer). All O(n)-sized outputs stay fp32 via fp32-accumulating
        # reads (matmul_acc32) — never a mixed-dtype jnp.matmul, which would
        # materialize an n^2 fp32 upcast of the bf16 buffer.
        st = storage_dtype()
        Kinv = pp.ard_gram_inverse_inplace(
            log_signal_sq, log_length, log_noise_sq, x_pad, n, block,
            storage=st,
        )
        a = matmul_acc32(Kinv, y_pad.astype(st).reshape(n_pad, 1))[:, 0]
        return a, Kinv, x_pad
    K = gram(x, x, log_signal_sq, log_length, kind="ard")
    K_hat = K + jnp.exp(log_noise_sq) * jnp.eye(n, dtype=K.dtype)
    L = linalg.chol_factor(K_hat)
    Linv = tri_inverse_lower(L)
    Kinv = matmul(Linv.T, Linv)
    a = matmul(Kinv, y.reshape(n, 1))[:, 0]
    return a, Kinv, x


def _stream_param_grads(
    Kinv, a, w, extra_rows, x, log_signal_sq, log_length, log_noise_sq, block
):
    """Shared streaming backward (module docstring math).

    K_hat_bar rows for one row block are ``-w_b a^T + extra_rows(Kinv_b)``:

    - LOO / k-fold: ``w = K^-1 a_bar`` and
      ``extra_rows = -make_M(Kinv_b) @ Kinv`` (the sandwich term
      -K^-1 S(cot) K^-1 with S = diag(d_bar) or blockdiag(A_bar));
    - NLML: ``K_hat_bar = v_bar (K^-1 - alpha alpha^T)/2``, i.e.
      ``w = (v_bar/2) alpha`` and ``extra_rows = (v_bar/2) Kinv_b`` —
      no second n^3 GEMM at all.

    Returns (log_signal_bar, log_length_bar, log_noise_bar).
    """
    n = a.shape[0]
    d_dim = x.shape[1]
    # fp32 reductions regardless of the K^-1 storage dtype: every block
    # contribution is fp32 (extra_rows contracts bf16 operands with fp32
    # accumulation; the rank-1 term and Gram recomputation are fp32).
    dtype = jnp.float32

    z = x * jnp.exp(-jnp.reshape(log_length, (1, -1)))

    nb = min(block, n)
    n_full = (n // nb) * nb

    def _block(Kinv_b, w_b, x_b, z_b, off, size):
        Kb_hat_bar = -matmul(w_b.reshape(size, 1), a.reshape(1, n)) + extra_rows(
            Kinv_b
        )
        K_b = ard_gram(x_b, x, log_signal_sq, log_length)
        C_b = Kb_hat_bar * K_b
        s_b = jnp.sum(C_b)
        r_b = jnp.sum(C_b, axis=1)
        c_b = jnp.sum(C_b, axis=0)
        r_t = jnp.sum(r_b[:, None] * (z_b * z_b), axis=0)
        cr = jnp.sum(z_b * matmul(C_b, z), axis=0)
        off = jnp.asarray(off, jnp.int32)
        diag_seg = jax.lax.dynamic_slice(
            Kb_hat_bar, (jnp.zeros((), jnp.int32), off), (size, size)
        )
        return s_b, r_t, c_b, cr, jnp.trace(diag_seg)

    def body(carry, xs):
        s_acc, r_acc, c_acc, x_acc, t_acc = carry
        Kinv_b, w_b, x_b, z_b, off = xs
        s_b, r_t, c_b, cr, tr = _block(Kinv_b, w_b, x_b, z_b, off, nb)
        return (s_acc + s_b, r_acc + r_t, c_acc + c_b, x_acc + cr,
                t_acc + tr), None

    init = (
        jnp.zeros((), dtype),
        jnp.zeros((d_dim,), dtype),
        jnp.zeros((n,), dtype),
        jnp.zeros((d_dim,), dtype),
        jnp.zeros((), dtype),
    )
    if n_full:
        k = n_full // nb
        xs = (
            Kinv[:n_full].reshape(k, nb, n),
            w[:n_full].reshape(k, nb),
            x[:n_full].reshape(k, nb, d_dim),
            z[:n_full].reshape(k, nb, d_dim),
            jnp.arange(k, dtype=jnp.int32) * nb,
        )
        (s_acc, r_acc, c_acc, x_acc, t_acc), _ = jax.lax.scan(body, init, xs)
    else:
        s_acc, r_acc, c_acc, x_acc, t_acc = init
    if n_full < n:  # static remainder block
        tail = n - n_full
        s_b, r_t, c_b, cr, tr = _block(
            Kinv[n_full:], w[n_full:], x[n_full:], z[n_full:],
            jnp.int32(n_full), tail,
        )
        s_acc, r_acc, c_acc = s_acc + s_b, r_acc + r_t, c_acc + c_b
        x_acc, t_acc = x_acc + cr, t_acc + tr

    log_length_bar = r_acc + matmul(c_acc.reshape(1, n), z * z)[0] - 2.0 * x_acc
    log_length_bar = jnp.reshape(log_length_bar, jnp.shape(log_length))
    log_noise_bar = jnp.exp(log_noise_sq) * t_acc
    return s_acc, log_length_bar, log_noise_bar


# --------------------------------------------------------------------------
# LOO: (a, d) = (K_hat^-1 y, diag K_hat^-1)
# --------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def ard_loo_solve_diag(log_signal_sq, log_length, log_noise_sq, x, y,
                       block=None, inplace=None):
    """(a, d) = (K_hat^-1 y, diag K_hat^-1) for K_hat = K_ard(x) + noise_sq I,
    differentiable w.r.t. the three log-hyperparameters and y (x is data;
    its cotangent is zero). ``block`` is the backward streaming row-block.
    ``inplace`` selects the n^2-peak potri forward (None = auto by n)."""
    n = x.shape[0]
    inplace = _resolve_inplace(n, inplace)
    block = _resolve_block(n, block)
    a, Kinv, _ = _gram_inverse(log_signal_sq, log_length, log_noise_sq, x, y,
                               block, inplace)
    return a[:n], jnp.diagonal(Kinv)[:n].astype(jnp.float32)


def _loo_fwd(log_signal_sq, log_length, log_noise_sq, x, y, block, inplace):
    n = x.shape[0]
    inplace = _resolve_inplace(n, inplace)
    block = _resolve_block(n, block)
    a, Kinv, x_pad = _gram_inverse(log_signal_sq, log_length, log_noise_sq,
                                   x, y, block, inplace)
    return (a[:n], jnp.diagonal(Kinv)[:n].astype(jnp.float32)), (
        Kinv, a, log_signal_sq, log_length, log_noise_sq, x_pad
    )


def _loo_bwd(block, inplace, res, cot):
    Kinv, a, log_signal_sq, log_length, log_noise_sq, x = res
    a_bar, d_bar = cot
    n_real, n_pad = a_bar.shape[0], a.shape[0]
    block = _resolve_block(n_real, block)
    if n_pad > n_real:
        from gpscore.ops.potri_inplace import zero_pad

        a_bar = zero_pad(a_bar, n_pad)
        d_bar = zero_pad(d_bar, n_pad)
    w = matmul_acc32(Kinv, a_bar.astype(Kinv.dtype).reshape(n_pad, 1))[:, 0]

    def extra_rows(Kinv_b):
        # cast the scaled rows DOWN to the storage dtype for the sandwich
        # GEMM (fp32-accumulated); a mixed-dtype matmul would upcast Kinv.
        M = (Kinv_b * d_bar[None, :]).astype(Kinv.dtype)
        return -matmul_acc32(M, Kinv)

    s_bar, l_bar, n_bar = _stream_param_grads(
        Kinv, a, w, extra_rows,
        x, log_signal_sq, log_length, log_noise_sq, block,
    )
    x_bar = jnp.zeros((n_real,) + x.shape[1:], x.dtype)
    return s_bar, l_bar, n_bar, x_bar, w[:n_real]


ard_loo_solve_diag.defvjp(_loo_fwd, _loo_bwd)


# --------------------------------------------------------------------------
# k-fold: (a, A) = (K_hat^-1 y, stacked diagonal blocks [K_hat^-1]_bb)
# --------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def ard_kfold_solve_blocks(log_signal_sq, log_length, log_noise_sq, x, y,
                           fold_k: int, block=None, inplace=None):
    """Fused Gram + k-fold solve: the large-n counterpart of
    :func:`gpscore.ops.linalg.kfold_solve_blocks` (reference fold conditionals,
    `kin40k-FULL-compare.py:507-530`). Requires n % fold_k == 0.

    The k-fold cotangent is A_bar [fold_k, nfold, nfold]; its K_hat_bar term
    -K^-1 blockdiag(A_bar) K^-1 streams per row block as
    einsum('sfi,fij->sfj') over the fold columns of K^-1's rows.
    ``inplace`` selects the n^2-peak potri forward (None = auto by n).
    """
    n = x.shape[0]
    inplace = _resolve_inplace(n, inplace)
    block = _resolve_block(n, block)
    a, Kinv, _ = _gram_inverse(log_signal_sq, log_length, log_noise_sq, x, y,
                               block, inplace)
    return a[:n], _diag_blocks(Kinv, fold_k, n)


def _diag_blocks(Kinv, fold_k: int, n: int):
    """Fold-diagonal blocks of the top-left [n, n] of (possibly padded) Kinv."""
    if n % fold_k:
        raise ValueError(f"n={n} not divisible by fold_k={fold_k}")
    nf = n // fold_k
    # Blocks come back in Kinv's STORAGE dtype (f16/bf16 under the 2-byte
    # modes): the fold consumer (gpscore/ops/fold_core.py) upcasts per fold,
    # so no [fold_k, nf, nf] fp32 stack ever exists at the interface.
    return jnp.stack([
        jax.lax.dynamic_slice(Kinv, (b * nf, b * nf), (nf, nf))
        for b in range(fold_k)
    ])


def _kfold_fwd(log_signal_sq, log_length, log_noise_sq, x, y, fold_k, block,
               inplace):
    n = x.shape[0]
    inplace = _resolve_inplace(n, inplace)
    block = _resolve_block(n, block)
    a, Kinv, x_pad = _gram_inverse(log_signal_sq, log_length, log_noise_sq,
                                   x, y, block, inplace)
    return (a[:n], _diag_blocks(Kinv, fold_k, n)), (
        Kinv, a, log_signal_sq, log_length, log_noise_sq, x_pad
    )


def _kfold_bwd(fold_k, block, inplace, res, cot):
    Kinv, a, log_signal_sq, log_length, log_noise_sq, x = res
    a_bar, A_bar = cot
    n_real, n_pad = a_bar.shape[0], a.shape[0]
    block = _resolve_block(n_real, block)
    nf = n_real // fold_k
    if n_pad > n_real:
        from gpscore.ops.potri_inplace import zero_pad

        a_bar = zero_pad(a_bar, n_pad)

    w = matmul_acc32(Kinv, a_bar.astype(Kinv.dtype).reshape(n_pad, 1))[:, 0]

    def extra_rows(Kinv_b):
        size = Kinv_b.shape[0]
        # rows of K^-1 blockdiag(A_bar): per fold f, Kinv_b[:, cols_f] @ A_bar_f
        # (padded columns of K^-1 carry zero cotangent — A_bar has no pad fold).
        # Static fold loop over contiguous column slices, NOT a single
        # reshape-to-[size, fold_k, nf] einsum: the 3-D einsum operand makes
        # XLA assign the scan's whole Kinv input a fold-tiled physical layout,
        # materializing a full n^2 layout copy of K^-1 next to K^-1 itself
        # (measured +1 n^2 at n = 16k; the slices below are O(size * nf)).
        M = jnp.concatenate(
            [
                matmul_acc32(
                    jax.lax.slice(Kinv_b, (0, f * nf), (size, (f + 1) * nf)),
                    A_bar[f].astype(Kinv.dtype),
                )
                for f in range(fold_k)
            ],
            axis=1,
        )
        if n_pad > n_real:
            M = jnp.concatenate(
                [M, jnp.zeros((size, n_pad - n_real), M.dtype)], axis=1
            )
        return -matmul_acc32(M.astype(Kinv.dtype), Kinv)

    s_bar, l_bar, n_bar = _stream_param_grads(
        Kinv, a, w, extra_rows,
        x, log_signal_sq, log_length, log_noise_sq, block,
    )
    x_bar = jnp.zeros((n_real,) + x.shape[1:], x.dtype)
    return s_bar, l_bar, n_bar, x_bar, w[:n_real]


ard_kfold_solve_blocks.defvjp(_kfold_fwd, _kfold_bwd)


# --------------------------------------------------------------------------
# NLML: 0.5 n log 2pi + 0.5 log det K_hat + 0.5 y^T K_hat^-1 y
# --------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def ard_nlml(log_signal_sq, log_length, log_noise_sq, x, y,
             block=None, inplace=None):
    """Fused large-n NLML (reference inline,
    `SIMPLE-DATA FULL-comapre.py:292-296`; the exact-GP baseline objective).

    Primal (no grad): Gram-fused in-place Cholesky + one triangular solve —
    n^3/3 MACs, ~n^2 peak. Under value_and_grad: the potri forward (~n^3
    MACs) plus an O(n^2)-FLOP streamed backward, because NLML's cotangent
    ``K_hat_bar = (K^-1 - alpha alpha^T)/2`` reads directly off K^-1's rows —
    unlike the LOO/k-fold cores there is NO second n^3 backward GEMM, so a
    fused NLML step is the cheapest large-n objective step in the library.
    (The unfused path via ``gram`` + ``nlml_exact`` differentiates through the
    XLA Cholesky and holds K, L, and their cotangents: ~3-4 n^2 peak.)
    """
    n = x.shape[0]
    inplace = _resolve_inplace(n, inplace)
    block = _resolve_block(n, block)
    const = 0.5 * n * jnp.log(2.0 * jnp.pi).astype(x.dtype)
    if inplace:
        from gpscore.ops import potri_inplace as pp

        n_pad = -(-n // block) * block
        x_pad = pp.pad_rows(x, n_pad)
        y_pad = pp.zero_pad(y.reshape(n), n_pad)
        st = storage_dtype()
        L, hld = pp.ard_gram_chol_inplace(
            log_signal_sq, log_length, log_noise_sq, x_pad, n, block,
            storage=st,
        )
        z = jax.scipy.linalg.solve_triangular(
            L, y_pad.astype(st).reshape(n_pad, 1), lower=True
        )
        return const + hld + 0.5 * jnp.sum(z.astype(jnp.float32) ** 2)
    K = gram(x, x, log_signal_sq, log_length, kind="ard")
    K_hat = K + jnp.exp(log_noise_sq) * jnp.eye(n, dtype=K.dtype)
    L = linalg.chol_factor(K_hat)
    z = jax.scipy.linalg.solve_triangular(L, y.reshape(n, 1), lower=True)
    return const + linalg.half_logdet(L) + 0.5 * jnp.sum(z * z)


def _nlml_fwd(log_signal_sq, log_length, log_noise_sq, x, y, block, inplace):
    n = x.shape[0]
    inplace = _resolve_inplace(n, inplace)
    block = _resolve_block(n, block)
    const = 0.5 * n * jnp.log(2.0 * jnp.pi).astype(x.dtype)
    if inplace:
        from gpscore.ops import potri_inplace as pp

        n_pad = -(-n // block) * block
        x_pad = pp.pad_rows(x, n_pad)
        y_pad = pp.zero_pad(y.reshape(n), n_pad)
        Kinv, hld = pp.ard_gram_inverse_inplace(
            log_signal_sq, log_length, log_noise_sq, x_pad, n, block,
            return_half_logdet=True, storage=storage_dtype(),
        )
        a = matmul_acc32(Kinv, y_pad.astype(Kinv.dtype).reshape(n_pad, 1))[:, 0]
        quad = 0.5 * jnp.sum(y_pad * a)
    else:
        K = gram(x, x, log_signal_sq, log_length, kind="ard")
        K_hat = K + jnp.exp(log_noise_sq) * jnp.eye(n, dtype=K.dtype)
        L = linalg.chol_factor(K_hat)
        hld = linalg.half_logdet(L)
        Linv = tri_inverse_lower(L)
        Kinv = matmul(Linv.T, Linv)
        a = matmul(Kinv, y.reshape(n, 1))[:, 0]
        quad = 0.5 * jnp.sum(y.reshape(n) * a)
    value = const + hld + quad
    return value, (Kinv, a, log_signal_sq, log_length, log_noise_sq, x)


def _nlml_bwd(block, inplace, res, v_bar):
    Kinv, a, log_signal_sq, log_length, log_noise_sq, x = res
    n_real, n_pad = x.shape[0], a.shape[0]
    block = _resolve_block(n_real, block)
    half = 0.5 * v_bar
    w = half * a
    if n_pad > n_real:
        from gpscore.ops.potri_inplace import pad_rows

        x_stream = pad_rows(x, n_pad)
        # Padded K^-1 has (1+noise)^-1 on its pad diagonal; those entries get
        # zero cotangent (the padded system is a constant), so mask pad cols.
        colmask = (jnp.arange(n_pad) < n_real).astype(Kinv.dtype)[None, :]

        def extra_rows(Kinv_b):
            # elementwise upcast of one O(n b) row block only
            return half * (Kinv_b.astype(jnp.float32) * colmask)

    else:
        x_stream = x

        def extra_rows(Kinv_b):
            return half * Kinv_b.astype(jnp.float32)

    s_bar, l_bar, n_bar = _stream_param_grads(
        Kinv, a, w, extra_rows,
        x_stream, log_signal_sq, log_length, log_noise_sq, block,
    )
    y_bar = v_bar * a[:n_real]
    return s_bar, l_bar, n_bar, jnp.zeros_like(x), y_bar


ard_nlml.defvjp(_nlml_fwd, _nlml_bwd)
