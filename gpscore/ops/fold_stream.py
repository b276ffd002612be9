"""Fold-STREAMED fused k-fold objectives: ONE fold's working set live at a time.

Round-4's fold path composed two custom-VJP ops — the fused core
(:func:`gpscore.ops.loo_fused.ard_kfold_solve_blocks`) emitting the STACKED
fold blocks ``A = [K_hat^-1]_bb`` ([k, nb, nb], n^2/k), and the fold consumer
(:mod:`gpscore.ops.fold_core`) whose forward carried a second padded
[k, nb, nb] factor stack and whose backward materialized the A_bar cotangent
stack at the interface. Those three n^2/k-sized stacks (plus the per-fold
fp32 upcasts) are why the fold rules' single-chip ceiling sat 14k rows below
the LOO family's (73,728 vs 88,064 2-byte; 47-51k vs 62,464 fp32 —
RESULTS.md round-4 ceiling tables).

This module fuses the WHOLE chain ``params -> K_hat^-1 -> per-fold
conditionals -> fold statistics`` into one custom-VJP primitive per family
that processes folds ONE AT A TIME off the n^2 K^-1 residual:

- forward: K^-1 via the in-place potri pipeline
  (:mod:`gpscore.ops.potri_inplace`); then a ``lax.fori_loop`` over folds
  (sequential by construction — XLA cannot overlap while-loop iterations, so
  per-fold buffers never coexist across folds): extract fold f's [nb, nb]
  block, factor + invert IN PLACE on the extracted copy at the storage dtype
  (fp32 leaves/accumulation — ``chol_inplace_fori`` + ``tri_inv_fori_lower``),
  emit the O(nb) statistics, DISCARD the factor. Residual: (K^-1, a, e) —
  no factor, no fold stack.
- backward: a second fori over folds RE-FACTORS fold f (k * 2/3 nb^3 =
  n^3 * 2/(3 k^2) extra MACs — ~3% of the step at k = 4), assembles its
  closed-form cotangent A_bar_f (the :mod:`gpscore.ops.fold_core` adjoint
  math, per fold), and immediately streams that fold's sandwich term
  ``-K^-1 E_f A_bar_f E_f^T K^-1`` of

      K_hat_bar = -w a^T - sum_f K^-1[:, cols_f] A_bar_f K^-1[cols_f, :],
      w = K^-1 a_bar_total

  into the O(d) ARD parameter-gradient accumulators (the
  :mod:`gpscore.ops.loo_fused` chain-rule identities), row block by row
  block, with the second operand read as loop-offset [sb, nb] slices of the
  SYMMETRIC K^-1 (``K^-1[cols_f, cb] = K^-1[cb, cols_f]^T`` — dim-1
  contractions, nothing hoisted). A_bar_f is dead before fold f+1 starts.
  The rank-1 ``-w a^T`` term needs no n^2 stream at all: its contractions
  collapse onto d+2 kernel matvecs (``C = (-w a^T) o K`` has rank-1
  structure), computed by one pass of
  :func:`~gpscore.ops.potri_inplace.ard_khat_matmul_streamed`.

Peak live set across a value_and_grad (k = fold_k, st = storage bytes):
  n^2 st  (K^-1 residual)
  + 1x (dss) / 2x (kc, es) [nb, nb] st fold transients  (nb = n/k)
  + O(n * block) stream temps
vs round-4's n^2 + 2-3 n^2/k stacks + nb^2 fp32 upcasts. At k = 4 the fold
working set drops from ~n^2/2 to n^2/16-3n^2/16, which is what moves the
fold-rule ceilings to ~the LOO ceiling (measured rows: RESULTS.md round-5
ceiling tables).

Per-fold cotangent assembly (fold_core math, re-plumbed for one live block):

- dss (want_inv_diag=False): A_bar_f = (hld_bar/2) A^-1 - sym(u e^T) with
  u = A^-1 e_bar. The backward factors THROUGH the in-place lauum
  (``_lauum_fori``), so A^-1 itself is the single live block and the
  assembly is one fused elementwise epilogue — no Li^T Li GEMM, no second
  buffer.
- kc (want_inv_diag=True): adds -A^-1 diag(d_bar) A^-1, assembled in ROW
  STRIPS off the in-place A^-1 (live: A^-1 + the building A_bar_f).
- es: needs the factor inverse Li itself (the collapsed sample-path Cholesky
  VJP, fold_core's derivation): T = Li^T Phi(eps G^T) Li accumulated
  DIRECTLY in row strips — W1 = Phi(H) Li is never materialized; live:
  Li + T (2 blocks, same as kc).

Reference analogue: the per-fold conditional scoring loops of
`kin40k-FULL-compare.py:500-543` (DSS), `:616-663` (ES) and
`KIN40K-COMPARE-ALL-FITC-20.py:667-720` (kc), which re-factor per fold at
n = 500; same math, streamed so one 16 GB chip takes n ~ 80k+.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from gpscore.ops import fold_core, potri_inplace
from gpscore.ops.kernels import ard_gram, gram
from gpscore.ops.loo_fused import (_gram_inverse, _resolve_block,
                                   _resolve_inplace)
from gpscore.utils.precision import matmul_acc32, mm_precision

# Same per-fold dispatch knee as fold_core: below this fold size the
# factorization uses XLA's cholesky/solve expanders (fp32); at or above, the
# in-place bounded-trace stages at the storage dtype.
_INPLACE_MIN_NB = 2048

f32 = jnp.float32


def _dot32(a_, b_):
    """2-D matmul, fp32 accumulation AND output whatever the operand dtype."""
    return lax.dot_general(
        a_, b_, (((1,), (0,)), ((), ())),
        precision=mm_precision(), preferred_element_type=f32,
    )


def _zpad(v, m):
    """Zero-pad the leading axis of a 1-D/2-D array to length m."""
    if v.shape[0] == m:
        return v
    pad = [(0, m - v.shape[0])] + [(0, 0)] * (v.ndim - 1)
    return jnp.pad(v, pad)


def _pad_blockdiag_identity_2d(A, nb_pad):
    """[nb, nb] -> [nb_pad, nb_pad] as blockdiag(A, I) (exact factor padding:
    chol(blockdiag(A, I)) = blockdiag(chol(A), I), pad log-dets are 0)."""
    nb = A.shape[0]
    if nb_pad == nb:
        return A
    out = jnp.zeros((nb_pad, nb_pad), A.dtype)
    out = lax.dynamic_update_slice(out, A, (0, 0))
    idx = jnp.arange(nb, nb_pad)
    return out.at[idx, idx].set(1.0)


def _fold_pad(nb: int) -> int:
    """Padded per-fold width: the _panel_width grid when the in-place fold
    stages engage, nb itself on the small-nb expander path."""
    return fold_core._panel_width(nb)[1] if nb >= _INPLACE_MIN_NB else nb


def _prep_block(Df, nb):
    """Pad an extracted [nb, nb] fold block blockdiag(A, I) to the per-fold
    panel grid, behind a barrier (XLA otherwise fuses the extraction into
    the fold chain's first kernels). Shared with the mesh-sharded streamed
    step (:mod:`gpscore.parallel.sharded_fold_stream`), whose blocks arrive
    psum-assembled instead of sliced.

    Layout discipline (BENCH_NOTES "layout war"): the block is fed
    UNTRANSPOSED on the in-place path — ``chol_inplace_fori`` keeps a
    row-major carry, so nothing downstream votes column-major and K^-1's
    layout survives through the fold fori's invariant tuple slot. (A
    transposed feed here — the round-2 trick that protects the EXPANDER
    leaves — propagates a {0,1} vote through the slice into K^-1 itself:
    measured at n = 57,344 as TWO live 12.25 GB relayout copies, the
    whole-n^2 kind, one per layout.) The expander path (< _INPLACE_MIN_NB,
    toy/test sizes only) keeps the transposed (bitcast — the block is
    symmetric) feed, absorbing the cholesky custom-call's column-major
    operand demand at the slice."""
    if nb < _INPLACE_MIN_NB:
        Df = jnp.swapaxes(Df, 0, 1)
    Ap = _pad_blockdiag_identity_2d(Df, _fold_pad(nb))
    return lax.optimization_barrier(Ap)


def _extract_fold(Kinv, foldi, nb):
    """Fold foldi's prepped diagonal block of K^-1 (see :func:`_prep_block`)."""
    return _prep_block(
        lax.dynamic_slice(Kinv, (foldi * nb, foldi * nb), (nb, nb)), nb
    )


def _li_from_prepped(Ap, nb):
    """(Li, half_logdet) from a prepped fold block: lower-triangular factor
    INVERSE of A_f = [K_hat^-1]_ff, [nb_pad, nb_pad] in the storage dtype
    with an exactly-zero strict upper (identity-padded; pad rows contribute
    0 to the half log-det). Factorization + inversion run IN PLACE on the
    extracted copy: one live block."""
    st = Ap.dtype
    if nb < _INPLACE_MIN_NB:
        La = jnp.linalg.cholesky(Ap.astype(f32))
        hld = jnp.sum(jnp.log(jnp.diagonal(La)))
        eye = jnp.eye(Ap.shape[0], dtype=f32)
        Li = jax.scipy.linalg.solve_triangular(La, eye, lower=True)
        return Li.astype(st), hld
    b, _ = fold_core._panel_width(nb)
    # unroll=True: the fori while-carry double-buffers the [nb_pad, nb_pad]
    # block (+0.9 GB at the 61k fp32 / 86k 2-byte frontiers); per-fold panel
    # counts are <= ~21, far below the unrolled compile wall (~60).
    W, hld = potri_inplace.chol_inplace_fori(Ap, b, unroll=True)
    return potri_inplace.tri_inv_fori_lower(W, b, unroll=True), hld


def _ainv_from_prepped(Ap, nb):
    """(A_f^-1, half_logdet) from a prepped fold block: the FULL symmetric
    inverse, [nb_pad, nb_pad] storage dtype (identity-padded), computed in
    place through potrf -> trtri -> lauum on the extracted copy: one live
    block (the dss/kc backward's assembly operand — no factor survives)."""
    st = Ap.dtype
    if nb < _INPLACE_MIN_NB:
        La = jnp.linalg.cholesky(Ap.astype(f32))
        hld = jnp.sum(jnp.log(jnp.diagonal(La)))
        eye = jnp.eye(Ap.shape[0], dtype=f32)
        Li = jax.scipy.linalg.solve_triangular(La, eye, lower=True)
        return _dot32(Li.T, Li).astype(st), hld
    b, _ = fold_core._panel_width(nb)
    # unroll=True: see _li_from_prepped (no while-carry double buffer).
    W, hld = potri_inplace.chol_inplace_fori(Ap, b, unroll=True)
    W, Dstack = potri_inplace._tri_inv_fori(W, b, unroll=True)
    return potri_inplace._lauum_fori(W, Dstack, b, unroll=True), hld


def _fold_Li(Kinv, foldi, nb):
    """(Li, half_logdet) for fold foldi of K^-1 (:func:`_li_from_prepped`)."""
    return _li_from_prepped(_extract_fold(Kinv, foldi, nb), nb)


def _fold_Ainv(Kinv, foldi, nb):
    """(A_f^-1, half_logdet) for fold foldi (:func:`_ainv_from_prepped`)."""
    return _ainv_from_prepped(_extract_fold(Kinv, foldi, nb), nb)


def _solve_e(Li, a_f, nb):
    """e = A^-1 a = Li^T (Li a), fp32, through barriered factor matvecs (the
    scoped-vmem fusion lesson, fold_core._stats_forward)."""
    st = Li.dtype
    a_p = _zpad(a_f, Li.shape[0]).astype(st)
    t = _dot32(Li, lax.optimization_barrier(a_p)[:, None])
    t = lax.optimization_barrier(t)
    return _dot32(jnp.swapaxes(Li, 0, 1), t.astype(st))[:, 0][:nb]


# ---------------------------------------------------------------------------
# Backward streaming machinery
# ---------------------------------------------------------------------------


def _new_accs(n_pad, d):
    """(s, r_len [d], c [n_pad], xz [d], tr) fp32 zeros — the raw ARD
    chain-rule accumulators of gpscore.ops.loo_fused._stream_param_grads."""
    return (jnp.zeros((), f32), jnp.zeros((d,), f32), jnp.zeros((n_pad,), f32),
            jnp.zeros((d,), f32), jnp.zeros((), f32))


def _sandwich_pass(Kinv, Ab_st, foldi, nb, x_pad, z, log_signal_sq,
                   log_length, sb, accs):
    """Accumulate the contraction of S_f = -K^-1[:, cols_f] A_bar_f
    K^-1[cols_f, :] against the ARD chain rule into ``accs``.

    Row blocks of S_f stream through a fori loop: per block,
    M1 = -K^-1[rows, cols_f] A_bar_f (one loop-offset [sb, nb] slice of
    K^-1 — never a hoisted [nb, n] fold-row panel), then S's column panels
    accumulate through a DUS chain reading [sb, nb] slices of the SYMMETRIC
    K^-1 at loop-dependent offsets (dim-1 contractions; one slice live).
    Gram rows are recomputed per block (k passes total over the backward —
    n^2 d MACs each, noise next to the n^3 sandwich GEMM)."""
    n_pad = Kinv.shape[0]
    st = Kinv.dtype
    d = x_pad.shape[1]
    nblocks = n_pad // sb

    def rb_body(rb, accs):
        s_a, r_a, c_a, x_a, t_a = accs
        off = rb * sb
        Kb_cols = lax.dynamic_slice(Kinv, (off, foldi * nb), (sb, nb))
        M1 = (-_dot32(Kb_cols, Ab_st)).astype(st)  # [sb, nb]

        def cb_body(cb, S):
            co = cb * sb
            # K^-1[cols_f, co-panel] = (K^-1[co-panel, cols_f])^T: read the
            # transposed slice so the contraction is dim-1 on both operands.
            ST = lax.dynamic_slice(Kinv, (co, foldi * nb), (sb, nb))
            blk = lax.dot_general(
                M1, ST, (((1,), (1,)), ((), ())),
                precision=mm_precision(), preferred_element_type=f32,
            )
            return lax.dynamic_update_slice(S, blk, (0, co))

        S = lax.fori_loop(0, nblocks, cb_body, jnp.zeros((sb, n_pad), f32))
        x_b = lax.dynamic_slice(x_pad, (off, 0), (sb, d))
        z_b = lax.dynamic_slice(z, (off, 0), (sb, d))
        K_b = ard_gram(x_b, x_pad, log_signal_sq, log_length)
        C_b = S * K_b
        s_a = s_a + jnp.sum(C_b)
        r_b = jnp.sum(C_b, axis=1)
        r_a = r_a + jnp.sum(r_b[:, None] * (z_b * z_b), axis=0)
        c_a = c_a + jnp.sum(C_b, axis=0)
        Cz = jnp.matmul(C_b, z, precision=mm_precision())
        x_a = x_a + jnp.sum(z_b * Cz, axis=0)
        diag_seg = lax.dynamic_slice(S, (0, off), (sb, sb))
        t_a = t_a + jnp.trace(diag_seg)
        return s_a, r_a, c_a, x_a, t_a

    return lax.fori_loop(0, nblocks, rb_body, accs)


def _rank1_accs(log_signal_sq, log_length, log_noise_sq, x_pad, n_real, w, a,
                z, block, inplace, accs):
    """Accumulate the rank-1 term ``K_hat_bar += -w a^T``. Its ARD
    contractions collapse onto d+2 kernel matvecs (C = (-w a^T) o K):

        s     += -w . (K a)               r_i = -w_i (K a)_i
        c_j   += -a_j (K w)_j             (Cz)_ik = -w_i (K (a o z_k))_i
        tr    += -w . a

    so no n^2 stream runs for it. K-matvecs: one streamed pass of
    ard_khat_matmul_streamed on V = [a | w | a o z] minus the noise diagonal
    (pad rows of w/a are zero, so the pad block contributes nothing)."""
    s_a, r_a, c_a, x_a, t_a = accs
    d = z.shape[1]
    V = jnp.concatenate([a[:, None], w[:, None], a[:, None] * z], axis=1)
    if inplace:
        KV = potri_inplace.ard_khat_matmul_streamed(
            log_signal_sq, log_length, log_noise_sq, x_pad, n_real, V, block
        ) - jnp.exp(log_noise_sq) * V
    else:
        K = gram(x_pad, x_pad, log_signal_sq, log_length, kind="ard")
        KV = jnp.matmul(K, V, precision=mm_precision())
    Ka, Kw, Kaz = KV[:, 0], KV[:, 1], KV[:, 2:]
    s_a = s_a - jnp.sum(w * Ka)
    r_a = r_a - jnp.sum((w * Ka)[:, None] * (z * z), axis=0)
    c_a = c_a - a * Kw
    x_a = x_a - jnp.sum(w[:, None] * z * Kaz, axis=0)
    t_a = t_a - jnp.sum(w * a)
    return s_a, r_a, c_a, x_a, t_a


def _combine_accs(accs, log_length, log_noise_sq, z):
    s_a, r_a, c_a, x_a, t_a = accs
    log_length_bar = r_a + jnp.matmul(
        c_a.reshape(1, -1), z * z, precision=mm_precision()
    )[0] - 2.0 * x_a
    log_length_bar = jnp.reshape(log_length_bar, jnp.shape(log_length))
    return s_a, log_length_bar, jnp.exp(log_noise_sq) * t_a


def _stream_width(n_pad, block, inplace):
    return block if (inplace and n_pad % block == 0) else n_pad


# ---------------------------------------------------------------------------
# Stats primitive (dss / kc)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def ard_fold_stats_stream(log_signal_sq, log_length, log_noise_sq, x, y,
                          fold_k: int, want_inv_diag: bool = True,
                          block=None, inplace=None):
    """Fold-streamed fused k-fold statistics (module docstring):

        e [k, nb]   = A_f^-1 [K_hat^-1 y]_f     (fold mean m_f = y_f - e_f)
        hld [k]     = sum log diag chol(A_f)    (DSS log-det term)
        inv_diag [k, nb] = diag(A_f^-1)         (kc fold variances; zeros
                                                 unless ``want_inv_diag``)
        a [n]       = K_hat^-1 y

    for the fold conditionals A_f = [K_hat^-1]_ff of
    K_hat = K_ard(x) + noise I (reference fold scoring,
    `kin40k-FULL-compare.py:500-530`, `KIN40K-COMPARE-ALL-FITC-20.py:667-706`).
    Differentiable w.r.t. the three log-hyperparameters and y. Requires
    n % fold_k == 0. ``block``: potri panel + backward streaming width;
    ``inplace``: None = auto by n (gpscore.ops.loo_fused._resolve_inplace).
    """
    outs, _ = _stats_fwd_impl(log_signal_sq, log_length, log_noise_sq, x, y,
                              fold_k, want_inv_diag, block, inplace)
    return outs


def _stats_fwd_impl(log_signal_sq, log_length, log_noise_sq, x, y, fold_k,
                    want_inv_diag, block, inplace):
    n = x.shape[0]
    if n % fold_k:
        raise ValueError(f"n={n} not divisible by fold_k={fold_k}")
    nb = n // fold_k
    inplace = _resolve_inplace(n, inplace)
    block = _resolve_block(n, block)
    a, Kinv, x_pad = _gram_inverse(log_signal_sq, log_length, log_noise_sq,
                                   x, y, block, inplace)

    def fold_body(foldi, carry):
        e_o, hld_o, d_o = carry
        Li, hld_f = _fold_Li(Kinv, foldi, nb)
        a_f = lax.dynamic_slice(a, (foldi * nb,), (nb,))
        e_f = _solve_e(Li, a_f, nb)
        e_o = lax.dynamic_update_slice(e_o, e_f[None], (foldi, 0))
        hld_o = hld_o.at[foldi].set(hld_f)
        if want_inv_diag:
            d_f = jnp.einsum("ij,ij->j", Li, Li, precision=mm_precision(),
                             preferred_element_type=f32)[:nb]
            d_o = lax.dynamic_update_slice(d_o, d_f[None], (foldi, 0))
        return e_o, hld_o, d_o

    init = (jnp.zeros((fold_k, nb), f32), jnp.zeros((fold_k,), f32),
            jnp.zeros((fold_k, nb), f32))
    e, hld, inv_diag = lax.fori_loop(0, fold_k, fold_body, init)
    outs = (e, hld, inv_diag, a[:n].astype(f32))
    res = (Kinv, a, e, log_signal_sq, log_length, log_noise_sq, x_pad)
    return outs, res


def _stats_fwd(log_signal_sq, log_length, log_noise_sq, x, y, fold_k,
               want_inv_diag, block, inplace):
    return _stats_fwd_impl(log_signal_sq, log_length, log_noise_sq, x, y,
                           fold_k, want_inv_diag, block, inplace)


def _fold_cot_stats(Ainv, e_f, e_bar_f, hld_bar_f, d_bar_f, nb,
                    want_inv_diag):
    """(A_bar_f [nb, nb] storage dtype, u [nb_pad] fp32) — the closed-form
    fold cotangent off the in-place full inverse (fold_core math):

        u     = A^-1 e_bar
        A_bar = (hld_bar/2) A^-1 - sym(u e^T) [- A^-1 diag(d_bar) A^-1]

    dss path (no inv-diag term): one fused elementwise epilogue over A^-1 —
    A^-1 itself is the only [nb, nb] live block. kc path: row strips
    (A^-1[r, :] * d_bar) @ A^-1, so A^-1 and the building A_bar coexist but
    no third block does."""
    st = Ainv.dtype
    nb_pad = Ainv.shape[0]
    e_bar_p = _zpad(e_bar_f, nb_pad)
    e_p = _zpad(e_f, nb_pad)
    t = _dot32(Ainv, lax.optimization_barrier(e_bar_p).astype(st)[:, None])
    u = lax.optimization_barrier(t[:, 0])
    c_h = 0.5 * hld_bar_f
    if not want_inv_diag:
        Ab = (c_h * Ainv.astype(f32)
              - 0.5 * (u[:, None] * e_p[None, :] + e_p[:, None] * u[None, :]))
        return Ab.astype(st)[:nb, :nb], u
    d_st = _zpad(d_bar_f, nb_pad).astype(st)
    sw, sp = fold_core._panel_width(nb_pad)
    sb = sw if (sp == nb_pad and nb_pad > sw) else nb_pad
    Ab = jnp.zeros((nb_pad, nb_pad), st)

    def strip(r0i, Ab):
        r0 = r0i * sb
        Ar = lax.dynamic_slice(Ainv, (r0, 0), (sb, nb_pad))
        B_r = _dot32((Ar * d_st[None, :]).astype(st), Ainv)
        u_r = lax.dynamic_slice(u, (r0,), (sb,))
        e_r = lax.dynamic_slice(e_p, (r0,), (sb,))
        row = (c_h * Ar.astype(f32) - B_r
               - 0.5 * (u_r[:, None] * e_p[None, :]
                        + e_r[:, None] * u[None, :]))
        return lax.dynamic_update_slice(Ab, row.astype(st), (r0, 0))

    Ab = lax.fori_loop(0, nb_pad // sb, strip, Ab)
    return Ab[:nb, :nb], u


def _stats_bwd(fold_k, want_inv_diag, block, inplace, res, cot):
    Kinv, a, e, log_signal_sq, log_length, log_noise_sq, x_pad = res
    e_bar, hld_bar, d_bar, a_bar_out = cot
    n = fold_k * e.shape[1]
    nb = e.shape[1]
    inplace_r = _resolve_inplace(n, inplace)
    block = _resolve_block(n, block)
    n_pad = Kinv.shape[0]
    st = Kinv.dtype
    d = x_pad.shape[1]
    z = x_pad * jnp.exp(-jnp.reshape(log_length, (1, -1)))
    sb = _stream_width(n_pad, block, inplace_r)

    def fold_body(foldi, carry):
        accs, ub = carry
        Ainv, _ = _fold_Ainv(Kinv, foldi, nb)
        Ab, u = _fold_cot_stats(
            Ainv, e[foldi], e_bar[foldi], hld_bar[foldi],
            d_bar[foldi] if want_inv_diag else e_bar[foldi],
            nb, want_inv_diag,
        )
        ub = lax.dynamic_update_slice(ub, u[:nb], (foldi * nb,))
        accs = _sandwich_pass(Kinv, Ab, foldi, nb, x_pad, z, log_signal_sq,
                              log_length, sb, accs)
        return accs, ub

    accs, ub = lax.fori_loop(
        0, fold_k, fold_body, (_new_accs(n_pad, d), jnp.zeros((n,), f32))
    )
    a_bar = _zpad(a_bar_out.astype(f32) + ub, n_pad)
    w = matmul_acc32(Kinv, a_bar.astype(st)[:, None])[:, 0]
    accs = _rank1_accs(log_signal_sq, log_length, log_noise_sq, x_pad, n,
                       w, a, z, block, inplace_r, accs)
    s_bar, l_bar, n_bar = _combine_accs(accs, log_length, log_noise_sq, z)
    x_bar = jnp.zeros((n, d), x_pad.dtype)
    return s_bar, l_bar, n_bar, x_bar, w[:n]


ard_fold_stats_stream.defvjp(_stats_fwd, _stats_bwd)


# ---------------------------------------------------------------------------
# ES primitive
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def ard_fold_es_stream(log_signal_sq, log_length, log_noise_sq, x, y,
                       key_data, fold_k: int, num_sim: int = 300,
                       beta: float = 1.0, block=None, inplace=None):
    """Fold-streamed fused k-fold ENERGY SCORE: per-fold MC energy scores
    [k] of the block conditionals, end to end from the hyperparameters
    (reference `kin40k-FULL-compare.py:616-657`, S(S-1) pairing
    normalization via gpscore.scoring.rules.energy_score_core).

    Samples are drawn ONE FOLD AT A TIME from counter keys derived off
    ``key_data`` (= ``jax.random.key_data`` of a PRNG key; the same
    fold_core._fold_eps scheme) and regenerated bit-identically in the
    backward — no sample stack, no sample residual. Differentiable w.r.t.
    the three log-hyperparameters and y (key_data gets a float0 cotangent).
    """
    outs, _ = _es_fwd_impl(log_signal_sq, log_length, log_noise_sq, x, y,
                           key_data, fold_k, num_sim, beta, block, inplace)
    return outs


def _es_fwd_impl(log_signal_sq, log_length, log_noise_sq, x, y, key_data,
                 fold_k, num_sim, beta, block, inplace):
    n = x.shape[0]
    if n % fold_k:
        raise ValueError(f"n={n} not divisible by fold_k={fold_k}")
    nb = n // fold_k
    inplace = _resolve_inplace(n, inplace)
    block = _resolve_block(n, block)
    a, Kinv, x_pad = _gram_inverse(log_signal_sq, log_length, log_noise_sq,
                                   x, y, block, inplace)
    st = Kinv.dtype
    nb_pad = _fold_pad(nb)

    def fold_body(foldi, carry):
        scores_o, e_o = carry
        Li, _ = _fold_Li(Kinv, foldi, nb)
        a_f = lax.dynamic_slice(a, (foldi * nb,), (nb,))
        e_f = _solve_e(Li, a_f, nb)
        eps_f = fold_core._fold_eps(key_data, foldi, nb_pad, num_sim)
        zT = _dot32(jnp.swapaxes(Li, 0, 1), eps_f.astype(st))[:nb]
        s_f = fold_core._es_from_cols(zT, e_f, num_sim, beta)
        return scores_o.at[foldi].set(s_f), lax.dynamic_update_slice(
            e_o, e_f[None], (foldi, 0))

    scores, e = lax.fori_loop(
        0, fold_k, fold_body,
        (jnp.zeros((fold_k,), f32), jnp.zeros((fold_k, nb), f32)),
    )
    res = (Kinv, a, e, key_data, log_signal_sq, log_length, log_noise_sq,
           x_pad)
    return scores, res


def _es_fwd(log_signal_sq, log_length, log_noise_sq, x, y, key_data, fold_k,
            num_sim, beta, block, inplace):
    return _es_fwd_impl(log_signal_sq, log_length, log_noise_sq, x, y,
                        key_data, fold_k, num_sim, beta, block, inplace)


def _fold_cot_es(Li, e_f, s_bar_f, key_data, foldi, nb, num_sim, beta):
    """(A_bar_f [nb, nb] storage dtype, u [nb_pad] fp32) for one fold of the
    ES backward: regenerate eps, recompute z, autodiff the O(nb S) score
    arithmetic only, then the collapsed sample-path Cholesky VJP
    (fold_core._fes_bwd math):

        G = Li Y_bar,  H = eps G^T,  W1 = Phi(H) Li   (row strips of H),
        T = Li^T W1,   A_bar = -sym(u e^T) - (T + T^T)/2

    W1 accumulates through a DUS chain in the storage dtype; T is the one
    GEMM where three [nb_pad, nb_pad] blocks (Li, W1, T) briefly coexist —
    the es fold transient is 3 blocks where kc's is 2 and dss's 1.
    Storage-dtype intermediates round at the grade the final A_bar store
    applies anyway; under f16 an intermediate could in principle saturate
    (+/-65504) where an fp32 accumulator would not — fit_gd's non-finite
    masking catches that, and the measured fits never have (ADVICE r4)."""
    st = Li.dtype
    nb_pad = Li.shape[0]
    eps_f = fold_core._fold_eps(key_data, foldi, nb_pad, num_sim).astype(st)
    zT = _dot32(jnp.swapaxes(Li, 0, 1), eps_f)[:nb]
    _, vjp_fn = jax.vjp(
        lambda zT_, e_: fold_core._es_from_cols(zT_, e_, num_sim, beta),
        zT, e_f,
    )
    zT_bar, e_bar_f = vjp_fn(s_bar_f)

    e_bar_p = _zpad(e_bar_f, nb_pad)
    e_p = _zpad(e_f, nb_pad)
    t = _dot32(Li, lax.optimization_barrier(e_bar_p).astype(st)[:, None])
    u = _dot32(jnp.swapaxes(Li, 0, 1),
               lax.optimization_barrier(t).astype(st))[:, 0]
    u = lax.optimization_barrier(u)

    Y_bar = _zpad(zT_bar, nb_pad)
    G = _dot32(Li, Y_bar.astype(st))  # [nb_pad, 2S] fp32
    GT = lax.optimization_barrier(G.astype(st)).T
    sw, sp = fold_core._panel_width(nb_pad)
    sb = sw if (sp == nb_pad and nb_pad > sw) else nb_pad
    jj = lax.iota(jnp.int32, nb_pad)[None, :]
    # T = Li^T Phi(eps G^T) Li accumulates DIRECTLY in row strips:
    # T = sum_r Li[r-strip, :]^T (Phi(H)_r Li) — W1 = Phi(H) Li is never
    # materialized (the W1 DUS chain was a third [nb_pad, nb_pad] live
    # block, and exactly the ~1 GB by which es missed the dss/kc fp32
    # ceiling at n = 61,440: OOM by 983.95M with dss/kc at 84M). Live set:
    # Li + T (+ [sb, *] strip temps) — the same 2-block transient as kc.
    #
    # T accumulates TILE-WISE into a STORAGE-dtype buffer: per row strip r
    # (Hr/W1r [sb, nb_pad] f32 temps), an inner fori over column panels
    # adds the [nb_pad, sb] product into T's panel. The accumulation
    # transient is [nb_pad, sb] — a whole-block fp32 accumulator (and the
    # whole-block fp32 GEMM output a single `T + E_r` add materializes)
    # was 2x the 2-byte Li/Ab and the measured 708 MB es f16 miss at
    # 83,968 while dss/kc ran 86,016 (round-5 probes; a symmetrized
    # E_r + E_r^T variant was measured NOT to help — the two full-block
    # fp32 GEMM outputs coexist). Under 2-byte storage the tile
    # read-modify-write adds ~sqrt(#strips) * eps_st relative rounding to
    # T — noise next to the ES objective's own 1/sqrt(S) MC error (pinned
    # by test_es_reduced_storage_matches_fp32_at_storage_grade); fp32
    # storage keeps fp32 accumulation, only the addition order changes.
    T0 = jnp.zeros((nb_pad, nb_pad), st)
    kc_panels = nb_pad // sb

    def strip(r0i, T):
        r0 = r0i * sb
        Hr = _dot32(lax.dynamic_slice(eps_f, (r0, 0), (sb, 2 * num_sim)), GT)
        gi = (r0 + lax.iota(jnp.int32, sb))[:, None]
        Hr = jnp.where(jj < gi, Hr, jnp.where(jj == gi, 0.5 * Hr, 0.0))
        W1r = _dot32(Hr.astype(st), Li).astype(st)  # [sb, nb_pad]
        LrT = lax.dynamic_slice(Li, (r0, 0), (sb, nb_pad))

        def cpanel(ci, T):
            c0 = ci * sb
            # contract the strip's row index on dim 0 of BOTH operands:
            # fp32 [nb_pad, sb] tile, no transposed Li read of the full
            # block (layout rule: dim-0 contractions on [sb, *] temps)
            blk = lax.dot_general(
                LrT, lax.dynamic_slice(W1r, (0, c0), (sb, sb)),
                (((0,), (0,)), ((), ())),
                precision=mm_precision(), preferred_element_type=f32,
            )
            cur = lax.dynamic_slice(T, (0, c0), (nb_pad, sb))
            return lax.dynamic_update_slice(
                T, (cur.astype(f32) + blk).astype(st), (0, c0)
            )

        return lax.fori_loop(0, kc_panels, cpanel, T)

    T = lax.fori_loop(0, nb_pad // sb, strip, T0)
    # Panel-wise symmetrizing epilogue: Ab[:, c] = -sym(u e^T)[:, c]
    # - (T[:, c] + T[c, :]^T)/2 — T's transpose is only ever read as
    # [sb, nb_pad] slice transposes (the allowed strip class), never as a
    # whole-block copy (the third live block that cost the fp32 es path
    # 60,416: OOM by 747 MB with dss/kc running it). Li is dead here; the
    # live set is T + the building Ab.
    Ab0 = jnp.zeros((nb_pad, nb_pad), st)

    def sym_panel(ci, Ab):
        c0 = ci * sb
        Tc = lax.dynamic_slice(T, (0, c0), (nb_pad, sb)).astype(f32)
        Tr = lax.dynamic_slice(T, (c0, 0), (sb, nb_pad)).astype(f32)
        u_c = lax.dynamic_slice(u, (c0,), (sb,))
        e_c = lax.dynamic_slice(e_p, (c0,), (sb,))
        col = (-0.5 * (u[:, None] * e_c[None, :] + e_p[:, None] * u_c[None, :])
               - 0.5 * (Tc + jnp.swapaxes(Tr, 0, 1))).astype(st)
        return lax.dynamic_update_slice(Ab, col, (0, c0))

    Ab = lax.fori_loop(0, kc_panels, sym_panel, Ab0)
    return Ab[:nb, :nb], u


def _es_bwd(fold_k, num_sim, beta, block, inplace, res, s_bar):
    import numpy as np

    (Kinv, a, e, key_data, log_signal_sq, log_length, log_noise_sq,
     x_pad) = res
    n = fold_k * e.shape[1]
    nb = e.shape[1]
    inplace_r = _resolve_inplace(n, inplace)
    block = _resolve_block(n, block)
    n_pad = Kinv.shape[0]
    st = Kinv.dtype
    d = x_pad.shape[1]
    z = x_pad * jnp.exp(-jnp.reshape(log_length, (1, -1)))
    sb = _stream_width(n_pad, block, inplace_r)

    def fold_body(foldi, carry):
        accs, ub = carry
        Li, _ = _fold_Li(Kinv, foldi, nb)
        Ab, u = _fold_cot_es(Li, e[foldi], s_bar[foldi], key_data, foldi,
                             nb, num_sim, beta)
        ub = lax.dynamic_update_slice(ub, u[:nb], (foldi * nb,))
        accs = _sandwich_pass(Kinv, Ab, foldi, nb, x_pad, z, log_signal_sq,
                              log_length, sb, accs)
        return accs, ub

    accs, ub = lax.fori_loop(
        0, fold_k, fold_body, (_new_accs(n_pad, d), jnp.zeros((n,), f32))
    )
    a_bar = _zpad(ub, n_pad)
    w = matmul_acc32(Kinv, a_bar.astype(st)[:, None])[:, 0]
    accs = _rank1_accs(log_signal_sq, log_length, log_noise_sq, x_pad, n,
                       w, a, z, block, inplace_r, accs)
    s_bar_, l_bar, n_bar = _combine_accs(accs, log_length, log_noise_sq, z)
    x_bar = jnp.zeros((n, d), x_pad.dtype)
    key_bar = np.zeros(jnp.shape(key_data), dtype=jax.dtypes.float0)
    return s_bar_, l_bar, n_bar, x_bar, w[:n], key_bar


ard_fold_es_stream.defvjp(_es_fwd, _es_bwd)
