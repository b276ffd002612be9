"""Closed-form-adjoint fold consumer: the k-fold scoring stage without autodiff.

The large-n k-fold objectives (DSS/ES/kc) consume the fused core's fold blocks
``A_b = [K_hat^-1]_bb`` (:func:`gpscore.ops.loo_fused.ard_kfold_solve_blocks`)
through a batched Cholesky + triangular solves + rule arithmetic. Left to
autodiff, that consumer holds A, its factor La, BOTH their cotangents, and the
Cholesky-VJP temps alongside the core's n^2 K^-1 residual — measured 3.4 n^2
peak across a value_and_grad at n = 30,720 (RESULTS.md), capping the fold
rules at n ~ 32k on a 16 GB chip while CRPS/NLML reach 61k.

:func:`fold_precision_stats` replaces that consumer with ONE custom-VJP
primitive producing exactly the statistics the three rules need:

    e         = A_b^-1 a_b            (fold mean error: m_b = y_b - e_b)
    half_logdet = sum log diag chol(A_b)   (DSS log-det term)
    inv_diag  = diag(A_b^-1)          (kc fold variances)
    z         = La_b^-T eps           (ES samples, cov A_b^-1, reparameterized)

with every adjoint in closed form off A_b^-1 (recomputed in the backward from
the saved input A — k nb^3 extra FLOPs = n^3/k^2, negligible):

    a_bar  = A^-1 e_bar
    A_bar  = -sym(u e^T)                          u = A^-1 e_bar
             + (hld_bar/2) A^-1
             - A^-1 diag(d_bar) A^-1
             + 1/2 La^-T (P + P^T) La^-1          P = -Phi(eps eps_bar^T),
                                                  eps_bar = La^-1 z_bar^T
(the sample term is the Cholesky VJP chol_vjp(La, tril(-La^-T W_bar^T La^-T)),
W_bar = z_bar^T eps^T, collapsed in closed form — no La, W_bar, or La_bar
buffer exists; derivation at the code site)

(the symmetrization is exact: A is a symmetric function of K^-1, so only the
symmetric part of A_bar survives the downstream parameter contraction).
Residual set: the inputs (A, a, eps) plus e — no factor, no cotangent
pyramids. Peak across a value_and_grad drops to ~n^2 + ~3 n^2/k (measured in
RESULTS.md), which moves the fold-rule ceiling to ~the CRPS/NLML ceiling.

Reference analogue: the per-fold conditional scoring of
`kin40k-FULL-compare.py:500-543` (DSS), `:616-663` (ES) and
`KIN40K-COMPARE-ALL-FITC-20.py:667-720` (kc), which re-factor per fold at
n = 500; this module is what lets the same math run at n ~ 60k.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpscore.ops import potri_inplace
from gpscore.utils.precision import matmul_crit, mm_precision


class FoldStats(NamedTuple):
    """Per-fold statistics of the block conditionals (leading axis = fold)."""

    e: jnp.ndarray  # [k, nb]   A^-1 a
    half_logdet: jnp.ndarray  # [k]  sum log diag chol(A)
    inv_diag: jnp.ndarray  # [k, nb]  diag(A^-1)
    z: jnp.ndarray  # [k, S, nb]  centered samples with cov A^-1 (S may be 0)


def _dot32(a_, b_):
    """2-D matmul with fp32 accumulation AND fp32 output whatever the operand
    dtype — reduced-storage (f16/bf16) factors are contracted without ever
    materializing an upcast copy."""
    return jax.lax.dot_general(
        a_, b_, (((1,), (0,)), ((), ())),
        precision=mm_precision(), preferred_element_type=jnp.float32,
    )


def _bdot32(a_, b_):
    """Fold-batched matmul, fp32 accumulation/output (see _dot32)."""
    return jax.lax.dot_general(
        a_, b_, (((2,), (1,)), ((0,), (0,))),
        precision=mm_precision(), preferred_element_type=jnp.float32,
    )


def _bsolve(La, B, trans: int):
    """Batched triangular solve over the fold axis."""
    return jax.vmap(
        lambda L, b: jax.scipy.linalg.solve_triangular(
            L, b, lower=True, trans=trans
        )
    )(La, B)


# At and above this fold size, the factorization runs the potri-style in-place
# panel pipeline below instead of XLA's cholesky/triangular-solve expanders.
# Measured (n = 16,384, fk = 4, value_and_grad of the composed objective): ANY
# >= 4096-sized cholesky or [nb, nb]-RHS triangular solve expanded by XLA on
# the fold blocks adds ~1.1 n^2 of expander panel temps next to the core's
# K^-1 residual (2048-sized leaves add ~0.1 n^2) — the same pathology
# gpscore/ops/linalg.py's _TRI_INV_MIN_N documents for the LOO path.
_INPLACE_MIN_NB = 2048

# Panel width of the in-place fold Cholesky; leaf cholesky/solve calls are
# this size, at the measured expander-temp knee (2048 leaves cost ~0.1 n^2,
# 4096 ~1.1 n^2) — wider panels also keep the trace-unrolled chain short
# enough to compile in minutes at nb ~ 15k.
_CHOL_BLOCK = 2048


def _panel_width(nb: int):
    """(leaf width, padded width) for the in-place fold pipeline: the widest
    of _CHOL_BLOCK / its half / its quarter that DIVIDES nb wins, with zero
    padding; _CHOL_BLOCK with round-up padding only when none divides.

    Padding is not a rounding detail at these sizes — at n = 69,632 the fold
    width 17,408 = 17 * 1024, and padding it to the 2048 grid costs a
    [k, 18432, 18432] factor buffer (+0.27 GB over the unpadded one) plus a
    2.26 GB ``A_bar[:, :nb, :nb]`` slice COPY in every fold backward (the
    slice is an identity no-op exactly when nb == nb_pad). Narrower leaves
    trade a longer panel chain for that; the 1024/512 leaves sit below the
    measured expander-temp knee either way."""
    blk = _CHOL_BLOCK
    for cand in (blk, blk // 2, blk // 4):
        if cand and nb % cand == 0:
            return cand, nb
    return blk, -(-nb // blk) * blk


def _batched_tri_inv(La):
    """La^-1 for batched lower-triangular La [k, nb, nb] via the solve
    expander — the small-nb path only (:func:`_fold_chol_inv` is the one
    dispatch site on ``_INPLACE_MIN_NB``; large blocks go through
    ``tri_inverse_lower`` there)."""
    nb = La.shape[-1]
    eye = jnp.eye(nb, dtype=La.dtype)
    return _bsolve(La, jnp.broadcast_to(eye, La.shape), 0)


def _chol_inplace_2d(A, b):
    """Lower Cholesky of one [m, m] SPD block, m % b == 0, potri-style:
    left-looking blocked factorization as a static-offset dynamic-update-slice
    chain IN PLACE ON THE SOURCE BUFFER — the left-looking order makes that
    legal: panel pi reads factor columns < s (already written) and source
    entries at columns >= s (not yet touched), so the buffer is its own
    source and no separate [m, m] output exists (the zeros_like output this
    replaces was a second 1.36 GB fp32 transient per fold at nb = 18,432,
    next to the fp32 upcast it factored). Inner accumulations are
    scan-serialized, leaf cholesky + panel inverse at b x b
    (gpscore/ops/potri_inplace.py stage 1, without the Gram generation).
    Column writes span the full height with an explicit zero head, so the
    strict upper triangle of the result is exactly zero — the same contract
    the zeros-initialized form had."""
    from jax import lax
    from jax.scipy.linalg import solve_triangular

    m = A.shape[0]
    eye_b = jnp.eye(b, dtype=A.dtype)
    W = A
    for pi in range(m // b):
        s = pi * b
        rem = m - s
        P = lax.dynamic_slice(W, (s, s), (rem, b))
        if pi:

            def body(Pc, j, W=W, s=s, rem=rem):
                col = lax.dynamic_slice(W, (s, j), (rem, b))
                top = lax.slice(col, (0, 0), (b, b))
                # matmul_crit: see gpscore/ops/potri_inplace.py — one-pass
                # bf16 Schur drift NaNs the leaf cholesky in "fast" mode.
                return Pc - matmul_crit(col, top.T), None

            P, _ = lax.scan(body, P, b * jnp.arange(pi))
        Ljj = jnp.linalg.cholesky(lax.slice(P, (0, 0), (b, b)))
        if rem > b:
            Ljj_inv = solve_triangular(Ljj, eye_b, lower=True)
            # matmul_crit: feeds later Schur updates (potri_inplace.py note).
            below = matmul_crit(lax.slice(P, (b, 0), (rem, b)), Ljj_inv.T)
            col = jnp.concatenate([Ljj, below], axis=0)
        else:
            col = Ljj
        if s:
            col = jnp.concatenate([jnp.zeros((s, b), A.dtype), col], axis=0)
        W = lax.dynamic_update_slice(W, col, (0, s))
    return W


def _pad_blockdiag_identity(A, nb_pad):
    """[k, nb, nb] -> [k, nb_pad, nb_pad] as blockdiag(A_f, I) per fold."""
    k, nb, _ = A.shape
    if nb_pad == nb:
        return A
    out = jnp.zeros((k, nb_pad, nb_pad), A.dtype)
    out = out.at[:, :nb, :nb].set(A)
    idx = jnp.arange(nb, nb_pad)
    return out.at[:, idx, idx].set(1.0)


def _fold_chol_inv(A):
    """(Li, half_logdet) for batched SPD A [k, nb, nb]; when the in-place
    pipeline engages the panel width is the widest of _CHOL_BLOCK and its
    half/quarter that divides nb (:func:`_panel_width` — zero padding at
    every measured ceiling size), padding to the _CHOL_BLOCK grid only
    when none divides.

    The returned factor inverse is [k, nb_pad, nb_pad] with blockdiag(·, I)
    padding (chol(blockdiag(A, I)) = blockdiag(chol(A), I), so the real
    block is exact and every padded diagonal entry is 1 — log-dets
    contribute 0 from the pads). Li comes back in A's dtype; under reduced
    storage (f16/bf16 fold blocks from the 2-byte-stored fused core) each
    fold is upcast, factored, and inverted in fp32 ONE AT A TIME — per-fold
    fp32 transients instead of three [k, nb, nb] fp32 stacks — and the half
    log-det is captured from the fp32 factor before the rounding-on-store.

    Buffer discipline (the fold-rule ceiling, RESULTS.md): Li REUSES the
    padded A stack — each fold's inverse is written back over the fold block
    it came from through one dynamic-update-slice chain (slot f is read
    before it is written; later folds read untouched slots), so the fold
    blocks and the factor inverses never coexist. Per fold, the
    factorization (``_chol_inplace_2d`` — the trace-UNROLLED in-place panel
    chain; the fori variant was deliberately dropped here because its
    while-loop carry double-buffers +nb_pad^2 fp32 on the remote compiler,
    see the inline comment) and the triangular inversion
    (potri_inplace._tri_inv_inplace) both run IN PLACE on the single fp32
    upcast — one [nb_pad, nb_pad] fp32 transient, where the
    factor-then-out-of-place-invert form held three.
    """
    f32 = jnp.float32
    st = A.dtype
    nb = A.shape[-1]
    if nb < _INPLACE_MIN_NB:
        La32 = jnp.linalg.cholesky(A.astype(f32))
        hld = jnp.sum(jnp.log(jnp.diagonal(La32, axis1=-2, axis2=-1)), -1)
        return _batched_tri_inv(La32).astype(st), hld
    b, nb_pad = _panel_width(nb)
    Ap = _pad_blockdiag_identity(A, nb_pad)
    # Feed the chain the TRANSPOSED (identical, A is symmetric) blocks: the
    # factorization leaves prefer column-major operands, and without the
    # transpose XLA's layout assignment propagates that preference through
    # the fold slices into the fused core's whole K^-1 DUS chain, forcing a
    # full n^2 relayout copy of K^-1 next to K^-1 itself (read the measured
    # layout story in the module docstring); the transpose absorbs the flip
    # as a bitcast at the fold-block boundary instead.
    # Materialize the (transposed, padded) fold blocks behind a barrier:
    # without it XLA fuses the extraction slices into the per-fold chains,
    # which pins the fused core's whole n^2 K^-1 alive across the fold
    # factorizations (measured on the remote compiler: the dss n=65,536 f16
    # forward peaked at 16.55 GB with extraction-only at ~10.7).
    buf = jax.lax.optimization_barrier(jnp.swapaxes(Ap, -1, -2))
    hlds = []
    for f in range(A.shape[0]):
        Af = buf[f].astype(f32)
        La_f = _chol_inplace_2d(Af, b)  # unrolled: the fori while-loop
        # carry double-buffers +nb_pad^2 fp32 on the remote compiler
        hld_f = jnp.sum(jnp.log(jnp.diagonal(La_f)))
        Li_f = potri_inplace._tri_inv_inplace(La_f, b)
        buf = jax.lax.dynamic_update_slice(
            buf, Li_f.astype(st)[None], (f, 0, 0)
        )
        hlds.append(hld_f)
    return buf, jnp.stack(hlds)


def _zero_pad_cols(v, nb_pad):
    """Zero-pad the last axis of [k, nb] (or middle axis of [k, nb, S])."""
    nb = v.shape[1]
    if nb_pad == nb:
        return v
    pad = [(0, 0)] * v.ndim
    pad[1] = (0, nb_pad - nb)
    return jnp.pad(v, pad)


def _stats_forward(A, a, eps, want_inv_diag):
    """(FoldStats, Li) — everything downstream of the factorization is a GEMM
    against the explicit panel inverse Li (no solve expanders), with fp32
    accumulation/outputs whatever the storage dtype of the fold blocks."""
    f32 = jnp.float32
    st = A.dtype
    nb = a.shape[-1]
    Li, half_logdet = _fold_chol_inv(A)
    nb_pad = Li.shape[-1]
    a_p = _zero_pad_cols(a, nb_pad).astype(st)
    # The batched matvecs sit behind optimization_barriers: XLA otherwise
    # fuses them with a dozen surrounding ops into one kernel whose
    # scoped-vmem tiles blow the 16 MB budget at nb ~ 4k ("should not be
    # possible to run out of scoped vmem" compile error).
    w = _bdot32(Li, jax.lax.optimization_barrier(a_p)[..., None])
    w = jax.lax.optimization_barrier(w)
    e = _bdot32(jnp.swapaxes(Li, -1, -2), w.astype(st))[..., 0][:, :nb]
    if want_inv_diag:
        inv_diag = jnp.einsum(  # column sums of squares, fp32 accumulation
            "kij,kij->kj", Li, Li,
            precision=mm_precision(), preferred_element_type=f32,
        )[:, :nb]
    else:  # skip reading the inverse columns DSS/ES never consume
        inv_diag = jnp.zeros(a.shape, f32)
    eps_p = _zero_pad_cols(eps, nb_pad).astype(st)
    z = jnp.swapaxes(
        _bdot32(jnp.swapaxes(Li, -1, -2), eps_p), -1, -2
    )[:, :, :nb]  # (La^-T eps)^T
    return FoldStats(e, half_logdet, inv_diag, z), Li


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fold_precision_stats(A, a, eps, want_inv_diag: bool = True) -> FoldStats:
    """Fold-conditional statistics with closed-form adjoints (module docstring).

    A: [k, nb, nb] SPD fold precision blocks; a: [k, nb] fold slices of
    K_hat^-1 y; eps: [k, nb, S] standard normals (S = 0 for non-ES rules).
    With ``want_inv_diag=False`` (static) the ``inv_diag`` output is zeros.
    Differentiable w.r.t. A, a, and eps.
    """
    stats, _ = _stats_forward(A, a, eps, want_inv_diag)
    return stats


def _fps_fwd(A, a, eps, want_inv_diag):
    stats, Li = _stats_forward(A, a, eps, want_inv_diag)
    # Residual: the factor inverse only (in the fold blocks' storage dtype) —
    # every adjoint (including the sample path's collapsed Cholesky VJP) is
    # a GEMM against Li. Neither A nor La is kept.
    return stats, (Li, a, eps, stats.e)


def _sym(M):
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def _phi(X):
    """Murray (2016) Phi: lower triangle with halved diagonal."""
    return jnp.tril(X) - 0.5 * jnp.tril(jnp.triu(X))


def _fold_adjoints(Li, e, eps, cot, want_inv_diag, nb):
    """Shared closed-form fold adjoints (module docstring math), computed
    FOLD BY FOLD, serialized through A_bar's dynamic-update-slice chain —
    which REUSES Li's buffer: fold f's A_bar block overwrites the factor
    inverse it was computed from (Lf is dead once its adjoint is written;
    later folds read untouched slots), so the factor stack and the cotangent
    stack never coexist.

    Batched, the adjoint held Ainv, the rank-1/diag sandwich temps, and (for
    ES) H/P/(P+P^T) as [k, nb, nb] stacks next to A_bar — ~3-4 n^2/k live.
    Per fold only one persistent [nb_pad, nb_pad] fp32 working set exists at
    a time (Af_bar; A^-1 is never materialized — u = A^-1 e_bar runs as the
    two factor matvecs Li^T (Li e_bar), the half-log-det term seeds Af_bar
    directly as the Li^T Li GEMM, and the inv-diag term is the factored
    sandwich Li^T (Li D Li^T) Li), and with reduced-storage Li (f16/bf16
    fold factors) every contraction runs fp32-accumulating off the 2-byte
    operands (_dot32), so the adjoint never materializes an upcast stack
    either.

    Returns (A_bar [k, nb, nb] in Li's dtype, a_bar [k, nb] fp32,
    eps_bar fp32) from the factor inverse Li [k, nb_pad, nb_pad] and the
    FoldStats cotangents.
    """
    e_bar, hld_bar, d_bar, z_bar = cot
    f32 = jnp.float32
    st = Li.dtype
    k = Li.shape[0]
    nb_pad = Li.shape[-1]
    S = eps.shape[-1]

    # Padded factors are blockdiag(real, I); padding every cotangent with
    # zeros and slicing A_bar back to the real block is exact.
    e_bar_p = _zero_pad_cols(e_bar, nb_pad)
    e_p = _zero_pad_cols(e, nb_pad)
    if want_inv_diag:
        d_bar_p = _zero_pad_cols(d_bar, nb_pad)
    if S:
        eps_p = _zero_pad_cols(eps, nb_pad).astype(st)
        Y_bar = _zero_pad_cols(jnp.swapaxes(z_bar, -1, -2), nb_pad)

    A_bar = Li  # slot f holds Li[f] until fold f's adjoint overwrites it
    a_bar_rows, eps_bar_rows = [], []
    for f in range(k):
        Lf = A_bar[f]
        # u = A^-1 e_bar = Li^T (Li e_bar): two barriered factor matvecs
        # (see _stats_forward note on the barriers) instead of a
        # materialized [nb_pad, nb_pad] fp32 A^-1.
        t = _dot32(
            Lf, jax.lax.optimization_barrier(e_bar_p[f]).astype(st)[:, None]
        )
        u = _dot32(Lf.T, jax.lax.optimization_barrier(t).astype(st))[:, 0]
        u = jax.lax.optimization_barrier(u)
        a_bar_rows.append(u[:nb])
        # (hld_bar/2) A^-1 is the one full-matrix term — emit it directly as
        # the Af_bar seed so the GEMM output IS the accumulator. (Measured
        # negative result: accumulating Af_bar/B in the storage dtype left
        # the dss bf16 n=73,728 OOM byte-identical — this path's peak is in
        # the unchanged forward — so the fp32 transients stay.)
        Af_bar = (0.5 * hld_bar[f]) * _dot32(Lf.T, Lf)
        Af_bar = Af_bar - _sym(u[:, None] * e_p[f][None, :])
        if want_inv_diag:
            # A^-1 diag(d) A^-1 = Li^T (Li D Li^T) Li — sequential [nb, nb]
            # GEMM temps instead of a persistent A^-1 operand.
            B = _dot32(Lf * d_bar_p[f].astype(st)[None, :], Lf.T)
            Af_bar = Af_bar - _dot32(
                Lf.T, _dot32(B.astype(st), Lf).astype(st)
            )
        if S:
            # z = La^-T eps (columns of eps are draws). The naive chain
            #   M_bar = z_bar^T eps^T -> La_bar = tril(-La^-T M_bar^T La^-T)
            #   -> A_bar += 1/2 La^-T (P + P^T) La^-1, P = Phi(La^T La_bar)
            # materializes M_bar/La_bar and RECOMPUTES La. It collapses
            # exactly: La^T La_bar = -M_bar^T La^-T (the tril dropped from
            # La_bar contributes Phi(upper * strictly-upper) = 0), and
            # M_bar^T La^-T = eps (La^-1 z_bar^T)^T = eps G^T with
            # G = La^-1 z_bar^T — which IS eps_bar. So
            #   P = -Phi(eps G^T),  A_bar += 1/2 La^-T (P + P^T) La^-1.
            G = _dot32(Lf, Y_bar[f].astype(st))  # [nb_pad, S] fp32
            eps_bar_rows.append(G[:nb, :])
            H = _dot32(eps_p[f], G.astype(st).T)  # eps G^T, fp32
            # sandwich identity: La^-T (P + P^T) La^-1 = T + T^T with
            # T = La^-T P La^-1 — one [nb, nb] temp instead of two (the
            # symmetrized P + P^T never materializes; Phi aliases H).
            W1 = _dot32(_phi(H).astype(st), Lf)
            T = _dot32(Lf.T, W1.astype(st))
            Af_bar = Af_bar - 0.5 * (T + T.T)
        A_bar = jax.lax.dynamic_update_slice(
            A_bar, Af_bar.astype(st)[None], (f, 0, 0)
        )

    a_bar = jnp.stack(a_bar_rows)
    if S:
        eps_bar = jnp.stack(eps_bar_rows)
    else:
        eps_bar = jnp.zeros_like(eps)
    return A_bar[:, :nb, :nb], a_bar, eps_bar


def _fps_bwd(want_inv_diag, res, cot):
    Li, a, eps, e = res
    return _fold_adjoints(Li, e, eps, cot, want_inv_diag, a.shape[-1])


fold_precision_stats.defvjp(_fps_fwd, _fps_bwd)


# ---------------------------------------------------------------------------
# Streamed ES: sample buffers regenerated fold-by-fold from counter keys
# ---------------------------------------------------------------------------


def _fold_eps(key_data, f, nb_pad, num_sim):
    """The fold-f sample block [nb_pad, 2 num_sim] fp32, deterministic in
    (key_data, f) — regenerated bit-identically in forward AND backward, so
    eps is never a residual. Rows >= the real nb are draw-padding: the padded
    factor is blockdiag(real, I), so they never leak into real z rows."""
    key = jax.random.fold_in(jax.random.wrap_key_data(key_data), f)
    return jax.random.normal(key, (nb_pad, 2 * num_sim), jnp.float32)


def _es_from_cols(zT, e_f, num_sim, beta):
    """Per-fold ES from column-stacked samples zT [nb, 2S] (z | z') and the
    fold mean error e (r = m - y = -e). Thin shim over
    :func:`gpscore.scoring.rules.energy_score_core`; small enough ([S, nb]
    temps + one [S, S] cross block) that its autodiff is the cheap part of
    the backward."""
    from gpscore.scoring.rules import energy_score_core

    z = zT[:, :num_sim].T
    zp = zT[:, num_sim:].T
    return energy_score_core(z, zp, -e_f, num_sim, beta)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fold_es_score(A, a, key_data, num_sim: int = 300, beta: float = 1.0):
    """Per-fold energy scores [k] with fold-streamed sampling and closed-form
    adjoints — the large-n ES objective's fold stage.

    Versus routing ES through :func:`fold_precision_stats`: the eps input
    ([k, nb, 2S]), the z output, the saved-eps residual, and the z_bar /
    eps_bar cotangent stacks all disappear. Samples are drawn ONE FOLD AT A
    TIME from counter-derived keys (``key_data`` = ``jax.random.key_data`` of
    a PRNG key; raw uint32 so the VJP can return a float0 cotangent) and
    regenerated bit-identically in the backward — live sample state is one
    [nb_pad, 2S] block. At the measured f16 ceiling that removes the ~0.6 GB
    sampler chain that kept ES at n = 57,344 while dss/kc ran 61,440
    (RESULTS.md round-3 ceiling table).

    A: [k, nb, nb] SPD fold precisions; a: [k, nb] fold slices of K_hat^-1 y.
    Scores use the reference's S(S-1) pairing normalization
    (`kin40k-FULL-compare.py:616-657` via energy_score_core).
    Differentiable w.r.t. A and a.
    """
    scores, _ = _fes_forward(A, a, key_data, num_sim, beta)
    return scores


def _fes_forward(A, a, key_data, num_sim, beta):
    f32 = jnp.float32
    st = A.dtype
    nb = a.shape[-1]
    Li, _ = _fold_chol_inv(A)
    nb_pad = Li.shape[-1]
    a_p = _zero_pad_cols(a, nb_pad).astype(st)
    # barriered matvecs — see _stats_forward note
    w = _bdot32(Li, jax.lax.optimization_barrier(a_p)[..., None])
    w = jax.lax.optimization_barrier(w)
    e = _bdot32(jnp.swapaxes(Li, -1, -2), w.astype(st))[..., 0][:, :nb]
    scores = []
    for f in range(A.shape[0]):
        eps_f = _fold_eps(key_data, f, nb_pad, num_sim).astype(st)
        zT = _dot32(Li[f].T, eps_f)[:nb]  # [nb, 2S] fp32
        scores.append(_es_from_cols(zT, e[f], num_sim, beta))
    return jnp.stack(scores), (Li, e)


def _fes_fwd(A, a, key_data, num_sim, beta):
    scores, (Li, e) = _fes_forward(A, a, key_data, num_sim, beta)
    # Residual: factor inverse + fold mean errors only. eps and z are
    # regenerated; A, a, La are never kept.
    return scores, (Li, e, key_data)


def _fes_bwd(num_sim, beta, res, s_bar):
    import numpy as np

    Li, e, key_data = res
    f32 = jnp.float32
    st = Li.dtype
    k, nb_pad = Li.shape[0], Li.shape[-1]
    nb = e.shape[-1]
    e_p = _zero_pad_cols(e, nb_pad)

    # A_bar's DUS chain reuses Li's buffer (fold f's adjoint overwrites the
    # factor inverse it was computed from — see _fold_adjoints).
    A_bar = Li
    a_bar_rows = []
    for f in range(k):
        Lf = A_bar[f]
        eps_f = _fold_eps(key_data, f, nb_pad, num_sim).astype(st)
        zT = _dot32(Lf.T, eps_f)[:nb]
        # score adjoints w.r.t. (z columns, e) — autodiff of the small rule
        # arithmetic only; everything upstream stays closed form.
        _, vjp_fn = jax.vjp(
            lambda zT_, e_: _es_from_cols(zT_, e_, num_sim, beta), zT, e[f]
        )
        zT_bar, e_bar_f = vjp_fn(s_bar[f])

        # u = A^-1 e_bar = Li^T (Li e_bar): factor matvecs, no materialized
        # A^-1 (see _fold_adjoints).
        e_bar_p = jnp.zeros((nb_pad,), f32).at[:nb].set(e_bar_f)
        t = _dot32(
            Lf, jax.lax.optimization_barrier(e_bar_p).astype(st)[:, None]
        )
        u = _dot32(Lf.T, jax.lax.optimization_barrier(t).astype(st))[:, 0]
        u = jax.lax.optimization_barrier(u)
        a_bar_rows.append(u[:nb])
        # Af_bar accumulates IN THE STORAGE DTYPE (fp32-mode behavior
        # unchanged): A_bar is stored at st grade anyway, and the fp32
        # accumulator was a [nb_pad, nb_pad] fp32 transient per fold.
        # Caveat (r4 advisor): storage-dtype intermediates don't just ROUND
        # — under f16 (max 65504) a pre-cancellation term (e.g. T before
        # the -sym(u e^T) combine) can SATURATE to inf where an fp32
        # accumulator would not, NaN-ing the ES gradient; fit_gd's
        # non-finite masking + fit_gd_recovering's mode ladder catch that
        # at run time, and no measured fit has tripped it. At
        # nb = 18,432 (n = 73,728) the fp32 Af_bar/T/symmetrization trio
        # held ~4 GB next to the 10.12 GB K^-1. Measured: the st trio cut
        # the es f16 73,728 OOM 2.04 G -> 0.96 G (still over — the rest is
        # allocator fragmentation, 43% in the OOM report; at 69,632 the
        # A_bar[:, :nb, :nb] pad-slice copy adds 2.26 G, so the es ceiling
        # stays 65,536 while dss/kc run 73,728).
        Af_bar = (-_sym(u[:, None] * e_p[f][None, :])).astype(st)
        # collapsed sample-path Cholesky VJP (see _fold_adjoints): with
        # Y_bar = zT_bar padded, G = La^-1 z_bar^T = Li Y_bar,
        # P = -Phi(eps G^T), A_bar += 1/2 La^-T (P + P^T) La^-1 — assembled
        # via the one-temp sandwich T = La^-T P La^-1. H = eps G^T is rank
        # 2S, so Phi(H) Li is STREAMED in row strips: per strip one
        # [sb, nb_pad] fp32 H block (the Phi mask is applied with global-row
        # iotas) feeding a fp32-accumulating GEMM into a storage-dtype W1 —
        # the full-H form held H, W1 fp32 [nb_pad, nb_pad] next to T and
        # Af_bar, which is what kept ES one size below dss/kc at the 2-byte
        # ceiling (es n=73,728 OOMed by 2.04 GB with dss/kc green).
        Y_bar = jnp.zeros((nb_pad, 2 * num_sim), f32).at[:nb].set(zT_bar)
        G = _dot32(Lf, Y_bar.astype(st))  # [nb_pad, 2S] fp32
        GT = jax.lax.optimization_barrier(G.astype(st)).T
        sbw, sp = _panel_width(nb_pad)
        sb = sbw if (sp == nb_pad and nb_pad > sbw) else nb_pad
        jj = jax.lax.iota(jnp.int32, nb_pad)[None, :]
        W1 = jnp.zeros((nb_pad, nb_pad), st)
        for r0 in range(0, nb_pad, sb):
            Hr = _dot32(
                jax.lax.slice_in_dim(eps_f, r0, r0 + sb, axis=0), GT
            )  # [sb, nb_pad] strip of eps G^T, fp32
            gi = (r0 + jax.lax.iota(jnp.int32, sb))[:, None]
            Hr = jnp.where(
                jj < gi, Hr, jnp.where(jj == gi, 0.5 * Hr, 0.0)
            )  # Phi: lower triangle, halved diagonal (global rows)
            W1r = _dot32(Hr.astype(st), Lf)
            W1 = jax.lax.dynamic_update_slice(
                W1, W1r.astype(st), (r0, 0)
            )
        # T in the storage dtype too: the fp32 GEMM output is rounded once
        # (the same grade the final A_bar store applies), and T + T^T runs
        # as a 2-byte elementwise chain fused into the subtraction.
        T = _dot32(Lf.T, jax.lax.optimization_barrier(W1)).astype(st)
        Af_bar = Af_bar - jnp.asarray(0.5, st) * (T + T.T)
        A_bar = jax.lax.dynamic_update_slice(
            A_bar, Af_bar.astype(st)[None], (f, 0, 0)
        )

    key_bar = np.zeros(jnp.shape(res[2]), dtype=jax.dtypes.float0)
    return A_bar[:, :nb, :nb], jnp.stack(a_bar_rows), key_bar


fold_es_score.defvjp(_fes_fwd, _fes_bwd)

