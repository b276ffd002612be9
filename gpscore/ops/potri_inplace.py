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

The three stages exist in two trace disciplines selected by ``loop``:
trace-unrolled scan chains (below; fastest to compile at small panel counts)
and bounded-trace nested ``lax.fori_loop`` stages (``chol_inplace_fori`` /
``_tri_inv_fori`` / ``_lauum_fori``; O(1) trace size — the fix for the
super-linear XLA compile wall the unrolled chains hit at ~60+ panels).

Unrolled stages (trace-time-unrolled over k = n/b outer panels, GEMM bodies):

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
from gpscore.utils.precision import (
    matmul,
    matmul_crit,
    mm_precision,
    mm_precision_crit,
)


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


# ---------------------------------------------------------------------------
# Bounded-trace (fori_loop) pipeline
#
# The trace-unrolled stages above emit O(n/b) distinct scan programs (one per
# panel height), and XLA's compile time on those chains is super-linear in
# panel count: n = 61,440 at b = 1024 (60 panels) compiled in ~5 min, b = 512
# at n = 62,464 (122 panels) blew a 10-minute budget (BENCH_NOTES.md) — the
# compile wall, not HBM, set the round-2 ceiling. The stages below re-express
# the same three in-place stages with lax.fori_loop outer panels and NESTED
# fori_loops over [b, b] blocks of the active (triangular) region, so
#
# - trace size is O(1) in n/b (every shape is b- or n-sized, never s-sized),
# - FLOPs stay exact (the nested loops walk only the triangle — unlike the
#   full-width-masked-panel trick of gpscore/parallel/sharded_potri.py, which
#   pays ~3x on the Schur/accumulation stages and is only justified there by
#   row-sharding),
# - the buffer discipline is unchanged: one n x n carry W, every write a
#   dynamic_update_slice with a single consumer (XLA aliases the whole chain),
#   O(n*b) live thin panels.
#
# The nested [b, b] granularity trades per-iteration loop overhead
# (~O(k^3/6) while-loop steps per stage) for bounded trace; at b >= 1024 each
# step is a >= 2 GFLOP MXU GEMM and the overhead is noise (measured table in
# BENCH_NOTES.md "fori vs unrolled").
# ---------------------------------------------------------------------------


def _gram_khat_full(log_signal_sq, log_length, log_noise_sq, x, n_real,
                    storage=None, block=None):
    """The masked-padded K_hat = blockdiag(K_ard(x[:n_real]) + noise I,
    (1 + noise) I) built whole — the buffer the fori stages overwrite in
    place (the Gram epilogue and diagonal scatter fuse into / alias the
    cross-term GEMM output, so this is one n x n buffer, same peak as the
    panel-generated left-looking stage 1).

    With ``storage`` (e.g. bfloat16) the buffer is built in that dtype by a
    fori loop of fp32 row panels (exact fp32 Gram arithmetic, ONE rounding on
    store) — a whole-matrix fp32 Gram would itself exceed HBM at the sizes
    bf16 storage exists for. ``block`` is the panel height (required then).
    """
    n = x.shape[0]
    dtype = x.dtype
    noise = jnp.exp(log_noise_sq)
    ids = jnp.arange(n)
    if storage is None or storage == dtype:
        K = ard_gram(x, x, log_signal_sq, log_length)
        if n_real < n:
            m = ids < n_real
            K = jnp.where(m[:, None] & m[None, :], K, jnp.zeros((), dtype))
            diag = jnp.where(m, noise, 1.0 + noise)
        else:
            diag = jnp.broadcast_to(noise, (n,)).astype(dtype)
        # where-form diagonal add, NOT a scatter (.at[ids, ids].add): the
        # scatter refuses to alias the Gram and holds a second n^2 buffer
        # (measured +1.0 n^2 at n = 8192); this elementwise form fuses into
        # the Gram epilogue for zero extra residency.
        return jnp.where(ids[:, None] == ids[None, :], K + diag[None, :], K)

    b = block
    d = x.shape[1]

    def panel(pi, W):
        s = pi * b
        xb = lax.dynamic_slice(x, (s, 0), (b, d))
        P = ard_gram(xb, x, log_signal_sq, log_length)  # [b, n] fp32
        rid = s + jnp.arange(b)
        if n_real < n:
            P = jnp.where(
                (rid < n_real)[:, None] & (ids < n_real)[None, :], P,
                jnp.zeros((), dtype),
            )
            dval = jnp.where(rid < n_real, noise, 1.0 + noise)
        else:
            dval = jnp.broadcast_to(noise, (b,)).astype(dtype)
        P = jnp.where(ids[None, :] == rid[:, None], P + dval[:, None], P)
        return lax.dynamic_update_slice(W, P.astype(storage), (s, 0))

    return lax.fori_loop(0, n // b, panel, jnp.zeros((n, n), storage))


def ard_khat_matmul_streamed(log_signal_sq, log_length, log_noise_sq, x,
                             n_real, V, block):
    """``K_hat_padded @ V`` ([n_pad, c] fp32) without materializing K_hat.

    K_hat_padded is the same masked-padded ``blockdiag(K_ard(x[:n_real]) +
    noise I, (1 + noise) I)`` as :func:`_gram_khat_full`; its row panels are
    recomputed from ``x`` one ``block`` at a time (O(n * block) live, fp32
    exact arithmetic), so the product costs n^2 c MACs and no n^2 buffer.
    Used by the iterative-refinement evaluation path
    (:func:`gpscore.models.exact.exact_predictive_diag_large` ``refine``):
    the residual ``B - K_hat V`` against a 2-byte-stored approximate inverse
    needs the EXACT operator, not the rounded one.
    """
    n = x.shape[0]
    d = x.shape[1]
    b = block
    c = V.shape[1]
    f32 = jnp.float32
    noise = jnp.exp(log_noise_sq)
    ids = jnp.arange(n)
    V = V.astype(f32)

    def panel(pi, out):
        s = pi * b
        xb = lax.dynamic_slice(x, (s, 0), (b, d))
        P = ard_gram(xb, x, log_signal_sq, log_length)  # [b, n] fp32
        rid = s + jnp.arange(b)
        if n_real < n:
            P = jnp.where(
                (rid < n_real)[:, None] & (ids < n_real)[None, :], P,
                jnp.zeros((), f32),
            )
            dval = jnp.where(rid < n_real, noise, 1.0 + noise)
        else:
            dval = jnp.broadcast_to(noise, (b,)).astype(f32)
        P = jnp.where(ids[None, :] == rid[:, None], P + dval[:, None], P)
        blk = jnp.matmul(P, V, precision=jax.lax.Precision.HIGHEST)
        return lax.dynamic_update_slice(out, blk, (s, 0))

    return lax.fori_loop(0, n // b, panel, jnp.zeros((n, c), f32))


def chol_inplace_fori(W, b, n_real=None, unroll=False):
    """(W <- L, half_logdet) LEFT-looking blocked Cholesky of the SPD W,
    bounded trace: outer fori over pivots; each column panel subtracts its
    full left update into an fp32 [n, b] accumulator (nested fori over the
    [b, b] blocks of the active region) and is written back ONCE.

    Left-looking, not right-looking, for two reasons:

    - reduced-precision storage: a right-looking chain re-rounds every
      trailing block once per update, and the ACCUMULATED staircase rounding
      goes indefinite where the one-shot-rounded K_hat is still SPD
      (measured: bf16 at n = 30,720 with unit log-params NaNs right-looking;
      the bf16-rounded K_hat itself factors fine, min pivot diag 1.64).
      Left-looking rounds each block exactly once, off-diagonal and pivot
      alike, so the factored matrix stays within one-shot-rounding distance
      of K_hat;
    - write traffic: the trailing matrix is rewritten k/3 times
      right-looking (~n^2 k/6 extra HBM writes) vs once here.

    The pivot block is overwritten with the cholesky() output itself, so L
    carries an exactly-zero strict upper triangle. ``n_real`` masks pad rows
    out of the half log-det only — the factorization itself relies on the
    caller's exact block-diagonal padding.

    Layout rules (BENCH_NOTES.md "layout war"): all W reads here are
    dim-1-contracted dots or slices feeding fp32 converts; the leaf
    factorization reads the bitcast D.T of a slice of the FRESH fp32 panel,
    so no column-major preference ever reaches W's while-loop carry.
    """
    n = W.shape[0]
    k = n // b
    dtype = W.dtype
    f32 = jnp.float32
    eye_b = jnp.eye(b, dtype=f32)
    row_ids = jnp.arange(n)
    nr = n if n_real is None else n_real
    crit = mm_precision_crit()

    def chol_step(kk, carry):
        W, hld = carry
        s = kk * b
        P = lax.dynamic_slice(W, (0, s), (n, b)).astype(f32)

        def j_body(j, P):
            top = lax.dynamic_slice(W, (s, j * b), (b, b))

            def i_body(ip, P):
                Xb = lax.dynamic_slice(W, (ip * b, j * b), (b, b))
                blk = lax.dynamic_slice(P, (ip * b, 0), (b, b))
                # P[ip] -= L[ip, j] L[kk, j]^T, contracted on dim 1 of both
                # W reads; fp32 accumulation whatever the storage dtype.
                # mm_precision_crit: one-pass bf16 drift on fp32 operands
                # turns pivots indefinite (measured, round 2).
                blk = blk - lax.dot_general(
                    Xb, top, (((1,), (1,)), ((), ())),
                    precision=crit, preferred_element_type=f32,
                )
                return lax.dynamic_update_slice(P, blk, (ip * b, 0))

            return lax.fori_loop(kk, k, i_body, P)

        P = lax.fori_loop(0, kk, j_body, P)
        D = lax.dynamic_slice(P, (s, 0), (b, b))
        # D.T: the cholesky custom-call demands a column-major operand; the
        # bitcast transpose of the bit-symmetric pivot hands it one for free
        # (and P is a fresh fp32 value, so even a relayout would cost n*b,
        # not the full-W copy the right-looking form risked).
        Lkk = jnp.linalg.cholesky(D.T)
        ld = jnp.log(jnp.diagonal(Lkk))
        ld = jnp.where(s + jnp.arange(b) < nr, ld, jnp.zeros((), f32))
        hld = hld + jnp.sum(ld)
        Linv = solve_triangular(Lkk, eye_b, lower=True)
        Lcol = jnp.matmul(P, Linv.T, precision=crit)
        Lcol = jnp.where((row_ids >= s)[:, None], Lcol, jnp.zeros((), f32))
        Lcol = lax.dynamic_update_slice(Lcol, Lkk, (s, 0))
        W = lax.dynamic_update_slice(W, Lcol.astype(dtype), (0, s))
        return W, hld

    if unroll:
        # Python-unrolled outer loop (same steps): the while-loop carry
        # DOUBLE-BUFFERS the [n, n] buffer on the remote compiler
        # (fold_core._fold_chol_inv's measured lesson) — per-fold consumers
        # (gpscore.ops.fold_stream) unroll their <= ~21 panels instead and
        # keep the one-live-block discipline at any storage dtype.
        carry = (W, jnp.zeros((), jnp.float32))
        for kk in range(k):
            carry = chol_step(kk, carry)
        return carry
    return lax.fori_loop(0, k, chol_step, (W, jnp.zeros((), jnp.float32)))


def _tri_inv_fori(W, b, unroll=False):
    """W: L (lower, zero strict upper) -> X = L^-1 stored in BOTH triangles,
    bounded trace: lower gets X, the strict upper gets X^T (written block by
    block as each column panel is computed), and the returned sidecar
    ``Dstack`` [k, b, b] holds the transposed diagonal blocks X_jj^T.

    Why both triangles: stage 3 (lauum) contracts the ROW index of L^-1, and
    any [b, b] W-read contracted on dim 0 makes XLA's layout assignment vote
    the whole carry column-major (the n^2-relayout pathology; stage-1 pivot
    note). With X^T available in the upper triangle and X_jj^T in the
    sidecar, every stage-3 GEMM reads W contracted on dim 1 (row-major) and
    the carry stays {1,0}. The same discipline shapes this stage: the inner
    accumulation computes acc^T directly via
        dot_general(Lblk, Xblk, contract lhs dim0 / rhs dim1)
    so the W-read (Xblk) is dim-1-contracted; the dim-0-contracted operand
    (Lblk) comes from the [n, b] column snapshot, whose relayout costs n*b,
    not n^2. Per pivot s: X[t:, s:t] = -X[t:, t:] L[t:, s:t] X_ss, with the
    original L column snapshotted first because the row blocks of column s
    are overwritten top-down while later rows still read them.
    """
    n = W.shape[0]
    k = n // b
    dtype = W.dtype
    f32 = jnp.float32
    eye_b = jnp.eye(b, dtype=f32)

    def trtri_step(i, carry):
        W, Dstack = carry
        pi = k - 1 - i
        s = pi * b
        Lcol = lax.dynamic_slice(W, (0, s), (n, b))  # original L, pre-write
        Ljj = lax.dynamic_slice(Lcol, (s, 0), (b, b))
        # PLAIN lower solve: measured in isolation it anchors the layout
        # chain (0.160 n^2) — the trans=1 form re-couples it (+1 n^2).
        # Leaf solve in fp32 regardless of storage dtype.
        Xjj = solve_triangular(Ljj.astype(f32), eye_b, lower=True)
        XjjT = Xjj.T

        def row_body(ip, W):
            def acc_body(jp, accT):
                Lblk = lax.dynamic_slice(Lcol, (jp * b, 0), (b, b))
                Xblk = lax.dynamic_slice(W, (ip * b, jp * b), (b, b))
                # accT += Lblk^T Xblk^T, both transposes absorbed into the
                # dot dims (lhs contract dim0 = snapshot, rhs dim1 = W);
                # fp32 accumulation across blocks regardless of storage.
                return accT + lax.dot_general(
                    Lblk, Xblk, (((0,), (1,)), ((), ())),
                    precision=mm_precision(), preferred_element_type=f32,
                )

            accT = lax.fori_loop(
                pi + 1, ip + 1, acc_body, jnp.zeros((b, b), f32)
            )
            bandblk = -matmul(XjjT, accT)  # = (X[ip-block, s-col])^T
            bandblk = bandblk.astype(dtype)
            W = lax.dynamic_update_slice(W, bandblk, (s, ip * b))  # X^T
            W = lax.dynamic_update_slice(W, bandblk.T, (ip * b, s))  # X
            return W

        W = lax.fori_loop(pi + 1, k, row_body, W)
        W = lax.dynamic_update_slice(W, Xjj.astype(dtype), (s, s))
        Dstack = lax.dynamic_update_slice(Dstack, XjjT[None], (pi, 0, 0))
        return W, Dstack

    if unroll:  # see chol_inplace_fori: no while-carry double buffer
        carry = (W, jnp.zeros((k, b, b), f32))
        for i in range(k):
            carry = trtri_step(i, carry)
        return carry
    return lax.fori_loop(
        0, k, trtri_step, (W, jnp.zeros((k, b, b), f32))
    )


def tri_inv_fori_lower(W, b, unroll=False):
    """W: L (lower, zero strict upper) -> X = L^-1 in place, LOWER TRIANGLE
    ONLY (the strict upper stays exactly zero), bounded trace.

    The both-triangle variant (:func:`_tri_inv_fori`) mirrors X^T into the
    strict upper because the full potri pipeline's lauum stage must read the
    transpose row-major; per-fold consumers (:mod:`gpscore.ops.fold_stream`)
    instead feed X into colsum-of-squares reductions and ``X^T (X v)``
    matvecs that read the WHOLE buffer, so the mirror would corrupt them —
    this variant preserves ``_tri_inv_inplace``'s zero-upper contract at
    O(1) trace size and any storage dtype (fp32 leaf solves, fp32
    cross-block accumulation, one rounding per stored block).

    Layout discipline (BENCH_NOTES.md "layout war"): every W-read is
    dim-1-contracted (``dot_general(Xblk, Lblk)`` contracts Xblk's dim 1);
    dim-0-contracted operands come from the [n, b] column snapshot, whose
    relayout costs n*b, not n^2; the leaf solve is the PLAIN lower form.
    """
    n = W.shape[0]
    k = n // b
    dtype = W.dtype
    f32 = jnp.float32
    eye_b = jnp.eye(b, dtype=f32)

    def step(i, W):
        pi = k - 1 - i
        s = pi * b
        Lcol = lax.dynamic_slice(W, (0, s), (n, b))  # original L, pre-write
        Ljj = lax.dynamic_slice(Lcol, (s, 0), (b, b))
        Xjj = solve_triangular(Ljj.astype(f32), eye_b, lower=True)

        def row_body(ip, W):
            # X[ip, s] = -(sum_{pi < jp <= ip} X[ip, jp] L[jp, s-col]) X_ss:
            # trailing-inverse blocks (written at earlier, more-rightward
            # pivots) times b x b blocks of the snapshotted original column.
            def acc_body(jp, acc):
                Xblk = lax.dynamic_slice(W, (ip * b, jp * b), (b, b))
                Lblk = lax.dynamic_slice(Lcol, (jp * b, 0), (b, b))
                return acc + lax.dot_general(
                    Xblk, Lblk, (((1,), (0,)), ((), ())),
                    precision=mm_precision(), preferred_element_type=f32,
                )

            acc = lax.fori_loop(pi + 1, ip + 1, acc_body,
                                jnp.zeros((b, b), f32))
            blk = -jnp.matmul(acc, Xjj, precision=mm_precision())
            return lax.dynamic_update_slice(W, blk.astype(dtype), (ip * b, s))

        W = lax.fori_loop(pi + 1, k, row_body, W)
        return lax.dynamic_update_slice(W, Xjj.astype(dtype), (s, s))

    if unroll:  # see chol_inplace_fori: no while-carry double buffer
        for i in range(k):
            W = step(i, W)
        return W
    return lax.fori_loop(0, k, step, W)


def _lauum_fori(W, Dstack, b, unroll=False):
    """(W, Dstack) from :func:`_tri_inv_fori` -> K_hat^-1 = L^-T L^-1, full
    symmetric, in place, bounded trace.

    With U := X^T = L^-T stored in W's strict upper triangle and U's diagonal
    blocks in ``Dstack``, the product is computed row-major end to end:

        B(jp-row, s-col) = sum_{r >= jp} U[jp, r] U[s, r]^T
                         = dot_general(U[jp, r], U[s, r], contract dim1/dim1)

    — no W-read is ever contracted on dim 0, so layout assignment keeps the
    carry row-major (the n^2-relayout pathology; stage-1 pivot note).

    Read/write hazards (pi ascending, jp ascending inside):
    - panel pi writes B into the lower+diagonal blocks (jp*b, s), a region
      stage 3 never reads (it reads the strict upper + Dstack);
    - the mirror B^T lands at (s, jp*b), overwriting U's row band s block by
      block; step jp's reads of row s touch only columns >= jp*b, written at
      this or later steps, and later panels pi' > pi read only U rows >= pi';
    - U row jp is consumed at panels pi <= jp and overwritten by panel jp's
      own mirror, after its last read.
    """
    n = W.shape[0]
    k = n // b
    dtype = W.dtype
    f32 = jnp.float32
    eye_b = jnp.eye(b, dtype=f32)

    def lauum_step(pi, W):
        s = pi * b
        Dps = lax.dynamic_slice(Dstack, (pi, 0, 0), (1, b, b))[0]

        def col_body(jp, W):
            sj = jp * b
            Djp = lax.dynamic_slice(Dstack, (jp, 0, 0), (1, b, b))[0]
            # r == jp term: U[jp, jp] = Dstack[jp]; U[s, jp] is the strict
            # upper for jp > pi, and U[pi, pi] = Dps at jp == pi (the W
            # diagonal block holds X, not U — never read it here).
            Us_jp = jnp.where(jp > pi, lax.dynamic_slice(W, (s, sj), (b, b)),
                              Dps.astype(dtype))
            first = lax.dot_general(
                Djp.astype(dtype), Us_jp, (((1,), (1,)), ((), ())),
                precision=mm_precision(), preferred_element_type=f32,
            )

            def acc_body(r, acc):
                Ujp_r = lax.dynamic_slice(W, (sj, r * b), (b, b))
                Us_r = lax.dynamic_slice(W, (s, r * b), (b, b))
                return acc + lax.dot_general(
                    Ujp_r, Us_r, (((1,), (1,)), ((), ())),
                    precision=mm_precision(), preferred_element_type=f32,
                )

            B = lax.fori_loop(jp + 1, k, acc_body, first)
            W = lax.dynamic_update_slice(W, B.astype(dtype), (sj, s))
            # mirror B^T into the row band. NOT jnp's B.T: a bitcast
            # transpose feeding the DUS hands layout assignment a {0,1}
            # carry vote that relayouts all of W; an identity dot is a
            # layout-constraint boundary producing a real row-major B^T for
            # b^3 MACs (n^2 b/2 total — noise). HIGHEST: the 3-way bf16
            # split recombines products with exact 1.0 losslessly.
            BT = lax.dot_general(
                eye_b, B, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            cur = lax.dynamic_slice(W, (s, sj), (b, b))
            upd = jnp.where(jp > pi, BT.astype(dtype), cur)
            return lax.dynamic_update_slice(W, upd, (s, sj))

        return lax.fori_loop(pi, k, col_body, W)

    if unroll:  # see chol_inplace_fori: no while-carry double buffer
        for pi in range(k):
            W = lauum_step(pi, W)
        return W
    return lax.fori_loop(0, k, lauum_step, W)


# "auto" loop dispatch: unrolled chains below this many panels, fori at or
# above. Measured (CRPS-LOO step, BENCH_NOTES.md): fori is ~5%/2% slower at
# k = 4/8, 9% FASTER at k = 15, and its O(1) trace removes the unrolled
# chains' super-linear compile wall (~5 min at k = 60, >10 min at k = 122).
_FORI_MIN_PANELS = 12


def _resolve_loop(k_panels: int, loop: str) -> bool:
    if loop not in ("auto", "fori", "unroll"):
        raise ValueError(f"loop must be 'auto', 'fori' or 'unroll', got {loop!r}")
    if loop == "auto":
        return k_panels >= _FORI_MIN_PANELS
    return loop == "fori"


def ard_gram_inverse_inplace(
    log_signal_sq, log_length, log_noise_sq, x, n_real: int, block: int = 2048,
    return_half_logdet: bool = False, loop: str = "auto", storage=None,
):
    """K_hat^-1 for K_hat = K_ard(x[:n_real]) + noise I, padded block-diagonal.

    ``x`` must be row-padded to a multiple of ``block`` (see :func:`pad_rows`);
    rows >= ``n_real`` are masked so the padded system is exactly
    ``blockdiag(K_hat, (1 + noise) I)``. Returns the full [n_pad, n_pad]
    symmetric inverse; the top-left [n_real, n_real] block is K_hat^-1.
    With ``return_half_logdet=True`` returns ``(Kinv, half_logdet)`` where the
    half log-det covers the real block only (the NLML log-det term).

    ``loop`` picks the stage implementation: ``"unroll"`` = the trace-unrolled
    scan chains (O(n/block) trace), ``"fori"`` = the bounded-trace nested
    fori_loop stages (O(1) trace — the compile-wall fix), ``"auto"`` = by
    panel count (``_FORI_MIN_PANELS``). Same math, same buffer discipline.

    ``storage`` (default: x.dtype = fp32) sets the dtype of the n x n
    buffer; bfloat16 halves the HBM ceiling's n^2 term. Requires the fori
    stages (leaf factorizations and cross-block accumulations stay fp32).

    Not differentiable — this is the forward of the :mod:`gpscore.ops.loo_fused`
    custom-VJP cores, whose backward streams the parameter contraction off the
    returned inverse.
    """
    _check_padded(x.shape[0], n_real, block)
    reduced = storage is not None and storage != x.dtype
    if reduced and loop == "unroll":
        raise ValueError("reduced-precision storage requires the fori stages")
    if reduced or _resolve_loop(x.shape[0] // block, loop):
        W = _gram_khat_full(log_signal_sq, log_length, log_noise_sq, x,
                            n_real, storage, block)
        W, hld = chol_inplace_fori(W, block, n_real)
        W, Dstack = _tri_inv_fori(W, block)
        Kinv = _lauum_fori(W, Dstack, block)
    else:
        W, hld = _gram_chol_inplace(log_signal_sq, log_length, log_noise_sq, x,
                                    n_real, block)
        W = _tri_inv_inplace(W, block)
        Kinv = _lauum_inplace(W, block)
    if return_half_logdet:
        return Kinv, hld
    return Kinv


def ard_gram_chol_inplace(
    log_signal_sq, log_length, log_noise_sq, x, n_real: int, block: int = 2048,
    loop: str = "auto", storage=None,
):
    """(L, half_logdet) for the masked-padded K_hat, ~n^2 + O(n*block) peak.

    Stage 1 only — for consumers that need triangular solves against K_hat
    rather than its explicit inverse (fused NLML primal, large-n predictive).
    ``loop`` / ``storage`` as in :func:`ard_gram_inverse_inplace`.
    """
    _check_padded(x.shape[0], n_real, block)
    reduced = storage is not None and storage != x.dtype
    if reduced and loop == "unroll":
        raise ValueError("reduced-precision storage requires the fori stages")
    if reduced or _resolve_loop(x.shape[0] // block, loop):
        W = _gram_khat_full(log_signal_sq, log_length, log_noise_sq, x,
                            n_real, storage, block)
        return chol_inplace_fori(W, block, n_real)
    return _gram_chol_inplace(log_signal_sq, log_length, log_noise_sq, x,
                              n_real, block)
