"""In-place mesh-sharded Gram -> K_hat^-1 (potri) + streamed ARD backward.

The round-2 fused-sharded fit steps (`sharded_loo.py`, `sharded_kfold.py`)
kept only the row-sharded K^-1 as a *residual*, but their forward was still
out-of-place — K_hat, L, L^-1 and K^-1 existed as separate row-sharded n^2
buffers (`sharded_cholesky -> tri_inverse_lower -> L^-T L^-1`), and their
backward materialized K_hat_bar and a recomputed Gram as two more. Per-device
residency: ~2-3 n^2/p across a value_and_grad. This module ports the
single-chip in-place discipline (:mod:`gpscore.ops.potri_inplace`,
:func:`gpscore.ops.loo_fused._stream_param_grads`) to the mesh:

- :func:`ard_gram_inverse_inplace_sharded` — ONE shard_map region carries one
  [n/p, n] buffer per device through Gram-panel generation -> left-looking
  blocked Cholesky (fp32 panel accumulators, one rounding per stored block
  under 2-byte storage) -> in-place triangular inversion -> in-place lauum
  (K^-1 = L^-T L^-1). Every stage updates the local buffer with
  ``dynamic_update_slice`` (single consumer -> XLA buffer-assigns in place);
  cross-device traffic is one [n, b] panel strip per outer panel per stage
  (psum-assembled), ~3 n^2 floats over ICI total. Peak per device:
  n^2/p + O(n * block).
- :func:`make_streamed_ard_bwd` — the parameter-cotangent contraction
  ``theta_bar = sum_ij K_hat_bar_ij dK_ij/dtheta`` streamed over global row
  blocks: per block, the sandwich term's rows are assembled with one
  psum_scatter ([b, n] -> local [b, n/p] columns), the block's Gram columns
  are recomputed locally from x (never stored), and everything reduces into
  O(d) accumulators. Neither K_hat_bar nor the Gram ever exists as an n x n
  buffer: backward peak is the K^-1 residual + O(n * block) per device.

Together the fused-sharded steps hold ~n^2/p + O(n b) per device across the
whole step — the same residual discipline the single-chip in-place pipeline
measured at 1.04 n^2 (BENCH_NOTES.md), now scaled by 1/p.

All three stages run as nested ``lax.fori_loop``s over the [b, b] blocks of
the ACTIVE (triangular) region only — the single-chip bounded-trace pattern
(:func:`gpscore.ops.potri_inplace._tri_inv_fori`) adapted to the row shard:
each device walks ``clip(active_block - base, 0, kb_local)`` of its own row
blocks, with traced loop bounds, so trace size is O(1) in n/block AND the
FLOPs are exact (sum n^3/2 MACs across the three stages). The round-3 form
used static full-local-width panels + index masks, which paid ~3x MACs on
the Schur/accumulation GEMMs (rows outside the active triangle were computed
and discarded); only the O(n^2 b) epilogues keep the full-width-plus-mask
shape.

Like the rest of the sharded stack the kernels here are ARD
(`kin40k-FULL-compare.py:7-23`); reference analogue of the whole module: the
dense ``chol_solve(I, big_k)`` O(n^3)/O(n^2) wall at
`kin40k-FULL-compare.py:196,209,507`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, PartitionSpec as P

from gpscore.ops.kernels import ard_gram
from gpscore.utils.precision import (
    matmul,
    matmul_acc32,
    mm_precision,
    mm_precision_crit,
)


def _check_divisible(n: int, p: int, block: int) -> int:
    rows_per = n // p
    if n % p or rows_per % block:
        raise ValueError(
            f"n={n} must be divisible by devices*block={p}*{block}"
        )
    return rows_per


def ard_gram_inverse_inplace_sharded(
    log_signal_sq, log_length, log_noise_sq, x, mesh: Mesh,
    axis: str = "data", block: int = 256, storage=None,
):
    """(K_hat^-1 row-sharded [n, n], half_logdet) for K_hat = K_ard(x) + noise I.

    The distributed twin of
    :func:`gpscore.ops.potri_inplace.ard_gram_inverse_inplace` (module
    docstring has the three-stage plan). ``x``/scalars replicated in; K^-1
    comes back sharded ``P(axis)`` (full symmetric — both triangles written);
    the half log-det is the NLML term, free from stage 1. Not differentiable —
    this is the forward of the fused-sharded custom-VJP steps, paired with
    :func:`make_streamed_ard_bwd`.

    ``storage`` (default fp32) sets the per-device buffer dtype; bfloat16
    halves the per-device n^2/p residency (DOUBLING beyond-chip capacity at
    fixed mesh size) with the single-chip discipline: Gram panels computed
    fp32 and rounded once on store, fp32 leaf factorizations, fp32
    cross-block accumulators, bf16 ICI traffic for the O(n b) panel psums.
    """
    n = x.shape[0]
    p = mesh.shape[axis]
    rows_per = _check_divisible(n, p, block)
    b = block
    k = n // b
    d = x.shape[1]
    f32 = jnp.float32

    kb_local = rows_per // b  # row blocks per device (static)

    def local_fn(ls, ll, ln, x_full):
        idx = lax.axis_index(axis)
        row0 = idx * rows_per
        base = idx * kb_local  # global index of this device's first row block
        row_ids = row0 + jnp.arange(rows_per)
        col_ids = jnp.arange(n)
        dtype = x_full.dtype if storage is None else storage
        eye_b = jnp.eye(b, dtype=f32)
        noise = jnp.exp(ln)

        # Local Gram rows + noise diagonal: the buffer W is born as K_hat's
        # row shard and is overwritten in place by every later stage.
        x_loc = lax.dynamic_slice(x_full, (row0, 0), (rows_per, d))
        if dtype == x_full.dtype:
            W = ard_gram(x_loc, x_full, ls, ll)
            W = W + noise * (col_ids[None, :] == row_ids[:, None]).astype(dtype)
        else:
            # reduced storage: fp32 row panels, ONE rounding on store (a
            # whole-shard fp32 Gram would cost the 1.5x peak bf16 exists to
            # avoid).
            def gram_panel(pi, W):
                s = pi * b
                xb = lax.dynamic_slice(x_loc, (s, 0), (b, d))
                P = ard_gram(xb, x_full, ls, ll)
                rid = lax.dynamic_slice(row_ids, (s,), (b,))
                P = jnp.where(col_ids[None, :] == rid[:, None], P + noise, P)
                return lax.dynamic_update_slice(W, P.astype(dtype), (s, 0))

            W = lax.fori_loop(
                0, rows_per // b, gram_panel,
                lax.pcast(jnp.zeros((rows_per, n), dtype), (axis,),
                          to="varying"),
            )

        # Layout discipline (measured on v5e, n=8192: 4 n^2 -> ~2 n^2 step
        # temps, see BENCH_NOTES.md): no stage may transpose W itself. A
        # whole-buffer ``W.T`` (or ``slice(W).T`` wide as W) hands XLA layout
        # assignment a {0,1} preference for that loop's carry while the
        # GEMM-LHS slices in the other stages prefer {1,0}; the conflicting
        # while-loop carries are then bridged by full-n^2/p relayout copies
        # between the stages (one extra live buffer each). Transposes are
        # confined to [b, b] pivot blocks and [n, b] strips.

        # ---- stage 1: LEFT-looking blocked Cholesky, W <- L ---------------
        # (the single-chip chol_inplace_fori discipline on the mesh). Each
        # pivot's full left update accumulates in an fp32 [n/p, b] panel and
        # the column is stored ONCE — under 2-byte storage the right-looking
        # form re-rounds every trailing block per update and the accumulated
        # staircase rounding goes indefinite where one-shot rounding is SPD
        # (measured single-chip, gpscore/ops/potri_inplace.py). Also ~k/3
        # fewer trailing-matrix rewrites. Communication is unchanged: one
        # [b, n] row-band psum per pivot (the owner's already-stored L rows)
        # instead of one [n, b] column strip.
        crit = mm_precision_crit()

        def chol_step(kk, carry):
            W, hld = carry
            kb = kk * b
            owner = kb // rows_per
            local_off = kb - owner * rows_per
            band_contrib = lax.dynamic_slice(W, (local_off, 0), (b, n))
            band = lax.psum(
                jnp.where(idx == owner, band_contrib, jnp.zeros((), dtype)),
                axis,
            )  # [b, n]: rows kb..kb+b of L (cols < kb; the rest unused)

            P = lax.dynamic_slice(W, (0, kb), (rows_per, b)).astype(f32)

            # FLOP-exact left update: only the ACTIVE local row blocks
            # (global block >= kk) subtract their rank-kb Schur term, as
            # [b, b] GEMM blocks — inactive rows keep the raw K_hat value
            # and are masked out of Lcol below (same semantics as the
            # round-3 full-width form, at n^3/6 MACs instead of n^3/2).
            lo = jnp.clip(kk - base, 0, kb_local)

            def ip_body(ip, P):
                sl = ip * b
                blk = lax.dynamic_slice(P, (sl, 0), (b, b))

                def j_body(j, blk):
                    Lj = lax.dynamic_slice(W, (sl, j * b), (b, b))
                    Tj = lax.dynamic_slice(band, (0, j * b), (b, b))
                    # blk -= L[ip, j] L[kk, j]^T, contracted on dim 1 of
                    # both reads, fp32 accumulation whatever the storage.
                    return blk - lax.dot_general(
                        Lj, Tj, (((1,), (1,)), ((), ())),
                        precision=crit, preferred_element_type=f32,
                    )

                blk = lax.fori_loop(0, kk, j_body, blk)
                return lax.dynamic_update_slice(P, blk, (sl, 0))

            P = lax.fori_loop(lo, kb_local, ip_body, P)
            D_contrib = lax.dynamic_slice(P, (local_off, 0), (b, b))
            D = lax.psum(jnp.where(idx == owner, D_contrib, 0.0), axis)
            # D.T: bitcast into the cholesky leaf's column-major preference
            # (D is bit-symmetric; layout note above / commit 3b94eda).
            L_kk = jnp.linalg.cholesky(D.T)  # fp32 leaf (P is fp32)
            hld = hld + jnp.sum(jnp.log(jnp.diagonal(L_kk)))
            Linv_kk = solve_triangular(L_kk, eye_b, lower=True)
            # P L_kk^-T via the explicit [b, b] inverse: equals the
            # triangular solve against P.T without transposing a W slice.
            Lcol = matmul(P, Linv_kk.T)
            Lcol = jnp.where((row_ids >= kb)[:, None], Lcol, 0.0)
            Lcol = Lcol.astype(dtype)  # ONE rounding per stored block
            # the owner's pivot block stores cholesky's own output — exact
            # zero strict upper (the panel solve leaves roundoff there).
            piv = lax.dynamic_update_slice(
                Lcol, L_kk.astype(dtype), (local_off, 0)
            )
            Lcol = jnp.where(idx == owner, piv, Lcol)
            W = lax.dynamic_update_slice(W, Lcol, (0, kb))
            return W, hld

        W, hld = lax.fori_loop(0, k, chol_step, (W, jnp.zeros((), f32)))
        # Pivot blocks store cholesky's output (exact zero strict upper);
        # stage 2 still rewrites every column strip from masked inputs only —
        # its psum-assembled strip has exact zeros for rows < s (the Lcol
        # mask) and the acc GEMM reads only columns stage 2 already rewrote —
        # so L^-1 comes out with an exactly-zero strict upper triangle,
        # which stage 3 relies on.

        # ---- stage 2: in-place triangular inversion, W <- L^-1 -----------
        # Right-to-left: X[t:, s:t] = -X[t:, t:] L[t:, s:t] X_ss, where the
        # trailing X panels are already-overwritten columns (>= t) of W and
        # L's column strip [s:t) is psum-assembled before being overwritten.
        def trtri_step(i, W):
            pi = k - 1 - i
            s = pi * b
            t = s + b
            owner = s // rows_per
            local_off = s - owner * rows_per
            strip = lax.psum(
                lax.dynamic_update_slice(
                    jnp.zeros((n, b), dtype),
                    lax.dynamic_slice(W, (0, s), (rows_per, b)),
                    (row0, 0),
                ),
                axis,
            )
            # tril: the pivot block carries stage 1's roundoff-scale upper
            # garbage (no whole-W masking pass exists; see stage-1 tail note)
            Ljj = jnp.tril(lax.dynamic_slice(strip, (s, 0), (b, b)))
            Xjj = solve_triangular(Ljj.astype(f32), eye_b, lower=True)

            # FLOP-exact accumulation: active local row blocks (global
            # block g > pi) contract only the nonzero X blocks jp in
            # (pi, g] — X[g, jp] is exactly zero for jp > g (stage 1/2
            # write discipline), so the round-3 full-width loop burned
            # those MACs on zeros. Inactive rows stay zero in acc.
            lo = jnp.clip(pi + 1 - base, 0, kb_local)

            def ip_body(ip, acc):
                g = base + ip
                sl = ip * b

                def jp_body(jp, ablk):
                    Xp = lax.dynamic_slice(W, (sl, jp * b), (b, b))
                    Lb = lax.dynamic_slice(strip, (jp * b, 0), (b, b))
                    # fp32 cross-block accumulation regardless of storage
                    return ablk + lax.dot_general(
                        Xp, Lb, (((1,), (0,)), ((), ())),
                        precision=mm_precision(), preferred_element_type=f32,
                    )

                ablk = lax.fori_loop(
                    pi + 1, g + 1, jp_body,
                    lax.pcast(jnp.zeros((b, b), f32), (axis,), to="varying"),
                )
                return lax.dynamic_update_slice(acc, ablk, (sl, 0))

            acc = lax.fori_loop(
                lo, kb_local, ip_body,
                lax.pcast(jnp.zeros((rows_per, b), f32), (axis,),
                          to="varying"),
            )
            # rows < t contribute zero naturally (X is lower triangular), so
            # -acc Xjj is already masked; the owner adds the X_ss diagonal.
            ins = lax.dynamic_update_slice(
                jnp.zeros((rows_per, b), f32), Xjj, (local_off, 0)
            )
            new_col = -matmul(acc, Xjj) + jnp.where(idx == owner, ins, 0.0)
            return lax.dynamic_update_slice(W, new_col.astype(dtype), (0, s))

        W = lax.fori_loop(0, k, trtri_step, W)

        # ---- stage 3: in-place lauum, W <- K^-1 = L^-T L^-1 --------------
        # Column panel s reads only rows/columns >= s (still L^-1 there),
        # writes the lower column block and mirrors the strict-upper row band
        # — regions no later panel reads.
        def lauum_step(pi, W):
            s = pi * b
            owner = s // rows_per
            local_off = s - owner * rows_per
            mask_ge_s = (row_ids >= s)[:, None]

            # Partial B rows, transposed, FLOP-exact: B^T[c, j] =
            # sum_r X[r, s+c] X[r, j], where both factors are nonzero only
            # on the lower triangle — row block g contributes to column
            # blocks jp in [pi, g] exactly (X[g, jp] = 0 above the
            # diagonal). Each active local row block accumulates its [b, b]
            # products into the [b, n] partial, contracted on the local row
            # axis — no W-wide transpose (layout note above), the band
            # mirror consumes B^T directly, n^3/6 MACs total.
            lo = jnp.clip(pi - base, 0, kb_local)

            def ip_body(ip, BpartT):
                g = base + ip
                sl = ip * b
                Mblk = lax.dynamic_slice(W, (sl, s), (b, b))

                def jp_body(jp, BpartT):
                    Wc = lax.dynamic_slice(W, (sl, jp * b), (b, b))
                    blk = lax.dot_general(
                        Mblk, Wc, (((0,), (0,)), ((), ())),
                        precision=mm_precision(), preferred_element_type=f32,
                    )
                    cur = lax.dynamic_slice(BpartT, (0, jp * b), (b, b))
                    return lax.dynamic_update_slice(
                        BpartT, cur + blk, (0, jp * b)
                    )

                return lax.fori_loop(pi, g + 1, jp_body, BpartT)

            BpartT = lax.fori_loop(
                lo, kb_local, ip_body,
                lax.pcast(jnp.zeros((b, n), f32), (axis,), to="varying"),
            )
            B_fullT = lax.psum(BpartT, axis)  # [b, n]
            B_loc = lax.dynamic_slice(B_fullT, (0, row0), (b, rows_per)).T
            cur = lax.dynamic_slice(W, (0, s), (rows_per, b))
            W = lax.dynamic_update_slice(
                W, jnp.where(mask_ge_s, B_loc.astype(dtype), cur), (0, s)
            )
            band = lax.dynamic_slice(W, (local_off, 0), (b, n))
            upd = jnp.where(
                jnp.logical_and(idx == owner, col_ids >= s + b)[None, :],
                B_fullT.astype(dtype),
                band,
            )
            return lax.dynamic_update_slice(W, upd, (local_off, 0))

        W = lax.fori_loop(0, k, lauum_step, W)
        return W, hld

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(axis), P()),
    )
    return fn(log_signal_sq, log_length, log_noise_sq, x)


def sharded_diag(M, mesh: Mesh, axis: str = "data"):
    """diag(M) [n] (sharded ``P(axis)``) from a row-sharded square M — each
    device gathers its own diagonal entries; no relayout of M."""
    n = M.shape[0]
    rows_per = n // mesh.shape[axis]

    def local_fn(M_loc):
        row0 = lax.axis_index(axis) * rows_per
        r = jnp.arange(rows_per)
        return M_loc[r, row0 + r]

    return shard_map(local_fn, mesh=mesh, in_specs=P(axis), out_specs=P(axis))(M)


def make_streamed_ard_bwd(
    mesh: Mesh, mode: str, fold_k: int | None = None,
    axis: str = "data", block: int = 256,
):
    """Streamed parameter-cotangent contraction off a row-sharded K^-1.

    Returns ``bwd(Kinv, a, x, log_signal_sq, log_length, log_noise_sq, cot)
    -> (s_bar, l_bar, n_bar, w)`` computing, per ``mode``, the cotangents of
    the fused cores' math (:mod:`gpscore.ops.loo_fused` module docstring):

    - ``"loo"``:   cot = (a_bar, d_bar);  K_hat_bar = -w a^T - K^-1 D K^-1,
      w = K^-1 a_bar, D = diag(d_bar). Returned ``w`` is y_bar.
    - ``"kfold"``: cot = (a_bar, A_bar [fold_k, nf, nf]); the sandwich is
      -K^-1 blockdiag(A_bar) K^-1. Returned ``w`` is y_bar. Requires the
      device row-range to tile the folds (nf % (n/p) == 0 or vice versa).
    - ``"nlml"``:  cot = v_bar (scalar); K_hat_bar = v_bar (K^-1 - a a^T)/2
      via w = (v_bar/2) a, extra = (v_bar/2) K^-1 rows. y_bar is v_bar * a
      (caller-side).

    Per global row block: the sandwich rows' columns are psum_scatter-reduced
    to their owners ([b, n] -> [b, n/p]); the Gram block columns are
    recomputed locally from x; all reductions accumulate into O(d) carries
    psum-ed once at the end. No n x n temp exists at any point.
    """
    if mode not in ("loo", "kfold", "nlml"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "kfold" and not fold_k:
        raise ValueError("mode='kfold' needs fold_k")
    p = mesh.shape[axis]
    b = block

    def bwd(Kinv, a, x, log_signal_sq, log_length, log_noise_sq, cot):
        n = x.shape[0]
        rows_per = _check_divisible(n, p, block)
        k = n // b
        d = x.shape[1]
        if mode == "kfold":
            nf = n // fold_k
            if nf % rows_per == 0:
                fold_case = "device_within_fold"
            elif rows_per % nf == 0:
                fold_case = "folds_within_device"
            else:
                raise ValueError(
                    f"fold size {nf} and device rows {rows_per} must tile "
                    "each other"
                )

        def local_fn(Kinv_loc, a_full, x_full, ls, ll, ln, *cot_flat):
            idx = lax.axis_index(axis)
            row0 = idx * rows_per
            dtype = x_full.dtype

            z = x_full * jnp.exp(-jnp.reshape(ll, (1, -1)))
            zz = z * z
            x_loc = lax.dynamic_slice(x_full, (row0, 0), (rows_per, d))
            z_loc = lax.dynamic_slice(z, (row0, 0), (rows_per, d))
            zz_loc = lax.dynamic_slice(zz, (row0, 0), (rows_per, d))
            a_loc = lax.dynamic_slice(a_full, (row0,), (rows_per,))

            if mode == "nlml":
                (v_bar,) = cot_flat
                half = 0.5 * v_bar
                w = half * a_full  # replicated
            else:
                a_bar = cot_flat[0]
                # fp32-accumulating read of the (possibly bf16) residual
                w_loc = matmul_acc32(
                    Kinv_loc, a_bar.astype(Kinv_loc.dtype).reshape(n, 1)
                )[:, 0]
                w = lax.psum(
                    lax.dynamic_update_slice(
                        jnp.zeros((n,), dtype), w_loc, (row0,)
                    ),
                    axis,
                )
            if mode == "loo":
                d_bar = cot_flat[1]
                d_bar_loc = lax.dynamic_slice(d_bar, (row0,), (rows_per,))
            if mode == "kfold":
                A_bar = cot_flat[1]

            def extra_cols(s, colsl):
                """Local columns [b, n/p] of K_hat_bar's non-rank-1 term for
                row block [s, s+b). ``colsl`` = Kinv[R_q, s:s+b], which by
                symmetry is Kinv_B[:, R_q]^T."""
                if mode == "nlml":
                    return half * colsl.T.astype(jnp.float32)
                if mode == "loo":
                    M = (colsl.T * d_bar_loc[None, :]).astype(Kinv_loc.dtype)
                    T_q = matmul_acc32(M, Kinv_loc)
                else:
                    # M_B[:, R_q] = Kinv_B[:, fold cols] @ A_bar[f][:, local]
                    if fold_case == "device_within_fold":
                        f_q = row0 // nf
                        fold0 = f_q * nf
                        KB_fold = lax.psum(
                            lax.dynamic_update_slice(
                                jnp.zeros((n, b), colsl.dtype), colsl,
                                (row0, 0)
                            ),
                            axis,
                        )  # full Kinv[:, s:s+b]; fold rows sliced below
                        K_fold = lax.dynamic_slice(
                            KB_fold, (fold0, 0), (nf, b)
                        )  # [nf, b] = Kinv_B[:, fold]^T
                        A_sl = lax.dynamic_slice(
                            A_bar, (f_q, 0, row0 - fold0), (1, nf, rows_per)
                        )[0]
                        M_cols = matmul(K_fold.T.astype(jnp.float32), A_sl)
                    else:  # folds_within_device
                        m = rows_per // nf
                        f0 = row0 // nf
                        A_sl = lax.dynamic_slice(
                            A_bar, (f0, 0, 0), (m, nf, nf)
                        )
                        M_cols = jnp.einsum(
                            "bmi,mij->bmj",
                            colsl.T.reshape(b, m, nf).astype(jnp.float32),
                            A_sl,
                            precision=jax.lax.Precision.HIGHEST,
                        ).reshape(b, rows_per)
                    T_q = matmul_acc32(M_cols.astype(Kinv_loc.dtype), Kinv_loc)
                return -lax.psum_scatter(
                    T_q, axis, scatter_dimension=1, tiled=True
                )

            def body(blk, carry):
                s_acc, rzz, czz, cross, tr = carry
                s = blk * b
                owner = s // rows_per
                local_off = s - owner * rows_per
                colsl = lax.dynamic_slice(Kinv_loc, (0, s), (rows_per, b))
                w_B = lax.dynamic_slice(w, (s,), (b,))
                Khat_cols = -w_B[:, None] * a_loc[None, :] + extra_cols(
                    s, colsl
                )
                x_B = lax.dynamic_slice(x_full, (s, 0), (b, d))
                z_B = lax.dynamic_slice(z, (s, 0), (b, d))
                zz_B = lax.dynamic_slice(zz, (s, 0), (b, d))
                K_B = ard_gram(x_B, x_loc, ls, ll)  # [b, n/p], recomputed
                C = Khat_cols * K_B
                s_acc = s_acc + jnp.sum(C)
                rzz = rzz + matmul(jnp.sum(C, axis=1).reshape(1, b), zz_B)[0]
                czz = czz + matmul(
                    jnp.sum(C, axis=0).reshape(1, rows_per), zz_loc
                )[0]
                cross = cross + jnp.sum(z_B * matmul(C, z_loc), axis=0)
                diag_seg = lax.dynamic_slice(
                    Khat_cols, (0, local_off), (b, b)
                )
                tr = tr + jnp.where(idx == owner, jnp.trace(diag_seg), 0.0)
                return s_acc, rzz, czz, cross, tr

            init = jax.tree.map(
                lambda v: lax.pcast(v, (axis,), to="varying"),
                (
                    jnp.zeros((), dtype),
                    jnp.zeros((d,), dtype),
                    jnp.zeros((d,), dtype),
                    jnp.zeros((d,), dtype),
                    jnp.zeros((), dtype),
                ),
            )
            s_acc, rzz, czz, cross, tr = lax.fori_loop(0, k, body, init)
            s_bar, rzz, czz, cross, tr = lax.psum(
                (s_acc, rzz, czz, cross, tr), axis
            )
            l_bar = jnp.reshape(rzz + czz - 2.0 * cross, jnp.shape(ll))
            n_bar = jnp.exp(ln) * tr
            return s_bar, l_bar, n_bar, w

        cot_flat = (cot,) if mode == "nlml" else tuple(cot)
        fn = shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(axis),) + (P(),) * (5 + len(cot_flat)),
            out_specs=(P(), P(), P(), P()),
        )
        return fn(Kinv, a, x, log_signal_sq, log_length, log_noise_sq,
                  *cot_flat)

    return bwd
