"""Mesh-sharded FOLD-STREAMED k-fold objectives: no fold stacks on any device.

The round-4 fused-sharded k-fold step
(:func:`gpscore.parallel.sharded_kfold.make_sharded_fused_kfold_fit_step`
with ``streamed=False``) holds, besides the row-sharded K^-1, the REPLICATED
``[fold_k, nb, nb]`` fold-block stack (an explicit all_gather of n^2/k), the
fold consumer's factor stack, and the A_bar cotangent stack — ~n^2 + 3 n^2/k
per device at p = 1, measured as the sharded dss fp32 step OOMing at
n = 53,248 where the single-chip fold-streamed path (round 5,
:mod:`gpscore.ops.fold_stream`) runs 60,416.

This module ports the fold-streaming discipline to the mesh: ONE fold's
[nb, nb] block is psum-assembled from the row shard, factored/scored/
adjoint-ed replicated (every device does the identical small dense compute —
k * O(nb^3) total, ~n^3/k^2 next to the n^3/2 factorization), and its
sandwich contribution to the ARD parameter cotangent is streamed over row
blocks before the next fold's block exists. Per-device peak:

    n^2/p st   (the in-place sharded potri residual, sharded_potri.py)
    + 1-2 [nb, nb] fold transients   (replicated; nb = n/fold_k)
    + [b, n/p] stream temps

— the single-chip streamed profile scaled by 1/p on the n^2 term. The
cross-device traffic ADDS one [nb, b]-per-row-block gather per fold
(k * (n/b) * nb * b = n^2 entries total, the same order as the stacked
version's [n, b] gathers) on top of the potri stages' ~3 n^2.

Backward sandwich, per fold f (A_bar_f replicated, symmetric):

    S_f[rows s:s+b, local cols R_q] = G_f^T @ A_bar_f @ K^-1[cols_f, R_q]

with G_f = K^-1[cols_f, s:s+b] psum-assembled and K^-1[cols_f, R_q] =
(Kinv_loc[:, cols_f])^T a LOCAL slice (symmetry) — each device computes its
own columns directly, no psum_scatter. Two contraction orders, chosen by
mesh shape:

- ``p <= fold_k`` (rows_per >= nb): M1 = A_bar_f G_f per row block
  ([nb, b], replicated MACs k n nb^2 = n^3/k total) then M1^T-contraction
  against the local slice — no [nb, n/p] temp, which is what lets the p = 1
  TPU mesh reach the single-chip fold ceiling.
- ``p > fold_k``: N_f = A_bar_f K^-1[cols_f, R_q] once per fold
  ([nb, n/p] local, n^2/(k p) — small at large p) then G_f^T N_f per row
  block; all n^3-order MACs scale 1/p.

Reference analogue: the per-fold conditional scoring loops at
`kin40k-FULL-compare.py:500-543` / `KIN40K-COMPARE-ALL-FITC-20.py:667-720`,
which run on a dense CPU inverse at n = 500. The reference has no
parallelism (SURVEY.md §2.9); the mesh design is TPU-native (shard_map +
psum over the ('batch','data') mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpscore.ops import fold_core
from gpscore.ops.fold_stream import (
    _ainv_from_prepped,
    _dot32,
    _fold_cot_es,
    _fold_cot_stats,
    _li_from_prepped,
    _prep_block,
    _solve_e,
)
from gpscore.ops.kernels import ard_gram
from gpscore.parallel.sharded_potri import (
    _check_divisible,
    ard_gram_inverse_inplace_sharded,
)
from gpscore.utils.precision import matmul_acc32, mm_precision, storage_dtype

f32 = jnp.float32


def _check_fold_tiling(n: int, p: int, fold_k: int) -> int:
    nb = n // fold_k
    rows_per = n // p
    if n % fold_k:
        raise ValueError(f"n={n} not divisible by fold_k={fold_k}")
    if not (nb % rows_per == 0 or rows_per % nb == 0):
        raise ValueError(
            f"fold size {nb} and device rows {rows_per} must tile each other"
        )
    return nb


def _gather_fold_strip(Kinv_loc, f, c0, w, nb, rows_per, axis):
    """[nb, w] replicated = K^-1[fold-f rows, c0:c0+w] psum-assembled from
    the row shard. ``f``/``w`` static, ``c0`` may be traced. Cases mirror
    :func:`gpscore.parallel.sharded_potri.make_streamed_ard_bwd`: one owner
    device when folds tile devices, a contiguous device range otherwise."""
    idx = lax.axis_index(axis)
    dtype = Kinv_loc.dtype
    if nb <= rows_per:  # folds within device: a single (static) owner
        owner = (f * nb) // rows_per
        loc = f * nb - owner * rows_per
        sl = lax.dynamic_slice(Kinv_loc, (loc, c0), (nb, w))
        return lax.psum(
            jnp.where(idx == owner, sl, jnp.zeros((), dtype)), axis
        )
    # device within fold: each in-fold device drops its rows at its offset
    row0 = idx * rows_per
    sl = lax.dynamic_slice(Kinv_loc, (0, c0), (rows_per, w))
    in_fold = jnp.logical_and(row0 >= f * nb, row0 < (f + 1) * nb)
    off = jnp.clip(row0 - f * nb, 0, nb - rows_per)
    contrib = lax.dynamic_update_slice(
        jnp.zeros((nb, w), dtype),
        jnp.where(in_fold, sl, jnp.zeros((), dtype)),
        (off, 0),
    )
    return lax.psum(contrib, axis)


def _acc_stream_pass(accs, Kinv_loc, x_full, z, zz, ls, ll, cols_of, b,
                     rows_per, axis):
    """Accumulate ``sum_ij C_ij dK_ij/dtheta`` chain-rule carries for
    C = Khat_cols o K over global row blocks, where ``cols_of(s) -> [b,
    rows_per]`` produces this device's local columns of one K_hat_bar term
    for row block s. The Gram block is recomputed from x per pass (n^2 d
    MACs — noise next to the n^3 sandwich GEMMs). Same accumulator algebra
    as sharded_potri.make_streamed_ard_bwd's body, fp32 carries."""
    n = x_full.shape[0]
    d = x_full.shape[1]
    idx = lax.axis_index(axis)
    row0 = idx * rows_per
    x_loc = lax.dynamic_slice(x_full, (row0, 0), (rows_per, d))
    z_loc = lax.dynamic_slice(z, (row0, 0), (rows_per, d))
    zz_loc = lax.dynamic_slice(zz, (row0, 0), (rows_per, d))

    def body(blk, carry):
        s_acc, rzz, czz, cross, tr = carry
        s = blk * b
        owner = s // rows_per
        local_off = s - owner * rows_per
        Khat_cols = cols_of(s)  # [b, rows_per] fp32
        x_B = lax.dynamic_slice(x_full, (s, 0), (b, d))
        z_B = lax.dynamic_slice(z, (s, 0), (b, d))
        zz_B = lax.dynamic_slice(zz, (s, 0), (b, d))
        K_B = ard_gram(x_B, x_loc, ls, ll)
        C = Khat_cols * K_B
        s_acc = s_acc + jnp.sum(C)
        rzz = rzz + jnp.matmul(
            jnp.sum(C, axis=1).reshape(1, b), zz_B,
            precision=mm_precision(),
        )[0]
        czz = czz + jnp.matmul(
            jnp.sum(C, axis=0).reshape(1, rows_per), zz_loc,
            precision=mm_precision(),
        )[0]
        cross = cross + jnp.sum(
            z_B * jnp.matmul(C, z_loc, precision=mm_precision()), axis=0
        )
        diag_seg = lax.dynamic_slice(Khat_cols, (0, local_off), (b, b))
        tr = tr + jnp.where(idx == owner, jnp.trace(diag_seg), 0.0)
        return s_acc, rzz, czz, cross, tr

    return lax.fori_loop(0, n // b, body, accs)


def _rank1_accs_sharded(accs, x_full, z, zz, ls, ll, w, a, rows_per, axis,
                        b):
    """Rank-1 term ``K_hat_bar += -w a^T`` contracted against the ARD chain
    rule WITHOUT an n^2 stream pass — the single-chip matvec collapse
    (:func:`gpscore.ops.fold_stream._rank1_accs`) on the row shard: this
    device's rows of KV for V = [a | w | a o z] via per-panel Gram
    recompute (no [n/p, n] buffer), then O(n/p) local reductions into the
    carries. The caller's final psum(accs) completes the cross-device sum
    (each accumulator is a full double sum partitioned by LOCAL rows here
    vs local COLUMNS in :func:`_acc_stream_pass` — same totals)."""
    n, d = x_full.shape
    idx = lax.axis_index(axis)
    row0 = idx * rows_per
    x_loc = lax.dynamic_slice(x_full, (row0, 0), (rows_per, d))
    z_loc = lax.dynamic_slice(z, (row0, 0), (rows_per, d))
    zz_loc = lax.dynamic_slice(zz, (row0, 0), (rows_per, d))
    w_loc = lax.dynamic_slice(w, (row0,), (rows_per,))
    a_loc = lax.dynamic_slice(a, (row0,), (rows_per,))
    V = jnp.concatenate([a[:, None], w[:, None], a[:, None] * z], axis=1)

    def panel(cb, KV):
        c0 = cb * b
        Kp = ard_gram(
            x_loc, lax.dynamic_slice(x_full, (c0, 0), (b, d)), ls, ll
        )
        return KV + jnp.matmul(
            Kp, lax.dynamic_slice(V, (c0, 0), (b, d + 2)),
            precision=mm_precision(),
        )

    KV = lax.fori_loop(
        0, n // b, panel,
        lax.pcast(jnp.zeros((rows_per, d + 2), f32), (axis,), to="varying"),
    )
    Ka, Kw, Kaz = KV[:, 0], KV[:, 1], KV[:, 2:]
    s_a, rzz, czz, cross, tr = accs
    s_a = s_a - jnp.sum(w_loc * Ka)
    rzz = rzz - jnp.sum((w_loc * Ka)[:, None] * zz_loc, axis=0)
    czz = czz - jnp.sum((a_loc * Kw)[:, None] * zz_loc, axis=0)
    cross = cross - jnp.sum(w_loc[:, None] * z_loc * Kaz, axis=0)
    tr = tr - jnp.sum(w_loc * a_loc)
    return s_a, rzz, czz, cross, tr


def _fold_sandwich_cols(Kinv_loc, Ab_f, f, nb, rows_per, axis, b):
    """Returns ``cols_of(s) -> [b, rows_per]`` producing this device's local
    columns of ``-K^-1[:, cols_f] A_bar_f K^-1[cols_f, :]`` for row block s
    (module docstring: M1 form at p <= fold_k, N form above)."""
    st = Kinv_loc.dtype
    use_nf = rows_per < nb
    if use_nf:
        # N_f = A_bar_f @ K^-1[cols_f, R_q]: dim-1 x dim-1 contraction of
        # the [rows_per, nb] local slice (n^2/(fold_k p) — small at the
        # p > fold_k meshes this branch serves; never transposed wholesale
        # — layout rules).
        Kslice = lax.dynamic_slice(Kinv_loc, (0, f * nb), (rows_per, nb))
        N_f = lax.dot_general(
            Ab_f, Kslice, (((1,), (1,)), ((), ())),
            precision=mm_precision(), preferred_element_type=f32,
        ).astype(st)  # [nb, rows_per]

    def cols_of(s):
        G = _gather_fold_strip(Kinv_loc, f, s, b, nb, rows_per, axis)
        if use_nf:
            return -lax.dot_general(
                G, N_f, (((0,), (0,)), ((), ())),
                precision=mm_precision(), preferred_element_type=f32,
            )
        M1 = _dot32(Ab_f, G).astype(st)  # [nb, b] replicated
        # S's column panels accumulate through a DUS chain reading [b, nb]
        # loop-offset slices of the SYMMETRIC K^-1 (K^-1[cols_f, co-panel]
        # = K^-1[co-panel, cols_f]^T) — the single-chip _sandwich_pass
        # discipline. A single whole-column GEMM here reads a
        # [rows_per, nb] slice that XLA materializes: n^2 e / fold_k per
        # device at p = 1, measured as the 2.4-2.7 GB by which the p=1
        # mesh missed the single-chip fold ceilings (60,416 fp32 /
        # 86,016 f16 OOM dumps, round 5).
        def cb_body(cb, S):
            co = cb * b
            ST = lax.dynamic_slice(Kinv_loc, (co, f * nb), (b, nb))
            blk = lax.dot_general(
                M1, ST, (((0,), (1,)), ((), ())),
                precision=mm_precision(), preferred_element_type=f32,
            )
            return lax.dynamic_update_slice(S, blk, (0, co))

        S = lax.fori_loop(
            0, rows_per // b, cb_body,
            lax.pcast(jnp.zeros((b, rows_per), f32), (axis,), to="varying"),
        )
        return -S

    return cols_of


def make_sharded_streamed_fold_stats(
    mesh: Mesh, fold_k: int, want_inv_diag: bool = True,
    axis: str = "data", block: int = 256,
):
    """Mesh-sharded twin of
    :func:`gpscore.ops.fold_stream.ard_fold_stats_stream`: custom-VJP
    ``(log_signal_sq, log_length, log_noise_sq, x, y) -> (e [k, nb],
    hld [k], inv_diag [k, nb], a [n])`` for the fold conditionals
    A_f = [K_hat^-1]_ff (reference `kin40k-FULL-compare.py:500-530`), with
    the forward on the in-place sharded potri pipeline and folds processed
    one at a time (module docstring). Differentiable w.r.t. the three
    log-hyperparameters and y."""
    p = mesh.shape[axis]
    row = NamedSharding(mesh, P(axis))

    def _stats_local(Kinv_loc, y_full):
        n = y_full.shape[0]
        nb = n // fold_k
        rows_per = n // p
        idx = lax.axis_index(axis)
        row0 = idx * rows_per
        st = Kinv_loc.dtype
        a_loc = matmul_acc32(Kinv_loc, y_full.astype(st)[:, None])[:, 0]
        a = lax.psum(
            lax.dynamic_update_slice(
                jnp.zeros((n,), f32), a_loc.astype(f32), (row0,)
            ),
            axis,
        )
        # fori over folds, exactly like the single-chip primitive: the loop
        # is sequential BY CONSTRUCTION, so per-fold blocks never coexist
        # (a Python-unrolled loop here let XLA hoist all fold_k gather +
        # factor chains — measured +2 n^2 of temps on the p=1 TPU mesh).
        def fold_body(f, carry):
            e_o, hld_o, d_o = carry
            Df = _gather_fold_strip(
                Kinv_loc, f, f * nb, nb, nb, rows_per, axis
            )
            Li, hld_f = _li_from_prepped(_prep_block(Df, nb), nb)
            a_f = lax.dynamic_slice(a, (f * nb,), (nb,))
            e_f = _solve_e(Li, a_f, nb)
            e_o = lax.dynamic_update_slice(e_o, e_f[None], (f, 0))
            hld_o = hld_o.at[f].set(hld_f)
            if want_inv_diag:
                d_f = jnp.einsum(
                    "ij,ij->j", Li, Li, precision=mm_precision(),
                    preferred_element_type=f32,
                )[:nb]
                d_o = lax.dynamic_update_slice(d_o, d_f[None], (f, 0))
            return e_o, hld_o, d_o

        init = (jnp.zeros((fold_k, nb), f32), jnp.zeros((fold_k,), f32),
                jnp.zeros((fold_k, nb), f32))
        e, hld, inv_diag = lax.fori_loop(0, fold_k, fold_body, init)
        return e, hld, inv_diag, a

    stats_sm = shard_map(
        _stats_local, mesh=mesh, in_specs=(P(axis), P()),
        out_specs=(P(), P(), P(), P()),
    )

    def _fwd_impl(log_signal_sq, log_length, log_noise_sq, x, y):
        n = x.shape[0]
        _check_divisible(n, p, block)
        _check_fold_tiling(n, p, fold_k)
        Kinv, _ = ard_gram_inverse_inplace_sharded(
            log_signal_sq, log_length, log_noise_sq, x, mesh,
            axis=axis, block=block, storage=storage_dtype(),
        )
        Kinv = jax.lax.with_sharding_constraint(Kinv, row)
        e, hld, inv_diag, a = stats_sm(Kinv, y)
        return (e, hld, inv_diag, a), Kinv

    @jax.custom_vjp
    def stats_fn(log_signal_sq, log_length, log_noise_sq, x, y):
        outs, _ = _fwd_impl(log_signal_sq, log_length, log_noise_sq, x, y)
        return outs

    def f_fwd(log_signal_sq, log_length, log_noise_sq, x, y):
        outs, Kinv = _fwd_impl(log_signal_sq, log_length, log_noise_sq, x, y)
        e = outs[0]
        a = outs[3]
        return outs, (Kinv, a, e, log_signal_sq, log_length, log_noise_sq, x)

    def _bwd_local(Kinv_loc, a, e, x_full, ls, ll, ln, e_bar, hld_bar,
                   d_bar, a_bar_out):
        n = x_full.shape[0]
        nb = n // fold_k
        rows_per = Kinv_loc.shape[0]
        d = x_full.shape[1]
        idx = lax.axis_index(axis)
        row0 = idx * rows_per
        st = Kinv_loc.dtype
        z = x_full * jnp.exp(-jnp.reshape(ll, (1, -1)))
        zz = z * z

        accs = jax.tree.map(
            lambda v: lax.pcast(v, (axis,), to="varying"),
            (jnp.zeros((), f32), jnp.zeros((d,), f32), jnp.zeros((d,), f32),
             jnp.zeros((d,), f32), jnp.zeros((), f32)),
        )
        def fold_body(f, carry):
            accs, ub = carry
            Df = _gather_fold_strip(
                Kinv_loc, f, f * nb, nb, nb, rows_per, axis
            )
            Ainv, _ = _ainv_from_prepped(_prep_block(Df, nb), nb)
            Ab_f, u = _fold_cot_stats(
                Ainv, e[f], e_bar[f], hld_bar[f],
                d_bar[f] if want_inv_diag else e_bar[f],
                nb, want_inv_diag,
            )
            ub = lax.dynamic_update_slice(ub, u[:nb], (f * nb,))
            cols_of = _fold_sandwich_cols(
                Kinv_loc, Ab_f, f, nb, rows_per, axis, block
            )
            accs = _acc_stream_pass(
                accs, Kinv_loc, x_full, z, zz, ls, ll, cols_of, block,
                rows_per, axis,
            )
            return accs, ub

        # fori over folds: sequential by construction (see _stats_local).
        accs, ub = lax.fori_loop(
            0, fold_k, fold_body, (accs, jnp.zeros((n,), f32))
        )

        a_bar = a_bar_out.astype(f32) + ub
        w_loc = matmul_acc32(Kinv_loc, a_bar.astype(st)[:, None])[:, 0]
        w = lax.psum(
            lax.dynamic_update_slice(
                jnp.zeros((n,), f32), w_loc.astype(f32), (row0,)
            ),
            axis,
        )
        accs = _rank1_accs_sharded(
            accs, x_full, z, zz, ls, ll, w, a, rows_per, axis, block
        )
        s_acc, rzz, czz, cross, tr = lax.psum(accs, axis)
        l_bar = jnp.reshape(rzz + czz - 2.0 * cross, jnp.shape(ll))
        n_bar = jnp.exp(ln) * tr
        return s_acc, l_bar, n_bar, w

    bwd_sm = shard_map(
        _bwd_local, mesh=mesh,
        in_specs=(P(axis),) + (P(),) * 10,
        out_specs=(P(), P(), P(), P()),
    )

    def f_bwd(res, cot):
        Kinv, a, e, log_signal_sq, log_length, log_noise_sq, x = res
        # Barrier the cotangents: an all-zero cotangent (an output the loss
        # does not read — e.g. hld under the kc rule) otherwise
        # constant-folds into the shard_map body, and the simplified p = 2
        # program hits an XLA:CPU codegen segfault (deterministic,
        # bisected round 5: any real use of hld unchanged the crash away).
        e_bar, hld_bar, d_bar, a_bar_out = lax.optimization_barrier(cot)
        Kinv = jax.lax.with_sharding_constraint(Kinv, row)
        s_bar, l_bar, n_bar, w = bwd_sm(
            Kinv, a, e, x, log_signal_sq, log_length, log_noise_sq,
            e_bar, hld_bar, d_bar, a_bar_out,
        )
        n = x.shape[0]
        return s_bar, l_bar, n_bar, jnp.zeros_like(x), w[:n]

    stats_fn.defvjp(f_fwd, f_bwd)
    return stats_fn


def make_sharded_streamed_fold_es(
    mesh: Mesh, fold_k: int, num_sim: int = 300, es_beta: float = 1.0,
    axis: str = "data", block: int = 256,
):
    """Mesh-sharded twin of
    :func:`gpscore.ops.fold_stream.ard_fold_es_stream`: custom-VJP
    ``(log_signal_sq, log_length, log_noise_sq, x, y, key_data) ->
    scores [k]`` — per-fold MC energy scores of the block conditionals
    (reference `kin40k-FULL-compare.py:616-657`, S(S-1) normalization),
    eps regenerated per fold from counter keys in forward AND backward (no
    sample stack on any device)."""
    p = mesh.shape[axis]
    row = NamedSharding(mesh, P(axis))

    def _es_local(Kinv_loc, y_full, key_data):
        n = y_full.shape[0]
        nb = n // fold_k
        rows_per = n // p
        idx = lax.axis_index(axis)
        row0 = idx * rows_per
        st = Kinv_loc.dtype
        a_loc = matmul_acc32(Kinv_loc, y_full.astype(st)[:, None])[:, 0]
        a = lax.psum(
            lax.dynamic_update_slice(
                jnp.zeros((n,), f32), a_loc.astype(f32), (row0,)
            ),
            axis,
        )
        # fori over folds: sequential by construction (see _stats_local).
        def fold_body(f, carry):
            scores_o, e_o = carry
            Df = _gather_fold_strip(
                Kinv_loc, f, f * nb, nb, nb, rows_per, axis
            )
            Li, _ = _li_from_prepped(_prep_block(Df, nb), nb)
            a_f = lax.dynamic_slice(a, (f * nb,), (nb,))
            e_f = _solve_e(Li, a_f, nb)
            eps_f = fold_core._fold_eps(key_data, f, Li.shape[0], num_sim)
            zT = _dot32(jnp.swapaxes(Li, 0, 1), eps_f.astype(st))[:nb]
            s_f = fold_core._es_from_cols(zT, e_f, num_sim, es_beta)
            return scores_o.at[f].set(s_f), lax.dynamic_update_slice(
                e_o, e_f[None], (f, 0))

        scores, e = lax.fori_loop(
            0, fold_k, fold_body,
            (jnp.zeros((fold_k,), f32), jnp.zeros((fold_k, nb), f32)),
        )
        return scores, e, a

    es_sm = shard_map(
        _es_local, mesh=mesh, in_specs=(P(axis), P(), P()),
        out_specs=(P(), P(), P()),
    )

    def _fwd_impl(log_signal_sq, log_length, log_noise_sq, x, y, key_data):
        n = x.shape[0]
        _check_divisible(n, p, block)
        _check_fold_tiling(n, p, fold_k)
        Kinv, _ = ard_gram_inverse_inplace_sharded(
            log_signal_sq, log_length, log_noise_sq, x, mesh,
            axis=axis, block=block, storage=storage_dtype(),
        )
        Kinv = jax.lax.with_sharding_constraint(Kinv, row)
        scores, e, a = es_sm(Kinv, y, key_data)
        return scores, (Kinv, a, e)

    @jax.custom_vjp
    def es_fn(log_signal_sq, log_length, log_noise_sq, x, y, key_data):
        scores, _ = _fwd_impl(
            log_signal_sq, log_length, log_noise_sq, x, y, key_data
        )
        return scores

    def f_fwd(log_signal_sq, log_length, log_noise_sq, x, y, key_data):
        scores, (Kinv, a, e) = _fwd_impl(
            log_signal_sq, log_length, log_noise_sq, x, y, key_data
        )
        return scores, (Kinv, a, e, key_data, log_signal_sq, log_length,
                        log_noise_sq, x)

    def _bwd_local(Kinv_loc, a, e, x_full, ls, ll, ln, key_data, s_bar):
        n = x_full.shape[0]
        nb = n // fold_k
        rows_per = Kinv_loc.shape[0]
        d = x_full.shape[1]
        idx = lax.axis_index(axis)
        row0 = idx * rows_per
        st = Kinv_loc.dtype
        z = x_full * jnp.exp(-jnp.reshape(ll, (1, -1)))
        zz = z * z

        accs = jax.tree.map(
            lambda v: lax.pcast(v, (axis,), to="varying"),
            (jnp.zeros((), f32), jnp.zeros((d,), f32), jnp.zeros((d,), f32),
             jnp.zeros((d,), f32), jnp.zeros((), f32)),
        )
        def fold_body(f, carry):
            accs, ub = carry
            Df = _gather_fold_strip(
                Kinv_loc, f, f * nb, nb, nb, rows_per, axis
            )
            Li, _ = _li_from_prepped(_prep_block(Df, nb), nb)
            Ab_f, u = _fold_cot_es(
                Li, e[f], s_bar[f], key_data, f, nb, num_sim, es_beta
            )
            ub = lax.dynamic_update_slice(ub, u[:nb], (f * nb,))
            cols_of = _fold_sandwich_cols(
                Kinv_loc, Ab_f, f, nb, rows_per, axis, block
            )
            accs = _acc_stream_pass(
                accs, Kinv_loc, x_full, z, zz, ls, ll, cols_of, block,
                rows_per, axis,
            )
            return accs, ub

        # fori over folds: sequential by construction (see _stats_local).
        accs, ub = lax.fori_loop(
            0, fold_k, fold_body, (accs, jnp.zeros((n,), f32))
        )

        w_loc = matmul_acc32(Kinv_loc, ub.astype(st)[:, None])[:, 0]
        w = lax.psum(
            lax.dynamic_update_slice(
                jnp.zeros((n,), f32), w_loc.astype(f32), (row0,)
            ),
            axis,
        )
        accs = _rank1_accs_sharded(
            accs, x_full, z, zz, ls, ll, w, a, rows_per, axis, block
        )
        s_acc, rzz, czz, cross, tr = lax.psum(accs, axis)
        l_bar = jnp.reshape(rzz + czz - 2.0 * cross, jnp.shape(ll))
        n_bar = jnp.exp(ln) * tr
        return s_acc, l_bar, n_bar, w

    bwd_sm = shard_map(
        _bwd_local, mesh=mesh,
        in_specs=(P(axis),) + (P(),) * 8,
        out_specs=(P(), P(), P(), P()),
    )

    def f_bwd(res, s_bar):
        import numpy as np

        (Kinv, a, e, key_data, log_signal_sq, log_length, log_noise_sq,
         x) = res
        # Same constant-folding defense as the stats f_bwd (a partially-zero
        # s_bar — a loss reading a subset of folds — would fold in).
        s_bar = lax.optimization_barrier(s_bar)
        Kinv = jax.lax.with_sharding_constraint(Kinv, row)
        s_out, l_bar, n_bar, w = bwd_sm(
            Kinv, a, e, x, log_signal_sq, log_length, log_noise_sq,
            key_data, s_bar,
        )
        n = x.shape[0]
        key_bar = np.zeros(jnp.shape(key_data), dtype=jax.dtypes.float0)
        return s_out, l_bar, n_bar, jnp.zeros_like(x), w[:n], key_bar

    es_fn.defvjp(f_fwd, f_bwd)
    return es_fn


def make_sharded_streamed_kfold_fit_step(
    mesh: Mesh,
    rule: str = "dss",
    fold_k: int = 4,
    lr: float = 0.001,
    axis: str = "data",
    block: int = 256,
    num_sim: int = 300,
    es_beta: float = 1.0,
):
    """Fold-STREAMED mesh-sharded k-fold gradient step — the default
    consumer behind
    :func:`gpscore.parallel.sharded_kfold.make_sharded_fused_kfold_fit_step`.
    Same contract (``step(params, x, y, key=None) -> (loss, params)``, build
    once / call per iteration), same objective math as the single-chip
    fold-streamed dispatch (`gpscore/fit/objectives.py`), with no
    [fold_k, nb, nb] stack on any device (module docstring)."""
    from gpscore.parallel.sharded_kfold import KFOLD_RULES
    from gpscore.scoring import rules

    if rule not in KFOLD_RULES:
        raise ValueError(f"rule must be one of {KFOLD_RULES}, got {rule!r}")
    row = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    if rule == "es":
        es_fn = make_sharded_streamed_fold_es(
            mesh, fold_k, num_sim=num_sim, es_beta=es_beta, axis=axis,
            block=block,
        )
    else:
        stats_fn = make_sharded_streamed_fold_stats(
            mesh, fold_k, want_inv_diag=(rule == "kc"), axis=axis,
            block=block,
        )

    def loss_fn(p, x, y, key):
        n = x.shape[0]
        nb = n // fold_k
        y = y.reshape(n)
        if rule == "es":
            scores = es_fn(
                p.log_signal_sq, p.log_length, p.log_noise_sq, x, y,
                jax.random.key_data(key),
            )
            return jnp.sum(scores)
        e, hld, inv_diag, a = stats_fn(
            p.log_signal_sq, p.log_length, p.log_noise_sq, x, y
        )
        y_b = y.reshape(fold_k, nb)
        if rule == "dss":
            # DSS_b = nb/2 log 2pi - hld_b + 1/2 e_b^T a_b (r = e; the
            # quadratic r^T A r collapses to e^T a since A e = a) — the
            # single-chip objective's identity (gpscore/fit/objectives.py).
            return (
                0.5 * fold_k * nb * jnp.log(2.0 * jnp.pi)
                - jnp.sum(hld)
                + 0.5 * jnp.sum(e * a.reshape(fold_k, nb))
            )
        return rules.crps_kfold(y_b - e, inv_diag, y_b)

    def step_impl(p, x, y, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y, key)
        new = jax.tree.map(lambda p_, g: p_ - lr * g, p, grads)
        return loss, new

    jitted = jax.jit(step_impl, in_shardings=(repl, row, repl, repl))

    def step(params, x, y, key=None):
        if rule == "es" and key is None:
            raise ValueError("rule='es' is stochastic: pass a PRNG key")
        if key is None:
            key = jax.random.PRNGKey(0)
        return jitted(
            jax.device_put(params, repl),
            jax.device_put(x, row),
            jax.device_put(y, repl),
            jax.device_put(key, repl),
        )

    return step
