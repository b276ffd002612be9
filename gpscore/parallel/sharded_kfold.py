"""Mesh-sharded k-fold objectives (DSS / ES / kc) for beyond-single-chip n.

Extends the distributed dense stack (sharded Gram -> shard_map panel Cholesky ->
GSPMD triangular-inverse recursion, `sharded_loo.py`) to the k-fold block
conditionals the DSS/ES/kc objectives need (reference
`kin40k-FULL-compare.py:497-543`; single-chip form
`gpscore/models/exact.py::kfold_exact_precision`). The reference computes these
from a dense CPU inverse at n=500; here every n x n operand stays row-sharded
over the mesh and only the [k, nb, nb] fold blocks (total n^2/k floats, the
objective's own working set) are assembled.

Split of labour, mirroring the LOO path:
- a custom-VJP primitive ``(K_hat, y) -> (K_hat^-1 y, A)`` with
  ``A[b] = [K_hat^-1]_bb`` — the only O(n^3) piece, distributed forward and
  backward;
- the per-fold scoring (batched nb x nb Cholesky + precision-form rules) is
  plain autodiff on explicit arrays, identical math to the single-chip
  objectives (`gpscore/fit/objectives.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpscore.ops import linalg
from gpscore.scoring import rules
from gpscore.utils.precision import matmul, matmul_acc32, storage_dtype

KFOLD_RULES = ("dss", "es", "kc")


def make_sharded_kfold_blocks(
    mesh: Mesh, fold_k: int, axis: str = "data", block: int = 256
):
    """Distributed ``(K_hat, y) -> (K_hat^-1 y, A)`` with custom VJP.

    ``A`` is the stack of diagonal blocks ``[K_hat^-1]_bb`` ([k, nb, nb]) that
    the k-fold conditionals are built from (reference
    `kin40k-FULL-compare.py:507-511`); ``K_hat^-1 y`` is the shared solve
    (`:519-530`). Forward: shard_map panel Cholesky -> GSPMD-sharded
    triangular-inverse GEMM recursion -> sharded SYRK; K_hat, K_hat^-1 and the
    VJP's GEMMs are all row-sharded over ``mesh[axis]``.

    Backward (S = K_hat^-1, B = blockdiag(A_bar)):

        y_bar = S a_bar
        K_bar = -(S a_bar) a^T - S B S

    the block-extraction adjoint scattered back through the inverse — two
    row-sharded n x n GEMMs, so the gradient path also never gathers an n x n
    operand onto one device.
    """
    from gpscore.ops.block_cholesky import tri_inverse_lower
    from gpscore.parallel.sharded_cholesky import sharded_cholesky

    row = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def _blocks_of(Kinv, n):
        nb = n // fold_k
        return jnp.stack(
            [
                jax.lax.dynamic_slice(Kinv, (b * nb, b * nb), (nb, nb))
                for b in range(fold_k)
            ]
        )

    def _forward_impl(K, y):
        n = K.shape[0]
        if n % fold_k != 0:
            raise ValueError(f"n={n} not divisible by fold_k={fold_k}")
        L = sharded_cholesky(K, mesh, axis=axis, block=block)

        def solve_part(L, y):
            L = jax.lax.with_sharding_constraint(L, row)
            Linv = tri_inverse_lower(L)
            Kinv = jax.lax.with_sharding_constraint(matmul(Linv.T, Linv), row)
            a = matmul(Kinv, y.reshape(n, 1))[:, 0]
            return a, _blocks_of(Kinv, n), Kinv

        fn = jax.jit(
            solve_part, in_shardings=(row, repl), out_shardings=(repl, repl, row)
        )
        return fn(L, y)

    @jax.custom_vjp
    def f(K, y):
        a, A, _ = _forward_impl(K, y)
        return a, A

    def f_fwd(K, y):
        a, A, Kinv = _forward_impl(K, y)
        return (a, A), (Kinv, a)

    def f_bwd(res, cot):
        Kinv, a = res
        a_bar, A_bar = cot
        n = a.shape[0]
        nb = n // fold_k

        def bwd_part(Kinv, a, a_bar, A_bar):
            Kinv = jax.lax.with_sharding_constraint(Kinv, row)
            w = matmul(Kinv, a_bar.reshape(n, 1))
            y_bar = w[:, 0]
            B = jnp.zeros((n, n), Kinv.dtype)
            for b in range(fold_k):
                B = jax.lax.dynamic_update_slice(B, A_bar[b], (b * nb, b * nb))
            B = jax.lax.with_sharding_constraint(B, row)
            SB = jax.lax.with_sharding_constraint(matmul(Kinv, B), row)
            K_bar = -matmul(w, a.reshape(1, n)) - matmul(SB, Kinv)
            return jax.lax.with_sharding_constraint(K_bar, row), y_bar

        fn = jax.jit(
            bwd_part,
            in_shardings=(row, repl, repl, repl),
            out_shardings=(row, repl),
        )
        return fn(Kinv, a, a_bar, A_bar)

    f.defvjp(f_fwd, f_bwd)
    return f


def _fold_loss(rule: str, mean, La, y_b, key, num_sim: int, es_beta: float):
    """Precision-form fold scoring, identical to the exact-model branches of
    `gpscore/fit/objectives.py` (dss/es: fold sum; kc: crps_kfold)."""
    if rule == "dss":
        return jnp.sum(jax.vmap(rules.dss_precision)(mean, La, y_b))
    if rule == "kc":
        var_b = jax.vmap(linalg.inv_diag_from_chol)(La)
        return rules.crps_kfold(mean, var_b, y_b)
    keys = jax.random.split(key, mean.shape[0])
    per_fold = jax.vmap(
        lambda k, m, L, yy: rules.energy_score_precision(
            k, m, L, yy, num_sim=num_sim, beta=es_beta
        )
    )(keys, mean, La, y_b)
    return jnp.sum(per_fold)


def make_sharded_kfold_fit_step(
    mesh: Mesh,
    rule: str = "dss",
    fold_k: int = 4,
    lr: float = 0.001,
    axis: str = "data",
    block: int = 256,
    kernel: str = "ard",
    num_sim: int = 300,
    es_beta: float = 1.0,
):
    """Compile-once k-fold gradient step at large n with every n x n object
    sharded: sharded Gram -> distributed block primitive (custom VJP) ->
    batched per-fold precision-form scoring -> grad -> SGD update.

    Returns ``step(params, x, y, key=None) -> (loss, updated params)``; ``key``
    is required by the stochastic ``es`` rule. Build the step once and call it
    per iteration — the closure holds the jitted distributed stack (same
    compile-reuse contract as :func:`make_sharded_loo_fit_step`).
    """
    if rule not in KFOLD_RULES:
        raise ValueError(f"rule must be one of {KFOLD_RULES}, got {rule!r}")
    from gpscore.ops.kernels import ard_gram, rbf_gram

    blocks_fn = make_sharded_kfold_blocks(mesh, fold_k, axis=axis, block=block)
    row = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    # jnp Gram, not the Pallas custom call — GSPMD cannot partition the latter
    # (see make_sharded_loo_fit_step).
    gram_fn = ard_gram if kernel == "ard" else rbf_gram

    def loss_fn(p, x, y, key):
        n = x.shape[0]
        nb = n // fold_k
        x = jax.lax.with_sharding_constraint(x, row)
        K = gram_fn(x, x, p.log_signal_sq, p.log_length)
        K_hat = jax.lax.with_sharding_constraint(
            K + p.noise_sq * jnp.eye(n, dtype=K.dtype), row
        )
        a, A = blocks_fn(K_hat, y.reshape(n))
        # Per-fold conditionals in precision form (exact.kfold_exact_precision):
        # m_b = y_b - A_b^-1 [K_hat^-1 y]_b, prec chol La_b. [k, nb, nb] is the
        # objective's own working set (n^2/k floats) — batched on-chip math.
        La = jnp.linalg.cholesky(A)
        y_b = y.reshape(fold_k, nb)
        a_b = a.reshape(fold_k, nb, 1)
        mean = y_b - jax.vmap(linalg.chol_solve_from_factor)(La, a_b)[..., 0]
        return _fold_loss(rule, mean, La, y_b, key, num_sim, es_beta)

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


def make_sharded_fused_kfold_fit_step(
    mesh: Mesh,
    rule: str = "dss",
    fold_k: int = 4,
    lr: float = 0.001,
    axis: str = "data",
    block: int = 256,
    num_sim: int = 300,
    es_beta: float = 1.0,
    streamed: bool = True,
):
    """Mesh-sharded FUSED k-fold gradient step: the k-fold counterpart of
    :func:`gpscore.parallel.sharded_loo.make_sharded_fused_loo_fit_step`.

    ``streamed=True`` (the default since round 5) dispatches to the
    fold-STREAMED mesh step
    (:func:`gpscore.parallel.sharded_fold_stream.make_sharded_streamed_kfold_fit_step`):
    one fold's [nb, nb] block live at a time on any device — per-device
    residency ~n^2/p + 1-2 (n/fold_k)^2 transients, which is what lets the
    p = 1 TPU mesh reach the single-chip fold ceilings (the stacked form
    below OOMs at n = 53,248 fp32 where the single chip runs 60,416).

    ``streamed=False`` keeps the round-4 STACKED composition (parity
    oracle): one custom VJP spans Gram construction + the distributed
    (K^-1 y, blocks) solve, so only the row-sharded K^-1 survives the
    forward — which runs the in-place sharded potri pipeline (ONE [n/p, n]
    buffer per device, :mod:`gpscore.parallel.sharded_potri`); the backward
    streams the blockdiag(A_bar) sandwich and the recomputed Gram over row
    blocks into O(d) parameter accumulators. Per-device residency ~n^2/p +
    the fold blocks' own replicated n^2/fold_k stacks. ARD kernel only.
    """
    if rule not in KFOLD_RULES:
        raise ValueError(f"rule must be one of {KFOLD_RULES}, got {rule!r}")
    if streamed:
        from gpscore.parallel.sharded_fold_stream import (
            make_sharded_streamed_kfold_fit_step,
        )

        return make_sharded_streamed_kfold_fit_step(
            mesh, rule=rule, fold_k=fold_k, lr=lr, axis=axis, block=block,
            num_sim=num_sim, es_beta=es_beta,
        )
    from gpscore.parallel.sharded_potri import (
        ard_gram_inverse_inplace_sharded,
        make_streamed_ard_bwd,
    )

    row = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    streamed_bwd = make_streamed_ard_bwd(
        mesh, "kfold", fold_k=fold_k, axis=axis, block=block
    )

    def _fwd_impl(log_signal_sq, log_length, log_noise_sq, x, y):
        n = x.shape[0]
        if n % fold_k != 0:
            raise ValueError(f"n={n} not divisible by fold_k={fold_k}")
        nb = n // fold_k
        Kinv, _ = ard_gram_inverse_inplace_sharded(
            log_signal_sq, log_length, log_noise_sq, x, mesh,
            axis=axis, block=block, storage=storage_dtype(),
        )
        Kinv = jax.lax.with_sharding_constraint(Kinv, row)
        a = matmul_acc32(Kinv, y.astype(Kinv.dtype).reshape(n, 1))[:, 0]
        # Blocks stay in K^-1's STORAGE dtype (f16/bf16 under the 2-byte
        # modes — the fold consumer upcasts per fold, so no fp32 stack).
        A = jnp.stack([
            jax.lax.dynamic_slice(Kinv, (b * nb, b * nb), (nb, nb))
            for b in range(fold_k)
        ])
        # Replicate the fold blocks explicitly: stacked diagonal slices of the
        # row-sharded K^-1 inherit a sharding GSPMD cannot bridge to the
        # fold-batched layout the per-fold factorization wants without an
        # "involuntary full rematerialization" (replicate-then-reshard) —
        # seen as an SPMD warning in the dryrun. The fold chains gather
        # their operands either way; doing it here is one explicit
        # all_gather of n^2/fold_k, and every downstream reshard becomes a
        # free slice of a replicated tensor.
        A = jax.lax.with_sharding_constraint(
            A, NamedSharding(mesh, P())
        )
        return a, A, Kinv

    @jax.custom_vjp
    def solve_blocks(log_signal_sq, log_length, log_noise_sq, x, y):
        a, A, _ = _fwd_impl(log_signal_sq, log_length, log_noise_sq, x, y)
        return a, A

    def f_fwd(log_signal_sq, log_length, log_noise_sq, x, y):
        a, A, Kinv = _fwd_impl(log_signal_sq, log_length, log_noise_sq, x, y)
        return (a, A), (Kinv, a, log_signal_sq, log_length, log_noise_sq, x)

    def f_bwd(res, cot):
        Kinv, a, log_signal_sq, log_length, log_noise_sq, x = res
        Kinv = jax.lax.with_sharding_constraint(Kinv, row)
        s_bar, l_bar, n_bar, w = streamed_bwd(
            Kinv, a, x, log_signal_sq, log_length, log_noise_sq, cot
        )
        return s_bar, l_bar, n_bar, jnp.zeros_like(x), w

    solve_blocks.defvjp(f_fwd, f_bwd)

    def loss_fn(p, x, y, key):
        n = x.shape[0]
        nb = n // fold_k
        a, A = solve_blocks(
            p.log_signal_sq, p.log_length, p.log_noise_sq, x, y.reshape(n)
        )
        # fold_core consumer (closed-form A/a adjoints, in-place per-fold
        # factorization, buffer reuse) instead of the batched cholesky/solve
        # expanders: at nb >= 4096 the expander VJP chains cost ~1.1 n^2 of
        # temps (BENCH_NOTES round-2 pathologies) — measured as the sharded
        # kc step OOMing at n = 32,768 (temp 4.71 n^2/p at 8,192) while the
        # single-chip path ran 57k+. Same math, same replicated blocks.
        from gpscore.ops import fold_core

        y_b = y.reshape(fold_k, nb)
        a_b = a.reshape(fold_k, nb)
        if rule == "es":
            scores = fold_core.fold_es_score(
                A, a_b, jax.random.key_data(key), num_sim, es_beta
            )
            return jnp.sum(scores)
        stats = fold_core.fold_precision_stats(
            A, a_b, jnp.zeros((fold_k, nb, 0), A.dtype),
            want_inv_diag=(rule == "kc"),
        )
        if rule == "dss":
            # DSS_b = nb/2 log 2pi - hld_b + 1/2 e_b^T a_b (r = e; the
            # quadratic r^T A r collapses to e^T a since A e = a) — the
            # single-chip objective's identity (gpscore/fit/objectives.py).
            return (
                0.5 * fold_k * nb * jnp.log(2.0 * jnp.pi)
                - jnp.sum(stats.half_logdet)
                + 0.5 * jnp.sum(stats.e * a_b)
            )
        return rules.crps_kfold(y_b - stats.e, stats.inv_diag, y_b)

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
