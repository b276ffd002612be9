"""Mesh-sharded dense LOO objective for beyond-single-chip n.

The single-chip dense path tops out where one HBM holds a handful of n x n fp32
buffers (n ~ 30k on v5e). To go past it — or to speed the O(n^2)/O(n^3) GEMM
phases of an n ~ 10k fit — the design matrix is row-sharded over the mesh 'data'
axis and the objective is jitted with GSPMD sharding constraints:

- Gram construction: each device computes its row block against the all-gathered
  (tiny, n*d) design matrix — communication O(n d) over ICI.
- The SYRK / triangular-inverse GEMMs of the LOO solve core partition naturally;
  the Cholesky factorization itself stays replicated (XLA gathers for it) — the
  known remaining bottleneck, to be replaced by a distributed blocked
  factorization built on gpscore.ops.block_cholesky's GEMM-form recursion.

The reference has no analogue (single CPU process, n capped at 500 —
`kin40k-FULL-compare.py:196`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpscore.fit.objectives import make_objective


def sharded_loo_value_and_grad(
    params,
    x,
    y,
    mesh: Mesh,
    rule: str = "crps",
    model: str = "exact",
    kernel: str = "ard",
    axis: str = "data",
    key=None,
):
    """One (loss, grad) evaluation of a scoring-rule objective with the
    training rows sharded over ``mesh[axis]``.

    ``key`` is required by stochastic rules (energy score) and ignored by the
    deterministic ones. Returns (loss, grads) with grads replicated
    (hyperparameters are tiny).
    """
    loss = make_objective(rule, model=model, kernel=kernel)
    if rule == "es" and key is None:
        raise ValueError("rule='es' is stochastic: pass a PRNG key")
    if key is None:
        key = jax.random.PRNGKey(0)
    row = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def objective(p, x, y, k):
        x = jax.lax.with_sharding_constraint(x, row)
        return loss(p, x, y, k)

    vg = jax.jit(
        jax.value_and_grad(objective),
        in_shardings=(repl, row, row, repl),
        out_shardings=(repl, repl),
    )
    x = jax.device_put(x, row)
    y = jax.device_put(y, row)
    params = jax.device_put(params, repl)
    return vg(params, x, y, jax.device_put(key, repl))


def sharded_loo_moments(
    k_ff,
    y,
    noise_sq,
    mesh: Mesh,
    axis: str = "data",
    block: int = 256,
):
    """Fully distributed LOO moments (mean, var) for the exact GP at large n.

    The whole chain stays row-sharded over ``mesh[axis]``:
      1. K_hat = k_ff + noise_sq I             (local diagonal add),
      2. L = sharded_cholesky(K_hat)           (shard_map panel factorization),
      3. Linv = tri_inverse_lower(L)           (GEMM recursion; GSPMD partitions
                                                the matmuls, only the tiny base
                                                solves replicate),
      4. Kinv = Linv^T Linv, a = Kinv y, d = diag(Kinv), LOO identities.

    Forward-only (inference/evaluation at n beyond one chip); the gradient path
    at this scale is :func:`make_sharded_loo_solve_diag` /
    :func:`sharded_loo_fit_step`. Returns (mean, var) replicated.
    """
    from gpscore.ops.block_cholesky import tri_inverse_lower
    from gpscore.parallel.sharded_cholesky import add_noise_sharded, sharded_cholesky

    n = k_ff.shape[0]
    row = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    K_hat = add_noise_sharded(k_ff, noise_sq, mesh, axis=axis)
    L = sharded_cholesky(K_hat, mesh, axis=axis, block=block)

    def moments(L, y):
        L = jax.lax.with_sharding_constraint(L, row)
        Linv = tri_inverse_lower(L)
        Kinv = jax.lax.with_sharding_constraint(
            jnp.matmul(Linv.T, Linv, precision=jax.lax.Precision.HIGHEST), row
        )
        a = jnp.matmul(Kinv, y.reshape(n, 1))[:, 0]
        d = jnp.diagonal(Kinv)
        mean = y - a / d
        var = 1.0 / d
        return mean, var

    fn = jax.jit(moments, in_shardings=(row, repl), out_shardings=(repl, repl))
    return fn(L, jax.device_put(y, repl))


def make_sharded_loo_solve_diag(mesh: Mesh, axis: str = "data", block: int = 256):
    """Distributed version of :func:`gpscore.ops.linalg.loo_solve_diag`:
    (K^-1 y, diag(K^-1)) for row-sharded SPD K with a custom VJP, so the dense
    LOO *gradient* path also never gathers an n x n operand onto one device.

    Forward: shard_map panel Cholesky -> GSPMD-sharded triangular-inverse
    recursion -> sharded SYRK. Backward: the same closed-form adjoints as the
    single-chip core (one matvec + two GEMMs on the row-sharded K^-1):

        K_bar = -(K^-1 a_bar) a^T - (K^-1 * d_bar[None, :]) K^-1
    """
    from gpscore.ops.block_cholesky import tri_inverse_lower
    from gpscore.parallel.sharded_cholesky import sharded_cholesky
    from gpscore.utils.precision import matmul

    row = NamedSharding(mesh, P(axis))

    def _forward_impl(K, y):
        n = K.shape[0]
        L = sharded_cholesky(K, mesh, axis=axis, block=block)

        def solve_part(L, y):
            L = jax.lax.with_sharding_constraint(L, row)
            Linv = tri_inverse_lower(L)
            Kinv = jax.lax.with_sharding_constraint(matmul(Linv.T, Linv), row)
            a = matmul(Kinv, y.reshape(n, 1))[:, 0]
            d = jnp.diagonal(Kinv)
            return a, d, Kinv

        repl = NamedSharding(mesh, P())
        fn = jax.jit(
            solve_part, in_shardings=(row, repl), out_shardings=(repl, repl, row)
        )
        return fn(L, y)

    @jax.custom_vjp
    def f(K, y):
        a, d, _ = _forward_impl(K, y)
        return a, d

    def f_fwd(K, y):
        a, d, Kinv = _forward_impl(K, y)
        return (a, d), (Kinv, a)

    def f_bwd(res, cot):
        Kinv, a = res
        a_bar, d_bar = cot
        n = a.shape[0]

        def bwd_part(Kinv, a, a_bar, d_bar):
            Kinv = jax.lax.with_sharding_constraint(Kinv, row)
            w = matmul(Kinv, a_bar.reshape(n, 1))
            y_bar = w[:, 0]
            K_bar = -matmul(w, a.reshape(1, n)) - matmul(
                Kinv * d_bar[None, :], Kinv
            )
            return jax.lax.with_sharding_constraint(K_bar, row), y_bar

        repl = NamedSharding(mesh, P())
        fn = jax.jit(
            bwd_part,
            in_shardings=(row, repl, repl, repl),
            out_shardings=(row, repl),
        )
        return fn(Kinv, a, a_bar, d_bar)

    f.defvjp(f_fwd, f_bwd)
    return f


def make_sharded_loo_fit_step(mesh: Mesh, lr: float = 1.0, axis: str = "data",
                              block: int = 256, kernel: str = "ard"):
    """Build a compile-once CRPS-LOO gradient step at large n with every n x n
    object sharded: sharded Gram -> distributed Cholesky/solve core (custom VJP)
    -> CRPS -> grad -> SGD update.

    Returns ``step(params, x, y) -> (loss, updated params)``. Build the step
    once and call it per iteration — the returned closure holds the jitted
    distributed stack, so iterations after the first reuse the compiled
    programs (rebuilding it per call would retrace + recompile the most
    expensive programs in the codebase every step).
    """
    from gpscore.ops.kernels import ard_gram, rbf_gram
    from gpscore.scoring.rules import crps_gaussian

    solve_diag = make_sharded_loo_solve_diag(mesh, axis=axis, block=block)
    row = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    # jnp Gram (not the size-dispatching entry): the Pallas kernel is a custom
    # call GSPMD cannot partition — it would replicate the full n x n Gram on
    # every device, defeating the sharding. XLA row-shards the jnp matmul chain.
    gram_fn = ard_gram if kernel == "ard" else rbf_gram

    def loss_fn(p, x, y):
        n = x.shape[0]
        x = jax.lax.with_sharding_constraint(x, row)
        K = gram_fn(x, x, p.log_signal_sq, p.log_length)
        # K_hat (incl. the n x n identity) is formed inside the jitted program
        # under a row-sharding constraint — an eager jnp.eye(n) would
        # materialize whole on one device at exactly the scale this path
        # exists for.
        K_hat = jax.lax.with_sharding_constraint(
            K + p.noise_sq * jnp.eye(n, dtype=K.dtype), row
        )
        a, d = solve_diag(K_hat, y.reshape(n))
        mean = y - a / d
        var = 1.0 / d
        return crps_gaussian(mean, var, y)

    def step_impl(p, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
        new = jax.tree.map(lambda p_, g: p_ - lr * g, p, grads)
        return loss, new

    jitted = jax.jit(step_impl, in_shardings=(repl, row, repl))

    def step(params, x, y):
        # Normalize everything to committed, explicitly-sharded arrays: the jit
        # cache keys on input committed-ness/sharding, so mixing host arrays
        # (first call) with device outputs (subsequent calls) would retrace.
        return jitted(
            jax.device_put(params, repl),
            jax.device_put(x, row),
            jax.device_put(y, repl),
        )

    return step


def make_sharded_fused_loo_fit_step(
    mesh: Mesh, lr: float = 1.0, axis: str = "data", block: int = 256,
    rule: str = "crps",
):
    """Mesh-sharded version of the FUSED Gram+LOO core (gpscore.ops.loo_fused):
    a compile-once CRPS/logs/interval-LOO gradient step where, beyond sharding
    every n x n object over ``mesh[axis]`` like :func:`make_sharded_loo_fit_step`,
    the residual set is hand-chosen — only K^-1 (row-sharded) survives the
    forward, the Gram is recomputed blockwise inside the backward, and the
    parameter cotangents reduce straight to O(d) accumulators instead of a
    materialized K_bar flowing through the kernel's autodiff.

    The single-chip core runs its forward inside one n x n buffer (the
    in-place potri pipeline) and streams its backward over row blocks; here
    both moves are mesh-native (:mod:`gpscore.parallel.sharded_potri`): the
    forward carries ONE [n/p, n] buffer per device through Gram-panel ->
    potrf -> trtri -> lauum inside one shard_map region, and the backward
    streams the parameter contraction over global row blocks with
    psum_scatter column reduction — per-device residency ~n^2/p + O(n block)
    across the whole step (was ~2-3 n^2/p with the out-of-place
    ``sharded_cholesky -> tri_inverse_lower -> L^-T L^-1`` chain).
    """
    from gpscore.parallel.sharded_potri import (
        ard_gram_inverse_inplace_sharded,
        make_streamed_ard_bwd,
        sharded_diag,
    )
    from gpscore.scoring.rules import crps_gaussian, interval_score, logs_gaussian
    from gpscore.utils.precision import matmul_acc32, storage_dtype

    score = {"crps": crps_gaussian, "logs": logs_gaussian,
             "interval": interval_score}[rule]
    row = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    streamed_bwd = make_streamed_ard_bwd(mesh, "loo", axis=axis, block=block)

    def _fwd_impl(log_signal_sq, log_length, log_noise_sq, x, y):
        n = x.shape[0]
        # storage_dtype(): bfloat16 per-device buffers under
        # matmul_mode("bf16") — double per-device capacity; fp32-accumulating
        # reads keep the O(n) outputs fp32 (see gpscore/ops/loo_fused.py).
        Kinv, _ = ard_gram_inverse_inplace_sharded(
            log_signal_sq, log_length, log_noise_sq, x, mesh,
            axis=axis, block=block, storage=storage_dtype(),
        )
        Kinv = jax.lax.with_sharding_constraint(Kinv, row)
        a = matmul_acc32(Kinv, y.astype(Kinv.dtype).reshape(n, 1))[:, 0]
        d = sharded_diag(Kinv, mesh, axis=axis).astype(jnp.float32)
        return a, d, Kinv

    @jax.custom_vjp
    def loo_solve(log_signal_sq, log_length, log_noise_sq, x, y):
        a, d, _ = _fwd_impl(log_signal_sq, log_length, log_noise_sq, x, y)
        return a, d

    def f_fwd(log_signal_sq, log_length, log_noise_sq, x, y):
        a, d, Kinv = _fwd_impl(log_signal_sq, log_length, log_noise_sq, x, y)
        return (a, d), (Kinv, a, log_signal_sq, log_length, log_noise_sq, x)

    def f_bwd(res, cot):
        Kinv, a, log_signal_sq, log_length, log_noise_sq, x = res
        Kinv = jax.lax.with_sharding_constraint(Kinv, row)
        s_bar, l_bar, n_bar, w = streamed_bwd(
            Kinv, a, x, log_signal_sq, log_length, log_noise_sq, cot
        )
        return s_bar, l_bar, n_bar, jnp.zeros_like(x), w

    loo_solve.defvjp(f_fwd, f_bwd)

    def loss_fn(p, x, y):
        a, d = loo_solve(p.log_signal_sq, p.log_length, p.log_noise_sq, x, y)
        mean = y - a / d
        var = 1.0 / d
        return score(mean, var, y)

    def step_impl(p, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
        new = jax.tree.map(lambda p_, g: p_ - lr * g, p, grads)
        return loss, new

    jitted = jax.jit(step_impl, in_shardings=(repl, row, repl))

    def step(params, x, y):
        return jitted(
            jax.device_put(params, repl),
            jax.device_put(x, row),
            jax.device_put(y, repl),
        )

    return step


def sharded_loo_fit_step(params, x, y, mesh, lr: float = 1.0,
                         axis: str = "data", block: int = 256, kernel: str = "ard"):
    """One-shot convenience wrapper around :func:`make_sharded_loo_fit_step`.

    For training loops build the step once with the factory — this wrapper
    rebuilds (and recompiles) the distributed stack on every call.
    """
    step = make_sharded_loo_fit_step(mesh, lr=lr, axis=axis, block=block, kernel=kernel)
    return step(params, x, y)


def make_sharded_fused_nlml_fit_step(
    mesh: Mesh, lr: float = 0.0005, axis: str = "data", block: int = 256,
):
    """Mesh-sharded fused NLML gradient step — the multi-chip counterpart of
    :func:`gpscore.ops.loo_fused.ard_nlml`, completing the sharded fit-step
    family (CRPS/logs/interval-LOO, DSS/ES/kc k-fold, and now the NLML
    baseline; reference inline NLML at `SIMPLE-DATA FULL-comapre.py:292-296`).

    Same residual discipline as :func:`make_sharded_fused_loo_fit_step`:
    the forward is the in-place sharded potri pipeline (ONE [n/p, n] buffer
    per device, :mod:`gpscore.parallel.sharded_potri`, with the log-det free
    from the factorization stage), and the backward streams
    ``K_hat_bar = v_bar (K^-1 - alpha alpha^T)/2`` straight off K^-1's local
    columns into O(d) accumulators — no sandwich GEMM, no collectives beyond
    the final psum, the cheapest large-n sharded objective step.
    """
    from gpscore.parallel.sharded_potri import (
        ard_gram_inverse_inplace_sharded,
        make_streamed_ard_bwd,
    )
    from gpscore.utils.precision import matmul_acc32, storage_dtype

    row = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    streamed_bwd = make_streamed_ard_bwd(mesh, "nlml", axis=axis, block=block)

    def _fwd_impl(log_signal_sq, log_length, log_noise_sq, x, y):
        n = x.shape[0]
        Kinv, half_logdet = ard_gram_inverse_inplace_sharded(
            log_signal_sq, log_length, log_noise_sq, x, mesh,
            axis=axis, block=block, storage=storage_dtype(),
        )
        Kinv = jax.lax.with_sharding_constraint(Kinv, row)
        a = matmul_acc32(Kinv, y.astype(Kinv.dtype).reshape(n, 1))[:, 0]
        value = (
            0.5 * n * jnp.log(2.0 * jnp.pi).astype(x.dtype)
            + half_logdet
            + 0.5 * jnp.sum(y.reshape(n) * a)
        )
        return value, a, Kinv

    @jax.custom_vjp
    def nlml(log_signal_sq, log_length, log_noise_sq, x, y):
        value, _, _ = _fwd_impl(log_signal_sq, log_length, log_noise_sq, x, y)
        return value

    def f_fwd(log_signal_sq, log_length, log_noise_sq, x, y):
        value, a, Kinv = _fwd_impl(log_signal_sq, log_length, log_noise_sq,
                                   x, y)
        return value, (Kinv, a, log_signal_sq, log_length, log_noise_sq, x)

    def f_bwd(res, v_bar):
        Kinv, a, log_signal_sq, log_length, log_noise_sq, x = res
        Kinv = jax.lax.with_sharding_constraint(Kinv, row)
        s_bar, l_bar, n_bar, _ = streamed_bwd(
            Kinv, a, x, log_signal_sq, log_length, log_noise_sq, v_bar
        )
        return s_bar, l_bar, n_bar, jnp.zeros_like(x), v_bar * a

    nlml.defvjp(f_fwd, f_bwd)

    def loss_fn(p, x, y):
        return nlml(p.log_signal_sq, p.log_length, p.log_noise_sq, x, y)

    def step_impl(p, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
        new = jax.tree.map(lambda p_, g: p_ - lr * g, p, grads)
        return loss, new

    jitted = jax.jit(step_impl, in_shardings=(repl, row, repl))

    def step(params, x, y):
        return jitted(
            jax.device_put(params, repl),
            jax.device_put(x, row),
            jax.device_put(y, repl),
        )

    return step
