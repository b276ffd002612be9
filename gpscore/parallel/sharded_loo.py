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
    at this scale composes the custom-VJP solve core with these pieces (next
    round). Returns (mean, var) replicated.
    """
    from gpscore.ops.block_cholesky import tri_inverse_lower
    from gpscore.parallel.sharded_cholesky import sharded_cholesky

    n = k_ff.shape[0]
    row = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def add_noise(K):
        return K + noise_sq * jnp.eye(n, dtype=K.dtype)

    K_hat = add_noise(jax.device_put(k_ff, row))
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
