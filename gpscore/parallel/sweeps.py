"""Batched + sharded multi-restart / multi-replicate sweeps.

The reference runs 10-100 replicates serially per objective
(`kin40k-FULL-compare.py:190`). Here a whole sweep is one XLA program:
``vmap`` over the restart axis, with that axis sharded over the mesh 'batch'
dimension — restarts are embarrassingly parallel, so the sweep scales linearly
across a pod slice with zero collective traffic (BASELINE.json configs[4]).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpscore.fit.train import fit_gd
from gpscore.utils.params import GPParams


def default_sweep_keys(num_restarts: int):
    """[R] per-restart PRNG keys: fold_in(PRNGKey(0), i).

    Single source of truth for BOTH sweep paths — sharded and unsharded sweeps
    must produce identical results under default keys for the parity claim
    between them to hold."""
    return jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(0), i))(
        jax.numpy.arange(num_restarts)
    )


def restart_sweep(
    loss_fn,
    params_batch: GPParams,
    x,
    y,
    iters: int,
    lr: float,
    lr_inducing: Optional[float] = None,
    keys=None,
):
    """vmap the whole GD fit over a leading restart axis of ``params_batch``.

    keys: optional [R] PRNG keys (for stochastic objectives); defaults to fold_in
    of the restart index.
    """
    R = jax.tree.leaves(params_batch)[0].shape[0]
    if keys is None:
        keys = default_sweep_keys(R)

    def one(p, k):
        return fit_gd(loss_fn, p, x, y, iters, lr, lr_inducing, key=k)

    return jax.vmap(one)(params_batch, keys)


def sharded_restart_sweep(
    loss_fn,
    params_batch: GPParams,
    x,
    y,
    iters: int,
    lr: float,
    mesh: Mesh,
    lr_inducing: Optional[float] = None,
    keys=None,
):
    """restart_sweep with the restart axis sharded over the mesh 'batch' axis and
    the (small) data replicated. One jit; XLA partitions the vmapped program."""
    shard = NamedSharding(mesh, P("batch"))
    repl = NamedSharding(mesh, P())
    params_batch = jax.tree.map(lambda a: jax.device_put(a, shard), params_batch)
    x = jax.device_put(x, repl)
    y = jax.device_put(y, repl)
    fn = jax.jit(
        lambda pb, xx, yy, kk: restart_sweep(
            loss_fn, pb, xx, yy, iters, lr, lr_inducing, kk
        )
    )
    if keys is None:
        R = jax.tree.leaves(params_batch)[0].shape[0]
        keys = jax.device_put(default_sweep_keys(R), shard)
    return fn(params_batch, x, y, keys)
