"""Row-sharded Gram construction over the 'data' mesh axis.

For n x n Grams that exceed one chip's HBM comfort zone (n ~ 10k fp32 is 400 MB per
materialized matrix, times autodiff residuals), the design matrix is row-sharded:
each device holds X_local [n/p, d], all_gathers the (tiny, n*d) design matrix over
ICI, and computes only its own block of rows. Communication is O(n d); compute and
output are perfectly sharded.

This replaces nothing in the reference (which caps at n=500 *because* of the dense
single-process O(n^2)/O(n^3) path, `kin40k-FULL-compare.py:196`).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gpscore.ops.kernels import ard_gram


def sharded_gram(x, log_signal_sq, log_length, mesh: Mesh, axis: str = "data"):
    """Symmetric ARD Gram K(x, x) with rows sharded over ``axis``.

    x: [n, d] sharded (or shardable) on its leading axis. Returns K [n, n] with
    rows sharded over ``axis``. n must divide by the axis size.
    """

    def local_block(x_local, sig, length):
        x_full = jax.lax.all_gather(x_local, axis, tiled=True)  # [n, d]
        return ard_gram(x_local, x_full, sig, length)  # [n/p, n]

    fn = shard_map(
        local_block,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(axis),
    )
    x = jax.device_put(x, NamedSharding(mesh, P(axis)))
    return fn(x, log_signal_sq, log_length)
