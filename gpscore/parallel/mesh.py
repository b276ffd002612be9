"""Device-mesh utilities.

The reference has no parallelism of any kind (single CPU process; replicates run
serially, `kin40k-FULL-compare.py:190`). The TPU build's scaling axes are:

- ``batch``: independent work — replicates x restarts x scoring rules. This is the
  dominant axis for this workload (SURVEY.md §2.9) and shards perfectly (zero
  communication).
- ``data``: training-set rows, for sharded Gram construction and (future rounds)
  distributed blocked Cholesky at n ~ 10k.

Collectives ride ICI via XLA; nothing here ever touches DCN for these sizes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    batch: Optional[int] = None,
    data: int = 1,
) -> Mesh:
    """2-D ('batch', 'data') mesh. Defaults to all devices on the batch axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if batch is None:
        batch = n // data
    if batch * data != n:
        raise ValueError(f"batch*data = {batch}*{data} != {n} devices")
    arr = np.asarray(devices).reshape(batch, data)
    return Mesh(arr, axis_names=("batch", "data"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis split over 'batch', everything else replicated."""
    return NamedSharding(mesh, P("batch"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
