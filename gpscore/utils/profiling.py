"""Profiling and tracing helpers.

The reference's only observability is commented-out per-iteration prints
(`SIMPLE-DATA FULL-comapre.py:215-219,229-231`). Here:

- :func:`trace` wraps ``jax.profiler`` so any fit/sweep can be captured for
  TensorBoard/Perfetto (`with trace("/tmp/tb"): fit_gd(...)`);
- :func:`timed` measures steady-state wall-clock of a jitted callable with proper
  device synchronization via host readback — ``block_until_ready`` alone is not a
  reliable barrier through remote-tunnel backends, so a scalar is pulled to host;
- per-iteration loss/parameter histories are first-class fit outputs
  (``fit_gd(..., record_params=True)``), not a profiler concern.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace of the enclosed block into ``logdir``."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(x):
    """Host-readback barrier: forces completion of everything ``x`` depends on."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def timed(fn: Callable, *args, warmup: int = 1, repeats: int = 3) -> Tuple[float, object]:
    """(steady-state seconds per call, last result) for a jitted ``fn``.

    Runs ``warmup`` calls first (compile + autotune), then times ``repeats``
    calls, synchronizing with a host readback after each.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
        _sync(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
        _sync(out)
    return (time.perf_counter() - t0) / repeats, out
