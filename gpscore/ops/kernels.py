"""Squared-exponential kernel Gram construction.

Reference semantics reproduced exactly (two distinct length parameterizations!):

- ``rbf_gram``: isotropic RBF where ``exp(log_length)`` is the **squared**
  lengthscale dividing the squared distance
  (reference `SIMPLE-DATA FULL-comapre.py:8-21`: ``res = 0.5*res/length`` with
  ``length = exp(b)`` applied to ``2xx' - x^2 - x'^2``).
- ``ard_gram``: ARD RBF where ``exp(log_length)`` is the per-dimension
  lengthscale dividing the inputs
  (reference `SIMPLE-DATA FULL-comapre.py:24-40`: ``x = x/exp(b)`` then the same
  expand-and-subtract distance trick).

Both use the MXU-friendly cross-term form ``2 X X'^T - |x|^2 - |x'|^2`` so the O(n^2 d)
work is one large fp32 matmul; XLA fuses the subsequent scale/exp elementwise chain.
A tiled Pallas implementation for HBM-resident designs lives in
``gpscore.ops.gram_pallas``; :func:`gram` keeps the jnp form after measuring it
equal-or-faster at every size (see the :func:`gram` docstring / BENCH_NOTES.md).
"""

from __future__ import annotations

import jax.numpy as jnp

from gpscore.utils.precision import matmul_crit


def _cross_sqdist(x, xp):
    """-(squared distance) via the reference's expand-and-subtract trick:
    2 x.x' - |x|^2 - |x'|^2 (negative squared distance, computed on the MXU).

    matmul_crit (mode floored at 3-pass bf16): one-pass Gram errors behave
    like a random perturbation of K with spectral norm ~ eps * signal * sqrt(n)
    (~6 at n = 30k), which swamps the noise diagonal, makes K_hat indefinite,
    and NaNs the Cholesky — measured, not hypothetical. The distance GEMM is
    O(n^2 d): pinning it costs nothing next to the O(n^3) solve phases."""
    res = 2.0 * matmul_crit(x, xp.T)
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)  # [n, 1]
    xp_sq = jnp.sum(xp * xp, axis=-1, keepdims=True).T  # [1, m]
    return res - x_sq - xp_sq


def rbf_gram(x, xp, log_signal_sq, log_length_sq):
    """Isotropic RBF: exp(log_signal_sq) * exp(-0.5 * d2 / exp(log_length_sq)).

    `log_length_sq` is the log **squared** lengthscale (reference ``rbf``'s ``b``).
    x: [n, d], xp: [m, d] -> [n, m].
    """
    neg_d2 = _cross_sqdist(x, xp)
    res = 0.5 * neg_d2 / jnp.exp(log_length_sq)
    return jnp.exp(log_signal_sq) * jnp.exp(res)


def ard_gram(x, xp, log_signal_sq, log_length):
    """ARD RBF: inputs scaled per-dimension by exp(log_length) (the lengthscale
    itself, reference ``ARD``'s ``b``), then isotropic unit-length RBF.

    x: [n, d], xp: [m, d], log_length: [d] (or scalar) -> [n, m].
    """
    inv_len = jnp.exp(-jnp.reshape(log_length, (1, -1)))
    xs = x * inv_len
    xps = xp * inv_len
    neg_d2 = _cross_sqdist(xs, xps)
    return jnp.exp(log_signal_sq) * jnp.exp(0.5 * neg_d2)


def kernel_diag(x, log_signal_sq):
    """diag K(x,x) = signal_sq for stationary RBF/ARD kernels. [n]."""
    return jnp.full((x.shape[0],), 1.0, x.dtype) * jnp.exp(log_signal_sq)


def gram(x, xp, log_signal_sq, log_length, *, kind: str = "ard"):
    """Kernel-dispatching Gram entry point.

    Dispatches to the jnp form for both kernels: measured on v5e
    (`experiments/bench_gram.py`, 64 back-to-back Grams per program to
    amortize the ~30 ms tunnel dispatch, BENCH_NOTES.md), XLA's fused
    matmul + elementwise-epilogue path matches or beats the hand-written
    Pallas tile at every size — 1.04x slower than Pallas at n=2048 but
    1.10x faster at 8192 and 1.22x faster at 16384, i.e. exactly the sizes
    that matter run better through the builtin. The Pallas kernel
    (:func:`gpscore.ops.gram_pallas.ard_gram_pallas`) is kept as an
    independent oracle and the starting point for a future multi-chip
    fused Gram, same verdict as the blocked Cholesky
    (gpscore/ops/block_cholesky.py docstring).
    """
    if kind == "rbf":
        return rbf_gram(x, xp, log_signal_sq, log_length)
    if kind != "ard":
        raise ValueError(f"unknown kernel kind: {kind}")
    return ard_gram(x, xp, log_signal_sq, log_length)
