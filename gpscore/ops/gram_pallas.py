"""Tiled Pallas ARD-RBF Gram kernel.

The Gram construction is the reference's per-iteration O(n^2 d) op
(`SIMPLE-DATA FULL-comapre.py:24-40`), evaluated as a torch matmul plus several
materialized n x m elementwise passes. On TPU that chain is HBM-bandwidth bound:
the cross-term matmul writes n*m fp32 to HBM, then exp/scale re-read and re-write it.

This kernel fuses the whole chain per (TM, TN) output tile in VMEM:
    cross = X_tile @ Xp_tile^T        (MXU, fp32 exact)
    out   = sig * exp(0.5*(2*cross - |x|^2 - |xp|^2))   (VPU, fused)
so each output element is written to HBM exactly once and inputs are read
O(n/TN + m/TM) times instead of O(1) extra full-matrix round trips.

Inputs are pre-scaled by the inverse lengthscale outside the kernel (O(nd), fused by
XLA into the feeding ops), which also makes one kernel serve both the ARD and
isotropic parameterizations. Backward pass is expressed with plain jnp matmuls via
custom_vjp (they are themselves MXU-shaped, and XLA fuses the elementwise factors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpscore.utils.precision import matmul

TILE_M = 256
TILE_N = 256
_LANE = 128


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _gram_kernel(sig_ref, x_ref, xp_ref, out_ref):
    x = x_ref[:]  # [TM, D]
    xp = xp_ref[:]  # [TN, D]
    cross = jax.lax.dot_general(
        x,
        xp,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    x_sq = jnp.sum(x * x, axis=1, keepdims=True)  # [TM, 1]
    xp_sq = jnp.sum(xp * xp, axis=1, keepdims=True)  # [TN, 1]
    neg_half_d2 = cross - 0.5 * x_sq - 0.5 * xp_sq.T
    out_ref[:] = sig_ref[0, 0] * jnp.exp(neg_half_d2)


def _pallas_gram_scaled(xs, xps, signal_sq, *, interpret: bool):
    """Gram of pre-scaled inputs. xs: [n, d], xps: [m, d]."""
    n, d = xs.shape
    m = xps.shape[0]
    n_pad = _round_up(n, TILE_M)
    m_pad = _round_up(m, TILE_N)
    d_pad = _round_up(max(d, 1), _LANE)
    # Zero padding is exact: padded coordinates contribute 0 to every dot/norm,
    # and padded rows are sliced off the output.
    xs_p = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(xs)
    xps_p = jnp.zeros((m_pad, d_pad), jnp.float32).at[:m, :d].set(xps)
    sig = jnp.reshape(signal_sq, (1, 1)).astype(jnp.float32)

    grid = (n_pad // TILE_M, m_pad // TILE_N)
    out = pl.pallas_call(
        _gram_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_M, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_M, TILE_N), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * d_pad,
            bytes_accessed=4 * (n_pad * d_pad + m_pad * d_pad + n_pad * m_pad),
            transcendentals=n_pad * m_pad,
        ),
        interpret=interpret,
    )(sig, xs_p, xps_p)
    return out[:n, :m]


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def ard_gram_pallas(x, xp, log_signal_sq, log_length):
    xs, xps, sig = _scale_inputs(x, xp, log_signal_sq, log_length)
    return _pallas_gram_scaled(xs, xps, sig, interpret=_use_interpret())


def _scale_inputs(x, xp, log_signal_sq, log_length):
    inv_len = jnp.exp(-jnp.reshape(log_length, (1, -1)))
    return x * inv_len, xp * inv_len, jnp.exp(log_signal_sq)


def _fwd(x, xp, log_signal_sq, log_length):
    xs, xps, sig = _scale_inputs(x, xp, log_signal_sq, log_length)
    K = _pallas_gram_scaled(xs, xps, sig, interpret=_use_interpret())
    # Save only the O(nd) scaled inputs; K is recomputed in the backward (one
    # fused kernel launch) instead of held live across the whole program — at
    # n = 10k that is 400 MB of HBM freed during the O(n^3) middle section.
    return K, (xs, xps, sig, log_length)


def _bwd(res, g):
    xs, xps, sig, log_length = res
    K = _pallas_gram_scaled(xs, xps, sig, interpret=_use_interpret())
    W = g * K  # [n, m]
    # d/d log_signal_sq: K scales linearly with exp(log_signal_sq).
    d_log_sig = jnp.sum(W)
    # d K_ij / d xs_i = K_ij (xps_j - xs_i)   (unit-lengthscale RBF in scaled coords)
    row = jnp.sum(W, axis=1, keepdims=True)  # [n, 1]
    col = jnp.sum(W, axis=0, keepdims=True).T  # [m, 1]
    d_xs = matmul(W, xps) - row * xs
    d_xps = matmul(W.T, xs) - col * xps
    # Chain through xs = x * exp(-log_length).
    inv_len = jnp.exp(-jnp.reshape(log_length, (1, -1)))
    d_x = d_xs * inv_len
    d_xp = d_xps * inv_len
    d_log_len_full = -(jnp.sum(d_xs * xs, axis=0) + jnp.sum(d_xps * xps, axis=0))
    d_log_len = jnp.reshape(d_log_len_full, jnp.shape(log_length))
    return d_x, d_xp, d_log_sig, d_log_len


ard_gram_pallas.defvjp(_fwd, _bwd)
