"""Distributed blocked Cholesky over the mesh 'data' axis (shard_map + psum).

XLA's built-in Cholesky cannot execute sharded: under GSPMD a sharded operand is
all-gathered onto every device, so the dense n x n path is capped by one chip's
HBM (the single-chip limit the reference hits at n=500 on CPU,
`kin40k-FULL-compare.py:196`, and this framework hits around n ~ 30k on v5e).
This module implements the classic right-looking panel factorization with the
matrix row-block distributed:

  for each panel k (width b):
    1. the owner's updated diag block D_k is psum-broadcast ([b, b] over ICI),
    2. every device factors L_kk = chol(D_k) redundantly (tiny, replicated),
    3. every device triangular-solves its own rows of the panel column strip,
    4. the full column strip L[:, kb:kb+b] is psum-assembled ([n, b] over ICI),
    5. each device applies the trailing GEMM update to its own rows (MXU).

Static shapes throughout (full-width strips + index masks instead of shrinking
trailing blocks), so the whole factorization is one fori_loop inside one
shard_map region: communication is O(n^2) total over ICI, compute is the
dominant O(n^3/p) of GEMMs per device.

Correctness is pinned against jnp.linalg.cholesky on the 8-device CPU mesh
(tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpscore.utils.precision import matmul


def sharded_cholesky(A, mesh: Mesh, axis: str = "data", block: int = 256):
    """Lower Cholesky factor of SPD ``A`` [n, n] with rows sharded over ``axis``.

    Requirements: n divisible by (num_devices * block) so panels never straddle
    a device boundary. Returns L row-sharded the same way (upper triangle zero).
    """
    n = A.shape[0]
    p = mesh.shape[axis]
    rows_per = n // p
    if n % p != 0 or rows_per % block != 0:
        raise ValueError(
            f"n={n} must be divisible by devices*block={p}*{block}"
        )
    num_panels = n // block

    def local_fn(A_loc):
        idx = jax.lax.axis_index(axis)
        row0 = idx * rows_per
        row_ids = row0 + jnp.arange(rows_per)  # global row indices [n/p]
        col_ids = jnp.arange(n)

        def step(k, A_loc):
            kb = k * block
            owner = kb // rows_per
            local_off = kb - owner * rows_per
            # (1) psum-broadcast the owner's updated diagonal block [b, b].
            D_contrib = jax.lax.dynamic_slice(
                A_loc, (local_off, kb), (block, block)
            )
            D_contrib = jnp.where(idx == owner, D_contrib, 0.0)
            D = jax.lax.psum(D_contrib, axis)
            # (2) replicated small factorization.
            L_kk = jnp.linalg.cholesky(D)
            # (3) local rows of the panel column strip: C L_kk^-T.
            C = jax.lax.dynamic_slice(A_loc, (0, kb), (rows_per, block))
            Lcol = solve_triangular(L_kk, C.T, lower=True).T  # [n/p, b]
            # Rows above the panel are already-final L (their strip entries are
            # upper-triangle zeros); mask them out of panel/trailing math.
            Lcol = jnp.where((row_ids >= kb)[:, None], Lcol, 0.0)
            # (4) assemble the full strip L[:, kb:kb+b] across devices.
            strip = jax.lax.psum(
                jax.lax.dynamic_update_slice(
                    jnp.zeros((n, block), A_loc.dtype), Lcol, (row0, 0)
                ),
                axis,
            )  # [n, b]
            # (5) trailing update of the local rows (full-width GEMM + col mask).
            update = matmul(Lcol, strip.T)  # [n/p, n]
            trailing = (col_ids >= kb + block)[None, :]
            A_new = A_loc - jnp.where(trailing, update, 0.0)
            # write the finished panel columns.
            A_new = jax.lax.dynamic_update_slice(A_new, Lcol, (0, kb))
            return A_new

        A_loc = jax.lax.fori_loop(0, num_panels, step, A_loc)
        # zero the (garbage) upper triangle.
        return jnp.where(col_ids[None, :] <= row_ids[:, None], A_loc, 0.0)

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=P(axis), out_specs=P(axis)
    )
    A = jax.device_put(A, NamedSharding(mesh, P(axis)))
    return fn(A)


def add_noise_sharded(k_ff, noise_sq, mesh: Mesh, axis: str = "data"):
    """K + noise_sq I with the identity formed inside a jitted, row-sharded
    program (an eager jnp.eye(n) would land whole on one device)."""
    n = k_ff.shape[0]
    row = NamedSharding(mesh, P(axis))

    def impl(K):
        return K + noise_sq * jnp.eye(n, dtype=K.dtype)

    fn = jax.jit(impl, in_shardings=(row,), out_shardings=row)
    return fn(jax.device_put(k_ff, row))


def sharded_half_logdet(L_sharded, mesh: Mesh, axis: str = "data"):
    """0.5 log det A from a row-sharded Cholesky factor: each device sums the
    logs of its own diagonal entries; one scalar psum."""
    n = L_sharded.shape[0]
    p = mesh.shape[axis]
    rows_per = n // p

    def local_fn(L_loc):
        idx = jax.lax.axis_index(axis)
        row0 = idx * rows_per
        cols = row0 + jnp.arange(rows_per)
        diag = L_loc[jnp.arange(rows_per), cols]
        return jax.lax.psum(jnp.sum(jnp.log(diag)), axis)

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=P(axis), out_specs=P()
    )
    return fn(L_sharded)


def sharded_tri_solve_lower(L_sharded, b, mesh: Mesh, axis: str = "data",
                            block: int = 256):
    """Forward substitution L x = b with L row-sharded over ``axis``.

    Panel recurrence: x_k = L_kk^-1 (b_k - L[kb:kb+b, :kb] x[:kb]). The owner of
    panel k holds exactly the rows it needs; the solved block is psum-broadcast
    (O(b) per step, O(n) total over ICI). Compute is O(n^2) total — negligible
    next to the factorization — so the owner-only serialization is immaterial.
    Returns x replicated [n].
    """
    n = L_sharded.shape[0]
    p = mesh.shape[axis]
    rows_per = n // p
    if n % p != 0 or rows_per % block != 0:
        raise ValueError(f"n={n} must be divisible by devices*block={p}*{block}")
    num_panels = n // block

    def local_fn(L_loc, b_full):
        idx = jax.lax.axis_index(axis)

        def step(k, x):
            kb = k * block
            owner = kb // rows_per
            local_off = kb - owner * rows_per
            rows = jax.lax.dynamic_slice(L_loc, (local_off, 0), (block, n))
            b_k = jax.lax.dynamic_slice(b_full, (kb,), (block,))
            # accumulated term uses x entries < kb; later entries are still 0,
            # and rows[:, kb:kb+block] contributions are removed via the solve.
            col_ids = jnp.arange(n)
            x_masked = jnp.where(col_ids < kb, x, 0.0)
            s = rows @ x_masked  # [block]
            L_kk = jax.lax.dynamic_slice(rows, (0, kb), (block, block))
            x_k = solve_triangular(L_kk, b_k - s, lower=True)
            x_k = jnp.where(idx == owner, x_k, 0.0)
            x_k = jax.lax.psum(x_k, axis)
            return jax.lax.dynamic_update_slice(x, x_k, (kb,))

        x = jax.lax.fori_loop(0, num_panels, step, jnp.zeros((n,), L_loc.dtype))
        return x

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(P(axis), P()), out_specs=P()
    )
    b = jax.device_put(b, NamedSharding(mesh, P()))
    return fn(L_sharded, b)


def sharded_nlml(k_ff, y, noise_sq, mesh: Mesh, axis: str = "data",
                 block: int = 256):
    """Fully distributed exact-GP NLML at large n: row-sharded Cholesky +
    distributed forward substitution + sharded half-log-det.

        NLML = 0.5 n log 2pi + sum log diag(L) + 0.5 ||L^-1 y||^2

    (reference computes this densely single-process,
    `SIMPLE-DATA FULL-comapre.py:292-296`). Forward-only; returns a scalar.
    """
    n = k_ff.shape[0]
    K_hat = add_noise_sharded(k_ff, noise_sq, mesh, axis=axis)
    L = sharded_cholesky(K_hat, mesh, axis=axis, block=block)
    w = sharded_tri_solve_lower(L, y.reshape(n), mesh, axis=axis, block=block)
    half_logdet = sharded_half_logdet(L, mesh, axis=axis)
    return 0.5 * n * jnp.log(2.0 * jnp.pi) + half_logdet + 0.5 * jnp.sum(w * w)
