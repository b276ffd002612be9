"""Blocked (recursive) Cholesky factorization for large SPD matrices on the MXU.

XLA's built-in ``jnp.linalg.cholesky`` on TPU expands to a loop of rank-``b``
updates with modest block sizes; for the large dense path of this framework
(n ~ 10k Gram matrices, BASELINE.json configs[2]) most of the n^3/3 FLOPs can
instead ride full-width MXU GEMMs. This module implements the classic recursive
(divide-and-conquer) factorization:

    A = [[A11, A21^T],      L = [[L11,            0 ],
         [A21, A22  ]]           [A21 L11^-T, chol(A22 - L21 L21^T)]]

Each level does one triangular solve (itself blocked by XLA) and one symmetric
rank-(n/2) GEMM update — the GEMM dominates and is MXU-shaped. All shapes are
static (the recursion unrolls at trace time), so the whole factorization is one
fused XLA program: jit/vmap/grad-compatible like any jnp function.

The reference's entire linear algebra is `torch.potrf` on CPU
(`SIMPLE-DATA FULL-comapre.py:43`); this is its TPU-native performance equivalent
per SURVEY.md §2.2 ("blocked Cholesky on the MXU").

Measured on TPU v5e (fp32, single chip, host-readback barrier): the XLA builtin
reaches 11.5 TF/s at n=8192 vs 9.6 TF/s for this recursion — XLA's own expansion
is already well-blocked single-chip, so ``gpscore.ops.linalg.chol_factor`` keeps
the builtin as its default. The value of this formulation is (a) a pure-GEMM
decomposition whose trailing update can be sharded over a device mesh (the
single-chip builtin cannot), the basis for the multi-chip dense path, and (b) an
independent oracle for testing.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from gpscore.utils.precision import matmul, matmul_crit

# Below this size, recursion overhead beats GEMM gains; hand off to the builtin.
_BASE = 512


def _split_point(n: int, base: int) -> int:
    """Smallest multiple of ``base`` that is >= n/2 — keeps leaves near ``base``
    and the GEMM update as square as possible."""
    half = (n + 1) // 2
    return ((half + base - 1) // base) * base


def tri_inverse_lower(L, base: int = _BASE):
    """Inverse of a lower-triangular matrix via trace-time recursion:

        inv([[L11, 0], [L21, L22]]) = [[inv(L11), 0],
                                       [-inv(L22) L21 inv(L11), inv(L22)]]

    All off-diagonal work is MXU matmuls with a bounded live set. XLA's
    TriangularSolveExpander keeps its whole O(n/block) panel chain of ~n^2 temps
    alive for an [n, n]-RHS solve (measured: the n=10k LOO forward alone exceeds
    HBM); this recursion replaces that solve in the large-n LOO path.
    """
    n = L.shape[-1]

    def _base(L):
        # solve_triangular does not broadcast an unbatched RHS over L's batch
        # dims — materialize the identity per batch element.
        eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
        return solve_triangular(L, eye, lower=True)

    if n <= base:
        return _base(L)
    k = _split_point(n, base)
    if k >= n:
        return _base(L)
    L11 = L[..., :k, :k]
    L21 = L[..., k:, :k]
    L22 = L[..., k:, k:]
    L11i = tri_inverse_lower(L11, base)
    L22i = tri_inverse_lower(L22, base)
    cross = -matmul(L22i, matmul(L21, L11i))
    top = jnp.concatenate(
        [L11i, jnp.zeros_like(L21).swapaxes(-1, -2)], axis=-1
    )
    bot = jnp.concatenate([cross, L22i], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def blocked_cholesky(A, base: int = _BASE):
    """Lower Cholesky factor of SPD ``A`` via trace-time recursion.

    Exact same contract as ``jnp.linalg.cholesky`` (NaN propagation on non-SPD
    input included, since the base case is the builtin); differentiable through
    the solves and matmuls.
    """
    n = A.shape[-1]
    if n <= base:
        return jnp.linalg.cholesky(A)
    k = _split_point(n, base)
    if k >= n:
        return jnp.linalg.cholesky(A)
    A11 = A[..., :k, :k]
    A21 = A[..., k:, :k]
    A22 = A[..., k:, k:]
    L11 = blocked_cholesky(A11, base)
    # L21 = A21 L11^-T  — one blocked triangular solve.
    L21 = solve_triangular(L11, jnp.swapaxes(A21, -1, -2), lower=True).swapaxes(
        -1, -2
    )
    # Trailing update: the big MXU GEMM of the level. matmul_crit: one-pass
    # bf16 Schur drift can NaN the recursive leaf cholesky in "fast" mode.
    S = A22 - matmul_crit(L21, jnp.swapaxes(L21, -1, -2))
    L22 = blocked_cholesky(S, base)
    top = jnp.concatenate([L11, jnp.zeros_like(A21).swapaxes(-1, -2)], axis=-1)
    bot = jnp.concatenate([L21, L22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
