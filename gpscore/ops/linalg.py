"""Cholesky-centric dense linear algebra.

The reference's `chol_solve(B, A)` (`SIMPLE-DATA FULL-comapre.py:42-46`) factors with
`torch.potrf` and then — wastefully — runs two *general LU* solves (`torch.gesv`)
against the triangular factors. Here the factor feeds true triangular solves, and the
single factorization is reused for every downstream quantity (solve, log-det, inverse
diagonal, full inverse): the reference re-factors the same matrix up to three times per
training iteration (`SIMPLE-DATA FULL-comapre.py:209-210`).

Failure semantics: `jnp.linalg.cholesky` returns NaN rows (not an exception) for
non-SPD input, so the reference's `try/except RuntimeError` crash recovery
(`kin40k-FULL-compare.py:615,726-732`) is replaced by NaN detection + escalating
jitter inside jit (`safe_cholesky`) — principled, vmap-safe fault tolerance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from gpscore.utils.precision import matmul


def chol_factor(A):
    """Lower Cholesky factor of SPD A."""
    return jnp.linalg.cholesky(A)


def tri_solve(L, B, *, lower: bool = True, trans: bool = False):
    return solve_triangular(L, B, lower=lower, trans=1 if trans else 0)


def chol_solve_from_factor(L, B):
    """A^{-1} B given A = L L^T."""
    return tri_solve(L, tri_solve(L, B), trans=True)


def chol_solve(B, A):
    """A^{-1} B for SPD A (argument order matches the reference's chol_solve)."""
    return chol_solve_from_factor(chol_factor(A), B)


# Above this size, XLA's triangular-solve expander's panel temps (O(n/block)
# live buffers of ~n^2) dominate HBM; use the GEMM-recursion inverse instead.
_TRI_INV_MIN_N = 2048


def spd_inverse(A=None, *, L=None):
    """Materialized SPD inverse (needed for the k-fold diagonal blocks,
    reference `kin40k-FULL-compare.py:507`)."""
    if L is None:
        L = chol_factor(A)
    n = L.shape[-1]
    if L.ndim == 2 and n >= _TRI_INV_MIN_N:
        from gpscore.ops.block_cholesky import tri_inverse_lower

        Linv = tri_inverse_lower(L)
        return matmul(Linv.T, Linv)
    eye = jnp.eye(n, dtype=L.dtype)
    return chol_solve_from_factor(L, eye)


def inv_diag_from_chol(L):
    """diag(A^{-1}) from A = L L^T without forming A^{-1}:
    A^{-1} = L^{-T} L^{-1}  =>  diag(A^{-1})_i = sum_k (L^{-1})_{ki}^2.

    One triangular solve against I; feeds the LOO identities
    (reference computes the same diagonal by materializing the full inverse,
    `SIMPLE-DATA FULL-comapre.py:209`).
    """
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    Linv = tri_solve(L, eye)
    return jnp.sum(Linv * Linv, axis=0)


def half_logdet(L):
    """0.5 * log det A = sum log diag(L)  (reference `SIMPLE-DATA
    FULL-comapre.py:294` via potrf)."""
    return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


# Escalating jitter ladder. First rung 0.0 preserves exact parity with the
# reference when the matrix is healthy; later rungs recover replicates the
# reference would have zeroed out via try/except.
_JITTER_LADDER = (0.0, 1e-6, 1e-4, 1e-2)


def safe_cholesky(A, ladder=_JITTER_LADDER):
    """Cholesky with in-jit escalating-jitter retry.

    Returns ``(L, ok)`` where ``ok`` is False only if every ladder rung failed
    (L is then NaN). Scale-aware: jitter is relative to mean diagonal.
    """
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    scale = jnp.mean(jnp.diagonal(A, axis1=-2, axis2=-1), axis=-1)

    def attempt(jit_frac):
        return jnp.linalg.cholesky(A + (jit_frac * scale) * eye)

    L = attempt(ladder[0])
    for frac in ladder[1:]:
        bad = jnp.any(jnp.isnan(L))
        L = jax.lax.cond(bad, lambda: attempt(frac), lambda: L)
    ok = jnp.logical_not(jnp.any(jnp.isnan(L)))
    return L, ok


@jax.custom_vjp
def loo_solve_diag(K, y):
    """(a, d) = (K^-1 y, diag(K^-1)) for SPD K — the two ingredients of the LOO
    identities — with a closed-form, memory-bounded backward.

    Plain autodiff of the triangular-solve chain materializes O(n/block) panel
    residuals of ~n^2 each (measured: a single n=10k CRPS-LOO value_and_grad
    exceeds 16 GB HBM); the hand adjoints below need only K^-1 itself:

        a = K^-1 y:        K_bar += -(K^-1 a_bar) a^T,   y_bar = K^-1 a_bar
        d = diag(K^-1):    K_bar += -(K^-1 diag(d_bar) K^-1)
                                  = -(Kinv * d_bar[None, :]) @ Kinv

    i.e. one extra solve + two MXU matmuls, peak ~4 n^2 floats.
    """
    a, d, _ = _loo_solve_diag_fwd_impl(K, y)
    return a, d


def _loo_solve_diag_fwd_impl(K, y):
    n = K.shape[-1]
    L = chol_factor(K)
    # Blocked triangular inverse + one SYRK matmul. XLA's triangular-solve
    # expander holds O(n/block) panel temps of ~n^2 each for an [n, n] RHS,
    # which alone blows HBM at n ~ 10k; the recursion is matmul-only with a
    # bounded live set.
    from gpscore.ops.block_cholesky import tri_inverse_lower

    Linv = tri_inverse_lower(L)
    Kinv = matmul(Linv.T, Linv)
    a = matmul(Kinv, y.reshape(n, 1))[:, 0]
    d = jnp.diagonal(Kinv)
    return a, d, Kinv


def _loo_solve_diag_fwd(K, y):
    a, d, Kinv = _loo_solve_diag_fwd_impl(K, y)
    return (a, d), (Kinv, a)


def _loo_solve_diag_bwd(res, cot):
    Kinv, a = res
    a_bar, d_bar = cot
    n = a.shape[0]
    w = matmul(Kinv, a_bar.reshape(n, 1))  # K^-1 a_bar  [n, 1]
    y_bar = w[:, 0]
    K_bar = -matmul(w, a.reshape(1, n)) - matmul(Kinv * d_bar[None, :], Kinv)
    return K_bar, y_bar


loo_solve_diag.defvjp(_loo_solve_diag_fwd, _loo_solve_diag_bwd)


def _kfold_blocks_of(Kinv, fold_k: int):
    n = Kinv.shape[-1]
    nb = n // fold_k
    return jnp.stack(
        [
            jax.lax.dynamic_slice(Kinv, (b * nb, b * nb), (nb, nb))
            for b in range(fold_k)
        ]
    )


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def kfold_solve_blocks(K, y, fold_k: int):
    """(a, A) = (K^-1 y, stacked diagonal blocks [K^-1]_bb) for SPD K — the two
    ingredients of the k-fold conditionals (reference
    `kin40k-FULL-compare.py:507-530`) — with the same closed-form,
    memory-bounded backward as :func:`loo_solve_diag` (of which this is the
    block generalization; at fold size 1 the A-diagonal equals d):

        a = K^-1 y:        K_bar += -(K^-1 a_bar) a^T,   y_bar = K^-1 a_bar
        A_b = [K^-1]_bb:   K_bar += -(K^-1 blockdiag(A_bar) K^-1)

    Plain autodiff of the factor/solve chain re-materializes panel residuals
    and re-runs triangular machinery backward; the adjoint above is one solve
    + three MXU matmuls on the already-computed K^-1 (measured at n=8192 on
    v5e: DSS value_and_grad 0.44 s -> 0.26 s, kc 0.23 s).
    """
    a, A, _ = _kfold_solve_blocks_fwd_impl(K, y, fold_k)
    return a, A


def _kfold_solve_blocks_fwd_impl(K, y, fold_k: int):
    n = K.shape[-1]
    L = chol_factor(K)
    Kinv = spd_inverse(L=L)
    a = matmul(Kinv, y.reshape(n, 1))[:, 0]
    return a, _kfold_blocks_of(Kinv, fold_k), Kinv


def _kfold_solve_blocks_fwd(K, y, fold_k):
    # JAX >= 0.9: custom_vjp fwd keeps the primal signature (nondiff args stay
    # in place); only bwd receives them moved to the front.
    a, A, Kinv = _kfold_solve_blocks_fwd_impl(K, y, fold_k)
    return (a, A), (Kinv, a)


def _kfold_solve_blocks_bwd(fold_k, res, cot):
    Kinv, a = res
    a_bar, A_bar = cot
    n = a.shape[0]
    nb = n // fold_k
    w = matmul(Kinv, a_bar.reshape(n, 1))  # K^-1 a_bar  [n, 1]
    y_bar = w[:, 0]
    B = jnp.zeros((n, n), Kinv.dtype)
    for b in range(fold_k):
        B = jax.lax.dynamic_update_slice(B, A_bar[b], (b * nb, b * nb))
    K_bar = -matmul(w, a.reshape(1, n)) - matmul(matmul(Kinv, B), Kinv)
    return K_bar, y_bar


kfold_solve_blocks.defvjp(_kfold_solve_blocks_fwd, _kfold_solve_blocks_bwd)


def symmetric_sqrt(C):
    """Symmetric PSD square root U diag(s)^0.5 U^T.

    The reference uses torch.svd (`kin40k-FULL-compare.py:74-77`); for a symmetric
    PSD matrix eigh is the TPU-native equivalent (same result, cheaper, and with a
    well-defined JVP). Eigenvalues are clamped at 0 to absorb fp32 round-off.
    """
    s, U = jnp.linalg.eigh(C)
    s = jnp.maximum(s, 0.0)
    return matmul(U * jnp.sqrt(s)[..., None, :], jnp.swapaxes(U, -1, -2))
