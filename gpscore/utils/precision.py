"""Precision policy for TPU execution.

TPUs natively compute fp32 matmuls through multi-pass bf16 on the MXU unless told
otherwise. The parity targets (posterior moments <= 1e-6 vs an fp64 oracle; see
/root/repo/BASELINE.md) require full fp32 accumulation, so every contraction in the
library routes through :func:`matmul` with ``Precision.HIGHEST``.

The reference runs everything in torch.FloatTensor (fp32 CPU,
`SIMPLE-DATA FULL-comapre.py:165`), so fp32-with-exact-passes is the faithful and
sufficient choice; fp64 is reserved for the NumPy/SciPy test oracle.
"""

import jax
import jax.numpy as jnp

# Exact fp32 MXU passes. Hot, bandwidth-bound Pallas kernels may locally choose
# a cheaper mode, but all library-level jnp contractions use HIGHEST.
MM_PRECISION = jax.lax.Precision.HIGHEST


def default_dtype():
    return jnp.float32


def matmul(a, b):
    """fp32 matmul with exact (non-bf16) MXU passes."""
    return jnp.matmul(a, b, precision=MM_PRECISION)
