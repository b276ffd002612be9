"""Precision policy for TPU execution.

TPUs natively compute fp32 matmuls through multi-pass bf16 on the MXU unless told
otherwise. The parity targets (posterior moments <= 1e-6 vs an fp64 oracle; see
/root/repo/BASELINE.md) require full fp32 accumulation, so every contraction in the
library routes through :func:`matmul` with ``Precision.HIGHEST`` by default.

The reference runs everything in torch.FloatTensor (fp32 CPU,
`SIMPLE-DATA FULL-comapre.py:165`), so fp32-with-exact-passes is the faithful and
sufficient choice; fp64 is reserved for the NumPy/SciPy test oracle.

Opt-in reduced-precision modes
------------------------------
``matmul_mode("high")`` / ``matmul_mode("fast")`` switch the library's
contractions to 3-pass / 1-pass bf16 multiplies with fp32 accumulation.
Measured on one v5e chip (16k^3 GEMM):

    mode       Precision   TF/s   max rel err vs HIGHEST
    highest    HIGHEST     27.1   —        (parity-grade default)
    high       HIGH        49.8   1.3e-5   (below the documented 1e-4
                                            fp32 solve-parity floor)
    fast       DEFAULT    100.3   2.5e-3

In "fast" mode, cancellation-critical contractions — the left-looking Schur
updates inside the in-place Cholesky chains, where one-pass bf16 drift turns
leaf pivots negative and NaNs the factorization (observed at n = 30k) — are
floored at HIGH via :func:`matmul_crit`; everything else (triangular inverse,
lauum, backward kernel-contraction GEMMs) runs one-pass. Gradient-descent
hyperparameter fitting tolerates the noise; oracle-parity evaluation and
final metrics should run in the default exact mode. The mode is read at
TRACE time: functions already jitted keep the mode they were traced under.
"""

from contextlib import contextmanager

import jax
import jax.numpy as jnp

# Exact fp32 MXU passes — the parity-grade default. Hot, bandwidth-bound
# Pallas kernels may locally choose a cheaper mode, but all library-level jnp
# contractions use HIGHEST unless a reduced mode is switched on.
MM_PRECISION = jax.lax.Precision.HIGHEST

_MODES = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "fast": jax.lax.Precision.DEFAULT,
    # "bf16"/"f16" = 2-byte STORAGE, not just reduced passes: the large-n
    # fused cores keep the n x n working buffer / K^-1 residual in bfloat16
    # or float16 (halving the HBM ceiling's n^2 term -> n ~ 80k+ on one
    # 16 GB chip). Leaf factorizations and all O(n)/O(n b) reductions stay
    # fp32; requires the bounded-trace fori potri pipeline.
    #
    # - "bf16": native one-pass bf16 MXU operands (fastest), but the
    #   factorization is CONDITIONING-LIMITED: storing the Cholesky factor
    #   at 8-bit mantissa feeds ~u*kappa-grade perturbations back into later
    #   pivots, and for smooth kernels (long lengthscales) the pipeline NaNs
    #   where fp32 is fine (measured: unit log-params, n = 30,720 — even
    #   though the ONE-SHOT bf16-rounded K_hat is still SPD there).
    # - "f16": float16 storage (11-bit mantissa, 8x finer) at 3-pass
    #   multiply rate — the robust half-memory mode; stable on the measured
    #   bf16 failure case. fp16's narrow exponent is a non-issue here
    #   (kernel entries are O(signal^2), factors O(sqrt); underflow of far
    #   tails to 0 is benign).
    #
    # DEEP FITS under either 2-byte mode can stall mid-descent: the
    # optimizer lengthens the learned lengthscales, kappa(K_hat) grows, and
    # once it crosses the storage mode's own n*u*kappa onset the pipeline
    # NaNs — fit_gd's NaN-masked updates then freeze the parameters at
    # their last good value (loss history shows NaN; evaluation stays
    # finite). Measured: CRPS-LOO at n=30,720 runs 24 iterations clean in
    # "high" (loss 0.397 -> 0.132) but stalls partway in "f16" (params
    # frozen at loss ~0.21-grade). The designed recipe is fit-then-polish:
    # reduced-storage iterations while conditioning allows, then
    # exact-precision iterations (experiments/large_n.py --polish-iters).
    # Quantified error tables: RESULTS.md "Reduced-precision MXU modes".
    "bf16": jax.lax.Precision.DEFAULT,
    "f16": jax.lax.Precision.HIGH,
}
_mode = "highest"

# jax_default_matmul_precision value per mode. The config participates in the
# jit trace-cache key, so updating it alongside ``_mode`` makes a mode switch
# force a RETRACE of already-jitted functions — without it, calling a
# previously jitted step after switching modes silently reuses the executable
# traced under the old mode (same shapes -> cache hit). Every library
# contraction still passes an explicit Precision; the config value is a cache
# salt (and a matching default for any stray precision-less contraction).
_CONFIG_SALT = {
    "highest": "highest",
    "high": "BF16_BF16_F32_X3",
    "fast": "bfloat16",
    # distinct salts only — per-op dtypes/precision are explicit; these
    # just force the retrace on mode switches.
    "bf16": "tensorfloat32",
    "f16": "float32",
}


def set_matmul_mode(mode: str) -> None:
    """Set the library-wide contraction mode: "highest" (exact fp32 passes,
    default), "high" (3-pass bf16), or "fast" (one-pass bf16; fp32
    accumulation everywhere, critical contractions floored at 3-pass).

    Also updates ``jax_default_matmul_precision`` (part of the jit cache key)
    so jitted functions retrace under the new mode instead of reusing
    executables traced under the old one."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {sorted(_MODES)}, got {mode!r}")
    global _mode
    _mode = mode
    jax.config.update("jax_default_matmul_precision", _CONFIG_SALT[mode])


def get_matmul_mode() -> str:
    return _mode


@contextmanager
def matmul_mode(mode: str):
    """Context manager form of :func:`set_matmul_mode` (trace-time scope)."""
    prev = _mode
    set_matmul_mode(mode)
    try:
        yield
    finally:
        set_matmul_mode(prev)


def mm_precision():
    """The active contraction precision (read at trace time)."""
    return _MODES[_mode]


def mm_precision_crit():
    """Precision for cancellation-critical contractions: the active mode,
    floored at HIGH (one-pass bf16 NaNs in-place Cholesky chains). In "bf16"
    storage mode the floor is meaningless — operands are already bfloat16,
    so the MXU's single native pass IS the exact product of the stored
    values; robustness comes from fp32 accumulation + fp32 leaves instead."""
    if _mode == "fast":
        return jax.lax.Precision.HIGH
    return _MODES[_mode]


def storage_dtype():
    """Trace-time dtype for the large-n cores' n x n buffers: bfloat16 in
    "bf16" mode, float16 in "f16" mode, float32 otherwise."""
    if _mode == "bf16":
        return jnp.bfloat16
    if _mode == "f16":
        return jnp.float16
    return jnp.float32


def matmul_acc32(a, b):
    """Matmul with explicit fp32 accumulation AND fp32 output regardless of
    operand dtype — the bridge for reading bf16-stored buffers into fp32
    reductions without an n^2 upcast (a mixed-dtype jnp.matmul would convert
    the bf16 operand to a full fp32 copy first)."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        precision=mm_precision(), preferred_element_type=jnp.float32,
    )


def default_dtype():
    return jnp.float32


def matmul(a, b):
    """fp32 matmul; exact (non-bf16) MXU passes unless a reduced mode is on."""
    return jnp.matmul(a, b, precision=mm_precision())


def matmul_crit(a, b):
    """Matmul for cancellation-critical accumulations (Cholesky Schur
    updates): active mode floored at 3-pass bf16."""
    return jnp.matmul(a, b, precision=mm_precision_crit())
