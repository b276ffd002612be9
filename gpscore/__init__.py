"""gpscore: TPU-native scoring-rule inference for Gaussian-process regression.

A JAX/XLA/Pallas re-architecture of the capabilities of
github.com/polarlightman/Scoring-rules-for-Gaussian-process-regression-a-new-approach-to-inference
(reference scripts: `SIMPLE-DATA FULL-comapre.py`, `SIMPLE-FITC--comapre.py`,
`kin40k-FULL-compare.py`, `KIN40K-COMPARE-ALL-FITC-20.py`).

The reference is flat single-thread PyTorch-CPU experiment code; this package is a
functional, jit/vmap/pjit-first library:

- ``gpscore.ops``      — kernel Gram construction (jnp + Pallas tiled), Cholesky-based
                         dense linear algebra with jitter escalation.
- ``gpscore.models``   — exact GP / FITC posterior constructors, LOO and k-fold
                         predictive distributions (Rasmussen-Williams identities,
                         Woodbury fast path for FITC).
- ``gpscore.scoring``  — proper scoring rules: CRPS, log score, DSS, energy score,
                         NLML, k-fold CRPS, interval score.
- ``gpscore.fit``      — differentiable objectives + scan-based gradient descent,
                         per-objective hyperparameter schedules.
- ``gpscore.metrics``  — MSE/SMSE/MSLL/coverage evaluation suite.
- ``gpscore.data``     — synthetic GP sampler, KIN40K protocol loader.
- ``gpscore.parallel`` — jax.sharding mesh utilities, sharded Gram/sweeps.
- ``gpscore.analysis`` — objective surfaces, sensitivity curves (replaces R suite).
"""

from gpscore import ops, models, scoring, fit, metrics, data, parallel, analysis, utils

__version__ = "0.1.0"

__all__ = [
    "ops",
    "models",
    "scoring",
    "fit",
    "metrics",
    "data",
    "parallel",
    "analysis",
    "utils",
]
