"""Hyperparameter pytree.

The reference keeps hyperparameters as loose module-level ``requires_grad`` tensors
(`para_l`, `para_k`, `para_noise`, optionally `inducing_x`) that helper functions read
from *globals* (reference `SIMPLE-DATA FULL-comapre.py:199-201`, `Q` reading globals at
`:50-53`). Here they form one explicit, jit/vmap-friendly dataclass pytree.

All scalar hyperparameters are log-parameterized, exactly like the reference's
"trick to make interesting parameter positive" (`SIMPLE-DATA FULL-comapre.py:26`):

- ``log_signal_sq``  = reference ``para_k``     (sigma_k^2 = exp(.))
- ``log_length``     = reference ``para_l``     (semantics depend on kernel: the
  isotropic ``rbf`` uses exp(para_l) as the *squared* lengthscale, while ``ard``
  uses exp(para_l) per-dimension as the lengthscale itself — see gpscore.ops.kernels)
- ``log_noise_sq``   = reference ``para_noise`` (sigma_noise^2 = exp(.))
- ``inducing``       = reference ``inducing_x`` (FITC only; None for exact GP)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GPParams:
    log_signal_sq: jax.Array  # scalar []
    log_length: jax.Array  # [d] for ARD, [] for isotropic rbf
    log_noise_sq: jax.Array  # scalar []
    inducing: Optional[jax.Array] = None  # [m, d] or None

    @property
    def signal_sq(self):
        return jnp.exp(self.log_signal_sq)

    @property
    def noise_sq(self):
        return jnp.exp(self.log_noise_sq)

    def replace(self, **kw) -> "GPParams":
        return dataclasses.replace(self, **kw)


def init_unit_params(d: int = 1, isotropic: bool = True, inducing=None) -> GPParams:
    """Unit init used by the synthetic scripts (`SIMPLE-DATA FULL-comapre.py:199-201`):
    all log-params = 1.0."""
    dtype = jnp.float32
    length = jnp.ones((), dtype) if isotropic else jnp.ones((d,), dtype)
    return GPParams(
        log_signal_sq=jnp.ones((), dtype),
        log_length=length,
        log_noise_sq=jnp.ones((), dtype),
        inducing=inducing,
    )


def init_rand_params(
    key: jax.Array,
    d: int,
    num_inducing: int = 0,
    unit_scalars: bool = False,
    inducing_init: str = "uniform",
) -> GPParams:
    """Random init used by the KIN40K scripts.

    `kin40k-FULL-compare.py:226-233`: para_l ~ U(0,1)^d, para_k/para_noise ~ U(0,1)
    (CRPS section) or fixed 1.0 (other sections, `:321-324` — ``unit_scalars=True``).
    FITC inducing inits: U(0,1) (`KIN40K-COMPARE-ALL-FITC-20.py:215`) or standard
    normal (`:531` — ``inducing_init="normal"``).
    """
    dtype = jnp.float32
    k_l, k_k, k_n, k_u = jax.random.split(key, 4)
    log_length = jax.random.uniform(k_l, (d,), dtype)
    if unit_scalars:
        log_signal = jnp.ones((), dtype)
        log_noise = jnp.ones((), dtype)
    else:
        log_signal = jax.random.uniform(k_k, (), dtype)
        log_noise = jax.random.uniform(k_n, (), dtype)
    inducing = None
    if num_inducing > 0:
        if inducing_init == "normal":
            inducing = jax.random.normal(k_u, (num_inducing, d), dtype)
        else:
            inducing = jax.random.uniform(k_u, (num_inducing, d), dtype)
    return GPParams(log_signal, log_length, log_noise, inducing)
