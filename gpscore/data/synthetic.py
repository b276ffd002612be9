"""Synthetic 1-D GP data generator.

Reproduces the protocol of `SIMPLE-DATA FULL-comapre.py:161-181` with explicit PRNG
keys (the reference uses the torch global RNG seeded per replicate at `:159-160`):

- full_x = 2 * N(0, 1) draws, num_total = 450 (120 train / 300 test / 30 val)
- y ~ N(0, K_rbf(l^2=1, k^2=1) + 0.3^2 I), sampled jointly over all 450 points
- contiguous split train / test / val
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpscore.ops.kernels import rbf_gram


class SyntheticSplit(NamedTuple):
    train_x: jnp.ndarray  # [n_train, 1]
    train_y: jnp.ndarray  # [n_train]
    test_x: jnp.ndarray
    test_y: jnp.ndarray
    va_x: jnp.ndarray
    va_y: jnp.ndarray


def sample_synthetic_1d(
    key: jax.Array,
    num_train: int = 120,
    num_test: int = 300,
    num_va: int = 30,
    true_sigma_noise: float = 0.3,
    true_log_l_sq: float = 0.0,  # log(1.0): reference `:170`
    true_log_k_sq: float = 0.0,  # log(1.0): reference `:171`
) -> SyntheticSplit:
    num_total = num_train + num_test + num_va
    kx, ky = jax.random.split(key)
    full_x = 2.0 * jax.random.normal(kx, (num_total,), jnp.float32)
    X = full_x.reshape(num_total, 1)
    K = rbf_gram(
        X, X, jnp.float32(true_log_k_sq), jnp.float32(true_log_l_sq)
    ) + (true_sigma_noise**2) * jnp.eye(num_total, dtype=jnp.float32)
    # Joint draw via Cholesky (the reference uses MultivariateNormal.sample()).
    L = jnp.linalg.cholesky(K)
    full_y = L @ jax.random.normal(ky, (num_total,), jnp.float32)

    sl_train = slice(0, num_train)
    sl_test = slice(num_train, num_train + num_test)
    sl_va = slice(num_train + num_test, num_total)
    return SyntheticSplit(
        train_x=X[sl_train],
        train_y=full_y[sl_train],
        test_x=X[sl_test],
        test_y=full_y[sl_test],
        va_x=X[sl_va],
        va_y=full_y[sl_va],
    )
