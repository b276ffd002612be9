"""Kernel Gram parity vs fp64 oracle + Pallas kernel equivalence + gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from gpscore.ops.kernels import ard_gram, rbf_gram
from gpscore.ops.gram_pallas import ard_gram_pallas


def _data(rng, n=37, m=23, d=5):
    x = rng.standard_normal((n, d)).astype(np.float32)
    xp = rng.standard_normal((m, d)).astype(np.float32)
    return x, xp


def test_rbf_matches_oracle(rng):
    x, xp = _data(rng, d=1)
    a, b = 0.3, -0.4
    got = rbf_gram(jnp.asarray(x), jnp.asarray(xp), a, b)
    want = oracle.rbf_gram(x, xp, a, b)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-6)


def test_ard_matches_oracle(rng):
    x, xp = _data(rng)
    a = 0.2
    b = rng.standard_normal(5).astype(np.float32) * 0.3
    got = ard_gram(jnp.asarray(x), jnp.asarray(xp), a, jnp.asarray(b))
    want = oracle.ard_gram(x, xp, a, b)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-6)


def test_ard_isotropic_scalar_length(rng):
    """Scalar log_length must broadcast over dims (synthetic scripts use 1-d)."""
    x, xp = _data(rng, d=1)
    got = ard_gram(jnp.asarray(x), jnp.asarray(xp), 0.0, jnp.float32(0.5))
    want = oracle.ard_gram(x, xp, 0.0, np.array([0.5]))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-6)


def test_gram_symmetric_unit_diag(rng):
    x, _ = _data(rng)
    K = ard_gram(jnp.asarray(x), jnp.asarray(x), 0.7, jnp.zeros(5))
    np.testing.assert_allclose(np.asarray(K), np.asarray(K).T, atol=1e-6)
    # Diagonal comes through the expand-and-subtract distance trick, whose fp32
    # cancellation (2x.x - |x|^2 - |x|^2) leaves ~1 ulp * |x|^2 of noise.
    np.testing.assert_allclose(np.diag(np.asarray(K)), np.exp(0.7), atol=1e-5)


@pytest.mark.parametrize("n,m,d", [(40, 30, 3), (300, 270, 8), (256, 256, 1)])
def test_pallas_gram_matches_jnp(rng, n, m, d):
    """Interpret-mode Pallas (CPU) vs the jnp path, incl. non-tile-aligned shapes."""
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    xp = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
    ll = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.2)
    got = ard_gram_pallas(x, xp, 0.3, ll)
    want = ard_gram(x, xp, 0.3, ll)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.slow
def test_pallas_gram_custom_vjp_matches_jnp_grad(rng):
    x = jnp.asarray(rng.standard_normal((17, 3)).astype(np.float32))
    xp = jnp.asarray(rng.standard_normal((11, 3)).astype(np.float32))
    ll = jnp.asarray(np.array([0.1, -0.2, 0.3], np.float32))
    g = jnp.asarray(rng.standard_normal((17, 11)).astype(np.float32))

    def loss_pallas(x, xp, sig, ll):
        return jnp.sum(ard_gram_pallas(x, xp, sig, ll) * g)

    def loss_jnp(x, xp, sig, ll):
        return jnp.sum(ard_gram(x, xp, sig, ll) * g)

    got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, xp, 0.4, ll)
    want = jax.grad(loss_jnp, argnums=(0, 1, 2, 3))(x, xp, 0.4, ll)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4, rtol=3e-4)


def test_ard_grad_finite_differences(rng):
    """Autodiff through the Gram vs central finite differences (fp32 tolerances)."""
    x = jnp.asarray(rng.standard_normal((12, 2)).astype(np.float32))
    ll = jnp.asarray(np.array([0.2, -0.1], np.float32))

    def f(ll):
        return jnp.sum(ard_gram(x, x, 0.1, ll) ** 2)

    g = jax.grad(f)(ll)
    eps = 1e-3
    for i in range(2):
        e = jnp.zeros(2).at[i].set(eps)
        fd = (f(ll + e) - f(ll - e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[i]), np.asarray(fd), rtol=2e-2)
