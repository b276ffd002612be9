"""Training loops: objective gradients, loss descent, known-truth recovery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpscore.data import sample_synthetic_1d
from gpscore.fit import fit_gd, fit_optax, get_schedule, make_objective
from gpscore.utils.params import GPParams, init_unit_params


@pytest.fixture(scope="module")
def synth():
    return sample_synthetic_1d(jax.random.PRNGKey(11), num_train=48, num_test=32, num_va=8)


def _exact_params():
    return init_unit_params(d=1, isotropic=False)


@pytest.mark.parametrize("rule", ["crps", "logs", "nlml", "dss", "kc", "interval"])
def test_objective_finite_and_descends(synth, rule):
    loss = make_objective(rule, model="exact")
    p = _exact_params()
    lr = {"crps": 0.5, "logs": 0.05, "nlml": 0.001, "dss": 0.001, "kc": 0.1,
          "interval": 0.05}[rule]
    res = fit_gd(loss, p, synth.train_x, synth.train_y, iters=30, lr=lr)
    assert bool(res.ok)
    assert np.isfinite(res.loss_history).all()
    assert res.loss_history[-1] < res.loss_history[0]


@pytest.mark.slow
def test_es_objective_descends(synth):
    """ES is stochastic per iteration; measure descent at a FIXED evaluation key."""
    loss = make_objective("es", model="exact", num_sim=64)
    p0 = _exact_params()
    res = fit_gd(
        loss, p0, synth.train_x, synth.train_y, iters=15, lr=0.05,
        key=jax.random.PRNGKey(5),
    )
    assert bool(res.ok)
    eval_key = jax.random.PRNGKey(99)
    before = loss(p0, synth.train_x, synth.train_y, eval_key)
    after = loss(res.params, synth.train_x, synth.train_y, eval_key)
    assert float(after) < float(before)


@pytest.mark.parametrize("rule", ["crps", "nlml"])
def test_fitc_objective_descends(synth, rule):
    p = _exact_params().replace(
        inducing=jnp.linspace(-3.0, 3.0, 6).reshape(6, 1)
    )
    loss = make_objective(rule, model="fitc")
    lr = {"crps": 0.5, "nlml": 0.0005}[rule]
    res = fit_gd(loss, p, synth.train_x, synth.train_y, iters=30, lr=lr)
    assert bool(res.ok)
    assert res.loss_history[-1] < res.loss_history[0]


def test_crps_recovers_known_truth():
    """Data from a GP with (l^2=1, k^2=1, noise_sd=0.3): the fitted noise must land
    near truth (the reference's visual truth-recovery check, SURVEY.md §4)."""
    d = sample_synthetic_1d(jax.random.PRNGKey(3), num_train=120, num_test=16, num_va=8)
    loss = make_objective("crps", model="exact")
    res = fit_gd(loss, init_unit_params(d=1, isotropic=False), d.train_x, d.train_y,
                 iters=250, lr=1.0)
    noise_sd = float(jnp.exp(0.5 * res.params.log_noise_sq))
    length = float(jnp.exp(res.params.log_length[0]))
    assert 0.15 < noise_sd < 0.6, noise_sd
    assert 0.4 < length < 2.5, length


def test_nlml_recovers_known_truth():
    d = sample_synthetic_1d(jax.random.PRNGKey(4), num_train=120, num_test=16, num_va=8)
    loss = make_objective("nlml", model="exact")
    res = fit_gd(loss, init_unit_params(d=1, isotropic=False), d.train_x, d.train_y,
                 iters=250, lr=0.001)
    noise_sd = float(jnp.exp(0.5 * res.params.log_noise_sq))
    assert 0.15 < noise_sd < 0.6, noise_sd


def test_objective_grads_match_finite_differences(synth):
    """value_and_grad through the full Cholesky/LOO pipeline vs central FD."""
    loss = make_objective("crps", model="exact")
    p = _exact_params()

    def f(log_noise):
        return loss(p.replace(log_noise_sq=log_noise), synth.train_x, synth.train_y, None)

    g = jax.grad(f)(p.log_noise_sq)
    eps = 1e-2
    fd = (f(p.log_noise_sq + eps) - f(p.log_noise_sq - eps)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd), rtol=3e-2)


def test_skip_nonfinite_preserves_params(synth):
    """A poisoned objective must not destroy the parameters."""

    def bad_loss(params, x, y, key=None):
        return params.log_noise_sq * jnp.nan

    p = _exact_params()
    res = fit_gd(bad_loss, p, synth.train_x, synth.train_y, iters=5, lr=1.0)
    assert not bool(res.ok)
    np.testing.assert_allclose(
        np.asarray(res.params.log_noise_sq), np.asarray(p.log_noise_sq)
    )


def test_fit_optax_runs(synth):
    import optax

    loss = make_objective("crps", model="exact")
    res = fit_optax(loss, _exact_params(), synth.train_x, synth.train_y, iters=20,
                    optimizer=optax.adam(0.05))
    assert bool(res.ok)
    assert res.loss_history[-1] < res.loss_history[0]


def test_separate_inducing_lr(synth):
    """lr_inducing=0 must freeze inducing points while hypers move."""
    p = _exact_params().replace(inducing=jnp.linspace(-2.0, 2.0, 5).reshape(5, 1))
    loss = make_objective("crps", model="fitc")
    res = fit_gd(loss, p, synth.train_x, synth.train_y, iters=10, lr=0.1,
                 lr_inducing=0.0)
    np.testing.assert_allclose(np.asarray(res.params.inducing), np.asarray(p.inducing))
    assert not np.allclose(
        np.asarray(res.params.log_noise_sq), np.asarray(p.log_noise_sq)
    )


def test_schedule_table():
    s = get_schedule("kin40k_fitc", "kc")
    assert s.iters == 3000 and s.lr == 0.1
    with pytest.raises(KeyError):
        get_schedule("kin40k_full", "kc")
