"""Checkpoint round-trips and param-trajectory recording."""

import jax
import jax.numpy as jnp
import numpy as np

from gpscore.data import sample_synthetic_1d
from gpscore.fit import fit_gd, make_objective
from gpscore.utils.checkpoint import (
    load_metrics,
    load_pytree,
    save_metrics,
    save_pytree,
)
from gpscore.utils.params import GPParams, init_unit_params


def test_pytree_roundtrip(tmp_path):
    p = GPParams(
        log_signal_sq=jnp.float32(0.3),
        log_length=jnp.array([0.1, -0.2], jnp.float32),
        log_noise_sq=jnp.float32(-1.0),
        inducing=jnp.ones((4, 2), jnp.float32),
    )
    path = str(tmp_path / "params.npz")
    save_pytree(path, p)
    q = load_pytree(path, init_unit_params(d=2, isotropic=False, inducing=jnp.zeros((4, 2))))
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(q)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pytree_roundtrip_batched_no_inducing(tmp_path):
    """A vmapped restart batch (leading axis) with inducing=None round-trips."""
    p = GPParams(
        log_signal_sq=jnp.ones((3,)),
        log_length=jnp.ones((3, 5)),
        log_noise_sq=jnp.zeros((3,)),
    )
    path = str(tmp_path / "batch.npz")
    save_pytree(path, p)
    q = load_pytree(path, p)
    np.testing.assert_array_equal(np.asarray(q.log_length), np.asarray(p.log_length))
    assert q.inducing is None


def test_metrics_roundtrip(tmp_path):
    m = {"crps": {"mse": np.float32(0.5), "series": np.arange(3.0)}, "n": 2}
    path = str(tmp_path / "metrics.json")
    save_metrics(path, m)
    got = load_metrics(path)
    assert got["crps"]["mse"] == 0.5
    assert got["crps"]["series"] == [0.0, 1.0, 2.0]


def test_fit_records_param_history(tmp_path):
    d = sample_synthetic_1d(jax.random.PRNGKey(0), num_train=32, num_test=8, num_va=4)
    loss = make_objective("crps", model="exact")
    p0 = init_unit_params(d=1, isotropic=False)
    res = fit_gd(loss, p0, d.train_x, d.train_y,
                 iters=7, lr=0.5, record_params=True)
    assert res.param_history is not None
    assert res.param_history.log_noise_sq.shape == (7,)
    # history[i] is the evaluation point of loss[i]: history[0] == init, and
    # the final post-update params are NOT in the history.
    np.testing.assert_allclose(
        np.asarray(res.param_history.log_noise_sq[0]),
        np.asarray(p0.log_noise_sq),
    )
    assert not np.allclose(
        np.asarray(res.param_history.log_noise_sq[-1]),
        np.asarray(res.params.log_noise_sq),
    )
    # The trajectory itself checkpoints like any other pytree.
    path = str(tmp_path / "traj.npz")
    save_pytree(path, res.param_history)
    back = load_pytree(path, res.param_history)
    np.testing.assert_allclose(
        np.asarray(back.log_length), np.asarray(res.param_history.log_length)
    )
