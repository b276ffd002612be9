"""Fold-STREAMED mesh-sharded k-fold step: parity on the virtual CPU mesh.

Covers the two gather/contraction regimes of
`gpscore/parallel/sharded_fold_stream.py` (module docstring): p > fold_k
(device-within-fold gather, N-form sandwich) on the full 8-device mesh, and
p <= fold_k (single-owner gather, M1-form sandwich — the memory-light shape
the p = 1 TPU mesh uses) on a 2-device submesh. The default-block
(256, n=2048) production configuration is exercised by the existing
`tests/test_sharded_potri.py::test_fused_sharded_kfold_step_default_block`
suite, which dispatches to the streamed path since round 5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpscore.fit import make_objective
from gpscore.parallel import make_mesh, make_sharded_fused_kfold_fit_step
from gpscore.utils.params import GPParams


def _problem(rng, n=128, d=2):
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y = jnp.sin(x.sum(axis=1))
    p = GPParams(
        log_signal_sq=jnp.float32(0.5),
        log_length=jnp.zeros(d),
        log_noise_sq=jnp.float32(0.0),
    )
    return x, y, p


def _mesh2():
    return make_mesh(devices=jax.devices()[:2], batch=1, data=2)


def _assert_step_matches(step, p, x, y, lr, rule, key=None):
    loss0, p1 = step(p, x, y, key=key) if key is not None else step(p, x, y)
    ref = make_objective(rule, model="exact")
    want0, grads = jax.value_and_grad(ref)(p, x, y, key)
    np.testing.assert_allclose(float(loss0), float(want0), rtol=2e-4)
    p1_want = jax.tree.map(lambda a, g: a - lr * g, p, grads)
    for got, want in zip(jax.tree.leaves(p1), jax.tree.leaves(p1_want)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-2
        )


def test_streamed_kc_p2_zero_cotangent_regression(rng):
    """kc on a p=2 submesh (M1-form sandwich): loss + one-step param parity.

    Regression for the round-5 XLA:CPU codegen segfault: the kc loss never
    reads the primitive's hld output, and the resulting all-zero hld_bar
    cotangent constant-folded into the p=2 shard_map backward crashed the
    runtime deterministically until f_bwd barriered its cotangents
    (`sharded_fold_stream.py` f_bwd comment)."""
    x, y, p = _problem(rng)
    step = make_sharded_fused_kfold_fit_step(
        _mesh2(), rule="kc", fold_k=4, lr=0.01, block=16
    )
    _assert_step_matches(step, p, x, y, 0.01, "kc")


@pytest.mark.slow
def test_streamed_dss_p2_matches_objective(rng):
    """dss on the p=2 submesh: folds_within_device gather + M1 sandwich."""
    x, y, p = _problem(rng)
    step = make_sharded_fused_kfold_fit_step(
        _mesh2(), rule="dss", fold_k=4, lr=0.01, block=16
    )
    _assert_step_matches(step, p, x, y, 0.01, "dss")


@pytest.mark.slow
@pytest.mark.parametrize("mesh_p", [8, 2])
def test_streamed_es_matches_single_chip_fused(rng, mesh_p):
    """The streamed sharded ES step reproduces the SINGLE-CHIP fold-streamed
    fused ES (`models/exact.py::kfold_es_fused`) bit-near: both draw eps
    from the same counter keys (`fold_core._fold_eps`), so — unlike the
    stacked round-4 step, whose sampler layout differed — exact loss AND
    one-step parameter parity is defined and pinned here."""
    from gpscore.models.exact import kfold_es_fused

    x, y, p = _problem(rng, n=128)
    key = jax.random.PRNGKey(3)
    mesh = (make_mesh(batch=1, data=8) if mesh_p == 8 else _mesh2())
    lr = 0.01
    step = make_sharded_fused_kfold_fit_step(
        mesh, rule="es", fold_k=4, lr=lr, block=16, num_sim=32
    )
    loss0, p1 = step(p, x, y, key=key)

    def ref(pp, xx, yy):
        return kfold_es_fused(xx, yy, pp, 4, key, num_sim=32)

    want0, grads = jax.value_and_grad(ref)(p, x, y)
    np.testing.assert_allclose(float(loss0), float(want0), rtol=3e-4)
    p1_want = jax.tree.map(lambda a, g: a - lr * g, p, grads)
    for got, want in zip(jax.tree.leaves(p1), jax.tree.leaves(p1_want)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-4, rtol=3e-2
        )


@pytest.mark.slow
@pytest.mark.parametrize("rule", ["dss", "kc"])
def test_streamed_matches_stacked(rng, rule):
    """streamed=True (default) and streamed=False (the round-4 stacked
    composition, kept as parity oracle) agree on loss and updated params."""
    x, y, p = _problem(rng)
    mesh = make_mesh(batch=1, data=8)
    lr = 0.01
    kw = dict(rule=rule, fold_k=4, lr=lr, block=16)
    loss_s, p_s = make_sharded_fused_kfold_fit_step(
        mesh, streamed=True, **kw
    )(p, x, y)
    loss_k, p_k = make_sharded_fused_kfold_fit_step(
        mesh, streamed=False, **kw
    )(p, x, y)
    np.testing.assert_allclose(float(loss_s), float(loss_k), rtol=2e-5)
    for got, want in zip(jax.tree.leaves(p_s), jax.tree.leaves(p_k)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-3
        )
