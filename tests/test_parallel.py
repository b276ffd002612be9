"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpscore.fit import make_objective
from gpscore.ops.kernels import ard_gram
from gpscore.parallel import (
    make_mesh,
    restart_sweep,
    sharded_gram,
    sharded_restart_sweep,
)
from gpscore.utils.params import GPParams

pytestmark = pytest.mark.slow  # distributed parity on the 8-device CPU mesh at realistic sizes


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_gram_matches_single_device(rng):
    mesh = make_mesh(batch=1, data=8)
    x = jnp.asarray(rng.standard_normal((64, 3)).astype(np.float32))
    ll = jnp.asarray(np.zeros(3, np.float32))
    got = sharded_gram(x, 0.2, ll, mesh)
    want = ard_gram(x, x, 0.2, ll)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def _params_batch(R, d=1, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), R)
    return GPParams(
        log_signal_sq=jnp.ones((R,)),
        log_length=jax.vmap(lambda k: jax.random.uniform(k, (d,)))(ks),
        log_noise_sq=jnp.ones((R,)),
        inducing=None,
    )


def test_sharded_restart_sweep_matches_vmap(rng):
    mesh = make_mesh(batch=8, data=1)
    x = jnp.asarray(rng.standard_normal((24, 1)).astype(np.float32))
    y = jnp.sin(x[:, 0]) + 0.1 * jnp.asarray(rng.standard_normal(24).astype(np.float32))
    loss = make_objective("crps", model="exact")
    pb = _params_batch(8)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(8, dtype=jnp.uint32))

    want = restart_sweep(loss, pb, x, y, iters=5, lr=0.3, keys=keys)
    got = sharded_restart_sweep(loss, pb, x, y, iters=5, lr=0.3, mesh=mesh, keys=keys)
    np.testing.assert_allclose(
        np.asarray(got.loss_history), np.asarray(want.loss_history), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.params.log_noise_sq),
        np.asarray(want.params.log_noise_sq),
        atol=1e-5,
    )


def test_sweep_output_sharding(rng):
    """Restart axis of the results must actually live sharded on the mesh."""
    mesh = make_mesh(batch=8, data=1)
    x = jnp.asarray(rng.standard_normal((16, 1)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    loss = make_objective("crps", model="exact")
    pb = _params_batch(8)
    got = sharded_restart_sweep(loss, pb, x, y, iters=2, lr=0.1, mesh=mesh)
    shard_devices = {
        s.device for s in got.params.log_noise_sq.addressable_shards
    }
    assert len(shard_devices) == 8


def test_sweep_default_keys_parity(rng):
    """Under DEFAULT keys (none passed) the sharded and unsharded sweeps must
    agree — both derive fold_in(PRNGKey(0), i) via default_sweep_keys (round-1
    verdict: the paths silently diverged, PRNGKey(i) vs fold_in)."""
    mesh = make_mesh(batch=8, data=1)
    x = jnp.asarray(rng.standard_normal((24, 1)).astype(np.float32))
    y = jnp.sin(x[:, 0])
    # 'es' consumes the key, so key divergence shows up in the losses.
    loss = make_objective("es", model="exact", num_sim=16)
    pb = _params_batch(8)
    want = restart_sweep(loss, pb, x, y, iters=3, lr=0.05)
    got = sharded_restart_sweep(loss, pb, x, y, iters=3, lr=0.05, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(got.loss_history), np.asarray(want.loss_history), atol=1e-5
    )


def test_mixed_mesh_sharded_gram(rng):
    """batch>1 AND data>1: the 'data'-axis shard_map must be batch-invariant."""
    mesh = make_mesh(batch=2, data=4)
    x = jnp.asarray(rng.standard_normal((64, 3)).astype(np.float32))
    got = sharded_gram(x, 0.2, jnp.zeros(3), mesh)
    want = ard_gram(x, x, 0.2, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_mixed_mesh_sharded_cholesky(rng):
    from gpscore.parallel.sharded_cholesky import sharded_cholesky

    mesh = make_mesh(batch=2, data=4)
    n = 128
    X = rng.standard_normal((n, n)).astype(np.float32)
    A = jnp.asarray(X @ X.T / n + 3.0 * np.eye(n, dtype=np.float32))
    L = sharded_cholesky(A, mesh, block=32)
    np.testing.assert_allclose(
        np.asarray(L), np.asarray(jnp.linalg.cholesky(A)), atol=5e-3, rtol=2e-3
    )


def test_mixed_mesh_sharded_restart_sweep(rng):
    """Restarts sharded over 'batch' while 'data' exists: 4x2-mesh coverage of
    the dryrun's mesh shape inside pytest."""
    mesh = make_mesh(batch=4, data=2)
    x = jnp.asarray(rng.standard_normal((24, 1)).astype(np.float32))
    y = jnp.sin(x[:, 0])
    loss = make_objective("crps", model="exact")
    pb = _params_batch(8)
    want = restart_sweep(loss, pb, x, y, iters=4, lr=0.3)
    got = sharded_restart_sweep(loss, pb, x, y, iters=4, lr=0.3, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(got.loss_history), np.asarray(want.loss_history), atol=1e-5
    )


def test_sharded_cholesky_default_block_n2048(rng):
    """Executes the DEFAULT block=256 panel path (n=2048 / 8 devices ->
    rows_per_device = 256 = block), which no toy-scale test reaches."""
    from gpscore.parallel.sharded_cholesky import sharded_cholesky

    mesh = make_mesh(batch=1, data=8)
    n = 2048
    X = rng.standard_normal((n, n)).astype(np.float32)
    A = jnp.asarray(X @ X.T / n + 4.0 * np.eye(n, dtype=np.float32))
    L = sharded_cholesky(A, mesh)  # block defaults to 256
    want = jnp.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(want), atol=2e-2, rtol=5e-3)


def test_sharded_loo_value_and_grad_matches_single_device(rng):
    from gpscore.parallel import sharded_loo_value_and_grad

    mesh = make_mesh(batch=1, data=8)
    n = 64
    x = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    y = jnp.sin(x.sum(axis=1))
    p = GPParams(
        log_signal_sq=jnp.float32(0.2),
        log_length=jnp.zeros(2),
        log_noise_sq=jnp.float32(-1.0),
    )
    v, g = sharded_loo_value_and_grad(p, x, y, mesh, rule="crps")
    loss = make_objective("crps", model="exact")
    want_v, want_g = jax.value_and_grad(loss)(p, x, y, None)
    np.testing.assert_allclose(float(v), float(want_v), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(want_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5)


def test_sharded_cholesky_matches_builtin(rng):
    from gpscore.parallel.sharded_cholesky import (
        sharded_cholesky,
        sharded_half_logdet,
    )

    mesh = make_mesh(batch=1, data=8)
    n = 512
    X = rng.standard_normal((n, n)).astype(np.float32)
    A = jnp.asarray(X @ X.T / n + 3.0 * np.eye(n, dtype=np.float32))
    L = sharded_cholesky(A, mesh, block=32)
    want = jnp.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(want), atol=5e-3, rtol=2e-3)
    hl = sharded_half_logdet(L, mesh)
    want_hl = float(jnp.sum(jnp.log(jnp.diagonal(want))))
    np.testing.assert_allclose(float(hl), want_hl, rtol=1e-5)


def test_sharded_cholesky_block_equals_rows_per_device(rng):
    """Panel width == rows per device (owner changes every step)."""
    from gpscore.parallel.sharded_cholesky import sharded_cholesky

    mesh = make_mesh(batch=1, data=8)
    n = 256
    X = rng.standard_normal((n, n)).astype(np.float32)
    A = jnp.asarray(X @ X.T / n + 3.0 * np.eye(n, dtype=np.float32))
    L = sharded_cholesky(A, mesh, block=32)  # rows_per = 32 = block
    np.testing.assert_allclose(
        np.asarray(L), np.asarray(jnp.linalg.cholesky(A)), atol=5e-3, rtol=2e-3
    )


def test_sharded_cholesky_rejects_bad_shapes(rng):
    from gpscore.parallel.sharded_cholesky import sharded_cholesky

    mesh = make_mesh(batch=1, data=8)
    A = jnp.eye(100)
    with pytest.raises(ValueError):
        sharded_cholesky(A, mesh, block=32)


def test_sharded_loo_moments_matches_single_device(rng):
    from gpscore.models.exact import loo_exact
    from gpscore.parallel.sharded_loo import sharded_loo_moments

    mesh = make_mesh(batch=1, data=8)
    n = 256
    x = rng.standard_normal((n, 2)).astype(np.float32)
    K = np.asarray(ard_gram(jnp.asarray(x), jnp.asarray(x), 0.3, jnp.zeros(2)))
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    mean, var = sharded_loo_moments(jnp.asarray(K), y, 0.25, mesh, block=32)
    want = loo_exact(jnp.asarray(K), y, 0.25)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(want.mean), atol=2e-3)
    np.testing.assert_allclose(np.asarray(var), np.asarray(want.cov), rtol=2e-3)


def test_sharded_tri_solve_matches_scipy(rng):
    from gpscore.parallel.sharded_cholesky import (
        sharded_cholesky,
        sharded_tri_solve_lower,
    )

    mesh = make_mesh(batch=1, data=8)
    n = 256
    X = rng.standard_normal((n, n)).astype(np.float32)
    A = jnp.asarray(X @ X.T / n + 3.0 * np.eye(n, dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    L = sharded_cholesky(A, mesh, block=32)
    x = sharded_tri_solve_lower(L, b, mesh, block=32)
    want = np.linalg.solve(
        np.linalg.cholesky(np.asarray(A, np.float64)), np.asarray(b, np.float64)
    )
    np.testing.assert_allclose(np.asarray(x), want, atol=5e-4)


def test_sharded_nlml_matches_single_device(rng):
    from gpscore.models.exact import nlml_exact
    from gpscore.parallel.sharded_cholesky import sharded_nlml

    mesh = make_mesh(batch=1, data=8)
    n = 256
    x = rng.standard_normal((n, 2)).astype(np.float32)
    K = ard_gram(jnp.asarray(x), jnp.asarray(x), 0.3, jnp.zeros(2))
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    got = sharded_nlml(K, y, 0.25, mesh, block=32)
    want = nlml_exact(K, y, 0.25)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)


def test_sharded_loo_solve_diag_grad_matches_single_device(rng):
    from gpscore.ops.linalg import loo_solve_diag
    from gpscore.parallel.sharded_loo import make_sharded_loo_solve_diag

    mesh = make_mesh(batch=1, data=8)
    n = 256
    X = rng.standard_normal((n, n)).astype(np.float32)
    K = jnp.asarray(X @ X.T / n + 3.0 * np.eye(n, dtype=np.float32))
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    f_sharded = make_sharded_loo_solve_diag(mesh, block=32)

    def obj(f, K, y):
        a, d = f(K, y)
        return jnp.sum(jnp.sin(a) / d)

    v1, g1 = jax.value_and_grad(lambda K: obj(f_sharded, K, y))(K)
    v2, g2 = jax.value_and_grad(lambda K: obj(loo_solve_diag, K, y))(K)
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4, rtol=2e-2)


def test_sharded_loo_fit_step_descends(rng):
    from gpscore.fit import make_objective
    from gpscore.parallel.sharded_loo import sharded_loo_fit_step

    mesh = make_mesh(batch=1, data=8)
    n = 256
    x = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    y = jnp.sin(x.sum(axis=1))
    p = GPParams(
        log_signal_sq=jnp.float32(0.5),
        log_length=jnp.zeros(2),
        log_noise_sq=jnp.float32(0.0),
    )
    loss0, p1 = sharded_loo_fit_step(p, x, y, mesh, lr=0.5, block=32)
    loss1, _ = sharded_loo_fit_step(p1, x, y, mesh, lr=0.5, block=32)
    assert float(loss1) < float(loss0)
    # value parity with the single-device objective
    ref = make_objective("crps", model="exact")(p, x, y, None)
    np.testing.assert_allclose(float(loss0), float(ref), rtol=2e-4)


def test_make_sharded_loo_fit_step_reuses_compilation(rng):
    """The factory-built step must not retrace between calls."""
    from gpscore.parallel import make_sharded_loo_fit_step

    mesh = make_mesh(batch=1, data=8)
    n = 128
    x = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    y = jnp.sin(x.sum(axis=1))
    p = GPParams(
        log_signal_sq=jnp.float32(0.5),
        log_length=jnp.zeros(2),
        log_noise_sq=jnp.float32(0.0),
    )
    step = make_sharded_loo_fit_step(mesh, lr=0.5, block=16)
    loss0, p1 = step(p, x, y)
    loss1, p2 = step(p1, x, y)
    assert float(loss1) < float(loss0)
    # The jitted step must have traced exactly once across both calls
    # (rebuilding the closure per call would retrace + recompile the whole
    # distributed stack every iteration).
    # step.__closure__: find the jitted function and inspect its cache.
    jitted = next(
        c.cell_contents
        for c in step.__closure__
        if hasattr(c.cell_contents, "_cache_size")
    )
    assert jitted._cache_size() == 1, jitted._cache_size()


def test_sharded_es_requires_key(rng):
    from gpscore.parallel import sharded_loo_value_and_grad

    mesh = make_mesh(batch=1, data=8)
    x = jnp.zeros((16, 1))
    y = jnp.zeros((16,))
    p = GPParams(jnp.zeros(()), jnp.zeros((1,)), jnp.zeros(()))
    with pytest.raises(ValueError, match="PRNG key"):
        sharded_loo_value_and_grad(p, x, y, mesh, rule="es")


def test_sharded_kfold_blocks_matches_single_device(rng):
    """Distributed (K^-1 y, [K^-1]_bb) primitive: value + custom-VJP gradient
    vs autodiff through the dense single-device inverse."""
    from gpscore.ops import linalg
    from gpscore.parallel import make_sharded_kfold_blocks

    mesh = make_mesh(batch=1, data=8)
    n, k = 128, 4
    nb = n // k
    X = rng.standard_normal((n, n)).astype(np.float32)
    K = jnp.asarray(X @ X.T / n + 3.0 * np.eye(n, dtype=np.float32))
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    f_sharded = make_sharded_kfold_blocks(mesh, fold_k=k, block=16)

    def f_dense(K, y):
        Kinv = linalg.spd_inverse(K)
        a = Kinv @ y
        blocks = Kinv.reshape(k, nb, k, nb)
        A = jnp.stack([blocks[b, :, b, :] for b in range(k)])
        return a, A

    def obj(f, K):
        a, A = f(K, y)
        return jnp.sum(jnp.sin(a)) + jnp.sum(jnp.cos(A))

    v1, g1 = jax.value_and_grad(lambda K: obj(f_sharded, K))(K)
    v2, g2 = jax.value_and_grad(lambda K: obj(f_dense, K))(K)
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-4)
    # K is constrained symmetric (it is always built as Gram + diag), so its
    # gradient is only defined up to the symmetric part: the custom VJP returns
    # the exact linear adjoint while Cholesky-backed autodiff symmetrizes.
    sym = lambda g: (np.asarray(g) + np.asarray(g).T) / 2
    np.testing.assert_allclose(sym(g1), sym(g2), atol=1e-4, rtol=2e-2)


@pytest.mark.parametrize("rule", ["dss", "kc"])
def test_sharded_kfold_fit_step_matches_objective(rng, rule):
    """Full distributed k-fold step: loss parity with the single-device
    objective, one-step param parity with its value_and_grad, and descent."""
    from gpscore.parallel import make_sharded_kfold_fit_step

    mesh = make_mesh(batch=1, data=8)
    n, lr = 128, 0.01
    x = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    y = jnp.sin(x.sum(axis=1))
    p = GPParams(
        log_signal_sq=jnp.float32(0.5),
        log_length=jnp.zeros(2),
        log_noise_sq=jnp.float32(0.0),
    )
    step = make_sharded_kfold_fit_step(mesh, rule=rule, fold_k=4, lr=lr, block=16)
    loss0, p1 = step(p, x, y)
    loss1, p2 = step(p1, x, y)
    assert float(loss1) < float(loss0)

    ref_loss = make_objective(rule, model="exact")
    want0, grads = jax.value_and_grad(ref_loss)(p, x, y, None)
    np.testing.assert_allclose(float(loss0), float(want0), rtol=2e-4)
    p1_want = jax.tree.map(lambda a, g: a - lr * g, p, grads)
    for got, want in zip(jax.tree.leaves(p1), jax.tree.leaves(p1_want)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=2e-2
        )


def test_sharded_kfold_es_step_runs_and_requires_key(rng):
    from gpscore.parallel import make_sharded_kfold_fit_step

    mesh = make_mesh(batch=1, data=8)
    n = 64
    x = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    y = jnp.sin(x.sum(axis=1))
    p = GPParams(
        log_signal_sq=jnp.float32(0.5),
        log_length=jnp.zeros(2),
        log_noise_sq=jnp.float32(0.0),
    )
    step = make_sharded_kfold_fit_step(
        mesh, rule="es", fold_k=4, lr=0.01, block=8, num_sim=32
    )
    with pytest.raises(ValueError, match="PRNG key"):
        step(p, x, y)
    loss, p1 = step(p, x, y, key=jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(p1.log_length)))


@pytest.mark.parametrize("rule", ["crps", "logs"])
def test_sharded_fused_loo_fit_step_matches_objective(rng, rule):
    """Fused-sharded step (residuals = row-sharded K^-1 only): loss parity with
    the single-device objective, one-step param parity, and descent."""
    from gpscore.parallel import make_sharded_fused_loo_fit_step

    mesh = make_mesh(batch=1, data=8)
    n, lr = 128, 0.1
    x = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    y = jnp.sin(x.sum(axis=1))
    p = GPParams(
        log_signal_sq=jnp.float32(0.5),
        log_length=jnp.zeros(2),
        log_noise_sq=jnp.float32(0.0),
    )
    step = make_sharded_fused_loo_fit_step(mesh, lr=lr, block=16, rule=rule)
    loss0, p1 = step(p, x, y)
    loss1, _ = step(p1, x, y)
    assert float(loss1) < float(loss0)

    ref_loss = make_objective(rule, model="exact")
    want0, grads = jax.value_and_grad(ref_loss)(p, x, y, None)
    np.testing.assert_allclose(float(loss0), float(want0), rtol=2e-4)
    p1_want = jax.tree.map(lambda a, g: a - lr * g, p, grads)
    for got, want in zip(jax.tree.leaves(p1), jax.tree.leaves(p1_want)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-2
        )


def test_sharded_fused_nlml_fit_step_matches_objective(rng):
    """Fused-sharded NLML step: loss parity with the single-device objective,
    one-step param parity, and descent."""
    from gpscore.parallel import make_sharded_fused_nlml_fit_step

    mesh = make_mesh(batch=1, data=8)
    n, lr = 128, 0.001
    x = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    y = jnp.sin(x.sum(axis=1))
    p = GPParams(
        log_signal_sq=jnp.float32(0.5),
        log_length=jnp.zeros(2),
        log_noise_sq=jnp.float32(0.0),
    )
    step = make_sharded_fused_nlml_fit_step(mesh, lr=lr, block=16)
    loss0, p1 = step(p, x, y)
    loss1, _ = step(p1, x, y)
    assert float(loss1) < float(loss0)

    ref_loss = make_objective("nlml", model="exact")
    want0, grads = jax.value_and_grad(ref_loss)(p, x, y, None)
    np.testing.assert_allclose(float(loss0), float(want0), rtol=2e-4)
    p1_want = jax.tree.map(lambda a, g: a - lr * g, p, grads)
    for got, want in zip(jax.tree.leaves(p1), jax.tree.leaves(p1_want)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-2
        )


def test_sharded_fused_loo_fit_step_mixed_mesh(rng):
    """The fused-sharded step also runs on a mixed (batch=2, data=4) mesh."""
    from gpscore.parallel import make_sharded_fused_loo_fit_step

    mesh = make_mesh(batch=2, data=4)
    n = 64
    x = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    y = jnp.sin(x.sum(axis=1))
    p = GPParams(
        log_signal_sq=jnp.float32(0.5),
        log_length=jnp.zeros(2),
        log_noise_sq=jnp.float32(0.0),
    )
    step = make_sharded_fused_loo_fit_step(mesh, lr=0.1, block=16)
    loss0, p1 = step(p, x, y)
    loss1, _ = step(p1, x, y)
    assert float(loss1) < float(loss0)


@pytest.mark.parametrize("rule", ["dss", "kc"])
def test_sharded_fused_kfold_fit_step_matches_objective(rng, rule):
    """Fused-sharded k-fold step: loss + one-step param parity with the
    single-device objective, and descent."""
    from gpscore.parallel import make_sharded_fused_kfold_fit_step

    mesh = make_mesh(batch=1, data=8)
    n, lr = 128, 0.01
    x = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    y = jnp.sin(x.sum(axis=1))
    p = GPParams(
        log_signal_sq=jnp.float32(0.5),
        log_length=jnp.zeros(2),
        log_noise_sq=jnp.float32(0.0),
    )
    step = make_sharded_fused_kfold_fit_step(
        mesh, rule=rule, fold_k=4, lr=lr, block=16
    )
    loss0, p1 = step(p, x, y)
    loss1, _ = step(p1, x, y)
    assert float(loss1) < float(loss0)

    ref_loss = make_objective(rule, model="exact")
    want0, grads = jax.value_and_grad(ref_loss)(p, x, y, None)
    np.testing.assert_allclose(float(loss0), float(want0), rtol=2e-4)
    p1_want = jax.tree.map(lambda a, g: a - lr * g, p, grads)
    for got, want in zip(jax.tree.leaves(p1), jax.tree.leaves(p1_want)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-2
        )


def test_sharded_fused_kfold_es_runs(rng):
    from gpscore.parallel import make_sharded_fused_kfold_fit_step

    mesh = make_mesh(batch=1, data=8)
    n = 64
    x = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    y = jnp.sin(x.sum(axis=1))
    p = GPParams(
        log_signal_sq=jnp.float32(0.5),
        log_length=jnp.zeros(2),
        log_noise_sq=jnp.float32(0.0),
    )
    step = make_sharded_fused_kfold_fit_step(
        mesh, rule="es", fold_k=4, lr=0.01, block=8, num_sim=32
    )
    with pytest.raises(ValueError, match="PRNG key"):
        step(p, x, y)
    loss, p1 = step(p, x, y, key=jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(p1.log_length)))
