"""gpscore.parallel.sharded_potri: in-place mesh potri + streamed backward.

Parity targets: the dense fp64 inverse (forward) and the single-chip fused
custom VJPs of gpscore.ops.loo_fused (backward), on the virtual 8-device CPU
mesh (SURVEY.md §4). The fused-sharded fit steps built on these are covered
end-to-end in test_parallel.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpscore.ops.kernels import ard_gram
from gpscore.parallel.mesh import make_mesh
from gpscore.parallel.sharded_potri import (
    ard_gram_inverse_inplace_sharded,
    make_streamed_ard_bwd,
    sharded_diag,
)

pytestmark = pytest.mark.slow  # sharded potri parity on the CPU mesh


def _setup(rng, n, d):
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y = jnp.asarray(np.sin(rng.standard_normal(n)).astype(np.float32))
    s = jnp.float32(0.3)
    ell = jnp.asarray((rng.standard_normal(d) * 0.3).astype(np.float32))
    nu = jnp.float32(-0.5)
    return x, y, s, ell, nu


class TestShardedPotriForward:
    def test_matches_dense_inverse_and_logdet(self, rng):
        mesh = make_mesh(batch=1, data=8)
        n, d = 128, 3
        x, _, s, ell, nu = _setup(rng, n, d)
        Kinv, hld = jax.jit(
            lambda *a: ard_gram_inverse_inplace_sharded(
                *a, mesh, block=16
            )
        )(s, ell, nu, x)
        K = np.asarray(
            ard_gram(x, x, s, ell) + jnp.exp(nu) * jnp.eye(n), np.float64
        )
        want = np.linalg.inv(K)
        scale = np.abs(want).max()
        np.testing.assert_allclose(
            np.asarray(Kinv) / scale, want / scale, atol=5e-6
        )
        want_hld = np.sum(np.log(np.diag(np.linalg.cholesky(K))))
        np.testing.assert_allclose(float(hld), want_hld, rtol=1e-5)
        # full symmetric inverse: both triangles written
        got = np.asarray(Kinv)
        np.testing.assert_array_equal(got, got.T)
        # diagonal helper
        dg = sharded_diag(Kinv, mesh)
        np.testing.assert_allclose(np.asarray(dg), np.diag(got), rtol=0)

    @pytest.mark.parametrize("storage,tol", [(jnp.bfloat16, 0.05),
                                             (jnp.float16, 0.01)])
    def test_reduced_storage(self, rng, storage, tol):
        """storage=bfloat16/float16: 2-byte per-device buffer, fp32 leaves —
        inverse within storage grade, half log-det error bounded by the
        per-row storage eps (see the single-chip conditioning caveat in
        gpscore/utils/precision.py: prefer f16 at scale)."""
        mesh = make_mesh(batch=1, data=8)
        n, d = 128, 3
        x, _, s, ell, nu = _setup(rng, n, d)
        Kinv, hld = jax.jit(
            lambda *a: ard_gram_inverse_inplace_sharded(
                *a, mesh, block=16, storage=storage
            )
        )(s, ell, nu, x)
        assert Kinv.dtype == storage
        K = np.asarray(
            ard_gram(x, x, s, ell) + jnp.exp(nu) * jnp.eye(n), np.float64
        )
        want = np.linalg.inv(K)
        scale = np.abs(want).max()
        got = np.asarray(Kinv.astype(jnp.float32))
        assert np.max(np.abs(got - want)) / scale < tol
        want_hld = np.sum(np.log(np.diag(np.linalg.cholesky(K))))
        # the log-det is a SUM of n per-row log terms each bf16-grade (the
        # pivots factor bf16-rounded, bf16-accumulated Schur complements):
        # error budget ~ n * eps_bf16 (measured 0.28 at n=128)
        np.testing.assert_allclose(
            float(hld), want_hld, atol=8e-3 * n, rtol=0
        )

    def test_bf16_through_fused_sharded_loo_step(self, rng):
        """matmul_mode("bf16") routes the fused-sharded LOO step onto the
        bf16-stored forward + fp32-accumulating streamed backward; loss and
        updated params track the fp32 step at bf16 grade."""
        from gpscore.parallel.sharded_loo import make_sharded_fused_loo_fit_step
        from gpscore.utils.params import GPParams
        from gpscore.utils.precision import matmul_mode

        mesh = make_mesh(batch=1, data=8)
        n, d = 128, 3
        x, y, s, ell, nu = _setup(rng, n, d)
        p = GPParams(s, ell, nu)
        loss0, new0 = make_sharded_fused_loo_fit_step(
            mesh, lr=0.1, block=16
        )(p, x, y)
        with matmul_mode("bf16"):
            loss1, new1 = make_sharded_fused_loo_fit_step(
                mesh, lr=0.1, block=16
            )(p, x, y)
        np.testing.assert_allclose(float(loss1), float(loss0), rtol=2e-2)
        for a_, b_ in zip(jax.tree.leaves(new1), jax.tree.leaves(new0)):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=0.1, atol=0.05
            )

    def test_mixed_mesh_and_uneven_panels(self, rng):
        """data=4 axis of a (2, 4) mesh; n/p spans several panels."""
        mesh = make_mesh(batch=2, data=4)
        n, d = 96, 2
        x, _, s, ell, nu = _setup(rng, n, d)
        Kinv, _ = jax.jit(
            lambda *a: ard_gram_inverse_inplace_sharded(*a, mesh, block=8)
        )(s, ell, nu, x)
        K = np.asarray(
            ard_gram(x, x, s, ell) + jnp.exp(nu) * jnp.eye(n), np.float64
        )
        want = np.linalg.inv(K)
        scale = np.abs(want).max()
        np.testing.assert_allclose(
            np.asarray(Kinv) / scale, want / scale, atol=5e-6
        )

    def test_rejects_indivisible_n(self, rng):
        mesh = make_mesh(batch=1, data=8)
        x = jnp.zeros((100, 2))
        with pytest.raises(ValueError, match="divisible"):
            ard_gram_inverse_inplace_sharded(
                jnp.float32(0), jnp.zeros(2), jnp.float32(0), x, mesh,
                block=16,
            )


class TestStreamedBwd:
    """Streamed cotangents vs the single-chip fused cores' custom VJPs."""

    def _forward(self, mesh, s, ell, nu, x):
        Kinv, _ = ard_gram_inverse_inplace_sharded(
            s, ell, nu, x, mesh, block=16
        )
        a = jnp.matmul(
            Kinv, jnp.ones((x.shape[0], 1), x.dtype),
            precision=jax.lax.Precision.HIGHEST,
        )
        return Kinv

    def test_loo_mode(self, rng):
        from gpscore.ops.loo_fused import ard_loo_solve_diag

        mesh = make_mesh(batch=1, data=8)
        n, d = 128, 3
        x, y, s, ell, nu = _setup(rng, n, d)
        a_bar = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        d_bar = jnp.asarray(rng.standard_normal(n).astype(np.float32))

        Kinv, _ = jax.jit(
            lambda *a: ard_gram_inverse_inplace_sharded(*a, mesh, block=16)
        )(s, ell, nu, x)
        a = jnp.matmul(
            Kinv, y.reshape(n, 1), precision=jax.lax.Precision.HIGHEST
        )[:, 0]
        bwd = make_streamed_ard_bwd(mesh, "loo", block=16)
        s_bar, l_bar, n_bar, w = jax.jit(
            lambda *args: bwd(*args[:6], (args[6], args[7]))
        )(Kinv, a, x, s, ell, nu, a_bar, d_bar)

        def f(s_, ell_, nu_, y_):
            aa, dd = ard_loo_solve_diag(s_, ell_, nu_, x, y_, 32, False)
            return jnp.sum(aa * a_bar) + jnp.sum(dd * d_bar)

        want = jax.grad(f, argnums=(0, 1, 2, 3))(s, ell, nu, y)
        for got, ref in zip((s_bar, l_bar, n_bar, w), want):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-4, atol=5e-5
            )

    @pytest.mark.parametrize(
        "mesh_shape,fold_k",
        [((1, 8), 4),  # device rows inside one fold (nf=32, n/p=16)
         ((2, 4), 8)],  # whole folds inside one device (nf=16, n/p=32)
    )
    def test_kfold_mode(self, rng, mesh_shape, fold_k):
        from gpscore.ops.loo_fused import ard_kfold_solve_blocks

        mesh = make_mesh(batch=mesh_shape[0], data=mesh_shape[1])
        n, d = 128, 3
        nf = n // fold_k
        x, y, s, ell, nu = _setup(rng, n, d)
        a_bar = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        A_bar = jnp.asarray(
            rng.standard_normal((fold_k, nf, nf)).astype(np.float32)
        )

        Kinv, _ = jax.jit(
            lambda *a: ard_gram_inverse_inplace_sharded(*a, mesh, block=16)
        )(s, ell, nu, x)
        a = jnp.matmul(
            Kinv, y.reshape(n, 1), precision=jax.lax.Precision.HIGHEST
        )[:, 0]
        bwd = make_streamed_ard_bwd(mesh, "kfold", fold_k=fold_k, block=16)
        s_bar, l_bar, n_bar, w = jax.jit(
            lambda *args: bwd(*args[:6], (args[6], args[7]))
        )(Kinv, a, x, s, ell, nu, a_bar, A_bar)

        def f(s_, ell_, nu_, y_):
            aa, A = ard_kfold_solve_blocks(
                s_, ell_, nu_, x, y_, fold_k, 32, False
            )
            return jnp.sum(aa * a_bar) + jnp.sum(A * A_bar)

        want = jax.grad(f, argnums=(0, 1, 2, 3))(s, ell, nu, y)
        for got, ref in zip((s_bar, l_bar, n_bar, w), want):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-4
            )

    def test_nlml_mode(self, rng):
        from gpscore.ops.loo_fused import ard_nlml

        mesh = make_mesh(batch=1, data=8)
        n, d = 128, 3
        x, y, s, ell, nu = _setup(rng, n, d)
        v_bar = 1.7

        Kinv, _ = jax.jit(
            lambda *a: ard_gram_inverse_inplace_sharded(*a, mesh, block=16)
        )(s, ell, nu, x)
        a = jnp.matmul(
            Kinv, y.reshape(n, 1), precision=jax.lax.Precision.HIGHEST
        )[:, 0]
        bwd = make_streamed_ard_bwd(mesh, "nlml", block=16)
        s_bar, l_bar, n_bar, _ = jax.jit(
            lambda *args: bwd(*args[:6], jnp.float32(v_bar))
        )(Kinv, a, x, s, ell, nu)

        want = jax.grad(
            lambda s_, ell_, nu_: v_bar * ard_nlml(s_, ell_, nu_, x, y, 32,
                                                   False),
            argnums=(0, 1, 2),
        )(s, ell, nu)
        for got, ref in zip((s_bar, l_bar, n_bar), want):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-4, atol=5e-5
            )


@pytest.mark.slow
def test_fused_sharded_loo_step_default_block(rng):
    """The fused-sharded CRPS step at the DEFAULT block=256 and n=2048 —
    the production panel size actually exercised through the whole
    potrf/trtri/lauum + streamed-backward chain (round-2 review: fused-sharded
    tests ran only at toy block=16)."""
    from gpscore.fit import make_objective
    from gpscore.parallel import make_sharded_fused_loo_fit_step
    from gpscore.utils.params import GPParams

    mesh = make_mesh(batch=1, data=8)
    n, d, lr = 2048, 3, 0.1
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y = jnp.sin(x.sum(axis=1))
    p = GPParams(
        log_signal_sq=jnp.float32(0.5),
        log_length=jnp.zeros(d),
        log_noise_sq=jnp.float32(0.0),
    )
    step = make_sharded_fused_loo_fit_step(mesh, lr=lr, block=256)
    loss0, p1 = step(p, x, y)
    ref_loss = make_objective("crps", model="exact")
    want0, grads = jax.value_and_grad(ref_loss)(p, x, y, None)
    np.testing.assert_allclose(float(loss0), float(want0), rtol=2e-4)
    p1_want = jax.tree.map(lambda a, g: a - lr * g, p, grads)
    for got, want in zip(jax.tree.leaves(p1), jax.tree.leaves(p1_want)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-2
        )


@pytest.mark.slow
@pytest.mark.parametrize("rule", ["dss", "kc"])
def test_fused_sharded_kfold_step_default_block(rng, rule):
    """The fused-sharded k-fold step at the DEFAULT block=256 and n=2048 —
    the production panel/psum configuration through the whole in-place potri
    + fold-sandwich streamed-backward chain (round-3 review: the kfold/nlml
    factories only ever executed at toy block=8-16, n<=128)."""
    from gpscore.fit import make_objective
    from gpscore.parallel import make_sharded_fused_kfold_fit_step
    from gpscore.utils.params import GPParams

    mesh = make_mesh(batch=1, data=8)
    n, d, lr, fold_k = 2048, 3, 0.01, 4
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y = jnp.sin(x.sum(axis=1))
    p = GPParams(
        log_signal_sq=jnp.float32(0.5),
        log_length=jnp.zeros(d),
        log_noise_sq=jnp.float32(0.0),
    )
    step = make_sharded_fused_kfold_fit_step(
        mesh, rule=rule, fold_k=fold_k, lr=lr, block=256
    )
    loss0, p1 = step(p, x, y)
    ref_loss = make_objective(rule, model="exact")
    want0, grads = jax.value_and_grad(ref_loss)(p, x, y, None)
    np.testing.assert_allclose(float(loss0), float(want0), rtol=2e-4)
    p1_want = jax.tree.map(lambda a, g: a - lr * g, p, grads)
    for got, want in zip(jax.tree.leaves(p1), jax.tree.leaves(p1_want)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-2
        )


@pytest.mark.slow
def test_fused_sharded_nlml_step_default_block(rng):
    """The fused-sharded NLML step at the DEFAULT block=256 and n=2048
    (loss parity with the single-device objective + one-step param parity)."""
    from gpscore.fit import make_objective
    from gpscore.parallel import make_sharded_fused_nlml_fit_step
    from gpscore.utils.params import GPParams

    mesh = make_mesh(batch=1, data=8)
    n, d, lr = 2048, 3, 0.0005
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y = jnp.sin(x.sum(axis=1))
    p = GPParams(
        log_signal_sq=jnp.float32(0.5),
        log_length=jnp.zeros(d),
        log_noise_sq=jnp.float32(0.0),
    )
    step = make_sharded_fused_nlml_fit_step(mesh, lr=lr, block=256)
    loss0, p1 = step(p, x, y)
    ref_loss = make_objective("nlml", model="exact")
    want0, grads = jax.value_and_grad(ref_loss)(p, x, y, None)
    np.testing.assert_allclose(float(loss0), float(want0), rtol=2e-4)
    p1_want = jax.tree.map(lambda a, g: a - lr * g, p, grads)
    for got, want in zip(jax.tree.leaves(p1), jax.tree.leaves(p1_want)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-2
        )


@pytest.mark.slow
def test_fused_sharded_es_step_default_block(rng):
    """The fused-sharded ES step at the DEFAULT block=256 and n=2048: finite
    loss, finite updated params, and descent over one more step (ES is
    stochastic — exact parity with the single-chip sampler is not defined
    across different fold-block layouts, so this pins execution + descent)."""
    from gpscore.parallel import make_sharded_fused_kfold_fit_step
    from gpscore.utils.params import GPParams

    mesh = make_mesh(batch=1, data=8)
    n, d = 2048, 3
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y = jnp.sin(x.sum(axis=1))
    p = GPParams(
        log_signal_sq=jnp.float32(0.5),
        log_length=jnp.zeros(d),
        log_noise_sq=jnp.float32(0.0),
    )
    step = make_sharded_fused_kfold_fit_step(
        mesh, rule="es", fold_k=4, lr=0.01, block=256, num_sim=64
    )
    key = jax.random.PRNGKey(0)
    loss0, p1 = step(p, x, y, key=key)
    assert np.isfinite(float(loss0))
    assert all(np.all(np.isfinite(np.asarray(t))) for t in jax.tree.leaves(p1))
    loss1, _ = step(p1, x, y, key=key)
    assert float(loss1) < float(loss0)
