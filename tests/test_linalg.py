"""Dense linear-algebra layer vs SciPy fp64."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import cho_factor, cho_solve

from gpscore.ops import linalg


def _spd(rng, n=24):
    A = rng.standard_normal((n, n))
    return (A @ A.T + n * np.eye(n)).astype(np.float32)


def test_chol_solve(rng):
    A = _spd(rng)
    B = rng.standard_normal((24, 3)).astype(np.float32)
    got = linalg.chol_solve(jnp.asarray(B), jnp.asarray(A))
    want = cho_solve(cho_factor(np.asarray(A, np.float64), lower=True), np.asarray(B, np.float64))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_inv_diag_from_chol(rng):
    A = _spd(rng)
    L = linalg.chol_factor(jnp.asarray(A))
    got = linalg.inv_diag_from_chol(L)
    want = np.diag(np.linalg.inv(np.asarray(A, np.float64)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


def test_spd_inverse(rng):
    A = _spd(rng)
    got = linalg.spd_inverse(jnp.asarray(A))
    want = np.linalg.inv(np.asarray(A, np.float64))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_half_logdet(rng):
    A = _spd(rng)
    L = linalg.chol_factor(jnp.asarray(A))
    got = linalg.half_logdet(L)
    want = 0.5 * np.linalg.slogdet(np.asarray(A, np.float64))[1]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_safe_cholesky_clean_matrix_no_jitter(rng):
    """First ladder rung is 0 jitter: healthy matrices factor exactly."""
    A = _spd(rng)
    L, ok = linalg.safe_cholesky(jnp.asarray(A))
    assert bool(ok)
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(np.asarray(A, np.float64)), atol=1e-4
    )


def test_safe_cholesky_rescues_indefinite(rng):
    """A slightly indefinite matrix gets escalating jitter instead of NaN."""
    n = 16
    A = np.eye(n, dtype=np.float32)
    A[0, 0] = -1e-4  # not SPD
    L, ok = linalg.safe_cholesky(jnp.asarray(A))
    assert bool(ok)
    assert not np.any(np.isnan(np.asarray(L)))


def test_safe_cholesky_reports_failure():
    A = -jnp.eye(8)  # hopeless
    _, ok = linalg.safe_cholesky(A)
    assert not bool(ok)


def test_symmetric_sqrt(rng):
    A = _spd(rng, 12)
    R = linalg.symmetric_sqrt(jnp.asarray(A))
    np.testing.assert_allclose(
        np.asarray(R @ R.T), np.asarray(A, np.float64), rtol=1e-3, atol=1e-3
    )
    # symmetry of the root itself (U s^1/2 U^T)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R).T, atol=1e-4)


@pytest.mark.slow
def test_blocked_cholesky_matches_builtin(rng):
    from gpscore.ops.block_cholesky import blocked_cholesky

    for n in (64, 200, 500, 1025):
        X = rng.standard_normal((n, n)).astype(np.float32)
        A = jnp.asarray(X @ X.T / n + 2.0 * np.eye(n, dtype=np.float32))
        got = blocked_cholesky(A, base=128)
        want = jnp.linalg.cholesky(A)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-3, rtol=1e-3
        )


@pytest.mark.slow
def test_blocked_cholesky_differentiable(rng):
    from gpscore.ops.block_cholesky import blocked_cholesky

    X = rng.standard_normal((96, 96)).astype(np.float32)
    A = jnp.asarray(X @ X.T / 96 + 2.0 * np.eye(96, dtype=np.float32))

    def f_blocked(s):
        return jnp.sum(blocked_cholesky(s * A, base=32))

    def f_builtin(s):
        return jnp.sum(jnp.linalg.cholesky(s * A))

    g1 = jax.grad(f_blocked)(1.0)
    g2 = jax.grad(f_builtin)(1.0)
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-4)


def test_loo_solve_diag_custom_vjp_matches_autodiff(rng):
    """Closed-form adjoints of (K^-1 y, diag(K^-1)) vs plain autodiff."""
    n = 20
    A = _spd(rng, n)
    y = rng.standard_normal(n).astype(np.float32)

    def via_custom(K, y):
        a, d = linalg.loo_solve_diag(K, y)
        return jnp.sum(jnp.sin(a) * d + a / d)

    def via_plain(K, y):
        L = linalg.chol_factor(K)
        a = linalg.chol_solve_from_factor(L, y.reshape(n, 1))[:, 0]
        d = linalg.inv_diag_from_chol(L)
        return jnp.sum(jnp.sin(a) * d + a / d)

    K = jnp.asarray(A)
    yj = jnp.asarray(y)
    v1, (gK1, gy1) = jax.value_and_grad(via_custom, argnums=(0, 1))(K, yj)
    v2, (gK2, gy2) = jax.value_and_grad(via_plain, argnums=(0, 1))(K, yj)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gy1), np.asarray(gy2), atol=1e-4, rtol=1e-3)
    # K enters only as a symmetric matrix (gram + noise*I), so gradients are
    # defined up to their symmetric part: the Cholesky VJP weights triangles
    # differently from the full-matrix closed form. Compare symmetrized.
    def sym(g):
        g = np.asarray(g)
        return 0.5 * (g + g.T)

    np.testing.assert_allclose(sym(gK1), sym(gK2), atol=1e-4, rtol=1e-3)


def test_tri_inverse_lower_matches_solve(rng):
    from gpscore.ops.block_cholesky import tri_inverse_lower

    for n in (48, 300, 1025):
        A = _spd(rng, n)
        L = np.linalg.cholesky(np.asarray(A, np.float64)).astype(np.float32)
        got = tri_inverse_lower(jnp.asarray(L), base=128)
        want = np.linalg.inv(np.asarray(L, np.float64))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)
        # strictly lower-triangular output
        assert np.allclose(np.triu(np.asarray(got), 1), 0.0)


def test_spd_inverse_large_n_branch(rng, monkeypatch):
    """The n >= threshold GEMM-recursion branch must match the solve branch."""
    from gpscore.ops import linalg as linalg_mod

    A = jnp.asarray(_spd(rng, 96))
    want = linalg_mod.spd_inverse(A)  # small-n (solve) branch
    monkeypatch.setattr(linalg_mod, "_TRI_INV_MIN_N", 64)
    got = linalg_mod.spd_inverse(A)  # forced large-n branch
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_kfold_solve_blocks_custom_vjp_matches_autodiff(rng):
    """Block generalization of loo_solve_diag: value + gradient (symmetric
    part — K is always symmetric-constructed) vs plain autodiff."""
    import jax
    from gpscore.ops import linalg

    n, k = 64, 4
    nb = n // k
    X = rng.standard_normal((n, n)).astype(np.float32)
    K = jnp.asarray(X @ X.T / n + 3.0 * np.eye(n, dtype=np.float32))
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def dense(K, y):
        Kinv = jnp.linalg.inv(K)
        a = Kinv @ y
        blocks = Kinv.reshape(k, nb, k, nb)
        A = jnp.stack([blocks[b, :, b, :] for b in range(k)])
        return a, A

    a1, A1 = linalg.kfold_solve_blocks(K, y, k)
    a2, A2 = dense(K, y)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A2), atol=1e-5)

    def obj(f, K, y):
        a, A = f(K, y)
        return jnp.sum(jnp.sin(a)) + jnp.sum(jnp.cos(A))

    gK1, gy1 = jax.grad(lambda K, y: obj(lambda K_, y_: linalg.kfold_solve_blocks(K_, y_, k), K, y), argnums=(0, 1))(K, y)
    gK2, gy2 = jax.grad(lambda K, y: obj(dense, K, y), argnums=(0, 1))(K, y)
    sym = lambda g: (np.asarray(g) + np.asarray(g).T) / 2
    np.testing.assert_allclose(sym(gK1), sym(gK2), atol=1e-4, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(gy1), np.asarray(gy2), atol=1e-4)

    # fold size 1 degenerates to the LOO solve-diag primitive
    a3, A3 = linalg.kfold_solve_blocks(K, y, n)
    a4, d4 = linalg.loo_solve_diag(K, y)
    np.testing.assert_allclose(np.asarray(a3), np.asarray(a4), atol=1e-5)
    np.testing.assert_allclose(np.asarray(A3).ravel(), np.asarray(d4), atol=1e-5)


class TestFusedLooCore:
    """gpscore.ops.loo_fused: fused ARD-Gram + LOO solve custom VJP."""

    def _setup(self, rng, n=96, d=3):
        import jax.numpy as jnp

        x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        y = jnp.asarray(np.sin(np.asarray(x).sum(1)).astype(np.float32))
        s = jnp.float32(0.3)
        ell = jnp.asarray((rng.standard_normal(d) * 0.3).astype(np.float32))
        nu = jnp.float32(-1.2)
        return x, y, s, ell, nu

    @pytest.mark.parametrize("block", [32, 37, 96, 2048])
    def test_value_and_grad_match_unfused(self, rng, block):
        """Fused core == gram + loo_solve_diag to fp32 contraction noise, for
        divisible, non-divisible (tail), single-block, and block>n cases."""
        import jax.numpy as jnp

        from gpscore.ops.kernels import ard_gram
        from gpscore.ops.loo_fused import ard_loo_solve_diag
        from gpscore.scoring.rules import crps_gaussian

        x, y, s, ell, nu = self._setup(rng)
        n = x.shape[0]

        def loss_fused(s, ell, nu, y):
            a, d = ard_loo_solve_diag(s, ell, nu, x, y, block)
            return crps_gaussian(y - a / d, 1.0 / d, y)

        def loss_ref(s, ell, nu, y):
            K = ard_gram(x, x, s, ell)
            a, d = linalg.loo_solve_diag(K + jnp.exp(nu) * jnp.eye(n), y)
            return crps_gaussian(y - a / d, 1.0 / d, y)

        vf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3))(s, ell, nu, y)
        vr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(s, ell, nu, y)
        np.testing.assert_allclose(float(vf), float(vr), rtol=1e-6)
        for a_, b_ in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=1e-4, atol=1e-6
            )

    def test_objective_dispatch_uses_fused_path(self, rng, monkeypatch):
        """make_objective switches to the fused core above the threshold with
        identical loss and gradients."""
        import jax.numpy as jnp

        import gpscore.fit.objectives as obj
        from gpscore.fit import make_objective
        from gpscore.utils.params import GPParams

        x, y, s, ell, nu = self._setup(rng, n=64, d=2)
        p = GPParams(s, ell[:2], nu)
        loss = make_objective("crps", model="exact")
        want_v, want_g = jax.value_and_grad(loss)(p, x, y, None)
        monkeypatch.setattr(obj, "_FUSED_LOO_MIN_N", 1)
        loss_fused = make_objective("crps", model="exact")
        got_v, got_g = jax.value_and_grad(loss_fused)(p, x, y, None)
        np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-6)
        for a_, b_ in zip(jax.tree.leaves(got_g), jax.tree.leaves(want_g)):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=1e-4, atol=1e-6
            )


class TestFusedKfoldCore:
    """gpscore.ops.loo_fused.ard_kfold_solve_blocks."""

    @pytest.mark.parametrize("block", [32, 37, 2048])
    def test_value_and_grad_match_unfused(self, rng, block):
        import jax.numpy as jnp

        from gpscore.ops.kernels import ard_gram
        from gpscore.ops.loo_fused import ard_kfold_solve_blocks

        n, d, fk = 96, 3, 4
        x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        y = jnp.asarray(np.sin(np.asarray(x).sum(1)).astype(np.float32))
        s = jnp.float32(0.3)
        ell = jnp.asarray((rng.standard_normal(d) * 0.3).astype(np.float32))
        nu = jnp.float32(-1.2)

        def obj_fused(s, ell, nu, y):
            a, A = ard_kfold_solve_blocks(s, ell, nu, x, y, fk, block)
            return jnp.sum(jnp.sin(a)) + jnp.sum(jnp.cos(A))

        def obj_ref(s, ell, nu, y):
            K = ard_gram(x, x, s, ell)
            a, A = linalg.kfold_solve_blocks(K + jnp.exp(nu) * jnp.eye(n), y, fk)
            return jnp.sum(jnp.sin(a)) + jnp.sum(jnp.cos(A))

        vf, gf = jax.value_and_grad(obj_fused, argnums=(0, 1, 2, 3))(s, ell, nu, y)
        vr, gr = jax.value_and_grad(obj_ref, argnums=(0, 1, 2, 3))(s, ell, nu, y)
        np.testing.assert_allclose(float(vf), float(vr), rtol=1e-6)
        for a_, b_ in zip(gf, gr):
            # atol floors fp32 contraction-order noise on near-zero entries
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=5e-6
            )

    @pytest.mark.parametrize("rule", ["dss", "kc"])
    def test_kfold_objective_dispatch(self, rng, monkeypatch, rule):
        import jax.numpy as jnp

        import gpscore.fit.objectives as obj
        from gpscore.fit import make_objective
        from gpscore.utils.params import GPParams

        n, d = 64, 2
        x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        y = jnp.asarray(np.sin(np.asarray(x).sum(1)).astype(np.float32))
        p = GPParams(jnp.float32(0.3), jnp.zeros(d), jnp.float32(-1.0))
        loss = make_objective(rule, model="exact")
        want_v, want_g = jax.value_and_grad(loss)(p, x, y, None)
        monkeypatch.setattr(obj, "_FUSED_LOO_MIN_N", 1)
        got_v, got_g = jax.value_and_grad(make_objective(rule, model="exact"))(
            p, x, y, None
        )
        np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-5)
        for a_, b_ in zip(jax.tree.leaves(got_g), jax.tree.leaves(want_g)):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=1e-5
            )

    @pytest.mark.parametrize("rule", ["crps", "nlml", "dss", "kc", "es"])
    def test_rbf_objective_dispatch(self, rng, monkeypatch, rule):
        """Isotropic-rbf objectives route through the fused ARD cores above the
        threshold (shared-lengthscale special case, objectives._fused_params)
        with identical loss and gradients — including the d-sum of the length
        cotangent back into the scalar log squared-lengthscale."""
        import jax.numpy as jnp

        import gpscore.fit.objectives as obj
        from gpscore.fit import make_objective
        from gpscore.utils.params import GPParams

        n, d = 64, 3
        x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        y = jnp.asarray(np.sin(np.asarray(x).sum(1)).astype(np.float32))
        # scalar log_length = log squared-lengthscale (rbf semantics)
        p = GPParams(jnp.float32(0.3), jnp.float32(0.4), jnp.float32(-1.0))
        key = jax.random.PRNGKey(7)
        loss = make_objective(rule, model="exact", kernel="rbf", num_sim=64)
        want_v, want_g = jax.value_and_grad(loss)(p, x, y, key)
        monkeypatch.setattr(obj, "_FUSED_LOO_MIN_N", 1)
        loss_fused = make_objective(rule, model="exact", kernel="rbf", num_sim=64)
        got_v, got_g = jax.value_and_grad(loss_fused)(p, x, y, key)
        if rule == "es":
            # different (reparameterized vs covariance-path) samplers: same
            # distribution, different draws — check finiteness + grad shapes
            assert np.isfinite(float(got_v))
            for a_ in jax.tree.leaves(got_g):
                assert np.all(np.isfinite(np.asarray(a_)))
            return
        np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-5)
        for a_, b_ in zip(jax.tree.leaves(got_g), jax.tree.leaves(want_g)):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=1e-5
            )

    def test_rejects_indivisible_n(self, rng):
        import jax.numpy as jnp

        from gpscore.ops.loo_fused import ard_kfold_solve_blocks

        x = jnp.zeros((10, 2))
        y = jnp.zeros((10,))
        with pytest.raises(ValueError, match="divisible"):
            ard_kfold_solve_blocks(
                jnp.float32(0.0), jnp.zeros(2), jnp.float32(0.0), x, y, 4
            )
