"""gpscore.ops.potri_inplace: in-place fused Gram -> K_hat^-1 pipeline.

Parity targets: the standard fused core (gpscore.ops.loo_fused with
inplace=False) and the dense linalg path. The in-place pipeline reorders fp32
contractions (panel GEMMs instead of one square GEMM), so tolerances match the
other fused-core tests (~1e-4 relative on solve-backed gradients).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpscore.ops import linalg
from gpscore.ops.kernels import ard_gram
from gpscore.ops.loo_fused import ard_kfold_solve_blocks, ard_loo_solve_diag
from gpscore.ops.potri_inplace import (
    ard_gram_inverse_inplace,
    pad_rows,
    zero_pad,
)


def _problem(rng, n, d=3):
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y = jnp.asarray(np.sin(np.asarray(x).sum(1)).astype(np.float32))
    s = jnp.float32(0.3)
    ell = jnp.asarray((rng.standard_normal(d) * 0.3).astype(np.float32))
    nu = jnp.float32(-1.2)
    return x, y, s, ell, nu


class TestInplacePipeline:
    @pytest.mark.parametrize("n,block", [(64, 64), pytest.param(64, 16, marks=pytest.mark.slow), pytest.param(96, 32, marks=pytest.mark.slow)])
    def test_matches_spd_inverse_exact_multiple(self, rng, n, block):
        x, y, s, ell, nu = _problem(rng, n)
        Kinv = ard_gram_inverse_inplace(s, ell, nu, x, n, block)
        K_hat = ard_gram(x, x, s, ell) + jnp.exp(nu) * jnp.eye(n)
        want = linalg.spd_inverse(K_hat)
        np.testing.assert_allclose(
            np.asarray(Kinv), np.asarray(want), rtol=5e-4, atol=5e-5
        )

    @pytest.mark.slow
    def test_padded_system_is_exactly_block_diagonal(self, rng):
        """Masked padding => blockdiag(K_hat^-1, (1+noise)^-1 I) exactly:
        zero cross-terms (bit-exact, not just small) and the real block equal
        to the unpadded inverse."""
        n, block = 52, 16
        x, y, s, ell, nu = _problem(rng, n)
        n_pad = 64
        Kinv = ard_gram_inverse_inplace(
            s, ell, nu, pad_rows(x, n_pad), n, block
        )
        K_hat = ard_gram(x, x, s, ell) + jnp.exp(nu) * jnp.eye(n)
        want = linalg.spd_inverse(K_hat)
        np.testing.assert_allclose(
            np.asarray(Kinv[:n, :n]), np.asarray(want), rtol=5e-4, atol=5e-5
        )
        assert float(jnp.max(jnp.abs(Kinv[n:, :n]))) == 0.0
        assert float(jnp.max(jnp.abs(Kinv[:n, n:]))) == 0.0
        np.testing.assert_allclose(
            np.asarray(jnp.diagonal(Kinv)[n:]),
            1.0 / (1.0 + float(jnp.exp(nu))),
            rtol=1e-6,
        )

    @pytest.mark.parametrize("n,block,n_pad", [(64, 16, 64), (52, 16, 64)])
    def test_fori_matches_unrolled_bitwise_contract(self, rng, n, block, n_pad):
        """The bounded-trace fori stages compute the same masked-padded
        inverse + half log-det as the unrolled chains (same math, same
        fp32 contraction granularity -> tight tolerance), including exact
        zero cross-terms on the padded system."""
        x, y, s, ell, nu = _problem(rng, n)
        xp = pad_rows(x, n_pad)
        K_hat = ard_gram(x, x, s, ell) + jnp.exp(nu) * jnp.eye(n)
        want = linalg.spd_inverse(K_hat)
        ref_hld = float(
            jnp.sum(jnp.log(jnp.diagonal(jnp.linalg.cholesky(K_hat))))
        )
        for loop in ("fori", "unroll"):
            Kinv, hld = ard_gram_inverse_inplace(
                s, ell, nu, xp, n, block, return_half_logdet=True, loop=loop
            )
            np.testing.assert_allclose(
                np.asarray(Kinv[:n, :n]), np.asarray(want),
                rtol=5e-4, atol=5e-5,
            )
            np.testing.assert_allclose(float(hld), ref_hld, rtol=1e-5)
            if n_pad > n:
                assert float(jnp.max(jnp.abs(Kinv[n:, :n]))) == 0.0
                assert float(jnp.max(jnp.abs(Kinv[:n, n:]))) == 0.0

    def test_fori_dispatch_through_fused_core(self, rng, monkeypatch):
        """With _FORI_MIN_PANELS forced down, the auto dispatch routes the
        fused LOO core through the fori stages and reproduces the unrolled
        values and gradients."""
        import gpscore.ops.potri_inplace as pp

        n, block = 64, 16
        x, y, s, ell, nu = _problem(rng, n)

        def f(s, ell, nu, y):
            a, dg = ard_loo_solve_diag(s, ell, nu, x, y, block, True)
            return jnp.sum(jnp.sin(a) * dg) + jnp.sum(jnp.sqrt(dg))

        v0, g0 = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(s, ell, nu, y)
        monkeypatch.setattr(pp, "_FORI_MIN_PANELS", 1)
        v1, g1 = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(s, ell, nu, y)
        np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
        for a_, b_ in zip(g1, g0):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=1e-5
            )

    @pytest.mark.parametrize("storage,tol", [(jnp.bfloat16, 0.1),
                                             (jnp.float16, 0.02)])
    def test_reduced_storage_pipeline(self, rng, storage, tol):
        """Reduced-precision storage runs the fori stages on a 2-byte buffer
        with fp32 leaves: inverse within storage grade of the fp32 result,
        padding cross-terms still exactly zero, dtype contract honored."""
        n, block, n_pad = 52, 16, 64
        x, y, s, ell, nu = _problem(rng, n)
        K_hat = ard_gram(x, x, s, ell) + jnp.exp(nu) * jnp.eye(n)
        want = np.asarray(linalg.spd_inverse(K_hat))
        Kinv = ard_gram_inverse_inplace(
            s, ell, nu, pad_rows(x, n_pad), n, block, storage=storage
        )
        assert Kinv.dtype == storage
        got = np.asarray(Kinv.astype(jnp.float32))
        scale = np.max(np.abs(want))
        # eps(storage) times the (small-n) conditioning
        assert np.max(np.abs(got[:n, :n] - want)) / scale < tol
        assert float(jnp.max(jnp.abs(Kinv[n:, :n].astype(jnp.float32)))) == 0.0
        with pytest.raises(ValueError, match="fori"):
            ard_gram_inverse_inplace(
                s, ell, nu, pad_rows(x, n_pad), n, block,
                storage=storage, loop="unroll",
            )

    @pytest.mark.parametrize("mode", ["bf16", "f16"])
    def test_storage_modes_through_fused_cores(self, rng, mode):
        """matmul_mode("bf16"/"f16") switches the fused LOO/NLML cores to the
        2-byte-stored pipeline: fp32 output dtypes, values within storage
        grade, gradients pointing the same way."""
        from gpscore.ops.loo_fused import ard_nlml
        from gpscore.utils.precision import matmul_mode

        n, block = 64, 16
        x, y, s, ell, nu = _problem(rng, n)

        def f(s, ell, nu, y):
            a, dg = ard_loo_solve_diag(s, ell, nu, x, y, block, True)
            return jnp.sum(jnp.sin(a) * dg) + jnp.sum(jnp.sqrt(dg))

        def fn(s, ell, nu, y):
            return ard_nlml(s, ell, nu, x, y, block, True)

        for fun in (f, fn):
            v0, g0 = jax.value_and_grad(fun, argnums=(0, 1, 2))(s, ell, nu, y)
            with matmul_mode(mode):
                v1, g1 = jax.value_and_grad(fun, argnums=(0, 1, 2))(
                    s, ell, nu, y
                )
            assert v1.dtype == jnp.float32
            np.testing.assert_allclose(float(v1), float(v0), rtol=2e-2)
            for a_, b_ in zip(g1, g0):
                a_, b_ = np.ravel(a_), np.ravel(b_)
                cos = float(
                    np.dot(a_, b_)
                    / (np.linalg.norm(a_) * np.linalg.norm(b_) + 1e-30)
                )
                assert cos > 0.999

    def test_pad_helpers(self):
        x = jnp.arange(6.0).reshape(3, 2)
        xp = pad_rows(x, 5)
        assert xp.shape == (5, 2)
        np.testing.assert_array_equal(np.asarray(xp[3]), np.asarray(x[-1]))
        v = zero_pad(jnp.ones(3), 5)
        np.testing.assert_array_equal(np.asarray(v), [1, 1, 1, 0, 0])

    def test_rejects_bad_shapes(self):
        x = jnp.zeros((64, 2))
        with pytest.raises(ValueError, match="multiple"):
            ard_gram_inverse_inplace(
                jnp.float32(0), jnp.zeros(2), jnp.float32(0), x[:60], 52, 16
            )
        with pytest.raises(ValueError, match="out of range"):
            ard_gram_inverse_inplace(
                jnp.float32(0), jnp.zeros(2), jnp.float32(0), x, 65, 16
            )


class TestFusedInplaceParity:
    """inplace=True vs inplace=False through the custom-VJP cores."""

    @pytest.mark.parametrize("n,block", [(64, 16), pytest.param(52, 16, marks=pytest.mark.slow), pytest.param(96, 37, marks=pytest.mark.slow)])
    def test_loo_value_and_grads(self, rng, n, block):
        x, y, s, ell, nu = _problem(rng, n)

        def make(inplace):
            def f(s, ell, nu, y):
                a, dg = ard_loo_solve_diag(s, ell, nu, x, y, block, inplace)
                return jnp.sum(jnp.sin(a) * dg) + jnp.sum(jnp.sqrt(dg))

            return f

        v0, g0 = jax.value_and_grad(make(False), argnums=(0, 1, 2, 3))(
            s, ell, nu, y
        )
        v1, g1 = jax.value_and_grad(make(True), argnums=(0, 1, 2, 3))(
            s, ell, nu, y
        )
        np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
        for a_, b_ in zip(g1, g0):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=1e-5
            )

    @pytest.mark.parametrize("n,block", [(52, 16), pytest.param(96, 32, marks=pytest.mark.slow)])
    def test_kfold_value_and_grads(self, rng, n, block):
        x, y, s, ell, nu = _problem(rng, n)
        fk = 4

        def make(inplace):
            def f(s, ell, nu, y):
                a, A = ard_kfold_solve_blocks(
                    s, ell, nu, x, y, fk, block, inplace
                )
                return jnp.sum(jnp.sin(a)) + jnp.sum(jnp.cos(A))

            return f

        v0, g0 = jax.value_and_grad(make(False), argnums=(0, 1, 2, 3))(
            s, ell, nu, y
        )
        v1, g1 = jax.value_and_grad(make(True), argnums=(0, 1, 2, 3))(
            s, ell, nu, y
        )
        np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
        for a_, b_ in zip(g1, g0):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=1e-5
            )

    @pytest.mark.parametrize("n,block,inplace", [(52, 16, True),
                                                 pytest.param(96, 32, True, marks=pytest.mark.slow),
                                                 (96, 32, False)])
    def test_nlml_value_and_grads(self, rng, n, block, inplace):
        """Fused ard_nlml == nlml_exact (value + grads), both potri branches."""
        from gpscore.models.exact import nlml_exact
        from gpscore.ops.loo_fused import ard_nlml

        x, y, s, ell, nu = _problem(rng, n)

        def ref(s, ell, nu, y):
            K = ard_gram(x, x, s, ell)
            return nlml_exact(K, y, jnp.exp(nu))

        def fused(s, ell, nu, y):
            return ard_nlml(s, ell, nu, x, y, block, inplace)

        v0, g0 = jax.value_and_grad(ref, argnums=(0, 1, 2, 3))(s, ell, nu, y)
        v1, g1 = jax.value_and_grad(fused, argnums=(0, 1, 2, 3))(s, ell, nu, y)
        np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
        # primal (no-grad) path is a different branch — check it too
        np.testing.assert_allclose(
            float(fused(s, ell, nu, y)), float(v0), rtol=1e-5
        )
        for a_, b_ in zip(g1, g0):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=1e-5
            )

    def test_nlml_objective_dispatch(self, rng, monkeypatch):
        import gpscore.fit.objectives as obj
        import gpscore.ops.loo_fused as lf
        from gpscore.fit import make_objective
        from gpscore.utils.params import GPParams

        x, y, s, ell, nu = _problem(rng, 64, d=2)
        p = GPParams(s, ell, nu)
        want_v, want_g = jax.value_and_grad(make_objective("nlml"))(p, x, y, None)
        monkeypatch.setattr(obj, "_FUSED_LOO_MIN_N", 1)
        monkeypatch.setattr(lf, "_INPLACE_MIN_N", 1)
        got_v, got_g = jax.value_and_grad(make_objective("nlml"))(p, x, y, None)
        np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-5)
        for a_, b_ in zip(jax.tree.leaves(got_g), jax.tree.leaves(want_g)):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=1e-5
            )

    def test_matmul_acc32_reads_reduced_storage(self, rng):
        """matmul_acc32: fp32 output/accumulation off 2-byte operands, no
        upcast of the stored buffer (dtype contract)."""
        from gpscore.utils.precision import matmul_acc32

        A = jnp.asarray(rng.standard_normal((12, 8)).astype(np.float32))
        B = jnp.asarray(rng.standard_normal((8, 5)).astype(np.float32))
        want = np.asarray(A) @ np.asarray(B)
        for st in (jnp.float32, jnp.bfloat16, jnp.float16):
            got = matmul_acc32(A.astype(st), B.astype(st))
            assert got.dtype == jnp.float32
            tol = 1e-6 if st == jnp.float32 else 3e-2
            np.testing.assert_allclose(np.asarray(got), want,
                                       rtol=tol, atol=tol)

    def test_predictive_diag_large_f16_storage(self, rng):
        """The storage-aware predictive: f16-stored inverse reproduces the
        dense diagonal at half-precision grade (the beyond-fp32-ceiling
        evaluation path of experiments/large_n.py)."""
        from gpscore.models.exact import (
            exact_predictive,
            exact_predictive_diag_large,
        )
        from gpscore.utils.params import GPParams

        n, t = 64, 16
        x, y, s, ell, nu = _problem(rng, n)
        xt = jnp.asarray(rng.standard_normal((t, x.shape[1])).astype(np.float32))
        p = GPParams(s, ell, nu)
        k_ff = ard_gram(x, x, s, ell)
        k_sf = ard_gram(xt, x, s, ell)
        k_ss = ard_gram(xt, xt, s, ell)
        want = exact_predictive(k_sf, k_ff, k_ss, y, jnp.exp(nu))
        got = exact_predictive_diag_large(
            x, y, xt, p, block=16, chunk=16, storage=jnp.float16
        )
        np.testing.assert_allclose(
            np.asarray(got.mean), np.asarray(want.mean), rtol=2e-2, atol=2e-2
        )
        np.testing.assert_allclose(
            np.asarray(got.cov), np.asarray(jnp.diagonal(want.cov)),
            rtol=2e-2, atol=2e-2,
        )

    @pytest.mark.parametrize("n,t", [(64, 16), (52, 23)])  # incl. padded rows
    def test_predictive_diag_large_f16_refined_is_fp32_grade(self, rng, n, t):
        """``refine``: iterative refinement through the f16-stored inverse
        (exact K_hat recomputed panel-wise per step) recovers fp32-grade
        means/variances — the beyond-fp32-ceiling evaluation fix (round-3
        review: 81-88k fits were scored with 2-byte-grade metrics)."""
        from gpscore.models.exact import (
            exact_predictive,
            exact_predictive_diag_large,
        )
        from gpscore.utils.params import GPParams

        x, y, s, ell, nu = _problem(rng, n)
        # longer lengthscales -> higher kappa(K_hat): makes the plain f16
        # solve error visible so the contraction is actually measured
        ell = ell + 1.0
        xt = jnp.asarray(rng.standard_normal((t, x.shape[1])).astype(np.float32))
        p = GPParams(s, ell, nu)
        k_ff = ard_gram(x, x, s, ell)
        k_sf = ard_gram(xt, x, s, ell)
        k_ss = ard_gram(xt, xt, s, ell)
        want = exact_predictive(k_sf, k_ff, k_ss, y, jnp.exp(nu))
        wm, wv = np.asarray(want.mean), np.asarray(jnp.diagonal(want.cov))

        def errs(pred):
            return (
                np.max(np.abs(np.asarray(pred.mean) - wm)),
                np.max(np.abs(np.asarray(pred.cov) - wv)),
            )

        plain = exact_predictive_diag_large(
            x, y, xt, p, block=16, chunk=16, storage=jnp.float16
        )
        refined = exact_predictive_diag_large(
            x, y, xt, p, block=16, chunk=16, storage=jnp.float16, refine=2
        )
        em_p, ev_p = errs(plain)
        em_r, ev_r = errs(refined)
        # fp32-grade after refinement (the fp32 pipeline itself sits at
        # ~1e-4 vs the dense reference on solve-backed quantities)
        assert em_r < 2e-4 and ev_r < 2e-4, (em_r, ev_r)
        # and strictly tighter than the plain 2-byte solve
        assert em_r < 0.2 * max(em_p, 1e-6) or em_p < 2e-4
        assert ev_r < 0.2 * max(ev_p, 1e-6) or ev_p < 2e-4

    @pytest.mark.parametrize("n,t,block,chunk", [(52, 23, 16, 8), (64, 16, 16, 16)])
    def test_predictive_diag_large_matches_dense(self, rng, n, t, block, chunk):
        """Chunked large-n predictive == exact_predictive's diagonal, with
        padding on both the train and test axes."""
        from gpscore.models.exact import (
            exact_predictive,
            exact_predictive_diag_large,
        )
        from gpscore.utils.params import GPParams

        x, y, s, ell, nu = _problem(rng, n)
        xt = jnp.asarray(rng.standard_normal((t, x.shape[1])).astype(np.float32))
        p = GPParams(s, ell, nu)
        k_ff = ard_gram(x, x, s, ell)
        k_sf = ard_gram(xt, x, s, ell)
        k_ss = ard_gram(xt, xt, s, ell)
        want = exact_predictive(k_sf, k_ff, k_ss, y, jnp.exp(nu))
        got = exact_predictive_diag_large(x, y, xt, p, block=block, chunk=chunk)
        np.testing.assert_allclose(
            np.asarray(got.mean), np.asarray(want.mean), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got.cov), np.asarray(jnp.diagonal(want.cov)),
            rtol=1e-4, atol=1e-5,
        )

    @pytest.mark.parametrize("rule", ["crps", "dss"])
    def test_objective_dispatch_inplace(self, rng, monkeypatch, rule):
        """With both thresholds forced down, make_objective routes through the
        in-place fused core and reproduces the small-n loss + gradients."""
        import gpscore.fit.objectives as obj
        import gpscore.ops.loo_fused as lf
        from gpscore.fit import make_objective
        from gpscore.utils.params import GPParams

        x, y, s, ell, nu = _problem(rng, 64, d=2)
        p = GPParams(s, ell, nu)
        want_v, want_g = jax.value_and_grad(make_objective(rule))(p, x, y, None)
        monkeypatch.setattr(obj, "_FUSED_LOO_MIN_N", 1)
        monkeypatch.setattr(lf, "_INPLACE_MIN_N", 1)
        got_v, got_g = jax.value_and_grad(make_objective(rule))(p, x, y, None)
        np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-5)
        for a_, b_ in zip(jax.tree.leaves(got_g), jax.tree.leaves(want_g)):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=1e-5
            )


class TestAutoBlock:
    """Divisor-aware auto panel width for the LOO/NLML cores
    (gpscore.ops.loo_fused.auto_block — round-4 VERDICT ask #8: the
    ceiling-size runs needed hand-chosen --block)."""

    def test_measured_rows(self):
        from gpscore.ops.loo_fused import auto_block

        # comfortable sizes keep the widest divisor
        assert auto_block(30_720, 4) == 2048
        assert auto_block(57_344, 4) == 2048
        # fp32 ceiling sizes narrow (61,440 ran at b=1024; 62,464 NEEDS 512)
        assert auto_block(61_440, 4) in (512, 1024)
        assert auto_block(62_464, 4) == 512
        # 2-byte ceilings: 86,016/88,064 divide 2048 but have no headroom
        assert auto_block(86_016, 2) == 512
        assert auto_block(88_064, 2) == 512
        # 2-byte mid sizes keep wide panels
        assert auto_block(73_728, 2) == 2048
        # nothing divides -> padded 2048 (pre-auto behavior)
        assert auto_block(30_000, 4) == 2048

    def test_block_none_resolves_and_matches_explicit(self, rng):
        """block=None through the public cores == the resolved explicit
        width (same values, same gradients)."""
        import gpscore.ops.loo_fused as lf

        x, y, s, ell, nu = _problem(rng, 64, d=2)
        got = lf.ard_loo_solve_diag(s, ell, nu, x, y, None, True)
        want = lf.ard_loo_solve_diag(s, ell, nu, x, y,
                                     lf.auto_block(64), True)
        for g_, w_ in zip(got, want):
            np.testing.assert_allclose(np.asarray(g_), np.asarray(w_))

        def loss(ell_, block):
            a, dg = lf.ard_loo_solve_diag(s, ell_, nu, x, y, block, True)
            return jnp.sum(a * a / dg)

        g_auto = jax.grad(lambda e: loss(e, None))(ell)
        g_exp = jax.grad(lambda e: loss(e, lf.auto_block(64)))(ell)
        np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_exp))
