"""gpscore.ops.fold_stream: fold-STREAMED fused k-fold objectives.

The two primitives fuse ``params -> K_hat^-1 -> fold conditionals -> fold
statistics / ES`` into one custom-VJP chain that processes folds one at a
time (reference fold scoring, `kin40k-FULL-compare.py:500-543`, `:616-663`;
`KIN40K-COMPARE-ALL-FITC-20.py:667-720`). Parity target: the round-4 stacked
composition (ard_kfold_solve_blocks + fold_core consumers), which is itself
pinned against plain autodiff in test_fold_core.py / test_linalg.py — values
AND every hyperparameter/y cotangent must agree to fp32 solve grade.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpscore.ops.fold_core as fc
import gpscore.ops.fold_stream as fs
from gpscore.ops.fold_core import fold_precision_stats
from gpscore.ops.fold_stream import ard_fold_es_stream, ard_fold_stats_stream
from gpscore.ops.loo_fused import ard_kfold_solve_blocks


def _problem(rng, n, d):
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y = jnp.asarray(np.sin(np.asarray(x).sum(1)).astype(np.float32))
    return x, y, jnp.float32(0.3), jnp.zeros(d), jnp.float32(-0.5)


def _old_stats(ls, ll, ln, x, y, fk, block=2048, inplace=None):
    """Round-4 stacked composition of the same math."""
    n = x.shape[0]
    nb = n // fk
    a, A = ard_kfold_solve_blocks(ls, ll, ln, x, y, fk, block, inplace)
    eps = jnp.zeros((fk, nb, 0), jnp.float32)
    st = fold_precision_stats(A, a.reshape(fk, nb), eps, True)
    return st.e, st.half_logdet, st.inv_diag, a


def _rand_weights(rng, fk, nb, n):
    return [jnp.asarray(rng.standard_normal(s).astype(np.float32))
            for s in [(fk, nb), (fk,), (fk, nb), (n,)]]


def _assert_grads_close(gn, go, rtol, atol):
    for ga, gb in zip(gn, go):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=rtol, atol=atol)


class TestStatsStream:
    def test_values_and_grads_match_stacked_composition(self, rng):
        n, d, fk = 64, 3, 4
        x, y, ls, ll, ln = _problem(rng, n, d)
        nb = n // fk
        got = ard_fold_stats_stream(ls, ll, ln, x, y, fk, True)
        want = _old_stats(ls, ll, ln, x, y, fk)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-5, atol=1e-5)
        wts = _rand_weights(rng, fk, nb, n)

        def f_new(ls, ll, ln, y):
            o = ard_fold_stats_stream(ls, ll, ln, x, y, fk, True)
            return sum(jnp.sum(wi * oi) for wi, oi in zip(wts, o))

        def f_old(ls, ll, ln, y):
            o = _old_stats(ls, ll, ln, x, y, fk)
            return sum(jnp.sum(wi * oi) for wi, oi in zip(wts, o))

        gn = jax.grad(f_new, argnums=(0, 1, 2, 3))(ls, ll, ln, y)
        go = jax.grad(f_old, argnums=(0, 1, 2, 3))(ls, ll, ln, y)
        _assert_grads_close(gn, go, 2e-4, 2e-4)

    def test_want_inv_diag_false_zeros_output_same_grads(self, rng):
        n, d, fk = 32, 2, 4
        x, y, ls, ll, ln = _problem(rng, n, d)
        o = ard_fold_stats_stream(ls, ll, ln, x, y, fk, False)
        assert np.all(np.asarray(o[2]) == 0.0)

        def f(flag):
            def loss(ls, ll, ln, y):
                e, hld, _, a = ard_fold_stats_stream(ls, ll, ln, x, y, fk,
                                                     flag)
                return jnp.sum(e) + jnp.sum(hld) + jnp.sum(a)
            return jax.grad(loss, argnums=(0, 1, 2, 3))(ls, ll, ln, y)

        _assert_grads_close(f(False), f(True), 1e-6, 1e-6)

    # nb=15/13: the per-fold panel grid pads 15->16 and 13->16 with leaf 8
    # (identity-padded factors); 16 runs unpadded. Guards the in-place
    # fori stages' buffer discipline on the extracted block as much as the
    # math.
    @pytest.mark.slow
    @pytest.mark.parametrize("n", [64, 60, 52])
    def test_inplace_fold_stages_match_expander_path(self, rng, monkeypatch,
                                                     n):
        monkeypatch.setattr(fs, "_INPLACE_MIN_NB", 1)
        monkeypatch.setattr(fc, "_CHOL_BLOCK", 8)
        d, fk, block = 3, 4, 4
        x, y, ls, ll, ln = _problem(rng, n, d)
        nb = n // fk
        got = ard_fold_stats_stream(ls, ll, ln, x, y, fk, True, block, True)
        want = _old_stats(ls, ll, ln, x, y, fk, block, True)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-4, atol=1e-4)
        wts = _rand_weights(rng, fk, nb, n)

        def f_new(ls, ll, ln, y):
            o = ard_fold_stats_stream(ls, ll, ln, x, y, fk, True, block, True)
            return sum(jnp.sum(wi * oi) for wi, oi in zip(wts, o))

        def f_old(ls, ll, ln, y):
            o = _old_stats(ls, ll, ln, x, y, fk, block, True)
            return sum(jnp.sum(wi * oi) for wi, oi in zip(wts, o))

        gn = jax.grad(f_new, argnums=(0, 1, 2, 3))(ls, ll, ln, y)
        go = jax.grad(f_old, argnums=(0, 1, 2, 3))(ls, ll, ln, y)
        _assert_grads_close(gn, go, 5e-4, 5e-4)

    @pytest.mark.slow
    @pytest.mark.parametrize("st", [jnp.float16, jnp.bfloat16])
    def test_reduced_storage_matches_fp32_at_storage_grade(self, rng, st):
        """2-byte K^-1 storage end to end (per-fold factorization now runs
        AT the storage dtype with fp32 leaves/accumulation): outputs fp32,
        values/grads within storage grade."""
        from gpscore.utils.precision import matmul_mode

        n, d, fk, block = 64, 3, 4, 16
        x, y, ls, ll, ln = _problem(rng, n, d)
        nb = n // fk
        mode = "f16" if st == jnp.float16 else "bf16"
        want = ard_fold_stats_stream(ls, ll, ln, x, y, fk, True, block, True)
        with matmul_mode(mode):
            got = ard_fold_stats_stream(ls, ll, ln, x, y, fk, True, block,
                                        True)
        tol = 5e-2 if st == jnp.bfloat16 else 2e-2
        for g, w in zip(got, want):
            assert g.dtype == jnp.float32
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=tol, atol=tol)
        wts = _rand_weights(rng, fk, nb, n)

        def f(ls, ll, ln, y):
            o = ard_fold_stats_stream(ls, ll, ln, x, y, fk, True, block, True)
            return sum(jnp.sum(wi * oi) for wi, oi in zip(wts, o))

        g32 = jax.grad(f, argnums=(0, 1, 2, 3))(ls, ll, ln, y)
        with matmul_mode(mode):
            gst = jax.grad(f, argnums=(0, 1, 2, 3))(ls, ll, ln, y)
        _assert_grads_close(gst, g32, 0.1, 0.1)


class TestEsStream:
    def test_values_and_grads_match_stacked_composition(self, rng):
        """Same counter-key draw scheme as fold_core.fold_es_score, so the
        stochastic values are bit-comparable at matching fold padding."""
        from gpscore.ops.fold_core import fold_es_score

        n, d, fk, S, beta = 64, 3, 4, 9, 1.0
        x, y, ls, ll, ln = _problem(rng, n, d)
        nb = n // fk
        kd = jax.random.key_data(jax.random.PRNGKey(7))
        got = ard_fold_es_stream(ls, ll, ln, x, y, kd, fk, S, beta)

        def old(ls, ll, ln, y):
            a, A = ard_kfold_solve_blocks(ls, ll, ln, x, y, fk)
            return fold_es_score(A, a.reshape(fk, nb), kd, S, beta)

        want = old(ls, ll, ln, y)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        w = jnp.asarray(rng.standard_normal((fk,)).astype(np.float32))
        gn = jax.grad(
            lambda *a_: jnp.sum(w * ard_fold_es_stream(
                a_[0], a_[1], a_[2], x, a_[3], kd, fk, S, beta)),
            argnums=(0, 1, 2, 3))(ls, ll, ln, y)
        go = jax.grad(
            lambda *a_: jnp.sum(w * old(*a_)), argnums=(0, 1, 2, 3)
        )(ls, ll, ln, y)
        _assert_grads_close(gn, go, 2e-4, 2e-4)

    @pytest.mark.slow
    @pytest.mark.parametrize("n", [64, 52])
    def test_inplace_es_matches_manual_reference(self, rng, monkeypatch, n):
        """ES through the in-place per-fold stages (incl. identity-padded
        non-divisible nb) vs a hand-built autodiff reference on the SAME
        padded counter-key draws."""
        from gpscore.scoring.rules import energy_score_core

        monkeypatch.setattr(fs, "_INPLACE_MIN_NB", 1)
        monkeypatch.setattr(fc, "_CHOL_BLOCK", 8)
        d, fk, S, beta, block = 3, 4, 7, 1.0, 4
        x, y, ls, ll, ln = _problem(rng, n, d)
        nb = n // fk
        nb_pad = fs._fold_pad(nb)
        kd = jax.random.key_data(jax.random.PRNGKey(7))

        def ref(ls, ll, ln, y):
            a, A = ard_kfold_solve_blocks(ls, ll, ln, x, y, fk, block, True)
            La = jnp.linalg.cholesky(A.astype(jnp.float32))
            sol = jax.vmap(lambda L, b: jax.scipy.linalg.solve_triangular(
                L, b, lower=True))
            solT = jax.vmap(lambda L, b: jax.scipy.linalg.solve_triangular(
                L, b, lower=True, trans=1))
            e = solT(La, sol(La, a.reshape(fk, nb)[..., None]))[..., 0]
            sc = []
            for f in range(fk):
                epf = fc._fold_eps(kd, f, nb_pad, S)[:nb]
                zT = jax.scipy.linalg.solve_triangular(
                    La[f], epf, lower=True, trans=1)
                sc.append(energy_score_core(
                    zT[:, :S].T, zT[:, S:].T, -e[f], S, beta))
            return jnp.stack(sc)

        got = ard_fold_es_stream(ls, ll, ln, x, y, kd, fk, S, beta, block,
                                 True)
        want = ref(ls, ll, ln, y)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        w = jnp.asarray(rng.standard_normal((fk,)).astype(np.float32))
        gn = jax.grad(
            lambda *a_: jnp.sum(w * ard_fold_es_stream(
                a_[0], a_[1], a_[2], x, a_[3], kd, fk, S, beta, block, True)),
            argnums=(0, 1, 2, 3))(ls, ll, ln, y)
        go = jax.grad(
            lambda *a_: jnp.sum(w * ref(*a_)), argnums=(0, 1, 2, 3)
        )(ls, ll, ln, y)
        _assert_grads_close(gn, go, 5e-4, 5e-4)


    @pytest.mark.slow
    @pytest.mark.parametrize("st", [jnp.float16, jnp.bfloat16])
    def test_es_reduced_storage_matches_fp32_at_storage_grade(self, rng, st):
        """ES under 2-byte storage: the backward's symmetrized T accumulates
        IN the storage dtype (the fp32 T was the binding es block at the
        2-byte frontier — fold_stream._fold_cot_es comment); values and
        grads stay at storage grade vs the fp32 run on the SAME counter-key
        draws."""
        from gpscore.utils.precision import matmul_mode

        n, d, fk, S, beta = 64, 3, 4, 9, 1.0
        x, y, ls, ll, ln = _problem(rng, n, d)
        kd = jax.random.key_data(jax.random.PRNGKey(7))
        mode = "f16" if st == jnp.float16 else "bf16"
        want = ard_fold_es_stream(ls, ll, ln, x, y, kd, fk, S, beta)
        with matmul_mode(mode):
            got = ard_fold_es_stream(ls, ll, ln, x, y, kd, fk, S, beta)
        tol = 5e-2 if st == jnp.bfloat16 else 2e-2
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=tol, atol=tol)
        w = jnp.asarray(rng.standard_normal((fk,)).astype(np.float32))

        def f(ls, ll, ln, y):
            return jnp.sum(w * ard_fold_es_stream(
                ls, ll, ln, x, y, kd, fk, S, beta))

        g32 = jax.grad(f, argnums=(0, 1, 2, 3))(ls, ll, ln, y)
        with matmul_mode(mode):
            gst = jax.grad(f, argnums=(0, 1, 2, 3))(ls, ll, ln, y)
        _assert_grads_close(gst, g32, 0.1, 0.1)


class TestObjectiveDispatch:
    """The large-n dss/kc/es objectives route through the streamed
    primitives and still match the small-n unfused objectives exactly."""

    @pytest.mark.parametrize("rule", ["dss", "kc"])
    def test_fused_matches_unfused_objective(self, rng, monkeypatch, rule):
        import gpscore.fit.objectives as obj
        from gpscore.fit import make_objective
        from gpscore.utils.params import GPParams

        n, d, fk = 64, 2, 4
        x, y, _, _, _ = _problem(rng, n, d)
        p = GPParams(jnp.float32(0.3), jnp.zeros(d), jnp.float32(-1.0))
        loss_unfused = make_objective(rule, fold_k=fk)
        v0, g0 = jax.value_and_grad(loss_unfused)(p, x, y,
                                                  jax.random.PRNGKey(0))
        monkeypatch.setattr(obj, "_FUSED_LOO_MIN_N", 1)
        loss_fused = make_objective(rule, fold_k=fk)
        v1, g1 = jax.value_and_grad(loss_fused)(p, x, y,
                                                jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
        for a_, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       rtol=2e-4, atol=2e-4)
