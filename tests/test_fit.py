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


class TestStallRecovery:
    """2-byte conditioning-stall detection + automatic recovery
    (gpscore/utils/precision.py stall notes; fit_gd_recovering replaces the
    manual large_n.py --polish-iters recipe).

    The stall is reproduced with a mode-sensitive toy objective: like the
    fused cores, it reads the matmul mode at TRACE time and goes NaN past a
    parameter threshold under 2-byte modes only — the measured CRPS-at-30,720
    signature (clean in "high", frozen partway in "f16") in miniature.
    """

    @staticmethod
    def _params0():
        return GPParams(
            log_signal_sq=jnp.float32(0.0),
            log_length=jnp.ones((1,), jnp.float32),
            log_noise_sq=jnp.float32(1.0),
        )

    @staticmethod
    def _mode_sensitive_loss(params, x, y, key=None):
        from gpscore.utils.precision import get_matmul_mode

        base = (params.log_signal_sq - 1.0) ** 2
        if get_matmul_mode() in ("bf16", "f16"):
            # conditioning crossover stand-in: NaN once the parameter
            # descends past the mode's stability onset
            base = jnp.where(params.log_signal_sq > 0.55, jnp.nan, base)
        return base

    def test_stall_iters_counts_trailing_skips(self, synth):
        from gpscore.utils.precision import matmul_mode

        p = self._params0()
        with matmul_mode("f16"):
            res = fit_gd(self._mode_sensitive_loss, p, synth.train_x,
                         synth.train_y, iters=8, lr=0.25)
        # trajectory: 0 -> 0.5 (finite) -> 0.75 -> NaN, frozen for the rest
        assert int(res.stall_iters) == 6
        np.testing.assert_allclose(
            float(res.params.log_signal_sq), 0.75, rtol=1e-6
        )
        # healthy fit reports zero
        res2 = fit_gd(self._mode_sensitive_loss, p, synth.train_x,
                      synth.train_y, iters=8, lr=0.25)
        assert int(res2.stall_iters) == 0

    @pytest.mark.parametrize("segment_iters", [None, 3])
    def test_fit_gd_recovering_completes(self, synth, segment_iters):
        from gpscore.fit import fit_gd_recovering
        from gpscore.utils.precision import matmul_mode

        p = self._params0()
        with matmul_mode("f16"):
            res, info = fit_gd_recovering(
                self._mode_sensitive_loss, p, synth.train_x, synth.train_y,
                iters=8, lr=0.25, segment_iters=segment_iters,
            )
        # auto ladder at small n: f16 -> high; the 6 lost iterations re-run
        assert info["stall_iters"] == 6
        assert info["recovery"] == [
            {"mode": "high", "iters": 6, "stall_after": 0}
        ]
        assert int(res.stall_iters) == 0
        assert res.loss_history.shape == (8,)
        assert np.isfinite(np.asarray(res.loss_history)).all()
        # recovered past the f16 wall toward the optimum at 1.0
        assert float(res.params.log_signal_sq) > 0.95

    def test_fit_gd_recovering_no_stall_is_single_leg(self, synth):
        from gpscore.fit import fit_gd_recovering

        p = self._params0()
        res, info = fit_gd_recovering(
            self._mode_sensitive_loss, p, synth.train_x, synth.train_y,
            iters=5, lr=0.25,
        )
        assert info["stall_iters"] == 0 and info["recovery"] == []
        assert float(res.params.log_signal_sq) > 0.9

    def test_auto_recover_mode_ladder(self):
        from gpscore.fit import auto_recover_mode

        assert auto_recover_mode("bf16", 30_720) == "high"
        assert auto_recover_mode("bf16", 86_016) == "f16"
        assert auto_recover_mode("f16", 30_720) == "high"
        assert auto_recover_mode("f16", 86_016) is None  # nothing safer
        assert auto_recover_mode("highest", 30_720) is None
        assert auto_recover_mode("fast", 30_720) is None

    def test_auto_recover_mode_fold_family(self):
        """The fold rules' fp32 ceiling sits below the LOO rules'
        (RESULTS.md): in the gap the ladder must pick "f16", not an
        OOM-bound "high" (round-4 VERDICT weak #2)."""
        from gpscore.fit import auto_recover_mode, objective_family
        from gpscore.fit.train import _FP32_STORAGE_CEILING_N

        lo, hi = (_FP32_STORAGE_CEILING_N["fold"],
                  _FP32_STORAGE_CEILING_N["loo"])
        gap_n = lo + 1024  # a fold-rule size above fold-fp32, below LOO-fp32
        assert lo < gap_n <= hi
        assert auto_recover_mode("bf16", gap_n, "fold") == "f16"
        assert auto_recover_mode("f16", gap_n, "fold") is None
        assert auto_recover_mode("bf16", lo, "fold") == "high"
        # LOO family unchanged in the gap
        assert auto_recover_mode("bf16", gap_n, "loo") == "high"
        assert objective_family("dss") == "fold"
        assert objective_family("es") == "fold"
        assert objective_family("kc") == "fold"
        assert objective_family("crps") == "loo"
        assert objective_family(None) == "loo"

    def test_fold_rule_stall_recovers_via_f16_in_the_gap(self, synth,
                                                         monkeypatch):
        """A bf16 fold-rule stall at n in (fold-fp32-ceiling, loo-fp32-
        ceiling] must recover via "f16" (CPU-scale: ceilings monkeypatched
        below the toy n)."""
        from gpscore.fit import fit_gd_recovering
        from gpscore.fit import train as train_mod
        from gpscore.utils.precision import matmul_mode

        n = int(synth.train_x.shape[0])
        monkeypatch.setattr(train_mod, "_FP32_STORAGE_CEILING_N",
                            {"loo": 10 * n, "fold": n // 2})

        def bf16_only_stall(params, x, y, key=None):
            from gpscore.utils.precision import get_matmul_mode

            base = (params.log_signal_sq - 1.0) ** 2
            if get_matmul_mode() == "bf16":
                base = jnp.where(params.log_signal_sq > 0.55, jnp.nan, base)
            return base

        p = self._params0()
        with matmul_mode("bf16"):
            res, info = fit_gd_recovering(
                bf16_only_stall, p, synth.train_x, synth.train_y,
                iters=8, lr=0.25, rule="dss",
            )
        assert info["recovery"] == [
            {"mode": "f16", "iters": 6, "stall_after": 0}
        ]
        assert float(res.params.log_signal_sq) > 0.95

    def test_oom_on_high_recovery_leg_falls_to_f16(self, synth, monkeypatch):
        """A recovery leg that OOMs on-device must ladder down to "f16"
        and keep going, not crash the fit (round-4 VERDICT weak #2)."""
        from gpscore.fit import fit_gd_recovering
        from gpscore.fit import train as train_mod
        from gpscore.utils.precision import matmul_mode

        real_fit_gd = train_mod.fit_gd

        def fit_gd_high_ooms(loss_fn, params, *a, **kw):
            from gpscore.utils.precision import get_matmul_mode

            if get_matmul_mode() == "high":
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: Out of memory allocating ... "
                )
            return real_fit_gd(loss_fn, params, *a, **kw)

        monkeypatch.setattr(train_mod, "fit_gd", fit_gd_high_ooms)

        def bf16_only_stall(params, x, y, key=None):
            from gpscore.utils.precision import get_matmul_mode

            base = (params.log_signal_sq - 1.0) ** 2
            if get_matmul_mode() == "bf16":
                base = jnp.where(params.log_signal_sq > 0.55, jnp.nan, base)
            return base

        p = self._params0()
        with matmul_mode("bf16"):
            res, info = fit_gd_recovering(
                bf16_only_stall, p, synth.train_x, synth.train_y,
                iters=8, lr=0.25, verbose=False,
            )
        # ladder: bf16 stall -> "high" leg OOMs (recorded, iters 0) ->
        # forced "f16" leg completes the lost iterations
        assert info["recovery"][0]["mode"] == "high"
        assert info["recovery"][0]["iters"] == 0
        assert "RESOURCE_EXHAUSTED" in info["recovery"][0]["error"]
        assert info["recovery"][1] == {
            "mode": "f16", "iters": 6, "stall_after": 0
        }
        assert "unrecovered_iters" not in info
        assert float(res.params.log_signal_sq) > 0.95

    def test_oom_with_no_rung_left_returns_partial_fit(self, synth,
                                                       monkeypatch):
        """f16 stall -> "high" OOM -> nothing safer: the partial fit (last
        good params + unrecovered count) comes back instead of a crash."""
        from gpscore.fit import fit_gd_recovering
        from gpscore.fit import train as train_mod
        from gpscore.utils.precision import matmul_mode

        real_fit_gd = train_mod.fit_gd

        def fit_gd_high_ooms(loss_fn, params, *a, **kw):
            from gpscore.utils.precision import get_matmul_mode

            if get_matmul_mode() == "high":
                raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory")
            return real_fit_gd(loss_fn, params, *a, **kw)

        monkeypatch.setattr(train_mod, "fit_gd", fit_gd_high_ooms)
        p = self._params0()
        with matmul_mode("f16"):
            res, info = fit_gd_recovering(
                self._mode_sensitive_loss, p, synth.train_x, synth.train_y,
                iters=8, lr=0.25,
            )
        assert info["unrecovered_iters"] == 6
        assert info["recovery"][-1]["iters"] == 0
        # frozen at the last good parameters, like a plain stalled fit_gd
        np.testing.assert_allclose(
            float(res.params.log_signal_sq), 0.75, rtol=1e-6
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


class TestDispatchReachability:
    """Every make_objective dispatch arm executes at BOTH the small-n and the
    fused (>= _FUSED_LOO_MIN_N, monkeypatched) paths, and the two agree — the
    guard against dead-and-broken dispatch branches (round-3 VERDICT weak #1:
    an unreachable fused arm shipped with an undefined name)."""

    def _problem(self, n=64, d=2):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        y = jnp.asarray(np.sin(np.asarray(x).sum(1)).astype(np.float32))
        p = GPParams(jnp.float32(0.3), jnp.zeros(d), jnp.float32(-1.0))
        return x, y, p

    @pytest.mark.parametrize("kernel", ["ard", "rbf"])
    @pytest.mark.parametrize(
        "rule", ["crps", "logs", "interval", "nlml", "dss", "kc"]
    )
    def test_exact_fused_path_matches_small_n(self, monkeypatch, rule, kernel):
        import gpscore.fit.objectives as obj

        x, y, p = self._problem()
        if kernel == "rbf":
            p = p.replace(log_length=jnp.float32(0.0))
        loss = make_objective(rule, model="exact", kernel=kernel)
        want_v, want_g = jax.value_and_grad(loss)(p, x, y, None)
        monkeypatch.setattr(obj, "_FUSED_LOO_MIN_N", 1)
        got_v, got_g = jax.value_and_grad(loss)(p, x, y, None)
        np.testing.assert_allclose(float(got_v), float(want_v), rtol=2e-5)
        for a, b in zip(jax.tree.leaves(got_g), jax.tree.leaves(want_g)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-4, atol=2e-5
            )

    def test_exact_fused_es_path_finite(self, monkeypatch):
        # ES value parity across paths is draw-layout-dependent; exact
        # same-draw parity lives in test_fold_core. Here: the arm executes.
        import gpscore.fit.objectives as obj

        x, y, p = self._problem()
        monkeypatch.setattr(obj, "_FUSED_LOO_MIN_N", 1)
        loss = make_objective("es", model="exact", num_sim=16)
        v, g = jax.value_and_grad(loss)(p, x, y, jax.random.PRNGKey(0))
        assert np.isfinite(float(v))
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))

    @pytest.mark.parametrize(
        "rule", ["crps", "logs", "interval", "nlml", "dss", "kc", "es"]
    )
    def test_fitc_path_unaffected_by_threshold(self, monkeypatch, rule):
        # FITC has no fused arm: the threshold must not change its dispatch.
        import gpscore.fit.objectives as obj

        x, y, p = self._problem()
        p = p.replace(inducing=x[:6])
        key = jax.random.PRNGKey(0)
        loss = make_objective(rule, model="fitc", num_sim=16)
        want = float(loss(p, x, y, key))
        monkeypatch.setattr(obj, "_FUSED_LOO_MIN_N", 1)
        got = float(loss(p, x, y, key))
        assert np.isfinite(got)
        np.testing.assert_allclose(got, want, rtol=1e-6)
