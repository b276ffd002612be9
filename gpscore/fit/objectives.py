"""Differentiable training objectives: scoring rule ∘ predictive ∘ kernel.

Each objective is a pure function ``loss(params, x, y, key) -> scalar`` suitable for
``jax.value_and_grad`` + ``lax.scan`` (the reference hand-rolls a separate Python
training loop per objective per script; see SURVEY.md §2.5).

Rules:
- ``crps``  CRPS on the LOO predictive (the paper's core method,
            `SIMPLE-DATA FULL-comapre.py:204-213`)
- ``logs``  log score on the LOO predictive (`SIMPLE-DATA FULL-comapre.py:382-392`;
            FITC variant applies the reference's variance "correction",
            `KIN40K-COMPARE-ALL-FITC-20.py:441-446`)
- ``nlml``  negative log marginal likelihood (`SIMPLE-DATA FULL-comapre.py:289-296`)
- ``dss``   sum of Dawid–Sebastiani scores over k-fold block conditionals
            (`kin40k-FULL-compare.py:497-538`)
- ``es``    sum of Monte-Carlo energy scores over k-fold blocks (needs a PRNG key;
            `kin40k-FULL-compare.py:616-657`)
- ``kc``    sum of per-fold CRPS on block-conditional diagonals
            (`KIN40K-COMPARE-ALL-FITC-20.py:667-714`)
- ``interval`` mean interval score on the LOO predictive (BASELINE.json addition)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from gpscore.models import exact as exact_mod
from gpscore.models import fitc as fitc_mod
from gpscore.ops import linalg
from gpscore.ops.kernels import gram
from gpscore.scoring import rules

OBJECTIVE_RULES = ("crps", "logs", "nlml", "dss", "es", "kc", "interval")

# Above this n, exact-model LOO objectives use the fused Gram+solve core
# (gpscore.ops.loo_fused): identical math, ~2 n^2 peak HBM instead of ~4 n^2.
_FUSED_LOO_MIN_N = 8192

# Kernels the fused ARD cores cover: ARD natively; the isotropic rbf as the
# shared-lengthscale special case (see _fused_params).
_FUSED_KERNELS = ("ard", "rbf")


def _fused_params(params, kernel: str, d: int):
    """Parameters as the fused ARD cores expect them.

    The isotropic ``rbf`` divides the *squared* distance by ``exp(b)``
    (gpscore.ops.kernels.rbf_gram; reference `SIMPLE-DATA FULL-comapre.py:8-21`)
    while ``ard`` divides the inputs per-dimension by ``exp(b')``
    (`:24-40`), so rbf == ARD with shared ``b' = b/2`` broadcast over the d
    input dimensions. ``broadcast_to`` is differentiable: its transpose sums
    the per-dimension length cotangents back into the scalar, so the fused
    cores' custom VJPs serve both kernels unchanged.
    """
    if kernel == "ard":
        return params
    return params.replace(
        log_length=jnp.broadcast_to(0.5 * params.log_length, (d,))
    )


def make_objective(
    rule: str,
    model: str = "exact",
    kernel: str = "ard",
    fold_k: int = 4,
    num_sim: int = 300,
    es_beta: float = 1.0,
    interval_alpha: float = 0.05,
) -> Callable:
    """Build ``loss(params, x, y, key) -> scalar``.

    ``key`` is consumed only by the ``es`` rule but always accepted, so every
    objective has an identical signature for scan/vmap composition.
    """
    if rule not in OBJECTIVE_RULES:
        raise ValueError(f"unknown rule {rule!r}; expected one of {OBJECTIVE_RULES}")
    if model not in ("exact", "fitc"):
        raise ValueError(f"unknown model {model!r}")

    def _loo(params, x, y):
        if model == "exact":
            if kernel in _FUSED_KERNELS and x.shape[0] >= _FUSED_LOO_MIN_N:
                return exact_mod.loo_exact_fused(
                    x, y, _fused_params(params, kernel, x.shape[1])
                )
            k_ff = gram(x, x, params.log_signal_sq, params.log_length, kind=kernel)
            return exact_mod.loo_exact(k_ff, y, params.noise_sq)
        return fitc_mod.loo_fitc(
            x, y, params, kind=kernel, variance_correction=(rule == "logs")
        )

    def _kfold_precision(params, x, y):
        # Precision form: DSS/ES/kc only need log-dets, quadratic forms, samples,
        # or the covariance diagonal, so the per-fold O(nb^3) inversion +
        # re-factorization of the covariance path is skipped entirely. For FITC
        # the fold precision is diagonal-minus-low-rank, dropping fold costs to
        # O(nb m + m^3) (kfold_fitc_lowrank). Exact-model large n never reaches
        # here: every fold rule returns through _use_fold_stats first (the
        # fused core + closed-form-adjoint consumer).
        if model == "exact":
            k_ff = gram(x, x, params.log_signal_sq, params.log_length, kind=kernel)
            return exact_mod.kfold_exact_precision(k_ff, y, params.noise_sq, fold_k)
        return fitc_mod.kfold_fitc_lowrank(x, y, params, fold_k, kind=kernel)

    def _use_fold_stats(x):
        # Large-n exact path: the fold-STREAMED fused primitives
        # (gpscore.ops.fold_stream) — nothing in the fold chain left to
        # autodiff and no [fold_k, nb, nb] stack at any point, so a
        # value_and_grad peaks at ~n^2 + 1-3 (n/fold_k)^2 and the fold-rule
        # ceiling tracks the LOO family's (RESULTS.md ceiling tables).
        return (
            model == "exact"
            and kernel in _FUSED_KERNELS
            and x.shape[0] >= _FUSED_LOO_MIN_N
        )

    def _fold_stats(params, x, y, want_inv_diag=False):
        # dss/kc only: ES routes through kfold_es_fused (fold-streamed
        # sampler inside the same primitive family).
        return exact_mod.kfold_stats_fused(
            x, y, _fused_params(params, kernel, x.shape[1]), fold_k,
            want_inv_diag,
        )

    if rule == "crps":

        def loss(params, x, y, key=None):
            p = _loo(params, x, y)
            return rules.crps_gaussian(p.mean, p.cov, y)

    elif rule == "logs":

        def loss(params, x, y, key=None):
            p = _loo(params, x, y)
            return rules.logs_gaussian(p.mean, p.cov, y)

    elif rule == "interval":

        def loss(params, x, y, key=None):
            p = _loo(params, x, y)
            return rules.interval_score(p.mean, p.cov, y, alpha=interval_alpha)

    elif rule == "nlml":

        def loss(params, x, y, key=None):
            if model == "exact":
                if kernel in _FUSED_KERNELS and x.shape[0] >= _FUSED_LOO_MIN_N:
                    return exact_mod.nlml_exact_fused(
                        x, y, _fused_params(params, kernel, x.shape[1])
                    )
                k_ff = gram(x, x, params.log_signal_sq, params.log_length, kind=kernel)
                return exact_mod.nlml_exact(k_ff, y, params.noise_sq)
            return fitc_mod.nlml_fitc(x, y, params, kind=kernel)

    elif rule == "dss":

        def loss(params, x, y, key=None):
            if _use_fold_stats(x):
                # DSS_b = nb/2 log 2pi - hld_b + 1/2 e_b^T a_b  (r_b = e_b and
                # the quadratic r^T A r collapses to e^T a since A e = a).
                stats, a_b, _ = _fold_stats(params, x, y)
                nb = a_b.shape[1]
                return (
                    0.5 * fold_k * nb * jnp.log(2.0 * jnp.pi)
                    - jnp.sum(stats.half_logdet)
                    + 0.5 * jnp.sum(stats.e * a_b)
                )
            p = _kfold_precision(params, x, y)
            y_b = y.reshape(p.mean.shape)
            nb = y_b.shape[1]
            if model == "exact":
                per_fold = jax.vmap(rules.dss_precision)(p.mean, p.chol_prec, y_b)
                return jnp.sum(per_fold)
            r = y_b - p.mean
            per_fold = (
                0.5 * nb * jnp.log(2.0 * jnp.pi)
                + 0.5 * fitc_mod.lowrank_fold_logdet_cov(p)
                + 0.5 * fitc_mod.lowrank_fold_quad(p, r)
            )
            return jnp.sum(per_fold)

    elif rule == "es":

        def loss(params, x, y, key):
            if _use_fold_stats(x):
                # Fold-streamed sampler: eps regenerated per fold from
                # counter keys inside the custom-VJP consumer — no
                # [fold_k, nb, 2S] sample stack exists at any point
                # (gpscore.ops.fold_core.fold_es_score).
                return exact_mod.kfold_es_fused(
                    x, y, _fused_params(params, kernel, x.shape[1]),
                    fold_k, key, num_sim, es_beta,
                )
            p = _kfold_precision(params, x, y)
            y_b = y.reshape(p.mean.shape)
            if model == "exact":
                keys = jax.random.split(key, p.mean.shape[0])
                per_fold = jax.vmap(
                    lambda k, m, La, yy: rules.energy_score_precision(
                        k, m, La, yy, num_sim=num_sim, beta=es_beta
                    )
                )(keys, p.mean, p.chol_prec, y_b)
                return jnp.sum(per_fold)
            k_z, k_zp = jax.random.split(key)
            z = fitc_mod.lowrank_fold_sample(k_z, p, num_sim)
            zp = fitc_mod.lowrank_fold_sample(k_zp, p, num_sim)
            r = p.mean - y_b
            per_fold = jax.vmap(
                lambda zz, zzp, rr: rules.energy_score_core(
                    zz, zzp, rr, num_sim, es_beta
                )
            )(z, zp, r)
            return jnp.sum(per_fold)

    elif rule == "kc":

        def loss(params, x, y, key=None):
            if _use_fold_stats(x):
                stats, _, y_b = _fold_stats(params, x, y, want_inv_diag=True)
                return rules.crps_kfold(y_b - stats.e, stats.inv_diag, y_b)
            p = _kfold_precision(params, x, y)
            y_b = y.reshape(p.mean.shape)
            if model == "exact":
                # var = diag(A^-1) straight from the factor, no inverse materialized
                var_b = jax.vmap(linalg.inv_diag_from_chol)(p.chol_prec)
            else:
                var_b = fitc_mod.lowrank_fold_cov_diag(p)
            return rules.crps_kfold(p.mean, var_b, y_b)

    loss.__name__ = f"{rule}_{model}_objective"
    return loss
