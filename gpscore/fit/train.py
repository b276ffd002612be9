"""Training loops: scan-compiled full-batch gradient descent (+ optax option).

The reference hand-rolls per-objective Python loops of
``loss.backward(); p -= lr * p.grad`` (`SIMPLE-DATA FULL-comapre.py:204-228`). Here
one ``jax.lax.scan`` over ``value_and_grad`` replaces all of them: the whole fit is
a single XLA program (one compile, zero host round-trips per iteration), and is
vmappable over restarts/replicates and shardable over a device mesh
(gpscore.parallel).

Fault tolerance: instead of the reference's ``try/except RuntimeError -> record
zeros`` (`kin40k-FULL-compare.py:726-732`), non-finite losses/grads skip the update
for that iteration (vmap-safe masking), so a transient Cholesky failure does not
destroy the run.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from gpscore.utils.params import GPParams


class FitResult(NamedTuple):
    params: GPParams
    loss_history: jnp.ndarray  # [iters]
    ok: jnp.ndarray  # scalar bool: True if any iteration produced a finite loss
    param_history: Optional[GPParams] = None  # [iters, ...]-leaved, if recorded
    # Trailing consecutive iterations whose update was SKIPPED (non-finite
    # loss/grad probe): > 0 means the fit ended frozen at its last good
    # parameters — the 2-byte-storage conditioning stall signature
    # (gpscore/utils/precision.py mode notes). 0 on a healthy fit.
    stall_iters: Optional[jnp.ndarray] = None


def max_reduce(xs):
    """Elementwise-maximum fold of a nonempty list of scalars (NaN-propagating)."""
    out = xs[0]
    for x in xs[1:]:
        out = jnp.maximum(out, x)
    return out


def _apply_update(params: GPParams, grads: GPParams, lr, lr_inducing):
    """SGD step with a separate inducing-point learning rate (the reference's
    ``learning_rate2``, `SIMPLE-FITC--comapre.py:318-319`)."""

    def upd(p, g, rate):
        return p - rate * g

    new = GPParams(
        log_signal_sq=upd(params.log_signal_sq, grads.log_signal_sq, lr),
        log_length=upd(params.log_length, grads.log_length, lr),
        log_noise_sq=upd(params.log_noise_sq, grads.log_noise_sq, lr),
        inducing=(
            None
            if params.inducing is None
            else upd(params.inducing, grads.inducing, lr_inducing)
        ),
    )
    return new


def fit_gd(
    loss_fn,
    params: GPParams,
    x,
    y,
    iters: int,
    lr: float,
    lr_inducing: Optional[float] = None,
    key: Optional[jax.Array] = None,
    skip_nonfinite: bool = True,
    record_params: bool = False,
) -> FitResult:
    """Full-batch gradient descent, compiled as one lax.scan.

    ``key`` feeds stochastic objectives (energy score); split per iteration, which
    mirrors the reference drawing fresh ``torch.randn`` every step.

    ``record_params=True`` additionally returns the per-iteration parameter
    trajectory as a ``[iters]``-leading pytree — the reference's
    ``length_series``/``noise_series``/``k_series`` trace arrays
    (`SIMPLE-DATA FULL-comapre.py:193-197`), carried through the scan instead of
    appended host-side. ``param_history[i]`` is the *evaluation point* of
    ``loss_history[i]`` (pre-update, like the reference's traces), so
    ``param_history[0]`` is the initial parameters; the post-update final
    parameters are ``result.params``.
    """
    if lr_inducing is None:
        lr_inducing = lr
    if key is None:
        key = jax.random.PRNGKey(0)
    vg = jax.value_and_grad(loss_fn)

    def step(carry, i):
        p, stall = carry
        k = jax.random.fold_in(key, i)
        loss, grads = vg(p, x, y, k)
        new_p = _apply_update(p, grads, lr, lr_inducing)
        # One scalar probe instead of per-leaf all(isfinite(...)) reductions:
        # max(|.|) propagates NaN and surfaces Inf, and — unlike a sum probe —
        # cannot overflow on large-magnitude finite gradients, which would
        # silently skip every update while reporting ok=True.
        probe = jnp.maximum(
            jnp.abs(loss),
            max_reduce([jnp.max(jnp.abs(g)) for g in jax.tree.leaves(grads)]),
        )
        finite = jnp.isfinite(probe)
        # Trailing-stall counter: consecutive skipped updates ending at the
        # last iteration (a mid-fit conditioning crossover freezes every
        # subsequent iteration, so the trailing run length = iterations lost).
        stall = jnp.where(finite, 0, stall + 1)
        if skip_nonfinite:
            p = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old), new_p, p
            )
        else:
            p = new_p
        # Record the evaluation point (pre-update), aligned with `loss`.
        out = (carry[0], loss) if record_params else loss
        return (p, stall), out

    (final, stall), outs = jax.lax.scan(
        step, (params, jnp.zeros((), jnp.int32)), jnp.arange(iters)
    )
    if record_params:
        history, losses = outs
    else:
        history, losses = None, outs
    ok = jnp.any(jnp.isfinite(losses))
    return FitResult(final, losses, ok, history, stall)


# Measured single-chip fp32-storage objective ceilings (RESULTS.md ceiling
# tables), per objective family: below these n the fp32-storage "high" mode
# fits in HBM and is the preferred recovery target; above them only another
# 2-byte mode can run. The fold family (dss/es/kc 4-fold) carries one-two
# per-fold [n/4, n/4] transients next to the n^2 buffer (a structural
# n^2 + (n/4)^2 >= HBM floor at 61,440 fp32 — fold_stream module
# docstring), so its fp32 bound sits just below the LOO family's.
_FP32_STORAGE_CEILING_N = {
    "loo": 61_440,   # crps/logs/interval/nlml, measured at b=1024
    "fold": 59_392,  # min over dss/kc (60,416) and es (59,392) — round 5
}

# Objective families for the recovery ladder (matches the dispatch split in
# gpscore/fit/objectives.py: LOO/NLML cores vs the k-fold streamed cores).
_FOLD_RULES = ("dss", "es", "kc")


def objective_family(rule: Optional[str]) -> str:
    """"fold" for the k-fold rules (dss/es/kc), "loo" otherwise (incl. None)."""
    return "fold" if rule in _FOLD_RULES else "loo"


def auto_recover_mode(mode: str, n: int, family: str = "loo") -> Optional[str]:
    """The automatic fallback mode for a stalled 2-byte fit at size ``n``.

    The stall (gpscore/utils/precision.py mode notes): mid-descent the learned
    lengthscales grow, kappa(K_hat) crosses the storage mode's n*u*kappa
    onset, the factorization NaNs, and NaN-masked updates freeze the
    parameters. Recovery = re-run the lost iterations under a
    better-conditioned mode: "high" (fp32 storage, ~2x fp32 rate) when the
    n^2 fp32 buffers still fit on-chip, else "f16" (8x finer mantissa than
    bf16 at half memory). Returns None when nothing safer exists (an "f16"
    stall beyond the fp32 ceiling — the one case left to the caller).

    ``family`` selects the fp32 ceiling: the fold rules (dss/es/kc) OOM in
    fp32 storage well below the LOO rules' 61,440 (RESULTS.md per-rule fold
    ceilings), so a stalled 2-byte fold fit in the gap must fall to "f16",
    not "high" (which would trade a stall for an OOM).
    """
    ceiling = _FP32_STORAGE_CEILING_N.get(family, _FP32_STORAGE_CEILING_N["loo"])
    if mode == "bf16":
        return "high" if n <= ceiling else "f16"
    if mode == "f16":
        return "high" if n <= ceiling else None
    return None


def fit_gd_recovering(
    loss_fn,
    params: GPParams,
    x,
    y,
    iters: int,
    lr: float,
    lr_inducing: Optional[float] = None,
    key: Optional[jax.Array] = None,
    recover_mode: str = "auto",
    segment_iters: Optional[int] = None,
    verbose: bool = False,
    rule: Optional[str] = None,
):
    """:func:`fit_gd` with automatic recovery from 2-byte conditioning stalls.

    Host-controlled (NOT jit/vmap-safe): runs the fit under the ambient
    matmul mode, reads back :attr:`FitResult.stall_iters`, and — when the fit
    ended frozen — re-runs exactly the lost iterations under a
    better-conditioned mode (:func:`auto_recover_mode` ladder, or an explicit
    ``recover_mode``), continuing from the last good parameters. Replaces the
    manual fit-then-polish recipe (``experiments/large_n.py --polish-iters``)
    with detection + automatic fallback; the recovery legs retrace because
    the precision mode is part of the jit cache key
    (gpscore/utils/precision.py).

    ``segment_iters`` host-chunks every leg (remote-tunnel transports kill
    multi-minute device programs; CLAUDE.md). Returns ``(FitResult, info)``
    where ``info`` records per-segment wall times and the recovery trail;
    the FitResult's loss_history is the stitched full-schedule history.

    ``rule`` (objective name, e.g. "dss") selects the fp32 ceiling the auto
    ladder uses (:func:`objective_family`): the fold rules' fp32-storage
    ceilings sit below the LOO rules' (RESULTS.md), so their ladder falls
    to "f16" earlier. Additionally, a recovery leg that OOMs on-device
    (``RuntimeError``/``XlaRuntimeError`` — the measured ceilings are
    per-rule and per-block, an out-of-table configuration can still exceed
    HBM) is caught and laddered one more rung to "f16" instead of crashing
    the multi-hour fit; the failed leg is recorded in ``info["recovery"]``
    with ``iters: 0`` and the error's first line.

    Reference analogue: the try/except -> record-zeros crash handling this
    framework replaces (`kin40k-FULL-compare.py:726-732`).
    """
    import time

    import numpy as np

    from gpscore.utils.precision import get_matmul_mode, matmul_mode

    if key is None:
        key = jax.random.PRNGKey(0)
    n = x.shape[0]

    def run_leg(p, total, mode, salt):
        """One host-chunked fit leg under ``mode``; returns the cumulative
        TRAILING stall across its segments (a frozen fit stays frozen, so a
        fully-stalled segment extends the run; any finite iteration resets
        it to that segment's own trailing count)."""
        seg = total if not segment_iters else max(1, min(segment_iters, total))
        sizes = [seg] * (total // seg)
        if total % seg:
            sizes.append(total % seg)
        fns = {}
        losses = []
        segments = []
        stall = 0
        with matmul_mode(mode):
            for s, it in enumerate(sizes):
                fn = fns.setdefault(it, jax.jit(
                    lambda p_, k_, _it=it: fit_gd(
                        loss_fn, p_, x, y, iters=_it, lr=lr,
                        lr_inducing=lr_inducing, key=k_)
                ))
                t0 = time.time()
                res = fn(p, jax.random.fold_in(key, salt + s))
                p = res.params
                seg_losses = np.asarray(res.loss_history)  # readback
                losses.append(seg_losses)
                seg_stall = int(res.stall_iters)
                stall = stall + it if seg_stall == it else seg_stall
                segments.append(
                    {"iters": it, "mode": mode,
                     "wall_s": round(time.time() - t0, 3)}
                )
        return p, np.concatenate(losses), stall, segments

    family = objective_family(rule)
    mode = get_matmul_mode()
    p, losses, stall, segments = run_leg(params, iters, mode, 0)
    info = {"mode": mode, "stall_iters": int(stall), "segments": segments,
            "recovery": []}
    salt = 10_000
    tried = {mode}  # modes that have already stalled (or OOM'd) at this n
    forced = None  # OOM fallback rung overriding the conditioning ladder
    while stall > 0:
        if forced is not None:
            nxt, forced = forced, None
        else:
            nxt = (auto_recover_mode(mode, n, family)
                   if recover_mode == "auto" else recover_mode)
        if nxt is None or nxt in tried:
            info["unrecovered_iters"] = int(stall)
            break
        if verbose:
            print(f"[fit_gd_recovering] {stall} stalled iteration(s) under "
                  f"{mode!r}; re-running under {nxt!r}", flush=True)
        try:
            p2, rl, stall2, rsegs = run_leg(p, stall, nxt, salt)
        except RuntimeError as e:  # XlaRuntimeError (device OOM) included
            # The recovery leg itself did not fit on-chip (the measured
            # fp32 ceilings are per-rule/per-block — an out-of-table n can
            # still exceed HBM). Fall one more rung to 2-byte "f16" unless
            # f16 is what stalled in the first place.
            info["recovery"].append(
                {"mode": nxt, "iters": 0,
                 "error": str(e).splitlines()[0][:200]})
            tried.add(nxt)
            salt += 10_000
            if (recover_mode == "auto" and nxt == "high"
                    and "f16" not in tried):
                if verbose:
                    print(f"[fit_gd_recovering] {nxt!r} recovery leg "
                          f"failed ({type(e).__name__}); falling to 'f16'",
                          flush=True)
                forced = "f16"
                continue
            # No safer rung left: return the partial fit (last good params
            # + stall count) rather than losing the whole run. The FIRST
            # leg is outside this try, so a genuinely broken configuration
            # still raises before any work is discarded.
            info["unrecovered_iters"] = int(stall)
            break
        mode = nxt
        p, stall = p2, stall2
        # Replace the frozen tail (NaN losses at frozen params) with the
        # recovered iterations — the stitched history is the real trajectory.
        losses = np.concatenate([losses[: len(losses) - len(rl)], rl])
        info["recovery"].append({"mode": mode, "iters": len(rl),
                                 "stall_after": int(stall)})
        info["segments"].extend(rsegs)
        salt += 10_000
        if stall > 0:
            tried.add(mode)
        if recover_mode != "auto":
            if stall > 0:
                info["unrecovered_iters"] = int(stall)
            break
    losses = jnp.asarray(losses)
    result = FitResult(p, losses, jnp.any(jnp.isfinite(losses)),
                       None, jnp.asarray(stall, jnp.int32))
    return result, info


def fit_optax(
    loss_fn,
    params: GPParams,
    x,
    y,
    iters: int,
    optimizer: Any,
    key: Optional[jax.Array] = None,
) -> FitResult:
    """Opt-in optax loop (Adam etc.) — capability beyond the reference's plain GD."""
    import optax

    if key is None:
        key = jax.random.PRNGKey(0)
    vg = jax.value_and_grad(loss_fn)
    opt_state = optimizer.init(params)

    def step(carry, i):
        p, s = carry
        k = jax.random.fold_in(key, i)
        loss, grads = vg(p, x, y, k)
        updates, s = optimizer.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (final, _), losses = jax.lax.scan(step, (params, opt_state), jnp.arange(iters))
    return FitResult(final, losses, jnp.any(jnp.isfinite(losses)))
