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
        p = carry
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
        if skip_nonfinite:
            p = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old), new_p, p
            )
        else:
            p = new_p
        # Record the evaluation point (pre-update), aligned with `loss`.
        out = (carry, loss) if record_params else loss
        return p, out

    final, outs = jax.lax.scan(step, params, jnp.arange(iters))
    if record_params:
        history, losses = outs
    else:
        history, losses = None, outs
    ok = jnp.any(jnp.isfinite(losses))
    return FitResult(final, losses, ok, history)


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
