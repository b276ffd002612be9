"""Headline benchmark: KIN40K FITC-20 fit, ALL five scoring rules, one replicate.

This is the BASELINE.json north-star workload: "full KIN40K FITC scoring-rule fit
(all rules, 20 inducing points) in <60 s" — n_train=500, d=8, m=20, reference
iteration counts (CRPS 2000, NLML/logs/DSS/kc 3000 each = 14,000 GD iterations
total, `KIN40K-COMPARE-ALL-FITC-20.py:207,315,417,523,655`).

Prints ONE JSON line:
  {"metric": ..., "value": <fit wall-clock seconds>, "unit": "s",
   "vs_baseline": <60 / value>}

Compilation is excluded (AOT-compiled before timing); the measured quantity is the
steady-state fit wall-clock the <60 s target describes.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gpscore.data import kin40k_replicate_split, load_kin40k
from gpscore.fit import fit_gd, make_objective
from gpscore.fit.schedules import SCHEDULES
from gpscore.utils.params import GPParams


def sync(res):
    """Host-readback barrier. block_until_ready is not a reliable completion
    barrier through remote-tunnel TPU backends (it can return before execution
    — and before deferred remote compilation — finishes); pulling a scalar to
    host is."""
    np.asarray(jax.device_get(res.loss_history[-1]))

BASELINE_S = 60.0
RULES = ["crps", "nlml", "logs", "dss", "kc"]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    data = load_kin40k()
    s = kin40k_replicate_split(data, 0)
    x, y = s.train_x, s.train_y
    d = x.shape[1]
    key = jax.random.PRNGKey(0)
    k_l, k_u = jax.random.split(key)
    params0 = GPParams(
        log_signal_sq=jnp.ones(()),
        log_length=jax.random.uniform(k_l, (d,)),
        log_noise_sq=jnp.ones(()),
        inducing=jax.random.uniform(k_u, (20, d)),
    )

    # ONE program running all five fits back-to-back: the tunnel serializes
    # dispatches (async dispatch measured no faster than sync), so five
    # separate programs pay five dispatch+readback round trips (~36 ms each,
    # transport-weather dependent — the r1->r2 0.812->0.855 s "regression"
    # was exactly this) inside the timed window. Fusing makes the timed
    # quantity the device-side fit work plus a single round trip.
    losses = {rule: make_objective(rule, model="fitc") for rule in RULES}

    def fit_all(params, x, y, k):
        out = {}
        for rule in RULES:
            sched = SCHEDULES[("kin40k_fitc", rule)]
            out[rule] = fit_gd(
                losses[rule], params, x, y,
                iters=sched.iters, lr=sched.lr,
                lr_inducing=sched.lr_inducing, key=k,
            )
        return out

    t_compile0 = time.time()
    fn = jax.jit(fit_all).lower(params0, x, y, key).compile()
    log(f"lower+compile dispatch: {time.time() - t_compile0:.1f}s")

    # Warmup pass: .compile() above may defer the actual (remote) compilation to
    # first execution; run each program once with a readback barrier so the timed
    # section below measures steady-state fit only. Warmup inputs are perturbed —
    # remote-tunnel backends may cache results keyed on (program, inputs), and an
    # identical warmup call would let the timed call return a cached result.
    warm_params = jax.tree.map(lambda a: a + 0.0625, params0)
    t_warm0 = time.time()
    sync(fn(warm_params, x, y, key)[RULES[-1]])
    log(f"warmup (incl. deferred compile): {time.time() - t_warm0:.1f}s")

    t0 = time.time()
    out = fn(params0, x, y, key)
    sync(out[RULES[-1]])
    elapsed = time.time() - t0
    for rule in RULES:
        iters = SCHEDULES[("kin40k_fitc", rule)].iters
        log(f"  {rule}: {iters} iters, final loss "
            f"{float(out[rule].loss_history[-1]):.5f}")
    log(f"fit wall-clock: {elapsed:.2f}s on {jax.devices()[0].platform}")

    print(
        json.dumps(
            {
                "metric": "kin40k_fitc20_all_rules_fit_wall_clock",
                "value": round(elapsed, 3),
                "unit": "s",
                "vs_baseline": round(BASELINE_S / elapsed, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
