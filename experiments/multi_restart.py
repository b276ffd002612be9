"""Batched multi-restart sweep: vmapped inits, sharded over the mesh batch axis.

BASELINE.json configs[4] ("vmapped multi-restart optimization over scoring rules
x inits x inducing counts ... on one pod slice"): for each requested
(rule, inducing count), R random restarts fit as ONE vmapped XLA program
(sharded over the mesh 'batch' axis when more than one device is present), then
the best restart is selected by final training loss and evaluated on the test
set. Inducing counts change array shapes, so each count is its own compiled
program; restarts and rules-within-a-count share compilations. The reference
has no restarts at all — one init per replicate, serially
(`kin40k-FULL-compare.py:190,226-233`).

Usage: python experiments/multi_restart.py [--restarts 16] [--rules crps nlml]
       [--model fitc] [--num-inducing 5 10 20] [--out results.json]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from experiments.common import save_results
from gpscore.data import kin40k_replicate_split, load_kin40k
from gpscore.fit import make_objective
from gpscore.fit.schedules import SCHEDULES, rules_for
from gpscore.metrics import evaluate_predictive
from gpscore.models import exact_predictive
from gpscore.models.fitc import fitc_predictive
from gpscore.ops.kernels import gram
from gpscore.parallel import make_mesh, restart_sweep, sharded_restart_sweep
from gpscore.utils.params import GPParams


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--restarts", type=int, default=16)
    ap.add_argument("--rules", nargs="+", default=["crps", "nlml"],
                    choices=rules_for("kin40k_fitc"))
    ap.add_argument("--model", choices=["exact", "fitc"], default="fitc")
    ap.add_argument("--num-inducing", type=int, nargs="+", default=[20],
                    help="FITC inducing counts to sweep (one compiled "
                         "program per count; ignored for --model exact)")
    ap.add_argument("--data", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    data = load_kin40k(args.data)
    s = kin40k_replicate_split(data, 0)
    x, y, sx, sy = s.train_x, s.train_y, s.test_x, s.test_y
    d = x.shape[1]
    R = args.restarts

    keys = jax.random.split(jax.random.PRNGKey(0), R)

    def init_batch(num_inducing):
        def init_one(k):
            k_l, k_k, k_n, k_u = jax.random.split(k, 4)
            return GPParams(
                log_signal_sq=jax.random.uniform(k_k, ()),
                log_length=jax.random.uniform(k_l, (d,)),
                log_noise_sq=jax.random.uniform(k_n, ()),
                inducing=(
                    jax.random.uniform(k_u, (num_inducing, d))
                    if args.model == "fitc"
                    else None
                ),
            )

        return jax.vmap(init_one)(keys)

    mesh = make_mesh() if len(jax.devices()) > 1 else None
    inducing_counts = args.num_inducing if args.model == "fitc" else [0]

    results = {}
    for m in inducing_counts:
        params_batch = init_batch(m)
        for rule in args.rules:
            sched = SCHEDULES[("kin40k_fitc", rule)]
            loss = make_objective(rule, model=args.model)
            if mesh is not None:
                res = sharded_restart_sweep(
                    loss, params_batch, x, y, iters=sched.iters, lr=sched.lr,
                    mesh=mesh, lr_inducing=sched.lr_inducing,
                )
            else:
                res = jax.jit(
                    lambda pb, loss=loss, sched=sched: restart_sweep(
                        loss, pb, x, y, iters=sched.iters, lr=sched.lr,
                        lr_inducing=sched.lr_inducing,
                    )
                )(params_batch)
            final_losses = np.asarray(res.loss_history[:, -1])
            # NaN-failed restarts rank last
            ranked = np.where(np.isfinite(final_losses), final_losses, np.inf)
            best = int(ranked.argmin())
            best_params = jax.tree.map(lambda a: a[best], res.params)
            if args.model == "exact":
                k_ff = gram(x, x, best_params.log_signal_sq, best_params.log_length)
                k_sf = gram(sx, x, best_params.log_signal_sq, best_params.log_length)
                k_ss = gram(sx, sx, best_params.log_signal_sq, best_params.log_length)
                pred = exact_predictive(k_sf, k_ff, k_ss, y, best_params.noise_sq)
            else:
                pred = fitc_predictive(x, y, sx, best_params)
            metrics = evaluate_predictive(pred.mean, jnp.diagonal(pred.cov), sy, y)
            out = {f: float(getattr(metrics, f)) for f in metrics._fields}
            out.update(
                best_restart=best,
                best_final_loss=float(final_losses[best]),
                worst_final_loss=float(np.nanmax(final_losses)),
                num_restarts=R,
                num_failed=int((~np.isfinite(final_losses)).sum()),
            )
            tag = f"{rule}_m{m}" if args.model == "fitc" else rule
            results[tag] = out
            print(f"[{tag}] best restart {best}: {out}", flush=True)
    save_results(results, args.out)
    return results


if __name__ == "__main__":
    main()
