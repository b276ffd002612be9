"""KIN40K FITC-20 all-rules comparison: CRPS / NLML / logs / DSS / kc.

Reproduces `KIN40K-COMPARE-ALL-FITC-20.py`: 10 replicates, n_train=500, 20 learned
inducing points (uniform init, `:215`; normal init for DSS, `:531`), schedules per
SURVEY.md §2.5. This is the BASELINE.json north-star workload (<60 s all rules).

Usage: python experiments/kin40k_fitc.py [--replicates 10] [--data kin40k.npz]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from experiments.common import run_sweep, save_results
from gpscore.data import kin40k_replicate_split, load_kin40k
from gpscore.fit.schedules import SCHEDULES, rules_for
from gpscore.utils.params import GPParams


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicates", type=int, default=10)
    ap.add_argument("--rules", nargs="+", default=["crps", "nlml", "logs", "dss", "kc"],
                    choices=rules_for("kin40k_fitc"))
    ap.add_argument("--num-inducing", type=int, default=20)
    ap.add_argument("--n-train", type=int, default=500,
                    help="per-replicate train rows (reference: 500; FITC is "
                         "O(n m^2) so the full 9700-row pool is cheap — must "
                         "be divisible by 4 for the fold objectives)")
    ap.add_argument("--n-test", type=int, default=500)
    ap.add_argument("--segment-iters", type=int, default=None,
                    help="host-chunk each fit into segments of at most this "
                         "many GD iterations (full-pool sweeps are "
                         "multi-minute programs, which the remote TPU "
                         "tunnel kills; 500 is safe at n=9700)")
    ap.add_argument("--lr-scale", type=float, default=1.0,
                    help="multiply schedule learning rates. The reference "
                         "lrs are tuned at n=500; NLML/DSS are per-sum "
                         "objectives whose gradients scale with n, so at "
                         "--n-train N use ~500/N for them (same documented "
                         "deviation as kin40k_full.py)")
    ap.add_argument("--data", default=None)
    ap.add_argument("--matmul", default="highest",
                    choices=["highest", "high", "fast", "bf16", "f16"],
                    help="contraction precision for the fits "
                         "(gpscore.utils.precision.set_matmul_mode)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--save-params", default=None,
                    help="directory for fitted-parameter checkpoints")
    ap.add_argument("--iters-scale", type=float, default=1.0,
                    help="scale schedule iteration counts (quick runs)")
    args = ap.parse_args(argv)

    data = load_kin40k(args.data)
    m = args.num_inducing
    if args.n_train % 4 != 0 and any(r in ("dss", "kc") for r in args.rules):
        ap.error(f"--n-train {args.n_train} must be divisible by fold_k=4 "
                 "for the dss/kc objectives")

    def make_data(j):
        s = kin40k_replicate_split(
            data, j, n_subsample=args.n_train, n_test=args.n_test
        )
        return s.train_x, s.train_y, s.test_x, s.test_y

    def make_params(key, d, rule):
        # Per-section inits: random para_l + unit scalars everywhere
        # (`KIN40K-COMPARE-ALL-FITC-20.py:211-215`); inducing_x ~ U(0,1)
        # except the DSS section's standard-normal draw (`:531`).
        k_l, k_u = jax.random.split(key)
        inducing_init = jax.random.normal if rule == "dss" else jax.random.uniform
        return GPParams(
            log_signal_sq=jnp.ones(()),
            log_length=jax.random.uniform(k_l, (d,)),
            log_noise_sq=jnp.ones(()),
            inducing=inducing_init(k_u, (m, d)),
        )

    schedules = {}
    for r in args.rules:
        s = SCHEDULES[("kin40k_fitc", r)]
        if args.iters_scale != 1.0 or args.lr_scale != 1.0:
            s = type(s)(s.rule, max(1, int(s.iters * args.iters_scale)),
                        s.lr * args.lr_scale,
                        None if s.lr_inducing is None
                        else s.lr_inducing * args.lr_scale)
        schedules[r] = s

    results = run_sweep(
        args.rules, "fitc", schedules, make_data, make_params,
        replicates=args.replicates, d=8,
        save_params_dir=args.save_params,
        segment_iters=args.segment_iters,
        matmul=args.matmul,
    )
    save_results(results, args.out)
    return results


if __name__ == "__main__":
    main()
