"""KIN40K full-GP comparison: CRPS / NLML / logs / DSS(4-fold) / ES(4-fold).

Reproduces `kin40k-FULL-compare.py`: 30 replicates, n_train=500 subsampled per the
reference protocol, ARD kernel over the 8-d inputs, random para_l init + unit
scalars for the non-CRPS sections (`kin40k-FULL-compare.py:226-233, 321-324`).

Usage: python experiments/kin40k_full.py [--replicates 30] [--data kin40k.npz]
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
    ap.add_argument("--replicates", type=int, default=30)
    ap.add_argument("--rules", nargs="+", default=["crps", "nlml", "logs", "dss", "es"],
                    choices=rules_for("kin40k_full"))
    ap.add_argument("--data", default=None, help="kin40k .npz/csv dir (else synthetic)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--save-params", default=None,
                    help="directory for fitted-parameter checkpoints")
    args = ap.parse_args(argv)

    data = load_kin40k(args.data)

    def make_data(j):
        s = kin40k_replicate_split(data, j)
        return s.train_x, s.train_y, s.test_x, s.test_y

    def make_params(key, d):
        # CRPS section: all-random init; other sections fix scalars at 1.0.
        # We use the all-random variant uniformly (documented deviation: one init
        # policy across rules keeps the sweep vmappable in a single program).
        k_l, _ = jax.random.split(key)
        return GPParams(
            log_signal_sq=jnp.ones(()),
            log_length=jax.random.uniform(k_l, (d,)),
            log_noise_sq=jnp.ones(()),
            inducing=None,
        )

    schedules = {r: SCHEDULES[("kin40k_full", r)] for r in args.rules}
    results = run_sweep(
        args.rules, "exact", schedules, make_data, make_params,
        replicates=args.replicates, d=8,
        save_params_dir=args.save_params,
    )
    save_results(results, args.out)
    return results


if __name__ == "__main__":
    main()
