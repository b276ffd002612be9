"""Synthetic 1-D full-GP comparison: CRPS-LOO vs NLML vs logs-LOO.

Reproduces `SIMPLE-DATA FULL-comapre.py` (100 replicates of n=120 synthetic data,
unit log-param inits, schedules from SURVEY.md §2.5) as one vmapped sweep.

Usage: python experiments/simple_full.py [--replicates 100] [--out results.json]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from experiments.common import run_sweep, save_results
from gpscore.data import sample_synthetic_1d
from gpscore.fit.schedules import SCHEDULES, rules_for
from gpscore.utils.params import init_unit_params


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicates", type=int, default=100)
    ap.add_argument("--rules", nargs="+", default=["crps", "nlml", "logs"],
                    choices=rules_for("simple_full"))
    ap.add_argument("--matmul", default="highest",
                    choices=["highest", "high", "fast", "bf16", "f16"],
                    help="contraction precision for the fits "
                         "(gpscore.utils.precision.set_matmul_mode)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--save-params", default=None,
                    help="directory for fitted-parameter checkpoints")
    args = ap.parse_args(argv)

    def make_data(j):
        # reference seeds torch with 100*j per replicate (`:159-160`)
        d = sample_synthetic_1d(jax.random.PRNGKey(100 * j))
        return (
            np.asarray(d.train_x),
            np.asarray(d.train_y),
            np.asarray(d.test_x),
            np.asarray(d.test_y),
        )

    def make_params(key, d):
        return init_unit_params(d=d, isotropic=False)

    schedules = {r: SCHEDULES[("simple_full", r)] for r in args.rules}
    results = run_sweep(
        args.rules, "exact", schedules, make_data, make_params,
        replicates=args.replicates, d=1,
        save_params_dir=args.save_params,
        matmul=args.matmul,
    )
    save_results(results, args.out)
    return results


if __name__ == "__main__":
    main()
