"""Synthetic 1-D FITC comparison with learned inducing points (m=5).

Reproduces `SIMPLE-FITC--comapre.py`: same synthetic generator, FITC model with 5
inducing points initialized on integer draws in [-3, 3) (`SIMPLE-FITC--comapre.py:200`
uses torch.randint — reproduced with a uniform-integer draw), schedules per
SURVEY.md §2.5.

Usage: python experiments/simple_fitc.py [--replicates 100] [--out results.json]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from experiments.common import run_sweep, save_results
from gpscore.data import sample_synthetic_1d
from gpscore.fit.schedules import SCHEDULES, rules_for
from gpscore.utils.params import init_unit_params


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicates", type=int, default=100)
    ap.add_argument("--rules", nargs="+", default=["crps", "nlml", "logs"],
                    choices=rules_for("simple_fitc"))
    ap.add_argument("--num-inducing", type=int, default=5)
    ap.add_argument("--matmul", default="highest",
                    choices=["highest", "high", "fast", "bf16", "f16"],
                    help="contraction precision for the fits "
                         "(gpscore.utils.precision.set_matmul_mode)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--save-params", default=None,
                    help="directory for fitted-parameter checkpoints")
    args = ap.parse_args(argv)

    def make_data(j):
        d = sample_synthetic_1d(jax.random.PRNGKey(100 * j))
        return (
            np.asarray(d.train_x),
            np.asarray(d.train_y),
            np.asarray(d.test_x),
            np.asarray(d.test_y),
        )

    m = args.num_inducing

    def make_params(key, d):
        # torch.randint(-3, 3, (m, 1)) analogue, float32
        u = jax.random.randint(key, (m, d), -3, 3).astype(jnp.float32)
        return init_unit_params(d=d, isotropic=False, inducing=u)

    schedules = {r: SCHEDULES[("simple_fitc", r)] for r in args.rules}
    results = run_sweep(
        args.rules, "fitc", schedules, make_data, make_params,
        replicates=args.replicates, d=1,
        save_params_dir=args.save_params,
        matmul=args.matmul,
    )
    save_results(results, args.out)
    return results


if __name__ == "__main__":
    main()
