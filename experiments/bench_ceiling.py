"""Single-step ceiling bench: one objective value_and_grad at a given n.

Reproduces the RESULTS.md "Single-chip dense ceiling" rows: builds the
requested objective (gpscore.fit.make_objective — the same dispatch the
training drivers use), AOT-compiles it, reports the client-side
memory_analysis temp, then times steady-state steps with perturbed
parameters and a host readback per step (the axon tunnel caches results
keyed on (program, inputs) and ignores block_until_ready — CLAUDE.md).

The LOO/NLML panel width and the k-fold cores' streaming width are set with
``--block`` (1024 at the n~61-86k ceilings, 2048 below). ``--matmul``
selects the precision/storage mode; ``--ref-grad`` additionally computes the
"highest"-mode gradient and reports the value/grad deviation (the
RESULTS.md "Reduced-precision MXU modes" columns).

Example (the n=86,016 f16 rows):
  python experiments/bench_ceiling.py --n 86016 --block 1024 --matmul f16 --rule crps
"""

import argparse
import contextlib
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import gpscore.models.exact as exact_mod
import gpscore.ops.loo_fused as loo_fused
from gpscore.fit import make_objective
from gpscore.utils.params import GPParams
from gpscore.utils.precision import matmul_mode

RULES = ("crps", "logs", "interval", "nlml", "dss", "es", "kc")


def _make_data(n, d, seed=0):
    kx, ky = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(kx, (n, d), jnp.float32)
    y = jnp.sin(x.sum(1)) + 0.1 * jax.random.normal(ky, (n,), jnp.float32)
    return x, y


@contextlib.contextmanager
def _thread_block(rule, block):
    """Route the CLI block width into the fused cores (the objective builders
    use the cores' defaults otherwise). Context manager: the module
    attributes are restored on exit, so an in-process caller (the CPU smoke
    test) doesn't leak a partial block width into the rest of the process.

    ``block`` falsy (0/None) = no-op: the cores' divisor-aware auto width
    (gpscore.ops.loo_fused.auto_block) stands."""
    if not block:
        yield
        return
    saved = {
        "loo_exact_fused": exact_mod.loo_exact_fused,
        "nlml_exact_fused": exact_mod.nlml_exact_fused,
        "kfold_stats_fused": exact_mod.kfold_stats_fused,
        "kfold_es_fused": exact_mod.kfold_es_fused,
    }
    try:
        if rule in ("crps", "logs", "interval"):
            def loo_fused_b(x, y, p):
                a, dg = loo_fused.ard_loo_solve_diag(
                    p.log_signal_sq, p.log_length, p.log_noise_sq,
                    x, y.reshape(-1), block, True,
                )
                return exact_mod.Gaussian(y.reshape(-1) - a / dg, 1.0 / dg)

            exact_mod.loo_exact_fused = loo_fused_b
        elif rule == "nlml":
            def nlml_b(x, y, p):
                return loo_fused.ard_nlml(
                    p.log_signal_sq, p.log_length, p.log_noise_sq,
                    x, y.reshape(-1), block, True,
                )

            exact_mod.nlml_exact_fused = nlml_b
        else:
            exact_mod.kfold_stats_fused = functools.partial(
                exact_mod.kfold_stats_fused, block=block
            )
            exact_mod.kfold_es_fused = functools.partial(
                exact_mod.kfold_es_fused, block=block
            )
        yield
    finally:
        for name, fn in saved.items():
            setattr(exact_mod, name, fn)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30720)
    ap.add_argument("--d", type=int, default=8)
    ap.add_argument("--block", type=int, default=2048)
    ap.add_argument("--rule", default="crps", choices=list(RULES))
    ap.add_argument("--matmul", default="highest",
                    choices=["highest", "high", "fast", "bf16", "f16"])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--ref-grad", action="store_true")
    args = ap.parse_args(argv)

    x, y = _make_data(args.n, args.d)
    loss = make_objective(args.rule)

    def step(p, x, y, key):
        return jax.value_and_grad(loss)(p, x, y, key)

    p0 = GPParams(jnp.float32(0.0), jnp.zeros(args.d, jnp.float32),
                  jnp.float32(-1.0))
    k0 = jax.random.PRNGKey(1)
    rec = {"rule": args.rule, "n": args.n, "block": args.block,
           "matmul": args.matmul}

    with contextlib.ExitStack() as stack:
        stack.enter_context(_thread_block(args.rule, args.block))
        stack.enter_context(matmul_mode(args.matmul))
        t0 = time.perf_counter()
        compiled = jax.jit(step).lower(p0, x, y, k0).compile()
        rec["compile_s"] = round(time.perf_counter() - t0, 1)
        try:
            ma = compiled.memory_analysis()
            rec["temp_gb"] = round(ma.temp_size_in_bytes / 1e9, 2)
            rec["temp_n2_fp32"] = round(
                ma.temp_size_in_bytes / (4 * args.n ** 2), 2
            )
        except Exception:
            pass
        t1 = time.perf_counter()
        v, g = compiled(p0, x, y, k0)  # g stays the p0 gradient for --ref-grad
        np.asarray(v)
        rec["warmup_s"] = round(time.perf_counter() - t1, 1)
        rec["loss"] = float(v)
        ts = []
        for i in range(args.repeats):
            p = GPParams(jnp.float32(0.001 * (i + 1)),
                         jnp.zeros(args.d, jnp.float32) + 0.001 * i,
                         jnp.float32(-1.0 - 0.001 * i))
            ta = time.perf_counter()
            v2, _ = compiled(p, x, y, k0)
            np.asarray(v2)
            ts.append(time.perf_counter() - ta)
        rec["step_s"] = round(min(ts), 3)

        if args.ref_grad:
            with matmul_mode("highest"):
                v0, g0 = jax.jit(step)(p0, x, y, k0)
                np.asarray(v0)
            rec["value_rel_err"] = float(
                abs((float(v) - float(v0)) / float(v0))
            )
            ga = np.concatenate([np.ravel(t) for t in jax.tree.leaves(g)])
            gb = np.concatenate([np.ravel(t) for t in jax.tree.leaves(g0)])
            rec["grad_max_rel"] = float(np.max(np.abs(ga - gb))
                                        / np.max(np.abs(gb)))
            rec["grad_cos"] = float(np.dot(ga, gb)
                                    / (np.linalg.norm(ga) * np.linalg.norm(gb)))

    print(json.dumps(rec, sort_keys=True))
    return rec


if __name__ == "__main__":
    main()
