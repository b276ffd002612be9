"""Measure the jnp-vs-Pallas ARD Gram crossover (justifies kernels._PALLAS_MIN_N)
and the sustained FLOP rate of the dense LOO step's linear-algebra phase.

Timing follows the axon-tunnel rules (CLAUDE.md): warmup execution first (remote
compile is deferred to first run), then time FRESH perturbed inputs only (the
relay caches results keyed on (program, inputs)), reading a scalar back to host
as the barrier.

Usage: python experiments/bench_gram.py [--sizes 1024 2048 4096 8192] [--reps 3]
Writes a markdown table to stdout; paste into BENCH_NOTES.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gpscore.ops.gram_pallas import ard_gram_pallas
from gpscore.ops.kernels import ard_gram


def _time(fn, make_args, reps):
    """Median wall time of fn over ``reps`` fresh-input calls (host readback)."""
    fn = jax.jit(fn)
    out = fn(*make_args(0))
    np.asarray(jax.device_get(jax.tree.leaves(out)[0]))[0]  # warmup + compile
    ts = []
    for i in range(1, reps + 1):
        args = make_args(i)
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0]))[0]
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[1024, 2048, 4096, 8192])
    ap.add_argument("--d", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(0)
    print("| n | jnp Gram s | Pallas Gram s | speedup |")
    print("|---|---|---|---|")
    for n in args.sizes:
        x0 = rng.standard_normal((n, args.d)).astype(np.float32)

        def make_args(i, x0=x0, n=n):
            # perturb to defeat the relay's result cache
            x = jnp.asarray(x0) + 1e-4 * i
            return (x, x, jnp.float32(0.3), jnp.full((args.d,), 0.5))

        t_jnp = _time(lambda a, b, s, l: jnp.sum(ard_gram(a, b, s, l)),
                      make_args, args.reps)
        t_pal = _time(lambda a, b, s, l: jnp.sum(ard_gram_pallas(a, b, s, l)),
                      make_args, args.reps)
        print(f"| {n} | {t_jnp:.4f} | {t_pal:.4f} | {t_jnp / t_pal:.2f}x |",
              flush=True)

    # Sustained TF/s of the dense LOO linear-algebra phase at n=8192:
    # chol (n^3/3) + tri_inverse (n^3/3) + SYRK (n^3/2) + matvec ~ 7n^3/6.
    n = 8192
    x0 = rng.standard_normal((n, args.d)).astype(np.float32)
    y = jnp.asarray(np.sin(x0.sum(1)).astype(np.float32))

    def solve_phase(K_hat, y):
        from gpscore.ops import linalg
        from gpscore.ops.block_cholesky import tri_inverse_lower
        from gpscore.utils.precision import matmul

        L = linalg.chol_factor(K_hat)
        Linv = tri_inverse_lower(L)
        Kinv = matmul(Linv.T, Linv)
        a = matmul(Kinv, y.reshape(n, 1))[:, 0]
        return a[0] + jnp.diagonal(Kinv)[0]

    def make_args(i):
        x = jnp.asarray(x0) + 1e-4 * i
        K = ard_gram(x, x, jnp.float32(0.3), jnp.full((args.d,), 0.5))
        K = K + 0.4 * jnp.eye(n, dtype=K.dtype)
        return (K, y)

    t = _time(solve_phase, make_args, args.reps)
    flops = 7.0 / 6.0 * n**3
    print(f"\nDense LOO solve phase n={n}: {t:.3f} s = "
          f"{flops / t / 1e12:.1f} TF/s sustained fp32 (HIGHEST matmuls)")


if __name__ == "__main__":
    main()
