"""Measure the jnp-vs-Pallas ARD Gram crossover (justifies kernels._PALLAS_MIN_N)
and the sustained FLOP rate of the dense LOO step's linear-algebra phase.

Timing follows the axon-tunnel rules (CLAUDE.md): warmup execution first (remote
compile is deferred to first run), then time fresh perturbed inputs with a host
readback barrier. A single Gram at n <= 8k is sub-millisecond on-device while
one tunnel round-trip is ~30 ms, so the Gram comparison runs ITERS back-to-back
Grams inside one lax.scan program (each iteration perturbs x, so neither XLA
nor the relay cache can elide work) and divides by ITERS.

Usage: python experiments/bench_gram.py [--sizes 1024 2048 4096 8192 16384]
Writes a markdown table to stdout; recorded in BENCH_NOTES.md.
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

ITERS = 64


def _time_scanned(gram_fn, x0, d, reps):
    """Seconds per Gram: ITERS chained Grams in one program, median of reps."""

    def prog(x, s, ll):
        def body(carry, i):
            xi = x + 1e-5 * i + 1e-6 * carry  # serial dependence: no elision
            K = gram_fn(xi, xi, s, ll)
            return jnp.float32(K[0, 0]), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(ITERS, dtype=jnp.float32))
        return c

    prog = jax.jit(prog)
    s, ll = jnp.float32(0.3), jnp.full((d,), 0.5)
    np.asarray(jax.device_get(prog(x0, s, ll)))  # warmup + deferred compile
    ts = []
    for i in range(1, reps + 1):
        xi = x0 + 1e-4 * i
        t0 = time.time()
        np.asarray(jax.device_get(prog(xi, s, ll)))
        ts.append((time.time() - t0) / ITERS)
    return float(np.median(ts))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[1024, 2048, 4096, 8192, 16384])
    ap.add_argument("--d", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(0)
    print(f"| n | jnp Gram ms | Pallas Gram ms | speedup | ({ITERS}-iter scan)")
    print("|---|---|---|---|")
    for n in args.sizes:
        x0 = jnp.asarray(rng.standard_normal((n, args.d)).astype(np.float32))
        t_jnp = _time_scanned(ard_gram, x0, args.d, args.reps)
        t_pal = _time_scanned(ard_gram_pallas, x0, args.d, args.reps)
        print(f"| {n} | {t_jnp * 1e3:.3f} | {t_pal * 1e3:.3f} | "
              f"{t_jnp / t_pal:.2f}x |", flush=True)

    # Sustained TF/s of the dense LOO linear-algebra phase at n=8192:
    # chol (n^3/3) + tri_inverse (n^3/3) + SYRK (n^3/2) ~ 7n^3/6.
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

    fn = jax.jit(solve_phase)

    def make_K(i):
        x = jnp.asarray(x0) + 1e-4 * i
        K = ard_gram(x, x, jnp.float32(0.3), jnp.full((args.d,), 0.5))
        return K + 0.4 * jnp.eye(n, dtype=K.dtype)

    np.asarray(jax.device_get(fn(make_K(0), y)))
    ts = []
    for i in range(1, args.reps + 1):
        K = make_K(i)
        np.asarray(jax.device_get(K[0, 0]))  # exclude Gram build from timing
        t0 = time.time()
        np.asarray(jax.device_get(fn(K, y)))
        ts.append(time.time() - t0)
    t = float(np.median(ts))
    flops = 7.0 / 6.0 * n**3
    print(f"\nDense LOO solve phase n={n}: {t:.3f} s = "
          f"{flops / t / 1e12:.1f} TF/s sustained fp32 (HIGHEST matmuls)")


if __name__ == "__main__":
    main()
