"""Sharded fit-step bench + multi-chip scaling projection instrumentation.

Two jobs (round-3 review items 1 and 8):

1. **Measured sharded-vs-single-chip rates.** On the one real TPU it builds
   the fused-sharded step on a 1-device ('batch'=1, 'data'=1) mesh and times
   it exactly like experiments/bench_ceiling.py (AOT compile, perturbed
   params, host readback per step — the axon tunnel caches on (program,
   inputs) and ignores block_until_ready; CLAUDE.md). Comparing against the
   bench_ceiling single-chip row at the same (n, block, matmul) isolates the
   sharded stages' FLOP/layout overhead with zero communication in the mix.

2. **Auditable p-device projection.** Reports three layers of evidence:
   - per-device HBM: ``memory_analysis()`` of the compiled module
     (argument/output/temp bytes),
   - ``static_collective_*``: every all-reduce / all-gather / reduce-scatter
     / collective-permute in the optimized HLO with its output bytes summed.
     Static only — a collective inside a fori-loop body appears once but
     runs n/block times, so this validates STRUCTURE (which collectives XLA
     emitted), not volume;
   - ``analytic_collective_bytes``: the dynamic per-device traffic from the
     algorithm itself (sharded_potri.py stage docstrings). Per step with
     element size e (4 fp32, 2 f16/bf16), k = n/b pivots:
       stage 1: k x (psum band [b,n] e + psum D [b,b] fp32) ~ n^2 e + 4 k b^2
       stage 2: k x psum strip [n,b] e                      ~ n^2 e
       stage 3: k x psum B^T [b,n] fp32                     ~ 4 n^2
       backward: k x psum_scatter [b,n] -> [b,n/p] fp32     ~ 4 n^2 / p
       (+ kfold's device_within_fold KB_fold psum: n^2 e)
   The projected p-chip step documented in BENCH_NOTES.md is
     t_p ~ t_1 / p + ring_factor * analytic_collective_bytes / ICI_BW,
   ring_factor = 2 (p-1)/p for all-reduce, with the measured 1-device TPU
   t_1 (compute is FLOP-exact, so it scales 1/p) and --ici-gbps per link.

Reference analogue: the reference has no distributed mode at all — its O(n^3)
single-process wall is `kin40k-FULL-compare.py:209`.

Examples:
  python experiments/bench_sharded.py --n 16384 --block 1024 --matmul f16
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python experiments/bench_sharded.py --n 4096 --devices 8 --hlo-collectives
"""

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gpscore.parallel import (
    make_sharded_fused_kfold_fit_step,
    make_sharded_fused_loo_fit_step,
    make_sharded_fused_nlml_fit_step,
)
from gpscore.parallel.mesh import make_mesh
from gpscore.utils.params import GPParams
from gpscore.utils.precision import matmul_mode

RULES = ("crps", "logs", "interval", "nlml", "dss", "es", "kc")

_DTYPE_BYTES = {"f32": 4, "f16": 2, "bf16": 2, "f64": 8, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1}


def _shape_bytes(shape_str):
    """Bytes of one HLO shape string like 'f32[256,4096]{1,0}' (tuples split
    upstream); 0 for token/opaque shapes."""
    m = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    if dt not in _DTYPE_BYTES:
        return 0
    count = 1
    for d in dims.split(","):
        if d:
            count *= int(d)
    return count * _DTYPE_BYTES[dt]


def collective_stats(hlo_text):
    """Per-device collective traffic of an optimized HLO module: for every
    collective op, the summed byte size of its output shape(s). This is the
    data each device must move through ICI per step (all-reduce moves ~2x
    this in a ring; the projection in BENCH_NOTES.md applies that factor)."""
    ops = {"all-reduce": 0, "all-gather": 0, "reduce-scatter": 0,
           "collective-permute": 0, "all-to-all": 0}
    counts = dict.fromkeys(ops, 0)
    pat = re.compile(
        r"^\s*(?:%\S+\s*=\s*)?((?:\([^)]*\))|(?:\S+))\s+"
        r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
        r"(?:-start)?\(", re.M)
    for m in pat.finditer(hlo_text):
        shapes, op = m.groups()
        total = sum(
            _shape_bytes(s)
            for s in re.findall(r"[a-z0-9]+\[[0-9,]*\]", shapes)
        )
        ops[op] += total
        counts[op] += 1
    return {
        "static_collective_bytes": sum(ops.values()),
        "static_collective_bytes_by_op": {k: v for k, v in ops.items() if v},
        "static_collective_count": sum(counts.values()),
    }


def analytic_collective_bytes(n, block, p, rule, storage_bytes):
    """Dynamic per-device collective traffic of one fused-sharded step (the
    module-docstring formulas, from the sharded_potri stage structure)."""
    k = n // block
    e = storage_bytes
    fwd = (n * n * e + 4 * k * block * block  # stage 1 band + pivot psums
           + n * n * e                        # stage 2 strips
           + 4 * n * n)                       # stage 3 fp32 B^T psums
    if rule in ("dss", "es", "kc"):
        # fold-STREAMED step (round 5, parallel/sharded_fold_stream.py):
        # per-fold [nb, nb] block psums in fwd AND bwd (2 n^2 e / fold_k at
        # the default fold_k=4) + the per-row-block [nb, b] G gathers across
        # the k sandwich passes (n^2 e total); the backward computes its
        # local K_hat_bar columns directly, so the LOO path's psum_scatter
        # term does not appear.
        bwd = n * n * e + 2 * (n * n * e) // 4
    else:
        bwd = 4 * n * n // p                  # psum_scatter outputs
    return {"analytic_collective_bytes": fwd + bwd,
            "analytic_collective_gb": round((fwd + bwd) / 1e9, 3)}


def projected_step_s(t1_s, p, coll_bytes, ici_gbps):
    """t_p ~ compute/p + ring all-reduce time for the analytic traffic."""
    ring = 2.0 * (p - 1) / p
    return t1_s / p + ring * coll_bytes / (ici_gbps * 1e9)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--d", type=int, default=8)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--rule", default="crps", choices=list(RULES))
    ap.add_argument("--matmul", default="highest",
                    choices=["highest", "high", "fast", "bf16", "f16"])
    ap.add_argument("--devices", type=int, default=1,
                    help="mesh 'data' width (p): 1 on the real TPU; up to 8 "
                         "on the virtual CPU mesh")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--hlo-collectives", action="store_true",
                    help="parse the optimized HLO for the statically-emitted "
                         "collectives (structure check; volume comes from "
                         "the analytic model)")
    ap.add_argument("--project", type=int, default=0, metavar="P",
                    help="also print the projected P-chip step time from the "
                         "measured 1-device rate + analytic ICI traffic")
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="assumed per-link ICI bandwidth (GB/s) for the "
                         "projection (v5e ~45, v4 ~50)")
    args = ap.parse_args(argv)

    mesh = make_mesh(devices=jax.devices()[: args.devices],
                     batch=1, data=args.devices)
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (args.n, args.d), jnp.float32)
    y = jnp.sin(x.sum(1)) + 0.1 * jax.random.normal(ky, (args.n,), jnp.float32)

    rec = {"rule": args.rule, "n": args.n, "block": args.block,
           "matmul": args.matmul, "devices": args.devices,
           "platform": jax.devices()[0].platform}

    with matmul_mode(args.matmul):
        if args.rule in ("crps", "logs", "interval"):
            step = make_sharded_fused_loo_fit_step(
                mesh, rule=args.rule, lr=0.0, block=args.block)
        elif args.rule == "nlml":
            step = make_sharded_fused_nlml_fit_step(
                mesh, lr=0.0, block=args.block)
        else:
            step = make_sharded_fused_kfold_fit_step(
                mesh, rule=args.rule, lr=0.0, block=args.block)

        p0 = GPParams(jnp.float32(0.0), jnp.zeros(args.d, jnp.float32),
                      jnp.float32(-1.0))
        # es is stochastic: the step signature takes a PRNG key (held fixed
        # across timing repeats so every step runs the same MC estimate).
        es_args = ((jax.random.PRNGKey(7),) if args.rule == "es" else ())
        t0 = time.perf_counter()
        compiled = jax.jit(step).lower(p0, x, y, *es_args).compile()
        rec["compile_s"] = round(time.perf_counter() - t0, 1)
        try:
            ma = compiled.memory_analysis()
            rec["temp_gb_per_device"] = round(ma.temp_size_in_bytes / 1e9, 3)
            rec["temp_n2_over_p_fp32"] = round(
                ma.temp_size_in_bytes / (4 * args.n ** 2 / args.devices), 2)
        except Exception:
            pass
        if args.hlo_collectives:
            rec.update(collective_stats(compiled.as_text()))

        t1 = time.perf_counter()
        loss, _ = compiled(p0, x, y, *es_args)
        np.asarray(loss)
        rec["warmup_s"] = round(time.perf_counter() - t1, 1)
        rec["loss"] = float(loss)
        ts = []
        for i in range(args.repeats):
            p = GPParams(jnp.float32(0.001 * (i + 1)),
                         jnp.zeros(args.d, jnp.float32) + 0.001 * i,
                         jnp.float32(-1.0 - 0.001 * i))
            ta = time.perf_counter()
            loss2, _ = compiled(p, x, y, *es_args)
            np.asarray(loss2)
            ts.append(time.perf_counter() - ta)
        rec["step_s"] = round(min(ts), 3)

    sb = 2 if args.matmul in ("bf16", "f16") else 4
    rec.update(analytic_collective_bytes(
        args.n, args.block, max(args.devices, args.project or 1),
        args.rule, sb))
    if args.project and args.project > 1:
        rec["projected_devices"] = args.project
        rec["projected_step_s"] = round(projected_step_s(
            rec["step_s"] * args.devices, args.project,
            rec["analytic_collective_bytes"], args.ici_gbps), 3)

    print(json.dumps(rec, sort_keys=True))
    return rec


if __name__ == "__main__":
    main()
