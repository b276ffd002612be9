"""Beyond-reference-scale exact-GP driver: fit and evaluate at n up to the
single-chip HBM ceiling.

The reference's dense CPU LOO caps it at n = 500 (`kin40k-FULL-compare.py:196`)
and even its full data pool is 10k rows. This driver exercises the fused
in-place cores (gpscore/ops/{loo_fused,potri_inplace}.py) end-to-end at
arbitrary n — every exact-model objective (crps/logs/interval LOO, nlml,
dss/es/kc 4-fold) fits at n ~ 61k on one 16 GB v5e chip (RESULTS.md ceiling
table) and evaluation streams through the chunked large-n predictive
(`exact_predictive_diag_large`), so no stage materializes more than one
n x n buffer.

Data is a hermetic d-dimensional smooth-function-plus-noise synthetic (a GP
draw at this scale would itself need the O(n^3) factorization the fit is
benchmarking). Fits are host-chunked into ``--segment-iters`` pieces — the
TPU tunnel kills device programs that run uninterrupted for multiple minutes
(CLAUDE.md), and a 61k-row GD iteration is ~30 s.

Learning rates default to the reference KIN40K table (SURVEY.md §2.5) with the
sum-scaled objectives (nlml/dss/es) multiplied by 500/n, the same documented
deviation as `kin40k_full.py --lr-scale` (the reference tuned them at n=500).

Usage:
  python experiments/large_n.py --n 30720 --rules crps nlml --iters 10
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gpscore.fit import fit_gd, fit_gd_recovering, make_objective
from gpscore.fit.schedules import SCHEDULES, Schedule
from gpscore.metrics.evaluation import evaluate_predictive
from gpscore.models.exact import exact_predictive_diag_large
from gpscore.utils.params import init_unit_params
from gpscore.utils.precision import matmul_mode

RULES = ("crps", "logs", "interval", "nlml", "dss", "es", "kc")
# Sum-scaled objectives whose reference lr (tuned at n=500) scales ~1/n.
SUM_SCALED = ("nlml", "dss", "es")


def make_data(n, d, n_test, seed=0):
    """Smooth target + noise; train rows n, held-out rows n_test."""
    key = jax.random.PRNGKey(seed)
    kx, ky, kt, ks = jax.random.split(key, 4)

    def f(xx):
        return (
            jnp.sin(xx[:, 0])
            + 0.5 * jnp.cos(2.0 * xx[:, 1 % d])
            + 0.3 * xx[:, 2 % d]
        )

    x = jax.random.normal(kx, (n, d), jnp.float32)
    y = f(x) + 0.1 * jax.random.normal(ky, (n,), jnp.float32)
    xt = jax.random.normal(kt, (n_test, d), jnp.float32)
    yt = f(xt) + 0.1 * jax.random.normal(ks, (n_test,), jnp.float32)
    return x, y, xt, yt


def schedule_for(rule, n, iters, lr_scale):
    base = SCHEDULES[("kin40k_full", rule)] if ("kin40k_full", rule) in SCHEDULES \
        else SCHEDULES[("kin40k_fitc", rule)]
    lr = base.lr * lr_scale
    if rule in SUM_SCALED:
        lr = lr * 500.0 / n
    return Schedule(rule, iters if iters else base.iters, lr)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30720)
    ap.add_argument("--d", type=int, default=8)
    ap.add_argument("--n-test", type=int, default=2048)
    ap.add_argument("--rules", nargs="+", default=["crps", "nlml"],
                    choices=list(RULES))
    ap.add_argument("--iters", type=int, default=10,
                    help="GD iterations per rule (0 = reference count)")
    ap.add_argument("--segment-iters", type=int, default=5,
                    help="host-chunk size (tunnel kills multi-minute programs)")
    ap.add_argument("--lr-scale", type=float, default=1.0)
    ap.add_argument("--matmul", default="highest",
                    choices=["highest", "high", "fast", "bf16", "f16"],
                    help="contraction precision for the FIT (gpscore.utils."
                         "precision.set_matmul_mode): 'high' ~1.8x, 'fast' "
                         "~3x the GEMM phases on v5e; 'bf16'/'f16' also "
                         "store the n x n buffers in 2-byte floats (HALF "
                         "the HBM -> n ~ 86k on one chip; bf16 ~4.4x but "
                         "conditioning-limited, f16 ~1.9x and robust); "
                         "evaluation runs 'highest' up to the fp32 ceiling, "
                         "f16-stored beyond it")
    ap.add_argument("--polish-iters", type=int, default=0,
                    help="after a reduced-precision fit, run this many final "
                         "GD iterations at 'highest' (fast-fit -> "
                         "exact-polish; ignored when --matmul highest)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--save-params", default=None,
                    help="save the fitted params pytree (.npz) per rule "
                         "(suffix _<rule>.npz); with --skip-eval this "
                         "supports the two-process fit-then-evaluate flow "
                         "(device memory accumulates across many big "
                         "programs in one process — measured: the fp32 "
                         "eval OOMs in-process after a long 49k+ fit but "
                         "runs fresh)")
    ap.add_argument("--load-params", default=None,
                    help="skip fitting; load params saved by --save-params "
                         "(same prefix convention: <prefix>_<rule>.npz per "
                         "rule) and evaluate only. A bare existing .npz path "
                         "is accepted for a SINGLE rule only — with several "
                         "rules it would silently score them all with one "
                         "rule's params")
    ap.add_argument("--skip-eval", action="store_true",
                    help="fit (and optionally save params) without the "
                         "evaluation leg")
    ap.add_argument("--eval-storage", default="auto",
                    choices=["auto", "f32", "f16"],
                    help="predictive-eval buffer dtype: auto = fp32 up to "
                         "the fp32 n^2 ceiling, f16-stored beyond it; "
                         "explicit values override (f16 at n <= 61440 is "
                         "the refinement-validation config)")
    ap.add_argument("--block", type=int, default=0,
                    help="fused-core panel width AND eval block; 0 (default) "
                         "= divisor-aware auto selection "
                         "(gpscore.ops.loo_fused.auto_block: widest pad-free "
                         "width whose O(n*block) stream temps fit next to "
                         "the n^2 buffer — no hand-tuning at the ceilings)")
    ap.add_argument("--eval-chunk", type=int, default=2048,
                    help="test-column chunk of the streamed predictive. At "
                         "the 86k ceiling the PCG working set is ~5 fp32 "
                         "[n, chunk] buffers next to the 14.8 GB stored "
                         "inverse — use 256-512 there")
    ap.add_argument("--eval-refine", type=int, default=8,
                    help="M-preconditioned CG iterations on every 2-byte-"
                         "stored eval solve (M = the stored inverse; exact "
                         "K_hat recomputed panel-wise per matvec). 8 "
                         "returns fp32-grade metrics through a half-memory "
                         "inverse (RESULTS.md refinement-validation table). "
                         "0 = the raw 2-byte-grade eval")
    args = ap.parse_args(argv)

    if args.n % 4 and any(r in ("dss", "es", "kc") for r in args.rules):
        ap.error("fold rules need --n divisible by 4")

    from gpscore.utils.checkpoint import load_pytree, save_pytree

    def eval_config():
        """(storage, refine) for the chunked predictive: fp32 up to the fp32
        n^2 ceiling; beyond it an f16-stored inverse with iterative
        refinement against the exact panel-recomputed K_hat, which returns
        fp32-grade metrics at half the memory (validated at n = 57,344 where
        both pipelines run — RESULTS.md refinement-validation table)."""
        if args.eval_storage == "f32":
            return None, 0
        if args.eval_storage == "f16" or (
            args.matmul in ("bf16", "f16") and args.n > 61440
        ):
            return jnp.float16, args.eval_refine
        return None, 0

    from experiments.bench_ceiling import _thread_block
    from gpscore.ops.loo_fused import auto_block

    def eval_block():
        """--block, or the divisor-aware auto width at the EVAL storage
        dtype (auto_block reads the ambient mode otherwise, and evaluation
        runs outside the --matmul context)."""
        if args.block:
            return args.block
        st, _ = eval_config()
        return auto_block(args.n, 2 if st is not None else 4)

    x, y, xt, yt = make_data(args.n, args.d, args.n_test)
    results = {}
    for rule in args.rules:
      with _thread_block(rule, args.block):
          sched = schedule_for(rule, args.n, args.iters, args.lr_scale)
          loss = make_objective(rule, model="exact")
          params = init_unit_params(d=args.d, isotropic=False)
          key = jax.random.PRNGKey(1)
          if args.load_params:
              # Mirror the --save-params convention (per-rule _<rule>.npz
              # suffix); fall back to a literal path only when it cannot be
              # ambiguous (single rule).
              path = f"{args.load_params}_{rule}.npz"
              if not os.path.exists(path):
                  if len(args.rules) == 1 and os.path.exists(args.load_params):
                      path = args.load_params
                  else:
                      ap.error(
                          f"--load-params: {path} not found (per-rule suffix "
                          "convention of --save-params; a bare .npz path is "
                          "only accepted with a single --rules entry)"
                      )
              params = load_pytree(path, params)
              rec = {"n": args.n, "rule": rule, "loaded": path}
              eval_storage, eval_refine = eval_config()
              pred = jax.jit(
                  lambda xx, yy, xt_, p: exact_predictive_diag_large(
                      xx, yy, xt_, p, storage=eval_storage,
                      refine=eval_refine, chunk=args.eval_chunk,
                      block=eval_block())
              )(x, y, xt, params)
              m = evaluate_predictive(pred.mean, pred.cov, yt, y)
              rec["eval_storage"] = "f16" if eval_storage is not None else "f32"
              rec["eval_refine"] = eval_refine
              rec.update({k: float(v) for k, v in m._asdict().items()})
              results[rule] = rec
              print(f"[{rule}] {json.dumps(rec, sort_keys=True)}", flush=True)
              continue

          seg = max(1, min(args.segment_iters, sched.iters))
          t0 = time.time()
          with matmul_mode(args.matmul):  # trace-time: affects the fit only
              # Host-chunked fit with AUTOMATIC 2-byte stall recovery: a
              # mid-fit conditioning crossover (NaN-frozen parameters) is
              # detected via FitResult.stall_iters and the lost iterations are
              # re-run under the auto_recover_mode ladder ("high" below the
              # fp32 ceiling, else "f16") — no hand-chosen --polish-iters
              # needed for correctness anymore.
              res, fit_info = fit_gd_recovering(
                  loss, params, x, y, iters=sched.iters, lr=sched.lr, key=key,
                  segment_iters=seg, verbose=True, rule=rule,
              )
          params = res.params
          losses = np.asarray(res.loss_history).tolist()
          seg_times = [
              (s["wall_s"], s["iters"]) for s in fit_info["segments"]
              if s["mode"] == args.matmul
          ]
          if args.polish_iters and args.matmul != "highest":
              # OPTIONAL exact-precision polish on top of the auto-recovered
              # fit: extra refinement iterations at "highest" (modes are
              # trace-time, so this is a separately compiled program) —
              # host-chunked like the main fit (an unchunked multi-minute
              # polish program gets killed by the TPU tunnel; CLAUDE.md).
              pol = [seg] * (args.polish_iters // seg)
              if args.polish_iters % seg:
                  pol.append(args.polish_iters % seg)
              pol_fns = {}
              for s2, it in enumerate(pol):
                  fn = pol_fns.setdefault(it, jax.jit(
                      lambda p, k, _it=it: fit_gd(
                          loss, p, x, y, iters=_it, lr=sched.lr, key=k)
                  ))
                  res = fn(params, jax.random.fold_in(key, 50_000 + s2))
                  params = res.params
                  losses.extend(np.asarray(res.loss_history).tolist())
          wall = time.time() - t0
          # first segment pays (remote) compilation; steady-state = best segment
          steady = min(t / it for t, it in seg_times)

          if args.save_params:
              save_pytree(f"{args.save_params}_{rule}.npz", params)
          recov = {"stall_iters": fit_info["stall_iters"],
                   "recovery": fit_info["recovery"]}
          if "unrecovered_iters" in fit_info:
              recov["unrecovered_iters"] = fit_info["unrecovered_iters"]
          if args.skip_eval:
              rec = {"n": args.n, "iters": sched.iters, "lr": sched.lr,
                     "matmul": args.matmul, "fit_wall_s": round(wall, 2),
                     "s_per_iter_steady": round(steady, 3),
                     "loss_first": losses[0], "loss_last": losses[-1],
                     **recov}
              results[rule] = rec
              print(f"[{rule}] {json.dumps(rec, sort_keys=True)}", flush=True)
              continue

          # evaluation is exact fp32 up to the fp32 n^2 ceiling (the jitted
          # eval program peaks at ~1 n^2, same as a fit step); past ~62k a
          # 2-byte-storage fit is evaluated through a float16-stored inverse
          # WITH iterative refinement (--eval-refine; fp32-grade metrics at
          # half the memory — the raw f16 eval shipped a wrong artifact once,
          # commit f1d876a; f16 over bf16 for its 8x finer mantissa).
          eval_storage, eval_refine = eval_config()
          # ONE jitted program: executed eagerly, every intermediate of the
          # Gram -> in-place inverse chain materializes (measured 31.6 GB at
          # n = 61,440 vs ~1 n^2 jitted — this, not fit leftovers, was the
          # in-process eval OOM).
          pred = jax.jit(
              lambda xx, yy, xt_, p: exact_predictive_diag_large(
                  xx, yy, xt_, p, storage=eval_storage, refine=eval_refine,
                  chunk=args.eval_chunk, block=eval_block())
          )(x, y, xt, params)
          m = evaluate_predictive(pred.mean, pred.cov, yt, y)
          rec = {
              "n": args.n, "iters": sched.iters, "lr": sched.lr,
              "matmul": args.matmul,
              "eval_refine": eval_refine,
              "eval_storage": "f16" if eval_storage is not None else "f32",
              "fit_wall_s": round(wall, 2),
              "s_per_iter_steady": round(steady, 3),
              "loss_first": losses[0], "loss_last": losses[-1],
              **recov,
              **{k: float(v) for k, v in m._asdict().items()},
          }
          results[rule] = rec
          print(f"[{rule}] {json.dumps(rec, sort_keys=True)}", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
        print(f"wrote {args.out}")
    return results


if __name__ == "__main__":
    main()
