"""Diffusion benchmark sweep over grid sizes — the analog of
part1_benchmark.jl: grid sizes 2^e for e in 4:0.5:7, both operator tiers,
lock-protected CSV with resume-by-key (Pidfile analog at
part1_benchmark.jl:83-94).

    python -m fpr_tpu.experiments.part1_benchmark [--out benchmark-results/...]
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmark-results/bench_diffusion.csv")
    ap.add_argument("--ttot", type=float, default=1.0)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-e", type=float, default=7.0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--reps", type=int, default=3,
                    help="timed repetitions per config (median + iqr "
                    "recorded; jit-cached after the first)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from fpr_tpu.core.config import DiffusionConfig, ExecutionPolicy
    from fpr_tpu.models import diffusion3d
    from fpr_tpu.utils.io import append_csv_row, csv_has_row

    backend = jax.default_backend()
    # three tiers: array programming, fused kernel, temporally-fused (K=3)
    # kernel — the analog of the reference's array / kernel / kernel+shmem
    # columns, plus the fusion depth the reference cannot express
    variants = [
        (ExecutionPolicy.JNP, 1, "jnp"),
        (ExecutionPolicy.PALLAS, 1, "pallas"),
        (ExecutionPolicy.PALLAS, 3, "pallas_k3"),
    ]
    for e in np.arange(4.0, args.max_e + 0.25, 0.5):
        n = int(round(2**e))
        for policy, check_every, label in variants:
            cfg = DiffusionConfig(
                nx=n, ny=n, nz=n, ttot=args.ttot, tol=args.tol, policy=policy,
                check_every=check_every,
            )
            key = dict(n=n, policy=label, backend=backend)
            if csv_has_row(args.out, key):
                print(f"skip (cached): {key}")
                continue
            try:
                # median of reps (BenchmarkTools-median analog): the first
                # call pays the compile, later calls reuse the jit cache
                outs = [diffusion3d.solve(cfg, dtype=jnp.float32)
                        for _ in range(max(1, args.reps))]
            except Exception as exc:  # keep sweeping (multigrid_bench.jl:41-62)
                print(f"n={n} policy={policy.value}: FAILED {exc}")
                continue
            ts = sorted(o.bench.delta_t for o in outs)
            med = float(np.median(ts))
            out = min(outs, key=lambda o: abs(o.bench.delta_t - med))
            scale = out.bench.delta_t / med  # rescale rates to the median
            row = {
                **key,
                "iters": out.timed_iters,
                "seconds": round(med, 4),
                "throughput_gbs": round(out.bench.throughput * scale / 1e9, 2),
                "performance_gflops": round(out.bench.performance * scale / 1e9, 2),
                "intensity": round(out.bench.intensity, 4),
                "iqr_s": round(float(np.subtract(*np.percentile(ts, [75, 25]))), 5),
                "reps": len(ts),
            }
            written = append_csv_row(args.out, row, key_fields=("n", "policy", "backend"))
            print(("wrote " if written else "skipped ") + str(row))


if __name__ == "__main__":
    main()
