#!/usr/bin/env bash
# Master benchmark runner — the analog of the reference's
# run_all_benchmarks.sh: runs every sweep, skipping work whose CSV rows
# already exist (each experiment resumes by key), then renders the figures.
set -uo pipefail

RESULTS=${RESULTS:-benchmark-results}
PY=${PY:-python}

echo "== diffusion grid sweep =="
$PY -m fpr_tpu.experiments.part1_benchmark --out "$RESULTS/bench_diffusion.csv" "$@"

echo "== diffusion scaling (all local devices) =="
$PY -m fpr_tpu.experiments.part1_scaling --mode strong --out "$RESULTS/diffusion_scaling.csv"
$PY -m fpr_tpu.experiments.part1_scaling --mode weak --out "$RESULTS/diffusion_scaling.csv"

echo "== work-precision =="
$PY -m fpr_tpu.experiments.part1_error_experiments --mode grid
$PY -m fpr_tpu.experiments.part1_error_experiments --mode tol --n 128

echo "== multigrid sweep =="
$PY -m fpr_tpu.experiments.multigrid_bench --max-k 12 --dst
$PY -m fpr_tpu.experiments.multigrid_bench --solvers ds --min-k 10 --max-k 14 --dst
# deep-smoothed production rows (ds_v55 labels; V(2,2) rows kept above)
$PY -m fpr_tpu.experiments.multigrid_bench --solvers ds --min-k 10 --max-k 14 \
    --max-l 2 --dst --smooths 5
$PY -m fpr_tpu.experiments.multigrid_bench --workprec --max-k 14 \
    --out "$RESULTS/mg_workprecision.csv"

echo "== NS timestepping (full 2049x513 scale; resume-by-key) =="
$PY -m fpr_tpu.experiments.ns_timestepping --solver fast \
    --out "$RESULTS/ns_fullscale.csv" --label fast_r5
$PY -m fpr_tpu.experiments.ns_timestepping --solver fast \
    --out "$RESULTS/ns_fullscale.csv" --label fast_r5_stol100 \
    --s-tol-factor 100 --betas 0.0
$PY -m fpr_tpu.experiments.ns_timestepping --solver mixed \
    --out "$RESULTS/ns_fullscale.csv"

echo "== plots =="
$PY -m fpr_tpu.plotting.plots --results "$RESULTS" --figs figs
