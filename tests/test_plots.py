"""Figure generation from the committed benchmark CSVs.

The reference drives its figures from committed CSV artifacts
(scripts-part1/part1_plot_results.jl, scripts-part2/multigrid_plots.jl);
this pins the same property — every figure family regenerates from
`benchmark-results/` alone, so the committed PNGs are reproducible.
"""

import os

import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

from pathlib import Path

from fpr_tpu.plotting import plots

RESULTS = Path(os.path.dirname(__file__)).parent / "benchmark-results"

EXPECTED = [
    # (figure file, plot fn, CSVs it needs)
    ("diffusion_strong_scaling.png", plots.plot_scaling, ["diffusion_scaling.csv"]),
    ("error_vs_tolerance.png", plots.plot_work_precision, ["error_vs_tolerance.csv"]),
    ("semi_implicit_vs_explicit.png", plots.plot_timestepping, ["ns_fullscale.csv"]),
    ("multigrid_bench.png", plots.plot_mg_bench, ["bench_multigrid.csv"]),
    ("mg_workprecision.png", plots.plot_mg_workprecision, ["mg_workprecision.csv"]),
]


@pytest.mark.parametrize("fig_name,fn,csvs", EXPECTED,
                         ids=[e[0] for e in EXPECTED])
def test_figure_regenerates_from_committed_csvs(tmp_path, fig_name, fn, csvs):
    for c in csvs:
        assert (RESULTS / c).exists(), f"committed artifact missing: {c}"
    fn(RESULTS, tmp_path)
    out = tmp_path / fig_name
    assert out.exists() and out.stat().st_size > 1000, fig_name


def test_timestepping_plot_selects_production_tier(tmp_path):
    """ns_fullscale.csv carries mixed / fast / fast_dst* tiers; the figure
    must plot one series per beta (the fast tier), not one per tier."""
    rows = plots._read(RESULTS / "ns_fullscale.csv")
    assert {r["solver"] for r in rows} >= {"mixed", "fast"}
    plots.plot_timestepping(RESULTS, tmp_path)
    assert (tmp_path / "semi_implicit_vs_explicit.png").exists()
