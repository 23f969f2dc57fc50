"""IO, checkpoint/resume, CSV accumulation, counted perf model."""

import numpy as np
import pytest

from fpr_tpu.utils import checkpoint
from fpr_tpu.utils.io import append_csv_row, csv_has_rows
from fpr_tpu.utils.timing import diffusion_bench_results


def test_checkpoint_roundtrip(tmp_path, rng):
    p = tmp_path / "state.npz"
    T = rng.random((17, 33))
    checkpoint.save(p, T=T, t=1.25)
    d = checkpoint.load(p)
    np.testing.assert_array_equal(d["T"], T)
    assert float(d["t"]) == 1.25


def test_checkpoint_resume_ns(tmp_path):
    # simulate 2 steps, checkpoint, resume 1 step == straight 3 steps
    import jax.numpy as jnp

    from fpr_tpu.core.config import NSConfig
    from fpr_tpu.models import navier_stokes as ns

    cfg = NSConfig(nx=65, ny=17, beta=0.0, Pr=0.01, tol=1e-6, ttot=10.0)
    a = ns.simulate(cfg, max_steps=2)
    p = tmp_path / "ck.npz"
    checkpoint.save(p, T=a.T, W=a.W, t=a.sim_time)
    d = checkpoint.load(p)
    b = ns.simulate(cfg, T0=d["T"], W0=d["W"], max_steps=1)
    c = ns.simulate(cfg, max_steps=3)
    np.testing.assert_allclose(b.T, c.T, atol=1e-12)
    np.testing.assert_allclose(b.W, c.W, atol=1e-12)


def test_csv_append_and_resume(tmp_path):
    p = tmp_path / "r.csv"
    assert not csv_has_rows(p)
    assert append_csv_row(p, {"n": 8, "v": 1.0}, key_fields=("n",))
    assert not append_csv_row(p, {"n": 8, "v": 2.0}, key_fields=("n",))  # skip
    assert append_csv_row(p, {"n": 16, "v": 3.0}, key_fields=("n",))
    assert csv_has_rows(p)


def test_counted_model_matches_reference_formulas():
    # 128^3, 1000 iterations, f64, plain kernel: the reference counts
    # 27 FLOP and (14+1)*8 bytes per interior cell per iteration
    res = diffusion_bench_results(2.0, 1000, 128, 128, 128, 8, model="plain")
    cells = 126**3
    assert res.work == 1000 * 27 * cells
    assert res.memory == 1000 * 15 * 8 * cells
    assert res.throughput == pytest.approx(res.memory / 2.0)
    assert res.intensity == pytest.approx(27 / (15 * 8))


def test_cli_help():
    from fpr_tpu.cli import main

    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.code == 0
