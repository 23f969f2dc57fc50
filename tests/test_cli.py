"""CLI surface: subcommands run end-to-end and the guards fire.

Mirrors the reference's script entry points (scripts-part1/*.jl,
scripts-part2/part2.jl argument handling); small shapes only — the heavy
paths are covered by the model/solver tests.
"""

import pytest

from fpr_tpu import cli


def test_mg_ds_dst(capsys):
    cli.main(["mg", "--k", "7", "--l", "5", "--coarse", "dst",
              "--solver", "ds", "--platform", "cpu"])
    out = capsys.readouterr().out
    assert "129^2 -> coarse 33^2 [ds]" in out


def test_mg_sharded_requires_ds():
    with pytest.raises(SystemExit, match="requires --solver ds"):
        cli.main(["mg", "--k", "8", "--devices", "2", "--platform", "cpu"])


def test_mg_sharded_ds(capsys):
    cli.main(["mg", "--k", "11", "--solver", "ds", "--devices", "8",
              "--coarse", "dst", "--l", "9", "--platform", "cpu"])
    out = capsys.readouterr().out
    assert "2049^2 -> coarse 513^2 [ds]" in out


def test_ns_fast_guards():
    with pytest.raises(SystemExit, match="f32-only"):
        cli.main(["ns", "--fast", "--f64", "--platform", "cpu"])


def test_ns_fast_smoke(capsys):
    cli.main(["ns", "--nx", "129", "--ny", "65", "--Pr", "0.01",
              "--tol", "1e-7", "--ttot", "0.001", "--fast",
              "--max-steps", "3", "--platform", "cpu"])
    assert "steps: 3" in capsys.readouterr().out
