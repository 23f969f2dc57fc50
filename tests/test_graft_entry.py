"""The driver's entry points must always compile and run."""

import sys

import jax
import numpy as np
import pytest


def _load():
    sys.path.insert(0, ".")
    import __graft_entry__ as g

    return g


def test_entry_compiles_and_runs():
    g = _load()
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    T, W, S, dt = out
    assert T.shape == W.shape == S.shape
    assert np.isfinite(np.asarray(T)).all()
    assert float(dt) > 0


def test_dryrun_multichip_8():
    g = _load()
    g.dryrun_multichip(8)  # conftest provides 8 virtual CPU devices
