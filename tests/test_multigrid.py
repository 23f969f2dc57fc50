"""Multigrid convergence tests — the TPU analog of the reference's
parameterized sweep (test/multigrid.jl:30-58): MG must reach
r_rms < tol * rms(b) within 20 V-cycles for every config in
{policy} x {coarse l} x {grid k} x {jacobi, CG coarse}."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpr_tpu.core.config import CoarseSolver, ExecutionPolicy, MGConfig, Smoother
from fpr_tpu.ops import oracle, stencil2d
from fpr_tpu.solvers import multigrid


def _manufactured(n, h, c, rng):
    xref = np.zeros((n, n))
    xref[1:-1, 1:-1] = rng.random((n - 2, n - 2))
    A = oracle.helmholtz_operator(n - 2, n - 2, h, c)
    b = np.zeros((n, n))
    b[1:-1, 1:-1] = (A @ xref[1:-1, 1:-1].ravel()).reshape(n - 2, n - 2)
    return xref, b


@pytest.mark.parametrize("coarse_solver", [CoarseSolver.JACOBI, CoarseSolver.CG])
@pytest.mark.parametrize("l", [2, 3])
@pytest.mark.parametrize("k", [7, 8, 9, 10])
def test_mg_converges_within_20_vcycles(rng, k, l, coarse_solver):
    n = 2**k + 1
    h = 1.0 / (n - 1)
    c = 0.0
    tol = 1e-6
    cfg = MGConfig(coarse_size=2**l + 1, coarse_solver=coarse_solver)
    _, b = _manufactured(n, h, c, rng)

    u, r_rms, iters = multigrid.mg_solve(
        jnp.zeros((n, n)), jnp.asarray(b), h, c, tol, 20, cfg=cfg
    )
    assert float(r_rms) < tol * np.sqrt((b**2).sum() / n**2)
    assert int(iters) <= 20


def test_mg_converges_large_grid_jit(rng):
    # one bigger grid through the jitted entry (k=9 -> 513^2)
    n = 513
    h = 1.0 / (n - 1)
    tol = 1e-6
    _, b = _manufactured(n, h, 0.0, rng)
    u, r_rms, iters = multigrid.mg_solve_jit(
        jnp.zeros((n, n)), jnp.asarray(b), h, 0.0, tol, 20
    )
    assert float(r_rms) < tol * np.sqrt((b**2).sum() / n**2)
    assert int(iters) <= 20


def test_mg_red_black_gs_smoother(rng):
    n = 129
    h = 1.0 / (n - 1)
    tol = 1e-6
    cfg = MGConfig(smoother=Smoother.RED_BLACK_GS)
    _, b = _manufactured(n, h, 0.0, rng)
    u, r_rms, iters = multigrid.mg_solve(
        jnp.zeros((n, n)), jnp.asarray(b), h, 0.0, tol, 20, cfg=cfg
    )
    assert float(r_rms) < tol * np.sqrt((b**2).sum() / n**2)
    assert int(iters) <= 20


def test_mg_helmholtz_shift(rng):
    # (nabla^2 - c) with c > 0 — the semi-implicit NS solves use this path
    n = 129
    h = 1.0 / (n - 1)
    c = 100.0
    tol = 1e-8
    _, b = _manufactured(n, h, c, rng)
    u, r_rms, iters = multigrid.mg_solve(
        jnp.zeros((n, n)), jnp.asarray(b), h, c, tol, 20
    )
    assert float(r_rms) < tol * np.sqrt((b**2).sum() / n**2)


def test_mg_anisotropic_grid(rng):
    # the NS grid shape 257x65 descends to (17, 5) with coarse_size 5
    ny, nx = 65, 257
    h = 1.0 / (ny - 1)
    b = np.zeros((ny, nx))
    b[1:-1, 1:-1] = rng.random((ny - 2, nx - 2))
    u, r_rms, iters = multigrid.mg_solve(
        jnp.zeros((ny, nx)), jnp.asarray(b), h, 0.0, 1e-6, 30
    )
    assert float(r_rms) < 1e-6 * np.sqrt((b**2).sum() / (nx * ny))


def test_mg_solution_accuracy(rng):
    # the converged iterate approximates the manufactured solution
    n = 129
    h = 1.0 / (n - 1)
    tol = 1e-10
    xref, b = _manufactured(n, h, 0.0, rng)
    u, r_rms, _ = multigrid.mg_solve(
        jnp.zeros((n, n)), jnp.asarray(b), h, 0.0, tol, 50
    )
    rel = np.linalg.norm(np.asarray(u) - xref) / np.linalg.norm(xref)
    assert rel < 1e-8
