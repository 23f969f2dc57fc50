"""Matrix-free geometric multigrid for (nabla^2 - c) u = f on 2^k+1 grids.

TPU-first re-design of the reference's recursive V-cycle
(MGsolve_2DPoisson! / Vcycle_2DPoisson!, multigrid.jl:41-170):

- The level count is static given the fine shape, so the V-cycle recursion
  is **unrolled at trace time** — no runtime recursion, no per-cycle buffer
  reallocation (the reference reallocates coarse buffers every cycle because
  the prealloc dict is not passed down, multigrid.jl:105-107; functional JAX
  removes the buffer bookkeeping entirely).
- The outer iterate-to-tolerance loop is a ``lax.while_loop`` with the
  residual check **on device** — the reference syncs device->host for a norm
  after every smooth (multigrid.jl:252); we compute a norm only where the
  algorithm consumes one (final fine-level post-smooth and the coarse-solve
  early exit).
- Smoothing is damped Jacobi with alpha = 4/5 (multigrid.jl:242-258), or
  red-black Gauss-Seidel (two masked half-sweeps; the TPU-parallel form of
  the reference's serial GS, multigrid.jl:269-297).
- Restriction/prolongation are the injection / gather-form-bilinear pair of
  fpr_tpu.ops.transfer.
- Coarse solve: <= 20*coarse_size damped-Jacobi iterations with early exit,
  or matrix-free CG (multigrid.jl:147-162).

Semantics parity notes: 2 pre- + 2 post-smooths; the correction is
*subtracted* (residual is defined as A u - f, multigrid.jl:139); convergence
is r_rms < tol * rms(f) where rms averages over the full grid including the
zero boundary ring (multigrid.jl:53-56); with apply_bcs the full
Dirichlet+Neumann BCs are applied to u at the top of every MG iteration and
the Neumann copy is applied to every transfer (multigrid.jl:60-62, 129, 136).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from fpr_tpu.core import bc
from fpr_tpu.core.config import (
    CoarseSolver,
    ExecutionPolicy,
    MGConfig,
    Restriction,
    Smoother,
)
from fpr_tpu.core.grid import mg_levels
from fpr_tpu.ops import stencil2d


def _smooth_fns(cfg: MGConfig):
    """Resolve (jacobi-or-GS smoother, residual) for the configured policy."""
    if cfg.policy == ExecutionPolicy.PALLAS:
        from fpr_tpu.ops import pallas2d

        residual = pallas2d.residual
        jacobi = pallas2d.jacobi_step
    else:
        residual = stencil2d.residual
        jacobi = stencil2d.jacobi_step

    if cfg.smoother == Smoother.RED_BLACK_GS:
        def smooth(u, f, h, c, with_norm):
            return stencil2d.red_black_gs_step(u, f, h, c, with_norm=with_norm)
    else:
        def smooth(u, f, h, c, with_norm):
            return jacobi(u, f, h, c, alpha=cfg.jacobi_damping, with_norm=with_norm)

    return smooth, residual


def _coarse_solve(u, f, h, c, tol, cfg: MGConfig, smooth):
    """Direct-ish coarse solve (multigrid.jl:145-166)."""
    max_iters = 20 * cfg.coarse_size
    if cfg.coarse_solver == CoarseSolver.CG:
        from fpr_tpu.solvers.krylov import cg

        x, r_rms, _ = cg(f, h, h, c, tol, max_iters, policy=cfg.policy)
        # reference cg! overwrites u with the from-zero solution
        # (krylov.jl:62,88); in MG the incoming u is already zero.
        return u + x, r_rms

    tol_rhs = tol * stencil2d.rms(f)

    def cond(carry):
        _, r_rms, i = carry
        return jnp.logical_and(i < max_iters, r_rms >= tol_rhs)

    def body(carry):
        u, _, i = carry
        u, r_rms = smooth(u, f, h, c, True)
        return u, r_rms, i + 1

    u, r_rms, _ = jax.lax.while_loop(
        cond, body, (u, jnp.asarray(jnp.inf, u.dtype), jnp.asarray(0, jnp.int32))
    )
    return u, r_rms


def vcycle(u, f, h, c, tol, cfg: MGConfig, apply_bcs: bool = False):
    """One V-cycle; returns (u, r_rms of the final fine-level smooth).

    Unrolled at trace time over the static level ladder.
    """
    from fpr_tpu.ops import transfer

    smooth, residual = _smooth_fns(cfg)
    ny, nx = u.shape
    levels = mg_levels(nx, ny, cfg.coarse_size)  # validates 2^k+1 sides
    restrict = (
        transfer.restrict_full_weighting
        if cfg.resolved_restriction() is Restriction.FULL_WEIGHTING
        else transfer.restrict
    )

    def descend(u, f, h, depth):
        nyl, nxl = u.shape
        top = depth == 0
        if min(nxl, nyl) <= cfg.coarse_size:
            return _coarse_solve(u, f, h, c, tol, cfg, smooth)

        # pre-smooth (norms unused -> skipped)
        for _ in range(cfg.pre_smooth):
            u, _ = smooth(u, f, h, c, False)

        # restrict residual
        res = residual(u, f, h, c)
        res_c = restrict(res, apply_bcs=apply_bcs)

        # coarse correction (zero initial guess), recursive
        corr_c = jnp.zeros_like(res_c)
        corr_c, _ = descend(corr_c, res_c, h * 2.0, depth + 1)

        # prolongate and correct (subtract: res = A u - f)
        corr_f = transfer.prolongate(corr_c, u.shape, apply_bcs=apply_bcs)
        u = u - corr_f

        # post-smooth; measure the norm only on the top level's last smooth
        r_rms = None
        for s in range(cfg.post_smooth):
            want = top and (s == cfg.post_smooth - 1)
            u, r = smooth(u, f, h, c, want)
            if want:
                r_rms = r
        return u, r_rms

    assert len(levels) >= 1
    return descend(u, f, h, 0)


def mg_solve(
    u0,
    f,
    h: float,
    c,
    tol: float,
    niters: int,
    apply_bcs: bool = False,
    cfg: MGConfig = MGConfig(),
):
    """Iterate V-cycles until r_rms < tol * rms(f) (MGsolve_2DPoisson!,
    multigrid.jl:41-84).  Returns (u, r_rms, iterations).

    Fully jit-compatible; the convergence loop is a lax.while_loop carrying
    (u, r_rms, iter) with no host syncs.
    """
    f_rms = stencil2d.rms(f)
    tolf = tol * f_rms

    def cond(carry):
        _, r_rms, it = carry
        return jnp.logical_and(it < niters, r_rms >= tolf)

    def body(carry):
        u, _, it = carry
        if apply_bcs:
            u = bc.ns_temperature_bcs(u)
        u, r_rms = vcycle(u, f, h, c, tol, cfg, apply_bcs=apply_bcs)
        return u, r_rms, it + 1

    u, r_rms, it = jax.lax.while_loop(
        cond,
        body,
        (u0, jnp.asarray(jnp.inf, u0.dtype), jnp.asarray(0, jnp.int32)),
    )
    return u, r_rms, it


@functools.partial(jax.jit, static_argnames=("h", "tol", "niters", "apply_bcs", "cfg"))
def mg_solve_jit(u0, f, h, c, tol, niters, apply_bcs=False, cfg=MGConfig()):
    return mg_solve(u0, f, h, c, tol, niters, apply_bcs=apply_bcs, cfg=cfg)
