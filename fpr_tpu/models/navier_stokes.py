"""2D streamfunction-vorticity Navier-Stokes (thermal convection).

TPU-native rebuild of the reference NS driver (navier_stokes_2D,
part2.jl:140-262): Rayleigh-Benard-style convection in a rectangular box,
hot bottom / cold top, with

    dT/dt = nabla^2 T            - (v . grad) T
    dW/dt = Pr nabla^2 W         - (v . grad) W + Pr Ra dT/dx
    nabla^2 S = W,   (vx, vy) = (dS/dy, -dS/dx)

All linear solves (streamfunction each step; Helmholtz solves for T and W
when beta > 0) go through the matrix-free geometric multigrid of
fpr_tpu.solvers.multigrid.

Design: one jitted ``step`` function per config — the MG convergence loops
are on-device lax.while_loops; the only host sync per step is the adaptive
dt scalar (the reference syncs the same way, part2.jl:196, plus a host
reduction per smooth that we eliminate).  The physical time loop runs on
host because the step count is data-dependent through dt.

Timestepping parity (part2.jl:216-231):
- explicit (beta = 0):       forward-Euler with upwind advection;
- semi-implicit (beta=0.5) / implicit (beta=1): solve
      (nabla^2 - c) T_new = -c (T + dt ((1-beta) dT2 - dTx - dTy)),
  c = 1/(beta dt), and the analogous W solve with c/Pr and the
  -Pr*Ra*dT/dx forcing folded into the rhs.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fpr_tpu.core import bc
from fpr_tpu.core.config import InitScheme, NSConfig
from fpr_tpu.ops import stencil2d as ops
from fpr_tpu.solvers.multigrid import mg_solve, mg_solve_mixed


@dataclasses.dataclass
class NSResult:
    """Output fields (reference SimOut_t, part2.jl:49-55)."""

    T: np.ndarray
    W: np.ndarray
    S: np.ndarray
    t_elapsed: float
    timed_iters: int
    steps: int
    sim_time: float
    snapshots: Optional[list] = None


def init_field(cfg: NSConfig, scheme: InitScheme, key=None, array=None, dtype=jnp.float64):
    """Initial condition builder (init_array!, part2.jl:58-73)."""
    ny, nx = cfg.ny, cfg.nx
    if scheme is InitScheme.COSINE:
        ix = np.arange(nx)
        row = 0.5 * (1.0 + np.cos(3.0 * np.pi * ix * cfg.h / cfg.width))
        return jnp.asarray(np.broadcast_to(row, (ny, nx)), dtype=dtype)
    if scheme is InitScheme.RANDOM:
        key = key if key is not None else jax.random.PRNGKey(0)
        return jax.random.uniform(key, (ny, nx), dtype=dtype)
    if scheme is InitScheme.FROM_ARRAY:
        if array is None:
            raise ValueError("InitScheme.FROM_ARRAY requires an array")
        return jnp.asarray(array, dtype=dtype)
    raise ValueError(scheme)


def compute_dt(vx, vy, cfg: NSConfig):
    """Adaptive timestep (compute_dt, part2.jl:76-87), on device."""
    vmax2 = jnp.max(vx * vx + vy * vy)
    ax = jnp.max(jnp.abs(vx))
    ay = jnp.max(jnp.abs(vy))
    dt_adv = cfg.a_adv * jnp.minimum(cfg.h / ax, cfg.h / ay)  # inf when v=0
    dt = dt_adv if cfg.beta >= 0.5 else jnp.minimum(cfg.dt_dif, dt_adv)
    return jnp.where(vmax2 == 0.0, cfg.dt_dif, dt)


def _semi_implicit(beta: float) -> bool:
    # the reference tests beta != 1 with isapprox (part2.jl:205)
    return beta > 0.0


def _needs_diffusion_term(beta: float) -> bool:
    return abs(beta - 1.0) > 1e-8


def ns_step(T, W, S, cfg: NSConfig):
    """One NS timestep; returns (T, W, S, dt).  Pure; jit with cfg static."""
    h = cfg.h
    solve = mg_solve_mixed if cfg.mg_solver == "mixed" else mg_solve

    # 1. streamfunction solve  nabla^2 S = W, Dirichlet 0 (part2.jl:187)
    S, _, _ = solve(S, W, h, 0.0, cfg.tol, cfg.niters, apply_bcs=False, cfg=cfg.mg)

    # 2. velocity from S (part2.jl:190-193)
    vx, vy = ops.velocity(S, h, h)

    # 3. adaptive dt (part2.jl:196)
    dt = compute_dt(vx, vy, cfg)

    # 4. temperature BCs (part2.jl:199)
    T = bc.ns_temperature_bcs(T)

    # 5. buoyancy term (part2.jl:202)
    Ra_dTdx = ops.buoyancy(T, cfg.Ra, h)

    # 6. diffusion terms, skipped for fully implicit (part2.jl:205-208)
    if _needs_diffusion_term(cfg.beta):
        dT2 = ops.diffusion(T, cfg.k, h, h)
        dW2 = ops.diffusion(W, cfg.Pr, h, h)
    else:
        dT2 = jnp.zeros_like(T)
        dW2 = jnp.zeros_like(W)

    # 7. upwind advection (part2.jl:211-214)
    dTx = ops.advection_x(T, vx, h)
    dTy = ops.advection_y(T, vy, h)
    dWx = ops.advection_x(W, vx, h)
    dWy = ops.advection_y(W, vy, h)

    # 8. Euler / Helmholtz update (part2.jl:216-231)
    if _semi_implicit(cfg.beta):
        c = 1.0 / (cfg.beta * dt)
        T_rhs = -c * (T + dt * ((1.0 - cfg.beta) * dT2 - dTx - dTy))
        T, _, _ = solve(T, T_rhs, h, c, cfg.tol, cfg.niters, apply_bcs=True, cfg=cfg.mg)
        cW = c / cfg.Pr
        W_rhs = -cW * (W + dt * ((1.0 - cfg.beta) * dW2 - dWx - dWy - cfg.Pr * Ra_dTdx))
        W, _, _ = solve(W, W_rhs, h, cW, cfg.tol, cfg.niters, apply_bcs=False, cfg=cfg.mg)
    else:
        T = T + dt * (dT2 - dTx - dTy)
        W = W + dt * (dW2 - dWx - dWy - cfg.Pr * Ra_dTdx)

    return T, W, S, dt


@functools.partial(jax.jit, static_argnames=("cfg",))
def ns_step_jit(T, W, S, cfg: NSConfig):
    return ns_step(T, W, S, cfg)


def simulate(
    cfg: NSConfig = NSConfig(),
    W0=None,
    T0=None,
    max_steps: Optional[int] = None,
    verbose: bool = False,
    snapshot_every: int = 0,
    dtype=jnp.float64,
    seed: int = 0,
) -> NSResult:
    """Run the simulation until sim_time >= ttot (part2.jl:181-250).

    max_steps=1 reproduces the reference's testmode (single full step).
    snapshot_every > 0 stores (T, W, S) every that-many steps (the
    reference's do_vis JLD snapshots, part2.jl:236-245).
    """
    key = jax.random.PRNGKey(seed)
    T = init_field(cfg, cfg.T_init, key=key, dtype=dtype) if T0 is None else jnp.asarray(T0, dtype)
    W = init_field(cfg, cfg.W_init, key=key, dtype=dtype) if W0 is None else jnp.asarray(W0, dtype)
    S = jnp.zeros((cfg.ny, cfg.nx), dtype=dtype)

    snapshots = [] if snapshot_every else None
    sim_time = 0.0
    step = 0
    tic = time.time()
    while sim_time < cfg.ttot:
        if step == 3:  # warmup exclusion (part2.jl:182-184)
            tic = time.time()
        T, W, S, dt = ns_step_jit(T, W, S, cfg)
        sim_time += float(dt)  # the one host sync per step
        step += 1
        if snapshot_every and (step - 1) % snapshot_every == 0:
            snapshots.append((np.asarray(T), np.asarray(W), np.asarray(S)))
        if verbose and (step - 1) % 20 == 0:
            print(f"time, step: {sim_time} {step}")
        if max_steps is not None and step >= max_steps:
            break
    jax.block_until_ready(T)
    t_elapsed = time.time() - tic

    return NSResult(
        T=np.asarray(T),
        W=np.asarray(W),
        S=np.asarray(S),
        t_elapsed=t_elapsed,
        timed_iters=max(step - 3, 0),
        steps=step,
        sim_time=sim_time,
        snapshots=snapshots,
    )
