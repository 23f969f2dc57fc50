"""Multi-chip 3D pseudo-transient diffusion: shard_map over a device mesh.

The TPU-native rebuild of the reference's multi-XPU path
(diffusion_3D_kernel_programming, part1_kernel_programming.jl:99-228):

- 1D z-decomposition of the global grid over a mesh axis (the reference
  uses a 3D MPI rank grid; on a TPU slice the z-slab decomposition keeps
  full (y, x) planes on the lanes and rides ICI for the two face planes);
- ``update_halo!`` -> ``lax.ppermute`` of face planes (parallel.halo);
- ``MPI.Allreduce`` of the convergence norm -> ``lax.psum``
  (part1_utils.jl:36-40);
- per-rank local grids of cfg.nz planes each, with optional physical-size
  scaling for weak-scaling runs (part1_kernel_programming.jl:106-114);
- the whole inner pseudo-time loop (stencil + halo exchange + global norm)
  runs on-device inside shard_map; the host syncs once per physical step.

The local stencil is the fused Pallas kernel (ExecutionPolicy.PALLAS, TPU)
or the jnp tier (CPU / virtual-device testing).  The z-ghost-padded local
state is exactly the Pallas kernel's native layout, so halo exchange writes
straight into the kernel's ghost planes.
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from fpr_tpu.core.config import DiffusionConfig, ExecutionPolicy
from fpr_tpu.core.grid import Grid3D, outer_steps, pseudo_timestep
from fpr_tpu.ops import stencil3d
from fpr_tpu.parallel import halo
from fpr_tpu.utils.timing import BenchResults, diffusion_bench_results


@dataclasses.dataclass
class DistDiffusionResult:
    H: np.ndarray            # gathered global field (nz_g, ny, nx)
    iters_total: int
    timed_iters: int
    bench: BenchResults
    converged: bool
    n_devices: int


def _global_grid(cfg: DiffusionConfig, n_shards: int) -> Grid3D:
    lz = cfg.lz * n_shards if cfg.scale_physical_size else cfg.lz
    return Grid3D(cfg.nx, cfg.ny, cfg.nz * n_shards, cfg.lx, cfg.ly, lz)


def build_step(cfg: DiffusionConfig, mesh: Mesh, axis: str = "z"):
    """Build the jitted distributed physical step.

    Takes/returns globally-sharded (nz_g, ny, nx) arrays; internally each
    shard pads once, then iterates (halo exchange -> fused stencil ->
    psum norm) in an on-device while_loop.
    """
    n_shards = mesh.shape[axis]
    grid = _global_grid(cfg, n_shards)
    dtau = pseudo_timestep(grid.dx, grid.dy, grid.dz, cfg.D)
    total_n = grid.n
    sqrt_n = float(np.sqrt(total_n))
    kw = dict(dt=cfg.dt, dtau=dtau, dx=grid.dx, dy=grid.dy, dz=grid.dz, D=cfg.D)
    use_pallas = cfg.policy == ExecutionPolicy.PALLAS

    local_shape = (cfg.nz, cfg.ny, cfg.nx)

    def shard_body(Ht_l, Htau_l):
        zlo, zhi = halo.z_mask_bounds(axis, cfg.nz)
        if use_pallas:
            from fpr_tpu.ops import pallas3d

            Hp = pallas3d.pad3d(Htau_l)
            Ht_in = pallas3d.pad_ht(Ht_l)
        else:
            Hp = jnp.pad(Htau_l, ((1, 1), (0, 0), (0, 0)))
            Ht_in = Ht_l

        def cond(carry):
            _, err, it = carry
            return jnp.logical_and(err > cfg.tol, it < cfg.iter_max)

        def body(carry):
            Hp, _, it = carry
            Hp = halo.set_ghost_planes_z(Hp, axis)
            if use_pallas:
                from fpr_tpu.ops import pallas3d

                Hp, sumsq = pallas3d.dual_time_step_padded(
                    Ht_in, Hp, local_shape, z_bounds=(zlo, zhi), **kw
                )
            else:
                Hp, sumsq = stencil3d.dual_time_step_zext(
                    Ht_in, Hp, zlo=zlo, zhi=zhi, **kw
                )
            err = jnp.sqrt(jax.lax.psum(sumsq, axis)) * cfg.dt / sqrt_n
            return Hp, err.astype(Hp.dtype), it + 1

        Hp, err, iters = jax.lax.while_loop(
            cond,
            body,
            (Hp, jnp.asarray(jnp.inf, Hp.dtype), jnp.asarray(0, jnp.int32)),
        )
        if use_pallas:
            from fpr_tpu.ops import pallas3d

            Ht_new = pallas3d.unpad3d(Hp, local_shape)
        else:
            Ht_new = Hp[1:-1, :, :]
        return Ht_new, Ht_new, err, iters

    spec = P(axis, None, None)
    try:
        # pallas_call outputs don't carry vma metadata yet; disable the check
        step = shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(spec, spec),
            out_specs=(spec, spec, P(), P()),
            check_vma=False,
        )
    except TypeError:  # older jax: the flag was called check_rep
        step = shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(spec, spec),
            out_specs=(spec, spec, P(), P()),
            check_rep=False,
        )
    return jax.jit(step), grid


def solve_distributed(
    cfg: DiffusionConfig = DiffusionConfig(),
    mesh: Mesh | None = None,
    axis: str = "z",
    dtype=jnp.float32,
    verbose: bool = False,
) -> DistDiffusionResult:
    """Distributed solve mirroring the reference driver loop
    (part1_kernel_programming.jl:166-204), one host sync per physical step."""
    from fpr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh() if mesh is None else mesh
    n_shards = mesh.shape[axis]
    step, grid = build_step(cfg, mesh, axis)
    nt = outer_steps(cfg.ttot, cfg.dt)

    from fpr_tpu.core import bc

    Ht_host = stencil3d.init_gaussian(grid, dtype=dtype)
    Ht_host = bc.dirichlet_faces_3d(Ht_host)
    sharding = NamedSharding(mesh, P(axis, None, None))
    Ht = jax.device_put(Ht_host, sharding)
    Htau = Ht

    iters_total = 0
    timed_iters = 0
    converged = True
    tic = time.time()
    for it_outer in range(nt):
        if it_outer == 3:  # warmup (ref :170-176)
            jax.block_until_ready(Ht)
            tic = time.time()
            timed_iters = 0
        Ht, Htau, err, iters = step(Ht, Htau)
        n_it = int(iters)
        iters_total += n_it
        timed_iters += n_it
        if n_it >= cfg.iter_max:
            converged = False
        if verbose:
            print(f"step {it_outer}: {n_it} iters, err={float(err):.3e}")
    jax.block_until_ready(Ht)
    delta_t = time.time() - tic

    model = "fused" if cfg.policy == ExecutionPolicy.PALLAS else "plain"
    bench = diffusion_bench_results(
        delta_t, timed_iters, cfg.nx, cfg.ny, cfg.nz,
        word_bytes=jnp.dtype(dtype).itemsize, model=model, n_devices=n_shards,
    )
    return DistDiffusionResult(
        H=np.asarray(Ht),  # gather! analog (part1_kernel_programming.jl:223)
        iters_total=iters_total,
        timed_iters=timed_iters,
        bench=bench,
        converged=converged,
        n_devices=n_shards,
    )
