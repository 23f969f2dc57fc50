"""On-device reductions and distributed norms.

Replaces the reference's host-side reductions (sum(res.^2) at
multigrid.jl:252, krylov.jl:64-85) and MPI.Allreduce-based distributed norm
(dist_norm_L2, part1_utils.jl:36-40).  Everything stays on device; inside a
shard_map the global variants psum over the mesh axes (the ICI analog of
Allreduce over the Cartesian communicator).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sumsq(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * a)


def rms(a: jnp.ndarray) -> jnp.ndarray:
    """sqrt(sum(a^2) / N) over the full local array."""
    return jnp.sqrt(sumsq(a) / a.size)


def dist_norm_l2(a: jnp.ndarray, axis_names=()) -> jnp.ndarray:
    """sqrt(global sum of squares) — part1_utils.jl:36-40.

    Inside shard_map, pass the mesh axis names to psum over; outside, this
    is just the local L2 norm.
    """
    s = sumsq(a)
    if axis_names:
        s = jax.lax.psum(s, axis_names)
    return jnp.sqrt(s)


def dist_sumsq(s: jnp.ndarray, axis_names=()) -> jnp.ndarray:
    """psum an already-computed local sum of squares."""
    if axis_names:
        s = jax.lax.psum(s, axis_names)
    return s
