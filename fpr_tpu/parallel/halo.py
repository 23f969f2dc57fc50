"""Halo exchange over the device mesh via ppermute.

The TPU-native replacement for ImplicitGlobalGrid's ``update_halo!``
(part1_kernel_programming.jl:182,187): inside a shard_map, each shard sends
its boundary face planes to the +/-1 neighbors along a mesh axis over ICI.
Non-periodic edges receive zeros (``lax.ppermute`` zero-fills unlisted
destinations), which is exactly right for the Dirichlet problems here: the
values only ever feed cells masked as global physical boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def exchange_faces_z(local: jnp.ndarray, axis_name: str):
    """Exchange one-plane z-faces of a local (nz_l, ny, nx) block.

    Returns (ghost_below, ghost_above): the neighbor planes to place at
    local z = -1 and z = nz_l (zeros at the global edges).
    """
    n = lax.axis_size(axis_name)
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]
    ghost_below = lax.ppermute(local[-1:, :, :], axis_name, fwd)
    ghost_above = lax.ppermute(local[:1, :, :], axis_name, bwd)
    return ghost_below, ghost_above


def set_ghost_planes_z(padded: jnp.ndarray, axis_name: str):
    """Refresh the z ghost planes of a z-ghost-padded (nz_l+2, ny, nx) block
    from the neighbors' current boundary planes."""
    inner = padded[1:-1, :, :]
    below, above = exchange_faces_z(inner, axis_name)
    padded = padded.at[0:1, :, :].set(below)
    padded = padded.at[-1:, :, :].set(above)
    return padded


def z_mask_bounds(axis_name: str, nz_local: int):
    """(zlo, zhi): local-z index range (inclusive) of updateable cells —
    shard-interior rows are always updateable; the global z faces are not."""
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)
    zlo = jnp.where(idx == 0, 1, 0)
    zhi = jnp.where(idx == n - 1, nz_local - 2, nz_local - 1)
    return zlo, zhi
