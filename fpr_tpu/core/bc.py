"""Boundary-condition appliers.

Functional equivalents of the reference's in-place BC mutators:

- 2D NS temperature BCs (part2_utils.jl:22-39): Dirichlet T=1 on the bottom
  edge / T=0 on the top edge, Neumann (zero-gradient copy) on left/right.
  With our (ny, nx) layout, bottom/top are rows 0 / ny-1 and left/right are
  columns 0 / nx-1.
- 3D diffusion BCs (part1_utils.jl:14-34): Dirichlet 0 on all six *global*
  faces (rank-aware in the reference; here the sharded variant masks by mesh
  position, see fpr_tpu.parallel.halo).
"""

from __future__ import annotations

import jax.numpy as jnp


def dirichlet_top_bottom(T: jnp.ndarray, bottom: float = 1.0, top: float = 0.0):
    """T[:, 1] .= 1 (bottom), T[:, ny] .= 0 (top) — part2_utils.jl:28-32."""
    T = T.at[0, :].set(bottom)
    T = T.at[-1, :].set(top)
    return T


def neumann_left_right(T: jnp.ndarray):
    """T[1, :] .= T[2, :]; T[nx, :] .= T[nx-1, :] — part2_utils.jl:35-39."""
    T = T.at[:, 0].set(T[:, 1])
    T = T.at[:, -1].set(T[:, -2])
    return T


def ns_temperature_bcs(T: jnp.ndarray):
    """Dirichlet bottom/top then Neumann left/right (part2_utils.jl:22-25).

    Order matters at the corners: the Neumann copy runs second and wins,
    exactly as in the reference.
    """
    return neumann_left_right(dirichlet_top_bottom(T))


def dirichlet_faces_3d(H: jnp.ndarray, value: float = 0.0):
    """Dirichlet `value` on all six faces (part1_utils.jl:14-34, single rank)."""
    H = H.at[0, :, :].set(value)
    H = H.at[-1, :, :].set(value)
    H = H.at[:, 0, :].set(value)
    H = H.at[:, -1, :].set(value)
    H = H.at[:, :, 0].set(value)
    H = H.at[:, :, -1].set(value)
    return H


def zero_boundary_2d(a: jnp.ndarray):
    """Zero the one-cell boundary ring of a 2D array."""
    z = jnp.zeros_like(a)
    return z.at[1:-1, 1:-1].set(a[1:-1, 1:-1])


def interior_mask_2d(shape, dtype):
    """1 in the interior, 0 on the boundary ring."""
    m = jnp.zeros(shape, dtype=dtype)
    return m.at[1:-1, 1:-1].set(1)
