"""3D dual-time diffusion stencil — plain-jnp tier ("array programming").

The pseudo-transient residual and update (reference
diffusion_3D_step_tau, part1_kernel_programming.jl:46-58):

    dHdtau = (Htau - Ht)/dt - D * nabla^2 Htau        (interior)
    Htau'  = Htau - dtau * dHdtau                     (interior)

Boundary cells are left untouched (Dirichlet faces stay at their initial
value).  The flux-form macros @qx/@qy/@qz of the reference telescope into
exactly this 7-point Laplacian.

The array-programming variant of the reference
(part1_array_programming.jl:9-18) computes the same update with opposite
sign bookkeeping; both are provided for parity, sharing this implementation.

Arrays are (nz, ny, nx), x last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lap3d_interior(H, _dx2, _dy2, _dz2):
    Hi = H[1:-1, 1:-1, 1:-1]
    return (
        (H[1:-1, 1:-1, 2:] - 2.0 * Hi + H[1:-1, 1:-1, :-2]) * _dx2
        + (H[1:-1, 2:, 1:-1] - 2.0 * Hi + H[1:-1, :-2, 1:-1]) * _dy2
        + (H[2:, 1:-1, 1:-1] - 2.0 * Hi + H[:-2, 1:-1, 1:-1]) * _dz2
    )


def dual_time_step(Ht, Htau, dt, dtau, dx, dy, dz, D, with_norm=True):
    """One pseudo-time iteration.

    Returns (Htau_new, sumsq) where sumsq = sum(dHdtau^2) over the interior
    (the boundary residual is identically zero in the reference since the
    residual buffer starts at @zeros and is never written there).  The caller
    turns sumsq into the convergence error err = sqrt(psum(sumsq)) * dt /
    sqrt(total_N) (part1_kernel_programming.jl:191).
    """
    _dx2, _dy2, _dz2 = 1.0 / (dx * dx), 1.0 / (dy * dy), 1.0 / (dz * dz)
    Hi = Htau[1:-1, 1:-1, 1:-1]
    dHdtau = (Hi - Ht[1:-1, 1:-1, 1:-1]) / dt - D * _lap3d_interior(
        Htau, _dx2, _dy2, _dz2
    )
    Htau_new = Htau.at[1:-1, 1:-1, 1:-1].set(Hi - dtau * dHdtau)
    sumsq = jnp.sum(dHdtau * dHdtau) if with_norm else None
    return Htau_new, sumsq


def dual_time_step_ext3(
    Ht, H_ext, dt, dtau, dx, dy, dz, D,
    zlo, zhi, ylo, yhi, xlo, xhi, with_norm=True,
):
    """Pseudo-time iteration on a fully ghost-padded local block
    (nz_l+2, ny_l+2, nx_l+2) — the uniform code path for arbitrary 3D
    Cartesian mesh decompositions (ghosts come from ppermute on sharded
    dims and stay zero on global edges; see parallel.halo).

    (zlo..xhi): inclusive local index ranges of updateable cells per dim.
    Returns (H_ext', sumsq).
    """
    nzl, nyl, nxl = Ht.shape
    C = H_ext[1:-1, 1:-1, 1:-1]
    lap = (
        (H_ext[1:-1, 1:-1, 2:] - 2.0 * C + H_ext[1:-1, 1:-1, :-2]) / (dx * dx)
        + (H_ext[1:-1, 2:, 1:-1] - 2.0 * C + H_ext[1:-1, :-2, 1:-1]) / (dy * dy)
        + (H_ext[2:, 1:-1, 1:-1] - 2.0 * C + H_ext[:-2, 1:-1, 1:-1]) / (dz * dz)
    )
    dHdtau = (C - Ht) / dt - D * lap

    gz = jax.lax.broadcasted_iota(jnp.int32, Ht.shape, 0)
    gy = jax.lax.broadcasted_iota(jnp.int32, Ht.shape, 1)
    gx = jax.lax.broadcasted_iota(jnp.int32, Ht.shape, 2)
    interior = (
        (gz >= zlo) & (gz <= zhi)
        & (gy >= ylo) & (gy <= yhi)
        & (gx >= xlo) & (gx <= xhi)
    )
    dHdtau = jnp.where(interior, dHdtau, 0.0)
    new = H_ext.at[1:-1, 1:-1, 1:-1].set(C - dtau * dHdtau)
    sumsq = jnp.sum(dHdtau * dHdtau) if with_norm else None
    return new, sumsq


def dual_time_step_overlap_z(
    Ht, H_local, ghost_lo, ghost_hi, dt, dtau, dx, dy, dz, D,
    zlo, zhi, with_norm=True,
):
    """Pseudo-time iteration with communication overlap (the reference's
    @hide_communication, part1_kernel_programming.jl:185-188).

    H_local is the unpadded local block; ghost_lo/ghost_hi are the neighbor
    z-faces from an in-flight ppermute.  The interior planes (local z in
    [1, nz_l-1)) are computed WITHOUT any ghost dependency, so XLA's
    latency-hiding scheduler can run the collective concurrently; only the
    two shard-edge planes consume the ghosts.  Numerically identical to the
    ghost-padded step (tests/test_distributed.py).
    """
    nzl, nyl, nxl = Ht.shape

    def lat_lap(block):
        """y/x Laplacian terms for a z-slice range (edge dups are masked)."""
        ym = jnp.concatenate([block[:, :1, :], block[:, :-1, :]], axis=1)
        yp = jnp.concatenate([block[:, 1:, :], block[:, -1:, :]], axis=1)
        xm = jnp.concatenate([block[:, :, :1], block[:, :, :-1]], axis=2)
        xp = jnp.concatenate([block[:, :, 1:], block[:, :, -1:]], axis=2)
        return (xp - 2.0 * block + xm) / (dx * dx) + (yp - 2.0 * block + ym) / (dy * dy)

    def finish(rows, zm, zp, ht_rows, z_start, n_rows):
        lap = lat_lap(rows) + (zp - 2.0 * rows + zm) / (dz * dz)
        dH = (rows - ht_rows) / dt - D * lap
        gz = z_start + jax.lax.broadcasted_iota(jnp.int32, rows.shape, 0)
        gy = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
        gx = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 2)
        m = (
            (gz >= zlo) & (gz <= zhi)
            & (gy > 0) & (gy < nyl - 1)
            & (gx > 0) & (gx < nxl - 1)
        )
        dH = jnp.where(m, dH, 0.0)
        return rows - dtau * dH, dH

    # interior planes: ghosts not needed
    mid, dH_mid = finish(
        H_local[1:-1], H_local[:-2], H_local[2:], Ht[1:-1], 1, nzl - 2
    )
    # edge planes: consume the (by now arrived) ghosts
    first, dH_first = finish(
        H_local[:1], ghost_lo, H_local[1:2], Ht[:1], 0, 1
    )
    last, dH_last = finish(
        H_local[-1:], H_local[-2:-1], ghost_hi, Ht[-1:], nzl - 1, 1
    )
    new = jnp.concatenate([first, mid, last], axis=0)
    sumsq = (
        jnp.sum(dH_mid * dH_mid)
        + jnp.sum(dH_first * dH_first)
        + jnp.sum(dH_last * dH_last)
        if with_norm
        else None
    )
    return new, sumsq


def init_gaussian(grid, dtype=jnp.float32, x0=None, y0=None, z0=None):
    """H = 2 exp(-((x-cx)^2 + (y-cy)^2 + (z-cz)^2)) at cell centers
    (part1_utils.jl:1-12), center = domain center by default.

    x0/y0/z0 optionally override the coordinate origin offsets for sharded
    grids (each shard passes its global offset).
    """
    import numpy as np

    cx, cy, cz = grid.lx / 2, grid.ly / 2, grid.lz / 2
    x = (np.arange(grid.nx) + 0.5) * grid.dx + (x0 or 0.0)
    y = (np.arange(grid.ny) + 0.5) * grid.dy + (y0 or 0.0)
    z = (np.arange(grid.nz) + 0.5) * grid.dz + (z0 or 0.0)
    X = x.reshape(1, 1, -1)
    Y = y.reshape(1, -1, 1)
    Z = z.reshape(-1, 1, 1)
    H = 2.0 * np.exp(-((X - cx) ** 2 + (Y - cy) ** 2 + (Z - cz) ** 2))
    return jnp.asarray(H, dtype=dtype)
