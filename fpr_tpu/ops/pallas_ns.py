"""Fused Navier-Stokes operator kernel — all per-step 2D operators in one
HBM pass.

The reference evaluates each NS term with a separate device kernel
(compute_velocity!, compute_Ra_dTdx!, compute_diffusion2d!,
compute_advection2d_{x,y}!, part2.jl:90-137) plus a BC mutator
(part2_utils.jl:22-39) and the Euler / rhs update — 8+ full-array passes
per timestep.  On TPU those passes are HBM-bandwidth- and latency-bound,
so this kernel fuses the WHOLE operator pipeline:

    T <- BCs(T)                      (Dirichlet bottom/top, Neumann sides,
                                      Neumann wins at corners)
    vx =  dS/dy, vy = -dS/dx         (central diff, recomputed from S: one
                                      extra read beats writing two planes)
    B  = Ra dT/dx                    (buoyancy forcing)
    dT2 = k  lap T,  dW2 = Pr lap W  (diffusion)
    dTx/dTy/dWx/dWy                  (first-order upwind advection)
    mode "explicit":  T' = T + dt (dT2 - dTx - dTy)
                      W' = W + dt (dW2 - dWx - dWy - Pr B)
    mode "rhs":       T' = -cT (T + dt ((1-beta) dT2 - dTx - dTy))
                      W' = -cW (W + dt ((1-beta) dW2 - dWx - dWy - Pr B))

into a single pass: 3 planes read (stacked T/W + S), 2 written.  dt, cT,
cW are runtime SMEM scalars (dt is adaptive, part2.jl:76-87); everything
else is compile-time.

Layout: row-padded operands (see fpr_tpu.ops.pallas2d) with T and W
STACKED into one (2, total, nxp) array — the explicit kernel's output is
exactly the next step's input, so the time loop never repacks.  S arrives
as a separate plane (it is produced by the multigrid solve each step).

Boundary semantics match the jnp tier exactly (ns_step,
fpr_tpu/models/navier_stokes.py): T' carries the BC'd boundary (terms are
zero there), W' keeps its original boundary; in rhs mode the boundary rows
carry -c*(field) with zero terms.  Row/column padding stays zero so rms
reductions over the padded array equal physical-domain rms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpr_tpu.ops.pallas2d import (
    PAD,
    _im32,
    _on_tpu,
    padded_cols,
    padded_rows,
)


def _ns_kernel(
    scal_ref, tw_hbm, s_hbm, out_hbm, acc_ref,
    twslabs, sslabs, results, sem_tw, sem_s, sem_out,
    *, BR, ny, nx, nxp, h, Pr, Ra, k, beta, mode,
):
    """One grid step on a BR-row block (halo-1 window of E rows).

    scal_ref (SMEM, (4,1)): [dt, cT, cW, row_off] runtime scalars
    (row_off = the shard's global row offset, 0 single-device).
    tw_hbm: (2, total, nxp) stacked T (plane 0) / W (plane 1).
    s_hbm:  (total, nxp) streamfunction.
    out_hbm: (2, total, nxp) stacked outputs (T'/W' or T_rhs/W_rhs).
    """
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))
    nslot = 1 - slot
    E = BR + 2 * PAD

    def _i32(v):
        return jnp.asarray(v, jnp.int32)

    def copy_tw(block, s):
        block, s = _i32(block), _i32(s)
        return pltpu.make_async_copy(
            tw_hbm.at[:, pl.ds(block * BR, E), :], twslabs.at[s], sem_tw.at[s]
        )

    def copy_s(block, s):
        block, s = _i32(block), _i32(s)
        return pltpu.make_async_copy(
            s_hbm.at[pl.ds(block * BR, E), :], sslabs.at[s], sem_s.at[s]
        )

    def copy_out(block, s):
        block, s = _i32(block), _i32(s)
        return pltpu.make_async_copy(
            results.at[s], out_hbm.at[:, pl.ds(block * BR + PAD, BR), :], sem_out.at[s]
        )

    @pl.when(i == 0)
    def _():
        copy_tw(0, 0).start()
        copy_s(0, 0).start()

    @pl.when(i + 1 < n_blocks)
    def _():
        copy_tw(i + 1, nslot).start()
        copy_s(i + 1, nslot).start()

    copy_tw(i, slot).wait()
    copy_s(i, slot).wait()

    @pl.when(i >= 2)
    def _():
        copy_out(i - 2, slot).wait()

    T = twslabs[slot, 0, :, :]
    W = twslabs[slot, 1, :, :]
    S = sslabs[slot, :, :]
    dtype = T.dtype
    dt = scal_ref[0, 0]
    off = scal_ref[3, 0].astype(jnp.int32)

    gy = off + i * BR - PAD + jax.lax.broadcasted_iota(jnp.int32, (E, nxp), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (E, nxp), 1)

    def sh_up(v):  # value at row-1 (toward gy=0)
        return jnp.concatenate([v[:1, :], v[:-1, :]], axis=0)

    def sh_dn(v):  # value at row+1
        return jnp.concatenate([v[1:, :], v[-1:, :]], axis=0)

    def sh_lf(v):  # value at col-1
        return jnp.concatenate([v[:, :1], v[:, :-1]], axis=1)

    def sh_rt(v):  # value at col+1
        return jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1)

    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)

    # --- T boundary conditions (part2_utils.jl:22-39): Dirichlet rows
    # first, Neumann column copies second (Neumann wins at the corners,
    # matching bc.ns_temperature_bcs).  Applied over the whole window so
    # halo rows/cols feeding the stencils see BC'd values too.
    T = jnp.where(gy == 0, one, jnp.where(gy == ny - 1, zero, T))
    T = jnp.where(gx == 0, sh_rt(T), jnp.where(gx == nx - 1, sh_lf(T), T))

    _2h = jnp.asarray(0.5 / h, dtype)
    _h = jnp.asarray(1.0 / h, dtype)
    _h2 = jnp.asarray(1.0 / (h * h), dtype)

    # velocity = curl of S (part2.jl:90-96)
    vx = (sh_dn(S) - sh_up(S)) * _2h
    vy = -(sh_rt(S) - sh_lf(S)) * _2h

    # buoyancy Ra dT/dx (part2.jl:98-104)
    B = jnp.asarray(Ra, dtype) * (sh_rt(T) - sh_lf(T)) * _2h

    # diffusion (part2.jl:106-113) — skipped entirely when fully implicit
    # (beta == 1 zeroes its weight; the reference skips the kernels too,
    # part2.jl:205-208)
    use_dif = abs(beta - 1.0) > 1e-8
    if use_dif:
        dT2 = jnp.asarray(k, dtype) * (
            (sh_up(T) + sh_dn(T) + sh_lf(T) + sh_rt(T) - 4.0 * T) * _h2
        )
        dW2 = jnp.asarray(Pr, dtype) * (
            (sh_up(W) + sh_dn(W) + sh_lf(W) + sh_rt(W) - 4.0 * W) * _h2
        )
    else:
        dT2 = zero
        dW2 = zero

    # first-order upwind advection (part2.jl:116-137)
    def upwind_x(F):
        back = (F - sh_lf(F)) * _h
        fwd = (sh_rt(F) - F) * _h
        return vx * jnp.where(vx > 0, back, fwd)

    def upwind_y(F):
        back = (F - sh_up(F)) * _h
        fwd = (sh_dn(F) - F) * _h
        return vy * jnp.where(vy > 0, back, fwd)

    dTx, dTy = upwind_x(T), upwind_y(T)
    dWx, dWy = upwind_x(W), upwind_y(W)

    interior = (gy > 0) & (gy < ny - 1) & (gx > 0) & (gx < nx - 1)
    phys = (gy >= 0) & (gy < ny) & (gx < nx)
    PrB = jnp.asarray(Pr, dtype) * B

    if mode == "explicit":
        termT = dT2 - dTx - dTy
        termW = dW2 - dWx - dWy - PrB
        T_out = jnp.where(phys, jnp.where(interior, T + dt * termT, T), zero)
        W_out = jnp.where(phys, jnp.where(interior, W + dt * termW, W), zero)
    else:  # "rhs": Helmholtz right-hand sides (part2.jl:219-226)
        cT = scal_ref[1, 0]
        cW = scal_ref[2, 0]
        wdif = jnp.asarray(1.0 - beta, dtype)
        termT = jnp.where(interior, wdif * dT2 - dTx - dTy, zero)
        termW = jnp.where(interior, wdif * dW2 - dWx - dWy - PrB, zero)
        T_out = jnp.where(phys, -cT * (T + dt * termT), zero)
        W_out = jnp.where(phys, -cW * (W + dt * termW), zero)

    blk = slice(PAD, PAD + BR)
    T_blk = T_out[blk, :]
    W_blk = W_out[blk, :]
    results[slot, 0, :, :] = T_blk
    results[slot, 1, :, :] = W_blk

    # field sums of squares (zero outside the physical domain, so the block
    # sums equal physical-domain sums): the NS loop's multigrid tolerances
    # tol*rms(field) then need no standalone XLA reduction pass
    @pl.when(i == 0)
    def _():
        acc_ref[0, 0] = jnp.asarray(0.0, dtype)
        acc_ref[1, 0] = jnp.asarray(0.0, dtype)

    acc_ref[0, 0] += jnp.sum(T_blk * T_blk)
    acc_ref[1, 0] += jnp.sum(W_blk * W_blk)
    copy_out(i, slot).start()

    @pl.when(i == n_blocks - 1)
    def _():
        @pl.when(n_blocks >= 2)
        def _():
            copy_out(i - 1, nslot).wait()

        copy_out(i, slot).wait()


@functools.lru_cache(maxsize=128)
def _build_ns(ny, nx, dtype_name, layout_br, h, Pr, Ra, k, beta, mode, interpret,
              ny_mask=None):
    dtype = jnp.dtype(dtype_name)
    total = padded_rows(ny, layout_br)
    nxp = padded_cols(nx)
    # ~18 live (E, nxp) planes (3 streams double-buffered + term
    # temporaries); block at half the layout br to keep scratch + Mosaic
    # spills inside VMEM (same trick as the ds defect kernel) — the padded
    # total is unchanged because layout_br is a multiple of 16
    BR = layout_br // 2 if layout_br >= 32 else layout_br
    n_blocks = (total - 2 * PAD) // BR
    assert n_blocks * BR == total - 2 * PAD, (total, layout_br, BR)
    kernel = functools.partial(
        _ns_kernel,
        BR=BR, ny=ny_mask if ny_mask is not None else ny, nx=nx, nxp=nxp,
        h=h, Pr=Pr, Ra=Ra, k=k, beta=beta, mode=mode,
    )
    word = dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((4, 1), lambda i: _im32(0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((2, total, nxp), lambda i: _im32(0, 0, 0), memory_space=pl.ANY),
            pl.BlockSpec((total, nxp), lambda i: _im32(0, 0), memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (2, total, nxp), lambda i: _im32(0, 0, 0), memory_space=pl.ANY
            ),
            pl.BlockSpec((2, 1), lambda i: _im32(0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, total, nxp), dtype),
            jax.ShapeDtypeStruct((2, 1), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, BR + 2 * PAD, nxp), dtype),
            pltpu.VMEM((2, BR + 2 * PAD, nxp), dtype),
            pltpu.VMEM((2, 2, BR, nxp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=60 * ny * nx,
            bytes_accessed=5 * word * ny * nx,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )


def ns_fused_rp(tw_rp, s_rp, dt, ny, nx, br, h, Pr, Ra, k=1.0, beta=0.0,
                mode="explicit", cT=None, cW=None, with_sumsq=False,
                row_off=0, ny_mask=None):
    """Fused NS operator pass on row-padded operands.

    tw_rp: (2, total, nxp) stacked T/W; s_rp: (total, nxp) streamfunction.
    dt (and cT, cW in rhs mode) are runtime scalars.  Returns the stacked
    (2, total, nxp) result: (T', W') in explicit mode, (T_rhs, W_rhs) in
    rhs mode.  with_sumsq=True additionally returns the two output fields'
    sums of squares (SMEM-accumulated — the multigrid tolerances
    tol*rms(field) then need no separate reduction pass).
    """
    dtype = tw_rp.dtype
    call = _build_ns(
        ny, nx, jnp.dtype(dtype).name, br,
        float(h), float(Pr), float(Ra), float(k), float(beta), mode,
        not _on_tpu(), ny_mask=ny_mask,
    )
    z = jnp.asarray(0.0, dtype)
    scal = jnp.stack([
        jnp.asarray(dt, dtype),
        z if cT is None else jnp.asarray(cT, dtype),
        z if cW is None else jnp.asarray(cW, dtype),
        jnp.asarray(row_off, dtype),
    ]).reshape(4, 1)
    out, acc = call(scal, tw_rp, s_rp)
    if with_sumsq:
        return out, (acc[0, 0], acc[1, 0])
    return out
