"""Matrix-free Krylov solvers for (nabla^2 - c) x = b.

- ``cg``: unpreconditioned conjugate gradient (reference cg!,
  krylov.jl:55-91): textbook CG with the matrix-free 5-point matvec,
  convergence on ||r|| < tol * ||b||, starting from x = 0.  Runs fully
  on-device inside a lax.while_loop (the reference syncs a host reduction
  per iteration).
- ``mg_preconditioned_cg``: PCG with one multigrid V-cycle as the
  preconditioner M^-1 — a composition the reference does not have (it only
  benchmarks MG-as-solver vs CG-at-coarse-level, multigrid_bench.jl:27);
  this is the BASELINE north-star "MG-preconditioned CG" config.

Deviation from the reference, on purpose: the reference's matvec writes only
the interior of its output buffer, so the *boundary* of p_hat silently keeps
whatever the buffer held before (krylov.jl:59-68) — a latent stale-state
quirk that only stays benign because every real caller passes a rhs with a
zero boundary ring.  Our matvec returns an exact linear operator (zero
boundary); for zero-boundary rhs the iterates are bitwise the same
algorithm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fpr_tpu.core.config import ExecutionPolicy, MGConfig
from fpr_tpu.ops import stencil2d


def _matvec_for(policy: ExecutionPolicy):
    if policy == ExecutionPolicy.PALLAS:
        from fpr_tpu.ops import pallas2d

        return pallas2d.matvec
    return stencil2d.matvec


def cg(b, hx, hy, c, tol, nmax: int, policy=ExecutionPolicy.JNP):
    """Solve (nabla^2 - c) x = b from x=0.  Returns (x, r_rms, iters)."""
    matvec = _matvec_for(policy)
    normb = jnp.sqrt(jnp.sum(b * b))
    tolb = tol * normb

    def cond(carry):
        _, _, _, _, normr, i = carry
        return jnp.logical_and(i < nmax, normr >= tolb)

    def body(carry):
        x, r, p, rho, _, i = carry
        Ap = matvec(p, hx, hy, c)
        alpha = rho / jnp.sum(p * Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rho_new = jnp.sum(r * r)
        normr = jnp.sqrt(rho_new)
        beta = rho_new / rho
        p = r + beta * p
        return x, r, p, rho_new, normr, i + 1

    x0 = jnp.zeros_like(b)
    rho0 = jnp.sum(b * b)
    x, r, _, _, _, i = jax.lax.while_loop(
        cond,
        body,
        (x0, b, b, rho0, jnp.asarray(jnp.inf, b.dtype), jnp.asarray(0, jnp.int32)),
    )
    r_rms = jnp.sqrt(jnp.sum(r * r) / b.size)
    return x, r_rms, i


def mg_preconditioned_cg(
    b,
    h,
    c,
    tol,
    nmax: int,
    mg_cfg: MGConfig = MGConfig(),
    n_precond_cycles: int = 1,
):
    """Flexible PCG with z = M^-1 r approximated by V-cycle(s) from zero.

    Uses the Polak-Ribiere (flexible) beta, beta = z_new.(r_new - r_old) /
    z_old.r_old, because the V-cycle preconditioner is not exactly symmetric
    (injection restriction is not the adjoint of bilinear prolongation);
    flexible CG stays robust under non-symmetric/variable preconditioning
    where textbook PCG stalls.

    Returns (x, r_rms, iters).  Converges in a handful of iterations where
    unpreconditioned CG needs O(n) — see
    fpr_tpu/experiments/multigrid_bench.py's work-precision comparison.
    """
    from fpr_tpu.solvers.multigrid import vcycle

    matvec = _matvec_for(mg_cfg.policy)
    normb = jnp.sqrt(jnp.sum(b * b))
    tolb = tol * normb

    def precond(r):
        z = jnp.zeros_like(r)
        for _ in range(n_precond_cycles):
            z, _ = vcycle(z, r, h, c, tol, mg_cfg, apply_bcs=False)
        return z

    def cond(carry):
        _, _, _, _, normr, i = carry
        return jnp.logical_and(i < nmax, normr >= tolb)

    def body(carry):
        x, r, p, rz, _, i = carry
        Ap = matvec(p, h, h, c)
        alpha = rz / jnp.sum(p * Ap)
        x = x + alpha * p
        r_new = r - alpha * Ap
        normr = jnp.sqrt(jnp.sum(r_new * r_new))
        z_new = precond(r_new)
        rz_new = jnp.sum(r_new * z_new)
        beta = jnp.sum(z_new * (r_new - r)) / rz  # Polak-Ribiere
        p = z_new + beta * p
        return x, r_new, p, rz_new, normr, i + 1

    x0 = jnp.zeros_like(b)
    z0 = precond(b)
    rz0 = jnp.sum(b * z0)
    x, r, _, _, _, i = jax.lax.while_loop(
        cond,
        body,
        (x0, b, z0, rz0, jnp.asarray(jnp.inf, b.dtype), jnp.asarray(0, jnp.int32)),
    )
    r_rms = jnp.sqrt(jnp.sum(r * r) / b.size)
    return x, r_rms, i
