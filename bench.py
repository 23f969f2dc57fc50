"""Headline benchmark: prints ONE JSON line with the primary metric.

Primary: 3D dual-time diffusion effective throughput (counted-bytes model)
at 512^3 in f32 through the fused Pallas kernel, vs the reference's best
single-GPU T_eff of 63.5 GB/s (Titan X, f64, hide_comm counting —
BASELINE.md).  We report the same counted quantity the reference computes
(part1_kernel_programming.jl:208-217) with the shared-memory-kernel model
(6+1 words/cell/iteration) at our word size.

Extras: MG 4097^2 Poisson time-to-tol 1e-6 via the mixed-precision
(f64 defect correction around f32 Pallas V-cycles) solver, vs the V100's
0.154 s (BASELINE.md).

Usage: python bench.py [--quick]   (--quick: small shapes, smoke only)
"""

import argparse
import functools
import json
import time

import jax
import numpy as np


def bench_diffusion(n: int, iters_cap: int):
    import jax.numpy as jnp

    from fpr_tpu.core.config import DiffusionConfig, ExecutionPolicy
    from fpr_tpu.core.grid import Grid3D, pseudo_timestep
    from fpr_tpu.ops import pallas3d, stencil3d
    from fpr_tpu.core import bc
    from fpr_tpu.utils.timing import diffusion_bench_results

    grid = Grid3D(n, n, n)
    dtau = pseudo_timestep(grid.dx, grid.dy, grid.dz, 1.0)
    kw = dict(dt=0.2, dtau=dtau, dx=grid.dx, dy=grid.dy, dz=grid.dz, D=1.0)

    Ht = bc.dirichlet_faces_3d(stencil3d.init_gaussian(grid, dtype=jnp.float32))

    shape = (n, n, n)

    K = 3  # temporally fused: K pseudo-time iterations per HBM pass,
    # stacked state (Htau + Ht one array, output aliased onto the input)

    @jax.jit
    def iterate(state, k):
        def body(i, carry):
            st, acc = carry
            st, sumsq = pallas3d.dual_time_stepk_stacked(st, shape, K=K, **kw)
            return st, acc + sumsq
        return jax.lax.fori_loop(0, k, body, (state, jnp.float32(0)))

    state = pallas3d.stack_state_k(Ht, Ht, K)
    state, acc = iterate(state, 5)  # warmup + compile
    float(acc)

    from fpr_tpu.utils.timing import timed_stats

    def run():
        _, acc = iterate(state, iters_cap // K)
        float(acc)

    stats = timed_stats(run, reps=3)
    res = diffusion_bench_results(
        stats.median_s, K * (iters_cap // K), n, n, n, word_bytes=4, model="shmem"
    )
    return res, stats


# dev-tunnel RPC cost probe — shared calibration home (utils/timing.py)
from fpr_tpu.utils.timing import measure_tunnel_overhead  # noqa: E402


def bench_mg(n: int, tol: float, amortize: int = 10, tunnel_s: float = 0.0):
    """Time-to-tolerance via the double-single defect-correction solver
    with the DST truncated ladder (no emulated f64 anywhere; the reported
    residual is the TRUE defect, verified against an f64 oracle after
    timing).

    Reports BOTH a single-call median (includes the dev tunnel's per-call
    RPC latency) and the amortized per-solve time over `amortize`
    data-dependent solves inside one jit — the device-time number
    comparable to the reference's BenchmarkTools GPU medians (CUDA launch
    overhead is microseconds; the tunnel RPC is not)."""
    import jax.numpy as jnp

    from fpr_tpu.core.config import CoarseSolver, MGConfig
    from fpr_tpu.ops import stencil2d
    from fpr_tpu.solvers import multigrid
    from fpr_tpu.solvers.multigrid import mg_solve_ds_jit
    from fpr_tpu.utils.timing import timed_stats

    cfg = MGConfig(
        coarse_size=min(513, n), coarse_solver=CoarseSolver.DST,
        # deep-smoothed V(5,5) cycle: extra sweeps are free on the
        # DMA-bound stk legs and contract ~an order harder per cycle
        # (same-session A/B at 4097^2: 12.9 ms vs V(2,2)'s 17.1)
        pre_smooth=5, post_smooth=5,
    )
    h = 1.0 / (n - 1)
    key = jax.random.PRNGKey(0)
    b = (
        jnp.zeros((n, n), jnp.float32)
        .at[1:-1, 1:-1]
        .set(jax.random.uniform(key, (n - 2, n - 2), jnp.float32))
    )

    # compile + converge once
    (uh, ul), r, it = mg_solve_ds_jit(b, h, 0.0, tol, 30, cfg=cfg,
                                      return_pair=True)
    float(r)

    def run():
        _, r, _ = mg_solve_ds_jit(b, h, 0.0, tol, 30, cfg=cfg,
                                  return_pair=True)
        float(r)

    stats = timed_stats(run, reps=5)

    N = amortize

    # while_loop (traced bound), NOT fori: an unrollable loop of short
    # program segments pays ~1.3 ms of un-hidden dispatch per segment
    # through the tunnel, which a while_loop's on-device trip does not
    # (measured: a trivial chained pallas_call costs 1291 us in fori vs
    # 104 us in while_loop)
    @jax.jit
    def many(b, n_it):
        def cond(c):
            return c[0] < n_it
        def body(c):
            i, acc = c
            _, r, _ = multigrid.mg_solve_ds(
                None, b + 0.0 * acc, h, 0.0, tol, 30, cfg=cfg,
                return_pair=True,
            )
            return i + 1, acc + r

        return jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0.0)))[1]

    float(many(b, jnp.int32(N)))
    per_stats = timed_stats(lambda: float(many(b, jnp.int32(N))), reps=3)
    # subtract the tunnel's ONE per-call RPC (same convention as the
    # multigrid_bench sweep's device_s column; at a 46 ms drift day the
    # un-subtracted bias is ~4.6 ms on a ~12 ms solve)
    per_solve = max(per_stats.median_s - tunnel_s, 0.0) / N

    # f64 oracle verification OUTSIDE the timed region (b is
    # f32-representable, so its f64 lift is exact)
    u64 = uh.astype(jnp.float64) + ul.astype(jnp.float64)
    b64 = b.astype(jnp.float64)
    res = stencil2d.residual(u64, b64, h, 0.0)
    rel_true = float(stencil2d.rms(res)) / float(stencil2d.rms(b64))
    return stats, per_solve, int(it), rel_true


def bench_ns():
    """Explicit NS at the reference's full 2049x513 scale (Pr=0.01,
    ttot=0.005, tol=1e-7): fused operator kernel + on-device time loop +
    warm-started double-single multigrid.  Reference: 8736 timed steps in
    1314 s on the Titan X-class GPU (BASELINE.md)."""
    import dataclasses

    from fpr_tpu.core.config import NSConfig
    from fpr_tpu.models.navier_stokes import simulate_fast

    import numpy as np

    cfg = NSConfig(nx=2049, ny=513, ttot=0.005, beta=0.0, Pr=0.01,
                   tol=1e-7, niters=50)
    out = simulate_fast(cfg, seed=0)  # compile + first measurement
    times = [out.t_elapsed]
    for _ in range(2):  # warm repetitions (jit cache shared in-process)
        times.append(simulate_fast(cfg, seed=0).t_elapsed)

    # semi-implicit tier (the reference's headline experiment: 37 steps
    # in 25.5 s on the V100, part2 BASELINE) — same scale, beta=0.5
    semi_cfg = dataclasses.replace(cfg, beta=0.5)
    semi = simulate_fast(semi_cfg, seed=0)
    semi_times = [semi.t_elapsed]
    for _ in range(2):
        semi_times.append(simulate_fast(semi_cfg, seed=0).t_elapsed)
    return (float(np.median(times)), out.timed_iters, times,
            float(np.median(semi_times)), semi.timed_iters)


def check_aliased_kernels():
    """Real-TPU value check for the ALIASED Pallas kernels.

    input_output_aliases creates genuine RAW hazards against neighboring
    blocks' input windows; interpret mode neither honors aliasing nor
    models DMA timing, so only a multi-block run on real hardware can
    catch a reintroduced race (CLAUDE.md round-3 notes).  Compares the
    stacked (aliased) K-fused kernel against the non-aliased padded K
    kernel over several iterations; must agree BITWISE.
    """
    import jax.numpy as jnp

    from fpr_tpu.ops import pallas3d

    n, K, iters = 128, 3, 4
    shape = (n, n, n)
    kw = dict(dt=0.2, dtau=1e-4, dx=0.05, dy=0.05, dz=0.05, D=1.0)
    key = jax.random.PRNGKey(7)
    Ht = jax.random.uniform(key, shape, jnp.float32)
    Htau = jax.random.uniform(jax.random.PRNGKey(8), shape, jnp.float32)

    @jax.jit
    def run_stacked(Ht, Htau):
        st = pallas3d.stack_state_k(Ht, Htau, K)
        def body(i, carry):
            st, _ = carry
            return pallas3d.dual_time_stepk_stacked(st, shape, K=K, **kw)
        st, ss = jax.lax.fori_loop(0, iters, body, (st, jnp.float32(0)))
        return pallas3d.unstack_state_k(st, shape, K), ss

    @jax.jit
    def run_padded(Ht, Htau):
        Hp = pallas3d.pad3dk(Htau, K)
        Hti = pallas3d.pad_htk(Ht, K)
        def body(i, carry):
            Hp, _ = carry
            return pallas3d.dual_time_stepk_padded(Hti, Hp, shape, K=K, **kw)
        Hp, ss = jax.lax.fori_loop(0, iters, body, (Hp, jnp.float32(0)))
        return pallas3d.unpad3dk(Hp, shape, K), ss

    a, ssa = run_stacked(Ht, Htau)
    b, ssb = run_padded(Ht, Htau)
    a, b = np.asarray(a), np.asarray(b)
    if not np.array_equal(a, b):
        bad = int((a != b).sum())
        raise AssertionError(
            f"ALIASED-KERNEL RACE: stacked != padded at {bad} cells "
            f"(max |diff| {np.abs(a - b).max():.3e})"
        )

    # 2D stacked-aliased V-cycle legs vs the separate-stream kernels
    # (multi-block; the aliased u write overlaps the next block's slab
    # read by PAD rows, so only this real-DMA run can catch a race)
    from fpr_tpu.ops import pallas2d

    ny, nx, br = 1025, 513, 128
    h, c = 1.0 / (ny - 1), 0.3
    total = pallas2d.padded_rows(ny, br)
    nxp = pallas2d.padded_cols(nx)
    P = pallas2d.PAD
    f_rp = pallas2d.pad2d(
        jax.random.uniform(jax.random.PRNGKey(9), (ny, nx), jnp.float32), br
    )
    nyc, nxc = (ny - 1) // 2 + 1, (nx - 1) // 2 + 1
    coarse = jax.random.uniform(jax.random.PRNGKey(10), (nyc, nxc), jnp.float32)

    @functools.partial(jax.jit, static_argnames="depth")
    def legs_old(f_rp, depth):
        zero = jnp.zeros((total, nxp), jnp.float32)
        u1, _ = pallas2d.smooth2r_split_rp(
            zero, f_rp, ny, nx, br, h, c, zero_u=True, ns=depth)
        u2, r2 = pallas2d.smooth2r_split_rp(u1, f_rp, ny, nx, br, h, c, ns=depth)
        u3, n3 = pallas2d.corr_smooth2_rp(
            u2, f_rp, coarse, ny, nx, br, h, c, with_norm=True, ns=depth)
        return u3, r2, n3

    @functools.partial(jax.jit, static_argnames="depth")
    def legs_stk(f_rp, depth):
        L = jnp.zeros((2, total, nxp), jnp.float32).at[1].set(f_rp)
        L, _ = pallas2d.smooth2r_stk(L, ny, nx, br, h, c, zero_u=True, ns=depth)
        L, r2 = pallas2d.smooth2r_stk(L, ny, nx, br, h, c, ns=depth)
        corrx = pallas2d.x_interleave_coarse(coarse)
        rows_needed = pallas2d.corr_rows_needed(ny, br)
        corrx_rp = jnp.zeros((rows_needed, nxp), corrx.dtype)
        corrx_rp = corrx_rp.at[P : P + corrx.shape[0], :nx].set(corrx)
        L, n3 = pallas2d.corr_smooth2_stk(
            L, corrx_rp, ny, nx, br, h, c, with_norm=True, ns=depth)
        return L[0], r2, n3

    # depth 2 = reference shape; depth 5 = the production deep-smoothed
    # config (longer VPU chains shift DMA/compute timing, so the race
    # check must witness both)
    for depth in (2, 5):
        uo, ro, no = legs_old(f_rp, depth)
        us, rs, ns_ = legs_stk(f_rp, depth)
        W = slice(P, total - P)
        for name, x, y in [
            ("u", np.asarray(uo)[W], np.asarray(us)[W]),
            ("res", np.asarray(ro)[W], np.asarray(rs)[W]),
        ]:
            if not np.array_equal(x, y):
                raise AssertionError(
                    f"ALIASED-KERNEL RACE (2D stk, {name}, V({depth},{depth})): "
                    f"{int((x != y).sum())} cells differ"
                )
        if float(no) != float(ns_):
            raise AssertionError(
                f"ALIASED-KERNEL RACE (2D stk, V({depth},{depth})): norm mismatch")
    return True


def _attempt(label, fn, tries=2):
    """Run a benchmark component with one retry: the remote compile helper
    occasionally wedges or 500s transiently (CLAUDE.md), and one flaky
    component must not cost the whole headline artifact."""
    import traceback

    for t in range(tries):
        try:
            return fn()
        except Exception:
            traceback.print_exc()
            print(f"bench component {label!r} failed (attempt {t + 1}/{tries})")
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-mg", action="store_true")
    ap.add_argument("--skip-ns", action="store_true")
    args = ap.parse_args()

    jax.config.update("jax_enable_x64", True)

    # aliased-kernel race check (only real-TPU multi-block runs catch
    # these) — runs in --quick too, so every bench invocation witnesses it
    aliased_ok = (
        bool(_attempt("aliased_check", check_aliased_kernels))
        if jax.default_backend() == "tpu"
        else None
    )

    n_diff = 128 if args.quick else 512
    iters = 99 if args.quick else 300  # multiple of the K=3 fusion depth
    diff = _attempt("diffusion", lambda: bench_diffusion(n_diff, iters))
    res, diff_stats = diff if diff is not None else (None, None)
    # None (-> JSON null), not 0.0: a failed component must be
    # distinguishable from a catastrophically bad measurement
    teff = res.throughput / 1e9 if res is not None else None

    extras = {
        "diffusion_grid": f"{n_diff}^3",
        "diffusion_ms_per_iter": res.delta_t / iters * 1e3 if res else None,
        "diffusion_gflops": res.performance / 1e9 if res else None,
        "diffusion_iqr_s": diff_stats.iqr_s if diff_stats else None,
        "timing": "median of 3 reps (5 for MG); iqr_s columns carry spread",
        "aliased_kernel_check": aliased_ok,
        "dtype": "float32",
        "counting_model": "shmem (6+1 words/cell/iter), reference parity",
    }

    if not args.skip_mg:
        n_mg = 1025 if args.quick else 4097
        tunnel_rpc_s = _attempt("tunnel", measure_tunnel_overhead)
        if tunnel_rpc_s is not None:
            extras["tunnel_rpc_overhead_ms"] = round(tunnel_rpc_s * 1e3, 2)
        mg = _attempt("mg", lambda: bench_mg(n_mg, 1e-6,
                                             tunnel_s=tunnel_rpc_s or 0.0))
        if mg is not None:
            mg_stats, mg_per_solve, mg_iters, mg_rel = mg
            mg_s = mg_stats.median_s
            extras.update({
                "mg_grid": f"{n_mg}^2",
                "mg_solver": "ds defect correction + DST-513 ladder, V(5,5) deep smoothing (mg_solve_ds)",
                "mg_seconds_to_tol1e-6": mg_s,
                "mg_iqr_s": mg_stats.iqr_s,
                "mg_device_seconds_per_solve": round(mg_per_solve, 5),
                "mg_outer_iterations": mg_iters,
                "mg_true_f64_rel_residual": mg_rel,
                "mg_vs_v100_0.154s": 0.154 / mg_s if n_mg == 4097 else None,
                "mg_device_vs_v100_0.154s": (
                    round(0.154 / mg_per_solve, 2) if n_mg == 4097 else None
                ),
            })

    if not (args.skip_ns or args.quick):
        ns = _attempt("ns", bench_ns)
        if ns is not None:
            ns_s, ns_steps, ns_times, semi_s, semi_steps = ns
            extras.update({
                "ns_explicit_2049x513_Pr0.01_seconds": round(ns_s, 2),
                "ns_rep_seconds": [round(t, 2) for t in ns_times],
                "ns_timed_steps": ns_steps,
                "ns_vs_reference_1314s": round(1314.0 / ns_s, 1),
                "ns_semi_implicit_seconds": round(semi_s, 3),
                "ns_semi_timed_steps": semi_steps,
                "ns_semi_vs_reference_25.5s": round(25.5 / semi_s, 1),
            })

    out = {
        "metric": f"3D dual-time diffusion T_eff (counted 6+1 model) at {n_diff}^3, f32, TPU v5e",
        "value": round(teff, 1) if teff is not None else None,
        "unit": "GB/s",
        "vs_baseline": round(teff / 63.5, 2) if teff is not None else None,
        "extras": extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
