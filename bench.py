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
    1314 s on the Titan X-class GPU (BASELINE.md).

    Two explicit rows: reference tolerance semantics (s_tol_factor=1,
    every solve to tol*rms), and the relaxed-S production config
    (s_tol_factor=100: S-solve to 100*tol*rms) — measured to preserve
    EXACT step parity (8736, seeds 0-3) and <1e-6 relative field drift
    while cutting the warm-solve outers (4.41 -> 2.56 s; the probe
    artifact is benchmark-results/ns_s_tol_factor.json).  The semi tier
    stays at factor 1 (3 solves/step; the S share is small and the T
    drift crosses 1e-6 there)."""
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

    relaxed_cfg = dataclasses.replace(cfg, s_tol_factor=100.0)
    relaxed = simulate_fast(relaxed_cfg, seed=0)
    relaxed_times = [relaxed.t_elapsed]
    for _ in range(2):
        relaxed_times.append(simulate_fast(relaxed_cfg, seed=0).t_elapsed)
    relaxed_parity = relaxed.timed_iters == out.timed_iters
    if not relaxed_parity:
        # suppress ONLY the relaxed row (its claim depends on parity); the
        # reference-semantics explicit + semi rows remain valid evidence
        print(f"relaxed-S step parity broke: {relaxed.timed_iters} != "
              f"{out.timed_iters} — withholding the relaxed row")

    # semi-implicit tier (the reference's headline experiment: 37 steps
    # in 25.5 s on the V100, part2 BASELINE) — same scale, beta=0.5
    semi_cfg = dataclasses.replace(cfg, beta=0.5)
    semi = simulate_fast(semi_cfg, seed=0)
    semi_times = [semi.t_elapsed]
    for _ in range(2):
        semi_times.append(simulate_fast(semi_cfg, seed=0).t_elapsed)
    return (float(np.median(times)), out.timed_iters, times,
            float(np.median(semi_times)), semi.timed_iters,
            float(np.median(relaxed_times)) if relaxed_parity else None,
            relaxed_times if relaxed_parity else None)


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

    n, iters = 128, 4
    shape = (n, n, n)
    kw = dict(dt=0.2, dtau=1e-4, dx=0.05, dy=0.05, dz=0.05, D=1.0)
    key = jax.random.PRNGKey(7)
    Ht = jax.random.uniform(key, shape, jnp.float32)
    Htau = jax.random.uniform(jax.random.PRNGKey(8), shape, jnp.float32)

    import functools as _ft

    @_ft.partial(jax.jit, static_argnames=("K", "yc", "bz"))
    def run_stacked(Ht, Htau, K, yc, bz):
        st = pallas3d.stack_state_k(Ht, Htau, K)
        def body(i, carry):
            st, _ = carry
            return pallas3d.dual_time_stepk_stacked(
                st, shape, K=K, y_chunks=yc, block_z=bz, **kw)
        st, ss = jax.lax.fori_loop(0, iters, body, (st, jnp.float32(0)))
        return pallas3d.unstack_state_k(st, shape, K), ss

    @_ft.partial(jax.jit, static_argnames="K")
    def run_padded(Ht, Htau, K):
        Hp = pallas3d.pad3dk(Htau, K)
        Hti = pallas3d.pad_htk(Ht, K)
        def body(i, carry):
            Hp, _ = carry
            return pallas3d.dual_time_stepk_padded(Hti, Hp, shape, K=K, **kw)
        Hp, ss = jax.lax.fori_loop(0, iters, body, (Hp, jnp.float32(0)))
        return pallas3d.unpad3dk(Hp, shape, K), ss

    # (K=3, yc=1): the production bench config; (K=4, yc=2, BZ=8): the
    # chunk-seam path — its seam windows touch the same aliased slab, the
    # exact class interpret mode cannot check (ADVICE round 4)
    for K, yc, bz in ((3, 1, None), (4, 2, 8)):
        a, ssa = run_stacked(Ht, Htau, K, yc, bz)
        b, ssb = run_padded(Ht, Htau, K)
        a, b = np.asarray(a), np.asarray(b)
        if not np.array_equal(a, b):
            bad = int((a != b).sum())
            raise AssertionError(
                f"ALIASED-KERNEL RACE (K={K}, y_chunks={yc}): stacked != "
                f"padded at {bad} cells (max |diff| {np.abs(a - b).max():.3e})"
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

    @functools.partial(jax.jit, static_argnames=("depth", "elim"))
    def legs_old(f_rp, depth, elim):
        zero = jnp.zeros((total, nxp), jnp.float32)
        u1, _ = pallas2d.smooth2r_split_rp(
            zero, f_rp, ny, nx, br, h, c, zero_u=True, ns=depth, elim=elim)
        u2, r2 = pallas2d.smooth2r_split_rp(u1, f_rp, ny, nx, br, h, c,
                                            ns=depth, elim=elim)
        u3, n3 = pallas2d.corr_smooth2_rp(
            u2, f_rp, coarse, ny, nx, br, h, c, with_norm=True, ns=depth,
            elim=elim)
        return u3, r2, n3

    @functools.partial(jax.jit, static_argnames=("depth", "elim"))
    def legs_stk(f_rp, depth, elim):
        L = jnp.zeros((2, total, nxp), jnp.float32).at[1].set(f_rp)
        L, _ = pallas2d.smooth2r_stk(L, ny, nx, br, h, c, zero_u=True,
                                     ns=depth, elim=elim)
        L, r2 = pallas2d.smooth2r_stk(L, ny, nx, br, h, c, ns=depth, elim=elim)
        corrx = pallas2d.x_interleave_coarse(coarse)
        rows_needed = pallas2d.corr_rows_needed(ny, br)
        corrx_rp = jnp.zeros((rows_needed, nxp), corrx.dtype)
        corrx_rp = corrx_rp.at[P : P + corrx.shape[0], :nx].set(corrx)
        L, n3 = pallas2d.corr_smooth2_stk(
            L, corrx_rp, ny, nx, br, h, c, with_norm=True, ns=depth, elim=elim)
        return L[0], r2, n3

    # depth 2 = reference shape; depth 5 = the production deep-smoothed
    # config (longer VPU chains shift DMA/compute timing, so the race
    # check must witness both); (3, elim) = the apply_bcs eliminated-BC
    # production config — its lane shifts only lower correctly on real
    # Mosaic, which interpret mode cannot witness
    for depth, elim in ((2, False), (5, False), (3, True)):
        uo, ro, no = legs_old(f_rp, depth, elim)
        us, rs, ns_ = legs_stk(f_rp, depth, elim)
        W = slice(P, total - P)
        for name, x, y in [
            ("u", np.asarray(uo)[W], np.asarray(us)[W]),
            ("res", np.asarray(ro)[W], np.asarray(rs)[W]),
        ]:
            if not np.array_equal(x, y):
                raise AssertionError(
                    f"ALIASED-KERNEL RACE (2D stk, {name}, V({depth},{depth}), "
                    f"elim={elim}): {int((x != y).sum())} cells differ"
                )
        if float(no) != float(ns_):
            raise AssertionError(
                f"ALIASED-KERNEL RACE (2D stk, V({depth},{depth}), "
                f"elim={elim}): norm mismatch")
    return True


# ---------------------------------------------------------------------------
# Orchestration: every component runs in its OWN subprocess.
#
# Round-4 post-mortem (VERDICT.md): the NS component crashed the TPU worker
# twice and the surviving components published numbers from a degraded chip
# with rc=0 — a consumer comparing rounds would conclude the code regressed
# 21x.  Two fixes, both structural:
#
#  1. Process isolation: a worker crash (or a wedged remote-compile helper)
#     in component N cannot poison component N+1 — each subprocess gets a
#     fresh TPU client, and a hang is bounded by a timeout + one retry
#     (the documented medicine for the wedged helper is "kill and retry").
#  2. Device-health canary: a fixed known-cost probe (the 512^3 K=3 stacked
#     kernel, the best-characterized workload in the repo) runs BEFORE the
#     components and again AFTER.  Healthy envelope from three rounds of
#     measurements: 1.26-1.5 ms/iter (round 3: 1.31; round-4 judge re-probe:
#     1.44-1.46); the degraded round-4 capture measured 27.2.  On breach the
#     bench retries the canary in a fresh process and, failing that, emits
#     {"env_degraded": true} with the canary numbers INSTEAD of
#     plausible-looking component numbers.
# ---------------------------------------------------------------------------

CANARY_HEALTHY_MS = 2.0  # breach threshold; healthy chip measures 1.26-1.5


def bench_canary(iters: int = 150):
    """Fixed known-cost health probe: 512^3 stacked K=3 kernel ms/iter.

    The tunnel RPC (2.5-43 ms/call, drifting hourly) is measured first and
    subtracted per call — at 150 iters/call an unsubtracted 27 ms RPC
    would read as +0.18 ms/iter; at a short 30-iter probe it reads +0.9
    and would false-flag a healthy chip."""
    import statistics

    import jax.numpy as jnp

    from fpr_tpu.core.grid import Grid3D, pseudo_timestep
    from fpr_tpu.ops import pallas3d, stencil3d
    from fpr_tpu.core import bc

    tunnel_s = measure_tunnel_overhead()

    n = 512
    grid = Grid3D(n, n, n)
    dtau = pseudo_timestep(grid.dx, grid.dy, grid.dz, 1.0)
    kw = dict(dt=0.2, dtau=dtau, dx=grid.dx, dy=grid.dy, dz=grid.dz, D=1.0)
    Ht = bc.dirichlet_faces_3d(stencil3d.init_gaussian(grid, dtype=jnp.float32))
    shape = (n, n, n)
    K = 3

    @jax.jit
    def iterate(state, k):
        def body(i, carry):
            st, acc = carry
            st, sumsq = pallas3d.dual_time_stepk_stacked(st, shape, K=K, **kw)
            return st, acc + sumsq
        return jax.lax.fori_loop(0, k, body, (state, jnp.float32(0)))

    state = pallas3d.stack_state_k(Ht, Ht, K)
    state, acc = iterate(state, 2)
    float(acc)  # warmup + compile (scalar read: block_until_ready lies here)
    n_it = K * (iters // K)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, acc = iterate(state, iters // K)
        float(acc)
        reps.append(max(time.perf_counter() - t0 - tunnel_s, 0.0) / n_it * 1e3)
    return {"ms_per_iter": round(statistics.median(reps), 3),
            "reps_ms_per_iter": [round(r, 3) for r in reps],
            "tunnel_rpc_ms": round(tunnel_s * 1e3, 2)}


def _component_payload(name, quick):
    """Run one component in THIS process and return its JSON payload."""
    jax.config.update("jax_enable_x64", True)

    if name in ("canary", "canary_post"):
        if jax.default_backend() != "tpu":
            return {"skipped": "not tpu"}
        return bench_canary()

    if name == "aliased":
        if jax.default_backend() != "tpu":
            return {"skipped": "not tpu"}
        return {"passed": bool(check_aliased_kernels())}

    if name == "diffusion":
        n_diff = 128 if quick else 512
        iters = 99 if quick else 300  # multiple of the K=3 fusion depth
        res, stats = bench_diffusion(n_diff, iters)
        return {
            "grid": f"{n_diff}^3",
            "teff_gbs": res.throughput / 1e9,
            "ms_per_iter": res.delta_t / iters * 1e3,
            "gflops": res.performance / 1e9,
            "iqr_s": stats.iqr_s,
        }

    if name == "mg":
        n_mg = 1025 if quick else 4097
        tunnel_s = measure_tunnel_overhead()
        stats, per_solve, iters, rel = bench_mg(n_mg, 1e-6, tunnel_s=tunnel_s)
        return {
            "grid": f"{n_mg}^2",
            "tunnel_rpc_overhead_ms": round(tunnel_s * 1e3, 2),
            "seconds_to_tol": stats.median_s,
            "iqr_s": stats.iqr_s,
            "device_seconds_per_solve": round(per_solve, 5),
            "outer_iterations": iters,
            "true_f64_rel_residual": rel,
        }

    if name == "ns":
        (ns_s, ns_steps, ns_times, semi_s, semi_steps,
         relaxed_s, relaxed_times) = bench_ns()
        payload = {
            "explicit_seconds": round(ns_s, 2),
            "rep_seconds": [round(t, 2) for t in ns_times],
            "timed_steps": ns_steps,
            "semi_seconds": round(semi_s, 3),
            "semi_timed_steps": semi_steps,
        }
        if relaxed_s is not None:
            payload["relaxed_s_seconds"] = round(relaxed_s, 2)
            payload["relaxed_s_rep_seconds"] = [
                round(t, 2) for t in relaxed_times]
        else:
            payload["relaxed_s_parity_broken"] = True
        return payload

    raise SystemExit(f"unknown component {name!r}")


# generous: a wedged remote-compile helper hangs forever at 0% CPU, and
# healthy compiles have measured anywhere from 20 s to 300+ s on bad days
_TIMEOUTS = {"canary": 1500, "canary_post": 1500, "aliased": 1500,
             "diffusion": 1500, "mg": 1800, "ns": 4500}


def _run_component(name, quick, tries=2):
    """Spawn `bench.py --component name` with a timeout and one retry.

    Returns the component's payload dict; on failure a dict with "error".
    A fresh process per attempt is the point: a crashed TPU worker or a
    wedged compile helper dies with the child, not with the bench."""
    import os
    import subprocess
    import sys

    cmd = [sys.executable, os.path.abspath(__file__), "--component", name]
    if quick:
        cmd.append("--quick")
    timeout = _TIMEOUTS[name]
    last = None
    for t in range(tries):
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout)
        except subprocess.TimeoutExpired:
            last = {"error": f"timeout after {timeout}s "
                             "(wedged compile helper?)"}
            print(f"bench component {name!r}: {last['error']} "
                  f"(attempt {t + 1}/{tries})", flush=True)
            continue
        for line in reversed(p.stdout.strip().splitlines()):
            try:
                obj = json.loads(line)
            except (json.JSONDecodeError, ValueError):
                continue
            if isinstance(obj, dict) and obj.get("component") == name:
                return obj.get("payload", {})
        tail = (p.stdout + "\n" + p.stderr)[-2000:]
        last = {"error": f"rc={p.returncode}, no payload", "tail": tail}
        print(f"bench component {name!r} failed rc={p.returncode} "
              f"(attempt {t + 1}/{tries})\n{tail}", flush=True)
    return last if last is not None else {"error": "unknown"}


def _canary_gate(quick, name="canary"):
    """Run the health canary (fresh process; retried once on breach).

    Returns (healthy: bool | None, payload).  None = unknown (non-TPU)."""
    for attempt in range(2):
        payload = _run_component(name, quick)
        if payload.get("skipped"):
            return None, payload
        ms = payload.get("ms_per_iter")
        if ms is not None and ms <= CANARY_HEALTHY_MS:
            return True, payload
        print(f"bench canary BREACH (attempt {attempt + 1}/2): {payload}",
              flush=True)
    return False, payload


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-mg", action="store_true")
    ap.add_argument("--skip-ns", action="store_true")
    ap.add_argument("--component", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.component:
        # child mode: run ONE component in this process, print a tagged line
        payload = _component_payload(args.component, args.quick)
        print(json.dumps({"component": args.component, "payload": payload}),
              flush=True)
        return

    healthy, canary = _canary_gate(args.quick)
    extras = {
        "timing": "median of 3 reps (5 for MG); iqr_s columns carry spread",
        "dtype": "float32",
        "counting_model": "shmem (6+1 words/cell/iter), reference parity",
        "canary": canary,
        "canary_healthy_envelope_ms": [1.2, CANARY_HEALTHY_MS],
    }

    if healthy is False:
        # degraded chip: publish the canary evidence, NOT plausible-looking
        # component numbers (round-4 failure mode)
        out = {
            "metric": "3D dual-time diffusion T_eff (counted 6+1 model) at 512^3, f32, TPU v5e",
            "value": None,
            "unit": "GB/s",
            "vs_baseline": None,
            "env_degraded": True,
            "extras": extras,
        }
        print(json.dumps(out))
        return

    aliased = _run_component("aliased", args.quick)
    if aliased.get("skipped"):
        extras["aliased_kernel_check"] = None  # not a TPU: unknown, not failed
    elif "error" in aliased:
        extras["aliased_kernel_check"] = False
        extras["aliased_kernel_check_error"] = aliased["error"]
    else:
        extras["aliased_kernel_check"] = bool(aliased.get("passed"))

    n_diff = "128" if args.quick else "512"
    diff = _run_component("diffusion", args.quick)
    teff = diff.get("teff_gbs")
    extras.update({
        "diffusion_grid": diff.get("grid", f"{n_diff}^3"),
        "diffusion_ms_per_iter": diff.get("ms_per_iter"),
        "diffusion_gflops": diff.get("gflops"),
        "diffusion_iqr_s": diff.get("iqr_s"),
    })
    if "error" in diff:
        extras["diffusion_error"] = diff["error"]

    if not args.skip_mg:
        mg = _run_component("mg", args.quick)
        if "error" not in mg:
            n_mg = 1025 if args.quick else 4097
            mg_s = mg["seconds_to_tol"]
            extras.update({
                "mg_grid": mg["grid"],
                "mg_solver": "ds defect correction + DST-513 ladder, V(5,5) deep smoothing (mg_solve_ds)",
                "tunnel_rpc_overhead_ms": mg["tunnel_rpc_overhead_ms"],
                "mg_seconds_to_tol1e-6": mg_s,
                "mg_iqr_s": mg["iqr_s"],
                "mg_device_seconds_per_solve": mg["device_seconds_per_solve"],
                "mg_outer_iterations": mg["outer_iterations"],
                "mg_true_f64_rel_residual": mg["true_f64_rel_residual"],
                "mg_vs_v100_0.154s": 0.154 / mg_s if n_mg == 4097 else None,
                "mg_device_vs_v100_0.154s": (
                    round(0.154 / mg["device_seconds_per_solve"], 2)
                    if n_mg == 4097 else None),
            })
        else:
            extras["mg_error"] = mg["error"]

    if not (args.skip_ns or args.quick):
        ns = _run_component("ns", False)
        if "error" not in ns:
            extras.update({
                "ns_explicit_2049x513_Pr0.01_seconds": ns["explicit_seconds"],
                "ns_rep_seconds": ns["rep_seconds"],
                "ns_timed_steps": ns["timed_steps"],
                "ns_vs_reference_1314s": round(1314.0 / ns["explicit_seconds"], 1),
                "ns_semi_implicit_seconds": ns["semi_seconds"],
                "ns_semi_timed_steps": ns["semi_timed_steps"],
                "ns_semi_vs_reference_25.5s": round(25.5 / ns["semi_seconds"], 1),
            })
            if "relaxed_s_seconds" in ns:
                # relaxed-S production config (s_tol_factor=100): exact
                # step parity + <1e-6 field drift, bench_ns docstring
                extras.update({
                    "ns_explicit_relaxed_s_seconds": ns["relaxed_s_seconds"],
                    "ns_relaxed_s_rep_seconds": ns["relaxed_s_rep_seconds"],
                    "ns_relaxed_s_tol_factor": 100,
                    "ns_relaxed_vs_reference_1314s": round(
                        1314.0 / ns["relaxed_s_seconds"], 1),
                })
            elif ns.get("relaxed_s_parity_broken"):
                extras["ns_relaxed_s_parity_broken"] = True

    if not args.quick:
        # post-run canary: catches mid-run degradation (a healthy pre-canary
        # does not certify the NS measurement an hour later)
        post_ok, post = _canary_gate(False, name="canary_post")
        extras["canary_post"] = post
        if post_ok is False:
            extras["env_degraded_after"] = True

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
