"""Profile the 4097^2 f32 V-cycle piece by piece on the TPU.

Each piece is iterated K times inside ONE jit (fori_loop) to amortize the
~2.5 ms per-call tunnel overhead; a scalar read forces completion.
"""
import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from fpr_tpu.ops import pallas2d, transfer, stencil2d
from fpr_tpu.solvers import multigrid
from fpr_tpu.core.config import MGConfig

N = 4097
h = 1.0 / (N - 1)
rng = np.random.default_rng(0)
f = jnp.asarray(rng.standard_normal((N, N)), jnp.float32)
f = f.at[0].set(0).at[-1].set(0).at[:, 0].set(0).at[:, -1].set(0)
u = jnp.zeros_like(f)

br = pallas2d._pick_br(N, N, 4)
print("br:", br, "padded:", pallas2d.padded_rows(N, br), pallas2d.padded_cols(N))
u_rp = pallas2d.pad2d(u, br)
f_rp = pallas2d.pad2d(f, br)

K = 50


def timeit(name, fn, *args, k=K, reps=3):
    g = jax.jit(fn)
    r = g(*args)
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        r = g(*args)
        float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0))
    print(f"{name:38s} {best / k * 1e3:8.3f} ms/iter")
    return best / k


def loop(body):
    def fn(x, *rest):
        return jax.lax.fori_loop(0, K, lambda i, xx: body(xx, *rest), x)
    return fn


timeit("smooth2r (down leg) 4097",
       loop(lambda u_rp, f_rp: pallas2d.smooth2r_rp(u_rp, f_rp, N, N, br, h, 0.0, 0.8)[0]),
       u_rp, f_rp)

res_rp = jax.jit(lambda a, b: pallas2d.smooth2r_rp(a, b, N, N, br, h, 0.0, 0.8)[1])(u_rp, f_rp)
timeit("restrict_rp 4097->2049",
       loop(lambda r: r * (1.0 + 1e-30 * transfer.restrict_rp(r, N, N)[3, 3])),
       res_rp)

corr = jnp.asarray(rng.standard_normal((2049, 2049)), jnp.float32)
timeit("corr_smooth2 (up leg) 4097",
       loop(lambda u_rp, f_rp, c: pallas2d.corr_smooth2_rp(
           u_rp, f_rp, c, N, N, br, h, 0.0, 0.8, with_norm=True)[0]),
       u_rp, f_rp, corr)

for n_lvl in (4097, 2049, 1025):
    h_l = 1.0 / (n_lvl - 1)
    f_l = jnp.asarray(rng.standard_normal((n_lvl, n_lvl)), jnp.float32)
    br_l = pallas2d._pick_br(n_lvl, n_lvl, 4)
    u_l = jnp.zeros((pallas2d.padded_rows(n_lvl, br_l), pallas2d.padded_cols(n_lvl)), jnp.float32)
    f_lrp = pallas2d.pad2d(f_l, br_l)
    timeit(f"vcycle_rp {n_lvl}",
           loop(lambda u, ff, n=n_lvl, hh=h_l: multigrid.vcycle_rp(
               u, ff, n, n, hh, 0.0, 1e-6, MGConfig())[0]),
           u_l, f_lrp)

import dataclasses
from fpr_tpu.core.config import ExecutionPolicy
f_s = jnp.asarray(rng.standard_normal((1025, 1025)), jnp.float32)
u_s = jnp.zeros_like(f_s)
cfg_jnp = dataclasses.replace(MGConfig(), policy=ExecutionPolicy.JNP)
timeit("jnp vcycle 1025 (subtree)",
       loop(lambda uu, ff: multigrid.vcycle(uu, ff, 1.0 / 1024, 0.0, 1e-6, cfg_jnp)[0]),
       u_s, f_s)
f_s2 = jnp.asarray(rng.standard_normal((513, 513)), jnp.float32)
timeit("jnp vcycle 513",
       loop(lambda uu, ff: multigrid.vcycle(uu, ff, 1.0 / 512, 0.0, 1e-6, cfg_jnp)[0]),
       jnp.zeros_like(f_s2), f_s2)

# f64 outer-iteration pieces
f64 = f.astype(jnp.float64)
u64 = jnp.ones_like(f64)
timeit("f64 residual 4097", loop(lambda uu, ff: stencil2d.residual(uu, ff, h, 0.0) * 0.999 + uu * 0.001), u64, f64)
timeit("f64 rms 4097", loop(lambda uu: uu * (stencil2d.rms(uu) * 1e-30 + 1.0)), u64)

# full mixed solve, x64 truly on this time
ms = jax.jit(lambda u, f: multigrid.mg_solve_mixed(u, f, h, 0.0, 1e-6, 30, inner_cycles=2))
r = ms(jnp.zeros_like(f64), f64)
print("mixed outer iters:", int(r[2]), "rel r:", float(r[1]) / float(stencil2d.rms(f64)))
t0 = time.perf_counter()
r = ms(jnp.zeros_like(f64), f64)
float(r[1])
print(f"mg_solve_mixed 4097 tol 1e-6: {(time.perf_counter() - t0) * 1e3:.1f} ms")
ms1 = jax.jit(lambda u, f: multigrid.mg_solve_mixed(u, f, h, 0.0, 1e-6, 30, inner_cycles=1))
r = ms1(jnp.zeros_like(f64), f64)
print("inner_cycles=1 outer iters:", int(r[2]), "rel r:", float(r[1]) / float(stencil2d.rms(f64)))
t0 = time.perf_counter()
r = ms1(jnp.zeros_like(f64), f64)
float(r[1])
print(f"mg_solve_mixed inner=1: {(time.perf_counter() - t0) * 1e3:.1f} ms")
