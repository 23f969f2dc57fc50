import time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from fpr_tpu.ops import ds as dsm, pallas2d, stencil2d
from fpr_tpu.solvers import multigrid
from fpr_tpu.core.config import MGConfig

N = 4097
h = 1.0 / (N - 1)
rng = np.random.default_rng(0)
f = jnp.asarray(rng.standard_normal((N, N)))
br = pallas2d._pick_br(N, N, 4)
total, nxp = pallas2d.padded_rows(N, br), pallas2d.padded_cols(N)

def timeit(name, g, *args, k=1, reps=3):
    r = g(*args); float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter(); r = g(*args)
        float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:38s} {best/k*1e3:8.2f} ms")

def pack(a):
    hi, lo = dsm.to_ds(a)
    return jnp.stack([pallas2d.pad2d(hi, br), pallas2d.pad2d(lo, br)])

timeit("pack(f) [f64 entry conversion]", jax.jit(pack), f)
f_ds = jax.jit(pack)(f)
timeit("from_ds exit", jax.jit(lambda ud: dsm.from_ds(
    pallas2d.unpad2d(ud[0], N, N), pallas2d.unpad2d(ud[1], N, N))), f_ds)

K = 20
zero_e = jnp.zeros((total, nxp), jnp.float32)
u_ds = jnp.zeros_like(f_ds)
r32 = -f_ds[0]

def body_like(carry, _f_ds):
    u_ds, r32 = carry
    e = zero_e
    for _ in range(2):
        e, _ = multigrid.vcycle_rp(e, r32, N, N, h, 0.0, 1e-6, MGConfig())
    u_ds, r32, r_rms = dsm.defect_pass(u_ds, _f_ds, e, 1.0, N, N, br, h, 0.0)
    return (u_ds, r32)

g = jax.jit(lambda u_ds, r32, f_ds: jax.lax.fori_loop(
    0, K, lambda i, c: body_like(c, f_ds), (u_ds, r32)))
timeit("while-body (defect + 2 vcycles)", g, u_ds, r32, f_ds, k=K)

g1 = jax.jit(lambda u_ds, r32, f_ds: jax.lax.fori_loop(
    0, K, lambda i, c: (dsm.defect_pass(c[0], f_ds, zero_e, 1.0, N, N, br, h, 0.0)[0], c[1]),
    (u_ds, r32)))
timeit("defect_pass alone (in fori)", g1, u_ds, r32, f_ds, k=K)

def vc_only(carry, r32):
    e = carry
    for _ in range(2):
        e, _ = multigrid.vcycle_rp(e, r32, N, N, h, 0.0, 1e-6, MGConfig())
    return e * 0.5
g2 = jax.jit(lambda e, r32: jax.lax.fori_loop(0, K, lambda i, c: vc_only(c, r32), e))
timeit("2x vcycle_rp alone (in fori)", g2, zero_e, r32, k=K)
