import time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from fpr_tpu.ops import pallas2d, transfer

N = 4097
h = 1.0 / (N - 1)
rng = np.random.default_rng(0)
f = jnp.asarray(rng.standard_normal((N, N)), jnp.float32)
u = jnp.zeros_like(f)
br = pallas2d._pick_br(N, N, 4)
u_rp = pallas2d.pad2d(u, br)
f_rp = pallas2d.pad2d(f, br)
K = 50

def timeit(name, fn, *args, k=K, reps=3, traffic_mb=None):
    g = jax.jit(fn)
    r = g(*args)
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        r = g(*args)
        float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0))
    ms = best / k * 1e3
    bw = f"  {traffic_mb/ms:7.0f} GB/s" if traffic_mb else ""
    print(f"{name:42s} {ms:8.3f} ms{bw}")

def loop(body):
    def fn(x, *rest):
        return jax.lax.fori_loop(0, K, lambda i, xx: body(xx, *rest), x)
    return fn

A = N * N * 4 / 1e6  # MB per logical array
timeit("smooth_rp (1 sweep, no norm)",
       loop(lambda u_rp, f_rp: pallas2d.smooth_rp(u_rp, f_rp, N, N, br, h, 0.0, 0.8, with_norm=False)[0]),
       u_rp, f_rp, traffic_mb=3 * A)
timeit("smooth_rp (1 sweep, with norm)",
       loop(lambda u_rp, f_rp: pallas2d.smooth_rp(u_rp, f_rp, N, N, br, h, 0.0, 0.8, with_norm=True)[0]),
       u_rp, f_rp, traffic_mb=3 * A)
timeit("residual_rp",
       loop(lambda u_rp, f_rp: pallas2d.residual_rp(u_rp, f_rp, N, N, br, h, 0.0)),
       u_rp, f_rp, traffic_mb=3 * A)
timeit("smooth2_rp (2 sweeps)",
       loop(lambda u_rp, f_rp: pallas2d.smooth2_rp(u_rp, f_rp, N, N, br, h, 0.0, 0.8, with_norm=False)[0]),
       u_rp, f_rp, traffic_mb=3 * A)
timeit("smooth2r_split (2 sweeps + res + restrict)",
       loop(lambda u_rp, f_rp: pallas2d.smooth2r_split_rp(u_rp, f_rp, N, N, br, h, 0.0, 0.8)[0]),
       u_rp, f_rp, traffic_mb=4 * A)
timeit("matvec (no f stream)",
       loop(lambda u_rp: pallas2d._call("matvec", u_rp, None, N, N, br, h, 0.0)[0]),
       u_rp, traffic_mb=2 * A)
