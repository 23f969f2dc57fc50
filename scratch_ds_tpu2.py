import time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from fpr_tpu.ops import stencil2d
from fpr_tpu.solvers import multigrid

N = 4097
h = 1.0 / (N - 1)
rng = np.random.default_rng(0)
f = jnp.asarray(rng.standard_normal((N, N)))
f = f.at[0].set(0).at[-1].set(0).at[:, 0].set(0).at[:, -1].set(0)

for inner in (1, 2, 3):
    sol = jax.jit(lambda f, k=inner: multigrid.mg_solve_ds(None, f, h, 0.0, 1e-6, 30, inner_cycles=k))
    r = sol(f)
    it = int(r[2]); rel = float(r[1]) / float(stencil2d.rms(f))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); r = sol(f); float(r[1])
        best = min(best, time.perf_counter() - t0)
    print(f"inner={inner}: {best*1e3:6.1f} ms, outer {it}, rel r {rel:.2e}")
    res_true = stencil2d.residual(r[0], f, h, 0.0)
    print("   true rel:", float(stencil2d.rms(res_true)) / float(stencil2d.rms(f)))
