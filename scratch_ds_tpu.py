import time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from fpr_tpu.ops import ds as dsm, pallas2d, stencil2d
from fpr_tpu.solvers import multigrid

# 1) EFT exactness ON TPU (guards against Mosaic reassociation)
a = jnp.asarray(np.random.default_rng(0).standard_normal((256, 256)), jnp.float32)
b = jnp.asarray(np.random.default_rng(1).standard_normal((256, 256)) * 1e-3, jnp.float32)
from jax.experimental import pallas as pl
def k(a_ref, b_ref, s_ref, e_ref, p_ref, q_ref):
    s, e = dsm.two_sum(a_ref[:, :], b_ref[:, :])
    p, q = dsm.two_prod(a_ref[:, :], b_ref[:, :])
    s_ref[:, :] = s; e_ref[:, :] = e; p_ref[:, :] = p; q_ref[:, :] = q
outs = pl.pallas_call(k, out_shape=[jax.ShapeDtypeStruct((256, 256), jnp.float32)] * 4)(a, b)
s, e, p, q = [np.asarray(o, np.float64) for o in outs]
a64, b64 = np.asarray(a, np.float64), np.asarray(b, np.float64)
print("two_sum exact on TPU:", np.array_equal(s + e, a64 + b64))
print("two_prod exact on TPU:", np.array_equal(p + q, a64 * b64))

# 2) ds residual parity at 4097^2 on TPU
N = 4097
h = 1.0 / (N - 1)
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((N, N)))
f = jnp.asarray(rng.standard_normal((N, N)))
br = pallas2d._pick_br(N, N, 4)
def pack(x):
    hi, lo = dsm.to_ds(x)
    return jnp.stack([pallas2d.pad2d(hi, br), pallas2d.pad2d(lo, br)])
e0 = jnp.zeros((pallas2d.padded_rows(N, br), pallas2d.padded_cols(N)), jnp.float32)
dp = jax.jit(lambda ud, fd, e: dsm.defect_pass(ud, fd, e, 0.0, N, N, br, h, 0.0))
u_out, r32, r_rms = dp(pack(u), pack(f), e0)
ref = np.asarray(stencil2d.residual(u, f, h, 0.0))
got = np.asarray(pallas2d.unpad2d(r32, N, N), np.float64)
scale = np.abs(np.asarray(u)).max() / h**2
err = np.abs(got - ref).max()
print(f"ds residual max err: {err:.3e} (scale {scale:.2e}, rel {err/scale:.2e})")

# 3) timing of the defect pass
K = 50
def loop_fn(ud, fd, e):
    def body(i, ud):
        ud2, r32, rr = dsm.defect_pass(ud, fd, e, 0.0, N, N, br, h, 0.0)
        return ud2
    return jax.lax.fori_loop(0, K, body, ud)
g = jax.jit(loop_fn)
ud = pack(u); fd = pack(f)
r = g(ud, fd, e0); float(r[0, 10, 10])
t0 = time.perf_counter(); r = g(ud, fd, e0); float(r[0, 10, 10])
print(f"defect_pass: {(time.perf_counter() - t0) / K * 1e3:.3f} ms/iter")

# 4) full solve: mg_solve_ds vs mg_solve_mixed at 4097^2
f_b = f.at[0].set(0).at[-1].set(0).at[:, 0].set(0).at[:, -1].set(0)
u0 = jnp.zeros((N, N))
sol = jax.jit(lambda u0, f: multigrid.mg_solve_ds(u0, f, h, 0.0, 1e-6, 30, inner_cycles=2))
r = sol(u0, f_b); print("ds solve: outer iters", int(r[2]), "rel r", float(r[1]) / float(stencil2d.rms(f_b)))
t0 = time.perf_counter(); r = sol(u0, f_b); float(r[1])
print(f"mg_solve_ds 4097 tol 1e-6 (inner=2): {(time.perf_counter() - t0) * 1e3:.1f} ms")
res_true = stencil2d.residual(r[0], f_b, h, 0.0)
print("true final rel residual:", float(stencil2d.rms(res_true)) / float(stencil2d.rms(f_b)))
sol1 = jax.jit(lambda u0, f: multigrid.mg_solve_ds(u0, f, h, 0.0, 1e-6, 30, inner_cycles=1))
r = sol1(u0, f_b); print("inner=1: outer iters", int(r[2]), "rel r", float(r[1]) / float(stencil2d.rms(f_b)))
t0 = time.perf_counter(); r = sol1(u0, f_b); float(r[1])
print(f"mg_solve_ds inner=1: {(time.perf_counter() - t0) * 1e3:.1f} ms")
