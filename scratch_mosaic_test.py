"""Probe Mosaic support: strided slices (sublane/lane), lane reshape tricks."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_kernel(name, body, out_shape, x):
    def kernel(x_ref, o_ref):
        o_ref[:, :] = body(x_ref[:, :])

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        )(x)
        ref = np.asarray(body(jnp.asarray(np.asarray(x))))
        ok = np.allclose(np.asarray(out), ref)
        print(f"{name:45s} OK, correct={ok}")
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"{name:45s} FAIL: {type(e).__name__}: {msg}")


x = jnp.asarray(np.random.default_rng(0).standard_normal((256, 512)), jnp.float32)

try_kernel("sublane strided x[::2, :]", lambda v: v[::2, :], (128, 512), x)
try_kernel("lane strided x[:, ::2]", lambda v: v[:, ::2], (256, 256), x)
try_kernel("lane reshape (r,n//2,2)->[:,:,0]",
           lambda v: v.reshape(256, 256, 2)[:, :, 0], (256, 256), x)
try_kernel("sublane reshape (n//2,2,c)->[:,0,:]",
           lambda v: v.reshape(128, 2, 512)[:, 0, :], (128, 512), x)
try_kernel("both strided x[::2, ::2]", lambda v: v[::2, ::2], (128, 256), x)
# strided STORE test: write every other column
def store_strided(v):
    out = jnp.zeros((256, 512), v.dtype)
    return out.at[:, ::2].set(v[:, :256])
try_kernel("lane strided store .at[:, ::2].set", store_strided, (256, 512), x)
