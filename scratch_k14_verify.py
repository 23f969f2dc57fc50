import jax
import jax.numpy as jnp
import numpy as np
from fpr_tpu.ops import stencil2d
from fpr_tpu.solvers.multigrid import mg_solve_ds_jit

k = 14
n = 2**k + 1
h = 1.0 / (n - 1)
key = jax.random.PRNGKey(0)
b = (jnp.zeros((n, n), jnp.float32)
     .at[1:-1, 1:-1].set(jax.random.uniform(key, (n - 2, n - 2), jnp.float32)))
(uh, ul), r, it = mg_solve_ds_jit(b, h, 0.0, 1e-6, 30, return_pair=True)
claimed = float(r) / float(stencil2d.rms(b))
u = np.asarray(uh, np.float64) + np.asarray(ul, np.float64)
b64 = np.asarray(b, np.float64)
res = np.zeros_like(u)
res[1:-1, 1:-1] = (
    (u[:-2, 1:-1] + u[2:, 1:-1] + u[1:-1, :-2] + u[1:-1, 2:] - 4.0 * u[1:-1, 1:-1])
    / h**2 - b64[1:-1, 1:-1]
)
rel_true = np.sqrt((res**2).mean()) / np.sqrt((b64**2).mean())
print(f"k=14: claimed rel {claimed:.3e}, TRUE f64 rel {rel_true:.3e}, outer {int(it)}")
