"""CG tests — analog of test/krylov.jl (66^2 Helmholtz, deliberately not a
2^k+1 grid) plus the MG-preconditioned CG composition."""

import jax.numpy as jnp
import numpy as np

from fpr_tpu.core.config import MGConfig
from fpr_tpu.solvers import krylov


def test_cg_converges_helmholtz():
    n = 66
    h = 1.0 / (n - 1)
    c = 3.14
    tol = 1e-6
    b = np.ones((n, n))
    b[0, :] = b[-1, :] = b[:, 0] = b[:, -1] = 0.0

    x, r_rms, iters = krylov.cg(jnp.asarray(b), h, h, c, tol, 1000)
    assert float(r_rms) < tol * np.sqrt((b**2).sum() / n**2)
    assert int(iters) < 1000


def test_cg_solution_matches_oracle(rng):
    from fpr_tpu.ops import oracle

    n = 33
    h = 1.0 / (n - 1)
    c = 3.14
    b = np.zeros((n, n))
    b[1:-1, 1:-1] = rng.random((n - 2, n - 2))
    x, r_rms, _ = krylov.cg(jnp.asarray(b), h, h, c, 1e-12, 5000)
    A = oracle.helmholtz_operator(n - 2, n - 2, h, c)
    import scipy.sparse.linalg as spla

    xd = spla.spsolve(A.tocsc(), b[1:-1, 1:-1].ravel()).reshape(n - 2, n - 2)
    np.testing.assert_allclose(np.asarray(x)[1:-1, 1:-1], xd, atol=1e-9)


def test_mg_preconditioned_cg_beats_plain_cg(rng):
    n = 129
    h = 1.0 / (n - 1)
    tol = 1e-8
    b = np.zeros((n, n))
    b[1:-1, 1:-1] = rng.random((n - 2, n - 2))
    bj = jnp.asarray(b)
    normb = np.sqrt((b**2).sum())

    x_pcg, r_pcg, it_pcg = krylov.mg_preconditioned_cg(
        bj, h, 0.0, tol, 100, mg_cfg=MGConfig()
    )
    x_cg, r_cg, it_cg = krylov.cg(bj, h, h, 0.0, tol, 3000)

    # both converged by their own ||r|| < tol * ||b|| criterion
    assert float(r_pcg) * n <= tol * normb * 1.001
    assert float(r_cg) * n <= tol * normb * 1.001
    assert int(it_pcg) < int(it_cg) / 10  # MG preconditioning slashes iters
    assert int(it_pcg) <= 25
