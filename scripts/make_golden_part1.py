"""Generate the part-1 golden field-snapshot fixture.

The reference commits a BSON golden (test/part1.jl:18-42 +
test/reftest-files/test_1.bson): a 12x12 sample of the z=15 slice at 32^3,
compared against ALL THREE solver variants at atol 1e-5 — the one test in
its suite that catches a spatial-pattern regression which preserves probe
values and residual norms.  This script regenerates fpr_tpu's own golden
(tests/fixtures/golden_part1_32.npz) from the JNP f64 tier on CPU; the
test (tests/test_diffusion3d.py::test_golden_field_snapshot) then holds
every tier to it.

Run from the repo root:  python scripts/make_golden_part1.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from fpr_tpu.core.config import DiffusionConfig, ExecutionPolicy
from fpr_tpu.models import diffusion3d


def golden_indices(n: int = 32, k: int = 12) -> np.ndarray:
    """The reference's sample recipe (test/part1.jl:25): ceil(LinRange(1, n, k)),
    converted to 0-based."""
    return np.ceil(np.linspace(1, n, k)).astype(int) - 1


def main() -> None:
    cfg = DiffusionConfig(
        nx=32, ny=32, nz=32, ttot=1.0, tol=1e-8, policy=ExecutionPolicy.JNP
    )
    res = diffusion3d.solve(cfg, dtype=jnp.float64)
    assert res.converged
    inds = golden_indices()
    # z slice 14 (0-based) = the reference's H[:, :, 15]; our layout is
    # (nz, ny, nx)
    sample = res.H[14][np.ix_(inds, inds)]
    out = os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures",
        "golden_part1_32.npz",
    )
    np.savez(
        out,
        X=np.asarray(res.x)[inds],
        H=sample,
        z_index=14,
        indices=inds,
    )
    print(f"wrote {out}: H sample {sample.shape}, X {inds.shape}")


if __name__ == "__main__":
    main()
