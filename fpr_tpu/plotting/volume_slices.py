"""3D field slice viewer — the analog of the reference's GLMakie
volumeslices demo (scripts-part1/makie_volumeslice_example.jl): renders the
three mid-plane slices of a 3D field (and optionally a time series of
checkpoints) to PNG.

    python -m fpr_tpu.plotting.volume_slices --checkpoint state.npz --field H
    python -m fpr_tpu.plotting.volume_slices --demo    # runs a 48^3 diffusion
"""

from __future__ import annotations

import argparse
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def render_slices(H: np.ndarray, out: Path, title: str = ""):
    nz, ny, nx = H.shape
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.6))
    vmax = float(np.abs(H).max()) or 1.0
    for ax, (name, sl) in zip(
        axes,
        {
            f"z = {nz//2}": H[nz // 2, :, :],
            f"y = {ny//2}": H[:, ny // 2, :],
            f"x = {nx//2}": H[:, :, nx // 2],
        }.items(),
    ):
        im = ax.imshow(sl, origin="lower", cmap="inferno", vmin=0, vmax=vmax)
        ax.set_title(name)
        fig.colorbar(im, ax=ax, shrink=0.8)
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=150)
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", type=str, default=None)
    ap.add_argument("--field", type=str, default="H")
    ap.add_argument("--out", type=str, default="figs/volume_slices.png")
    ap.add_argument("--demo", action="store_true")
    args = ap.parse_args()

    if args.demo:
        import jax.numpy as jnp

        from fpr_tpu.core.config import DiffusionConfig, ExecutionPolicy
        from fpr_tpu.models import diffusion3d

        cfg = DiffusionConfig(nx=48, ny=48, nz=48, ttot=0.4, tol=1e-6,
                              policy=ExecutionPolicy.JNP)
        H = diffusion3d.solve(cfg, dtype=jnp.float32).H
        title = "diffusion 48^3 at t=0.4"
    else:
        from fpr_tpu.utils import checkpoint

        data = checkpoint.load(args.checkpoint)
        H = np.asarray(data[args.field])
        if H.ndim == 2:
            H = H[None, :, :]
        title = f"{args.field} from {args.checkpoint}"
    render_slices(H, Path(args.out), title)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
