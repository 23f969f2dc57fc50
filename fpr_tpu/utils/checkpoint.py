"""Simulation checkpoint / resume.

The reference has no real checkpointing (SURVEY.md §5.4) — only JLD
visualization snapshots (part2.jl:236-257) and benchmark resume-by-CSV.
Here simulation state is a handful of pure arrays, so checkpointing is a
single npz file with a schema version; ``resume`` feeds straight back into
``navier_stokes.simulate(T0=..., W0=...)`` or a diffusion solve.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

SCHEMA = 1


def save(path, **arrays_and_scalars):
    """Atomic checkpoint write (tmp + rename)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    np.savez(tmp, __schema__=SCHEMA, **{
        k: np.asarray(v) for k, v in arrays_and_scalars.items()
    })
    # np.savez appends .npz to names without it
    produced = tmp if tmp.exists() else tmp.with_suffix(tmp.suffix + ".npz")
    produced.replace(path)


def load(path) -> dict:
    with np.load(path) as z:
        d = {k: z[k] for k in z.files if k != "__schema__"}
        schema = int(z["__schema__"]) if "__schema__" in z.files else 0
    if schema > SCHEMA:
        raise ValueError(f"checkpoint schema {schema} newer than supported {SCHEMA}")
    return d
