from fpr_tpu.core.config import (
    CoarseSolver,
    DiffusionConfig,
    ExecutionPolicy,
    InitScheme,
    MGConfig,
    NSConfig,
    Smoother,
)
from fpr_tpu.core.grid import Grid2D, Grid3D, is_mg_grid, mg_levels

__all__ = [
    "CoarseSolver",
    "DiffusionConfig",
    "ExecutionPolicy",
    "InitScheme",
    "MGConfig",
    "NSConfig",
    "Smoother",
    "Grid2D",
    "Grid3D",
    "is_mg_grid",
    "mg_levels",
]
