from fpr_tpu.solvers.multigrid import (
    mg_solve,
    mg_solve_ds,
    mg_solve_mixed,
    mg_solve_rp,
    vcycle,
)
from fpr_tpu.solvers.krylov import cg, mg_preconditioned_cg

__all__ = [
    "mg_solve",
    "mg_solve_ds",
    "mg_solve_mixed",
    "mg_solve_rp",
    "vcycle",
    "cg",
    "mg_preconditioned_cg",
]
