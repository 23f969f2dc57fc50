from fpr_tpu.solvers.multigrid import mg_solve, vcycle
from fpr_tpu.solvers.krylov import cg, mg_preconditioned_cg

__all__ = ["mg_solve", "vcycle", "cg", "mg_preconditioned_cg"]
