from fpr_tpu.ops import stencil2d, stencil3d, transfer, reductions

__all__ = ["stencil2d", "stencil3d", "transfer", "reductions"]
