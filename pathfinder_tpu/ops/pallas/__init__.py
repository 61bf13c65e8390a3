from pathfinder_tpu.ops.pallas.woodbury_kernels import (
    sample_and_logq,
    whiten_sumsq,
)

__all__ = ["sample_and_logq", "whiten_sumsq"]
