"""pathfinder_tpu — TPU-native Pathfinder (parallel quasi-Newton VI) in JAX.

A from-scratch JAX/XLA/Pallas implementation with the capability surface of
the reference Julia package (mlcolab/Pathfinder.jl), redesigned TPU-first:
fixed-shape ``lax.scan``/``while_loop`` optimization, masked low-rank
covariance factors, ``vmap``/``shard_map`` path parallelism, and fused
sampling kernels.
"""

from pathfinder_tpu.ops.woodbury import WoodburyPDMat, pdfactorize, pdunfactorize

__version__ = "0.1.0"

__all__ = [
    "WoodburyPDMat",
    "pdfactorize",
    "pdunfactorize",
]
