from pathfinder_tpu.ops.woodbury import (
    WoodburyFactor,
    WoodburyPDMat,
    pdfactorize,
    pdunfactorize,
)

__all__ = [
    "WoodburyFactor",
    "WoodburyPDMat",
    "pdfactorize",
    "pdunfactorize",
]
