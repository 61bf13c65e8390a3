from pathfinder_tpu.models.protocol import LogDensity, as_log_density
from pathfinder_tpu.models.zoo import (
    Banana,
    CorrelatedGaussian,
    LogisticRegression,
    NealsFunnel,
    StandardNormal,
    german_credit_synthetic,
)

__all__ = [
    "LogDensity",
    "as_log_density",
    "StandardNormal",
    "CorrelatedGaussian",
    "NealsFunnel",
    "Banana",
    "LogisticRegression",
    "german_credit_synthetic",
]
