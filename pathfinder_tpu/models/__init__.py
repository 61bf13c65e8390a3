from pathfinder_tpu.models.bayes import (
    BayesModel,
    Beta,
    Dirichlet,
    Exponential,
    HalfNormal,
    LogNormal,
    Normal,
    StudentT,
    Uniform,
)
from pathfinder_tpu.models.protocol import (
    LogDensity,
    PytreeTarget,
    as_log_density,
    from_pytree_logp,
)
from pathfinder_tpu.models.zoo import (
    Banana,
    CorrelatedGaussian,
    LogisticRegression,
    NealsFunnel,
    StandardNormal,
    german_credit_synthetic,
)

__all__ = [
    "BayesModel",
    "Normal",
    "HalfNormal",
    "LogNormal",
    "Exponential",
    "Uniform",
    "Beta",
    "StudentT",
    "Dirichlet",
    "LogDensity",
    "as_log_density",
    "from_pytree_logp",
    "PytreeTarget",
    "StandardNormal",
    "CorrelatedGaussian",
    "NealsFunnel",
    "Banana",
    "LogisticRegression",
    "german_credit_synthetic",
]
