from pathfinder_tpu.integrations.hmc import (
    WoodburyMetric,
    hmc,
    hmc_warm_start,
    leapfrog,
)
from pathfinder_tpu.integrations.nuts import (
    NUTSResult,
    nuts,
    nuts_chains,
    nuts_warm_start,
    warm_start_chains,
)
from pathfinder_tpu.integrations.ppl import (
    draws_to_dict,
    from_numpyro,
    to_inference_data,
)
from pathfinder_tpu.integrations.transforms import (
    Exp,
    Identity,
    Interval,
    Ordered,
    Simplex,
    Stacked,
    TransformedLogDensity,
)

__all__ = [
    "WoodburyMetric",
    "leapfrog",
    "hmc",
    "hmc_warm_start",
    "nuts",
    "nuts_chains",
    "nuts_warm_start",
    "warm_start_chains",
    "NUTSResult",
    "from_numpyro",
    "draws_to_dict",
    "to_inference_data",
    "Identity",
    "Exp",
    "Interval",
    "Ordered",
    "Simplex",
    "Stacked",
    "TransformedLogDensity",
]
