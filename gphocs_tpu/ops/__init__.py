from gphocs_tpu.ops.pruning import data_log_likelihood  # noqa: F401
from gphocs_tpu.ops.coalstats import (  # noqa: F401
    CoalStats,
    genealogy_log_prior,
    segments,
    sufficient_stats,
)
