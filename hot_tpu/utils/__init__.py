"""Config tree, timers, structured metrics logging."""

from hot_tpu.utils.config import (  # noqa: F401
    SimConfig,
    SolverConfig,
    MultigridConfig,
    MeshConfig,
)
from hot_tpu.utils.timing import PhaseTimer  # noqa: F401
from hot_tpu.utils.metrics import MetricsLogger  # noqa: F401
