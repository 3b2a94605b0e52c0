from .cdc import CDCEngine, EpochStats, ReplayStats, SimulatedCrash
from .rollup import IncrementalRollup

__all__ = [
    "CDCEngine",
    "EpochStats",
    "IncrementalRollup",
    "ReplayStats",
    "SimulatedCrash",
]
