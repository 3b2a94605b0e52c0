from .cdc import CDCEngine, EpochStats, ReplayStats, SimulatedCrash

__all__ = ["CDCEngine", "EpochStats", "ReplayStats", "SimulatedCrash"]
