from .micro_batch import discover_epochs, ready_epochs, stream_changelog, tail_changelog
from .windowed import tumbling_window_counts

__all__ = [
    "discover_epochs",
    "ready_epochs",
    "stream_changelog",
    "tail_changelog",
    "tumbling_window_counts",
]
