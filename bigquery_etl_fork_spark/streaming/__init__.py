from .micro_batch import discover_epochs, ready_epochs, stream_changelog, tail_changelog

__all__ = ["discover_epochs", "stream_changelog", "tail_changelog"]
