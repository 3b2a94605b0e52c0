from .dedup_lww import lww_dedup, lww_dedup_salted
from .merge import merge_delta
from .skew import is_skewed, max_key_count

__all__ = ["lww_dedup", "lww_dedup_salted", "merge_delta", "is_skewed", "max_key_count"]
