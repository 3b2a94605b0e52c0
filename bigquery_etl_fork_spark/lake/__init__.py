from .table import BUCKET_COL, CommitConflict, LakeTable, Snapshot, bucket_id

__all__ = ["BUCKET_COL", "CommitConflict", "LakeTable", "Snapshot", "bucket_id"]
