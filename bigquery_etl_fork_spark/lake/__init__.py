from .table import BUCKET_COL, LakeTable, Snapshot, bucket_id

__all__ = ["BUCKET_COL", "LakeTable", "Snapshot", "bucket_id"]
