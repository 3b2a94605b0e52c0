from .changelog import ParquetChangeLog
from .external import read_csv, read_json

__all__ = ["ParquetChangeLog", "read_csv", "read_json"]
