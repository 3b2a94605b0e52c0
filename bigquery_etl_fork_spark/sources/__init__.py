from .changelog import ParquetChangeLog
from .external import read_csv, read_json
from .export import publish_json

__all__ = ["ParquetChangeLog", "publish_json", "read_csv", "read_json"]
