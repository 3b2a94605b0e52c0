"""Change-log sources: epoch-partitioned parquet (binlog segments).

The source abstraction the engine replays from. Layout is hive-style
``epoch=N`` directories (one per commit unit), the analog of WAL segments —
and of the reference's ``table$YYYYMMDD`` daily ingest slices
(``bigquery_etl/copy_deduplicate.py:96``). Per-epoch reads are
partition-pruned directory scans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..streaming.micro_batch import discover_epochs


class ParquetChangeLog:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def epochs(self) -> list[int]:
        return discover_epochs(self.path)

    def events_for(self, epoch: int) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, f"epoch={epoch}"))

    def full(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def batches(self):
        """Ordered (epoch, DataFrame) pairs — feed straight to
        ``CDCEngine.replay``."""
        for e in self.epochs():
            yield e, self.events_for(e)
