"""Tumbling-window streaming aggregates — the materialized-view analog.

The reference's only push-style query is an incrementally-refreshed
materialized view bucketing events into hourly tumbling windows:
``TIMESTAMP_TRUNC(submission_timestamp, HOUR) AS window_start`` + counts
(``sql_generators/glean_usage/templates/
event_monitoring_live_v1.materialized_view.sql:59-61``, 60-min refresh).
Spark-first form: ``readStream → withWatermark → groupBy(window(...))`` —
Structured Streaming keeps the per-window partial aggregates in state and
the watermark bounds that state (the reference has no watermark concept;
its late data is handled by re-running a day). Watermark semantics as
actually guaranteed by Spark — and pinned in tests: windows finalize
exactly once in append mode, only after the watermark passes their end;
late events within the allowed lateness fold into the right window;
events later than the watermark are in Spark's documented
"may or may not be aggregated" zone (measured here: still aggregated
until their window's state is evicted — eviction, not input-dropping, is
the deterministic part).

The batch form of the same query is ``queries.q_hourly_tumbling``
(oracle-checked); the streaming form is equality-tested against it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    window: str = "1 hour",
    watermark: str = "2 hours",
    user_col: str | None = "user_id",
) -> DataFrame:
    """Per-(window, keys) event counts over a stream.

    Exact COUNT(DISTINCT) is not expressible in streaming aggregation state
    (unbounded per-window memory), so distinct users are
    ``approx_count_distinct`` — the same trade the reference makes by
    running HLL_COUNT in its monitoring views. Emits ``window_start`` as a
    column so the output schema matches the batch/oracle form."""
    aggs = [F.count("*").alias("n_events")]
    if user_col is not None:
        aggs.append(F.approx_count_distinct(user_col).alias("n_users_approx"))
    # event-time watermarks require TIMESTAMP (with zone); parquet sources
    # written as TIMESTAMP_NTZ (our fixtures) are cast — a no-op otherwise
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("_w"), *keys)
        .agg(*aggs)
        .select(
            F.col("_w.start").alias("window_start"),
            *keys,
            "n_events",
            *(["n_users_approx"] if user_col else []),
        )
    )
