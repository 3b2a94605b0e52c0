"""Bit-packed activity / retention calculus — the clients_last_seen family.

The reference's distinctive incremental pattern (SURVEY.md §2.9): per-entity
28-day activity bitmaps built with ``BIT_OR(1 << offset)``, folded forward
one day at a time by FULL OUTER JOIN of yesterday's state with today's
delta (``telemetry_derived/clients_last_seen_v2/query.sql:74-171``), expiring
entities idle 28 days (shift turns their bitmap to 0).

Two equivalent computations (algebraically identical — proven against each
other and a SQL oracle in tests/queries):

- ``fold_daily_bits``  — the reference's day-at-a-time FULL JOIN fold
  (state-carrying, what production runs incrementally);
- ``bits_direct``      — one-shot BIT_OR over day offsets (what a backfill
  computes; also the DuckDB oracle form).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import (
    bits_from_offset,
    combine_adjacent_days_28_bits,
    days_since_seen,
)


def daily_flags(
    df: DataFrame, key: str, date_col: str, anchor_date: str, window_days: int = 28
) -> DataFrame:
    """(key, day_offset) activity flags within the window ending at anchor:
    offset 0 = anchor day, 1 = the day before, ..."""
    off = F.datediff(F.lit(anchor_date).cast("date"), F.to_date(date_col))
    return (
        df.select(F.col(key), off.alias("_off"))
        .where((F.col("_off") >= 0) & (F.col("_off") < window_days))
        .distinct()
    )


def bits_direct(
    df: DataFrame, key: str, date_col: str, anchor_date: str, window_days: int = 28
) -> DataFrame:
    """One-shot bitmap: BIT_OR(1 << day_offset) per key."""
    flags = daily_flags(df, key, date_col, anchor_date, window_days)
    return flags.groupBy(key).agg(
        F.bit_or(bits_from_offset(F.col("_off"))).cast("long").alias("days_seen_bits")
    )


def fold_daily_bits(
    df: DataFrame,
    key: str,
    date_col: str,
    days: list[str],
    window_days: int = 28,
) -> DataFrame:
    """The reference's incremental fold, day by day over ``days`` (ascending):

        state(d) = FULL JOIN(shift(state(d-1)) filtered to nonzero,
                             today's actives)
        bits     = shift_28(prev_bits) | (today ? 1 : 0)

    Returns the final state after the last day. Each day is one FULL JOIN —
    exactly the production shape (clients_last_seen_v2/query.sql:115-171),
    with 28-day-idle rows expiring when their shifted bitmap hits 0.
    """
    state: DataFrame | None = None
    for d in days:
        today = (
            df.where(F.to_date(date_col) == F.lit(d).cast("date"))
            .select(key)
            .distinct()
            .withColumn("_today", F.lit(1))
        )
        if state is None:
            state = today.select(
                F.col(key), F.col("_today").cast("long").alias("days_seen_bits")
            )
            continue
        prev = state.select(F.col(key), F.col("days_seen_bits").alias("_prev"))
        joined = prev.join(today, on=key, how="full")
        folded = joined.select(
            F.col(key),
            combine_adjacent_days_28_bits(
                F.coalesce(F.col("_prev"), F.lit(0)), F.col("_today")
            ).alias("days_seen_bits"),
        )
        state = folded.where(F.col("days_seen_bits") > 0)
    assert state is not None, "days must be non-empty"
    return state


def retention_metrics(bits_col) -> dict[str, F.Column]:
    """bits28.retention-style derived metrics (reference
    sql/mozfun/bits28/retention/udf.sql:63-88)."""
    c = F.col(bits_col) if isinstance(bits_col, str) else bits_col
    week = lambda n: c.bitwiseAND(F.lit(((1 << 7) - 1) << (7 * n))) > 0  # noqa: E731
    return {
        "days_since_seen": days_since_seen(c),
        "active_week_0": week(0),
        "active_week_1": week(1),
        "active_week_2": week(2),
        "active_week_3": week(3),
        "retained_week_3": week(3) & week(0),
    }
