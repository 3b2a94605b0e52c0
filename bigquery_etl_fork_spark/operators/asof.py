"""As-of join: for each left row, the latest right row at or before it.

The reference approximates this with join + QUALIFY ROW_NUMBER()=1
(``mozilla_org_derived/ga_sessions_v2/script.sql:63-81``); semantics here
match DuckDB's ``ASOF JOIN`` (oracle-checked in queries.py): greatest
right.ts <= left.ts, exact matches allowed, unmatched left rows kept with
nulls.

Two physical strategies, equality-tested against each other:

- ``jvm`` (default) — union the tagged left and right rows, then carry ONE
  struct of all right columns forward with ``last(struct, ignorenulls=True)``
  over ``Window.partitionBy(key).orderBy(ts, tag)`` and keep the left rows.
  One shuffle, pure Catalyst window — no Python in the hot path, whole-stage
  codegen end to end. At equal timestamps the right row sorts first
  (tag 0 < 1), which is exactly "exact matches allowed". The single-struct
  carry matters: carrying columns independently would substitute stale
  values from older right rows whenever the matched row holds a null field
  (mixing columns across right rows); the struct is non-null for every right
  row, so per-row null fields survive intact.
- ``pandas`` — cogrouped ``applyInPandas`` running ``pd.merge_asof`` per key
  group (Arrow-batched; SURVEY.md §2.3's mapping). Kept as a mode because
  the kernel shape generalizes to tolerance/nearest variants Spark windows
  can't express.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    mode: str = "jvm",
) -> DataFrame:
    """Left as-of join on ``key``: attach the right row with the greatest
    ``right_ts`` <= ``left_ts``. Right side must be unique per (key, ts)
    (pre-dedup if needed) for deterministic results."""
    if mode == "jvm":
        return _asof_jvm(left, right, key, left_ts, right_ts, right_cols)
    if mode == "pandas":
        return _asof_pandas(left, right, key, left_ts, right_ts, right_cols)
    raise ValueError(f"unknown mode {mode!r}")


def _asof_jvm(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    from pyspark.sql import types as T

    l_types = {f.name: f.dataType for f in left.schema.fields}
    r_types = {f.name: f.dataType for f in right.schema.fields}
    l_cols = list(left.columns)
    rs_type = T.StructType(
        [T.StructField(c, r_types[c]) for c in right_cols]
    )
    tagged_left = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in l_cols],
        F.lit(None).cast(rs_type).alias("_rs"),
    )
    tagged_right = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(l_types[c]).alias(c) for c in l_cols],
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("_rs"),
    )
    u = tagged_left.unionByName(tagged_right)
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = F.last(F.col("_rs"), ignorenulls=True).over(w).alias("_rs")
    return (
        u.select("_tag", *l_cols, carried)
        .where(F.col("_tag") == 1)
        .select(*l_cols, *[F.col("_rs").getField(c).alias(c) for c in right_cols])
    )


def _asof_pandas(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
    right_schema = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    out_fields += [f"{c} {right_schema[c]}" for c in right_cols]
    out_schema = ", ".join(out_fields)
    l_cols = list(left.columns)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_ts, kind="stable")
        if rpdf.empty:
            for c in right_cols:
                lpdf[c] = None
            return lpdf[l_cols + right_cols]
        rpdf = rpdf.sort_values(right_ts, kind="stable")
        merged = pd.merge_asof(
            lpdf,
            rpdf[[right_ts] + [c for c in right_cols if c != right_ts]],
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
            allow_exact_matches=True,
            suffixes=("", "_r"),
        )
        for c in right_cols:  # resolve suffix collisions back to plain names
            if c not in merged.columns and f"{c}_r" in merged.columns:
                merged[c] = merged[f"{c}_r"]
        return merged[l_cols + right_cols]

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(lambda lp, rp: merge(lp, rp), schema=out_schema)
    )
