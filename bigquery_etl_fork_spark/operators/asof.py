"""As-of join: for each left row, the latest right row at or before it.

The reference approximates this with join + QUALIFY ROW_NUMBER()=1
(``mozilla_org_derived/ga_sessions_v2/script.sql:63-81``); SURVEY.md §2.3
maps the true ordered variant to ``pd.merge_asof`` inside a cogrouped
``applyInPandas`` — Arrow-batched, one shuffle per side on the key, sorted
merge within each key group. Semantics match DuckDB's ``ASOF JOIN``
(oracle-checked in queries.py): greatest right.ts <= left.ts, exact matches
allowed, unmatched left rows kept with nulls.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Left as-of join on ``key``: attach the right row with the greatest
    ``right_ts`` <= ``left_ts``. Right side must be unique per (key, ts)
    (pre-dedup if needed) for deterministic results."""
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
