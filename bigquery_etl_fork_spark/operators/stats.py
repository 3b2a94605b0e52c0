"""Statistical operators — the reference's ``udf_js`` resampling surface.

Re-expresses the JS UDFs (``sql/moz-fx-data-shared-prod/udf_js/``:
``jackknife_mean_ci``, ``bootstrap_percentile_ci``, ``gunzip``,
``json_extract_histogram``) Spark-first:

- ``jackknife_mean_ci``       — pure Catalyst (two-level aggregate + window
  leave-one-bucket-out), zero Python. The reference needs JS because
  BigQuery lacks procedural SQL here; Spark's window + HOFs don't.
- ``bootstrap_percentile_ci`` — deterministic seeded resampling per group in
  Arrow-vectorized ``applyInPandas`` (numpy inside, no per-row Python).
- ``gunzip_col``              — Arrow-batched pandas UDF over binary blobs
  (inherently per-blob work, as in the reference's JS implementation).
- ``parse_histogram``         — ``from_json`` into a typed struct/map,
  JVM-side (reference: ``udf_js/json_extract_histogram``).
"""

from __future__ import annotations

import gzip
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

Z_95 = 1.959963984540054


def jackknife_mean_ci(
    df: DataFrame,
    group_cols: list[str],
    bucket_col: str,
    value_col: str,
    z: float = Z_95,
) -> DataFrame:
    """Leave-one-bucket-out jackknife CI for the mean of value_col, per
    group. Buckets play the reference's 20-sample-id role."""
    per = df.groupBy(*group_cols, bucket_col).agg(
        F.sum(value_col).alias("s"), F.count(value_col).alias("c")
    )
    w = W.partitionBy(*group_cols)
    # try_divide: a single-bucket group has no leave-one-out sample — its
    # CI degenerates to null rather than erroring under ANSI mode
    loo = F.try_divide(F.sum("s").over(w) - F.col("s"), F.sum("c").over(w) - F.col("c"))
    per = per.withColumn("loo", loo).withColumn("mean", F.sum("s").over(w) / F.sum("c").over(w))
    out = per.groupBy(*group_cols).agg(
        F.first("mean").alias("mean_"),
        F.count("*").alias("b"),
        F.avg("loo").alias("m_loo"),
        F.sum(F.col("loo") * F.col("loo")).alias("s2"),
    )
    se = F.sqrt(
        F.greatest(
            ((F.col("b") - 1) / F.col("b"))
            * (F.col("s2") - F.col("b") * F.col("m_loo") * F.col("m_loo")),
            F.lit(0.0),
        )
    )
    return out.select(
        *group_cols,
        F.round("mean_", 4).alias("mean"),
        F.round(F.col("mean_") - z * se, 4).alias("ci_low"),
        F.round(F.col("mean_") + z * se, 4).alias("ci_high"),
    )


def bootstrap_percentile_ci(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentile: float = 0.5,
    n_boot: int = 200,
    confidence: float = 0.95,
    seed: int = 13,
) -> DataFrame:
    """Per-group bootstrap CI of a percentile; deterministic (seeded per
    group by a stable hash of the group key). Arrow-vectorized."""
    out_schema = ", ".join(f"{c} string" for c in group_cols) + (
        ", point double, ci_low double, ci_high double"
    )
    lo_q, hi_q = (1 - confidence) / 2, 1 - (1 - confidence) / 2

    def boot(key, pdf):
        vals = pdf[value_col].to_numpy(dtype=float)
        # crc32, not Python hash(): str hashing is PYTHONHASHSEED-randomized
        # per interpreter, which would break cross-session determinism
        key_bytes = "\x1f".join(str(k) for k in key).encode("utf-8")
        gseed = (seed + zlib.crc32(key_bytes)) % (2**32)
        rng = np.random.default_rng(gseed)
        idx = rng.integers(0, len(vals), size=(n_boot, len(vals)))
        stats = np.quantile(vals[idx], percentile, axis=1)
        row = {c: str(k) for c, k in zip(group_cols, key)}
        row.update(
            point=round(float(np.quantile(vals, percentile)), 4),
            ci_low=round(float(np.quantile(stats, lo_q)), 4),
            ci_high=round(float(np.quantile(stats, hi_q)), 4),
        )
        return pd.DataFrame([row])

    return df.groupBy(*group_cols).applyInPandas(boot, schema=out_schema)


def gunzip_col(col: Column | str) -> Column:
    """Decompress gzip/zlib binary blobs to UTF-8 strings (null on garbage).
    Arrow-batched pandas UDF (reference udf_js/gunzip + lib/gunzip.min.js)."""

    @F.pandas_udf("string")
    def _gunzip(s: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            b = bytes(b)
            for opener in (gzip.decompress, zlib.decompress):
                try:
                    return opener(b).decode("utf-8", "replace")
                except Exception:
                    continue
            return None

        return s.map(one)

    return _gunzip(F.col(col) if isinstance(col, str) else col)


HISTOGRAM_JSON_SCHEMA = (
    "bucket_count INT, histogram_type INT, sum BIGINT, `range` ARRAY<BIGINT>, "
    "`values` MAP<STRING, BIGINT>"
)


def parse_histogram(col: Column | str) -> Column:
    """Typed parse of a telemetry-style histogram JSON string — JVM-side
    ``from_json`` (reference udf_js/json_extract_histogram)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, HISTOGRAM_JSON_SCHEMA)


def glam_probe_percentiles(
    df: DataFrame,
    probe_cols: list[str],
    client_col: str,
    bucket_col: str,
    percentiles: tuple[int, ...] = (25, 50, 75, 95),
    scale: int = 1_000_000_000,
) -> DataFrame:
    """The GLAM probe_counts pipeline as one reusable relational operator
    (reference ``bigquery_etl/glam/templates/probe_counts_v1.sql``,
    ``sql/mozfun/glam/histogram_normalized_sum`` + ``glam/percentile``):

    1. per-client histogram   — count rows per (probe, client, bucket);
    2. normalize              — each client's histogram sums to 1 (densities
       scaled to integers by ``scale`` with integer division, so the whole
       pipeline is exact and engine-independent);
    3. aggregate              — sum normalized densities across clients;
    4. percentiles            — first bucket whose cumulative density
       crosses p% of the probe's total.

    Input ``df`` needs one row per observation with ``probe_cols``,
    ``client_col`` and an integer ``bucket_col``. Output: one row per probe
    with ``n_clients`` and a ``p{p}`` bucket column per percentile. Shape:
    two hash aggregates + one window — map-side combined, no Python."""
    client = df.groupBy(*probe_cols, client_col, bucket_col).agg(
        F.count("*").alias("_c")
    )
    wtot = W.partitionBy(*probe_cols, client_col)
    # `div` truncates toward zero while DuckDB's `//` floors; identical here
    # because _c and _tot are count(*) outputs — strictly positive — so the
    # quotient is never negative. Keep integer div for exactness (a
    # floor(double/) would lose bits past 2^53 at this scale factor).
    client = client.withColumn("_tot", F.sum("_c").over(wtot)).withColumn(
        "_density", F.expr(f"(_c * {scale}) div _tot")
    )
    agg = client.groupBy(*probe_cols, bucket_col).agg(
        F.sum("_density").alias("_density")
    )
    wcum = (
        W.partitionBy(*probe_cols)
        .orderBy(bucket_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wall = W.partitionBy(*probe_cols)
    agg = agg.withColumn("_cum", F.sum("_density").over(wcum)).withColumn(
        "_total", F.sum("_density").over(wall)
    )
    pct_aggs = [
        F.min(
            F.when(
                F.col("_cum") * 100 >= F.lit(int(p)) * F.col("_total"),
                F.col(bucket_col),
            )
        ).alias(f"p{p}")
        for p in percentiles
    ]
    pcts = agg.groupBy(*probe_cols).agg(*pct_aggs)
    nclients = client.groupBy(*probe_cols).agg(
        F.countDistinct(client_col).alias("n_clients")
    )
    return pcts.join(nclients, list(probe_cols)).select(
        *probe_cols, "n_clients", *[f"p{p}" for p in percentiles]
    )


def histogram_merge(entries: Column) -> Column:
    """Merge an array of parsed histograms: sum of sums + keyed-value sums
    (reference sql/mozfun/hist/merge). Pure higher-order functions."""
    all_keys = F.array_distinct(
        F.flatten(F.transform(entries, lambda h: F.map_keys(h["values"])))
    )
    merged_vals = F.map_from_arrays(
        all_keys,
        F.transform(
            all_keys,
            lambda k: F.aggregate(
                entries,
                F.lit(0).cast("long"),
                lambda acc, h: acc + F.coalesce(F.element_at(h["values"], k), F.lit(0)),
            ),
        ),
    )
    total = F.aggregate(entries, F.lit(0).cast("long"), lambda acc, h: acc + F.coalesce(h["sum"], F.lit(0)))
    return F.struct(total.alias("sum"), merged_vals.alias("values"))
