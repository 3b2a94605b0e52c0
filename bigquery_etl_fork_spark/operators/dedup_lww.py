"""Last-writer-wins dedup on (key, sequence) — the CDC apply kernel.

Semantics mirror the reference's live→stable dedup, which keeps exactly one
row per ``document_id`` via ``ROW_NUMBER() OVER (PARTITION BY document_id)``
(reference ``bigquery_etl/copy_deduplicate.py:57-81``) combined with the
latest-wins tie rule of ``stats/mode_last``
(``sql/mozfun/stats/mode_last/udf.sql:10-24``): for CDC, the winner is the
row with the maximum ``log_sequence_number``; duplicate ``(key, lsn)``
deliveries (at-least-once source) collapse to one row.

Three physical strategies, all semantically identical (tested against each
other):

- ``jvm``       — ``groupBy(key).agg(max_by(struct(payload), lsn))``.
                  Pure Catalyst/Tungsten: map-side partial aggregation, whole
                  stage codegen, no Python. The throughput default.
- ``grouped``   — ``repartition(hash(key)) → groupBy(key).applyInPandas``:
                  the north-rule kernel shape. Arrow-vectorized; each group's
                  winner picked with a vectorized idxmax, token arrays stay
                  Arrow list arrays (never per-row Python).
- ``partition`` — ``repartition(hash(key)) → sortWithinPartitions(key, lsn)
                  → mapInPandas`` streaming dedup: one vectorized
                  ``drop_duplicates(keep='last')`` per Arrow batch with a
                  carry-over of the last key group across batch boundaries.
                  O(batch) pandas work, no per-group call overhead — the
                  fastest Python-side kernel for very many small groups.

Skew: ``lww_dedup_salted`` runs a two-stage reduce — LWW is associative, so
stage 1 reduces ``(key, salt)`` partials and stage 2 reduces partials per
key. This bounds any single reducer's group size at ``rows(hot_key)/salt_n``,
the analog of the reference's 100-way ``sample_id`` split for hot partitions
(``shredder/delete.py:455-526``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _payload_cols(df: DataFrame, key: str, order: str) -> list[str]:
    return [c for c in df.columns if c not in (key, order)]


def _orderable(dt: T.DataType) -> bool:
    """Whether Spark can sort on this type: maps (at any nesting depth)
    cannot appear in a sort key; arrays/structs are orderable if their
    element/field types are."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def lww_dedup(
    df: DataFrame,
    key: str = "doc_id",
    order: str = "lsn",
    mode: str = "jvm",
    num_partitions: int | None = None,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """One row per key: the row with max ``order``; dup (key, order) collapse.

    ``tie_cols`` (pandas modes only): deterministic tie-break for rows that
    share the max ``order`` — the max over these columns wins, mirroring the
    jvm mode's struct comparison where the first payload column (``op`` in
    the engine: 'U' > 'D') decides. The jvm mode already compares the whole
    payload struct and ignores this parameter.
    """
    if mode == "jvm":
        return _lww_jvm(df, key, order)
    if mode == "grouped":
        return _lww_grouped(df, key, order, num_partitions, tie_cols)
    if mode == "partition":
        return _lww_partition(df, key, order, num_partitions, tie_cols)
    raise ValueError(f"unknown mode {mode!r}")


def _lww_jvm(df: DataFrame, key: str, order: str) -> DataFrame:
    payload = _payload_cols(df, key, order)
    # max over struct(order, payload...) gives a total, deterministic order:
    # max lsn wins; equal-lsn duplicates are identical rows so any is fine,
    # and struct comparison breaks hypothetical ties deterministically.
    packed = F.max(F.struct(F.col(order).alias(order), *[F.col(c).alias(c) for c in payload]))
    out = df.groupBy(key).agg(packed.alias("_w"))
    return out.select(key, *[F.col(f"_w.{c}").alias(c) for c in [order] + payload])


def _lww_grouped(
    df: DataFrame,
    key: str,
    order: str,
    num_partitions: int | None,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    cols = df.columns
    oi = cols.index(order)
    ties = list(tie_cols or [])

    def pick_last(pdf: pd.DataFrame) -> pd.DataFrame:
        # vectorized winner selection; equal-lsn rows resolve via tie_cols
        arr = pdf.iloc[:, oi].to_numpy()
        mx = arr.max()
        cand = pdf[arr == mx]
        if len(cand) > 1 and ties:
            cand = cand.sort_values(ties, kind="stable")
        return cand.iloc[[-1]]

    shuffled = df.repartition(num_partitions, key) if num_partitions else df.repartition(key)
    return shuffled.groupBy(key).applyInPandas(pick_last, schema=df.schema)


def _lww_partition(
    df: DataFrame,
    key: str,
    order: str,
    num_partitions: int | None,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    schema = df.schema
    key_name, order_name = key, order
    ties = list(tie_cols or [])

    def dedup_stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Rows arrive clustered by key and ascending order within key
        # (sortWithinPartitions below); a key group may straddle Arrow batch
        # boundaries, so hold back the final key group of each batch.
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_key = pdf[key_name].iloc[-1]
            tail_mask = pdf[key_name].to_numpy() == last_key
            carry = pdf[tail_mask]
            head = pdf[~tail_mask]
            if len(head):
                yield head.drop_duplicates(subset=[key_name], keep="last")
        if carry is not None and len(carry):
            yield carry.sort_values([order_name] + ties, kind="stable").drop_duplicates(
                subset=[key_name], keep="last"
            )

    shuffled = df.repartition(num_partitions, key) if num_partitions else df.repartition(key)
    sorted_df = shuffled.sortWithinPartitions(key, order, *ties)
    return sorted_df.mapInPandas(dedup_stream, schema=schema)


def lww_dedup_bucket_clustered(
    df: DataFrame,
    bucket_expr,
    bucket_col: str,
    key: str = "doc_id",
    order: str = "lsn",
    num_partitions: int | None = None,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Single-shuffle LWW dedup whose output is ALSO clustered by bucket.

    Because bucket = f(key), repartitioning on the bucket column co-locates
    every key's rows; after sortWithinPartitions(bucket, key, order, ties)
    a window PARTITION BY bucket ORDER BY (key, order, ties) is satisfied
    by the existing distribution+sort, so Catalyst inserts NO extra exchange:
    the winner of each key run is the row whose successor has a different
    key. One shuffle total — and the result can be written
    partitionBy(bucket) with no further movement. The MoR write path's fast
    dedup.

    ``tie_cols`` resolves equal-(key, order) rows (corrupt-log / duplicate
    delivery territory) deterministically — the max over these columns wins.
    Defaults to every ORDERABLE payload column in declaration order (the
    engine's ``op`` leads, giving the 'U'-beats-'D' rule), which makes this
    kernel bit-identical to the jvm/salted ``max(struct(order, payload))``
    comparison even on a corrupt log carrying different payloads at the
    same (key, order) — important because the engine's auto-probe may pick
    either kernel. Map-bearing columns are excluded (unorderable:
    plan-time AnalysisException — they break the jvm struct-max the same
    way). The suffix is effectively free: sort comparators short-circuit on
    the (bucket, key, order) prefix, so token arrays are only compared for
    genuinely tied rows (measured ±1% on a 2M-row unique-key epoch).
    """
    from pyspark.sql import Window as W

    out = df.withColumn(bucket_col, bucket_expr(F.col(key)))
    payload = [c for c in out.columns if c not in (key, order, bucket_col)]
    if tie_cols is None:
        types = {f.name: f.dataType for f in out.schema.fields}
        tie_cols = [c for c in payload if _orderable(types[c])]
    shuffled = (
        out.repartition(num_partitions, bucket_col)
        if num_partitions
        else out.repartition(bucket_col)
    )
    sorted_df = shuffled.sortWithinPartitions(bucket_col, key, order, *tie_cols)
    w = W.partitionBy(bucket_col).orderBy(key, order, *tie_cols)
    nxt = F.lead(key).over(w)
    return (
        sorted_df.withColumn("_is_winner", nxt.isNull() | (nxt != F.col(key)))
        .where(F.col("_is_winner"))
        .drop("_is_winner")
    )


def lww_dedup_salted(
    df: DataFrame,
    key: str = "doc_id",
    order: str = "lsn",
    salt_n: int = 16,
    mode: str = "jvm",
) -> DataFrame:
    """Two-stage LWW for skewed keys: reduce (key, salt) partials, then keys.

    Stage 1 shuffles on (key, salt) so a hot key's rows spread over salt_n
    reducers; stage 2 reduces the ≤salt_n partials per key — tiny.
    """
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(order)), F.lit(salt_n)))
    payload = _payload_cols(df, key, order)
    packed = F.max(F.struct(F.col(order).alias(order), *[F.col(c).alias(c) for c in payload]))
    partial = (
        salted.repartition(key, "_salt")
        .groupBy(key, "_salt")
        .agg(packed.alias("_w"))
        .select(key, F.col("_w").alias("_w"))
    )
    final = partial.groupBy(key).agg(F.max("_w").alias("_w"))
    return final.select(key, *[F.col(f"_w.{c}").alias(c) for c in [order] + payload])
