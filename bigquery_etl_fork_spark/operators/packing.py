"""Sequence packing: fixed-capacity training sequences from variable-length
token documents.

The north-star table is (doc_id, tokens array<int32>, n_tok, source) —
pre-tokenized training sequences. Trainers consume fixed-length batches, so
the last pipeline stage packs documents into sequences of capacity
``max_len`` with documents never split across sequences. Bin packing is
inherently sequential, so the operator makes the sequential unit explicit
and bounded: documents are hash-bucketed (the parallel axis), and within a
bucket packed greedily in id order (the deterministic sequential axis).
Greedy first-fit-in-order wastes at most one doc's worth of slack per
boundary — the standard trade against a global (non-parallel) optimum.

Scale shape: one shuffle to co-locate each bucket, an ``applyInPandas``
whose Arrow payload is only (bucket, id, length) — token arrays do NOT ride
through Python — then an optional join to re-attach payload columns and a
hash aggregation to materialize per-sequence rows. Buckets are the unit of
parallelism: size ``num_buckets`` >= cluster cores; the per-bucket Python
loop is O(docs_in_bucket) integer work.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["assign_sequences", "pack_sequences"]


def assign_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    max_len: int,
    bucket: Column,
    order_col: str | None = None,
) -> DataFrame:
    """Per-document sequence assignment: (bucket, id_col, seq_idx).

    Greedy first-fit in ``order_col`` (default: id) order within each
    bucket: a document joins the current sequence iff it fits, else opens
    the next one. A document longer than ``max_len`` gets a sequence of its
    own (the caller decides whether to truncate or reject — the operator
    never drops data silently).
    """
    order_col = order_col or id_col
    slim = df.select(
        bucket.alias("bucket"),
        F.col(id_col),
        F.col(order_col).alias("_ord"),
        F.col(len_col).cast("long").alias("_len"),
    )

    out_schema = f"bucket int, {id_col} {dict(df.dtypes)[id_col]}, seq_idx int"

    def pack_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_ord", id_col], ignore_index=True)
        if pdf["_len"].isna().any():
            # a null length would turn the accumulator into NaN and silently
            # pack the whole bucket into one sequence — refuse instead
            bad = pdf.loc[pdf["_len"].isna(), id_col].iloc[0]
            raise ValueError(f"null {len_col} for id {bad!r}; lengths must be non-null")
        lens = pdf["_len"].to_numpy()
        seq = [0] * len(lens)
        acc = -1  # forces a fresh sequence for the first doc
        s = -1
        for i, n in enumerate(lens):
            if acc < 0 or acc + n > max_len:
                s += 1
                acc = int(n)
            else:
                acc += int(n)
            seq[i] = s
        return pd.DataFrame(
            {"bucket": pdf["bucket"], id_col: pdf[id_col], "seq_idx": seq}
        )

    return slim.groupBy("bucket").applyInPandas(pack_one, schema=out_schema)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    max_len: int,
    bucket: Column,
    tokens_col: str | None = None,
    carry_cols: Iterable[str] = (),
) -> DataFrame:
    """Materialize packed sequences.

    Returns one row per sequence:
    (bucket, seq_idx, n_docs, n_tok, fill_pct, doc_ids[, tokens]) — doc_ids
    in packing order; with ``tokens_col``, the concatenated token array in
    the same order (flattened JVM-side with ``flatten``; tokens never pass
    through Python).
    """
    assign = assign_sequences(df, id_col, len_col, max_len, bucket)
    payload_cols = [len_col, *((tokens_col,) if tokens_col else ()), *carry_cols]
    joined = assign.join(df.select(id_col, *payload_cols), id_col)

    member = F.struct(F.col(id_col), *[F.col(c) for c in payload_cols])
    agg = (
        joined.groupBy("bucket", "seq_idx")
        .agg(F.sort_array(F.collect_list(member)).alias("members"))
    )
    cols = [
        F.col("bucket"),
        F.col("seq_idx"),
        F.size("members").alias("n_docs"),
        F.aggregate(
            "members", F.lit(0).cast("long"), lambda a, m: a + m[len_col]
        ).alias("n_tok"),
        F.transform("members", lambda m: m[id_col]).alias("doc_ids"),
    ]
    if tokens_col is not None:
        cols.append(
            F.flatten(F.transform("members", lambda m: m[tokens_col])).alias("tokens")
        )
    return agg.select(*cols).withColumn(
        "fill_pct", F.round(F.col("n_tok") / F.lit(float(max_len)), 4)
    )
