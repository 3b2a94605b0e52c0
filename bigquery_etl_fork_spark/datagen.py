"""Deterministic synthetic data: base sequences + binlog-style change log.

Implements the FIXTURES.md shapes (which follow the reference's golden-test
fixture style, ``bigquery_etl/pytest_plugin/sql.py:98-233``): a base table of
pre-tokenized training sequences ``(doc_id, tokens:array<int32>, n_tok,
source)`` and an ordered change log ``(lsn, epoch, op, doc_id, tokens, n_tok,
source, event_ts)`` with

- zipf-ish hot keys (~1% of ids get ~50% of events — the overactive-client
  skew of ``baseline_clients_daily_v1.query.sql:105-129``),
- duplicate (doc_id, lsn) deliveries (at-least-once source),
- within-epoch multi-event keys including delete-then-insert,
- optional schema-evolution epochs (added ``lang`` column, int32→int64
  ``n_tok`` widening) from ``evolve_at_epoch`` onward.

Everything is seeded numpy → pyarrow parquet: no Spark needed, fully
reproducible, fast enough to generate bench-scale logs (millions of events)
in seconds.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50257
SOURCES = np.array(["web", "books", "code", "wiki"])
LANGS = np.array(["en", "de", "fr", "es", "zh"])


def _doc_ids(idx: np.ndarray) -> np.ndarray:
    return np.char.add("doc-", np.char.zfill(idx.astype(str), 12))


_LIST_SAFE_ELEMS = 2**30 - 8
"""Max int32-token count per ListArray before switching to large_list.

NOT the 2^31 element-offset limit: pyarrow's take/filter gather kernels
(verified on 16.1.0) silently return the WRONG ROW's values when the
gathered row's byte offset into the values buffer crosses 2^32 — i.e. at
2^30 int32 elements (4 GiB), half... a quarter of the element-offset
ceiling. slice() and LargeListArray take() stay correct (bisected
empirically: correct at offset 1,071,593,518 elems, corrupt at
1,077,840,000). change_log's verbatim duplicate-delivery take() hit this
at 1e9-soak chunk sizes, producing same-lsn rows with DIFFERENT payloads
— an at-least-once violation in the fixture that surfaced as a
token-sample mismatch against a correct engine."""


def _token_arrays(rng: np.random.Generator, n: int, min_len: int, max_len: int) -> pa.Array:
    """n token arrays as one flat Arrow list array (no Python lists).
    Switches to large_list (64-bit offsets) at _LIST_SAFE_ELEMS — see its
    docstring; Parquet stores both as the same LIST type, so readers are
    unaffected."""
    lens = rng.integers(min_len, max_len + 1, size=n)
    total = int(lens.sum())
    flat = rng.integers(0, VOCAB, size=total, dtype=np.int32)
    if total >= _LIST_SAFE_ELEMS:
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        return pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(flat, type=pa.int32()))
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat, type=pa.int32()))


def base_table(
    n_docs: int = 1000,
    seed: int = 42,
    min_len: int = 4,
    max_len: int = 64,
) -> pa.Table:
    """The initial `base_sequences` snapshot (FIXTURES.md §1)."""
    rng = np.random.default_rng(seed)
    ids = _doc_ids(np.arange(n_docs))
    toks = _token_arrays(rng, n_docs, min_len, max_len)
    n_tok = pa.compute.list_value_length(toks).cast(pa.int32())
    src = SOURCES[rng.integers(0, len(SOURCES), size=n_docs)]
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.string()),
            "tokens": toks,
            "n_tok": n_tok,
            "source": pa.array(src, type=pa.string()),
        }
    )


def change_log(
    n_docs: int = 1000,
    n_events: int = 5000,
    n_epochs: int = 5,
    seed: int = 43,
    hot_frac: float = 0.01,
    hot_mass: float = 0.5,
    dup_frac: float = 0.02,
    delete_frac: float = 0.1,
    insert_frac: float = 0.2,
    min_len: int = 4,
    max_len: int = 64,
    new_doc_start: int | None = None,
    evolve_at_epoch: int | None = None,
) -> pa.Table:
    """Ordered CDC log (FIXTURES.md §2/§3). lsn globally monotone; epoch =
    lsn-range slice; ops I/U/D with payload null for D. When
    ``evolve_at_epoch`` is set the output includes a ``lang`` column (null
    before the epoch) and an int64 ``n_tok`` (the widening case)."""
    rng = np.random.default_rng(seed)
    n_hot = max(1, int(n_docs * hot_frac))
    hot_ids = rng.choice(n_docs, size=n_hot, replace=False)

    n_base = n_events
    is_hot = rng.random(n_base) < hot_mass
    doc_idx = np.where(
        is_hot,
        hot_ids[rng.integers(0, n_hot, size=n_base)],
        rng.integers(0, n_docs, size=n_base),
    )
    # some inserts target brand-new doc ids beyond the base table
    if new_doc_start is None:
        new_doc_start = n_docs
    n_new = int(n_base * insert_frac * 0.5)
    if n_new:
        pos = rng.choice(n_base, size=n_new, replace=False)
        doc_idx[pos] = new_doc_start + rng.integers(0, max(n_new, 1), size=n_new)

    u = rng.random(n_base)
    op = np.where(u < delete_frac, "D", np.where(u < delete_frac + insert_frac, "I", "U"))

    lsn = np.arange(1, n_base + 1, dtype=np.int64)
    epoch = (np.linspace(0, n_epochs, n_base, endpoint=False)).astype(np.int32) + 1

    toks = _token_arrays(rng, n_base, min_len, max_len)
    n_tok = pa.compute.list_value_length(toks).cast(pa.int32())
    src = SOURCES[rng.integers(0, len(SOURCES), size=n_base)]
    ts = (np.datetime64("2026-01-01T00:00:00") + (lsn * 37).astype("timedelta64[s]")).astype(
        "datetime64[us]"
    )

    tbl = pa.table(
        {
            "lsn": pa.array(lsn),
            "epoch": pa.array(epoch),
            "op": pa.array(op, type=pa.string()),
            "doc_id": pa.array(_doc_ids(doc_idx), type=pa.string()),
            "tokens": toks,
            "n_tok": n_tok,
            "source": pa.array(src, type=pa.string()),
            "event_ts": pa.array(ts),
        }
    )

    # null out payload on deletes (vectorized via arrow if_else)
    d_mask = pa.compute.equal(tbl["op"], pa.scalar("D"))
    tbl = tbl.set_column(
        4, "tokens", pa.compute.if_else(d_mask, pa.nulls(n_base, tbl["tokens"].type), tbl["tokens"])
    )
    tbl = tbl.set_column(
        5, "n_tok", pa.compute.if_else(d_mask, pa.nulls(n_base, pa.int32()), tbl["n_tok"])
    )
    tbl = tbl.set_column(
        6, "source", pa.compute.if_else(d_mask, pa.nulls(n_base, pa.string()), tbl["source"])
    )

    if evolve_at_epoch is not None:
        # evolution columns BEFORE duplication so redeliveries stay verbatim
        ep = tbl["epoch"].to_numpy(zero_copy_only=False)
        lang_vals = LANGS[rng.integers(0, len(LANGS), size=len(tbl))]
        lang = pa.array(
            np.where(ep >= evolve_at_epoch, lang_vals, None), type=pa.string()
        )
        tbl = tbl.append_column("lang", lang)
        tbl = tbl.set_column(5, "n_tok", tbl["n_tok"].cast(pa.int64()))

    # duplicate deliveries: re-append a sample of rows verbatim (same lsn)
    n_dup = int(len(tbl) * dup_frac)
    if n_dup:
        dup_rows = tbl.take(pa.array(rng.choice(len(tbl), size=n_dup, replace=False)))
        tbl = pa.concat_tables([tbl, dup_rows])

    return tbl


def write_dataset(
    out_dir: str,
    n_docs: int = 1000,
    n_events: int = 5000,
    n_epochs: int = 5,
    seed: int = 42,
    evolve_at_epoch: int | None = None,
    **log_kwargs,
) -> dict[str, str]:
    """Write base + change log parquet under out_dir; returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    base_path = os.path.join(out_dir, "base_sequences.parquet")
    log_path = os.path.join(out_dir, "change_log")
    pq.write_table(base_table(n_docs=n_docs, seed=seed), base_path)
    log = change_log(
        n_docs=n_docs,
        n_events=n_events,
        n_epochs=n_epochs,
        seed=seed + 1,
        evolve_at_epoch=evolve_at_epoch,
        **log_kwargs,
    )
    # binlog-segment layout: one directory per epoch (hive-style), so the
    # engine's per-epoch filter becomes a partition-pruned scan instead of a
    # full-log rescan — the analog of reading one WAL segment per commit.
    # Small row groups keep the scan splittable across many cores.
    pq.write_to_dataset(log, log_path, partition_cols=["epoch"], row_group_size=16384)
    return {"base": base_path, "log": log_path}
