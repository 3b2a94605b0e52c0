"""Property-based LWW replay correctness: random op sequences vs oracle.

Bounded example count (Spark jobs are slow); each example builds a small
random change log — multi-event keys, duplicate (key, lsn) deliveries,
delete/insert interleavings, arbitrary epoch boundaries — and asserts the
engine's final state equals the pandas oracle under token-array equality.
"""

import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigquery_etl_fork_spark.engine import CDCEngine
from bigquery_etl_fork_spark.lake import LakeTable

from .oracle import assert_states_equal, replay_oracle

N_KEYS = 8

ops = st.sampled_from(["I", "U", "D"])
event = st.tuples(st.integers(0, N_KEYS - 1), ops, st.lists(st.integers(0, 100), max_size=4))
logs = st.lists(event, min_size=1, max_size=30)
dup_positions = st.lists(st.integers(0, 29), max_size=3)


def _build_tables(events, dups, n_epochs):
    rows = []
    for lsn, (k, op, toks) in enumerate(events, start=1):
        epoch = 1 + (lsn - 1) * n_epochs // len(events)
        rows.append(
            {
                "lsn": lsn,
                "epoch": epoch,
                "op": op,
                "doc_id": f"k{k}",
                "tokens": None if op == "D" else toks,
                "n_tok": None if op == "D" else len(toks),
                "source": None if op == "D" else "p",
                "event_ts": None,
            }
        )
    for p in dups:  # verbatim duplicate deliveries
        if p < len(rows):
            rows.append(dict(rows[p]))
    base_rows = [
        {"doc_id": f"k{k}", "tokens": [k, k], "n_tok": 2, "source": "base"}
        for k in range(0, N_KEYS, 2)
    ]
    schema_log = pa.schema(
        [
            ("lsn", pa.int64()),
            ("epoch", pa.int32()),
            ("op", pa.string()),
            ("doc_id", pa.string()),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()),
            ("source", pa.string()),
            ("event_ts", pa.timestamp("us")),
        ]
    )
    schema_base = pa.schema(
        [
            ("doc_id", pa.string()),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()),
            ("source", pa.string()),
        ]
    )
    return (
        pa.Table.from_pylist(base_rows, schema=schema_base),
        pa.Table.from_pylist(rows, schema=schema_log),
    )


@pytest.mark.parametrize("storage", ["mor", "cow"])
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=logs, dups=dup_positions, n_epochs=st.integers(1, 4))
def test_lww_replay_property(spark, tmp_path_factory, storage, events, dups, n_epochs):
    base, log = _build_tables(events, dups, n_epochs)
    tmp = tmp_path_factory.mktemp("prop")
    base_df = spark.createDataFrame(base.to_pandas())
    log_df = spark.createDataFrame(log.to_pandas())
    t = LakeTable.create(spark, str(tmp / "t"), base_df.schema, num_buckets=4)
    t.overwrite_all(base_df, key_col="doc_id")
    CDCEngine(spark, t, storage_mode=storage, count_input=False).replay(log_df)
    got = t.read().toPandas()
    expected = replay_oracle(base, log)
    assert_states_equal(got, expected)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    events=logs,
    dups=dup_positions,
    n_epochs=st.integers(2, 4),
    compact_every=st.integers(1, 4),
)
def test_change_feed_property(spark, tmp_path_factory, events, dups, n_epochs, compact_every):
    """The CDC-out feed over the full replay range must carry exactly the
    per-key LWW winners of the log — REGARDLESS of how aggressively
    compaction removed delta files inside the range."""
    base, log = _build_tables(events, dups, n_epochs)
    tmp = tmp_path_factory.mktemp("propcf")
    base_df = spark.createDataFrame(base.to_pandas())
    log_df = spark.createDataFrame(log.to_pandas())
    t = LakeTable.create(spark, str(tmp / "t"), base_df.schema, num_buckets=2)
    t.overwrite_all(base_df, key_col="doc_id")
    v0 = t.snapshot.version
    CDCEngine(
        spark, t, count_input=False, compact_files_per_bucket=compact_every
    ).replay(log_df)

    feed = t.changes(v0, t.snapshot.version).toPandas()
    lp = log.to_pandas().sort_values(["lsn", "op"], kind="stable")
    # same tie rule as the engine: max (lsn, op) per key ('U' > 'D')
    last = lp.drop_duplicates("doc_id", keep="last").set_index("doc_id")
    assert set(feed["doc_id"]) == set(last.index)
    for _, r in feed.iterrows():
        truth = last.loc[r["doc_id"]]
        assert r["lsn"] == truth["lsn"]
        assert (r["op"] == "D") == (truth["op"] == "D")
