"""CDC engine golden scenarios (FIXTURES.md §5) against a pandas oracle."""

import pytest

from bigquery_etl_fork_spark import datagen
from bigquery_etl_fork_spark.engine import CDCEngine, SimulatedCrash
from bigquery_etl_fork_spark.lake import LakeTable

from .oracle import assert_states_equal, replay_oracle

N_DOCS, N_EVENTS, N_EPOCHS = 300, 2000, 4


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("cdc_data")
    base = datagen.base_table(n_docs=N_DOCS, seed=42)
    log = datagen.change_log(n_docs=N_DOCS, n_events=N_EVENTS, n_epochs=N_EPOCHS, seed=43)
    import pyarrow.parquet as pq

    pq.write_table(base, str(d / "base.parquet"))
    pq.write_table(log, str(d / "log.parquet"))
    return {"dir": d, "base": base, "log": log}


def _fresh_table(spark, tmp_path, data, num_buckets=8):
    base_df = spark.read.parquet(str(data["dir"] / "base.parquet"))
    t = LakeTable.create(spark, str(tmp_path / "tbl"), base_df.schema, num_buckets=num_buckets)
    t.overwrite_all(base_df, key_col="doc_id")
    return t


def _state_pdf(table):
    return table.read().toPandas()


def test_single_epoch(spark, tmp_path, data):
    t = _fresh_table(spark, tmp_path, data)
    log_df = spark.read.parquet(str(data["dir"] / "log.parquet"))
    eng = CDCEngine(spark, t)
    eng.replay(log_df.where("epoch = 1"))
    assert_states_equal(_state_pdf(t), replay_oracle(data["base"], data["log"], upto_epoch=1))
    assert t.snapshot.properties["epoch_watermark"] == 1


def test_full_replay_all_modes_equal(spark, tmp_path, data):
    log_df = spark.read.parquet(str(data["dir"] / "log.parquet"))
    expected = replay_oracle(data["base"], data["log"])
    for storage in ("mor", "cow"):
        for mode in ("jvm", "grouped", "partition"):
            t = _fresh_table(spark, tmp_path / f"{storage}_{mode}", data)
            CDCEngine(spark, t, storage_mode=storage, dedup_mode=mode).replay(log_df)
            assert_states_equal(_state_pdf(t), expected)


def test_mor_compaction_preserves_state(spark, tmp_path, data):
    log_df = spark.read.parquet(str(data["dir"] / "log.parquet"))
    expected = replay_oracle(data["base"], data["log"])
    t = _fresh_table(spark, tmp_path, data)
    # force compaction every epoch
    CDCEngine(spark, t, storage_mode="mor", compact_files_per_bucket=1).replay(log_df)
    assert_states_equal(_state_pdf(t), expected)
    # after compaction-heavy replay, explicit full compaction is a no-op-safe op
    t.compact_buckets(list(range(t.num_buckets)), key_col="doc_id")
    assert_states_equal(_state_pdf(t), expected)
    assert all(c == 0 for c in t.delta_file_counts().values())


def test_salted_path_equal(spark, tmp_path, data):
    log_df = spark.read.parquet(str(data["dir"] / "log.parquet"))
    t = _fresh_table(spark, tmp_path, data)
    CDCEngine(spark, t, salt="on", salt_n=4).replay(log_df)
    assert_states_equal(_state_pdf(t), replay_oracle(data["base"], data["log"]))


def test_deletes_and_absent_key_delete_noop(spark, tmp_path, data):
    import pyarrow as pa

    base = datagen.base_table(n_docs=5, seed=1)
    log = pa.table(
        {
            "lsn": pa.array([1, 2, 3], type=pa.int64()),
            "epoch": pa.array([1, 1, 1], type=pa.int32()),
            "op": ["D", "D", "U"],
            "doc_id": ["doc-000000000001", "doc-999999999999", "doc-000000000002"],
            "tokens": pa.array([None, None, [7, 8]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([None, None, 2], type=pa.int32()),
            "source": [None, None, "web"],
            "event_ts": pa.array([None, None, None], type=pa.timestamp("us")),
        }
    )
    import pyarrow.parquet as pq

    d = tmp_path / "mini"
    d.mkdir()
    pq.write_table(base, str(d / "base.parquet"))
    pq.write_table(log, str(d / "log.parquet"))
    base_df = spark.read.parquet(str(d / "base.parquet"))
    t = LakeTable.create(spark, str(tmp_path / "tbl"), base_df.schema, num_buckets=4)
    t.overwrite_all(base_df, key_col="doc_id")
    CDCEngine(spark, t).replay(spark.read.parquet(str(d / "log.parquet")))
    assert_states_equal(_state_pdf(t), replay_oracle(base, log))
    got = {r.doc_id for r in t.read().collect()}
    assert "doc-000000000001" not in got
    assert "doc-000000000002" in got


def test_empty_epoch_manifest_row(spark, tmp_path, data):
    t = _fresh_table(spark, tmp_path, data)
    log_df = spark.read.parquet(str(data["dir"] / "log.parquet"))
    eng = CDCEngine(spark, t)
    eng.apply_epoch(99, log_df.where("epoch = -1"))
    assert t.snapshot.properties["epoch_watermark"] == 99
    rows = [r for r in t.manifest_rows() if r["epoch"] == 99]
    assert rows and rows[0]["partition_id"] == -1
    assert_states_equal(_state_pdf(t), replay_oracle(data["base"], data["log"], upto_epoch=0))


def test_crash_resume_exactly_once(spark, tmp_path, data):
    log_df = spark.read.parquet(str(data["dir"] / "log.parquet"))
    t = _fresh_table(spark, tmp_path, data)
    eng = CDCEngine(spark, t)
    with pytest.raises(SimulatedCrash):
        eng.replay(log_df, fail_after_epoch=2)
    assert t.snapshot.properties["epoch_watermark"] == 2
    # restart from a fresh handle (as a new process would)
    t2 = LakeTable(spark, t.root)
    stats = CDCEngine(spark, t2).replay(log_df)
    skipped = [e.epoch for e in stats.epochs if e.skipped]
    assert skipped == [1, 2]  # no epoch applied twice
    assert_states_equal(_state_pdf(t2), replay_oracle(data["base"], data["log"]))


def test_replay_idempotent_when_rerun_fully(spark, tmp_path, data):
    log_df = spark.read.parquet(str(data["dir"] / "log.parquet"))
    t = _fresh_table(spark, tmp_path, data)
    CDCEngine(spark, t).replay(log_df)
    v = t.snapshot.version
    stats = CDCEngine(spark, LakeTable(spark, t.root)).replay(log_df)
    assert all(e.skipped for e in stats.epochs)
    t.refresh()
    assert t.snapshot.version == v


def test_lineage_rows_written(spark, tmp_path, data):
    t = _fresh_table(spark, tmp_path, data)
    log_df = spark.read.parquet(str(data["dir"] / "log.parquet"))
    CDCEngine(spark, t).replay(log_df)
    rows = t.manifest_rows()
    epochs = {r["epoch"] for r in rows}
    assert epochs == {1, 2, 3, 4}
    for r in rows:
        assert r["lsn_start"] <= r["lsn_end"]
        assert r["rows_upserted"] + r["rows_deleted"] > 0
        assert r["bytes_written"] > 0
        assert r["apply_latency_ms"] >= 0


def test_crash_between_commit_and_compaction_self_heals(spark, tmp_path, data, monkeypatch):
    """A crash after the watermark commit but before compaction leaves extra
    delta files; the next applied epoch re-triggers compaction (self-healing
    maintenance, no data loss, no double-apply)."""
    from bigquery_etl_fork_spark.lake import LakeTable as LT

    t = _fresh_table(spark, tmp_path, data)
    log_df = spark.read.parquet(str(data["dir"] / "log.parquet"))
    eng = CDCEngine(spark, t, compact_files_per_bucket=2)

    calls = {"n": 0}
    orig = LT.compact_buckets

    def exploding_compact(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise SimulatedCrash("crash before compaction")
        return orig(self, *a, **k)

    monkeypatch.setattr(LT, "compact_buckets", exploding_compact)
    with pytest.raises(SimulatedCrash):
        eng.replay(log_df)
    wm_after_crash = t.snapshot.properties["epoch_watermark"]

    # restart (fresh handle): crashed epoch is fenced, compaction re-runs
    t2 = LakeTable(spark, t.root)
    eng2 = CDCEngine(spark, t2, compact_files_per_bucket=2)
    stats = eng2.replay(log_df)
    assert all(e.epoch <= wm_after_crash for e in stats.epochs if e.skipped)
    assert calls["n"] >= 2  # compaction re-attempted after the crash
    assert_states_equal(_state_pdf(t2), replay_oracle(data["base"], data["log"]))


def test_concurrent_tailers_coexist(spark, tmp_path):
    """Two CDC writers on one table (stale-handle race): the loser of the
    same-epoch race reports it skipped instead of crashing; a later-epoch
    commit through the still-stale handle retries onto the fresh snapshot.
    Exactly-once holds throughout (final state equals a single-writer
    replay)."""
    import pyspark.sql.types as T

    from bigquery_etl_fork_spark.lake import LakeTable

    schema = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("n", T.LongType())]
    )
    root = str(tmp_path / "cc_tbl")
    ta = LakeTable.create(spark, root, schema, num_buckets=2,
                          properties={"key_col": "doc_id"})
    ta.overwrite_all(
        spark.createDataFrame([("a", 0)], schema), key_col="doc_id"
    )
    tb = LakeTable(spark, root)  # second writer's independent handle
    ea = CDCEngine(spark, ta, key="doc_id", order="lsn", count_input=False)
    eb = CDCEngine(spark, tb, key="doc_id", order="lsn", count_input=False)

    e1 = spark.createDataFrame(
        [("b", 1, 11, "I")], "doc_id string, n long, lsn long, op string"
    )
    st_a = ea.apply_epoch(1, e1)
    assert not st_a.skipped
    # B still holds the pre-epoch-1 snapshot: same-epoch race -> skipped
    st_b = eb.apply_epoch(1, e1)
    assert st_b.skipped
    # B applies the NEXT epoch through its (still stale before retry) handle
    e2 = spark.createDataFrame(
        [("c", 2, 21, "I")], "doc_id string, n long, lsn long, op string"
    )
    st_b2 = eb.apply_epoch(2, e2)
    assert not st_b2.skipped and st_b2.rows_upserted == 1
    ta.refresh()
    got = {r["doc_id"]: r["n"] for r in ta.read(key_col="doc_id").collect()}
    assert got == {"a": 0, "b": 1, "c": 2}
    assert ta.snapshot.properties["epoch_watermark"] == 2
