"""Streaming tailer, Structured Streaming, time travel, backfill, multimodal."""

import pyarrow.parquet as pq
import pytest

from bigquery_etl_fork_spark import datagen
from bigquery_etl_fork_spark.engine import CDCEngine
from bigquery_etl_fork_spark.engine import checks as C
from bigquery_etl_fork_spark.engine.backfill import run_backfill
from bigquery_etl_fork_spark.lake import LakeTable
from bigquery_etl_fork_spark.streaming.micro_batch import (
    discover_epochs,
    stream_changelog,
    tail_changelog,
)

from .oracle import assert_states_equal, replay_oracle


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_data")
    base = datagen.base_table(n_docs=200, seed=21)
    log = datagen.change_log(n_docs=200, n_events=1200, n_epochs=4, seed=22)
    pq.write_table(base, str(d / "base.parquet"))
    pq.write_to_dataset(log, str(d / "change_log"), partition_cols=["epoch"])
    return {"dir": d, "base": base, "log": log}


def _fresh(spark, tmp_path, data):
    base_df = spark.read.parquet(str(data["dir"] / "base.parquet"))
    t = LakeTable.create(spark, str(tmp_path / "t"), base_df.schema, num_buckets=4)
    t.overwrite_all(base_df, key_col="doc_id")
    return t


def test_tail_changelog_applies_all(spark, tmp_path, data):
    t = _fresh(spark, tmp_path, data)
    eng = CDCEngine(spark, t, count_input=False)
    assert discover_epochs(str(data["dir"] / "change_log")) == [1, 2, 3, 4]
    stats = tail_changelog(eng, str(data["dir"] / "change_log"), max_polls=1, poll_interval_s=0)
    assert [e.epoch for e in stats.epochs] == [1, 2, 3, 4]
    assert_states_equal(t.read().toPandas(), replay_oracle(data["base"], data["log"]))
    # tailing again finds nothing new
    stats2 = tail_changelog(eng, str(data["dir"] / "change_log"), max_polls=1, poll_interval_s=0)
    assert stats2.epochs == []


def test_structured_streaming_available_now(spark, tmp_path, data):
    t = _fresh(spark, tmp_path, data)
    eng = CDCEngine(spark, t, count_input=False)
    q = stream_changelog(
        eng, str(data["dir"] / "change_log"), checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    assert t.snapshot.properties["epoch_watermark"] == 4
    assert_states_equal(t.read().toPandas(), replay_oracle(data["base"], data["log"]))


def test_streaming_with_live_rollup_refresh(spark, tmp_path, data):
    """post_apply hook: an IncrementalRollup refreshed after every applied
    epoch tracks the live table exactly — the CDC-native materialized-view
    story end-to-end through the streaming tailer."""
    from pyspark.sql import functions as F

    from bigquery_etl_fork_spark.engine import IncrementalRollup

    t = _fresh(spark, tmp_path, data)
    eng = CDCEngine(spark, t, count_input=False)
    mv = IncrementalRollup(
        spark, t, str(tmp_path / "mv"), group_cols=["source"],
        measures={"n": ("count", None), "tok": ("sum", "n_tok")},
        key_col="doc_id",
    )
    mv.refresh()
    refreshed = []

    def hook(st):
        refreshed.append((st.epoch, mv.refresh()["mode"]))

    stats = tail_changelog(
        eng, str(data["dir"] / "change_log"), max_polls=1, poll_interval_s=0,
        post_apply=hook,
    )
    assert [e for e, _ in refreshed] == [e.epoch for e in stats.epochs] == [1, 2, 3, 4]
    assert all(m == "incremental" for _, m in refreshed)
    want = {
        r["source"]: (r["n"], r["tok"])
        for r in t.read()
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_tok").alias("tok"))
        .collect()
    }
    got = {r["source"]: (r["n"], r["tok"]) for r in mv.read().collect()}
    assert got == want


def test_time_travel_read(spark, tmp_path, data):
    t = _fresh(spark, tmp_path, data)
    eng = CDCEngine(spark, t, count_input=False)
    log_df = spark.read.parquet(str(data["dir"] / "change_log"))
    eng.replay(log_df)
    # find the snapshot version right after epoch 2 committed
    v2 = max(
        s.version for s in t.history() if s.properties.get("epoch_watermark", -1) == 2
    )
    got = t.read(at_version=v2, key_col="doc_id").toPandas()
    assert_states_equal(got, replay_oracle(data["base"], data["log"], upto_epoch=2))


def test_backfill_staging_promote(spark, tmp_path, data):
    import pyarrow as pa
    import pyarrow.compute as pc

    t = _fresh(spark, tmp_path, data)
    eng = CDCEngine(spark, t, count_input=False)
    log_df = spark.read.parquet(str(data["dir"] / "change_log"))
    eng.replay(log_df)

    # corrected log: epochs 3-4 replaced (different seed payloads)
    corrected = datagen.change_log(n_docs=200, n_events=1200, n_epochs=4, seed=99)
    corrected = corrected.filter(pc.field("epoch") >= 3)
    cd = tmp_path / "corrected"
    pq.write_to_dataset(corrected, str(cd), partition_cols=["epoch"])
    corrected_df = spark.read.parquet(str(cd))

    res = run_backfill(
        spark,
        t,
        corrected_df,
        from_epoch=3,
        staging_root=str(tmp_path / "staging"),
        checks=[C.is_unique(["doc_id"]), C.min_row_count(1)],
        count_input=False,
    )
    assert res.staged_watermark == 4

    # expected: original epochs 1-2 + corrected 3-4
    orig_12 = data["log"].filter(pc.field("epoch") <= 2)
    full = pa.concat_tables([orig_12, corrected], promote_options="default")
    assert_states_equal(t.read(key_col="doc_id").toPandas(), replay_oracle(data["base"], full))


def test_multimodal_decode_and_resize(spark, tmp_path):
    from bigquery_etl_fork_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        resize_media,
        synth_media_table,
    )

    pq.write_table(synth_media_table(48, seed=3), str(tmp_path / "media.parquet"))
    df = spark.read.schema(MEDIA_SCHEMA).parquet(str(tmp_path / "media.parquet"))
    dec = decode_media(df).toPandas()
    assert len(dec) == 48 and dec["ok"].all()
    meta = df.select("media_id", "meta.width", "meta.height").toPandas().set_index("media_id")
    for _, r in dec.iterrows():
        assert r["width"] == meta.loc[r["media_id"], "width"]
        assert r["height"] == meta.loc[r["media_id"], "height"]
    resized = resize_media(df, 8, 8)
    rdec = decode_media(resized).toPandas()
    assert (rdec["width"] == 8).all() and (rdec["height"] == 8).all() and rdec["ok"].all()
    # unknown blob => graceful not-implemented marker, not a crash
    bad = spark.createDataFrame(
        [(99, "image", b"JPEGnotreally", None)], MEDIA_SCHEMA
    )
    out = decode_media(bad).collect()[0]
    assert out.ok is False


def test_stateful_running_key_state(spark, tmp_path, data):
    """applyInPandasWithState: streaming per-key state equals batch truth."""
    import pyspark.sql.functions as F

    from bigquery_etl_fork_spark.streaming.stateful import running_key_state

    log_dir = str(data["dir"] / "change_log")
    schema = spark.read.parquet(log_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("basePath", log_dir)
        .parquet(log_dir + "/epoch=*")
        .select("doc_id", "lsn", "op")
    )
    q = (
        running_key_state(stream)
        .writeStream.format("memory")
        .queryName("key_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.events_seen, r.last_lsn, r.is_deleted)
        for r in spark.sql(
            # latest state row per key (update mode may emit per batch)
            "SELECT doc_id, events_seen, last_lsn, is_deleted FROM ("
            "  SELECT *, row_number() OVER "
            "    (PARTITION BY doc_id ORDER BY last_lsn DESC, events_seen DESC) AS rn"
            "  FROM key_state) WHERE rn = 1"
        ).collect()
    }
    truth = {
        r.doc_id: (r.c, r.mx, r.del_)
        for r in spark.read.parquet(log_dir)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("c"),
            F.max("lsn").alias("mx"),
            F.max_by(F.col("op") == "D", "lsn").alias("del_"),
        )
        .collect()
    }
    assert set(got) == set(truth)
    mismatch = {k: (got[k], truth[k]) for k in truth if got[k] != truth[k]}
    assert not mismatch, list(mismatch.items())[:5]


def test_stream_changelog_post_apply_hook(spark, tmp_path, data):
    """The Structured Streaming variant fires post_apply once per applied
    epoch, in order."""
    t = _fresh(spark, tmp_path, data)
    eng = CDCEngine(spark, t, count_input=False)
    seen = []
    q = stream_changelog(
        eng, str(data["dir"] / "change_log"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        post_apply=lambda st: seen.append(st.epoch),
    )
    q.awaitTermination(120)
    assert seen == [1, 2, 3, 4]
    assert t.snapshot.properties["epoch_watermark"] == 4
