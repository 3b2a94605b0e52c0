"""Round-3 fixes: as-of null-field carry, marker-deferred epochs, relayout
of unpartitioned logs, redelivery-safe key state, auto broadcast gating,
full-Unicode code points, named map helpers, approx_distinct bound."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bigquery_etl_fork_spark import datagen
from bigquery_etl_fork_spark.engine import CDCEngine
from bigquery_etl_fork_spark.lake import LakeTable
from bigquery_etl_fork_spark.operators.asof import asof_join
from bigquery_etl_fork_spark.operators.merge import merge_delta

from .oracle import assert_states_equal, replay_oracle


# ---------------- as-of join: null right fields must not mix rows ----------


def test_asof_jvm_null_right_field_not_substituted(spark):
    """The matched right row's null field must stay null — carrying columns
    independently would substitute the value from an OLDER right row."""
    left = spark.createDataFrame([("k", 10)], "id string, ts long")
    right = spark.createDataFrame(
        [("k", 1, "old", 111), ("k", 5, None, 555)],
        "id string, ts long, rv string, rw long",
    )
    for mode in ("jvm", "pandas"):
        row = asof_join(
            left, right, key="id", left_ts="ts", right_ts="ts",
            right_cols=["rv", "rw"], mode=mode,
        ).collect()[0]
        assert row["rv"] is None, mode
        assert row["rw"] == 555, mode


def test_asof_jvm_equals_pandas_with_nulls(spark):
    import random

    rnd = random.Random(7)
    lrows = [(f"k{i % 5}", rnd.randint(0, 100)) for i in range(60)]
    rrows = [
        (
            f"k{i % 5}",
            rnd.randint(0, 100),
            None if rnd.random() < 0.4 else f"v{i}",
            None if rnd.random() < 0.4 else i,
        )
        for i in range(40)
    ]
    left = spark.createDataFrame(lrows, "id string, ts long").distinct()
    right = (
        spark.createDataFrame(rrows, "id string, ts long, rv string, rw long")
        .groupBy("id", "ts")
        .agg(F.max("rv").alias("rv"), F.max("rw").alias("rw"))
    )
    kw = dict(key="id", left_ts="ts", right_ts="ts", right_cols=["rv", "rw"])
    a = asof_join(left, right, mode="jvm", **kw).toPandas()
    b = asof_join(left, right, mode="pandas", **kw).toPandas()
    key = ["id", "ts"]
    a = a.sort_values(key, kind="stable").reset_index(drop=True)
    b = b.sort_values(key, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# ---------------- streaming: deferred-marker epochs are not lost -----------


def test_ready_epochs_stops_at_first_unmarked(tmp_path):
    from bigquery_etl_fork_spark.streaming.micro_batch import ready_epochs

    for e in (1, 2, 3, 4):
        (tmp_path / f"epoch={e}").mkdir()
    for e in (1, 3, 4):  # epoch 2 still mid-write
        (tmp_path / f"epoch={e}" / "_SUCCESS").touch()
    assert ready_epochs(str(tmp_path)) == [1, 2, 3, 4]
    assert ready_epochs(str(tmp_path), "_SUCCESS") == [1]
    (tmp_path / "epoch=2" / "_SUCCESS").touch()
    assert ready_epochs(str(tmp_path), "_SUCCESS") == [1, 2, 3, 4]


def test_stream_changelog_marker_lands_after_files(spark, tmp_path):
    """An epoch whose data files were all stream-delivered BEFORE its
    completion marker landed must still be applied once the marker exists —
    the file source never re-delivers those files, so the tailer must
    re-list the directory instead of relying on re-signaling."""
    import pyarrow as pa

    from bigquery_etl_fork_spark.streaming.micro_batch import stream_changelog

    base = datagen.base_table(n_docs=80, seed=61)
    log = datagen.change_log(n_docs=80, n_events=400, n_epochs=3, seed=62)
    d = tmp_path / "mk"
    d.mkdir()
    pq.write_table(base, str(d / "base.parquet"))
    pq.write_to_dataset(log, str(d / "log"), partition_cols=["epoch"])
    # epochs 1 and 2 unmarked (producer mid-write), epoch 3 marked
    (d / "log" / "epoch=3" / "_SUCCESS").touch()

    base_df = spark.read.parquet(str(d / "base.parquet"))
    t = LakeTable.create(spark, str(tmp_path / "t"), base_df.schema, num_buckets=4)
    t.overwrite_all(base_df, key_col="doc_id")
    eng = CDCEngine(spark, t, count_input=False)

    # run 1: all of epochs 1-3's files are consumed by the stream, but only
    # a gap-stopped prefix may apply -> nothing (epoch 1 unmarked)
    q = stream_changelog(
        eng, str(d / "log"), checkpoint_dir=str(tmp_path / "ckpt"),
        complete_marker="_SUCCESS",
    )
    q.awaitTermination(120)
    assert eng.table.snapshot.properties.get("epoch_watermark", -1) == -1

    # markers land for 1 and 2; a NEW epoch 4 arrives (fresh files are the
    # only stream trigger — epochs 1-3's files will never be re-delivered)
    (d / "log" / "epoch=1" / "_SUCCESS").touch()
    (d / "log" / "epoch=2" / "_SUCCESS").touch()
    e4 = datagen.change_log(n_docs=80, n_events=120, n_epochs=1, seed=63).to_pandas()
    e4["epoch"] = 4
    e4["lsn"] = e4["lsn"] + 1_000_000
    e4 = e4.astype({"epoch": "int32"})
    log4 = pa.Table.from_pandas(e4, preserve_index=False, schema=log.schema)
    pq.write_to_dataset(log4, str(d / "log"), partition_cols=["epoch"])
    (d / "log" / "epoch=4" / "_SUCCESS").touch()

    q = stream_changelog(
        eng, str(d / "log"), checkpoint_dir=str(tmp_path / "ckpt"),
        complete_marker="_SUCCESS",
    )
    q.awaitTermination(120)
    assert eng.table.snapshot.properties["epoch_watermark"] == 4
    full = pa.concat_tables([log, log4], promote_options="default")
    assert_states_equal(t.read().toPandas(), replay_oracle(base, full))


# ---------------- replay: unpartitioned log is relaid out once -------------


@pytest.fixture()
def unpart_log(spark, tmp_path):
    base = datagen.base_table(n_docs=100, seed=71)
    log = datagen.change_log(n_docs=100, n_events=600, n_epochs=4, seed=72)
    d = tmp_path / "up"
    d.mkdir()
    pq.write_table(base, str(d / "base.parquet"))
    pq.write_table(log, str(d / "log.parquet"))  # single file, epoch = column
    base_df = spark.read.parquet(str(d / "base.parquet"))
    t = LakeTable.create(spark, str(tmp_path / "t"), base_df.schema, num_buckets=4)
    t.overwrite_all(base_df, key_col="doc_id")
    return {"t": t, "base": base, "log": log, "dir": d}


def test_replay_unpartitioned_log_correct_and_cleaned(spark, unpart_log):
    t = unpart_log["t"]
    eng = CDCEngine(spark, t, count_input=False)
    log_df = spark.read.parquet(str(unpart_log["dir"] / "log.parquet"))
    stats = eng.replay(log_df)
    assert [e.epoch for e in stats.epochs] == [1, 2, 3, 4]
    assert_states_equal(
        t.read().toPandas(), replay_oracle(unpart_log["base"], unpart_log["log"])
    )
    # relayout scratch removed after replay
    leftovers = [p for p in os.listdir(t.root) if p.startswith("_epoch_relayout_")]
    assert leftovers == []


def test_plan_batches_scans_one_epoch_per_slice(spark, unpart_log, tmp_path):
    """Each epoch slice must read ONLY that epoch's files on BOTH layouts —
    the unpartitioned input gets one relayout pass instead of E rescans."""
    t = unpart_log["t"]
    eng = CDCEngine(spark, t, count_input=False)

    # unpartitioned input -> relayout: slice scans see only epoch=N files
    log_df = spark.read.parquet(str(unpart_log["dir"] / "log.parquet"))
    batches, cleanup = eng._plan_batches(log_df)
    try:
        for e, df in batches:
            files = df.inputFiles()
            assert files and all(f"/epoch={e}/" in f or f"/epoch={e}" in f for f in files), (
                e, files,
            )
    finally:
        cleanup()

    # hive-partitioned input -> no relayout (cleanup is None), slices prune
    pdir = tmp_path / "plog"
    pq.write_to_dataset(unpart_log["log"], str(pdir), partition_cols=["epoch"])
    part_df = spark.read.parquet(str(pdir))
    batches, cleanup = eng._plan_batches(part_df)
    assert cleanup is None
    for e, df in batches:
        got = df.select("lsn").count()
        exp = (
            unpart_log["log"].to_pandas().query(f"epoch == {e}").shape[0]
        )
        assert got == exp


# ---------------- stateful: at-least-once redelivery doesn't inflate -------


def test_fold_key_batches_redelivery_exactly_once():
    from bigquery_etl_fork_spark.streaming.stateful import fold_key_batches

    b1 = pd.DataFrame({"lsn": [1, 2, 3], "op": ["I", "U", "U"]})
    state = fold_key_batches((0, -1, False), [b1])
    assert state == (3, 3, False)
    # the SAME batch redelivered (at-least-once): no double counting
    state = fold_key_batches(state, [b1])
    assert state == (3, 3, False)
    # overlap redelivery + one new event (a delete)
    b2 = pd.DataFrame({"lsn": [2, 3, 4], "op": ["U", "U", "D"]})
    state = fold_key_batches(state, [b2])
    assert state == (4, 4, True)


# ---------------- merge_delta: size-aware broadcast default ----------------


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_merge_delta_auto_broadcast_gating(spark):
    cur = spark.range(0, 2000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"), F.col("id").alias("x")
    )
    delta = spark.range(0, 500).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        (F.col("id") + 10_000).alias("x"),
        F.lit("U").alias("op"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # auto + no key count: no forced broadcast (planner decides; with
        # the threshold off, none appears)
        out = merge_delta(cur, delta, payload_cols=["doc_id", "x"])
        assert "BroadcastHashJoin" not in _plan(out)
        # auto + key count over the limit: still no forced broadcast
        out = merge_delta(
            cur, delta, payload_cols=["doc_id", "x"], delta_key_count=3_000_000
        )
        assert "BroadcastHashJoin" not in _plan(out)
        # auto + small key count: broadcast forced
        out = merge_delta(
            cur, delta, payload_cols=["doc_id", "x"], delta_key_count=500
        )
        assert "BroadcastHashJoin" in _plan(out)
        # explicit override still wins
        out = merge_delta(
            cur, delta, payload_cols=["doc_id", "x"], broadcast_keys=True,
            delta_key_count=3_000_000,
        )
        assert "BroadcastHashJoin" in _plan(out)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # correctness unchanged
    got = {r["doc_id"]: r["x"] for r in merge_delta(
        cur, delta, payload_cols=["doc_id", "x"]
    ).collect()}
    assert len(got) == 2000 and got["d3"] == 10_003 and got["d1999"] == 1999


# ---------------- bucket-clustered dedup: map payloads + slim sort ---------


def test_bucket_clustered_dedup_tolerates_map_payload(spark):
    from bigquery_etl_fork_spark.lake import bucket_id
    from bigquery_etl_fork_spark.operators.dedup_lww import (
        lww_dedup_bucket_clustered,
    )

    df = spark.createDataFrame(
        [("a", 1, "U", {"k": 1}), ("a", 2, "U", {"k": 2}), ("b", 1, "D", {"k": 3})],
        "doc_id string, lsn long, op string, m map<string,int>",
    )
    out = lww_dedup_bucket_clustered(df, lambda c: bucket_id(c, 4), "_b").drop("_b")
    got = {r["doc_id"]: (r["lsn"], r["m"]) for r in out.collect()}
    assert got == {"a": (2, {"k": 2}), "b": (1, {"k": 3})}


# ---------------- full-Unicode code points ---------------------------------


def test_code_points_full_unicode_roundtrip(spark):
    from bigquery_etl_fork_spark.functions import (
        event_code_points_to_string,
        string_to_code_points,
    )

    s = "a€傳😀z"  # ascii, BMP >255, CJK, astral (surrogate pair), ascii
    cps = [ord(c) for c in s]
    df = spark.createDataFrame([(cps,)], "cps array<int>")
    got = df.select(event_code_points_to_string(F.col("cps")).alias("s")).collect()[0]["s"]
    assert got == s
    back = (
        spark.createDataFrame([(s,)], "s string")
        .select(string_to_code_points(F.col("s")).alias("cps"))
        .collect()[0]["cps"]
    )
    assert back == cps


# ---------------- named map helpers ----------------------------------------


def test_map_mode_last_and_keyed_scalar_sum(spark):
    from bigquery_etl_fork_spark.functions import (
        extract_keyed_scalar_sum,
        map_mode_last,
    )

    entries = [
        ("r1", [("a", 1), ("b", 2), ("a", 3), ("a", 1), ("b", 9), ("b", 2)]),
    ]
    df = spark.createDataFrame(
        entries, "id string, m array<struct<key:string,value:int>>"
    )
    mode = df.select(map_mode_last(F.col("m")).alias("o")).collect()[0]["o"]
    got = {e["key"]: e["value"] for e in mode}
    # a: 1 appears twice (ties none); b: 2 appears twice -> mode; ties->latest
    assert got == {"a": 1, "b": 2}
    sums = df.select(extract_keyed_scalar_sum(F.col("m")).alias("o")).collect()[0]["o"]
    got = {e["key"]: e["value"] for e in sums}
    assert got == {"a": 5, "b": 13}


# ---------------- self-review fixes -----------------------------------------


def test_fold_key_batches_out_of_order_chunks():
    """Chunks of ONE batch arrive in arbitrary intra-key order; a low-LSN
    row in a later chunk is still new and must count."""
    from bigquery_etl_fork_spark.streaming.stateful import fold_key_batches

    c1 = pd.DataFrame({"lsn": [10], "op": ["U"]})
    c2 = pd.DataFrame({"lsn": [5], "op": ["U"]})
    state = fold_key_batches((0, -1, False), [c1, c2])
    assert state == (2, 10, False)


def test_ready_epochs_stops_at_directory_hole(tmp_path):
    """A missing epoch DIRECTORY (parallel producer hasn't created it yet)
    is the same hazard as a missing marker: later epochs must not apply."""
    from bigquery_etl_fork_spark.streaming.micro_batch import ready_epochs

    for e in (1, 2, 4):  # epoch 3's directory does not exist yet
        (tmp_path / f"epoch={e}").mkdir()
        (tmp_path / f"epoch={e}" / "_SUCCESS").touch()
    assert ready_epochs(str(tmp_path), "_SUCCESS") == [1, 2]
    (tmp_path / "epoch=3").mkdir()
    (tmp_path / "epoch=3" / "_SUCCESS").touch()
    assert ready_epochs(str(tmp_path), "_SUCCESS") == [1, 2, 3, 4]


def test_publish_view_strict_directions(spark):
    """strict: extra underlying columns are fine (the view hides them);
    a contract column MISSING from the relation is the violation."""
    from pyspark.sql import types as T

    from bigquery_etl_fork_spark.views import publish_view

    df = spark.createDataFrame([("a", 1, 99)], "doc_id string, n_tok int, _internal int")
    contract = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("n_tok", T.LongType())]
    )
    out = publish_view(spark, "v_strict_ok", df, schema=contract, strict=True)
    assert out.columns == ["doc_id", "n_tok"]
    missing = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("lang", T.StringType())]
    )
    with pytest.raises(ValueError, match="missing from the underlying"):
        publish_view(spark, "v_strict_missing", df, schema=missing, strict=True)


def test_metadata_omitted_num_buckets_autosizes(spark, tmp_path):
    from bigquery_etl_fork_spark.metadata import create_table, parse_table_config

    cfg = parse_table_config(
        {"table": {"name": "auto_t"}, "schema": [{"name": "doc_id", "type": "string"}]}
    )
    assert cfg.num_buckets is None
    t = create_table(spark, str(tmp_path), cfg)
    # LakeTable auto-size: >= 4x parallelism, min 64 — never the old fixed 32
    assert t.snapshot.num_buckets >= 64


def test_relayout_resume_skips_committed_epochs(spark, unpart_log):
    """Crash-resume over an unpartitioned log must relay out ONLY the
    still-pending epochs (not rewrite the whole log), while still reporting
    the fenced epochs as skipped."""
    from bigquery_etl_fork_spark.engine.cdc import SimulatedCrash

    t = unpart_log["t"]
    eng = CDCEngine(spark, t, count_input=False)
    log_df = spark.read.parquet(str(unpart_log["dir"] / "log.parquet"))
    with pytest.raises(SimulatedCrash):
        eng.replay(log_df, fail_after_epoch=2)
    assert t.snapshot.properties["epoch_watermark"] == 2

    batches, cleanup = eng._plan_batches(log_df)
    try:
        slices = dict(batches)
    finally:
        if cleanup:
            cleanup()
    # fenced epochs are reported with a never-read None slice
    assert slices[1] is None and slices[2] is None
    assert slices[3] is not None and slices[4] is not None
    assert all(f"/epoch={e}" in f for e in (3, 4) for f in slices[e].inputFiles())

    stats = eng.replay(log_df)
    assert [e.epoch for e in stats.epochs if e.skipped] == [1, 2]
    assert [e.epoch for e in stats.epochs if not e.skipped] == [3, 4]
    assert_states_equal(
        t.read().toPandas(), replay_oracle(unpart_log["base"], unpart_log["log"])
    )


def test_replay_rejects_null_epochs(spark, tmp_path):
    base = datagen.base_table(n_docs=10, seed=91)
    base_df = spark.createDataFrame(base.to_pandas())
    t = LakeTable.create(spark, str(tmp_path / "t"), base_df.schema, num_buckets=2)
    t.overwrite_all(base_df, key_col="doc_id")
    log = spark.createDataFrame(
        [(1, None, "U", "d1"), (2, 1, "U", "d2")],
        "lsn long, epoch int, op string, doc_id string",
    )
    with pytest.raises(ValueError, match="NULL 'epoch'"):
        CDCEngine(spark, t, count_input=False).replay(log)


def test_bucket_clustered_tie_break_matches_jvm_on_conflicting_payloads(spark):
    """Corrupt log: same (key, lsn, op) with DIFFERENT array payloads. All
    kernels must pick the same winner (max over the payload struct), so the
    engine's auto-probe can never make the final state depend on which
    physical strategy it happened to choose."""
    from bigquery_etl_fork_spark.lake import bucket_id
    from bigquery_etl_fork_spark.operators.dedup_lww import (
        lww_dedup,
        lww_dedup_bucket_clustered,
        lww_dedup_salted,
    )

    df = spark.createDataFrame(
        [
            ("a", 1, "U", [1, 9]),
            ("a", 1, "U", [2, 0]),
            ("b", 2, "U", [5]),
        ],
        "doc_id string, lsn long, op string, tokens array<int>",
    )

    def got(out):
        return {r["doc_id"]: r["tokens"] for r in out.collect()}

    expected = {"a": [2, 0], "b": [5]}  # max struct: [2,0] > [1,9]
    assert got(lww_dedup(df, mode="jvm")) == expected
    assert got(lww_dedup_salted(df)) == expected
    bc = lww_dedup_bucket_clustered(df, lambda c: bucket_id(c, 4), "_b").drop("_b")
    assert got(bc) == expected


# ---------------- deterministic sign-LSH -----------------------------------


def test_deterministic_sign_planes_stable():
    from bigquery_etl_fork_spark.operators.similarity import (
        deterministic_sign_planes,
    )

    p1 = deterministic_sign_planes(8, 4)
    p2 = deterministic_sign_planes(8, 4)
    assert p1 == p2  # no RNG state — reproducible anywhere
    assert all(x in (1.0, -1.0) for row in p1 for x in row)
    assert any(x == -1.0 for row in p1 for x in row)
    assert any(x == 1.0 for row in p1 for x in row)


def test_sign_lsh_pairs_contains_true_duplicate(spark):
    from bigquery_etl_fork_spark.operators.similarity import sign_lsh_topk_pairs

    rows = [(i, [float((i * 7 + j) % 13) - 6.0 for j in range(16)]) for i in range(40)]
    rows.append((99, rows[0][1]))  # exact duplicate of vec 0
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    top = sign_lsh_topk_pairs(df, "vec_id", "embedding", num_planes=16, bands=4, k=5)
    got = [(r["id_a"], r["id_b"], r["cos_sim"]) for r in top.collect()]
    # an identical vector shares every band -> must surface at cos 1.0
    # (the modular construction repeats with period 13, so (0,13) etc. are
    # ALSO exact duplicates and legitimately rank alongside it)
    assert (0, 99, 1.0) in got, got
    assert all(s == 1.0 for _, _, s in got), got


# ---------------- GLAM bucket: floor division on negatives -----------------


def test_glam_bucket_floor_division_matches_duckdb_on_negatives(spark):
    """Bucket ids must agree across engines and use uniform-width buckets.
    Spark `div` and DuckDB integer `//` BOTH truncate toward zero (measured:
    -101 // 50 = -2 in DuckDB), so the bare integer-division forms agree but
    give the zero bucket double width on negatives; both sides now use an
    explicit floor(double-division), which this test pins on negatives."""
    import duckdb

    vals = [-101.0, -100.0, -99.5, -50.0, -1.5, -0.5, 0.0, 0.5, 49.9, 50.0, 101.0]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = [
        r[0]
        for r in df.select(
            F.expr("CAST(floor(floor(value) / 50) AS BIGINT)")
        ).collect()
    ]
    exp = [
        r[0]
        for r in duckdb.sql(
            "SELECT CAST(floor(floor(v) / 50) AS BIGINT) FROM (SELECT unnest(["
            + ",".join(str(v) for v in vals)
            + "]) AS v)"
        ).fetchall()
    ]
    assert got == exp, (got, exp)
    # the truncating forms (Spark `div` / DuckDB integer `//`) also agree
    # with each other — but differ from floor on negatives (the zero bucket
    # would span (-50, 50) instead of uniform width-50 buckets), so both
    # sides use the explicit floor form
    trunc_spark = [
        r[0]
        for r in df.select(F.expr("CAST(floor(value) AS BIGINT) div 50")).collect()
    ]
    trunc_duck = [
        r[0]
        for r in duckdb.sql(
            "SELECT CAST(floor(v) AS BIGINT) // 50 FROM (SELECT unnest(["
            + ",".join(str(v) for v in vals)
            + "]) AS v)"
        ).fetchall()
    ]
    assert trunc_spark == trunc_duck
    assert trunc_spark != got


# ---------------- approx_distinct raw bound --------------------------------


def test_approx_count_distinct_raw_bound(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", 0.01).alias("approx"),
    ).collect()
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= 0.05 * r["exact"], r
