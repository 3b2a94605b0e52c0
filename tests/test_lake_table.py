import os

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from bigquery_etl_fork_spark.lake import BUCKET_COL, LakeTable, bucket_id

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("n", T.IntegerType()),
    ]
)


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, num_buckets=4)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_create_and_empty_read(spark, table):
    assert table.read().count() == 0
    assert table.snapshot.version == 0


def test_overwrite_all_and_read(spark, table):
    df = _df(spark, [("a", 1), ("b", 2), ("c", 3)])
    table.overwrite_all(df, key_col="doc_id")
    got = {(r.doc_id, r.n) for r in table.read().collect()}
    assert got == {("a", 1), ("b", 2), ("c", 3)}
    assert table.snapshot.version == 1


def test_bucket_pruned_read(spark, table):
    df = _df(spark, [(f"d{i}", i) for i in range(40)])
    table.overwrite_all(df, key_col="doc_id")
    buckets = (
        df.withColumn(BUCKET_COL, bucket_id(F.col("doc_id"), 4))
        .groupBy(BUCKET_COL)
        .count()
        .collect()
    )
    one = int(buckets[0][BUCKET_COL])
    expect = int(buckets[0]["count"])
    assert table.read([one]).count() == expect
    # pruned read touches fewer files than a full read
    snap = table.snapshot
    n_files_one = len(snap.buckets[str(one)])
    n_files_all = sum(len(v) for v in snap.buckets.values())
    assert n_files_one < n_files_all


def test_overwrite_buckets_replaces_only_those(spark, table):
    df = _df(spark, [(f"d{i}", i) for i in range(40)])
    table.overwrite_all(df, key_col="doc_id")
    with_b = df.withColumn(BUCKET_COL, bucket_id(F.col("doc_id"), 4))
    b0_rows = with_b.where(F.col(BUCKET_COL) == 0).drop(BUCKET_COL)
    replacement = b0_rows.withColumn("n", F.col("n") + 1000)
    table.overwrite_buckets([0], replacement, key_col="doc_id")
    got = {r.doc_id: r.n for r in table.read().collect()}
    for r in b0_rows.collect():
        assert got[r.doc_id] == r.n + 1000
    for r in with_b.where(F.col(BUCKET_COL) != 0).collect():
        assert got[r.doc_id] == r.n


def test_stray_bucket_rows_rejected(spark, table):
    df = _df(spark, [(f"d{i}", i) for i in range(40)])
    with pytest.raises(ValueError, match="outside declared buckets"):
        table.overwrite_buckets([0], df, key_col="doc_id")


def test_schema_evolution_metadata_commit_and_mixed_read(spark, table):
    table.overwrite_all(_df(spark, [("a", 1)]), key_col="doc_id")
    new_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("n", T.LongType()),  # widened
            T.StructField("lang", T.StringType()),  # added
        ]
    )
    table.evolve_schema(new_schema)
    assert table.schema["n"].dataType == T.LongType()
    # old files read back coerced; new column null-filled
    rows = table.read().collect()
    assert rows[0].lang is None and rows[0].n == 1
    # write post-evolution data into the same bucket space
    df2 = spark.createDataFrame([("zz", 5, "en")], new_schema)
    b = df2.withColumn(BUCKET_COL, bucket_id(F.col("doc_id"), 4)).collect()[0][BUCKET_COL]
    table.overwrite_buckets([int(b)], df2, key_col="doc_id", schema=new_schema)
    got = {r.doc_id: (r.n, r.lang) for r in table.read().collect()}
    assert got["zz"] == (5, "en")
    assert table.read().schema["n"].dataType == T.LongType()


def test_atomic_commit_no_partial_state(spark, table, tmp_path):
    table.overwrite_all(_df(spark, [("a", 1)]), key_col="doc_id")
    v = table.snapshot.version
    # orphan data (simulating a crash before snapshot rename) is invisible
    orphan_dir = os.path.join(table.root, "data", "deadbeef")
    os.makedirs(orphan_dir, exist_ok=True)
    _df(spark, [("ghost", 9)]).write.mode("overwrite").parquet(os.path.join(orphan_dir, "x"))
    table.refresh()
    assert table.snapshot.version == v
    assert {r.doc_id for r in table.read().collect()} == {"a"}


def test_vacuum_preserves_time_travel_until_expired(spark, table):
    table.overwrite_all(_df(spark, [("a", 1), ("b", 2)]), key_col="doc_id")
    table.overwrite_all(_df(spark, [("a", 7)]), key_col="doc_id")  # v2 replaces all
    # with history intact, vacuum must not touch files old snapshots need
    assert table.vacuum() == 0
    old = table.read(at_version=1).collect()
    assert {(r.doc_id, r.n) for r in old} == {("a", 1), ("b", 2)}
    # expire history -> old files become vacuum-able
    assert table.expire_snapshots(keep_last=1) == 2
    removed = table.vacuum()
    assert removed > 0
    assert {(r.doc_id, r.n) for r in table.read().collect()} == {("a", 7)}


def test_history_and_lineage(spark, table):
    table.overwrite_all(
        _df(spark, [("a", 1)]),
        key_col="doc_id",
        lineage=[{"epoch": 1, "partition_id": 0}],
    )
    hist = table.history()
    assert [s.version for s in hist] == [0, 1]
    rows = table.manifest_rows()
    assert rows and rows[0]["epoch"] == 1


def test_commit_conflict_on_concurrent_writers(spark, table):
    from bigquery_etl_fork_spark.lake import CommitConflict, LakeTable

    table.overwrite_all(_df(spark, [("a", 1)]), key_col="doc_id")
    # a second handle (simulating another driver) commits version 2 first
    other = LakeTable(spark, table.root)
    other.overwrite_all(_df(spark, [("b", 2)]), key_col="doc_id")
    # the stale handle's commit must lose cleanly, not clobber
    with pytest.raises(CommitConflict):
        table.overwrite_all(_df(spark, [("c", 3)]), key_col="doc_id")
    table.refresh()
    assert {r.doc_id for r in table.read().collect()} == {"b"}
    # retry after refresh succeeds with the next version
    table.overwrite_all(_df(spark, [("c", 3)]), key_col="doc_id")
    assert {r.doc_id for r in table.read().collect()} == {"c"}


def test_change_feed_between_versions(spark, tmp_path, table):
    """CDC-out: engine-applied epochs are re-derivable as a change feed."""
    import pyarrow.parquet as pq

    from bigquery_etl_fork_spark import datagen
    from bigquery_etl_fork_spark.engine import CDCEngine

    d = tmp_path / "cf"
    d.mkdir()
    base = datagen.base_table(n_docs=100, seed=8)
    log = datagen.change_log(n_docs=100, n_events=400, n_epochs=2, seed=9, dup_frac=0)
    pq.write_table(base, str(d / "base.parquet"))
    pq.write_to_dataset(log, str(d / "log"), partition_cols=["epoch"])
    base_df = spark.read.parquet(str(d / "base.parquet"))
    t = LakeTable.create(spark, str(tmp_path / "cft"), base_df.schema, num_buckets=4)
    t.overwrite_all(base_df, key_col="doc_id")
    v0 = t.snapshot.version
    eng = CDCEngine(spark, t, count_input=False)
    eng.replay(spark.read.parquet(str(d / "log")))
    v2 = t.snapshot.version

    feed = t.changes(v0, v2).toPandas()
    lp = log.to_pandas().sort_values("lsn")
    last = lp.drop_duplicates("doc_id", keep="last").set_index("doc_id")
    assert set(feed["doc_id"]) == set(last.index)
    for _, r in feed.iterrows():
        truth = last.loc[r["doc_id"]]
        assert r["lsn"] == truth["lsn"]
        assert (r["op"] == "D") == (truth["op"] == "D")
    # a range containing the initial load is NOT derivable as row changes
    # (overwrite rewrites state outside the delta log) — loud, not silent
    with pytest.raises(ValueError, match="overwrite"):
        t.changes(0, v0)


def test_read_deltas_since_skips_files_by_manifest_stats(spark, tmp_path):
    """Incremental scan: the per-file lsn max recorded at stage time prunes
    whole delta files below the floor before any I/O is planned."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("n", T.IntegerType()),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "ds"), schema, num_buckets=2)
    t.overwrite_all(
        spark.createDataFrame([("a", 1), ("b", 2)], schema), key_col="doc_id"
    )
    # three delta commits with disjoint lsn ranges
    for lo in (10, 20, 30):
        df = spark.createDataFrame(
            [(f"k{lo}", lo, lo, "U"), (f"k{lo+1}", lo + 1, lo + 1, "D")],
            "doc_id string, n int, lsn long, op string",
        )
        t.append_delta([0, 1], df, key_col="doc_id")

    # manifest-level pruning: floor 25 keeps only the lsn 30..31 commit
    kept = t._delta_entries_since(25, None)
    all_entries = t._delta_entries_since(-1, None)
    assert len(all_entries) > len(kept) > 0
    assert all(e["lsn_max"] > 25 for e in kept)

    rows = t.read_deltas_since(25).collect()
    assert sorted((r["doc_id"], r["lsn"], r["op"]) for r in rows) == [
        ("k30", 30, "U"),
        ("k31", 31, "D"),
    ]
    # a floor above everything scans nothing and returns an empty, typed df
    empty = t.read_deltas_since(10_000)
    assert empty.count() == 0 and "op" in empty.columns

    # boundary: floor exactly at a file's max excludes that file's rows
    at_max = {r["lsn"] for r in t.read_deltas_since(31).collect()}
    assert at_max == set()


def test_read_deltas_since_across_schema_evolution(spark, tmp_path):
    """Delta files written before an evolution project onto the evolved
    schema (null-filled added column), same as the resolved read path."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("n", T.IntegerType()),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "ev"), schema, num_buckets=2)
    t.overwrite_all(spark.createDataFrame([("a", 1)], schema), key_col="doc_id")
    t.append_delta(
        [0, 1],
        spark.createDataFrame(
            [("k1", 10, 10, "U")], "doc_id string, n int, lsn long, op string"
        ),
        key_col="doc_id",
    )
    evolved = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("n", T.LongType()),       # widened
            T.StructField("lang", T.StringType()),  # added
        ]
    )
    t.evolve_schema(evolved)
    t.append_delta(
        [0, 1],
        spark.createDataFrame(
            [("k2", 20, "fr", 20, "U")],
            "doc_id string, n long, lang string, lsn long, op string",
        ),
        key_col="doc_id",
    )
    rows = {r["doc_id"]: r for r in t.read_deltas_since(0).collect()}
    assert rows["k1"]["n"] == 10 and rows["k1"]["lang"] is None
    assert rows["k2"]["n"] == 20 and rows["k2"]["lang"] == "fr"
    assert t.read_deltas_since(0).schema["n"].dataType.typeName() == "long"


def _race_commit(args):
    """Child process: try to publish the same snapshot version."""
    import time as _time

    from bigquery_etl_fork_spark.lake.table import CommitConflict, LakeTable, Snapshot

    root, version, writer_id, start_at = args
    snap = Snapshot(
        version=version,
        schema_id=0,
        schemas={"0": T.StructType([T.StructField("doc_id", T.StringType())]).json()},
        num_buckets=2,
        buckets={"0": [], "1": []},
        properties={"writer": writer_id},
        committed_at=0.0,
    )
    _time.sleep(max(0.0, start_at - _time.time()))  # synchronized start
    try:
        LakeTable._write_snapshot(root, snap)
        return (writer_id, "won")
    except CommitConflict:
        return (writer_id, "conflict")


def test_commit_point_is_cross_process_atomic(tmp_path):
    """The os.link commit point must be exclusive across PROCESSES, not
    just threads: 8 writers race the same version; exactly one wins and
    the published snapshot is internally consistent (one writer's blob,
    never a torn mix)."""
    import json as _json
    import multiprocessing as mp
    import time as _time

    root = str(tmp_path / "race")
    os.makedirs(os.path.join(root, "_snapshots"), exist_ok=True)
    start = _time.time() + 0.5
    with mp.get_context("spawn").Pool(8) as pool:
        results = pool.map(
            _race_commit, [(root, 7, f"w{i}", start) for i in range(8)]
        )
    wins = [w for w, s in results if s == "won"]
    assert len(wins) == 1, results
    with open(os.path.join(root, "_snapshots", "snap-0000000007.json")) as fh:
        blob = _json.load(fh)
    assert blob["properties"]["writer"] == wins[0]
