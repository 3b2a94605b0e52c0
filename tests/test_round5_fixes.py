"""Round-5 regression tests (VERDICT r4 "Next round" + ADVICE r4 items)."""

import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigquery_etl_fork_spark.engine import CDCEngine, IncrementalRollup  # noqa: E402
from bigquery_etl_fork_spark.lake import LakeTable  # noqa: E402


def test_bench_headline_line_fits_driver_tail():
    """VERDICT r4 #2: BENCH_r04 parsed null because the final stdout line
    outgrew the driver's 2000-char tail. The headline builder must stay
    ≤1800 bytes even with every registered query at a worst-case timing."""
    import bench
    from bigquery_etl_fork_spark.queries import QUERIES

    qsecs = {name: 9999.999 for name in QUERIES}
    cdc = {"events_per_sec": 123456.7, "seconds": 9999.999}
    bulk = {"events_per_sec": 123456.7, "seconds": 9999.999}
    cal = {"single_sec": 99.999, "par8_sec": 99.999}
    ref = {"single_sec": 0.40, "par8_sec": 1.08}
    line = bench.headline_line(qsecs, cdc, bulk, cal, ref, 0.1)
    assert len(line) <= 1800, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "cdc_events_applied_per_sec"
    assert parsed["cdc_bulk_sec"] == 9999.999


def test_registration_rotation_covers_unrecorded_queries():
    """VERDICT r4 #1: the driver records at most the first ~50 registered
    queries. The 7 rows missing from CORRECTNESS_r04 must now sit inside
    the first 50, and QUERIES/ORACLES orders must agree."""
    from bigquery_etl_fork_spark.queries import ORACLES, QUERIES

    order = list(QUERIES)
    assert list(ORACLES) == [k for k in order if k in ORACLES]
    for name in (
        "contamination",
        "contamination_tokens",
        "export_shards",
        "cdc_replay",
        "corpus_prep",
        "train_val_split",
        "stratified_sample",
        "keyed_lookup",
        "rebucket_replay",
    ):
        assert order.index(name) < 50, (name, order.index(name))


def _bucket_of(spark, key: str, nb: int) -> int:
    return (
        spark.createDataFrame([(key,)], "k string")
        .select(F.pmod(F.xxhash64("k"), F.lit(nb)).cast("int").alias("b"))
        .collect()[0]["b"]
    )


def test_rollup_minmax_crashed_partials_cell_is_superseded(spark, tmp_path):
    """ADVICE r4 (rollup.py:346): a refresh that crashed between the
    partials commit and the main rollup commit can leave a cell for a
    group the NEXT (wider) range's change feed never surfaces as touched
    — the key that created it was inserted then deleted inside the range.
    Healing must supersede every cell of a changed bucket, not just the
    touched groups' cells, or a later refresh folds a phantom extremum."""
    nb = 8
    rows = [(f"d{i}", "g0", i * 10) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id string, grp string, val long")
    src = LakeTable.create(
        spark, str(tmp_path / "src"), df.schema, num_buckets=nb,
        properties={"key_col": "doc_id"},
    )
    src.overwrite_all(df, key_col="doc_id")
    mv = IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["grp"],
        measures={"n": ("count", None), "mx": ("max", "val")},
    )
    assert mv.refresh()["mode"] == "full"

    eng = CDCEngine(spark, src, key="doc_id", order="lsn", count_input=False)
    sch = "doc_id string, grp string, val long, lsn long, op string"
    # epoch 1: insert ka into gX with the future phantom max
    eng.apply_epoch(1, spark.createDataFrame([("ka", "gX", 999, 101, "I")], sch))
    v_a = src.snapshot.version
    b_ka = _bucket_of(spark, "ka", nb)
    # pick a second key whose bucket differs from ka's: the phantom can
    # only survive the buggy per-touched-group drop if the later refresh
    # changes a DIFFERENT source bucket
    kb = next(k for k in (f"kb{i}" for i in range(64)) if _bucket_of(spark, k, nb) != b_ka)

    # crashed refresh over (v0, v_a]: partials committed (cell gX->999),
    # main rollup write and version pointer never land
    touched = spark.createDataFrame([("gX",)], "grp string")
    mv._refresh_partials(touched, [b_ka], mv.last_source_version, v_a)

    # epoch 2: delete ka — over the healing range (v0, v2] the LWW feed
    # shows ka only as a delete, so gX is never in the touched set
    eng.apply_epoch(2, spark.createDataFrame([("ka", None, None, 201, "D")], sch))
    res = mv.refresh()
    assert res["mode"] == "incremental"
    # the unsealed partials commit must be detected -> heal mode
    assert res["partials_mode"] == "heal", res

    # epoch 3: gX gets a small value in a DIFFERENT bucket; without the
    # bucket-scoped healing the stale gX cell folds max(999, 1) = 999
    eng.apply_epoch(3, spark.createDataFrame([(kb, "gX", 1, 301, "I")], sch))
    res = mv.refresh()
    assert res["mode"] == "incremental"
    # chain sealed again -> the cheap cell-scoped path resumes
    assert res["partials_mode"] == "fast", res
    got = {r["grp"]: (r["n"], r["mx"]) for r in mv.read().collect()}
    assert got["gX"] == (1, 1), got


def test_shred_emit_changes_with_nondefault_cdc_columns(spark, tmp_path):
    """ADVICE r4 (shredder.py:112): the tombstone phase builds its frame
    with the caller's order_col/op_col but previously staged it through
    hard-coded 'op'/'lsn' defaults — non-default names crashed at the
    tombstone-partition write. Must shred cleanly and stay feed-derivable."""
    from bigquery_etl_fork_spark.engine.shredder import shred_keys

    rows = [(f"d{i}", i) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id string, val long")
    t = LakeTable.create(
        spark, str(tmp_path / "t"), df.schema, num_buckets=4,
        properties={"key_col": "doc_id"},
    )
    t.overwrite_all(df, key_col="doc_id")
    v0 = t.snapshot.version
    res = shred_keys(
        spark, t, ["d3", "d7"], key_col="doc_id",
        order_col="seq", op_col="operation",
        emit_changes=True, vacuum=False,
    )
    assert res.rows_deleted == 2
    left = {r["doc_id"] for r in t.read(key_col="doc_id", order_col="seq", op_col="operation").collect()}
    assert "d3" not in left and "d7" not in left and len(left) == 18
    ch = t.changes(v0, key_col="doc_id", order_col="seq", op_col="operation")
    dels = {r["doc_id"] for r in ch.where(F.col("operation") == "D").collect()}
    assert dels == {"d3", "d7"}


def test_cow_empty_epoch_keeps_change_feed_derivable(spark, tmp_path):
    """ADVICE r4 (cdc.py:609): a CoW empty epoch used to commit with the
    default 'overwrite' op, making changes() raise over any range spanning
    it. It must commit feed-safe so downstream rollups stay incremental."""
    rows = [(f"d{i}", i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id string, val long")
    t = LakeTable.create(
        spark, str(tmp_path / "t"), df.schema, num_buckets=4,
        properties={"key_col": "doc_id"},
    )
    t.overwrite_all(df, key_col="doc_id")
    v0 = t.snapshot.version
    eng = CDCEngine(spark, t, key="doc_id", order="lsn",
                    storage_mode="cow", count_input=False)
    sch = "doc_id string, val long, lsn long, op string"
    eng.apply_epoch(1, spark.createDataFrame([("d1", 100, 101, "U")], sch))
    eng.apply_epoch(2, spark.createDataFrame([], sch))  # empty epoch
    eng.apply_epoch(3, spark.createDataFrame([("d2", 200, 301, "U")], sch))
    ch = t.changes(v0, key_col="doc_id")  # must NOT raise across epoch 2
    got = {r["doc_id"]: r["val"] for r in ch.collect()}
    assert got == {"d1": 100, "d2": 200}


def test_contaminated_docs_shingles_corpus_once(spark):
    """VERDICT r4 #5: contaminated_docs used to shingle the corpus twice
    (its own gram count + contamination_pairs' re-shingle) — two full
    corpus scans at 100 TB. Pin the single-pass shape: exactly one
    shingled() call per input relation, and unchanged results."""
    from bigquery_etl_fork_spark.operators import dedup_text

    corpus = spark.createDataFrame(
        [
            (f"c{i}", "the quick brown fox jumps over the lazy dog " + "x" * i)
            for i in range(4)
        ]
        + [("clean", "entirely different words only here")],
        "doc_id string, text string",
    )
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id int, text string",
    )
    calls = []
    orig = dedup_text.shingled

    def counting(df, *a, **kw):
        calls.append(1)
        return orig(df, *a, **kw)

    dedup_text.shingled = counting
    try:
        out = {
            r["doc_id"]: (r["n_shared_grams"], r["n_bench_examples"], r["contaminated"])
            for r in dedup_text.contaminated_docs(corpus, bench, n=5).collect()
        }
    finally:
        dedup_text.shingled = orig
    assert len(calls) == 2, f"corpus or bench shingled more than once: {len(calls)} calls"
    assert out["clean"] == (0, 0, False)
    assert out["c0"][0] > 0 and out["c0"][1] == 1 and out["c0"][2]


def test_read_keys_zone_map_file_skipping(spark, tmp_path):
    """VERDICT r4 #6: per-file key min/max recorded at write time prune
    file lists INSIDE a bucket for key-targeted reads. Bootstrap writes
    key-clustered base files split by max_file_rows; read(keys=[k]) must
    skip most files and still return exactly k's resolved row."""
    rows = [(f"d{i:05d}", i) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id string, val long")
    t = LakeTable.create(
        spark, str(tmp_path / "t"), df.schema, num_buckets=2,
        properties={"key_col": "doc_id", "max_file_rows": 100},
    )
    t.overwrite_all(df, key_col="doc_id")
    n_files = sum(len(v) for v in t.snapshot.buckets.values())
    assert n_files >= 16, n_files  # max_file_rows split the buckets

    got = t.read(keys=["d00042"], key_col="doc_id").collect()
    stats = t.last_read_stats
    assert stats["base_files_kept"] < stats["base_files_total"], stats
    assert stats["base_files_kept"] <= 2  # ~1 file per bucket range probe
    full = {r["doc_id"]: r["val"] for r in t.read(key_col="doc_id").collect()}
    pruned = {r["doc_id"]: r["val"] for r in got}
    assert pruned["d00042"] == full["d00042"] == 42


def test_read_keys_pruning_correct_through_deltas_and_compaction(spark, tmp_path):
    """Keys-pruned reads must resolve LWW correctly across base + delta
    files, and compaction must re-establish key clustering (zone maps on
    compacted runs — the LSM shape)."""
    rows = [(f"d{i:05d}", i) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id string, val long")
    t = LakeTable.create(
        spark, str(tmp_path / "t"), df.schema, num_buckets=2,
        properties={"key_col": "doc_id", "max_file_rows": 100},
    )
    t.overwrite_all(df, key_col="doc_id")
    eng = CDCEngine(spark, t, key="doc_id", order="lsn", count_input=False)
    sch = "doc_id string, val long, lsn long, op string"
    eng.apply_epoch(1, spark.createDataFrame(
        [("d00042", 9942, 101, "U"), ("d00043", None, 102, "D")], sch))
    # pruned read sees the delta update AND the tombstone
    got = {r["doc_id"]: r["val"]
           for r in t.read(keys=["d00042", "d00043"], key_col="doc_id").collect()}
    assert got.get("d00042") == 9942 and "d00043" not in got

    t.compact_buckets(list(range(2)), key_col="doc_id")
    got2 = {r["doc_id"]: r["val"]
            for r in t.read(keys=["d00042"], key_col="doc_id").collect()}
    stats = t.last_read_stats
    assert got2["d00042"] == 9942
    assert stats["base_files_kept"] < stats["base_files_total"], stats


def test_rollup_retract_read_uses_file_pruning(spark, tmp_path):
    """The rollup's additive retract must report zone-map file skipping
    when the changed-key set is bounded — O(files containing changed
    keys), not O(files in changed buckets)."""
    rows = [(f"d{i:05d}", f"g{i % 3}", i) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id string, grp string, val long")
    src = LakeTable.create(
        spark, str(tmp_path / "src"), df.schema, num_buckets=2,
        properties={"key_col": "doc_id", "max_file_rows": 100},
    )
    src.overwrite_all(df, key_col="doc_id")
    mv = IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["grp"],
        measures={"n": ("count", None), "total": ("sum", "val")},
    )
    assert mv.refresh()["mode"] == "full"
    eng = CDCEngine(spark, src, key="doc_id", order="lsn", count_input=False)
    eng.apply_epoch(1, spark.createDataFrame(
        [("d00042", "g0", 7, 101, "U")],
        "doc_id string, grp string, val long, lsn long, op string"))
    res = mv.refresh()
    assert res["mode"] == "incremental"
    f = res["src_files"]
    assert f["base_files_kept"] < f["base_files_total"], f
    got = {r["grp"]: (r["n"], r["total"]) for r in mv.read().collect()}
    exp = {r["grp"]: (r["n"], r["total"])
           for r in src.read(key_col="doc_id").groupBy("grp")
           .agg(F.count("*").alias("n"), F.sum("val").alias("total")).collect()}
    assert got == exp


def test_rollup_partials_table_stays_bounded(spark, tmp_path):
    """VERDICT r4 #4b (partials compaction/expiry): with bucket-granular
    supersede semantics, every refresh that changes a source bucket
    overwrites that bucket's cells wholesale, so the partials table can
    never accumulate stale cells — its row count stays exactly the number
    of LIVE (group, source-bucket) cells. Deleting a group's rows must
    shrink it; no separate compaction pass is needed."""
    rows = [(f"d{i:04d}", f"g{i % 4}", i) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, grp string, val long")
    src = LakeTable.create(
        spark, str(tmp_path / "src"), df.schema, num_buckets=8,
        properties={"key_col": "doc_id"},
    )
    src.overwrite_all(df, key_col="doc_id")
    mv = IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["grp"],
        measures={"n": ("count", None), "mx": ("max", "val")},
    )
    mv.refresh()

    def live_cells():
        return (
            src.read(key_col="doc_id")
            .groupBy(
                "grp",
                F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int").alias("b"),
            )
            .count()
            .count()
        )

    assert mv.partials.read().count() == live_cells()

    eng = CDCEngine(spark, src, key="doc_id", order="lsn", count_input=False)
    sch = "doc_id string, grp string, val long, lsn long, op string"
    # epoch 1: churn updates across every bucket
    eng.apply_epoch(1, spark.createDataFrame(
        [(f"d{i:04d}", f"g{i % 4}", i + 1000, 100 + i, "U") for i in range(0, 200, 3)],
        sch))
    mv.refresh()
    assert mv.partials.read().count() == live_cells()
    # epoch 2: delete g1 entirely — its cells must disappear, not linger
    eng.apply_epoch(2, spark.createDataFrame(
        [(f"d{i:04d}", None, None, 500 + i, "D") for i in range(200) if i % 4 == 1],
        sch))
    mv.refresh()
    n_cells = mv.partials.read().count()
    assert n_cells == live_cells()
    assert mv.partials.read().where(F.col("grp") == "g1").count() == 0


def test_read_keys_pruning_is_per_bucket(spark, tmp_path):
    """The probe-caught defect: file key-ranges hold a bucket's
    hash-sampled keys, so testing ranges against the GLOBAL target list
    keeps ~every file once targets spread lexicographically. Per-bucket
    pruning must keep roughly (keys-per-bucket) files, far fewer than
    files-per-bucket, for spread-out key sets."""
    rows = [(f"d{i:06d}", i) for i in range(8000)]
    df = spark.createDataFrame(rows, "doc_id string, val long")
    t = LakeTable.create(
        spark, str(tmp_path / "t"), df.schema, num_buckets=8,
        properties={"key_col": "doc_id", "max_file_rows": 100},
    )
    t.overwrite_all(df, key_col="doc_id")
    # 8 target keys spread evenly across the lexicographic range: under
    # global-list pruning every ~1000-row bucket file overlaps some target
    keys = [f"d{i:06d}" for i in range(0, 8000, 1000)]
    got = {r["doc_id"] for r in t.read(keys=keys, key_col="doc_id").collect()
           if r["doc_id"] in set(keys)}
    stats = t.last_read_stats
    assert got == set(keys)
    # 8 keys over 8 buckets ≈ 1 file per targeted bucket; allow slack but
    # demand real skipping (each bucket holds ~10 files)
    assert stats["base_files_kept"] <= 2 * len(keys), stats
    assert stats["base_files_kept"] < stats["base_files_total"] // 3, stats


def test_shred_accounting_uses_pruned_direct_count(spark, tmp_path):
    """Round 5: for bounded key sets the shredder counts doomed rows once
    via a zone-map-pruned read instead of per-group whole-bucket
    before/after counts. The reported rows_deleted must stay exact on a
    clustered multi-file table, including keys that appear only in deltas
    or not at all."""
    from bigquery_etl_fork_spark.engine.shredder import shred_keys

    rows = [(f"d{i:05d}", i) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id string, val long")
    t = LakeTable.create(
        spark, str(tmp_path / "t"), df.schema, num_buckets=4,
        properties={"key_col": "doc_id", "max_file_rows": 200},
    )
    t.overwrite_all(df, key_col="doc_id")
    eng = CDCEngine(spark, t, key="doc_id", order="lsn", count_input=False)
    sch = "doc_id string, val long, lsn long, op string"
    # delta-only insert dnew + delete of d00100 before the shred
    eng.apply_epoch(1, spark.createDataFrame(
        [("dnew01", 1, 101, "I"), ("d00100", None, 102, "D")], sch))

    targets = ["d00042", "d00777", "dnew01", "d00100", "dzzzzz"]
    # d00100 already deleted, dzzzzz never existed -> 3 real deletions
    res = shred_keys(spark, t, targets, key_col="doc_id",
                     emit_changes=True, vacuum=False)
    assert res.rows_deleted == 3, res
    left = {r["doc_id"] for r in t.read(key_col="doc_id").collect()}
    assert not (set(targets) & left)
    assert len(left) == 3000 + 1 - 1 - 3  # base + insert - pre-delete - shred


def test_decode_media_handles_jpeg_blobs(spark):
    """Round 5: baseline JPEG joins the natively-decoded formats — the
    Arrow-batched decode_media kernel must extract dims + mean from real
    entropy-coded JPEG bytes (444, 420, restart intervals) with no
    external codec library."""
    from bigquery_etl_fork_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        synth_jpeg,
    )

    cases = [(24, 16, 1, "444", 0), (16, 16, 3, "444", 2), (32, 16, 3, "420", 0)]
    rows, means = [], {}
    for i, (w, h, ch, sub, ri) in enumerate(cases):
        blob, px = synth_jpeg(w, h, ch, seed=i, subsampling=sub, restart_interval=ri)
        rows.append((i, "image", bytearray(blob), (w, h, ch, len(blob))))
        means[i] = float(px.mean())
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_media(df).collect()}
    for i, (w, h, ch, _sub, _ri) in enumerate(cases):
        r = out[i]
        assert r["ok"], r
        assert (r["width"], r["height"], r["channels"]) == (w, h, ch), r
        assert abs(r["mean_intensity"] - means[i]) <= 2.0, (r, means[i])


def test_property_keys_pruned_read_equals_full_read(spark, tmp_path):
    """Property sweep: for ANY target key set (present, delta-updated,
    tombstoned, or absent), read(keys=ks) restricted to ks must equal the
    unpruned read restricted to ks — file skipping is an optimization,
    never a semantics change."""
    import random

    rnd = random.Random(7)
    rows = [(f"d{i:05d}", i) for i in range(1200)]
    df = spark.createDataFrame(rows, "doc_id string, val long")
    t = LakeTable.create(
        spark, str(tmp_path / "t"), df.schema, num_buckets=4,
        properties={"key_col": "doc_id", "max_file_rows": 64},
    )
    t.overwrite_all(df, key_col="doc_id")
    eng = CDCEngine(spark, t, key="doc_id", order="lsn", count_input=False)
    sch = "doc_id string, val long, lsn long, op string"
    # epoch of updates + deletes + delta-only inserts across the keyspace
    delta = (
        [(f"d{rnd.randrange(1200):05d}", 10_000 + i, 100 + i, "U") for i in range(60)]
        + [(f"d{rnd.randrange(1200):05d}", None, 500 + i, "D") for i in range(20)]
        + [(f"x{i:05d}", 90_000 + i, 900 + i, "I") for i in range(10)]
    )
    eng.apply_epoch(1, spark.createDataFrame(delta, sch))

    full = {r["doc_id"]: r["val"] for r in t.read(key_col="doc_id").collect()}
    for trial in range(5):
        ks = sorted(
            {f"d{rnd.randrange(1400):05d}" for _ in range(rnd.randrange(1, 25))}
            | {f"x{rnd.randrange(12):05d}" for _ in range(rnd.randrange(0, 3))}
        )
        got = {
            r["doc_id"]: r["val"]
            for r in t.read(keys=ks, key_col="doc_id").collect()
            if r["doc_id"] in set(ks)
        }
        exp = {k: full[k] for k in ks if k in full}
        assert got == exp, (trial, ks, got, exp)


def test_delta_key_bloom_skips_unrelated_epochs(spark, tmp_path):
    """Per-file key blooms (delta_key_bloom property): an epoch's delta
    files are lsn-sorted, so their key min/max spans the bucket and zone
    maps keep every epoch; the bloom must skip the epochs that never
    touched the target keys, survive vacuum(), and load cold from the
    sidecar in a fresh table instance."""
    df = spark.createDataFrame([(i, i * 10) for i in range(20000)], "doc_id long, v long")
    t = LakeTable.create(
        spark, str(tmp_path / "t"), df.schema, num_buckets=8,
        properties={"key_col": "doc_id", "delta_key_bloom": True},
    )
    t.overwrite_all(df, key_col="doc_id")
    for e in range(6):
        # scattered (strided) keys: each epoch's key range spans the table
        d = spark.createDataFrame(
            [((i * 131 + e * 7) % 20000, 1_000_000 + e * 1000 + i, 10_000 + e)
             for i in range(150)],
            "doc_id long, v long, lsn long",
        ).withColumn("op", F.lit("U"))
        t.append_delta(list(range(8)), d, "doc_id")
    keys = [(i * 131 + 4 * 7) % 20000 for i in (3, 77, 149)]  # epoch-4 keys
    full = {r["doc_id"]: r["v"]
            for r in t.read(key_col="doc_id").where(F.col("doc_id").isin(keys)).collect()}

    got = {r["doc_id"]: r["v"]
           for r in t.read(keys=keys, key_col="doc_id").collect() if r["doc_id"] in set(keys)}
    stats = t.last_read_stats
    assert got == full
    assert stats["delta_files_bloom_skipped"] > 0, stats
    assert stats["delta_files_kept"] < stats["delta_files_total"], stats

    t.vacuum()  # must keep the _blooms.json sidecars of live commits
    t2 = LakeTable(spark, str(tmp_path / "t"))  # cold bloom cache
    got2 = {r["doc_id"]: r["v"]
            for r in t2.read(keys=keys, key_col="doc_id").collect() if r["doc_id"] in set(keys)}
    assert got2 == full
    assert t2.last_read_stats["delta_files_bloom_skipped"] > 0


def test_delta_key_bloom_never_false_negative_sweep(spark, tmp_path):
    """Property sweep: a file that physically contains a target key must
    always survive pruning (blooms may false-positive, never
    false-negative), for int and string keys alike; the pruned read stays
    value-identical to the unpruned read."""
    import random

    import pyarrow.parquet as pq

    rnd = random.Random(5)
    for label, mk in (("int", lambda i: i), ("str", lambda i: f"k{i:06d}")):
        df = spark.createDataFrame(
            [(mk(i), i) for i in range(3000)],
            "doc_id long, val long" if label == "int" else "doc_id string, val long",
        )
        t = LakeTable.create(
            spark, str(tmp_path / f"t_{label}"), df.schema, num_buckets=4,
            properties={"key_col": "doc_id", "delta_key_bloom": True},
        )
        t.overwrite_all(df, key_col="doc_id")
        for e in range(4):
            d = spark.createDataFrame(
                [(mk(rnd.randrange(3000)), 10_000 + e * 100 + i, 100 + e)
                 for i in range(80)],
                ("doc_id long, val long, lsn long" if label == "int"
                 else "doc_id string, val long, lsn long"),
            ).withColumn("op", F.lit("U"))
            t.append_delta(list(range(4)), d, "doc_id")
        full = {r["doc_id"]: r["val"] for r in t.read(key_col="doc_id").collect()}
        for _ in range(4):
            ks = sorted({mk(rnd.randrange(3200)) for _ in range(rnd.randrange(1, 12))})
            got = {r["doc_id"]: r["val"]
                   for r in t.read(keys=ks, key_col="doc_id").collect()
                   if r["doc_id"] in set(ks)}
            assert got == {k: full[k] for k in ks if k in full}, (label, ks)
            # white-box: every delta file physically holding a target key
            # must be in the kept entry list
            from bigquery_etl_fork_spark.lake.table import bucket_id
            kdf = spark.createDataFrame(
                [(k,) for k in ks],
                "doc_id long" if label == "int" else "doc_id string",
            )
            key_buckets = {}
            for r in kdf.select("doc_id", bucket_id(F.col("doc_id"), 4).alias("b")).collect():
                key_buckets.setdefault(str(r["b"]), []).append(r["doc_id"])
            for v in key_buckets.values():
                v.sort()
            entries = t._entries(None, "delta")
            kept = t._prune_by_bloom(t._prune_by_keys(entries, key_buckets, "doc_id"), key_buckets)
            kept_paths = {e["path"] for e in kept}
            for ent in entries:
                fp = os.path.join(t.root, ent["path"])
                file_keys = set(pq.read_table(fp, columns=["doc_id"]).column(0).to_pylist())
                hits = file_keys & set(key_buckets.get(ent["_bucket"], []))
                if hits:
                    assert ent["path"] in kept_paths, (label, ent["path"], hits)


def test_rebucket_grows_bucket_count_correctly(spark, tmp_path):
    """Bucket-count evolution: rebucket(4x) must preserve table state
    exactly (through MoR deltas, which it compacts first), re-establish
    key clustering, keep the change feed derivable across the rebucket
    commit, and leave subsequent CDC epochs applying under the new
    count."""
    df = spark.createDataFrame([(f"d{i:05d}", i) for i in range(2000)], "doc_id string, val long")
    t = LakeTable.create(
        spark, str(tmp_path / "t"), df.schema, num_buckets=4,
        properties={"key_col": "doc_id"},
    )
    t.overwrite_all(df, key_col="doc_id")
    eng = CDCEngine(spark, t, key="doc_id", order="lsn", count_input=False)
    sch = "doc_id string, val long, lsn long, op string"
    eng.apply_epoch(1, spark.createDataFrame(
        [("d00007", 7007, 101, "U"), ("d00008", None, 102, "D"),
         ("x00001", 11111, 103, "I")], sch))
    before = {r["doc_id"]: r["val"] for r in t.read(key_col="doc_id").collect()}
    v_before = t.snapshot.version

    t.rebucket(16)
    assert t.num_buckets == 16
    assert t.snapshot.commit_op == "rebucket"
    after = {r["doc_id"]: r["val"] for r in t.read(key_col="doc_id").collect()}
    assert after == before
    # every manifest entry lives in the new bucket space and is clustered
    assert set(t.snapshot.buckets.keys()) == {str(b) for b in range(16)}
    assert all(
        f.get("doc_id_min") is not None
        for fs in t.snapshot.buckets.values() for f in fs
    )
    # zone maps prune under the new layout
    t.read(keys=["d00007"], key_col="doc_id").collect()
    assert t.last_read_stats["base_files_kept"] < t.last_read_stats["base_files_total"]
    # change feed across the rebucket version stays derivable (no rows)
    ch = t.changes(v_before, t.snapshot.version, key_col="doc_id")
    assert ch.count() == 0
    # next epoch applies under the new count
    eng.apply_epoch(2, spark.createDataFrame([("d00009", 9009, 201, "U")], sch))
    assert {r["doc_id"]: r["val"] for r in t.read(key_col="doc_id").collect()}["d00009"] == 9009
    # invalid growth factors rejected
    import pytest
    with pytest.raises(ValueError):
        t.rebucket(24)  # not a multiple of 16
    with pytest.raises(ValueError):
        t.rebucket(16)  # no growth


def test_rebucket_plan_is_shuffle_free(spark, tmp_path):
    """The rebucket rewrite must be a straight scan: old bucket b splits
    locally into {b, b+old, ...} so the write plan carries NO Exchange."""
    from bigquery_etl_fork_spark.lake.table import BUCKET_COL, bucket_id
    from bigquery_etl_fork_spark.plans.guards import explain_string

    df = spark.createDataFrame([(i, i) for i in range(5000)], "doc_id long, v long")
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema, num_buckets=4,
                         properties={"key_col": "doc_id"})
    t.overwrite_all(df, key_col="doc_id")
    base = t._read_files(t._sid_paths(t._entries(None, "base")), t.schema)
    plan_df = base.withColumn(BUCKET_COL, bucket_id(F.col("doc_id"), 16))
    assert "Exchange" not in explain_string(plan_df), explain_string(plan_df)
    t.rebucket(16)
    assert {r["doc_id"] for r in t.read(key_col="doc_id").collect()} == set(range(5000))


def test_rollup_survives_source_rebucket(spark, tmp_path):
    """A refresh range spanning a source rebucket must not trust old-space
    bucket ids: the rollup detects the bucket-count change, recomputes
    from current state (superseding every extrema partials cell), and
    subsequent refreshes are incremental and correct in the new space."""
    rows = [(f"d{i:05d}", f"g{i % 5}", i) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id string, grp string, val long")
    src = LakeTable.create(spark, str(tmp_path / "src"), df.schema, num_buckets=4,
                           properties={"key_col": "doc_id"})
    src.overwrite_all(df, key_col="doc_id")
    mv = IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["grp"],
        measures={"n": ("count", None), "hi": ("max", "val"), "lo": ("min", "val")},
    )
    assert mv.refresh()["mode"] == "full"
    eng = CDCEngine(spark, src, key="doc_id", order="lsn", count_input=False)
    sch = "doc_id string, grp string, val long, lsn long, op string"
    eng.apply_epoch(1, spark.createDataFrame([("d00004", "g4", -50, 101, "U")], sch))
    src.rebucket(16)
    eng.apply_epoch(2, spark.createDataFrame([("d00009", "g4", 99999, 201, "U")], sch))

    res = mv.refresh()  # range spans the rebucket -> full, new-space partials
    assert res["mode"] == "full"

    def expect():
        return {r["grp"]: (r["n"], r["hi"], r["lo"])
                for r in src.read(key_col="doc_id").groupBy("grp")
                .agg(F.count("*").alias("n"), F.max("val").alias("hi"),
                     F.min("val").alias("lo")).collect()}

    got = {r["grp"]: (r["n"], r["hi"], r["lo"]) for r in mv.read().collect()}
    assert got == expect()
    # partials cells are all in the new bucket space
    cells = mv.partials.read(key_col="grp").select("src_bucket").distinct().collect()
    assert all(0 <= r["src_bucket"] < 16 for r in cells)
    # next refresh is incremental again and stays correct (extrema retract)
    eng.apply_epoch(3, spark.createDataFrame([("d00009", "g4", None, 301, "D")], sch))
    res2 = mv.refresh()
    assert res2["mode"] == "incremental"
    got2 = {r["grp"]: (r["n"], r["hi"], r["lo"]) for r in mv.read().collect()}
    assert got2 == expect()


def test_auto_rebucket_policy_grows_under_tailer(spark, tmp_path):
    """The tailer's bucket-count-evolution policy: with a byte threshold
    set, the engine grows the bucket count xfactor after the epoch whose
    commit crossed it, stops at the cap, and the replayed state is
    identical to a plain engine's. Disabled (default) and huge-threshold
    engines never rebucket."""
    base = spark.createDataFrame(
        [(f"d{i:05d}", i) for i in range(500)], "doc_id string, val long"
    )
    sch = "doc_id string, val long, lsn long, op string"
    epochs = {
        1: [("d00001", 11, 101, "U"), ("n00001", 1, 102, "I")],
        2: [("d00002", 22, 201, "U"), ("d00003", None, 202, "D")],
        3: [("n00002", 2, 301, "I")],
    }

    def replay(root, **eng_kw):
        t = LakeTable.create(
            spark, root, base.schema, num_buckets=4,
            properties={"key_col": "doc_id"},
        )
        t.overwrite_all(base, key_col="doc_id")
        eng = CDCEngine(spark, t, key="doc_id", order="lsn",
                        count_input=False, **eng_kw)
        for e, rows in epochs.items():
            eng.apply_epoch(e, spark.createDataFrame(rows, sch))
        return t

    auto = replay(
        str(tmp_path / "auto"),
        auto_rebucket_bytes_per_bucket=1,
        auto_rebucket_factor=2,
        auto_rebucket_max_buckets=8,
    )
    plain = replay(str(tmp_path / "plain"))

    # 1-byte threshold fires after epoch 1 (4->8); the cap stops 8->16
    assert auto.num_buckets == 8
    assert sum(1 for s in auto.history() if s.commit_op == "rebucket") == 1
    a = {r["doc_id"]: r["val"] for r in auto.read(key_col="doc_id").collect()}
    p = {r["doc_id"]: r["val"] for r in plain.read(key_col="doc_id").collect()}
    assert a == p
    assert plain.num_buckets == 4  # policy off by default

    hi = replay(str(tmp_path / "hi"), auto_rebucket_bytes_per_bucket=10**15)
    assert hi.num_buckets == 4  # threshold never crossed


def test_token_arrays_switch_to_large_list_before_gather_corruption():
    """pyarrow (16.1.0) take/filter on int32-offset list arrays silently
    return the WRONG row once a row's byte offset into the values buffer
    crosses 2^32 (= 2^30 int32 tokens) — bisected in datagen._LIST_SAFE_ELEMS's
    docstring; this corrupted the 1e9 soak's 'verbatim' duplicate
    deliveries into same-lsn rows with different payloads. Pin (a) the
    routing: arrays at/above the threshold use 64-bit offsets (whose
    gather is correct), below stay int32; (b) the threshold sits at/below
    the empirically-safe 2^30 boundary."""
    import numpy as np
    import pyarrow as pa

    from bigquery_etl_fork_spark import datagen

    assert datagen._LIST_SAFE_ELEMS <= 2**30
    rng = np.random.default_rng(3)
    small = datagen._token_arrays(rng, 10, 4, 8)
    assert pa.types.is_list(small.type)  # int32 offsets below threshold

    orig = datagen._LIST_SAFE_ELEMS
    try:
        datagen._LIST_SAFE_ELEMS = 50
        big = datagen._token_arrays(rng, 10, 8, 16)  # total >= 80 > 50
        assert pa.types.is_large_list(big.type)
        # large_list round-trips through the dup-delivery take() verbatim
        tbl = pa.table({"tokens": big})
        dup = tbl.take(pa.array([7]))
        assert dup["tokens"][0].as_py() == tbl["tokens"][7].as_py()
    finally:
        datagen._LIST_SAFE_ELEMS = orig
