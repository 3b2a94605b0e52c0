"""Round-4 defect pins (VERDICT r3 / ADVICE r3).

Each test targets one adjudicated defect:
- rollup multi-column group_cols: _full_recompute must bucket with the SAME
  function as _apply_delta or the bootstrap leaves rows in buckets the next
  incremental refresh never reads (stale/duplicate groups).
- changes() must refuse 'rollup' commits (bucket state rewritten outside
  the delta log) instead of emitting a silently incomplete feed.
- IncrementalRollup must refuse to bind an existing target whose schema
  does not match the requested group_cols/measures.
"""

import os

import pytest
from pyspark.sql import functions as F

from bigquery_etl_fork_spark.engine import CDCEngine, IncrementalRollup
from bigquery_etl_fork_spark.lake import LakeTable


def _mk_source2(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id string, grp string, grp2 string, val long"
    )
    t = LakeTable.create(
        spark, str(tmp_path / "src"), df.schema, num_buckets=32,
        properties={"key_col": "doc_id"},
    )
    t.overwrite_all(df, key_col="doc_id")
    return t


def _apply2(spark, src, rows, epoch):
    delta = spark.createDataFrame(
        rows, "doc_id string, grp string, grp2 string, val long, lsn long, op string"
    )
    eng = CDCEngine(spark, src, key="doc_id", order="lsn", count_input=False)
    eng.apply_epoch(epoch, delta)


def _expected2(src):
    return {
        (r["grp"], r["grp2"]): (r["n"], r["total"])
        for r in src.read()
        .groupBy("grp", "grp2")
        .agg(F.count("*").alias("n"), F.sum("val").alias("total"))
        .collect()
    }


def test_rollup_multicol_group_full_then_incremental(spark, tmp_path):
    """ADVICE r3 (high): with multi-column group_cols the bootstrap full
    recompute bucketed by hash(group_cols[0]) while incremental refreshes
    bucket by hash(*group_cols) — the first incremental refresh after
    bootstrap then merged against the wrong buckets: existing group rows
    were missed in the full_outer merge (duplicate group rows) and stale
    rows survived the bucket overwrite. Enough distinct (grp, grp2) pairs
    guarantees the two hash functions disagree somewhere."""
    rows = [
        (f"d{i}", f"g{i % 10}", f"h{i % 3}", i) for i in range(60)
    ]
    src = _mk_source2(spark, tmp_path, rows)
    mv = IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["grp", "grp2"],
        measures={"n": ("count", None), "total": ("sum", "val")},
    )
    assert mv.refresh()["mode"] == "full"  # bootstrap crosses the overwrite
    assert {
        (r["grp"], r["grp2"]): (r["n"], r["total"]) for r in mv.read().collect()
    } == _expected2(src)

    # pick an existing (grp, grp2) pair whose pair-hash bucket differs from
    # its grp-only-hash bucket: touching ONLY that pair means the refresh's
    # bucket list cannot accidentally cover a wrongly-placed bootstrap row,
    # so any bucketing disagreement between the full and incremental paths
    # surfaces as a duplicate group / stale aggregate
    nb = mv.target.num_buckets
    probe = (
        src.read()
        .select(
            "doc_id", "grp", "grp2",
            F.pmod(F.xxhash64("grp"), F.lit(nb)).cast("int").alias("b1"),
            F.pmod(F.xxhash64("grp", "grp2"), F.lit(nb)).cast("int").alias("b2"),
        )
        .where("b1 != b2")
        .orderBy("doc_id")
        .first()
    )
    assert probe is not None, "need at least one pair with disagreeing buckets"

    # touch ONLY the chosen pair: update one of its rows in place
    _apply2(
        spark, src,
        [(probe["doc_id"], probe["grp"], probe["grp2"], 100_000, 101, "U")],
        1,
    )
    res = mv.refresh()
    assert res["mode"] == "incremental"
    got = {
        (r["grp"], r["grp2"]): (r["n"], r["total"]) for r in mv.read().collect()
    }
    exp = _expected2(src)
    assert got == exp
    # no duplicate group rows (the historical failure shape)
    assert mv.read().count() == len(exp)

    # wider second round: group moves, insert, delete — same invariant
    _apply2(spark, src, [
        ("d0", "g0", "h1", 1000, 201, "U"),   # moved h0 -> h1
        ("dx", "g9", "h9", 5, 202, "I"),      # brand-new group pair
        ("d2", None, None, None, 203, "D"),   # delete
    ], 2)
    assert mv.refresh()["mode"] == "incremental"
    got = {
        (r["grp"], r["grp2"]): (r["n"], r["total"]) for r in mv.read().collect()
    }
    assert got == _expected2(src)


def test_changes_refuses_rollup_commit(spark, tmp_path):
    """ADVICE r3 (medium): commit_op='rollup' rewrites bucket state through
    overwrite_buckets without emitting delta files; a change-feed consumer
    over such a range must get the promised ValueError, not an empty feed."""
    df = spark.createDataFrame([("a", 1)], "k string, v long")
    t = LakeTable.create(
        spark, str(tmp_path / "t"), df.schema, num_buckets=2,
        properties={"key_col": "k"},
    )
    t.overwrite_all(df, key_col="k")
    v0 = t.snapshot.version
    t.overwrite_buckets(
        list(range(t.num_buckets)),
        spark.createDataFrame([("a", 2)], "k string, v long"),
        key_col="k",
        commit_op="rollup",
    )
    with pytest.raises(ValueError, match="not\\s+derivable|rollup"):
        t.changes(v0, key_col="k")


def test_concurrent_tailer_and_rollup_refreshers_race(tmp_path):
    """VERDICT r3 #8: one CDC tailer streams epochs into the source table
    while TWO rollup refreshers race refresh() loops against the same
    target, in separate processes. The version fence must make every closed
    source range fold exactly once: the final rollup equals a flat GROUP BY
    of the final source state and its pointer sits at the source head."""
    import json
    import subprocess
    import sys

    drive = os.path.join(os.path.dirname(__file__), "drive_rollup_race.py")
    work = str(tmp_path / "race")
    os.makedirs(work)

    def run(*args, timeout=300):
        out = subprocess.run(
            [sys.executable, drive, *args],
            capture_output=True, text=True, timeout=timeout,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    assert run("gen", work)["phase"] == "gen"
    procs = [
        subprocess.Popen(
            [sys.executable, drive, *args],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for args in (
            ("tailer", work),
            ("refresher", work, "r1"),
            ("refresher", work, "r2"),
        )
    ]
    outs = []
    for p in procs:
        so, se = p.communicate(timeout=300)
        assert p.returncode == 0, se[-2000:]
        outs.append(json.loads([l for l in so.splitlines() if l.startswith("{")][-1]))
    # at least one refresher actually folded something mid-race
    modes = [m for o in outs if o["phase"] == "refresher" for m in o["modes"]]
    assert "incremental" in modes
    res = run("check", work)
    assert res["ok"], res


def test_shred_emit_changes_flows_to_rollup_as_retracts(spark, tmp_path):
    """VERDICT r3 #9: a GDPR delete with emit_changes=True must flow through
    changes() as op='D' retracts so a downstream IncrementalRollup refresh
    stays on the O(changed-keys) incremental path — while still physically
    removing the rows (the reference's shredder-vs-aggregate reconciliation,
    backfill/shredder_mitigation.py:455)."""
    import glob

    import pyarrow.parquet as pq

    from bigquery_etl_fork_spark.engine.shredder import shred_keys

    df = spark.createDataFrame(
        [(f"d{i}", f"g{i % 3}", i) for i in range(30)],
        "doc_id string, grp string, val long",
    )
    src = LakeTable.create(
        spark, str(tmp_path / "src"), df.schema, num_buckets=4,
        properties={"key_col": "doc_id"},
    )
    src.overwrite_all(df, key_col="doc_id")
    mv = IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["grp"],
        measures={"n": ("count", None), "total": ("sum", "val")},
    )
    assert mv.refresh()["mode"] == "full"
    v_before = src.snapshot.version

    res = shred_keys(
        spark, src, ["d0", "d7", "d14"], key_col="doc_id",
        vacuum=False, emit_changes=True,
    )
    assert res.rows_deleted == 3

    # the feed over the shred range is derivable and carries the deletes
    ch = src.changes(v_before, key_col="doc_id")
    dels = {r["doc_id"] for r in ch.where("op = 'D'").collect()}
    assert {"d0", "d7", "d14"} <= dels

    r = mv.refresh()
    assert r["mode"] == "incremental"  # NOT a full recompute
    got = {row["grp"]: (row["n"], row["total"]) for row in mv.read().collect()}
    exp = {
        row["grp"]: (row["n"], row["total"])
        for row in src.read()
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("val").alias("total"))
        .collect()
    }
    assert got == exp
    assert got["g0"][0] == 9  # 10 docs in g0 (i%3==0), minus shredded d0

    # physical removal: no current-snapshot data file contains the keys
    src.expire_snapshots(keep_last=1)
    src.vacuum()
    live = set()
    for f in glob.glob(str(tmp_path / "src" / "**" / "*.parquet"), recursive=True):
        live |= set(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
    assert not ({"d0", "d7", "d14"} & live)

    # contrast: the default (non-emitting) shred forces full recompute
    shred_keys(spark, src, ["d1"], key_col="doc_id", vacuum=False)
    assert mv.refresh()["mode"] == "full"


def test_external_sources_options_roundtrip(spark, tmp_path):
    """VERDICT r3 #6: external CSV/JSON beyond the happy path — headerless
    CSV, declared dtypes surviving the read, and JSON lines with missing
    fields null-filling (the declared-schema contract: no inference, stable
    plans)."""
    from pyspark.sql import types as T

    from bigquery_etl_fork_spark.sources import read_csv, read_json

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    # headerless: first line IS data
    (tmp_path / "nohdr.csv").write_text("1,a,0.5\n2,b,1.25\n")
    c = read_csv(spark, str(tmp_path / "nohdr.csv"), schema, header=False)
    assert [f.dataType for f in c.schema.fields] == [
        T.LongType(), T.StringType(), T.DoubleType()
    ]
    assert {(r.id, r.name, r.score) for r in c.collect()} == {
        (1, "a", 0.5), (2, "b", 1.25)
    }
    # header=True must skip the header row, not read it as data
    (tmp_path / "hdr.csv").write_text("id,name,score\n3,c,2.0\n")
    h = read_csv(spark, str(tmp_path / "hdr.csv"), schema, header=True)
    assert [(r.id, r.name, r.score) for r in h.collect()] == [(3, "c", 2.0)]
    # json lines: missing fields become null under the declared schema
    (tmp_path / "x.json").write_text(
        '{"id": 1, "name": "a", "score": 0.5}\n{"id": 2}\n'
    )
    j = read_json(spark, str(tmp_path / "x.json"), schema, view_name="ext_j4")
    got = {(r.id, r.name, r.score) for r in j.collect()}
    assert got == {(1, "a", 0.5), (2, None, None)}
    assert spark.sql("SELECT count(*) FROM ext_j4").collect()[0][0] == 2


def test_export_shards_match_shard_plan(spark, tmp_path):
    """The files export_training_shards writes follow shard_plan exactly:
    same membership, same in-file order (the oracle-checked relation is the
    sink's contract, VERDICT r3 #5)."""
    import glob

    import pyarrow.parquet as pq

    from bigquery_etl_fork_spark.sources.export import (
        export_training_shards,
        shard_plan,
    )

    rows = [(f"doc{i}", i * 3 % 50) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, v int").repartition(7)
    out = str(tmp_path / "sh")
    export_training_shards(df, out, key_col="doc_id", num_shards=4)
    plan = {
        s: [r["doc_id"] for r in g]
        for s, g in __import__("itertools").groupby(
            shard_plan(df, "doc_id", 4)
            .orderBy("shard", "order_rank")
            .collect(),
            key=lambda r: r["shard"],
        )
    }
    for s in range(4):
        files = sorted(glob.glob(f"{out}/_shard={s}/*.parquet"))
        written = [
            d for f in files for d in pq.read_table(f).to_pandas()["doc_id"]
        ]
        assert written == plan[s]


def _expected_full(src, measures_sql):
    rows = (
        src.read(key_col="doc_id")
        .groupBy("grp")
        .agg(*measures_sql)
        .collect()
    )
    return {r["grp"]: tuple(r[i] for i in range(1, len(r))) for r in rows}


def test_rollup_minmax_avg_measures(spark, tmp_path):
    """Round-4 feature: min/max maintained via bucket-partial
    re-aggregation (delete-the-max works — the non-retractable case), avg
    via a derived sum/non-null-count pair (NULL when every input is null).
    After every epoch the rollup equals a fresh GROUP BY."""
    rows = [(f"d{i}", f"g{i % 3}", i * 10) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id string, grp string, val long")
    src = LakeTable.create(
        spark, str(tmp_path / "src"), df.schema, num_buckets=8,
        properties={"key_col": "doc_id"},
    )
    src.overwrite_all(df, key_col="doc_id")
    mv = IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["grp"],
        measures={
            "n": ("count", None),
            "mx": ("max", "val"),
            "mn": ("min", "val"),
            "av": ("avg", "val"),
        },
    )
    assert mv.refresh()["mode"] == "full"

    def check():
        got = {
            r["grp"]: (r["n"], r["mx"], r["mn"], r["av"])
            for r in mv.read().collect()
        }
        exp = _expected_full(
            src,
            [
                F.count("*").alias("n"),
                F.max("val").alias("mx"),
                F.min("val").alias("mn"),
                F.avg("val").alias("av"),
            ],
        )
        assert got == exp, (got, exp)

    check()

    epochs = [
        # delete the global max of g2 (d29, val 290) — retraction case
        [("d29", None, None, 101, "D")],
        # value-only update that LOWERS g1's max with ZERO additive net
        [("d28", "g1", 5, 201, "U")],
        # group move: d27 (g0's max) moves to g1; insert new g0 max
        [("d27", "g1", 270, 301, "U"), ("dz", "g0", 999, 302, "I")],
        # null values: avg must ignore, count must not
        [("dn1", "g2", None, 401, "I"), ("dn2", "g2", None, 402, "I")],
        # empty a group entirely
        [(f"d{i}", None, None, 500 + i, "D") for i in range(1, 30, 3)]
        + [("d28", None, None, 540, "D")] + [("d27", None, None, 541, "D")],
    ]
    eng = CDCEngine(spark, src, key="doc_id", order="lsn", count_input=False)
    for e, delta in enumerate(epochs, start=1):
        eng.apply_epoch(e, spark.createDataFrame(
            delta, "doc_id string, grp string, val long, lsn long, op string"))
        res = mv.refresh()
        assert res["mode"] == "incremental", (e, res)
        check()

    # crash-equivalence: a fresh handle binds to both tables and agrees
    mv2 = IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["grp"],
        measures={
            "n": ("count", None),
            "mx": ("max", "val"),
            "mn": ("min", "val"),
            "av": ("avg", "val"),
        },
    )
    assert mv2.refresh()["mode"] == "noop"


def test_rollup_minmax_refresh_stays_bucket_pruned(spark, tmp_path):
    """One changed key out of 64 must scan one source bucket even with
    extrema measures — the partial-cell recompute reads the same pruned
    bucket set the additive retract does."""
    rows = [(f"d{i}", "g", i) for i in range(64)]
    df = spark.createDataFrame(rows, "doc_id string, grp string, val long")
    src = LakeTable.create(
        spark, str(tmp_path / "src"), df.schema, num_buckets=8,
        properties={"key_col": "doc_id"},
    )
    src.overwrite_all(df, key_col="doc_id")
    mv = IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["grp"],
        measures={"mx": ("max", "val"), "n": ("count", None)},
    )
    mv.refresh()
    eng = CDCEngine(spark, src, key="doc_id", order="lsn", count_input=False)
    eng.apply_epoch(1, spark.createDataFrame(
        [("d63", None, None, 101, "D")],  # delete the max
        "doc_id string, grp string, val long, lsn long, op string"))
    res = mv.refresh()
    assert res["mode"] == "incremental"
    assert res["src_buckets_scanned"] == 1 and res["src_buckets_total"] == 8
    got = mv.read().collect()[0]
    assert (got["mx"], got["n"]) == (62, 63)


def test_rollup_minmax_property_random_ops(spark, tmp_path):
    """Random I/U/D sweep with min/max/avg: after every epoch the
    maintained rollup equals a fresh GROUP BY (incl. null values)."""
    import random as _random

    for seed in (0, 5):
        rng = _random.Random(seed)
        root = tmp_path / f"pm{seed}"
        rows = [
            (f"d{i}", f"g{rng.randrange(3)}",
             rng.randrange(100) if rng.random() > 0.15 else None)
            for i in range(20)
        ]
        df = spark.createDataFrame(rows, "doc_id string, grp string, val long")
        src = LakeTable.create(
            spark, str(root / "src"), df.schema, num_buckets=4,
            properties={"key_col": "doc_id"},
        )
        src.overwrite_all(df, key_col="doc_id")
        mv = IncrementalRollup(
            spark, src, str(root / "mv"), group_cols=["grp"],
            measures={
                "n": ("count", None), "mx": ("max", "val"),
                "mn": ("min", "val"), "av": ("avg", "val"),
            },
        )
        mv.refresh()
        eng = CDCEngine(spark, src, key="doc_id", order="lsn", count_input=False)
        lsn, live = 100, {f"d{i}" for i in range(20)}
        for epoch in range(1, 4):
            evs = []
            for _ in range(rng.randrange(2, 8)):
                lsn += 1
                r = rng.random()
                if r < 0.3 and live:
                    k = rng.choice(sorted(live))
                    live.discard(k)
                    evs.append((k, None, None, lsn, "D"))
                elif r < 0.55:
                    k = f"n{lsn}"
                    live.add(k)
                    evs.append((k, f"g{rng.randrange(3)}",
                                rng.randrange(100) if rng.random() > 0.2 else None,
                                lsn, "I"))
                else:
                    k = rng.choice(sorted(live)) if live else f"n{lsn}"
                    live.add(k)
                    evs.append((k, f"g{rng.randrange(3)}",
                                rng.randrange(100) if rng.random() > 0.2 else None,
                                lsn, "U"))
            eng.apply_epoch(epoch, spark.createDataFrame(
                evs, "doc_id string, grp string, val long, lsn long, op string"))
            assert mv.refresh()["mode"] == "incremental"
            got = {
                r["grp"]: (r["n"], r["mx"], r["mn"], r["av"])
                for r in mv.read().collect()
            }
            exp = _expected_full(src, [
                F.count("*").alias("n"), F.max("val").alias("mx"),
                F.min("val").alias("mn"), F.avg("val").alias("av"),
            ])
            assert got == exp, (seed, epoch, got, exp)


def test_rollup_minmax_survives_schema_evolution_mid_range(spark, tmp_path):
    """int32->int64 widening mid-replay: extrema are STORED widened from
    the start, so the partial cells and finals stay schema-valid across
    the evolution and a fresh handle rebinds cleanly."""
    from bigquery_etl_fork_spark import datagen

    paths = datagen.write_dataset(
        str(tmp_path / "data"), n_docs=150, n_events=1200, n_epochs=4,
        seed=13, evolve_at_epoch=3,
    )
    base = spark.read.parquet(paths["base"])
    src = LakeTable.create(
        spark, str(tmp_path / "src"), base.schema, num_buckets=4,
        properties={"key_col": "doc_id"},
    )
    src.overwrite_all(base, key_col="doc_id")
    measures = {
        "n": ("count", None), "mx": ("max", "n_tok"),
        "mn": ("min", "n_tok"), "av": ("avg", "n_tok"),
    }
    mv = IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["source"],
        measures=measures,
    )
    mv.refresh()
    eng = CDCEngine(spark, src, key="doc_id", order="lsn")
    log = spark.read.parquet(paths["log"])
    for e in sorted(r["epoch"] for r in log.select("epoch").distinct().collect()):
        eng.apply_epoch(int(e), log.where(F.col("epoch") == int(e)).drop("epoch"))
        assert mv.refresh()["mode"] == "incremental"
        got = {
            r["source"]: (r["n"], r["mx"], r["mn"], r["av"])
            for r in mv.read().collect()
        }
        exp = {
            r["source"]: (r["n"], r["mx"], r["mn"], r["av"])
            for r in src.read(key_col="doc_id").groupBy("source").agg(
                F.count("*").alias("n"),
                F.max("n_tok").cast("long").alias("mx"),
                F.min("n_tok").cast("long").alias("mn"),
                F.avg("n_tok").alias("av"),
            ).collect()
        }
        assert got == exp, (e, got, exp)
    # post-evolution rebind validates cleanly
    mv2 = IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["source"],
        measures=measures,
    )
    assert mv2.refresh()["mode"] == "noop"


def test_rollup_avg_all_null_group_is_null(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "x", None)], "doc_id string, grp string, val long"
    )
    src = LakeTable.create(
        spark, str(tmp_path / "src"), df.schema, num_buckets=2,
        properties={"key_col": "doc_id"},
    )
    src.overwrite_all(df, key_col="doc_id")
    mv = IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["grp"],
        measures={"av": ("avg", "val"), "n": ("count", None)},
    )
    mv.refresh()
    r = mv.read().collect()[0]
    assert r["av"] is None and r["n"] == 1


def test_cow_merge_commits_are_change_feed_derivable(spark, tmp_path):
    """Round-4 feature: a copy-on-write merge commit attaches its resolved
    epoch delta as changelog sidecar files, so changes() derives the same
    feed a merge-on-read table yields — and an IncrementalRollup over a
    CoW source stays on the incremental path. Changelog files must be
    invisible to read()."""
    rows = [(f"d{i}", f"g{i % 3}", i) for i in range(40)]
    schema = "doc_id string, grp string, val long"

    def build(mode):
        df = spark.createDataFrame(rows, schema)
        t = LakeTable.create(
            spark, str(tmp_path / mode), df.schema, num_buckets=4,
            properties={"key_col": "doc_id"},
        )
        t.overwrite_all(df, key_col="doc_id")
        eng = CDCEngine(spark, t, key="doc_id", order="lsn",
                        storage_mode=mode, count_input=False)
        v0 = t.snapshot.version
        for e, delta in enumerate([
            [("d1", "g1", 100, 101, "U"), ("dx", "g9", 5, 102, "I"),
             ("d2", None, None, 103, "D")],
            [("d1", "g2", 200, 201, "U"), ("dx", None, None, 202, "D")],
        ], start=1):
            eng.apply_epoch(e, spark.createDataFrame(
                delta, "doc_id string, grp string, val long, lsn long, op string"))
        return t, v0

    tc, v0c = build("cow")
    tm, v0m = build("mor")

    def feed(t, v0):
        return {
            (r["doc_id"], r["op"], r["grp"], r["val"], r["lsn"])
            for r in t.changes(v0, key_col="doc_id").collect()
        }

    assert feed(tc, v0c) == feed(tm, v0m)  # CoW feed == MoR feed
    # changelog files are invisible to state reads
    state = {r["doc_id"]: (r["grp"], r["val"])
             for r in tc.read(key_col="doc_id").collect()}
    assert "d2" not in state and "dx" not in state and state["d1"] == ("g2", 200)
    # snapshot actually carries changelog-kind entries for the merge commits
    kinds = {f.get("kind", "base")
             for files in tc.snapshot.buckets.values() for f in files}
    assert "changelog" in kinds
    assert tc.snapshot.commit_op == "merge"

    # rollup over the CoW source: bootstrap full (overwrite commit), then
    # INCREMENTAL across the merge commits
    mv = IncrementalRollup(
        spark, tc, str(tmp_path / "mv_cow"), group_cols=["grp"],
        measures={"n": ("count", None), "total": ("sum", "val")},
    )
    assert mv.refresh()["mode"] == "full"
    eng = CDCEngine(spark, tc, key="doc_id", order="lsn",
                    storage_mode="cow", count_input=False)
    eng.apply_epoch(3, spark.createDataFrame(
        [("d5", "g0", 999, 301, "U")],
        "doc_id string, grp string, val long, lsn long, op string"))
    res = mv.refresh()
    assert res["mode"] == "incremental"
    got = {r["grp"]: (r["n"], r["total"]) for r in mv.read().collect()}
    exp = {r["grp"]: (r["n"], r["total"])
           for r in tc.read(key_col="doc_id").groupBy("grp")
           .agg(F.count("*").alias("n"), F.sum("val").alias("total")).collect()}
    assert got == exp

    # emit_changelog=False keeps the old non-derivable behavior
    df = spark.createDataFrame(rows, schema)
    t2 = LakeTable.create(
        spark, str(tmp_path / "cow_off"), df.schema, num_buckets=4,
        properties={"key_col": "doc_id"},
    )
    t2.overwrite_all(df, key_col="doc_id")
    v02 = t2.snapshot.version
    CDCEngine(spark, t2, key="doc_id", order="lsn", storage_mode="cow",
              count_input=False, emit_changelog=False).apply_epoch(
        1, spark.createDataFrame(
            [("d1", "g1", 100, 101, "U")],
            "doc_id string, grp string, val long, lsn long, op string"))
    with pytest.raises(ValueError, match="not\\s+derivable"):
        t2.changes(v02, key_col="doc_id")


def test_cow_changelog_survives_fold_compaction(spark, tmp_path):
    """The CoW merge's fold-compaction branch (frag threshold reached:
    clustering shuffle resets affected buckets) must still attach the
    epoch's changelog — the feed stays derivable whichever write path the
    epoch takes."""
    rows = [(f"d{i}", i) for i in range(20)]
    schema = "doc_id string, val long"

    def build(mode, **kw):
        df = spark.createDataFrame(rows, schema)
        t = LakeTable.create(
            spark, str(tmp_path / f"{mode}{len(kw)}"), df.schema, num_buckets=2,
            properties={"key_col": "doc_id"},
        )
        t.overwrite_all(df, key_col="doc_id")
        eng = CDCEngine(spark, t, key="doc_id", order="lsn",
                        storage_mode=mode, count_input=False, **kw)
        v0 = t.snapshot.version
        for e in range(1, 4):
            eng.apply_epoch(e, spark.createDataFrame(
                [(f"d{e}", 100 * e, 100 * e, "U"),
                 (f"x{e}", e, 100 * e + 1, "I")],
                "doc_id string, val long, lsn long, op string"))
        return t, v0

    # compact_files_per_bucket=1 forces the fold branch on every CoW epoch
    tc, v0c = build("cow", compact_files_per_bucket=1)
    tm, v0m = build("mor")
    feed = lambda t, v0: {
        (r["doc_id"], r["op"], r["val"], r["lsn"])
        for r in t.changes(v0, key_col="doc_id").collect()
    }
    assert feed(tc, v0c) == feed(tm, v0m)
    assert {r["doc_id"]: r["val"] for r in tc.read(key_col="doc_id").collect()} == \
           {r["doc_id"]: r["val"] for r in tm.read(key_col="doc_id").collect()}


def test_contamination_planted_ngrams(spark):
    """Planted overlap: a corpus doc embedding an eval example's 5-gram is
    flagged; clean docs are not; counts match hand-derivation."""
    from bigquery_etl_fork_spark.operators.dedup_text import (
        contaminated_docs,
        contamination_pairs,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # contains bench 5-gram
            (2, "totally unrelated words here nothing shared at all"),
            (3, "quick brown fox jumps over and more quick brown fox jumps over"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_shared_grams"], r["n_bench_examples"], r["contaminated"])
        for r in contaminated_docs(corpus, bench, n=5).collect()
    }
    assert out[1] == (1, 1, True)
    assert out[2] == (0, 0, False)
    assert out[3][0] >= 1 and out[3][2]
    pairs = {
        (r["doc_id"], r["bench_id"]): r["n_shared"]
        for r in contamination_pairs(corpus, bench, n=5).collect()
    }
    assert (1, 100) in pairs and (3, 100) in pairs and (2, 100) not in pairs


def test_png_decode_ground_truth_all_filters():
    """Pure-stdlib PNG codec (round 4 — removes the 'compressed codecs
    gated' caveat for PNG): encode known pixels under EVERY scanline filter
    type (0-4 incl. Paeth), decode, and require the exact pixel mean. The
    same image under different filter choices must decode identically."""
    import numpy as np

    from bigquery_etl_fork_spark.operators.multimodal import (
        _parse_png,
        synth_png,
    )

    for channels in (1, 2, 3, 4):
        for seed in (0, 7):
            rng = np.random.default_rng(seed)
            w, h = 23, 17
            px = rng.integers(0, 256, size=(h, w * channels), dtype=np.uint8)
            expected = float(px.mean())
            mixed = [(i * 3 + seed) % 5 for i in range(h)]  # hits 0..4
            for filters in ([0] * h, [1] * h, [2] * h, [3] * h, [4] * h, mixed):
                blob = synth_png(w, h, channels, seed=seed, filters=filters)
                gw, gh, gc, mean, ok = _parse_png(blob)
                assert (gw, gh, gc, ok) == (w, h, channels, True)
                assert mean == expected, (channels, seed, filters[:3])


def test_png_decode_through_spark_pipeline(spark):
    """PNG blobs flow through the same mapInPandas decode as netpbm/WAV."""
    from bigquery_etl_fork_spark.operators.multimodal import (
        decode_media,
        synth_png,
        synth_netpbm,
    )

    rows = [
        (0, "image", bytearray(synth_png(8, 6, 3, seed=1)), None),
        (1, "image", bytearray(synth_png(5, 5, 1, seed=2)), None),
        (2, "image", bytearray(synth_netpbm(4, 4, 3, seed=3)), None),
        (3, "image", bytearray(b"\xff\xd8\xff\xe0JFIF-stub"), None),  # JPEG: stays gated
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, media binary, "
        "meta struct<width:int,height:int,channels:int,n_bytes:bigint>",
    )
    got = {r["media_id"]: r for r in decode_media(df).collect()}
    assert got[0]["ok"] and (got[0]["width"], got[0]["height"], got[0]["channels"]) == (8, 6, 3)
    assert got[1]["ok"] and got[1]["channels"] == 1
    assert got[2]["ok"]
    assert not got[3]["ok"]  # entropy-coded without Pillow: honest failure


def test_rollup_rebind_with_changed_measures_raises(spark, tmp_path):
    """ADVICE r3 (low): re-instantiating over an existing target with
    different measures must fail loudly, not misbind."""
    df = spark.createDataFrame([("a", "x", 1)], "doc_id string, grp string, val long")
    src = LakeTable.create(
        spark, str(tmp_path / "src"), df.schema, num_buckets=2,
        properties={"key_col": "doc_id"},
    )
    src.overwrite_all(df, key_col="doc_id")
    IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["grp"],
        measures={"n": ("count", None)},
    )
    with pytest.raises(ValueError, match="does not match"):
        IncrementalRollup(
            spark, src, str(tmp_path / "mv"), group_cols=["grp"],
            measures={"n": ("count", None), "total": ("sum", "val")},
        )
    # same spec re-binds fine
    IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["grp"],
        measures={"n": ("count", None)},
    )
