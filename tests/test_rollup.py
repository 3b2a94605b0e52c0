"""IncrementalRollup: change-feed-driven materialized aggregate maintenance."""

import os

import pytest
from pyspark.sql import functions as F

from bigquery_etl_fork_spark import datagen
from bigquery_etl_fork_spark.engine import CDCEngine, IncrementalRollup
from bigquery_etl_fork_spark.lake import LakeTable


def _mk_source(spark, tmp_path, rows, schema="doc_id string, grp string, val long"):
    df = spark.createDataFrame(rows, schema)
    t = LakeTable.create(
        spark, str(tmp_path / "src"), df.schema, num_buckets=4,
        properties={"key_col": "doc_id"},
    )
    t.overwrite_all(df, key_col="doc_id")
    return t


def _mk_rollup(spark, src, tmp_path):
    return IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["grp"],
        measures={"n": ("count", None), "total": ("sum", "val")},
    )


def _expected(src):
    return {
        r["grp"]: (r["n"], r["total"])
        for r in src.read()
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("val").alias("total"))
        .collect()
    }


def _got(mv):
    return {r["grp"]: (r["n"], r["total"]) for r in mv.read().collect()}


def _apply(spark, src, rows, lsn_start, schema="doc_id string, grp string, val long, lsn long, op string"):
    delta = spark.createDataFrame(rows, schema)
    eng = CDCEngine(spark, src, key="doc_id", order="lsn", count_input=False)
    eng.apply_epoch(lsn_start, delta)


def test_rollup_tracks_upserts_deletes_and_group_moves(spark, tmp_path):
    src = _mk_source(
        spark, tmp_path,
        [("a", "x", 10), ("b", "x", 20), ("c", "y", 30)],
    )
    mv = _mk_rollup(spark, src, tmp_path)
    assert mv.refresh()["mode"] == "full"  # bootstrap over an overwrite commit
    assert _got(mv) == _expected(src) == {"x": (2, 30), "y": (1, 60 - 30)}

    # epoch 1: update a's value, move b from x to y, insert d, delete c
    _apply(spark, src, [
        ("a", "x", 11, 101, "U"),
        ("b", "y", 20, 102, "U"),
        ("d", "z", 5, 103, "I"),
        ("c", None, None, 104, "D"),
    ], 1)
    res = mv.refresh()
    assert res["mode"] == "incremental"
    assert _got(mv) == _expected(src) == {"x": (1, 11), "y": (1, 20), "z": (1, 5)}

    # epoch 2: group z disappears entirely (its only row deleted)
    _apply(spark, src, [("d", None, None, 201, "D")], 2)
    mv.refresh()
    got = _got(mv)
    assert "z" not in got
    assert got == _expected(src)


def test_rollup_refresh_is_idempotent_and_fenced(spark, tmp_path):
    src = _mk_source(spark, tmp_path, [("a", "x", 1)])
    mv = _mk_rollup(spark, src, tmp_path)
    mv.refresh()
    v = mv.target.snapshot.version
    assert mv.refresh()["mode"] == "noop"  # same source version: no commit
    assert mv.target.snapshot.version == v

    _apply(spark, src, [("b", "x", 2, 11, "I")], 1)
    mv.refresh()
    assert _got(mv) == {"x": (2, 3)}
    assert mv.refresh()["mode"] == "noop"
    assert _got(mv) == {"x": (2, 3)}


def test_rollup_crash_between_source_commit_and_refresh(spark, tmp_path):
    """A refresh that never ran (crash) is simply re-run: the version
    pointer moves atomically with the data, so the closed range replays."""
    src = _mk_source(spark, tmp_path, [("a", "x", 1)])
    mv = _mk_rollup(spark, src, tmp_path)
    mv.refresh()
    _apply(spark, src, [("b", "y", 7, 11, "I")], 1)
    _apply(spark, src, [("c", "y", 9, 21, "I")], 2)
    # "crash": a new rollup handle (fresh process analog) picks up both
    mv2 = IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["grp"],
        measures={"n": ("count", None), "total": ("sum", "val")},
    )
    assert mv2.last_source_version < src.snapshot.version
    mv2.refresh()
    assert _got(mv2) == _expected(src)


def test_rollup_zero_net_delta_still_advances_fence(spark, tmp_path):
    """An epoch whose changes cancel out group-wise (same group, same
    values) must still move the version pointer, or the closed range would
    be re-walked on every refresh forever."""
    src = _mk_source(spark, tmp_path, [("a", "x", 5)])
    mv = _mk_rollup(spark, src, tmp_path)
    mv.refresh()
    _apply(spark, src, [("a", "x", 5, 11, "U")], 1)  # value-identical rewrite
    res = mv.refresh()
    assert res["mode"] == "incremental" and res["groups_touched"] == 0
    assert mv.last_source_version == src.snapshot.version
    assert mv.refresh()["mode"] == "noop"
    assert _got(mv) == {"x": (1, 5)}


def test_rollup_full_fallback_after_out_of_band_rewrite(spark, tmp_path):
    src = _mk_source(spark, tmp_path, [("a", "x", 1), ("b", "y", 2)])
    mv = _mk_rollup(spark, src, tmp_path)
    mv.refresh()
    # out-of-band rewrite: change feed is not derivable across an overwrite
    df = spark.createDataFrame([("z", "w", 100)], "doc_id string, grp string, val long")
    src.overwrite_all(df, key_col="doc_id")
    res = mv.refresh()
    assert res["mode"] == "full"
    assert _got(mv) == {"w": (1, 100)}


def test_rollup_full_fallback_after_snapshot_expiry(spark, tmp_path):
    """expire_snapshots dropping the refresh range must degrade to a full
    recompute, not crash the refresh. Since round 6 the rollup registers a
    consumer watermark that FENCES default expiry (see
    test_round6_fixes.py), so forcing the range away requires the explicit
    respect_consumers=False override — the fallback stays as the safety
    net under deliberate/legacy maintenance."""
    src = _mk_source(spark, tmp_path, [("a", "x", 1)])
    mv = _mk_rollup(spark, src, tmp_path)
    mv.refresh()
    for i in range(3):
        _apply(spark, src, [(f"k{i}", "y", 10 + i, 100 + i, "I")], i + 1)
    src.expire_snapshots(keep_last=1, respect_consumers=False)
    res = mv.refresh()
    assert res["mode"] == "full"
    assert _got(mv) == _expected(src)


def test_rollup_retract_read_is_bucket_pruned(spark, tmp_path):
    """Changing keys in few buckets must scan few source buckets — the
    O(changed keys) refresh claim, asserted via the refresh report."""
    rows = [(f"d{i}", "g", i) for i in range(64)]
    src = _mk_source(spark, tmp_path, rows)  # 4 source buckets
    mv = _mk_rollup(spark, src, tmp_path)
    mv.refresh()
    _apply(spark, src, [("d0", "g", 999, 11, "U")], 1)  # one key
    res = mv.refresh()
    assert res["mode"] == "incremental"
    assert res["src_buckets_scanned"] == 1 and res["src_buckets_total"] == 4
    assert _got(mv) == _expected(src)


def test_rollup_survives_schema_evolution_mid_range(spark, tmp_path):
    """The retract side reads the PRE-evolution snapshot (old schema, e.g.
    int32 n_tok) while the add side carries the evolved schema (int64);
    the maintained rollup must still equal a fresh GROUP BY."""
    paths = datagen.write_dataset(
        str(tmp_path / "data"), n_docs=200, n_events=1600, n_epochs=4,
        seed=9, evolve_at_epoch=3,
    )
    base = spark.read.parquet(paths["base"])
    src = LakeTable.create(
        spark, str(tmp_path / "src"), base.schema, num_buckets=4,
        properties={"key_col": "doc_id"},
    )
    src.overwrite_all(base, key_col="doc_id")
    mv = IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["source"],
        measures={"n": ("count", None), "tok": ("sum", "n_tok")},
    )
    mv.refresh()
    eng = CDCEngine(spark, src, key="doc_id", order="lsn")
    log = spark.read.parquet(paths["log"])
    for e in sorted(r["epoch"] for r in log.select("epoch").distinct().collect()):
        eng.apply_epoch(int(e), log.where(F.col("epoch") == int(e)).drop("epoch"))
        assert mv.refresh()["mode"] == "incremental"
        want = {
            r["source"]: (r["n"], r["tok"])
            for r in src.read().groupBy("source")
            .agg(F.count("*").alias("n"), F.sum("n_tok").alias("tok")).collect()
        }
        got = {r["source"]: (r["n"], r["tok"]) for r in mv.read().collect()}
        assert got == want, f"divergence after epoch {e}"


def test_rollup_matches_groupby_across_datagen_epochs(spark, tmp_path):
    """Multi-epoch CDC replay with hot keys, inserts, deletes: after every
    epoch the incrementally-maintained rollup equals a fresh GROUP BY."""
    paths = datagen.write_dataset(
        str(tmp_path / "data"), n_docs=300, n_events=2400, n_epochs=4, seed=5
    )
    base = spark.read.parquet(paths["base"])
    src = LakeTable.create(
        spark, str(tmp_path / "src"), base.schema, num_buckets=8,
        properties={"key_col": "doc_id"},
    )
    src.overwrite_all(base, key_col="doc_id")
    mv = IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["source"],
        measures={"n_docs": ("count", None), "total_tok": ("sum", "n_tok")},
    )
    mv.refresh()
    eng = CDCEngine(spark, src, key="doc_id", order="lsn")
    log = spark.read.parquet(paths["log"])
    for e in sorted(r["epoch"] for r in log.select("epoch").distinct().collect()):
        eng.apply_epoch(int(e), log.where(F.col("epoch") == int(e)).drop("epoch"))
        res = mv.refresh()
        assert res["mode"] == "incremental", res
        want = {
            r["source"]: (r["n_docs"], r["total_tok"])
            for r in src.read()
            .groupBy("source")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_tok").alias("total_tok"),
            )
            .collect()
        }
        got = {r["source"]: (r["n_docs"], r["total_tok"]) for r in mv.read().collect()}
        assert got == want, f"divergence after epoch {e}"


def test_rollup_all_null_measure_stores_zero_documented(spark, tmp_path):
    """Documented divergence: an all-null-measure group stores sum 0 (the
    additive identity), not NULL; counts still include the rows."""
    src = _mk_source(spark, tmp_path, [("a", "x", None), ("b", "x", None)])
    mv = _mk_rollup(spark, src, tmp_path)
    mv.refresh()
    _apply(spark, src, [("c", "x", None, 11, "I")], 1)
    mv.refresh()
    got = _got(mv)
    assert got == {"x": (3, 0)}


def test_rollup_concurrent_refresh_loses_cleanly(spark, tmp_path):
    """Two racing refreshes of the same range: one commits; the other's
    stale handle re-reads the winner's version pointer on refresh() and
    no-ops instead of double-applying (conflict-aware refresh, round 4 —
    the version fence makes every closed range fold exactly once)."""
    from bigquery_etl_fork_spark.engine import IncrementalRollup

    src = _mk_source(spark, tmp_path, [("a", "x", 1)])
    mv1 = _mk_rollup(spark, src, tmp_path)
    mv1.refresh()
    _apply(spark, src, [("b", "y", 2, 11, "I")], 1)
    # a second handle that has NOT observed mv1's upcoming commit
    mv2 = IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["grp"],
        measures={"n": ("count", None), "total": ("sum", "val")},
    )
    mv1.refresh()
    assert mv2.refresh()["mode"] == "noop"  # fenced: range already folded
    assert _got(mv2) == _expected(src)
    # a fresh handle agrees
    mv3 = IncrementalRollup(
        spark, src, str(tmp_path / "mv"), group_cols=["grp"],
        measures={"n": ("count", None), "total": ("sum", "val")},
    )
    assert mv3.refresh()["mode"] == "noop"
    assert _got(mv3) == _expected(src)


def test_rollup_property_random_op_sequences(spark, tmp_path):
    """Property-style sweep: random I/U/D sequences across random groups;
    after every epoch the maintained rollup equals a fresh GROUP BY."""
    import random as _random

    for seed in (0, 1, 2, 3):
        rng = _random.Random(seed)
        root = tmp_path / f"p{seed}"
        src = _mk_source(
            spark, root,
            [(f"d{i}", f"g{rng.randrange(3)}", rng.randrange(100)) for i in range(20)],
        )
        mv = _mk_rollup(spark, src, root)
        mv.refresh()
        lsn = 100
        live = {f"d{i}" for i in range(20)}
        for epoch in range(1, 4):
            rows = []
            for _ in range(rng.randrange(1, 8)):
                lsn += 1
                r = rng.random()
                if r < 0.25 and live:
                    k = rng.choice(sorted(live))
                    live.discard(k)
                    rows.append((k, None, None, lsn, "D"))
                elif r < 0.5:
                    k = f"n{lsn}"
                    live.add(k)
                    rows.append((k, f"g{rng.randrange(3)}", rng.randrange(100), lsn, "I"))
                else:
                    k = rng.choice(sorted(live)) if live else f"n{lsn}"
                    live.add(k)
                    rows.append((k, f"g{rng.randrange(3)}", rng.randrange(100), lsn, "U"))
            _apply(spark, src, rows, epoch)
            mv.refresh()
            assert _got(mv) == _expected(src), f"seed {seed} epoch {epoch}"


def test_rollup_derived_group_cols_track_changes(spark, tmp_path):
    """Round 6: ``derived`` GROUP BY expressions (histogram bins) must
    retract/add correctly as values move BETWEEN bins — an update that
    changes val also changes the derived group, so the retract hits the
    old bin and the add hits the new one. Compared against a flat
    GROUP BY over the evolving state after every epoch."""
    src = _mk_source(
        spark, tmp_path,
        [("d1", "a", 5), ("d2", "a", 25), ("d3", "b", 12), ("d4", "b", 33)],
    )
    mv = IncrementalRollup(
        spark, src, str(tmp_path / "mvd"),
        group_cols=["grp", "bin"],
        derived={"bin": "val div 10"},
        measures={"n": ("count", None), "total": ("sum", "val")},
    )

    def expected():
        return {
            (r["grp"], r["bin"]): (r["n"], r["total"])
            for r in src.read()
            .withColumn("bin", F.expr("val div 10"))
            .groupBy("grp", "bin")
            .agg(F.count("*").alias("n"), F.sum("val").alias("total"))
            .collect()
        }

    def got():
        return {
            (r["grp"], r["bin"]): (r["n"], r["total"])
            for r in mv.read().collect()
        }

    mv.refresh()
    assert got() == expected()
    # epoch 1: d1 moves bins (5 -> 17), d3 deleted, new d5 lands in a:3
    _apply(spark, src, [("d1", "a", 17, 10, "U"), ("d3", "b", 0, 11, "D"),
                        ("d5", "a", 31, 12, "I")], 1)
    mv.refresh()
    assert got() == expected()
    # epoch 2: d5 changes group AND bin; d2 value-only within same bin
    _apply(spark, src, [("d5", "b", 9, 20, "U"), ("d2", "a", 27, 21, "U")], 2)
    mv.refresh()
    assert got() == expected()


def test_rollup_derived_with_extrema_and_collision_guard(spark, tmp_path):
    src = _mk_source(spark, tmp_path, [("d1", "a", 5), ("d2", "a", 25)])
    with pytest.raises(ValueError, match="collide"):
        IncrementalRollup(
            spark, src, str(tmp_path / "bad"),
            group_cols=["grp"], derived={"val": "val + 1"},
            measures={"n": ("count", None)},
        )
    # extrema path: partials keyed by (grp, derived bin) recompute cells
    mv = IncrementalRollup(
        spark, src, str(tmp_path / "mve"),
        group_cols=["grp", "bin"],
        derived={"bin": "val div 10"},
        measures={"hi": ("max", "val"), "lo": ("min", "val")},
    )
    mv.refresh()
    _apply(spark, src, [("d1", "a", 22, 10, "U"), ("d3", "a", 7, 11, "I")], 1)
    mv.refresh()
    got = {(r["grp"], r["bin"]): (r["hi"], r["lo"]) for r in mv.read().collect()}
    assert got == {("a", 2): (25, 22), ("a", 0): (7, 7)}
