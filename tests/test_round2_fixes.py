"""Round-2 hardening: change-feed completeness across compaction, JVM as-of
join, broadcast gating, tie-break consistency, df-capped jaccard, streaming
epoch fencing, partition-filter guard, metadata checks."""

import shutil

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bigquery_etl_fork_spark import datagen
from bigquery_etl_fork_spark.engine import CDCEngine
from bigquery_etl_fork_spark.engine import checks as C
from bigquery_etl_fork_spark.lake import LakeTable, bucket_id
from bigquery_etl_fork_spark.operators.asof import asof_join
from bigquery_etl_fork_spark.operators.dedup_lww import (
    lww_dedup,
    lww_dedup_bucket_clustered,
    lww_dedup_salted,
)
from bigquery_etl_fork_spark.operators.dedup_text import ngram_jaccard_pairs
from bigquery_etl_fork_spark.operators.merge import merge_delta_clustered

from .oracle import assert_states_equal, replay_oracle


# ---------------- change feed completeness across compaction ----------------


def test_change_feed_survives_compaction_in_range(spark, tmp_path):
    """THE round-1 feed bug: deltas committed then compacted inside
    (from, to] must still appear in the CDC-out feed (walked from the
    historical snapshots that added them)."""
    base = datagen.base_table(n_docs=80, seed=31)
    log = datagen.change_log(n_docs=80, n_events=600, n_epochs=6, seed=32, dup_frac=0)
    d = tmp_path / "cfc"
    d.mkdir()
    pq.write_table(base, str(d / "base.parquet"))
    pq.write_table(log, str(d / "log.parquet"))
    base_df = spark.read.parquet(str(d / "base.parquet"))
    t = LakeTable.create(spark, str(tmp_path / "t"), base_df.schema, num_buckets=2)
    t.overwrite_all(base_df, key_col="doc_id")
    v0 = t.snapshot.version
    # compact aggressively so the feed range is guaranteed to contain
    # compaction commits that removed earlier delta files
    eng = CDCEngine(spark, t, count_input=False, compact_files_per_bucket=2)
    eng.replay(spark.read.parquet(str(d / "log.parquet")))
    v_end = t.snapshot.version
    assert any(
        s.commit_op == "compact" for s in t.history() if v0 < s.version <= v_end
    ), "scenario must actually compact mid-range"

    feed = t.changes(v0, v_end).toPandas()
    lp = log.to_pandas().sort_values("lsn")
    last = lp.drop_duplicates("doc_id", keep="last").set_index("doc_id")
    assert set(feed["doc_id"]) == set(last.index)
    for _, r in feed.iterrows():
        truth = last.loc[r["doc_id"]]
        assert r["lsn"] == truth["lsn"]
        assert (r["op"] == "D") == (truth["op"] == "D")


# ---------------- as-of join: jvm mode == pandas mode ----------------


def test_asof_jvm_equals_pandas(spark, sf_dir="/root/testdata/sf0.001"):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), F.col("ts").alias("p_ts")
    )
    right = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("c_ts"))
        .agg(F.max("event_id").alias("click_id"))
    )
    kw = dict(key="user_id", left_ts="p_ts", right_ts="c_ts",
              right_cols=["click_id", "c_ts"])
    a = asof_join(left, right, mode="jvm", **kw).toPandas()
    b = asof_join(left, right, mode="pandas", **kw).toPandas()
    a = a.sort_values(["user_id", "pid"]).reset_index(drop=True)
    b = b.sort_values(["user_id", "pid"]).reset_index(drop=True)
    assert a.shape == b.shape and len(a) > 0
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        assert all(
            (x == y) or (x != x and y != y) for x, y in zip(av, bv)
        ), f"column {col} differs between jvm and pandas as-of modes"


def test_asof_jvm_plan_has_no_python(spark):
    left = spark.range(10).select(
        F.lit("k").alias("k"), F.col("id").alias("lts"), F.col("id").alias("v")
    )
    right = spark.range(5).select(
        F.lit("k").alias("k"), (F.col("id") * 2).alias("rts"), F.col("id").alias("rv")
    )
    plan = asof_join(left, right, "k", "lts", "rts", ["rv"])._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" not in plan and "ArrowEvalPython" not in plan


# ---------------- CoW merge broadcast gating ----------------


def _mini_state(spark):
    cur = spark.range(100).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"), F.col("id").alias("x")
    )
    delta = spark.range(10).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        (F.col("id") + 1000).alias("x"),
        F.lit("U").alias("op"),
    )
    return cur, delta


def test_merge_broadcast_gate_plans(spark):
    cur, delta = _mini_state(spark)
    kw = dict(
        bucket_expr=lambda c: bucket_id(c, 4),
        bucket_col="_b",
        key="doc_id",
        payload_cols=["doc_id", "x"],
    )
    # disable size-based auto-broadcast so the plans reflect only the hint
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        on = merge_delta_clustered(cur, delta, broadcast_keys=True, **kw)
        off = merge_delta_clustered(cur, delta, broadcast_keys=False, **kw)
        plan_on = on._jdf.queryExecution().executedPlan().toString()
        plan_off = off._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" in plan_on
    assert "BroadcastHashJoin" not in plan_off, (
        "broadcast_keys=False must not force a broadcast (huge deltas would "
        "hit Spark's hard broadcast limits)"
    )


def test_merge_gated_results_equal(spark):
    cur, delta = _mini_state(spark)
    kw = dict(
        bucket_expr=lambda c: bucket_id(c, 4),
        bucket_col="_b",
        key="doc_id",
        payload_cols=["doc_id", "x"],
    )
    a = merge_delta_clustered(cur, delta, broadcast_keys=True, **kw)
    b = merge_delta_clustered(cur, delta, broadcast_keys=False, **kw)
    ap = a.toPandas().sort_values("doc_id").reset_index(drop=True)
    bp = b.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert ap[["doc_id", "x"]].equals(bp[["doc_id", "x"]])
    assert len(ap) == 100 and ap.set_index("doc_id").loc["d3", "x"] == 1003


# ---------------- same-LSN tie-break consistent across strategies ----------


def test_lww_tie_break_consistent(spark):
    # corrupt-log shape: same (key, lsn) carries both an upsert and a delete
    rows = [
        ("a", 1, "U", 10),
        ("a", 1, "D", 0),
        ("b", 2, "D", 0),
        ("b", 2, "U", 20),
        ("c", 3, "U", 30),
    ]
    df = spark.createDataFrame(rows, "doc_id string, lsn long, op string, x long")

    def got(out):
        return {
            r["doc_id"]: (r["op"], r["x"])
            for r in out.collect()
        }

    expected = {"a": ("U", 10), "b": ("U", 20), "c": ("U", 30)}  # U beats D
    assert got(lww_dedup(df, mode="jvm")) == expected
    assert got(lww_dedup(df, mode="grouped", tie_cols=["op"])) == expected
    assert got(lww_dedup(df, mode="partition", tie_cols=["op"])) == expected
    assert got(lww_dedup_salted(df)) == expected
    bc = lww_dedup_bucket_clustered(df, lambda c: bucket_id(c, 4), "_b").drop("_b")
    assert got(bc) == expected


# ---------------- df-capped n-gram jaccard ----------------


def test_ngram_jaccard_df_cap_bounds_pairs(spark):
    # 40 docs all sharing one ubiquitous shingle; only two real near-dups
    docs = [(i, f"common boiler plate unique{i} token{i} tail{i}") for i in range(40)]
    docs += [(100, "alpha beta gamma delta epsilon"), (101, "alpha beta gamma delta zeta")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uncapped = ngram_jaccard_pairs(df, threshold=0.0)
    capped = ngram_jaccard_pairs(df, threshold=0.0, max_df=5)
    n_un, n_cap = uncapped.count(), capped.count()
    assert n_un >= 40 * 39 / 2  # the boilerplate shingle explodes quadratically
    assert n_cap < 10  # cap kills the ubiquitous shingle's fan-out
    # the genuine near-dup pair survives the cap
    assert capped.where(
        (F.col("doc_a") == 100) & (F.col("doc_b") == 101)
    ).count() == 1


# ---------------- streaming: epoch files split across micro-batches --------


def test_stream_changelog_split_epoch_batches(spark, tmp_path):
    from bigquery_etl_fork_spark.streaming.micro_batch import stream_changelog

    base = datagen.base_table(n_docs=120, seed=51)
    log = datagen.change_log(n_docs=120, n_events=900, n_epochs=3, seed=52)
    d = tmp_path / "sp"
    d.mkdir()
    pq.write_table(base, str(d / "base.parquet"))
    # two writes -> two files per epoch dir, so maxFilesPerTrigger=1 is
    # guaranteed to split every epoch across micro-batches
    lp = log.to_pandas()
    import pyarrow as pa

    for half in (lp.iloc[::2], lp.iloc[1::2]):
        pq.write_to_dataset(
            pa.Table.from_pandas(half, preserve_index=False, schema=log.schema),
            str(d / "log"),
            partition_cols=["epoch"],
        )
    base_df = spark.read.parquet(str(d / "base.parquet"))
    t = LakeTable.create(spark, str(tmp_path / "t"), base_df.schema, num_buckets=4)
    t.overwrite_all(base_df, key_col="doc_id")
    eng = CDCEngine(spark, t, count_input=False)
    q = stream_changelog(
        eng,
        str(d / "log"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    assert t.snapshot.properties["epoch_watermark"] == 3
    assert_states_equal(t.read().toPandas(), replay_oracle(base, log))


def test_discover_epochs_complete_marker(tmp_path):
    from bigquery_etl_fork_spark.streaming.micro_batch import discover_epochs

    for e in (1, 2, 3):
        (tmp_path / f"epoch={e}").mkdir()
    (tmp_path / "epoch=1" / "_SUCCESS").touch()
    (tmp_path / "epoch=2" / "_SUCCESS").touch()
    assert discover_epochs(str(tmp_path)) == [1, 2, 3]
    assert discover_epochs(str(tmp_path), "_SUCCESS") == [1, 2]


# ---------------- misc guards ----------------


def test_require_partition_filter(spark, tmp_path):
    df = spark.createDataFrame([("a", 1)], "doc_id string, x long")
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        df.schema,
        num_buckets=4,
        properties={"require_partition_filter": True},
    )
    t.overwrite_all(df, key_col="doc_id")
    with pytest.raises(ValueError, match="bucket filter"):
        t.read()
    assert t.read(list(range(4))).count() == 1


def test_num_buckets_autosize(spark, tmp_path):
    df = spark.createDataFrame([("a", 1)], "doc_id string, x long")
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema, num_buckets=None)
    par = spark.sparkContext.defaultParallelism
    assert t.num_buckets >= max(64, 4 * par)
    assert t.num_buckets & (t.num_buckets - 1) == 0  # power of two


def test_row_count_drift_check(spark, tmp_path):
    base = datagen.base_table(n_docs=60, seed=61)
    log = datagen.change_log(n_docs=60, n_events=800, n_epochs=8, seed=62)
    d = tmp_path / "dr"
    d.mkdir()
    pq.write_table(base, str(d / "base.parquet"))
    pq.write_table(log, str(d / "log.parquet"))
    base_df = spark.read.parquet(str(d / "base.parquet"))
    t = LakeTable.create(spark, str(tmp_path / "t"), base_df.schema, num_buckets=4)
    t.overwrite_all(base_df, key_col="doc_id")
    CDCEngine(spark, t, count_input=False).replay(
        spark.read.parquet(str(d / "log.parquet"))
    )
    # uniform synthetic epochs: newest should sit within 25% of the past avg
    rep = C.row_count_within_past_partitions_avg(t, num_past=5, threshold_pct=25.0)
    assert rep.results[0]["violations"] == 0
    # an absurd threshold flags it
    rep2 = C.row_count_within_past_partitions_avg(t, num_past=5, threshold_pct=0.0)
    assert rep2.results[0]["violations"] in (0, 1)  # 0 only if exactly average


def test_promote_survives_staging_deletion(spark, tmp_path):
    base = datagen.base_table(n_docs=50, seed=71)
    d = tmp_path / "pr"
    d.mkdir()
    pq.write_table(base, str(d / "base.parquet"))
    base_df = spark.read.parquet(str(d / "base.parquet"))
    prod = LakeTable.create(spark, str(tmp_path / "prod"), base_df.schema, num_buckets=4)
    prod.overwrite_all(base_df, key_col="doc_id")
    staging = prod.clone_at(str(tmp_path / "staging"))
    extra = base_df.withColumn("n_tok", F.col("n_tok") + 1)
    staging.overwrite_all(extra, key_col="doc_id")
    prod.promote_from(staging)
    # the natural post-promote cleanup must not corrupt the promoted table
    shutil.rmtree(str(tmp_path / "staging"))
    got = prod.read().toPandas()
    assert len(got) == 50
    exp = base.to_pandas()
    assert sorted(got["n_tok"]) == sorted(exp["n_tok"] + 1)


def test_bootstrap_seed_is_hashseed_independent(spark):
    """The group seed must come from crc32, not PYTHONHASHSEED-randomized
    hash(): mirror the kernel's numpy path and assert the Spark result
    matches it exactly."""
    import zlib

    import numpy as np

    from bigquery_etl_fork_spark.operators.stats import bootstrap_percentile_ci

    rows = [("g1", float(v)) for v in range(40)] + [("g2", float(v * 3)) for v in range(25)]
    df = spark.createDataFrame(rows, "grp string, v double")
    got = {
        r["grp"]: (r["point"], r["ci_low"], r["ci_high"])
        for r in bootstrap_percentile_ci(df, ["grp"], "v", n_boot=50, seed=13).collect()
    }
    for grp, vals in (("g1", np.arange(40.0)), ("g2", np.arange(25.0) * 3)):
        gseed = (13 + zlib.crc32(str(grp).encode("utf-8"))) % (2**32)
        rng = np.random.default_rng(gseed)
        idx = rng.integers(0, len(vals), size=(50, len(vals)))
        stats = np.quantile(vals[idx], 0.5, axis=1)
        exp = (
            round(float(np.quantile(vals, 0.5)), 4),
            round(float(np.quantile(stats, 0.025)), 4),
            round(float(np.quantile(stats, 0.975)), 4),
        )
        assert got[grp] == exp


def test_event_code_points_round_trip(spark):
    from bigquery_etl_fork_spark import functions as UF

    df = spark.createDataFrame(
        [([72, 105, 33],), ([97],), ([],)], "cps array<int>"
    )
    got = [r[0] for r in df.select(UF.event_code_points_to_string(F.col("cps"))).collect()]
    assert got == ["Hi!", "a", ""]


def test_ivf_assign_modes_agree(spark):
    from bigquery_etl_fork_spark.operators.similarity import ivf_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cols = emb.columns
    id_col = "vec_id" if "vec_id" in cols else cols[0]
    vec_col = "embedding" if "embedding" in cols else cols[1]
    a, ca = ivf_assign(emb, id_col, vec_col, n_cells=8, assign_mode="expr")
    b, cb = ivf_assign(emb, id_col, vec_col, n_cells=8, assign_mode="pandas")
    assert ca == cb
    pa_ = a.select(id_col, "cell").toPandas().set_index(id_col)["cell"]
    pb_ = b.select(id_col, "cell").toPandas().set_index(id_col)["cell"]
    assert pa_.sort_index().tolist() == pb_.sort_index().tolist()


def test_minhash_xxhash64_mode(spark):
    from bigquery_etl_fork_spark.operators.dedup_text import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
        (3, "the quick brown fox jumps over a sleepy dog"),  # near dup
        (4, "completely different text about spark engines here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = minhash_signatures(df, hash_mode="xxhash64")
    assert dict(sigs.dtypes)["h0"] == "bigint"  # 8-byte ints, not hex strings
    pairs = minhash_lsh_pairs(df, hash_mode="xxhash64").toPandas()
    got = {(r.doc_a, r.doc_b): r.est_jaccard for r in pairs.itertuples()}
    assert got.get((1, 2)) == 1.0  # exact dup: all 16 minhashes equal
    assert (1, 4) not in got and (2, 4) not in got
    # mode equivalence on exact duplicates regardless of hash family
    md5_pairs = minhash_lsh_pairs(df, hash_mode="md5hex").toPandas()
    md5_got = {(r.doc_a, r.doc_b): r.est_jaccard for r in md5_pairs.itertuples()}
    assert md5_got.get((1, 2)) == 1.0


def test_real_format_media_decode(spark):
    import numpy as np
    import struct as _struct

    from bigquery_etl_fork_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        synth_netpbm,
        synth_real_media_table,
        synth_wav,
    )

    tbl = synth_real_media_table(n=24, seed=17)
    df = spark.createDataFrame(tbl.to_pandas(), schema=MEDIA_SCHEMA)
    out = decode_media(df).toPandas().set_index("media_id").sort_index()
    meta = tbl.to_pandas().set_index("media_id").sort_index()
    assert out["ok"].all(), "every real-format blob must decode"
    for i in out.index:
        assert out.loc[i, "width"] == meta.loc[i, "meta"]["width"]
        assert out.loc[i, "channels"] == meta.loc[i, "meta"]["channels"]
    # ground-truth pixel mean for one netpbm blob, computed independently
    blob = synth_netpbm(8, 4, 3, seed=99)
    px = np.frombuffer(blob, dtype=np.uint8, offset=len(blob) - 8 * 4 * 3)
    df1 = spark.createDataFrame(
        [(0, "image", bytearray(blob), (8, 4, 3, len(blob)))], schema=MEDIA_SCHEMA
    )
    got = decode_media(df1).collect()[0]
    assert (got["width"], got["height"], got["channels"]) == (8, 4, 3)
    assert abs(got["mean_intensity"] - round(float(px.mean()), 4)) < 1e-9
    # ground-truth amplitude for one wav blob
    wav = synth_wav(100, rate=8000, channels=2, seed=5)
    x = np.frombuffer(wav[-400:], dtype="<i2").astype(float) / 32768.0
    dfw = spark.createDataFrame(
        [(0, "audio", bytearray(wav), (100, 8000, 2, len(wav)))], schema=MEDIA_SCHEMA
    )
    gw = decode_media(dfw).collect()[0]
    assert (gw["width"], gw["height"], gw["channels"]) == (100, 8000, 2)
    assert abs(gw["mean_intensity"] - round(float(np.abs(x).mean()), 4)) < 1e-9


def test_mor_dedup_strategies_equal(spark, tmp_path):
    """window / maxby / auto MoR dedup strategies produce identical state."""
    base = datagen.base_table(n_docs=100, seed=81)
    # high multiplicity: 3000 events over 100 docs -> auto must pick maxby
    log = datagen.change_log(n_docs=100, n_events=3000, n_epochs=2, seed=82)
    d = tmp_path / "ms"
    d.mkdir()
    pq.write_table(base, str(d / "base.parquet"))
    pq.write_table(log, str(d / "log.parquet"))
    base_df = spark.read.parquet(str(d / "base.parquet"))
    states = {}
    for strat in ("window", "maxby", "auto"):
        t = LakeTable.create(
            spark, str(tmp_path / f"t_{strat}"), base_df.schema, num_buckets=4
        )
        t.overwrite_all(base_df, key_col="doc_id")
        CDCEngine(spark, t, count_input=False, mor_dedup=strat).replay(
            spark.read.parquet(str(d / "log.parquet"))
        )
        states[strat] = (
            t.read().toPandas().sort_values("doc_id").reset_index(drop=True)
        )
    assert_states_equal(states["window"], replay_oracle(base, log))
    for strat in ("maxby", "auto"):
        assert states[strat]["doc_id"].tolist() == states["window"]["doc_id"].tolist()
        assert [list(x) for x in states[strat]["tokens"]] == [
            list(x) for x in states["window"]["tokens"]
        ]


def test_post_commit_checks(spark, tmp_path):
    base = datagen.base_table(n_docs=60, seed=91)
    log = datagen.change_log(n_docs=60, n_events=400, n_epochs=2, seed=92)
    d = tmp_path / "pc"
    d.mkdir()
    pq.write_table(base, str(d / "base.parquet"))
    pq.write_table(log, str(d / "log.parquet"))
    base_df = spark.read.parquet(str(d / "base.parquet"))

    def fresh(name, checks):
        t = LakeTable.create(spark, str(tmp_path / name), base_df.schema, num_buckets=4)
        t.overwrite_all(base_df, key_col="doc_id")
        return CDCEngine(spark, t, count_input=False, post_commit_checks=checks)

    # the dedup invariant holds -> checks pass every epoch
    ok_checks = [C.is_unique(["doc_id"]), C.not_null(["doc_id"]),
                 C.array_len_equals("tokens", "n_tok")]
    stats = fresh("ok", ok_checks).replay(spark.read.parquet(str(d / "log.parquet")))
    assert all(not e.skipped for e in stats.epochs)

    # an impossible #fail check raises AFTER the commit (epoch stays applied)
    eng = fresh("bad", [C.min_row_count(10**9)])
    with pytest.raises(C.CheckFailure):
        eng.replay(spark.read.parquet(str(d / "log.parquet")))
    assert eng.table.snapshot.properties["epoch_watermark"] == 1  # commit survived
