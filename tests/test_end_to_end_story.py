"""The whole engine in one story — init → tail → evolve → shred → backfill
→ change feed → checks, with a change-feed-maintained rollup (count/max/avg,
round-4 extrema maintenance) tracking the table through every stage. Every
stage uses the public API and asserts against an independent oracle; this is
the integration narrative behind COVERAGE.md.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pyspark.sql.types as T

import pyspark.sql.functions as F

from bigquery_etl_fork_spark import datagen
from bigquery_etl_fork_spark.engine import CDCEngine, IncrementalRollup
from bigquery_etl_fork_spark.engine import checks as C
from bigquery_etl_fork_spark.engine.backfill import run_backfill
from bigquery_etl_fork_spark.engine.shredder import shred_keys
from bigquery_etl_fork_spark.lake import LakeTable
from bigquery_etl_fork_spark.streaming.micro_batch import tail_changelog

from .oracle import assert_states_equal, replay_oracle


def test_full_lifecycle(spark, tmp_path):
    # --- 1. initial load -------------------------------------------------
    base = datagen.base_table(n_docs=300, seed=51)
    pre = datagen.change_log(n_docs=300, n_events=900, n_epochs=3, seed=52)
    post = datagen.change_log(n_docs=300, n_events=600, n_epochs=2, seed=53,
                              evolve_at_epoch=1)  # adds lang, widens n_tok
    post = post.set_column(post.schema.get_field_index("epoch"), "epoch",
                           pc.add(post["epoch"], pa.scalar(3, type=pa.int32())))
    post = post.set_column(post.schema.get_field_index("lsn"), "lsn",
                           pc.add(post["lsn"], pa.scalar(10_000, type=pa.int64())))
    d = tmp_path / "data"
    d.mkdir()
    pq.write_table(base, str(d / "base.parquet"))
    pq.write_to_dataset(pre, str(d / "log"), partition_cols=["epoch"])

    base_df = spark.read.parquet(str(d / "base.parquet"))
    t = LakeTable.create(spark, str(tmp_path / "tbl"), base_df.schema, num_buckets=8)
    t.overwrite_all(base_df, key_col="doc_id")
    v_init = t.snapshot.version
    eng = CDCEngine(spark, t, count_input=False)

    # --- 2. tail the log (epochs 1-3), with a maintained rollup ----------
    mv = IncrementalRollup(
        spark, t, str(tmp_path / "mv"), group_cols=["source"],
        measures={"n": ("count", None), "max_tok": ("max", "n_tok"),
                  "avg_tok": ("avg", "n_tok")},
        key_col="doc_id",
    )
    assert mv.refresh()["mode"] == "full"  # bootstrap over the initial load

    def assert_mv_tracks():
        got = {r["source"]: (r["n"], r["max_tok"], r["avg_tok"])
               for r in mv.read().collect()}
        exp = {r["source"]: (r["n"], r["mx"], r["av"])
               for r in t.read(key_col="doc_id").groupBy("source").agg(
                   F.count("*").alias("n"),
                   F.max("n_tok").cast("long").alias("mx"),
                   F.avg("n_tok").alias("av")).collect()}
        assert got == exp, (got, exp)

    tail_changelog(eng, str(d / "log"), max_polls=1, poll_interval_s=0)
    assert t.snapshot.properties["epoch_watermark"] == 3
    assert mv.refresh()["mode"] == "incremental"
    assert_mv_tracks()

    # --- 3. schema evolution mid-stream (epochs 4-5 carry lang + int64) --
    pq.write_to_dataset(post, str(d / "log"), partition_cols=["epoch"])
    tail_changelog(eng, str(d / "log"), max_polls=1, poll_interval_s=0)
    assert "lang" in t.schema.fieldNames()
    assert t.schema["n_tok"].dataType == T.LongType()
    # rollup follows across the widening (extrema stored widened)
    assert mv.refresh()["mode"] == "incremental"
    assert_mv_tracks()

    pre_lang = pre.append_column("lang", pa.nulls(len(pre), pa.string()))
    pre_lang = pre_lang.set_column(pre_lang.schema.get_field_index("n_tok"),
                                   "n_tok", pre_lang["n_tok"].cast(pa.int64()))
    full_log = pa.concat_tables([pre_lang, post], promote_options="default")
    assert_states_equal(t.read().toPandas(), replay_oracle(base, full_log))

    # --- 4. data-quality checks pass post-replay -------------------------
    C.run_checks(t.read(), [
        C.is_unique(["doc_id"]),
        C.min_row_count(10),
        C.array_len_equals("tokens", "n_tok"),
    ])

    # --- 5. change feed: a downstream consumer sees every changed key ----
    feed = t.changes(v_init).toPandas()
    lp = full_log.to_pandas().sort_values("lsn")
    assert set(feed["doc_id"]) == set(lp["doc_id"])

    # --- 6. backfill epochs 4-5 with corrected data and promote ----------
    # (must run BEFORE any shred: GDPR expiry destroys the pre-epoch-4
    # snapshots that time-travel staging needs)
    corrected = datagen.change_log(n_docs=300, n_events=600, n_epochs=2, seed=99,
                                   evolve_at_epoch=1)
    corrected = corrected.set_column(corrected.schema.get_field_index("epoch"), "epoch",
                                     pc.add(corrected["epoch"], pa.scalar(3, type=pa.int32())))
    corrected = corrected.set_column(corrected.schema.get_field_index("lsn"), "lsn",
                                     pc.add(corrected["lsn"], pa.scalar(10_000, type=pa.int64())))
    cd = tmp_path / "corrected"
    pq.write_to_dataset(corrected, str(cd), partition_cols=["epoch"])
    run_backfill(spark, t, spark.read.parquet(str(cd)), from_epoch=4,
                 staging_root=str(tmp_path / "staging"),
                 checks=[C.is_unique(["doc_id"])], count_input=False)

    expected = replay_oracle(base, pa.concat_tables([pre_lang, corrected],
                                                    promote_options="default"))
    got = t.read(key_col="doc_id").toPandas()
    assert_states_equal(got[expected.columns.tolist()], expected)
    # the promote commit rewrote state out-of-band: rollup self-heals via
    # its full-recompute fallback
    assert mv.refresh()["mode"] == "full"
    assert_mv_tracks()

    # --- 7. GDPR shred LAST: emit_changes keeps the rollup incremental;
    # victims physically gone once history is expired + vacuumed ----------
    victims = sorted(set(lp["doc_id"]))[:5]
    shred_keys(spark, t, victims, key_col="doc_id", vacuum=False,
               emit_changes=True)
    assert set(t.read(key_col="doc_id").toPandas()["doc_id"]).isdisjoint(victims)
    # deletes flowed through the feed as retracts — no full recompute
    assert mv.refresh()["mode"] == "incremental"
    assert_mv_tracks()
    # downstream is caught up: NOW expire history and vacuum (GDPR)
    t.expire_snapshots(keep_last=1)
    t.vacuum()
    import glob
    for fp in glob.glob(str(tmp_path / "tbl" / "data" / "**" / "*.parquet"), recursive=True):
        assert set(pq.read_table(fp, columns=["doc_id"])["doc_id"].to_pylist()).isdisjoint(victims)


    # post-shred: final state = corrected replay minus the shredded victims
    expected2 = expected[~expected["doc_id"].isin(victims)].reset_index(drop=True)
    got2 = t.read(key_col="doc_id").toPandas()
    assert_states_equal(got2[expected2.columns.tolist()], expected2)
