"""Physical-plan guards: pushdown, pruning, codegen — the scale checks."""

import pyspark.sql.functions as F

from bigquery_etl_fork_spark.lake import LakeTable, bucket_id
from bigquery_etl_fork_spark.plans import (  # noqa
    assert_filter_pushed,
    explain_string,
    pushed_filters,
    scan_file_count,
    wholestage_codegen_ids,
)

SF = "/root/testdata/sf0.01"


def test_filter_pushdown_to_parquet(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.where(F.col("l_orderkey") == 42).select("l_orderkey", "l_quantity")
    assert_filter_pushed(q, "l_orderkey")
    # column pruning: ReadSchema carries only the two selected columns
    plan = explain_string(q)
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_quantity" in rs and "l_extendedprice" not in rs


def test_lake_bucket_pruned_scan_reads_fewer_files(spark, tmp_path):
    df = spark.createDataFrame([(f"d{i}", i) for i in range(200)], "doc_id string, n int")
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema, num_buckets=8)
    t.overwrite_all(df, key_col="doc_id")
    all_files = scan_file_count(t.read())
    one = scan_file_count(t.read([3]))
    assert one < all_files

    # engine-style read for the bucket of a single key touches 1 bucket
    b = df.select(bucket_id(F.col("doc_id"), 8).alias("b")).where(F.col("n") == 7).first()["b"]
    assert scan_file_count(t.read([int(b)])) <= all_files // 2


def test_epoch_partition_pruning_on_changelog(spark, tmp_path):
    import pyarrow.parquet as pq

    from bigquery_etl_fork_spark import datagen

    log = datagen.change_log(n_docs=50, n_events=400, n_epochs=4, seed=5)
    pq.write_to_dataset(log, str(tmp_path / "log"), partition_cols=["epoch"])
    full = spark.read.parquet(str(tmp_path / "log"))
    one = full.where(F.col("epoch") == 2)
    # partition pruning shows up as a PartitionFilters entry on the scan
    # (inputFiles() is pre-pruning, so inspect the physical plan instead)
    plan = explain_string(one)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "epoch" in pf and "= 2" in pf.replace("epoch#", "")


def test_aggregate_plan_has_map_side_combine(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = explain_string(q)
    # partial_sum before the exchange = map-side combine (hot keys collapse
    # before the shuffle — why the jvm LWW dedup needs no salting)
    assert "partial_sum" in plan and "HashAggregate" in plan
    # under AQE the codegen spans only materialize in the executed plan;
    # vectorized parquet input is visible pre-execution though
    assert "Batched: true" in plan


def test_merge_plan_broadcasts_delta_keys(spark, tmp_path):
    from bigquery_etl_fork_spark.operators.merge import merge_delta

    current = spark.range(10000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"), F.col("id").alias("n")
    )
    delta = spark.createDataFrame(
        [("d1", 1, "U"), ("d2", 2, "D")], "doc_id string, n long, op string"
    )
    # "auto" broadcast forces the hint when the caller's key count is small
    # (the engine passes its probe's count); test_round3_fixes covers the
    # no-count and over-limit cases staying un-forced.
    plan = explain_string(
        merge_delta(current, delta, payload_cols=["doc_id", "n"], delta_key_count=2)
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_maxby_dedup_plan_has_partial_agg(spark):
    """The maxby MoR strategy's whole premise: per-key duplicates collapse
    MAP-SIDE (partial_max before the Exchange), so the shuffle carries ~one
    row per key."""
    from bigquery_etl_fork_spark.operators.dedup_lww import lww_dedup

    df = spark.createDataFrame(
        [("a", 1, "U", [1, 2]), ("a", 2, "U", [3])],
        "doc_id string, lsn long, op string, tokens array<int>",
    )
    plan = explain_string(lww_dedup(df, "doc_id", "lsn", mode="jvm"))
    # Spark only emits partial_* agg modes on the pre-shuffle (map) side,
    # so its presence IS the map-side combine
    assert "partial_max" in plan, "map-side combine missing"
    assert "hashpartitioning" in plan


def test_asof_jvm_plan_single_shuffle_no_python(spark):
    from bigquery_etl_fork_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 5, 1)], "k string, lts long, v long")
    right = spark.createDataFrame([("k", 3, 9)], "k string, rts long, rv long")
    plan = explain_string(asof_join(left, right, "k", "lts", "rts", ["rv"]))
    assert "ArrowEvalPython" not in plan and "FlatMapCoGroupsInPandas" not in plan
    # one hash-partitioning exchange on the key feeds the carry-forward
    # window; the pandas cogroup mode would need two
    assert plan.count("Arguments: hashpartitioning") == 1


def test_approx_distinct_plan_has_no_expand(spark):
    """countDistinct + approx_count_distinct in ONE agg forces Catalyst's
    expand/two-phase distinct plan (27x at sf0.1, BENCH_r03); the
    distinct-projection-first shape must stay expand-free (round-4 fix)."""
    from bigquery_etl_fork_spark.queries import q_approx_distinct

    plan = explain_string(q_approx_distinct(spark, SF))
    assert "Expand" not in plan
    assert "HashAggregate" in plan


def test_ivf_assign_plan_is_map_side(spark):
    """Cell assignment is a per-row expression over broadcast centroids —
    no Python, and no exchange beyond the final presentation sort."""
    from bigquery_etl_fork_spark.queries import q_ivf_assign

    plan = explain_string(q_ivf_assign(spark, SF))
    assert "Python" not in plan
    # one rangepartitioning exchange for the ORDER BY, nothing else (the
    # formatted plan prints each node twice: tree + detail section)
    assert plan.count("+- Exchange") <= 1
