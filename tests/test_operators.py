"""Operators without SQL oracles: shredder, checks, simhash, embedding LSH."""

import pytest
from pyspark.sql import functions as F

from bigquery_etl_fork_spark.engine import checks as C
from bigquery_etl_fork_spark.engine.shredder import shred_keys
from bigquery_etl_fork_spark.lake import LakeTable
from bigquery_etl_fork_spark.operators.dedup_text import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_signatures,
)
from bigquery_etl_fork_spark.operators.similarity import (
    cosine_all_pairs,
    lsh_candidate_pairs,
)
from bigquery_etl_fork_spark import functions as UF

SF = "/root/testdata/sf0.001"


# ---------------- shredder ----------------


def test_shred_keys_hard_delete(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"doc-{i:03d}", i) for i in range(100)], "doc_id string, n int"
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema, num_buckets=8)
    t.overwrite_all(df, key_col="doc_id")
    victims = [f"doc-{i:03d}" for i in range(0, 100, 10)] + ["doc-zzz"]  # one absent
    res = shred_keys(spark, t, victims, key_col="doc_id", max_buckets_per_task=3)
    assert res.rows_deleted == 10
    left = {r.doc_id for r in t.read().collect()}
    assert left.isdisjoint(set(victims))
    assert len(left) == 90
    # physical removal: no live or orphan file contains a victim key
    import glob

    import pyarrow.parquet as pq

    for fp in glob.glob(str(tmp_path / "t" / "data" / "**" / "*.parquet"), recursive=True):
        vals = set(pq.read_table(fp, columns=["doc_id"])["doc_id"].to_pylist())
        assert vals.isdisjoint(set(victims)), fp


def test_shred_is_idempotent(spark, tmp_path):
    df = spark.createDataFrame([(f"d{i}", i) for i in range(20)], "doc_id string, n int")
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema, num_buckets=4)
    t.overwrite_all(df, key_col="doc_id")
    shred_keys(spark, t, ["d1", "d2"], key_col="doc_id")
    res2 = shred_keys(spark, t, ["d1", "d2"], key_col="doc_id")
    assert res2.rows_deleted == 0
    assert t.read().count() == 18


# ---------------- checks ----------------


def test_checks_pass_and_fail(spark):
    df = spark.createDataFrame(
        [("a", 1, [1, 2]), ("b", 2, [3]), ("c", None, [])],
        "doc_id string, n int, tokens array<int>",
    )
    rep = C.run_checks(
        df,
        [
            C.is_unique(["doc_id"]),
            C.min_row_count(2),
            C.in_range("n", 0, 10),
            C.accepted_values("doc_id", ["a", "b", "c"]),
            C.not_null(["n"], severity=C.WARN),
        ],
    )
    assert not rep.failed
    assert rep.warned and rep.warned[0]["violations"] == 1

    with pytest.raises(C.CheckFailure):
        C.run_checks(df.union(df), [C.is_unique(["doc_id"])])


def test_check_array_len_invariant(spark):
    df = spark.createDataFrame(
        [("a", [1, 2], 2), ("b", [1], 5)], "doc_id string, tokens array<int>, n_tok int"
    )
    rep = C.run_checks(df, [C.array_len_equals("tokens", "n_tok")], raise_on_fail=False)
    assert rep.results[0]["violations"] == 1


# ---------------- simhash ----------------


def test_simhash_identical_docs_zero_hamming(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "a completely different sentence about spark engines and shuffles"),
        ],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.simhash for r in simhash_signatures(df).collect()}
    assert sigs[1] == sigs[2] != sigs[3]
    pairs = simhash_near_pairs(df, max_hamming=3).collect()
    assert {(p.doc_a, p.doc_b) for p in pairs} == {(1, 2)}


def test_minhash_detects_near_duplicate(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    near = base.replace("delta", "delta2", 1)
    df = spark.createDataFrame(
        [(1, base.strip()), (2, near.strip()), (3, "totally unrelated words here only")],
        "doc_id long, text string",
    )
    pairs = {(r.doc_a, r.doc_b): r.est_jaccard for r in minhash_lsh_pairs(df).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.5
    assert (1, 3) not in pairs and (2, 3) not in pairs
    j = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(df, threshold=0.05).collect()}
    assert (1, 2) in j and j[(1, 2)] > 0.3


# ---------------- embedding LSH recall ----------------


def test_lsh_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b)
        for r in cosine_all_pairs(emb, threshold=0.75).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(
            emb, num_planes=16, bands=8, threshold=0.75
        ).collect()
    }
    assert got <= exact or not exact  # no false positives after re-score
    if exact:
        recall = len(got & exact) / len(exact)
        assert recall >= 0.6, f"LSH recall too low: {recall} ({len(got)}/{len(exact)})"


# ---------------- bits28 function library ----------------


def test_bits28_fold_and_days_since_seen(spark):
    df = spark.createDataFrame([(0b1, 0b1), (0b0, None), (0b100, 0b1)], "prev long, curr int")
    out = df.select(
        UF.combine_adjacent_days_28_bits(F.col("prev"), F.col("curr")).alias("bits")
    ).collect()
    assert [r.bits for r in out] == [0b11, 0b0, 0b1001]
    ds = spark.createDataFrame([(12,), (1,), (0,)], "bits long").select(
        UF.days_since_seen(F.col("bits")).alias("d")
    )
    assert [r.d for r in ds.collect()] == [2, 0, None]


def test_mode_last_expression(spark):
    df = spark.createDataFrame([(["a", "b", "b", "a"],), (["x", "y", "y"],)], "vals array<string>")
    out = [r.m for r in df.select(UF.mode_last(F.col("vals")).alias("m")).collect()]
    # ties (a:2, b:2) -> latest occurrence wins: 'a' at idx 3 beats 'b' at 2
    assert out == ["a", "y"]


# ---------------- bitmap fold vs direct ----------------


def test_daily_fold_equals_direct_bitmap(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    from bigquery_etl_fork_spark.operators.bitmap import bits_direct, fold_daily_bits

    days = [f"2024-01-{d:02d}" for d in range(1, 29)]
    folded = {r.user_id: r.days_seen_bits for r in
              fold_daily_bits(ev, "user_id", "ts", days).collect()}
    direct = {r.user_id: r.days_seen_bits for r in
              bits_direct(ev, "user_id", "ts", "2024-01-28", 28).collect()}
    assert folded == direct and len(folded) > 0


# ---------------- IVF ANN ----------------


def test_ivf_topk_recall(spark):
    from bigquery_etl_fork_spark.operators.similarity import ivf_assign, ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    cand = emb.where("vec_id <> 0")
    assigned, cents = ivf_assign(cand, n_cells=8)
    assert assigned.select("cell").distinct().count() <= 8
    approx = [r.vec_id for r in ivf_topk(assigned, cents, qvec, k=10, nprobe=4).collect()]
    # exact baseline
    from bigquery_etl_fork_spark.operators.similarity import cosine_sim
    qcol = F.array(*[F.lit(x) for x in qvec])
    exact = [
        r.vec_id
        for r in cand.select(
            "vec_id",
            F.round(cosine_sim(F.col("embedding").cast("array<double>"), qcol), 6).alias("s"),
        )
        .orderBy(F.col("s").desc(), "vec_id")
        .limit(10)
        .collect()
    ]
    recall = len(set(approx) & set(exact)) / 10
    assert recall >= 0.5, f"IVF recall {recall}: {approx} vs {exact}"


# ---------------- JSON export sink ----------------


def test_publish_json_roundtrip(spark, tmp_path):
    import glob
    import gzip as gz
    import json

    from bigquery_etl_fork_spark.sources.export import publish_json

    df = spark.read.parquet(f"{SF}/events.parquet").limit(50)
    out = str(tmp_path / "export")
    publish_json(df, out, gzip=True, single_file=True)
    files = glob.glob(out + "/*.json.gz")
    assert len(files) == 1
    rows = [json.loads(ln) for ln in gz.open(files[0], "rt")]
    assert len(rows) == 50
    assert set(rows[0]) == set(df.columns)
    # timestamps rendered ISO-Z
    assert rows[0]["ts"].endswith("Z") and "T" in rows[0]["ts"]


# ---------------- shredder mitigation ----------------


def test_shredder_mitigation_keeps_totals_continuous(spark):
    from bigquery_etl_fork_spark.engine.mitigation import (
        apply_mitigation,
        classify_columns,
        shredder_mitigation_patch,
    )

    prev = spark.createDataFrame(
        [("web", "en", 100, 10.0), ("web", "de", 50, 5.0), ("code", "en", 30, 3.0)],
        "source string, lang string, n bigint, amt double",
    )
    # backfill after deletions: web/en lost 20, code/en unchanged, web/de gone
    new = spark.createDataFrame(
        [("web", "en", 80, 8.0), ("code", "en", 30, 3.0)],
        "source string, lang string, n bigint, amt double",
    )
    dims, mets = classify_columns(prev)
    assert dims == ["source", "lang"] and mets == ["n", "amt"]
    patch = {(r.source, r.lang): (r.n, r.amt)
             for r in shredder_mitigation_patch(prev, new).collect()}
    assert patch == {("web", "en"): (20, 2.0), ("web", "de"): (50, 5.0)}
    total = apply_mitigation(prev, new).groupBy().sum("n").collect()[0][0]
    assert total == 180  # previous grand total preserved


# ---------------- functions library leftovers + external sources ----------------


def test_array_and_map_function_library(spark):
    from bigquery_etl_fork_spark import functions as UF2

    df = spark.createDataFrame([([1, 2, 3], 9)], "arr array<int>, x int")
    row = df.select(
        UF2.array_drop_first_and_append(F.col("arr"), F.col("x")).alias("rolled"),
        UF2.dedupe_array(F.array(F.lit(1), F.lit(1), F.lit(2))).alias("dd"),
        UF2.map_from_lists(
            F.array(F.lit("a"), F.lit("b")), F.array(F.lit(1), F.lit(2))
        ).alias("m"),
        UF2.sample_id(F.lit("client-42")).alias("sid"),
        UF2.active_n_weeks_ago(F.lit(1 << 7).cast("long"), 1).alias("wk1"),
    ).collect()[0]
    assert list(row.rolled) == [2, 3, 9]
    assert sorted(row.dd) == [1, 2]
    assert [(e.key, e.value) for e in row.m] == [("a", 1), ("b", 2)]
    assert 0 <= row.sid < 100
    assert row.wk1 is True
    got_key = df.select(
        UF2.map_get_key(
            UF2.map_from_lists(F.array(F.lit("k")), F.array(F.lit(7))), "k"
        ).alias("v")
    ).collect()[0].v
    assert got_key == 7


def test_external_sources_with_declared_schema(spark, tmp_path):
    import pyspark.sql.types as T

    from bigquery_etl_fork_spark.sources import read_csv, read_json

    (tmp_path / "x.csv").write_text("id,name\n1,a\n2,b\n")
    (tmp_path / "x.json").write_text('{"id": 3, "name": "c"}\n{"id": 4, "name": "d"}\n')
    schema = T.StructType([T.StructField("id", T.LongType()), T.StructField("name", T.StringType())])
    c = read_csv(spark, str(tmp_path / "x.csv"), schema, view_name="ext_csv")
    j = read_json(spark, str(tmp_path / "x.json"), schema)
    assert {(r.id, r.name) for r in c.collect()} == {(1, "a"), (2, "b")}
    assert {(r.id, r.name) for r in j.collect()} == {(3, "c"), (4, "d")}
    assert spark.sql("SELECT count(*) FROM ext_csv").collect()[0][0] == 2


def test_export_training_shards_deterministic(spark, tmp_path):
    """Same rows, different input partitioning -> identical shard
    membership AND identical in-file row order (the resumable-epoch
    property random shuffles lack)."""
    import glob

    import pyarrow.parquet as pq

    from bigquery_etl_fork_spark.sources.export import export_training_shards

    rows = [(f"doc{i}", i * 7 % 101) for i in range(500)]

    def run(out, nparts):
        df = spark.createDataFrame(rows, "doc_id string, v int").repartition(nparts)
        export_training_shards(df, out, key_col="doc_id", num_shards=4)
        shards = {}
        for s in range(4):
            files = sorted(glob.glob(f"{out}/_shard={s}/*.parquet"))
            assert len(files) == 1  # one task per shard without rows_per_file
            shards[s] = pq.read_table(files[0]).to_pandas()["doc_id"].tolist()
        return shards

    a = run(str(tmp_path / "a"), 13)
    b = run(str(tmp_path / "b"), 1)
    assert a == b
    assert sorted(x for v in a.values() for x in v) == sorted(r[0] for r in rows)
    assert all(len(v) > 0 for v in a.values())


def test_stratified_keep_rates_and_stability(spark):
    from pyspark.sql import functions as F

    from bigquery_etl_fork_spark.functions import stratified_keep

    df = spark.range(4000).select(
        F.col("id").cast("string").alias("k"),
        F.when(F.col("id") % 2 == 0, "heavy").otherwise("light").alias("g"),
    )
    kept = df.where(
        stratified_keep(F.col("k"), F.col("g"), {"heavy": 0.25})
    ).groupBy("g").count().collect()
    rates = {r["g"]: r["count"] for r in kept}
    assert rates["light"] == 2000  # default 1.0 keeps everything
    assert 380 <= rates["heavy"] <= 620  # ~25% of 2000, binomial slack
    # content-addressed: the kept set is identical on a superset input
    kept_ids = {
        r["k"] for r in df.where(
            stratified_keep(F.col("k"), F.col("g"), {"heavy": 0.25})
        ).collect()
    }
    bigger = spark.range(8000).select(
        F.col("id").cast("string").alias("k"),
        F.when(F.col("id") % 2 == 0, "heavy").otherwise("light").alias("g"),
    )
    kept_ids2 = {
        r["k"] for r in bigger.where(
            stratified_keep(F.col("k"), F.col("g"), {"heavy": 0.25})
        ).collect()
    }
    assert kept_ids == {k for k in kept_ids2 if int(k) < 4000}
