"""udf_js-parity operators: jackknife, bootstrap, gunzip, histograms."""

import gzip
import json

import numpy as np
import pyspark.sql.functions as F

from bigquery_etl_fork_spark.operators.stats import (
    bootstrap_percentile_ci,
    gunzip_col,
    histogram_merge,
    jackknife_mean_ci,
    parse_histogram,
)


def test_jackknife_matches_numpy(spark):
    rng = np.random.default_rng(3)
    vals = rng.normal(10, 2, size=400)
    bkt = np.arange(400) % 20
    df = spark.createDataFrame(
        [("g", int(b), float(v)) for b, v in zip(bkt, vals)], "g string, bkt int, v double"
    )
    row = jackknife_mean_ci(df, ["g"], "bkt", "v").collect()[0]
    # numpy oracle
    sums = np.array([vals[bkt == b].sum() for b in range(20)])
    cnts = np.array([(bkt == b).sum() for b in range(20)])
    loo = (sums.sum() - sums) / (cnts.sum() - cnts)
    se = np.sqrt((19 / 20) * ((loo**2).sum() - 20 * loo.mean() ** 2))
    mean = vals.mean()
    assert abs(row.mean - round(mean, 4)) < 1e-9
    assert abs(row.ci_low - round(mean - 1.959963984540054 * se, 4)) < 1e-3
    assert abs(row.ci_high - round(mean + 1.959963984540054 * se, 4)) < 1e-3
    assert row.ci_low < row.mean < row.ci_high


def test_bootstrap_ci_deterministic_and_sane(spark):
    rng = np.random.default_rng(5)
    df = spark.createDataFrame(
        [("a", float(v)) for v in rng.normal(50, 5, 300)]
        + [("b", float(v)) for v in rng.normal(10, 1, 300)],
        "g string, v double",
    )
    r1 = {r.g: (r.point, r.ci_low, r.ci_high) for r in
          bootstrap_percentile_ci(df, ["g"], "v").collect()}
    r2 = {r.g: (r.point, r.ci_low, r.ci_high) for r in
          bootstrap_percentile_ci(df, ["g"], "v").collect()}
    assert r1 == r2  # seeded determinism
    for g, (pt, lo, hi) in r1.items():
        assert lo <= pt <= hi
    assert 45 < r1["a"][0] < 55 and 9 < r1["b"][0] < 11


def test_gunzip_roundtrip_and_garbage(spark):
    payload = "hello compressed wörld"
    df = spark.createDataFrame(
        [(1, bytearray(gzip.compress(payload.encode()))), (2, bytearray(b"not gzip"))],
        "id int, blob binary",
    )
    rows = {r.id: r.txt for r in df.select("id", gunzip_col("blob").alias("txt")).collect()}
    assert rows[1] == payload
    assert rows[2] is None


def test_histogram_parse_and_merge(spark):
    h1 = json.dumps({"bucket_count": 3, "histogram_type": 1, "sum": 7,
                     "range": [1, 10], "values": {"1": 2, "5": 1}})
    h2 = json.dumps({"bucket_count": 3, "histogram_type": 1, "sum": 5,
                     "range": [1, 10], "values": {"5": 4, "9": 1}})
    df = spark.createDataFrame([("k", h1), ("k", h2)], "k string, raw string")
    parsed = df.select("k", parse_histogram("raw").alias("h"))
    agg = parsed.groupBy("k").agg(F.collect_list("h").alias("hs"))
    out = agg.select(histogram_merge(F.col("hs")).alias("m")).collect()[0].m
    assert out["sum"] == 12
    assert dict(out["values"]) == {"1": 2, "5": 5, "9": 1}
