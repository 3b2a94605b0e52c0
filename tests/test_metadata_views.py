"""Declarative metadata sidecar (table.yaml → table+engine) and
schema-enforcing view publishing."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigquery_etl_fork_spark import datagen
from bigquery_etl_fork_spark.engine.checks import CheckFailure
from bigquery_etl_fork_spark.metadata import (
    bootstrap,
    load_table_config,
    parse_table_config,
)
from bigquery_etl_fork_spark.views import publish_view

from .oracle import assert_states_equal, replay_oracle

YAML = """
table:
  name: sequences
  num_buckets: 4
  require_partition_filter: true
  properties: {owner: data-eng}
schema:
  - {name: doc_id, type: string}
  - {name: tokens, type: "array<int>"}
  - {name: n_tok, type: int}
  - {name: source, type: string}
engine:
  key: doc_id
  order: lsn
  storage_mode: mor
  count_input: false
checks:
  - {check: is_unique, cols: [doc_id]}
  - {check: min_row_count, n: 1}
  - {check: not_null, cols: [doc_id]}
"""


def test_bootstrap_from_yaml_and_replay(spark, tmp_path):
    (tmp_path / "sequences.yaml").write_text(YAML)
    table, eng = bootstrap(spark, str(tmp_path), str(tmp_path / "sequences.yaml"))
    # declared table shape landed
    assert table.snapshot.num_buckets == 4
    assert table.snapshot.properties["require_partition_filter"] is True
    assert table.snapshot.properties["owner"] == "data-eng"
    assert [f.name for f in table.schema.fields] == [
        "doc_id", "tokens", "n_tok", "source",
    ]
    # engine config + checks bound
    assert eng.key == "doc_id" and eng.storage_mode == "mor"
    assert len(eng.post_commit_checks) == 3

    base = datagen.base_table(n_docs=60, seed=81)
    log = datagen.change_log(n_docs=60, n_events=300, n_epochs=2, seed=82)
    d = tmp_path / "data"
    d.mkdir()
    pq.write_table(base, str(d / "base.parquet"))
    pq.write_to_dataset(log, str(d / "log"), partition_cols=["epoch"])
    table.overwrite_all(spark.read.parquet(str(d / "base.parquet")), key_col="doc_id")
    eng.replay(spark.read.parquet(str(d / "log")))
    got = table.read(list(range(4))).toPandas()
    assert_states_equal(got, replay_oracle(base, log))

    # idempotent deploy: bootstrap again loads the same table
    table2, _ = bootstrap(spark, str(tmp_path), str(tmp_path / "sequences.yaml"))
    assert table2.snapshot.version == table.snapshot.version


def test_parse_table_config_rejects_unknown_check():
    with pytest.raises(ValueError, match="unknown check"):
        parse_table_config(
            {
                "table": {"name": "t"},
                "schema": [{"name": "a", "type": "string"}],
                "checks": [{"check": "no_such_macro"}],
            }
        )


def test_yaml_checks_fire_on_violation(spark, tmp_path):
    yaml_text = YAML.replace(
        "- {check: min_row_count, n: 1}", "- {check: min_row_count, n: 10000}"
    )
    (tmp_path / "sequences.yaml").write_text(yaml_text)
    table, eng = bootstrap(spark, str(tmp_path), str(tmp_path / "sequences.yaml"))
    base = datagen.base_table(n_docs=30, seed=83)
    log = datagen.change_log(n_docs=30, n_events=100, n_epochs=1, seed=84)
    d = tmp_path / "data"
    d.mkdir()
    pq.write_table(base, str(d / "base.parquet"))
    pq.write_to_dataset(log, str(d / "log"), partition_cols=["epoch"])
    table.overwrite_all(spark.read.parquet(str(d / "base.parquet")), key_col="doc_id")
    with pytest.raises(CheckFailure):
        eng.replay(spark.read.parquet(str(d / "log")))


def test_publish_view_enforces_contract(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2)], "doc_id string, n_tok int"
    )
    contract = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("n_tok", T.LongType()),     # widened
            T.StructField("lang", T.StringType()),    # not yet materialized
        ]
    )
    publish_view(spark, "v_docs", df, schema=contract)
    out = spark.table("v_docs")
    assert [f.name for f in out.schema.fields] == ["doc_id", "n_tok", "lang"]
    assert dict(out.dtypes)["n_tok"] == "bigint"
    rows = {r["doc_id"]: (r["n_tok"], r["lang"]) for r in out.collect()}
    assert rows == {"a": (1, None), "b": (2, None)}

    # strict mode rejects an incompatible (narrowing) contract
    bad = T.StructType([T.StructField("n_tok", T.BooleanType())])
    with pytest.raises(ValueError, match="not write-compatible"):
        publish_view(spark, "v_bad", df, schema=bad, strict=True)


def test_publish_view_hides_internal_columns(spark):
    df = spark.createDataFrame(
        [("a", 1, 99)], "doc_id string, n_tok int, _internal int"
    )
    contract = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("n_tok", T.IntegerType()),
        ]
    )
    publish_view(spark, "v_clean", df, schema=contract)
    assert spark.table("v_clean").columns == ["doc_id", "n_tok"]


def test_declarative_pipeline_yaml_end_to_end(spark, tmp_path):
    """pipeline.yaml -> ingest + rollup + export, run twice: the second run
    finds no new epochs, the rollup noops, the export skips."""
    import json
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from bigquery_etl_fork_spark import datagen
    from bigquery_etl_fork_spark.metadata import load_pipeline

    log = datagen.change_log(n_docs=120, n_events=600, n_epochs=3, seed=31)
    pq.write_to_dataset(log, str(tmp_path / "log"), partition_cols=["epoch"])
    (tmp_path / "seq.yaml").write_text(
        """
table:
  name: sequences
  num_buckets: 4
  properties: {key_col: doc_id}
schema:
  - {name: doc_id, type: string}
  - {name: tokens, type: "array<int>"}
  - {name: n_tok, type: int}
  - {name: source, type: string}
engine:
  key: doc_id
  order: lsn
  count_input: false
"""
    )
    (tmp_path / "pipeline.yaml").write_text(
        f"""
pipeline:
  - name: ingest
    kind: cdc_ingest
    table_yaml: {tmp_path}/seq.yaml
    root: {tmp_path}/data
    log_dir: {tmp_path}/log
  - name: by_source
    kind: rollup
    deps: [ingest]
    source: ingest
    target: {tmp_path}/data/mv_by_source
    group_cols: [source]
    measures: {{n_docs: [count, null], total_tok: [sum, n_tok]}}
  - name: publish
    kind: export_json
    deps: [by_source]
    input: by_source
    path: {tmp_path}/out/by_source
    skip_if_noop: by_source
"""
    )
    p, objects = load_pipeline(spark, str(tmp_path / "pipeline.yaml"))
    r1 = p.run()
    assert r1["ok"], r1
    assert r1["nodes"]["ingest"]["value"]["epochs_applied"] == 3
    assert r1["nodes"]["by_source"]["value"]["mode"] == "incremental"
    assert r1["nodes"]["publish"]["status"] == "ran"
    table, mv = objects["ingest"], objects["by_source"]
    want = {
        r["source"]: (r["n_docs"], r["total_tok"])
        for r in table.read()
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("total_tok"))
        .collect()
    }
    exported = [
        json.loads(line)
        for f in os.listdir(tmp_path / "out" / "by_source")
        if f.endswith(".json")
        for line in open(tmp_path / "out" / "by_source" / f)
    ]
    assert {r["source"]: (r["n_docs"], r["total_tok"]) for r in exported} == want

    # second scheduled run: nothing new anywhere
    p2, _ = load_pipeline(spark, str(tmp_path / "pipeline.yaml"))
    r2 = p2.run()
    assert r2["ok"]
    assert r2["nodes"]["ingest"]["value"]["mode"] == "noop"
    assert r2["nodes"]["by_source"]["value"]["mode"] == "noop"
    assert r2["nodes"]["publish"]["status"] == "skipped"
