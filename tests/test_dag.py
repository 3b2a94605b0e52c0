"""Pipeline DAG runner: ordering, cycles, skip propagation, failure modes,
and an end-to-end ingest -> rollup -> export chain over the real engine."""

import json
import os

import pytest
from pyspark.sql import functions as F

from bigquery_etl_fork_spark.engine import CDCEngine, IncrementalRollup
from bigquery_etl_fork_spark.lake import LakeTable
from bigquery_etl_fork_spark.plans.dag import CycleError, Pipeline


def test_topological_order_and_context_flow():
    p = Pipeline()
    log = []
    p.add("c", deps=["a", "b"], run=lambda ctx: log.append("c") or ctx["a"] + ctx["b"])
    p.add("a", run=lambda ctx: log.append("a") or 1)
    p.add("b", deps=["a"], run=lambda ctx: log.append("b") or ctx["a"] + 10)
    r = p.run()
    assert r["ok"] and log == ["a", "b", "c"]
    assert r["nodes"]["c"]["value"] == 12


def test_cycle_detected():
    p = Pipeline()
    p.add("a", deps=["b"], run=lambda ctx: None)
    p.add("b", deps=["a"], run=lambda ctx: None)
    with pytest.raises(CycleError):
        p.run()


def test_unknown_dep_rejected():
    p = Pipeline()
    p.add("a", deps=["ghost"], run=lambda ctx: None)
    with pytest.raises(ValueError, match="ghost"):
        p.run()


def test_skip_publishes_none_and_downstream_runs():
    p = Pipeline()
    p.add("up", run=lambda ctx: {"mode": "noop"})
    p.add("mid", deps=["up"], skip_if=lambda ctx: ctx["up"]["mode"] == "noop",
          run=lambda ctx: "should not run")
    p.add("down", deps=["mid"], run=lambda ctx: ctx.get("mid") is None)
    r = p.run()
    assert r["nodes"]["mid"]["status"] == "skipped"
    assert r["nodes"]["down"]["status"] == "ran" and r["nodes"]["down"]["value"] is True


def test_failure_blocks_descendants_not_siblings():
    p = Pipeline()
    p.add("bad", run=lambda ctx: 1 / 0)
    p.add("child", deps=["bad"], run=lambda ctx: "x")
    p.add("island", run=lambda ctx: "ok")
    r = p.run(fail_fast=False)
    assert not r["ok"]
    assert r["nodes"]["bad"]["status"] == "failed"
    assert "ZeroDivisionError" in r["nodes"]["bad"]["error"]
    assert r["nodes"]["child"]["status"] == "blocked"
    assert r["nodes"]["island"]["status"] == "ran"


def test_fail_fast_blocks_everything_after():
    p = Pipeline()
    p.add("bad", run=lambda ctx: 1 / 0)
    p.add("later_island", run=lambda ctx: "never")
    r = p.run(fail_fast=True)
    assert r["nodes"]["later_island"]["status"] == "blocked"


def test_engine_pipeline_ingest_rollup_export(spark, tmp_path):
    """The nightly shape: replay new epochs, refresh the rollup, export it
    — then a second scheduled run with no new data skips the export."""
    df = spark.createDataFrame(
        [("a", "x", 1), ("b", "y", 2)], "doc_id string, grp string, val long"
    )
    src = LakeTable.create(spark, str(tmp_path / "src"), df.schema, num_buckets=4,
                           properties={"key_col": "doc_id"})
    src.overwrite_all(df, key_col="doc_id")
    mv = IncrementalRollup(spark, src, str(tmp_path / "mv"), group_cols=["grp"],
                           measures={"n": ("count", None)})
    eng = CDCEngine(spark, src, key="doc_id", order="lsn", count_input=False)
    out = str(tmp_path / "export")
    epochs = [
        (1, [("c", "x", 3, 11, "I")]),
        (2, [("a", None, None, 21, "D")]),
    ]
    pending = list(epochs)

    def ingest(ctx):
        applied = 0
        while pending:
            e, rows = pending.pop(0)
            eng.apply_epoch(
                e, spark.createDataFrame(
                    rows, "doc_id string, grp string, val long, lsn long, op string")
            )
            applied += 1
        return {"epochs_applied": applied}

    def refresh(ctx):
        return mv.refresh()

    def export(ctx):
        mv.read().coalesce(1).write.mode("overwrite").json(out)
        return {"path": out}

    p = (
        Pipeline()
        .add("ingest", run=ingest)
        .add("rollup", deps=["ingest"], run=refresh)
        .add("export", deps=["rollup"],
             skip_if=lambda ctx: (ctx.get("rollup") or {}).get("mode") == "noop",
             run=export)
    )
    r1 = p.run()
    assert r1["ok"], r1
    assert r1["nodes"]["rollup"]["value"]["mode"] in ("incremental", "full")
    rows = [json.loads(line) for f in os.listdir(out) if f.endswith(".json")
            for line in open(os.path.join(out, f))]
    assert {(r["grp"], r["n"]) for r in rows} == {("x", 1), ("y", 1)}

    # second scheduled run: no pending epochs -> rollup noops -> export skips
    r2 = p.run()
    assert r2["ok"]
    assert r2["nodes"]["rollup"]["value"]["mode"] == "noop"
    assert r2["nodes"]["export"]["status"] == "skipped"
