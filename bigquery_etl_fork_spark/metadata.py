"""Declarative per-table metadata sidecar — the ``metadata.yaml`` analog.

The reference drives every table's DDL and job config from a YAML sidecar in
the table's directory (``bigquery_etl/metadata/parse_metadata.py:179-256``:
partitioning, clustering, ``require_partition_filter``, scheduling params,
labels) plus ``schema.yaml`` and ``checks.sql``. This module is the binder
for our engine: one ``table.yaml`` declares the lake table (schema, buckets,
properties), the CDC engine config (key/order/op columns, storage and dedup
strategy, skew handling) and the post-commit data-quality checks — so a
table can be created and replayed purely from config, no imperative setup.

Format (all sections optional except ``table.name`` and ``schema``)::

    table:
      name: sequences
      num_buckets: 64            # omit or null -> auto-size to cluster
      require_partition_filter: true
      properties: {owner: data-eng}
    schema:                      # list of {name, type} with Spark DDL types
      - {name: doc_id, type: string}
      - {name: tokens, type: "array<int>"}
    engine:                      # CDCEngine kwargs, passed through
      key: doc_id
      order: lsn
      storage_mode: mor
    checks:                      # engine.checks builders by name + kwargs
      - {check: is_unique, cols: [doc_id]}
      - {check: min_row_count, n: 1}
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .engine import checks as C
from .engine.cdc import CDCEngine
from .lake import LakeTable

# check name -> builder (engine/checks.py mirrors the reference's
# tests/checks/*.jinja macro library; cli/check.py:104-288 runs them)
_CHECK_BUILDERS = {
    "is_unique": C.is_unique,
    "min_row_count": C.min_row_count,
    "not_null": C.not_null,
    "in_range": C.in_range,
    "accepted_values": C.accepted_values,
    "matches_pattern": C.matches_pattern,
    "value_length": C.value_length,
    "array_len_equals": C.array_len_equals,
}


@dataclass
class TableConfig:
    name: str
    schema: T.StructType
    # None = LakeTable.create auto-sizes to >=4x cluster parallelism — the
    # right default for a declarative config that doesn't know the cluster
    num_buckets: int | None = None
    properties: dict[str, Any] = field(default_factory=dict)
    engine_kwargs: dict[str, Any] = field(default_factory=dict)
    checks: list[C.Check] = field(default_factory=list)


def parse_table_config(doc: dict) -> TableConfig:
    """Validate + bind a parsed yaml document to a TableConfig."""
    tbl = doc.get("table") or {}
    if "name" not in tbl:
        raise ValueError("table.name is required")
    schema_rows = doc.get("schema")
    if not schema_rows:
        raise ValueError("schema section is required")
    ddl = ", ".join(f"{r['name']} {r['type']}" for r in schema_rows)
    schema = T.StructType.fromDDL(ddl)
    properties = dict(tbl.get("properties") or {})
    if tbl.get("require_partition_filter"):
        properties["require_partition_filter"] = True
    checks = []
    for spec in doc.get("checks") or []:
        spec = dict(spec)
        kind = spec.pop("check")
        if kind not in _CHECK_BUILDERS:
            raise ValueError(
                f"unknown check {kind!r}; known: {sorted(_CHECK_BUILDERS)}"
            )
        checks.append(_CHECK_BUILDERS[kind](**spec))
    return TableConfig(
        name=tbl["name"],
        schema=schema,
        num_buckets=tbl.get("num_buckets"),  # omitted/null -> auto-size
        properties=properties,
        engine_kwargs=dict(doc.get("engine") or {}),
        checks=checks,
    )


def load_table_config(path: str) -> TableConfig:
    import yaml

    with open(path) as f:
        return parse_table_config(yaml.safe_load(f))


def create_table(spark: SparkSession, root: str, cfg: TableConfig) -> LakeTable:
    """Create (or load, if it already exists — idempotent deploy like the
    reference's ``deploy.py:31-153``) the lake table declared by ``cfg``."""
    table_root = os.path.join(root, cfg.name)
    if LakeTable.exists(table_root):
        return LakeTable(spark, table_root)
    return LakeTable.create(
        spark,
        table_root,
        cfg.schema,
        num_buckets=cfg.num_buckets,
        properties=cfg.properties,
    )


def build_engine(spark: SparkSession, table: LakeTable, cfg: TableConfig) -> CDCEngine:
    kwargs = dict(cfg.engine_kwargs)
    if cfg.checks and "post_commit_checks" not in kwargs:
        kwargs["post_commit_checks"] = cfg.checks
    return CDCEngine(spark, table, **kwargs)


def bootstrap(
    spark: SparkSession, root: str, yaml_path: str
) -> tuple[LakeTable, CDCEngine]:
    """yaml → (table, engine): the whole declarative path in one call."""
    cfg = load_table_config(yaml_path)
    table = create_table(spark, root, cfg)
    return table, build_engine(spark, table, cfg)


# --------------------------------------------------------------------------
# Declarative pipelines — the reference's dags.yaml analog
# (bigquery_etl/query_scheduling/: each derived table declares its upstreams
# and schedule; here the same declaration binds to engine objects and runs
# in-process through plans.dag.Pipeline).
# --------------------------------------------------------------------------


def build_pipeline(spark: SparkSession, doc: dict):
    """Bind a parsed pipeline document to a runnable Pipeline.

    Node kinds::

        - name: ingest
          kind: cdc_ingest          # table.yaml-configured table + engine,
          table_yaml: seq.yaml      # then tail the log dir once
          root: /data
          log_dir: /logs/sequences
        - name: daily
          kind: rollup              # incremental materialized view
          deps: [ingest]
          source: ingest            # the cdc_ingest node owning the table
          target: /data/mv_daily
          group_cols: [source]
          measures: {n_docs: [count, null], total_tok: [sum, n_tok]}
        - name: publish
          kind: export_json         # JSON export of a table/rollup node
          deps: [daily]
          input: daily
          path: /out/daily
          skip_if_noop: daily       # skip when that rollup refreshed nothing

    Returns (pipeline, objects): ``objects`` maps node name → the bound
    engine object (LakeTable / IncrementalRollup), so callers can keep
    driving them after the run."""
    from .engine.rollup import IncrementalRollup
    from .plans.dag import Pipeline
    from .sources.export import publish_json
    from .streaming.micro_batch import tail_changelog

    p = Pipeline()
    objects: dict[str, Any] = {}
    for spec in doc.get("pipeline") or []:
        spec = dict(spec)
        name, kind = spec["name"], spec["kind"]
        deps = list(spec.get("deps") or [])
        skip_dep = spec.get("skip_if_noop")
        skip_if = (
            (lambda ctx, d=skip_dep: (ctx.get(d) or {}).get("mode") == "noop")
            if skip_dep
            else None
        )
        if kind == "cdc_ingest":
            table, engine = bootstrap(spark, spec["root"], spec["table_yaml"])
            objects[name] = table

            def run_ingest(ctx, _e=engine, _t=table, _log=spec["log_dir"]):
                stats = tail_changelog(_e, _log, max_polls=1, poll_interval_s=0)
                return {
                    "epochs_applied": len(stats.epochs),
                    "version": _t.snapshot.version,
                    "mode": "noop" if not stats.epochs else "applied",
                }

            p.add(name, run=run_ingest, deps=deps, skip_if=skip_if)
        elif kind == "rollup":
            if spec["source"] not in objects:
                raise ValueError(
                    f"rollup {name!r}: source node {spec['source']!r} must be "
                    "declared before it in the pipeline list"
                )
            src = objects[spec["source"]]
            measures = {
                m: (k, None if c in (None, "null") else c)
                for m, (k, c) in (spec["measures"] or {}).items()
            }
            mv = IncrementalRollup(
                spark, src, spec["target"],
                group_cols=list(spec["group_cols"]), measures=measures,
            )
            objects[name] = mv
            p.add(name, run=lambda ctx, _mv=mv: _mv.refresh(), deps=deps,
                  skip_if=skip_if)
        elif kind == "export_json":
            if spec["input"] not in objects:
                raise ValueError(
                    f"export {name!r}: input node {spec['input']!r} must be "
                    "declared before it in the pipeline list"
                )
            src_obj = objects[spec["input"]]

            def run_export(ctx, _o=src_obj, _path=spec["path"]):
                publish_json(_o.read(), _path, gzip=False)
                return {"path": _path}

            p.add(name, run=run_export, deps=deps, skip_if=skip_if)
        else:
            raise ValueError(f"unknown pipeline node kind {kind!r}")
    return p, objects


def load_pipeline(spark: SparkSession, path: str):
    import yaml

    with open(path) as f:
        return build_pipeline(spark, yaml.safe_load(f))
