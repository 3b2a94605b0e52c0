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
