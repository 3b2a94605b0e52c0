"""Plan inspection and guards.

The reference enforces partition discipline declaratively
(``require_partition_filter``, ``bigquery_etl/metadata/parse_metadata.py:
61-76``) and relies on BigQuery for everything else. On Spark, Catalyst
does the optimizing; these helpers let engine code and tests ASSERT that
the physical plan is the one we designed for — filters pushed to the scan,
bucket pruning effective, no full-table scans sneaking in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The text ``df.explain(mode)`` would print, as a Python string."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def pushed_filters(df: DataFrame) -> str:
    plan = explain_string(df, "formatted")
    return "\n".join(ln.strip() for ln in plan.splitlines() if "PushedFilters" in ln)


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    pf = pushed_filters(df)
    assert column in pf, f"filter on {column!r} not pushed to scan; PushedFilters: {pf!r}"


def scan_file_count(df: DataFrame) -> int:
    """Number of files the plan will scan (driver-side, pre-execution)."""
    return len(df.inputFiles())


def assert_no_full_scan(df: DataFrame, table_files: int) -> None:
    """Guard: the plan must scan strictly fewer files than the whole table
    (i.e. partition/bucket pruning actually engaged)."""
    n = scan_file_count(df)
    assert n < table_files, f"expected pruned scan, but plan reads all {n} files"


def wholestage_codegen_ids(df: DataFrame) -> int:
    """How many WholeStageCodegen spans the physical plan has (wider is
    generally better — Python/UDF boundaries break them)."""
    plan = explain_string(df, "formatted")
    ids = {ln.split("(")[1].split(")")[0] for ln in plan.splitlines() if "WholeStageCodegen" in ln}
    return len(ids)
