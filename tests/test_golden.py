"""Directory-per-test golden harness — the Spark analog of the reference's
primary test layer (``bigquery_etl/pytest_plugin/sql.py:30-233``,
``docs/cookbooks/testing.md:70-140``).

Each ``tests/golden/<name>/`` directory contains:

- ``<table>.ndjson``  — one input fixture per table (newline-delimited
  JSON, loaded with an inferred-then-frozen schema and registered as a temp
  view named after the file);
- ``query.sql``       — the Spark SQL under test, referencing those views;
- ``expect.ndjson``   — expected output rows.

Comparison is ORDER-INSENSITIVE after JSON normalization (rows serialized
with sorted keys, then the row list sorted) — the exact compare model of
the reference harness (``pytest_plugin/sql.py:214-233``). Add a test by
adding a directory; no Python required.
"""

from __future__ import annotations

import json
import os

import pytest

GOLDEN_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

CASES = sorted(
    d
    for d in (os.listdir(GOLDEN_ROOT) if os.path.isdir(GOLDEN_ROOT) else [])
    if os.path.isfile(os.path.join(GOLDEN_ROOT, d, "query.sql"))
)


def _normalize(rows: list[dict]) -> list[str]:
    def norm_val(v):
        if isinstance(v, float) and v == int(v):
            return int(v)  # 3.0 == 3 across JSON/engine boundaries
        if isinstance(v, list):
            return [norm_val(x) for x in v]
        if isinstance(v, dict):
            return {k: norm_val(x) for k, x in v.items()}
        return v

    return sorted(
        json.dumps({k: norm_val(v) for k, v in r.items() if v is not None}, sort_keys=True)
        for r in rows
    )


@pytest.mark.parametrize("case", CASES)
def test_golden(spark, case):
    d = os.path.join(GOLDEN_ROOT, case)
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".ndjson") and fn != "expect.ndjson":
            view = fn[: -len(".ndjson")]
            spark.read.json(os.path.join(d, fn)).createOrReplaceTempView(view)
    with open(os.path.join(d, "query.sql")) as fh:
        got = spark.sql(fh.read()).toPandas().to_dict("records")
    with open(os.path.join(d, "expect.ndjson")) as fh:
        exp = [json.loads(line) for line in fh if line.strip()]
    assert _normalize(got) == _normalize(exp), f"golden case {case!r} diverged"
