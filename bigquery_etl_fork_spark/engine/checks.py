"""Post-commit data-quality checks — the ``checks.sql`` runner analog.

Re-expresses the reference's runtime check macros
(``tests/checks/*.jinja``: ``is_unique``, ``min_row_count``, ``not_null``,
``in_range``, ``accepted_values``, ``matches_pattern``, ``value_length``)
with the same #warn/#fail severity split
(``telemetry_derived/clients_last_seen_v2/checks.sql:1-6``,
``bigquery_etl/cli/check.py:104-288``).

Each check compiles to ONE aggregate expression; ``run_checks`` evaluates
all of them in a single pass over the DataFrame (one job, map-side
combined), then raises on any failed #fail check.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WARN, FAIL = "warn", "fail"


@dataclass
class Check:
    name: str
    expr: Column  # aggregate expr -> violation count (0 = pass)
    severity: str = FAIL


@dataclass
class CheckReport:
    results: list[dict[str, Any]] = field(default_factory=list)

    @property
    def failed(self) -> list[dict[str, Any]]:
        return [r for r in self.results if r["violations"] > 0 and r["severity"] == FAIL]

    @property
    def warned(self) -> list[dict[str, Any]]:
        return [r for r in self.results if r["violations"] > 0 and r["severity"] == WARN]


class CheckFailure(AssertionError):
    pass


def is_unique(cols: list[str], severity: str = FAIL) -> Check:
    """#violations = total rows - distinct key rows."""
    return Check(
        f"is_unique({','.join(cols)})",
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols])).cast("long"),
        severity,
    )


def min_row_count(n: int, severity: str = FAIL) -> Check:
    return Check(
        f"min_row_count({n})",
        F.when(F.count(F.lit(1)) < n, F.lit(1)).otherwise(F.lit(0)).cast("long"),
        severity,
    )


def not_null(cols: list[str], severity: str = FAIL) -> Check:
    viol = None
    for c in cols:
        v = F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
        viol = v if viol is None else viol + v
    return Check(f"not_null({','.join(cols)})", viol.cast("long"), severity)


def in_range(col: str, lo: Any, hi: Any, severity: str = FAIL) -> Check:
    return Check(
        f"in_range({col},[{lo},{hi}])",
        F.sum(
            F.when(F.col(col).isNotNull() & ~F.col(col).between(lo, hi), 1).otherwise(0)
        ).cast("long"),
        severity,
    )


def accepted_values(col: str, values: list[Any], severity: str = FAIL) -> Check:
    return Check(
        f"accepted_values({col})",
        F.sum(
            F.when(F.col(col).isNotNull() & ~F.col(col).isin(values), 1).otherwise(0)
        ).cast("long"),
        severity,
    )


def matches_pattern(col: str, pattern: str, severity: str = WARN) -> Check:
    return Check(
        f"matches_pattern({col})",
        F.sum(
            F.when(F.col(col).isNotNull() & ~F.col(col).rlike(pattern), 1).otherwise(0)
        ).cast("long"),
        severity,
    )


def value_length(col: str, n: int, severity: str = WARN) -> Check:
    return Check(
        f"value_length({col},{n})",
        F.sum(F.when(F.length(col) != n, 1).otherwise(0)).cast("long"),
        severity,
    )


def array_len_equals(arr_col: str, len_col: str, severity: str = FAIL) -> Check:
    """Engine-specific invariant: n_tok == size(tokens) (input_hint)."""
    return Check(
        f"array_len_equals({arr_col},{len_col})",
        F.sum(
            F.when(
                F.col(arr_col).isNotNull() & (F.size(arr_col) != F.col(len_col)), 1
            ).otherwise(0)
        ).cast("long"),
        severity,
    )


def row_count_within_past_partitions_avg(
    table,
    num_past: int = 7,
    threshold_pct: float = 25.0,
    severity: str = WARN,
    raise_on_fail: bool = False,
) -> CheckReport:
    """The reference's ``row_count_within_past_partitions_avg`` macro
    (``tests/checks/row_count_within_past_partitions_avg.jinja``): flag the
    newest partition when its row volume drifts more than ``threshold_pct``
    from the average of the ``num_past`` preceding partitions. Partitions
    here are epochs; per-epoch applied-row counts come from the lineage
    manifest (Parquet footer stats recorded at commit time), so this runs
    ZERO Spark jobs — pure driver-side metadata, O(history) JSON."""
    per_epoch: dict[int, int] = {}
    for row in table.manifest_rows():
        ep = row.get("epoch")
        if ep is None:
            continue
        per_epoch[ep] = per_epoch.get(ep, 0) + int(row.get("rows_upserted") or 0) + int(
            row.get("rows_deleted") or 0
        )
    epochs = sorted(per_epoch)
    name = f"row_count_within_past_partitions_avg({num_past},{threshold_pct}%)"
    if len(epochs) < num_past + 1:
        report = CheckReport(
            results=[{"name": name, "severity": severity, "violations": 0,
                      "skipped": f"need {num_past + 1} epochs, have {len(epochs)}"}]
        )
        return report
    cur = per_epoch[epochs[-1]]
    past = [per_epoch[e] for e in epochs[-num_past - 1 : -1]]
    avg = sum(past) / len(past)
    drift_pct = abs(cur - avg) / avg * 100 if avg else (100.0 if cur else 0.0)
    report = CheckReport(
        results=[{"name": name, "severity": severity,
                  "violations": int(drift_pct > threshold_pct),
                  "current": cur, "past_avg": round(avg, 2),
                  "drift_pct": round(drift_pct, 2)}]
    )
    if raise_on_fail and report.failed:
        raise CheckFailure(f"failed checks: {report.failed}")
    return report


def run_checks(df: DataFrame, checks: list[Check], raise_on_fail: bool = True) -> CheckReport:
    """Evaluate every check in one aggregation pass."""
    row = df.agg(*[c.expr.alias(f"c{i}") for i, c in enumerate(checks)]).collect()[0]
    report = CheckReport(
        results=[
            {"name": c.name, "severity": c.severity, "violations": int(row[f"c{i}"] or 0)}
            for i, c in enumerate(checks)
        ]
    )
    if raise_on_fail and report.failed:
        raise CheckFailure(f"failed checks: {report.failed}")
    return report
