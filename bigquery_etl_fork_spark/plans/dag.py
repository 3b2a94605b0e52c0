"""Dependency-graph pipeline runner — the DAG layer, Spark-native.

The reference's largest subsystem generates Airflow DAGs out of per-query
scheduling metadata (bigquery_etl/query_scheduling/generate_airflow_dags.py
+ dags.yaml: each derived table names its upstreams; Airflow runs them in
topological order and skips work whose upstreams produced nothing new).
Codegen for an external scheduler is a non-goal here (SURVEY §7.4); what a
Spark engine needs is the semantic core: a declared DAG of derivations run
in dependency order, where each node can observe its upstreams' reported
versions and skip itself when nothing moved — so a scheduled re-run of the
whole pipeline costs only the nodes downstream of actual change.

A node is (name, deps, run). ``run(ctx)`` receives a context dict holding
every upstream's return value under its name and returns this node's value
— for engine nodes, conventionally a dict with a ``version`` key
(CDCEngine replay stats, IncrementalRollup.refresh(), LakeTable snapshot
versions all provide one naturally). Determinism and atomicity live in the
nodes (epoch fencing, rollup version fences); the runner adds ordering,
cycle detection, per-node wall/skip accounting, and fail-fast with a
record of what did and didn't run.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

__all__ = ["Node", "Pipeline", "CycleError"]


class CycleError(ValueError):
    pass


@dataclass
class Node:
    name: str
    run: Callable[[dict[str, Any]], Any]
    deps: list[str] = field(default_factory=list)
    # optional: given the context, decide this node has no work this run.
    # Evaluated after deps complete; a skipped node publishes None to the
    # context (downstreams read it with ctx.get and treat None as "no new
    # output"), and its downstreams still run — skip is "nothing new", not
    # failure.
    skip_if: Callable[[dict[str, Any]], bool] | None = None


class Pipeline:
    """A static DAG of named nodes executed in topological order.

    Example::

        p = Pipeline()
        p.add("ingest", run=lambda ctx: engine.replay(log))
        p.add("daily_rollup", deps=["ingest"], run=lambda ctx: mv.refresh())
        p.add("export", deps=["daily_rollup"],
              skip_if=lambda ctx: ctx["daily_rollup"]["mode"] == "noop",
              run=lambda ctx: export_json(mv.read(), out_dir))
        report = p.run()
    """

    def __init__(self) -> None:
        self._nodes: dict[str, Node] = {}

    def add(
        self,
        name: str,
        run: Callable[[dict[str, Any]], Any],
        deps: list[str] | None = None,
        skip_if: Callable[[dict[str, Any]], bool] | None = None,
    ) -> "Pipeline":
        if name in self._nodes:
            raise ValueError(f"duplicate node {name!r}")
        self._nodes[name] = Node(name, run, list(deps or []), skip_if)
        return self

    def topo_order(self) -> list[str]:
        """Kahn's algorithm; deterministic (insertion order among ready
        nodes); raises CycleError naming the cycle's residue."""
        for n in self._nodes.values():
            for d in n.deps:
                if d not in self._nodes:
                    raise ValueError(f"node {n.name!r} depends on unknown {d!r}")
        indeg = {n: 0 for n in self._nodes}
        for n in self._nodes.values():
            for _ in n.deps:
                indeg[n.name] += 1
        ready = [n for n in self._nodes if indeg[n] == 0]
        order: list[str] = []
        while ready:
            cur = ready.pop(0)
            order.append(cur)
            for n in self._nodes.values():
                if cur in n.deps:
                    indeg[n.name] -= 1
                    if indeg[n.name] == 0:
                        ready.append(n.name)
        if len(order) != len(self._nodes):
            residue = sorted(set(self._nodes) - set(order))
            raise CycleError(f"dependency cycle among {residue}")
        return order

    def run(self, fail_fast: bool = True) -> dict[str, Any]:
        """Execute the DAG. Returns a report::

            {"ok": bool,
             "nodes": {name: {"status": ran|skipped|failed|blocked,
                              "seconds": float, "value": Any}},
             "order": [...]}

        With ``fail_fast`` (default) the first failure stops the run and
        every not-yet-run downstream is marked blocked; with it off,
        failures only block their own descendants and independent branches
        still run — Airflow's trigger-rule default, which is what a
        many-table nightly wants.
        """
        order = self.topo_order()
        ctx: dict[str, Any] = {}
        report: dict[str, Any] = {"ok": True, "nodes": {}, "order": order}
        failed_or_blocked: set[str] = set()
        for name in order:
            node = self._nodes[name]
            entry: dict[str, Any] = {"status": "ran", "seconds": 0.0, "value": None}
            report["nodes"][name] = entry
            if any(d in failed_or_blocked for d in node.deps) or (
                not report["ok"] and fail_fast
            ):
                entry["status"] = "blocked"
                failed_or_blocked.add(name)
                continue
            t0 = time.time()
            try:
                if node.skip_if is not None and node.skip_if(ctx):
                    entry["status"] = "skipped"
                    ctx[name] = None
                else:
                    value = node.run(ctx)
                    ctx[name] = value
                    entry["value"] = value
            except Exception as e:  # noqa: BLE001 — reported, not swallowed
                entry["status"] = "failed"
                entry["error"] = f"{type(e).__name__}: {e}"
                report["ok"] = False
                failed_or_blocked.add(name)
            entry["seconds"] = round(time.time() - t0, 3)
        return report
