"""Distributed connected components + duplicate-cluster assignment.

Near-dup detection (minhash/simhash/embedding LSH) emits PAIRS; a real
dedup pipeline needs GROUPS — every document labeled with the id of its
duplicate cluster so one canonical survivor per cluster can be kept. The
reference expresses the grouping implicitly inside its copy_deduplicate
job (bigquery_etl/copy_deduplicate.py — one surviving row per
document_id); at 100 TB the pair graph itself is large, so the
grouping must be a distributed fixed-point computation, not a driver-side
union-find.

``connected_components`` is the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) expressed in pure DataFrame ops: every round is a
groupBy (min per node) plus a join, both shuffling on the node id, and
the edge set provably converges in O(log^2 n) rounds to a star forest
where every node points at its component's minimum id. No step ever
materializes a component on the driver; the only driver-side values are
an O(1) convergence fingerprint per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_clusters"]


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """(child, parent) with parent < child; self-loops and dup edges dropped."""
    e = edges.select(F.col(src).alias("c"), F.col(dst).alias("p"))
    return (
        e.where(F.col("c") != F.col("p"))
        .select(
            F.greatest("c", "p").alias("c"),
            F.least("c", "p").alias("p"),
        )
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """For every node n: link each strictly-larger neighbor to
    min(N(n) + {n}). Input/output edges are (c, p) with p < c."""
    nbrs = e.union(e.select(F.col("p").alias("c"), F.col("c").alias("p")))
    mins = nbrs.groupBy("c").agg(F.min("p").alias("m"))
    mins = mins.select("c", F.least("c", "m").alias("m"))
    return (
        nbrs.join(mins, "c")
        .where(F.col("p") > F.col("c"))
        .select(F.col("p").alias("c"), F.col("m").alias("p"))
        .where(F.col("c") != F.col("p"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For every node c with parent set P(c): link c and every parent to
    m = min(P(c)). Input/output edges are (c, p) with p < c."""
    mins = e.groupBy("c").agg(F.min("p").alias("m"))
    j = e.join(mins, "c")
    relinked = (
        j.where(F.col("p") != F.col("m"))
        .select(F.col("p").alias("c"), F.col("m").alias("p"))
    )
    return (
        relinked.union(mins.select("c", F.col("m").alias("p")))
        .where(F.col("c") != F.col("p"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum node
    id of its connected component.

    Returns (node, component). Nodes that appear in no edge are unknown to
    this operator — callers left-join and coalesce (see ``dedup_clusters``).

    Scale notes: each round is two shuffles keyed on the node id; the edge
    set shrinks monotonically toward one edge per non-root node, so later
    rounds are cheaper than the first. Every round is ``localCheckpoint``ed
    to truncate the iterative plan lineage (on a cluster, set a reliable
    checkpoint dir and swap to ``checkpoint`` if executor loss must be
    survivable mid-computation; the result is deterministic either way).
    Convergence is detected with an O(1) fingerprint aggregate
    (count + sum of xxhash64) — no edge set is ever collected.
    """
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=True)

    def fingerprint(df: DataFrame):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: a long sum of xxhash64 overflows ANSI mode
            F.sum(F.xxhash64("c", "p").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    fp = fingerprint(e)
    if fp[0] == 0:
        return e.select(F.col("c").alias("node"), F.col("p").alias("component"))

    prev = e
    for _ in range(max_iterations):
        nxt = _small_star(_large_star(prev)).localCheckpoint(eager=True)
        nfp = fingerprint(nxt)
        if nfp == fp:
            # fingerprint match is the cheap gate; certify EXACTLY with one
            # set-difference job so a hash collision can never bless a
            # non-terminal state: both sides are duplicate-free with equal
            # counts (part of the fingerprint), so nxt ⊆ prev ⇒ nxt = prev.
            if not nxt.exceptAll(prev).take(1):
                prev.unpersist()
                prev = nxt
                break
        prev.unpersist()
        prev, fp = nxt, nfp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )

    children = prev.select(F.col("c").alias("node"), F.col("p").alias("component"))
    roots = prev.select(F.col("p").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    return children.union(roots)


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Assign every document to its duplicate cluster.

    ``pairs`` is any near-dup pair frame (minhash_lsh_pairs,
    simhash_near_pairs, embedding LSH ...). Output is one row per input
    document: (id_col, cluster_id, cluster_size, is_canonical) where
    cluster_id is the minimum member id, singletons are their own cluster,
    and exactly one member per cluster is canonical — the keep-list of a
    dedup job is ``WHERE is_canonical``.
    """
    cc = connected_components(pairs, src=src, dst=dst)
    assigned = (
        docs.select(id_col)
        .join(cc.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
    )
    sizes = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return assigned.join(sizes, "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        (F.col(id_col) == F.col("cluster_id")).alias("is_canonical"),
    )
