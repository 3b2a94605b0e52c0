"""Connected components (dup clustering) + sequence packing operators."""

import random

import pytest
from pyspark.sql import functions as F

from bigquery_etl_fork_spark.operators.cluster import (
    connected_components,
    dedup_clusters,
)
from bigquery_etl_fork_spark.operators.packing import (
    assign_sequences,
    pack_sequences,
)


# ---------------- connected components ----------------


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    labels = {}
    for v in range(n_nodes):
        r = find(v)
        labels.setdefault(r, set()).add(v)
    return {v: min(mem) for mem in labels.values() for v in mem}


def _cc_spark(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(df).collect()
    assert len({r["node"] for r in got}) == len(got), "duplicate node labels"
    return {r["node"]: r["component"] for r in got}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_matches_union_find_random(spark, seed):
    rng = random.Random(seed)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    expect = _union_find(n, edges)
    got = _cc_spark(spark, [(int(a), int(b)) for a, b in edges])
    touched = {v for e in edges if e[0] != e[1] for v in e}
    for v in touched:
        assert got[v] == expect[v], f"node {v}"


def test_cc_long_chain_converges(spark):
    # a 300-node path is the adversarial case for naive label propagation
    # (O(diameter) rounds); large/small star must finish in O(log n).
    got = _cc_spark(spark, [(i, i + 1) for i in range(300)])
    assert set(got.values()) == {0} and len(got) == 301


def test_cc_chain_and_noise(spark):
    chain = [(i, i + 1) for i in range(0, 60)]
    # duplicates, reversed duplicates, and self-loops must be harmless
    edges = chain + [(5, 4), (10, 10), (3, 4), (59, 60)]
    got = _cc_spark(spark, [(int(a), int(b)) for a, b in edges])
    assert set(got.values()) == {0}
    assert len(got) == 61


def test_cc_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0


def test_dedup_clusters_singletons_and_canonicals(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long"
    )
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert rows[3]["cluster_id"] == 1 and rows[3]["cluster_size"] == 3
    assert rows[8]["cluster_id"] == 7 and rows[8]["cluster_size"] == 2
    for v in (0, 4, 5, 6, 9):  # singletons are their own canonical cluster
        assert rows[v]["cluster_id"] == v and rows[v]["cluster_size"] == 1
    canon = [r for r in rows.values() if r["is_canonical"]]
    assert len(canon) == len({r["cluster_id"] for r in rows.values()})
    # the dedup keep-list: one survivor per cluster
    assert sum(1 for r in canon if r["cluster_size"] > 1) == 2


def test_simhash_max_chunk_caps_dense_buckets(spark):
    """The bounded-fan-out cap: a dense near-identical family stops
    producing quadratic pairs, sparse docs are unaffected."""
    from bigquery_etl_fork_spark.operators.dedup_text import simhash_near_pairs

    dense = [(i, "alpha beta gamma delta epsilon zeta") for i in range(30)]
    sparse = [  # a 2-doc family: dense enough to pair, far under the cap
        (100, "totally different words appear here now"),
        (101, "totally different words appear here now"),
    ]
    df = spark.createDataFrame(dense + sparse, "doc_id long, text string")
    uncapped = simhash_near_pairs(df, "doc_id", "text").count()
    capped = simhash_near_pairs(df, "doc_id", "text", max_chunk=10)
    rows = capped.collect()
    assert uncapped >= 30 * 29 / 2  # the dense family alone is quadratic
    pair_ids = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert (100, 101) in pair_ids  # sparse near-dups survive the cap
    assert all(a >= 100 for a, _ in pair_ids)  # dense family fully capped


# ---------------- sequence packing ----------------


def _greedy(lens, max_len):
    seqs, acc, s = [], -1, -1
    for n in lens:
        if acc < 0 or acc + n > max_len:
            s, acc = s + 1, n
        else:
            acc += n
        seqs.append(s)
    return seqs


def test_assign_sequences_matches_greedy(spark):
    rng = random.Random(7)
    rows = [(i, rng.randrange(1, 120)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = assign_sequences(
        df, "doc_id", "n_tok", max_len=256, bucket=F.pmod("doc_id", F.lit(4))
    ).collect()
    by_bucket = {}
    for i, n in rows:
        by_bucket.setdefault(i % 4, []).append((i, n))
    expect = {}
    for b, docs in by_bucket.items():
        docs.sort()
        for (i, _), s in zip(docs, _greedy([n for _, n in docs], 256)):
            expect[i] = (b, s)
    assert len(got) == 200
    for r in got:
        assert (r["bucket"], r["seq_idx"]) == expect[r["doc_id"]], r["doc_id"]


def test_assign_sequences_oversize_doc_isolated(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 999), (3, 10), (4, 10)], "doc_id long, n_tok long"
    )
    got = {
        r["doc_id"]: r["seq_idx"]
        for r in assign_sequences(
            df, "doc_id", "n_tok", max_len=100, bucket=F.lit(0)
        ).collect()
    }
    # the oversize doc occupies its own sequence; neighbors are unaffected
    assert got == {1: 0, 2: 1, 3: 2, 4: 2}


def test_assign_sequences_null_length_rejected(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None)], "doc_id long, n_tok long"
    )
    with pytest.raises(Exception, match="non-null"):
        assign_sequences(
            df, "doc_id", "n_tok", max_len=100, bucket=F.lit(0)
        ).collect()


def test_pack_sequences_token_concat_and_invariants(spark):
    rng = random.Random(3)
    rows = [
        (i, [rng.randrange(0, 50000) for _ in range(rng.randrange(2, 40))])
        for i in range(80)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<int>"
    ).withColumn("n_tok", F.size("tokens").cast("long"))
    packed = pack_sequences(
        df, "doc_id", "n_tok", max_len=64,
        bucket=F.pmod("doc_id", F.lit(3)), tokens_col="tokens",
    ).collect()
    toks = dict(rows)
    seen = []
    for r in packed:
        assert r["n_docs"] == len(r["doc_ids"])
        assert r["doc_ids"] == sorted(r["doc_ids"])  # id-order packing
        flat = [t for d in r["doc_ids"] for t in toks[d]]
        assert r["tokens"] == flat, "token arrays must concatenate in id order"
        assert r["n_tok"] == len(flat)
        if all(len(toks[d]) <= 64 for d in r["doc_ids"]):
            assert r["n_tok"] <= 64
        seen.extend(r["doc_ids"])
    assert sorted(seen) == list(range(80))  # every doc packed exactly once


def test_pack_sequences_deterministic_across_partitioning(spark):
    rows = [(i, (i * 37) % 90 + 5) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    a = pack_sequences(
        df.repartition(13), "doc_id", "n_tok", 128, F.pmod("doc_id", F.lit(5))
    )
    b = pack_sequences(
        df.coalesce(1), "doc_id", "n_tok", 128, F.pmod("doc_id", F.lit(5))
    )
    ka = sorted((r["bucket"], r["seq_idx"], tuple(r["doc_ids"])) for r in a.collect())
    kb = sorted((r["bucket"], r["seq_idx"], tuple(r["doc_ids"])) for r in b.collect())
    assert ka == kb


def test_cc_string_keys(spark):
    """The north-star doc_id is a string; min-label must work on the
    lexicographic order."""
    pairs = spark.createDataFrame(
        [("doc_b", "doc_a"), ("doc_c", "doc_b"), ("zz", "yy")],
        "src string, dst string",
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {
        "doc_a": "doc_a", "doc_b": "doc_a", "doc_c": "doc_a",
        "yy": "yy", "zz": "yy",
    }


# ---------------- tokens-native near-dup (north-star shape, no text) ------


def test_minhash_over_token_arrays(spark):
    """The dedup kernels accept ARRAY columns directly: identical token
    sequences pair at est_jaccard 1.0, a one-token edit pairs high, and
    disjoint sequences don't pair."""
    from bigquery_etl_fork_spark.operators.dedup_text import minhash_lsh_pairs

    base = list(range(1000, 1040))
    edited = base[:20] + [9999] + base[21:]
    rows = [
        (1, base),
        (2, list(base)),        # exact duplicate
        (3, edited),            # near duplicate
        (4, list(range(5000, 5040))),  # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(df, "doc_id", "tokens").collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert pairs.get((1, 3), 0) >= 0.5
    assert not any(4 in p for p in pairs)


def test_simhash_over_token_arrays(spark):
    from bigquery_etl_fork_spark.operators.dedup_text import simhash_near_pairs

    rows = [
        (1, [7, 8, 9, 10, 11, 12]),
        (2, [7, 8, 9, 10, 11, 12]),
        (3, [700, 800, 900, 1000, 1100, 1200]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
           simhash_near_pairs(df, "doc_id", "tokens").collect()}
    assert got.get((1, 2)) == 0
    assert (1, 3) not in got and (2, 3) not in got
