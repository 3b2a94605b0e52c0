"""Similarity search over embedding columns.

- ``cosine_topk``       — brute-force exact top-k vs a query vector (the
  baseline; see ``queries.q_cosine_topk`` which is oracle-checked).
- ``cosine_all_pairs``  — exact pairwise sims above a threshold (small N).
- ``lsh_candidate_pairs`` — random-hyperplane (sign) LSH: H deterministic
  pseudo-random planes (seeded from xxhash64, JVM-side), signature = H sign
  bits, banded equality join for candidates, exact re-score. The scale path:
  candidate generation is linear in rows × bands instead of quadratic.
- ``sign_lsh_topk_pairs`` — the same banded sign-LSH pipeline with
  ±1 plane weights derived from md5 (``deterministic_sign_planes``): no RNG
  state anywhere, so an independent SQL engine reproduces the signatures,
  bands, candidates and rescoring bit-for-bit — the oracle-checkable form
  of the embedding near-dup family (``queries.q_signlsh_topk_pairs``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine_sim(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _planes(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).tolist()


def lsh_signature(vec_col, planes: list[list[float]]):
    """Bit array: sign of <v, plane_p> for each plane."""
    bits = []
    for p in planes:
        pc = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(_dot(vec_col, pc) >= 0, F.lit(1)).otherwise(F.lit(0)))
    return F.array(*bits)


def _banded_candidate_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    bands: int,
) -> DataFrame:
    """Shared banded-LSH candidate scoring: sign signature → band keys →
    self-equi-join → (id_a, id_b, cos_sim) distinct. One explode + one
    equi-join; linear in rows × bands, never quadratic.

    Two scale choices that matter once candidates number in the millions:
    vectors are UNIT-NORMALIZED once per row before the explode (O(rows)),
    so the per-candidate rescore is a single dot product; and the cosine is
    computed INSIDE the join projection so the distinct (a pair can match
    in several bands) deduplicates 3 scalar columns, never rows carrying
    two vector payloads."""
    num_planes = len(planes)
    v = F.col(vec_col).cast("array<double>")
    # norm computed ONCE per row (a transform lambda would re-evaluate the
    # aggregate per element — O(dim²) per row)
    sig = df.select(
        id_col,
        v.alias("_v"),
        _norm(v).alias("_n"),
        lsh_signature(v, planes).alias("sig"),
    ).select(
        id_col,
        F.transform(F.col("_v"), lambda x: x / F.col("_n")).alias(vec_col),
        "sig",
    )
    rpb = num_planes // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.array_join(
                F.transform(F.slice("sig", b * rpb + 1, rpb), lambda x: x.cast("string")), ""
            ).alias("key"),
        )
        for b in range(bands)
    ]
    banded = sig.select(id_col, vec_col, F.explode(F.array(*band_structs)).alias("bk")).select(
        id_col, vec_col, "bk.band", "bk.key"
    )
    a, b2 = banded.alias("a"), banded.alias("b")
    # unit vectors: dot IS cosine (a 64-term element_at expansion was
    # measured 2.5× SLOWER than the zip_with/aggregate fold — per-call
    # array bounds checks beat the fold's single pass, so HOF it is)
    sim = _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(sim, 6).alias("cos_sim"),
        )
        .distinct()
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    bands: int = 4,
    threshold: float = 0.6,
    seed: int = 7,
) -> DataFrame:
    """Near-dup embedding pairs: LSH band join → exact cosine filter."""
    dim = len(df.select(vec_col).first()[0])
    planes = _planes(dim, num_planes, seed)
    cand = _banded_candidate_pairs(df, id_col, vec_col, planes, bands)
    return cand.where(F.col("cos_sim") >= threshold)


def deterministic_sign_planes(dim: int, num_planes: int) -> list[list[float]]:
    """±1 plane weights from md5(p:j) — no RNG state, reproducible in any
    engine or runtime, which is what makes the sign-LSH pipeline
    oracle-checkable cross-engine (numpy-seeded planes are not)."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[0], 16) < 8 else -1.0
            for j in range(dim)
        ]
        for p in range(num_planes)
    ]


def sign_lsh_topk_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    bands: int = 4,
    k: int = 20,
) -> DataFrame:
    """Top-k most-similar candidate pairs through the full deterministic
    sign-LSH pipeline (signature → bands → candidate join → exact cosine
    rescore → ordered top-k). No threshold: on a corpus with no true
    near-dups this still exercises — and oracle-checks — every stage."""
    dim = len(df.select(vec_col).first()[0])
    planes = deterministic_sign_planes(dim, num_planes)
    cand = _banded_candidate_pairs(df, id_col, vec_col, planes, bands)
    return cand.orderBy(F.col("cos_sim").desc(), "id_a", "id_b").limit(k)


def ivf_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    assign_mode: str = "auto",
    seed_hash: str = "xxhash64",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """IVF coarse quantizer with deterministic centroids: the n_cells rows
    with the smallest hash(id) are the centroids (seedless, stable);
    every vector is assigned to its nearest centroid by cosine. Returns
    (assigned_df with `cell` column, centroids). Assignment is map-side in
    both modes — no shuffle; cells become the partition pruning unit for
    probes (the inverted-file idea).

    seed_hash picks the centroid ranking hash: "xxhash64" (JVM-cheap,
    production default) or "md5" (functions.md5_uniform32 — reproducible
    in any SQL engine, which is what makes the assignment oracle-checkable
    cross-engine; see queries.q_ivf_assign).

    assign_mode:
      - "expr"   — an n_cells-wide Column expression (pure Catalyst). Fine
        for tens of cells; Janino codegen blows up at thousands.
      - "pandas" — Arrow-batched ``mapInPandas``: one numpy (batch × cells)
        matmul argmax per batch against the broadcast centroid matrix. The
        scale path for production cell counts (n_cells in the thousands).
      - "auto"   — expr for n_cells <= 64, pandas above. Both modes break
        similarity ties toward the HIGHEST cell id, so they are
        equality-testable."""
    if seed_hash == "xxhash64":
        hcol = F.xxhash64(F.col(id_col))
    elif seed_hash == "md5":
        from ..functions import md5_uniform32

        hcol = md5_uniform32(F.col(id_col))
    else:
        raise ValueError(f"unknown seed_hash {seed_hash!r}")
    seeds = (
        df.select(id_col, vec_col, hcol.alias("_h"))
        .orderBy("_h", id_col)
        .limit(n_cells)
        .collect()
    )
    centroids = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(seeds)]
    if assign_mode == "auto":
        assign_mode = "expr" if n_cells <= 64 else "pandas"
    if assign_mode == "expr":
        v = F.col(vec_col).cast("array<double>")
        scored = F.array(
            *[
                F.struct(
                    cosine_sim(v, F.array(*[F.lit(x) for x in c])).alias("sim"),
                    F.lit(i).alias("cell"),
                )
                for i, c in centroids
            ]
        )
        assigned = df.withColumn("cell", F.array_max(scored)["cell"])
        return assigned, centroids
    if assign_mode != "pandas":
        raise ValueError(f"unknown assign_mode {assign_mode!r}")

    import pandas as pd  # noqa: F401  (mapInPandas batches are pandas)
    from pyspark.sql import types as T

    C = np.array([c for _i, c in centroids], dtype=float)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("cell", T.IntegerType())]
    )
    ncells = len(centroids)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(x, dtype=float) for x in pdf[vec_col]])
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
            sims = Vn @ Cn.T  # (batch, n_cells)
            # argmax over the REVERSED cell axis → ties go to the highest
            # cell id, matching the expr mode's struct-max comparison
            cells = (ncells - 1) - sims[:, ::-1].argmax(axis=1)
            pdf = pdf.copy()
            pdf["cell"] = cells.astype("int32")
            yield pdf

    return df.mapInPandas(assign, out_schema), centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """ANN search: score the query against centroids driver-side, scan only
    the nprobe nearest cells, exact re-rank inside them. Scan cost drops by
    ~n_cells/nprobe vs brute force; recall tested vs the exact baseline."""
    q = np.array(query_vec, dtype=float)

    def cos(c):
        c = np.array(c, dtype=float)
        return float(c @ q / (np.linalg.norm(c) * np.linalg.norm(q)))

    probe_cells = [i for i, _c in sorted(centroids, key=lambda t: -cos(t[1]))[:nprobe]]
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_sim(F.col(vec_col).cast("array<double>"), qcol)
    return (
        assigned.where(F.col("cell").isin(probe_cells))
        .select(id_col, F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_all_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.6,
) -> DataFrame:
    """Exact quadratic baseline (ground truth for LSH recall tests)."""
    a, b = df.alias("a"), df.alias("b")
    sim = cosine_sim(
        F.col(f"a.{vec_col}").cast("array<double>"), F.col(f"b.{vec_col}").cast("array<double>")
    )
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(sim, 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
