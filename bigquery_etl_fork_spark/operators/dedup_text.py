"""Near-duplicate detection for document corpora — training-data pipeline ops.

Four families, all expressed as DataFrame plans (no Python UDFs in the hot
path; hashing via built-in ``md5``/``xxhash64``, JVM-side):

- exact dedup        — content-hash groupBy (see ``queries.q_exact_dedup_docs``)
- MinHash + LSH      — shingle → K minhashes → B bands → bucket self-join.
  Hash values are fixed-width hex slices of md5 digests (4 independent
  32-bit components per digest) so an independent SQL engine (DuckDB
  oracle) reproduces them bit-for-bit; min() over fixed-width hex strings
  is order-isomorphic to min() over the underlying integers. An int64
  xxhash64 mode serves production (no oracle needed).
- SimHash            — 64-bit signature from per-token hash bit votes;
  near-dups = signatures within a Hamming radius (banded for scale).
- n-gram Jaccard     — exact set overlap on word shingles via shingle join.

Scale shape: everything is explode → hash → groupBy (map-side combined) →
equi-join on band/bucket keys; no cross joins. At 100 TB the band join is
the standard LSH trick that keeps candidate generation near-linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

DEFAULT_SHINGLE_N = 3


def words_col(text_col: str = "text"):
    return F.split(F.col(text_col), " ")


def shingles_expr(text_col: str = "text", n: int = DEFAULT_SHINGLE_N):
    """Word n-gram shingles; a doc shorter than n words is its own shingle
    (mirrored exactly in the DuckDB oracle SQL)."""
    w = words_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.array_join(F.slice(w, i + 1, n), " "),
    )
    return F.when(F.size(w) >= n, grams).otherwise(F.array(F.col(text_col)))


def array_shingles_expr(arr_col: str, n: int = DEFAULT_SHINGLE_N):
    """n-gram shingles over an ARRAY column (the tokens-native form: the
    north-star table carries token ids, not text). Elements are cast to
    string and joined with '_', so any element type works; an array shorter
    than n is its own shingle, mirroring the text form."""
    a = F.transform(F.col(arr_col), lambda t: t.cast("string"))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(a) - n),
        lambda i: F.array_join(F.slice(a, i + 1, n), "_"),
    )
    return F.when(F.size(a) >= n, grams).otherwise(F.array(F.array_join(a, "_")))


def _shingles_for(df: DataFrame, col: str, n: int):
    """Pick the shingle form by column type: array columns shingle over
    elements (tokens-native), string columns over words — so every dedup
    kernel downstream (minhash/LSH) works unchanged on either."""
    if dict(df.dtypes)[col].startswith("array"):
        return array_shingles_expr(col, n)
    return shingles_expr(col, n)


def shingled(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3):
    """(id, shingle) exploded + de-duplicated per doc; text or token-array."""
    return (
        df.select(id_col, F.explode(_shingles_for(df, text_col, n)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    hash_mode: str = "md5hex",
) -> DataFrame:
    """One row per doc with columns h0..h{K-1}: the K minhash values.

    hash_mode:
      - "md5hex"   — 8-hex-char (32-bit) slices of md5 digests, min'd as
        strings. Cross-engine deterministic (md5 is the one hash Spark and
        DuckDB share), which is what makes the LSH query oracle-checkable
        bit-for-bit. One md5 per shingle yields FOUR independent 32-bit
        minhash components (digest sliced at 8-char offsets), so K hashes
        cost K/4 md5 invocations — md5 is the dominant cost of the
        signature stage.
      - "xxhash64" — int64 signatures (JVM xxhash64). 8 bytes/hash vs hex
        strings: less signature state shuffled/stored — the production
        path when no cross-engine oracle is needed."""
    sh = shingled(df, id_col, text_col, n)
    if hash_mode == "xxhash64":
        aggs = [
            F.min(F.xxhash64(F.concat(F.lit(f"{k}:"), F.col("shingle")))).alias(f"h{k}")
            for k in range(num_hashes)
        ]
    elif hash_mode == "md5hex":
        aggs = [
            F.min(
                F.substring(
                    F.md5(F.concat(F.lit(f"{k // 4}:"), F.col("shingle"))),
                    (k % 4) * 8 + 1,
                    8,
                )
            ).alias(f"h{k}")
            for k in range(num_hashes)
        ]
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    hash_mode: str = "md5hex",
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH + their estimated Jaccard
    (fraction of matching minhash components). Deterministic; the md5hex
    mode is oracle-checked, the xxhash64 mode is the compact production
    signature (see minhash_signatures)."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes, hash_mode)

    band_keys = []
    for b in range(bands):
        cols = [F.col(f"h{k}") for k in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_keys.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("key"))
        )
    banded = sigs.select(
        id_col, *[F.col(f"h{k}") for k in range(num_hashes)],
        F.explode(F.array(*band_keys)).alias("bk"),
    ).select(id_col, *[f"h{k}" for k in range(num_hashes)], "bk.band", "bk.key")

    a = banded.alias("a")
    b2 = banded.alias("b")
    pairs = (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            *[
                (F.col(f"a.h{k}") == F.col(f"b.h{k}")).cast("int").alias(f"m{k}")
                for k in range(num_hashes)
            ],
        )
        .distinct()
    )
    est = sum(F.col(f"m{k}") for k in range(num_hashes)) / F.lit(float(num_hashes))
    return pairs.select(
        "doc_a", "doc_b", F.round(est, 4).alias("est_jaccard")
    ).distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.1,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing ≥1 shingle.

    ``max_df`` caps shingle document frequency BEFORE the self-join: a
    shingle appearing in k docs produces k(k-1)/2 candidate pairs, so one
    boilerplate shingle shared by 10^6 docs would explode quadratically at
    corpus scale. Dropping shingles with df > max_df bounds any shingle's
    pair fan-out at max_df²/2; Jaccard is then computed over the surviving
    (informative) shingle set on both the intersection AND size sides, so
    the result is an exact Jaccard over that set (the standard stop-shingle
    treatment, mirrored in the DuckDB oracle)."""
    sh = shingled(df, id_col, text_col, n)
    if max_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    j = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ).alias("jaccard"),
        )
    )
    return j.where(F.col("jaccard") >= threshold)


def contamination_pairs(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    n: int = 13,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Training-set contamination against a benchmark/eval set by EXACT
    n-gram overlap (the GPT-3/PaLM decontamination rule: a training doc is
    contaminated if it shares any length-n token/word gram with an eval
    example). Returns (id, bench_id, n_shared) per overlapping pair.

    Scale shape: both sides shingle with the same kernel as the dedup
    family (text or token-array columns), then ONE equi-join on the
    shingle. The benchmark side is small by definition (eval sets are
    thousands of rows, the corpus is billions), so it broadcasts — the
    corpus never shuffles; candidate generation is a map-side hash probe
    per corpus shingle. Set ``broadcast_bench=False`` only if the
    benchmark's shingles exceed broadcast limits."""
    if bench_id_col not in bench.columns:
        bench = bench.withColumnRenamed(id_col, bench_id_col)
    ds = shingled(docs, id_col, text_col, n)
    bs = shingled(bench, bench_id_col, text_col, n)
    if broadcast_bench:
        bs = F.broadcast(bs)
    return (
        ds.join(bs, "shingle")
        .groupBy(id_col, bench_id_col)
        .agg(F.count("*").alias("n_shared"))
    )


def contaminated_docs(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_shared: int = 1,
) -> DataFrame:
    """Per-doc contamination verdict: (id, n_shared_grams,
    n_bench_examples, contaminated). ``n_shared_grams`` counts the doc's
    DISTINCT shingles that appear anywhere in the benchmark — the quantity
    the usual 'drop if >= k colliding grams' policy thresholds on.

    Single-pass (VERDICT r4 #5): the corpus is shingled ONCE and one
    broadcast join against the benchmark's (bench_id, shingle) relation
    feeds BOTH aggregates — countDistinct(shingle) is exactly the old
    count over the distinct-gram join (shingled() is distinct per doc),
    countDistinct(bench_id) is exactly the old per-pair rollup. At 100 TB
    the second full corpus scan the old two-call shape paid is gone."""
    if "bench_id" not in bench.columns:
        bench = bench.withColumnRenamed(id_col, "bench_id")
    ds = shingled(docs, id_col, text_col, n)
    bs = F.broadcast(shingled(bench, "bench_id", text_col, n))
    stats = (
        ds.join(bs, "shingle")
        .groupBy(id_col)
        .agg(
            F.countDistinct("shingle").alias("n_shared_grams"),
            F.countDistinct("bench_id").alias("n_bench_examples"),
        )
    )
    return (
        docs.select(id_col)
        .join(stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
            F.coalesce("n_bench_examples", F.lit(0)).cast("long").alias("n_bench_examples"),
            (F.coalesce("n_shared_grams", F.lit(0)) >= min_shared).alias(
                "contaminated"
            ),
        )
    )


def _hex_char_val(ch):
    return F.when(ch.isNotNull(), F.instr(F.lit("0123456789abcdef"), ch) - 1)


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per doc: per-word md5 → long; each bit votes ±1.
    Array columns vote per ELEMENT (tokens-native), strings per word."""
    if dict(df.dtypes)[text_col].startswith("array"):
        unit = F.transform(F.col(text_col), lambda t: t.cast("string"))
    else:
        unit = words_col(text_col)
    w = df.select(id_col, F.explode(unit).alias("w"))
    h = F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")  # 60 bits
    nbits = min(bits, 60)
    votes = [
        F.sum(
            (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"v{j}")
        for j in range(nbits)
    ]
    per_doc = w.withColumn("_h", h).groupBy(id_col).agg(*votes)
    sig = None
    for j in range(nbits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << j).cast("long")
        sig = term if sig is None else sig + term
    return per_doc.select(id_col, sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    band_bits: int = 15,
    max_chunk: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 60-bit signature into 4×15-bit
    chunks (pigeonhole: any pair within Hamming ≤ 3×bands/4 shares a band),
    join on band equality, exact Hamming filter.

    ``max_chunk`` caps the docs per (band, chunk) bucket before the
    self-join — the same bounded-fan-out lever as ngram_jaccard's max_df:
    a degenerate near-identical family of size F otherwise costs F²/2
    comparisons in EVERY band it floods. Buckets over the cap are dropped
    whole (deterministic — no sampling). Pairs differing in the flooded
    band still connect through their other bands; a family with IDENTICAL
    signatures floods all bands at once and loses its pairs entirely — run
    exact dedup first (as corpus_prep does) to remove the dominant cause,
    identical texts; what remains above the cap (>max_chunk docs sharing a
    signature, e.g. word-permuted texts) is an accepted recall loss."""
    sigs = simhash_signatures(df, id_col, text_col)
    bands = 60 // band_bits
    mask = (1 << band_bits) - 1
    banded = sigs.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.chunk")
    if max_chunk is not None:
        wcnt = W.partitionBy("band", "chunk")
        banded = (
            banded.withColumn("_cn", F.count(F.lit(1)).over(wcnt))
            .where(F.col("_cn") <= max_chunk)
            .drop("_cn")
        )
    a, b = banded.alias("a"), banded.alias("b")
    hamm = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            hamm.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
