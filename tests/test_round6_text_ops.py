"""Round-6 text-pipeline additions: Gopher-style repetition metrics and
PII detection/scrubbing — unit-level pins with hand-computable inputs
(the sf0.01 DuckDB oracle gate covers the corpus-scale cross-engine
equality; these pin the SEMANTICS on crafted docs)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigquery_etl_fork_spark.operators.text import (  # noqa: E402
    ngrams_col,
    pii_counts,
    pii_scrub,
    top_multiplicity,
    with_repetition_stats,
)


def _one(spark, text: str) -> dict:
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = with_repetition_stats(df, "text").drop("doc_id").collect()[0]
    return row.asDict()


def test_repetition_stats_hand_computed(spark):
    # "a b a b a": words 5, top word 'a' x3; bigrams: 'a b','b a','a b',
    # 'b a' -> top 2, dups 2; trigrams: 'a b a','b a b','a b a' -> dup 1
    got = _one(spark, "a b a b a")
    assert got == {
        "n_words": 5,
        "top_word_cnt": 3,
        "n_bigrams": 4,
        "top_bigram_cnt": 2,
        "dup_bigrams": 2,
        "n_trigrams": 3,
        "dup_trigrams": 1,
    }


def test_repetition_stats_no_repeats_and_short_docs(spark):
    got = _one(spark, "x y z")
    assert got == {
        "n_words": 3,
        "top_word_cnt": 1,
        "n_bigrams": 2,
        "top_bigram_cnt": 1,
        "dup_bigrams": 0,
        "n_trigrams": 1,
        "dup_trigrams": 0,
    }
    # shorter than the gram: empty gram families, zero counts
    got = _one(spark, "solo")
    assert (got["n_bigrams"], got["top_bigram_cnt"], got["n_trigrams"]) == (
        0,
        0,
        0,
    )


def test_top_multiplicity_matches_relational_formulation(spark):
    """The shuffle-free sorted-fold must equal explode -> groupBy -> max
    on random arrays — the exact plan-independence claim the DuckDB
    oracle relies on, pinned engine-internally too."""
    import random

    random.seed(6)
    rows = []
    for i in range(200):
        n = random.randint(1, 40)
        rows.append((i, [random.choice("abcdef") for _ in range(n)]))
    df = spark.createDataFrame(rows, "id long, arr array<string>")
    fold = {
        r["id"]: r["m"]
        for r in df.select("id", top_multiplicity(F.col("arr")).alias("m")).collect()
    }
    rel = {
        r["id"]: r["m"]
        for r in df.select("id", F.explode("arr").alias("x"))
        .groupBy("id", "x")
        .count()
        .groupBy("id")
        .agg(F.max("count").alias("m"))
        .collect()
    }
    assert fold == rel


def test_pii_scrub_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "server 10.0.0.1 and 192.168.1.255 up"),
            (3, "both a@b.io at 8.8.8.8"),
            (4, "clean text without secrets"),
            (5, "almost an ip 1234.1.1.1 and not@adomain"),
        ],
        "id long, text string",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            *[c.alias(n) for n, c in pii_counts("text")],
            pii_scrub("text").alias("s"),
        ).collect()
    }
    assert (out[1]["n_email"], out[1]["n_ipv4"]) == (1, 0)
    assert out[1]["s"] == "mail <EMAIL> now"
    assert (out[2]["n_email"], out[2]["n_ipv4"]) == (0, 2)
    assert out[2]["s"] == "server <IPV4> and <IPV4> up"
    assert out[3]["s"] == "both <EMAIL> at <IPV4>"
    assert out[4]["s"] == "clean text without secrets"
    # word-boundary: '1234.1.1.1' must NOT match (\b\d{1,3} can't start
    # inside 1234); 'not@adomain' lacks a dotted TLD
    assert (out[5]["n_email"], out[5]["n_ipv4"]) == (0, 0)
    assert out[5]["s"] == "almost an ip 1234.1.1.1 and not@adomain"


def test_ngrams_col_boundaries(spark):
    df = spark.createDataFrame([("a b c d",), ("a",)], "text string")
    got = df.select(ngrams_col("text", 3).alias("g")).collect()
    assert got[0]["g"] == ["a b c", "b c d"]
    assert got[1]["g"] == []


def test_repetition_plan_is_shuffle_free(spark):
    """The per-doc metrics must not introduce an Exchange: everything is
    a row-local array fold (the 100-TB argument for this formulation)."""
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 7).cast("string")).alias("text"),
    )
    plan = (
        with_repetition_stats(df, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_gopher_filter_rules_fire_individually(spark):
    """Each filter bit must fire on a doc crafted to trip exactly it —
    incl. the two rules the synthetic corpus never trips (dup-trigram,
    low-alpha)."""
    import tempfile

    from bigquery_etl_fork_spark.queries import QUERIES

    docs = [
        # 0: clean — 20 distinct words, alpha, no repeats
        (0, " ".join(f"w{chr(97+i)}x" for i in range(20)), "en", "s", 0),
        # 1: too short (bit 0) only — distinct words, alpha
        (1, "alpha beta gamma delta", "en", "s", 0),
        # 2: top word > 10% (bit 1): 'spam' x5 of 24 words
        (2, " ".join(["spam"] * 5 + [f"u{chr(97+i)}q" for i in range(19)]),
         "en", "s", 0),
        # 3: dup trigrams > 10% (bit 3): a 6-word phrase repeated 5x (30
        #    words, 28 trigrams, most duplicated) — also trips top-word/
        #    bigram, so expect bits 1|2|3
        (3, " ".join(["one two three four five six"] * 5), "en", "s", 0),
        # 4: low alpha (bit 4): >20% numeric tokens
        (4, " ".join(["123"] * 6 + [f"v{chr(97+i)}r" for i in range(18)]),
         "en", "s", 0),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(td + "/documents.parquet")
        out = {
            r["doc_id"]: (r["reasons"], r["kept"])
            for r in QUERIES["gopher_filter"](spark, td).collect()
        }
    assert out[0] == (0, True)
    # rules are independent bits: a 4-word doc trivially trips the ratio
    # rules too (any word is >10% of 4), so assert bit membership
    assert out[1][0] & 1 and not out[1][1]
    assert out[2] == (2, False)
    assert out[3][0] & 8 and not out[3][1]
    # '123' is also the top word (6/24 > 10%) -> bit 1 joins bit 4
    assert out[4][0] & 16 and not out[4][1]
