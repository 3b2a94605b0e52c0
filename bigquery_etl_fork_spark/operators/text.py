"""Text analysis operators: language ID, quality scoring, fingerprinting.

All pure Column expressions (JVM-side, codegen'd); each has an exact DuckDB
oracle in ``queries.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup_text import shingles_expr, words_col

# tiny deterministic stopword lists — heuristic language ID by stopword hits
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "un"],
    "es": ["el", "los", "de", "y", "que", "una"],
}


def lang_scores(text_col: str = "text") -> list[tuple[str, Column]]:
    w = words_col(text_col)
    out = []
    for lang, sw in sorted(STOPWORDS.items()):
        score = F.size(F.filter(w, lambda x: x.isin(*sw)))
        out.append((lang, score))
    return out


def lang_id(text_col: str = "text") -> Column:
    """argmax-by-(score, lang) language guess; deterministic ties."""
    scored = [
        F.struct(s.alias("score"), F.lit(lang).alias("lang")) for lang, s in lang_scores(text_col)
    ]
    return F.array_max(F.array(*scored))["lang"]


def quality_score(text_col: str = "text") -> Column:
    """[0,1] quality heuristic: penalize very short docs, non-alpha noise,
    and stopword-free (unnatural) text. Deterministic, oracle-friendly."""
    w = words_col(text_col)
    n_words = F.size(w)
    alpha_ratio = F.size(F.filter(w, lambda x: x.rlike("^[a-z]+$"))) / n_words
    sw_all = sorted({s for v in STOPWORDS.values() for s in v})
    stop_ratio = F.size(F.filter(w, lambda x: x.isin(*sw_all))) / n_words
    len_term = F.least(n_words / F.lit(64.0), F.lit(1.0))
    return F.round((alpha_ratio + F.least(stop_ratio * 4, F.lit(1.0)) + len_term) / 3, 4)


def ngrams_col(text_col: str = "text", n: int = 2) -> Column:
    """Word n-grams as an array column (empty array when the doc is
    shorter than n words) — the raw material for repetition metrics."""
    w = words_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.array_join(F.slice(w, i + 1, n), " "),
    )
    return F.when(F.size(w) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def top_multiplicity(arr: Column) -> Column:
    """Max multiplicity of any element of an array column, computed
    SHUFFLE-FREE per row: sort the array, fold once counting the longest
    equal-run. Linear per row and JVM-side — at 100 TB this beats the
    textbook explode -> groupBy -> max formulation (which multiplies the
    row count ~n_words x before a full shuffle); the DuckDB oracle uses
    exactly that relational formulation, so the two plans are
    independent derivations of the same number."""

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    return F.aggregate(F.sort_array(arr), init, step, lambda acc: acc["best"])


REPETITION_COLS = [
    "n_words",
    "top_word_cnt",
    "n_bigrams",
    "top_bigram_cnt",
    "dup_bigrams",
    "n_trigrams",
    "dup_trigrams",
]


def with_repetition_stats(
    df: DataFrame, text_col: str = "text", keep: tuple = ("doc_id",)
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    the 'repetitive text' filters every LLM corpus pipeline applies):
    top word / top bigram multiplicity and duplicate bigram/trigram
    counts, each alongside its denominator. All values are exact
    INTEGERS — thresholds like 'top bigram covers >18%% of the doc'
    become integer cross-multiplications, so the driver's value-hash
    compare never touches float rounding.

    Two-stage select: the word/bigram/trigram ARRAYS materialize once in
    an inner projection, then every metric reads the materialized column
    — higher-order-function expressions are outside whole-stage codegen,
    so Catalyst's subexpression elimination does NOT merge repeated
    `split`/`transform` trees and the one-Project form re-derives each
    array per metric (measured 2.6x slower at sf0.1). Reference analog:
    the reference's event normalization is SQL over BigQuery (no text
    plane); these follow the published filter definitions instead."""
    base = df.select(
        *keep,
        words_col(text_col).alias("_rw"),
        ngrams_col(text_col, 2).alias("_rb2"),
        ngrams_col(text_col, 3).alias("_rb3"),
    )
    return base.select(
        *keep,
        F.size("_rw").cast("long").alias("n_words"),
        top_multiplicity(F.col("_rw")).cast("long").alias("top_word_cnt"),
        F.size("_rb2").cast("long").alias("n_bigrams"),
        top_multiplicity(F.col("_rb2")).cast("long").alias("top_bigram_cnt"),
        (F.size("_rb2") - F.size(F.array_distinct("_rb2")))
        .cast("long")
        .alias("dup_bigrams"),
        F.size("_rb3").cast("long").alias("n_trigrams"),
        (F.size("_rb3") - F.size(F.array_distinct("_rb3")))
        .cast("long")
        .alias("dup_trigrams"),
    )


# PII patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB): character classes + bounded quantifiers only, no
# lookaround, no backreferences.
PII_PATTERNS = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(text_col: str = "text") -> list[tuple[str, Column]]:
    """Occurrences of each PII pattern (before scrubbing)."""
    return [
        (
            f"n_{name}",
            F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
            ).cast("long"),
        )
        for name, pat in sorted(PII_PATTERNS.items())
    ]


def pii_scrub(text_col: str = "text") -> Column:
    """Text with every PII match replaced by a typed placeholder —
    pure Column regexp_replace chain (JVM-side, linear, no UDF)."""
    out = F.col(text_col)
    for name, pat in sorted(PII_PATTERNS.items()):
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def doc_fingerprint(text_col: str = "text", n: int = 3) -> Column:
    """Winnowing-style fingerprint: minimum md5 over word n-gram shingles.
    Stable under whitespace-preserving edits elsewhere in the doc family;
    the 1-hash corner of the MinHash scheme."""
    return F.array_min(F.transform(shingles_expr(text_col, n), lambda s: F.md5(s)))
