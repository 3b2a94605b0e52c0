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


def doc_fingerprint(text_col: str = "text", n: int = 3) -> Column:
    """Winnowing-style fingerprint: minimum md5 over word n-gram shingles.
    Stable under whitespace-preserving edits elsewhere in the doc family;
    the 1-hash corner of the MinHash scheme."""
    return F.array_min(F.transform(shingles_expr(text_col, n), lambda s: F.md5(s)))
