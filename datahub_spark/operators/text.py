"""Text analysis operators for training-data pipelines.

All expressions are built-in pyspark.sql.functions (JVM codegen; no
Python in the hot path) and are deliberately portable: the same logic is
expressible in DuckDB SQL for the correctness oracle. Hashing uses md5
(identical hex output in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/marker heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "los", "es", "una"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "data", "value"]


def normalize(col: Column) -> Column:
    """Canonical text normalization: lowercase, collapse whitespace, trim.
    (DuckDB oracle: lower + regexp_replace(.., '\\s+', ' ', 'g') + trim.)"""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def words(col: Column) -> Column:
    return F.split(normalize(col), " ")


def token_count_whitespace(col: Column) -> Column:
    return F.size(words(col))


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish token estimate: alphabetic runs, digits, and punctuation
    each count as one token (a cheap proxy for byte-pair tokenizers)."""
    return F.size(F.regexp_extract_all(normalize(col), F.lit(r"[a-z]+|[0-9]|[^a-z0-9 ]"), 0))


def _count_marker(col: Column, marker: str) -> Column:
    """Occurrences of a whole-word marker in normalized text, via the
    length-difference trick (portable to any SQL dialect)."""
    padded = F.concat(F.lit(" "), normalize(col), F.lit(" "))
    needle = f" {marker} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(" "))))
        / (len(needle) - 1)
    ).cast("long")


def lang_scores(col: Column) -> dict[str, Column]:
    return {
        lang: sum((_count_marker(col, m) for m in markers), F.lit(0).cast("long"))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """Marker-frequency language ID. Ties and zero evidence -> 'und'.
    Deterministic: languages compared in fixed order, strict-greater wins."""
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang in sorted(scores):  # fixed evaluation order
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: token count, mean token length, stopword
    ratio, punctuation ratio, and a composite score in [0, 100]."""
    t = F.col(text_col)
    w = words(t)
    n_tokens = F.size(w)
    mean_tok_len = (F.length(F.array_join(w, "")) / n_tokens)
    stop_hits = sum(
        (_count_marker(t, s) for s in STOPWORDS), F.lit(0).cast("long")
    )
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    punct_ratio = n_punct / F.length(t)
    stop_ratio = stop_hits / n_tokens
    score = (
        F.least(n_tokens / F.lit(50.0), F.lit(1.0)) * 40
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 30
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * 30
    )
    return df.select(
        F.col("doc_id"),
        n_tokens.alias("n_tokens"),
        F.round(mean_tok_len, 4).cast("decimal(18,4)").cast("string").alias("mean_token_len"),
        stop_hits.alias("stopword_hits"),
        n_punct.alias("n_punct"),
        F.round(score, 2).cast("decimal(18,2)").cast("string").alias("quality_score"),
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of normalized text (portable; the
    reference category uses content hashes for change detection)."""
    return F.md5(normalize(col))
