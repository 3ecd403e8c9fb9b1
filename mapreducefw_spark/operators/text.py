"""Text analysis operators: language ID, quality scoring, fingerprints.

Heuristic, deterministic, and fully JVM-side — these run as cheap map-only
passes over a 100 TB corpus (no shuffle, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreducefw_spark.operators.textprep import tokens

# Tiny marker-word profiles (top function words per language). A real system
# would use char-n-gram profiles; the operator shape (score -> argmax) is the
# same and this keeps it dependency-free and exactly reproducible.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
    "zh": ("的", "一", "是", "不", "了", "在", "人", "有"),
}


def lang_scores(text_col: str | Column = "text") -> Column:
    """Array of (lang, score) structs; score = marker-token hit ratio."""
    toks = tokens(text_col)
    n = F.greatest(F.size(toks), F.lit(1))
    entries = [
        F.struct(
            (F.size(F.filter(toks, lambda x: x.isin(*markers))).cast("double") / n).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in LANG_MARKERS.items()
    ]
    return F.array(*entries)


def detect_language(text_col: str | Column = "text") -> Column:
    """argmax over lang_scores; 'und' (undetermined) when no marker hits.
    Ties resolve to the lexicographically greatest lang (array_max on
    (score, lang) structs) — deterministic."""
    best = F.array_max(lang_scores(text_col))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append standard pre-training quality columns."""
    toks = tokens(text_col)
    n = F.greatest(F.size(toks), F.lit(1))
    n_distinct = F.size(F.array_distinct(toks))
    return df.withColumns(
        {
            "n_tokens": F.size(toks),
            "type_token_ratio": n_distinct.cast("double") / n,
            "avg_word_len": (F.length(text_col) - F.size(toks) + 1).cast("double") / n,
            "detected_lang": detect_language(text_col),
        }
    )


def rolling_fingerprint(text_col: str | Column = "text", window: int = 8) -> Column:
    """Deterministic document fingerprint: min of rolling xxhash64 over token
    windows (a winnowing-style sketch — robust to small edits, unlike sha2)."""
    toks = tokens(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (window - 1), F.lit(1)))
    win_hashes = F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, window))))
    return F.array_min(win_hashes)
