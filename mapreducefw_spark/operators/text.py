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


# GPT-2-style pre-tokenizer, restricted to constructs Java regex and RE2
# (DuckDB) match identically: contractions, letter runs, digit runs, other
# runs — each optionally preceded by one space. No lookahead (RE2 lacks it).
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_pretokens(text_col: str | Column = "text") -> Column:
    """BPE-style pre-tokenization (the split a GPT-2/tiktoken tokenizer does
    before byte-pair merges). Counting these is the standard corpus-size
    estimate when the merge table isn't available; the regex runs JVM-side
    in one map pass."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_RE), 0)


# PII patterns (email / dotted-quad / US-style phone). Deliberately simple,
# anchorless, and engine-portable; a production scrubber would add locale
# packs, but the operator shape — regexp_count to flag, regexp_replace to
# scrub, both inside one codegen stage — is what matters at 100 TB.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}


def pii_counts(text_col: str | Column = "text") -> dict[str, Column]:
    """One count column per PII class — map-only, no Python."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return {
        f"n_{name}": F.regexp_count(c, F.lit(pat)) for name, pat in PII_PATTERNS.items()
    }


def redact_pii(text_col: str | Column = "text") -> Column:
    """Replace every PII match with [CLASS] markers, applied in one chained
    regexp_replace pass per class (still a single projection)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    out = c
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{name.upper()}]")
    return out


def rolling_fingerprint(text_col: str | Column = "text", window: int = 8) -> Column:
    """Deterministic document fingerprint: min of rolling xxhash64 over token
    windows (a winnowing-style sketch — robust to small edits, unlike sha2)."""
    toks = tokens(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (window - 1), F.lit(1)))
    win_hashes = F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, window))))
    return F.array_min(win_hashes)
