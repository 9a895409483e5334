"""Text-analysis operators for training-data pipelines (north-star
extension; fixture table ``documents``).

All scalar, all built-in expressions (regexp_count/length/arithmetic)
— they run inside whole-stage codegen and are trivially
oracle-expressible. Patterns are kept to the regex subset where Java
(Spark) and RE2 (DuckDB) agree, so both engines count identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
WORD_PATTERN = "[A-Za-z0-9]+"

# small built-in stopword lists for the n-gram language heuristic;
# deliberately tiny and hard-coded so the oracle SQL can inline them
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "por"],
}

EN_STOPWORDS = STOPWORDS["en"]


def token_count(col: Column) -> Column:
    """BPE-ish token count: alpha runs, digit runs, and single
    punctuation marks each count as one token."""
    return F.regexp_count(col, F.lit(TOKEN_PATTERN))


def word_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(WORD_PATTERN))


def _stopword_hits(col: Column, words: list[str]) -> Column:
    """Occurrences of any listed stopword, word-boundary delimited."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(col), F.lit(pat))


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token statistics."""
    t = F.col(text_col)
    return df.select(
        id_col,
        F.length(t).alias("n_chars"),
        word_count(t).alias("n_words"),
        token_count(t).alias("n_tokens"),
        F.round(F.length(t) / F.greatest(word_count(t), F.lit(1)), 4).alias(
            "chars_per_word"
        ),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality signals: length, punctuation/digit density,
    stopword ratio, and a composite keep-flag — the shape of a
    pretraining quality filter (thresholds are demo values)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = F.greatest(word_count(t), F.lit(1))
    punct = F.regexp_count(t, F.lit(r"[^A-Za-z0-9\s]"))
    digits = F.regexp_count(t, F.lit("[0-9]"))
    stop = _stopword_hits(t, EN_STOPWORDS)
    out = df.select(
        id_col,
        n_chars.alias("n_chars"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(digits / F.greatest(n_chars, F.lit(1)), 6).alias("digit_ratio"),
        F.round(stop / n_words, 6).alias("stopword_ratio"),
    )
    return out.withColumn(
        "keep",
        (
            (F.col("n_chars") >= 100)
            & (F.col("punct_ratio") < 0.1)
            & (F.col("digit_ratio") < 0.3)
        ).cast("int"),
    )


def lang_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic over {en,de,fr,es} plus a
    CJK-codepoint signal for zh. Emits per-language hit counts and the
    argmax prediction ('und' when nothing fires)."""
    t = F.col(text_col)
    hits = {lang: _stopword_hits(t, words) for lang, words in STOPWORDS.items()}
    cjk = F.regexp_count(t, F.lit(r"[一-鿿]"))
    out = df.select(
        id_col,
        *[hits[lang].alias(f"{lang}_hits") for lang in STOPWORDS],
        cjk.alias("zh_hits"),
    )
    langs = [*STOPWORDS.keys(), "zh"]
    best = F.greatest(*[F.col(f"{lang}_hits") for lang in langs])
    # built reversed so the earliest language in `langs` wins ties —
    # same precedence as a SQL CASE listing languages in order
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when((F.col(f"{lang}_hits") == best) & (best > 0), lang).otherwise(pred)
    return out.withColumn("pred_lang", pred)
