"""Text analysis operators (SURVEY §2 F1-F4).

All pure column expressions (whole-stage codegen); the heuristics are
deliberately SQL-expressible so DuckDB oracles replicate them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from icecube_spark.operators.dedup import GRAMS, NORM

MARKERS = {
    "en": ("the", "a", "is", "and", "of"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
}

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def _toks(text_col: str) -> str:
    return f"split({NORM.format(col=text_col)}, ' ')"


def _marker_score(text_col: str, lang: str) -> str:
    in_list = ", ".join(f"'{m}'" for m in MARKERS[lang])
    return f"size(filter({_toks(text_col)}, t -> t IN ({in_list})))"


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """F1 — marker-word language heuristic with deterministic
    en > de > fr > es priority; 'und' when no marker hits."""
    scores = {lang: F.expr(_marker_score(text_col, lang)) for lang in MARKERS}
    out = df.select(
        F.col(id_col),
        *[scores[lang].alias(f"{lang}_score") for lang in MARKERS],
    )
    en, de, fr, es = (F.col(f"{lang}_score") for lang in ("en", "de", "fr", "es"))
    pred = (
        F.when(en + de + fr + es == 0, "und")
        .when((en >= de) & (en >= fr) & (en >= es), "en")
        .when((de >= fr) & (de >= es), "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    )
    return out.withColumn("predicted_lang", pred)


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """F2 — composite quality score from length / stopword / alpha /
    word-length signals (FineWeb-style heuristics, SQL-expressible)."""
    norm = NORM.format(col=text_col)
    toks = _toks(text_col)
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_words = F.expr(f"size({toks})")
    n_chars = F.expr(f"length({norm})")
    alpha_chars = F.expr(f"length(regexp_replace({norm}, '[^a-z]', ''))")
    stop_hits = F.expr(f"size(filter({toks}, t -> t IN ({stops})))")
    avg_word_len = F.expr(
        f"length(replace({norm}, ' ', '')) / size({toks})"
    )
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_chars.alias("n_chars_norm"),
        (alpha_chars / n_chars).alias("alpha_ratio"),
        (stop_hits / n_words).alias("stopword_ratio"),
        avg_word_len.alias("avg_word_len"),
    )
    score = (
        0.3 * F.least(F.col("n_words") / 100.0, F.lit(1.0))
        + 0.3 * F.col("stopword_ratio")
        + 0.2 * F.col("alpha_ratio")
        + 0.2 * F.least(F.col("avg_word_len") / 10.0, F.lit(1.0))
    )
    return out.withColumn("quality", score)


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """F3 — whitespace tokens + BPE-ish regex tokens + char counts."""
    norm = NORM.format(col=text_col)
    return df.select(
        F.col(id_col),
        F.expr(f"size(split(trim({text_col}), '\\\\s+'))").alias("ws_tokens"),
        F.expr(
            f"size(regexp_extract_all({norm}, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))"
        ).alias("re_tokens"),
        F.length(text_col).alias("n_chars"),
    )


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    """F4 — k-min-hash fingerprint: the k smallest md5s of the doc's
    word 3-grams, joined. Equal fingerprints <=> near-identical
    shingle sets (winnowing-style signature)."""
    grams = GRAMS.format(col=text_col)
    fp = f"""
        array_join(slice(sort_array(transform({grams}, g -> md5(g))), 1, {k}), ',')
    """
    return df.select(
        F.col(id_col),
        F.expr(f"size({grams})").alias("n_grams"),
        F.expr(fp).alias("fingerprint"),
    )
