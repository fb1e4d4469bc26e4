"""Text analysis operators (SURVEY §2 F1-F4).

All pure column expressions (whole-stage codegen); the heuristics are
deliberately SQL-expressible so DuckDB oracles replicate them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from icecube_spark.operators.dedup import GRAMS, NORM
from icecube_spark.functions.materialize import materialize

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


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """F6 — within-doc repetition signals (Gopher-style): fraction of
    duplicate words and the share of the document covered by its most
    frequent word 2-gram. High values mark looping/templated text that
    survives cross-doc dedup (complement of pipeline.dup_ngram_fraction,
    which measures cross-doc sharing).

    Plan: entirely map-only — the top-gram count is the longest run in
    the SORTED per-doc gram array (one linear fold per row), so no
    exploded (doc, gram) shuffle exists at any scale. Per-doc work is
    embarrassingly parallel; a corpus 100x larger just means more
    partitions of the same per-row op.
    """
    toks = _toks(text_col)
    grams2 = f"""
        element_at(transform(array({toks}),
          t -> CASE WHEN size(t) < 2
                    THEN array(concat_ws(' ', t))
                    ELSE transform(sequence(1, size(t) - 1),
                                   i -> concat_ws(' ', slice(t, i, 2)))
               END), 1)
    """
    # longest run in the sorted gram list == count of the most frequent
    # gram; the fold state is (prev gram, current run, best run)
    top_run = f"""
        aggregate(sort_array({grams2}),
                  named_struct('prev', '', 'run', 0L, 'best', 0L),
                  (acc, g) -> named_struct(
                      'prev', g,
                      'run', IF(g = acc.prev, acc.run + 1, 1L),
                      'best', greatest(acc.best,
                                       IF(g = acc.prev, acc.run + 1, 1L))),
                  acc -> acc.best)
    """
    return df.select(
        F.col(id_col),
        F.expr(f"size({toks})").alias("n_words"),
        F.expr(
            f"1.0 - size(array_distinct({toks})) / size({toks})"
        ).alias("dup_word_frac"),
        F.expr(top_run).alias("top_2gram_n"),
        (F.expr(top_run) / F.expr(f"size({grams2})")).alias("top_2gram_frac"),
    )


def gopher_quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """P9/F7 — Gopher-style rule filter: word-count bounds, mean word
    length bounds, symbol-to-word ratio, distinct-stopword presence;
    keep = all rules pass. One map-only pass, whole-stage codegen —
    the canonical first-stage corpus filter at 100 TB (runs at scan
    speed, before any shuffle-bearing op sees the data).
    """
    norm = NORM.format(col=text_col)
    toks = _toks(text_col)
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_words = F.expr(f"size({toks})")
    mean_word_len = F.expr(f"length(replace({norm}, ' ', ''))") / n_words
    n_symbols = F.expr(
        f"size(regexp_extract_all({norm}, '#|\\\\.\\\\.\\\\.', 0))"
    )
    n_stop = F.expr(
        f"size(array_intersect(array_distinct({toks}), array({stops})))"
    )
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        (n_symbols / n_words).alias("symbol_ratio"),
        n_stop.alias("n_stop_distinct"),
    )
    keep = (
        F.col("n_words").between(10, 100000)
        & F.col("mean_word_len").between(2.0, 10.0)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("n_stop_distinct") >= 2)
    )
    return out.withColumn("keep", keep)


def term_commonness(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """F8 — per-doc mean corpus document-frequency of its distinct
    tokens, as a fraction of the corpus (a cheap LM-quality proxy:
    low commonness = rare-token soup, high = stopword soup; the
    CCNet-style perplexity filter's SQL-able stand-in).

    Plan: one shuffle on the token to build the doc-frequency vocab,
    one shuffle back on the doc id; the corpus size is a broadcast
    scalar. At 100 TB, cap the vocab (top-k terms) so it broadcasts
    and the join goes map-side. Integer sums keep it oracle-exact.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.expr(f"array_distinct({_toks(text_col)})")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df_count"))
    total = df.agg(F.count(F.lit(1)).alias("n_docs_total"))
    return (
        toks.join(vocab, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.sum("df_count").alias("df_sum"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            "n_distinct_tokens",
            (
                F.col("df_sum")
                / F.col("n_distinct_tokens")
                / F.col("n_docs_total")
            ).alias("mean_doc_freq"),
        )
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


def vocab_stats(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """F9 — per-group vocabulary profile: token count, vocabulary size,
    hapax-legomena count, type-token ratio (Heaps-law inputs — the
    standard corpus-health report for a training mix).

    Plan: explode → partial-agg on (group, term) — the big shuffle is
    bounded by the distinct vocabulary per group, with map-side combine
    absorbing the Zipf head — then a tiny second agg over one row per
    distinct term. Integer-exact everywhere (no float folds).
    """
    terms = df.select(
        F.col(group_col), F.explode(F.expr(_toks(text_col))).alias("term")
    ).where(F.col("term") != "")
    counts = terms.groupBy(group_col, "term").agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.groupBy(group_col)
        .agg(
            F.sum("n").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab_size"),
            F.count_if(F.col("n") == 1).alias("n_hapax"),
        )
        .withColumn(
            "type_token_ratio", F.col("vocab_size") / F.col("n_tokens")
        )
    )


def bigram_lift(
    df: DataFrame, text_col: str, min_count: int = 5, k: int = 20
) -> DataFrame:
    """F10 — collocation mining: top-k word bigrams by lift
    (n·c(ab)) / (c(a)·c(b)), the log-free PMI ordering. Standard
    corpus-analysis report for spotting templated/boilerplate phrases
    in a training mix.

    Plan: two shuffles bounded by vocabulary (bigram counts and
    unigram counts, both with map-side partials absorbing the Zipf
    head), then two joins of the bigram aggregate against the unigram
    aggregate — the unigram side broadcasts (vocab ≪ corpus at any
    scale). All lift arithmetic stays in int64 until one final
    division, so ordering is engine-exact. The top-k window runs over
    the min_count-filtered aggregate only.
    """
    toks = _toks(text_col)
    grams2 = f"""
        element_at(transform(array({toks}),
          t -> CASE WHEN size(t) < 2 THEN array()
                    ELSE transform(sequence(1, size(t) - 1),
                                   i -> concat_ws(' ', slice(t, i, 2)))
               END), 1)
    """
    terms = df.select(F.explode(F.expr(toks)).alias("term")).where(
        F.col("term") != ""
    )
    # vocab-bounded unigram table, materialized ONCE: three consumers
    # (both broadcast sides + the total) each re-ran the corpus
    # tokenize otherwise (guide §5; the bigram_logprob treatment).
    # The total derives from the aggregate — Σ c_term IS the corpus
    # token count.
    uni = (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c_term"))
        .transform(materialize)
    )
    total = uni.agg(F.sum("c_term").alias("n_total"))
    bi = (
        df.select(F.explode(F.expr(grams2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c_gram"))
        .where(F.col("c_gram") >= min_count)
        .withColumn("t1", F.split("gram", " ")[0])
        .withColumn("t2", F.split("gram", " ")[1])
    )
    u1 = uni.select(F.col("term").alias("t1"), F.col("c_term").alias("c_t1"))
    u2 = uni.select(F.col("term").alias("t2"), F.col("c_term").alias("c_t2"))
    scored = (
        bi.join(F.broadcast(u1), "t1")
        .join(F.broadcast(u2), "t2")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "lift",
            (F.col("n_total") * F.col("c_gram")).cast("double")
            / (F.col("c_t1") * F.col("c_t2")).cast("double"),
        )
    )
    wtop = Window.orderBy(F.col("lift").desc(), F.col("gram"))
    return (
        scored.withColumn("rank", F.row_number().over(wtop))
        .where(F.col("rank") <= k)
        .select("rank", "gram", "c_gram", "c_t1", "c_t2", "lift")
    )


def top_tfidf_terms(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """F11 — per-doc top-k distinctive terms by tf·(N/df): keyword
    extraction, the per-document counterpart of term_commonness. The
    log is deliberately dropped from idf — log(N/df) is monotone in
    N/df, so the RANKING is identical and the score stays a pure
    ratio of exact integers (both engines evaluate the identical
    double expression; no transcendental-function parity risk).

    Plan: one (doc,term) tf shuffle; df folds out of the same tf
    table with a vocab-bounded second shuffle; N is a scalar
    broadcast. The df join-back shuffles on term — Zipf-head skew is
    absorbed by AQE skew split (at 100 TB broadcast the head of the
    df table instead). The rank window partitions by doc over
    tf-table-sized input.
    """
    toks = _toks(text_col)
    terms = df.select(
        F.col(id_col), F.explode(F.expr(toks)).alias("term")
    ).where(F.col("term") != "")
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.col("n_docs").cast("double") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def langid_confusion(df: DataFrame, id_col: str, text_col: str, truth_col: str) -> DataFrame:
    """F12 — language-ID quality audit: confusion matrix of the
    metadata language label vs the F1 heuristic's prediction, with
    the within-truth share. The calibration report run before
    trusting either signal for corpus filtering.

    Plan: the F1 scoring is map-only codegen; one partial-agg
    shuffle bounded by |langs|² rows; the share divides by a
    truth-total window over that tiny aggregate.
    """
    pred = lang_id(df.select(id_col, text_col, truth_col), id_col, text_col)
    joined = df.select(F.col(id_col), F.col(truth_col)).join(
        pred.select(F.col(id_col), "predicted_lang"), id_col
    )
    counts = joined.groupBy(
        F.col(truth_col).alias("true_lang"), F.col("predicted_lang")
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("true_lang")
    return counts.select(
        "true_lang",
        "predicted_lang",
        "n_docs",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(w).cast("double")).alias(
            "share_of_true"
        ),
    )


def sentence_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """F13 — per-doc sentence profile: sentence count, mean/max words
    per sentence — the readability / fragment-detection signal
    (one-sentence walls of text and staccato fragments both predict
    low training value).

    Plan: map-only — the sentence split and the word counts are one
    pass of codegen'd array lambdas; no explode, no shuffle. The mean
    is one exact INT/INT double division.
    """
    norm = NORM.format(col=text_col)
    sents = f"filter(split({norm}, '\\\\. '), s -> length(s) > 0)"
    wc = f"transform({sents}, s -> size(split(s, ' ')))"
    return df.select(
        F.col(id_col),
        F.expr(f"size({sents})").cast("int").alias("n_sentences"),
        F.expr(f"aggregate({wc}, 0L, (a, x) -> a + x)").alias("n_words"),
        (
            F.expr(f"aggregate({wc}, 0L, (a, x) -> a + x)").cast("double")
            / F.expr(f"size({sents})").cast("double")
        ).alias("mean_sentence_words"),
        F.expr(f"array_max({wc})").cast("int").alias("max_sentence_words"),
    )


def char_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """F14 — raw-text character-class profile: digit / uppercase /
    whitespace / punctuation ratios — the cheap symbol-soup filters
    (C4/Gopher both gate on these) computed without normalizing, so
    case information survives.

    Plan: pure regexp_replace length arithmetic in whole-stage
    codegen; ratios are exact INT/INT double divisions.
    """
    n = F.length(text_col)
    cls = lambda pat: F.length(  # noqa: E731
        F.regexp_replace(F.col(text_col), pat, "")
    )
    ratio = lambda pat: (  # noqa: E731
        (n - cls(pat)).cast("double") / n.cast("double")
    )
    return df.select(
        F.col(id_col),
        n.cast("int").alias("n_chars_raw"),
        ratio("[0-9]").alias("digit_ratio"),
        ratio("[A-Z]").alias("upper_ratio"),
        ratio("[ ]").alias("space_ratio"),
        ratio("[.,!?;:]").alias("punct_ratio"),
    )


def unigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """F16 — unigram language-model quality score: the per-doc mean
    token log-probability under the corpus's own unigram LM. The
    classic perplexity-proxy filter (CCNet/KenLM style: docs whose
    tokens are collectively improbable are symbol soup, OCR noise,
    or the wrong language; reference quality gates are per-field
    heuristics — this is the statistical complement).

    Cross-engine exactness: ln() is NOT guaranteed identically
    rounded across engines, so each DISTINCT token's logprob is
    quantized once in the LM table — floor(ln(p)*1e6) as BIGINT
    ("micro-nats") — and every downstream reduction is exact integer
    math. A boundary-crossing ulp disagreement would need ln()'s
    last bit to straddle a 1e-6 grid line (~1e-10 per distinct
    token).

    Plan: one explode for the LM (token counts: map-side partial
    aggs), the tiny LM broadcast back onto a second explode, one
    groupBy(doc) — corpus is scanned twice, shuffled never (doc-key
    agg is map-side when docs are unsplit rows). At 100 TB the LM
    table is a few MB (vocab, not corpus, scale) — stays broadcast.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.expr(_toks(text_col))).alias("tok")
    ).where(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    lm = (
        # grand total via a 1-row aggregate crossJoined back — a bare
        # global window would stream the whole Heaps-scale vocab table
        # through ONE task just to attach a constant
        counts.crossJoin(
            F.broadcast(counts.agg(F.sum("cnt").alias("total")))
        )
        .withColumn(
            "qlp_micro",
            F.floor(
                F.log(F.col("cnt").cast("double") / F.col("total").cast("double"))
                * F.lit(1e6)
            ).cast("bigint"),
        )
        .select("tok", "qlp_micro")
    )
    return (
        toks.join(F.broadcast(lm), "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("qlp_micro").alias("sum_qlp"),
        )
        .select(
            id_col,
            "n_tokens",
            (
                F.col("sum_qlp").cast("double")
                / F.col("n_tokens").cast("double")
                / F.lit(1e6)
            ).alias("mean_logprob"),
        )
    )


def zipf_fit(df: DataFrame, text_col: str) -> DataFrame:
    """F17 — Zipf-law fit of the corpus vocabulary: OLS slope of
    ln(freq) on ln(rank) over the rank-frequency curve. Natural text
    sits near slope -1; generated/templated corpora and boilerplate
    floods show up as flat or broken slopes — a one-row corpus
    health check.

    Determinism: rank = row_number over (count DESC, token ASC) —
    total order, no tie ambiguity. ln values are floor-quantized to
    micro-nats per VOCAB row (not per token occurrence), then the
    OLS moments are exact integer sums; the final slope/intercept
    are identical double expressions in both engines.

    Plan: one explode + token-count agg (vocab-sized output), then
    distributed_rank for the Zipf rank (range repartition +
    prefix-summed offsets — whitespace "vocab" at 100 TB is unbounded
    junk-token territory, so no single reducer ever holds it), then a
    scalar aggregate.
    """
    vocab = (
        df.select(F.explode(F.expr(_toks(text_col))).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from icecube_spark.operators.pipeline import distributed_rank

    ranked = distributed_rank(
        vocab, [F.col("cnt").desc(), F.col("tok")], rank_col="rank"
    ).select(
        F.floor(F.log(F.col("rank").cast("double")) * F.lit(1e6))
        .cast("bigint")
        .alias("lx"),
        F.floor(F.log(F.col("cnt").cast("double")) * F.lit(1e6))
        .cast("bigint")
        .alias("ly"),
    )
    mom = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx").cast("decimal(38,0)") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx").cast("decimal(38,0)") * F.col("lx")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double") / F.lit(1e6)
    sy = F.col("sy").cast("double") / F.lit(1e6)
    sxy = F.col("sxy").cast("double") / F.lit(1e12)
    sxx = F.col("sxx").cast("double") / F.lit(1e12)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return mom.select(
        F.col("n").alias("vocab_size"),
        slope.alias("zipf_slope"),
        ((sy / n) - slope * (sx / n)).alias("zipf_intercept"),
    )


def chunk_dedup(
    df: DataFrame, id_col: str, text_col: str, chunk_tokens: int = 16
) -> DataFrame:
    """D8 — fixed-width chunk-level dedup: split each doc's token
    stream into non-overlapping 16-token chunks, hash each chunk,
    and report every chunk occurring in more than one place. This is
    the scalable stand-in for suffix-array substring dedup
    (RefinedWeb/Lee et al. "Deduplicating Training Data Makes LMs
    Better" dedup boilerplate passages INSIDE otherwise-unique docs
    — whole-doc hashing never sees them).

    Plan: explode is 1/16th the token count; one groupBy on the
    chunk hash (map-side partials). Output is duplicated chunks
    only. At 100 TB this is the cheapest intra-doc dedup signal that
    exists — one shuffle of ~corpus/16 hashed rows.
    """
    # transform-over-singleton binds the split() result to `t` so the
    # regex tokenization runs once per row, not once per chunk (see
    # dedup.GRAMS for why a plain column reference gets re-inlined).
    chunk_expr = f"""element_at(
        transform(array({_toks(text_col)}),
          t -> transform(
                 sequence(0, cast((size(t) - 1) / {chunk_tokens} as int)),
                 i -> concat_ws(' ', slice(t, i * {chunk_tokens} + 1, {chunk_tokens})))),
        1)"""
    chunks = df.select(
        F.col(id_col),
        F.posexplode(F.expr(chunk_expr)).alias("chunk_idx", "chunk_text"),
    ).where(F.col("chunk_text") != "")
    return (
        chunks.groupBy(F.md5("chunk_text").alias("chunk_hash"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct(id_col).cast("bigint").alias("n_docs"),
            F.min(id_col).alias("first_doc"),
        )
        .where(F.col("n_occurrences") > 1)
    )


def mutual_information(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """F19 — pointwise mutual information between two categorical
    columns (e.g. language x source): per-cell PMI and the cell's
    contribution to total MI. The corpus-curation use: a cell with
    strongly positive PMI means that source is a de-facto single-
    language feed; near-zero everywhere means language is balanced
    across sources (the mixing target).

    Cross-engine exactness: like unigram_logprob, ln() is quantized
    once per cell — floor(ln(ratio)*1e6) as BIGINT micro-nats — and
    every derived value is exact integer math divided once at the end.

    Plan: one (a, b) count shuffle over the corpus; margins, total
    and PMI all come from windows over the RESULTING cell table,
    which is |a|x|b| — tens of rows at any corpus scale, so the
    unpartitioned windows are free.
    """
    cells = df.groupBy(a_col, b_col).agg(F.count(F.lit(1)).alias("n"))
    wa = Window.partitionBy(a_col)
    wb = Window.partitionBy(b_col)
    wt = Window.partitionBy()
    cells = (
        cells.withColumn("na", F.sum("n").over(wa))
        .withColumn("nb", F.sum("n").over(wb))
        .withColumn("total", F.sum("n").over(wt))
        .withColumn(
            "qpmi_micro",
            F.floor(
                F.log(
                    (F.col("n") * F.col("total")).cast("double")
                    / (F.col("na") * F.col("nb")).cast("double")
                )
                * F.lit(1e6)
            ).cast("bigint"),
        )
    )
    return cells.select(
        F.col(a_col),
        F.col(b_col),
        F.col("n").cast("bigint").alias("n"),
        (F.col("qpmi_micro").cast("double") / F.lit(1e6)).alias("pmi"),
        (
            (F.col("n") * F.col("qpmi_micro")).cast("double")
            / F.col("total").cast("double")
            / F.lit(1e6)
        ).alias("mi_contrib"),
    ).orderBy(a_col, b_col)


def chi2_terms(
    df: DataFrame, id_col: str, text_col: str, label_col: str, k: int = 30
) -> DataFrame:
    """F20 — chi-squared term-label association (the classic feature-
    selection statistic): for the k highest-document-frequency terms,
    the 2x2 chi2 of term presence vs each label value. High-chi2
    terms are label markers (language shibboleths, source
    boilerplate); the corpus-curation use is leak detection — a
    "content" term with huge chi2 against source means templating.

    Exactness: all four contingency counts are exact BIGINTs; the
    statistic is one fixed-shape double expression (products then two
    divisions) — identical operand order in the SQL twin makes IEEE
    rounding identical. Squaring is done in double so N^4-magnitude
    intermediates cannot overflow int64 at large N.

    Plan: ONE distinct (doc, label, term) explode collapses straight
    to the vocabulary-sized (term, label) count table (checkpointed —
    every doc has exactly one label, so document frequency is the
    per-term SUM of those counts); the top-k rank and the n11 slice
    both read that aggregate, so the corpus-grain tokenize pass runs
    once (guide §2.3 — the pre-r9 shape tokenized twice: once for
    document frequencies, once for the label counts). The full
    k x |labels| grid (zeros included) is built by crossJoining the
    two broadcast-scale side tables, never touching the corpus again.
    """
    pairs = (
        df.select(
            F.col(id_col),
            F.col(label_col),
            F.explode(F.expr(_toks(text_col))).alias("term"),
        )
        .where(F.col("term") != "")
        .select(id_col, label_col, "term")
        .distinct()
    )
    tl = (
        pairs.groupBy("term", label_col)
        .agg(F.count(F.lit(1)).alias("n11"))
        .transform(materialize)
    )
    dfreq = tl.groupBy("term").agg(F.sum("n11").alias("df_t"))
    wtop = Window.partitionBy().orderBy(F.desc("df_t"), F.asc("term"))
    top = (
        dfreq.withColumn("rank", F.row_number().over(wtop))
        .where(F.col("rank") <= k)
        .select("term", "df_t")
    )
    labels = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n_label"))
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    n11 = tl.join(F.broadcast(top.select("term")), "term")
    grid = (
        top.crossJoin(F.broadcast(labels))
        .crossJoin(F.broadcast(total))
        .join(n11, ["term", label_col], "left")
        .na.fill({"n11": 0})
    )
    n11c = F.col("n11").cast("bigint")
    n10 = (F.col("df_t") - F.col("n11")).cast("bigint")
    n01 = (F.col("n_label") - F.col("n11")).cast("bigint")
    n00 = (
        F.col("n_docs") - F.col("df_t") - F.col("n_label") + F.col("n11")
    ).cast("bigint")
    d = (n11c * n00 - n10 * n01).cast("double")
    denom_ok = (
        ((n11c + n10) > 0) & ((n01 + n00) > 0)
        & ((n11c + n01) > 0) & ((n10 + n00) > 0)
    )
    chi2 = (
        F.col("n_docs").cast("double") * d * d
        / (n11c + n10).cast("double")
        / (n01 + n00).cast("double")
        / (n11c + n01).cast("double")
        / (n10 + n00).cast("double")
    )
    return grid.select(
        "term",
        F.col(label_col),
        n11c.alias("n11"),
        F.when(denom_ok, chi2).otherwise(F.lit(0.0)).alias("chi2"),
    ).orderBy("term", label_col)


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """F21 — BM25 keyword search: top-k documents for a fixed query
    term set under Okapi BM25 (k1=1.2, b=0.75, Lucene's
    always-positive idf = ln(1 + (N - df + 0.5)/(df + 0.5))). The
    corpus-side of retrieval pipelines: mine seed documents for a
    topic before embedding-based expansion.

    Cross-engine exactness: idf is micro-nat quantized once per query
    term (same scheme as unigram_logprob); each (doc, term)
    contribution is a FIXED-SHAPE IEEE expression (identical operand
    order in the SQL twin) quantized to nano-units, so the per-doc
    score is an exact integer sum regardless of which term adds
    first. Ranking compares integers; ties break on doc id.

    Plan: tokens explode once; only rows matching the tiny query set
    survive the codegen filter, so tf/dl aggregate over a sliver of
    the corpus. df and avgdl are broadcast-scale side aggregates.
    The final top-k is sort+limit — TakeOrdered's distributed partial
    top-k, NOT a single-partition rank window — then row_number runs
    over k rows only.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.expr(_toks(text_col))).alias("tok")
    ).where(F.col("tok") != "")
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    nstats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("n_tokens"),
    )
    qt = [t.lower() for t in query_terms]
    hits = toks.where(F.col("tok").isin(qt))
    tf = hits.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df_t"))
    idf = dfreq.crossJoin(F.broadcast(nstats)).select(
        "tok",
        F.floor(
            F.log(
                F.lit(1.0)
                + (F.col("n_docs").cast("double") - F.col("df_t").cast("double") + F.lit(0.5))
                / (F.col("df_t").cast("double") + F.lit(0.5))
            )
            * F.lit(1e6)
        ).cast("bigint").alias("qidf_micro"),
        (F.col("n_tokens").cast("double") / F.col("n_docs").cast("double")).alias(
            "avgdl"
        ),
    )
    contrib = (
        tf.join(F.broadcast(idf), "tok")
        .join(dl, id_col)
        .withColumn(
            "qscore_nano",
            F.floor(
                (F.col("qidf_micro").cast("double") / F.lit(1e6))
                * (
                    F.col("tf").cast("double") * F.lit(k1 + 1.0)
                    / (
                        F.col("tf").cast("double")
                        + F.lit(k1)
                        * (
                            F.lit(1.0 - b)
                            + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
                        )
                    )
                )
                * F.lit(1e9)
            ).cast("bigint"),
        )
    )
    scored = contrib.groupBy(id_col).agg(
        F.sum("qscore_nano").alias("score_nano"),
        F.count(F.lit(1)).cast("int").alias("n_terms_matched"),
    )
    top = scored.orderBy(F.desc("score_nano"), F.asc(id_col)).limit(k)
    w = Window.partitionBy().orderBy(F.desc("score_nano"), F.asc(id_col))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        F.col(id_col),
        (F.col("score_nano").cast("double") / F.lit(1e9)).alias("score"),
        "n_terms_matched",
    ).orderBy("rank")


def entropy_by_group(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """F22 — token Shannon entropy per group (source/language): the
    corpus-diversity statistic — low entropy flags templated or
    boilerplate-heavy feeds, and the normalized form H/ln(V) is
    comparable across vocabulary sizes.

    Exactness: ln(p) quantized once per (group, term) to micro-nats
    (exact integer sums, one division at the end); the ln(V)
    normalizer quantized the same way.

    Plan: one (group, term) count shuffle with map-side partials;
    margins via group-partitioned windows over the VOCAB-sized
    aggregate (not the corpus); everything downstream is
    group-cardinality rows.
    """
    toks = df.select(
        F.col(group_col), F.explode(F.expr(_toks(text_col))).alias("tok")
    ).where(F.col("tok") != "")
    counts = toks.groupBy(group_col, "tok").agg(
        F.count(F.lit(1)).alias("n")
    )
    wg = Window.partitionBy(group_col)
    counts = counts.withColumn("total", F.sum("n").over(wg)).withColumn(
        "qlp_micro",
        F.floor(
            F.log(F.col("n").cast("double") / F.col("total").cast("double"))
            * F.lit(1e6)
        ).cast("bigint"),
    )
    agg = counts.groupBy(group_col).agg(
        F.max("total").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(F.col("n") * F.col("qlp_micro")).alias("sum_nqlp"),
    )
    qlnv = F.floor(
        F.log(F.col("vocab").cast("double")) * F.lit(1e6)
    ).cast("bigint")
    entropy = (
        -F.col("sum_nqlp").cast("double")
        / F.col("n_tokens").cast("double")
        / F.lit(1e6)
    )
    return agg.select(
        group_col,
        "n_tokens",
        "vocab",
        entropy.alias("entropy"),
        F.when(F.col("vocab") > 1, entropy * F.lit(1e6) / qlnv.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("norm_entropy"),
    ).orderBy(group_col)


BLOCKLIST = (
    "merge", "deadlock", "rollback", "panic", "corrupt",
)


def blocklist_filter(
    df: DataFrame, id_col: str, text_col: str, terms: tuple = BLOCKLIST
) -> DataFrame:
    """F24 — term-blocklist safety gate: per-doc hit counts for a
    blocklist (here neutral stand-in terms), distinct terms matched,
    and the keep/flag verdict (≥2 distinct blocked terms → flag) —
    the shape of every safety/compliance filter in a curation
    pipeline. Matching is on normalized whole tokens, not substrings,
    so "mergers" doesn't trip "merge".

    Plan: pure map-side codegen — one filter over the exploded token
    set per row via array_intersect on the normalized token array;
    no shuffle at all (the final orderBy is presentation-only).
    """
    toks = F.expr(f"array_distinct({_toks(text_col)})")
    blocked = F.array(*[F.lit(t) for t in terms])
    hits = F.array_intersect(toks, blocked)
    all_toks = F.expr(_toks(text_col))
    n_hits = F.size(
        F.filter(all_toks, lambda t: F.array_contains(blocked, t))
    )
    return df.select(
        F.col(id_col),
        n_hits.cast("int").alias("n_hits"),
        F.size(hits).cast("int").alias("n_distinct_terms"),
        F.array_join(F.array_sort(hits), ",").alias("matched"),
        F.when(F.size(hits) >= 2, F.lit("flag"))
        .otherwise(F.lit("keep"))
        .alias("verdict"),
    ).orderBy(id_col)


def vocab_coverage(
    df: DataFrame, text_col: str, cuts: tuple = (100, 500, 1000, 5000)
) -> DataFrame:
    """F26 — vocabulary coverage curve: what fraction of all corpus
    tokens the top-k vocabulary covers, at several k — the sizing
    statistic tokenizer/embedding-table design starts from (a 1k
    vocab covering 98% means the long tail is noise; 60% means
    splitting will dominate).

    Exactness: coverage is an exact integer division of token
    counts; ranking ties break lexicographically.

    Plan: one term-count shuffle (map-side combined); the rank
    window, the cumulative sums and the cut probe all run over the
    VOCAB-sized aggregate, never the corpus.
    """
    toks = df.select(
        F.explode(F.expr(_toks(text_col))).alias("tok")
    ).where(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy().orderBy(F.desc("n"), F.asc("tok"))
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    ranked = counts.select(
        F.row_number().over(w).alias("rank"),
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
        F.count(F.lit(1)).over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("vocab"),
    )
    # Single pass: the cuts are a broadcast |cuts|-row frame joined on
    # rank == least(top_k, vocab) (mirroring the oracle's ks JOIN
    # ranked), so the token-count shuffle and the global windows run
    # ONCE — the per-cut filtered-branch unionAll re-evaluated them
    # once per cut unless exchange reuse happened to kick in.
    cuts_df = df.sparkSession.createDataFrame(
        [(int(k),) for k in cuts], "top_k int"
    )
    return (
        ranked.join(
            F.broadcast(cuts_df),
            F.col("rank") == F.least(F.col("top_k"), F.col("vocab")),
        )
        .select(
            "top_k",
            F.col("rank").cast("bigint").alias("k_effective"),
            F.col("vocab").cast("bigint").alias("vocab"),
            F.col("total").cast("bigint").alias("n_tokens"),
            (F.col("cum").cast("double") / F.col("total").cast("double"))
            .alias("coverage"),
        )
        .orderBy("top_k")
    )


def js_divergence_matrix(
    df: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """F27 — pairwise Jensen-Shannon divergence between the groups'
    unigram distributions: the symmetric, bounded [0, ln2] distance
    between language (or source) term distributions — entropy (F22)
    says how diverse ONE feed is, JS says how far apart TWO are
    (language separation, source-overlap detection, split-drift).

    Exactness: each (pair, term) log-ratio ln(p/m) quantizes once to
    micro-nats; the weighted sums are exact integers divided once per
    side at the end.

    Plan: one (group, term) count shuffle; the group-pair frame is a
    |G|² broadcast crossJoin and each count row fans out to at most
    |G|-1 pairs (bounded); the per-(pair, term) zero-fill falls out
    of a conditional aggregate — no full-outer self-joins. Output is
    |G|·(|G|-1)/2 rows.
    """
    counts = (
        df.select(
            F.col(group_col).alias("g"),
            F.explode(F.expr(_toks(text_col))).alias("tok"),
        )
        .where(F.col("tok") != "")
        .groupBy("g", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = counts.groupBy("g").agg(F.sum("n").alias("tot"))
    groups = totals.select(F.col("g").alias("ga"), F.col("tot").alias("ta"))
    pairs = groups.crossJoin(
        F.broadcast(
            totals.select(F.col("g").alias("gb"), F.col("tot").alias("tb"))
        )
    ).where(F.col("ga") < F.col("gb"))
    j = pairs.join(
        counts, (F.col("g") == F.col("ga")) | (F.col("g") == F.col("gb"))
    )
    cell = j.groupBy("ga", "gb", "ta", "tb", "tok").agg(
        F.sum(F.when(F.col("g") == F.col("ga"), F.col("n")).otherwise(0))
        .alias("na"),
        F.sum(F.when(F.col("g") == F.col("gb"), F.col("n")).otherwise(0))
        .alias("nb"),
    )
    pa = F.col("na").cast("double") / F.col("ta").cast("double")
    pb = F.col("nb").cast("double") / F.col("tb").cast("double")
    m = (pa + pb) / F.lit(2.0)
    qa = F.when(
        F.col("na") > 0, F.floor(F.log(pa / m) * F.lit(1e6)).cast("bigint")
    ).otherwise(F.lit(0))
    qb = F.when(
        F.col("nb") > 0, F.floor(F.log(pb / m) * F.lit(1e6)).cast("bigint")
    ).otherwise(F.lit(0))
    agg = cell.groupBy("ga", "gb", "ta", "tb").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum(F.col("na") * qa).alias("sa"),
        F.sum(F.col("nb") * qb).alias("sb"),
    )
    js = (
        F.col("sa").cast("double") / F.col("ta").cast("double")
        + F.col("sb").cast("double") / F.col("tb").cast("double")
    ) / F.lit(2e6)
    return agg.select(
        F.col("ga"),
        F.col("gb"),
        "n_terms",
        js.alias("js_divergence"),
    ).orderBy("ga", "gb")


def bigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """F28 — bigram language-model fluency score: per-doc mean
    conditional log-probability ln p(w2|w1) under the corpus's own
    add-1-smoothed bigram LM. The unigram score (F16) ranks rare
    WORDS; this ranks rare TRANSITIONS — shuffled or templated text
    with plausible vocabulary but broken word order scores low here
    and normal there, which is exactly the gap the CCNet/KenLM
    perplexity filters exploit.

    Cross-engine exactness: ln() quantizes once per DISTINCT bigram
    in the LM table — floor(ln(p)*1e6) micro-nats — then every
    reduction is exact integer math (same scheme as F16).

    Plan: two explodes (bigram LM counts, then doc bigrams), the LM
    joined back on the bigram key — a vocab²-bounded (Zipf-bounded in
    practice) shuffle join, NOT a broadcast, because the bigram table
    outgrows driver memory at corpus scale; the per-doc aggregate is
    map-side when docs are unsplit rows.
    """
    bigrams_expr = f"""
        element_at(transform(array({_toks(text_col)}),
          t -> CASE WHEN size(t) < 2 THEN array()
                    ELSE transform(sequence(1, size(t) - 1),
                         i -> concat(element_at(t, i), ' ',
                                     element_at(t, i + 1)))
               END), 1)
    """
    toks = df.select(
        F.col(id_col), F.explode(F.expr(_toks(text_col))).alias("tok")
    ).where(F.col("tok") != "")
    # vocab-bounded aggregates referenced twice each (vocab size +
    # LM join; LM + per-doc scoring): checkpoint so the corpus
    # tokenize/bigram explodes run once per grain, not twice
    # (guide §5)
    uni = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("c1")
    ).transform(materialize)
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    bgs = df.select(
        F.col(id_col), F.explode(F.expr(bigrams_expr)).alias("bg")
    ).where(~F.col("bg").rlike("^ | $|^$"))
    bi = bgs.groupBy("bg").agg(
        F.count(F.lit(1)).alias("c2")
    ).transform(materialize)
    lm = (
        bi.withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
        .join(uni.withColumnRenamed("tok", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            F.floor(
                F.log(
                    (F.col("c2") + 1).cast("double")
                    / (F.col("c1") + F.col("v")).cast("double")
                )
                * F.lit(1e6)
            ).cast("bigint").alias("qlp_micro"),
        )
    )
    return (
        bgs.join(lm, "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            (
                F.sum("qlp_micro").cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1e6)
            ).alias("mean_logprob"),
        )
        .orderBy(id_col)
    )


def heaps_fit(
    df: DataFrame, group_col: str, text_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """F29 — Heaps'-law fit per group: regress ln(per-doc vocab) on
    ln(per-doc tokens) across documents, V ≈ k·N^β. The vocabulary-
    growth exponent β is the tokenizer/dedup sizing companion to the
    Zipf slope (F17): β near 1 means unbounded novel vocabulary
    (noisy / OCR feed), β near 0.5 is normal prose.

    Exactness: per-doc N and V are ints; ln quantizes per doc to
    micro-nats; moment sums fold in DECIMAL(38,0) exact integers;
    the final slope/intercept divisions are quantized to a 1e-9 grid
    (the >2^53 int→double cast is not correctly rounded in DuckDB —
    same guard as corr_matrix).

    Plan: one doc-level aggregate (token explode, map-side combined),
    one tiny per-group moment aggregate — vocabulary never leaves
    executors.
    """
    toks = df.select(
        F.col(group_col).alias("g"),
        F.col(id_col),
        F.explode(F.expr(_toks(text_col))).alias("tok"),
    ).where(F.col("tok") != "")
    per_doc = toks.groupBy("g", id_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("tok").alias("v"),
    ).where(F.col("n") >= 2)
    q = per_doc.select(
        "g",
        F.floor(F.log(F.col("n").cast("double")) * F.lit(1e6))
        .cast("bigint").alias("lx"),
        F.floor(F.log(F.col("v").cast("double")) * F.lit(1e6))
        .cast("bigint").alias("ly"),
    )
    dec = "decimal(38,0)"
    m = q.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("lx").cast(dec)).alias("sx"),
        F.sum(F.col("ly").cast(dec)).alias("sy"),
        F.sum((F.col("lx").cast(dec) * F.col("lx"))).alias("sxx"),
        F.sum((F.col("lx").cast(dec) * F.col("ly"))).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    beta_raw = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    beta = F.floor(beta_raw * F.lit(1e9)).cast("bigint").cast("double") / F.lit(
        1e9
    )
    # intercept in micro-nats -> ln k, same 1e-9 quantization
    lnk_raw = (sy - beta_raw * sx) / n / F.lit(1e6)
    lnk = F.floor(lnk_raw * F.lit(1e9)).cast("bigint").cast("double") / F.lit(
        1e9
    )
    return m.select(
        F.col("g").alias(group_col),
        F.col("n").cast("bigint").alias("n_docs"),
        beta.alias("heaps_beta"),
        lnk.alias("heaps_ln_k"),
    ).orderBy(group_col)


CODE_KEYWORDS = (
    "def", "class", "return", "import", "function", "var", "const",
    "void", "int", "public", "static", "endif", "lambda",
)


def code_detect(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """F30 — code-vs-prose heuristic per document: symbol density,
    semicolon/brace rates per 100 chars, programming-keyword hits,
    and the combined is_code verdict. Training-data mixes need the
    code fraction measured (and often routed separately); this is
    the dependency-free screen that runs before any learned
    classifier.

    Exactness: counts are regexp_replace length differences (same
    POSIX classes both engines); ratios are fixed-shape IEEE over
    identical ints.

    Plan: pure codegen projection — no shuffle, no UDF; the final
    orderBy is presentation-only.
    """
    t = F.col(text_col)
    n = F.length(t)
    def count_re(pat):
        return n - F.length(F.regexp_replace(t, pat, ""))
    symbols = F.length(F.regexp_replace(t, "[A-Za-z0-9 ]", ""))
    semis = count_re(";")
    braces = F.length(t) - F.length(F.regexp_replace(t, "[{}()\\[\\]]", ""))
    kw_list = ", ".join(f"'{k}'" for k in CODE_KEYWORDS)
    kw_hits = F.expr(
        f"size(filter({_toks(text_col)}, t -> t IN ({kw_list})))"
    )
    per100 = lambda c: c.cast("double") * F.lit(100.0) / n.cast("double")
    sym_ratio = symbols.cast("double") / n.cast("double")
    is_code = (
        (per100(semis) + per100(braces) >= F.lit(3.0))
        | (kw_hits >= F.lit(3))
    ) & (sym_ratio >= F.lit(0.05))
    return df.where(n > 0).select(
        F.col(id_col),
        n.cast("bigint").alias("n_chars"),
        sym_ratio.alias("symbol_ratio"),
        per100(semis).alias("semis_per_100"),
        per100(braces).alias("braces_per_100"),
        kw_hits.cast("int").alias("kw_hits"),
        is_code.alias("is_code"),
    ).orderBy(id_col)


def stopword_profile(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """F31 — stopword usage profile per group: total tokens, stopword
    share, distinct stopwords seen, and the dominant stopword.
    Natural prose keeps a stable stopword share (~0.2-0.4 for
    English); keyword-stuffed or machine-generated feeds crater it —
    a one-scan complement to the per-doc Gopher gates (F7).

    Exactness: integer counts and one int-ratio division; the top
    stopword is rank-selected with lexicographic tiebreak.

    Plan: one token explode + (group, tok) count, one group rollup;
    the dominant-stopword rank runs ONLY over the stopword rows (a
    list-bounded ≤ |STOPWORDS| rows per group forever — the previous
    form ranked the group's whole vocabulary in one task) and
    broadcast-joins back onto the rollup.
    """
    sw_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    toks = df.select(
        F.col(group_col).alias("g"),
        F.explode(F.expr(_toks(text_col))).alias("tok"),
    ).where(F.col("tok") != "")
    counts = toks.groupBy("g", "tok").agg(
        F.count(F.lit(1)).alias("n")
    ).withColumn("is_sw", F.expr(f"tok IN ({sw_list})"))
    wtop = Window.partitionBy("g").orderBy(F.desc("n"), F.asc("tok"))
    top_sw = (
        counts.where(F.col("is_sw"))
        .withColumn("sw_rank", F.row_number().over(wtop))
        .where(F.col("sw_rank") == 1)
        .select("g", F.col("tok").alias("top_stopword"))
    )
    stats = counts.groupBy("g").agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("is_sw"), F.col("n")).otherwise(0))
        .cast("bigint").alias("n_stopword_tokens"),
        F.sum(F.when(F.col("is_sw"), 1).otherwise(0))
        .cast("bigint").alias("n_distinct_stopwords"),
        (
            F.sum(F.when(F.col("is_sw"), F.col("n")).otherwise(0))
            .cast("double")
            / F.sum("n").cast("double")
        ).alias("stopword_ratio"),
    )
    return (
        stats.join(F.broadcast(top_sw), "g", "left")
        .select(
            F.col("g").alias(group_col),
            "n_tokens", "n_stopword_tokens", "n_distinct_stopwords",
            "top_stopword", "stopword_ratio",
        )
        .orderBy(group_col)
    )


def tokenizer_fertility(
    df: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """F32 — tokenizer fertility per group: subword-per-word ratio
    and chars-per-subword under the BPE-ish regex tokenizer (F3's
    re_tokens), next to the whitespace-word baseline. Fertility is
    THE tokenizer-fit metric: 1.2 subwords/word is a well-fitted
    vocabulary, 2+ means the tokenizer shreds this group's text
    (wrong language/domain) and its effective context halves.

    Exactness: all counts are exact integers; ratios are single
    INT/INT IEEE divisions.

    Plan: one map-only projection of three counters, one tiny
    per-group aggregate — scan-speed, no shuffle beyond the ≤|G|-row
    exchange.
    """
    norm = NORM.format(col=text_col)
    toks = _toks(text_col)
    per_doc = df.select(
        F.col(group_col).alias("g"),
        F.expr(f"size(filter({toks}, t -> t != ''))").alias("n_words"),
        F.expr(
            f"size(regexp_extract_all({norm}, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))"
        ).alias("n_subwords"),
        F.expr(f"length(replace({norm}, ' ', ''))").alias("n_chars"),
    )
    return (
        per_doc.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_subwords").cast("bigint").alias("n_subwords"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_docs",
            "n_words",
            "n_subwords",
            (
                F.col("n_subwords").cast("double")
                / F.col("n_words").cast("double")
            ).alias("fertility"),
            (
                F.col("n_chars").cast("double")
                / F.col("n_subwords").cast("double")
            ).alias("chars_per_subword"),
        )
        .orderBy(group_col)
    )


# leet/symbol substitutions the fuzzy gate normalizes away before
# matching: each obfuscated char folds to its letter
LEET_FROM = "013457$@!"
LEET_TO = "oleastsai"


def blocklist_fuzzy(
    df: DataFrame, id_col: str, text_col: str, terms: tuple = BLOCKLIST
) -> DataFrame:
    """F34 — obfuscation-resistant blocklist gate: tokens fold leet
    substitutions (0→o, 1→l, 3→e, 4→a, 5→s, 7→t, $→s, @→a, !→i)
    before matching, so 'm3rge'/'p@nic' variants hit the same terms
    the exact gate (F24) matches. Real crawls evade token filters
    exactly this way; every production safety gate carries a
    normalization layer like this one.

    Exactness: translate() is a deterministic char map in both
    engines; counts are integers.

    Plan: pure codegen projection (translate + filter over the token
    array) — scan-speed, no shuffle; rides the same plan shape as
    F24 so both gates run in one curation pass.
    """
    in_list = ", ".join(f"'{t}'" for t in terms)
    folded = (
        f"transform({_toks(text_col)}, "
        f"t -> translate(t, '{LEET_FROM}', '{LEET_TO}'))"
    )
    n_hits = F.expr(f"size(filter({folded}, t -> t IN ({in_list})))")
    distinct_hits = F.expr(
        f"size(array_intersect(array_distinct({folded}), array({in_list})))"
    )
    matched = F.expr(
        f"array_join(array_sort(array_intersect("
        f"array_distinct({folded}), array({in_list}))), ',')"
    )
    return df.select(
        F.col(id_col),
        n_hits.cast("int").alias("n_hits"),
        distinct_hits.cast("int").alias("n_distinct_terms"),
        matched.alias("matched"),
        F.when(distinct_hits >= 2, F.lit("flag"))
        .otherwise(F.lit("keep"))
        .alias("verdict"),
    ).orderBy(id_col)


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str,
    target_lang: str = "en",
    n_buckets: int = 256,
) -> DataFrame:
    """P48 — DSIR-style importance weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): hash
    every token into a fixed feature bucket, fit add-1-smoothed
    bucket distributions for the TARGET slice (here: one language)
    and the full corpus, and score each document by its summed
    log-likelihood ratio Σ ln(p_target(b)/p_corpus(b)). High-weight
    docs "look like" the target domain — the principled alternative
    to hand-written quality filters when curating a domain mix.

    Exactness: bucket ids are md5-derived (cross-engine); each
    bucket's log-ratio quantizes once to micro-nats (256 lns total),
    so per-doc sums are exact integer math.

    Plan: one token explode feeding both bucket tables (the target
    table is a filtered re-aggregation of the same shuffle), the
    256-row weight table broadcasts back onto the explode, one
    doc-key aggregate. Two corpus scans, zero corpus-sized shuffles
    beyond the map-side-combined bucket counts.
    """
    from icecube_spark.functions.hashing import spark_hex2int

    toks = df.select(
        F.col(id_col),
        F.col(lang_col),
        F.explode(F.expr(_toks(text_col))).alias("tok"),
    ).where(F.col("tok") != "")
    bucketed = toks.withColumn(
        "b", F.expr(spark_hex2int("tok")) % F.lit(n_buckets)
    )
    grid = (
        bucketed.groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cs"),
            F.sum(F.when(F.col(lang_col) == target_lang, 1).otherwise(0))
            .cast("bigint")
            .alias("ct"),
        )
    )
    wall = Window.partitionBy()
    bd = float(n_buckets)
    lw = grid.select(
        "b",
        F.floor(
            F.log(
                (
                    (F.col("ct").cast("double") + F.lit(1.0))
                    * (F.sum("cs").over(wall).cast("double") + F.lit(bd))
                )
                / (
                    (F.col("cs").cast("double") + F.lit(1.0))
                    * (F.sum("ct").over(wall).cast("double") + F.lit(bd))
                )
            )
            * F.lit(1e6)
        )
        .cast("bigint")
        .alias("lwm"),
    )
    return (
        bucketed.join(F.broadcast(lw), "b")
        .groupBy(id_col, lang_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            (F.sum("lwm").cast("double") / F.lit(1e6)).alias("log_weight"),
        )
        .orderBy(id_col)
    )


def bpe_merge_candidates(
    df: DataFrame, text_col: str, top_k: int = 50
) -> DataFrame:
    """F35 — the first BPE merge-table step: corpus-weighted adjacent
    character-pair frequencies within words. The pair ranking a
    byte-pair-encoding tokenizer trainer would merge first —
    tokenizer_fertility (F32) scores an existing vocab, this is the
    statistic vocab TRAINING consumes.

    Exactness: pure integer counts; ties break lexicographically.

    Plan: word-vocab aggregate first (Zipf collapse: pair explosion
    runs over DISTINCT words × their corpus counts, not raw tokens),
    then a pair-key aggregate and a TakeOrdered top-k. At 100 TB the
    pair stage is vocab-scale, not corpus-scale.
    """
    words = (
        df.select(F.explode(F.expr(_toks(text_col))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wc"))
    )
    pairs = words.select(
        "wc",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(1, length(word) - 1)),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
    ).where(F.length("pair") == 2)
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").cast("bigint").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(top_k)
    )


def stupid_backoff_logprob(
    df: DataFrame, id_col: str, text_col: str, alpha: float = 0.4
) -> DataFrame:
    """F36 — stupid-backoff bigram LM scoring (Brants et al. 2007,
    "Large Language Models in Machine Translation"): each adjacent
    token pair scores ln(c(w1w2)/c(w1)) when the bigram is attested,
    else ln(α·c(w2)/T). The web-scale LM smoothing that needs no
    discount estimation — F28's closed-vocab bigram logprob breaks on
    unseen pairs; this is what you actually run on a new crawl.

    Exactness: both score tables quantize ln once per DISTINCT
    bigram/unigram (micro-nats); per-doc reductions are exact
    integer sums.

    Plan: one pair explode feeds the bigram counts; the unigram table
    is vocab-scale; both broadcast back onto a second pair explode;
    one doc-key aggregate. Zero corpus-sized shuffles beyond the
    map-combined count aggregates.
    """
    pairs = df.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"""filter(
                    transform(array(split({NORM.format(col=text_col)}, ' ')),
                      t -> transform(sequence(1, greatest(1, size(t) - 1)),
                               i -> struct(element_at(t, i) as w1,
                                           try_element_at(t, i + 1) as w2)))[0],
                    p -> p.w1 != '' AND p.w2 IS NOT NULL AND p.w2 != '')"""
            )
        ).alias("p"),
    ).select(F.col(id_col), F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    uni = (
        df.select(F.explode(F.expr(_toks(text_col))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cu"))
    )
    wall = Window.partitionBy()
    uni_scored = uni.select(
        "w",
        "cu",
        F.floor(
            F.log(
                F.lit(alpha)
                * F.col("cu").cast("double")
                / F.sum("cu").over(wall).cast("double")
            )
            * F.lit(1e6)
        ).cast("bigint").alias("uq"),
    )
    bi = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("cb")
    )
    bi_scored = (
        bi.join(F.broadcast(uni.select(F.col("w").alias("w1"), "cu")), "w1")
        .select(
            "w1",
            "w2",
            F.floor(
                F.log(F.col("cb").cast("double") / F.col("cu").cast("double"))
                * F.lit(1e6)
            ).cast("bigint").alias("bq"),
        )
    )
    scored = (
        pairs.join(F.broadcast(bi_scored), ["w1", "w2"], "left")
        .join(
            F.broadcast(uni_scored.select(F.col("w").alias("w2"), "uq")), "w2"
        )
        .select(
            F.col(id_col),
            F.coalesce(F.col("bq"), F.col("uq")).alias("sq"),
            F.when(F.col("bq").isNull(), 1).otherwise(0).alias("backoff"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("backoff").cast("bigint").alias("n_backoff"),
            (
                F.sum("sq").cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1e6)
            ).alias("mean_logprob"),
        )
        .orderBy(id_col)
    )


def mojibake_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """F37 — encoding-artifact audit: per doc, counts of UTF-8
    mojibake markers (the Ã/Â/â ledes of double-decoded Latin-1),
    the U+FFFD replacement char, and C0 control bytes, plus an
    artifacts-per-char rate. The data-cleaning gate that catches
    broken decoders BEFORE quality filters mistake mojibake for rare
    vocabulary.

    Exactness: pure length/regexp integer arithmetic; the rate
    divides exact ints.

    Plan: single codegen scan, no shuffle (doc-keyed projection).
    """
    t = F.col(text_col)

    def count_re(pat: str) -> F.Column:
        return (
            F.length(t) - F.length(F.regexp_replace(t, pat, ""))
        ).cast("bigint")

    moji = count_re("[ÃÂâ]")
    repl = count_re("�")
    ctrl = count_re("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]")
    return df.select(
        F.col(id_col),
        F.length(t).cast("bigint").alias("n_chars"),
        moji.alias("n_mojibake"),
        repl.alias("n_replacement"),
        ctrl.alias("n_control"),
        F.when(
            F.length(t) > 0,
            (moji + repl + ctrl).cast("double") / F.length(t).cast("double"),
        ).otherwise(F.lit(0.0)).alias("artifact_rate"),
    ).orderBy(id_col)


def boilerplate_prefixes(
    df: DataFrame, id_col: str, text_col: str, group_col: str,
    prefix_chars: int = 32, top_k: int = 3,
) -> DataFrame:
    """F38 — per-source boilerplate detection: the most-shared
    document PREFIXES (first `prefix_chars` normalized chars) within
    each source and the share of the source's docs carrying them.
    Crawl sources wrap every page in the same banner/disclaimer —
    CCNet-style cleaning strips these BEFORE dedup, or MinHash
    drowns in template matches.

    Exactness: md5 prefixes and counts are exact; the share divides
    exact ints; top-k ties break on the hash.

    Plan: one (source, prefix-hash) aggregate, a per-source
    WindowGroupLimit top-k — the corpus shuffles once on the
    composite key.
    """
    norm = NORM.format(col=text_col)
    h = F.md5(F.substring(F.expr(norm), 1, prefix_chars))
    g = (
        df.select(F.col(group_col).alias("src"), h.alias("ph"))
        .groupBy("src", "ph")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    # per-source totals via groupBy + broadcast join — a
    # partitionBy(src) sum window would stream every (src, prefix)
    # row of a source through one task just to attach a constant
    totals = g.groupBy("src").agg(F.sum("n_docs").alias("n_src"))
    wr = Window.partitionBy("src").orderBy(F.col("n_docs").desc(), "ph")
    return (
        g.join(F.broadcast(totals), "src")
        .withColumn("r", F.row_number().over(wr))
        .where(F.col("r") <= top_k)
        .select(
            F.col("src").alias("source"),
            F.col("r").alias("rank"),
            F.col("ph").alias("prefix_hash"),
            "n_docs",
            (
                F.col("n_docs").cast("double") / F.col("n_src").cast("double")
            ).alias("doc_share"),
        )
        .orderBy("source", "rank")
    )


def readability_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """F39 — Flesch reading-ease per doc from exact integer counts:
    words, sentences, and vowel-group syllables (the standard
    heuristic syllable proxy). Readability is a stock quality-filter
    feature (curricula bucket by it; OCR soup scores absurdly).

    Exactness: all three counts are regexp/length integer arithmetic;
    the Flesch constants enter as exact-parsed double literals and
    the score is shape-mirrored double math (no quantization needed —
    inputs are identical ints).

    Plan: single codegen scan, no shuffle.
    """
    norm = NORM.format(col=text_col)
    words = F.expr(f"size(filter(split({norm}, ' '), w -> w != ''))").cast(
        "bigint"
    )
    sents = F.expr(
        f"greatest(1, size(filter(split({text_col}, '[.!?]'), s -> length(trim(s)) > 0)))"
    ).cast("bigint")
    syl_src = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", "")
    syls = (
        F.length(F.regexp_replace(syl_src, "[aeiouy]+", "#"))
        - F.length(F.regexp_replace(syl_src, "[aeiouy]+", ""))
    ).cast("bigint")
    wd = F.col("n_words").cast("double")
    sd = F.col("n_sentences").cast("double")
    yd = F.col("n_syllables").cast("double")
    flesch = (
        F.lit(206.835) - F.lit(1.015) * (wd / sd) - F.lit(84.6) * (yd / wd)
    )
    return (
        df.select(
            F.col(id_col),
            words.alias("n_words"),
            sents.alias("n_sentences"),
            syls.alias("n_syllables"),
        )
        .where(F.col("n_words") > 0)
        .select(
            id_col,
            "n_words",
            "n_sentences",
            "n_syllables",
            flesch.alias("flesch_score"),
        )
        .orderBy(id_col)
    )


def rake_keywords(
    df: DataFrame, id_col: str, text_col: str, top_k: int = 20
) -> DataFrame:
    """F40 — RAKE keyword extraction (Rose et al. 2010): candidate
    phrases are maximal stopword-free word runs; each word scores
    degree/frequency (degree = summed length of phrases containing
    it); a phrase scores the sum of its words' scores. The corpus's
    top phrases — the unsupervised topic inventory tf-idf's
    single-token view can't produce.

    Exactness: degree and frequency are exact integers; per-word
    scores quantize to a 1e-9 grid once, so phrase scores are exact
    integer sums; top-k ties break on the phrase string.

    Plan: one phrase explode (regexp split on stopword boundaries),
    one word explode for the degree/frequency table (vocab-scale,
    broadcast back), one phrase-key aggregate, TakeOrdered top-k.
    """
    stop_pat = "|".join(STOPWORDS)
    norm = NORM.format(col=text_col)
    phrase_expr = (
        f"filter(split(regexp_replace({norm}, '\\\\b({stop_pat})\\\\b', '|'), "
        f"'\\\\|'), p -> length(trim(p)) > 0)"
    )
    phrases = (
        df.select(F.explode(F.expr(phrase_expr)).alias("p0"))
        .select(F.trim(F.col("p0")).alias("phrase"))
        .where(F.length("phrase") > 0)
    )
    pw = phrases.select(
        "phrase",
        F.expr("filter(split(phrase, ' '), w -> w != '')").alias("ws"),
    ).select("phrase", F.size("ws").alias("plen"), F.explode("ws").alias("w"))
    word_stats = pw.groupBy("w").agg(
        F.sum("plen").cast("bigint").alias("deg"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
    )
    wq = word_stats.select(
        "w",
        F.floor(
            F.col("deg").cast("double") / F.col("freq").cast("double")
            * F.lit(1e9)
        ).cast("bigint").alias("score_nano"),
    )
    distinct_p = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )
    dw = distinct_p.select(
        "phrase",
        F.explode(F.expr("filter(split(phrase, ' '), w -> w != '')")).alias(
            "w"
        ),
    ).join(F.broadcast(wq), "w")
    scores = dw.groupBy("phrase").agg(F.sum("score_nano").alias("sn"))
    return (
        distinct_p.join(scores, "phrase")
        .select(
            "phrase",
            "n_occurrences",
            (F.col("sn").cast("double") / F.lit(1e9)).alias("rake_score"),
        )
        .orderBy(F.col("rake_score").desc(), "phrase")
        .limit(top_k)
    )


def license_notice_rate(
    df: DataFrame, id_col: str, text_col: str, group_col: str
) -> DataFrame:
    """F41 — license/copyright notice scan per source: the share of
    documents carrying copyright or license markers. The corpus-
    governance report run before any release — sources saturated
    with all-rights-reserved notices need review, not silent
    ingestion.

    Exactness: marker hits are regexp booleans; rates divide exact
    counts.

    Plan: single codegen scan + one small (source) aggregate.
    """
    low = F.lower(F.col(text_col))
    has_copyright = (
        low.contains("copyright") | low.contains("(c)")
        | low.contains("all rights reserved")
    ).cast("int")
    has_license = (
        low.contains("licensed under") | low.contains("license")
        | low.contains("creative commons")
    ).cast("int")
    g = df.select(
        F.col(group_col).alias("source"),
        has_copyright.alias("hc"),
        has_license.alias("hl"),
    ).groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("hc").cast("bigint").alias("n_copyright"),
        F.sum("hl").cast("bigint").alias("n_license"),
    )
    return g.select(
        "source",
        "n_docs",
        "n_copyright",
        "n_license",
        (
            F.col("n_copyright").cast("double") / F.col("n_docs").cast("double")
        ).alias("copyright_rate"),
        (
            F.col("n_license").cast("double") / F.col("n_docs").cast("double")
        ).alias("license_rate"),
    ).orderBy("source")


def doc_stitch_pairs(
    docs: DataFrame, id_col: str, text_col: str,
    k: int = 2, max_df: int = 64,
) -> DataFrame:
    """F44 — document-stitching detector: pairs (a, b) where the last
    k normalized tokens of a equal the first k tokens of b. Finds
    split/continued documents (pagination, chunked crawls) that
    concat-style dedup misses — the pre-pass before re-joining
    fragments into one training document.

    Boilerplate guard: a head- or tail-key shared by more than
    max_df docs (template openings/closings) is excluded — stitch
    evidence must be rare to be evidence, and the cap bounds the
    join fanout to max_df^2 per key at any corpus size (the D3
    df-cap discipline).

    Plan: two key-count shuffles + one equi-join on the stitch key;
    no text payload moves past the first projection.
    """
    toks = _toks(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"array_join(slice({toks}, 1, {k}), ' ')").alias("head_k"),
        F.expr(f"array_join(slice({toks}, -{k}, {k}), ' ')").alias("tail_k"),
        F.expr(f"size({toks})").alias("n_toks"),
    ).where(F.col("n_toks") >= 2 * k)
    hc = base.groupBy("head_k").agg(F.count(F.lit(1)).alias("h_df"))
    tc = base.groupBy("tail_k").agg(F.count(F.lit(1)).alias("t_df"))
    tails = (
        base.join(tc, "tail_k")
        .where(F.col("t_df") <= max_df)
        .select(F.col("doc_id").alias("doc_a"), F.col("tail_k").alias("stitch_key"))
    )
    heads = (
        base.join(hc, "head_k")
        .where(F.col("h_df") <= max_df)
        .select(F.col("doc_id").alias("doc_b"), F.col("head_k").alias("stitch_key"))
    )
    return (
        tails.join(heads, "stitch_key")
        .where(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b", "stitch_key")
        .orderBy("doc_a", "doc_b")
    )


def char_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """F45 — per-document character-distribution entropy (nats) over
    a fixed 37-symbol alphabet (a-z, 0-9, space) plus an "other"
    bucket. The gibberish/compressibility screen: natural text sits
    in a narrow entropy band, base64 blobs and key-mash spam sit
    high, repeated-char padding sits low — a per-doc complement to
    the corpus-level entropy_by_source.

    Exactness: per-symbol counts come from length-difference
    expressions (no tokenizer, no explode); each n·ln(n) term
    quantizes to micro-nats BEFORE summation (ln of an exact
    integer is the identical double in both engines), so the
    reduction is an exact integer fold; the readout is ln(L) minus
    ONE single division, snapped to a 1e-9 grid.

    Plan: map-only — one codegen projection per doc, no shuffle at
    all. The cheapest possible 100 TB scan shape.
    """
    # Materialize the normalized text ONCE: inlining the regex NORM
    # into each of the 37 per-symbol count expressions re-ran ~74
    # regexp_replace passes per row (7.9 s at sf0.1; 4x after this).
    # CollapseProject keeps the boundary because regexp_replace is
    # not "cheap", so the projection below stays a separate stage.
    pre = df.select(
        F.col(id_col), F.expr(NORM.format(col=text_col)).alias("nrm")
    )
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 "
    cnts = ", ".join(
        f"cast(length(nrm) - length(replace(nrm, '{ch}', ''))"
        " as bigint)"
        for ch in alphabet
    )
    arr = f"array({cnts})"
    total = "cast(length(nrm) as bigint)"
    counted = f"aggregate({arr}, cast(0 as bigint), (a, x) -> a + x)"
    term = (
        "n -> IF(n > 0, cast(floor(cast(n as double)"
        " * ln(cast(n as double)) * 1e6) as bigint), cast(0 as bigint))"
    )
    s_counted = (
        f"aggregate(transform({arr}, {term}),"
        " cast(0 as bigint), (a, x) -> a + x)"
    )
    out = pre.select(
        F.col(id_col),
        F.expr(total).alias("L"),
        F.expr(arr).alias("cnt_arr"),
        F.expr(counted).alias("counted"),
        F.expr(s_counted).alias("s_counted"),
    ).where(F.col("L") > 0)
    o = F.col("L") - F.col("counted")
    s_other = F.when(
        o > 0,
        F.floor(o.cast("double") * F.log(o.cast("double")) * F.lit(1e6)).cast(
            "bigint"
        ),
    ).otherwise(F.lit(0))
    s_all = F.col("s_counted") + s_other
    h = F.log(F.col("L").cast("double")) - s_all.cast("double") / (
        F.col("L").cast("double") * F.lit(1e6)
    )
    return out.select(
        F.col(id_col),
        F.col("L").alias("n_chars"),
        (
            F.expr("size(filter(cnt_arr, n -> n > 0))").cast("int")
            + F.when(o > 0, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_distinct_symbols"),
        (F.floor(h * F.lit(1e9)) / F.lit(1e9)).alias("entropy_nats"),
    ).orderBy(id_col)


def topk_coverage_curve(
    df: DataFrame, id_col: str, text_col: str,
    ks: tuple[int, ...] = (10, 100, 1000, 10000),
) -> DataFrame:
    """F46 — cumulative token-mass coverage of the top-k vocabulary
    ranks: for each budget k, how many corpus tokens the k most
    frequent types cover. THE sizing table for vocab/tokenizer
    budget decisions (and the practical companion to zipf_fit's
    exponent estimate).

    Exactness: counts are exact; ranks break ties on the term
    string; shares are single divisions of exact integers.

    Plan: one term-count shuffle; the rank cut is TakeOrdered
    (limit max(ks)) — NO global sort materializes the full vocab;
    the cumulative window then runs on <= max(ks) rows.
    """
    norm = NORM.format(col=text_col)
    terms = df.select(
        F.explode(F.expr(f"split({norm}, ' ')")).alias("term")
    ).where(F.col("term") != "")
    counts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(
        F.sum("n").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
    )
    top = counts.orderBy(F.desc("n"), "term").limit(max(ks))
    wr = Window.orderBy(F.desc("n"), "term")
    ranked = top.select(
        "n",
        F.row_number().over(wr).alias("rn"),
        F.sum("n")
        .over(wr.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    ks_df = ranked.crossJoin(
        F.broadcast(
            df.sparkSession.createDataFrame(
                [(k,) for k in ks], "k int"
            )
        )
    ).where(F.col("rn") <= F.col("k"))
    return (
        ks_df.groupBy("k")
        .agg(
            F.max("rn").cast("bigint").alias("ranks_used"),
            F.max("cum").cast("bigint").alias("covered_tokens"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "k",
            "ranks_used",
            "covered_tokens",
            "total_tokens",
            (
                F.col("covered_tokens").cast("double")
                / F.col("total_tokens").cast("double")
            ).alias("coverage"),
        )
        .orderBy("k")
    )


def burrows_delta(
    df: DataFrame, id_col: str, text_col: str, group_col: str,
    n_terms: int = 20,
) -> DataFrame:
    """F47 — Burrows' Delta stylometric distance between sources:
    take the corpus's top-n most frequent terms, compute each
    source's rate per million tokens, z-score each term's rate
    across sources, and Delta(a,b) = mean |z_a - z_b|. THE
    authorship/provenance distance — near-zero Delta between two
    "different" sources flags relabeled or templated feeds.

    Exactness: rates are integer per-million floors; z-scores are
    (n·r - S)/sqrt(n·Σr² - S²) on exact integers (identical
    doubles); per-pair sums fold nano-quantized |z| diffs with a
    single-division readout.

    Plan: one (group, term) count shuffle; the top-n cut is
    TakeOrdered; everything after runs on a sources x n_terms grid
    (bounded, broadcast-joined). Scales with corpus scan only.
    """
    norm = NORM.format(col=text_col)
    terms = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.expr(f"split({norm}, ' ')")).alias("term"),
    ).where(F.col("term") != "")
    gcounts = terms.groupBy("grp", "term").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    gtotals = gcounts.groupBy("grp").agg(F.sum("cnt").alias("tok"))
    top = (
        gcounts.groupBy("term")
        .agg(F.sum("cnt").alias("tot"))
        .orderBy(F.desc("tot"), "term")
        .limit(n_terms)
        .select("term")
    )
    grid = gtotals.crossJoin(F.broadcast(top))
    rates = grid.join(gcounts, ["grp", "term"], "left").select(
        "grp",
        "term",
        F.expr(
            "(coalesce(cnt, 0) * cast(1000000 as bigint)) div tok"
        ).alias("r"),
    )
    stats = rates.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").alias("s"),
        F.sum(F.col("r").cast("decimal(38,0)") * F.col("r")).alias("ss"),
    )
    z = rates.join(F.broadcast(stats), "term").select(
        "grp",
        "term",
        (
            (F.col("n") * F.col("r") - F.col("s")).cast("double")
            / F.sqrt(
                (
                    F.col("n").cast("double") * F.col("ss").cast("double")
                    - F.col("s").cast("double") * F.col("s").cast("double")
                )
            )
        ).alias("z"),
    )
    a = z.select(
        F.col("grp").alias("source_a"), "term", F.col("z").alias("za")
    )
    b = z.select(
        F.col("grp").alias("source_b"), "term", F.col("z").alias("zb")
    )
    pairs = a.join(b, "term").where(F.col("source_a") < F.col("source_b"))
    qd = F.floor(F.abs(F.col("za") - F.col("zb")) * F.lit(1e9)).cast("bigint")
    return (
        pairs.select("source_a", "source_b", qd.alias("qd"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum("qd").alias("sqd"),
        )
        .select(
            "source_a",
            "source_b",
            (
                F.col("sqd").cast("double")
                / (F.col("n_terms").cast("double") * F.lit(1e9))
            ).alias("delta"),
        )
        .orderBy("source_a", "source_b")
    )


def mattr_diversity(
    df: DataFrame, group_col: str, text_col: str, window: int = 50
) -> DataFrame:
    """F48 — moving-average type-token ratio (MATTR, Covington &
    McFall 2010) rolled up per group: the length-robust lexical-
    diversity score — plain TTR collapses as documents grow, MATTR
    slides a fixed window so short and long documents compare
    fairly. Low group MATTR flags templated/repetitive feeds that
    static F9 TTR (computed over the pooled vocabulary) can miss.

    Exactness: per-doc MATTR is a ratio of exact ints (sum of
    window distinct-counts over n_windows*window) quantized to
    floor(1e9·x); the group rollup folds those ints and divides
    once.

    Plan: entirely map-only per document — the sliding windows are
    an in-row array transform (no explode, no shuffle); the group
    report is one |groups|-row partial agg.
    """
    toks = f"split(trim({text_col}), '\\\\s+')"
    L = f"size({toks})"
    w = f"least({window}, {L})"
    nw = f"({L} - {w} + 1)"
    sumd = (
        f"aggregate(transform(sequence(1, {nw}),"
        f" i -> size(array_distinct(slice({toks}, i, {w})))),"
        f" 0L, (a, x) -> a + x)"
    )
    per_doc = df.select(
        F.col(group_col).alias("grp"),
        F.floor(
            F.lit(1e9)
            * F.expr(sumd).cast("double")
            / F.expr(f"CAST({nw} * {w} AS DOUBLE)")
        )
        .cast("bigint")
        .alias("qm"),
    )
    return per_doc.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (
            F.sum("qm").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1e9)
        ).alias("mean_mattr"),
        (F.min("qm").cast("double") / F.lit(1e9)).alias("min_mattr"),
        (F.max("qm").cast("double") / F.lit(1e9)).alias("max_mattr"),
    ).select(
        F.col("grp").alias(group_col),
        "n_docs",
        "mean_mattr",
        "min_mattr",
        "max_mattr",
    )


def char_trigram_logprob(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """F49 — character-trigram LM quality score: per-doc mean
    trigram log-probability under the corpus's own char-3gram model.
    The sub-word twin of F16's unigram gate — catches symbol soup,
    transliteration noise and encoding damage INSIDE tokens that a
    word-level LM scores as normal unseen words.

    Cross-engine exactness: F16's scheme — each distinct trigram's
    ln(p) quantizes once to micro-nats in the LM table; every
    downstream reduction is exact integer math.

    Plan: two in-row trigram expansions (no corpus shuffle beyond
    the vocab-sized LM agg), LM broadcast back, one doc-key agg.
    The char-trigram vocab is alphabet^3-bounded — KBs at any
    corpus size.
    """
    norm = NORM.format(col=text_col)
    tris_expr = (
        f"transform(sequence(1, greatest(length({norm}) - 2, 1)),"
        f" i -> substring({norm}, i, 3))"
    )
    tris = df.select(
        F.col(id_col), F.explode(F.expr(tris_expr)).alias("tri")
    )
    lm = (
        tris.groupBy("tri")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("total", F.sum("cnt").over(Window.partitionBy()))
        .withColumn(
            "qlp",
            F.floor(
                F.log(
                    F.col("cnt").cast("double") / F.col("total").cast("double")
                )
                * F.lit(1e6)
            ).cast("bigint"),
        )
        .select("tri", "qlp")
    )
    return (
        tris.join(F.broadcast(lm), "tri")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tris"),
            F.sum("qlp").alias("sum_qlp"),
        )
        .select(
            id_col,
            "n_tris",
            (
                F.col("sum_qlp").cast("double")
                / F.col("n_tris").cast("double")
                / F.lit(1e6)
            ).alias("mean_logprob"),
        )
    )


def term_burstiness(
    df: DataFrame, text_col: str, top_k: int = 30
) -> DataFrame:
    """F50 — Church-Gale term burstiness for the corpus's top-k
    terms: mean occurrences PER CONTAINING DOCUMENT (tf/df). Content
    words burst (a doc about a topic repeats its terms); function
    words spread evenly (burstiness ~ tf/n_docs share). The classic
    IR statistic separating topical vocabulary from glue — feeds
    stopword induction and keyword weighting without any language
    resource.

    Exactness: tf and df are exact counts; burstiness is one
    division; the top-k cut orders by (tf desc, term) — total and
    deterministic.

    Plan: one (term) count shuffle computing tf and df in the same
    agg (df via countDistinct on the doc id), then TakeOrdered
    top-k — no global sort materializes.
    """
    toks = df.select(
        F.col("doc_id"), F.explode(F.expr(_toks(text_col))).alias("tok")
    ).where(F.col("tok") != "")
    agg = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"),
        F.countDistinct("doc_id").cast("bigint").alias("df"),
    )
    return (
        agg.orderBy(F.desc("tf"), F.asc("tok"))
        .limit(top_k)
        .select(
            F.col("tok").alias("term"),
            "tf",
            "df",
            (F.col("tf").cast("double") / F.col("df").cast("double")).alias(
                "burstiness"
            ),
        )
        .orderBy(F.desc("tf"), F.asc("term"))
    )


def source_coherence(
    df: DataFrame, group_col: str, id_col: str, text_col: str
) -> DataFrame:
    """F51 — topical coherence of each source: cosine of every doc's
    term-frequency vector against its source's TF centroid, rolled
    up to mean/min cosine and the share of docs below 0.5. A LOW-
    coherence source mixes unrelated content (scraped aggregators,
    mislabeled feeds) and deserves doc-level rather than source-
    level curation decisions.

    Exactness: centroid weights quantize to floor(w*1e9) ints (dot)
    and floor(w^2*1e12) ints (norm — per-term, keeping folds below
    2^53 per parity.py trap #2); doc norms are exact tf^2 ints;
    per-doc cosines snap to 1e-9 before the source fold.

    Plan: one (doc, term) tf shuffle, a (source, term) centroid agg
    (vocab-bounded), a broadcast centroid join back, one doc agg,
    one |sources|-row report.
    """
    toks = df.select(
        F.col(group_col).alias("src"),
        F.col(id_col).alias("id"),
        F.explode(F.expr(_toks(text_col))).alias("tok"),
    ).where(F.col("tok") != "")
    tfs = toks.groupBy("src", "id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    st = toks.groupBy("src", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("stf")
    )
    tot = toks.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("T"))
    w = (
        st.join(F.broadcast(tot), "src")
        .select(
            "src",
            "tok",
            F.floor(
                F.col("stf").cast("double") / F.col("T").cast("double") * F.lit(1e9)
            )
            .cast("bigint")
            .alias("qw"),
            F.floor(
                (F.col("stf").cast("double") / F.col("T").cast("double"))
                * (F.col("stf").cast("double") / F.col("T").cast("double"))
                * F.lit(1e12)
            )
            .cast("bigint")
            .alias("qw2"),
        )
    )
    cnorm = w.groupBy("src").agg(F.sum("qw2").alias("cn2"))
    per_doc = (
        tfs.join(w, ["src", "tok"])
        .groupBy("src", "id")
        .agg(
            F.sum(F.col("tf") * F.col("qw")).alias("sd"),
            F.sum(F.col("tf") * F.col("tf")).alias("dn2"),
        )
        .join(F.broadcast(cnorm), "src")
    )
    cos = (F.col("sd").cast("double") / F.lit(1e9)) / (
        F.sqrt(F.col("dn2").cast("double"))
        * F.sqrt(F.col("cn2").cast("double") / F.lit(1e12))
    )
    qcos = F.floor(cos * F.lit(1e9)).cast("bigint")
    return (
        per_doc.select("src", qcos.alias("qc"))
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("qc").alias("sq"),
            F.min("qc").alias("mn"),
            F.sum(
                F.when(F.col("qc") < 500_000_000, F.lit(1)).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_low"),
        )
        .select(
            F.col("src").alias(group_col),
            "n_docs",
            (
                F.col("sq").cast("double")
                / F.col("n_docs").cast("double")
                / F.lit(1e9)
            ).alias("mean_cosine"),
            (F.col("mn").cast("double") / F.lit(1e9)).alias("min_cosine"),
            (
                F.col("n_low").cast("double") / F.col("n_docs").cast("double")
            ).alias("low_share"),
        )
        .orderBy(group_col)
    )


def oov_rate_by_source(
    df: DataFrame, group_col: str, text_col: str,
    ks: tuple[int, ...] = (100, 500, 1000),
) -> DataFrame:
    """F52/P67 — per-source OOV impact of a vocabulary cut: if the
    tokenizer keeps only the global top-k types, what fraction of
    each source's tokens become UNK? F26's corpus curve picks k;
    this shows WHO pays for it — a source full of rare vocabulary
    (code, names, other languages) degrades first.

    Exactness: ranks are a deterministic (count desc, term) order;
    OOV counts are exact ints; the rate is one division.

    Plan: one (term) count agg, a vocab-bounded rank window, a
    broadcast vocab join back onto (source, term) counts, one
    |sources x ks| report.
    """
    toks = df.select(
        F.col(group_col).alias("src"),
        F.explode(F.expr(_toks(text_col))).alias("tok"),
    ).where(F.col("tok") != "")
    vocab = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wr = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    ranked = vocab.withColumn("rnk", F.row_number().over(wr)).select(
        "tok", "rnk"
    )
    st = toks.groupBy("src", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    karr = F.array(*[F.lit(int(k)) for k in ks])
    fan = (
        st.join(F.broadcast(ranked), "tok")
        .select("src", "tf", "rnk", F.explode(karr).alias("k"))
    )
    return (
        fan.groupBy("src", "k")
        .agg(
            F.sum("tf").cast("bigint").alias("tokens"),
            F.sum(F.when(F.col("rnk") > F.col("k"), F.col("tf")).otherwise(0))
            .cast("bigint")
            .alias("oov_tokens"),
        )
        .select(
            F.col("src").alias(group_col),
            F.col("k").cast("int").alias("vocab_k"),
            "tokens",
            "oov_tokens",
            (
                F.col("oov_tokens").cast("double")
                / F.col("tokens").cast("double")
            ).alias("oov_rate"),
        )
        .orderBy(group_col, "vocab_k")
    )


def yule_k(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """F53 — Yule's K lexical-richness characteristic per group:
    K = 1e4 * (sum_f f^2·V_f - N) / N^2 over the token frequency
    spectrum (V_f types occurring f times, N tokens). Unlike the raw
    TTR (F9) K is length-invariant, which is what makes it usable to
    compare sources with very different document counts — high K =
    repetitive vocabulary, low K = rich.

    Plan: explode → (group, term) count (map-side combine absorbs the
    Zipf head) → one integer-moment fold per group. Integer-exact
    until the single final division.
    """
    terms = df.select(
        F.col(group_col), F.explode(F.expr(_toks(text_col))).alias("term")
    ).where(F.col("term") != "")
    counts = terms.groupBy(group_col, "term").agg(
        F.count(F.lit(1)).alias("n")
    )
    moments = counts.groupBy(group_col).agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n"))
        .cast("decimal(38,0)")
        .alias("sum_freq_sq"),
    )
    nn = F.col("n_tokens").cast("double")
    return moments.select(
        group_col,
        "n_tokens",
        "vocab_size",
        F.col("sum_freq_sq").cast("bigint").alias("sum_freq_sq"),
        (
            F.lit(1e4)
            * (F.col("sum_freq_sq").cast("double") - nn)
            / (nn * nn)
        ).alias("yule_k"),
    )


def casing_profile(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """F54 — token-casing mix per group: shares of ALL-CAPS, Title-
    Case, and pure-digit tokens. Shouting (caps-heavy) and
    numeric-table text are quality signals the lowercased token
    pipeline (F9/F13) is blind to by construction — this profiles
    the RAW tokens before normalization eats the evidence.

    Plan: explode raw whitespace tokens → one group aggregate;
    classification is pure codegen regex/compare on each token.
    """
    raw = (
        f"split(regexp_replace(trim({text_col}), '\\\\s+', ' '), ' ')"
    )
    toks = df.select(
        F.col(group_col), F.explode(F.expr(raw)).alias("tok")
    ).where(F.col("tok") != "")
    is_upper = F.col("tok").rlike("^[A-Z]{2,}$")
    is_title = F.col("tok").rlike("^[A-Z][a-z]+$")
    is_digit = F.col("tok").rlike("^[0-9]+$")
    return (
        toks.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.count_if(is_upper).cast("bigint").alias("n_upper"),
            F.count_if(is_title).cast("bigint").alias("n_title"),
            F.count_if(is_digit).cast("bigint").alias("n_digit"),
        )
        .select(
            group_col,
            "n_tokens",
            (
                F.col("n_upper").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("upper_share"),
            (
                F.col("n_title").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("title_share"),
            (
                F.col("n_digit").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("digit_share"),
        )
    )


def langid_margin(df: DataFrame, text_col: str, lang_col: str) -> DataFrame:
    """F55 — language-ID confidence calibration: per true language,
    the mean margin between the top and runner-up marker scores and
    the share of low-margin (<= 1 marker) calls. F12's confusion
    matrix says WHERE the classifier errs; the margin says how close
    every call was — the signal a routing pipeline thresholds before
    trusting F1's label.

    Plan: the same single-scan marker scoring as F1, one aggregate
    per true language; margins are pure codegen integer arithmetic.
    """
    scores = [
        F.expr(_marker_score(text_col, lang)).alias(f"{lang}_score")
        for lang in MARKERS
    ]
    scored = df.select(F.col(lang_col).alias("lang"), *scores)
    cols = [F.col(f"{lang}_score") for lang in MARKERS]
    top = F.greatest(*cols)
    total = cols[0] + cols[1] + cols[2] + cols[3]
    second = F.sort_array(F.array(*cols), asc=False)[1]
    margin = (top - second).cast("bigint")
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            (
                F.sum(margin).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_margin"),
            F.count_if(margin <= 1).cast("bigint").alias("n_low_margin"),
            (
                F.count_if(margin <= 1).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("low_margin_share"),
            F.count_if(total == 0).cast("bigint").alias("n_no_signal"),
        )
        .orderBy("lang")
    )


def sentence_dedup_rate(
    df: DataFrame, group_col: str, text_col: str, min_chars: int = 20
) -> DataFrame:
    """F56 — sentence-level boilerplate rate: per group, the share of
    (>= min_chars) sentences that also occur in some OTHER document.
    Catches the disclaimer/footer/injected-notice duplication that
    document-level dedup (D1/D2) is blind to and prefix mining (F42)
    only sees at the start of docs.

    Plan: sentence explode → per-doc distinct → one sentence-count
    shuffle (map-side combine absorbs the boilerplate head) → join
    back on the sentence key → group rollup.
    """
    sents = (
        df.select(
            F.col(group_col),
            F.col("doc_id"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\.\s+")
            ).alias("sent"),
        )
        .select(
            group_col, "doc_id", F.trim(F.col("sent")).alias("sent")
        )
        .where(F.length("sent") >= min_chars)
        .distinct()
    )
    docfreq = sents.groupBy("sent").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    return (
        sents.join(docfreq, "sent")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sentences"),
            F.count_if(F.col("df") > 1)
            .cast("bigint")
            .alias("n_shared"),
            (
                F.count_if(F.col("df") > 1).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("shared_share"),
        )
        .orderBy(group_col)
    )
