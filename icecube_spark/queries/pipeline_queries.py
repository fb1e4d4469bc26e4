"""Training-data pipeline queries (SURVEY §2 group P) over documents.

The corpus-management surface: deterministic splits/samples, PII
redaction, corpus term stats, exact length profiles, dedup-cluster
assignment. Twins in pipeline_oracles.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icecube_spark import catalog
from icecube_spark.operators import dedup, pipeline


def _docs(spark, sf_dir):
    return catalog.load(spark, sf_dir, "documents")


def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — deterministic 90/5/5 hash split of the corpus."""
    out = pipeline.train_test_split(_docs(spark, sf_dir), "doc_id")
    return out.select("doc_id", "bucket", "split").orderBy("doc_id")


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — deterministic ~20% per-language sample."""
    out = pipeline.stratified_sample(_docs(spark, sf_dir), "doc_id", "lang", pct=20)
    return out.select("doc_id", "lang").orderBy("doc_id")


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — email/phone scrub. The synthetic corpus carries no PII, so
    the query plants a deterministic email+phone per doc first (same
    expression in the oracle) and the operator must remove exactly
    those; clean_md5 proves the output text matches byte-for-byte."""
    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.expr(
            "concat(text, ' reach user', cast(doc_id as string),"
            " '@example.com or 555-',"
            " lpad(cast(doc_id % 1000 as string), 3, '0'), '-',"
            " lpad(cast(doc_id % 10000 as string), 4, '0'))"
        ),
    )
    out = pipeline.pii_redact(docs, "text")
    return out.select(
        "doc_id",
        "n_emails",
        "n_phones",
        F.length("clean_text").cast("int").alias("clean_len"),
        F.md5("clean_text").alias("clean_md5"),
    ).orderBy("doc_id")


def topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — top-20 corpus terms by frequency."""
    return pipeline.topk_terms(_docs(spark, sf_dir), "text", dedup.NORM, k=20)


def topk_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 — top-5 terms per language (per-stratum heavy hitters)."""
    return pipeline.topk_terms_per_group(
        _docs(spark, sf_dir), "lang", "text", dedup.NORM, k=5
    )


def doc_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — exact per-language length profile (rank-selected
    quantiles)."""
    return pipeline.length_quantiles(
        _docs(spark, sf_dir), "lang", "n_chars", "doc_id"
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — connected components over the MinHash near-dup pairs:
    every near-dup doc labeled with its component's min doc id."""
    from icecube_spark.queries.llm_queries import staged_minhash_pairs

    pairs = staged_minhash_pairs(spark, sf_dir)
    return pipeline.connected_components(pairs, "doc_a", "doc_b")


def dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — per-doc fraction of 5-grams shared with other docs."""
    return pipeline.dup_ngram_fraction(_docs(spark, sf_dir), "doc_id", "text", n=5)


def source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 — deterministic corpus mixing: src0 halved, src1 doubled,
    src2 x2.25 (fractional copy hash-selected), src3 dropped, the
    rest pass through."""
    return pipeline.source_mix(
        _docs(spark, sf_dir),
        "doc_id",
        "source",
        {"src0": 0.5, "src1": 2.0, "src2": 2.25, "src3": 0.0},
    )


def length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 — 64-char-wide doc-length histogram per source."""
    out = pipeline.length_histogram(_docs(spark, sf_dir), "source", "n_chars")
    return out.orderBy("source", "bin")


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — train docs sharing >= 2 distinct 5-grams with a hash-split
    eval doc."""
    return pipeline.decontaminate(_docs(spark, sf_dir), "doc_id", "text")


def dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13 — exact-dup cluster-size histogram over raw text."""
    return pipeline.dup_cluster_sizes(_docs(spark, sf_dir), "text").orderBy(
        "cluster_size"
    )


def sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14 — deterministic 10-per-source doc sample (smallest md5 of
    doc_id) — reproducible under any partitioning or cluster size."""
    docs = _docs(spark, sf_dir).select("doc_id", "source", "lang", "n_chars")
    return pipeline.sample_per_group(docs, "source", "doc_id", k=10).orderBy(
        "source", "doc_id"
    )


def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P15 — one-pass column profile of lineitem (n_nonnull, exact
    n_distinct, numeric min/max; timestamps as epoch micros)."""
    li = catalog.load(spark, sf_dir, "lineitem")
    return pipeline.profile_table(li).orderBy("col_name")


def corpus_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P16 — GROUPING SETS corpus report: doc counts + total chars by
    (lang), (source), and (lang, source) in one Expand pass."""
    docs = catalog.load(spark, sf_dir, "documents")
    return pipeline.corpus_matrix(docs, "lang", "source", "n_chars").orderBy(
        "is_total_a", "is_total_b", "lang", "source"
    )


def source_balance_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P17 — per-source Gini coefficient of doc lengths (corpus
    balance / inequality report)."""
    docs = catalog.load(spark, sf_dir, "documents")
    return pipeline.group_gini(docs, "source", "n_chars", "doc_id").orderBy("source")


def length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P18 — corpus-wide length-decile tag per doc via histogram
    cutpoints (no global sort)."""
    docs = catalog.load(spark, sf_dir, "documents")
    return pipeline.length_deciles(docs, "doc_id", "n_chars").orderBy("doc_id")


def user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P19 — per-user cross-source feature assembly (events ⋈ orders
    full-outer, zero-filled)."""
    ev = catalog.load(spark, sf_dir, "events")
    orders = catalog.load(spark, sf_dir, "orders")
    return pipeline.feature_join(ev, orders).orderBy("user_id")


def approx_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P20 — HLL approximate-distinct profile of lineitem key columns
    (rows-only: HLL sketches are engine-specific; the unit test
    asserts <5% relative error vs exact). This is the 100 TB
    profiling path — profile_table's exact countDistinct is the
    oracle-able small-scale twin."""
    li = catalog.load(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity"]
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        # rsd 0.02: a 3.5 KB HLL++ sketch per column — still constant
        # memory per task at 100 TB, comfortably inside the 5% bound
        F.approx_count_distinct(c, rsd=0.02).alias(f"approx_{c}") for c in cols
    ]
    return li.agg(*aggs)


def skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P21 — join-key skew diagnosis for events.user_id (top-10 heavy
    keys + global skew stats)."""
    ev = catalog.load(spark, sf_dir, "events")
    return pipeline.skew_report(ev, "user_id", k=10).orderBy("rank")


def temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P22 — temperature-scaled source mixing (t=0.5): per-source
    sampling share ∝ sqrt(n_docs), the standard multi-corpus rebalance
    (upweight small sources, damp the head) used when mixing training
    corpora. sqrt is correctly-rounded IEEE so both engines compute
    identical weights; the share denominator sums floor(sqrt·1e9)
    BIGINTs — association-order-free — and the final division is one
    double op.

    Plan: one partial-agg shuffle to |sources| rows, then a broadcast
    of the tiny totals row back over the aggregate. Corpus never
    shuffles twice at any scale."""
    counts = (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "qw", F.floor(F.sqrt(F.col("n_docs")) * F.lit(1e9)).cast("bigint")
        )
    )
    total = counts.agg(F.sum("qw").alias("qtotal"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            (F.col("qw").cast("double") / 1e9).alias("weight"),
            (F.col("qw").cast("double") / F.col("qtotal").cast("double")).alias(
                "share"
            ),
            F.floor(
                F.col("qw").cast("double") / F.col("qtotal").cast("double") * 10000
            )
            .cast("bigint")
            .alias("target_n_at_10k"),
        )
        .orderBy("source")
    )


def cross_source_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P23 — near-dup leakage matrix across sources: MinHash-verified
    pairs (D2 machinery, threshold 0.8) grouped by unordered source
    pair — the train/eval contamination report run before any split
    ships. Same-source cells measure intra-corpus redundancy.

    Plan: D2's bounded bucket join produces the (tiny) pair set; two
    broadcast joins attach sources; the final aggregate is on a
    handful of cells. Mean Jaccard folds as floor(j·1e12) BIGINTs so
    the matrix is bit-identical to the oracle."""
    from icecube_spark.queries.llm_queries import staged_minhash_pairs

    docs = _docs(spark, sf_dir)
    pairs = staged_minhash_pairs(spark, sf_dir)
    src = docs.select("doc_id", "source")
    sa = src.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
        "source", "source_a"
    )
    sb = src.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
        "source", "source_b"
    )
    labeled = (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            F.least("source_a", "source_b").alias("src_lo"),
            F.greatest("source_a", "source_b").alias("src_hi"),
            F.floor(F.col("jaccard") * F.lit(1e12)).cast("bigint").alias("qj"),
        )
    )
    return (
        labeled.groupBy("src_lo", "src_hi")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (F.sum("qj").cast("double") / 1e12 / F.count(F.lit(1))).alias(
                "mean_jaccard"
            ),
        )
        .orderBy("src_lo", "src_hi")
    )


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P24 — fixed-size token-bin packing manifest per source."""
    out = pipeline.sequence_packing(_docs(spark, sf_dir), "doc_id", "text", "source")
    return out.orderBy("source", "bin")


def quality_gate_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P25 — sequential quality-gate survival funnel."""
    return pipeline.quality_gate_funnel(_docs(spark, sf_dir), "text", "n_chars")


def dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P26 — golden-record merge of exact-dup clusters. The synthetic
    corpus has no exact dups at small SF, so (as pii_redact does for
    PII) the query plants a deterministic mirror of every 50th doc —
    re-sourced and id-shifted — and the operator must merge exactly
    those clusters; the oracle plants the same rows."""
    docs = _docs(spark, sf_dir)
    mirrored = docs.where(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        "text",
        "lang",
        F.lit("mirror").alias("source"),
        "n_chars",
    )
    out = pipeline.dedup_survivorship(
        docs.unionByName(mirrored), "doc_id", "text"
    )
    # Serialize the merged-source list to a comma-joined string: the
    # driver's canonicalizer hashes scalar cells and cannot grade ARRAY
    # columns (the oracle twin applies the identical array_to_string).
    return out.select(
        "content_hash",
        "canonical_id",
        "n_members",
        "best_n_chars",
        F.array_join("sources", ",").alias("sources"),
    ).orderBy("content_hash")


def class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P27 — inverse-frequency class weights over embedding labels."""
    from icecube_spark.operators import similarity

    emb = catalog.load(spark, sf_dir, "embeddings")
    return similarity.class_weights(emb, "label").orderBy("label")


def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P28 — deterministic 16-way shard assignment manifest."""
    out = pipeline.shard_manifest(_docs(spark, sf_dir), "doc_id", "n_chars")
    return out.orderBy("shard")


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P29 — temperature sampling applied: deterministic hash-threshold
    downsampling toward the t=0.5 source mix, with kept/target report."""
    return pipeline.weighted_sample(_docs(spark, sf_dir), "doc_id", "source").orderBy(
        "source"
    )


def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P31 — one-row corpus datasheet: the summary block of a dataset
    card (sizes, diversity, duplication, length profile). Exact
    integers, rank-selected median, INT/INT divisions — oracle-exact
    by construction.

    Scale note: the exact median rank comes from distributed_rank
    (range repartition + prefix-summed offsets — no single-partition
    sort); the rest of the card is partial-agg only."""
    docs = _docs(spark, sf_dir)

    ranked = pipeline.distributed_rank(
        docs.select(
            "doc_id",
            "source",
            "lang",
            "n_chars",
            F.md5(F.expr(pipeline.normalized_expr("text"))).alias("h"),
        ),
        ["n_chars", "doc_id"],
        rank_col="rn",
        n_col="n_total",
    )
    dup = ranked.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    dup_total = dup.agg(
        F.sum(F.col("c") - 1).alias("n_dup_docs"),
    )
    card = ranked.crossJoin(F.broadcast(dup_total)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
        (
            F.sum("n_chars").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("mean_chars"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.5) * F.col("n_total")),
                F.col("n_chars"),
            )
        ).alias("p50_chars"),
        F.max("n_dup_docs").alias("n_dup_docs"),
    )
    return card.select(
        "n_docs",
        "n_sources",
        "n_langs",
        "total_chars",
        "mean_chars",
        "p50_chars",
        "n_dup_docs",
        (
            F.col("n_dup_docs").cast("double") / F.col("n_docs").cast("double")
        ).alias("dup_rate"),
    )


def curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P30 — difficulty-stratified round-robin sharding by doc length."""
    return pipeline.curriculum_shards(
        _docs(spark, sf_dir), "doc_id", "n_chars", n_shards=8
    ).orderBy("doc_id")


def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P32 — cross-source near-dup contamination matrix: MinHash
    near-dup pair counts per (source, source) cell, normalized by the
    number of possible cross pairs — locates WHICH feeds duplicate
    each other (the actionable step after dedup finds pairs).

    Plan: the pair table is tiny (near-dups only); both source
    lookups broadcast; the rate is an exact INT/INT division.
    """
    from pyspark.sql import functions as F

    from icecube_spark.queries.llm_queries import staged_minhash_pairs

    docs = _docs(spark, sf_dir)
    pairs = staged_minhash_pairs(spark, sf_dir)
    src = docs.select("doc_id", "source")
    labeled = (
        pairs.join(
            F.broadcast(src.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("source", "src_a")),
            "doc_a",
        )
        .join(
            F.broadcast(src.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("source", "src_b")),
            "doc_b",
        )
        .select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
    )
    cell = labeled.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_dup_pairs")
    )
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    ca = counts.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    out = (
        cell.join(F.broadcast(ca), "source_a")
        .join(F.broadcast(cb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_dup_pairs",
            # integer DIV keeps the count exact (double division would
            # round above 2^53 pair counts)
            F.when(
                F.col("source_a") == F.col("source_b"),
                F.expr("n_a * (n_a - 1) DIV 2"),
            )
            .otherwise(F.col("n_a") * F.col("n_b"))
            .cast("bigint")
            .alias("possible_pairs"),
        )
        .withColumn(
            "dup_rate",
            F.col("n_dup_pairs").cast("double")
            / F.col("possible_pairs").cast("double"),
        )
    )
    return out.orderBy("source_a", "source_b")


def part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P33 — weighted PageRank over the part co-purchase graph
    (undirected: both edge directions from the staged co-purchase
    pair table, analytics.staged_copurchase — one bounded self-join
    shared by B26/B29/B36/P33). Quantized integer fixpoint; the
    DuckDB oracle replays all iterations as CTEs.
    """
    from pyspark.sql import functions as F

    from icecube_spark.queries.analytics import staged_copurchase

    pairs = staged_copurchase(spark, sf_dir).pairs
    pairs = pairs.withColumnRenamed("n_orders", "w")
    edges = pairs.select("pa", "pb", "w").union(
        pairs.select(F.col("pb").alias("pa"), F.col("pa").alias("pb"), "w")
    )
    return pipeline.pagerank(
        edges, "pa", "pb", weight_col="w", iterations=5
    ).limit(100)


def feature_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P34 — equal-width vs equal-depth decile binning of
    l_extendedprice (discretization with skew exposure)."""
    li = catalog.load(spark, sf_dir, "lineitem")
    return pipeline.feature_binning(li, "l_extendedprice", n_bins=10)


def quota_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P36 — flatten the language mix to equal quotas by
    deterministic hash-thinning; per-lang before/after report."""
    docs = catalog.load(spark, sf_dir, "documents")
    return pipeline.quota_rebalance(docs, "doc_id", "lang")


def mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P37 — day-over-day corpus-mix drift: L1 distance between
    consecutive days' event-type share vectors (micro-share
    quantized). The monitoring stat that catches a feed silently
    changing composition — source_mix tells you today's mix, this
    tells you it MOVED.

    Plan: one (day, type) count shuffle; the dense day×type grid,
    shares, lags and the per-day L1 fold all run over that tiny
    aggregate (days × 5 rows)."""
    ev = catalog.load(spark, sf_dir, "events")
    counts = (
        ev.select(
            F.datediff(
                F.to_date(F.col("ts").cast("timestamp")),
                F.lit("1970-01-01").cast("date"),
            ).alias("day_num"),
            "event_type",
        )
        .groupBy("day_num", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    days = counts.select("day_num").distinct()
    types = counts.select("event_type").distinct()
    grid = days.crossJoin(F.broadcast(types)).join(
        counts, ["day_num", "event_type"], "left"
    ).na.fill({"n": 0})
    wd = Window.partitionBy("day_num")
    wt = Window.partitionBy("event_type").orderBy("day_num")
    shares = grid.withColumn(
        "share_micro",
        F.floor(
            F.col("n").cast("bigint") * F.lit(1_000_000)
            / F.sum("n").over(wd)
        ).cast("bigint"),
    ).withColumn("prev_share", F.lag("share_micro").over(wt))
    return (
        shares.where(F.col("prev_share").isNotNull())
        .groupBy("day_num")
        .agg(
            F.sum(F.abs(F.col("share_micro") - F.col("prev_share")))
            .cast("bigint")
            .alias("l1_micro"),
        )
        .select(
            "day_num",
            (F.col("l1_micro").cast("double") / F.lit(1e6)).alias("l1_drift"),
        )
        .orderBy("day_num")
    )


def shard_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P38 — order-free per-shard content checksums (XOR of 60-bit
    md5 content hashes) + row/byte counts."""
    docs = catalog.load(spark, sf_dir, "documents")
    return pipeline.shard_checksums(docs, "doc_id", "text")


def curation_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P39 — the curation funnel as ONE query: documents surviving
    each stage — raw → length gates → blocklist → exact-dedup
    canonicals → near-dup greedy keepers (drop any doc that is the
    larger id of a verified MinHash pair) — with each stage's share
    of raw. The composition sanity-check a pipeline owner reads
    before shipping a corpus build; quality_gate_funnel covers rule
    breakdowns, this covers stage attrition end to end.

    Plan: ONE pass computes per-doc survival flags (length gate +
    blocklist marker + canonical digest), so stages 1–3 fold in a
    single aggregate and the canonical stage is a digest-grain
    min(doc_id) aggregate (identical to the old per-digest
    row_number=1 pick — doc_id is unique) instead of a window; the
    pre-r9 shape aggregated each stage from its own lineage and
    scanned documents 13×. The LSH stage reuses the staged pair
    table; the output explodes a single fused row into the 5-stage
    report (guide §2.4: remove repeated passes outright).
    """
    from icecube_spark.operators import text as text_ops
    from icecube_spark.queries.llm_queries import staged_minhash_pairs

    docs = catalog.load(spark, sf_dir, "documents")
    norm = pipeline.normalized_expr("text")

    gate = (F.col("n_chars") >= 100) & (
        F.size(F.split(F.expr(norm), " ")) >= 20
    )
    flagged = text_ops.blocklist_filter(docs, "doc_id", "text").where(
        F.col("verdict") == "flag"
    ).select("doc_id", F.lit(1).alias("__flag"))
    marked = (
        docs.select(
            "doc_id", gate.alias("g"), F.md5(F.expr(norm)).alias("digest")
        )
        .join(flagged, "doc_id", "left")
        .select(
            "doc_id", "g", "digest",
            (F.col("g") & F.col("__flag").isNull()).alias("ok"),
        )
    )
    head = marked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_raw"),
        F.sum(F.col("g").cast("int")).cast("bigint").alias("n_gated"),
        F.sum(F.col("ok").cast("int")).cast("bigint").alias("n_blocked_ok"),
    )
    canon_tbl = (
        marked.where(F.col("ok"))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    losers = staged_minhash_pairs(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    n_canon = canon_tbl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_canon")
    )
    n_final = canon_tbl.join(losers, "doc_id", "left_anti").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_final")
    )
    fused = head.crossJoin(F.broadcast(n_canon)).crossJoin(
        F.broadcast(n_final)
    )
    stages = F.array(
        F.struct(
            F.lit(1).alias("stage_no"), F.lit("raw").alias("stage"),
            F.col("n_raw").alias("n_docs"),
        ),
        F.struct(
            F.lit(2).alias("stage_no"), F.lit("length_gates").alias("stage"),
            F.col("n_gated").alias("n_docs"),
        ),
        F.struct(
            F.lit(3).alias("stage_no"), F.lit("blocklist").alias("stage"),
            F.col("n_blocked_ok").alias("n_docs"),
        ),
        F.struct(
            F.lit(4).alias("stage_no"),
            F.lit("exact_canonical").alias("stage"),
            F.col("n_canon").alias("n_docs"),
        ),
        F.struct(
            F.lit(5).alias("stage_no"),
            F.lit("near_dup_keepers").alias("stage"),
            F.col("n_final").alias("n_docs"),
        ),
    )
    return (
        fused.select(F.explode(stages).alias("s"), "n_raw")
        .select(
            F.col("s.stage_no").cast("int").alias("stage_no"),
            F.col("s.stage").alias("stage"),
            F.col("s.n_docs").alias("n_docs"),
            (
                F.col("s.n_docs").cast("double")
                / F.col("n_raw").cast("double")
            ).alias("share_of_raw"),
        )
        .orderBy("stage_no")
    )


def truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P40 — token loss vs candidate context lengths."""
    return pipeline.truncation_loss(_docs(spark, sf_dir), "doc_id", "text")


def shard_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P41 — shard balance audit over the P28 hash assignment."""
    return pipeline.shard_skew_report(
        _docs(spark, sf_dir), "doc_id", "n_chars"
    )


def epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P43 — per-source epoch/repeat plan for the target mix weights."""
    return pipeline.epoch_plan(_docs(spark, sf_dir), "source", "text")


def quality_length_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P45 — Pearson(length, quality score) per source (metric audit)."""
    return pipeline.quality_length_corr(
        _docs(spark, sf_dir), "source", "doc_id", "text"
    )


def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P46 — near-dup pairs that cross the P1 train/val/test split:
    every such pair leaks training text into evaluation. Reuses the
    staged-collapse LSH pairs and the append-stable hash split, so
    the check is deterministic and incremental-build-safe."""
    from pyspark.sql import functions as F

    from icecube_spark.queries.llm_queries import staged_minhash_pairs

    docs = _docs(spark, sf_dir)
    pairs = staged_minhash_pairs(spark, sf_dir)
    b = pipeline._bucket("doc_id")
    split = docs.select(
        "doc_id",
        F.when(b < 90, "train").when(b < 95, "val").otherwise("test")
        .alias("split"),
    )
    sa = split.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
        "split", "split_a"
    )
    sb = split.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
        "split", "split_b"
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P47 — pairwise Mann–Whitney U on document length between
    sources: the nonparametric same-distribution gate."""
    docs = catalog.load(spark, sf_dir, "documents")
    return pipeline.mann_whitney_pairs(docs, "source", "n_chars")


def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P48 — DSIR hashed-ngram importance weights toward the 'en'
    slice (Xie et al. 2023)."""
    from icecube_spark.operators import text as text_ops

    docs = catalog.load(spark, sf_dir, "documents")
    return text_ops.dsir_weights(docs, "doc_id", "text", "lang", "en", 256)


def zorder_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P49 — Z-order layout planner with zone-map pruning dry run on
    (l_partkey, l_suppkey)."""
    li = catalog.load(spark, sf_dir, "lineitem")
    return pipeline.zorder_plan(li, "l_partkey", "l_suppkey")


def bloom_filter_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P50 — Bloom-filter sizing dry run (base/delta hash split,
    measured FPR vs exact digests)."""
    docs = catalog.load(spark, sf_dir, "documents")
    return pipeline.bloom_filter_eval(docs, "doc_id", "text")


def quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P51 — quantile-normalize doc length across sources onto the
    pooled distribution."""
    docs = catalog.load(spark, sf_dir, "documents")
    return pipeline.quantile_normalize(docs, "doc_id", "source", "n_chars")


def table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P52 — data-diff of two order snapshots: v2 deterministically
    drops ~1% of rows and reprices ~7% (hash-derived), so the diff
    report is exactly reproducible."""
    from icecube_spark.functions.hashing import spark_hex2int

    orders = catalog.load(spark, sf_dir, "orders")
    h = F.expr(spark_hex2int("cast(o_orderkey as string)"))
    v2 = (
        orders.where(h % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                h % 13 == 0, F.col("o_totalprice") + F.lit(1.0)
            ).otherwise(F.col("o_totalprice")),
        )
    )
    return pipeline.table_diff(
        orders, v2, "o_orderkey",
        ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
    )


def stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P53 — stratified 5-fold assignment audit (fold sizes + chi^2
    language balance)."""
    docs = catalog.load(spark, sf_dir, "documents")
    return pipeline.stratified_kfold(docs, "doc_id", "lang", k=5)


def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P54 — k-anonymity audit on the (lang, source, n_chars)
    quasi-identifier tuple."""
    docs = catalog.load(spark, sf_dir, "documents")
    return pipeline.k_anonymity(docs, ["lang", "source", "n_chars"])


def packing_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P56 — packing-efficiency curve across candidate context
    lengths (256/512/1024/2048)."""
    docs = catalog.load(spark, sf_dir, "documents")
    return pipeline.packing_curve(docs, "doc_id", "text", "source")


def erasure_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P55 — right-to-erasure dry run: affected rows per table for a
    deterministic 2% request list."""
    from icecube_spark.functions.hashing import spark_hex2int

    ev = catalog.load(spark, sf_dir, "events")
    orders = catalog.load(spark, sf_dir, "orders")
    uids = (
        ev.select(F.col("user_id").alias("uid"))
        .distinct()
        .where(F.expr(f"{spark_hex2int('cast(uid as string)')} % 50 = 0"))
    )
    return pipeline.erasure_impact(ev, orders, uids)


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P57 — Count-Min sketch heavy hitters with ground-truth error:
    build a 4×1024 CMS over corpus terms (md5-derived row hashes, so
    both engines agree bit-for-bit), then read the top-20 exact terms
    back through the sketch and report estimate vs truth. The sketch
    never under-counts; the overestimate column is the collision
    noise a production frequency service (which keeps ONLY the 4 KB
    sketch, not the term table) actually serves. This is the eval
    harness a corpus team runs to size (depth, width) before
    replacing exact counts with the sketch at 100 TB.

    Plan: one term-count shuffle (map-side combined), a 4-way
    bounded fanout into (row, bucket) cells — 4096 groups at ANY
    corpus size — and a broadcast of the 20-term panel against the
    tiny cell table. All integer arithmetic; hashes via the
    cross-engine md5 60-bit parse.
    """
    from icecube_spark.functions.hashing import spark_hex2int

    docs = _docs(spark, sf_dir)
    norm = dedup.NORM.format(col="text")
    terms = docs.select(
        F.explode(F.expr(f"split({norm}, ' ')")).alias("term")
    ).where(F.col("term") != "")
    tf = terms.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rows = F.explode(F.array(*[F.lit(j) for j in range(4)])).alias("j")
    bucket = F.expr(
        spark_hex2int("concat('cms', cast(j as string), '|', term)")
    ) % F.lit(1024)
    hashed = tf.select("term", "n", rows).withColumn("bucket", bucket)
    cells = hashed.groupBy("j", "bucket").agg(F.sum("n").alias("cell"))
    w = Window.partitionBy().orderBy(F.desc("n"), F.asc("term"))
    topk = (
        tf.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 20)
    )
    probes = topk.select("term", "n", "rank", rows).withColumn("bucket", bucket)
    est = (
        probes.join(cells, ["j", "bucket"])
        .groupBy("term", "n", "rank")
        .agg(F.min("cell").cast("bigint").alias("estimate"))
    )
    return est.select(
        "rank",
        "term",
        F.col("n").alias("exact"),
        "estimate",
        (F.col("estimate") - F.col("n")).alias("overestimate"),
    ).orderBy("rank")


def quality_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P58 — quality-score decile vs Gopher-gate keep-rate
    reliability diagram (score calibration audit)."""
    docs = catalog.load(spark, sf_dir, "documents")
    return pipeline.quality_reliability(docs, "doc_id", "text")


def dedup_cost_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P60 — candidate-pair cost of three dedup blocking schemes
    (exact hash / 32-char prefix / length bucket)."""
    docs = catalog.load(spark, sf_dir, "documents")
    return pipeline.dedup_cost_model(docs, "doc_id", "text")


def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P61 — greedy quality-per-token document selection under a
    600-token budget per source (knapsack-style curation funnel)."""
    return pipeline.token_budget_sample(
        _docs(spark, sf_dir), "source", "doc_id", "text", budget_tokens=600
    ).orderBy("source")


def length_filter_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P62 — doc/char retention curve across min-length gates
    (100..600 chars): pick the length filter with eyes open."""
    return pipeline.length_filter_tuning(
        _docs(spark, sf_dir), "n_chars", thresholds=(100, 200, 300, 400, 600)
    )


def cross_shard_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P63 — same-shard vs cross-shard duplicate pair shares under
    two sharding schemes (doc_id mod 8, by-source): is shard-local
    dedup enough, or is the global join load-bearing?"""
    d = _docs(spark, sf_dir)
    return pipeline.cross_shard_dup_rate(
        d,
        "text",
        {
            "doc_id_mod8": (F.col("doc_id") % 8).cast("string"),
            "source": F.col("source"),
        },
    )


def sample_size_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P64 — per-source audit sample sizing (±3% at 95%) for the
    n_chars >= 300 quality gate, with finite-population correction."""
    return pipeline.sample_size_planner(
        _docs(spark, sf_dir), "source", F.col("n_chars") >= 300
    )


def split_stratification_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P65 — per-(split, source) balance audit of the P1 hash split:
    observed vs expected, standardized residuals, per-split chi2."""
    return pipeline.split_stratification_check(
        _docs(spark, sf_dir), "doc_id", "source"
    )


def retention_policy_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P66 — keep-one policy comparison over prefix-dup clusters:
    first vs longest vs densest — what survives each rule?"""
    return pipeline.retention_policy_matrix(
        _docs(spark, sf_dir), "doc_id", "text", "n_chars"
    )


def oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P67 — who pays for a vocabulary cut? Per-source UNK-token
    rate at global top-k vocab budgets 100/500/1000."""
    from icecube_spark.operators import text as text_ops

    return text_ops.oov_rate_by_source(
        _docs(spark, sf_dir), "source", "text", ks=(100, 500, 1000)
    )


def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P68 — split a fixed 1000-doc audit budget across sources by
    Neyman allocation on n_chars variance, vs the proportional
    split."""
    return pipeline.neyman_allocation(
        _docs(spark, sf_dir), "source", "n_chars", budget=1000
    )


def gate_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P69 — inter-gate agreement: Cohen's kappa between the length
    gate (n_chars >= 300) and the token-count gate (>= 60 whitespace
    tokens) — are two curation rules measuring the same thing, or
    does each kill documents the other would keep? The chance-
    corrected version of the raw overlap P25's funnel shows."""
    return pipeline.gate_kappa(
        _docs(spark, sf_dir),
        F.col("n_chars") >= 300,
        F.size(F.split(F.trim("text"), r"\s+")) >= 60,
    )


def curation_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P70 — gate-uniqueness ablation: for each curation gate (min
    length, min tokens, stopword evidence), how many docs it kills
    and how many ONLY it kills — a gate with near-zero unique kills
    is dead weight the pipeline can drop. The complement of P25's
    funnel (which orders gates; this asks whether each earns its
    place)."""
    from icecube_spark.operators import pipeline as pipeline_ops

    return pipeline_ops.curation_ablation(_docs(spark, sf_dir))


def chunking_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P71 — RAG-side chunking plan: split every doc into 512-token
    windows with 64-token overlap and report, per source, chunk
    volume, overlap overhead, and last-chunk padding waste. P24
    packs docs for pretraining; this is the retrieval-side twin that
    sizes the vector store BEFORE anyone embeds 100 TB."""
    from icecube_spark.operators import pipeline as pipeline_ops

    return pipeline_ops.chunking_plan(
        _docs(spark, sf_dir), "source", "text", window=512, overlap=64
    )


def dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P72 — what does exact dedup actually buy, in TOKENS? Per
    source: total tokens, tokens sitting on non-canonical exact
    duplicates (D1 semantics: min doc id keeps the group), and the
    savings share. P32 counts dup DOCS; budget math runs on tokens,
    and long duplicated docs dominate short ones."""
    docs = _docs(spark, sf_dir)
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    base = docs.select(
        "doc_id",
        "source",
        F.md5(norm).alias("h"),
        F.size(F.split(norm, " ")).cast("bigint").alias("n_tok"),
    )
    canon = base.groupBy("h").agg(F.min("doc_id").alias("canonical_id"))
    marked = base.join(canon, "h").select(
        "source",
        "n_tok",
        (F.col("doc_id") != F.col("canonical_id")).alias("removable"),
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("removable"), F.col("n_tok")).otherwise(0))
            .cast("bigint")
            .alias("removable_tokens"),
            (
                F.sum(
                    F.when(F.col("removable"), F.col("n_tok")).otherwise(0)
                ).cast("double")
                / F.sum("n_tok").cast("double")
            ).alias("savings_share"),
        )
        .orderBy("source")
    )


def split_length_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P73 — length-distribution parity across the P1 hash split:
    per fixed length band, each split's within-split share and the
    max train/val/test share gap. P65 audits SOURCE balance; length
    balance is the other axis an eval set silently skews on."""
    from icecube_spark.operators import pipeline as pipeline_ops

    docs = pipeline_ops.train_test_split(_docs(spark, sf_dir), "doc_id")
    band = (
        F.when(F.col("n_chars") < 100, F.lit("a_lt100"))
        .when(F.col("n_chars") < 200, F.lit("b_100_199"))
        .when(F.col("n_chars") < 300, F.lit("c_200_299"))
        .when(F.col("n_chars") < 400, F.lit("d_300_399"))
        .otherwise(F.lit("e_ge400"))
    )
    counts = docs.groupBy(band.alias("band"), "split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    ws = Window.partitionBy("split")
    shares = counts.select(
        "band",
        "split",
        (
            F.col("n").cast("double") / F.sum("n").over(ws).cast("double")
        ).alias("share"),
    )
    pivoted = shares.groupBy("band").agg(
        F.max(F.when(F.col("split") == "train", F.col("share"))).alias(
            "train_share"
        ),
        F.max(F.when(F.col("split") == "val", F.col("share"))).alias(
            "val_share"
        ),
        F.max(F.when(F.col("split") == "test", F.col("share"))).alias(
            "test_share"
        ),
    )
    mx = F.greatest("train_share", "val_share", "test_share")
    mn = F.least("train_share", "val_share", "test_share")
    return pivoted.select(
        "band",
        "train_share",
        "val_share",
        "test_share",
        (mx - mn).alias("max_share_gap"),
    ).orderBy("band")


def prefix_collision_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P74 — prefix-dedup tuning curve: at prefix lengths 8/16/32/64
    chars, how many documents collide with at least one other doc on
    their prefix, in how many collision groups, and the collision
    rate. Reads as "what would a prefix-hash dedup at k catch" — the
    document twin of G5's media prefix dedup, computed for all four
    k in one pass via a tiny broadcast fan-out.

    Plan: docs x 4 literal rows -> (k, prefix) count aggregate ->
    4-row rollup. Only (k, prefix-hash) pairs shuffle; Zipf-headed
    boilerplate prefixes concentrate but stay one group each.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    ks = spark.createDataFrame([(8,), (16,), (32,), (64,)], "k int")
    pref = docs.crossJoin(F.broadcast(ks)).select(
        "k", F.expr("substring(text, 1, k)").alias("prefix")
    )
    groups = pref.groupBy("k", "prefix").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        groups.groupBy("k")
        .agg(
            F.sum(F.when(F.col("n_docs") > 1, F.col("n_docs")).otherwise(F.lit(0)))
            .cast("bigint").alias("n_docs_colliding"),
            F.sum(F.when(F.col("n_docs") > 1, F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint").alias("n_collision_groups"),
            (
                F.sum(
                    F.when(F.col("n_docs") > 1, F.col("n_docs")).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("n_docs").cast("double")
            ).alias("collision_rate"),
        )
        .orderBy("k")
    )


def length_band_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P75 — exact-dup rate per document-length band (<500 / <2000 /
    <8000 / >=8000 chars): doc counts, duplicated-doc counts, and the
    band dup rate. Templates and boilerplate concentrate in specific
    length bands; this tells the campaign WHERE the dup mass lives
    (D21 answers the pair-level length-bias question; this is the
    corpus-level rate view).

    Plan: one digest aggregate keyed on (band, md5) — hashes only —
    then a 4-row rollup.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    band = (
        F.when(F.col("n_chars") < 500, F.lit(0))
        .when(F.col("n_chars") < 2000, F.lit(1))
        .when(F.col("n_chars") < 8000, F.lit(2))
        .otherwise(F.lit(3))
    )
    groups = docs.select(band.alias("band"), F.md5("text").alias("h")).groupBy(
        "band", "h"
    ).agg(F.count(F.lit(1)).alias("c"))
    return (
        groups.groupBy("band")
        .agg(
            F.sum("c").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
            .cast("bigint").alias("dup_docs"),
            (
                F.sum(
                    F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("c").cast("double")
            ).alias("dup_rate"),
        )
        .orderBy("band")
    )


def id_continuity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P76 — identifier continuity audit over the corpus id space:
    per 1000-id block, expected vs present ids, gap count, and
    duplicate-id count. Silent upstream drops and double-writes show
    up as sparse or over-full blocks — the cheap ingest invariant a
    pipeline asserts before anything downstream trusts doc_id joins.

    Plan: one (block) aggregate over ids only; map-side combined;
    block count bounded by id-space/1000.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    per = docs.select(
        (F.col("doc_id") / 1000).cast("bigint").alias("block"),
        "doc_id",
    ).groupBy("block").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("doc_id").cast("bigint").alias("n_ids"),
        F.min("doc_id").cast("bigint").alias("id_lo"),
        F.max("doc_id").cast("bigint").alias("id_hi"),
    )
    return per.select(
        "block", "n_rows", "n_ids",
        (F.col("id_hi") - F.col("id_lo") + 1 - F.col("n_ids"))
        .cast("bigint").alias("n_gaps"),
        (F.col("n_rows") - F.col("n_ids")).cast("bigint").alias("n_dup_ids"),
    ).orderBy("block")


def split_hash_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P77 — split-hash fairness audit: occupancy of the 100 md5
    split buckets (the P1 assignment) with the chi-square statistic
    against uniformity, min/max bucket sizes, and the max/min ratio.
    A skewed hash (or a doctored id space) silently biases every
    split-based experiment — this is the one-row invariant a split
    pipeline asserts.

    Exactness: chi2 = sum((100*obs - n)^2) / (100*n) — the numerator
    folds exact BIGINTs (obs <= n <= 1e9 at any SF keeps the square
    below 2^63 after the 100x scale only if n < ~3e7; the numerator
    therefore folds (100*obs - n) as DOUBLE squares of exact ints —
    each square is one IEEE multiply of a < 2^53 value, identical in
    both engines, summed in DECIMAL for order freedom).

    Plan: one (bucket) aggregate over ids, one 1-row rollup.
    """
    from icecube_spark.functions.hashing import spark_hex2int

    docs = catalog.load(spark, sf_dir, "documents")
    bucket = F.expr(
        f"{spark_hex2int('cast(doc_id as string)')} % 100"
    )
    per = docs.select(bucket.alias("b")).groupBy("b").agg(
        F.count(F.lit(1)).alias("obs")
    )
    wall = Window.partitionBy()
    dev = per.select(
        "obs",
        F.sum("obs").over(wall).alias("n"),
        F.count(F.lit(1)).over(wall).alias("n_buckets"),
    ).select(
        "obs", "n", "n_buckets",
        (
            (F.lit(100) * F.col("obs") - F.col("n")).cast("double")
            * (F.lit(100) * F.col("obs") - F.col("n")).cast("double")
        ).cast("decimal(38,4)").alias("sq"),
    )
    return dev.groupBy().agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.max("n_buckets").cast("bigint").alias("n_buckets"),
        F.min("obs").cast("bigint").alias("min_bucket"),
        F.max("obs").cast("bigint").alias("max_bucket"),
        (
            F.sum("sq").cast("double")
            / (F.lit(100.0) * F.max("n").cast("double"))
        ).alias("chi2"),
        (
            F.max("obs").cast("double") / F.min("obs").cast("double")
        ).alias("max_min_ratio"),
    )


def sample_overlap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P78 — sampling-salt independence audit: two 10% hash samples
    drawn with different salts must overlap at ~1% of the corpus; a
    correlated overlap means the salts don't decorrelate the hash and
    every 'independent' sample downstream shares bias. One row:
    sample sizes, observed overlap, expected overlap, and the ratio.

    Plan: two map-side hash flags, one 1-row aggregate — ids only.
    """
    from icecube_spark.functions.hashing import spark_hex2int

    docs = catalog.load(spark, sf_dir, "documents")
    ha = spark_hex2int("concat('saltA:', cast(doc_id as string))")
    hb = spark_hex2int("concat('saltB:', cast(doc_id as string))")
    s1 = F.expr(f"({ha}) % 10") == 0
    s2 = F.expr(f"({hb}) % 10") == 0
    flagged = docs.select(
        s1.alias("in_a"), s2.alias("in_b")
    )
    agg = flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("in_a"), F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint").alias("n_sample_a"),
        F.sum(F.when(F.col("in_b"), F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint").alias("n_sample_b"),
        F.sum(
            F.when(F.col("in_a") & F.col("in_b"), F.lit(1)).otherwise(F.lit(0))
        ).cast("bigint").alias("n_overlap"),
    )
    return agg.select(
        "n_docs", "n_sample_a", "n_sample_b", "n_overlap",
        (
            F.col("n_sample_a").cast("double")
            * F.col("n_sample_b").cast("double")
            / F.col("n_docs").cast("double")
        ).alias("expected_overlap"),
        (
            F.col("n_overlap").cast("double")
            / (
                F.col("n_sample_a").cast("double")
                * F.col("n_sample_b").cast("double")
                / F.col("n_docs").cast("double")
            )
        ).alias("overlap_ratio"),
    )


def id_hash_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P79 — truncated-hash collision audit: colliding-id counts when
    doc ids key on the first 4/6/8 hex chars (16/24/32 bits) of
    md5(id), against the n(n-1)/2m birthday estimate. Pipelines love
    short hash prefixes for shard names and cache keys; the birthday
    bound bites long before intuition says so — this is the go/no-go
    read before a prefix width ships (P28 checks the SPLIT hash's
    uniformity; this checks the width's capacity).

    Plan: one md5 projection (codegen), a 3-row literal explode, one
    rollup per width — ids never shuffle at full width.
    """
    docs = _docs(spark, sf_dir).select(
        F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    pre = docs.select(
        F.explode(F.array(F.lit(4), F.lit(6), F.lit(8))).alias("w"), "h"
    ).select("w", F.expr("substring(h, 1, w)").alias("b"))
    agg = pre.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ids"),
        F.countDistinct("b").cast("bigint").alias("n_buckets"),
    )
    buckets = (
        F.when(F.col("w") == 4, F.lit(65536.0))
        .when(F.col("w") == 6, F.lit(16777216.0))
        .otherwise(F.lit(4294967296.0))
    )
    return agg.select(
        (F.col("w") * 4).cast("int").alias("bits"),
        "n_ids",
        "n_buckets",
        (F.col("n_ids") - F.col("n_buckets")).cast("bigint")
        .alias("n_colliding"),
        (
            F.col("n_ids").cast("double")
            * (F.col("n_ids") - F.lit(1)).cast("double")
            / (F.lit(2.0) * buckets)
        ).alias("expected_collisions"),
    ).orderBy("bits")


def temperature_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P80 — sampling-temperature planning curve: per-language
    mixture weights at tau in {0.25, 0.5, 0.75, 1.0} (weight
    proportional to n^tau) and each language's boost factor vs
    natural sampling — the mC4-style balancing sweep a data-mixture
    review reads before picking a temperature (P31 resamples at ONE
    tau; this shows which low-resource tails get promoted, and by how
    much, as tau cools).

    Exactness: n^tau comes from exact IEEE sqrt chains (0.25 = double
    sqrt, 0.75 = their product), floored to micro-units before the
    per-tau normalization, so every weight divides exact BIGINTs.

    Plan: one lang rollup, a broadcast 4-row tau table, windows over
    (tau) partitions of language cardinality.
    """
    docs = _docs(spark, sf_dir)
    src = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    taus = spark.createDataFrame(
        [(0.25,), (0.5,), (0.75,), (1.0,)], "tau double"
    )
    nd = F.col("n_docs").cast("double")
    r2 = F.sqrt(nd)
    r4 = F.sqrt(r2)
    f = (
        F.when(F.col("tau") == 0.25, r4)
        .when(F.col("tau") == 0.5, r2)
        .when(F.col("tau") == 0.75, r2 * r4)
        .otherwise(nd)
    )
    pre = src.crossJoin(F.broadcast(taus)).select(
        "tau", "lang", "n_docs",
        F.floor(f * F.lit(1e6)).cast("bigint").alias("q"),
    )
    wt = Window.partitionBy("tau")
    return pre.select(
        "tau", "lang", "n_docs",
        (
            F.col("q").cast("double") / F.sum("q").over(wt).cast("double")
        ).alias("weight"),
        (
            F.col("q").cast("double")
            * F.sum("n_docs").over(wt).cast("double")
            / (
                F.sum("q").over(wt).cast("double")
                * F.col("n_docs").cast("double")
            )
        ).alias("boost"),
    ).orderBy("tau", "lang")
