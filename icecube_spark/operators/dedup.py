"""Deduplication operators for LLM training corpora (SURVEY §2 D1-D4).

Everything hashes with md5 so DuckDB oracles can reproduce signatures
bit-for-bit (functions/hashing.py). All heavy lifting is JVM-side
higher-order functions over per-document gram arrays — the only
shuffles are the candidate-pair joins, keyed on (band, signature)
buckets whose fanout is bounded by design (this is what makes
MinHash/SimHash the 100 TB path: candidates come from equal-hash
buckets, never from an all-pairs join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# normalized text: lowercase, trimmed, single-spaced
NORM = "regexp_replace(lower(trim({col})), '\\\\s+', ' ')"

# distinct word 3-grams of the normalized text (whole text if <3 words)
GRAMS = f"""
    array_distinct(
      CASE WHEN size(split({NORM}, ' ')) < 3
           THEN array({NORM})
           ELSE transform(
                  sequence(1, size(split({NORM}, ' ')) - 2),
                  i -> concat_ws(' ', slice(split({NORM}, ' '), i, 3)))
      END)
"""


def normalized(col: str):
    return F.expr(NORM.format(col=col))


def with_grams(df: DataFrame, text_col: str, out: str = "grams") -> DataFrame:
    return df.withColumn(out, F.expr(GRAMS.format(col=text_col)))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """D1 — exact dedup on md5 of normalized text.

    Output: one row per input with its content hash, the canonical
    (min) id of its duplicate group, group size, and a dup flag.
    Single shuffle on the 128-bit hash; at 100 TB this is the
    cheapest possible dedup (no text comparison ever happens).
    """
    hashed = df.select(
        F.col(id_col), F.md5(normalized(text_col)).alias("content_hash")
    )
    groups = hashed.groupBy("content_hash").agg(
        F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("group_size")
    )
    return hashed.join(groups, "content_hash").select(
        id_col,
        "content_hash",
        "canonical_id",
        "group_size",
        (F.col("group_size") > 1).alias("is_duplicate"),
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 64
) -> DataFrame:
    """Per-doc MinHash signature.

    sig[i] = min over grams of md5('<i>|' + gram) — the lexicographic
    min of fixed-width hex strings equals the numeric min, so no int
    conversion is needed and DuckDB reproduces it exactly.
    """
    df = with_grams(df.select(id_col, text_col), text_col)
    sig = f"""
        transform(sequence(0, {num_hashes - 1}),
                  i -> array_min(transform(grams, g -> md5(concat(cast(i as string), '|', g)))))
    """
    return df.withColumn("sig", F.expr(sig)).select(id_col, "grams", "sig")


def _bands_expr(num_hashes: int, band_rows: int) -> str:
    """LSH band hashes computed straight from `grams` in ONE expression.

    band[b] = md5('<b>|' + sig[4b] + '|' + ... + sig[4b+3]) — but the
    sig values are folded inline so each of the `num_hashes` minhashes
    is computed exactly once. (Materializing `sig` as a column and
    indexing it from a second projection looks cleaner, but Catalyst's
    projection collapse inlines the whole 64-element sig array into
    every element_at, exploding the md5 count ~6000x.)
    """
    n_bands = num_hashes // band_rows
    return f"""
        transform(sequence(0, {n_bands - 1}),
                  b -> md5(concat(cast(b as string), '|',
                       concat_ws('|', transform(sequence(b * {band_rows}, b * {band_rows} + {band_rows - 1}),
                           i -> array_min(transform(grams, g -> md5(concat(cast(i as string), '|', g)))))))))
    """


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 64,
    band_rows: int = 4,
) -> DataFrame:
    """D2 — MinHash+LSH near-dup pairs, verified by exact Jaccard.

    Candidates = pairs sharing any band bucket (shuffle keyed on
    (band_id, band_hash): bounded fanout, no all-pairs). Verification
    computes true Jaccard on the gram sets of candidates only.
    16 bands x 4 rows => P(candidate | J=0.8) ~ 0.9998.
    """
    grams = with_grams(df.select(id_col, text_col), text_col).select(
        id_col, "grams"
    )
    exploded = grams.select(
        id_col,
        F.posexplode(F.expr(_bands_expr(num_hashes, band_rows))).alias(
            "band_id", "band_hash"
        ),
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )
    ga = grams.withColumnRenamed(id_col, "doc_a").withColumnRenamed("grams", "ga")
    gb = grams.withColumnRenamed(id_col, "doc_b").withColumnRenamed("grams", "gb")
    return (
        cands.join(ga, "doc_a")
        .join(gb, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("ga", "gb")))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.size("ga") + F.size("gb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.5
) -> DataFrame:
    """D3 — exact all-pairs n-gram Jaccard via inverted index.

    Explode distinct grams, self-join on gram (the inverted-index
    join), count shared grams per pair, compute J = |∩|/|∪|. Exact
    but quadratic in bucket size — at 100 TB use minhash_lsh_pairs;
    this is the ground-truth verifier (and the oracle's own plan).
    """
    grams = with_grams(df.select(id_col, text_col), text_col).select(
        id_col, F.col("grams")
    )
    sizes = grams.select(F.col(id_col), F.size("grams").alias("n"))
    e = grams.select(F.col(id_col), F.explode("grams").alias("gram"))
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("n", "na")
    sb = sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("n", "nb")
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_docs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash per document over distinct tokens.

    Token hash = first 15 hex chars of md5 as int (60 bits — conv()
    and DuckDB's hex cast agree exactly at this width). Bit b of the
    signature is the sign of sum(+1/-1 for each token's bit b).
    """
    toks = f"array_distinct(split({NORM.format(col=text_col)}, ' '))"
    hs = f"transform({toks}, t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"
    sim = f"""
        aggregate(sequence(0, 59), cast(0 as bigint),
            (acc, b) -> acc + IF(
                aggregate({hs}, 0, (a2, h) -> a2 + IF((h >> b) & 1 = 1, 1, -1)) >= 0,
                shiftleft(cast(1 as bigint), b),
                cast(0 as bigint)))
    """
    return df.select(F.col(id_col), F.expr(sim).alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 10
) -> DataFrame:
    """D4 — SimHash near-dup pairs.

    Candidates: split the 60-bit signature into 4 x 15-bit chunks;
    pairs sharing any chunk (guarantees recall for hamming <= 3, and
    catches most small distances); verify with bit_count(xor) <=
    max_hamming. Shuffle keyed on (chunk_id, chunk) — bounded buckets.
    """
    sims = simhash_docs(df, id_col, text_col)
    chunks = sims.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.expr(
                "transform(sequence(0, 3), k -> (simhash >> (k * 15)) & 32767)"
            )
        ).alias("chunk_id", "chunk"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
