"""Embedding similarity search (SURVEY §2 E1-E3).

Dot products quantize each element product with floor(x * 1e12) into
BIGINT and sum integers — floor of an identical IEEE double is
identical in every engine (unlike double→decimal casts: Spark rounds
the SHORTEST string repr via BigDecimal.valueOf, DuckDB rounds the
exact value, and they disagree by 1 unit at scale 12). Integer sums
are exact and order-free, so cosine scores (and therefore rankings)
are oracle-exact to 1e-12 quantization.

Scale: the brute-force path broadcasts the (small) query set and
never shuffles the corpus; the LSH path buckets the corpus by an
8-bit deterministic hyperplane code so probes join one bucket, not
the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# quantized-integer fold of sum(a[i] * b[i]); doubles in, bit-stable out
_DOT = """
    (cast(aggregate(
        zip_with({a}, {b}, (x, y) -> cast(floor(cast(x as double) * cast(y as double) * 1e12) as bigint)),
        cast(0 as bigint),
        (acc, x) -> acc + x) as double) / 1e12)
"""


def dot_expr(a: str, b: str) -> F.Column:
    return F.expr(_DOT.format(a=a, b=b))


def norm_expr(a: str) -> F.Column:
    return F.sqrt(F.expr(_DOT.format(a=a, b=a)))


def cosine_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    query_filter,
    k: int = 5,
) -> DataFrame:
    """E1 — brute-force cosine top-k: broadcast the query set against
    the full corpus, rank per query. The corpus side never shuffles;
    ranking shuffles on query_id only (k rows per query survive)."""
    queries = vectors.where(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cands = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        cands.join(F.broadcast(queries), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            dot_expr("qv", "cv") / (norm_expr("qv") * norm_expr("cv")),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def knn_label(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    query_filter,
    k: int = 5,
) -> DataFrame:
    """E3 — k-NN majority-vote label. Ties: most votes, then smallest
    label."""
    topk = cosine_topk(vectors, id_col, vec_col, query_filter, k)
    labels = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nl")
    )
    votes = (
        topk.join(F.broadcast(labels), "neighbor_id")
        .groupBy("query_id", "nl")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("nl"))
    return (
        votes.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("query_id", F.col("nl").alias("predicted_label"), "votes")
        .orderBy("query_id")
    )


# 8-bit deterministic hyperplane code: plane p's component j has sign
# +1 iff the first hex char of md5('<p>|<j>') >= '8'. The projection
# folds as quantized integers, so the sign (thus the code) is
# oracle-exact.
_CODE = """
    aggregate(sequence(0, 7), 0, (acc, p) -> acc + IF(
        aggregate(sequence(1, size({v})), cast(0 as bigint),
            (a2, j) -> a2 + cast(floor(
                IF(substring(md5(concat(cast(p as string), '|', cast(j as string))), 1, 1) >= '8', 1.0D, -1.0D)
                * cast(element_at({v}, j) as double) * 1e12) as bigint)) >= 0,
        shiftleft(1, p), 0))
"""


def lsh_code(vec_col: str) -> F.Column:
    return F.expr(_CODE.format(v=vec_col))


def lsh_ann_best_neighbor(
    vectors: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """E2 — bucketed ANN: vectors sharing an 8-bit hyperplane code are
    candidates; each vector reports its best in-bucket neighbor by
    exact cosine. One shuffle on the code; within-bucket pairs only.
    """
    coded = vectors.select(
        F.col(id_col), F.col(vec_col), lsh_code(vec_col).alias("code")
    )
    a = coded.select(
        F.col(id_col).alias("vec_id_a"), F.col(vec_col).alias("va"), "code"
    )
    b = coded.select(
        F.col(id_col).alias("vec_id_b"), F.col(vec_col).alias("vb"), "code"
    )
    pairs = (
        a.join(b, "code")
        .where(F.col("vec_id_a") != F.col("vec_id_b"))
        .withColumn(
            "cosine", dot_expr("va", "vb") / (norm_expr("va") * norm_expr("vb"))
        )
    )
    w = Window.partitionBy("vec_id_a").orderBy(F.desc("cosine"), F.asc("vec_id_b"))
    return (
        pairs.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select(
            F.col("vec_id_a").alias("vec_id"),
            F.col("vec_id_b").alias("neighbor_id"),
            "cosine",
            "code",
        )
        .orderBy("vec_id")
    )
