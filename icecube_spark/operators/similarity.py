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
from icecube_spark.functions.materialize import materialize

# quantized-integer fold of sum(a[i] * b[i]); doubles in, bit-stable out
_DOT = """
    (cast(aggregate(
        zip_with({a}, {b}, (x, y) -> cast(floor(cast(x as double) * cast(y as double) * 1e12) as bigint)),
        cast(0 as bigint),
        (acc, x) -> acc + x) as double) / 1e12)
"""

EMBED_DIM = 64  # testdata embedding width; flat codegen path assumes it


def _flat_dot(a: str, b: str, dim: int) -> str:
    terms = " + ".join(
        f"cast(floor(cast(element_at({a}, {j}) as double)"
        f" * cast(element_at({b}, {j}) as double) * 1e12) as bigint)"
        for j in range(1, dim + 1)
    )
    return f"(cast(({terms}) as double) / 1e12)"


def dot_expr(a: str, b: str, dim: int | None = EMBED_DIM) -> F.Column:
    """Quantized dot product. With a known dim the sum unrolls into a
    flat arithmetic expression that stays in whole-stage codegen; the
    HOF fold (dim=None) is interpreted and ~5x slower per pair.
    Both paths produce identical bits."""
    if dim is None:
        return F.expr(_DOT.format(a=a, b=b))
    return F.expr(_flat_dot(a, b, dim))


def norm_expr(a: str, dim: int | None = EMBED_DIM) -> F.Column:
    if dim is None:
        return F.sqrt(F.expr(_DOT.format(a=a, b=a)))
    return F.sqrt(F.expr(_flat_dot(a, a, dim)))


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
    # norms precomputed once per row — computing them inside the pair
    # projection would re-run the interpreted fold per PAIR, 3x the work
    queries = vectors.where(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_expr(vec_col).alias("qn"),
    )
    cands = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm_expr(vec_col).alias("cn"),
    )
    scored = (
        cands.join(F.broadcast(queries), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot_expr("qv", "cv") / (F.col("qn") * F.col("cn")))
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
# +1 iff the first hex char of md5('<p>|<j>') >= '8'. The signs are
# baked in as literals at plan-build time (hashlib md5 == engine md5),
# so the whole code expression is flat arithmetic in codegen; the
# projection folds as quantized integers, so the sign (thus the code)
# is oracle-exact vs the oracle's runtime-md5 formulation.


def _plane_sign(p: int, j: int) -> float:
    import hashlib

    return 1.0 if hashlib.md5(f"{p}|{j}".encode()).hexdigest()[0] >= "8" else -1.0


def lsh_code(vec_col: str, n_planes: int = 8, dim: int = EMBED_DIM) -> F.Column:
    # Per-plane projection folds via the aggregate HOF over a literal
    # sign array rather than a flat n_planes*dim-term sum: the flat form
    # (512 floor terms in ONE expression) exceeds Janino's 64 KB method
    # limit, which knocked the ENTIRE stage — including the per-pair
    # dot products — back to interpreted eval. HOFs are CodegenFallback
    # at expression granularity, so the stage still whole-stage-compiles
    # and only this once-per-ROW code pays the interpreted fold.
    planes = []
    for p in range(n_planes):
        signs = ", ".join(f"{_plane_sign(p, j)}D" for j in range(1, dim + 1))
        proj = (
            f"aggregate(zip_with({vec_col}, array({signs}),"
            " (x, s) -> cast(floor(s * cast(x as double) * 1e12) as bigint)),"
            " cast(0 as bigint), (acc, x) -> acc + x)"
        )
        planes.append(f"IF(({proj}) >= 0, {1 << p}, 0)")
    return F.expr(" + ".join(planes))


def lsh_ann_best_neighbor(
    vectors: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """E2 — bucketed ANN: vectors sharing an 8-bit hyperplane code are
    candidates; each vector reports its best in-bucket neighbor by
    exact cosine. One shuffle on the code; within-bucket pairs only.
    """
    coded = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_code(vec_col).alias("code"),
        norm_expr(vec_col).alias("nrm"),
    )
    a = coded.select(
        F.col(id_col).alias("vec_id_a"), F.col(vec_col).alias("va"),
        "code", F.col("nrm").alias("na"),
    )
    b = coded.select(
        F.col(id_col).alias("vec_id_b"), F.col(vec_col).alias("vb"),
        "code", F.col("nrm").alias("nb"),
    )
    pairs = (
        a.join(b, "code")
        .where(F.col("vec_id_a") != F.col("vec_id_b"))
        .withColumn("cosine", dot_expr("va", "vb") / (F.col("na") * F.col("nb")))
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


def label_centroids(df: DataFrame, label_col: str, vec_col: str) -> DataFrame:
    """E5 — per-label centroid components: mean of every embedding
    dimension per label, flat (label, dim, n, centroid) rows so the
    result is oracle-hashable. The per-dimension mean folds in decimal
    (functions/parity.py) for association-order-free reductions.

    Plan: posexplode then one shuffle on (label, dim) — map-side
    partials shrink the exchange to |labels|×|dims| rows per task, so
    the shuffle is O(cardinality), not O(corpus). The centroid table
    itself (10×64 here) broadcasts for downstream assignment scoring.
    """
    from icecube_spark.functions.parity import davg

    e = df.select(F.col(label_col), F.posexplode(vec_col).alias("dim", "val"))
    return e.groupBy(label_col, "dim").agg(
        F.count(F.lit(1)).alias("n"),
        davg(F.col("val").cast("double")).alias("centroid"),
    )


def scalar_quantize(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """E6 — global-range int8 scalar quantization of an embedding
    column: q_i = clamp(floor((x_i − gmin)·255 / (gmax − gmin))), the
    storage/bandwidth path for ANN at scale (4x smaller vectors, same
    bucketing recall). Engine-exact because both engines evaluate the
    identical double expression on the identical float32 inputs — no
    reductions, so no association-order hazard.

    Plan: pass 1 is a cheap map-only array_min/array_max + a scalar
    aggregate; the (gmin, gmax) row broadcasts into pass 2's map-only
    transform. Nothing shuffles the vectors themselves at any scale.
    """
    stats = df.agg(
        F.min(F.array_min(F.col(vec_col)).cast("double")).alias("gmin"),
        F.max(F.array_max(F.col(vec_col)).cast("double")).alias("gmax"),
    )
    qexpr = (
        f"transform({vec_col}, x -> least(255, greatest(0, "
        f"cast(floor((cast(x as double) - gmin) * 255.0D / (gmax - gmin)) as int))))"
    )
    return df.crossJoin(F.broadcast(stats)).select(
        F.col(id_col),
        F.expr(qexpr).alias("qvec"),
        F.col("gmin"),
        F.col("gmax"),
    )


def centroid_similarity(df: DataFrame, label_col: str, vec_col: str) -> DataFrame:
    """E7 — pairwise cosine similarity between per-label centroids:
    the cluster-separation report (confusable label pairs) run after
    any labeling/clustering pass.

    Plan: the centroid aggregate is the only corpus-sized work (one
    shuffle bounded by |labels|x|dims|); the pairwise stage self-joins
    the tiny flat centroid table on dim (broadcast) and re-aggregates
    per pair — O(|labels|^2 · dims) rows, never the corpus. Dot
    products and norms use the same floor(x·1e12) integer quantization
    as every similarity op, so cosines are oracle-exact.
    """
    cent = label_centroids(df, label_col, vec_col).select(
        F.col(label_col).alias("label"), "dim", "centroid"
    )
    qterm = lambda a, b: F.floor(
        F.col(a) * F.col(b) * F.lit(1e12)
    ).cast("bigint")
    norms = (
        cent.groupBy("label")
        .agg(F.sum(qterm("centroid", "centroid")).alias("qsq"))
        .select("label", (F.col("qsq").cast("double") / 1e12).alias("sq"))
    )
    a = cent.select(
        F.col("label").alias("label_a"), "dim", F.col("centroid").alias("ca")
    )
    b = cent.select(
        F.col("label").alias("label_b"), "dim", F.col("centroid").alias("cb")
    )
    dots = (
        a.join(F.broadcast(b), "dim")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(qterm("ca", "cb")).alias("qdot"))
        .select(
            "label_a", "label_b", (F.col("qdot").cast("double") / 1e12).alias("dot")
        )
    )
    na = norms.select(F.col("label").alias("label_a"), F.col("sq").alias("sq_a"))
    nb = norms.select(F.col("label").alias("label_b"), F.col("sq").alias("sq_b"))
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            "dot",
            (F.col("dot") / (F.sqrt("sq_a") * F.sqrt("sq_b"))).alias("cosine"),
        )
    )


def dim_stats(df: DataFrame, vec_col: str) -> DataFrame:
    """E8 — per-dimension distribution profile of an embedding
    column: n, mean, min, max, and mean-square (RMS energy). The
    feature-normalization / PCA-preprocessing statistics every
    embedding pipeline computes before whitening, quantization
    calibration, or drift monitoring.

    Plan: posexplode then ONE shuffle whose map-side partials reduce
    each task to |dims| rows — the exchange moves O(dims·tasks), never
    the corpus. Means fold in decimal (functions/parity.py); the
    squared moment is a floor(x²·1e12) BIGINT sum (products of
    doubles hit the decimal-cast tie hazard, integers never do) and
    the final division is the same double expression in both engines.
    """
    from icecube_spark.functions.parity import davg

    e = df.select(F.posexplode(vec_col).alias("dim", "val")).select(
        "dim", F.col("val").cast("double").alias("x")
    )
    return (
        e.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            davg("x").alias("mean"),
            F.min("x").alias("min_val"),
            F.max("x").alias("max_val"),
            F.sum(F.floor(F.col("x") * F.col("x") * F.lit(1e12)).cast("bigint")).alias(
                "qsq"
            ),
        )
        .select(
            "dim",
            "n",
            "mean",
            "min_val",
            "max_val",
            (F.col("qsq").cast("double") / 1e12 / F.col("n")).alias("mean_sq"),
        )
    )


def norm_outliers(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """E9 — embedding-norm outlier detection: per-vector squared L2
    norm, global mean/σ, and a 3σ flag — the cheap sanity filter that
    catches broken encoders and zero/exploded vectors before they
    poison ANN indexes or training batches.

    Plan: the per-vector norm is a map-only lambda fold (one pass over
    the array, no explode, no shuffle); the global moments are one
    scalar aggregate broadcast back — the corpus is scanned twice but
    never shuffled. All moment arithmetic is int64 on floor-quantized
    norms (norm² ≤ 64 here, ·1e9 keeps even sf-1000 sums inside
    int64), so both engines compare bit-identical doubles.
    """
    qnorm = F.aggregate(
        F.col(vec_col),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc
        + F.floor(x.cast("double") * x.cast("double") * F.lit(1e12)).cast("bigint"),
    )
    vecs = df.select(
        F.col(id_col),
        (qnorm.cast("double") / 1e12).alias("norm_sq"),
    )
    stats = vecs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("norm_sq") * F.lit(1e9)).cast("bigint")).alias("s1"),
        F.sum(
            F.floor(F.col("norm_sq") * F.col("norm_sq") * F.lit(1e9)).cast("bigint")
        ).alias("s2"),
    ).select(
        (F.col("s1").cast("double") / 1e9 / F.col("n")).alias("mean_norm_sq"),
        F.sqrt(
            F.col("s2").cast("double") / 1e9 / F.col("n")
            - (F.col("s1").cast("double") / 1e9 / F.col("n"))
            * (F.col("s1").cast("double") / 1e9 / F.col("n"))
        ).alias("std_norm_sq"),
    )
    return vecs.crossJoin(F.broadcast(stats)).select(
        id_col,
        "norm_sq",
        "mean_norm_sq",
        ((F.col("norm_sq") - F.col("mean_norm_sq")) / F.col("std_norm_sq")).alias(
            "z"
        ),
        (
            F.abs(F.col("norm_sq") - F.col("mean_norm_sq"))
            > 3 * F.col("std_norm_sq")
        ).alias("is_outlier"),
    )


def top_dims(df: DataFrame, id_col: str, vec_col: str, k: int = 3) -> DataFrame:
    """E10 — per-vector top-k dimensions by |magnitude|: the sparse
    fingerprint used for interpretability probes and sparse-index
    pruning (which dims carry this vector's mass).

    Plan: entirely map-only — the (|x|, dim) pairs are built, sorted,
    and sliced inside one codegen'd array expression; no explode, no
    shuffle, output rows = k·corpus via a bounded posexplode of the
    k-slice. Magnitude compare is exact double; ties break on the
    LOWER dim via the (|x|, -dim) struct sort so both engines pick
    identical winners.
    """
    pairs = (
        f"transform({vec_col}, (x, i) -> "
        f"struct(abs(cast(x as double)) as m, -i as nd))"
    )
    top = (
        f"slice(reverse(array_sort({pairs})), 1, {k})"
    )
    e = df.select(
        F.col(id_col),
        F.posexplode(F.expr(top)).alias("rank0", "p"),
    )
    return e.select(
        id_col,
        (F.col("rank0") + 1).cast("int").alias("rank"),
        (-F.col("p.nd")).cast("int").alias("dim"),
        F.col("p.m").alias("magnitude"),
    )


def class_weights(df: DataFrame, label_col: str) -> DataFrame:
    """P27 — inverse-frequency class weights: weight(label) =
    N / (|labels| * n_label), the standard imbalance correction fed to
    a trainer's loss. Exact INT aggregates; the weight is one INT/INT
    IEEE division, bit-identical in any engine.

    Plan: one partial-agg shuffle to |labels| rows; the scalar totals
    come from a second aggregate over those rows and broadcast back.
    """
    per = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = per.agg(
        F.sum("n").alias("n_total"), F.count(F.lit(1)).alias("n_labels")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "label",
        "n",
        "n_total",
        "n_labels",
        (
            F.col("n_total").cast("double")
            / (F.col("n_labels") * F.col("n")).cast("double")
        ).alias("weight"),
    )


def ann_recall_eval(
    vectors: DataFrame, id_col: str, vec_col: str, query_filter, k: int = 5
) -> DataFrame:
    """E11 — ANN quality evaluation: recall@k of the E2 hyperplane-LSH
    index against E1 exact search, per query. The eval loop every ANN
    deployment runs before trusting its index — here as one
    distributed plan with no driver-side comparison.

    Plan: the exact side broadcasts the query set over the corpus
    (map-only scan + one top-k shuffle on query_id); the ANN side
    joins only the query's LSH bucket (broadcast of coded queries,
    corpus coded map-only). Both top-k sets are k*|queries| rows;
    the overlap join and recall arithmetic are trivial. Recall is an
    exact INT/INT division."""
    coded = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_code(vec_col).alias("code"),
        norm_expr(vec_col).alias("nrm"),
    )
    # the query set is broadcast-sized by contract (it rides two
    # BroadcastExchanges) — materialize it once instead of re-running
    # the corpus scan + code projection per broadcast and for the
    # result spine (guide §5)
    queries = coded.where(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("code").alias("qcode"),
        F.col("nrm").alias("qn"),
    ).transform(materialize)
    cands = coded.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        "code",
        F.col("nrm").alias("cn"),
    )
    exact_scored = (
        cands.join(F.broadcast(queries), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot_expr("qv", "cv") / (F.col("qn") * F.col("cn")))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    exact_top = (
        exact_scored.withColumn("r", F.row_number().over(wq))
        .where(F.col("r") <= k)
        .select("query_id", "neighbor_id")
    )
    # k·|queries| rows, two consumers (overlap join + per-query
    # count): materialize once so the bucket join + rank window run
    # once, not per consumer (guide §5; provably bounded by the top-k)
    ann_top = (
        cands.join(
            F.broadcast(queries),
            (F.col("code") == F.col("qcode"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .withColumn("cosine", dot_expr("qv", "cv") / (F.col("qn") * F.col("cn")))
        .withColumn("r", F.row_number().over(wq))
        .where(F.col("r") <= k)
        .select("query_id", F.col("neighbor_id").alias("ann_neighbor"))
        .transform(materialize)
    )
    # ann_top is a materialized ExistingRDD: the planner defaults its
    # stats to "huge" and falls back to SortMergeJoin without explicit
    # broadcasts — but every frame here is panel-bounded (≤ k·|queries|
    # rows by the top-k cut / query contract), so broadcast is the
    # scale-correct strategy
    hits = (
        exact_top.join(
            F.broadcast(ann_top),
            (exact_top.query_id == ann_top.query_id)
            & (exact_top.neighbor_id == ann_top.ann_neighbor),
        )
        .groupBy(exact_top.query_id)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    n_ann = ann_top.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_ann"))
    base = queries.select("query_id")
    return (
        base.join(F.broadcast(n_ann), "query_id", "left")
        .join(F.broadcast(hits), "query_id", "left")
        .select(
            "query_id",
            F.lit(k).alias("k"),
            F.coalesce("n_ann", F.lit(0)).cast("bigint").alias("n_ann"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (
                F.coalesce("n_hits", F.lit(0)).cast("double") / F.lit(k).cast("double")
            ).alias("recall_at_k"),
        )
    )


def standardize_dims(
    df: DataFrame, id_col: str, vec_col: str, n_dims: int = 8
) -> DataFrame:
    """E12 — per-dimension standardization (z-scores), the
    normalization step before PCA/whitening/linear probes. Emitted for
    the first `n_dims` dimensions (bounded posexplode).

    Exactness: with q = floor(x*1e6) per element, z = (n*q - sum_q) /
    sqrt(n*sum_q2 - sum_q^2) is integer arithmetic up to one IEEE
    sqrt + one division — bit-identical across engines. Intermediates
    stay in int64 for n up to ~1e5 rows at this quantization; at
    corpus scale drop quantization to 1e3 (the formula is unchanged).

    Plan: moments are one partial-agg shuffle to n_dims rows
    (posexplode of the leading slice only); they broadcast back onto
    the map-only corpus scan."""
    sliced = df.select(
        F.col(id_col),
        F.posexplode(F.slice(F.col(vec_col), 1, n_dims)).alias("dim", "x"),
    ).withColumn(
        # DOUBLE x up front: the oracle twin emits CAST(... AS DOUBLE), and a
        # raw float32 column renders differently under the driver's
        # value-hash even though the numbers are upcast-equal.
        "x", F.col("x").cast("double")
    ).withColumn("q", F.floor(F.col("x") * 1e6))
    moments = sliced.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sq2"),
    )
    return (
        sliced.join(F.broadcast(moments), "dim")
        .select(
            F.col(id_col),
            "dim",
            "x",
            (
                (F.col("n") * F.col("q") - F.col("sq")).cast("double")
                / F.sqrt(
                    (
                        F.col("n") * F.col("sq2") - F.col("sq") * F.col("sq")
                    ).cast("double")
                )
            ).alias("z"),
        )
    )


def pca_top(
    df: DataFrame, vec_col: str, dim: int = EMBED_DIM, k: int = 2
) -> DataFrame:
    """E13 — top-k principal components of the embedding corpus via
    the distributed-Gramian design (MLlib RowMatrix style): the D×D
    covariance matrix is the ONLY thing that ever leaves the
    executors — its size depends on the embedding width, not the
    corpus, so the same plan runs unchanged at 100 TB.

    Plan: mapInPandas computes per-Arrow-batch partial sums (count,
    per-dim sum, upper-triangle outer-product sums) with numpy BLAS
    — one D(D+1)/2-wide row per batch — then a single-stage sum
    reduces partials and the driver eigendecomposes the tiny D×D
    covariance (numpy.linalg.eigh, microseconds). No collect of data
    rows, no RDD, no per-row Python.

    Output: (component, dim, weight, explained_var_ratio) flat rows,
    eigenvector sign fixed deterministically (largest-|w| entry
    positive). Rows-only key (eigendecomposition is not
    SQL-expressible; the pytest twin checks against numpy PCA of the
    collected corpus at test SF).
    """
    import numpy as np
    import pandas as pd

    n_tri = dim * (dim + 1) // 2

    def partials(batches):
        import numpy as _np

        iu0, iu1 = _np.triu_indices(dim)
        for pdf in batches:
            mat = _np.asarray(
                [_np.asarray(v, dtype=_np.float64) for v in pdf[vec_col]]
            )
            if mat.size == 0:
                continue
            g = mat.T @ mat  # D×D batch Gramian (BLAS)
            yield pd.DataFrame(
                {
                    "n": [float(mat.shape[0])],
                    "s": [mat.sum(axis=0).tolist()],
                    "g": [g[iu0, iu1].tolist()],
                }
            )

    schema = (
        "n double, s array<double>, g array<double>"
    )
    # Each Arrow batch yields ONE model-sized partial row. Reducing
    # them as 2 000+ separate F.sum columns makes Catalyst plan a
    # 2 145-wide aggregate (~30 s of planning/codegen at ANY data
    # size); instead the partial vectors explode to (idx, value) rows
    # and ONE narrow groupBy(idx) sums them — map-side combinable,
    # scales to any number of partials, returns exactly D(D+3)/2+1
    # model rows.
    flat = (
        df.select(vec_col)
        .mapInPandas(partials, schema=schema)
        .select(
            F.posexplode(
                F.concat(F.array("n"), F.col("s"), F.col("g"))
            ).alias("idx", "val")
        )
        .groupBy("idx")
        .agg(F.sum("val").alias("v"))
        .collect()
    )
    model = np.zeros(1 + dim + n_tri)
    for r in flat:
        model[r["idx"]] = r["v"]
    n = float(model[0])
    s = model[1 : 1 + dim]
    tri = model[1 + dim :]
    iu0, iu1 = np.triu_indices(dim)
    gram = np.zeros((dim, dim))
    gram[iu0, iu1] = tri
    gram = gram + np.triu(gram, 1).T
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    total_var = float(evals.sum())
    out_rows = []
    for c in range(k):
        w = evecs[:, order[c]]
        if w[np.argmax(np.abs(w))] < 0:
            w = -w
        ev = float(evals[order[c]])
        for d in range(dim):
            out_rows.append((c, d, float(w[d]), ev / total_var))
    spark = df.sparkSession
    return spark.createDataFrame(
        out_rows, "component int, dim int, weight double, explained_var_ratio double"
    )


_QDIST = """
    aggregate(
      zip_with({x}, {c}, (x, c) ->
        cast(floor((cast(x as double) - cast(c as double))
                   * (cast(x as double) - cast(c as double)) * 1e12) as bigint)),
      cast(0 as bigint), (acc, v) -> acc + v)
"""


def qdist_sql(x: str, c: str) -> str:
    """The HOF form of the quantized squared distance as raw SQL text,
    for embedding inside an outer lambda (e.g. a transform() over a
    collected centroid array, where ``c`` is a lambda-bound field the
    flat element_at unroll cannot reference). Identical bits to
    qdist_expr — BIGINT fold, order-free integer adds."""
    return _QDIST.format(x=x, c=c)


def qdist_expr(x: str, c: str, dim: int | None = EMBED_DIM) -> F.Column:
    """Quantized squared distance sum(floor((x[j]-c[j])²·1e12)) as
    BIGINT. With a known dim the fold unrolls into flat arithmetic
    that stays in whole-stage codegen (the HOF fold is interpreted
    and ~5x slower per row); both paths produce identical bits."""
    if dim is None:
        return F.expr(_QDIST.format(x=x, c=c))
    terms = " + ".join(
        f"cast(floor((cast(element_at({x}, {j}) as double)"
        f" - cast(element_at({c}, {j}) as double))"
        f" * (cast(element_at({x}, {j}) as double)"
        f" - cast(element_at({c}, {j}) as double)) * 1e12) as bigint)"
        for j in range(1, dim + 1)
    )
    return F.expr(f"({terms})")


def kmeans_refine(
    vectors: DataFrame, id_col: str, vec_col: str, k: int = 8
) -> DataFrame:
    """E14 — ONE exact Lloyd iteration as a declarative plan: seed
    centroids = the k lowest-id vectors, assign every vector to its
    nearest seed (quantized integer squared-distance, deterministic
    tiebreak), and emit the recomputed per-cluster mean as flat
    (cluster, dim, centroid_value, n_members) rows.

    This is the oracle-exact twin of the MLlib KMeans loop that backs
    the IVF index (ivf.py): it pins down, bit-for-bit against DuckDB,
    that one distributed Lloyd step (broadcast centroids → map-side
    assignment → one mean shuffle) is correct; the iterative path
    then simply repeats this plan. Assignment distances fold to
    BIGINT (floor(d²·1e12)); means reduce in DECIMAL — no
    order-dependent float anywhere.

    Plan: seeds broadcast (k rows); assignment is map-only over the
    corpus (k folds per vector); one groupBy(vec) min-struct, one
    explode + (cluster, dim) partial-agg shuffle. Per-pass cost is
    O(corpus·k) map work + one shuffle of corpus·dim quantized rows
    — the canonical 100 TB k-means step.
    """
    seeds = vectors.where(F.col(id_col) < k).select(
        F.col(id_col).cast("int").alias("cluster"),
        F.col(vec_col).alias("centroid"),
    )
    qd = qdist_expr(vec_col, "centroid")
    assigned = (
        vectors.select(id_col, vec_col)
        .crossJoin(F.broadcast(seeds))
        .withColumn("qd", qd)
        .groupBy(id_col, vec_col)
        .agg(F.min(F.struct("qd", "cluster")).alias("best"))
        .select(id_col, vec_col, F.col("best.cluster").alias("cluster"))
    )
    dims = assigned.select(
        "cluster",
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    )
    return dims.groupBy("cluster", "dim").agg(
        (
            F.sum(F.col("x").cast("double").cast("decimal(18,8)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("centroid_value"),
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
    )


def dedup_threshold_curve(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    thresholds: tuple[float, ...] = (0.25, 0.3, 0.35, 0.4, 0.5),
    n_planes: int = 8,
) -> DataFrame:
    """E15 — dedup threshold decision curve: how many near-dup pairs
    (and docs touched) each candidate cosine threshold would remove —
    computed in ONE pass over the LSH candidate set. This is the
    report a team reads before committing to "dedup at 0.9": the
    knee of this curve IS the deployment threshold.

    Plan: hyperplane-LSH bucket candidates (bounded fanout, same as
    E2), one exact quantized cosine per candidate, then a tiny
    explode over the threshold list and a |thresholds|-row aggregate.
    Counting at 5 thresholds costs one pass, not 5 runs of the dedup.
    """
    coded = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        norm_expr(vec_col).alias("nrm"),
        lsh_code(vec_col, n_planes).alias("code"),
    )
    a = coded.select(
        F.col(id_col).alias("va"),
        F.col(vec_col).alias("ea"),
        F.col("nrm").alias("na"),
        "code",
    )
    b = coded.select(
        F.col(id_col).alias("vb"),
        F.col(vec_col).alias("eb"),
        F.col("nrm").alias("nb"),
        "code",
    )
    pairs = a.join(b, ["code"]).where(F.col("va") < F.col("vb"))
    cos = (dot_expr("ea", "eb") / (F.col("na") * F.col("nb"))).alias("cosine")
    scored = pairs.select("va", "vb", cos)
    th = F.explode(
        F.array(*[F.lit(float(t)) for t in thresholds])
    ).alias("threshold")
    hits = scored.select("va", "vb", "cosine", th).where(
        F.col("cosine") >= F.col("threshold")
    )
    # each pair contributes its two endpoints; countDistinct scales
    # (a collect_list of all pair ids per threshold would pile the
    # whole hit set into one reducer array)
    expl = hits.select(
        "threshold", F.explode(F.array("va", "vb")).alias("doc")
    )
    return expl.groupBy("threshold").agg(
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_pairs"),
        F.countDistinct("doc").cast("bigint").alias("n_docs_touched"),
    )


def mmr_diversify(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 8,
    n_candidates: int = 32,
    lam: float = 0.7,
) -> DataFrame:
    """E16 — Maximal Marginal Relevance reranking (Carbonell &
    Goldstein '98): for each label-centroid query, pick k of the
    top-n cosine candidates greedily, each step maximizing
    lam*rel(query, d) - (1-lam)*max_sim(d, already-picked) — the
    standard post-ANN rerank that trades relevance against
    redundancy when assembling diverse training batches or retrieval
    contexts.

    Engine-exact and oracle-checked: every float the greedy compares
    is reproducible bit-for-bit in ANSI SQL — relevance and pairwise
    similarities use the pico-quantized dot scheme (floor(a·b·1e12)
    per dim, exact integer sum, one division) with Spark-computed
    norms carried into the pandas group, and the selection itself is
    8 unrolled argmax steps the DuckDB twin replays as chained CTEs
    (ties: score DESC, candidate rank ASC — the strict-> iteration
    order of the loop below).

    Plan: relevance scoring is the broadcast-centroid brute-force
    pass (corpus map-only, one rank shuffle on the label key);
    the inherently-sequential greedy runs inside applyInPandas per
    label group over ONLY n_candidates vectors — O(k*n²) numpy on 32
    rows — while label groups parallelize across executors. The
    corpus-sized work is all declarative; the sequential tail is
    bounded and per-group.
    """
    import numpy as np
    import pandas as pd

    cent = (
        label_centroids(df, label_col, vec_col)
        .groupBy(label_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "centroid"))),
                lambda s: s["centroid"],
            ).alias("qv")
        )
        .select(
            F.col(label_col).alias("qlabel"),
            "qv",
            norm_expr("qv").alias("qn"),
        )
    )
    cands = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        norm_expr(vec_col).alias("cn"),
    )
    w = Window.partitionBy("qlabel").orderBy(F.desc("rel"), F.asc("vec_id"))
    top = (
        cands.crossJoin(F.broadcast(cent))
        .withColumn("rel", dot_expr("qv", "cv") / (F.col("qn") * F.col("cn")))
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= n_candidates)
        .select("qlabel", "vec_id", "rel", "cv", "cn", "r")
    )

    schema = (
        "qlabel int, sel_rank int, vec_id bigint, rel double, "
        "mmr_score double"
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("r", ignore_index=True)
        V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["cv"]])
        cn = pdf["cn"].to_numpy(dtype=np.float64)
        cn = np.where(cn == 0, 1.0, cn)
        # pairwise cosines via the SAME pico-quantized dot the
        # declarative side uses — (a·b) and ·1e12 as two separate
        # roundings, floor, EXACT int64 fold — so every sim is
        # bit-identical to the SQL oracle's list_zip form
        P = np.floor((V[:, None, :] * V[None, :, :]) * 1e12).astype(
            np.int64
        ).sum(axis=2)
        S = (P.astype(np.float64) / 1e12) / np.outer(cn, cn)
        rel = pdf["rel"].to_numpy()
        n = len(pdf)
        picked: list[int] = []
        scores: list[float] = []
        avail = list(range(n))
        while avail and len(picked) < k:
            if not picked:
                best, best_s = avail[0], rel[avail[0]]
                for i in avail[1:]:
                    if rel[i] > best_s:
                        best, best_s = i, rel[i]
            else:
                best, best_s = -1, -np.inf
                for i in avail:  # candidate order = rel desc, id asc (tie-stable)
                    s = lam * rel[i] - (1.0 - lam) * S[i, picked].max()
                    if s > best_s:
                        best, best_s = i, s
            picked.append(best)
            scores.append(float(best_s))
            avail.remove(best)
        return pd.DataFrame(
            {
                "qlabel": pdf["qlabel"].iloc[:1].repeat(len(picked)).to_numpy(),
                "sel_rank": np.arange(1, len(picked) + 1, dtype="int32"),
                "vec_id": pdf["vec_id"].to_numpy()[picked],
                "rel": rel[picked],
                "mmr_score": np.array(scores),
            }
        )

    return (
        top.groupBy("qlabel")
        .applyInPandas(greedy, schema=schema)
        .orderBy("qlabel", "sel_rank")
    )


def pq_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 4,
) -> DataFrame:
    """E17 — product quantization assignment: split each embedding
    into n_sub contiguous sub-vectors and code each against a
    per-subspace codebook — the memory layout ANN systems use to hold
    billion-vector indexes in RAM (64 floats → 8 code bytes here).
    Codebook = the first n_codes vectors' sub-slices (deterministic
    seeds, same convention as kmeans_refine E14; a production build
    would Lloyd-iterate them — the assignment plan below is identical
    either way).

    Exactness: distances quantize per-element with floor(d²·1e12)
    into BIGINT sums (the kmeans_refine scheme); argmin compares
    exact integers, ties break on code id.

    Plan: the codebook is n_sub × n_codes rows — broadcast; the
    corpus explodes into n_sub sub-vector rows map-side, joins the
    broadcast codebook on subspace, and the per-(vector, subspace)
    argmin is a rank window whose partitions hold exactly n_codes
    rows. No corpus shuffle except the final (id, subspace) rank —
    and that exchange carries code ids, not vectors.
    """
    slices = F.array(
        *[
            F.slice(F.col(vec_col), s * sub_dim + 1, sub_dim)
            for s in range(n_sub)
        ]
    )
    seeds = (
        df.where(F.col(id_col) < n_codes)
        .select(
            F.col(id_col).cast("int").alias("code"),
            F.posexplode(slices).alias("subspace", "cv"),
        )
    )
    subs = df.select(
        F.col(id_col),
        F.posexplode(slices).alias("subspace", "sv"),
    )
    qd_terms = " + ".join(
        f"cast(floor((cast(element_at(sv, {j}) as double)"
        f" - cast(element_at(cv, {j}) as double))"
        f" * (cast(element_at(sv, {j}) as double)"
        f" - cast(element_at(cv, {j}) as double)) * 1e12) as bigint)"
        for j in range(1, sub_dim + 1)
    )
    scored = subs.join(F.broadcast(seeds), "subspace").withColumn(
        "qd", F.expr(qd_terms)
    )
    w = Window.partitionBy(id_col, "subspace").orderBy("qd", "code")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col(id_col),
            F.col("subspace").cast("int").alias("subspace"),
            "code",
            (F.col("qd").cast("double") / F.lit(1e12)).alias("qdist"),
        )
        .orderBy(id_col, "subspace")
    )


def pq_code_balance(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 4,
) -> DataFrame:
    """E20 — PQ codebook health: per (subspace, code) the member
    count and mean quantized distortion. A code that captures 90% of
    a subspace (or none of it) means the codebook wastes bits — the
    check run after every PQ (re)train, here over E17's assignment.

    Exactness: distortions are already exact 1e-12-quantized BIGINTs;
    the mean is one exact division.

    Plan: E17's assignment plan + one (subspace, code) aggregate of
    at most n_sub x n_codes rows.
    """
    assign = pq_assign(df, id_col, vec_col, n_sub, sub_dim, n_codes)
    return (
        assign.groupBy("subspace", "code")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.sum(
                F.floor(F.col("qdist") * F.lit(1e12)).cast("bigint")
            ).alias("qsum"),
        )
        .select(
            "subspace",
            "code",
            "n_members",
            (
                F.col("qsum").cast("double")
                / F.col("n_members").cast("double")
                / F.lit(1e12)
            ).alias("mean_distortion"),
        )
        .orderBy("subspace", "code")
    )


def pq_adc_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 4,
    n_queries: int = 5,
    k: int = 5,
) -> DataFrame:
    """E21 — PQ asymmetric-distance search: approximate top-k via the
    corpus's PQ codes (E17) and per-query distance tables — the
    actual query path of IVF-PQ engines (Jégou et al., TPAMI 2011).
    The corpus contributes ONLY its code bytes; each query
    precomputes its distance to every (subspace, code) centroid once,
    and a candidate's distance is a table-lookup sum — no corpus
    vector is ever touched at query time, which is why a billion
    vectors fit in RAM.

    Exactness: distance-table entries are the E17 floor(d²·1e12)
    BIGINTs; ADC totals are exact integer sums; ranking compares
    integers with id tiebreak.

    Plan: codes come from pq_assign's bounded plan; the distance
    table is n_queries × n_sub × n_codes rows — broadcast; the join
    fans each code row out to n_queries rows (linear), and the final
    per-query rank is WindowGroupLimit-pruned. The corpus-sized
    shuffles carry (query, id, bigint) triples only.
    """
    slices = F.array(
        *[
            F.slice(F.col(vec_col), s * sub_dim + 1, sub_dim)
            for s in range(n_sub)
        ]
    )
    seeds = df.where(F.col(id_col) < n_codes).select(
        F.col(id_col).cast("int").alias("code"),
        F.posexplode(slices).alias("subspace", "cv"),
    )
    queries = df.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.posexplode(slices).alias("subspace", "qv"),
    )
    qd_terms = " + ".join(
        f"cast(floor((cast(element_at(qv, {j}) as double)"
        f" - cast(element_at(cv, {j}) as double))"
        f" * (cast(element_at(qv, {j}) as double)"
        f" - cast(element_at(cv, {j}) as double)) * 1e12) as bigint)"
        for j in range(1, sub_dim + 1)
    )
    dist_table = queries.join(F.broadcast(seeds), "subspace").select(
        "query_id", "subspace", "code", F.expr(qd_terms).alias("qd")
    )
    codes = pq_assign(df, id_col, vec_col, n_sub, sub_dim, n_codes).select(
        F.col(id_col).alias("neighbor_id"), "subspace", "code"
    )
    adc = (
        codes.join(F.broadcast(dist_table), ["subspace", "code"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("qd").alias("adc_q"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_q", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            (F.col("adc_q").cast("double") / F.lit(1e12)).alias("adc_dist"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


def mean_drift(
    df: DataFrame, id_col: str, vec_col: str, dim: int = EMBED_DIM
) -> DataFrame:
    """E22 — per-dimension embedding drift between two deterministic
    halves of the corpus (even vs odd ids — append-stable stand-ins
    for "last week's batch vs this week's"): dimension means per half
    and their absolute gap. The cheap canary for encoder or
    upstream-distribution change — a handful of drifting dimensions
    means re-embedding or re-centering before ANN recall quietly
    rots.

    Exactness: per-half means are DECIMAL(18,8) folds of identical
    element doubles (embed_label_centroids scheme); the gap is one
    IEEE subtraction.

    Plan: one posexplode + (dim) conditional aggregate — map-side
    combined, 64 output rows, no join.
    """
    from icecube_spark.functions.parity import dsum

    e = df.select(
        (F.col(id_col) % 2 == 0).alias("even"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    ).withColumn("xd", F.col("x").cast("double"))
    return (
        e.groupBy("dim")
        .agg(
            F.sum(F.when(F.col("even"), 1).otherwise(0))
            .cast("bigint").alias("n_a"),
            F.sum(F.when(~F.col("even"), 1).otherwise(0))
            .cast("bigint").alias("n_b"),
            F.sum(F.when(F.col("even"), F.col("xd").cast("decimal(18,8)")))
            .cast("double").alias("s_a"),
            F.sum(F.when(~F.col("even"), F.col("xd").cast("decimal(18,8)")))
            .cast("double").alias("s_b"),
        )
        .select(
            F.col("dim").cast("int").alias("dim"),
            "n_a",
            "n_b",
            (F.col("s_a") / F.col("n_a").cast("double")).alias("mean_a"),
            (F.col("s_b") / F.col("n_b").cast("double")).alias("mean_b"),
            F.abs(
                F.col("s_a") / F.col("n_a").cast("double")
                - F.col("s_b") / F.col("n_b").cast("double")
            ).alias("abs_drift"),
        )
        .orderBy("dim")
    )


def adjacent_cosine_hist(
    df: DataFrame, id_col: str, vec_col: str, n_bins: int = 20
) -> DataFrame:
    """E23 — cosine-similarity histogram over the deterministic
    adjacent-id pair sample (vec i vs i+1): the corpus isotropy
    profile. A healthy embedding space piles mass near 0; mass near 1
    means collapsed/duplicated embeddings and ANN recall will look
    great while retrieval is useless. The adjacent-pair sample is
    linear in corpus size (vs quadratic all-pairs) and append-stable.

    Exactness: cosines come from the exact-quantized dot and
    correctly-rounded sqrt norms (E1 scheme) — identical doubles both
    engines; bin ids are floor arithmetic; per-bin means fold in
    DECIMAL(18,8).

    Plan: one self-join on id+1 (both sides sorted the same way —
    with ids unique this is a 1:1 merge), one n_bins-row aggregate.
    """
    a = df.select(
        F.col(id_col).alias("ida"),
        F.col(vec_col).alias("va"),
        norm_expr(vec_col).alias("na"),
    )
    b = df.select(
        (F.col(id_col) - 1).alias("ida"),
        F.col(vec_col).alias("vb"),
        norm_expr(vec_col).alias("nb"),
    )
    pairs = a.join(b, "ida").withColumn(
        "cosine", dot_expr("va", "vb") / (F.col("na") * F.col("nb"))
    )
    half = n_bins // 2
    binc = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col("cosine") + 1) * half).cast("int"),
        ),
    )
    return (
        pairs.select(binc.alias("bin"), "cosine")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("cosine").cast("decimal(18,8)"))
            .cast("double").alias("s"),
        )
        .select(
            "bin",
            (F.col("bin").cast("double") / half - 1).alias("bin_lo"),
            "n_pairs",
            (F.col("s") / F.col("n_pairs").cast("double")).alias("mean_cos"),
        )
        .orderBy("bin")
    )


def pq_recall_eval(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_queries: int = 5,
    k: int = 5,
) -> DataFrame:
    """E24 — PQ search quality gate: recall@k of the asymmetric-
    distance top-k (E21) against the exact cosine top-k, per query.
    The sign-off that says how much the 8-byte code compression costs
    in retrieval quality — the PQ twin of ann_recall_eval (E11).

    Exactness: both rankings are already oracle-exact; the overlap
    count is an integer; recall is one INT division.

    Plan: both top-k plans are WindowGroupLimit-pruned; the overlap
    is a k·n_queries-row semi-join. Nothing corpus-scale shuffles
    beyond what E21/E1 already do.
    """
    adc = pq_adc_topk(df, id_col, vec_col, n_queries=n_queries, k=k).select(
        "query_id", "neighbor_id"
    )
    exact = cosine_topk(
        df, id_col, vec_col, F.col(id_col) < n_queries, k=k
    ).select("query_id", "neighbor_id").transform(materialize)
    # ^ bounded (k·n_queries rows) and referenced by both the overlap
    # join and the all-queries frame — checkpoint so the exact
    # brute-force pass runs once (guide §5)
    # NOT broadcast-hinted (measured): forcing the adc side into a
    # broadcast build serializes its whole ADC-ranking lineage into
    # the broadcast job and reads ~20% slower than letting the two
    # panel-bounded sides sort-merge in parallel stages (r10 bracketed
    # A/B; both sides are k·n_queries rows, so the SMJ is as
    # scale-safe as the broadcast here)
    hits = (
        exact.join(adc, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_hits"))
    )
    allq = exact.select("query_id").distinct()
    return (
        allq.join(F.broadcast(hits), "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("int").alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.lit(float(k))
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


def hard_negatives(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    query_filter,
    k: int = 3,
) -> DataFrame:
    """E25 — hard-negative mining: for each query vector, the top-k
    most-similar vectors with a DIFFERENT label — the contrastive-
    training staple (the near-duplicates of your anchor that the
    model must learn to push apart).

    Exactness: the quantized-dot cosine scheme of cosine_topk;
    ranking ties break on neighbor id.

    Plan: identical shape to E1 — broadcast the bounded query set,
    scan the corpus once (label inequality rides the broadcast join
    condition so same-label pairs never materialize), rank on the
    query_id shuffle. Corpus-side never shuffles at any scale.
    """
    queries = vectors.where(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.col(vec_col).alias("qv"),
        norm_expr(vec_col).alias("qn"),
    )
    cands = vectors.select(
        F.col(id_col).alias("neg_id"),
        F.col(label_col).alias("neg_label"),
        F.col(vec_col).alias("cv"),
        norm_expr(vec_col).alias("cn"),
    )
    scored = (
        cands.join(
            F.broadcast(queries),
            F.col("query_label") != F.col("neg_label"),
        )
        .withColumn("cosine", dot_expr("qv", "cv") / (F.col("qn") * F.col("cn")))
        .select("query_id", "query_label", "neg_id", "neg_label", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neg_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def label_noise_knn(
    vectors: DataFrame, id_col: str, vec_col: str, label_col: str, k: int = 5
) -> DataFrame:
    """E26 — confident-learning-lite label-noise audit: per label
    class, the fraction of k-NN votes (within the E2 LSH bucket) that
    DISAGREE with the anchor's label. Classes whose members sit in
    other classes' neighborhoods are mislabeled or ill-defined — the
    triage table before trusting labels for eval or distillation.

    Exactness: bucket codes and cosines follow the E2 quantized
    scheme; the per-class rate divides exact vote counts.

    Plan: one code shuffle, within-bucket pairs only, per-anchor
    WindowGroupLimit top-k, then a |labels|-row aggregate. Candidate
    fanout is bucket-bounded exactly like E2 — never corpus².
    """
    coded = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        F.col(label_col),
        lsh_code(vec_col).alias("code"),
        norm_expr(vec_col).alias("nrm"),
    )
    a = coded.select(
        F.col(id_col).alias("vec_id_a"), F.col(vec_col).alias("va"),
        F.col(label_col).alias("la"), "code", F.col("nrm").alias("na"),
    )
    b = coded.select(
        F.col(id_col).alias("vec_id_b"), F.col(vec_col).alias("vb"),
        F.col(label_col).alias("lb"), "code", F.col("nrm").alias("nb"),
    )
    pairs = (
        a.join(b, "code")
        .where(F.col("vec_id_a") != F.col("vec_id_b"))
        .withColumn("cosine", dot_expr("va", "vb") / (F.col("na") * F.col("nb")))
    )
    w = Window.partitionBy("vec_id_a").orderBy(F.desc("cosine"), F.asc("vec_id_b"))
    topk = pairs.withColumn("r", F.row_number().over(w)).where(F.col("r") <= k)
    return (
        topk.groupBy(F.col("la").alias("label"))
        .agg(
            F.countDistinct("vec_id_a").cast("bigint").alias("n_anchors"),
            F.count(F.lit(1)).cast("bigint").alias("n_votes"),
            F.sum(F.when(F.col("lb") != F.col("la"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_disagree"),
        )
        .select(
            "label",
            "n_anchors",
            "n_votes",
            "n_disagree",
            (
                F.col("n_disagree").cast("double")
                / F.col("n_votes").cast("double")
            ).alias("noise_rate"),
        )
        .orderBy("label")
    )


def matryoshka_recall(
    vectors: DataFrame, id_col: str, vec_col: str,
    prefix_dim: int = 16, k: int = 5, n_queries: int = 10,
) -> DataFrame:
    """E27 — Matryoshka truncation eval (Kusupati et al. 2022): for
    each query, recall@k of the top-k retrieved with only the first
    `prefix_dim` dims against the full-dim top-k. The sizing table
    for MRL-style embedding truncation — what recall a 4× smaller
    index costs.

    Exactness: both rankings use the quantized-dot scheme; recall
    divides exact overlap counts.

    Plan: two E1-shaped broadcast top-k plans (corpus never
    shuffles) and one k·n_queries-row semi-join — the pq_recall_eval
    (E24) harness shape with a dimension slice instead of codes.
    """
    full = cosine_topk(
        vectors, id_col, vec_col, F.col(id_col) < n_queries, k
    ).select("query_id", "neighbor_id")
    queries = vectors.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_expr(vec_col, prefix_dim).alias("qn"),
    )
    cands = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm_expr(vec_col, prefix_dim).alias("cn"),
    )
    scored = (
        cands.join(F.broadcast(queries), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            dot_expr("qv", "cv", prefix_dim) / (F.col("qn") * F.col("cn")),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    pref = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id")
    )
    hits = full.join(
        pref.withColumn("hit", F.lit(1)), ["query_id", "neighbor_id"], "left"
    )
    return (
        hits.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_overlap"),
        )
        .select(
            "query_id",
            "n_overlap",
            (
                F.col("n_overlap").cast("double") / F.col("k").cast("double")
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


def hamming_recall(
    vectors: DataFrame, id_col: str, vec_col: str,
    k: int = 5, n_queries: int = 10, dim: int = EMBED_DIM,
) -> DataFrame:
    """E29 — binary-quantization eval: sign-bit sketch (1 bit/dim →
    64-bit code), top-k by Hamming distance, recall against the
    full-precision cosine top-k. The sizing table for binary
    embedding indexes (32× smaller, XOR-popcount scans) — the rage
    in 2024-era vector stores.

    Exactness: sign bits and popcounts are exact integers (a
    component exactly 0.0 maps to bit 0 in both engines); Hamming
    ties break on neighbor id; recall divides exact counts.

    Plan: the sketch is one flat codegen expression; the probe is an
    E1-shaped broadcast scan (integer XOR/popcount per pair — no
    dot products); one k-row semi-join closes the eval.
    """
    half = dim // 2
    lo = " + ".join(
        f"(CASE WHEN element_at({vec_col}, {j}) > 0"
        f" THEN CAST({1 << (j - 1)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(1, half + 1)
    )
    hi = " + ".join(
        f"(CASE WHEN element_at({vec_col}, {j}) > 0"
        f" THEN CAST({1 << (j - half - 1)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(half + 1, dim + 1)
    )
    sk = vectors.select(
        F.col(id_col),
        F.expr(f"({lo})").alias("sk_lo"),
        F.expr(f"({hi})").alias("sk_hi"),
    )
    full = cosine_topk(
        vectors, id_col, vec_col, F.col(id_col) < n_queries, k
    ).select("query_id", "neighbor_id")
    q = sk.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("sk_lo").alias("q_lo"),
        F.col("sk_hi").alias("q_hi"),
    )
    c = sk.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("sk_lo").alias("c_lo"),
        F.col("sk_hi").alias("c_hi"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr("bit_count(q_lo ^ c_lo) + bit_count(q_hi ^ c_hi)")
            .cast("int")
            .alias("hamming"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("hamming", F.asc("neighbor_id"))
    ham = (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= k)
        .select("query_id", "neighbor_id")
    )
    hits = full.join(
        ham.withColumn("hit", F.lit(1)), ["query_id", "neighbor_id"], "left"
    )
    return (
        hits.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("kk"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_overlap"),
        )
        .select(
            "query_id",
            "n_overlap",
            (
                F.col("n_overlap").cast("double") / F.col("kk").cast("double")
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


def label_silhouette(
    df: DataFrame, id_col: str, vec_col: str, label_col: str,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """E30 — centroid-silhouette per label class: for every vector,
    a = cosine to its OWN label centroid, b = best cosine to any
    OTHER centroid; the class reports mean (a − b) and the fraction
    of members closer to a foreign centroid. The cluster-quality
    readout on labeled embeddings — label_noise_knn (E26) audits
    neighbors, this audits geometry.

    Exactness: centroids fold per-dimension in decimals (E5); all
    cosines use the quantized-dot scheme; the silhouette margin
    quantizes to a 1e-9 grid before the exact-count aggregate.

    Plan: the |labels|×|dims| centroid table pivots to vectors and
    broadcasts; one corpus scan scores all |labels| centroids per
    row in codegen; one |labels|-row aggregate.
    """
    cents = label_centroids(df, label_col, vec_col)
    cvecs = cents.groupBy(label_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("dim"), F.col("centroid")))
        ).alias("pairs")
    ).select(
        F.col(label_col).alias("clabel"),
        F.expr("transform(pairs, p -> p.centroid)").alias("cvec"),
    )
    scored = (
        df.select(F.col(id_col), F.col(label_col), F.col(vec_col))
        .join(F.broadcast(cvecs))
        .withColumn(
            "cosine",
            dot_expr(vec_col, "cvec", dim)
            / (norm_expr(vec_col, dim) * norm_expr("cvec", dim)),
        )
    )
    per_vec = scored.groupBy(id_col, label_col).agg(
        F.max(
            F.when(F.col(label_col) == F.col("clabel"), F.col("cosine"))
        ).alias("a"),
        F.max(
            F.when(F.col(label_col) != F.col("clabel"), F.col("cosine"))
        ).alias("b"),
    )
    margin_q = F.floor((F.col("a") - F.col("b")) * F.lit(1e9)).cast("bigint")
    return (
        per_vec.withColumn("mq", margin_q)
        .groupBy(F.col(label_col).alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            (
                F.sum("mq").cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1e9)
            ).alias("mean_margin"),
            F.sum(F.when(F.col("b") > F.col("a"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_misplaced"),
        )
        .orderBy("label")
    )


def uncertainty_sampling(
    vectors: DataFrame, id_col: str, vec_col: str, label_col: str,
    k: int = 5, top_n: int = 20,
) -> DataFrame:
    """E31 — active-learning priority queue: the vectors whose
    in-bucket k-NN vote is least decisive (lowest top-vote share).
    Labeling budget goes to the boundary cases, not the easy wins —
    the standard margin/uncertainty sampling loop.

    Exactness: vote counts are exact; the share divides them; the
    top-n ties break on vector id.

    Plan: the E26 bucket-bounded k-NN pairs, a per-anchor vote
    aggregate, and a TakeOrdered top-n — never all-pairs.
    """
    coded = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        F.col(label_col),
        lsh_code(vec_col).alias("code"),
        norm_expr(vec_col).alias("nrm"),
    )
    a = coded.select(
        F.col(id_col).alias("vec_id_a"), F.col(vec_col).alias("va"),
        F.col(label_col).alias("la"), "code", F.col("nrm").alias("na"),
    )
    b = coded.select(
        F.col(id_col).alias("vec_id_b"), F.col(vec_col).alias("vb"),
        F.col(label_col).alias("lb"), "code", F.col("nrm").alias("nb"),
    )
    pairs = (
        a.join(b, "code")
        .where(F.col("vec_id_a") != F.col("vec_id_b"))
        .withColumn("cosine", dot_expr("va", "vb") / (F.col("na") * F.col("nb")))
    )
    w = Window.partitionBy("vec_id_a").orderBy(F.desc("cosine"), F.asc("vec_id_b"))
    topk = pairs.withColumn("r", F.row_number().over(w)).where(F.col("r") <= k)
    votes = topk.groupBy("vec_id_a", "la", "lb").agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    per_anchor = votes.groupBy(
        F.col("vec_id_a").alias("vec_id"), F.col("la").alias("label")
    ).agg(
        F.sum("v").cast("bigint").alias("n_votes"),
        F.max("v").cast("bigint").alias("top_votes"),
    )
    share = F.col("top_votes").cast("double") / F.col("n_votes").cast("double")
    return (
        per_anchor.select(
            "vec_id",
            "label",
            "n_votes",
            "top_votes",
            (F.lit(1.0) - share).alias("uncertainty"),
        )
        .orderBy(F.col("uncertainty").desc(), "vec_id")
        .limit(top_n)
    )


def knn_graph_stats(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    panel_filter,
    k: int = 5,
) -> DataFrame:
    """E32 — kNN-graph health report over a sampled panel: build the
    directed k-nearest-neighbor graph (cosine, within the panel) and
    report its reciprocity (fraction of edges whose reverse edge also
    exists) plus hubness extremes (max in-degree, never-cited count).
    Low reciprocity / heavy hubs are the classic symptom of degraded
    embedding spaces (hubness grows with dimension) and of ANN index
    trouble — this is the diagnostic run before trusting any
    embedding-based dedup or retrieval stage.

    Plan: the panel broadcasts against itself (bounded: panel², never
    corpus²), one per-source top-k window, then the mutual-edge check
    is a self-join on the REVERSED key — k·|panel| edge rows, tiny.
    At 100 TB the panel stays a fixed-size sample (the statistic is a
    property of the space, not the corpus), so cost is flat.
    """
    panel = vectors.where(panel_filter).select(
        F.col(id_col).alias("src"),
        F.col(vec_col).alias("v"),
        norm_expr(vec_col).alias("nrm"),
    )
    cands = panel.select(
        F.col("src").alias("dst"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    scored = (
        panel.join(F.broadcast(cands), F.col("src") != F.col("dst"))
        .withColumn("cosine", dot_expr("v", "cv") / (F.col("nrm") * F.col("cn")))
        .select("src", "dst", "cosine")
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    edges = (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= k)
        .select("src", "dst")
        # bounded (k·|panel| rows) and referenced by the reverse side,
        # the reciprocity semi-join, the in-degree agg AND the edge
        # count — checkpoint so the panel² cosine scoring runs once,
        # not four times (guide §5)
        .transform(materialize)
    )
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = edges.join(rev, ["src", "dst"], "left_semi")
    indeg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
    n_panel = panel.select(F.count(F.lit(1)).alias("n_vectors"))
    stats = edges.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges")
    ).crossJoin(
        recip.agg(F.count(F.lit(1)).cast("bigint").alias("n_reciprocal"))
    ).crossJoin(
        indeg.agg(
            F.max("d").cast("bigint").alias("max_in_degree"),
            F.count(F.lit(1)).cast("bigint").alias("n_cited"),
        )
    ).crossJoin(n_panel)
    return stats.select(
        F.col("n_vectors").cast("bigint").alias("n_vectors"),
        F.lit(k).cast("int").alias("k"),
        "n_edges",
        "n_reciprocal",
        (F.col("n_reciprocal").cast("double") / F.col("n_edges").cast("double"))
        .alias("reciprocity"),
        "max_in_degree",
        (F.col("n_vectors").cast("bigint") - F.col("n_cited"))
        .alias("n_never_cited"),
    )


def _rp_matrix(dim: int, proj_dim: int) -> list[list[int]]:
    """Deterministic integer 'random' projection matrix in [-998, 998]:
    r[j][p] = ((j*7919 + p*104729) mod 1997) - 998 with 1-based j, p.
    Integer arithmetic evaluates identically in every engine — the
    cross-engine-safe stand-in for a seeded Gaussian matrix."""
    return [
        [((j * 7919 + p * 104729) % 1997) - 998 for p in range(1, proj_dim + 1)]
        for j in range(1, dim + 1)
    ]


def rp_recall(
    vectors: DataFrame, id_col: str, vec_col: str,
    k: int = 10, n_queries: int = 10, dim: int = EMBED_DIM, proj_dim: int = 8,
) -> DataFrame:
    """E33 — random-projection retrieval eval: project dim-D vectors
    to proj_dim-D with a deterministic integer matrix (Johnson-
    Lindenstrauss-style), take top-k by projected L2 distance, and
    score recall against the exact cosine top-k. The go/no-go gate
    for swapping full-precision scans for an 8-D projected index
    (proj_dim/dim ~ 8x less distance work per probe at 100 TB).

    Exactness: components quantize to floor(x*1e6) BIGINTs; each
    projection is an exact integer dot with the integer matrix,
    downscaled by floor(/1e6) (max |p| ~ 6.4e10 << 2^53, so the
    double round-trip is exact); projected distances are exact
    BIGINT sums of squared diffs; ties break on neighbor id.

    Plan: the projection is one codegen zip_with/aggregate per
    output dim over the corpus scan; the probe broadcasts only the
    n_queries projected rows (integer compares, no doubles); the
    exact reference reuses the E1 broadcast scan. No shuffle
    touches the full corpus beyond the one top-k per query.
    """
    mat = _rp_matrix(dim, proj_dim)
    qarr = (
        f"transform({vec_col}, x -> "
        f"cast(floor(cast(x as double) * 1e6) as bigint))"
    )
    proj_cols = []
    for p in range(proj_dim):
        rlist = ", ".join(str(mat[j][p]) for j in range(dim))
        proj_cols.append(
            F.expr(
                f"cast(floor(cast(aggregate(zip_with({qarr}, array({rlist}), "
                f"(x, y) -> x * cast(y as bigint)), cast(0 as bigint), "
                f"(a, x) -> a + x) as double) / 1e6) as bigint)"
            ).alias(f"p{p}")
        )
    pv = vectors.select(F.col(id_col), *proj_cols)
    q = pv.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        *[F.col(f"p{p}").alias(f"q{p}") for p in range(proj_dim)],
    )
    dist = None
    for p in range(proj_dim):
        d = F.col(f"p{p}") - F.col(f"q{p}")
        dist = d * d if dist is None else dist + d * d
    scored = pv.join(
        F.broadcast(q), F.col("query_id") != F.col(id_col)
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        dist.cast("bigint").alias("pdist"),
    )
    w = Window.partitionBy("query_id").orderBy("pdist", F.asc("neighbor_id"))
    approx = (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= k)
        .select("query_id", "neighbor_id")
    )
    exact = cosine_topk(
        vectors, id_col, vec_col, F.col(id_col) < n_queries, k
    ).select("query_id", "neighbor_id")
    hits = exact.join(
        approx.withColumn("hit", F.lit(1)), ["query_id", "neighbor_id"], "left"
    )
    return (
        hits.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("kk"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_overlap"),
        )
        .select(
            "query_id",
            "n_overlap",
            (
                F.col("n_overlap").cast("double") / F.col("kk").cast("double")
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


def bucket_label_ari(
    vectors: DataFrame, id_col: str, vec_col: str, label_col: str,
    n_planes: int = 8,
) -> DataFrame:
    """E34 — Adjusted Rand Index between the E2 hyperplane-LSH bucket
    assignment and the ground-truth labels: does the geometric
    bucketing recover the label structure? The clustering-eval twin
    of label_silhouette — ARI ~ 0 means buckets are label-random
    (bad retrieval space), ARI -> 1 means LSH codes alone separate
    the classes.

    Exactness: the contingency table is exact integer counts;
    multiplying the ARI ratio through by the pair count keeps BOTH
    numerator and denominator exact BIGINTs — one final single
    division produces the identical double in both engines.

    Plan: one (code, label) count shuffle (<= 256 x labels cells),
    then driver-sized marginal sums; the code itself is the E2
    codegen fold over the corpus scan. Scales linearly forever.
    """
    coded = vectors.select(
        lsh_code(vec_col, n_planes).alias("code"), F.col(label_col).alias("lbl")
    )
    cells = coded.groupBy("code", "lbl").agg(
        F.count(F.lit(1)).cast("bigint").alias("nij")
    )
    pairs = F.expr("(nij * (nij - 1)) div 2")
    idx = cells.agg(
        F.sum(pairs).cast("bigint").alias("index_pairs"),
        F.sum("nij").cast("bigint").alias("n_vectors"),
        F.countDistinct("code").cast("bigint").alias("n_codes"),
        F.countDistinct("lbl").cast("bigint").alias("n_labels"),
    )
    a = (
        cells.groupBy("code")
        .agg(F.sum("nij").alias("ni"))
        .agg(F.sum(F.expr("(ni * (ni - 1)) div 2")).cast("bigint").alias("a"))
    )
    b = (
        cells.groupBy("lbl")
        .agg(F.sum("nij").alias("nj"))
        .agg(F.sum(F.expr("(nj * (nj - 1)) div 2")).cast("bigint").alias("b"))
    )
    j = idx.crossJoin(F.broadcast(a)).crossJoin(F.broadcast(b)).withColumn(
        "np", F.expr("(n_vectors * (n_vectors - 1)) div 2")
    )
    num = F.expr("2 * index_pairs * np - 2 * a * b")
    den = F.expr("(a + b) * np - 2 * a * b")
    return j.select(
        "n_vectors",
        "n_codes",
        "n_labels",
        "index_pairs",
        (
            (F.col("a") * F.col("b")).cast("double")
            / F.col("np").cast("double")
        ).alias("expected_pairs"),
        (num.cast("double") / den.cast("double")).alias("ari"),
    )


def dot_cosine_rank_corr(
    vectors: DataFrame, id_col: str, vec_col: str,
    n_queries: int = 10, dim: int = EMBED_DIM,
) -> DataFrame:
    """E35 — Spearman rank correlation between dot-product ranking
    and cosine ranking per query, over the whole candidate set. The
    "does normalization matter HERE" gate: rho ~ 1 means norms are
    uniform enough to skip the normalize pass (and its sqrt per
    pair) in the retrieval path; a low rho means dot-product
    shortcuts silently reorder results.

    Exactness: both rankings are integer row_numbers over quantized
    scores with id tie-breaks; Spearman's 1 - 6*sum d^2/(n(n^2-1))
    divides exact integers once.

    Plan: one E1-shaped broadcast scan produces both scores in the
    same pass; two windows per query (partition-local sorts), one
    per-query aggregate.
    """
    q = vectors.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    scored = vectors.join(
        F.broadcast(q), F.col("query_id") != F.col(id_col)
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        dot_expr("qv", vec_col, dim).alias("dot"),
        (
            dot_expr("qv", vec_col, dim)
            / (norm_expr("qv", dim) * norm_expr(vec_col, dim))
        ).alias("cosine"),
    )
    wd = Window.partitionBy("query_id").orderBy(
        F.desc("dot"), F.asc("neighbor_id")
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    ranked = scored.select(
        "query_id",
        (F.row_number().over(wd) - F.row_number().over(wc)).alias("d"),
    )
    agg = ranked.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("d").cast("bigint") * F.col("d")).alias("sd2"),
    )
    return agg.select(
        "query_id",
        "n",
        (
            F.lit(1.0)
            - (F.lit(6.0) * F.col("sd2").cast("double"))
            / (
                F.col("n").cast("double")
                * (
                    F.col("n").cast("double") * F.col("n").cast("double")
                    - F.lit(1.0)
                )
            )
        ).alias("spearman_rho"),
    ).orderBy("query_id")


def isotropy(
    df: DataFrame, id_col: str, label_col: str, vec_col: str
) -> DataFrame:
    """E36 — embedding-space isotropy audit, per label plus an
    overall row (label -1): ||mean(unit vector)||^2 (0 = perfectly
    spread, 1 = all vectors collinear) and the implied mean pairwise
    cosine (S - n)/(n(n-1)) where S = ||sum(unit)||^2. Anisotropy —
    embeddings huddling in a narrow cone — is the classic
    representation-degeneration symptom (Ethayarajh 2019) that makes
    cosine thresholds misleading; this is the one-number check run
    before picking any dedup/ANN threshold.

    Exactness: per-vector norms fold floor(x*x*1e12) ints; unit
    components quantize to floor(u*1e9) ints whose per-(label,dim)
    sums are exact; S folds per-dim micro-quantized squares
    floor((sq/1e9)^2 * 1e6) — keeping the fold result below 2^53 so
    the int->double readout is EXACT in both engines (a raw sq^2
    fold lands in DuckDB's HUGEINT->double two-step rounding and
    drifts); readouts are fixed-order double expressions.

    Plan: one posexplode (corpus x dims rows), a per-vector window
    (partition = one vector, never corpus-sized), one (label, dim)
    partial-agg shuffle bounded by |labels| x dims, and label-count
    joins on dimension-bounded frames. The overall row re-aggregates
    the per-(label,dim) integer sums — no second corpus pass.
    """
    dims = df.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("dim", "xf"),
    ).select("vid", "label", "dim", F.col("xf").cast("double").alias("x"))
    w = Window.partitionBy("vid")
    units = dims.select(
        "label",
        "dim",
        F.floor(
            F.col("x")
            / F.sqrt(
                F.sum(
                    F.floor(F.col("x") * F.col("x") * F.lit(1e12)).cast(
                        "bigint"
                    )
                )
                .over(w)
                .cast("double")
                / F.lit(1e12)
            )
            * F.lit(1e9)
        )
        .cast("bigint")
        .alias("qu"),
    )
    perdim = units.groupBy("label", "dim").agg(F.sum("qu").alias("sq"))
    q2 = lambda c: F.floor(
        (F.col(c).cast("double") / F.lit(1e9))
        * (F.col(c).cast("double") / F.lit(1e9))
        * F.lit(1e6)
    ).cast("bigint")
    perlab = perdim.groupBy("label").agg(F.sum(q2("sq")).alias("s"))
    tot = (
        perdim.groupBy("dim")
        .agg(F.sum("sq").alias("st"))
        .agg(F.sum(q2("st")).alias("s"))
        .select(F.lit(-1).alias("label"), "s")
    )
    counts = (
        df.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .unionAll(
            df.agg(F.count(F.lit(1)).cast("bigint").alias("n")).select(
                F.lit(-1).alias("label"), "n"
            )
        )
    )
    n = F.col("n").cast("double")
    v = F.col("s").cast("double") / F.lit(1e6)
    return (
        perlab.unionAll(tot)
        .join(F.broadcast(counts), "label")
        .select(
            "label",
            "n",
            (v / (n * n)).alias("isotropy"),
            ((v - n) / (n * (n - F.lit(1.0)))).alias("mean_pair_cos"),
        )
    )


def knn_margin(
    vectors: DataFrame, id_col: str, vec_col: str, label_col: str
) -> DataFrame:
    """E37 — nearest-neighbor margin audit per label: for each
    anchor, the best same-label cosine minus the best other-label
    cosine within its LSH bucket; per class, the mean margin and the
    violation rate (margin < 0 — the nearest neighbor belongs to
    another class). The metric-learning / embedding-quality readout
    that says whether cosine separates the classes at all —
    E26 counts vote disagreement, this measures the GAP.

    Exactness: cosines follow the E2 quantized dot/norm scheme
    (identical doubles); margins fold floor(m*1e9) ints; rates are
    exact-int divisions.

    Plan: within-bucket pairs only (same bounded fanout as E2/E26 —
    never corpus²), one per-anchor aggregate, then a |labels|-row
    report.
    """
    coded = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        F.col(label_col),
        lsh_code(vec_col).alias("code"),
        norm_expr(vec_col).alias("nrm"),
    )
    a = coded.select(
        F.col(id_col).alias("vec_id_a"), F.col(vec_col).alias("va"),
        F.col(label_col).alias("la"), "code", F.col("nrm").alias("na"),
    )
    b = coded.select(
        F.col(id_col).alias("vec_id_b"), F.col(vec_col).alias("vb"),
        F.col(label_col).alias("lb"), "code", F.col("nrm").alias("nb"),
    )
    pairs = (
        a.join(b, "code")
        .where(F.col("vec_id_a") != F.col("vec_id_b"))
        .withColumn(
            "cosine", dot_expr("va", "vb") / (F.col("na") * F.col("nb"))
        )
    )
    per_anchor = pairs.groupBy("vec_id_a", "la").agg(
        F.max(
            F.when(F.col("lb") == F.col("la"), F.col("cosine"))
        ).alias("best_same"),
        F.max(
            F.when(F.col("lb") != F.col("la"), F.col("cosine"))
        ).alias("best_other"),
    )
    both = per_anchor.where(
        F.col("best_same").isNotNull() & F.col("best_other").isNotNull()
    ).withColumn(
        "qm",
        F.floor(
            (F.col("best_same") - F.col("best_other")) * F.lit(1e9)
        ).cast("bigint"),
    )
    return (
        both.groupBy(F.col("la").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_anchors"),
            F.sum("qm").alias("sm"),
            F.sum(F.when(F.col("qm") < 0, F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_viol"),
        )
        .select(
            "label",
            "n_anchors",
            (
                F.col("sm").cast("double")
                / F.col("n_anchors").cast("double")
                / F.lit(1e9)
            ).alias("mean_margin"),
            (
                F.col("n_viol").cast("double")
                / F.col("n_anchors").cast("double")
            ).alias("violation_rate"),
        )
        .orderBy("label")
    )


def cosine_label_pr_curve(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    thresholds: tuple = (0.5, 0.6, 0.7, 0.8, 0.9),
) -> DataFrame:
    """E38 — cosine-threshold calibration against labels: within LSH
    buckets, score every pair, treat same-label as ground truth, and
    report precision/recall/F1 of "cosine >= t means same class" for
    each candidate threshold. The eyes-open way to pick the cosine
    cut that E5/E15 curves assume — run it before hard-coding 0.8
    into any dedup or clustering config.

    Exactness: cosines follow the E2 quantized scheme; tp/fp/fn are
    exact pair counts; P/R/F1 are single exact-int divisions (F1 in
    its 2tp/(2tp+fp+fn) one-division form).

    Plan: bucket-bounded pairs (E2's fanout), one explode by the
    fixed threshold array, one |thresholds|-row aggregate.
    """
    coded = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        F.col(label_col),
        lsh_code(vec_col).alias("code"),
        norm_expr(vec_col).alias("nrm"),
    )
    a = coded.select(
        F.col(id_col).alias("ia"), F.col(vec_col).alias("va"),
        F.col(label_col).alias("la"), "code", F.col("nrm").alias("na"),
    )
    b = coded.select(
        F.col(id_col).alias("ib"), F.col(vec_col).alias("vb"),
        F.col(label_col).alias("lb"), "code", F.col("nrm").alias("nb"),
    )
    pairs = (
        a.join(b, "code")
        .where(F.col("ia") < F.col("ib"))
        .select(
            (F.col("la") == F.col("lb")).alias("same"),
            (dot_expr("va", "vb") / (F.col("na") * F.col("nb"))).alias(
                "cosine"
            ),
        )
    )
    tarr = F.array(*[F.lit(float(t)) for t in thresholds])
    scored = pairs.select(
        "same", "cosine", F.explode(tarr).alias("threshold")
    )
    agg = scored.groupBy("threshold").agg(
        F.sum(
            F.when(F.col("same") & (F.col("cosine") >= F.col("threshold")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("tp"),
        F.sum(
            F.when(
                ~F.col("same") & (F.col("cosine") >= F.col("threshold")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("fp"),
        F.sum(
            F.when(F.col("same") & (F.col("cosine") < F.col("threshold")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("fn"),
    )
    def safe(num, den):
        return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(
            F.lit(0.0)
        )

    return agg.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        safe(F.col("tp"), F.col("tp") + F.col("fp")).alias("precision"),
        safe(F.col("tp"), F.col("tp") + F.col("fn")).alias("recall"),
        safe(
            F.lit(2) * F.col("tp"),
            F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn"),
        ).alias("f1"),
    ).orderBy("threshold")


def quantization_sweep(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    bits_levels: tuple = (1, 2, 4, 8),
    vrange: float = 0.75,
) -> DataFrame:
    """E39 — scalar-quantization sweep: for each bit width, uniformly
    quantize every component into 2^b levels over [-vrange, vrange]
    and report reconstruction RMSE and the mean cosine between
    original and reconstructed vectors. The storage-vs-fidelity
    sizing table read before committing an index format — E6 applies
    ONE quantizer, this compares the ladder (and shows where cosine
    survives 4x compression).

    Exactness: codes are exact integer floors of a fixed-order
    affine map; reconstruction is the same closed form in both
    engines; error/dot/norm folds quantize per term to 1e12 ints;
    readouts are single divisions (cosines pre-snap to 1e-9).

    Plan: one posexplode (corpus x dims), a fixed 4-way explode by
    bit width, one (bits, vector) aggregate then a 4-row rollup —
    two bounded shuffles, no joins beyond the bit array.
    """
    dims = df.select(
        F.col(id_col).alias("vid"),
        F.posexplode(vec_col).alias("dim", "xf"),
    ).select("vid", F.col("xf").cast("double").alias("x"))
    barr = F.array(*[F.lit(int(b)) for b in bits_levels])
    fan = dims.select("vid", "x", F.explode(barr).alias("bits"))
    levels = F.pow(F.lit(2.0), F.col("bits").cast("double"))
    step = F.lit(2.0 * vrange) / levels
    code = F.least(
        levels - F.lit(1.0),
        F.greatest(
            F.lit(0.0), F.floor((F.col("x") + F.lit(vrange)) / step)
        ),
    )
    recon = F.lit(-vrange) + (code + F.lit(0.5)) * step
    scored = fan.select(
        "vid",
        "bits",
        F.floor((F.col("x") - recon) * (F.col("x") - recon) * F.lit(1e12))
        .cast("bigint")
        .alias("qerr"),
        F.floor(F.col("x") * recon * F.lit(1e12)).cast("bigint").alias("qdot"),
        F.floor(F.col("x") * F.col("x") * F.lit(1e12))
        .cast("bigint")
        .alias("qxx"),
        F.floor(recon * recon * F.lit(1e12)).cast("bigint").alias("qrr"),
    )
    per_vec = scored.groupBy("bits", "vid").agg(
        F.count(F.lit(1)).cast("bigint").alias("d"),
        F.sum("qerr").alias("se"),
        F.sum("qdot").alias("sd"),
        F.sum("qxx").alias("sx"),
        F.sum("qrr").alias("sr"),
    )
    cos = F.col("sd").cast("double") / (
        F.sqrt(F.col("sx").cast("double")) * F.sqrt(F.col("sr").cast("double"))
    )
    qcos = F.floor(cos * F.lit(1e9)).cast("bigint")
    out = per_vec.select(
        "bits", "d", "se", qcos.alias("qc")
    ).groupBy("bits").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum("se").alias("sse"),
        F.sum("d").alias("nd"),
        F.sum("qc").alias("sqc"),
    )
    return out.select(
        F.col("bits").cast("int").alias("bits"),
        "n_vectors",
        F.sqrt(
            F.col("sse").cast("double") / F.col("nd").cast("double") / F.lit(1e12)
        ).alias("rmse"),
        (
            F.col("sqc").cast("double")
            / F.col("n_vectors").cast("double")
            / F.lit(1e9)
        ).alias("mean_cosine"),
    ).orderBy("bits")


def norm_quality_deciles(
    df: DataFrame, id_col: str, vec_col: str, label_col: str
) -> DataFrame:
    """E40 — does embedding norm track quality? Vectors rank into
    norm deciles (deterministic (norm, id) NTILE) and each decile
    reports its label-distribution entropy. Broken/degenerate
    encodings often pile into the norm tails with label soup —
    E9 flags 3-sigma outliers, this profiles the whole range.

    Exactness: norms use the quantized E2 scheme (identical
    doubles); the NTILE order is total; entropy folds micro-nat
    ints (entropy_by_group's scheme).

    Plan: one norm projection, one NTILE window over the corpus-
    bounded (id, norm) frame, a (decile, label) aggregate, then a
    10-row report.
    """
    normed = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        norm_expr(vec_col).alias("nrm"),
    )
    from icecube_spark.operators.pipeline import distributed_ntile

    deciled = distributed_ntile(normed, ["nrm", "id"], 10, tile_col="decile")
    cells = deciled.groupBy("decile", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wd = Window.partitionBy("decile")
    cells = cells.withColumn("tot", F.sum("n").over(wd)).withColumn(
        "qlp",
        F.floor(
            F.log(F.col("n").cast("double") / F.col("tot").cast("double"))
            * F.lit(1e6)
        ).cast("bigint"),
    )
    mean_norm = deciled.groupBy("decile").agg(
        (
            F.sum(F.floor(F.col("nrm") * F.lit(1e9)).cast("bigint")).cast(
                "double"
            )
            / F.count(F.lit(1)).cast("double")
            / F.lit(1e9)
        ).alias("mean_norm")
    )
    agg = cells.groupBy("decile").agg(
        F.max("tot").cast("bigint").alias("n_vectors"),
        F.count(F.lit(1)).cast("bigint").alias("n_labels"),
        F.sum(F.col("n") * F.col("qlp")).alias("sum_nqlp"),
    )
    return (
        agg.join(F.broadcast(mean_norm), "decile")
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_vectors",
            "mean_norm",
            "n_labels",
            (
                -F.col("sum_nqlp").cast("double")
                / F.col("n_vectors").cast("double")
                / F.lit(1e6)
            ).alias("label_entropy"),
        )
        .orderBy("decile")
    )


def knn_hubness(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    sample_pred,
    k_neighbors: int = 5,
) -> DataFrame:
    """E42 — hubness profile of the k-NN graph: how unevenly do
    vectors appear in OTHER vectors' top-k lists? The in-degree
    ("k-occurrence") distribution is the standard high-dimensionality
    diagnostic — a long tail of hub points predicts both degraded
    ANN recall and label noise amplification in k-NN classifiers
    (E3), so this is the health check to run before trusting either.

    Output: one row per observed in-degree with the number of sample
    vectors at that degree (0 = anti-hubs, never retrieved).

    Plan: the sample self-join is broadcast on one side and bounded
    by the sample predicate squared; ranking uses the flat codegen
    dot; the histogram is two tiny aggregates.
    """
    sample = vectors.where(sample_pred).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        norm_expr(vec_col).alias("nrm"),
    )
    q = sample.select(
        F.col("vid").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    pairs = q.join(
        F.broadcast(sample), F.col("vid") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        (dot_expr("qv", "v") / (F.col("qn") * F.col("nrm"))).alias("cosine"),
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    topk = pairs.withColumn("rank", F.row_number().over(wr)).where(
        F.col("rank") <= k_neighbors
    )
    indeg = topk.groupBy("neighbor_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("in_degree")
    )
    degrees = sample.select("vid").join(
        indeg, F.col("vid") == F.col("neighbor_id"), "left"
    ).select(F.coalesce(F.col("in_degree"), F.lit(0)).alias("in_degree"))
    return (
        degrees.groupBy("in_degree")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"))
        .orderBy("in_degree")
    )


def distance_concentration(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    sample_pred,
    dims: tuple[int, ...] = (8, 16, 32, 64),
) -> DataFrame:
    """E43 — distance-concentration diagnostic: as dimensionality
    grows, pairwise distances concentrate (std/mean shrinks) and
    nearest-neighbor contrast evaporates — the curse-of-
    dimensionality effect that, together with hubness (E42), decides
    whether an ANN index at a given truncation (E-matryoshka) can
    work at all. Reports mean, std, and coefficient of variation of
    pairwise cosine distance at each prefix width.

    Exactness: distances quantize to nano-units before the moment
    folds; the sqrt argument is clamped at zero like every moment
    chain in this repo.

    Plan: one bounded sample self-join (i < j), a 4-way dim fanout in
    the same projection (no re-join), one aggregate per dim. The
    per-width quantized distances are projected as PLAIN COLUMNS
    before the explode: folding all four unrolled dot/norm chains
    (~360 multiply terms at widths 8+16+32+64) into the Generate's
    input expression grows its generated doConsume past Janino's
    64 KB method limit and the whole stage silently falls back to
    interpreted mode — per-column projection lets codegen split one
    method per width, keeping the hot path compiled.
    """
    sample = vectors.where(sample_pred).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    )
    b = sample.select(F.col("vid").alias("wid"), F.col("v").alias("w"))
    pairs = sample.join(F.broadcast(b), F.col("vid") < F.col("wid"))
    dq = {
        d: F.floor(
            (
                F.lit(1.0)
                - dot_expr("v", "w", d)
                / (norm_expr("v", d) * norm_expr("w", d))
            )
            * F.lit(1e9)
        ).cast("bigint")
        for d in dims
    }
    scored = pairs.select(
        *[dq[d].alias(f"__dq_{d}") for d in dims]
    )
    per_dim = scored.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("dim"),
                        F.col(f"__dq_{d}").alias("dq"),
                    )
                    for d in dims
                ]
            )
        ).alias("s")
    ).select(F.col("s.dim").alias("dim"), F.col("s.dq").alias("dq"))
    mom = per_dim.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("dq").alias("sx"),
        F.sum(F.col("dq").cast("decimal(38,0)") * F.col("dq")).alias("sxx"),
    )
    n = F.col("n_pairs").cast("double")
    mean = F.col("sx").cast("double") / F.lit(1e9) / n
    std = (
        F.sqrt(
            F.greatest(
                n * (F.col("sxx").cast("double") / F.lit(1e18))
                - (F.col("sx").cast("double") / F.lit(1e9))
                * (F.col("sx").cast("double") / F.lit(1e9)),
                F.lit(0.0),
            )
        )
        / n
    )
    return mom.select(
        "dim",
        "n_pairs",
        mean.alias("mean_dist"),
        std.alias("std_dist"),
        (std / mean).alias("cv"),
    ).orderBy("dim")


def anchor_margin_deciles(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    n_anchors: int = 8,
    dim: int | None = EMBED_DIM,
) -> DataFrame:
    """E46 — quantization-confidence margins: for every vector, the
    relative gap between its nearest and second-nearest anchor
    (margin = (d2-d1)/(d1+d2), 0 = ambiguous, ->1 = decisive),
    bucketed into deciles. The margin histogram is the health read an
    IVF/PQ deployment checks before trusting a coarse quantizer: a
    mass near 0 means assignments flip under noise and recall decays.

    Exactness: distances are the quantized-integer folds (_QDIST);
    the margin divides two exact BIGINTs in IEEE doubles; per-bucket
    means fold floor(margin*1e6) integers.

    Plan: anchors broadcast (n_anchors rows); one map-side distance
    fan-out, one (id) min-2 window bounded by n_anchors, one 10-row
    aggregate. The corpus never shuffles beyond its id groups.

    `dim` is the unrolled fold width and MUST equal the vector width
    (pass dim=None for the generic HOF fold on unknown widths).
    """
    anchors = vectors.where(F.col(id_col) < n_anchors).select(
        F.col(id_col).cast("int").alias("aid"),
        F.col(vec_col).alias("avec"),
    )
    qd = qdist_expr(vec_col, "avec", dim=dim)
    d = (
        vectors.select(id_col, vec_col)
        .crossJoin(F.broadcast(anchors))
        .where(F.col(id_col) != F.col("aid"))
        .withColumn("qd", qd)
    )
    w = Window.partitionBy(id_col).orderBy("qd", "aid")
    best2 = (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .groupBy(id_col)
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("qd"))).alias("d1"),
            F.max(F.when(F.col("rn") == 2, F.col("qd"))).alias("d2"),
        )
        .where(F.col("d2").isNotNull())
    )
    margin = (
        (F.col("d2") - F.col("d1")).cast("double")
        / F.greatest(F.col("d1") + F.col("d2"), F.lit(1)).cast("double")
    )
    scored = best2.select(
        F.least(F.lit(9), F.floor(margin * F.lit(10.0))).cast("int").alias("decile"),
        F.floor(margin * F.lit(1e6)).cast("bigint").alias("mq"),
    )
    return (
        scored.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            (
                F.sum("mq").cast("double")
                / F.count(F.lit(1)).cast("double") / F.lit(1e6)
            ).alias("mean_margin"),
        )
        .orderBy("decile")
    )
