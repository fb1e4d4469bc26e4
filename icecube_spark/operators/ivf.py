"""IVF (inverted-file) approximate nearest neighbor (SURVEY §2 E2
scale path).

The 100 TB ANN design: cluster the corpus once with MLlib KMeans
(the IVF "coarse quantizer"), store each vector bucketed by its
nearest centroid, and at query time probe only the `nprobe` closest
clusters — the corpus-side join touches nprobe/k of the data instead
of all of it. KMeans is iterative (not SQL-expressible), so the
driver records a rows-only check; tests assert recall against the
brute-force oracle path instead.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from icecube_spark.operators.similarity import dot_expr, norm_expr


def build_ivf_index(
    vectors: DataFrame, id_col: str, vec_col: str, k: int = 16, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Fit the coarse quantizer and assign every vector to a cluster.

    Returns (assigned, centroids): `assigned` = vectors + cluster id
    (at scale: write out partitioned/bucketed by cluster), `centroids`
    = k rows broadcastable to every probe.
    """
    ml = vectors.withColumn("features", array_to_vector(F.col(vec_col).cast("array<double>")))
    ml.persist()
    # random init: k-means|| costs ~5 extra corpus passes and an IVF
    # coarse quantizer doesn't need optimal centers — recall is gated
    # by the nprobe search, asserted in tests/test_scale_paths.py;
    # 4 iterations suffice for a coarse quantizer (each is a full
    # corpus pass — the dominant cost of index build)
    model = KMeans(
        k=k, seed=seed, maxIter=4, initMode="random",
        featuresCol="features", predictionCol="cluster",
    ).fit(ml)
    assigned = model.transform(ml).select(id_col, vec_col, "cluster")
    centroids = vectors.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        ["cluster", "centroid"],
    )
    return assigned, centroids


def ivf_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    query_filter,
    k_neighbors: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """Probe the nprobe nearest clusters per query, exact cosine
    within them. Plan shape: tiny (query x centroid) broadcast pick,
    then a broadcast hash join of queries onto ONLY their probed
    clusters — the corpus never shuffles and only nprobe/k of it is
    scanned per query."""
    assigned, centroids = build_ivf_index(vectors, id_col, vec_col, k=n_clusters)

    queries = vectors.where(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_expr(vec_col).alias("qn"),
    )
    # rank clusters per query by centroid cosine
    qc = queries.crossJoin(
        F.broadcast(centroids.withColumn("c_nrm", norm_expr("centroid")))
    ).withColumn("c_cos", dot_expr("qv", "centroid") / (F.col("qn") * F.col("c_nrm")))
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_cos"), F.asc("cluster"))
    probes = (
        qc.withColumn("r", F.row_number().over(wq))
        .where(F.col("r") <= nprobe)
        .select("query_id", "qv", "qn", "cluster")
    )

    cands = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm_expr(vec_col).alias("cn"),
        "cluster",
    )
    scored = (
        cands.join(F.broadcast(probes), "cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot_expr("qv", "cv") / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_neighbors)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )
