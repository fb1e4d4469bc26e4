"""IVF (inverted-file) approximate nearest neighbor (SURVEY §2 E2
scale path, reference parity: the reference has no ANN operator — this
is the LLM-pipeline extension surface).

The 100 TB ANN design: cluster the corpus once with a coarse
quantizer (k-means), store each vector bucketed by its nearest
centroid, and at query time probe only the `nprobe` closest clusters —
the corpus-side join touches nprobe/k of the data instead of all of
it.

The quantizer is an EXACT distributed Lloyd loop, not MLlib KMeans:
seeds are the vectors with id 0..k-1, every assignment uses the
quantized-integer squared distance (floor(d²·1e12) per element, BIGINT
fold — bit-identical in any engine), and centroid means reduce through
DECIMAL(18,8) — no order-dependent float math anywhere. That makes the
entire index (and everything probed from it) reproducible bit-for-bit
by a SQL oracle, so the driver can hash-check E4/E44 instead of
recording a weaker rows-only grade. It also removes MLlib's seeded-
random variance (the old KMeans build swung 3-11 s run-to-run).

Each Lloyd iteration is one corpus pass: the k·dim centroid model
inlines as literal arrays (bit-exact repr round-trip), assignment is
a MAP-ONLY array_min argmin projection (no crossJoin fanout, no
broadcast exchange, no corpus-keyed shuffle), and the only shuffle
is the (cluster, dim) partial-agg of quantized mean contributions —
≤ k·dim rows per task after map-side combine. The k·dim means come
back to the driver (model-sized, ~1 KB) and re-inline — the
canonical distributed k-means step; the corpus itself never
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from icecube_spark.operators.similarity import dot_expr, norm_expr, qdist_sql


def build_ivf_index(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    n_iter: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Fit the exact-Lloyd coarse quantizer and assign every vector.

    Returns (assigned, centroids): `assigned` = (id, vec, cluster)
    (at scale: write out partitioned/bucketed by cluster), `centroids`
    = k rows of array<double>, broadcastable to every probe.

    Seeds = the vectors with id < k (ids must cover 0..k-1 —
    validated, matching the DuckDB oracle twin's seed CTE); `n_iter`
    fixed iterations (a coarse quantizer doesn't need convergence
    detection — recall is gated by the nprobe search, asserted in
    tests/test_scale_paths.py). Empty clusters keep their previous
    centroid.
    """
    spark = vectors.sparkSession
    base = vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    seed_rows = (
        base.where(F.col("_id") < k)
        .select(
            F.col("_id").cast("int").alias("cluster"),
            F.col("_v").cast("array<double>").alias("centroid"),
        )
        .collect()
    )
    cent: dict[int, list[float]] = {
        r["cluster"]: list(r["centroid"]) for r in seed_rows
    }
    if len(cent) != k:
        raise ValueError(
            f"IVF seeding needs ids 0..{k - 1} present "
            f"(got {len(cent)} of {k} seed vectors); reindex ids first"
        )
    dim = len(next(iter(cent.values())))

    def _cdf(c: dict[int, list[float]]) -> DataFrame:
        return spark.createDataFrame(
            sorted(c.items()), "cluster int, centroid array<double>"
        )

    def _lit_arr(vals: list[float]) -> str:
        # repr() emits the shortest string that round-trips to the
        # same IEEE double, and Spark's string→double cast is Java's
        # correctly-rounded parseDouble — so the literal re-creates
        # the centroid bit-for-bit
        return (
            "array(" + ",".join(f"cast('{v!r}' as double)" for v in vals)
            + ")"
        )

    def _assign(c: dict[int, list[float]]) -> DataFrame:
        # the k·dim centroid model INLINES as literal arrays and the
        # argmin runs as one array_min over k struct(qdist, cluster)
        # terms, so assignment is a MAP-ONLY projection: no k×
        # crossJoin fanout, no broadcast exchange, and — the part that
        # matters at 100 TB — no corpus-keyed groupBy shuffle per
        # Lloyd pass. The fold is interpreted (HOFs skip codegen) but
        # that is parallel map work; the full-corpus shuffle it
        # replaces dominated at any scale. array_min over
        # struct(qd, cluster) is the same lexicographic argmin +
        # lowest-cluster tiebreak as the old min(struct(...))
        # aggregate — identical bits (tested equal). A much larger
        # quantizer (k·dim beyond ~10⁵ terms) should fall back to
        # joining a broadcast centroid table instead of literals.
        terms = ",".join(
            "struct(" + qdist_sql("_v", _lit_arr(vs))
            + f" as qd, {cid} as cluster)"
            for cid, vs in sorted(c.items())
        )
        best = F.expr(f"array_min(array({terms}))")
        return base.select(
            "_id", "_v", best.getField("cluster").alias("cluster")
        )

    # the (id, vec) projection feeds n_iter eager mean jobs — cache it
    # for the loop (the canonical iterative-ML corpus cache; released
    # before returning so the lazy final assignment doesn't pin it)
    from pyspark import StorageLevel

    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    for _ in range(n_iter):
        # one corpus pass; result is k*dim rows — model-sized collect
        means = (
            _assign(cent)
            .select("cluster", F.posexplode("_v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(
                (
                    F.sum(
                        F.col("x").cast("double").cast("decimal(18,8)")
                    ).cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias("c")
            )
            .collect()
        )
        upd: dict[int, dict[int, float]] = {}
        for r in means:
            upd.setdefault(r["cluster"], {})[r["dim"]] = r["c"]
        cent = {
            c: [upd.get(c, {}).get(d, old[d]) for d in range(dim)]
            for c, old in cent.items()
        }

    base.unpersist()
    centroids = _cdf(cent)
    assigned = _assign(cent).select(
        F.col("_id").alias(id_col),
        F.col("_v").alias(vec_col),
        "cluster",
    )
    return assigned, centroids


def probe_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    query_filter,
    k_neighbors: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Probe the nprobe nearest clusters per query, exact cosine
    within them. Plan shape: tiny (query x centroid) broadcast pick,
    then a broadcast hash join of queries onto ONLY their probed
    clusters — the corpus never shuffles and only nprobe/k of it is
    scanned per query."""
    queries = vectors.where(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_expr(vec_col).alias("qn"),
    )
    # rank clusters per query by centroid cosine
    qc = queries.crossJoin(
        F.broadcast(centroids.withColumn("c_nrm", norm_expr("centroid")))
    ).withColumn(
        "c_cos", dot_expr("qv", "centroid") / (F.col("qn") * F.col("c_nrm"))
    )
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


def ivf_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    query_filter,
    k_neighbors: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    n_iter: int = 4,
) -> DataFrame:
    """Build the IVF index and probe it in one call (E4). For repeated
    probes at different nprobe, build once with build_ivf_index and
    call probe_topk per setting — the index is the expensive part."""
    assigned, centroids = build_ivf_index(
        vectors, id_col, vec_col, k=n_clusters, n_iter=n_iter
    )
    return probe_topk(
        assigned, centroids, vectors, id_col, vec_col, query_filter,
        k_neighbors=k_neighbors, nprobe=nprobe,
    )


def probe_recall_curve(
    assigned: DataFrame,
    centroids: DataFrame,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    query_filter,
    exact: DataFrame,
    k_neighbors: int = 5,
    nprobes: tuple[int, ...] = (1, 2, 4, 8),
) -> DataFrame:
    """Recall@k of the IVF index vs an exact truth set at several
    nprobe settings, in ONE plan: candidates are scored once with
    their cluster rank attached, then a tiny broadcast nprobe table
    fans each candidate into the settings it is visible at — the
    corpus-side work (assignment join + cosine) runs once, not once
    per curve point. `exact` = (query_id, true_id) ground truth.
    """
    spark = vectors.sparkSession
    max_probe = max(nprobes)

    queries = vectors.where(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_expr(vec_col).alias("qn"),
    )
    qc = queries.crossJoin(
        F.broadcast(centroids.withColumn("c_nrm", norm_expr("centroid")))
    ).withColumn(
        "c_cos", dot_expr("qv", "centroid") / (F.col("qn") * F.col("c_nrm"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_cos"), F.asc("cluster"))
    probes = (
        qc.withColumn("r", F.row_number().over(wq))
        .where(F.col("r") <= max_probe)
        .select("query_id", "qv", "qn", "cluster", F.col("r").alias("cluster_rank"))
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
        .select(
            "query_id", "neighbor_id", "cluster_rank",
            (dot_expr("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cosine"),
        )
    )
    npdf = spark.createDataFrame([(int(n),) for n in nprobes], "nprobe int")
    expl = scored.crossJoin(F.broadcast(npdf)).where(
        F.col("cluster_rank") <= F.col("nprobe")
    )
    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    got = (
        expl.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_neighbors)
        .select("nprobe", "query_id", F.col("neighbor_id").alias("got_id"))
    )
    # explicit broadcasts: exact/hits/truth are panel-bounded
    # (|queries|·k, |nprobes|, 1 rows) but exact is a materialized
    # ExistingRDD whose stats the planner defaults to "huge", so
    # without hints all three joins fall back to SortMergeJoin
    hits = (
        got.join(
            F.broadcast(exact),
            (exact["query_id"] == got["query_id"])
            & (exact["true_id"] == got["got_id"]),
        )
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    )
    truth = exact.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    return (
        npdf.join(F.broadcast(hits), "nprobe", "left")
        .crossJoin(F.broadcast(truth))
        .select(
            "nprobe",
            "n_truth",
            F.coalesce(F.col("n_hit"), F.lit(0).cast("bigint")).alias("n_hit"),
            (
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
                / F.col("n_truth").cast("double")
            ).alias("recall_at_5"),
        )
        .orderBy("nprobe")
    )
