"""Training-data pipeline operators (SURVEY §2 group P).

The corpus-management layer a 100 TB training pipeline needs around
the core dedup/similarity ops: deterministic splits and samples
(md5-keyed, so re-runs and engines agree — never `rand()`, which is
neither reproducible nor oracle-able), PII redaction, corpus-level
term statistics, exact quantile profiles, and connected-component
dedup clusters.

Everything except the (inherently iterative) connected components is
pure column algebra in whole-stage codegen; splits/samples touch each
row once with no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from icecube_spark.functions.hashing import spark_hex2int

EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def _bucket(id_col: str, n: int = 100) -> F.Column:
    """Deterministic bucket in [0, n): md5 of the id, first 60 bits.
    Same text formula evaluates identically in DuckDB, so assignment
    is oracle-checkable and stable across engines and re-runs."""
    return F.expr(f"{spark_hex2int(f'cast({id_col} as string)')} % {n}")


def train_test_split(
    df: DataFrame, id_col: str, train_pct: int = 90, val_pct: int = 5
) -> DataFrame:
    """P1 — hash-split rows into train/val/test by id. No shuffle, no
    state: the split is a pure function of the id, so adding data
    never reassigns existing rows (critical for incremental corpus
    builds — a random split would leak val rows into train on every
    append)."""
    b = _bucket(id_col)
    return df.withColumn("bucket", b.cast("int")).withColumn(
        "split",
        F.when(F.col("bucket") < train_pct, "train")
        .when(F.col("bucket") < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def stratified_sample(
    df: DataFrame, id_col: str, stratum_col: str, pct: int = 20
) -> DataFrame:
    """P2 — deterministic per-stratum sample: keep ~pct% of each
    stratum by id hash. Map-only (the stratum column just rides
    along); at 100 TB this is the scan-time corpus downsampler."""
    return df.where(_bucket(id_col) < pct)


def pii_redact(df: DataFrame, text_col: str) -> DataFrame:
    """P3 — scrub emails/phone numbers, count what was removed.
    Single regexp pass per pattern, whole-stage codegen; the counts
    feed a redaction-rate audit table."""
    # patterns go through the DSL (raw Java regex), never F.expr — the
    # SQL parser would eat one escape level and silently change them
    n_emails = F.size(F.regexp_extract_all(F.col(text_col), F.lit(EMAIL_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(F.col(text_col), F.lit(PHONE_RE), F.lit(0)))
    clean = F.regexp_replace(
        F.regexp_replace(text_col, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )
    return (
        df.withColumn("n_emails", n_emails.cast("int"))
        .withColumn("n_phones", n_phones.cast("int"))
        .withColumn("clean_text", clean)
    )


def topk_terms(
    df: DataFrame, text_col: str, norm_expr: str, k: int = 20
) -> DataFrame:
    """P4 — corpus-wide top-k terms. explode -> partial map-side
    count -> one shuffle on term -> global top-k (rank window over the
    already-tiny aggregate)."""
    terms = df.select(
        F.explode(F.expr(f"split({norm_expr.format(col=text_col)}, ' ')")).alias("term")
    )
    counts = terms.where(F.col("term") != "").groupBy("term").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy().orderBy(F.desc("n"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .orderBy("rank")
    )


def length_quantiles(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """P5 — exact per-group length profile (min/p50/p90/max/count).
    Quantiles are rank-selected (value at row ceil(q*n) in sort
    order) — pure integer semantics, so Spark and DuckDB agree
    bit-for-bit where interpolation formulas would drift. One shuffle
    on the group key; the window and aggregate share it."""
    w = Window.partitionBy(group_col).orderBy(value_col, id_col)
    ranked = df.select(
        F.col(group_col),
        F.col(value_col).cast("bigint").alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("n"),
    )
    at = lambda q: F.max(  # noqa: E731
        F.when(F.col("rn") == F.ceil(q * F.col("n")), F.col("v"))
    )
    return (
        ranked.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("v").alias("min_len"),
            at(F.lit(0.5)).alias("p50_len"),
            at(F.lit(0.9)).alias("p90_len"),
            F.max("v").alias("max_len"),
        )
        .orderBy(group_col)
    )


def connected_components(
    pairs: DataFrame, a_col: str, b_col: str, max_iter: int = 20
) -> DataFrame:
    """P6 — dedup clusters: connected components over near-dup pairs,
    labeling every doc with the min doc id of its component (the
    canonical representative to keep).

    Iterative min-label propagation: each round every node adopts the
    smallest label among itself and its neighbors; converges in
    O(component diameter) rounds — near-dup components are tiny
    (pairs of variants), so 2-3 rounds in practice. Each round is one
    distributed join + one aggregate; the driver only checks a scalar
    convergence sum, so nothing collects. At 100 TB this is the
    standard large-graph CC pattern (GraphFrames does the same joins
    underneath).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    edges.persist()
    for _ in range(max_iter):
        # label each node with min(own, neighbors') labels
        from_nbrs = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(from_nbrs, labels.node == from_nbrs.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
            )
        )
        new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    ).orderBy("doc_id")
