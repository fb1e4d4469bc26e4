"""End-to-end training-corpus curation pipeline.

Chains the engine's LLM-data operators the way a production corpus
build does — every stage is a lazy DataFrame transformation, so the
whole pipeline is ONE Spark job graph with no driver-side loops:

  1. quality gates     (P25 rules + F24 blocklist -> keep mask)
  2. exact dedup       (D1 md5 clusters -> canonical rows)
  3. near-dup clusters (D2 MinHash-LSH pairs -> P6 components)
     + P35 sketch F1 sign-off before trusting the sketch decisions
  4. PII redaction     (P3)
  5. hash split        (P1 train/val/test)
  6. temperature mix   (P29 acceptance sampling)
  7. packing manifest  (P24 token bins)

Run: python examples/corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from icecube_spark import catalog  # noqa: E402
from icecube_spark.operators import dedup, pipeline  # noqa: E402
from icecube_spark.session import get_spark  # noqa: E402


def curate(spark, sf_dir: str):
    docs = catalog.load(spark, sf_dir, "documents")

    # 1. quality gates: codegen column math, map-only — length rules
    # plus the F24 token-exact blocklist verdict
    from icecube_spark.operators import text as text_ops

    norm = pipeline.normalized_expr("text")
    flagged = text_ops.blocklist_filter(docs, "doc_id", "text").where(
        F.col("verdict") == "flag"
    ).select("doc_id")
    gated = docs.join(flagged, "doc_id", "left_anti").where(
        (F.col("n_chars") >= 100)
        & (F.size(F.split(F.expr(norm), " ")) >= 20)
    )

    # 2. exact dedup: keep cluster canonicals only
    exact = dedup.exact_dedup(gated, "doc_id", "text")
    canon = exact.where(F.col("doc_id") == F.col("canonical_id")).select(
        "doc_id"
    )
    gated = gated.join(canon, "doc_id")

    # 3. near-dup components: drop every non-canonical member
    pairs = dedup.minhash_lsh_pairs(gated, "doc_id", "text", threshold=0.8)
    comps = pipeline.connected_components(pairs, "doc_a", "doc_b")
    losers = comps.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    deduped = gated.join(losers, "doc_id", "left_anti")

    # 4. PII scrub
    clean = pipeline.pii_redact(deduped, "text").drop("text").withColumnRenamed(
        "clean_text", "text"
    )

    # 5. deterministic split
    split = pipeline.train_test_split(clean, "doc_id")

    # 6. temperature sampling toward the t=0.5 source mix
    probs = pipeline.weighted_sample(split, "doc_id", "source").select(
        "source", "p_q5"
    )
    h = ((F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)) % 100000
    sampled = split.join(F.broadcast(probs), "source").where(h < F.col("p_q5"))

    # 7. packing manifest for the train split
    manifest = pipeline.sequence_packing(
        sampled.where(F.col("split") == "train"), "doc_id", "text", "source"
    )
    return sampled, manifest


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    sampled, manifest = curate(spark, sf_dir)
    n_in = catalog.load(spark, sf_dir, "documents").count()
    n_out = sampled.count()
    print(f"docs in: {n_in}  kept after curation: {n_out}")
    print("split mix:")
    sampled.groupBy("split").count().orderBy("split").show()
    print("packing manifest (first bins):")
    manifest.orderBy("source", "bin").show(10, truncate=False)
    print("sketch sign-off (P35: MinHash decision F1 at the 0.8 gate):")
    from icecube_spark.queries import llm_queries as lq
    lq.minhash_eval_f1(spark, sf_dir).show()
    spark.stop()


if __name__ == "__main__":
    main()
