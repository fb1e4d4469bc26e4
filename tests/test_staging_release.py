"""Staging-layer cache ownership (llm_queries.staged_* persists):
per-corpus release and full clear return the executor cache to its
baseline — a long-lived session walking many corpora must not accrete
one persisted table set per sf_dir."""

from icecube_spark.queries import llm_queries as lq

SF = "/root/testdata/sf0.001"


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _persisted_ids(spark) -> set:
    # track IDs, not counts: Spark's async ContextCleaner may
    # concurrently drop checkpoint RDDs left by OTHER tests in the
    # shared session (the r9 bounded-intermediate checkpoints made
    # this common), so totals can shrink while staging is ADDING
    # persists — set differences against the baseline are immune
    return {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


def test_release_staging_returns_cache_to_baseline(spark):
    lq.clear_staging()
    base_ids = _persisted_ids(spark)

    grams, sigs = lq.staged_corpus(spark, SF)
    grams.count()  # materialize the persists
    pairs = lq.staged_minhash_pairs(spark, SF)
    pairs.count()
    assert _persisted_ids(spark) - base_ids
    assert SF in lq._STAGED and SF in lq._STAGED_MH_PAIRS

    lq.release_staging(SF)
    assert SF not in lq._STAGED
    assert SF not in lq._STAGED_COLLAPSE
    assert SF not in lq._STAGED_MH_PAIRS
    # id-set difference, not counts: what matters is that OUR staged
    # persists are gone (no NEW id survives the release)
    assert not (_persisted_ids(spark) - base_ids)

    # releasing one corpus must not touch another's entries
    lq.staged_corpus(spark, SF)
    lq.release_staging("/nonexistent/sfX")
    assert SF in lq._STAGED
    lq.clear_staging()
    assert not (_persisted_ids(spark) - base_ids)


def test_release_staging_clears_copurchase_store(spark):
    from icecube_spark.queries import analytics as an

    lq.clear_staging()
    base_ids = _persisted_ids(spark)
    staged = an.staged_copurchase(spark, SF)
    staged.pairs.count()
    staged.edges2.count()
    assert SF in an._STAGED_COPURCHASE
    assert _persisted_ids(spark) - base_ids

    # the llm-side entry points own this store too
    lq.release_staging(SF)
    assert SF not in an._STAGED_COPURCHASE
    assert not (_persisted_ids(spark) - base_ids)

    an.staged_copurchase(spark, SF)
    lq.clear_staging()
    assert not an._STAGED_COPURCHASE
    assert not (_persisted_ids(spark) - base_ids)


def test_release_staging_clears_threshold_keyed_pairs(spark):
    lq.clear_staging()
    lq.staged_jaccard_pairs(spark, SF, 0.8).count()
    assert any(k[0] == SF for k in lq._STAGED_PAIRS)
    lq.release_staging(SF)
    assert not any(k[0] == SF for k in lq._STAGED_PAIRS)
    lq.clear_staging()


def test_staging_stale_detects_foreign_session(spark):
    """A cached entry bound to another SparkSession (or holding no
    usable handle at all) must read as stale so the stores rebuild
    instead of handing consumers dead py4j references."""
    from icecube_spark.session import staging_stale

    df = spark.range(3)
    assert staging_stale(df, spark) is False
    assert staging_stale((df, df), spark) is False  # tuple entries
    other = spark.newSession()
    assert staging_stale(df, other) is True
    assert staging_stale(object(), spark) is True  # no session handle
