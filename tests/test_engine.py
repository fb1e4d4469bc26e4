"""IcecubeEngine facade: catalog, free-form SQL, named-query registry."""

from icecube_spark.engine import IcecubeEngine


def _eng(spark, sf_dir):
    return IcecubeEngine(spark=spark, sf_dir=sf_dir)


def test_engine_sql_matches_dataframe_count(spark, sf_dir):
    eng = _eng(spark, sf_dir)
    got = eng.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"]
    assert got == eng.table("lineitem").count() > 0


def test_engine_sql_keeps_pushdown(spark, sf_dir):
    """Views over the scans must not break predicate pushdown."""
    eng = _eng(spark, sf_dir)
    df = eng.sql(
        "SELECT l_orderkey FROM lineitem WHERE l_shipdate > '1995-01-01'"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_engine_named_query_runs(spark, sf_dir):
    eng = _eng(spark, sf_dir)
    assert "q1_pricing_summary" in eng.queries()
    out = eng.query("q1_pricing_summary")
    assert out.count() > 0


def test_engine_unknown_key_raises(spark, sf_dir):
    import pytest

    with pytest.raises(KeyError):
        _eng(spark, sf_dir).query("no_such_query")
