"""User-facing facade: one object bundling session, catalog, free-form
SQL, and the full named-query registry.

The reference exposes its engine through a handful of entry objects
(IceyeProcessGenerateCube in generate_cube.py, Datacube in
datacube.py); this is the tabular-engine equivalent — the object a
user holds to run anything the engine can do:

    eng = IcecubeEngine(sf_dir="/data/sf0.1")
    eng.table("lineitem")                      # lazy DataFrame
    eng.sql("SELECT COUNT(*) FROM orders")     # free-form Spark SQL
    eng.query("q1_pricing_summary")            # any SURVEY §2 key
    eng.queries()                              # what's available

Free-form SQL runs against temp views registered straight over the
parquet scans, so Catalyst keeps predicate pushdown and column
pruning — the views add no materialization and no copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from icecube_spark import catalog
from icecube_spark.session import get_spark


class IcecubeEngine:
    def __init__(
        self,
        spark: SparkSession | None = None,
        sf_dir: str = catalog.DEFAULT_SF_DIR,
    ) -> None:
        self.spark = spark or get_spark("icecube-engine")
        self.sf_dir = sf_dir
        self._views_registered = False

    # -- catalog ----------------------------------------------------
    def table(self, name: str) -> DataFrame:
        """Lazy DataFrame over one catalog table."""
        return catalog.load(self.spark, self.sf_dir, name)

    def register_views(self) -> None:
        """Expose every catalog table as a temp view (idempotent)."""
        if self._views_registered:
            return
        for name in catalog.TABLES:
            self.table(name).createOrReplaceTempView(name)
        self._views_registered = True

    # -- query surfaces ---------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """Free-form Spark SQL over the catalog views."""
        self.register_views()
        return self.spark.sql(query)

    def queries(self) -> list[str]:
        """Names of every registered engine query (SURVEY §2 keys)."""
        return list(self._registry())

    def query(self, key: str) -> DataFrame:
        """Run a registered engine query by key."""
        reg = self._registry()
        if key not in reg:
            raise KeyError(
                f"unknown query {key!r}; see IcecubeEngine.queries()"
            )
        return reg[key](self.spark, self.sf_dir)

    @staticmethod
    def _registry():
        # imported lazily: the registry pulls in every query module
        import __spark_entry__ as entry

        return entry.queries()
