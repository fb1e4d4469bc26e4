"""IcecubeEngine in five lines: the single entry object a reference
user switches to.

Run: python examples/engine_demo.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from icecube_spark.engine import IcecubeEngine  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    eng = IcecubeEngine(sf_dir=sf_dir)
    eng.spark.sparkContext.setLogLevel("ERROR")

    # 1. catalog tables are lazy DataFrames
    print("lineitem rows:", eng.table("lineitem").count())

    # 2. free-form SQL over zero-copy views (pushdown intact)
    eng.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n,
               ROUND(SUM(l_extendedprice), 2) AS gross
        FROM lineitem GROUP BY 1 ORDER BY 1
        """
    ).show()

    # 3. every registered operator by name
    print(f"{len(eng.queries())} registered queries; running two:")
    eng.query("q1_pricing_summary").show(4)
    eng.query("dedup_minhash_lsh").show(4)


if __name__ == "__main__":
    main()
