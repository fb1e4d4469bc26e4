"""DuckDB oracle SQL for SURVEY §2 group B (twin of analytics.py).

Every aggregate follows the parity rule from functions/parity.py:
reductions in DECIMAL(18,8), cast back to DOUBLE — bit-exact across
engines. Aliases match the Spark column names exactly (the driver
hashes by sorted column name).
"""

from icecube_spark.functions.parity import sql_davg, sql_dsum, sql_qsum

ORACLES: dict[str, str] = {
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_quantity')} AS sum_qty,
               {sql_dsum('l_extendedprice')} AS sum_base_price,
               {sql_qsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
               {sql_qsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
               {sql_davg('l_quantity')} AS avg_qty,
               {sql_davg('l_extendedprice')} AS avg_price,
               {sql_davg('l_discount')} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": f"""
        SELECT l_orderkey, o_orderdate,
               {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "q5_local_supplier": f"""
        SELECT n_name,
               {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "q6_forecast_revenue": f"""
        SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "top_parts_by_revenue": f"""
        WITH by_part AS (
            SELECT p_brand, p_partkey, p_name,
                   {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand, p_partkey, p_name
        )
        SELECT p_brand, p_partkey, p_name, revenue, brand_rank
        FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (
                PARTITION BY p_brand ORDER BY revenue DESC, p_partkey ASC
            ) AS INT) AS brand_rank
            FROM by_part
        )
        WHERE brand_rank <= 3
        ORDER BY p_brand, brand_rank
    """,
}

ORACLES.update({
    "q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "q13_customer_distribution": """
        SELECT c_count, COUNT(*) AS custdist FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                 AND o_orderpriority != '1-URGENT'
            GROUP BY c_custkey)
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    "q14_promo_revenue": f"""
        SELECT 100.0 * {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
               / {sql_dsum('l_extendedprice * (1 - l_discount)')} AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
    "q18_large_orders": f"""
        WITH big AS (
            SELECT l_orderkey, {sql_dsum('l_quantity')} AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING {sql_dsum('l_quantity')} > 350)
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
})

ORACLES.update({
    "q7_volume_shipping": f"""
        SELECT supp_nation, cust_nation, l_year,
               {sql_dsum('volume')} AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q8_market_share": f"""
        SELECT o_year,
               nation_volume / total_volume AS mkt_share,
               nation_volume, total_volume
        FROM (
            SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                   {sql_dsum("CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS nation_volume,
                   {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_volume
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
              AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
            GROUP BY 1
        ) shares
        ORDER BY o_year
    """,
    "q12_ship_delay": """
        SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                    THEN 'SLOW' ELSE 'FAST' END AS ship_bucket,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY 1
    """,
    "q15_top_supplier": f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY 1)
        SELECT s_suppkey, s_name, total_revenue
        FROM revenue JOIN supplier ON supplier_no = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    "q17_small_quantity": f"""
        WITH li AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#1' AND p_size < 10),
        avg_qty AS (
            SELECT l_partkey AS ap_key,
                   {sql_davg('l_quantity')} * 0.5 AS half_avg_qty
            FROM li GROUP BY 1)
        SELECT {sql_dsum('l_extendedprice')} / 7.0 AS avg_yearly
        FROM li JOIN avg_qty ON l_partkey = ap_key
        WHERE l_quantity < half_avg_qty
    """,
    "q19_disjunctive_revenue": f"""
        SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q21_waiting_supplier": """
        WITH per_order AS (
            SELECT l_orderkey, l_suppkey,
                   MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
                            THEN 1 ELSE 0 END) AS supp_late
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
            GROUP BY 1, 2),
        order_stats AS (
            SELECT l_orderkey, COUNT(*) AS n_supps, SUM(supp_late) AS n_late_supps
            FROM per_order GROUP BY 1)
        SELECT s_name, COUNT(*) AS numwait
        FROM per_order
        JOIN order_stats USING (l_orderkey)
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE supp_late = 1 AND n_supps > 1 AND n_late_supps = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    "q22_global_sales": f"""
        WITH cust AS (
            SELECT * FROM customer WHERE c_nationkey IN (1,2,3,4,5,6,7)),
        avg_bal AS (
            SELECT {sql_davg('c_acctbal')} AS avg_bal
            FROM cust WHERE c_acctbal > 0.0)
        SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
               {sql_dsum('c_acctbal')} AS totacctbal
        FROM cust, avg_bal
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY 1 ORDER BY 1
    """,
})

_COST_SQL = "CAST((l_partkey * 7 + l_suppkey * 13) % 10000 + 100 AS DOUBLE) / CAST(100 AS DOUBLE)"
_AVAIL_SQL = "CAST((l_partkey + l_suppkey) % 50 + 1 AS INT)"
_SUPPLIES = f"""supplies AS (
            SELECT l_partkey, l_suppkey,
                   {_COST_SQL} AS cost, {_AVAIL_SQL} AS avail
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))"""

ORACLES.update({
    "q2_min_cost_supplier": f"""
        WITH {_SUPPLIES},
        sup AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'),
        cand AS (
            SELECT p_partkey, p_name, cost, s_name, n_name, s_acctbal,
                   ROW_NUMBER() OVER (
                       PARTITION BY p_partkey
                       ORDER BY cost ASC, s_suppkey ASC) AS rn
            FROM supplies
            JOIN part ON l_partkey = p_partkey AND p_size = 15
            JOIN sup ON l_suppkey = s_suppkey)
        SELECT p_partkey, p_name, cost, s_name, n_name, s_acctbal
        FROM cand WHERE rn = 1
        ORDER BY s_acctbal DESC, p_partkey LIMIT 100
    """,
    "q9_product_profit": f"""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               {sql_dsum(f"l_extendedprice * (1 - l_discount) - ({_COST_SQL}) * l_quantity")} AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """,
    "q11_important_stock": f"""
        WITH {_SUPPLIES},
        held AS (
            SELECT l_partkey, cost * avail AS value
            FROM supplies
            JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = 3),
        per_part AS (
            SELECT l_partkey AS p_partkey, {sql_dsum('value')} AS part_value
            FROM held GROUP BY 1),
        total AS (SELECT {sql_dsum('value')} AS total_value FROM held)
        SELECT p_partkey, part_value
        FROM per_part, total
        WHERE part_value > 0.001 * total_value
        ORDER BY part_value DESC, p_partkey
    """,
    "q16_supplier_count": f"""
        WITH {_SUPPLIES}
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM supplies
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'ECONOMY'
          AND p_size IN (1, 14, 23, 45, 9)
          AND l_suppkey % 17 <> 0
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q20_excess_stock": f"""
        WITH shipped AS (
            SELECT l_partkey, l_suppkey,
                   {sql_dsum('l_quantity')} AS qty_shipped
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_name LIKE '%blue%'
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2),
        excess AS (
            SELECT DISTINCT l_suppkey FROM shipped
            WHERE {_AVAIL_SQL} > 0.5 * qty_shipped)
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier
        WHERE s_nationkey = 1
          AND s_suppkey IN (SELECT l_suppkey FROM excess)
        ORDER BY s_suppkey
    """,
})

ORACLES["rfm_segments"] = """
    WITH per AS (
        SELECT o_custkey, MAX(o_orderdate) AS last_order,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,8))) AS DOUBLE)
                   AS monetary
        FROM orders GROUP BY 1),
    a AS (SELECT MAX(last_order) AS anchor FROM per)
    SELECT o_custkey,
           CAST(date_diff('day', last_order, anchor) AS INT) AS recency_days,
           frequency, monetary,
           CAST(NTILE(4) OVER (ORDER BY date_diff('day', last_order, anchor),
                               o_custkey) AS INT) AS r_score,
           CAST(NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS INT)
               AS f_score,
           CAST(NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS INT)
               AS m_score
    FROM per CROSS JOIN a ORDER BY o_custkey
"""

ORACLES["revenue_growth"] = """
    WITH monthly AS (
        SELECT n_name,
               date_trunc('month', o_orderdate) AS month,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,8))) AS DOUBLE)
                   AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2)
    SELECT n_name, month, revenue,
           LAG(revenue) OVER w AS prev_revenue,
           (revenue - LAG(revenue) OVER w) / LAG(revenue) OVER w AS growth
    FROM monthly
    WINDOW w AS (PARTITION BY n_name ORDER BY month)
    ORDER BY n_name, month
"""

ORACLES["basket_pairs"] = """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS n_orders
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
    ranked AS (
        SELECT part_a, part_b, n_orders,
               CAST(ROW_NUMBER() OVER (ORDER BY n_orders DESC, part_a, part_b)
                    AS INT) AS rank
        FROM pairs)
    SELECT part_a, part_b, n_orders, rank
    FROM ranked WHERE rank <= 20 ORDER BY rank
"""

ORACLES["brand_spearman"] = """
    WITH ranked AS (
        SELECT p_brand,
               CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                    ORDER BY l_quantity, l_orderkey, l_linenumber,
                             l_partkey, l_suppkey, l_extendedprice)
                  - ROW_NUMBER() OVER (PARTITION BY p_brand
                    ORDER BY l_extendedprice, l_orderkey, l_linenumber,
                             l_partkey, l_suppkey, l_quantity)
                    AS BIGINT) AS d
        FROM lineitem JOIN part ON l_partkey = p_partkey)
    SELECT p_brand, COUNT(*) AS n,
           1 - CAST(6 * CAST(SUM(d * d) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) * (COUNT(*) * COUNT(*) - 1) AS DOUBLE)
               AS spearman_rho
    FROM ranked GROUP BY p_brand ORDER BY p_brand
"""

ORACLES["ship_latency_quantiles"] = """
    WITH lat AS (
        SELECT o_orderpriority,
               CAST(date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(l_shipdate AS DATE)) AS BIGINT) AS lat_days,
               l_orderkey, l_shipdate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    ranked AS (
        SELECT o_orderpriority, lat_days,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                   ORDER BY lat_days, l_orderkey, l_shipdate) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM lat)
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           MIN(lat_days) AS min_days,
           MAX(CASE WHEN rn = CEIL(CAST(0.5 AS DOUBLE) * n) THEN lat_days END)
               AS p50_days,
           MAX(CASE WHEN rn = CEIL(CAST(0.9 AS DOUBLE) * n) THEN lat_days END)
               AS p90_days,
           MAX(CASE WHEN rn = CEIL(CAST(0.99 AS DOUBLE) * n) THEN lat_days END)
               AS p99_days,
           MAX(lat_days) AS max_days
    FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

ORACLES["basket_lift"] = """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM li),
    per_part AS (
        SELECT l_partkey AS part, COUNT(*) AS n_part FROM li GROUP BY 1),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS n_ab
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 3),
    scored AS (
        SELECT part_a, part_b, n_ab,
               na.n_part AS n_a, nb.n_part AS n_b,
               CAST(n_ab * n_baskets AS DOUBLE)
               / CAST(na.n_part * nb.n_part AS DOUBLE) AS lift
        FROM pairs
        JOIN per_part na ON na.part = part_a
        JOIN per_part nb ON nb.part = part_b
        CROSS JOIN n_orders),
    ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER
                   (ORDER BY lift DESC, part_a, part_b) AS INT) AS rank
        FROM scored)
    SELECT part_a, part_b, n_ab, n_a, n_b, lift, rank
    FROM ranked WHERE rank <= 20 ORDER BY rank
"""


ORACLES["pareto_report"] = """
    WITH per_cust AS (
        SELECT o_custkey,
               SUM(CAST(FLOOR(o_totalprice * 1000000.0) AS BIGINT)) AS rev
        FROM orders GROUP BY 1),
    tot AS (
        SELECT COUNT(*) AS n_cust,
               CAST(SUM(rev) AS HUGEINT) AS total_rev
        FROM per_cust),
    ranked AS (
        SELECT rev,
               ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS rn,
               n_cust, total_rev
        FROM per_cust CROSS JOIN tot),
    deciles AS (
        SELECT CAST(((rn - 1) * 10) // n_cust + 1 AS INT) AS decile,
               COUNT(*) AS n_customers,
               CAST(SUM(rev) AS HUGEINT) AS decile_rev,
               MAX(total_rev) AS total_rev
        FROM ranked GROUP BY 1)
    SELECT decile, n_customers,
           CAST(decile_rev AS DOUBLE) / 1000000.0 AS decile_revenue,
           CAST(SUM(decile_rev) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / CAST(total_rev AS DOUBLE) AS cum_share
    FROM deciles ORDER BY decile
"""

ORACLES.update({
    "rollup_revenue": f"""
        SELECT r_name, n_name,
               CAST(GROUPING(r_name) AS INT) AS is_total_region,
               CAST(GROUPING(n_name) AS INT) AS is_total_nation,
               COUNT(*) AS n_orders,
               {sql_qsum('o_totalprice')} AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
    """,
    "sales_cube": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS is_total_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS is_total_ls,
               COUNT(*) AS n_items,
               {sql_dsum('l_quantity')} AS sum_qty,
               {sql_qsum('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    "revenue_share_window": """
        WITH per_nation AS (
            SELECT r_name, n_name,
                   SUM(CAST(FLOOR(o_totalprice * 1000000.0) AS BIGINT)) AS qrev
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1, 2
        )
        SELECT r_name, n_name,
               CAST(qrev AS DOUBLE) / 1000000.0 AS revenue,
               CAST(qrev AS DOUBLE)
                   / CAST(SUM(qrev) OVER (PARTITION BY r_name) AS DOUBLE)
                   AS share_of_region,
               CAST(qrev AS DOUBLE)
                   / CAST(SUM(qrev) OVER () AS DOUBLE) AS share_global
        FROM per_nation
    """,
})

ORACLES["cohort_ltv"] = """
    WITH om AS (
        SELECT o_custkey, o_totalprice,
               date_trunc('month', CAST(o_orderdate AS DATE)) AS month
        FROM orders
    ),
    first AS (
        SELECT o_custkey, MIN(month) AS cohort_month FROM om GROUP BY 1
    ),
    cells AS (
        SELECT cohort_month,
               CAST(date_diff('month', cohort_month, month) AS INT)
                   AS month_offset,
               COUNT(DISTINCT o_custkey) AS n_active,
               SUM(CAST(FLOOR(o_totalprice * 1000000.0) AS BIGINT)) AS qrev
        FROM om JOIN first USING (o_custkey)
        GROUP BY 1, 2
    )
    SELECT CAST(cohort_month AS TIMESTAMP) AS cohort_month, month_offset,
           n_active,
           CAST(qrev AS DOUBLE) / 1000000.0 AS revenue,
           CAST(SUM(qrev) OVER (
               PARTITION BY cohort_month ORDER BY month_offset
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / 1000000.0 AS cum_revenue
    FROM cells
"""

ORACLES["skyline_parts"] = """
    SELECT p.p_partkey, p.p_name,
           CAST(p.p_retailprice AS DOUBLE) AS price,
           CAST(p.p_size AS INT) AS p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    ORDER BY price, p_partkey
"""

ORACLES["part_triangles"] = """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM li a JOIN li b USING (l_orderkey)
        WHERE a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    ),
    deg AS (
        SELECT node, COUNT(*) AS deg FROM (
            SELECT pa AS node FROM edges
            UNION ALL SELECT pb AS node FROM edges)
        GROUP BY 1
    ),
    node_stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(COALESCE(SUM(CAST(deg * (deg - 1) / 2 AS BIGINT)), 0)
                    AS BIGINT) AS n_wedges
        FROM deg
    ),
    edge_stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges),
    tri_stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM edges ab
        JOIN edges ac ON ab.pa = ac.pa AND ab.pb < ac.pb
        JOIN edges bc ON bc.pa = ab.pb AND bc.pb = ac.pb
    )
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           CASE WHEN n_wedges > 0
                THEN 3.0 * CAST(n_triangles AS DOUBLE)
                     / CAST(n_wedges AS DOUBLE)
                ELSE 0.0 END AS clustering_coef
    FROM node_stats, edge_stats, tri_stats
"""

ORACLES["corr_matrix"] = """
    WITH q AS (
        SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS q,
               CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS p,
               CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS d
        FROM lineitem
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(q AS DECIMAL(38,0))) AS sq,
               SUM(CAST(p AS DECIMAL(38,0))) AS sp,
               SUM(CAST(d AS DECIMAL(38,0))) AS sd,
               SUM(CAST(q * q AS DECIMAL(38,0))) AS sqq,
               SUM(CAST(p * p AS DECIMAL(38,0))) AS spp,
               SUM(CAST(d * d AS DECIMAL(38,0))) AS sdd,
               SUM(CAST(q * p AS DECIMAL(38,0))) AS sqp,
               SUM(CAST(q * d AS DECIMAL(38,0))) AS sqd,
               SUM(CAST(p * d AS DECIMAL(38,0))) AS spd
        FROM q
    ),
    rows_out AS (
        SELECT 'qty_price' AS pair, n,
               (CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE)
                - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                       - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                         - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))) AS r
        FROM m
        UNION ALL
        SELECT 'qty_discount', n,
               (CAST(n AS DOUBLE) * CAST(sqd AS DOUBLE)
                - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                       - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                         - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)))
        FROM m
        UNION ALL
        SELECT 'price_discount', n,
               (CAST(n AS DOUBLE) * CAST(spd AS DOUBLE)
                - CAST(sp AS DOUBLE) * CAST(sd AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                       - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                         - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)))
        FROM m
    )
    SELECT pair, n,
           CAST(CAST(FLOOR(r * 1e9) AS BIGINT) AS DOUBLE) / 1e9 AS r
    FROM rows_out ORDER BY pair
"""

ORACLES["segment_migration"] = """
    WITH spend AS (
        SELECT o_custkey,
               EXTRACT(year FROM CAST(o_orderdate AS TIMESTAMP)) AS yr,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS spend_cents
        FROM orders
        WHERE EXTRACT(year FROM CAST(o_orderdate AS TIMESTAMP))
                  IN (1996, 1997)
        GROUP BY 1, 2
    ),
    cuts AS (
        SELECT yr, array_agg(cut ORDER BY cut) AS cut_list FROM (
            SELECT yr, d, MIN(v) AS cut FROM (
                SELECT yr, spend_cents AS v,
                       SUM(cnt) OVER (PARTITION BY yr ORDER BY spend_cents
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                           ROW) AS cum,
                       SUM(cnt) OVER (PARTITION BY yr) AS n_total
                FROM (SELECT yr, spend_cents, COUNT(*) AS cnt
                      FROM spend GROUP BY 1, 2)
            ) c CROSS JOIN (SELECT UNNEST(range(1, 5)) AS d) ds
            WHERE cum >= CEIL(d * n_total / 5)
            GROUP BY yr, d)
        GROUP BY yr
    ),
    assigned AS (
        SELECT s.o_custkey, s.yr,
               CAST(len(list_filter(c.cut_list, x -> x < s.spend_cents))
                    AS INT) AS q
        FROM spend s JOIN cuts c ON c.yr = s.yr
    ),
    pairs AS (
        SELECT a.o_custkey, a.q AS q_from, b.q AS q_to
        FROM assigned a JOIN assigned b
          ON a.o_custkey = b.o_custkey AND a.yr = 1996 AND b.yr = 1997
    ),
    total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM pairs)
    SELECT q_from, q_to,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS DOUBLE) / CAST(MAX(n_total) AS DOUBLE) AS share
    FROM pairs, total
    GROUP BY q_from, q_to
    ORDER BY q_from, q_to
"""

ORACLES["order_gap_stats"] = """
    WITH gaps0 AS (
        SELECT o_custkey,
               date_diff('day',
                   LAG(CAST(o_orderdate AS DATE)) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey),
                   CAST(o_orderdate AS DATE)) AS gap
        FROM orders),
    gaps AS (
        SELECT c.c_mktsegment, CAST(g.gap AS BIGINT) AS gap
        FROM gaps0 g JOIN customer c ON g.o_custkey = c.c_custkey
        WHERE g.gap IS NOT NULL),
    ranked AS (
        SELECT c_mktsegment, gap,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY gap)
                   AS rn,
               COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
        FROM gaps)
    SELECT c_mktsegment,
           COUNT(*) AS n_gaps,
           CAST(SUM(gap) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mean_gap_days,
           MAX(CASE WHEN rn = CEIL(0.5 * n) THEN gap END) AS p50_gap_days,
           MAX(CASE WHEN rn = CEIL(0.9 * n) THEN gap END) AS p90_gap_days,
           MAX(gap) AS max_gap_days
    FROM ranked GROUP BY c_mktsegment ORDER BY c_mktsegment
"""

ORACLES["discount_uplift"] = """
    WITH bands AS (
        SELECT CAST(FLOOR(l_discount * 100 + 0.5) AS INT) AS band,
               COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,8))) AS DOUBLE)
                   AS sum_qty,
               CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount))
                   * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
                   AS revenue
        FROM lineitem GROUP BY 1),
    b AS (
        SELECT *,
               MAX(CASE WHEN band = 0
                        THEN sum_qty / CAST(n_lines AS DOUBLE) END)
                   OVER () AS base_avg
        FROM bands)
    SELECT band, CAST(n_lines AS BIGINT) AS n_lines, sum_qty, revenue,
           sum_qty / CAST(n_lines AS DOUBLE) AS avg_qty,
           (sum_qty / CAST(n_lines AS DOUBLE)) / base_avg
               AS qty_uplift_vs_no_discount
    FROM b ORDER BY band
"""

ORACLES["customer_churn"] = """
    WITH active AS (
        SELECT DISTINCT CAST(year(o_orderdate) AS INT) AS yr,
               o_custkey AS cust
        FROM orders),
    per AS (
        SELECT a.yr, COUNT(*) AS n_active,
               SUM(CASE WHEN b.cust IS NOT NULL THEN 1 ELSE 0 END)
                   AS n_retained
        FROM active a LEFT JOIN active b
          ON b.yr = a.yr + 1 AND b.cust = a.cust
        GROUP BY a.yr),
    hn AS (SELECT DISTINCT yr - 1 AS yr FROM active)
    SELECT p.yr, CAST(n_active AS BIGINT) AS n_active,
           CAST(n_retained AS BIGINT) AS n_retained,
           1.0 - CAST(n_retained AS DOUBLE) / CAST(n_active AS DOUBLE)
               AS churn_rate
    FROM per p JOIN hn ON p.yr = hn.yr ORDER BY p.yr
"""

ORACLES["price_elasticity"] = """
    WITH q AS (
        SELECT p.p_brand,
               CAST(FLOOR(l.l_discount * 100 + 0.5) AS BIGINT) AS x,
               CAST(FLOOR(l.l_quantity * 100 + 0.5) AS BIGINT) AS y
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    g AS (
        SELECT p_brand, COUNT(*) AS n_lines,
               SUM(CAST(x AS DECIMAL(38,0))) AS sx,
               SUM(CAST(y AS DECIMAL(38,0))) AS sy,
               SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy,
               SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx
        FROM q GROUP BY 1)
    SELECT p_brand, CAST(n_lines AS BIGINT) AS n_lines,
           CAST(sy AS DOUBLE) / CAST(n_lines AS DOUBLE) / 100.0 AS avg_qty,
           CAST(sx AS DOUBLE) / CAST(n_lines AS DOUBLE)
               AS avg_discount_pct,
           CASE WHEN CAST(n_lines AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) != 0
                THEN (CAST(n_lines AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n_lines AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     / 100.0
           END AS qty_slope_per_discount_pct
    FROM g ORDER BY p_brand
"""

ORACLES["supplier_scorecard"] = """
    WITH j AS (
        SELECT s.s_suppkey, s.s_name,
               CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 1e6)
                   AS BIGINT) AS qrev,
               CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)) AS delay
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey),
    g AS (
        SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(qrev) AS BIGINT) AS qrev_sum,
               CAST(SUM(ret) AS BIGINT) AS n_returned,
               CAST(SUM(delay) AS BIGINT) AS delay_sum
        FROM j GROUP BY 1, 2)
    SELECT s_suppkey, s_name, n_lines,
           CAST(qrev_sum AS DOUBLE) / 1e6 AS revenue,
           CAST(qrev_sum AS DOUBLE)
               / CAST(CAST(SUM(qrev_sum) OVER () AS BIGINT) AS DOUBLE)
               AS revenue_share,
           CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE)
               AS return_rate,
           CAST(delay_sum AS DOUBLE) / CAST(n_lines AS DOUBLE)
               AS avg_ship_delay_days
    FROM g ORDER BY s_suppkey
"""

ORACLES["nation_affinity"] = """
    WITH j AS (
        SELECT nc.n_name AS cust_nation, ns.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation ns ON s.s_nationkey = ns.n_nationkey),
    g AS (
        SELECT cust_nation, supp_nation, CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM j GROUP BY 1, 2),
    m AS (
        SELECT *,
               CAST(SUM(n_lines) OVER (PARTITION BY cust_nation) AS BIGINT)
                   AS c_a,
               CAST(SUM(n_lines) OVER (PARTITION BY supp_nation) AS BIGINT)
                   AS c_b,
               CAST(SUM(n_lines) OVER () AS BIGINT) AS t
        FROM g)
    SELECT cust_nation, supp_nation, n_lines,
           FLOOR(ln(CAST(n_lines AS DOUBLE) * CAST(t AS DOUBLE)
                    / (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))) * 1e6)
               / 1e6 AS pmi
    FROM m ORDER BY cust_nation, supp_nation
"""

ORACLES["price_index"] = """
    WITH mp AS (
        SELECT date_trunc('month', l_shipdate) AS month, l_partkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 1e6) AS BIGINT))
                   AS BIGINT) AS rev,
               SUM(CAST(l_quantity AS DECIMAL(18,8))) AS qty
        FROM lineitem GROUP BY 1, 2),
    mp2 AS (
        SELECT month, l_partkey,
               CAST(rev AS DOUBLE) / 1e6 / CAST(qty AS DOUBLE) AS price,
               CAST(qty AS DOUBLE) AS qty_d
        FROM mp),
    bm AS (SELECT MIN(month) AS bm FROM mp2),
    base AS (
        SELECT l_partkey, price AS p0, qty_d AS q0
        FROM mp2, bm WHERE month = bm),
    joined AS (
        SELECT m.month,
               CAST(FLOOR(m.price * b.q0 * 1e6) AS BIGINT) AS t_num,
               CAST(FLOOR(b.p0 * b.q0 * 1e6) AS BIGINT) AS t_den
        FROM mp2 m JOIN base b ON m.l_partkey = b.l_partkey)
    SELECT month, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(CAST(SUM(t_num) AS BIGINT) AS DOUBLE)
               / CAST(CAST(SUM(t_den) AS BIGINT) AS DOUBLE)
               AS laspeyres_index
    FROM joined GROUP BY 1 ORDER BY 1
"""

ORACLES["abc_xyz_classes"] = """
    WITH mp AS (
        SELECT date_trunc('month', l_shipdate) AS month, l_partkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                   * 1e6) AS BIGINT)) AS BIGINT) AS rev_m,
               CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS qty_m
        FROM lineitem GROUP BY 1, 2),
    pp AS (
        SELECT l_partkey, CAST(SUM(rev_m) AS BIGINT) AS rev,
               CAST(COUNT(*) AS BIGINT) AS n_months,
               SUM(CAST(qty_m AS HUGEINT)) AS s,
               SUM(CAST(qty_m AS HUGEINT) * qty_m) AS ss
        FROM mp GROUP BY 1),
    rk AS (
        SELECT *,
               CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev,
               CAST(SUM(rev) OVER () AS BIGINT) AS total_rev
        FROM pp),
    cl AS (
        SELECT l_partkey, rev,
               CASE WHEN cum_rev * 10 <= total_rev * 8 THEN 'A'
                    WHEN cum_rev * 20 <= total_rev * 19 THEN 'B'
                    ELSE 'C' END AS class_abc,
               CASE WHEN n_months * ss * 4 <= s * s * 5 THEN 'X'
                    WHEN n_months * ss <= s * s * 2 THEN 'Y'
                    ELSE 'Z' END AS class_xyz
        FROM rk)
    SELECT class_abc, class_xyz, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(CAST(SUM(rev) AS BIGINT) AS DOUBLE) / 1e6 AS revenue
    FROM cl GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLES["supplier_hhi"] = """
    WITH ps AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                   * 1e6) AS BIGINT)) AS BIGINT) AS rev
        FROM lineitem GROUP BY 1),
    sn AS (
        SELECT s.s_suppkey, n.n_name AS nation
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey),
    sh AS (
        SELECT sn.nation, ps.rev,
               CAST(ps.rev AS DOUBLE)
                   / CAST(CAST(SUM(ps.rev) OVER (PARTITION BY sn.nation)
                       AS BIGINT) AS DOUBLE) AS share
        FROM ps JOIN sn ON ps.l_suppkey = sn.s_suppkey),
    t AS (
        SELECT nation, share,
               CAST(FLOOR(share * share * 1e12) AS BIGINT) AS tq
        FROM sh)
    SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(CAST(SUM(tq) AS BIGINT) AS DOUBLE) / 1e12 AS hhi,
           MAX(share) AS top_share
    FROM t GROUP BY 1 ORDER BY 1
"""


ORACLES["weighted_median_price"] = """
    WITH pts AS (
        SELECT p.p_brand,
               CAST(FLOOR(l.l_extendedprice / l.l_quantity * 100)
                   AS BIGINT) AS price_c,
               CAST(SUM(CAST(FLOOR(l.l_quantity * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS w
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2),
    cum AS (
        SELECT p_brand, price_c,
               CAST(SUM(w) OVER (PARTITION BY p_brand ORDER BY price_c
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
               CAST(SUM(w) OVER (PARTITION BY p_brand) AS BIGINT) AS tw
        FROM pts)
    SELECT p_brand,
           CAST(MAX(tw) AS DOUBLE) / 100.0 AS total_qty,
           CAST(MIN(CASE WHEN cw * 2 >= tw THEN price_c END) AS DOUBLE)
               / 100.0 AS weighted_median_price,
           CAST(MIN(CASE WHEN cw * 10 >= tw * 9 THEN price_c END)
               AS DOUBLE) / 100.0 AS weighted_p90_price
    FROM cum GROUP BY 1 ORDER BY 1
"""

ORACLES["croston_forecast"] = """
    WITH bm AS (
        SELECT p.p_brand,
               year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1 AS m,
               CAST(SUM(CAST(FLOOR(l.l_quantity * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS demand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
        HAVING CAST(SUM(CAST(FLOOR(l.l_quantity * 100 + 0.5) AS BIGINT))
                   AS BIGINT) > 0),
    iv AS (
        SELECT *, m - lag(m, 1) OVER (PARTITION BY p_brand ORDER BY m)
                   AS iv_m
        FROM bm),
    sm AS (
        SELECT p_brand,
               COALESCE(lag(demand, 0) OVER wlag * 128, 0) + COALESCE(lag(demand, 1) OVER wlag * 64, 0) + COALESCE(lag(demand, 2) OVER wlag * 32, 0) + COALESCE(lag(demand, 3) OVER wlag * 16, 0) + COALESCE(lag(demand, 4) OVER wlag * 8, 0) + COALESCE(lag(demand, 5) OVER wlag * 4, 0) + COALESCE(lag(demand, 6) OVER wlag * 2, 0) + COALESCE(lag(demand, 7) OVER wlag * 1, 0) AS zn,
               CASE WHEN lag(demand, 0) OVER wlag IS NOT NULL THEN 128 ELSE 0 END + CASE WHEN lag(demand, 1) OVER wlag IS NOT NULL THEN 64 ELSE 0 END + CASE WHEN lag(demand, 2) OVER wlag IS NOT NULL THEN 32 ELSE 0 END + CASE WHEN lag(demand, 3) OVER wlag IS NOT NULL THEN 16 ELSE 0 END + CASE WHEN lag(demand, 4) OVER wlag IS NOT NULL THEN 8 ELSE 0 END + CASE WHEN lag(demand, 5) OVER wlag IS NOT NULL THEN 4 ELSE 0 END + CASE WHEN lag(demand, 6) OVER wlag IS NOT NULL THEN 2 ELSE 0 END + CASE WHEN lag(demand, 7) OVER wlag IS NOT NULL THEN 1 ELSE 0 END AS zd,
               COALESCE(lag(iv_m, 0) OVER wlag * 128, 0) + COALESCE(lag(iv_m, 1) OVER wlag * 64, 0) + COALESCE(lag(iv_m, 2) OVER wlag * 32, 0) + COALESCE(lag(iv_m, 3) OVER wlag * 16, 0) + COALESCE(lag(iv_m, 4) OVER wlag * 8, 0) + COALESCE(lag(iv_m, 5) OVER wlag * 4, 0) + COALESCE(lag(iv_m, 6) OVER wlag * 2, 0) + COALESCE(lag(iv_m, 7) OVER wlag * 1, 0) AS pn,
               CASE WHEN lag(iv_m, 0) OVER wlag IS NOT NULL THEN 128 ELSE 0 END + CASE WHEN lag(iv_m, 1) OVER wlag IS NOT NULL THEN 64 ELSE 0 END + CASE WHEN lag(iv_m, 2) OVER wlag IS NOT NULL THEN 32 ELSE 0 END + CASE WHEN lag(iv_m, 3) OVER wlag IS NOT NULL THEN 16 ELSE 0 END + CASE WHEN lag(iv_m, 4) OVER wlag IS NOT NULL THEN 8 ELSE 0 END + CASE WHEN lag(iv_m, 5) OVER wlag IS NOT NULL THEN 4 ELSE 0 END + CASE WHEN lag(iv_m, 6) OVER wlag IS NOT NULL THEN 2 ELSE 0 END + CASE WHEN lag(iv_m, 7) OVER wlag IS NOT NULL THEN 1 ELSE 0 END AS pd,
               ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY m DESC)
                   AS rn,
               CAST(COUNT(*) OVER (PARTITION BY p_brand) AS BIGINT)
                   AS n_demands
        FROM iv
        WINDOW wlag AS (PARTITION BY p_brand ORDER BY m))
    SELECT p_brand, n_demands AS n_demand_months,
           CAST(zn AS DOUBLE) / CAST(zd AS DOUBLE) / 100.0 AS size_ewma,
           CASE WHEN pd > 0
                THEN CAST(pn AS DOUBLE) / CAST(pd AS DOUBLE) END
               AS interval_ewma,
           CASE WHEN pd > 0
                THEN CAST(zn AS DOUBLE) / CAST(zd AS DOUBLE) / 100.0
                     / (CAST(pn AS DOUBLE) / CAST(pd AS DOUBLE)) END
               AS croston_forecast
    FROM sm WHERE rn = 1 ORDER BY p_brand
"""

ORACLES["lorenz_curve"] = """
    WITH per_cust AS (
        SELECT o_custkey,
               SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS qrev
        FROM orders GROUP BY o_custkey),
    deciled AS (
        SELECT *, NTILE(10) OVER (ORDER BY qrev, o_custkey) AS decile
        FROM per_cust),
    per_dec AS (
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               SUM(qrev) AS drev
        FROM deciled GROUP BY decile)
    SELECT decile, n_customers,
           CAST(drev AS DOUBLE) / 100.0 AS decile_revenue,
           CAST(SUM(drev) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / CAST(SUM(drev) OVER () AS DOUBLE) AS cum_share
    FROM per_dec ORDER BY decile
"""

ORACLES["revenue_theil"] = """
    WITH per_cust AS (
        SELECT n_name,
               SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS x
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY o_custkey, n_name),
    tot AS (
        SELECT CAST(SUM(x) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM per_cust),
    grp AS (
        SELECT n_name, CAST(SUM(x) AS BIGINT) AS sg,
               CAST(COUNT(*) AS BIGINT) AS ng
        FROM per_cust GROUP BY n_name),
    within AS (
        SELECT p.n_name, g.sg, g.ng,
               p.x * CAST(FLOOR(ln(CAST(p.x AS DOUBLE)
                                   * CAST(g.ng AS DOUBLE)
                                   / CAST(g.sg AS DOUBLE)) * 1e6)
                          AS BIGINT) AS xl
        FROM per_cust p JOIN grp g ON p.n_name = g.n_name),
    wsum AS (
        SELECT n_name, sg, ng, SUM(xl) AS sxl
        FROM within GROUP BY n_name, sg, ng)
    SELECT w.n_name,
           w.ng AS n_customers,
           CAST(w.sg AS DOUBLE) / 100.0 AS revenue,
           FLOOR(CAST(w.sxl AS DOUBLE) / CAST(w.sg AS DOUBLE) / 1e6 * 1e9)
               / 1e9 AS theil_within,
           FLOOR(CAST(w.sg AS DOUBLE) / CAST(t.s AS DOUBLE)
                 * CAST(CAST(FLOOR(ln(CAST(w.sg AS DOUBLE)
                                      * CAST(t.n AS DOUBLE)
                                      / (CAST(t.s AS DOUBLE)
                                         * CAST(w.ng AS DOUBLE))) * 1e6)
                             AS BIGINT) AS DOUBLE) / 1e6 * 1e9) / 1e9
               AS between_contrib
    FROM wsum w CROSS JOIN tot t
    ORDER BY w.n_name
"""

ORACLES["new_repeat_revenue"] = """
    WITH o AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
               CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents,
               MIN(CAST(o_orderdate AS DATE)) OVER (
                   PARTITION BY o_custkey) AS fd
        FROM orders)
    SELECT CAST(date_trunc('month', d) AS TIMESTAMP) AS month,
           CAST(SUM(CASE WHEN d = fd THEN cents ELSE 0 END) AS DOUBLE)
               / 100.0 AS new_revenue,
           CAST(SUM(CASE WHEN d > fd THEN cents ELSE 0 END) AS DOUBLE)
               / 100.0 AS repeat_revenue,
           CAST(COUNT(DISTINCT CASE WHEN d = fd THEN o_custkey END)
               AS BIGINT) AS n_new_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM o GROUP BY 1 ORDER BY 1
"""

ORACLES["reorder_intervals"] = """
    WITH g AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
               date_diff('day',
                   LAG(CAST(o_orderdate AS DATE)) OVER (
                       PARTITION BY o_custkey
                       ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
                   CAST(o_orderdate AS DATE)) AS gap
        FROM orders),
    j AS (
        SELECT n_name, gap, o_custkey, d
        FROM g
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE gap IS NOT NULL),
    r AS (
        SELECT n_name, gap,
               ROW_NUMBER() OVER (PARTITION BY n_name
                                  ORDER BY gap, o_custkey, d) AS rn,
               COUNT(*) OVER (PARTITION BY n_name) AS n
        FROM j)
    SELECT n_name,
           CAST(MAX(n) AS BIGINT) AS n_gaps,
           CAST(SUM(CAST(gap AS BIGINT)) AS DOUBLE) / MAX(n)
               AS avg_gap_days,
           CAST(MAX(CASE WHEN rn = CAST(CEIL(n * 0.5) AS BIGINT)
                         THEN gap END) AS INT) AS p50_gap_days,
           CAST(MAX(CASE WHEN rn = CAST(CEIL(n * 0.9) AS BIGINT)
                         THEN gap END) AS INT) AS p90_gap_days
    FROM r GROUP BY n_name ORDER BY n_name
"""

ORACLES["seasonality_index"] = """
    WITH base AS (
        SELECT r_name,
               CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
               CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mon,
               CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey),
    m AS (
        SELECT r_name, yr, mon, SUM(cents) AS mc,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM base GROUP BY 1, 2, 3)
    SELECT r_name, yr, mon, n_orders,
           CAST(mc AS DOUBLE) / 100.0 AS revenue,
           CAST(12 * mc AS DOUBLE)
               / CAST(SUM(mc) OVER (PARTITION BY r_name, yr) AS DOUBLE)
               AS seasonal_index
    FROM m ORDER BY r_name, yr, mon
"""

ORACLES["lead_time_sla"] = """
    WITH j AS (
        SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE))
                    AS TIMESTAMP) AS month,
               date_diff('day', CAST(o_orderdate AS DATE),
                         CAST(l_shipdate AS DATE)) AS delay,
               l_orderkey, l_linenumber
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    r AS (
        SELECT month, delay,
               ROW_NUMBER() OVER (PARTITION BY month
                   ORDER BY delay, l_orderkey, l_linenumber) AS rn,
               COUNT(*) OVER (PARTITION BY month) AS n
        FROM j)
    SELECT month,
           CAST(MAX(n) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN delay <= 30 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_within_sla,
           CAST(SUM(CASE WHEN delay <= 30 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(MAX(n) AS DOUBLE) AS sla_rate,
           CAST(MAX(CASE WHEN rn = CAST(CEIL(n * 0.95) AS BIGINT)
                         THEN delay END) AS INT) AS p95_delay_days
    FROM r GROUP BY month ORDER BY month
"""

ORACLES["bulk_discount_curve"] = """
    WITH base AS (
        SELECT CAST(l_quantity AS INT) AS quantity,
               CAST(FLOOR(l_extendedprice / l_quantity * 1e4) AS BIGINT)
                   AS qu
        FROM lineitem),
    agg AS (
        SELECT quantity, CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(qu) AS BIGINT) AS s,
               MIN(qu) AS mn, MAX(qu) AS mx
        FROM base GROUP BY quantity)
    SELECT quantity, n_lines,
           CAST(s AS DOUBLE) / (CAST(n_lines AS DOUBLE) * 1e4)
               AS mean_unit_price,
           CAST(mn AS DOUBLE) / 1e4 AS min_unit_price,
           CAST(mx AS DOUBLE) / 1e4 AS max_unit_price
    FROM agg ORDER BY quantity
"""

ORACLES["nation_trade_balance"] = """
    WITH flows AS (
        SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
               SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0)
                        AS BIGINT)) AS c
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        GROUP BY 1, 2),
    exports AS (
        SELECT supp_nation AS nation, SUM(c) AS exp_c
        FROM flows GROUP BY 1),
    imports AS (
        SELECT cust_nation AS nation, SUM(c) AS imp_c
        FROM flows GROUP BY 1)
    SELECT COALESCE(e.nation, i.nation) AS nation,
           CAST(COALESCE(exp_c, 0) AS DOUBLE) / 100.0 AS exports,
           CAST(COALESCE(imp_c, 0) AS DOUBLE) / 100.0 AS imports,
           CAST(COALESCE(exp_c, 0) - COALESCE(imp_c, 0) AS DOUBLE) / 100.0
               AS net_balance
    FROM exports e FULL OUTER JOIN imports i ON e.nation = i.nation
    ORDER BY nation
"""

ORACLES["supply_risk"] = """
    WITH per_part AS (
        SELECT l_partkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                                   * 100.0) AS BIGINT)) AS BIGINT) AS c
        FROM lineitem GROUP BY 1)
    SELECT p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CASE WHEN n_supp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS single_source_parts,
           CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) / 100.0 AS revenue,
           CAST(CAST(SUM(CASE WHEN n_supp = 1 THEN c ELSE 0 END) AS BIGINT)
                AS DOUBLE) / 100.0 AS revenue_at_risk,
           CAST(CAST(SUM(CASE WHEN n_supp = 1 THEN c ELSE 0 END) AS BIGINT)
                AS DOUBLE)
               / CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) AS risk_share
    FROM per_part JOIN part ON l_partkey = p_partkey
    GROUP BY 1 ORDER BY 1
"""

ORACLES["return_rate_anomaly"] = """
    WITH bm AS (
        SELECT p_brand AS brand,
               CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS TIMESTAMP)
                   AS month,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS returns
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2),
    wb AS (
        SELECT *,
               CAST(SUM(n_lines) OVER (PARTITION BY brand) AS BIGINT) AS bn,
               CAST(SUM(returns) OVER (PARTITION BY brand) AS BIGINT) AS br
        FROM bm)
    SELECT brand, month, n_lines, returns,
           CAST(returns AS DOUBLE) / CAST(n_lines AS DOUBLE) AS return_rate,
           CAST(br AS DOUBLE) / CAST(bn AS DOUBLE) AS brand_rate,
           (CAST(returns AS DOUBLE) / CAST(n_lines AS DOUBLE)
            - CAST(br AS DOUBLE) / CAST(bn AS DOUBLE))
           / sqrt((CAST(br AS DOUBLE) / CAST(bn AS DOUBLE))
                  * (1.0 - CAST(br AS DOUBLE) / CAST(bn AS DOUBLE))
                  / CAST(n_lines AS DOUBLE)) AS z
    FROM wb ORDER BY brand, month
"""

ORACLES["acctbal_spend_deciles"] = """
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1),
    joined AS (
        SELECT c_custkey, c_acctbal,
               COALESCE(n_orders, 0) AS n_orders,
               COALESCE(cents, 0) AS cents,
               NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
        FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey)
    SELECT CAST(decile AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,8))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_balance,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / 100.0 AS revenue,
           CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 100.0 AS rev_per_customer
    FROM joined GROUP BY 1 ORDER BY 1
"""

ORACLES["price_dispersion"] = """
    WITH mom AS (
        SELECT p_type AS part_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(l_extendedprice / l_quantity * 1e6)
                             AS BIGINT)) AS BIGINT) AS sx,
               SUM(CAST(CAST(FLOOR(l_extendedprice / l_quantity * 1e6)
                             AS BIGINT) AS HUGEINT)
                   * CAST(FLOOR(l_extendedprice / l_quantity * 1e6)
                          AS BIGINT)) AS sxx,
               CAST(MIN(CAST(FLOOR(l_extendedprice / l_quantity * 1e6)
                             AS BIGINT)) AS BIGINT) AS mn,
               CAST(MAX(CAST(FLOOR(l_extendedprice / l_quantity * 1e6)
                             AS BIGINT)) AS BIGINT) AS mx
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1)
    SELECT part_type, n,
           (CAST(sx AS DOUBLE) / 1e6) / CAST(n AS DOUBLE)
               AS mean_unit_price,
           sqrt(CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e12)
                - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sx AS DOUBLE) / 1e6))
               / (CAST(sx AS DOUBLE) / 1e6) AS cv,
           CAST(mn AS DOUBLE) / 1e6 AS min_unit_price,
           CAST(mx AS DOUBLE) / 1e6 AS max_unit_price,
           CAST(mx AS DOUBLE) / CAST(mn AS DOUBLE) AS max_min_ratio
    FROM mom ORDER BY part_type
"""

ORACLES["priority_escalation_trend"] = """
    WITH monthly AS (
        SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE))
                    AS TIMESTAMP) AS month,
               year(CAST(o_orderdate AS DATE)) * 12
                   + month(CAST(o_orderdate AS DATE)) AS mi,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
        FROM orders GROUP BY 1, 2),
    pts AS (
        SELECT month, mi, n_orders, n_urgent,
               CAST(FLOOR(1e9 * CAST(n_urgent AS DOUBLE)
                          / CAST(n_orders AS DOUBLE)) AS BIGINT) AS qy
        FROM monthly),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(mi) AS BIGINT) AS sx,
               CAST(SUM(qy) AS BIGINT) AS sy,
               SUM(CAST(mi AS HUGEINT) * qy) AS sxy,
               SUM(CAST(mi AS HUGEINT) * mi) AS sxx
        FROM pts),
    fit AS (
        SELECT (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / 1e9 AS trend_slope
        FROM mom)
    SELECT month, n_orders, n_urgent,
           CAST(qy AS DOUBLE) / 1e9 AS urgent_share,
           trend_slope
    FROM pts CROSS JOIN fit ORDER BY month
"""

ORACLES["cross_sell_matrix"] = """
    WITH cells AS (
        SELECT c_mktsegment AS segment, p_type AS part_type,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                                   * 100.0) AS BIGINT)) AS BIGINT) AS c
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2),
    m AS (
        SELECT *,
               CAST(SUM(c) OVER (PARTITION BY segment) AS BIGINT) AS seg_c,
               CAST(SUM(c) OVER (PARTITION BY part_type) AS BIGINT) AS typ_c,
               CAST(SUM(c) OVER () AS BIGINT) AS all_c
        FROM cells)
    SELECT segment, part_type,
           CAST(c AS DOUBLE) / 100.0 AS revenue,
           CAST(c AS DOUBLE) / CAST(seg_c AS DOUBLE) AS segment_share,
           (CAST(c AS DOUBLE) / CAST(seg_c AS DOUBLE))
               / (CAST(typ_c AS DOUBLE) / CAST(all_c AS DOUBLE)) AS lift
    FROM m ORDER BY segment, part_type
"""

ORACLES["margin_waterfall"] = """
    WITH agg AS (
        SELECT year(CAST(o_orderdate AS DATE)) AS year,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
                    AS BIGINT) AS g,
               CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100.0)
                             AS BIGINT)) AS BIGINT) AS d,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                                   * 100.0) AS BIGINT)) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                                   * (1.0 + l_tax) * 100.0) AS BIGINT))
                    AS BIGINT) AS c
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1)
    SELECT year, n_lines,
           CAST(g AS DOUBLE) / 100.0 AS gross,
           CAST(d AS DOUBLE) / 100.0 AS discount_givenback,
           CAST(n AS DOUBLE) / 100.0 AS net_revenue,
           CAST(c - n AS DOUBLE) / 100.0 AS tax_collected,
           CAST(c AS DOUBLE) / 100.0 AS total_charged,
           CAST(d AS DOUBLE) / CAST(g AS DOUBLE) AS discount_rate
    FROM agg ORDER BY year
"""

ORACLES["customer_reactivation"] = """
    WITH gapped AS (
        SELECT year(CAST(o_orderdate AS DATE)) AS year, o_custkey,
               date_diff('day',
                   LAG(CAST(o_orderdate AS DATE)) OVER (
                       PARTITION BY o_custkey
                       ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
                   CAST(o_orderdate AS DATE)) AS gap
        FROM orders)
    SELECT year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN gap > 180 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_reactivations,
           CAST(COUNT(DISTINCT CASE WHEN gap > 180 THEN o_custkey END)
                AS BIGINT) AS customers_reactivated,
           CAST(SUM(CASE WHEN gap > 180 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS reactivation_share
    FROM gapped GROUP BY 1 ORDER BY year
"""

ORACLES["backlog_aging"] = """
    WITH snap AS (
        SELECT CAST(MAX(l_shipdate) AS DATE) - INTERVAL 365 DAY AS snap
        FROM lineitem),
    open_li AS (
        SELECT date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(s.snap AS DATE)) AS age,
               CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 1e6)
                    AS BIGINT) AS pq
        FROM lineitem l CROSS JOIN snap s
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE CAST(l.l_shipdate AS DATE) > CAST(s.snap AS DATE)
          AND CAST(o.o_orderdate AS DATE) <= CAST(s.snap AS DATE)),
    agg AS (
        SELECT CASE WHEN age <= 30 THEN '00-30'
                    WHEN age <= 60 THEN '31-60'
                    WHEN age <= 90 THEN '61-90'
                    ELSE '90+' END AS age_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               SUM(pq) AS vq
        FROM open_li GROUP BY 1)
    SELECT age_bucket, n_items,
           CAST(vq AS DOUBLE) / 1e6 AS open_value,
           CAST(vq AS DOUBLE) / CAST(SUM(vq) OVER () AS DOUBLE)
               AS value_share
    FROM agg ORDER BY age_bucket
"""

ORACLES["status_mix_trend"] = """
    WITH counts AS (
        SELECT o_orderstatus AS status,
               CAST(YEAR(CAST(o_orderdate AS DATE)) * 4
                    + QUARTER(CAST(o_orderdate AS DATE)) - 1 AS BIGINT)
                   AS qi,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1, 2),
    shared AS (
        SELECT status,
               qi - MIN(qi) OVER () AS x,
               CAST(FLOOR(CAST(n AS DOUBLE)
                          / CAST(SUM(n) OVER (PARTITION BY qi) AS DOUBLE)
                          * 1e9) AS BIGINT) AS sq
        FROM counts),
    moments AS (
        SELECT status, CAST(COUNT(*) AS BIGINT) AS n_quarters,
               SUM(x) AS sx,
               SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
               SUM(sq) AS sy,
               SUM(CAST(x AS DECIMAL(38,0)) * sq) AS sxy,
               CAST(arg_min(sq, x) AS DOUBLE) / 1e9 AS first_share,
               CAST(arg_max(sq, x) AS DOUBLE) / 1e9 AS last_share
        FROM shared GROUP BY 1)
    SELECT status, n_quarters, first_share, last_share,
           (CAST(n_quarters AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
            - CAST(sx AS DOUBLE) * (CAST(sy AS DOUBLE) / 1e9))
           / (CAST(n_quarters AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               AS slope_per_quarter
    FROM moments ORDER BY status
"""

ORACLES["supplier_churn"] = """
    WITH sy AS (
        SELECT DISTINCT l_suppkey,
               YEAR(CAST(l_shipdate AS DATE)) AS yr
        FROM lineitem),
    marked AS (
        SELECT yr,
               CASE WHEN LAG(yr) OVER (PARTITION BY l_suppkey
                                       ORDER BY yr) IS NULL
                    THEN 1 ELSE 0 END AS is_new,
               CASE WHEN LAG(yr) OVER (PARTITION BY l_suppkey
                                       ORDER BY yr) = yr - 1
                    THEN 1 ELSE 0 END AS is_retained
        FROM sy)
    SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(is_new) AS BIGINT) AS n_new,
           CAST(SUM(is_retained) AS BIGINT) AS n_retained,
           CAST(SUM(is_retained) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS retained_share
    FROM marked GROUP BY 1 ORDER BY yr
"""

ORACLES["customer_pareto_overlap"] = """
    WITH per_cust AS (
        SELECT o_custkey,
               SUM(CAST(FLOOR(o_totalprice * 1e6) AS BIGINT)) AS revq,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1),
    ranked AS (
        SELECT o_custkey, revq,
               ROW_NUMBER() OVER (ORDER BY revq DESC, o_custkey) AS rrank,
               ROW_NUMBER() OVER (ORDER BY n_orders DESC, o_custkey)
                   AS crank
        FROM per_cust),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
               SUM(revq) AS total_revq
        FROM per_cust),
    flagged AS (
        SELECT revq, n_customers, total_revq,
               rrank <= n_customers // 5 AS in_rev_top,
               crank <= n_customers // 5 AS in_cnt_top
        FROM ranked CROSS JOIN tot)
    SELECT CAST(MIN(n_customers) AS BIGINT) AS n_customers,
           CAST(MIN(n_customers) // 5 AS BIGINT) AS k_top,
           CAST(count_if(in_rev_top AND in_cnt_top) AS BIGINT) AS n_overlap,
           CAST(count_if(in_rev_top AND in_cnt_top) AS DOUBLE)
               / (2.0 * CAST(MIN(n_customers) // 5 AS DOUBLE)
                  - CAST(count_if(in_rev_top AND in_cnt_top) AS DOUBLE))
               AS jaccard,
           CAST(SUM(CASE WHEN in_cnt_top THEN revq END) AS DOUBLE)
               / CAST(MIN(total_revq) AS DOUBLE) AS cnt_top_revenue_share
    FROM flagged
"""

ORACLES["flag_priority_residuals"] = """
    WITH obs AS (
        SELECT l.l_returnflag AS returnflag, o.o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2),
    row_m AS (SELECT returnflag, SUM(n_obs) AS row_n FROM obs GROUP BY 1),
    col_m AS (SELECT priority, SUM(n_obs) AS col_n FROM obs GROUP BY 1),
    tot AS (SELECT SUM(n_obs) AS grand_n FROM obs)
    SELECT o.returnflag, o.priority, o.n_obs,
           CAST(r.row_n AS DOUBLE) * CAST(c.col_n AS DOUBLE)
               / CAST(t.grand_n AS DOUBLE) AS n_expected,
           (CAST(o.n_obs AS DOUBLE)
            - CAST(r.row_n AS DOUBLE) * CAST(c.col_n AS DOUBLE)
              / CAST(t.grand_n AS DOUBLE))
           / SQRT(CAST(r.row_n AS DOUBLE) * CAST(c.col_n AS DOUBLE)
                  / CAST(t.grand_n AS DOUBLE)) AS std_residual,
           ((CAST(o.n_obs AS DOUBLE)
             - CAST(r.row_n AS DOUBLE) * CAST(c.col_n AS DOUBLE)
               / CAST(t.grand_n AS DOUBLE))
            / SQRT(CAST(r.row_n AS DOUBLE) * CAST(c.col_n AS DOUBLE)
                   / CAST(t.grand_n AS DOUBLE)))
           * ((CAST(o.n_obs AS DOUBLE)
               - CAST(r.row_n AS DOUBLE) * CAST(c.col_n AS DOUBLE)
                 / CAST(t.grand_n AS DOUBLE))
              / SQRT(CAST(r.row_n AS DOUBLE) * CAST(c.col_n AS DOUBLE)
                     / CAST(t.grand_n AS DOUBLE))) AS chi2_contrib
    FROM obs o JOIN row_m r ON o.returnflag = r.returnflag
    JOIN col_m c ON o.priority = c.priority
    CROSS JOIN tot t
    ORDER BY o.returnflag, o.priority
"""

ORACLES["purchase_acceleration"] = """
    WITH gaps AS (
        SELECT o_custkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY CAST(o_orderdate AS DATE),
                                           o_orderkey) - 1 AS i,
               date_diff('day',
                         LAG(CAST(o_orderdate AS DATE))
                             OVER (PARTITION BY o_custkey
                                   ORDER BY CAST(o_orderdate AS DATE),
                                            o_orderkey),
                         CAST(o_orderdate AS DATE)) AS gap
        FROM orders),
    mom AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_gaps,
               SUM(i) AS sx, SUM(CAST(i AS DECIMAL(38,0)) * i) AS sxx,
               SUM(gap) AS sy, SUM(CAST(i AS DECIMAL(38,0)) * gap) AS sxy
        FROM gaps WHERE gap IS NOT NULL GROUP BY 1),
    sloped AS (
        SELECT o_custkey,
               CAST(FLOOR((CAST(n_gaps AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / (CAST(n_gaps AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * 1e6) AS BIGINT) AS slq
        FROM mom WHERE n_gaps >= 3)
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(slq) AS DOUBLE) / 1e6 / CAST(COUNT(*) AS DOUBLE)
               AS mean_gap_trend,
           CAST(count_if(slq < 0) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS accelerating_share
    FROM sloped s JOIN customer c ON s.o_custkey = c.c_custkey
    GROUP BY 1 ORDER BY segment
"""

ORACLES["brand_loyalty"] = """
    WITH lines AS (
        SELECT o.o_custkey, o.o_orderkey, p.p_brand
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey),
    per_cust_brand AS (
        SELECT o_custkey, p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
        FROM lines GROUP BY 1, 2),
    per_cust AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS total_lines
        FROM lines GROUP BY 1),
    wallet AS (
        SELECT b.p_brand, b.n_orders,
               CAST(FLOOR(CAST(b.n_lines AS DOUBLE)
                          / CAST(c.total_lines AS DOUBLE) * 1e9)
                    AS BIGINT) AS wq
        FROM per_cust_brand b JOIN per_cust c
          ON b.o_custkey = c.o_custkey)
    SELECT p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n_buyers,
           CAST(count_if(n_orders >= 2) AS BIGINT) AS n_repeat_buyers,
           CAST(count_if(n_orders >= 2) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS repeat_share,
           CAST(SUM(wq) AS DOUBLE) / 1e9 / CAST(COUNT(*) AS DOUBLE)
               AS mean_wallet_share
    FROM wallet GROUP BY 1 ORDER BY brand
"""

ORACLES["order_size_profile"] = """
    WITH per_order AS (
        SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
               SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 1e6)
                        AS BIGINT)) AS vq
        FROM lineitem GROUP BY 1),
    hist AS (
        SELECT n_lines, CAST(COUNT(*) AS BIGINT) AS n_orders, SUM(vq) AS vq
        FROM per_order GROUP BY 1)
    SELECT n_lines, n_orders,
           CAST(n_orders AS DOUBLE) / CAST(SUM(n_orders) OVER () AS DOUBLE)
               AS order_share,
           CAST(SUM(n_orders) OVER (ORDER BY n_lines
                                    ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               / CAST(SUM(n_orders) OVER () AS DOUBLE) AS cum_order_share,
           CAST(vq AS DOUBLE) / CAST(SUM(vq) OVER () AS DOUBLE)
               AS value_share
    FROM hist ORDER BY n_lines
"""

ORACLES["volume_price_decomposition"] = """
    WITH monthly AS (
        SELECT date_trunc('month', l_shipdate) AS month,
               SUM(CAST(FLOOR(l_quantity * 1e6) AS BIGINT)) AS qq,
               SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 1e6)
                        AS BIGINT)) AS rq
        FROM lineitem GROUP BY 1),
    lagged AS (
        SELECT month, qq, rq,
               LAG(qq) OVER (ORDER BY month) AS pqq,
               LAG(rq) OVER (ORDER BY month) AS prq
        FROM monthly)
    SELECT month,
           CAST(rq AS DOUBLE) / 1e6 AS revenue,
           CAST(rq AS DOUBLE) / 1e6 - CAST(prq AS DOUBLE) / 1e6
               AS revenue_delta,
           (CAST(qq AS DOUBLE) / 1e6 - CAST(pqq AS DOUBLE) / 1e6)
               * ((CAST(prq AS DOUBLE) / 1e6) / (CAST(pqq AS DOUBLE) / 1e6))
               AS volume_effect,
           ((CAST(rq AS DOUBLE) / 1e6) / (CAST(qq AS DOUBLE) / 1e6)
            - (CAST(prq AS DOUBLE) / 1e6) / (CAST(pqq AS DOUBLE) / 1e6))
               * (CAST(qq AS DOUBLE) / 1e6) AS price_effect
    FROM lagged WHERE pqq IS NOT NULL ORDER BY month
"""

ORACLES["tax_rate_profile"] = """
    WITH rated AS (
        SELECT CAST(FLOOR(l_tax * 1e4) AS BIGINT) AS tax_bp,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 1e6)
                        AS BIGINT)) AS rq
        FROM lineitem GROUP BY 1)
    SELECT tax_bp, n_lines,
           CAST(n_lines AS DOUBLE) / CAST(SUM(n_lines) OVER () AS DOUBLE)
               AS line_share,
           CAST(rq AS DOUBLE) / CAST(SUM(rq) OVER () AS DOUBLE)
               AS revenue_share,
           CAST(SUM(CAST(tax_bp AS DECIMAL(38,0)) * rq) OVER () AS DOUBLE)
               / 1e4 / CAST(SUM(rq) OVER () AS DOUBLE) AS blended_rate
    FROM rated ORDER BY tax_bp
"""

ORACLES["line_position_effect"] = """
    WITH per AS (
        SELECT CAST(l_linenumber AS INT) AS line_no,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0)
                        AS BIGINT)) AS rev_c,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,8))) AS DOUBLE)
                   / COUNT(l_quantity) AS avg_qty,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,8))) AS DOUBLE)
                   / COUNT(l_discount) AS avg_discount
        FROM lineitem GROUP BY 1)
    SELECT line_no, n_lines,
           CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
           CAST(rev_c AS DOUBLE) / CAST(SUM(rev_c) OVER () AS DOUBLE)
               AS revenue_share,
           avg_qty, avg_discount
    FROM per ORDER BY line_no
"""

ORACLES["part_supplier_cardinality"] = """
    WITH per_part AS (
        SELECT l_partkey,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
               SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0)
                        AS BIGINT)) AS rev_c
        FROM lineitem GROUP BY 1)
    SELECT n_suppliers,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev_c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0
               AS mean_part_revenue
    FROM per_part GROUP BY 1 ORDER BY n_suppliers
"""

ORACLES["order_dow_profile"] = """
    WITH per AS (
        SELECT CAST(dayofweek(CAST(o_orderdate AS TIMESTAMP)) + 1 AS INT)
                   AS dow,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS rev_c
        FROM orders GROUP BY 1)
    SELECT dow, n_orders,
           CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
           CAST(rev_c AS DOUBLE) / CAST(SUM(rev_c) OVER () AS DOUBLE)
               AS revenue_share
    FROM per ORDER BY dow
"""

ORACLES["brand_price_realization"] = """
    WITH j AS (
        SELECT p.p_brand,
               CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount)
                          / l.l_quantity * 1e6) AS BIGINT) AS qu,
               CAST(p.p_retailprice AS DECIMAL(18,8)) AS rp
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    per AS (
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(qu) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e6
                   AS mean_unit_price,
               CAST(SUM(rp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS mean_retail_price
        FROM j GROUP BY 1)
    SELECT p_brand, n_lines, mean_unit_price, mean_retail_price,
           mean_unit_price / mean_retail_price AS realization_ratio
    FROM per ORDER BY p_brand
"""

ORACLES["priority_value_skew"] = """
    WITH ranked AS (
        SELECT o_orderpriority, qv,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY qv, o_orderkey) AS rk,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM (SELECT o_orderpriority, o_orderkey,
                     CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS qv
              FROM orders)),
    per AS (
        SELECT o_orderpriority,
               CAST(MAX(n) AS BIGINT) AS n_orders,
               CAST(SUM(qv) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) / 100.0
                   AS mean_value,
               CAST(MAX(CASE WHEN rk = GREATEST(1, (90 * n) // 100)
                             THEN qv END) AS DOUBLE) / 100.0 AS p90_value
        FROM ranked GROUP BY 1)
    SELECT o_orderpriority, n_orders, mean_value, p90_value,
           p90_value / mean_value AS skew_ratio
    FROM per ORDER BY o_orderpriority
"""

ORACLES["discount_tax_interaction"] = """
    WITH per AS (
        SELECT CAST(FLOOR(l_discount * 100.0) AS BIGINT) AS disc_pct,
               CAST(FLOOR(l_tax * 100.0) AS BIGINT) AS tax_pct,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem GROUP BY 1, 2)
    SELECT disc_pct, tax_pct, n_lines,
           CAST(n_lines AS DOUBLE)
               * CAST(SUM(n_lines) OVER () AS DOUBLE)
               / (CAST(SUM(n_lines) OVER (PARTITION BY disc_pct) AS DOUBLE)
                  * CAST(SUM(n_lines) OVER (PARTITION BY tax_pct) AS DOUBLE))
               AS lift
    FROM per ORDER BY disc_pct, tax_pct
"""

ORACLES["balance_sign_profile"] = """
    WITH c AS (
        SELECT c_custkey AS ck,
               CASE WHEN c_acctbal < 0 THEN 'negative'
                    WHEN c_acctbal < 1000 THEN 'low'
                    ELSE 'healthy' END AS credit_band
        FROM customer),
    j AS (
        SELECT c.credit_band, c.ck,
               CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT) AS qv
        FROM c LEFT JOIN orders o ON o.o_custkey = c.ck)
    SELECT credit_band,
           CAST(COUNT(DISTINCT ck) AS BIGINT) AS n_customers,
           CAST(COUNT(qv) AS BIGINT) AS n_orders,
           CAST(SUM(qv) AS DOUBLE)
               / CAST(GREATEST(COUNT(qv), 1) AS DOUBLE) / 100.0
               AS mean_order_value
    FROM j GROUP BY 1 ORDER BY credit_band
"""

ORACLES["order_total_consistency"] = """
    WITH per_order AS (
        SELECT l_orderkey,
               SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                              * (1.0 + l_tax) * 100.0) AS BIGINT)) AS li_c
        FROM lineitem GROUP BY 1),
    j AS (
        SELECT CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT) AS o_c,
               p.li_c
        FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey),
    banded AS (
        SELECT CASE WHEN li_c IS NULL THEN 'no_lineitems'
                    WHEN CAST(abs(o_c - COALESCE(li_c, 0)) AS DOUBLE)
                         / CAST(o_c AS DOUBLE) <= 0.0001 THEN 'exact'
                    WHEN CAST(abs(o_c - COALESCE(li_c, 0)) AS DOUBLE)
                         / CAST(o_c AS DOUBLE) < 0.01 THEN 'under_1pct'
                    ELSE 'over_1pct' END AS consistency_band,
               abs(o_c - COALESCE(li_c, 0)) AS gap_c
        FROM j)
    SELECT consistency_band,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(gap_c) AS DOUBLE) / 100.0 AS max_abs_gap
    FROM banded GROUP BY 1 ORDER BY consistency_band
"""

ORACLES["order_ship_span"] = """
    WITH per AS (
        SELECT l_orderkey,
               date_diff('day', CAST(MIN(l_shipdate) AS DATE),
                         CAST(MAX(l_shipdate) AS DATE)) AS span,
               COUNT(*) AS n_lines,
               CAST(FLOOR(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                                        AS DECIMAL(18,8))) AS DOUBLE) * 1e6)
                    AS BIGINT) AS qrev
        FROM lineitem GROUP BY 1)
    SELECT CAST(LEAST(span, 7) AS INT) AS span_band,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(n_lines) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mean_lines,
           CAST(SUM(qrev) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e6
               AS mean_revenue
    FROM per GROUP BY 1 ORDER BY 1
"""

ORACLES["quantity_integrality"] = """
    WITH per AS (
        SELECT l_linestatus, l_quantity,
               CAST(l_quantity != CAST(FLOOR(l_quantity) AS DOUBLE) AS INT)
                   AS nonint,
               CAST(l_quantity < 1.0 OR l_quantity > 50.0 AS INT) AS oob
        FROM lineitem)
    SELECT l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(nonint) AS BIGINT) AS n_noninteger,
           CAST(SUM(oob) AS BIGINT) AS n_out_of_range,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           MIN(l_quantity) AS min_quantity,
           MAX(l_quantity) AS max_quantity
    FROM per GROUP BY 1 ORDER BY 1
"""
