"""DuckDB oracle SQL for SURVEY §2 group A (twin of datacube_queries.py)."""

from icecube_spark.functions.parity import sql_davg, sql_dsum

_BANDS = ["click", "error", "purchase", "signup", "view"]

_pivot_cols = ",\n               ".join(
    f"CAST(SUM(CASE WHEN event_type='{b}' THEN CAST(value AS DECIMAL(18,8)) END) AS DOUBLE)"
    f" / COUNT(CASE WHEN event_type='{b}' THEN value END) AS {b}"
    for b in _BANDS
)

ORACLES: dict[str, str] = {
    "metadata_summary": f"""
        SELECT event_type,
               COUNT(*) AS n_products,
               MIN(ts) AS first_acq,
               MAX(ts) AS last_acq,
               {sql_davg('value')} AS avg_value,
               COUNT(DISTINCT user_id) AS n_stacks
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "cube_config_filter": """
        SELECT event_id, ts, user_id, event_type, value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-08' AND ts <= TIMESTAMP '2024-01-22'
          AND value >= 20.0 AND value <= 80.0
    """,
    "cube_temporal_dedup": """
        SELECT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS acq_date, event_id, event_type, value
        FROM events
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY user_id, CAST(ts AS DATE)
            ORDER BY ts DESC, event_id DESC
        ) = 1
    """,
    "cube_resample_gapfill": f"""
        WITH grid AS (
            SELECT u.user_id, g.bucket_start,
                   CAST(FLOOR(date_diff('second', TIMESTAMP '2024-01-01', g.bucket_start) / 259200) AS INT) AS bucket
            FROM (SELECT DISTINCT user_id FROM events) u
            CROSS JOIN (
                SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-30', INTERVAL 3 DAY)) AS bucket_start
            ) g
        ), bucketed AS (
            SELECT user_id,
                   CAST(FLOOR(date_diff('second', TIMESTAMP '2024-01-01', ts) / 259200) AS INT) AS bucket,
                   COUNT(*) AS n_acq,
                   {sql_dsum('value')} AS sum_value
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01' AND ts <= TIMESTAMP '2024-01-30'
            GROUP BY 1, 2
        )
        SELECT grid.user_id, grid.bucket_start,
               COALESCE(b.n_acq, 0) AS n_acq,
               b.sum_value AS sum_value,
               CASE WHEN b.n_acq IS NULL THEN 'temporal_gap' ELSE 'acquisition' END AS description
        FROM grid LEFT JOIN bucketed b
          ON grid.user_id = b.user_id AND grid.bucket = b.bucket
        ORDER BY grid.user_id, grid.bucket_start
    """,
    "cube_pivot": f"""
        SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS acq_date,
               {_pivot_cols}
        FROM events
        GROUP BY acq_date
        ORDER BY acq_date
    """,
    "metadata_concat": """
        SELECT user_id,
               array_to_string(list_sort(list(DISTINCT event_type)), ',') AS band_types,
               COUNT(DISTINCT CAST(ts AS DATE)) AS n_dates,
               COUNT(*) AS n_layers
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "spatial_overlap_1d": """
        WITH primary_ext AS (
            SELECT o_totalprice * 0.9 AS p_lo, o_totalprice * 1.1 AS p_hi
            FROM orders ORDER BY o_orderdate, o_orderkey LIMIT 1
        )
        SELECT o_orderkey, o_orderdate, o_totalprice
        FROM orders, primary_ext
        WHERE o_totalprice * 0.9 <= p_hi AND p_lo <= o_totalprice * 1.1
    """,
    "labels_align": """
        SELECT l_orderkey, l_linenumber, l_partkey,
               COALESCE(p_name, 'NA') AS label,
               CASE WHEN p_name IS NULL THEN 'unlabeled' ELSE 'labeled' END AS description
        FROM lineitem
        LEFT JOIN (SELECT p_partkey, p_name FROM part WHERE p_size > 25) p
          ON l_partkey = p_partkey
    """,
    "cube_merge": """
        SELECT event_id, user_id, event_type, value, src
        FROM (
            SELECT event_id, user_id, event_type, value, 1 AS src
            FROM events WHERE value >= 40
            UNION ALL
            SELECT event_id, user_id, event_type, value, 2 AS src
            FROM events WHERE value < 60
        )
        QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY src) = 1
    """,
    "sar_band_math": """
        SELECT vec_id,
               embedding[1] AS re,
               embedding[2] AS im,
               SQRT(embedding[1]*embedding[1] + embedding[2]*embedding[2]) AS amplitude,
               embedding[1]*embedding[1] + embedding[2]*embedding[2] AS intensity
        FROM embeddings
    """,
}

ORACLES["labels_vector_align"] = """
    WITH ev AS (SELECT event_id FROM events WHERE event_id < 2000),
    objs AS (
        SELECT event_id,
               ((event_id + i) % 7) AS xmin,
               ((event_id + 2*i) % 11) AS ymin,
               ((event_id + i) % 7 + 1 + (event_id + i) % 13) AS xmax,
               ((event_id + 2*i) % 11 + 1 + (event_id + 3*i) % 17) AS ymax,
               'class_' || CAST((event_id + i) % 5 AS VARCHAR) AS cls
        FROM ev, range(2) t(i)
        WHERE event_id % 3 = 0 AND i <= event_id % 2),
    stats AS (
        SELECT event_id, COUNT(*) AS n_objects,
               array_to_string(list_sort(list_distinct(list(cls))), ',') AS classes,
               SUM((xmax - xmin) * (ymax - ymin)) AS total_area
        FROM objs GROUP BY event_id)
    SELECT ev.event_id,
           COALESCE(n_objects, 0) AS n_objects,
           COALESCE(classes, 'NA') AS classes,
           CAST(COALESCE(total_area, 0) AS BIGINT) AS total_area
    FROM ev LEFT JOIN stats USING (event_id)
    ORDER BY event_id
"""

ORACLES["cube_completeness"] = """
    WITH grid AS (
        SELECT u.user_id, g.bucket_start
        FROM (SELECT DISTINCT user_id FROM events) u
        CROSS JOIN (
            SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01',
                TIMESTAMP '2024-01-30', INTERVAL 3 DAY)) AS bucket_start
        ) g
    ), bucketed AS (
        SELECT user_id,
               CAST(FLOOR(date_diff('second', TIMESTAMP '2024-01-01', ts)
                    / 259200) AS INT) AS bucket,
               COUNT(*) AS n_acq
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts <= TIMESTAMP '2024-01-30'
        GROUP BY 1, 2
    ), slots AS (
        SELECT grid.user_id, b.n_acq
        FROM grid LEFT JOIN bucketed b
          ON grid.user_id = b.user_id
         AND CAST(FLOOR(date_diff('second', TIMESTAMP '2024-01-01',
                  grid.bucket_start) / 259200) AS INT) = b.bucket
    )
    SELECT user_id, COUNT(*) AS n_slots,
           CAST(SUM(CASE WHEN n_acq IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_filled,
           CAST(COUNT(*) - SUM(CASE WHEN n_acq IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_gaps,
           SUM(CASE WHEN n_acq IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*)
               AS fill_ratio
    FROM slots GROUP BY 1 ORDER BY 1
"""

ORACLES["cube_resample_interpolate"] = f"""
    WITH grid AS (
        SELECT u.user_id, g.bucket_start,
               CAST(FLOOR(date_diff('second', TIMESTAMP '2024-01-01',
                                    g.bucket_start) / 259200) AS INT) AS bucket
        FROM (SELECT DISTINCT user_id FROM events) u
        CROSS JOIN (
            SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01',
                                          TIMESTAMP '2024-01-30',
                                          INTERVAL 3 DAY)) AS bucket_start
        ) g
    ), bucketed AS (
        SELECT user_id,
               CAST(FLOOR(date_diff('second', TIMESTAMP '2024-01-01', ts)
                          / 259200) AS INT) AS bucket,
               {sql_dsum('value')} / COUNT(*) AS mean_value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts <= TIMESTAMP '2024-01-30'
        GROUP BY 1, 2
    ), joined AS (
        SELECT grid.user_id, grid.bucket_start,
               date_diff('day', TIMESTAMP '2024-01-01', grid.bucket_start)
                   AS x,
               b.mean_value
        FROM grid LEFT JOIN bucketed b
          ON grid.user_id = b.user_id AND grid.bucket = b.bucket
    ), carried AS (
        SELECT *,
               last_value(mean_value IGNORE NULLS) OVER wp AS prev_v,
               last_value(CASE WHEN mean_value IS NOT NULL THEN x END
                          IGNORE NULLS) OVER wp AS prev_x,
               first_value(mean_value IGNORE NULLS) OVER wn AS next_v,
               first_value(CASE WHEN mean_value IS NOT NULL THEN x END
                           IGNORE NULLS) OVER wn AS next_x
        FROM joined
        WINDOW wp AS (PARTITION BY user_id ORDER BY x
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               wn AS (PARTITION BY user_id ORDER BY x
                      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    ), interp AS (
        SELECT *,
               prev_v + (next_v - prev_v) * CAST(x - prev_x AS DOUBLE)
                   / CAST(next_x - prev_x AS DOUBLE) AS iv
        FROM carried
    )
    SELECT user_id, bucket_start, mean_value,
           COALESCE(mean_value, iv) AS filled_value,
           CASE WHEN mean_value IS NOT NULL THEN 'observed'
                WHEN iv IS NOT NULL THEN 'interpolated'
                ELSE 'edge_gap' END AS fill_kind
    FROM interp ORDER BY user_id, bucket_start
"""

from icecube_spark.operators.spatial import (  # noqa: E402
    quad_footprint_sql,
    quad_intersect_sql,
)

_FP = quad_footprint_sql("p_partkey", "__space")
_VERTS = ",\n               ".join(
    f"{sql} AS {name}" for name, sql in list(_FP.items())[:8]
)
ORACLES["spatial_overlap_polygon"] = f"""
    WITH sp AS (
        SELECT CAST(FLOOR(SQRT(CAST(MAX(p_partkey) AS DOUBLE) * 50000.0))
                    AS BIGINT) AS __space
        FROM part),
    vert AS (
        SELECT p_partkey AS raster_id,
               {_VERTS}
        FROM part CROSS JOIN sp),
    polys AS (
        SELECT *, LEAST(x1, x2, x3, x4) AS xmin,
                  GREATEST(x1, x2, x3, x4) AS xmax,
                  LEAST(y1, y2, y3, y4) AS ymin,
                  GREATEST(y1, y2, y3, y4) AS ymax
        FROM vert)
    SELECT a.raster_id AS raster_id_a, b.raster_id AS raster_id_b
    FROM polys a JOIN polys b
      ON a.raster_id < b.raster_id
     AND a.xmin <= b.xmax AND b.xmin <= a.xmax
     AND a.ymin <= b.ymax AND b.ymin <= a.ymax
     AND {quad_intersect_sql("a.", "b.")}
    ORDER BY raster_id_a, raster_id_b
"""

ORACLES["spatial_bbox_join"] = """
    WITH boxes AS (
        SELECT s_suppkey AS raster_id,
               (s_suppkey * 7919) % 1000 AS xmin,
               (s_suppkey * 104729) % 1000 AS ymin,
               (s_suppkey * 7919) % 1000 + 50 + s_suppkey % 50 AS xmax,
               (s_suppkey * 104729) % 1000 + 50 + (s_suppkey * 13) % 50 AS ymax
        FROM supplier)
    SELECT a.raster_id AS raster_id_a, b.raster_id AS raster_id_b,
           (LEAST(a.xmax, b.xmax) - GREATEST(a.xmin, b.xmin))
         * (LEAST(a.ymax, b.ymax) - GREATEST(a.ymin, b.ymin)) AS overlap_area
    FROM boxes a JOIN boxes b
      ON a.raster_id < b.raster_id
     AND a.xmin <= b.xmax AND b.xmin <= a.xmax
     AND a.ymin <= b.ymax AND b.ymin <= a.ymax
    ORDER BY raster_id_a, raster_id_b
"""


ORACLES["cube_change_detection"] = """
    SELECT user_id, ts, event_id, value, prev_value,
           CASE WHEN prev_value != 0 THEN value / prev_value END AS ratio,
           COALESCE(
               CASE WHEN prev_value != 0 THEN value / prev_value END > 1.5
               OR CASE WHEN prev_value != 0 THEN value / prev_value END * 1.5
                  < 1.0, FALSE) AS changed
    FROM (
        SELECT user_id, ts, event_id, value,
               lag(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_value
        FROM events)
    ORDER BY user_id, ts, event_id
"""


ORACLES["cube_mosaic"] = f"""
    WITH sp AS (
        SELECT CAST(FLOOR(SQRT(CAST(MAX(p_partkey) AS DOUBLE) * 50000.0))
                    AS BIGINT) AS __space
        FROM part),
    vert AS (
        SELECT p_partkey AS raster_id,
               {_VERTS}
        FROM part CROSS JOIN sp),
    polys AS (
        SELECT *, LEAST(x1, x2, x3, x4) AS xmin,
                  GREATEST(x1, x2, x3, x4) AS xmax,
                  LEAST(y1, y2, y3, y4) AS ymin,
                  GREATEST(y1, y2, y3, y4) AS ymax
        FROM vert),
    cells AS (
        SELECT raster_id,
               UNNEST(range(CAST(FLOOR(xmin / 128) AS BIGINT),
                            CAST(FLOOR(xmax / 128) AS BIGINT) + 1)) AS cx,
               ymin, ymax
        FROM polys),
    cells2 AS (
        SELECT raster_id, cx,
               UNNEST(range(CAST(FLOOR(ymin / 128) AS BIGINT),
                            CAST(FLOOR(ymax / 128) AS BIGINT) + 1)) AS cy
        FROM cells)
    SELECT cx, cy, MAX(raster_id) AS raster_id,
           COUNT(*) AS n_candidates
    FROM cells2 GROUP BY 1, 2 ORDER BY cx, cy
"""

ORACLES["cube_composite"] = """
    WITH mom AS (
        SELECT user_id AS stack_id, event_type AS band,
               COUNT(*) AS n_scenes,
               SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) AS sq,
               SUM(CAST(CAST(FLOOR(value * 1000000.0) AS BIGINT) AS HUGEINT)
                   * CAST(FLOOR(value * 1000000.0) AS BIGINT)) AS sq2,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events GROUP BY 1, 2
    )
    SELECT stack_id, band, n_scenes,
           (CAST(sq AS DOUBLE) / 1000000.0) / CAST(n_scenes AS DOUBLE)
               AS mean_value,
           SQRT((CAST(n_scenes AS DOUBLE)
                   * (CAST(sq2 AS DOUBLE) / 1000000000000.0)
                 - (CAST(sq AS DOUBLE) / 1000000.0)
                   * (CAST(sq AS DOUBLE) / 1000000.0))
                / (CAST(n_scenes AS DOUBLE) * CAST(n_scenes AS DOUBLE)))
               AS std_value,
           min_value, max_value
    FROM mom
"""

ORACLES["zonal_stats"] = """
    WITH px AS (
        SELECT (event_id * 37) % 1000 AS x,
               (event_id * 61) % 1000 AS y,
               value
        FROM events
    ),
    zones AS (
        SELECT zone_id, xmin, ymin,
               xmin + 50 + zone_id % 50 AS xmax,
               ymin + 50 + (zone_id * 13) % 50 AS ymax
        FROM (SELECT s_suppkey AS zone_id,
                     (s_suppkey * 7919) % 1000 AS xmin,
                     (s_suppkey * 104729) % 1000 AS ymin
              FROM supplier)
    )
    SELECT zone_id,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE) / COUNT(value)
               AS mean_value,
           CAST(MIN(value) AS DOUBLE) AS min_value,
           CAST(MAX(value) AS DOUBLE) AS max_value
    FROM px JOIN zones
      ON px.x >= zones.xmin AND px.x <= zones.xmax
     AND px.y >= zones.ymin AND px.y <= zones.ymax
    GROUP BY zone_id
    ORDER BY zone_id
"""

ORACLES["cube_downsample"] = """
    WITH px AS (
        SELECT (event_id * 37) % 1000 AS x,
               (event_id * 61) % 1000 AS y,
               value
        FROM events
    ),
    l1 AS (
        SELECT CAST(FLOOR(x / 4) AS INT) AS bx,
               CAST(FLOOR(y / 4) AS INT) AS by,
               CAST(COUNT(*) AS BIGINT) AS n_pixels,
               SUM(CAST(value AS DECIMAL(18,8))) AS dsum
        FROM px GROUP BY 1, 2
    ),
    l2 AS (
        SELECT CAST(FLOOR(bx / 4) AS INT) AS bx,
               CAST(FLOOR(by / 4) AS INT) AS by,
               CAST(SUM(n_pixels) AS BIGINT) AS n_pixels,
               SUM(dsum) AS dsum
        FROM l1 GROUP BY 1, 2
    )
    SELECT CAST(1 AS INT) AS level, bx, by, n_pixels,
           CAST(dsum AS DOUBLE) / n_pixels AS mean_value
    FROM l1
    UNION ALL
    SELECT CAST(2 AS INT) AS level, bx, by, n_pixels,
           CAST(dsum AS DOUBLE) / n_pixels AS mean_value
    FROM l2
    ORDER BY level, bx, by
"""

ORACLES["focal_mean"] = """
    WITH cells AS (
        SELECT event_id % 1000 AS x,
               CAST(FLOOR(event_id / 1000) AS BIGINT) % 1000 AS y,
               CAST(COUNT(*) AS BIGINT) AS n_obs,
               SUM(CAST(value AS DECIMAL(18,8))) AS cell_sum
        FROM events GROUP BY 1, 2
    ),
    offs AS (SELECT UNNEST([-1, 0, 1]) AS dx),
    offs2 AS (SELECT UNNEST([-1, 0, 1]) AS dy),
    contrib AS (
        SELECT x + dx AS tx, y + dy AS ty, cell_sum, n_obs
        FROM cells, offs, offs2
        WHERE x + dx >= 0 AND x + dx < 1000
          AND y + dy >= 0 AND y + dy < 1000
    ),
    focal AS (
        SELECT tx, ty,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(SUM(n_obs) AS BIGINT) AS n_obs,
               SUM(cell_sum) AS fsum
        FROM contrib GROUP BY 1, 2
    )
    SELECT f.tx AS x, f.ty AS y, f.n_cells, f.n_obs,
           CAST(f.fsum AS DOUBLE) / f.n_obs AS focal_mean
    FROM focal f JOIN cells c ON c.x = f.tx AND c.y = f.ty
    ORDER BY x, y
"""

ORACLES["cube_gradient"] = """
    WITH cells AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                   / COUNT(value) AS v
        FROM events GROUP BY 1, 2
    )
    SELECT c.x, c.y, c.v AS center,
           (e.v - w.v) / 2.0 AS gx,
           (n.v - s.v) / 2.0 AS gy,
           sqrt(((e.v - w.v) / 2.0) * ((e.v - w.v) / 2.0)
                + ((n.v - s.v) / 2.0) * ((n.v - s.v) / 2.0)) AS grad_mag
    FROM cells c
    JOIN cells w ON w.x = c.x - 1 AND w.y = c.y
    JOIN cells e ON e.x = c.x + 1 AND e.y = c.y
    JOIN cells s ON s.x = c.x AND s.y = c.y - 1
    JOIN cells n ON n.x = c.x AND n.y = c.y + 1
    ORDER BY c.x, c.y
"""

ORACLES["cube_coregister"] = """
    WITH px AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               value,
               CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16' AS is_a
        FROM events
    ),
    a AS (
        SELECT x, y, CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                         / COUNT(value) AS v
        FROM px WHERE is_a GROUP BY 1, 2
    ),
    b AS (
        SELECT x, y, CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                         / COUNT(value) AS v
        FROM px WHERE NOT is_a GROUP BY 1, 2
    ),
    shifts AS (
        SELECT dx.d AS dx, dy.d AS dy
        FROM (SELECT UNNEST(range(-2, 3)) AS d) dx,
             (SELECT UNNEST(range(-2, 3)) AS d) dy
    ),
    scored AS (
        SELECT s.dx, s.dy,
               CAST(COUNT(*) AS BIGINT) AS n_overlap,
               SUM(CAST(FLOOR(a.v * b.v * 1e6) AS BIGINT)) AS qxcorr
        FROM a CROSS JOIN shifts s
        JOIN b ON b.x = a.x + s.dx AND b.y = a.y + s.dy
        GROUP BY 1, 2
    )
    SELECT CAST(ROW_NUMBER() OVER (
               ORDER BY CAST(qxcorr AS DOUBLE) / CAST(n_overlap AS DOUBLE)
                        / 1e6 DESC, dx, dy) AS INT) AS rank,
           dx, dy, n_overlap,
           CAST(qxcorr AS DOUBLE) / CAST(n_overlap AS DOUBLE) / 1e6
               AS mean_xcorr
    FROM scored
    ORDER BY rank
"""

ORACLES["cube_hist_equalize"] = """
    WITH ranked AS (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM events
    )
    SELECT user_id, event_id, value,
           CASE WHEN n > 1
                THEN CAST(rn - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
                ELSE 0.0 END AS equalized
    FROM ranked
    ORDER BY user_id, event_id
"""

ORACLES["cube_band_index"] = """
    WITH daily AS (
        SELECT user_id,
               CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
               SUM(CASE WHEN event_type = 'click'
                        THEN CAST(value AS DECIMAL(18,8)) END) AS sa,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS na,
               SUM(CASE WHEN event_type = 'view'
                        THEN CAST(value AS DECIMAL(18,8)) END) AS sb,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS nb
        FROM events
        WHERE event_type IN ('click', 'view')
        GROUP BY 1, 2
    )
    SELECT user_id, day,
           CAST(sa AS DOUBLE) / na AS band_a,
           CAST(sb AS DOUBLE) / nb AS band_b,
           CASE WHEN CAST(sa AS DOUBLE) / na + CAST(sb AS DOUBLE) / nb <> 0
                THEN (CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
                     / (CAST(sa AS DOUBLE) / na + CAST(sb AS DOUBLE) / nb)
                END AS nd_index
    FROM daily
    WHERE na > 0 AND nb > 0
    ORDER BY user_id, day
"""

ORACLES["cube_coherence"] = """
    WITH daily AS (
        SELECT user_id AS px,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8)))
                   AS DOUBLE) * 1000000.0) AS BIGINT) AS q
        FROM events GROUP BY 1, 2),
    j AS (
        SELECT a.px, a.d AS day_a, a.q AS qa, b.q AS qb
        FROM daily a JOIN daily b
          ON a.px = b.px AND b.d = a.d + 1),
    m AS (
        SELECT day_a, COUNT(*) AS n,
               SUM(CAST(qa AS HUGEINT)) AS sa,
               SUM(CAST(qb AS HUGEINT)) AS sb,
               SUM(CAST(qa AS HUGEINT) * qa) AS saa,
               SUM(CAST(qb AS HUGEINT) * qb) AS sbb,
               SUM(CAST(qa AS HUGEINT) * qb) AS sab
        FROM j GROUP BY 1),
    s AS (
        SELECT day_a, n,
               CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                 - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) AS va,
               CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                 - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) AS vb,
               CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
                 - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) AS cov
        FROM m)
    SELECT CAST(day_a AS BIGINT) AS day_a,
           CAST(day_a + 1 AS BIGINT) AS day_b,
           CAST(n AS BIGINT) AS n_shared_pixels,
           CAST(FLOOR((cov / (SQRT(va) * SQRT(vb))) * 1e9) AS BIGINT)
             / 1e9 AS coherence
    FROM s WHERE va > 0 AND vb > 0 AND n >= 2
    ORDER BY day_a
"""

_QCELLS = """
    cells AS (
        SELECT event_id % 1000 AS x,
               CAST(FLOOR(event_id / 1000) AS BIGINT) % 1000 AS y,
               CAST(COUNT(*) AS BIGINT) AS n_obs,
               SUM(CAST(value AS DECIMAL(18,8))) AS cell_sum
        FROM events GROUP BY 1, 2
    ),
    qcells AS (
        SELECT x, y, n_obs,
               CAST(FLOOR((CAST(cell_sum AS DOUBLE)
                           / CAST(n_obs AS DOUBLE)) * 1e6) AS BIGINT) AS qv
        FROM cells
    ),
    offs AS (SELECT UNNEST([-1, 0, 1]) AS dx),
    offs2 AS (SELECT UNNEST([-1, 0, 1]) AS dy)
"""

ORACLES["cube_lee_filter"] = f"""
    WITH {_QCELLS},
    contrib AS (
        SELECT x + dx AS tx, y + dy AS ty, qv
        FROM qcells, offs, offs2
        WHERE x + dx >= 0 AND x + dx < 1000
          AND y + dy >= 0 AND y + dy < 1000
    ),
    focal AS (
        SELECT tx, ty, CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(SUM(qv) AS BIGINT) AS s,
               CAST(SUM(qv * qv) AS BIGINT) AS ss
        FROM contrib GROUP BY 1, 2
    ),
    j AS (
        SELECT f.tx, f.ty, f.n_cells, c.n_obs,
               CAST(f.n_cells AS DOUBLE) AS nd,
               CAST(f.s AS DOUBLE) AS sd,
               CAST(f.ss AS DOUBLE) AS ssd,
               CAST(c.qv AS DOUBLE) / 1e6 AS center
        FROM focal f JOIN qcells c ON c.x = f.tx AND c.y = f.ty
    )
    SELECT tx AS x, ty AS y, n_cells, n_obs,
           FLOOR((sd / nd / 1e6
                  + ((ssd - sd * sd / nd) / nd / 1e12)
                    / ((ssd - sd * sd / nd) / nd / 1e12 + 2500.0)
                    * (center - sd / nd / 1e6)) * 1e9) / 1e9 AS lee_value
    FROM j ORDER BY x, y
"""

ORACLES["cube_otsu_threshold"] = """
    WITH binned AS (
        SELECT event_type AS layer,
               LEAST(63, CAST(FLOOR(value / 8) AS INT)) AS bin,
               CAST(FLOOR(value * 1e6) AS BIGINT) AS qv
        FROM events),
    hist AS (
        SELECT layer, bin, CAST(COUNT(*) AS BIGINT) AS n_b,
               CAST(SUM(qv) AS BIGINT) AS s_b
        FROM binned GROUP BY 1, 2),
    cum AS (
        SELECT layer, bin,
               CAST(SUM(n_b) OVER (PARTITION BY layer ORDER BY bin
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n0,
               CAST(SUM(s_b) OVER (PARTITION BY layer ORDER BY bin
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s0,
               CAST(SUM(n_b) OVER (PARTITION BY layer) AS BIGINT) AS nt,
               CAST(SUM(s_b) OVER (PARTITION BY layer) AS BIGINT) AS st
        FROM hist),
    scored AS (
        SELECT layer, bin, n0 AS n_below, nt - n0 AS n_above,
               FLOOR((CAST(n0 AS DOUBLE) / CAST(nt AS DOUBLE))
                     * ((CAST(nt AS DOUBLE) - CAST(n0 AS DOUBLE))
                        / CAST(nt AS DOUBLE))
                     * (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 1e6
                        - (CAST(st AS DOUBLE) - CAST(s0 AS DOUBLE))
                          / (CAST(nt AS DOUBLE) - CAST(n0 AS DOUBLE)) / 1e6)
                     * (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 1e6
                        - (CAST(st AS DOUBLE) - CAST(s0 AS DOUBLE))
                          / (CAST(nt AS DOUBLE) - CAST(n0 AS DOUBLE)) / 1e6)
                     * 1e9) / 1e9 AS sigma_b
        FROM cum WHERE n0 < nt)
    SELECT layer, bin AS threshold_bin,
           (bin + 1) * 8.0 AS threshold_value, n_below, n_above, sigma_b
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY layer ORDER BY sigma_b DESC, bin) AS r
          FROM scored)
    WHERE r = 1 ORDER BY layer
"""

ORACLES["cube_morph_open"] = f"""
    WITH {_QCELLS},
    mask AS (SELECT x, y FROM qcells WHERE qv >= 50000000),
    ncnt AS (
        SELECT x + dx AS tx, y + dy AS ty, COUNT(*) AS n
        FROM mask, offs, offs2
        WHERE x + dx >= 0 AND x + dx < 1000
          AND y + dy >= 0 AND y + dy < 1000
        GROUP BY 1, 2),
    eroded AS (
        SELECT m.x, m.y FROM mask m
        JOIN ncnt n ON n.tx = m.x AND n.ty = m.y
        WHERE n.n = 9),
    opened AS (
        SELECT DISTINCT x + dx AS x, y + dy AS y
        FROM eroded, offs, offs2
        WHERE x + dx >= 0 AND x + dx < 1000
          AND y + dy >= 0 AND y + dy < 1000)
    SELECT m.x, m.y,
           CAST(CASE WHEN e.x IS NOT NULL THEN 1 ELSE 0 END AS INT)
               AS eroded,
           CAST(CASE WHEN o.x IS NOT NULL THEN 1 ELSE 0 END AS INT)
               AS opened
    FROM mask m
    LEFT JOIN eroded e ON e.x = m.x AND e.y = m.y
    LEFT JOIN opened o ON o.x = m.x AND o.y = m.y
    ORDER BY m.x, m.y
"""

ORACLES["cube_local_moran"] = f"""
    WITH {_QCELLS},
    dev AS (
        SELECT x, y,
               CAST(qv * CAST(COUNT(*) OVER () AS BIGINT)
                    - CAST(SUM(qv) OVER () AS BIGINT) AS BIGINT) AS devq,
               CAST(COUNT(*) OVER () AS BIGINT) AS nt
        FROM qcells),
    m2 AS (
        SELECT SUM(CAST(devq AS DECIMAL(19,0))
                   * CAST(devq AS DECIMAL(19,0))) AS m2q,
               MAX(nt) AS nt
        FROM dev),
    contrib AS (
        SELECT x + dx AS tx, y + dy AS ty, devq
        FROM dev, offs, offs2
        WHERE NOT (dx = 0 AND dy = 0)
          AND x + dx >= 0 AND x + dx < 1000
          AND y + dy >= 0 AND y + dy < 1000),
    nsum AS (
        SELECT tx, ty, CAST(COUNT(*) AS BIGINT) AS n_neigh,
               CAST(SUM(devq) AS BIGINT) AS ndevq
        FROM contrib GROUP BY 1, 2),
    j AS (
        SELECT d.x AS tx, d.y AS ty, d.devq, n.n_neigh, n.ndevq,
               m2.m2q, m2.nt
        FROM dev d
        JOIN nsum n ON n.tx = d.x AND n.ty = d.y, m2)
    SELECT tx AS x, ty AS y, n_neigh,
           FLOOR(((CAST(devq AS DOUBLE) / (CAST(nt AS DOUBLE) * 1e6))
                  * (CAST(ndevq AS DOUBLE) / (CAST(nt AS DOUBLE) * 1e6)
                     / CAST(n_neigh AS DOUBLE))
                  / (CAST(m2q AS DOUBLE)
                     / ((CAST(nt AS DOUBLE) * 1e6)
                        * (CAST(nt AS DOUBLE) * 1e6))
                     / CAST(nt AS DOUBLE)))
                 * 1e9) / 1e9 AS local_moran
    FROM j ORDER BY x, y
"""

ORACLES["cube_hillshade"] = """
    WITH cells AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                   / COUNT(value) AS v
        FROM events GROUP BY 1, 2
    )
    SELECT c.x, c.y,
           (e.v - w.v) / 2.0 AS gx,
           (n.v - s.v) / 2.0 AS gy,
           (-((e.v - w.v) / 2.0) * 0.5 - ((n.v - s.v) / 2.0) * 0.5
            + '0.707'::DOUBLE)
           / sqrt(((e.v - w.v) / 2.0) * ((e.v - w.v) / 2.0)
                  + ((n.v - s.v) / 2.0) * ((n.v - s.v) / 2.0) + 1.0)
               AS hillshade
    FROM cells c
    JOIN cells w ON w.x = c.x - 1 AND w.y = c.y
    JOIN cells e ON e.x = c.x + 1 AND e.y = c.y
    JOIN cells s ON s.x = c.x AND s.y = c.y - 1
    JOIN cells n ON n.x = c.x AND n.y = c.y + 1
    ORDER BY c.x, c.y
"""

ORACLES["cube_mask_components"] = f"""
    WITH RECURSIVE {_QCELLS},
    mask AS (SELECT x, y, x * 1000 + y AS node
             FROM qcells WHERE qv >= 50000000),
    edges0 AS (
        SELECT m.node AS a,
               (m.x + dx) * 1000 + m.y + dy AS b
        FROM mask m, offs, offs2
        WHERE NOT (dx = 0 AND dy = 0)
          AND m.x + dx >= 0 AND m.x + dx < 1000
          AND m.y + dy >= 0 AND m.y + dy < 1000),
    edges AS (
        SELECT e.a, e.b FROM edges0 e JOIN mask t ON t.node = e.b
        UNION ALL
        SELECT e.b, e.a FROM edges0 e JOIN mask t ON t.node = e.b),
    reach(node, lbl) AS (
        SELECT node, node FROM mask
        UNION
        SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.node = e.b),
    labels AS (
        SELECT node, CAST(MIN(lbl) AS BIGINT) AS component_id
        FROM reach GROUP BY 1)
    SELECT l.component_id,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           MIN(m.x) AS min_x, MAX(m.x) AS max_x,
           MIN(m.y) AS min_y, MAX(m.y) AS max_y
    FROM labels l JOIN mask m ON m.node = l.node
    GROUP BY 1 ORDER BY 1
"""

ORACLES["cube_baseline_pairs"] = """
    WITH acq AS (
        SELECT user_id, event_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               value
        FROM events),
    a AS (
        SELECT user_id, event_id AS event_a, d AS da, value AS va,
               UNNEST([CAST(FLOOR(d / 12) AS BIGINT),
                       CAST(FLOOR(d / 12) AS BIGINT) + 1]) AS bkt
        FROM acq),
    b AS (
        SELECT user_id, event_id AS event_b, d AS db, value AS vb,
               CAST(FLOOR(d / 12) AS BIGINT) AS bkt
        FROM acq)
    SELECT DISTINCT a.user_id AS user_id, a.event_a, b.event_b,
           CAST(b.db - a.da AS BIGINT) AS temporal_baseline_days,
           abs(b.vb - a.va) AS angle_diff
    FROM a JOIN b
      ON a.user_id = b.user_id AND a.bkt = b.bkt
    WHERE (b.db > a.da OR (b.db = a.da AND b.event_b > a.event_a))
      AND b.db - a.da <= 12
      AND abs(b.vb - a.va) <= 5.0
    ORDER BY user_id, event_a, event_b
"""

ORACLES["cube_rgb_composite"] = """
    WITH g AS (
        SELECT user_id AS stack_id, CAST(ts AS DATE) AS d,
               CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                   / COUNT(value) AS v
        FROM events
        WHERE CAST(ts AS DATE) = DATE '2024-01-05'
           OR CAST(ts AS DATE) = DATE '2024-01-15'
           OR CAST(ts AS DATE) = DATE '2024-01-25'
        GROUP BY 1, 2),
    piv AS (
        SELECT stack_id,
               MAX(CASE WHEN d = DATE '2024-01-05' THEN v END) AS r_raw,
               MAX(CASE WHEN d = DATE '2024-01-15' THEN v END) AS g_raw,
               MAX(CASE WHEN d = DATE '2024-01-25' THEN v END) AS b_raw
        FROM g GROUP BY 1),
    f AS (SELECT * FROM piv WHERE r_raw IS NOT NULL
              AND g_raw IS NOT NULL AND b_raw IS NOT NULL)
    SELECT stack_id,
           CASE WHEN MAX(r_raw) OVER () > MIN(r_raw) OVER ()
                THEN CAST(FLOOR((r_raw - MIN(r_raw) OVER ()) * 255.0
                     / (MAX(r_raw) OVER () - MIN(r_raw) OVER ())) AS INT)
                ELSE 0 END AS r,
           CASE WHEN MAX(g_raw) OVER () > MIN(g_raw) OVER ()
                THEN CAST(FLOOR((g_raw - MIN(g_raw) OVER ()) * 255.0
                     / (MAX(g_raw) OVER () - MIN(g_raw) OVER ())) AS INT)
                ELSE 0 END AS g,
           CASE WHEN MAX(b_raw) OVER () > MIN(b_raw) OVER ()
                THEN CAST(FLOOR((b_raw - MIN(b_raw) OVER ()) * 255.0
                     / (MAX(b_raw) OVER () - MIN(b_raw) OVER ())) AS INT)
                ELSE 0 END AS b
    FROM f ORDER BY stack_id
"""

ORACLES["cube_hist_match"] = """
    WITH src AS (
        SELECT event_id, CAST(FLOOR(value * 1e6) AS BIGINT) AS qv
        FROM events WHERE event_type = 'view'),
    ref AS (
        SELECT CAST(FLOOR(value * 1e6) AS BIGINT) AS qv
        FROM events WHERE event_type = 'click'),
    ranked AS (
        SELECT event_id, qv,
               CAST(ROW_NUMBER() OVER (ORDER BY qv, event_id) AS BIGINT)
                   AS r,
               CAST(COUNT(*) OVER () AS BIGINT) AS ns
        FROM src),
    cdf0 AS (SELECT qv AS ref_qv, CAST(COUNT(*) AS BIGINT) AS c
             FROM ref GROUP BY 1),
    cdf AS (
        SELECT ref_qv,
               CAST(SUM(c) OVER (ORDER BY ref_qv ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS cum_hi,
               CAST(COALESCE(SUM(c) OVER (ORDER BY ref_qv ROWS BETWEEN
                   UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS cum_lo
        FROM cdf0),
    nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS nr FROM ref)
    SELECT t.event_id, CAST(t.qv AS DOUBLE) / 1e6 AS value,
           CAST(c.ref_qv AS DOUBLE) / 1e6 AS matched_value
    FROM (SELECT rr.*, n.nr, (rr.r * n.nr + rr.ns - 1) // rr.ns AS rk
          FROM ranked rr, nr n) t
    JOIN cdf c ON t.rk > c.cum_lo AND t.rk <= c.cum_hi
    ORDER BY t.event_id
"""

ORACLES["cube_enl"] = """
    WITH mom AS (
        SELECT user_id AS stack_id, event_type AS band,
               CAST(COUNT(*) AS BIGINT) AS n_looks_raw,
               CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS BIGINT)
                   AS sq,
               SUM(CAST(CAST(FLOOR(value * 1e6) AS BIGINT)
                   AS DECIMAL(38,0))
                   * CAST(FLOOR(value * 1e6) AS BIGINT)) AS sq2
        FROM events GROUP BY 1, 2)
    SELECT stack_id, band, n_looks_raw AS n_samples,
           FLOOR(((CAST(sq AS DOUBLE) / CAST(n_looks_raw AS DOUBLE))
                  * (CAST(sq AS DOUBLE) / CAST(n_looks_raw AS DOUBLE))
                  / ((CAST(sq2 AS DOUBLE)
                      - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)
                        / CAST(n_looks_raw AS DOUBLE))
                     / CAST(n_looks_raw AS DOUBLE)))
                 * 1e9) / 1e9 AS enl
    FROM mom WHERE n_looks_raw > 1 ORDER BY stack_id, band
"""

ORACLES["cube_cfar_detect"] = """
    WITH cells AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                   / COUNT(value) AS v
        FROM events GROUP BY 1, 2
    ),
    offs AS (
        SELECT dx.d AS dx, dy.d AS dy
        FROM (SELECT UNNEST(range(-2, 3)) AS d) dx,
             (SELECT UNNEST(range(-2, 3)) AS d) dy
        WHERE GREATEST(ABS(dx.d), ABS(dy.d)) = 2
    ),
    rings AS (
        SELECT c.x + o.dx AS tx, c.y + o.dy AS ty,
               CAST(COUNT(*) AS BIGINT) AS n_ring,
               SUM(CAST(FLOOR(c.v * 1e6) AS BIGINT)) AS qsum
        FROM cells c CROSS JOIN offs o
        GROUP BY 1, 2
    )
    SELECT c.x, c.y, c.v AS center, r.n_ring,
           CAST(r.qsum AS DOUBLE) / CAST(r.n_ring AS DOUBLE) / 1e6
               AS ring_mean,
           c.v > 1.5 * (CAST(r.qsum AS DOUBLE) / CAST(r.n_ring AS DOUBLE)
                        / 1e6) AS is_detect
    FROM cells c
    JOIN rings r ON r.tx = c.x AND r.ty = c.y
    WHERE r.n_ring >= 12
    ORDER BY c.x, c.y
"""

ORACLES["cube_aspect_octant"] = """
    WITH cells AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                   / COUNT(value) AS v
        FROM events GROUP BY 1, 2
    ),
    interior AS (
        SELECT (e.v - w.v) AS gx, (n.v - s.v) AS gy
        FROM cells c
        JOIN cells w ON w.x = c.x - 1 AND w.y = c.y
        JOIN cells e ON e.x = c.x + 1 AND e.y = c.y
        JOIN cells s ON s.x = c.x AND s.y = c.y - 1
        JOIN cells n ON n.x = c.x AND n.y = c.y + 1
    ),
    classed AS (
        SELECT CASE
                 WHEN gx = 0 AND gy = 0 THEN 'flat'
                 WHEN ABS(gx) <= 0.4142135623730951 * ABS(gy)
                      AND gy > 0 THEN 'N'
                 WHEN ABS(gx) <= 0.4142135623730951 * ABS(gy)
                      AND gy < 0 THEN 'S'
                 WHEN ABS(gy) <= 0.4142135623730951 * ABS(gx)
                      AND gx > 0 THEN 'E'
                 WHEN ABS(gy) <= 0.4142135623730951 * ABS(gx)
                      AND gx < 0 THEN 'W'
                 WHEN gx > 0 AND gy > 0 THEN 'NE'
                 WHEN gx > 0 AND gy < 0 THEN 'SE'
                 WHEN gx < 0 AND gy > 0 THEN 'NW'
                 ELSE 'SW'
               END AS octant,
               CAST(FLOOR(sqrt(gx * gx / 4.0 + gy * gy / 4.0) * 1e6)
                    AS BIGINT) AS qmag
        FROM interior
    )
    SELECT octant,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(qmag) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e6
               AS mean_mag
    FROM classed GROUP BY octant ORDER BY octant
"""

ORACLES["cube_glcm_texture"] = f"""
    WITH {_QCELLS},
    ext AS (SELECT MIN(qv) AS lo, MAX(qv) AS hi FROM qcells),
    g AS (
        SELECT x, y,
               CAST(FLOOR(CAST((qv - lo) * 8 AS DOUBLE)
                          / CAST(hi - lo + 1 AS DOUBLE)) AS INT) AS g
        FROM qcells, ext),
    pairs AS (
        SELECT a.g AS g1, b.g AS g2
        FROM g a JOIN g b ON b.x = a.x + 1 AND b.y = a.y),
    hist AS (
        SELECT g1, g2, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM pairs GROUP BY 1, 2),
    tot AS (SELECT SUM(n_pairs) AS t FROM hist)
    SELECT CAST(g1 AS INT) AS g1, CAST(g2 AS INT) AS g2, n_pairs,
           CAST(n_pairs AS DOUBLE) / CAST(t AS DOUBLE) AS p,
           CAST(n_pairs AS DOUBLE) / CAST(t AS DOUBLE)
               * (g1 - g2) * (g1 - g2) AS contrast_term,
           CAST(n_pairs AS DOUBLE) / CAST(t AS DOUBLE)
               / (1.0 + abs(g1 - g2)) AS homogeneity_term
    FROM hist, tot ORDER BY g1, g2
"""

ORACLES["cube_variogram"] = f"""
    WITH {_QCELLS},
    vlags AS (SELECT UNNEST(range(1, 6)) AS h),
    vpairs AS (
        SELECT l.h AS h,
               CAST(a.qv - b.qv AS HUGEINT) * (a.qv - b.qv) AS d2
        FROM qcells a CROSS JOIN vlags l
        JOIN qcells b ON b.x = a.x + l.h AND b.y = a.y),
    vagg AS (
        SELECT h, CAST(COUNT(*) AS BIGINT) AS n_pairs, SUM(d2) AS sd2
        FROM vpairs GROUP BY h)
    SELECT CAST(h AS INT) AS lag, n_pairs,
           FLOOR(CAST(sd2 AS DOUBLE) / (2.0 * CAST(n_pairs AS DOUBLE))
                 / 1e12 * 1e9) / 1e9 AS semivariance
    FROM vagg ORDER BY lag
"""

ORACLES["cube_median_filter"] = f"""
    WITH {_QCELLS},
    mcontrib AS (
        SELECT x + dx AS tx, y + dy AS ty, qv
        FROM qcells, offs, offs2
        WHERE x + dx >= 0 AND x + dx < 1000
          AND y + dy >= 0 AND y + dy < 1000),
    mmed AS (
        SELECT tx, ty, CAST(COUNT(*) AS BIGINT) AS n_cells,
               list_sort(list(qv)) AS vals
        FROM mcontrib GROUP BY 1, 2),
    mj AS (
        SELECT m.tx, m.ty, m.n_cells, m.vals
        FROM mmed m JOIN qcells c ON c.x = m.tx AND c.y = m.ty)
    SELECT tx AS x, ty AS y, n_cells,
           CAST(vals[CAST(CEIL(n_cells / 2.0) AS INT)] AS DOUBLE) / 1e6
               AS median_value
    FROM mj ORDER BY x, y
"""

ORACLES["cube_ring_stats"] = f"""
    WITH {_QCELLS},
    banded AS (
        SELECT CAST(FLOOR(SQRT(CAST((x - 500) * (x - 500)
                                    + (y - 500) * (y - 500) AS DOUBLE))
                          / 50.0) AS INT) AS ring,
               qv
        FROM qcells),
    ragg AS (
        SELECT ring, CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(SUM(qv) AS BIGINT) AS s,
               MIN(qv) AS mn, MAX(qv) AS mx
        FROM banded GROUP BY ring)
    SELECT ring, n_cells,
           CAST(s AS DOUBLE) / (CAST(n_cells AS DOUBLE) * 1e6)
               AS mean_value,
           CAST(mn AS DOUBLE) / 1e6 AS min_value,
           CAST(mx AS DOUBLE) / 1e6 AS max_value
    FROM ragg ORDER BY ring
"""

ORACLES["cube_ruggedness"] = f"""
    WITH {_QCELLS},
    tcontrib AS (
        SELECT x + dx AS tx, y + dy AS ty, qv AS nqv
        FROM qcells, offs, offs2
        WHERE NOT (dx = 0 AND dy = 0)
          AND x + dx >= 0 AND x + dx < 1000
          AND y + dy >= 0 AND y + dy < 1000),
    tgather AS (
        SELECT c.tx, c.ty, abs(q.qv - c.nqv) AS ad
        FROM tcontrib c JOIN qcells q ON q.x = c.tx AND q.y = c.ty),
    tagg AS (
        SELECT tx, ty, CAST(COUNT(*) AS BIGINT) AS n_neighbors,
               CAST(SUM(ad) AS BIGINT) AS sad
        FROM tgather GROUP BY 1, 2)
    SELECT tx AS x, ty AS y, n_neighbors,
           CAST(sad AS DOUBLE) / (CAST(n_neighbors AS DOUBLE) * 1e6) AS tri
    FROM tagg ORDER BY x, y
"""

ORACLES["cube_layover_shadow"] = """
    WITH g50 AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / CAST(COUNT(*) AS DOUBLE) * 1e6) AS BIGINT) AS qv
        FROM events GROUP BY 1, 2),
    grad AS (
        SELECT c.x, c.y, e.qv - w.qv AS g2
        FROM g50 c
        JOIN g50 e ON e.x = c.x + 1 AND e.y = c.y
        JOIN g50 w ON w.x = c.x - 1 AND w.y = c.y)
    SELECT x, y,
           CAST(g2 AS DOUBLE) / 2e6 AS gx,
           CASE WHEN g2 > 4000000 THEN 'layover'
                WHEN g2 < -4000000 THEN 'shadow'
                ELSE 'ok' END AS mask_class
    FROM grad ORDER BY x, y
"""

ORACLES["cube_integral_image"] = """
    WITH g50 AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / CAST(COUNT(*) AS DOUBLE) * 1e6) AS BIGINT) AS qv
        FROM events GROUP BY 1, 2),
    rowp AS (
        SELECT x, y,
               SUM(qv) OVER (PARTITION BY y ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rq
        FROM g50),
    sat AS (
        SELECT x, y,
               CAST(SUM(rq) OVER (PARTITION BY x ORDER BY y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS qsat
        FROM rowp)
    SELECT x, y,
           CAST(qsat AS DOUBLE) / 1e6 AS sat,
           CAST(qsat AS DOUBLE) / CAST((x + 1) * (y + 1) AS DOUBLE) / 1e6
               AS rect_mean
    FROM sat ORDER BY x, y
"""

ORACLES["cube_flow_direction"] = """
    WITH g50 AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / CAST(COUNT(*) AS DOUBLE) * 1e6) AS BIGINT) AS qv
        FROM events GROUP BY 1, 2),
    offs(dx, dy, code, fac) AS (VALUES
        (1, 0, 1, 1414214), (1, 1, 2, 1000000), (0, 1, 4, 1414214),
        (-1, 1, 8, 1000000), (-1, 0, 16, 1414214), (-1, -1, 32, 1000000),
        (0, -1, 64, 1414214), (1, -1, 128, 1000000)),
    cand AS (
        SELECT c.x, c.y, o.code,
               (c.qv - n.qv) * CAST(o.fac AS BIGINT) AS score,
               c.qv - n.qv AS dq
        FROM g50 c CROSS JOIN offs o
        JOIN g50 n ON n.x = c.x + o.dx AND n.y = c.y + o.dy),
    down AS (SELECT * FROM cand WHERE score > 0),
    best AS (SELECT x, y, MAX(score) AS ms FROM down GROUP BY 1, 2),
    chosen AS (
        SELECT d.x, d.y, MIN(d.code) AS dir, arg_min(d.dq, d.code) AS dqb
        FROM down d JOIN best b ON d.x = b.x AND d.y = b.y AND d.score = b.ms
        GROUP BY 1, 2)
    SELECT g.x, g.y,
           CAST(COALESCE(ch.dir, 0) AS INT) AS dir,
           COALESCE(CAST(ch.dqb AS DOUBLE) / 1e6, 0.0) AS drop
    FROM g50 g LEFT JOIN chosen ch ON g.x = ch.x AND g.y = ch.y
    ORDER BY g.x, g.y
"""

ORACLES["cube_contour_bands"] = """
    WITH g50 AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / CAST(COUNT(*) AS DOUBLE) * 1e6) AS BIGINT) AS qv
        FROM events GROUP BY 1, 2),
    banded AS (
        SELECT x, y, CAST(FLOOR(qv / 5000000) AS BIGINT) AS band FROM g50),
    offs(dx, dy) AS (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)),
    flags AS (
        SELECT c.x, c.y, c.band,
               MAX(CASE WHEN n.band != c.band THEN 1 ELSE 0 END)
                   AS is_boundary
        FROM banded c CROSS JOIN offs o
        JOIN banded n ON n.x = c.x + o.dx AND n.y = c.y + o.dy
        GROUP BY 1, 2, 3)
    SELECT band,
           CAST(band AS DOUBLE) * 5.0 AS band_floor,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(is_boundary) AS BIGINT) AS n_boundary,
           CAST(SUM(is_boundary) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS boundary_share
    FROM flags GROUP BY 1 ORDER BY 1
"""

ORACLES["cube_swath_coverage"] = """
    WITH obs AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS day_num
        FROM events),
    per_day AS (
        SELECT day_num, CAST(COUNT(*) AS BIGINT) AS n_obs,
               CAST(COUNT(DISTINCT (x, y)) AS BIGINT) AS n_cells
        FROM obs GROUP BY 1),
    first_seen AS (
        SELECT x, y, MIN(day_num) AS fd FROM obs GROUP BY 1, 2),
    grid_n AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS grid_cells FROM first_seen),
    new_per_day AS (
        SELECT fd AS day_num, CAST(COUNT(*) AS BIGINT) AS n_new
        FROM first_seen GROUP BY 1),
    joined AS (
        SELECT p.day_num, p.n_obs, p.n_cells,
               COALESCE(n.n_new, 0) AS n_new,
               CAST(SUM(COALESCE(n.n_new, 0)) OVER (
                   ORDER BY p.day_num
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_cells
        FROM per_day p LEFT JOIN new_per_day n ON p.day_num = n.day_num)
    SELECT day_num, n_obs, n_cells, n_new, cum_cells,
           CAST(cum_cells AS DOUBLE) / CAST(grid_cells AS DOUBLE)
               AS coverage_share
    FROM joined CROSS JOIN grid_n ORDER BY day_num
"""

ORACLES["cube_lbp_texture"] = """
    WITH g50 AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / CAST(COUNT(*) AS DOUBLE) * 1e6) AS BIGINT) AS qv
        FROM events GROUP BY 1, 2),
    offs(dx, dy, bit) AS (VALUES
        (1, 0, 1), (1, 1, 2), (0, 1, 4), (-1, 1, 8),
        (-1, 0, 16), (-1, -1, 32), (0, -1, 64), (1, -1, 128)),
    codes AS (
        SELECT c.x, c.y, COUNT(*) AS n_nb,
               CAST(SUM(CASE WHEN n.qv >= c.qv THEN o.bit ELSE 0 END)
                    AS BIGINT) AS code
        FROM g50 c CROSS JOIN offs o
        JOIN g50 n ON n.x = c.x + o.dx AND n.y = c.y + o.dy
        GROUP BY 1, 2),
    interior AS (SELECT * FROM codes WHERE n_nb = 8),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_interior FROM interior)
    SELECT CAST(code AS INT) AS lbp_code,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(COUNT(*) AS DOUBLE) / CAST(n_interior AS DOUBLE) AS share
    FROM interior CROSS JOIN tot
    GROUP BY code, n_interior ORDER BY lbp_code
"""

ORACLES["cube_revisit_stats"] = """
    WITH obs AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM events GROUP BY 1, 2, 3),
    gaps AS (
        SELECT x, y, n_obs,
               d - LAG(d) OVER (PARTITION BY x, y ORDER BY d) AS gap
        FROM obs)
    SELECT x, y,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(n_obs) AS BIGINT) AS n_obs,
           CASE WHEN COUNT(gap) > 0
                THEN CAST(CAST(SUM(gap) AS BIGINT) AS DOUBLE)
                     / CAST(COUNT(gap) AS DOUBLE)
                ELSE 0.0e0 END AS mean_gap_days,
           CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_days
    FROM gaps GROUP BY 1, 2 ORDER BY x, y
"""

ORACLES["cube_class_transitions"] = """
    WITH base AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               value
        FROM events),
    mid AS (SELECT CAST(FLOOR((MIN(d) + MAX(d)) / 2) AS BIGINT) AS mid
            FROM base),
    halves AS (
        SELECT x, y, d <= mid AS h1,
               CAST(FLOOR(CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8)))
                                          AS DOUBLE)
                                     / CAST(COUNT(*) AS DOUBLE) * 1e6)
                               AS BIGINT) / 5000000) AS BIGINT) AS band
        FROM base CROSS JOIN mid GROUP BY 1, 2, 3),
    trans AS (
        SELECT a.band AS from_band, b.band AS to_band,
               CAST(COUNT(*) AS BIGINT) AS n_cells
        FROM halves a JOIN halves b
          ON a.x = b.x AND a.y = b.y AND a.h1 AND NOT b.h1
        GROUP BY 1, 2)
    SELECT from_band, to_band, n_cells,
           CAST(n_cells AS DOUBLE)
               / CAST(SUM(n_cells) OVER (PARTITION BY from_band) AS DOUBLE)
               AS row_share
    FROM trans ORDER BY from_band, to_band
"""

ORACLES["cube_temporal_anomaly"] = """
    WITH monthly AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               date_trunc('day', ts) AS day,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / COUNT(value) * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2, 3),
    mom AS (
        SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(q) AS sx, SUM(CAST(q AS DECIMAL(38,0)) * q) AS sxx
        FROM monthly GROUP BY 1, 2),
    params AS (
        SELECT x, y,
               CAST(sx AS DOUBLE) / 1e6 / CAST(n AS DOUBLE) AS mu,
               SQRT(GREATEST(CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e12)
                    - (CAST(sx AS DOUBLE) / 1e6)
                      * (CAST(sx AS DOUBLE) / 1e6), 0.0))
                   / CAST(n AS DOUBLE) AS sig
        FROM mom),
    scored AS (
        SELECT m.day,
               CAST(FLOOR(ABS((CAST(m.q AS DOUBLE) / 1e6 - p.mu) / p.sig)
                          * 1e6) AS BIGINT) AS zq
        FROM monthly m JOIN params p ON m.x = p.x AND m.y = p.y
        WHERE p.sig > 0)
    SELECT day, CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(count_if(zq > 2000000) AS BIGINT) AS n_anomalous,
           CAST(count_if(zq > 2000000) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS anomalous_share,
           CAST(SUM(zq) AS DOUBLE) / 1e6 / CAST(COUNT(*) AS DOUBLE)
               AS mean_abs_z
    FROM scored GROUP BY 1 ORDER BY day
"""

ORACLES["cube_laplacian"] = """
    WITH grid AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / COUNT(value) * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2),
    stencil AS (
        SELECT * FROM (VALUES (0, 0, -4), (-1, 0, 1), (1, 0, 1),
                              (0, -1, 1), (0, 1, 1)) AS t(dx, dy, w)),
    scatter AS (
        SELECT g.x + s.dx AS tx, g.y + s.dy AS ty,
               CAST(s.w AS BIGINT) * g.q AS wq
        FROM grid g CROSS JOIN stencil s
        WHERE g.x + s.dx BETWEEN 0 AND 49
          AND g.y + s.dy BETWEEN 0 AND 49)
    SELECT tx AS x, ty AS y, CAST(SUM(wq) AS DOUBLE) / 1e6 AS laplacian
    FROM scatter GROUP BY 1, 2 HAVING COUNT(*) = 5
    ORDER BY x, y
"""

ORACLES["cube_destripe"] = """
    WITH cells AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / COUNT(value) * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2),
    cols AS (
        SELECT x, CAST(COUNT(*) AS BIGINT) AS n_cells, SUM(q) AS sq
        FROM cells GROUP BY 1),
    gstats AS (
        SELECT CAST(SUM(q) AS DOUBLE) / 1e6 / CAST(COUNT(*) AS DOUBLE)
                   AS global_mean
        FROM cells)
    SELECT x, n_cells,
           CAST(sq AS DOUBLE) / 1e6 / CAST(n_cells AS DOUBLE) AS col_mean,
           g.global_mean,
           CAST(sq AS DOUBLE) / 1e6 / CAST(n_cells AS DOUBLE)
               - g.global_mean AS stripe_bias
    FROM cols CROSS JOIN gstats g ORDER BY x
"""


def _qt_level(d: int) -> str:
    s = 48 >> d
    return f"""
        SELECT {d} AS d, CAST(FLOOR(x / {s}) AS BIGINT) AS bx,
               CAST(FLOOR(y / {s}) AS BIGINT) AS by,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(q AS DECIMAL(38,0))
                                                      * q) AS DOUBLE)
                - CAST(SUM(q) AS DOUBLE) * CAST(SUM(q) AS DOUBLE))
               / (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE))
                   AS var
        FROM cells GROUP BY 2, 3"""


ORACLES["cube_quadtree"] = f"""
    WITH cells AS (
        SELECT x, y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / COUNT(value) * 1e6) AS BIGINT) AS q
        FROM (SELECT event_id % 50 AS x,
                     CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
                     value
              FROM events)
        WHERE x < 48 AND y < 48 GROUP BY 1, 2),
    lvl AS (
        SELECT *, var > 5.5e14 AS split FROM (
            {_qt_level(0)} UNION ALL {_qt_level(1)}
            UNION ALL {_qt_level(2)} UNION ALL {_qt_level(3)}
            UNION ALL {_qt_level(4)})),
    a0 AS (SELECT * FROM lvl WHERE d = 0),
    a1 AS (SELECT c.* FROM lvl c JOIN a0 p
           ON c.d = 1 AND p.split
          AND CAST(FLOOR(c.bx / 2) AS BIGINT) = p.bx
          AND CAST(FLOOR(c.by / 2) AS BIGINT) = p.by),
    a2 AS (SELECT c.* FROM lvl c JOIN a1 p
           ON c.d = 2 AND p.split
          AND CAST(FLOOR(c.bx / 2) AS BIGINT) = p.bx
          AND CAST(FLOOR(c.by / 2) AS BIGINT) = p.by),
    a3 AS (SELECT c.* FROM lvl c JOIN a2 p
           ON c.d = 3 AND p.split
          AND CAST(FLOOR(c.bx / 2) AS BIGINT) = p.bx
          AND CAST(FLOOR(c.by / 2) AS BIGINT) = p.by),
    a4 AS (SELECT c.* FROM lvl c JOIN a3 p
           ON c.d = 4 AND p.split
          AND CAST(FLOOR(c.bx / 2) AS BIGINT) = p.bx
          AND CAST(FLOOR(c.by / 2) AS BIGINT) = p.by),
    leaves AS (
        SELECT 0 AS depth, n_cells, var FROM a0 WHERE NOT split
        UNION ALL SELECT 1, n_cells, var FROM a1 WHERE NOT split
        UNION ALL SELECT 2, n_cells, var FROM a2 WHERE NOT split
        UNION ALL SELECT 3, n_cells, var FROM a3 WHERE NOT split
        UNION ALL SELECT 4, n_cells, var FROM a4)
    SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_leaves,
           CAST(SUM(n_cells) AS BIGINT) AS cells_covered,
           CAST(SUM(CAST(FLOOR(var / 1e6) AS BIGINT)) AS DOUBLE) / 1e6
               / CAST(COUNT(*) AS DOUBLE) AS mean_leaf_var
    FROM leaves GROUP BY 1 ORDER BY depth
"""

ORACLES["cube_inpaint"] = """
    WITH cells AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / COUNT(value) * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2),
    flagged AS (
        SELECT x, y, q,
               ROW_NUMBER() OVER (ORDER BY q, x, y)
                   <= COUNT(*) OVER () // 20 AS is_hole
        FROM cells),
    stencil AS (
        SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),
                              (1,-1),(1,0),(1,1)) AS t(dx, dy)),
    scatter AS (
        SELECT c.x + s.dx AS tx, c.y + s.dy AS ty, c.q
        FROM flagged c CROSS JOIN stencil s
        WHERE NOT c.is_hole
          AND c.x + s.dx BETWEEN 0 AND 49
          AND c.y + s.dy BETWEEN 0 AND 49),
    donors AS (
        SELECT tx, ty, CAST(COUNT(*) AS BIGINT) AS n_donors, SUM(q) AS sq
        FROM scatter GROUP BY 1, 2)
    SELECT h.x, h.y, CAST(h.q AS DOUBLE) / 1e6 AS nodata_value,
           d.n_donors,
           CAST(d.sq AS DOUBLE) / 1e6 / CAST(d.n_donors AS DOUBLE)
               AS filled_value
    FROM flagged h JOIN donors d ON h.x = d.tx AND h.y = d.ty
    WHERE h.is_hole AND d.n_donors >= 3 ORDER BY x, y
"""

ORACLES["cube_velocity_field"] = """
    WITH daily AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / COUNT(value) * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2, 3),
    mom AS (
        SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_days,
               SUM(d) AS sx, SUM(CAST(d AS DECIMAL(38,0)) * d) AS sxx,
               SUM(q) AS sy, SUM(CAST(q AS DECIMAL(38,0)) * q) AS syy,
               SUM(CAST(d AS DECIMAL(38,0)) * q) AS sxy
        FROM daily GROUP BY 1, 2)
    SELECT x, y, n_days,
           (CAST(n_days AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e6)
            - CAST(sx AS DOUBLE) * (CAST(sy AS DOUBLE) / 1e6))
           / (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               AS velocity_per_day,
           CASE WHEN CAST(n_days AS DOUBLE) * (CAST(syy AS DOUBLE) / 1e12)
                     - (CAST(sy AS DOUBLE) / 1e6)
                       * (CAST(sy AS DOUBLE) / 1e6) > 0
                THEN ((CAST(n_days AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e6)
                       - CAST(sx AS DOUBLE) * (CAST(sy AS DOUBLE) / 1e6))
                      * (CAST(n_days AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e6)
                         - CAST(sx AS DOUBLE) * (CAST(sy AS DOUBLE) / 1e6)))
                     / ((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n_days AS DOUBLE)
                           * (CAST(syy AS DOUBLE) / 1e12)
                           - (CAST(sy AS DOUBLE) / 1e6)
                             * (CAST(sy AS DOUBLE) / 1e6)))
                ELSE 0.0 END AS r2
    FROM mom WHERE n_days >= 3 ORDER BY x, y
"""

ORACLES["cube_box_counting"] = """
    WITH mask AS (
        SELECT x, y FROM (
            SELECT event_id % 50 AS x,
                   CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
                   CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8)))
                                   AS DOUBLE)
                              / COUNT(value) * 1e6) AS BIGINT) AS q
            FROM events GROUP BY 1, 2)
        WHERE q >= 50000000),
    counts AS (
        SELECT 1 AS scale, CAST(COUNT(*) AS BIGINT) AS n_boxes FROM (
            SELECT DISTINCT CAST(FLOOR(x / 1) AS BIGINT),
                            CAST(FLOOR(y / 1) AS BIGINT) FROM mask)
        UNION ALL
        SELECT 2, CAST(COUNT(*) AS BIGINT) FROM (
            SELECT DISTINCT CAST(FLOOR(x / 2) AS BIGINT),
                            CAST(FLOOR(y / 2) AS BIGINT) FROM mask)
        UNION ALL
        SELECT 4, CAST(COUNT(*) AS BIGINT) FROM (
            SELECT DISTINCT CAST(FLOOR(x / 4) AS BIGINT),
                            CAST(FLOOR(y / 4) AS BIGINT) FROM mask)
        UNION ALL
        SELECT 8, CAST(COUNT(*) AS BIGINT) FROM (
            SELECT DISTINCT CAST(FLOOR(x / 8) AS BIGINT),
                            CAST(FLOOR(y / 8) AS BIGINT) FROM mask)),
    pts AS (
        SELECT scale, n_boxes,
               CAST(FLOOR(LN(1.0 * scale) * 1e6) AS BIGINT) AS lx,
               CAST(FLOOR(LN(CAST(n_boxes AS DOUBLE)) * 1e6) AS BIGINT)
                   AS ly
        FROM counts),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(lx) AS sx,
               SUM(CAST(lx AS DECIMAL(38,0)) * lx) AS sxx,
               SUM(ly) AS sy,
               SUM(CAST(lx AS DECIMAL(38,0)) * ly) AS sxy
        FROM pts)
    SELECT p.scale, p.n_boxes,
           -((CAST(m.n AS DOUBLE) * (CAST(m.sxy AS DOUBLE) / 1e12)
              - (CAST(m.sx AS DOUBLE) / 1e6) * (CAST(m.sy AS DOUBLE) / 1e6))
             / (CAST(m.n AS DOUBLE) * (CAST(m.sxx AS DOUBLE) / 1e12)
                - (CAST(m.sx AS DOUBLE) / 1e6)
                  * (CAST(m.sx AS DOUBLE) / 1e6))) AS fractal_dimension
    FROM pts p CROSS JOIN mom m ORDER BY scale
"""

ORACLES["cube_change_vector"] = """
    WITH base AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(FLOOR(value * 1e6) AS BIGINT) AS q
        FROM events),
    mid AS (SELECT CAST(FLOOR((MIN(d) + MAX(d)) / 2) AS BIGINT) AS mid
            FROM base),
    halves AS (
        SELECT x, y, d <= mid AS h1, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(q) AS sx, SUM(CAST(q AS DECIMAL(38,0)) * q) AS sxx
        FROM base CROSS JOIN mid GROUP BY 1, 2, 3),
    feat AS (
        SELECT x, y, h1,
               CAST(sx AS DOUBLE) / 1e6 / CAST(n AS DOUBLE) AS mu,
               SQRT(GREATEST(CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e12)
                             - (CAST(sx AS DOUBLE) / 1e6)
                               * (CAST(sx AS DOUBLE) / 1e6), 0.0))
                   / CAST(n AS DOUBLE) AS sig
        FROM halves),
    paired AS (
        SELECT a.x, a.y, b.mu - a.mu AS dmu, b.sig - a.sig AS dsig
        FROM feat a JOIN feat b
          ON a.x = b.x AND a.y = b.y AND a.h1 AND NOT b.h1)
    SELECT (CASE WHEN dmu >= 0 THEN 'brighter' ELSE 'darker' END || '_' ||
            CASE WHEN dsig >= 0 THEN 'noisier' ELSE 'calmer' END)
               AS change_class,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(CAST(FLOOR(SQRT(dmu * dmu + dsig * dsig) * 1e6)
                         AS BIGINT)) AS DOUBLE) / 1e6
               / CAST(COUNT(*) AS DOUBLE) AS mean_magnitude
    FROM paired GROUP BY 1 ORDER BY change_class
"""

ORACLES["cube_orientation_hist"] = """
    WITH cells AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / COUNT(value) * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2),
    roles AS (
        SELECT * FROM (VALUES (-1, 0, 'e'), (1, 0, 'w'),
                              (0, -1, 'n'), (0, 1, 's')) AS t(dx, dy, role)),
    scatter AS (
        SELECT c.x + r.dx AS tx, c.y + r.dy AS ty, r.role, c.q
        FROM cells c CROSS JOIN roles r),
    hood AS (
        SELECT tx, ty, CAST(COUNT(*) AS BIGINT) AS n_roles,
               MAX(CASE WHEN role = 'e' THEN q END) AS qe,
               MAX(CASE WHEN role = 'w' THEN q END) AS qw,
               MAX(CASE WHEN role = 'n' THEN q END) AS qn,
               MAX(CASE WHEN role = 's' THEN q END) AS qs
        FROM scatter GROUP BY 1, 2),
    interior AS (
        SELECT h.*,
               CAST(h.qe - h.qw AS DOUBLE) / 2e6 AS gx,
               CAST(h.qn - h.qs AS DOUBLE) / 2e6 AS gy
        FROM hood h JOIN cells c ON h.tx = c.x AND h.ty = c.y
        WHERE h.n_roles = 4),
    binned AS (
        SELECT CASE
                 WHEN gx >= 0 AND gy >= 0 AND ABS(gx) >= ABS(gy) THEN 0
                 WHEN gx >= 0 AND gy >= 0 THEN 1
                 WHEN gx < 0 AND gy >= 0 AND ABS(gy) >= ABS(gx) THEN 2
                 WHEN gx < 0 AND gy >= 0 THEN 3
                 WHEN gx < 0 AND gy < 0 AND ABS(gx) >= ABS(gy) THEN 4
                 WHEN gx < 0 AND gy < 0 THEN 5
                 WHEN gx >= 0 AND gy < 0 AND ABS(gy) >= ABS(gx) THEN 6
                 ELSE 7 END AS octant,
               CAST(FLOOR(SQRT(gx * gx + gy * gy) * 1e6) AS BIGINT) AS mq
        FROM interior)
    SELECT octant, CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(mq) AS DOUBLE) / 1e6 AS magnitude_sum,
           CAST(SUM(mq) AS DOUBLE) / CAST(SUM(SUM(mq)) OVER () AS DOUBLE)
               AS magnitude_share
    FROM binned GROUP BY 1 ORDER BY octant
"""

ORACLES["cube_stretch_params"] = """
    WITH cells AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / COUNT(value) * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2),
    ranked AS (
        SELECT q, ROW_NUMBER() OVER (ORDER BY q, x, y) AS rk,
               COUNT(*) OVER () AS n
        FROM cells),
    cuts AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(MAX(CASE WHEN rk = GREATEST(1, (2 * n) // 100)
                             THEN q END) AS DOUBLE) / 1e6 AS p2,
               CAST(MAX(CASE WHEN rk = GREATEST(1, (98 * n) // 100)
                             THEN q END) AS DOUBLE) / 1e6 AS p98,
               CAST(SUM(CASE WHEN rk < GREATEST(1, (2 * n) // 100)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_low,
               CAST(SUM(CASE WHEN rk > GREATEST(1, (98 * n) // 100)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_high
        FROM ranked)
    SELECT n_cells, p2, p98, 1.0 / (p98 - p2) AS stretch_gain,
           n_clip_low, n_clip_high
    FROM cuts
"""

ORACLES["cube_parity_contrast"] = """
    WITH cells AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / COUNT(value) * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2),
    tagged AS (
        SELECT CAST((x // 25) * 2 + (y // 25) AS INT) AS quadrant,
               (x + y) % 2 = 0 AS even, q
        FROM cells)
    SELECT quadrant, n_even, n_odd, mean_even, mean_odd,
           mean_even - mean_odd AS parity_gap
    FROM (
        SELECT quadrant,
               CAST(SUM(CASE WHEN even THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
               CAST(SUM(CASE WHEN NOT even THEN 1 ELSE 0 END) AS BIGINT) AS n_odd,
               CAST(SUM(CASE WHEN even THEN q END) AS DOUBLE)
                   / CAST(SUM(CASE WHEN even THEN 1 END) AS DOUBLE)
                   / 1e6 AS mean_even,
               CAST(SUM(CASE WHEN NOT even THEN q END) AS DOUBLE)
                   / CAST(SUM(CASE WHEN NOT even THEN 1 END) AS DOUBLE)
                   / 1e6 AS mean_odd
        FROM tagged GROUP BY 1)
    ORDER BY quadrant
"""

ORACLES["cube_hist_modes"] = """
    WITH cells AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / COUNT(value) * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2),
    rng AS (SELECT MIN(q) AS qmin, MAX(q) AS qmax FROM cells),
    hist AS (
        SELECT CAST(LEAST(31, ((q - qmin) * 32) // (qmax - qmin + 1)) AS INT)
                   AS bin,
               qmin, qmax,
               CAST(COUNT(*) AS BIGINT) AS n_cells
        FROM cells CROSS JOIN rng
        GROUP BY 1, 2, 3)
    SELECT bin, n_cells,
           CAST(qmin AS DOUBLE) / 1e6
               + CAST(bin AS DOUBLE) * CAST(qmax - qmin + 1 AS DOUBLE)
                 / 32.0 / 1e6 AS bin_lo,
           n_cells > COALESCE(LAG(n_cells) OVER (ORDER BY bin), 0)
           AND n_cells > COALESCE(LEAD(n_cells) OVER (ORDER BY bin), 0)
               AS is_mode
    FROM hist ORDER BY bin
"""

ORACLES["cube_row_runs"] = """
    WITH cells AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / COUNT(value) * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2),
    med AS (
        SELECT q AS median_q FROM (
            SELECT q, ROW_NUMBER() OVER (ORDER BY q, x, y) AS rk,
                   COUNT(*) OVER () AS n
            FROM cells)
        WHERE rk = (n + 1) // 2),
    above AS (
        SELECT x, y FROM cells CROSS JOIN med WHERE q > median_q),
    islands AS (
        SELECT y, x - ROW_NUMBER() OVER (PARTITION BY y ORDER BY x) AS grp
        FROM above),
    runs AS (
        SELECT y, grp, COUNT(*) AS run_len FROM islands GROUP BY 1, 2)
    SELECT y,
           CAST(SUM(run_len) AS BIGINT) AS n_above,
           CAST(MAX(run_len) AS BIGINT) AS longest_run
    FROM runs GROUP BY 1 ORDER BY y
"""

ORACLES["cube_anisotropy"] = """
    WITH cells AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                   / COUNT(value) AS v
        FROM events GROUP BY 1, 2),
    contrib AS (
        SELECT x + r.dx AS tx, y + r.dy AS ty, r.role, v
        FROM cells, (VALUES (1, 0, 'west'), (-1, 0, 'east'),
                            (0, 1, 'south'), (0, -1, 'north'))
             r(dx, dy, role)),
    nb AS (
        SELECT tx, ty,
               MAX(CASE WHEN role = 'west' THEN v END) AS w,
               MAX(CASE WHEN role = 'east' THEN v END) AS e,
               MAX(CASE WHEN role = 'south' THEN v END) AS s,
               MAX(CASE WHEN role = 'north' THEN v END) AS n
        FROM contrib GROUP BY 1, 2
        HAVING MAX(CASE WHEN role = 'west' THEN v END) IS NOT NULL
           AND MAX(CASE WHEN role = 'east' THEN v END) IS NOT NULL
           AND MAX(CASE WHEN role = 'south' THEN v END) IS NOT NULL
           AND MAX(CASE WHEN role = 'north' THEN v END) IS NOT NULL),
    tagged AS (
        SELECT CAST((tx // 25) * 2 + (ty // 25) AS INT) AS quadrant,
               CAST(FLOOR(abs((e - w) / 2.0) * 1e6) AS BIGINT) AS qgx,
               CAST(FLOOR(abs((n - s) / 2.0) * 1e6) AS BIGINT) AS qgy
        FROM nb)
    SELECT quadrant,
           CAST(COUNT(*) AS BIGINT) AS n_interior,
           CAST(SUM(qgx) AS DOUBLE) / 1e6 AS h_energy,
           CAST(SUM(qgy) AS DOUBLE) / 1e6 AS v_energy,
           CAST(SUM(qgx) AS DOUBLE) / CAST(GREATEST(SUM(qgy), 1) AS DOUBLE)
               AS anisotropy
    FROM tagged GROUP BY 1 ORDER BY quadrant
"""

ORACLES["cube_symmetry_profile"] = """
    WITH cells AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / COUNT(value) * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2),
    top AS (SELECT x, y, q AS qa FROM cells WHERE y < 25),
    bot AS (SELECT x, 49 - y AS y, q AS qb FROM cells WHERE y >= 25),
    pairs AS (SELECT t.y, t.qa, b.qb
              FROM top t JOIN bot b ON t.x = b.x AND t.y = b.y)
    SELECT y,
           CAST(COUNT(*) AS BIGINT) AS n_aligned,
           CAST(SUM(abs(qa - qb)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e6
               AS mean_abs_diff
    FROM pairs GROUP BY 1 ORDER BY y
"""

ORACLES["cube_quadrant_quartiles"] = """
    WITH cells AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / COUNT(value) * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2),
    ranked AS (
        SELECT CAST((x // 25) * 2 + (y // 25) AS INT) AS quadrant, q,
               ROW_NUMBER() OVER (
                   PARTITION BY (x // 25) * 2 + (y // 25)
                   ORDER BY q, x, y) AS rk,
               COUNT(*) OVER (
                   PARTITION BY (x // 25) * 2 + (y // 25)) AS n
        FROM cells),
    per AS (
        SELECT quadrant,
               CAST(MAX(n) AS BIGINT) AS n_cells,
               CAST(MAX(CASE WHEN rk = GREATEST(1, (25 * n) // 100)
                             THEN q END) AS DOUBLE) / 1e6 AS p25,
               CAST(MAX(CASE WHEN rk = GREATEST(1, (50 * n) // 100)
                             THEN q END) AS DOUBLE) / 1e6 AS p50,
               CAST(MAX(CASE WHEN rk = GREATEST(1, (75 * n) // 100)
                             THEN q END) AS DOUBLE) / 1e6 AS p75
        FROM ranked GROUP BY 1)
    SELECT quadrant, n_cells, p25, p50, p75, p75 - p25 AS iqr
    FROM per ORDER BY quadrant
"""

ORACLES["cube_column_defects"] = """
    WITH cells AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / COUNT(value) * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2),
    cols AS (
        SELECT x,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(FLOOR(CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                    AS BIGINT) AS qcol
        FROM cells GROUP BY 1),
    colsm AS (SELECT *, qcol // 1000 AS qm FROM cols),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS nc,
               CAST(SUM(qm) AS BIGINT) AS s1,
               CAST(SUM(qm * qm) AS BIGINT) AS s2
        FROM colsm),
    flagged AS (
        SELECT x, n_cells,
               CAST(qcol AS DOUBLE) / 1e6 AS col_mean,
               (CAST(qm AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(nc AS DOUBLE))
                   * CAST(nc AS DOUBLE)
                   / sqrt(GREATEST(1e0,
                       CAST(nc * s2 - s1 * s1 AS DOUBLE))) AS z_score
        FROM colsm, mom)
    SELECT x, n_cells, col_mean, z_score,
           abs(z_score) > 2e0 AS is_defect
    FROM flagged ORDER BY x
"""

ORACLES["cube_border_gradient"] = """
    WITH cells AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / COUNT(value) * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2),
    per AS (
        SELECT CAST(CASE WHEN LEAST(x, y, 49 - x, 49 - y) <= 2 THEN 0
                         WHEN LEAST(x, y, 49 - x, 49 - y) <= 5 THEN 1
                         ELSE 2 END AS INT) AS ring,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e6
                   AS ring_mean
        FROM cells GROUP BY 1)
    SELECT ring, n_cells, ring_mean,
           ring_mean - MAX(CASE WHEN ring = 2 THEN ring_mean END) OVER ()
               AS dev_from_interior
    FROM per ORDER BY ring
"""

ORACLES["cube_diagonal_banding"] = """
    WITH cells AS (
        SELECT event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          / COUNT(value) * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2),
    per AS (
        SELECT CAST((x + y) % 8 AS INT) AS phase,
               CAST(COUNT(*) AS BIGINT) AS n_cells, SUM(q) AS sq
        FROM cells GROUP BY 1),
    dev AS (
        SELECT phase, n_cells,
               CAST(sq AS DOUBLE) / CAST(n_cells AS DOUBLE) / 1e6
                   AS phase_mean,
               CAST(sq AS DOUBLE) / CAST(n_cells AS DOUBLE) / 1e6
                 - CAST(SUM(sq) OVER () AS DOUBLE)
                   / CAST(SUM(n_cells) OVER () AS DOUBLE) / 1e6
                   AS dev_from_grid
        FROM per)
    SELECT phase, n_cells, phase_mean, dev_from_grid,
           MAX(ABS(dev_from_grid)) OVER () AS max_abs_dev
    FROM dev ORDER BY phase
"""

ORACLES["cube_center_of_mass"] = """
    WITH cells AS (
        SELECT event_type AS band,
               event_id % 50 AS x,
               CAST(FLOOR(event_id / 50) AS BIGINT) % 50 AS y,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2, 3),
    m AS (
        SELECT band, CAST(COUNT(*) AS BIGINT) AS n_cells,
               SUM(q) AS m0, SUM(q * x) AS mx, SUM(q * y) AS my,
               SUM(q * x * x) AS mxx, SUM(q * y * y) AS myy
        FROM cells GROUP BY 1)
    SELECT band, n_cells,
           CAST(m0 AS DOUBLE) / 1e6 AS total_value,
           CAST(mx AS DOUBLE) / CAST(m0 AS DOUBLE) AS cx,
           CAST(my AS DOUBLE) / CAST(m0 AS DOUBLE) AS cy,
           CAST(mxx + myy AS DOUBLE) / CAST(m0 AS DOUBLE)
             - (CAST(mx AS DOUBLE) / CAST(m0 AS DOUBLE))
               * (CAST(mx AS DOUBLE) / CAST(m0 AS DOUBLE))
             - (CAST(my AS DOUBLE) / CAST(m0 AS DOUBLE))
               * (CAST(my AS DOUBLE) / CAST(m0 AS DOUBLE)) AS dispersion
    FROM m ORDER BY band
"""
