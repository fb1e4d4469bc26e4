"""DuckDB oracle SQL for SURVEY §2 group P (twin of
pipeline_queries.py).

Hash-split parity: the bucket is the first 60 bits of md5(id) mod
100 — md5 hex is byte-identical across engines and the hex->int
parse is exact, so split assignment matches bit-for-bit. Quantiles
are rank-selected (no interpolation), so they are integer-exact.
"""

from icecube_spark.functions.hashing import duck_hex2int
from icecube_spark.queries.llm_oracles import ORACLES as _LLM_ORACLES

_BUCKET = f"{duck_hex2int('CAST(doc_id AS VARCHAR)')} % 100"
_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

# same deterministic PII injection as the Spark query
_PII_TEXT = (
    "concat(text, ' reach user', CAST(doc_id AS VARCHAR),"
    " '@example.com or 555-',"
    " lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'), '-',"
    " lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))"
)

ORACLES: dict[str, str] = {
    "train_test_split": f"""
        SELECT doc_id,
               CAST({_BUCKET} AS INT) AS bucket,
               CASE WHEN {_BUCKET} < 90 THEN 'train'
                    WHEN {_BUCKET} < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents ORDER BY doc_id
    """,
    "stratified_sample": f"""
        SELECT doc_id, lang FROM documents
        WHERE {_BUCKET} < 20 ORDER BY doc_id
    """,
    "pii_redact": f"""
        WITH planted AS (SELECT doc_id, {_PII_TEXT} AS text FROM documents),
        scrubbed AS (
            SELECT doc_id,
                   len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
                   len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
                   regexp_replace(
                       regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                       '{_PHONE_RE}', '[PHONE]', 'g') AS clean_text
            FROM planted)
        SELECT doc_id, CAST(n_emails AS INT) AS n_emails,
               CAST(n_phones AS INT) AS n_phones,
               CAST(length(clean_text) AS INT) AS clean_len,
               md5(clean_text) AS clean_md5
        FROM scrubbed ORDER BY doc_id
    """,
    "topk_terms": f"""
        WITH terms AS (
            SELECT UNNEST(string_split({_NORM}, ' ')) AS term FROM documents),
        counts AS (
            SELECT term, COUNT(*) AS n FROM terms
            WHERE term != '' GROUP BY term)
        SELECT term, n, rank FROM (
            SELECT term, n,
                   CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS INT) AS rank
            FROM counts)
        WHERE rank <= 20 ORDER BY rank
    """,
    "doc_length_stats": """
        WITH ranked AS (
            SELECT lang, CAST(n_chars AS BIGINT) AS v,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY n_chars, doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY lang) AS n
            FROM documents)
        SELECT lang, COUNT(*) AS n_docs, MIN(v) AS min_len,
               MAX(CASE WHEN rn = CEIL(0.5 * n) THEN v END) AS p50_len,
               MAX(CASE WHEN rn = CEIL(0.9 * n) THEN v END) AS p90_len,
               MAX(v) AS max_len
        FROM ranked GROUP BY lang ORDER BY lang
    """,
    # transitive closure over the minhash near-dup pairs; cluster id =
    # min doc id reachable from each node
    "dedup_clusters": f"""
        WITH RECURSIVE
        pairs AS ({_LLM_ORACLES["dedup_minhash_lsh"]}),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b AS src, doc_a AS dst FROM pairs),
        reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
        SELECT src AS doc_id,
               LEAST(src, MIN(dst)) AS cluster_id
        FROM reach GROUP BY src ORDER BY doc_id
    """,
}

_G5 = (
    "list_distinct(CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]"
    " ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]"
    " FOR i IN range(1, len(t) - 3)] END)"
)

_G5_CTES = f"""
        toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents),
        grams AS (SELECT doc_id, {_G5} AS g FROM toks)
"""

ORACLES.update({
    "dup_ngram_fraction": f"""
        WITH {_G5_CTES},
        eg AS (SELECT doc_id, UNNEST(g) AS gram FROM grams),
        gram_docs AS (SELECT gram, COUNT(*) AS n_docs FROM eg GROUP BY gram)
        SELECT doc_id, COUNT(*) AS n_grams,
               CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_shared,
               SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) / COUNT(*) AS dup_fraction
        FROM eg JOIN gram_docs USING (gram)
        GROUP BY doc_id ORDER BY doc_id
    """,
    "topk_terms_per_lang": f"""
        WITH terms AS (
            SELECT lang, UNNEST(string_split({_NORM}, ' ')) AS term
            FROM documents),
        counts AS (
            SELECT lang, term, COUNT(*) AS n
            FROM terms WHERE term != '' GROUP BY 1, 2)
        SELECT lang, term, n, rank FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (
                PARTITION BY lang ORDER BY n DESC, term ASC) AS INT) AS rank
            FROM counts)
        WHERE rank <= 5 ORDER BY lang, rank
    """,
    "source_mix": f"""
        WITH b AS (
            SELECT doc_id, source, CAST({_BUCKET} AS INT) AS bucket
            FROM documents),
        n AS (
            SELECT doc_id, source,
                   CAST(CASE WHEN source = 'src0' THEN 0
                             WHEN source = 'src1' THEN 2
                             WHEN source = 'src2' THEN 2
                             WHEN source = 'src3' THEN 0
                             ELSE 1 END
                        + CASE WHEN bucket < (CASE WHEN source = 'src0' THEN 50
                                                   WHEN source = 'src2' THEN 25
                                                   ELSE 0 END)
                               THEN 1 ELSE 0 END AS INT) AS n_copies
            FROM b)
        SELECT doc_id, source, n_copies,
               CAST(UNNEST(range(1, n_copies + 1)) AS INT) AS copy_id
        FROM n WHERE n_copies >= 1
    """,
    "decontaminate": f"""
        WITH {_G5_CTES},
        eg AS (SELECT doc_id, {_BUCKET} AS b, UNNEST(g) AS gram FROM grams),
        tr AS (SELECT doc_id AS train_doc, gram FROM eg WHERE b < 90),
        ev AS (SELECT doc_id AS eval_doc, gram FROM eg WHERE b >= 95)
        SELECT train_doc, eval_doc, COUNT(*) AS n_shared
        FROM tr JOIN ev USING (gram)
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ORDER BY train_doc, eval_doc
    """,
})

ORACLES["length_histogram"] = """
    SELECT source, CAST(n_chars // 64 AS INT) AS bin,
           COUNT(*) AS n_docs, MIN(n_chars) AS min_len,
           MAX(n_chars) AS max_len,
           CAST(n_chars // 64 AS INT) * 64 AS bin_lo
    FROM documents GROUP BY source, bin ORDER BY source, bin
"""

ORACLES["dup_cluster_sizes"] = """
    WITH clusters AS (
        SELECT md5(text) AS h, COUNT(*) AS cluster_size
        FROM documents GROUP BY 1)
    SELECT cluster_size, COUNT(*) AS n_clusters,
           cluster_size * COUNT(*) AS n_docs
    FROM clusters GROUP BY 1 ORDER BY 1
"""

ORACLES["sample_per_group"] = """
    SELECT doc_id, source, lang, n_chars FROM (
        SELECT doc_id, source, lang, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                           doc_id) AS rn
        FROM documents)
    WHERE rn <= 10 ORDER BY source, doc_id
"""

ORACLES["profile_table"] = """
    SELECT 'l_orderkey' AS col_name, COUNT(l_orderkey) AS n_nonnull, COUNT(DISTINCT l_orderkey) AS n_distinct, CAST(MIN(l_orderkey) AS DOUBLE) AS min_num, CAST(MAX(l_orderkey) AS DOUBLE) AS max_num, COUNT(*) AS n_rows FROM lineitem
    UNION ALL
    SELECT 'l_partkey' AS col_name, COUNT(l_partkey) AS n_nonnull, COUNT(DISTINCT l_partkey) AS n_distinct, CAST(MIN(l_partkey) AS DOUBLE) AS min_num, CAST(MAX(l_partkey) AS DOUBLE) AS max_num, COUNT(*) AS n_rows FROM lineitem
    UNION ALL
    SELECT 'l_suppkey' AS col_name, COUNT(l_suppkey) AS n_nonnull, COUNT(DISTINCT l_suppkey) AS n_distinct, CAST(MIN(l_suppkey) AS DOUBLE) AS min_num, CAST(MAX(l_suppkey) AS DOUBLE) AS max_num, COUNT(*) AS n_rows FROM lineitem
    UNION ALL
    SELECT 'l_linenumber' AS col_name, COUNT(l_linenumber) AS n_nonnull, COUNT(DISTINCT l_linenumber) AS n_distinct, CAST(MIN(l_linenumber) AS DOUBLE) AS min_num, CAST(MAX(l_linenumber) AS DOUBLE) AS max_num, COUNT(*) AS n_rows FROM lineitem
    UNION ALL
    SELECT 'l_quantity' AS col_name, COUNT(l_quantity) AS n_nonnull, COUNT(DISTINCT l_quantity) AS n_distinct, CAST(MIN(l_quantity) AS DOUBLE) AS min_num, CAST(MAX(l_quantity) AS DOUBLE) AS max_num, COUNT(*) AS n_rows FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice' AS col_name, COUNT(l_extendedprice) AS n_nonnull, COUNT(DISTINCT l_extendedprice) AS n_distinct, CAST(MIN(l_extendedprice) AS DOUBLE) AS min_num, CAST(MAX(l_extendedprice) AS DOUBLE) AS max_num, COUNT(*) AS n_rows FROM lineitem
    UNION ALL
    SELECT 'l_discount' AS col_name, COUNT(l_discount) AS n_nonnull, COUNT(DISTINCT l_discount) AS n_distinct, CAST(MIN(l_discount) AS DOUBLE) AS min_num, CAST(MAX(l_discount) AS DOUBLE) AS max_num, COUNT(*) AS n_rows FROM lineitem
    UNION ALL
    SELECT 'l_tax' AS col_name, COUNT(l_tax) AS n_nonnull, COUNT(DISTINCT l_tax) AS n_distinct, CAST(MIN(l_tax) AS DOUBLE) AS min_num, CAST(MAX(l_tax) AS DOUBLE) AS max_num, COUNT(*) AS n_rows FROM lineitem
    UNION ALL
    SELECT 'l_returnflag' AS col_name, COUNT(l_returnflag) AS n_nonnull, COUNT(DISTINCT l_returnflag) AS n_distinct, CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, COUNT(*) AS n_rows FROM lineitem
    UNION ALL
    SELECT 'l_linestatus' AS col_name, COUNT(l_linestatus) AS n_nonnull, COUNT(DISTINCT l_linestatus) AS n_distinct, CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, COUNT(*) AS n_rows FROM lineitem
    UNION ALL
    SELECT 'l_shipdate' AS col_name, COUNT(l_shipdate) AS n_nonnull, COUNT(DISTINCT l_shipdate) AS n_distinct, CAST(MIN(epoch_us(l_shipdate)) AS DOUBLE) AS min_num, CAST(MAX(epoch_us(l_shipdate)) AS DOUBLE) AS max_num, COUNT(*) AS n_rows FROM lineitem
    ORDER BY col_name
"""

ORACLES["corpus_matrix"] = """
    SELECT lang, source,
           CAST(GROUPING(lang) AS INT) AS is_total_a,
           CAST(GROUPING(source) AS INT) AS is_total_b,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_size
    FROM documents
    GROUP BY GROUPING SETS ((lang), (source), (lang, source))
    ORDER BY is_total_a, is_total_b, lang, source
"""

ORACLES["source_balance_gini"] = """
    WITH ranked AS (
        SELECT source, CAST(n_chars AS BIGINT) AS x,
               CAST(ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY n_chars, doc_id) AS BIGINT) AS rn
        FROM documents)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(x) AS BIGINT) AS total_size,
           CAST(CAST(SUM(2 * rn * x) AS BIGINT)
                - (COUNT(*) + 1) * CAST(SUM(x) AS BIGINT) AS DOUBLE)
           / CAST(COUNT(*) * CAST(SUM(x) AS BIGINT) AS DOUBLE) AS gini
    FROM ranked GROUP BY source ORDER BY source
"""

ORACLES["length_deciles"] = """
    WITH hist AS (
        SELECT n_chars AS v, COUNT(*) AS cnt FROM documents GROUP BY 1),
    cum AS (
        SELECT v,
               SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER () AS n_total
        FROM hist),
    cuts AS (
        SELECT d, MIN(v) AS cut
        FROM cum CROSS JOIN range(1, 10) t(d)
        WHERE cum >= CEIL(d * n_total / 10)
        GROUP BY d)
    SELECT doc_id, n_chars,
           CAST(1 + (SELECT COUNT(*) FROM cuts WHERE cut < n_chars) AS INT)
               AS decile
    FROM documents ORDER BY doc_id
"""

ORACLES["user_features"] = """
    WITH ev AS (
        SELECT user_id AS uid, COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchases,
               CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE) AS total_value,
               CAST(MAX(ts) AS TIMESTAMP) AS last_event_ts
        FROM events GROUP BY 1),
    od AS (
        SELECT o_custkey AS uid, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,8))) AS DOUBLE)
                   AS total_spend
        FROM orders GROUP BY 1)
    SELECT COALESCE(ev.uid, od.uid) AS user_id,
           COALESCE(n_events, 0) AS n_events,
           COALESCE(n_purchases, 0) AS n_purchases,
           COALESCE(total_value, 0.0) AS total_value,
           last_event_ts,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(total_spend, 0.0) AS total_spend
    FROM ev FULL OUTER JOIN od ON ev.uid = od.uid
    ORDER BY user_id
"""

ORACLES["skew_report"] = """
    WITH per_key AS (
        SELECT user_id AS key, COUNT(*) AS rows_per_key
        FROM events GROUP BY 1),
    stats AS (
        SELECT COUNT(*) AS n_keys,
               CAST(SUM(rows_per_key) AS BIGINT) AS n_rows,
               MAX(rows_per_key) AS max_rows
        FROM per_key),
    top AS (
        SELECT key, rows_per_key,
               CAST(ROW_NUMBER() OVER (ORDER BY rows_per_key DESC, key)
                    AS INT) AS rank
        FROM per_key)
    SELECT rank, key, rows_per_key, n_keys, n_rows, max_rows,
           CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)
               AS mean_rows_per_key,
           CAST(rows_per_key AS DOUBLE) /
           (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)) AS skew_factor
    FROM top CROSS JOIN stats
    WHERE rank <= 10 ORDER BY rank
"""

ORACLES["temperature_resample"] = """
    WITH counts AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(FLOOR(sqrt(COUNT(*)) * 1e9) AS BIGINT) AS qw
        FROM documents GROUP BY 1),
    total AS (SELECT CAST(SUM(qw) AS BIGINT) AS qtotal FROM counts)
    SELECT source, n_docs,
           CAST(qw AS DOUBLE) / 1e9 AS weight,
           CAST(qw AS DOUBLE) / CAST(qtotal AS DOUBLE) AS share,
           CAST(FLOOR(CAST(qw AS DOUBLE) / CAST(qtotal AS DOUBLE) * 10000)
                AS BIGINT) AS target_n_at_10k
    FROM counts CROSS JOIN total ORDER BY source
"""

# P23 reuses the full D2 oracle as a subquery (nested WITH is legal
# inside a parenthesized derived table)
from icecube_spark.queries.llm_oracles import ORACLES as _LLM  # noqa: E402

ORACLES["cross_source_leakage"] = f"""
    WITH pairs AS (SELECT * FROM ({_LLM["dedup_minhash_lsh"]})),
    labeled AS (
        SELECT LEAST(da.source, db.source) AS src_lo,
               GREATEST(da.source, db.source) AS src_hi,
               CAST(FLOOR(jaccard * 1e12) AS BIGINT) AS qj
        FROM pairs
        JOIN documents da ON pairs.doc_a = da.doc_id
        JOIN documents db ON pairs.doc_b = db.doc_id)
    SELECT src_lo, src_hi, COUNT(*) AS n_pairs,
           CAST(SUM(qj) AS DOUBLE) / 1e12 / COUNT(*) AS mean_jaccard
    FROM labeled GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLES.update({
    "sequence_packing": f"""
        WITH toks AS (
            SELECT source, doc_id,
                   CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tokens
            FROM documents),
        off AS (
            SELECT *, COALESCE(SUM(n_tokens) OVER (
                PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            ), 0) AS off FROM toks),
        b AS (SELECT *, CAST(FLOOR(off / 4096) AS BIGINT) AS bin FROM off)
        SELECT source, bin, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM b GROUP BY 1, 2
    """,
    "quality_gate_funnel": f"""
        WITH flags AS (
            SELECT (n_chars >= 100) AS g1,
                   (len(string_split({_NORM}, ' ')) >= 20) AS g2,
                   (length(regexp_replace({_NORM}, '[^a-z]', '', 'g')) * 10
                        >= length({_NORM}) * 6) AS g3,
                   (length({_NORM})
                        <= len(string_split({_NORM}, ' ')) * 12) AS g4
            FROM documents),
        a AS (
            SELECT COUNT(*) AS n0,
                   CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                   CAST(SUM(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n3,
                   CAST(SUM(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n4
            FROM flags)
        SELECT gate_no, gate, n_in, n_out, n_in - n_out AS n_dropped FROM (
            SELECT 1 AS gate_no, 'min_length' AS gate, n0 AS n_in, n1 AS n_out
            FROM a
            UNION ALL SELECT 2, 'min_words', n1, n2 FROM a
            UNION ALL SELECT 3, 'alpha_ratio', n2, n3 FROM a
            UNION ALL SELECT 4, 'word_len_sane', n3, n4 FROM a)
    """,
    "dedup_survivorship": f"""
        WITH aug AS (
            SELECT doc_id, text, source, n_chars FROM documents
            UNION ALL
            SELECT doc_id + 10000000 AS doc_id, text, 'mirror' AS source,
                   n_chars
            FROM documents WHERE doc_id % 50 = 0),
        h AS (
            SELECT doc_id, source, n_chars, md5({_NORM}) AS content_hash
            FROM aug)
        SELECT content_hash, MIN(doc_id) AS canonical_id,
               COUNT(*) AS n_members, MAX(n_chars) AS best_n_chars,
               array_to_string(list_sort(list_distinct(list(source))), ',')
                   AS sources
        FROM h GROUP BY 1 HAVING COUNT(*) > 1
    """,
    "class_weights": """
        WITH per AS (
            SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1),
        tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS n_total,
                   COUNT(*) AS n_labels FROM per)
        SELECT label, n, n_total, n_labels,
               CAST(n_total AS DOUBLE) / CAST(n_labels * n AS DOUBLE) AS weight
        FROM per CROSS JOIN tot
    """,
    "shard_manifest": """
        SELECT (doc_id * 2654435761) % 4294967296 % 16 AS shard,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM documents GROUP BY 1
    """,
    "ngram_novelty": f"""
        WITH {_G5_CTES},
        eg AS (SELECT doc_id, UNNEST(g) AS gram FROM grams),
        first AS (SELECT gram, MIN(doc_id) AS first_doc FROM eg GROUP BY 1)
        SELECT doc_id, COUNT(*) AS n_grams,
               CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty
        FROM eg JOIN first USING (gram)
        GROUP BY doc_id ORDER BY doc_id
    """,
})


ORACLES["weighted_sample"] = """
    WITH counts AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(FLOOR(sqrt(COUNT(*)) * 1e9) AS BIGINT) AS qw
        FROM documents GROUP BY 1),
    tot AS (SELECT CAST(SUM(qw) AS BIGINT) AS qtotal,
                   CAST(SUM(n_docs) AS BIGINT) AS n_total FROM counts),
    probs AS (
        SELECT source, n_docs,
               LEAST(CAST(100000 AS BIGINT),
                     (qw * 100000 // qtotal) * n_total // n_docs) AS p_q5
        FROM counts CROSS JOIN tot),
    tagged AS (
        SELECT doc_id, source,
               (doc_id * 2654435761) % 4294967296 % 100000 AS h
        FROM documents),
    kept AS (
        SELECT t.source, COUNT(*) AS n_kept
        FROM tagged t JOIN probs p USING (source)
        WHERE t.h < p.p_q5 GROUP BY 1)
    SELECT p.source, p.n_docs, p.p_q5,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(COALESCE(k.n_kept, 0) AS DOUBLE) / CAST(p.n_docs AS DOUBLE)
               AS kept_frac
    FROM probs p LEFT JOIN kept k USING (source)
    ORDER BY p.source
"""


ORACLES["dataset_card"] = f"""
    WITH ranked AS (
        SELECT source, lang, n_chars,
               md5({_NORM}) AS h,
               ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn
        FROM documents),
    dup AS (
        SELECT CAST(SUM(c - 1) AS BIGINT) AS n_dup_docs
        FROM (SELECT h, COUNT(*) AS c FROM ranked GROUP BY h)),
    agg AS (
        SELECT COUNT(*) AS n_docs,
               COUNT(DISTINCT source) AS n_sources,
               COUNT(DISTINCT lang) AS n_langs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS mean_chars,
               MAX(CASE WHEN rn = CEIL(0.5 * (SELECT COUNT(*) FROM ranked))
                        THEN n_chars END) AS p50_chars
        FROM ranked)
    SELECT n_docs, n_sources, n_langs, total_chars, mean_chars, p50_chars,
           n_dup_docs,
           CAST(n_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate
    FROM agg CROSS JOIN dup
"""

ORACLES.update({
    "curriculum_shards": """
        SELECT doc_id,
               n_chars AS score,
               ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rank,
               CAST((ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1) % 8
                    AS INT) AS shard
        FROM documents
    """,
})

# P32 reuses the (already formatted) minhash pair query as a CTE.
from icecube_spark.queries.llm_oracles import ORACLES as _LLM  # noqa: E402

ORACLES["dup_rate_by_source"] = f"""
    WITH pairs AS ({_LLM["dedup_minhash_lsh"]}),
    labeled AS (
        SELECT LEAST(da.source, db.source) AS source_a,
               GREATEST(da.source, db.source) AS source_b
        FROM pairs p
        JOIN documents da ON p.doc_a = da.doc_id
        JOIN documents db ON p.doc_b = db.doc_id),
    cell AS (
        SELECT source_a, source_b, COUNT(*) AS n_dup_pairs
        FROM labeled GROUP BY 1, 2),
    counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1)
    SELECT source_a, source_b, n_dup_pairs,
           CAST(CASE WHEN source_a = source_b
                     THEN ca.n * (ca.n - 1) // 2
                     ELSE ca.n * cb.n END AS BIGINT) AS possible_pairs,
           CAST(n_dup_pairs AS DOUBLE) /
           CAST(CASE WHEN source_a = source_b
                     THEN ca.n * (ca.n - 1) // 2
                     ELSE ca.n * cb.n END AS DOUBLE) AS dup_rate
    FROM cell
    JOIN counts ca ON source_a = ca.source
    JOIN counts cb ON source_b = cb.source
"""

ORACLES["feature_binning"] = """
    WITH vals AS (
        SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
    ),
    stats AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax FROM vals),
    h AS (SELECT v, COUNT(*) AS cnt FROM vals GROUP BY 1),
    cum AS (
        SELECT v, SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS cum,
               SUM(cnt) OVER () AS n_total
        FROM h
    ),
    ds AS (SELECT UNNEST(range(1, 10)) AS d),
    cuts AS (
        SELECT d, MIN(v) AS cut
        FROM cum CROSS JOIN ds
        WHERE cum >= CEIL(d * n_total / 10)
        GROUP BY d
    ),
    cut_arr AS (SELECT array_agg(cut ORDER BY cut) AS cut_list FROM cuts),
    width AS (
        SELECT 'width' AS method,
               CAST(CASE WHEN vmax = vmin THEN 0
                         ELSE LEAST(9, FLOOR((v - vmin) * 10
                                             / (vmax - vmin))) END
                    AS INT) AS bin,
               v
        FROM vals, stats
    ),
    depth AS (
        SELECT 'depth' AS method,
               CAST(len(list_filter(cut_list, c -> c < v)) AS INT) AS bin,
               v
        FROM vals, cut_arr
    ),
    unioned AS (SELECT * FROM width UNION ALL SELECT * FROM depth)
    SELECT method, bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(v) AS lo, MAX(v) AS hi,
           CAST(SUM(CAST(v AS DECIMAL(18,8))) AS DOUBLE) / COUNT(v)
               AS mean_value
    FROM unioned
    GROUP BY method, bin
    ORDER BY method, bin
"""

ORACLES["quota_rebalance"] = f"""
    WITH counts AS (
        SELECT lang AS _s, COUNT(*) AS n_before FROM documents GROUP BY 1
    ),
    thr AS (
        SELECT _s, n_before,
               CAST(FLOOR(LEAST(1.0,
                   (CAST(SUM(n_before) OVER () AS DOUBLE)
                    / CAST(COUNT(*) OVER () AS DOUBLE))
                   / CAST(n_before AS DOUBLE)) * 1e6) AS BIGINT)
                   AS keep_thr
        FROM counts
    )
    SELECT d.lang,
           CAST(MAX(t.n_before) AS BIGINT) AS n_before,
           MAX(t.keep_thr) AS keep_thr,
           CAST(SUM(CASE WHEN {duck_hex2int("CAST(doc_id AS VARCHAR)")}
                              % 1000000 < t.keep_thr
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_after
    FROM documents d JOIN thr t ON d.lang = t._s
    GROUP BY d.lang
    ORDER BY d.lang
"""

ORACLES["mix_drift"] = """
    WITH counts AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS day_num,
               event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT d.day_num, t.event_type, COALESCE(c.n, 0) AS n
        FROM (SELECT DISTINCT day_num FROM counts) d
        CROSS JOIN (SELECT DISTINCT event_type FROM counts) t
        LEFT JOIN counts c
          ON c.day_num = d.day_num AND c.event_type = t.event_type
    ),
    shares AS (
        SELECT day_num, event_type,
               CAST(FLOOR(CAST(n AS BIGINT) * 1000000
                          / SUM(n) OVER (PARTITION BY day_num))
                    AS BIGINT) AS share_micro
        FROM grid
    ),
    lagged AS (
        SELECT day_num, share_micro,
               LAG(share_micro) OVER (PARTITION BY event_type
                                      ORDER BY day_num) AS prev_share
        FROM shares
    )
    SELECT day_num,
           CAST(CAST(SUM(ABS(share_micro - prev_share)) AS BIGINT)
                AS DOUBLE) / 1e6 AS l1_drift
    FROM lagged
    WHERE prev_share IS NOT NULL
    GROUP BY day_num
    ORDER BY day_num
"""

ORACLES["shard_checksums"] = f"""
    WITH h AS (
        SELECT (doc_id * 2654435761) % 4294967296 % 16 AS shard,
               {duck_hex2int("CAST(text AS VARCHAR)")} AS h,
               octet_length(encode(text)) AS nb
        FROM documents
    )
    SELECT CAST(shard AS INT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nb) AS BIGINT) AS total_bytes,
           CAST(bit_xor(h) AS BIGINT) AS content_xor
    FROM h
    GROUP BY shard
    ORDER BY shard
"""

from icecube_spark.queries.llm_oracles import ORACLES as _LLM_ORACLES  # noqa: E402

ORACLES["curation_waterfall"] = f"""
    WITH raw AS (SELECT doc_id, text, n_chars FROM documents),
    gated AS (
        SELECT * FROM raw
        WHERE n_chars >= 100
          AND len(string_split({_NORM}, ' ')) >= 20
    ),
    flagged AS (
        SELECT doc_id FROM (
            SELECT doc_id,
                   len(list_filter(list_distinct(string_split({_NORM}, ' ')),
                       x -> x IN ('merge', 'deadlock', 'rollback',
                                  'panic', 'corrupt'))) AS nbl
            FROM raw)
        WHERE nbl >= 2
    ),
    blocked_ok AS (
        SELECT g.* FROM gated g
        WHERE g.doc_id NOT IN (SELECT doc_id FROM flagged)
    ),
    canon AS (
        SELECT doc_id FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (PARTITION BY md5({_NORM})
                                      ORDER BY doc_id) AS rn
            FROM blocked_ok)
        WHERE rn = 1
    ),
    pairs AS ({_LLM_ORACLES["dedup_minhash_lsh"]}),
    losers AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
    final AS (
        SELECT c.doc_id FROM canon c
        WHERE c.doc_id NOT IN (SELECT doc_id FROM losers)
    ),
    stages AS (
        SELECT 1 AS stage_no, 'raw' AS stage,
               CAST(COUNT(*) AS BIGINT) AS n_docs FROM raw
        UNION ALL SELECT 2, 'length_gates', CAST(COUNT(*) AS BIGINT)
        FROM gated
        UNION ALL SELECT 3, 'blocklist', CAST(COUNT(*) AS BIGINT)
        FROM blocked_ok
        UNION ALL SELECT 4, 'exact_canonical', CAST(COUNT(*) AS BIGINT)
        FROM canon
        UNION ALL SELECT 5, 'near_dup_keepers', CAST(COUNT(*) AS BIGINT)
        FROM final
    ),
    total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_raw FROM raw)
    SELECT CAST(stage_no AS INT) AS stage_no, stage, n_docs,
           CAST(n_docs AS DOUBLE) / CAST(n_raw AS DOUBLE) AS share_of_raw
    FROM stages, total
    ORDER BY stage_no
"""

ORACLES["truncation_loss"] = f"""
    WITH n_tok AS (
        SELECT doc_id,
               len(list_filter(string_split({_NORM}, ' '), t -> t != ''))
                   AS n
        FROM documents),
    cuts AS (SELECT UNNEST([512, 1024, 2048, 4096]) AS cut_tokens)
    SELECT CAST(cut_tokens AS INT) AS cut_tokens,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n > cut_tokens THEN 1 ELSE 0 END) AS BIGINT)
               AS n_truncated,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST(SUM(GREATEST(0, n - cut_tokens)) AS BIGINT) AS tokens_lost,
           CAST(SUM(GREATEST(0, n - cut_tokens)) AS DOUBLE)
             / CAST(SUM(n) AS DOUBLE) AS frac_tokens_lost,
           CAST(COUNT(*) - SUM(CASE WHEN n > cut_tokens THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS frac_docs_intact
    FROM n_tok CROSS JOIN cuts
    GROUP BY cut_tokens ORDER BY cut_tokens
"""

ORACLES["shard_skew_report"] = """
    WITH base AS (
        SELECT (doc_id * 2654435761) % 4294967296 % 16 AS shard,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_bytes
        FROM documents GROUP BY 1),
    w AS (
        SELECT *,
               CAST(SUM(total_bytes) OVER () AS BIGINT) AS tot,
               CAST(MAX(total_bytes) OVER () AS BIGINT) AS mx
        FROM base)
    SELECT shard,
           CAST(n_docs AS BIGINT) AS n_docs,
           total_bytes,
           CAST(total_bytes AS DOUBLE) / CAST(tot AS DOUBLE) AS byte_share,
           CAST(total_bytes AS DOUBLE)
             / (CAST(tot AS DOUBLE) / 16.0) AS balance_factor,
           CAST(mx AS DOUBLE) / (CAST(tot AS DOUBLE) / 16.0)
               AS max_balance_factor
    FROM w ORDER BY shard
"""

ORACLES["epoch_plan"] = f"""
    WITH counts AS (
        SELECT source AS g, COUNT(*) AS n_docs,
               CAST(SUM(len(list_filter(string_split({_NORM}, ' '),
                   t -> t != ''))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1),
    w AS (SELECT * FROM (VALUES
        ('src0', '0.10'::DOUBLE), ('src1', '0.30'::DOUBLE),
        ('src2', '0.25'::DOUBLE), ('src3', '0.05'::DOUBLE),
        ('src4', '0.30'::DOUBLE)) AS t(g, weight)),
    j AS (
        SELECT c.g, c.n_docs, c.n_tokens,
               COALESCE(w.weight, 0.0) AS weight,
               CAST(SUM(c.n_tokens) OVER () AS BIGINT) AS total_tokens
        FROM counts c LEFT JOIN w USING (g))
    SELECT g AS source, n_docs, n_tokens, weight,
           CAST(total_tokens AS DOUBLE) * weight AS target_tokens,
           CAST(total_tokens AS DOUBLE) * weight
             / CAST(n_tokens AS DOUBLE) AS epochs
    FROM j ORDER BY source
"""

ORACLES["quality_length_corr"] = f"""
    WITH base AS ({_LLM_ORACLES["quality_score"]}),
    q AS (
        SELECT d.source AS g,
               CAST(d.n_chars AS BIGINT) AS qx,
               CAST(FLOOR(b.quality * 1000000.0) AS BIGINT) AS qy
        FROM documents d JOIN base b USING (doc_id)),
    m AS (
        SELECT g, COUNT(*) AS n,
               SUM(CAST(qx AS HUGEINT)) AS sx,
               SUM(CAST(qy AS HUGEINT)) AS sy,
               SUM(CAST(qx AS HUGEINT) * qx) AS sxx,
               SUM(CAST(qy AS HUGEINT) * qy) AS syy,
               SUM(CAST(qx AS HUGEINT) * qy) AS sxy
        FROM q GROUP BY 1)
    SELECT g AS source,
           CAST(n AS BIGINT) AS n_docs,
           CAST(FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
               * 1e9) AS BIGINT) / 1e9 AS length_quality_r
    FROM m ORDER BY source
"""

ORACLES["split_leakage_check"] = f"""
    WITH pairs AS ({_LLM_ORACLES["dedup_minhash_lsh"]}),
    split AS (
        SELECT doc_id,
               CASE WHEN {_BUCKET} < 90 THEN 'train'
                    WHEN {_BUCKET} < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents)
    SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b,
           p.jaccard
    FROM pairs p
    JOIN split sa ON sa.doc_id = p.doc_a
    JOIN split sb ON sb.doc_id = p.doc_b
    WHERE sa.split != sb.split
    ORDER BY p.doc_a, p.doc_b
"""

ORACLES["mann_whitney"] = """
    WITH counts AS (
        SELECT source AS g, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2),
    pairs AS (
        SELECT a.g AS ga, b.g AS gb
        FROM (SELECT DISTINCT g FROM counts) a,
             (SELECT DISTINCT g FROM counts) b
        WHERE a.g < b.g),
    grid AS (
        SELECT p.ga, p.gb, c.v,
               CAST(SUM(CASE WHEN c.g = p.ga THEN c.c ELSE 0 END)
                   AS BIGINT) AS ca,
               CAST(SUM(CASE WHEN c.g = p.gb THEN c.c ELSE 0 END)
                   AS BIGINT) AS cb
        FROM counts c JOIN pairs p ON c.g = p.ga OR c.g = p.gb
        GROUP BY 1, 2, 3),
    cum AS (
        SELECT *, COALESCE(CAST(SUM(cb) OVER (PARTITION BY ga, gb
                   ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING) AS BIGINT), 0) AS cumb
        FROM grid),
    agg AS (
        SELECT ga, gb,
               CAST(SUM(ca) AS BIGINT) AS n_a,
               CAST(SUM(cb) AS BIGINT) AS n_b,
               CAST(SUM(ca * (2 * cumb + cb)) AS BIGINT) AS u2,
               CAST(SUM((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb))
                   AS BIGINT) AS tsum
        FROM cum GROUP BY 1, 2)
    SELECT ga AS group_a, gb AS group_b, n_a, n_b, u2,
           CASE WHEN CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                     * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
                        - CAST(tsum AS DOUBLE)
                          / (CAST(n_a + n_b AS DOUBLE)
                             * (CAST(n_a + n_b AS DOUBLE) - 1.0))) > 0
                THEN FLOOR((CAST(u2 AS DOUBLE)
                            - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                           / 2.0
                           / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                                  / 12.0
                                  * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
                                     - CAST(tsum AS DOUBLE)
                                       / (CAST(n_a + n_b AS DOUBLE)
                                          * (CAST(n_a + n_b AS DOUBLE)
                                             - 1.0))))
                           * 1e9) / 1e9
           END AS z,
           FLOOR((CAST(u2 AS DOUBLE)
                  - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                 / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) * 1e9) / 1e9
               AS rank_biserial
    FROM agg ORDER BY group_a, group_b
"""

ORACLES["dsir_weights"] = f"""
    WITH toks AS (
        SELECT doc_id, lang, UNNEST(string_split({_NORM}, ' ')) AS tok
        FROM documents),
    bucketed AS (
        SELECT doc_id, lang, {duck_hex2int('tok')} % 256 AS b
        FROM toks WHERE tok != ''),
    grid AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS cs,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                   AS BIGINT) AS ct
        FROM bucketed GROUP BY 1),
    tot AS (
        SELECT CAST(SUM(cs) AS BIGINT) AS tcs,
               CAST(SUM(ct) AS BIGINT) AS tct
        FROM grid),
    lw AS (
        SELECT b,
               CAST(FLOOR(ln(((CAST(ct AS DOUBLE) + 1.0)
                              * (CAST(tcs AS DOUBLE) + 256.0))
                             / ((CAST(cs AS DOUBLE) + 1.0)
                                * (CAST(tct AS DOUBLE) + 256.0)))
                          * 1e6) AS BIGINT) AS lwm
        FROM grid, tot)
    SELECT t.doc_id, t.lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(CAST(SUM(l.lwm) AS BIGINT) AS DOUBLE) / 1e6 AS log_weight
    FROM bucketed t JOIN lw l ON t.b = l.b
    GROUP BY 1, 2 ORDER BY t.doc_id
"""


ORACLES["zorder_plan"] = """
    WITH b AS (
        SELECT (((((CAST(l_partkey AS BIGINT) >> 0) & 1) << 0) + (((CAST(l_partkey AS BIGINT) >> 1) & 1) << 2) + (((CAST(l_partkey AS BIGINT) >> 2) & 1) << 4) + (((CAST(l_partkey AS BIGINT) >> 3) & 1) << 6) + (((CAST(l_partkey AS BIGINT) >> 4) & 1) << 8) + (((CAST(l_partkey AS BIGINT) >> 5) & 1) << 10) + (((CAST(l_partkey AS BIGINT) >> 6) & 1) << 12) + (((CAST(l_partkey AS BIGINT) >> 7) & 1) << 14)) + ((((CAST(l_suppkey AS BIGINT) >> 0) & 1) << 1) + (((CAST(l_suppkey AS BIGINT) >> 1) & 1) << 3) + (((CAST(l_suppkey AS BIGINT) >> 2) & 1) << 5) + (((CAST(l_suppkey AS BIGINT) >> 3) & 1) << 7) + (((CAST(l_suppkey AS BIGINT) >> 4) & 1) << 9) + (((CAST(l_suppkey AS BIGINT) >> 5) & 1) << 11) + (((CAST(l_suppkey AS BIGINT) >> 6) & 1) << 13) + (((CAST(l_suppkey AS BIGINT) >> 7) & 1) << 15))) AS z,
               CAST(l_partkey AS BIGINT) AS ka,
               CAST(l_suppkey AS BIGINT) AS kb
        FROM lineitem),
    g AS (
        SELECT CAST(z >> 8 AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(ka) AS min_a, MAX(ka) AS max_a,
               MIN(kb) AS min_b, MAX(kb) AS max_b
        FROM b GROUP BY 1)
    SELECT bucket, n_rows, min_a, max_a, min_b, max_b,
           CAST(CASE WHEN max_a < 100 OR min_a > 140 THEN 1 ELSE 0 END
               AS INT) AS prunable_for_probe
    FROM g ORDER BY bucket
"""


ORACLES["bloom_filter_eval"] = f"""
    WITH base AS (
        SELECT doc_id AS id, md5({_NORM}) AS digest,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0 AS is_base
        FROM documents),
    bits AS (
        SELECT DISTINCT UNNEST([CAST(concat('0x', substr(md5(concat(digest, '|', 0)), 1, 15)) AS BIGINT) % 262144, CAST(concat('0x', substr(md5(concat(digest, '|', 1)), 1, 15)) AS BIGINT) % 262144,
                                CAST(concat('0x', substr(md5(concat(digest, '|', 2)), 1, 15)) AS BIGINT) % 262144, CAST(concat('0x', substr(md5(concat(digest, '|', 3)), 1, 15)) AS BIGINT) % 262144]) AS bit
        FROM base WHERE is_base),
    base_digests AS (SELECT DISTINCT digest FROM base WHERE is_base),
    probes AS (
        SELECT id, digest,
               UNNEST([CAST(concat('0x', substr(md5(concat(digest, '|', 0)), 1, 15)) AS BIGINT) % 262144, CAST(concat('0x', substr(md5(concat(digest, '|', 1)), 1, 15)) AS BIGINT) % 262144,
                       CAST(concat('0x', substr(md5(concat(digest, '|', 2)), 1, 15)) AS BIGINT) % 262144, CAST(concat('0x', substr(md5(concat(digest, '|', 3)), 1, 15)) AS BIGINT) % 262144]) AS bit
        FROM base WHERE NOT is_base),
    hits AS (
        SELECT p.id, p.digest,
               SUM(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        FROM probes p LEFT JOIN bits b ON b.bit = p.bit GROUP BY 1, 2),
    truth AS (
        SELECT h.id,
               CAST(CASE WHEN n_hit = 4 THEN 1 ELSE 0 END AS INT)
                   AS bloom_pos,
               CASE WHEN d.digest IS NOT NULL THEN 1 ELSE 0 END AS true_dup
        FROM hits h LEFT JOIN base_digests d ON d.digest = h.digest),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_set_bits FROM bits),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
               CAST(SUM(bloom_pos) AS BIGINT) AS n_bloom_positive,
               CAST(SUM(true_dup) AS BIGINT) AS n_true_dup,
               CAST(SUM(CASE WHEN bloom_pos = 1 AND true_dup = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positive
        FROM truth)
    SELECT n_probes, n_bloom_positive, n_true_dup, n_false_positive,
           n_set_bits,
           CAST(n_set_bits AS DOUBLE) / 262144.0 AS fill_ratio,
           CASE WHEN (n_probes - n_true_dup) > 0
                THEN CAST(n_false_positive AS DOUBLE)
                     / CAST(n_probes - n_true_dup AS DOUBLE) END AS fpr
    FROM agg, nb
"""

ORACLES["quantile_normalize"] = """
    WITH vals AS (SELECT doc_id, source, n_chars AS v FROM documents),
    ranked AS (
        SELECT doc_id, source, v,
               CAST(ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY v, doc_id) AS BIGINT) AS r,
               CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ns
        FROM vals),
    pooled AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY 1),
    cums AS (
        SELECT v AS pv,
               CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS cum_hi,
               CAST(COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN
                   UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS cum_lo
        FROM pooled),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM vals)
    SELECT r.doc_id, r.source, r.v AS value, c.pv AS qnorm_value
    FROM (SELECT rr.*, t.n_total FROM ranked rr, tot t) r
    JOIN cums c
      ON ((r.r * r.n_total + r.ns - 1) // r.ns) > c.cum_lo
     AND ((r.r * r.n_total + r.ns - 1) // r.ns) <= c.cum_hi
    ORDER BY r.doc_id
"""


ORACLES["table_diff"] = """
    WITH v1 AS (
        SELECT o_orderkey AS k, o_custkey, o_orderstatus, o_totalprice,
               o_orderpriority
        FROM orders),
    v2 AS (
        SELECT o_orderkey AS k, o_custkey, o_orderstatus,
               CASE WHEN CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) % 13 = 0
                    THEN o_totalprice + 1.0 ELSE o_totalprice END
                   AS o_totalprice,
               o_orderpriority
        FROM orders
        WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) % 97 != 0),
    pres AS (
        SELECT COALESCE(a.k, b.k) AS k,
               CASE WHEN a.k IS NULL THEN 0 ELSE 1 END AS in_a,
               CASE WHEN b.k IS NULL THEN 0 ELSE 1 END AS in_b
        FROM (SELECT k FROM v1) a
        FULL OUTER JOIN (SELECT k FROM v2) b ON a.k = b.k),
    j AS (
        SELECT COALESCE(a.k, b.k) AS k,
               CASE WHEN NOT (a.o_custkey IS NOT DISTINCT FROM b.o_custkey)
                    THEN 1 ELSE 0 END AS chg_o_custkey,
               CASE WHEN NOT (a.o_orderstatus
                              IS NOT DISTINCT FROM b.o_orderstatus)
                    THEN 1 ELSE 0 END AS chg_o_orderstatus,
               CASE WHEN NOT (a.o_totalprice
                              IS NOT DISTINCT FROM b.o_totalprice)
                    THEN 1 ELSE 0 END AS chg_o_totalprice,
               CASE WHEN NOT (a.o_orderpriority
                              IS NOT DISTINCT FROM b.o_orderpriority)
                    THEN 1 ELSE 0 END AS chg_o_orderpriority
        FROM v1 a FULL OUTER JOIN v2 b ON a.k = b.k),
    f AS (SELECT j.*, p.in_a, p.in_b FROM j JOIN pres p ON p.k = j.k)
    SELECT
        CAST(SUM(CASE WHEN in_a = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_added,
        CAST(SUM(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_removed,
        CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1
                       AND chg_o_custkey + chg_o_orderstatus
                           + chg_o_totalprice + chg_o_orderpriority > 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1
                       AND chg_o_custkey + chg_o_orderstatus
                           + chg_o_totalprice + chg_o_orderpriority = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
        CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN chg_o_custkey
                      ELSE 0 END) AS BIGINT) AS n_changed_o_custkey,
        CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN chg_o_orderstatus
                      ELSE 0 END) AS BIGINT) AS n_changed_o_orderstatus,
        CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN chg_o_totalprice
                      ELSE 0 END) AS BIGINT) AS n_changed_o_totalprice,
        CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN chg_o_orderpriority
                      ELSE 0 END) AS BIGINT) AS n_changed_o_orderpriority
    FROM f
"""

ORACLES["stratified_kfold"] = """
    WITH a AS (
        SELECT CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 5 AS fold, lang AS s FROM documents),
    g AS (SELECT fold, s, CAST(COUNT(*) AS BIGINT) AS c
          FROM a GROUP BY 1, 2),
    m AS (
        SELECT *,
               CAST(SUM(c) OVER (PARTITION BY fold) AS BIGINT) AS n_fold,
               CAST(SUM(c) OVER (PARTITION BY s) AS BIGINT) AS n_s,
               CAST(SUM(c) OVER () AS BIGINT) AS n_total
        FROM g),
    t AS (
        SELECT fold, n_fold,
               CAST(FLOOR((CAST(c AS DOUBLE)
                           - CAST(n_fold AS DOUBLE) * CAST(n_s AS DOUBLE)
                             / CAST(n_total AS DOUBLE))
                          * (CAST(c AS DOUBLE)
                             - CAST(n_fold AS DOUBLE) * CAST(n_s AS DOUBLE)
                               / CAST(n_total AS DOUBLE))
                          / (CAST(n_fold AS DOUBLE) * CAST(n_s AS DOUBLE)
                             / CAST(n_total AS DOUBLE))
                          * 1e9) AS BIGINT) AS tq
        FROM m)
    SELECT fold, MAX(n_fold) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(CAST(SUM(tq) AS BIGINT) AS DOUBLE) / 1e9 AS chi2
    FROM t GROUP BY 1 ORDER BY 1
"""

ORACLES["k_anonymity"] = """
    WITH g AS (
        SELECT lang, source, n_chars, CAST(COUNT(*) AS BIGINT) AS k
        FROM documents GROUP BY 1, 2, 3),
    b AS (
        SELECT CASE WHEN k = 1 THEN '1' WHEN k <= 4 THEN '2-4'
                    WHEN k <= 9 THEN '5-9' ELSE '10+' END AS k_bucket, k
        FROM g),
    r AS (
        SELECT k_bucket, CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(k) AS BIGINT) AS n_rows
        FROM b GROUP BY 1)
    SELECT k_bucket, n_classes, n_rows,
           CAST(n_rows AS DOUBLE)
               / CAST(CAST(SUM(n_rows) OVER () AS BIGINT) AS DOUBLE)
               AS row_share
    FROM r ORDER BY k_bucket
"""


ORACLES["packing_curve"] = f"""
    WITH toks AS (
        SELECT source, doc_id,
               CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
    off AS (
        SELECT *, COALESCE(SUM(n_tokens) OVER (
            PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ), 0) AS off FROM toks),
    curve AS (
    SELECT CAST(256 AS INT) AS context_len,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(LEAST(bin_tokens, 256)) AS BIGINT) AS filled_capacity
    FROM (SELECT source, CAST(FLOOR(off / 256) AS BIGINT) AS bin,
                 CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
          FROM off GROUP BY 1, 2)
    UNION ALL
    SELECT CAST(512 AS INT) AS context_len,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(LEAST(bin_tokens, 512)) AS BIGINT) AS filled_capacity
    FROM (SELECT source, CAST(FLOOR(off / 512) AS BIGINT) AS bin,
                 CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
          FROM off GROUP BY 1, 2)
    UNION ALL
    SELECT CAST(1024 AS INT) AS context_len,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(LEAST(bin_tokens, 1024)) AS BIGINT) AS filled_capacity
    FROM (SELECT source, CAST(FLOOR(off / 1024) AS BIGINT) AS bin,
                 CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
          FROM off GROUP BY 1, 2)
    UNION ALL
    SELECT CAST(2048 AS INT) AS context_len,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(LEAST(bin_tokens, 2048)) AS BIGINT) AS filled_capacity
    FROM (SELECT source, CAST(FLOOR(off / 2048) AS BIGINT) AS bin,
                 CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
          FROM off GROUP BY 1, 2))
    SELECT context_len, n_bins, total_tokens,
           CAST(filled_capacity AS DOUBLE)
               / (CAST(n_bins AS DOUBLE) * CAST(context_len AS DOUBLE))
               AS fill_ratio
    FROM curve ORDER BY context_len
"""

ORACLES["erasure_impact"] = """
    WITH uids AS (
        SELECT uid FROM (SELECT DISTINCT user_id AS uid FROM events)
        WHERE CAST(concat('0x', substr(md5(CAST(uid AS VARCHAR)), 1, 15)) AS BIGINT) % 50 = 0),
    ev AS (
        SELECT 'events' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS n_affected
        FROM events e WHERE EXISTS (SELECT 1 FROM uids u
                                    WHERE u.uid = e.user_id)),
    evt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM events),
    orr AS (
        SELECT 'orders' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS n_affected
        FROM orders o WHERE EXISTS (SELECT 1 FROM uids u
                                    WHERE u.uid = o.o_custkey)),
    ort AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM orders)
    SELECT table_name, n_affected, n_total,
           CAST(n_affected AS DOUBLE) / CAST(n_total AS DOUBLE)
               AS affected_share
    FROM (SELECT ev.table_name, ev.n_affected, evt.n_total FROM ev, evt
          UNION ALL
          SELECT orr.table_name, orr.n_affected, ort.n_total FROM orr, ort)
    ORDER BY table_name
"""

ORACLES["cms_heavy_hitters"] = f"""
    WITH terms AS (
        SELECT UNNEST(string_split({_NORM}, ' ')) AS term FROM documents),
    tf AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM terms
        WHERE term != '' GROUP BY term),
    hashed AS (
        SELECT term, n, j.j,
               {duck_hex2int("concat('cms', CAST(j.j AS VARCHAR), '|', term)")}
                   % 1024 AS bucket
        FROM tf CROSS JOIN (SELECT UNNEST(range(0, 4)) AS j) j),
    cells AS (
        SELECT j, bucket, SUM(n) AS cell FROM hashed GROUP BY j, bucket),
    topk AS (
        SELECT term, n, rank FROM (
            SELECT term, n,
                   CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS INT)
                       AS rank
            FROM tf)
        WHERE rank <= 20),
    probes AS (
        SELECT t.term, t.n, t.rank, j.j,
               {duck_hex2int("concat('cms', CAST(j.j AS VARCHAR), '|', t.term)")}
                   % 1024 AS bucket
        FROM topk t CROSS JOIN (SELECT UNNEST(range(0, 4)) AS j) j)
    SELECT p.rank, p.term, p.n AS exact,
           CAST(MIN(c.cell) AS BIGINT) AS estimate,
           CAST(MIN(c.cell) AS BIGINT) - p.n AS overestimate
    FROM probes p JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
    GROUP BY p.rank, p.term, p.n
    ORDER BY p.rank
"""

ORACLES["quality_reliability"] = """
    WITH qbase AS (
        SELECT doc_id,
               0.3 * least(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) / 100.0, 1.0)
               + 0.3 * (len(list_filter(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '), x -> list_contains(['the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'], x)))
                        / len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')))
               + 0.2 * (length(regexp_replace(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), '[^a-z]', '', 'g'))
                        / length(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
               + 0.2 * least((length(replace(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ', ''))
                              / len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))) / 10.0, 1.0)
                   AS quality,
               CAST(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) BETWEEN 10 AND 100000
                    AND (length(replace(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ', ''))
                         / len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))) BETWEEN 2.0 AND 10.0
                    AND (len(regexp_extract_all(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), '#|\\.\\.\\.'))
                         / len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))) < 0.1
                    AND len(list_intersect(list_distinct(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')), ['the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'])) >= 2
                    AS INT) AS keep
        FROM documents),
    h AS (SELECT quality AS v, COUNT(*) AS cnt FROM qbase GROUP BY 1),
    cum AS (
        SELECT v, SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS cum,
               SUM(cnt) OVER () AS n_total
        FROM h),
    ds AS (SELECT UNNEST(range(1, 10)) AS d),
    cuts AS (
        SELECT d, MIN(v) AS cut
        FROM cum CROSS JOIN ds
        WHERE cum >= CEIL(d * n_total / 10)
        GROUP BY d),
    cut_arr AS (SELECT array_agg(cut ORDER BY cut) AS cut_list FROM cuts),
    binned AS (
        SELECT CAST(len(list_filter(cut_list, c -> c < quality)) AS INT)
                   AS bin,
               quality, keep
        FROM qbase, cut_arr)
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(keep) AS BIGINT) AS n_keep,
           CAST(SUM(keep) AS DOUBLE) / COUNT(*) AS keep_rate,
           CAST(SUM(CAST(FLOOR(quality * 1e9) AS BIGINT)) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE) * 1e9) AS mean_quality
    FROM binned GROUP BY bin ORDER BY bin
"""

ORACLES["dedup_cost_model"] = """
    WITH nbase AS (
        SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                   AS exact_key,
               substr(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      1, 32) AS prefix_key,
               CAST(FLOOR(length(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                          'g')) / 64) AS BIGINT) AS len_key
        FROM documents),
    h1 AS (SELECT exact_key AS k, COUNT(*) AS b FROM nbase GROUP BY 1),
    h2 AS (SELECT prefix_key AS k, COUNT(*) AS b FROM nbase GROUP BY 1),
    h3 AS (SELECT CAST(len_key AS VARCHAR) AS k, COUNT(*) AS b
           FROM nbase GROUP BY 1),
    reps AS (
        SELECT 'exact_hash' AS method, CAST(COUNT(*) AS BIGINT)
                   AS n_buckets,
               CAST(SUM((b * (b - 1)) // 2) AS BIGINT) AS candidate_pairs,
               CAST(MAX(b) AS BIGINT) AS max_bucket
        FROM h1
        UNION ALL
        SELECT 'prefix_32', CAST(COUNT(*) AS BIGINT),
               CAST(SUM((b * (b - 1)) // 2) AS BIGINT),
               CAST(MAX(b) AS BIGINT)
        FROM h2
        UNION ALL
        SELECT 'length_64', CAST(COUNT(*) AS BIGINT),
               CAST(SUM((b * (b - 1)) // 2) AS BIGINT),
               CAST(MAX(b) AS BIGINT)
        FROM h3)
    SELECT * FROM reps ORDER BY method
"""

ORACLES["token_budget_sample"] = """
    WITH scored AS (
        SELECT source AS grp, doc_id AS id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tok,
               CAST(FLOOR(1e6
                   * CAST(len(list_distinct(
                         string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
                   / CAST(len(string_split_regex(trim(text), '\\s+'))
                          AS DOUBLE)) AS BIGINT) AS score_q
        FROM documents),
    flagged AS (
        SELECT grp, n_tok, score_q,
               SUM(n_tok) OVER (PARTITION BY grp
                   ORDER BY score_q DESC, id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) <= 600
                   AS kept
        FROM scored),
    rep AS (
        SELECT grp,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_kept,
               CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
               CAST(SUM(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT)
                   AS tokens_kept,
               CAST(SUM(CASE WHEN kept THEN score_q ELSE 0 END) AS BIGINT)
                   AS ks,
               CAST(SUM(score_q) AS BIGINT) AS ts
        FROM flagged GROUP BY 1)
    SELECT grp AS source, n_docs, docs_kept, tokens_total, tokens_kept,
           CAST(tokens_kept AS DOUBLE) / CAST(tokens_total AS DOUBLE)
               AS token_share,
           CAST(ks AS DOUBLE) / CAST(docs_kept AS DOUBLE) / 1e6
               AS mean_score_kept,
           CAST(ts AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1e6
               AS mean_score_all
    FROM rep ORDER BY source
"""

ORACLES["length_filter_tuning"] = """
    WITH tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_len
        FROM documents),
    per AS (
        SELECT t.threshold,
               CAST(SUM(CASE WHEN n_chars >= t.threshold THEN 1 ELSE 0 END)
                    AS BIGINT) AS docs_kept,
               CAST(SUM(CASE WHEN n_chars >= t.threshold THEN n_chars
                             ELSE 0 END) AS BIGINT) AS len_kept
        FROM documents CROSS JOIN
             (SELECT UNNEST([100, 200, 300, 400, 600]) AS threshold) t
        GROUP BY 1)
    SELECT CAST(threshold AS INT) AS threshold, docs_kept,
           CAST(docs_kept AS DOUBLE) / CAST(total_docs AS DOUBLE)
               AS doc_share,
           len_kept,
           CAST(len_kept AS DOUBLE) / CAST(total_len AS DOUBLE) AS len_share
    FROM per CROSS JOIN tot ORDER BY threshold
"""

ORACLES["cross_shard_dup_rate"] = """
    WITH base AS (
        SELECT concat_ws(' ', list_slice(
                   string_split_regex(trim(text), '\\s+'), 1, 8)) AS k,
               CAST(doc_id % 8 AS VARCHAR) AS sh1,
               source AS sh2
        FROM documents),
    rep1 AS (
        SELECT 'doc_id_mod8' AS scheme, dup_groups, total_pairs,
               same_shard_pairs
        FROM (
            SELECT CAST(COUNT(*) AS BIGINT) AS dup_groups,
                   CAST(SUM((g * (g - 1)) // 2) AS BIGINT) AS total_pairs,
                   CAST(SUM(same_k) AS BIGINT) AS same_shard_pairs
            FROM (
                SELECT k, CAST(SUM(s) AS BIGINT) AS g,
                       CAST(SUM((s * (s - 1)) // 2) AS BIGINT) AS same_k
                FROM (SELECT k, sh1, CAST(COUNT(*) AS BIGINT) AS s
                      FROM base GROUP BY 1, 2)
                GROUP BY 1 HAVING CAST(SUM(s) AS BIGINT) >= 2))),
    rep2 AS (
        SELECT 'source' AS scheme, dup_groups, total_pairs,
               same_shard_pairs
        FROM (
            SELECT CAST(COUNT(*) AS BIGINT) AS dup_groups,
                   CAST(SUM((g * (g - 1)) // 2) AS BIGINT) AS total_pairs,
                   CAST(SUM(same_k) AS BIGINT) AS same_shard_pairs
            FROM (
                SELECT k, CAST(SUM(s) AS BIGINT) AS g,
                       CAST(SUM((s * (s - 1)) // 2) AS BIGINT) AS same_k
                FROM (SELECT k, sh2, CAST(COUNT(*) AS BIGINT) AS s
                      FROM base GROUP BY 1, 2)
                GROUP BY 1 HAVING CAST(SUM(s) AS BIGINT) >= 2)))
    SELECT scheme, dup_groups, total_pairs, same_shard_pairs,
           CAST(total_pairs - same_shard_pairs AS DOUBLE)
               / CAST(total_pairs AS DOUBLE) AS cross_share
    FROM (SELECT * FROM rep1 UNION ALL SELECT * FROM rep2)
    ORDER BY scheme
"""

ORACLES["sample_size_planner"] = """
    WITH agg AS (
        SELECT source AS grp,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pass
        FROM documents GROUP BY 1),
    calc AS (
        SELECT grp, n_docs, n_pass,
               CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE) AS p,
               CAST(n_docs AS DOUBLE) AS nn
        FROM agg),
    sized AS (
        SELECT grp, n_docs, p,
               ((3.8415999999999997e0 * (CAST(n_pass * (n_docs - n_pass)
                                                AS DOUBLE)
                                           / CAST(n_docs * n_docs AS DOUBLE)))
                   / 0.0009e0) AS n0,
               nn
        FROM calc)
    SELECT grp AS source, n_docs, p AS pass_rate, n0 AS n_infinite,
           CAST(CEIL(n0 / (1.0 + (n0 - 1.0) / nn)) AS BIGINT)
               AS sample_needed,
           CEIL(n0 / (1.0 + (n0 - 1.0) / nn)) / nn AS sampling_frac
    FROM sized ORDER BY source
"""

ORACLES["split_stratification_check"] = f"""
    WITH assigned AS (
        SELECT source AS stratum,
               CASE WHEN {_BUCKET} < 90 THEN 'train'
                    WHEN {_BUCKET} < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents),
    cells AS (
        SELECT split, stratum, CAST(COUNT(*) AS BIGINT) AS obs
        FROM assigned GROUP BY 1, 2),
    m AS (
        SELECT *,
               CAST(SUM(obs) OVER (PARTITION BY split) AS BIGINT)
                   AS split_n,
               CAST(SUM(obs) OVER (PARTITION BY stratum) AS BIGINT)
                   AS strat_n,
               CAST(SUM(obs) OVER () AS BIGINT) AS nn
        FROM cells),
    scored AS (
        SELECT split, stratum, obs,
               CAST(split_n AS DOUBLE) * CAST(strat_n AS DOUBLE)
                   / CAST(nn AS DOUBLE) AS expected,
               (CAST(obs AS DOUBLE)
                - CAST(split_n AS DOUBLE) * CAST(strat_n AS DOUBLE)
                      / CAST(nn AS DOUBLE))
               / sqrt(CAST(split_n AS DOUBLE) * CAST(strat_n AS DOUBLE)
                      / CAST(nn AS DOUBLE)) AS std_residual
        FROM m),
    q AS (
        SELECT *,
               CAST(FLOOR(std_residual * std_residual * 1e9) AS BIGINT)
                   AS qchi
        FROM scored)
    SELECT split, stratum, obs, expected, std_residual,
           CAST(CAST(SUM(qchi) OVER (PARTITION BY split) AS BIGINT)
                AS DOUBLE) / 1e9 AS chi2
    FROM q ORDER BY split, stratum
"""

ORACLES["retention_policy_matrix"] = """
    WITH scored AS (
        SELECT doc_id AS id,
               concat_ws(' ', list_slice(
                   string_split_regex(trim(text), '\\s+'), 1, 8)) AS k,
               n_chars AS ln,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tok,
               CAST(FLOOR(1e6
                   * CAST(len(list_distinct(
                         string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
                   / CAST(len(string_split_regex(trim(text), '\\s+'))
                          AS DOUBLE)) AS BIGINT) AS score_q
        FROM documents),
    fan AS (
        SELECT s.*, p.policy,
               CASE WHEN p.policy = 'keep_first' THEN 0
                    WHEN p.policy = 'keep_longest' THEN -ln
                    ELSE -score_q END AS o1
        FROM scored s CROSS JOIN
             (SELECT UNNEST(['keep_first', 'keep_longest',
                             'keep_densest']) AS policy) p),
    reps AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY policy, k ORDER BY o1, id) AS rn
            FROM fan) WHERE rn = 1),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS docs_before,
               CAST(SUM(n_tok) AS BIGINT) AS tokens_before
        FROM scored)
    SELECT policy, docs_before,
           CAST(COUNT(*) AS BIGINT) AS docs_after,
           tokens_before,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_after,
           CAST(CAST(SUM(n_tok) AS BIGINT) AS DOUBLE)
               / CAST(tokens_before AS DOUBLE) AS token_share,
           CAST(CAST(SUM(score_q) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 1e6 AS mean_density_after
    FROM reps CROSS JOIN tot
    GROUP BY policy, docs_before, tokens_before ORDER BY policy
"""

ORACLES["oov_rate_by_source"] = """
    WITH toks AS (
        SELECT source AS src,
               UNNEST(string_split(regexp_replace(lower(trim(text)),
                                                  '\\s+', ' ', 'g'), ' '))
                   AS tok
        FROM documents),
    toks2 AS (SELECT * FROM toks WHERE tok != ''),
    vocab AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM toks2 GROUP BY 1),
    ranked AS (
        SELECT tok, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rnk
        FROM vocab),
    st AS (
        SELECT src, tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks2 GROUP BY 1, 2),
    fan AS (
        SELECT src, tf, rnk, t.k
        FROM st JOIN ranked USING (tok)
        CROSS JOIN (SELECT UNNEST([100, 500, 1000]) AS k) t)
    SELECT src AS source, CAST(k AS INT) AS vocab_k,
           CAST(SUM(tf) AS BIGINT) AS tokens,
           CAST(SUM(CASE WHEN rnk > k THEN tf ELSE 0 END) AS BIGINT)
               AS oov_tokens,
           CAST(SUM(CASE WHEN rnk > k THEN tf ELSE 0 END) AS DOUBLE)
               / CAST(SUM(tf) AS DOUBLE) AS oov_rate
    FROM fan GROUP BY 1, 2 ORDER BY source, vocab_k
"""

ORACLES["neyman_allocation"] = """
    WITH mom AS (
        SELECT source AS stratum, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sx,
               SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars) AS sxx
        FROM documents GROUP BY 1),
    weighted AS (
        SELECT stratum, n_docs,
               SQRT(GREATEST(CAST(n_docs AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
                   / CAST(n_docs AS DOUBLE) AS std_size,
               CAST(FLOOR(CAST(n_docs AS DOUBLE)
                          * (SQRT(GREATEST(CAST(n_docs AS DOUBLE)
                                  * CAST(sxx AS DOUBLE)
                                  - CAST(sx AS DOUBLE)
                                    * CAST(sx AS DOUBLE), 0.0))
                             / CAST(n_docs AS DOUBLE)) * 1e6)
                    AS BIGINT) AS wq
        FROM mom)
    SELECT stratum, n_docs, std_size,
           CAST((1000 * wq) // SUM(wq) OVER () AS BIGINT) AS neyman_n,
           CAST((1000 * n_docs) // SUM(n_docs) OVER () AS BIGINT)
               AS proportional_n
    FROM weighted ORDER BY stratum
"""

ORACLES["gate_kappa"] = """
    WITH flags AS (
        SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
               CASE WHEN len(list_filter(
                        string_split(regexp_replace(trim(text),
                                                    '\\s+', ' ', 'g'), ' '),
                        x -> x != '')) >= 60
                    THEN 1 ELSE 0 END AS b
        FROM documents),
    counts AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a * b) AS BIGINT) AS n_both,
               CAST(SUM(a * (1 - b)) AS BIGINT) AS n_a_only,
               CAST(SUM((1 - a) * b) AS BIGINT) AS n_b_only,
               CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n_neither
        FROM flags)
    SELECT n, n_both, n_a_only, n_b_only, n_neither,
           CAST(n_both + n_neither AS DOUBLE) / CAST(n AS DOUBLE)
               AS observed_agreement,
           (CAST(n_both + n_a_only AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(n_both + n_b_only AS DOUBLE) / CAST(n AS DOUBLE))
           + (1.0 - CAST(n_both + n_a_only AS DOUBLE) / CAST(n AS DOUBLE))
               * (1.0 - CAST(n_both + n_b_only AS DOUBLE)
                  / CAST(n AS DOUBLE)) AS chance_agreement,
           (CAST(n_both + n_neither AS DOUBLE) / CAST(n AS DOUBLE)
            - ((CAST(n_both + n_a_only AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(n_both + n_b_only AS DOUBLE) / CAST(n AS DOUBLE))
               + (1.0 - CAST(n_both + n_a_only AS DOUBLE)
                  / CAST(n AS DOUBLE))
               * (1.0 - CAST(n_both + n_b_only AS DOUBLE)
                  / CAST(n AS DOUBLE))))
           / (1.0 - ((CAST(n_both + n_a_only AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(n_both + n_b_only AS DOUBLE)
                        / CAST(n AS DOUBLE))
                     + (1.0 - CAST(n_both + n_a_only AS DOUBLE)
                        / CAST(n AS DOUBLE))
                     * (1.0 - CAST(n_both + n_b_only AS DOUBLE)
                        / CAST(n AS DOUBLE)))) AS kappa
    FROM counts
"""

ORACLES["curation_ablation"] = """
    WITH toks AS (
        SELECT n_chars,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                           'g'), ' ') AS t
        FROM documents),
    flagged AS (
        SELECT n_chars >= 100 AS p_len,
               len(t) >= 20 AS p_tok,
               len(list_filter(t, x -> x IN ('the','a','an','and','or',
                                             'of','to','in','is','it')))
                   >= 2 AS p_stop
        FROM toks),
    agg AS (
        SELECT CAST(count_if(NOT p_len) AS BIGINT) AS k_len,
               CAST(count_if(NOT p_tok) AS BIGINT) AS k_tok,
               CAST(count_if(NOT p_stop) AS BIGINT) AS k_stop,
               CAST(count_if(NOT p_len AND p_tok AND p_stop) AS BIGINT)
                   AS u_len,
               CAST(count_if(p_len AND NOT p_tok AND p_stop) AS BIGINT)
                   AS u_tok,
               CAST(count_if(p_len AND p_tok AND NOT p_stop) AS BIGINT)
                   AS u_stop
        FROM flagged),
    gates AS (
        SELECT 'min_length' AS gate, k_len AS n_killed,
               u_len AS n_unique_killed FROM agg
        UNION ALL
        SELECT 'min_tokens', k_tok, u_tok FROM agg
        UNION ALL
        SELECT 'stopword_evidence', k_stop, u_stop FROM agg)
    SELECT gate, n_killed, n_unique_killed,
           CASE WHEN n_killed > 0
                THEN CAST(n_unique_killed AS DOUBLE)
                     / CAST(n_killed AS DOUBLE)
                ELSE 0.0 END AS unique_share
    FROM gates ORDER BY gate
"""

ORACLES["chunking_plan"] = """
    WITH per_doc AS (
        SELECT source AS grp,
               CAST(len(string_split(regexp_replace(lower(trim(text)),
                                                    '\\s+', ' ', 'g'), ' '))
                    AS BIGINT) AS n_tokens
        FROM documents),
    chunked AS (
        SELECT grp, n_tokens,
               CASE WHEN n_tokens <= 512 THEN CAST(1 AS BIGINT)
                    ELSE CAST(1 + CEIL(CAST(n_tokens - 512 AS DOUBLE)
                                       / 448.0) AS BIGINT) END AS n_chunks
        FROM per_doc)
    SELECT grp AS source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
           CAST(SUM(n_chunks) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS chunks_per_doc,
           CAST(SUM(n_chunks) * 512 - SUM(n_chunks - 1) * 64
                - SUM(n_tokens) AS DOUBLE)
               / CAST(SUM(n_tokens) AS DOUBLE) AS padding_waste_share,
           CAST(SUM(n_chunks - 1) * 64 AS DOUBLE)
               / CAST(SUM(n_tokens) AS DOUBLE) AS overlap_overhead_share
    FROM chunked GROUP BY 1 ORDER BY source
"""

ORACLES["dedup_token_savings"] = """
    WITH base AS (
        SELECT doc_id, source,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                   AS h,
               CAST(len(string_split(regexp_replace(lower(trim(text)),
                                                    '\\s+', ' ', 'g'), ' '))
                    AS BIGINT) AS n_tok
        FROM documents),
    canon AS (
        SELECT h, MIN(doc_id) AS canonical_id FROM base GROUP BY 1),
    marked AS (
        SELECT b.source, b.n_tok,
               b.doc_id != c.canonical_id AS removable
        FROM base b JOIN canon c ON b.h = c.h)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN removable THEN n_tok ELSE 0 END) AS BIGINT)
               AS removable_tokens,
           CAST(SUM(CASE WHEN removable THEN n_tok ELSE 0 END) AS DOUBLE)
               / CAST(SUM(n_tok) AS DOUBLE) AS savings_share
    FROM marked GROUP BY 1 ORDER BY source
"""

ORACLES["split_length_parity"] = f"""
    WITH assigned AS (
        SELECT n_chars,
               CASE WHEN {_BUCKET} < 90 THEN 'train'
                    WHEN {_BUCKET} < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents),
    banded AS (
        SELECT split,
               CASE WHEN n_chars < 100 THEN 'a_lt100'
                    WHEN n_chars < 200 THEN 'b_100_199'
                    WHEN n_chars < 300 THEN 'c_200_299'
                    WHEN n_chars < 400 THEN 'd_300_399'
                    ELSE 'e_ge400' END AS band
        FROM assigned),
    counts AS (
        SELECT band, split, CAST(COUNT(*) AS BIGINT) AS n
        FROM banded GROUP BY 1, 2),
    shares AS (
        SELECT band, split,
               CAST(n AS DOUBLE)
                   / CAST(SUM(n) OVER (PARTITION BY split) AS DOUBLE)
                   AS share
        FROM counts),
    pivoted AS (
        SELECT band,
               MAX(CASE WHEN split = 'train' THEN share END) AS train_share,
               MAX(CASE WHEN split = 'val' THEN share END) AS val_share,
               MAX(CASE WHEN split = 'test' THEN share END) AS test_share
        FROM shares GROUP BY 1)
    SELECT band, train_share, val_share, test_share,
           GREATEST(train_share, val_share, test_share)
               - LEAST(train_share, val_share, test_share) AS max_share_gap
    FROM pivoted ORDER BY band
"""

ORACLES["prefix_collision_curve"] = """
    WITH ks AS (SELECT UNNEST([8, 16, 32, 64]) AS k),
    pref AS (
        SELECT k, substr(text, 1, k) AS prefix
        FROM documents CROSS JOIN ks),
    grp AS (
        SELECT k, prefix, COUNT(*) AS n_docs
        FROM pref GROUP BY 1, 2)
    SELECT k,
           CAST(SUM(CASE WHEN n_docs > 1 THEN n_docs ELSE 0 END) AS BIGINT)
               AS n_docs_colliding,
           CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_collision_groups,
           CAST(SUM(CASE WHEN n_docs > 1 THEN n_docs ELSE 0 END) AS DOUBLE)
               / CAST(SUM(n_docs) AS DOUBLE) AS collision_rate
    FROM grp GROUP BY 1 ORDER BY k
"""

ORACLES["length_band_dup_rate"] = """
    WITH grp AS (
        SELECT CASE WHEN n_chars < 500 THEN 0
                    WHEN n_chars < 2000 THEN 1
                    WHEN n_chars < 8000 THEN 2
                    ELSE 3 END AS band,
               md5(text) AS h, COUNT(*) AS c
        FROM documents GROUP BY 1, 2)
    SELECT band,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
               AS dup_docs,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
               / CAST(SUM(c) AS DOUBLE) AS dup_rate
    FROM grp GROUP BY 1 ORDER BY band
"""

ORACLES["id_continuity_audit"] = """
    WITH per AS (
        SELECT doc_id // 1000 AS block, doc_id FROM documents)
    SELECT CAST(block AS BIGINT) AS block,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_ids,
           CAST(MAX(doc_id) - MIN(doc_id) + 1 - COUNT(DISTINCT doc_id)
                AS BIGINT) AS n_gaps,
           CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT) AS n_dup_ids
    FROM per GROUP BY 1 ORDER BY block
"""


# --- P33 part_pagerank: unrolled quantized PageRank twin ------------
# Mirrors operators/pipeline.pagerank's pico-unit integer fold
# (floor(frac*qrank) per edge, exact BIGINT sums, one IEEE double
# expression per update) so all 5 iterations are bit-reproducible.

def _pagerank_ctes(iterations: int = 5) -> str:
    parts = ["""lp AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    prs AS MATERIALIZED (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS w
        FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2),
    ed AS MATERIALIZED (SELECT pa AS src, pb AS dst, w FROM prs
           UNION ALL SELECT pb, pa, w FROM prs),
    outw AS MATERIALIZED (SELECT src, SUM(CAST(w AS DOUBLE)) AS out_w
             FROM ed GROUP BY 1),
    en AS MATERIALIZED (SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / o.out_w AS frac
           FROM ed e JOIN outw o USING (src)),
    nodes AS MATERIALIZED (SELECT src AS node FROM ed UNION SELECT dst FROM ed),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS MATERIALIZED (SELECT node, CAST(FLOOR(1e12 / nn.n) AS BIGINT) AS qr
           FROM nodes, nn)"""]
    for i in range(1, iterations + 1):
        parts.append(f"""c{i} AS MATERIALIZED (
        SELECT e.dst,
               SUM(CAST(FLOOR(e.frac * CAST(r.qr AS DOUBLE)) AS BIGINT))
                   AS received
        FROM en e JOIN r{i - 1} r ON e.src = r.node GROUP BY 1),
    dm{i} AS MATERIALIZED (
        SELECT CAST(COALESCE(SUM(r.qr), 0) AS BIGINT) AS dm
        FROM r{i - 1} r
        WHERE r.node NOT IN (SELECT src FROM outw)),
    r{i} AS MATERIALIZED (
        SELECT n.node,
               CAST(FLOOR(((1e0 - 85e-2) / nn.n) * 1e12
                    + 85e-2 * (CAST(COALESCE(c.received, 0) AS DOUBLE)
                               + CAST(d.dm AS DOUBLE) / nn.n))
                    AS BIGINT) AS qr
        FROM nodes n
        LEFT JOIN c{i} c ON n.node = c.dst, nn, dm{i} d)""")
    return ",\n    ".join(parts)


ORACLES["part_pagerank"] = f"""
    WITH {_pagerank_ctes(5)}
    SELECT node, CAST(qr AS DOUBLE) / 1e12 AS rank
    FROM r5 ORDER BY rank DESC, node LIMIT 100
"""


# Close the llm_oracles <-> pipeline_oracles cycle: when THIS module
# is imported first, llm_oracles could not format dup_cluster_purity
# (dedup_clusters was not defined yet) — finish it here.
from icecube_spark.queries import llm_oracles as _llm_mod  # noqa: E402

if "{cc_sql}" in _llm_mod.ORACLES["dup_cluster_purity"]:
    _llm_mod.ORACLES["dup_cluster_purity"] = (
        _llm_mod.ORACLES["dup_cluster_purity"].format(
            cc_sql=ORACLES["dedup_clusters"]
        )
    )

ORACLES["split_hash_uniformity"] = f"""
    WITH per AS (
        SELECT {duck_hex2int('CAST(doc_id AS VARCHAR)')} % 100 AS b,
               COUNT(*) AS obs
        FROM documents GROUP BY 1),
    dev AS (
        SELECT obs,
               SUM(obs) OVER () AS n,
               COUNT(*) OVER () AS n_buckets,
               CAST(CAST(100 * obs - SUM(obs) OVER () AS DOUBLE)
                    * CAST(100 * obs - SUM(obs) OVER () AS DOUBLE)
                    AS DECIMAL(38,4)) AS sq
        FROM per)
    SELECT CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(n_buckets) AS BIGINT) AS n_buckets,
           CAST(MIN(obs) AS BIGINT) AS min_bucket,
           CAST(MAX(obs) AS BIGINT) AS max_bucket,
           CAST(SUM(sq) AS DOUBLE) / (100.0 * CAST(MAX(n) AS DOUBLE))
               AS chi2,
           CAST(MAX(obs) AS DOUBLE) / CAST(MIN(obs) AS DOUBLE)
               AS max_min_ratio
    FROM dev
"""

ORACLES["sample_overlap_audit"] = f"""
    WITH flagged AS (
        SELECT {duck_hex2int("concat('saltA:', CAST(doc_id AS VARCHAR))")}
                   % 10 = 0 AS in_a,
               {duck_hex2int("concat('saltB:', CAST(doc_id AS VARCHAR))")}
                   % 10 = 0 AS in_b
        FROM documents),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_sample_a,
               CAST(SUM(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_sample_b,
               CAST(SUM(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_overlap
        FROM flagged)
    SELECT n_docs, n_sample_a, n_sample_b, n_overlap,
           CAST(n_sample_a AS DOUBLE) * CAST(n_sample_b AS DOUBLE)
               / CAST(n_docs AS DOUBLE) AS expected_overlap,
           CAST(n_overlap AS DOUBLE)
               / (CAST(n_sample_a AS DOUBLE) * CAST(n_sample_b AS DOUBLE)
                  / CAST(n_docs AS DOUBLE)) AS overlap_ratio
    FROM agg
"""

ORACLES["id_hash_collisions"] = """
    WITH pre AS (
        SELECT w, substring(md5(CAST(doc_id AS VARCHAR)), 1, w) AS b
        FROM documents, UNNEST([4, 6, 8]) t(w)),
    agg AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n_ids,
               CAST(COUNT(DISTINCT b) AS BIGINT) AS n_buckets
        FROM pre GROUP BY 1)
    SELECT CAST(w * 4 AS INT) AS bits, n_ids, n_buckets,
           CAST(n_ids - n_buckets AS BIGINT) AS n_colliding,
           CAST(n_ids AS DOUBLE) * CAST(n_ids - 1 AS DOUBLE)
               / (2.0 * CASE w WHEN 4 THEN 65536.0 WHEN 6 THEN 16777216.0
                               ELSE 4294967296.0 END)
               AS expected_collisions
    FROM agg ORDER BY 1
"""

ORACLES["temperature_sweep"] = """
    WITH src AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1),
    pre AS (
        SELECT tau, lang, n_docs,
               CAST(FLOOR(CASE tau
                   WHEN 0.25 THEN sqrt(sqrt(CAST(n_docs AS DOUBLE)))
                   WHEN 0.5 THEN sqrt(CAST(n_docs AS DOUBLE))
                   WHEN 0.75 THEN sqrt(CAST(n_docs AS DOUBLE))
                                 * sqrt(sqrt(CAST(n_docs AS DOUBLE)))
                   ELSE CAST(n_docs AS DOUBLE) END * 1e6) AS BIGINT) AS q
        FROM src, UNNEST([0.25, 0.5, 0.75, 1.0]) t(tau))
    SELECT tau, lang, n_docs,
           CAST(q AS DOUBLE) / CAST(SUM(q) OVER (PARTITION BY tau) AS DOUBLE)
               AS weight,
           CAST(q AS DOUBLE)
             * CAST(SUM(n_docs) OVER (PARTITION BY tau) AS DOUBLE)
             / (CAST(SUM(q) OVER (PARTITION BY tau) AS DOUBLE)
                * CAST(n_docs AS DOUBLE)) AS boost
    FROM pre ORDER BY tau, lang
"""
