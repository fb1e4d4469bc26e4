"""DuckDB oracle SQL for SURVEY §2 groups D/E/F/G (twin of
llm_queries.py). Hash parity: md5 hex strings are identical across
engines; minhash minima are lexicographic minima of fixed-width hex;
dot products fold in DECIMAL(18,12) (exact => order-free). Integer
outputs are cast to Spark's types so schemas align.
"""

_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"

# distinct word 3-grams (whole normalized text when < 3 words)
_GRAMS_CTES = f"""
        toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        grams AS (
            SELECT doc_id,
                   list_distinct(
                     CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                          ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                FOR i IN range(1, len(t) - 1)]
                     END) AS g
            FROM toks)
"""

# per-vector norm with quantized-integer fold (floor(x*1e12) matches
# Spark bit-for-bit; decimal casts do not — see operators/similarity.py)
_VNORM = """
        v AS (
            SELECT vec_id, label, embedding,
                   sqrt(CAST(list_sum(
                       [CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12) AS BIGINT)
                        FOR x IN embedding]) AS DOUBLE) / 1e12) AS nrm
            FROM embeddings)
"""

_PAIR_COS = """
            (CAST(list_sum(
                [CAST(floor(CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE) * 1e12) AS BIGINT)
                 FOR x IN list_zip({a}, {b})]) AS DOUBLE) / 1e12) / ({na} * {nb})
"""

_STOPS = "['the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it']"
_MARKERS = {
    "en": "['the', 'a', 'is', 'and', 'of']",
    "de": "['der', 'die', 'das', 'und', 'ist']",
    "fr": "['le', 'la', 'les', 'et', 'est']",
    "es": "['el', 'los', 'las', 'y', 'es']",
}
_scores = ",\n               ".join(
    f"CAST(len(list_filter({_TOKS}, x -> list_contains({lst}, x))) AS INT) AS {lang}_score"
    for lang, lst in _MARKERS.items()
)

ORACLES: dict[str, str] = {
    "dedup_exact": f"""
        WITH h AS (SELECT doc_id, md5({_NORM}) AS content_hash FROM documents),
        g AS (SELECT content_hash, MIN(doc_id) AS canonical_id,
                     COUNT(*) AS group_size
              FROM h GROUP BY 1)
        SELECT h.doc_id, h.content_hash, g.canonical_id, g.group_size,
               g.group_size > 1 AS is_duplicate
        FROM h JOIN g USING (content_hash)
    """,
    "dedup_minhash_lsh": f"""
        WITH {_GRAMS_CTES},
        eg AS (SELECT doc_id, UNNEST(g) AS gram FROM grams),
        based AS (SELECT doc_id,
                         CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT)
                             & {{base_mask}} AS base
                  FROM eg),
        sigs AS (SELECT doc_id, {{sig_cols}} FROM based GROUP BY doc_id),
        banded AS (SELECT doc_id, [{{band_list}}] AS bands FROM sigs),
        expl AS (SELECT doc_id, i AS band_id, bands[i+1] AS band_hash
                 FROM banded, range(16) t(i)),
        cands AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM expl a JOIN expl b
              ON a.band_id = b.band_id AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id),
        verify AS (
            SELECT c.doc_a, c.doc_b,
                   len(list_intersect(ga.g, gb.g)) AS inter,
                   len(ga.g) AS la, len(gb.g) AS lb
            FROM cands c
            JOIN grams ga ON c.doc_a = ga.doc_id
            JOIN grams gb ON c.doc_b = gb.doc_id)
        SELECT doc_a, doc_b, inter / (la + lb - inter) AS jaccard
        FROM verify WHERE inter / (la + lb - inter) >= 0.8
    """,
    "dedup_ngram_jaccard": f"""
        WITH {_GRAMS_CTES},
        e AS (SELECT doc_id, UNNEST(g) AS gram FROM grams),
        rare AS (SELECT doc_id, gram FROM (
            SELECT doc_id, gram, COUNT(*) OVER (PARTITION BY gram) AS df
            FROM e) WHERE df <= 64),
        cands AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM rare a JOIN rare b
              ON a.gram = b.gram AND a.doc_id < b.doc_id),
        verify AS (
            SELECT c.doc_a, c.doc_b,
                   len(list_intersect(ga.g, gb.g)) AS inter,
                   len(ga.g) AS la, len(gb.g) AS lb
            FROM cands c
            JOIN grams ga ON c.doc_a = ga.doc_id
            JOIN grams gb ON c.doc_b = gb.doc_id)
        SELECT doc_a, doc_b, inter / (la + lb - inter) AS jaccard
        FROM verify WHERE inter / (la + lb - inter) >= 0.5
    """,
    "dedup_simhash": f"""
        WITH toksd AS (SELECT doc_id, list_distinct({_TOKS}) AS tk FROM documents),
        hs AS (SELECT doc_id,
                      [CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)
                       FOR t IN tk] AS hl
               FROM toksd),
        flat AS (SELECT doc_id, UNNEST(hl) AS h FROM hs),
        bits AS (SELECT doc_id, b,
                        SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
                 FROM flat, range(60) t(b) GROUP BY 1, 2),
        sim AS (SELECT doc_id,
                       CAST(SUM(CASE WHEN s >= 0
                                THEN (CAST(1 AS BIGINT) << b)
                                ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
                FROM bits GROUP BY 1),
        chunks AS (SELECT doc_id, simhash, k AS chunk_id,
                          (simhash >> (k * 15)) & 32767 AS chunk
                   FROM sim, range(4) t(k))
        SELECT doc_a, doc_b, hamming FROM (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
            FROM chunks a JOIN chunks b
              ON a.chunk_id = b.chunk_id AND a.chunk = b.chunk
             AND a.doc_id < b.doc_id)
        WHERE hamming <= 10
    """,
    "embed_cosine_topk": f"""
        WITH {_VNORM},
        q AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn
              FROM v WHERE vec_id < 10),
        pairs AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   {_PAIR_COS.format(a='q.qv', b='c.embedding', na='q.qn', nb='c.nrm')} AS cosine
            FROM q JOIN v c ON c.vec_id != q.query_id)
        SELECT query_id, neighbor_id, cosine, rank FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
            ) AS INT) AS rank
            FROM pairs)
        WHERE rank <= 5 ORDER BY query_id, rank
    """,
    "embed_knn_label": f"""
        WITH {_VNORM},
        q AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn
              FROM v WHERE vec_id < 10),
        pairs AS (
            SELECT q.query_id, c.vec_id AS neighbor_id, c.label AS nl,
                   {_PAIR_COS.format(a='q.qv', b='c.embedding', na='q.qn', nb='c.nrm')} AS cosine
            FROM q JOIN v c ON c.vec_id != q.query_id),
        topk AS (
            SELECT query_id, neighbor_id, nl FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
                ) AS r FROM pairs)
            WHERE r <= 5),
        votes AS (SELECT query_id, nl, COUNT(*) AS votes
                  FROM topk GROUP BY 1, 2)
        SELECT query_id, nl AS predicted_label, votes FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY votes DESC, nl ASC
            ) AS r FROM votes)
        WHERE r = 1 ORDER BY query_id
    """,
    "embed_ann_lsh": f"""
        WITH {_VNORM},
        coded AS (
            SELECT vec_id, embedding, nrm,
                   CAST((SELECT SUM(CASE WHEN
                       list_sum(
                           [CAST(floor(CASE WHEN substr(md5(p::VARCHAR || '|' || j::VARCHAR), 1, 1) >= '8'
                                      THEN 1.0 ELSE -1.0 END
                                 * CAST(embedding[j] AS DOUBLE) * 1e12) AS BIGINT)
                            FOR j IN range(1, len(embedding) + 1)]) >= 0
                       THEN (1 << p) ELSE 0 END) FROM range(8) t(p)) AS INT) AS code
            FROM v),
        pairs AS (
            SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, a.code,
                   {_PAIR_COS.format(a='a.embedding', b='b.embedding', na='a.nrm', nb='b.nrm')} AS cosine
            FROM coded a JOIN coded b
              ON a.code = b.code AND a.vec_id != b.vec_id)
        SELECT vec_id, neighbor_id, cosine, code FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id
            ) AS r FROM pairs)
        WHERE r = 1 ORDER BY vec_id
    """,
    "lang_id": f"""
        WITH scored AS (
            SELECT doc_id, {_scores}
            FROM documents)
        SELECT *,
               CASE WHEN en_score + de_score + fr_score + es_score = 0 THEN 'und'
                    WHEN en_score >= de_score AND en_score >= fr_score
                         AND en_score >= es_score THEN 'en'
                    WHEN de_score >= fr_score AND de_score >= es_score THEN 'de'
                    WHEN fr_score >= es_score THEN 'fr'
                    ELSE 'es' END AS predicted_lang
        FROM scored
    """,
    "quality_score": f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(len({_TOKS}) AS INT) AS n_words,
                   CAST(length({_NORM}) AS INT) AS n_chars_norm,
                   length(regexp_replace({_NORM}, '[^a-z]', '', 'g'))
                       / length({_NORM}) AS alpha_ratio,
                   len(list_filter({_TOKS}, x -> list_contains({_STOPS}, x)))
                       / len({_TOKS}) AS stopword_ratio,
                   length(replace({_NORM}, ' ', '')) / len({_TOKS}) AS avg_word_len
            FROM documents)
        SELECT *,
               0.3 * least(n_words / 100.0, 1.0)
               + 0.3 * stopword_ratio
               + 0.2 * alpha_ratio
               + 0.2 * least(avg_word_len / 10.0, 1.0) AS quality
        FROM base
    """,
    "token_count": f"""
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS ws_tokens,
               CAST(len(regexp_extract_all({_NORM}, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS re_tokens,
               CAST(length(text) AS INT) AS n_chars
        FROM documents
    """,
    "repetition_stats": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        g2 AS (
            SELECT doc_id,
                   CAST(len(t) AS INT) AS n_words,
                   len(list_distinct(t)) AS n_distinct_words,
                   UNNEST(CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
                          ELSE [t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]
                          END) AS gram
            FROM toks),
        pg AS (SELECT doc_id, n_words, n_distinct_words, gram, COUNT(*) AS n
               FROM g2 GROUP BY 1, 2, 3, 4)
        SELECT doc_id, n_words,
               1.0 - n_distinct_words / n_words AS dup_word_frac,
               MAX(n) AS top_2gram_n,
               MAX(n) / SUM(n) AS top_2gram_frac
        FROM pg GROUP BY doc_id, n_words, n_distinct_words
    """,
    "gopher_quality": f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(len({_TOKS}) AS INT) AS n_words,
                   length(replace({_NORM}, ' ', '')) / len({_TOKS})
                       AS mean_word_len,
                   len(regexp_extract_all({_NORM}, '#|\\.\\.\\.'))
                       / len({_TOKS}) AS symbol_ratio,
                   CAST(len(list_intersect(list_distinct({_TOKS}), {_STOPS}))
                        AS INT) AS n_stop_distinct
            FROM documents)
        SELECT *,
               n_words BETWEEN 10 AND 100000
               AND mean_word_len BETWEEN 2.0 AND 10.0
               AND symbol_ratio < 0.1
               AND n_stop_distinct >= 2 AS keep
        FROM base
    """,
    "term_commonness": f"""
        WITH toks AS (
            SELECT doc_id, UNNEST(list_distinct({_TOKS})) AS tok
            FROM documents),
        vocab AS (SELECT tok, COUNT(*) AS df_count FROM toks GROUP BY 1),
        total AS (SELECT COUNT(*) AS n_docs_total FROM documents)
        SELECT doc_id,
               COUNT(*) AS n_distinct_tokens,
               SUM(df_count) / COUNT(*) / n_docs_total AS mean_doc_freq
        FROM toks JOIN vocab USING (tok), total
        GROUP BY doc_id, n_docs_total
    """,
    "doc_fingerprint": f"""
        WITH {_GRAMS_CTES}
        SELECT doc_id,
               CAST(len(g) AS INT) AS n_grams,
               array_to_string(list_sort([md5(x) FOR x IN g])[1:5], ',') AS fingerprint
        FROM grams
    """,
    "multimodal_meta": """
        SELECT doc_id,
               strlen(text) AS byte_len,
               (strlen(text) % 64) * 16 + 16 AS width,
               ((strlen(text) // 64) % 64) * 16 + 16 AS height,
               strlen(text) % 7 + 1 AS n_frames,
               'image' AS modality
        FROM documents
    """,
}


# fill the minhash universal-hash placeholders from the shared coeffs
from icecube_spark.functions import hashing as _hashing  # noqa: E402

_sig_cols = ", ".join(
    f"MIN(({a} * base + {b}) % {_hashing.MERSENNE_P}) AS s{i}"
    for i, (a, b) in enumerate(_hashing.minhash_coeffs(64))
)
_band_list = ", ".join(
    "md5('%d' || '|' || s%d || '|' || s%d || '|' || s%d || '|' || s%d)"
    % (b, b * 4, b * 4 + 1, b * 4 + 2, b * 4 + 3)
    for b in range(16)
)
ORACLES["dedup_minhash_lsh"] = ORACLES["dedup_minhash_lsh"].format(
    base_mask=_hashing.BASE_MASK, sig_cols=_sig_cols, band_list=_band_list
)

ORACLES["dedup_embedding_cosine"] = f"""
    WITH {_VNORM},
    coded AS (
        SELECT vec_id, embedding, nrm,
               CAST((SELECT SUM(CASE WHEN
                   list_sum(
                       [CAST(floor(CASE WHEN substr(md5(p::VARCHAR || '|' || j::VARCHAR), 1, 1) >= '8'
                                  THEN 1.0 ELSE -1.0 END
                             * CAST(embedding[j] AS DOUBLE) * 1e12) AS BIGINT)
                        FOR j IN range(1, len(embedding) + 1)]) >= 0
                   THEN (1 << p) ELSE 0 END) FROM range(8) t(p)) AS INT) AS code
        FROM v)
    SELECT vec_a, vec_b, cosine FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_PAIR_COS.format(a='a.embedding', b='b.embedding', na='a.nrm', nb='b.nrm')} AS cosine
        FROM coded a JOIN coded b ON a.code = b.code AND a.vec_id < b.vec_id)
    WHERE cosine >= 0.35
    ORDER BY vec_a, vec_b
"""

ORACLES["vocab_stats"] = f"""
    WITH terms AS (
        SELECT source, UNNEST(string_split({_NORM}, ' ')) AS term
        FROM documents),
    counts AS (
        SELECT source, term, COUNT(*) AS n FROM terms
        WHERE term != '' GROUP BY 1, 2)
    SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
           COUNT(*) AS vocab_size,
           CAST(count_if(n = 1) AS BIGINT) AS n_hapax,
           COUNT(*) / SUM(n) AS type_token_ratio
    FROM counts GROUP BY source ORDER BY source
"""

ORACLES["embed_label_centroids"] = """
    SELECT label, CAST(gs - 1 AS INT) AS dim, COUNT(*) AS n,
           CAST(SUM(CAST(CAST(embedding[CAST(gs AS INT)] AS DOUBLE)
                         AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS centroid
    FROM embeddings CROSS JOIN generate_series(1, 64) AS t(gs)
    GROUP BY 1, 2 ORDER BY label, dim
"""

ORACLES["bigram_lift"] = f"""
    WITH toks AS (SELECT {_TOKS} AS t FROM documents),
    terms AS (SELECT UNNEST(t) AS term FROM toks),
    fterms AS (SELECT term FROM terms WHERE term != ''),
    uni AS (SELECT term, COUNT(*) AS c_term FROM fterms GROUP BY 1),
    total AS (SELECT COUNT(*) AS n_total FROM fterms),
    bi0 AS (
        SELECT CASE WHEN len(t) < 2 THEN []
                    ELSE [t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]
               END AS g
        FROM toks),
    bi AS (
        SELECT gram, COUNT(*) AS c_gram
        FROM (SELECT UNNEST(g) AS gram FROM bi0)
        GROUP BY 1 HAVING COUNT(*) >= 5),
    scored AS (
        SELECT gram, c_gram,
               u1.c_term AS c_t1, u2.c_term AS c_t2,
               CAST(n_total * c_gram AS DOUBLE)
                   / CAST(u1.c_term * u2.c_term AS DOUBLE) AS lift
        FROM bi
        JOIN uni u1 ON u1.term = string_split(gram, ' ')[1]
        JOIN uni u2 ON u2.term = string_split(gram, ' ')[2]
        CROSS JOIN total)
    SELECT * FROM (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY lift DESC, gram) AS INT)
                   AS rank,
               gram, c_gram, c_t1, c_t2, lift
        FROM scored)
    WHERE rank <= 20
"""

ORACLES["embed_quantize"] = """
    WITH s AS (
        SELECT MIN(CAST(list_min(embedding) AS DOUBLE)) AS gmin,
               MAX(CAST(list_max(embedding) AS DOUBLE)) AS gmax
        FROM embeddings)
    SELECT vec_id,
           array_to_string(list_transform(embedding, x ->
               CAST(LEAST(255, GREATEST(0, CAST(FLOOR(
                   (CAST(x AS DOUBLE) - gmin) * CAST(255 AS DOUBLE)
                       / (gmax - gmin)) AS INT))) AS VARCHAR)), ',') AS qvec,
           gmin, gmax
    FROM embeddings CROSS JOIN s
"""

ORACLES["centroid_similarity"] = """
    WITH cent AS (
        SELECT label, CAST(gs - 1 AS INT) AS dim,
               CAST(SUM(CAST(CAST(embedding[CAST(gs AS INT)] AS DOUBLE)
                             AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS c
        FROM embeddings CROSS JOIN generate_series(1, 64) AS t(gs)
        GROUP BY 1, 2),
    norms AS (
        SELECT label,
               CAST(CAST(SUM(CAST(FLOOR(c * c * 1e12) AS BIGINT))
                         AS BIGINT) AS DOUBLE) / 1e12 AS sq
        FROM cent GROUP BY 1),
    dots AS (
        SELECT a.label AS label_a, b.label AS label_b,
               CAST(CAST(SUM(CAST(FLOOR(a.c * b.c * 1e12) AS BIGINT))
                         AS BIGINT) AS DOUBLE) / 1e12 AS dot
        FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
        GROUP BY 1, 2)
    SELECT label_a, label_b, dot,
           dot / (sqrt(na.sq) * sqrt(nb.sq)) AS cosine
    FROM dots
    JOIN norms na ON na.label = dots.label_a
    JOIN norms nb ON nb.label = dots.label_b
    ORDER BY label_a, label_b
"""

ORACLES["embed_dim_stats"] = """
    WITH e AS (
        SELECT CAST(gs - 1 AS INT) AS dim,
               CAST(embedding[CAST(gs AS INT)] AS DOUBLE) AS x
        FROM embeddings CROSS JOIN generate_series(1, 64) AS t(gs))
    SELECT dim, COUNT(*) AS n,
           CAST(SUM(CAST(x AS DECIMAL(18,8))) AS DOUBLE) / COUNT(x) AS mean,
           MIN(x) AS min_val, MAX(x) AS max_val,
           CAST(CAST(SUM(CAST(FLOOR(x * x * 1e12) AS BIGINT)) AS BIGINT)
                AS DOUBLE) / 1e12 / COUNT(*) AS mean_sq
    FROM e GROUP BY 1 ORDER BY dim
"""

ORACLES["embed_norm_outliers"] = """
    WITH vecs AS (
        SELECT vec_id,
               CAST(CAST(SUM(CAST(FLOOR(
                   CAST(embedding[CAST(gs AS INT)] AS DOUBLE)
                 * CAST(embedding[CAST(gs AS INT)] AS DOUBLE)
                 * 1e12) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12 AS norm_sq
        FROM embeddings CROSS JOIN generate_series(1, 64) AS t(gs)
        GROUP BY 1),
    stats AS (
        SELECT
            CAST(CAST(SUM(CAST(FLOOR(norm_sq * 1e9) AS BIGINT)) AS BIGINT)
                 AS DOUBLE) / 1e9 / COUNT(*) AS mean_norm_sq,
            sqrt(
              CAST(CAST(SUM(CAST(FLOOR(norm_sq * norm_sq * 1e9) AS BIGINT))
                   AS BIGINT) AS DOUBLE) / 1e9 / COUNT(*)
              - (CAST(CAST(SUM(CAST(FLOOR(norm_sq * 1e9) AS BIGINT)) AS BIGINT)
                   AS DOUBLE) / 1e9 / COUNT(*))
              * (CAST(CAST(SUM(CAST(FLOOR(norm_sq * 1e9) AS BIGINT)) AS BIGINT)
                   AS DOUBLE) / 1e9 / COUNT(*))
            ) AS std_norm_sq
        FROM vecs)
    SELECT vec_id, norm_sq, mean_norm_sq,
           (norm_sq - mean_norm_sq) / std_norm_sq AS z,
           ABS(norm_sq - mean_norm_sq) > 3 * std_norm_sq AS is_outlier
    FROM vecs CROSS JOIN stats ORDER BY vec_id
"""

ORACLES["dedup_containment"] = f"""
    WITH {_GRAMS_CTES},
    e AS (SELECT doc_id, UNNEST(g) AS gram FROM grams),
    rare AS (SELECT doc_id, gram FROM (
        SELECT doc_id, gram, COUNT(*) OVER (PARTITION BY gram) AS df
        FROM e) WHERE df <= 64),
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM rare a JOIN rare b
          ON a.gram = b.gram AND a.doc_id < b.doc_id),
    verify AS (
        SELECT c.doc_a, c.doc_b,
               CAST(len(ga.g) AS INT) AS grams_a,
               CAST(len(gb.g) AS INT) AS grams_b,
               CAST(len(list_intersect(ga.g, gb.g)) AS BIGINT) AS n_shared
        FROM cands c
        JOIN grams ga ON c.doc_a = ga.doc_id
        JOIN grams gb ON c.doc_b = gb.doc_id)
    SELECT doc_a, doc_b, grams_a, grams_b, n_shared,
           CAST(n_shared AS DOUBLE) / CAST(LEAST(grams_a, grams_b) AS DOUBLE)
               AS containment
    FROM verify
    WHERE CAST(n_shared AS DOUBLE) / CAST(LEAST(grams_a, grams_b) AS DOUBLE) >= 0.8
"""

ORACLES["doc_top_tfidf"] = f"""
    WITH terms AS (
        SELECT doc_id, UNNEST({_TOKS}) AS term FROM documents),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM terms
        WHERE term != '' GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT doc_id, term, tf, df,
               CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
                   AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN nd),
    ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, term) AS INT) AS rank
        FROM scored)
    SELECT doc_id, term, tf, df, score, rank
    FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
"""

ORACLES["langid_confusion"] = f"""
    WITH scored AS (
        SELECT doc_id, lang, {_scores}
        FROM documents),
    pred AS (
        SELECT doc_id, lang AS true_lang,
               CASE WHEN en_score + de_score + fr_score + es_score = 0 THEN 'und'
                    WHEN en_score >= de_score AND en_score >= fr_score
                         AND en_score >= es_score THEN 'en'
                    WHEN de_score >= fr_score AND de_score >= es_score THEN 'de'
                    WHEN fr_score >= es_score THEN 'fr'
                    ELSE 'es' END AS predicted_lang
        FROM scored),
    counts AS (
        SELECT true_lang, predicted_lang, COUNT(*) AS n_docs
        FROM pred GROUP BY 1, 2)
    SELECT true_lang, predicted_lang, n_docs,
           CAST(n_docs AS DOUBLE) /
           CAST(SUM(n_docs) OVER (PARTITION BY true_lang) AS DOUBLE)
               AS share_of_true
    FROM counts ORDER BY true_lang, predicted_lang
"""

ORACLES["sentence_stats"] = f"""
    WITH s AS (
        SELECT doc_id,
               list_filter(string_split({_NORM}, '. '), s -> length(s) > 0)
                   AS sents
        FROM documents),
    wc AS (
        SELECT doc_id, sents,
               [len(string_split(x, ' ')) FOR x IN sents] AS wcs
        FROM s)
    SELECT doc_id,
           CAST(len(sents) AS INT) AS n_sentences,
           CAST(list_sum(wcs) AS BIGINT) AS n_words,
           CAST(list_sum(wcs) AS DOUBLE) / CAST(len(sents) AS DOUBLE)
               AS mean_sentence_words,
           CAST(list_max(wcs) AS INT) AS max_sentence_words
    FROM wc ORDER BY doc_id
"""

ORACLES["char_profile"] = """
    SELECT doc_id,
           CAST(length(text) AS INT) AS n_chars_raw,
           CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                AS DOUBLE) / CAST(length(text) AS DOUBLE) AS digit_ratio,
           CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
                AS DOUBLE) / CAST(length(text) AS DOUBLE) AS upper_ratio,
           CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g'))
                AS DOUBLE) / CAST(length(text) AS DOUBLE) AS space_ratio,
           CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                AS DOUBLE) / CAST(length(text) AS DOUBLE) AS punct_ratio
    FROM documents ORDER BY doc_id
"""

ORACLES["embed_top_dims"] = """
    WITH pairs AS (
        SELECT vec_id,
               list_sort(
                 [{m: abs(CAST(embedding[CAST(gs AS INT)] AS DOUBLE)),
                   nd: -(CAST(gs AS INT) - 1)}
                  FOR gs IN range(1, 65)], 'DESC') AS top
        FROM embeddings)
    SELECT vec_id,
           CAST(r AS INT) AS rank,
           CAST(-top[CAST(r AS INT)].nd AS INT) AS dim,
           top[CAST(r AS INT)].m AS magnitude
    FROM pairs CROSS JOIN range(1, 4) t(r)
    ORDER BY vec_id, rank
"""

ORACLES["multimodal_frames"] = """
    WITH meta AS (
        SELECT doc_id, strlen(text) AS byte_len,
               strlen(text) % 7 + 1 AS n_frames
        FROM documents)
    SELECT doc_id,
           CAST(f AS BIGINT) AS frame_idx,
           CAST(f * (byte_len // n_frames) AS BIGINT) AS frame_offset,
           md5(doc_id || ':' || f) AS frame_key
    FROM meta CROSS JOIN range(0, 7) t(f)
    WHERE f < n_frames
    ORDER BY doc_id, frame_idx
"""

ORACLES["fuzzy_name_pairs"] = """
    WITH names AS (SELECT DISTINCT p_name AS name FROM part),
    blocked AS (
        SELECT name, string_split(name, ' ')[-1] AS block FROM names)
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS INT) AS edit_dist
    FROM blocked a JOIN blocked b
      ON a.block = b.block AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= 2
    ORDER BY name_a, name_b
"""


_CODED = """
        coded AS (
            SELECT vec_id, embedding, nrm,
                   CAST((SELECT SUM(CASE WHEN
                       list_sum(
                           [CAST(floor(CASE WHEN substr(md5(p::VARCHAR || '|' || j::VARCHAR), 1, 1) >= '8'
                                      THEN 1.0 ELSE -1.0 END
                                 * CAST(embedding[j] AS DOUBLE) * 1e12) AS BIGINT)
                            FOR j IN range(1, len(embedding) + 1)]) >= 0
                       THEN (1 << p) ELSE 0 END) FROM range(8) t(p)) AS INT) AS code
            FROM v)
"""

ORACLES["ann_recall_eval"] = f"""
    WITH {_VNORM},
    {_CODED},
    q AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn, code AS qcode
          FROM coded WHERE vec_id < 10),
    exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                       {_PAIR_COS.format(a='q.qv', b='c.embedding', na='q.qn', nb='c.nrm')} DESC,
                       c.vec_id ASC) AS r
            FROM q JOIN v c ON c.vec_id != q.query_id)
        WHERE r <= 5),
    ann AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                       {_PAIR_COS.format(a='q.qv', b='c.embedding', na='q.qn', nb='c.nrm')} DESC,
                       c.vec_id ASC) AS r
            FROM q JOIN coded c
              ON c.code = q.qcode AND c.vec_id != q.query_id)
        WHERE r <= 5),
    hits AS (
        SELECT e.query_id, COUNT(*) AS n_hits
        FROM exact e JOIN ann a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY 1),
    nann AS (SELECT query_id, COUNT(*) AS n_ann FROM ann GROUP BY 1)
    SELECT q.query_id, 5 AS k,
           CAST(COALESCE(nann.n_ann, 0) AS BIGINT) AS n_ann,
           CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(hits.n_hits, 0) AS DOUBLE) / CAST(5 AS DOUBLE)
               AS recall_at_k
    FROM q LEFT JOIN nann USING (query_id) LEFT JOIN hits USING (query_id)
    ORDER BY q.query_id
"""


ORACLES["embed_standardize"] = """
    WITH sliced AS (
        SELECT vec_id, j - 1 AS dim,
               CAST(embedding[j] AS DOUBLE) AS x,
               CAST(FLOOR(CAST(embedding[j] AS DOUBLE) * 1e6) AS BIGINT) AS q
        FROM embeddings, range(1, 9) t(j)),
    moments AS (
        SELECT dim, COUNT(*) AS n,
               CAST(SUM(q) AS BIGINT) AS sq,
               CAST(SUM(q * q) AS BIGINT) AS sq2
        FROM sliced GROUP BY 1)
    SELECT vec_id, dim, x,
           CAST(n * q - sq AS DOUBLE)
               / sqrt(CAST(n * sq2 - sq * sq AS DOUBLE)) AS z
    FROM sliced JOIN moments USING (dim)
    ORDER BY vec_id, dim
"""

ORACLES.update({
    "unigram_logprob": f"""
        WITH toks AS (
            SELECT doc_id, UNNEST({_TOKS}) AS tok FROM documents
        ),
        nz AS (SELECT * FROM toks WHERE tok <> ''),
        lm AS (SELECT tok, COUNT(*) AS cnt FROM nz GROUP BY 1),
        tot AS (SELECT SUM(cnt) AS total FROM lm),
        qlm AS (
            SELECT tok,
                   CAST(FLOOR(LN(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
                              * 1000000.0) AS BIGINT) AS qlp_micro
            FROM lm, tot
        )
        SELECT doc_id,
               COUNT(*) AS n_tokens,
               CAST(SUM(qlp_micro) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                 / 1000000.0 AS mean_logprob
        FROM nz JOIN qlm USING (tok)
        GROUP BY doc_id
    """,
    "zipf_fit": f"""
        WITH toks AS (
            SELECT UNNEST({_TOKS}) AS tok FROM documents
        ),
        nz AS (SELECT tok FROM toks WHERE tok <> ''),
        vocab AS (SELECT tok, COUNT(*) AS cnt FROM nz GROUP BY 1),
        ranked AS (
            SELECT
              CAST(FLOOR(LN(CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok)
                                 AS DOUBLE)) * 1000000.0) AS BIGINT) AS lx,
              CAST(FLOOR(LN(CAST(cnt AS DOUBLE)) * 1000000.0) AS BIGINT) AS ly
            FROM vocab
        ),
        mom AS (
            SELECT COUNT(*) AS n, SUM(lx) AS isx, SUM(ly) AS isy,
                   SUM(CAST(lx AS HUGEINT) * ly) AS isxy,
                   SUM(CAST(lx AS HUGEINT) * lx) AS isxx
            FROM ranked
        )
        SELECT n AS vocab_size,
               (CAST(n AS DOUBLE) * (CAST(isxy AS DOUBLE) / 1000000000000.0)
                  - (CAST(isx AS DOUBLE) / 1000000.0)
                    * (CAST(isy AS DOUBLE) / 1000000.0))
               / (CAST(n AS DOUBLE) * (CAST(isxx AS DOUBLE) / 1000000000000.0)
                  - (CAST(isx AS DOUBLE) / 1000000.0)
                    * (CAST(isx AS DOUBLE) / 1000000.0)) AS zipf_slope,
               ((CAST(isy AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE))
               - ((CAST(n AS DOUBLE) * (CAST(isxy AS DOUBLE) / 1000000000000.0)
                   - (CAST(isx AS DOUBLE) / 1000000.0)
                     * (CAST(isy AS DOUBLE) / 1000000.0))
                  / (CAST(n AS DOUBLE) * (CAST(isxx AS DOUBLE) / 1000000000000.0)
                     - (CAST(isx AS DOUBLE) / 1000000.0)
                       * (CAST(isx AS DOUBLE) / 1000000.0)))
                 * ((CAST(isx AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE))
                 AS zipf_intercept
        FROM mom
    """,
    "chunk_dedup": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        idx AS (
            SELECT doc_id, t,
                   UNNEST(range(0, ((len(t) - 1) // 16) + 1)) AS i
            FROM toks
        ),
        chunks AS (
            SELECT doc_id,
                   array_to_string(t[(i * 16 + 1):(i * 16 + 16)], ' ')
                     AS chunk_text
            FROM idx
        )
        SELECT md5(chunk_text) AS chunk_hash,
               COUNT(*) AS n_occurrences,
               COUNT(DISTINCT doc_id) AS n_docs,
               MIN(doc_id) AS first_doc
        FROM chunks
        WHERE chunk_text <> ''
        GROUP BY 1
        HAVING COUNT(*) > 1
    """,
})

ORACLES.update({
    "multimodal_tiles": """
        WITH meta AS (
            SELECT doc_id,
                   (strlen(text) % 64) * 16 + 16 AS width,
                   ((strlen(text) // 64) % 64) * 16 + 16 AS height
            FROM documents
        ),
        g AS (
            SELECT doc_id, width, height,
                   UNNEST(range(0, CAST(ceil(height / 256.0) AS BIGINT))) AS ty
            FROM meta
        ),
        gg AS (
            SELECT doc_id, width, height, ty,
                   UNNEST(range(0, CAST(ceil(width / 256.0) AS BIGINT))) AS tx
            FROM g
        )
        SELECT doc_id,
               CAST(tx AS INT) AS tile_x,
               CAST(ty AS INT) AS tile_y,
               CAST(tx * 256 AS INT) AS x0,
               CAST(ty * 256 AS INT) AS y0,
               CAST(LEAST(256, width - tx * 256) AS INT) AS tile_w,
               CAST(LEAST(256, height - ty * 256) AS INT) AS tile_h
        FROM gg
    """,
})

# F18: estimated (matching signature components / 64) vs exact Jaccard
# on the SAME LSH candidate set as dedup_minhash_lsh.
_match_sum = " + ".join(
    f"CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END" for i in range(64)
)
ORACLES["minhash_accuracy"] = f"""
    WITH {{grams_ctes}},
    eg AS (SELECT doc_id, UNNEST(g) AS gram FROM grams),
    based AS (SELECT doc_id,
                     CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT)
                         & {{base_mask}} AS base
              FROM eg),
    sigs AS (SELECT doc_id, {{sig_cols}} FROM based GROUP BY doc_id),
    banded AS (SELECT doc_id, [{{band_list}}] AS bands FROM sigs),
    expl AS (SELECT doc_id, i AS band_id, bands[i+1] AS band_hash
             FROM banded, range(16) t(i)),
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM expl a JOIN expl b
          ON a.band_id = b.band_id AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id),
    matched AS (
        SELECT c.doc_a, c.doc_b, ({_match_sum}) AS n_match
        FROM cands c
        JOIN sigs sa ON c.doc_a = sa.doc_id
        JOIN sigs sb ON c.doc_b = sb.doc_id),
    verify AS (
        SELECT m.doc_a, m.doc_b, m.n_match,
               len(list_intersect(ga.g, gb.g)) AS inter,
               len(ga.g) AS la, len(gb.g) AS lb
        FROM matched m
        JOIN grams ga ON m.doc_a = ga.doc_id
        JOIN grams gb ON m.doc_b = gb.doc_id)
    SELECT doc_a, doc_b,
           CAST(n_match AS DOUBLE) / 64.0 AS est_jaccard,
           inter / (la + lb - inter) AS jaccard,
           ABS(CAST(n_match AS DOUBLE) / 64.0
               - inter / (la + lb - inter)) AS abs_err
    FROM verify
"""
ORACLES["minhash_accuracy"] = ORACLES["minhash_accuracy"].format(
    grams_ctes=_GRAMS_CTES,
    base_mask=_hashing.BASE_MASK,
    sig_cols=_sig_cols,
    band_list=_band_list,
)

ORACLES["kmeans_refine"] = """
    WITH seeds AS (
        SELECT CAST(vec_id AS INT) AS cluster, embedding AS centroid
        FROM embeddings WHERE vec_id < 8
    ),
    d AS (
        SELECT v.vec_id, v.embedding, s.cluster,
               list_sum([CAST(floor(
                   (CAST(v.embedding[j] AS DOUBLE) - CAST(s.centroid[j] AS DOUBLE))
                   * (CAST(v.embedding[j] AS DOUBLE) - CAST(s.centroid[j] AS DOUBLE))
                   * 1e12) AS BIGINT)
                 FOR j IN range(1, len(v.embedding) + 1)]) AS qd
        FROM embeddings v CROSS JOIN seeds s
    ),
    a AS (
        SELECT vec_id, embedding, cluster FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY qd, cluster) AS rn
            FROM d) WHERE rn = 1
    ),
    dims AS (
        SELECT cluster, j - 1 AS dim, CAST(embedding[j] AS DOUBLE) AS x
        FROM a, UNNEST(range(1, 65)) t(j)
    )
    SELECT cluster, CAST(dim AS INT) AS dim,
           CAST(SUM(CAST(x AS DECIMAL(18,8))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS centroid_value,
           COUNT(*) AS n_members
    FROM dims GROUP BY 1, 2
"""

ORACLES["near_dup_diff"] = f"""
    WITH {{grams_ctes}},
    eg AS (SELECT doc_id, UNNEST(g) AS gram FROM grams),
    based AS (SELECT doc_id,
                     CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT)
                         & {{base_mask}} AS base
              FROM eg),
    sigs AS (SELECT doc_id, {{sig_cols}} FROM based GROUP BY doc_id),
    banded AS (SELECT doc_id, [{{band_list}}] AS bands FROM sigs),
    expl AS (SELECT doc_id, i AS band_id, bands[i+1] AS band_hash
             FROM banded, range(16) t(i)),
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM expl a JOIN expl b
          ON a.band_id = b.band_id AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id),
    verify AS (
        SELECT c.doc_a, c.doc_b,
               len(list_intersect(ga.g, gb.g)) AS inter,
               len(list_filter(ga.g, x -> NOT list_contains(gb.g, x)))
                   AS n_only_a,
               len(list_filter(gb.g, x -> NOT list_contains(ga.g, x)))
                   AS n_only_b,
               len(ga.g) AS la, len(gb.g) AS lb
        FROM cands c
        JOIN grams ga ON c.doc_a = ga.doc_id
        JOIN grams gb ON c.doc_b = gb.doc_id)
    SELECT doc_a, doc_b,
           CAST(inter AS BIGINT) AS n_shared,
           CAST(n_only_a AS BIGINT) AS n_only_a,
           CAST(n_only_b AS BIGINT) AS n_only_b,
           inter / (la + lb - inter) AS jaccard
    FROM verify WHERE inter / (la + lb - inter) >= 0.8
"""
ORACLES["near_dup_diff"] = ORACLES["near_dup_diff"].format(
    grams_ctes=_GRAMS_CTES,
    base_mask=_hashing.BASE_MASK,
    sig_cols=_sig_cols,
    band_list=_band_list,
)

ORACLES["dedup_threshold_curve"] = f"""
    WITH {_VNORM},
    coded AS (
        SELECT vec_id, embedding, nrm,
               CAST((SELECT SUM(CASE WHEN
                   list_sum(
                       [CAST(floor(CASE WHEN substr(md5(p::VARCHAR || '|' || j::VARCHAR), 1, 1) >= '8'
                                  THEN 1.0 ELSE -1.0 END
                             * CAST(embedding[j] AS DOUBLE) * 1e12) AS BIGINT)
                        FOR j IN range(1, len(embedding) + 1)]) >= 0
                   THEN (1 << p) ELSE 0 END) FROM range(8) t(p)) AS INT) AS code
        FROM v),
    pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               {_PAIR_COS.format(a='a.embedding', b='b.embedding', na='a.nrm', nb='b.nrm')} AS cosine
        FROM coded a JOIN coded b ON a.code = b.code AND a.vec_id < b.vec_id),
    th AS (SELECT CAST(UNNEST([0.25, 0.3, 0.35, 0.4, 0.5]) AS DOUBLE) AS threshold),
    hits AS (
        SELECT threshold, va, vb FROM pairs, th WHERE cosine >= threshold),
    expl AS (
        SELECT threshold, UNNEST([va, vb]) AS doc FROM hits)
    SELECT threshold,
           CAST(COUNT(*) / 2 AS BIGINT) AS n_pairs,
           COUNT(DISTINCT doc) AS n_docs_touched
    FROM expl GROUP BY 1
"""

ORACLES["mi_lang_source"] = """
    WITH cells AS (
        SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2
    ),
    m AS (
        SELECT lang, source, n,
               SUM(n) OVER (PARTITION BY lang) AS na,
               SUM(n) OVER (PARTITION BY source) AS nb,
               SUM(n) OVER () AS total
        FROM cells
    ),
    q AS (
        SELECT lang, source, n, total,
               CAST(FLOOR(ln(CAST(n * total AS DOUBLE)
                             / CAST(na * nb AS DOUBLE)) * 1e6) AS BIGINT)
                   AS qpmi_micro
        FROM m
    )
    SELECT lang, source, CAST(n AS BIGINT) AS n,
           CAST(qpmi_micro AS DOUBLE) / 1e6 AS pmi,
           CAST(n * qpmi_micro AS DOUBLE) / CAST(total AS DOUBLE) / 1e6
               AS mi_contrib
    FROM q
    ORDER BY lang, source
"""

ORACLES["chi2_terms"] = f"""
    WITH toks AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
    pairs AS (
        SELECT DISTINCT doc_id, lang, term
        FROM (SELECT doc_id, lang, UNNEST(t) AS term FROM toks)
        WHERE term <> ''
    ),
    dfreq AS (SELECT term, COUNT(*) AS df_t FROM pairs GROUP BY 1),
    top AS (
        SELECT term, df_t FROM (
            SELECT term, df_t,
                   ROW_NUMBER() OVER (ORDER BY df_t DESC, term) AS rank
            FROM dfreq)
        WHERE rank <= 30
    ),
    labels AS (SELECT lang, COUNT(*) AS n_label FROM documents GROUP BY 1),
    total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    n11t AS (
        SELECT term, lang, COUNT(*) AS n11
        FROM pairs JOIN top USING (term)
        GROUP BY 1, 2
    ),
    grid AS (
        SELECT t.term, l.lang, t.df_t, l.n_label, tt.n_docs,
               CAST(COALESCE(n.n11, 0) AS BIGINT) AS n11
        FROM top t CROSS JOIN labels l CROSS JOIN total tt
        LEFT JOIN n11t n ON n.term = t.term AND n.lang = l.lang
    )
    SELECT term, lang, n11,
           CASE WHEN (n11 + (df_t - n11)) > 0
                 AND ((n_label - n11) + (n_docs - df_t - n_label + n11)) > 0
                 AND (n11 + (n_label - n11)) > 0
                 AND ((df_t - n11) + (n_docs - df_t - n_label + n11)) > 0
                THEN CAST(n_docs AS DOUBLE)
                     * CAST(n11 * (n_docs - df_t - n_label + n11)
                            - (df_t - n11) * (n_label - n11) AS DOUBLE)
                     * CAST(n11 * (n_docs - df_t - n_label + n11)
                            - (df_t - n11) * (n_label - n11) AS DOUBLE)
                     / CAST(n11 + (df_t - n11) AS DOUBLE)
                     / CAST((n_label - n11)
                            + (n_docs - df_t - n_label + n11) AS DOUBLE)
                     / CAST(n11 + (n_label - n11) AS DOUBLE)
                     / CAST((df_t - n11)
                            + (n_docs - df_t - n_label + n11) AS DOUBLE)
                ELSE 0.0 END AS chi2
    FROM grid
    ORDER BY term, lang
"""

ORACLES["media_prefix_dedup"] = """
    WITH h AS (
        SELECT doc_id, md5(substr(text, 1, 128)) AS prefix_hash,
               octet_length(encode(text)) AS nb
        FROM documents
    )
    SELECT prefix_hash,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           MIN(doc_id) AS keeper,
           CAST(SUM(nb) AS BIGINT) AS total_bytes
    FROM h
    GROUP BY 1
    HAVING COUNT(*) > 1
    ORDER BY prefix_hash
"""

ORACLES["bm25_topk"] = f"""
    WITH toks AS (
        SELECT doc_id, UNNEST({_TOKS}) AS tok FROM documents
    ),
    toks_nz AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks_nz GROUP BY 1),
    nstats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS n_tokens
        FROM dl
    ),
    tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM toks_nz WHERE tok IN ('join', 'hash', 'scan')
        GROUP BY 1, 2
    ),
    dfreq AS (SELECT tok, COUNT(*) AS df_t FROM tf GROUP BY 1),
    idf AS (
        SELECT tok,
               CAST(FLOOR(ln(1.0 + (CAST(n_docs AS DOUBLE)
                                    - CAST(df_t AS DOUBLE) + 0.5)
                                   / (CAST(df_t AS DOUBLE) + 0.5)) * 1e6)
                    AS BIGINT) AS qidf_micro,
               CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
        FROM dfreq, nstats
    ),
    contrib AS (
        SELECT tf.doc_id,
               CAST(FLOOR((CAST(qidf_micro AS DOUBLE) / 1e6)
                   * (CAST(tf AS DOUBLE) * 2.2
                      / (CAST(tf AS DOUBLE)
                         + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)))
                   * 1e9) AS BIGINT) AS qscore_nano
        FROM tf JOIN idf USING (tok) JOIN dl ON dl.doc_id = tf.doc_id
    ),
    scored AS (
        SELECT doc_id, SUM(qscore_nano) AS score_nano,
               CAST(COUNT(*) AS INT) AS n_terms_matched
        FROM contrib GROUP BY 1
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_nano DESC, doc_id)
                AS INT) AS rank,
           doc_id,
           CAST(score_nano AS DOUBLE) / 1e9 AS score,
           n_terms_matched
    FROM scored
    ORDER BY score_nano DESC, doc_id
    LIMIT 15
"""

ORACLES["entropy_by_source"] = f"""
    WITH toks AS (
        SELECT source, UNNEST({_TOKS}) AS tok FROM documents
    ),
    counts AS (
        SELECT source, tok, COUNT(*) AS n
        FROM toks WHERE tok <> '' GROUP BY 1, 2
    ),
    m AS (
        SELECT source, tok, n,
               SUM(n) OVER (PARTITION BY source) AS total
        FROM counts
    ),
    q AS (
        SELECT source, n, total,
               CAST(FLOOR(ln(CAST(n AS DOUBLE) / CAST(total AS DOUBLE))
                          * 1e6) AS BIGINT) AS qlp_micro
        FROM m
    ),
    agg AS (
        SELECT source,
               CAST(MAX(total) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS vocab,
               SUM(n * qlp_micro) AS sum_nqlp
        FROM q GROUP BY 1
    )
    SELECT source, n_tokens, vocab,
           -CAST(sum_nqlp AS DOUBLE) / CAST(n_tokens AS DOUBLE) / 1e6
               AS entropy,
           CASE WHEN vocab > 1
                THEN -CAST(sum_nqlp AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                     / 1e6 * 1e6
                     / CAST(CAST(FLOOR(ln(CAST(vocab AS DOUBLE)) * 1e6)
                                 AS BIGINT) AS DOUBLE)
                ELSE 0.0 END AS norm_entropy
    FROM agg
    ORDER BY source
"""

ORACLES["minhash_eval_f1"] = f"""
    WITH acc AS ({ORACLES["minhash_accuracy"]}),
    c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
               CAST(COALESCE(SUM(CASE WHEN est_jaccard >= 0.8
                                       AND jaccard >= 0.8
                             THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp,
               CAST(COALESCE(SUM(CASE WHEN est_jaccard >= 0.8
                                       AND jaccard < 0.8
                             THEN 1 ELSE 0 END), 0) AS BIGINT) AS fp,
               CAST(COALESCE(SUM(CASE WHEN est_jaccard < 0.8
                                       AND jaccard >= 0.8
                             THEN 1 ELSE 0 END), 0) AS BIGINT) AS fn
        FROM acc
    )
    SELECT n_candidates, tp, fp, fn,
           CASE WHEN tp + fp > 0
                THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
                ELSE 0.0 END AS precision,
           CASE WHEN tp + fn > 0
                THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
                ELSE 0.0 END AS recall,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)
                ELSE 0.0 END AS f1
    FROM c
"""

ORACLES["embed_pq_codes"] = """
    WITH seeds AS (
        SELECT CAST(vec_id AS INT) AS code, embedding AS cvec
        FROM embeddings WHERE vec_id < 4
    ),
    pairs AS (
        SELECT v.vec_id, s.code, t.s AS subspace,
               list_sum([CAST(FLOOR(
                   (CAST(v.embedding[t.s * 8 + j] AS DOUBLE)
                    - CAST(s.cvec[t.s * 8 + j] AS DOUBLE))
                   * (CAST(v.embedding[t.s * 8 + j] AS DOUBLE)
                      - CAST(s.cvec[t.s * 8 + j] AS DOUBLE))
                   * 1e12) AS BIGINT) FOR j IN range(1, 9)]) AS qd
        FROM embeddings v
        CROSS JOIN seeds s
        CROSS JOIN (SELECT UNNEST(range(0, 8)) AS s) t
    )
    SELECT vec_id, CAST(subspace AS INT) AS subspace, code,
           CAST(qd AS DOUBLE) / 1e12 AS qdist
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY vec_id, subspace ORDER BY qd, code) AS rn
        FROM pairs)
    WHERE rn = 1
    ORDER BY vec_id, subspace
"""

ORACLES["blocklist_filter"] = f"""
    WITH t AS (
        SELECT doc_id,
               {_TOKS} AS toks,
               list_distinct({_TOKS}) AS dtoks
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len(list_filter(toks, x -> x IN
                   ('merge', 'deadlock', 'rollback', 'panic', 'corrupt')))
                   AS n_hits,
               list_sort(list_filter(dtoks, x -> x IN
                   ('merge', 'deadlock', 'rollback', 'panic', 'corrupt')))
                   AS matched_list
        FROM t
    )
    SELECT doc_id,
           CAST(n_hits AS INT) AS n_hits,
           CAST(len(matched_list) AS INT) AS n_distinct_terms,
           COALESCE(array_to_string(matched_list, ','), '') AS matched,
           CASE WHEN len(matched_list) >= 2 THEN 'flag'
                ELSE 'keep' END AS verdict
    FROM m
    ORDER BY doc_id
"""

ORACLES["media_chunk_windows"] = """
    WITH d AS (
        SELECT doc_id, octet_length(encode(text)) AS nb FROM documents
    ),
    w AS (
        SELECT doc_id, nb, t.s AS w_start,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY t.s) - 1
                   AS window_id
        FROM d, UNNEST(range(0,
            CAST(FLOOR(GREATEST(0, nb - 1) / 128) AS INT) * 128 + 1,
            128)) t(s)
    )
    SELECT doc_id,
           CAST(window_id AS INT) AS window_id,
           CAST(w_start AS BIGINT) AS w_start,
           CAST(LEAST(w_start + 256, nb) AS BIGINT) AS w_end,
           CAST(LEAST(w_start + 256, nb) - w_start AS BIGINT) AS w_len
    FROM w
    ORDER BY doc_id, window_id
"""

ORACLES["embed_bucket_stats"] = f"""
    WITH {_VNORM},
    coded AS (
        SELECT vec_id,
               CAST((SELECT SUM(CASE WHEN
                   list_sum(
                       [CAST(floor(CASE WHEN substr(md5(p::VARCHAR || '|' || j::VARCHAR), 1, 1) >= '8'
                                  THEN 1.0 ELSE -1.0 END
                             * CAST(embedding[j] AS DOUBLE) * 1e12) AS BIGINT)
                        FOR j IN range(1, len(embedding) + 1)]) >= 0
                   THEN (1 << p) ELSE 0 END) FROM range(8) t(p)) AS INT) AS code
        FROM v)
    SELECT code,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS n_pairs
    FROM coded
    GROUP BY code
    ORDER BY code
"""

ORACLES["label_agreement"] = f"""
    WITH best AS ({ORACLES["embed_ann_lsh"]}),
    lab AS (SELECT vec_id, label FROM embeddings),
    j AS (
        SELECT a.label AS label, b.label AS n_label
        FROM best
        JOIN lab a ON a.vec_id = best.vec_id
        JOIN lab b ON b.vec_id = best.neighbor_id
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN label = n_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_agree,
           CAST(SUM(CASE WHEN label = n_label THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS agreement
    FROM j
    GROUP BY label
    ORDER BY label
"""

ORACLES["vocab_coverage"] = f"""
    WITH toks AS (
        SELECT UNNEST({_TOKS}) AS tok FROM documents
    ),
    counts AS (
        SELECT tok, COUNT(*) AS n FROM toks WHERE tok <> '' GROUP BY 1
    ),
    ranked AS (
        SELECT ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rank,
               SUM(n) OVER (ORDER BY n DESC, tok
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               SUM(n) OVER () AS total,
               COUNT(*) OVER () AS vocab
        FROM counts
    ),
    ks AS (SELECT UNNEST([100, 500, 1000, 5000]) AS top_k)
    SELECT ks.top_k,
           CAST(r.rank AS BIGINT) AS k_effective,
           CAST(r.vocab AS BIGINT) AS vocab,
           CAST(r.total AS BIGINT) AS n_tokens,
           CAST(r.cum AS DOUBLE) / CAST(r.total AS DOUBLE) AS coverage
    FROM ks JOIN ranked r ON r.rank = LEAST(ks.top_k, r.vocab)
    ORDER BY ks.top_k
"""

ORACLES["pq_code_balance"] = f"""
    WITH assign AS ({ORACLES["embed_pq_codes"]})
    SELECT subspace, code,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(CAST(FLOOR(qdist * 1e12) AS BIGINT)) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 1e12 AS mean_distortion
    FROM assign
    GROUP BY subspace, code
    ORDER BY subspace, code
"""

ORACLES["dedup_incremental"] = f"""
    WITH tagged AS (
        SELECT doc_id, source,
               md5({_NORM}) AS digest,
               ({_hashing.duck_hex2int("CAST(doc_id AS VARCHAR)")} % 100) < 80
                   AS is_base
        FROM documents
    ),
    base_digests AS (
        SELECT DISTINCT digest FROM tagged WHERE is_base
    ),
    delta AS (
        SELECT t.doc_id, t.source, t.digest,
               b.digest IS NOT NULL AS in_base,
               ROW_NUMBER() OVER (PARTITION BY t.digest
                                  ORDER BY t.doc_id) AS rn
        FROM tagged t
        LEFT JOIN base_digests b ON b.digest = t.digest
        WHERE NOT t.is_base
    )
    SELECT source,
           CASE WHEN in_base THEN 'dup_of_base'
                WHEN rn > 1 THEN 'dup_in_delta'
                ELSE 'novel' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM delta
    GROUP BY 1, 2
    ORDER BY source, status
"""

ORACLES["js_divergence_langs"] = f"""
    WITH counts AS (
        SELECT lang AS g, tok, COUNT(*) AS n FROM (
            SELECT lang, UNNEST({_TOKS}) AS tok FROM documents)
        WHERE tok <> '' GROUP BY 1, 2
    ),
    totals AS (SELECT g, SUM(n) AS tot FROM counts GROUP BY 1),
    pairs AS (
        SELECT a.g AS ga, a.tot AS ta, b.g AS gb, b.tot AS tb
        FROM totals a CROSS JOIN totals b
        WHERE a.g < b.g
    ),
    cell AS (
        SELECT p.ga, p.gb, p.ta, p.tb, c.tok,
               SUM(CASE WHEN c.g = p.ga THEN c.n ELSE 0 END) AS na,
               SUM(CASE WHEN c.g = p.gb THEN c.n ELSE 0 END) AS nb
        FROM pairs p
        JOIN counts c ON c.g = p.ga OR c.g = p.gb
        GROUP BY 1, 2, 3, 4, 5
    ),
    q AS (
        SELECT ga, gb, ta, tb, na, nb,
               CASE WHEN na > 0 THEN CAST(FLOOR(ln(
                   (CAST(na AS DOUBLE) / CAST(ta AS DOUBLE))
                   / ((CAST(na AS DOUBLE) / CAST(ta AS DOUBLE)
                       + CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE)) / 2.0))
                   * 1e6) AS BIGINT) ELSE 0 END AS qa,
               CASE WHEN nb > 0 THEN CAST(FLOOR(ln(
                   (CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE))
                   / ((CAST(na AS DOUBLE) / CAST(ta AS DOUBLE)
                       + CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE)) / 2.0))
                   * 1e6) AS BIGINT) ELSE 0 END AS qb
        FROM cell
    )
    SELECT ga, gb,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           (CAST(SUM(na * qa) AS DOUBLE) / CAST(MAX(ta) AS DOUBLE)
            + CAST(SUM(nb * qb) AS DOUBLE) / CAST(MAX(tb) AS DOUBLE))
           / 2e6 AS js_divergence
    FROM q
    GROUP BY ga, gb
    ORDER BY ga, gb
"""

ORACLES["bigram_logprob"] = f"""
    WITH toks AS (
        SELECT doc_id, UNNEST({_TOKS}) AS tok FROM documents),
    nz AS (SELECT * FROM toks WHERE tok <> ''),
    uni AS (SELECT tok, COUNT(*) AS c1 FROM nz GROUP BY 1),
    vocab AS (SELECT COUNT(*) AS v FROM uni),
    tl AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    bgs0 AS (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(t)),
                      i -> t[i] || ' ' || t[i + 1])) AS bg
        FROM tl WHERE len(t) >= 2),
    bgs AS (
        SELECT * FROM bgs0
        WHERE NOT regexp_matches(bg, '^ | $|^$')),
    bi AS (SELECT bg, COUNT(*) AS c2 FROM bgs GROUP BY 1),
    lm AS (
        SELECT bg,
               CAST(FLOOR(LN(CAST(c2 + 1 AS DOUBLE)
                             / CAST(c1 + v AS DOUBLE)) * 1000000.0)
                    AS BIGINT) AS qlp_micro
        FROM bi JOIN uni ON string_split(bi.bg, ' ')[1] = uni.tok
        CROSS JOIN vocab)
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(qlp_micro) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             / 1000000.0 AS mean_logprob
    FROM bgs JOIN lm USING (bg)
    GROUP BY doc_id ORDER BY doc_id
"""

ORACLES["heaps_fit"] = f"""
    WITH toks AS (
        SELECT source, doc_id, UNNEST({_TOKS}) AS tok FROM documents),
    nz AS (SELECT * FROM toks WHERE tok <> ''),
    per_doc AS (
        SELECT source, doc_id, COUNT(*) AS n, COUNT(DISTINCT tok) AS v
        FROM nz GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    q AS (
        SELECT source,
               CAST(FLOOR(LN(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS lx,
               CAST(FLOOR(LN(CAST(v AS DOUBLE)) * 1000000.0) AS BIGINT) AS ly
        FROM per_doc),
    m AS (
        SELECT source, COUNT(*) AS n,
               SUM(CAST(lx AS HUGEINT)) AS sx,
               SUM(CAST(ly AS HUGEINT)) AS sy,
               SUM(CAST(lx AS HUGEINT) * lx) AS sxx,
               SUM(CAST(lx AS HUGEINT) * ly) AS sxy
        FROM q GROUP BY 1),
    fit AS (
        SELECT source, n,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta_raw
        FROM m)
    SELECT f.source,
           CAST(f.n AS BIGINT) AS n_docs,
           CAST(FLOOR(f.beta_raw * 1e9) AS BIGINT) / 1e9 AS heaps_beta,
           CAST(FLOOR((CAST(m.sy AS DOUBLE) - f.beta_raw * CAST(m.sx AS DOUBLE))
                      / CAST(f.n AS DOUBLE) / 1000000.0 * 1e9) AS BIGINT)
             / 1e9 AS heaps_ln_k
    FROM fit f JOIN m USING (source)
    ORDER BY f.source
"""

ORACLES["code_detect"] = f"""
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars,
           CAST(LENGTH(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE) AS symbol_ratio,
           CAST(LENGTH(text) - LENGTH(regexp_replace(text, ';', '', 'g'))
                AS DOUBLE) * 100.0 / CAST(LENGTH(text) AS DOUBLE)
               AS semis_per_100,
           CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[{{}}()\\[\\]]',
                '', 'g')) AS DOUBLE) * 100.0 / CAST(LENGTH(text) AS DOUBLE)
               AS braces_per_100,
           CAST(len(list_filter({_TOKS}, t -> t IN ('def', 'class', 'return',
                'import', 'function', 'var', 'const', 'void', 'int', 'public',
                'static', 'endif', 'lambda'))) AS INT) AS kw_hits,
           ((CAST(LENGTH(text) - LENGTH(regexp_replace(text, ';', '', 'g'))
                  AS DOUBLE) * 100.0 / CAST(LENGTH(text) AS DOUBLE)
             + CAST(LENGTH(text) - LENGTH(regexp_replace(text,
                    '[{{}}()\\[\\]]', '', 'g')) AS DOUBLE) * 100.0
               / CAST(LENGTH(text) AS DOUBLE) >= 3.0
             OR len(list_filter({_TOKS}, t -> t IN ('def', 'class', 'return',
                    'import', 'function', 'var', 'const', 'void', 'int',
                    'public', 'static', 'endif', 'lambda'))) >= 3)
            AND CAST(LENGTH(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                     AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE) >= 0.05)
               AS is_code
    FROM documents WHERE LENGTH(text) > 0
    ORDER BY doc_id
"""

ORACLES["stopword_profile"] = f"""
    WITH toks AS (
        SELECT source, UNNEST({_TOKS}) AS tok FROM documents),
    nz AS (SELECT * FROM toks WHERE tok <> ''),
    counts AS (
        SELECT source, tok, COUNT(*) AS n,
               tok IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in',
                       'is', 'it') AS is_sw
        FROM nz GROUP BY 1, 2),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY CASE WHEN is_sw THEN n END DESC NULLS LAST, tok ASC)
            AS sw_rank
        FROM counts)
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN is_sw THEN n ELSE 0 END) AS BIGINT)
               AS n_stopword_tokens,
           CAST(SUM(CASE WHEN is_sw THEN 1 ELSE 0 END) AS BIGINT)
               AS n_distinct_stopwords,
           MAX(CASE WHEN sw_rank = 1 AND is_sw THEN tok END) AS top_stopword,
           CAST(SUM(CASE WHEN is_sw THEN n ELSE 0 END) AS DOUBLE)
             / CAST(SUM(n) AS DOUBLE) AS stopword_ratio
    FROM ranked GROUP BY source ORDER BY source
"""

ORACLES["pq_adc_topk"] = """
    WITH assign0 AS (
        SELECT v.vec_id, t.s AS subspace, c.vec_id AS code,
               (CAST(FLOOR((CAST(v.embedding[t.s * 8 + 1] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 1] AS DOUBLE)) * (CAST(v.embedding[t.s * 8 + 1] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 1] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(v.embedding[t.s * 8 + 2] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 2] AS DOUBLE)) * (CAST(v.embedding[t.s * 8 + 2] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 2] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(v.embedding[t.s * 8 + 3] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 3] AS DOUBLE)) * (CAST(v.embedding[t.s * 8 + 3] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 3] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(v.embedding[t.s * 8 + 4] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 4] AS DOUBLE)) * (CAST(v.embedding[t.s * 8 + 4] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 4] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(v.embedding[t.s * 8 + 5] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 5] AS DOUBLE)) * (CAST(v.embedding[t.s * 8 + 5] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 5] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(v.embedding[t.s * 8 + 6] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 6] AS DOUBLE)) * (CAST(v.embedding[t.s * 8 + 6] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 6] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(v.embedding[t.s * 8 + 7] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 7] AS DOUBLE)) * (CAST(v.embedding[t.s * 8 + 7] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 7] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(v.embedding[t.s * 8 + 8] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 8] AS DOUBLE)) * (CAST(v.embedding[t.s * 8 + 8] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 8] AS DOUBLE)) * 1e12) AS BIGINT)) AS qd
        FROM embeddings v
        CROSS JOIN range(8) t(s)
        JOIN embeddings c ON c.vec_id < 4),
    codes AS (
        SELECT vec_id AS neighbor_id, subspace, code FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                ORDER BY qd, code) AS rn
            FROM assign0)
        WHERE rn = 1),
    dist AS (
        SELECT q.vec_id AS query_id, t.s AS subspace,
               c.vec_id AS code, (CAST(FLOOR((CAST(q.embedding[t.s * 8 + 1] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 1] AS DOUBLE)) * (CAST(q.embedding[t.s * 8 + 1] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 1] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(q.embedding[t.s * 8 + 2] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 2] AS DOUBLE)) * (CAST(q.embedding[t.s * 8 + 2] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 2] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(q.embedding[t.s * 8 + 3] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 3] AS DOUBLE)) * (CAST(q.embedding[t.s * 8 + 3] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 3] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(q.embedding[t.s * 8 + 4] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 4] AS DOUBLE)) * (CAST(q.embedding[t.s * 8 + 4] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 4] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(q.embedding[t.s * 8 + 5] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 5] AS DOUBLE)) * (CAST(q.embedding[t.s * 8 + 5] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 5] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(q.embedding[t.s * 8 + 6] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 6] AS DOUBLE)) * (CAST(q.embedding[t.s * 8 + 6] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 6] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(q.embedding[t.s * 8 + 7] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 7] AS DOUBLE)) * (CAST(q.embedding[t.s * 8 + 7] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 7] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(q.embedding[t.s * 8 + 8] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 8] AS DOUBLE)) * (CAST(q.embedding[t.s * 8 + 8] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 8] AS DOUBLE)) * 1e12) AS BIGINT)) AS qd
        FROM embeddings q
        CROSS JOIN range(8) t(s)
        JOIN embeddings c ON c.vec_id < 4
        WHERE q.vec_id < 5),
    adc AS (
        SELECT d.query_id, codes.neighbor_id,
               CAST(SUM(d.qd) AS BIGINT) AS adc_q
        FROM codes JOIN dist d USING (subspace, code)
        WHERE codes.neighbor_id != d.query_id
        GROUP BY 1, 2)
    SELECT query_id, neighbor_id,
           CAST(adc_q AS DOUBLE) / 1e12 AS adc_dist, rank
    FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY adc_q, neighbor_id) AS INT) AS rank
        FROM adc)
    WHERE rank <= 5 ORDER BY query_id, rank
"""

ORACLES["embed_drift"] = """
    WITH e AS (
        SELECT vec_id % 2 = 0 AS even, gs - 1 AS dim,
               CAST(embedding[CAST(gs AS INT)] AS DOUBLE) AS xd
        FROM embeddings CROSS JOIN generate_series(1, 64) AS t(gs))
    SELECT CAST(dim AS INT) AS dim,
           CAST(SUM(CASE WHEN even THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN NOT even THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN even THEN CAST(xd AS DECIMAL(18,8)) END)
                AS DOUBLE)
             / CAST(SUM(CASE WHEN even THEN 1 ELSE 0 END) AS DOUBLE)
               AS mean_a,
           CAST(SUM(CASE WHEN NOT even THEN CAST(xd AS DECIMAL(18,8)) END)
                AS DOUBLE)
             / CAST(SUM(CASE WHEN NOT even THEN 1 ELSE 0 END) AS DOUBLE)
               AS mean_b,
           ABS(CAST(SUM(CASE WHEN even THEN CAST(xd AS DECIMAL(18,8)) END)
                    AS DOUBLE)
               / CAST(SUM(CASE WHEN even THEN 1 ELSE 0 END) AS DOUBLE)
               - CAST(SUM(CASE WHEN NOT even
                          THEN CAST(xd AS DECIMAL(18,8)) END) AS DOUBLE)
                 / CAST(SUM(CASE WHEN NOT even THEN 1 ELSE 0 END) AS DOUBLE))
               AS abs_drift
    FROM e GROUP BY dim ORDER BY dim
"""

ORACLES["cosine_adjacent_hist"] = f"""
    WITH {_VNORM},
    pairs AS (
        SELECT a.vec_id,
               {_PAIR_COS.format(a='a.embedding', b='b.embedding',
                                 na='a.nrm', nb='b.nrm')} AS cosine
        FROM v a JOIN v b ON b.vec_id = a.vec_id + 1),
    binned AS (
        SELECT LEAST(19, GREATEST(0,
                   CAST(FLOOR((cosine + 1) * 10) AS INT))) AS bin,
               cosine
        FROM pairs)
    SELECT bin,
           CAST(bin AS DOUBLE) / 10 - 1 AS bin_lo,
           COUNT(*) AS n_pairs,
           CAST(SUM(CAST(cosine AS DECIMAL(18,8))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mean_cos
    FROM binned GROUP BY bin ORDER BY bin
"""

ORACLES["tokenizer_fertility"] = f"""
    WITH per_doc AS (
        SELECT source,
               len(list_filter(string_split({_NORM}, ' '), t -> t != ''))
                   AS n_words,
               len(regexp_extract_all({_NORM}, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                   AS n_subwords,
               LENGTH(replace({_NORM}, ' ', '')) AS n_chars
        FROM documents)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_subwords) AS BIGINT) AS n_subwords,
           CAST(SUM(n_subwords) AS DOUBLE) / CAST(SUM(n_words) AS DOUBLE)
               AS fertility,
           CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_subwords) AS DOUBLE)
               AS chars_per_subword
    FROM per_doc GROUP BY source ORDER BY source
"""

ORACLES["media_frame_dedup"] = """
    WITH ascii_docs AS (
        -- ASCII projection mirrors the Spark side: 1 char == 1 byte,
        -- so character substr below is byte-exact on any corpus.
        SELECT doc_id,
               regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g') AS text
        FROM documents),
    meta AS (
        SELECT doc_id, text, strlen(text) % 7 + 1 AS n,
               strlen(text) // (strlen(text) % 7 + 1) AS flen
        FROM ascii_docs),
    frames AS (
        SELECT doc_id, n AS n_frames,
               md5(substr(text, f * flen + 1, flen)) AS frame_hash
        FROM meta CROSS JOIN range(0, 7) t(f)
        WHERE f < n),
    doc_frames AS (
        SELECT DISTINCT doc_id, n_frames, frame_hash FROM frames),
    capped AS (
        SELECT *, COUNT(*) OVER (PARTITION BY frame_hash) AS df
        FROM doc_frames),
    kept AS (SELECT * FROM capped WHERE df <= 64),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.n_frames AS nf_a, b.n_frames AS nf_b,
               COUNT(*) AS n_shared_frames
        FROM kept a JOIN kept b
          ON a.frame_hash = b.frame_hash AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
        HAVING COUNT(*) >= 2)
    SELECT doc_a, doc_b,
           CAST(n_shared_frames AS BIGINT) AS n_shared_frames,
           CAST(n_shared_frames AS DOUBLE)
             / CAST(LEAST(nf_a, nf_b) AS DOUBLE) AS overlap_frac
    FROM pairs ORDER BY doc_a, doc_b
"""

ORACLES["pq_recall_eval"] = """
    WITH adc AS (SELECT query_id, neighbor_id FROM (
    WITH assign0 AS (
        SELECT v.vec_id, t.s AS subspace, c.vec_id AS code,
               (CAST(FLOOR((CAST(v.embedding[t.s * 8 + 1] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 1] AS DOUBLE)) * (CAST(v.embedding[t.s * 8 + 1] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 1] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(v.embedding[t.s * 8 + 2] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 2] AS DOUBLE)) * (CAST(v.embedding[t.s * 8 + 2] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 2] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(v.embedding[t.s * 8 + 3] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 3] AS DOUBLE)) * (CAST(v.embedding[t.s * 8 + 3] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 3] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(v.embedding[t.s * 8 + 4] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 4] AS DOUBLE)) * (CAST(v.embedding[t.s * 8 + 4] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 4] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(v.embedding[t.s * 8 + 5] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 5] AS DOUBLE)) * (CAST(v.embedding[t.s * 8 + 5] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 5] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(v.embedding[t.s * 8 + 6] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 6] AS DOUBLE)) * (CAST(v.embedding[t.s * 8 + 6] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 6] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(v.embedding[t.s * 8 + 7] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 7] AS DOUBLE)) * (CAST(v.embedding[t.s * 8 + 7] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 7] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(v.embedding[t.s * 8 + 8] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 8] AS DOUBLE)) * (CAST(v.embedding[t.s * 8 + 8] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 8] AS DOUBLE)) * 1e12) AS BIGINT)) AS qd
        FROM embeddings v
        CROSS JOIN range(8) t(s)
        JOIN embeddings c ON c.vec_id < 4),
    codes AS (
        SELECT vec_id AS neighbor_id, subspace, code FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                ORDER BY qd, code) AS rn
            FROM assign0)
        WHERE rn = 1),
    dist AS (
        SELECT q.vec_id AS query_id, t.s AS subspace,
               c.vec_id AS code, (CAST(FLOOR((CAST(q.embedding[t.s * 8 + 1] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 1] AS DOUBLE)) * (CAST(q.embedding[t.s * 8 + 1] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 1] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(q.embedding[t.s * 8 + 2] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 2] AS DOUBLE)) * (CAST(q.embedding[t.s * 8 + 2] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 2] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(q.embedding[t.s * 8 + 3] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 3] AS DOUBLE)) * (CAST(q.embedding[t.s * 8 + 3] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 3] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(q.embedding[t.s * 8 + 4] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 4] AS DOUBLE)) * (CAST(q.embedding[t.s * 8 + 4] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 4] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(q.embedding[t.s * 8 + 5] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 5] AS DOUBLE)) * (CAST(q.embedding[t.s * 8 + 5] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 5] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(q.embedding[t.s * 8 + 6] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 6] AS DOUBLE)) * (CAST(q.embedding[t.s * 8 + 6] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 6] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(q.embedding[t.s * 8 + 7] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 7] AS DOUBLE)) * (CAST(q.embedding[t.s * 8 + 7] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 7] AS DOUBLE)) * 1e12) AS BIGINT) + CAST(FLOOR((CAST(q.embedding[t.s * 8 + 8] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 8] AS DOUBLE)) * (CAST(q.embedding[t.s * 8 + 8] AS DOUBLE) - CAST(c.embedding[t.s * 8 + 8] AS DOUBLE)) * 1e12) AS BIGINT)) AS qd
        FROM embeddings q
        CROSS JOIN range(8) t(s)
        JOIN embeddings c ON c.vec_id < 4
        WHERE q.vec_id < 5),
    adc AS (
        SELECT d.query_id, codes.neighbor_id,
               CAST(SUM(d.qd) AS BIGINT) AS adc_q
        FROM codes JOIN dist d USING (subspace, code)
        WHERE codes.neighbor_id != d.query_id
        GROUP BY 1, 2)
    SELECT query_id, neighbor_id,
           CAST(adc_q AS DOUBLE) / 1e12 AS adc_dist, rank
    FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY adc_q, neighbor_id) AS INT) AS rank
        FROM adc)
    WHERE rank <= 5 ORDER BY query_id, rank
)),
    v AS (
            SELECT vec_id, label, embedding,
                   sqrt(CAST(list_sum(
                       [CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12) AS BIGINT)
                        FOR x IN embedding]) AS DOUBLE) / 1e12) AS nrm
            FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn
          FROM v WHERE vec_id < 5),
    cpairs AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               
            (CAST(list_sum(
                [CAST(floor(CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE) * 1e12) AS BIGINT)
                 FOR x IN list_zip(q.qv, c.embedding)]) AS DOUBLE) / 1e12) / (q.qn * c.nrm)
 AS cosine
        FROM q JOIN v c ON c.vec_id != q.query_id),
    exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) AS rank
            FROM cpairs)
        WHERE rank <= 5),
    hits AS (
        SELECT e.query_id, COUNT(a.neighbor_id) AS n_hits
        FROM exact e LEFT JOIN adc a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY 1)
    SELECT query_id, CAST(n_hits AS INT) AS n_hits,
           CAST(n_hits AS DOUBLE) / 5.0 AS recall_at_k
    FROM hits ORDER BY query_id
"""

ORACLES["perplexity_buckets"] = r"""
    WITH scored AS (SELECT * FROM (
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok FROM documents),
    nz AS (SELECT * FROM toks WHERE tok <> ''),
    uni AS (SELECT tok, COUNT(*) AS c1 FROM nz GROUP BY 1),
    vocab AS (SELECT COUNT(*) AS v FROM uni),
    tl AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t FROM documents),
    bgs0 AS (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(t)),
                      i -> t[i] || ' ' || t[i + 1])) AS bg
        FROM tl WHERE len(t) >= 2),
    bgs AS (
        SELECT * FROM bgs0
        WHERE NOT regexp_matches(bg, '^ | $|^$')),
    bi AS (SELECT bg, COUNT(*) AS c2 FROM bgs GROUP BY 1),
    lm AS (
        SELECT bg,
               CAST(FLOOR(LN(CAST(c2 + 1 AS DOUBLE)
                             / CAST(c1 + v AS DOUBLE)) * 1000000.0)
                    AS BIGINT) AS qlp_micro
        FROM bi JOIN uni ON string_split(bi.bg, ' ')[1] = uni.tok
        CROSS JOIN vocab)
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(qlp_micro) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             / 1000000.0 AS mean_logprob
    FROM bgs JOIN lm USING (bg)
    GROUP BY doc_id ORDER BY doc_id
)),
    b AS (
        SELECT s.doc_id, s.n_bigrams, s.mean_logprob, d.n_chars,
               NTILE(10) OVER (ORDER BY s.mean_logprob, s.doc_id) AS decile
        FROM scored s JOIN documents d USING (doc_id))
    SELECT CAST(decile AS INT) AS decile,
           COUNT(*) AS n_docs,
           MIN(mean_logprob) AS min_logprob,
           MAX(mean_logprob) AS max_logprob,
           CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mean_chars
    FROM b GROUP BY decile ORDER BY decile
"""

ORACLES["lsh_bucket_profile"] = r"""
    WITH reps AS (
        SELECT MIN(doc_id) AS doc_id FROM (
            SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS th FROM documents)
        GROUP BY th),
    toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t FROM documents),
        grams AS (
            SELECT doc_id,
                   list_distinct(
                     CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                          ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                FOR i IN range(1, len(t) - 1)]
                     END) AS g
            FROM toks),
    eg AS (SELECT doc_id, UNNEST(g) AS gram FROM grams
           WHERE doc_id IN (SELECT doc_id FROM reps)),
    based AS (SELECT doc_id,
                     CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT)
                         & 1073741823 AS base
              FROM eg),
    sigs AS (SELECT doc_id, MIN((447121421 * base + 974816483) % 2147483647) AS s0, MIN((323201579 * base + 388788901) % 2147483647) AS s1, MIN((348323079 * base + 96601181) % 2147483647) AS s2, MIN((66316721 * base + 942707150) % 2147483647) AS s3, MIN((21541691 * base + 272281883) % 2147483647) AS s4, MIN((421530471 * base + 416361249) % 2147483647) AS s5, MIN((267128709 * base + 669989454) % 2147483647) AS s6, MIN((59608083 * base + 966911930) % 2147483647) AS s7, MIN((210473981 * base + 167961276) % 2147483647) AS s8, MIN((417764043 * base + 724915722) % 2147483647) AS s9, MIN((145319191 * base + 755229607) % 2147483647) AS s10, MIN((535742095 * base + 633862163) % 2147483647) AS s11, MIN((490802381 * base + 585478717) % 2147483647) AS s12, MIN((343672219 * base + 186972157) % 2147483647) AS s13, MIN((84861729 * base + 663948346) % 2147483647) AS s14, MIN((123197035 * base + 647949796) % 2147483647) AS s15, MIN((171724455 * base + 123785554) % 2147483647) AS s16, MIN((244161973 * base + 456537181) % 2147483647) AS s17, MIN((515860521 * base + 938130766) % 2147483647) AS s18, MIN((361002549 * base + 295092109) % 2147483647) AS s19, MIN((430008159 * base + 346576250) % 2147483647) AS s20, MIN((114954831 * base + 932445567) % 2147483647) AS s21, MIN((442795683 * base + 201113130) % 2147483647) AS s22, MIN((303893345 * base + 718724034) % 2147483647) AS s23, MIN((433124519 * base + 684093647) % 2147483647) AS s24, MIN((70098209 * base + 7898817) % 2147483647) AS s25, MIN((121939201 * base + 403028775) % 2147483647) AS s26, MIN((83484807 * base + 1025004221) % 2147483647) AS s27, MIN((417316483 * base + 804156477) % 2147483647) AS s28, MIN((82553783 * base + 144294222) % 2147483647) AS s29, MIN((404754421 * base + 314693933) % 2147483647) AS s30, MIN((462202577 * base + 59382772) % 2147483647) AS s31, MIN((47043421 * base + 642311233) % 2147483647) AS s32, MIN((17764429 * base + 1073579887) % 2147483647) AS s33, MIN((523261757 * base + 643426390) % 2147483647) AS s34, MIN((206665169 * base + 616336013) % 2147483647) AS s35, MIN((504457557 * base + 518564970) % 2147483647) AS s36, MIN((117867983 * base + 631184287) % 2147483647) AS s37, MIN((512351947 * base + 150068630) % 2147483647) AS s38, MIN((499846933 * base + 469114654) % 2147483647) AS s39, MIN((64287797 * base + 439379439) % 2147483647) AS s40, MIN((405729093 * base + 116782553) % 2147483647) AS s41, MIN((8874745 * base + 598099247) % 2147483647) AS s42, MIN((427366077 * base + 892374428) % 2147483647) AS s43, MIN((463807295 * base + 432138428) % 2147483647) AS s44, MIN((73253795 * base + 371436377) % 2147483647) AS s45, MIN((229968171 * base + 244259081) % 2147483647) AS s46, MIN((522570415 * base + 647285460) % 2147483647) AS s47, MIN((326026269 * base + 670173281) % 2147483647) AS s48, MIN((397695277 * base + 485490576) % 2147483647) AS s49, MIN((391623667 * base + 140651355) % 2147483647) AS s50, MIN((223610083 * base + 400032902) % 2147483647) AS s51, MIN((326615807 * base + 710355945) % 2147483647) AS s52, MIN((279941059 * base + 409211962) % 2147483647) AS s53, MIN((52928455 * base + 1004403146) % 2147483647) AS s54, MIN((125993857 * base + 321116597) % 2147483647) AS s55, MIN((476091119 * base + 925853882) % 2147483647) AS s56, MIN((445490841 * base + 97947120) % 2147483647) AS s57, MIN((31190019 * base + 28732103) % 2147483647) AS s58, MIN((394735505 * base + 768664970) % 2147483647) AS s59, MIN((175504925 * base + 135107090) % 2147483647) AS s60, MIN((219131201 * base + 541757647) % 2147483647) AS s61, MIN((11305639 * base + 536152003) % 2147483647) AS s62, MIN((170871135 * base + 1008100581) % 2147483647) AS s63 FROM based GROUP BY doc_id),
    banded AS (SELECT doc_id, [md5('0' || '|' || s0 || '|' || s1 || '|' || s2 || '|' || s3), md5('1' || '|' || s4 || '|' || s5 || '|' || s6 || '|' || s7), md5('2' || '|' || s8 || '|' || s9 || '|' || s10 || '|' || s11), md5('3' || '|' || s12 || '|' || s13 || '|' || s14 || '|' || s15), md5('4' || '|' || s16 || '|' || s17 || '|' || s18 || '|' || s19), md5('5' || '|' || s20 || '|' || s21 || '|' || s22 || '|' || s23), md5('6' || '|' || s24 || '|' || s25 || '|' || s26 || '|' || s27), md5('7' || '|' || s28 || '|' || s29 || '|' || s30 || '|' || s31), md5('8' || '|' || s32 || '|' || s33 || '|' || s34 || '|' || s35), md5('9' || '|' || s36 || '|' || s37 || '|' || s38 || '|' || s39), md5('10' || '|' || s40 || '|' || s41 || '|' || s42 || '|' || s43), md5('11' || '|' || s44 || '|' || s45 || '|' || s46 || '|' || s47), md5('12' || '|' || s48 || '|' || s49 || '|' || s50 || '|' || s51), md5('13' || '|' || s52 || '|' || s53 || '|' || s54 || '|' || s55), md5('14' || '|' || s56 || '|' || s57 || '|' || s58 || '|' || s59), md5('15' || '|' || s60 || '|' || s61 || '|' || s62 || '|' || s63)] AS bands FROM sigs),
    expl AS (SELECT doc_id, i AS band_id, bands[i+1] AS band_hash
             FROM banded, range(16) t(i)),
    buckets AS (
        SELECT band_id, band_hash, COUNT(*) AS size
        FROM expl GROUP BY 1, 2)
    SELECT CAST(band_id AS INT) AS band_id,
           CAST(size AS BIGINT) AS bucket_size,
           COUNT(*) AS n_buckets,
           CAST(COUNT(*) * size * (size - 1) // 2 AS BIGINT)
               AS implied_pairs
    FROM buckets GROUP BY band_id, size
    ORDER BY band_id, bucket_size
"""

ORACLES["blocklist_fuzzy"] = """
    SELECT doc_id,
           CAST(len(list_filter(list_transform(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '), t -> translate(t, '013457$@!', 'oleastsai')), t -> t IN ('merge', 'deadlock', 'rollback', 'panic', 'corrupt'))) AS INT)
               AS n_hits,
           CAST(len(list_intersect(list_distinct(list_transform(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '), t -> translate(t, '013457$@!', 'oleastsai'))), ['merge', 'deadlock', 'rollback', 'panic', 'corrupt']))
               AS INT) AS n_distinct_terms,
           COALESCE(array_to_string(list_sort(list_intersect(
               list_distinct(list_transform(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '), t -> translate(t, '013457$@!', 'oleastsai'))), ['merge', 'deadlock', 'rollback', 'panic', 'corrupt'])), ','), '') AS matched,
           CASE WHEN len(list_intersect(list_distinct(list_transform(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '), t -> translate(t, '013457$@!', 'oleastsai'))), ['merge', 'deadlock', 'rollback', 'panic', 'corrupt']))
                     >= 2
                THEN 'flag' ELSE 'keep' END AS verdict
    FROM documents ORDER BY doc_id
"""

ORACLES["hard_negatives"] = f"""
    WITH {_VNORM},
    q AS (SELECT vec_id AS query_id, label AS query_label,
                 embedding AS qv, nrm AS qn
          FROM v WHERE vec_id < 20),
    pairs AS (
        SELECT q.query_id, q.query_label, c.vec_id AS neg_id,
               c.label AS neg_label,
               {_PAIR_COS.format(a='q.qv', b='c.embedding', na='q.qn', nb='c.nrm')} AS cosine
        FROM q JOIN v c ON q.query_label != c.label)
    SELECT query_id, query_label, neg_id, neg_label, cosine, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neg_id
        ) AS INT) AS rank
        FROM pairs)
    WHERE rank <= 3 ORDER BY query_id, rank
"""

ORACLES["tfidf_cosine_pairs"] = f"""
    WITH toks AS (
        SELECT doc_id AS doc, UNNEST({_TOKS}) AS tok FROM documents),
    tf AS (
        SELECT doc, tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks WHERE tok != '' GROUP BY 1, 2),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
    idf AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
               CAST(FLOOR(ln(nd.n / CAST(COUNT(*) AS DOUBLE)) * 1e3)
                   AS BIGINT) AS idf_q
        FROM tf, nd GROUP BY tok, nd.n),
    w AS (
        SELECT tf.doc, tf.tok, i.df, tf.tf * i.idf_q AS w
        FROM tf JOIN idf i ON tf.tok = i.tok),
    norms AS (
        SELECT doc, sqrt(CAST(CAST(SUM(w * w) AS BIGINT) AS DOUBLE)) AS nrm
        FROM w GROUP BY 1),
    rare AS (SELECT doc, tok FROM w WHERE df <= 64),
    cands AS (
        SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
        FROM rare a JOIN rare b ON a.tok = b.tok AND a.doc < b.doc),
    dots AS (
        SELECT c.doc_a, c.doc_b, CAST(SUM(wa.w * wb.w) AS BIGINT) AS dot
        FROM cands c
        JOIN w wa ON wa.doc = c.doc_a
        JOIN w wb ON wb.doc = c.doc_b AND wb.tok = wa.tok
        GROUP BY 1, 2)
    SELECT d.doc_a, d.doc_b,
           CAST(d.dot AS DOUBLE) / (na.nrm * nb.nrm) AS cosine
    FROM dots d
    JOIN norms na ON na.doc = d.doc_a
    JOIN norms nb ON nb.doc = d.doc_b
    WHERE CAST(d.dot AS DOUBLE) / (na.nrm * nb.nrm) >= '0.4'::DOUBLE
    ORDER BY doc_a, doc_b
"""

ORACLES["repeated_substrings"] = f"""
    WITH d AS (SELECT doc_id AS doc, {_NORM} AS n FROM documents),
    wins AS (
        SELECT doc,
               UNNEST([substr(n, CAST(i AS INT), 32)
                       FOR i IN range(1, greatest(2, length(n) - 30), 16)])
                   AS win
        FROM d),
    grams AS (SELECT doc, md5(win) AS h FROM wins WHERE length(win) >= 32),
    counts AS (
        SELECT h, CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM grams GROUP BY 1)
    SELECT h, n_docs, n_occurrences FROM counts WHERE n_docs >= 2
    ORDER BY n_docs DESC, n_occurrences DESC, h LIMIT 100
"""

ORACLES["label_noise_knn"] = f"""
    WITH {_VNORM},
    coded AS (
        SELECT vec_id, label, embedding, nrm,
               CAST((SELECT SUM(CASE WHEN
                   list_sum(
                       [CAST(floor(CASE WHEN substr(md5(p::VARCHAR || '|' || j::VARCHAR), 1, 1) >= '8'
                                  THEN 1.0 ELSE -1.0 END
                             * CAST(embedding[j] AS DOUBLE) * 1e12) AS BIGINT)
                        FOR j IN range(1, len(embedding) + 1)]) >= 0
                   THEN (1 << p) ELSE 0 END) FROM range(8) t(p)) AS INT) AS code
        FROM v),
    pairs AS (
        SELECT a.vec_id AS vec_id_a, a.label AS la, b.label AS lb,
               {_PAIR_COS.format(a='a.embedding', b='b.embedding', na='a.nrm', nb='b.nrm')} AS cosine,
               b.vec_id AS vec_id_b
        FROM coded a JOIN coded b
          ON a.code = b.code AND a.vec_id != b.vec_id),
    topk AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id_a ORDER BY cosine DESC, vec_id_b
            ) AS r FROM pairs)
        WHERE r <= 5)
    SELECT la AS label,
           CAST(COUNT(DISTINCT vec_id_a) AS BIGINT) AS n_anchors,
           CAST(COUNT(*) AS BIGINT) AS n_votes,
           CAST(SUM(CASE WHEN lb != la THEN 1 ELSE 0 END) AS BIGINT)
               AS n_disagree,
           CAST(CAST(SUM(CASE WHEN lb != la THEN 1 ELSE 0 END) AS BIGINT)
                AS DOUBLE) / CAST(CAST(COUNT(*) AS BIGINT) AS DOUBLE)
               AS noise_rate
    FROM topk GROUP BY 1 ORDER BY 1
"""

ORACLES["bpe_merge_candidates"] = f"""
    WITH words AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS wc
        FROM (SELECT UNNEST({_TOKS}) AS word FROM documents)
        WHERE word != '' GROUP BY 1),
    pairs AS (
        SELECT wc,
               UNNEST([substr(word, CAST(i AS INT), 2)
                       FOR i IN range(1, greatest(2, length(word)))])
                   AS pair
        FROM words),
    g AS (
        SELECT pair, CAST(SUM(wc) AS BIGINT) AS n_occurrences
        FROM pairs WHERE length(pair) = 2 GROUP BY 1)
    SELECT pair, n_occurrences FROM g
    ORDER BY n_occurrences DESC, pair LIMIT 50
"""


ORACLES["stupid_backoff_logprob"] = f"""
    WITH tk AS (SELECT doc_id, string_split({_NORM}, ' ') AS t
                FROM documents),
    p0 AS (
        SELECT doc_id,
               UNNEST([{{'w1': t[CAST(i AS INT)],
                        'w2': t[CAST(i AS INT) + 1]}}
                       FOR i IN range(1, greatest(1, len(t)))]) AS p
        FROM tk),
    p2 AS (
        SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM p0
        WHERE p.w1 != '' AND p.w2 IS NOT NULL AND p.w2 != ''),
    uni AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cu
        FROM (SELECT UNNEST(string_split({_NORM}, ' ')) AS w
              FROM documents)
        WHERE w != '' GROUP BY 1),
    tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS t FROM uni),
    unis AS (
        SELECT w, CAST(FLOOR(ln('0.4'::DOUBLE * CAST(cu AS DOUBLE)
                                / CAST(t AS DOUBLE)) * 1e6) AS BIGINT) AS uq
        FROM uni, tot),
    bi AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb
           FROM p2 GROUP BY 1, 2),
    bis AS (
        SELECT b.w1, b.w2,
               CAST(FLOOR(ln(CAST(b.cb AS DOUBLE) / CAST(u.cu AS DOUBLE))
                          * 1e6) AS BIGINT) AS bq
        FROM bi b JOIN uni u ON u.w = b.w1),
    scored AS (
        SELECT p.doc_id, COALESCE(b.bq, u.uq) AS sq,
               CASE WHEN b.bq IS NULL THEN 1 ELSE 0 END AS backoff
        FROM p2 p
        LEFT JOIN bis b ON b.w1 = p.w1 AND b.w2 = p.w2
        JOIN unis u ON u.w = p.w2)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(backoff) AS BIGINT) AS n_backoff,
           CAST(CAST(SUM(sq) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 1e6 AS mean_logprob
    FROM scored GROUP BY 1 ORDER BY 1
"""

ORACLES["translation_pairs"] = f"""
    WITH {_VNORM},
    coded AS (
        SELECT vec_id, embedding, nrm,
               CAST((SELECT SUM(CASE WHEN
                   list_sum(
                       [CAST(floor(CASE WHEN substr(md5(p::VARCHAR || '|' || j::VARCHAR), 1, 1) >= '8'
                                  THEN 1.0 ELSE -1.0 END
                             * CAST(embedding[j] AS DOUBLE) * 1e12) AS BIGINT)
                        FOR j IN range(1, len(embedding) + 1)]) >= 0
                   THEN (1 << p) ELSE 0 END) FROM range(8) t(p)) AS INT) AS code
        FROM v),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_PAIR_COS.format(a='a.embedding', b='b.embedding', na='a.nrm', nb='b.nrm')} AS cosine
        FROM coded a JOIN coded b
          ON a.code = b.code AND a.vec_id < b.vec_id)
    SELECT p.vec_a, p.vec_b, da.lang AS lang_a, db.lang AS lang_b, p.cosine
    FROM pairs p
    JOIN documents da ON da.doc_id = p.vec_a
    JOIN documents db ON db.doc_id = p.vec_b
    WHERE da.lang != db.lang AND p.cosine >= '0.3'::DOUBLE
    ORDER BY vec_a, vec_b
"""

ORACLES["mojibake_score"] = """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(text)
                - length(regexp_replace(text, '[ÃÂâ]', '', 'g'))
               AS BIGINT) AS n_mojibake,
           CAST(length(text)
                - length(regexp_replace(text, '�', '', 'g'))
               AS BIGINT) AS n_replacement,
           CAST(length(text)
                - length(regexp_replace(text,
                    '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g'))
               AS BIGINT) AS n_control,
           CASE WHEN length(text) > 0
                THEN CAST((length(text)
                           - length(regexp_replace(text, '[ÃÂâ]', '', 'g')))
                          + (length(text)
                             - length(regexp_replace(text, '�', '', 'g')))
                          + (length(text)
                             - length(regexp_replace(text,
                                 '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '',
                                 'g'))) AS DOUBLE)
                     / CAST(length(text) AS DOUBLE)
                ELSE 0.0 END AS artifact_rate
    FROM documents ORDER BY doc_id
"""

ORACLES["matryoshka_recall"] = f"""
    WITH v AS (
        SELECT vec_id, embedding,
               sqrt(CAST(list_sum(
                   [CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12)
                        AS BIGINT) FOR x IN embedding]) AS DOUBLE) / 1e12)
                   AS nrm,
               sqrt(CAST(list_sum(
                   [CAST(floor(CAST(embedding[j] AS DOUBLE)
                               * CAST(embedding[j] AS DOUBLE) * 1e12)
                        AS BIGINT) FOR j IN range(1, 17)]) AS DOUBLE) / 1e12)
                   AS nrm16
        FROM embeddings),
    q AS (SELECT * FROM v WHERE vec_id < 10),
    fullp AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_PAIR_COS.format(a='q.embedding', b='c.embedding', na='q.nrm', nb='c.nrm')} AS cosine
        FROM q JOIN v c ON c.vec_id != q.vec_id),
    fullk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
            ) AS r FROM fullp)
        WHERE r <= 5),
    prefp AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               (CAST(list_sum(
                   [CAST(floor(CAST(q.embedding[j] AS DOUBLE)
                               * CAST(c.embedding[j] AS DOUBLE) * 1e12)
                        AS BIGINT) FOR j IN range(1, 17)]) AS DOUBLE) / 1e12)
               / (q.nrm16 * c.nrm16) AS cosine
        FROM q JOIN v c ON c.vec_id != q.vec_id),
    prefk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
            ) AS r FROM prefp)
        WHERE r <= 5)
    SELECT f.query_id,
           CAST(SUM(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_overlap,
           CAST(SUM(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
    FROM fullk f
    LEFT JOIN prefk p
      ON p.query_id = f.query_id AND p.neighbor_id = f.neighbor_id
    GROUP BY 1 ORDER BY 1
"""


ORACLES["boilerplate_prefixes"] = f"""
    WITH g AS (
        SELECT source AS src, md5(substr({_NORM}, 1, 32)) AS ph,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1, 2),
    w AS (
        SELECT *,
               CAST(SUM(n_docs) OVER (PARTITION BY src) AS BIGINT) AS n_src,
               ROW_NUMBER() OVER (PARTITION BY src
                   ORDER BY n_docs DESC, ph) AS r
        FROM g)
    SELECT src AS source, CAST(r AS INT) AS rank, ph AS prefix_hash,
           n_docs,
           CAST(n_docs AS DOUBLE) / CAST(n_src AS DOUBLE) AS doc_share
    FROM w WHERE r <= 3 ORDER BY source, rank
"""

ORACLES["hamming_recall"] = f"""
    WITH {_VNORM},
    sk AS (
        SELECT vec_id,
               CAST(list_sum([CASE WHEN embedding[j] > 0
                    THEN CAST(1 AS BIGINT) << (j - 1)
                    ELSE CAST(0 AS BIGINT) END
                    FOR j IN range(1, 33)]) AS BIGINT) AS sk_lo,
               CAST(list_sum([CASE WHEN embedding[j] > 0
                    THEN CAST(1 AS BIGINT) << (j - 33)
                    ELSE CAST(0 AS BIGINT) END
                    FOR j IN range(33, 65)]) AS BIGINT) AS sk_hi
        FROM embeddings),
    q AS (SELECT * FROM v WHERE vec_id < 10),
    fullp AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_PAIR_COS.format(a='q.embedding', b='c.embedding', na='q.nrm', nb='c.nrm')} AS cosine
        FROM q JOIN v c ON c.vec_id != q.vec_id),
    fullk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
            ) AS r FROM fullp)
        WHERE r <= 5),
    hamp AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               CAST(bit_count(xor(a.sk_lo, b.sk_lo))
                    + bit_count(xor(a.sk_hi, b.sk_hi)) AS INT) AS hamming
        FROM sk a JOIN sk b ON b.vec_id != a.vec_id
        WHERE a.vec_id < 10),
    hamk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY hamming, neighbor_id
            ) AS r FROM hamp)
        WHERE r <= 5)
    SELECT f.query_id,
           CAST(SUM(CASE WHEN h.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_overlap,
           CAST(SUM(CASE WHEN h.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
    FROM fullk f
    LEFT JOIN hamk h
      ON h.query_id = f.query_id AND h.neighbor_id = f.neighbor_id
    GROUP BY 1 ORDER BY 1
"""

ORACLES["readability_scores"] = f"""
    WITH c AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split({_NORM}, ' '),
                    w -> w != '')) AS BIGINT) AS n_words,
               CAST(greatest(1, len(list_filter(
                    regexp_split_to_array(text, '[.!?]'),
                    s -> length(trim(s)) > 0))) AS BIGINT) AS n_sentences,
               CAST(length(regexp_replace(
                        regexp_replace(lower(text), '[^a-z ]', '', 'g'),
                        '[aeiouy]+', '#', 'g'))
                    - length(regexp_replace(
                        regexp_replace(lower(text), '[^a-z ]', '', 'g'),
                        '[aeiouy]+', '', 'g')) AS BIGINT) AS n_syllables
        FROM documents)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           '206.835'::DOUBLE
           - '1.015'::DOUBLE
             * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
           - '84.6'::DOUBLE
             * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
               AS flesch_score
    FROM c WHERE n_words > 0 ORDER BY doc_id
"""

ORACLES["rake_keywords"] = f"""
    WITH phr0 AS (
        SELECT UNNEST(list_filter(
            string_split(regexp_replace({_NORM},
                '\\b(the|a|an|and|or|of|to|in|is|it)\\b', '|', 'g'), '|'),
            p -> length(trim(p)) > 0)) AS p0
        FROM documents),
    phrases AS (
        SELECT trim(p0) AS phrase FROM phr0 WHERE length(trim(p0)) > 0),
    pw AS (
        SELECT phrase,
               CAST(len(list_filter(string_split(phrase, ' '),
                    w -> w != '')) AS BIGINT) AS plen,
               UNNEST(list_filter(string_split(phrase, ' '),
                    w -> w != '')) AS w
        FROM phrases),
    ws AS (
        SELECT w, CAST(SUM(plen) AS BIGINT) AS deg,
               CAST(COUNT(*) AS BIGINT) AS freq
        FROM pw GROUP BY 1),
    wq AS (
        SELECT w, CAST(FLOOR(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE)
                   * 1e9) AS BIGINT) AS score_nano
        FROM ws),
    dp AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
           FROM phrases GROUP BY 1),
    dw AS (
        SELECT d.phrase,
               UNNEST(list_filter(string_split(d.phrase, ' '),
                    w -> w != '')) AS w
        FROM dp d),
    sc AS (
        SELECT dw.phrase, CAST(SUM(q.score_nano) AS BIGINT) AS sn
        FROM dw JOIN wq q ON q.w = dw.w GROUP BY 1)
    SELECT d.phrase, d.n_occurrences,
           CAST(sc.sn AS DOUBLE) / 1e9 AS rake_score
    FROM dp d JOIN sc ON sc.phrase = d.phrase
    ORDER BY rake_score DESC, d.phrase LIMIT 20
"""

_match_full_d14 = " + ".join(
    f"CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END" for i in range(64)
)
_match_bit_d14 = " + ".join(
    f"CASE WHEN sa.s{i} % 2 = sb.s{i} % 2 THEN 1 ELSE 0 END" for i in range(64)
)
ORACLES["bbit_minhash_eval"] = f"""
    WITH {{grams_ctes}},
    eg AS (SELECT doc_id, UNNEST(g) AS gram FROM grams),
    based AS (SELECT doc_id,
                     CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT)
                         & {{base_mask}} AS base
              FROM eg),
    sigs AS (SELECT doc_id, {{sig_cols}} FROM based GROUP BY doc_id),
    banded AS (SELECT doc_id, [{{band_list}}] AS bands FROM sigs),
    expl AS (SELECT doc_id, i AS band_id, bands[i+1] AS band_hash
             FROM banded, range(16) t(i)),
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM expl a JOIN expl b
          ON a.band_id = b.band_id AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id),
    matched AS (
        SELECT c.doc_a, c.doc_b,
               ({_match_full_d14}) AS nf,
               ({_match_bit_d14}) AS nb
        FROM cands c
        JOIN sigs sa ON c.doc_a = sa.doc_id
        JOIN sigs sb ON c.doc_b = sb.doc_id)
    SELECT doc_a, doc_b,
           CAST(nf AS DOUBLE) / 64.0 AS est_full,
           GREATEST(0.0, 2.0 * (CAST(nb AS DOUBLE) / 64.0) - 1.0)
               AS est_1bit,
           ABS(CAST(nf AS DOUBLE) / 64.0
               - GREATEST(0.0, 2.0 * (CAST(nb AS DOUBLE) / 64.0) - 1.0))
               AS abs_gap
    FROM matched ORDER BY doc_a, doc_b
"""
ORACLES["bbit_minhash_eval"] = ORACLES["bbit_minhash_eval"].format(
    grams_ctes=_GRAMS_CTES,
    base_mask=_hashing.BASE_MASK,
    sig_cols=_sig_cols,
    band_list=_band_list,
)

ORACLES["label_silhouette"] = f"""
    WITH {_VNORM},
    cents AS (
        SELECT label AS clabel, j AS dim,
               CAST(SUM(CAST(CAST(embedding[j] AS DOUBLE)
                   AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS centroid
        FROM embeddings, range(1, 65) t(j)
        GROUP BY 1, 2),
    cvecs AS (
        SELECT clabel, list(centroid ORDER BY dim) AS cvec
        FROM cents GROUP BY 1),
    scored AS (
        SELECT e.vec_id, e.label, c.clabel,
               (CAST(list_sum(
                   [CAST(floor(CAST(e.embedding[j] AS DOUBLE)
                               * c.cvec[j] * 1e12) AS BIGINT)
                    FOR j IN range(1, 65)]) AS DOUBLE) / 1e12)
               / (e.nrm
                  * sqrt(CAST(list_sum(
                      [CAST(floor(c.cvec[j] * c.cvec[j] * 1e12) AS BIGINT)
                       FOR j IN range(1, 65)]) AS DOUBLE) / 1e12))
                   AS cosine
        FROM v e, cvecs c),
    per_vec AS (
        SELECT vec_id, label,
               MAX(CASE WHEN label = clabel THEN cosine END) AS a,
               MAX(CASE WHEN label != clabel THEN cosine END) AS b
        FROM scored GROUP BY 1, 2),
    q AS (
        SELECT label,
               CAST(FLOOR((a - b) * 1e9) AS BIGINT) AS mq,
               CASE WHEN b > a THEN 1 ELSE 0 END AS mis
        FROM per_vec)
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(CAST(SUM(mq) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 1e9 AS mean_margin,
           CAST(SUM(mis) AS BIGINT) AS n_misplaced
    FROM q GROUP BY 1 ORDER BY 1
"""

ORACLES["license_notice_rate"] = """
    WITH g AS (
        SELECT source,
               CASE WHEN contains(lower(text), 'copyright')
                     OR contains(lower(text), '(c)')
                     OR contains(lower(text), 'all rights reserved')
                    THEN 1 ELSE 0 END AS hc,
               CASE WHEN contains(lower(text), 'licensed under')
                     OR contains(lower(text), 'license')
                     OR contains(lower(text), 'creative commons')
                    THEN 1 ELSE 0 END AS hl
        FROM documents),
    r AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(hc) AS BIGINT) AS n_copyright,
               CAST(SUM(hl) AS BIGINT) AS n_license
        FROM g GROUP BY 1)
    SELECT source, n_docs, n_copyright, n_license,
           CAST(n_copyright AS DOUBLE) / CAST(n_docs AS DOUBLE)
               AS copyright_rate,
           CAST(n_license AS DOUBLE) / CAST(n_docs AS DOUBLE)
               AS license_rate
    FROM r ORDER BY source
"""


ORACLES["uncertainty_sampling"] = f"""
    WITH {_VNORM},
    coded AS (
        SELECT vec_id, label, embedding, nrm,
               CAST((SELECT SUM(CASE WHEN
                   list_sum(
                       [CAST(floor(CASE WHEN substr(md5(p::VARCHAR || '|' || j::VARCHAR), 1, 1) >= '8'
                                  THEN 1.0 ELSE -1.0 END
                             * CAST(embedding[j] AS DOUBLE) * 1e12) AS BIGINT)
                        FOR j IN range(1, len(embedding) + 1)]) >= 0
                   THEN (1 << p) ELSE 0 END) FROM range(8) t(p)) AS INT) AS code
        FROM v),
    pairs AS (
        SELECT a.vec_id AS vec_id_a, a.label AS la, b.label AS lb,
               {_PAIR_COS.format(a='a.embedding', b='b.embedding', na='a.nrm', nb='b.nrm')} AS cosine,
               b.vec_id AS vec_id_b
        FROM coded a JOIN coded b
          ON a.code = b.code AND a.vec_id != b.vec_id),
    topk AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id_a ORDER BY cosine DESC, vec_id_b
            ) AS r FROM pairs)
        WHERE r <= 5),
    votes AS (
        SELECT vec_id_a, la, lb, CAST(COUNT(*) AS BIGINT) AS v
        FROM topk GROUP BY 1, 2, 3),
    pa AS (
        SELECT vec_id_a AS vec_id, la AS label,
               CAST(SUM(v) AS BIGINT) AS n_votes,
               CAST(MAX(v) AS BIGINT) AS top_votes
        FROM votes GROUP BY 1, 2)
    SELECT vec_id, label, n_votes, top_votes,
           1.0 - CAST(top_votes AS DOUBLE) / CAST(n_votes AS DOUBLE)
               AS uncertainty
    FROM pa
    ORDER BY uncertainty DESC, vec_id LIMIT 20
"""

ORACLES["media_scene_cuts"] = """
    WITH ascii_docs AS (
        SELECT doc_id,
               regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g') AS text
        FROM documents),
    meta AS (
        SELECT doc_id, text, strlen(text) % 7 + 1 AS n,
               strlen(text) // (strlen(text) % 7 + 1) AS flen
        FROM ascii_docs),
    frames AS (
        SELECT doc_id, n AS n_frames, f AS frame_idx,
               md5(substr(text, f * flen + 1, flen)) AS frame_hash
        FROM meta CROSS JOIN range(0, 7) t(f)
        WHERE f < n),
    cuts AS (
        SELECT doc_id, n_frames, frame_hash,
               CASE WHEN frame_hash <> LAG(frame_hash) OVER (
                        PARTITION BY doc_id ORDER BY frame_idx)
                    THEN 1 ELSE 0 END AS is_cut
        FROM frames),
    per_doc AS (
        SELECT doc_id,
               CAST(MAX(n_frames) AS BIGINT) AS n_frames,
               CAST(COALESCE(SUM(is_cut), 0) AS BIGINT) AS n_cuts,
               CAST(COUNT(DISTINCT frame_hash) AS BIGINT)
                   AS n_distinct_frames
        FROM cuts GROUP BY doc_id)
    SELECT doc_id, n_frames, n_cuts, n_distinct_frames,
           CAST(n_cuts AS DOUBLE) / CAST(n_frames - 1 AS DOUBLE)
               AS cut_rate
    FROM per_doc WHERE n_frames > 1 ORDER BY doc_id
"""

ORACLES["knn_reciprocity"] = f"""
    WITH {_VNORM},
    panel AS (SELECT vec_id, embedding, nrm FROM v WHERE vec_id < 500),
    pairs AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               {_PAIR_COS.format(a='a.embedding', b='b.embedding',
                                 na='a.nrm', nb='b.nrm')} AS cosine
        FROM panel a JOIN panel b ON a.vec_id != b.vec_id),
    edges AS (
        SELECT src, dst FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY src ORDER BY cosine DESC, dst) AS r
            FROM pairs)
        WHERE r <= 5),
    recip AS (
        SELECT e.src, e.dst FROM edges e
        JOIN edges r ON r.src = e.dst AND r.dst = e.src),
    indeg AS (
        SELECT dst, COUNT(*) AS d FROM edges GROUP BY dst)
    SELECT CAST((SELECT COUNT(*) FROM panel) AS BIGINT) AS n_vectors,
           CAST(5 AS INT) AS k,
           CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM recip) AS BIGINT) AS n_reciprocal,
           CAST((SELECT COUNT(*) FROM recip) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM edges) AS DOUBLE) AS reciprocity,
           CAST((SELECT MAX(d) FROM indeg) AS BIGINT) AS max_in_degree,
           CAST((SELECT COUNT(*) FROM panel) AS BIGINT)
             - CAST((SELECT COUNT(*) FROM indeg) AS BIGINT) AS n_never_cited
"""

ORACLES["normalization_impact"] = f"""
    WITH audited AS (
        SELECT source,
               length(text) AS raw_len,
               strlen({_NORM}) AS norm_len,
               CASE WHEN {_NORM} != text THEN 1 ELSE 0 END AS changed,
               CASE WHEN regexp_replace(trim(text), '\\s+', ' ', 'g')
                         != text THEN 1 ELSE 0 END AS ws_changed,
               CASE WHEN lower(text) != text THEN 1 ELSE 0 END AS has_upper
        FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(changed) AS BIGINT) AS n_changed,
           CAST(SUM(has_upper) AS BIGINT) AS n_case_affected,
           CAST(SUM(ws_changed) AS BIGINT) AS n_ws_affected,
           CAST(SUM(raw_len - norm_len) AS BIGINT) AS chars_removed,
           CAST(SUM(changed) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS pct_changed
    FROM audited GROUP BY source ORDER BY source
"""

ORACLES["doc_stitch_pairs"] = f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    b AS (
        SELECT doc_id,
               array_to_string(toks[1:2], ' ') AS head_k,
               array_to_string(toks[-2:], ' ') AS tail_k
        FROM tk WHERE len(toks) >= 4),
    hc AS (SELECT head_k, COUNT(*) AS hdf FROM b GROUP BY 1),
    tc AS (SELECT tail_k, COUNT(*) AS tdf FROM b GROUP BY 1),
    tails AS (
        SELECT b.doc_id AS doc_a, b.tail_k AS stitch_key
        FROM b JOIN tc ON b.tail_k = tc.tail_k WHERE tdf <= 64),
    heads AS (
        SELECT b.doc_id AS doc_b, b.head_k AS stitch_key
        FROM b JOIN hc ON b.head_k = hc.head_k WHERE hdf <= 64)
    SELECT t.doc_a, h.doc_b, t.stitch_key
    FROM tails t JOIN heads h USING (stitch_key)
    WHERE t.doc_a != h.doc_b
    ORDER BY t.doc_a, h.doc_b
"""

_RP_PROJ_COLS = ",\n               ".join(
    "CAST(FLOOR(CAST(list_sum([qe[j] * (((j * 7919 + {p} * 104729) % 1997)"
    " - 998) FOR j IN range(1, 65)]) AS DOUBLE) / 1e6) AS BIGINT)"
    " AS p{p}".format(p=p)
    for p in range(1, 9)
)
_RP_DIST = " + ".join(
    f"(c.p{p} - q.p{p}) * (c.p{p} - q.p{p})" for p in range(1, 9)
)
ORACLES["rp_recall"] = f"""
    WITH {_VNORM},
    exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                       {_PAIR_COS.format(a='q.qv', b='c.embedding', na='q.qn', nb='c.nrm')} DESC,
                       c.vec_id) AS r
            FROM (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn
                  FROM v WHERE vec_id < 10) q
            JOIN v c ON c.vec_id != q.query_id)
        WHERE r <= 10),
    qarr AS (
        SELECT vec_id,
               [CAST(FLOOR(CAST(x AS DOUBLE) * 1e6) AS BIGINT)
                FOR x IN embedding] AS qe
        FROM embeddings),
    proj AS (
        SELECT vec_id,
               {_RP_PROJ_COLS}
        FROM qarr),
    approx AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                       {_RP_DIST}, c.vec_id) AS r
            FROM proj q JOIN proj c
              ON q.vec_id < 10 AND c.vec_id != q.vec_id)
        WHERE r <= 10)
    SELECT e.query_id,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_overlap,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
    FROM exact e LEFT JOIN approx a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id ORDER BY e.query_id
"""

ORACLES["media_audio_silence"] = """
    WITH ascii_docs AS (
        -- ASCII projection mirrors the Spark side: 1 char == 1 byte.
        SELECT doc_id,
               regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g') AS text
        FROM documents),
    meta AS (
        SELECT doc_id, text,
               CAST(CEIL(strlen(text) / 64.0) AS BIGINT) AS nc
        FROM ascii_docs WHERE strlen(text) > 0),
    chunks AS (
        SELECT doc_id, nc, c, substr(text, c * 64 + 1, 64) AS ck
        FROM meta CROSS JOIN range(0, 1024) t(c)
        WHERE c < nc),
    scored AS (
        SELECT doc_id, c,
               4 * (strlen(ck) - strlen(replace(ck, ' ', '')))
                   >= strlen(ck) AS silent
        FROM chunks),
    runs AS (
        SELECT doc_id,
               c - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c)
                   AS grp
        FROM scored WHERE silent),
    runlen AS (
        SELECT doc_id, COUNT(*) AS rl FROM runs GROUP BY doc_id, grp),
    longest AS (
        SELECT doc_id, MAX(rl) AS longest_run FROM runlen GROUP BY doc_id),
    per_doc AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN silent THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_silent
        FROM scored GROUP BY doc_id)
    SELECT p.doc_id, p.n_chunks, p.n_silent,
           CAST(COALESCE(l.longest_run, 0) AS BIGINT) AS longest_run,
           CAST(p.n_silent AS DOUBLE) / CAST(p.n_chunks AS DOUBLE)
               AS silence_rate
    FROM per_doc p LEFT JOIN longest l ON p.doc_id = l.doc_id
    ORDER BY p.doc_id
"""

_ENT_ALPHA = ", ".join(
    "' '" if c == " " else f"'{c}'"
    for c in "abcdefghijklmnopqrstuvwxyz0123456789 "
)
ORACLES["char_entropy_docs"] = f"""
    WITH ca AS (SELECT doc_id, {_NORM} AS t FROM documents),
    base AS (
        SELECT doc_id, CAST(length(t) AS BIGINT) AS L,
               [CAST(length(t) - length(replace(t, c, '')) AS BIGINT)
                FOR c IN [{_ENT_ALPHA}]] AS arr
        FROM ca WHERE length(t) > 0),
    calc AS (
        SELECT doc_id, L, arr,
               CAST(list_sum(arr) AS BIGINT) AS counted,
               CAST(list_sum(
                   [CASE WHEN n > 0
                         THEN CAST(FLOOR(CAST(n AS DOUBLE)
                                         * ln(CAST(n AS DOUBLE)) * 1e6)
                              AS BIGINT)
                         ELSE 0 END FOR n IN arr]) AS BIGINT) AS s_counted
        FROM base)
    SELECT doc_id, L AS n_chars,
           CAST(len(list_filter(arr, n -> n > 0))
                + CASE WHEN L - counted > 0 THEN 1 ELSE 0 END AS INT)
               AS n_distinct_symbols,
           FLOOR((ln(CAST(L AS DOUBLE))
                  - CAST(s_counted
                         + CASE WHEN L - counted > 0
                                THEN CAST(FLOOR(CAST(L - counted AS DOUBLE)
                                          * ln(CAST(L - counted AS DOUBLE))
                                          * 1e6) AS BIGINT)
                                ELSE 0 END AS DOUBLE)
                    / (CAST(L AS DOUBLE) * 1e6)) * 1e9) / 1e9
               AS entropy_nats
    FROM calc ORDER BY doc_id
"""

ORACLES["bucket_label_ari"] = """
    WITH coded AS (
        SELECT label AS lbl,
               CAST((SELECT SUM(CASE WHEN
                   list_sum(
                       [CAST(floor(CASE WHEN substr(md5(p::VARCHAR || '|' || j::VARCHAR), 1, 1) >= '8'
                                  THEN 1.0 ELSE -1.0 END
                             * CAST(embedding[j] AS DOUBLE) * 1e12) AS BIGINT)
                        FOR j IN range(1, len(embedding) + 1)]) >= 0
                   THEN (1 << p) ELSE 0 END) FROM range(8) t(p)) AS INT) AS code
        FROM embeddings),
    cells AS (
        SELECT code, lbl, CAST(COUNT(*) AS BIGINT) AS nij
        FROM coded GROUP BY 1, 2),
    idx AS (
        SELECT CAST(SUM((nij * (nij - 1)) // 2) AS BIGINT) AS index_pairs,
               CAST(SUM(nij) AS BIGINT) AS n_vectors,
               CAST(COUNT(DISTINCT code) AS BIGINT) AS n_codes,
               CAST(COUNT(DISTINCT lbl) AS BIGINT) AS n_labels
        FROM cells),
    ma AS (
        SELECT CAST(SUM((ni * (ni - 1)) // 2) AS BIGINT) AS a FROM (
            SELECT SUM(nij) AS ni FROM cells GROUP BY code)),
    mb AS (
        SELECT CAST(SUM((nj * (nj - 1)) // 2) AS BIGINT) AS b FROM (
            SELECT SUM(nij) AS nj FROM cells GROUP BY lbl))
    SELECT n_vectors, n_codes, n_labels, index_pairs,
           CAST(a * b AS DOUBLE)
               / CAST((n_vectors * (n_vectors - 1)) // 2 AS DOUBLE)
               AS expected_pairs,
           CAST(2 * index_pairs * ((n_vectors * (n_vectors - 1)) // 2)
                - 2 * a * b AS DOUBLE)
               / CAST((a + b) * ((n_vectors * (n_vectors - 1)) // 2)
                      - 2 * a * b AS DOUBLE) AS ari
    FROM idx, ma, mb
"""

ORACLES["dedup_winnowing"] = f"""
    WITH wtk AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    wg AS (
        SELECT doc_id, i - 1 AS pos,
               md5(array_to_string(toks[i:i+3], ' ')) AS gh,
               greatest(len(toks) - 3, 1) AS n_grams
        FROM wtk CROSS JOIN range(1, 4096) t(i)
        WHERE i <= greatest(len(toks) - 3, 1)),
    wwin AS (
        SELECT doc_id, pos, n_grams,
               MIN(gh) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
                   AS wmin
        FROM wg),
    wfps AS (
        SELECT DISTINCT doc_id, wmin AS fp
        FROM wwin WHERE pos <= n_grams - 4),
    wdfc AS (SELECT fp, COUNT(*) AS df FROM wfps GROUP BY 1),
    widx AS (SELECT f.doc_id, f.fp FROM wfps f JOIN wdfc USING (fp)
             WHERE df <= 64)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM widx a JOIN widx b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING COUNT(*) >= 3
    ORDER BY doc_a, doc_b
"""

ORACLES["topk_coverage_curve"] = f"""
    WITH cterms AS (
        SELECT UNNEST({_TOKS}) AS term FROM documents),
    ccounts AS (
        SELECT term, COUNT(*) AS n FROM cterms
        WHERE term != '' GROUP BY 1),
    ctotal AS (
        SELECT CAST(SUM(n) AS BIGINT) AS total_tokens,
               CAST(COUNT(*) AS BIGINT) AS vocab_size
        FROM ccounts),
    ctop AS (
        SELECT n FROM ccounts ORDER BY n DESC, term LIMIT 10000),
    cranked AS (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC) AS rn,
               SUM(n) OVER (ORDER BY n DESC ROWS BETWEEN UNBOUNDED
                            PRECEDING AND CURRENT ROW) AS cum
        FROM ctop),
    cks AS (SELECT UNNEST([10, 100, 1000, 10000]) AS k)
    SELECT CAST(k AS INT) AS k,
           CAST(MAX(rn) AS BIGINT) AS ranks_used,
           CAST(MAX(cum) AS BIGINT) AS covered_tokens,
           total_tokens,
           CAST(MAX(cum) AS DOUBLE) / CAST(total_tokens AS DOUBLE)
               AS coverage
    FROM cranked CROSS JOIN cks CROSS JOIN ctotal
    WHERE rn <= k
    GROUP BY k, total_tokens ORDER BY k
"""

ORACLES["dot_cosine_rank_corr"] = f"""
    WITH {_VNORM},
    qset AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn
             FROM v WHERE vec_id < 10),
    rscored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               {_PAIR_COS.format(a='q.qv', b='c.embedding', na='1.0', nb='1.0')} AS dot,
               {_PAIR_COS.format(a='q.qv', b='c.embedding', na='q.qn', nb='c.nrm')} AS cosine
        FROM qset q JOIN v c ON c.vec_id != q.query_id),
    rranked AS (
        SELECT query_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY dot DESC, neighbor_id)
               - ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS d
        FROM rscored),
    ragg AS (
        SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(d AS BIGINT) * d) AS BIGINT) AS sd2
        FROM rranked GROUP BY query_id)
    SELECT query_id, n,
           1.0 - (6.0 * CAST(sd2 AS DOUBLE))
                 / (CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0))
               AS spearman_rho
    FROM ragg ORDER BY query_id
"""

ORACLES["burrows_delta"] = f"""
    WITH bterms AS (
        SELECT source AS grp, UNNEST({_TOKS}) AS term FROM documents),
    bg AS (
        SELECT grp, term, COUNT(*) AS cnt FROM bterms
        WHERE term != '' GROUP BY 1, 2),
    btot AS (SELECT grp, SUM(cnt) AS tok FROM bg GROUP BY 1),
    btop AS (
        SELECT term FROM (
            SELECT term, SUM(cnt) AS tot FROM bg GROUP BY 1
            ORDER BY tot DESC, term LIMIT 20)),
    bgrid AS (SELECT grp, tok, term FROM btot CROSS JOIN btop),
    brates AS (
        SELECT g.grp, g.term,
               (COALESCE(c.cnt, 0) * CAST(1000000 AS BIGINT)) // g.tok AS r
        FROM bgrid g LEFT JOIN bg c ON g.grp = c.grp AND g.term = c.term),
    bstats AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(r) AS BIGINT) AS s,
               SUM(CAST(r AS HUGEINT) * r) AS ss
        FROM brates GROUP BY 1),
    bz AS (
        SELECT r.grp, r.term,
               CAST(st.n * r.r - st.s AS DOUBLE)
               / SQRT(CAST(st.n AS DOUBLE) * CAST(st.ss AS DOUBLE)
                      - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE)) AS z
        FROM brates r JOIN bstats st ON r.term = st.term),
    bpairs AS (
        SELECT a.grp AS source_a, b.grp AS source_b,
               CAST(FLOOR(abs(a.z - b.z) * 1e9) AS BIGINT) AS qd
        FROM bz a JOIN bz b ON a.term = b.term AND a.grp < b.grp)
    SELECT source_a, source_b,
           CAST(SUM(qd) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1e9)
               AS delta
    FROM bpairs GROUP BY 1, 2 ORDER BY source_a, source_b
"""

ORACLES["embed_isotropy"] = """
    WITH dims AS (
        SELECT vec_id, label, CAST(gs - 1 AS INT) AS dim,
               CAST(embedding[CAST(gs AS INT)] AS DOUBLE) AS x
        FROM embeddings CROSS JOIN generate_series(1, 64) AS t(gs)),
    norms AS (
        SELECT vec_id,
               CAST(SUM(CAST(FLOOR(x * x * 1e12) AS BIGINT)) AS BIGINT) AS qsq
        FROM dims GROUP BY 1),
    units AS (
        SELECT d.label, d.dim,
               CAST(FLOOR(d.x / sqrt(CAST(n.qsq AS DOUBLE) / 1e12) * 1e9)
                    AS BIGINT) AS qu
        FROM dims d JOIN norms n USING (vec_id)),
    perdim AS (
        SELECT label, dim, CAST(SUM(qu) AS BIGINT) AS sq
        FROM units GROUP BY 1, 2),
    perlab AS (
        SELECT label,
               CAST(SUM(CAST(FLOOR((CAST(sq AS DOUBLE) / 1e9)
                                   * (CAST(sq AS DOUBLE) / 1e9)
                                   * 1e6) AS BIGINT)) AS BIGINT) AS s
        FROM perdim GROUP BY 1),
    tot AS (
        SELECT -1 AS label,
               CAST(SUM(CAST(FLOOR((CAST(st AS DOUBLE) / 1e9)
                                   * (CAST(st AS DOUBLE) / 1e9)
                                   * 1e6) AS BIGINT)) AS BIGINT) AS s
        FROM (SELECT dim, CAST(SUM(sq) AS BIGINT) AS st
              FROM perdim GROUP BY 1)),
    allrows AS (SELECT * FROM perlab UNION ALL SELECT * FROM tot),
    counts AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM embeddings GROUP BY 1
        UNION ALL
        SELECT -1 AS label, CAST(COUNT(*) AS BIGINT) AS n FROM embeddings)
    SELECT a.label, c.n,
           (CAST(s AS DOUBLE) / 1e6)
               / (CAST(c.n AS DOUBLE) * CAST(c.n AS DOUBLE)) AS isotropy,
           (CAST(s AS DOUBLE) / 1e6 - CAST(c.n AS DOUBLE))
               / (CAST(c.n AS DOUBLE) * (CAST(c.n AS DOUBLE) - 1.0))
               AS mean_pair_cos
    FROM allrows a JOIN counts c USING (label) ORDER BY a.label
"""

ORACLES["mattr_diversity"] = """
    WITH per_doc AS (
        SELECT source AS grp,
               CAST(FLOOR(1e9
                   * CAST(list_sum(list_transform(
                         generate_series(1,
                             len(string_split_regex(trim(text), '\\s+'))
                             - least(50, len(string_split_regex(trim(text),
                                                                '\\s+'))) + 1),
                         i -> len(list_distinct(
                             string_split_regex(trim(text), '\\s+')[
                                 i:i + least(50, len(string_split_regex(
                                     trim(text), '\\s+'))) - 1]))))
                     AS DOUBLE)
                   / CAST((len(string_split_regex(trim(text), '\\s+'))
                           - least(50, len(string_split_regex(trim(text),
                                                              '\\s+'))) + 1)
                          * least(50, len(string_split_regex(trim(text),
                                                             '\\s+')))
                          AS DOUBLE)) AS BIGINT) AS qm
        FROM documents)
    SELECT grp AS source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(CAST(SUM(qm) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 1e9 AS mean_mattr,
           CAST(MIN(qm) AS DOUBLE) / 1e9 AS min_mattr,
           CAST(MAX(qm) AS DOUBLE) / 1e9 AS max_mattr
    FROM per_doc GROUP BY 1 ORDER BY 1
"""


ORACLES["knn_margin"] = f"""
    WITH {_VNORM},
    coded AS (
        SELECT vec_id, label, embedding, nrm,
               CAST((SELECT SUM(CASE WHEN
                   list_sum(
                       [CAST(floor(CASE WHEN substr(md5(p::VARCHAR || '|' || j::VARCHAR), 1, 1) >= '8'
                                  THEN 1.0 ELSE -1.0 END
                             * CAST(embedding[j] AS DOUBLE) * 1e12) AS BIGINT)
                        FOR j IN range(1, len(embedding) + 1)]) >= 0
                   THEN (1 << p) ELSE 0 END) FROM range(8) t(p)) AS INT) AS code
        FROM v),
    pairs AS (
        SELECT a.vec_id AS vec_id_a, a.label AS la, b.label AS lb,
               {_PAIR_COS.format(a='a.embedding', b='b.embedding', na='a.nrm', nb='b.nrm')} AS cosine
        FROM coded a JOIN coded b
          ON a.code = b.code AND a.vec_id != b.vec_id),
    per_anchor AS (
        SELECT vec_id_a, la,
               MAX(CASE WHEN lb = la THEN cosine END) AS best_same,
               MAX(CASE WHEN lb != la THEN cosine END) AS best_other
        FROM pairs GROUP BY 1, 2),
    mboth AS (
        SELECT la,
               CAST(FLOOR((best_same - best_other) * 1e9) AS BIGINT) AS qm
        FROM per_anchor
        WHERE best_same IS NOT NULL AND best_other IS NOT NULL)
    SELECT la AS label,
           CAST(COUNT(*) AS BIGINT) AS n_anchors,
           CAST(CAST(SUM(qm) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 1e9 AS mean_margin,
           CAST(SUM(CASE WHEN qm < 0 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS violation_rate
    FROM mboth GROUP BY 1 ORDER BY 1
"""

ORACLES["char_trigram_logprob"] = f"""
    WITH tris AS (
        SELECT doc_id,
               UNNEST(list_transform(
                   generate_series(1, greatest(length({_NORM}) - 2, 1)),
                   i -> substr({_NORM}, CAST(i AS INT), 3))) AS tri
        FROM documents),
    lm AS (
        SELECT tri, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total
        FROM tris GROUP BY 1),
    qlm AS (
        SELECT tri,
               CAST(FLOOR(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
                          * 1e6) AS BIGINT) AS qlp
        FROM lm)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tris,
           CAST(CAST(SUM(qlp) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 1e6 AS mean_logprob
    FROM tris JOIN qlm USING (tri) GROUP BY 1 ORDER BY doc_id
"""

ORACLES["media_loudness"] = """
    WITH ascii_docs AS (
        SELECT doc_id,
               regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g') AS text
        FROM documents),
    meta AS (
        SELECT doc_id, text,
               CAST(CEIL(strlen(text) / 64.0) AS BIGINT) AS nc
        FROM ascii_docs WHERE strlen(text) > 0),
    chunks AS (
        SELECT doc_id, nc, c, substr(text, c * 64 + 1, 64) AS ck
        FROM meta CROSS JOIN range(0, 1024) t(c)
        WHERE c < nc),
    scored AS (
        SELECT doc_id,
               CAST(FLOOR(sqrt(
                   CAST(list_sum([ascii(substr(ck, CAST(i AS INT), 1))
                                  * ascii(substr(ck, CAST(i AS INT), 1))
                                  FOR i IN generate_series(1, strlen(ck))])
                        AS DOUBLE)
                   / CAST(strlen(ck) AS DOUBLE)) * 1e6) AS BIGINT) AS qrms,
               CAST(list_sum([CASE WHEN ascii(substr(ck, CAST(i AS INT), 1))
                                        >= 120 THEN 1 ELSE 0 END
                              FOR i IN generate_series(1, strlen(ck))])
                    AS BIGINT) AS clip,
               CAST(strlen(ck) AS BIGINT) AS blen
        FROM chunks)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(CAST(SUM(qrms) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 1e6 AS mean_rms,
           CAST(MAX(qrms) AS DOUBLE) / 1e6 AS peak_rms,
           CAST(MAX(qrms) - MIN(qrms) AS DOUBLE) / 1e6 AS dyn_range,
           CAST(CAST(SUM(clip) AS BIGINT) AS DOUBLE)
               / CAST(CAST(SUM(blen) AS BIGINT) AS DOUBLE) AS clip_rate
    FROM scored GROUP BY 1 ORDER BY doc_id
"""

ORACLES["dedup_sorted_neighborhood"] = f"""
    WITH {_GRAMS_CTES},
    base AS (
        SELECT d.doc_id AS id, {_NORM} AS k, g.g AS g,
               string_split({_NORM}, ' ')[1] AS blk
        FROM documents d JOIN grams g ON d.doc_id = g.doc_id),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY blk ORDER BY k, id) AS rn
        FROM base),
    pairs AS (
        SELECT a.id AS doc_a, b.id AS doc_b, a.g AS ga, b.g AS gb
        FROM ranked a
        CROSS JOIN (SELECT UNNEST([1, 2]) AS o) t
        JOIN ranked b ON b.blk = a.blk AND b.rn = a.rn + t.o)
    SELECT doc_a, doc_b,
           CAST(len(list_intersect(ga, gb)) AS DOUBLE)
               / CAST(len(list_distinct(list_concat(ga, gb))) AS DOUBLE)
               AS jaccard
    FROM pairs
    WHERE CAST(len(list_intersect(ga, gb)) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(ga, gb))) AS DOUBLE)
          >= 0.3
    ORDER BY doc_a, doc_b
"""


ORACLES["cosine_label_pr_curve"] = f"""
    WITH {_VNORM},
    coded AS (
        SELECT vec_id, label, embedding, nrm,
               CAST((SELECT SUM(CASE WHEN
                   list_sum(
                       [CAST(floor(CASE WHEN substr(md5(p::VARCHAR || '|' || j::VARCHAR), 1, 1) >= '8'
                                  THEN 1.0 ELSE -1.0 END
                             * CAST(embedding[j] AS DOUBLE) * 1e12) AS BIGINT)
                        FOR j IN range(1, len(embedding) + 1)]) >= 0
                   THEN (1 << p) ELSE 0 END) FROM range(8) t(p)) AS INT) AS code
        FROM v),
    pairs AS (
        SELECT a.label = b.label AS same,
               {_PAIR_COS.format(a='a.embedding', b='b.embedding', na='a.nrm', nb='b.nrm')} AS cosine
        FROM coded a JOIN coded b
          ON a.code = b.code AND a.vec_id < b.vec_id),
    scored AS (
        SELECT same, cosine, t.threshold
        FROM pairs CROSS JOIN
             (SELECT UNNEST([0.5e0, 0.6e0, 0.7e0, 0.8e0, 0.9e0])
                  AS threshold) t),
    agg AS (
        SELECT threshold,
               CAST(SUM(CASE WHEN same AND cosine >= threshold
                             THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN NOT same AND cosine >= threshold
                             THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN same AND cosine < threshold
                             THEN 1 ELSE 0 END) AS BIGINT) AS fn
        FROM scored GROUP BY 1)
    SELECT threshold, tp, fp, fn,
           CASE WHEN tp + fp > 0
                THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
                ELSE 0.0e0 END AS precision,
           CASE WHEN tp + fn > 0
                THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
                ELSE 0.0e0 END AS recall,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)
                ELSE 0.0e0 END AS f1
    FROM agg ORDER BY threshold
"""

ORACLES["term_burstiness"] = f"""
    WITH toks AS (
        SELECT doc_id, UNNEST({_TOKS}) AS tok FROM documents),
    agg AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM toks WHERE tok != '' GROUP BY 1)
    SELECT tok AS term, tf, df,
           CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS burstiness
    FROM agg ORDER BY tf DESC, term LIMIT 30
"""

ORACLES["media_frame_entropy"] = """
    WITH ascii_docs AS (
        SELECT doc_id,
               regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g') AS text
        FROM documents),
    meta AS (
        SELECT doc_id, text,
               CAST(CEIL(strlen(text) / 64.0) AS BIGINT) AS nc
        FROM ascii_docs WHERE strlen(text) > 0),
    chunks AS (
        SELECT doc_id, c, substr(text, c * 64 + 1, 64) AS ck
        FROM meta CROSS JOIN range(0, 1024) t(c)
        WHERE c < nc),
    chars AS (
        SELECT doc_id, c, strlen(ck) AS L,
               substr(ck, CAST(i AS INT), 1) AS ch
        FROM chunks CROSS JOIN generate_series(1, 64) t(i)
        WHERE i <= strlen(ck)),
    counts AS (
        SELECT doc_id, c, L, ch, CAST(COUNT(*) AS BIGINT) AS n
        FROM chars GROUP BY 1, 2, 3, 4),
    perframe AS (
        SELECT doc_id, c, L,
               CAST(SUM(CASE WHEN n > 1
                   THEN CAST(FLOOR(CAST(n AS DOUBLE)
                                   * ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS s
        FROM counts GROUP BY 1, 2, 3),
    qh AS (
        SELECT doc_id,
               CAST(FLOOR((ln(CAST(L AS DOUBLE))
                           - CAST(s AS DOUBLE) / CAST(L AS DOUBLE) / 1e6)
                          * 1e6) AS BIGINT) AS q
        FROM perframe)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(CAST(SUM(q) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 1e6 AS mean_entropy,
           CAST(MIN(q) AS DOUBLE) / 1e6 AS min_entropy,
           CAST(SUM(CASE WHEN q < 3000000 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS low_entropy_share
    FROM qh GROUP BY 1 ORDER BY doc_id
"""

ORACLES["dup_transitivity_audit"] = f"""
    WITH {_GRAMS_CTES},
    e0 AS (SELECT doc_id, UNNEST(g) AS gram FROM grams),
    rare AS (SELECT doc_id, gram FROM (
        SELECT doc_id, gram, COUNT(*) OVER (PARTITION BY gram) AS df
        FROM e0) WHERE df <= 64),
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM rare a JOIN rare b
          ON a.gram = b.gram AND a.doc_id < b.doc_id),
    verify AS (
        SELECT c.doc_a, c.doc_b,
               len(list_intersect(ga.g, gb.g)) AS inter,
               len(ga.g) AS la, len(gb.g) AS lb
        FROM cands c
        JOIN grams ga ON c.doc_a = ga.doc_id
        JOIN grams gb ON c.doc_b = gb.doc_id),
    pairs AS (
        SELECT doc_a, doc_b FROM verify
        WHERE inter / (la + lb - inter) >= 0.3),
    edges AS (
        SELECT doc_a AS s, doc_b AS t FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
    wedges AS (
        SELECT w1.s AS a, w1.t AS m, w2.t AS c
        FROM edges w1 JOIN edges w2 ON w1.t = w2.s
        WHERE w1.s < w2.t),
    closed AS (
        SELECT w.* FROM wedges w
        WHERE EXISTS (SELECT 1 FROM pairs p
                      WHERE p.doc_a = w.a AND p.doc_b = w.c)),
    agg AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_pairs,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM wedges) AS n_wedges,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM closed) AS n_closed)
    SELECT n_pairs, n_wedges, n_closed,
           CASE WHEN n_wedges > 0
                THEN CAST(n_closed AS DOUBLE) / CAST(n_wedges AS DOUBLE)
                ELSE 0.0e0 END AS closure_rate
    FROM agg
"""

ORACLES["quantization_sweep"] = """
    WITH dims AS (
        SELECT vec_id AS vid,
               CAST(embedding[CAST(gs AS INT)] AS DOUBLE) AS x
        FROM embeddings CROSS JOIN generate_series(1, 64) t(gs)),
    fan AS (
        SELECT vid, x, b.bits
        FROM dims CROSS JOIN (SELECT UNNEST([1, 2, 4, 8]) AS bits) b),
    recon AS (
        SELECT vid, bits, x,
               -0.75e0 + (LEAST(pow(2.0e0, CAST(bits AS DOUBLE)) - 1.0e0,
                                GREATEST(0.0e0,
                                    FLOOR((x + 0.75e0)
                                        / (1.5e0 / pow(2.0e0,
                                               CAST(bits AS DOUBLE))))))
                          + 0.5e0)
                   * (1.5e0 / pow(2.0e0, CAST(bits AS DOUBLE))) AS r
        FROM fan),
    scored AS (
        SELECT vid, bits,
               CAST(FLOOR((x - r) * (x - r) * 1e12) AS BIGINT) AS qerr,
               CAST(FLOOR(x * r * 1e12) AS BIGINT) AS qdot,
               CAST(FLOOR(x * x * 1e12) AS BIGINT) AS qxx,
               CAST(FLOOR(r * r * 1e12) AS BIGINT) AS qrr
        FROM recon),
    per_vec AS (
        SELECT bits, vid,
               CAST(COUNT(*) AS BIGINT) AS d,
               CAST(SUM(qerr) AS BIGINT) AS se,
               CAST(SUM(qdot) AS BIGINT) AS sd,
               CAST(SUM(qxx) AS BIGINT) AS sx,
               CAST(SUM(qrr) AS BIGINT) AS sr
        FROM scored GROUP BY 1, 2),
    qc AS (
        SELECT bits, d, se,
               CAST(FLOOR(CAST(sd AS DOUBLE)
                          / (sqrt(CAST(sx AS DOUBLE))
                             * sqrt(CAST(sr AS DOUBLE))) * 1e9) AS BIGINT)
                   AS qcv
        FROM per_vec),
    agg AS (
        SELECT bits, CAST(COUNT(*) AS BIGINT) AS n_vectors,
               CAST(SUM(se) AS BIGINT) AS sse,
               CAST(SUM(d) AS BIGINT) AS nd,
               CAST(SUM(qcv) AS BIGINT) AS sqc
        FROM qc GROUP BY 1)
    SELECT CAST(bits AS INT) AS bits, n_vectors,
           sqrt(CAST(sse AS DOUBLE) / CAST(nd AS DOUBLE) / 1e12) AS rmse,
           CAST(sqc AS DOUBLE) / CAST(n_vectors AS DOUBLE) / 1e9
               AS mean_cosine
    FROM agg ORDER BY bits
"""

ORACLES["source_coherence"] = f"""
    WITH toks AS (
        SELECT source AS src, doc_id AS id, UNNEST({_TOKS}) AS tok
        FROM documents),
    toks2 AS (SELECT * FROM toks WHERE tok != ''),
    tfs AS (
        SELECT src, id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks2 GROUP BY 1, 2, 3),
    st AS (
        SELECT src, tok, CAST(COUNT(*) AS BIGINT) AS stf
        FROM toks2 GROUP BY 1, 2),
    tot AS (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS T FROM toks2 GROUP BY 1),
    w AS (
        SELECT st.src, st.tok,
               CAST(FLOOR(CAST(stf AS DOUBLE) / CAST(T AS DOUBLE) * 1e9)
                    AS BIGINT) AS qw,
               CAST(FLOOR((CAST(stf AS DOUBLE) / CAST(T AS DOUBLE))
                          * (CAST(stf AS DOUBLE) / CAST(T AS DOUBLE))
                          * 1e12) AS BIGINT) AS qw2
        FROM st JOIN tot ON st.src = tot.src),
    cnorm AS (
        SELECT src, CAST(SUM(qw2) AS BIGINT) AS cn2 FROM w GROUP BY 1),
    per_doc AS (
        SELECT t.src, t.id,
               CAST(SUM(t.tf * w.qw) AS BIGINT) AS sd,
               CAST(SUM(t.tf * t.tf) AS BIGINT) AS dn2
        FROM tfs t JOIN w ON t.src = w.src AND t.tok = w.tok
        GROUP BY 1, 2),
    scored AS (
        SELECT p.src,
               CAST(FLOOR(
                   (CAST(sd AS DOUBLE) / 1e9)
                   / (sqrt(CAST(dn2 AS DOUBLE))
                      * sqrt(CAST(cn2 AS DOUBLE) / 1e12)) * 1e9) AS BIGINT)
                   AS qc
        FROM per_doc p JOIN cnorm c ON p.src = c.src)
    SELECT src AS source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(CAST(SUM(qc) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 1e9 AS mean_cosine,
           CAST(MIN(qc) AS DOUBLE) / 1e9 AS min_cosine,
           CAST(SUM(CASE WHEN qc < 500000000 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS low_share
    FROM scored GROUP BY 1 ORDER BY source
"""

ORACLES["norm_quality_deciles"] = f"""
    WITH {_VNORM},
    deciled AS (
        SELECT vec_id, label, nrm,
               NTILE(10) OVER (ORDER BY nrm, vec_id) AS decile
        FROM v),
    cells AS (
        SELECT decile, label, CAST(COUNT(*) AS BIGINT) AS n
        FROM deciled GROUP BY 1, 2),
    wc AS (
        SELECT *,
               CAST(SUM(n) OVER (PARTITION BY decile) AS BIGINT) AS tot
        FROM cells),
    q AS (
        SELECT decile, n, tot,
               CAST(FLOOR(ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
                          * 1e6) AS BIGINT) AS qlp
        FROM wc),
    mean_norm AS (
        SELECT decile,
               CAST(CAST(SUM(CAST(FLOOR(nrm * 1e9) AS BIGINT)) AS BIGINT)
                    AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) / 1e9 AS mean_norm
        FROM deciled GROUP BY 1),
    agg AS (
        SELECT decile,
               CAST(MAX(tot) AS BIGINT) AS n_vectors,
               CAST(COUNT(*) AS BIGINT) AS n_labels,
               CAST(SUM(n * qlp) AS BIGINT) AS sum_nqlp
        FROM q GROUP BY 1)
    SELECT CAST(a.decile AS INT) AS decile, n_vectors, mean_norm, n_labels,
           -CAST(sum_nqlp AS DOUBLE) / CAST(n_vectors AS DOUBLE) / 1e6
               AS label_entropy
    FROM agg a JOIN mean_norm m ON a.decile = m.decile
    ORDER BY decile
"""

ORACLES["media_dup_factor"] = """
    WITH ascii_docs AS (
        SELECT doc_id,
               regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g') AS text
        FROM documents),
    meta AS (
        SELECT doc_id, text, strlen(text) AS bl,
               strlen(text) % 7 + 1 AS n,
               strlen(text) // (strlen(text) % 7 + 1) AS flen
        FROM ascii_docs),
    frames AS (
        SELECT doc_id,
               md5(substr(text, CAST(i * flen + 1 AS INT),
                          CAST(flen AS INT))) AS frame_hash
        FROM meta CROSS JOIN range(0, 8) t(i)
        WHERE i < n),
    agg AS (
        SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_media,
               CAST(COUNT(*) AS BIGINT) AS total_frames,
               CAST(COUNT(DISTINCT frame_hash) AS BIGINT) AS distinct_frames
        FROM frames)
    SELECT n_media, total_frames, distinct_frames,
           CAST(total_frames AS DOUBLE) / CAST(distinct_frames AS DOUBLE)
               AS dup_factor,
           CAST(total_frames - distinct_frames AS DOUBLE)
               / CAST(total_frames AS DOUBLE) AS storage_savings
    FROM agg
"""

ORACLES["yule_k"] = f"""
    WITH terms AS (
        SELECT source, UNNEST(string_split({_NORM}, ' ')) AS term
        FROM documents),
    counts AS (
        SELECT source, term, COUNT(*) AS n FROM terms
        WHERE term != '' GROUP BY 1, 2),
    moments AS (
        SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS vocab_size,
               CAST(SUM(CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)
                   AS sum_freq_sq
        FROM counts GROUP BY 1)
    SELECT source, n_tokens, vocab_size, sum_freq_sq,
           1e4 * (CAST(sum_freq_sq AS DOUBLE) - CAST(n_tokens AS DOUBLE))
               / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
               AS yule_k
    FROM moments ORDER BY source
"""

ORACLES["knn_hubness"] = f"""
    WITH {_VNORM},
    sample AS (SELECT vec_id, embedding, nrm FROM v WHERE vec_id < 200),
    q AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn
          FROM sample),
    pairs AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               {_PAIR_COS.format(a='q.qv', b='c.embedding', na='q.qn', nb='c.nrm')} AS cosine
        FROM q JOIN sample c ON c.vec_id != q.query_id),
    topk AS (
        SELECT neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
            ) AS rank FROM pairs)
        WHERE rank <= 5),
    indeg AS (
        SELECT neighbor_id, CAST(COUNT(*) AS BIGINT) AS in_degree
        FROM topk GROUP BY 1),
    degrees AS (
        SELECT COALESCE(i.in_degree, 0) AS in_degree
        FROM sample s LEFT JOIN indeg i ON s.vec_id = i.neighbor_id)
    SELECT in_degree, CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM degrees GROUP BY 1 ORDER BY in_degree
"""

ORACLES["media_format_sniff"] = """
    WITH classed AS (
        SELECT CASE
                 WHEN substring(text, 1, 1) IN ('a','e','i','o','u')
                     THEN 'audio-like'
                 WHEN regexp_matches(substring(text, 1, 1), '^[0-9]$')
                     THEN 'image-like'
                 WHEN regexp_matches(substring(text, 1, 1), '^[a-z]$')
                     THEN 'video-like'
                 WHEN regexp_matches(substring(text, 1, 1), '^[A-Z]$')
                     THEN 'doc-like'
                 ELSE 'unknown' END AS format_class,
               octet_length(encode(text)) AS nbytes
        FROM documents),
    agg AS (
        SELECT format_class, CAST(COUNT(*) AS BIGINT) AS n_assets,
               CAST(SUM(nbytes) AS BIGINT) AS total_bytes
        FROM classed GROUP BY 1)
    SELECT format_class, n_assets, total_bytes,
           CAST(n_assets AS DOUBLE) / CAST(SUM(n_assets) OVER () AS DOUBLE)
               AS asset_share
    FROM agg ORDER BY format_class
"""

def _prefix_dot(a: str, b: str, d: int) -> str:
    return (
        "(CAST(list_sum([CAST(floor(CAST("
        + a
        + "[i] AS DOUBLE) * CAST("
        + b
        + f"[i] AS DOUBLE) * 1e12) AS BIGINT) FOR i IN range(1, {d + 1})])"
        " AS DOUBLE) / 1e12)"
    )


def _dc_arm(d: int) -> str:
    dist = (
        f"(1.0 - {_prefix_dot('a.v', 'b.v', d)}"
        f" / (sqrt({_prefix_dot('a.v', 'a.v', d)})"
        f" * sqrt({_prefix_dot('b.v', 'b.v', d)})))"
    )
    return (
        f"SELECT {d} AS dim,"
        f" CAST(FLOOR({dist} * 1e9) AS BIGINT) AS dq"
        " FROM sample a JOIN sample b ON a.vid < b.vid"
    )


ORACLES["distance_concentration"] = f"""
    WITH sample AS (
        SELECT vec_id AS vid, embedding AS v FROM embeddings
        WHERE vec_id < 200),
    per_dim AS (
        {_dc_arm(8)} UNION ALL {_dc_arm(16)}
        UNION ALL {_dc_arm(32)} UNION ALL {_dc_arm(64)}),
    mom AS (
        SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               SUM(dq) AS sx,
               SUM(CAST(dq AS DECIMAL(38,0)) * dq) AS sxx
        FROM per_dim GROUP BY 1)
    SELECT dim, n_pairs,
           CAST(sx AS DOUBLE) / 1e9 / CAST(n_pairs AS DOUBLE) AS mean_dist,
           SQRT(GREATEST(CAST(n_pairs AS DOUBLE)
                         * (CAST(sxx AS DOUBLE) / 1e18)
                         - (CAST(sx AS DOUBLE) / 1e9)
                           * (CAST(sx AS DOUBLE) / 1e9), 0.0))
               / CAST(n_pairs AS DOUBLE) AS std_dist,
           (SQRT(GREATEST(CAST(n_pairs AS DOUBLE)
                          * (CAST(sxx AS DOUBLE) / 1e18)
                          - (CAST(sx AS DOUBLE) / 1e9)
                            * (CAST(sx AS DOUBLE) / 1e9), 0.0))
            / CAST(n_pairs AS DOUBLE))
           / (CAST(sx AS DOUBLE) / 1e9 / CAST(n_pairs AS DOUBLE)) AS cv
    FROM mom ORDER BY dim
"""

ORACLES["casing_profile"] = """
    WITH toks AS (
        SELECT source,
               UNNEST(string_split(regexp_replace(trim(text), '\\s+', ' ',
                                                  'g'), ' ')) AS tok
        FROM documents)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(count_if(regexp_matches(tok, '^[A-Z]{2,}$')) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS upper_share,
           CAST(count_if(regexp_matches(tok, '^[A-Z][a-z]+$')) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS title_share,
           CAST(count_if(regexp_matches(tok, '^[0-9]+$')) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS digit_share
    FROM toks WHERE tok != '' GROUP BY 1 ORDER BY source
"""

ORACLES["payload_compression_probe"] = """
    WITH blocks AS (
        SELECT doc_id, source,
               substring(text, 1 + 8 * i, 8) AS blk
        FROM documents
        CROSS JOIN UNNEST(range(0, CAST(FLOOR((n_chars - 8) / 8) AS INT)
                                 + 1))
            AS t(i)
        WHERE length(substring(text, 1 + 8 * i, 8)) = 8),
    per_doc AS (
        SELECT doc_id, source,
               CAST(COUNT(*) AS BIGINT) AS n_blocks,
               CAST(COUNT(DISTINCT blk) AS BIGINT) AS n_unique
        FROM blocks GROUP BY 1, 2),
    q AS (
        SELECT source,
               CAST(FLOOR(CAST(n_unique AS DOUBLE)
                          / CAST(n_blocks AS DOUBLE) * 1e9) AS BIGINT) AS rq
        FROM per_doc)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(rq) AS DOUBLE) / 1e9 / CAST(COUNT(*) AS DOUBLE)
               AS mean_unique_ratio,
           CAST(count_if(rq < 500000000) AS BIGINT) AS n_dup_heavy
    FROM q GROUP BY 1 ORDER BY source
"""


def _shingle_arm(n: int) -> str:
    return f"""
        SELECT {n} AS shingle_width, CAST(SUM(cnt) AS BIGINT) AS n_shingles,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(count_if(cnt > 1) AS BIGINT) AS n_repeated,
               CAST(count_if(cnt > 1) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS repeated_share
        FROM (
            SELECT g, COUNT(*) AS cnt FROM (
                SELECT UNNEST(
                    CASE WHEN len(t) < {n} THEN [array_to_string(t, ' ')]
                         ELSE [array_to_string(list_slice(t, i, i + {n} - 1),
                                               ' ')
                               FOR i IN range(1, len(t) - {n} + 2)]
                    END) AS g
                FROM toks)
            GROUP BY g)"""


ORACLES["shingle_stats"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents)
    {_shingle_arm(3)} UNION ALL {_shingle_arm(5)} UNION ALL {_shingle_arm(8)}
    ORDER BY shingle_width
"""


ORACLES["minhash_band_tuning"] = f"""
    WITH {{grams_ctes}},
    eg AS (SELECT doc_id, UNNEST(g) AS gram FROM grams),
    based AS (SELECT doc_id,
                     CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT)
                         & {{base_mask}} AS base
              FROM eg),
    sigs AS (SELECT doc_id, {{sig_cols}} FROM based GROUP BY doc_id)

        SELECT 16 AS n_bands, 4 AS rows_per_band,
               CAST(COUNT(*) AS BIGINT) AS n_candidates,
               CAST(count_if(hit) AS BIGINT) AS n_verified,
               CASE WHEN COUNT(*) > 0
                    THEN CAST(count_if(hit) AS DOUBLE)
                         / CAST(COUNT(*) AS DOUBLE)
                    ELSE 0.0 END AS precision
        FROM (
            SELECT (CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
                    / CAST(len(ga.g) + len(gb.g)
                           - len(list_intersect(ga.g, gb.g)) AS DOUBLE))
                       >= 0.8 AS hit
            FROM (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM (SELECT doc_id, i AS band_id, bands[i+1] AS band_hash
                      FROM (SELECT doc_id, [md5('0' || '|' || s0 || '|' || s1 || '|' || s2 || '|' || s3), md5('1' || '|' || s4 || '|' || s5 || '|' || s6 || '|' || s7), md5('2' || '|' || s8 || '|' || s9 || '|' || s10 || '|' || s11), md5('3' || '|' || s12 || '|' || s13 || '|' || s14 || '|' || s15), md5('4' || '|' || s16 || '|' || s17 || '|' || s18 || '|' || s19), md5('5' || '|' || s20 || '|' || s21 || '|' || s22 || '|' || s23), md5('6' || '|' || s24 || '|' || s25 || '|' || s26 || '|' || s27), md5('7' || '|' || s28 || '|' || s29 || '|' || s30 || '|' || s31), md5('8' || '|' || s32 || '|' || s33 || '|' || s34 || '|' || s35), md5('9' || '|' || s36 || '|' || s37 || '|' || s38 || '|' || s39), md5('10' || '|' || s40 || '|' || s41 || '|' || s42 || '|' || s43), md5('11' || '|' || s44 || '|' || s45 || '|' || s46 || '|' || s47), md5('12' || '|' || s48 || '|' || s49 || '|' || s50 || '|' || s51), md5('13' || '|' || s52 || '|' || s53 || '|' || s54 || '|' || s55), md5('14' || '|' || s56 || '|' || s57 || '|' || s58 || '|' || s59), md5('15' || '|' || s60 || '|' || s61 || '|' || s62 || '|' || s63)] AS bands
                            FROM sigs), range(16) t(i)) a
                JOIN (SELECT doc_id, i AS band_id, bands[i+1] AS band_hash
                      FROM (SELECT doc_id, [md5('0' || '|' || s0 || '|' || s1 || '|' || s2 || '|' || s3), md5('1' || '|' || s4 || '|' || s5 || '|' || s6 || '|' || s7), md5('2' || '|' || s8 || '|' || s9 || '|' || s10 || '|' || s11), md5('3' || '|' || s12 || '|' || s13 || '|' || s14 || '|' || s15), md5('4' || '|' || s16 || '|' || s17 || '|' || s18 || '|' || s19), md5('5' || '|' || s20 || '|' || s21 || '|' || s22 || '|' || s23), md5('6' || '|' || s24 || '|' || s25 || '|' || s26 || '|' || s27), md5('7' || '|' || s28 || '|' || s29 || '|' || s30 || '|' || s31), md5('8' || '|' || s32 || '|' || s33 || '|' || s34 || '|' || s35), md5('9' || '|' || s36 || '|' || s37 || '|' || s38 || '|' || s39), md5('10' || '|' || s40 || '|' || s41 || '|' || s42 || '|' || s43), md5('11' || '|' || s44 || '|' || s45 || '|' || s46 || '|' || s47), md5('12' || '|' || s48 || '|' || s49 || '|' || s50 || '|' || s51), md5('13' || '|' || s52 || '|' || s53 || '|' || s54 || '|' || s55), md5('14' || '|' || s56 || '|' || s57 || '|' || s58 || '|' || s59), md5('15' || '|' || s60 || '|' || s61 || '|' || s62 || '|' || s63)] AS bands
                            FROM sigs), range(16) t(i)) b
                  ON a.band_id = b.band_id AND a.band_hash = b.band_hash
                 AND a.doc_id < b.doc_id) c
            JOIN grams ga ON c.doc_a = ga.doc_id
            JOIN grams gb ON c.doc_b = gb.doc_id) UNION ALL 
        SELECT 8 AS n_bands, 8 AS rows_per_band,
               CAST(COUNT(*) AS BIGINT) AS n_candidates,
               CAST(count_if(hit) AS BIGINT) AS n_verified,
               CASE WHEN COUNT(*) > 0
                    THEN CAST(count_if(hit) AS DOUBLE)
                         / CAST(COUNT(*) AS DOUBLE)
                    ELSE 0.0 END AS precision
        FROM (
            SELECT (CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
                    / CAST(len(ga.g) + len(gb.g)
                           - len(list_intersect(ga.g, gb.g)) AS DOUBLE))
                       >= 0.8 AS hit
            FROM (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM (SELECT doc_id, i AS band_id, bands[i+1] AS band_hash
                      FROM (SELECT doc_id, [md5('0' || '|' || s0 || '|' || s1 || '|' || s2 || '|' || s3 || '|' || s4 || '|' || s5 || '|' || s6 || '|' || s7), md5('1' || '|' || s8 || '|' || s9 || '|' || s10 || '|' || s11 || '|' || s12 || '|' || s13 || '|' || s14 || '|' || s15), md5('2' || '|' || s16 || '|' || s17 || '|' || s18 || '|' || s19 || '|' || s20 || '|' || s21 || '|' || s22 || '|' || s23), md5('3' || '|' || s24 || '|' || s25 || '|' || s26 || '|' || s27 || '|' || s28 || '|' || s29 || '|' || s30 || '|' || s31), md5('4' || '|' || s32 || '|' || s33 || '|' || s34 || '|' || s35 || '|' || s36 || '|' || s37 || '|' || s38 || '|' || s39), md5('5' || '|' || s40 || '|' || s41 || '|' || s42 || '|' || s43 || '|' || s44 || '|' || s45 || '|' || s46 || '|' || s47), md5('6' || '|' || s48 || '|' || s49 || '|' || s50 || '|' || s51 || '|' || s52 || '|' || s53 || '|' || s54 || '|' || s55), md5('7' || '|' || s56 || '|' || s57 || '|' || s58 || '|' || s59 || '|' || s60 || '|' || s61 || '|' || s62 || '|' || s63)] AS bands
                            FROM sigs), range(8) t(i)) a
                JOIN (SELECT doc_id, i AS band_id, bands[i+1] AS band_hash
                      FROM (SELECT doc_id, [md5('0' || '|' || s0 || '|' || s1 || '|' || s2 || '|' || s3 || '|' || s4 || '|' || s5 || '|' || s6 || '|' || s7), md5('1' || '|' || s8 || '|' || s9 || '|' || s10 || '|' || s11 || '|' || s12 || '|' || s13 || '|' || s14 || '|' || s15), md5('2' || '|' || s16 || '|' || s17 || '|' || s18 || '|' || s19 || '|' || s20 || '|' || s21 || '|' || s22 || '|' || s23), md5('3' || '|' || s24 || '|' || s25 || '|' || s26 || '|' || s27 || '|' || s28 || '|' || s29 || '|' || s30 || '|' || s31), md5('4' || '|' || s32 || '|' || s33 || '|' || s34 || '|' || s35 || '|' || s36 || '|' || s37 || '|' || s38 || '|' || s39), md5('5' || '|' || s40 || '|' || s41 || '|' || s42 || '|' || s43 || '|' || s44 || '|' || s45 || '|' || s46 || '|' || s47), md5('6' || '|' || s48 || '|' || s49 || '|' || s50 || '|' || s51 || '|' || s52 || '|' || s53 || '|' || s54 || '|' || s55), md5('7' || '|' || s56 || '|' || s57 || '|' || s58 || '|' || s59 || '|' || s60 || '|' || s61 || '|' || s62 || '|' || s63)] AS bands
                            FROM sigs), range(8) t(i)) b
                  ON a.band_id = b.band_id AND a.band_hash = b.band_hash
                 AND a.doc_id < b.doc_id) c
            JOIN grams ga ON c.doc_a = ga.doc_id
            JOIN grams gb ON c.doc_b = gb.doc_id) UNION ALL 
        SELECT 4 AS n_bands, 16 AS rows_per_band,
               CAST(COUNT(*) AS BIGINT) AS n_candidates,
               CAST(count_if(hit) AS BIGINT) AS n_verified,
               CASE WHEN COUNT(*) > 0
                    THEN CAST(count_if(hit) AS DOUBLE)
                         / CAST(COUNT(*) AS DOUBLE)
                    ELSE 0.0 END AS precision
        FROM (
            SELECT (CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
                    / CAST(len(ga.g) + len(gb.g)
                           - len(list_intersect(ga.g, gb.g)) AS DOUBLE))
                       >= 0.8 AS hit
            FROM (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM (SELECT doc_id, i AS band_id, bands[i+1] AS band_hash
                      FROM (SELECT doc_id, [md5('0' || '|' || s0 || '|' || s1 || '|' || s2 || '|' || s3 || '|' || s4 || '|' || s5 || '|' || s6 || '|' || s7 || '|' || s8 || '|' || s9 || '|' || s10 || '|' || s11 || '|' || s12 || '|' || s13 || '|' || s14 || '|' || s15), md5('1' || '|' || s16 || '|' || s17 || '|' || s18 || '|' || s19 || '|' || s20 || '|' || s21 || '|' || s22 || '|' || s23 || '|' || s24 || '|' || s25 || '|' || s26 || '|' || s27 || '|' || s28 || '|' || s29 || '|' || s30 || '|' || s31), md5('2' || '|' || s32 || '|' || s33 || '|' || s34 || '|' || s35 || '|' || s36 || '|' || s37 || '|' || s38 || '|' || s39 || '|' || s40 || '|' || s41 || '|' || s42 || '|' || s43 || '|' || s44 || '|' || s45 || '|' || s46 || '|' || s47), md5('3' || '|' || s48 || '|' || s49 || '|' || s50 || '|' || s51 || '|' || s52 || '|' || s53 || '|' || s54 || '|' || s55 || '|' || s56 || '|' || s57 || '|' || s58 || '|' || s59 || '|' || s60 || '|' || s61 || '|' || s62 || '|' || s63)] AS bands
                            FROM sigs), range(4) t(i)) a
                JOIN (SELECT doc_id, i AS band_id, bands[i+1] AS band_hash
                      FROM (SELECT doc_id, [md5('0' || '|' || s0 || '|' || s1 || '|' || s2 || '|' || s3 || '|' || s4 || '|' || s5 || '|' || s6 || '|' || s7 || '|' || s8 || '|' || s9 || '|' || s10 || '|' || s11 || '|' || s12 || '|' || s13 || '|' || s14 || '|' || s15), md5('1' || '|' || s16 || '|' || s17 || '|' || s18 || '|' || s19 || '|' || s20 || '|' || s21 || '|' || s22 || '|' || s23 || '|' || s24 || '|' || s25 || '|' || s26 || '|' || s27 || '|' || s28 || '|' || s29 || '|' || s30 || '|' || s31), md5('2' || '|' || s32 || '|' || s33 || '|' || s34 || '|' || s35 || '|' || s36 || '|' || s37 || '|' || s38 || '|' || s39 || '|' || s40 || '|' || s41 || '|' || s42 || '|' || s43 || '|' || s44 || '|' || s45 || '|' || s46 || '|' || s47), md5('3' || '|' || s48 || '|' || s49 || '|' || s50 || '|' || s51 || '|' || s52 || '|' || s53 || '|' || s54 || '|' || s55 || '|' || s56 || '|' || s57 || '|' || s58 || '|' || s59 || '|' || s60 || '|' || s61 || '|' || s62 || '|' || s63)] AS bands
                            FROM sigs), range(4) t(i)) b
                  ON a.band_id = b.band_id AND a.band_hash = b.band_hash
                 AND a.doc_id < b.doc_id) c
            JOIN grams ga ON c.doc_a = ga.doc_id
            JOIN grams gb ON c.doc_b = gb.doc_id)
    ORDER BY rows_per_band
"""
ORACLES["minhash_band_tuning"] = ORACLES["minhash_band_tuning"].format(
    grams_ctes=_GRAMS_CTES, base_mask=_hashing.BASE_MASK, sig_cols=_sig_cols
)

ORACLES["langid_margin"] = f"""
    WITH toks AS (
        SELECT lang, {_TOKS} AS t FROM documents),
    scored AS (
        SELECT lang,
               len(list_filter(t, x -> list_contains({_MARKERS['en']}, x))) AS s_en,
               len(list_filter(t, x -> list_contains({_MARKERS['de']}, x))) AS s_de,
               len(list_filter(t, x -> list_contains({_MARKERS['fr']}, x))) AS s_fr,
               len(list_filter(t, x -> list_contains({_MARKERS['es']}, x))) AS s_es
        FROM toks),
    marged AS (
        SELECT lang,
               CAST(list_reverse_sort([s_en, s_de, s_fr, s_es])[1]
                    - list_reverse_sort([s_en, s_de, s_fr, s_es])[2]
                    AS BIGINT) AS margin,
               s_en + s_de + s_fr + s_es AS total
        FROM scored)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(margin) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mean_margin,
           CAST(count_if(margin <= 1) AS BIGINT) AS n_low_margin,
           CAST(count_if(margin <= 1) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS low_margin_share,
           CAST(count_if(total = 0) AS BIGINT) AS n_no_signal
    FROM marged GROUP BY 1 ORDER BY lang
"""


ORACLES["dup_pair_length_bias"] = f"""
    WITH lsh_pairs AS ({ORACLES['dedup_minhash_lsh']}),
    dup_ids AS (
        SELECT DISTINCT doc_id FROM (
            SELECT doc_a AS doc_id FROM lsh_pairs
            UNION ALL SELECT doc_b FROM lsh_pairs)),
    corpus AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS corpus_mean_chars
        FROM documents GROUP BY 1),
    dup AS (
        SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_dup_docs,
               CAST(SUM(d.n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS dup_mean_chars
        FROM documents d JOIN dup_ids i ON d.doc_id = i.doc_id
        GROUP BY 1)
    SELECT c.source, c.n_docs,
           COALESCE(u.n_dup_docs, CAST(0 AS BIGINT)) AS n_dup_docs,
           c.corpus_mean_chars, u.dup_mean_chars,
           u.dup_mean_chars / c.corpus_mean_chars AS length_bias_ratio
    FROM corpus c LEFT JOIN dup u ON c.source = u.source
    ORDER BY c.source
"""

ORACLES["sentence_dedup_rate"] = """
    WITH sents AS (
        SELECT DISTINCT source, doc_id, trim(s) AS sent
        FROM (
            SELECT source, doc_id,
                   UNNEST(regexp_split_to_array(lower(trim(text)),
                                                '\\.\\s+')) AS s
            FROM documents)
        WHERE length(trim(s)) >= 20),
    docfreq AS (
        SELECT sent, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM sents GROUP BY 1)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sentences,
           CAST(count_if(df > 1) AS BIGINT) AS n_shared,
           CAST(count_if(df > 1) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS shared_share
    FROM sents s JOIN docfreq f ON s.sent = f.sent
    GROUP BY 1 ORDER BY source
"""

ORACLES["simhash_bit_balance"] = f"""
    WITH toksd AS (SELECT doc_id, list_distinct({_TOKS}) AS tk
                   FROM documents),
    hs AS (SELECT doc_id,
                  [CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)
                   FOR t IN tk] AS hl
           FROM toksd),
    flat AS (SELECT doc_id, UNNEST(hl) AS h FROM hs),
    bits AS (SELECT doc_id, b,
                    SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
             FROM flat, range(60) t(b) GROUP BY 1, 2),
    sim AS (SELECT doc_id,
                   CAST(SUM(CASE WHEN s >= 0
                            THEN (CAST(1 AS BIGINT) << b)
                            ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
            FROM bits GROUP BY 1),
    perbit AS (
        SELECT b AS bit,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CAST((simhash >> b) & 1 AS INT)) AS BIGINT) AS n_set
        FROM sim, range(60) t(b) GROUP BY 1)
    SELECT bit, n_docs, n_set,
           CAST(n_set AS DOUBLE) / CAST(n_docs AS DOUBLE) AS set_share,
           ABS(CAST(n_set AS DOUBLE) / CAST(n_docs AS DOUBLE) - 0.5)
               AS skew
    FROM perbit ORDER BY bit
"""

ORACLES["dup_cluster_purity"] = f"""
    WITH cc AS ({{cc_sql}}),
    per_cluster AS (
        SELECT cc.cluster_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_sources
        FROM cc JOIN documents d ON cc.doc_id = d.doc_id
        GROUP BY 1)
    SELECT n_sources, CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS DOUBLE)
               / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS cluster_share
    FROM per_cluster GROUP BY 1 ORDER BY n_sources
"""
try:
    from icecube_spark.queries.pipeline_oracles import ORACLES as _P_ORACLES
    ORACLES["dup_cluster_purity"] = ORACLES["dup_cluster_purity"].format(
        cc_sql=_P_ORACLES["dedup_clusters"]
    )
except ImportError:
    # circular-import entry through pipeline_oracles: its module body
    # is mid-initialization; its tail finishes this format instead
    pass


# --- IVF family (E4 embed_ann_ivf, E44 ivf_probe_curve) -------------
# Exact-Lloyd coarse quantizer twin of operators/ivf.py: seeds = the
# k lowest-id vectors, 4 fixed iterations of (quantized-integer
# assignment -> DECIMAL(18,8) mean), empty clusters keep their
# previous centroid, final assignment against the converged centroids.
# Everything folds through floor(.*1e12) BIGINT sums, so the index is
# bit-identical to the Spark build.

def _ivf_ctes(k: int = 16, n_iter: int = 4, dim: int = 64) -> str:
    parts = [
        f"""vd AS (
        SELECT vec_id, j - 1 AS dim, CAST(embedding[j] AS DOUBLE) AS x
        FROM embeddings, UNNEST(range(1, {dim + 1})) t(j)),
    c0 AS (
        SELECT CAST(vec_id AS INT) AS cluster, j - 1 AS dim,
               CAST(embedding[j] AS DOUBLE) AS c
        FROM embeddings, UNNEST(range(1, {dim + 1})) t(j)
        WHERE vec_id < {k})"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(f"""d{i} AS (
        SELECT v.vec_id, cc.cluster,
               SUM(CAST(floor((v.x - cc.c) * (v.x - cc.c) * 1e12)
                        AS BIGINT)) AS qd
        FROM vd v JOIN c{i - 1} cc ON v.dim = cc.dim
        GROUP BY 1, 2),
    a{i} AS (
        SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY qd, cluster) AS rn
            FROM d{i}) WHERE rn = 1),
    m{i} AS (
        SELECT a.cluster, v.dim,
               CAST(SUM(CAST(v.x AS DECIMAL(18,8))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS c
        FROM a{i} a JOIN vd v USING (vec_id)
        GROUP BY 1, 2),
    c{i} AS (
        SELECT p.cluster, p.dim, COALESCE(m.c, p.c) AS c
        FROM c{i - 1} p LEFT JOIN m{i} m USING (cluster, dim))""")
    parts.append(f"""dfin AS (
        SELECT v.vec_id, cc.cluster,
               SUM(CAST(floor((v.x - cc.c) * (v.x - cc.c) * 1e12)
                        AS BIGINT)) AS qd
        FROM vd v JOIN c{n_iter} cc ON v.dim = cc.dim
        GROUP BY 1, 2),
    afin AS (
        SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY qd, cluster) AS rn
            FROM dfin) WHERE rn = 1),
    cnorm AS (
        SELECT cluster,
               sqrt(CAST(SUM(CAST(floor(c * c * 1e12) AS BIGINT))
                         AS DOUBLE) / 1e12) AS c_nrm
        FROM c{n_iter} GROUP BY 1),
    qcdot AS (
        SELECT v.vec_id AS query_id, cc.cluster,
               CAST(SUM(CAST(floor(v.x * cc.c * 1e12) AS BIGINT))
                    AS DOUBLE) / 1e12 AS cdot
        FROM vd v JOIN c{n_iter} cc ON v.dim = cc.dim
        WHERE v.vec_id < 10
        GROUP BY 1, 2),
    qrank AS (
        SELECT query_id, cluster, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY c_cos DESC, cluster) AS r
        FROM (SELECT q.query_id, q.cluster,
                     q.cdot / (vq.nrm * cn.c_nrm) AS c_cos
              FROM qcdot q
              JOIN v vq ON vq.vec_id = q.query_id
              JOIN cnorm cn ON cn.cluster = q.cluster))""")
    return ",\n    ".join(parts)


_IVF_SCORED = f"""scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id, p.r AS cluster_rank,
               {_PAIR_COS.format(a='q.embedding', b='c.embedding',
                                 na='q.nrm', nb='c.nrm')} AS cosine
        FROM qrank p
        JOIN afin a ON a.cluster = p.cluster AND a.vec_id != p.query_id
        JOIN v q ON q.vec_id = p.query_id
        JOIN v c ON c.vec_id = a.vec_id)"""

ORACLES["embed_ann_ivf"] = f"""
    WITH {_VNORM},
    {_ivf_ctes()},
    {_IVF_SCORED}
    SELECT query_id, neighbor_id, cosine, rank FROM (
        SELECT query_id, neighbor_id, cosine, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
        ) AS INT) AS rank
        FROM scored WHERE cluster_rank <= 4)
    WHERE rank <= 5 ORDER BY query_id, rank
"""

_IVF_CURVE_POINT = """
    SELECT CAST({np} AS INT) AS nprobe,
           (SELECT COUNT(*) FROM exact) AS n_truth,
           (SELECT COUNT(*) FROM exact e WHERE EXISTS (
               SELECT 1 FROM got{np} g
               WHERE g.query_id = e.query_id AND g.got_id = e.true_id
           )) AS n_hit,
           CAST((SELECT COUNT(*) FROM exact e WHERE EXISTS (
               SELECT 1 FROM got{np} g
               WHERE g.query_id = e.query_id AND g.got_id = e.true_id
           )) AS DOUBLE) / CAST((SELECT COUNT(*) FROM exact) AS DOUBLE)
               AS recall_at_5
"""

_IVF_GOT = """got{np} AS (
        SELECT query_id, neighbor_id AS got_id FROM (
            SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
            ) AS rank
            FROM scored WHERE cluster_rank <= {np})
        WHERE rank <= 5)"""

ORACLES["ivf_probe_curve"] = f"""
    WITH {_VNORM},
    {_ivf_ctes()},
    {_IVF_SCORED},
    exact AS (
        SELECT query_id, neighbor_id AS true_id FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id, ROW_NUMBER() OVER (
                PARTITION BY q.query_id ORDER BY
                {_PAIR_COS.format(a='q.qv', b='c.embedding',
                                  na='q.qn', nb='c.nrm')} DESC, c.vec_id
            ) AS rank
            FROM (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn
                  FROM v WHERE vec_id < 10) q
            JOIN v c ON c.vec_id != q.query_id)
        WHERE rank <= 5),
    {_IVF_GOT.format(np=1)},
    {_IVF_GOT.format(np=2)},
    {_IVF_GOT.format(np=4)},
    {_IVF_GOT.format(np=8)}
    {_IVF_CURVE_POINT.format(np=1)} UNION ALL
    {_IVF_CURVE_POINT.format(np=2)} UNION ALL
    {_IVF_CURVE_POINT.format(np=4)} UNION ALL
    {_IVF_CURVE_POINT.format(np=8)}
    ORDER BY nprobe
"""

ORACLES["anchor_margin_deciles"] = """
    WITH anchors AS (
        SELECT CAST(vec_id AS INT) AS aid, embedding AS avec
        FROM embeddings WHERE vec_id < 8),
    d AS (
        SELECT v.vec_id, a.aid,
               list_sum([CAST(floor(
                   (CAST(v.embedding[j] AS DOUBLE) - CAST(a.avec[j] AS DOUBLE))
                   * (CAST(v.embedding[j] AS DOUBLE) - CAST(a.avec[j] AS DOUBLE))
                   * 1e12) AS BIGINT)
                 FOR j IN range(1, 65)]) AS qd
        FROM embeddings v CROSS JOIN anchors a
        WHERE v.vec_id != a.aid),
    best2 AS (
        SELECT vec_id,
               MAX(CASE WHEN rn = 1 THEN qd END) AS d1,
               MAX(CASE WHEN rn = 2 THEN qd END) AS d2
        FROM (SELECT vec_id, qd, ROW_NUMBER() OVER (
                  PARTITION BY vec_id ORDER BY qd, aid) AS rn
              FROM d)
        WHERE rn <= 2 GROUP BY 1
        HAVING MAX(CASE WHEN rn = 2 THEN qd END) IS NOT NULL),
    scored AS (
        SELECT CAST(LEAST(9, FLOOR(
                   CAST(d2 - d1 AS DOUBLE)
                   / CAST(GREATEST(d1 + d2, 1) AS DOUBLE) * 10.0)) AS INT)
                   AS decile,
               CAST(FLOOR(
                   CAST(d2 - d1 AS DOUBLE)
                   / CAST(GREATEST(d1 + d2, 1) AS DOUBLE) * 1e6) AS BIGINT)
                   AS mq
        FROM best2)
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(mq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e6
               AS mean_margin
    FROM scored GROUP BY 1 ORDER BY decile
"""

ORACLES["word_length_profile"] = """
    WITH words AS (
        SELECT lang, UNNEST(string_split(
            regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
        FROM documents),
    wl AS (SELECT lang, length(w) AS wl FROM words WHERE w != '')
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(CAST(wl AS DECIMAL(18,8))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS mean_word_len,
           CAST(SUM(CASE WHEN wl >= 8 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS long_word_share,
           CAST(MAX(wl) AS BIGINT) AS max_word_len
    FROM wl GROUP BY 1 ORDER BY lang
"""

ORACLES["media_chunk_dedup_rate"] = """
    WITH t AS (
        SELECT source,
               regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g') AS t
        FROM documents),
    chunks AS (
        SELECT source,
               md5(substr(t, i * 64 + 1, 64)) AS sig
        FROM t, UNNEST(range(0,
            GREATEST(0, CAST(FLOOR((length(t) - 1) / 64) AS INT)) + 1)) u(i))
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT sig) AS BIGINT) AS n_distinct,
           1.0 - CAST(COUNT(DISTINCT sig) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS dedup_savings
    FROM chunks GROUP BY 1 ORDER BY source
"""

ORACLES["normalization_dup_gain"] = """
    WITH raw AS (
        SELECT CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
                   AS raw_dup_docs,
               CAST(COUNT(*) AS BIGINT) AS raw_groups
        FROM (SELECT md5(text) AS h, COUNT(*) AS c
              FROM documents GROUP BY 1)),
    norm AS (
        SELECT CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
                   AS norm_dup_docs,
               CAST(COUNT(*) AS BIGINT) AS norm_groups
        FROM (SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                         AS h,
                     COUNT(*) AS c
              FROM documents GROUP BY 1)),
    total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
    SELECT n_docs, raw_dup_docs, norm_dup_docs,
           CAST(norm_dup_docs - raw_dup_docs AS BIGINT)
               AS normalization_gain,
           raw_groups, norm_groups
    FROM total CROSS JOIN raw CROSS JOIN norm
"""

ORACLES["label_quantization_distortion"] = """
    WITH anchors AS (
        SELECT CAST(vec_id AS INT) AS aid, embedding AS avec
        FROM embeddings WHERE vec_id < 8),
    d AS (
        SELECT v.vec_id, v.label,
               list_sum([CAST(floor(
                   (CAST(v.embedding[j] AS DOUBLE) - CAST(a.avec[j] AS DOUBLE))
                   * (CAST(v.embedding[j] AS DOUBLE) - CAST(a.avec[j] AS DOUBLE))
                   * 1e12) AS BIGINT)
                 FOR j IN range(1, 65)]) AS qd
        FROM embeddings v CROSS JOIN anchors a
        WHERE v.vec_id != a.aid),
    best AS (
        SELECT vec_id, label, MIN(qd) AS d1 FROM d GROUP BY 1, 2)
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(d1) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e12
               AS mean_distortion,
           CAST(MAX(d1) AS DOUBLE) / 1e12 AS max_distortion
    FROM best GROUP BY 1 ORDER BY label
"""

ORACLES["media_size_profile"] = """
    WITH ranked AS (
        SELECT source, b,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY b, doc_id)
                   AS rk,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM (SELECT source, doc_id,
                     CAST(strlen(text) AS BIGINT) AS b
              FROM documents))
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(SUM(b) AS BIGINT) AS total_bytes,
           CAST(MAX(CASE WHEN rk = GREATEST(1, (50 * n) // 100)
                         THEN b END) AS BIGINT) AS p50_bytes,
           CAST(MAX(CASE WHEN rk = GREATEST(1, (90 * n) // 100)
                         THEN b END) AS BIGINT) AS p90_bytes,
           CAST(SUM(CASE WHEN b > 4096 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS oversize_share
    FROM ranked GROUP BY 1 ORDER BY source
"""

ORACLES["url_email_density"] = """
    WITH per AS (
        SELECT source,
               CAST(length(regexp_extract_all(text, 'https?://[^ ]+'))
                    AS BIGINT) AS u,
               CAST(length(regexp_extract_all(text,
                    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]+'))
                    AS BIGINT) AS e,
               CAST(length(text) AS BIGINT) AS nc
        FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(u) AS BIGINT) AS n_urls,
           CAST(SUM(e) AS BIGINT) AS n_emails,
           CAST(SUM(u + e) AS DOUBLE) * 1000.0 / CAST(SUM(nc) AS DOUBLE)
               AS density_per_kchar,
           CAST(SUM(CASE WHEN u > 0 OR e > 0 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS doc_hit_share
    FROM per GROUP BY 1 ORDER BY source
"""

ORACLES["dup_group_span"] = """
    WITH grp AS (
        SELECT md5(text) AS h, COUNT(*) AS c,
               CAST(MAX(doc_id) - MIN(doc_id) AS BIGINT) AS span
        FROM documents GROUP BY 1
        HAVING COUNT(*) > 1)
    SELECT CAST(length(CAST(span AS VARCHAR)) AS INT) AS span_magnitude,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(MAX(span) AS BIGINT) AS max_span
    FROM grp GROUP BY 1 ORDER BY span_magnitude
"""

ORACLES["norm_percentiles_by_label"] = f"""
    WITH {_VNORM},
    ranked AS (
        SELECT label,
               CAST(FLOOR(nrm * 1e6) AS BIGINT) AS qn,
               ROW_NUMBER() OVER (
                   PARTITION BY label
                   ORDER BY CAST(FLOOR(nrm * 1e6) AS BIGINT), vec_id) AS rk,
               COUNT(*) OVER (PARTITION BY label) AS n
        FROM v)
    SELECT label,
           CAST(MAX(n) AS BIGINT) AS n_vectors,
           CAST(MAX(CASE WHEN rk = GREATEST(1, (10 * n) // 100)
                         THEN qn END) AS DOUBLE) / 1e6 AS p10_norm,
           CAST(MAX(CASE WHEN rk = GREATEST(1, (50 * n) // 100)
                         THEN qn END) AS DOUBLE) / 1e6 AS p50_norm,
           CAST(MAX(CASE WHEN rk = GREATEST(1, (90 * n) // 100)
                         THEN qn END) AS DOUBLE) / 1e6 AS p90_norm
    FROM ranked GROUP BY 1 ORDER BY label
"""

ORACLES["numeric_token_rate"] = """
    WITH toks AS (
        SELECT doc_id, source,
               UNNEST(string_split(
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                   ' ')) AS w
        FROM documents),
    per_doc AS (
        SELECT doc_id, source,
               COUNT(*) AS n_tok,
               SUM(CASE WHEN regexp_matches(w, '^[0-9]+([.,][0-9]+)?$')
                        THEN 1 ELSE 0 END) AS n_num
        FROM toks WHERE w != '' GROUP BY 1, 2)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_num) AS BIGINT) AS n_numeric,
           CAST(SUM(n_num) AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE)
               AS numeric_share,
           CAST(SUM(CASE WHEN n_num * 5 > n_tok THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS numeric_heavy_doc_share
    FROM per_doc GROUP BY 1 ORDER BY source
"""

ORACLES["whitespace_profile"] = """
    WITH per AS (
        SELECT source,
               CAST(contains(text, '  ') AS INT) AS dbl,
               CAST(contains(text, chr(9)) AS INT) AS tab,
               CAST(contains(text, chr(13)) AS INT) AS cr,
               CAST(text LIKE ' %' OR text LIKE '% ' AS INT) AS edge,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(length(text) - length(replace(text, ' ', ''))
                    AS BIGINT) AS n_spaces
        FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dbl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS multi_space_share,
           CAST(SUM(tab) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS tab_share,
           CAST(SUM(cr) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS cr_share,
           CAST(SUM(edge) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS edge_ws_share,
           CAST(SUM(n_spaces) AS DOUBLE) / CAST(SUM(n_chars) AS DOUBLE)
               AS space_density
    FROM per GROUP BY 1 ORDER BY 1
"""

ORACLES["anchor_coverage_curve"] = """
    WITH d1 AS (
        SELECT v.vec_id,
               MIN(list_sum([CAST(floor(
                   (CAST(v.embedding[j] AS DOUBLE) - CAST(a.avec[j] AS DOUBLE))
                   * (CAST(v.embedding[j] AS DOUBLE) - CAST(a.avec[j] AS DOUBLE))
                   * 1e12) AS BIGINT)
                 FOR j IN range(1, 65)])) AS d1
        FROM embeddings v CROSS JOIN
             (SELECT CAST(vec_id AS INT) AS aid, embedding AS avec
              FROM embeddings WHERE vec_id < 8) a
        WHERE v.vec_id != a.aid
        GROUP BY 1),
    deciled AS (
        SELECT d1, NTILE(10) OVER (ORDER BY d1, vec_id) AS decile
        FROM d1)
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(d1) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e12
               AS mean_dist,
           CAST(MAX(d1) AS DOUBLE) / 1e12 AS max_dist
    FROM deciled GROUP BY 1 ORDER BY 1
"""

# text_features graduated from rows-only in round 6: the stats columns
# now come from a native tokenizer projection (the MLlib IDF fit is a
# staged side artifact), so a SQL twin exists.
ORACLES["text_features"] = """
    SELECT doc_id,
           CAST(length(list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x != '')) AS BIGINT) AS n_tokens,
           CAST(length(list_distinct(list_filter(
               string_split_regex(lower(text), '\\s+'), x -> x != '')))
               AS BIGINT) AS n_distinct_terms
    FROM documents
"""


def _mmr_oracle(k: int = 8, n_candidates: int = 32, dim: int = 64) -> str:
    """mmr_diversify graduated from rows-only in round 7: every float
    the greedy compares is pico-quantized (floor(a*b*1e12) per dim,
    exact integer fold), so the k selection steps unroll into chained
    argmax CTEs — score DESC, candidate-rank ASC ties mirror the
    operator's strict-> loop in r order. lam literals are written in
    scientific notation (parity.py: DuckDB fractional literals are
    DECIMAL and double-round); 3.0000000000000004e-1 is Python's
    1.0 - 0.7."""

    def qd(a: str, b: str) -> str:
        return (
            "(CAST(list_sum([CAST(floor(CAST(x[1] AS DOUBLE)"
            " * CAST(x[2] AS DOUBLE) * 1e12) AS BIGINT)"
            f" FOR x IN list_zip({a}, {b})]) AS DOUBLE) / 1e12)"
        )

    lam, one_minus = "7e-1", "3.0000000000000004e-1"
    parts = [
        f"""
    WITH cdims AS MATERIALIZED (
        SELECT label, gs AS dim,
               CAST(SUM(CAST(CAST(embedding[CAST(gs AS INT)] AS DOUBLE)
                             AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS c
        FROM embeddings CROSS JOIN generate_series(1, {dim}) AS t(gs)
        GROUP BY 1, 2),
    cent0 AS MATERIALIZED (
        SELECT label AS qlabel, list(c ORDER BY dim) AS qv
        FROM cdims GROUP BY label),
    cent AS MATERIALIZED (SELECT qlabel, qv, sqrt({qd('qv', 'qv')}) AS qn FROM cent0),
    rels AS MATERIALIZED (
        SELECT c.qlabel, e.vec_id,
               {qd('c.qv', 'e.embedding')}
                   / (c.qn * sqrt({qd('e.embedding', 'e.embedding')})) AS rel,
               sqrt({qd('e.embedding', 'e.embedding')}) AS cn,
               e.embedding
        FROM embeddings e CROSS JOIN cent c),
    top AS MATERIALIZED (
        SELECT qlabel, vec_id, rel, cn, embedding,
               ROW_NUMBER() OVER (PARTITION BY qlabel
                                  ORDER BY rel DESC, vec_id ASC) AS r
        FROM rels QUALIFY r <= {n_candidates}),
    sims AS MATERIALIZED (
        SELECT a.qlabel, a.vec_id AS ia, b.vec_id AS ib,
               {qd('a.embedding', 'b.embedding')} / (a.cn * b.cn) AS s
        FROM top a JOIN top b
            ON a.qlabel = b.qlabel AND a.vec_id <> b.vec_id),
    p1 AS MATERIALIZED (
        SELECT qlabel, vec_id, r, rel, rel AS score, 1 AS sel_rank FROM top
        QUALIFY ROW_NUMBER() OVER (PARTITION BY qlabel
                                   ORDER BY rel DESC, r ASC) = 1),
    picked1 AS MATERIALIZED (SELECT * FROM p1)"""
    ]
    for t in range(2, k + 1):
        parts.append(
            f""",
    cand{t} AS MATERIALIZED (
        SELECT tt.qlabel, tt.vec_id, tt.r, tt.rel,
               {lam} * tt.rel - {one_minus} * MAX(s.s) AS score
        FROM top tt
        JOIN sims s ON s.qlabel = tt.qlabel AND s.ia = tt.vec_id
        JOIN picked{t - 1} pk
            ON pk.qlabel = s.qlabel AND pk.vec_id = s.ib
        WHERE NOT EXISTS (SELECT 1 FROM picked{t - 1} x
                          WHERE x.qlabel = tt.qlabel
                            AND x.vec_id = tt.vec_id)
        GROUP BY 1, 2, 3, 4),
    p{t} AS MATERIALIZED (
        SELECT qlabel, vec_id, r, rel, score, {t} AS sel_rank FROM cand{t}
        QUALIFY ROW_NUMBER() OVER (PARTITION BY qlabel
                                   ORDER BY score DESC, r ASC) = 1),
    picked{t} AS MATERIALIZED (SELECT * FROM picked{t - 1} UNION ALL SELECT * FROM p{t})"""
        )
    parts.append(
        f"""
    SELECT qlabel, CAST(sel_rank AS INT) AS sel_rank, vec_id, rel,
           score AS mmr_score
    FROM picked{k} ORDER BY qlabel, sel_rank"""
    )
    return "".join(parts)


ORACLES["mmr_diversify"] = _mmr_oracle()
