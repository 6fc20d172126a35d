"""DuckDB oracles for the extension queries (queries_ext.py). Rows-only
queries (LSH ANN, multimodal decode/frame-sample) are deliberately absent.
"""

from __future__ import annotations

import hashlib


def _hyperplane_bucket_sql(
    vec_expr: str, dim: int = 64, n_planes: int = 4, seed: int = 0
) -> str:
    """SQL for operators.similarity.hyperplane_sign_bucket: the ±1 weights
    depend only on md5 of '{seed}|{plane}|{dim}' constants, so they are
    precomputed here (hashlib.md5 == Spark md5 on utf-8) and inlined as
    literal arrays — DuckDB then reproduces the exact sign pattern."""
    bits = []
    for p in range(n_planes):
        w = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()
            w.append("1.0" if h[0] in "89abcdef" else "-1.0")
        arr = "[" + ", ".join(w) + "]"
        bits.append(
            "(CASE WHEN list_dot_product(CAST("
            f"{vec_expr} AS DOUBLE[]), {arr}) >= 0 "
            "THEN '1' ELSE '0' END)"
        )
    return " || ".join(bits)

_SIMHASH_SUMS = ",\n            ".join(
    "SUM(CASE WHEN substr(wh, {i}, 1) IN "
    "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s{j}".format(
        i=i + 1, j=i
    )
    for i in range(16)
)
_SIMHASH_BITS = " || ".join(
    f"(CASE WHEN s{i} >= 0 THEN '1' ELSE '0' END)" for i in range(16)
)

EXT_ORACLES: dict[str, str] = {
    # CCNet paragraph dedup (queries_ext.q_paragraph_dedup): the oracle
    # uses the row_number-window form — answer-identical to the engine's
    # skew-safe min-struct aggregate (the struct ordering (doc_id,
    # para_idx) IS the window's ORDER BY, and (doc_id, para_idx) is
    # unique per hash group).
    "q_paragraph_dedup": """
        WITH base AS (
            SELECT doc_id, string_split(trim(text), ' ') AS ws
            FROM documents
        ),
        idx AS (
            SELECT doc_id, ws,
                   UNNEST(generate_series(
                       0, CAST(ceil(len(ws) / 15.0) AS INT) - 1
                   )) AS para_idx
            FROM base
        ),
        paras AS (
            SELECT doc_id, para_idx,
                   array_to_string(
                       list_slice(ws, para_idx * 15 + 1, para_idx * 15 + 15),
                       ' '
                   ) AS para_text
            FROM idx
        ),
        marked AS (
            SELECT *, row_number() OVER (
                PARTITION BY md5(para_text) ORDER BY doc_id, para_idx
            ) AS rn
            FROM paras
        )
        SELECT doc_id,
               COUNT(*)::BIGINT AS n_paras,
               SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT
                   AS n_dup_paras,
               string_agg(CASE WHEN rn = 1 THEN para_text END, ' '
                          ORDER BY para_idx) AS scrubbed_text
        FROM marked GROUP BY doc_id
    """,
    # Asymmetric containment pairs (queries_ext.q_containment_pairs):
    # same df-capped shingle universe as q_ngram_jaccard, containment
    # gate instead of the Jaccard gate.
    "q_containment_pairs": """
        WITH t AS (
            SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
        ),
        sh_all AS (
            SELECT DISTINCT
                t.doc_id,
                arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS sh
            FROM t, unnest(generate_series(1, len(arr) - 2)) AS g(i)
        ),
        sh AS (
            SELECT sh_all.* FROM sh_all
            JOIN (SELECT sh FROM sh_all GROUP BY sh HAVING COUNT(*) <= 1000)
              USING (sh)
        ),
        sizes AS (
            SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        ),
        shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
            FROM sh a
            JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT id_a, id_b, n_shared,
                   sa.n_sh AS n_a, sb.n_sh AS n_b,
                   greatest(
                       CAST(n_shared AS DOUBLE) / sa.n_sh,
                       CAST(n_shared AS DOUBLE) / sb.n_sh
                   ) AS containment
            FROM shared
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
        )
        SELECT id_a, id_b, n_shared, n_a, n_b, containment,
               CASE WHEN n_a <= n_b THEN 'a_in_b' ELSE 'b_in_a' END
                   AS direction
        FROM scored
        WHERE containment >= 0.6
    """,
    "q_dedup_exact": """
        SELECT
            md5(trim(text)) AS content_hash,
            MIN(doc_id) AS keeper_id,
            COUNT(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
    "q_minhash": """
        WITH t AS (
            SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
        ),
        sh AS (
            SELECT DISTINCT
                t.doc_id,
                arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS word
            FROM t, unnest(generate_series(1, len(arr) - 2)) AS g(i)
        )
        SELECT
            doc_id,
            MIN(md5(word || '#0')) AS h0,
            MIN(md5(word || '#1')) AS h1,
            MIN(md5(word || '#2')) AS h2,
            MIN(md5(word || '#3')) AS h3
        FROM sh
        GROUP BY doc_id
    """,
    "q_minhash_lsh_pairs": """
        WITH t AS (
            SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
        ),
        sh AS (
            SELECT DISTINCT
                t.doc_id,
                arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS word
            FROM t, unnest(generate_series(1, len(arr) - 2)) AS g(i)
        ),
        sig AS (
            SELECT
                doc_id,
                MIN(md5(word || '#0')) AS h0,
                MIN(md5(word || '#1')) AS h1,
                MIN(md5(word || '#2')) AS h2,
                MIN(md5(word || '#3')) AS h3
            FROM sh
            GROUP BY doc_id
        ),
        banded AS (
            SELECT doc_id, 0 AS band_idx, md5(h0 || '|' || h1) AS band_key FROM sig
            UNION ALL
            SELECT doc_id, 1 AS band_idx, md5(h2 || '|' || h3) AS band_key FROM sig
        ),
        -- mega-bucket cap (mirrors lsh_candidate_pairs max_bucket_size)
        ok AS (
            SELECT band_idx, band_key FROM banded
            GROUP BY 1, 2 HAVING COUNT(*) <= 1000
        ),
        banded_ok AS (
            SELECT banded.* FROM banded JOIN ok USING (band_idx, band_key)
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded_ok a
        JOIN banded_ok b
          ON a.band_idx = b.band_idx
         AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    """,
    "q_simhash": f"""
        WITH tokens AS (
            SELECT doc_id, md5(w) AS wh
            FROM (
                SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
                FROM documents
            )
        ),
        sums AS (
            SELECT
                doc_id,
                {_SIMHASH_SUMS}
            FROM tokens
            GROUP BY doc_id
        )
        SELECT doc_id, {_SIMHASH_BITS} AS simhash
        FROM sums
    """,
    "q_ngram_jaccard": """
        WITH t AS (
            SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
        ),
        sh_all AS (
            SELECT DISTINCT
                t.doc_id,
                arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS sh
            FROM t, unnest(generate_series(1, len(arr) - 2)) AS g(i)
        ),
        -- document-frequency cap (mirrors shingle_jaccard_pairs max_df)
        sh AS (
            SELECT sh_all.* FROM sh_all
            JOIN (SELECT sh FROM sh_all GROUP BY sh HAVING COUNT(*) <= 1000)
              USING (sh)
        ),
        sizes AS (
            SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        ),
        shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
            FROM sh a
            JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT
            id_a,
            id_b,
            n_shared,
            sa.n_sh AS n_a,
            sb.n_sh AS n_b,
            CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) AS jaccard
        FROM shared
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) >= 0.2
    """,
    "q_text_stats": """
        SELECT
            doc_id,
            len(string_split(text, ' '))::BIGINT AS n_words,
            len(list_distinct(string_split(text, ' ')))::BIGINT AS n_distinct_words,
            CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w)))
                 AS BIGINT) AS sum_word_len,
            CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w)))
                 AS DOUBLE) / len(string_split(text, ' ')) AS avg_word_len,
            len(list_filter(string_split(text, ' '),
                w -> lower(w) IN ('the','a','of','and','to','in','is')))::BIGINT
                AS stopword_count,
            CAST(len(list_filter(string_split(text, ' '),
                w -> lower(w) IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
                / len(string_split(text, ' ')) AS stopword_ratio
        FROM documents
    """,
    "q_token_count": r"""
        SELECT
            doc_id,
            len(string_split(text, ' '))::BIGINT AS ws_tokens,
            len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))::BIGINT
                AS bpe_tokens
        FROM documents
    """,
    "q_lang_id": """
        WITH scored AS (
            SELECT
                doc_id,
                len(list_filter(string_split(lower(text), ' '),
                    w -> w IN ('the','and','of','is'))) AS en,
                len(list_filter(string_split(lower(text), ' '),
                    w -> w IN ('el','la','de','que'))) AS es,
                len(list_filter(string_split(lower(text), ' '),
                    w -> w IN ('der','die','und','das'))) AS de
            FROM documents
        )
        SELECT
            doc_id,
            CASE
                WHEN en >= es AND en >= de AND en > 0 THEN 'en'
                WHEN es >= de AND es > 0 THEN 'es'
                WHEN de > 0 THEN 'de'
                ELSE 'unknown'
            END AS pred_lang
        FROM scored
    """,
    "q_fingerprint": """
        SELECT
            doc_id,
            md5(trim(text)) AS exact_fp,
            md5(array_to_string(
                list_sort(list_distinct(string_split(trim(text), ' '))), ' '))
                AS content_fp
        FROM documents
    """,
    "q_embedding_topk": """
        SELECT
            q.vec_id AS query_id,
            c.vec_id AS neighbor_id,
            CAST(row_number() OVER (
                PARTITION BY q.vec_id
                ORDER BY list_cosine_similarity(
                    CAST(c.embedding AS DOUBLE[]),
                    CAST(q.embedding AS DOUBLE[])) DESC,
                c.vec_id ASC
            ) AS INT) AS rank
        FROM embeddings c
        CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
        WHERE c.vec_id != q.vec_id
        QUALIFY rank <= 10
    """,
    "q_embedding_dup": f"""
        WITH e AS (
            SELECT
                vec_id, label, embedding,
                {_hyperplane_bucket_sql("embedding", seed=0)} AS b0,
                {_hyperplane_bucket_sql("embedding", seed=1)} AS b1
            FROM embeddings
        ),
        cand AS (
            SELECT DISTINCT a.label, a.vec_id AS id_a, b.vec_id AS id_b
            FROM e a JOIN e b
              ON a.label = b.label AND a.b0 = b.b0 AND a.vec_id < b.vec_id
            UNION
            SELECT DISTINCT a.label, a.vec_id AS id_a, b.vec_id AS id_b
            FROM e a JOIN e b
              ON a.label = b.label AND a.b1 = b.b1 AND a.vec_id < b.vec_id
        )
        SELECT
            c.label,
            c.id_a,
            c.id_b,
            round(list_cosine_similarity(
                CAST(va.embedding AS DOUBLE[]),
                CAST(vb.embedding AS DOUBLE[])), 6) AS cos_r
        FROM cand c
        JOIN embeddings va ON va.vec_id = c.id_a
        JOIN embeddings vb ON vb.vec_id = c.id_b
        WHERE list_cosine_similarity(
                CAST(va.embedding AS DOUBLE[]),
                CAST(vb.embedding AS DOUBLE[])) >= 0.2
    """,
    "q_range_join": """
        SELECT
            p.event_id AS purchase_id,
            p.user_id,
            COUNT(c.c_ts) AS n_clicks_1h
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT user_id AS c_user_id, ts AS c_ts FROM events
                   WHERE event_type = 'click') c
          ON c.c_user_id = p.user_id
         AND c.c_ts <= p.ts
         AND c.c_ts >= p.ts - INTERVAL 1 HOUR
        GROUP BY p.event_id, p.user_id
    """,
    "q_udaf_weighted": """
        SELECT
            event_type,
            CAST(SUM(CAST(round(value * 100) AS BIGINT)
                     * ((event_id % 5) + 1)) AS DOUBLE)
            / CAST(SUM((event_id % 5) + 1) AS DOUBLE) AS weighted_mean_cents
        FROM events
        GROUP BY event_type
    """,
    "q_sequence_pack": """
        WITH t AS (
            SELECT doc_id, source,
                   len(string_split(text, ' '))::BIGINT AS n_tokens
            FROM documents
        )
        SELECT doc_id, source, n_tokens,
               CAST(floor((SUM(n_tokens) OVER w - n_tokens) / 2048)
                    AS BIGINT) AS chunk_id,
               CAST((SUM(n_tokens) OVER w - n_tokens) % 2048
                    AS BIGINT) AS chunk_offset
        FROM t
        WINDOW w AS (PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "q_stream_join": """
        SELECT
            p.event_id AS purchase_id,
            c.event_id AS click_id,
            p.user_id,
            CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS secs_before
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        JOIN (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts <= p.ts
         AND c.ts >= p.ts - INTERVAL 30 MINUTE
    """,
    "q_string_agg": """
        SELECT
            user_id,
            string_agg(DISTINCT event_type, ',' ORDER BY event_type)
                AS event_types
        FROM events
        GROUP BY user_id
    """,
    "q_median": """
        SELECT
            event_type,
            median(value) AS median_value,
            COUNT(*) AS n
        FROM events
        GROUP BY event_type
    """,
    "q_corpus_curate": """
        WITH scored AS (
            SELECT
                doc_id, text,
                CASE
                    WHEN len(list_filter(string_split(lower(text), ' '),
                         w -> w IN ('the','and','of','is'))) >=
                         len(list_filter(string_split(lower(text), ' '),
                         w -> w IN ('el','la','de','que')))
                     AND len(list_filter(string_split(lower(text), ' '),
                         w -> w IN ('the','and','of','is'))) >=
                         len(list_filter(string_split(lower(text), ' '),
                         w -> w IN ('der','die','und','das')))
                     AND len(list_filter(string_split(lower(text), ' '),
                         w -> w IN ('the','and','of','is'))) > 0
                    THEN 'en'
                    WHEN len(list_filter(string_split(lower(text), ' '),
                         w -> w IN ('el','la','de','que'))) >=
                         len(list_filter(string_split(lower(text), ' '),
                         w -> w IN ('der','die','und','das')))
                     AND len(list_filter(string_split(lower(text), ' '),
                         w -> w IN ('el','la','de','que'))) > 0
                    THEN 'es'
                    WHEN len(list_filter(string_split(lower(text), ' '),
                         w -> w IN ('der','die','und','das'))) > 0
                    THEN 'de'
                    ELSE 'unknown'
                END AS pred_lang,
                len(string_split(text, ' '))::BIGINT AS n_words,
                CAST(len(list_filter(string_split(text, ' '),
                    w -> lower(w) IN ('the','a','of','and','to','in','is')))
                    AS DOUBLE) / len(string_split(text, ' ')) AS stop_ratio
            FROM documents
        ),
        kept AS (
            SELECT * FROM scored
            WHERE pred_lang = 'en' AND n_words BETWEEN 5 AND 10000
              AND stop_ratio >= 0.0
        ),
        keepers AS (
            SELECT doc_id, text, pred_lang, n_words FROM (
                SELECT k.*,
                       MIN(doc_id) OVER (PARTITION BY md5(trim(text))) AS keeper
                FROM kept k
            ) WHERE doc_id = keeper
        ),
        t AS (SELECT doc_id, string_split(trim(text), ' ') AS arr FROM keepers),
        sh_all AS (
            SELECT DISTINCT t.doc_id,
                   arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS sh
            FROM t, unnest(generate_series(1, len(arr) - 2)) AS g(i)
        ),
        -- document-frequency cap (mirrors shingle_jaccard_pairs max_df)
        sh AS (
            SELECT sh_all.* FROM sh_all
            JOIN (SELECT sh FROM sh_all GROUP BY sh HAVING COUNT(*) <= 1000)
              USING (sh)
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        drops AS (
            SELECT DISTINCT id_b AS doc_id
            FROM shared
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) >= 0.5
        )
        SELECT k.doc_id, k.pred_lang, k.n_words
        FROM keepers k
        LEFT JOIN drops d ON d.doc_id = k.doc_id
        WHERE d.doc_id IS NULL
    """,
    "q_train_test_split": """
        SELECT
            lang,
            CASE WHEN substr(md5(doc_id::VARCHAR || '|split'), 1, 2) < 'cd'
                 THEN 'train' ELSE 'test' END AS split,
            COUNT(*) AS n_docs
        FROM documents
        GROUP BY 1, 2
    """,
    "q_bm25": """
        WITH scored AS (
            SELECT
                doc_id,
                CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
                CAST(len(list_filter(string_split(lower(text), ' '),
                    w -> w = 'spark')) AS BIGINT) AS tf_0,
                CAST(len(list_filter(string_split(lower(text), ' '),
                    w -> w = 'data')) AS BIGINT) AS tf_1
            FROM documents
        ),
        stats AS (
            SELECT
                COUNT(*) AS n_docs,
                CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
                CAST(SUM(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_0,
                CAST(SUM(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_1
            FROM scored
        )
        SELECT
            doc_id,
            dl,
            tf_0,
            tf_1,
            round(
                ln((n_docs - CAST(df_0 AS DOUBLE) + 0.5)
                   / (CAST(df_0 AS DOUBLE) + 0.5) + 1.0)
                  * CAST(tf_0 AS DOUBLE) * (1.2 + 1.0)
                  / (CAST(tf_0 AS DOUBLE)
                     + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
                + ln((n_docs - CAST(df_1 AS DOUBLE) + 0.5)
                     / (CAST(df_1 AS DOUBLE) + 0.5) + 1.0)
                  * CAST(tf_1 AS DOUBLE) * (1.2 + 1.0)
                  / (CAST(tf_1 AS DOUBLE)
                     + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)),
                4) AS bm25_r
        FROM scored CROSS JOIN stats
        WHERE tf_0 + tf_1 > 0
    """,
    "q_integrity_audit": """
        SELECT 'orders_pk_duplicates' AS check_name, COUNT(*) AS n_violations
        FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1)
        UNION ALL
        SELECT 'lineitem_orphan_orderkey', COUNT(*)
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'lineitem_orphan_partkey', COUNT(*)
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
        UNION ALL
        SELECT 'lineitem_nonpositive_qty', COUNT(*)
        FROM lineitem WHERE l_quantity <= 0
        UNION ALL
        SELECT 'lineitem_bad_discount', COUNT(*)
        FROM lineitem WHERE l_discount < 0 OR l_discount > 1
    """,
    "q_sentiment": """
        WITH scored AS (
            SELECT
                doc_id,
                CAST(len(list_filter(string_split(lower(text), ' '),
                    w -> w IN ('fast','small','the')))
                  - len(list_filter(string_split(lower(text), ' '),
                    w -> w IN ('slow','large','error'))) AS BIGINT)
                    AS sentiment_score
            FROM documents
        )
        SELECT
            doc_id,
            sentiment_score,
            CASE WHEN sentiment_score > 0 THEN 'pos'
                 WHEN sentiment_score < 0 THEN 'neg'
                 ELSE 'neutral' END AS sentiment
        FROM scored
    """,
    "q_resample_daily": """
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts)::DATE AS day,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        spans AS (
            SELECT user_id,
                   date_trunc('day', MIN(ts))::DATE AS d0,
                   date_trunc('day', MAX(ts))::DATE AS d1
            FROM events GROUP BY 1
        ),
        calendar AS (
            SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
            FROM spans
        )
        SELECT
            c.user_id,
            strftime(c.day, '%Y-%m-%d') AS day,
            CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events
        FROM calendar c
        LEFT JOIN daily d ON d.user_id = c.user_id AND d.day = c.day
    """,
    "q_moving_avg": """
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts)::DATE AS day,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        spans AS (
            SELECT user_id,
                   date_trunc('day', MIN(ts))::DATE AS d0,
                   date_trunc('day', MAX(ts))::DATE AS d1
            FROM events GROUP BY 1
        ),
        calendar AS (
            SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
            FROM spans
        ),
        filled AS (
            SELECT
                c.user_id,
                c.day,
                CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events
            FROM calendar c
            LEFT JOIN daily d ON d.user_id = c.user_id AND d.day = c.day
        )
        SELECT
            user_id,
            strftime(day, '%Y-%m-%d') AS day,
            n_events,
            CAST(SUM(n_events) OVER w AS BIGINT) AS sum_7d,
            CAST(SUM(n_events) OVER w AS DOUBLE) / COUNT(*) OVER w AS avg_7d
        FROM filled
        WINDOW w AS (
            PARTITION BY user_id ORDER BY day
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
        )
    """,
    "q_sessionize": """
        WITH flagged AS (
            SELECT
                user_id,
                ts,
                event_id,
                CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                          > 1800 * 1000000
                     THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        sessions AS (
            SELECT
                user_id,
                ts,
                CAST(SUM(new_session) OVER (
                    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS BIGINT) AS session_idx
            FROM flagged
        )
        SELECT
            user_id,
            session_idx,
            COUNT(*) AS n_events,
            strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
            strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        FROM sessions
        GROUP BY user_id, session_idx
    """,
    "q_multimodal_meta": """
        SELECT
            doc_id AS media_id,
            (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS media_type,
            octet_length(encode(text))::BIGINT AS byte_len
        FROM documents
    """,
    "q_quality_repetition": """
        WITH w AS (
            SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word
            FROM documents
        ),
        wc AS (
            SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY 1, 2
        ),
        ws AS (
            SELECT
                doc_id,
                CAST(SUM(c) AS BIGINT) AS n_words,
                COUNT(*)::BIGINT AS n_distinct_words,
                MAX(c)::BIGINT AS top_word_count
            FROM wc
            GROUP BY doc_id
        ),
        t AS (
            SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
        ),
        bg AS (
            SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS b
            FROM t, unnest(generate_series(1, len(arr) - 1)) AS g(i)
        ),
        bs AS (
            SELECT
                doc_id,
                COUNT(*)::BIGINT AS n_bigrams,
                COUNT(DISTINCT b)::BIGINT AS n_distinct_bigrams
            FROM bg
            GROUP BY doc_id
        )
        -- LEFT JOIN + COALESCE mirrors repetition_signals: a 1-word doc
        -- has no bigram rows but must still score (0, 0, 0.0); NULL-text
        -- docs get explicit zero-signal rows (they unnest to no rows and
        -- would otherwise vanish from the signal table).
        SELECT
            ws.doc_id,
            n_words,
            n_distinct_words,
            top_word_count,
            CAST(top_word_count AS DOUBLE) / n_words AS top_word_fraction,
            COALESCE(n_bigrams, 0) AS n_bigrams,
            COALESCE(n_distinct_bigrams, 0) AS n_distinct_bigrams,
            CASE WHEN COALESCE(n_bigrams, 0) > 0
                 THEN CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / n_bigrams
                 ELSE 0.0 END AS dup_bigram_fraction
        FROM ws
        LEFT JOIN bs ON ws.doc_id = bs.doc_id
        UNION ALL
        SELECT
            doc_id, 0, 0, 0, 0.0, 0, 0, 0.0
        FROM documents
        WHERE text IS NULL
    """,
    "q_decontaminate": """
        WITH t AS (
            SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
        ),
        sh_all AS (
            SELECT DISTINCT
                t.doc_id,
                arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS sh
            FROM t, unnest(generate_series(1, len(arr) - 2)) AS g(i)
        ),
        bench AS (
            SELECT doc_id AS bench_id, sh FROM sh_all WHERE doc_id % 100 = 0
        ),
        corp_all AS (
            SELECT doc_id AS corpus_id, sh FROM sh_all WHERE doc_id % 100 <> 0
        ),
        -- corpus-side df cap (mirrors decontaminate max_df)
        corp AS (
            SELECT corp_all.* FROM corp_all
            JOIN (
                SELECT sh FROM corp_all GROUP BY sh HAVING COUNT(*) <= 1000
            ) USING (sh)
        )
        SELECT
            corpus_id,
            bench_id,
            COUNT(*) AS n_shared_shingles
        FROM corp
        JOIN bench USING (sh)
        GROUP BY 1, 2
    """,
    "q_percentile_exact": """
        SELECT
            l_returnflag,
            quantile_cont(l_quantity, 0.25) AS p25,
            quantile_cont(l_quantity, 0.5) AS p50,
            quantile_cont(l_quantity, 0.75) AS p75,
            quantile_cont(l_quantity, 0.875) AS p87_5,
            COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
    """,
}


def _mix_bound_case() -> str:
    """CASE expression for the stratified-sample rate bounds — generated
    from the SAME Python constants the Spark query uses
    (queries_ext.MIX_RATES via curate._hex_bound), so the two engines
    cannot drift."""
    from telecom_competitor_analysis_spark.operators.curate import _hex_bound
    from telecom_competitor_analysis_spark.plans.queries_ext import (
        MIX_DEFAULT_RATE,
        MIX_RATES,
    )

    whens = "\n            ".join(
        f"WHEN '{k}' THEN '{_hex_bound(v)}'" for k, v in sorted(MIX_RATES.items())
    )
    return (
        "CASE lang\n            "
        + whens
        + f"\n            ELSE '{_hex_bound(MIX_DEFAULT_RATE)}' END"
    )


def _hex_bound_chars() -> int:
    from telecom_competitor_analysis_spark.operators.curate import (
        HEX_BOUND_CHARS,
    )

    return HEX_BOUND_CHARS


EXT_ORACLES["q_stratified_sample"] = f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR) || '|mix'), 1, {_hex_bound_chars()})
          < {_mix_bound_case()}
"""


_HAMMING_16 = " + ".join(
    f"(CASE WHEN substr(sa, {i + 1}, 1) != substr(sb, {i + 1}, 1) "
    "THEN 1 ELSE 0 END)"
    for i in range(16)
)

EXT_ORACLES["q_simhash_pairs"] = f"""
    WITH tokens AS (
        SELECT doc_id, md5(w) AS wh
        FROM (
            SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
            FROM documents
        )
    ),
    sums AS (
        SELECT
            doc_id,
            {_SIMHASH_SUMS}
        FROM tokens
        GROUP BY doc_id
    ),
    sig AS (SELECT doc_id, {_SIMHASH_BITS} AS simhash FROM sums),
    banded AS (
        SELECT doc_id, simhash, 0 AS band_idx,
               substr(simhash, 1, 8) AS band_key FROM sig
        UNION ALL
        SELECT doc_id, simhash, 1 AS band_idx,
               substr(simhash, 9, 8) AS band_key FROM sig
    ),
    -- mega-bucket cap (mirrors simhash_candidate_pairs max_bucket_size)
    ok AS (
        SELECT band_idx, band_key FROM banded
        GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND 1000
    ),
    b2 AS (SELECT banded.* FROM banded JOIN ok USING (band_idx, band_key)),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, a.simhash AS sa,
                        b.doc_id AS id_b, b.simhash AS sb
        FROM b2 a
        JOIN b2 b ON a.band_idx = b.band_idx
                 AND a.band_key = b.band_key
                 AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST({_HAMMING_16} AS INT) AS hamming
    FROM cand
    WHERE {_HAMMING_16} <= 1
"""


def _curate_keepers_ctes(p: str, src_where: str) -> str:
    """CTE chain for curation stages (a)+(b): language/quality scoring +
    exact dedup, over `documents WHERE src_where`. Emits {p}scored,
    {p}kept, {p}keepers (doc_id, text, pred_lang, n_words) — the same
    stages the q_corpus_curate oracle spells out inline, parameterized so
    the incremental oracle can run the chain twice (keep-list side and
    new-batch side) without hand-duplicated SQL that could drift."""

    def cnt(terms: tuple[str, ...]) -> str:
        lst = ", ".join(f"'{t}'" for t in terms)
        return (
            "len(list_filter(string_split(lower(text), ' '), "
            f"w -> w IN ({lst})))"
        )

    en, es, de = (
        cnt(("the", "and", "of", "is")),
        cnt(("el", "la", "de", "que")),
        cnt(("der", "die", "und", "das")),
    )
    return f"""
        {p}scored AS (
            SELECT
                doc_id, text,
                CASE
                    WHEN {en} >= {es} AND {en} >= {de} AND {en} > 0 THEN 'en'
                    WHEN {es} >= {de} AND {es} > 0 THEN 'es'
                    WHEN {de} > 0 THEN 'de'
                    ELSE 'unknown'
                END AS pred_lang,
                len(string_split(text, ' '))::BIGINT AS n_words,
                CAST(len(list_filter(string_split(text, ' '),
                    w -> lower(w) IN ('the','a','of','and','to','in','is')))
                    AS DOUBLE) / len(string_split(text, ' ')) AS stop_ratio
            FROM documents
            WHERE {src_where}
        ),
        {p}kept AS (
            SELECT * FROM {p}scored
            WHERE pred_lang = 'en' AND n_words BETWEEN 5 AND 10000
              AND stop_ratio >= 0.0
        ),
        {p}keepers AS (
            SELECT doc_id, text, pred_lang, n_words FROM (
                SELECT k.*,
                       MIN(doc_id) OVER (PARTITION BY md5(trim(text))) AS keeper
                FROM {p}kept k
            ) WHERE doc_id = keeper
        )"""


def _neardup_pairs_ctes(p: str, src_cte: str, threshold: float) -> str:
    """CTE chain for shingle-Jaccard near-dup pairs over `src_cte`
    (needs doc_id, text): {p}t → {p}sh_all → {p}sh (df-capped, mirrors
    shingle_jaccard_pairs max_df) → {p}sizes → {p}pairs (id_a < id_b,
    jaccard >= threshold)."""
    return f"""
        {p}t AS (
            SELECT doc_id, string_split(trim(text), ' ') AS arr FROM {src_cte}
        ),
        {p}sh_all AS (
            SELECT DISTINCT {p}t.doc_id,
                   arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS sh
            FROM {p}t, unnest(generate_series(1, len(arr) - 2)) AS g(i)
        ),
        {p}sh AS (
            SELECT {p}sh_all.* FROM {p}sh_all
            JOIN (SELECT sh FROM {p}sh_all GROUP BY sh HAVING COUNT(*) <= 1000)
              USING (sh)
        ),
        {p}sizes AS (
            SELECT doc_id, COUNT(*) AS n_sh FROM {p}sh GROUP BY doc_id
        ),
        {p}pairs AS (
            SELECT id_a, id_b
            FROM (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
                FROM {p}sh a JOIN {p}sh b
                  ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ) s
            JOIN {p}sizes sa ON sa.doc_id = s.id_a
            JOIN {p}sizes sb ON sb.doc_id = s.id_b
            WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared)
                  >= {threshold}
        )"""


# Incremental curation: even doc_ids are the existing keep-list, odd are
# the new batch (so a row's side IS its parity — the oracle uses doc_id % 2
# where the Spark operator carries an explicit __new tag). Stage mapping to
# operators/curate.py curate_incremental: pk*/pd*/pkfinal = curate_corpus
# over the prev half (scoring + exact dedup + near-dup removal — the SAME
# pipeline the Spark side's prev_keepers goes through; stopping at exact
# dedup would make the oracle's keep-list a strict superset of Spark's),
# nb* = batch-internal curation (curate_corpus over the new batch,
# including new-new near-dup drops), fresh = digest anti-join vs keep-list,
# tg* = near-dup pairs over keep-list ∪ fresh with cross-side drops killing
# the new doc.
EXT_ORACLES["q_curate_incremental"] = f"""
    WITH {_curate_keepers_ctes("pk", "doc_id % 2 = 0")},
    {_neardup_pairs_ctes("pd", "pkkeepers", 0.5)},
    pkfinal AS (
        SELECT k.* FROM pkkeepers k
        LEFT JOIN (SELECT DISTINCT id_b FROM pdpairs) d ON d.id_b = k.doc_id
        WHERE d.id_b IS NULL
    ),
    {_curate_keepers_ctes("nb", "doc_id % 2 = 1")},
    {_neardup_pairs_ctes("nd", "nbkeepers", 0.5)},
    nbbatch AS (
        SELECT k.* FROM nbkeepers k
        LEFT JOIN (SELECT DISTINCT id_b FROM ndpairs) d ON d.id_b = k.doc_id
        WHERE d.id_b IS NULL
    ),
    fresh AS (
        SELECT b.* FROM nbbatch b
        LEFT JOIN (
            SELECT DISTINCT md5(trim(text)) AS dg FROM pkfinal
        ) pd ON pd.dg = md5(trim(b.text))
        WHERE pd.dg IS NULL
    ),
    tagged AS (
        SELECT doc_id, text FROM fresh
        UNION ALL
        SELECT doc_id, text FROM pkfinal
    ),
    {_neardup_pairs_ctes("tg", "tagged", 0.5)},
    cross_drops AS (
        SELECT DISTINCT
            CASE WHEN id_a % 2 = 1 THEN id_a ELSE id_b END AS doc_id
        FROM tgpairs
        WHERE (id_a % 2) <> (id_b % 2)
    )
    SELECT f.doc_id, f.pred_lang, f.n_words
    FROM fresh f
    LEFT JOIN cross_drops cd ON cd.doc_id = f.doc_id
    WHERE cd.doc_id IS NULL
"""

# --- feature extraction (operators/features.py) ---------------------------

EXT_ORACLES["q_tfidf"] = """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents WHERE text IS NOT NULL
    ),
    tf AS (
        SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok WHERE word <> '' GROUP BY doc_id, word
    ),
    df AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word
    ),
    n AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id, word, tf, df,
           round(tf * ln(n_docs / CAST(df AS DOUBLE)), 6) AS tfidf_r,
           CAST(row_number() OVER (
                PARTITION BY doc_id
                ORDER BY tf * ln(n_docs / CAST(df AS DOUBLE)) DESC,
                         word ASC) AS INT) AS rank
    FROM tf JOIN df USING (word) CROSS JOIN n
    QUALIFY rank <= 3
"""

_CENT_AVGS = ", ".join(f"avg(v[{i + 1}]) AS c{i}" for i in range(64))
_CENT_LIST = ", ".join(f"c{i}" for i in range(64))

EXT_ORACLES["q_embedding_outlier"] = f"""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    cm AS (
        SELECT label, {_CENT_AVGS} FROM e GROUP BY label
    ),
    c AS (
        SELECT label, [{_CENT_LIST}] AS cvec FROM cm
    )
    SELECT
        e.vec_id,
        e.label,
        round(list_cosine_similarity(e.v, c.cvec), 6) AS cos_centroid,
        CAST(row_number() OVER (
            PARTITION BY e.label
            ORDER BY round(list_cosine_similarity(e.v, c.cvec), 6) ASC,
                     e.vec_id ASC
        ) AS INT) AS outlier_rank
    FROM e JOIN c USING (label)
"""

# --- formerly rows-only, now oracle-checked: all three are deterministic
# by construction (md5-derived hyperplanes / lowest-id anchors / min-label
# propagation), so a DuckDB mirror is possible — only sketches, ML-seeded
# sampling, and the stubbed media decode remain legitimately rows-only.

# q_dedup_clusters — connected components over the MinHash-LSH pair graph
# (operators/dedup.py:346 min-label propagation). The recursive CTE
# propagates a label along an edge only when it is smaller than the target
# node: the component-minimum label satisfies that on every path, so each
# node's MIN(label) is exactly the component minimum, while larger labels
# are pruned instead of enumerating all |component|² pairs.
# Shared component-labeling CTE chain (shingles → MinHash signature →
# banded LSH pairs → recursive connected components): the single
# definition composed by BOTH q_dedup_clusters and q_leakage_safe_split
# (r7 review: the split oracle previously carved this out of the
# clusters oracle by string surgery — a cosmetic edit there would have
# produced invalid SQL far from the edit site).
_NEARDUP_CC_CTES = """
    WITH RECURSIVE t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    sh AS (
        SELECT DISTINCT
            t.doc_id,
            arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS word
        FROM t, unnest(generate_series(1, len(arr) - 2)) AS g(i)
    ),
    sig AS (
        SELECT
            doc_id,
            MIN(md5(word || '#0')) AS h0,
            MIN(md5(word || '#1')) AS h1,
            MIN(md5(word || '#2')) AS h2,
            MIN(md5(word || '#3')) AS h3
        FROM sh
        GROUP BY doc_id
    ),
    banded AS (
        SELECT doc_id, 0 AS band_idx, md5(h0 || '|' || h1) AS band_key FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_idx, md5(h2 || '|' || h3) AS band_key FROM sig
    ),
    ok AS (
        SELECT band_idx, band_key FROM banded
        GROUP BY 1, 2 HAVING COUNT(*) <= 1000
    ),
    banded_ok AS (
        SELECT banded.* FROM banded JOIN ok USING (band_idx, band_key)
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded_ok a
        JOIN banded_ok b
          ON a.band_idx = b.band_idx
         AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    cc(id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, cc.label
        FROM cc JOIN edges e ON cc.id = e.src
        WHERE cc.label < e.dst
    )"""

EXT_ORACLES["q_dedup_clusters"] = (
    _NEARDUP_CC_CTES
    + """
    SELECT id, MIN(label) AS cluster_id
    FROM cc
    GROUP BY id
"""
)

# q_embedding_lsh_topk — same md5-derived hyperplane buckets as the Spark
# plan (operators/similarity.py:98, n_planes=4 seed=0), candidates only
# within the shared bucket, exact cosine rank among candidates.
EXT_ORACLES["q_embedding_lsh_topk"] = f"""
    WITH e AS (
        SELECT
            vec_id,
            CAST(embedding AS DOUBLE[]) AS v,
            {_hyperplane_bucket_sql("embedding", n_planes=4, seed=0)} AS bucket
        FROM embeddings
    )
    SELECT
        q.vec_id AS query_id,
        c.vec_id AS neighbor_id,
        CAST(row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(c.v, q.v) DESC, c.vec_id ASC
        ) AS INT) AS rank
    FROM e c
    JOIN (SELECT * FROM e WHERE vec_id < 5) q ON c.bucket = q.bucket
    WHERE c.vec_id != q.vec_id
    QUALIFY rank <= 10
"""

# --- round 4 additions ----------------------------------------------------

# q_simhash64 — 64-bit signature: per-word nibble source is
# md5(w) || md5(w || '#1') (64 hex chars), bit i = sign of the summed ±1
# high-bits of nibble i (operators/dedup.py::simhash64).
_SIMHASH64_SUMS = ",\n            ".join(
    "SUM(CASE WHEN substr(wh, {i}, 1) IN "
    "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s{j}".format(
        i=i + 1, j=i
    )
    for i in range(64)
)
_SIMHASH64_BITS = " || ".join(
    f"(CASE WHEN s{i} >= 0 THEN '1' ELSE '0' END)" for i in range(64)
)
_SIMHASH64_TOKENS = """
        SELECT doc_id, md5(w) || md5(w || '#1') AS wh
        FROM (
            SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
            FROM documents
        )
"""

EXT_ORACLES["q_simhash64"] = f"""
    WITH tokens AS ({_SIMHASH64_TOKENS}),
    sums AS (
        SELECT
            doc_id,
            {_SIMHASH64_SUMS}
        FROM tokens
        GROUP BY doc_id
    )
    SELECT doc_id, {_SIMHASH64_BITS} AS simhash
    FROM sums
"""

_HAMMING64 = " + ".join(
    f"(CASE WHEN substr(sig_a, {i + 1}, 1) != "
    f"substr(sig_b, {i + 1}, 1) THEN 1 ELSE 0 END)"
    for i in range(64)
)

EXT_ORACLES["q_simhash64_pairs"] = f"""
    WITH tokens AS ({_SIMHASH64_TOKENS}),
    sums AS (
        SELECT
            doc_id,
            {_SIMHASH64_SUMS}
        FROM tokens
        GROUP BY doc_id
    ),
    sig AS (
        SELECT doc_id, {_SIMHASH64_BITS} AS simhash FROM sums
    ),
    banded AS (
        SELECT doc_id, simhash, b.band_idx,
               substr(simhash, b.band_idx * 16 + 1, 16) AS band_key
        FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band_idx) b
    ),
    ok AS (
        SELECT band_idx, band_key FROM banded
        GROUP BY 1, 2 HAVING COUNT(*) <= 1000
    ),
    banded_ok AS (
        SELECT banded.* FROM banded JOIN ok USING (band_idx, band_key)
    ),
    cand AS (
        SELECT DISTINCT
            a.doc_id AS id_a, a.simhash AS sig_a,
            b.doc_id AS id_b, b.simhash AS sig_b
        FROM banded_ok a
        JOIN banded_ok b
          ON a.band_idx = b.band_idx
         AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, hamming
    FROM (
        SELECT id_a, id_b,
               CAST({_HAMMING64} AS INT) AS hamming
        FROM cand
    )
    WHERE hamming <= 3
"""

# q_minhash_jaccard_est — signature-agreement Jaccard estimate for the
# MinHash-LSH candidate pairs (fraction of the 4 components that agree).
EXT_ORACLES["q_minhash_jaccard_est"] = """
    WITH t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    sh AS (
        SELECT DISTINCT
            t.doc_id,
            arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS word
        FROM t, unnest(generate_series(1, len(arr) - 2)) AS g(i)
    ),
    sig AS (
        SELECT
            doc_id,
            MIN(md5(word || '#0')) AS h0,
            MIN(md5(word || '#1')) AS h1,
            MIN(md5(word || '#2')) AS h2,
            MIN(md5(word || '#3')) AS h3
        FROM sh
        GROUP BY doc_id
    ),
    banded AS (
        SELECT doc_id, 0 AS band_idx, md5(h0 || '|' || h1) AS band_key FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_idx, md5(h2 || '|' || h3) AS band_key FROM sig
    ),
    ok AS (
        SELECT band_idx, band_key FROM banded
        GROUP BY 1, 2 HAVING COUNT(*) <= 1000
    ),
    banded_ok AS (
        SELECT banded.* FROM banded JOIN ok USING (band_idx, band_key)
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded_ok a
        JOIN banded_ok b
          ON a.band_idx = b.band_idx
         AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    )
    SELECT
        p.id_a,
        p.id_b,
        CAST((CASE WHEN sa.h0 = sb.h0 THEN 1 ELSE 0 END)
           + (CASE WHEN sa.h1 = sb.h1 THEN 1 ELSE 0 END)
           + (CASE WHEN sa.h2 = sb.h2 THEN 1 ELSE 0 END)
           + (CASE WHEN sa.h3 = sb.h3 THEN 1 ELSE 0 END) AS DOUBLE) / 4.0
            AS est_jaccard
    FROM pairs p
    JOIN sig sa ON sa.doc_id = p.id_a
    JOIN sig sb ON sb.doc_id = p.id_b
"""

# q_word_freq — corpus top-50 words by occurrence with doc frequency.
EXT_ORACLES["q_word_freq"] = """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word
        FROM documents
    ),
    c AS (
        SELECT word,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM tok GROUP BY word
    )
    SELECT
        CAST(row_number() OVER (
            ORDER BY n_occurrences DESC, word ASC) AS INT) AS rank,
        word, n_occurrences, n_docs
    FROM c
    QUALIFY rank <= 50
"""

# q_group_topk_words — per-language top-10 words by occurrence.
EXT_ORACLES["q_group_topk_words"] = """
    WITH tok AS (
        SELECT lang, unnest(string_split(trim(text), ' ')) AS word
        FROM documents
    ),
    c AS (
        SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM tok GROUP BY lang, word
    )
    SELECT
        lang,
        CAST(row_number() OVER (
            PARTITION BY lang
            ORDER BY n_occurrences DESC, word ASC) AS INT) AS rank,
        word, n_occurrences
    FROM c
    QUALIFY rank <= 10
"""

# q_common_ngrams — top-20 3-word shingles by distinct-document frequency.
EXT_ORACLES["q_common_ngrams"] = """
    WITH t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    sh AS (
        SELECT DISTINCT
            t.doc_id,
            arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS ngram
        FROM t, unnest(generate_series(1, len(arr) - 2)) AS g(i)
    ),
    c AS (
        SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM sh GROUP BY ngram
    )
    SELECT
        CAST(row_number() OVER (ORDER BY n_docs DESC, ngram ASC) AS INT)
            AS rank,
        ngram, n_docs
    FROM c
    QUALIFY rank <= 20
"""

# q_pii_scrub — identical synthetic PII injection, then regex masking.
EXT_ORACLES["q_pii_scrub"] = r"""
    WITH s AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or 555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS synth
        FROM documents
    )
    SELECT
        doc_id,
        regexp_replace(
            regexp_replace(
                synth, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                '<EMAIL>', 'g'),
            '\b555-[0-9]{4}\b', '<PHONE>', 'g') AS scrubbed_text,
        CAST(len(regexp_extract_all(
            synth, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
            AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(synth, '\b555-[0-9]{4}\b'))
            AS BIGINT) AS n_phones
    FROM s
"""

# q_random_projection — same md5-derived ±1 JL matrix as
# operators/features.py::random_projection, inlined as literal arrays;
# DuckDB list_dot_product sums in index order = Spark's sequential fold,
# and both round to 6 → bit-identical output.
def _rp_cols_sql(in_dim: int = 64, out_dim: int = 16, seed: int = 0) -> str:
    import math

    scale = 1.0 / math.sqrt(out_dim)
    cols = []
    for j in range(out_dim):
        w = [
            "1.0"
            if hashlib.md5(f"rp|{seed}|{j}|{i}".encode()).hexdigest()[0]
            in "89abcdef"
            else "-1.0"
            for i in range(in_dim)
        ]
        arr = "[" + ", ".join(w) + "]"
        cols.append(
            f"round(list_dot_product(CAST(embedding AS DOUBLE[]), {arr})"
            f" * {scale!r}, 6) AS d{j}"
        )
    return ",\n        ".join(cols)


EXT_ORACLES["q_random_projection"] = f"""
    SELECT
        vec_id,
        {_rp_cols_sql()}
    FROM embeddings
"""

# q_session_stats — per-user aggregates over gap-sessionized events
# (same sessionization CTE as q_sessionize, then two grouping levels).
EXT_ORACLES["q_session_stats"] = """
    WITH flagged AS (
        SELECT
            user_id,
            ts,
            event_id,
            CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                      > 1800 * 1000000
                 THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    numbered AS (
        SELECT
            user_id,
            ts,
            CAST(SUM(new_session) OVER (
                PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS BIGINT) AS session_idx
        FROM flagged
    ),
    sessions AS (
        SELECT
            user_id,
            session_idx,
            CAST(COUNT(*) AS BIGINT) AS n_events,
            CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000
                 AS BIGINT) AS dur_sec
        FROM numbered
        GROUP BY user_id, session_idx
    )
    SELECT
        user_id,
        CAST(COUNT(*) AS BIGINT) AS n_sessions,
        CAST(SUM(n_events) AS BIGINT) AS total_events,
        round(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6)
            AS avg_events_per_session,
        MAX(dur_sec) AS max_session_sec
    FROM sessions
    GROUP BY user_id
"""

# q_dup_graph_stats — degree histogram of the MinHash-LSH pair graph.
EXT_ORACLES["q_dup_graph_stats"] = """
    WITH t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    sh AS (
        SELECT DISTINCT
            t.doc_id,
            arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS word
        FROM t, unnest(generate_series(1, len(arr) - 2)) AS g(i)
    ),
    sig AS (
        SELECT
            doc_id,
            MIN(md5(word || '#0')) AS h0,
            MIN(md5(word || '#1')) AS h1,
            MIN(md5(word || '#2')) AS h2,
            MIN(md5(word || '#3')) AS h3
        FROM sh
        GROUP BY doc_id
    ),
    banded AS (
        SELECT doc_id, 0 AS band_idx, md5(h0 || '|' || h1) AS band_key FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_idx, md5(h2 || '|' || h3) AS band_key FROM sig
    ),
    ok AS (
        SELECT band_idx, band_key FROM banded
        GROUP BY 1, 2 HAVING COUNT(*) <= 1000
    ),
    banded_ok AS (
        SELECT banded.* FROM banded JOIN ok USING (band_idx, band_key)
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded_ok a
        JOIN banded_ok b
          ON a.band_idx = b.band_idx
         AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    ),
    deg AS (
        SELECT id, CAST(COUNT(*) AS BIGINT) AS degree
        FROM (
            SELECT id_a AS id FROM pairs
            UNION ALL
            SELECT id_b AS id FROM pairs
        )
        GROUP BY id
    )
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM deg GROUP BY degree
"""

# q_key_skew — top-10 hottest join keys with share of total rows.
EXT_ORACLES["q_key_skew"] = """
    WITH c AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY l_partkey
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM lineitem)
    SELECT
        CAST(row_number() OVER (
            ORDER BY n_rows DESC, l_partkey ASC) AS INT) AS rank,
        l_partkey,
        n_rows,
        round(CAST(n_rows AS DOUBLE) / n_total, 8) AS share
    FROM c CROSS JOIN t
    QUALIFY rank <= 10
"""

# q_winsorize — per-group [p1, p99] clip; quantile_cont's linear
# interpolation matches Spark's exact percentile on integer inputs.
EXT_ORACLES["q_winsorize"] = """
    WITH d AS (
        SELECT
            l_orderkey,
            l_linenumber,
            l_returnflag,
            CAST(round(l_extendedprice * 100.0, 0) AS BIGINT) AS price_cents
        FROM lineitem
    ),
    b AS (
        SELECT *,
               quantile_cont(price_cents, 0.01)
                   OVER (PARTITION BY l_returnflag) AS p01,
               quantile_cont(price_cents, 0.99)
                   OVER (PARTITION BY l_returnflag) AS p99
        FROM d
    )
    SELECT
        l_orderkey,
        l_linenumber,
        l_returnflag,
        price_cents,
        round(least(greatest(CAST(price_cents AS DOUBLE), p01), p99), 2)
            AS clipped_cents
    FROM b
"""

# q_corpus_diff — full-outer digest join between two deterministic
# snapshot slices, classified and counted.
EXT_ORACLES["q_corpus_diff"] = """
    WITH old AS (
        SELECT doc_id, md5(trim(text)) AS dig_a
        FROM documents WHERE doc_id % 2 = 0
    ),
    new AS (
        SELECT doc_id,
               md5(CASE WHEN doc_id % 5 = 0 THEN trim(text) || ' v2'
                        ELSE trim(text) END) AS dig_b
        FROM documents WHERE doc_id % 3 != 0
    ),
    j AS (
        SELECT
            CASE WHEN dig_a IS NULL THEN 'added'
                 WHEN dig_b IS NULL THEN 'removed'
                 WHEN dig_a != dig_b THEN 'changed'
                 ELSE 'unchanged' END AS status
        FROM old FULL OUTER JOIN new USING (doc_id)
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM j GROUP BY status
"""

# q_session_window — built-in session_window twin: SAME gap split as
# q_sessionize (empirically verified on Spark 4.1.2: an event exactly
# gap after the previous one MERGES into the session — the split
# condition is strictly >, matching the hand-rolled form).
EXT_ORACLES["q_session_window"] = """
    WITH flagged AS (
        SELECT
            user_id,
            ts,
            event_id,
            CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                      > 1800 * 1000000
                 THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    numbered AS (
        SELECT
            user_id,
            ts,
            CAST(SUM(new_session) OVER (
                PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS BIGINT) AS session_idx
        FROM flagged
    )
    SELECT
        user_id,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM numbered
    GROUP BY user_id, session_idx
"""

# q_event_funnel — chained first-qualifying-event windows, then counts.
EXT_ORACLES["q_event_funnel"] = """
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS us FROM events
    ),
    w1 AS (
        SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END)
                  OVER (PARTITION BY user_id) AS fv
        FROM e
    ),
    w2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND us >= fv
                           THEN us END)
                  OVER (PARTITION BY user_id) AS fc
        FROM w1
    ),
    w3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us >= fc
                           THEN us END)
                  OVER (PARTITION BY user_id) AS fp
        FROM w2
    ),
    u AS (
        SELECT user_id, MAX(fv) AS fv, MAX(fc) AS fc, MAX(fp) AS fp
        FROM w3 GROUP BY user_id
    )
    SELECT
        CAST(COUNT(CASE WHEN fv IS NOT NULL THEN 1 END) AS BIGINT)
            AS n_view,
        CAST(COUNT(CASE WHEN fc IS NOT NULL THEN 1 END) AS BIGINT)
            AS n_view_click,
        CAST(COUNT(CASE WHEN fp IS NOT NULL THEN 1 END) AS BIGINT)
            AS n_view_click_purchase
    FROM u
"""

# q_chunk_overlap — 32-token windows at stride 16; DuckDB list_slice is
# inclusive-end and clamps, matching Spark slice(arr, start, 32).
EXT_ORACLES["q_chunk_overlap"] = """
    WITH t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    )
    SELECT
        doc_id,
        CAST((i - 1) // 16 AS INT) AS chunk_idx,
        array_to_string(list_slice(arr, i, i + 31), ' ') AS chunk_text,
        CAST(len(list_slice(arr, i, i + 31)) AS INT) AS n_tokens
    FROM t, unnest(generate_series(1, len(arr), 16)) AS g(i)
"""

# q_embedding_quantize — symmetric int8 per-vector max-abs quantization,
# exploded to scalar rows; same (x*127)/m expression order → identical FP.
EXT_ORACLES["q_embedding_quantize"] = """
    WITH e AS (
        SELECT
            vec_id,
            CAST(embedding AS DOUBLE[]) AS v,
            list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                    x -> abs(x))) AS m
        FROM embeddings
    )
    SELECT
        vec_id,
        CAST(i - 1 AS INT) AS dim_idx,
        CAST(CASE WHEN m = 0 THEN 0
                  ELSE round(v[i] * 127.0 / m, 0) END AS INT) AS q
    FROM e, unnest(generate_series(1, len(v))) AS g(i)
"""

# q_sample_exact_n — exactly 50 per language by md5 rank (id tie-break).
EXT_ORACLES["q_sample_exact_n"] = """
    SELECT doc_id, lang, source
    FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY lang
        ORDER BY md5(CAST(doc_id AS VARCHAR) || '|bal') ASC, doc_id ASC
    ) <= 50
"""

# q_mix_rebalance — every language downsampled to the smallest language's
# count, same md5 rank ordering.
EXT_ORACLES["q_mix_rebalance"] = """
    WITH c AS (
        SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    m AS (SELECT MIN(n) AS target FROM c)
    SELECT doc_id, lang, source
    FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY lang
        ORDER BY md5(CAST(doc_id AS VARCHAR) || '|bal') ASC, doc_id ASC
    ) <= (SELECT target FROM m)
"""

# q_embedding_ivf_topk — anchors are the 8 lowest-vec_id corpus vectors
# (operators/similarity.py:155, deterministic, no fit), nearest-anchor
# assignment by max dot product with lowest-anchor-id tie-break, nprobe=1.
EXT_ORACLES["q_embedding_ivf_topk"] = """
    WITH a AS (
        SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS avec
        FROM embeddings ORDER BY vec_id ASC LIMIT 8
    ),
    assign AS (
        SELECT
            e.vec_id,
            CAST(e.embedding AS DOUBLE[]) AS v,
            a.anchor_id,
            row_number() OVER (
                PARTITION BY e.vec_id
                ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), a.avec)
                             DESC,
                         a.anchor_id ASC
            ) AS rn
        FROM embeddings e CROSS JOIN a
    ),
    b AS (
        SELECT vec_id, v, anchor_id AS bucket FROM assign WHERE rn = 1
    )
    SELECT
        q.vec_id AS query_id,
        c.vec_id AS neighbor_id,
        CAST(row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(c.v, q.v) DESC, c.vec_id ASC
        ) AS INT) AS rank
    FROM b c
    JOIN (SELECT * FROM b WHERE vec_id < 5) q ON c.bucket = q.bucket
    WHERE c.vec_id != q.vec_id
    QUALIFY rank <= 10
"""

# q_frame_sample — frame count from container metadata (multimodal.py::
# with_frame_count: n_frames = 1 + byte_len % 8, byte_len = utf-8 bytes of
# text per as_media_table), sampled every 2nd index. Both engines emit an
# inclusive arithmetic sequence 0,2,... <= n_frames-1.
EXT_ORACLES["q_frame_sample"] = """
    WITH media AS (
        SELECT
            doc_id AS media_id,
            CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
            END AS media_type,
            strlen(text) AS byte_len
        FROM documents
    )
    SELECT
        media_id,
        media_type,
        CAST(f AS BIGINT) AS frame_idx
    FROM media,
         unnest(generate_series(
             0, CAST(1 + byte_len % 8 AS BIGINT) - 1, 2)) AS t(f)
"""

# q_incremental_topk — the two-batch incremental replay must converge to
# the batch brute-force answer (top-k(top-k(A) ∪ B) == top-k(A ∪ B) under
# the strict cos DESC / neighbor_id ASC order), so the oracle IS the
# brute-force top-10 (same SQL as q_embedding_topk).
EXT_ORACLES["q_incremental_topk"] = EXT_ORACLES["q_embedding_topk"]

# q_bm25_search — inverted-index BM25 (operators/search.py::bm25_topk,
# k1=1.2 b=0.75, Lucene +1-inside-log idf, probe terms join/filter/window).
# Per-(doc,term) scores round to integer micro-units BEFORE the cross-term
# sum (double sums are order-dependent); expression order mirrors the
# Spark plan left-to-right so both engines emit identical doubles.
EXT_ORACLES["q_bm25_search"] = """
    WITH d AS (
        SELECT doc_id AS id, trim(text) AS t FROM documents
    ),
    dl AS (
        SELECT id, CAST(len(string_split(t, ' ')) AS DOUBLE) AS dl FROM d
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
    ),
    tf AS (
        SELECT id, w, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM d, unnest(string_split(t, ' ')) AS u(w)
        WHERE w IN ('join', 'filter', 'window')
        GROUP BY id, w
    ),
    dfreq AS (
        SELECT w, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY w
    )
    SELECT
        id AS doc_id,
        CAST(SUM(CAST(round(
            ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
              * tf * 2.2
              / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
            * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS score_micro
    FROM tf
    JOIN dfreq USING (w)
    JOIN dl USING (id)
    CROSS JOIN stats
    GROUP BY id
    ORDER BY score_micro DESC, id ASC
    LIMIT 20
"""

# q_bigram_lm — add-one-smoothed bigram LM self-scoring (operators/lm.py).
EXT_ORACLES["q_bigram_lm"] = """
    WITH t AS (
        SELECT doc_id AS id, string_split(trim(text), ' ') AS arr
        FROM documents
    ),
    bg AS (
        SELECT id, arr[i] AS w1, arr[i + 1] AS w2
        FROM t, unnest(generate_series(1, len(arr) - 1)) AS g(i)
    ),
    cbg AS (
        SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c_bg
        FROM bg GROUP BY w1, w2
    ),
    cctx AS (
        SELECT w1, CAST(COUNT(*) AS DOUBLE) AS c_ctx FROM bg GROUP BY w1
    ),
    v AS (
        SELECT CAST(COUNT(DISTINCT w) AS DOUBLE) AS v
        FROM t, unnest(arr) AS u(w)
    )
    SELECT
        id AS doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        round(
            CAST(SUM(CAST(round(
                ln((c_bg + 1.0) / (c_ctx + v)) * 1000000.0, 0
            ) AS BIGINT)) AS DOUBLE)
            / (CAST(COUNT(*) AS DOUBLE) * 1000000.0),
            6
        ) AS avg_logp
    FROM bg
    JOIN cbg USING (w1, w2)
    JOIN cctx USING (w1)
    CROSS JOIN v
    GROUP BY id
"""

# q_fuzzy_join — deletion-neighborhood blocking is COMPLETE for edit
# distance <= 1 (operators/fuzzy.py docstring), so the oracle is the
# brute-force quadratic levenshtein filter: same answer, different plan.
EXT_ORACLES["q_fuzzy_join"] = """
    WITH dirty AS (
        SELECT dirty_name, MIN(p_partkey) AS dirty_id
        FROM (
            SELECT p_partkey,
                   substr(p_name, 1, CAST(pos AS INT) - 1)
                     || substr(p_name, CAST(pos AS INT) + 1,
                               strlen(p_name)) AS dirty_name
            FROM (
                SELECT p_partkey, p_name,
                       (p_partkey % strlen(p_name)) + 1 AS pos
                FROM part WHERE p_partkey % 7 = 0
            )
        )
        GROUP BY dirty_name
    ),
    clean AS (
        SELECT p_name, MIN(p_partkey) AS p_partkey FROM part GROUP BY p_name
    )
    SELECT
        d.dirty_id,
        c.p_partkey,
        d.dirty_name,
        c.p_name,
        CAST(levenshtein(d.dirty_name, c.p_name) AS INT) AS distance
    FROM dirty d
    CROSS JOIN clean c
    WHERE levenshtein(d.dirty_name, c.p_name) <= 1
"""

# q_canonical_docs — same cluster CTE as q_dedup_clusters, then keep-best
# (quality = word count, ties -> lowest id) per cluster.
EXT_ORACLES["q_canonical_docs"] = """
    WITH RECURSIVE t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    sh AS (
        SELECT DISTINCT
            t.doc_id,
            arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS word
        FROM t, unnest(generate_series(1, len(arr) - 2)) AS g(i)
    ),
    sig AS (
        SELECT
            doc_id,
            MIN(md5(word || '#0')) AS h0,
            MIN(md5(word || '#1')) AS h1,
            MIN(md5(word || '#2')) AS h2,
            MIN(md5(word || '#3')) AS h3
        FROM sh
        GROUP BY doc_id
    ),
    banded AS (
        SELECT doc_id, 0 AS band_idx, md5(h0 || '|' || h1) AS band_key FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_idx, md5(h2 || '|' || h3) AS band_key FROM sig
    ),
    ok AS (
        SELECT band_idx, band_key FROM banded
        GROUP BY 1, 2 HAVING COUNT(*) <= 1000
    ),
    banded_ok AS (
        SELECT banded.* FROM banded JOIN ok USING (band_idx, band_key)
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded_ok a
        JOIN banded_ok b
          ON a.band_idx = b.band_idx
         AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    cc(id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, cc.label
        FROM cc JOIN edges e ON cc.id = e.src
        WHERE cc.label < e.dst
    ),
    cl AS (
        SELECT id, MIN(label) AS cluster_id FROM cc GROUP BY id
    ),
    q AS (
        SELECT doc_id AS id,
               CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS qual
        FROM documents
    ),
    j AS (
        SELECT
            cl.cluster_id,
            cl.id,
            q.qual,
            row_number() OVER (
                PARTITION BY cl.cluster_id
                ORDER BY q.qual DESC, cl.id ASC
            ) AS rn,
            COUNT(*) OVER (PARTITION BY cl.cluster_id) AS n_members
        FROM cl JOIN q USING (id)
    )
    SELECT
        cluster_id,
        id AS keeper_id,
        qual AS keeper_quality,
        CAST(n_members AS BIGINT) AS n_members
    FROM j
    WHERE rn = 1
"""

# q_weighted_sample — Efraimidis-Spirakis A-ES keys u^(1/w); u from the
# portable Knuth multiplicative hash (curate.py::weighted_sample_topk).
EXT_ORACLES["q_weighted_sample"] = """
    WITH d AS (
        SELECT
            doc_id,
            lang,
            CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS wt,
            (CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) + 0.5)
                / 4294967296.0 AS u
        FROM documents
    )
    SELECT
        doc_id,
        lang,
        CAST(row_number() OVER (
            PARTITION BY lang
            ORDER BY pow(u, 1.0 / wt) DESC, doc_id ASC
        ) AS INT) AS rank
    FROM d
    QUALIFY rank <= 20
"""

# q_cdc_apply — latest-seq-wins MERGE semantics over snapshot + derived
# change feed (updates %10, tombstones %17, key+1e6 inserts %25).
EXT_ORACLES["q_cdc_apply"] = """
    WITH feed AS (
        SELECT p_partkey AS key,
               CAST(round(p_retailprice * 100.0, 0) AS BIGINT) AS price_cents,
               CAST(0 AS INT) AS seq, 'I' AS op
        FROM part
        UNION ALL
        SELECT p_partkey,
               CAST(round(p_retailprice * 100.0, 0) AS BIGINT) + 100,
               CAST(1 AS INT), 'U'
        FROM part WHERE p_partkey % 10 = 0
        UNION ALL
        SELECT p_partkey, CAST(NULL AS BIGINT), CAST(2 AS INT), 'D'
        FROM part WHERE p_partkey % 17 = 0
        UNION ALL
        SELECT p_partkey + 1000000,
               CAST(round(p_retailprice * 100.0, 0) AS BIGINT),
               CAST(1 AS INT), 'I'
        FROM part WHERE p_partkey % 25 = 0
    )
    SELECT key, price_cents, seq AS last_seq
    FROM feed
    QUALIFY row_number() OVER (PARTITION BY key ORDER BY seq DESC) = 1
        AND op != 'D'
"""

# q_retention_cohorts — weekly cohort retention (long form). Both engines
# truncate to ISO Monday; offsets are exact multiples of 7 days so the
# division is exact in both.
EXT_ORACLES["q_retention_cohorts"] = """
    WITH firstw AS (
        SELECT user_id,
               CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events
    )
    SELECT
        strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
        CAST((week - cohort_week) / 7 AS INT) AS week_offset,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM active JOIN firstw USING (user_id)
    GROUP BY 1, 2
"""

# q_range_window — value-based RANGE frame (trailing 3599 s inclusive)
# over per-user epoch seconds; both engines floor ts to whole seconds.
EXT_ORACLES["q_range_window"] = """
    WITH d AS (
        SELECT
            event_id,
            user_id,
            CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
            CAST(round(value * 100.0, 0) AS BIGINT) AS cents
        FROM events
    )
    SELECT
        event_id,
        user_id,
        CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
        CAST(SUM(cents) OVER w AS BIGINT) AS sum_cents_1h
    FROM d
    WINDOW w AS (
        PARTITION BY user_id ORDER BY epoch_s
        RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW
    )
"""

# q_ann_recall — recall@10 of the LSH approximate ranking vs the exact
# brute-force ranking, composed from the two existing deterministic
# mirrors as CTEs.
EXT_ORACLES["q_ann_recall"] = f"""
    WITH exact AS ({EXT_ORACLES["q_embedding_topk"]}),
    approx AS ({EXT_ORACLES["q_embedding_lsh_topk"]})
    SELECT
        e.query_id,
        CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_matched,
        round(COUNT(a.neighbor_id) / 10.0, 6) AS recall_at_10
    FROM exact e
    LEFT JOIN approx a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id
"""

# q_variant_extract — typed extraction from the VARIANT-parsed props;
# DuckDB mirrors with JSON functions (values portable, encodings not).
EXT_ORACLES["q_variant_extract"] = """
    SELECT
        event_id,
        CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
        CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        json_extract(props, '$.missing') IS NULL AS missing_is_null
    FROM events
"""

# q_pagerank — 3 unrolled integer-micro PageRank rounds over the same
# banded MinHash-LSH pair graph as q_dedup_clusters (damping 0.85;
# contributions/init/damping terms all rounded to 1e-6 units before any
# sum, so each iteration is an exact integer fixpoint in both engines).
_PR_ITER = """
    it{K} AS (
        SELECT
            nodes.id,
            CAST(round(150000.0 / stats.n) AS BIGINT)
            + CAST(round(0.85 * CAST(COALESCE(s.insum, 0) AS DOUBLE))
                   AS BIGINT) AS p
        FROM nodes
        CROSS JOIN stats
        LEFT JOIN (
            SELECT
                e.dst AS id,
                CAST(SUM(CAST(round(
                    CAST(prev.p AS DOUBLE) / CAST(deg.deg AS DOUBLE), 0
                ) AS BIGINT)) AS BIGINT) AS insum
            FROM edges e
            JOIN it{PREV} prev ON e.src = prev.id
            JOIN deg ON e.src = deg.src
            GROUP BY e.dst
        ) s ON nodes.id = s.id
    )"""

EXT_ORACLES["q_pagerank"] = (
    """
    WITH t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    sh AS (
        SELECT DISTINCT
            t.doc_id,
            arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS word
        FROM t, unnest(generate_series(1, len(arr) - 2)) AS g(i)
    ),
    sig AS (
        SELECT
            doc_id,
            MIN(md5(word || '#0')) AS h0,
            MIN(md5(word || '#1')) AS h1,
            MIN(md5(word || '#2')) AS h2,
            MIN(md5(word || '#3')) AS h3
        FROM sh
        GROUP BY doc_id
    ),
    banded AS (
        SELECT doc_id, 0 AS band_idx, md5(h0 || '|' || h1) AS band_key FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_idx, md5(h2 || '|' || h3) AS band_key FROM sig
    ),
    ok AS (
        SELECT band_idx, band_key FROM banded
        GROUP BY 1, 2 HAVING COUNT(*) <= 1000
    ),
    banded_ok AS (
        SELECT banded.* FROM banded JOIN ok USING (band_idx, band_key)
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded_ok a
        JOIN banded_ok b
          ON a.band_idx = b.band_idx
         AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    nodes AS (
        SELECT DISTINCT src AS id FROM edges
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes
    ),
    deg AS (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
    ),
    it0 AS (
        SELECT id, CAST(round(1000000.0 / stats.n) AS BIGINT) AS p
        FROM nodes CROSS JOIN stats
    ),"""
    + _PR_ITER.format(K=1, PREV=0)
    + ","
    + _PR_ITER.format(K=2, PREV=1)
    + ","
    + _PR_ITER.format(K=3, PREV=2)
    + """
    SELECT id, p AS pr_micro FROM it3
"""
)

# q_kmv_distinct — K-Minimum-Values sketch (k=64), Bar-Yossef estimator
# (k-1)/u_k. u is exact integer arithmetic over the first 13 hex nibbles
# scaled by 16^13 = 2^52 (every partial sum < 2^53 — exact in double),
# so the estimate is bit-identical across engines.
_KMV_U = "(" + " + ".join(
    "CAST(strpos('0123456789abcdef', substr(__h, {pos}, 1)) - 1 AS DOUBLE)"
    " * {scale!r}".format(pos=i + 1, scale=float(16 ** (12 - i)))
    for i in range(13)
) + ") / 4503599627370496.0"

EXT_ORACLES["q_kmv_distinct"] = f"""
    WITH hashes AS (
        SELECT DISTINCT
            l_returnflag AS g,
            md5(CAST(l_partkey AS VARCHAR)) AS __h
        FROM lineitem
    ),
    ranked AS (
        SELECT g, __h,
               row_number() OVER (PARTITION BY g ORDER BY __h) AS rn
        FROM hashes
    ),
    pg AS (
        SELECT g,
               MAX(CASE WHEN rn = 64 THEN {_KMV_U} END) AS u_k,
               COUNT(*) AS n_seen
        FROM ranked WHERE rn <= 64 GROUP BY g
    ),
    exact AS (
        SELECT l_returnflag AS g,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact
        FROM lineitem GROUP BY 1
    )
    SELECT
        pg.g AS l_returnflag,
        CASE WHEN n_seen < 64 THEN CAST(n_seen AS BIGINT)
             ELSE CAST(round(63.0 / u_k, 0) AS BIGINT) END AS est_distinct,
        n_exact
    FROM pg JOIN exact USING (g)
"""

# Frozen-universe incremental dedup (queries_ext.q_dedup_incremental):
# the index side (keep-list, doc_id % 3 != 0) gets the df cap and its
# per-doc sizes computed over the KEEP-LIST ONLY; the batch side's n_a
# counts ALL its distinct shingles — exactly the semantics
# operators/dedup.py::near_dups_against_index documents.
EXT_ORACLES["q_dedup_incremental"] = """
    WITH kt AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr
        FROM documents WHERE doc_id % 3 <> 0
    ),
    k_all AS (
        SELECT DISTINCT
            kt.doc_id,
            arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS sh
        FROM kt, unnest(generate_series(1, len(arr) - 2)) AS g(i)
    ),
    -- df cap over the keep-list only (frozen index universe)
    postings AS (
        SELECT k_all.* FROM k_all
        JOIN (SELECT sh FROM k_all GROUP BY sh HAVING COUNT(*) <= 1000)
          USING (sh)
    ),
    k_sizes AS (
        SELECT doc_id, COUNT(*) AS n_b FROM postings GROUP BY doc_id
    ),
    bt AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr
        FROM documents WHERE doc_id % 3 = 0
    ),
    b_sh AS (
        SELECT DISTINCT
            bt.doc_id,
            arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS sh
        FROM bt, unnest(generate_series(1, len(arr) - 2)) AS g(i)
    ),
    -- batch doc size counts ALL its shingles (novel content included)
    b_sizes AS (
        SELECT doc_id, COUNT(*) AS n_a FROM b_sh GROUP BY doc_id
    ),
    shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        FROM b_sh a JOIN postings b ON a.sh = b.sh
        GROUP BY 1, 2
    )
    SELECT
        id_a,
        id_b,
        n_shared,
        sa.n_a AS n_a,
        sb.n_b AS n_b,
        CAST(n_shared AS DOUBLE) / (sa.n_a + sb.n_b - n_shared) AS jaccard
    FROM shared
    JOIN b_sizes sa ON sa.doc_id = id_a
    JOIN k_sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_shared AS DOUBLE) / (sa.n_a + sb.n_b - n_shared) >= 0.2
"""

# Materialized-IVF ANN probe (queries_ext.q_ann_index_probe): identical
# quantization to q_embedding_ivf_topk, but the query side probes its
# TWO nearest anchor buckets (rn <= 2) — candidates are the union of
# both probed partitions; a corpus vector lives in exactly one bucket,
# so the union is duplicate-free and the rank is a plain top-k.
EXT_ORACLES["q_ann_index_probe"] = """
    WITH a AS (
        SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS avec
        FROM embeddings ORDER BY vec_id ASC LIMIT 8
    ),
    assign AS (
        SELECT
            e.vec_id,
            CAST(e.embedding AS DOUBLE[]) AS v,
            a.anchor_id,
            row_number() OVER (
                PARTITION BY e.vec_id
                ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), a.avec)
                             DESC,
                         a.anchor_id ASC
            ) AS rn
        FROM embeddings e CROSS JOIN a
    ),
    c AS (
        SELECT vec_id, v, anchor_id AS bucket FROM assign WHERE rn = 1
    ),
    q AS (
        SELECT vec_id, v, anchor_id AS bucket
        FROM assign WHERE vec_id < 5 AND rn <= 2
    )
    SELECT
        q.vec_id AS query_id,
        c.vec_id AS neighbor_id,
        CAST(row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(c.v, q.v) DESC, c.vec_id ASC
        ) AS INT) AS rank
    FROM c
    JOIN q ON c.bucket = q.bucket
    WHERE c.vec_id != q.vec_id
    QUALIFY rank <= 10
"""

# Budget-constrained corpus assembly (queries_ext.q_token_budget_fill):
# running per-language token sum in quality order; a doc is admitted iff
# the budget had room before it (boundary doc included). Docs under the
# min_doc_len=10 quality floor are excluded (mirrors the Spark side,
# where the floor also makes the rank-cap pre-filter provably lossless —
# the oracle needs no rank cap: the cap is answer-preserving, so the
# capped Spark plan must equal this uncapped SQL).
EXT_ORACLES["q_token_budget_fill"] = """
    WITH d AS (
        SELECT
            doc_id,
            lang,
            len(string_split(trim(text), ' '))::BIGINT AS n_words
        FROM documents
        WHERE len(string_split(trim(text), ' ')) >= 10
    ),
    c AS (
        SELECT
            doc_id,
            lang,
            n_words,
            SUM(n_words) OVER (
                PARTITION BY lang
                ORDER BY n_words DESC, doc_id ASC
                ROWS UNBOUNDED PRECEDING
            )::BIGINT AS cum_tokens
        FROM d
    )
    SELECT doc_id, lang, n_words, cum_tokens
    FROM c
    WHERE cum_tokens - n_words < 5000
"""

# Exact-substring duplication diagnostic (queries_ext.q_dup_span_stats):
# 3-gram positions, df >= 2 across distinct docs, gaps-and-islands merge
# of overlapping [pos, pos+2] spans. Positions are 0-based in Spark
# (posexplode) vs 1-based generate_series here — the i-1 keeps them equal.
EXT_ORACLES["q_dup_span_stats"] = """
    WITH t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    grams AS (
        SELECT
            t.doc_id,
            i - 1 AS pos,
            arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS gram
        FROM t, unnest(generate_series(1, len(arr) - 2)) AS g(i)
    ),
    df_tbl AS (
        SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM grams)
        GROUP BY gram HAVING COUNT(*) >= 2
    ),
    dup_occ AS (
        SELECT grams.doc_id, grams.pos, grams.pos + 2 AS e
        FROM grams JOIN df_tbl USING (gram)
    ),
    flagged AS (
        SELECT
            doc_id,
            pos,
            e,
            CASE WHEN prev_max_end IS NULL OR pos > prev_max_end
                 THEN 1 ELSE 0 END AS new_island
        FROM (
            SELECT
                doc_id, pos, e,
                MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) AS prev_max_end
            FROM dup_occ
        )
    ),
    islands AS (
        SELECT
            doc_id, pos, e,
            SUM(new_island) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS UNBOUNDED PRECEDING
            ) AS island
        FROM flagged
    ),
    spans AS (
        SELECT doc_id, island, MIN(pos) AS s, MAX(e) AS e
        FROM islands GROUP BY doc_id, island
    ),
    per_doc AS (
        SELECT
            doc_id,
            COUNT(*) AS n_dup_spans,
            SUM(e - s + 1) AS dup_tokens
        FROM spans GROUP BY doc_id
    ),
    totals AS (
        SELECT doc_id, len(string_split(trim(text), ' '))::BIGINT AS total_tokens
        FROM documents
    )
    SELECT
        totals.doc_id,
        COALESCE(per_doc.n_dup_spans, 0)::BIGINT AS n_dup_spans,
        COALESCE(per_doc.dup_tokens, 0)::BIGINT AS dup_tokens,
        totals.total_tokens,
        round(COALESCE(per_doc.dup_tokens, 0)::DOUBLE / totals.total_tokens, 6)
            AS dup_fraction
    FROM totals LEFT JOIN per_doc USING (doc_id)
"""

def _kmeans_cte_sql(k: int = 4, iters: int = 2, dim: int = 64) -> str:
    """WITH-clause body mirroring operators.similarity.kmeans_assign:
    ``iters`` unrolled Lloyd rounds (seeds = k lowest-id vectors,
    argmax-dot assignment with lowest-cid tie-break, centroid components
    = exact integer-micro sums divided back to double in one fp op —
    identical to the Spark side by construction). The final assignment
    CTE is ``m{iters-1}`` (vec_id, v, cid)."""
    sums = ",\n               ".join(
        f"CAST(SUM(CAST(round(v[{d + 1}] * 1000000, 0) AS BIGINT))"
        f" AS BIGINT) AS s{d}"
        for d in range(dim)
    )
    divs = ", ".join(f"s{d} / (n * 1000000.0)" for d in range(dim))
    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        "c0 AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec"
        f" FROM embeddings ORDER BY vec_id ASC LIMIT {k})",
    ]
    for it in range(iters):
        parts.append(
            f"a{it} AS (SELECT e.vec_id, e.v, c{it}.cid,"
            " row_number() OVER (PARTITION BY e.vec_id"
            f" ORDER BY list_dot_product(e.v, c{it}.cvec) DESC,"
            f" c{it}.cid ASC) AS rn"
            f" FROM e CROSS JOIN c{it})"
        )
        parts.append(
            f"m{it} AS (SELECT vec_id, v, cid FROM a{it} WHERE rn = 1)"
        )
        if it < iters - 1:
            parts.append(
                f"g{it} AS (SELECT cid, COUNT(*) AS n,\n               "
                f"{sums}\n           FROM m{it} GROUP BY cid)"
            )
            parts.append(
                f"c{it + 1} AS (SELECT cid, list_value({divs}) AS cvec"
                f" FROM g{it})"
            )
    return ",\n    ".join(parts)


# PMI collocations (queries_ext.q_pmi_pairs): ±2-window unordered
# pairs, min count 5, PMI in double with the operand order written
# identically to the Spark side, rounded 6; top-100 deterministic.
EXT_ORACLES["q_pmi_pairs"] = """
    WITH t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    toks AS (
        SELECT doc_id, arr[i] AS w
        FROM t, unnest(generate_series(1, len(arr))) AS g(i)
    ),
    pairs AS (
        SELECT least(arr[i], arr[i + 1]) AS x,
               greatest(arr[i], arr[i + 1]) AS y
        FROM t, unnest(generate_series(1, len(arr) - 1)) AS g(i)
        WHERE arr[i] != arr[i + 1]
        UNION ALL
        SELECT least(arr[i], arr[i + 2]),
               greatest(arr[i], arr[i + 2])
        FROM t, unnest(generate_series(1, len(arr) - 2)) AS g(i)
        WHERE arr[i] != arr[i + 2]
    ),
    cxy AS (
        SELECT x, y, COUNT(*)::BIGINT AS c_xy
        FROM pairs GROUP BY x, y HAVING COUNT(*) >= 5
    ),
    cw AS (SELECT w, COUNT(*)::BIGINT AS c_w FROM toks GROUP BY w),
    tot AS (
        SELECT CAST(SUM(len(arr)) AS BIGINT) AS n_tokens,
               CAST(SUM(greatest(len(arr) - 1, 0))
                    + SUM(greatest(len(arr) - 2, 0)) AS BIGINT) AS n_pairs
        FROM t
    )
    SELECT
        cxy.x,
        cxy.y,
        cxy.c_xy,
        round(ln(
            (cxy.c_xy::DOUBLE / tot.n_pairs::DOUBLE)
            / ((cx.c_w::DOUBLE / tot.n_tokens::DOUBLE)
               * (cy.c_w::DOUBLE / tot.n_tokens::DOUBLE))
        ), 6) AS pmi
    FROM cxy
    JOIN cw cx ON cx.w = cxy.x
    JOIN cw cy ON cy.w = cxy.y
    CROSS JOIN tot
    ORDER BY pmi DESC, cxy.x ASC, cxy.y ASC
    LIMIT 100
"""

# Tokenizer fertility per language (queries_ext.q_fertility): exact
# integer token sums, one rounded double division.
EXT_ORACLES["q_fertility"] = r"""
    WITH d AS (
        SELECT
            lang,
            len(string_split(text, ' '))::BIGINT AS ws,
            len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))::BIGINT
                AS bpe
        FROM documents
    )
    SELECT
        lang,
        COUNT(*)::BIGINT AS n_docs,
        CAST(SUM(ws) AS BIGINT) AS ws_tokens,
        CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
        round(CAST(SUM(bpe) AS BIGINT) / CAST(SUM(ws) AS BIGINT), 6)
            AS fertility
    FROM d GROUP BY lang
"""

# BPE merge candidates (queries_ext.q_bpe_merges): adjacent char pairs
# over the distinct vocabulary, weighted by word frequency.
EXT_ORACLES["q_bpe_merges"] = """
    WITH tok AS (
        SELECT unnest(string_split(trim(text), ' ')) AS word
        FROM documents
    ),
    vocab AS (
        SELECT word, COUNT(*)::BIGINT AS freq
        FROM tok GROUP BY word
        HAVING len(word) >= 2
    ),
    idx AS (
        SELECT word, freq,
               UNNEST(generate_series(1, len(word) - 1)) AS i
        FROM vocab
    ),
    counts AS (
        SELECT substr(word, i, 2) AS pair,
               SUM(freq)::BIGINT AS n_occurrences
        FROM idx GROUP BY 1
    )
    SELECT CAST(row_number() OVER (
               ORDER BY n_occurrences DESC, pair ASC
           ) AS INT) AS rank,
           pair, n_occurrences
    FROM counts
    ORDER BY rank
    LIMIT 30
"""

# OOV rate per language (queries_ext.q_oov_rate): corpus-wide top-512
# vocabulary, per-lang out-of-vocabulary token share.
EXT_ORACLES["q_oov_rate"] = """
    WITH tok AS (
        SELECT lang, unnest(string_split(trim(text), ' ')) AS word
        FROM documents
    ),
    counts_lw AS (
        SELECT lang, word, COUNT(*)::BIGINT AS n FROM tok GROUP BY 1, 2
    ),
    counts_w AS (
        SELECT word, SUM(n)::BIGINT AS n_total FROM counts_lw GROUP BY 1
    ),
    vocab AS (
        SELECT word FROM counts_w
        ORDER BY n_total DESC, word ASC LIMIT 512
    )
    SELECT lang,
           SUM(n)::BIGINT AS n_tokens,
           SUM(CASE WHEN v.word IS NULL THEN n ELSE 0 END)::BIGINT
               AS n_oov,
           round(
               CAST(SUM(CASE WHEN v.word IS NULL THEN n ELSE 0 END)
                    AS DOUBLE) / SUM(n), 6
           ) AS oov_rate
    FROM counts_lw c LEFT JOIN vocab v USING (word)
    GROUP BY lang
"""

# Sharded curriculum interleave (queries_ext.q_curriculum_order):
# quartile tiers of the lexical-diversity score, round-robin positions
# within (shard, tier).
EXT_ORACLES["q_curriculum_order"] = """
    WITH scored AS (
        SELECT doc_id,
               CAST(round(
                   CAST(len(list_distinct(string_split(trim(text), ' ')))
                        AS DOUBLE)
                   / len(string_split(trim(text), ' ')) * 1000000.0, 0
               ) AS BIGINT) AS score_micro,
               CAST(((strpos('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR) || '|cur'), 1, 1)
                     ) - 1) * 16
                     + strpos('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR) || '|cur'), 2, 1)
                     ) - 1) % 8 AS INT) AS shard
        FROM documents
    ),
    cuts AS (
        SELECT quantile_cont(score_micro, 0.25) AS q1,
               quantile_cont(score_micro, 0.5) AS q2,
               quantile_cont(score_micro, 0.75) AS q3
        FROM scored
    ),
    tiered AS (
        SELECT doc_id, score_micro, shard,
               CAST(CASE
                   WHEN score_micro <= q1 THEN 0
                   WHEN score_micro <= q2 THEN 1
                   WHEN score_micro <= q3 THEN 2
                   ELSE 3 END AS INT) AS tier
        FROM scored, cuts
    )
    SELECT shard, doc_id, tier, score_micro,
           CAST((row_number() OVER (
               PARTITION BY shard, tier
               ORDER BY score_micro DESC, doc_id ASC
           ) - 1) * 4 + tier AS BIGINT) AS position
    FROM tiered
"""

# Temperature mix (queries_ext.q_temperature_mix): n^0.3 micro-rounded
# once per language; all shares are single double divisions of exact
# integers (no cross-row double sums).
EXT_ORACLES["q_temperature_mix"] = """
    WITH per_lang AS (
        SELECT lang,
               COUNT(*)::BIGINT AS n_docs,
               SUM(len(string_split(trim(text), ' ')))::BIGINT AS n_tokens
        FROM documents GROUP BY lang
    ),
    scaled AS (
        SELECT *, CAST(round(pow(n_tokens, 0.3) * 1000000.0, 0) AS BIGINT)
                      AS s_micro
        FROM per_lang
    ),
    tot AS (
        SELECT SUM(n_tokens)::BIGINT AS tot_tokens,
               SUM(s_micro)::BIGINT AS tot_s
        FROM scaled
    )
    SELECT lang, n_docs, n_tokens,
           CAST(round(n_tokens * 1000000.0 / tot_tokens, 0) AS BIGINT)
               AS p_raw_micro,
           CAST(round(s_micro * 1000000.0 / tot_s, 0) AS BIGINT)
               AS p_temp_micro,
           CAST(round(s_micro * 10000.0 / tot_s, 0) AS BIGINT)
               AS expected_docs_10k
    FROM scaled, tot
"""

# DSIR importance weights (queries_ext.q_dsir_weights): hashed-unigram
# LM log-ratio per 64-bucket, micro-rounded ONCE, then exact integer
# per-doc sums. Bucket = first md5 byte mod 64 via the strpos nibble
# idiom; ln structure mirrors the Spark expression term-for-term.
_DSIR_NIB = "strpos('0123456789abcdef', substr(md5(word), {i}, 1)) - 1"
EXT_ORACLES["q_dsir_weights"] = f"""
    WITH tok AS (
        SELECT doc_id, lang,
               unnest(string_split(trim(text), ' ')) AS word
        FROM documents
    ),
    bk AS (
        SELECT doc_id, lang,
               CAST((({_DSIR_NIB.format(i=1)}) * 16
                     + ({_DSIR_NIB.format(i=2)})) % 64 AS INT) AS b
        FROM tok
    ),
    agg AS (
        SELECT b, COUNT(*)::BIGINT AS c_r,
               SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS c_t
        FROM bk GROUP BY b
    ),
    tot AS (SELECT SUM(c_r)::BIGINT AS R, SUM(c_t)::BIGINT AS T FROM agg),
    lam AS (
        SELECT b,
               CAST(round((
                   ln((c_t + 1.0) / (T + 64.0))
                   - ln((c_r + 1.0) / (R + 64.0))
               ) * 1000000.0, 0) AS BIGINT) AS lam_micro
        FROM agg, tot
    ),
    per AS (
        SELECT doc_id, lang, b, COUNT(*)::BIGINT AS n
        FROM bk GROUP BY 1, 2, 3
    ),
    w AS (
        SELECT p.doc_id, p.lang,
               SUM(p.n)::BIGINT AS n_tokens,
               SUM(p.n * l.lam_micro)::BIGINT AS logw_micro
        FROM per p JOIN lam l USING (b)
        GROUP BY 1, 2
    )
    SELECT CAST(row_number() OVER (
               ORDER BY logw_micro DESC, doc_id ASC
           ) AS INT) AS rank,
           doc_id, lang, n_tokens, logw_micro
    FROM w
    ORDER BY rank
    LIMIT 100
"""

# Deterministic training shards (queries_ext.q_training_shards): shard =
# first md5 byte mod 8, position = rank of the next 16 nibbles within
# the shard. The nibble→int conversion uses the strpos idiom (see KMV).
_NIB = "strpos('0123456789abcdef', substr(hh, {i}, 1)) - 1"
EXT_ORACLES["q_training_shards"] = f"""
    WITH h AS (
        SELECT doc_id,
               md5(CAST(doc_id AS VARCHAR) || '|shard') AS hh
        FROM documents
    ),
    s AS (
        SELECT doc_id,
               CAST((({_NIB.format(i=1)}) * 16 + ({_NIB.format(i=2)})) % 8
                    AS INT) AS shard,
               substr(hh, 3, 16) AS ord_key
        FROM h
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (
               PARTITION BY shard ORDER BY ord_key ASC, doc_id ASC
           ) AS INT) AS pos
    FROM s
"""

# Per-domain contribution cap (queries_ext.q_domain_cap): blocklist
# filter + first-DOMAIN_CAP-by-doc_id per source. Literals mirror
# queries_ext.DOMAIN_BLOCKLIST / DOMAIN_CAP.
EXT_ORACLES["q_domain_cap"] = """
    SELECT doc_id, source, lang,
           CAST(rank_in_domain AS INT) AS rank_in_domain
    FROM (
        SELECT doc_id, source, lang,
               row_number() OVER (
                   PARTITION BY source ORDER BY doc_id ASC
               ) AS rank_in_domain
        FROM documents
        WHERE source NOT IN ('src7', 'src13')
    )
    WHERE rank_in_domain <= 15
"""

# Distributed k-means assignment (queries_ext.q_kmeans_assign): two
# unrolled Lloyd rounds, integer-micro centroids — see _kmeans_cte_sql.
EXT_ORACLES["q_kmeans_assign"] = f"""
    WITH {_kmeans_cte_sql(k=4, iters=2, dim=64)}
    SELECT vec_id, cid AS cluster_id FROM m1
"""

# SemDedup (queries_ext.q_semdedup): cluster-blocked cosine pairs, the
# higher id of every pair with cos >= 0.2 is dropped (keep-lowest).
EXT_ORACLES["q_semdedup"] = f"""
    WITH {_kmeans_cte_sql(k=8, iters=2, dim=64)},
    dropped AS (
        SELECT DISTINCT b.vec_id
        FROM m1 a JOIN m1 b ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.2
    )
    SELECT
        m1.vec_id,
        m1.cid AS cluster_id,
        (dropped.vec_id IS NULL) AS kept
    FROM m1 LEFT JOIN dropped ON m1.vec_id = dropped.vec_id
"""

# SemDedup, SCALED-BLOCKER regime (queries_ext.q_semdedup_scaled): the
# bucket is the first p sign bits of the 16-plane hyperplane pattern,
# p from the shared all-integer rule (SEMDEDUP_PLANES_EXPR — spelled
# with // here, DIV there; both truncate toward zero and bin()/length()
# agree). The frozen-universe mirror of the fingerprint-cached
# assignment artifact, like q_semdedup's kmeans CTE.
EXT_ORACLES["q_semdedup_scaled"] = f"""
    WITH cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
    assign AS (
        SELECT
            vec_id,
            CAST(embedding AS DOUBLE[]) AS v,
            substr(
                {_hyperplane_bucket_sql("embedding", 64, 16)},
                1,
                (SELECT CASE WHEN (n - 1) // 128 < 1 THEN 1
                        ELSE length(bin((n - 1) // 128)) END FROM cnt)
            ) AS cluster_id
        FROM embeddings
    ),
    dropped AS (
        SELECT DISTINCT b.vec_id
        FROM assign a
        JOIN assign b
          ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.2
    )
    SELECT
        assign.vec_id,
        assign.cluster_id,
        (dropped.vec_id IS NULL) AS kept
    FROM assign LEFT JOIN dropped ON assign.vec_id = dropped.vec_id
"""


# RAG retrieval composition (queries_ext.q_semantic_neighbors): the
# retrieval leg is the MATERIALIZED IVF index (same quantization as
# q_ann_index_probe's oracle: 8 lowest-id anchors, nprobe=2 probing —
# the frozen-universe mirror of the fingerprint-cached artifact), top-3
# per query, joined to document metadata on vec_id = doc_id.
EXT_ORACLES["q_semantic_neighbors"] = """
    WITH a AS (
        SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS avec
        FROM embeddings ORDER BY vec_id ASC LIMIT 8
    ),
    assign AS (
        SELECT
            e.vec_id,
            CAST(e.embedding AS DOUBLE[]) AS v,
            a.anchor_id,
            row_number() OVER (
                PARTITION BY e.vec_id
                ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), a.avec)
                             DESC,
                         a.anchor_id ASC
            ) AS rn
        FROM embeddings e CROSS JOIN a
    ),
    c AS (
        SELECT vec_id, v, anchor_id AS bucket FROM assign WHERE rn = 1
    ),
    q AS (
        SELECT vec_id, v, anchor_id AS bucket
        FROM assign WHERE vec_id < 5 AND rn <= 2
    ),
    topk AS (
        SELECT
            q.vec_id AS query_id,
            c.vec_id AS neighbor_id,
            CAST(row_number() OVER (
                PARTITION BY q.vec_id
                ORDER BY list_cosine_similarity(c.v, q.v) DESC, c.vec_id ASC
            ) AS INT) AS rank
        FROM c
        JOIN q ON c.bucket = q.bucket
        WHERE c.vec_id != q.vec_id
        QUALIFY rank <= 3
    )
    SELECT
        topk.query_id,
        topk.neighbor_id,
        topk.rank,
        d.lang AS neighbor_lang,
        len(string_split(trim(d.text), ' '))::BIGINT AS neighbor_n_words
    FROM topk
    JOIN documents d ON d.doc_id = topk.neighbor_id
"""

# Recursive-CTE hierarchy walk (queries_ext.q_recursive_hierarchy):
# byte-identical SQL to the Spark form — the recursion is a DAG walk,
# so UNION ALL semantics agree across engines.
EXT_ORACLES["q_recursive_hierarchy"] = """
    WITH RECURSIVE anc AS (
        SELECT p_partkey AS key, p_partkey AS root, 0 AS depth
        FROM part WHERE p_partkey < 10
        UNION ALL
        SELECT c.p_partkey, a.root, a.depth + 1
        FROM part c
        JOIN anc a ON CAST(FLOOR(c.p_partkey / 10) AS BIGINT) = a.key
        WHERE c.p_partkey >= 10
    )
    SELECT key, root, CAST(depth AS INT) AS depth FROM anc
"""

# Gopher screening rules (queries_ext.q_gopher_rules): word/bigram CTEs
# identical to the q_quality_repetition oracle; rule thresholds inline.
EXT_ORACLES["q_gopher_rules"] = """
    WITH w AS (
        SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word
        FROM documents
    ),
    wc AS (
        SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY 1, 2
    ),
    ws AS (
        SELECT
            doc_id,
            CAST(SUM(c) AS BIGINT) AS n_words,
            COUNT(*)::BIGINT AS n_distinct_words,
            MAX(c)::BIGINT AS top_word_count
        FROM wc
        GROUP BY doc_id
    ),
    t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    bg AS (
        SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS b
        FROM t, unnest(generate_series(1, len(arr) - 1)) AS g(i)
    ),
    bs AS (
        SELECT
            doc_id,
            COUNT(*)::BIGINT AS n_bigrams,
            COUNT(DISTINCT b)::BIGINT AS n_distinct_bigrams
        FROM bg
        GROUP BY doc_id
    ),
    base AS (
        SELECT
            doc_id,
            CAST(list_sum(list_transform(string_split(trim(text), ' '),
                x -> length(x))) AS BIGINT) AS swl,
            len(list_filter(string_split(trim(text), ' '),
                x -> lower(x) IN ('the','a','of','and','to','in','is')))
                ::BIGINT AS stop
        FROM documents
    ),
    scored AS (
        SELECT
            ws.doc_id,
            ws.n_words,
            ws.n_distinct_words,
            CAST(ws.top_word_count AS DOUBLE) / ws.n_words AS twf,
            CASE WHEN COALESCE(bs.n_bigrams, 0) > 0
                 THEN CAST(bs.n_bigrams - bs.n_distinct_bigrams AS DOUBLE)
                      / bs.n_bigrams
                 ELSE 0.0 END AS dbf,
            base.swl,
            base.stop
        FROM ws
        LEFT JOIN bs USING (doc_id)
        JOIN base USING (doc_id)
    )
    SELECT
        doc_id,
        n_words,
        (n_words >= 30 AND n_words <= 10000) AS r_word_count,
        (CAST(swl AS DOUBLE) / n_words >= 3.0
         AND CAST(swl AS DOUBLE) / n_words <= 10.0) AS r_mean_word_len,
        (stop >= 2) AS r_stopwords,
        (twf <= 0.2) AS r_top_word,
        (CAST(n_distinct_words AS DOUBLE) / n_words >= 0.3) AS r_distinct,
        (dbf <= 0.3) AS r_dup_bigrams,
        -- lateral column aliases: ONE copy of each threshold
        (r_word_count AND r_mean_word_len AND r_stopwords
         AND r_top_word AND r_distinct AND r_dup_bigrams) AS passes
    FROM scored
    UNION ALL
    -- NULL-text docs (zero-signal rows in repetition_signals): every
    -- guarded/NULL rule coalesces to FALSE on the Spark side; the two
    -- zero-fraction rules (top-word 0.0, dup-bigram 0.0) hold
    SELECT
        doc_id, 0, FALSE, FALSE, FALSE, TRUE, FALSE, TRUE, FALSE
    FROM documents
    WHERE text IS NULL
"""


# Quality-stratified mix (queries_ext.q_perplexity_mix): exact quartile
# cutoffs of the bigram-LM score (quantile_cont == F.percentile), bucket
# by CASE, per-bucket average summed in integer micro-units.
EXT_ORACLES["q_perplexity_mix"] = f"""
    WITH scored AS (
        SELECT * FROM ({EXT_ORACLES["q_bigram_lm"]})
    ),
    cuts AS (
        SELECT
            quantile_cont(avg_logp, 0.25) AS q1,
            quantile_cont(avg_logp, 0.5) AS q2,
            quantile_cont(avg_logp, 0.75) AS q3
        FROM scored
    ),
    bucketed AS (
        SELECT
            n_bigrams,
            CAST(round(avg_logp * 1000000.0, 0) AS BIGINT) AS score_micro,
            CAST(CASE
                WHEN avg_logp <= q1 THEN 1
                WHEN avg_logp <= q2 THEN 2
                WHEN avg_logp <= q3 THEN 3
                ELSE 4 END AS INT) AS bucket
        FROM scored, cuts
    )
    SELECT
        bucket,
        COUNT(*)::BIGINT AS n_docs,
        CAST(SUM(n_bigrams) AS BIGINT) AS total_bigrams,
        round(
            CAST(SUM(score_micro) AS DOUBLE) / (COUNT(*) * 1000000.0), 6
        ) AS avg_score
    FROM bucketed
    GROUP BY bucket
"""

# TPC-H Q5-shaped star join (queries_ext.q_star_join): same FK chain,
# same local-supplier constraint, per-row-rounded integer cents.
# Bucketed co-located join (queries_ext.q_bucketed_join): the answer is
# layout-independent — the oracle is the plain orders ⋈ lineitem join;
# the bucketed layout only changes the physical plan (no exchange).
EXT_ORACLES["q_bucketed_join"] = """
    SELECT
        o.o_orderpriority,
        CAST(SUM(CAST(round(
            l.l_extendedprice * (1.0 - l.l_discount) * 100.0, 0
        ) AS BIGINT)) AS BIGINT) AS revenue_cents,
        COUNT(*)::BIGINT AS n_lineitems
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
"""

EXT_ORACLES["q_star_join"] = """
    SELECT
        n.n_name,
        CAST(SUM(CAST(round(
            l.l_extendedprice * (1.0 - l.l_discount) * 100.0, 0
        ) AS BIGINT)) AS BIGINT) AS revenue_cents,
        COUNT(*)::BIGINT AS n_lineitems
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
"""


def _md5_bucket_sql(expr: str, n_buckets: int) -> str:
    """SQL for the portable hash bucket (first two hex chars of md5,
    mod n_buckets) used by operators/quality.py::hashed_linear_score —
    the same strpos hex parse as the curriculum shard hash."""
    h = f"md5({expr})"
    return (
        f"(((strpos('0123456789abcdef', substr({h}, 1, 1)) - 1) * 16"
        f" + strpos('0123456789abcdef', substr({h}, 2, 1)) - 1)"
        f" % {n_buckets})"
    )


def _classifier_weights_sql(n_buckets: int = 64, seed: int = 0) -> str:
    """Weight vector literal for the hashed linear scorer — generated
    by the SAME code as the Spark side (operators/quality.py), inlined
    as a DuckDB BIGINT[] literal."""
    from telecom_competitor_analysis_spark.operators.quality import (
        classifier_weights,
    )

    return (
        "["
        + ", ".join(f"{w}::BIGINT" for w in classifier_weights(n_buckets, seed))
        + "]"
    )


# Hashed linear quality scorer (queries_ext.q_quality_classifier):
# per-word bucket weight lookup summed in exact integer micro-units.
# The scoring fold is computed ONCE in the inner query; keep derives
# from score_micro (r7 review: the expression was inlined twice, a
# drift hazard between score and verdict).
EXT_ORACLES["q_quality_classifier"] = f"""
    SELECT doc_id, lang, n_words, score_micro, score_micro >= 0 AS keep
    FROM (
        SELECT doc_id,
               lang,
               CAST(len(string_split(trim(text), ' ')) AS BIGINT)
                   AS n_words,
               CAST(list_sum(list_transform(
                   string_split(trim(text), ' '),
                   w -> ({_classifier_weights_sql(64, 0)})[
                       {_md5_bucket_sql('w', 64)} + 1]
               )) AS BIGINT) AS score_micro
        FROM documents
    )
"""

# Positional 3-gram CTE chain (toks → lead-window grams → guard
# filter): the single definition composed by BOTH positional-gram
# oracles below — mirrors operators/dedup.py::positional_ngrams (r7
# review: was copy-pasted per oracle).
_POSITIONAL_GRAMS_CTES = """
    WITH toks AS (
        SELECT doc_id,
               UNNEST(string_split(trim(text), ' ')) AS w,
               UNNEST(range(len(string_split(trim(text), ' ')))) AS pos
        FROM documents
    ),
    grams AS (
        SELECT doc_id, pos,
               w || ' ' || lead(w, 1) OVER win || ' '
                 || lead(w, 2) OVER win AS gram,
               lead(w, 2) OVER win AS guard
        FROM toks
        WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ),
    g AS (SELECT doc_id, pos, gram FROM grams WHERE guard IS NOT NULL)"""

# Positional phrase retrieval (queries_ext.q_phrase_search): global
# top-1 3-gram (ties → smallest), then per-doc occurrence rollup.
EXT_ORACLES["q_phrase_search"] = _POSITIONAL_GRAMS_CTES + """,
    top1 AS (
        SELECT gram FROM g GROUP BY gram
        ORDER BY COUNT(*) DESC, gram ASC LIMIT 1
    )
    SELECT doc_id,
           gram AS phrase,
           COUNT(*)::BIGINT AS n_hits,
           CAST(MIN(pos) AS BIGINT) AS first_pos
    FROM g JOIN top1 USING (gram)
    GROUP BY doc_id, gram
"""

# Weighted majority-vote label aggregation (queries_ext.q_label_vote):
# winner by total micro weight, ties to the smallest label.
EXT_ORACLES["q_label_vote"] = """
    WITH votes AS (
        SELECT user_id,
               event_type AS label,
               CAST(round(value * 1000000, 0) AS BIGINT) AS w_micro
        FROM events
    ),
    per_label AS (
        SELECT user_id, label,
               SUM(w_micro)::BIGINT AS weight_micro,
               COUNT(*)::BIGINT AS n_votes
        FROM votes GROUP BY user_id, label
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY weight_micro DESC, label ASC
               ) AS rn,
               SUM(weight_micro) OVER (PARTITION BY user_id) AS total
        FROM per_label
    )
    SELECT user_id, label, weight_micro, n_votes,
           round(CAST(weight_micro AS DOUBLE) / total, 6) AS vote_share
    FROM ranked WHERE rn = 1
"""

# Exact-substring duplicate removal (queries_ext.q_dup_span_remove):
# cut every position covered by a df>=2 3-gram, rebuild, sha256.
EXT_ORACLES["q_dup_span_remove"] = _POSITIONAL_GRAMS_CTES + """,
    df_tbl AS (
        SELECT gram FROM (
            SELECT gram, COUNT(*) AS df
            FROM (SELECT DISTINCT doc_id, gram FROM g)
            GROUP BY gram
        ) WHERE df >= 2
    ),
    covered AS (
        SELECT DISTINCT doc_id,
               UNNEST(generate_series(pos, pos + 2)) AS cpos
        FROM g JOIN df_tbl USING (gram)
    ),
    kept AS (
        SELECT t.doc_id, t.pos, t.w
        FROM toks t LEFT JOIN covered c
          ON c.doc_id = t.doc_id AND c.cpos = t.pos
        WHERE c.doc_id IS NULL
    ),
    rebuilt AS (
        SELECT doc_id,
               COUNT(*)::BIGINT AS kept_tokens,
               string_agg(w, ' ' ORDER BY pos) AS cleaned
        FROM kept GROUP BY doc_id
    ),
    totals AS (
        SELECT doc_id,
               CAST(len(string_split(trim(text), ' ')) AS BIGINT)
                   AS total_tokens
        FROM documents
    )
    SELECT t.doc_id,
           t.total_tokens,
           COALESCE(r.kept_tokens, 0)::BIGINT AS kept_tokens,
           (t.total_tokens - COALESCE(r.kept_tokens, 0))::BIGINT
               AS removed_tokens,
           sha256(COALESCE(r.cleaned, '')) AS cleaned_sha
    FROM totals t LEFT JOIN rebuilt r USING (doc_id)
"""

# Reciprocal Rank Fusion of BM25 + cosine retrieval
# (queries_ext.q_rrf_fusion): rank-only fusion, micro-rounded 1/(60+r)
# contributions summed as integers. The lexical leg embeds the
# q_bm25_search oracle verbatim; the semantic leg is the
# q_embedding_topk cosine shape anchored on vec_id 0.
EXT_ORACLES["q_rrf_fusion"] = f"""
    WITH lex_scores AS ({EXT_ORACLES["q_bm25_search"]}),
    lex AS (
        SELECT doc_id,
               CAST(row_number() OVER (
                   ORDER BY score_micro DESC, doc_id ASC
               ) AS INT) AS rank_lex
        FROM lex_scores
    ),
    sem AS (
        SELECT c.vec_id AS doc_id,
               CAST(row_number() OVER (
                   ORDER BY list_cosine_similarity(
                       CAST(c.embedding AS DOUBLE[]),
                       CAST(q.embedding AS DOUBLE[])) DESC,
                   c.vec_id ASC
               ) AS INT) AS rank_sem
        FROM embeddings c
        CROSS JOIN (SELECT * FROM embeddings WHERE vec_id = 0) q
        WHERE c.vec_id != q.vec_id
        QUALIFY rank_sem <= 20
    ),
    fused AS (
        SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
               rank_lex,
               rank_sem,
               (CASE WHEN rank_lex IS NOT NULL
                     THEN CAST(round(1000000.0 / (60.0 + rank_lex), 0)
                               AS BIGINT) ELSE 0 END
              + CASE WHEN rank_sem IS NOT NULL
                     THEN CAST(round(1000000.0 / (60.0 + rank_sem), 0)
                               AS BIGINT) ELSE 0 END) AS rrf_micro
        FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
    )
    SELECT doc_id, rank_lex, rank_sem, rrf_micro,
           CAST(row_number() OVER (
               ORDER BY rrf_micro DESC, doc_id ASC
           ) AS INT) AS fused_rank
    FROM fused
    QUALIFY fused_rank <= 10
"""

# Incremental rollup maintenance (queries_ext.q_rollup_incremental):
# the oracle is deliberately the FULL RECOMPUTE over all orders — the
# query's merged stored+batch partials must equal it exactly (the
# materialized-view maintenance invariant; integer cents make the
# partial merge order-free).
EXT_ORACLES["q_rollup_incremental"] = """
    SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS revenue_cents,
           COUNT(*)::BIGINT AS n_orders
    FROM orders
    GROUP BY 1
"""

# Leakage-safe split (queries_ext.q_leakage_safe_split): the shared
# component CTE chain with the hash split taken on the component
# label — whole near-dup clusters land in one split.
EXT_ORACLES["q_leakage_safe_split"] = (
    _NEARDUP_CC_CTES
    + """,
    cl AS (
        SELECT id, MIN(label) AS cluster_id
        FROM cc
        GROUP BY id
    )
    SELECT id AS doc_id,
           cluster_id,
           CASE WHEN substr(
                    md5(CAST(cluster_id AS VARCHAR) || '|split'), 1, 2
                ) < 'cd' THEN 'train' ELSE 'test' END AS split
    FROM cl
"""
)

# q_setsim_join (queries_ext.q_setsim_join) — BRUTE-FORCE mirror of the
# prefix-filtered set-similarity join: same stopword-pruned word sets
# (df*5 <= n_docs), but candidates from ANY shared token (complete by
# construction since Jaccard > 0 requires a shared token). A green row
# therefore PROVES the Spark side's prefix filter lossless on this
# corpus. Integer-exact threshold: 2*|inter| >= |union| (t = 0.5).
EXT_ORACLES["q_setsim_join"] = """
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest(string_split(trim(text), ' ')) AS word
        FROM documents
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY word),
    keep AS (
        SELECT t.doc_id, t.word
        FROM tok t JOIN df USING (word), n
        WHERE df.df * 5 <= n.n_docs AND df.df <= 1000
    ),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM keep GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS inter_size
        FROM keep a JOIN keep b ON a.word = b.word AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, inter_size,
           sa.sz + sb.sz - inter_size AS union_size,
           CAST(inter_size * 1000000 // (sa.sz + sb.sz - inter_size)
                AS BIGINT) AS jaccard_micro
    FROM inter
    JOIN sz sa ON inter.doc_a = sa.doc_id
    JOIN sz sb ON inter.doc_b = sb.doc_id
    WHERE 2 * inter_size >= sa.sz + sb.sz - inter_size
"""

# q_corpus_overlap (queries_ext.q_corpus_overlap) — KMV sketch algebra
# over the distinct-3-shingle universes of the two doc_id-parity halves;
# md5 ordering is engine-portable so the k=64 sketches (and hence the
# estimate) are bit-identical. Exact intersection rides along.
EXT_ORACLES["q_corpus_overlap"] = """
    WITH t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    g AS (
        SELECT DISTINCT doc_id % 2 AS side,
               arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS sh
        FROM t, unnest(generate_series(1, len(arr) - 2)) AS u(i)
    ),
    va AS (SELECT DISTINCT sh FROM g WHERE side = 0),
    vb AS (SELECT DISTINCT sh FROM g WHERE side = 1),
    ha AS (SELECT md5(sh) AS h FROM va ORDER BY h LIMIT 64),
    hb AS (SELECT md5(sh) AS h FROM vb ORDER BY h LIMIT 64),
    merged AS (
        SELECT DISTINCT h
        FROM (SELECT h FROM ha UNION ALL SELECT h FROM hb)
        ORDER BY h LIMIT 64
    ),
    hits AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS est_overlap_hits
        FROM merged JOIN ha USING (h) JOIN hb USING (h)
    ),
    ex AS (
        SELECT CAST((SELECT COUNT(*) FROM va JOIN vb USING (sh)) AS BIGINT)
                   AS exact_inter,
               CAST((SELECT COUNT(*) FROM va) AS BIGINT) AS na,
               CAST((SELECT COUNT(*) FROM vb) AS BIGINT) AS nb
    )
    SELECT CAST(64 AS BIGINT) AS k,
           hits.est_overlap_hits,
           CAST(hits.est_overlap_hits * 1000000 // 64 AS BIGINT)
               AS est_jaccard_micro,
           ex.exact_inter,
           ex.na + ex.nb - ex.exact_inter AS exact_union,
           CAST(ex.exact_inter * 1000000 // (ex.na + ex.nb - ex.exact_inter)
                AS BIGINT) AS exact_jaccard_micro
    FROM hits, ex
"""

# q_zorder_layout (queries_ext.q_zorder_layout) — identical 4-bit
# quantization + Morton interleave (portable div/mod arithmetic, no
# engine bit-op dialects) + per-zfile min/max stats.
_Z_INTERLEAVE = " + ".join(
    "((bx // {p}) % 2) * {wx} + ((qy // {p}) % 2) * {wy}".format(
        p=1 << i, wx=1 << (2 * i + 1), wy=1 << (2 * i)
    )
    for i in range(4)
)

EXT_ORACLES["q_zorder_layout"] = f"""
    WITH o AS (
        SELECT o_custkey,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders
    ),
    b AS (
        SELECT MIN(o_custkey) AS minc, MAX(o_custkey) AS maxc,
               MIN(cents) AS minp, MAX(cents) AS maxp
        FROM o
    ),
    q AS (
        SELECT o_custkey, cents,
               LEAST(15, (o_custkey - minc) * 16 // (maxc - minc + 1)) AS bx,
               LEAST(15, (cents - minp) * 16 // (maxp - minp + 1)) AS qy
        FROM o, b
    ),
    z AS (SELECT o_custkey, cents, {_Z_INTERLEAVE} AS zv FROM q)
    SELECT CAST(zv // 4 AS BIGINT) AS zfile,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_custkey) AS min_cust,
           MAX(o_custkey) AS max_cust,
           MIN(cents) AS min_cents,
           MAX(cents) AS max_cents
    FROM z
    GROUP BY 1
"""

# q_pq_ann (queries_ext.q_pq_ann) — product quantization mirror:
# identical micro-int quantization, codebook seeding (4 lowest-id
# vectors), per-subspace nearest-code assignment (ties -> lowest code),
# ADC table, and top-10 per query by (approx_dist, vec_id). All
# integer arithmetic — bit-identical across engines.
# Shared PQ CTE chain (micro-int elements -> subvectors -> codebook ->
# codes -> per-query ADC tables -> approx/exact distances -> ranked):
# composed by BOTH q_pq_ann and q_pq_recall.
_PQ_CTES = """
    e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    elem AS (
        SELECT vec_id, i, CAST(round(v[i] * 1000000, 0) AS BIGINT) AS x
        FROM e, unnest(generate_series(1, 64)) t(i)
    ),
    sub AS (
        SELECT vec_id, (i - 1) // 8 AS j, (i - 1) % 8 AS p, x FROM elem
    ),
    cb AS (
        SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS c
        FROM (SELECT vec_id FROM e ORDER BY vec_id LIMIT 4)
    ),
    cbs AS (
        SELECT cb.c, s.j, s.p, s.x FROM sub s JOIN cb USING (vec_id)
    ),
    dist AS (
        SELECT s.vec_id, s.j, cbs.c,
               CAST(SUM((s.x - cbs.x) * (s.x - cbs.x)) AS BIGINT) AS d
        FROM sub s JOIN cbs ON s.j = cbs.j AND s.p = cbs.p
        GROUP BY 1, 2, 3
    ),
    codes AS (
        SELECT vec_id, j, c FROM (
            SELECT vec_id, j, c,
                   row_number() OVER (PARTITION BY vec_id, j
                                      ORDER BY d, c) AS rn
            FROM dist
        ) WHERE rn = 1
    ),
    qsub AS (
        SELECT vec_id AS qid, j, p, x FROM sub WHERE vec_id < 5
    ),
    adc AS (
        SELECT q.qid, cbs.j, cbs.c,
               CAST(SUM((q.x - cbs.x) * (q.x - cbs.x)) AS BIGINT) AS d
        FROM qsub q JOIN cbs ON q.j = cbs.j AND q.p = cbs.p
        GROUP BY 1, 2, 3
    ),
    approx AS (
        SELECT adc.qid, codes.vec_id,
               CAST(SUM(adc.d) AS BIGINT) AS approx_dist
        FROM codes JOIN adc ON codes.j = adc.j AND codes.c = adc.c
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT q.qid, s.vec_id,
               CAST(SUM((s.x - q.x) * (s.x - q.x)) AS BIGINT) AS exact_dist
        FROM sub s JOIN qsub q ON s.j = q.j AND s.p = q.p
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT a.qid, a.vec_id, a.approx_dist, x.exact_dist,
               row_number() OVER (PARTITION BY a.qid
                                  ORDER BY a.approx_dist, a.vec_id) AS rn
        FROM approx a
        JOIN exact x ON a.qid = x.qid AND a.vec_id = x.vec_id
        WHERE a.vec_id != a.qid
    )
"""

EXT_ORACLES["q_pq_ann"] = f"""
    WITH {_PQ_CTES}
    SELECT qid AS query_id, vec_id, CAST(rn AS INT) AS rank,
           approx_dist, exact_dist
    FROM ranked WHERE rn <= 10
"""

# q_pq_recall (queries_ext.q_pq_recall) — recall@10 of the PQ/ADC
# top-10 against the EXACT integer-L2 top-10 (self excluded, ties by
# vec_id) — the ANN-observability twin of q_ann_recall for the PQ path.
EXT_ORACLES["q_pq_recall"] = f"""
    WITH {_PQ_CTES},
    pq10 AS (SELECT qid, vec_id FROM ranked WHERE rn <= 10),
    ex10 AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY exact_dist, vec_id) AS ern
            FROM exact WHERE vec_id != qid
        ) WHERE ern <= 10
    )
    SELECT pq10.qid AS query_id,
           CAST(COUNT(ex10.vec_id) AS BIGINT) AS hits,
           CAST(COUNT(ex10.vec_id) * 100000 AS BIGINT) AS recall_micro
    FROM pq10 LEFT JOIN ex10
      ON pq10.qid = ex10.qid AND pq10.vec_id = ex10.vec_id
    GROUP BY 1
"""

# q_knn_label_audit (queries_ext.q_knn_label_audit) — exact integer
# squared-L2 kNN (k=10) for the first-20 audit batch, Borda weights
# 11-rank, argmax vote with lowest-label tie-break. All integers.
EXT_ORACLES["q_knn_label_audit"] = """
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    elem AS (
        SELECT vec_id, i, CAST(round(v[i] * 1000000, 0) AS BIGINT) AS x
        FROM e, unnest(generate_series(1, 64)) t(i)
    ),
    qelem AS (
        SELECT vec_id AS qid, i, x FROM elem WHERE vec_id < 20
    ),
    d AS (
        SELECT q.qid, c.vec_id,
               CAST(SUM((c.x - q.x) * (c.x - q.x)) AS BIGINT) AS d
        FROM elem c JOIN qelem q ON c.i = q.i AND c.vec_id != q.qid
        GROUP BY 1, 2
    ),
    nn AS (
        SELECT qid, vec_id, rn FROM (
            SELECT qid, vec_id,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY d, vec_id) AS rn
            FROM d
        ) WHERE rn <= 10
    ),
    votes AS (
        SELECT nn.qid, e.label AS nlabel,
               CAST(SUM(11 - nn.rn) AS BIGINT) AS w
        FROM nn JOIN e ON nn.vec_id = e.vec_id
        GROUP BY 1, 2
    ),
    win AS (
        SELECT qid, nlabel, w,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY w DESC, nlabel ASC) AS rw
        FROM votes
    )
    SELECT q.vec_id, q.label AS own_label,
           win.nlabel AS predicted_label,
           win.w AS vote_weight,
           q.label != win.nlabel AS mismatch
    FROM win JOIN e q ON win.qid = q.vec_id
    WHERE win.rw = 1
"""

# q_hard_negatives (queries_ext.q_hard_negatives) — the shared
# component CTE chain supplies the not-a-near-dup guard; exact integer
# squared-L2 top-5 per query among vectors OUTSIDE the query's
# component (vec_id = doc_id cross-modal key).
EXT_ORACLES["q_hard_negatives"] = (
    _NEARDUP_CC_CTES
    + """,
    cl AS (
        SELECT id, MIN(label) AS cluster_id
        FROM cc
        GROUP BY id
    ),
    e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    elem AS (
        SELECT vec_id, i, CAST(round(v[i] * 1000000, 0) AS BIGINT) AS x
        FROM e, unnest(generate_series(1, 64)) t(i)
    ),
    qelem AS (SELECT vec_id AS qid, i, x FROM elem WHERE vec_id < 5),
    d AS (
        SELECT q.qid, c.vec_id,
               CAST(SUM((c.x - q.x) * (c.x - q.x)) AS BIGINT) AS dist
        FROM elem c JOIN qelem q ON c.i = q.i AND c.vec_id != q.qid
        GROUP BY 1, 2
    ),
    guarded AS (
        SELECT d.qid, d.vec_id, d.dist
        FROM d
        JOIN cl cq ON cq.id = d.qid
        JOIN cl cn ON cn.id = d.vec_id
        WHERE cq.cluster_id != cn.cluster_id
    )
    SELECT qid AS query_id, vec_id AS neighbor_id,
           CAST(rn AS INT) AS rank, dist
    FROM (
        SELECT qid, vec_id, dist,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY dist, vec_id) AS rn
        FROM guarded
    ) WHERE rn <= 5
"""
)

# q_interval_overlap (queries_ext.q_interval_overlap) — brute-force
# theta-join mirror of the binned exactly-once overlap join: green
# proves completeness (no pair missed by binning) AND uniqueness (no
# pair double-counted across bins).
EXT_ORACLES["q_interval_overlap"] = """
    WITH a AS (
        SELECT o_orderkey AS a_key,
               date_diff('day', DATE '1992-01-01', o_orderdate) AS sa,
               date_diff('day', DATE '1992-01-01', o_orderdate) + 1 AS ea
        FROM orders WHERE o_orderkey % 17 = 0
    ),
    b AS (
        SELECT o_orderkey AS b_key,
               date_diff('day', DATE '1992-01-01', o_orderdate) AS sb,
               date_diff('day', DATE '1992-01-01', o_orderdate) + 2 AS eb
        FROM orders WHERE o_orderkey % 23 = 0
    )
    SELECT a_key, b_key,
           CAST(LEAST(ea, eb) - GREATEST(sa, sb) + 1 AS BIGINT)
               AS overlap_len
    FROM a JOIN b ON sa <= eb AND sb <= ea
"""

# q_embedding_drift (queries_ext.q_embedding_drift) — identical
# numerics: exact micro-int per-dim sums, one IEEE division per dim,
# round-half-away to micro ints, exact integer squared-shift sum.
_DRIFT_SUMS = ", ".join(
    f"CAST(SUM(CAST(round(v[{d + 1}] * 1000000, 0) AS BIGINT))"
    f" AS BIGINT) AS s{d}"
    for d in range(64)
)
_DRIFT_MEANS = ", ".join(
    f"CAST(round(s{d} / n) AS BIGINT) AS m{d}" for d in range(64)
)
_DRIFT_MEANS_B = ", ".join(
    f"CAST(round(s{d} / n) AS BIGINT) AS mb{d}" for d in range(64)
)
_DRIFT_SHIFT = " + ".join(
    f"(m{d} - mb{d}) * (m{d} - mb{d})" for d in range(64)
)

EXT_ORACLES["q_embedding_drift"] = f"""
    WITH e AS (
        SELECT vec_id % 2 AS side, label,
               CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    agg AS (
        SELECT side, label, CAST(COUNT(*) AS BIGINT) AS n, {_DRIFT_SUMS}
        FROM e GROUP BY 1, 2
    ),
    a AS (SELECT label, n AS n_a, {_DRIFT_MEANS} FROM agg WHERE side = 0),
    b AS (SELECT label, n AS n_b, {_DRIFT_MEANS_B} FROM agg WHERE side = 1)
    SELECT a.label, a.n_a, b.n_b,
           CAST({_DRIFT_SHIFT} AS BIGINT) AS centroid_shift_sq
    FROM a JOIN b USING (label)
"""

# q_bloom_prefilter_join (queries_ext.q_bloom_prefilter_join) — the
# Bloom stage is answer-transparent, so the oracle is the PLAIN
# join+aggregate; green proves zero false negatives.
EXT_ORACLES["q_bloom_prefilter_join"] = """
    SELECT s.s_suppkey, s.s_name,
           CAST(SUM(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE s.s_nationkey = 3
    GROUP BY 1, 2
"""

# q_heavy_hitters (queries_ext.q_heavy_hitters) — the PLAIN exact
# threshold count over all bigrams: the Spark side's Misra-Gries
# candidate pass is answer-transparent (guaranteed superset + exact
# verify), so a hash match proves the bounded-state summary lossless.
# generate_series(1, 0) is empty in DuckDB, mirroring the size >= 2
# guard; the threshold compare is exact integer arithmetic.
EXT_ORACLES["q_heavy_hitters"] = """
    WITH t AS (
        SELECT string_split(trim(lower(text)), ' ') AS arr FROM documents
    ),
    g AS (
        SELECT arr[i] || ' ' || arr[i + 1] AS token
        FROM t, unnest(generate_series(1, len(arr) - 1)) AS s(i)
    ),
    c AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM g GROUP BY token
    )
    SELECT token, cnt FROM c
    WHERE cnt * 800 > (SELECT COUNT(*) FROM g)
"""

# q_profile_table (queries_ext.q_profile_table) — per-column UNION ALL
# over the SAME string canon the Spark side unpivots (bigints verbatim,
# timestamps second-truncated ISO). min/max are over the string canon
# in both engines by construction.
_PROFILE_COLS = (
    ("o_orderkey", "CAST(o_orderkey AS VARCHAR)"),
    ("o_custkey", "CAST(o_custkey AS VARCHAR)"),
    ("o_orderstatus", "o_orderstatus"),
    ("o_orderpriority", "o_orderpriority"),
    ("o_orderdate", "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')"),
)
EXT_ORACLES["q_profile_table"] = " UNION ALL ".join(
    f"""
    SELECT '{name}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(v) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
           MIN(v) AS min_val,
           MAX(v) AS max_val
    FROM (SELECT {expr} AS v FROM orders)
    """
    for name, expr in _PROFILE_COLS
)

# q_dup_rate_by_domain (queries_ext.q_dup_rate_by_domain) — reuses the
# shared LSH pair CTE chain (the cc CTE goes unreferenced and is never
# evaluated); dup_ppm is floor division on non-negative operands in
# both engines. DISTINCT-over-UNION-ALL, not bare UNION: inside a
# WITH RECURSIVE chain DuckDB does NOT set-dedup a bare UNION in a
# non-self-referencing CTE (measured — endpoints came back with
# multiplicity and inflated the LEFT JOIN), so the dedup is explicit.
EXT_ORACLES["q_dup_rate_by_domain"] = (
    _NEARDUP_CC_CTES
    + """
    , dup AS (
        SELECT DISTINCT doc_id FROM (
            SELECT id_a AS doc_id FROM pairs
            UNION ALL
            SELECT id_b AS doc_id FROM pairs
        )
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(dup.doc_id) AS BIGINT) AS n_dup_docs,
           CAST(COUNT(dup.doc_id) * 1000000 // COUNT(*) AS BIGINT)
               AS dup_ppm
    FROM documents d LEFT JOIN dup USING (doc_id)
    GROUP BY d.source
"""
)

# q_ann_filtered (queries_ext.q_ann_filtered) — q_ann_index_probe's
# frozen-universe IVF chain (8 lowest-id anchors, nprobe=2) with the
# metadata predicate applied to the CANDIDATE side before the top-k
# (pre-filtering): rank only label=3 vectors inside the probed buckets.
EXT_ORACLES["q_ann_filtered"] = """
    WITH a AS (
        SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS avec
        FROM embeddings ORDER BY vec_id ASC LIMIT 8
    ),
    assign AS (
        SELECT
            e.vec_id,
            e.label,
            CAST(e.embedding AS DOUBLE[]) AS v,
            a.anchor_id,
            row_number() OVER (
                PARTITION BY e.vec_id
                ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), a.avec)
                             DESC,
                         a.anchor_id ASC
            ) AS rn
        FROM embeddings e CROSS JOIN a
    ),
    c AS (
        SELECT vec_id, v, anchor_id AS bucket FROM assign
        WHERE rn = 1 AND label = 3
    ),
    q AS (
        SELECT vec_id, v, anchor_id AS bucket
        FROM assign WHERE vec_id < 5 AND rn <= 2
    )
    SELECT
        q.vec_id AS query_id,
        c.vec_id AS neighbor_id,
        CAST(row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(c.v, q.v) DESC, c.vec_id ASC
        ) AS INT) AS rank
    FROM c
    JOIN q ON c.bucket = q.bucket
    WHERE c.vec_id != q.vec_id
    QUALIFY rank <= 10
"""

# q_maxsim_retrieval (queries_ext.q_maxsim_retrieval) — ColBERT MaxSim
# over micro-int chunks: per (query chunk, candidate doc) MIN integer
# L2², summed per candidate doc. Exact integer arithmetic end to end
# (the PQ/kmeans convention), so the score column hash-matches.
EXT_ORACLES["q_maxsim_retrieval"] = """
    WITH e AS (
        SELECT vec_id, vec_id // 4 AS doc,
               CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    elem AS (
        SELECT vec_id, doc, i,
               CAST(round(v[i] * 1000000, 0) AS BIGINT) AS x
        FROM e, unnest(generate_series(1, 64)) t(i)
    ),
    qe AS (
        SELECT vec_id AS qc, doc AS qdoc, i, x FROM elem WHERE vec_id < 8
    ),
    dist AS (
        SELECT qe.qdoc, qe.qc, elem.doc AS cdoc,
               elem.vec_id AS cc,
               CAST(SUM((qe.x - elem.x) * (qe.x - elem.x)) AS BIGINT) AS d
        FROM qe JOIN elem ON qe.i = elem.i
        WHERE elem.doc != qe.qdoc
        GROUP BY 1, 2, 3, 4
    ),
    best AS (
        SELECT qdoc, qc, cdoc, MIN(d) AS md FROM dist GROUP BY 1, 2, 3
    ),
    score AS (
        SELECT qdoc, cdoc, CAST(SUM(md) AS BIGINT) AS score
        FROM best GROUP BY 1, 2
    )
    SELECT qdoc AS query_doc, cdoc AS doc, score,
           CAST(row_number() OVER (
               PARTITION BY qdoc ORDER BY score ASC, cdoc ASC
           ) AS INT) AS rank
    FROM score
    QUALIFY rank <= 3
"""

# q_skyline (queries_ext.q_skyline) — the naive NOT EXISTS dominance
# form over distinct (x, y) representatives: the Spark side's bucketed
# local-skyline + suffix-max decomposition must reproduce it exactly.
EXT_ORACLES["q_skyline"] = """
    WITH d AS (
        SELECT doc_id,
               CAST(len(string_split(trim(text), ' ')) AS BIGINT)
                   AS n_words,
               CAST(len(list_distinct(string_split(trim(text), ' ')))
                    * 1000000
                    // len(string_split(trim(text), ' ')) AS BIGINT)
                   AS distinct_ppm
        FROM documents
    ),
    p AS (
        SELECT n_words, distinct_ppm, MIN(doc_id) AS doc_id
        FROM d GROUP BY n_words, distinct_ppm
    )
    SELECT doc_id, n_words, distinct_ppm
    FROM p a
    WHERE NOT EXISTS (
        SELECT 1 FROM p b
        WHERE b.n_words >= a.n_words
          AND b.distinct_ppm >= a.distinct_ppm
          AND (b.n_words != a.n_words OR b.distinct_ppm != a.distinct_ppm)
    )
"""


def _kcenter_cte_sql(k: int = 4) -> str:
    """Unrolled greedy k-center rounds (q_kcenter_select's oracle):
    round r picks the vector with the maximum min-L2²(micro-int) to the
    union of rounds 0..r-1 (lowest-id tie-break); round 0 is the lowest
    id. One CTE pair (dist, selection) per round — the q_kmeans_assign
    unrolling convention."""
    ctes = [
        """e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    elem AS (
        SELECT vec_id, i, CAST(round(v[i] * 1000000, 0) AS BIGINT) AS x
        FROM e, unnest(generate_series(1, 64)) t(i)
    ),
    s0 AS (SELECT vec_id FROM e ORDER BY vec_id ASC LIMIT 1)"""
    ]
    for r in range(1, k):
        sel_union = " UNION ALL ".join(
            f"SELECT vec_id FROM s{j}" for j in range(r)
        )
        ctes.append(f"""d{r}p AS (
        SELECT a.vec_id, b.vec_id AS sid,
               CAST(SUM((a.x - b.x) * (a.x - b.x)) AS BIGINT) AS d
        FROM elem a
        JOIN elem b ON a.i = b.i
        WHERE b.vec_id IN ({sel_union})
        GROUP BY 1, 2
    ),
    d{r} AS (SELECT vec_id, MIN(d) AS d FROM d{r}p GROUP BY vec_id),
    s{r} AS (
        SELECT vec_id FROM d{r}
        WHERE vec_id NOT IN ({sel_union})
        ORDER BY d DESC, vec_id ASC LIMIT 1
    )""")
    body = " UNION ALL ".join(
        f"SELECT {r} AS sel_round, vec_id FROM s{r}" for r in range(k)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + body


EXT_ORACLES["q_kcenter_select"] = _kcenter_cte_sql(4)

# q_vocab_coverage (queries_ext.q_vocab_coverage) — top-20 words with
# cumulative corpus share (exact integer ppm, floor division).
EXT_ORACLES["q_vocab_coverage"] = """
    WITH toks AS (
        SELECT unnest(string_split(trim(lower(text)), ' ')) AS word
        FROM documents
    ),
    c AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM toks GROUP BY word
    ),
    top AS (
        SELECT word, cnt,
               CAST(row_number() OVER (ORDER BY cnt DESC, word ASC) AS INT)
                   AS rank
        FROM c
        ORDER BY cnt DESC, word ASC
        LIMIT 20
    )
    SELECT rank, word, cnt,
           CAST(SUM(cnt) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING)
                * 1000000 // (SELECT COUNT(*) FROM toks) AS BIGINT)
               AS coverage_ppm
    FROM top
"""

# q_gram_matrix (queries_ext.q_gram_matrix) — the NAIVE elem⋈elem
# self-join form of the centered Gram statistic (the Spark side
# generates the outer product map-side instead); exact e4-scaled
# integers, HUGEINT sums cast back to BIGINT.
EXT_ORACLES["q_gram_matrix"] = """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    elem AS (
        SELECT vec_id, CAST(i - 1 AS INT) AS i,
               CAST(round(v[i] * 10000, 0) AS BIGINT) AS x
        FROM e, unnest(generate_series(1, 64)) t(i)
    ),
    sxy AS (
        SELECT a.i AS i, b.i AS j,
               CAST(SUM(a.x * b.x) AS BIGINT) AS sxy,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM elem a JOIN elem b
          ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY 1, 2
    ),
    sx AS (SELECT i, CAST(SUM(x) AS BIGINT) AS sx FROM elem GROUP BY i)
    SELECT s.i, s.j,
           CAST(s.n * s.sxy - sa.sx * sb.sx AS BIGINT) AS cov_scaled
    FROM sxy s
    JOIN sx sa ON s.i = sa.i
    JOIN sx sb ON s.j = sb.i
"""

# q_ivf_bucket_stats (queries_ext.q_ivf_bucket_stats) — recompute the
# IVF quantization (8 lowest-id anchors) and the build's sub-split
# arithmetic (ceil(count / max_bucket_size=50)); green re-proves the
# stored index assignment against the anchor policy.
EXT_ORACLES["q_ivf_bucket_stats"] = """
    WITH a AS (
        SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS avec
        FROM embeddings ORDER BY vec_id ASC LIMIT 8
    ),
    assign AS (
        SELECT
            e.vec_id,
            a.anchor_id,
            row_number() OVER (
                PARTITION BY e.vec_id
                ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), a.avec)
                             DESC,
                         a.anchor_id ASC
            ) AS rn
        FROM embeddings e CROSS JOIN a
    )
    SELECT
        CAST(anchor_id AS INT) AS bucket,
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(ceil(COUNT(*) / 50.0) AS INT) AS n_subs
    FROM assign WHERE rn = 1
    GROUP BY anchor_id
"""

# q_gram_incremental — the STRONGEST oracle: full recompute over all
# embeddings, identical to q_gram_matrix's SQL; green proves
# merged-incremental ≡ recompute (the MV-maintenance invariant).
EXT_ORACLES["q_gram_incremental"] = EXT_ORACLES["q_gram_matrix"]

# q_char_entropy (queries_ext.q_char_entropy) — per-doc character
# Shannon entropy under the repo's log convention: every ln()
# micro-rounded to an integer immediately, exact integer sums, ONE
# final rounded division per doc.
EXT_ORACLES["q_char_entropy"] = """
    WITH chars AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch
        FROM documents
    ),
    pc AS (
        SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
        FROM chars WHERE ch != '' GROUP BY doc_id, ch
    ),
    agg AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(c * CAST(round(ln(c) * 1000000, 0) AS BIGINT))
                    AS BIGINT) AS sclnc_micro
        FROM pc GROUP BY doc_id
    )
    SELECT doc_id, n,
           round((CAST(round(ln(n) * 1000000, 0) AS BIGINT)
                  - sclnc_micro / n) / 1000000.0, 6) AS entropy
    FROM agg
"""

# q_ann_recall_filtered — the filtered IVF probe's CTE chain (as in
# q_ann_filtered) left-joined against exact brute force over the
# label-filtered corpus; recall counted per query.
EXT_ORACLES["q_ann_recall_filtered"] = """
    WITH a AS (
        SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS avec
        FROM embeddings ORDER BY vec_id ASC LIMIT 8
    ),
    assign AS (
        SELECT
            e.vec_id,
            e.label,
            CAST(e.embedding AS DOUBLE[]) AS v,
            a.anchor_id,
            row_number() OVER (
                PARTITION BY e.vec_id
                ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), a.avec)
                             DESC,
                         a.anchor_id ASC
            ) AS rn
        FROM embeddings e CROSS JOIN a
    ),
    c AS (
        SELECT vec_id, v, anchor_id AS bucket FROM assign
        WHERE rn = 1 AND label = 3
    ),
    q AS (
        SELECT vec_id, v, anchor_id AS bucket
        FROM assign WHERE vec_id < 5 AND rn <= 2
    ),
    approx AS (
        SELECT query_id, neighbor_id FROM (
            SELECT
                q.vec_id AS query_id,
                c.vec_id AS neighbor_id,
                row_number() OVER (
                    PARTITION BY q.vec_id
                    ORDER BY list_cosine_similarity(c.v, q.v) DESC,
                             c.vec_id ASC
                ) AS rank
            FROM c
            JOIN q ON c.bucket = q.bucket
            WHERE c.vec_id != q.vec_id
        ) WHERE rank <= 10
    ),
    qv AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id < 5
    ),
    cv AS (
        SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE label = 3
    ),
    exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT
                qv.query_id,
                cv.neighbor_id,
                row_number() OVER (
                    PARTITION BY qv.query_id
                    ORDER BY list_cosine_similarity(cv.v, qv.v) DESC,
                             cv.neighbor_id ASC
                ) AS rank
            FROM qv CROSS JOIN cv
            WHERE cv.neighbor_id != qv.query_id
        ) WHERE rank <= 10
    )
    SELECT
        e.query_id,
        CAST(COUNT(ap.neighbor_id) AS BIGINT) AS n_matched,
        round(COUNT(ap.neighbor_id) / 10.0, 6) AS recall_at_10
    FROM exact e
    LEFT JOIN approx ap
      ON e.query_id = ap.query_id AND e.neighbor_id = ap.neighbor_id
    GROUP BY e.query_id
"""

# q_impute_median (queries_ext.q_impute_median) — group-median fill
# with global fallback over the simulated event_id % 7 dropout;
# quantile_cont ↔ F.percentile (the q_percentile_exact convention).
EXT_ORACLES["q_impute_median"] = """
    WITH ev AS (
        SELECT event_id, event_type, CAST(value AS DOUBLE) AS v
        FROM events
    ),
    present AS (SELECT * FROM ev WHERE event_id % 7 != 0),
    by_type AS (
        SELECT event_type, quantile_cont(v, 0.5) AS type_median
        FROM present GROUP BY event_type
    ),
    gmed AS (SELECT quantile_cont(v, 0.5) AS global_median FROM present)
    SELECT
        ev.event_id,
        ev.event_type,
        round(
            CASE WHEN ev.event_id % 7 = 0
                 THEN COALESCE(bt.type_median, g.global_median)
                 ELSE ev.v END,
            6
        ) AS value_filled,
        ev.event_id % 7 = 0 AS imputed
    FROM ev
    LEFT JOIN by_type bt USING (event_type)
    CROSS JOIN gmed g
"""

# q_maxsim_index (queries_ext.q_maxsim_index) — frozen-universe mirror
# of the IVF-probed MaxSim: per-query-chunk nprobe=2 buckets, chunk
# pairs scored only inside probed buckets, per-chunk MIN / per-doc SUM
# integer L2², HAVING count = 4 (every query chunk matched).
EXT_ORACLES["q_maxsim_index"] = """
    WITH a AS (
        SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS avec
        FROM embeddings ORDER BY vec_id ASC LIMIT 8
    ),
    assign AS (
        SELECT
            e.vec_id,
            CAST(e.embedding AS DOUBLE[]) AS v,
            a.anchor_id,
            row_number() OVER (
                PARTITION BY e.vec_id
                ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), a.avec)
                             DESC,
                         a.anchor_id ASC
            ) AS rn
        FROM embeddings e CROSS JOIN a
    ),
    c AS (
        SELECT vec_id, vec_id // 4 AS cdoc, v, anchor_id AS bucket
        FROM assign WHERE rn = 1
    ),
    q AS (
        SELECT vec_id AS qc, vec_id // 4 AS qdoc, v, anchor_id AS bucket
        FROM assign WHERE vec_id < 8 AND rn <= 2
    ),
    celem AS (
        SELECT vec_id, cdoc, bucket, i,
               CAST(round(v[i] * 1000000, 0) AS BIGINT) AS x
        FROM c, unnest(generate_series(1, 64)) t(i)
    ),
    qelem AS (
        SELECT qc, qdoc, bucket, i,
               CAST(round(v[i] * 1000000, 0) AS BIGINT) AS x
        FROM q, unnest(generate_series(1, 64)) t(i)
    ),
    pair AS (
        SELECT qe.qdoc, qe.qc, ce.cdoc, ce.vec_id AS cc,
               CAST(SUM((qe.x - ce.x) * (qe.x - ce.x)) AS BIGINT) AS d
        FROM qelem qe
        JOIN celem ce ON qe.bucket = ce.bucket AND qe.i = ce.i
        WHERE ce.cdoc != qe.qdoc
        GROUP BY 1, 2, 3, 4
    ),
    best AS (
        SELECT qdoc, qc, cdoc, MIN(d) AS md FROM pair GROUP BY 1, 2, 3
    ),
    score AS (
        SELECT qdoc, cdoc, CAST(SUM(md) AS BIGINT) AS score
        FROM best GROUP BY 1, 2 HAVING COUNT(*) = 4
    )
    SELECT qdoc AS query_doc, cdoc AS doc, score,
           CAST(row_number() OVER (
               PARTITION BY qdoc ORDER BY score ASC, cdoc ASC
           ) AS INT) AS rank
    FROM score
    QUALIFY rank <= 3
"""


def _multiprobe_lsh_sql(n_planes: int = 4) -> str:
    """q_multiprobe_lsh's oracle: the q_embedding_lsh_topk bucket CTE,
    with the query side fanned out to its own bucket plus every
    Hamming-1 flip (substr surgery per plane position)."""
    flips = ["bucket"]
    for i in range(1, n_planes + 1):
        flips.append(
            f"substr(bucket, 1, {i - 1}) || "
            f"(CASE WHEN substr(bucket, {i}, 1) = '1' "
            f"THEN '0' ELSE '1' END) || substr(bucket, {i + 1})"
        )
    probe_union = "\n        UNION ALL ".join(
        f"SELECT vec_id, v, {f} AS probe FROM q0" for f in flips
    )
    return f"""
    WITH e AS (
        SELECT
            vec_id,
            CAST(embedding AS DOUBLE[]) AS v,
            {_hyperplane_bucket_sql("embedding", n_planes=n_planes, seed=0)}
                AS bucket
        FROM embeddings
    ),
    q0 AS (SELECT vec_id, v, bucket FROM e WHERE vec_id < 5),
    probes AS (
        {probe_union}
    )
    SELECT
        q.vec_id AS query_id,
        c.vec_id AS neighbor_id,
        CAST(row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(c.v, q.v) DESC, c.vec_id ASC
        ) AS INT) AS rank
    FROM e c
    JOIN probes q ON c.bucket = q.probe
    WHERE c.vec_id != q.vec_id
    QUALIFY rank <= 10
"""


EXT_ORACLES["q_multiprobe_lsh"] = _multiprobe_lsh_sql(4)


# --- round-8 observability wave ------------------------------------------

# Sizing report (queries_ext.q_sizing_report): exact integer ceil-sqrt
# via a +-1 adjustment of the double sqrt — identical arithmetic on the
# Spark side, so both engines agree even when the double sqrt lands a
# hair under/over an exact square.
EXT_ORACLES["q_sizing_report"] = """
    WITH counts AS (
        SELECT 'documents' AS corpus, COUNT(*) AS n FROM documents
        UNION ALL
        SELECT 'embeddings' AS corpus, COUNT(*) AS n FROM embeddings
    ),
    a AS (
        SELECT corpus, n,
               CAST(ceil(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS a0
        FROM counts
    ),
    k AS (
        SELECT corpus, n,
               GREATEST(CAST(1 AS BIGINT), CASE
                   WHEN (a0 - 1) * (a0 - 1) >= n THEN a0 - 1
                   WHEN a0 * a0 < n THEN a0 + 1
                   ELSE a0 END) AS n_anchors
        FROM a
    )
    SELECT corpus,
           CAST(n AS BIGINT) AS n_rows,
           CAST(n_anchors AS BIGINT) AS n_anchors,
           CAST(8 * GREATEST(1, (n + n_anchors - 1) // n_anchors)
                AS BIGINT) AS max_bucket_size,
           CAST(GREATEST(1, (n + 63) // 64) AS BIGINT) AS kmeans_k
    FROM k
"""

# Shard balance (queries_ext.q_shard_balance): shard hash identical to
# q_training_shards; integer ppm share.
EXT_ORACLES["q_shard_balance"] = f"""
    WITH h AS (
        SELECT doc_id, n_chars,
               md5(CAST(doc_id AS VARCHAR) || '|shard') AS hh
        FROM documents
    ),
    s AS (
        SELECT n_chars,
               CAST((({_NIB.format(i=1)}) * 16 + ({_NIB.format(i=2)})) % 8
                    AS INT) AS shard
        FROM h
    ),
    per AS (
        SELECT shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM s GROUP BY shard
    ),
    t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM per)
    SELECT shard, n_docs, n_chars,
           CAST(n_docs * 1000000 // total AS BIGINT) AS share_ppm
    FROM per, t
"""

# Model-vs-rules calibration (queries_ext.q_quality_calibration):
# composes the classifier and Gopher oracles verbatim as CTEs; decile
# cutoffs are exact quantile_cont == F.percentile (the q_perplexity_mix
# precedent), bucketing is a strict-greater count over the 9 cutoffs in
# both engines.
EXT_ORACLES["q_quality_calibration"] = f"""
    WITH model AS (
        SELECT doc_id, score_micro
        FROM ({EXT_ORACLES["q_quality_classifier"]})
        WHERE score_micro IS NOT NULL
    ),
    gopher AS (
        SELECT doc_id, passes FROM ({EXT_ORACLES["q_gopher_rules"]})
    ),
    j AS (
        SELECT m.doc_id, m.score_micro, g.passes
        FROM model m JOIN gopher g USING (doc_id)
    ),
    cuts AS (
        SELECT quantile_cont(score_micro,
            [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
        FROM j
    ),
    b AS (
        SELECT j.score_micro, j.passes,
               CAST(1 + len(list_filter(qs, c -> j.score_micro > c))
                    AS INT) AS decile
        FROM j, cuts
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN score_micro >= 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_model_keep,
           CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT)
               AS n_gopher_pass,
           CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS gopher_pass_rate_micro
    FROM b GROUP BY decile
"""

# LSH band health (queries_ext.q_lsh_band_stats): the banded CTE chain
# is the q_minhash_lsh_pairs oracle's, stopped at bucket sizes — no
# pair is ever materialized, matching the Spark side's two bounded
# aggregates over banded_signatures.
EXT_ORACLES["q_lsh_band_stats"] = """
    WITH t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    sh AS (
        SELECT DISTINCT
            t.doc_id,
            arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS word
        FROM t, unnest(generate_series(1, len(arr) - 2)) AS g(i)
    ),
    sig AS (
        SELECT
            doc_id,
            MIN(md5(word || '#0')) AS h0,
            MIN(md5(word || '#1')) AS h1,
            MIN(md5(word || '#2')) AS h2,
            MIN(md5(word || '#3')) AS h3
        FROM sh
        GROUP BY doc_id
    ),
    banded AS (
        SELECT doc_id, 0 AS band_idx, md5(h0 || '|' || h1) AS band_key
        FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_idx, md5(h2 || '|' || h3) AS band_key
        FROM sig
    ),
    bsz AS (
        SELECT band_idx, band_key, COUNT(*) AS bucket_size
        FROM banded GROUP BY 1, 2
    )
    SELECT CAST(band_idx AS INT) AS band_idx,
           CAST(bucket_size AS BIGINT) AS bucket_size,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(COUNT(*) * bucket_size * (bucket_size - 1) // 2 AS BIGINT)
               AS cand_pairs
    FROM bsz GROUP BY band_idx, bucket_size
"""


# Semantic decontamination (queries_ext.q_semantic_decontaminate): the
# frozen-universe mirror of the materialized IVF probe (8 lowest-id
# anchors, nprobe=2 — the q_semantic_neighbors quantization), threshold
# cos >= 0.3, eval set = vec_id % 40 == 0.
EXT_ORACLES["q_semantic_decontaminate"] = """
    WITH a AS (
        SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS avec
        FROM embeddings ORDER BY vec_id ASC LIMIT 8
    ),
    assign AS (
        SELECT
            e.vec_id,
            CAST(e.embedding AS DOUBLE[]) AS v,
            a.anchor_id,
            row_number() OVER (
                PARTITION BY e.vec_id
                ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), a.avec)
                             DESC,
                         a.anchor_id ASC
            ) AS rn
        FROM embeddings e CROSS JOIN a
    ),
    c AS (
        SELECT vec_id, v, anchor_id AS bucket
        FROM assign WHERE rn = 1 AND vec_id % 40 != 0
    ),
    q AS (
        SELECT vec_id, v, anchor_id AS bucket
        FROM assign WHERE vec_id % 40 = 0 AND rn <= 2
    ),
    hits AS (
        SELECT c.vec_id AS cand_id, q.vec_id AS eval_id
        FROM c JOIN q ON c.bucket = q.bucket
        WHERE list_cosine_similarity(c.v, q.v) >= 0.3
    )
    SELECT cand_id AS vec_id,
           CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
           CAST(MIN(eval_id) AS BIGINT) AS first_eval_id
    FROM hits GROUP BY cand_id
"""


# LSH dedup recall S-curve (queries_ext.q_lsh_recall): the exact-pair
# and banded-candidate oracles composed verbatim as CTEs; deciles and
# recall are pure integer arithmetic.
EXT_ORACLES["q_lsh_recall"] = f"""
    WITH exact AS (
        SELECT id_a, id_b,
               CAST(n_shared * 10 // (n_a + n_b - n_shared) AS INT)
                   AS jac_decile
        FROM ({EXT_ORACLES["q_ngram_jaccard"]})
    ),
    cand AS (
        SELECT id_a, id_b, 1 AS c
        FROM ({EXT_ORACLES["q_minhash_lsh_pairs"]})
    )
    SELECT jac_decile,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(COALESCE(c, 0)) AS BIGINT) AS n_caught,
           CAST(SUM(COALESCE(c, 0)) * 1000000 // COUNT(*) AS BIGINT)
               AS recall_micro
    FROM exact LEFT JOIN cand USING (id_a, id_b)
    GROUP BY jac_decile
"""


# Bradley-Terry MM ratings (queries_ext.q_bradley_terry): two unrolled
# iterations, all-integer arithmetic (micro ratings, n*1e12 // (pi+pj)
# terms, W*1e12 // denom updates with floor 1000) — truncating integer
# division agrees across engines on positive operands.
EXT_ORACLES["q_bradley_terry"] = """
    WITH li AS (
        SELECT l_partkey, l_suppkey,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc
        FROM lineitem
    ),
    raw AS (
        SELECT a.l_suppkey AS sa, b.l_suppkey AS sb, a.pc AS pa, b.pc AS pb
        FROM li a
        JOIN li b ON a.l_partkey = b.l_partkey
                 AND a.l_suppkey < b.l_suppkey
        WHERE a.pc != b.pc
    ),
    pairs AS (
        SELECT sa, sb,
               SUM(CASE WHEN pa < pb THEN 1 ELSE 0 END) AS w,
               COUNT(*) AS n
        FROM raw GROUP BY sa, sb
    ),
    sym AS (
        SELECT sa AS i, sb AS j, w, n FROM pairs
        UNION ALL
        SELECT sb AS i, sa AS j, n - w AS w, n FROM pairs
    ),
    wins AS (
        SELECT i, CAST(SUM(w) AS BIGINT) AS W,
               CAST(SUM(n) AS BIGINT) AS n_comp
        FROM sym GROUP BY i
    ),
    -- iteration 1: p0 = 1 everywhere, so each term is exactly
    -- n*500000 and the denominator collapses to n_comp*500000
    p1 AS (
        SELECT i,
               GREATEST(CAST(W * 1000000000000 // (n_comp * 500000)
                             AS BIGINT), 1000) AS p
        FROM wins
    ),
    d2 AS (
        SELECT sym.i,
               GREATEST(CAST(SUM(sym.n * 1000000000000 // (pi.p + pj.p))
                             AS BIGINT), 1) AS den
        FROM sym
        JOIN p1 pi ON pi.i = sym.i
        JOIN p1 pj ON pj.i = sym.j
        GROUP BY sym.i
    ),
    p2 AS (
        SELECT wins.i,
               GREATEST(CAST(W * 1000000000000 // den AS BIGINT), 1000)
                   AS p
        FROM wins JOIN d2 USING (i)
    )
    SELECT p2.i AS s_suppkey,
           wins.W AS wins,
           wins.n_comp AS n_comparisons,
           CAST(p2.p AS BIGINT) AS rating_micro
    FROM p2 JOIN wins ON wins.i = p2.i
"""


# URL canonicalization + URL-keyed dedup (queries_ext.q_url_dedup):
# the synthetic raw URL and every canonicalization step mirror
# functions/urls.py verbatim (RE2-safe patterns so Java regex and
# DuckDB agree; list_sort == array_sort on plain strings).
EXT_ORACLES["q_url_dedup"] = r"""
    WITH u AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTPS://' END)
               || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
               || source || '.Example.COM'
               || (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END)
               || '/catalog/item-' || CAST(doc_id % 40 AS VARCHAR)
               || (CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END)
               || '?utm_source=feed' || CAST(doc_id % 5 AS VARCHAR)
               || '&id=' || CAST(doc_id % 100 AS VARCHAR)
               || '#sec-' || CAST(doc_id % 7 AS VARCHAR) AS raw_url
        FROM documents
    ),
    s1 AS (
        SELECT doc_id, raw_url,
               regexp_replace(raw_url, '#.*', '') AS nf
        FROM u
    ),
    s2 AS (
        SELECT *,
               lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
                   AS scheme,
               regexp_replace(
                   lower(regexp_extract(
                       nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
                   '^www\.', '') AS host0,
               regexp_replace(
                   regexp_extract(
                       nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
                   '/+$', '') AS path0,
               regexp_extract(nf, '\?([^#]*)', 1) AS qs
        FROM s1
    ),
    s3 AS (
        SELECT doc_id, raw_url, scheme,
               CASE WHEN scheme = 'https'
                        THEN regexp_replace(host0, ':443$', '')
                    WHEN scheme = 'http'
                        THEN regexp_replace(host0, ':80$', '')
                    ELSE host0 END AS host,
               CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
               array_to_string(
                   list_sort(list_filter(
                       string_split(qs, '&'),
                       p -> p <> '' AND NOT regexp_matches(
                           p, '^(utm_[^=]*|ref|fbclid|gclid)='))),
                   '&') AS kq
        FROM s2
    ),
    canon AS (
        SELECT doc_id, raw_url, host,
               scheme || '://' || host || path
               || (CASE WHEN kq = '' THEN '' ELSE '?' || kq END)
                   AS canonical_url
        FROM s3
    )
    SELECT host, canonical_url,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_raw_variants
    FROM canon
    GROUP BY 1, 2
"""


# C4 line-level cleaning (queries_ext.q_line_filter): fixed 10-word
# lines, min-5-words + badword rules with short-first attribution,
# >= 3 kept lines to survive; list_slice's inclusive end mirrors
# Spark slice(start, length) on in-range windows and both truncate
# the tail chunk.
EXT_ORACLES["q_line_filter"] = """
    WITH t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    l AS (
        SELECT doc_id,
               list_transform(
                   generate_series(
                       0, CAST(ceil(len(arr) / 10.0) AS INT) - 1),
                   i -> list_slice(arr, i * 10 + 1, i * 10 + 10)) AS lines
        FROM t
    ),
    c AS (
        SELECT doc_id,
               len(lines) AS n_lines,
               list_filter(lines,
                   ln -> len(ln) >= 5 AND NOT list_has_any(ln, ['dup']))
                   AS kept,
               len(list_filter(lines, ln -> len(ln) < 5)) AS n_drop_short,
               len(list_filter(lines,
                   ln -> len(ln) >= 5 AND list_has_any(ln, ['dup'])))
                   AS n_drop_badword
        FROM l
    )
    SELECT doc_id,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept,
           CAST(n_drop_short AS BIGINT) AS n_drop_short,
           CAST(n_drop_badword AS BIGINT) AS n_drop_badword,
           CAST(len(flatten(kept)) AS BIGINT) AS n_kept_words,
           md5(array_to_string(
               list_transform(kept, ln -> array_to_string(ln, ' ')), ' '))
               AS clean_md5
    FROM c
    WHERE len(kept) >= 3
"""


# Per-doc 3-gram novelty (queries_ext.q_ngram_novelty): distinct
# (doc, gram) universe, df = docs per gram, novelty = df==1 fraction
# in integer micro.
EXT_ORACLES["q_ngram_novelty"] = """
    WITH t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    sh AS (
        SELECT DISTINCT
            t.doc_id,
            arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS sh
        FROM t, unnest(generate_series(1, len(arr) - 2)) AS g(i)
    ),
    d AS (
        SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
           CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS novelty_micro
    FROM sh JOIN d USING (sh)
    GROUP BY doc_id
"""


# DPO preference pairs (queries_ext.q_preference_pairs): chosen =
# min (pc, suppkey) per part; rejected clears the integer 1.5x margin
# (2*pc >= 3*chosen); rank filter runs AFTER the margin WHERE (SQL
# window functions evaluate post-WHERE, matching the Spark order).
EXT_ORACLES["q_preference_pairs"] = """
    WITH q AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS pc
        FROM lineitem GROUP BY 1, 2
    ),
    ch AS (
        SELECT l_partkey, l_suppkey AS chosen_suppkey, pc AS chosen_pc,
               ROW_NUMBER() OVER (
                   PARTITION BY l_partkey ORDER BY pc, l_suppkey) AS rn
        FROM q
    ),
    c1 AS (
        SELECT l_partkey, chosen_suppkey, chosen_pc FROM ch WHERE rn = 1
    ),
    r AS (
        SELECT q.l_partkey, c1.chosen_suppkey,
               q.l_suppkey AS rejected_suppkey,
               c1.chosen_pc, q.pc,
               ROW_NUMBER() OVER (
                   PARTITION BY q.l_partkey
                   ORDER BY q.pc DESC, q.l_suppkey) AS pair_rank
        FROM q JOIN c1 USING (l_partkey)
        WHERE q.l_suppkey != c1.chosen_suppkey
          AND q.pc * 2 >= c1.chosen_pc * 3
    )
    SELECT l_partkey, chosen_suppkey, rejected_suppkey,
           chosen_pc AS chosen_price_cents,
           pc AS rejected_price_cents,
           pc - chosen_pc AS margin_cents,
           CAST(pair_rank AS INT) AS pair_rank
    FROM r
    WHERE pair_rank <= 3
"""


# LSH banding S-curve on controlled mutations
# (queries_ext.q_mutation_recall): mutation period, shingle sets, the
# md5 minhash family and band keys all mirror the Spark in-row forms
# verbatim; list_min on md5 hex strings == array_min (both
# lexicographic on lowercase hex).
EXT_ORACLES["q_mutation_recall"] = """
    WITH t AS (
        SELECT doc_id,
               string_split(trim(text), ' ') AS arr,
               CASE CAST(doc_id % 6 AS INT) WHEN 0 THEN 2 WHEN 1 THEN 4
                    WHEN 2 THEN 8 WHEN 3 THEN 16 WHEN 4 THEN 32
                    ELSE 64 END AS per
        FROM documents
    ),
    m AS (
        SELECT doc_id, arr,
               list_transform(
                   generate_series(1, len(arr)),
                   i -> CASE WHEN i % per = 0 THEN arr[i] || '~'
                             ELSE arr[i] END) AS mut
        FROM t
    ),
    s AS (
        SELECT doc_id,
               CASE WHEN len(arr) >= 3 THEN list_distinct(list_transform(
                   generate_series(1, len(arr) - 2),
                   i -> arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2]))
                   ELSE CAST([] AS VARCHAR[]) END AS sa,
               CASE WHEN len(mut) >= 3 THEN list_distinct(list_transform(
                   generate_series(1, len(mut) - 2),
                   i -> mut[i] || ' ' || mut[i + 1] || ' ' || mut[i + 2]))
                   ELSE CAST([] AS VARCHAR[]) END AS sb
        FROM m
    ),
    k AS (
        SELECT doc_id,
               len(list_intersect(sa, sb)) AS inter,
               len(sa) + len(sb) - len(list_intersect(sa, sb)) AS uni,
               md5(list_min(list_transform(sa, x -> md5(x || '#0'))) || '|'
                   || list_min(list_transform(sa, x -> md5(x || '#1'))))
                   AS a0,
               md5(list_min(list_transform(sa, x -> md5(x || '#2'))) || '|'
                   || list_min(list_transform(sa, x -> md5(x || '#3'))))
                   AS a1,
               md5(list_min(list_transform(sb, x -> md5(x || '#0'))) || '|'
                   || list_min(list_transform(sb, x -> md5(x || '#1'))))
                   AS b0,
               md5(list_min(list_transform(sb, x -> md5(x || '#2'))) || '|'
                   || list_min(list_transform(sb, x -> md5(x || '#3'))))
                   AS b1
        FROM s
    ),
    c AS (
        SELECT CAST(inter * 10 // uni AS INT) AS jac_decile,
               CASE WHEN a0 = b0 OR a1 = b1 THEN 1 ELSE 0 END AS caught
        FROM k WHERE uni > 0
    )
    SELECT jac_decile,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(caught) AS BIGINT) AS n_caught,
           CAST(SUM(caught) * 1000000 // COUNT(*) AS BIGINT)
               AS recall_micro
    FROM c GROUP BY jac_decile
"""


# Triangle census of the LSH candidate graph
# (queries_ext.q_triangle_count): edges = the q_minhash_lsh_pairs
# oracle verbatim; degree-ordered orientation with the "<= keeps id_a"
# tie-break (id_a < id_b in the edge set), compact-forward wedge
# closure against the canonical edge form.
EXT_ORACLES["q_triangle_count"] = f"""
    WITH edges AS (
        SELECT id_a, id_b FROM ({{LSH_PAIRS}})
    ),
    deg AS (
        SELECT v, COUNT(*) AS deg FROM (
            SELECT id_a AS v FROM edges
            UNION ALL SELECT id_b AS v FROM edges
        ) GROUP BY v
    ),
    orient AS (
        SELECT CASE WHEN da.deg <= db.deg THEN e.id_a ELSE e.id_b END AS u,
               CASE WHEN da.deg <= db.deg THEN e.id_b ELSE e.id_a END AS v
        FROM edges e
        JOIN deg da ON da.v = e.id_a
        JOIN deg db ON db.v = e.id_b
    ),
    w AS (
        SELECT o1.v AS x, o2.v AS y
        FROM orient o1 JOIN orient o2 ON o1.u = o2.u AND o1.v < o2.v
    ),
    tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM w JOIN edges e
          ON e.id_a = LEAST(x, y) AND e.id_b = GREATEST(x, y)
    ),
    ns AS (
        SELECT COUNT(*) AS n_nodes,
               COALESCE(SUM(deg * (deg - 1) // 2), 0) AS n_wedges
        FROM deg
    ),
    ec AS (SELECT COUNT(*) AS n_edges FROM edges)
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(n_edges AS BIGINT) AS n_edges,
           CAST(n_wedges AS BIGINT) AS n_wedges,
           CAST(n_triangles AS BIGINT) AS n_triangles,
           CAST(3 * n_triangles * 1000000 // GREATEST(n_wedges, 1)
                AS BIGINT) AS transitivity_micro
    FROM ns, ec, tri
"""

EXT_ORACLES["q_triangle_count"] = EXT_ORACLES["q_triangle_count"].replace(
    "{LSH_PAIRS}", EXT_ORACLES["q_minhash_lsh_pairs"]
)


# Inter-annotator agreement (queries_ext.q_annotator_agreement): the
# three synthetic annotators mirror the Spark derivation verbatim;
# p_o >> p_e by construction so the truncating integer divisions agree.
EXT_ORACLES["q_annotator_agreement"] = """
    WITH ann AS (
        SELECT vec_id,
               CASE WHEN (vec_id * 7 + 0) % 10 < 8 THEN label
                    ELSE (label + 1 + (vec_id + 0) % 9) % 10 END AS l0,
               CASE WHEN (vec_id * 7 + 13) % 10 < 8 THEN label
                    ELSE (label + 1 + (vec_id + 1) % 9) % 10 END AS l1,
               CASE WHEN (vec_id * 7 + 26) % 10 < 8 THEN label
                    ELSE (label + 1 + (vec_id + 2) % 9) % 10 END AS l2
        FROM embeddings
    ),
    p AS (
        SELECT 0 AS k_a, 1 AS k_b, l0 AS lab_a, l1 AS lab_b FROM ann
        UNION ALL
        SELECT 0, 2, l0, l2 FROM ann
        UNION ALL
        SELECT 1, 2, l1, l2 FROM ann
    ),
    main AS (
        SELECT k_a, k_b, COUNT(*) AS n,
               SUM(CASE WHEN lab_a = lab_b THEN 1 ELSE 0 END) AS n_agree
        FROM p GROUP BY 1, 2
    ),
    ma AS (
        SELECT k_a, k_b, lab_a AS c, COUNT(*) AS na
        FROM p GROUP BY 1, 2, 3
    ),
    mb AS (
        SELECT k_a, k_b, lab_b AS c, COUNT(*) AS nb
        FROM p GROUP BY 1, 2, 3
    ),
    pe AS (
        SELECT k_a, k_b, SUM(na * nb) AS pe_num
        FROM ma JOIN mb USING (k_a, k_b, c)
        GROUP BY 1, 2
    ),
    f AS (
        SELECT main.k_a, main.k_b,
               CAST(n AS BIGINT) AS n,
               CAST(n_agree AS BIGINT) AS n_agree,
               CAST(n_agree * 1000000 // n AS BIGINT) AS p_o_micro,
               CAST(pe_num * 1000000 // (n * n) AS BIGINT) AS p_e_micro
        FROM main JOIN pe USING (k_a, k_b)
    )
    SELECT k_a, k_b, n, n_agree, p_o_micro, p_e_micro,
           CAST((p_o_micro - p_e_micro) * 1000000
                // (1000000 - p_e_micro) AS BIGINT) AS kappa_micro
    FROM f
"""


# DoReMi multiplicative-weights step (queries_ext.q_doremi_step):
# all-integer micro arithmetic mirrored verbatim; excess is vs the
# min-proxy domain so every operand is non-negative.
EXT_ORACLES["q_doremi_step"] = """
    WITH per AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
                   AS n_words,
               CAST(SUM(length(text)) AS BIGINT) AS n_chars
        FROM documents GROUP BY source
    ),
    p AS (
        SELECT *, CAST(n_chars * 1000000 // n_words AS BIGINT)
                      AS proxy_micro
        FROM per
    ),
    lo AS (SELECT MIN(proxy_micro) AS min_proxy FROM p),
    fac AS (
        SELECT source, n_docs, n_words, proxy_micro,
               proxy_micro - min_proxy AS excess_micro,
               CAST(1000000 + (500000 * (proxy_micro - min_proxy))
                    // 1000000 AS BIGINT) AS factor_micro
        FROM p, lo
    ),
    tot AS (
        SELECT SUM(factor_micro) AS sum_f, COUNT(*) AS k FROM fac
    )
    SELECT source, n_docs, n_words, proxy_micro,
           CAST(excess_micro AS BIGINT) AS excess_micro,
           factor_micro,
           CAST(factor_micro * 1000000 // sum_f AS BIGINT) AS w_micro,
           CAST((9 * (factor_micro * 1000000 // sum_f)
                 + (1000000 // k)) // 10 AS BIGINT) AS w_smoothed_micro
    FROM fac, tot
"""


# T5 span corruption (queries_ext.q_span_corruption): 0-based word
# index i0 = i - 1, chunk c = i0 // 3, every 7th chunk masked,
# sentinel ordinal c // 7 — every formula mirrored verbatim.
EXT_ORACLES["q_span_corruption"] = """
    WITH t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(arr) AS BIGINT) AS n_words,
               list_transform(generate_series(1, len(arr)), i ->
                   CASE WHEN ((i - 1) // 3) % 7 = 0 AND (i - 1) % 3 = 0
                        THEN '<extra_id_' ||
                             CAST(((i - 1) // 3) // 7 AS VARCHAR) || '>'
                        WHEN ((i - 1) // 3) % 7 = 0 THEN NULL
                        ELSE arr[i] END) AS inp,
               list_transform(generate_series(1, len(arr)), i ->
                   CASE WHEN ((i - 1) // 3) % 7 = 0 AND (i - 1) % 3 = 0
                        THEN '<extra_id_' ||
                             CAST(((i - 1) // 3) // 7 AS VARCHAR) || '>'
                             || ' ' || arr[i]
                        WHEN ((i - 1) // 3) % 7 = 0 THEN arr[i]
                        ELSE NULL END) AS tgt
        FROM t
    )
    SELECT doc_id, n_words,
           CAST(len(list_filter(tgt, x -> x IS NOT NULL)) AS BIGINT)
               AS n_masked_words,
           CAST(len(list_filter(inp,
                x -> x IS NOT NULL AND starts_with(x, '<extra_id_')))
               AS BIGINT) AS n_spans,
           CAST(len(list_filter(tgt, x -> x IS NOT NULL)) * 1000000
                // n_words AS BIGINT) AS corruption_micro,
           md5(array_to_string(list_filter(inp, x -> x IS NOT NULL), ' '))
               AS inputs_md5,
           md5(array_to_string(list_filter(tgt, x -> x IS NOT NULL), ' '))
               AS targets_md5
    FROM m
"""


# Longest-prefix rule matching (queries_ext.q_prefix_rule_match):
# synthetic rules and prefix-chain construction mirrored verbatim;
# longest match via max_by on (length, rule) — arg_max in DuckDB.
EXT_ORACLES["q_prefix_rule_match"] = """
    WITH urls AS (
        SELECT source || '.example.com' AS host,
               '/catalog/item-' || CAST(doc_id % 40 AS VARCHAR) AS path,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1, 2
    ),
    src AS (SELECT DISTINCT source FROM documents),
    rules AS (
        SELECT source || '.example.com' AS host,
               '/catalog/item-1' AS rule
        FROM src
        UNION ALL
        SELECT source || '.example.com', '/catalog'
        FROM src WHERE length(source) % 2 = 0
    ),
    prefs AS (
        SELECT host, path,
               unnest(list_transform(
                   generate_series(2, len(string_split(path, '/'))),
                   i -> array_to_string(
                       list_slice(string_split(path, '/'), 1, i), '/')))
                   AS prefix
        FROM urls
    ),
    matched AS (
        SELECT p.host, p.path,
               arg_max(r.rule, length(r.rule)) AS matched_rule
        FROM prefs p
        JOIN rules r ON r.host = p.host AND r.rule = p.prefix
        GROUP BY 1, 2
    )
    SELECT u.host, u.path, u.n_docs,
           COALESCE(m.matched_rule, '-') AS matched_rule,
           CAST(CASE WHEN m.matched_rule IS NULL THEN 0
                     ELSE length(m.matched_rule) END AS INT) AS rule_len,
           CAST(CASE WHEN m.matched_rule IS NULL THEN 0 ELSE 1 END AS INT)
               AS blocked
    FROM urls u LEFT JOIN matched m USING (host, path)
"""


# k-anonymity audit (queries_ext.q_k_anonymity): the same two grouping
# sets and k = 5 accounting.
EXT_ORACLES["q_k_anonymity"] = """
    WITH classes AS (
        SELECT c_mktsegment, c_nationkey,
               GROUPING(c_nationkey) AS lvl,
               COUNT(*) AS n
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey),
                                (c_mktsegment))
    )
    SELECT CAST(lvl AS INT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(n) AS BIGINT) AS min_class_size,
           CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_risky_classes,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
               AS n_risky_rows,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) * 1000000
                // SUM(n) AS BIGINT) AS risky_micro
    FROM classes GROUP BY lvl
"""


# Corpus drift (queries_ext.q_corpus_drift): KS over the n_words ECDF
# + TVD over the source mix, halves split on doc_id % 2; all integer
# micro arithmetic mirrored verbatim (window cumsum over the bounded
# per-value rollup).
EXT_ORACLES["q_corpus_drift"] = """
    WITH d AS (
        SELECT CASE WHEN doc_id % 7 < 3 THEN 1 ELSE 0 END AS cand,
               len(string_split(trim(text), ' ')) AS n_words,
               source
        FROM documents
    ),
    v AS (
        SELECT n_words,
               SUM(1 - cand) AS cr, SUM(cand) AS cc
        FROM d GROUP BY n_words
    ),
    c AS (
        SELECT n_words,
               SUM(cr) OVER () AS n_ref,
               SUM(cc) OVER () AS n_cand,
               SUM(cr) OVER (ORDER BY n_words
                             ROWS UNBOUNDED PRECEDING) AS cum_r,
               SUM(cc) OVER (ORDER BY n_words
                             ROWS UNBOUNDED PRECEDING) AS cum_c
        FROM v
    ),
    kd AS (
        SELECT n_words, n_ref, n_cand,
               abs(cum_r * 1000000 // n_ref
                   - cum_c * 1000000 // n_cand) AS d_micro
        FROM c
    ),
    ks AS (
        SELECT 'ks_n_words' AS metric,
               CAST(n_ref AS BIGINT) AS n_ref,
               CAST(n_cand AS BIGINT) AS n_cand,
               CAST(MAX(d_micro) AS BIGINT) AS stat_micro,
               CAST(arg_max(n_words,
                    lpad(CAST(d_micro AS VARCHAR), 8, '0') || '|'
                    || lpad(CAST(n_words AS VARCHAR), 6, '0'))
                    AS VARCHAR) AS arg
        FROM kd GROUP BY n_ref, n_cand
    ),
    s AS (
        SELECT source, SUM(1 - cand) AS cr, SUM(cand) AS cc
        FROM d GROUP BY source
    ),
    sd AS (
        SELECT source,
               SUM(cr) OVER () AS n_ref,
               SUM(cc) OVER () AS n_cand,
               cr, cc
        FROM s
    ),
    sd2 AS (
        SELECT source, n_ref, n_cand,
               abs(cr * 1000000 // n_ref - cc * 1000000 // n_cand)
                   AS d_micro
        FROM sd
    ),
    tvd AS (
        SELECT 'tvd_source' AS metric,
               CAST(n_ref AS BIGINT) AS n_ref,
               CAST(n_cand AS BIGINT) AS n_cand,
               CAST(SUM(d_micro) // 2 AS BIGINT) AS stat_micro,
               arg_max(source,
                   lpad(CAST(d_micro AS VARCHAR), 8, '0') || '|'
                   || source) AS arg
        FROM sd2 GROUP BY n_ref, n_cand
    )
    SELECT * FROM ks UNION ALL SELECT * FROM tvd
"""

# ---------------------------------------------------------------------------
# Round-9 wave: eval metrics, contracts, graph/text extraction
# ---------------------------------------------------------------------------

# Data-contract audit (queries_ext.q_expectations): one aggregate pass
# per table for the level checks, one anti-join for referential.
EXT_ORACLES["q_expectations"] = """
    WITH o AS (
        SELECT COUNT(*) AS n_rows,
               SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v1,
               SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS v2,
               COUNT(*) - COUNT(DISTINCT o_orderkey) AS v3,
               SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                        THEN 1 ELSE 0 END) AS v4
        FROM orders
    ),
    l AS (
        SELECT COUNT(*) AS n_rows,
               SUM(CASE WHEN NOT (l_quantity >= 1 AND l_quantity <= 50)
                        THEN 1 ELSE 0 END) AS v5
        FROM lineitem
    ),
    orph AS (
        SELECT COUNT(*) AS v6 FROM lineitem li
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = li.l_orderkey)
    ),
    rows_out AS (
        SELECT 'orders.o_custkey not_null' AS check_name,
               n_rows, v1 AS n_violations FROM o
        UNION ALL
        SELECT 'orders.o_totalprice positive', n_rows, v2 FROM o
        UNION ALL
        SELECT 'orders.o_orderkey unique', n_rows, v3 FROM o
        UNION ALL
        SELECT 'orders.o_orderstatus accepted_values', n_rows, v4 FROM o
        UNION ALL
        SELECT 'lineitem.l_quantity in [1,50]', n_rows, v5 FROM l
        UNION ALL
        SELECT 'lineitem.l_orderkey references orders', l.n_rows, orph.v6
        FROM l, orph
    )
    SELECT check_name,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS passed
    FROM rows_out
"""

# ROUGE-2 recall over (even ref, odd cand) doc pairs
# (queries_ext.q_rouge_n): clipped counts per Lin 2004.
EXT_ORACLES["q_rouge_n"] = """
    WITH t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    g AS (
        SELECT doc_id, doc_id // 2 AS pair_id, doc_id % 2 = 0 AS is_ref,
               arr[i] || ' ' || arr[i + 1] AS gram
        FROM t, unnest(generate_series(1, len(arr) - 1)) AS s(i)
    ),
    ref AS (
        SELECT pair_id, gram, COUNT(*) AS rc, MIN(doc_id) AS ref_id
        FROM g WHERE is_ref GROUP BY 1, 2
    ),
    cand AS (
        SELECT pair_id, gram, COUNT(*) AS cc
        FROM g WHERE NOT is_ref GROUP BY 1, 2
    ),
    cids AS (
        SELECT pair_id, MIN(doc_id) AS cand_id
        FROM g WHERE NOT is_ref GROUP BY 1
    ),
    cl AS (
        SELECT r.pair_id, MIN(r.ref_id) AS ref_id,
               SUM(r.rc) AS nrb,
               SUM(LEAST(r.rc, COALESCE(c.cc, 0))) AS noc
        FROM ref r
        LEFT JOIN cand c ON r.pair_id = c.pair_id AND r.gram = c.gram
        GROUP BY 1
    )
    SELECT cl.pair_id, cl.ref_id, cids.cand_id,
           CAST(nrb AS BIGINT) AS n_ref_bigrams,
           CAST(noc AS BIGINT) AS n_overlap_clipped,
           CAST(noc * 1000000 // nrb AS BIGINT) AS rouge2_recall_micro
    FROM cl JOIN cids USING (pair_id)
"""

# pass@k (queries_ext.q_pass_at_k): n/c exact integers; the k-term
# product is the SAME SQL text both engines parse (identical IEEE op
# order -> bit-identical), micro-rounded once.
from telecom_competitor_analysis_spark.plans.queries_ext import (  # noqa: E402
    OLS_SLOPE_MICRO_EXPR,
    PASS_AT_K_EXPR,
    _wilson_sql,
)

EXT_ORACLES["q_pass_at_k"] = f"""
    WITH per AS (
        SELECT doc_id % 40 AS task_id,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3') THEN 1 ELSE 0 END AS ok
        FROM documents
    ),
    a AS (
        SELECT task_id, COUNT(*) AS n, SUM(ok) AS c
        FROM per GROUP BY 1
    )
    SELECT task_id,
           CAST(n AS BIGINT) AS n,
           CAST(c AS BIGINT) AS c,
           {PASS_AT_K_EXPR} AS pass_at_k_micro,
           CAST(5 AS BIGINT) AS k
    FROM a
"""

# Wilson-CI win rates (queries_ext.q_winrate_ci): identical formula
# text both engines; ties count for the k_b side by convention.
EXT_ORACLES["q_winrate_ci"] = f"""
    WITH m AS (
        SELECT user_id, event_type AS t_a, value AS v_a,
               LEAD(event_type) OVER win AS t_b,
               LEAD(value) OVER win AS v_b
        FROM events
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    nrm AS (
        SELECT LEAST(t_a, t_b) AS k_a, GREATEST(t_a, t_b) AS k_b,
               CASE WHEN t_a < t_b
                    THEN CASE WHEN v_a > v_b THEN 1 ELSE 0 END
                    ELSE CASE WHEN v_b > v_a THEN 1 ELSE 0 END
               END AS win_a
        FROM m WHERE t_b IS NOT NULL AND t_a <> t_b
    ),
    a AS (
        SELECT k_a, k_b, COUNT(*) AS n, SUM(win_a) AS w
        FROM nrm GROUP BY 1, 2
    )
    SELECT k_a, k_b,
           CAST(n AS BIGINT) AS n,
           CAST(w AS BIGINT) AS w,
           CAST(w * 1000000 // n AS BIGINT) AS winrate_micro,
           {_wilson_sql("low")} AS ci_low_micro,
           {_wilson_sql("high")} AS ci_high_micro
    FROM a
"""

# Per-source log-log OLS fit (queries_ext.q_scaling_fit): milli-
# rounded logs -> exact integer sums -> the SHARED all-double slope
# text (OLS_SLOPE_MICRO_EXPR; the previous integer numerator wrapped
# Spark's int64 at x100 while DuckDB's HUGEINT sums kept going — a
# silent divergence), then an integer intercept off the rounded slope.
EXT_ORACLES["q_scaling_fit"] = f"""
    WITH p AS (
        SELECT source,
               CAST(round(ln(len(string_split(trim(text), ' '))) * 1000)
                    AS BIGINT) AS x,
               CAST(round(ln(n_chars) * 1000) AS BIGINT) AS y
        FROM documents
    ),
    s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM p GROUP BY 1
    ),
    sl AS (
        SELECT source, n, sx, sy,
               {{OLS_SLOPE}} AS slope_micro
        FROM s
    )
    SELECT source,
           n,
           slope_micro,
           CAST((sy * 1000000 - slope_micro * sx) // n AS BIGINT)
               AS intercept_milli_micro
    FROM sl
"""
EXT_ORACLES["q_scaling_fit"] = EXT_ORACLES["q_scaling_fit"].replace(
    "{OLS_SLOPE}", OLS_SLOPE_MICRO_EXPR
)

# TextRank keywords (queries_ext.q_textrank_keywords): two unrolled
# all-integer iterations over the adjacent-word graph.
EXT_ORACLES["q_textrank_keywords"] = """
    WITH t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    tok AS (
        SELECT doc_id, i AS pos, arr[i] AS w
        FROM t, unnest(generate_series(1, len(arr))) AS s(i)
    ),
    adj AS (
        SELECT w AS a,
               LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS b
        FROM tok
    ),
    e0 AS (
        SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
        FROM adj WHERE b IS NOT NULL AND a <> b
    ),
    be AS (
        SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0
    ),
    deg AS (SELECT u, COUNT(*) AS deg FROM be GROUP BY 1),
    s0 AS (SELECT u AS word, deg, CAST(1000000 AS BIGINT) AS s FROM deg),
    i1 AS (
        SELECT be.v AS word, SUM(s0.s // s0.deg) AS inflow
        FROM be JOIN s0 ON be.u = s0.word GROUP BY 1
    ),
    s1 AS (
        SELECT s0.word, s0.deg,
               CAST(150000 + (850000 * COALESCE(i1.inflow, 0)) // 1000000
                    AS BIGINT) AS s
        FROM s0 LEFT JOIN i1 USING (word)
    ),
    i2 AS (
        SELECT be.v AS word, SUM(s1.s // s1.deg) AS inflow
        FROM be JOIN s1 ON be.u = s1.word GROUP BY 1
    ),
    s2 AS (
        SELECT s1.word, s1.deg,
               CAST(150000 + (850000 * COALESCE(i2.inflow, 0)) // 1000000
                    AS BIGINT) AS s
        FROM s1 LEFT JOIN i2 USING (word)
    )
    SELECT word, CAST(deg AS BIGINT) AS deg, s AS score_micro
    FROM s2 ORDER BY s DESC, word LIMIT 10
"""

# Majority-vote label propagation (queries_ext.q_label_propagation):
# two unrolled synchronous rounds over the SAME banded-minhash pair
# graph as the other five consumers; argmax = max count then min label
# (zero-padded composite key — this DuckDB's arg_max takes no struct).
# The 2-round LP chain is shared text: q_graph_modularity scores the
# SAME communities this oracle releases.
_LP_CTES = """
    , n0 AS (
        SELECT doc_id AS node, CAST(doc_id AS BIGINT) AS label
        FROM documents
    ),
    bi AS MATERIALIZED (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    v1 AS (
        SELECT bi.v AS node, n0.label AS nl, COUNT(*) AS cnt
        FROM bi JOIN n0 ON bi.u = n0.node GROUP BY 1, 2
    ),
    w1 AS (
        SELECT node,
               arg_max(nl, lpad(CAST(cnt AS VARCHAR), 10, '0') || '|'
                           || lpad(CAST(999999999999 - nl AS VARCHAR),
                                   12, '0')) AS new_label
        FROM v1 GROUP BY 1
    ),
    n1 AS MATERIALIZED (
        SELECT n0.node,
               CAST(COALESCE(w1.new_label, n0.label) AS BIGINT) AS label
        FROM n0 LEFT JOIN w1 USING (node)
    ),
    v2 AS (
        SELECT bi.v AS node, n1.label AS nl, COUNT(*) AS cnt
        FROM bi JOIN n1 ON bi.u = n1.node GROUP BY 1, 2
    ),
    w2 AS (
        SELECT node,
               arg_max(nl, lpad(CAST(cnt AS VARCHAR), 10, '0') || '|'
                           || lpad(CAST(999999999999 - nl AS VARCHAR),
                                   12, '0')) AS new_label
        FROM v2 GROUP BY 1
    ),
    n2 AS MATERIALIZED (
        SELECT n1.node,
               CAST(COALESCE(w2.new_label, n1.label) AS BIGINT) AS label
        FROM n1 LEFT JOIN w2 USING (node)
    )
"""

EXT_ORACLES["q_label_propagation"] = (
    _NEARDUP_CC_CTES
    + _LP_CTES
    + """
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS community_size,
           CAST(MIN(node) AS BIGINT) AS min_node,
           CAST(MAX(node) AS BIGINT) AS max_node
    FROM n2 GROUP BY 1
"""
)


# ---------------------------------------------------------------------------
# round-9 second wave oracles: BLEU, Poisson bootstrap, MMR, CDC chunks,
# Spearman, silhouette, Zipf.
# ---------------------------------------------------------------------------
from telecom_competitor_analysis_spark.plans.queries_ext import (  # noqa: E402
    BLEU2_EXPR,
    BOOTSTRAP_B,
    MMR_POOL,
    SPEARMAN_EXPR,
    _poisson_weight_sql,
    silhouette_expr,
)

# BLEU-2 with brevity penalty (queries_ext.q_bleu): precision-side
# clipped counts; the BP·sqrt(p1·p2) combination is the SAME text both
# engines parse (BLEU2_EXPR), micro-rounded once.
EXT_ORACLES["q_bleu"] = f"""
    WITH t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    g AS (
        SELECT doc_id, doc_id // 2 AS pair_id, doc_id % 2 = 0 AS is_ref,
               1 AS n, arr[i] AS gram
        FROM t, unnest(generate_series(1, len(arr))) AS s(i)
        UNION ALL
        SELECT doc_id, doc_id // 2, doc_id % 2 = 0,
               2, arr[i] || ' ' || arr[i + 1]
        FROM t, unnest(generate_series(1, len(arr) - 1)) AS s(i)
    ),
    ref AS (
        SELECT pair_id, n, gram, COUNT(*) AS rc
        FROM g WHERE is_ref GROUP BY 1, 2, 3
    ),
    cand AS (
        SELECT pair_id, n, gram, COUNT(*) AS cc, MIN(doc_id) AS cand_id
        FROM g WHERE NOT is_ref GROUP BY 1, 2, 3
    ),
    pern AS (
        SELECT c.pair_id, c.n, MIN(c.cand_id) AS cand_id,
               SUM(c.cc) AS den, SUM(LEAST(c.cc, COALESCE(r.rc, 0))) AS num
        FROM cand c
        LEFT JOIN ref r
          ON r.pair_id = c.pair_id AND r.n = c.n AND r.gram = c.gram
        GROUP BY 1, 2
    ),
    flat AS (
        SELECT pair_id, MIN(cand_id) AS cand_id,
           CAST(COALESCE(SUM(CASE WHEN n = 1 THEN num END), 0) AS BIGINT)
               AS n1,
           CAST(COALESCE(SUM(CASE WHEN n = 1 THEN den END), 0) AS BIGINT)
               AS d1,
           CAST(COALESCE(SUM(CASE WHEN n = 2 THEN num END), 0) AS BIGINT)
               AS n2,
           CAST(COALESCE(SUM(CASE WHEN n = 2 THEN den END), 0) AS BIGINT)
               AS d2
        FROM pern GROUP BY 1
    ),
    lens AS (
        SELECT doc_id, doc_id // 2 AS pair_id, doc_id % 2 = 0 AS is_ref,
               len(arr)::BIGINT AS wlen
        FROM t
    ),
    rl AS (
        SELECT pair_id, MIN(doc_id) AS ref_id, MIN(wlen) AS ref_len
        FROM lens WHERE is_ref GROUP BY 1
    ),
    cl AS (
        SELECT pair_id, MIN(wlen) AS cand_len
        FROM lens WHERE NOT is_ref GROUP BY 1
    )
    SELECT rl.pair_id, CAST(rl.ref_id AS BIGINT) AS ref_id,
           CAST(flat.cand_id AS BIGINT) AS cand_id,
           CAST(rl.ref_len AS BIGINT) AS ref_len,
           CAST(cl.cand_len AS BIGINT) AS cand_len,
           n1, d1, n2, d2,
           {BLEU2_EXPR} AS bleu2_micro
    FROM rl JOIN cl USING (pair_id) JOIN flat USING (pair_id)
"""

# Poisson bootstrap CI (queries_ext.q_bootstrap_ci): weights from the
# SAME md5-hex inverse-CDF table (_poisson_weight_sql over POISSON1_HEX,
# one Python source); ranks 2 and B-1 of the 32 replicate means.
EXT_ORACLES["q_bootstrap_ci"] = f"""
    WITH reps AS (
        SELECT source, doc_id, n_chars, r.rep,
               substring(md5(CAST(doc_id AS VARCHAR) || ':'
                             || CAST(r.rep AS VARCHAR)), 1, 8) AS u
        FROM documents,
             unnest(generate_series(0, {BOOTSTRAP_B - 1})) AS r(rep)
    ),
    wtd AS (
        SELECT source, rep, n_chars,
               CAST({_poisson_weight_sql("u")} AS BIGINT) AS w
        FROM reps
    ),
    per_rep AS (
        SELECT source, rep,
               CASE WHEN SUM(w) = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(CAST(SUM(w * n_chars) AS BIGINT) * 1000000
                              // CAST(SUM(w) AS BIGINT) AS BIGINT)
               END AS m
        FROM wtd GROUP BY 1, 2
    ),
    ranked AS (
        SELECT source, m,
               row_number() OVER (PARTITION BY source
                                  ORDER BY m ASC, rep ASC) AS rn
        FROM per_rep
    ),
    ci AS (
        SELECT source,
               CAST(MAX(CASE WHEN rn = 2 THEN m END) AS BIGINT)
                   AS boot_lo_micro,
               CAST(MAX(CASE WHEN rn = {BOOTSTRAP_B - 1} THEN m END)
                    AS BIGINT) AS boot_hi_micro
        FROM ranked GROUP BY 1
    ),
    pt AS (
        SELECT source, COUNT(*)::BIGINT AS n_docs,
               CAST(CAST(SUM(n_chars) AS BIGINT) * 1000000
                    // COUNT(*) AS BIGINT) AS point_mean_micro
        FROM documents GROUP BY 1
    )
    SELECT pt.source, pt.n_docs, pt.point_mean_micro,
           ci.boot_lo_micro, ci.boot_hi_micro,
           CAST({BOOTSTRAP_B} AS BIGINT) AS b
    FROM pt JOIN ci USING (source)
"""


def _mmr_cte_sql(pool: int = MMR_POOL, rounds: int = 4) -> str:
    """Unrolled greedy MMR rounds mirroring queries_ext.q_mmr_select:
    query = lowest-id vector, pool = top-``pool`` by micro-rounded
    cosine relevance, score = 7·rel − 3·max-sim-to-selected in
    λ-tenths·micro units, vec_id tie-break. Selection CTEs are s1..sN
    (rank, vec_id, rel_micro, mmr_score)."""
    cos = (
        "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b})))"
    )
    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        "q AS (SELECT vec_id AS q_id, v AS q_vec FROM e"
        " ORDER BY vec_id ASC LIMIT 1)",
        "scored AS (SELECT e.vec_id, e.v,"
        " CAST(round(" + cos.format(a="e.v", b="q.q_vec")
        + " * 1000000, 0) AS BIGINT) AS rel_micro"
        " FROM e CROSS JOIN q WHERE e.vec_id != q.q_id)",
        f"pool AS (SELECT * FROM scored ORDER BY rel_micro DESC,"
        f" vec_id ASC LIMIT {pool})",
        "sims AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,"
        " CAST(round(" + cos.format(a="a.v", b="b.v")
        + " * 1000000, 0) AS BIGINT) AS sim_micro"
        " FROM pool a JOIN pool b ON a.vec_id != b.vec_id)",
        "s1 AS (SELECT CAST(1 AS BIGINT) AS rank, vec_id, rel_micro,"
        " CAST(rel_micro * 7 AS BIGINT) AS mmr_score"
        " FROM pool ORDER BY rel_micro * 7 DESC, vec_id ASC LIMIT 1)",
    ]
    for r in range(2, rounds + 1):
        prev = " UNION ALL ".join(
            f"SELECT vec_id FROM s{i}" for i in range(1, r)
        )
        parts.append(
            f"sel{r} AS ({prev})"
        )
        parts.append(
            f"pen{r} AS (SELECT sims.a_id AS vec_id,"
            f" MAX(sims.sim_micro) AS max_sim FROM sims"
            f" JOIN sel{r} ON sims.b_id = sel{r}.vec_id GROUP BY 1)"
        )
        parts.append(
            f"s{r} AS (SELECT CAST({r} AS BIGINT) AS rank, p.vec_id,"
            f" p.rel_micro,"
            f" CAST(p.rel_micro * 7 - pen{r}.max_sim * 3 AS BIGINT)"
            f" AS mmr_score"
            f" FROM pool p JOIN pen{r} USING (vec_id)"
            f" WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{r})"
            f" ORDER BY p.rel_micro * 7 - pen{r}.max_sim * 3 DESC,"
            f" p.vec_id ASC LIMIT 1)"
        )
    union = " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(1, rounds + 1))
    parts.append(f"sel AS ({union})")
    return ",\n    ".join(parts)


EXT_ORACLES["q_mmr_select"] = f"""
    WITH {_mmr_cte_sql()}
    SELECT rank, CAST(vec_id AS BIGINT) AS vec_id, rel_micro,
           mmr_score
    FROM sel
"""

# Content-defined chunking (queries_ext.q_cdc_chunks): boundary = word
# whose md5 first nibble is '0'; chunk id = running boundary count of
# STRICTLY PRECEDING words; fingerprint = md5 of the space-joined chunk.
EXT_ORACLES["q_cdc_chunks"] = """
    WITH t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    toks AS (
        SELECT doc_id, i AS pos, arr[i] AS w
        FROM t, unnest(generate_series(1, len(arr))) AS s(i)
    ),
    fl AS (
        SELECT doc_id, pos, w,
               CASE WHEN substring(md5(w), 1, 1) = '0' THEN 1 ELSE 0 END
                   AS b
        FROM toks
    ),
    ch AS (
        SELECT doc_id, pos, w,
               SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) - b
                   AS chunk_idx
        FROM fl
    ),
    chunks AS (
        SELECT doc_id, chunk_idx,
               md5(string_agg(w, ' ' ORDER BY pos)) AS chunk_hash,
               COUNT(*)::BIGINT AS len_words
        FROM ch GROUP BY 1, 2
    )
    SELECT chunk_hash,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           COUNT(*)::BIGINT AS n_occurrences,
           CAST(MIN(len_words) AS BIGINT) AS len_words
    FROM chunks GROUP BY 1
    HAVING COUNT(DISTINCT doc_id) >= 2
"""

# Spearman over double-ranks (queries_ext.q_rank_correlation): integer
# moment sums, shared-text double combination.
EXT_ORACLES["q_rank_correlation"] = f"""
    WITH d AS (
        SELECT source, n_chars::BIGINT AS xv,
               len(string_split(trim(text), ' '))::BIGINT AS yv
        FROM documents
    ),
    g AS (
        SELECT source, xv, yv, COUNT(*)::BIGINT AS c
        FROM d GROUP BY 1, 2, 3
    ),
    xc AS (
        SELECT source, xv, CAST(SUM(c) AS BIGINT) AS cnt
        FROM g GROUP BY 1, 2
    ),
    xr AS (
        SELECT source, xv,
               CAST(2 * (COALESCE(SUM(cnt) OVER (
                   PARTITION BY source ORDER BY xv ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + 1) + cnt - 1 AS BIGINT) AS dr_x
        FROM xc
    ),
    yc AS (
        SELECT source, yv, CAST(SUM(c) AS BIGINT) AS cnt
        FROM g GROUP BY 1, 2
    ),
    yr AS (
        SELECT source, yv,
               CAST(2 * (COALESCE(SUM(cnt) OVER (
                   PARTITION BY source ORDER BY yv ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + 1) + cnt - 1 AS BIGINT) AS dr_y
        FROM yc
    ),
    s AS (
        SELECT g.source,
               CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(c * dr_x) AS BIGINT) AS sx,
               CAST(SUM(c * dr_y) AS BIGINT) AS sy,
               CAST(SUM(c * dr_x * dr_y) AS BIGINT) AS sxy,
               CAST(SUM(c * dr_x * dr_x) AS BIGINT) AS sxx,
               CAST(SUM(c * dr_y * dr_y) AS BIGINT) AS syy
        FROM g
        JOIN xr ON xr.source = g.source AND xr.xv = g.xv
        JOIN yr ON yr.source = g.source AND yr.yv = g.yv
        GROUP BY 1
    )
    SELECT source, n, {SPEARMAN_EXPR} AS spearman_micro FROM s
"""


def _silhouette_sql(k: int = 4, iters: int = 2, dim: int = 64) -> str:
    """Simplified silhouette over the shared unrolled k-means CTEs
    (_kmeans_cte_sql): recompute final integer-micro centroids from the
    m{iters-1} assignment, micro-round cosine distances, combine with
    the shared SILHOUETTE_EXPR."""
    sums = ",\n               ".join(
        f"CAST(SUM(CAST(round(v[{d + 1}] * 1000000, 0) AS BIGINT))"
        f" AS BIGINT) AS s{d}"
        for d in range(dim)
    )
    divs = ", ".join(f"s{d} / (n * 1000000.0)" for d in range(dim))
    m = f"m{iters - 1}"
    cos = (
        "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b})))"
    )
    return f"""WITH {_kmeans_cte_sql(k=k, iters=iters, dim=dim)},
    gfin AS (SELECT cid AS cluster_id, COUNT(*) AS n,
               {sums}
           FROM {m} GROUP BY cid),
    cfin AS (SELECT cluster_id AS ccid, list_value({divs}) AS cvec
             FROM gfin),
    scored AS (
        SELECT {m}.vec_id, {m}.cid AS cluster_id, cfin.ccid,
               CAST(round((1.0 - {cos.format(a=f"{m}.v", b="cfin.cvec")})
                    * 1000000, 0) AS BIGINT) AS d_micro
        FROM {m} CROSS JOIN cfin
    ),
    ab AS (
        SELECT vec_id, MAX(cluster_id) AS cluster_id,
               MAX(CASE WHEN ccid = cluster_id THEN d_micro END)
                   AS a_micro,
               MIN(CASE WHEN ccid != cluster_id THEN d_micro END)
                   AS b_micro
        FROM scored GROUP BY vec_id
    ),
    sil AS (
        SELECT cluster_id, {silhouette_expr('//')} AS s_micro FROM ab
    )
    SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
           COUNT(*)::BIGINT AS n,
           CAST(CAST(SUM(s_micro) AS BIGINT) // COUNT(*) AS BIGINT)
               AS mean_silhouette_micro,
           CAST(MIN(s_micro) AS BIGINT) AS min_silhouette_micro
    FROM sil GROUP BY 1"""


EXT_ORACLES["q_silhouette"] = _silhouette_sql()

# Zipf fit (queries_ext.q_zipf_fit): q_scaling_fit's OLS discipline on
# (ln rank, ln freq) of the top-1000 words.
EXT_ORACLES["q_zipf_fit"] = """
    WITH tok AS (
        SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents
    ),
    f AS (
        SELECT w, COUNT(*)::BIGINT AS f FROM tok
        WHERE w != '' GROUP BY w
    ),
    top AS (SELECT w, f FROM f ORDER BY f DESC, w ASC LIMIT 1000),
    r AS (
        SELECT row_number() OVER (ORDER BY f DESC, w ASC) AS r, f
        FROM top
    ),
    p AS (
        SELECT CAST(round(ln(r) * 1000, 0) AS BIGINT) AS x,
               CAST(round(ln(f) * 1000, 0) AS BIGINT) AS y
        FROM r
    ),
    s AS (
        SELECT COUNT(*)::BIGINT AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM p
    )
    SELECT n AS n_words,
           CAST((n * sxy - sx * sy) * 1000000
                // (n * sxx - sx * sx) AS BIGINT) AS slope_micro,
           CAST((sy * 1000000 - ((n * sxy - sx * sy) * 1000000
                // (n * sxx - sx * sx)) * sx) // n AS BIGINT)
               AS intercept_milli_micro
    FROM s
"""

# Rank-aware ANN quality (queries_ext.q_ndcg): composed from the two
# deterministic ranking mirrors; per-term micro-rounding via the SAME
# NDCG_TERM_EXPR text; IDCG is the shared inlined constant.
from telecom_competitor_analysis_spark.plans.queries_ext import (  # noqa: E402
    IDCG10_MICRO,
    NDCG_TERM_EXPR,
)

EXT_ORACLES["q_ndcg"] = f"""
    WITH exact0 AS ({EXT_ORACLES["q_embedding_topk"]}),
    approx0 AS ({EXT_ORACLES["q_embedding_lsh_topk"]}),
    exact AS (
        SELECT query_id, neighbor_id, rank AS exact_rank FROM exact0
    ),
    approx AS (
        SELECT query_id, neighbor_id, rank AS approx_rank FROM approx0
    ),
    hits AS (
        SELECT e.query_id, {NDCG_TERM_EXPR} AS t,
               e.exact_rank, a.approx_rank
        FROM approx a
        JOIN exact e
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    ),
    per_q AS (
        SELECT query_id,
               CAST(SUM(t) AS BIGINT) AS dcg_micro,
               COUNT(*)::BIGINT AS n_hits,
               MIN(CASE WHEN exact_rank = 1 THEN approx_rank END)
                   AS top1_pos
        FROM hits GROUP BY 1
    )
    SELECT q.query_id,
           CAST(COALESCE(p.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(p.dcg_micro, 0) AS BIGINT) AS dcg_micro,
           CAST(COALESCE(p.dcg_micro, 0) * 1000000
                // {IDCG10_MICRO} AS BIGINT) AS ndcg_micro,
           CAST(CASE WHEN p.top1_pos IS NULL THEN 0
                ELSE 1000000 // p.top1_pos END AS BIGINT) AS rr_micro
    FROM (SELECT query_id FROM exact WHERE exact_rank = 1) q
    LEFT JOIN per_q p USING (query_id)
"""


# ---------------------------------------------------------------------------
# round-10 wave oracles
# ---------------------------------------------------------------------------
from telecom_competitor_analysis_spark.plans.queries_ext import (  # noqa: E402
    band_tuning_grid,
    chrf_f_expr,
    edit_sim_expr,
)

# Edit-distance near-dup verify (queries_ext.q_edit_distance_pairs):
# LSH candidates joined to texts, length-bound pruned, scored by the
# shared integer edit-similarity text (edit_sim_expr — '//' here, 'DIV'
# there). levenshtein() is the unit-cost character edit distance in
# both engines.
EXT_ORACLES["q_edit_distance_pairs"] = f"""
    WITH lsh AS ({EXT_ORACLES["q_minhash_lsh_pairs"]}),
    tt AS (
        SELECT doc_id, trim(text) AS t, length(trim(text)) AS ln
        FROM documents WHERE text IS NOT NULL
    ),
    scored AS (
        SELECT
            l.id_a, l.id_b,
            CAST(levenshtein(ta, tb) AS BIGINT) AS dist,
            CAST({edit_sim_expr("//")} AS BIGINT) AS sim_micro
        FROM (
            SELECT lsh.id_a, lsh.id_b,
                   a.t AS ta, a.ln AS la, b.t AS tb, b.ln AS lb
            FROM lsh
            JOIN tt a ON a.doc_id = lsh.id_a
            JOIN tt b ON b.doc_id = lsh.id_b
            WHERE 2 * abs(a.ln - b.ln) <= greatest(a.ln, b.ln)
        ) l
    )
    SELECT id_a, id_b, dist, sim_micro
    FROM scored WHERE sim_micro >= 500000
"""

# k-core peel (queries_ext.q_kcore): three unrolled rounds of k = 2
# peeling over the LSH pair graph — same partial peel both engines.
# Every CTE is MATERIALIZED: DuckDB inlines plain CTEs per reference,
# and the e2←e1←e0 chain re-evaluates the full LSH-pairs subquery
# ~3^depth times otherwise (measured: 431 s inlined → 0.16 s
# materialized at sf0.01).
EXT_ORACLES["q_kcore"] = f"""
    WITH e0 AS MATERIALIZED (
        SELECT id_a AS u, id_b AS v FROM ({EXT_ORACLES["q_minhash_lsh_pairs"]})
    ),
    d1 AS MATERIALIZED (
        SELECT x, COUNT(*) AS d FROM (
            SELECT u AS x FROM e0 UNION ALL SELECT v AS x FROM e0
        ) GROUP BY x
    ),
    a1 AS MATERIALIZED (SELECT x FROM d1 WHERE d >= 2),
    e1 AS MATERIALIZED (
        SELECT e0.u, e0.v FROM e0
        JOIN a1 au ON au.x = e0.u JOIN a1 av ON av.x = e0.v
    ),
    d2 AS MATERIALIZED (
        SELECT x, COUNT(*) AS d FROM (
            SELECT u AS x FROM e1 UNION ALL SELECT v AS x FROM e1
        ) GROUP BY x
    ),
    a2 AS MATERIALIZED (SELECT x FROM d2 WHERE d >= 2),
    e2 AS MATERIALIZED (
        SELECT e1.u, e1.v FROM e1
        JOIN a2 au ON au.x = e1.u JOIN a2 av ON av.x = e1.v
    ),
    d3 AS MATERIALIZED (
        SELECT x, COUNT(*) AS d FROM (
            SELECT u AS x FROM e2 UNION ALL SELECT v AS x FROM e2
        ) GROUP BY x
    ),
    a3 AS MATERIALIZED (SELECT x FROM d3 WHERE d >= 2),
    e3 AS MATERIALIZED (
        SELECT e2.u, e2.v FROM e2
        JOIN a3 au ON au.x = e2.u JOIN a3 av ON av.x = e2.v
    )
    SELECT CAST(1 AS INT) AS round,
           CAST((SELECT COUNT(*) FROM a1) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e1) AS BIGINT) AS n_edges
    UNION ALL
    SELECT CAST(2 AS INT),
           CAST((SELECT COUNT(*) FROM a2) AS BIGINT),
           CAST((SELECT COUNT(*) FROM e2) AS BIGINT)
    UNION ALL
    SELECT CAST(3 AS INT),
           CAST((SELECT COUNT(*) FROM a3) AS BIGINT),
           CAST((SELECT COUNT(*) FROM e3) AS BIGINT)
"""

# l-diversity audit (queries_ext.q_l_diversity): QI = (nation,
# floor(acctbal/1000)), sensitive = mktsegment, l = 3. floor over the
# same IEEE division in both engines — never CAST(double AS BIGINT),
# whose rounding rule differs (Spark truncates, DuckDB rounds).
EXT_ORACLES["q_l_diversity"] = """
    WITH classes AS (
        SELECT c_nationkey,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
               COUNT(DISTINCT c_mktsegment) AS l_div,
               COUNT(*) AS n
        FROM customer GROUP BY 1, 2
    )
    SELECT
        CAST(COUNT(*) AS BIGINT) AS n_classes,
        CAST(MIN(l_div) AS BIGINT) AS min_l_diversity,
        CAST(SUM(CASE WHEN l_div < 3 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_risky_classes,
        CAST(SUM(CASE WHEN l_div < 3 THEN n ELSE 0 END) AS BIGINT)
            AS n_risky_rows,
        CAST(SUM(CASE WHEN l_div < 3 THEN n ELSE 0 END) * 1000000
             // SUM(n) AS BIGINT) AS risky_micro
    FROM classes
"""

# chrF (queries_ext.q_chrf): char 1-/2-gram clipped-count F2 over the
# q_bleu pairing; P/R in integer micro, per-order F via the shared
# text chrf_f_expr, final score = sum over orders div 2.
EXT_ORACLES["q_chrf"] = f"""
    WITH base AS (
        SELECT doc_id // 2 AS pair_id,
               doc_id % 2 = 0 AS is_ref,
               doc_id,
               replace(trim(text), ' ', '') AS ns
        FROM documents
    ),
    g1 AS (
        SELECT pair_id, is_ref, doc_id, 1 AS n, substr(ns, i, 1) AS gram
        FROM base, unnest(generate_series(1, length(ns))) AS g(i)
        WHERE length(ns) >= 1
    ),
    g2 AS (
        SELECT pair_id, is_ref, doc_id, 2 AS n, substr(ns, i, 2) AS gram
        FROM base, unnest(generate_series(1, length(ns) - 1)) AS g(i)
        WHERE length(ns) >= 2
    ),
    grams AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2),
    ref AS (
        SELECT pair_id, n, gram, COUNT(*) AS rc
        FROM grams WHERE is_ref GROUP BY 1, 2, 3
    ),
    refden AS (
        SELECT pair_id, n, CAST(SUM(rc) AS BIGINT) AS den_r
        FROM ref GROUP BY 1, 2
    ),
    cand AS (
        SELECT pair_id, n, gram, COUNT(*) AS cc, MIN(doc_id) AS cand_id
        FROM grams WHERE NOT is_ref GROUP BY 1, 2, 3
    ),
    pern0 AS (
        SELECT c.pair_id, c.n, MIN(c.cand_id) AS cand_id,
               CAST(SUM(c.cc) AS BIGINT) AS den_c,
               CAST(SUM(LEAST(c.cc, COALESCE(r.rc, 0))) AS BIGINT) AS clip
        FROM cand c
        LEFT JOIN ref r
          ON r.pair_id = c.pair_id AND r.n = c.n AND r.gram = c.gram
        GROUP BY 1, 2
    ),
    pern1 AS (
        SELECT p.pair_id, p.n, p.cand_id,
               CAST(clip * 1000000 // den_c AS BIGINT) AS p_micro,
               CAST(clip * 1000000 // den_r AS BIGINT) AS r_micro
        FROM pern0 p
        JOIN refden d ON d.pair_id = p.pair_id AND d.n = p.n
    ),
    pern AS (
        SELECT pair_id, n, cand_id,
               CAST({chrf_f_expr("//")} AS BIGINT) AS f_micro
        FROM pern1
    )
    SELECT pair_id,
           CAST(MIN(cand_id) AS BIGINT) AS cand_id,
           CAST(COALESCE(SUM(CASE WHEN n = 1 THEN f_micro END), 0)
                AS BIGINT) AS f1_micro,
           CAST(COALESCE(SUM(CASE WHEN n = 2 THEN f_micro END), 0)
                AS BIGINT) AS f2_micro,
           CAST(SUM(f_micro) // 2 AS BIGINT) AS chrf_micro
    FROM pern GROUP BY pair_id
"""

# LSH band tuning (queries_ext.q_band_tuning): observed Jaccard decile
# mass × Python-precomputed S-curve literals (band_tuning_grid — the
# pow never runs in either engine).
_BAND_GRID_VALUES = ",\n        ".join(
    f"({b}, {r}, {jbin}, {p})" for b, r, jbin, p in band_tuning_grid()
)
EXT_ORACLES["q_band_tuning"] = f"""
    WITH exact AS (
        SELECT n_shared, n_a, n_b FROM ({EXT_ORACLES["q_ngram_jaccard"]})
    ),
    obs AS (
        SELECT CAST(n_shared * 10 // (n_a + n_b - n_shared) AS INT)
                   AS jbin,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM exact GROUP BY 1
    ),
    grid(bands, rows_per_band, jbin, p_micro) AS (VALUES
        {_BAND_GRID_VALUES}
    )
    SELECT CAST(bands AS INT) AS bands,
           CAST(rows_per_band AS INT) AS rows_per_band,
           CAST(SUM(n_pairs * p_micro) // SUM(n_pairs) AS BIGINT)
               AS expected_recall_micro,
           CAST(SUM(n_pairs) AS BIGINT) AS n_pairs_total,
           (CAST(SUM(n_pairs * p_micro) // SUM(n_pairs) AS BIGINT)
                >= 900000) AS meets_90_target
    FROM obs JOIN grid USING (jbin)
    GROUP BY 1, 2
"""

# Length-bucket batching audit (queries_ext.q_length_buckets): bucket =
# bit-length of the token count, ceiling = 2^bits − 1; all-integer.
EXT_ORACLES["q_length_buckets"] = """
    WITH toks AS (
        SELECT
            CAST(length(bin(len(string_split(trim(text), ' '))))
                 AS INT) AS bucket_bits,
            CAST(len(string_split(trim(text), ' ')) AS BIGINT)
                AS n_tokens
        FROM documents WHERE text IS NOT NULL
    )
    SELECT bucket_bits,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST((CAST(1 AS BIGINT) << bucket_bits) - 1 AS BIGINT)
               AS pad_to,
           CAST(COUNT(*) * ((CAST(1 AS BIGINT) << bucket_bits) - 1)
                AS BIGINT) AS capacity,
           CAST((COUNT(*) * ((CAST(1 AS BIGINT) << bucket_bits) - 1)
                 - SUM(n_tokens)) * 1000000
                // (COUNT(*) * ((CAST(1 AS BIGINT) << bucket_bits) - 1))
                AS BIGINT) AS waste_micro
    FROM toks GROUP BY bucket_bits
"""

# Frame-level dedup (queries_ext.q_frame_dedup): the q_frame_sample
# frame stream (frame count from byte length, sampled every 2nd index),
# fingerprint = md5 of the 32-char content window at the frame's
# offset, blank windows screened; digest groups of >= 2.
EXT_ORACLES["q_frame_dedup"] = """
    WITH media AS (
        SELECT doc_id AS media_id, text, strlen(text) AS byte_len
        FROM documents
    ),
    frames AS (
        SELECT media_id, text, CAST(f AS BIGINT) AS frame_idx
        FROM media,
             unnest(generate_series(
                 0, CAST(1 + byte_len % 8 AS BIGINT) - 1, 2)) AS t(f)
    ),
    fp AS (
        SELECT media_id,
               md5(substr(text, CAST(frame_idx * 32 + 1 AS INT), 32))
                   AS fingerprint
        FROM frames
        WHERE substr(text, CAST(frame_idx * 32 + 1 AS INT), 32) != ''
    )
    SELECT fingerprint,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_media,
           CAST(MIN(media_id) AS BIGINT) AS keeper_media
    FROM fp GROUP BY fingerprint HAVING COUNT(*) >= 2
"""


# ---------------------------------------------------------------------------
# round-10 second wave oracles
# ---------------------------------------------------------------------------

# Candidate precision per signature-agreement quartile
# (queries_ext.q_candidate_precision): candidates = the
# q_minhash_lsh_pairs set; agreement = count of equal MinHash
# components (exact — round(est*4) on the Spark side is the same
# integer); truth = the threshold-0.2 exact pair set. MATERIALIZED:
# the candidate and signature subqueries are multi-referenced.
EXT_ORACLES["q_candidate_precision"] = f"""
    WITH cand AS MATERIALIZED ({EXT_ORACLES["q_minhash_lsh_pairs"]}),
    t2 AS (
        SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents
    ),
    sh2 AS (
        SELECT DISTINCT
            t2.doc_id,
            arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS word
        FROM t2, unnest(generate_series(1, len(arr) - 2)) AS g(i)
    ),
    sig2 AS MATERIALIZED (
        SELECT
            doc_id,
            MIN(md5(word || '#0')) AS h0,
            MIN(md5(word || '#1')) AS h1,
            MIN(md5(word || '#2')) AS h2,
            MIN(md5(word || '#3')) AS h3
        FROM sh2 GROUP BY doc_id
    ),
    truth AS MATERIALIZED (
        SELECT id_a, id_b, 1 AS tr FROM ({EXT_ORACLES["q_ngram_jaccard"]})
    ),
    est AS (
        SELECT c.id_a, c.id_b,
               CAST((a.h0 = b.h0)::INT + (a.h1 = b.h1)::INT
                    + (a.h2 = b.h2)::INT + (a.h3 = b.h3)::INT AS INT)
                   AS agree_quarters
        FROM cand c
        JOIN sig2 a ON a.doc_id = c.id_a
        JOIN sig2 b ON b.doc_id = c.id_b
    )
    SELECT agree_quarters,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(COALESCE(tr, 0)) AS BIGINT) AS n_true_pairs,
           CAST(SUM(COALESCE(tr, 0)) * 1000000 // COUNT(*) AS BIGINT)
               AS precision_micro
    FROM est LEFT JOIN truth USING (id_a, id_b)
    GROUP BY agree_quarters
"""

# Leakage-safe group k-fold (queries_ext.q_group_kfold): connected
# components (the q_dedup_clusters recursive CTE), fold = component's
# min doc id mod 5, 5-row balance sheet.
EXT_ORACLES["q_group_kfold"] = (
    _NEARDUP_CC_CTES
    + """,
    comp AS (
        SELECT id, MIN(label) AS cluster_id FROM cc GROUP BY id
    )
    SELECT CAST(cluster_id % 5 AS INT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_components
    FROM comp GROUP BY 1
"""
)

# Degree assortativity (queries_ext.q_assortativity): Pearson over
# endpoint degrees of the directed edge list; integer moment sums, the
# shared SPEARMAN_EXPR double combination.
EXT_ORACLES["q_assortativity"] = f"""
    WITH edges AS MATERIALIZED (
        SELECT id_a, id_b FROM ({EXT_ORACLES["q_minhash_lsh_pairs"]})
    ),
    bidir AS MATERIALIZED (
        SELECT id_a AS u, id_b AS v FROM edges
        UNION ALL
        SELECT id_b AS u, id_a AS v FROM edges
    ),
    deg AS MATERIALIZED (
        SELECT u AS x0, CAST(COUNT(*) AS BIGINT) AS d
        FROM bidir GROUP BY u
    ),
    xy AS (
        SELECT du.d AS x, dv.d AS y
        FROM bidir
        JOIN deg du ON du.x0 = bidir.u
        JOIN deg dv ON dv.x0 = bidir.v
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM xy
    )
    SELECT n AS n_directed_edges,
           {SPEARMAN_EXPR} AS assortativity_micro
    FROM s
"""

# IVF nprobe response curve (queries_ext.q_nprobe_sweep): the
# q_ann_index_probe quantization with rn <= nprobe probe legs at
# 1/2/4, each recall-joined to the brute-force exact top-10.
# assign/c/exact MATERIALIZED — multi-referenced.
EXT_ORACLES["q_nprobe_sweep"] = """
    WITH a AS (
        SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS avec
        FROM embeddings ORDER BY vec_id ASC LIMIT 8
    ),
    assign AS MATERIALIZED (
        SELECT
            e.vec_id,
            CAST(e.embedding AS DOUBLE[]) AS v,
            a.anchor_id,
            row_number() OVER (
                PARTITION BY e.vec_id
                ORDER BY list_dot_product(
                             CAST(e.embedding AS DOUBLE[]), a.avec) DESC,
                         a.anchor_id ASC
            ) AS rn
        FROM embeddings e CROSS JOIN a
    ),
    c AS MATERIALIZED (
        SELECT vec_id, v, anchor_id AS bucket FROM assign WHERE rn = 1
    ),
    exact AS MATERIALIZED (
        SELECT
            q.vec_id AS query_id,
            cc.vec_id AS neighbor_id
        FROM embeddings cc
        CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
        WHERE cc.vec_id != q.vec_id
        QUALIFY row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(
                         CAST(cc.embedding AS DOUBLE[]),
                         CAST(q.embedding AS DOUBLE[])) DESC,
                     cc.vec_id ASC
        ) <= 10
    ),
    ap1 AS MATERIALIZED (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM c
        JOIN (SELECT vec_id, v, anchor_id AS bucket FROM assign
              WHERE vec_id < 5 AND rn <= 1) q ON c.bucket = q.bucket
        WHERE c.vec_id != q.vec_id
        QUALIFY row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(c.v, q.v) DESC, c.vec_id ASC
        ) <= 10
    ),
    ap2 AS MATERIALIZED (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM c
        JOIN (SELECT vec_id, v, anchor_id AS bucket FROM assign
              WHERE vec_id < 5 AND rn <= 2) q ON c.bucket = q.bucket
        WHERE c.vec_id != q.vec_id
        QUALIFY row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(c.v, q.v) DESC, c.vec_id ASC
        ) <= 10
    ),
    ap4 AS MATERIALIZED (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM c
        JOIN (SELECT vec_id, v, anchor_id AS bucket FROM assign
              WHERE vec_id < 5 AND rn <= 4) q ON c.bucket = q.bucket
        WHERE c.vec_id != q.vec_id
        QUALIFY row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(c.v, q.v) DESC, c.vec_id ASC
        ) <= 10
    )
    SELECT CAST(1 AS INT) AS nprobe, e.query_id,
           CAST(COUNT(h.neighbor_id) AS BIGINT) AS hits,
           CAST(COUNT(h.neighbor_id) * 100000 AS BIGINT) AS recall_micro
    FROM exact e LEFT JOIN ap1 h USING (query_id, neighbor_id)
    GROUP BY e.query_id
    UNION ALL
    SELECT CAST(2 AS INT), e.query_id,
           CAST(COUNT(h.neighbor_id) AS BIGINT),
           CAST(COUNT(h.neighbor_id) * 100000 AS BIGINT)
    FROM exact e LEFT JOIN ap2 h USING (query_id, neighbor_id)
    GROUP BY e.query_id
    UNION ALL
    SELECT CAST(4 AS INT), e.query_id,
           CAST(COUNT(h.neighbor_id) AS BIGINT),
           CAST(COUNT(h.neighbor_id) * 100000 AS BIGINT)
    FROM exact e LEFT JOIN ap4 h USING (query_id, neighbor_id)
    GROUP BY e.query_id
"""

# Metadata PMI (queries_ext.q_mi_lang_source): cell counts once,
# marginals as windows over the bounded cell table, one shared ln text
# micro-rounded once.
EXT_ORACLES["q_mi_lang_source"] = """
    WITH cells AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_xy
        FROM documents GROUP BY 1, 2
    ),
    e AS (
        SELECT lang, source, n_xy,
               CAST(SUM(n_xy) OVER (PARTITION BY lang) AS BIGINT) AS n_x,
               CAST(SUM(n_xy) OVER (PARTITION BY source) AS BIGINT)
                   AS n_y,
               CAST(SUM(n_xy) OVER () AS BIGINT) AS n_total
        FROM cells
    )
    SELECT lang, source, n_xy,
           CAST(round(ln((CAST(n_xy AS DOUBLE) * n_total)
                / (CAST(n_x AS DOUBLE) * n_y)) * 1000000, 0) AS BIGINT)
               AS pmi_micro
    FROM e
"""


# Event-type Markov transitions (queries_ext.q_event_transitions):
# per-user lead over (ts, event_id), row-normalized over the bounded
# (src, dst) rollup.
EXT_ORACLES["q_event_transitions"] = """
    WITH trans AS (
        SELECT src_event, dst_event, CAST(COUNT(*) AS BIGINT)
                   AS n_transitions
        FROM (
            SELECT event_type AS src_event,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS dst_event
            FROM events
        )
        WHERE dst_event IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT src_event, dst_event, n_transitions,
           CAST(n_transitions * 1000000
                // SUM(n_transitions) OVER (PARTITION BY src_event)
                AS BIGINT) AS p_micro
    FROM trans
"""

# kNN hubness histogram (queries_ext.q_knn_hubness): every vector's
# LSH-bucketed top-10 with the SCALED blocker (first p sign bits of the
# 16-plane pattern, p from the shared integer rule — the
# q_semdedup_scaled assign CTE; a fixed 4-plane blocker measured 73×
# at ×10), in-degree histogram with the antihub 0 row via a left join
# from the corpus.
EXT_ORACLES["q_knn_hubness"] = f"""
    WITH cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
    e AS MATERIALIZED (
        SELECT
            vec_id,
            CAST(embedding AS DOUBLE[]) AS v,
            substr(
                {_hyperplane_bucket_sql("embedding", 64, 16)},
                1,
                (SELECT CASE WHEN (n - 1) // 128 < 1 THEN 1
                        ELSE length(bin((n - 1) // 128)) END FROM cnt)
            ) AS bucket
        FROM embeddings
    ),
    topk AS (
        SELECT c.vec_id AS neighbor_id
        FROM e c JOIN e q ON c.bucket = q.bucket
        WHERE c.vec_id != q.vec_id
        QUALIFY row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(c.v, q.v) DESC, c.vec_id ASC
        ) <= 10
    ),
    indeg AS (
        SELECT neighbor_id, CAST(COUNT(*) AS BIGINT) AS k_occ
        FROM topk GROUP BY 1
    )
    SELECT k_occurrence, CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM (
        SELECT COALESCE(i.k_occ, 0) AS k_occurrence
        FROM embeddings m LEFT JOIN indeg i ON i.neighbor_id = m.vec_id
    )
    GROUP BY 1
"""

# k-means cluster purity (queries_ext.q_cluster_purity): the shared
# k=8/iters=2 assignment CTEs joined to the label column; majority by
# (count desc, label asc).
EXT_ORACLES["q_cluster_purity"] = f"""
    WITH {_kmeans_cte_sql(k=8, iters=2, dim=64)},
    counts AS (
        SELECT m1.cid AS cluster_id, emb.label,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM m1 JOIN embeddings emb ON emb.vec_id = m1.vec_id
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY cluster_id ORDER BY cnt DESC, label ASC
        ) AS rn
        FROM counts
    ),
    tot AS (
        SELECT cluster_id,
               CAST(SUM(cnt) AS BIGINT) AS n_vectors,
               CAST(MAX(cnt) AS BIGINT) AS top_count
        FROM counts GROUP BY 1
    )
    SELECT t.cluster_id,
           t.n_vectors,
           CAST(r.label AS BIGINT) AS top_label,
           t.top_count,
           CAST(t.top_count * 1000000 // t.n_vectors AS BIGINT)
               AS purity_micro
    FROM tot t JOIN ranked r ON r.cluster_id = t.cluster_id AND r.rn = 1
"""


# ---------------------------------------------------------------------------
# round-10 fourth wave oracles
# ---------------------------------------------------------------------------
from telecom_competitor_analysis_spark.plans.queries_ext import (  # noqa: E402
    js_term_expr,
)

# Heaps'-law fit (queries_ext.q_heaps_fit): exponentially spaced
# cumulative prefixes via bin()-length buckets; cumulative vocab from
# each word's first-occurrence doc; shared all-double OLS slope text.
EXT_ORACLES["q_heaps_fit"] = f"""
    WITH toks AS MATERIALIZED (
        SELECT doc_id, w
        FROM (
            SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
            FROM documents
        )
        WHERE w != ''
    ),
    tok_bkt AS (
        SELECT CAST(length(bin(doc_id + 1)) AS INT) AS k,
               CAST(COUNT(*) AS BIGINT) AS nt
        FROM toks GROUP BY 1
    ),
    voc_bkt AS (
        SELECT CAST(length(bin(first_doc + 1)) AS INT) AS k,
               CAST(COUNT(*) AS BIGINT) AS nv
        FROM (
            SELECT w, MIN(doc_id) AS first_doc FROM toks GROUP BY w
        )
        GROUP BY 1
    ),
    cum AS (
        SELECT k,
               CAST(SUM(COALESCE(nt, 0)) OVER (
                   ORDER BY k ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum_tokens,
               CAST(SUM(COALESCE(nv, 0)) OVER (
                   ORDER BY k ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum_vocab
        FROM tok_bkt FULL OUTER JOIN voc_bkt USING (k)
    ),
    pts AS (
        SELECT
            CAST(round(ln(CAST(cum_tokens AS DOUBLE)) * 1000) AS BIGINT)
                AS x,
            CAST(round(ln(CAST(cum_vocab AS DOUBLE)) * 1000) AS BIGINT)
                AS y
        FROM cum WHERE cum_tokens > 0 AND cum_vocab > 0
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM pts
    ),
    sl AS (
        SELECT n, sx, sy, {OLS_SLOPE_MICRO_EXPR} AS beta_micro FROM s
    )
    SELECT n AS n_points,
           beta_micro,
           CAST((sy * 1000000 - beta_micro * sx) // n AS BIGINT)
               AS intercept_milli_micro
    FROM sl
"""

# Jensen-Shannon divergence (queries_ext.q_js_divergence): per-word
# micro-rounded terms via the shared js_term_expr text, halves by
# doc_id parity, normalizers from the vocab rollup.
EXT_ORACLES["q_js_divergence"] = f"""
    WITH toks AS (
        SELECT doc_id % 2 = 0 AS is_p, w
        FROM (
            SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
            FROM documents
        )
        WHERE w != ''
    ),
    counts AS MATERIALIZED (
        SELECT w,
               CAST(SUM(CASE WHEN is_p THEN 1 ELSE 0 END) AS BIGINT)
                   AS cp,
               CAST(SUM(CASE WHEN is_p THEN 0 ELSE 1 END) AS BIGINT)
                   AS cq
        FROM toks GROUP BY w
    ),
    tot AS (
        SELECT CAST(SUM(cp) AS BIGINT) AS np,
               CAST(SUM(cq) AS BIGINT) AS nq
        FROM counts
    ),
    terms AS (
        SELECT {js_term_expr("cp", "cq", "np", "nq")} AS tp,
               {js_term_expr("cq", "cp", "nq", "np")} AS tq
        FROM counts CROSS JOIN tot
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab,
           CAST(SUM(tp) AS BIGINT) AS kl_p_micro,
           CAST(SUM(tq) AS BIGINT) AS kl_q_micro,
           CAST((SUM(tp) + SUM(tq)) // 2 AS BIGINT) AS js_micro
    FROM terms
"""

# Gini concentration (queries_ext.q_gini_concentration): sorted
# per-source token totals, two truncating divisions mirrored textually.
EXT_ORACLES["q_gini_concentration"] = """
    WITH per_src AS (
        SELECT source,
               CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
                   AS t
        FROM documents GROUP BY source
    ),
    ranked AS (
        SELECT t,
               CAST(row_number() OVER (
                   ORDER BY t ASC, source ASC) AS BIGINT) AS i
        FROM per_src
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
           CAST(SUM(t) AS BIGINT) AS total_tokens,
           CAST(2 * SUM(i * t) * 1000000 // (COUNT(*) * SUM(t))
                - (COUNT(*) + 1) * 1000000 // COUNT(*) AS BIGINT)
               AS gini_micro
    FROM ranked
"""

# --- round 11 ------------------------------------------------------------

# BPE merge application (queries_ext.q_bpe_apply): mine the top-8 char
# pairs (the q_bpe_merges text, LIMIT 8), then 8 unrolled merge rounds
# over the space-delimited char string. Each round's fold body is the
# SHARED text BPE_MERGE_LAMBDA (queries_ext) — Spark spells the fold
# aggregate(split(t,' '), '', ...), DuckDB list_reduce(list_prepend('',
# string_split(t,' ')), ...): same '' init, same element order, same
# lambda. A missing merge row arrives as NULL a/b = identity round in
# both engines. All CTEs MATERIALIZED (the 431 s inline-per-reference
# lesson).
from telecom_competitor_analysis_spark.plans.queries_ext import (  # noqa: E402
    BPE_APPLY_TOPM,
    BPE_APPLY_TOPWORDS,
    BPE_MERGE_LAMBDA,
    BLOCKLIST_RULES,
)


def _bpe_apply_oracle() -> str:
    rounds = []
    for r in range(1, BPE_APPLY_TOPM + 1):
        body = BPE_MERGE_LAMBDA.format(a="m.a", b="m.b")
        rounds.append(f"""
    r{r} AS MATERIALIZED (
        SELECT word, freq,
               list_reduce(list_prepend('', string_split(t, ' ')),
                           (acc, x) -> {body}) AS t
        FROM r{r - 1},
             (SELECT min(substr(pair, 1, 1)) AS a,
                     min(substr(pair, 2, 1)) AS b
              FROM merges WHERE rank = {r}) m
    )""")
    return f"""
    WITH tok AS MATERIALIZED (
        SELECT unnest(string_split(trim(text), ' ')) AS word
        FROM documents
    ),
    vocab AS MATERIALIZED (
        SELECT word, COUNT(*)::BIGINT AS freq
        FROM tok WHERE word != '' GROUP BY word
    ),
    mine AS MATERIALIZED (
        SELECT substr(word, i, 2) AS pair, SUM(freq)::BIGINT AS cnt
        FROM (SELECT word, freq,
                     UNNEST(generate_series(1, len(word) - 1)) AS i
              FROM vocab WHERE len(word) >= 2)
        GROUP BY 1
    ),
    merges AS MATERIALIZED (
        SELECT CAST(row_number() OVER (
                   ORDER BY cnt DESC, pair ASC) AS INT) AS rank,
               pair
        FROM mine
        ORDER BY rank LIMIT {BPE_APPLY_TOPM}
    ),
    r0 AS MATERIALIZED (
        SELECT word, freq,
               array_to_string(string_split(word, ''), ' ') AS t
        FROM vocab
    ),{",".join(rounds)}
    SELECT rank, word, freq, t AS bpe_tokens,
           CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens
    FROM (SELECT *, CAST(row_number() OVER (
              ORDER BY freq DESC, word ASC) AS INT) AS rank
          FROM r{BPE_APPLY_TOPM})
    WHERE rank <= {BPE_APPLY_TOPWORDS}
    ORDER BY rank
"""


EXT_ORACLES["q_bpe_apply"] = _bpe_apply_oracle()

# Distinct-n diversity per source (queries_ext.q_distinct_ngrams):
# unigram/bigram distinct ratios in integer micro; bigram slots only
# for docs with >= 2 words (Spark's sequence(1,0) would DESCEND, so
# both engines guard the length — DuckDB's generate_series(1,0) is
# empty, making the guard a no-op here but keeping the texts aligned).
EXT_ORACLES["q_distinct_ngrams"] = """
    WITH ws AS MATERIALIZED (
        SELECT source, string_split(trim(text), ' ') AS ws
        FROM documents
    ),
    uni AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT w) AS BIGINT) AS d1
        FROM (SELECT source, unnest(ws) AS w FROM ws)
        GROUP BY source
    ),
    big AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(COUNT(DISTINCT bg) AS BIGINT) AS d2
        FROM (SELECT source,
                     unnest(list_transform(
                         generate_series(1, len(ws) - 1),
                         i -> concat(ws[i], ' ', ws[i + 1]))) AS bg
              FROM ws WHERE len(ws) >= 2)
        GROUP BY source
    )
    SELECT u.source, u.n_tokens,
           CAST(u.d1 * 1000000 // u.n_tokens AS BIGINT)
               AS distinct1_micro,
           b.n_bigrams,
           CAST(b.d2 * 1000000 // b.n_bigrams AS BIGINT)
               AS distinct2_micro
    FROM uni u JOIN big b USING (source)
"""

# Blocklist screen (queries_ext.q_blocklist_screen): the rules VALUES
# literal is generated from the SAME Python tuple as the Spark
# createDataFrame, so the two engines can never screen different rules.
# SQL-escape by doubling single quotes (r12 ADVICE): safe today's
# hardcoded terms, and a future rule containing an apostrophe becomes a
# correct literal instead of a broken (or injectable) VALUES clause.
_BLOCKLIST_VALUES = ",\n        ".join(
    "({}, '{}', '{}')".format(
        rid, term.replace("'", "''"), action.replace("'", "''")
    )
    for rid, term, action in BLOCKLIST_RULES
)
EXT_ORACLES["q_blocklist_screen"] = f"""
    WITH rules(rule_id, term, action) AS (
        VALUES {_BLOCKLIST_VALUES}
    ),
    tok AS (
        SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
        FROM documents
    ),
    hits AS (
        SELECT r.rule_id,
               CAST(COUNT(*) AS BIGINT) AS h,
               CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS d,
               CAST(MIN(t.doc_id) AS BIGINT) AS fd
        FROM tok t JOIN rules r ON t.w = r.term
        GROUP BY r.rule_id
    )
    SELECT CAST(r.rule_id AS INT) AS rule_id, r.term, r.action,
           CAST(COALESCE(h.d, 0) AS BIGINT) AS n_docs,
           CAST(COALESCE(h.h, 0) AS BIGINT) AS n_hits,
           h.fd AS first_doc
    FROM rules r LEFT JOIN hits h USING (rule_id)
"""

# Event run-length audit (queries_ext.q_event_runs): islands by value
# change per user, order (ts, event_id) — unique tiebreak, and the
# running sum spells ROWS explicitly so the frame can never differ.
EXT_ORACLES["q_event_runs"] = """
    WITH marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(event_type) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                        = event_type
                    THEN 0 ELSE 1 END AS new_run
        FROM events
    ),
    flagged AS (
        SELECT user_id, event_type,
               SUM(new_run)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS run_id
        FROM marked
    ),
    per_run AS (
        SELECT user_id, run_id, event_type,
               CAST(COUNT(*) AS BIGINT) AS len
        FROM flagged GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(SUM(len) AS BIGINT) AS n_events,
           CAST(MAX(len) AS BIGINT) AS max_run_len,
           CAST(SUM(CASE WHEN len >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repeat_runs,
           CAST(SUM(CASE WHEN len >= 2 THEN len ELSE 0 END) * 1000000
                // SUM(len) AS BIGINT) AS repeat_micro
    FROM per_run GROUP BY event_type
"""

# RBO@10 (queries_ext.q_rbo): same exact/LSH legs as q_ndcg; each
# matched doc contributes the inlined integer literal
# COEF[max(exact_rank, approx_rank)] — RBO_COEF_CASE is the SHARED text
# (Python precomputes the p-series; pow never runs in either engine).
from telecom_competitor_analysis_spark.plans.queries_ext import (  # noqa: E402
    RBO_COEF_CASE,
    T_CLOSENESS_THRESHOLD_MICRO,
)

EXT_ORACLES["q_rbo"] = f"""
    WITH exact0 AS ({EXT_ORACLES["q_embedding_topk"]}),
    approx0 AS ({EXT_ORACLES["q_embedding_lsh_topk"]}),
    exact AS (
        SELECT query_id, neighbor_id, rank AS exact_rank FROM exact0
    ),
    approx AS (
        SELECT query_id, neighbor_id, rank AS approx_rank FROM approx0
    ),
    matched AS (
        SELECT e.query_id, {RBO_COEF_CASE} AS coef
        FROM approx a
        JOIN exact e
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    ),
    per_q AS (
        SELECT query_id,
               CAST(COUNT(*) AS BIGINT) AS n_common,
               CAST(SUM(coef) AS BIGINT) AS rbo_micro
        FROM matched GROUP BY query_id
    ),
    universe AS (SELECT DISTINCT query_id FROM exact)
    SELECT u.query_id,
           CAST(COALESCE(p.n_common, 0) AS BIGINT) AS n_common,
           CAST(COALESCE(p.rbo_micro, 0) AS BIGINT) AS rbo_micro
    FROM universe u LEFT JOIN per_q p USING (query_id)
"""

# Two-stage rerank (queries_ext.q_two_stage_rerank): the q_pq_ann CTE
# chain's ranked table cut at the coarse top-50, re-ranked by the exact
# squared-L2 that rides along — same tie-breaks ((approx_dist, vec_id)
# coarse, (exact_dist, vec_id) refine) in both engines.
EXT_ORACLES["q_two_stage_rerank"] = f"""
    WITH {_PQ_CTES},
    coarse AS (
        SELECT qid AS query_id, vec_id,
               CAST(rn AS INT) AS approx_rank, approx_dist, exact_dist
        FROM ranked WHERE rn <= 50
    ),
    refined AS (
        SELECT query_id, vec_id, exact_dist, approx_rank,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY exact_dist, vec_id) AS INT) AS rank
        FROM coarse
    )
    SELECT query_id, rank, vec_id, exact_dist, approx_rank,
           CAST(approx_rank - rank AS INT) AS moved
    FROM refined WHERE rank <= 10
"""

# ECE bins (queries_ext.q_ece): classifier + Gopher oracles composed
# verbatim (the q_quality_calibration pattern); confidence is min-max
# normalized score in integer micro with the bounds as a 1-row
# aggregate; 10 equal-width bins, top edge folded into bin 9.
EXT_ORACLES["q_ece"] = f"""
    WITH model AS (
        SELECT doc_id, score_micro
        FROM ({EXT_ORACLES["q_quality_classifier"]})
        WHERE score_micro IS NOT NULL
    ),
    gopher AS (
        SELECT doc_id, passes FROM ({EXT_ORACLES["q_gopher_rules"]})
    ),
    j AS (
        SELECT m.doc_id, m.score_micro, g.passes
        FROM model m JOIN gopher g USING (doc_id)
    ),
    bounds AS (
        SELECT MIN(score_micro) AS min_s, MAX(score_micro) AS max_s
        FROM j
    ),
    b AS (
        SELECT j.passes,
               CASE WHEN bounds.max_s = bounds.min_s
                    THEN CAST(500000 AS BIGINT)
                    ELSE CAST((j.score_micro - bounds.min_s) * 1000000
                         // (bounds.max_s - bounds.min_s) AS BIGINT)
               END AS conf_micro
        FROM j, bounds
    ),
    binned AS (
        SELECT passes, conf_micro,
               CAST(least(9, conf_micro // 100000) AS INT) AS bin
        FROM b
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(conf_micro) // COUNT(*) AS BIGINT)
               AS avg_conf_micro,
           CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS pass_micro,
           CAST(abs(SUM(conf_micro) // COUNT(*)
                - SUM(CASE WHEN passes THEN 1 ELSE 0 END) * 1000000
                // COUNT(*)) AS BIGINT) AS gap_micro
    FROM binned GROUP BY bin
"""

# t-closeness (queries_ext.q_t_closeness): q_l_diversity's QI classes,
# TVD between class and global segment distributions; absent cells
# enter with probability 0 via the class x segment cross join.
EXT_ORACLES["q_t_closeness"] = f"""
    WITH base AS (
        SELECT c_nationkey,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
               c_mktsegment
        FROM customer
    ),
    cls_seg AS (
        SELECT c_nationkey, bal_band, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_cs
        FROM base GROUP BY 1, 2, 3
    ),
    cls AS (
        SELECT c_nationkey, bal_band, CAST(SUM(n_cs) AS BIGINT) AS n_c
        FROM cls_seg GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM base),
    seg AS (
        SELECT c_mktsegment,
               CAST(COUNT(*) * 1000000 // (SELECT n_tot FROM tot)
                    AS BIGINT) AS p_g_micro
        FROM base GROUP BY c_mktsegment
    ),
    cells AS (
        SELECT cls.c_nationkey, cls.bal_band, cls.n_c,
               abs(CAST(COALESCE(cs.n_cs, 0) * 1000000 // cls.n_c
                        AS BIGINT) - seg.p_g_micro) AS d
        FROM cls CROSS JOIN seg
        LEFT JOIN cls_seg cs
          ON cs.c_nationkey = cls.c_nationkey
         AND cs.bal_band = cls.bal_band
         AND cs.c_mktsegment = seg.c_mktsegment
    ),
    per_class AS (
        SELECT c_nationkey, bal_band, n_c,
               CAST(SUM(d) // 2 AS BIGINT) AS t_micro
        FROM cells GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MAX(t_micro) AS BIGINT) AS max_t_micro,
           CAST(SUM(CASE WHEN t_micro > {T_CLOSENESS_THRESHOLD_MICRO}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_classes,
           CAST(SUM(CASE WHEN t_micro > {T_CLOSENESS_THRESHOLD_MICRO}
                    THEN n_c ELSE 0 END) AS BIGINT) AS n_risky_rows
    FROM per_class
"""

# MAD anomaly screen (queries_ext.q_anomaly_mad): grouped medians via
# quantile_cont at the dyadic 0.5 (exact on the cents grid), fence =
# the shared MAD_RULE text, worst-z on the quarter-cent grid.
from telecom_competitor_analysis_spark.plans.queries_ext import (  # noqa: E402
    FRESHNESS_HALF_LIFE_DAYS,
    FRESHNESS_MAX_BUCKET,
    MAD_RULE,
    sdiv_expr,
)

EXT_ORACLES["q_anomaly_mad"] = f"""
    WITH o AS MATERIALIZED (
        SELECT o_orderstatus,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS pc
        FROM orders
    ),
    med AS MATERIALIZED (
        SELECT o_orderstatus, quantile_cont(pc, 0.5) AS med,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM o GROUP BY o_orderstatus
    ),
    dev AS MATERIALIZED (
        SELECT o.o_orderstatus, abs(o.pc - m.med) AS dev
        FROM o JOIN med m USING (o_orderstatus)
    ),
    mad AS MATERIALIZED (
        SELECT o_orderstatus, quantile_cont(dev, 0.5) AS mad
        FROM dev GROUP BY o_orderstatus
    ),
    agg AS (
        SELECT d.o_orderstatus,
               CAST(SUM(CASE WHEN {MAD_RULE} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers,
               CAST(SUM(CASE WHEN {MAD_RULE} THEN 1 ELSE 0 END)
                    * 1000000 // COUNT(*) AS BIGINT) AS outlier_micro,
               MAX(d.dev) AS max_dev
        FROM dev d JOIN mad USING (o_orderstatus)
        GROUP BY d.o_orderstatus
    )
    SELECT m.o_orderstatus, m.n_orders,
           m.med AS median_cents,
           mad.mad AS mad_cents,
           a.n_outliers, a.outlier_micro,
           CAST(CAST(round(a.max_dev * 4, 0) AS BIGINT) * 10000000
                // (14826 * GREATEST(CAST(round(mad.mad * 4, 0)
                AS BIGINT), 1)) AS BIGINT) AS worst_z_milli
    FROM med m
    JOIN mad USING (o_orderstatus)
    JOIN agg a USING (o_orderstatus)
"""

# Freshness decay (queries_ext.q_freshness_decay): dyadic half-life,
# per-event integer shift-divide; anchor = max event date (UTC session
# in both engines). Every division rides the shared sign-split text
# sdiv_expr (r12 ADVICE: vc can go negative — refunds — and Spark DIV
# truncates while DuckDB // floors; they agree only on non-negatives).
_FRESH_DEC = sdiv_expr("vc", "(CAST(1 AS BIGINT) << b)", "//")
_FRESH_RATIO = sdiv_expr(f"SUM({_FRESH_DEC}) * 1000000", "SUM(vc)", "//")
EXT_ORACLES["q_freshness_decay"] = f"""
    WITH e AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events
    ),
    anchor AS (SELECT MAX(d) AS anchor FROM e),
    b AS (
        SELECT event_type, vc,
               least({FRESHNESS_MAX_BUCKET},
                     date_diff('day', d, (SELECT anchor FROM anchor))
                     // {FRESHNESS_HALF_LIFE_DAYS}) AS b
        FROM e
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(vc) AS BIGINT) AS raw_cents,
           CAST(SUM({_FRESH_DEC}) AS BIGINT) AS decayed_cents,
           CAST({_FRESH_RATIO} AS BIGINT) AS retention_micro
    FROM b GROUP BY event_type
"""

# Feature-hash collision audit (queries_ext.q_feature_hash_collisions):
# the scorer's own 64-bucket md5 hash (_md5_bucket_sql), bucket-load
# histogram + the empty-bucket row.
EXT_ORACLES["q_feature_hash_collisions"] = f"""
    WITH vocab AS MATERIALIZED (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(trim(text), ' ')) AS word
              FROM documents)
        WHERE word != '' GROUP BY word
    ),
    loads AS MATERIALIZED (
        SELECT {_md5_bucket_sql("word", 64)} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS load,
               CAST(SUM(freq) AS BIGINT) AS mass
        FROM vocab GROUP BY 1
    ),
    hist AS (
        SELECT load,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(SUM(mass) AS BIGINT) AS token_mass
        FROM loads GROUP BY load
    ),
    empty AS (
        SELECT CAST(0 AS BIGINT) AS load,
               CAST(64 - COUNT(*) AS BIGINT) AS n_buckets,
               CAST(0 AS BIGINT) AS token_mass
        FROM loads HAVING 64 - COUNT(*) > 0
    )
    SELECT * FROM hist UNION ALL SELECT * FROM empty
"""

# Media sniff (queries_ext.q_media_sniff): payload = header || utf8
# bytes rebuilt in SQL; sniff and family are the SHARED case texts over
# the 8-hex-char prefix (DuckDB hexes then slices — blob substring
# does not exist here; same value as Spark's slice-then-hex).
from telecom_competitor_analysis_spark.operators.multimodal import (  # noqa: E402
    SNIFF_CASE,
    SNIFF_FAMILY_CASE,
)

_sniff = SNIFF_CASE.format(h="left(hex(payload), 8)")
EXT_ORACLES["q_media_sniff"] = f"""
    WITH media AS (
        SELECT doc_id AS media_id,
               (CASE doc_id % 5
                WHEN 0 THEN '\\xFF\\xD8\\xFF'::BLOB
                WHEN 1 THEN '\\x89\\x50\\x4E\\x47'::BLOB
                WHEN 2 THEN '\\x52\\x49\\x46\\x46'::BLOB
                WHEN 3 THEN '\\x47\\x49\\x46\\x38'::BLOB
                ELSE ''::BLOB END) || encode(text) AS payload,
               CASE (doc_id % 3) + 1
                   WHEN 1 THEN 'image' WHEN 2 THEN 'audio'
                   ELSE 'video' END AS media_type
        FROM documents
    ),
    sniffed AS (
        SELECT media_type,
               {_sniff} AS sniffed
        FROM media
    ),
    fam AS (
        SELECT media_type, sniffed,
               {SNIFF_FAMILY_CASE.format(s="sniffed")} AS sniffed_family
        FROM sniffed
    )
    SELECT media_type, sniffed,
           (sniffed_family != 'unknown'
            AND sniffed_family != media_type) AS is_mismatch,
           CAST(COUNT(*) AS BIGINT) AS n_files
    FROM fam GROUP BY media_type, sniffed, sniffed_family
"""

# Local clustering coefficient (queries_ext.q_clustering_coeff): the
# triangle_stats orientation mirrored in SQL over the LSH pair edges,
# closure keeps (u, v, w), unnest credits the 3 endpoints, degree-1
# nodes excluded, bin()-length degree buckets. Every multi-referenced
# CTE MATERIALIZED (the kcore 3^depth lesson).
EXT_ORACLES["q_clustering_coeff"] = f"""
    WITH edges AS MATERIALIZED (
        SELECT id_a, id_b FROM ({EXT_ORACLES["q_minhash_lsh_pairs"]})
    ),
    deg AS MATERIALIZED (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT id_a AS v FROM edges
              UNION ALL SELECT id_b AS v FROM edges)
        GROUP BY v
    ),
    oriented AS MATERIALIZED (
        SELECT CASE WHEN da.deg <= db.deg THEN e.id_a ELSE e.id_b END
                   AS u,
               CASE WHEN da.deg <= db.deg THEN e.id_b ELSE e.id_a END
                   AS v
        FROM edges e
        JOIN deg da ON da.v = e.id_a
        JOIN deg db ON db.v = e.id_b
    ),
    tri AS MATERIALIZED (
        SELECT o1.u, o1.v, o2.v AS w
        FROM oriented o1
        JOIN oriented o2 ON o1.u = o2.u AND o1.v < o2.v
        JOIN edges e
          ON e.id_a = least(o1.v, o2.v)
         AND e.id_b = greatest(o1.v, o2.v)
    ),
    tri_nodes AS MATERIALIZED (
        SELECT v0 AS v, CAST(COUNT(*) AS BIGINT) AS n_tri
        FROM (SELECT unnest([u, v, w]) AS v0 FROM tri)
        GROUP BY v0
    ),
    cc AS (
        SELECT COALESCE(t.n_tri, 0) AS n_tri, d.deg,
               CAST(2 * COALESCE(t.n_tri, 0) * 1000000
                    // (d.deg * (d.deg - 1)) AS BIGINT) AS cc_micro,
               CAST(length(bin(d.deg)) AS INT) AS deg_bucket
        FROM deg d LEFT JOIN tri_nodes t USING (v)
        WHERE d.deg >= 2
    )
    SELECT deg_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(n_tri) AS BIGINT) AS sum_triangle_slots,
           CAST(SUM(cc_micro) // COUNT(*) AS BIGINT) AS avg_cc_micro,
           CAST(MAX(cc_micro) AS BIGINT) AS max_cc_micro
    FROM cc GROUP BY deg_bucket
"""

# Power iteration (queries_ext.q_power_iteration): the q_gram_matrix
# oracle as the cov CTE, n-independent rescale and every normalization
# through the SHARED sign-split division text sdiv_expr (Spark DIV
# truncates, DuckDB // floors — they agree only after the sign split).
from telecom_competitor_analysis_spark.plans.queries_ext import (  # noqa: E402
    sdiv_expr,
)

EXT_ORACLES["q_power_iteration"] = f"""
    WITH cov AS MATERIALIZED (
        SELECT i, j, cov_scaled FROM ({EXT_ORACLES["q_gram_matrix"]})
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM embeddings),
    a AS MATERIALIZED (
        SELECT i, j,
               CAST({sdiv_expr("cov_scaled", "nn * nn", "//")} AS BIGINT)
                   AS a
        FROM cov, nn
    ),
    full_m AS MATERIALIZED (
        SELECT i, j, a FROM a
        UNION ALL
        SELECT j AS i, i AS j, a FROM a WHERE i < j
    ),
    v1 AS MATERIALIZED (
        SELECT j, CAST(SUM(a * 1000) AS BIGINT) AS v
        FROM full_m GROUP BY j
    ),
    m1 AS (SELECT CAST(MAX(abs(v)) AS BIGINT) AS m1 FROM v1),
    u1 AS MATERIALIZED (
        SELECT j,
               CAST({sdiv_expr("v * 1000", "GREATEST(m1, 1)", "//")}
                    AS BIGINT) AS u1_milli
        FROM v1, m1
    ),
    v2 AS MATERIALIZED (
        SELECT f.j, CAST(SUM(f.a * u.u1_milli) AS BIGINT) AS v
        FROM full_m f JOIN u1 u ON f.i = u.j
        GROUP BY f.j
    ),
    m2 AS (SELECT CAST(MAX(abs(v)) AS BIGINT) AS m2 FROM v2),
    u2 AS (
        SELECT j,
               CAST({sdiv_expr("v * 1000", "GREATEST(m2, 1)", "//")}
                    AS BIGINT) AS u2_milli
        FROM v2, m2
    )
    SELECT CAST(u1.j AS INT) AS dim, u1.u1_milli, u2.u2_milli,
           CAST((SELECT m2 FROM m2)
                // GREATEST((SELECT m1 FROM m1) // 1000, 1) AS BIGINT)
               AS lambda_scaled
    FROM u1 JOIN u2 USING (j)
"""

# Character entropy rate (queries_ext.q_char_entropy_rate): per-lang
# H(bigram) - H(unigram), each via the micro-rounded-ln convention
# (q_char_entropy) — one rounded division per entropy, one rounded
# subtraction for the rate.
EXT_ORACLES["q_char_entropy_rate"] = """
    WITH base AS MATERIALIZED (
        SELECT lang, trim(text) AS ns FROM documents
        WHERE len(trim(text)) >= 1
    ),
    uni AS (
        SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT lang, unnest(string_split(ns, '')) AS g FROM base)
        WHERE g != '' GROUP BY lang, g
    ),
    bi AS (
        SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT lang, substr(ns, i, 2) AS g
              FROM base,
                   unnest(generate_series(1, len(ns) - 1)) AS t(i)
              WHERE len(ns) >= 2)
        GROUP BY lang, g
    ),
    h1 AS (
        SELECT lang, CAST(SUM(c) AS BIGINT) AS n_chars,
               round((CAST(round(ln(SUM(c)) * 1000000, 0) AS BIGINT)
                      - CAST(SUM(c * CAST(round(ln(c) * 1000000, 0)
                            AS BIGINT)) AS BIGINT) / SUM(c))
                     / 1000000.0, 6) AS h_uni
        FROM uni GROUP BY lang
    ),
    h2 AS (
        SELECT lang, CAST(SUM(c) AS BIGINT) AS n_bigrams,
               round((CAST(round(ln(SUM(c)) * 1000000, 0) AS BIGINT)
                      - CAST(SUM(c * CAST(round(ln(c) * 1000000, 0)
                            AS BIGINT)) AS BIGINT) / SUM(c))
                     / 1000000.0, 6) AS h_bi
        FROM bi GROUP BY lang
    )
    SELECT h1.lang, h1.n_chars, h2.n_bigrams, h1.h_uni, h2.h_bi,
           round(h2.h_bi - h1.h_uni, 6) AS entropy_rate
    FROM h1 JOIN h2 USING (lang)
"""

# Burstiness (queries_ext.q_burstiness): the shared double text
# BURSTINESS_EXPR over exact integer aggregates; distributed top-20 by
# (n_occ DESC, word ASC).
from telecom_competitor_analysis_spark.plans.queries_ext import (  # noqa: E402
    BPE_CURVE_CHECKPOINTS,
    BURSTINESS_EXPR,
)

EXT_ORACLES["q_burstiness"] = f"""
    WITH per_dw AS MATERIALIZED (
        SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS x
        FROM (SELECT doc_id,
                     unnest(string_split(trim(text), ' ')) AS w
              FROM documents)
        WHERE w != '' GROUP BY doc_id, w
    ),
    per_w AS MATERIALIZED (
        SELECT w,
               CAST(SUM(x) AS BIGINT) AS n_occ,
               CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(x * x) AS BIGINT) AS sx2
        FROM per_dw GROUP BY w
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS N FROM documents),
    top AS (
        SELECT *, CAST(row_number() OVER (
                   ORDER BY n_occ DESC, w ASC) AS INT) AS rank
        FROM per_w ORDER BY n_occ DESC, w ASC LIMIT 20
    )
    SELECT rank, w AS word, n_occ, df,
           {BURSTINESS_EXPR.format(N="(SELECT N FROM nd)")}
               AS vmr_micro,
           CAST(n_occ * 1000000 // df AS BIGINT) AS occ_per_doc_micro
    FROM top
"""


# BPE compression curve (queries_ext.q_bpe_compression_curve): the
# q_bpe_apply CTE chain (same mined merges, same shared fold lambda),
# with the curve read off the r0/r2/r4/r8 round CTEs directly — each
# is MATERIALIZED, so the chain evaluates once.
def _bpe_curve_oracle() -> str:
    rounds = []
    for r in range(1, BPE_APPLY_TOPM + 1):
        body = BPE_MERGE_LAMBDA.format(a="m.a", b="m.b")
        rounds.append(f"""
    r{r} AS MATERIALIZED (
        SELECT word, freq,
               list_reduce(list_prepend('', string_split(t, ' ')),
                           (acc, x) -> {body}) AS t
        FROM r{r - 1},
             (SELECT min(substr(pair, 1, 1)) AS a,
                     min(substr(pair, 2, 1)) AS b
              FROM merges WHERE rank = {r}) m
    )""")
    legs = ",\n".join(
        f"""
    p{r} AS (
        SELECT CAST({r} AS INT) AS n_merges,
               CAST(SUM(freq * len(string_split(t, ' '))) AS BIGINT)
                   AS total_tokens
        FROM r{r}
    )"""
        for r in BPE_CURVE_CHECKPOINTS
    )
    union = "\n        UNION ALL ".join(
        [
            "SELECT CAST(0 AS INT) AS n_merges,"
            " (SELECT C FROM wc) AS total_tokens"
        ]
        + [f"SELECT n_merges, total_tokens FROM p{r}"
           for r in BPE_CURVE_CHECKPOINTS]
    )
    return f"""
    WITH tok AS MATERIALIZED (
        SELECT unnest(string_split(trim(text), ' ')) AS word
        FROM documents
    ),
    vocab AS MATERIALIZED (
        SELECT word, COUNT(*)::BIGINT AS freq
        FROM tok WHERE word != '' GROUP BY word
    ),
    mine AS MATERIALIZED (
        SELECT substr(word, i, 2) AS pair, SUM(freq)::BIGINT AS cnt
        FROM (SELECT word, freq,
                     UNNEST(generate_series(1, len(word) - 1)) AS i
              FROM vocab WHERE len(word) >= 2)
        GROUP BY 1
    ),
    merges AS MATERIALIZED (
        SELECT CAST(row_number() OVER (
                   ORDER BY cnt DESC, pair ASC) AS INT) AS rank,
               pair
        FROM mine
        ORDER BY rank LIMIT {BPE_APPLY_TOPM}
    ),
    wc AS MATERIALIZED (
        SELECT CAST(SUM(freq) AS BIGINT) AS W,
               CAST(SUM(freq * len(word)) AS BIGINT) AS C
        FROM vocab
    ),
    r0 AS MATERIALIZED (
        SELECT word, freq,
               array_to_string(string_split(word, ''), ' ') AS t
        FROM vocab
    ),{",".join(rounds)},{legs},
    curve AS (
        {union}
    )
    SELECT n_merges, total_tokens,
           CAST(total_tokens * 1000000 // (SELECT W FROM wc) AS BIGINT)
               AS tokens_per_word_micro,
           CAST(total_tokens * 1000000 // (SELECT C FROM wc) AS BIGINT)
               AS compression_micro
    FROM curve
"""


EXT_ORACLES["q_bpe_compression_curve"] = _bpe_curve_oracle()

# Deletion-vector audit (queries_ext.q_delete_vectors): the mask table
# applied by LEFT join, per-(month, file) mask ratios, 20% rewrite
# threshold shared via the Python constant.
from telecom_competitor_analysis_spark.plans.queries_ext import (  # noqa: E402
    DV_COMPACT_THRESHOLD_MICRO,
)

EXT_ORACLES["q_delete_vectors"] = f"""
    WITH o AS (
        SELECT o_orderkey,
               CAST(year(o_orderdate) * 100 + month(o_orderdate)
                    AS INT) AS ym,
               CAST(o_orderkey % 4 AS INT) AS file_id
        FROM orders
    ),
    dv AS (
        SELECT o_orderkey AS dk FROM orders WHERE o_orderkey % 13 = 0
    ),
    masked AS (
        SELECT o.ym, o.file_id,
               CASE WHEN dv.dk IS NOT NULL THEN 1 ELSE 0 END
                   AS is_masked
        FROM o LEFT JOIN dv ON o.o_orderkey = dv.dk
    )
    SELECT ym, file_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(is_masked) AS BIGINT) AS n_masked,
           CAST(SUM(is_masked) * 1000000 // COUNT(*) AS BIGINT)
               AS mask_micro,
           SUM(is_masked) * 1000000 // COUNT(*)
               > {DV_COMPACT_THRESHOLD_MICRO} AS needs_compaction
    FROM masked GROUP BY ym, file_id
"""

# File-pruning stats (queries_ext.q_pruning_stats): both layouts' file
# stats + the fractional predicate boxes from the SAME Python tuple as
# the Spark literal table.
from telecom_competitor_analysis_spark.plans.queries_ext import (  # noqa: E402
    PRUNING_PREDICATES,
)

_PRED_VALUES = ",\n        ".join(
    f"('{n}', {xl}, {xh}, {yl}, {yh})"
    for n, xl, xh, yl, yh in PRUNING_PREDICATES
)
_MORTON = " + ".join(
    f"((bx // {1 << i}) % 2) * {1 << (2 * i + 1)}"
    f" + ((by // {1 << i}) % 2) * {1 << (2 * i)}"
    for i in range(4)
)
EXT_ORACLES["q_pruning_stats"] = f"""
    WITH b AS (
        SELECT MIN(o_custkey) AS minc, MAX(o_custkey) AS maxc,
               MIN(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS minp,
               MAX(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS maxp
        FROM orders
    ),
    q AS MATERIALIZED (
        SELECT least(15, (o.o_custkey - b.minc) * 16
                         // (b.maxc - b.minc + 1)) AS bx,
               least(15, (CAST(round(o.o_totalprice * 100, 0) AS BIGINT)
                          - b.minp) * 16 // (b.maxp - b.minp + 1)) AS by,
               CAST(o.o_orderkey % 4 AS INT) AS sub
        FROM orders o, b
    ),
    zfiles AS (
        SELECT 'zorder' AS layout,
               ({_MORTON}) // 4 AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(bx) AS min_x, MAX(bx) AS max_x,
               MIN(by) AS min_y, MAX(by) AS max_y
        FROM q GROUP BY 2
    ),
    lfiles AS (
        SELECT 'linear' AS layout,
               bx * 4 + sub AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(bx) AS min_x, MAX(bx) AS max_x,
               MIN(by) AS min_y, MAX(by) AS max_y
        FROM q GROUP BY 2
    ),
    files AS (
        SELECT * FROM zfiles UNION ALL SELECT * FROM lfiles
    ),
    preds(predicate, x_lo, x_hi, y_lo, y_hi) AS (
        VALUES {_PRED_VALUES}
    ),
    hit AS (
        SELECT f.layout, p.predicate, f.n_rows,
               CASE WHEN f.max_x >= p.x_lo AND f.min_x < p.x_hi
                     AND f.max_y >= p.y_lo AND f.min_y < p.y_hi
                    THEN 1 ELSE 0 END AS kept
        FROM files f CROSS JOIN preds p
    )
    SELECT layout, predicate,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(kept) AS BIGINT) AS files_kept,
           CAST(SUM(kept * n_rows) AS BIGINT) AS rows_scanned,
           CAST((COUNT(*) - SUM(kept)) * 1000000 // COUNT(*) AS BIGINT)
               AS skip_micro
    FROM hit GROUP BY layout, predicate
"""

# Bloom FPP audit (queries_ext.q_bloom_fpp_audit): the
# q_bloom_prefilter_join bit-set construction (2 md5-substring hashes
# mod 8192) measured over distinct probe keys; prediction from the
# measured fill, k = 2.
EXT_ORACLES["q_bloom_fpp_audit"] = """
    WITH supp3 AS MATERIALIZED (
        SELECT s_suppkey FROM supplier WHERE s_nationkey = 3
    ),
    bits AS MATERIALIZED (
        SELECT DISTINCT p FROM (
            SELECT (('0x' || substr(md5(CAST(s_suppkey AS VARCHAR)),
                     1, 8))::BIGINT % 8192) AS p FROM supp3
            UNION ALL
            SELECT (('0x' || substr(md5(CAST(s_suppkey AS VARCHAR)),
                     9, 8))::BIGINT % 8192) AS p FROM supp3
        )
    ),
    probe AS MATERIALIZED (
        SELECT DISTINCT l_suppkey AS k FROM lineitem
    ),
    tested AS (
        SELECT pr.k,
               CASE WHEN b1.p IS NOT NULL AND b2.p IS NOT NULL
                    THEN 1 ELSE 0 END AS passes,
               CASE WHEN m.s_suppkey IS NOT NULL THEN 1 ELSE 0 END
                   AS is_member
        FROM probe pr
        LEFT JOIN bits b1
          ON b1.p = (('0x' || substr(md5(CAST(pr.k AS VARCHAR)),
                      1, 8))::BIGINT % 8192)
        LEFT JOIN bits b2
          ON b2.p = (('0x' || substr(md5(CAST(pr.k AS VARCHAR)),
                      9, 8))::BIGINT % 8192)
        LEFT JOIN supp3 m ON m.s_suppkey = pr.k
    )
    SELECT CAST(8192 AS BIGINT) AS m_bits,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM supp3) AS n_build,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS bits_set,
           CAST(COUNT(*) AS BIGINT) AS probe_distinct,
           CAST(SUM(is_member) AS BIGINT) AS n_members,
           CAST(SUM(passes) AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN passes = 1 AND is_member = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN passes = 1 AND is_member = 0
                    THEN 1 ELSE 0 END) * 1000000
                // GREATEST(COUNT(*) - SUM(is_member), 1) AS BIGINT)
               AS fpp_measured_micro,
           CAST(((SELECT COUNT(*) FROM bits) * 1000000 // 8192)
                * ((SELECT COUNT(*) FROM bits) * 1000000 // 8192)
                // 1000000 AS BIGINT) AS fpp_predicted_micro
    FROM tested
"""


# --- round-12 wave A -----------------------------------------------------

# q_ivfpq_ann (queries_ext.q_ivfpq_ann) — IVFPQ with exact refine:
# composes the q_ann_index_probe probe chain (8 lowest-id anchors,
# double dot-product ranking, nprobe=2) with the _PQ_CTES code/ADC
# chain. Candidates = probed buckets only; coarse top-50 by the
# integer ADC sum; exact integer-L2 refine to the final top-10. A
# corpus vector lives in exactly one bucket and a query's two probe
# legs hit distinct anchors, so the candidate set is duplicate-free
# and both row_numbers are plain top-ks.
_IVFPQ_CTES = """
    ivfa AS (
        SELECT vec_id AS anchor_id, v AS avec
        FROM e ORDER BY vec_id ASC LIMIT 8
    ),
    ivfassign AS MATERIALIZED (
        SELECT e.vec_id, a.anchor_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_dot_product(e.v, a.avec) DESC,
                            a.anchor_id ASC
               ) AS arn
        FROM e CROSS JOIN ivfa a
    ),
    cbucket AS (
        SELECT vec_id, anchor_id AS bucket FROM ivfassign WHERE arn = 1
    ),
    pbucket AS (
        SELECT vec_id AS qid, anchor_id AS bucket
        FROM ivfassign WHERE vec_id < 5 AND arn <= 2
    ),
    ivfapprox AS (
        SELECT p.qid, cv.vec_id,
               CAST(SUM(a.d) AS BIGINT) AS approx_dist
        FROM cbucket cv
        JOIN pbucket p ON cv.bucket = p.bucket
        JOIN codes k ON k.vec_id = cv.vec_id
        JOIN adc a ON a.qid = p.qid AND a.j = k.j AND a.c = k.c
        WHERE cv.vec_id != p.qid
        GROUP BY 1, 2
    ),
    ivfcoarse AS (
        SELECT qid, vec_id, approx_dist,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY approx_dist, vec_id) AS crn
        FROM ivfapprox
    ),
    ivffine AS (
        SELECT s.qid, s.vec_id, s.approx_dist, s.crn, x.exact_dist,
               row_number() OVER (PARTITION BY s.qid
                                  ORDER BY x.exact_dist, s.vec_id) AS rn
        FROM (SELECT * FROM ivfcoarse WHERE crn <= 50) s
        JOIN exact x ON x.qid = s.qid AND x.vec_id = s.vec_id
    )
"""

EXT_ORACLES["q_ivfpq_ann"] = f"""
    WITH {_PQ_CTES},
    {_IVFPQ_CTES}
    SELECT qid AS query_id, CAST(rn AS INT) AS rank,
           vec_id AS neighbor_id, approx_dist, exact_dist,
           CAST(crn AS INT) AS coarse_rank,
           CAST(crn - rn AS INT) AS moved
    FROM ivffine WHERE rn <= 10
"""

# q_ivfpq_recall (queries_ext.q_ivfpq_recall) — recall@10 of the
# refined IVFPQ top-10 against the exact integer-L2 top-10 over the
# FULL corpus (the q_pq_recall convention; both legs size-10 per
# query, so the count is |intersection| regardless of orientation).
EXT_ORACLES["q_ivfpq_recall"] = f"""
    WITH {_PQ_CTES},
    {_IVFPQ_CTES},
    ann10 AS (SELECT qid, vec_id FROM ivffine WHERE rn <= 10),
    iex10 AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY exact_dist, vec_id) AS ern
            FROM exact WHERE vec_id != qid
        ) WHERE ern <= 10
    )
    SELECT ann10.qid AS query_id,
           CAST(COUNT(iex10.vec_id) AS BIGINT) AS hits,
           CAST(COUNT(iex10.vec_id) * 100000 AS BIGINT) AS recall_micro
    FROM ann10 LEFT JOIN iex10
      ON ann10.qid = iex10.qid AND ann10.vec_id = iex10.vec_id
    GROUP BY 1
"""


# q_pack_efficiency (queries_ext.q_pack_efficiency): two packing
# strategies over the SAME portable md5 doc_id shards (32), L=512.
# The concat leg is one window cumsum; the FFD leg replays
# first-fit-decreasing EXACTLY via a recursive CTE whose state is each
# shard's open-bin load list — one doc per shard per iteration in
# (n desc, doc_id) order, first-fit index found by a correlated
# unnest-with-ordinality subquery (a correlated LAMBDA inside a
# recursive term sends DuckDB's planner into a rewrite blowup — the
# unnest form is the workaround; input CTEs MATERIALIZED so the
# recursion never re-derives the tokenization).
_PACK_SHARD = _md5_bucket_sql("CAST(doc_id AS VARCHAR)", 32)
EXT_ORACLES["q_pack_efficiency"] = f"""
    WITH RECURSIVE t AS MATERIALIZED (
        SELECT doc_id,
               len(string_split(trim(text), ' '))::BIGINT AS n_raw,
               LEAST(len(string_split(trim(text), ' '))::BIGINT, 512)
                   AS n,
               {_PACK_SHARD} AS shard
        FROM documents
    ),
    c AS (
        SELECT shard, n, n_raw,
               SUM(n) OVER (PARTITION BY shard ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) - n AS start
        FROM t
    ),
    cagg AS (
        SELECT shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_raw) AS BIGINT) AS total_tokens,
               CAST((SUM(n) + 511) // 512 AS BIGINT) AS n_seqs,
               CAST(SUM(LEAST(n, 512 - (start % 512))) AS BIGINT)
                   AS used_tokens
        FROM c GROUP BY shard
    ),
    d AS MATERIALIZED (
        SELECT shard, n, doc_id,
               row_number() OVER (PARTITION BY shard
                                  ORDER BY n DESC, doc_id) AS rk
        FROM t
    ),
    pack AS (
        SELECT shard, 0::BIGINT AS rk, CAST([] AS BIGINT[]) AS bins
        FROM (SELECT DISTINCT shard FROM d)
        UNION ALL
        SELECT sub.shard, sub.rk,
               CASE WHEN sub.p IS NULL THEN list_append(sub.bins, sub.n)
                    ELSE sub.bins[1:sub.p - 1]
                         || [sub.bins[sub.p] + sub.n]
                         || sub.bins[sub.p + 1:]
               END
        FROM (
            SELECT d.shard, d.rk, d.n, pack.bins,
                   (SELECT MIN(u.ord) FROM (
                        SELECT unnest(pack.bins) AS b,
                               generate_subscripts(pack.bins, 1) AS ord
                    ) u WHERE u.b + d.n <= 512) AS p
            FROM pack JOIN d
              ON d.shard = pack.shard AND d.rk = pack.rk + 1
        ) sub
    ),
    fbins AS (
        SELECT p.shard, p.bins
        FROM pack p
        JOIN (SELECT shard, MAX(rk) AS mrk FROM pack GROUP BY shard) m
          ON p.shard = m.shard AND p.rk = m.mrk
    ),
    fagg AS (
        SELECT f.shard,
               tt.n_docs, tt.total_tokens,
               CAST(len(f.bins) AS BIGINT) AS n_seqs,
               CAST(list_sum(f.bins) AS BIGINT) AS used_tokens
        FROM fbins f
        JOIN (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(n_raw) AS BIGINT) AS total_tokens
              FROM t GROUP BY shard) tt USING (shard)
    ),
    lab AS (
        SELECT 'concat_trunc' AS strategy, * FROM cagg
        UNION ALL
        SELECT 'ffd_sorted' AS strategy, * FROM fagg
    )
    SELECT strategy, CAST(shard AS INT) AS shard, n_docs, total_tokens,
           n_seqs, used_tokens,
           CAST(total_tokens - used_tokens AS BIGINT) AS trunc_tokens,
           CAST(used_tokens * 1000000 // (n_seqs * 512) AS BIGINT)
               AS fill_micro
    FROM lab
"""


# q_dp_histogram (queries_ext.q_dp_histogram): Laplace-mechanism
# release over the (mktsegment, nation) QI classes. Same md5-hex
# uniform (first 2 hex digits -> one of 64 levels) and the SAME
# integer-micro quantized inverse-CDF noise table inlined from
# _laplace_micro_table — the ln ran once in Python; neither engine
# executes a transcendental.
from telecom_competitor_analysis_spark.plans.queries_ext import (  # noqa: E402
    DP_EPSILON_MICRO,
    DP_NOISE_LEVELS,
    _laplace_micro_table,
)

_DP_TABLE = "[" + ", ".join(
    f"CAST({v} AS BIGINT)" for v in _laplace_micro_table()
) + "]"
EXT_ORACLES["q_dp_histogram"] = f"""
    WITH classes AS (
        SELECT c_mktsegment, c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS true_n
        FROM customer GROUP BY 1, 2
    ),
    noised AS (
        SELECT *,
               (((strpos('0123456789abcdef',
                         substr(md5(c_mktsegment || ':' ||
                                    CAST(c_nationkey AS VARCHAR)), 1, 1))
                  - 1) * 16
                 + strpos('0123456789abcdef',
                          substr(md5(c_mktsegment || ':' ||
                                     CAST(c_nationkey AS VARCHAR)), 2, 1))
                 - 1) // {256 // DP_NOISE_LEVELS}) AS bucket
        FROM classes
    )
    SELECT c_mktsegment,
           CAST(c_nationkey AS BIGINT) AS c_nationkey,
           true_n,
           ({_DP_TABLE})[bucket + 1] AS noise_micro,
           GREATEST(CAST(0 AS BIGINT),
                    true_n * 1000000 + ({_DP_TABLE})[bucket + 1])
               AS released_micro,
           CAST({DP_EPSILON_MICRO} AS BIGINT) AS epsilon_micro,
           CAST(1 AS BIGINT) AS sensitivity
    FROM noised
"""


# q_countmin_audit (queries_ext.q_countmin_audit): d=4 x w=256
# Count-Min over the vocabulary-collapsed token stream; bucket =
# first-2-hex-md5('word:j') (256 buckets = the full 2-hex space);
# point estimate = min over the 4 rows; audited against the exact
# top-20. Integer throughout.
EXT_ORACLES["q_countmin_audit"] = """
    WITH vocab AS MATERIALIZED (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(trim(text), ' ')) AS word
              FROM documents)
        WHERE word != '' GROUP BY word
    ),
    total AS (SELECT CAST(SUM(freq) AS BIGINT) AS n_tokens FROM vocab),
    hashed AS (
        SELECT v.word, v.freq, j.j,
               (((strpos('0123456789abcdef',
                         substr(md5(v.word || ':' ||
                                    CAST(j.j AS VARCHAR)), 1, 1)) - 1)
                 * 16
                 + strpos('0123456789abcdef',
                          substr(md5(v.word || ':' ||
                                     CAST(j.j AS VARCHAR)), 2, 1)) - 1))
                   AS bucket
        FROM vocab v, (SELECT UNNEST(range(4)) AS j) j
    ),
    sketch AS MATERIALIZED (
        SELECT j, bucket, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM hashed GROUP BY 1, 2
    ),
    top AS (
        SELECT word, freq AS true_freq FROM vocab
        ORDER BY freq DESC, word ASC LIMIT 20
    ),
    est AS (
        SELECT h.word, t.true_freq,
               CAST(MIN(s.cnt) AS BIGINT) AS cm_est
        FROM top t
        JOIN hashed h ON h.word = t.word
        JOIN sketch s ON s.j = h.j AND s.bucket = h.bucket
        GROUP BY 1, 2
    )
    SELECT word, true_freq, cm_est,
           CAST(cm_est - true_freq AS BIGINT) AS overestimate,
           CAST(2 * (SELECT n_tokens FROM total) // 256 AS BIGINT)
               AS bound,
           cm_est - true_freq
               <= 2 * (SELECT n_tokens FROM total) // 256
               AS within_bound
    FROM est
"""

# q_ams_f2 (queries_ext.q_ams_f2): 8-row AMS +/-1 sketch of the word
# frequency second moment vs the exact self-join size; sign = parity
# of the first md5 hex digit of 'word:r'; estimator = lower median
# (rank 4 of 8).
EXT_ORACLES["q_ams_f2"] = """
    WITH vocab AS MATERIALIZED (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(trim(text), ' ')) AS word
              FROM documents)
        WHERE word != '' GROUP BY word
    ),
    tf2 AS (SELECT CAST(SUM(freq * freq) AS BIGINT) AS true_f2
            FROM vocab),
    z AS (
        SELECT r.r,
               CAST(SUM(CASE WHEN
                    ((strpos('0123456789abcdef',
                             substr(md5(v.word || ':' ||
                                        CAST(r.r AS VARCHAR)), 1, 1))
                      - 1) % 2) = 0
                    THEN v.freq ELSE -v.freq END) AS BIGINT) AS z
        FROM vocab v, (SELECT UNNEST(range(8)) AS r) r
        GROUP BY 1
    ),
    est AS (
        SELECT r, z, CAST(z * z AS BIGINT) AS est,
               row_number() OVER (ORDER BY z * z ASC, r ASC) AS rn
        FROM z
    ),
    med AS (
        SELECT
            CAST(MAX(CASE WHEN rn = 4 THEN est END) AS BIGINT)
                AS median_est,
            CAST(MIN(est) AS BIGINT) AS min_est,
            CAST(MAX(est) AS BIGINT) AS max_est
        FROM est
    )
    SELECT t.true_f2, m.median_est, m.min_est, m.max_est,
           CAST(abs(m.median_est - t.true_f2) * 1000000 // t.true_f2
                AS BIGINT) AS err_micro
    FROM med m, tf2 t
"""

# q_readability (queries_ext.q_readability): Flesch-Kincaid per
# source; syllables = [aeiouy]+ runs in the lowered text, sentences =
# [.!?]+ runs floored at 1; FK in integer milli with per-term
# truncating division (all ratios positive -> DIV == //).
EXT_ORACLES["q_readability"] = """
    WITH d AS (
        SELECT source,
               len(string_split(trim(text), ' '))::BIGINT AS w,
               GREATEST(CAST(1 AS BIGINT),
                        len(regexp_extract_all(text, '[.!?]+'))::BIGINT)
                   AS s,
               len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
                   AS y
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS n_words,
           CAST(SUM(s) AS BIGINT) AS n_sentences,
           CAST(SUM(y) AS BIGINT) AS n_syllables,
           CAST(SUM(w) * 1000 // SUM(s) AS BIGINT)
               AS words_per_sentence_milli,
           CAST(SUM(y) * 1000 // SUM(w) AS BIGINT)
               AS syllables_per_word_milli,
           CAST(SUM(w) * 390 // SUM(s)
                + SUM(y) * 11800 // SUM(w) - 15590 AS BIGINT)
               AS fk_grade_milli
    FROM d GROUP BY source
"""

# q_compact_plan (queries_ext.q_compact_plan): per-(event_type, day)
# file inventory; files >= 4096 rows pass through, smaller files are
# FFD-packed per event_type — the recursive-CTE FFD replay (the
# q_pack_efficiency machinery) over the BOUNDED inventory.
EXT_ORACLES["q_compact_plan"] = """
    WITH RECURSIVE files AS MATERIALIZED (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                   AS file_id
        FROM events GROUP BY 1, 2
    ),
    small AS MATERIALIZED (
        SELECT event_type, file_id, n_rows,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY n_rows DESC, file_id) AS rk
        FROM files WHERE n_rows < 4096
    ),
    pack AS (
        SELECT event_type, 0::BIGINT AS rk,
               CAST([] AS BIGINT[]) AS bins
        FROM (SELECT DISTINCT event_type FROM small)
        UNION ALL
        SELECT sub.event_type, sub.rk,
               CASE WHEN sub.p IS NULL
                    THEN list_append(sub.bins, sub.n_rows)
                    ELSE sub.bins[1:sub.p - 1]
                         || [sub.bins[sub.p] + sub.n_rows]
                         || sub.bins[sub.p + 1:]
               END
        FROM (
            SELECT s.event_type, s.rk, s.n_rows, pack.bins,
                   (SELECT MIN(u.ord) FROM (
                        SELECT unnest(pack.bins) AS b,
                               generate_subscripts(pack.bins, 1) AS ord
                    ) u WHERE u.b + s.n_rows <= 4096) AS p
            FROM pack JOIN small s
              ON s.event_type = pack.event_type AND s.rk = pack.rk + 1
        ) sub
    ),
    packed AS (
        SELECT p.event_type,
               CAST(len(p.bins) AS BIGINT) AS n_packed_groups,
               CAST(list_sum(p.bins) AS BIGINT) AS rows_rewritten
        FROM pack p
        JOIN (SELECT event_type, MAX(rk) AS mrk FROM pack
              GROUP BY event_type) m
          ON p.event_type = m.event_type AND p.rk = m.mrk
    ),
    inv AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(CASE WHEN n_rows >= 4096 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_large,
               CAST(SUM(n_rows) AS BIGINT) AS total_rows
        FROM files GROUP BY event_type
    )
    SELECT i.event_type, i.n_files,
           CAST(i.n_files - i.n_large AS BIGINT) AS n_small,
           i.n_large, i.total_rows,
           CAST(COALESCE(p.n_packed_groups, 0) AS BIGINT)
               AS n_packed_groups,
           CAST(i.n_large + COALESCE(p.n_packed_groups, 0) AS BIGINT)
               AS n_files_after,
           CAST(COALESCE(p.rows_rewritten, 0) AS BIGINT)
               AS rows_rewritten,
           CASE WHEN p.n_packed_groups IS NULL OR p.n_packed_groups = 0
                THEN CAST(0 AS BIGINT)
                ELSE CAST(p.rows_rewritten * 1000000
                          // (p.n_packed_groups * 4096) AS BIGINT)
           END AS packed_fill_micro
    FROM inv i LEFT JOIN packed p USING (event_type)
"""


# q_graph_modularity (queries_ext.q_graph_modularity): Newman Q of the
# SAME 2-round LP communities (shared _LP_CTES text) over the shared
# pair graph; per-community contribution (4·m·e_c − d_c²)·1e6 over
# 4m² routed through sdiv_expr — a worse-than-chance community is
# NEGATIVE, where Spark DIV truncates and DuckDB // floors.
_MOD_CONTRIB = sdiv_expr(
    "(4 * mm.m * intra_edges - degree_sum * degree_sum) * 1000000",
    "4 * mm.m * mm.m",
    "//",
)
EXT_ORACLES["q_graph_modularity"] = (
    _NEARDUP_CC_CTES
    + _LP_CTES
    + f"""
    , mtot AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pairs),
    bi2 AS (
        SELECT id_a AS u FROM pairs
        UNION ALL SELECT id_b FROM pairs
    ),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
            FROM bi2 GROUP BY u),
    nstat AS (
        SELECT n2.node, n2.label, COALESCE(deg.deg, 0) AS deg
        FROM n2 LEFT JOIN deg ON n2.node = deg.u
    ),
    comm AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(deg) AS BIGINT) AS degree_sum
        FROM nstat GROUP BY label
    ),
    intra AS (
        SELECT la.label, CAST(COUNT(*) AS BIGINT) AS intra_edges
        FROM pairs p
        JOIN n2 la ON p.id_a = la.node
        JOIN n2 lb ON p.id_b = lb.node
        WHERE la.label = lb.label
        GROUP BY la.label
    )
    SELECT c.label, c.n_nodes,
           CAST(c.intra_edges AS BIGINT) AS intra_edges,
           c.degree_sum,
           CAST({_MOD_CONTRIB} AS BIGINT) AS contrib_micro
    FROM (
        SELECT comm.label, comm.n_nodes, comm.degree_sum,
               COALESCE(i.intra_edges, 0) AS intra_edges
        FROM comm LEFT JOIN intra i USING (label)
        WHERE comm.degree_sum > 0
    ) c, mtot mm
"""
)

# q_hll_audit (queries_ext.q_hll_audit): identical md5 32-bit hash,
# top-6-bit register pick, CASE-ladder leading-zero rank (shared
# generated text), dyadic-scaled harmonic sum, staged integer
# divisions in the SAME order, linear-counting table inlined from the
# one Python source.
from telecom_competitor_analysis_spark.plans.queries_ext import (  # noqa: E402
    HLL_ALPHA_MICRO,
    HLL_REGISTERS,
    _hll_lc_table,
    _hll_rho_sql,
)

_HLL_LC = "[" + ", ".join(
    f"CAST({v} AS BIGINT)" for v in _hll_lc_table()
) + "]"
EXT_ORACLES["q_hll_audit"] = f"""
    WITH users AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    hashed AS (
        SELECT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                   ::BIGINT AS h
        FROM users
    ),
    split AS (
        SELECT event_type,
               CAST(h // {1 << 26} AS INT) AS j,
               h % {1 << 26} AS w
        FROM hashed
    ),
    regs AS (
        SELECT event_type, j,
               CAST(MAX({_hll_rho_sql("w")}) AS INT) AS mj
        FROM split GROUP BY 1, 2
    ),
    sums AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_present,
               CAST(SUM(CAST(1 AS BIGINT) << (27 - mj)) AS BIGINT)
                   AS s_present
        FROM regs GROUP BY 1
    ),
    est0 AS (
        SELECT event_type,
               CAST({HLL_REGISTERS} - n_present AS BIGINT) AS n_zero,
               s_present + ({HLL_REGISTERS} - n_present)
                   * (CAST(1 AS BIGINT) << 27) AS s_total
        FROM sums
    ),
    est1 AS (
        SELECT event_type, n_zero,
               CAST({HLL_ALPHA_MICRO}
                    * (CAST({HLL_REGISTERS * HLL_REGISTERS} AS BIGINT)
                       * (CAST(1 AS BIGINT) << 27) // s_total)
                    // 1000000 AS BIGINT) AS est_raw
        FROM est0
    ),
    est2 AS (
        SELECT event_type, n_zero, est_raw,
               CAST(CASE WHEN n_zero > 0
                         AND est_raw * 2 < {5 * HLL_REGISTERS}
                    THEN ({_HLL_LC})[CAST(n_zero AS INT)]
                    ELSE est_raw END AS BIGINT) AS est
        FROM est1
    ),
    exact AS (
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT)
                   AS exact_distinct
        FROM events GROUP BY 1
    )
    SELECT e.event_type, x.exact_distinct, e.n_zero, e.est_raw, e.est,
           CAST(abs(e.est - x.exact_distinct) * 1000000
                // x.exact_distinct AS BIGINT) AS err_micro
    FROM est2 e JOIN exact x USING (event_type)
"""

# q_conformal_coverage (queries_ext.q_conformal_coverage): the q_ece
# composition (classifier + gopher oracles as subqueries), md5-parity
# calibration split, exact conformal order statistic, coverage and
# rejection on the test half.
EXT_ORACLES["q_conformal_coverage"] = f"""
    WITH model AS (
        SELECT doc_id, score_micro
        FROM ({EXT_ORACLES["q_quality_classifier"]})
        WHERE score_micro IS NOT NULL
    ),
    gopher AS (
        SELECT doc_id, passes FROM ({EXT_ORACLES["q_gopher_rules"]})
    ),
    scored AS MATERIALIZED (
        SELECT m.doc_id, m.score_micro, g.passes,
               ((strpos('0123456789abcdef',
                        substr(md5(CAST(m.doc_id AS VARCHAR)), 1, 1))
                 - 1) % 2) = 0 AS is_cal
        FROM model m JOIN gopher g USING (doc_id)
    ),
    cal_good AS (
        SELECT score_micro, doc_id,
               row_number() OVER (ORDER BY score_micro ASC, doc_id ASC)
                   AS rn
        FROM scored WHERE is_cal AND passes
    ),
    nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal_good),
    thr AS (
        SELECT cg.score_micro AS threshold_micro, nc.n_cal
        FROM cal_good cg, nc
        WHERE cg.rn = (1000000 - 900000) * (nc.n_cal + 1) // 1000000
    )
    SELECT t.threshold_micro, t.n_cal,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN s.passes THEN 1 ELSE 0 END) AS BIGINT)
               AS n_test_good,
           CAST(SUM(CASE WHEN s.passes AND s.score_micro >=
                    t.threshold_micro THEN 1 ELSE 0 END) * 1000000
                // SUM(CASE WHEN s.passes THEN 1 ELSE 0 END) AS BIGINT)
               AS coverage_micro,
           CAST(SUM(CASE WHEN NOT s.passes AND s.score_micro <
                    t.threshold_micro THEN 1 ELSE 0 END) * 1000000
                // GREATEST(SUM(CASE WHEN NOT s.passes THEN 1 ELSE 0
                    END), 1) AS BIGINT) AS rejection_micro,
           CAST(900000 AS BIGINT) AS target_micro
    FROM scored s, thr t
    WHERE NOT s.is_cal
    GROUP BY t.threshold_micro, t.n_cal
"""

# q_temporal_split (queries_ext.q_temporal_split): 80%-of-day-range
# cut, per-(type, user) side collapse, spanning-user leakage rate.
EXT_ORACLES["q_temporal_split"] = """
    WITH e AS (
        SELECT event_type, user_id, CAST(ts AS DATE) AS d FROM events
    ),
    bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM e),
    sided AS (
        SELECT event_type, user_id,
               e.d < b.d0 + CAST(date_diff('day', b.d0, b.d1) * 4 // 5
                                 AS INT) AS is_train
        FROM e, bounds b
    ),
    per_user AS (
        SELECT event_type, user_id,
               MAX(CASE WHEN is_train THEN 1 ELSE 0 END) AS in_train,
               MAX(CASE WHEN is_train THEN 0 ELSE 1 END) AS in_test,
               CAST(SUM(CASE WHEN is_train THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_train_rows,
               CAST(SUM(CASE WHEN is_train THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_test_rows
        FROM sided GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(SUM(n_train_rows) AS BIGINT) AS train_rows,
           CAST(SUM(n_test_rows) AS BIGINT) AS test_rows,
           CAST(SUM(in_train) AS BIGINT) AS train_users,
           CAST(SUM(in_test) AS BIGINT) AS test_users,
           CAST(SUM(in_train * in_test) AS BIGINT) AS spanning_users,
           CAST(SUM(in_train * in_test) * 1000000
                // GREATEST(SUM(in_test), 1) AS BIGINT) AS leak_micro
    FROM per_user GROUP BY event_type
"""


# q_lang_confusion (queries_ext.q_lang_confusion): the q_lang_id
# heuristic scored against the declared lang labels; row-normalized
# micro over each declared language's total.
EXT_ORACLES["q_lang_confusion"] = """
    WITH scored AS (
        SELECT lang,
               len(list_filter(string_split(lower(text), ' '),
                   w -> w IN ('the','and','of','is'))) AS en,
               len(list_filter(string_split(lower(text), ' '),
                   w -> w IN ('el','la','de','que'))) AS es,
               len(list_filter(string_split(lower(text), ' '),
                   w -> w IN ('der','die','und','das'))) AS de
        FROM documents
    ),
    pred AS (
        SELECT lang,
               CASE
                   WHEN en >= es AND en >= de AND en > 0 THEN 'en'
                   WHEN es >= de AND es > 0 THEN 'es'
                   WHEN de > 0 THEN 'de'
                   ELSE 'unknown'
               END AS pred_lang
        FROM scored
    ),
    cells AS (
        SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pred GROUP BY 1, 2
    )
    SELECT lang, pred_lang, n_docs,
           CAST(n_docs * 1000000 //
                SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT)
               AS row_micro,
           lang = pred_lang AS is_match
    FROM cells
"""

# q_quantile_sketch_audit (queries_ext.q_quantile_sketch_audit):
# 256-bin equi-width histogram; interpolated estimate vs the exact
# k-th order statistic (k = 1 + p·(n−1) // 100, lower order stat),
# exact side via the same two-pass bin localization.
EXT_ORACLES["q_quantile_sketch_audit"] = """
    WITH o AS MATERIALIZED (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders
    ),
    bounds AS (
        SELECT MIN(cents) AS lo, MAX(cents) AS hi,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM o
    ),
    binned AS MATERIALIZED (
        SELECT o.o_orderkey, o.cents,
               CAST(LEAST(255, (o.cents - b.lo) * 256
                          // (b.hi - b.lo + 1)) AS INT) AS bin
        FROM o, bounds b
    ),
    hist AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt,
               MIN(cents) AS bin_min, MAX(cents) AS bin_max
        FROM binned GROUP BY bin
    ),
    cum AS (
        SELECT bin, cnt, bin_min, bin_max,
               SUM(cnt) OVER (ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) - cnt
                   AS cum_before
        FROM hist
    ),
    targets AS (
        SELECT p.p, 1 + p.p * (b.n - 1) // 100 AS k,
               c.bin, c.cnt, c.cum_before, c.bin_min, c.bin_max
        FROM (SELECT UNNEST([25, 50, 75, 90, 99]) AS p) p,
             bounds b
        JOIN cum c
          ON c.cum_before < 1 + p.p * (b.n - 1) // 100
         AND c.cum_before + c.cnt >= 1 + p.p * (b.n - 1) // 100
    ),
    exact AS (
        SELECT t.p, r.cents AS exact_cents
        FROM targets t
        JOIN (
            SELECT bin, cents,
                   row_number() OVER (PARTITION BY bin
                                      ORDER BY cents, o_orderkey) AS rn
            FROM binned
            WHERE bin IN (SELECT bin FROM targets)
        ) r ON r.bin = t.bin AND r.rn = t.k - t.cum_before
    ),
    est AS (
        SELECT p,
               CAST(bin_min + (bin_max - bin_min)
                    * (k - cum_before - 1)
                    // GREATEST(cnt - 1, 1) AS BIGINT) AS est_cents
        FROM targets
    )
    SELECT CAST(e.p AS INT) AS p, x.exact_cents, e.est_cents,
           CAST(e.est_cents - x.exact_cents AS BIGINT) AS err_cents,
           CAST(abs(e.est_cents - x.exact_cents) * 1000000
                // x.exact_cents AS BIGINT) AS err_micro
    FROM est e JOIN exact x USING (p)
"""

# q_aa_calibration (queries_ext.q_aa_calibration): md5-parity A/A
# split, per-user purchase conversion, 2×2 chi-square with the SAME
# staged integer divisions (the signed determinant stage through
# sdiv_expr).
_AA_DET_R1 = sdiv_expr("(a * d - b * c) * 1000", "a + b", "//")
_AA_CHI_B = sdiv_expr(f"({_AA_DET_R1}) * (a * d - b * c)", "c + d", "//")
EXT_ORACLES["q_aa_calibration"] = f"""
    WITH spend AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 100, 0) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS vc
        FROM events GROUP BY user_id
    ),
    tot AS (
        SELECT CAST(SUM(vc) AS BIGINT) AS total_vc,
               CAST(COUNT(*) AS BIGINT) AS n_u
        FROM spend
    ),
    per_user AS (
        SELECT s.user_id,
               CASE WHEN s.vc * t.n_u > t.total_vc
                    THEN 1 ELSE 0 END AS converted,
               ((strpos('0123456789abcdef',
                        substr(md5(CAST(s.user_id AS VARCHAR)), 1, 1))
                 - 1) % 2) = 0 AS arm_a
        FROM spend s, tot t
    ),
    cells AS (
        SELECT
            CAST(SUM(CASE WHEN arm_a AND converted = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS a,
            CAST(SUM(CASE WHEN arm_a AND converted = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS b,
            CAST(SUM(CASE WHEN NOT arm_a AND converted = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS c,
            CAST(SUM(CASE WHEN NOT arm_a AND converted = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM per_user
    )
    SELECT a, b, c, d,
           CAST(a + b + c + d AS BIGINT) AS n_users,
           CAST(({_AA_CHI_B}) * (a + b + c + d) * 1000
                // ((a + c) * (b + d)) AS BIGINT) AS chi2_micro,
           CAST(({_AA_CHI_B}) * (a + b + c + d) * 1000
                // ((a + c) * (b + d)) AS BIGINT) > 3841000
               AS significant
    FROM cells
"""


# q_cluster_chaining (queries_ext.q_cluster_chaining): per multi-node
# CC cluster, LSH edge count vs the complete graph — the transitive
# chaining audit. Reuses the shared CC chain.
EXT_ORACLES["q_cluster_chaining"] = (
    _NEARDUP_CC_CTES
    + """
    , lab AS MATERIALIZED (
        SELECT id, MIN(label) AS cluster_id FROM cc GROUP BY id
    ),
    clus AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM lab GROUP BY 1 HAVING COUNT(*) >= 2
    ),
    edgec AS (
        SELECT la.cluster_id, CAST(COUNT(*) AS BIGINT) AS n_edges
        FROM pairs p JOIN lab la ON p.id_a = la.id
        GROUP BY 1
    )
    SELECT c.cluster_id, c.n_nodes,
           CAST(COALESCE(e.n_edges, 0) AS BIGINT) AS n_edges,
           CAST(c.n_nodes * (c.n_nodes - 1) // 2 AS BIGINT)
               AS possible_pairs,
           CAST(COALESCE(e.n_edges, 0) * 2000000
                // (c.n_nodes * (c.n_nodes - 1)) AS BIGINT)
               AS density_micro,
           COALESCE(e.n_edges, 0) * 2 < c.n_nodes * (c.n_nodes - 1)
               AS chained
    FROM clus c LEFT JOIN edgec e USING (cluster_id)
"""
)

# q_hll_merge (queries_ext.q_hll_merge): register-wise max merge of
# two md5-digit-2 halves vs the single-pass registers — identical by
# the max-merge algebra; same hash/rho chain as q_hll_audit.
EXT_ORACLES["q_hll_merge"] = f"""
    WITH users AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    hashed AS (
        SELECT event_type,
               ((strpos('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR)), 2, 1))
                 - 1) % 2) AS half,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                   ::BIGINT AS h
        FROM users
    ),
    split AS (
        SELECT event_type, half,
               CAST(h // {1 << 26} AS INT) AS j,
               h % {1 << 26} AS w
        FROM hashed
    ),
    rho AS MATERIALIZED (
        SELECT event_type, half, j,
               {_hll_rho_sql("w")} AS rho
        FROM split
    ),
    whole AS (
        SELECT event_type, j, CAST(MAX(rho) AS INT) AS mj_whole
        FROM rho GROUP BY 1, 2
    ),
    merged AS (
        SELECT event_type, j, CAST(MAX(mj_half) AS INT) AS mj_merged
        FROM (SELECT event_type, half, j,
                     CAST(MAX(rho) AS INT) AS mj_half
              FROM rho GROUP BY 1, 2, 3)
        GROUP BY 1, 2
    )
    SELECT w.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_registers,
           CAST(SUM(CASE WHEN w.mj_whole != m.mj_merged
                    THEN 1 ELSE 0 END) AS BIGINT)
               AS register_mismatches,
           SUM(CAST(1 AS BIGINT) << (27 - w.mj_whole))
               = SUM(CAST(1 AS BIGINT) << (27 - m.mj_merged))
               AS estimates_equal
    FROM whole w JOIN merged m USING (event_type, j)
    GROUP BY w.event_type
"""

# q_dp_mean (queries_ext.q_dp_mean): symmetric clip at +/-C, Laplace
# (2C/eps) from the shared table source, released mean through
# sdiv_expr (balances AND noise are signed).
from telecom_competitor_analysis_spark.plans.queries_ext import (  # noqa: E402
    DP_MEAN_CLIP_CENTS,
)

_DPM_TABLE = "[" + ", ".join(
    f"CAST({v} AS BIGINT)"
    for v in _laplace_micro_table(
        DP_EPSILON_MICRO, DP_NOISE_LEVELS, 2 * DP_MEAN_CLIP_CENTS
    )
) + "]"
_DPM_MEAN = sdiv_expr(
    "(clipped_sum_cents * 1000000 + noise_microcents)",
    "n_customers",
    "//",
)
EXT_ORACLES["q_dp_mean"] = f"""
    WITH agg AS (
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(GREATEST(CAST(-{DP_MEAN_CLIP_CENTS} AS BIGINT),
                        LEAST(CAST({DP_MEAN_CLIP_CENTS} AS BIGINT),
                              CAST(round(c_acctbal * 100, 0)
                                   AS BIGINT)))) AS BIGINT)
                   AS clipped_sum_cents
        FROM customer GROUP BY 1
    ),
    noised AS (
        SELECT *,
               (((strpos('0123456789abcdef',
                         substr(md5('mean:' || c_mktsegment), 1, 1))
                  - 1) * 16
                 + strpos('0123456789abcdef',
                          substr(md5('mean:' || c_mktsegment), 2, 1))
                 - 1) // {256 // DP_NOISE_LEVELS}) AS bucket
        FROM agg
    ),
    withn AS (
        SELECT c_mktsegment, n_customers, clipped_sum_cents,
               ({_DPM_TABLE})[bucket + 1] AS noise_microcents
        FROM noised
    )
    SELECT c_mktsegment, n_customers, clipped_sum_cents,
           noise_microcents,
           CAST(clipped_sum_cents * 1000000 + noise_microcents
                AS BIGINT) AS released_sum_microcents,
           CAST({_DPM_MEAN} AS BIGINT) AS released_mean_microcents,
           CAST({DP_EPSILON_MICRO} AS BIGINT) AS epsilon_micro,
           CAST({2 * DP_MEAN_CLIP_CENTS} AS BIGINT)
               AS sensitivity_cents
    FROM withn
"""

# q_event_trigrams (queries_ext.q_event_trigrams): two leads over one
# per-user window, bounded trigram aggregate, top-20 with reach.
EXT_ORACLES["q_event_trigrams"] = """
    WITH tri AS (
        SELECT user_id,
               event_type || '>' ||
               lead(event_type, 1) OVER w || '>' ||
               lead(event_type, 2) OVER w AS trigram,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts ASC, event_id ASC)
    ),
    counts AS (
        SELECT trigram,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM tri WHERE e3 IS NOT NULL
        GROUP BY trigram
    )
    SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC,
                                   trigram ASC) AS INT) AS rank,
           trigram, n_occurrences, n_users
    FROM counts
    ORDER BY n_occurrences DESC, trigram ASC
    LIMIT 20
"""


# q_keeper_policy_diff (queries_ext.q_keeper_policy_diff): per CC
# cluster, keepers under min-id / longest / best-score; arg_max via
# the lpad-string composite (the _LP_CTES convention) so the (value
# desc, id asc) tie order is identical to Spark's max_by(struct).
EXT_ORACLES["q_keeper_policy_diff"] = (
    _NEARDUP_CC_CTES
    + """
    , lab AS MATERIALIZED (
        SELECT id, MIN(label) AS cluster_id FROM cc GROUP BY id
    ),
    nw AS (
        SELECT doc_id AS id,
               len(string_split(trim(text), ' '))::BIGINT AS nw
        FROM documents
    ),
    score AS (
        SELECT doc_id AS id, score_micro
        FROM (""" + EXT_ORACLES["q_quality_classifier"] + """)
    ),
    j AS (
        SELECT lab.cluster_id, lab.id, nw.nw, score.score_micro
        FROM lab JOIN nw USING (id) JOIN score USING (id)
    ),
    per AS (
        SELECT cluster_id,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(MIN(id) AS BIGINT) AS keep_minid,
               CAST(arg_max(id,
                    lpad(CAST(nw AS VARCHAR), 10, '0') || '|'
                    || lpad(CAST(999999999999 - id AS VARCHAR), 12,
                            '0')) AS BIGINT) AS keep_longest,
               CAST(arg_max(id,
                    lpad(CAST(score_micro + 100000000 AS VARCHAR), 12,
                         '0') || '|'
                    || lpad(CAST(999999999999 - id AS VARCHAR), 12,
                            '0')) AS BIGINT) AS keep_quality
        FROM j GROUP BY cluster_id
    )
    SELECT cluster_id, n_members, keep_minid, keep_longest,
           keep_quality,
           keep_longest != keep_minid AS longest_differs,
           keep_quality != keep_minid AS quality_differs
    FROM per WHERE n_members >= 2
"""
)

# q_salt_plan (queries_ext.q_salt_plan): hot keys over the 2048-row
# budget with ceil salt factors and the resulting per-salt bound.
EXT_ORACLES["q_salt_plan"] = """
    WITH counts AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY 1
    )
    SELECT l_partkey, n_rows,
           CAST((n_rows + 2047) // 2048 AS BIGINT) AS salt_factor,
           CAST((n_rows + (n_rows + 2047) // 2048 - 1)
                // ((n_rows + 2047) // 2048) AS BIGINT)
               AS max_rows_per_salt,
           CAST(2048 AS BIGINT) AS target_rows
    FROM counts WHERE n_rows > 2048
"""

# q_coverage_curve (queries_ext.q_coverage_curve): held-out bigram
# coverage at nested train fractions; ONE per-gram min-train-bucket
# aggregate serves all three points.
EXT_ORACLES["q_coverage_curve"] = """
    WITH ws AS (
        SELECT (((strpos('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                 + strpos('0123456789abcdef',
                   substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
                % 100) AS bucket,
               string_split(trim(text), ' ') AS arr
        FROM documents
    ),
    grams AS MATERIALIZED (
        SELECT bucket, arr[i] || ' ' || arr[i + 1] AS gram
        FROM ws, unnest(generate_series(1, len(arr) - 1)) g(i)
        WHERE len(arr) >= 2
    ),
    train_min AS (
        SELECT gram, CAST(MIN(bucket) AS INT) AS tmin
        FROM grams WHERE bucket < 90 GROUP BY gram
    ),
    test_grams AS (
        SELECT DISTINCT gram FROM grams WHERE bucket >= 90
    ),
    jt AS (
        SELECT t.gram, tm.tmin
        FROM test_grams t LEFT JOIN train_min tm USING (gram)
    )
    SELECT CAST(f.f AS INT) AS f,
           CAST(COUNT(*) AS BIGINT) AS test_grams,
           CAST(SUM(CASE WHEN jt.tmin < f.f THEN 1 ELSE 0 END)
                AS BIGINT) AS covered,
           CAST(SUM(CASE WHEN jt.tmin < f.f THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS coverage_micro
    FROM jt, (SELECT UNNEST([25, 50, 75]) AS f) f
    GROUP BY f.f
"""


# q_reshard_stability (queries_ext.q_reshard_stability): HRW argmax
# over md5(key:shard) hex strings for n=8 and n=9 in one pass (NULL
# ordering values are skipped by BOTH engines' arg_max/max_by — the
# n=8 leg nulls out shard 8); modulo leg is plain pmod drift.
EXT_ORACLES["q_reshard_stability"] = """
    WITH keys AS (SELECT DISTINCT user_id FROM events),
    scored AS (
        SELECT user_id, s.s,
               md5(CAST(user_id AS VARCHAR) || ':' ||
                   CAST(s.s AS VARCHAR)) AS h
        FROM keys, (SELECT UNNEST(range(9)) AS s) s
    ),
    hrw AS (
        SELECT user_id,
               arg_max(s, CASE WHEN s < 8 THEN h END) AS hrw8,
               arg_max(s, h) AS hrw9
        FROM scored GROUP BY user_id
    ),
    per_key AS (
        SELECT user_id,
               CASE WHEN hrw8 != hrw9 THEN 1 ELSE 0 END AS hrw_moved,
               CASE WHEN user_id % 8 != user_id % 9
                    THEN 1 ELSE 0 END AS mod_moved
        FROM hrw
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(mod_moved) AS BIGINT) AS mod_moved,
               CAST(SUM(hrw_moved) AS BIGINT) AS hrw_moved
        FROM per_key
    )
    SELECT 'modulo' AS strategy, n_keys,
           mod_moved AS n_moved,
           CAST(mod_moved * 1000000 // n_keys AS BIGINT) AS moved_micro
    FROM agg
    UNION ALL
    SELECT 'rendezvous', n_keys, hrw_moved,
           CAST(hrw_moved * 1000000 // n_keys AS BIGINT)
    FROM agg
"""

# q_table_checksum (queries_ext.q_table_checksum): 32-bit md5 row
# digest summed per day + the '__TOTAL__' rollup row (sum of sums —
# identical to a direct whole-table pass by associativity).
EXT_ORACLES["q_table_checksum"] = """
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               ('0x' || substr(md5(CAST(event_id AS VARCHAR) || '|' ||
                    event_type || '|' ||
                    CAST(CAST(round(value * 100, 0) AS BIGINT)
                         AS VARCHAR)), 1, 8))::BIGINT AS dg
        FROM events
    ),
    days AS (
        SELECT strftime(day, '%Y-%m-%d') AS day_str,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(dg) AS BIGINT) AS checksum
        FROM d GROUP BY day
    )
    SELECT day_str, n_rows, checksum FROM days
    UNION ALL
    SELECT '__TOTAL__',
           CAST(SUM(n_rows) AS BIGINT),
           CAST(SUM(checksum) AS BIGINT)
    FROM days
"""
