"""DuckDB oracle SQL for every query in plans/queries.py.

Each string is ANSI-ish SQL DuckDB runs over the pre-registered testdata
views (region nation customer supplier part orders lineitem events
documents embeddings). Column aliases MUST match the Spark query exactly —
the driver sorts columns by name before hashing values.

DuckDB/Spark parity conventions (SURVEY.md §7.3): timestamps formatted via
strftime ↔ date_format; money as integer cents; DuckDB SUM(BIGINT) returns
HUGEINT so every sum is cast back to BIGINT; rankings carry unique
tie-breakers in identical directions.
"""

from __future__ import annotations

ORACLES: dict[str, str] = {
    # F1 — semantic oracle: the speed string is synthesized from p_size
    # (odd→gbps ×1000, even→mbps), so the expected Mbps is computable
    # directly.
    "q_convert_speed": """
        SELECT
            p_partkey,
            p_size::VARCHAR || (CASE WHEN p_size % 2 = 0 THEN 'mbps' ELSE 'gbps' END)
                AS speed_str,
            (CASE WHEN p_size % 2 = 0 THEN p_size ELSE p_size * 1000 END)::DOUBLE
                AS speed_mbps
        FROM part
    """,
    "q_sentinel_map": """
        SELECT
            event_id,
            event_type,
            CASE WHEN event_type = 'error' THEN -1.0 ELSE value END AS mapped_value
        FROM events
    """,
    "q_regex_extract": """
        SELECT
            event_id,
            COALESCE(TRY_CAST(NULLIF(regexp_extract(props, '(\\d+)', 1), '') AS DOUBLE), -1.0)
                AS extracted
        FROM events
    """,
    "q_digits_only": """
        SELECT
            p_partkey,
            TRY_CAST(NULLIF(regexp_replace(p_brand, '[^0-9]', '', 'g'), '') AS BIGINT)
                AS brand_num
        FROM part
    """,
    "q_ascii_strip": r"""
        SELECT
            doc_id,
            regexp_replace(text, '[^\x00-\x7F]', '', 'g') AS text_ascii
        FROM documents
    """,
    "q_string_clean": """
        SELECT
            c_custkey,
            replace(lower(trim(c_name)), 'customer#', '') AS cleaned_name
        FROM customer
    """,
    "q_concat_key": """
        SELECT
            p_partkey,
            concat_ws('_', p_brand, p_type, p_size::VARCHAR) AS part_key
        FROM part
    """,
    "q_date_stamp": """
        SELECT
            o_orderkey,
            strftime(o_orderdate, '%Y-%m') AS order_month,
            strftime(o_orderdate, '%Y-%m-%d') AS order_day
        FROM orders
    """,
    "q_surrogate_key": """
        SELECT
            s_suppkey,
            sha256(concat_ws('|', s_name, s_nationkey::VARCHAR)) AS skey
        FROM supplier
    """,
    "q_filter_contains": """
        SELECT p_partkey, p_name
        FROM part
        WHERE p_name LIKE '%widget%'
    """,
    "q_validate": """
        SELECT
            COUNT(*) AS n_rows,
            CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS null_orderkey,
            CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS null_custkey,
            CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS null_orderdate
        FROM orders
    """,
    "q_star_split": """
        WITH keyed AS (
            SELECT
                l_orderkey,
                l_linenumber,
                sha256(concat_ws('|',
                    l_partkey::VARCHAR,
                    l_suppkey::VARCHAR,
                    (l_quantity::INT)::VARCHAR)) AS feature_uuid,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
                strftime(l_shipdate, '%Y-%m-%d') AS ship_day
            FROM lineitem
        )
        SELECT
            l_orderkey,
            l_linenumber,
            feature_uuid,
            sha256(concat_ws('|', feature_uuid, price_cents::VARCHAR, ship_day))
                AS price_uuid,
            price_cents,
            ship_day
        FROM keyed
    """,
    "q_pack_cross": """
        SELECT
            concat_ws('_', m.s_name, i.r_name) AS pack_name,
            CAST(round(m.s_acctbal * 100) AS BIGINT)
                + i.r_regionkey::BIGINT * 1000 - 500 AS price_cents
        FROM supplier m CROSS JOIN region i
    """,
    "q_antijoin_new": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        )
    """,
    "q_lookup_join": """
        SELECT
            l.l_orderkey,
            l.l_linenumber,
            l.l_partkey,
            COALESCE(p.p_brand, 'unknown') AS brand
        FROM lineitem l
        LEFT JOIN part p ON p.p_partkey = l.l_partkey
    """,
    "q_scd_detect": """
        WITH ranked AS (
            SELECT
                user_id,
                value,
                row_number() OVER (
                    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ) AS rn_first,
                row_number() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                ) AS rn_last
            FROM events
        )
        SELECT
            f.user_id,
            f.value AS baseline_value,
            l.value AS latest_value,
            (l.value IS DISTINCT FROM f.value) AS changed
        FROM (SELECT user_id, value FROM ranked WHERE rn_first = 1) f
        JOIN (SELECT user_id, value FROM ranked WHERE rn_last = 1) l
          USING (user_id)
    """,
    "q_first_per_key": """
        WITH ranked AS (
            SELECT
                user_id, event_id, ts, event_type, value,
                row_number() OVER (
                    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ) AS rn
            FROM events
        )
        SELECT
            user_id,
            event_id,
            strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts,
            event_type,
            value
        FROM ranked WHERE rn = 1
    """,
    "q_topk": """
        SELECT
            o_orderkey,
            CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
            strftime(o_orderdate, '%Y-%m-%d') AS order_day
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
    """,
    "q_union_all": """
        SELECT o_orderkey, o_orderstatus,
               CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents
        FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT o_orderkey, o_orderstatus,
               CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents
        FROM orders WHERE o_orderstatus = 'F'
    """,
    "q_agg_latest_price": """
        WITH latest AS (
            SELECT
                l_partkey,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
                row_number() OVER (
                    PARTITION BY l_partkey
                    ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC
                ) AS rn
            FROM lineitem
        )
        SELECT
            p.p_brand,
            COUNT(*) AS n_parts,
            CAST(SUM(l.price_cents) AS BIGINT) AS sum_price_cents,
            MAX(l.price_cents) AS max_price_cents,
            CAST(SUM(l.price_cents) AS DOUBLE) / COUNT(*) / 100.0 AS avg_price
        FROM (SELECT l_partkey, price_cents FROM latest WHERE rn = 1) l
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand
    """,
    "q_tumbling_window": """
        SELECT
            strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
            COUNT(*) AS n_events,
            COUNT(DISTINCT user_id) AS n_users,
            MIN(value) AS min_value,
            MAX(value) AS max_value
        FROM events
        GROUP BY 1
    """,
    "q_hopping_window": """
        -- each event belongs to the two 6h-aligned window starts
        -- [floor6h(ts) - 6h, floor6h(ts)]; both always contain ts for a
        -- 12h window, mirroring Spark's epoch-aligned F.window(12h, 6h)
        WITH expanded AS (
            SELECT
                time_bucket(INTERVAL '6 hours', ts)
                    - k * INTERVAL '6 hours' AS window_start,
                user_id,
                value
            FROM events, unnest([0, 1]) AS t(k)
        )
        SELECT
            strftime(window_start, '%Y-%m-%d %H:%M') AS window_start,
            COUNT(*) AS n_events,
            COUNT(DISTINCT user_id) AS n_users,
            MIN(value) AS min_value,
            MAX(value) AS max_value
        FROM expanded
        GROUP BY 1
    """,
    "q_json_unwrap": """
        SELECT
            event_id,
            TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
    "q_window_rank": """
        SELECT
            user_id,
            event_id,
            row_number() OVER w AS rn,
            lag(value) OVER w AS prev_value,
            lead(value) OVER w AS next_value,
            rank() OVER (PARTITION BY user_id ORDER BY value DESC) AS value_rank,
            max(value) OVER (
                PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS running_max
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    "q_rollup": """
        SELECT
            o_orderstatus,
            o_orderpriority,
            COUNT(*) AS n_orders,
            CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                AS sum_totalprice_cents
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "q_cube": """
        SELECT
            l_returnflag,
            l_linestatus,
            COUNT(*) AS n_items,
            CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "q_pivot": """
        SELECT
            user_id,
            CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
            CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
            CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
            CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
            CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
        FROM events
        GROUP BY user_id
    """,
    "q_unpivot": """
        SELECT l_orderkey, l_linenumber,
               'l_quantity' AS metric, l_quantity AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber,
               'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
    "q_semi_join": """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "q_except": """
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
    "q_intersect": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "q_distinct_agg": """
        SELECT
            o_orderpriority,
            COUNT(*) AS n_orders,
            COUNT(DISTINCT o_custkey) AS n_customers
        FROM orders
        GROUP BY o_orderpriority
    """,
    "q_asof_join": """
        WITH purchases AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        ),
        clicks_ranked AS (
            SELECT
                user_id, ts,
                event_id AS click_event_id,
                value AS click_value,
                row_number() OVER (
                    PARTITION BY user_id, ts ORDER BY event_id DESC
                ) AS rn
            FROM events WHERE event_type = 'click'
        ),
        clicks AS (
            SELECT user_id, ts, click_event_id, click_value
            FROM clicks_ranked WHERE rn = 1
        )
        SELECT
            p.event_id,
            p.user_id,
            strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
            c.click_event_id AS last_click_event_id,
            c.click_value AS last_click_value
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "q_explode": """
        SELECT word, COUNT(*) AS n_occurrences
        FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        )
        GROUP BY word
    """,
    "q_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS sum_totalprice_cents
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "q_outer_join": """
        WITH c AS (
            SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
            FROM customer GROUP BY 1
        ),
        s AS (
            SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
            FROM supplier GROUP BY 1
        )
        SELECT
            COALESCE(c.nationkey, s.nationkey) AS nationkey,
            COALESCE(c.n_customers, 0) AS n_customers,
            COALESCE(s.n_suppliers, 0) AS n_suppliers
        FROM c FULL OUTER JOIN s USING (nationkey)
    """,
    "q_date_arith": """
        SELECT
            o_orderkey,
            strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS deadline,
            CAST(year(o_orderdate) AS BIGINT) AS order_year,
            CAST(month(o_orderdate) AS BIGINT) AS order_month_num,
            CAST(datediff('day', DATE '1995-01-01', o_orderdate::DATE) AS BIGINT)
                AS days_since_1995
        FROM orders
    """,
    "q_max_by": """
        WITH ranked AS (
            SELECT
                event_type, event_id, value,
                row_number() OVER (
                    PARTITION BY event_type
                    ORDER BY value DESC, event_id DESC
                ) AS rn,
                MAX(value) OVER (PARTITION BY event_type) AS max_value
            FROM events
        )
        SELECT event_type, event_id AS top_event_id, max_value
        FROM ranked WHERE rn = 1
    """,
    "q_revenue_topk": """
        SELECT
            l.l_orderkey AS o_orderkey,
            strftime(o.o_orderdate, '%Y-%m-%d') AS order_day,
            CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                          AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d')
        ORDER BY revenue_cents DESC, o_orderkey ASC
        LIMIT 10
    """,
    "q_udtf_tokenize": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS arr FROM documents
        )
        SELECT
            doc_id,
            arr[i] AS word,
            CAST(i - 1 AS BIGINT) AS pos
        FROM t, unnest(generate_series(1, len(arr))) AS g(i)
    """,
    "q_map_funcs": """
        SELECT
            event_id,
            array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
            CAST(len(json_keys(props)) AS BIGINT) AS n_props,
            TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
        FROM events
    """,
    "q_salted_join": """
        SELECT
            p.p_brand,
            COUNT(*) AS n_items,
            CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                AS sum_price_cents
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand
    """,
    "q_histogram": """
        SELECT
            CAST(floor(value / 50) AS BIGINT) AS bucket,
            COUNT(*) AS n
        FROM events
        GROUP BY 1
    """,
    "q_array_funcs": """
        SELECT
            doc_id,
            array_to_string(string_split(text, ' ')[1:3], ' ') AS first3,
            list_contains(string_split(text, ' '), 'the') AS has_the,
            CAST(COALESCE(list_position(string_split(text, ' '), 'spark'), 0)
                 AS BIGINT) AS spark_pos,
            CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                AS n_distinct
        FROM documents
    """,
    "q_scalar_subquery": """
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents
        FROM orders
        WHERE CAST(round(o_totalprice * 100) AS BIGINT) > (
            SELECT CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / COUNT(*)
            FROM orders
        )
    """,
    "q_ntile": """
        SELECT o_orderkey, o_orderpriority,
               CAST(ntile(4) OVER w AS INT) AS price_quartile,
               percent_rank() OVER w AS price_pct_rank,
               cume_dist() OVER w AS price_cume_dist
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
    "q_except_all": """
        WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
        s AS (SELECT s_nationkey AS nationkey FROM supplier),
        u AS (
            SELECT 'except_all' AS op, nationkey FROM
                (SELECT nationkey FROM c EXCEPT ALL SELECT nationkey FROM s)
            UNION ALL
            SELECT 'intersect_all' AS op, nationkey FROM
                (SELECT nationkey FROM c INTERSECT ALL SELECT nationkey FROM s)
        )
        SELECT op, nationkey, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM u GROUP BY op, nationkey
    """,
    "q_scd2_history": """
        SELECT l_partkey, l_orderkey, l_linenumber,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
               strftime(l_shipdate, '%Y-%m-%d') AS valid_from,
               strftime(lead(l_shipdate) OVER w, '%Y-%m-%d') AS valid_to,
               lead(l_shipdate) OVER w IS NULL AS is_current
        FROM lineitem
        WINDOW w AS (PARTITION BY l_partkey
                     ORDER BY l_shipdate ASC, l_orderkey ASC,
                              l_linenumber ASC)
    """,
    "q_stats_agg": """
        SELECT
            l_returnflag,
            CAST(COUNT(*) AS BIGINT) AS n_rows,
            round(stddev_samp(l_quantity), 6) AS stddev_qty,
            round(var_samp(l_quantity), 6) AS var_qty,
            round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
            round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc
        FROM lineitem
        GROUP BY l_returnflag
    """,
}

from telecom_competitor_analysis_spark.plans.oracles_ext import EXT_ORACLES  # noqa: E402

ORACLES.update(EXT_ORACLES)

# q_pivot_dynamic — the discovered value list at any SF is F/O/P (the
# Spark side discovers it with a distinct scan; SQL states it).
ORACLES["q_pivot_dynamic"] = """
    SELECT
        o_orderpriority,
        CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS "F",
        CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS "O",
        CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS "P"
    FROM orders
    GROUP BY o_orderpriority
"""

# q_cogroup_asof — the cogrouped merge_asof plan must equal the JVM
# union+window asof plan, so it shares q_asof_join's DuckDB ASOF oracle.
ORACLES["q_cogroup_asof"] = ORACLES["q_asof_join"]

# q_lateral_topk — same LATERAL correlated subquery in DuckDB.
ORACLES["q_lateral_topk"] = """
    SELECT c.c_custkey, t.o_orderkey, t.price_cents
    FROM customer c,
    LATERAL (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100.0, 0) AS BIGINT)
                   AS price_cents
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 2
    ) t
"""
