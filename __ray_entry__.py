"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` anywhere down this import tree.

``queries()`` maps operator names (SURVEY.md §2 inventory + the
training-data surface) to callables over an sf_dir; ``oracle_sql()``
holds the DuckDB equivalents where the op is SQL-expressible
(column names match exactly; re-associated float aggregates are
rounded identically on both sides).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from cs_insights_crawler_ray.pipelines import (
    ann, crawl_queries, dedup, multimodal_queries, relational as R, textops)


def entry() -> Any:
    """Flagship pipeline on sf0.001 (smoke): the relational core's
    grouped-aggregate over lineitem. The crawl engine has its own
    driver (pipelines/crawl.py) exercised via queries() and tests."""
    return R.q01_pricing_summary("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # -- relational core (reference semantics, SURVEY.md §2) ----
        "q01_pricing_summary": R.q01_pricing_summary,
        "q02_timestamp_filter": R.q02_timestamp_filter,
        "q03_access_filter": R.q03_access_filter,
        "q04_source_filter_union": R.q04_source_filter_union,
        "q05_semi_join": R.q05_semi_join,
        "q06_exploded_semi_join": R.q06_exploded_semi_join,
        "q07_outer_merge": R.q07_outer_merge,
        "q09_topk": R.q09_topk,
        "q10_dedup_exact": R.q10_dedup_exact,
        "q11_anti_join_denylist": R.q11_anti_join_denylist,
        "q12_window_agg": R.q12_window_agg,
        "q21_revenue_by_nation": R.q21_revenue_by_nation,
        "q08_sort_rank": R.q08_sort_rank,
        "q24_projection_rename": R.q24_projection_rename,
        "q25_distinct": R.q25_distinct,
        "q26_agg_stats": R.q26_agg_stats,
        "q27_string_funcs": R.q27_string_funcs,
        "q28_sessionize": R.q28_sessionize,
        "q29_asof_last_signup": R.q29_asof_last_signup,
        "q33_union": R.q33_union,
        "q34_grouped_topk": R.q34_grouped_topk,
        "q35_count_distinct": R.q35_count_distinct,
        # -- text analysis ------------------------------------------
        "q13_token_stats": textops.q13_token_stats,
        "q14_quality_scores": textops.q14_quality_scores,
        "q19_lang_id": textops.q19_lang_id,
        "q20_fingerprint": textops.q20_fingerprint,
        # -- similarity search --------------------------------------
        "q15_ann_brute": ann.q15_ann_brute,
        "q16_lsh_ann": ann.q16_lsh_ann,
        # -- dedup family -------------------------------------------
        "q10b_dedup_exact": R.q10_dedup_exact,
        "q17_minhash_dedup": dedup.q17_minhash_dedup,
        "q22_simhash": dedup.q22_simhash,
        "q23_embedding_near_dup": dedup.q23_embedding_near_dup,
        "q38_dup_groups": dedup.q38_dup_groups,
        # -- crawl engine (parity vs sequential oracle in pytest) ----
        "q30_crawl_order": crawl_queries.q30_crawl_order,
        "q31_crawl_payload": crawl_queries.q31_crawl_payload,
        "q32_payload_neardup": crawl_queries.q32_payload_neardup,
        "q39_payload_ann": crawl_queries.q39_payload_ann,
        # -- multimodal stages (stub codecs; pytest oracles) ---------
        "q36_audio_features": multimodal_queries.q36_audio_features,
        "q37_video_frame_phashes": multimodal_queries.q37_video_frame_phashes,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2)                        AS sum_qty,
                   round(sum(l_extendedprice), 2)                   AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4)                        AS avg_qty,
                   count(*)                                         AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        "q02_timestamp_filter": """
            SELECT * FROM events WHERE ts > TIMESTAMP '2024-01-20 00:00:00'
        """,
        "q03_access_filter": """
            SELECT * FROM orders
            WHERE coalesce(o_orderstatus, 'closed') IN ('O', 'F')
        """,
        "q04_source_filter_union": """
            SELECT * FROM documents
            WHERE lang = 'en' OR source IN ('src1', 'src2', 'src3')
        """,
        "q05_semi_join": """
            SELECT * FROM lineitem
            WHERE l_orderkey IN (
                SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0)
        """,
        "q06_exploded_semi_join": """
            SELECT * FROM customer
            WHERE c_custkey IN (SELECT DISTINCT o_custkey FROM orders)
        """,
        "q07_outer_merge": """
            WITH l AS (
                SELECT o_orderkey, o_totalprice AS val, o_orderstatus
                FROM orders WHERE (o_orderkey & 3) <> 0),
            r AS (
                SELECT l_orderkey,
                       round(sum(l_quantity), 2)      AS sum_qty,
                       round(sum(l_extendedprice), 2) AS val
                FROM lineitem GROUP BY l_orderkey)
            SELECT coalesce(l.o_orderkey, r.l_orderkey) AS orderkey,
                   coalesce(l.val, r.val)               AS val,
                   l.o_orderstatus, r.sum_qty
            FROM l FULL OUTER JOIN r ON l.o_orderkey = r.l_orderkey
        """,
        "q09_topk": """
            SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 10
        """,
        "q10_dedup_exact": """
            SELECT md5(text) AS h, min(doc_id) AS doc_id, count(*) AS n_dupes
            FROM documents GROUP BY md5(text)
        """,
        "q10b_dedup_exact": """
            SELECT md5(text) AS h, min(doc_id) AS doc_id, count(*) AS n_dupes
            FROM documents GROUP BY md5(text)
        """,
        "q11_anti_join_denylist": """
            SELECT * FROM documents WHERE source NOT IN ('src0', 'src13', 'src7')
        """,
        "q12_window_agg": """
            SELECT user_id,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
                   count(*)                                AS n_events,
                   round(sum(value), 3)                    AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "q13_token_stats": """
            SELECT doc_id,
                   array_length(regexp_extract_all(text, '\\S+')) AS n_tokens,
                   length(replace(text, ' ', ''))                 AS n_chars_nospace
            FROM documents
        """,
        "q15_ann_brute": """
            WITH q AS (
                SELECT vec_id AS qid, embedding AS qe
                FROM embeddings WHERE vec_id < 3),
            s AS (
                SELECT q.qid, e.vec_id,
                       list_cosine_similarity(q.qe, e.embedding) AS cos
                FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid)
            SELECT qid, vec_id FROM s
            QUALIFY row_number() OVER (
                PARTITION BY qid ORDER BY cos DESC, vec_id ASC) <= 10
        """,
        "q21_revenue_by_nation": """
            SELECT n_name,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*)                    AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "q08_sort_rank": """
            WITH agg AS (
                SELECT o_custkey, round(sum(o_totalprice), 2) AS total
                FROM orders GROUP BY 1)
            SELECT c_custkey, total,
                   row_number() OVER (
                       ORDER BY (total IS NOT NULL), total, c_custkey) AS rnk
            FROM customer LEFT JOIN agg ON c_custkey = o_custkey
        """,
        "q24_projection_rename": """
            SELECT c_custkey AS id, c_name AS name,
                   round(c_acctbal, 2) AS balance
            FROM customer
        """,
        "q25_distinct": """
            SELECT DISTINCT c_mktsegment FROM customer
        """,
        "q26_agg_stats": """
            SELECT event_type, count(*) AS n,
                   round(min(value), 6) AS min_value,
                   round(max(value), 6) AS max_value,
                   round(avg(value), 6) AS avg_value
            FROM events GROUP BY event_type
        """,
        "q27_string_funcs": """
            SELECT doc_id, upper(source) AS src_upper,
                   substr(source, 4) AS src_num,
                   source LIKE 'src1%' AS is_src1x,
                   length(text) AS n_chars
            FROM documents
        """,
        "q28_sessionize": """
            WITH d AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL THEN 1
                            WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                 > 1800000000 THEN 1
                            ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts))
            SELECT user_id,
                   CAST(sum(new_s) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM d GROUP BY user_id
        """,
        "q33_union": """
            SELECT o_orderkey, o_totalprice, 'high' AS bucket
            FROM orders WHERE o_totalprice > 450000.0
            UNION ALL
            SELECT o_orderkey, o_totalprice, 'low' AS bucket
            FROM orders WHERE o_totalprice < 2000.0
        """,
        "q34_grouped_topk": """
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rnk
            FROM orders
            QUALIFY rnk <= 3
        """,
        "q35_count_distinct": """
            SELECT l_returnflag,
                   CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
            FROM lineitem GROUP BY l_returnflag
        """,
        "q29_asof_last_signup": """
            SELECT e.event_id, max(s.ts) AS last_signup
            FROM events e
            LEFT JOIN events s
              ON s.user_id = e.user_id
             AND s.event_type = 'signup'
             AND s.ts <= e.ts
            GROUP BY e.event_id
        """,
        # q14_quality_scores, q16_lsh_ann, q17_minhash_dedup,
        # q19_lang_id, q20_fingerprint, q22_simhash,
        # q23_embedding_near_dup: not SQL-expressible (regex/unicode
        # semantics, sketches, heuristics) -> rows-only check; pytest
        # holds their oracles (tests/test_relational.py, test_dedup.py).
    }
