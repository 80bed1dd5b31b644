"""The driver-facing board: queries() and oracle_sql() dicts.

Carved out of the original single-file ``__ray_entry__.py`` board
(round-4 housekeeping; content unchanged). See
``pypdfium2_ray/queries/__init__.py`` for the layout.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import partial
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.queries.common import *  # noqa: F401,F403,E501
from pypdfium2_ray.queries.extraction import *  # noqa: F401,F403,E501
from pypdfium2_ray.queries.textstats import *  # noqa: F401,F403,E501
from pypdfium2_ray.queries.dedup import *  # noqa: F401,F403,E501
from pypdfium2_ray.queries.similarity import *  # noqa: F401,F403,E501
from pypdfium2_ray.queries.relational import *  # noqa: F401,F403,E501
from pypdfium2_ray.queries.multimodal import *  # noqa: F401,F403,E501

# ---------------------------------------------------------------------------
# driver contract

def entry() -> Any:
    """Flagship pipeline on sf0.001 (driver smoke check)."""
    return q_extract_text(SF0001)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_text": q_extract_text,
        "split_extract": q_split_extract,
        "extract_bounded": q_extract_bounded,
        "warc_extract": q_warc_extract,
        "density_extract": q_density_extract,
        "tile_extract": q_tile_extract,
        "doc_flags": q_doc_flags,
        "meta_extract": q_meta_extract,
        "token_stats": q_token_stats,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "term_search": q_term_search,
        "term_search_word": q_term_search_word,
        "extract_status_rollup": q_extract_status_rollup,
        "text_slice": q_text_slice,
        "bpe_tokens": q_bpe_tokens,
        "sessions": q_sessions,
        "collapse_repeats": q_collapse_repeats,
        "jsonl_tokens": q_jsonl_tokens,
        "csv_tokens": q_csv_tokens,
        "curate_corpus": q_curate_corpus,
        "quality_filter": q_quality_filter,
        "hash_sample": q_hash_sample,
        "decontaminate": q_decontaminate,
        "pii_redact": q_pii_redact,
        "median_length_gate": q_median_length_gate,
        "repetition_stats": q_repetition_stats,
        "domain_stats": q_domain_stats,
        "doc_stats": q_doc_stats,
        "top_docs_per_domain": q_top_docs_per_domain,
        "inverted_index": q_inverted_index,
        "phrase_search": q_phrase_search,
        "bool_search": q_bool_search,
        "dedup_exact": q_dedup_exact,
        "dedup_latest_event": q_dedup_latest_event,
        "snapshot_delta": q_snapshot_delta,
        "incremental_dedup": q_incremental_dedup,
        "normalize_text": q_normalize_text,
        "cm_counts": q_cm_counts,
        "join_size_est": q_join_size_est,
        "join_size_exact": q_join_size_exact,
        "cust_order_dist": q_cust_order_dist,
        "order_priority_semi": q_order_priority_semi,
        "top_supplier": q_top_supplier,
        "small_qty_revenue": q_small_qty_revenue,
        "idle_rich_customers": q_idle_rich_customers,
        "key_skew": q_key_skew,
        "nation_flow": q_nation_flow,
        "mkt_share": q_mkt_share,
        "part_supplier_census": q_part_supplier_census,
        "blame_supplier": q_blame_supplier,
        "user_running_total": q_user_running_total,
        "event_islands": q_event_islands,
        "monthly_delta": q_monthly_delta,
        "value_centered": q_value_centered,
        "dense_topk": q_dense_topk,
        "important_parts": q_important_parts,
        "forecast_revenue": q_forecast_revenue,
        "event_lag": q_event_lag,
        "running_distinct": q_running_distinct,
        "first_touch": q_first_touch,
        "time_to_convert": q_time_to_convert,
        "user_trend": q_user_trend,
        "user_gini": q_user_gini,
        "densify_days": q_densify_days,
        "bounce_rate": q_bounce_rate,
        "benford_digits": q_benford_digits,
        "ks_distance": q_ks_distance,
        "mutual_links": q_mutual_links,
        "kwic_first": q_kwic_first,
        "value_cume": q_value_cume,
        "weighted_median": q_weighted_median,
        "user_type_bitmask": q_user_type_bitmask,
        "burst_count": q_burst_count,
        "trailing_sum": q_trailing_sum,
        "active_streak": q_active_streak,
        "state_duration": q_state_duration,
        "time_profile": q_time_profile,
        "rfm_scores": q_rfm_scores,
        "spike_days": q_spike_days,
        "source_share": q_source_share,
        "peak_day": q_peak_day,
        "systematic_sample": q_systematic_sample,
        "adoption_lag": q_adoption_lag,
        "session_pairs": q_session_pairs,
        "type_jaccard": q_type_jaccard,
        "early_ltv": q_early_ltv,
        "max_gap_at": q_max_gap_at,
        "ship_delay": q_ship_delay,
        "first_session_size": q_first_session_size,
        "concurrency_curve": q_concurrency_curve,
        "embedding_norms": q_embedding_norms,
        "transition_probs": q_transition_probs,
        "island_lengths": q_island_lengths,
        "taste_shift": q_taste_shift,
        "momentum_score": q_momentum_score,
        "session_handoff": q_session_handoff,
        "new_vs_returning": q_new_vs_returning,
        "dim_stats": q_dim_stats,
        "last_touch": q_last_touch,
        "purchase_gaps": q_purchase_gaps,
        "customer_order_gaps": q_customer_order_gaps,
        "length_histogram": q_length_histogram,
        "dim_gram": q_dim_gram,
        "brand_price_quartiles": q_brand_price_quartiles,
        "bracket_revenue": q_bracket_revenue,
        "type_corr_parts": q_type_corr_parts,
        "running_peak": q_running_peak,
        "priority_median": q_priority_median,
        "touches_to_convert": q_touches_to_convert,
        "dup_size_hist": q_dup_size_hist,
        "dedup_keep_best": q_dedup_keep_best,
        "extract_toc": q_extract_toc,
        "token_length_hist": q_token_length_hist,
        "gap_hist": q_gap_hist,
        "entry_conversion": q_entry_conversion,
        "type_cadence": q_type_cadence,
        "idle_users": q_idle_users,
        "brand_return_rate": q_brand_return_rate,
        "order_status_matrix": q_order_status_matrix,
        "ab_split_metrics": q_ab_split_metrics,
        "norm_hist": q_norm_hist,
        "bookend_types": q_bookend_types,
        "type_dow_profile": q_type_dow_profile,
        "user_activity_hist": q_user_activity_hist,
        "type_trigrams": q_type_trigrams,
        "source_top_tokens": q_source_top_tokens,
        "char_census": q_char_census,
        "order_size_hist": q_order_size_hist,
        "discount_profile": q_discount_profile,
        "zorder_layout": q_zorder_layout,
        "robots_gate": q_robots_gate,
        "minhash_dups": q_minhash_dups,
        "simhash_dups": q_simhash_dups,
        "fp_neighbors": q_fp_neighbors,
        "shared_chunks": q_shared_chunks,
        "template_chunks": q_template_chunks,
        "strip_boilerplate": q_strip_boilerplate,
        "graph_walks": q_graph_walks,
        "cocitation": q_cocitation,
        "neardup_clusters": q_neardup_clusters,
        "neardup_keep_one": q_neardup_keep_one,
        "pagerank": q_pagerank,
        "trustrank": q_trustrank,
        "hits": q_hits,
        "triangles": q_triangles,
        "local_clustering": q_local_clustering,
        "kcore": q_kcore,
        "communities": q_communities,
        "crawl_depth": q_crawl_depth,
        "extract_links": q_extract_links,
        "extract_tables": q_extract_tables,
        "extract_jsonld": q_extract_jsonld,
        "anchor_text": q_anchor_text,
        "crawl_frontier": q_crawl_frontier,
        "link_pagerank": q_link_pagerank,
        "bm25_topk": q_bm25_topk,
        "url_dedup": q_url_dedup,
        "contamination_scan": q_contamination_scan,
        "mixture_sample": q_mixture_sample,
        "lm_score": q_lm_score,
        "ngram_decontaminate": q_ngram_decontaminate,
        "span_dedup": q_span_dedup,
        "dup_spans": q_dup_spans,
        "stratified_sample": q_stratified_sample,
        "audio_features": q_audio_features,
        "embedding_centroids": q_embedding_centroids,
        "kmeans_assign": q_kmeans_assign,
        "collocations": q_collocations,
        "semantic_dedup": q_semantic_dedup,
        "shuffle_assign": q_shuffle_assign,
        "negative_pairs": q_negative_pairs,
        "pack_offsets": q_pack_offsets,
        "length_rank": q_length_rank,
        "cohort_retention": q_cohort_retention,
        "shipping_priority": q_shipping_priority,
        "user_rolling_7d": q_user_rolling_7d,
        "top_user_per_type": q_top_user_per_type,
        "ngram_dups": q_ngram_dups,
        "ppjoin_dups": q_ppjoin_dups,
        "jaccard_knn": q_jaccard_knn,
        "editdist_dups": q_editdist_dups,
        "editdist2_dups": q_editdist2_dups,
        "dup_owner": q_dup_owner,
        "postings_compress": q_postings_compress,
        "containment_dups": q_containment_dups,
        "gram_novelty": q_gram_novelty,
        "bpe_merges": q_bpe_merges,
        "weighted_sample": q_weighted_sample,
        "doc_keywords": q_doc_keywords,
        "rollup_stats": q_rollup_stats,
        "cube_stats": q_cube_stats,
        "strip_repeated": q_strip_repeated,
        "canonical_resolve": q_canonical_resolve,
        "winnow_fingerprint": q_winnow_fingerprint,
        "hash_embed": q_hash_embed,
        "text_semantic_dups": q_text_semantic_dups,
        "rag_chunks": q_rag_chunks,
        "token_entropy": q_token_entropy,
        "ann_topk": q_ann_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "pq_topk": q_pq_topk,
        "embedding_dups": q_embedding_dups,
        "embedding_lsh_dups": q_embedding_lsh_dups,
        "ivf_dups": q_ivf_dups,
        "pricing_summary": q_pricing_summary,
        "orders_by_region": q_orders_by_region,
        "top_orders": q_top_orders,
        "late_orders": q_late_orders,
        "returned_revenue": q_returned_revenue,
        "local_volume": q_local_volume,
        "big_orders": q_big_orders,
        "promo_revenue": q_promo_revenue,
        "user_event_pivot": q_user_event_pivot,
        "type_distinct_users": q_type_distinct_users,
        "value_moments": q_value_moments,
        "user_pareto": q_user_pareto,
        "table_digest": q_table_digest,
        "chars_ntile": q_chars_ntile,
        "sorted_layout": q_sorted_layout,
        "basket_pairs": q_basket_pairs,
        "user_paths": q_user_paths,
        "user_value_integral": q_user_value_integral,
        "value_outliers": q_value_outliers,
        "k_anon_events": q_k_anon_events,
        "crawl_schedule": q_crawl_schedule,
        "user_decay": q_user_decay,
        "lang_mode": q_lang_mode,
        "props_stats": q_props_stats,
        "merge_snapshot": q_merge_snapshot,
        "incremental_extract": q_incremental_extract,
        "audio_resample": q_audio_resample,
        "lang_confusion": q_lang_confusion,
        "user_gap_stats": q_user_gap_stats,
        "events_quartiles": q_events_quartiles,
        "event_transitions": q_event_transitions,
        "overlap_pairs": q_overlap_pairs,
        "oov_rate": q_oov_rate,
        "events_rollup": q_events_rollup,
        "events_median": q_events_median,
        "events_median_sketch": q_events_median_sketch,
        "heavy_bigrams": q_heavy_bigrams,
        "distinct_users": q_distinct_users,
        "distinct_users_hll": q_distinct_users_hll,
        "session_stats": q_session_stats,
        "funnel": q_funnel,
        "interval_coverage": q_interval_coverage,
        "vocab_coverage": q_vocab_coverage,
        "path_census": q_path_census,
        "events_hourly": q_events_hourly,
        "events_hourly_sliding": q_events_hourly_sliding,
        "sliding_distinct_users": q_sliding_distinct_users,
        "events_value_bucket": q_events_value_bucket,
        "asof_last_purchase": q_asof_last_purchase,
        "decode_images": q_decode_images,
        "image_meta": q_image_meta,
        "image_resize": q_image_resize,
        "image_dups": q_image_dups,
    }


def oracle_sql() -> dict[str, str]:
    from pypdfium2_ray.pipelines.relational import (
        FORECAST_DISC, FORECAST_MAX_QTY, FORECAST_WINDOW,
        MKT_SHARE_NATION, MKT_SHARE_REGION, MKT_SHARE_TYPE,
        TOP_SUPPLIER_WINDOW,
    )
    from pypdfium2_ray.stages.agg import PERIOD_DELTA_SENTINEL
    from pypdfium2_ray.functions.text import (
        LANG_STOPWORDS, sql_bpe_token_count, sql_lang_pred, sql_term_count,
        sql_token_count,
    )
    from pypdfium2_ray.stages.chunk import sql_chunk_tokens
    from pypdfium2_ray.functions.text import (
        sql_normalize_text,
        sql_pii_count as _sql_pii_count,
        sql_redact_pii as _sql_redact_pii,
        sql_repetition_counts,
    )
    _REP_SQL = sql_repetition_counts("text")
    from pypdfium2_ray.sources.cc_from_documents import (
        _sql_page_texts, sql_extracted_text, sql_n_chars, sql_is_bad,
        sql_is_enc)

    en_stop = "\\b(" + "|".join(LANG_STOPWORDS["en"]) + ")\\b"
    ext = sql_extracted_text("text")
    n_chars_sql = sql_n_chars("text")
    # deterministic error slice of the synthesized crawl (cc_from_documents
    # ERR_MOD family): pure doc_id arithmetic, so the oracle expresses the
    # per-row (status, err_code, empty-output) discipline exactly —
    # err_code values are the PDFium constants (FORMAT=3, PASSWORD=4)
    bad, enc = sql_is_bad(), sql_is_enc()
    p1_sql, p2_sql = _sql_page_texts("text")
    from pypdfium2_ray.stages.zorder import sql_zorder_key
    _zorder_sql = sql_zorder_key("user_id", "(epoch_us(ts) // 1000000)")
    is_err = f"({bad} OR {enc})"
    status_sql = (f"CASE WHEN {bad} THEN 'format_error' "
                  f"WHEN {enc} THEN 'password_error' ELSE 'ok' END")
    errc_sql = (f"(CASE WHEN {bad} THEN 3 WHEN {enc} THEN 4 "
                f"ELSE 0 END)::BIGINT")
    ext_err = f"CASE WHEN {is_err} THEN '' ELSE {ext} END"
    npages_sql = f"(CASE WHEN {is_err} THEN 0 ELSE 2 END)::BIGINT"
    nchars_err = (f"(CASE WHEN {is_err} THEN 0 "
                  f"ELSE {n_chars_sql} END)::BIGINT")

    return {
        "extract_text": f"""
            SELECT 'doc://' || source || '/' || doc_id AS url,
                   lang,
                   {status_sql} AS status,
                   {errc_sql} AS err_code,
                   {npages_sql} AS n_pages,
                   {nchars_err} AS n_chars,
                   {ext_err} AS extracted_text
            FROM documents""",
        # two-pool skew-split variant: identical per-url contract
        "split_extract": f"""
            SELECT 'doc://' || source || '/' || doc_id AS url,
                   lang,
                   {status_sql} AS status,
                   {errc_sql} AS err_code,
                   {npages_sql} AS n_pages,
                   {nchars_err} AS n_chars,
                   {ext_err} AS extracted_text
            FROM documents""",
        "extract_bounded": f"""
            SELECT 'doc://' || source || '/' || doc_id AS url,
                   {ext_err} AS extracted_text
            FROM documents""",
        # incremental == full recompute: the oracle extracts the ENTIRE
        # v2 snapshot directly; the engine reuses v1 results for
        # unchanged urls and parses only new/changed pages
        "incremental_extract": f"""
            WITH docs2 AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 6 = 1 THEN text || ' UPD'
                          ELSE text END AS text,
                     lang, source
              FROM documents WHERE doc_id % 9 <> 4
              UNION ALL
              SELECT doc_id + 10000000, text || ' NEWDOC', lang, source
              FROM documents WHERE doc_id % 9 <> 4 AND doc_id % 13 = 2)
            SELECT 'doc://' || source || '/' || doc_id AS url,
                   {status_sql} AS status,
                   {errc_sql} AS err_code,
                   {npages_sql} AS n_pages,
                   {nchars_err} AS n_chars,
                   {ext_err} AS extracted_text
            FROM docs2""",
        # 2x1 imposition + serialize + reopen: one sheet whose text is
        # page1's lines then page2's under a single frame (ok rows only —
        # tile refuses failed documents)
        "tile_extract": f"""
            SELECT 'doc://' || source || '/' || doc_id AS url,
                   1::BIGINT AS n_pages,
                   '# Page 1' || chr(10) || {p1_sql} || chr(13) || chr(10)
                    || {p2_sql} || chr(10) AS extracted_text
            FROM documents WHERE NOT {bad} AND NOT {enc}""",
        # density policy over the no-<main> corpus shape: the heuristic
        # must reproduce the flagship bytes exactly
        "density_extract": f"""
            SELECT 'doc://' || source || '/' || doc_id AS url,
                   {status_sql} AS status,
                   {errc_sql} AS err_code,
                   {npages_sql} AS n_pages,
                   {nchars_err} AS n_chars,
                   {ext_err} AS extracted_text
            FROM documents""",
        # WARC-sourced flagship: identical per-url contract as
        # extract_text (minus lang, which the container doesn't carry)
        "warc_extract": f"""
            SELECT 'doc://' || source || '/' || doc_id AS url,
                   {status_sql} AS status,
                   {errc_sql} AS err_code,
                   {npages_sql} AS n_pages,
                   {nchars_err} AS n_chars,
                   {ext_err} AS extracted_text
            FROM documents""",
        # the synthesized corpus: h1/h2 outline => tagged + use_outlines
        # (PAGEMODE_USEOUTLINES = 1, the PDFium constant), forms
        # stripped-absent => formtype none (0); error rows carry the
        # error-document defaults (untagged, no pagemode)
        "doc_flags": f"""
            SELECT 'doc://' || source || '/' || doc_id AS url,
                   NOT {is_err} AS is_tagged,
                   0::BIGINT AS formtype,
                   (CASE WHEN {is_err} THEN 0 ELSE 1 END)::BIGINT AS pagemode
            FROM documents""",
        "token_stats": f"""
            SELECT doc_id,
                   length(text) AS n_chars_text,
                   {sql_token_count('text')} AS n_tokens,
                   length(regexp_extract_all(text, '[.!?]')) AS n_punct,
                   length(regexp_extract_all(text, '{en_stop}')) AS n_stopwords
            FROM documents""",
        "jsonl_tokens": f"""
            SELECT doc_id,
                   length(text) AS n_chars_text,
                   {sql_token_count('text')} AS n_tokens,
                   length(regexp_extract_all(text, '[.!?]')) AS n_punct,
                   length(regexp_extract_all(text, '{en_stop}')) AS n_stopwords
            FROM documents""",
        "csv_tokens": f"""
            SELECT doc_id,
                   length(text) AS n_chars_text,
                   {sql_token_count('text')} AS n_tokens,
                   length(regexp_extract_all(text, '[.!?]')) AS n_punct,
                   length(regexp_extract_all(text, '{en_stop}')) AS n_stopwords
            FROM documents""",
        "lang_id": f"""
            SELECT doc_id, {sql_lang_pred('text')} AS lang_pred
            FROM documents""",
        "lang_confusion": f"""
            SELECT lang, {sql_lang_pred('text')} AS lang_pred,
                   count(*)::BIGINT AS n_docs
            FROM documents GROUP BY 1, 2""",
        "fingerprint": """
            SELECT doc_id, md5(text) AS fingerprint FROM documents""",
        "term_search": f"""
            SELECT doc_id, {sql_term_count('text', SEARCH_TERM)} AS n_matches
            FROM documents""",
        "term_search_word": f"""
            SELECT doc_id,
                   length(regexp_extract_all(text, '\\b{SEARCH_TERM}\\b'))
                     AS n_word_matches
            FROM documents""",
        "extract_status_rollup": f"""
            SELECT {status_sql} AS status, {errc_sql} AS err_code,
                   count(*) AS n_docs,
                   sum(CASE WHEN {is_err} THEN 0 ELSE {n_chars_sql} END)
                     ::BIGINT AS sum_chars
            FROM documents GROUP BY 1, 2""",
        "text_slice": """
            SELECT doc_id, substr(text, 11, 50) AS slice_text FROM documents""",
        "bpe_tokens": f"""
            SELECT doc_id, {sql_bpe_token_count('text')} AS n_bpe_tokens
            FROM documents""",
        "sessions": """
            WITH d AS (
              SELECT event_id, user_id, ts,
                     CASE WHEN ts - lag(ts) OVER w > INTERVAL 1800 SECONDS
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            )
            SELECT event_id, user_id, ts,
                   CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS session_id
            FROM d""",
        "quality_filter": f"""
            SELECT doc_id, {_QF_TOKS} AS n_tokens
            FROM documents WHERE {_QF_WHERE}""",
        # deterministic hash sampling: md5_number_upper == md5_hash64
        # (first 8 digest bytes LE, verified)
        "hash_sample": """
            SELECT doc_id, n_chars FROM documents
            WHERE md5_number_upper(doc_id::VARCHAR) % 10 = 3""",
        "median_length_gate": """
            SELECT doc_id, lang, n_chars::BIGINT AS n_chars FROM (
              SELECT doc_id, lang, n_chars,
                     median(n_chars) OVER (PARTITION BY lang) AS med
              FROM documents)
            WHERE n_chars >= med""",
        "pii_redact": f"""
            WITH t2 AS (
              SELECT doc_id,
                     text || ' contact doc' || doc_id ||
                     '@example.com or +1 555-12' || doc_id ||
                     ' ip 10.0.0.1' AS txt
              FROM documents)
            SELECT doc_id, {_sql_redact_pii('txt')} AS clean,
                   {_sql_pii_count('email', 'txt')}::BIGINT AS n_emails,
                   {_sql_pii_count('phone', 'txt')}::BIGINT AS n_phones,
                   {_sql_pii_count('ip', 'txt')}::BIGINT AS n_ips
            FROM t2""",
        "repetition_stats": f"""
            SELECT doc_id, {_REP_SQL[0]}::BIGINT AS n_tokens,
                   {_REP_SQL[1]}::BIGINT AS n_distinct_tokens
            FROM documents""",
        "decontaminate": """
            SELECT doc_id, n_chars FROM documents
            WHERE doc_id NOT IN (
                SELECT doc_id FROM documents
                WHERE md5_number_upper(doc_id::VARCHAR) % 10 = 3)""",
        # the oracle applies the SAME host regex to the SAME synthesized
        # url, so a source containing '/' (or failing the regex) diverges
        # identically on both sides instead of silently only in the engine
        "domain_stats": """
            SELECT regexp_extract('doc://' || source || '/' || doc_id,
                                  '^doc://([^/]+)/', 1) AS host,
                   count(*) AS n_docs,
                   CAST(sum(length(text)) AS BIGINT) AS sum_chars
            FROM documents GROUP BY 1""",
        "phrase_search": _phrase_search_sql(),
        "bool_search": _bool_search_sql(),
        "crawl_schedule": _crawl_schedule_sql(),
        "user_decay": _user_decay_sql(),
        "lang_mode": _lang_mode_sql(),
        "props_stats": _props_stats_sql(),
        "merge_snapshot": _merge_snapshot_sql(),
        "user_gap_stats": _user_gap_stats_sql(),
        "events_quartiles": _events_quartiles_sql(),
        "event_transitions": _event_transitions_sql(),
        "overlap_pairs": _overlap_pairs_sql(),
        "oov_rate": _oov_rate_sql(),
        "inverted_index": """
            WITH toks AS (
              SELECT doc_id, unnest(regexp_split_to_array(text,
                     '[ \t\r\n\f\v]+')) AS token FROM documents),
            t2 AS (SELECT DISTINCT doc_id, token FROM toks
                   WHERE token <> '')
            SELECT token AS term, count(*)::BIGINT AS df,
                   sum(doc_id)::BIGINT AS sum_doc_ids,
                   min(doc_id) AS min_doc, max(doc_id) AS max_doc
            FROM t2 GROUP BY token""",
        "top_docs_per_domain": """
            WITH d AS (
              SELECT regexp_extract('doc://' || source || '/' || doc_id,
                                    '^doc://([^/]+)/', 1) AS host,
                     doc_id, CAST(length(text) AS BIGINT) AS n_chars
              FROM documents)
            SELECT host, doc_id, n_chars FROM d
            QUALIFY row_number() OVER (
                PARTITION BY host ORDER BY n_chars DESC, doc_id) <= 3""",
        "doc_stats": """
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   CAST(max(n_chars) AS BIGINT) AS max_chars
            FROM documents GROUP BY lang""",
        "dedup_exact": """
            SELECT md5(text) AS fingerprint, min(doc_id) AS keep_doc_id,
                   count(*) AS n_dups
            FROM documents GROUP BY 1""",
        "dedup_latest_event": """
            SELECT user_id, event_id, ts FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) = 1""",
        "snapshot_delta": """
            WITH old AS (
              SELECT 'doc://' || source || '/' || doc_id AS url,
                     md5(text) AS fp
              FROM documents WHERE doc_id % 3 <> 0),
            new AS (
              SELECT 'doc://' || source || '/' || doc_id AS url,
                     md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
                              ELSE text END) AS fp
              FROM documents WHERE doc_id % 2 <> 0)
            SELECT COALESCE(o.url, n.url) AS url,
                   CASE WHEN o.url IS NULL THEN 'new'
                        WHEN n.url IS NULL THEN 'gone'
                        WHEN o.fp = n.fp THEN 'unchanged'
                        ELSE 'changed' END AS delta
            FROM old o FULL OUTER JOIN new n ON o.url = n.url""",
        "normalize_text": (
            "SELECT doc_id, "
            + sql_normalize_text("('“' || text || '”… — ok')")
            + " AS norm_text FROM documents"),
        "cm_counts": _cm_counts_sql(),
        "join_size_est": _join_size_est_sql(),
        "join_size_exact": """
            SELECT count(*)::BIGINT AS exact
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",
        "cust_order_dist": """
            WITH per_cust AS (
              SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
              FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
              GROUP BY 1)
            SELECT c_count, count(*)::BIGINT AS custdist
            FROM per_cust GROUP BY 1""",
        "order_priority_semi": """
            SELECT o_orderpriority, count(*)::BIGINT AS n_orders
            FROM orders
            WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                                 WHERE l_returnflag = 'R')
            GROUP BY 1""",
        "top_supplier": f"""
            WITH rev AS (
              SELECT l_suppkey,
                     SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(round(l_discount*100) AS BIGINT))
                         )::BIGINT AS total_rev_e4
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '{TOP_SUPPLIER_WINDOW[0]}'
                AND l_shipdate < TIMESTAMP '{TOP_SUPPLIER_WINDOW[1]}'
              GROUP BY 1)
            SELECT s.s_suppkey, s.s_name, r.total_rev_e4
            FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
            WHERE r.total_rev_e4 = (SELECT max(total_rev_e4) FROM rev)""",
        "small_qty_revenue": """
            WITH per_part AS (
              SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
                     count(*)::BIGINT AS n_li
              FROM lineitem GROUP BY 1)
            SELECT COALESCE(SUM(CAST(round(l.l_extendedprice*100)
                                     AS BIGINT)), 0)::BIGINT AS sum_cents,
                   count(*)::BIGINT AS n_rows
            FROM lineitem l JOIN per_part p ON l.l_partkey = p.l_partkey
            WHERE 5 * CAST(l.l_quantity AS BIGINT) * p.n_li < p.sum_qty""",
        "idle_rich_customers": """
            WITH pos AS (
              SELECT SUM(CAST(round(c_acctbal*100) AS BIGINT))::BIGINT AS s,
                     count(*)::BIGINT AS n
              FROM customer WHERE CAST(round(c_acctbal*100) AS BIGINT) > 0)
            SELECT c_nationkey::BIGINT AS c_nationkey,
                   count(*)::BIGINT AS n_cust,
                   SUM(CAST(round(c_acctbal*100) AS BIGINT))::BIGINT
                     AS sum_acctbal_cents
            FROM customer, pos
            WHERE CAST(round(c_acctbal*100) AS BIGINT) * pos.n > pos.s
              AND c_custkey NOT IN (SELECT o_custkey FROM orders)
            GROUP BY 1""",
        "key_skew": """
            WITH per_key AS (SELECT user_id, count(*)::BIGINT AS cnt
                             FROM events GROUP BY 1)
            SELECT CAST(floor(log2(cnt)) AS BIGINT) AS bucket,
                   count(*)::BIGINT AS n_keys, sum(cnt)::BIGINT AS n_rows,
                   max(cnt)::BIGINT AS max_cnt
            FROM per_key GROUP BY 1""",
        "nation_flow": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS year,
                   SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                       * (100 - CAST(round(l_discount*100) AS BIGINT))
                       )::BIGINT AS rev_e4
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE s_nationkey <> c_nationkey
            GROUP BY 1, 2, 3""",
        "mkt_share": f"""
            SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
                   SUM(CASE WHEN s.s_nationkey = tn.n_nationkey
                       THEN CAST(round(l_extendedprice*100) AS BIGINT)
                            * (100 - CAST(round(l_discount*100) AS BIGINT))
                       ELSE 0 END)::BIGINT AS rev_nation_e4,
                   SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                       * (100 - CAST(round(l_discount*100) AS BIGINT))
                       )::BIGINT AS rev_total_e4
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier s ON l_suppkey = s.s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer c ON o_custkey = c.c_custkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            JOIN region ON cn.n_regionkey = r_regionkey
            CROSS JOIN (SELECT n_nationkey FROM nation
                        WHERE n_name = '{MKT_SHARE_NATION}') tn
            WHERE p_type = '{MKT_SHARE_TYPE}'
              AND r_name = '{MKT_SHARE_REGION}'
            GROUP BY 1""",
        "part_supplier_census": """
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1, 2, 3""",
        "blame_supplier": """
            WITH o AS (
              SELECT l_orderkey, max(l_shipdate) AS mx,
                     count(DISTINCT l_suppkey) AS nsupp
              FROM lineitem GROUP BY 1),
            w AS (
              SELECT l.l_orderkey, min(l.l_suppkey) AS supp,
                     count(DISTINCT l.l_suppkey) AS nmax
              FROM lineitem l
              JOIN o ON l.l_orderkey = o.l_orderkey
                    AND l.l_shipdate = o.mx
              GROUP BY 1)
            SELECT w.supp::BIGINT AS s_suppkey,
                   count(*)::BIGINT AS n_blamed
            FROM w JOIN o ON w.l_orderkey = o.l_orderkey
            WHERE o.nsupp >= 2 AND w.nmax = 1
            GROUP BY 1""",
        "user_running_total": """
            SELECT event_id, user_id,
                   SUM(CAST(round(value*10000) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)::BIGINT AS run_total_e4
            FROM events""",
        "event_islands": """
            WITH x AS (
              SELECT user_id, event_type, ts, event_id,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                     - row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) AS grp
              FROM events)
            SELECT user_id, event_type, count(*)::BIGINT AS n_events,
                   CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
                   CAST(epoch_us(max(ts)) AS BIGINT) AS end_us,
                   min(event_id)::BIGINT AS first_id
            FROM x GROUP BY user_id, event_type, grp""",
        "monthly_delta": f"""
            WITH m AS (
              SELECT event_type,
                     CAST(year(ts)*10000 + month(ts)*100 + day(ts)
                          AS BIGINT) AS ym,
                     SUM(CAST(round(value*10000) AS BIGINT))::BIGINT
                       AS sum_e4
              FROM events GROUP BY 1, 2)
            SELECT event_type, ym, sum_e4,
                   COALESCE(sum_e4 - LAG(sum_e4) OVER (
                              PARTITION BY event_type ORDER BY ym),
                            {PERIOD_DELTA_SENTINEL})::BIGINT AS delta_e4
            FROM m""",
        "forecast_revenue": f"""
            SELECT COALESCE(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                     * CAST(round(l_discount*100) AS BIGINT)), 0)::BIGINT
                     AS revenue_e4,
                   count(*)::BIGINT AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{FORECAST_WINDOW[0]}'
              AND l_shipdate < TIMESTAMP '{FORECAST_WINDOW[1]}'
              AND CAST(round(l_discount*100) AS BIGINT)
                  BETWEEN {FORECAST_DISC[0]} AND {FORECAST_DISC[1]}
              AND l_quantity < {FORECAST_MAX_QTY}""",
        "first_touch": """
            WITH s AS (
              SELECT event_id, user_id, ts, event_type,
                     CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                               - CAST(epoch_us(LAG(ts) OVER (
                                   PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS BIGINT)
                               > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events),
            s2 AS (
              SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
              FROM s),
            s3 AS (
              SELECT event_id, user_id, session_id, event_type,
                     FIRST_VALUE(event_type) OVER (
                       PARTITION BY user_id, session_id
                       ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS first_touch
              FROM s2)
            SELECT event_id, user_id, session_id::BIGINT AS session_id,
                   first_touch
            FROM s3 WHERE event_type = 'purchase'""",
        "time_to_convert": """
            SELECT event_id, user_id,
                   COALESCE(CAST(epoch_us(
                       MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 1 FOLLOWING
                                  AND UNBOUNDED FOLLOWING)) AS BIGINT)
                     - CAST(epoch_us(ts) AS BIGINT), -1) AS us_to_convert
            FROM events""",
        "user_trend": """
            WITH r AS (
              SELECT user_id,
                     CAST(round(value*10000) AS BIGINT) AS y,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS x
              FROM events)
            SELECT user_id, COUNT(*)::BIGINT AS n,
                   CAST(COUNT(*)*SUM(x*y) - SUM(x)*SUM(y) AS BIGINT)
                       AS slope_num,
                   CAST(COUNT(*)*SUM(x*x) - SUM(x)*SUM(x) AS BIGINT)
                       AS slope_den
            FROM r GROUP BY user_id HAVING COUNT(*) >= 2""",
        "user_gini": """
            WITH r AS (
              SELECT user_id,
                     CAST(round(value*10000) AS BIGINT) AS x,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                         ORDER BY CAST(round(value*10000) AS BIGINT)) AS i
              FROM events)
            SELECT user_id, COUNT(*)::BIGINT AS n,
                   CAST(2*SUM(i*x) - (COUNT(*)+1)*SUM(x) AS BIGINT)
                       AS gini_num,
                   CAST(COUNT(*)*SUM(x) AS BIGINT) AS gini_den
            FROM r GROUP BY user_id""",
        "densify_days": """
            WITH d AS (SELECT user_id,
                         CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                             AS day
                       FROM events),
            b AS (SELECT user_id, min(day) AS mn, max(day) AS mx
                  FROM d GROUP BY user_id),
            spine AS (SELECT user_id,
                             unnest(generate_series(mn, mx)) AS day
                      FROM b),
            c AS (SELECT user_id, day, COUNT(*)::BIGINT AS cnt
                  FROM d GROUP BY 1, 2)
            SELECT s.user_id, s.day,
                   COALESCE(c.cnt, 0)::BIGINT AS n_events
            FROM spine s LEFT JOIN c USING (user_id, day)""",
        "bounce_rate": """
            WITH s AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                               - CAST(epoch_us(LAG(ts) OVER (
                                   PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS BIGINT)
                               > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events),
            s2 AS (
              SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
              FROM s),
            g AS (
              SELECT user_id, sid,
                     first(event_type ORDER BY ts, event_id)
                         AS first_touch,
                     COUNT(*) AS sz
              FROM s2 GROUP BY user_id, sid)
            SELECT first_touch, COUNT(*)::BIGINT AS n_sessions,
                   SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS n_bounces
            FROM g GROUP BY first_touch""",
        "benford_digits": """
            WITH x AS (SELECT event_type,
                              CAST(round(value*10000) AS BIGINT) AS v
                       FROM events
                       WHERE CAST(round(value*10000) AS BIGINT) > 0)
            SELECT event_type,
                   CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT)
                       AS digit,
                   COUNT(*)::BIGINT AS n
            FROM x GROUP BY 1, 2""",
        "ks_distance": """
            WITH x AS (SELECT CAST(round(value*10000) AS BIGINT) AS v,
                         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END
                             AS a,
                         CASE WHEN event_type = 'purchase' THEN 1
                              ELSE 0 END AS b
                       FROM events
                       WHERE event_type IN ('view', 'purchase')),
            g AS (SELECT v, SUM(a) AS ca, SUM(b) AS cb FROM x
                  GROUP BY v),
            c AS (SELECT SUM(ca) OVER (ORDER BY v) AS cum_a,
                         SUM(cb) OVER (ORDER BY v) AS cum_b FROM g),
            t AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM x)
            SELECT CAST(MAX(ABS(cum_a*nb - cum_b*na)) AS BIGINT)
                       AS d_num,
                   CAST(MAX(na*nb) AS BIGINT) AS d_den,
                   CAST(MAX(na) AS BIGINT) AS n_a,
                   CAST(MAX(nb) AS BIGINT) AS n_b
            FROM c, t""",
        "mutual_links": _mutual_links_sql(),
        "weighted_median": """
            WITH x AS (SELECT l_returnflag,
                         CAST(round(l_extendedprice*100) AS BIGINT) AS p,
                         CAST(round(l_quantity) AS BIGINT) AS w
                       FROM lineitem),
            g AS (SELECT l_returnflag, p, SUM(w) AS w FROM x
                  GROUP BY l_returnflag, p),
            c AS (SELECT l_returnflag, p,
                         SUM(w) OVER (PARTITION BY l_returnflag
                                      ORDER BY p) AS cw,
                         SUM(w) OVER (PARTITION BY l_returnflag) AS tw
                  FROM g)
            SELECT l_returnflag, CAST(MIN(p) AS BIGINT) AS wmedian
            FROM c WHERE 2*cw >= tw GROUP BY l_returnflag""",
        "user_type_bitmask": """
            WITH b AS (SELECT user_id, CASE event_type
                         WHEN 'click' THEN 1 WHEN 'error' THEN 2
                         WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                         WHEN 'view' THEN 16 END AS bit
                       FROM events)
            SELECT user_id, CAST(SUM(DISTINCT bit) AS BIGINT)
                       AS type_mask,
                   COUNT(DISTINCT bit)::BIGINT AS n_types
            FROM b GROUP BY user_id""",
        "burst_count": """
            WITH e AS (SELECT event_id, user_id,
                         CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
            p AS (SELECT a.event_id, a.user_id, count(*) AS n
                  FROM e a JOIN e b
                    ON a.user_id = b.user_id
                   AND (b.us > a.us
                        OR (b.us = a.us AND b.event_id > a.event_id))
                   AND b.us - a.us <= 3600000000
                  GROUP BY a.event_id, a.user_id)
            SELECT e.event_id, e.user_id,
                   COALESCE(p.n, 0)::BIGINT AS n_burst
            FROM e LEFT JOIN p USING (event_id, user_id)""",
        "trailing_sum": """
            WITH r AS (SELECT event_id, user_id,
                         CAST(epoch_us(ts) AS BIGINT) AS us,
                         CAST(round(value*10000) AS BIGINT) AS v
                       FROM events)
            SELECT event_id, user_id,
                   CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN 3600000000 PRECEDING
                             AND CURRENT ROW) AS BIGINT)
                       AS trail_sum_e4
            FROM r""",
        "active_streak": """
            WITH d AS (SELECT DISTINCT user_id,
                         CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                             AS day
                       FROM events),
            r AS (SELECT user_id, day,
                         day - ROW_NUMBER() OVER (PARTITION BY user_id
                                                  ORDER BY day) AS grp
                  FROM d),
            g AS (SELECT user_id, grp, COUNT(*) AS len FROM r
                  GROUP BY 1, 2)
            SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak,
                   CAST(SUM(len) AS BIGINT) AS n_active_days
            FROM g GROUP BY user_id""",
        "state_duration": """
            WITH s AS (SELECT user_id, event_type,
                         CAST(epoch_us(ts) AS BIGINT) AS us,
                         LEAD(CAST(epoch_us(ts) AS BIGINT)) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS nxt
                       FROM events)
            SELECT user_id, event_type,
                   CAST(SUM(nxt - us) AS BIGINT) AS dur_us,
                   COUNT(*)::BIGINT AS n_holds
            FROM s WHERE nxt IS NOT NULL
            GROUP BY user_id, event_type""",
        "time_profile": """
            WITH x AS (SELECT
                 (CAST(epoch_us(ts) AS BIGINT) // 86400000000 + 3) % 7
                     AS dow,
                 (CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24
                     AS hod,
                 CAST(round(value*10000) AS BIGINT) AS v
               FROM events)
            SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT)
                       AS hod,
                   COUNT(*)::BIGINT AS n_events,
                   CAST(SUM(v) AS BIGINT) AS sum_value_e4
            FROM x GROUP BY dow, hod""",
        "rfm_scores": """
            WITH a AS (SELECT user_id,
                 CAST((SELECT max(CAST(epoch_us(ts) AS BIGINT))
                           // 86400000000 FROM events)
                      - max(CAST(epoch_us(ts) AS BIGINT))
                           // 86400000000 AS BIGINT) AS rec_days,
                 COUNT(*)::BIGINT AS freq,
                 CAST(SUM(CAST(round(value*10000) AS BIGINT)) AS BIGINT)
                     AS mon_e4
               FROM events GROUP BY user_id),
            n AS (SELECT COUNT(*)::BIGINT AS nu FROM a)
            SELECT user_id, rec_days, freq, mon_e4,
                   CAST((ROW_NUMBER() OVER (ORDER BY rec_days, user_id)
                         - 1) * 5 // nu AS BIGINT) AS r_q,
                   CAST((ROW_NUMBER() OVER (ORDER BY freq, user_id)
                         - 1) * 5 // nu AS BIGINT) AS f_q,
                   CAST((ROW_NUMBER() OVER (ORDER BY mon_e4, user_id)
                         - 1) * 5 // nu AS BIGINT) AS m_q
            FROM a, n""",
        "spike_days": """
            WITH d AS (SELECT CAST(epoch_us(ts) AS BIGINT)
                           // 86400000000 AS day,
                         COUNT(*)::BIGINT AS n
                       FROM events GROUP BY day),
            w AS (SELECT day, n,
                    COALESCE(SUM(n) OVER (ORDER BY day
                      RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), 0)
                        AS trail7
                  FROM d)
            SELECT CAST(day AS BIGINT) AS day, n AS n_events,
                   CAST(trail7 AS BIGINT) AS trail7,
                   (CASE WHEN trail7 > 0 AND n*7 > 2*trail7
                         THEN 1 ELSE 0 END)::BIGINT AS is_spike
            FROM w""",
        "source_share": """
            SELECT source, COUNT(*)::BIGINT AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS tot_docs,
                   CAST(SUM(SUM(n_chars)) OVER () AS BIGINT)
                       AS tot_chars
            FROM documents GROUP BY source""",
        "peak_day": """
            WITH d AS (SELECT user_id,
                         CAST(epoch_us(ts) AS BIGINT) // 86400000000
                             AS day,
                         COUNT(*)::BIGINT AS n
                       FROM events GROUP BY 1, 2),
            r AS (SELECT user_id, day, n,
                    ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY n DESC, day) AS rn,
                    SUM(n) OVER (PARTITION BY user_id) AS tot
                  FROM d)
            SELECT user_id, CAST(day AS BIGINT) AS top_day,
                   n AS n_top, CAST(tot AS BIGINT) AS n_total
            FROM r WHERE rn = 1""",
        "systematic_sample": """
            WITH r AS (SELECT event_id,
                         ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1
                             AS rank0
                       FROM events)
            SELECT event_id, CAST(rank0 AS BIGINT) AS rank0
            FROM r WHERE rank0 % 100 = 0""",
        "adoption_lag": """
            WITH m AS (SELECT user_id, event_type,
                         min(CAST(epoch_us(ts) AS BIGINT)) AS mt
                       FROM events GROUP BY 1, 2),
            u AS (SELECT user_id, min(mt) AS m0 FROM m
                  GROUP BY user_id)
            SELECT m.user_id, m.event_type,
                   CAST(mt - m0 AS BIGINT) AS lag_us
            FROM m JOIN u USING (user_id)""",
        "session_pairs": """
            WITH s AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                               - CAST(epoch_us(LAG(ts) OVER (
                                   PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS BIGINT)
                               > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events),
            s2 AS (
              SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
              FROM s),
            it AS (SELECT user_id, sid, CASE event_type
                     WHEN 'click' THEN 0 WHEN 'error' THEN 1
                     WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
                     WHEN 'view' THEN 4 END AS item
                   FROM s2),
            d AS (SELECT DISTINCT user_id, sid, item FROM it)
            SELECT a.item AS item_a, b.item AS item_b,
                   COUNT(*)::BIGINT AS n_baskets
            FROM d a JOIN d b ON a.user_id = b.user_id
                             AND a.sid = b.sid AND a.item < b.item
            GROUP BY 1, 2""",
        "type_jaccard": """
            WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
            p AS (SELECT a.event_type AS ta, b.event_type AS tb
                  FROM d a JOIN d b USING (user_id)
                  WHERE a.event_type < b.event_type),
            i AS (SELECT ta, tb, COUNT(*)::BIGINT AS n_inter
                  FROM p GROUP BY 1, 2),
            c AS (SELECT event_type, COUNT(DISTINCT user_id) AS nu
                  FROM events GROUP BY 1)
            SELECT i.ta AS type_a, i.tb AS type_b, n_inter,
                   CAST(ca.nu + cb.nu - n_inter AS BIGINT) AS n_union
            FROM i JOIN c ca ON ca.event_type = i.ta
                   JOIN c cb ON cb.event_type = i.tb""",
        "early_ltv": """
            WITH w AS (SELECT user_id,
                         CAST(epoch_us(ts) AS BIGINT) AS us,
                         CAST(round(value*10000) AS BIGINT) AS v,
                         min(CAST(epoch_us(ts) AS BIGINT))
                             OVER (PARTITION BY user_id) AS m0
                       FROM events)
            SELECT user_id,
                   CAST(SUM(CASE WHEN us - m0 < 604800000000
                                 THEN v ELSE 0 END) AS BIGINT)
                       AS week1_value_e4,
                   CAST(SUM(CASE WHEN us - m0 < 604800000000
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS week1_events,
                   CAST(SUM(v) AS BIGINT) AS total_value_e4
            FROM w GROUP BY user_id""",
        "max_gap_at": """
            WITH s AS (SELECT user_id, event_id, ts,
                         LAG(event_id) OVER w AS prev_id,
                         CAST(epoch_us(ts) AS BIGINT)
                           - CAST(epoch_us(LAG(ts) OVER w) AS BIGINT)
                             AS gap
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id)),
            r AS (SELECT user_id, gap, prev_id, event_id,
                    ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY gap DESC, ts, event_id) AS rn
                  FROM s WHERE gap IS NOT NULL)
            SELECT user_id, CAST(gap AS BIGINT) AS max_gap_us,
                   CAST(prev_id AS BIGINT) AS gap_start_id,
                   event_id AS gap_end_id
            FROM r WHERE rn = 1""",
        "ship_delay": """
            WITH d AS (SELECT o_orderpriority,
                         CAST(epoch_us(l_shipdate) AS BIGINT)
                             // 86400000000
                         - CAST(epoch_us(o_orderdate) AS BIGINT)
                             // 86400000000 AS d
                       FROM lineitem JOIN orders
                         ON l_orderkey = o_orderkey)
            SELECT o_orderpriority, COUNT(*)::BIGINT AS n_items,
                   CAST(SUM(d) AS BIGINT) AS sum_delay_days,
                   CAST(MIN(d) AS BIGINT) AS min_delay_days,
                   CAST(MAX(d) AS BIGINT) AS max_delay_days
            FROM d GROUP BY o_orderpriority""",
        "first_session_size": """
            WITH s AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                               - CAST(epoch_us(LAG(ts) OVER (
                                   PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS BIGINT)
                               > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events),
            s2 AS (
              SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
              FROM s)
            SELECT user_id,
                   CAST(SUM(CASE WHEN sid = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS s0_events,
                   CAST(MAX(sid) + 1 AS BIGINT) AS n_sessions,
                   COUNT(*)::BIGINT AS n_events
            FROM s2 GROUP BY user_id""",
        "concurrency_curve": """
            WITH s AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                               - CAST(epoch_us(LAG(ts) OVER (
                                   PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS BIGINT)
                               > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events),
            s2 AS (
              SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
              FROM s),
            b AS (SELECT user_id, sid,
                    min(CAST(epoch_us(ts) AS BIGINT)) AS st,
                    max(CAST(epoch_us(ts) AS BIGINT)) AS en
                  FROM s2 GROUP BY 1, 2),
            t AS (SELECT st AS t_us, 1 AS s, 0 AS e FROM b
                  UNION ALL SELECT en, 0, 1 FROM b),
            g AS (SELECT t_us, SUM(s) AS n_start, SUM(e) AS n_end
                  FROM t GROUP BY t_us),
            c AS (SELECT t_us, n_start, n_end,
                    SUM(n_start) OVER (ORDER BY t_us) AS cs,
                    SUM(n_end) OVER (ORDER BY t_us) AS ce FROM g)
            SELECT CAST(t_us AS BIGINT) AS t_us,
                   CAST(n_start AS BIGINT) AS n_start,
                   CAST(n_end AS BIGINT) AS n_end,
                   CAST(cs - ce AS BIGINT) AS n_open
            FROM c""",
        "embedding_norms": """
            SELECT CAST(label AS BIGINT) AS label,
                   COUNT(*)::BIGINT AS n_vecs,
                   CAST(SUM(list_sum(list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE)*1000)
                                 AS BIGINT)
                            * CAST(round(CAST(x AS DOUBLE)*1000)
                                   AS BIGINT))))
                       AS BIGINT) AS sum_sq_e6
            FROM embeddings GROUP BY label""",
        "transition_probs": """
            WITH e AS (SELECT user_id, event_type, ts, event_id
                       FROM events),
            p AS (SELECT event_type AS prev_type,
                    LEAD(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS next_type
                  FROM e),
            c AS (SELECT prev_type, next_type, COUNT(*)::BIGINT AS n
                  FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2)
            SELECT prev_type, next_type, n,
                   CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
                       AS n_prev
            FROM c""",
        "island_lengths": """
            WITH s AS (SELECT user_id, event_type, ts, event_id,
                         CASE WHEN event_type = LAG(event_type) OVER w
                              THEN 0 ELSE 1 END AS brk
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id)),
            r AS (SELECT user_id, event_type,
                    SUM(brk) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS rid
                  FROM s),
            g AS (SELECT user_id, event_type, rid, COUNT(*) AS len
                  FROM r GROUP BY 1, 2, 3)
            SELECT event_type, CAST(len AS BIGINT) AS run_len,
                   COUNT(*)::BIGINT AS n_runs
            FROM g GROUP BY 1, 2""",
        "taste_shift": """
            WITH m AS (SELECT (min(CAST(epoch_us(ts) AS BIGINT)
                                   // 86400000000)
                               + max(CAST(epoch_us(ts) AS BIGINT)
                                     // 86400000000) + 1) // 2 AS mid
                       FROM events),
            b AS (SELECT user_id, event_type,
                    CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                              // 86400000000 < (SELECT mid FROM m)
                         THEN 0 ELSE 1 END AS half
                  FROM events),
            c AS (SELECT user_id, half, event_type, COUNT(*) AS n
                  FROM b GROUP BY 1, 2, 3),
            r AS (SELECT user_id, half, event_type,
                    ROW_NUMBER() OVER (PARTITION BY user_id, half
                        ORDER BY n DESC, event_type) AS rn
                  FROM c)
            SELECT a.user_id, a.event_type AS top_first,
                   z.event_type AS top_second
            FROM r a JOIN r z ON a.user_id = z.user_id
            WHERE a.rn = 1 AND z.rn = 1 AND a.half = 0
              AND z.half = 1""",
        "momentum_score": """
            WITH v AS (SELECT user_id, ts, event_id,
                         CAST(round(value*10000) AS BIGINT) AS v
                       FROM events),
            d AS (SELECT user_id, ts, event_id,
                    v - LAG(v) OVER w AS dv
                  FROM v WINDOW w AS (PARTITION BY user_id
                                      ORDER BY ts, event_id)),
            p AS (SELECT user_id,
                    sign(dv) * sign(LAG(dv) OVER (
                        PARTITION BY user_id
                        ORDER BY ts, event_id)) AS prod
                  FROM d)
            SELECT user_id,
                   CAST(SUM(CASE WHEN prod > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_agree,
                   CAST(SUM(CASE WHEN prod < 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_flip
            FROM p WHERE prod IS NOT NULL GROUP BY user_id""",
        "session_handoff": """
            WITH d AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN ts - lag(ts) OVER w > INTERVAL 1800 SECONDS
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (SELECT *, SUM(new_s) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS sid
                  FROM d),
            fl AS (SELECT DISTINCT user_id, sid,
                     FIRST_VALUE(event_type) OVER w2 AS f,
                     LAST_VALUE(event_type) OVER (
                         PARTITION BY user_id, sid ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING) AS l
                   FROM s
                   WINDOW w2 AS (PARTITION BY user_id, sid
                                 ORDER BY ts, event_id)),
            p AS (SELECT f AS next_first,
                    LAG(l) OVER (PARTITION BY user_id ORDER BY sid)
                        AS prev_last
                  FROM fl)
            SELECT prev_last, next_first, COUNT(*)::BIGINT AS n
            FROM p WHERE prev_last IS NOT NULL
            GROUP BY prev_last, next_first""",
        "new_vs_returning": """
            WITH ud AS (SELECT DISTINCT user_id,
                          CAST(epoch_us(ts) AS BIGINT) // 86400000000
                              AS day
                        FROM events),
            f AS (SELECT user_id, min(day) AS fd FROM ud
                  GROUP BY user_id)
            SELECT day, COUNT(*)::BIGINT AS n_active,
                   CAST(SUM(CASE WHEN day = fd THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_new,
                   CAST(SUM(CASE WHEN day > fd THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_returning
            FROM ud JOIN f USING (user_id) GROUP BY day""",
        "extract_toc": _extract_toc_sql(),
        "norm_hist": """
            WITH n AS (SELECT
                CAST(list_sum(list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)
                         * CAST(round(CAST(x AS DOUBLE)*1000)
                                AS BIGINT))) AS BIGINT) AS ss
              FROM embeddings)
            SELECT CAST(ss // 1000000 AS BIGINT) AS norm_bucket,
                   COUNT(*)::BIGINT AS n_vecs
            FROM n GROUP BY ss // 1000000""",
        "ab_split_metrics": """
            WITH x AS (SELECT
                 CAST(md5_number_upper(user_id::VARCHAR) % 2
                      AS BIGINT) AS arm,
                 event_type,
                 CAST(round(value * 10000) AS BIGINT) AS v
               FROM events)
            SELECT arm, event_type, COUNT(*)::BIGINT AS n_events,
                   CAST(SUM(v) AS BIGINT) AS sum_value_e4
            FROM x GROUP BY arm, event_type""",
        "order_status_matrix": """
            SELECT o_orderstatus, o_orderpriority,
                   COUNT(*)::BIGINT AS n_orders,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS total_price_e2
            FROM orders GROUP BY o_orderstatus, o_orderpriority""",
        "bookend_types": """
            WITH s AS (SELECT user_id, event_type,
                         row_number() OVER w AS rn,
                         count(*) OVER (PARTITION BY user_id) AS c
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id)),
            b AS (SELECT f.user_id, f.event_type AS first_type,
                         l.event_type AS last_type
                  FROM s f JOIN s l ON f.user_id = l.user_id
                  WHERE f.rn = 1 AND l.rn = l.c)
            SELECT first_type, last_type, COUNT(*)::BIGINT AS n_users
            FROM b GROUP BY first_type, last_type""",
        "type_dow_profile": """
            WITH x AS (SELECT event_type,
                 (CAST(epoch_us(ts) AS BIGINT) // 86400000000 + 3) % 7
                     AS dow,
                 CAST(round(value * 10000) AS BIGINT) AS v
               FROM events)
            SELECT event_type, CAST(dow AS BIGINT) AS dow,
                   COUNT(*)::BIGINT AS n_events,
                   CAST(SUM(v) AS BIGINT) AS sum_value_e4
            FROM x GROUP BY event_type, dow""",
        "brand_return_rate": """
            WITH l AS (SELECT l_partkey,
                         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
                             AS ret,
                         CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100)
                                       AS BIGINT)) AS rev
                       FROM lineitem)
            SELECT p_brand, COUNT(*)::BIGINT AS n_items,
                   CAST(SUM(ret) AS BIGINT) AS n_returned,
                   CAST(SUM(rev) AS BIGINT) AS revenue_e4,
                   CAST(SUM(ret * rev) AS BIGINT)
                       AS returned_revenue_e4
            FROM l JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand""",
        "user_activity_hist": """
            WITH u AS (SELECT user_id, count(*)::BIGINT AS n_events
                       FROM events GROUP BY user_id)
            SELECT n_events, COUNT(*)::BIGINT AS n_users
            FROM u GROUP BY n_events""",
        "idle_users": """
            WITH m AS (SELECT max(CAST(epoch_us(ts) AS BIGINT)
                               // 86400000000) AS mx FROM events),
            u AS (SELECT user_id,
                    max(CAST(epoch_us(ts) AS BIGINT) // 86400000000)
                        AS last_day
                  FROM events GROUP BY user_id)
            SELECT user_id, CAST(last_day AS BIGINT) AS last_day,
                   CAST(mx - last_day AS BIGINT) AS idle_days
            FROM u, m""",
        "type_trigrams": """
            WITH s AS (SELECT user_id, event_type,
                         LAG(event_type, 2) OVER w AS a,
                         LAG(event_type, 1) OVER w AS b
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id))
            SELECT a AS t1, b AS t2, event_type AS t3,
                   COUNT(*)::BIGINT AS n
            FROM s WHERE a IS NOT NULL GROUP BY a, b, event_type""",
        "type_cadence": """
            WITH g AS (SELECT event_type,
                         epoch_us(ts) - lag(epoch_us(ts)) OVER (
                             PARTITION BY user_id, event_type
                             ORDER BY ts) AS gap
                       FROM events)
            SELECT event_type, count(*)::BIGINT AS n_gaps,
                   min(gap)::BIGINT AS min_gap_us,
                   max(gap)::BIGINT AS max_gap_us,
                   sum(gap)::BIGINT AS sum_gap_us
            FROM g WHERE gap IS NOT NULL GROUP BY event_type""",
        "entry_conversion": """
            WITH s AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                               - CAST(epoch_us(LAG(ts) OVER (
                                   PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS BIGINT)
                               > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events),
            s2 AS (
              SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
              FROM s),
            s3 AS (
              SELECT user_id, sid, event_type,
                     FIRST_VALUE(event_type) OVER (
                         PARTITION BY user_id, sid
                         ORDER BY ts, event_id) AS ft
              FROM s2),
            sess AS (
              SELECT user_id, sid, min(ft) AS first_touch,
                     max(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS conv
              FROM s3 GROUP BY user_id, sid)
            SELECT first_touch, COUNT(*)::BIGINT AS n_sessions,
                   CAST(SUM(conv) AS BIGINT) AS n_converting
            FROM sess GROUP BY first_touch""",
        "source_top_tokens": """
            WITH c AS (SELECT source, t AS token, COUNT(*)::BIGINT
                           AS cnt
                       FROM (SELECT source,
                               unnest(string_split(text, ' ')) AS t
                             FROM documents)
                       GROUP BY source, t)
            SELECT source, token, cnt FROM c
            QUALIFY row_number() OVER (PARTITION BY source
                ORDER BY cnt DESC, token) <= 5""",
        "token_length_hist": """
            SELECT CAST(length(t) AS BIGINT) AS token_len,
                   COUNT(*)::BIGINT AS n_tokens
            FROM (SELECT unnest(string_split(text, ' ')) AS t
                  FROM documents)
            WHERE length(t) >= 1
            GROUP BY length(t)""",
        "gap_hist": """
            WITH g AS (SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts) AS gap
                       FROM events)
            SELECT CAST(gap // 3600000000 AS BIGINT) AS gap_hours,
                   COUNT(*)::BIGINT AS n_gaps
            FROM g WHERE gap IS NOT NULL
            GROUP BY gap // 3600000000""",
        "dedup_keep_best": """
            SELECT md5(text) AS fingerprint,
                   doc_id AS keep_doc_id,
                   CAST(length(text) AS BIGINT) AS keep_chars,
                   CAST(count(*) OVER (PARTITION BY md5(text))
                        AS BIGINT) AS n_dups
            FROM documents
            QUALIFY row_number() OVER (PARTITION BY md5(text)
                ORDER BY length(text) DESC, doc_id) = 1""",
        "dup_size_hist": """
            WITH c AS (SELECT md5(text) AS fp, count(*)::BIGINT
                           AS cluster_size
                       FROM documents GROUP BY md5(text))
            SELECT cluster_size, COUNT(*)::BIGINT AS n_clusters
            FROM c GROUP BY cluster_size""",
        "char_census": """
            SELECT CAST(ord(ch) AS BIGINT) AS byte,
                   COUNT(*)::BIGINT AS n_chars
            FROM (SELECT unnest(string_split(text, '')) AS ch
                  FROM documents)
            GROUP BY ord(ch)""",
        "touches_to_convert": """
            WITH s AS (SELECT user_id, event_type,
                         row_number() OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS rn
                       FROM events)
            SELECT user_id, CAST(min(rn) - 1 AS BIGINT) AS n_touches
            FROM s WHERE event_type = 'purchase' GROUP BY user_id""",
        "order_size_hist": """
            WITH o AS (SELECT l_orderkey, count(*)::BIGINT AS n_lines
                       FROM lineitem GROUP BY l_orderkey)
            SELECT n_lines, COUNT(*)::BIGINT AS n_orders
            FROM o GROUP BY n_lines""",
        "discount_profile": """
            WITH b AS (SELECT
                CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
                CAST(round(l_quantity) AS BIGINT) AS qty,
                CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
              FROM lineitem)
            SELECT disc_pct, COUNT(*)::BIGINT AS n_items,
                   CAST(SUM(qty) AS BIGINT) AS sum_qty,
                   CAST(SUM(rev) AS BIGINT) AS revenue_e4
            FROM b GROUP BY disc_pct""",
        "running_peak": """
            WITH v AS (SELECT event_id, user_id, ts,
                         CAST(round(value * 10000) AS BIGINT) AS v
                       FROM events)
            SELECT event_id, user_id,
                   CAST(MAX(v) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak_e4,
                   (CASE WHEN v > COALESCE(MAX(v) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), -1)
                         THEN 1 ELSE 0 END)::BIGINT AS is_record
            FROM v""",
        "priority_median": """
            SELECT o_orderpriority,
                   CAST(round(median(o_totalprice) * 1000) AS BIGINT)
                     AS median_price_e3
            FROM orders GROUP BY o_orderpriority""",
        "type_corr_parts": """
            WITH p AS (SELECT user_id, event_type,
                         CAST(SUM(CAST(round(value * 10000) AS BIGINT))
                              AS BIGINT) AS s
                       FROM events GROUP BY user_id, event_type)
            SELECT a.event_type AS type_i, b.event_type AS type_j,
                   CAST(SUM(a.s * b.s) AS BIGINT) AS sum_xy_e8
            FROM p a JOIN p b
              ON a.user_id = b.user_id
             AND a.event_type <= b.event_type
            GROUP BY a.event_type, b.event_type""",
        "dim_gram": """
            WITH u AS (
              SELECT vec_id,
                     generate_subscripts(embedding, 1) - 1 AS i,
                     CAST(round(CAST(unnest(embedding) AS DOUBLE)
                                * 1000) AS BIGINT) AS q
              FROM embeddings)
            SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
                   CAST(SUM(a.q * b.q) AS BIGINT) AS sum_prod_e6
            FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY a.i, b.i""",
        "brand_price_quartiles": """
            WITH r AS (SELECT p_brand, p_retailprice,
                         row_number() OVER (
                             PARTITION BY p_brand
                             ORDER BY p_retailprice, p_partkey) AS rn,
                         count(*) OVER (PARTITION BY p_brand) AS c
                       FROM part)
            SELECT p_brand,
                   max(CASE WHEN rn - 1 = 1 * (c - 1) // 4
                            THEN p_retailprice END) AS q1,
                   max(CASE WHEN rn - 1 = 2 * (c - 1) // 4
                            THEN p_retailprice END) AS q2,
                   max(CASE WHEN rn - 1 = 3 * (c - 1) // 4
                            THEN p_retailprice END) AS q3
            FROM r GROUP BY p_brand""",
        "bracket_revenue": """
            WITH j AS (SELECT CASE
                WHEN p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                     AND l_quantity BETWEEN 1 AND 15 THEN 1
                WHEN p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                     AND l_quantity BETWEEN 10 AND 25 THEN 2
                WHEN p_brand = 'Brand#3' AND p_size BETWEEN 25 AND 50
                     AND l_quantity BETWEEN 20 AND 35 THEN 3
                ELSE 0 END AS bracket,
                CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
              FROM lineitem JOIN part ON l_partkey = p_partkey)
            SELECT bracket, COUNT(*)::BIGINT AS n_items,
                   CAST(SUM(rev) AS BIGINT) AS revenue_e4
            FROM j WHERE bracket > 0 GROUP BY bracket""",
        "last_touch": """
            WITH s AS (
              SELECT event_id, user_id, ts, event_type,
                     CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                               - CAST(epoch_us(LAG(ts) OVER (
                                   PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS BIGINT)
                               > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events),
            s2 AS (
              SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
              FROM s),
            s3 AS (
              SELECT event_id, user_id, session_id, event_type,
                     COALESCE(LAG(event_type) OVER (
                       PARTITION BY user_id, session_id
                       ORDER BY ts, event_id), '(direct)') AS last_touch
              FROM s2)
            SELECT event_id, user_id, session_id::BIGINT AS session_id,
                   last_touch
            FROM s3 WHERE event_type = 'purchase'""",
        "purchase_gaps": """
            WITH g AS (SELECT user_id,
                         epoch_us(ts) - lag(epoch_us(ts)) OVER (
                             PARTITION BY user_id ORDER BY ts) AS gap
                       FROM events WHERE event_type = 'purchase')
            SELECT user_id, count(*)::BIGINT AS n_gaps,
                   min(gap)::BIGINT AS min_gap_us,
                   max(gap)::BIGINT AS max_gap_us,
                   sum(gap)::BIGINT AS sum_gap_us
            FROM g WHERE gap IS NOT NULL GROUP BY user_id""",
        "customer_order_gaps": """
            WITH g AS (SELECT o_custkey,
                         epoch_us(o_orderdate)
                         - lag(epoch_us(o_orderdate)) OVER (
                             PARTITION BY o_custkey
                             ORDER BY o_orderdate) AS gap
                       FROM orders)
            SELECT o_custkey, count(*)::BIGINT AS n_gaps,
                   min(gap)::BIGINT AS min_gap_us,
                   max(gap)::BIGINT AS max_gap_us,
                   sum(gap)::BIGINT AS sum_gap_us
            FROM g WHERE gap IS NOT NULL GROUP BY o_custkey""",
        "length_histogram": """
            WITH b AS (SELECT n_chars,
                         CAST(length(bin(n_chars)) - 1 AS BIGINT)
                             AS bucket
                       FROM documents WHERE n_chars >= 1)
            SELECT bucket, COUNT(*)::BIGINT AS n_docs,
                   MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
            FROM b GROUP BY bucket""",
        "dim_stats": """
            WITH u AS (
              SELECT generate_subscripts(embedding, 1) - 1 AS dim,
                     CAST(round(CAST(unnest(embedding) AS DOUBLE)
                                * 1000) AS BIGINT) AS q
              FROM embeddings)
            SELECT CAST(dim AS BIGINT) AS dim, COUNT(*)::BIGINT AS n,
                   MIN(q) AS min_e3, MAX(q) AS max_e3,
                   CAST(SUM(q) AS BIGINT) AS sum_e3
            FROM u GROUP BY dim""",
        "kwic_first": """
            WITH p AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
                         CAST(position('merge' IN text) AS BIGINT) AS pos
                       FROM documents)
            SELECT doc_id, pos,
                   substr(text,
                          CAST(greatest(1, pos - 24) AS BIGINT),
                          CAST(pos - greatest(1, pos - 24) AS BIGINT))
                       AS left_ctx,
                   substr(text, pos + 5, 24) AS right_ctx
            FROM p WHERE pos > 0""",
        "value_cume": """
            WITH r AS (SELECT event_id, user_id,
                         CAST(round(value*10000) AS BIGINT) AS v
                       FROM events)
            SELECT event_id, user_id,
                   COUNT(*) OVER (PARTITION BY user_id ORDER BY v
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cd_num,
                   COUNT(*) OVER (PARTITION BY user_id) AS cd_den
            FROM r""",
        "running_distinct": """
            WITH f AS (
              SELECT event_id, user_id, ts,
                     CASE WHEN row_number() OVER (
                            PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) = 1
                          THEN 1 ELSE 0 END AS is_first
              FROM events)
            SELECT event_id, user_id,
                   SUM(is_first) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING)::BIGINT
                     AS n_distinct
            FROM f""",
        "event_lag": """
            WITH v AS (SELECT event_id, user_id, ts,
                              CAST(round(value*10000) AS BIGINT) AS v
                       FROM events)
            SELECT event_id, user_id,
                   COALESCE(LAG(event_id) OVER w, -1)::BIGINT AS prev_id,
                   COALESCE(CAST(epoch_us(ts) AS BIGINT)
                            - CAST(epoch_us(LAG(ts) OVER w) AS BIGINT),
                            -1)::BIGINT AS dt_us,
                   COALESCE(v - LAG(v) OVER w, 0)::BIGINT AS dv
            FROM v WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id)""",
        "important_parts": """
            WITH pp AS (
              SELECT l_partkey,
                     SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                         )::BIGINT AS sum_cents
              FROM lineitem GROUP BY 1),
            tot AS (SELECT SUM(sum_cents) AS t, count(*) AS n FROM pp)
            SELECT l_partkey, sum_cents
            FROM pp, tot WHERE sum_cents * 5 * n > 6 * t""",
        "dense_topk": """
            WITH v AS (SELECT event_id, event_type,
                              CAST(round(value) AS BIGINT) AS value_e0
                       FROM events)
            SELECT event_id, event_type, value_e0,
                   DENSE_RANK() OVER (PARTITION BY event_type
                                      ORDER BY value_e0 DESC)::BIGINT
                     AS rank
            FROM v QUALIFY rank <= 3""",
        "value_centered": """
            WITH v AS (SELECT event_id, user_id,
                              CAST(round(value*10000) AS BIGINT) AS v
                       FROM events)
            SELECT event_id, user_id,
                   (count(*) OVER w)::BIGINT AS n_key,
                   (v * count(*) OVER w - sum(v) OVER w)::BIGINT AS dev_n
            FROM v WINDOW w AS (PARTITION BY user_id)""",
        "zorder_layout": f"""
            SELECT event_id, {_zorder_sql} AS zkey
            FROM events""",
        # RFC 9309 longest-match per synthesized host rules: src0 all
        # blocked; src1 '/1' prefix blocked unless '/12' (Allow longer);
        # src2 anchored '*7$'; other hosts allowed
        "robots_gate": """
            SELECT 'doc://' || source || '/' || doc_id AS url,
                   doc_id
            FROM documents
            WHERE NOT (source = 'src0'
                   OR (source = 'src1'
                       AND doc_id::VARCHAR LIKE '1%'
                       AND doc_id::VARCHAR NOT LIKE '12%')
                   OR (source = 'src2'
                       AND doc_id::VARCHAR LIKE '%7'))""",
        "incremental_dedup": """
            WITH a AS (
              SELECT md5(text) AS fp FROM documents WHERE doc_id % 4 <= 1),
            b AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 4 >= 1
              UNION ALL
              SELECT doc_id + 100000000, text FROM documents
              WHERE doc_id % 4 = 2)
            SELECT min(doc_id)::BIGINT AS doc_id,
                   md5(text) AS fingerprint,
                   count(*)::BIGINT AS n_dups
            FROM b WHERE md5(text) NOT IN (SELECT fp FROM a)
            GROUP BY md5(text)""",
        # exact all-pairs char-shingle Jaccard (integer n_inter/n_union —
        # no float hashing); the size prefilter (J>=t => min >= t*max) only
        # drops provably-below-threshold pairs. LSH recall at the threshold
        # is 1.0 on this corpus (see MINHASH note).
        "minhash_dups": f"""
            WITH {_MINHASH_CTES}
            SELECT id_a, id_b, n_inter, n_union FROM sim
            WHERE {_MINHASH_COND}""",
        # same exact pair set, clustered: WITH RECURSIVE reachability walk
        # (c reachable from u) -> component = min reachable id
        "neardup_clusters": f"""
            WITH RECURSIVE {_MINHASH_CTES},
            pairs AS (
              SELECT id_a, id_b FROM sim WHERE {_MINHASH_COND}),
            edges AS (
              SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
            walk(u, c) AS (
              SELECT u, u FROM edges
              UNION
              SELECT e.u, w.c FROM edges e JOIN walk w ON e.v = w.u)
            SELECT CAST(u AS BIGINT) AS doc_id,
                   CAST(min(c) AS BIGINT) AS component
            FROM walk GROUP BY u""",
        "top_user_per_type": """
            WITH c AS (SELECT event_type, user_id,
                              count(*)::BIGINT AS n
                       FROM events GROUP BY 1, 2)
            SELECT event_type, user_id, n FROM c
            QUALIFY row_number() OVER (PARTITION BY event_type
                                       ORDER BY n DESC, user_id) = 1""",
        "user_rolling_7d": """
            WITH d AS (
              SELECT user_id,
                     (epoch_us(ts) // 86400000000)::BIGINT AS day,
                     count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2)
            SELECT user_id, day, n,
                   CAST(sum(n) OVER (PARTITION BY user_id ORDER BY day
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS n_7d
            FROM d""",
        "shipping_priority": """
            SELECT l_orderkey,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                     AS revenue_e4
            FROM lineitem
            WHERE l_orderkey IN (
              SELECT o_orderkey FROM orders
              WHERE o_custkey IN (SELECT c_custkey FROM customer
                                  WHERE c_mktsegment = 'BUILDING'))
            GROUP BY l_orderkey
            ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10""",
        "cohort_retention": """
            WITH e AS (
              SELECT user_id,
                     (epoch_us(ts) // 86400000000)::BIGINT AS day
              FROM events),
            f AS (
              SELECT user_id, min(day) AS cohort_day FROM e
              GROUP BY user_id)
            SELECT f.cohort_day,
                   (e.day - f.cohort_day)::BIGINT AS day_offset,
                   count(DISTINCT e.user_id)::BIGINT AS n_users
            FROM e JOIN f USING (user_id)
            GROUP BY 1, 2""",
        "length_rank": """
            SELECT doc_id, lang, n_chars::BIGINT AS n_chars,
                   (row_number() OVER (PARTITION BY lang
                      ORDER BY n_chars, doc_id))::BIGINT AS rank
            FROM documents""",
        "pack_offsets": """
            SELECT doc_id, n_chars::BIGINT AS n_chars,
                   start_off,
                   (start_off // 1024)::BIGINT AS first_example,
                   (CASE WHEN n_chars > 0
                         THEN (start_off + n_chars - 1) // 1024
                         ELSE start_off // 1024 END)::BIGINT
                     AS last_example
            FROM (SELECT doc_id, n_chars,
                         (sum(n_chars::BIGINT) OVER (ORDER BY doc_id)
                          - n_chars)::BIGINT AS start_off
                  FROM documents)""",
        "shuffle_assign": """
            SELECT doc_id, n_chars::BIGINT AS n_chars,
                   (md5_number_upper(doc_id::VARCHAR) % 16)::BIGINT
                     AS shard,
                   (row_number() OVER (
                      PARTITION BY md5_number_upper(doc_id::VARCHAR) % 16
                      ORDER BY md5_number_upper(doc_id::VARCHAR) >> 1,
                               doc_id) - 1)::BIGINT AS pos
            FROM documents""",
        "negative_pairs": _negative_pairs_sql(),
        # integer PMI ingredients only — the float log is the caller's
        "collocations": """
            WITH toks AS (
              SELECT list_filter(
                       regexp_split_to_array(text, '[ \t\r\n\f\v]+'),
                       t -> t <> '') AS a
              FROM documents),
            uni AS (SELECT unnest(a) AS w FROM toks),
            ucnt AS (SELECT w, count(*)::BIGINT AS n FROM uni GROUP BY w),
            big AS (
              SELECT unnest([a[i] || ' ' || a[i+1]
                             for i in range(1, len(a))]) AS bg
              FROM toks),
            bcnt AS (SELECT bg, count(*)::BIGINT AS n_pair
                     FROM big GROUP BY bg),
            top AS (SELECT bg, n_pair FROM bcnt
                    ORDER BY n_pair DESC, bg LIMIT 20)
            SELECT split_part(bg, ' ', 1) AS w1,
                   split_part(bg, ' ', 2) AS w2, n_pair,
                   u1.n AS n_w1, u2.n AS n_w2,
                   (SELECT count(*)::BIGINT FROM uni) AS n_total
            FROM top
            JOIN ucnt u1 ON u1.w = split_part(bg, ' ', 1)
            JOIN ucnt u2 ON u2.w = split_part(bg, ' ', 2)""",
        # the integer-exact iterative tier: unrolled-CTE twins (the
        # pagerank discipline applied to clustering — see _kmeans_sql)
        "kmeans_assign": _kmeans_sql(n_iter=5, k=8, scale=1000),
        "semantic_dedup": _semantic_dedup_sql(n_iter=5, k=8, scale=1000,
                                              p=361, q=400),
        # scaled-int sums: CAST to DOUBLE before the multiply so both
        # sides compute floor over the same float64 product
        "embedding_centroids": """
            SELECT label::BIGINT AS label, dim,
                   CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000)
                                 AS BIGINT)) AS BIGINT) AS sum_scaled,
                   count(*)::BIGINT AS n_vecs
            FROM (SELECT label, unnest(embedding) AS v,
                         (generate_subscripts(embedding, 1) - 1)::BIGINT
                           AS dim
                  FROM embeddings)
            GROUP BY 1, 2""",
        # the synthetic signal is an integer function of (doc_id, i) so
        # the decoded sample features are SQL-recomputable exactly
        "audio_features": """
            SELECT doc_id AS id,
                   (8000 + (doc_id % 4) * 4000)::BIGINT AS sample_rate,
                   1::BIGINT AS channels,
                   16::BIGINT AS bits_per_sample,
                   n_chars::BIGINT AS n_samples,
                   (n_chars::BIGINT * 1000000)
                     // (8000 + (doc_id % 4) * 4000) AS duration_us,
                   COALESCE(CAST(list_sum(
                     [((i*7+doc_id)%65536-32768)*((i*7+doc_id)%65536-32768)
                      for i in range(0, n_chars)]) AS BIGINT), 0) AS sum_sq,
                   COALESCE(CAST(list_max(
                     [abs((i*7+doc_id)%65536-32768)
                      for i in range(0, n_chars)]) AS BIGINT), 0) AS peak
            FROM documents""",
        # decimate-by-2: the surviving samples are the even indices of
        # the same synth formula; rate halves, count = ceil(n/2)
        "audio_resample": """
            SELECT doc_id AS id,
                   ((8000 + (doc_id % 4) * 4000) // 2)::BIGINT
                     AS sample_rate,
                   ((n_chars + 1) // 2)::BIGINT AS n_samples,
                   (((n_chars + 1) // 2)::BIGINT * 1000000)
                     // ((8000 + (doc_id % 4) * 4000) // 2) AS duration_us,
                   COALESCE(CAST(list_sum(
                     [((i*7+doc_id)%65536-32768)*((i*7+doc_id)%65536-32768)
                      for i in range(0, n_chars, 2)]) AS BIGINT), 0)
                     AS sum_sq,
                   COALESCE(CAST(list_max(
                     [abs((i*7+doc_id)%65536-32768)
                      for i in range(0, n_chars, 2)]) AS BIGINT), 0)
                     AS peak
            FROM documents""",
        # halved hash (>>1) keeps UBIGINT int64-safe; >>1 is monotonic so
        # the quota membership is identical on both sides
        "stratified_sample": """
            SELECT doc_id, lang, n_chars::BIGINT AS n_chars FROM documents
            QUALIFY row_number() OVER (
              PARTITION BY lang
              ORDER BY md5_number_upper(doc_id::VARCHAR) >> 1, doc_id)
              <= 30""",
        # fixed 10-token windows; list-comprehension chunking mirrors the
        # engine's offsets-based chunk grouping exactly
        "dup_spans": _dup_spans_sql(),
        "span_dedup": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(text, '[^ \t\r\n\f\v]+') AS w
              FROM documents),
            chunks AS (
              SELECT doc_id, generate_subscripts(cl, 1) - 1 AS span_idx,
                     unnest(cl) AS span
              FROM (SELECT doc_id,
                           [array_to_string(w[(i-1)*10+1 : i*10], ' ')
                            for i in range(1, (len(w)+9)//10 + 1)] AS cl
                    FROM toks)),
            keep AS (
              SELECT doc_id, span_idx, span FROM chunks
              QUALIFY row_number() OVER (PARTITION BY span
                                         ORDER BY doc_id, span_idx) = 1)
            SELECT doc_id,
                   string_agg(span, ' ' ORDER BY span_idx) AS text,
                   count(*)::BIGINT AS n_spans
            FROM keep GROUP BY doc_id""",
        "neardup_keep_one": f"""
            WITH RECURSIVE {_MINHASH_CTES},
            pairs AS (
              SELECT id_a, id_b FROM sim WHERE {_MINHASH_COND}),
            edges AS (
              SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
            walk(u, c) AS (
              SELECT u, u FROM edges
              UNION
              SELECT e.u, w.c FROM edges e JOIN walk w ON e.v = w.u),
            assign AS (
              SELECT u AS doc_id, min(c) AS component FROM walk GROUP BY u)
            SELECT d.doc_id, d.lang, d.n_chars::BIGINT AS n_chars
            FROM documents d
            WHERE d.doc_id NOT IN
              (SELECT doc_id FROM assign WHERE doc_id != component)""",
        "pagerank": _pagerank_sql(),
        "trustrank": _trustrank_sql(),
        "hits": _hits_sql(),
        "triangles": _triangles_sql(),
        "local_clustering": _local_clustering_sql(),
        "kcore": _kcore_sql(),
        "communities": _communities_sql(),
        "crawl_depth": _crawl_depth_sql(),
        "shared_chunks": _shared_chunks_sql(),
        "template_chunks": _template_chunks_sql(),
        "strip_boilerplate": _strip_boilerplate_sql(),
        "graph_walks": _graph_walks_sql(),
        "cocitation": _cocitation_sql(),
        "extract_links": _extract_links_sql(),
        "extract_tables": _extract_tables_sql(),
        "extract_jsonld": _extract_jsonld_sql(),
        "anchor_text": _anchor_text_sql(),
        "crawl_frontier": _crawl_frontier_sql(),
        "link_pagerank": _link_pagerank_sql(),
        "bm25_topk": _bm25_sql(),
        "url_dedup": _url_dedup_sql(),
        "contamination_scan": _contamination_sql(),
        "mixture_sample": _mixture_sql(),
        "lm_score": _lm_score_sql(),
        "meta_extract": _meta_extract_sql(),
        "ngram_decontaminate": _ngram_decontaminate_sql(),
        # word-trigram variant of the exact all-pairs Jaccard oracle
        "ppjoin_dups": _ppjoin_dups_sql(),
        "jaccard_knn": _jaccard_knn_sql(),
        "editdist_dups": _editdist_sql(),
        "editdist2_dups": _editdist2_sql(),
        "dup_owner": _dup_owner_sql(),
        "postings_compress": _postings_compress_sql(),
        "containment_dups": _containment_sql(),
        "gram_novelty": _gram_novelty_sql(),
        "bpe_merges": _bpe_merges_sql(),
        "weighted_sample": _weighted_sample_sql(),
        "doc_keywords": _doc_keywords_sql(),
        "collapse_repeats": _collapse_repeats_sql(),
        "curate_corpus": _curate_corpus_sql(),
        "rollup_stats": _rollup_stats_sql(),
        "cube_stats": _cube_stats_sql(),
        "strip_repeated": _strip_repeated_sql(),
        "canonical_resolve": _canonical_resolve_sql(),
        "ngram_dups": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(text, '[^ \t\r\n\f\v]+') AS w
              FROM documents),
            sh AS (
              SELECT doc_id, CASE
                WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
                WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                    for i in range(1, len(w) - 1)])
              END AS s FROM toks),
            cand AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
               AND least(len(a.s), len(b.s))
                   >= 0.5 * greatest(len(a.s), len(b.s))),
            sim AS (
              SELECT id_a, id_b,
                     len(list_intersect(sa, sb))::BIGINT AS n_inter,
                     (len(sa) + len(sb) - len(list_intersect(sa, sb)))::BIGINT
                       AS n_union
              FROM cand)
            SELECT id_a, id_b, n_inter, n_union FROM sim
            WHERE n_union = 0 OR n_inter / n_union >= 0.5""",
        "winnow_fingerprint": _WINNOW_SQL,
        "hash_embed": _HASH_EMBED_SQL,
        "text_semantic_dups": _TEXT_DUPS_SQL,
        "rag_chunks": sql_chunk_tokens(CHUNK_WINDOW, CHUNK_STEP),
        "token_entropy": _TOKEN_ENTROPY_SQL,
        # exact all-pairs Hamming over the md5-based simhash fingerprint
        # (sql_simhash_fingerprints == simhash64 bit-for-bit); pigeonhole
        # banding with bands=4 > max_dist=3 makes engine recall exact.
        "simhash_dups": f"""
            WITH fp AS ({_SIMHASH_FP_SQL})
            SELECT a.id AS id_a, b.id AS id_b,
                   bit_count(xor(a.fp, b.fp))::BIGINT AS hamming
            FROM fp a JOIN fp b ON a.id < b.id
            WHERE bit_count(xor(a.fp, b.fp)) <= 3""",
        # the engine maps the unsigned fingerprint into signed space by
        # flipping the top bit (skey = u - 2^63); the twin performs the
        # same flip in HUGEINT (no BIGINT literal fits 2^63) and ranges
        # in HUGEINT so no subtraction can overflow — DuckDB plans the
        # BETWEEN predicate as an IEJoin, its own sorted-neighborhood
        "fp_neighbors": f"""
            WITH fp AS ({_SIMHASH_FP_SQL}),
            sk AS (SELECT id, CAST(CASE WHEN fp >= 0
                     THEN CAST(fp AS HUGEINT) - 9223372036854775808
                     ELSE CAST(fp AS HUGEINT) + 9223372036854775808 END
                   AS BIGINT) AS skey FROM fp)
            SELECT a.id AS id_a, b.id AS id_b,
                   CAST(abs(CAST(a.skey AS HUGEINT) - b.skey) AS BIGINT)
                     AS fp_dist
            FROM sk a JOIN sk b
              ON a.id < b.id
             AND CAST(b.skey AS HUGEINT)
                 BETWEEN CAST(a.skey AS HUGEINT) - {FPN_DELTA}
                     AND CAST(a.skey AS HUGEINT) + {FPN_DELTA}""",
        "ann_topk": _ANN_TOPK_SQL,
        # full-probe IVF == brute force (tests/test_ann.py equivalence), so
        # the exact top-k SQL is a true oracle for the IVF code path too
        "ann_ivf_topk": _ANN_TOPK_SQL,
        # integer-exact PQ chain (train/encode/ADC all int64 — the
        # kmeans_assign discipline per subspace; see _pq_topk_sql)
        "pq_topk": _pq_topk_sql(m=8, k=8, n_iter=3, scale=1000,
                                topk=ANN_K, qids=ANN_QUERY_IDS),
        "embedding_dups": _EMB_DUPS_SQL,
        # the LSH-bucketed variant reaches recall 1.0 on this corpus
        # (q_embedding_lsh_dups note), so the exact-pairs SQL is its oracle
        "embedding_lsh_dups": _EMB_DUPS_SQL,
        # IVF multi-probe at n_assign=3 also reaches recall 1.0 here
        "ivf_dups": _EMB_DUPS_SQL,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty,
                   CAST(round(sum(l_extendedprice) * 100) AS BIGINT) AS sum_price_cents,
                   CAST(round(avg(l_discount) * 1000000) AS BIGINT) AS avg_disc_micro,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "orders_by_region": """
            SELECT r_name, count(*) AS n_orders,
                   CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS sum_price_cents
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name""",
        "top_orders": """
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
        "late_orders": """
            SELECT o_orderpriority, count(*)::BIGINT AS n_late
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate
                                               + INTERVAL 60 DAY)
            GROUP BY o_orderpriority""",
        "returned_revenue": _returned_revenue_sql(),
        "local_volume": _local_volume_sql(),
        "big_orders": _big_orders_sql(),
        "promo_revenue": _promo_revenue_sql(),
        "user_event_pivot": _user_event_pivot_sql(),
        "type_distinct_users": """
            SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
            FROM events GROUP BY event_type""",
        "value_moments": _value_moments_sql(),
        "user_pareto": _user_pareto_sql(),
        "table_digest": _table_digest_sql(),
        "chars_ntile": _chars_ntile_sql(),
        "sorted_layout": _sorted_layout_sql(),
        "basket_pairs": _basket_pairs_sql(),
        "user_paths": _user_paths_sql(),
        "user_value_integral": _user_value_integral_sql(),
        "value_outliers": _value_outliers_sql(),
        "k_anon_events": _k_anon_events_sql(),
        "heavy_bigrams": """
            WITH arrs AS (
              SELECT list_filter(regexp_split_to_array(text,
                     '[ \t\r\n\f\v]+'), t -> t <> '') AS a
              FROM documents),
            bg AS (
              SELECT unnest([a[i] || ' ' || a[i+1]
                             for i in range(1, len(a))]) AS token
              FROM arrs)
            SELECT token, count(*)::BIGINT AS n FROM bg GROUP BY token
            HAVING count(*) >= (SELECT greatest(1, ceil(0.001 * count(*)))
                                FROM bg)""",
        "distinct_users": """
            SELECT event_type,
                   count(DISTINCT user_id)::BIGINT AS n_distinct
            FROM events GROUP BY event_type""",
        "distinct_users_hll": _HLL_ORACLE,
        "events_rollup": """
            SELECT event_type, count(*) AS n_events,
                   CAST(round(sum(value) * 10000) AS BIGINT) AS sum_value_e4,
                   CAST(round(avg(value) * 1000000) AS BIGINT) AS avg_value_micro,
                   CAST(round(max(value) * 10000) AS BIGINT) AS max_value_e4
            FROM events GROUP BY event_type""",
        "events_median": """
            SELECT event_type,
                   CAST(round(median(value) * 10000) AS BIGINT)
                     AS median_value_e4
            FROM events GROUP BY event_type""",
        # deterministic log-bucket histogram sketch (fixed power-of-2
        # boundaries -> integer-exact twin; see _events_median_sketch_sql)
        "events_median_sketch": _events_median_sketch_sql(
            sub_bits=5, scale=100, qnum=1, qden=2),
        "funnel": _funnel_sql(),
        "interval_coverage": _interval_coverage_sql(),
        "vocab_coverage": _vocab_coverage_sql(),
        "path_census": _path_census_sql(),
        "session_stats": """
            WITH d AS (
              SELECT event_id, user_id, ts,
                     CASE WHEN ts - lag(ts) OVER w > INTERVAL 1800 SECONDS
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            s AS (
              SELECT user_id, ts,
                     CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING)
                          AS BIGINT) AS session_id
              FROM d)
            SELECT user_id, session_id,
                   count(*) AS n_events,
                   CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
                        AS BIGINT) AS span_s
            FROM s GROUP BY user_id, session_id""",
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(*) AS n_events,
                   CAST(round(sum(value) * 10000) AS BIGINT) AS sum_value_e4
            FROM events GROUP BY 1, 2""",
        # hopping windows: every event belongs to size/hop = 2 windows;
        # window starts via integer epoch-microsecond arithmetic, exactly
        # the engine's numpy construction
        "events_hourly_sliding": """
            SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000
                                  - k.k * 3600000000) AS window_start,
                   event_type,
                   count(*) AS n_events,
                   CAST(round(sum(value) * 10000) AS BIGINT) AS sum_value_e4
            FROM events, (SELECT unnest(range(2)) AS k) k
            GROUP BY 1, 2""",
        "sliding_distinct_users": """
            SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000
                                  - k.k * 3600000000) AS window_start,
                   count(DISTINCT user_id)::BIGINT AS n_users
            FROM events, (SELECT unnest(range(2)) AS k) k
            GROUP BY 1""",
        "events_value_bucket": f"""
            SELECT b.bucket::BIGINT AS bucket, count(*) AS n_events
            FROM events e
            JOIN (VALUES {", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in VALUE_BUCKETS)})
                 b(bucket, lo, hi)
              ON e.value >= b.lo AND e.value < b.hi
            GROUP BY b.bucket""",
        "asof_last_purchase": """
            SELECT l.event_id, l.user_id, l.ts,
                   r.event_id AS p_event_id,
                   CAST(round(r.value * 10000) AS BIGINT) AS p_value_e4
            FROM (SELECT * FROM events WHERE event_type = 'click') l
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts > r.ts""",
        # md5-derived fake decode: dims are digest bytes 0/1 ==
        # (md5_number_upper >> 0/8) & 255 (DuckDB packs the first 8 digest
        # bytes little-endian; verified empirically)
        "decode_images": """
            SELECT doc_id AS id,
                   CAST(64 + (md5_number_upper(text) & 255) % 192 AS BIGINT)
                     AS width,
                   CAST(64 + ((md5_number_upper(text) >> 8) & 255) % 192
                        AS BIGINT) AS height,
                   octet_length(encode(text))::BIGINT AS n_bytes
            FROM documents""",
        # real PNG round-trip: the engine encodes (1 + len % 64) x
        # (1 + tokens % 64) PNGs and header-parses them back; the oracle
        # recomputes the dims straight from the text
        "image_meta": f"""
            SELECT doc_id AS id, 'ok' AS status, 'png' AS format,
                   CAST(1 + length(text) % 64 AS BIGINT) AS width,
                   CAST(1 + {sql_token_count('text')} % 64 AS BIGINT) AS height,
                   8::BIGINT AS bpp, 'gray' AS colorspace,
                   0::BIGINT AS dpi_x, 0::BIGINT AS dpi_y
            FROM documents""",
        # dims of a (2+len%64) x (2+tokens%64) image after scale-0.5
        # nearest-neighbor resize: floor halves (source dims >= 2);
        # format alternates by doc_id parity (even=png, odd=bmp) — the
        # resized payload must round-trip in its ORIGINAL format
        "image_dups": _image_dups_sql(),
        "image_resize": f"""
            SELECT doc_id AS id, 'ok' AS status,
                   CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp'
                        WHEN 2 THEN 'gif' ELSE 'jpeg' END AS format,
                   CAST((2 + length(text) % 64) // 2 AS BIGINT) AS width,
                   CAST((2 + {sql_token_count('text')} % 64) // 2 AS BIGINT)
                     AS height
            FROM documents""",
    }


__all__ = [_n for _n in dict(globals()) if not _n.startswith('__')]
