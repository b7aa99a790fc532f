"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on sf0.001: documents → token table → fixed-stride
    frame windows with the full aggregate family + lag/lead context.

    The 100 TB shape: stateless zero-shuffle ``map_batches`` over
    zero-copy Arrow (SURVEY §7.1-§7.2); driver smoke-checks rows ≥ 0.
    """
    from podcast_audio_feature_extraction_ray.pipelines import queries as q

    return q.g_window_aggs(SF0001)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from podcast_audio_feature_extraction_ray.pipelines import queries as q

    return {
        "w1_frame_windows": q.w1_frame_windows,
        "w2_chunked_frame_windows": q.w2_chunked_frame_windows,
        "w2b_sidechannel_sessions": q.w2b_sidechannel_sessions,
        "w2c_blockref_sessions": q.w2c_blockref_sessions,
        "w3_segment_windows": q.w3_segment_windows,
        "g_window_aggs": q.g_window_aggs,
        "lag_lead_windows": q.lag_lead_windows,
        "asof_backfill_events": q.asof_backfill_events,
        "sessionize_events_q": q.sessionize_events_q,
        "m1_semi_join": q.m1_semi_join,
        "t6_anti_join": q.t6_anti_join,
        "t1_topk": q.t1_topk,
        "t2_topk_backfill": q.t2_topk_backfill,
        "t4_stride_sample": q.t4_stride_sample,
        "s3_shard_key": q.s3_shard_key,
        "m9_parse_segment_id": q.m9_parse_segment_id,
        "g6_debate_metric": q.g6_debate_metric,
        "g7_disapproval_metric": q.g7_disapproval_metric,
        "g4_thresholded_freq": q.g4_thresholded_freq,
        "q1_agg": q.q1_agg,
        # training-data pipeline operators
        "dedup_exact": q.dedup_exact,
        "dedup_ngram_jaccard": q.dedup_ngram_jaccard,
        "dedup_minhash_lsh": q.dedup_minhash_lsh,   # rows-only
        "dedup_simhash": q.dedup_simhash,           # rows-only
        "ann_cosine_topk": q.ann_cosine_topk,
        "ann_lsh_topk": q.ann_lsh_topk,             # rows-only
        "ann_ivf_topk": q.ann_ivf_topk,             # rows-only
        "emb_neardup_toppairs": q.emb_neardup_toppairs,
        "lang_quality": q.lang_quality,
        "langid_ngram_q": q.langid_ngram_q,
        "token_count": q.token_count,
        "doc_fingerprint": q.doc_fingerprint,       # rows-only
        "multimodal_decode": q.multimodal_decode,
        "multimodal_png_decode": q.multimodal_png_decode,
        "multimodal_frame_sample": q.multimodal_frame_sample,
        # remaining reference-op coverage
        "s4_json_extract": q.s4_json_extract,
        "m8_fillna": q.m8_fillna,
        "w4_point_lookup": q.w4_point_lookup,
        "g8_collect": q.g8_collect,
        "j2_point_lookup": q.j2_point_lookup,
        "j5_hash_join": q.j5_hash_join,
        "sessionize_assemble": q.sessionize_assemble,
        "t5_resumable_roundtrip": q.t5_resumable_roundtrip,
        "m2_normalize": q.m2_normalize,
        "m7_mood_filter": q.m7_mood_filter,
        "tumbling_window_agg": q.tumbling_window_agg,
        "hopping_window_agg": q.hopping_window_agg,
        "distinct_values": q.distinct_values,
        "range_join_count": q.range_join_count,
        "session_window_rollup": q.session_window_rollup,
        "train_test_split": q.train_test_split,
        "pack_training_sequences": q.pack_training_sequences,  # rows-only
        "model_score_windows": q.model_score_windows,
        "t3_scored_source": q.t3_scored_source,
        "t3_bm25": q.t3_bm25,
        "j4_qrels_eval": q.j4_qrels_eval,
        "s12_dead_letter": q.s12_dead_letter,
        "vocab_topk": q.vocab_topk,
        "quality_filter": q.quality_filter,
        "contamination_check_q": q.contamination_check_q,
        "unk_remap": q.unk_remap,
        "m3_clean_text": q.m3_clean_text,
        "s11_json_roundtrip": q.s11_json_roundtrip,
        "dedup_lsh_verified": q.dedup_lsh_verified,  # rows-only
        "dedup_clusters": q.dedup_clusters,          # rows-only
        "repetition_signals_q": q.repetition_signals_q,
        "tfidf_top_terms": q.tfidf_top_terms,
        "audio_frame_energy": q.audio_frame_energy,
        "dup_span_grams_q": q.dup_span_grams_q,
        "grouped_topk_docs": q.grouped_topk_docs,
        "quantiles_by_source": q.quantiles_by_source,
        "mix_sample_q": q.mix_sample_q,
        "s13_csv_roundtrip": q.s13_csv_roundtrip,
        "unigram_nll_scores": q.unigram_nll_scores,  # rows-only (ln not cross-libm exact)
        "hll_distinct_tokens": q.hll_distinct_tokens,  # rows-only (sketch)
        "semdedup_q": q.semdedup_q,  # rows-only (k-means + chained drop)
        "ordered_export": q.ordered_export,
        "curation_pipeline": q.curation_pipeline,
        "dup_span_hashed_q": q.dup_span_hashed_q,  # rows-only (hash family)
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names)."""
    from podcast_audio_feature_extraction_ray.pipelines.sql_oracles import SQL

    return dict(SQL)
