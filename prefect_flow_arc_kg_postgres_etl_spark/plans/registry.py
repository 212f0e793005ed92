"""Query registry: name -> (spark builder, DuckDB oracle SQL).

This drives ``__spark_entry__.py`` (the driver contract) and
``tests/test_oracle.py`` (the same check run locally). Keys follow
SURVEY.md §2. ``oracle=None`` marks genuinely non-SQL-expressible ops —
the driver then records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from prefect_flow_arc_kg_postgres_etl_spark.plans import (
    kg,
    pipeline,
    reference_pipeline,
    relational,
    streaming_plans,
)

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    builder: Builder
    oracle: str | None


# Ordering contract: the driver checks the FIRST 50 registry entries, so
# every oracle-backed entry must come before the rows-only tail, and the
# window contents rotate each round so every entry eventually gets a
# driver CORRECTNESS row. Since r6 the ordering is explicit: _SPECS
# holds every entry (definition order irrelevant), DRIVER_WINDOW names
# the 50 graded slots, and QUERIES is assembled window-first at the
# bottom of this module with the rows-only (oracle=None) entries pinned
# to the tail. Rotating = editing the DRIVER_WINDOW list.
#
# Window history: r1-r4 graded the original first-50; r5 rotated in 16
# formerly past-window entries (50/50 green); r6 graded 50 entries that
# had never had a driver row (50/50 green); r7 (below) grades 50 MORE
# never-checked entries including the round's new operators
# (index_partition_rename_invalidation, kg_construct_real_query{,_org,
# _deletes}). After r7 the never-driver-checked residue is 51
# oracle-backed entries: the 31 listed above DRIVER_WINDOW plus the
# six late-r7 verbatim SPARQL entries (kg_construct_real_query_
# {newspaper,iiif,issues,av_audio,av_video,av_complex}), the A68
# view-pipeline composition (flow_kg_view_load), the A69-A73 text
# forms (kg_{select,ask,describe,update}_real_text,
# kg_path_text_closure, kg_select_subquery_text, kg_path_nps_text),
# D54 alto_transcript_extract{,_tolerant (D57)} and D55/D56
# corpus_bpe_{learn,encode} — 51 total. r8 (the list below) grades 50
# of those 51 plus the three r8-new operators (A74
# flow_reference_pipeline, A75 kg_construct_real_query_av_audio_org,
# A73b kg_path_nps_inverse); the residue after r8 was FIVE entries
# (cube_agg, events_funnel3, corpus_mix_sample,
# orders_running_distinct, plus reference_partition_stats, which
# landed after the r8 window froze). r9 (the list below) grades all
# five plus the three r9-new composed-cycle operators and 42
# re-grades of the oldest r4/r5 rows — after r9 every oracle-backed
# entry has a driver CORRECTNESS row. r10 graded its 7 new entries,
# the 2 late-r9 store twins, 5 changed-machinery re-grades and 36
# oldest re-grades. r11 (the list below): new/promoted entries first,
# then the full SPARQL surface (the star-fusion rewrite touched every
# SPARQL entry's evaluator) and the oldest-r6 rows; the only entries
# registered this round but outside the window are
# flow_reference_main_store (shares the delete-cycle oracle graded
# through two window twins) — it rotates in next round.
_SPECS: dict[str, QuerySpec] = {
    # ---- A-block: KG/ETL core (reference parity)
    "kg_melt_triples": QuerySpec(kg.kg_melt_triples, kg.KG_MELT_ORACLE),
    "kg_pivot_records": QuerySpec(kg.kg_pivot_records, kg.KG_PIVOT_ORACLE),
    "kg_construct_view": QuerySpec(kg.kg_construct_view, kg.KG_CONSTRUCT_ORACLE),
    "kg_construct_optional": QuerySpec(kg.kg_construct_optional, kg.KG_OPTIONAL_ORACLE),
    "kg_construct_paths": QuerySpec(kg.kg_construct_paths, kg.KG_PATHS_ORACLE),
    "kg_construct_union": QuerySpec(kg.kg_construct_union, kg.KG_UNION_ORACLE),
    "kg_construct_graph": QuerySpec(kg.kg_construct_graph, kg.KG_GRAPH_ORACLE),
    "kg_construct_filter_bound": QuerySpec(
        kg.kg_construct_filter_bound, kg.KG_FILTER_BOUND_ORACLE
    ),
    "kg_value_coercion": QuerySpec(kg.kg_value_coercion, kg.KG_COERCION_ORACLE),
    "merge_upsert": QuerySpec(kg.merge_upsert, kg.MERGE_UPSERT_ORACLE),
    "delete_processing": QuerySpec(kg.delete_processing, kg.DELETE_ORACLE),
    "incremental_since": QuerySpec(kg.incremental_since, kg.SINCE_ORACLE),
    "index_documents": QuerySpec(kg.index_documents, kg.INDEX_DOC_ORACLE),
    "flow_full_sync": QuerySpec(kg.flow_full_sync, kg.INDEX_DOC_ORACLE),
    "table_intersection": QuerySpec(
        kg.table_intersection_q, kg.TABLE_INTERSECTION_ORACLE
    ),
    "fk_merge_order": QuerySpec(kg.fk_merge_order_q, kg.FK_ORDER_ORACLE),
    "empty_partition_prune": QuerySpec(
        kg.empty_partition_prune, kg.EMPTY_PARTITION_ORACLE
    ),
    "kg_nt_roundtrip": QuerySpec(kg.kg_nt_roundtrip, kg.KG_NT_ROUNDTRIP_ORACLE),
    # A79: prefixed-Turtle interchange (the reference's graph.ttl.gz
    # step, 1_kg_view_construct.ts:66-80) — serialize+parse identity.
    "source_ttl_roundtrip": QuerySpec(
        kg.source_ttl_roundtrip, kg.SOURCE_TTL_ROUNDTRIP_ORACLE
    ),
    "source_csv_roundtrip": QuerySpec(
        kg.source_csv_roundtrip, kg.SOURCE_CSV_ROUNDTRIP_ORACLE
    ),
    # ---- B-block: relational query layer
    "q1_pricing_summary": QuerySpec(relational.q1_pricing_summary, relational.Q1_ORACLE),
    "q5_local_volume": QuerySpec(relational.q5_local_volume, relational.Q5_ORACLE),
    "q7_volume_shipping": QuerySpec(relational.q7_volume_shipping, relational.Q7_ORACLE),
    "q19_discounted_revenue": QuerySpec(
        relational.q19_discounted_revenue, relational.Q19_ORACLE
    ),
    "events_tumbling": QuerySpec(relational.events_tumbling, relational.TUMBLING_ORACLE),
    "sessionize": QuerySpec(relational.sessionize, relational.SESSIONIZE_ORACLE),
    "asof_join": QuerySpec(relational.asof_join, relational.ASOF_ORACLE),
    "rollup_agg": QuerySpec(relational.rollup_agg, relational.ROLLUP_ORACLE),
    # ---- D-block: training-data pipeline operators
    "dedup_exact": QuerySpec(pipeline.dedup_exact, pipeline.DEDUP_EXACT_ORACLE),
    "dedup_ngram_jaccard": QuerySpec(pipeline.dedup_ngram_jaccard, pipeline.DEDUP_JACCARD_ORACLE),
    "dedup_lsh_verified": QuerySpec(pipeline.dedup_lsh_verified, pipeline.DEDUP_JACCARD_ORACLE),
    "dedup_embedding_cosine": QuerySpec(pipeline.dedup_embedding_cosine, pipeline.DEDUP_COSINE_ORACLE),
    "dedup_embedding_lsh": QuerySpec(
        pipeline.dedup_embedding_lsh, pipeline.DEDUP_COSINE_ORACLE
    ),
    # r10 wave: span-level (exact-substring), chunk-level (C4-style),
    # and semantic (SemDeDup) dedup — SURVEY §2 D59-D61.
    "dedup_substring": QuerySpec(
        pipeline.dedup_substring, pipeline.DEDUP_SUBSTRING_ORACLE
    ),
    "dedup_paragraph": QuerySpec(
        pipeline.dedup_paragraph, pipeline.DEDUP_PARAGRAPH_ORACLE
    ),
    "dedup_semantic": QuerySpec(
        pipeline.dedup_semantic, pipeline.DEDUP_SEMANTIC_ORACLE
    ),
    "dedup_semantic_lsh": QuerySpec(
        pipeline.dedup_semantic_lsh, pipeline.DEDUP_SEMANTIC_LSH_ORACLE
    ),
    "dedup_substring_incremental": QuerySpec(
        pipeline.dedup_substring_incremental,
        pipeline.DEDUP_SUBSTRING_INCR_ORACLE,
    ),
    "text_html_extract": QuerySpec(
        pipeline.text_html_extract, pipeline.TEXT_HTML_EXTRACT_ORACLE
    ),
    "ann_bruteforce_topk": QuerySpec(pipeline.ann_bruteforce_topk, pipeline.ANN_BRUTE_ORACLE),
    "text_language_id": QuerySpec(pipeline.text_language_id, pipeline.LANG_ID_ORACLE),
    "text_quality_score": QuerySpec(pipeline.text_quality_score, pipeline.QUALITY_ORACLE),
    "corpus_curation": QuerySpec(pipeline.corpus_curation, pipeline.CURATION_ORACLE),
    "multimodal_decode": QuerySpec(pipeline.multimodal_decode, pipeline.MM_DECODE_ORACLE),
    "multimodal_resize": QuerySpec(pipeline.multimodal_resize, pipeline.MM_RESIZE_ORACLE),
    "multimodal_frame_sample": QuerySpec(
        pipeline.multimodal_frame_sample, pipeline.MM_FRAME_ORACLE
    ),
    "text_tfidf": QuerySpec(pipeline.text_tfidf, pipeline.TFIDF_ORACLE),
    "corpus_decontaminate": QuerySpec(
        pipeline.corpus_decontaminate, pipeline.DECONTAMINATE_ORACLE
    ),
    "corpus_sample_stratified": QuerySpec(
        pipeline.corpus_sample_stratified, pipeline.SAMPLE_STRATIFIED_ORACLE
    ),
    "corpus_pack_sequences": QuerySpec(
        pipeline.corpus_pack_sequences, pipeline.PACK_SEQUENCES_ORACLE
    ),
    "embedding_quantize": QuerySpec(
        pipeline.embedding_quantize, pipeline.EMBEDDING_QUANTIZE_ORACLE
    ),
    # ---- C-block: Structured Streaming (oracle-backed entries)
    "stream_windowed_agg": QuerySpec(
        streaming_plans.stream_windowed_agg, streaming_plans.STREAM_WINDOWED_ORACLE
    ),
    # Round-5 promotion: the PRODUCTION append+watermark windowed plan —
    # on a bounded source the emitted set (windows with end <= final
    # watermark) is deterministic, so the production path is the graded
    # one, not just the complete-mode harness.
    "stream_windowed_watermarked": QuerySpec(
        streaming_plans.stream_windowed_watermarked,
        streaming_plans.STREAM_WINDOWED_WM_ORACLE,
    ),
    "stream_dedup": QuerySpec(
        streaming_plans.stream_dedup, streaming_plans.STREAM_DEDUP_ORACLE
    ),
    # Round-4 promotion: the closed-session set of the stateful
    # sessionizer is deterministic on a bounded source (every session
    # except each user's last), so C3 is driver-checkable against SQL.
    "stream_sessionize": QuerySpec(
        streaming_plans.stream_sessionize,
        streaming_plans.STREAM_SESSIONIZE_ORACLE,
    ),
    "stream_enrich": QuerySpec(
        streaming_plans.stream_enrich, streaming_plans.STREAM_ENRICH_ORACLE
    ),
    "stream_incremental_upsert": QuerySpec(
        streaming_plans.stream_incremental_upsert,
        streaming_plans.STREAM_UPSERT_ORACLE,
    ),
    # ---- oracle-backed entries past the driver's 50-entry window:
    # still fully checked by tools/check_oracle.py + tests/test_oracle.py
    # locally. These are the r5 rotation's displaced veterans — every one
    # carries 4 all-true driver rows (CORRECTNESS_r01-r04).
    "truncate_insert": QuerySpec(kg.truncate_insert, kg.TRUNCATE_INSERT_ORACLE),
    "clear_and_insert": QuerySpec(kg.clear_and_insert, kg.CLEAR_INSERT_ORACLE),
    "orphan_cleanup": QuerySpec(kg.orphan_cleanup, kg.ORPHAN_ORACLE),
    "org_scope": QuerySpec(kg.org_scope, kg.ORG_SCOPE_ORACLE),
    "partition_stats": QuerySpec(kg.partition_stats_q, kg.PARTITION_STATS_ORACLE),
    "batch_stage": QuerySpec(kg.batch_stage, kg.BATCH_STAGE_ORACLE),
    "es_bulk_feed": QuerySpec(kg.es_bulk_feed, kg.ES_BULK_ORACLE),
    "q3_shipping_priority": QuerySpec(relational.q3_shipping_priority, relational.Q3_ORACLE),
    "topk_per_group": QuerySpec(relational.topk_per_group, relational.TOPK_ORACLE),
    "windowed_running": QuerySpec(relational.windowed_running, relational.RUNNING_ORACLE),
    "distinct_agg": QuerySpec(relational.distinct_agg, relational.DISTINCT_ORACLE),
    "grouping_sets": QuerySpec(
        relational.grouping_sets, relational.GROUPING_SETS_ORACLE
    ),
    "exists_anti": QuerySpec(relational.exists_anti, relational.EXISTS_ANTI_ORACLE),
    "correlated_subquery": QuerySpec(
        relational.correlated_subquery, relational.CORRELATED_ORACLE
    ),
    "text_token_stats": QuerySpec(pipeline.text_token_stats, pipeline.TOKEN_ORACLE),
    "text_fingerprint": QuerySpec(pipeline.text_fingerprint, pipeline.FINGERPRINT_ORACLE),
    # Round-5 surface additions (oracle-backed, locally checked; they
    # rotate into the driver window in a future round): SCD2 temporal
    # merge, four relational shapes (Q2/Q4/Q12 + time-range window),
    # PII redaction, intra-doc repetition, quantized ANN w/ rescore.
    "merge_scd2": QuerySpec(kg.merge_scd2, kg.MERGE_SCD2_ORACLE),
    "q2_min_cost_supplier": QuerySpec(
        relational.q2_min_cost_supplier, relational.Q2_ORACLE
    ),
    "q4_order_priority": QuerySpec(
        relational.q4_order_priority, relational.Q4_ORACLE
    ),
    "q12_priority_lines": QuerySpec(
        relational.q12_priority_lines, relational.Q12_ORACLE
    ),
    "window_range_interval": QuerySpec(
        relational.window_range_interval, relational.WINDOW_RANGE_ORACLE
    ),
    "text_pii_redact": QuerySpec(
        pipeline.text_pii_redact, pipeline.PII_REDACT_ORACLE
    ),
    "text_repetition": QuerySpec(
        pipeline.text_repetition, pipeline.REPETITION_ORACLE
    ),
    "ann_quantized_topk": QuerySpec(
        pipeline.ann_quantized_topk, pipeline.ANN_QUANTIZED_ORACLE
    ),
    "ann_pq_topk": QuerySpec(pipeline.ann_pq_topk, pipeline.ANN_PQ_ORACLE),
    # D65 (NEW r12): the composed IVF->PQ production tier — coarse
    # cells prune the candidate set, ADC rescores only probed cells'
    # codes; oracle = the literal composition of the two standalone
    # oracles.
    "ann_ivf_pq_topk": QuerySpec(
        pipeline.ann_ivf_pq_topk, pipeline.ANN_IVF_PQ_ORACLE
    ),
    "events_funnel": QuerySpec(relational.events_funnel, relational.FUNNEL_ORACLE),
    # pairs -> clusters canonicalization; oracle = recursive-CTE
    # connected components over the quadratic ground-truth pair set.
    "dedup_cluster_components": QuerySpec(
        pipeline.dedup_cluster_components, pipeline.DEDUP_CLUSTERS_ORACLE
    ),
    # C7: stateful streaming funnel — deterministic on a bounded source,
    # shares the batch funnel's oracle.
    "stream_funnel": QuerySpec(
        streaming_plans.stream_funnel, streaming_plans.STREAM_FUNNEL_ORACLE
    ),
    # B21-B26: the remaining distinct TPC-H plan shapes (Q9 multi-join
    # expression profit, Q10 top-returned, Q14 conditional ratio, Q16
    # distinct-count + NOT IN, Q18 having/join-back, Q11 global-threshold
    # scalar subquery).
    "q9_product_profit": QuerySpec(
        relational.q9_product_profit, relational.Q9_ORACLE
    ),
    "q10_returned_items": QuerySpec(
        relational.q10_returned_items, relational.Q10_ORACLE
    ),
    "q14_promo_revenue": QuerySpec(
        relational.q14_promo_revenue, relational.Q14_ORACLE
    ),
    "q16_supplier_count": QuerySpec(
        relational.q16_supplier_count, relational.Q16_ORACLE
    ),
    "q18_large_orders": QuerySpec(
        relational.q18_large_orders, relational.Q18_ORACLE
    ),
    "q11_important_parts": QuerySpec(
        relational.q11_important_parts, relational.Q11_ORACLE
    ),
    # B27-B30: analytics shapes — wide pivot, cohort retention,
    # histogram profiling, exact interpolated quantiles.
    "events_pivot_wide": QuerySpec(
        relational.events_pivot_wide, relational.EVENTS_PIVOT_ORACLE
    ),
    "orders_cohort_retention": QuerySpec(
        relational.orders_cohort_retention, relational.COHORT_RETENTION_ORACLE
    ),
    "orders_value_histogram": QuerySpec(
        relational.orders_value_histogram, relational.VALUE_HISTOGRAM_ORACLE
    ),
    "events_quantiles": QuerySpec(
        relational.events_quantiles, relational.EVENTS_QUANTILES_ORACLE
    ),
    # C7b: watermark-buffered disorder-correct funnel.
    "stream_funnel_buffered": QuerySpec(
        streaming_plans.stream_funnel_buffered,
        streaming_plans.STREAM_FUNNEL_BUFFERED_ORACLE,
    ),
    # C3b (NEW r6): watermark-buffered disorder-correct sessionizer.
    "stream_sessionize_buffered": QuerySpec(
        streaming_plans.stream_sessionize_buffered,
        streaming_plans.STREAM_SESSIONIZE_BUFFERED_ORACLE,
    ),
    # C11 (NEW r6): streaming windowed top-k — mergeable counts
    # maintained by summary-delta, ranked at read time (top-k itself
    # is not mergeable).
    "stream_topk": QuerySpec(
        streaming_plans.stream_topk, streaming_plans.STREAM_TOPK_ORACLE
    ),
    # C12 (NEW r6): cross-run dedup against a persisted seen-id store
    # (C4 only remembers one run's watermark horizon).
    "stream_dedup_state": QuerySpec(
        streaming_plans.stream_dedup_state,
        streaming_plans.STREAM_DEDUP_STATE_ORACLE,
    ),
    # B34: Q13 distribution-of-counts (left-outer + double agg).
    "q13_order_distribution": QuerySpec(
        relational.q13_order_distribution, relational.Q13_ORACLE
    ),
    # A33: small-files compaction (identity oracle + file-count test).
    "maintenance_compaction": QuerySpec(
        kg.maintenance_compaction, kg.MAINTENANCE_COMPACTION_ORACLE
    ),
    # B33 multiset set ops; A32 schema-evolution read.
    "orders_except_intersect": QuerySpec(
        relational.orders_except_intersect, relational.SET_OPS_ORACLE
    ),
    "source_schema_evolution": QuerySpec(
        kg.source_schema_evolution, kg.SCHEMA_EVOLUTION_ORACLE
    ),
    # A28b: SPARQL p* (reflexive-transitive closure, shares A28's core).
    "kg_path_zero_or_more": QuerySpec(
        kg.kg_path_zero_or_more, kg.KG_PATH_ZERO_OR_MORE_ORACLE
    ),
    # D30: binaryFile multimodal ingest (shares the decode oracle).
    "multimodal_binary_source": QuerySpec(
        pipeline.multimodal_binary_source, pipeline.MM_DECODE_ORACLE
    ),
    # D29: grouped-map applyInPandas model fit (regr_* oracle twin).
    "events_trend_fit": QuerySpec(
        pipeline.events_trend_fit, pipeline.EVENTS_TREND_ORACLE
    ),
    # A31: stats-driven incremental index partition refresh.
    "index_partition_rename_invalidation": QuerySpec(
        kg.index_partition_rename_invalidation, kg.INDEX_RENAME_ORACLE
    ),
    "kg_construct_real_query": QuerySpec(
        kg.kg_construct_real_query, kg.KG_REAL_QUERY_ORACLE
    ),
    "kg_construct_real_query_org": QuerySpec(
        kg.kg_construct_real_query_org, kg.KG_REAL_QUERY_ORG_ORACLE
    ),
    "kg_construct_real_query_deletes": QuerySpec(
        kg.kg_construct_real_query_deletes, kg.KG_REAL_QUERY_DEL_ORACLE
    ),
    "kg_construct_real_query_newspaper": QuerySpec(
        kg.kg_construct_real_query_newspaper, kg.KG_REAL_QUERY_NEWS_ORACLE
    ),
    "kg_construct_real_query_iiif": QuerySpec(
        kg.kg_construct_real_query_iiif, kg.KG_REAL_QUERY_IIIF_ORACLE
    ),
    "kg_construct_real_query_issues": QuerySpec(
        kg.kg_construct_real_query_issues, kg.KG_REAL_QUERY_NP_ORACLE
    ),
    "kg_construct_real_query_av_audio": QuerySpec(
        kg.kg_construct_real_query_av_audio, kg.KG_REAL_QUERY_AV_AUDIO_ORACLE
    ),
    "kg_construct_real_query_av_video": QuerySpec(
        kg.kg_construct_real_query_av_video, kg.KG_REAL_QUERY_AV_VIDEO_ORACLE
    ),
    "kg_construct_real_query_av_complex": QuerySpec(
        kg.kg_construct_real_query_av_complex, kg.KG_REAL_QUERY_AV_COMPLEX_ORACLE
    ),
    "flow_kg_view_load": QuerySpec(kg.flow_kg_view_load, kg.KG_VIEW_LOAD_ORACLE),
    # A74: the full reference production cycle composed — all NINE
    # verbatim queries -> triple stream -> graph.* record pivot in FK
    # load order -> update_partition.sql-faithful index documents.
    "flow_reference_pipeline": QuerySpec(
        reference_pipeline.flow_reference_pipeline,
        reference_pipeline.reference_pipeline_oracle(),
    ),
    # A75: the reference's per-organisation fan-out — av-audio.sparql
    # verbatim with ?maintainer_id bound through the params API.
    "kg_construct_real_query_av_audio_org": QuerySpec(
        kg.kg_construct_real_query_av_audio_org,
        kg.KG_REAL_QUERY_AV_AUDIO_ORG_ORACLE,
    ),
    # A73b: negated property set with inverse members (!(p|^q)).
    "kg_path_nps_inverse": QuerySpec(
        kg.kg_path_nps_inverse, kg.KG_PATH_NPS_INVERSE_ORACLE
    ),
    # A76: get_partitions over the composed graph tables — the
    # indexer's per-organisation partition worklist.
    "reference_partition_stats": QuerySpec(
        reference_pipeline.reference_partition_stats,
        reference_pipeline._partition_stats_oracle(),
    ),
    # A77: the nightly INCREMENTAL cycle — worklist -> is_updated /
    # org-name-drift flags -> skip / truncate-rebuild / since-windowed
    # upsert per partition (arc_db_load_index_tables_flow.py:236-266).
    "flow_reference_incremental": QuerySpec(
        reference_pipeline.flow_reference_incremental,
        reference_pipeline.reference_incremental_oracle(),
    ),
    # A78: the composed DELETE cycle — flagged-fragment cascade ->
    # document rebuild over the survivors (arc_db_delete_flow.py:34-66).
    "flow_reference_deletes": QuerySpec(
        reference_pipeline.flow_reference_deletes,
        reference_pipeline.reference_deletes_oracle(),
    ),
    # A78b: the delete flow's partition ledger incl. emptied-partition
    # drops (arc_db_delete_flow.py:70-122).
    "reference_delete_report": QuerySpec(
        reference_pipeline.reference_delete_report,
        reference_pipeline._delete_report_oracle(),
    ),
    # A77/A78 store twins: the DURABLE flows against a committed
    # snapshot store — end states equal the storeless builds, so they
    # share those oracles.
    "flow_reference_incremental_store": QuerySpec(
        reference_pipeline.flow_reference_incremental_store,
        reference_pipeline.reference_pipeline_oracle(),
    ),
    "flow_reference_deletes_store": QuerySpec(
        reference_pipeline.flow_reference_deletes_store,
        reference_pipeline.reference_deletes_oracle(),
    ),
    "flow_reference_main_store": QuerySpec(
        reference_pipeline.flow_reference_main_store,
        reference_pipeline.reference_deletes_oracle(),
    ),
    "kg_select_real_text": QuerySpec(
        kg.kg_select_real_text, kg.KG_SELECT_REAL_TEXT_ORACLE
    ),
    "kg_ask_real_text": QuerySpec(kg.kg_ask_real_text, kg.KG_ASK_REAL_TEXT_ORACLE),
    "index_partition_refresh": QuerySpec(
        kg.index_partition_refresh, kg.INDEX_REFRESH_ORACLE
    ),
    # D28: metadata-filtered ANN (pre-filter pushed to the scan).
    "ann_filtered_topk": QuerySpec(
        pipeline.ann_filtered_topk, pipeline.ANN_FILTERED_ORACLE
    ),
    # A30: ORC columnar round trip (identity oracle).
    "source_orc_roundtrip": QuerySpec(
        kg.source_orc_roundtrip, kg.SOURCE_ORC_ROUNDTRIP_ORACLE
    ),
    # A29: CDC snapshot diff; B31: three-step funnel composition.
    "table_diff_cdc": QuerySpec(kg.table_diff_cdc, kg.TABLE_DIFF_ORACLE),
    "events_funnel3": QuerySpec(
        relational.events_funnel3, relational.FUNNEL3_ORACLE
    ),
    # B32: semi-structured JSON payload extraction (scan-side from_json).
    "events_json_extract": QuerySpec(
        relational.events_json_extract, relational.EVENTS_JSON_ORACLE
    ),
    # C8: stream-stream time-interval join (bounded state, full oracle).
    "stream_interval_join": QuerySpec(
        streaming_plans.stream_interval_join,
        streaming_plans.STREAM_INTERVAL_JOIN_ORACLE,
    ),
    # A28: SPARQL p+ transitive property path (pointer doubling).
    "kg_path_transitive": QuerySpec(
        kg.kg_path_transitive, kg.KG_PATH_TRANSITIVE_ORACLE
    ),
    # D24-D27: corpus statistics + training-export layout (vocabulary
    # building, bigram LM, target-mixture sampling, shard layout).
    "corpus_vocabulary": QuerySpec(
        pipeline.corpus_vocabulary, pipeline.VOCABULARY_ORACLE
    ),
    "corpus_bigram_lm": QuerySpec(
        pipeline.corpus_bigram_lm, pipeline.BIGRAM_LM_ORACLE
    ),
    "corpus_mix_sample": QuerySpec(
        pipeline.corpus_mix_sample, pipeline.MIX_SAMPLE_ORACLE
    ),
    "corpus_shard_layout": QuerySpec(
        pipeline.corpus_shard_layout, pipeline.SHARD_LAYOUT_ORACLE
    ),
    # B35-B39: the five remaining TPC-H shapes — with these the
    # relational layer covers all 22 distinct TPC-H plan shapes
    # (Q6 pure-pushdown scan agg, Q8 double-role dimension ratio,
    # Q15 equality-to-global-max with exchange reuse, Q20
    # correlated-threshold semi-join chain, Q21 EXISTS/NOT-EXISTS
    # re-planned as one aggregation).
    "q6_revenue_forecast": QuerySpec(
        relational.q6_revenue_forecast, relational.Q6_ORACLE
    ),
    "q8_market_share": QuerySpec(
        relational.q8_market_share, relational.Q8_ORACLE
    ),
    "q15_top_supplier": QuerySpec(
        relational.q15_top_supplier, relational.Q15_ORACLE
    ),
    "q20_part_promotion": QuerySpec(
        relational.q20_part_promotion, relational.Q20_ORACLE
    ),
    "q21_waiting_suppliers": QuerySpec(
        relational.q21_waiting_suppliers, relational.Q21_ORACLE
    ),
    # D31: edit-distance refinement of the verified dup pairs (bounded
    # prefix, threshold-early-exit DP, pair-set-only — never quadratic).
    "dedup_edit_distance": QuerySpec(
        pipeline.dedup_edit_distance, pipeline.DEDUP_EDIT_ORACLE
    ),
    # D32: split-block-Bloom prefiltered decontamination (the
    # large-eval-set regime); exact-verified, shares D16's oracle.
    "corpus_decontaminate_bloom": QuerySpec(
        pipeline.corpus_decontaminate_bloom, pipeline.DECONTAMINATE_ORACLE
    ),
    # A34: summary-delta maintenance of algebraic aggregate state —
    # refresh reads state + delta, never the base fact; oracle = full
    # recompute.
    "agg_incremental_refresh": QuerySpec(
        kg.agg_incremental_refresh, kg.AGG_REFRESH_ORACLE
    ),
    # C9: the foreachBatch twin of A34 — converged streaming aggregate
    # state == batch aggregate (exact integer partials; epoch-watermark
    # replay protection).
    "stream_agg_state": QuerySpec(
        streaming_plans.stream_agg_state,
        streaming_plans.STREAM_AGG_STATE_ORACLE,
    ),
    # A35: bucketed co-located fact-to-fact join — zero exchanges in
    # join AND downstream agg (plan-audited); oracle = plain join+agg.
    "bucketed_join_colocated": QuerySpec(
        kg.bucketed_join_colocated, kg.BUCKETED_JOIN_ORACLE
    ),
    # A36: deterministic-salt skew join — salting must never change
    # results; oracle = the plain join.
    "skew_salted_join": QuerySpec(
        kg.skew_salted_join, kg.SKEW_SALTED_ORACLE
    ),
    # A37/A38: SPARQL DESCRIBE (semi-join on matched subjects) and ASK
    # (LIMIT-1 existence) — completes the SPARQL query-form surface.
    "kg_describe": QuerySpec(kg.kg_describe, kg.KG_DESCRIBE_ORACLE),
    "kg_ask": QuerySpec(kg.kg_ask, kg.KG_ASK_ORACLE),
    # B40: sliding event-time windows (scan-side 4-way expansion, one
    # hash agg) — the batch twin of the streaming windowed aggs.
    "events_sliding_window": QuerySpec(
        relational.events_sliding_window, relational.EVENTS_SLIDING_ORACLE
    ),
    # A39/A40: data-quality surface — one-pass column profiler and the
    # PK/FK/not-null constraint validation a loader runs pre-commit.
    "table_profile": QuerySpec(kg.table_profile, kg.TABLE_PROFILE_ORACLE),
    "dq_constraint_check": QuerySpec(
        kg.dq_constraint_check, kg.DQ_CHECK_ORACLE
    ),
    # B41: gap-filled hourly series (in-plan sequence spine, agg before
    # the fill join). C10: streaming DQ gate with dead-letter routing
    # (epoch-keyed overwrite idempotency; row conservation in-oracle).
    "events_gap_fill": QuerySpec(
        relational.events_gap_fill, relational.EVENTS_GAP_FILL_ORACLE
    ),
    "stream_dq_gate": QuerySpec(
        streaming_plans.stream_dq_gate, streaming_plans.STREAM_DQ_GATE_ORACLE
    ),
    # B42: the full ranking-function family fused into one WindowExec.
    "orders_window_functions": QuerySpec(
        relational.orders_window_functions,
        relational.ORDERS_WINDOW_FUNCS_ORACLE,
    ),
    # A41: z-order (Morton) layout maintenance — multi-column data
    # skipping; identity oracle + per-file stat-narrowness test.
    "maintenance_zorder": QuerySpec(
        kg.maintenance_zorder, kg.MAINTENANCE_ZORDER_ORACLE
    ),
    # D33: audio leg of the multimodal triple — executor-side WAV
    # synthesis, Arrow-batched stdlib PCM parse, closed-form oracle.
    "multimodal_audio_stats": QuerySpec(
        pipeline.multimodal_audio_stats, pipeline.MM_AUDIO_ORACLE
    ),
    # B43: robust median+MAD anomaly thresholding (bounded output).
    "events_anomaly_mad": QuerySpec(
        relational.events_anomaly_mad, relational.EVENTS_ANOMALY_ORACLE
    ),
    # A42: targeted GDPR erasure — affected-file pruning by key range,
    # byte-copy carryover, anti-join re-encode of hit files only.
    "targeted_delete_gdpr": QuerySpec(
        kg.targeted_delete_gdpr, kg.TARGETED_DELETE_ORACLE
    ),
    # D34: integer-space Lloyd's k-means — the ITERATIVE algorithm
    # itself SQL-oracle-checked (exact arithmetic, unrolled CTEs).
    "embeddings_kmeans": QuerySpec(
        pipeline.embeddings_kmeans, pipeline.EMBEDDINGS_KMEANS_ORACLE
    ),
    # B44: CUBE — completes the grouping-analytics family (B6/B13).
    "cube_agg": QuerySpec(relational.cube_agg, relational.CUBE_ORACLE),
    # A43: integer PageRank — the weighted-iteration graph algorithm,
    # fixpoint SQL-oracle-checked exactly (unrolled, floor division).
    "graph_pagerank": QuerySpec(
        kg.graph_pagerank, kg.GRAPH_PAGERANK_ORACLE
    ),
    # B45: market-basket pair mining — basket-keyed self-join (bounded
    # fan-out, linear in orders), support + directed confidence.
    "orders_basket_pairs": QuerySpec(
        relational.orders_basket_pairs, relational.BASKET_PAIRS_ORACLE
    ),
    # A44 (NEW r6): delta-join maintenance of a materialized join view
    # (the join-view counterpart of A34's aggregate summary-delta).
    "join_view_incremental": QuerySpec(
        kg.join_view_incremental, kg.JOIN_VIEW_IVM_ORACLE
    ),
    # C13 (NEW r6): the reference's stream.ts triple->record pivot as a
    # watermark-finalized streaming aggregation (batch twin = A2).
    "stream_pivot_records": QuerySpec(
        streaming_plans.stream_pivot_records,
        streaming_plans.STREAM_PIVOT_ORACLE,
    ),
    # B48 (NEW r6): interval x interval overlap join via span-bucketing
    # with a canonical-bucket exactly-once rule (B46 generalized).
    "sessions_overlap_join": QuerySpec(
        relational.sessions_overlap_join, relational.SESSIONS_OVERLAP_ORACLE
    ),
    # D40 (NEW r6): sliding-window chunking with overlap — scan-fused
    # generator projection, zero shuffle.
    "corpus_chunk_overlap": QuerySpec(
        pipeline.corpus_chunk_overlap, pipeline.CHUNK_OVERLAP_ORACLE
    ),
    # A49 (NEW r6): SPARQL SELECT aggregates (COUNT/SAMPLE/GROUP_CONCAT
    # with deterministic ordering) — the aggregate query form.
    "kg_select_agg": QuerySpec(kg.kg_select_agg, kg.KG_SELECT_AGG_ORACLE),
    # A50 (NEW r6): conditional partial-update MERGE (WHEN MATCHED AND
    # cond THEN UPDATE SET subset) — one full-outer PK join.
    "merge_upsert_conditional": QuerySpec(
        kg.merge_upsert_conditional, kg.MERGE_UPSERT_COND_ORACLE
    ),
    # D41 (NEW r6): quality-weighted importance resampling — scan-side,
    # exact-integer LCG threshold (keep prob = quality score).
    "corpus_quality_resample": QuerySpec(
        pipeline.corpus_quality_resample, pipeline.QUALITY_RESAMPLE_ORACLE
    ),
    # D42 (NEW r6): per-doc contamination overlap FRACTION (the audit
    # report behind D16's boolean drop) — broadcast flag, one keyed agg.
    "corpus_contamination_report": QuerySpec(
        pipeline.corpus_contamination_report,
        pipeline.CONTAMINATION_REPORT_ORACLE,
    ),
    # A51 (NEW r6): SPARQL 1.1 subquery — nested aggregate SELECT
    # feeding the outer BGP, scalar avg decorrelated as 1-row broadcast.
    "kg_construct_subquery": QuerySpec(
        kg.kg_construct_subquery, kg.KG_SUBQUERY_ORACLE
    ),
    # D43 (NEW r6): JL random sign projection — constant-folded +-chain
    # fused with the scan, bit-identical doubles cross-engine.
    "embedding_random_projection": QuerySpec(
        pipeline.embedding_random_projection, pipeline.RANDOM_PROJECTION_ORACLE
    ),
    # A52 (NEW r6): summary-delta maintenance with RETRACTIONS (signed
    # multiplicities; zero-count groups drop) — the CDC-complete A34.
    "agg_refresh_retractable": QuerySpec(
        kg.agg_refresh_retractable, kg.AGG_RETRACT_ORACLE
    ),
    # C14 (NEW r6): streaming point-in-time SCD2 enrichment — the
    # serving twin of A47, epoch-idempotent foreachBatch.
    "stream_scd2_enrich": QuerySpec(
        streaming_plans.stream_scd2_enrich,
        streaming_plans.STREAM_SCD2_ENRICH_ORACLE,
    ),
    # D44 (NEW r6): LM-based quality scoring (perplexity-proxy) — the
    # corpus's own bigram LM probes each doc, exact scaled integers.
    "text_lm_score": QuerySpec(
        pipeline.text_lm_score, pipeline.TEXT_LM_SCORE_ORACLE
    ),
    # A53 (NEW r6): SPARQL negated property set !(p1|p2) — complement
    # in-list, one scan; completes the path algebra.
    "kg_path_negated": QuerySpec(
        kg.kg_path_negated, kg.KG_PATH_NEGATED_ORACLE
    ),
    # B49 (NEW r6): cumulative exact distinct via first-occurrence —
    # one fact shuffle, prefix sum over the tiny months table.
    "orders_running_distinct": QuerySpec(
        relational.orders_running_distinct, relational.RUNNING_DISTINCT_ORACLE
    ),
    # D45 (NEW r6): per-label embedding centroids in e6 fixed point —
    # exact integer partials, long-form output.
    "embedding_label_centroids": QuerySpec(
        pipeline.embedding_label_centroids, pipeline.LABEL_CENTROIDS_ORACLE
    ),
    # A54 (NEW r6): SPARQL MINUS — anti join on shared vars with the
    # spec's disjoint-domain identity quirk (unit-tested).
    "kg_construct_minus": QuerySpec(
        kg.kg_construct_minus, kg.KG_MINUS_ORACLE
    ),
    # A55 (NEW r6): nested JSON document roundtrip — struct/array
    # fidelity through splittable NDJSON, identity oracle.
    "source_json_nested_roundtrip": QuerySpec(
        kg.source_json_nested_roundtrip, kg.SOURCE_JSON_NESTED_ORACLE
    ),
    # A56 (NEW r6): manifest-aware retention vacuum — pinned versions
    # survive, unreachable ones reclaim; identity oracle + contract.
    "maintenance_vacuum": QuerySpec(
        kg.maintenance_vacuum, kg.MAINTENANCE_VACUUM_ORACLE
    ),
    # A57 (NEW r6): inclusion-dependency profiling (FK discovery) —
    # containment in exact e6 integers, anti-join per candidate.
    "fk_discovery": QuerySpec(kg.fk_discovery, kg.FK_DISCOVERY_ORACLE),
    # C15 (NEW r6): LEFT OUTER stream-stream interval join — NULL rows
    # emit at watermark-proven no-match (state eviction horizon).
    "stream_interval_join_outer": QuerySpec(
        streaming_plans.stream_interval_join_outer,
        streaming_plans.STREAM_INTERVAL_OUTER_ORACLE,
    ),
    # A58 (NEW r6): permissive ingestion with dead-letter routing —
    # planted corrupt lines, row conservation in-oracle.
    "source_corrupt_tolerant": QuerySpec(
        kg.source_corrupt_tolerant, kg.SOURCE_CORRUPT_ORACLE
    ),
    # C16 (NEW r6): streaming gap fill — stateful spine generation,
    # zeros emitted for watermark-finalized empty buckets.
    "stream_gap_fill": QuerySpec(
        streaming_plans.stream_gap_fill, streaming_plans.STREAM_GAP_FILL_ORACLE
    ),
    # B50 (NEW r6): as-of join with a staleness bound — same
    # single-shuffle timeline as B10, scan-side freshness null-out.
    "asof_join_tolerance": QuerySpec(
        relational.asof_join_tolerance, relational.ASOF_TOLERANCE_ORACLE
    ),
    # A59 (NEW r6): SPARQL UPDATE (DELETE WHERE + INSERT) — graph
    # maintenance driven by a pattern, anti-join + union.
    "kg_update_delete_insert": QuerySpec(
        kg.kg_update_delete_insert, kg.KG_UPDATE_ORACLE
    ),
    # D46 (NEW r6): recall@k of the IVF tier vs brute force as an
    # in-engine metric — even the metric has a full SQL oracle.
    "ann_recall_eval": QuerySpec(
        pipeline.ann_recall_eval, pipeline.ANN_RECALL_ORACLE
    ),
    # D47 (NEW r6): deterministic round-robin shard interleave — no
    # global sort, one window per source + formula positions.
    "corpus_interleave_shards": QuerySpec(
        pipeline.corpus_interleave_shards, pipeline.INTERLEAVE_ORACLE
    ),
    # D48 (NEW r6): sentence segmentation — scan-fused generator.
    "text_sentence_split": QuerySpec(
        pipeline.text_sentence_split, pipeline.SENTENCE_SPLIT_ORACLE
    ),
    # B51 (NEW r6): ABC/Pareto classification — exact e4 cumulative
    # shares, integer cross-product thresholds, dim-bounded window.
    "supplier_pareto_abc": QuerySpec(
        relational.supplier_pareto_abc, relational.PARETO_ABC_ORACLE
    ),
    # A60 (NEW r6): SPARQL Update graph management (COPY/DROP) —
    # partition-shaped ops on the quad store.
    "kg_graph_management": QuerySpec(
        kg.kg_graph_management, kg.KG_GRAPH_MGMT_ORACLE
    ),
    # D49 (NEW r6): per-label embedding outliers — exact integer
    # distances to the D45 centroids, top-3 per label.
    "embedding_outliers": QuerySpec(
        pipeline.embedding_outliers, pipeline.EMBEDDING_OUTLIERS_ORACLE
    ),
    # B52 (NEW r6): exact per-group mode with deterministic tiebreak.
    "events_mode_per_user": QuerySpec(
        relational.events_mode_per_user, relational.EVENTS_MODE_ORACLE
    ),
    # D50 (NEW r6): exact percentile-band length trim, sort-free
    # (cumulative window over the tiny distinct-length table).
    "corpus_length_band_filter": QuerySpec(
        pipeline.corpus_length_band_filter, pipeline.LENGTH_BAND_ORACLE
    ),
    # D51 (NEW r6): per-source duplication statistics (dataset card).
    "corpus_dup_rate_report": QuerySpec(
        pipeline.corpus_dup_rate_report, pipeline.DUP_RATE_ORACLE
    ),
    # B53 (NEW r6): leap-safe year-over-year growth by month key,
    # explicit-floor basis points.
    "orders_yoy_growth": QuerySpec(
        relational.orders_yoy_growth, relational.YOY_GROWTH_ORACLE
    ),
    # A61 (NEW r6): SPARQL VALUES full row form — correlated
    # combinations as a broadcast inline-data join.
    "kg_construct_values_rows": QuerySpec(
        kg.kg_construct_values_rows, kg.KG_VALUES_ROWS_ORACLE
    ),
    # A62 (NEW r6): constraint-gated commit — checks run on the landed
    # files, failing validation never moves the pointer.
    "store_validated_commit": QuerySpec(
        kg.store_validated_commit, kg.STORE_VALIDATED_ORACLE
    ),
    # D52 (NEW r6): duplicated-sentence (boilerplate) fraction — the
    # Gopher/FineWeb cross-document repetition signal.
    "text_boilerplate_fraction": QuerySpec(
        pipeline.text_boilerplate_fraction, pipeline.BOILERPLATE_ORACLE
    ),
    # B54 (NEW r6): RFM segmentation — sort-free exact terciles per
    # dimension, exact cents, broadcast-bounds bucketing.
    "orders_rfm_segmentation": QuerySpec(
        relational.orders_rfm_segmentation, relational.RFM_ORACLE
    ),
    # C17 (NEW r6): exact streaming distinct per window — chained
    # stateful dedup + windowed count, horizon-bounded state.
    "stream_windowed_distinct": QuerySpec(
        streaming_plans.stream_windowed_distinct,
        streaming_plans.STREAM_WINDOWED_DISTINCT_ORACLE,
    ),
    # A63 (NEW r6): multi-table atomic commit — the root-manifest
    # commit point; no torn cross-table state.
    "store_multi_commit": QuerySpec(
        kg.store_multi_commit, kg.STORE_MULTI_COMMIT_ORACLE
    ),
    # A64 (NEW r6): incremental refresh of a JOIN+AGG view — delta
    # joins the dim once, partials fold into state (A44 x A34).
    "agg_join_view_refresh": QuerySpec(
        kg.agg_join_view_refresh, kg.AGG_JOIN_VIEW_ORACLE
    ),
    # D53 (NEW r6): n-gram novelty — fraction of grams a doc
    # introduces to the corpus (min-doc-id introducer, no seq scan).
    "text_ngram_novelty": QuerySpec(
        pipeline.text_ngram_novelty, pipeline.NGRAM_NOVELTY_ORACLE
    ),
    # A65 (NEW r6): schema drift report derived from parquet footers —
    # incompatible-drift gate (type change / drop detection).
    "schema_drift_report": QuerySpec(
        kg.schema_drift_report, kg.SCHEMA_DRIFT_ORACLE
    ),
    # C18 (NEW r6): streaming retractable aggregate maintenance —
    # signed summary-delta in foreachBatch, epoch-guarded.
    "stream_agg_retractable": QuerySpec(
        streaming_plans.stream_agg_retractable,
        streaming_plans.STREAM_AGG_RETRACT_ORACLE,
    ),
    # A45 (NEW r6): ordered CDC changelog apply with tombstones.
    "merge_cdc_apply": QuerySpec(
        kg.merge_cdc_apply, kg.MERGE_CDC_APPLY_ORACLE
    ),
    # A46 (NEW r6): snapshot-consistent multi-table read via a pinned
    # {table: version} manifest.
    "flow_snapshot_read": QuerySpec(
        kg.flow_snapshot_read, kg.SNAPSHOT_READ_ORACLE
    ),
    # A47 (NEW r6): point-in-time lookup over the SCD2 dimension —
    # the feature-store train-serve-skew guard.
    "scd2_point_in_time": QuerySpec(
        kg.scd2_point_in_time, kg.SCD2_PIT_ORACLE
    ),
    # A48 (NEW r6): PageRank with durable iteration state (resumable);
    # same fixpoint, shares A43's unrolled oracle.
    "graph_pagerank_resumable": QuerySpec(
        kg.graph_pagerank_resumable, kg.GRAPH_PAGERANK_ORACLE
    ),
    # B46 (NEW r6): keyless RANGE join via time-bucket equi-join —
    # the plan shape that replaces the O(n^2) inequality join.
    "events_range_join_bucketed": QuerySpec(
        relational.events_range_join_bucketed,
        relational.EVENTS_RANGE_JOIN_ORACLE,
    ),
    # B47 (NEW r6): gap sessionization via the NATIVE session_window
    # aggregate (boundary semantics probed identical to B9's rule).
    "sessionize_native": QuerySpec(
        relational.sessionize_native, relational.SESSIONIZE_NATIVE_ORACLE
    ),
    # D35 (NEW r6): hash-stable train/val/test split assignment.
    "corpus_split_assign": QuerySpec(
        pipeline.corpus_split_assign, pipeline.CORPUS_SPLIT_ORACLE
    ),
    # D36 (NEW r6): incremental new-vs-corpus dedup — history is never
    # re-paired; batch signatures probe the persisted index.
    "dedup_incremental": QuerySpec(
        pipeline.dedup_incremental, pipeline.DEDUP_INCREMENTAL_ORACLE
    ),
    # D37 (NEW r6): survivorship — pairs -> clusters -> cleaned corpus.
    "dedup_survivors": QuerySpec(
        pipeline.dedup_survivors, pipeline.DEDUP_SURVIVORS_ORACLE
    ),
    # D39 (NEW r6): exact-k deterministic per-group sample (rank by
    # the engine-independent LCG hash).
    "corpus_sample_topk_hash": QuerySpec(
        pipeline.corpus_sample_topk_hash, pipeline.SAMPLE_TOPK_HASH_ORACLE
    ),
    # D54 (NEW r7): ALTO OCR XML -> transcript, the engine-side
    # counterpart of the reference's external arc_alto_to_json flow;
    # scan-side xpath, zero shuffles, closed-form oracle.
    "alto_transcript_extract": QuerySpec(
        pipeline.alto_transcript_extract, pipeline.ALTO_TRANSCRIPT_ORACLE
    ),
    # A70 (NEW r7): SPARQL DESCRIBE + UPDATE text forms — the full
    # SPARQL 1.1 query+update form surface now runs from query text.
    "kg_describe_real_text": QuerySpec(
        kg.kg_describe_real_text, kg.KG_DESCRIBE_REAL_TEXT_ORACLE
    ),
    "kg_update_real_text": QuerySpec(
        kg.kg_update_real_text, kg.KG_UPDATE_REAL_TEXT_ORACLE
    ),
    # A73 (NEW r7): negated property set from text — !(p1|p2) NOT-IN
    # scan, the last SPARQL 1.1 path form the grammar lacked.
    "kg_path_nps_text": QuerySpec(
        kg.kg_path_nps_text, kg.KG_PATH_NPS_TEXT_ORACLE
    ),
    # D57 (NEW r7): corrupt-tolerant ALTO extraction — permissive
    # parse, null-struct classify, dead-letter rows keep identity.
    "alto_transcript_tolerant": QuerySpec(
        pipeline.alto_transcript_tolerant, pipeline.ALTO_TOLERANT_ORACLE
    ),
    # D55 (NEW r7): BPE merge learning over the vocabulary — the
    # iterative tokenizer-training algorithm, oracle-unrolled.
    "corpus_bpe_learn": QuerySpec(
        pipeline.corpus_bpe_learn, pipeline.CORPUS_BPE_ORACLE
    ),
    # D56 (NEW r7): BPE tokenizer application — vocab-bounded iterative
    # phase, corpus touched twice (explode + broadcast join back).
    "corpus_bpe_encode": QuerySpec(
        pipeline.corpus_bpe_encode, pipeline.CORPUS_BPE_ENCODE_ORACLE
    ),
    # A72 (NEW r7): subselect + HAVING + blank-node syntax from text —
    # grouped pre-aggregation below the join, single-agg HAVING hoist.
    "kg_select_subquery_text": QuerySpec(
        kg.kg_select_subquery_text, kg.KG_SELECT_SUBQUERY_TEXT_ORACLE
    ),
    # A71 (NEW r7): closure property paths (+/*/?) from query text —
    # lowered to the pointer-doubling closure operator.
    "kg_path_text_closure": QuerySpec(
        kg.kg_path_text_closure, kg.KG_PATH_TEXT_CLOSURE_ORACLE
    ),
    # B55 (NEW r7): TPC-H Q17 verbatim shape — dim filter pushed into
    # the avg subquery, broadcast slice, exact-cents final sum.
    "q17_small_qty_revenue": QuerySpec(
        relational.q17_small_qty_revenue, relational.Q17_ORACLE
    ),
    # B56 (NEW r7): TPC-H Q22 shape — integer cross-multiplied global
    # average threshold + date-pruned LEFT ANTI join. Completes the
    # 22-query TPC-H plan-shape set.
    "q22_dormant_customers": QuerySpec(
        relational.q22_dormant_customers, relational.Q22_ORACLE
    ),
    # ================= rows-only tail (oracle=None) =================
    # hash/LSH internals are engine-specific; verified in tests against
    # their exact counterparts instead. Streaming rows-only by design.
    "distinct_agg_approx": QuerySpec(relational.distinct_agg_approx, None),
    "events_quantiles_approx": QuerySpec(
        relational.events_quantiles_approx, None
    ),
    "dedup_minhash_lsh": QuerySpec(
        pipeline.dedup_minhash_lsh, pipeline.DEDUP_MINHASH_LSH_ORACLE
    ),
    "dedup_simhash": QuerySpec(
        pipeline.dedup_simhash, pipeline.DEDUP_SIMHASH_ORACLE
    ),
    "ann_lsh_topk": QuerySpec(pipeline.ann_lsh_topk, pipeline.ANN_LSH_ORACLE),
    # promoted r6: the IVF index pipeline is deterministic end-to-end,
    # so it carries a full SQL oracle now (was rows-only/recall-bound).
    "ann_ivf_topk": QuerySpec(pipeline.ann_ivf_topk, pipeline.ANN_IVF_ORACLE),
    "stream_es_feed": QuerySpec(
        streaming_plans.stream_es_feed, streaming_plans.STREAM_ES_FEED_ORACLE
    ),
    # D38 (r6): greedy first-arrival survivorship over a non-clique dup
    # graph is order-dependent, not one SQL query — exact semantics
    # pinned by the Python-oracle test in tests/test_flows.py.
    "flow_corpus_ingest": QuerySpec(pipeline.flow_corpus_ingest, None),
}


# R6 DRIVER WINDOW (VERDICT r5 next-round #2): 50 slots, every one an
# oracle-backed entry with NO driver CORRECTNESS row through r5,
# prioritizing distinct machinery (the named set: bucketed join,
# streaming agg state, incremental refresh, Bloom decontamination,
# DESCRIBE/ASK, constraint check, z-order, the TPC-H five) plus the
# iterative algorithms, the store lifecycle ops, and the stateful
# streaming operators.
# r7 rotation: ALL 50 slots are entries with no driver CORRECTNESS row
# through r6 (77 such oracle-backed entries existed at rotation time);
# the verdict's named priority set (stream_pivot_records,
# sessions_overlap_join, merge_upsert_conditional, kg_select_agg,
# kg_construct_subquery, agg_refresh_retractable, stream_gap_fill,
# stream_interval_join_outer, scd2_point_in_time,
# graph_pagerank_resumable, dedup_incremental, dedup_survivors,
# ann_ivf_topk, store_multi_commit, schema_drift_report) is all in.
# Deferred to the explicit r8 window (machinery twins already hold
# driver rows, all still green under tools/check_oracle.py):
# q4_order_priority, q10_returned_items, q12_priority_lines,
# q14_promo_revenue, q16_supplier_count, q18_large_orders,
# orders_value_histogram, orders_except_intersect, orders_yoy_growth,
# cube_agg, window_range_interval, events_funnel, events_funnel3,
# events_anomaly_mad, events_mode_per_user, orders_running_distinct,
# orders_rfm_segmentation, supplier_pareto_abc, text_repetition,
# text_boilerplate_fraction, text_lm_score, text_ngram_novelty,
# text_sentence_split, corpus_length_band_filter,
# corpus_dup_rate_report, corpus_mix_sample, corpus_sample_topk_hash,
# plus the four entries whose slots the r7-new operators took
# (source_orc_roundtrip, source_json_nested_roundtrip,
# source_corrupt_tolerant, fk_discovery) and the six late-r7 verbatim
# SPARQL entries (newspaper-collection, iiif, newspaper/issues,
# av-audio, av-video, av-complex) plus flow_kg_view_load (A68)
# and kg_select_real_text / kg_ask_real_text (A69) and the late-r7
# B55/B56 TPC-H completions (q17_small_qty_revenue,
# q22_dormant_customers) and the A70 DESCRIBE/UPDATE text forms
# (kg_describe_real_text, kg_update_real_text) and the D54 ALTO
# transcript extraction (alto_transcript_extract) and the A71 text
# closure paths (kg_path_text_closure) and the A72 subselect/HAVING/
# blank-node text form (kg_select_subquery_text) — 47 for r8.
DRIVER_WINDOW: list[str] = [
    # r12 rotation: (a) entries with NO driver row or a round-12
    # change — A80 flow_reference_main_store (registered after the
    # r11 window froze; local mirror PASS), the NEW composed IVF->PQ
    # tier, the advice-touched oracles (pq divisibility guard /
    # integer-division oracle; null-consistent ES feed oracle), the
    # survivor-scoped curation flow, and the three r5-stale rows the
    # r11 verdict named (dedup_embedding_lsh, multimodal_resize,
    # multimodal_frame_sample); (b) the store-commit machinery —
    # commit_tables now stages tables CONCURRENTLY and resolves
    # CARRY_LATEST inside the lock, so every multi-table-commit
    # entry re-grades; (c) the SPARQL surface — the star fan-out
    # guard, the checkpoint-default change (post-explode -> none),
    # expression ORDER BY lowering and the cached-plan-partitioning
    # session conf change every SPARQL plan, so all ten verbatim
    # production queries, the composed flows, the text forms and the
    # paths re-grade; (d) the oldest rows on the books (r6 grades).
    # (a) no-row / new / advice-touched / r5-stale.
    "flow_reference_main_store",
    "ann_ivf_pq_topk",
    "ann_pq_topk",
    "stream_es_feed",
    "corpus_curation",
    "dedup_embedding_lsh",
    "multimodal_resize",
    "multimodal_frame_sample",
    # (b) store-commit machinery re-grades.
    "flow_reference_incremental_store",
    "flow_reference_deletes_store",
    "store_multi_commit",
    "store_validated_commit",
    # (c) SPARQL surface re-grades: verbatim production queries.
    "kg_construct_real_query",
    "kg_construct_real_query_org",
    "kg_construct_real_query_deletes",
    "kg_construct_real_query_newspaper",
    "kg_construct_real_query_iiif",
    "kg_construct_real_query_issues",
    "kg_construct_real_query_av_audio",
    "kg_construct_real_query_av_video",
    "kg_construct_real_query_av_complex",
    "kg_construct_real_query_av_audio_org",
    # (c) composed reference flows.
    "flow_kg_view_load",
    "flow_reference_pipeline",
    "flow_reference_incremental",
    "flow_reference_deletes",
    "reference_delete_report",
    # (c) SPARQL text forms + paths.
    "kg_select_real_text",
    "kg_ask_real_text",
    "kg_describe_real_text",
    "kg_update_real_text",
    "kg_select_subquery_text",
    "kg_path_nps_text",
    "kg_path_nps_inverse",
    "kg_path_text_closure",
    "kg_path_transitive",
    # (d) oldest re-grades (latest grade r6).
    "events_pivot_wide",
    "orders_cohort_retention",
    "events_quantiles",
    "q13_order_distribution",
    "events_json_extract",
    "events_sliding_window",
    "events_gap_fill",
    "orders_window_functions",
    "orders_basket_pairs",
    "events_range_join_bucketed",
    "q6_revenue_forecast",
    "q8_market_share",
    "q15_top_supplier",
    "q20_part_promotion",
]

assert len(DRIVER_WINDOW) == 50, len(DRIVER_WINDOW)
assert len(set(DRIVER_WINDOW)) == 50, "duplicate window entry"
assert all(
    _SPECS[name].oracle is not None for name in DRIVER_WINDOW
), "rows-only entry in the graded window"

# Assemble: window first (graded), then the remaining oracle-backed
# entries (checked by tools/check_oracle.py + tests/test_oracle.py
# locally), then the rows-only tail (oracle=None entries must never
# occupy graded slots another oracle-backed entry could use).
QUERIES: dict[str, QuerySpec] = {name: _SPECS[name] for name in DRIVER_WINDOW}
for _name, _spec in _SPECS.items():
    if _name not in QUERIES and _spec.oracle is not None:
        QUERIES[_name] = _spec
for _name, _spec in _SPECS.items():
    if _name not in QUERIES:
        QUERIES[_name] = _spec
assert len(QUERIES) == len(_SPECS)


_SHIPPED: set[str] = set()


def _ensure_package_on_workers(spark: SparkSession) -> None:
    """Python workers import this package by NAME (closures in module
    code pickle by reference), so a driver launched outside the repo
    root — different cwd, no PYTHONPATH — leaves executors unable to
    import it and every mapInPandas/applyInPandas/foreachPartition
    entry dies with ModuleNotFoundError. Shipping the package as a zip
    via addPyFile (the canonical Spark mechanism for code
    distribution; on a real cluster this is exactly how the package
    reaches remote executors) makes the registry self-contained for
    ANY driver. Once per SparkContext; pure-JVM queries pay nothing
    beyond the one-time zip. Keyed by applicationId — unique per
    context, unlike id() (a stopped context's address can be reused
    by the next one, which would silently skip the ship)."""
    key = spark.sparkContext.applicationId
    if key in _SHIPPED:
        return
    import os
    import tempfile
    import zipfile

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo_root = os.path.dirname(pkg_root)
    zip_path = os.path.join(
        tempfile.mkdtemp(prefix="pkg_ship_"),
        "prefect_flow_arc_kg_postgres_etl_spark.zip",
    )
    with zipfile.ZipFile(zip_path, "w") as zf:
        for base, _dirs, files in os.walk(pkg_root):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(base, fn)
                    zf.write(full, os.path.relpath(full, repo_root))
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(key)


def _seed_shuffle_partitions(spark: SparkSession) -> None:
    """Seed AQE's initial shuffle partition count on UNTUNED sessions.

    The plain 200-partition default routes every no-combine shuffle
    through BypassMergeSortShuffleWriter, which opens one compressed
    disk writer PER REDUCE PARTITION per task — 200 x 32 concurrent
    tasks x ~128 KiB of LZ4/serializer buffers is ~800 MB of
    shuffle-writer overhead, and a default-sized 1 GB driver JVM OOMs
    on the heavy verbatim plans (measured, r8). Any value above
    spark.shuffle.sort.bypassMergeThreshold (200) selects the
    sort-based writer (ONE spillable buffer per task) and AQE
    coalesces the extra partitions right back, so small queries are
    unaffected. session.py already seeds 512 on harness sessions; this
    covers the correctness driver's own session. Respects an explicit
    user setting."""
    k = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    if spark.conf.get(k, None) is None:
        spark.conf.set(k, "256")
    # Cached-plan output partitioning must track AQE (r12): with the
    # elevated initial partition count above, the default (false) pins
    # every .persist() at the pre-coalesce width and each downstream
    # consumer pays a full-width scan of the cache (measured 86 -> 15 s
    # on the composed reference main flow at sf0.001). Runtime-settable
    # SQLConf; respects an explicit user setting.
    k2 = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    if spark.conf.get(k2, None) is None:
        spark.conf.set(k2, "true")


def _self_shipping(builder: Builder) -> Builder:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_package_on_workers(spark)
        _seed_shuffle_partitions(spark)
        return builder(spark, sf_dir)

    return run


def queries() -> dict[str, Builder]:
    return {
        name: _self_shipping(spec.builder) for name, spec in QUERIES.items()
    }


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle
    }
