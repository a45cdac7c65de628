"""Plan-shape regression tests: pin the shuffle/broadcast budget of
representative queries so a future edit that sneaks an extra
exchange into a hot path FAILS here instead of surfacing as a 2×
regression at 100 TB. Counts come from the same final-adaptive-plan
parser the PLANS.md audit uses (tools/explain_audit.summarize)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from ensembl_lakehouse_spark.operators.clustering import KM_ITERS
from tools.explain_audit import summarize
from tests.conftest import SF_DIR

#: query -> (max hash shuffles, require zero shuffles?)
#: r11 OPTIMIZATION: budgets re-pinned after the conditional
#: spread_scan rollout (guide §2.5 single-row-group input fix) —
#: the probe SF pays the spread exchange that a multi-row-group
#: 100 TB layout does not; multi-reference plans pay it once per
#: reference (no ReusedExchange across differently-pruned refs).
BUDGETS = {
    # --- Round 11 (probed at sf0.001, pinned at the observed count)
    "price_index_fisher": 4,
    "ship_delay_by_priority": 2,
    "order_value_band_monthly": 2,
    "size_demand_curve": 2,
    "nation_negative_balance": 1,
    "returnflag_linestatus_grid": 1,
    "order_age_by_status": 1,
    "monthly_revenue_per_customer": 2,
    "nation_balance_contrast": 2,
    # checkpointed ≤|types|² grid re-read by four bounded branches
    "session_transition_probs": 3,
    "events_weekend_uplift": 3,
    "user_lifespan_bands": 2,
    "packing_efficiency_curve": 1,
    "lang_punctuation_bands": 3,
    "embedding_sign_balance": 3,
    "brand_rank_stability": 3,
    # single lattice pass: (cust, prio) → cust (priority SET, ≤5)
    # → explode → prio cells; the first cut self-joined at 7
    "priority_loyalty": 3,
    "supplier_revenue_deciles": 2,
    "order_width_monthly": 2,
    "first_order_value_matrix": 3,
    "brand_quarter_growth": 2,
    "events_daily_volatility": 2,
    "token_case_profile": 3,
    # rides the shared banded-LSH candidate lattice at threshold 0
    "dedup_threshold_sensitivity": 3,
    "net_multiplier_bands": 2,
    "docid_continuity_audit": 1,
    "embedding_exact_dups": 3,
    "props_size_profile": 2,
    # --- Round 11 batch 4
    "linenumber_price_profile": 1,
    # AQE broadcasts the orderkey join at probe SF; plain SMJ adds
    # two exchanges at scale — budget the scale shape
    "negative_lead_audit": 3,
    "unit_price_band_mix": 1,
    "session_depth_value_decay": 2,
    "user_weekday_regularity": 3,
    "prefix_collision_rate": 3,
    "intra_doc_novelty": 2,
    "embedding_band_energy": 2,
    # --- Round 11 batch 5
    # AQE broadcasts the orderkey/id joins at probe SF; plain SMJ
    # adds exchanges at scale — budget the scale shape
    "order_total_reconciliation": 3,
    "token_position_bias": 2,
    "token_budget_apportionment": 2,
    "prefix_screen_precision": 4,
    "embedding_coverage_audit": 3,
    # --- Round 9 (probed at sf0.001, pinned at the observed count)
    "events_error_rate_hourly": 1,
    "user_session_count_bands": 2,
    "nation_customer_supplier_ratio": 2,
    "tax_discount_grid": 1,
    "numeric_token_rate": 3,
    "embedding_peakiness": 3,
    "linestatus_mix_monthly": 2,
    "brand_repeat_buyers": 3,
    "customer_value_trend_bands": 3,
    "customer_spend_lorenz": 2,
    "session_conversion_rate": 2,
    # multi-consumer (user, type) lattice — same accepted shape as
    # sketch_kmv_union's cells; every consumer is lattice-sized
    "type_cooccurrence_lift": 8,
    "text_word_length_profile": 3,
    "vocab_frequency_spectrum": 4,
    "boilerplate_suffix_rate": 3,
    "quality_length_matrix": 2,
    "embedding_norm_label_matrix": 3,
    "events_retention_by_first_type": 3,
    "user_first_day_value": 3,
    # --- Round 10 (probed at sf0.001, pinned at the observed count)
    "rolling_retention_matrix": 2,
    "resurrection_gap_histogram": 3,
    "price_index_series": 4,
    "rerank_pairwise_audit": 1,
    "embedding_version_drift": 2,
    "dedup_rate_by_batch": 4,
    "status_priority_matrix": 2,
    "quantity_band_returns": 1,
    "brand_type_span": 2,
    "segment_balance_profile": 1,
    "dup_length_bias": 3,
    # batch 4: map-only prep → one bounded-grid agg each; the user
    # funnel adds its user-keyed partial agg
    "packing_efficiency": 2,
    "first_purchase_latency_bands": 2,
    "source_length_skew": 2,
    # batch 3: the endpoint window + per-session collapse reuse the
    # session lattice's user_id hash; the extra two exchanges are the
    # bounded entry×exit grid's agg + share window
    "session_entry_exit_matrix": 3,
    "brand_return_exposure": 1,
    "price_index_paasche": 4,
    "embedding_dominant_dim": 3,
    "session_threshold_sensitivity": 1,
    "monthly_new_vs_repeat_revenue": 2,
    "spend_consistency_bands": 2,
    "quality_by_batch": 2,
    "events_peak_hour_share": 2,
    "order_line_dominance": 2,
    "customer_nation_mix_share": 2,
    "monthly_revenue_range": 2,
    "region_segment_share": 2,
    "order_gap_bands_by_segment": 2,
    "top_customer_share_by_nation": 2,
    "orders_quarter_growth": 1,
    "supplier_balance_quartiles_by_nation": 1,
    "embedding_sparsity_audit": 2,
    "source_quality_profile": 2,
    # spread reverted (r11): one |priorities|-group agg exchange
    "orders_priority_value_profile": 1,
    "nation_order_priority_mix": 2,
    "customer_value_migration": 3,
    "part_size_price_curve": 1,
    "tax_band_revenue": 1,
    "order_width_discount_profile": 2,
    "user_volume_bands": 3,
    "doc_lang_source_matrix": 3,
    "cross_source_exact_dups": 3,
    "dedup_cluster_precision": 6,
    "holiday_revenue_calendar": 1,
    "orders_weekday_index": 1,
    "returns_rate_monthly": 1,
    "discount_elasticity_by_type": 2,
    # +1: conditional spread_scan exchange at probe SF (no-op at scale)
    "segment_value_quartiles": 2,
    "embedding_quantile_clip": 4,
    "embedding_component_histogram": 3,
    "vocab_coverage_topk": 2,
    "langid_margin_audit": 2,
    "boilerplate_prefix_rate": 3,
    # --- Round 8 (probed at sf0.001, pinned at the observed count)
    # two-phase tiling (r9): bucket-partitioned rank exchanges
    # (offsets/boundaries are plan-build literals) replace the
    # former SinglePartition global-ntile windows
    "customer_balance_spend_matrix": 2,
    "part_type_brand_matrix": 1,
    "supplier_part_coverage": 4,
    "user_retention_curve": 5,
    "events_type_value_quartiles": 1,
    "doc_token_length_profile": 3,
    "source_vocab_gini": 3,
    "sketch_kmv_rollup_read": 2,
    "embedding_label_separation": 3,
    "contamination_matrix": 4,
    "text_char_class_profile": 2,
    "doc_length_mad_outliers": 4,
    "inventory_backorder_sim": 3,
    "reorder_point_report": 2,
    "parts_pareto_concentration": 2,
    "part_brand_price_dispersion": 1,
    "lineitem_discount_effectiveness": 2,
    "customer_ltv_cohorts": 6,
    "cohort_repeat_rate": 4,
    "calendar_adjusted_monthly_index": 2,
    "nation_trade_balance": 2,
    "supplier_balance_deciles": 1,  # map-only cutoff tiling (r11)
    "orders_priority_mix_by_month": 3,
    "orders_interarrival_histogram": 2,
    "events_hourly_heatmap": 1,
    "weekly_active_users": 2,
    "user_burstiness": 2,
    "events_value_drift": 4,
    "user_type_gini": 3,
    # map-only paths: any shuffle at all is a defect
    "scan_project": 0,
    "multimodal_quantize": 1,
    "sample_hash": 0,
    "sample_weighted": 1,
    "text_quality": 1,
    "text_fingerprint": 1,
    "text_redact": 1,
    # canonical agg: exactly one partial->final exchange
    "agg_pricing_summary": 2,
    "rollup_agg": 2,
    "grouping_sets_agg": 1,
    "histogram_totalprice": 1,
    "unpivot_measures": 2,
    "corr_price_qty": 2,
    # single global agg, all predicates in the scan
    "revenue_forecast": 0,
    # TPC-H shapes: the fact⋈fact exchange is the only one allowed
    "ship_priority": 1,
    # +1 each: conditional spread_scan exchange at probe SF (no-op at scale)
    "late_priority": 2,
    "promo_revenue": 2,
    "returned_customers": 1,
    "nation_profit": 1,
    "large_volume_customers": 1,
    "important_parts": 1,
    "dormant_customers": 1,
    "window_percent_rank": 1,
    "events_ewma": 1,
    # fact⋈fact with broadcast dims: one shuffle max
    # +1: conditional spread_scan exchange at probe SF (no-op at scale)
    "join_region_revenue": 2,
    "join_skew_salted": 1,
    # window on one partitioning
    "window_topk_per_group": 1,
    "window_running_sum": 1,
    "events_moving_avg": 1,
    "scd2_intervals": 1,
    "split_train_val_test": 1,
    # (day,user) dedup + per-day distinct lattice + observed-days
    # dedup feeding the (AQE-broadcast) join
    "events_sliding_distinct": 4,
    # one user_id window shuffle, same as the backward as-of twin
    "events_asof_forward": 1,
    # one group-key window shuffle; the final agg reuses it
    "group_median": 1,
    # round 5: hourly agg + per-hour window
    "events_topk_per_hour": 2,
    # distinct-agg lattice (2) + share window on the 7×types relation
    "events_dow_profile": 3,
    # basket lattice distinct + cap window + pair agg + supports/N aggs
    # (pair list is bounded, so the supports joins broadcast)
    "basket_rules": 7,
    "cooccur_pmi": 7,
    # posting join + pair agg + sizes join (large-large SMJ) + kNN window
    "doc_jaccard_knn": 7,
    # scored lattice window only (queries broadcast)
    "embedding_margin_audit": 3,
    # component labels come from the checkpointed recursion (priced
    # in components_recursive); the keep-list adds a token join +
    # one component agg
    "dedup_cluster_keep_list": 3,
    # shingle-df agg + per-doc agg; the df join broadcasts at test SF
    # (AQE) and SMJs at scale on the same two exchanges
    "ngram_novelty": 2,
    # stats broadcast back: one agg shuffle, join must not add one
    "events_anomaly": 1,
    "value_winsorize": 1,
    # two-stage pipelines
    "scalar_subquery_threshold": 2,
    "cust_order_distribution": 2,
    "merge_upsert": 2,
    "pack_sequences": 2,
    # map-only chunk lattice + one fingerprint agg (distinct inside)
    "chunk_boilerplate": 2,
    # near-pair lattice (band window + pair distinct behind its
    # checkpoint) + two source joins + the |sources|^2 cell agg
    "source_overlap": 5,
    # fp window + the 1-row savings aggregate
    "dedup_savings": 2,
    # map-only norms + the 1-row audit (EXPAND for the distinct)
    "embedding_norm_audit": 2,
    # diagnostics: calibration shares dedup_near's lattice (band
    # window + pair distinct); the recall audit composes three ANN
    # pipelines (their per-query windows) + the hit-join agg.
    "minhash_calibration": 2,
    "ann_recall_audit": 9,
    # X1/X2 additions: substring dedup's only visible shuffle is the
    # pair agg (the gram-cap window lives behind the checkpoint);
    # semantic dedup = cell join + best-agg + final left join;
    # outliers = (label,dim) agg + label assemble + per-label window.
    "dedup_substring": 2,
    "dedup_semantic": 3,
    "embedding_outliers": 5,
    # PQ/ADC: encode+LUT are map-side; the ADC window and the rerank
    # window share the q_id partitioning, so one exchange serves both.
    "similarity_pq": 3,
    # Unrolled Lloyd with per-iteration 1-row centroid checkpoints
    # (r11): the executed plan is ONE map-only broadcast assignment
    # over the corpus + the final cluster agg; the (KM_ITERS-1)
    # centroid updates run once per invocation as their own jobs.
    "embedding_kmeans": 1,
    # Retrieval: tf agg + df agg + stats row + per-doc score agg
    # (top-k is TakeOrdered, no exchange); postings = tf agg + term agg.
    "bm25_search": 4,
    # fusion = the bm25 subplan + two bounded top-k sorts + the
    # <=k-row rank windows + final k-row order (AQE may plan the
    # tiny exchanges); generous cap, the real pin is bm25's own
    "rank_fusion": 9,
    # final MMR plan reads checkpointed <=pool-row frames; only the
    # <=select_k-row final order survives as exchanges
    "mmr_rerank": 4,
    "inverted_postings": 2,
    # Graph: ReuseExchange dedups the shared trade aggregation, so
    # degree = trade + out + in; pagerank = trade + outdeg + one mass
    # agg per unrolled iteration; triangles = trade + per-node agg
    # (the edge self-joins are broadcast on the dim-bounded graph).
    "graph_degree": 3,
    # r11: per-iteration |nations|-row rank checkpoints (the
    # embedding_kmeans pattern) — the executed plan reads the final
    # checkpointed ranks; iteration mass/dangling aggs run once per
    # invocation as their own jobs
    "graph_pagerank": 1,
    "graph_pagerank_full": 1,
    "graph_triangles": 4,
    # LM lattice: pair agg + head agg + vocab row + topk window /
    # per-doc score agg; hash_features is explode + ONE per-doc agg.
    "lm_bigram_topk": 6,
    "lm_doc_score": 6,
    "hash_features": 1,
    # Sketches: CMS = counter-table agg + heavy-hitter agg (probe
    # join is broadcast); HLL = register agg + grid/exact aggs.
    "sketch_count_min": 3,
    "sketch_hll_distinct": 7,
    # Incremental dedup: fp join agg + band window + verify agg
    # (band/shingle branches live behind localCheckpoint truncation).
    "dedup_incremental": 3,
    # Bloom: bitmap agg (<=64 rows) + per-order AND-agg + final agg;
    # bitmap and truth sides broadcast.
    "join_bloom_pruned": 3,
    # Ridge gate: the d x d normal-equation reduction is the ONLY
    # exchange; scoring is map-side with literal weights.
    "quality_classifier": 1,
    # Reporting/curation: datacard = dedup window + group agg; skew
    # audit = (col,key) counts + per-col agg; k-anon = class agg +
    # 1-row total broadcast; epoch shuffle = the per-epoch window.
    "corpus_datacard": 2,
    # funnel: fp window + lang running-count window + 1-row agg
    "curation_funnel": 3,
    "skew_audit": 3,
    # langid scoring is map-only; cell agg + per-lang total window
    "langid_confusion": 3,
    "privacy_kanon_audit": 1,
    "epoch_shuffle": 1,
    # Round-5 report pack: skyline = distinct + bucket prefilter agg
    # (the exact pass runs on broadcast survivors); rfm/benford/
    # target_encoding/bin_lift = one partial agg, 1-row totals
    # broadcast back (global ntile/share windows are SinglePartition,
    # not hash exchanges); yoy/concentration = agg + keyed window.
    "skyline_pareto": 2,
    "orders_rfm_segments": 2,  # map-only cutoff tiling ×3 (r11)
    "benford_audit": 1,
    "target_encoding": 1,
    "feature_bin_lift": 1,
    "revenue_yoy": 2,
    "revenue_concentration": 2,
    # level shift: daily agg + per-type window; concurrency: the
    # user-session window + the per-day sweep window (the union
    # reuses the session lattice); link predict: the pair lattice
    # lives behind its checkpoint, leaving the per-node cap window +
    # wedge agg; quant error: map-only element math, one label agg;
    # diversity: wordcount lattice + per-source rollup + top window.
    "events_level_shift": 2,
    "session_concurrency": 2,
    # out-cap + in-cap windows (different partitionings) + wedge agg
    # + deg agg; the pair lattice lives behind its checkpoint
    "graph_link_predict": 4,
    "embedding_quant_error": 2,
    "source_token_diversity": 4,
    # Round-6 governance pack: every member is one partial-agg
    # lattice (+1 hash exchange per extra agg/join stage); 1-row
    # anchors/totals broadcast back (SinglePartition, not counted).
    "retention_audit": 1,
    # base agg + cascade agg; the id semi-join and source join
    # broadcast at test SF (the semi side is the erasure set — it
    # stays broadcastable at scale by construction)
    "tombstone_cascade": 2,
    "term_exposure_scan": 1,
    # per-order agg + per-cust agg; orders join broadcasts at test
    # SF, SMJs at scale on the same two exchanges; cust dim join is
    # k-row broadcast after the TakeOrdered
    "subject_access_report": 2,
    # one user_id window exchange, reused by the per-user agg
    "events_user_gaps": 1,
    # purchase-window exchange + pre-window exchange (reused by the
    # touches agg) + final combo agg
    "attribution_first_last": 3,
    "label_balance_audit": 1,
    "kfold_assign": 1,
    # orderkey join broadcasts orders at test SF (SMJ at scale);
    # priority agg is the one hash exchange
    "order_ship_lead": 1,
    # Round-6 batch 2: term->min-bucket agg + the two per-bucket
    # aggs (the |buckets|-row curve join broadcasts; the cumulative
    # window is SinglePartition on that tiny relation)
    "vocab_growth_curve": 4,
    # the shared trade aggregation's two exchanges; the reversed-
    # edge self-join broadcasts on the dim-bounded graph relation
    "graph_reciprocity": 2,
    # band agg + final sort; 1-row total broadcast back
    "discount_band_lift": 2,
    # mix agg + the two differently-partitioned windows (month
    # share, per-priority MoM lag) — all on |months|x|priorities|
    "priority_mix_monthly": 3,
    # count(distinct) expansion = two-phase agg on |brands| rows
    "brand_price_dispersion": 2,
    # (label,dim) centroid agg + pair agg; the b-side broadcast
    "label_centroid_separation": 3,
    # user lag window + |types|² agg + the from_type share window
    "events_type_transitions": 3,
    "supplier_nation_balance": 1,
    # map-only explode/fixed-point math, one |dims| agg
    "embedding_dim_stats": 2,
    # round-6 batch 3: hourly partial agg + per-type final agg
    "events_burstiness": 2,
    # hourly agg + lag-24 self-join (AQE broadcast at test SF) +
    # per-type moment agg
    "events_autocorr24": 3,
    # two year histograms + the dim-bounded full-outer/window stage
    "feature_drift_chi2": 3,
    # one |sources| agg; the share windows ride the 1-partition frame
    "mix_temperature_weights": 1,
    # explode → (doc,tok) agg → per-doc agg → |langs| agg (first
    # combine is map-side; doc-prefixed keys share partitioning)
    "text_lexical_gini": 3,
    # visible shuffles only: the basket funnel + per-round degree
    # aggs sit behind localCheckpoints (priced like dedup_near)
    "graph_kcore": 3,
    # round-6 batch 4
    # part dim broadcasts; one moment agg to |brands| rows
    "discount_quantity_corr": 1,
    # per-customer agg + |segments| final (customer dim broadcasts)
    "customer_repeat_rate": 2,
    # per-supplier agg + |nations| final sharing the n_name window
    "supplier_hhi": 2,
    # one user window + trigram agg (top-N is TakeOrdered)
    "events_trigram_paths": 2,
    # panel² broadcast self-join; window + in-degree + orphan union
    # + histogram aggs all run on ≤ panel·k rows
    "embedding_hubness": 5,
    # round-6 batch 5
    # (user,week) distinct + user lag window + per-week agg
    "events_growth_accounting": 3,
    # 1-row anchor broadcast; band agg + |status×bands| share window
    "orders_backlog_aging": 2,
    # map-side sentence explode; per-doc + per-lang aggs
    "text_sentence_stats": 2,
    # checkpointed Lloyd (see embedding_kmeans): the (cluster,label)
    # agg + its |clusters| majority window
    "embedding_cluster_purity": 2,
    # round-6 batch 6
    # checkpointed basket funnel + degree agg + 1-row moment agg
    # (deg joins broadcast on the dim-bounded graph)
    "graph_assortativity": 3,
    # the one trade aggregation; marginal windows ride the
    # |nations|² matrix (AQE may add tiny exchanges at scale)
    "nation_trade_lift": 3,
    # (user,day) distinct + day spine + range join + wau/dau
    # distinct aggs — all over the dim-bounded lattice
    "events_stickiness": 6,
    # one partial agg to ≤7×24 cells + the dow share window
    "events_hour_heatmap": 2,
    # fact⋈fact (AQE-broadcast at test SF) + |suppliers| moment agg;
    # top-N is TakeOrdered
    "supplier_lead_variability": 2,
    # round-6 batch 7
    # cell agg; marginal windows ride the |segments×priorities| matrix
    "segment_priority_lift": 3,
    # fact-fact exchange + |regions×years| cells + share/lag windows
    "region_revenue_share_trend": 4,
    # the gini lattice's two doc-keyed aggs + the |langs| moment agg
    "doc_length_gini_corr": 3,
    # panel² broadcast self-join; ONE ≤80-cell band agg
    # +1: conditional spread_scan exchange at probe SF (no-op at scale)
    "embedding_cosine_histogram": 2,
    # ---- Round-7 backfill: the pre-r3 cohort (VERDICT r6 "what's
    # wrong #1") — budgets pinned at the plan shapes hand-audited in
    # r2/r3 and re-measured for this backfill, so a regression in
    # ANY inventory query now fails here instead of at 100 TB. ----
    # map-only / broadcast-only paths: zero exchanges allowed
    "key_filter": 0,
    "condition_filter": 0,
    "preview_limit": 0,
    "scalar_functions_dialect": 0,
    "text_token_stats": 1,
    "text_langid": 1,
    "bpe_encode": 0,
    "embedding_pca": 0,
    "chunk_documents": 1,
    "multimodal_payload": 0,
    # global ntile rides SinglePartition, not a hash exchange
    "window_ntile_deciles": 0,
    # dim joins broadcast; predicates stay in the scan
    "disjunctive_filter": 0,
    "join_semi_anti": 0,
    # every FK check is a broadcast (12 at once), no exchange
    "audit_referential": 0,
    # one partial→final agg, or one keyed window, dims broadcast
    "multimodal_centroid": 2,
    "dedup_exact": 2,
    "distinct_key": 1,
    "cube_agg": 2,
    "quantile_summary": 2,
    "events_sessionize": 1,
    "quota_per_group": 1,
    "events_asof_join": 1,
    "pivot_counts": 1,
    "range_join_bands": 1,
    "events_json_extract": 2,
    "profile_table": 2,
    "window_lead_lag": 1,
    "agg_filtered": 1,
    "exists_order_priority": 1,
    "revenue_view_max": 1,
    # +1: conditional spread_scan exchange at probe SF (no-op at scale)
    "nation_trade_volume": 2,
    "market_share": 1,
    "suppliers_excess": 1,
    "join_order_lineitem": 1,
    # the recursion's per-round lattices live behind localCheckpoint;
    # only the final label aggregation is a visible exchange
    "components_recursive": 1,
    # banded-LSH dedup family: band window + pair distinct sit behind
    # the verify checkpoint; the one visible exchange is the pair agg
    "dedup_near": 1,
    "dedup_simhash": 1,
    "dedup_near_chargram": 1,
    "dedup_embedding": 2,
    # brute-force panel broadcasts; the per-query top-k window is the
    # only exchange
    "similarity_topk": 3,
    # + the bucket-join agg / coarse-cell assignment stages
    "similarity_lsh": 3,
    "similarity_ivf": 4,
    # two-stage agg pipelines (partial lattice + final rollup)
    "pipeline_curation": 2,
    "rollup_incremental": 2,
    "skew_safe_distinct": 2,
    "events_daily_from_hourly": 2,
    "events_hourly": 2,
    "text_top_ngrams": 2,
    "text_repetition": 2,
    "bpe_pair_counts": 3,
    "mix_sources": 2,
    "set_ops": 2,
    # wordcount lattice + contamination probe join (probe broadcasts)
    "decontaminate": 2,
    "text_token_rarity": 2,
    "fuzzy_match_names": 2,
    "sketch_quantile_sample": 4,
    "events_gapfill": 2,
    # three-stage lattices: per-key agg + bucket/band agg + final
    "component_size_histogram": 3,
    "basket_pairs": 3,
    "dedup_components": 3,
    "sketch_kmv_distinct": 3,
    "suppliers_waiting": 3,
    "min_price_supplier": 3,
    "supplier_count_by_part": 3,
    # ---- Round-7 additions ----
    # map-only length/band + |langs×bands| agg + lang share window
    "multimodal_size_histogram": 2,
    # per-order partial agg + |bands| final; shares SinglePartition
    "order_width_histogram": 2,
    # one (week) exact-percentile agg; lag rides |weeks| rows
    "events_weekly_quantiles": 1,
    # ONE user window; per-user agg + 1-row summary reuse it
    "funnel_latency_quartiles": 1,
    # |years| agg; lag/decomposition ride SinglePartition
    "revenue_bridge": 1,
    # sessionize's ONE user exchange (both windows + session agg
    # ride it) + |bands| agg
    "session_length_histogram": 2,
    # |weeks×types| cells + weeks/types dim aggs + dense-grid
    # broadcast joins + type-lag window + per-week final agg — only
    # the first exchange is data-proportional; the rest ride the
    # dim-bounded lattice (dense grid is the r7 review fix)
    "events_type_share_drift": 6,
    # explode over the part DIM only; one term agg; 1-row total
    # broadcast
    "part_name_price_lift": 1,
    # per-customer fact agg (broadcast back) + |segments| moment agg
    "balance_activity_corr": 2,
    # distinct lattice + per-type bottom-k window + pair-union
    # window + exact-inter self-join agg; all sketch-side merging
    # runs on ≤|types|·k broadcast rows
    "sketch_kmv_union": 7,
    # posexplode → (dim,half) partial agg → |dims| assemble
    "embedding_batch_drift": 3,
    # lineitem⋈part broadcast; |types| agg, share on SinglePartition
    "part_type_margin": 1,
    # orders only; 12-row agg
    "seasonal_index": 1,
    # custkey lag window + |segments| agg (customer dim broadcasts)
    "customer_order_cadence": 2,
    # (part,supp) agg + part-keyed window/agg reuse; TakeOrdered head
    "part_supply_concentration": 2,
    # ONE fact⋈fact exchange (cust/part dims broadcast) + cell agg
    # rides it; marginal windows on the |segments×brands| matrix
    "segment_brand_affinity": 1,
    # explode → (lang,tok) partial agg → |langs| final
    "text_hapax_ratio": 3,
    # token agg + TakeOrdered head (no global-sort window); the
    # 1-row total joins by broadcast
    "text_zipf_check": 2,
    # map-only per-doc counts + ONE |bands| agg
    "text_ttr_curve": 2,
    # (lang,tok) distinct + tok self-join pair agg; sizes broadcast
    "lang_vocab_overlap": 4,
    # |days×types| cell agg + 35-row moment agg broadcast back
    "events_dow_anomaly": 2,
    # cell agg + ONE per-type window pass (prefix/rank share it)
    "events_cusum_shift": 2,
    # user lag window + |bands| agg (share rides SinglePartition)
    "events_gap_histogram": 2,
    # per-user agg; decile/share windows are SinglePartition
    "events_user_concentration": 1,
    # (user,day) lattice + funnel stage aggs
    "events_funnel": 4,
    # cohort spine + (cohort,week) cells + retention shares
    "cohort_retention": 5,
    # tf lattice + df lattice + tf·idf join + per-doc window
    "text_doc_terms": 5,
}


@pytest.fixture(scope="module")
def plans(spark):
    """Executed (final-adaptive) plan summaries for every budgeted
    query. Built from a small thread pool (guide §2.6 — actions are
    only sequential because driver code calls them sequentially):
    each worker builds, collects and explains independently, so the
    sf0.001 jobs overlap instead of serializing 368 scheduler
    round-trips — 203 s → ~60 s of the suite's setup time."""
    from concurrent.futures import ThreadPoolExecutor

    qs = entry.queries()

    def one(name):
        df = qs[name](spark, SF_DIR)
        df.collect()  # finalize the adaptive plan
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        return name, summarize(formatted)

    with ThreadPoolExecutor(max_workers=8) as pool:
        return dict(pool.map(one, BUDGETS))


def test_shuffle_budgets(plans):
    over = {
        name: (s["shuffles"], budget)
        for name, budget in BUDGETS.items()
        if (s := plans[name])["shuffles"] > budget
    }
    assert not over, f"shuffle budget exceeded (actual, budget): {over}"


def test_scans_stay_pruned(plans):
    # map-only scans must push their projection: no query here reads
    # more than the columns it returns + filters on.
    rs = plans["scan_project"]["read_schemas"]
    assert rs and all(sch.count(":") <= 3 for sch in rs), rs


def test_dim_joins_are_broadcast(plans):
    assert "BroadcastHashJoin" in plans["join_region_revenue"]["joins"]
    assert plans["join_region_revenue"]["broadcasts"] >= 3


def test_budgets_cover_entire_inventory():
    """r7 (VERDICT #1): every queries() entry has a pinned shuffle
    budget — a new operator without one fails HERE, so the one-time
    plan audit can never silently lapse again."""
    import __spark_entry__ as e

    qs = set(e.queries())
    assert set(BUDGETS) == qs, (
        f"unbudgeted: {sorted(qs - set(BUDGETS))}; "
        f"stale: {sorted(set(BUDGETS) - qs)}"
    )


#: ops whose tiles come from the two-phase boundary-broadcast
#: primitive (operators/tiling.py) — the r8 VERDICT's flagged
#: scale-killer class, rewired in r9
GLOBAL_TILED = (
    "supplier_balance_deciles",
    "orders_rfm_segments",
    "customer_balance_spend_matrix",
)


def test_no_global_window_on_sf_growing_input(spark):
    """r8 VERDICT #4: no SF-growing relation may funnel through an
    Exchange SinglePartition into a Window in these plans. Asserted
    structurally: (a) no ntile() window remains (the primitive
    replaced them all), and (b) every row_number() windowspec is
    PARTITIONED — in the formatted plan a windowspecdefinition's
    partition columns come before the ordering terms, so a spec
    whose first argument carries a sort direction is a global
    window. The share windows (SUM OVER ()) that remain run on
    ≤ tiles^k aggregate cells and the tiling offsets window runs on
    ≤ bucket-count rows — both bounded by configuration, not SF."""
    import re

    qs = entry.queries()
    for name in GLOBAL_TILED:
        df = qs[name](spark, SF_DIR)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "ntile(" not in formatted, f"{name}: global ntile survived"
        for first_arg in re.findall(
            r"row_number\(\) windowspecdefinition\(([^,]+),", formatted
        ):
            assert " ASC" not in first_arg and " DESC" not in first_arg, (
                f"{name}: row_number window is unpartitioned "
                f"(first spec arg {first_arg!r})"
            )
