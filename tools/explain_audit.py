"""Physical-plan audit: for key queries, assert the plan properties that
matter at 100 TB — filters pushed to the parquet scan, pruned read schemas,
broadcast joins for small dimensions, TakeOrderedAndProject for top-k (no full
sort), no unintended CartesianProduct.

Usage: python tools/explain_audit.py [sf_dir]
Exit 1 if any expectation fails; prints one line per check.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

CHECKS = {
    # query -> list of (must_contain, description) / ("!", must_not_contain, desc)
    "q01_pricing_summary": [
        ("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate", "shipdate filter pushed to scan"),
        ("partial_sum", "map-side partial aggregation"),
    ],
    "q02_filter_pushdown": [
        ("PushedFilters: [IsNotNull(l_quantity)", "quantity filter pushed"),
        # len() counts lit(1), so even l_orderkey is pruned from the scan
        ("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_returnflag:string>", "column pruning (3 of 11 cols read)"),
    ],
    "q03_top_orders": [
        ("TakeOrderedAndProject", "top-10 avoids full sort"),
        ("BroadcastHashJoin", "small build side broadcast"),
    ],
    "q05_region_revenue": [
        ("BroadcastHashJoin", "nation/region broadcast"),
        ("!", "CartesianProduct", "no cartesian product"),
    ],
    "q04_priority_semi": [
        ("LeftSemi", "semi join strategy"),
    ],
    "q08_anti_no_orders": [
        ("LeftAnti", "anti join strategy"),
    ],
    "q11_topk_price": [
        ("TakeOrderedAndProject", "limit+sort fused"),
    ],
    "q16_running_total": [
        ("RowFrame, unboundedpreceding$(), currentrow$()", "cumulative row frame (no full-partition buffering)"),
    ],
    "q21_asof_orders_events": [
        ("!", "CartesianProduct", "asof join is not a range cross join"),
        ("Window", "asof via window"),
    ],
    "q29_dedup_exact": [
        ("partial_min", "map-side combine on dedup groupBy"),
    ],
    "q32_embedding_pairs": [
        ("!", "CartesianProduct", "near-dup pairs never cross-join"),
    ],
    "q38_lsh_topk": [
        ("!", "CartesianProduct", "bucketed ANN candidates via equi-join"),
        ("!", "BroadcastNestedLoopJoin", "no nested-loop fallback"),
    ],
    "q52_ivf_topk": [
        ("!", "CartesianProduct", "centroid NL joins broadcast, never cartesian"),
        ("BroadcastHashJoin", "probed-list scoring is a hash equi-join"),
        ("partial_max_by", "list assignment has map-side combine"),
    ],
    "q53_dedup_fuzzy": [
        ("!", "CartesianProduct", "pair generation stays bucketed end-to-end"),
        ("LeftSemi", "canonical-doc filter is a semi join"),
    ],
    "q55_repetition": [
        ("partial_count", "n-gram counts combine map-side"),
        ("!", "CartesianProduct", "top-gram join is keyed"),
    ],
    "q56_tfidf": [
        ("BroadcastHashJoin", "df/N tables broadcast onto postings"),
        ("partial_count", "term counts combine map-side"),
    ],
    "q57_bm25": [
        ("BroadcastHashJoin", "df/avgdl broadcast onto postings"),
        ("TakeOrderedAndProject", "top-k docs without full sort"),
    ],
    "q59_range_join": [
        ("!", "CartesianProduct", "interval join runs on the equi key"),
        ("!", "BroadcastNestedLoopJoin", "range predicate is residual, not the join"),
        ("__bkt__", "time-bucket participates in the join key (skew guard)"),
    ],
    "q76_value_counts": [
        ("partial_count", "value counts combine map-side"),
    ],
    "q81_ewm_var_std": [
        ("count==1", "MapInPandas", "var+std computed in ONE partition-level Arrow pass, not one per aggregate"),
        ("!", "FlatMapGroupsInPandas", "no per-group Arrow round trips (r4: partition-level mapInPandas)"),
    ],
    "q88_join_where": [
        ("!", "CartesianProduct", "inequality join runs on the equi key"),
        ("!", "BroadcastNestedLoopJoin", "inequalities are residual filters, not the join"),
    ],
    "q90_group_head_tail": [
        ("WindowGroupLimit", "per-group limit prunes map-side"),
        (", Partial", "prune happens before the exchange"),
    ],
    "q91_dup_spans": [
        ("LeftSemi", "hot-gram marking is a semi join (no fan-out on hot grams)"),
        ("!", "CartesianProduct", "span pipeline never cross-joins"),
    ],
    "q93_blocklist": [
        ("!", "Exchange hashpartitioning", "blocklist scoring is map-only, zero shuffles"),
        ("!", "CartesianProduct", "phrase list is a plan literal, not a join"),
    ],
    "q96_horizontal": [
        ("!", "Exchange hashpartitioning", "horizontal folds are map-only, zero shuffles"),
        ("!", "BatchEvalPython", "pure Column math, no Python UDF"),
        ("!", "ArrowEvalPython", "pure Column math, no pandas UDF"),
    ],
    "q97_semdedup": [
        ("!", "CartesianProduct", "pair check scoped to cluster equi-join"),
        ("!", "BroadcastNestedLoopJoin", "no nested-loop fallback"),
    ],
    "q98_upsample": [
        ("Generate explode(sequence", "grid generated map-side per group"),
        ("!", "CartesianProduct", "grid rejoin is an equi-join"),
    ],
    "q99_rolling_frame": [
        ("RangeFrame", "rolling agg is a range-frame window, not a self-join"),
        ("!", "SortMergeJoin", "no join in the plan at all"),
        ("!", "CartesianProduct", "no pair explosion"),
    ],
    "q100_to_dummies": [
        ("!", "Exchange hashpartitioning", "indicators are map-only, zero shuffles"),
        ("!", "BatchEvalPython", "CASE WHEN indicators, no UDF"),
    ],
    "q109_math_extras": [
        ("!", "Exchange hashpartitioning", "math extras are map-only, zero shuffles"),
        ("!", "BatchEvalPython", "all JVM built-ins, no UDF"),
    ],
    "q111_linear_quality": [
        ("!", "Exchange hashpartitioning", "classifier scoring is map-only, zero shuffles"),
        ("!", "ArrowEvalPython", "weights are plan literals, no pandas UDF"),
        ("!", "BatchEvalPython", "no row-at-a-time UDF"),
    ],
    "q112_token_budget_cap": [
        ("RowFrame, unboundedpreceding$(), currentrow$()", "budget trim is one cumsum frame"),
        ("!", "CartesianProduct", "no join at all"),
    ],
    "q113_json_path": [
        ("!", "Exchange hashpartitioning", "json extraction is map-only"),
    ],
    "q115_update_overlay": [
        ("!", "CartesianProduct", "overlay is an equi-join"),
        ("BroadcastHashJoin", "small update side broadcasts"),
    ],
    "q84_map_groups": [
        ("FlatMapGroupsInPandas", "map_groups via Arrow-batched applyInPandas"),
        ("!", "CartesianProduct", "grouped transform shuffles on keys only"),
    ],
    "q60_salted_join": [
        ("!", "CartesianProduct", "salted join stays an equi-join"),
        ("partial_sum", "post-join agg combines map-side"),
    ],
    "q61_approx_distinct": [
        ("partial_approx_count_distinct", "HLL sketch merges map-side"),
    ],
    "q62_sq8_recall": [
        ("!", "CartesianProduct", "stats row broadcast, scoring keyed"),
        ("BroadcastHashJoin", "approx-vs-exact recall join broadcasts the topk side"),
    ],
    "q65_chunking": [
        ("!", "Exchange hashpartitioning", "chunk explode is map-only, zero shuffles"),
    ],
    "q66_seq_packing": [
        ("Exchange hashpartitioning(bucket", "packing shuffles once, keyed by bucket"),
        ("RowFrame, unboundedpreceding$(), currentrow$()", "cumulative frame, no full-partition buffer"),
    ],
    "q67_decontam": [
        ("BroadcastHashJoin", "benchmark gram set broadcast onto corpus grams"),
        ("!", "CartesianProduct", "overlap join is keyed, never cartesian"),
        ("partial_first", "per-doc counts combine map-side"),
    ],
    "q68_source_cap": [
        ("!", "CartesianProduct", "cap is windowed, no join at all"),
        ("Exchange hashpartitioning(source", "one shuffle keyed by the cap key"),
        (", Partial", "WindowGroupLimit prunes to <=n rows/key map-side, before the exchange"),
        ("WindowGroupLimit", "rank-limit pushdown active (hot keys cannot flood a reducer)"),
    ],
    "q69_stratified_sample": [
        ("!", "Exchange", "stratified hash sample is map-only, zero shuffles"),
        ("PushedFilters", "scan-level pushdown retained under the hash filter"),
    ],
    "q70_oov_rate": [
        ("TakeOrderedAndProject", "vocabulary top-k without full sort"),
        ("BroadcastHashJoin", "vocabulary broadcast onto word stream"),
        ("partial_count", "word counts combine map-side"),
    ],
    "q71_mixture_sample": [
        ("BroadcastHashJoin", "per-source fraction plan broadcast onto corpus"),
        ("!", "CartesianProduct", "mixture plan attaches by key, never cartesian"),
        ("partial_sum", "per-source mass totals combine map-side"),
    ],
    "q72_unigram_logprob": [
        ("TakeOrderedAndProject", "vocabulary top-k without full sort"),
        ("BroadcastHashJoin", "unigram model broadcast onto word stream"),
        ("partial_count", "word counts combine map-side"),
    ],
    "q73_line_dedup": [
        (", Partial", "keep-first WindowGroupLimit prunes repeat lines map-side"),
        ("WindowGroupLimit", "hot boilerplate lines cannot flood a reducer"),
        ("!", "CartesianProduct", "reassembly joins by doc key"),
    ],
    "q74_merge_upsert": [
        ("FullOuter", "merge is one full-outer join on the keys"),
        ("!", "CartesianProduct", "never cartesian"),
        ("partial_sum", "audit aggregate combines map-side"),
    ],
    "q116_rank_methods": [
        ("count==1", "Window", "all four rank methods share ONE WindowExec (r4: RANGE-frame tie count, no second exchange)"),
        ("count==1", "Exchange", "one shuffle for the whole rank family"),
    ],
    "q134_merge_sorted": [
        ("rangepartitioning", "merge is a range-partitioned sort, not a single-node zip"),
        ("!", "CartesianProduct", "no join at all"),
    ],
    "q135_dot_gather_every": [
        ("partial_sum", "dot product combines map-side"),
        ("!", "windowspecdefinition()", "dense index needs no empty-partition global window"),
    ],
    "q136_topk_by": [
        ("partial_collect_list", "k-by structs combine map-side"),
    ],
    "q141_url_curation": [
        ("!", "Exchange", "URL canonicalization is map-only, zero shuffles"),
        ("!", "BatchEvalPython", "no row-at-a-time Python"),
    ],
    "q142_business_days_nulljoin": [
        # Catalyst rewrites <=> keys to (coalesce(k,0), isnull(k)) equi keys —
        # the join stays hash/sort-merge-able, never nested-loop
        ("isnull(bucket", "null-safe keys rewritten to equi keys"),
        ("!", "BroadcastNestedLoopJoin", "nulls_equal never degrades the join"),
        ("!", "CartesianProduct", "nulls_equal never degrades the join"),
    ],
    "q143_rolling_moments": [
        ("count==1", "Window", "skew+kurtosis share one WindowExec"),
    ],
    "q145_unique_none_tostruct": [
        ("!", "CartesianProduct", "keep='none' is one count window, no self-join"),
    ],
    "q146_bigram_lm": [
        ("BroadcastHashJoin", "bigram/unigram models broadcast onto the bigram stream"),
        ("partial_count", "model counts combine map-side"),
        ("!", "CartesianProduct", "only the 1-row N total broadcasts"),
    ],
    "q147_mask_tokens": [
        ("!", "Exchange", "masked-LM prep is map-only, zero shuffles"),
        ("!", "BatchEvalPython", "hash draws are JVM codegen, no Python"),
        ("!", "ArrowEvalPython", "no Arrow UDF either"),
    ],
    "q150_chat_flatten": [
        ("!", "Exchange", "chat flattening is map-only, zero shuffles"),
        ("!", "BatchEvalPython", "from_json + HOFs, no Python"),
    ],
    "q154_simhash_pairs": [
        ("!", "CartesianProduct", "banded Hamming candidates via equi-join"),
        ("!", "BroadcastNestedLoopJoin", "no nested-loop fallback"),
    ],
    "q155_preference_pairs": [
        ("partial_max", "chosen/rejected struct aggregates combine map-side"),
        ("!", "Window", "best-worst pair needs no window/sort"),
        ("!", "CartesianProduct", "no cartesian"),
    ],
    "q156_epoch_oversample": [
        ("!", "Exchange", "oversampling is map-only, zero shuffles"),
        ("!", "BatchEvalPython", "hash draw + sequence are JVM codegen"),
    ],
    "q157_negative_sampling": [
        ("!", "CartesianProduct", "negatives via bucket equi-join, not all-pairs"),
        ("partial_min", "min-md5 pick combines map-side"),
    ],
    "q158_length_batches": [
        ("!", "CartesianProduct", "no cartesian"),
        ("Window", "one (bucket, shard)-keyed window"),
    ],
    "q160_sort_by_agg": [
        ("partial_min_by", "sort_by().first() is a map-side-combining min_by"),
        ("!", "Window", "order-sensitive aggregates need no window"),
    ],
    "q161_vocab_encode": [
        ("BroadcastHashJoin", "vocab joins by broadcast"),
        ("TakeOrderedAndProject", "top-V vocab avoids full sort"),
    ],
    "q163_zorder_key": [
        ("!", "Exchange", "explicit-range zorder key is map-only"),
        ("!", "BatchEvalPython", "bit interleave is JVM codegen"),
    ],
    "q164_dedup_against": [
        ("!", "CartesianProduct", "new x ref candidates via gram equi-join"),
    ],
    "q165_ols_by_key": [
        ("partial_", "power sums combine map-side"),
        ("!", "Window", "closed-form fit needs no window"),
    ],
    "q171_fuzzy_join": [
        ("!", "CartesianProduct", "blocked linkage never all-pairs"),
        ("!", "BroadcastNestedLoopJoin", "no nested-loop fallback"),
    ],
    "q172_scd2": [
        ("!", "CartesianProduct", "no cartesian"),
        ("!", "Window", "SCD2 fold is join+explode, no window"),
    ],
    # r5: the exact rank statistics shard their global ordering over
    # deterministic range buckets (operators/distsort.py) — the ONLY
    # single-partition exchange left is the 1-row final aggregate
    "q192_mann_whitney": [
        ("count==1", "Exchange SinglePartition", "only the 1-row final aggregate is single-partition"),
        ("windowspecdefinition(__gb__", "rank cumulants ride a bucket-keyed window, never a global one"),
    ],
    "q194_roc_auc": [
        ("count==1", "Exchange SinglePartition", "only the 1-row final aggregate is single-partition"),
        ("windowspecdefinition(__gb__", "rank cumulants ride a bucket-keyed window, never a global one"),
    ],
    "q201_avg_precision": [
        ("count==1", "Exchange SinglePartition", "only the 1-row final aggregate is single-partition"),
        ("windowspecdefinition(__gb__", "global k/cum-positives ride a bucket-keyed window"),
    ],
    "q184_rank_normalize": [
        ("!", "Exchange SinglePartition", "per-key quantile normalization never funnels to one task"),
    ],
    # r6: retrieval eval shards on the query key; profiling/encoding stay
    # map-only or Arrow-batched
    "q202_mrr": [
        ("!", "Exchange SinglePartition", "MRR ordering shards on the query key"),
    ],
    "q203_recall_at_k": [
        ("!", "Exchange SinglePartition", "recall@k ordering shards on the query key"),
    ],
    "q206_word_entropy": [
        ("!", "Exchange", "zero-shuffle entropy: sorted-run-length Column math, no explode/groupBy"),
    ],
    "q207_histogram": [
        ("partial_count", "map-side combining bucket counts"),
        ("!", "Exchange SinglePartition", "bin counts never funnel to one task"),
    ],
    "q210_bpe_encode": [
        ("ArrowEvalPython", "encode is Arrow-batched pandas_udf"),
        ("!", "BatchEvalPython", "no row-at-a-time Python"),
        # r7: the corpus-derived vocab must never carry a FORCED broadcast
        # hint (AQE may still choose broadcast when the measured size fits)
        ("analyzed!", "ResolvedHint", "no forced broadcast of the unbounded distinct-word frame"),
    ],
    "q215_psi_drift": [
        ("partial_count", "bin counts combine map-side"),
    ],
    "q216_class_loss": [
        ("partial_avg", "log-loss/Brier reduce map-side (one fused aggregate)"),
    ],
    "q218_k_anonymity": [
        ("partial_count", "quasi-identifier class sizes combine map-side"),
    ],
    "q219_readability": [
        ("!", "Exchange", "zero-shuffle readability: pure Column math per document"),
        ("!", "EvalPython", "no Python in the scoring path"),
    ],
    "q220_ks_test": [
        ("count==1", "Exchange SinglePartition", "only the 1-row final max is single-partition"),
        ("windowspecdefinition(__gb__", "ECDF cumulants ride a bucket-keyed window, never a global one"),
    ],
    "q221_gini": [
        ("count==1", "Exchange SinglePartition", "only the 1-row final aggregate is single-partition"),
        ("windowspecdefinition(__gb__", "rank-run cumulants ride a bucket-keyed window, never a global one"),
    ],
    "q222_benford": [
        ("partial_count", "digit counts combine map-side"),
    ],
    "q224_scaled": [
        ("partial_avg", "scaling stats reduce map-side in one fused aggregate"),
        ("!", "Exchange SinglePartition", "per-key scaling never funnels to one task"),
    ],
    "q225_l_diversity": [
        ("partial_count", "distinct-sensitive pre-group combines map-side"),
    ],
    "q226_rrf_fusion": [
        ("partial_sum", "RRF contributions combine map-side"),
        ("!", "Exchange SinglePartition", "fusion windows shard on the query key"),
    ],
    "q227_prop_ztest": [
        ("partial_count", "arm counts reduce map-side in one fused aggregate"),
    ],
    "q228_survival": [
        ("windowspecdefinition(__gb__", "KM running sums ride bucket-keyed windows, never a global one"),
    ],
    "q229_twa": [
        ("!", "Exchange SinglePartition", "per-user lag/agg shards on the user key"),
    ],
    "q231_pmi": [
        ("partial_count", "bigram/unigram counts combine map-side"),
        ("!", "CartesianProduct", "token-total broadcast, no cartesian"),
    ],
    "q232_target_encode": [
        ("partial_sum", "category sums combine map-side"),
        ("BroadcastNestedLoopJoin BuildRight", "1-row prior rides in as a bounded broadcast"),
    ],
    "q233_feature_hash": [
        ("!", "Exchange", "hashing trick is pure map-side array math — zero shuffles"),
        ("!", "EvalPython", "no Python in the featurizer path"),
    ],
    "q234_validate": [
        ("partial_count(distinct", "uniqueness distinct-count fuses into the same aggregate chain, combining map-side"),
    ],
    "q235_ivfpq": [
        ("BroadcastHashJoin [centroid_id", "probe tables reach inverted lists via ONE broadcast equi-join on centroid_id"),
    ],
    "q236_embedding_drift": [
        ("partial_avg", "per-position centroid averages combine map-side (one fused all-reduce per side)"),
    ],
    "q237_markov": [
        ("partial_count", "transition pair counts combine map-side"),
        ("!", "Exchange SinglePartition, ENSURE", "lag window shards on the user key"),
    ],
    "q238_conformal": [
        ("TakeOrderedAndProject", "k-th order statistic via per-partition heaps, no global sort"),
    ],
    "q239_sessionize": [
        ("!", "Exchange SinglePartition, ENSURE", "session windows shard on the user key"),
        ("partial_count", "session summary combines map-side"),
    ],
    "q240_basket_rules": [
        ("BroadcastHashJoin", "frequent-item prune and count attachments are broadcast equi-joins"),
        ("partial_count", "pair counts combine map-side"),
    ],
    "q241_cuped": [
        ("partial_avg", "per-group moment sums combine map-side (no second pass for adjusted stats)"),
    ],
    "q242_triangles": [
        ("partial_count", "degree and per-node credit counts combine map-side"),
        ("!", "Exchange SinglePartition, ENSURE", "wedge and closing joins are key-sharded"),
    ],
    "q243_rouge1": [
        ("!", "Exchange", "zero-shuffle ROUGE: merged-run-length fold per row, no explode/groupBy"),
        ("!", "EvalPython", "no Python in the scoring path"),
    ],
    "q244_edit_distance": [
        ("!", "EvalPython", "JVM levenshtein, no Python"),
        ("!", "Exchange SinglePartition, ENSURE", "id-shifted join stays key-sharded"),
    ],
    "q245_srm": [
        ("partial_count", "assignment counts combine map-side"),
    ],
    "q247_attribution": [
        ("!", "Exchange SinglePartition, ENSURE", "all windows shard on the user key"),
        ("partial_sum", "channel credit sums combine map-side"),
    ],
    "q248_rake": [
        ("partial_count", "word stats combine map-side"),
        ("!", "EvalPython", "boundary splitting is pure regex Column math"),
    ],
    "q249_profile": [
        ("partial_count", "(column, value) counts and rollups combine map-side"),
        ("!", "Exchange SinglePartition, ENSURE", "no column pools raw rows in one task"),
    ],
    "q250_weighted_quantile": [
        ("partial_sum", "distinct-value weight collapse combines map-side"),
        ("!", "Exchange SinglePartition, ENSURE", "distsort buckets replace the global window"),
    ],
    "q251_label_propagation": [
        ("partial_count", "neighbor-label counts combine map-side"),
        ("!", "CartesianProduct", "rounds are equi-joins"),
    ],
    "q252_holt": [
        ("!", "EvalPython", "the fold is whole-row Column math, no Python"),
        ("!", "Exchange SinglePartition, ENSURE", "series collect shards on the user key"),
    ],
    "q253_grouping_sets": [
        ("Expand", "one Expand + one aggregate — the cube/rollup plan shape"),
        ("partial_sum", "set aggregates combine map-side"),
    ],
    "q254_rfm": [
        ("partial_count", "per-user aggregate combines map-side"),
    ],
    "q255_woe_iv": [
        ("partial_count", "category cells combine map-side"),
    ],
    "q256_abc": [
        ("partial_sum", "key revenue collapse combines map-side"),
        ("!", "Exchange SinglePartition, ENSURE", "ranked cumulative rides distsort buckets"),
    ],
    "q257_pareto_front": [
        ("partial_max", "distinct-x max-y collapse combines map-side"),
        ("!", "Exchange SinglePartition, ENSURE", "prefix-max sweep rides distsort buckets"),
    ],
    "q258_frame_diff": [
        ("SortMergeJoin", "version diff is one keyed full-outer join"),
        ("partial_sum", "status counts combine map-side"),
    ],
    "q259_multilabel": [
        ("!", "EvalPython", "set math is pure Column ops"),
        ("partial_count", "the all-reduce combines map-side (the 1-row final exchange is post-combine)"),
    ],
    "q260_did": [
        ("partial_count", "cell statistics are ONE fused all-reduce"),
        ("!", "SortMergeJoin", "no pivot/join — conditional aggregates only"),
    ],
    "q261_bh_adjust": [
        ("!", "Exchange SinglePartition, ENSURE", "suffix-min rides distsort buckets"),
    ],
    "q262_funnel_timing": [
        ("partial_min", "the conditional-min chain combines map-side"),
        ("!", "CartesianProduct", "the per-user walk is one grouped collect, no self-join"),
    ],
    "q263_mmr_rerank": [
        ("partial_min", "per-query argmax combines map-side"),
        ("LeftAnti", "remaining candidates via anti-join, never recomputed lists"),
    ],
    "q264_cohort_value": [
        ("partial_min", "first-seen cohort combines map-side"),
        ("!", "Exchange SinglePartition, ENSURE", "the cumulative window shards on the cohort"),
    ],
    "q265_ratio_ttest": [
        ("partial_count", "group moments are ONE fused all-reduce"),
        ("!", "SortMergeJoin", "no pivot/join — conditional aggregates only"),
    ],
    "q266_concentration": [
        ("TakeOrderedAndProject", "head shares via per-partition heaps, no global sort"),
        ("partial_sum", "key totals combine map-side"),
    ],
    "q267_stream_upsert": [
        ("!", "Exchange", "the converged snapshot reads back map-only (winners were reduced inside the streaming batches)"),
    ],
    "q268_forecast_accuracy": [
        ("partial_count", "error metrics are ONE fused per-key aggregate"),
        ("!", "Exchange SinglePartition, ENSURE", "the naive-lag window shards on the user key"),
    ],
    "q269_fk_integrity": [
        ("LeftAnti", "orphans/unused via anti-joins on distinct keys"),
    ],
    "q270_theil_sen": [
        ("!", "EvalPython", "pairwise slopes are whole-row Column lambda math"),
        ("!", "Exchange SinglePartition, ENSURE", "series collect shards on the user key"),
    ],
    "q271_pop_report": [
        ("partial_sum", "period totals combine map-side (the lag window sees one row per bucket)"),
    ],
    "q272_freq_sequences": [
        ("partial_count", "trigram counts combine map-side"),
        ("!", "Exchange SinglePartition, ENSURE", "the lag chain shards on the user key"),
    ],
    "q273_ipf_raking": [
        ("BroadcastHashJoin", "marginal scalings attach by broadcast over the bounded cell table (pre-checkpoint stages hold the map-side cell collapse)"),
    ],
    "q274_kendall_tau": [
        ("partial_count", "the joint contingency collapse combines map-side"),
    ],
    "q275_cramers_v": [
        ("partial_count", "contingency cells combine map-side"),
    ],
    "q276_odds_ratio": [
        ("partial_sum", "the 2x2 table is ONE fused all-reduce"),
        ("!", "SortMergeJoin", "no pivot/join — conditional counts only"),
    ],
    "q277_mcnemar": [
        ("partial_max", "per-user early/late flags combine map-side"),
    ],
    "q278_cohens_d": [
        ("partial_count", "group moments are ONE fused all-reduce"),
        ("!", "SortMergeJoin", "no pivot/join — conditional aggregates only"),
    ],
    "q279_brier_decomposition": [
        ("partial_count", "binned statistics combine map-side; no self-join"),
        ("!", "SortMergeJoin", "overall rate recovered algebraically, not joined"),
    ],
    "q280_lorenz": [
        ("partial_sum", "distinct-level (count, sum) collapse combines map-side"),
        ("!", "Exchange SinglePartition, ENSURE", "cumulatives ride distsort buckets"),
    ],
    "q246_mahalanobis": [
        ("!", "Exchange", "serving is pure map-side quadratic-form Column math"),
        ("!", "EvalPython", "no Python in the serving path"),
    ],
    # r7: deterministic sketches, survival test, power-law fit, forecast fold
    "q281_kmv_distinct": [
        ("MapInPandas", "per-batch k-min is Arrow-batched mapInPandas"),
        ("!", "BatchEvalPython", "no row-at-a-time Python"),
        ("TakeOrderedAndProject", "global bottom-k merges via TakeOrdered, never a full sort"),
    ],
    "q282_kmv_grouped": [
        ("partial_collect_set", "per-key hash sets combine map-side"),
        ("!", "EvalPython", "keyed path is pure Column math"),
    ],
    "q283_cms_freq": [
        ("partial_count", "sketch cell counts combine map-side"),
        ("!", "CartesianProduct", "probe meets sketch via (row, bucket) equi-join"),
    ],
    "q284_mad_outliers": [
        ("!", "Window", "medians are aggregates - no window at all"),
        ("!", "EvalPython", "pure Column math"),
    ],
    "q285_log_rank": [
        ("windowspecdefinition(__gb__", "at-risk cumulants ride a bucket-keyed window, never a global one"),
    ],
    "q286_zipf_fit": [
        ("windowspecdefinition(__gb__", "vocabulary ranks ride a bucket-keyed window"),
        ("partial_count", "term counts combine map-side"),
    ],
    "q288_holt_forecast": [
        ("!", "EvalPython", "smoothing fold is a codegen array expression, no Python"),
        ("partial_collect_list", "series gather combines map-side"),
    ],
    "q289_bradley_terry": [
        ("!", "CartesianProduct", "MM rounds are item-keyed equi-joins"),
    ],
    "q290_anova": [
        ("partial_count", "per-group moments combine map-side"),
        ("!", "Window", "no window anywhere - one aggregate + one bounded reduce"),
    ],
    "q291_info_gain": [
        ("partial_count", "(feature, value, label) counts combine map-side"),
        ("!", "CartesianProduct", "rollups meet on the feature key"),
    ],
    "q292_degree_report": [
        ("!", "CartesianProduct", "degree attach is node-keyed"),
        ("partial_count", "degree counts combine map-side"),
    ],
    "q293_msprt": [
        ("windowspecdefinition(__gb__", "running S_k rides a bucket-keyed window, never a global one"),
    ],
    "q295_rollup_merge": [
        ("partial_sum", "state combine is map-side (associative partials)"),
        ("!", "Window", "incremental rollup is pure aggregation"),
    ],
    "q296_dp_counts": [
        ("partial_count", "counts combine map-side; noise is map-only Column math"),
        ("!", "EvalPython", "no Python in the mechanism"),
    ],
    "q297_collapse_rare": [
        ("!", "CartesianProduct", "survivor rejoin is a broadcast equi-join"),
        ("BroadcastHashJoin", "bounded survivor set broadcasts"),
    ],
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from polars_net_spark import get_spark

    spark = get_spark()
    qs = e.queries()
    failures = 0
    for name, checks in CHECKS.items():
        # a query that fails to BUILD is itself an audit failure — keep sweeping
        try:
            df = qs[name](spark, sf_dir)
            # materialize once so AQE finalizes the real plan (broadcast decisions)
            df.count()
            plan = df._jdf.queryExecution().executedPlan().toString()
            formatted = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"FAIL {name}: query build/execute error: {type(exc).__name__}: {str(exc).splitlines()[0][:160]}")
            continue
        text = plan + "\n" + formatted
        for chk in checks:
            if chk[0] == "analyzed!":
                analyzed = df._jdf.queryExecution().analyzed().toString()
                ok = chk[1] not in analyzed
                desc = chk[2]
                tag = f"analyzed-absent:{chk[1]}"
            elif chk[0] == "!":
                ok = chk[1] not in text
                desc = chk[2]
                tag = f"absent:{chk[1]}"
            elif chk[0].startswith("count=="):
                # count only in the executed plan (the formatted dump repeats nodes)
                ok = plan.count(chk[1]) == int(chk[0][7:])
                desc = chk[2]
                tag = f"{chk[0]}:{chk[1]}"
            else:
                ok = chk[0] in text
                desc = chk[1]
                tag = f"present:{chk[0][:40]}"
            status = "ok  " if ok else "FAIL"
            if not ok:
                failures += 1
            print(f"{status} {name}: {desc} ({tag})")
    # --- blanket sweep: NO query in the whole gate may plan a cartesian or
    # nested-loop join unless it is the documented exception (plan build
    # only, nothing executed) -------------------------------------------------
    # every entry is a BOUNDED broadcast build side, never data-by-data:
    ALLOW_NL = {
        "q09_cross_region_nation",  # intentionally a cross join
        "q52_ivf_topk",             # query x centroid scoring (<= nlist rows broadcast)
        "q56_tfidf",                # 1-row corpus-N attach
        "q57_bm25",                 # 1-row N/avgdl stats attach
        "q62_sq8_recall",           # 1-row quantization-stats attach + bounded query set
        "q72_unigram_logprob",      # 1-row corpus-total N attach
        "q75_cut_qcut",             # 1-row quantile-boundary attach
        "q123_term_df",             # 1-row corpus-doc-count attach
        "q146_bigram_lm",           # 1-row corpus-total N attach (backoff floor)
        "q124_winsorize",           # 1-row quantile-boundary attach
        "q231_pmi",                 # 1-row token-total attach
        "q232_target_encode",       # 1-row global-prior attach
        "q235_ivfpq",               # 1-row centroid/codebook rows + bounded probe broadcast
        "q236_embedding_drift",     # two 1-row fused aggregates meet in a bounded broadcast
        "q238_conformal",           # 1-row q-hat broadcast onto the coverage reduce
        "q240_basket_rules",        # 1-row basket-count N attach (support denominators)
        "q241_cuped",               # 1-row pooled-theta broadcast onto group stats
        "q245_srm",                 # 1-row observed-total N attach onto the expected grid
        "q254_rfm",                 # 1-row as-of anchor + 1-row quantile-edge attach
        "q255_woe_iv",              # 1-row event/nonevent totals attach
        "q263_mmr_rerank",          # gate input: 3 query rows broadcast onto candidates
        "q266_concentration",       # 1-row grand-total + 1-row head-share attach
        "q269_fk_integrity",        # four 1-row audit scalars meet in bounded broadcasts
        "q274_kendall_tau",         # |cells|^2 x-order self-join, bounded by joint cardinality (chi2-margins contract)
        "q330_c_index",             # |cells|^2 t-order self-join, bounded by (t,d,s) joint cardinality (kendall contract)
        "q275_cramers_v",           # chi2 margins grid + 1-row cardinality attach (q191 class)
        "q289_bradley_terry",       # 1-row score-total attach for normalization
        "q291_info_gain",           # 1-row label-entropy attach
        "q292_degree_report",       # two 1-row reduces meet in a bounded broadcast
        "q297_collapse_rare",       # 1-row level-total attach for the share rule
        "q166_key_skew",            # 1-row corpus-total attach onto top-k keys
        "q185_tfidf_pairs",         # 1-row doc-count N attach (idf smoothing)
        "q191_chi2",                # margins cross join (r x c category grid) + 1-row n
        "q204_cohens_kappa",        # 1-row totals + 1-row chance-agreement attach
        "q205_corpus_divergence",   # 1-row token-total/vocab attach onto term table
        "q211_pq_adc",              # 1-row broadcast codebook attach (corpus + queries)
        "q215_psi_drift",           # 1-row ref-min/max + 1-row total attaches
        "q217_fleiss_kappa",        # 1-row rating-total + 1-row chance-agreement attach
        "q222_benford",             # 1-row digit-total attach onto the 9-digit grid
        "q230_lift",                # 1-row quantile-edge + totals attach (qcut class)
    }
    from polars_net_spark import release_caches

    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"FAIL sweep {name}: plan build error: {type(exc).__name__}: {str(exc).splitlines()[0][:160]}")
            continue
        finally:
            release_caches()
        bad = []
        if "CartesianProduct" in plan and name not in ALLOW_NL:
            bad.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in ALLOW_NL:
            bad.append("BroadcastNestedLoopJoin")
        if bad:
            failures += 1
            print(f"FAIL sweep {name}: {'+'.join(bad)} in plan")
    print(f"ok   sweep: {len(qs) - len(ALLOW_NL)} gate queries plan no cartesian/nested-loop join ({', '.join(sorted(ALLOW_NL))} exempt by design)")

    # --- partition-pruning proof (VERDICT r1 item 9): hive-partitioned write
    # + partition-key filter must prune at the file-listing level -------------
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    tmp = tempfile.mkdtemp(prefix="pns_hive_audit_")
    try:
        spark.range(400).select(
            F.col("id"),
            F.concat(F.lit("p"), (F.col("id") % 4).cast("string")).alias("part"),
        ).write.mode("overwrite").partitionBy("part").parquet(tmp)
        pruned = spark.read.parquet(tmp).filter(F.col("part") == "p1")
        pruned.count()
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        ok = "PartitionFilters" in plan and "part" in plan
        files = pruned.select(F.input_file_name()).distinct().collect()
        ok = ok and all("part=p1" in r[0] for r in files) and len(files) >= 1
        status = "ok  " if ok else "FAIL"
        if not ok:
            failures += 1
        print(f"{status} hive_fixture: partition-key filter prunes file listing (PartitionFilters + part=p1 only)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
