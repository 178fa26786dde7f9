"""Physical-plan invariants: the scale properties PLANS.md documents,
enforced so a future change cannot silently regress them.

Checks the *static* plan (AQE off, like tools/explain_audit.py) at
sf0.001 — plan shape is data-size-independent for these queries.
"""

import contextlib
import io

import pytest

from demo_cdc_users_airline_spark.catalog import QUERIES

SF = "/root/testdata/sf0.001"

# query -> max allowed Exchange (shuffle) operators in the static plan
MAX_SHUFFLES = {
    # map-only operators: NO shuffle, ever
    "text_token_stats": 0,
    "text_quality_score": 0,
    "text_lang_id": 0,
    "text_rolling_hash": 0,
    "text_fingerprint": 0,
    "dedup_simhash": 0,
    "similarity_lsh_buckets": 0,   # in-row signature fold, broadcast signs
    "dataset_sample_split": 0,
    "lineitem_ship_minute_projection": 0,
    "embedding_quantize_int8": 0,
    "text_repetition_stats": 0,   # in-row sorted-run counting, no explode
    "text_winnowing": 0,          # in-row window-min selection, then explode
    "text_pii_redact": 0,         # regex scans + replace, pure map
    "corpus_sample_by_quality": 0,  # integer keep-rate vs salted hash, map
    "retrieval_bm25_topk": 1,     # the 1-row stats agg; scoring is a map
    # single-shuffle keyed operators
    "cdc_latest_row_per_key": 1,
    "cdc_latest_state_argmax": 1,
    "dedup_exact": 1,
    "dedup_minhash_signatures": 1,
    "dedup_simhash_pairs": 1,     # band exchange; verify joins broadcast
    "events_asof_last_purchase": 1,
    "events_sessionization": 2,   # window + final rollup
    "events_funnel_conversion": 2,  # one user window; stage counts fold into
    # a single global agg (the oracle's formulation would cost 4 joins)
    "corpus_mixture_weights": 3,  # lang groupBy (twice in the static tree:
    # the totals agg re-derives it) + the 2-scalar global agg; everything
    # after the first reduce is n_langs rows
    "dedup_minhash_estimate": 5,  # signature agg + band candidates + est
    # map + exact-verify join + final assembly; signatures/shingles cached
    "dedup_incremental_clusters": 2,  # labels read + broadcast overlay
    # join + ordered output; the build/update lifecycle is memoized
    # artifact work, not in this serving plan
    "retrieval_bm25_compaction_policy": 3,  # footer-only census:
    # groupBy(pfx) w/ countDistinct (two-phase) + ordered output
    "dedup_cluster_merges": 1,    # k-row overlay read + ordered output
    "dedup_cluster_compaction_policy": 1,  # driver-assembled 3-row
    # report (bounded footer censuses), one output sort
    "text_unigram_vocab": 1,      # driver-built piece table, one sort
    "text_unigram_encode": 4,     # distinct-word DP + occurrence
    # join-back on w + per-doc aggregate + doc-universe left join
    "text_unigram_prune": 4,      # capped word TakeOrdered +
    # DP/backtrace map + piece usage agg + seed left join + sort
    "text_unigram_encode_pruned": 4,  # the encode core over the
    # memoized post-prune map — same shape as text_unigram_encode
    "dedup_duplicate_spans": 6,   # gram-hash df agg + df probe join + doc
    # window + run/doc rollups; every shuffle carries ≤ 24-byte rows
    "pricing_summary": 1,
    "orders_rollup_summary": 1,   # ROLLUP = one Expand + hash agg exchange
    "corpus_pack_chunks": 1,      # the shard exchange, then per-shard window
    "corpus_decontaminate": 2,    # shingle groupBy + final doc join
    "corpus_decontaminate_bloom": 3,  # bench-set distinct (benchmark-
    # sized) + doc agg + final doc join; the bloom probe itself is an
    # in-row bit test against a broadcast 8 KB mask — the corpus-sized
    # side pays only its doc_id aggregate
    "corpus_vocabulary": 1,       # token groupBy; top-k is TakeOrdered, not a window
    "similarity_ivfpq_topk": 3,   # probe-pruned codes ⋈ cells, ADC sum, top-k
    "similarity_ivfpq_rerank_topk": 3,  # ADC shortlist window + exact-rerank
    # top-k; the full-vector fetch joins a broadcast shortlist
    "similarity_ivfpq_residual_topk": 3,  # same layout, residual encode/LUT
    "score_unigram_logprob": 5,   # tf + counts + corpus scalar + co-part join + doc reduce
    "score_dsir_importance": 5,   # bucket tf + dist + scalar; ratio joins broadcast
    "similarity_semdedup": 6,     # assign join + census + salted pair join + verdict
    # multi-stage compositions: budget = sum of the composed stages
    "corpus_token_cms_topk": 3,     # fixed 4096-cell sketch agg + exact
    # token groupBy (TakeOrdered top-k) + probe-vs-broadcast-CMS rollup
    "events_value_quantile_sketch": 5,  # histogram agg (types x 1024
    # wire state) + tiny bin-selection window + the exact-rank grading
    # branch (per-type window) + the 1-row range scalar, which appears
    # twice in the static tree (bin map + estimate projection — runtime
    # reuses the exchange); the final join rides the window partitioning
    "events_hll_distinct": 4,       # (type, bucket) register MAX + the
    # 256-row register rollup + the exact-countDistinct grading branch;
    # the sketch side's wire state is <= m rows per group at any scale
    "events_daily_moving_stats": 2,  # daily agg + the per-type RANGE window
    "events_minute_anomalies": 3,   # minute-count agg (appears twice in the
    # static tree: stats re-derive it; cached at runtime) + per-type stats
    "events_value_percentiles": 1,  # both windows + the rollup share the
    # event_type partitioning — rank, count, and groupBy in ONE exchange
    "corpus_ngram_overlap": 3,      # nothing corpus-sized: matched-pair
    # distinct + two benchmark-sized count aggs (broadcast probe upstream)
    "events_retention_cohorts": 5,  # uw distinct + cohort agg + join + matrix
    # agg + sizes; every shuffle after the first carries (user, week) rows
    "retrieval_hybrid_rrf": 2,      # the two bounded-pool rank joins; corpus
    # scans reduce via TakeOrdered, fusion is driver-ranked 50-row frames
    "text_bpe_merges": 0,           # returned artifact is the driver-side
    # merge table; training jobs run at build time (vocab-sized groupBys)
    "text_bpe_encode": 2,           # word explode + doc_id agg (map-side
    # combinable) + the zero-fill doc join; replaces are bound-literal
    # codegen maps, merge learning is the memoized artifact
    "corpus_curation_pipeline": 8,  # +2 vs r2: the CC labels stage now ends
    # with a nodes⟕edges join (edge set isn't safely broadcastable at 100 TB)
    "text_lang_id_ngram": 3,  # r5: serving = doc-keyed conditional-sum agg
    # + final left join; profile learning runs once per session (separate
    # memoized jobs, not in this plan)
    # round-6 late additions
    "corpus_chunk_overlap": 0,      # bind-toks projection + posexplode, map
    "corpus_token_spectrum": 2,     # token groupBy + |vocab|→|counts| agg;
    # grand total folds in as a collected broadcast scalar
    "similarity_hard_negatives": 1,  # anchors broadcast; per-anchor top-k
    "similarity_sq8_adc_topk": 2,  # reconstruct map-only (ranges are
    # driver-collected literals), queries broadcast: per-query top-k
    # window + the final presentation sort
    "similarity_sq4_adc_topk": 2,  # the shared SQ ADC body at 16
    # levels — identical plan shape to the 8-bit tier
    "similarity_sq8_serve_topk": 1,  # persisted IVF×SQ8 serve: bounded
    # probe collect, partition-pruned codes read, in-row reconstruct —
    # ONLY the per-query top-k exchanges (the pq_serve budget)
    "similarity_sq8_rebuild_serve": 1,  # same serve core over the
    # rebuilt artifact
    "similarity_sq8_clip_report": 2,  # (ingest_batch, n_clip) census:
    # one k-row aggregate + the presentation sort
    "similarity_sq8_recall": 3,  # serve top-k window + exact-side
    # top-k window (intrinsic: a recall evaluation owns its
    # ground-truth pass) + the final presentation sort; the hit
    # aggregate rides the exact window's query_id partitioning and
    # both tiny joins broadcast
    # round-13 additions
    "similarity_sq8_residual_topk": 2,  # residual map + reconstruction
    # are broadcast-codebook zips (map-only); probes broadcast with the
    # query vectors embedded; per-query top-k window + presentation sort
    "text_tokenizer_drift_report": 3,  # word-level 2-group census agg +
    # docs-per-split count + the 2-row presentation sort; merges and
    # alphabet bind as literals from the persisted artifact
    "corpus_training_dataset": 21,  # the five composed stages' memoized
    # frames (verdict cache, CC labels, BPE encode, split, rf) reprint
    # their cached subtrees in the static plan (the PLANS.md caveat);
    # the composition itself adds only doc_id equi-joins, one bounded
    # rf broadcast, and the per-(split, shard) packing window
    "corpus_training_manifest": 0,  # the persisted-artifact read: a
    # partition-laid parquet scan + casts — consumers NEVER re-run the
    # composition
    "corpus_pack_manifest": 1,      # one map-side-combinable rollup
    # over the artifact read (grouping keys prefix the partition layout)
    # window is the only exchange (bounded by the anchor set)
    "multimodal_image_phash": 0,    # one Arrow mapInPandas codec pass
    "multimodal_phash_neardup": 1,  # band exchange; verify joins ride the
    # cached 24-byte/row signature frame (broadcast side)
    # round-6 continuation wave
    "dedup_graph_pagerank": 0,      # r7: the sub-bound edge set finishes
    # driver-side (local finish, parity-tested vs the distributed rounds);
    # the shipped plan is a local relation projection. The distributed
    # path checkpoints per round, so even it stays O(1) exchanges/plan.
    "retrieval_tfidf_topk": 1,      # the 1-row stats agg; scoring is a map
    "similarity_matryoshka_recall": 8,  # 4 rank windows + truth join + final
    # agg; all windows share the cached query_id-partitioned pairs frame
    # at runtime (static tree re-prints the exchange per window)
    "corpus_temperature_sample": 3,  # source agg (re-printed by the totals
    # derivation) + the broadcast-rf doc join; the explode is in-row
    "orders_table_profile": 2,      # ONE aggregate pass; the multi-distinct
    # rewrite's Expand adds its partial/final exchange pair
    "multimodal_jpeg_roundtrip": 0,   # Arrow mapInPandas codec passes
    "multimodal_mulaw_roundtrip": 0,  # same — pure map, no shuffle
    "multimodal_avi_frame_sample": 0,  # container walk + per-frame decode
    "corpus_curation_funnel": 8,    # the composed verdict stages (memoized
    # at runtime, shared with pipeline/scorecard) + the 1-row funnel agg.
    # 8 is the deterministic two-pass-fixture print count (r14): the old
    # budget of 6 was calibrated against an interleaved fixture whose
    # count depended on which memoized subtrees earlier entries had
    # already cache-marked; the EXECUTED exchanges are unchanged (the
    # verdict memo runs once per session)
    "corpus_topic_keywords": 6,     # assignment join + (cluster, token)
    # agg + vocab/cluster marginal joins + bounded per-cluster window
    "events_limit3_by_user": 1,     # ONE key shuffle; bounded per-key window
    # round-6 wave 4
    "dedup_graph_triangles": 0,     # r7: local-finish census on the
    # bounded edge set (same parity contract as PageRank); the shipped
    # plan is a 1-row local relation
    "score_bigram_accuracy": 5,     # the cached pair-count frame's groupBy
    # (re-printed by the argmax window derivation) + per-lang agg; token
    # positions join the broadcast argmax table map-side
    "events_reservoir_sample": 1,   # ONE stratum-key shuffle; bounded
    # per-key top-k window (LIMIT n BY key plan)
    "users_customer_reconciliation": 2,  # per-key event pre-agg + the
    # co-partitioned full outer (never broadcastable by definition)
    "text_rake_keywords": 2,        # doc-keyed segmentation window + the
    # (doc, group) phrase agg ride ONE doc exchange; everything after is
    # phrase-table-sized (vocab agg; score join broadcasts; top-k is
    # TakeOrdered)
    # round-7 wave
    "corpus_ngram_novelty": 3,      # hsh-window first-occurrence + per-doc
    # agg + the zero-fill doc join; rides the cached 16-byte shingle frame
    "similarity_ivf_cell_balance": 2,  # k-row cell census + 1-row fold;
    # assignment is the broadcast-codebook zero-shuffle map
    "orders_large_volume_topk": 2,  # the fact groupBy on its own key; the
    # HAVING survivor set broadcasts into both joins, top-k is TakeOrdered
    "events_user_anomaly_days": 3,  # (user, day) agg + per-user median agg
    # + the flag join keyed on user
    "corpus_budget_selection": 3,   # the checkpointed range exchange is
    # materialized at build time; the shipped plan is the per-slice window
    # (+ its sort) over the pinned RDD
    "regional_supplier_revenue": 4,  # lineitem/orders/customer/supplier
    # shuffle on their natural keys + the nation-revenue agg; region-
    # filtered nation broadcasts; the sort is a bounded <=25-row output
    "orders_per_customer_histogram": 3,  # orders pre-agg on custkey + the
    # co-partitioned left join + the tiny count-of-counts agg
    # round-8 wave
    "similarity_index_staleness": 12,  # composes THREE searches (brute
    # ground truth + stale-IVF + fresh-IVF, each with its bounded-query
    # top-k window) plus the hit joins and the 1-row fold — every
    # exchange after the corpus scans carries queries×k (= 24) rows;
    # the corpus-sized work is the two broadcast-codebook assignment
    # maps and the brute candidate scan, all shuffle-free
    "dedup_incremental_lsh": 3,     # increment sig agg + candidate distinct
    # + the best-match window (keyed on new_id); the band probe joins the
    # partition-pruned index slices and the verify joins ride broadcast —
    # corpus text never appears in the probe plan (see test_incremental_lsh)
    "retrieval_bm25_serve": 2,      # the ≤|query|-row df agg over the
    # pruned postings read + the per-doc score agg; prefixes prune as a
    # PARTITION filter, the term set pushes to parquet, both bounded
    # sides broadcast, top-k is TakeOrdered (see test_bm25_serve)
    "similarity_ivf_serve_topk": 1,  # ONLY the bounded per-query top-k
    # window; the probed-cell set partition-prunes the index read, the
    # query frame broadcasts, candidate vectors are inline in the index
    "retrieval_bm25_incremental_serve": 2,  # the shared bm25_serve core
    # over the MAINTAINED index (base build + appended batch partitions)
    # — identical serve plan budget to retrieval_bm25_serve
    "similarity_ivf_incremental_serve": 1,  # the shared ivf_serve core
    # over the MAINTAINED index — identical budget to
    # similarity_ivf_serve_topk (the append happens at memoized build
    # time, not in the serve plan)
    "returned_item_revenue_topk": 1,  # TPC-H Q10: at gate SF every join
    # broadcasts, leaving only the groupBy exchange; both fact filters
    # push to the scans and the top-20 is TakeOrderedAndProject
    "orders_with_returns_by_priority": 2,  # TPC-H Q4 shape: the semi
    # join's exchange pair at gate SF; returnflag + date filters push,
    # the ≤5-row priority agg reduces map-side
    "promo_revenue_share": 1,  # TPC-H Q14: the 1-row global agg's
    # exchange; shipdate pushes to the lineitem scan, the part join is
    # AQE's choice (never a forced broadcast of an SF-scaling side)
    "forecast_revenue_change": 1,  # TPC-H Q6: scan → pushed filters →
    # map-side partials → the single 1-row agg exchange; no join at all
    "similarity_incremental_ivf": 3,  # two k-row cell censuses (increment
    # assignment agg + the artifact's partition-column census) + the
    # k-row ordering sort; assignment is the zero-shuffle broadcast-
    # codebook map and the assembly joins broadcast bounded k-row sides
    # round-9 wave
    "part_min_cost_supplier": 3,  # TPC-H Q2 shape: ONE fact scan — the
    # argmin is a single ordered-struct min on l_partkey (no join-back
    # re-scan) — plus the eligible-supplier exchange pair the static
    # plan keeps for the semi/final joins (AQE broadcasts them at gate
    # SF); part/region/nation filters push to their scans
    "similarity_ivf_rebuild_serve": 1,  # the shared ivf_serve core over
    # the REBUILT artifact — identical budget to similarity_ivf_serve_topk
    # (build + append + rebuild run at memoized artifact time)
    "dedup_lsh_compaction_policy": 3,  # a partition-column census: the
    # pfx groupBy + countDistinct's two-phase expand + the 16^width-row
    # ordering sort; band rows are never read (footer-only projection)
    "top_supplier_by_revenue": 2,  # TPC-H Q15: revenue reduces on the
    # fact's own key (the fact is scanned ONCE — the max is a driver
    # literal off the small aggregate) + the supplier join at static
    "small_quantity_order_revenue": 2,  # TPC-H Q17: the correlated AVG
    # rides ONE l_partkey window exchange + the 1-row final agg; the
    # brand semi join broadcasts at gate SF
    "discounted_brand_revenue": 1,  # TPC-H Q19: both scans prune via
    # the derived disjunction conjuncts; only the 1-row agg exchange
    "important_part_value": 1,  # TPC-H Q11 shape: the survivor plan
    # rides the pinned per-part frame (the fact reduced once at
    # checkpoint time); only the bounded ordering sort remains
    "sole_returner_suppliers": 2,  # TPC-H Q21 shape: the semi and
    # anti self-join legs co-partition on l_orderkey (the probe side's
    # exchange is shared); the supplier join broadcasts at gate SF and
    # the distinct-count agg rides the pair frame
    "similarity_ivf_compaction_policy": 3,  # partition-column census:
    # cell groupBy + countDistinct's two-phase expand + the k-row sort
    "dormant_valuable_customers": 2,  # TPC-H Q22 shape: the recent-
    # orders anti join co-partitions on custkey (threshold is a driver
    # literal); nation broadcasts, the rollup is <=25 rows
    "dominant_part_suppliers": 3,  # TPC-H Q20 shape: the fact reduces
    # once onto (part, supplier) at checkpoint time; the per-part total
    # + compare join + dominant-set distinct ride small keyed exchanges
    "similarity_pq_serve_topk": 1,  # persisted-PQ ADC serve: broadcast
    # LUTs + in-row ADC fold over the partition-pruned code table —
    # the ONLY exchange is the per-query top-k window
    "similarity_pq_rebuild_serve": 1,  # same serve core after the
    # rebuild swap (fits are memoized lifecycle cost, not plan cost)
    "similarity_pq_rerank_serve": 2,  # two-stage artifact serve: the
    # ADC shortlist window + the exact-rerank window — both artifact
    # scans partition-pruned to the probed cells, shortlist broadcast
    "similarity_pq_compaction_policy": 3,  # partition-column census:
    # cell groupBy + countDistinct's two-phase expand + the k-row sort
    "similarity_pq_drift_report": 4,  # pq_err-column census: two
    # cell aggregates (base/increment split) + broadcast k-row
    # assembly + the k-row sort — ReadSchema is struct<pq_err:bigint>
    # (partition columns come from footers; codes/vec pages unread)
    "text_bpe_encode_served": 1,  # artifact-loaded merge chain in
    # whole-stage codegen + ONE map-side-combinable groupBy(doc_id)
    "text_unigram_encode_served": 3,  # distinct-word Viterbi (word
    # distinct + occurrence join-back + doc aggregate — the
    # text_unigram_encode shape, scores in one broadcast map row)
    "dedup_prefix_containment": 4,  # the id-only head-bucket agg (printed
    # once per broadcast consumer in the static tree; the cached pair
    # frame executes it once) + the pair-keyed join of the two bounded
    # text halves — every exchange after the bucket agg carries
    # candidate-pair-sized rows, never the corpus
    "corpus_manifest_incremental": 1,  # pruned artifact read; the one
    # exchange is the gate's deterministic ORDER BY (a consumer reading
    # a single (split, shard) stream pays zero)
    "corpus_manifest_frozen_rf": 1,   # k-row rf artifact read + sort
    "corpus_manifest_rebuild_diff": 4,  # artifact read vs the memoized
    # rebuild frame: one (doc_id, copy) join (2 exchanges) + the k-row
    # census agg + final sort — both join sides are narrow int64
    # projections
}


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def static_plans(spark):
    # Materialized caches left by earlier test modules change how cached
    # subtrees print (InMemoryTableScan vs the raw tree), which shifts the
    # Exchange counts; clear so the plan state is deterministic regardless
    # of module ordering.
    spark.catalog.clearCache()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # TWO passes: construct every frame first, THEN print. A single
        # interleaved pass makes each printed tree depend on which
        # memoized subtrees earlier ENTRIES (or earlier test modules)
        # happened to cache-mark — the r14 ordering flake: the funnel
        # printed 6 exchanges after a full-suite chunk had warmed the
        # memos but 8 when the module ran standalone. With construction
        # completed up front, every cache mark any entry creates exists
        # before any print, so the counts are order-independent.
        frames = {name: QUERIES[name](spark, SF) for name in MAX_SHUFFLES}
        yield {name: plan_text(df) for name, df in frames.items()}
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def shuffles_in(plan: str) -> int:
    # count DISTINCT Exchange operators via the formatted node-detail
    # section — a shared subtree (e.g. a cached frame feeding two
    # consumers) prints its Exchange twice in the tree but executes once.
    # REPARTITION_BY_NUM exchanges are the loader's parallel_scan
    # fan-outs: they exist ONLY when a local single-split file would
    # serialize the map phase and vanish at production scale (scan
    # splits >= cores), so they are not part of the scale budget these
    # invariants protect.
    import re

    ids = set(re.findall(r"^\((\d+)\) Exchange\b", plan, re.M))
    if not ids:
        if "Exchange" not in plan:
            return 0
        return plan.count("+- Exchange") + plan.count(":- Exchange")
    n = 0
    for i in ids:
        m = re.search(rf"^\({i}\) Exchange\b.*?(?=^\(\d+\) |\Z)",
                      plan, re.M | re.S)
        if "REPARTITION_BY_NUM" not in (m.group(0) if m else ""):
            n += 1
    return n


@pytest.mark.parametrize("name", sorted(MAX_SHUFFLES))
def test_shuffle_budget(static_plans, name):
    got = shuffles_in(static_plans[name])
    assert got <= MAX_SHUFFLES[name], (
        f"{name}: {got} shuffles in static plan, budget {MAX_SHUFFLES[name]} — "
        "a plan regression (see PLANS.md)")


@pytest.mark.parametrize("name", sorted(MAX_SHUFFLES))
def test_no_cartesian_products(static_plans, name):
    assert "CartesianProduct" not in static_plans[name], (
        f"{name}: CartesianProduct in plan")


def test_filters_push_to_parquet(static_plans):
    # the projection query's filters must reach the scan
    plan = static_plans["lineitem_ship_minute_projection"]
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "IsNotNull" in pushed or "GreaterThan" in pushed, pushed


def test_vocabulary_topk_is_take_ordered(static_plans):
    # orderBy().limit() must compile to TakeOrderedAndProject (per-partition
    # heap + driver merge), never a global sort or partition-less window
    plan = static_plans["corpus_vocabulary"]
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan


def test_no_partitionless_window_anywhere(spark):
    """No catalog query may use a global (partition-less) window: it moves
    the node's ENTIRE input to one task. A partitioned logical Window node
    prints `Window [exprs], [partSpec], [orderSpec]`; an unordered one drops
    the orderSpec and a partition-less one drops the partSpec — so a node
    with two bracket groups whose LAST group is an order spec (ASC/DESC
    entries) has no partition."""
    for name, fn in sorted(QUERIES.items()):
        plan = fn(spark, SF)._jdf.queryExecution().optimizedPlan().toString()
        for line in plan.splitlines():
            s = line.strip().lstrip("+-: ").strip()
            if s.startswith("Window ["):
                groups = s.count("], [") + 1
                last = s.rsplit("], [", 1)[-1]
                is_order_spec = (" ASC " in last or " DESC " in last
                                 or last.endswith(" ASC]") or last.endswith(" DESC]")
                                 or "NULLS FIRST" in last or "NULLS LAST" in last)
                assert groups >= 3 or not is_order_spec, (
                    f"{name}: partition-less window in optimized plan: {s}")


def test_simhash_edge_table_shared_across_consumers(spark):
    """The verified near-dup edge table is cached: once any consumer has
    materialized it, cluster labels (and the curation pipeline) read the
    InMemoryRelation instead of re-running banding + verify."""
    from demo_cdc_users_airline_spark.operators.dedup import (
        dedup_cluster_labels, dedup_simhash_pairs)

    dedup_simhash_pairs(spark, SF).count()
    plan = (dedup_cluster_labels(spark, SF)
            ._jdf.queryExecution().optimizedPlan().toString())
    assert "InMemoryRelation" in plan
