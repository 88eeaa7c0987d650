"""Plan-quality regression tests: pushdown, pruning, broadcast joins.

These lock in the physical-plan properties that matter at 100 TB; a
change that silently degrades a plan (drops a pushed filter, turns a
broadcast join into sort-merge) fails here.
"""

from __future__ import annotations

from danae_spark.plans import audit
from danae_spark.queries import load_all

REGISTRY = load_all()


def test_q1_filter_pushed_and_pruned(spark, sf_dir):
    df = REGISTRY["q1_pricing_summary"].fn(spark, sf_dir)
    audit.assert_pushed_filter(df, "l_shipdate")
    lineitem_cols = {
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    }
    audit.assert_read_columns_at_most(
        df,
        lineitem_cols,
        {"l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_tax", "l_shipdate"},
    )


def test_q3_broadcasts_customer(spark, sf_dir):
    df = REGISTRY["q3_shipping_priority"].fn(spark, sf_dir)
    strategies = audit.join_strategies(df)
    assert "BroadcastHashJoin" in strategies, strategies


def test_q5_all_dims_broadcast(spark, sf_dir):
    df = REGISTRY["q5_local_volume"].fn(spark, sf_dir)
    strategies = audit.join_strategies(df)
    # dims (customer/supplier/nation/region) broadcast; no cartesian
    assert strategies.count("BroadcastHashJoin") >= 3, strategies
    audit.assert_no_cartesian(df)


def test_q5_orderdate_pushed(spark, sf_dir):
    df = REGISTRY["q5_local_volume"].fn(spark, sf_dir)
    audit.assert_pushed_filter(df, "o_orderdate")


def test_tfidf_has_codegen(spark, sf_dir):
    df = REGISTRY["tfidf_topk_terms"].fn(spark, sf_dir)
    df.collect()  # AQE: codegen annotations appear in the final executed plan
    assert audit.codegen_stage_count(df) >= 2


def test_minhash_no_cartesian(spark, sf_dir):
    df = REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir)
    audit.assert_no_cartesian(df)


def test_minhash_verify_prefilters_candidates(spark, sf_dir):
    """The exact-Jaccard verify must semi-join candidate doc ids into the
    shingle table BELOW the shingle self-join — otherwise verify costs the
    same as exact all-pairs and LSH candidate generation is pointless.
    Locked by counting LeftSemi joins in the optimized plan: 2 doc-level
    prefilters + 1 pair-level filter per variant."""
    df = REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LeftSemi") >= 3, plan


def test_range_join_is_hash_not_cartesian(spark, sf_dir):
    df = REGISTRY["range_join_events"].fn(spark, sf_dir)
    audit.assert_no_cartesian(df)


def test_dq_checks_scans_each_fact_once(spark, sf_dir):
    """The data-quality gate must scan lineitem exactly once (r1 scanned
    it three times through separate anti-joins)."""
    df = REGISTRY["dq_checks"].fn(spark, sf_dir)
    li_scans = [
        s for s in audit.scans(df) if any(c.startswith("l_") for c in s["read_columns"])
    ]
    assert len(li_scans) == 1, li_scans


def test_profile_numeric_single_scan_per_table(spark, sf_dir):
    """The numeric profiler is ONE melt-aggregate pass: each profiled
    table scanned exactly once (the r5 two-branch shape scanned every
    table twice and lost the r6 paired A/B 2.5×; this pins
    scans-per-table = 1 so it can't silently come back)."""
    from danae_spark.profiling.profiler import NUMERIC_PROFILE_TABLES

    df = REGISTRY["profile_numeric"].fn(spark, sf_dir)
    audit.assert_no_cartesian(df)
    assert len(audit.scans(df)) == len(NUMERIC_PROFILE_TABLES), audit.scans(df)


def test_profile_numeric_scale_mode_single_scan(spark, sf_dir):
    """exact=False (the 100 TB mode) folds approx_count_distinct into
    the same single aggregate — still one scan per table, and the plan
    carries no join at all."""
    from danae_spark.profiling.profiler import NUMERIC_PROFILE_TABLES, numeric_profile

    df = numeric_profile(spark, sf_dir, exact=False)
    plan = audit.physical_plan(df)
    assert len(audit.scans(df)) == len(NUMERIC_PROFILE_TABLES), audit.scans(df)
    assert "Join" not in plan, plan


def test_embedding_lsh_no_broadcast_of_vector_table(spark, sf_dir):
    """The default embedding near-dup path must be (band, bucket)
    equi-joins — no cross join, no broadcast nested loop over the vector
    table (the r2 scale-weak finding on the exact twin)."""
    from danae_spark.operators import dedup

    df = dedup.dedup_embedding_lsh(spark, sf_dir)
    audit.assert_no_cartesian(df)
    plan = audit.physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q9_dims_broadcast_no_cartesian(spark, sf_dir):
    """Q9's five-table join: part/supplier/nation broadcast; the only
    shuffle joins are fact-to-fact (lineitem-orders)."""
    from danae_spark.queries.relational_extra import EXTRA_QUERIES

    df, _ = EXTRA_QUERIES["q9_product_profit"](spark, sf_dir)
    strategies = audit.join_strategies(df)
    assert strategies.count("BroadcastHashJoin") >= 3, strategies
    audit.assert_no_cartesian(df)


def test_q2_single_shuffle_supply_aggregate(spark, sf_dir):
    """Q2's correlated-min is a window over the supply aggregate —
    partitioned on the same key as the groupBy, so the min adds no
    second shuffle of the supply relation, and supplier/nation/region/
    part all broadcast."""
    from danae_spark.queries.relational_extra import EXTRA_QUERIES

    df, _ = EXTRA_QUERIES["q2_min_cost_supplier"](spark, sf_dir)
    audit.assert_no_cartesian(df)
    plan = audit.physical_plan(df)
    # one exchange for the (partkey, suppkey) aggregate; the window's
    # partitionBy(ps_partkey) requirement is satisfied by it (prefix),
    # so no hashpartitioning exchange on ps_partkey alone should appear
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_q20_part_filter_broadcast_semi(spark, sf_dir):
    """Q20's inner part-pattern filter must reach lineitem as a
    broadcast left-semi join (never a shuffle of the fact on partkey
    just to filter it)."""
    from danae_spark.queries.relational_extra import EXTRA_QUERIES

    df, _ = EXTRA_QUERIES["q20_potential_promotion"](spark, sf_dir)
    plan = audit.physical_plan(df)
    assert "LeftSemi, BuildRight" in plan or "BroadcastHashJoin" in plan, plan
    audit.assert_no_cartesian(df)


def test_semantic_dedup_no_cartesian_pairs(spark, sf_dir):
    # the within-cluster self-join must be a hash join on centroid_id,
    # never an all-pairs cartesian — that's the whole SemDeDup argument
    df = REGISTRY["semantic_dedup"].fn(spark, sf_dir)
    audit.assert_no_cartesian(df)


def test_nb_classifier_broadcasts_vocab(spark, sf_dir):
    # default mode: the (term, weight) model joins back as a broadcast;
    # token-side rows never shuffle for the scoring join
    df = REGISTRY["nb_quality_classifier"].fn(spark, sf_dir)
    strategies = audit.join_strategies(df)
    assert "BroadcastHashJoin" in strategies, strategies
    audit.assert_no_cartesian(df)


def test_nb_classifier_web_scale_switch_shuffle_join(spark, sf_dir):
    from danae_spark.catalog import load_table
    from danae_spark.operators.textstats import nb_quality_classifier_frame

    docs = load_table(spark, sf_dir, "documents")
    # broadcast_vocab=False removes the FORCED broadcast hint; Catalyst
    # may still auto-broadcast a small vocab from size estimates. Simulate
    # a 100 TB vocab (estimates above every threshold) by disabling
    # auto-broadcast: the scoring join must then plan as a shuffle join —
    # with the hint it would stay broadcast no matter what.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = nb_quality_classifier_frame(docs, broadcast_vocab=False)
        strategies = audit.join_strategies(df)
        assert any(
            s in ("SortMergeJoin", "ShuffledHashJoin") for s in strategies
        ), strategies
    finally:
        # restore even when the conf was initially unset — leaving -1
        # behind disabled auto-broadcast for every later test in the
        # session (surfaced as a phantom CartesianProduct in the dsir
        # plan audit)
        if prev is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        else:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_line_dedup_no_cartesian(spark, sf_dir):
    df = REGISTRY["line_dedup"].fn(spark, sf_dir)
    audit.assert_no_cartesian(df)


def test_quality_filter_two_scans(spark, sf_dir):
    # the fused decision reads the corpus exactly twice: one row-wise
    # projection (quality + PII) and one gram explode+agg branch
    df = REGISTRY["quality_filter"].fn(spark, sf_dir)
    n_scans = len(audit.scans(df))
    assert n_scans == 2, n_scans


def test_text_repetition_single_scan(spark, sf_dir):
    # sentence counters ride through the gram explode — one corpus scan
    df = REGISTRY["text_repetition_filter"].fn(spark, sf_dir)
    n_scans = len(audit.scans(df))
    assert n_scans == 1, n_scans


def test_corpus_report_two_scans(spark, sf_dir):
    df = REGISTRY["corpus_report"].fn(spark, sf_dir)
    n_scans = len(audit.scans(df))
    # fused quality frame (2 scans) + the source/lang projection (1)
    assert n_scans <= 3, n_scans


def test_pack_sequences_no_global_window(spark, sf_dir):
    """The packing prefix sum must never plan a single-task global
    window: no Window operator at all (local cumsums run inside the
    Arrow pass), one range exchange for the ordering."""
    df = REGISTRY["pack_sequences"].fn(spark, sf_dir)
    plan = audit.physical_plan(df)
    assert "Window" not in plan, plan
    assert "rangepartitioning" in plan.lower() or "ReusedExchange" in plan, plan


def test_dsir_broadcasts_model_no_cartesian(spark, sf_dir):
    """The (bucket, lam) model and the 1-row totals broadcast; no
    cartesian product anywhere in the selection plan."""
    df = REGISTRY["dsir_select"].fn(spark, sf_dir)
    audit.assert_no_cartesian(df)
    strategies = audit.join_strategies(df)
    assert "BroadcastHashJoin" in strategies, strategies
    # the ONLY sort-merge join allowed is the final doc-level left join
    # (both sides corpus-sized at scale — SMJ is correct there); the
    # bucket-level model joins must broadcast. Formatted plans list
    # each node twice (tree + detail), so one join = two matches.
    assert strategies.count("SortMergeJoin") <= 2, strategies


def test_chunk_documents_no_shuffle_before_sort(spark, sf_dir):
    """Chunking is per-row explode: the only exchange in the plan is
    the final presentation orderBy."""
    df = REGISTRY["chunk_documents"].fn(spark, sf_dir)
    plan = audit.physical_plan(df)
    # rangepartitioning for the orderBy is allowed; no hashpartitioning
    # (aggregation/join shuffle) should exist
    assert "hashpartitioning" not in plan, plan[:2000]
    audit.assert_no_cartesian(df)


def test_url_domain_cap_single_shuffle(spark, sf_dir):
    """One hash shuffle (the domain window) + the presentation sort."""
    df = REGISTRY["url_domain_cap"].fn(spark, sf_dir)
    plan = audit.physical_plan(df)
    assert plan.count("hashpartitioning") <= 1, plan[:2000]


def test_zscore_single_shuffle_no_join(spark, sf_dir):
    """The anomaly pass is one window over one shuffle — no join, no
    self-join of events."""
    df = REGISTRY["rolling_zscore_anomaly"].fn(spark, sf_dir)
    assert audit.join_strategies(df) == []
    assert len([s for s in audit.scans(df) if "events" in str(s)]) <= 1


def test_pq_lut_broadcast_no_vector_join(spark, sf_dir):
    """ADC scoring joins codes to the broadcast LUT — candidates never
    join on float vectors, and nothing is cartesian."""
    df = REGISTRY["pq_ann_topk"].fn(spark, sf_dir)
    audit.assert_no_cartesian(df)
    strategies = audit.join_strategies(df)
    assert strategies and all(s == "BroadcastHashJoin" for s in strategies), strategies


def test_ivfpq_probe_and_lut_broadcast(spark, sf_dir):
    df = REGISTRY["ivfpq_ann_topk"].fn(spark, sf_dir)
    audit.assert_no_cartesian(df)
    strategies = audit.join_strategies(df)
    assert strategies and all(s == "BroadcastHashJoin" for s in strategies), strategies


def test_maxsim_no_driver_hop_no_cartesian(spark, sf_dir):
    """maxsim's query-term relation broadcasts directly from the plan —
    the old driver-side collect/recreate hop (LocalTableScan) is gone,
    and the q×c interaction is a broadcast nested-loop on a BOUNDED
    broadcast side, never a cartesian product."""
    df = REGISTRY["maxsim_text_topk"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_gopher_quality_pure_projection(spark, sf_dir):
    """The Gopher rule set is one JVM projection (higher-order array
    expressions — interpreted, not codegen, but never Python): no
    Exchange at all before the presentation sort, no Python eval, one
    scan."""
    df = REGISTRY["gopher_quality"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert len(audit.scans(df)) == 1, plan


def test_document_format_frames_are_narrow(spark, sf_dir):
    """Every r14 document-format roundtrip is a narrow Arrow map: the
    only exchange is the deliberate input repartition (partition
    parallelism IS the scale path), plus the presentation sort."""
    for name in (
        "office_text_extract",
        "xlsx_table_extract",
        "epub_text_extract",
        "rtf_text_extract",
        "markdown_text_extract",
    ):
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_hash = plan.count("Exchange hashpartitioning")
        n_range = plan.count("Exchange rangepartitioning")
        assert n_hash <= 1 and n_range <= 1, (name, plan)
        assert "FlatMapGroupsInPandas" not in plan, (name, plan)  # stateless map


def test_mixture_plan_single_shuffle(spark, sf_dir):
    df = REGISTRY["mixture_plan"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_stratified_sample_window_is_survivor_bound(spark, sf_dir):
    """The exact window exists, but its input is the prefiltered
    survivor set — the plan must contain the hash-threshold Filter
    BELOW the window's exchange."""
    df = REGISTRY["stratified_sample"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan, plan
    win_ix = plan.index("Window")
    below = plan[win_ix:]
    assert "Filter" in below, plan  # the prefilter feeds the window


def test_blob_censuses_are_narrow(spark, sf_dir):
    """The blob-census family is one Arrow map per entry: no shuffle
    beyond the deliberate input repartition + presentation sort, no
    grouped-pandas operators."""
    for name in (
        "csv_blob_census",
        "json_blob_census",
        "parquet_blob_census",
        "sqlite_blob_census",
        "access_log_census",
        "chat_jsonl_census",
        "avro_blob_census",
        "orc_blob_census",
        "blob_harvest",
        "gif_anim_frames",
        "webp_pixels_roundtrip",
        "webp_census",
        "notebook_text_extract",
        "latex_text_extract",
        "mail_text_extract",
        "code_corpus_stats",
        "image_normalize",
        "avif_census",
        "delta_log_census",
        "svg_census",
        "cfb_office_extract",
        "iceberg_census",
        "parquet_skipping_plan",
        "wiki_text_extract",
        "delta_skipping_plan",
        "iceberg_skipping_plan",
        "safetensors_census",
        "npy_blob_census",
        "arrow_blob_census",
        "stackexchange_text_extract",
        "gguf_census",
        "hudi_census",
        "tfrecord_census",
        "tokenizer_census",
        "zarr_census",
    ):
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") <= 1, (name, plan)
        assert plan.count("Exchange rangepartitioning") <= 1, (name, plan)
        assert "FlatMapGroupsInPandas" not in plan, (name, plan)
