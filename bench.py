"""Headline-query benchmark. Prints TWO JSON lines — a full-detail record
(also mirrored to BENCH_DETAIL.json) and then a compact final line
{"metric": "headline_query_total", "value": N, "unit": "sec",
 "queries": {...}, "materialized_total": M, "sf": ..., "env_probe": {...}}
sized to fit a bounded stdout tail capture (the r6 artifact was
unparseable because one fat line outgrew the harness's 2000-char tail).

Runs each headline query at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], min-of-2, excluding session startup — TWICE:
once to a count() (cross-round comparable; Catalyst may prune output
expressions) and once through the noop sink (full materialization — the
honest cost every consumer pays). The env_probe block (dispatch latency,
file/row-group layout, timestamp physical type) makes cross-round deltas
attributable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from danae_spark.queries import load_all
from danae_spark.session import get_spark

# Max length of the final stdout JSON line: the external harness records a
# 2000-char stdout tail and parses the last line found in it; leave margin
# for a trailing newline and any prefix the harness needs to find the line
# boundary.
TAIL_BUDGET = 1900

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_volume",
    "sessionize_events",
    "asof_join_events",
    "range_join_events",
    "top_n_per_group",
    "json_extract_events",
    "tfidf_topk_terms",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "metadata_search_bm25",
    "profile_numeric",
    "funnel_conversion",
    "retention_cohorts",
    "ann_ivf",
    "dq_checks",
    # round-2 additions: wider operator coverage in the headline set
    "grouping_sets_agg",
    "profile_quantiles",
    "dedup_simhash",
    "ann_lsh_bucketed",
    "text_stats",
    "text_repetition_filter",
    "contamination_ngram",
    "deterministic_sample",
    "similarity_graph_degree",
    "dataset_search_topk",
    # round-3 additions
    "profile_numeric_extended",
    "quantized_ann_topk",
    # round-5 additions
    "ann_ivf_trained",
    "pii_scan",
    "quality_filter",
    # round-6 additions
    "dedup_shared_spans",
    "canonical_keeper",
    "semantic_dedup",
    "line_dedup",
    "nb_quality_classifier",
    "perplexity_buckets",
    "doc_embedding",
    "corpus_report",
    "text_ann_topk",
    "frequent_ngrams",
    "pack_sequences",
    "bpe_token_count",
    # late-r6 additions
    "dsir_select",
    "url_domain_cap",
    "chunk_documents",
    "pq_ann_topk",
    "ivfpq_ann_topk",
    "rolling_zscore_anomaly",
    "video_meta_roundtrip",
    "maxsim_text_topk",
    # round-7 additions
    "image_pixels_roundtrip",
    "image_near_dup",
    "jpeg_pixels_roundtrip",
    "jpeg_progressive_roundtrip",
    "audio_pcm_roundtrip",
]


# not in the driver registry (library functions) but benchmarked the same
# way: name → callable(spark, sf_dir) -> DataFrame
def _extra_headline():
    from danae_spark.operators.dedup import dedup_embedding_lsh
    from danae_spark.profiling.profiler import numeric_profile_extended
    from danae_spark.queries.relational_extra import EXTRA_QUERIES

    def q9(spark, sf_dir):
        df, _ = EXTRA_QUERIES["q9_product_profit"](spark, sf_dir)
        return df

    def profile_extended_scale(spark, sf_dir):
        # the 100 TB throughput mode (plain double sums + approx
        # distinct) — the registered entry benches the oracle-exact mode,
        # whose decimal string-route casts dominate its materialized cost
        return numeric_profile_extended(spark, sf_dir, exact=False)

    def profile_numeric_scale(spark, sf_dir):
        from danae_spark.profiling.profiler import numeric_profile

        return numeric_profile(spark, sf_dir, exact=False)

    return {
        "dedup_embedding_lsh": dedup_embedding_lsh,
        "q9_product_profit": q9,
        "profile_extended_scale": profile_extended_scale,
        "profile_numeric_scale": profile_numeric_scale,
    }


def _environment_probe(spark, sf_dir: str) -> dict:
    """Host/data fingerprint shipped alongside the timings so cross-round
    bench deltas are attributable: per-round VMs differ several-fold in
    Spark job-dispatch latency, and the lake generator has shipped both
    TIMESTAMP(NANOS) and naive-µs parquet plus varying row-group layouts
    — all of which move query times without any code change."""
    probe: dict = {}
    try:
        t0 = time.time()
        for _ in range(5):
            spark.range(1000).count()
        probe["jvm_job_ms"] = round((time.time() - t0) / 5 * 1000, 1)
    except Exception:
        probe["jvm_job_ms"] = None
    try:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _idp(s):
            return s

        t0 = time.time()
        for _ in range(3):
            spark.range(64).repartition(32).select(_idp("id")).count()
        probe["python_job_ms"] = round((time.time() - t0) / 3 * 1000, 1)
    except Exception:
        probe["python_job_ms"] = None
    try:
        import glob

        import pyarrow.parquet as pq

        layout = {}
        ts_types = set()
        for t in ("lineitem", "orders", "events", "documents", "embeddings"):
            p = os.path.join(sf_dir, f"{t}.parquet")
            files = glob.glob(os.path.join(p, "*.parquet")) if os.path.isdir(p) else [p]
            rgs = 0
            for f in files:
                pf = pq.ParquetFile(f)
                rgs += pf.metadata.num_row_groups
                for fld in pf.schema_arrow:
                    st = str(fld.type)
                    if "timestamp" in st.lower():
                        ts_types.add(st)
            layout[t] = {"files": len(files), "row_groups": rgs}
        probe["row_groups_per_table"] = layout
        probe["timestamp_physical_type"] = sorted(ts_types)
    except Exception:
        pass
    return probe


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    registry = load_all()
    spark = get_spark("danae-bench")

    # JVM warmup on a trivial job so q1 doesn't pay startup costs
    spark.range(1000).count()
    # Python-worker-pool warmup so the first Arrow-UDF query doesn't pay
    # the daemon/worker spinup (~100-200 ms/task on this container)
    try:
        import pandas as pd  # noqa: F401
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _warm(s):
            return s

        spark.range(64).repartition(32).select(_warm("id")).count()
    except Exception:
        pass

    runnables = {
        name: registry[name].fn for name in HEADLINE if name in registry
    }
    runnables.update(_extra_headline())
    timings: dict[str, float] = {}
    for name, fn in runnables.items():
        best, n = None, 0
        for _ in range(2):  # min-of-2: absorbs codegen warm-up + host noise
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        timings[name] = round(best, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    # HONEST second track: count() lets Catalyst prune the very
    # expressions an operator exists to compute (the r6 repetition
    # lesson: 0.3 s counted, 35 s materialized). The noop sink executes
    # the full plan with every output column materialized — what a
    # downstream consumer actually pays. Kept separate so count-based
    # timings stay comparable across rounds.
    mat_timings: dict[str, float] = {}
    for name, fn in runnables.items():
        best = None
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        mat_timings[name] = round(best, 3)
        print(f"# {name}: materialized in {mat_timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    probe = _environment_probe(spark, sf_dir)
    detail = {
        "metric": "headline_query_detail",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "materialized_total": round(sum(mat_timings.values()), 3),
        "queries_materialized": mat_timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "env_probe": probe,
    }
    # Full record first (one line, may exceed any tail-capture window) and
    # mirrored to a file next to this script so the per-query materialized
    # track survives regardless of how much stdout a harness keeps.
    print(json.dumps(detail))
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass
    # The LAST stdout line is the parse target and external harnesses keep
    # only a bounded tail (r6 lesson: the single fat line outgrew a 2000-char
    # window → "parsed": null). Emit a compact line and degrade it
    # deterministically until it fits: drop the probe, then thin the
    # per-query dict to the slowest entries that fit.
    compact = {
        "metric": "headline_query_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "materialized_total": detail["materialized_total"],
        "sf": detail["sf"],
        "env_probe": {
            "jvm_job_ms": probe.get("jvm_job_ms"),
            "python_job_ms": probe.get("python_job_ms"),
        },
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > TAIL_BUDGET:
        compact.pop("env_probe")
        line = json.dumps(compact, separators=(",", ":"))
    while len(line) > TAIL_BUDGET and compact["queries"]:
        slowest = sorted(timings.items(), key=lambda kv: -kv[1])
        keep = slowest[: max(0, len(compact["queries"]) - 5)]
        compact["queries"] = dict(sorted(keep))
        compact["queries_omitted"] = len(timings) - len(keep)
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
