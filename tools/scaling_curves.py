"""Measure time-vs-rows scaling curves for the most expensive operators.

Usage: python tools/scaling_curves.py [out_json] [operator ...]

With operator names given, only those rows are (re)measured and MERGED
into an existing out_json (other rows preserved) — adding a new
operator's curve doesn't require re-running the whole sweep.

Runs each operator MATERIALIZED (noop sink, min-of-2) at sf0.01 and
sf0.1 (driver lakes) plus sf0.5 and sf1 (tools/gen_scale_lake.py
synthesized, 5×/10× sf0.1), prints one JSON line per operator with the
timings and the fitted exponent alpha over the sf0.1 → sf1 decade
(t ∝ rows^alpha; alpha ≈ 1 is linear scaling, the 100 TB requirement;
sub-linear readings mean fixed job overhead still dominates at these
sizes). The driver table named per operator is the one whose row count
scales it (documents / embeddings / lineitem / events).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from danae_spark.queries import load_all
from danae_spark.session import get_spark

SFS = [
    ("0.01", "/root/testdata/sf0.01"),
    ("0.1", "/root/testdata/sf0.1"),
    ("0.5", "/root/repo/scaledata/sf0.5"),
    ("1", "/root/repo/scaledata/sf1"),
]

# operator → the table that drives its cost
OPERATORS = {
    "profile_numeric": "lineitem",
    "profile_quantiles": "lineitem",
    "profile_numeric_extended": "lineitem",
    "profile_extended_scale": "lineitem",
    "dedup_minhash_lsh": "documents",
    "dedup_shared_spans": "documents",
    "semantic_dedup": "documents",
    "curate_corpus": "documents",
    "pack_sequences": "documents",
    "canonical_keeper": "documents",
    "dsir_select": "documents",
    "text_ann_topk": "documents",
    "maxsim_text_topk": "documents",
    "rolling_zscore_anomaly": "events",
    "image_near_dup": "documents",
    "pq_ann_topk": "embeddings",
    "ivfpq_ann_topk": "embeddings",
    "q9_product_profit": "lineitem",
    # r9 additions: the r8 media families (synth -> real decode -> hash
    # pipelines; cost is one decode pass, embarrassingly parallel) and
    # the keeper chain under its new xxhash64 library default
    "image_pixels_roundtrip": "documents",
    "jpeg_progressive_roundtrip": "documents",
    "canonical_keeper_xxhash64": "documents",
    # r9 structural A/V census entries (synth stream -> real bit-level
    # parse -> census; one embarrassingly-parallel decode pass)
    "mp3_sideinfo_roundtrip": "documents",
    "mp4_sample_census": "documents",
    "mp4_fragment_census": "documents",
    # r9 codec/container families: FLAC lossless codec, Ogg page walk,
    # WebM EBML walk — all one-pass per-row decode pipelines
    "flac_pcm_roundtrip": "documents",
    "ogg_census": "documents",
    "webm_census": "documents",
    # r9 text-bridge + near-dup families
    "audio_near_dup": "documents",
    "subtitle_extract": "documents",
    "id3_extract": "documents",
    "media_triage": "documents",
    "ogg_tags_extract": "documents",
    "mkv_tags_extract": "documents",
    # r10 crawl-ingestion families: quote-aware HTML scan, WARC walk
    # (gzip member-per-record inflate on odd docs), and the composed
    # WARC -> HTTP -> HTML extraction pipeline — all one-pass per-row
    # parse pipelines, embarrassingly parallel
    "html_text_extract": "documents",
    "warc_census": "documents",
    "crawl_html_extract": "documents",
    # r10 document/archive families: classic-PDF reader (xref walk,
    # COS grammar, Flate streams, text operators) and zip/tar census
    # with triage-routed members — one-pass per-row parse pipelines
    "pdf_text_extract": "documents",
    "archive_census": "documents",
    "text_harvest": "documents",
    # r10 crawl frontier/compliance: RFC 9309 robots evaluation and
    # RFC 3986 URL canonicalization — row-wise, no shuffle
    "robots_check": "documents",
    "url_canonicalize": "documents",
    "html_meta_extract": "documents",
    "sitemap_extract": "documents",
    "pdf_text_modern": "documents",
    "feed_extract": "documents",
    "pdf_text_cid": "documents",
    "crawl_charset_extract": "documents",
    "crawl_curate": "documents",
    "sitemap_bundle_extract": "documents",
    "wet_text_extract": "documents",
    "frontier_plan": "documents",
    "wat_census": "documents",
    "page_links": "documents",
    "pagerank": "documents",
    # round-12 additions
    "pdf_text_encrypted": "documents",
    "lang_id_ngram": "documents",
    "corpus_lang_strata": "documents",
    "html_boilerplate_extract": "documents",
    "crawl_curate_boiler": "documents",
    "crawl_curate_ranked": "documents",
    "crawl_revisit_dedup": "documents",
    "html_structured_extract": "documents",
    "quality_multilang": "documents",
    "crawl_lang_report": "documents",
    # round-14 additions
    "crawl_curate_multilang": "documents",
    "crawl_curate_canonical": "documents",
    "crawl_codings_census": "documents",
    "cdx_fetch_plan": "documents",
    "crawl_curate_boiler_ranked": "documents",
    "crawl_curate_robots": "documents",
    "crawl_curate_neardup": "documents",
    "crawl_report_full": "documents",
    "shuffle_shards": "documents",
    "image_exif_extract": "documents",
    "crawl_snapshot_diff": "documents",
    "crawl_sitemap_coverage": "documents",
    "crawl_refetch_plan": "documents",
    "corpus_pii_report": "documents",
    # round-14 third-session additions: document formats (one-pass
    # per-row parse pipelines), sampling/mixing (aggregate or
    # prefilter+tiny-window plans), and the Gopher rule projection
    "crawl_repackage": "documents",
    "office_text_extract": "documents",
    "xlsx_table_extract": "documents",
    "epub_text_extract": "documents",
    "rtf_text_extract": "documents",
    "stratified_sample": "documents",
    "weighted_sample": "documents",
    "mixture_plan": "documents",
    "gopher_quality": "documents",
    "weighted_sample_incremental": "documents",
    "markdown_text_extract": "documents",
    "crawl_curate_gopher": "documents",
    "corpus_format_census": "documents",
    "corpus_build_select": "documents",
    "stratified_sample_incremental": "documents",
    "csv_blob_census": "documents",
    "json_blob_census": "documents",
    "parquet_blob_census": "documents",
    "sqlite_blob_census": "documents",
    "access_log_census": "documents",
    "chat_jsonl_census": "documents",
    # r15 additions: the incremental IVF leg, the Avro container
    # census, MJPEG frame decode; codings census + pixel roundtrip
    # re-measured (grid/rotation widened with entropy codecs + TIFF)
    "ann_ivf_incremental": "embeddings",
    "avro_blob_census": "documents",
    "mjpeg_avi_frames": "documents",
    "pq_ann_incremental": "embeddings",
    "orc_blob_census": "documents",
    "blob_harvest": "documents",
    "gif_anim_frames": "documents",
    # r16 additions: the WebP codec family, three corpus-class text
    # extractors, and the code-corpus leg — all one-pass per-row
    # synth -> real parse pipelines, embarrassingly parallel; plus
    # the two rotation-widened entries re-measured (14th format)
    "webp_pixels_roundtrip": "documents",
    "webp_census": "documents",
    "notebook_text_extract": "documents",
    "latex_text_extract": "documents",
    "mail_text_extract": "documents",
    "code_corpus_stats": "documents",
    "image_normalize": "documents",
    "avif_census": "documents",
    "delta_log_census": "documents",
    "svg_census": "documents",
    "cfb_office_extract": "documents",
    "iceberg_census": "documents",
    "parquet_skipping_plan": "documents",
    "wiki_text_extract": "documents",
    "delta_skipping_plan": "documents",
    "iceberg_skipping_plan": "documents",
    "safetensors_census": "documents",
    "npy_blob_census": "documents",
    "arrow_blob_census": "documents",
    "stackexchange_text_extract": "documents",
    "gguf_census": "documents",
    "hudi_census": "documents",
    "tfrecord_census": "documents",
    "tokenizer_census": "documents",
    "zarr_census": "documents",
}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING.json"
    only = set(sys.argv[2:])
    registry = load_all()
    spark = get_spark("scaling-curves")
    spark.range(1000).count()

    def runnable(name):
        if name == "profile_extended_scale":
            from danae_spark.profiling.profiler import numeric_profile_extended

            return lambda s, d: numeric_profile_extended(s, d, exact=False)
        if name == "canonical_keeper_xxhash64":
            # the r9 LIBRARY default (pairs_impl='xxhash64'); the plain
            # canonical_keeper row measures the md5-pinned oracle entry
            from danae_spark.operators.dedup import canonical_keeper

            return lambda s, d: canonical_keeper(s, d)
        return registry[name].fn

    rows_at = {}
    for sf, d in SFS:
        rows_at[sf] = {
            t: spark.read.parquet(os.path.join(d, f"{t}.parquet")).count()
            for t in ("lineitem", "documents", "embeddings", "events")
        }

    results = []
    for name, driver_table in OPERATORS.items():
        if only and name not in only:
            continue
        fn = runnable(name)
        times = {}
        for sf, d in SFS:
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            times[sf] = round(best, 2)
            print(f"# {name} sf{sf}: {times[sf]}s", file=sys.stderr, flush=True)
        r1, r10 = rows_at["0.1"][driver_table], rows_at["1"][driver_table]
        alpha = round(
            math.log(times["1"] / times["0.1"]) / math.log(r10 / r1), 2
        )
        rec = {
            "operator": name,
            "driver_table": driver_table,
            "rows": {sf: rows_at[sf][driver_table] for sf, _ in SFS},
            "materialized_s": times,
            "alpha_0.1_to_1": alpha,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    if only and os.path.exists(out_path):
        with open(out_path) as f:
            existing = json.load(f)
        merged = {r["operator"]: r for r in existing}
        for r in results:
            merged[r["operator"]] = r
        results = list(merged.values())
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
