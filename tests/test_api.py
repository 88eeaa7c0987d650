"""Facade smoke: every DataLakeEngine verb returns a working DataFrame."""

from __future__ import annotations

from danae_spark.api import DataLakeEngine


def test_engine_facade_verbs(spark, sf_dir):
    eng = DataLakeEngine(spark, sf_dir)
    assert eng.catalog().count() == 10
    assert eng.table("nation").count() == 25
    assert eng.profile().count() > 0
    assert eng.signatures().count() > 0
    assert eng.dedup("exact").count() > 0
    assert eng.ann("lsh").count() > 0
    assert eng.text_stats().count() > 0
    one = eng.search(dataset="orders", k=2).collect()
    assert 0 < len(one) <= 2
    assert all(r["q_table"] == "orders" for r in one)
    assert eng.metadata_search("spark join", k=5).count() <= 5


def test_engine_facade_profiling_paths(spark, sf_dir):
    """profile_extended (both modes) and the incremental state verbs
    agree with each other on the facade."""
    from pyspark.sql import functions as F

    eng = DataLakeEngine(spark, sf_dir)
    ext = eng.profile_extended()
    assert {"skewness", "kurtosis", "cv", "missing_pct"} <= set(ext.columns)
    n_ext = ext.count()
    assert n_ext > 0
    assert eng.profile_extended(exact=False).count() == n_ext

    li = eng.table("lineitem")
    states = [
        eng.profile_state(li.filter(F.col("l_orderkey") % 2 == i), "lineitem")
        for i in range(2)
    ]
    inc = {
        r["column_name"]: r
        for r in DataLakeEngine.merge_profile_states(states, extended=True).collect()
    }
    one = {
        r["column_name"]: r
        for r in ext.filter(F.col("table_name") == "lineitem").collect()
    }
    assert set(one) <= set(inc)
    for c in one:
        assert inc[c]["skewness"] == one[c]["skewness"], c
        assert inc[c]["avg_v"] == one[c]["avg_v"], c


def test_engine_facade_curation_verbs(spark, sf_dir):
    """The r6 curation verbs: span dedup, quality-aware canonical
    keeping, span removal, and the one-call curate() composition."""
    eng = DataLakeEngine(spark, sf_dir)
    spans = eng.dedup("spans")
    assert set(spans.columns) == {"doc_a", "doc_b", "a_start", "b_start", "span_tokens"}
    ck = eng.canonical_keeper()
    curated = eng.curate().collect()
    keep = {r["doc_id"] for r in ck.collect() if r["keep"] == 1}
    assert {r["doc_id"] for r in curated} == keep and keep
    rewritten = eng.remove_spans(eng.table("documents").select("doc_id", "text"))
    assert rewritten.count() == eng.table("documents").count()


def test_engine_facade_r14_verbs(spark, sf_dir):
    from danae_spark.api import DataLakeEngine
    from pyspark.sql import functions as F

    engine = DataLakeEngine(spark, sf_dir)
    docs = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog read books by the river"),
         (2, "el zorro marrón salta sobre el perro perezoso cada mañana junto al río")],
        "doc_id long, text string",
    )
    lang = {r["doc_id"]: r["predicted"] for r in engine.lang_id(docs, label_col=None).collect()}
    assert lang[1] == "en" and lang[2] == "es"
    q = engine.quality_routed(docs).collect()
    assert all(r["mq_score"] is not None for r in q)
    pages = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "solo")], "page_id int, text string"
    )
    k = {r["page_id"]: r for r in engine.dup_keeper(pages).collect()}
    assert k[1]["is_keeper"] == 1 and k[2]["is_keeper"] == 0 and k[3]["n_dup"] == 1


def test_engine_facade_incremental_dedup_verbs(spark, sf_dir):
    from danae_spark.api import DataLakeEngine
    from pyspark.sql import functions as F

    engine = DataLakeEngine(spark, sf_dir)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (10, "alpha beta gamma delta epsilon zeta eta theta"),
         (11, "totally different words in this one here now")],
        "doc_id long, text string",
    )
    state = (
        docs.filter(F.col("doc_id") < 10)
        .select(
            F.xxhash64(
                F.expr("trim(regexp_replace(lower(text), '[^a-z0-9]+', ' '))")
            ).alias("key_hash"),
            F.col("doc_id").alias("keeper_id"),
        )
    )
    verdicts, delta = engine.dedup_incremental(state, docs.filter(F.col("doc_id") >= 10))
    v = {r["doc_id"]: r for r in verdicts.collect()}
    assert v[10]["dup_of_existing"] == 1 and v[10]["keeper_id"] == 1
    assert v[11]["dup_of_existing"] == 0
    assert delta.count() == 1

    sig = engine.minhash_signatures(docs, df_cap=None)
    out = engine.neardup_incremental(
        sig.filter(F.col("doc_id") < 10), sig.filter(F.col("doc_id") >= 10)
    )
    o = {r["doc_id"]: r for r in out.collect()}
    assert o[10]["is_near_dup"] == 1 and o[10]["best_match_id"] == 1
    assert o[11]["is_near_dup"] == 0


def test_engine_facade_export_and_media_verbs(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from danae_spark.api import DataLakeEngine
    from danae_spark.multimodal.exif import synth_exif_jpeg

    engine = DataLakeEngine(spark, sf_dir)
    imgs = spark.createDataFrame(
        [(d, synth_exif_jpeg(d)) for d in (0, 6)], "doc_id long, payload binary"
    )
    e = {r["doc_id"]: r for r in engine.exif(imgs).collect()}
    assert e[0]["has_gps"] == 1 and e[6]["has_exif"] == 0

    a = spark.createDataFrame([("u", "h1")], "url string, digest string")
    b = spark.createDataFrame([("u", "h2")], "url string, digest string")
    assert engine.snapshot_diff(a, b).collect()[0]["verdict"] == "changed"

    docs = spark.range(0, 40).select(
        F.col("id").alias("doc_id"), F.lit("a b").alias("text")
    )
    m = engine.shuffle_export(docs, str(tmp_path / "exp"), n_shards=2)
    assert sum(r["n_docs"] for r in m.collect()) == 40
    assert spark.read.parquet(str(tmp_path / "exp")).count() == 40


def test_r16_facades_route_to_frames(spark):
    """The r16 facade methods run end-to-end over a tiny frame."""
    from danae_spark.multimodal.eml import synth_mail
    from danae_spark.multimodal.latex import synth_latex
    from danae_spark.multimodal.notebook import synth_notebook
    from danae_spark.multimodal.webp import synth_webp_census
    from danae_spark.operators.codestats import synth_code_doc
    from danae_spark.multimodal.pixels import synth_image

    eng = DataLakeEngine(spark, "/root/testdata/sf0.001")
    for method, synth, col, want in [
        ("webp_census", synth_webp_census, "variant", "vp8l"),
        ("notebook_text", synth_notebook, "language", "python"),
        ("latex_text", synth_latex, "title", "Paper 0"),
        ("mail_text", synth_mail, "variant", "eml"),
        ("code_stats", synth_code_doc, "language", "python"),
        ("normalize_images", synth_image, "width", 8),
    ]:
        df = spark.createDataFrame([(0, bytearray(synth(0)))],
                                   "doc_id long, payload binary")
        row = getattr(eng, method)(df).collect()[0]
        assert row[col] == want, (method, row)
