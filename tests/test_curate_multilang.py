"""Language-routed curation (r14): the r12 directive's certification
that the routed scorer changes real keep decisions on a multilingual
crawl — plus the plan-shape guarantees the composition inherits."""

from __future__ import annotations

from pyspark.sql import functions as F

from danae_spark.multimodal.warc import (
    CRAWL_LANG_MIN_Q,
    crawl_curate_multilang_roundtrip,
    lang_page_prose,
    synth_lang_warc,
)


def test_routed_scorer_keeps_pages_the_english_scorer_drops(spark, sf_dir):
    """The directive's exact claim: a non-English prose page KEPT by
    the routed scorer that the English-stopword scorer DROPS — and not
    as a fluke: every segmented non-English prose page shows the
    delta, while English prose passes both (so the difference is the
    routing, not the threshold)."""
    out = crawl_curate_multilang_roundtrip(spark, sf_dir)
    prose = out.filter(F.col("lang").isNotNull()).persist()

    ru = prose.filter(F.col("lang") == "ru").agg(
        F.count("*").alias("n"),
        F.sum("routed_keep").alias("routed"),
        F.sum("en_keep").alias("en"),
    ).first()
    assert ru["n"] > 0
    assert ru["routed"] == ru["n"]  # routed keeps all Russian prose
    assert ru["en"] == 0  # the English scorer drops ALL of it

    en = prose.filter(F.col("lang") == "en").agg(
        F.count("*").alias("n"), F.sum("routed_keep").alias("r"),
        F.sum("en_keep").alias("e"),
    ).first()
    assert en["n"] > 0 and en["r"] == en["n"] and en["e"] == en["n"]

    # every segmented language shows the same shape; unsegmented
    # ja/zh/th drop under BOTH (the token-length / neutral-stop legs,
    # documented caveat)
    per_lang = {
        r["lang"]: r
        for r in prose.groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("routed_keep").alias("r"),
             F.sum("en_keep").alias("e"))
        .collect()
    }
    for lang, r in per_lang.items():
        if lang in ("ja", "zh", "th"):
            assert r["r"] == 0 and r["e"] == 0
        elif lang == "en":
            assert r["r"] == r["n"] and r["e"] == r["n"]
        else:
            assert r["r"] == r["n"], f"{lang}: routed dropped prose"
            assert r["e"] == 0, f"{lang}: english scorer kept {r['e']}"
    prose.unpersist()


def test_langid_agrees_and_dedup_mirrors_resolve(spark, sf_dir):
    """The classifier must re-identify every prose page's language
    (lang_match=1 — the pages ARE the training corpora), junk pages
    must drop on quality, and mirror captures must form 2-clusters
    whose keeper is the main capture."""
    out = crawl_curate_multilang_roundtrip(spark, sf_dir).persist()
    prose = out.filter(F.col("lang").isNotNull())
    assert prose.filter(F.col("lang_match") == 0).count() == 0

    junk = out.filter(F.col("lang").isNull())
    assert junk.count() > 0
    assert junk.filter(F.col("keep") == 1).count() == 0

    mirrors = out.filter(F.col("page_id") % 4 == 2)
    n_mirrors = mirrors.count()
    assert n_mirrors > 0
    assert mirrors.filter(F.col("n_dup") != 2).count() == 0
    assert mirrors.filter(F.col("is_keeper") == 1).count() == 0  # main keeps
    out.unpersist()


def test_multilang_curate_plan_shape(spark, sf_dir):
    """Inherited scale guarantees: no window over the text hash (the
    keeper is two-phase) and the langid profile join is broadcast."""
    plan = (
        crawl_curate_multilang_roundtrip(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    for line in plan.splitlines():
        low = line.lower()
        if "windowspecdefinition" in low:
            assert "xxhash64" not in low, f"window over text hash:\n{line}"
    assert "ResolvedHint" in plan or "broadcast" in plan.lower()


def test_synth_lang_warc_prose_is_deterministic():
    from danae_spark.multimodal.warc import iter_warc_responses

    lang3, prose3 = lang_page_prose(3)
    assert lang3 == "de"  # sorted 25-language rotation: index 3
    assert prose3.endswith(" refd")  # salt: '3' -> 'd'
    caps = list(iter_warc_responses(synth_lang_warc(3)))
    assert len(caps) == 3  # prose + junk + mirror (3 % 10 == 3)
    assert prose3.encode("utf-8") in caps[0][3]  # body carries the prose
    assert caps[0][3] == caps[2][3]  # mirror is byte-identical
    caps2 = list(iter_warc_responses(synth_lang_warc(4)))
    assert len(caps2) == 2  # no mirror
