"""Canonical-link dedup for curation (r14): the guard and clustering
semantics the oracle's value-hash can't articulate as intent."""

from __future__ import annotations

from pyspark.sql import functions as F

from danae_spark.multimodal.warc import crawl_curate_canonical_roundtrip


def test_canonical_clusters_byte_different_captures(spark, sf_dir):
    """The core claim: the utm-param and trailing-slash captures have
    DIFFERENT text bytes, yet cluster via the canonical target — the
    shape no text hash can catch. Keeper is the smaller page_id."""
    out = crawl_curate_canonical_roundtrip(spark, sf_dir).persist()
    variants = out.filter(F.col("page_id") % 8 <= 1)
    assert variants.filter(F.col("canonical_used") != 1).count() == 0
    assert variants.filter(F.col("n_dup") != 2).count() == 0
    alpha = variants.filter(F.col("page_id") % 8 == 0)
    beta = variants.filter(F.col("page_id") % 8 == 1)
    assert alpha.filter(F.col("is_keeper") != 1).count() == 0
    assert beta.filter(F.col("is_keeper") != 0).count() == 0
    out.unpersist()


def test_lying_canonical_is_refused_and_cannot_eject_the_keeper(spark, sf_dir):
    """A capture on evil*.example claiming canonical on site*.example
    must NOT join the genuine cluster: its registrable domain differs
    from the canonical's, so the guard routes it to the text-hash
    fallback — it stays a singleton keeper of its own text, and the
    genuine cluster still has exactly 2 members."""
    out = crawl_curate_canonical_roundtrip(spark, sf_dir).persist()
    liars = out.filter(F.col("url").startswith("http://evil"))
    assert liars.count() > 0
    assert liars.filter(F.col("canonical").isNull()).count() == 0  # extracted
    assert liars.filter(F.col("canonical_used") != 0).count() == 0  # refused
    assert liars.filter((F.col("n_dup") != 1) | (F.col("is_keeper") != 1)).count() == 0
    # and the genuine clusters were not ejected or inflated
    genuine = out.filter(F.col("page_id") % 8 <= 1)
    assert genuine.filter(F.col("n_dup") != 2).count() == 0
    out.unpersist()


def test_text_fallback_still_clusters_identical_twins(spark, sf_dir):
    """No-canonical byte-identical twins must still dedup through the
    text-hash fallback (the canonical key is an addition, not a
    replacement)."""
    out = crawl_curate_canonical_roundtrip(spark, sf_dir)
    twins = out.filter(F.col("url").rlike("/t[12]$")).persist()
    assert twins.count() > 0 and twins.count() % 2 == 0
    assert twins.filter(F.col("n_dup") != 2).count() == 0
    assert twins.filter(F.col("is_keeper") == 1).count() == twins.count() / 2
    twins.unpersist()


def test_registrable_domain_guard_edges(spark):
    """The guard helper itself: subdomains of the same registrable
    domain AGREE (an m.-mirror may claim canonical on the main host);
    public-suffix 2-label TLDs don't collapse; IPv4 and bare hosts
    pass through."""
    from danae_spark.operators.urlops import registrable_domain

    df = spark.createDataFrame(
        [
            ("http://m.site1.example/x", "http://site1.example/a", True),
            ("http://a.co.uk/x", "http://b.co.uk/a", False),
            ("http://sub.a.co.uk/x", "http://a.co.uk/a", True),
            ("http://127.0.0.1/x", "http://127.0.0.1/a", True),
            ("HTTPS://Site1.EXAMPLE:8080/x", "http://site1.example/a", True),
        ],
        "url string, canon string, want boolean",
    )
    got = df.select(
        "want",
        (registrable_domain("url") == registrable_domain("canon")).alias("got"),
    ).collect()
    for r in got:
        assert r["got"] == r["want"], r


def test_neardup_curation_catches_what_exact_misses(spark, sf_dir):
    """r14 fuzzy-dedup-in-curation: every mirror pair clusters through
    Jaccard (n_near == 1 on both sides, j_max >= tau) while the exact
    hash sees singletons (exact_n_dup == 1 everywhere); the main
    capture keeps, the mirror drops; non-mirrored docs are untouched
    keepers with zero near-neighbors (no cross-doc collisions at the
    threshold)."""
    from danae_spark.multimodal.warc import (
        NEARDUP_TAU,
        crawl_curate_neardup_roundtrip,
    )
    from pyspark.sql import functions as F

    out = crawl_curate_neardup_roundtrip(spark, sf_dir).persist()
    assert out.filter(F.col("exact_n_dup") != 1).count() == 0  # exact: blind
    mains = out.filter(F.col("page_id") % 2 == 0)
    mirrors = out.filter(F.col("page_id") % 2 == 1)
    assert mirrors.count() > 0
    assert mirrors.filter(
        (F.col("n_near") != 1) | (F.col("is_keeper") != 0)
        | (F.col("j_max") < NEARDUP_TAU)
    ).count() == 0
    mirrored_mains = mains.filter(F.col("doc_id") % 10 == 3)
    assert mirrored_mains.filter(
        (F.col("n_near") != 1) | (F.col("is_keeper") != 1)
    ).count() == 0
    solo = mains.filter(F.col("doc_id") % 10 != 3)
    assert solo.filter(
        (F.col("n_near") != 0) | (F.col("keep") != 1)
    ).count() == 0
    out.unpersist()
