"""Round-14 certification of the two-phase exact-dup keeper (the r12
directive's 'done' criteria that r13 skipped) plus the r13 ADVICE
fixes: NULL-key exact_dedup, string-id rank path, structural-char
utf-16 gate."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from danae_spark.operators.dedup import exact_dedup, exact_dup_keeper


# ------------------------------------------------- mega-cluster (scale shape)


def test_mega_cluster_completes_and_keeps_min_id(spark):
    """>=1e5 IDENTICAL texts (the degenerate soft-404 cluster that
    motivated the two-phase plan) plus a handful of singletons: the
    keeper must complete without a hot-partition window and pick the
    smallest id of the mega-cluster."""
    n = 100_000
    mega = spark.range(n).select(
        F.col("id").alias("page_id"),
        (F.col("id") % 7).alias("doc_id"),
        F.lit("404 not found the page you requested does not exist").alias("text"),
    )
    singles = spark.range(n, n + 5).select(
        F.col("id").alias("page_id"),
        F.lit(99).alias("doc_id"),
        F.concat(F.lit("unique page "), F.col("id").cast("string")).alias("text"),
    )
    out = exact_dup_keeper(mega.unionByName(singles))
    agg = out.groupBy("n_dup").agg(
        F.count("*").alias("rows"),
        F.sum("is_keeper").alias("keepers"),
        F.min(F.when(F.col("is_keeper") == 1, F.col("page_id"))).alias("min_keeper"),
    )
    by_size = {r["n_dup"]: r for r in agg.collect()}
    assert by_size[n]["rows"] == n
    assert by_size[n]["keepers"] == 1
    assert by_size[n]["min_keeper"] == 0  # smallest page_id keeps
    assert by_size[1]["rows"] == 5 and by_size[1]["keepers"] == 5


def test_mega_cluster_rank_variant_keeps_highest_rank(spark):
    """Same mega-cluster with a rank column where ONE member carries a
    higher rank: the rank-weighted keeper must pick it (not the
    smallest id), ties elsewhere by smallest id."""
    n = 100_000
    df = spark.range(n).select(
        F.col("id").alias("page_id"),
        F.lit("dup body").alias("text"),
        F.when(F.col("id") == 31337, F.lit(9.5)).otherwise(F.lit(0.1)).alias("rank"),
    )
    out = exact_dup_keeper(df, rank_col="rank")
    keepers = out.filter(F.col("is_keeper") == 1).collect()
    assert len(keepers) == 1
    assert keepers[0]["page_id"] == 31337
    assert keepers[0]["n_dup"] == n


# ------------------------------------------- plan audit: no window over hash


def _curate_plans(spark, sf_dir):
    from danae_spark.multimodal.warc import (
        crawl_curate_boiler_roundtrip,
        crawl_curate_ranked_roundtrip,
        crawl_curate_roundtrip,
        crawl_report_roundtrip,
    )

    for fn in (
        crawl_curate_roundtrip,
        crawl_curate_ranked_roundtrip,
        crawl_curate_boiler_roundtrip,
        crawl_report_roundtrip,
    ):
        df = fn(spark, sf_dir)
        yield fn.__name__, df._jdf.queryExecution().optimizedPlan().toString()


def test_curate_family_has_no_window_over_text_hash(spark, sf_dir):
    """The r12 directive's plan audit: no Window.partitionBy over a
    text hash may remain anywhere in the curate family — dup counting
    and keeper selection must be the two-phase groupBy+join. Windows
    over other keys (the per-domain cap) are allowed; any window spec
    mentioning xxhash64 is the banned plan."""
    for name, plan in _curate_plans(spark, sf_dir):
        for line in plan.splitlines():
            low = line.lower()
            if "windowspecdefinition" in low or "window [" in low.replace("+- ", ""):
                assert "xxhash64" not in low, f"{name}: window over text hash:\n{line}"
        assert "xxhash64" in plan.lower(), f"{name}: keeper hash missing entirely"


def test_keeper_plan_is_two_phase_aggregate(spark):
    """The keeper's own plan: an Aggregate over the hash plus a join —
    and NO Window operator at all."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "page_id int, text string"
    )
    plan = exact_dup_keeper(df)._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" in plan and "Join" in plan
    assert "Window" not in plan


# --------------------------------------------------- ADVICE: NULL-key dedup


def test_exact_dedup_null_keys_group_together(spark):
    """ADVICE r13: the groupBy+join rewrite must not drop NULL-key rows
    — NULL keys form one group (matching the old window semantics and
    DEDUP_EXACT_ORACLE), joined back null-safely."""
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="same"),
            Row(doc_id=2, text="same"),
            Row(doc_id=3, text=None),
            Row(doc_id=4, text=None),
        ]
    )
    out = exact_dedup(df, "doc_id", F.col("text")).collect()
    assert len(out) == 4  # nothing dropped
    rows = {r["doc_id"]: r for r in out}
    assert rows[3]["canonical_id"] == 3 and rows[3]["group_size"] == 2
    assert rows[4]["canonical_id"] == 3 and rows[4]["is_duplicate"] == 1
    assert rows[2]["canonical_id"] == 1 and rows[2]["is_duplicate"] == 1


def test_exact_dup_keeper_string_ids_with_rank(spark):
    """ADVICE r13: the rank path must accept non-numeric ids (the
    docstring's 'any (id, text[, rank]) frame'). Highest rank keeps;
    rank ties break on the id's native (string) ordering."""
    df = spark.createDataFrame(
        [
            ("url-b", "dup", 2.0),
            ("url-a", "dup", 1.0),
            ("url-c", "dup", 2.0),
            ("url-z", "solo", 0.5),
        ],
        "page_id string, text string, rank double",
    )
    out = {r["page_id"]: r for r in exact_dup_keeper(df, rank_col="rank").collect()}
    assert out["url-b"]["is_keeper"] == 1  # rank 2.0, tie vs url-c -> smaller id
    assert out["url-c"]["is_keeper"] == 0
    assert out["url-a"]["is_keeper"] == 0 and out["url-a"]["n_dup"] == 3
    assert out["url-z"]["is_keeper"] == 1 and out["url-z"]["n_dup"] == 1


# ------------------------------------------- ADVICE: utf-16 structural gate


def test_utf16_gate_accepts_hangul_heavy_page():
    """ADVICE r13: a genuine BOM-less UTF-16LE page whose prose is
    dominated by U+xx00 code points (Hangul syllable block) must
    decode — the structural '<' chars are genuine U+003C."""
    from danae_spark.multimodal.htmltext import _decode_page

    html = "<html><body><p>" + "가" * 600 + "</p></body></html>"
    text = _decode_page(html.encode("utf-16-le"), header_charset="utf-16le")
    assert text is not None and "가가가" in text


def test_utf16_gate_rejects_swapped_cjk_dense_page():
    """The converse miss the old global-count gate had: a swapped page
    that decodes to CJK-dense garbage (markup alone under the old 1/3
    plurality) must still reject — its '<' chars are all U+3C00."""
    from danae_spark.multimodal.htmltext import _decode_page

    prose = "The quick brown fox jumps over the lazy dog. " * 40
    html = "<html><body><p>" + prose + "</p></body></html>"
    be_bytes = html.encode("utf-16-be")  # server lied: labeled LE
    assert _decode_page(be_bytes, header_charset="utf-16le") is None


# ------------------------------------ process guard: every entry plan-builds


def test_every_registered_entry_builds_a_plan(spark, sf_dir):
    """The r13 failure mode (a NameError surfacing only in the
    driver's bench) must die in seconds, not rounds: call every
    registered entry's fn at sf0.001 and require a DataFrame back.
    Plan build is lazy, so this is cheap — but any unimported symbol,
    bad column reference, or analysis error in ANY entry fails here."""
    from danae_spark.queries import load_all

    failures = []
    for name, qd in load_all().items():
        try:
            df = qd.fn(spark, sf_dir)
            assert df is not None and hasattr(df, "schema")
            _ = df.schema  # force analysis
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "entries failed to plan-build:\n" + "\n".join(failures)
