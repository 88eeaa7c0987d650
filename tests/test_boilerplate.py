"""Block-level boilerplate classification (r12): the per-block keep
rule, the planted-boilerplate grid, the frame API mode, and the
end-to-end property that dedup fires only BECAUSE stripping worked."""

from __future__ import annotations

from danae_spark.multimodal.htmltext import (
    expected_boiler_row,
    html_text_frame,
    is_boilerplate_block,
    parse_html_text,
    synth_boiler_html,
)


def test_block_rule_units():
    # link farm: anchors cover everything
    assert is_boilerplate_block("z1 z2 z3 z4 z5 z6", 17)
    # short linky stub
    assert is_boilerplate_block("read more", 9)
    # prose with one inline anchor stays
    assert not is_boilerplate_block("a long paragraph with one small link inside", 4)
    # anchor-free short block stays (headings, list items)
    assert not is_boilerplate_block("item k3", 0)
    # exactly half anchored stays when long enough (rule is MORE than half)
    assert not is_boilerplate_block("aa bb cc dd ee", 7)
    # ...but a SHORT half-anchored block is still a linky stub
    assert is_boilerplate_block("ab cd", 2)


def test_grid_parity():
    for d in range(80):
        got = parse_html_text(synth_boiler_html(d), drop_boilerplate=True)
        want = expected_boiler_row(d)
        assert {k: got[k] for k in want} == want, d


def test_without_flag_farm_text_ships():
    got = parse_html_text(synth_boiler_html(5))
    assert "z" in got["text"] and "more m" in got["text"]
    assert "n_blocks_kept" not in got  # flag-off dict shape unchanged


def test_mirror_converges_only_after_stripping():
    for d in (3, 13, 23):
        raw_main = parse_html_text(synth_boiler_html(d))["text"]
        raw_mirror = parse_html_text(synth_boiler_html(d, mirror=True))["text"]
        assert raw_main != raw_mirror  # different farm words
        s_main = parse_html_text(synth_boiler_html(d), drop_boilerplate=True)["text"]
        s_mirror = parse_html_text(
            synth_boiler_html(d, mirror=True), drop_boilerplate=True
        )["text"]
        assert s_main == s_mirror  # identical prose after the block rule


def test_frame_mode(spark):
    rows = [(d, bytearray(synth_boiler_html(d))) for d in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in html_text_frame(df, drop_boilerplate=True).collect()
    }
    for d in range(6):
        want = expected_boiler_row(d)
        assert got[d]["text"] == want["text"]
        assert got[d]["n_blocks_dropped"] == 2
    # flag-off schema has no block columns
    off = html_text_frame(df).columns
    assert "n_blocks_kept" not in off


def test_curate_boiler_dedup_matches_python_oracle(spark, sf_dir):
    """Full independent expectation: rebuild every capture's STRIPPED
    text in Python, cluster by it (mirrors converge; distinct docs
    whose prose arithmetic collides — d and d+300 share word cycles —
    also cluster, exactly as the SQL oracle states), and compare n_dup
    / is_keeper row by row. The mirror pairs cluster IFF stripping
    worked: their raw bytes differ."""
    from danae_spark.multimodal.warc import crawl_curate_boiler_roundtrip

    rows = crawl_curate_boiler_roundtrip(spark, sf_dir).collect()
    doc_ids = sorted({r["doc_id"] for r in rows})
    captures = {}  # page_id -> stripped text
    for d in doc_ids:
        captures[d * 2] = expected_boiler_row(d)["text"]
        if d % 10 == 3:
            captures[d * 2 + 1] = expected_boiler_row(d)["text"]
    clusters: dict[str, list[int]] = {}
    for pid, text in captures.items():
        clusters.setdefault(text, []).append(pid)
    want_dup = {pid: len(clusters[t]) for pid, t in captures.items()}
    want_keeper = {pid: int(pid == min(clusters[t])) for pid, t in captures.items()}
    assert {r["page_id"] for r in rows} == set(captures)
    for r in rows:
        assert r["n_dup"] == want_dup[r["page_id"]], r
        assert r["is_keeper"] == want_keeper[r["page_id"]], r
    # mirrors exist and clustered despite different raw bytes
    mirrored = [d for d in doc_ids if d % 10 == 3]
    assert mirrored
    for d in mirrored:
        assert want_dup[d * 2] >= 2
        raw_main = parse_html_text(synth_boiler_html(d))["text"]
        raw_mirror = parse_html_text(synth_boiler_html(d, mirror=True))["text"]
        assert raw_main != raw_mirror


# ------------------------------------ rank-weighted curation (r12)


def test_ranked_curate_keeps_high_rank_member(spark, sf_dir):
    """The rank-weighted keeper: within every duplicate cluster the
    member with the highest source rank keeps — and for at least one
    cluster that differs from the page_id-order keeper, so the rank
    genuinely decides."""
    from danae_spark.multimodal.warc import crawl_curate_ranked_roundtrip

    rows = crawl_curate_ranked_roundtrip(spark, sf_dir).collect()
    # group rows into clusters: same n_dup isn't enough — rebuild the
    # cluster key from the synthetic page text arithmetic
    from danae_spark.multimodal.htmltext import expected_html_row
    from danae_spark.multimodal.warc import _MIRROR_OFF

    def page_text(page_id: int) -> str:
        e = page_id % _MIRROR_OFF
        return expected_html_row(e)["text"]

    clusters: dict[str, list] = {}
    for r in rows:
        clusters.setdefault(page_text(r["page_id"]), []).append(r)
    multi = [rs for rs in clusters.values() if len(rs) > 1]
    assert multi, "grid must contain duplicate clusters"
    rank_decided = 0
    for rs in multi:
        assert sum(r["is_keeper"] for r in rs) == 1
        keeper = next(r for r in rs if r["is_keeper"] == 1)
        best = max(rs, key=lambda r: (r["rank"], -r["page_id"]))
        assert keeper["page_id"] == best["page_id"], rs
        if keeper["page_id"] != min(r["page_id"] for r in rs):
            rank_decided += 1
    assert rank_decided >= 1, "rank never overrode the arrival order"
    # singleton clusters keep themselves
    for rs in clusters.values():
        if len(rs) == 1:
            assert rs[0]["is_keeper"] == 1 and rs[0]["n_dup"] == 1


def test_harvest_boilerplate_flag():
    """drop_boilerplate threads through every HTML leg of the harvest
    dispatcher: direct pages, WARC captures, archive members."""
    from danae_spark.multimodal.harvest import harvest_text
    from danae_spark.multimodal.warc import synth_boiler_warc

    page = bytes(synth_boiler_html(5))
    assert "z" in harvest_text(page)["text"]
    stripped = harvest_text(page, drop_boilerplate=True)
    assert stripped["text"] == expected_boiler_row(5)["text"]
    # WARC route
    w = synth_boiler_warc(6)
    full = harvest_text(w)["text"]
    strip = harvest_text(w, drop_boilerplate=True)["text"]
    assert "z" in full and strip == expected_boiler_row(6)["text"]


def test_boiler_ranked_rank_decides_real_keeps(spark, sf_dir):
    """The r14 boiler x ranked composition: mirror clusters form only
    post-strip (n_dup == 3 when the syndicated copy survives the rank
    join), and in at least one cluster the keeper is NOT the smallest
    page_id — proof the rank genuinely decided, not the id tiebreak."""
    from danae_spark.multimodal.warc import (
        _MIRROR_OFF,
        crawl_curate_boiler_ranked_roundtrip,
    )
    from pyspark.sql import functions as F

    out = crawl_curate_boiler_ranked_roundtrip(spark, sf_dir).persist()
    clusters = out.filter(F.col("n_dup") == 3)
    assert clusters.count() > 0
    assert clusters.filter(F.col("is_keeper") == 1).count() == clusters.count() / 3
    # rank must beat the id tiebreak somewhere: a keeper that is the
    # syndicated copy (page_id offset) or the mirror
    rank_won = clusters.filter(
        (F.col("is_keeper") == 1) & (F.col("page_id") % (2 * _MIRROR_OFF) >= _MIRROR_OFF)
    )
    assert rank_won.count() > 0, "rank never beat the smallest-id tiebreak"
    # keeper always carries the cluster's max rank (cluster id = the
    # source doc d: main 2d, mirror 2d+1, syndicated 2d + offset all
    # floor-div to d after the offset is stripped)
    w = clusters.groupBy(
        F.floor((F.col("page_id") % _MIRROR_OFF) / 2).alias("c")
    ).agg(
        F.count("*").alias("n"),
        F.max("rank").alias("maxr"),
        F.max(F.when(F.col("is_keeper") == 1, F.col("rank"))).alias("keepr"),
    )
    assert w.filter(F.col("n") != 3).count() == 0
    assert w.filter(
        F.col("keepr").isNull() | (F.col("maxr") != F.col("keepr"))
    ).count() == 0
    out.unpersist()
