"""CDX/CDXJ sidecars (r14): grammar, SURT, addressing proof, and
census agreement."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from danae_spark.multimodal.cdx import (
    _record_at,
    _record_spans,
    parse_cdxj,
    surt_key,
    synth_cdx,
)
from danae_spark.multimodal.warc import synth_warc


def test_surt_key_forms():
    assert surt_key("http://www.example.com/a/b") == "com,example,www)/a/b"
    assert surt_key("HTTPS://Site2.EXAMPLE:8080/p1") == "example,site2)/p1"
    assert surt_key("http://host.example") == "example,host)/"
    assert surt_key("ftp://x.example/a") is None


def test_offsets_genuinely_address_records_both_compressions():
    """The core property: for plain AND member-gzipped WARCs, slicing
    at every CDX (offset, length) parses as a standalone record whose
    URI matches the line."""
    for d in (2, 3):  # even: plain, odd: .warc.gz
        payload = synth_warc(d)
        lines = parse_cdxj(synth_cdx(d))
        assert lines
        for ln in lines:
            rec = _record_at(payload, ln["offset"], ln["length"])
            assert rec is not None and rec["uri"] == ln["url"], ln
        # spans tile the file exactly
        spans = _record_spans(payload)
        assert spans[0][0] == 0
        assert spans[-1][0] + spans[-1][1] == len(payload)


def test_parse_cdxj_reject_whole():
    good = synth_cdx(5)
    assert parse_cdxj(good) is not None
    # non-14-digit timestamp
    bad_ts = good.replace(b" 20260815000000 ", b" 2026081500000 ", 1)
    assert parse_cdxj(bad_ts) is None
    # broken JSON
    assert parse_cdxj(good.replace(b'{"', b'{X"', 1)) is None
    # a missing required key
    lines = good.decode().splitlines()
    surt, ts, block = lines[0].split(" ", 2)
    d = json.loads(block)
    d.pop("offset")
    lines[0] = f"{surt} {ts} {json.dumps(d)}"
    assert parse_cdxj(("\n".join(lines)).encode()) is None
    # negative / non-numeric offset
    d2 = json.loads(block)
    d2["offset"] = "-3"
    lines[0] = f"{surt} {ts} {json.dumps(d2)}"
    assert parse_cdxj(("\n".join(lines)).encode()) is None


def test_cdx_agrees_with_warc_census(spark, sf_dir):
    """Fetch planning without reading archives must agree with the
    census that DID read them: per doc, n_lines == the census's
    n_response count."""
    from danae_spark.multimodal.cdx import cdx_fetch_plan_roundtrip
    from danae_spark.multimodal.warc import warc_census_roundtrip

    plan = cdx_fetch_plan_roundtrip(spark, sf_dir).select("doc_id", "n_lines")
    census = warc_census_roundtrip(spark, sf_dir).select("doc_id", "n_response")
    disagree = plan.join(census, "doc_id").filter(
        F.col("n_lines") != F.col("n_response")
    )
    assert disagree.count() == 0
    assert plan.count() > 0
