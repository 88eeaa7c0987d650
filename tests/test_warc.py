"""WARC record walk (multimodal/warc.py): grammar validation, the
gzip member-per-record convention, HTTP payload parse, the census and
crawl-pipeline oracles."""

import os
import zlib

import duckdb

from danae_spark.multimodal.htmltext import expected_html_row, synth_html
from danae_spark.multimodal.warc import (
    CRAWL_HTML_ORACLE,
    WARC_CENSUS_ORACLE,
    iter_warc_responses,
    n_pages,
    page_status,
    parse_warc,
    synth_warc,
    warc_census_frame,
)


def _one_record(body: bytes = b"hello", **overrides) -> bytes:
    headers = {
        "WARC-Type": "resource",
        "WARC-Record-ID": "<urn:uuid:00000000-0000-4000-8000-000000000001>",
        "WARC-Date": "2026-08-15T00:00:00Z",
        "Content-Length": str(len(body)),
    }
    headers.update(overrides)
    head = "WARC/1.1\r\n" + "".join(
        f"{k}: {v}\r\n" for k, v in headers.items() if v is not None
    ) + "\r\n"
    return head.encode() + body + b"\r\n\r\n"


def test_roundtrip_grid():
    for d in range(100):
        c = parse_warc(synth_warc(d))
        assert c is not None, d
        assert c["is_gzip"] == (d % 2 == 1), d
        assert c["n_records"] == 1 + 2 * n_pages(d), d
        assert c["n_warcinfo"] == 1 and c["n_resource"] == 0, d
        assert c["n_request"] == c["n_response"] == n_pages(d), d
        assert c["n_http_ok"] == sum(
            1 for p in range(n_pages(d)) if page_status(d, p) == 200
        ), d
        assert c["first_uri"] == f"http://site{d % 5}.example/p0", d
        assert c["host"] == f"site{d % 5}.example", d


def _wire_200(html: bytes, enc: int) -> bytes:
    """Independent restatement of the synthesizer's 200-response wire
    message (identity / chunked / gzip / gzip-in-chunked), so the
    total_content_bytes pin is not circular with synth_warc."""
    head = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\nServer: synth\r\n"
    body = html
    if enc in (2, 3):
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        body = c.compress(body) + c.flush()
        head += b"Content-Encoding: gzip\r\n"
    if enc in (1, 3):
        framed = bytearray()
        for i in range(0, len(body), 512):
            piece = body[i : i + 512]
            ext = b";synth=1" if i == 0 else b""
            framed += f"{len(piece):x}".encode() + ext + b"\r\n" + piece + b"\r\n"
        framed += b"0\r\n\r\n"
        body = bytes(framed)
        head += b"Transfer-Encoding: chunked\r\n"
    return head + b"\r\n" + body


def test_total_content_bytes_pinned():
    """total_content_bytes (excluded from the SQL oracle — it would
    require restating raw HTML byte lengths) is pinned against the
    synthesizer's own record bodies here; it counts WIRE bytes, i.e.
    the chunk framing / gzip bytes, not the decoded payload."""
    for d in (0, 1, 5, 8, 13):
        c = parse_warc(synth_warc(d))
        want = len(b"software: danae-spark/1.0\r\nformat: WARC File Format 1.1\r\n")
        host = f"site{d % 5}.example"
        for p in range(n_pages(d)):
            want += len(f"GET /p{p} HTTP/1.1\r\nHost: {host}\r\n\r\n")
            if page_status(d, p) == 200:
                want += len(_wire_200(synth_html(d * 4 + p), (d + p) % 4))
            else:
                want += len(
                    f"HTTP/1.1 301 Moved Permanently\r\nLocation: http://{host}/p{p}v2\r\n"
                    f"Content-Type: text/plain\r\n\r\nmoved\r\n"
                )
        assert c["total_content_bytes"] == want, d


def test_record_grammar_rejections():
    ok = _one_record()
    assert parse_warc(ok) is not None
    # bad version line
    assert parse_warc(ok.replace(b"WARC/1.1", b"WARC/2.0")) is None
    # missing each mandatory header
    for k in ("WARC-Type", "WARC-Record-ID", "WARC-Date", "Content-Length"):
        assert parse_warc(_one_record(**{k: None})) is None, k
    # unknown record type
    assert parse_warc(_one_record(**{"WARC-Type": "mystery"})) is None
    # record id must be a <uri>
    assert parse_warc(_one_record(**{"WARC-Record-ID": "urn:uuid:x"})) is None
    # date must be the spec's UTC-seconds form
    assert parse_warc(_one_record(**{"WARC-Date": "2026-08-15 00:00:00"})) is None
    # content-length must match the bytes present
    assert parse_warc(_one_record(**{"Content-Length": "3"})) is None
    # folded (LWS-continuation) header is a declared reject
    folded = ok.replace(b"WARC-Date:", b"X: a\r\n b\r\nWARC-Date:")
    assert parse_warc(folded) is None
    # missing record terminator
    assert parse_warc(ok[:-2]) is None
    # trailing garbage after the last record
    assert parse_warc(ok + b"junk") is None
    assert parse_warc(b"") is None


def test_gzip_member_alignment():
    rec = _one_record()

    def gz(raw: bytes) -> bytes:
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        return c.compress(raw) + c.flush()

    assert parse_warc(gz(rec))["n_records"] == 1
    two = gz(rec) + gz(rec)
    assert parse_warc(two)["n_records"] == 2
    # two records inside ONE member violate the splittability convention
    assert parse_warc(gz(rec + rec)) is None
    # truncated member
    assert parse_warc(gz(rec)[:-4]) is None
    # trailing garbage after the last member
    assert parse_warc(gz(rec) + b"\x1f\x8bxx") is None


def test_http_response_parse():
    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>x</p>"
    rec = _one_record(body, **{"WARC-Type": "response"})
    c = parse_warc(rec)
    assert c["n_response"] == 1 and c["n_http_ok"] == 1
    # 301 is not ok
    rec = _one_record(
        b"HTTP/1.1 301 Moved\r\nLocation: /x\r\n\r\n", **{"WARC-Type": "response"}
    )
    assert parse_warc(rec)["n_http_ok"] == 0
    # malformed status line rejects the file whole
    rec = _one_record(b"NOT HTTP\r\n\r\n", **{"WARC-Type": "response"})
    assert parse_warc(rec) is None


def _resp_record(head: bytes, body: bytes) -> bytes:
    return _one_record(head + b"\r\n" + body, **{"WARC-Type": "response"})


def test_http_payload_decodings():
    """Chunked / gzip / deflate(wrapped & raw) / gzip-in-chunked wires
    all decode back to the original page bytes."""
    from danae_spark.multimodal.warc import encode_200_response

    html = b"<html><body>" + b"<p>hello crawl</p>" * 80 + b"</body></html>"
    cases = [encode_200_response(html, enc) for enc in range(4)]
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw_deflate = co.compress(html) + co.flush()
    cases.append(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Encoding: deflate\r\n\r\n"
        + zlib.compress(html)
    )
    cases.append(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Encoding: deflate\r\n\r\n"
        + raw_deflate
    )
    for wire in cases:
        pages = list(iter_warc_responses(_one_record(wire, **{"WARC-Type": "response"})))
        assert len(pages) == 1 and pages[0][3] == html, wire[:80]


def test_http_payload_decode_rejects():
    """Malformed chunk framing, corrupt gzip, and unknown codings all
    reject the file WHOLE — never raw passthrough (the silent-pollution
    hazard this decode layer exists to prevent)."""
    head_ch = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nTransfer-Encoding: chunked\r\n\r\n"
    good = head_ch + b"5\r\nhello\r\n0\r\n\r\n"
    assert parse_warc(_one_record(good, **{"WARC-Type": "response"})) is not None
    bad_wires = [
        head_ch + b"zz\r\nhello\r\n0\r\n\r\n",          # non-hex size
        head_ch + b"9\r\nhello\r\n0\r\n\r\n",           # truncated chunk
        head_ch + b"5\r\nhelloXX0\r\n\r\n",             # missing chunk CRLF
        head_ch + b"5\r\nhello\r\n",                    # missing 0-chunk
        head_ch + b"5\r\nhello\r\n0\r\n\r\njunk",       # bytes after terminator
        head_ch + b"5\r\nhello\r\n0\r\nnot a header\r\n\r\n",  # bad trailer
        # corrupt gzip content-encoding
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n\x1f\x8bbroken",
        # unknown content coding: br must reject, not pass raw
        b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\ndata",
        # unsupported transfer coding
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip\r\n\r\ndata",
        # identity BEFORE chunked is fine (tested below) but chunked
        # not-outermost rejects
        # chunked not outermost
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked, gzip\r\n\r\n5\r\nhello\r\n0\r\n\r\n",
    ]
    for wire in bad_wires:
        rec = _one_record(wire, **{"WARC-Type": "response"})
        assert parse_warc(rec) is None, wire[:60]
        assert list(iter_warc_responses(rec)) == [], wire[:60]
    # a bare "identity" transfer coding is a no-op, not a reject
    ident = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: identity\r\n\r\nplain body"
    pages = list(iter_warc_responses(_one_record(ident, **{"WARC-Type": "response"})))
    assert pages and pages[0][3] == b"plain body"
    # and "identity, chunked" de-chunks
    both = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: identity, chunked\r\n\r\n"
        b"5\r\nhello\r\n0\r\n\r\n"
    )
    pages = list(iter_warc_responses(_one_record(both, **{"WARC-Type": "response"})))
    assert pages and pages[0][3] == b"hello"


def test_iter_warc_responses_feeds_html():
    d = 3
    pages = list(iter_warc_responses(synth_warc(d)))
    assert len(pages) == n_pages(d)
    from danae_spark.multimodal.htmltext import parse_html_text

    for p, (uri, status, ctype, body) in enumerate(pages):
        assert uri == f"http://site{d % 5}.example/p{p}"
        assert status == page_status(d, p)
        if status == 200:
            assert ctype.startswith("text/html")
            assert parse_html_text(body) == expected_html_row(d * 4 + p)
    # invalid file yields nothing
    assert list(iter_warc_responses(b"garbage")) == []


def test_frame_nulls_and_id_col(spark):
    df = spark.createDataFrame(
        [(1, bytearray(synth_warc(1))), (2, bytearray(b"WARC/9")), (3, None)],
        "media_id long, blob binary",
    )
    out = {
        r["media_id"]: r
        for r in warc_census_frame(df, id_col="media_id", payload_col="blob").collect()
    }
    assert out[1]["n_records"] == 1 + 2 * n_pages(1)
    assert out[2]["n_records"] is None and out[3]["n_records"] is None


def _duck_view(sf_dir):
    from danae_spark.catalog import table_path

    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    return con


def test_census_oracle_matches_duckdb(spark, sf_dir):
    from danae_spark.queries import load_all

    fn = load_all()["warc_census"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck_view(sf_dir).execute(WARC_CENSUS_ORACLE).fetchall()]
    assert len(got) == len(want) and got == want


def test_crawl_pipeline_oracle_matches_duckdb(spark, sf_dir):
    from danae_spark.queries import load_all

    fn = load_all()["crawl_html_extract"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck_view(sf_dir).execute(CRAWL_HTML_ORACLE).fetchall()]
    assert len(got) == len(want) and got == want


def test_crawl_curate_provenance_and_oracle(spark, sf_dir):
    """The crawl->corpus composition: provenance survives the pipeline
    (every crawled 200-page appears exactly once with its source doc
    and canonical URL), verdicts compose, and the whole frame matches
    the DuckDB oracle."""
    from danae_spark.catalog import table_path
    from danae_spark.multimodal.warc import _crawl_curate_oracle
    from danae_spark.queries import load_all

    fn = load_all()["crawl_curate"].fn
    rows = fn(spark, sf_dir).collect()
    # one row per 200 html page, keyed by page_id = doc_id*4 + p
    from danae_spark.multimodal.warc import _MIRROR_OFF

    seen = set()
    for r in rows:
        assert r["page_id"] not in seen
        seen.add(r["page_id"])
        d = r["doc_id"]
        mirrored = r["page_id"] >= _MIRROR_OFF
        p = r["page_id"] - (_MIRROR_OFF if mirrored else 0) - d * 4
        assert 0 <= p < n_pages(d) and page_status(d, p) == 200
        if mirrored:
            assert d % 10 == 3
            assert r["url"] == f"http://m.site{d % 5}.example/p{p}"
        else:
            assert r["url"] == f"http://site{d % 5}.example/p{p}"  # canonicalized
        # mirror subdomain shares the registrable domain (cap bucket)
        assert r["domain"] == f"site{d % 5}.example"
        # final keep is the conjunction of the three verdicts
        assert r["keep"] == int(
            r["is_keeper"] == 1 and r["quality_keep"] == 1 and r["cap_kept"] == 1
        )
        assert r["n_dup"] >= 1
    # keepers partition the page set into clusters: each cluster has
    # exactly one keeper carrying the cluster's size
    assert sum(r["n_dup"] for r in rows if r["is_keeper"] == 1) == len(rows)
    # full-frame oracle agreement
    p_ = table_path(sf_dir, "documents")
    glob = f"{p_}/*.parquet" if os.path.isdir(p_) else p_
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(_crawl_curate_oracle()).fetchall()]
    assert [tuple(r) for r in rows] == want


def test_wet_sidecar():
    """WET (conversion-record) walk: text equals the pure-arithmetic
    page text, empty WETs yield nothing, bad UTF-8 rejects, and the
    harvest dispatcher routes conversion-only WARCs as 'wet'."""
    from danae_spark.multimodal.harvest import harvest_text
    from danae_spark.multimodal.warc import iter_wet_texts, synth_wet

    for d in range(40):
        got = list(iter_wet_texts(synth_wet(d)))
        want = [
            (f"http://site{d % 5}.example/p{p}", expected_html_row(d * 4 + p)["text"])
            for p in range(n_pages(d))
            if page_status(d, p) == 200
        ]
        assert got == want, d
        h = harvest_text(synth_wet(d))
        if not want:
            assert h is None, d  # a WET with no text yields nothing
            continue
        assert h["doc_class"] == "warc", d
        assert h["format"] == ("wet.gz" if d % 2 == 1 else "wet"), d
        assert h["text"] == "\n".join(t for _u, t in want), d
    # a conversion block that is not UTF-8 ends the walk (reject)
    rec = _one_record(b"\xff\xfe\xfa", **{"WARC-Type": "conversion"})
    assert list(iter_wet_texts(rec)) == []
    # response records are NOT conversion records: a normal crawl WARC
    # yields no WET texts
    assert list(iter_wet_texts(synth_warc(1))) == []


def test_wet_oracle_matches_duckdb(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.multimodal.warc import WET_TEXT_ORACLE
    from danae_spark.queries import load_all

    fn = load_all()["wet_text_extract"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p_ = table_path(sf_dir, "documents")
    glob = f"{p_}/*.parquet" if os.path.isdir(p_) else p_
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(WET_TEXT_ORACLE).fetchall()]
    assert len(got) == len(want) and got == want


def test_wat_sidecar():
    """WAT (metadata-record JSON Envelope) walk: titles/links match the
    page-extraction arithmetic, redirects yield the no-HTML shape,
    malformed JSON / missing Envelope reject whole."""
    from danae_spark.multimodal.htmltext import expected_html_row
    from danae_spark.multimodal.warc import iter_wat_pages, synth_wat

    for d in range(40):
        got = list(iter_wat_pages(synth_wat(d)))
        assert len(got) == n_pages(d), d
        for p, (uri, title, links) in enumerate(got):
            e = d * 4 + p
            assert uri == f"http://site{d % 5}.example/p{p}", (d, p)
            if page_status(d, p) == 200:
                assert title == f"Doc {e} t{e % 10}", (d, p)
                # the sidecar's link count matches the html extraction
                assert len(links) == expected_html_row(e)["n_links"], (d, p)
            else:
                assert title is None and links == [], (d, p)
    # malformed JSON in a metadata record ends the walk (reject)
    rec = _one_record(b"{not json", **{"WARC-Type": "metadata"})
    assert list(iter_wat_pages(rec)) == []
    # valid JSON without the Envelope root also rejects
    rec = _one_record(b'{"x": 1}', **{"WARC-Type": "metadata"})
    assert list(iter_wat_pages(rec)) == []
    # non-metadata records yield nothing
    assert list(iter_wat_pages(synth_warc(1))) == []


def test_wat_oracle_matches_duckdb(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.multimodal.warc import WAT_CENSUS_ORACLE
    from danae_spark.queries import load_all

    fn = load_all()["wat_census"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p_ = table_path(sf_dir, "documents")
    glob = f"{p_}/*.parquet" if os.path.isdir(p_) else p_
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(WAT_CENSUS_ORACLE).fetchall()]
    assert len(got) == len(want) and got == want


def test_crawl_report_consistency(spark, sf_dir):
    """The one-row report equals direct aggregation of the row-level
    crawl_curate verdicts (no independent computation to drift)."""
    from danae_spark.multimodal.warc import (
        crawl_curate_roundtrip,
        crawl_report_roundtrip,
    )

    rows = crawl_curate_roundtrip(spark, sf_dir).collect()
    rep = crawl_report_roundtrip(spark, sf_dir).collect()[0]
    assert rep["n_pages"] == len(rows)
    assert rep["n_domains"] == len({r["domain"] for r in rows})
    assert rep["n_in_dup_cluster"] == sum(1 for r in rows if r["n_dup"] > 1)
    assert rep["n_keepers"] == sum(r["is_keeper"] for r in rows)
    assert rep["n_quality_pass"] == sum(r["quality_keep"] for r in rows)
    assert rep["n_cap_survivors"] == sum(r["cap_kept"] for r in rows)
    assert rep["n_kept"] == sum(r["keep"] for r in rows)
    assert abs(rep["keep_rate"] - rep["n_kept"] / rep["n_pages"]) < 1e-6
