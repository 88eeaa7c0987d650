"""HTML -> training-text extraction (multimodal/htmltext.py): the
scanner rules, the reject-whole contract, and the registered oracle."""

import os

import duckdb
import pytest

from danae_spark.multimodal.htmltext import (
    HTML_TEXT_ORACLE,
    expected_html_row,
    html_text_frame,
    parse_html_text,
    synth_html,
)


def test_roundtrip_grid():
    """Parser output == the pure-arithmetic expectation (the Python
    statement of what the SQL oracle states) over a wide doc grid."""
    for d in range(120):
        assert parse_html_text(synth_html(d)) == expected_html_row(d), d


def test_entities():
    got = parse_html_text(b"<p>a &amp; b &#65; &#x42; &nbsp;c</p>")
    assert got["text"] == "a & b A B c"
    # unrecognized named entity stays literal (browser behavior)
    assert parse_html_text(b"<p>&bogus; x</p>")["text"] == "&bogus; x"
    # surrogate / out-of-range numeric refs stay literal
    assert parse_html_text(b"<p>&#xD800; y</p>")["text"] == "&#xD800; y"


def test_rawtext_elements():
    page = b'<script>if (a < b) { s = "</div" + ">"; }</script><p>kept</p>'
    got = parse_html_text(page)
    assert got["text"] == "kept"
    assert parse_html_text(b"<style>h1 { color: red }</style><p>x</p>")["text"] == "x"
    # raw-text close tag is case-insensitive
    assert parse_html_text(b"<SCRIPT>var x=1;</ScRiPt><p>y</p>")["text"] == "y"
    # unterminated raw-text element rejects the page whole
    assert parse_html_text(b"<script>var x = 1;<p>z</p>") is None


def test_comments_and_doctype():
    assert parse_html_text(b"<!DOCTYPE html><!-- c --><p>t</p>")["text"] == "t"
    # a '>' inside the comment does not end it
    assert parse_html_text(b"<!-- a > b --><p>t</p>")["text"] == "t"
    assert parse_html_text(b"<!-- unterminated <p>t</p>") is None


def test_boilerplate_dropped():
    page = (
        b"<nav><a href='/'>home</a></nav><header><p>hdr</p></header>"
        b"<p>body text</p><aside>ad</aside><footer>foot</footer>"
    )
    got = parse_html_text(page)
    assert got["text"] == "body text"
    assert got["n_links"] == 1  # nav anchor still counted
    assert got["n_paragraphs"] == 1  # the dropped header <p> is not
    # stray close for a drop element rejects whole
    assert parse_html_text(b"<p>x</p></nav>") is None
    # unterminated drop element rejects whole
    assert parse_html_text(b"<nav><p>x</p>") is None


def test_head_and_title():
    page = b"<head><title>  A  Title </title><meta charset='utf-8'/>stray</head><p>b</p>"
    got = parse_html_text(page)
    assert got["title"] == "A Title"
    assert got["text"] == "b"  # head text (outside title) dropped
    assert parse_html_text(b"<p>no title</p>")["title"] == ""
    assert parse_html_text(b"<title>open<p>x</p>") is None


def test_quote_aware_attributes():
    got = parse_html_text(b'<a href="/x" title="a > b">link</a> tail')
    assert got["text"] == "link tail"
    assert got["n_links"] == 1
    # EOF inside a tag rejects whole
    assert parse_html_text(b'<a href="/x' ) is None
    assert parse_html_text(b"<p>x</p><") is None


def test_block_vs_inline():
    got = parse_html_text(b"<p>a <b>b</b> c</p><div>d</div>")
    assert got["text"] == "a b c\nd"
    got = parse_html_text(b"line one<br>line two")
    assert got["text"] == "line one\nline two"


def test_link_density_arithmetic():
    got = parse_html_text(b"<p><a href='/'>abcde</a> fghij</p>")
    # text = 'abcde fghij' (11 chars), anchor text 5 chars
    assert got["n_chars"] == 11
    assert got["link_density"] == 5 / 11
    empty = parse_html_text(b"<p></p>")
    assert empty["n_chars"] == 0 and empty["link_density"] == 0.0


def test_bom_and_binary_decode():
    # FF FE is a UTF-16LE BOM (WHATWG BOM sniffing outranks all):
    # a real UTF-16LE page decodes
    page16 = b"\xff\xfe" + "<p>bom page</p>".encode("utf-16-le")
    got = parse_html_text(page16)
    assert got is not None and got["text"] == "bom page"
    # a BOM over bytes that are NOT valid UTF-16 (odd length) rejects
    assert parse_html_text(b"\xff\xfe<p>x</p>" + b"\x41") is None
    # genuinely binary payloads reject via the control-character sniff
    assert parse_html_text(b"<p>x</p>" + bytes(range(1, 9)) * 8 + b"\xe9") is None


def test_frame_nulls_and_id_col(spark):
    df = spark.createDataFrame(
        [(1, bytearray(synth_html(1))), (2, bytearray(b"<nav>bad")), (3, None)],
        "media_id long, blob binary",
    )
    out = {
        r["media_id"]: r
        for r in html_text_frame(df, id_col="media_id", payload_col="blob").collect()
    }
    assert out[1]["title"] == expected_html_row(1)["title"]
    assert out[2]["n_chars"] is None and out[3]["n_chars"] is None


def test_registered_oracle_matches_duckdb(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.queries import load_all

    fn = load_all()["html_text_extract"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(HTML_TEXT_ORACLE).fetchall()]
    assert len(got) == len(want) and got == want


def test_meta_extraction_grid():
    from danae_spark.multimodal.htmltext import parse_html_meta
    from danae_spark.operators.urlops import canonicalize_url, synth_messy_url

    for d in range(80):
        c = parse_html_meta(synth_html(d))
        assert c is not None, d
        assert c["title"] == f"Doc {d} t{d % 10}" == c["og_title"], d
        assert c["lang"] == "en" and c["charset"] == "utf-8", d
        assert c["canonical_raw"] == synth_messy_url(d), d
        assert c["canonical"] == canonicalize_url(synth_messy_url(d)), d
        assert c["description"] == f"desc w{d % 9} & more", d
        assert c["n_meta"] == 3, d


def test_meta_attribute_forms():
    from danae_spark.multimodal.htmltext import parse_html_meta

    # unquoted values, single quotes, rel lists, uncanonicalizable href
    page = (
        b"<html LANG=en-GB><head><meta charset=UTF-8>"
        b"<link rel='alternate canonical' href='ftp://x/y'>"
        b"<meta name=DESCRIPTION content='d &amp; e'></head><p>b</p>"
    )
    c = parse_html_meta(page)
    assert c["lang"] == "en-GB" and c["charset"] == "utf-8"
    assert c["canonical_raw"] == "ftp://x/y" and c["canonical"] is None
    assert c["description"] == "d & e"
    # first canonical wins; duplicate attrs: first occurrence wins
    page = (
        b'<link rel="canonical" href="http://a/1" href="http://a/2">'
        b'<link rel="canonical" href="http://a/3"><p>x</p>'
    )
    c = parse_html_meta(page)
    assert c["canonical_raw"] == "http://a/1"
    # same reject contract as the text extractor
    assert parse_html_meta(b"<link rel='canonical' href='http://a/1") is None


def test_meta_frame_and_oracle(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.multimodal.htmltext import HTML_META_ORACLE, html_meta_frame
    from danae_spark.queries import load_all

    df = spark.createDataFrame(
        [(1, bytearray(synth_html(1))), (2, None)], "media_id long, blob binary"
    )
    out = {
        r["media_id"]: r
        for r in html_meta_frame(df, id_col="media_id", payload_col="blob").collect()
    }
    assert out[1]["title"] == "Doc 1 t1" and out[2]["title"] is None

    fn = load_all()["html_meta_extract"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(HTML_META_ORACLE).fetchall()]
    assert len(got) == len(want) and got == want


# ------------------------------------- structured data (r12): JSON-LD + og


def test_structured_grid_parity():
    from danae_spark.multimodal.htmltext import (
        parse_html_structured,
        synth_structured_html,
    )

    for d in range(40):
        got = parse_html_structured(synth_structured_html(d))
        assert got["ld_type"] in ("Article", "NewsArticle", "BlogPosting")
        assert got["ld_author"] == f"author a{d % 5}"
        assert got["ld_word_count"] == 10 + d % 23
        assert got["og_description"] == f"sdesc w{d % 7} & more"  # entity decoded
        assert got["og_title"] == got["title"]


def test_structured_jsonld_forms():
    from danae_spark.multimodal.htmltext import parse_html_structured

    def page(ld: str, typ: str = "application/ld+json") -> bytes:
        return (
            f'<html><head><title>t</title><script type="{typ}">{ld}</script>'
            "</head><body><p>x</p></body></html>"
        ).encode()

    # list form: first element wins
    got = parse_html_structured(page('[{"@type": "Article", "name": "N"}]'))
    assert got["ld_type"] == "Article" and got["ld_headline"] == "N"
    # string author form
    got = parse_html_structured(page('{"@type": "Article", "author": "A"}'))
    assert got["ld_author"] == "A"
    # malformed JSON-LD: NULL ld fields, page still parses
    got = parse_html_structured(page('{"@type": broken'))
    assert got is not None and got["ld_type"] is None
    # a plain script is NOT JSON-LD
    got = parse_html_structured(page('{"@type": "Article"}', typ="text/javascript"))
    assert got["ld_type"] is None
    # wordCount must be an int (booleans and strings rejected)
    got = parse_html_structured(page('{"@type": "Article", "wordCount": "12"}'))
    assert got["ld_word_count"] is None
    got = parse_html_structured(page('{"@type": "Article", "wordCount": true}'))
    assert got["ld_word_count"] is None


def test_structured_frame_nulls(spark):
    from danae_spark.multimodal.htmltext import (
        html_structured_frame,
        synth_structured_html,
    )

    df = spark.createDataFrame(
        [(1, bytearray(synth_structured_html(1))), (2, bytearray(b"<a hre")), (3, None)],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in html_structured_frame(df).collect()}
    assert out[1]["ld_headline"] == "S1 h1"
    assert out[2]["title"] is None and out[3]["title"] is None
