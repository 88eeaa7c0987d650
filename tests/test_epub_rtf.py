"""EPUB (multimodal/epub.py) and RTF (multimodal/rtf.py) extraction:
spec rules, reject-whole, harvest routing, registered oracles."""

import os
import random

import duckdb

from danae_spark.multimodal.epub import (
    EPUB_MIME,
    EPUB_TEXT_ORACLE,
    epub_n_chapters,
    epub_text_frame,
    parse_epub,
    synth_epub,
)
from danae_spark.multimodal.rtf import (
    RTF_TEXT_ORACLE,
    parse_rtf,
    rtf_text_frame,
    synth_rtf,
)


# ------------------------------------------------------------------ epub


def test_epub_roundtrip_and_spine_order():
    from danae_spark.multimodal.htmltext import expected_html_row

    for d in (1, 2, 5, 11, 24):
        r = parse_epub(synth_epub(d))
        assert r is not None, d
        assert r["title"] == f"Book {d} t{d % 8}"
        assert r["creator"] == f"author a{d % 5}"
        assert r["n_chapters"] == epub_n_chapters(d)
        # chapters are the certified HTML extraction, joined in spine order
        want = "\n".join(
            expected_html_row(d * 5 + k)["text"] for k in range(epub_n_chapters(d))
        )
        assert r["text"] == want, d


def test_epub_spine_order_is_authoritative():
    """Reading order comes from the spine, not member order: a spine
    listing chapters reversed must reverse the text."""
    from danae_spark.multimodal.archive import _zip_build

    container = (
        '<container><rootfiles><rootfile full-path="content.opf"/>'
        "</rootfiles></container>"
    )
    opf = (
        "<package><metadata><dc:title>T</dc:title></metadata><manifest>"
        '<item id="a" href="a.xhtml"/><item id="b" href="b.xhtml"/>'
        '</manifest><spine><itemref idref="b"/><itemref idref="a"/></spine>'
        "</package>"
    )
    z = _zip_build(
        [
            ("mimetype", EPUB_MIME, 0),
            ("META-INF/container.xml", container.encode(), 8),
            ("content.opf", opf.encode(), 8),
            ("a.xhtml", b"<html><body><p>alpha</p></body></html>", 8),
            ("b.xhtml", b"<html><body><p>beta</p></body></html>", 8),
        ]
    )
    r = parse_epub(z)
    assert r is not None and r["text"] == "beta\nalpha"
    assert r["creator"] is None  # no dc:creator in the OPF


def test_epub_rejects():
    from danae_spark.multimodal.archive import _zip_build

    ok = synth_epub(1)
    assert parse_epub(ok) is not None
    assert parse_epub(ok[:-5]) is None  # truncated
    assert parse_epub(synth_epub(23)) is None and parse_epub(synth_epub(46)) is None
    # mimetype not first / wrong bytes
    assert parse_epub(_zip_build([("mimetype", b"application/zip", 0)])) is None
    # spine idref without a manifest item
    container = (
        '<container><rootfiles><rootfile full-path="content.opf"/>'
        "</rootfiles></container>"
    )
    bad_opf = (
        "<package><manifest></manifest>"
        '<spine><itemref idref="ghost"/></spine></package>'
    )
    z = _zip_build(
        [
            ("mimetype", EPUB_MIME, 0),
            ("META-INF/container.xml", container.encode(), 8),
            ("content.opf", bad_opf.encode(), 8),
        ]
    )
    assert parse_epub(z) is None
    # a chapter the HTML extractor cannot walk rejects the whole book
    opf = (
        "<package><manifest>"
        '<item id="a" href="a.xhtml"/></manifest>'
        '<spine><itemref idref="a"/></spine></package>'
    )
    z2 = _zip_build(
        [
            ("mimetype", EPUB_MIME, 0),
            ("META-INF/container.xml", container.encode(), 8),
            ("content.opf", opf.encode(), 8),
            ("a.xhtml", b"<html><body><p>unterminated <!-- ", 8),
        ]
    )
    assert parse_epub(z2) is None


def test_epub_fuzz_never_crashes():
    rng = random.Random(1423)
    for d in (1, 2, 7):
        base = bytearray(synth_epub(d))
        for _ in range(150):
            z = bytearray(base)
            for _ in range(rng.randint(1, 3)):
                z[rng.randrange(len(z))] ^= 1 << rng.randrange(8)
            parse_epub(bytes(z))


# ------------------------------------------------------------------- rtf


def test_rtf_text_rules():
    # groups/formatting transparent; tables skipped; escapes decode
    doc = b"\n".join(
        [
            rb"{\rtf1\ansi\ansicpg1252\deff0",
            rb"{\fonttbl{\f0 Helv;}}",
            rb"{\colortbl;\red0\green0\blue0;}",
            rb"{\*\generator secret;}",
            rb"{\info{\title My T}{\author Me}}",
            rb"\uc1 Hello {\b bold} world\par",
            rb"caf\'e9 \u8212?dash\tab tail\par",
            rb"lit \\ \{ \} \~ \_ ok\par}",
        ]
    )
    r = parse_rtf(doc)
    assert r is not None
    assert r["title"] == "My T" and r["creator"] == "Me"
    assert r["n_paragraphs"] == 3
    lines = r["text"].split("\n")
    assert lines[0] == "Hello bold world"
    assert lines[1] == "café —dash\ttail"
    assert lines[2] == "lit \\ { }   - ok"
    # skipped destinations leak nothing
    assert "secret" not in r["text"] and "Helv" not in r["text"]


def test_rtf_uc_skip_rule():
    # \uc2 makes the two following chars fallback (swallowed)
    r = parse_rtf(rb"{\rtf1 \uc2\u934?Fx\par}")
    assert r is not None and r["text"] == "Φx"
    # negative \uN wraps per the signed-16-bit convention
    r2 = parse_rtf(rb"{\rtf1 \uc1\u-1524?z\par}")
    assert r2 is not None and r2["text"] == chr(65536 - 1524) + "z"


def test_rtf_rejects():
    assert parse_rtf(b"not rtf") is None
    assert parse_rtf(rb"{\rtf1 unbalanced") is None
    assert parse_rtf(rb"{\rtf1 x}trailing") is None
    assert parse_rtf(rb"{\rtf1 \'q9 x}") is None  # bad hex escape
    assert parse_rtf(rb"{\rtf1 x}}") is None  # extra close
    assert parse_rtf(synth_rtf(13)) is None and parse_rtf(synth_rtf(26)) is None


def test_rtf_fuzz_never_crashes():
    rng = random.Random(1424)
    for d in (1, 2, 7):
        base = bytearray(synth_rtf(d))
        for _ in range(300):
            z = bytearray(base)
            for _ in range(rng.randint(1, 4)):
                z[rng.randrange(len(z))] ^= 1 << rng.randrange(8)
            parse_rtf(bytes(z))


# ------------------------------------------------------- harvest routes


def test_harvest_routes_epub_and_rtf():
    from danae_spark.multimodal.harvest import harvest_text

    b = harvest_text(synth_epub(2))
    assert b is not None and b["doc_class"] == "epub" and b["format"] == "epub"
    assert b["title"] == "Book 2 t2"
    r = harvest_text(synth_rtf(2))
    assert r is not None and r["doc_class"] == "rtf"
    # reject-whole flows through the dispatcher as None
    assert harvest_text(synth_rtf(13)) is None
    assert harvest_text(synth_epub(23)) is None
    # an .rtf member inside an archive harvests via recursion
    from danae_spark.multimodal.archive import _zip_build

    z = _zip_build([("doc.rtf", synth_rtf(3), 8)])
    h = harvest_text(z)
    assert h is not None and h["doc_class"] == "archive"
    assert parse_rtf(synth_rtf(3))["text"] in h["text"]


# --------------------------------------------------------- spark layers


def test_frames_and_registered_oracles(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.queries import load_all

    df = spark.createDataFrame(
        [(1, bytearray(synth_epub(1))), (23, bytearray(synth_epub(23))), (9, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in epub_text_frame(df).collect()}
    assert got[1]["n_chapters"] == epub_n_chapters(1)
    assert got[23]["text"] is None and got[9]["text"] is None

    df2 = spark.createDataFrame(
        [(1, bytearray(synth_rtf(1))), (13, bytearray(synth_rtf(13)))],
        "doc_id long, payload binary",
    )
    got2 = {r["doc_id"]: r for r in rtf_text_frame(df2).collect()}
    assert got2[1]["n_paragraphs"] == 3 and got2[13]["text"] is None

    registry = load_all()
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    for name, oracle in (
        ("epub_text_extract", EPUB_TEXT_ORACLE),
        ("rtf_text_extract", RTF_TEXT_ORACLE),
    ):
        got3 = [tuple(r) for r in registry[name].fn(spark, sf_dir).collect()]
        want = [tuple(r) for r in con.execute(oracle).fetchall()]
        assert len(got3) == len(want) and got3 == want, name


# -------------------------------------------------------------- markdown


def test_markdown_rules():
    from danae_spark.multimodal.markdown import parse_markdown

    md = "\n".join(
        [
            "# Title *one*",
            "",
            "Intro with [a link](https://x.test) and **bold** and `code`.",
            "> quoted line",
            "- item one",
            "1. ordered item",
            "![alt text](img.png) trailing",
            "```",
            "raw *code* [not](a-link)",
            "```",
            "## Second heading",
        ]
    ).encode()
    r = parse_markdown(md)
    assert r is not None
    assert r["title"] == "Title one"
    assert r["n_headings"] == 2 and r["n_list_items"] == 2
    assert r["n_links"] == 1 and r["n_code_blocks"] == 1
    lines = r["text"].split("\n")
    assert lines[0] == "Title one"
    assert lines[1] == "Intro with a link and bold and code."
    assert lines[2] == "quoted line"
    assert lines[3] == "item one" and lines[4] == "ordered item"
    assert lines[5] == "alt text trailing"
    assert lines[6] == "raw *code* [not](a-link)"  # fences protect code
    assert lines[7] == "Second heading"


def test_markdown_rejects():
    from danae_spark.multimodal.markdown import parse_markdown, synth_markdown

    assert parse_markdown(b"") is None
    assert parse_markdown(b"\x00\x01\x02") is None
    assert parse_markdown(b"# ok\n```\nunclosed fence") is None
    assert parse_markdown(b"bad \xff\xfe utf8") is None
    assert parse_markdown(synth_markdown(11)) is None
    assert parse_markdown(synth_markdown(22)) is None


def test_markdown_frame_and_oracle(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.multimodal.markdown import (
        MARKDOWN_TEXT_ORACLE,
        markdown_text_frame,
        synth_markdown,
    )
    from danae_spark.queries import load_all

    df = spark.createDataFrame(
        [(d, bytearray(synth_markdown(d))) for d in range(20)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in markdown_text_frame(df).collect()}
    assert got[11]["text"] is None and got[1]["n_headings"] == 1

    fn = load_all()["markdown_text_extract"].fn
    got2 = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(MARKDOWN_TEXT_ORACLE).fetchall()]
    assert len(got2) == len(want) and got2 == want
