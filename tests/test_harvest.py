"""Text harvest (multimodal/harvest.py): the document-class dispatcher
— routing matrix, corrupt payloads, agreement with the unit
extractors, registered oracle."""

import os
import zlib

import duckdb

from danae_spark.multimodal.harvest import (
    TEXT_HARVEST_ORACLE,
    harvest_text,
    synth_doc,
    text_harvest_frame,
)


def test_dispatch_matrix():
    want_cls = [
        "html", "pdf", "subtitle", "text", "warc", "archive",
        "office", "rtf", "epub", "notebook",
    ]
    for d in range(200):
        c = harvest_text(synth_doc(d))
        if (
            (d % 10 == 6 and d % 17 == 0)
            or (d % 10 == 7 and d % 13 == 0)
            or (d % 10 == 8 and d % 23 == 0)
            or (d % 10 == 9 and (d % 17 == 3 or d % 19 == 6 or d % 23 == 11))
        ):
            assert c is None, d  # truncated/corrupt package: reject whole
            continue
        if d % 10 == 4 and d % 5 == 4 and d % 3 == 0:
            assert c is None, d  # WARC whose only captures are excluded
            continue
        assert c is not None, d
        assert c["doc_class"] == want_cls[d % 10], d
        assert c["text"], d


def test_agrees_with_unit_extractors():
    from danae_spark.multimodal.epub import parse_epub, synth_epub
    from danae_spark.multimodal.htmltext import expected_html_row
    from danae_spark.multimodal.office import parse_office, synth_office
    from danae_spark.multimodal.pdf import expected_pdf_row
    from danae_spark.multimodal.rtf import parse_rtf, synth_rtf
    from danae_spark.multimodal.subtitles import parse_subtitles, synth_subtitles

    # html (cls 0)
    assert harvest_text(synth_doc(10))["text"] == expected_html_row(10)["text"]
    assert harvest_text(synth_doc(10))["title"] == expected_html_row(10)["title"]
    # pdf (cls 1)
    assert harvest_text(synth_doc(11))["text"] == expected_pdf_row(11)["text"]
    # subtitle (cls 2)
    assert harvest_text(synth_doc(12))["text"] == parse_subtitles(synth_subtitles(12))["text"]
    # zip of subtitles (cls 5): both members' transcripts joined
    want = "\n".join(
        parse_subtitles(synth_subtitles(15 * 4 + k))["text"] for k in range(2)
    )
    assert harvest_text(synth_doc(15))["text"] == want
    # office (cls 6): dispatch agrees with the unit extractor, and the
    # package identity wins over the plain-archive route
    unit = parse_office(synth_office(16))
    got = harvest_text(synth_doc(16))
    assert got["doc_class"] == "office" and got["format"] == unit["format"]
    assert got["text"] == unit["text"] and got["title"] == unit["title"]
    # rtf (cls 7)
    r_unit = parse_rtf(synth_rtf(17))
    r_got = harvest_text(synth_doc(17))
    assert r_got["doc_class"] == "rtf" and r_got["text"] == r_unit["text"]
    assert r_got["title"] == r_unit["title"]
    # epub (cls 8): spine-ordered chapters via the certified extractor
    b_unit = parse_epub(synth_epub(18))
    b_got = harvest_text(synth_doc(18))
    assert b_got["doc_class"] == "epub" and b_got["text"] == b_unit["text"]
    assert b_got["title"] == b_unit["title"]
    # notebook (cls 9, r16): markdown+code text, outputs stripped
    from danae_spark.multimodal.notebook import parse_notebook, synth_notebook

    n_unit = parse_notebook(synth_notebook(19))
    n_got = harvest_text(synth_doc(19))
    assert n_got["doc_class"] == "notebook" and n_got["format"] == "ipynb"
    assert n_got["text"] == n_unit["text"] and n_got["title"] == n_unit["title"]


def test_warc_gz_routing():
    """A .warc.gz (gzip member-per-record) must harvest as warc, not
    be mistaken for a tar.gz."""
    from danae_spark.multimodal.warc import synth_warc

    gz = synth_warc(5)  # odd doc -> gzip member-per-record
    assert gz[:2] == b"\x1f\x8b"
    c = harvest_text(gz)
    assert c is not None and c["doc_class"] == "warc" and c["format"] == "warc.gz"
    # and a real tar.gz still harvests as archive when it has subtitles
    from danae_spark.multimodal.archive import _tar_build
    from danae_spark.multimodal.subtitles import synth_subtitles

    t = _tar_build([("a.srt", synth_subtitles(4))])
    comp = zlib.compressobj(6, zlib.DEFLATED, 31)
    c2 = harvest_text(comp.compress(t) + comp.flush())
    assert c2 is not None and c2["doc_class"] == "archive" and c2["format"] == "tar.gz"


def test_plain_vs_html_split():
    assert harvest_text(b"just words, no markup")["doc_class"] == "text"
    assert harvest_text(b"<p>markup</p>")["doc_class"] == "html"
    # plain text preserved verbatim (no whitespace collapse)
    c = harvest_text(b"line one\n  line two")
    assert c["doc_class"] == "text" and c["text"] == "line one\n  line two"


def test_corrupt_and_empty():
    assert harvest_text(b"") is None
    assert harvest_text(b"\x00\x01\x02\x03") is None  # binary, no magic
    assert harvest_text(b"%PDF-1.4 truncated") is None
    assert harvest_text(b"PK\x03\x04 not a zip") is None
    # archive with no text-bearing members harvests as None
    from danae_spark.multimodal.archive import _zip_build

    assert harvest_text(_zip_build([("a.bin", b"\x00\x01\x02", 0)])) is None


def test_frame_nulls_and_id_col(spark):
    df = spark.createDataFrame(
        [(1, bytearray(synth_doc(1))), (2, bytearray(b"\x00\x01\x02\x03")), (3, None)],
        "media_id long, blob binary",
    )
    out = {
        r["media_id"]: r
        for r in text_harvest_frame(df, id_col="media_id", payload_col="blob").collect()
    }
    assert out[1]["doc_class"] == "pdf"
    assert out[2]["doc_class"] is None and out[3]["doc_class"] is None


def test_registered_oracle_matches_duckdb(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.queries import load_all

    fn = load_all()["text_harvest"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(TEXT_HARVEST_ORACLE).fetchall()]
    assert len(got) == len(want) and got == want


def test_harvest_feeds_curation_stack(spark):
    """The end-to-end point of the crawl surface: a mixed blob column
    -> text_harvest -> the EXISTING curation operators, unchanged.
    The harvested `text` column drives quality_filter_frame and
    text_stats_frame directly."""
    from danae_spark.operators.textstats import quality_filter_frame, text_stats_frame

    df = spark.createDataFrame(
        [(d, bytearray(synth_doc(d))) for d in range(12)] + [(99, None)],
        "doc_id long, payload binary",
    )
    from pyspark.sql import functions as F

    harvested = (
        text_harvest_frame(df).filter("text IS NOT NULL").withColumn("lang", F.lit("en"))
    )
    verdicts = quality_filter_frame(harvested).collect()
    assert len(verdicts) == 12  # every non-null harvest gets a verdict
    stats = {r["doc_id"]: r for r in text_stats_frame(harvested).collect()}
    # the stats see exactly the harvested text (char counts agree)
    got = {r["doc_id"]: r for r in harvested.collect()}
    for d, row in got.items():
        assert stats[d]["n_chars"] == row["n_chars"], d


def test_meta_parser_never_crashes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from danae_spark.multimodal.htmltext import parse_html_meta, synth_html

    seeds = [synth_html(k) for k in (0, 3, 7)]

    @settings(max_examples=120, deadline=None)
    @given(st.data())
    def fuzz(data):
        mode = data.draw(st.integers(0, 2))
        if mode == 0:
            payload = data.draw(st.binary(min_size=0, max_size=400))
        else:
            base = bytearray(seeds[data.draw(st.integers(0, len(seeds) - 1))])
            if mode == 1:
                payload = bytes(base[: data.draw(st.integers(0, len(base)))])
            else:
                for _ in range(data.draw(st.integers(1, 10))):
                    ix = data.draw(st.integers(0, len(base) - 1))
                    base[ix] = data.draw(st.integers(0, 255))
                payload = bytes(base)
        parse_html_meta(payload)

    fuzz()


def test_legacy_charset_fallback():
    from danae_spark.multimodal.htmltext import parse_html_meta, parse_html_text

    body = '<head><meta charset="iso-8859-1"></head><p>caf\xe9 cr\xe8me</p>'
    page = body.encode("windows-1252")
    assert page.decode("utf-8", errors="ignore") != body  # genuinely non-UTF-8
    got = parse_html_text(page)
    assert got is not None and got["text"] == "café crème"
    assert parse_html_meta(page)["charset"] == "iso-8859-1"
    # the harvest dispatcher routes non-UTF-8 declared-charset pages to html
    c = harvest_text(page)
    assert c is not None and c["doc_class"] == "html" and c["text"] == "café crème"
    # undeclared non-UTF-8 falls back to windows-1252 (WHATWG default)
    got = parse_html_text("<p>caf\xe9</p>".encode("windows-1252"))
    assert got is not None and got["text"] == "café"
    # ...but the fallback is binary-guarded: NULs / control density reject
    assert parse_html_text(b"<p>x</p>\x00\xe9" + bytes(range(0, 8)) * 4) is None
    # declared utf-8 but invalid utf-8 is a corrupt page
    assert parse_html_text(b'<meta charset="utf-8"><p>caf\xe9</p>') is None


def test_header_charset_precedence():
    """The HTTP Content-Type charset outranks a lying meta declaration
    (WHATWG); and an unknown header charset rejects whole."""
    from danae_spark.multimodal.htmltext import parse_html_text
    from danae_spark.multimodal.warc import content_type_charset

    assert content_type_charset("text/html; charset=ISO-8859-1") == "iso-8859-1"
    assert content_type_charset('text/html; charset="utf-8"') == "utf-8"
    assert content_type_charset("text/html") is None
    assert content_type_charset(None) is None

    page = '<meta charset="utf-8"><p>caf\xe9</p>'.encode("windows-1252")
    # meta alone: utf-8 declared but bytes are 1252 -> corrupt page
    assert parse_html_text(page) is None
    # header wins over the lying meta
    got = parse_html_text(page, "windows-1252")
    assert got is not None and got["text"] == "café"
    # a KNOWN header charset the bytes don't fit: decode fails, reject
    assert parse_html_text(page, "shift_jis") is None
    # unknown header charset: reject, never guess
    assert parse_html_text(page, "x-no-such-charset") is None
    # header utf-8 over non-utf-8 bytes: corrupt page
    assert parse_html_text(page, "utf-8") is None


def test_archive_members_full_dispatch():
    from danae_spark.multimodal.archive import _zip_build
    from danae_spark.multimodal.htmltext import expected_html_row, synth_html
    from danae_spark.multimodal.pdf import expected_pdf_row, synth_pdf
    from danae_spark.multimodal.subtitles import parse_subtitles, synth_subtitles

    z = _zip_build(
        [
            ("page.html", synth_html(3), 0),
            ("doc.pdf", synth_pdf(4), 8),
            ("cues.srt", synth_subtitles(5), 0),
            ("notes.txt", b"plain member text", 8),
            ("blob.bin", b"\x00\x01decodable but unnamed", 0),
        ]
    )
    c = harvest_text(z)
    assert c is not None and c["doc_class"] == "archive"
    want = "\n".join(
        [
            expected_html_row(3)["text"],
            expected_pdf_row(4)["text"],
            parse_subtitles(synth_subtitles(5))["text"],
            "plain member text",
        ]
    )
    assert c["text"] == want  # .bin member dropped, others in member order
    # archive-in-archive: the inner archive member does not recurse
    outer = _zip_build([("inner.zip", z, 0)])
    assert harvest_text(outer) is None


def test_corpus_format_census_matches_oracle(spark, sf_dir):
    import duckdb

    from danae_spark.catalog import table_path
    from danae_spark.multimodal.harvest import CORPUS_FORMAT_CENSUS_ORACLE
    from danae_spark.queries import load_all

    fn = load_all()["corpus_format_census"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(CORPUS_FORMAT_CENSUS_ORACLE).fetchall()]
    assert sorted(got, key=str) == sorted(want, key=str) and len(got) >= 11
    classes = {r[0] for r in got}
    assert {"html", "pdf", "office", "rtf", "epub", "warc", "notebook",
            None} <= classes


def test_tar_xz_and_bz2_archives_walk():
    """r15: .tar.xz / .tar.bz2 members decode through the stdlib
    codecs (the zip/zlib canonical-implementation route); truncation
    and bitflips reject whole, never crash."""
    import random

    from danae_spark.multimodal.archive import (
        archive_format,
        parse_archive,
        synth_archive,
    )

    # d%6==3 -> tar.xz, d%6==4 -> tar.bz2 (r17 widened the rotation)
    for d in (3, 4, 9, 10, 15, 16):
        assert archive_format(d) in ("tar.xz", "tar.bz2")
        r = parse_archive(synth_archive(d))
        assert r is not None, d
        assert r["format"] == archive_format(d)
        assert r["n_files"] == 2 + d % 4 and r["n_dirs"] == 1
        assert r["first_name"] == "sub/"
        # compressed != raw: the walk really decompressed
        assert r["total_bytes"] > 0
    blob = synth_archive(3)
    rng = random.Random(23)
    assert parse_archive(blob[: len(blob) // 2]) is None
    for _ in range(200):
        buf = bytearray(blob)
        i = rng.randrange(len(buf) * 8)
        buf[i >> 3] ^= 1 << (i & 7)
        parse_archive(bytes(buf))
    blob = synth_archive(4)
    assert parse_archive(blob[: len(blob) // 2]) is None
