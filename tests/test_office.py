"""Office-document extraction (multimodal/office.py): docx/odt text
rules, reject-whole validation, frame API, registered oracle, fuzz."""

import os
import random

import duckdb

from danae_spark.multimodal.archive import _zip_build
from danae_spark.multimodal.office import (
    ODT_MIME,
    OFFICE_TEXT_ORACLE,
    office_text_frame,
    parse_office,
    synth_docx,
    synth_odt,
    synth_office,
)


def _docx(document_xml: str, core_xml: str | None = None) -> bytes:
    from danae_spark.multimodal.office import _DOCX_CT, _DOCX_RELS

    entries = [
        ("[Content_Types].xml", _DOCX_CT.encode(), 8),
        ("_rels/.rels", _DOCX_RELS.encode(), 8),
        ("word/document.xml", document_xml.encode(), 8),
    ]
    if core_xml is not None:
        entries.insert(2, ("docProps/core.xml", core_xml.encode(), 8))
    return _zip_build(entries)


def _odt(content_xml: str, meta_xml: str | None = None, mime: bytes = ODT_MIME) -> bytes:
    from danae_spark.multimodal.office import _ODT_MANIFEST

    entries = [
        ("mimetype", mime, 0),
        ("META-INF/manifest.xml", _ODT_MANIFEST.encode(), 8),
        ("content.xml", content_xml.encode(), 8),
    ]
    if meta_xml is not None:
        entries.insert(2, ("meta.xml", meta_xml.encode(), 8))
    return _zip_build(entries)


def test_docx_text_rules():
    doc = (
        "<w:document><w:body>"
        "<w:p><w:r><w:t>hello</w:t></w:r>"
        '<w:r><w:t xml:space="preserve"> world</w:t></w:r></w:p>'
        # trimming: no preserve -> leading/trailing whitespace drops
        "<w:p><w:r><w:t>  padded  </w:t></w:r></w:p>"
        # tab and break inside runs; entities decode
        "<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/>"
        "<w:t>x &amp; y&#33;</w:t></w:r></w:p>"
        # empty paragraph; ignorable markers are transparent
        '<w:p/><w:p><w:proofErr w:type="spellStart"/>'
        '<w:bookmarkStart w:id="0" w:name="m"/><w:r><w:rPr><w:b/></w:rPr>'
        "<w:t>bold</w:t></w:r></w:p>"
        "<w:sectPr/></w:body></w:document>"
    )
    r = parse_office(_docx(doc))
    assert r is not None
    assert r["format"] == "docx"
    assert r["text"] == "hello world\npadded\na\tb\nx & y!\n\nbold"
    assert r["n_paragraphs"] == 5
    assert r["title"] is None and r["creator"] is None  # no core.xml


def test_docx_metadata():
    core = (
        "<cp:coreProperties><dc:title>T &amp; t</dc:title>"
        "<dc:creator>me</dc:creator></cp:coreProperties>"
    )
    r = parse_office(_docx("<w:document><w:body/></w:document>", core))
    assert r["title"] == "T & t" and r["creator"] == "me"
    assert r["n_paragraphs"] == 0 and r["text"] == ""


def test_odt_text_rules():
    content = (
        "<office:document-content><office:automatic-styles>"
        '<style:style style:name="P1"/></office:automatic-styles>'
        "<office:body><office:text>"
        "<text:p>one <text:span>two</text:span> three</text:p>"
        '<text:p>a<text:tab/>b<text:s text:c="3"/>c<text:line-break/>d</text:p>'
        "<text:p/>"
        '<text:h text:outline-level="1">head &amp; co&#33;</text:h>'
        "</office:text></office:body></office:document-content>"
    )
    r = parse_office(_odt(content))
    assert r is not None and r["format"] == "odt"
    assert r["text"] == "one two three\na\tb   c\nd\n\nhead & co!"
    assert r["n_paragraphs"] == 4


def test_odt_default_space_count():
    content = '<office:body><text:p>a<text:s/>b</text:p></office:body>'
    assert parse_office(_odt(content))["text"] == "a b"


def test_reject_whole():
    ok = synth_docx(2)
    # truncation (the synth reject leg)
    assert parse_office(ok[:-7]) is None
    assert parse_office(synth_office(17)) is None and parse_office(synth_office(34)) is None
    # CRC corruption inside a member rejects via the validating walker
    bad = bytearray(synth_odt(3))
    ix = bytes(bad).find(b"mimetype", 30)  # the member data region
    bad[ix] ^= 0xFF
    assert parse_office(bytes(bad)) is None
    # not an office package: valid zip, neither route matches
    assert parse_office(_zip_build([("readme.txt", b"hi", 0)])) is None
    # odt mimetype must be the FIRST member
    from danae_spark.multimodal.office import _ODT_MANIFEST

    swapped = _zip_build(
        [
            ("META-INF/manifest.xml", _ODT_MANIFEST.encode(), 8),
            ("mimetype", ODT_MIME, 0),
            ("content.xml", b"<office:body><text:p>x</text:p></office:body>", 8),
        ]
    )
    assert parse_office(swapped) is None
    # wrong mimetype bytes reject the odt route
    assert parse_office(_odt("<office:body/>", mime=b"application/zip")) is None
    # malformed XML: unterminated tag / nested paragraph / bad text:c
    assert parse_office(_docx("<w:document><w:body><w:p><w:r><w:t>x")) is None
    assert parse_office(_docx("<w:body><w:p><w:p></w:p></w:p></w:body>")) is None
    assert parse_office(_odt('<office:body><text:p>a<text:s text:c="no"/></text:p></office:body>')) is None
    # child element inside w:t is a structural violation
    assert parse_office(_docx("<w:body><w:p><w:t>a<w:b/>c</w:t></w:p></w:body>")) is None


def test_fuzz_never_crashes():
    rng = random.Random(1406)
    for d in (2, 3, 8, 15):
        base = bytearray(synth_office(d))
        for _ in range(200):
            z = bytearray(base)
            for _ in range(rng.randint(1, 3)):
                z[rng.randrange(len(z))] ^= 1 << rng.randrange(8)
            parse_office(bytes(z))  # must return dict or None, never raise


def test_frame_api(spark):
    rows = [(d, synth_office(d)) for d in range(0, 40)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in office_text_frame(df).collect()}
    assert len(got) == 40
    for d in range(40):
        r = parse_office(synth_office(d))
        if d % 17 == 0:
            assert got[d]["format"] is None and got[d]["text"] is None
        else:
            assert got[d]["format"] == r["format"]
            assert got[d]["text"] == r["text"]
            assert got[d]["n_words"] == r["n_words"]


def test_registered_oracle_matches_duckdb(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.queries import load_all

    fn = load_all()["office_text_extract"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(OFFICE_TEXT_ORACLE).fetchall()]
    assert len(got) == len(want) and got == want


# ------------------------------------------------------------- xlsx


def test_xlsx_roundtrip_grid():
    from danae_spark.multimodal.office import parse_xlsx, synth_xlsx, xlsx_n_cols, xlsx_n_data_rows

    for d in range(100):
        r = parse_xlsx(synth_xlsx(d))
        if d % 19 == 0:
            assert r is None, d
            continue
        assert r is not None, d
        assert r["sheet_name"] == f"data d{d % 10}", d
        assert r["n_rows"] == 1 + xlsx_n_data_rows(d), d
        assert r["n_shared"] == 11, d
        lines = r["text"].split("\n")
        assert len(lines) == r["n_rows"], d
        assert all(len(ln.split("\t")) == xlsx_n_cols(d) for ln in lines), d
        # header from shared strings (incl. the rich-text run entry h2)
        assert lines[0].split("\t")[0] == f"h{d % 5}", d


def test_xlsx_cell_channels():
    from danae_spark.multimodal.office import _zip_build  # noqa: F401 (re-exported path)
    from danae_spark.multimodal.office import parse_xlsx, synth_xlsx

    # across a doc range every value channel renders: booleans as
    # TRUE/FALSE, numbers as raw digit strings, inline i<k>, shared
    # s<k>, gaps as ''
    flat = []
    for d in range(1, 12):
        r = parse_xlsx(synth_xlsx(d))
        assert r is not None
        flat += r["text"].replace("\n", "\t").split("\t")
    assert any(v in ("TRUE", "FALSE") for v in flat)
    assert any(v.isdigit() for v in flat)
    assert any(v.startswith("i") for v in flat)
    assert any(v.startswith("s") for v in flat)
    assert any(v == "" for v in flat)


def test_xlsx_rejects():
    from danae_spark.multimodal.archive import _zip_build
    from danae_spark.multimodal.office import parse_xlsx, synth_xlsx

    ok = synth_xlsx(1)
    assert parse_xlsx(ok) is not None
    assert parse_xlsx(ok[:-5]) is None  # truncated
    # shared-string index out of range
    def pack(ws, sst=None):
        from danae_spark.multimodal.office import _XLSX_CT, _XLSX_RELS
        entries = [
            ("[Content_Types].xml", _XLSX_CT.encode(), 8),
            ("_rels/.rels", _XLSX_RELS.encode(), 8),
            ("xl/workbook.xml", b'<workbook><sheets><sheet name="s"/></sheets></workbook>', 0),
            ("xl/worksheets/sheet1.xml", ws.encode(), 8),
        ]
        if sst is not None:
            entries.append(("xl/sharedStrings.xml", sst.encode(), 8))
        return _zip_build(entries)

    assert parse_xlsx(pack('<sheetData><row r="1"><c r="A1" t="s"><v>7</v></c></row></sheetData>',
                           "<sst><si><t>x</t></si></sst>")) is None
    # decreasing refs reject
    assert parse_xlsx(pack('<sheetData><row r="1"><c r="B1"><v>1</v></c>'
                           '<c r="A1"><v>2</v></c></row></sheetData>')) is None
    # multi-letter column: declared boundary
    assert parse_xlsx(pack('<sheetData><row r="1"><c r="AA1"><v>1</v></c></row></sheetData>')) is None
    # unknown cell type rejects whole
    assert parse_xlsx(pack('<sheetData><row r="1"><c r="A1" t="e"><v>#REF!</v></c></row></sheetData>')) is None
    # bad boolean value
    assert parse_xlsx(pack('<sheetData><row r="1"><c r="A1" t="b"><v>2</v></c></row></sheetData>')) is None
    # unterminated row
    assert parse_xlsx(pack('<sheetData><row r="1"><c r="A1"><v>1</v></c></sheetData>')) is None
    # missing worksheet part
    from danae_spark.multimodal.office import _XLSX_CT, _XLSX_RELS
    nows = _zip_build([
        ("[Content_Types].xml", _XLSX_CT.encode(), 8),
        ("_rels/.rels", _XLSX_RELS.encode(), 8),
        ("xl/workbook.xml", b'<workbook><sheets><sheet name="s"/></sheets></workbook>', 0),
    ])
    assert parse_xlsx(nows) is None


def test_xlsx_fuzz_never_crashes():
    import random

    from danae_spark.multimodal.office import parse_xlsx, synth_xlsx

    rng = random.Random(1414)
    for d in (1, 2, 7):
        base = bytearray(synth_xlsx(d))
        for _ in range(200):
            z = bytearray(base)
            for _ in range(rng.randint(1, 3)):
                z[rng.randrange(len(z))] ^= 1 << rng.randrange(8)
            parse_xlsx(bytes(z))


def test_xlsx_frame_and_registered_oracle(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.multimodal.office import XLSX_TABLE_ORACLE, synth_xlsx, xlsx_table_frame
    from danae_spark.queries import load_all

    df = spark.createDataFrame(
        [(d, bytearray(synth_xlsx(d))) for d in range(25)] + [(99, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in xlsx_table_frame(df).collect()}
    assert got[99]["text"] is None and got[19]["text"] is None
    assert got[1]["n_shared"] == 11

    fn = load_all()["xlsx_table_extract"].fn
    got2 = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(XLSX_TABLE_ORACLE).fetchall()]
    assert len(got2) == len(want) and got2 == want
