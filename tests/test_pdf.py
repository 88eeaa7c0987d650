"""Classic-PDF reader (multimodal/pdf.py): COS grammar, xref walk,
content-stream text operators, declared boundaries, registered oracle."""

import os
import re
import zlib

import duckdb

from danae_spark.multimodal.pdf import (
    PDF_TEXT_ORACLE,
    expected_pdf_row,
    parse_pdf,
    pdf_text_frame,
    synth_pdf,
)


def test_roundtrip_grid():
    for d in range(120):
        assert parse_pdf(synth_pdf(d)) == expected_pdf_row(d), d


def _minimal(content=b"BT (hi) Tj ET", filt=None, trailer_extra="", length=None):
    """Hand-rolled one-page PDF for targeted grammar tests."""
    if filt == "flate":
        content = zlib.compress(content)
        head = f"<< /Length {len(content) if length is None else length} /Filter /FlateDecode >>"
    else:
        head = f"<< /Length {len(content) if length is None else length} >>"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
           b"/Resources << /Font << /F1 5 0 R >> >> >>",
        4: head.encode() + b"\nstream\n" + content + b"\nendstream",
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    out = bytearray(b"%PDF-1.4\n")
    offs = {}
    for n in sorted(objs):
        offs[n] = len(out)
        out += f"{n} 0 obj\n".encode() + objs[n] + b"\nendobj\n"
    xr = len(out)
    out += b"xref\n0 6\n0000000000 65535 f \n"
    for n in range(1, 6):
        out += f"{offs[n]:010d} 00000 n \n".encode()
    out += f"trailer\n<< /Size 6 /Root 1 0 R {trailer_extra}>>\nstartxref\n{xr}\n%%EOF\n".encode()
    return bytes(out)


def test_minimal_and_flate():
    assert parse_pdf(_minimal())["text"] == "hi"
    assert parse_pdf(_minimal(filt="flate"))["text"] == "hi"


def test_string_escapes_and_forms():
    cases = [
        (rb"BT (a\(b\)c) Tj ET", "a(b)c"),
        (rb"BT (a\101b) Tj ET", "aAb"),  # octal
        (rb"BT (a\tb\nc) Tj ET", "a\tb\nc"),
        (rb"BT (a (nested) b) Tj ET", "a (nested) b"),  # balanced parens
        (rb"BT <414243> Tj ET", "ABC"),
        (rb"BT <41424> Tj ET", "AB@"),  # odd hex digit pads with 0
        (rb"BT [(a) -120 (b)] TJ ET", "ab"),  # kerning is not text
        (rb"BT (l1) Tj 0 -14 Td (l2) Tj ET", "l1\nl2"),
        (rb"BT (l1) Tj (l2) ' ET", "l1\nl2"),  # ' = next line + show
        (rb"BT (kept) Tj ET q Q BT (more) Tj ET", "kept\nmore"),
    ]
    for content, want in cases:
        assert parse_pdf(_minimal(content))["text"] == want, content


def test_structure_rejections():
    ok = _minimal()
    assert parse_pdf(b"not a pdf" + ok[9:]) is None  # bad header
    assert parse_pdf(ok.replace(b"/Root 1 0 R ", b"")) is None  # no /Root
    assert parse_pdf(ok.replace(b"/Count 1", b"/Count 2")) is None  # count lie
    # startxref pointing into garbage
    assert parse_pdf(re.sub(rb"startxref\n\d+", b"startxref\n3", ok)) is None
    # /Length short of endstream
    assert parse_pdf(_minimal(length=3)) is None
    # unterminated string in content
    assert parse_pdf(_minimal(b"BT (oops Tj ET")) is None
    # unbalanced BT
    assert parse_pdf(_minimal(b"BT (x) Tj")) is None
    assert parse_pdf(b"") is None


def test_declared_boundaries():
    ok = _minimal()
    # encryption rejects whole
    assert parse_pdf(_minimal(trailer_extra="/Encrypt 9 0 R ")) is None
    # image filters stay declared rejects
    bad = _minimal()
    assert parse_pdf(bad.replace(b"<< /Length", b"<< /Filter /DCTDecode /Length")) is None
    # a supported filter name over data that is NOT that encoding also
    # rejects (here: raw text fed to the LZW decoder)
    assert parse_pdf(bad.replace(b"<< /Length", b"<< /Filter /LZWDecode /Length")) is None
    # inline image rejects whole
    assert parse_pdf(_minimal(b"BT (x) Tj ET BI /W 1 ID \x00 EI")) is None
    # startxref into bytes that are neither a table nor an indirect
    # object rejects whole
    assert parse_pdf(re.sub(rb"startxref\n(\d+)", rb"startxref\n9", ok)) is None


def test_prev_chain_incremental_update():
    """An incremental update appends a new object + xref with /Prev;
    the LATER table must win for the updated object."""
    base = _minimal()
    xr0 = int(re.search(rb"startxref\n(\d+)", base).group(1))
    new_content = b"BT (updated) Tj ET"
    add = f"4 0 obj\n<< /Length {len(new_content)} >>\nstream\n".encode()
    add += new_content + b"\nendstream\nendobj\n"
    off4 = len(base)
    out = bytearray(base) + add
    xr1 = len(out)
    out += b"xref\n4 1\n" + f"{off4:010d} 00000 n \n".encode()
    out += f"trailer\n<< /Size 5 /Root 1 0 R /Prev {xr0} >>\nstartxref\n{xr1}\n%%EOF\n".encode()
    got = parse_pdf(bytes(out))
    assert got is not None and got["text"] == "updated"


def test_nested_pages_tree_order():
    d = 2  # n_pages == 3 -> nested tree in synth
    got = parse_pdf(synth_pdf(d))
    assert got["n_pages"] == 3
    assert got["text"] == expected_pdf_row(d)["text"]


def test_frame_nulls_and_id_col(spark):
    df = spark.createDataFrame(
        [(1, bytearray(synth_pdf(1))), (2, bytearray(b"%PDF-1.4 junk")), (3, None)],
        "media_id long, blob binary",
    )
    out = {
        r["media_id"]: r
        for r in pdf_text_frame(df, id_col="media_id", payload_col="blob").collect()
    }
    assert out[1]["title"] == "Doc 1"
    assert out[2]["n_pages"] is None and out[3]["n_pages"] is None


def test_registered_oracle_matches_duckdb(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.queries import load_all

    fn = load_all()["pdf_text_extract"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(PDF_TEXT_ORACLE).fetchall()]
    assert len(got) == len(want) and got == want


def test_modern_roundtrip_grid():
    from danae_spark.multimodal.pdf import synth_pdf_modern

    for d in range(100):
        got = parse_pdf(synth_pdf_modern(d))
        want = dict(expected_pdf_row(d))
        want["n_objects"] += 2  # + objstm container + xref stream
        assert got == want, d


def test_modern_structure_rejections():
    from danae_spark.multimodal.pdf import synth_pdf_modern

    m_even = synth_pdf_modern(0)  # unpredicted xref stream
    m_odd = synth_pdf_modern(1)  # PNG Up predictor
    assert parse_pdf(m_even) is not None and parse_pdf(m_odd) is not None
    # corrupting the objstm header pair count breaks the whole file
    bad = m_even.replace(b"/Type /ObjStm /N ", b"/Type /ObjStm /N 1", 1)
    assert parse_pdf(bad) is None
    # an unknown xref-stream entry type rejects (flip W to [1 2 1] rows
    # by corrupting the declared /W widths)
    bad = m_even.replace(b"/W [1 2 1]", b"/W [2 2 1]", 1)
    assert parse_pdf(bad) is None
    # TIFF predictor is a declared reject
    bad = m_odd.replace(b"/Predictor 12", b"/Predictor 2", 1)
    assert parse_pdf(bad) is None


def test_modern_oracle_matches_duckdb(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.multimodal.pdf import PDF_TEXT_MODERN_ORACLE
    from danae_spark.queries import load_all

    fn = load_all()["pdf_text_modern"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(PDF_TEXT_MODERN_ORACLE).fetchall()]
    assert len(got) == len(want) and got == want


def test_cid_roundtrip_grid():
    from danae_spark.multimodal.pdf import expected_pdf_cid_row, synth_pdf_cid

    for d in range(80):
        assert parse_pdf(synth_pdf_cid(d)) == expected_pdf_cid_row(d), d


def test_cid_rejections():
    """The mojibake guards: Type0 without ToUnicode, predefined CMap
    encodings, unmapped CIDs, and Tf naming an unknown font all
    reject whole."""
    from danae_spark.multimodal.pdf import synth_pdf_cid

    ok = synth_pdf_cid(0)
    assert parse_pdf(ok) is not None
    # Type0 font without a ToUnicode CMap
    assert parse_pdf(ok.replace(b"/ToUnicode 5 0 R ", b"")) is None
    # predefined CMap encoding (not Identity-H/V): declared reject
    assert parse_pdf(ok.replace(b"/Identity-H", b"/GBK-EUC-H ", 1)) is None
    # an unmapped CID in shown text: <E500> maps to nothing
    bad = ok.replace(b"<0070", b"<E500", 1)  # first 'p' of the text
    assert parse_pdf(bad) is None
    # Tf naming a font absent from /Resources
    assert parse_pdf(ok.replace(b"/F1 12 Tf", b"/F9 12 Tf")) is None


def test_cid_tounicode_cmap_forms():
    """CMap parser details: bfrange base-increment, array destinations,
    bfchar, and reject-on-overflow of the base increment."""
    from danae_spark.multimodal.pdf import _Bad, _parse_tounicode

    cmap = (
        b"begincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"1 beginbfrange\n<0041> <0043> <0061>\nendbfrange\n"
        b"1 beginbfrange\n<0100> <0101> [<00660066> <0041>]\nendbfrange\n"
        b"1 beginbfchar\n<0200> <D83DDE00>\nendbfchar\n"
        b"endcmap"
    )
    dec = _parse_tounicode(cmap)
    assert dec.clen == 2
    assert dec("\x00\x41\x00\x42\x00\x43") == "abc"  # base-increment
    assert dec("\x01\x00") == "ff" and dec("\x01\x01") == "A"  # array dst
    assert dec("\x02\x00") == "\U0001f600"  # UTF-16 surrogate pair decodes
    try:
        dec("\x05\x00")
        assert False, "unmapped CID must raise"
    except _Bad:
        pass
    # mixed-length codespaces are a declared reject
    mixed = cmap.replace(b"1 begincodespacerange\n<0000> <FFFF>",
                         b"2 begincodespacerange\n<00> <FF>\n<0000> <FFFF>")
    try:
        _parse_tounicode(mixed)
        assert False
    except _Bad:
        pass


def test_filter_decoder_rejections():
    from danae_spark.multimodal.pdf import (
        _Bad,
        _ascii85_decode,
        _asciihex_decode,
        _lzw_decode,
        _lzw_encode,
        _runlength_decode,
    )

    for fn, bad in [
        (_asciihex_decode, b"4142"),            # missing '>' EOD
        (_asciihex_decode, b"41zz>"),           # non-hex digits
        (_asciihex_decode, b"41> junk"),        # bytes after EOD
        (_ascii85_decode, b"87cUR"),            # missing '~>' EOD
        (_ascii85_decode, b"8z7cUR~>"),         # z inside a group
        (_ascii85_decode, b"uuuuu~>"),          # group value overflow
        (_ascii85_decode, b"a~>"),              # 1-char final group
        (_runlength_decode, b"\x05hello"),      # missing EOD
        (_runlength_decode, b"\x04hello\x80x"), # bytes after EOD
        (_runlength_decode, b"\xfe"),           # repeat with no byte
        (_lzw_decode, b""),                     # truncated (no EOD)
        (_lzw_decode, b"\xff\xff\xff"),         # out-of-table code
    ]:
        try:
            fn(bad)
            assert False, (fn.__name__, bad)
        except _Bad:
            pass
    # LZW roundtrip across a clear-code boundary (~4k table entries)
    import random

    rng = random.Random(11)
    blob = bytes(rng.randrange(256) for _ in range(80_000))
    assert _lzw_decode(_lzw_encode(blob)) == blob


def test_cid_oracle_matches_duckdb(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.multimodal.pdf import PDF_TEXT_CID_ORACLE
    from danae_spark.queries import load_all

    fn = load_all()["pdf_text_cid"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(PDF_TEXT_CID_ORACLE).fetchall()]
    assert len(got) == len(want) and got == want


# ------------------------------------------------- encrypted PDFs (r12)


def test_encrypted_roundtrip_grid():
    from danae_spark.multimodal.pdf import (
        expected_pdf_encrypted_row,
        synth_pdf_encrypted,
    )

    # even docs: R2/V1 40-bit; odd docs: R3/V2 128-bit — both paths
    for d in range(60):
        assert parse_pdf(synth_pdf_encrypted(d)) == expected_pdf_encrypted_row(d), d


def test_encrypted_wrong_password_rejects():
    from danae_spark.multimodal.pdf import synth_pdf_encrypted

    # a garbled /U is byte-equivalent to "the empty user password does
    # not verify" — i.e. a non-empty-password document: reject whole
    assert parse_pdf(synth_pdf_encrypted(2, break_u=True)) is None  # R2
    assert parse_pdf(synth_pdf_encrypted(3, break_u=True)) is None  # R3


def test_encrypted_declared_rejects():
    from danae_spark.multimodal.pdf import synth_pdf_encrypted

    ok = synth_pdf_encrypted(5)
    # AES / crypt-filter era (V4+): declared reject
    assert parse_pdf(ok.replace(b"/V 2 /R 3", b"/V 4 /R 4")) is None
    # non-Standard security handler: declared reject (same-length name
    # keeps the xref offsets valid)
    assert parse_pdf(ok.replace(b"/Filter /Standard", b"/Filter /Custom00")) is None
    # missing /ID: the key derivation has no salt -> reject
    assert parse_pdf(ok.replace(b"/ID", b"/XD")) is None


def test_encrypted_key_tampering_rejects():
    from danae_spark.multimodal.pdf import synth_pdf_encrypted

    ok = synth_pdf_encrypted(7)
    # flipping /P changes the derived key -> /U verification fails
    assert parse_pdf(ok.replace(b"/P -44", b"/P -60")) is None
