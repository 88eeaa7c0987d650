"""Round-12 ADVICE regression tests:

1. WET/WAT reject-whole: a file whose LAST record is malformed yields
   nothing (not a valid prefix) — validation happens before any yield.
2. ZIP data-descriptor ambiguity: a signature-less descriptor whose
   CRC equals 0x08074B50 (the optional PK\\x07\\x08 magic) parses.
3. A relative <base href> resolves against the page URI before
   anchors resolve against it (HTML spec), instead of dropping the
   page's whole link set.
4. PDF /Resources inherits down the /Pages tree (ISO 32000-1
   §7.7.3.4); a page that SHOWS text with no resolvable resources
   rejects whole instead of decoding Type0 strings as Latin-1.
"""

from __future__ import annotations

import struct
import zlib

from danae_spark.multimodal.archive import parse_archive
from danae_spark.multimodal.harvest import harvest_text
from danae_spark.multimodal.pdf import parse_pdf
from danae_spark.multimodal.warc import _record, wat_pages, wet_texts

# ---------------------------------------------------------------- WET/WAT


def _wet(bodies: list[bytes]) -> bytes:
    recs = [
        _record(
            "conversion",
            i + 1,
            b,
            {"WARC-Target-URI": f"http://h.example/p{i}", "Content-Type": "text/plain"},
        )
        for i, b in enumerate(bodies)
    ]
    return b"".join(recs)


def test_wet_good_then_bad_rejects_whole():
    payload = _wet([b"good text one", b"\xff\xfe not utf-8 \x81"])
    assert wet_texts(payload) is None
    # the harvest dispatcher must ship NOTHING from such a file
    assert harvest_text(payload) is None or harvest_text(payload).get("text") in (None, "")


def test_wet_all_good_passes():
    got = wet_texts(_wet([b"alpha beta", b"gamma delta"]))
    assert got == [
        ("http://h.example/p0", "alpha beta"),
        ("http://h.example/p1", "gamma delta"),
    ]


def test_wat_good_then_bad_rejects_whole():
    good = (
        b'{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":'
        b'{"HTML-Metadata":{"Head":{"Title":"T"},"Links":[{"url":"/a"}]}}}}}'
    )
    bad = b"{not json"
    recs = [
        _record("metadata", 1, good, {"WARC-Target-URI": "http://h.example/p0",
                                      "Content-Type": "application/json"}),
        _record("metadata", 2, bad, {"WARC-Target-URI": "http://h.example/p1",
                                     "Content-Type": "application/json"}),
    ]
    assert wat_pages(b"".join(recs)) is None


def test_wat_all_good_passes():
    good = (
        b'{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":'
        b'{"HTML-Metadata":{"Head":{"Title":"T"},"Links":[{"url":"/a"}]}}}}}'
    )
    recs = [_record("metadata", 1, good,
                    {"WARC-Target-URI": "http://h.example/p0",
                     "Content-Type": "application/json"})]
    assert wat_pages(b"".join(recs)) == [("http://h.example/p0", "T", ["/a"])]


# ------------------------------------------------- ZIP descriptor ambiguity


def _crc32_forge(data: bytes, target: int) -> bytes:
    """Four suffix bytes s making crc32(data + s) == target. For a
    fixed message length, crc32 is AFFINE over GF(2) in the message
    bits — so solve the 32x32 linear system directly (xor basis with
    column tracking); the 4-byte-suffix map is bijective."""
    base = zlib.crc32(data + b"\x00\x00\x00\x00")
    basis: dict[int, tuple[int, int]] = {}  # high bit -> (value, column mask)
    for j in range(32):
        v = zlib.crc32(data + (1 << j).to_bytes(4, "little")) ^ base
        mask = 1 << j
        while v:
            h = v.bit_length() - 1
            if h not in basis:
                basis[h] = (v, mask)
                break
            bv, bm = basis[h]
            v ^= bv
            mask ^= bm
    v, mask = base ^ target, 0
    while v:
        bv, bm = basis[v.bit_length() - 1]
        v ^= bv
        mask ^= bm
    return mask.to_bytes(4, "little")


def test_crc32_forge_helper():
    s = _crc32_forge(b"hello world", 0x08074B50)
    assert zlib.crc32(b"hello world" + s) == 0x08074B50


def _zip_dd_no_signature(name: bytes, data: bytes) -> bytes:
    """One STORED member written by a streamed writer (GP bit 3, zeroed
    local sizes) whose data descriptor omits the optional PK\\x07\\x08
    signature — the descriptor's first field is the raw CRC."""
    crc = zlib.crc32(data)
    out = bytearray()
    out += b"PK\x03\x04" + struct.pack(
        "<HHHHHIIIHH", 20, 0x0008, 0, 0, 0, 0, 0, 0, len(name), 0
    )
    out += name + data
    out += struct.pack("<III", crc, len(data), len(data))  # no signature
    cd_off = len(out)
    central = (
        b"PK\x01\x02"
        + struct.pack(
            "<HHHHHHIIIHHHHHII",
            20, 20, 0x0008, 0, 0, 0, crc, len(data), len(data),
            len(name), 0, 0, 0, 0, 0, 0,
        )
        + name
    )
    out += central
    out += b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, 1, 1, len(central), cd_off, 0
    )
    return bytes(out)


def test_zip_descriptorless_signature_collision():
    # data whose CRC IS the descriptor magic: a signature-less
    # descriptor starts with bytes PK\x07\x08 purely by value collision
    data = b"hello world" + _crc32_forge(b"hello world", 0x08074B50)
    assert zlib.crc32(data) == 0x08074B50
    got = parse_archive(_zip_dd_no_signature(b"a.txt", data))
    assert got is not None and got["n_members"] == 1


def test_zip_descriptorless_plain_crc():
    # ... and the common signature-less case (arbitrary CRC) also parses
    got = parse_archive(_zip_dd_no_signature(b"b.txt", b"plain old bytes"))
    assert got is not None and got["n_members"] == 1


# ------------------------------------------------------ relative base href


def test_relative_base_href_resolves_against_page(spark):
    from danae_spark.operators.frontier import page_links_frame

    html = (
        b'<html><head><base href="/sub/"><title>t</title></head>'
        b'<body><a href="x.html">x</a><a href="../top.html">t</a></body></html>'
    )
    resp = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" + html
    warc = _record(
        "response", 1, resp,
        {"WARC-Target-URI": "http://h.example/a/b.html",
         "Content-Type": "application/http;msgtype=response"},
    )
    df = spark.createDataFrame([(1, bytearray(warc))], "doc_id long, payload binary")
    rows = {r["href_raw"]: r["url_abs"] for r in page_links_frame(df).collect()}
    assert rows["x.html"] == "http://h.example/sub/x.html"
    assert rows["../top.html"] == "http://h.example/top.html"


# ----------------------------------------------- PDF resources inheritance


def _mini_pdf(page_has_resources: bool, pages_has_resources: bool) -> bytes:
    objects: dict[int, bytes] = {}
    res = b"/Resources << /Font << /F1 3 0 R >> >> "
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        b"<< /Type /Pages /Kids [4 0 R] /Count 1 "
        + (res if pages_has_resources else b"")
        + b">>"
    )
    objects[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    objects[4] = (
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 5 0 R "
        + (res if page_has_resources else b"")
        + b">>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (inherited text) Tj ET"
    objects[5] = (
        f"<< /Length {len(content)} >>".encode() + b"\nstream\n" + content + b"\nendstream"
    )
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 6\n0000000000 65535 f \n"
    for num in range(1, 6):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def test_pdf_resources_inherited_from_pages_node():
    got = parse_pdf(_mini_pdf(page_has_resources=False, pages_has_resources=True))
    assert got is not None and got["text"] == "inherited text"


def test_pdf_own_resources_still_work():
    got = parse_pdf(_mini_pdf(page_has_resources=True, pages_has_resources=False))
    assert got is not None and got["text"] == "inherited text"


def test_pdf_text_with_no_resources_rejects():
    # text shown on a page with NO resolvable /Resources anywhere must
    # reject whole (mojibake guard), never Latin-1 passthrough
    assert parse_pdf(_mini_pdf(page_has_resources=False, pages_has_resources=False)) is None


# --------------------------------------------- WARC revisit records (r12)


def test_revisit_grid_walk_and_dedup():
    from danae_spark.multimodal.warc import synth_revisit_warc, warc_captures

    for d in range(30):
        caps = warc_captures(synth_revisit_warc(d))
        assert caps is not None, d
        responses = [c for c in caps if c[0] == "response"]
        revisits = [c for c in caps if c[0] == "revisit"]
        # every revisit resolves to a response URI present in the file
        resp_uris = {c[1] for c in responses}
        for _k, uri, _n, orig in revisits:
            assert orig == uri and orig in resp_uris
        # exactly the e % 3 == 0 pages revisit
        want = {
            f"http://site{d % 5}.example/p{p}"
            for p in range(1 + d % 3)
            if (d + p) % 5 != 4 and (d * 4 + p) % 3 == 0
        }
        assert {c[1] for c in revisits} == want, d


def test_revisit_malformations_reject_whole():
    from danae_spark.multimodal.warc import synth_revisit_warc, warc_captures

    ok = synth_revisit_warc(6)  # plain (even): byte-editable
    assert warc_captures(ok) is not None
    # unknown profile rejects
    bad = ok.replace(b"/revisit/identical-payload-digest", b"/revisit/unknown-profile-x12345")
    assert warc_captures(bad) is None
    # missing WARC-Refers-To rejects (same-length header name swap)
    bad = ok.replace(b"WARC-Refers-To:", b"XARC-Refers-To:")
    assert warc_captures(bad) is None
    # dangling refers-to WITH a target URI falls back (cross-file shape)
    moved = ok.replace(
        b"WARC-Refers-To: <urn:uuid:00000000-0000-4000-8000-000000000601>",
        b"WARC-Refers-To: <urn:uuid:00000000-0000-4000-8000-000000999999>",
    )
    got = warc_captures(moved)
    assert got is not None
    revisit = next(c for c in got if c[0] == "revisit")
    assert revisit[3] == revisit[1]  # resolved via Refers-To-Target-URI
    # dangling refers-to WITHOUT a target URI rejects
    bad = moved.replace(b"WARC-Refers-To-Target-URI:", b"XARC-Refers-To-Target-URI:")
    assert warc_captures(bad) is None


def test_revisit_rows_skip_extraction(spark, sf_dir):
    from danae_spark.multimodal.warc import crawl_revisit_dedup_roundtrip

    rows = crawl_revisit_dedup_roundtrip(spark, sf_dir).collect()
    rev = [r for r in rows if r["kind"] == "revisit"]
    resp = [r for r in rows if r["kind"] == "response"]
    assert rev and resp
    assert all(r["text"] is None and r["is_keeper"] == 0 for r in rev)
    assert all(r["text"] is not None and r["is_keeper"] == 1 for r in resp)
    # cluster accounting: each revisit's original reports the same n_dup
    by_uri = {(r["doc_id"], r["uri"]): r for r in resp}
    for r in rev:
        orig = by_uri[(r["doc_id"], r["refers_uri"])]
        assert orig["n_dup"] == r["n_dup"] == 2
