"""Round-13 ADVICE fixes.

1. WHATWG bare script-name labels ('cyrillic'/'greek'/'greek8'/
   'arabic') map to their ISO-8859 pages, not windows-125x.
2. BOM-less utf-16 label decodes run a swapped-endianness gate; BOM'd
   pages keep routing (and BOM-stripping) through the step-1 sniff.
3. WET walks validate up front but decode lazily (iter_wet_texts
   holds one page's text at a time).
4. ZIP data-descriptor acceptance ordering: a present PK\x07\x08
   signature makes the signed framing authoritative; the unsigned
   fallback is consulted only for the genuine CRC==0x08074B50
   ambiguity.
"""

from __future__ import annotations

import struct
import zlib

from danae_spark.multimodal.archive import parse_archive
from danae_spark.multimodal.htmltext import (
    _decode_page,
    _LEGACY_CHARSETS,
    _utf16_swapped,
    parse_html_text,
)
from danae_spark.multimodal.warc import _record, iter_wet_texts, wet_texts


# ------------------------------------------- bare script-name labels


def test_bare_script_labels_map_to_iso8859():
    assert _LEGACY_CHARSETS["cyrillic"] == "iso8859-5"
    assert _LEGACY_CHARSETS["greek"] == "iso8859-7"
    assert _LEGACY_CHARSETS["greek8"] == "iso8859-7"
    assert _LEGACY_CHARSETS["arabic"] == "iso8859-6"
    # the windows labels themselves stay on the windows pages
    assert _LEGACY_CHARSETS["windows-1251"] == "windows-1251"
    assert _LEGACY_CHARSETS["windows-1253"] == "windows-1253"
    assert _LEGACY_CHARSETS["windows-1256"] == "windows-1256"


def test_cyrillic_label_decodes_iso8859_5_bytes():
    # ISO-8859-5 and windows-1251 lay Cyrillic out at DIFFERENT bytes;
    # under the old windows-1251 mapping this round-trip corrupts
    text = "русский текст данные"
    page = f"<html><body><p>{text}</p></body></html>".encode("iso8859-5")
    got = parse_html_text(page, "cyrillic")
    assert got is not None and got["text"] == text
    # and the corruption the old mapping produced is NOT the input
    moji = page.decode("windows-1251")
    assert text not in moji


# -------------------------------------------------- utf-16 BOM / gate


def _page(text: str) -> str:
    return f"<html><head><title>t</title></head><body><p>{text}</p></body></html>"


def test_utf16_bom_pages_route_and_strip():
    text = "hello utf sixteen page"
    for codec, bom in (("utf-16-le", b"\xff\xfe"), ("utf-16-be", b"\xfe\xff")):
        payload = bom + _page(text).encode(codec)
        decoded = _decode_page(payload, "utf-16")
        assert decoded is not None
        assert not decoded.startswith("﻿")
        got = parse_html_text(payload, "utf-16")
        assert got is not None and got["text"] == text


def test_utf16_bomless_correct_endianness_decodes():
    text = "plain bomless little endian"
    assert parse_html_text(_page(text).encode("utf-16-le"), "utf-16")["text"] == text
    assert parse_html_text(_page(text).encode("utf-16-be"), "utf-16be")["text"] == text


def test_utf16_bomless_swapped_endianness_rejects():
    text = "big endian bytes read as little endian become cjk garbage"
    be = _page(text).encode("utf-16-be")
    le = _page(text).encode("utf-16-le")
    # 'utf-16'/'ucs-2' select the LE decoder: BE bytes must reject
    assert _decode_page(be, "utf-16") is None
    assert _decode_page(be, "ucs-2") is None
    # and LE bytes under the BE label reject symmetrically
    assert _decode_page(le, "utf-16be") is None


def test_utf16_swapped_gate_spares_real_cjk():
    # genuine CJK text correctly decoded must NOT trip the gate: CJK
    # code points rarely end in a 0x00 low byte
    for text in ("日本語のテスト文書ですこれは本文", "한국어 테스트 문서입니다", "中文测试页面的内容这是正文"):
        assert not _utf16_swapped(_page(text))
        payload = text.encode("utf-16-le")
        assert _decode_page(payload, "utf-16") == text


# ----------------------------------------------------- WET laziness


def _wet(bodies: list[bytes]) -> bytes:
    recs = [
        _record(
            "conversion",
            i,
            b,
            {"WARC-Target-URI": f"http://h.example/p{i}", "Content-Type": "text/plain"},
        )
        for i, b in enumerate(bodies)
    ]
    return b"".join(recs)


def test_iter_wet_is_lazy_but_validates_up_front():
    payload = _wet([b"alpha beta", b"gamma delta", b"epsilon"])
    it = iter_wet_texts(payload)
    first = next(it)
    assert first == ("http://h.example/p0", "alpha beta")
    assert [t for _u, t in it] == ["gamma delta", "epsilon"]
    # one bad record: the iterator yields NOTHING (not a prefix)
    bad = _wet([b"alpha beta", b"\xff\xfe bad utf8 \x80"])
    assert list(iter_wet_texts(bad)) == []
    assert wet_texts(bad) is None


# ------------------------------------- ZIP descriptor acceptance order


def _zip_dd_signed(name: bytes, data: bytes, desc_values=None) -> bytes:
    """One STORED streamed-writer member with a SIGNED data descriptor;
    desc_values overrides the descriptor's (crc, csize, usize) triple
    to model a corrupt descriptor."""
    crc = zlib.crc32(data)
    dvals = desc_values if desc_values is not None else (crc, len(data), len(data))
    out = bytearray()
    out += b"PK\x03\x04" + struct.pack(
        "<HHHHHIIIHH", 20, 0x0008, 0, 0, 0, 0, 0, 0, len(name), 0
    )
    out += name + data
    out += b"PK\x07\x08" + struct.pack("<III", *dvals)
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


def test_zip_signed_descriptor_good_passes():
    got = parse_archive(_zip_dd_signed(b"a.txt", b"some stored bytes"))
    assert got is not None and got["n_members"] == 1


def test_zip_signed_descriptor_corrupt_rejects():
    data = b"some stored bytes"
    # wrong csize in the signed framing: must reject — the signature
    # makes the signed reading authoritative
    bad = _zip_dd_signed(b"a.txt", data, desc_values=(zlib.crc32(data), 999, len(data)))
    assert parse_archive(bad) is None
    bad2 = _zip_dd_signed(b"a.txt", data, desc_values=(0xDEADBEEF, len(data), len(data)))
    assert parse_archive(bad2) is None
