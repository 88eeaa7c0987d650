"""RFC 7932 stored-mode brotli codec (r14): roundtrips, framing-edge
rejects, and the HTTP Content-Encoding wiring."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from danae_spark.multimodal.brotlistream import (
    _BitReader,
    _read_wbits,
    brotli_store,
    brotli_stored_decode,
)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=200_000))
def test_roundtrip(data):
    assert brotli_stored_decode(brotli_store(data)) == data


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=4096), st.integers(1, 8))
def test_truncation_rejects(data, cut):
    enc = brotli_store(data)
    assert brotli_stored_decode(enc[: len(enc) - cut]) is None


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=4096), st.binary(min_size=1, max_size=8))
def test_trailing_garbage_rejects(data, tail):
    assert brotli_stored_decode(brotli_store(data) + tail) is None


def test_multi_block_chunking():
    data = bytes(range(256)) * 300  # 76800 bytes -> two meta-blocks
    enc = brotli_store(data, chunk=65536)
    assert brotli_stored_decode(enc) == data
    enc_small = brotli_store(data, chunk=100)  # many blocks
    assert brotli_stored_decode(enc_small) == data


def test_all_wbits_values_parse():
    """§9.1: every legal WBITS (10..24 minus the reserved code) must
    parse; the reserved 4-bit-then-001 pattern must reject."""
    # WBITS=16 is the single bit 0
    r = _BitReader(bytes([0b0]))
    assert _read_wbits(r) == 16
    # n in 1..7 -> 17+n (bit layout LSB-first: 1 then n over 3 bits)
    for n in range(1, 8):
        r = _BitReader(bytes([1 | (n << 1)]))
        assert _read_wbits(r) == 17 + n
    # n=0, m=0 -> 17
    r = _BitReader(bytes([0b0000_0001]))
    assert _read_wbits(r) == 17
    # n=0, m=1 -> reserved -> None
    r = _BitReader(bytes([1 | (0 << 1) | (1 << 4)]))
    assert _read_wbits(r) is None
    # n=0, m in 2..7 -> 8+m
    for m in range(2, 8):
        r = _BitReader(bytes([1 | (m << 4)]))
        assert _read_wbits(r) == 8 + m


def test_compressed_meta_block_rejects():
    """A stream whose first data meta-block has ISUNCOMPRESSED=0 must
    reject (the compressed path is out of contract), never emit."""
    # header: WBITS=16 (0), ISLAST=0, MNIBBLES=0, MLEN-1=0 (16 bits),
    # ISUNCOMPRESSED=0 -> reject regardless of what follows
    bits = [0, 0, 0, 0] + [0] * 16 + [0]
    v = 0
    for i, b in enumerate(bits):
        v |= b << i
    raw = v.to_bytes((len(bits) + 7) // 8, "little") + b"\x00" * 8
    assert brotli_stored_decode(raw) is None


def test_nonzero_alignment_padding_rejects():
    """Corrupt a zero pad bit before the stored bytes: decode must
    reject rather than shift the copy window."""
    enc = bytearray(brotli_store(b"abcdef"))
    # byte 0 holds: wbits(1) islast(1) mnibbles(2) mlen[0:4]; the pad
    # sits in byte 2 (after 20 header bits) — set its top bit
    enc[2] |= 0x80
    assert brotli_stored_decode(bytes(enc)) is None


def test_metadata_block_skips():
    """Hand-build a stream with a metadata meta-block (MNIBBLES=3,
    MSKIPBYTES=1, skip 3 bytes) between two stored blocks."""
    from danae_spark.multimodal.brotlistream import _BitWriter

    w = _BitWriter()
    w.write(0, 1)  # WBITS=16
    w.write(0, 1)  # ISLAST=0
    w.write(0, 2)  # 4 nibbles
    w.write(1, 16)  # MLEN=2
    w.write(1, 1)  # uncompressed
    w.align()
    w.raw(b"ab")
    # metadata block: ISLAST=0, MNIBBLES code 3, reserved 0,
    # MSKIPBYTES=1, skip-len byte = 2 -> MSKIPLEN=3
    w.write(0, 1)
    w.write(3, 2)
    w.write(0, 1)
    w.write(1, 2)
    w.write(2, 8)
    w.align()
    w.raw(b"xyz")  # the skipped metadata
    w.write(0, 1)  # ISLAST=0
    w.write(0, 2)
    w.write(1, 16)  # MLEN=2
    w.write(1, 1)
    w.align()
    w.raw(b"cd")
    w.write(1, 1)  # ISLAST
    w.write(1, 1)  # ISLASTEMPTY
    w.align()
    assert brotli_stored_decode(bytes(w.buf)) == b"abcd"


def test_http_br_content_encoding_wired():
    """End to end through the HTTP layer: a br response decodes; a
    corrupted br body rejects the response (reject-whole)."""
    from danae_spark.multimodal.warc import _parse_http_response

    body = b"<html><body><p>hello brotli</p></body></html>"
    wire = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: br\r\n\r\n" + brotli_store(body)
    )
    got = _parse_http_response(wire)
    assert got is not None and got["body"] == body
    bad = wire[:-2]  # truncated stream
    assert _parse_http_response(bad) is None
