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


# ----------------------------- zstd (RFC 8878 Raw/RLE frame subset)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=200_000))
def test_zstd_roundtrip(data):
    from danae_spark.multimodal.zstdstream import zstd_store, zstd_stored_decode

    assert zstd_stored_decode(zstd_store(data)) == data
    assert zstd_stored_decode(zstd_store(data, checksum=False)) == data


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=4096), st.integers(1, 8))
def test_zstd_truncation_and_garbage_reject(data, cut):
    from danae_spark.multimodal.zstdstream import zstd_store, zstd_stored_decode

    enc = zstd_store(data)
    assert zstd_stored_decode(enc[: len(enc) - cut]) is None
    assert zstd_stored_decode(enc + b"x") is None


def test_zstd_xxh64_public_vectors():
    from danae_spark.multimodal.zstdstream import xxh64

    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    assert xxh64(b"abcd") == 0xDE0327B0D25D92CC


def test_zstd_checksum_catches_corruption():
    from danae_spark.multimodal.zstdstream import zstd_store, zstd_stored_decode

    enc = bytearray(zstd_store(b"the content that will be corrupted"))
    enc[20] ^= 0xFF
    assert zstd_stored_decode(bytes(enc)) is None


def test_zstd_rle_blocks_and_skippable_frames():
    from danae_spark.multimodal.zstdstream import zstd_stored_decode, zstd_store

    # hand-build: skippable frame + a frame with one RLE block
    skip = (0x184D2A50).to_bytes(4, "little") + (3).to_bytes(4, "little") + b"xyz"
    frame = bytearray()
    frame += (0xFD2FB528).to_bytes(4, "little")
    frame.append(0)  # descriptor: no FCS beyond flag 0 + not single-segment
    frame.append(20 << 3)  # window descriptor
    hdr = 1 | (1 << 1) | (5 << 3)  # last, RLE, size 5
    frame += hdr.to_bytes(3, "little") + b"Q"
    assert zstd_stored_decode(skip + bytes(frame)) == b"QQQQQ"
    # compressed block type rejects
    bad = bytearray(zstd_store(b"zz"))
    # block header starts at 14 (magic4+desc1+wd1+fcs8): set type=2
    h = int.from_bytes(bad[14:17], "little")
    h = (h & ~0b110) | (2 << 1)
    bad[14:17] = h.to_bytes(3, "little")
    assert zstd_stored_decode(bytes(bad)) is None


def test_http_zstd_content_encoding_wired():
    from danae_spark.multimodal.warc import _parse_http_response
    from danae_spark.multimodal.zstdstream import zstd_store

    body = b"<html><body><p>hello zstd</p></body></html>"
    wire = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: zstd\r\n\r\n" + zstd_store(body)
    )
    got = _parse_http_response(wire)
    assert got is not None and got["body"] == body
    assert _parse_http_response(wire[:-1]) is None
