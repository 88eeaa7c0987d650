"""Full RFC 8878 zstd decoder (multimodal/zstdcodec.py).

Parity strategy mirrors test_brotli_codec.py: the reference encoder
(pyarrow's bundled zstd) produces fixtures across compression levels
and data shapes — low levels exercise predefined/RLE sequence tables,
high levels FSE-compressed tables and 4-stream Huffman literals,
multi-block inputs (>128 KiB) treeless literals and repeat table
modes. Byte-exact equality is the assertion, plus truncation /
bit-flip / garbage fuzz and a bit-flip differential against the
reference decoder.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from danae_spark.multimodal.zstdcodec import zstd_decode
from danae_spark.multimodal.zstdstream import zstd_store


def _comp(data: bytes, lvl: int) -> bytes:
    return pa.Codec("zstd", compression_level=lvl).compress(data, asbytes=True)


_SAMPLES = {
    "text": b"the quick brown fox jumps over the lazy dog " * 60,
    "repetitive": b"abcabcabc" * 1500,
    "json": b'{"key": "value", "items": [1, 2, 3], "flag": true} ' * 40,
    "single": b"x",
    "runs": b"".join(bytes([65 + i % 26]) * (1 + i % 29) for i in range(400)),
    "unicode": ("über straße naïve 中文 " * 120).encode(),
}


@pytest.mark.parametrize("name", sorted(_SAMPLES))
@pytest.mark.parametrize("lvl", [1, 3, 9, 19, 22])
def test_reference_encoder_roundtrip(name: str, lvl: int) -> None:
    data = _SAMPLES[name]
    assert zstd_decode(_comp(data, lvl)) == data


def test_incompressible_raw_blocks() -> None:
    rng = random.Random(31)
    data = bytes(rng.randrange(256) for _ in range(80_000))
    for lvl in (1, 19):
        assert zstd_decode(_comp(data, lvl)) == data


def test_multi_block_treeless_and_repeat_modes() -> None:
    # >128 KiB forces several blocks in one frame: later blocks reuse
    # Huffman tables (treeless) and FSE tables (repeat mode), and
    # matches cross block boundaries
    rng = random.Random(37)
    words = [b"training", b"pipeline", b"quality", b"the", b"corpus"]
    data = b" ".join(rng.choice(words) for _ in range(80_000))
    for lvl in (1, 3, 19):
        assert zstd_decode(_comp(data, lvl)) == data


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=2000), st.sampled_from([1, 3, 19]))
def test_roundtrip_property(data: bytes, lvl: int) -> None:
    if not data:
        assert zstd_decode(_comp(data, lvl)) in (b"", None)
        return
    assert zstd_decode(_comp(data, lvl)) == data


def test_truncation_rejects_every_prefix() -> None:
    data = b"truncation target with words repeated words " * 6
    c = _comp(data, 3)
    for cut in range(len(c)):
        assert zstd_decode(c[:cut]) != data


def test_bitflip_fuzz_never_raises() -> None:
    rng = random.Random(41)
    c = _comp(b"bit flip fuzz target for zstandard sequences " * 10, 9)
    for _ in range(800):
        buf = bytearray(c)
        i = rng.randrange(len(buf) * 8)
        buf[i >> 3] ^= 1 << (i & 7)
        zstd_decode(bytes(buf), max_out=1 << 22)


def test_garbage_fuzz_never_raises() -> None:
    rng = random.Random(43)
    for _ in range(500):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 120)))
        zstd_decode(blob, max_out=1 << 20)


def test_differential_against_reference() -> None:
    rng = random.Random(47)
    data = b"differential parity corpus for zstandard with text " * 12
    c = _comp(data, 9)
    ref = pa.Codec("zstd")
    checked = 0
    for _ in range(1500):
        buf = bytearray(c)
        i = rng.randrange(len(buf) * 8)
        buf[i >> 3] ^= 1 << (i & 7)
        s = bytes(buf)
        try:
            real = ref.decompress(s, decompressed_size=len(data), asbytes=True)
        except Exception:
            continue
        mine = zstd_decode(s, max_out=1 << 22)
        if mine is not None:
            assert mine == real
            checked += 1
    assert checked > 100


def test_stored_mode_superset_and_checksum() -> None:
    data = b"stored frames with checksum " * 500
    assert zstd_decode(zstd_store(data)) == data
    blob = bytearray(zstd_store(data))
    blob[20] ^= 0xFF
    assert zstd_decode(bytes(blob)) is None  # XXH64 catches the flip


def test_bomb_budget_rejects_whole() -> None:
    data = b"z" * 1_000_000
    c = _comp(data, 9)
    assert zstd_decode(c) == data
    assert zstd_decode(c, max_out=1000) is None


def test_trailing_garbage_and_empty() -> None:
    c = _comp(b"payload", 3)
    assert zstd_decode(c) == b"payload"
    assert zstd_decode(c + b"junk") is None
    assert zstd_decode(b"") is None


def test_skippable_frame_between_frames() -> None:
    c1 = _comp(b"frame one ", 3)
    c2 = _comp(b"frame two", 3)
    skip = (0x184D2A50).to_bytes(4, "little") + (5).to_bytes(4, "little") + b"abcde"
    assert zstd_decode(c1 + skip + c2) == b"frame one frame two"


def test_http_zstd_entropy_coded_wired() -> None:
    from danae_spark.multimodal.warc import _content_decode

    body = b"<html><body>" + b"<p>zstd coded page</p>" * 50 + b"</body></html>"
    for lvl in (3, 19):
        assert _content_decode(_comp(body, lvl), "zstd") == body
    blob = _comp(body, 3)
    assert _content_decode(blob[:-3], "zstd") is None
