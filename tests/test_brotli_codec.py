"""Full RFC 7932 brotli decoder (multimodal/brotlicodec.py).

Parity strategy: the reference encoder (pyarrow's bundled brotli)
produces the fixtures; different quality levels exercise disjoint
decoder feature sets — q0/q1 single trees and uncompressed blocks,
q5+ context maps and block splitting, q10/q11 static-dictionary
references and transforms. Byte-exact equality is the assertion.
Robustness: truncation, bit-flip, and garbage fuzz must never raise
and never return wrong-but-plausible output for truncations; the
decompression-bomb budget must reject whole, not truncate.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from danae_spark.multimodal.brotlicodec import brotli_decode
from danae_spark.multimodal.brotlistream import brotli_store


def _comp(data: bytes, q: int) -> bytes:
    return pa.Codec("brotli", compression_level=q).compress(data, asbytes=True)


_SAMPLES = {
    "text": b"the quick brown fox jumps over the lazy dog " * 40,
    "html": b'<html><head><script type="text/javascript">var x=1;</script>'
    b"</head><body>" + b"<p>content paragraph with words</p>" * 30 + b"</body></html>",
    "repetitive": b"abcabcabc" * 500,
    "json": b'{"key": "value", "items": [1, 2, 3], "flag": true} ' * 25,
    "single": b"x",
    "unicode": ("über straße naïve 中文 " * 100).encode(),
}


@pytest.mark.parametrize("name", sorted(_SAMPLES))
@pytest.mark.parametrize("q", [0, 1, 2, 5, 7, 9, 11])
def test_reference_encoder_roundtrip(name: str, q: int) -> None:
    data = _SAMPLES[name]
    assert brotli_decode(_comp(data, q)) == data


def test_incompressible_uses_uncompressed_blocks() -> None:
    rng = random.Random(11)
    data = bytes(rng.randrange(256) for _ in range(100_000))
    for q in (0, 1, 11):
        assert brotli_decode(_comp(data, q)) == data


def test_dictionary_and_transforms_exercised() -> None:
    # q11 on short common-word text emits static-dictionary references;
    # a decoder with a wrong dictionary or transform table fails here
    for data in (
        b"time down life left work",
        b"The first time the public sees the new information",
        b'<script type="text/javascript" src="http://www.example.com">',
    ):
        assert brotli_decode(_comp(data, 11)) == data


def test_stored_mode_superset() -> None:
    # the full decoder accepts everything the stored-mode encoder emits
    data = b"stored mode payload " * 1000
    assert brotli_decode(brotli_store(data)) == data


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=2000), st.sampled_from([1, 5, 11]))
def test_roundtrip_property(data: bytes, q: int) -> None:
    if not data:
        # pyarrow emits a valid empty stream; reject-whole applies to
        # empty INPUT, not empty output
        assert brotli_decode(_comp(data, q)) in (b"", None)
        return
    assert brotli_decode(_comp(data, q)) == data


def test_truncation_rejects_every_prefix() -> None:
    data = b"truncation test with enough text to form a few commands " * 4
    c = _comp(data, 9)
    for cut in range(len(c)):
        assert brotli_decode(c[:cut]) != data


def test_bitflip_fuzz_never_raises() -> None:
    rng = random.Random(13)
    data = b"bit flip fuzz target with dictionary words like time and down " * 8
    c = _comp(data, 9)
    for _ in range(800):
        buf = bytearray(c)
        i = rng.randrange(len(buf) * 8)
        buf[i >> 3] ^= 1 << (i & 7)
        brotli_decode(bytes(buf), max_out=1 << 22)  # must not raise


def test_garbage_fuzz_never_raises() -> None:
    rng = random.Random(17)
    for _ in range(500):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 120)))
        brotli_decode(blob, max_out=1 << 20)


def test_trailing_garbage_rejects() -> None:
    c = _comp(b"payload", 5)
    assert brotli_decode(c) == b"payload"
    assert brotli_decode(c + b"\x00") is None
    assert brotli_decode(c + b"junk") is None


def test_bomb_budget_rejects_whole() -> None:
    data = b"z" * 1_000_000
    c = _comp(data, 9)
    assert brotli_decode(c) == data
    out = brotli_decode(c, max_out=1000)
    assert out is None  # reject-whole, never a truncated prefix


def test_empty_input_rejects() -> None:
    assert brotli_decode(b"") is None


def test_differential_against_reference() -> None:
    """Where the reference decoder accepts a mutated stream, ours must
    produce the identical bytes (strictness differences — trailing
    padding — may make ours reject, never disagree)."""
    rng = random.Random(19)
    data = b"differential parity corpus with repeated words and text " * 10
    c = _comp(data, 9)
    ref = pa.Codec("brotli")
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
        mine = brotli_decode(s, max_out=1 << 22)
        if mine is not None:
            assert mine == real
            checked += 1
    assert checked > 100  # the corpus actually exercised agreement


def test_http_br_entropy_coded_wired() -> None:
    """_content_decode ships entropy-coded br bodies end to end."""
    from danae_spark.multimodal.warc import _content_decode

    body = b"<html><body>" + b"<p>entropy coded page</p>" * 50 + b"</body></html>"
    for q in (5, 11):
        assert _content_decode(_comp(body, q), "br") == body
    # truncated body: reject-whole
    blob = _comp(body, 5)
    assert _content_decode(blob[:-3], "br") is None
