"""Fuzz gate for the r12 surfaces, mirroring the r9/r11 gates: every
parser must return a value or None on arbitrary / truncated /
bit-flipped bytes — never raise inside an executor task. Covers
encrypted PDFs (RC4 key derivation + per-object decryption), the
revisit capture walk, the extended charset grid (CJK/Cyrillic pages +
the mojibake-gated fallback), boilerplate-mode extraction, the
structured-data (JSON-LD/og) walk, and the syndicated curate grid's
WARC inputs."""

from hypothesis import given, settings
from hypothesis import strategies as st

from danae_spark.multimodal.htmltext import (
    parse_html_structured,
    parse_html_text,
    synth_boiler_html,
    synth_structured_html,
)
from danae_spark.multimodal.pdf import parse_pdf, synth_pdf_encrypted
from danae_spark.multimodal.warc import (
    synth_boiler_warc,
    synth_charset_warc,
    synth_revisit_warc,
    warc_captures,
)

_PARSERS = [
    parse_pdf,
    warc_captures,
    parse_html_structured,
    lambda p: parse_html_text(p, drop_boilerplate=True),
]

_SEEDS = [
    synth_pdf_encrypted(2),   # R2 / V1 / 40-bit
    synth_pdf_encrypted(3),   # R3 / V2 / 128-bit, Flate-then-RC4 streams
    synth_revisit_warc(3),    # revisits (gzip member-per-record)
    synth_revisit_warc(6),    # plain, multiple pages
    synth_charset_warc(4),    # the 10-page charset ladder incl. CJK
    synth_boiler_warc(3),     # mirror captures with differing farms
    synth_boiler_html(5),
    synth_structured_html(7),
]


def test_r12_parsers_never_crash_on_arbitrary_bytes():
    @settings(max_examples=200, deadline=None)
    @given(st.data())
    def fuzz(data):
        mode = data.draw(st.integers(0, 2))
        if mode == 0:
            payload = data.draw(st.binary(min_size=0, max_size=400))
        else:
            base = bytearray(_SEEDS[data.draw(st.integers(0, len(_SEEDS) - 1))])
            if mode == 1:  # truncate
                payload = bytes(base[: data.draw(st.integers(0, len(base)))])
            else:  # flip bytes
                for _ in range(data.draw(st.integers(1, 10))):
                    ix = data.draw(st.integers(0, len(base) - 1))
                    base[ix] = data.draw(st.integers(0, 255))
                payload = bytes(base)
        for parse in _PARSERS:
            parse(payload)  # must not raise; value or None both fine

    fuzz()


def test_r12_single_byte_flip_sweep():
    """Flip every 7th byte of each seed once: the parser either rejects
    (None) or returns a value — it never raises."""
    for seed in _SEEDS:
        b = bytes(seed)
        for ix in range(0, len(b), 7):
            mutated = b[:ix] + bytes([b[ix] ^ 0xFF]) + b[ix + 1 :]
            for parse in _PARSERS:
                parse(mutated)
