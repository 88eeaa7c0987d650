"""Fuzz gate for the r11 crawl/document surfaces: every parser must
return a value or None on arbitrary / truncated / bit-flipped bytes —
never raise inside an executor task. Mirrors the r9 media fuzz gate
(tests/test_media_fuzz.py) over the r11 additions: CID-font PDFs with
the full filter grid, HTTP-decoded WARCs (chunked/gzip wires), WET/WAT
sidecars, charset-routing crawls, streamed/zip64 archives, sitemap
bundles, RDF feeds, link extraction, and the harvest dispatcher."""

from hypothesis import given, settings
from hypothesis import strategies as st

from danae_spark.multimodal.archive import parse_archive, synth_archive
from danae_spark.multimodal.harvest import harvest_text
from danae_spark.multimodal.htmltext import extract_links, parse_html_text
from danae_spark.multimodal.pdf import parse_pdf, synth_pdf_cid
from danae_spark.multimodal.warc import (
    iter_warc_responses,
    iter_wat_pages,
    iter_wet_texts,
    parse_warc,
    synth_charset_warc,
    synth_warc,
    synth_wat,
    synth_wet,
)
from danae_spark.operators.feeds import parse_feed, synth_feed
from danae_spark.operators.frontier import synth_frontier_sitemap
from danae_spark.operators.sitemap import parse_sitemap_bundle, synth_sitemap_bundle

_PARSERS = [
    parse_pdf,
    parse_warc,
    lambda p: list(iter_warc_responses(p)),
    lambda p: list(iter_wet_texts(p)),
    lambda p: list(iter_wat_pages(p)),
    parse_archive,
    parse_sitemap_bundle,
    parse_feed,
    parse_html_text,
    extract_links,
    harvest_text,
]

_SEEDS = [
    synth_pdf_cid(3),      # CID font + ASCII85 filter
    synth_pdf_cid(5),      # LZW filter
    synth_pdf_cid(6),      # chain filter
    synth_warc(2),         # gzip content-encoding wire
    synth_warc(3),         # gzip member-per-record + chunked wire
    synth_charset_warc(4), # charset ladder pages
    synth_wet(3),
    synth_wat(3),
    synth_archive(0),      # zip64 + data descriptors (d%6==0, d%9==0)
    synth_archive(6),      # streamed zip
    synth_sitemap_bundle(2),
    synth_feed(2),         # RDF
    synth_feed(0),         # rss 0.91
    synth_frontier_sitemap(3),
]


def test_r11_parsers_never_crash_on_arbitrary_bytes():
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
            parse(payload)  # must not raise; value or None/[] both fine

    fuzz()


def test_r11_single_byte_flip_sweep():
    """Deterministic exhaustive-ish sweep: flip every 7th byte of each
    seed once; the parser either rejects (None/[]) or returns a value —
    it never raises and never returns a half-parsed crash object."""
    for seed in _SEEDS:
        b = bytes(seed)
        for ix in range(0, len(b), 7):
            flipped = b[:ix] + bytes([b[ix] ^ 0xA5]) + b[ix + 1 :]
            for parse in _PARSERS:
                parse(flipped)


def test_resolve_reference_never_crashes():
    from danae_spark.operators.urlops import resolve_reference

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=60), st.text(max_size=60))
    def fuzz(base, ref):
        got = resolve_reference(base, ref)
        assert got is None or got.startswith(("http://", "https://"))

    fuzz()
    # and over realistic bases with arbitrary refs
    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=60))
    def fuzz2(ref):
        got = resolve_reference("https://h.example/a/b?x=1", ref)
        assert got is None or got.startswith("https://h.example")

    fuzz2()
