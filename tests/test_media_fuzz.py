"""Cross-format fuzz gate for the r9 media parsers: every parser in
the engine must return a value or None on arbitrary bytes — never
raise inside an executor task. Extends the r7 image/WAV fuzz
(tests/test_pixels.py) to the full r9 surface: FLAC, Ogg, WebM, MP3
side-info, MP4 sample tables, fragmented MP4, subtitles, ID3."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from danae_spark.multimodal.flac import decode_flac, synth_flac_pcm
from danae_spark.multimodal.id3 import parse_id3, synth_id3_mp3
from danae_spark.multimodal.mp3 import parse_mp3_stream, synth_mp3_stream
from danae_spark.multimodal.mp4 import (
    parse_mp4_fragments,
    parse_mp4_samples,
    synth_fmp4,
    synth_mp4,
)
from danae_spark.multimodal.ogg import parse_ogg, synth_ogg
from danae_spark.multimodal.subtitles import parse_subtitles, synth_subtitles
from danae_spark.multimodal.webm import parse_webm, synth_webm
from danae_spark.multimodal.webp import parse_webp, synth_webp_census

_PARSERS = [
    decode_flac,
    parse_ogg,
    parse_webm,
    parse_mp3_stream,
    parse_mp4_samples,
    parse_mp4_fragments,
    parse_subtitles,
    parse_id3,
    parse_webp,
]

_SEEDS = [
    synth_flac_pcm(3, 512),
    synth_ogg(4),
    synth_ogg(5),
    synth_webm(6),
    synth_mp3_stream(7),
    synth_mp4(8),
    synth_fmp4(9),
    synth_subtitles(10),
    synth_id3_mp3(11),
    synth_webp_census(0),   # VP8L lossless still (r16)
    synth_webp_census(2),   # lossy VP8 keyframe (r16)
]


def test_r9_parsers_never_crash_on_arbitrary_bytes():
    @settings(max_examples=250, deadline=None)
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
            parse(payload)  # value or None, never an exception

    fuzz()


def test_cross_format_dispatch_never_confuses():
    """Every seed fed to every OTHER format's parser returns None (or a
    valid parse for genuinely overlapping formats — there are none in
    this set), never raises — the crawl reality where a .mp3 file
    holds a WebM stream and vice versa."""
    # seed index → parser indices that legitimately accept it; the
    # ID3+MPEG seed (8) is BOTH an ID3 tag and a real MP3 stream (the
    # mp3 walker skips the tag by design)
    owners = [{0}, {1}, {1}, {2}, {3}, {4}, {5}, {6}, {7, 3}, {8}, {8}]
    for si, seed in enumerate(_SEEDS):
        for pi, parse in enumerate(_PARSERS):
            out = parse(seed)
            if pi in owners[si]:
                assert out is not None, (si, pi)
            else:
                assert out is None, (si, pi)


def test_r10_triage_and_ogg_tags_never_crash():
    """The r10 entry points join the fuzz gate: triage_payload and
    parse_ogg_tags must return a value or None on arbitrary bytes,
    truncations, and byte-flips of every format's seed."""
    from danae_spark.multimodal.ogg import parse_ogg_tags, synth_ogg_tagged
    from danae_spark.multimodal.triage import triage_payload
    from danae_spark.multimodal.webm import parse_mkv_tags, synth_webm_tagged

    seeds = _SEEDS + [
        synth_ogg_tagged(12), synth_ogg_tagged(13), synth_webm_tagged(14)
    ]

    @settings(max_examples=150, deadline=None)
    @given(st.data())
    def fuzz(data):
        mode = data.draw(st.integers(0, 2))
        if mode == 0:
            payload = data.draw(st.binary(min_size=0, max_size=400))
        else:
            base = bytearray(seeds[data.draw(st.integers(0, len(seeds) - 1))])
            if mode == 1:
                payload = bytes(base[: data.draw(st.integers(0, len(base)))])
            else:
                for _ in range(data.draw(st.integers(1, 10))):
                    ix = data.draw(st.integers(0, len(base) - 1))
                    base[ix] = data.draw(st.integers(0, 255))
                payload = bytes(base)
        triage_payload(payload)
        parse_ogg_tags(payload)
        parse_mkv_tags(payload)

    fuzz()
    # dispatch sanity on clean seeds: triage classifies every format's
    # seed; each tag extractor accepts exactly its own tagged seeds
    for si, seed in enumerate(seeds):
        assert triage_payload(seed) is not None, si
        assert (parse_ogg_tags(seed) is not None) == (seed[:4] == b"OggS"), si
        is_tagged_mkv = si == len(seeds) - 1
        assert (parse_mkv_tags(seed) is not None) == is_tagged_mkv, si


def test_r10_crawl_parsers_never_crash():
    """The crawl-ingestion parsers join the fuzz gate: parse_warc and
    parse_html_text must return a value or None on arbitrary bytes,
    truncations, and byte-flips of every seed (including each other's
    and the media formats'). HTML is exempt from the mutual-exclusion
    matrix by design — plain text is a valid HTML body — but WARC is
    not: no media seed may walk as a WARC."""
    from danae_spark.multimodal.htmltext import parse_html_text, synth_html
    from danae_spark.multimodal.warc import parse_warc, synth_warc

    seeds = _SEEDS + [synth_html(12), synth_warc(13), synth_warc(14)]

    @settings(max_examples=150, deadline=None)
    @given(st.data())
    def fuzz(data):
        mode = data.draw(st.integers(0, 2))
        if mode == 0:
            payload = data.draw(st.binary(min_size=0, max_size=400))
        else:
            base = bytearray(seeds[data.draw(st.integers(0, len(seeds) - 1))])
            if mode == 1:
                payload = bytes(base[: data.draw(st.integers(0, len(base)))])
            else:
                for _ in range(data.draw(st.integers(1, 10))):
                    ix = data.draw(st.integers(0, len(base) - 1))
                    base[ix] = data.draw(st.integers(0, 255))
                payload = bytes(base)
        parse_warc(payload)
        parse_html_text(payload)

    fuzz()
    # dispatch sanity on clean seeds
    for si, seed in enumerate(seeds):
        is_warc = si >= len(_SEEDS) + 1
        assert (parse_warc(seed) is not None) == is_warc, si
        # no media parser accepts the crawl seeds
        if si >= len(_SEEDS):
            for parse in _PARSERS:
                assert parse(seed) is None, si


def test_r10_pdf_and_archive_never_crash():
    """parse_pdf and parse_archive join the fuzz gate: value or None
    on arbitrary bytes, truncations, and byte-flips of every seed;
    dispatch sanity pins that each accepts exactly its own seeds."""
    from danae_spark.multimodal.archive import parse_archive, synth_archive
    from danae_spark.multimodal.pdf import parse_pdf, synth_pdf

    seeds = _SEEDS + [synth_pdf(12), synth_archive(12), synth_archive(13), synth_archive(14)]

    @settings(max_examples=120, deadline=None)
    @given(st.data())
    def fuzz(data):
        mode = data.draw(st.integers(0, 2))
        if mode == 0:
            payload = data.draw(st.binary(min_size=0, max_size=400))
        else:
            base = bytearray(seeds[data.draw(st.integers(0, len(seeds) - 1))])
            if mode == 1:
                payload = bytes(base[: data.draw(st.integers(0, len(base)))])
            else:
                for _ in range(data.draw(st.integers(1, 10))):
                    ix = data.draw(st.integers(0, len(base) - 1))
                    base[ix] = data.draw(st.integers(0, 255))
                payload = bytes(base)
        parse_pdf(payload)
        parse_archive(payload)

    fuzz()
    for si, seed in enumerate(seeds):
        assert (parse_pdf(seed) is not None) == (si == len(_SEEDS)), si
        assert (parse_archive(seed) is not None) == (si > len(_SEEDS)), si
        if si > len(_SEEDS):
            for parse in _PARSERS:
                assert parse(seed) is None, si


def test_r10_harvest_never_crashes():
    """harvest_text joins the fuzz gate: value or None on arbitrary
    bytes, truncations, and byte-flips of EVERY seed — media and
    document classes alike."""
    from danae_spark.multimodal.harvest import harvest_text, synth_doc

    seeds = _SEEDS + [synth_doc(k) for k in range(6, 12)]

    @settings(max_examples=120, deadline=None)
    @given(st.data())
    def fuzz(data):
        mode = data.draw(st.integers(0, 2))
        if mode == 0:
            payload = data.draw(st.binary(min_size=0, max_size=400))
        else:
            base = bytearray(seeds[data.draw(st.integers(0, len(seeds) - 1))])
            if mode == 1:
                payload = bytes(base[: data.draw(st.integers(0, len(base)))])
            else:
                for _ in range(data.draw(st.integers(1, 10))):
                    ix = data.draw(st.integers(0, len(base) - 1))
                    base[ix] = data.draw(st.integers(0, 255))
                payload = bytes(base)
        harvest_text(payload)

    fuzz()
    # every document-class seed harvests; the media seeds either
    # harvest as their text-bearing class (srt) or not at all
    for k in range(6, 12):
        assert harvest_text(synth_doc(k)) is not None, k


def test_r17_parsers_never_crash():
    """The r17 surface joins the fuzz gate: corpus-dump extractors,
    tensor/model containers, lake censuses and the skipping planners
    must return a value or None on arbitrary bytes, truncations, and
    byte-flips of every seed — never raise inside an executor task."""
    from danae_spark.multimodal.blobharvest import route_blob
    from danae_spark.multimodal.deltalog import synth_delta_table
    from danae_spark.multimodal.hudi import parse_hudi_table, synth_hudi_table
    from danae_spark.multimodal.iceberg import synth_iceberg_table
    from danae_spark.multimodal.skipping import (
        plan_delta_skip,
        plan_iceberg_skip,
        plan_parquet_skip,
    )
    from danae_spark.multimodal.stackexchange import parse_se_dump, synth_se_dump
    from danae_spark.multimodal.tensors import (
        parse_arrow_blob,
        parse_gguf,
        parse_npy,
        parse_npz,
        parse_safetensors,
        synth_arrow,
        synth_gguf,
        synth_npy,
        synth_npz,
        synth_safetensors,
    )
    from danae_spark.multimodal.tfrecord import parse_tfrecord, synth_tfrecord
    from danae_spark.multimodal.tokenizerjson import (
        parse_tokenizer_json,
        synth_tokenizer_json,
    )
    from danae_spark.multimodal.wikitext import parse_wiki_dump, synth_wiki_dump

    parsers = [
        parse_wiki_dump, parse_se_dump, parse_safetensors, parse_npy,
        parse_npz, parse_arrow_blob, parse_gguf, parse_tfrecord,
        parse_tokenizer_json, parse_hudi_table, route_blob,
        lambda p: plan_parquet_skip(p, "c0", 10, 20),
        lambda p: plan_delta_skip(p, "c0", 10, 20),
        lambda p: plan_iceberg_skip(p, 1, 10, 20),
    ]
    seeds = [
        synth_wiki_dump(1), synth_se_dump(1), synth_safetensors(1),
        synth_npy(2), synth_npz(1), synth_arrow(1), synth_gguf(1),
        synth_tfrecord(1), synth_tokenizer_json(1), synth_hudi_table(0),
        synth_delta_table(0), synth_iceberg_table(0),
    ]

    @settings(max_examples=120, deadline=None)
    @given(st.data())
    def fuzz(data):
        mode = data.draw(st.integers(0, 2))
        if mode == 0:
            payload = data.draw(st.binary(min_size=0, max_size=400))
        else:
            base = bytearray(seeds[data.draw(st.integers(0, len(seeds) - 1))])
            if mode == 1:
                payload = bytes(base[: data.draw(st.integers(0, len(base)))])
            else:
                for _ in range(data.draw(st.integers(1, 10))):
                    ix = data.draw(st.integers(0, len(base) - 1))
                    base[ix] = data.draw(st.integers(0, 255))
                payload = bytes(base)
        for parse in parsers:
            parse(payload)  # value or None, never an exception

    fuzz()
    # mutual-exclusion sanity on clean seeds within the new set: each
    # single-format parser accepts exactly its own seed (route_blob and
    # the lake planners have legitimate multi-format surfaces)
    singles = {0: parse_wiki_dump, 1: parse_se_dump, 2: parse_safetensors,
               3: parse_npy, 4: parse_npz, 5: parse_arrow_blob,
               6: parse_gguf, 7: parse_tfrecord, 8: parse_tokenizer_json,
               9: parse_hudi_table}
    for si, seed in enumerate(seeds):
        for pi, parse in singles.items():
            assert (parse(seed) is not None) == (pi == si), (si, pi)
