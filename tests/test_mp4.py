"""MP4 sample-table structural decode (multimodal/mp4.py): full stbl
walk (stts/ctts/stsc/stsz/stco/co64/stss), cross-table integrity
validation, the byte-for-byte synthesizer round trip, and the Spark
census plumbing."""

from __future__ import annotations

import struct

import pytest

from danae_spark.multimodal.mp4 import (
    _sample_size,
    _track_params,
    iter_boxes,
    parse_mp4_samples,
    synth_mp4,
)


def _expected(doc_id: int) -> dict:
    """The census computed straight from _track_params — the pytest
    twin of MP4_SAMPLES_ORACLE's arithmetic."""
    n_tracks = 1 + doc_id % 3
    ps = [_track_params(doc_id, t) for t in range(n_tracks)]
    out = {
        "n_tracks": n_tracks,
        "n_video": sum(1 for p in ps if p["video"]),
        "n_samples": sum(p["n_samples"] for p in ps),
        "media_bytes": sum(
            _sample_size(doc_id, t, k)
            for t, p in enumerate(ps)
            for k in range(p["n_samples"])
        ),
        "n_chunks": sum(-(-p["n_samples"] // p["per_chunk"]) for p in ps),
        "n_keyframes": sum(
            -(-p["n_samples"] // p["key_step"]) if p["video"] else p["n_samples"]
            for p in ps
        ),
        "ctts_sum": sum(p["n_samples"] * p["ctts_off"] for p in ps),
    }
    out["duration_ms"] = max(
        (p["run1"] * p["d1"] + (p["n_samples"] - p["run1"]) * p["d2"])
        * 1000 // p["timescale"]
        for p in ps
    )
    return out


def test_synth_parse_roundtrip_all_fields():
    for d in range(0, 60):
        agg = parse_mp4_samples(synth_mp4(d))
        assert agg is not None, d
        assert agg.pop("offsets_in_mdat") is True, d  # synth addresses mdat
        assert agg == _expected(d), d


def test_co64_path_really_taken():
    """Odd docs write 64-bit chunk offsets; even docs 32-bit."""
    assert b"co64" in synth_mp4(7) and b"stco" not in synth_mp4(7)
    assert b"stco" in synth_mp4(4) and b"co64" not in synth_mp4(4)


def test_stsc_remainder_entry():
    """A doc whose last chunk is short must carry (and the parser must
    expand) the two-entry stsc run table."""
    for d in range(0, 40):
        p = _track_params(d, 0)
        if p["n_samples"] % p["per_chunk"] and p["n_samples"] > p["per_chunk"]:
            payload = synth_mp4(d)
            stbl_seen = False
            for t, b in iter_boxes(payload):
                if t == b"moov":
                    stbl_seen = True
            assert stbl_seen
            assert parse_mp4_samples(payload) is not None
            return
    pytest.fail("no remainder-chunk doc in range")


def test_stss_absent_means_all_sync():
    """Audio tracks (no stss) count every sample as a keyframe."""
    # doc 1: single track t=0 is video; doc 4: tracks 0,1 → one audio
    agg = parse_mp4_samples(synth_mp4(4))
    exp = _expected(4)
    assert agg["n_keyframes"] == exp["n_keyframes"]
    assert exp["n_keyframes"] > sum(
        -(-_track_params(4, t)["n_samples"] // _track_params(4, t)["key_step"])
        for t in range(2)
    )  # i.e. the audio track contributed n_samples, not a stride count


def test_truncated_file_rejected():
    p = synth_mp4(3)
    assert parse_mp4_samples(p[:-10]) is None  # samples past EOF
    assert parse_mp4_samples(p[: len(p) // 2]) is None


def test_stsz_count_mismatch_rejected():
    """stsc expansion must reproduce the stsz sample count — a patched
    count is a corrupt table, not a smaller census."""
    p = synth_mp4(7)
    i = p.find(b"stsz")  # type tag; verflags +4, uniform +8, count +12
    n = int.from_bytes(p[i + 12 : i + 16], "big")
    bad = p[: i + 12] + struct.pack(">I", n + 1) + p[i + 16 :]
    assert parse_mp4_samples(bad) is None


def test_nonmonotonic_offsets_rejected():
    q = synth_mp4(4)
    j = q.find(b"stco")
    assert int.from_bytes(q[j + 8 : j + 12], "big") >= 2
    o1, o2 = q[j + 12 : j + 16], q[j + 16 : j + 20]
    bad = q[: j + 12] + o2 + o1 + q[j + 20 :]
    assert parse_mp4_samples(bad) is None


def test_stss_out_of_range_rejected():
    v = synth_mp4(2)
    k = v.find(b"stss")
    bad = v[: k + 12] + struct.pack(">I", 10**6) + v[k + 16 :]
    assert parse_mp4_samples(bad) is None


def test_garbage_and_non_mp4_rejected():
    assert parse_mp4_samples(b"") is None
    assert parse_mp4_samples(b"notanmp4" * 64) is None
    assert parse_mp4_samples(b"\x00\x00\x00\x08ftyp") is None  # no moov


def test_parser_never_raises_on_mutants():
    """The decoder contract everywhere in this repo: hostile bytes
    degrade to None, never raise in an executor task."""
    base = synth_mp4(11)
    for cut in range(0, len(base), 37):
        parse_mp4_samples(base[:cut])
    for pos in range(0, len(base), 53):
        mut = base[:pos] + bytes([base[pos] ^ 0xFF]) + base[pos + 1 :]
        parse_mp4_samples(mut)


def test_spark_census_roundtrip(spark, sf_dir):
    """The registered entry end-to-end at the smallest lake, checked
    row-by-row against the arithmetic twin."""
    from danae_spark.multimodal.mp4 import mp4_samples_roundtrip

    rows = mp4_samples_roundtrip(spark, sf_dir).collect()
    assert rows
    for r in rows:
        exp = _expected(r["doc_id"])
        for c, v in exp.items():
            assert r[c] == v, (r["doc_id"], c)


def test_census_nulls_for_non_mp4(spark):
    from danae_spark.multimodal.mp4 import mp4_samples_frame

    df = spark.createDataFrame(
        [(1, bytearray(b"not a container")), (2, bytearray(synth_mp4(2)))],
        "doc_id bigint, payload binary",
    )
    out = {r["doc_id"]: r for r in mp4_samples_frame(df).collect()}
    assert out[1]["n_tracks"] is None
    assert out[2]["n_tracks"] == 1 + 2 % 3


# ------------------------------------------- fragmented MP4 (moof/trun)

from danae_spark.multimodal.mp4 import (  # noqa: E402
    _frag_geometry,
    _frag_run,
    _frag_dur,
    _frag_size,
    parse_mp4_fragments,
    synth_fmp4,
)


def _frag_expected(d: int) -> dict:
    T, F = _frag_geometry(d)
    n_samples = media = keys = cts = 0
    dur_ms = 0
    for t in range(T):
        tdur = 0
        for f in range(F):
            r = _frag_run(d, f, t)
            cnt = r["cnt"]
            n_samples += cnt
            media += sum(_frag_size(d, f, t, k) for k in range(cnt))
            tdur += sum(_frag_dur(d, f, t, k) for k in range(cnt))
            if t == 0:
                keys += -(-cnt // r["key_step"])
                s = sum((d + f + k) % 9 for k in range(cnt))
                cts += s - (4 * cnt if r["cts_signed"] else 0)
            else:
                keys += cnt - (1 if r["first_nonsync"] else 0)
        dur_ms = max(dur_ms, tdur * 1000 // (1000 * (1 + (d + t) % 3)))
    return {
        "n_tracks": T, "n_fragments": F, "n_samples": n_samples,
        "media_bytes": media, "n_keyframes": keys,
        "duration_ms": dur_ms, "cts_sum": cts,
    }


def test_fmp4_roundtrip_all_fields():
    for d in range(0, 60):
        got = parse_mp4_fragments(synth_fmp4(d))
        assert got == _frag_expected(d), d


def test_fmp4_default_cascade_really_exercised():
    """The doc grid must cover per-sample, tfhd-default and
    trex-default durations AND both data-offset conventions."""
    srcs = set()
    for d in range(0, 20):
        T, F = _frag_geometry(d)
        for t in range(T):
            r = _frag_run(d, 0, t)
            srcs.add(
                "ps" if r["dur_per_sample"] else ("tfhd" if r["dur_tfhd"] else "trex")
            )
    assert srcs == {"ps", "tfhd", "trex"}
    assert any(d % 5 == 0 for d in range(20)) and any(d % 5 for d in range(20))


def test_fmp4_unfragmented_and_garbage_rejected():
    from danae_spark.multimodal.mp4 import synth_mp4

    assert parse_mp4_fragments(synth_mp4(3)) is None  # no moof: not fMP4
    assert parse_mp4_fragments(b"") is None
    assert parse_mp4_fragments(b"junk" * 100) is None


def test_fmp4_truncation_rejected():
    p = synth_fmp4(6)
    assert parse_mp4_fragments(p[:-5]) is None  # trailing mdat cut


def test_fmp4_unknown_track_rejected():
    """A traf referencing a track with no trex declaration is corrupt."""
    p = synth_fmp4(2)
    i = p.find(b"tfhd")
    bad = p[: i + 8] + struct.pack(">I", 99) + p[i + 12 :]
    assert parse_mp4_fragments(bad) is None


def test_fmp4_never_raises_on_mutants():
    base = synth_fmp4(13)
    for cut in range(0, len(base), 41):
        parse_mp4_fragments(base[:cut])
    for pos in range(0, len(base), 59):
        mut = base[:pos] + bytes([base[pos] ^ 0xFF]) + base[pos + 1 :]
        parse_mp4_fragments(mut)


def test_fmp4_spark_census_roundtrip(spark, sf_dir):
    from danae_spark.multimodal.mp4 import mp4_fragments_roundtrip

    rows = mp4_fragments_roundtrip(spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        exp = _frag_expected(r["doc_id"])
        for c, v in exp.items():
            assert r[c] == v, (r["doc_id"], c)
