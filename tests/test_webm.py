"""WebM/Matroska EBML census (multimodal/webm.py)."""

import struct

import pytest

from danae_spark.multimodal.webm import (
    parse_webm,
    synth_webm,
    _block_laced,
    _block_rel,
    _block_size,
    _doc_geometry,
    _el,
    _eid,
    _lace_frame_size,
    _lace_kind,
    _lace_n,
    _read_vint,
    _vint_signed,
    _vint_size,
    _CLUSTER,
    _DURATION,
    _INFO,
    _SEGMENT,
    _SIMPLE_BLOCK,
    _TIMESTAMP,
)


def _expected_counts(d: int):
    g = _doc_geometry(d)
    n_blocks = n_frames = media = 0
    for cc in range(g["n_clusters"]):
        for b in range(g["blocks_per_cluster"]):
            n_blocks += 1
            if _block_laced(b):
                n = _lace_n(d, cc, b)
                n_frames += n
                media += n * _lace_frame_size(d, cc, b)
            else:
                n_frames += 1
                media += _block_size(d, cc, b)
    return n_blocks, n_frames, media


def test_census_roundtrip_doc_grid():
    for d in range(24):
        c = parse_webm(synth_webm(d))
        assert c is not None, d
        g = _doc_geometry(d)
        n_blocks, n_frames, media = _expected_counts(d)
        assert c["n_blocks"] == n_blocks
        assert c["n_frames"] == n_frames
        assert n_frames > n_blocks  # every cluster holds a laced block
        assert c["media_bytes"] == media
        assert c["duration_ms"] == (
            (g["n_clusters"] - 1) * g["cluster_step"]
            + _block_rel(d, g["blocks_per_cluster"] - 1)
        )
        assert c["width"] == g["width"] and c["height"] == g["height"]


def test_vint_primitives():
    """RFC 8794 §4: length from leading zeros; ID keeps the marker bit,
    sizes strip it; a zero lead byte (no marker in 8 bits) is invalid."""
    # 1-byte: 0x81 → ID 0x81, size 1
    assert _read_vint(b"\x81", 0, keep_marker=True) == (0x81, 1)
    assert _read_vint(b"\x81", 0, keep_marker=False) == (1, 1)
    # 2-byte: 0x40 0x7F → size 0x7F
    assert _read_vint(b"\x40\x7f", 0, keep_marker=False) == (0x7F, 2)
    # 4-byte ID as it appears on the wire
    assert _read_vint(b"\x1a\x45\xdf\xa3", 0, keep_marker=True) == (0x1A45DFA3, 4)
    # zero lead byte invalid; truncation invalid
    assert _read_vint(b"\x00\xff", 0, keep_marker=True) is None
    assert _read_vint(b"\x40", 0, keep_marker=False) is None
    # encoder round trip at both 1/2-byte boundaries
    for size in (0, 126, 127, 128, 300, 16382, 16383, 16384):
        enc = _vint_size(size)
        assert _read_vint(enc, 0, keep_marker=False) == (size, len(enc))


def test_unknown_size_segment():
    """A Segment with the all-ones unknown-size VINT parses to EOF."""
    p = bytearray(synth_webm(6))
    # locate the Segment element: it follows the EBML header element
    from danae_spark.multimodal.webm import _read_element

    top = _read_element(bytes(p), 0, len(p))
    seg_start = top[2]
    # Segment ID is 4 bytes; its size VINT starts right after
    sid = p[seg_start : seg_start + 4]
    assert sid == bytes.fromhex("18538067")
    b0 = p[seg_start + 4]
    length = 8 - b0.bit_length() + 1
    # replace with an unknown-size VINT of the same length (all ones)
    p[seg_start + 4] = b0 | (0xFF >> length)
    for i in range(1, length):
        p[seg_start + 4 + i] = 0xFF
    c = parse_webm(bytes(p))
    assert c is not None
    assert c["n_blocks"] == parse_webm(synth_webm(6))["n_blocks"]


def _laced_block_count_at(p: bytes) -> int:
    """Byte offset of the lace-count byte of the FIRST laced SimpleBlock
    (b=2 — the second SimpleBlock of the first cluster, since b=1
    rides in a BlockGroup) — found via a real element walk (a raw
    0xA3 byte search can hit frame payload)."""
    from danae_spark.multimodal.webm import _children, _read_element

    top = _read_element(p, 0, len(p))
    seg = _read_element(p, top[2], len(p))
    for eid, s, e, _u in _children(p, seg[1], seg[2]):
        if eid != _CLUSTER:
            continue
        nblk = 0
        for cid, cs, ce, _cu in _children(p, s, e):
            if cid != _SIMPLE_BLOCK:
                continue
            nblk += 1
            if nblk == 2:
                tlen = 8 - p[cs].bit_length() + 1  # track VINT length
                flags_at = cs + tlen + 2
                assert p[flags_at] & 0x06, "third block must be laced"
                return flags_at + 1
    raise AssertionError("no laced block found")


def test_lacing_all_three_schemes_appear_and_roundtrip():
    kinds = set()
    for d in range(12):
        g = _doc_geometry(d)
        for cc in range(g["n_clusters"]):
            kinds.add(_lace_kind(d, cc))
        assert parse_webm(synth_webm(d)) is not None, d
    assert kinds == {1, 2, 3}  # Xiph, fixed, EBML all exercised


def test_lacing_255_chains_exercised():
    """Some grid docs lace frames > 255 bytes — the Xiph 255-chain and
    multi-byte EBML size paths must actually run."""
    big = [
        d for d in range(120)
        if any(
            _block_laced(b) and _lace_frame_size(d, cc, b) >= 255
            for cc in range(_doc_geometry(d)["n_clusters"])
            for b in range(_doc_geometry(d)["blocks_per_cluster"])
        )
    ]
    assert big
    for d in big[:6]:
        c = parse_webm(synth_webm(d))
        assert c is not None and c["n_frames"] == _expected_counts(d)[1]


def test_vint_signed_roundtrip():
    for diff in (-63, -1, 0, 1, 63, 64, -64, 8191, -8191):
        enc = _vint_signed(diff)
        v, npos = _read_vint(enc, 0, keep_marker=False)
        bias = (1 << (7 * npos - 1)) - 1
        assert v - bias == diff, diff


def test_malformed_lacing_rejected():
    # doc 0 first cluster: Xiph; doc 1: fixed; doc 2: EBML
    for d in (0, 1, 2):
        p = bytearray(synth_webm(d))
        at = _laced_block_count_at(p)
        p[at] = 0xFE  # claim 255 frames: size table/even-division breaks
        assert parse_webm(bytes(p)) is None, d


def test_rejects_undeclared_track_and_duration_mismatch():
    p = bytearray(synth_webm(2))  # video-only: track 1 declared
    i = p.index(bytes([_SIMPLE_BLOCK]), p.index(_eid(_CLUSTER)))
    b0 = p[i + 1]
    size_len = 8 - b0.bit_length() + 1
    track_at = i + 1 + size_len
    assert p[track_at] == 0x81
    p[track_at] = 0x85  # undeclared track 5
    assert parse_webm(bytes(p)) is None

    # bump the 8-byte-float Duration (even doc) → cross-check rejects
    q = bytearray(synth_webm(2))
    j = q.index(_eid(_DURATION)) + len(_eid(_DURATION)) + 1
    old = struct.unpack(">d", q[j : j + 8])[0]
    q[j : j + 8] = struct.pack(">d", old + 1.0)
    assert parse_webm(bytes(q)) is None


def test_rejects_truncation_and_garbage():
    p = synth_webm(5)
    for cut in (0, 2, 10, 40, len(p) // 2, len(p) - 1):
        assert parse_webm(p[:cut]) is None
    assert parse_webm(b"") is None
    assert parse_webm(b"\x1aEotherdoc") is None
    # wrong doctype
    alt = bytearray(p)
    alt[alt.index(b"webm") : alt.index(b"webm") + 4] = b"webX"
    assert parse_webm(bytes(alt)) is None


def test_mutation_sweep_never_raises():
    p = bytearray(synth_webm(7))
    for off in range(0, len(p), 5):
        q = bytearray(p)
        q[off] ^= 0x55
        parse_webm(bytes(q))  # must not raise


def test_webm_frame_nulls_for_garbage(spark):
    from danae_spark.multimodal.webm import webm_census_frame

    rows = [
        (1, bytearray(b"not webm")),
        (2, bytearray(synth_webm(2))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in webm_census_frame(df).collect()}
    assert out[1]["doc_type"] is None
    assert out[2]["doc_type"] == "webm" and out[2]["n_blocks"] > 0


# --------------------------------------- r10: BlockGroup + Matroska Tags


def test_blockgroup_census_and_keyframe_semantics():
    """Block b=1 rides inside a BlockGroup (Block + BlockDuration [+
    ReferenceBlock]); keyframe-ness comes from the ABSENCE of
    ReferenceBlock, not a flag bit."""
    from danae_spark.multimodal.webm import parse_webm, synth_webm

    for d in range(16):
        g = _doc_geometry(d)
        c = parse_webm(synth_webm(d))
        assert c is not None, d
        exp_keys = sum(
            (cc % 2) if b == 1 else (1 if b % g["key_step"] == 0 else 0)
            for cc in range(g["n_clusters"])
            for b in range(g["blocks_per_cluster"])
        )
        assert c["n_keyframes"] == exp_keys, d
        # counts/bytes identical to the all-SimpleBlock expectation
        n_blocks, n_frames, media = _expected_counts(d)
        assert (c["n_blocks"], c["n_frames"], c["media_bytes"]) == (
            n_blocks, n_frames, media
        )


def test_block_rejects_simpleblock_keyframe_bit():
    """A Block inside a BlockGroup with the SimpleBlock-only keyframe
    bit set is malformed and rejects the file whole."""
    from danae_spark.multimodal.webm import (
        _BLOCK,
        _children,
        _read_element,
        parse_webm,
        synth_webm,
    )

    p = bytearray(synth_webm(4))
    raw = bytes(p)
    top = _read_element(raw, 0, len(raw))
    seg = _read_element(raw, top[2], len(raw))
    flags_at = None
    for eid, s, e, _u in _children(raw, seg[1], seg[2]):
        if eid != _CLUSTER:
            continue
        for cid, cs, ce, _cu in _children(raw, s, e):
            if cid == 0xA0:  # BlockGroup
                for gid, gs, ge, _gu in _children(raw, cs, ce):
                    if gid == _BLOCK:
                        tlen = 8 - raw[gs].bit_length() + 1
                        flags_at = gs + tlen + 2
                        break
            if flags_at:
                break
        if flags_at:
            break
    assert flags_at is not None
    assert parse_webm(raw) is not None
    p[flags_at] |= 0x80
    assert parse_webm(bytes(p)) is None


def test_mkv_tags_roundtrip_grid():
    from danae_spark.multimodal.webm import (
        _mkv_meta,
        parse_mkv_tags,
        parse_webm,
        synth_webm,
        synth_webm_tagged,
    )

    for d in range(24):
        t = parse_mkv_tags(synth_webm_tagged(d))
        m = _mkv_meta(d)
        assert t is not None, d
        assert t["n_tags"] == 2 and t["n_simple_tags"] == 6
        assert t["title"] == m["title"] and t["artist"] == m["artist"]
        assert t["album"] == m["album"] and t["tag_date"] == m["date"]
        assert t["n_tag_chars"] == sum(
            len(m[k]) for k in ("title", "artist", "album", "date",
                                "description", "comment")
        )
        # the tagged stream's CENSUS is identical (Tags skipped)
        assert parse_webm(synth_webm_tagged(d)) == parse_webm(synth_webm(d))
        # untagged stream has no Tags element
        assert parse_mkv_tags(synth_webm(d)) is None


def test_mkv_tags_rejections_and_mutation():
    from danae_spark.multimodal.webm import parse_mkv_tags, synth_webm_tagged

    assert parse_mkv_tags(b"") is None
    assert parse_mkv_tags(b"\x1a\x45\xdf\xa3 nonsense") is None
    p = bytearray(synth_webm_tagged(5))
    # garble a tag string into invalid UTF-8: find the title text
    i = bytes(p).index(b"title 5 cut 25")
    q = bytearray(p)
    q[i] = 0xC0  # lone continuation-start: invalid UTF-8
    q[i + 1] = 0x20
    assert parse_mkv_tags(bytes(q)) is None
    for off in range(0, len(p), 7):
        r = bytearray(p)
        r[off] ^= 0x55
        parse_mkv_tags(bytes(r))  # never raises


def test_mkv_tags_frame_over_spark(spark):
    from danae_spark.multimodal.webm import mkv_tags_frame, synth_webm_tagged

    rows = [
        (1, bytearray(synth_webm_tagged(2))),
        (2, None),
        (3, bytearray(b"not matroska")),
    ]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    out = {
        r["media_id"]: r
        for r in mkv_tags_frame(df, id_col="media_id", payload_col="blob").collect()
    }
    assert out[1]["title"] == "title 2 cut 10"
    assert out[2]["n_tags"] is None and out[3]["n_tags"] is None


def test_mkv_tags_registered_oracle_matches_duckdb(spark, sf_dir):
    import os

    import duckdb

    from danae_spark.catalog import table_path
    from danae_spark.multimodal.webm import MKV_TAGS_ORACLE
    from danae_spark.queries import load_all

    fn = load_all()["mkv_tags_extract"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(MKV_TAGS_ORACLE).fetchall()]
    assert len(got) == len(want) and got == want
