"""MP4/ISO-BMFF SAMPLE-TABLE structural decode — the full `stbl` walk
(ISO/IEC 14496-12 §8.6–8.7: stts, ctts, stsc, stsz, stco/co64, stss)
below the r7 top-level box walk in binary.py, plus the matching
byte-for-byte container synthesizer, giving video the same C49-pattern
round trip MP3 got in r9 (synth → real parse → arithmetic oracle).

What this adds over binary.py's parse_video_header: that walk reads
ftyp/mvhd/tkhd (brand, duration, first visual track's dimensions);
THIS module decodes what a 100 TB crawl triage actually needs per
track — sample counts and byte volumes (stsz), media durations from
the decoding-time runs (stts × mdhd timescale), chunk geometry and its
stsc run expansion, keyframe density (stss, all-sync when absent per
§8.6.2), composition-offset totals (ctts, v0/v1), and 64-bit chunk
offsets (co64) — with REAL cross-table integrity validation: the stsc
expansion over the stco chunk count must reproduce the stsz sample
count, chunk offsets must be strictly increasing, and every chunk's
samples must lie inside the file; any violation rejects the track the
same way a corrupt WAV header is rejected (pixels.py r9), because a
census that silently counts garbage tables is worse than none.

WHY CODEC (sample-payload) DECODE STAYS OUT OF SCOPE: the sample
entries reference H.264/AAC/etc. bitstreams whose decode needs exactly
the fixed out-of-band table data the MP3 de-scope documents
(multimodal/mp3.py) — not certifiable in a container with no reference
decoder. The sample TABLES, by contrast, are pure in-band structure:
field widths, run-length expansions, and offset arithmetic, fully
certifiable by a synthesized round trip.

Reference parity: the reference repo has no video pipeline (its
ingest/ is tabular + text); this module is part of the
multimodal-column brief (opaque binary + typed metadata + real decode
where certifiable).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def iter_boxes(buf: bytes) -> Iterator[tuple[bytes, bytes]]:
    """Yield (type, body) over a box sequence; truncated/garbled boxes
    terminate the walk without raising (crawl bytes are hostile)."""
    pos = 0
    while pos + 8 <= len(buf):
        size = int.from_bytes(buf[pos : pos + 4], "big")
        btype = buf[pos + 4 : pos + 8]
        hdr = 8
        if size == 1 and pos + 16 <= len(buf):  # 64-bit largesize
            size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            hdr = 16
        if size < hdr or pos + size > len(buf):
            return
        yield btype, buf[pos + hdr : pos + size]
        pos += size


def _child(body: bytes, btype: bytes) -> bytes | None:
    for t, b in iter_boxes(body):
        if t == btype:
            return b
    return None


def _u32s(body: bytes, at: int, n: int) -> list[int]:
    return list(struct.unpack(f">{n}I", body[at : at + 4 * n]))


def parse_track_tables(trak: bytes, mdat_span: tuple[int, int],
                       payload_len: int) -> dict | None:
    """Decode one `trak` box body's full sample-table tree. Returns the
    per-track structural aggregates, or None when any table is missing,
    truncated, or fails cross-table integrity (see module docstring).

    mdat_span is the absolute (start, end) byte range of the file's
    mdat payload — chunk offsets are validated against the FILE (they
    are absolute per §8.7.5), with samples allowed anywhere in it but
    flagged when outside mdat (offset_ok)."""
    tkhd = _child(trak, b"tkhd")
    track_id = None
    if tkhd is not None and len(tkhd) >= 12:
        ver = tkhd[0]
        track_id = int.from_bytes(tkhd[12:16] if ver == 0 else tkhd[20:24], "big")
    mdia = _child(trak, b"mdia")
    if mdia is None:
        return None
    mdhd = _child(mdia, b"mdhd")
    if mdhd is None or len(mdhd) < 20:
        return None
    timescale = int.from_bytes(
        mdhd[12:16] if mdhd[0] == 0 else mdhd[20:24], "big"
    )
    hdlr = _child(mdia, b"hdlr")
    handler = (
        hdlr[8:12].decode("ascii", "replace") if hdlr and len(hdlr) >= 12 else None
    )
    minf = _child(mdia, b"minf")
    stbl = _child(minf, b"stbl") if minf is not None else None
    if stbl is None:
        return None

    stts = ctts = stsc = stsz = stco = stss = None
    co64 = False
    for t, b in iter_boxes(stbl):
        if t == b"stts":
            stts = b
        elif t == b"ctts":
            ctts = b
        elif t == b"stsc":
            stsc = b
        elif t == b"stsz":
            stsz = b
        elif t in (b"stco", b"co64"):
            stco, co64 = b, t == b"co64"
        elif t == b"stss":
            stss = b
    if stts is None or stsc is None or stsz is None or stco is None:
        return None

    try:
        # stts §8.6.1.2: (count, delta) runs; duration = Σ count·delta
        n_runs = int.from_bytes(stts[4:8], "big")
        if len(stts) < 8 + 8 * n_runs:
            return None
        runs = _u32s(stts, 8, 2 * n_runs)
        stts_samples = sum(runs[0::2])
        duration = sum(c * d for c, d in zip(runs[0::2], runs[1::2]))

        # stsz §8.7.3: uniform sample_size, else per-sample table
        uniform = int.from_bytes(stsz[4:8], "big")
        n_samples = int.from_bytes(stsz[8:12], "big")
        if uniform:
            sizes = [uniform] * n_samples
        else:
            if len(stsz) < 12 + 4 * n_samples:
                return None
            sizes = _u32s(stsz, 12, n_samples)

        # stco/co64 §8.7.5
        n_chunks = int.from_bytes(stco[4:8], "big")
        if co64:
            if len(stco) < 8 + 8 * n_chunks:
                return None
            offsets = list(struct.unpack(f">{n_chunks}Q", stco[8 : 8 + 8 * n_chunks]))
        else:
            if len(stco) < 8 + 4 * n_chunks:
                return None
            offsets = _u32s(stco, 8, n_chunks)

        # stsc §8.7.4 run expansion: entry (first_chunk, per_chunk, sdi)
        # covers chunks first_chunk..next_first-1; last entry to n_chunks
        n_ent = int.from_bytes(stsc[4:8], "big")
        if len(stsc) < 8 + 12 * n_ent or n_ent == 0:
            return None
        ents = _u32s(stsc, 8, 3 * n_ent)
        firsts = ents[0::3]
        if firsts[0] != 1 or any(a >= b for a, b in zip(firsts, firsts[1:])):
            return None
        per_chunk: list[int] = []
        for i in range(n_ent):
            upto = firsts[i + 1] - 1 if i + 1 < n_ent else n_chunks
            per_chunk.extend([ents[3 * i + 1]] * (upto - firsts[i] + 1))
        if len(per_chunk) != n_chunks:
            return None

        # Cross-table integrity: the three sample counts must agree, and
        # every chunk's sample bytes must lie inside the file.
        if sum(per_chunk) != n_samples or stts_samples != n_samples:
            return None
        if any(a >= b for a, b in zip(offsets, offsets[1:])):
            return None
        k = 0
        offset_ok = True
        for ci, cnt in enumerate(per_chunk):
            cbytes = sum(sizes[k : k + cnt])
            end = offsets[ci] + cbytes
            if end > payload_len:
                return None  # truncated file: samples past EOF
            if not (mdat_span[0] <= offsets[ci] and end <= mdat_span[1]):
                offset_ok = False  # legal but unusual: samples outside mdat
            k += cnt

        # stss §8.6.2: absent means every sample is sync
        if stss is not None:
            n_key = int.from_bytes(stss[4:8], "big")
            if len(stss) < 8 + 4 * n_key:
                return None
            keys = _u32s(stss, 8, n_key)
            if any(s < 1 or s > n_samples for s in keys):
                return None
        else:
            n_key = n_samples

        # ctts §8.6.1.3: v0 unsigned / v1 signed composition offsets
        ctts_sum = 0
        if ctts is not None:
            n_c = int.from_bytes(ctts[4:8], "big")
            if len(ctts) < 8 + 8 * n_c:
                return None
            signed = ctts[0] == 1
            for i in range(n_c):
                cnt = int.from_bytes(ctts[8 + 8 * i : 12 + 8 * i], "big")
                off = int.from_bytes(
                    ctts[12 + 8 * i : 16 + 8 * i], "big", signed=signed
                )
                ctts_sum += cnt * off
    except (struct.error, IndexError):
        return None

    return {
        "track_id": track_id,
        "handler": handler,
        "timescale": timescale,
        "n_samples": n_samples,
        "media_bytes": sum(sizes),
        "n_chunks": n_chunks,
        "n_keyframes": n_key,
        "duration_ms": duration * 1000 // timescale if timescale else None,
        "ctts_sum": ctts_sum,
        "offset_ok": offset_ok,
    }


def parse_mp4_samples(payload: bytes) -> dict | None:
    """Walk a whole MP4 and decode EVERY track's sample tables into
    per-file structural aggregates (one census row):

      n_tracks, n_video          (hdlr 'vide' tracks)
      n_samples, media_bytes     (Σ stsz over tracks)
      n_chunks, n_keyframes      (Σ; non-stss tracks count all samples)
      duration_ms                (max per-track stts/timescale duration)
      ctts_sum                   (Σ count·offset over ctts runs)

    None when there is no moov, no parseable track, or ANY track fails
    sample-table integrity — partial censuses of corrupt files are the
    silent-poison failure mode this repo's decoders all reject."""
    moov = None
    mdat_span = (0, len(payload))
    pos = 0
    buf = payload
    while pos + 8 <= len(buf):
        size = int.from_bytes(buf[pos : pos + 4], "big")
        btype = buf[pos + 4 : pos + 8]
        hdr = 8
        if size == 1 and pos + 16 <= len(buf):
            size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            hdr = 16
        if size < hdr or pos + size > len(buf):
            break
        if btype == b"moov":
            moov = buf[pos + hdr : pos + size]
        elif btype == b"mdat":
            mdat_span = (pos + hdr, pos + size)
        pos += size
    if moov is None:
        return None
    tracks = []
    for t, b in iter_boxes(moov):
        if t == b"trak":
            tr = parse_track_tables(b, mdat_span, len(payload))
            if tr is None:
                return None
            tracks.append(tr)
    if not tracks:
        return None
    return {
        "n_tracks": len(tracks),
        "n_video": sum(1 for t in tracks if t["handler"] == "vide"),
        "n_samples": sum(t["n_samples"] for t in tracks),
        "media_bytes": sum(t["media_bytes"] for t in tracks),
        "n_chunks": sum(t["n_chunks"] for t in tracks),
        "n_keyframes": sum(t["n_keyframes"] for t in tracks),
        "duration_ms": max(t["duration_ms"] or 0 for t in tracks),
        "ctts_sum": sum(t["ctts_sum"] for t in tracks),
        # legal-but-unusual flag (not a census column): some chunk's
        # samples live outside the mdat span — worth a triage/dq look
        # even though §8.7.5 permits offsets anywhere in the file
        "offsets_in_mdat": all(t["offset_ok"] for t in tracks),
    }


# ------------------------------------------------------------- synthesis

def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, ver: int, body: bytes) -> bytes:
    return _box(btype, bytes((ver, 0, 0, 0)) + body)


# doc_id-derived container parameters — every formula here is restated
# verbatim in MP4_SAMPLES_ORACLE, so keep them in exact sync.
def _track_params(doc_id: int, t: int) -> dict:
    n_samples = 10 + (doc_id * 7 + t * 13) % 40
    return {
        "n_samples": n_samples,
        "timescale": 1000 * (1 + (doc_id + t) % 3),
        "run1": 1 + (doc_id + t) % (n_samples - 1),  # stts split point
        "d1": 1 + (doc_id + t) % 100,
        "d2": 1 + (doc_id * 3 + t) % 100,
        "per_chunk": 1 + (doc_id + t) % 7,
        "key_step": 2 + (doc_id + t) % 5,  # video tracks' stss stride
        "ctts_off": (doc_id + t) % 10,
        "video": t % 2 == 0,
    }


def _sample_size(doc_id: int, t: int, k: int) -> int:
    return 50 + (doc_id * 11 + t * 5 + k * 3) % 200


def synth_mp4(doc_id: int) -> bytes:
    """Byte-for-byte MP4: real box framing (ftyp/moov/mvhd/trak tree),
    bit-exact full-box sample tables following _track_params — stts as
    two runs, stsc with a remainder entry when the last chunk is short,
    per-sample stsz, stco offsets computed from the actual mdat layout
    (co64 on odd docs exercises the 64-bit path), stss on video tracks,
    single-run ctts — and an mdat whose bytes the offsets really
    address. Every parser path above decodes data this synthesizer
    placed, so the round trip certifies the table arithmetic."""
    n_tracks = 1 + doc_id % 3
    params = [_track_params(doc_id, t) for t in range(n_tracks)]

    # mdat layout first: tracks' chunks are laid out consecutively.
    chunk_meta: list[list[tuple[int, int]]] = []  # per track: (rel_off, n)
    blob = bytearray()
    for t, p in enumerate(params):
        n, c = p["n_samples"], p["per_chunk"]
        offs = []
        k = 0
        while k < n:
            cnt = min(c, n - k)
            offs.append((len(blob), cnt))
            for j in range(cnt):
                sz = _sample_size(doc_id, t, k + j)
                blob += bytes(((doc_id + t + k + j + i) % 251 for i in range(sz)))
            k += cnt
        chunk_meta.append(offs)

    co64 = doc_id % 2 == 1

    def trak(t: int, p: dict, mdat_payload_at: int) -> bytes:
        n = p["n_samples"]
        tkhd = _full(
            b"tkhd", 0,
            struct.pack(">II", 0, 0)  # creation, modification
            + struct.pack(">I", t + 1)  # track_ID
            + b"\x00" * 72,
        )
        mdhd = _full(
            b"mdhd", 0,
            struct.pack(">II", 0, 0) + struct.pack(">II", p["timescale"], 0)
            + b"\x00" * 4,
        )
        hdlr = _full(
            b"hdlr", 0,
            b"\x00" * 4 + (b"vide" if p["video"] else b"soun") + b"\x00" * 13,
        )
        run1, run2 = p["run1"], n - p["run1"]
        stts = _full(
            b"stts", 0,
            struct.pack(">I", 2)
            + struct.pack(">II", run1, p["d1"])
            + struct.pack(">II", run2, p["d2"]),
        )
        ctts = _full(
            b"ctts", 0, struct.pack(">I", 1) + struct.pack(">II", n, p["ctts_off"])
        )
        c, rem = p["per_chunk"], n % p["per_chunk"]
        n_chunks = len(chunk_meta[t])
        if rem and n_chunks > 1:
            stsc_body = struct.pack(">I", 2) + struct.pack(
                ">III", 1, c, 1
            ) + struct.pack(">III", n_chunks, rem, 1)
        else:
            stsc_body = struct.pack(">I", 1) + struct.pack(
                ">III", 1, n_chunks and chunk_meta[t][0][1], 1
            )
        stsc = _full(b"stsc", 0, stsc_body)
        sizes = [_sample_size(doc_id, t, k) for k in range(n)]
        stsz = _full(
            b"stsz", 0,
            struct.pack(">II", 0, n) + struct.pack(f">{n}I", *sizes),
        )
        abs_offs = [mdat_payload_at + rel for rel, _cnt in chunk_meta[t]]
        if co64:
            stco = _full(
                b"co64", 0,
                struct.pack(">I", n_chunks) + struct.pack(f">{n_chunks}Q", *abs_offs),
            )
        else:
            stco = _full(
                b"stco", 0,
                struct.pack(">I", n_chunks) + struct.pack(f">{n_chunks}I", *abs_offs),
            )
        boxes = stts + ctts + stsc + stsz + stco
        if p["video"]:
            keys = list(range(1, n + 1, p["key_step"]))
            boxes += _full(
                b"stss", 0,
                struct.pack(">I", len(keys)) + struct.pack(f">{len(keys)}I", *keys),
            )
        stbl = _box(b"stbl", boxes)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = _full(
        b"mvhd", 0,
        struct.pack(">II", 0, 0) + struct.pack(">II", 1000, 0) + b"\x00" * 80,
    )
    # moov size depends on itself only (mdat follows moov), so compute
    # the mdat payload's absolute start by building moov twice: once
    # with placeholder offsets to learn its size, then for real.
    placeholder = _box(
        b"moov", mvhd + b"".join(trak(t, p, 0) for t, p in enumerate(params))
    )
    mdat_payload_at = len(ftyp) + len(placeholder) + 8
    moov = _box(
        b"moov",
        mvhd + b"".join(trak(t, p, mdat_payload_at) for t, p in enumerate(params)),
    )
    assert len(moov) == len(placeholder)
    return ftyp + moov + _box(b"mdat", bytes(blob))


MP4_SAMPLES_SCHEMA = (
    "doc_id bigint, n_tracks int, n_video int, n_samples bigint, "
    "media_bytes bigint, n_chunks int, n_keyframes bigint, "
    "duration_ms bigint, ctts_sum bigint"
)

_CENSUS_COLS = [
    "n_tracks", "n_video", "n_samples", "media_bytes", "n_chunks",
    "n_keyframes", "duration_ms", "ctts_sum",
]


def mp4_samples_frame(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """Sample-table census over ANY (id, binary) frame — the same Arrow
    mapInPandas plumbing as mp3_sideinfo_frame, one row per doc with the
    parse_mp4_samples aggregates (nulls for non-MP4 / corrupt tables)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                agg = (parse_mp4_samples(bytes(p)) if p is not None else None) or {}
                rows.append(
                    {id_col: doc_id, **{c: agg.get(c) for c in _CENSUS_COLS}}
                )
            yield pd.DataFrame(rows, columns=[id_col] + _CENSUS_COLS)

    src = df.select(F.col(id_col), F.col(payload_col))
    return src.mapInPandas(
        batches, schema=MP4_SAMPLES_SCHEMA.replace("doc_id", id_col, 1)
    )


def mp4_samples_roundtrip(spark, sf_dir: str) -> DataFrame:
    """End-to-end structural round trip (the C49 pattern): per document
    a real MP4 is synthesized (box framing, two-run stts, remainder
    stsc, per-sample stsz, offsets addressing the actual mdat bytes,
    co64 on odd docs, stss strides on video tracks, ctts), the full
    sample-table parser decodes it with integrity validation on, and
    the census is value-checked by doc_id arithmetic."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": [synth_mp4(int(d)) for d in pdf["doc_id"]],
            })

    payloads = docs.repartition(
        stage_parallelism(docs.sparkSession), "doc_id"
    ).mapInPandas(synth, schema="doc_id bigint, payload binary")
    return mp4_samples_frame(payloads).orderBy("doc_id")


# The synthesized containers' expected census in closed form. Per-track
# terms replicate _track_params; media_bytes sums _sample_size over k.
MP4_SAMPLES_ORACLE = """
WITH tr AS (
  SELECT d.doc_id, t.t,
         10 + (d.doc_id * 7 + t.t * 13) % 40 AS n_samples,
         1000 * (1 + (d.doc_id + t.t) % 3) AS timescale,
         1 + (d.doc_id + t.t) % (10 + (d.doc_id * 7 + t.t * 13) % 40 - 1) AS run1,
         1 + (d.doc_id + t.t) % 100 AS d1,
         1 + (d.doc_id * 3 + t.t) % 100 AS d2,
         1 + (d.doc_id + t.t) % 7 AS per_chunk,
         2 + (d.doc_id + t.t) % 5 AS key_step,
         (d.doc_id + t.t) % 10 AS ctts_off,
         CASE WHEN t.t % 2 = 0 THEN 1 ELSE 0 END AS video
  FROM documents d
  JOIN generate_series(0, 2) t(t) ON t.t < 1 + d.doc_id % 3
),
per AS (
  SELECT tr.*,
         run1 * d1 + (n_samples - run1) * d2 AS duration,
         (n_samples + per_chunk - 1) // per_chunk AS n_chunks,
         CASE WHEN video = 1
              THEN (n_samples + key_step - 1) // key_step
              ELSE n_samples END AS n_keyframes,
         n_samples * ctts_off AS track_ctts,
         (SELECT sum(50 + (tr.doc_id * 11 + tr.t * 5 + k.k * 3) % 200)
          FROM generate_series(0, 49) k(k) WHERE k.k < tr.n_samples)
           AS track_bytes
  FROM tr
)
SELECT doc_id,
       CAST(count(*) AS INT) AS n_tracks,
       CAST(sum(video) AS INT) AS n_video,
       CAST(sum(n_samples) AS BIGINT) AS n_samples,
       CAST(sum(track_bytes) AS BIGINT) AS media_bytes,
       CAST(sum(n_chunks) AS INT) AS n_chunks,
       CAST(sum(n_keyframes) AS BIGINT) AS n_keyframes,
       CAST(max(duration * 1000 // timescale) AS BIGINT) AS duration_ms,
       CAST(sum(track_ctts) AS BIGINT) AS ctts_sum
FROM per
GROUP BY doc_id
ORDER BY doc_id
"""


# --------------------------------------- fragmented MP4 (DASH/CMAF) census

# trun flags (§8.8.8) / tfhd flags (§8.8.7) / sample_flags bit (§8.8.3.1)
_TRUN_DATA_OFFSET = 0x000001
_TRUN_FIRST_FLAGS = 0x000004
_TRUN_DURATION = 0x000100
_TRUN_SIZE = 0x000200
_TRUN_FLAGS = 0x000400
_TRUN_CTS = 0x000800
_TFHD_BASE_OFFSET = 0x000001
_TFHD_SDI = 0x000002
_TFHD_DEF_DURATION = 0x000008
_TFHD_DEF_SIZE = 0x000010
_TFHD_DEF_FLAGS = 0x000020
_SAMPLE_NON_SYNC = 0x00010000


def parse_mp4_fragments(payload: bytes) -> dict | None:
    """Walk a FRAGMENTED MP4 (ISO 14496-12 §8.8: styp/moov+mvex →
    moof/traf/tfhd/trun sequences) and decode every fragment's run
    tables into one census row:

      n_tracks                  (mvex/trex declarations)
      n_fragments               (moof count)
      n_samples, media_bytes    (Σ trun runs; per-sample size fields or
                                 tfhd/trex default cascade §8.8.7)
      n_keyframes               (samples whose resolved flags lack
                                 sample_is_non_sync_sample, honoring
                                 first-sample-flags overrides)
      duration_ms               (max per-track Σ durations / mdhd
                                 timescale)
      cts_sum                   (Σ trun composition-time offsets,
                                 v0 unsigned / v1 signed)

    Integrity validation, same contract as parse_mp4_samples: trun
    data offsets (relative to moof start per the default-base-is-moof
    convention, or absolute via tfhd base-data-offset) must land every
    sample's bytes inside the file; a track referencing no trex
    declaration, a trun with no resolvable size/duration, or any
    truncated table rejects the whole file. Returns None for
    unfragmented files (no moof) — parse_mp4_samples covers those."""
    moov = None
    tops: list[tuple[bytes, int, int]] = []  # (type, abs_start, abs_end)
    pos = 0
    n = len(payload)
    while pos + 8 <= n:
        size = int.from_bytes(payload[pos : pos + 4], "big")
        btype = payload[pos + 4 : pos + 8]
        hdr = 8
        if size == 1 and pos + 16 <= n:
            size = int.from_bytes(payload[pos + 8 : pos + 16], "big")
            hdr = 16
        if size < hdr or pos + size > n:
            break
        if btype == b"moov":
            moov = payload[pos + hdr : pos + size]
        tops.append((btype, pos, pos + size))
        pos += size
    if moov is None or not any(t == b"moof" for t, _s, _e in tops):
        return None

    # mvex/trex defaults + per-track mdhd timescale from the moov
    trex: dict[int, tuple[int, int, int]] = {}  # id -> (dur, size, flags)
    mvex = _child(moov, b"mvex")
    if mvex is None:
        return None
    for t, b in iter_boxes(mvex):
        if t == b"trex" and len(b) >= 24:
            tid = int.from_bytes(b[4:8], "big")
            trex[tid] = (
                int.from_bytes(b[12:16], "big"),
                int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"),
            )
    if not trex:
        return None
    timescale: dict[int, int] = {}
    for t, b in iter_boxes(moov):
        if t != b"trak":
            continue
        tkhd = _child(b, b"tkhd")
        mdia = _child(b, b"mdia")
        mdhd = _child(mdia, b"mdhd") if mdia is not None else None
        if tkhd is None or mdhd is None or len(mdhd) < 20:
            return None
        tid = int.from_bytes(
            tkhd[12:16] if tkhd[0] == 0 else tkhd[20:24], "big"
        )
        timescale[tid] = int.from_bytes(
            mdhd[12:16] if mdhd[0] == 0 else mdhd[20:24], "big"
        )

    n_fragments = 0
    n_samples = 0
    media_bytes = 0
    n_keyframes = 0
    cts_sum = 0
    track_dur: dict[int, int] = {tid: 0 for tid in trex}
    try:
        for btype, start, _end in tops:
            if btype != b"moof":
                continue
            n_fragments += 1
            moof = payload[start + 8 : _end]
            for t, traf in iter_boxes(moof):
                if t != b"traf":
                    continue
                tfhd = _child(traf, b"tfhd")
                if tfhd is None or len(tfhd) < 8:
                    return None
                tf_flags = int.from_bytes(tfhd[1:4], "big")
                tid = int.from_bytes(tfhd[4:8], "big")
                if tid not in trex or tid not in timescale:
                    return None
                at = 8
                if tf_flags & _TFHD_BASE_OFFSET:
                    base = int.from_bytes(tfhd[at : at + 8], "big")
                    at += 8
                else:
                    base = start  # default-base-is-moof convention
                if tf_flags & _TFHD_SDI:
                    at += 4
                def_dur, def_size, def_flags = trex[tid]
                if tf_flags & _TFHD_DEF_DURATION:
                    def_dur = int.from_bytes(tfhd[at : at + 4], "big")
                    at += 4
                if tf_flags & _TFHD_DEF_SIZE:
                    def_size = int.from_bytes(tfhd[at : at + 4], "big")
                    at += 4
                if tf_flags & _TFHD_DEF_FLAGS:
                    def_flags = int.from_bytes(tfhd[at : at + 4], "big")

                for tt, trun in iter_boxes(traf):
                    if tt != b"trun":
                        continue
                    if len(trun) < 8:
                        return None
                    ver = trun[0]
                    fl = int.from_bytes(trun[1:4], "big")
                    cnt = int.from_bytes(trun[4:8], "big")
                    at2 = 8
                    data_off = 0
                    if fl & _TRUN_DATA_OFFSET:
                        data_off = int.from_bytes(
                            trun[at2 : at2 + 4], "big", signed=True
                        )
                        at2 += 4
                    first_flags = None
                    if fl & _TRUN_FIRST_FLAGS:
                        first_flags = int.from_bytes(trun[at2 : at2 + 4], "big")
                        at2 += 4
                    per = (
                        (4 if fl & _TRUN_DURATION else 0)
                        + (4 if fl & _TRUN_SIZE else 0)
                        + (4 if fl & _TRUN_FLAGS else 0)
                        + (4 if fl & _TRUN_CTS else 0)
                    )
                    if len(trun) < at2 + per * cnt:
                        return None
                    run_bytes = 0
                    for k in range(cnt):
                        dur, sz, sflags, cts = def_dur, def_size, def_flags, 0
                        if fl & _TRUN_DURATION:
                            dur = int.from_bytes(trun[at2 : at2 + 4], "big")
                            at2 += 4
                        if fl & _TRUN_SIZE:
                            sz = int.from_bytes(trun[at2 : at2 + 4], "big")
                            at2 += 4
                        if fl & _TRUN_FLAGS:
                            sflags = int.from_bytes(trun[at2 : at2 + 4], "big")
                            at2 += 4
                        if fl & _TRUN_CTS:
                            cts = int.from_bytes(
                                trun[at2 : at2 + 4], "big", signed=ver != 0
                            )
                            at2 += 4
                        if k == 0 and first_flags is not None:
                            sflags = first_flags
                        if sz == 0 and not (fl & _TRUN_SIZE):
                            return None  # no resolvable sample size
                        n_samples += 1
                        media_bytes += sz
                        run_bytes += sz
                        track_dur[tid] += dur
                        cts_sum += cts
                        if not sflags & _SAMPLE_NON_SYNC:
                            n_keyframes += 1
                    if base + data_off < 0 or base + data_off + run_bytes > n:
                        return None  # samples past EOF
    except (IndexError, struct.error):
        return None
    if n_samples == 0:
        return None
    duration_ms = max(
        (d * 1000 // timescale[tid]) if timescale[tid] else 0
        for tid, d in track_dur.items()
    )
    return {
        "n_tracks": len(trex),
        "n_fragments": n_fragments,
        "n_samples": n_samples,
        "media_bytes": media_bytes,
        "n_keyframes": n_keyframes,
        "duration_ms": duration_ms,
        "cts_sum": cts_sum,
    }


# fMP4 doc_id-derived parameters — restated verbatim in
# MP4_FRAGMENTS_ORACLE, keep in exact sync.
def _frag_geometry(doc_id: int) -> tuple[int, int]:
    """(n_tracks, n_fragments)."""
    return 1 + doc_id % 2, 2 + doc_id % 3


def _frag_run(doc_id: int, f: int, t: int) -> dict:
    cnt = 5 + (doc_id * 3 + f * 7 + t * 11) % 20
    return {
        "cnt": cnt,
        # duration source: per-sample / tfhd default / trex default
        "dur_per_sample": (doc_id + t) % 2 == 0,
        "dur_tfhd": (doc_id + t) % 4 == 1,
        "tfhd_dur": 15 + (doc_id + t) % 10,
        "trex_dur": 10 + (doc_id + t) % 50,
        # size source: per-sample / tfhd default
        "size_per_sample": (doc_id + f + t) % 3 != 0,
        "tfhd_size": 120 + (doc_id + t) % 80,
        # video (t=0): per-sample flags, key every key_step; audio: trex
        # sync default, first-sample-flags override on even fragments
        "key_step": 2 + (doc_id + f) % 4,
        "first_nonsync": t == 1 and f % 2 == 0,
        "cts": t == 0,
        "cts_signed": doc_id % 2 == 1,
    }


def _frag_dur(doc_id: int, f: int, t: int, k: int) -> int:
    r = _frag_run(doc_id, f, t)
    if r["dur_per_sample"]:
        return 10 + (doc_id + f + k) % 20
    return r["tfhd_dur"] if r["dur_tfhd"] else r["trex_dur"]


def _frag_size(doc_id: int, f: int, t: int, k: int) -> int:
    r = _frag_run(doc_id, f, t)
    if r["size_per_sample"]:
        return 100 + (doc_id * 5 + f * 3 + k * 7) % 150
    return r["tfhd_size"]


def synth_fmp4(doc_id: int) -> bytes:
    """Byte-for-byte FRAGMENTED MP4: moov carries mvex/trex defaults
    (no sample tables), then per fragment a real moof/traf/tfhd/trun
    followed by an mdat holding exactly the run's sample bytes. The
    parameter grid exercises every parser path: per-sample vs tfhd vs
    trex duration defaults, per-sample vs tfhd size defaults, per-
    sample flags with key strides (video) vs default-sync with
    first-sample-flags overrides (audio), v0/v1 composition offsets,
    and tfhd base-data-offset vs default-base-is-moof on doc_id % 5."""
    n_tracks, n_fragments = _frag_geometry(doc_id)

    def trak(t: int) -> bytes:
        tkhd = _full(
            b"tkhd", 0,
            struct.pack(">II", 0, 0) + struct.pack(">I", t + 1) + b"\x00" * 72,
        )
        mdhd = _full(
            b"mdhd", 0,
            struct.pack(">II", 0, 0)
            + struct.pack(">II", 1000 * (1 + (doc_id + t) % 3), 0)
            + b"\x00" * 4,
        )
        hdlr = _full(
            b"hdlr", 0,
            b"\x00" * 4 + (b"vide" if t == 0 else b"soun") + b"\x00" * 13,
        )
        return _box(b"trak", tkhd + _box(b"mdia", mdhd + hdlr))

    # trex default flags are 0 (sync): audio tracks rely on it (their
    # trun carries no per-sample flags); video tracks override per
    # sample, so their trex value is never consulted.
    def trex(t: int) -> bytes:
        r = _frag_run(doc_id, 0, t)
        return _full(
            b"trex", 0,
            struct.pack(">IIIII", t + 1, 1, r["trex_dur"], 0, 0),
        )

    mvhd = _full(
        b"mvhd", 0,
        struct.pack(">II", 0, 0) + struct.pack(">II", 1000, 0) + b"\x00" * 80,
    )
    mvex = _box(b"mvex", b"".join(trex(t) for t in range(n_tracks)))
    moov = _box(
        b"moov", mvhd + b"".join(trak(t) for t in range(n_tracks)) + mvex
    )
    ftyp = _box(b"ftyp", b"cmfc" + struct.pack(">I", 0) + b"cmfciso6")
    out = bytearray(ftyp + moov)

    abs_base = doc_id % 5 == 0  # exercise tfhd base-data-offset
    for f in range(n_fragments):
        moof_start = len(out)
        frag_blob = bytearray()
        run_offsets = []  # per track: offset into frag_blob
        for t in range(n_tracks):
            r = _frag_run(doc_id, f, t)
            run_offsets.append(len(frag_blob))
            for k in range(r["cnt"]):
                sz = _frag_size(doc_id, f, t, k)
                frag_blob += bytes(((doc_id + f + t + k + i) % 251 for i in range(sz)))

        # moof size must be known to compute data offsets (both
        # conventions); build twice — placeholder first — same as moov.
        def build_moof(data_at: list[int] | None) -> bytes:
            trafs = b""
            for t in range(n_tracks):
                r = _frag_run(doc_id, f, t)
                tf_flags = 0
                tfhd_body = struct.pack(">I", t + 1)
                if abs_base:
                    # base-data-offset = absolute run start; trun's
                    # data_offset is then 0
                    tf_flags |= _TFHD_BASE_OFFSET
                    tfhd_body += struct.pack(
                        ">Q", 0 if data_at is None else data_at[t]
                    )
                if not r["dur_per_sample"] and r["dur_tfhd"]:
                    tf_flags |= _TFHD_DEF_DURATION
                    tfhd_body += struct.pack(">I", r["tfhd_dur"])
                if not r["size_per_sample"]:
                    tf_flags |= _TFHD_DEF_SIZE
                    tfhd_body += struct.pack(">I", r["tfhd_size"])
                tfhd = _box(
                    b"tfhd", bytes((0,)) + tf_flags.to_bytes(3, "big") + tfhd_body
                )
                fl = _TRUN_DATA_OFFSET
                if r["dur_per_sample"]:
                    fl |= _TRUN_DURATION
                if r["size_per_sample"]:
                    fl |= _TRUN_SIZE
                if t == 0:
                    fl |= _TRUN_FLAGS
                if r["cts"]:
                    fl |= _TRUN_CTS
                if r["first_nonsync"]:
                    fl |= _TRUN_FIRST_FLAGS
                ver = 1 if r["cts_signed"] else 0
                body = struct.pack(">I", r["cnt"])
                # default-base-is-moof: data_offset is moof-relative
                body += struct.pack(
                    ">i",
                    0 if abs_base else (
                        0 if data_at is None else data_at[t] - moof_start
                    ),
                )
                if r["first_nonsync"]:
                    body += struct.pack(">I", _SAMPLE_NON_SYNC)
                for k in range(r["cnt"]):
                    if fl & _TRUN_DURATION:
                        body += struct.pack(">I", _frag_dur(doc_id, f, t, k))
                    if fl & _TRUN_SIZE:
                        body += struct.pack(">I", _frag_size(doc_id, f, t, k))
                    if fl & _TRUN_FLAGS:
                        body += struct.pack(
                            ">I",
                            0 if k % r["key_step"] == 0 else _SAMPLE_NON_SYNC,
                        )
                    if fl & _TRUN_CTS:
                        v = (doc_id + f + k) % 9
                        if r["cts_signed"]:
                            body += struct.pack(">i", v - 4)
                        else:
                            body += struct.pack(">I", v)
                trun = _box(b"trun", bytes((ver,)) + fl.to_bytes(3, "big") + body)
                trafs += _box(b"traf", tfhd + trun)
            return _box(b"moof", _full(b"mfhd", 0, struct.pack(">I", f + 1)) + trafs)

        placeholder = build_moof(None)
        mdat_payload_at = moof_start + len(placeholder) + 8
        moof = build_moof([mdat_payload_at + o for o in run_offsets])
        assert len(moof) == len(placeholder)
        out += moof + _box(b"mdat", bytes(frag_blob))
    return bytes(out)


MP4_FRAGMENTS_SCHEMA = (
    "doc_id bigint, n_tracks int, n_fragments int, n_samples bigint, "
    "media_bytes bigint, n_keyframes bigint, duration_ms bigint, "
    "cts_sum bigint"
)

_FRAG_COLS = [
    "n_tracks", "n_fragments", "n_samples", "media_bytes",
    "n_keyframes", "duration_ms", "cts_sum",
]


def mp4_fragments_frame(df: DataFrame, id_col: str = "doc_id",
                        payload_col: str = "payload") -> DataFrame:
    """Fragmented-MP4 census over ANY (id, binary) frame — one row per
    doc with the parse_mp4_fragments aggregates (nulls for non-fMP4)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                agg = (parse_mp4_fragments(bytes(p)) if p is not None else None) or {}
                rows.append(
                    {id_col: doc_id, **{c: agg.get(c) for c in _FRAG_COLS}}
                )
            yield pd.DataFrame(rows, columns=[id_col] + _FRAG_COLS)

    src = df.select(F.col(id_col), F.col(payload_col))
    return src.mapInPandas(
        batches, schema=MP4_FRAGMENTS_SCHEMA.replace("doc_id", id_col, 1)
    )


def mp4_fragments_roundtrip(spark, sf_dir: str) -> DataFrame:
    """End-to-end structural round trip for FRAGMENTED MP4 (the C49
    pattern): per document a DASH/CMAF-shaped stream is synthesized
    byte-for-byte (moov+mvex/trex only — no sample tables — then
    moof/traf/tfhd/trun + mdat per fragment, exercising the full
    default cascade and both data-offset conventions), decoded by the
    real fragment parser, census value-checked by doc_id arithmetic."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": [synth_fmp4(int(d)) for d in pdf["doc_id"]],
            })

    payloads = docs.repartition(
        stage_parallelism(docs.sparkSession), "doc_id"
    ).mapInPandas(synth, schema="doc_id bigint, payload binary")
    return mp4_fragments_frame(payloads).orderBy("doc_id")


# The synthesized fragmented streams' census in closed form: runs
# replicate _frag_run, samples _frag_dur/_frag_size and the flag logic.
MP4_FRAGMENTS_ORACLE = """
WITH geo AS (
  SELECT doc_id, 1 + doc_id % 2 AS n_tracks, 2 + doc_id % 3 AS n_fragments
  FROM documents
),
runs AS (
  SELECT g.doc_id, t.t, f.f,
         5 + (g.doc_id * 3 + f.f * 7 + t.t * 11) % 20 AS cnt,
         CASE WHEN (g.doc_id + t.t) % 2 = 0 THEN 1 ELSE 0 END AS dur_ps,
         CASE WHEN (g.doc_id + t.t) % 4 = 1
              THEN 15 + (g.doc_id + t.t) % 10
              ELSE 10 + (g.doc_id + t.t) % 50 END AS def_dur,
         CASE WHEN (g.doc_id + f.f + t.t) % 3 <> 0 THEN 1 ELSE 0 END AS size_ps,
         120 + (g.doc_id + t.t) % 80 AS def_size,
         2 + (g.doc_id + f.f) % 4 AS key_step,
         CASE WHEN t.t = 1 AND f.f % 2 = 0 THEN 1 ELSE 0 END AS first_nonsync,
         CASE WHEN g.doc_id % 2 = 1 THEN 4 ELSE 0 END AS cts_bias
  FROM geo g
  JOIN generate_series(0, 1) t(t) ON t.t < g.n_tracks
  JOIN generate_series(0, 3) f(f) ON f.f < g.n_fragments
),
samp AS (
  SELECT r.doc_id, r.t, r.f, k.k,
         CASE WHEN r.dur_ps = 1 THEN 10 + (r.doc_id + r.f + k.k) % 20
              ELSE r.def_dur END AS dur,
         CASE WHEN r.size_ps = 1
              THEN 100 + (r.doc_id * 5 + r.f * 3 + k.k * 7) % 150
              ELSE r.def_size END AS sz,
         CASE WHEN r.t = 0
              THEN CASE WHEN k.k % r.key_step = 0 THEN 1 ELSE 0 END
              ELSE CASE WHEN r.first_nonsync = 1 AND k.k = 0 THEN 0 ELSE 1 END
         END AS is_key,
         CASE WHEN r.t = 0 THEN (r.doc_id + r.f + k.k) % 9 - r.cts_bias
              ELSE 0 END AS cts
  FROM runs r
  JOIN generate_series(0, 24) k(k) ON k.k < r.cnt
),
per_track AS (
  SELECT doc_id, t,
         sum(dur) * 1000 // (1000 * (1 + (doc_id + t) % 3)) AS tdur_ms
  FROM samp GROUP BY doc_id, t
)
SELECT s.doc_id,
       CAST(max(g.n_tracks) AS INT) AS n_tracks,
       CAST(max(g.n_fragments) AS INT) AS n_fragments,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(s.sz) AS BIGINT) AS media_bytes,
       CAST(sum(s.is_key) AS BIGINT) AS n_keyframes,
       CAST((SELECT max(tdur_ms) FROM per_track p WHERE p.doc_id = s.doc_id)
            AS BIGINT) AS duration_ms,
       CAST(sum(s.cts) AS BIGINT) AS cts_sum
FROM samp s JOIN geo g ON g.doc_id = s.doc_id
GROUP BY s.doc_id
ORDER BY s.doc_id
"""
