"""MPEG-1 Layer III STRUCTURAL decode — frame walk + bit-exact side-info
parse (ISO/IEC 11172-3 §2.4.1.7), plus the matching byte-for-byte frame
synthesizer, giving the C49 round-trip pattern (synth → real parse →
arithmetic oracle) one level deeper than the r7 header walk in
binary.py: per-granule block types, global gains, Huffman partition
geometry (big_values, region counts, table selections) and bit-reservoir
accounting (main_data_begin, part2_3_length) are now really decoded from
the bitstream, not just the 4-byte frame header.

Reference parity: the reference repo has no audio pipeline at all
(its ingest/ handles tabular + text only); this module is part of the
multimodal-column brief (opaque binary + typed metadata + real decode
where certifiable).

WHY SAMPLE (PCM) DECODE IS OUT OF SCOPE — the declared boundary, with
the same rigor as the arithmetic-JPEG de-scope (jpegcodec.py):

Layer III sample reconstruction needs three families of FIXED
out-of-band table data: the 32 big-value Huffman code tables, the
scalefactor-band partition tables per sample rate, and the 512-tap
synthesis-window (Table 3-B.3). None are derivable from structure —
they are measured/designed constants the spec publishes as tables.
Contrast JPEG, which this repo DOES decode to samples: JPEG's entropy
tables and quant matrices travel IN-BAND (DHT/DQT segments), so the
decoder is self-describing and a synthesized-payload round trip
certifies real-world behavior. An MP3 decoder here would have to
transcribe the spec tables from memory, and this container has no
reference decoder (no ffmpeg/mpg123/lame, no audio libs) against which
a transcription could be validated; a single mis-transcribed code or
window tap yields EXACTLY the silent-corruption failure mode of the r7
JPEG DCT-scale bug (decodes "successfully", wrong samples, poisoned
fingerprints downstream) — with no in-container way to detect it. An
encode→decode round trip cannot certify table data either: any
self-consistent bijection round-trips, so such a test validates only
the DSP chain, not interoperability with real files. Until a trusted
table source is available in the build environment, sample decode is
rejected cleanly (the in-subset/None contract every decoder here
follows) rather than shipped uncertifiable.

Everything in THIS module is pure bit-field layout — field widths and
order, frame-length arithmetic, reservoir pointers — which is exactly
the part of the spec that is certifiable from structure, and the part
a 100 TB crawl pipeline needs for triage: codec/bitrate/duration
census, reservoir/bitrate-distribution stats, short-block (transient)
density, and corrupt-stream detection, all without touching a sample.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# MPEG-1 Layer III constants (ISO/IEC 11172-3 §2.4.2.3)
_BITRATES_KBPS = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_SAMPLE_RATES = [44100, 48000, 32000]  # index 3 reserved


class _BitReader:
    """MSB-first bit reader (no byte stuffing — side info is raw)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.bytes.append(self.acc)
                self.acc, self.nacc = 0, 0

    def flush(self) -> bytes:
        if self.nacc:
            self.bytes.append(self.acc << (8 - self.nacc))
            self.acc, self.nacc = 0, 0
        return bytes(self.bytes)


def frame_length(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    """Layer III / MPEG-1 frame size in bytes (spec §2.4.3.1):
    144 * bitrate / sample_rate + padding."""
    return 144_000 * bitrate_kbps // sample_rate + padding


def parse_sideinfo_bits(data: bytes, channels: int) -> dict:
    """Bit-exact parse of one MPEG-1 Layer III side-info block
    (17 bytes mono / 32 stereo) into its full field tree."""
    r = _BitReader(data)
    out: dict = {"main_data_begin": r.bits(9)}
    r.bits(5 if channels == 1 else 3)  # private_bits
    out["scfsi"] = [[r.bits(1) for _ in range(4)] for _ in range(channels)]
    granules = []
    for _g in range(2):
        chans = []
        for _ch in range(channels):
            gr = {
                "part2_3_length": r.bits(12),
                "big_values": r.bits(9),
                "global_gain": r.bits(8),
                "scalefac_compress": r.bits(4),
            }
            if r.bits(1):  # window_switching_flag
                gr["block_type"] = r.bits(2)
                gr["mixed_block_flag"] = r.bits(1)
                gr["table_select"] = [r.bits(5) for _ in range(2)]
                gr["subblock_gain"] = [r.bits(3) for _ in range(3)]
                # region counts are implicit for switched windows
                gr["region0_count"] = 8 if gr["block_type"] != 2 else 9
                gr["region1_count"] = None
            else:
                gr["block_type"] = 0
                gr["mixed_block_flag"] = 0
                gr["table_select"] = [r.bits(5) for _ in range(3)]
                gr["subblock_gain"] = [0, 0, 0]
                gr["region0_count"] = r.bits(4)
                gr["region1_count"] = r.bits(3)
            gr["preflag"] = r.bits(1)
            gr["scalefac_scale"] = r.bits(1)
            gr["count1table_select"] = r.bits(1)
            chans.append(gr)
        granules.append(chans)
    out["granules"] = granules
    assert r.pos == (136 if channels == 1 else 256)
    return out


def parse_mp3_stream(payload: bytes) -> dict | None:
    """Walk an MPEG-1 Layer III stream frame by frame and parse every
    side-info block. Returns per-stream structural aggregates:

      n_frames, channels, sample_rate, bitrate_kbps (of frame 1),
      duration_ms            (n_frames * 1152 samples / rate),
      main_bits              (Σ part2_3_length over frames×granules×ch),
      max_reservoir          (max main_data_begin — reservoir depth),
      n_short_granules       (granule-channels with block_type 2),
      gain_sum               (Σ global_gain),
      big_values_sum         (Σ big_values)

    None for anything that is not a clean MPEG-1 Layer III stream
    (including on the FIRST malformed frame — a crawl-triage census
    must not silently count garbage tails). ID3v2 prefix is skipped."""
    i = 0
    n = len(payload)
    if n >= 10 and payload[:3] == b"ID3":
        ss = payload[6:10]
        i = 10 + (
            (ss[0] & 0x7F) << 21 | (ss[1] & 0x7F) << 14
            | (ss[2] & 0x7F) << 7 | (ss[3] & 0x7F)
        )
    first = None
    n_frames = 0
    main_bits = 0
    max_reservoir = 0
    n_short = 0
    gain_sum = 0
    big_values_sum = 0
    while i + 4 <= n:
        if payload[i] != 0xFF or (payload[i + 1] & 0xFE) != 0xFA:
            return None  # not MPEG-1 Layer III sync
        crc_bytes = 2 if (payload[i + 1] & 0x01) == 0 else 0  # protection=0
        b2, b3 = payload[i + 2], payload[i + 3]
        bitrate_idx = (b2 >> 4) & 0xF
        rate_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        if bitrate_idx in (0, 0xF) or rate_idx == 3:
            return None
        channel_mode = (b3 >> 6) & 0x3
        channels = 1 if channel_mode == 3 else 2
        kbps = _BITRATES_KBPS[bitrate_idx]
        rate = _SAMPLE_RATES[rate_idx]
        if first is None:
            first = (channels, rate, kbps)
        elif (channels, rate) != first[:2]:
            return None  # mid-stream reconfiguration: out of subset
        fl = frame_length(kbps, rate, padding)
        si_len = 17 if channels == 1 else 32
        si_at = i + 4 + crc_bytes  # CRC-16 (when present) precedes side info
        if si_at + si_len > n or i + fl > n:
            return None  # truncated frame
        si = parse_sideinfo_bits(payload[si_at : si_at + si_len], channels)
        max_reservoir = max(max_reservoir, si["main_data_begin"])
        for g in si["granules"]:
            for ch in g:
                main_bits += ch["part2_3_length"]
                gain_sum += ch["global_gain"]
                big_values_sum += ch["big_values"]
                if ch["block_type"] == 2:
                    n_short += 1
        n_frames += 1
        i += fl
    if n_frames == 0 or first is None:
        return None
    channels, rate, kbps = first
    return {
        "n_frames": n_frames,
        "channels": channels,
        "sample_rate": rate,
        "bitrate_kbps": kbps,
        "duration_ms": n_frames * 1152 * 1000 // rate,
        "main_bits": main_bits,
        "max_reservoir": max_reservoir,
        "n_short_granules": n_short,
        "gain_sum": gain_sum,
        "big_values_sum": big_values_sum,
    }


# ------------------------------------------------------------- synthesis

# doc_id-derived stream parameters — every formula here is restated
# verbatim in MP3_SIDEINFO_ORACLE, so keep them in exact sync.
def _stream_params(doc_id: int) -> tuple[int, int, int, int]:
    """(n_frames, channels, bitrate_idx, rate_idx) for a doc."""
    n_frames = 3 + doc_id % 4
    channels = 1 + doc_id % 2
    bitrate_idx = 1 + (doc_id * 5) % 14  # 1..14 — every legal index
    rate_idx = doc_id % 3
    return n_frames, channels, bitrate_idx, rate_idx


def _granule_fields(doc_id: int, f: int, g: int, ch: int) -> tuple[int, int, int, int]:
    """(part2_3_length, big_values, global_gain, short?) — doc_id
    arithmetic mirrored by the oracle. part2_3_length stays small so the
    claimed main data always fits the frame's byte budget."""
    part23 = (doc_id * 31 + f * 17 + g * 7 + ch * 3) % 512
    bigv = (doc_id * 13 + f * 5 + g * 11 + ch) % 288
    gain = (doc_id * 7 + f * 3 + g * 29 + ch * 41) % 256
    short = 1 if (doc_id + f + g + ch) % 5 == 0 else 0
    return part23, bigv, gain, short


def synth_mp3_stream(doc_id: int) -> bytes:
    """Byte-for-byte MPEG-1 Layer III stream: real sync headers, real
    frame-length arithmetic (padding bit alternates by frame parity),
    and bit-packed side info whose fields follow _granule_fields;
    main-data region is a deterministic byte fill (entropy payload is
    out of structural scope — see module docstring)."""
    n_frames, channels, bitrate_idx, rate_idx = _stream_params(doc_id)
    kbps = _BITRATES_KBPS[bitrate_idx]
    rate = _SAMPLE_RATES[rate_idx]
    out = bytearray()
    for f in range(n_frames):
        padding = f % 2
        fl = frame_length(kbps, rate, padding)
        # header: sync(11) ver=11(MPEG1) layer=01(III) crc=1(none)
        b1 = 0xFB
        b2 = (bitrate_idx << 4) | (rate_idx << 2) | (padding << 1)
        channel_mode = 3 if channels == 1 else 0
        b3 = channel_mode << 6
        out += bytes((0xFF, b1, b2, b3))
        w = _BitWriter()
        w.write((doc_id * 3 + f * 29) % 512, 9)  # main_data_begin
        w.write(0, 5 if channels == 1 else 3)  # private
        for _ch in range(channels):
            w.write(0, 4)  # scfsi
        for g in range(2):
            for ch in range(channels):
                part23, bigv, gain, short = _granule_fields(doc_id, f, g, ch)
                w.write(part23, 12)
                w.write(bigv, 9)
                w.write(gain, 8)
                w.write((doc_id + g) % 16, 4)  # scalefac_compress
                w.write(short, 1)  # window_switching_flag
                if short:
                    w.write(2, 2)  # block_type: short
                    w.write(0, 1)  # mixed_block_flag
                    for t in range(2):
                        w.write((doc_id + t) % 32, 5)
                    for sb in range(3):
                        w.write((doc_id + sb) % 8, 3)
                else:
                    for t in range(3):
                        w.write((doc_id + t) % 32, 5)
                    w.write(doc_id % 16, 4)  # region0_count
                    w.write((doc_id + 1) % 8, 3)  # region1_count
                w.write(0, 1)  # preflag
                w.write(doc_id % 2, 1)  # scalefac_scale
                w.write((doc_id + g) % 2, 1)  # count1table_select
        si = w.flush()
        assert len(si) == (17 if channels == 1 else 32)
        out += si
        body = fl - 4 - len(si)
        out += bytes(((doc_id + f + k) % 251 for k in range(body)))
    return bytes(out)


MP3_SIDEINFO_SCHEMA = (
    "doc_id bigint, n_frames int, channels int, sample_rate int, "
    "bitrate_kbps int, duration_ms bigint, main_bits bigint, "
    "max_reservoir int, n_short_granules int, gain_sum bigint, "
    "big_values_sum bigint"
)


def mp3_sideinfo_frame(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """Structural Layer III census over ANY (id, binary) frame — the
    same Arrow mapInPandas plumbing as audio_meta_frame, one row per
    doc with the parse_mp3_stream aggregates (nulls for non-MP3)."""
    cols = ["n_frames", "channels", "sample_rate", "bitrate_kbps",
            "duration_ms", "main_bits", "max_reservoir",
            "n_short_granules", "gain_sum", "big_values_sum"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                agg = parse_mp3_stream(bytes(p)) or {}
                rows.append({"doc_id": doc_id, **{c: agg.get(c) for c in cols}})
            yield pd.DataFrame(rows)

    src = df.select(F.col(id_col).alias(id_col), F.col(payload_col))
    return src.mapInPandas(batches, schema=MP3_SIDEINFO_SCHEMA)


def mp3_sideinfo_roundtrip(spark, sf_dir: str) -> DataFrame:
    """End-to-end structural round-trip (the C49 pattern): per document
    a Layer III stream is synthesized byte-for-byte, walked and
    bit-parsed by the REAL parser, and the aggregates value-checked by
    an oracle that restates frame-length arithmetic, reservoir maxima
    and every side-info field sum as doc_id arithmetic."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": [synth_mp3_stream(int(d)) for d in pdf["doc_id"]],
            })

    payloads = docs.repartition(
        stage_parallelism(docs.sparkSession), "doc_id"
    ).mapInPandas(synth, schema="doc_id bigint, payload binary")
    return mp3_sideinfo_frame(payloads).orderBy("doc_id")


# The synthesized streams' expected aggregates in closed form. Granule
# sums over f<n_frames, g<2, ch<channels replicate _granule_fields.
MP3_SIDEINFO_ORACLE = """
WITH p AS (
  SELECT doc_id,
         3 + doc_id % 4 AS n_frames,
         1 + doc_id % 2 AS channels,
         1 + (doc_id * 5) % 14 AS bitrate_idx,
         doc_id % 3 AS rate_idx
  FROM documents
),
rates AS (
  SELECT p.*,
         CASE bitrate_idx WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48
              WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80 WHEN 7 THEN 96
              WHEN 8 THEN 112 WHEN 9 THEN 128 WHEN 10 THEN 160
              WHEN 11 THEN 192 WHEN 12 THEN 224 WHEN 13 THEN 256
              ELSE 320 END AS kbps,
         CASE rate_idx WHEN 0 THEN 44100 WHEN 1 THEN 48000
              ELSE 32000 END AS rate
  FROM p
),
g AS (
  SELECT r.doc_id, f.f, gr.g, ch.ch,
         (r.doc_id * 31 + f.f * 17 + gr.g * 7 + ch.ch * 3) % 512 AS part23,
         (r.doc_id * 13 + f.f * 5 + gr.g * 11 + ch.ch) % 288 AS bigv,
         (r.doc_id * 7 + f.f * 3 + gr.g * 29 + ch.ch * 41) % 256 AS gain,
         CASE WHEN (r.doc_id + f.f + gr.g + ch.ch) % 5 = 0 THEN 1 ELSE 0 END AS short
  FROM rates r
  JOIN generate_series(0, 6) f(f) ON f.f < r.n_frames
  CROSS JOIN generate_series(0, 1) gr(g)
  JOIN generate_series(0, 1) ch(ch) ON ch.ch < r.channels
),
res AS (
  SELECT r.doc_id,
         max((r.doc_id * 3 + f.f * 29) % 512) AS max_reservoir
  FROM rates r JOIN generate_series(0, 6) f(f) ON f.f < r.n_frames
  GROUP BY r.doc_id
)
SELECT r.doc_id,
       CAST(r.n_frames AS INT) AS n_frames,
       CAST(r.channels AS INT) AS channels,
       CAST(r.rate AS INT) AS sample_rate,
       CAST(r.kbps AS INT) AS bitrate_kbps,
       CAST(r.n_frames * 1152 * 1000 // r.rate AS BIGINT) AS duration_ms,
       CAST(sum(g.part23) AS BIGINT) AS main_bits,
       CAST(res.max_reservoir AS INT) AS max_reservoir,
       CAST(sum(g.short) AS INT) AS n_short_granules,
       CAST(sum(g.gain) AS BIGINT) AS gain_sum,
       CAST(sum(g.bigv) AS BIGINT) AS big_values_sum
FROM rates r JOIN g ON r.doc_id = g.doc_id JOIN res ON r.doc_id = res.doc_id
GROUP BY r.doc_id, r.n_frames, r.channels, r.rate, r.kbps, res.max_reservoir
ORDER BY r.doc_id
"""
