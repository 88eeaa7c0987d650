"""Multimodal (binary) column plumbing.

Treats media as opaque `binary` payload columns with typed metadata,
processed by Arrow-batched `mapInPandas` — the pattern a 100 TB
image/audio pipeline needs: payloads stay in executor-local Arrow
batches, the UDF emits fixed-schema metadata, and partitioning is by
payload hash so decode work balances.

Pixel decode is REAL for every major image family — PNG, 24-bit BMP,
binary PPM/PGM, GIF/LZW, and baseline JPEG (multimodal/pixels.py +
jpegcodec.py, r7) — and header decode is real for PNG/JPEG/GIF,
WAV/MP3, and MP4. Only out-of-subset image variants (arithmetic-coded
JPEG) and video/audio CODEC frames
remain behind NotImplementedError, with a deterministic fake "decode"
deriving metadata from payload bytes so that plumbing (schema,
batching, UDF signature) stays real and testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from danae_spark.catalog import load_table

META_SCHEMA = (
    "doc_id bigint, byte_size int, sha256 string, width int, height int, channels int"
)


def decode_image(payload: bytes) -> dict:
    """Pixel decode dispatch. REAL for every major image family —
    PNG (zlib inflate + all five unfilter types), 24-bit BMP, binary
    PPM/PGM, GIF (pure-Python LZW incl. interlace), baseline JPEG
    (numpy Huffman+IDCT codec), TIFF baseline strips, 16/32-bit and
    BITFIELDS BMP, and plain ASCII PNM (all r15) — via
    multimodal/pixels.decode_pixels. NOT IMPLEMENTED only for
    out-of-subset variants (arithmetic-coded JPEG, tiled TIFF,
    nonstandard BITFIELDS masks, ...): header-level metadata for
    those comes from parse_image_header."""
    from danae_spark.multimodal.pixels import decode_pixels

    px = decode_pixels(payload)
    if px is not None:
        return {
            "width": px.shape[1],
            "height": px.shape[0],
            "channels": px.shape[2],
            "pixels": px,
        }
    raise NotImplementedError(
        "pixel decode unavailable for this payload (out-of-subset "
        "variant: arithmetic-coded JPEG, 16/32-bit BMP, ...); "
        "parse_image_header handles metadata, and PNG/BMP/PPM/PGM/GIF/"
        "baseline-JPEG decode for real via multimodal.pixels"
    )


# PNG color type → sample channels (spec: greyscale, RGB, palette,
# greyscale+alpha, RGBA)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG SOF markers carrying frame headers (all except DHT C4, DAC CC,
# and the RST/other non-frame FFCx codes)
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF
}


def parse_image_header(payload: bytes) -> dict | None:
    """Stdlib-only image HEADER decode: real format/width/height/channels
    for PNG (IHDR), JPEG (SOF segment walk), and GIF (screen descriptor).
    Returns None for anything unrecognized (the caller falls back to the
    declared fake path). Pure bytes→dict, so it runs inside the Arrow
    mapInPandas batches with zero extra dependencies."""
    import struct

    if len(payload) >= 33 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        # first chunk must be IHDR: length(4) type(4) at offset 8
        if payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            bit_depth, color_type = payload[24], payload[25]
            return {
                "format": "png",
                "width": w,
                "height": h,
                "channels": _PNG_CHANNELS.get(color_type, 3),
                "bit_depth": bit_depth,
            }
        return None
    if len(payload) >= 4 and payload[:3] == b"\xff\xd8\xff":
        # walk marker segments to the first SOF frame header
        i = 2
        n = len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                i += 2  # standalone markers, no length field
                continue
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF:
                if i + 9 > n:
                    return None
                precision = payload[i + 4]
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                channels = payload[i + 9] if i + 9 < n else 3
                return {
                    "format": "jpeg",
                    "width": w,
                    "height": h,
                    "channels": channels,
                    "bit_depth": precision,
                }
            i += 2 + seg_len
        return None
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return {"format": "gif", "width": w, "height": h, "channels": 3, "bit_depth": 8}
    return None


# MPEG audio frame-header tables (ISO/IEC 11172-3): bitrate kbps by
# (version-group, layer) and sample rate by version — index 0xF/0x3 are
# invalid and rejected.
_MP3_BITRATES_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_BITRATES_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def parse_audio_header(payload: bytes) -> dict | None:
    """Stdlib-only audio HEADER decode: real sample-rate/channels/
    duration for WAV (RIFF fmt chunk walk) and MP3 (ID3v2 skip + MPEG
    frame-header sync). Returns None for anything unrecognized. Pure
    bytes→dict — runs inside the Arrow mapInPandas batches with zero
    extra dependencies, same pattern as parse_image_header.

    One level deeper for MP3 lives in multimodal/mp3.py (r9): full
    frame walk + bit-exact side-info parse (granule block types,
    Huffman partition geometry, bit-reservoir accounting). Layer III
    SAMPLE decode is a documented de-scope — see that module's
    docstring for the certifiability boundary (fixed out-of-band spec
    tables, no reference decoder in this container)."""
    import struct

    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        i, n = 12, len(payload)
        fmt = None
        data_size = None
        while i + 8 <= n:
            cid = payload[i : i + 4]
            csize = struct.unpack("<I", payload[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 24 <= n:
                _audio_fmt, channels, sample_rate, byte_rate, _ba, bits = struct.unpack(
                    "<HHIIHH", payload[i + 8 : i + 24]
                )
                fmt = (channels, sample_rate, byte_rate, bits)
            elif cid == b"data":
                data_size = csize
            i += 8 + csize + (csize % 2)  # chunks are word-aligned
        if fmt is None:
            return None
        channels, sample_rate, byte_rate, bits = fmt
        duration_ms = (
            int(data_size * 1000 / byte_rate) if data_size and byte_rate else None
        )
        return {
            "format": "wav",
            "sample_rate": sample_rate,
            "channels": channels,
            "bit_depth": bits,
            "duration_ms": duration_ms,
            "bitrate_kbps": byte_rate * 8 // 1000 if byte_rate else None,
        }
    if len(payload) >= 27 and payload[:4] == b"OggS":
        # Ogg (Opus/Vorbis) — the full CRC-validated page walk lives in
        # multimodal/ogg.py; reuse it for the header-triad dispatch
        from danae_spark.multimodal.ogg import parse_ogg

        c = parse_ogg(payload)
        if c is None:
            return None
        return {
            "format": "ogg-" + c["codec"],
            "sample_rate": c["sample_rate"],
            "channels": c["channels"],
            "bit_depth": None,  # lossy codecs: no PCM depth
            "duration_ms": c["duration_ms"],
            "bitrate_kbps": None,
        }
    if len(payload) >= 42 and payload[:4] == b"fLaC":
        # STREAMINFO is mandatory first (RFC 9639 §8.1); full sample
        # decode lives in multimodal/flac.py — this is the cheap
        # header-triad path for audio_meta dispatch.
        body = payload[8 : 8 + int.from_bytes(payload[5:8], "big")]
        if (payload[4] & 0x7F) != 0 or len(body) < 34:
            return None
        rate = int.from_bytes(body[10:13], "big") >> 4
        channels = ((body[12] >> 1) & 0x7) + 1
        bits = (((body[12] & 0x1) << 4) | (body[13] >> 4)) + 1
        total = ((body[13] & 0x0F) << 32) | int.from_bytes(body[14:18], "big")
        if rate == 0:
            return None
        return {
            "format": "flac",
            "sample_rate": rate,
            "channels": channels,
            "bit_depth": bits,
            "duration_ms": total * 1000 // rate if total else None,
            "bitrate_kbps": None,  # variable; needs a frame walk
        }
    i = 0
    if len(payload) >= 10 and payload[:3] == b"ID3":
        # ID3v2 size is a 4-byte syncsafe int after version+flags
        ss = payload[6:10]
        i = 10 + ((ss[0] & 0x7F) << 21 | (ss[1] & 0x7F) << 14 | (ss[2] & 0x7F) << 7 | (ss[3] & 0x7F))
    if len(payload) >= i + 4 and payload[i] == 0xFF and (payload[i + 1] & 0xE0) == 0xE0:
        b1, b2, b3 = payload[i + 1], payload[i + 2], payload[i + 3]
        version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (b1 >> 1) & 0x3  # 1=Layer III, 2=II, 3=I
        bitrate_idx = (b2 >> 4) & 0xF
        rate_idx = (b2 >> 2) & 0x3
        if version == 1 or layer == 0 or bitrate_idx in (0, 0xF) or rate_idx == 3:
            return None
        table = _MP3_BITRATES_V1_L3 if version == 3 else _MP3_BITRATES_V2_L3
        channel_mode = (b3 >> 6) & 0x3
        return {
            "format": "mp3",
            "sample_rate": _MP3_RATES[version][rate_idx],
            "channels": 1 if channel_mode == 3 else 2,
            "bit_depth": None,  # lossy codec: no PCM bit depth
            "duration_ms": None,  # needs a full frame walk / Xing header
            # the kbps tables are per-layer; only Layer III is tabled here
            "bitrate_kbps": table[bitrate_idx] if layer == 1 else None,
        }
    return None


AUDIO_META_SCHEMA = (
    "doc_id bigint, byte_size int, sha256 string, format string, "
    "sample_rate int, channels int, bit_depth int, duration_ms bigint, "
    "bitrate_kbps int"
)


def _audio_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [
        "format", "sample_rate", "channels", "bit_depth", "duration_ms", "bitrate_kbps"
    ]
    for pdf in batches:
        rows = []
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            hdr = parse_audio_header(p) or {}
            rows.append(
                {
                    "doc_id": doc_id,
                    "byte_size": len(p),
                    "sha256": hashlib.sha256(p).hexdigest(),
                    **{c: hdr.get(c) for c in cols},
                }
            )
        yield pd.DataFrame(rows)


def audio_meta_frame(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Audio metadata extraction over ANY (id, binary payload) frame —
    the same Arrow-batched mapInPandas plumbing as multimodal_meta, with
    real WAV/MP3 header decode (parse_audio_header). Unrecognized
    payloads keep size/hash and null audio fields."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(_audio_meta_batches, schema=AUDIO_META_SCHEMA)


def synth_wav(sample_rate: int, channels: int, bits: int, n_samples: int) -> bytes:
    """Deterministic minimal WAV payload (44-byte canonical header +
    zeroed PCM data) — the synthesis half of the oracle-checked
    round-trip below."""
    import struct

    byte_rate = sample_rate * channels * bits // 8
    data = b"\x00" * (n_samples * channels * bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * bits // 8, bits
    )
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def audio_meta_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable audio-metadata round-trip: per document a WAV
    payload with doc_id-derived parameters is SYNTHESIZED byte-for-byte
    (synth_wav) and pushed through the REAL header parser
    (parse_audio_header) inside the Arrow mapInPandas plumbing. The
    DuckDB oracle states the expected metadata as pure doc_id
    arithmetic, so any regression in either the byte layout or the
    parser breaks the value hash."""
    from danae_spark.catalog import load_table
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for doc_id in pdf["doc_id"]:
                rate = 8000 + int(doc_id % 8) * 1000
                ch = 1 + int(doc_id % 2)
                payload = synth_wav(rate, ch, 16, rate // 100)
                hdr = parse_audio_header(payload) or {}
                rows.append(
                    {
                        "doc_id": doc_id,
                        "byte_size": len(payload),
                        "format": hdr.get("format"),
                        "sample_rate": hdr.get("sample_rate"),
                        "channels": hdr.get("channels"),
                        "bit_depth": hdr.get("bit_depth"),
                        "duration_ms": hdr.get("duration_ms"),
                        "bitrate_kbps": hdr.get("bitrate_kbps"),
                    }
                )
        yield pd.DataFrame(rows)

    schema = (
        "doc_id bigint, byte_size int, format string, sample_rate int,"
        " channels int, bit_depth int, duration_ms bigint, bitrate_kbps int"
    )
    return docs.mapInPandas(batches, schema=schema).orderBy("doc_id")


AUDIO_ROUNDTRIP_ORACLE = """
    SELECT doc_id,
           CAST(44 + (8000 + (doc_id % 8) * 1000) // 100
                     * (1 + doc_id % 2) * 2 AS INT) AS byte_size,
           'wav' AS format,
           CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           16 AS bit_depth,
           CAST(10 AS BIGINT) AS duration_ms,
           CAST((8000 + (doc_id % 8) * 1000) * (1 + doc_id % 2) * 16 // 1000 AS INT)
             AS bitrate_kbps
    FROM documents ORDER BY doc_id
    """


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic stand-in for decode: metadata derived from bytes."""
    size = len(payload)
    return {
        "byte_size": size,
        "sha256": hashlib.sha256(payload).hexdigest(),
        "width": size % 640,
        "height": size % 480,
        "channels": 3,
    }


def _decode_meta(payload: bytes) -> dict:
    """Header parse for genuine image payloads; deterministic fake for
    everything else (keeps the text-payload test tables oracle-stable)."""
    hdr = parse_image_header(payload)
    if hdr is not None:
        return {
            "byte_size": len(payload),
            "sha256": hashlib.sha256(payload).hexdigest(),
            "width": hdr["width"],
            "height": hdr["height"],
            "channels": hdr["channels"],
        }
    return fake_decode_meta(payload)


def _extract_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [_decode_meta(p) for p in pdf["payload"]]
        out = pd.DataFrame(metas)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payloads (UTF-8 document bytes standing in for media blobs)
    → metadata extraction via mapInPandas."""
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return docs.mapInPandas(_extract_meta, schema=META_SCHEMA).orderBy("doc_id")


MULTIMODAL_META_ORACLE = """
    SELECT doc_id,
           octet_length(encode(text)) AS byte_size,
           sha256(text) AS sha256,
           octet_length(encode(text)) % 640 AS width,
           octet_length(encode(text)) % 480 AS height,
           3 AS channels
    FROM documents ORDER BY doc_id
    """


# -------------------------- video container headers (MP4 / ISO-BMFF)


def parse_video_header(payload: bytes) -> dict | None:
    """REAL MP4/ISO-BMFF header decode, stdlib-only: walk the top-level
    box sequence for `ftyp` (major brand) and `moov` → `mvhd`
    (timescale/duration, v0 and v1 layouts) plus per-`trak` `tkhd`
    width/height (16.16 fixed point; first visual track wins). Codec
    and sample decode stay behind the declared container-limited stub
    (decode_image's pattern) — the box structure itself is what a
    100 TB metadata pass reads, and reading it needs no codec libs.

    Returns None when the payload has no recognizable box structure;
    truncated/garbled boxes terminate the walk without raising."""

    def boxes(buf: bytes):
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

    if payload[:4] == b"\x1a\x45\xdf\xa3":
        # EBML magic → WebM/Matroska; the full element walk lives in
        # multimodal/webm.py — reuse it for the header-triad dispatch
        from danae_spark.multimodal.webm import parse_webm

        c = parse_webm(payload)
        if c is None:
            return None
        return {
            "format": c["doc_type"],
            "brand": None,
            "timescale": None,  # EBML scale is ns-based, not mvhd ticks
            "duration_ms": c["duration_ms"],
            "n_tracks": c["n_tracks"],
            "width": c["width"],
            "height": c["height"],
        }

    brand = timescale = duration = width = height = None
    n_tracks = 0
    seen = False
    for btype, body in boxes(payload):
        if btype == b"ftyp" and len(body) >= 4:
            seen = True
            brand = body[:4].decode("ascii", "replace").strip()
        elif btype == b"moov":
            seen = True
            for ctype, cbody in boxes(body):
                if ctype == b"mvhd" and len(cbody) >= 20:
                    ver = cbody[0]
                    if ver == 1 and len(cbody) >= 32:
                        timescale = int.from_bytes(cbody[20:24], "big")
                        duration = int.from_bytes(cbody[24:32], "big")
                    else:
                        timescale = int.from_bytes(cbody[12:16], "big")
                        duration = int.from_bytes(cbody[16:20], "big")
                elif ctype == b"trak":
                    n_tracks += 1
                    for ttype, tbody in boxes(cbody):
                        if ttype == b"tkhd" and len(tbody) >= 84:
                            w = int.from_bytes(tbody[-8:-4], "big") // 65536
                            h = int.from_bytes(tbody[-4:], "big") // 65536
                            if w and h and width is None:
                                width, height = w, h
    if not seen:
        return None
    duration_ms = (
        duration * 1000 // timescale if timescale and duration is not None else None
    )
    return {
        "format": "mp4",
        "brand": brand,
        "timescale": timescale,
        "duration_ms": duration_ms,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
    }


VIDEO_META_SCHEMA = (
    "doc_id bigint, byte_size int, sha256 string, format string, brand string, "
    "timescale int, duration_ms bigint, n_tracks int, width int, height int"
)


def _video_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["format", "brand", "timescale", "duration_ms", "n_tracks", "width", "height"]
    for pdf in batches:
        rows = []
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            hdr = parse_video_header(p) or {}
            rows.append(
                {
                    "doc_id": doc_id,
                    "byte_size": len(p),
                    "sha256": hashlib.sha256(p).hexdigest(),
                    **{c: hdr.get(c) for c in cols},
                }
            )
        yield pd.DataFrame(rows)


def video_meta_frame(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Video container metadata over ANY (id, binary payload) frame —
    the audio_meta_frame plumbing with the MP4 box walker."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(_video_meta_batches, schema=VIDEO_META_SCHEMA)


def synth_mp4(
    brand: str, timescale: int, duration: int, n_tracks: int, width: int, height: int
) -> bytes:
    """Deterministic minimal-but-spec-shaped MP4: full-size v0 mvhd
    (100-byte body) and tkhd (84-byte body) so the parser's offsets are
    exercised exactly as on real files."""

    def box(btype: bytes, body: bytes) -> bytes:
        return (8 + len(body)).to_bytes(4, "big") + btype + body

    ftyp = box(b"ftyp", brand.encode("ascii") + (0).to_bytes(4, "big") + b"isom")
    mvhd_body = (
        b"\x00\x00\x00\x00"  # v0 + flags
        + (0).to_bytes(4, "big") * 2  # creation/modification
        + timescale.to_bytes(4, "big")
        + duration.to_bytes(4, "big")
        + (0x00010000).to_bytes(4, "big")  # rate 1.0
        + b"\x01\x00" + b"\x00" * 10  # volume + reserved
        + b"\x00" * 36  # matrix
        + b"\x00" * 24  # pre_defined
        + (n_tracks + 1).to_bytes(4, "big")  # next_track_id
    )
    tkhd_body = (
        b"\x00\x00\x00\x07"  # v0 + enabled flags
        + (0).to_bytes(4, "big") * 2
        + (1).to_bytes(4, "big")  # track id
        + (0).to_bytes(4, "big")
        + duration.to_bytes(4, "big")
        + b"\x00" * 8
        + b"\x00" * 8  # layer/alt-group/volume/reserved
        + b"\x00" * 36  # matrix
        + (width * 65536).to_bytes(4, "big")
        + (height * 65536).to_bytes(4, "big")
    )
    trak = box(b"trak", box(b"tkhd", tkhd_body))
    moov = box(b"moov", box(b"mvhd", mvhd_body) + trak * n_tracks)
    return ftyp + moov


def video_meta_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable video-metadata round-trip (the
    audio_meta_roundtrip pattern): per document an MP4 payload with
    doc_id-derived parameters is synthesized byte-for-byte (synth_mp4)
    and pushed through the REAL box walker (parse_video_header); the
    DuckDB oracle states the expected metadata as doc_id arithmetic."""
    from danae_spark.catalog import load_table
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                brand = "isom" if d % 2 == 0 else "mp42"
                timescale = 600 * (1 + d % 5)
                duration = timescale * (1 + d % 30) // 2
                n_tracks = 1 + d % 3
                width, height = 320 * (1 + d % 4), 240 * (1 + d % 4)
                payload = synth_mp4(brand, timescale, duration, n_tracks, width, height)
                hdr = parse_video_header(payload) or {}
                rows.append(
                    {
                        "doc_id": doc_id,
                        "byte_size": len(payload),
                        "brand": hdr.get("brand"),
                        "timescale": hdr.get("timescale"),
                        "duration_ms": hdr.get("duration_ms"),
                        "n_tracks": hdr.get("n_tracks"),
                        "width": hdr.get("width"),
                        "height": hdr.get("height"),
                    }
                )
            yield pd.DataFrame(rows)

    schema = (
        "doc_id bigint, byte_size int, brand string, timescale int,"
        " duration_ms bigint, n_tracks int, width int, height int"
    )
    return docs.mapInPandas(batches, schema=schema).orderBy("doc_id")


VIDEO_ROUNDTRIP_ORACLE = """
    SELECT doc_id,
           CAST(20 + 8 + 108 + 100 * (1 + doc_id % 3) AS INT) AS byte_size,
           CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
           CAST(600 * (1 + doc_id % 5) AS INT) AS timescale,
           CAST((600 * (1 + doc_id % 5) * (1 + doc_id % 30) // 2) * 1000
                // (600 * (1 + doc_id % 5)) AS BIGINT) AS duration_ms,
           CAST(1 + doc_id % 3 AS INT) AS n_tracks,
           CAST(320 * (1 + doc_id % 4) AS INT) AS width,
           CAST(240 * (1 + doc_id % 4) AS INT) AS height
    FROM documents ORDER BY doc_id
    """
