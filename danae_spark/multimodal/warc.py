"""WARC (Web ARChive, ISO 28500) record walk — the container format
web crawls actually ship in (Common Crawl, Internet Archive).

A 100 TB training corpus starts life as WARC files: gzip-member-per-
record streams of warcinfo / request / response / resource records.
This module walks them for real:

  - Record grammar: `WARC/1.0|1.1` version line, `Name: value` header
    fields (CRLF line ends; obsolete LWS header folding is a declared
    reject — RFC 7230 deprecates it and crawlers don't emit it), a
    blank line, exactly Content-Length block bytes, then the CRLF CRLF
    record terminator. Mandatory headers (WARC-Type, WARC-Record-ID,
    WARC-Date, Content-Length) are enforced; WARC-Record-ID must be a
    `<uri>` bracket pair; WARC-Date must be the spec's
    YYYY-MM-DDTHH:MM:SSZ UTC-seconds form; Content-Length must match
    the bytes actually present before the terminator.
  - Compression: the `.warc.gz` convention — EACH RECORD ITS OWN GZIP
    MEMBER (the property that makes WARC splittable on a cluster:
    workers can seek to any member boundary and start reading). The
    walk inflates members with zlib (wbits=31) and validates the
    one-record-per-member alignment; a truncated member or trailing
    garbage rejects the file. Plain uncompressed WARC is the other
    accepted form.
  - Record types: the eight ISO 28500 types (warcinfo, request,
    response, resource, metadata, revisit, conversion, continuation);
    anything else rejects the file whole.
  - HTTP payload: response records carry an HTTP/1.x message; the
    status line is parsed (3-digit status), headers split at the first
    blank line, Content-Type captured, and the body DECODED before it
    is exposed — the bytes the HTML extractor consumes. Real Common
    Crawl responses routinely arrive `Transfer-Encoding: chunked`
    and/or `Content-Encoding: gzip`; passing those through raw would
    leak hex chunk-size tokens (or compressed bytes) silently into
    harvested training text. The walk therefore:
      * de-chunks `Transfer-Encoding: chunked` (RFC 7230 §4.1 framing:
        hex size [;ext] CRLF data CRLF ... 0-chunk, optional trailer
        fields, final CRLF) — malformed framing rejects the file;
      * inflates `Content-Encoding: gzip`/`x-gzip` (zlib wbits=31)
        and `deflate` (zlib stream, raw-deflate fallback — both forms
        occur in the wild) — corrupt streams reject the file;
      * rejects unknown codings whole (br, zstd, compress — decoders
        aren't available here, and half-decoded text must never ship).

Reject-whole (return None): bad version line, malformed or folded
header, missing mandatory header, bad record id / date / length
syntax, Content-Length mismatch, missing terminator, unknown record
type, malformed HTTP status line / chunk framing / content coding in
a response, gzip member truncation or member/record misalignment — a
WARC that cannot be walked deterministically must not contribute
half-parsed pages.

Reference parity note: the reference (smartdatalake/danae) has no
crawl ingestion; WARC is mandated LLM-pipeline extension surface (the
source format feeding html_text_extract and the curation stack).
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd

__all__ = [
    "parse_warc",
    "iter_warc_responses",
    "iter_wet_texts",
    "wet_texts",
    "iter_wat_pages",
    "wat_pages",
    "content_type_charset",
    "synth_warc",
    "synth_wet",
    "synth_wat",
    "synth_charset_warc",
    "warc_census_frame",
    "warc_census_roundtrip",
    "WARC_CENSUS_ORACLE",
    "WET_TEXT_ORACLE",
    "WAT_CENSUS_ORACLE",
    "CRAWL_CHARSET_ORACLE",
]

_TYPES = frozenset(
    "warcinfo request response resource metadata revisit conversion continuation".split()
)
_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$")
_NAME_OK = re.compile(r"^[!#$%&'*+\-.^_`|~0-9A-Za-z]+$")  # RFC 7230 token


def _split_members(payload: bytes) -> list[bytes] | None:
    """Inflate a multi-member gzip stream into per-member chunks;
    None on truncation or trailing garbage."""
    out: list[bytes] = []
    data = payload
    while data:
        d = zlib.decompressobj(31)
        try:
            chunk = d.decompress(data)
        except zlib.error:
            return None
        if not d.eof:
            return None  # truncated member
        out.append(chunk)
        data = d.unused_data
    return out


def _parse_record(buf: bytes, pos: int) -> tuple[dict, int] | None:
    """Parse one record at `pos`; returns (record, next_pos) or None."""
    eol = buf.find(b"\r\n", pos)
    if eol == -1:
        return None
    version = buf[pos:eol]
    if version not in (b"WARC/1.0", b"WARC/1.1"):
        return None
    pos = eol + 2
    headers: dict[str, str] = {}
    while True:
        eol = buf.find(b"\r\n", pos)
        if eol == -1:
            return None
        line = buf[pos:eol]
        pos = eol + 2
        if line == b"":
            break
        if line[:1] in (b" ", b"\t"):
            return None  # obsolete header folding: declared reject
        colon = line.find(b":")
        if colon <= 0:
            return None
        try:
            name = line[:colon].decode("ascii")
            value = line[colon + 1 :].decode("utf-8").strip()
        except UnicodeDecodeError:
            return None
        if not _NAME_OK.match(name):
            return None
        headers[name.lower()] = value

    rtype = headers.get("warc-type")
    rid = headers.get("warc-record-id")
    rdate = headers.get("warc-date")
    clen = headers.get("content-length")
    if rtype is None or rid is None or rdate is None or clen is None:
        return None
    if rtype not in _TYPES:
        return None
    if not (rid.startswith("<") and rid.endswith(">") and ":" in rid[1:-1]):
        return None
    if not _DATE_RE.match(rdate):
        return None
    if not clen.isdigit():
        return None
    length = int(clen)
    body = buf[pos : pos + length]
    if len(body) != length:
        return None
    pos += length
    if buf[pos : pos + 4] != b"\r\n\r\n":
        return None
    return {
        "type": rtype,
        "headers": headers,
        "body": body,
        "uri": headers.get("warc-target-uri"),
    }, pos + 4


def _dechunk(body: bytes) -> bytes | None:
    """Decode RFC 7230 §4.1 chunked framing; None on any malformation
    (bad hex size, missing CRLF after a chunk, truncation, garbage
    trailers). Chunk extensions (";name=val") are tolerated; trailer
    fields after the 0-chunk must look like headers."""
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol == -1:
            return None
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        if not size_tok or any(c not in b"0123456789abcdefABCDEF" for c in size_tok):
            return None
        size = int(size_tok, 16)
        pos = eol + 2
        if size == 0:
            break
        chunk = body[pos : pos + size]
        if len(chunk) != size:
            return None
        out += chunk
        if body[pos + size : pos + size + 2] != b"\r\n":
            return None
        pos += size + 2
    # zero or more trailer fields, then the final CRLF
    while True:
        eol = body.find(b"\r\n", pos)
        if eol == -1:
            return None
        line = body[pos:eol]
        pos = eol + 2
        if line == b"":
            break
        if line.find(b":") <= 0:
            return None
    if pos != len(body):
        return None  # bytes after the terminator: framing lied
    return bytes(out)


def _content_decode(body: bytes, coding: str) -> bytes | None:
    """Apply one Content-Encoding coding; None when undecodable or the
    coding is unknown (compress — reject, never pass raw). `br`
    decodes through the FULL RFC 7932 decoder (brotlicodec.py, r15 —
    prefix codes, context modeling, static dictionary + transforms;
    stored-mode streams are a subset) and `zstd` through the RFC 8878
    frame decoder; undecodable bodies keep the reject-whole contract.
    Brotli output is budget-capped per body (decompression-bomb
    guard): over-budget rejects whole, a visible census count."""
    if coding in ("identity", ""):
        return body
    if coding == "br":
        from danae_spark.multimodal.brotlicodec import brotli_decode

        return brotli_decode(body, max_out=64 * 1024 * 1024)
    if coding == "zstd":
        from danae_spark.multimodal.zstdcodec import zstd_decode

        return zstd_decode(body, max_out=64 * 1024 * 1024)
    if coding in ("gzip", "x-gzip"):
        d = zlib.decompressobj(31)
        try:
            out = d.decompress(body)
        except zlib.error:
            return None
        return out if d.eof and not d.unused_data else None
    if coding == "deflate":
        for wbits in (15, -15):  # zlib-wrapped, then the bare-deflate servers emit
            d = zlib.decompressobj(wbits)
            try:
                out = d.decompress(body)
            except zlib.error:
                continue
            if d.eof and not d.unused_data:
                return out
        return None
    return None


def _parse_http_response(body: bytes) -> dict | None:
    eol = body.find(b"\r\n")
    if eol == -1:
        return None
    parts = body[:eol].split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/1."):
        return None
    if len(parts[1]) != 3 or not parts[1].isdigit():
        return None
    status = int(parts[1])
    sep = body.find(b"\r\n\r\n", eol)
    if sep == -1:
        return None
    ctype = None
    tenc = None
    cenc = None
    for line in body[eol + 2 : sep].split(b"\r\n"):
        colon = line.find(b":")
        if colon <= 0:
            return None
        name = line[:colon].strip().lower()
        if name == b"content-type":
            ctype = line[colon + 1 :].strip().decode("latin-1")
        elif name == b"transfer-encoding":
            tenc = line[colon + 1 :].strip().decode("latin-1").lower()
        elif name == b"content-encoding":
            cenc = line[colon + 1 :].strip().decode("latin-1").lower()
    payload = body[sep + 4 :]
    if tenc is not None:
        codings = [c.strip() for c in tenc.split(",") if c.strip()]
        if any(c not in ("identity", "chunked") for c in codings):
            return None  # gzip-as-transfer-coding etc.: no decoder here
        if "chunked" in codings:
            # "chunked" must be the final (outermost) coding (RFC 7230)
            if codings[-1] != "chunked":
                return None
            payload = _dechunk(payload)
            if payload is None:
                return None
        # a bare "identity" transfer coding is a no-op
    if cenc is not None:
        # apply codings outermost-last -> decode right-to-left
        for coding in reversed([c.strip() for c in cenc.split(",")]):
            payload = _content_decode(payload, coding)
            if payload is None:
                return None
    return {"status": status, "content_type": ctype, "body": payload}


def content_type_charset(ctype: str | None) -> str | None:
    """The `charset=` parameter of an HTTP Content-Type value (RFC
    9110 media-type parameters; quotes stripped, lowercased). Per
    WHATWG, this transport-layer declaration OUTRANKS any in-document
    <meta charset> — the HTML decoder honors that precedence."""
    if not ctype:
        return None
    for part in ctype.split(";")[1:]:
        k, _, v = part.partition("=")
        if k.strip().lower() == "charset":
            v = v.strip().strip('"').strip("'").lower()
            return v or None
    return None


def _records(payload: bytes) -> list[dict] | None:
    """Walk a WARC payload (plain or .warc.gz) into validated records;
    None on any structural violation."""
    if payload[:2] == b"\x1f\x8b":
        members = _split_members(payload)
        if members is None or not members:
            return None
        records = []
        for m in members:
            got = _parse_record(m, 0)
            if got is None or got[1] != len(m):
                return None  # member/record misalignment
            records.append(got[0])
        return records
    records = []
    pos = 0
    while pos < len(payload):
        got = _parse_record(payload, pos)
        if got is None:
            return None
        records.append(got[0])
        pos = got[1]
    return records or None


def parse_warc(payload: bytes) -> dict | None:
    """Census a WARC file into one row: compression, record counts by
    type, HTTP response stats, and the first target URI/host."""
    records = _records(payload)
    if records is None:
        return None
    n_by = {t: 0 for t in ("warcinfo", "request", "response", "resource")}
    n_other = 0
    n_http_ok = 0
    total_content = 0
    first_uri = None
    for r in records:
        total_content += len(r["body"])
        if r["type"] in n_by:
            n_by[r["type"]] += 1
        else:
            n_other += 1
        if r["uri"] and first_uri is None:
            first_uri = r["uri"]
        if r["type"] == "response":
            http = _parse_http_response(r["body"])
            if http is None:
                return None
            if 200 <= http["status"] < 300:
                n_http_ok += 1
    host = None
    if first_uri and "://" in first_uri:
        host = first_uri.split("://", 1)[1].split("/", 1)[0]
    return {
        "is_gzip": payload[:2] == b"\x1f\x8b",
        "n_records": len(records),
        "n_warcinfo": n_by["warcinfo"],
        "n_request": n_by["request"],
        "n_response": n_by["response"],
        "n_resource": n_by["resource"] + n_other,
        "n_http_ok": n_http_ok,
        "total_content_bytes": total_content,
        "first_uri": first_uri,
        "host": host,
    }


def iter_warc_responses(payload: bytes):
    """Yield (uri, status, content_type, body) for each response record
    of a valid WARC; yields nothing for invalid files (callers treat
    that as reject-whole via parse_warc)."""
    records = _records(payload)
    if records is None:
        return
    for r in records:
        if r["type"] != "response":
            continue
        http = _parse_http_response(r["body"])
        if http is None:
            return
        yield r["uri"], http["status"], http["content_type"], http["body"]


def _wet_conversions(payload: bytes) -> list[dict] | None:
    """Validation pass for a WET file: walk the records and CHECK that
    every conversion block is valid UTF-8 (one decoded string alive at
    a time, discarded immediately), returning the raw conversion
    records — reject-whole without materializing all the decoded text.
    A multi-hundred-MB WET file costs one extra decode pass, not 2x
    peak memory."""
    records = _records(payload)
    if records is None:
        return None
    convs = [r for r in records if r["type"] == "conversion"]
    for r in convs:
        try:
            r["body"].decode("utf-8")
        except UnicodeDecodeError:
            return None
    return convs


def wet_texts(payload: bytes) -> list[tuple[str, str]] | None:
    """All (uri, text) pairs of a valid WET file, or None — the WET
    convention (Common Crawl's pre-extracted-text sidecar files: each
    CONVERSION record's block is the plain UTF-8 text of one page, no
    HTTP envelope). Every conversion record is validated BEFORE any is
    returned, so a file with one non-UTF-8 conversion block rejects
    WHOLE — no partial text ever ships (the same contract the response
    walk enforces via parse_warc). Materializes every page's text;
    streaming callers should use iter_wet_texts, which validates up
    front but decodes lazily (one page's text in memory at a time)."""
    convs = _wet_conversions(payload)
    if convs is None:
        return None
    return [(r["uri"], r["body"].decode("utf-8")) for r in convs]


def iter_wet_texts(payload: bytes):
    """Yield (uri, text) for each conversion record of a valid WET
    file; yields NOTHING (not a prefix) when any record is malformed —
    the cheap UTF-8 validation pass runs up front (_wet_conversions),
    then each page's text decodes lazily at yield time, so peak memory
    is the raw records plus ONE decoded page."""
    convs = _wet_conversions(payload)
    if convs is None:
        return
    for r in convs:
        yield r["uri"], r["body"].decode("utf-8")


# --------------------------------------------- revisit records (r12)

# the two WARC-Profile values revisit records legally carry (ISO
# 28500 / WARC 1.1 §6.7.2); Common Crawl uses identical-payload-digest
# for its URL-level dedup
_REVISIT_PROFILES = frozenset(
    {
        "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest",
        "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
        "http://netpreserve.org/warc/1.0/revisit/server-not-modified",
        "http://netpreserve.org/warc/1.1/revisit/server-not-modified",
    }
)


def warc_captures(payload: bytes) -> list[tuple] | None:
    """One validated walk of a crawl's RESPONSE + REVISIT records with
    every revisit RESOLVED to its original response (WARC-Refers-To ->
    record id -> original's target URI): returns
    [(kind, uri, http_or_None, original_uri_or_None)], or None.
    Validation is up-front and reject-whole: an unparseable HTTP
    envelope, a revisit with an unknown WARC-Profile or a missing /
    DANGLING WARC-Refers-To rejects the file — no partial walk ships.
    The point of the revisit shape: the original's payload is already
    extracted, so a curation pipeline records a dup edge instead of
    re-extracting the unchanged capture."""
    records = _records(payload)
    if records is None:
        return None
    by_id: dict[str, str] = {}
    caps: list[tuple] = []
    for r in records:
        h = r["headers"]
        if r["type"] == "response":
            http = _parse_http_response(r["body"])
            if http is None:
                return None
            by_id[h.get("warc-record-id")] = r["uri"]
            caps.append(("response", r["uri"], http, None))
        elif r["type"] == "revisit":
            prof = h.get("warc-profile")
            refers = h.get("warc-refers-to")
            if prof not in _REVISIT_PROFILES or refers is None:
                return None
            caps.append(
                ("revisit", r["uri"], refers, h.get("warc-refers-to-target-uri"))
            )
    out: list[tuple] = []
    for kind, uri, a, b in caps:
        if kind == "revisit":
            # in-file resolution by record id first; Common Crawl
            # revisits may refer to a record in ANOTHER file — then the
            # WARC-Refers-To-Target-URI names the original
            orig = by_id.get(a) or b
            if orig is None:
                return None  # unresolvable original
            out.append((kind, uri, None, orig))
        else:
            out.append((kind, uri, a, None))
    return out


# ------------------------------------------------------------- synthesis


def n_pages(d: int) -> int:
    return 1 + d % 3


def page_status(d: int, p: int) -> int:
    return 301 if (d + p) % 5 == 4 else 200


def _gzip_member(raw: bytes) -> bytes:
    c = zlib.compressobj(6, zlib.DEFLATED, 31)
    return c.compress(raw) + c.flush()


def _record(rtype: str, rid: int, body: bytes, extra: dict | None = None) -> bytes:
    headers = [
        ("WARC-Type", rtype),
        ("WARC-Record-ID", f"<urn:uuid:00000000-0000-4000-8000-{rid:012d}>"),
        ("WARC-Date", "2026-08-15T00:00:00Z"),
    ]
    for k, v in (extra or {}).items():
        headers.append((k, v))
    headers.append(("Content-Length", str(len(body))))
    head = "WARC/1.1\r\n" + "".join(f"{k}: {v}\r\n" for k, v in headers) + "\r\n"
    return head.encode("utf-8") + body + b"\r\n\r\n"


def wire_encoding(d: int, p: int) -> int:
    """Which wire encoding a 200 page ships with: 0 identity,
    1 chunked, 2 Content-Encoding: gzip, 3 gzip inside chunked —
    the combinations real Common Crawl responses actually use."""
    return (d + p) % 4


def chunk_body(data: bytes, size: int = 512) -> bytes:
    """RFC 7230 §4.1 chunked framing (with a chunk extension on the
    first chunk, which de-chunkers must tolerate)."""
    out = bytearray()
    for i in range(0, len(data), size):
        piece = data[i : i + size]
        ext = b";synth=1" if i == 0 else b""
        out += f"{len(piece):x}".encode() + ext + b"\r\n" + piece + b"\r\n"
    out += b"0\r\n\r\n"
    return bytes(out)


def gzip_body(data: bytes) -> bytes:
    c = zlib.compressobj(6, zlib.DEFLATED, 31)
    return c.compress(data) + c.flush()


def encode_200_response(html: bytes, enc: int) -> bytes:
    """Build the full HTTP/1.1 200 wire message for one synth page
    under wire encoding `enc` (see wire_encoding)."""
    head = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\nServer: synth\r\n"
    body = html
    if enc in (2, 3):
        body = gzip_body(body)
        head += b"Content-Encoding: gzip\r\n"
    if enc in (1, 3):
        body = chunk_body(body)
        head += b"Transfer-Encoding: chunked\r\n"
    return head + b"\r\n" + body


def synth_warc(doc_id: int) -> bytes:
    """Doc-deterministic WARC: one warcinfo + n_pages request/response
    pairs whose response bodies are REAL HTML pages (synth_html at
    e = doc_id*4 + p); gzip member-per-record on odd docs, plain on
    even. Page p gets HTTP 301 (empty body, no html) when
    (doc_id + p) % 5 == 4, else 200 with the page — shipped identity /
    chunked / gzipped / gzip-in-chunked by (d+p)%4 so the decode path
    is on every oracle run."""
    from danae_spark.multimodal.htmltext import synth_html

    d = doc_id
    host = f"site{d % 5}.example"
    recs: list[bytes] = []
    info = b"software: danae-spark/1.0\r\nformat: WARC File Format 1.1\r\n"
    recs.append(_record("warcinfo", d * 100, info, {"Content-Type": "application/warc-fields"}))
    for p in range(n_pages(d)):
        uri = f"http://{host}/p{p}"
        req = f"GET /p{p} HTTP/1.1\r\nHost: {host}\r\n\r\n".encode()
        recs.append(
            _record(
                "request",
                d * 100 + 2 * p + 1,
                req,
                {"WARC-Target-URI": uri, "Content-Type": "application/http;msgtype=request"},
            )
        )
        status = page_status(d, p)
        if status == 200:
            html = synth_html(d * 4 + p)
            resp = encode_200_response(html, wire_encoding(d, p))
        else:
            resp = (
                f"HTTP/1.1 {status} Moved Permanently\r\n"
                f"Location: http://{host}/p{p}v2\r\n"
                f"Content-Type: text/plain\r\n\r\nmoved\r\n"
            ).encode()
        recs.append(
            _record(
                "response",
                d * 100 + 2 * p + 2,
                resp,
                {"WARC-Target-URI": uri, "Content-Type": "application/http;msgtype=response"},
            )
        )
    if d % 2 == 1:
        return b"".join(_gzip_member(r) for r in recs)
    return b"".join(recs)


# ----------------------------------------------------- Spark entry points

_COLS = [
    "is_gzip",
    "n_records",
    "n_warcinfo",
    "n_request",
    "n_response",
    "n_resource",
    "n_http_ok",
    "total_content_bytes",
    "first_uri",
    "host",
]

_SCHEMA = (
    "doc_id bigint, is_gzip boolean, n_records int, n_warcinfo int, "
    "n_request int, n_response int, n_resource int, n_http_ok int, "
    "total_content_bytes bigint, first_uri string, host string"
)


def warc_census_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """WARC census over any (id, binary) frame; nulls for files that
    cannot be walked."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                c = parse_warc(bytes(payload)) if payload is not None else None
                row = {id_col: rid}
                row.update({k: (c.get(k) if c else None) for k in _COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=[id_col] + _COLS)

    return df.mapInPandas(batches, schema=_SCHEMA.replace("doc_id", id_col, 1))


def warc_census_roundtrip(spark, sf_dir: str):
    """Oracle-checkable WARC walk: per doc a real warcinfo + request/
    response stream is synthesized (gzip member-per-record on odd
    docs — the inflate path and the member-alignment check are both on
    the certified path), walked by the real validator, and the census
    restated as doc_id arithmetic. total_content_bytes is excluded
    from the SQL restatement (it would require restating raw HTML byte
    lengths); it is pinned against the synthesizer by pytest instead."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    cols = [c for c in _COLS if c != "total_content_bytes"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                c = parse_warc(synth_warc(d))
                row = {"doc_id": d}
                row.update({k: (c.get(k) if c else None) for k in cols})
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + cols)

    schema = (
        "doc_id bigint, is_gzip boolean, n_records int, n_warcinfo int, "
        "n_request int, n_response int, n_resource int, n_http_ok int, "
        "first_uri string, host string"
    )
    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=schema)
        .orderBy("doc_id")
    )


WARC_CENSUS_ORACLE = """
WITH g AS (
  SELECT doc_id, CAST(1 + doc_id % 3 AS INT) AS n_pages,
         'site' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS host
  FROM documents
),
ok AS (
  SELECT g.doc_id,
         CAST(count(*) FILTER (WHERE (g.doc_id + p.p) % 5 <> 4) AS INT) AS n_ok
  FROM g, generate_series(0, 2) p(p)
  WHERE p.p < g.n_pages
  GROUP BY g.doc_id
)
SELECT g.doc_id,
       doc_id % 2 = 1 AS is_gzip,
       CAST(1 + 2 * g.n_pages AS INT) AS n_records,
       CAST(1 AS INT) AS n_warcinfo,
       g.n_pages AS n_request,
       g.n_pages AS n_response,
       CAST(0 AS INT) AS n_resource,
       ok.n_ok AS n_http_ok,
       'http://' || g.host || '/p0' AS first_uri,
       g.host AS host
FROM g JOIN ok USING (doc_id)
ORDER BY g.doc_id
"""


# ------------------------------------------- crawl pipeline composition


def crawl_html_extract_roundtrip(spark, sf_dir: str):
    """The end-to-end crawl ingestion path, oracle-certified as a
    COMPOSITION: WARC walk -> per-response HTTP parse -> route only
    200 text/html payloads into the HTML extractor -> one row per
    page with the extracted title/text stats (nulls for the non-HTML
    redirect pages, certifying the routing itself). The SQL restates
    the same extraction arithmetic as HTML_TEXT_ORACLE via the shared
    html_text_sql fragment at e = doc_id*4 + p."""
    from danae_spark.catalog import load_table
    from danae_spark.multimodal.htmltext import parse_html_text
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                for uri, status, ctype, body in iter_warc_responses(synth_warc(d)):
                    row = {
                        "doc_id": d,
                        "uri": uri,
                        "status": status,
                        "title": None,
                        "n_chars": None,
                        "n_words": None,
                        "link_density": None,
                    }
                    if status == 200 and (ctype or "").startswith("text/html"):
                        ext = parse_html_text(body, content_type_charset(ctype))
                        if ext is not None:
                            row.update(
                                {
                                    "title": ext["title"],
                                    "n_chars": ext["n_chars"],
                                    "n_words": ext["n_words"],
                                    "link_density": ext["link_density"],
                                }
                            )
                    rows.append(row)
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "uri",
                    "status",
                    "title",
                    "n_chars",
                    "n_words",
                    "link_density",
                ],
            )

    schema = (
        "doc_id bigint, uri string, status int, title string, "
        "n_chars int, n_words int, link_density double"
    )
    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=schema)
        .orderBy("doc_id", "uri")
    )


def _crawl_oracle() -> str:
    from danae_spark.multimodal.htmltext import html_text_sql

    ok_pages = """
SELECT d.doc_id, d.doc_id * 4 + p.p AS e
FROM documents d, generate_series(0, 2) p(p)
WHERE p.p < 1 + d.doc_id % 3 AND (d.doc_id + p.p) % 5 <> 4
"""
    return f"""
WITH allp AS (
  SELECT d.doc_id, p.p,
         'http://site' || CAST(d.doc_id % 5 AS VARCHAR) || '.example/p'
           || CAST(p.p AS VARCHAR) AS uri,
         CASE WHEN (d.doc_id + p.p) % 5 = 4 THEN 301 ELSE 200 END AS status,
         d.doc_id * 4 + p.p AS e
  FROM documents d, generate_series(0, 2) p(p)
  WHERE p.p < 1 + d.doc_id % 3
),
x AS ({html_text_sql(ok_pages)})
SELECT allp.doc_id, allp.uri, CAST(allp.status AS INT) AS status,
       x.title, x.n_chars, x.n_words, x.link_density
FROM allp LEFT JOIN x ON allp.doc_id = x.doc_id AND allp.e = x.e
ORDER BY allp.doc_id, allp.uri
"""


CRAWL_HTML_ORACLE = _crawl_oracle()


# ----------------------------------------------------------- WET sidecars


def synth_wet(doc_id: int) -> bytes:
    """The WET sidecar of synth_warc(doc_id): one warcinfo + one
    CONVERSION record per HTTP-200 page, each block the page's
    extracted plain text (the same text html_text_sql restates, so the
    WET oracle shares the fragment). Gzip member-per-record on odd
    docs — the convention Common Crawl WET files actually use."""
    from danae_spark.multimodal.htmltext import expected_html_row

    d = doc_id
    host = f"site{d % 5}.example"
    recs: list[bytes] = []
    info = b"software: danae-spark/1.0\r\nformat: WARC File Format 1.1\r\n"
    recs.append(_record("warcinfo", d * 100, info, {"Content-Type": "application/warc-fields"}))
    for p in range(n_pages(d)):
        if page_status(d, p) != 200:
            continue
        text = expected_html_row(d * 4 + p)["text"]
        recs.append(
            _record(
                "conversion",
                d * 100 + p + 1,
                text.encode("utf-8"),
                {
                    "WARC-Target-URI": f"http://{host}/p{p}",
                    "Content-Type": "text/plain",
                },
            )
        )
    if d % 2 == 1:
        return b"".join(_gzip_member(r) for r in recs)
    return b"".join(recs)


def wet_text_extract_roundtrip(spark, sf_dir: str):
    """Oracle-checkable WET walk: per doc the WET sidecar of the crawl
    (conversion records holding pre-extracted page text) is walked by
    the same record validator as the WARC census, and every page's
    TEXT STRING restated via html_text_sql — the WET reading and the
    WARC->HTML extraction pipeline certify against the SAME fragment,
    so the two ingestion paths can never drift."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                for uri, text in iter_wet_texts(synth_wet(d)):
                    rows.append(
                        {
                            "doc_id": d,
                            "uri": uri,
                            "text": text,
                            "n_chars": len(text),
                            "n_words": len(text.split()),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "uri", "text", "n_chars", "n_words"]
            )

    schema = "doc_id bigint, uri string, text string, n_chars int, n_words int"
    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=schema)
        .orderBy("doc_id", "uri")
    )


def _wet_oracle() -> str:
    from danae_spark.multimodal.htmltext import html_text_sql

    ok_pages = """
SELECT d.doc_id, d.doc_id * 4 + p.p AS e
FROM documents d, generate_series(0, 2) p(p)
WHERE p.p < 1 + d.doc_id % 3 AND (d.doc_id + p.p) % 5 <> 4
"""
    return f"""
WITH x AS ({html_text_sql(ok_pages)})
SELECT doc_id,
       'http://site' || CAST(doc_id % 5 AS VARCHAR) || '.example/p'
         || CAST(e - doc_id * 4 AS VARCHAR) AS uri,
       text,
       CAST(length(text) AS INT) AS n_chars,
       CAST(length(text) - length(replace(replace(text, chr(10), ' '), ' ', ''))
            + 1 AS INT) AS n_words
FROM x ORDER BY doc_id, uri
"""


WET_TEXT_ORACLE = _wet_oracle()


# ----------------------------------------------------------- WAT sidecars


def wat_pages(payload: bytes) -> list[tuple] | None:
    """All (uri, title, links) triples of a valid WAT file, or None —
    the WAT convention (Common Crawl's metadata sidecar: each METADATA
    record's block is a JSON Envelope describing one page; links live
    at Envelope -> Payload-Metadata -> HTTP-Response-Metadata ->
    HTML-Metadata). Every metadata record is parsed and validated
    BEFORE any is returned, so a file with one malformed JSON block
    (or a missing Envelope root, or a non-list Links) rejects WHOLE —
    no partial metadata ever ships. Records for non-HTML pages (no
    HTML-Metadata — redirects) contribute (uri, None, []).

    Memory: validation for WAT IS the JSON parse, so the up-front pass
    cannot be made cheaper than parsing; what this function retains is
    only the small (uri, title, link-urls) PROJECTION — each record's
    decoded envelope (the bulk of a real WAT file) is parsed and
    dropped one at a time, so peak memory is raw records + one parsed
    envelope + the projection, not 2x the decoded file."""
    import json as _json

    records = _records(payload)
    if records is None:
        return None
    out: list[tuple] = []
    for r in records:
        if r["type"] != "metadata":
            continue
        try:
            env = _json.loads(r["body"].decode("utf-8"))
        except (UnicodeDecodeError, ValueError):
            return None
        if not isinstance(env, dict) or not isinstance(env.get("Envelope"), dict):
            return None
        pm = env["Envelope"].get("Payload-Metadata")
        hm = (
            pm.get("HTTP-Response-Metadata", {}).get("HTML-Metadata")
            if isinstance(pm, dict)
            else None
        )
        if not isinstance(hm, dict):
            out.append((r["uri"], None, []))
            continue
        head = hm.get("Head")
        title = head.get("Title") if isinstance(head, dict) else None
        links = hm.get("Links", [])
        if not isinstance(links, list) or not all(
            isinstance(l, dict) and "url" in l for l in links
        ):
            return None
        out.append(
            (r["uri"], title if isinstance(title, str) else None,
             [str(l["url"]) for l in links])
        )
    return out


def iter_wat_pages(payload: bytes):
    """Yield (uri, title, links) for each metadata record of a valid
    WAT file; yields NOTHING (not a prefix) when any record is
    malformed — validation happens up front in wat_pages()."""
    got = wat_pages(payload)
    if got is None:
        return
    yield from got


def synth_wat(doc_id: int) -> bytes:
    """The WAT sidecar of synth_warc(doc_id): one warcinfo + one
    METADATA record per HTTP-200 page, each block the JSON Envelope
    describing that page — title and link list derived from the SAME
    arithmetic as synth_html (3 nav links + one inline anchor per even
    paragraph), so the WAT oracle's n_links restates the html_text_sql
    formula. Gzip member-per-record on odd docs. 301 pages get a
    metadata record WITHOUT HTML-Metadata (the non-HTML shape)."""
    import json as _json

    from danae_spark.multimodal.htmltext import _n_paras

    d = doc_id
    host = f"site{d % 5}.example"
    recs: list[bytes] = []
    info = b"software: danae-spark/1.0\r\nformat: WARC File Format 1.1\r\n"
    recs.append(_record("warcinfo", d * 100, info, {"Content-Type": "application/warc-fields"}))
    for p in range(n_pages(d)):
        uri = f"http://{host}/p{p}"
        if page_status(d, p) == 200:
            e = d * 4 + p
            links = ["/", "/about?x=1&y=2", f"/p{e}"]
            links += [f"/p{e}/{i}" for i in range(_n_paras(e)) if i % 2 == 0]
            env = {
                "Envelope": {
                    "WARC-Header-Metadata": {"WARC-Target-URI": uri},
                    "Payload-Metadata": {
                        "HTTP-Response-Metadata": {
                            "HTML-Metadata": {
                                "Head": {"Title": f"Doc {e} t{e % 10}"},
                                "Links": [
                                    {"path": "A@/href", "url": u} for u in links
                                ],
                            }
                        }
                    },
                },
                "Container": {"Offset": str(p)},
            }
        else:
            env = {
                "Envelope": {
                    "WARC-Header-Metadata": {"WARC-Target-URI": uri},
                    "Payload-Metadata": {"HTTP-Response-Metadata": {}},
                },
                "Container": {"Offset": str(p)},
            }
        recs.append(
            _record(
                "metadata",
                d * 100 + p + 1,
                _json.dumps(env, sort_keys=True).encode("utf-8"),
                {"WARC-Target-URI": uri, "Content-Type": "application/json"},
            )
        )
    if d % 2 == 1:
        return b"".join(_gzip_member(r) for r in recs)
    return b"".join(recs)


def wat_census_roundtrip(spark, sf_dir: str):
    """Oracle-checkable WAT walk: per doc the WAT sidecar of the synth
    crawl (metadata records holding JSON Envelopes) is walked by the
    same record validator as the WARC census, and every page's title +
    link census restated as doc arithmetic — n_links restates the SAME
    3 + ceil(n_paras/2) formula html_text_sql uses, tying the metadata
    sidecar to the page extraction it describes."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                for uri, title, links in iter_wat_pages(synth_wat(d)):
                    rows.append(
                        {
                            "doc_id": d,
                            "uri": uri,
                            "title": title,
                            "n_links": len(links) if title is not None else None,
                            "first_link": links[0] if links else None,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "uri", "title", "n_links", "first_link"]
            )

    schema = "doc_id bigint, uri string, title string, n_links int, first_link string"
    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=schema)
        .orderBy("doc_id", "uri")
    )


WAT_CENSUS_ORACLE = """
WITH pages AS (
  SELECT d.doc_id, p.p, d.doc_id * 4 + p.p AS e,
         (d.doc_id + p.p) % 5 = 4 AS redirect
  FROM documents d, generate_series(0, 2) p(p)
  WHERE p.p < 1 + d.doc_id % 3
)
SELECT doc_id,
       'http://site' || CAST(doc_id % 5 AS VARCHAR) || '.example/p'
         || CAST(p AS VARCHAR) AS uri,
       CASE WHEN redirect THEN NULL
            ELSE 'Doc ' || CAST(e AS VARCHAR) || ' t' || CAST(e % 10 AS VARCHAR)
       END AS title,
       CASE WHEN redirect THEN NULL
            ELSE CAST(3 + (2 + e % 4 + 1) // 2 AS INT) END AS n_links,
       CASE WHEN redirect THEN NULL ELSE '/' END AS first_link
FROM pages
ORDER BY doc_id, uri
"""


# --------------------------------------------- charset-routing composition

# per-page charset fixtures: (meta tag or '', header Content-Type,
# encoding the bytes actually use, paragraph-text template over d,
# title marker — a script-specific char value-checked through the
# oracle). Pages 4-8 are the WHATWG non-Latin breadth (declared CJK /
# Cyrillic / Central European, r12); page 9 is UNDECLARED EUC-JP —
# bytes that cp1252 CAN 'decode' — and must REJECT through the
# fallback mojibake gate (htmltext._fallback_gibberish), never ship.
_CHARSET_PAGES = [
    # UTF-8 with meta and header both declaring it — the common case
    ('<meta charset="utf-8">', "text/html; charset=utf-8", "utf-8",
     "café w{a} résumé", ""),
    # header-declared legacy, NO meta — only the transport layer knows
    ("", "text/html; charset=iso-8859-1", "windows-1252",
     "crème w{b} café", ""),
    # NO declaration anywhere: the guarded WHATWG windows-1252 fallback
    ("", "text/html", "windows-1252",
     "naïve k{a} déjà", ""),
    # header says windows-1252, meta LIES utf-8: header must win (the
    # bytes are 1252; honoring the meta would reject on bad utf-8)
    ('<meta charset="utf-8">', "text/html; charset=windows-1252",
     "windows-1252", "déjà vu x{c}", ""),
    # meta-declared Shift_JIS (WHATWG: windows-31j / cp932)
    ('<meta charset="shift_jis">', "text/html", "cp932",
     "日本語のテスト文書です t{a} これは本文", "日"),
    # HEADER-declared EUC-KR (WHATWG: windows-949 / cp949), no meta
    ("", "text/html; charset=euc-kr", "cp949",
     "한국어 테스트 문서입니다 k{b} 본문 내용", "한"),
    # meta-declared gb2312 (every GBK label decodes via gb18030)
    ('<meta charset="gb2312">', "text/html", "gb18030",
     "中文测试页面的内容 z{c} 这是正文", "中"),
    # meta-declared KOI8-R Cyrillic
    ('<meta charset="koi8-r">', "text/html", "koi8-r",
     "это русский текст р{a} данные и слова объём выше чем обычно", "я"),
    # meta-declared ISO-8859-2 Central European
    ('<meta charset="iso-8859-2">', "text/html", "iso8859-2",
     "příliš žluťoučký kůň ž{b} čas a slova", "č"),
    # UNDECLARED EUC-JP: decodes 'fine' under the cp1252 fallback but
    # is mojibake — the post-decode gate must reject it (NULL row)
    ("", "text/html", "euc_jp",
     "日本語の文書です u{c} これは本文", "日"),
]

# pages whose extraction must FAIL (NULL verdict rows in the oracle)
_CHARSET_REJECT_PAGES = frozenset({9})


def charset_page_text(d: int, p: int) -> str:
    return _CHARSET_PAGES[p][3].format(a=d % 9, b=d % 7, c=d % 5)


def charset_page_title(d: int, p: int) -> str:
    return f"P{p}{_CHARSET_PAGES[p][4]} d{d % 10}"


def synth_charset_warc(doc_id: int) -> bytes:
    """Doc-deterministic WARC of ten HTML responses exercising the
    WHATWG charset-precedence ladder: meta+header UTF-8, header-only
    legacy, undeclared windows-1252 (fallback), a header-beats-
    lying-meta page, declared Shift_JIS / EUC-KR / GBK / KOI8-R /
    ISO-8859-2 pages (the non-Latin breadth, r12), and an UNDECLARED
    EUC-JP page that must reject through the fallback mojibake gate.
    Bodies are minimal one-paragraph pages so the extracted STRINGS
    restate as SQL arithmetic."""
    d = doc_id
    host = f"site{d % 5}.example"
    recs: list[bytes] = []
    info = b"software: danae-spark/1.0\r\nformat: WARC File Format 1.1\r\n"
    recs.append(_record("warcinfo", d * 100, info, {"Content-Type": "application/warc-fields"}))
    for p, (meta, ctype, codec, _tpl, _mark) in enumerate(_CHARSET_PAGES):
        uri = f"http://{host}/c{p}"
        html = (
            f"<html><head>{meta}<title>{charset_page_title(d, p)}</title></head>"
            f"<body><p>{charset_page_text(d, p)}</p></body></html>"
        ).encode(codec)
        resp = (
            f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n\r\n"
        ).encode() + html
        recs.append(
            _record(
                "response",
                d * 100 + p + 1,
                resp,
                {"WARC-Target-URI": uri, "Content-Type": "application/http;msgtype=response"},
            )
        )
    if d % 2 == 1:
        return b"".join(_gzip_member(r) for r in recs)
    return b"".join(recs)


def crawl_charset_extract_roundtrip(spark, sf_dir: str):
    """Oracle-certified charset routing: the WARC walk hands each
    response's Content-Type charset to the HTML decoder, which applies
    WHATWG precedence (header > meta > UTF-8-then-fallback); every
    page's TITLE and extracted TEXT — accented characters included —
    value-check against SQL string arithmetic, so a precedence bug or
    a mojibake decode cannot pass."""
    from danae_spark.catalog import load_table
    from danae_spark.multimodal.htmltext import parse_html_text
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                for uri, status, ctype, body in iter_warc_responses(synth_charset_warc(d)):
                    ext = (
                        parse_html_text(body, content_type_charset(ctype))
                        if status == 200 and (ctype or "").startswith("text/html")
                        else None
                    )
                    rows.append(
                        {
                            "doc_id": d,
                            "uri": uri,
                            "title": ext["title"] if ext else None,
                            "text": ext["text"] if ext else None,
                            "n_chars": ext["n_chars"] if ext else None,
                            "n_words": ext["n_words"] if ext else None,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "uri", "title", "text", "n_chars", "n_words"]
            )

    schema = "doc_id bigint, uri string, title string, text string, n_chars int, n_words int"
    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=schema)
        .orderBy("doc_id", "uri")
    )


# ------------------------------------------- crawl -> corpus composition

CRAWL_CURATE_CAP = 40  # pages kept per registrable domain
# the synth pages' heuristic scores span ~0.28-0.35 (short fixture
# pages); 0.32 makes the quality verdict actually discriminate
CRAWL_CURATE_MIN_Q = 0.32
_MIRROR_OFF = 10**9  # page_id offset for the mirror capture


def _curate_pages(spark, sf_dir: str, syndicate: bool = False):
    """The crawl->page extraction stage shared by crawl_curate and its
    rank-weighted variant: WARC walk -> HTTP decode -> charset-routed
    HTML extraction, one (page_id, doc_id, messy url, text) row per
    200 text/html capture, mirrors doubled for doc_id % 10 == 3.
    `syndicate=True` (the ranked variant's grid) additionally crawls
    page 0 of each mirrored doc from the NEXT doc's site — content
    syndication, the real-web duplicate shape where the copies'
    SOURCES differ, so their link-graph ranks differ and the
    rank-weighted keeper has a real decision. Returned PERSISTED — it
    feeds five downstream branches (canonicalize, cap, quality's two
    scans, keeper window); at corpus scale this is the stage boundary
    a real pipeline materializes to storage."""
    from danae_spark.catalog import load_table
    from danae_spark.multimodal.htmltext import parse_html_text
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                for uri, status, ctype, body in iter_warc_responses(synth_warc(d)):
                    if status != 200 or not (ctype or "").startswith("text/html"):
                        continue
                    ext = parse_html_text(body, content_type_charset(ctype))
                    if ext is None:
                        continue
                    p_ = int(uri.rsplit("/p", 1)[1])
                    host = uri.split("://", 1)[1].split("/", 1)[0]
                    rows.append(
                        {
                            "page_id": d * 4 + p_,
                            "doc_id": d,
                            "url": f"HTTP://{host.upper()}:80/p{p_}",
                            "text": ext["text"],
                        }
                    )
                    if d % 10 == 3:  # the mirror capture of the same page
                        rows.append(
                            {
                                "page_id": d * 4 + p_ + _MIRROR_OFF,
                                "doc_id": d,
                                "url": f"HTTP://M.{host.upper()}:80/p{p_}",
                                "text": ext["text"],
                            }
                        )
                        if syndicate and p_ == 0:
                            # the same content REPUBLISHED on doc d+1's
                            # site (rank join drops it if d+1 is past
                            # the corpus edge — both sides agree)
                            rows.append(
                                {
                                    "page_id": d * 4 + 2 * _MIRROR_OFF,
                                    "doc_id": d + 1,
                                    "url": f"HTTP://SITE{(d + 1) % 5}"
                                    f".EXAMPLE:80/synd{d * 4}",
                                    "text": ext["text"],
                                }
                            )
            yield pd.DataFrame(rows, columns=["page_id", "doc_id", "url", "text"])

    pages = docs.repartition(stage_parallelism(docs.sparkSession), "doc_id").mapInPandas(
        batches, schema="page_id bigint, doc_id bigint, url string, text string"
    )
    return pages.persist()


def crawl_curate_roundtrip(spark, sf_dir: str, cap: int = CRAWL_CURATE_CAP):
    """The END-TO-END crawl->corpus pipeline as ONE certified plan —
    the crawl-side twin of curate_corpus (C29): WARC walk -> HTTP
    decode -> HTML extraction (charset-routed) -> URL canonicalization
    (url_canonicalize_frame; the wire URIs are re-messied with scheme
    case + an explicit default port so the canonicalizer has real work;
    full messy-form coverage is unit-certified by url_canonicalize) ->
    per-domain cap (url_domain_cap_frame, md5-priority keeps) ->
    quality filter (quality_filter_frame: heuristic score + repetition
    + PII, the SAME fused plan as the registered entry) -> exact-dup
    canonical keeper (exact_dup_keeper: two-phase groupBy-on-
    xxhash64(text) + join back, smallest page_id keeps). One
    provenance row per crawled page: where it came from (doc_id, url,
    domain), every verdict, and the final keep.

    Scale shape: the crawl/extract stage is stateless Arrow
    mapInPandas; the keeper is map-side-combined groupBy aggregates +
    an AQE-skew-splittable hash join (a mega-cluster of identical
    captures never lands on one window partition); the domain cap is
    a window over domain (bounded by cap per domain); quality is one
    scan + one gram join — no collects, no cartesians.

    Docs with doc_id % 10 == 3 are crawled TWICE — once from the main
    host and once from an `m.`-subdomain mirror (same registrable
    domain, byte-identical pages: the shape CDN mirrors actually
    produce) — so the exact-dup keeper genuinely fires: each mirrored
    page forms a 2-cluster whose keeper is the main capture."""
    from danae_spark.operators.dedup import exact_dup_keeper
    from danae_spark.operators.textstats import quality_filter_frame
    from danae_spark.operators.urlops import url_canonicalize_frame, url_domain_cap_frame
    from pyspark.sql import functions as F

    pages = _curate_pages(spark, sf_dir)
    canon = url_canonicalize_frame(
        pages.select("page_id", "url"), id_col="page_id"
    ).select("page_id", "url_canon")
    capd = url_domain_cap_frame(
        pages.join(canon, "page_id").select(
            F.col("page_id").alias("doc_id"), F.col("url_canon").alias("url")
        ),
        cap=cap,
    ).select(
        F.col("doc_id").alias("page_id"), "domain", F.col("kept").alias("cap_kept")
    )
    q = quality_filter_frame(
        pages.select(F.col("page_id").alias("doc_id"), "text"),
        min_quality=CRAWL_CURATE_MIN_Q,
        order=False,
    ).select(F.col("doc_id").alias("page_id"), F.col("keep").alias("quality_keep"))
    dup = exact_dup_keeper(pages.select("page_id", "doc_id", "text")).select(
        "page_id", "doc_id", "n_dup", "is_keeper"
    )
    return (
        dup.join(canon, "page_id")
        .join(capd, "page_id")
        .join(q, "page_id")
        .select(
            "page_id",
            "doc_id",
            F.col("url_canon").alias("url"),
            "domain",
            "n_dup",
            "is_keeper",
            "quality_keep",
            "cap_kept",
            (
                (F.col("is_keeper") == 1)
                & (F.col("quality_keep") == 1)
                & (F.col("cap_kept") == 1)
            )
            .cast("int")
            .alias("keep"),
        )
        .orderBy("page_id")
    )


def _crawl_curate_oracle(cap: int = CRAWL_CURATE_CAP) -> str:
    from danae_spark.multimodal.htmltext import html_text_sql
    from danae_spark.operators.textstats import quality_filter_oracle

    ok_pages = """
SELECT d.doc_id, d.doc_id * 4 + p.p AS e
FROM documents d, generate_series(0, 2) p(p)
WHERE p.p < 1 + d.doc_id % 3 AND (d.doc_id + p.p) % 5 <> 4
"""
    return f"""
WITH hx AS ({html_text_sql(ok_pages)}),
pg AS (
  SELECT doc_id AS src_doc,
         e + CASE WHEN m.m = 1 THEN {_MIRROR_OFF} ELSE 0 END AS page_id,
         'http://' || CASE WHEN m.m = 1 THEN 'm.' ELSE '' END
           || 'site' || CAST(doc_id % 5 AS VARCHAR) || '.example/p'
           || CAST(e - doc_id * 4 AS VARCHAR) AS url,
         'site' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS domain,
         text
  FROM hx, generate_series(0, 1) m(m)
  WHERE m.m = 0 OR doc_id % 10 = 3
),
pgq AS (SELECT page_id AS doc_id, text, 'en' AS lang FROM pg),
q AS (
  -- quality_filter_oracle runs VERBATIM over the harvested pages via
  -- its `source` relation parameter (shadowing the documents view at
  -- this level would capture html_text_sql's own FROM and bind a cycle)
  SELECT doc_id AS page_id, keep AS quality_keep
  FROM ({quality_filter_oracle(min_quality=CRAWL_CURATE_MIN_Q, source="pgq")})
),
cap AS (
  SELECT page_id,
         CAST(row_number() OVER (
             PARTITION BY domain
             ORDER BY md5(CAST(page_id AS VARCHAR)), page_id
           ) <= {cap} AS INT) AS cap_kept
  FROM pg
),
dup AS (
  SELECT page_id,
         CAST(count(*) OVER (PARTITION BY text) AS INT) AS n_dup,
         CAST(row_number() OVER (PARTITION BY text ORDER BY page_id) = 1
              AS INT) AS is_keeper
  FROM pg
)
SELECT pg.page_id, pg.src_doc AS doc_id, pg.url, pg.domain,
       dup.n_dup, dup.is_keeper, q.quality_keep, cap.cap_kept,
       CAST(dup.is_keeper = 1 AND q.quality_keep = 1 AND cap.cap_kept = 1
            AS INT) AS keep
FROM pg
JOIN dup USING (page_id) JOIN q USING (page_id) JOIN cap USING (page_id)
ORDER BY pg.page_id
"""


def crawl_curate_ranked_roundtrip(spark, sf_dir: str, cap: int = CRAWL_CURATE_CAP):
    """crawl_curate with the LINK GRAPH wired in (r12): the certified
    pagerank (operators/frontier.py — 10 unrolled power-iteration
    rounds over the doc-graph) joins each capture's source doc as a
    quality feature, and the exact-dup canonical keeper becomes
    RANK-WEIGHTED — within a duplicate cluster the member with the
    HIGHEST source rank keeps (ties: smallest page_id), so a crawl
    keeps the authoritative copy instead of whichever arrived first.
    The synth grid's prose arithmetic collides across docs (page e and
    e+300 share word cycles), so clusters genuinely span docs with
    DIFFERENT ranks and the rank tiebreak decides real keeps. All
    other verdicts (per-domain cap, fused quality filter) and the
    provenance row shape match crawl_curate, plus the rank column."""
    from danae_spark.operators.dedup import exact_dup_keeper
    from danae_spark.operators.frontier import pagerank_roundtrip
    from danae_spark.operators.textstats import quality_filter_frame
    from danae_spark.operators.urlops import url_canonicalize_frame, url_domain_cap_frame
    from pyspark.sql import functions as F

    pages = _curate_pages(spark, sf_dir, syndicate=True)
    ranks = pagerank_roundtrip(spark, sf_dir).withColumnRenamed("node", "doc_id")
    pages = pages.join(ranks, "doc_id").persist()
    canon = url_canonicalize_frame(
        pages.select("page_id", "url"), id_col="page_id"
    ).select("page_id", "url_canon")
    capd = url_domain_cap_frame(
        pages.join(canon, "page_id").select(
            F.col("page_id").alias("doc_id"), F.col("url_canon").alias("url")
        ),
        cap=cap,
    ).select(
        F.col("doc_id").alias("page_id"), "domain", F.col("kept").alias("cap_kept")
    )
    q = quality_filter_frame(
        pages.select(F.col("page_id").alias("doc_id"), "text"),
        min_quality=CRAWL_CURATE_MIN_Q,
        order=False,
    ).select(F.col("doc_id").alias("page_id"), F.col("keep").alias("quality_keep"))
    dup = exact_dup_keeper(
        pages.select("page_id", "doc_id", "rank", "text"), rank_col="rank"
    ).select("page_id", "doc_id", "rank", "n_dup", "is_keeper")
    return (
        dup.join(canon, "page_id")
        .join(capd, "page_id")
        .join(q, "page_id")
        .select(
            "page_id",
            "doc_id",
            F.col("url_canon").alias("url"),
            "domain",
            "rank",
            "n_dup",
            "is_keeper",
            "quality_keep",
            "cap_kept",
            (
                (F.col("is_keeper") == 1)
                & (F.col("quality_keep") == 1)
                & (F.col("cap_kept") == 1)
            ).cast("int").alias("keep"),
        )
        .orderBy("page_id")
    )


def _crawl_curate_ranked_oracle(cap: int = CRAWL_CURATE_CAP) -> str:
    from danae_spark.multimodal.htmltext import html_text_sql
    from danae_spark.operators.frontier import pagerank_ctes
    from danae_spark.operators.textstats import quality_filter_oracle

    ok_pages = """
SELECT d.doc_id, d.doc_id * 4 + p.p AS e
FROM documents d, generate_series(0, 2) p(p)
WHERE p.p < 1 + d.doc_id % 3 AND (d.doc_id + p.p) % 5 <> 4
"""
    return f"""
WITH {pagerank_ctes()},
hx AS ({html_text_sql(ok_pages)}),
pg0 AS (
  -- m=0 main, m=1 mirror (same source doc), m=2 the SYNDICATED copy
  -- republished on doc+1's site (page 0 of mirrored docs only)
  SELECT CASE WHEN m.m = 2 THEN hx.doc_id + 1 ELSE hx.doc_id END AS src_doc,
         e + m.m * {_MIRROR_OFF} AS page_id,
         CASE m.m
           WHEN 0 THEN 'http://site' || CAST(hx.doc_id % 5 AS VARCHAR)
                || '.example/p' || CAST(e - hx.doc_id * 4 AS VARCHAR)
           WHEN 1 THEN 'http://m.site' || CAST(hx.doc_id % 5 AS VARCHAR)
                || '.example/p' || CAST(e - hx.doc_id * 4 AS VARCHAR)
           ELSE 'http://site' || CAST((hx.doc_id + 1) % 5 AS VARCHAR)
                || '.example/synd' || CAST(e AS VARCHAR)
         END AS url,
         'site' || CAST(CASE WHEN m.m = 2 THEN hx.doc_id + 1
                             ELSE hx.doc_id END % 5 AS VARCHAR)
           || '.example' AS domain,
         text
  FROM hx, generate_series(0, 2) m(m)
  WHERE m.m = 0
     OR (hx.doc_id % 10 = 3
         AND (m.m = 1 OR e = hx.doc_id * 4))
),
pg AS (
  -- the rank join also drops a syndicated row whose src_doc is past
  -- the corpus edge, matching the Spark side's inner join
  SELECT pg0.*, pr.rank AS rank
  FROM pg0 JOIN pr ON pg0.src_doc = pr.node
),
pgq AS (SELECT page_id AS doc_id, text, 'en' AS lang FROM pg),
q AS (
  SELECT doc_id AS page_id, keep AS quality_keep
  FROM ({quality_filter_oracle(min_quality=CRAWL_CURATE_MIN_Q, source="pgq")})
),
cap AS (
  SELECT page_id,
         CAST(row_number() OVER (
             PARTITION BY domain
             ORDER BY md5(CAST(page_id AS VARCHAR)), page_id
           ) <= {cap} AS INT) AS cap_kept
  FROM pg
),
dup AS (
  SELECT page_id,
         CAST(count(*) OVER (PARTITION BY text) AS INT) AS n_dup,
         CAST(row_number() OVER (PARTITION BY text
                                 ORDER BY rank DESC, page_id) = 1
              AS INT) AS is_keeper
  FROM pg
)
SELECT pg.page_id, pg.src_doc AS doc_id, pg.url, pg.domain, pg.rank,
       dup.n_dup, dup.is_keeper, q.quality_keep, cap.cap_kept,
       CAST(dup.is_keeper = 1 AND q.quality_keep = 1 AND cap.cap_kept = 1
            AS INT) AS keep
FROM pg
JOIN dup USING (page_id) JOIN q USING (page_id) JOIN cap USING (page_id)
ORDER BY pg.page_id
"""


CRAWL_BOILER_MIN_Q = 0.34  # prose scores span 0.328-0.368: discriminates


def synth_boiler_warc(doc_id: int) -> bytes:
    """WARC of the planted-boilerplate page (htmltext.synth_boiler_html
    — prose + link-farm div + linky stub): one 200 response per doc;
    docs with doc_id % 10 == 3 get a SECOND capture from an
    m.-subdomain mirror whose FARM words differ but whose prose is
    identical — so exact-dup clustering fires only AFTER the block
    rule strips the boilerplate. Gzip member-per-record on odd docs."""
    from danae_spark.multimodal.htmltext import synth_boiler_html

    d = doc_id
    host = f"site{d % 5}.example"
    recs: list[bytes] = []
    info = b"software: danae-spark/1.0\r\nformat: WARC File Format 1.1\r\n"
    recs.append(_record("warcinfo", d * 100, info, {"Content-Type": "application/warc-fields"}))
    captures = [(f"http://{host}/b", False)]
    if d % 10 == 3:
        captures.append((f"http://m.{host}/b", True))
    for k, (uri, mirror) in enumerate(captures):
        html = synth_boiler_html(d, mirror=mirror)
        resp = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" + html
        recs.append(
            _record(
                "response",
                d * 100 + k + 1,
                resp,
                {"WARC-Target-URI": uri, "Content-Type": "application/http;msgtype=response"},
            )
        )
    if d % 2 == 1:
        return b"".join(_gzip_member(r) for r in recs)
    return b"".join(recs)


def crawl_curate_boiler_roundtrip(spark, sf_dir: str):
    """The crawl_curate variant over BOILERPLATE-BEARING pages (r12):
    WARC walk -> HTTP decode -> HTML extraction with the per-block
    boilerplate rule (drop_boilerplate=True) -> quality filter (the
    SAME fused quality_filter_frame) -> exact-dup canonical keeper.
    The mirror captures (doc_id % 10 == 3) carry DIFFERENT link-farm
    bytes but identical prose, so the dedup stage clusters them iff
    the block rule actually stripped the farm — the end-to-end
    certification that boilerplate removal feeds curation. One
    provenance row per capture with every verdict."""
    from danae_spark.catalog import load_table
    from danae_spark.multimodal.htmltext import parse_html_text
    from danae_spark.operators.dedup import exact_dup_keeper
    from danae_spark.operators.textstats import quality_filter_frame
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped
    from pyspark.sql import functions as F

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                for k, (uri, _status, ctype, body) in enumerate(
                    iter_warc_responses(synth_boiler_warc(d))
                ):
                    ext = parse_html_text(
                        body, content_type_charset(ctype), drop_boilerplate=True
                    )
                    if ext is None:
                        continue
                    rows.append(
                        {
                            "page_id": d * 2 + k,
                            "doc_id": d,
                            "url": uri,
                            "text": ext["text"],
                            "n_blocks_dropped": ext["n_blocks_dropped"],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["page_id", "doc_id", "url", "text", "n_blocks_dropped"]
            )

    pages = docs.repartition(stage_parallelism(docs.sparkSession), "doc_id").mapInPandas(
        batches,
        schema="page_id bigint, doc_id bigint, url string, text string, "
        "n_blocks_dropped int",
    )
    pages = pages.persist()  # feeds quality + keeper branches
    q = quality_filter_frame(
        pages.select(F.col("page_id").alias("doc_id"), "text"),
        min_quality=CRAWL_BOILER_MIN_Q,
        order=False,
    ).select(F.col("doc_id").alias("page_id"), F.col("keep").alias("quality_keep"))
    dup = exact_dup_keeper(
        pages.select("page_id", "doc_id", "url", "n_blocks_dropped", "text")
    ).select("page_id", "doc_id", "url", "n_blocks_dropped", "n_dup", "is_keeper")
    return (
        dup.join(q, "page_id")
        .select(
            "page_id",
            "doc_id",
            "url",
            "n_blocks_dropped",
            "n_dup",
            "is_keeper",
            "quality_keep",
            (
                (F.col("is_keeper") == 1) & (F.col("quality_keep") == 1)
            ).cast("int").alias("keep"),
        )
        .orderBy("page_id")
    )


def _crawl_curate_boiler_oracle() -> str:
    from danae_spark.multimodal.htmltext import boiler_text_sql
    from danae_spark.operators.textstats import quality_filter_oracle

    return f"""
WITH bx AS ({boiler_text_sql("SELECT doc_id, doc_id AS e FROM documents")}),
pg AS (
  SELECT doc_id AS src_doc,
         doc_id * 2 + m.m AS page_id,
         'http://' || CASE WHEN m.m = 1 THEN 'm.' ELSE '' END
           || 'site' || CAST(doc_id % 5 AS VARCHAR) || '.example/b' AS url,
         CAST(2 AS INT) AS n_blocks_dropped,
         text
  FROM bx, generate_series(0, 1) m(m)
  WHERE m.m = 0 OR doc_id % 10 = 3
),
pgq AS (SELECT page_id AS doc_id, text, 'en' AS lang FROM pg),
q AS (
  SELECT doc_id AS page_id, keep AS quality_keep
  FROM ({quality_filter_oracle(min_quality=CRAWL_BOILER_MIN_Q, source="pgq")})
),
dup AS (
  SELECT page_id,
         CAST(count(*) OVER (PARTITION BY text) AS INT) AS n_dup,
         CAST(row_number() OVER (PARTITION BY text ORDER BY page_id) = 1
              AS INT) AS is_keeper
  FROM pg
)
SELECT pg.page_id, pg.src_doc AS doc_id, pg.url, pg.n_blocks_dropped,
       dup.n_dup, dup.is_keeper, q.quality_keep,
       CAST(dup.is_keeper = 1 AND q.quality_keep = 1 AS INT) AS keep
FROM pg JOIN dup USING (page_id) JOIN q USING (page_id)
ORDER BY pg.page_id
"""


def synth_revisit_warc(doc_id: int) -> bytes:
    """Two-crawl WARC of one site: the FIRST crawl's 200 responses
    (the synth_html pages), then the SECOND crawl finding every page
    with e % 3 == 0 unchanged and writing a REVISIT record for it —
    identical-payload-digest profile, WARC-Refers-To naming the first
    capture's record id, WARC-Refers-To-Target-URI carried (the
    Common Crawl shape). Gzip member-per-record on odd docs."""
    from danae_spark.multimodal.htmltext import synth_html

    d = doc_id
    host = f"site{d % 5}.example"
    recs: list[bytes] = []
    info = b"software: danae-spark/1.0\r\nformat: WARC File Format 1.1\r\n"
    recs.append(_record("warcinfo", d * 100, info, {"Content-Type": "application/warc-fields"}))
    live = [p for p in range(n_pages(d)) if page_status(d, p) == 200]
    for p in live:
        e = d * 4 + p
        uri = f"http://{host}/p{p}"
        resp = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
            + synth_html(e)
        )
        recs.append(
            _record(
                "response",
                d * 100 + p + 1,
                resp,
                {"WARC-Target-URI": uri, "Content-Type": "application/http;msgtype=response"},
            )
        )
    for p in live:  # the second crawl: unchanged pages revisit
        e = d * 4 + p
        if e % 3 != 0:
            continue
        uri = f"http://{host}/p{p}"
        recs.append(
            _record(
                "revisit",
                d * 100 + 50 + p,
                b"",
                {
                    "WARC-Target-URI": uri,
                    "WARC-Profile": "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
                    "WARC-Refers-To": f"<urn:uuid:00000000-0000-4000-8000-{d * 100 + p + 1:012d}>",
                    "WARC-Refers-To-Target-URI": uri,
                    "Content-Type": "application/http;msgtype=response",
                },
            )
        )
    if d % 2 == 1:
        return b"".join(_gzip_member(r) for r in recs)
    return b"".join(recs)


def crawl_revisit_dedup_roundtrip(spark, sf_dir: str):
    """Revisit-record semantics wired into curation (r12): the capture
    walk (warc_captures) resolves every revisit to its original and
    the pipeline records a DUP EDGE instead of re-extracting — revisit
    rows carry NO text (nothing was decoded for them), count into
    their original's duplicate cluster, and the original stays the
    keeper. One row per capture: (capture_id, doc_id, kind, uri,
    refers_uri, text, n_dup, is_keeper); response text extracts via
    the normal charset-routed path and restates via html_text_sql, so
    the skip-re-extraction contract is value-checked against the same
    fragment as the full-extraction entries."""
    from danae_spark.catalog import load_table
    from danae_spark.multimodal.htmltext import parse_html_text
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    cols = ["capture_id", "doc_id", "kind", "uri", "refers_uri", "text", "n_dup", "is_keeper"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                caps = warc_captures(synth_revisit_warc(d))
                if caps is None:
                    continue
                revisit_count: dict[str, int] = {}
                for kind, uri, _http, orig in caps:
                    if kind == "revisit":
                        revisit_count[orig] = revisit_count.get(orig, 0) + 1
                for kind, uri, http, orig in caps:
                    p_ = int(uri.rsplit("/p", 1)[1])
                    e = d * 4 + p_
                    if kind == "response":
                        ext = parse_html_text(
                            http["body"], content_type_charset(http["content_type"])
                        )
                        rows.append(
                            {
                                "capture_id": e,
                                "doc_id": d,
                                "kind": "response",
                                "uri": uri,
                                "refers_uri": None,
                                "text": ext["text"] if ext else None,
                                "n_dup": 1 + revisit_count.get(uri, 0),
                                "is_keeper": 1,
                            }
                        )
                    else:
                        rows.append(
                            {
                                "capture_id": e + _MIRROR_OFF,
                                "doc_id": d,
                                "kind": "revisit",
                                "uri": uri,
                                "refers_uri": orig,
                                "text": None,  # NOT re-extracted: the point
                                "n_dup": 1 + revisit_count.get(orig, 0),
                                "is_keeper": 0,
                            }
                        )
            yield pd.DataFrame(rows, columns=cols)

    schema = (
        "capture_id bigint, doc_id bigint, kind string, uri string, "
        "refers_uri string, text string, n_dup int, is_keeper int"
    )
    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=schema)
        .orderBy("doc_id", "capture_id")
    )


def _crawl_revisit_oracle() -> str:
    from danae_spark.multimodal.htmltext import html_text_sql

    ok_pages = """
SELECT d.doc_id, d.doc_id * 4 + p.p AS e
FROM documents d, generate_series(0, 2) p(p)
WHERE p.p < 1 + d.doc_id % 3 AND (d.doc_id + p.p) % 5 <> 4
"""
    return f"""
WITH hx AS ({html_text_sql(ok_pages)}),
resp AS (
  SELECT doc_id, e,
         'http://site' || CAST(doc_id % 5 AS VARCHAR) || '.example/p'
           || CAST(e - doc_id * 4 AS VARCHAR) AS uri,
         text
  FROM hx
),
caps AS (
  SELECT e AS capture_id, doc_id, 'response' AS kind, uri,
         CAST(NULL AS VARCHAR) AS refers_uri, text,
         CAST(1 + CASE WHEN e % 3 = 0 THEN 1 ELSE 0 END AS INT) AS n_dup,
         CAST(1 AS INT) AS is_keeper
  FROM resp
  UNION ALL
  SELECT e + {_MIRROR_OFF}, doc_id, 'revisit', uri, uri,
         CAST(NULL AS VARCHAR), CAST(2 AS INT), CAST(0 AS INT)
  FROM resp WHERE e % 3 = 0
)
SELECT capture_id, doc_id, kind, uri, refers_uri, text, n_dup, is_keeper
FROM caps ORDER BY doc_id, capture_id
"""


def crawl_report_roundtrip(spark, sf_dir: str):
    """The crawl health report — ONE row summarizing the whole
    crawl->corpus run (the number a pipeline operator actually reads):
    pages crawled, distinct domains, duplicate rate, quality pass
    rate, cap survival, final keep count + rate. Computed by plain
    aggregation OVER the certified crawl_curate plan, so the report
    can never disagree with the row-level verdicts."""
    from pyspark.sql import functions as F

    cur = crawl_curate_roundtrip(spark, sf_dir)
    return cur.agg(
        F.count("*").alias("n_pages"),
        F.countDistinct("domain").alias("n_domains"),
        F.sum((F.col("n_dup") > 1).cast("int")).alias("n_in_dup_cluster"),
        F.sum(F.col("is_keeper")).alias("n_keepers"),
        F.sum(F.col("quality_keep")).alias("n_quality_pass"),
        F.sum(F.col("cap_kept")).alias("n_cap_survivors"),
        F.sum(F.col("keep")).alias("n_kept"),
        F.round(F.sum(F.col("keep")) / F.count("*"), 6).alias("keep_rate"),
    )


def _crawl_report_oracle() -> str:
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT domain) AS BIGINT) AS n_domains,
       CAST(sum(CASE WHEN n_dup > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_in_dup_cluster,
       CAST(sum(is_keeper) AS BIGINT) AS n_keepers,
       CAST(sum(quality_keep) AS BIGINT) AS n_quality_pass,
       CAST(sum(cap_kept) AS BIGINT) AS n_cap_survivors,
       CAST(sum(keep) AS BIGINT) AS n_kept,
       ROUND(sum(keep) * 1.0 / count(*), 6) AS keep_rate
FROM ({_crawl_curate_oracle()})
"""


CRAWL_CHARSET_ORACLE = """
WITH pages AS (
  SELECT d.doc_id, p.p,
         'http://site' || CAST(d.doc_id % 5 AS VARCHAR) || '.example/c'
           || CAST(p.p AS VARCHAR) AS uri,
         'P' || CAST(p.p AS VARCHAR)
           || CASE p.p WHEN 4 THEN '日' WHEN 5 THEN '한' WHEN 6 THEN '中'
                       WHEN 7 THEN 'я' WHEN 8 THEN 'č' ELSE '' END
           || ' d' || CAST(d.doc_id % 10 AS VARCHAR) AS title,
         CASE p.p
           WHEN 0 THEN 'café w' || CAST(d.doc_id % 9 AS VARCHAR) || ' résumé'
           WHEN 1 THEN 'crème w' || CAST(d.doc_id % 7 AS VARCHAR) || ' café'
           WHEN 2 THEN 'naïve k' || CAST(d.doc_id % 9 AS VARCHAR) || ' déjà'
           WHEN 3 THEN 'déjà vu x' || CAST(d.doc_id % 5 AS VARCHAR)
           WHEN 4 THEN '日本語のテスト文書です t' || CAST(d.doc_id % 9 AS VARCHAR)
                || ' これは本文'
           WHEN 5 THEN '한국어 테스트 문서입니다 k' || CAST(d.doc_id % 7 AS VARCHAR)
                || ' 본문 내용'
           WHEN 6 THEN '中文测试页面的内容 z' || CAST(d.doc_id % 5 AS VARCHAR)
                || ' 这是正文'
           WHEN 7 THEN 'это русский текст р' || CAST(d.doc_id % 9 AS VARCHAR)
                || ' данные и слова объём выше чем обычно'
           WHEN 8 THEN 'příliš žluťoučký kůň ž' || CAST(d.doc_id % 7 AS VARCHAR)
                || ' čas a slova'
           ELSE NULL  -- p9: undeclared EUC-JP rejects (mojibake gate)
         END AS text
  FROM documents d, generate_series(0, 9) p(p)
)
SELECT doc_id, uri,
       CASE WHEN text IS NULL THEN NULL ELSE title END AS title,
       text,
       CAST(length(text) AS INT) AS n_chars,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT) AS n_words
FROM pages ORDER BY doc_id, uri
"""


# ------------------- language-routed curate composition (r14, C94)

# routed prose scores span 0.91-1.0; English-routed scores for
# non-English prose top out at 0.74 (cs, via the shared token 'a') —
# 0.8 separates the two scorers on every fixture
CRAWL_LANG_MIN_Q = 0.8
_SALT_MAP = str.maketrans("0123456789", "abcdefghij")


def _lang_rotation() -> list[str]:
    from danae_spark.operators.langid import _CORPORA

    return sorted(_CORPORA)


def lang_page_prose(doc_id: int) -> tuple[str, str]:
    """(lang, prose) for the doc's prose page: the langid training
    corpus of lang = rotation[doc_id % 16], repeated twice (saturates
    the length leg of the quality score for segmented languages) plus
    a letters-only per-doc salt token so exact-dup clusters come only
    from the mirror captures, not from the shared corpus text."""
    from danae_spark.operators.langid import _CORPORA

    langs = _lang_rotation()
    lang = langs[doc_id % len(langs)]
    salt = str(doc_id).translate(_SALT_MAP)
    return lang, " ".join([_CORPORA[lang]] * 2) + f" ref{salt}"


def synth_lang_warc(doc_id: int) -> bytes:
    """WARC fixture for the language-routed curate: per doc one PROSE
    page in the doc's rotation language (UTF-8, body restated by the
    oracle as a corpus string literal), one short JUNK page (nav-stub
    text that any quality scorer must drop), and — for docs with
    doc_id % 10 == 3 — a byte-identical mirror of the prose page from
    an m.-subdomain (the dup cluster the keeper resolves). Gzip
    member-per-record on odd docs, same as the other synth rotations."""
    d = doc_id
    host = f"site{d % 5}.example"
    lang, prose = lang_page_prose(d)
    salt = str(d).translate(_SALT_MAP)
    junk = f"menu home login ref{salt}"
    recs: list[bytes] = []
    info = b"software: danae-spark/1.0\r\nformat: WARC File Format 1.1\r\n"
    recs.append(_record("warcinfo", d * 100, info, {"Content-Type": "application/warc-fields"}))
    captures = [(f"http://{host}/l0", prose), (f"http://{host}/l1", junk)]
    if d % 10 == 3:
        captures.append((f"http://m.{host}/l0", prose))
    for k, (uri, body_text) in enumerate(captures):
        html = (
            f"<html><head><title>L{d % 10}</title></head>"
            f"<body><p>{body_text}</p></body></html>"
        ).encode("utf-8")
        resp = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" + html
        recs.append(
            _record(
                "response",
                d * 100 + k + 1,
                resp,
                {"WARC-Target-URI": uri, "Content-Type": "application/http;msgtype=response"},
            )
        )
    if d % 2 == 1:
        return b"".join(_gzip_member(r) for r in recs)
    return b"".join(recs)


def crawl_curate_multilang_roundtrip(spark, sf_dir: str):
    """crawl_curate with the LANGUAGE-ROUTED quality scorer wired into
    the keep decision (r14 — closes the r12 loop the charset+langid
    work opened): WARC walk -> HTTP decode -> HTML extraction -> n-gram
    language ID -> quality_multilang_frame (each page's stopword ratio
    routed through its PREDICTED language's table; neutral stop leg
    for unsegmented CJK) -> exact-dup canonical keeper ->
    keep = routed_quality AND keeper. The row also carries the
    ENGLISH-routed score's verdict (en_keep) so the delta the routing
    buys is visible per page: every non-English prose page has
    routed_keep=1, en_keep=0 — under the English scorer the
    multilingual corpus would be discarded wholesale.

    Scale shape: extraction is stateless Arrow mapInPandas; langid is
    one trigram explode + per-page bounded windows (≤ doc-profile
    rows) + a broadcast profile join; the keeper is the two-phase
    groupBy+join (no window over the text hash); no collects, no
    cartesians. Caveat the scorer inherits from quality_multilang:
    unsegmented ja/zh prose fails the token-length leg (neutral stop
    leg can't rescue it), so CJK pages drop — the honest state of a
    whitespace-token quality model."""
    from danae_spark.catalog import load_table
    from danae_spark.functions.rounding import rnd
    from danae_spark.multimodal.htmltext import parse_html_text
    from danae_spark.operators.dedup import exact_dup_keeper
    from danae_spark.operators.langid import lang_stopwords, quality_multilang_frame
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped
    from pyspark.sql import functions as F

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                lang, _prose = lang_page_prose(d)
                for k, (uri, _status, ctype, body) in enumerate(
                    iter_warc_responses(synth_lang_warc(d))
                ):
                    ext = parse_html_text(body, content_type_charset(ctype))
                    if ext is None:
                        continue
                    rows.append(
                        {
                            "page_id": d * 4 + k,
                            "doc_id": d,
                            "url": uri,
                            "lang": lang if uri.endswith("/l0") else None,
                            "text": ext["text"],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["page_id", "doc_id", "url", "lang", "text"]
            )

    pages = docs.repartition(stage_parallelism(docs.sparkSession), "doc_id").mapInPandas(
        batches, schema="page_id bigint, doc_id bigint, url string, lang string, text string"
    )
    pages = pages.persist()  # feeds quality, en-comparison, and keeper branches
    mq = quality_multilang_frame(
        pages.select(F.col("page_id").alias("doc_id"), "text"), id_col="doc_id"
    ).select(
        F.col("doc_id").alias("page_id"), "predicted", "n_tokens", "mq_score"
    )
    toks = r"filter(split(lower(text), '[^\\p{L}]+'), t -> t <> '')"
    en_list = ", ".join(f"'{w}'" for w in lang_stopwords("en"))
    en = pages.select(
        "page_id",
        F.expr(f"size(filter({toks}, t -> t in ({en_list})))").alias("__en_hits"),
        F.expr(f"size({toks})").alias("__n"),
    ).select(
        "page_id",
        rnd(
            F.least(F.col("__n") / 100.0, F.lit(1.0)) * 0.5
            + F.least(
                F.col("__en_hits") / F.greatest(F.col("__n"), F.lit(1)) * 5,
                F.lit(1.0),
            )
            * 0.5,
            6,
        ).alias("en_score"),
    )
    dup = exact_dup_keeper(pages.select("page_id", "doc_id", "text")).select(
        "page_id", "n_dup", "is_keeper"
    )
    return (
        pages.select("page_id", "doc_id", "url", "lang")
        .join(mq, "page_id")
        .join(en, "page_id")
        .join(dup, "page_id")
        .select(
            "page_id",
            "doc_id",
            "url",
            "lang",
            "predicted",
            F.when(F.col("lang").isNotNull(), (F.col("predicted") == F.col("lang")).cast("int"))
            .alias("lang_match"),
            "n_tokens",
            "mq_score",
            (F.col("mq_score") >= CRAWL_LANG_MIN_Q).cast("int").alias("routed_keep"),
            (F.col("en_score") >= CRAWL_LANG_MIN_Q).cast("int").alias("en_keep"),
            "n_dup",
            "is_keeper",
            (
                (F.col("mq_score") >= CRAWL_LANG_MIN_Q) & (F.col("is_keeper") == 1)
            ).cast("int").alias("keep"),
        )
        .orderBy("page_id")
    )


def _crawl_curate_multilang_oracle() -> str:
    from danae_spark.operators.langid import _CORPORA, lang_stopwords
    from danae_spark.operators.langid import quality_multilang_oracle

    langs = _lang_rotation()
    lang_case = " ".join(
        f"WHEN {i} THEN '{l}'" for i, l in enumerate(langs)
    )
    prose_case = " ".join(
        "WHEN {} THEN repeat('{} ', 2) || 'ref' || salt".format(
            i, _CORPORA[l].replace("'", "''")
        )
        for i, l in enumerate(langs)
    )
    en_list = ", ".join(f"'{w}'" for w in lang_stopwords("en"))
    toks = "list_filter(string_split_regex(lower(text), '[^\\p{L}]+'), t -> t <> '')"
    return f"""
WITH d16 AS (
  SELECT doc_id,
         translate(CAST(doc_id AS VARCHAR), '0123456789', 'abcdefghij') AS salt,
         CASE doc_id % {len(langs)} {lang_case} END AS lang
  FROM documents
),
pages AS (
  SELECT doc_id * 4 AS page_id, doc_id, lang,
         'http://site' || CAST(doc_id % 5 AS VARCHAR) || '.example/l0' AS url,
         CASE doc_id % {len(langs)} {prose_case} END AS text
  FROM d16
  UNION ALL
  SELECT doc_id * 4 + 1, doc_id, NULL,
         'http://site' || CAST(doc_id % 5 AS VARCHAR) || '.example/l1',
         'menu home login ref' || salt
  FROM d16
  UNION ALL
  SELECT doc_id * 4 + 2, doc_id, lang,
         'http://m.site' || CAST(doc_id % 5 AS VARCHAR) || '.example/l0',
         CASE doc_id % {len(langs)} {prose_case} END
  FROM d16 WHERE doc_id % 10 = 3
),
pgsrc AS (SELECT page_id AS doc_id, text FROM pages),
mq AS ({quality_multilang_oracle(source="pgsrc", label=False)}),
en AS (
  SELECT page_id,
         floor((least(len({toks}) / 100.0, 1.0) * 0.5
                + least(len(list_filter({toks}, t -> t IN ({en_list})))
                        * 1.0 / greatest(len({toks}), 1) * 5, 1.0) * 0.5)
               * power(10, 6) + 0.5001) / power(10, 6) AS en_score
  FROM pages
),
dup AS (
  SELECT page_id,
         CAST(count(*) OVER (PARTITION BY text) AS INT) AS n_dup,
         CAST(row_number() OVER (PARTITION BY text ORDER BY page_id) = 1
              AS INT) AS is_keeper
  FROM pages
)
SELECT p.page_id, p.doc_id, p.url, p.lang, mq.predicted,
       CASE WHEN p.lang IS NULL THEN NULL
            ELSE CAST(mq.predicted = p.lang AS INT) END AS lang_match,
       mq.n_tokens, mq.mq_score,
       CAST(mq.mq_score >= {CRAWL_LANG_MIN_Q} AS INT) AS routed_keep,
       CAST(en.en_score >= {CRAWL_LANG_MIN_Q} AS INT) AS en_keep,
       dup.n_dup, dup.is_keeper,
       CAST(mq.mq_score >= {CRAWL_LANG_MIN_Q} AND dup.is_keeper = 1 AS INT)
         AS keep
FROM pages p
JOIN mq ON p.page_id = mq.doc_id
JOIN en USING (page_id) JOIN dup USING (page_id)
ORDER BY p.page_id
"""


# ---------------- rel=canonical as a curation dedup key (r14, C95)


def synth_canon_warc(doc_id: int) -> bytes:
    """WARC fixture for canonical-link dedup: per doc, two captures of
    the same logical page whose BYTES differ (a ?utm_source variant
    and a trailing-slash variant, each with its own body marker) but
    whose <link rel=canonical> targets agree — the mirror shape CDNs
    and trackers actually produce, which NO text hash can cluster.
    The canonical href is deliberately messy (upper-case scheme/host +
    an explicit :80) so the C69 canonicalizer genuinely runs. Plus: a
    no-canonical standalone page; for doc_id % 3 == 0 a LYING capture
    on a different registrable domain claiming canonical on the main
    site (the guard must refuse it); for doc_id % 4 == 1 two
    byte-identical no-canonical twins (the text-hash fallback must
    still cluster them). Gzip member-per-record on odd docs."""
    d = doc_id
    host = f"site{d % 5}.example"
    salt = str(d).translate(_SALT_MAP)  # letters-only per-doc body salt:
    # keeps every text-fallback cluster within its doc (so the oracle's
    # cluster arithmetic is the fixture's construction, not an accident
    # of which d-mods collide across docs)
    messy_canon = f"HTTP://{host.upper()}:80/a{d}"
    prose = f"canonical cluster prose w{d % 9} and body words"
    captures = [
        (f"http://{host}/a{d}?utm_source=feed", f"{prose} variant alpha", messy_canon),
        (f"http://{host}/a{d}/", f"{prose} variant beta", messy_canon),
        (f"http://{host}/c", f"standalone page p{d % 7} content ref{salt}", None),
    ]
    if d % 3 == 0:
        captures.append(
            (
                f"http://evil{d % 7}.example/steal",
                f"stolen copy s{d % 5} text ref{salt}",
                messy_canon,
            )
        )
    if d % 4 == 1:
        twin = f"twin body t{d % 9} words ref{salt}"
        captures.append((f"http://{host}/t1", twin, None))
        captures.append((f"http://{host}/t2", twin, None))
    recs: list[bytes] = []
    info = b"software: danae-spark/1.0\r\nformat: WARC File Format 1.1\r\n"
    recs.append(_record("warcinfo", d * 100, info, {"Content-Type": "application/warc-fields"}))
    for k, (uri, body_text, canon) in enumerate(captures):
        link = f'<link rel="canonical" href="{canon}">' if canon else ""
        html = (
            f"<html><head>{link}<title>K{d % 10}</title></head>"
            f"<body><p>{body_text}</p></body></html>"
        ).encode("utf-8")
        resp = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" + html
        recs.append(
            _record(
                "response",
                d * 100 + k + 1,
                resp,
                {"WARC-Target-URI": uri, "Content-Type": "application/http;msgtype=response"},
            )
        )
    if d % 2 == 1:
        return b"".join(_gzip_member(r) for r in recs)
    return b"".join(recs)


def crawl_curate_canonical_roundtrip(spark, sf_dir: str):
    """Curation dedup keyed on rel=canonical (r14 — the r12 gap: the
    canonical link was extracted by C70 and canonicalized by C69 but
    nothing USED it to dedup): cluster key = the canonicalized
    rel=canonical target WHEN the page declares one AND its
    registrable domain matches the capture URL's (the lying-canonical
    guard — a page on evil.example claiming canonical on site.example
    must not be allowed to join, or to eject, the genuine cluster);
    otherwise fall back to the text hash. Byte-DIFFERENT captures of
    one logical page (tracking-param and trailing-slash variants)
    cluster through the canonical; byte-identical no-canonical twins
    still cluster through the text fallback. Keeper = smallest
    page_id, via the two-phase exact_dup_keeper over the fused key
    (groupBy + join — no text-hash window).

    Scale shape: extraction is stateless Arrow mapInPandas; the guard
    and key are row-wise codegen (registrable_domain — regexp/split
    expressions, no UDF); clustering is the skew-safe two-phase
    keeper. One shuffle on the 8-byte key hash."""
    from danae_spark.catalog import load_table
    from danae_spark.multimodal.htmltext import parse_html_meta, parse_html_text
    from danae_spark.operators.dedup import exact_dup_keeper
    from danae_spark.operators.urlops import registrable_domain
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped
    from pyspark.sql import functions as F

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                for k, (uri, _status, ctype, body) in enumerate(
                    iter_warc_responses(synth_canon_warc(d))
                ):
                    ext = parse_html_text(body, content_type_charset(ctype))
                    meta = parse_html_meta(body)
                    if ext is None or meta is None:
                        continue
                    rows.append(
                        {
                            "page_id": d * 8 + k,
                            "doc_id": d,
                            "url": uri,
                            "canonical": meta["canonical"],
                            "text": ext["text"],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["page_id", "doc_id", "url", "canonical", "text"]
            )

    pages = docs.repartition(stage_parallelism(docs.sparkSession), "doc_id").mapInPandas(
        batches,
        schema="page_id bigint, doc_id bigint, url string, canonical string, text string",
    )
    guard_ok = F.col("canonical").isNotNull() & (
        registrable_domain("url") == registrable_domain("canonical")
    )
    keyed = pages.select(
        "page_id",
        "doc_id",
        "url",
        "canonical",
        guard_ok.cast("int").alias("canonical_used"),
        F.when(guard_ok, F.concat(F.lit("c:"), F.col("canonical")))
        .otherwise(F.concat(F.lit("t:"), F.xxhash64("text").cast("string")))
        .alias("__key"),
    )
    return (
        exact_dup_keeper(keyed, text_col="__key")
        .drop("__key")
        .withColumn("keep", F.col("is_keeper"))
        .orderBy("page_id")
    )


def _crawl_curate_canonical_oracle() -> str:
    # the text-hash fallback key clusters on text EQUALITY, so the
    # oracle keys on the text itself — identical clustering, no
    # xxhash64 needed DuckDB-side
    return """
WITH d0 AS (
  SELECT doc_id,
         translate(CAST(doc_id AS VARCHAR), '0123456789', 'abcdefghij') AS salt,
         'site' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS host,
         'http://site' || CAST(doc_id % 5 AS VARCHAR) || '.example/a'
           || CAST(doc_id AS VARCHAR) AS canon
  FROM documents
),
pages AS (
  SELECT doc_id * 8 + 0 AS page_id, doc_id,
         canon || '?utm_source=feed' AS url,
         canon AS canonical, 1 AS canonical_used, 'c:' || canon AS key
  FROM d0
  UNION ALL
  SELECT doc_id * 8 + 1, doc_id, canon || '/', canon, 1, 'c:' || canon
  FROM d0
  UNION ALL
  SELECT doc_id * 8 + 2, doc_id, 'http://' || host || '/c',
         NULL, 0,
         't:standalone page p' || CAST(doc_id % 7 AS VARCHAR)
           || ' content ref' || salt
  FROM d0
  UNION ALL
  SELECT doc_id * 8 + 3, doc_id,
         'http://evil' || CAST(doc_id % 7 AS VARCHAR) || '.example/steal',
         canon, 0,
         't:stolen copy s' || CAST(doc_id % 5 AS VARCHAR) || ' text ref' || salt
  FROM d0 WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id * 8 + CASE t.t WHEN 0 THEN CASE WHEN doc_id % 3 = 0 THEN 4 ELSE 3 END
                               ELSE CASE WHEN doc_id % 3 = 0 THEN 5 ELSE 4 END END,
         doc_id,
         'http://' || host || '/t' || CAST(t.t + 1 AS VARCHAR),
         NULL, 0,
         't:twin body t' || CAST(doc_id % 9 AS VARCHAR) || ' words ref' || salt
  FROM d0, generate_series(0, 1) t(t) WHERE doc_id % 4 = 1
)
SELECT page_id, doc_id, url, canonical, canonical_used,
       CAST(count(*) OVER (PARTITION BY key) AS INT) AS n_dup,
       CAST(row_number() OVER (PARTITION BY key ORDER BY page_id) = 1
            AS INT) AS is_keeper,
       CAST(row_number() OVER (PARTITION BY key ORDER BY page_id) = 1
            AS INT) AS keep
FROM pages ORDER BY page_id
"""


# -------------------- wire-coding census with brotli (r14, C96)

# the full wire-coding rotation: name, decodable by this engine
_CODING_GRID = [
    ("identity", 1),
    ("chunked", 1),
    ("gzip", 1),
    ("gzip+chunked", 1),
    ("br", 1),             # RFC 7932 stored-mode (brotlistream.py)
    ("br+chunked", 1),
    ("br-q5", 1),          # entropy-coded brotli, reference encoder q5
    ("br-q11", 1),         # q11: context modeling + static dictionary
    ("br-trunc", 0),       # truncated brotli: rejected, and COUNTED
    ("zstd", 1),           # RFC 8878 Raw-block frames (zstdstream.py)
    ("zstd-q3", 1),        # entropy-coded zstd (FSE/Huffman), ref encoder
    ("zstd-q19", 1),       # high level: 4-stream Huffman + FSE tables
    ("zstd-corrupt", 0),   # checksum mismatch: rejected, and COUNTED
    ("gzip-corrupt", 0),   # truncated gzip: decoder error, counted
]


def coding_page_text(d: int) -> str:
    return f"coding census page words w{d % 9} body"


def synth_coding_warc(doc_id: int, coding_ix: int) -> bytes:
    """One WARC per (doc, coding) carrying the doc's page under wire
    coding _CODING_GRID[coding_ix]: identity / chunked / gzip /
    gzip-in-chunked / brotli (stored-mode) / brotli-in-chunked /
    entropy-coded brotli at q5 and q11 from the REFERENCE encoder
    (r15 — decoded by the from-spec brotlicodec.py; q11 exercises
    context modeling and the static dictionary) / truncated brotli
    (reject counted) / zstd (RFC 8878 Raw-block frame, real XXH64
    checksum) / zstd with a flipped content byte (the checksum must
    catch it — the reject the census must COUNT, not hide) /
    truncated gzip (corruption). One
    coding per FILE because the WARC walk is deliberately
    reject-whole: an undecodable response rejects its file, which is
    exactly the per-coding verdict the census counts. Gzip
    member-per-record on odd docs."""
    from danae_spark.multimodal.brotlistream import brotli_store
    from danae_spark.multimodal.zstdstream import zstd_store

    d = doc_id
    host = f"site{d % 5}.example"
    html = (
        f"<html><head><title>C{d % 10}</title></head>"
        f"<body><p>{coding_page_text(d)}</p></body></html>"
    ).encode("utf-8")
    recs: list[bytes] = []
    info = b"software: danae-spark/1.0\r\nformat: WARC File Format 1.1\r\n"
    recs.append(_record("warcinfo", d * 100, info, {"Content-Type": "application/warc-fields"}))
    head = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
    body = html
    coding = _CODING_GRID[coding_ix][0]
    if coding == "chunked":
        body = chunk_body(body)
        head += b"Transfer-Encoding: chunked\r\n"
    elif coding == "gzip":
        body = gzip_body(body)
        head += b"Content-Encoding: gzip\r\n"
    elif coding == "gzip+chunked":
        body = chunk_body(gzip_body(body))
        head += b"Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n"
    elif coding == "br":
        body = brotli_store(body)
        head += b"Content-Encoding: br\r\n"
    elif coding == "br+chunked":
        body = chunk_body(brotli_store(body))
        head += b"Content-Encoding: br\r\nTransfer-Encoding: chunked\r\n"
    elif coding in ("br-q5", "br-q11"):
        # ENTROPY-CODED brotli from the reference encoder (pyarrow's
        # bundled brotli) — decoded by the from-spec RFC 7932 decoder
        # (brotlicodec.py); q11 streams exercise context modeling and
        # static-dictionary references on this page text
        import pyarrow as pa

        q = 5 if coding == "br-q5" else 11
        body = pa.Codec("brotli", compression_level=q).compress(
            body, asbytes=True
        )
        head += b"Content-Encoding: br\r\n"
    elif coding == "br-trunc":
        import pyarrow as pa

        blob = pa.Codec("brotli", compression_level=5).compress(
            body, asbytes=True
        )
        body = blob[: max(1, len(blob) - 3)]  # truncated: reject-whole
        head += b"Content-Encoding: br\r\n"
    elif coding == "zstd":
        body = zstd_store(body)
        head += b"Content-Encoding: zstd\r\n"
    elif coding in ("zstd-q3", "zstd-q19"):
        # ENTROPY-CODED zstd from the reference encoder — decoded by
        # the from-spec RFC 8878 decoder (zstdcodec.py: FSE tables,
        # Huffman literals, sequence execution)
        import pyarrow as pa

        lvl = 3 if coding == "zstd-q3" else 19
        body = pa.Codec("zstd", compression_level=lvl).compress(
            body, asbytes=True
        )
        head += b"Content-Encoding: zstd\r\n"
    elif coding == "zstd-corrupt":
        blob = bytearray(zstd_store(body))
        blob[20] ^= 0xFF  # flip a content byte: XXH64 must catch it
        body = bytes(blob)
        head += b"Content-Encoding: zstd\r\n"
    elif coding == "gzip-corrupt":
        body = gzip_body(body)[:-4]  # truncated: CRC/length gone
        head += b"Content-Encoding: gzip\r\n"
    uri = f"http://{host}/w{coding_ix}"
    recs.append(
        _record(
            "response",
            d * 100 + coding_ix + 1,
            head + b"\r\n" + body,
            {"WARC-Target-URI": uri, "Content-Type": "application/http;msgtype=response"},
        )
    )
    if d % 2 == 1:
        return b"".join(_gzip_member(r) for r in recs)
    return b"".join(recs)


def crawl_codings_census_roundtrip(spark, sf_dir: str):
    """Per-coding crawl visibility (r14 — the r12 'br loss is
    invisible' directive, upgraded: br now DECODES via the RFC 7932
    stored-mode path, and what still can't decode is COUNTED instead
    of silently dropped): walk the coding-grid WARCs, attempt the full
    HTTP decode for every response, and report per wire coding the
    pages shipped, pages decoded, pages rejected, and the reject rate.
    A decode regression in ANY coding path (chunked framing, gzip,
    brotli, the zstd reject, the corrupt-gzip reject) moves a count.

    Scale shape: stateless Arrow mapInPandas (decode is per-record,
    no state), one map-side-combined groupBy on an 8-value key."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped
    from pyspark.sql import functions as F

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    names = [c for c, _ in _CODING_GRID]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                want = coding_page_text(d).encode("utf-8")
                for k, name in enumerate(names):
                    ok = 0
                    for _uri, _status, _ctype, body in iter_warc_responses(
                        synth_coding_warc(d, k)
                    ):
                        if want in body:
                            ok = 1
                    rows.append({"coding": name, "decoded": ok})
            yield pd.DataFrame(rows, columns=["coding", "decoded"])

    per = docs.repartition(stage_parallelism(docs.sparkSession), "doc_id").mapInPandas(
        batches, schema="coding string, decoded int"
    )
    return (
        per.groupBy("coding")
        .agg(
            F.count("*").cast("long").alias("n_shipped"),
            F.sum("decoded").cast("long").alias("n_decoded"),
            (F.count("*") - F.sum("decoded")).cast("long").alias("n_rejected"),
            F.round(1.0 - F.sum("decoded") / F.count("*"), 6).alias("reject_rate"),
        )
        .orderBy("coding")
    )


def _crawl_codings_census_oracle() -> str:
    rows = ", ".join(f"('{c}', {dec})" for c, dec in _CODING_GRID)
    return f"""
WITH grid AS (SELECT * FROM (VALUES {rows}) g(coding, dec)),
n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents)
SELECT g.coding,
       n.nd AS n_shipped,
       CAST(g.dec * n.nd AS BIGINT) AS n_decoded,
       CAST((1 - g.dec) * n.nd AS BIGINT) AS n_rejected,
       CAST(ROUND(1.0 - g.dec, 6) AS DOUBLE) AS reject_rate
FROM grid g, n
ORDER BY g.coding
"""


# ------------- boilerplate x rank-weighted curation (r14, C97)


def crawl_curate_boiler_ranked_roundtrip(spark, sf_dir: str):
    """The composition a real pipeline actually runs (r12 directive
    #7, shipped r14): per-BLOCK boilerplate stripping AND link-graph
    rank-weighted keeping in ONE certified plan. The boiler grid's
    mirror captures carry DIFFERENT link-farm bytes, so clustering is
    only possible AFTER the block rule strips them; docs with
    doc_id % 10 == 3 additionally have their stripped prose
    SYNDICATED to doc d+1's site (the cross-site duplicate shape),
    so each such cluster spans TWO source docs with different
    pageranks and the rank-weighted keeper makes a real decision —
    the authoritative copy keeps, not whichever page_id is smaller.

    Scale shape: extraction is stateless Arrow mapInPandas; the rank
    join is a broadcast-size dimension at test SF and a hash join on
    doc_id at crawl scale; the keeper is the two-phase groupBy+join
    (no window over the text hash); quality is one scan + one gram
    join."""
    from danae_spark.catalog import load_table
    from danae_spark.multimodal.htmltext import parse_html_text
    from danae_spark.operators.dedup import exact_dup_keeper
    from danae_spark.operators.frontier import pagerank_roundtrip
    from danae_spark.operators.textstats import quality_filter_frame
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped
    from pyspark.sql import functions as F

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                for k, (uri, _status, ctype, body) in enumerate(
                    iter_warc_responses(synth_boiler_warc(d))
                ):
                    ext = parse_html_text(
                        body, content_type_charset(ctype), drop_boilerplate=True
                    )
                    if ext is None:
                        continue
                    rows.append(
                        {
                            "page_id": d * 2 + k,
                            "doc_id": d,
                            "url": uri,
                            "text": ext["text"],
                            "n_blocks_dropped": ext["n_blocks_dropped"],
                        }
                    )
                    if k == 1:
                        # the stripped prose REPUBLISHED on doc d+1's
                        # site (syndication): same post-strip text,
                        # different source doc -> different rank
                        rows.append(
                            {
                                "page_id": d * 2 + _MIRROR_OFF,
                                "doc_id": d + 1,
                                "url": f"http://site{(d + 1) % 5}.example/synd{d}",
                                "text": ext["text"],
                                "n_blocks_dropped": ext["n_blocks_dropped"],
                            }
                        )
            yield pd.DataFrame(
                rows, columns=["page_id", "doc_id", "url", "text", "n_blocks_dropped"]
            )

    pages = docs.repartition(stage_parallelism(docs.sparkSession), "doc_id").mapInPandas(
        batches,
        schema="page_id bigint, doc_id bigint, url string, text string, "
        "n_blocks_dropped int",
    )
    ranks = pagerank_roundtrip(spark, sf_dir).withColumnRenamed("node", "doc_id")
    pages = pages.join(ranks, "doc_id").persist()  # drops edge-of-corpus synd
    q = quality_filter_frame(
        pages.select(F.col("page_id").alias("doc_id"), "text"),
        min_quality=CRAWL_BOILER_MIN_Q,
        order=False,
    ).select(F.col("doc_id").alias("page_id"), F.col("keep").alias("quality_keep"))
    dup = exact_dup_keeper(
        pages.select("page_id", "doc_id", "url", "rank", "n_blocks_dropped", "text"),
        rank_col="rank",
    ).select(
        "page_id", "doc_id", "url", "rank", "n_blocks_dropped", "n_dup", "is_keeper"
    )
    return (
        dup.join(q, "page_id")
        .select(
            "page_id",
            "doc_id",
            "url",
            "rank",
            "n_blocks_dropped",
            "n_dup",
            "is_keeper",
            "quality_keep",
            (
                (F.col("is_keeper") == 1) & (F.col("quality_keep") == 1)
            ).cast("int").alias("keep"),
        )
        .orderBy("page_id")
    )


def _crawl_curate_boiler_ranked_oracle() -> str:
    from danae_spark.multimodal.htmltext import boiler_text_sql
    from danae_spark.operators.frontier import pagerank_ctes
    from danae_spark.operators.textstats import quality_filter_oracle

    return f"""
WITH {pagerank_ctes()},
bx AS ({boiler_text_sql("SELECT doc_id, doc_id AS e FROM documents")}),
pg0 AS (
  -- m=0 main, m=1 the m.-mirror (both of mirrored docs only when m=1),
  -- m=2 the SYNDICATED stripped prose on doc d+1's site
  SELECT CASE WHEN m.m = 2 THEN doc_id + 1 ELSE doc_id END AS src_doc,
         doc_id * 2 + CASE m.m WHEN 2 THEN {_MIRROR_OFF} ELSE m.m END AS page_id,
         CASE m.m
           WHEN 0 THEN 'http://site' || CAST(doc_id % 5 AS VARCHAR) || '.example/b'
           WHEN 1 THEN 'http://m.site' || CAST(doc_id % 5 AS VARCHAR) || '.example/b'
           ELSE 'http://site' || CAST((doc_id + 1) % 5 AS VARCHAR)
                || '.example/synd' || CAST(doc_id AS VARCHAR)
         END AS url,
         CAST(2 AS INT) AS n_blocks_dropped,
         text
  FROM bx, generate_series(0, 2) m(m)
  WHERE m.m = 0 OR doc_id % 10 = 3
),
pg AS (
  SELECT pg0.*, pr.rank AS rank
  FROM pg0 JOIN pr ON pg0.src_doc = pr.node
),
pgq AS (SELECT page_id AS doc_id, text, 'en' AS lang FROM pg),
q AS (
  SELECT doc_id AS page_id, keep AS quality_keep
  FROM ({quality_filter_oracle(min_quality=CRAWL_BOILER_MIN_Q, source="pgq")})
),
dup AS (
  SELECT page_id,
         CAST(count(*) OVER (PARTITION BY text) AS INT) AS n_dup,
         CAST(row_number() OVER (PARTITION BY text
                                 ORDER BY rank DESC, page_id) = 1
              AS INT) AS is_keeper
  FROM pg
)
SELECT pg.page_id, pg.src_doc AS doc_id, pg.url, pg.rank,
       pg.n_blocks_dropped, dup.n_dup, dup.is_keeper, q.quality_keep,
       CAST(dup.is_keeper = 1 AND q.quality_keep = 1 AS INT) AS keep
FROM pg JOIN dup USING (page_id) JOIN q USING (page_id)
ORDER BY pg.page_id
"""


# --------------- robots-compliance-gated curation (r14, C99)


def synth_robots_curate(doc_id: int) -> bytes:
    """robots.txt served by the curate grid's hosts: the '*' group
    disallows exactly ONE real page path per doc (/p{d%3} — always in
    the doc's page range since n_pages = 1 + d%3), carries the
    Crawl-delay, and a strictbot full-disallow group — so the RFC 9309
    evaluator genuinely discriminates inside the curate composition."""
    d = doc_id
    return (
        "User-agent: *\n"
        f"Disallow: /p{d % 3}\n"
        f"Crawl-delay: {1 + d % 5}\n"
        "\n"
        "User-agent: strictbot\n"
        "Disallow: /\n"
    ).encode("utf-8")


def crawl_curate_robots_roundtrip(spark, sf_dir: str):
    """COMPLIANCE-gated curation (r14) — the lawful-crawler
    configuration: every capture of the curate grid (mirrors included)
    is evaluated against its doc's robots.txt through the certified
    RFC 9309 evaluator (operators/robots.py parse_robots +
    robots_allowed: group selection, longest-match precedence,
    prefix/wildcard rules), and the keep decision becomes
    allowed AND exact-dup keeper — a disallowed page can neither ship
    NOR keep a cluster (a compliant pipeline must act as if it never
    fetched it, so its duplicates resolve to an ALLOWED keeper when
    one exists). Crawl-delay is carried per row (the fetch scheduler's
    input).

    Scale shape: robots evaluation rides the SAME stateless Arrow
    mapInPandas as extraction (robots bytes are per-doc, parsed once
    per row group); the keeper is the two-phase groupBy+join over
    allowed captures only; no collects, no cartesians."""
    from danae_spark.operators.dedup import exact_dup_keeper
    from danae_spark.operators.robots import parse_robots, robots_allowed
    from pyspark.sql import functions as F

    pages = _curate_pages(spark, sf_dir)

    def verdicts(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, dict] = {}
        for pdf in it:
            rows = []
            for page_id, doc_id, url in zip(
                pdf["page_id"], pdf["doc_id"], pdf["url"]
            ):
                d = int(doc_id)
                r = cache.get(d)
                if r is None:
                    r = parse_robots(synth_robots_curate(d))
                    cache[d] = r
                path = "/" + url.rsplit("/", 1)[1]
                allowed, delay = robots_allowed(r, "danaebot", path)
                rows.append(
                    {
                        "page_id": int(page_id),
                        "path": path,
                        "allowed": 1 if allowed else 0,
                        "crawl_delay": delay,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["page_id", "path", "allowed", "crawl_delay"]
            )

    rv = pages.select("page_id", "doc_id", "url").mapInPandas(
        verdicts, schema="page_id bigint, path string, allowed int, crawl_delay int"
    )
    joined = pages.join(rv, "page_id")
    # dedup over ALLOWED captures only: a disallowed page must not be
    # the keeper of a cluster that has a compliant member
    dup = exact_dup_keeper(
        joined.filter(F.col("allowed") == 1).select("page_id", "text")
    ).select("page_id", "n_dup", "is_keeper")
    return (
        joined.join(dup, "page_id", "left")
        .select(
            "page_id",
            "doc_id",
            "path",
            "allowed",
            "crawl_delay",
            F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
            F.coalesce("is_keeper", F.lit(0)).alias("is_keeper"),
            (
                (F.col("allowed") == 1) & (F.coalesce("is_keeper", F.lit(0)) == 1)
            ).cast("int").alias("keep"),
        )
        .orderBy("page_id")
    )


def _crawl_curate_robots_oracle() -> str:
    from danae_spark.multimodal.htmltext import html_text_sql

    ok_pages = """
SELECT d.doc_id, d.doc_id * 4 + p.p AS e
FROM documents d, generate_series(0, 2) p(p)
WHERE p.p < 1 + d.doc_id % 3 AND (d.doc_id + p.p) % 5 <> 4
"""
    return f"""
WITH hx AS ({html_text_sql(ok_pages)}),
pg AS (
  SELECT doc_id AS src_doc,
         e + CASE WHEN m.m = 1 THEN {_MIRROR_OFF} ELSE 0 END AS page_id,
         '/p' || CAST(e - doc_id * 4 AS VARCHAR) AS path,
         CAST(e - doc_id * 4 <> doc_id % 3 AS INT) AS allowed,
         CAST(1 + doc_id % 5 AS INT) AS crawl_delay,
         text
  FROM hx, generate_series(0, 1) m(m)
  WHERE m.m = 0 OR doc_id % 10 = 3
),
dup AS (
  SELECT page_id,
         CAST(count(*) OVER (PARTITION BY text) AS INT) AS n_dup,
         CAST(row_number() OVER (PARTITION BY text ORDER BY page_id) = 1
              AS INT) AS is_keeper
  FROM pg WHERE allowed = 1
)
SELECT pg.page_id, pg.src_doc AS doc_id, pg.path, pg.allowed,
       pg.crawl_delay,
       COALESCE(dup.n_dup, 0) AS n_dup,
       COALESCE(dup.is_keeper, 0) AS is_keeper,
       CAST(pg.allowed = 1 AND COALESCE(dup.is_keeper, 0) = 1 AS INT) AS keep
FROM pg LEFT JOIN dup USING (page_id)
ORDER BY pg.page_id
"""


# ------------------- composed crawl health report (r14, C100)


def crawl_report_full_roundtrip(spark, sf_dir: str):
    """The FULL crawl health report (r14): ONE row joining the
    verdicts of four certified families — curation (pages, domains,
    dup/quality/cap survival, final keep rate), robots compliance
    (captures a lawful crawler must discard), wire codings (responses
    lost to undecodable encodings), and language composition (distinct
    predicted languages among shipped pages). The operator a pipeline
    owner reads FIRST each crawl cycle; every number re-derives from
    a registered oracle-certified subplan, so the report can never
    disagree with the row-level entries.

    Scale shape: four independent aggregates (each one map-side-
    combined groupBy/agg over its certified plan) cross-joined at one
    row each — the crossJoins are literal 1x1."""
    from danae_spark.operators.langid import crawl_lang_report
    from pyspark.sql import functions as F

    cur = crawl_curate_roundtrip(spark, sf_dir).agg(
        F.count("*").alias("n_pages"),
        F.countDistinct("domain").alias("n_domains"),
        F.sum((F.col("n_dup") > 1).cast("int")).alias("n_in_dup_cluster"),
        F.sum(F.col("quality_keep")).alias("n_quality_pass"),
        F.sum(F.col("keep")).alias("n_kept"),
        F.round(F.sum(F.col("keep")) / F.count("*"), 6).alias("keep_rate"),
    )
    rob = crawl_curate_robots_roundtrip(spark, sf_dir).agg(
        F.sum(1 - F.col("allowed")).alias("n_disallowed"),
        F.round(F.sum(F.col("allowed")) / F.count("*"), 6).alias("allowed_rate"),
    )
    cod = crawl_codings_census_roundtrip(spark, sf_dir).agg(
        F.sum("n_rejected").alias("n_coding_rejects"),
        F.sum("n_decoded").alias("n_coding_decoded"),
    )
    lng = crawl_lang_report(spark, sf_dir).agg(
        F.count("*").cast("long").alias("n_languages"),
        F.sum("n_pages").alias("n_lang_pages"),
    )
    return cur.crossJoin(rob).crossJoin(cod).crossJoin(lng)


def _crawl_report_full_oracle() -> str:
    from danae_spark.operators.langid import crawl_lang_report_oracle

    return f"""
WITH cur AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pages,
         CAST(count(DISTINCT domain) AS BIGINT) AS n_domains,
         CAST(sum(CASE WHEN n_dup > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_in_dup_cluster,
         CAST(sum(quality_keep) AS BIGINT) AS n_quality_pass,
         CAST(sum(keep) AS BIGINT) AS n_kept,
         ROUND(sum(keep) * 1.0 / count(*), 6) AS keep_rate
  FROM ({_crawl_curate_oracle()})
),
rob AS (
  SELECT CAST(sum(1 - allowed) AS BIGINT) AS n_disallowed,
         ROUND(sum(allowed) * 1.0 / count(*), 6) AS allowed_rate
  FROM ({_crawl_curate_robots_oracle()})
),
cod AS (
  SELECT CAST(sum(n_rejected) AS BIGINT) AS n_coding_rejects,
         CAST(sum(n_decoded) AS BIGINT) AS n_coding_decoded
  FROM ({_crawl_codings_census_oracle()})
),
lng AS (
  SELECT CAST(count(*) AS BIGINT) AS n_languages,
         CAST(sum(n_pages) AS BIGINT) AS n_lang_pages
  FROM ({crawl_lang_report_oracle()})
)
SELECT cur.*, rob.*, cod.*, lng.* FROM cur, rob, cod, lng
"""


# --------------- near-duplicate curation (r14, C101)

NEARDUP_TAU = 0.5
_NEARDUP_WORDS = 40


def neardup_page_text(doc_id: int, mirror: bool = False) -> str:
    """Arithmetic prose with PROVABLY disjoint cross-doc vocabulary
    (token ranges [50d, 50d+39] never intersect across docs, so zero
    cross-doc shingles by construction) — the mirror capture appends a
    short syndication footer, so the two captures are NEAR-dups
    (Jaccard ~0.93), not exact: the cluster shape ONLY fuzzy dedup can
    catch."""
    d = doc_id
    words = [f"w{d * 50 + i}" for i in range(_NEARDUP_WORDS)]
    text = " ".join(words)
    if mirror:
        text += " mirrored copy notice"
    return text


def synth_neardup_warc(doc_id: int) -> bytes:
    """One main capture per doc; docs with doc_id % 10 == 3 add an
    m.-subdomain mirror whose body differs by the footer sentence.
    Gzip member-per-record on odd docs."""
    d = doc_id
    host = f"site{d % 5}.example"
    captures = [(f"http://{host}/n0", neardup_page_text(d))]
    if d % 10 == 3:
        captures.append((f"http://m.{host}/n0", neardup_page_text(d, mirror=True)))
    recs: list[bytes] = []
    info = b"software: danae-spark/1.0\r\nformat: WARC File Format 1.1\r\n"
    recs.append(_record("warcinfo", d * 100, info, {"Content-Type": "application/warc-fields"}))
    for k, (uri, body_text) in enumerate(captures):
        html = (
            f"<html><head><title>N{d % 10}</title></head>"
            f"<body><p>{body_text}</p></body></html>"
        ).encode("utf-8")
        resp = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" + html
        recs.append(
            _record(
                "response",
                d * 100 + k + 1,
                resp,
                {"WARC-Target-URI": uri, "Content-Type": "application/http;msgtype=response"},
            )
        )
    if d % 2 == 1:
        return b"".join(_gzip_member(r) for r in recs)
    return b"".join(recs)


def crawl_curate_neardup_roundtrip(spark, sf_dir: str):
    """NEAR-duplicate curation (r14): the dedup stage a fuzzy-dedup
    pipeline (RefinedWeb/C4-class) actually runs — mirror captures
    whose bytes DIFFER by a syndication footer cluster through n-gram
    Jaccard (certified ngram_jaccard_pairs: df-capped shingle
    inverted-index join + exact verify), while the exact-hash keeper
    sees every page as unique (the exact_n_dup column carries that
    proof). Keeper = smallest page_id of the near-dup cluster (the
    fixture's clusters are capture pairs); keep = is_keeper.

    Scale shape: extraction is stateless Arrow mapInPandas; the
    near-dup stage is the registered-certified shingle join (per-
    shingle fan-out bounded by the df cap); the exact twin is the
    two-phase keeper. No windows over text, no cartesians."""
    from danae_spark.catalog import load_table
    from danae_spark.multimodal.htmltext import parse_html_text
    from danae_spark.operators.dedup import exact_dup_keeper, ngram_jaccard_pairs
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped
    from pyspark.sql import functions as F

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                for k, (uri, _status, ctype, body) in enumerate(
                    iter_warc_responses(synth_neardup_warc(d))
                ):
                    ext = parse_html_text(body, content_type_charset(ctype))
                    if ext is None:
                        continue
                    rows.append(
                        {"page_id": d * 2 + k, "doc_id": d, "url": uri, "text": ext["text"]}
                    )
            yield pd.DataFrame(rows, columns=["page_id", "doc_id", "url", "text"])

    pages = docs.repartition(stage_parallelism(docs.sparkSession), "doc_id").mapInPandas(
        batches, schema="page_id bigint, doc_id bigint, url string, text string"
    )
    pages = pages.persist()  # feeds the near-dup, exact, and output branches
    pairs = ngram_jaccard_pairs(
        pages.select("page_id", "text"), tau=NEARDUP_TAU, id_col="page_id"
    )
    touch = pairs.select(
        F.col("d1").alias("page_id"), F.col("d2").alias("other"), "jaccard"
    ).unionByName(
        pairs.select(F.col("d2").alias("page_id"), F.col("d1").alias("other"), "jaccard")
    )
    agg = touch.groupBy("page_id").agg(
        F.count("*").cast("int").alias("n_near"),
        F.min("other").alias("__min_other"),
        F.max("jaccard").alias("j_max"),
    )
    exact = exact_dup_keeper(pages.select("page_id", "text")).select(
        "page_id", F.col("n_dup").alias("exact_n_dup")
    )
    return (
        pages.select("page_id", "doc_id", "url")
        .join(agg, "page_id", "left")
        .join(exact, "page_id")
        .select(
            "page_id",
            "doc_id",
            "url",
            F.coalesce("n_near", F.lit(0)).alias("n_near"),
            "j_max",
            "exact_n_dup",
            (
                F.col("page_id")
                <= F.coalesce(F.col("__min_other"), F.col("page_id"))
            ).cast("int").alias("is_keeper"),
            (
                F.col("page_id")
                <= F.coalesce(F.col("__min_other"), F.col("page_id"))
            ).cast("int").alias("keep"),
        )
        .orderBy("page_id")
    )


def _crawl_curate_neardup_oracle() -> str:
    from danae_spark.operators.dedup import ngram_jaccard_oracle

    words = (
        f"array_to_string(list_transform(range(0, {_NEARDUP_WORDS}),"
        " i -> 'w' || CAST(doc_id * 50 + i AS VARCHAR)), ' ')"
    )
    return f"""
WITH pg AS (
  SELECT doc_id * 2 AS page_id, doc_id,
         'http://site' || CAST(doc_id % 5 AS VARCHAR) || '.example/n0' AS url,
         {words} AS text
  FROM documents
  UNION ALL
  SELECT doc_id * 2 + 1, doc_id,
         'http://m.site' || CAST(doc_id % 5 AS VARCHAR) || '.example/n0',
         {words} || ' mirrored copy notice'
  FROM documents WHERE doc_id % 10 = 3
),
pgsrc AS (SELECT page_id AS doc_id, text FROM pg),
pairs AS ({ngram_jaccard_oracle(source="pgsrc", tau=NEARDUP_TAU)}),
touch AS (
  SELECT d1 AS page_id, d2 AS other, jaccard FROM pairs
  UNION ALL
  SELECT d2, d1, jaccard FROM pairs
),
agg AS (
  SELECT page_id, CAST(count(*) AS INT) AS n_near,
         min(other) AS min_other, max(jaccard) AS j_max
  FROM touch GROUP BY page_id
),
ex AS (
  SELECT page_id, CAST(count(*) OVER (PARTITION BY text) AS INT) AS exact_n_dup
  FROM pg
)
SELECT pg.page_id, pg.doc_id, pg.url,
       COALESCE(agg.n_near, 0) AS n_near,
       agg.j_max,
       ex.exact_n_dup,
       CAST(pg.page_id <= COALESCE(agg.min_other, pg.page_id) AS INT)
         AS is_keeper,
       CAST(pg.page_id <= COALESCE(agg.min_other, pg.page_id) AS INT) AS keep
FROM pg LEFT JOIN agg USING (page_id) JOIN ex USING (page_id)
ORDER BY pg.page_id
"""


# ------------------------ cross-snapshot crawl diff (two dated dumps)


def _snapshot_pages(d: int, snap: int) -> list[tuple[int, int]]:
    """(page p, html seed e) inventory of snapshot `snap` for site-doc
    d — the grid _SNAPSHOT_DIFF_ORACLE restates: snapshot A holds pages
    p < 1 + d%3 at e = d*16 + 2p; in snapshot B the (d+p)%4==1 pages
    are GONE, the (d+p)%4==0 pages CHANGED content (e+1), even docs
    gained one page, the rest are byte-identical."""
    n_a = 1 + d % 3
    pages = [(p, d * 16 + 2 * p) for p in range(n_a)]
    if snap == 0:
        return pages
    out = []
    for p, e in pages:
        if (d + p) % 4 == 1:
            continue  # gone in B
        out.append((p, e + 1 if (d + p) % 4 == 0 else e))
    if d % 2 == 0:
        out.append((n_a, d * 16 + 2 * n_a))  # added in B
    return out


def synth_snapshot_warc(doc_id: int, snap: int) -> bytes:
    """One of two dated captures of a synthetic site: response records
    for the snapshot's page inventory (real HTML bodies, the usual
    identity/chunked/gzip wire rotation), gzip member-per-record on odd
    docs. URL namespace is per-doc (/d{d}/p{p}) so inventories key
    cleanly on (doc, url)."""
    from danae_spark.multimodal.htmltext import synth_html

    d = int(doc_id)
    host = f"site{d % 5}.example"
    recs = []
    for p, e in _snapshot_pages(d, snap):
        uri = f"http://{host}/d{d}/p{p}"
        resp = encode_200_response(synth_html(e), wire_encoding(d, p))
        recs.append(
            _record(
                "response",
                d * 1000 + snap * 100 + p,
                resp,
                {"WARC-Target-URI": uri, "Content-Type": "application/http;msgtype=response"},
            )
        )
    if d % 2 == 1:
        return b"".join(_gzip_member(r) for r in recs)
    return b"".join(recs)


def _snapshot_inventory(spark, sf_dir: str, snap: int):
    """(doc_id, url, digest) inventory of one snapshot: real WARC walk
    -> HTTP decode -> HTML text extraction -> md5 of the text (the
    payload digest a CDX line would carry)."""
    import hashlib

    from danae_spark.catalog import load_table
    from danae_spark.multimodal.htmltext import parse_html_text
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                for uri, status, ctype, body in iter_warc_responses(
                    synth_snapshot_warc(d, snap)
                ):
                    ext = parse_html_text(body, content_type_charset(ctype))
                    if status == 200 and ext is not None:
                        rows.append(
                            {
                                "doc_id": d,
                                "url": uri,
                                "digest": hashlib.md5(
                                    ext["text"].encode("utf-8")
                                ).hexdigest(),
                            }
                        )
            yield pd.DataFrame(rows, columns=["doc_id", "url", "digest"])

    return docs.repartition(stage_parallelism(docs.sparkSession), "doc_id").mapInPandas(
        batches, schema="doc_id bigint, url string, digest string"
    )


def crawl_snapshot_diff_roundtrip(spark, sf_dir: str):
    """Cross-snapshot crawl diff, oracle-certified end-to-end: both
    dated dumps are REAL WARC bytes walked by the real validator, page
    text comes through the real HTML extractor, digests are md5 of
    that text, and the verdicts come from the generic full-outer diff
    (operators/urlops.py snapshot_diff_frame). The oracle re-derives
    both inventories from the shared html_text_sql arithmetic and
    joins them the same way — the value hash covers every digest."""
    from danae_spark.operators.urlops import snapshot_diff_frame

    a = _snapshot_inventory(spark, sf_dir, 0)
    b = _snapshot_inventory(spark, sf_dir, 1)
    return snapshot_diff_frame(a, b, key_cols=("doc_id", "url")).orderBy(
        "doc_id", "url"
    )


def _snapshot_diff_oracle() -> str:
    from danae_spark.multimodal.htmltext import html_text_sql

    url = (
        "'http://site' || CAST(t.doc_id % 5 AS VARCHAR) || '.example/d'"
        " || CAST(t.doc_id AS VARCHAR) || '/p' || CAST(t.p AS VARCHAR)"
    )
    return f"""
WITH pa AS (
  SELECT d.doc_id, p.p, d.doc_id * 16 + 2 * p.p AS e
  FROM documents d, generate_series(0, 2) p(p)
  WHERE p.p < 1 + d.doc_id % 3
),
pb AS (
  SELECT doc_id, p,
         CASE WHEN (doc_id + p) % 4 = 0 THEN e + 1 ELSE e END AS e
  FROM pa WHERE (doc_id + p) % 4 <> 1
  UNION ALL
  SELECT doc_id, 1 + doc_id % 3 AS p,
         doc_id * 16 + 2 * (1 + doc_id % 3) AS e
  FROM documents WHERE doc_id % 2 = 0
),
xa AS ({html_text_sql("SELECT doc_id, e FROM pa")}),
xb AS ({html_text_sql("SELECT doc_id, e FROM pb")}),
sa AS (
  SELECT t.doc_id, {url} AS url, md5(x.text) AS digest_a
  FROM pa t JOIN xa x ON t.doc_id = x.doc_id AND t.e = x.e
),
sb AS (
  SELECT t.doc_id, {url} AS url, md5(x.text) AS digest_b
  FROM pb t JOIN xb x ON t.doc_id = x.doc_id AND t.e = x.e
)
SELECT COALESCE(sa.doc_id, sb.doc_id) AS doc_id,
       COALESCE(sa.url, sb.url) AS url,
       CASE WHEN sa.url IS NULL THEN 'added'
            WHEN sb.url IS NULL THEN 'gone'
            WHEN digest_a <> digest_b THEN 'changed'
            ELSE 'unchanged' END AS verdict,
       digest_a, digest_b
FROM sa FULL JOIN sb ON sa.doc_id = sb.doc_id AND sa.url = sb.url
ORDER BY doc_id, url
"""


SNAPSHOT_DIFF_ORACLE = _snapshot_diff_oracle()


# -------------------- sitemap-vs-crawl coverage audit (discovery gap)


def synth_coverage_sitemap(doc_id: int) -> bytes:
    """The sitemap a synth_warc(d) site WOULD publish, with a
    deterministic promise gap: it promises pages p < 2 + d%3 (one MORE
    than the crawl captured) but omits p=0 on d%4==2 docs (a page the
    crawl found that the sitemap never listed); lastmod on even p;
    gzip-wrapped on d%3==1 (the real decode path). Parsed back by the
    real sitemap parser — never by string matching."""
    d = int(doc_id)
    host = f"site{d % 5}.example"
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for p in range(2 + d % 3):
        if p == 0 and d % 4 == 2:
            continue
        out.append("  <url>")
        out.append(f"    <loc>http://{host}/p{p}</loc>")
        if p % 2 == 0:
            out.append(f"    <lastmod>2026-0{1 + (d + p) % 9}-15</lastmod>")
        out.append("  </url>")
    out.append("</urlset>")
    xml = "\n".join(out).encode("utf-8")
    if d % 3 == 1:
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        return c.compress(xml) + c.flush()
    return xml


def crawl_sitemap_coverage_roundtrip(spark, sf_dir: str):
    """Sitemap-vs-crawl coverage audit: every URL either promised by
    the site's sitemap, captured by the crawl, or both — the report
    that drives the next fetch plan (sitemap_only rows are the
    discovery backlog; crawl_only rows are pages the site no longer
    advertises). Both sides are real bytes through the real parsers
    (synth_warc -> WARC/HTTP walk; synth_coverage_sitemap -> the
    sitemap XML parser incl. its gzip path); the audit itself is one
    full-outer hash join on (doc, url) — no windows, AQE-skew-safe at
    a 100 TB crawl against a billion-loc sitemap table."""
    from danae_spark.catalog import load_table
    from danae_spark.operators.sitemap import _load_entries
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    par = stage_parallelism(spark)

    def cap_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                for uri, status, _ctype, _body in iter_warc_responses(synth_warc(d)):
                    rows.append({"doc_id": d, "url": uri, "status": status})
            yield pd.DataFrame(rows, columns=["doc_id", "url", "status"])

    def prom_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                got = _load_entries(synth_coverage_sitemap(d))
                if got is None:
                    continue
                _root, entries, _gz = got
                for e in entries:
                    rows.append(
                        {"doc_id": d, "url": e["loc"], "lastmod": e.get("lastmod")}
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "url", "lastmod"])

    cap = docs.repartition(par, "doc_id").mapInPandas(
        cap_batches, schema="doc_id bigint, url string, status int"
    )
    prom = docs.repartition(par, "doc_id").mapInPandas(
        prom_batches, schema="doc_id bigint, url string, lastmod string"
    )
    from pyspark.sql import functions as F

    joined = cap.join(
        prom.withColumn("lastmod_seen", F.lit(1)), on=["doc_id", "url"], how="full_outer"
    )
    return (
        joined.select(
            "doc_id",
            "url",
            F.coalesce("lastmod_seen", F.lit(0)).cast("int").alias("promised"),
            F.col("status").isNotNull().cast("int").alias("captured"),
            "status",
            "lastmod",
            F.when(F.col("status").isNull(), F.lit("sitemap_only"))
            .when(F.col("lastmod_seen").isNull(), F.lit("crawl_only"))
            .otherwise(F.lit("both"))
            .alias("verdict"),
        )
        .orderBy("doc_id", "url")
    )


SITEMAP_COVERAGE_ORACLE = """
WITH cap AS (
  SELECT d.doc_id, p.p,
         'http://site' || CAST(d.doc_id % 5 AS VARCHAR) || '.example/p'
           || CAST(p.p AS VARCHAR) AS url,
         CAST(CASE WHEN (d.doc_id + p.p) % 5 = 4 THEN 301 ELSE 200 END AS INT)
           AS status
  FROM documents d, generate_series(0, 2) p(p)
  WHERE p.p < 1 + d.doc_id % 3
),
prom AS (
  SELECT d.doc_id, p.p,
         'http://site' || CAST(d.doc_id % 5 AS VARCHAR) || '.example/p'
           || CAST(p.p AS VARCHAR) AS url,
         CASE WHEN p.p % 2 = 0
              THEN '2026-0' || CAST(1 + (d.doc_id + p.p) % 9 AS VARCHAR) || '-15'
         END AS lastmod
  FROM documents d, generate_series(0, 4) p(p)
  WHERE p.p < 2 + d.doc_id % 3 AND NOT (p.p = 0 AND d.doc_id % 4 = 2)
)
SELECT COALESCE(c.doc_id, s.doc_id) AS doc_id,
       COALESCE(c.url, s.url) AS url,
       CAST(s.url IS NOT NULL AS INT) AS promised,
       CAST(c.url IS NOT NULL AS INT) AS captured,
       c.status,
       s.lastmod,
       CASE WHEN c.url IS NULL THEN 'sitemap_only'
            WHEN s.url IS NULL THEN 'crawl_only'
            ELSE 'both' END AS verdict
FROM cap c FULL JOIN prom s ON c.doc_id = s.doc_id AND c.url = s.url
ORDER BY doc_id, url
"""


# ------------------- refetch plan from the cross-snapshot diff


def crawl_refetch_plan_roundtrip(spark, sf_dir: str):
    """What a recurring crawl does WITH the snapshot diff: plan the
    next dump's fetches. Every diffed URL gets a refetch priority —
    changed pages first (proven churn), gone pages next (one tombstone
    verification), then added (young pages churn more) and unchanged
    (slow refresh) — and a per-HOST politeness schedule: rank within
    host by (priority, url), fetch_at_s = (rank-1) * the host's crawl
    delay. The only wide operation beyond the diff's full-outer join
    is the per-host ranking window — politeness is inherently
    sequential per host, so that partitioning is the work itself, and
    host cardinality grows with the crawl (no degenerate partition).
    Composes the certified diff subplan verbatim."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    diff = crawl_snapshot_diff_roundtrip(spark, sf_dir)
    host = F.regexp_extract("url", r"^https?://([^/]+)", 1)
    priority = (
        F.when(F.col("verdict") == "changed", F.lit(0))
        .when(F.col("verdict") == "gone", F.lit(1))
        .when(F.col("verdict") == "added", F.lit(2))
        .otherwise(F.lit(3))
    )
    rows = diff.select(
        "doc_id", "url", host.alias("host"), "verdict", priority.alias("priority")
    )
    # per-host politeness delay (the crawl-delay a robots fetch would
    # have produced; host determines doc_id % 5, so this is per-host
    # consistent)
    rows = rows.withColumn(
        "delay_s", (1 + F.col("doc_id") % 5).cast("int")
    )
    w = W.partitionBy("host").orderBy("priority", "url")
    return (
        rows.withColumn("rank", F.row_number().over(w))
        .withColumn("fetch_at_s", ((F.col("rank") - 1) * F.col("delay_s")).cast("bigint"))
        .orderBy("host", "rank")
    )


def _refetch_oracle() -> str:
    body = _snapshot_diff_oracle().replace("ORDER BY doc_id, url", "")
    return f"""
WITH diff AS ({body}),
p AS (
  SELECT doc_id, url,
         'site' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS host,
         verdict,
         CAST(CASE verdict WHEN 'changed' THEN 0 WHEN 'gone' THEN 1
                           WHEN 'added' THEN 2 ELSE 3 END AS INT) AS priority,
         CAST(1 + doc_id % 5 AS INT) AS delay_s
  FROM diff
)
SELECT doc_id, url, host, verdict, priority, delay_s,
       CAST(row_number() OVER (PARTITION BY host ORDER BY priority, url) AS INT)
         AS rank,
       CAST((row_number() OVER (PARTITION BY host ORDER BY priority, url) - 1)
            * delay_s AS BIGINT) AS fetch_at_s
FROM p ORDER BY host, rank
"""


REFETCH_PLAN_ORACLE = _refetch_oracle()


# ------------------- WARC repackage (publish a filtered sub-crawl)


def repackage_warc(payload: bytes, rid_base: int = 0) -> bytes | None:
    """Re-emit a WARC keeping only the PUBLISHABLE captures — 200
    text/html responses — as a fresh archive: one warcinfo head + the
    kept response records with their ORIGINAL HTTP wire bytes
    untouched (re-encoding would destroy digest stability), every
    record its own gzip member (the convention that keeps the output
    cluster-splittable). Returns None when the input rejects. This is
    the write half of the WARC surface: publishing a curated sub-crawl
    back in the format the rest of the ecosystem reads."""
    records = _records(payload)
    if records is None:
        return None
    out = [
        _record(
            "warcinfo",
            rid_base,
            b"software: danae-spark/1.0\r\nformat: WARC File Format 1.1\r\n"
            b"operator: repackage\r\n",
            {"Content-Type": "application/warc-fields"},
        )
    ]
    k = 0
    for r in records:
        if r["type"] != "response":
            continue
        http = _parse_http_response(r["body"])
        if http is None:
            return None
        if http["status"] == 200 and (http["content_type"] or "").startswith(
            "text/html"
        ):
            k += 1
            out.append(
                _record(
                    "response",
                    rid_base + k,
                    r["body"],
                    {
                        "WARC-Target-URI": r["uri"],
                        "Content-Type": "application/http;msgtype=response",
                    },
                )
            )
    return b"".join(_gzip_member(rec) for rec in out)


def crawl_repackage_roundtrip(spark, sf_dir: str):
    """WARC write path, certified by roundtrip: synth crawl -> filter
    -> repackage into NEW gzip-membered WARC bytes -> re-walk those
    bytes with the SAME validating parser the read path uses — the
    census of the published archive must equal the keep arithmetic
    (n_dropped carries the discarded redirects in-row)."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    cols = ["n_records", "n_response", "n_http_ok", "is_gzip", "first_uri", "host"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                orig = parse_warc(synth_warc(d))
                repack = repackage_warc(synth_warc(d), rid_base=d * 100)
                c = parse_warc(repack) if repack is not None else None
                row = {"doc_id": d}
                row.update({k: (c.get(k) if c else None) for k in cols})
                row["n_dropped"] = (
                    orig["n_response"] - c["n_response"] if c and orig else None
                )
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + cols + ["n_dropped"])

    schema = (
        "doc_id bigint, n_records int, n_response int, n_http_ok int, "
        "is_gzip boolean, first_uri string, host string, n_dropped int"
    )
    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=schema)
        .orderBy("doc_id")
    )


REPACKAGE_ORACLE = """
WITH g AS (
  SELECT doc_id, CAST(1 + doc_id % 3 AS INT) AS n_pages,
         'site' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS host
  FROM documents
),
kept AS (
  SELECT g.doc_id,
         CAST(count(*) FILTER (WHERE (g.doc_id + p.p) % 5 <> 4) AS INT) AS n_kept,
         min(p.p) FILTER (WHERE (g.doc_id + p.p) % 5 <> 4) AS first_p
  FROM g, generate_series(0, 2) p(p)
  WHERE p.p < g.n_pages
  GROUP BY g.doc_id
)
SELECT g.doc_id,
       CAST(1 + kept.n_kept AS INT) AS n_records,
       kept.n_kept AS n_response,
       kept.n_kept AS n_http_ok,
       TRUE AS is_gzip,
       CASE WHEN kept.first_p IS NOT NULL
            THEN 'http://' || g.host || '/p' || CAST(kept.first_p AS VARCHAR)
       END AS first_uri,
       CASE WHEN kept.first_p IS NOT NULL THEN g.host END AS host,
       CAST(g.n_pages - kept.n_kept AS INT) AS n_dropped
FROM g JOIN kept USING (doc_id)
ORDER BY g.doc_id
"""


# ------------------- Gopher-gated curation (r14, C122)


def crawl_curate_gopher_roundtrip(spark, sf_dir: str):
    """QUALITY-gated curation via the published Gopher rule set
    (operators/textstats.py gopher_rules_frame): every capture of the
    curate grid (mirrors included) is scored by the row-wise Gopher
    rules over its newline-flattened extracted text (corpus-tuned
    thresholds: min_words 15, mean-word-length floor 2.0 — crawl-page
    fixtures are short —, stop-word floor 0 since the fixture
    vocabulary is synthetic), and the keep decision becomes
    gopher_ok AND exact-dup keeper — a low-quality page can neither
    ship NOR keep a cluster, the same compliance-gating shape as the
    robots variant (C99).

    Scale shape: the Gopher score is ONE codegen projection riding
    the extraction scan (no Python, no shuffle); the keeper is the
    two-phase groupBy+join over quality-passing captures only."""
    from pyspark.sql import functions as F

    from danae_spark.operators.dedup import exact_dup_keeper
    from danae_spark.operators.textstats import gopher_rules_frame

    pages = _curate_pages(spark, sf_dir)
    flat = pages.select(
        "page_id", F.translate("text", "\n", " ").alias("text")
    )
    g = gopher_rules_frame(
        flat,
        id_col="page_id",
        text_col="text",
        min_words=15,
        mean_len_lo=2.0,
        min_stops=0,
    ).select(
        F.col("doc_id").alias("page_id"),
        "n_words",
        "mean_word_len",
        F.col("keep").alias("gopher_ok"),
    )
    joined = pages.join(g, "page_id")
    dup = exact_dup_keeper(
        joined.filter(F.col("gopher_ok") == 1).select("page_id", "text")
    ).select("page_id", "n_dup", "is_keeper")
    return (
        joined.join(dup, "page_id", "left")
        .select(
            "page_id",
            "doc_id",
            "n_words",
            "mean_word_len",
            "gopher_ok",
            F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
            F.coalesce("is_keeper", F.lit(0)).alias("is_keeper"),
            (
                (F.col("gopher_ok") == 1)
                & (F.coalesce("is_keeper", F.lit(0)) == 1)
            ).cast("int").alias("keep"),
        )
        .orderBy("page_id")
    )


def _crawl_curate_gopher_oracle() -> str:
    from danae_spark.multimodal.htmltext import html_text_sql

    ok_pages = """
SELECT d.doc_id, d.doc_id * 4 + p.p AS e
FROM documents d, generate_series(0, 2) p(p)
WHERE p.p < 1 + d.doc_id % 3 AND (d.doc_id + p.p) % 5 <> 4
"""
    return f"""
WITH hx AS ({html_text_sql(ok_pages)}),
pg AS (
  SELECT doc_id AS src_doc,
         e + CASE WHEN m.m = 1 THEN {_MIRROR_OFF} ELSE 0 END AS page_id,
         text,
         replace(text, chr(10), ' ') AS flat
  FROM hx, generate_series(0, 1) m(m)
  WHERE m.m = 0 OR doc_id % 10 = 3
),
g AS (
  SELECT page_id,
         list_filter(string_split_regex(flat, ' +'), t -> t <> '') AS w,
         list_filter(string_split(flat, chr(10)), l -> l <> '') AS l
  FROM pg
),
m2 AS (
  SELECT page_id,
         CAST(len(w) AS INT) AS n_words,
         floor((CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
               / len(w)) * 1000000.0 + 0.5001) / 1000000.0 AS mean_word_len,
         floor((CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
               AS DOUBLE) / len(w)) * 1000000.0 + 0.5001) / 1000000.0 AS alpha_ratio,
         floor((CAST(list_sum(list_transform(w, x ->
                 length(x) - length(replace(x, '#', ''))))
               + list_sum(list_transform(w, x -> CAST((length(x)
                 - length(replace(x, '...', ''))) / 3 AS INT)))
               AS DOUBLE) / len(w)) * 1000000.0 + 0.5001) / 1000000.0 AS symbol_ratio,
         floor((CAST(len(list_filter(l, x -> x LIKE '-%' OR x LIKE '*%'
                 OR x LIKE chr(8226) || '%')) AS DOUBLE) / len(l))
           * 1000000.0 + 0.5001) / 1000000.0 AS bullet_ratio,
         floor((CAST(len(list_filter(l, x -> x LIKE '%...')) AS DOUBLE)
               / len(l)) * 1000000.0 + 0.5001) / 1000000.0 AS ellipsis_ratio
  FROM g
),
verdict AS (
  SELECT page_id, n_words, mean_word_len,
         CAST(n_words >= 15 AND n_words <= 100000
              AND mean_word_len >= 2.0 AND mean_word_len <= 10.0
              AND alpha_ratio >= 0.8 AND symbol_ratio <= 0.1
              AND bullet_ratio <= 0.9 AND ellipsis_ratio <= 0.3
              AS INT) AS gopher_ok
  FROM m2
),
dup AS (
  SELECT pg.page_id,
         CAST(count(*) OVER (PARTITION BY pg.text) AS INT) AS n_dup,
         CAST(row_number() OVER (PARTITION BY pg.text ORDER BY pg.page_id) = 1
              AS INT) AS is_keeper
  FROM pg JOIN verdict USING (page_id) WHERE verdict.gopher_ok = 1
)
SELECT pg.page_id, pg.src_doc AS doc_id, v.n_words, v.mean_word_len,
       v.gopher_ok,
       COALESCE(dup.n_dup, 0) AS n_dup,
       COALESCE(dup.is_keeper, 0) AS is_keeper,
       CAST(v.gopher_ok = 1 AND COALESCE(dup.is_keeper, 0) = 1 AS INT) AS keep
FROM pg JOIN verdict v USING (page_id) LEFT JOIN dup USING (page_id)
ORDER BY pg.page_id
"""
