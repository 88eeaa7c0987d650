"""CDXJ index sidecars — the third Common Crawl sidecar convention
(after WAT and WET): one line per capture, addressing its WARC record
by (filename, offset, length) so a fetch planner can pull individual
records without reading the archive.

Line grammar (the CDXJ form Common Crawl's cdx-*.gz files use):

    <SURT key> <14-digit timestamp> <JSON block>

where the JSON block carries url, mime, status, digest, length,
offset, filename — offset/length in BYTES into the (possibly
member-gzipped) WARC file. For record-per-member .warc.gz files the
offset addresses the gzip MEMBER holding the record, which is why
member-level compression is the crawl convention in the first place.

Reject-whole contract, same as every sidecar reader here: any
malformed line (field count, timestamp shape, JSON, missing keys,
non-numeric/negative offsets) rejects the file.

The synth pairs are derived from the SAME synth_warc files the census
entries walk, with offsets measured off the actual bytes — so the
registered entry genuinely proves the addressing: each CDX line's
(offset, length) slice must parse as a WARC record whose URI and HTTP
status match the line.
"""

from __future__ import annotations

import hashlib
import json
import re
from typing import Iterator

import pandas as pd

from danae_spark.multimodal.warc import (
    _parse_http_response,
    _parse_record,
    n_pages,
    page_status,
    synth_warc,
)

_TS = "20260815000000"
_LINE_RE = re.compile(r"^(\S+) (\d{14}) (\{.*\})$")
_REQUIRED = ("url", "mime", "status", "digest", "length", "offset", "filename")


def surt_key(url: str) -> str | None:
    """SURT (Sort-friendly URI Reordering Transform) of an http(s)
    URL: host labels reversed and comma-joined, then ')/' + path —
    'http://www.example.com/a/b' -> 'com,example,www)/a/b'. Lowercased;
    port and scheme dropped; None for non-http(s) forms."""
    m = re.match(r"https?://([^/]+)(/.*)?$", url, re.IGNORECASE)
    if not m:
        return None
    host = m.group(1).lower().split(":")[0]
    path = m.group(2) or "/"
    return ",".join(reversed(host.split("."))) + ")" + path


def _record_spans(payload: bytes) -> list[tuple[int, int]] | None:
    """(offset, length) of every record in a WARC payload: gzip-member
    spans for .warc.gz (record-per-member), raw record spans for plain
    files. None when the file cannot be walked."""
    if payload[:2] == b"\x1f\x8b":
        # raw COMPRESSED member spans (what a range-GET addresses) —
        # measured by how many input bytes each inflate consumed
        import zlib

        spans, pos, data = [], 0, payload
        while data:
            d = zlib.decompressobj(31)
            try:
                d.decompress(data)
            except zlib.error:
                return None
            if not d.eof:
                return None
            consumed = len(data) - len(d.unused_data)
            spans.append((pos, consumed))
            pos += consumed
            data = d.unused_data
        return spans
    spans, pos = [], 0
    while pos < len(payload):
        got = _parse_record(payload, pos)
        if got is None:
            return None
        spans.append((pos, got[1] - pos))
        pos = got[1]
    return spans


def _record_at(payload: bytes, offset: int, length: int) -> dict | None:
    """Parse the single WARC record addressed by (offset, length) —
    decompressing the member first when the file is .warc.gz."""
    import zlib

    blob = payload[offset : offset + length]
    if len(blob) != length:
        return None
    if payload[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(31)
        try:
            blob = d.decompress(blob)
        except zlib.error:
            return None
        if not d.eof or d.unused_data:
            return None
    got = _parse_record(blob, 0)
    if got is None or got[1] != len(blob):
        return None
    return got[0]


def synth_cdx(doc_id: int) -> bytes:
    """The CDXJ sidecar for synth_warc(doc_id), offsets measured off
    the actual archive bytes (not re-derived arithmetic): one line per
    RESPONSE record, SURT-keyed, with the Common Crawl JSON block."""
    d = doc_id
    payload = synth_warc(d)
    fname = f"crawl-{d:05d}.warc" + (".gz" if d % 2 == 1 else "")
    spans = _record_spans(payload)
    assert spans is not None
    lines = []
    for off, ln in spans:
        rec = _record_at(payload, off, ln)
        assert rec is not None
        if rec["type"] != "response":
            continue
        http = _parse_http_response(rec["body"])
        assert http is not None
        block = {
            "url": rec["uri"],
            "mime": (http["content_type"] or "").split(";")[0],
            "status": str(http["status"]),
            "digest": "sha1:" + hashlib.sha1(rec["body"]).hexdigest(),
            "length": str(ln),
            "offset": str(off),
            "filename": fname,
        }
        lines.append(
            f"{surt_key(rec['uri'])} {_TS} {json.dumps(block, sort_keys=True)}"
        )
    return ("\n".join(lines) + "\n").encode("utf-8")


def parse_cdxj(payload: bytes) -> list[dict] | None:
    """Parse a CDXJ sidecar into dicts; None on ANY malformed line
    (reject-whole): bad field framing, non-14-digit timestamp, invalid
    JSON, a missing required key, or a non-numeric/negative
    offset/length."""
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError:
        return None
    out = []
    for line in text.splitlines():
        if not line.strip():
            continue
        m = _LINE_RE.match(line)
        if m is None:
            return None
        try:
            block = json.loads(m.group(3))
        except ValueError:
            return None
        if not isinstance(block, dict) or any(k not in block for k in _REQUIRED):
            return None
        if not (
            str(block["offset"]).isdigit() and str(block["length"]).isdigit()
        ):
            return None
        out.append(
            {
                "surt": m.group(1),
                "timestamp": m.group(2),
                "url": block["url"],
                "mime": block["mime"],
                "status": int(block["status"]),
                "digest": block["digest"],
                "offset": int(block["offset"]),
                "length": int(block["length"]),
                "filename": block["filename"],
            }
        )
    return out


def cdx_fetch_plan_roundtrip(spark, sf_dir: str):
    """The CDX sidecar walk + addressing proof (r14): parse each doc's
    CDXJ, then — the part a fetch planner depends on — slice the WARC
    at every line's (offset, length), parse THAT blob as a standalone
    record, and require its URI and HTTP status to match the line.
    Output per doc: line counts by status, how many offsets genuinely
    addressed their records, and the SURT of the first capture.

    Scale shape: stateless Arrow mapInPandas (sidecar + archive are
    per-doc), one ordered projection — no shuffle beyond the driver
    contract's orderBy. On a real crawl this is the stage that plans
    range-GETs over .warc.gz objects WITHOUT reading them."""
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
                payload = synth_warc(d)
                lines = parse_cdxj(synth_cdx(d))
                if lines is None:
                    continue
                n_valid = 0
                for ln in lines:
                    rec = _record_at(payload, ln["offset"], ln["length"])
                    if rec is None or rec["uri"] != ln["url"]:
                        continue
                    http = _parse_http_response(rec["body"])
                    if http is not None and http["status"] == ln["status"]:
                        n_valid += 1
                rows.append(
                    {
                        "doc_id": d,
                        "n_lines": len(lines),
                        "n_200": sum(1 for x in lines if x["status"] == 200),
                        "n_301": sum(1 for x in lines if x["status"] == 301),
                        "n_valid_offsets": n_valid,
                        "first_surt": lines[0]["surt"] if lines else None,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_lines", "n_200", "n_301",
                    "n_valid_offsets", "first_surt",
                ],
            )

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(
            batches,
            schema="doc_id bigint, n_lines int, n_200 int, n_301 int, "
            "n_valid_offsets int, first_surt string",
        )
        .orderBy("doc_id")
    )


def cdx_fetch_plan_oracle() -> str:
    """The synth grid's arithmetic: n_pages(d) = 1 + d%3 response
    records; page p is 301 when (d+p)%5 == 4 else 200; every offset
    must address its record (n_valid_offsets = n_lines); the first
    capture is page 0 of host site{d%5}.example."""
    return """
SELECT d.doc_id,
       CAST(1 + d.doc_id % 3 AS INT) AS n_lines,
       CAST((SELECT count(*) FROM generate_series(0, 2) p(p)
             WHERE p.p < 1 + d.doc_id % 3 AND (d.doc_id + p.p) % 5 <> 4)
            AS INT) AS n_200,
       CAST((SELECT count(*) FROM generate_series(0, 2) p(p)
             WHERE p.p < 1 + d.doc_id % 3 AND (d.doc_id + p.p) % 5 = 4)
            AS INT) AS n_301,
       CAST(1 + d.doc_id % 3 AS INT) AS n_valid_offsets,
       'example,site' || CAST(d.doc_id % 5 AS VARCHAR) || ')/p0' AS first_surt
FROM documents d
ORDER BY d.doc_id
"""
