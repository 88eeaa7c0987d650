"""Email (EML / mbox) MIME text extraction — the mailing-list-archive
corpus class.

RFC 5322 messages with RFC 2045 MIME structure, from the public specs:

  - header section: folded (continuation-WSP) header lines to the
    first blank line; names case-insensitive; RFC 2047 encoded-words
    in Subject/From decoded (B = base64, Q = quoted-printable with
    `_` as space) over a charset whitelist (utf-8 / us-ascii /
    iso-8859-1 / windows-1252) — an unknown charset rejects whole;
  - bodies: Content-Transfer-Encoding 7bit/8bit/binary verbatim,
    base64 (strict — bad alphabet/padding rejects), quoted-printable
    (=XX + soft line breaks, decoded from-spec);
  - text/plain decoded per its charset param; text/html routed
    through the CERTIFIED html extractor (htmltext.parse_html_text) —
    the same code path every other html leg uses;
  - multipart/*: parts split on the boundary parameter per RFC 2046
    (--boundary lines, --boundary-- terminator REQUIRED — a multipart
    with no terminator rejects whole), recursing up to 3 levels; text
    parts join in document order; non-text parts and explicit
    Content-Disposition: attachment parts are COUNTED as attachments
    and skipped;
  - mbox (the `From ` envelope convention): messages split on
    envelope lines, each parsed as an EML; texts join with blank
    lines, first message's subject/from reported;
  - reject-whole: no header/body split, undecodable transfer
    encoding, unknown charset, unterminated multipart — partial mail
    must not ship as corpus text.

Routed in text_harvest: mbox by its `From ` magic; bare EML by the
header-shape identity rule (a first line shaped `Name: value` plus
From:/Subject: headers claims the mail grammar — parse or reject
whole).

Reference parity note: the reference engine (SURVEY §1) has no
document extraction; extension surface like multimodal/office.py.
"""

from __future__ import annotations

import base64
import binascii
from typing import Optional

__all__ = [
    "parse_eml",
    "parse_mbox",
    "parse_mail",
    "synth_mail",
    "mail_extract_frame",
    "mail_extract_roundtrip",
    "MAIL_EXTRACT_ORACLE",
]

_MAX_BYTES = 256 * 1024 * 1024
_MAX_DEPTH = 3
_CHARSETS = {
    "utf-8": "utf-8", "utf8": "utf-8", "us-ascii": "ascii",
    "ascii": "ascii", "iso-8859-1": "latin-1", "latin-1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252",
}


class _Bad(Exception):
    pass


# ------------------------------------------------------------ headers


def _split_headers(raw: bytes) -> tuple[dict[str, str], bytes]:
    """(headers, body) — folded lines joined with one space; reject if
    no blank-line separator or a malformed header line."""
    for sep in (b"\r\n\r\n", b"\n\n"):
        ix = raw.find(sep)
        if ix >= 0:
            head, body = raw[:ix], raw[ix + len(sep):]
            break
    else:
        raise _Bad
    headers: dict[str, str] = {}
    cur_name = None
    for line in head.replace(b"\r\n", b"\n").split(b"\n"):
        try:
            text = line.decode("ascii")
        except UnicodeDecodeError:
            raise _Bad
        if text[:1] in (" ", "\t"):
            if cur_name is None:
                raise _Bad
            headers[cur_name] += " " + text.strip()
            continue
        name, colon, value = text.partition(":")
        if not colon or not name or any(c <= " " or c == ":" for c in name):
            raise _Bad
        cur_name = name.lower()
        if cur_name in headers:
            headers[cur_name] += "\n" + value.strip()
        else:
            headers[cur_name] = value.strip()
    return headers, body


def _qp_decode(data: bytes, header_mode: bool = False) -> bytes:
    """Quoted-printable per RFC 2045 (+RFC 2047 `_`->space in
    headers); a malformed escape rejects."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x3D:  # '='
            if i + 1 < n and data[i + 1 : i + 2] in (b"\n",):
                i += 2  # soft break (bare LF)
                continue
            if i + 2 < n and data[i + 1 : i + 3] == b"\r\n":
                i += 3  # soft break (CRLF)
                continue
            if i + 2 >= n:
                raise _Bad
            try:
                out.append(int(data[i + 1 : i + 3].decode("ascii"), 16))
            except (ValueError, UnicodeDecodeError):
                raise _Bad
            i += 3
            continue
        if header_mode and c == 0x5F:  # '_' -> space (RFC 2047 Q)
            out.append(0x20)
        else:
            out.append(c)
        i += 1
    return bytes(out)


def _b64_decode(data: bytes) -> bytes:
    compact = b"".join(data.split())
    try:
        return base64.b64decode(compact, validate=True)
    except (binascii.Error, ValueError):
        raise _Bad


def _charset(name: str) -> str:
    codec = _CHARSETS.get(name.strip().strip('"').lower())
    if codec is None:
        raise _Bad  # unknown charset: reject, never mojibake
    return codec


def _decode_words(value: str) -> str:
    """RFC 2047 encoded-words anywhere in a header value."""
    out = []
    i = 0
    while True:
        start = value.find("=?", i)
        if start < 0:
            out.append(value[i:])
            return "".join(out)
        end = value.find("?=", start + 2)
        if end < 0:
            out.append(value[i:])
            return "".join(out)
        fields = value[start + 2 : end].split("?")
        if len(fields) != 3:
            raise _Bad
        cs, enc, payload = fields
        enc = enc.lower()
        if enc == "b":
            rawb = _b64_decode(payload.encode("ascii"))
        elif enc == "q":
            rawb = _qp_decode(payload.encode("ascii"), header_mode=True)
        else:
            raise _Bad
        try:
            decoded = rawb.decode(_charset(cs))
        except UnicodeDecodeError:
            raise _Bad
        out.append(value[i:start])
        out.append(decoded)
        i = end + 2


def _content_type(headers: dict[str, str]) -> tuple[str, dict[str, str]]:
    value = headers.get("content-type", "text/plain; charset=us-ascii")
    parts = value.split(";")
    ctype = parts[0].strip().lower()
    params = {}
    for p in parts[1:]:
        k, eq, v = p.partition("=")
        if eq:
            params[k.strip().lower()] = v.strip().strip('"')
    return ctype, params


def _from_addr(value: str) -> str:
    lt = value.rfind("<")
    if lt >= 0 and value.endswith(">"):
        return value[lt + 1 : -1].strip()
    return value.strip()


# --------------------------------------------------------------- body


def _decode_body(headers: dict[str, str], body: bytes) -> bytes:
    cte = headers.get("content-transfer-encoding", "7bit").strip().lower()
    if cte in ("7bit", "8bit", "binary", ""):
        return body
    if cte == "base64":
        return _b64_decode(body)
    if cte == "quoted-printable":
        return _qp_decode(body)
    raise _Bad  # unknown transfer encoding


def _part_text(headers: dict[str, str], body: bytes,
               depth: int, stats: dict) -> Optional[str]:
    """Extracted text of one MIME part; None for counted attachments."""
    ctype, params = _content_type(headers)
    disp = headers.get("content-disposition", "").split(";")[0].strip().lower()
    if disp == "attachment":
        stats["n_attachments"] += 1
        stats["n_parts"] += 1
        return None
    if ctype.startswith("multipart/"):
        if depth >= _MAX_DEPTH:
            raise _Bad
        boundary = params.get("boundary")
        if not boundary:
            raise _Bad
        texts = []
        for p_head, p_body in _split_multipart(body, boundary.encode("ascii")):
            t = _part_text(p_head, p_body, depth + 1, stats)
            if t is not None and t.strip():
                texts.append(t)
        return "\n".join(texts)
    payload = _decode_body(headers, body)
    if ctype == "text/plain" or (ctype == "" and depth == 0):
        stats["n_parts"] += 1
        try:
            text = payload.decode(_charset(params.get("charset", "us-ascii")))
        except UnicodeDecodeError:
            raise _Bad
        return text.replace("\r\n", "\n").strip()
    if ctype == "text/html":
        from danae_spark.multimodal.htmltext import parse_html_text

        stats["n_parts"] += 1
        ext = parse_html_text(payload, params.get("charset"))
        if ext is None:
            raise _Bad  # an html part that cannot be walked
        return ext["text"]
    stats["n_parts"] += 1
    stats["n_attachments"] += 1  # non-text leaf: inline attachment
    return None


def _split_multipart(body: bytes, boundary: bytes):
    """RFC 2046 part split; the -- terminator is REQUIRED."""
    marker = b"--" + boundary
    lines = body.replace(b"\r\n", b"\n").split(b"\n")
    parts: list[list[bytes]] = []
    cur: Optional[list[bytes]] = None
    terminated = False
    for line in lines:
        if line == marker + b"--":
            terminated = True
            break
        if line == marker:
            cur = []
            parts.append(cur)
            continue
        if cur is not None:
            cur.append(line)
    if not terminated or not parts:
        raise _Bad
    for p in parts:
        raw = b"\n".join(p)
        yield _split_headers(raw if b"\n\n" in raw else raw + b"\n\n")


# ------------------------------------------------------------ messages


def parse_eml(payload: bytes) -> Optional[dict]:
    """One RFC 5322/MIME message -> {subject, from_addr, n_parts,
    n_attachments, text}; None on reject."""
    try:
        return _parse_eml(payload)
    except (_Bad, ValueError, UnicodeDecodeError, RecursionError):
        return None


def _parse_eml(payload: bytes) -> Optional[dict]:
    p = bytes(payload) if payload is not None else b""
    if not p or len(p) > _MAX_BYTES:
        return None
    headers, body = _split_headers(p)
    stats = {"n_parts": 0, "n_attachments": 0}
    text = _part_text(headers, body, 0, stats) or ""
    return {
        "subject": _decode_words(headers.get("subject", "")) or None,
        "from_addr": _from_addr(_decode_words(headers.get("from", ""))) or None,
        "n_parts": stats["n_parts"],
        "n_attachments": stats["n_attachments"],
        "text": text,
    }


def parse_mbox(payload: bytes) -> Optional[dict]:
    """An mbox archive: messages split on `From ` envelope lines, each
    parsed as EML; one bad message rejects the archive whole."""
    try:
        p = bytes(payload) if payload is not None else b""
        if not p.startswith(b"From ") or len(p) > _MAX_BYTES:
            return None
        # classic mbox convention: bodies >From-quote envelope-like
        # lines, so "\nFrom " is a message boundary; each block's own
        # first line is its envelope and is stripped
        chunks = []
        for block in p.split(b"\nFrom "):
            nl = block.find(b"\n")
            chunks.append(block[nl + 1 :] if nl >= 0 else b"")
        msgs = []
        for raw in chunks:
            if not raw.strip():
                continue
            m = _parse_eml(raw)
            if m is None:
                return None
            msgs.append(m)
        if not msgs:
            return None
        return {
            "subject": msgs[0]["subject"],
            "from_addr": msgs[0]["from_addr"],
            "n_messages": len(msgs),
            "n_parts": sum(m["n_parts"] for m in msgs),
            "n_attachments": sum(m["n_attachments"] for m in msgs),
            "text": "\n\n".join(m["text"] for m in msgs if m["text"]),
        }
    except (_Bad, ValueError, UnicodeDecodeError, RecursionError):
        return None


def looks_like_mail(p: bytes) -> bool:
    """Header-shape identity: first line `Name: value` AND From: AND
    Subject: headers in the head block (or the mbox `From ` magic)."""
    if p.startswith(b"From "):
        return True
    head = p[:4096]
    nl = head.find(b"\n")
    first = head[: nl if nl >= 0 else len(head)]
    colon = first.find(b": ")
    if colon <= 0 or not first[:colon].replace(b"-", b"").isalpha():
        return False
    low = head.lower()
    return (b"\nfrom:" in low or low.startswith(b"from:")) and (
        b"\nsubject:" in low or low.startswith(b"subject:")
    )


def parse_mail(payload: bytes) -> Optional[dict]:
    """Dispatch: mbox archives or single EML messages, one normalized
    row: {variant, subject, from_addr, n_messages, n_parts,
    n_attachments, text}."""
    p = bytes(payload) if payload is not None else b""
    if not p:
        return None
    if p.startswith(b"From "):
        r = parse_mbox(p)
        if r is None:
            return None
        return {"variant": "mbox", **r}
    r = parse_eml(p)
    if r is None:
        return None
    return {"variant": "eml", "n_messages": 1, **r}


# ------------------------------------------------------------- synthesis
#
# Grid (restated in MAIL_EXTRACT_ORACLE): v = d % 5
#   0  plain 7bit eml        body 'Mail body {d} line {j}.' x (1+d%3)
#   1  base64 utf-8 eml      same body, base64 wire
#   2  quoted-printable eml  body with '=' escapes + accented char
#   3  multipart/mixed       plain part + certified-html part
#                            (htmltext.synth_html(d)) + one pdf
#                            attachment (counted, skipped)
#   4  mbox                  2 + d%3 messages 'Msg {m} of {d}'
#   subject: 'Report {d}' — RFC 2047 Q-encoded when d % 2 == 1
#   from:    'Sender {d%20} <sender{d%20}@example.com>'
#   rejects: d%17==4 bad base64 body; d%19==8 unterminated multipart;
#            d%23==15 unknown charset


def _headers(d: int, extra: list[str]) -> list[str]:
    if d % 2 == 1:
        subj = "=?utf-8?Q?Report_" + str(d) + "?="
    else:
        subj = f"Report {d}"
    return [
        f"From: Sender {d % 20} <sender{d % 20}@example.com>",
        f"To: list-{d % 7}@example.com",
        f"Subject: {subj}",
        "MIME-Version: 1.0",
        *extra,
    ]


def _plain_body(d: int) -> str:
    return "\n".join(f"Mail body {d} line {j}." for j in range(1 + d % 3))


def synth_mail(d: int) -> bytes:
    from danae_spark.multimodal.htmltext import synth_html

    v = d % 5
    if v == 0:
        cs = "klingon" if d % 23 == 15 else "utf-8"
        lines = _headers(d, [f"Content-Type: text/plain; charset={cs}"])
        return ("\n".join(lines) + "\n\n" + _plain_body(d)).encode()
    if v == 1:
        body = base64.encodebytes(_plain_body(d).encode()).decode()
        if d % 17 == 4:
            body = "!!!" + body  # invalid base64 alphabet (reject)
        lines = _headers(d, [
            "Content-Type: text/plain; charset=utf-8",
            "Content-Transfer-Encoding: base64",
        ])
        return ("\n".join(lines) + "\n\n" + body).encode()
    if v == 2:
        body = _plain_body(d).replace(".", "=2E") + "\nCaf=C3=A9 closes =\nsoon."
        lines = _headers(d, [
            "Content-Type: text/plain; charset=utf-8",
            "Content-Transfer-Encoding: quoted-printable",
        ])
        return ("\n".join(lines) + "\n\n" + body).encode()
    if v == 3:
        b = f"sep{d}"
        html = synth_html(d).decode("utf-8", "strict")
        parts = [
            f"--{b}",
            "Content-Type: text/plain; charset=us-ascii",
            "",
            _plain_body(d),
            f"--{b}",
            "Content-Type: text/html; charset=utf-8",
            "",
            html,
            f"--{b}",
            "Content-Type: application/pdf",
            "Content-Disposition: attachment; filename=\"a.pdf\"",
            "Content-Transfer-Encoding: base64",
            "",
            base64.encodebytes(b"%PDF-fake").decode().strip(),
        ]
        if d % 19 != 8:
            parts.append(f"--{b}--")  # else: unterminated (reject)
        lines = _headers(d, [f'Content-Type: multipart/mixed; boundary="{b}"'])
        return ("\n".join(lines) + "\n\n" + "\n".join(parts)).encode()
    msgs = []
    for m in range(2 + d % 3):
        msgs.append(
            f"From sender{d % 20}@example.com Thu Jan  1 00:00:0{m} 2026\n"
            + "\n".join([
                f"From: Sender {d % 20} <sender{d % 20}@example.com>",
                f"Subject: Msg {m} of {d}",
                "Content-Type: text/plain; charset=utf-8",
            ])
            + f"\n\nBody {d} {m}."
        )
    return "\n".join(msgs).encode()


# ----------------------------------------------------- Spark entry points

_COLS = ["variant", "subject", "from_addr", "n_messages", "n_parts",
         "n_attachments", "text"]
_SCHEMA = (
    "doc_id bigint, variant string, subject string, from_addr string, "
    "n_messages int, n_parts int, n_attachments int, text string"
)


def mail_extract_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """parse_mail over any (id, binary) frame — one narrow Arrow map,
    NULL rows for rejects."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_mail, _COLS, _SCHEMA,
                              id_col, payload_col)


def mail_extract_roundtrip(spark, sf_dir: str):
    """Oracle roundtrip: per doc a real message (plain / base64 /
    quoted-printable / multipart-with-certified-html / mbox; three
    reject legs) is synthesized, parsed by the from-spec MIME walker,
    every column restated as doc_id arithmetic."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_mail, parse_mail,
                           _COLS, _SCHEMA)


def _mail_oracle() -> str:
    from danae_spark.multimodal.htmltext import html_text_sql

    # the multipart html part reuses the SAME certified fragment as
    # every other html leg (e = doc_id)
    html_part = html_text_sql(
        "SELECT doc_id, doc_id AS e FROM documents "
        "WHERE doc_id % 5 = 3 AND doc_id % 19 <> 8"
    )
    return f"""
WITH base AS (
  SELECT doc_id, doc_id AS d, doc_id % 5 AS v FROM documents
),
rej AS (
  SELECT doc_id FROM base
  WHERE (v = 0 AND d % 23 = 15)
     OR (v = 1 AND d % 17 = 4)
     OR (v = 3 AND d % 19 = 8)
),
plain AS (
  SELECT b.doc_id,
         string_agg('Mail body ' || b.d || ' line ' || j.j || '.',
                    chr(10) ORDER BY j.j) AS text
  FROM base b JOIN generate_series(0, 2) j(j) ON j.j < 1 + b.d % 3
  WHERE b.v IN (0, 1, 2, 3)
  GROUP BY b.doc_id
),
html_u AS ({html_part}),
mbox_t AS (
  SELECT b.doc_id,
         string_agg('Body ' || b.d || ' ' || m.m || '.',
                    chr(10) || chr(10) ORDER BY m.m) AS text,
         CAST(count(*) AS INT) AS n_msgs
  FROM base b JOIN generate_series(0, 4) m(m) ON m.m < 2 + b.d % 3
  WHERE b.v = 4
  GROUP BY b.doc_id
)
SELECT b.doc_id,
       CASE WHEN rej.doc_id IS NOT NULL THEN NULL
            WHEN b.v = 4 THEN 'mbox' ELSE 'eml' END AS variant,
       CASE WHEN rej.doc_id IS NOT NULL THEN NULL
            WHEN b.v = 4 THEN 'Msg 0 of ' || b.d
            ELSE 'Report ' || b.d END AS subject,
       CASE WHEN rej.doc_id IS NOT NULL THEN NULL
            ELSE 'sender' || (b.d % 20) || '@example.com' END AS from_addr,
       CAST(CASE WHEN rej.doc_id IS NOT NULL THEN NULL
            WHEN b.v = 4 THEN mbox_t.n_msgs ELSE 1 END AS INT) AS n_messages,
       CAST(CASE WHEN rej.doc_id IS NOT NULL THEN NULL
            WHEN b.v = 3 THEN 3
            WHEN b.v = 4 THEN mbox_t.n_msgs ELSE 1 END AS INT) AS n_parts,
       CAST(CASE WHEN rej.doc_id IS NOT NULL THEN NULL
            WHEN b.v = 3 THEN 1 ELSE 0 END AS INT) AS n_attachments,
       CASE WHEN rej.doc_id IS NOT NULL THEN NULL
            WHEN b.v IN (0, 1) THEN plain.text
            WHEN b.v = 2 THEN plain.text || chr(10)
                 || 'Caf' || chr(233) || ' closes soon.'
            WHEN b.v = 3 THEN plain.text || chr(10) || html_u.text
            ELSE mbox_t.text END AS text
FROM base b
LEFT JOIN rej USING (doc_id)
LEFT JOIN plain USING (doc_id)
LEFT JOIN html_u USING (doc_id)
LEFT JOIN mbox_t USING (doc_id)
ORDER BY b.doc_id
"""


MAIL_EXTRACT_ORACLE = _mail_oracle()
