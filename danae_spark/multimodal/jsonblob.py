"""Per-blob JSON / JSONL census — the LLM-interchange formats.

Training corpora move as JSONL (one record per line) and config/API
payloads as single JSON documents; before ingesting a lake prefix you
want each blob's kind and shape without materializing it as a table.
Parsing is RFC 8259 via the stdlib decoder (strict mode); the census
adds the structural walk the decoder doesn't expose:

  - kind: 'object' | 'array' | 'jsonl' (two or more newline-separated
    top-level values, every line a complete JSON value) | scalar
    kinds for completeness;
  - n_records: JSONL line count, array length, or 1;
  - first record's key census (n_keys, keys joined '/'), max nesting
    depth across the blob, and total string/number/null leaf counts —
    the quick sanity signals (is this the schema I expect? how deep?);
  - reject-whole: invalid UTF-8, trailing garbage, any malformed line
    in a JSONL blob (a half-good JSONL must not census as smaller —
    that silently drops records downstream).
"""

from __future__ import annotations

import json
from typing import Optional

__all__ = [
    "parse_json_blob",
    "synth_json",
    "json_census_frame",
    "json_census_roundtrip",
    "JSON_CENSUS_ORACLE",
]


def _walk(v, depth: int, acc: dict) -> None:
    acc["max_depth"] = max(acc["max_depth"], depth)
    if isinstance(v, dict):
        for x in v.values():
            _walk(x, depth + 1, acc)
    elif isinstance(v, list):
        for x in v:
            _walk(x, depth + 1, acc)
    elif isinstance(v, str):
        acc["n_strings"] += 1
    elif isinstance(v, bool):
        pass
    elif isinstance(v, (int, float)):
        acc["n_numbers"] += 1
    elif v is None:
        acc["n_nulls"] += 1


def parse_json_blob(payload: bytes) -> Optional[dict]:
    """Census or None (reject-whole)."""
    if not payload:
        return None
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError:
        return None

    values = None
    kind = None
    stripped = text.strip()
    if not stripped:
        return None
    # JSONL first: >= 2 non-empty lines, EVERY one a complete value
    lines = [ln for ln in text.split("\n") if ln.strip()]
    if len(lines) >= 2:
        try:
            values = [json.loads(ln) for ln in lines]
            kind = "jsonl"
        except json.JSONDecodeError:
            values = None
    if values is None:
        try:
            v = json.loads(stripped)
        except json.JSONDecodeError:
            return None
        if isinstance(v, dict):
            kind, values = "object", [v]
        elif isinstance(v, list):
            # keep the real elements — an empty list is just len 0
            # (no sentinel: [null] must census as 1 record / 1 null)
            kind, values = "array", v
        else:
            kind, values = "scalar", [v]

    acc = {"max_depth": 0, "n_strings": 0, "n_numbers": 0, "n_nulls": 0}
    if kind == "array":
        # walk the container itself: an array of scalars is depth 2
        _walk(values, 1, acc)
    else:
        for v in values:
            _walk(v, 1, acc)
    if kind == "array" or kind == "jsonl":
        n_records = len(values)
    else:
        n_records = 1
    first = values[0] if values else None
    if isinstance(first, dict):
        keys = sorted(first.keys())
        n_keys, keyline = len(keys), "/".join(keys)
    else:
        n_keys, keyline = 0, None
    return {
        "kind": kind,
        "n_records": n_records,
        "n_keys": n_keys,
        "keys": keyline,
        "max_depth": acc["max_depth"],
        "n_strings": acc["n_strings"],
        "n_numbers": acc["n_numbers"],
        "n_nulls": acc["n_nulls"],
    }


# ----------------------------------------------------------- synthesis
#
# Pure doc_id arithmetic (restated in JSON_CENSUS_ORACLE):
#   kind = [jsonl, object, array][d % 3]
#   jsonl: 2 + d % 4 records; record r = {"id": d*10+r, "txt": "t{...}",
#          "tags": ["g0".."g{1+(d+r)%2}"], "note": null when (d+r)%3==0
#          else "n{...}"} -> per record: strings = 1 txt + tags + note?,
#          numbers = 1, nulls = (d+r)%3==0; depth 3 (obj>tags>items)
#   object: one jsonl-record shape plus a nested {"meta": {"depth":
#           {"x": 1}}} -> depth 4
#   array:  1 + d % 3 numbers -> depth 2
#   d % 23 == 7 -> a malformed middle line (reject leg)


def _record(d: int, r: int) -> dict:
    rec = {
        "id": d * 10 + r,
        "txt": f"t{(d * 3 + r) % 40}",
        "tags": [f"g{k}" for k in range(1 + (d + r) % 2)],
    }
    rec["note"] = None if (d + r) % 3 == 0 else f"n{(d + r) % 9}"
    return rec


def json_n_records(d: int) -> int:
    return 2 + d % 4


def synth_json(d: int) -> bytes:
    kind = d % 3
    if kind == 0:
        lines = [
            json.dumps(_record(d, r), separators=(",", ":"))
            for r in range(json_n_records(d))
        ]
        if d % 23 == 7:
            lines[1] = lines[1][:-3] + "{oops"
        return ("\n".join(lines) + "\n").encode()
    if kind == 1:
        obj = _record(d, 0)
        obj["meta"] = {"depth": {"x": 1}}
        raw = json.dumps(obj, separators=(",", ":"))
        if d % 23 == 7:
            raw = raw[:-1] + ","
        return raw.encode()
    arr = [((d * 7 + i) % 100) for i in range(1 + d % 3)]
    raw = json.dumps(arr, separators=(",", ":"))
    if d % 23 == 7:
        raw += "]"
    return raw.encode()


# ---------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, kind string, n_records int, n_keys int, keys string, "
    "max_depth int, n_strings int, n_numbers int, n_nulls int"
)
_COLS = [
    "kind",
    "n_records",
    "n_keys",
    "keys",
    "max_depth",
    "n_strings",
    "n_numbers",
    "n_nulls",
]


def json_census_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """JSON/JSONL census over any (id, binary) frame: one
    Arrow-batched narrow map, no shuffle (multimodal/docframes.py)."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(
        df, parse_json_blob, _COLS, _SCHEMA, id_col, payload_col
    )


def json_census_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real JSONL / object /
    array blob (nested depth, null legs, a malformed-line reject leg)
    is synthesized, parsed strictly, and every census column restated
    as doc_id arithmetic."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_json, parse_json_blob, _COLS, _SCHEMA)


JSON_CENSUS_ORACLE = """
WITH d0 AS (SELECT doc_id, doc_id AS d FROM documents),
-- per-record facts for the jsonl (kind 0) and object (kind 1) shapes:
-- strings = txt + tags(1 + (d+r)%2) + (note unless (d+r)%3==0);
-- numbers = 1 (id); nulls = 1 when (d+r)%3==0
recs AS (
  SELECT doc_id, d, r.r,
         1 + (1 + (d + r.r) % 2)
           + CASE WHEN (d + r.r) % 3 = 0 THEN 0 ELSE 1 END AS n_strings,
         1 AS n_numbers,
         CASE WHEN (d + r.r) % 3 = 0 THEN 1 ELSE 0 END AS n_nulls
  FROM d0, generate_series(0, 5) r(r)
  WHERE d % 3 = 0 AND r.r < 2 + d % 4
),
jsonl_u AS (
  SELECT doc_id, d,
         CAST(count(*) AS INT) AS n_records,
         CAST(sum(n_strings) AS INT) AS n_strings,
         CAST(sum(n_numbers) AS INT) AS n_numbers,
         CAST(sum(n_nulls) AS INT) AS n_nulls
  FROM recs GROUP BY doc_id, d
),
unified AS (
  SELECT doc_id, d, 'jsonl' AS kind, n_records, n_strings, n_numbers,
         n_nulls, 3 AS max_depth
  FROM jsonl_u
  UNION ALL
  SELECT doc_id, d, 'object', 1,
         1 + (1 + d % 2) + CASE WHEN d % 3 = 0 THEN 0 ELSE 1 END,
         2,  -- id + the nested meta.depth.x
         CASE WHEN d % 3 = 0 THEN 1 ELSE 0 END,
         4
  FROM d0 WHERE d % 3 = 1
  UNION ALL
  SELECT doc_id, d, 'array', CAST(1 + d % 3 AS INT), 0,
         CAST(1 + d % 3 AS INT), 0, 2
  FROM d0 WHERE d % 3 = 2
)
SELECT doc_id,
       CASE WHEN d % 23 = 7 THEN NULL ELSE kind END AS kind,
       CASE WHEN d % 23 = 7 THEN NULL ELSE n_records END AS n_records,
       CASE WHEN d % 23 = 7 THEN NULL
            WHEN kind = 'array' THEN 0
            WHEN kind = 'object' THEN 5 ELSE 4 END AS n_keys,
       CASE WHEN d % 23 = 7 THEN NULL
            WHEN kind = 'array' THEN NULL
            WHEN kind = 'object' THEN 'id/meta/note/tags/txt'
            ELSE 'id/note/tags/txt' END AS keys,
       CASE WHEN d % 23 = 7 THEN NULL ELSE max_depth END AS max_depth,
       CASE WHEN d % 23 = 7 THEN NULL ELSE n_strings END AS n_strings,
       CASE WHEN d % 23 = 7 THEN NULL ELSE n_numbers END AS n_numbers,
       CASE WHEN d % 23 = 7 THEN NULL ELSE n_nulls END AS n_nulls
FROM unified
ORDER BY doc_id
"""


# ------------------------------------------------ chat-format validation
#
# The SFT/RLHF interchange shape: JSONL of {"messages": [{role,
# content}, ...]}. Validation is per conversation (like the log-line
# contract: one bad conversation must be COUNTED, not silently
# dropped and not fatal to the shard): optional leading system turn,
# then strict user/assistant alternation starting with user, known
# roles only, non-empty string content. Blob-level reject only when
# the payload is not JSONL-of-objects at all.

_CHAT_ROLES = {"system", "user", "assistant"}


def validate_conversation(v) -> bool:
    if not isinstance(v, dict) or not isinstance(v.get("messages"), list):
        return False
    msgs = v["messages"]
    if not msgs:
        return False
    i = 0
    if msgs and isinstance(msgs[0], dict) and msgs[0].get("role") == "system":
        i = 1
    expect = "user"
    if i >= len(msgs):
        return False
    for m in msgs[i:]:
        if not isinstance(m, dict):
            return False
        role, content = m.get("role"), m.get("content")
        if role not in _CHAT_ROLES or role == "system":
            return False
        if role != expect:
            return False
        if not isinstance(content, str) or not content:
            return False
        expect = "assistant" if expect == "user" else "user"
    return True


def parse_chat_blob(payload: bytes) -> Optional[dict]:
    """Chat-JSONL census: conversation counts + per-conversation
    validation verdicts; None only for blob-level corruption."""
    if not payload:
        return None
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError:
        return None
    lines = [ln for ln in text.split("\n") if ln.strip()]
    if not lines:
        return None
    convs = []
    for ln in lines:
        try:
            convs.append(json.loads(ln))
        except json.JSONDecodeError:
            return None  # not JSONL at all: blob-level reject
    if not all(isinstance(c, dict) for c in convs):
        return None
    n_valid = n_system = n_turns = assistant_chars = 0
    max_turns = 0
    for c in convs:
        ok = validate_conversation(c)
        if not ok:
            continue
        n_valid += 1
        msgs = c["messages"]
        if msgs[0].get("role") == "system":
            n_system += 1
        body = [m for m in msgs if m.get("role") != "system"]
        n_turns += len(body)
        max_turns = max(max_turns, len(body))
        assistant_chars += sum(
            len(m["content"]) for m in body if m.get("role") == "assistant"
        )
    return {
        "n_convs": len(convs),
        "n_valid": n_valid,
        "n_invalid": len(convs) - n_valid,
        "n_with_system": n_system,
        "n_turns": n_turns,
        "max_turns": max_turns,
        "assistant_chars": assistant_chars,
    }


# chat synth arithmetic (restated in CHAT_CENSUS_ORACLE):
#   n_convs = 2 + d % 3; conversation i:
#     invalid when (d + i) % 7 == 3 (assistant speaks first)
#     system turn when (d + i) % 2 == 0
#     1 + (d + i) % 3 user/assistant pairs; assistant content
#     'a' * (3 + (d*2 + i) % 5) -> per-pair assistant chars
#   d % 29 == 17 -> a non-JSON middle line (blob reject leg)


def chat_n_convs(d: int) -> int:
    return 2 + d % 3


def synth_chat(d: int) -> bytes:
    out = []
    for i in range(chat_n_convs(d)):
        msgs = []
        if (d + i) % 2 == 0:
            msgs.append({"role": "system", "content": "be helpful"})
        pairs = 1 + (d + i) % 3
        first = "assistant" if (d + i) % 7 == 3 else "user"
        for p in range(pairs):
            roles = (
                ["assistant", "user"] if first == "assistant" else ["user", "assistant"]
            )
            msgs.append({"role": roles[0], "content": f"q{(d + i + p) % 9}"})
            msgs.append({"role": roles[1], "content": "a" * (3 + (d * 2 + i) % 5)})
        out.append(json.dumps({"messages": msgs}, separators=(",", ":")))
    if d % 29 == 17:
        out.insert(1, "{not json")
    return ("\n".join(out) + "\n").encode()


_CHAT_SCHEMA = (
    "doc_id bigint, n_convs int, n_valid int, n_invalid int, "
    "n_with_system int, n_turns int, max_turns int, assistant_chars bigint"
)
_CHAT_COLS = [
    "n_convs",
    "n_valid",
    "n_invalid",
    "n_with_system",
    "n_turns",
    "max_turns",
    "assistant_chars",
]


def chat_census_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Chat-JSONL census over any (id, binary) frame
    (multimodal/docframes.py)."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(
        df, parse_chat_blob, _CHAT_COLS, _CHAT_SCHEMA, id_col, payload_col
    )


def chat_census_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real chat-JSONL shard
    (system legs, alternation-violating conversations counted not
    dropped, a non-JSON-line blob reject leg) is synthesized,
    validated per conversation, and the census restated as doc_id
    arithmetic."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(
        spark, sf_dir, synth_chat, parse_chat_blob, _CHAT_COLS, _CHAT_SCHEMA
    )


CHAT_CENSUS_ORACLE = """
WITH d0 AS (SELECT doc_id, doc_id AS d FROM documents),
convs AS (
  SELECT doc_id, d, i.i,
         CAST((d + i.i) % 7 = 3 AS INT) AS invalid,
         CAST((d + i.i) % 2 = 0 AS INT) AS has_system,
         2 * (1 + (d + i.i) % 3) AS n_body,
         (1 + (d + i.i) % 3) * (3 + (d * 2 + i.i) % 5) AS a_chars
  FROM d0, generate_series(0, 4) i(i)
  WHERE i.i < 2 + d % 3
),
agg AS (
  SELECT doc_id, d,
         CAST(count(*) AS INT) AS n_convs,
         CAST(count(*) FILTER (WHERE invalid = 0) AS INT) AS n_valid,
         CAST(count(*) FILTER (WHERE invalid = 1) AS INT) AS n_invalid,
         CAST(count(*) FILTER (WHERE invalid = 0 AND has_system = 1) AS INT)
           AS n_with_system,
         CAST(sum(CASE WHEN invalid = 0 THEN n_body ELSE 0 END) AS INT)
           AS n_turns,
         CAST(coalesce(max(CASE WHEN invalid = 0 THEN n_body END), 0) AS INT)
           AS max_turns,
         CAST(sum(CASE WHEN invalid = 0 THEN a_chars ELSE 0 END) AS BIGINT)
           AS assistant_chars
  FROM convs GROUP BY doc_id, d
)
SELECT doc_id,
       CASE WHEN d % 29 = 17 THEN NULL ELSE n_convs END AS n_convs,
       CASE WHEN d % 29 = 17 THEN NULL ELSE n_valid END AS n_valid,
       CASE WHEN d % 29 = 17 THEN NULL ELSE n_invalid END AS n_invalid,
       CASE WHEN d % 29 = 17 THEN NULL ELSE n_with_system END AS n_with_system,
       CASE WHEN d % 29 = 17 THEN NULL ELSE n_turns END AS n_turns,
       CASE WHEN d % 29 = 17 THEN NULL ELSE max_turns END AS max_turns,
       CASE WHEN d % 29 = 17 THEN NULL ELSE assistant_chars END AS assistant_chars
FROM agg ORDER BY doc_id
"""
