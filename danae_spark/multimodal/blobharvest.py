"""blob_harvest — the one-pass container dispatcher over a MIXED blob
column: the tabular/binary sibling of text_harvest.

An unknown lake prefix holds csv, jsonl, parquet, sqlite, access-log,
chat-shard, avro, orc, notebook, and legacy-office (CFB) blobs side by
side; the first pass an ingest
planner runs is "which container is each blob, and how big is it".
This operator routes every payload magic/identity-first (sqlite /
parquet / orc / avro magics, the notebook nbformat signature), then by
STRICT text grammar in priority
order — chat (accepted only when at least one conversation validates,
so generic JSONL falls through), json, access-log (accepted only when
at least one line parses as CLF/Combined, so arbitrary text cannot
masquerade as a log), csv (the RFC 4180 grammar rejects JSON-ish lines
via the bare-quote rule, certified by the routing sweep in tests) —
and emits one normalized row per blob: (container, n_items), where
n_items is each census's headline count (csv/parquet/orc rows, json
records, sqlite total rows, access-log parsed requests, chat
conversations, avro records, notebook cells). A blob no parser accepts — including
every unit census's own reject leg — yields a NULL row, never a guess.

The oracle COMPOSES the ten unit oracles verbatim (the text_harvest
pattern: compositions restate the same certified fragments), selecting
each kind's headline count under the d % 10 rotation — so the capstone
can never disagree with the unit entries.

Scale shape: one narrow Arrow map (magic checks + at most four strict
text parses per blob), no shuffle.
"""

from __future__ import annotations

from typing import Optional

__all__ = [
    "route_blob",
    "synth_blob",
    "blob_harvest_frame",
    "blob_harvest_roundtrip",
    "BLOB_HARVEST_ORACLE",
]

_KINDS = ["csv", "json", "parquet", "sqlite", "access_log", "chat",
          "avro", "orc", "notebook", "cfb"]


def route_blob(payload: bytes) -> Optional[dict]:
    """{'container', 'n_items'} or None when no parser accepts."""
    from danae_spark.multimodal.accesslog import parse_access_log
    from danae_spark.multimodal.avroblob import parse_avro_blob
    from danae_spark.multimodal.csvblob import parse_csv_blob
    from danae_spark.multimodal.jsonblob import parse_chat_blob, parse_json_blob
    from danae_spark.multimodal.orcblob import parse_orc_blob
    from danae_spark.multimodal.parquetblob import parse_parquet_blob
    from danae_spark.multimodal.sqliteblob import parse_sqlite_blob

    p = bytes(payload) if payload is not None else b""
    if not p:
        return None
    # magic/identity first: a container claiming a magic either parses
    # as that container or rejects whole — never falls through to a
    # text grammar (the text_harvest package-identity rule)
    if p[:16] == b"SQLite format 3\x00":
        r = parse_sqlite_blob(p)
        return {"container": "sqlite", "n_items": r["total_rows"]} if r else None
    if p[:4] == b"PAR1":
        r = parse_parquet_blob(p)
        return {"container": "parquet", "n_items": r["n_rows"]} if r else None
    if p[:3] == b"ORC":
        r = parse_orc_blob(p)
        return {"container": "orc", "n_items": r["n_rows"]} if r else None
    if p[:4] == b"Obj\x01":
        r = parse_avro_blob(p)
        return {"container": "avro", "n_items": r["n_records"]} if r else None
    if p[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        # CFB identity rule (r17): the compound-file signature claims
        # the OLE2 grammar — parse or reject whole; headline count is
        # the doc's piece count or the sheet's cell count
        from danae_spark.multimodal.cfb import parse_cfb_office

        r = parse_cfb_office(p)
        if r is None:
            return None
        n = (r["n_pieces"] if r["kind"] == "doc"
             else r["n_text_atoms"] if r["kind"] == "ppt"
             else r["n_label_cells"] + r["n_number_cells"])
        return {"container": "cfb", "n_items": n}
    if len(p) >= 16:
        # TFRecord identity: the first frame's masked length-CRC holds
        # (a 1-in-4-billion accident for anything else) — claim, then
        # parse or reject whole
        import struct as _struct

        from danae_spark.multimodal.tfrecord import masked_crc, parse_tfrecord

        if _struct.unpack("<I", p[8:12])[0] == masked_crc(p[:8]):
            r = parse_tfrecord(p)
            return {"container": "tfrecord", "n_items": r["n_records"]} if r else None
    if p[:4] == b"GGUF":
        # r17 tensor containers: magic/identity first, like the rest
        from danae_spark.multimodal.tensors import parse_gguf

        r = parse_gguf(p)
        return {"container": "gguf", "n_items": r["n_tensors"]} if r else None
    if p[:6] == b"\x93NUMPY":
        from danae_spark.multimodal.tensors import parse_npy

        r = parse_npy(p)
        return {"container": "npy", "n_items": r["n_elements"]} if r else None
    if p[:6] == b"ARROW1":
        from danae_spark.multimodal.tensors import parse_arrow_blob

        r = parse_arrow_blob(p)
        return {"container": "arrow", "n_items": r["n_rows"]} if r else None
    if len(p) > 8 and p[8:9] == b"{":
        # safetensors identity: a plausible LE header length followed
        # by a JSON object at byte 8 claims the grammar (a bare JSON
        # blob starts its brace at byte 0, so no collision)
        import struct as _struct

        (hlen,) = _struct.unpack("<Q", p[:8])
        if 0 < hlen <= len(p) - 8:
            from danae_spark.multimodal.tensors import parse_safetensors

            r = parse_safetensors(p)
            return (
                {"container": "safetensors", "n_items": r["n_tensors"]}
                if r else None
            )
    if p.lstrip()[:1] == b"{" and b'"nbformat"' in p:
        # notebook identity rule (r16): the nbformat signature claims
        # the notebook grammar — parse it or reject whole, never fall
        # through to the generic JSON grammar (which would census a
        # corrupt notebook as one json record)
        from danae_spark.multimodal.notebook import parse_notebook

        r = parse_notebook(p)
        return {"container": "notebook", "n_items": r["n_cells"]} if r else None
    r = parse_chat_blob(p)
    if r is not None and r["n_valid"] >= 1:
        return {"container": "chat", "n_items": r["n_convs"]}
    r = parse_json_blob(p)
    if r is not None:
        return {"container": "json", "n_items": r["n_records"]}
    r = parse_access_log(p)
    if r is not None and r["n_requests"] >= 1:
        return {"container": "access_log", "n_items": r["n_requests"]}
    r = parse_csv_blob(p)
    if r is not None:
        return {"container": "csv", "n_items": r["n_rows"]}
    return None


def synth_blob(d: int) -> bytes:
    """d % 10 rotates the container kind; each kind's own synth (and
    thus its own reject leg) is reused verbatim."""
    from danae_spark.multimodal.accesslog import synth_access_log
    from danae_spark.multimodal.avroblob import synth_avro
    from danae_spark.multimodal.csvblob import synth_csv
    from danae_spark.multimodal.jsonblob import synth_chat, synth_json
    from danae_spark.multimodal.notebook import synth_notebook
    from danae_spark.multimodal.orcblob import synth_orc
    from danae_spark.multimodal.parquetblob import synth_parquet
    from danae_spark.multimodal.sqliteblob import synth_sqlite

    from danae_spark.multimodal.cfb import synth_cfb_office

    synth = [
        synth_csv, synth_json, synth_parquet, synth_sqlite,
        synth_access_log, synth_chat, synth_avro, synth_orc,
        synth_notebook, synth_cfb_office,
    ][d % 10]
    return synth(d)


# ---------------------------------------------------- Spark entry points

_SCHEMA = "doc_id bigint, container string, n_items int"
_COLS = ["container", "n_items"]


def blob_harvest_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Container dispatch over any (id, binary) frame: one
    Arrow-batched narrow map, no shuffle (multimodal/docframes.py)."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, route_blob, _COLS, _SCHEMA, id_col, payload_col)


def blob_harvest_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc one real container file
    (kind = d % 10, each kind's synth + reject leg verbatim) routed by
    the dispatcher; the oracle composes the ten certified unit
    oracles and picks each kind's headline count."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_blob, route_blob, _COLS, _SCHEMA)


def _blob_harvest_oracle() -> str:
    from danae_spark.multimodal.accesslog import ACCESS_LOG_CENSUS_ORACLE
    from danae_spark.multimodal.avroblob import AVRO_CENSUS_ORACLE
    from danae_spark.multimodal.csvblob import CSV_CENSUS_ORACLE
    from danae_spark.multimodal.jsonblob import CHAT_CENSUS_ORACLE, JSON_CENSUS_ORACLE
    from danae_spark.multimodal.notebook import NOTEBOOK_EXTRACT_ORACLE
    from danae_spark.multimodal.orcblob import ORC_CENSUS_ORACLE
    from danae_spark.multimodal.parquetblob import PARQUET_CENSUS_ORACLE
    from danae_spark.multimodal.cfb import CFB_OFFICE_ORACLE
    from danae_spark.multimodal.sqliteblob import SQLITE_CENSUS_ORACLE

    return f"""
WITH csv_u AS (SELECT doc_id, n_rows AS n FROM ({CSV_CENSUS_ORACLE})),
json_u AS (SELECT doc_id, n_records AS n FROM ({JSON_CENSUS_ORACLE})),
parquet_u AS (SELECT doc_id, n_rows AS n FROM ({PARQUET_CENSUS_ORACLE})),
sqlite_u AS (SELECT doc_id, total_rows AS n FROM ({SQLITE_CENSUS_ORACLE})),
log_u AS (SELECT doc_id, n_requests AS n FROM ({ACCESS_LOG_CENSUS_ORACLE})),
chat_u AS (SELECT doc_id, n_convs AS n FROM ({CHAT_CENSUS_ORACLE})),
avro_u AS (SELECT doc_id, n_records AS n FROM ({AVRO_CENSUS_ORACLE})),
orc_u AS (SELECT doc_id, n_rows AS n FROM ({ORC_CENSUS_ORACLE})),
nb_u AS (SELECT doc_id, n_cells AS n FROM ({NOTEBOOK_EXTRACT_ORACLE})),
cfb_u AS (SELECT doc_id,
                 CASE kind WHEN 'doc' THEN n_pieces
                           WHEN 'ppt' THEN n_text_atoms
                           ELSE n_label_cells + n_number_cells END AS n
          FROM ({CFB_OFFICE_ORACLE})),
picked AS (
  SELECT d.doc_id,
         CASE d.doc_id % 10
           WHEN 0 THEN csv_u.n WHEN 1 THEN json_u.n WHEN 2 THEN parquet_u.n
           WHEN 3 THEN sqlite_u.n WHEN 4 THEN log_u.n WHEN 5 THEN chat_u.n
           WHEN 6 THEN avro_u.n WHEN 7 THEN orc_u.n WHEN 8 THEN nb_u.n
           ELSE cfb_u.n END AS n_items,
         CASE d.doc_id % 10
           WHEN 0 THEN 'csv' WHEN 1 THEN 'json' WHEN 2 THEN 'parquet'
           WHEN 3 THEN 'sqlite' WHEN 4 THEN 'access_log' WHEN 5 THEN 'chat'
           WHEN 6 THEN 'avro' WHEN 7 THEN 'orc' WHEN 8 THEN 'notebook'
           ELSE 'cfb' END AS kind
  FROM documents d
  JOIN csv_u USING (doc_id) JOIN json_u USING (doc_id)
  JOIN parquet_u USING (doc_id) JOIN sqlite_u USING (doc_id)
  JOIN log_u USING (doc_id) JOIN chat_u USING (doc_id)
  JOIN avro_u USING (doc_id) JOIN orc_u USING (doc_id)
  JOIN nb_u USING (doc_id) JOIN cfb_u USING (doc_id)
)
SELECT doc_id,
       CASE WHEN n_items IS NULL THEN NULL ELSE kind END AS container,
       CAST(n_items AS INT) AS n_items
FROM picked ORDER BY doc_id
"""


BLOB_HARVEST_ORACLE = _blob_harvest_oracle()
