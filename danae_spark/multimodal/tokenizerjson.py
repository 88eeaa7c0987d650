"""tokenizer.json census — the HF tokenizers config every model repo
ships next to its checkpoint.

A model-data lake's tokenizer files answer the questions a training
pipeline asks before a single document is tokenized: which algorithm
(BPE / WordPiece / Unigram), how big the vocab, how many merges, what
got added post-training, is there an unk route. The census parses the
strict-JSON config and VALIDATES the model section the way the
reference implementation loads it:

  - model.type must be a known algorithm (an unknown type rejects
    whole — guessing a tokenizer's semantics corrupts every token
    count downstream);
  - BPE merges must be closed over the vocab: each "a b" merge's
    parts AND concatenation must exist (a dangling merge is a torn
    or hand-edited file);
  - vocab ids must be unique (a duplicate id silently aliases two
    tokens);
  - Unigram vocabs are [token, log-prob] pairs, typed-checked.

Reference parity note: the reference engine (SURVEY §1) has no model
artifacts; extension surface like multimodal/tensors.py.
"""

from __future__ import annotations

import json
from typing import Optional

__all__ = [
    "parse_tokenizer_json",
    "synth_tokenizer_json",
    "tokenizer_census_frame",
    "tokenizer_census_roundtrip",
    "TOKENIZER_CENSUS_ORACLE",
]

_MAX_BYTES = 256 * 1024 * 1024
_KNOWN = {"BPE", "WordPiece", "Unigram", "WordLevel"}


def parse_tokenizer_json(payload: bytes) -> Optional[dict]:
    p = bytes(payload) if payload is not None else b""
    if not p or len(p) > _MAX_BYTES:
        return None
    try:
        doc = json.loads(p.decode("utf-8"))
    except (UnicodeDecodeError, ValueError):
        return None
    if not isinstance(doc, dict) or "model" not in doc:
        return None
    model = doc["model"]
    if not isinstance(model, dict):
        return None
    mtype = model.get("type")
    if mtype not in _KNOWN:
        return None  # guessing a tokenizer's semantics is corruption
    n_merges = None
    if mtype == "Unigram":
        vocab = model.get("vocab")
        if not isinstance(vocab, list) or not all(
            isinstance(e, list) and len(e) == 2 and isinstance(e[0], str)
            and isinstance(e[1], (int, float)) for e in vocab
        ):
            return None
        vocab_size = len(vocab)
        if len({e[0] for e in vocab}) != vocab_size:
            return None  # duplicate pieces
    else:
        vocab = model.get("vocab")
        if not isinstance(vocab, dict) or not all(
            isinstance(v, int) for v in vocab.values()
        ):
            return None
        vocab_size = len(vocab)
        if len(set(vocab.values())) != vocab_size:
            return None  # duplicate ids alias two tokens
        if mtype == "BPE":
            merges = model.get("merges", [])
            if not isinstance(merges, list):
                return None
            for m in merges:
                if isinstance(m, list) and len(m) == 2:
                    a, b = m
                elif isinstance(m, str) and m.count(" ") == 1:
                    a, b = m.split(" ")
                else:
                    return None
                if a not in vocab or b not in vocab or (a + b) not in vocab:
                    return None  # a dangling merge is a torn file
            n_merges = len(merges)
    added = doc.get("added_tokens", [])
    if not isinstance(added, list):
        return None
    n_special = 0
    for t in added:
        if not isinstance(t, dict) or "content" not in t:
            return None
        n_special += 1 if t.get("special") else 0
    return {
        "model_type": mtype,
        "vocab_size": vocab_size,
        "n_merges": n_merges,
        "n_added_tokens": len(added),
        "n_special_tokens": n_special,
        "has_normalizer": doc.get("normalizer") is not None,
        "has_unk": (
            model.get("unk_token") is not None
            or (mtype == "Unigram" and model.get("unk_id") is not None)
        ),
    }


# ------------------------------------------------------------- synthesis
#
# Grid (restated in TOKENIZER_CENSUS_ORACLE):
#   type    [BPE, WordPiece, Unigram][d % 3]
#   base    B = 30 + d % 10 base tokens t0..t{B-1}
#   merges  BPE: M = 10 + d % 7 merges 't{i} t{i+1}' with the merged
#           token appended -> vocab_size = B + M; others: B, merges NULL
#   added   1 + d % 4 added tokens, special on even slots
#   norm    normalizer present when d % 2 == 0; unk on non-Unigram
#           when d % 5 != 1 (Unigram carries unk_id always)
#   rejects d % 17 == 13 truncated JSON; d % 13 == 11 unknown model
#           type; d % 23 == 21 dangling BPE merge (BPE docs only)


def synth_tokenizer_json(d: int) -> bytes:
    mtype = ["BPE", "WordPiece", "Unigram"][d % 3]
    b = 30 + d % 10
    base = [f"t{i}" for i in range(b)]
    model: dict = {"type": mtype}
    if mtype == "Unigram":
        model["vocab"] = [[t, -float(i % 9) - 1.5] for i, t in enumerate(base)]
        model["unk_id"] = 0
    else:
        vocab = {t: i for i, t in enumerate(base)}
        if mtype == "BPE":
            m = 10 + d % 7
            merges = []
            for i in range(m):
                merges.append(f"t{i} t{i + 1}")
                vocab[f"t{i}t{i + 1}"] = b + i
            if d % 23 == 21:
                merges[0] = "t0 zzz"  # dangling merge
            model["merges"] = merges
        model["vocab"] = vocab
        if d % 5 != 1:
            model["unk_token"] = "[UNK]"
    if d % 13 == 11:
        model["type"] = "SentencePieceXYZ"
    doc: dict = {
        "version": "1.0",
        "model": model,
        "added_tokens": [
            {"id": 100000 + j, "content": f"<extra_{j}>", "special": j % 2 == 0}
            for j in range(1 + d % 4)
        ],
    }
    if d % 2 == 0:
        doc["normalizer"] = {"type": "NFC"}
    raw = json.dumps(doc, sort_keys=True).encode("utf-8")
    if d % 17 == 13:
        raw = raw[:-9]  # truncated JSON
    return raw


_COLS = ["model_type", "vocab_size", "n_merges", "n_added_tokens",
         "n_special_tokens", "has_normalizer", "has_unk"]
_SCHEMA = (
    "doc_id bigint, model_type string, vocab_size int, n_merges int, "
    "n_added_tokens int, n_special_tokens int, has_normalizer boolean, "
    "has_unk boolean"
)


def tokenizer_census_frame(df, id_col="doc_id", payload_col="payload"):
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_tokenizer_json, _COLS, _SCHEMA,
                              id_col, payload_col)


def tokenizer_census_roundtrip(spark, sf_dir: str):
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_tokenizer_json,
                           parse_tokenizer_json, _COLS, _SCHEMA)


TOKENIZER_CENSUS_ORACLE = """
WITH d0 AS (
  SELECT doc_id, doc_id AS d FROM documents
  WHERE doc_id % 17 <> 13 AND doc_id % 13 <> 11
    AND NOT (doc_id % 3 = 0 AND doc_id % 23 = 21)
)
SELECT d.doc_id,
       CASE WHEN d0.doc_id IS NULL THEN NULL
            ELSE CASE d.doc_id % 3 WHEN 0 THEN 'BPE'
                 WHEN 1 THEN 'WordPiece' ELSE 'Unigram' END
       END AS model_type,
       CAST(CASE WHEN d0.doc_id IS NULL THEN NULL
            WHEN d.doc_id % 3 = 0
            THEN 30 + d.doc_id % 10 + 10 + d.doc_id % 7
            ELSE 30 + d.doc_id % 10 END AS INT) AS vocab_size,
       CAST(CASE WHEN d0.doc_id IS NULL OR d.doc_id % 3 <> 0 THEN NULL
            ELSE 10 + d.doc_id % 7 END AS INT) AS n_merges,
       CAST(CASE WHEN d0.doc_id IS NULL THEN NULL
            ELSE 1 + d.doc_id % 4 END AS INT) AS n_added_tokens,
       CAST(CASE WHEN d0.doc_id IS NULL THEN NULL
            ELSE (1 + d.doc_id % 4 + 1) // 2 END AS INT)
         AS n_special_tokens,
       CASE WHEN d0.doc_id IS NULL THEN NULL
            ELSE d.doc_id % 2 = 0 END AS has_normalizer,
       CASE WHEN d0.doc_id IS NULL THEN NULL
            WHEN d.doc_id % 3 = 2 THEN TRUE
            ELSE d.doc_id % 5 <> 1 END AS has_unk
FROM documents d LEFT JOIN d0 USING (doc_id) ORDER BY d.doc_id
"""
