"""Shared Spark scaffolding for per-blob document extractors.

Every document-format module (office, xlsx, epub, rtf, markdown)
exposes the same two Spark surfaces around its pure parser:

  - a frame API over any (id, binary) column — one Arrow-batched
    narrow mapInPandas, no shuffle: the 100 TB scale path for a blob
    lake is partition parallelism, nothing else;
  - an oracle roundtrip over the documents table — synthesize a real
    file per doc_id, parse it with the real extractor, emit one row
    per doc with NULLs for rejects.

This module is that scaffolding, written once. The parse/synth
callables close over their defining module (pickled by reference and
shipped with the package), so adding a format costs only its parser,
synth, columns and oracle.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Optional

import pandas as pd

__all__ = ["blob_extract_frame", "synth_roundtrip"]


def blob_extract_frame(
    df,
    parse: Callable[[bytes], Optional[dict]],
    cols: list[str],
    schema: str,
    id_col: str = "doc_id",
    payload_col: str = "payload",
):
    """`parse` over any (id, binary) frame; NULL row per reject."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                r = parse(bytes(payload)) if payload is not None else None
                row = {"doc_id": int(doc_id)}
                row.update({k: (r.get(k) if r else None) for k in cols})
                rows.append(row)
            yield _object_frame(rows, ["doc_id"] + cols)

    return df.select(
        df[id_col].cast("bigint").alias("doc_id"), df[payload_col].alias("payload")
    ).mapInPandas(batches, schema=schema)


def _object_frame(rows: list[dict], columns: list[str]) -> pd.DataFrame:
    """Build the batch frame with OBJECT dtype columns. pd.DataFrame's
    default inference coerces an int column containing a None (any
    reject row in the batch) to float64, which silently ROUNDS integers
    above 2^53 — a 56-bit perceptual-hash digest came back off by one
    (caught by the gif_anim_frames oracle, r15). Object columns hand
    exact Python ints to the Arrow conversion, which types them from
    the declared schema."""
    return pd.DataFrame(
        {c: pd.Series([row[c] for row in rows], dtype=object) for c in columns},
        columns=columns,
    )


def synth_roundtrip(
    spark,
    sf_dir: str,
    synth: Callable[[int], bytes],
    parse: Callable[[bytes], Optional[dict]],
    cols: list[str],
    schema: str,
):
    """Oracle roundtrip: synth per documents.doc_id, parse, one row
    per doc ordered by id (rejects as NULL rows)."""
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
                r = parse(synth(d))
                row = {"doc_id": d}
                row.update({k: (r.get(k) if r else None) for k in cols})
                rows.append(row)
            yield _object_frame(rows, ["doc_id"] + cols)

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=schema)
        .orderBy("doc_id")
    )
