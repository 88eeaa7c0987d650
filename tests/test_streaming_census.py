"""Streaming blob-census twin: a live micro-batched replay produces
row-identical output to the batch census frames (structural parity —
same frame function per kind), rejects flow as NULL rows."""

import glob
import os
import shutil

import pytest

from danae_spark.streaming.census import census_stream
from danae_spark.streaming.harvest import read_blob_stream


def _land(spark, tmp_path, rows_by_file):
    blob_dir = str(tmp_path / "blobs")
    os.makedirs(blob_dir)
    for name, rows in rows_by_file.items():
        spark.createDataFrame(rows, "doc_id long, payload binary").coalesce(
            1
        ).write.parquet(f"{blob_dir}/{name}")
    for name in rows_by_file:
        for i, f in enumerate(glob.glob(f"{blob_dir}/{name}/*.parquet")):
            shutil.move(f, f"{blob_dir}/{name}_{i}.parquet")
        shutil.rmtree(f"{blob_dir}/{name}")
    return blob_dir


@pytest.mark.parametrize("kind", ["avro", "orc", "notebook", "code", "wiki",
                                  "safetensors", "arrow"])
def test_census_stream_matches_batch(spark, tmp_path, kind):
    from danae_spark.multimodal.avroblob import avro_census_frame, synth_avro
    from danae_spark.multimodal.notebook import (
        notebook_extract_frame,
        synth_notebook,
    )
    from danae_spark.multimodal.orcblob import orc_census_frame, synth_orc
    from danae_spark.multimodal.tensors import (
        arrow_census_frame,
        safetensors_census_frame,
        synth_arrow,
        synth_safetensors,
    )
    from danae_spark.multimodal.wikitext import (
        synth_wiki_dump,
        wiki_extract_frame,
    )
    from danae_spark.operators.codestats import code_stats_frame, synth_code_doc

    synth, frame = {
        "avro": (synth_avro, avro_census_frame),
        "orc": (synth_orc, orc_census_frame),
        "notebook": (synth_notebook, notebook_extract_frame),
        "code": (synth_code_doc, code_stats_frame),
        "wiki": (synth_wiki_dump, wiki_extract_frame),
        "safetensors": (synth_safetensors, safetensors_census_frame),
        "arrow": (synth_arrow, arrow_census_frame),
    }[kind]
    rows1 = [(d, bytearray(synth(d))) for d in range(0, 6)]
    rows2 = [(d, bytearray(synth(d))) for d in range(6, 12)] + [
        (99, bytearray(b"\x00\x01\x02\xffjunk"))  # rejects under every kind
    ]
    blob_dir = _land(spark, tmp_path, {"f1": rows1, "f2": rows2})

    stream = census_stream(read_blob_stream(spark, blob_dir), kind)
    q = (
        stream.writeStream.format("memory")
        .queryName(f"census_stream_{kind}")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r)
        for r in spark.sql(f"SELECT * FROM census_stream_{kind}").collect()
    )
    batch_df = spark.createDataFrame(rows1 + rows2, "doc_id long, payload binary")
    want = sorted(tuple(r) for r in frame(batch_df).collect())
    assert got == want and len(got) == 13
    by_id = {r[0]: r for r in got}
    assert by_id[99][1] is None  # junk: NULL census row, not a crash


def test_unknown_kind_rejected(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, payload binary")
    with pytest.raises(ValueError):
        census_stream(df, "xml")
