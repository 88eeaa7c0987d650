"""Per-task wall-time distribution of the media DECODE stages at a
given lake (default the sf1 synthetic lake) — the §6b evidence row for
the r8 media families: the decode stage is mapInPandas over
doc_id-repartitioned rows, so the distribution's spread directly shows
whether any partition straggles (the failure mode that made the melted
profile scan slow, SURVEY §6).

Usage: python tools/decode_task_dist.py [sf_dir]

Prints one JSON line per family: n_tasks, rows, and per-task seconds
{min, p50, p95, max} measured INSIDE the executor batches (the decode
work itself, excluding scheduler overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from danae_spark.session import get_spark, stage_parallelism


def _timed(stage_fn):
    """Wrap a per-batch transform so each task yields one timing row."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.time()
        rows = 0
        for pdf in it:
            for out in stage_fn(iter([pdf])):
                rows += len(out)
        yield pd.DataFrame({"rows": [rows], "secs": [time.time() - t0]})

    return run


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaledata/sf1"
    spark = get_spark("decode-task-dist")
    spark.range(1000).count()

    from danae_spark.catalog import load_table
    from danae_spark.multimodal import pixels as px
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n_parts = stage_parallelism(spark)

    def image_pixels_stage(it):
        # the synth+decode half of image_pixels_roundtrip (all five
        # containers), minus hashing — the stage the curve row measures
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payload = px.synth_image(d)
                dec = px.decode_pixels(payload)
                rows.append({"doc_id": d, "ok": dec is not None})
            yield pd.DataFrame(rows)

    def jpeg_prog_stage(it):
        from danae_spark.multimodal.jpegcodec import (
            decode_jpeg,
            synth_jpeg_progressive,
        )

        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                blocks = np.array(
                    [[px._jpeg_block_luma(d, by, bx) for bx in range(2)]
                     for by in range(2)], dtype=np.int64)
                lum = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
                payload = synth_jpeg_progressive(
                    lum, color=bool(d % 2), restart_interval=d % 3)
                rows.append({"doc_id": d, "ok": decode_jpeg(payload) is not None})
            yield pd.DataFrame(rows)

    for name, stage in (
        ("image_pixels_decode", image_pixels_stage),
        ("jpeg_progressive_decode", jpeg_prog_stage),
    ):
        timed = (
            docs.repartition(n_parts, "doc_id")
            .mapInPandas(_timed(stage), schema="rows bigint, secs double")
            .collect()
        )
        secs = sorted(r["secs"] for r in timed)
        rows = sum(r["rows"] for r in timed)
        rec = {
            "stage": name,
            "sf_dir": sf_dir,
            "n_tasks": len(secs),
            "rows": rows,
            "task_secs": {
                "min": round(secs[0], 2),
                "p50": round(secs[len(secs) // 2], 2),
                "p95": round(secs[int(len(secs) * 0.95)], 2),
                "max": round(secs[-1], 2),
            },
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
