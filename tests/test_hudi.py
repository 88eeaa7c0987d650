"""Apache Hudi COW table census (multimodal/hudi.py)."""

import json

import pytest

from danae_spark.multimodal.hudi import (
    parse_hudi_table,
    synth_hudi_table,
)


def _expect(d: int):
    if d % 17 == 6 or d % 13 == 10:
        return None
    c = 2 + d % 3
    cw = 3 if c == 4 else 1
    rows = sum(
        5 + (d + cw + 1) % 6 if g == 0 else 5 + (d + g) % 6
        for g in range(c)
    )
    return {
        "table_name": f"tbl_{d}",
        "n_commits": c,
        "n_inflight": 1 if d % 4 == 1 else 0,
        "n_file_groups": c,
        "live_rows": rows,
        "sizes_consistent": d % 23 != 17,
        "footers_consistent": True,
    }


def test_grid_matches_arithmetic():
    mix = {"reject": 0, "lie": 0, "inflight": 0}
    for d in range(250):
        got = parse_hudi_table(synth_hudi_table(d))
        assert got == _expect(d), d
        if got is None:
            mix["reject"] += 1
        else:
            mix["lie"] += not got["sizes_consistent"]
            mix["inflight"] += got["n_inflight"]
    assert all(v > 0 for v in mix.values()), mix


def test_latest_slice_wins_and_dead_slices_ignored():
    """d=3: 5 commits? no — C = 2 + 3 % 3 = 2: c1 rewrites f0, so the
    c0 slice of f0 is on disk but DEAD; corrupting it must not change
    the census (a glob reader would double-count it; the replay never
    opens it)."""
    import io
    import tarfile

    d = 3
    raw = synth_hudi_table(d)
    # find the dead slice's member name (f0 at instant ...000)
    with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
        dead = [n for n in tf.getnames()
                if n.startswith("part/f0_") and n.endswith("00.parquet")]
    assert dead, "expected the c0 slice of f0 on disk"
    base = parse_hudi_table(raw)
    # corrupt the dead slice's bytes in place
    blob = bytearray(raw)
    with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
        m = tf.getmember(dead[0])
        off = m.offset_data
    blob[off : off + 4] = b"XXXX"
    # tar member checksums live in the HEADER, not the data, so the
    # archive still parses; only the dead slice's content changed
    got = parse_hudi_table(bytes(blob))
    assert got == base


def test_reject_and_flag_semantics():
    # MOR table refuses (its read path is not claimed)
    assert parse_hudi_table(synth_hudi_table(6)) is None  # 6 % 17 == 6
    # winning slice missing rejects whole
    assert parse_hudi_table(synth_hudi_table(10)) is None  # 10 % 13 == 10
    # lying size flags, never rejects
    got = parse_hudi_table(synth_hudi_table(17))  # 17 % 23 == 17
    assert got is not None and not got["sizes_consistent"]
    assert got["footers_consistent"]
    # not a tar / no .hoodie / no completed instant
    assert parse_hudi_table(b"junk") is None
    from danae_spark.multimodal.archive import _tar_build

    assert parse_hudi_table(_tar_build([("data.txt", b"x")])) is None
    assert (
        parse_hudi_table(
            _tar_build([
                (".hoodie/", None),
                (".hoodie/hoodie.properties",
                 b"hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\n"),
            ])
        )
        is None
    )


def test_frame_api_and_plan(spark):
    from danae_spark.multimodal.hudi import hudi_census_frame

    df = spark.createDataFrame(
        [(0, bytearray(synth_hudi_table(0))), (1, None)],
        "doc_id long, payload binary",
    )
    out = hudi_census_frame(df)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert got[0]["n_commits"] == 2 and got[1]["table_name"] is None
