"""Row-group data-skipping planner (multimodal/skipping.py)."""

import io

import pytest

from danae_spark.multimodal.parquetblob import synth_parquet
from danae_spark.multimodal.skipping import (
    C0_HI,
    C0_LO,
    plan_parquet_skip,
)


def _write(cols: dict, row_group_size: int, **kw) -> bytes:
    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(pa.table(cols), buf, row_group_size=row_group_size, **kw)
    return buf.getvalue()


def _expect(d: int):
    """The oracle arithmetic, restated independently in Python."""
    if d % 21 == 9:
        return None
    n, rg = 10 + d % 7, 4 + d % 3
    groups = []
    g = 0
    while g * rg < n:
        glen = min(n - g * rg, rg)
        start = (3 * d + g * rg) % 100
        if start + glen <= 100:
            gmin, gmax = start, start + glen - 1
        else:
            gmin, gmax = 0, 99
        groups.append((glen, gmin, gmax))
        g += 1
    pruned = sum(1 for _, a, b in groups if b < C0_LO or a > C0_HI)
    return {
        "n_row_groups": len(groups),
        "pruned_groups": pruned,
        "scanned_groups": len(groups) - pruned,
        "rows_total": sum(g[0] for g in groups),
        "rows_scanned": sum(
            glen for glen, a, b in groups if not (b < C0_LO or a > C0_HI)
        ),
        "file_pruned": pruned == len(groups),
        "col_present": True,
    }


def test_roundtrip_grid_matches_arithmetic():
    outcomes = {"pruned": 0, "partial": 0, "full_scan": 0}
    for d in range(200):
        got = plan_parquet_skip(synth_parquet(d), "c0", C0_LO, C0_HI)
        assert got == _expect(d), d
        if got is None:
            continue
        if got["file_pruned"]:
            outcomes["pruned"] += 1
        elif got["pruned_groups"]:
            outcomes["partial"] += 1
        else:
            outcomes["full_scan"] += 1
    # the grid must exercise every outcome, or the test proves nothing
    assert all(v > 0 for v in outcomes.values()), outcomes


def test_prune_decision_per_band():
    import pyarrow as pa

    # three groups: [0..9], [50..59], [90..99]
    payload = _write(
        {"x": pa.array(list(range(10)) + list(range(50, 60)) + list(range(90, 100)))},
        row_group_size=10,
    )
    # band hits only the middle group
    p = plan_parquet_skip(payload, "x", 55, 58)
    assert (p["pruned_groups"], p["rows_scanned"], p["file_pruned"]) == (2, 10, False)
    # band below everything: all three prune, file skipped whole
    p = plan_parquet_skip(payload, "x", -20, -1)
    assert p["file_pruned"] and p["rows_scanned"] == 0
    # band spanning all groups: nothing prunes
    p = plan_parquet_skip(payload, "x", 0, 99)
    assert p["pruned_groups"] == 0 and p["rows_scanned"] == 30
    # boundary inclusivity: max == lo / min == hi must NOT prune
    p = plan_parquet_skip(payload, "x", 9, 9)
    assert p["pruned_groups"] == 2 and p["rows_scanned"] == 10
    p = plan_parquet_skip(payload, "x", 99, 150)
    assert p["pruned_groups"] == 2 and p["rows_scanned"] == 10


def test_missing_stats_force_scan():
    import pyarrow as pa

    payload = _write(
        {"x": pa.array(list(range(20)))}, row_group_size=5, write_statistics=False
    )
    p = plan_parquet_skip(payload, "x", 100, 200)
    # nothing matches the band, but without stats nothing may prune
    assert p["pruned_groups"] == 0 and p["rows_scanned"] == 20
    assert p["col_present"]


def test_absent_column_scans_whole_file():
    import pyarrow as pa

    payload = _write({"x": pa.array(list(range(12)))}, row_group_size=4)
    p = plan_parquet_skip(payload, "y", 0, 5)
    assert not p["col_present"]
    assert p["pruned_groups"] == 0 and p["rows_scanned"] == 12


def test_reject_and_degenerate_legs():
    assert plan_parquet_skip(b"", "c0", 0, 1) is None
    assert plan_parquet_skip(b"PAR1junk", "c0", 0, 1) is None
    corrupt = bytearray(synth_parquet(0))
    corrupt[-1] ^= 0xFF
    assert plan_parquet_skip(bytes(corrupt), "c0", 0, 1) is None
    # inverted band is a caller error, not a 0-row scan plan
    assert plan_parquet_skip(synth_parquet(0), "c0", 5, 4) is None


def test_frame_api_and_plan(spark):
    import pyarrow as pa

    from danae_spark.multimodal.skipping import parquet_skip_frame

    rows = [
        (0, _write({"x": pa.array(list(range(10)))}, row_group_size=5)),
        (1, _write({"x": pa.array(list(range(200, 210)))}, row_group_size=5)),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = parquet_skip_frame(df, "x", 0, 50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert got[0]["rows_scanned"] == 10 and not got[0]["file_pruned"]
    assert got[1]["file_pruned"] and got[1]["rows_scanned"] == 0
    assert got[2]["n_row_groups"] is None


def test_registry_duckdb_parity(spark, sf_dir):
    """Strict DuckDB compare of the registered entry at test scale."""
    import duckdb

    from danae_spark.multimodal.skipping import PARQUET_SKIPPING_ORACLE
    from danae_spark.queries import load_all

    import os

    from danae_spark.catalog import table_path

    sdf = load_all()["parquet_skipping_plan"].fn(spark, sf_dir).toPandas()
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')"
    )
    ddf = con.execute(PARQUET_SKIPPING_ORACLE).fetchdf()
    assert list(sdf.columns) == list(ddf.columns)
    assert len(sdf) == len(ddf)
    for c in sdf.columns:
        a = sdf[c].tolist()
        b = ddf[c].tolist()
        norm = lambda v: None if v is None or (isinstance(v, float) and v != v) else v
        assert [norm(x) for x in a] == [norm(x) for x in b], c


# ------------------------------------------------- Delta file pruning


def _delta_expect(d: int):
    from danae_spark.multimodal.skipping import DELTA_HI, DELTA_LO

    if d % 17 == 5 or d % 13 == 8:
        return None
    nc = 2 + d % 3
    js = [0] + ([1] if nc == 2 else []) + list(range(2, nc + 1))
    files = []
    for j in sorted(js):
        glen = 5 + (d + j) % 6
        start = (d + 3 * j) % 50
        fmin, fmax = (start, start + glen - 1) if start + glen <= 50 else (0, 49)
        if d % 23 == 7 and j == 0:
            fmax = 999
        files.append((glen, fmin, fmax))
    pruned = sum(1 for g, a, b in files if b < DELTA_LO or a > DELTA_HI)
    return {
        "n_live_files": len(files),
        "files_pruned": pruned,
        "files_scanned": len(files) - pruned,
        "rows_total": sum(f[0] for f in files),
        "rows_scanned": sum(
            g for g, a, b in files if not (b < DELTA_LO or a > DELTA_HI)
        ),
        "table_skipped": pruned == len(files),
        "stats_consistent": d % 23 != 7,
    }


def test_delta_grid_matches_arithmetic():
    from danae_spark.multimodal.deltalog import synth_delta_table
    from danae_spark.multimodal.skipping import (
        DELTA_HI,
        DELTA_LO,
        plan_delta_skip,
    )

    mix = {"skipped": 0, "partial": 0, "lying": 0}
    for d in range(200):
        got = plan_delta_skip(synth_delta_table(d), "c0", DELTA_LO, DELTA_HI)
        assert got == _delta_expect(d), d
        if got is None:
            continue
        mix["skipped"] += got["table_skipped"]
        mix["partial"] += bool(got["files_pruned"]) and not got["table_skipped"]
        mix["lying"] += not got["stats_consistent"]
    assert all(v > 0 for v in mix.values()), mix


def test_delta_lying_stats_change_the_decision():
    """The d%23==7 leg's lying max keeps F0 scanned even when its real
    data sits entirely below the band — pruning trusts the log, and
    the footer cross-check is what surfaces the lie."""
    from danae_spark.multimodal.deltalog import synth_delta_table
    from danae_spark.multimodal.skipping import plan_delta_skip

    d = 7  # d%23==7: F0 holds c0 in [7..13], log claims max 999
    honest = plan_delta_skip(synth_delta_table(31), "c0", 200, 300)
    assert honest["table_skipped"] and honest["stats_consistent"]
    lying = plan_delta_skip(synth_delta_table(d), "c0", 200, 300)
    assert not lying["stats_consistent"]
    assert lying["files_scanned"] == 1  # only the lying file survives


def test_delta_skip_rejects():
    from danae_spark.multimodal.deltalog import synth_delta_table
    from danae_spark.multimodal.skipping import plan_delta_skip

    assert plan_delta_skip(synth_delta_table(5), "c0", 0, 9) is None  # protocol
    assert plan_delta_skip(synth_delta_table(8), "c0", 0, 9) is None  # torn
    assert plan_delta_skip(b"not a tar", "c0", 0, 9) is None
    assert plan_delta_skip(synth_delta_table(0), "c0", 9, 0) is None


def test_delta_missing_stats_force_scan():
    """Adds without minValues/maxValues (pre-stats writers) must scan."""
    import io
    import json
    import tarfile

    from danae_spark.multimodal.skipping import plan_delta_skip

    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(pa.table({"c0": pa.array([1, 2, 3])}), buf)
    blob = buf.getvalue()
    commit = "\n".join([
        json.dumps({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}),
        json.dumps({"metaData": {"id": "t", "schemaString": "{}",
                                 "partitionColumns": []}}),
        json.dumps({"add": {"path": "f.parquet", "size": len(blob),
                            "dataChange": True, "partitionValues": {},
                            "stats": json.dumps({"numRecords": 3})}}),
    ]) + "\n"
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as tf:
        for name, data in [("_delta_log/" + "0" * 20 + ".json",
                            commit.encode()), ("f.parquet", blob)]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    got = plan_delta_skip(tbuf.getvalue(), "c0", 100, 200)
    assert got["files_pruned"] == 0 and got["rows_scanned"] == 3
    # no log stats for the column -> nothing to cross-check: consistent
    assert got["stats_consistent"]


def test_delta_frame_api_plan(spark):
    from danae_spark.multimodal.deltalog import synth_delta_table
    from danae_spark.multimodal.skipping import delta_skip_frame

    df = spark.createDataFrame(
        [(0, bytearray(synth_delta_table(0))), (1, None)],
        "doc_id long, payload binary",
    )
    out = delta_skip_frame(df, "c0", 15, 25)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert got[0]["n_live_files"] == 3 and got[1]["n_live_files"] is None


# ----------------------------------------------- Iceberg file pruning


def test_iceberg_grid_matches_arithmetic():
    from danae_spark.multimodal.iceberg import synth_iceberg_table
    from danae_spark.multimodal.skipping import (
        ICE_HI,
        ICE_LO,
        plan_iceberg_skip,
    )

    def expect(d):
        if d % 17 == 2 or d % 13 == 4:
            return None
        files = []
        for m in range(1 + d % 2):
            for k in range(1 + (d + m) % 3):
                if d % 4 == 1 and m == 0 and k == 0:
                    continue
                glen = 5 + (d + 3 * m + k) % 6
                start = (d + m + k) % 50
                fmin, fmax = (
                    (start, start + glen - 1) if start + glen <= 50 else (0, 49)
                )
                if d % 31 == 3 and m == 0 and k == 0:
                    fmax = 999
                files.append((glen, fmin, fmax, d % 11 == 6))
        pruned = sum(
            1 for g, a, b, nb in files if not nb and (b < ICE_LO or a > ICE_HI)
        )
        return {
            "n_live_files": len(files),
            "files_pruned": pruned,
            "files_scanned": len(files) - pruned,
            "rows_total": sum(f[0] for f in files),
            "rows_scanned": sum(
                g for g, a, b, nb in files
                if nb or not (b < ICE_LO or a > ICE_HI)
            ),
            "table_skipped": len(files) > 0 and pruned == len(files),
            "stats_consistent": not (
                d % 31 == 3 and d % 11 != 6 and d % 4 != 1
            ),
        }

    mix = {"skipped": 0, "nobounds": 0, "lying": 0}
    for d in range(200):
        got = plan_iceberg_skip(synth_iceberg_table(d), 1, ICE_LO, ICE_HI)
        assert got == expect(d), d
        if got is None:
            continue
        mix["skipped"] += got["table_skipped"]
        mix["nobounds"] += d % 11 == 6
        mix["lying"] += not got["stats_consistent"]
    assert all(v > 0 for v in mix.values()), mix


def test_iceberg_skip_bounds_semantics():
    from danae_spark.multimodal.iceberg import synth_iceberg_table
    from danae_spark.multimodal.skipping import plan_iceberg_skip

    # d=6: no-bounds leg (6%11==6) — a far band still scans everything
    got = plan_iceberg_skip(synth_iceberg_table(6), 1, 1000, 2000)
    assert got["files_pruned"] == 0 and got["rows_scanned"] == got["rows_total"]
    # d=0: truthful bounds, far band prunes the whole table
    got = plan_iceberg_skip(synth_iceberg_table(0), 1, 1000, 2000)
    assert got["table_skipped"] and got["stats_consistent"]
    # an unknown field id has no bounds anywhere: full scan
    got = plan_iceberg_skip(synth_iceberg_table(0), 99, 1000, 2000)
    assert got["files_pruned"] == 0
    # census refusals carry over
    assert plan_iceberg_skip(synth_iceberg_table(2), 1, 0, 9) is None
    assert plan_iceberg_skip(synth_iceberg_table(4), 1, 0, 9) is None
    assert plan_iceberg_skip(b"junk", 1, 0, 9) is None


def test_iceberg_frame_api_plan(spark):
    from danae_spark.multimodal.iceberg import synth_iceberg_table
    from danae_spark.multimodal.skipping import iceberg_skip_frame

    df = spark.createDataFrame(
        [(0, bytearray(synth_iceberg_table(0))), (1, None)],
        "doc_id long, payload binary",
    )
    out = iceberg_skip_frame(df, 1, 15, 25)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert got[0]["n_live_files"] == 1 and got[1]["n_live_files"] is None
