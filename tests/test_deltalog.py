"""Delta-log replay: tar-blob census roundtrip + reject legs + fuzz,
and the on-disk reader twin (read_delta) with time travel, tombstone
exclusion and protocol refusal."""

import io
import json
import os
import random
import tarfile

import pytest

from danae_spark.multimodal.deltalog import (
    delta_file_rows,
    delta_n_commits,
    parse_delta_table,
    synth_delta_table,
)
from danae_spark.sources.delta import (
    DeltaProtocolError,
    read_delta,
    replay_delta_log,
)


def test_census_roundtrip_grid():
    for d in range(120):
        r = parse_delta_table(synth_delta_table(d))
        if d % 17 == 5 or d % 13 == 8:
            assert r is None, d
            continue
        n = delta_n_commits(d)
        live = [j for j in range(n + 1) if not (j == 1 and n >= 3)]
        assert r["n_commits"] == n and r["n_adds"] == n + 1, (d, r)
        assert r["live_files"] == len(live)
        assert r["live_rows"] == sum(delta_file_rows(d, j) for j in live)
        assert r["sizes_consistent"] and r["footers_consistent"]


def _clean_doc() -> int:
    for d in range(400):
        if d % 17 != 5 and d % 13 != 8 and delta_n_commits(d) >= 3:
            return d
    raise AssertionError


def test_missing_data_file_rejects():
    d = _clean_doc()
    raw = synth_delta_table(d)
    # drop one referenced parquet member: rebuild the tar without it
    src = tarfile.open(fileobj=io.BytesIO(raw))
    out = io.BytesIO()
    dst = tarfile.open(fileobj=out, mode="w", format=tarfile.USTAR_FORMAT)
    dropped = False
    for m in src.getmembers():
        if not dropped and m.name.endswith(".parquet"):
            dropped = True
            continue
        data = src.extractfile(m).read() if m.isfile() else None
        dst.addfile(m, io.BytesIO(data) if data is not None else None)
    dst.close()
    assert dropped
    assert parse_delta_table(out.getvalue()) is None


def test_lying_add_size_flags_inconsistent():
    d = _clean_doc()
    raw = synth_delta_table(d)
    # rewrite one commit: bump an add action's recorded size by 1
    src = tarfile.open(fileobj=io.BytesIO(raw))
    out = io.BytesIO()
    dst = tarfile.open(fileobj=out, mode="w", format=tarfile.USTAR_FORMAT)
    lied = False
    for m in src.getmembers():
        data = src.extractfile(m).read() if m.isfile() else None
        if data is not None and m.name.endswith(".json") and not lied:
            lines = []
            for ln in data.decode().splitlines():
                a = json.loads(ln)
                if "add" in a and not lied:
                    a["add"]["size"] += 1
                    lied = True
                lines.append(json.dumps(a))
            data = ("\n".join(lines) + "\n").encode()
            m.size = len(data)
        dst.addfile(m, io.BytesIO(data) if data is not None else None)
    dst.close()
    assert lied
    r = parse_delta_table(out.getvalue())
    assert r is not None and r["sizes_consistent"] is False
    assert r["footers_consistent"] is True


def test_fuzz_never_raises():
    rng = random.Random(171)
    for trial in range(150):
        d = rng.randrange(80)
        raw = bytearray(synth_delta_table(d))
        op = trial % 3
        if op == 0:
            raw = raw[: rng.randrange(len(raw))]
        elif op == 1:
            for _ in range(rng.randrange(1, 8)):
                raw[rng.randrange(len(raw))] = rng.randrange(256)
        else:
            raw = raw[512:]  # decapitate the first header
        r = parse_delta_table(bytes(raw))
        assert r is None or isinstance(r, dict)


# ------------------------------------------------ on-disk reader twin


def _extract(tmp_path, d: int) -> str:
    table = os.path.join(tmp_path, f"tbl{d}")
    with tarfile.open(fileobj=io.BytesIO(synth_delta_table(d))) as tf:
        tf.extractall(table, filter="data")
    return table


def test_read_delta_excludes_tombstones(spark, tmp_path):
    d = _clean_doc()  # has one remove action
    table = _extract(tmp_path, d)
    n = delta_n_commits(d)
    live = [j for j in range(n + 1) if not (j == 1 and n >= 3)]
    df = read_delta(spark, table)
    assert df.count() == sum(delta_file_rows(d, j) for j in live)
    # the tombstoned file is still on disk (pre-vacuum) — a glob reader
    # would double-read it; the replayed reader must not
    on_disk = [f for f in os.listdir(table) if f.endswith(".parquet")]
    assert len(on_disk) == n + 1 > len(live)


def test_read_delta_time_travel(spark, tmp_path):
    d = _clean_doc()
    table = _extract(tmp_path, d)
    # at version 0 only F0 and F1 exist
    df0 = read_delta(spark, table, version=0)
    assert df0.count() == delta_file_rows(d, 0) + delta_file_rows(d, 1)
    with pytest.raises(ValueError):
        read_delta(spark, table, version=99)


def test_read_delta_partition_values_from_log(spark, tmp_path):
    for d in range(60):
        if d % 3 == 0 and d % 17 != 5 and d % 13 != 8:
            break
    table = _extract(tmp_path, d)
    df = read_delta(spark, table)
    assert "pc" in df.columns  # attached from the log, not the files
    n = delta_n_commits(d)
    live = [j for j in range(n + 1) if not (j == 1 and n >= 3)]
    got = {r["pc"] for r in df.select("pc").distinct().collect()}
    assert got == {str(j % 2) for j in live}


def test_protocol_refusal_and_torn_chain(tmp_path):
    d5 = next(d for d in range(100) if d % 17 == 5 and d % 13 != 8)
    table = _extract(tmp_path, d5)
    with pytest.raises(DeltaProtocolError):
        replay_delta_log(table)
    d8 = next(d for d in range(100) if d % 13 == 8 and d % 17 != 5)
    table8 = _extract(tmp_path, d8)
    with pytest.raises(ValueError):
        replay_delta_log(table8)
