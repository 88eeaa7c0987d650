"""Iceberg metadata-chain census: datum-codec differential, replay
grid, cross-check reject matrix, fuzz."""

import random

from danae_spark.multimodal.iceberg import (
    MANIFEST_ENTRY_SCHEMA,
    MANIFEST_LIST_SCHEMA,
    avro_datum_read,
    avro_datum_write,
    avro_file_read,
    avro_file_write,
    ice_entries,
    ice_n_manifests,
    ice_rows,
    parse_iceberg_table,
    synth_iceberg_table,
)


def _rej(d: int) -> bool:
    return d % 17 == 2 or d % 13 == 4 or d % 23 == 5


def test_datum_codec_roundtrip_randomized():
    rng = random.Random(78)
    schema = {
        "type": "record", "name": "t",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
            {"name": "c", "type": ["null", "long"]},
            {"name": "d", "type": {"type": "array", "items": "int"}},
            {"name": "e", "type": "boolean"},
            {"name": "f", "type": "double"},
            {"name": "g", "type": {
                "type": "record", "name": "inner",
                "fields": [{"name": "x", "type": "long"}],
            }},
        ],
    }
    for _ in range(300):
        rec = {
            "a": rng.randrange(-(1 << 40), 1 << 40),
            "b": "s" * rng.randrange(0, 20) + str(rng.random()),
            "c": None if rng.random() < 0.5 else rng.randrange(1 << 30),
            "d": [rng.randrange(-100, 100) for _ in range(rng.randrange(5))],
            "e": rng.random() < 0.5,
            "f": rng.random() * 1e6,
            "g": {"x": rng.randrange(1 << 20)},
        }
        enc = avro_datum_write(schema, rec)
        got, pos = avro_datum_read(schema, enc, 0)
        assert got == rec and pos == len(enc)


def test_avro_container_roundtrip():
    recs = [
        {"manifest_path": f"m{i}", "manifest_length": 10 * i,
         "partition_spec_id": 0, "added_files_count": i,
         "existing_files_count": 0, "deleted_files_count": 0,
         "added_rows_count": 5 * i, "existing_rows_count": 0,
         "deleted_rows_count": 0}
        for i in range(7)
    ]
    raw = avro_file_write(MANIFEST_LIST_SCHEMA, recs)
    schema, got = avro_file_read(raw)
    assert got == recs and schema["name"] == "manifest_file"
    assert avro_file_read(avro_file_write(MANIFEST_ENTRY_SCHEMA, []))[1] == []


def test_replay_grid():
    for d in range(120):
        r = parse_iceberg_table(synth_iceberg_table(d))
        if _rej(d):
            assert r is None, d
            continue
        live = sum(
            1
            for m in range(ice_n_manifests(d))
            for k in range(ice_entries(d, m))
            if not (d % 4 == 1 and m == 0 and k == 0)
        )
        assert r["live_files"] == live, (d, r)
        assert r["live_rows"] == sum(
            ice_rows(d, m, k)
            for m in range(ice_n_manifests(d))
            for k in range(ice_entries(d, m))
            if not (d % 4 == 1 and m == 0 and k == 0)
        )


def test_reject_matrix():
    d_v3 = next(d for d in range(100) if d % 17 == 2)
    assert parse_iceberg_table(synth_iceberg_table(d_v3)) is None
    d_missing = next(d for d in range(100) if d % 13 == 4 and d % 17 != 2)
    assert parse_iceberg_table(synth_iceberg_table(d_missing)) is None
    d_lie = next(
        d for d in range(100) if d % 23 == 5 and d % 17 != 2 and d % 13 != 4
    )
    assert parse_iceberg_table(synth_iceberg_table(d_lie)) is None


def test_manifest_length_lie_rejects():
    d = next(d for d in range(100) if not _rej(d))
    raw = bytearray(synth_iceberg_table(d))
    # corrupt one byte inside a manifest avro member: either the datum
    # decode breaks or the footer cross-check trips — reject or a
    # consistency flag, never a crash
    ix = bytes(raw).find(b"Obj\x01")
    assert ix != -1
    raw[ix + 40] ^= 0xFF
    r = parse_iceberg_table(bytes(raw))
    assert r is None or isinstance(r, dict)


def test_fuzz_never_raises():
    rng = random.Random(175)
    for trial in range(150):
        d = rng.randrange(80)
        raw = bytearray(synth_iceberg_table(d))
        if trial % 2:
            raw = raw[: rng.randrange(len(raw))]
        else:
            for _ in range(rng.randrange(1, 8)):
                raw[rng.randrange(len(raw))] = rng.randrange(256)
        r = parse_iceberg_table(bytes(raw))
        assert r is None or isinstance(r, dict)
