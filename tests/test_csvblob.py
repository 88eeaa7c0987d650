"""CSV blob census (multimodal/csvblob.py): RFC 4180 grammar, sniff,
reject-whole, registered oracle, fuzz."""

import os
import random

import duckdb

from danae_spark.multimodal.csvblob import (
    CSV_CENSUS_ORACLE,
    csv_census_frame,
    csv_n_cols,
    csv_n_rows,
    parse_csv_blob,
    synth_csv,
)


def test_quote_aware_row_counting():
    blob = b'a,b\n"line\nbreak",2\n"he said ""hi""",3\n'
    r = parse_csv_blob(blob)
    assert r is not None
    assert r["n_rows"] == 2  # the embedded newline is NOT a row break
    assert r["n_quoted"] == 2 and r["delimiter"] == "comma"
    assert r["first_value"] == "line\nbreak"


def test_dialect_sniff():
    assert parse_csv_blob(b"a;b;c\n1;2;3\n")["delimiter"] == "semicolon"
    assert parse_csv_blob(b"a\tb\n1\t2\n")["delimiter"] == "tab"
    assert parse_csv_blob(b"a|b\n1|2\n")["delimiter"] == "pipe"
    # a quoted comma must not fool the semicolon sniff
    r = parse_csv_blob(b'x;y\n"1,5";2\n')
    assert r["delimiter"] == "semicolon" and r["first_value"] == "1,5"


def test_ragged_and_crlf():
    r = parse_csv_blob(b"a,b\r\n1,2\r\n3,4,5\r\n")
    assert r["n_rows"] == 2 and r["n_ragged"] == 1 and r["n_cols"] == 2


def test_rejects():
    assert parse_csv_blob(b"") is None
    assert parse_csv_blob(b"a,b\n\"unterminated") is None
    assert parse_csv_blob(b'a,b\n1,2"3\n') is None  # bare quote mid-field
    assert parse_csv_blob(b'a,b\n"x"y,2\n') is None  # text after closing quote
    assert parse_csv_blob(b"onlyonecolumn\nstill\n") is None  # no grid
    assert parse_csv_blob(b"\x00\x01binary") is None
    assert parse_csv_blob(synth_csv(3)) is None  # reject leg d%19==3
    assert parse_csv_blob(synth_csv(22)) is None


def test_synth_grid_roundtrip():
    for d in range(80):
        r = parse_csv_blob(synth_csv(d))
        if d % 19 == 3:
            assert r is None, d
            continue
        assert r is not None, d
        assert r["n_rows"] == csv_n_rows(d), d
        assert r["n_cols"] == csv_n_cols(d), d
        assert r["n_ragged"] == (1 if d % 13 == 6 else 0), d
        assert r["header"] == "/".join(f"col{c}" for c in range(csv_n_cols(d))), d


def test_fuzz_never_crashes():
    rng = random.Random(1437)
    for d in (1, 2, 9):
        base = bytearray(synth_csv(d))
        for _ in range(300):
            z = bytearray(base)
            for _ in range(rng.randint(1, 3)):
                z[rng.randrange(len(z))] ^= 1 << rng.randrange(8)
            parse_csv_blob(bytes(z))


def test_frame_and_registered_oracle(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.queries import load_all

    df = spark.createDataFrame(
        [(d, bytearray(synth_csv(d))) for d in range(25)] + [(99, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in csv_census_frame(df).collect()}
    assert got[3]["delimiter"] is None and got[99]["delimiter"] is None
    assert got[1]["delimiter"] == "semicolon"

    fn = load_all()["csv_blob_census"].fn
    got2 = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(CSV_CENSUS_ORACLE).fetchall()]
    assert len(got2) == len(want) and got2 == want


# ---------------------------------------------------------------- json


def test_json_kinds_and_counts():
    from danae_spark.multimodal.jsonblob import parse_json_blob

    r = parse_json_blob(b'{"a": 1, "b": {"c": [null, "x"]}}')
    assert r["kind"] == "object" and r["n_records"] == 1
    assert r["n_keys"] == 2 and r["keys"] == "a/b"
    assert r["max_depth"] == 4  # obj > b > c-array > items
    assert r["n_strings"] == 1 and r["n_numbers"] == 1 and r["n_nulls"] == 1

    r2 = parse_json_blob(b'{"x":1}\n{"x":2}\n{"x":3}\n')
    assert r2["kind"] == "jsonl" and r2["n_records"] == 3

    r3 = parse_json_blob(b"[1, 2, 3]")
    assert r3["kind"] == "array" and r3["n_records"] == 3 and r3["max_depth"] == 2

    assert parse_json_blob(b"[]")["n_records"] == 0
    assert parse_json_blob(b'"just a string"')["kind"] == "scalar"


def test_json_rejects():
    from danae_spark.multimodal.jsonblob import parse_json_blob, synth_json

    assert parse_json_blob(b"") is None
    assert parse_json_blob(b"{broken") is None
    assert parse_json_blob(b'{"a":1} trailing') is None
    # one malformed line rejects the whole JSONL
    assert parse_json_blob(b'{"x":1}\n{oops\n{"x":3}\n') is None
    assert parse_json_blob(b"\xff\xfe") is None
    for d in (7, 30, 53):  # d % 23 == 7 across all three kinds
        assert parse_json_blob(synth_json(d)) is None, d


def test_json_frame_and_registered_oracle(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.multimodal.jsonblob import (
        JSON_CENSUS_ORACLE,
        json_census_frame,
        synth_json,
    )
    from danae_spark.queries import load_all

    df = spark.createDataFrame(
        [(d, bytearray(synth_json(d))) for d in range(20)] + [(99, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in json_census_frame(df).collect()}
    assert got[0]["kind"] == "jsonl" and got[7]["kind"] is None
    assert got[99]["kind"] is None

    fn = load_all()["json_blob_census"].fn
    got2 = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(JSON_CENSUS_ORACLE).fetchall()]
    assert len(got2) == len(want) and got2 == want


# -------------------------------------------------------------- parquet


def test_parquet_census_and_rejects():
    from danae_spark.multimodal.parquetblob import (
        parse_parquet_blob,
        pq_n_cols,
        pq_n_rows,
        pq_rg,
        synth_parquet,
    )

    for d in (0, 1, 2, 5, 11, 20):
        r = parse_parquet_blob(synth_parquet(d))
        assert r is not None, d
        assert r["n_rows"] == pq_n_rows(d) and r["n_cols"] == pq_n_cols(d), d
        assert r["first_group_rows"] == pq_rg(d), d
        want_groups = -(-pq_n_rows(d) // pq_rg(d))
        assert r["n_row_groups"] == want_groups, d
    assert parse_parquet_blob(synth_parquet(9)) is None  # reject leg
    assert parse_parquet_blob(b"") is None
    assert parse_parquet_blob(b"PAR1 not really a footer") is None
    ok = synth_parquet(1)
    assert parse_parquet_blob(ok[: len(ok) // 2]) is None  # truncated


def test_parquet_frame_and_registered_oracle(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.multimodal.parquetblob import (
        PARQUET_CENSUS_ORACLE,
        parquet_census_frame,
        synth_parquet,
    )
    from danae_spark.queries import load_all

    df = spark.createDataFrame(
        [(d, bytearray(synth_parquet(d))) for d in range(12)] + [(99, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in parquet_census_frame(df).collect()}
    assert got[9]["n_rows"] is None and got[99]["n_rows"] is None
    assert got[1]["compression"] == "GZIP"

    fn = load_all()["parquet_blob_census"].fn
    got2 = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(PARQUET_CENSUS_ORACLE).fetchall()]
    assert len(got2) == len(want) and got2 == want


# --------------------------------------------------------------- sqlite


def test_sqlite_census_and_rejects():
    from danae_spark.multimodal.sqliteblob import (
        parse_sqlite_blob,
        sq_cols,
        sq_n_tables,
        sq_rows,
        synth_sqlite,
    )

    for d in (0, 1, 2, 5, 9, 14):
        r = parse_sqlite_blob(synth_sqlite(d))
        assert r is not None, d
        assert r["n_tables"] == sq_n_tables(d), d
        assert r["total_rows"] == sum(
            sq_rows(d, k) for k in range(sq_n_tables(d))
        ), d
        assert r["first_table_cols"] == sq_cols(d, 0), d
        assert r["n_indexes"] == (1 if d % 2 == 0 else 0), d
    assert parse_sqlite_blob(synth_sqlite(11)) is None  # reject leg
    assert parse_sqlite_blob(b"") is None
    assert parse_sqlite_blob(b"not a database") is None
    ok = synth_sqlite(1)
    assert parse_sqlite_blob(ok[:100]) is None  # truncated


def test_sqlite_frame_and_registered_oracle(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.multimodal.sqliteblob import (
        SQLITE_CENSUS_ORACLE,
        sqlite_census_frame,
        synth_sqlite,
    )
    from danae_spark.queries import load_all

    df = spark.createDataFrame(
        [(d, bytearray(synth_sqlite(d))) for d in range(14)] + [(99, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in sqlite_census_frame(df).collect()}
    assert got[11]["n_tables"] is None and got[99]["n_tables"] is None
    assert got[2]["n_tables"] == 3

    fn = load_all()["sqlite_blob_census"].fn
    got2 = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(SQLITE_CENSUS_ORACLE).fetchall()]
    assert len(got2) == len(want) and got2 == want


# ----------------------------------------------------------- access log


def test_access_log_census():
    from danae_spark.multimodal.accesslog import parse_access_log

    log = (
        b'1.2.3.4 - alice [10/Oct/2025:13:55:36 +0000] "GET /x HTTP/1.1" 200 512\n'
        b'5.6.7.8 - - [10/Oct/2025:13:55:37 +0000] "POST /y HTTP/1.0" 404 -\n'
        b'garbage line here\n'
        b'1.2.3.4 - - [10/Oct/2025:13:55:38 +0000] "GET /z HTTP/2.0" 503 9 '
        b'"https://r.ex" "curl/8"\n'
    )
    r = parse_access_log(log)
    assert r["n_requests"] == 3 and r["n_malformed"] == 1
    assert r["n_2xx"] == 1 and r["n_4xx"] == 1 and r["n_5xx"] == 1
    assert r["n_hosts"] == 2 and r["total_bytes"] == 521
    assert r["n_combined"] == 1 and r["first_host"] == "1.2.3.4"
    # blob-level rejects
    assert parse_access_log(b"") is None
    assert parse_access_log(b"\x00\x01") is None
    assert parse_access_log(b"no requests at all\njust text\n") is None


def test_access_log_frame_and_registered_oracle(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.multimodal.accesslog import (
        ACCESS_LOG_CENSUS_ORACLE,
        access_log_census_frame,
        synth_access_log,
    )
    from danae_spark.queries import load_all

    df = spark.createDataFrame(
        [(d, bytearray(synth_access_log(d))) for d in range(15)] + [(99, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in access_log_census_frame(df).collect()}
    assert got[13]["n_requests"] is None and got[99]["n_requests"] is None
    assert got[1]["n_combined"] == got[1]["n_requests"]  # combined on odd d

    fn = load_all()["access_log_census"].fn
    got2 = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(ACCESS_LOG_CENSUS_ORACLE).fetchall()]
    assert len(got2) == len(want) and got2 == want


# ----------------------------------------------------------------- chat


def test_chat_validation_rules():
    from danae_spark.multimodal.jsonblob import parse_chat_blob, validate_conversation

    ok = {"messages": [
        {"role": "system", "content": "s"},
        {"role": "user", "content": "q"},
        {"role": "assistant", "content": "a"},
    ]}
    assert validate_conversation(ok)
    # assistant first, double user, empty content, unknown role, mid
    # system -> all invalid
    assert not validate_conversation({"messages": [{"role": "assistant", "content": "a"}]})
    assert not validate_conversation({"messages": [
        {"role": "user", "content": "q"}, {"role": "user", "content": "q2"}]})
    assert not validate_conversation({"messages": [{"role": "user", "content": ""}]})
    assert not validate_conversation({"messages": [{"role": "tool", "content": "x"}]})
    assert not validate_conversation({"messages": [
        {"role": "user", "content": "q"}, {"role": "system", "content": "s"}]})
    assert not validate_conversation({"messages": []})

    import json as _json

    blob = ("\n".join([
        _json.dumps(ok),
        _json.dumps({"messages": [{"role": "assistant", "content": "bad"}]}),
    ]) + "\n").encode()
    r = parse_chat_blob(blob)
    assert r["n_convs"] == 2 and r["n_valid"] == 1 and r["n_invalid"] == 1
    assert r["n_with_system"] == 1 and r["n_turns"] == 2 and r["assistant_chars"] == 1
    # blob-level rejects
    from danae_spark.multimodal.jsonblob import synth_chat

    assert parse_chat_blob(b"") is None
    assert parse_chat_blob(b"not json\n{}\n") is None
    assert parse_chat_blob(synth_chat(17)) is None  # d % 29 == 17


def test_chat_frame_and_registered_oracle(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.multimodal.jsonblob import (
        CHAT_CENSUS_ORACLE,
        chat_census_frame,
        synth_chat,
    )
    from danae_spark.queries import load_all

    df = spark.createDataFrame(
        [(d, bytearray(synth_chat(d))) for d in range(18)] + [(99, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in chat_census_frame(df).collect()}
    assert got[17]["n_convs"] is None and got[99]["n_convs"] is None
    assert got[3]["n_invalid"] >= 1  # (3+0)%7==3 conversation is invalid

    fn = load_all()["chat_jsonl_census"].fn
    got2 = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(CHAT_CENSUS_ORACLE).fetchall()]
    assert len(got2) == len(want) and got2 == want


# ---------------------------------------------------------------- avro


def test_avro_census_and_rejects():
    from danae_spark.multimodal.avroblob import parse_avro_blob, synth_avro

    r = parse_avro_blob(synth_avro(4))
    assert r == {
        "codec": "null", "schema_name": "r4", "n_fields": 1, "n_blocks": 2,
        "n_records": 2 + 0 + 2 + 1, "total_payload": 5,
    }
    assert parse_avro_blob(synth_avro(7)) is None  # corrupted sync leg
    # deflate codec actually decompresses
    r = parse_avro_blob(synth_avro(5))
    assert r["codec"] == "deflate" and r["total_payload"] == r["n_records"] * 2
    # unknown codec rejects whole (never census the unreadable)
    blob = synth_avro(2)
    assert b"null" in blob
    assert parse_avro_blob(blob.replace(b"avro.codec\x08null", b"avro.codec\x08snap")) is None
    # bad magic / truncation / garbage
    assert parse_avro_blob(b"Obj\x02" + blob[4:]) is None
    assert parse_avro_blob(blob[: len(blob) // 2]) != parse_avro_blob(blob)
    assert parse_avro_blob(b"") is None


def test_avro_fuzz_never_crashes():
    import random

    from danae_spark.multimodal.avroblob import parse_avro_blob, synth_avro

    rng = random.Random(7)
    blob = synth_avro(9)
    for _ in range(800):
        buf = bytearray(blob)
        i = rng.randrange(len(buf) * 8)
        buf[i >> 3] ^= 1 << (i & 7)
        parse_avro_blob(bytes(buf))
    for _ in range(400):
        parse_avro_blob(bytes(rng.randrange(256) for _ in range(rng.randrange(1, 90))))


def test_avro_frame_and_registered_oracle(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.multimodal.avroblob import (
        AVRO_CENSUS_ORACLE,
        avro_census_frame,
        synth_avro,
    )
    from danae_spark.queries import load_all

    df = spark.createDataFrame(
        [(d, bytearray(synth_avro(d))) for d in range(25)] + [(99, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in avro_census_frame(df).collect()}
    assert got[7]["codec"] is None and got[99]["codec"] is None
    assert got[1]["codec"] == "deflate" and got[2]["codec"] == "null"
    assert got[3]["n_fields"] == 4

    fn = load_all()["avro_blob_census"].fn
    got2 = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(AVRO_CENSUS_ORACLE).fetchall()]
    assert len(got2) == len(want) and got2 == want


# ----------------------------------------------------------------- orc


def test_orc_census_and_rejects():
    from danae_spark.multimodal.orcblob import parse_orc_blob, synth_orc

    r = parse_orc_blob(synth_orc(5))
    assert r["compression"] == "none" and r["n_rows"] == 15
    assert r["n_stripes"] == 1 and r["columns"] == "c0/c1/c2"
    r = parse_orc_blob(synth_orc(3))  # d%5=3 -> zstd; odd doc: 3 cols
    assert r["compression"] == "zstd" and r["columns"] == "c0/c1/c2"
    assert parse_orc_blob(synth_orc(4))["compression"] == "lz4"
    assert parse_orc_blob(synth_orc(9)) is None  # corrupted postscript leg
    blob = synth_orc(2)
    assert parse_orc_blob(b"OR\x00" + blob[3:]) is None
    assert parse_orc_blob(blob[: len(blob) // 2]) is None or True  # no crash
    assert parse_orc_blob(b"") is None


def test_orc_snappy_differential_and_fuzz():
    import random

    import pyarrow as pa

    from danae_spark.multimodal.orcblob import parse_orc_blob, snappy_decode, synth_orc

    rng = random.Random(11)
    codec = pa.Codec("snappy")
    for t in range(60):
        n = rng.randrange(0, 2000)
        data = (
            bytes(rng.choice(b"abcde") for _ in range(n))
            if t % 2
            else bytes(rng.randrange(256) for _ in range(n))
        )
        assert snappy_decode(codec.compress(data, asbytes=True)) == data
    blob = synth_orc(6)
    for _ in range(500):
        buf = bytearray(blob)
        i = rng.randrange(len(buf) * 8)
        buf[i >> 3] ^= 1 << (i & 7)
        parse_orc_blob(bytes(buf))
    for _ in range(300):
        parse_orc_blob(bytes(rng.randrange(256) for _ in range(rng.randrange(1, 80))))


def test_orc_frame_and_registered_oracle(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.multimodal.orcblob import ORC_CENSUS_ORACLE, orc_census_frame, synth_orc
    from danae_spark.queries import load_all

    df = spark.createDataFrame(
        [(d, bytearray(synth_orc(d))) for d in range(20)] + [(99, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in orc_census_frame(df).collect()}
    assert got[9]["compression"] is None and got[99]["compression"] is None
    assert got[1]["compression"] == "zlib" and got[2]["compression"] == "snappy"

    fn = load_all()["orc_blob_census"].fn
    got2 = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(ORC_CENSUS_ORACLE).fetchall()]
    assert len(got2) == len(want) and got2 == want


def test_orc_lz4_differential():
    import random

    import pyarrow as pa

    from danae_spark.multimodal.orcblob import lz4_block_decode

    rng = random.Random(13)
    codec = pa.Codec("lz4_raw")
    for t in range(60):
        n = rng.randrange(0, 3000)
        data = (
            bytes(rng.choice(b"abcd") for _ in range(n))
            if t % 2
            else bytes(rng.randrange(256) for _ in range(n))
        )
        assert lz4_block_decode(codec.compress(data, asbytes=True)) == data
    # malformed blocks reject, never crash
    for _ in range(400):
        lz4_block_decode(bytes(rng.randrange(256) for _ in range(rng.randrange(1, 60))))


# --------------------------------------------------------- blob_harvest


def test_blob_harvest_routing_sweep():
    """Every kind routes to itself across the full rotation, reject
    legs yield None, and no cross-kind capture happens (the json-ish
    rejects must not be claimed by the csv grammar, generic JSONL
    must not be claimed as chat, plain text must not be claimed as
    an access log)."""
    from danae_spark.multimodal.blobharvest import route_blob, synth_blob

    kinds = ["csv", "json", "parquet", "sqlite", "access_log", "chat",
             "avro", "orc", "notebook", "cfb"]
    rejects = [
        lambda d: d % 19 == 3, lambda d: d % 23 == 7, lambda d: d % 21 == 9,
        lambda d: d % 27 == 11, lambda d: d % 25 == 13, lambda d: d % 29 == 17,
        lambda d: d % 19 == 7, lambda d: d % 17 == 9,
        lambda d: d % 17 == 3 or d % 19 == 6 or d % 23 == 11,
        lambda d: d % 17 == 4 or d % 13 == 6 or d % 23 == 9,
    ]
    for d in range(1000):
        k = d % 10
        r = route_blob(synth_blob(d))
        if rejects[k](d):
            assert r is None, (d, kinds[k], r)
        else:
            assert r is not None and r["container"] == kinds[k], (d, kinds[k], r)
    # junk and empty
    assert route_blob(b"") is None
    assert route_blob(b"\x00\xff\x01garbage") is None
    assert route_blob(b"plain prose sentence without any structure") is None


def test_blob_harvest_frame_and_registered_oracle(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.multimodal.blobharvest import (
        BLOB_HARVEST_ORACLE,
        blob_harvest_frame,
        synth_blob,
    )
    from danae_spark.queries import load_all

    df = spark.createDataFrame(
        [(d, bytearray(synth_blob(d))) for d in range(24)] + [(99, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in blob_harvest_frame(df).collect()}
    assert got[0]["container"] == "csv" and got[7]["container"] == "orc"
    assert got[8]["container"] == "notebook"
    assert got[99]["container"] is None
    plan = blob_harvest_frame(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one narrow map, the census contract

    fn = load_all()["blob_harvest"].fn
    got2 = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(BLOB_HARVEST_ORACLE).fetchall()]
    assert len(got2) == len(want) and got2 == want
