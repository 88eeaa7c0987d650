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
