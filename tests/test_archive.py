"""Archive census (multimodal/archive.py): ZIP/TAR/TAR.GZ walks, data
verification, triage routing of members, registered oracle."""

import os
import struct
import zlib

import duckdb

from danae_spark.multimodal.archive import (
    ARCHIVE_CENSUS_ORACLE,
    _tar_build,
    _zip_build,
    archive_census_frame,
    archive_format,
    archive_n_files,
    iter_archive_members,
    parse_archive,
    synth_archive,
)


def test_roundtrip_grid():
    from danae_spark.multimodal.triage import triage_payload

    for d in range(90):
        c = parse_archive(synth_archive(d))
        assert c is not None, d
        assert c["format"] == archive_format(d), d
        assert c["n_files"] == archive_n_files(d), d
        assert c["n_dirs"] == 1 and c["first_name"] == "sub/", d
        # media-class counts equal direct triage of each member
        want = {"audio": 0, "image": 0, "video": 0, "subtitle": 0}
        for name, is_dir, data in iter_archive_members(synth_archive(d)):
            if not is_dir:
                t = triage_payload(data)
                assert t is not None, (d, name)
                want[t["media_class"]] += 1
        assert c["n_audio"] == want["audio"] and c["n_image"] == want["image"], d
        assert c["n_video"] == want["video"] and c["n_subtitle"] == want["subtitle"], d


def test_byte_totals_pinned():
    """total_bytes / total_compressed (excluded from the SQL oracle —
    raw media lengths are not SQL-restatable) pinned against the
    synthesizer here."""
    from danae_spark.multimodal.triage import synth_media

    for d in (0, 1, 2, 3, 7, 11):
        c = parse_archive(synth_archive(d))
        datas = [synth_media(d * 8 + m) for m in range(archive_n_files(d))]
        assert c["total_bytes"] == sum(len(x) for x in datas), d
        if archive_format(d) == "zip":
            want_c = sum(
                len(x) if m % 2 == 0 else len(zlib.compress(x, 6)[2:-4])
                for m, x in enumerate(datas)
            )
            assert c["total_compressed"] == want_c, d
        else:
            assert c["total_compressed"] == c["total_bytes"], d


def test_zip_verification_rejections():
    z = bytearray(_zip_build([("a.txt", b"hello world", 0), ("b.txt", b"data" * 20, 8)]))
    assert parse_archive(bytes(z))["n_files"] == 2
    # flip a data byte inside the first stored member -> CRC mismatch
    ix = bytes(z).find(b"hello")
    z2 = bytearray(z)
    z2[ix] ^= 0xFF
    assert parse_archive(bytes(z2)) is None
    # encryption flag bit set in the central directory
    cd = bytes(z).find(b"PK\x01\x02")
    z3 = bytearray(z)
    z3[cd + 8] |= 0x01
    assert parse_archive(bytes(z3)) is None
    # unsupported method
    z4 = bytearray(z)
    z4[cd + 10] = 99
    assert parse_archive(bytes(z4)) is None
    # truncated EOCD comment accounting
    assert parse_archive(bytes(z) + b"junk") is None
    # central-directory count lie
    eocd = bytes(z).rfind(b"PK\x05\x06")
    z5 = bytearray(z)
    z5[eocd + 10] = 3
    assert parse_archive(bytes(z5)) is None


def test_zip_local_header_cross_check():
    z = bytearray(_zip_build([("a.txt", b"payload", 0)]))
    # corrupt the local header name so it disagrees with the central dir
    ix = bytes(z).find(b"a.txt")
    z[ix] = ord("x")
    assert parse_archive(bytes(z)) is None


def test_tar_rejections():
    t = _tar_build([("dir/", None), ("f.bin", b"x" * 700)])
    assert parse_archive(t)["n_files"] == 1
    # checksum corruption
    bad = bytearray(t)
    bad[0] ^= 0x01
    assert parse_archive(bytes(bad)) is None
    # missing the two zero end blocks
    assert parse_archive(t[:-1024]) is None
    # truncated data
    assert parse_archive(t[:512]) is None
    # non-block-multiple length
    assert parse_archive(t + b"\x00") is None


def test_targz_single_member_contract():
    t = _tar_build([("f.bin", b"y" * 100)])

    def gz(raw):
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        return c.compress(raw) + c.flush()

    assert parse_archive(gz(t))["format"] == "tar.gz"
    # trailing garbage rejects
    assert parse_archive(gz(t) + b"zz") is None
    # truncated member rejects
    assert parse_archive(gz(t)[:-3]) is None
    # two-member gzip (the WARC convention, not the tar.gz one) rejects
    assert parse_archive(gz(t) + gz(t)) is None


def test_frame_nulls_and_id_col(spark):
    df = spark.createDataFrame(
        [(1, bytearray(synth_archive(1))), (2, bytearray(b"PK\x03\x04junk")), (3, None)],
        "media_id long, blob binary",
    )
    out = {
        r["media_id"]: r
        for r in archive_census_frame(df, id_col="media_id", payload_col="blob").collect()
    }
    assert out[1]["format"] == "tar"
    assert out[2]["format"] is None and out[3]["format"] is None


def test_registered_oracle_matches_duckdb(spark, sf_dir):
    from danae_spark.catalog import table_path
    from danae_spark.queries import load_all

    fn = load_all()["archive_census"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(ARCHIVE_CENSUS_ORACLE).fetchall()]
    assert len(got) == len(want) and got == want
