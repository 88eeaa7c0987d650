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


def test_zip_data_descriptor_layout():
    """Streamed-writer zips (flag bit 3, zeroed local sizes, trailing
    PK\\x07\\x08 descriptor) walk; a descriptor that contradicts the
    central directory rejects whole."""
    files = [("a.txt", b"hello stream", 0), ("b.txt", b"stream" * 30, 8)]
    z = _zip_build(files, dd=True)
    got = parse_archive(z)
    assert got is not None and got["n_files"] == 2
    assert list(iter_archive_members(z))[0][2] == b"hello stream"
    # descriptor CRC lie
    ix = z.find(b"PK\x07\x08")
    bad = bytearray(z)
    bad[ix + 4] ^= 0xFF
    assert parse_archive(bytes(bad)) is None
    # descriptor truncated off the end of the LAST member
    ix2 = z.rfind(b"PK\x07\x08")
    assert parse_archive(z[:ix2] + z[ix2 + 16 :]) is None
    # descriptor without the optional signature also walks
    nosig = z[:ix] + z[ix + 4 :]
    # (removing 4 bytes shifts offsets; only valid if we rebuild, so
    # instead verify the signature-less form via a hand-built member)
    import struct as _s

    data = b"plain"
    raw = data
    crc = zlib.crc32(data)
    lo = b"PK\x03\x04" + _s.pack("<HHHHHIIIHH", 20, 8, 0, 0, 0, 0, 0, 0, 5, 0)
    lo += b"x.txt" + raw + _s.pack("<III", crc, len(raw), len(data))  # no sig
    cd = b"PK\x01\x02" + _s.pack(
        "<HHHHHHIIIHHHHHII", 20, 20, 8, 0, 0, 0, crc, len(raw), len(data),
        5, 0, 0, 0, 0, 0, 0,
    ) + b"x.txt"
    eocd = b"PK\x05\x06" + _s.pack("<HHHHIIH", 0, 0, 1, 1, len(cd), len(lo), 0)
    assert parse_archive(lo + cd + eocd)["n_files"] == 1
    del nosig


def test_zip64_layout():
    """zip64 EOCD record + locator + 0x0001 extras walk; corrupting
    the locator or the record rejects whole."""
    files = [("sub/", b"", 0), ("a.txt", b"sixty-four", 0), ("b.txt", b"z" * 100, 8)]
    z = _zip_build(files, zip64=True)
    got = parse_archive(z)
    assert got is not None and got["n_files"] == 2 and got["n_dirs"] == 1
    assert dict(
        (n, d) for n, _dir, d in iter_archive_members(z)
    )["a.txt"] == b"sixty-four"
    # locator signature corrupt
    ix = z.rfind(b"PK\x06\x07")
    bad = bytearray(z)
    bad[ix + 3] ^= 0xFF
    assert parse_archive(bytes(bad)) is None
    # zip64 EOCD record count lie
    ix = z.rfind(b"PK\x06\x06")
    bad = bytearray(z)
    bad[ix + 24] = 9  # total entries field
    assert parse_archive(bytes(bad)) is None
    # a saturated central field with NO 0x0001 extra rejects
    zdd = _zip_build([("a.txt", b"x", 0)], zip64=True)
    cd = zdd.find(b"PK\x01\x02")
    bad = bytearray(zdd)
    # blank the extra-field id so the zip64 values can't resolve
    exoff = zdd.find(struct.pack("<HH", 1, 24), cd)
    bad[exoff] = 9
    assert parse_archive(bytes(bad)) is None


def test_zip64_wide_data_descriptor():
    """A member whose LOCAL header carries a zip64 extra must use the
    8-byte data-descriptor form (APPNOTE 4.3.9.2)."""
    import struct as _s

    data = b"wide descriptor member"
    crc = zlib.crc32(data)
    l_extra = _s.pack("<HHQQ", 1, 16, len(data), len(data))
    lo = b"PK\x03\x04" + _s.pack(
        "<HHHHHIIIHH", 45, 8, 0, 0, 0, 0, 0, 0, 5, len(l_extra)
    )
    lo += b"w.txt" + l_extra + data
    lo += b"PK\x07\x08" + _s.pack("<IQQ", crc, len(data), len(data))
    cd = b"PK\x01\x02" + _s.pack(
        "<HHHHHHIIIHHHHHII", 45, 45, 8, 0, 0, 0, crc, len(data), len(data),
        5, 0, 0, 0, 0, 0, 0,
    ) + b"w.txt"
    eocd = b"PK\x05\x06" + _s.pack("<HHHHIIH", 0, 0, 1, 1, len(cd), len(lo), 0)
    z = lo + cd + eocd
    assert parse_archive(z)["n_files"] == 1
    # the 4-byte form under a local zip64 extra mis-frames -> reject
    ix = z.find(b"PK\x07\x08")
    short = z[: ix + 4] + _s.pack("<III", crc, len(data), len(data)) + z[ix + 24 :]
    assert parse_archive(short) is None


def test_streamed_and_zip64_through_harvest():
    """The harvest dispatcher walks streamed/zip64 zips of subtitles
    like any other archive (same extractor path one level down)."""
    from danae_spark.multimodal.harvest import harvest_text
    from danae_spark.multimodal.subtitles import parse_subtitles, synth_subtitles

    subs = [(f"s{k}.srt", synth_subtitles(400 + k), 0) for k in range(2)]
    want = "\n".join(parse_subtitles(synth_subtitles(400 + k))["text"] for k in range(2))
    for kw in ({"dd": True}, {"zip64": True}, {"dd": True, "zip64": True}):
        c = harvest_text(_zip_build(subs, **kw))
        assert c is not None and c["doc_class"] == "archive" and c["text"] == want, kw
