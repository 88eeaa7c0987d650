"""7z walk: number-codec differential, builder/reader combos, solid
folders, encoded headers, CRC gates, archive/harvest integration."""

import random
import struct
import zlib

from danae_spark.multimodal.sevenzip import (
    read_number,
    sevenzip_build,
    sevenzip_members,
    write_number,
)

_ENTRIES = [
    ("sub/", None),
    ("sub/a.txt", b"hello seven zip " * 8),
    ("sub/b.bin", bytes(range(256)) * 3),
    ("c.txt", b"tail member" * 40),
]


def test_number_codec_differential():
    rng = random.Random(77)
    for _ in range(3000):
        v = rng.randrange(1 << rng.randrange(1, 63))
        enc = write_number(v)
        got, pos = read_number(enc, 0)
        assert got == v and pos == len(enc)
    assert write_number(0x7F) == b"\x7f"
    assert read_number(b"\x80\xff", 0)[0] == 0xFF  # 1 extra byte form


def test_all_structural_combos_roundtrip():
    for coder in ("copy", "lzma"):
        for solid in (False, True):
            for enc_h in (False, True):
                raw = sevenzip_build(
                    _ENTRIES, coder=coder, solid=solid, encoded_header=enc_h
                )
                m = sevenzip_members(raw)
                assert m is not None, (coder, solid, enc_h)
                assert [(n, isd) for n, isd, *_ in m] == [
                    ("sub/", True), ("sub/a.txt", False),
                    ("sub/b.bin", False), ("c.txt", False),
                ]
                datas = {n: data for n, _i, _u, _c, data in m}
                for name, body in _ENTRIES:
                    if body is not None:
                        assert datas[name] == body, (coder, solid, enc_h, name)


def test_crc_gates_reject():
    raw = bytearray(sevenzip_build(_ENTRIES))
    raw[15] ^= 1  # start header content: its CRC must now mismatch
    assert sevenzip_members(bytes(raw)) is None
    raw2 = bytearray(sevenzip_build(_ENTRIES))
    raw2[-1] ^= 1  # next header content: its CRC must now mismatch
    assert sevenzip_members(bytes(raw2)) is None


def test_unsupported_coder_rejects():
    raw = bytearray(sevenzip_build(_ENTRIES, coder="lzma"))
    # rewrite the first LZMA codec id (03 01 01) to AES (06 F1 07 01 is
    # 4 bytes — keep length: use delta 03 -> unsupported id 04 04 04)
    ix = bytes(raw).find(b"\x03\x01\x01", 32)
    assert ix != -1
    raw[ix : ix + 3] = b"\x04\x04\x04"
    # header CRC now mismatches → reject; also fix the CRC to prove the
    # coder gate itself rejects
    nh_off, nh_size = struct.unpack_from("<QQ", raw, 12)
    if 32 + nh_off <= ix:  # codec id lives in the plain next header
        struct.pack_into(
            "<I", raw, 28, zlib.crc32(bytes(raw[32 + nh_off : 32 + nh_off + nh_size]))
        )
        start = struct.pack("<QQI", nh_off, nh_size, struct.unpack_from("<I", raw, 28)[0])
        struct.pack_into("<I", raw, 8, zlib.crc32(start))
    assert sevenzip_members(bytes(raw)) is None


def test_archive_census_and_harvest_route_7z():
    from danae_spark.multimodal.archive import (
        archive_format,
        iter_archive_members,
        parse_archive,
        synth_archive,
    )

    d = next(x for x in range(60) if archive_format(x) == "7z")
    c = parse_archive(synth_archive(d))
    assert c["format"] == "7z" and c["n_dirs"] == 1
    names = [n for n, _d, _b in iter_archive_members(synth_archive(d))]
    assert names[0] == "sub/"
    # text members inside a 7z reach text_harvest like any archive
    from danae_spark.multimodal.harvest import harvest_text

    raw = sevenzip_build(
        [("docs/", None), ("docs/a.txt", b"seven zip prose one"),
         ("docs/b.txt", b"seven zip prose two")],
        coder="lzma", solid=True,
    )
    got = harvest_text(raw)
    assert got is not None and "seven zip prose one" in got["text"]
    assert "seven zip prose two" in got["text"]


def test_fuzz_never_raises():
    rng = random.Random(174)
    raw = sevenzip_build(_ENTRIES, coder="lzma", solid=True, encoded_header=True)
    for trial in range(300):
        b = bytearray(raw)
        if trial % 3 == 0:
            b = b[: rng.randrange(len(b))]
        elif trial % 3 == 1:
            for _ in range(rng.randrange(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        else:
            b = b[:32] + b[33:]  # shift the pack area by one byte
        r = sevenzip_members(bytes(b))
        assert r is None or isinstance(r, list)
