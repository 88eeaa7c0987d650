"""CFB container walk + [MS-DOC]/[MS-XLS]/[MS-PPT] extraction:
roundtrip grid, chain-kind coverage, reject matrix, fuzz,
harvest/blob routing."""

import random
import struct

from danae_spark.multimodal.cfb import (
    _MINI_CUTOFF,
    _doc_pieces,
    _xls_grid,
    cfb_streams,
    doc_kind,
    parse_cfb_office,
    synth_cfb_office,
)


def _rej(d: int) -> bool:
    return d % 17 == 4 or d % 13 == 6 or d % 23 == 9


def test_roundtrip_grid():
    for d in range(140):
        r = parse_cfb_office(synth_cfb_office(d))
        if _rej(d):
            assert r is None, d
            continue
        if doc_kind(d) == "doc":
            pieces = _doc_pieces(d)
            exp = " ".join(
                "".join(t.replace("\r", "\n") for t, _ in pieces).split()
            )
            assert r["kind"] == "doc" and r["text"] == exp, (d, r)
            assert r["n_pieces"] == len(pieces)
            assert r["text_chars"] == sum(len(t) for t, _ in pieces)
        elif doc_kind(d) == "xls":
            g = _xls_grid(d)
            assert r["kind"] == "xls"
            assert r["text"] == " ".join(g["strings"])
            assert r["n_strings"] == len(g["strings"])
            assert r["num_sum"] == sum(g["numbers"])
            assert r["sheet_names"] == "/".join(g["sheets"])
        else:
            from danae_spark.multimodal.cfb import _ppt_grid

            g = _ppt_grid(d)
            assert r["kind"] == "ppt"
            assert r["text"] == " ".join(t for t, _w in g)
            assert r["n_slides"] == r["n_text_atoms"] == len(g)


def test_both_chain_kinds_exercised():
    """d%3==0 docs pad the main stream past the mini cutoff (regular
    FAT chain); others keep it in the mini stream."""
    d_reg = next(d for d in range(100) if d % 3 == 0 and not _rej(d))
    d_mini = next(d for d in range(100) if d % 3 != 0 and not _rej(d))
    s_reg = cfb_streams(synth_cfb_office(d_reg))
    s_mini = cfb_streams(synth_cfb_office(d_mini))
    main_reg = s_reg.get("WordDocument", s_reg.get("Workbook"))
    main_mini = s_mini.get("WordDocument", s_mini.get("Workbook"))
    assert len(main_reg) >= _MINI_CUTOFF > len(main_mini)
    # the Table stream always lives in the mini stream on doc kinds
    for s in (s_reg, s_mini):
        t = s.get("0Table", s.get("1Table"))
        if t is not None:
            assert len(t) < _MINI_CUTOFF


def test_table_stream_rotation():
    d1 = next(d for d in range(100) if d % 3 == 0 and d % 4 < 2 and not _rej(d))
    d0 = next(d for d in range(100) if d % 3 == 0 and d % 4 >= 2 and not _rej(d))
    assert "1Table" in cfb_streams(synth_cfb_office(d1))
    assert "0Table" in cfb_streams(synth_cfb_office(d0))


def test_reject_matrix():
    assert parse_cfb_office(synth_cfb_office(4)) is None  # signature
    assert parse_cfb_office(synth_cfb_office(6)) is None  # fComplex/SST-span
    d_cycle = next(d for d in range(100) if d % 23 == 9 and d % 17 != 4 and d % 13 != 6)
    assert parse_cfb_office(synth_cfb_office(d_cycle)) is None  # FAT cycle


def test_ccp_text_lie_rejects():
    d = next(d for d in range(100) if d % 3 == 0 and not _rej(d))
    raw = bytearray(synth_cfb_office(d))
    # the FIB's ccpText lives inside the WordDocument stream bytes;
    # find the FIB magic and bump ccpText by one
    ix = raw.find(struct.pack("<H", 0xA5EC))
    assert ix != -1
    ccp = struct.unpack_from("<I", raw, ix + 0x4C)[0]
    struct.pack_into("<I", raw, ix + 0x4C, ccp + 1)
    assert parse_cfb_office(bytes(raw)) is None


def test_labelsst_dangling_reference_rejects():
    d = next(d for d in range(100) if d % 3 == 1 and not _rej(d))
    raw = bytearray(synth_cfb_office(d))
    # LABELSST records end with the u32 isst: point one past the SST
    ix = raw.find(struct.pack("<HH", 0x00FD, 10))
    assert ix != -1
    struct.pack_into("<I", raw, ix + 4 + 6, 999)
    assert parse_cfb_office(bytes(raw)) is None


def test_ppt_record_overrun_rejects():
    d = next(d for d in range(100) if d % 3 == 2 and d % 13 == 6)
    assert parse_cfb_office(synth_cfb_office(d)) is None


def test_difat_sector_chain_path():
    """Big real-world files overflow the header's 109 DIFAT entries;
    the builder's difat_chain form routes every FAT reference through
    a DIFAT sector so the reader's chain walk is pinned."""
    from danae_spark.multimodal.cfb import _build_word_stream, _cfb_build

    d = next(d for d in range(100) if d % 3 == 0 and not _rej(d))
    word, table = _build_word_stream(d)
    tbl = "1Table" if d % 4 < 2 else "0Table"
    raw = _cfb_build([("WordDocument", word), (tbl, table)], d, difat_chain=True)
    # header DIFAT must be empty (all FREESECT): the refs are in-chain
    assert struct.unpack_from("<I", raw, 76)[0] == 0xFFFFFFFF
    r = parse_cfb_office(raw)
    assert r is not None and r["kind"] == "doc"
    from danae_spark.multimodal.cfb import _doc_pieces as _dp2

    assert r["n_pieces"] == len(_dp2(d))


def test_fuzz_never_raises():
    rng = random.Random(173)
    for trial in range(250):
        d = rng.randrange(120)
        raw = bytearray(synth_cfb_office(d))
        op = trial % 3
        if op == 0:
            raw = raw[: rng.randrange(len(raw))]
        elif op == 1:
            for _ in range(rng.randrange(1, 10)):
                raw[rng.randrange(len(raw))] = rng.randrange(256)
        else:
            for _ in range(4):  # target the FAT/header region
                raw[rng.randrange(min(2048, len(raw)))] = rng.randrange(256)
        r = parse_cfb_office(bytes(raw))
        assert r is None or isinstance(r, dict)


def test_harvest_and_blob_routing():
    from danae_spark.multimodal.blobharvest import route_blob
    from danae_spark.multimodal.harvest import harvest_text

    d_doc = next(d for d in range(100) if d % 3 == 0 and not _rej(d))
    got = harvest_text(synth_cfb_office(d_doc))
    assert got["doc_class"] == "doc" and got["format"] == "cfb-doc"
    assert got["text"].startswith("word")
    d_xls = next(d for d in range(100) if d % 3 == 1 and not _rej(d))
    got = harvest_text(synth_cfb_office(d_xls))
    assert got["doc_class"] == "xls"
    d_ppt = next(d for d in range(100) if d % 3 == 2 and not _rej(d))
    got = harvest_text(synth_cfb_office(d_ppt))
    assert got["doc_class"] == "ppt" and got["text"].startswith("slide")
    # corrupt CFB claims the grammar and rejects whole in both routers
    assert harvest_text(synth_cfb_office(4)) is None
    assert route_blob(synth_cfb_office(4)) is None
    from danae_spark.multimodal.cfb import _doc_pieces as _dp

    r = route_blob(synth_cfb_office(d_doc))
    assert r["container"] == "cfb" and r["n_items"] == len(_dp(d_doc))
