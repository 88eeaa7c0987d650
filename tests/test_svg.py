"""SVG census: roundtrip grid, entity safety, CDATA desync guard,
harvest identity routing, fuzz."""

import random
import time

from danae_spark.multimodal.svg import looks_like_svg, parse_svg, synth_svg


def test_roundtrip_grid():
    for d in range(120):
        r = parse_svg(synth_svg(d))
        if d % 11 == 3 or d % 29 == 13:
            assert r is None, d
            continue
        w, h = 100 + d % 50, 80 + d % 40
        assert (r["width"], r["height"]) == (float(w), float(h))
        texts = 1 + d % 2
        assert r["n_text"] == texts
        exp = " ".join(
            f"word{d % 7} t{i} s{(d + i) % 5}" + (" & x!" if d % 3 == 0 else "")
            for i in range(texts)
        )
        assert r["text"] == exp


def test_cdata_script_with_gt_does_not_desync():
    d = next(x for x in range(100) if x % 4 == 0 and x % 11 != 3 and x % 29 != 13)
    raw = synth_svg(d)
    assert b"1 > 0" in raw
    r = parse_svg(raw)
    assert r is not None and r["n_script"] == 1
    assert "notText" not in (r["text"] or "")  # never extracted


def test_billion_laughs_is_linear_and_never_expands():
    entities = "\n".join(
        f'<!ENTITY e{i} "&e{i - 1};&e{i - 1};&e{i - 1};&e{i - 1};">'
        for i in range(1, 30)
    )
    bomb = (
        '<?xml version="1.0"?>\n<!DOCTYPE svg [\n<!ENTITY e0 "lol">\n'
        + entities
        + ']>\n<svg xmlns="x" width="1" height="1"><text>&e29;</text></svg>'
    ).encode()
    t0 = time.time()
    r = parse_svg(bomb)
    assert time.time() - t0 < 0.5
    # internal DTD subsets are rejected outright (we will not track
    # entity declarations); expansion must never have happened
    assert r is None or "lollol" not in (r["text"] or "")


def test_plain_doctype_parses():
    raw = (
        '<?xml version="1.0"?>\n'
        '<!DOCTYPE svg PUBLIC "-//W3C//DTD SVG 1.1//EN" '
        '"http://www.w3.org/Graphics/SVG/1.1/DTD/svg11.dtd">\n'
        '<svg xmlns="http://www.w3.org/2000/svg" width="4" height="2">'
        "<text>hi</text></svg>"
    ).encode()
    r = parse_svg(raw)
    assert r is not None and r["text"] == "hi" and r["width"] == 4.0


def test_unit_we_wont_guess_rejects():
    raw = b'<svg xmlns="x" width="10em" height="5"><rect/></svg>'
    assert parse_svg(raw) is None
    raw_px = b'<svg xmlns="x" width="10px" height="5"><rect/></svg>'
    assert parse_svg(raw_px)["width"] == 10.0


def test_harvest_identity_routing():
    from danae_spark.multimodal.harvest import harvest_text

    d = next(x for x in range(100) if x % 11 != 3 and x % 29 != 13 and x % 5 != 2)
    got = harvest_text(synth_svg(d))
    assert got is not None and got["doc_class"] == "svg"
    assert got["title"] == f"icon t{d % 9}"
    # a corrupt SVG claims the grammar and rejects whole
    d3 = next(x for x in range(100) if x % 11 == 3)
    assert harvest_text(synth_svg(d3)) is None
    # inline SVG inside an HTML page stays HTML
    page = (
        b"<html><head><title>t</title></head><body><p>hello world one"
        b" two three</p><svg width='1' height='1'><rect/></svg></body></html>"
    )
    assert not looks_like_svg(page)
    got2 = harvest_text(page)
    assert got2 is not None and got2["doc_class"] == "html"


def test_fuzz_never_raises():
    rng = random.Random(172)
    for trial in range(300):
        d = rng.randrange(120)
        raw = bytearray(synth_svg(d))
        op = trial % 3
        if op == 0:
            raw = raw[: rng.randrange(len(raw))]
        elif op == 1:
            for _ in range(rng.randrange(1, 6)):
                raw[rng.randrange(len(raw))] = rng.randrange(256)
        else:
            i = rng.randrange(len(raw))
            raw = raw[:i] + b"<![CDATA[" + raw[i:]
        r = parse_svg(bytes(raw))
        assert r is None or isinstance(r, dict)
