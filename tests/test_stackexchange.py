"""Stack Exchange dump extraction (multimodal/stackexchange.py)."""

import pytest

from danae_spark.multimodal.stackexchange import (
    parse_se_dump,
    synth_se_dump,
)


def _expect(d: int):
    if d % 19 == 4 or d % 13 == 2:
        return None
    np_ = 2 + d % 3
    parts = []
    score = d % 10
    for j in range(np_):
        body = f"post {d} {j} says w{(d + j) % 9} & w{(d * 3 + j) % 9}."
        if j == 0:
            parts.append(f"Question {d}\n\n{body}")
        else:
            parts.append(body)
            score += (d + j) % 5
    return {
        "n_posts": np_ + (d % 7 == 4),
        "n_questions": 1,
        "n_answers": np_ - 1,
        "n_other": int(d % 7 == 4),
        "total_score": score,
        "n_tags": 2,
        "title": f"Question {d}",
        "text": "\n\n".join(parts),
    }


def test_grid_matches_arithmetic():
    rejects = 0
    for d in range(250):
        got = parse_se_dump(synth_se_dump(d))
        assert got == _expect(d), d
        rejects += got is None
    assert rejects > 10


def _dump(rows: str) -> bytes:
    return f'<?xml version="1.0"?>\n<posts>\n{rows}\n</posts>'.encode()


def test_row_semantics():
    # html entities inside Body decode through the real extractor
    got = parse_se_dump(_dump(
        '<row Id="1" PostTypeId="1" Title="T &amp; Q" Score="3" '
        'Tags="&lt;a&gt;&lt;b&gt;&lt;c&gt;" '
        'Body="&lt;p&gt;x &amp;amp; y&lt;/p&gt;" />'
    ))
    assert got["title"] == "T & Q" and got["n_tags"] == 3
    assert got["text"] == "T & Q\n\nx & y"
    # other post types counted, never extracted
    got = parse_se_dump(_dump(
        '<row Id="1" PostTypeId="1" Title="Q" Body="&lt;p&gt;q&lt;/p&gt;" />\n'
        '<row Id="2" PostTypeId="5" Body="&lt;p&gt;wiki&lt;/p&gt;" />'
    ))
    assert got["n_other"] == 1 and "wiki" not in got["text"]
    # a bodyless answer contributes no block
    got = parse_se_dump(_dump(
        '<row Id="1" PostTypeId="2" Score="1" />'
    ))
    assert got["text"] == "" and got["n_answers"] == 1


def test_reject_matrix():
    # torn dump / empty posts / foreign grammar / attr soup / entity
    assert parse_se_dump(_dump('<row Id="1" PostTypeId="1" />')[:-5]) is None
    assert parse_se_dump(b"<posts>\n</posts>") is None
    assert parse_se_dump(b"<html><body>x</body></html>") is None
    assert parse_se_dump(_dump('<row Id="1" PostTypeId="1" Broken=" />')) is None
    assert parse_se_dump(_dump('<row Id="1" PostTypeId="1" T="&bogus;" />')) is None
    # a row missing its identity attributes is a torn writer
    assert parse_se_dump(_dump('<row Score="1" />')) is None
    assert parse_se_dump(b"") is None


def test_frame_api_and_plan(spark):
    from danae_spark.multimodal.stackexchange import se_census_frame

    df = spark.createDataFrame(
        [(0, bytearray(synth_se_dump(0))), (1, None)],
        "doc_id long, payload binary",
    )
    out = se_census_frame(df)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert got[0]["n_questions"] == 1 and got[1]["n_posts"] is None


def test_harvest_routing():
    from danae_spark.multimodal.harvest import harvest_text
    from danae_spark.multimodal.stackexchange import looks_like_se_dump

    got = harvest_text(synth_se_dump(0))
    assert (got["doc_class"], got["format"]) == ("stackexchange", "posts.xml")
    assert got["title"] == "Question 0"
    assert got["text"] == parse_se_dump(synth_se_dump(0))["text"]
    # claiming the grammar but torn -> reject whole (d%19==4)
    assert harvest_text(synth_se_dump(4)) is None
    # an XHTML page mentioning the format stays html
    page = (b'<?xml version="1.0"?><html xmlns="http://www.w3.org/1999/xhtml">'
            b"<body><p>about &lt;posts&gt; dumps</p></body></html>")
    assert not looks_like_se_dump(page)
    assert harvest_text(page)["doc_class"] == "html"
