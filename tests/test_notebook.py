"""Jupyter notebook extraction (multimodal/notebook.py, r16)."""

from __future__ import annotations

import json
import random

from danae_spark.multimodal.notebook import (
    notebook_extract_frame,
    parse_notebook,
    synth_notebook,
)


def _nb(cells, meta=None, nbformat=4):
    return json.dumps(
        {"nbformat": nbformat, "nbformat_minor": 5, "cells": cells,
         "metadata": meta or {}}
    ).encode()


def test_source_channels_join_identically():
    one = _nb([{"cell_type": "markdown", "source": "# T\nline two"}])
    two = _nb([{"cell_type": "markdown", "source": ["# T\n", "line two"]}])
    r1, r2 = parse_notebook(one), parse_notebook(two)
    assert r1["text"] == r2["text"] == "# T\nline two"
    assert r1["title"] == "T"


def test_outputs_stripped_and_counted():
    cells = [
        {"cell_type": "code", "source": "print(1)",
         "outputs": [{"output_type": "stream", "text": ["SECRET OUTPUT"]},
                     {"output_type": "execute_result", "data": {}}]},
    ]
    r = parse_notebook(_nb(cells))
    assert r["n_outputs"] == 2
    assert "SECRET OUTPUT" not in r["text"] and r["text"] == "print(1)"


def test_raw_cells_counted_not_extracted():
    cells = [
        {"cell_type": "markdown", "source": "prose"},
        {"cell_type": "raw", "source": "<latex preamble>"},
    ]
    r = parse_notebook(_nb(cells))
    assert r["n_raw"] == 1 and r["n_cells"] == 2
    assert r["text"] == "prose"


def test_language_channels():
    ks = {"kernelspec": {"name": "x", "language": "r"}}
    li = {"language_info": {"name": "julia"}}
    both = {"kernelspec": {"name": "x", "language": "r"},
            "language_info": {"name": "julia"}}
    c = [{"cell_type": "markdown", "source": "m"}]
    assert parse_notebook(_nb(c, ks))["language"] == "r"
    assert parse_notebook(_nb(c, li))["language"] == "julia"
    assert parse_notebook(_nb(c, both))["language"] == "r"  # kernelspec wins
    assert parse_notebook(_nb(c))["language"] is None


def test_title_is_first_leading_heading():
    cells = [
        {"cell_type": "markdown", "source": "no heading here"},
        {"cell_type": "markdown", "source": "# Real Title\nbody"},
    ]
    assert parse_notebook(_nb(cells))["title"] == "Real Title"
    assert parse_notebook(_nb([{"cell_type": "markdown",
                                "source": "## minor"}]))["title"] is None


def test_reject_matrix():
    good = [{"cell_type": "markdown", "source": "m"}]
    assert parse_notebook(b"") is None
    assert parse_notebook(b"[1, 2]") is None          # not an object
    assert parse_notebook(b"{truncated") is None
    assert parse_notebook(_nb(good, nbformat=3)) is None
    assert parse_notebook(_nb(good)[:-4]) is None     # truncated JSON
    bad_type = [{"cell_type": "widget", "source": "x"}]
    assert parse_notebook(_nb(bad_type)) is None
    bad_src = [{"cell_type": "markdown", "source": {"not": "str"}}]
    assert parse_notebook(_nb(bad_src)) is None
    mixed_src = [{"cell_type": "markdown", "source": ["ok", 3]}]
    assert parse_notebook(_nb(mixed_src)) is None
    no_outs = [{"cell_type": "code", "source": "x", "outputs": "nope"}]
    assert parse_notebook(_nb(no_outs)) is None
    cells_dict = json.dumps({"nbformat": 4, "cells": {"a": 1}}).encode()
    assert parse_notebook(cells_dict) is None
    # empty cells list is a valid (empty) notebook
    assert parse_notebook(_nb([]))["n_cells"] == 0


def test_fuzz_never_raises():
    rng = random.Random(42)
    for d in range(20):
        base = bytearray(synth_notebook(d))
        for _ in range(25):
            mut = bytearray(base)
            for _ in range(rng.randrange(1, 5)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
            parse_notebook(bytes(mut))
        for cut in (0, 1, len(base) // 2, len(base) - 1):
            parse_notebook(bytes(base[:cut]))


def test_harvest_identity_rule():
    """A payload with the nbformat signature must reject whole in both
    dispatchers, never ship as class 'text' or container 'json'."""
    from danae_spark.multimodal.blobharvest import route_blob
    from danae_spark.multimodal.harvest import harvest_text

    broken = json.dumps({"nbformat": 4, "cells": "bad"}).encode()
    assert harvest_text(broken) is None
    assert route_blob(broken) is None
    # v3 notebooks reject whole too (half-understood container)
    v3 = json.dumps({"nbformat": 3, "worksheets": []}).encode()
    assert harvest_text(v3) is None and route_blob(v3) is None
    # generic JSON without the signature still routes as json
    plain = b'{"a": 1}\n{"a": 2}'
    assert route_blob(plain) is not None
    assert route_blob(plain)["container"] == "json"


def test_frame_api(spark):
    rows = [(d, bytearray(synth_notebook(d))) for d in (0, 1, 3, 6, 40)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in notebook_extract_frame(df).collect()}
    assert out[3]["language"] is None  # d%17==3: truncated -> NULL row
    assert out[6]["language"] is None  # d%19==6: nbformat 3
    assert out[1]["language"] == "r" and out[1]["n_cells"] == 1 + 2 + 1 + 1
    assert out[40]["language"] == "python" and out[40]["title"] == "Notebook 40"
    plan = notebook_extract_frame(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
