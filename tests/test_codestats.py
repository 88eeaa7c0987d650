"""Code-corpus operators (operators/codestats.py, r16)."""

from __future__ import annotations

import random

from danae_spark.operators.codestats import (
    code_stats_frame,
    detect_language,
    detect_license,
    parse_code_stats,
    synth_code_doc,
)


def test_license_detection():
    assert detect_license("// SPDX-License-Identifier: MIT\ncode") == "MIT"
    assert detect_license("# SPDX-License-Identifier: GPL-3.0-only") == "GPL-3.0-only"
    assert detect_license("/* SPDX-License-Identifier: Apache-2.0 */") == "Apache-2.0"
    assert detect_license(
        "Permission is hereby granted, free of charge, to anyone"
    ) == "MIT"
    assert detect_license(
        'Licensed under the Apache License, Version 2.0 (the "License")'
    ) == "Apache-2.0"
    assert detect_license("terms of the GNU General Public License") == "GPL-3.0"
    assert detect_license(
        "Redistribution and use in source and binary forms, with or without"
    ) == "BSD-3-Clause"
    # the tag WINS over body text
    assert detect_license(
        "// SPDX-License-Identifier: BSD-3-Clause\n"
        "// Permission is hereby granted, free of charge"
    ) == "BSD-3-Clause"
    assert detect_license("no license text at all") is None


def test_language_detection():
    assert detect_language("#!/usr/bin/env python3\nprint(1)") == "python"
    assert detect_language("#!/usr/bin/env node\nx") == "javascript"
    assert detect_language("#include <stdio.h>\nint main(){}") == "c"
    assert detect_language("package main\nfunc main() {}") == "go"
    assert detect_language("fn main() { let mut x = 1; }") == "rust"
    assert detect_language("public class A { }") == "java"
    assert detect_language("function f() { return 1; }") == "javascript"
    assert detect_language("import os\ndef f():\n    pass") == "python"
    assert detect_language("plain prose with no markers") is None


def test_comment_semantics():
    # '#include' is CODE in C, '#' comments only exist in python
    r = parse_code_stats(b"#include <stdio.h>\nint main(void) { return 0; }\n// c\n")
    assert r["language"] == "c" and r["n_comment"] == 1 and r["n_code"] == 2
    # code line with trailing comment stays code
    r = parse_code_stats(b"import os\nx = 1  # trailing\n# leading\n")
    assert r["n_code"] == 2 and r["n_comment"] == 1
    # block comments count per line; unterminated rejects whole
    src = b"function f() {\n/* one\n   two\n   three */\n}\n"
    r = parse_code_stats(src)
    assert r["n_comment"] == 3 and r["n_code"] == 2
    assert parse_code_stats(b"function f() {}\n/* never ends\nx\n") is None


def test_code_vs_prose():
    r = parse_code_stats(b"const a = 1;\nconst b = 2;\nconst c = 3;\n")
    assert r["is_code"] is True
    prose = b"One sentence here.\nAnother sentence there.\nMore prose words.\n"
    assert parse_code_stats(prose)["is_code"] is False
    # prose with a stray import still classifies by SHAPE
    stray = b"We import ideas here.\nProse continues apace.\nNothing else.\n"
    r = parse_code_stats(stray)
    assert r["language"] == "python" and r["is_code"] is False


def test_rejects():
    assert parse_code_stats(b"") is None
    assert parse_code_stats(bytes([0, 1, 2]) + b"binary") is None
    assert parse_code_stats(b"\xff\xfe invalid utf8") is None


def test_synth_grid():
    langs = ("python", "javascript", "c", "go", "rust", "java")
    for d in range(300):
        r = parse_code_stats(synth_code_doc(d))
        if d % 13 == 7:
            assert r is None, d
            continue
        if d % 7 == 2:
            assert r["language"] is None and r["is_code"] is False, d
            continue
        assert r["language"] == langs[d % 6], d
        assert r["is_code"] is True, d
        assert r["n_code"] == 6 + d % 5, d


def test_fuzz_never_raises():
    rng = random.Random(21)
    for d in range(15):
        base = bytearray(synth_code_doc(d))
        for _ in range(20):
            mut = bytearray(base)
            for _ in range(rng.randrange(1, 5)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
            parse_code_stats(bytes(mut))
        for cut in (0, 1, len(base) // 2):
            parse_code_stats(bytes(base[:cut]))


def test_frame_api(spark):
    rows = [(d, bytearray(synth_code_doc(d))) for d in (0, 2, 7, 13)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in code_stats_frame(df).collect()}
    assert out[7]["language"] is None and out[7]["n_lines"] is None  # binary
    assert out[2]["is_code"] is False  # prose
    assert out[0]["language"] == "python" and out[0]["license"] == "MIT"
    plan = code_stats_frame(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_corpus_code_report_plan_and_values(spark, sf_dir):
    """The report is the codestats map + ONE map-side-combined
    aggregate; bucket accounting matches the grid."""
    from danae_spark.operators.codereport import corpus_code_report

    df = corpus_code_report(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the deliberate doc_id input repartition + the ONE aggregate
    # shuffle; the partial HashAggregate below it is the map-side
    # combine the composition exists to keep
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "partial_count" in plan, plan
    rows = df.collect()
    buckets = {}
    for r in rows:
        buckets[r["bucket"]] = buckets.get(r["bucket"], 0) + r["n_files"]
    n_docs = sum(buckets.values())
    want_rej = sum(1 for d in range(n_docs) if d % 13 == 7)
    want_prose = sum(1 for d in range(n_docs) if d % 13 != 7 and d % 7 == 2)
    assert buckets["reject"] == want_rej
    assert buckets["prose"] == want_prose
    assert buckets["code"] == n_docs - want_rej - want_prose
    rej = [r for r in rows if r["bucket"] == "reject"]
    assert len(rej) == 1 and rej[0]["total_lines"] is None
