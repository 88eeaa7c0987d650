"""LaTeX text extraction (multimodal/latex.py, r16)."""

from __future__ import annotations

import random

from danae_spark.multimodal.latex import (
    latex_extract_frame,
    parse_latex,
    synth_latex,
)


def _t(src: str) -> dict:
    r = parse_latex(src.encode())
    assert r is not None, src
    return r


def test_planted_macros_unwrap_and_drop():
    r = _t(r"Keep \emph{this \textbf{nested}} but drop \cite{x} cites.")
    assert r["text"] == "Keep this nested but drop cites."
    assert r["n_cites"] == 1
    r = _t(r"An \unknownmacro[opt]{argument text kept} survives.")
    assert r["text"] == "An argument text kept survives."
    r = _t(r"\includegraphics[width=3cm]{fig1.png} Caption follows.")
    assert r["text"] == "Caption follows."
    r = _t(r"See \url{https://example.org/x} now.")
    assert r["text"] == "See https://example.org/x now."


def test_math_counted_and_dropped():
    r = _t(r"Inline $a+b$ and \(c\) plus display $$d$$ and \[e\] end.")
    assert r["n_math_inline"] == 2 and r["n_math_display"] == 2
    assert r["text"] == "Inline and plus display and end."
    r = _t("Before\n\\begin{align*}\nx &= y\n\\end{align*}\nAfter.")
    assert r["n_math_display"] == 1 and r["text"] == "Before\n\nAfter."
    r = _t("Same paragraph \\begin{equation}q\\end{equation} continues.")
    assert r["text"] == "Same paragraph continues."


def test_comments_escapes_structure():
    r = _t("Real text % hidden comment\n50\\% kept \\& joined~here.")
    assert r["n_comments"] == 1
    assert r["text"] == "Real text 50% kept & joined here."
    r = _t("\\title{The Title}\\begin{document}\\section{One}\nBody.\n\\end{document}")
    assert r["title"] == "The Title" and r["n_sections"] == 1
    assert r["text"] == "The Title\n\nOne\n\nBody."
    # preamble outside \begin{document} never emits
    r = _t("preamble junk \\begin{document}only this\\end{document}")
    assert r["text"] == "only this"


def test_lists_and_verbatim():
    r = _t("\\begin{itemize}\\item alpha\\item beta\\end{itemize}")
    assert r["text"] == "- alpha\n\n- beta"
    r = _t("\\begin{verbatim}\nraw % not a comment $x$\n\\end{verbatim}")
    assert r["n_comments"] == 0 and r["n_math_inline"] == 0
    assert "raw % not a comment $x$" in r["text"]


def test_rejects():
    assert parse_latex(b"unbalanced { brace") is None
    assert parse_latex(b"closing } too many") is None
    assert parse_latex(b"unterminated $math") is None
    assert parse_latex(rb"\begin{equation} never ends") is None
    assert parse_latex(rb"\begin{itemize}\item x\end{enumerate}") is None
    assert parse_latex(rb"\begin{document} no end") is None
    assert parse_latex(b"\xff\xfe not utf8 \x80") is None
    assert parse_latex(b"") is None


def test_synth_grid_and_rejects():
    for d in range(120):
        r = parse_latex(synth_latex(d))
        if d % 13 == 5 or d % 19 == 2:
            assert r is None, d
            continue
        assert r is not None, d
        assert r["title"] == f"Paper {d}" and r["n_sections"] == 1 + d % 3
        assert r["n_cites"] == 1 + d % 3
        assert r["text"].startswith(f"Paper {d}\n\nWe study topic {d % 50}")


def test_fuzz_never_raises():
    rng = random.Random(7)
    for d in range(15):
        base = bytearray(synth_latex(d))
        for _ in range(25):
            mut = bytearray(base)
            for _ in range(rng.randrange(1, 5)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
            parse_latex(bytes(mut))
        for cut in (0, 1, len(base) // 2, len(base) - 1):
            parse_latex(bytes(base[:cut]))


def test_harvest_routes_latex_and_archive_members():
    from danae_spark.multimodal.archive import _zip_build
    from danae_spark.multimodal.harvest import harvest_text

    src = synth_latex(8)
    h = harvest_text(src)
    assert h is not None and h["doc_class"] == "latex" and h["format"] == "tex"
    assert h["title"] == "Paper 8"
    # a signed-but-broken TeX payload rejects whole, never class "text"
    assert harvest_text(synth_latex(5)) is None  # d%13==5 leg
    # .tex inside an archive harvests through the member walk
    z = _zip_build([("paper.tex", src, 0)])
    hz = harvest_text(z)
    assert hz is not None and hz["doc_class"] == "archive"
    assert "We study topic 8" in hz["text"]


def test_frame_api(spark):
    rows = [(d, bytearray(synth_latex(d))) for d in (0, 2, 5, 8)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in latex_extract_frame(df).collect()}
    assert out[5]["title"] is None  # d%13==5 reject leg
    assert out[2]["title"] is None  # d%19==2 reject leg
    assert out[8]["title"] == "Paper 8" and out[8]["n_sections"] == 3
    plan = latex_extract_frame(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
