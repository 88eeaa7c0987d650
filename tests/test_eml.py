"""Email (EML/mbox) MIME extraction (multimodal/eml.py, r16)."""

from __future__ import annotations

import base64
import random

from danae_spark.multimodal.eml import (
    looks_like_mail,
    mail_extract_frame,
    parse_eml,
    parse_mail,
    parse_mbox,
    synth_mail,
)


def _msg(headers: list[str], body: str) -> bytes:
    return ("\n".join(headers) + "\n\n" + body).encode()


def test_header_folding_and_encoded_words():
    m = parse_eml(_msg([
        "From: A <a@x.org>",
        "Subject: =?utf-8?Q?Caf=C3=A9_report?=",
        " (folded continuation)",
    ], "body"))
    assert m["subject"] == "Café report (folded continuation)"
    assert m["from_addr"] == "a@x.org"
    b64 = base64.b64encode("Zürich".encode()).decode()
    m = parse_eml(_msg([
        "From: b@x.org",
        f"Subject: =?utf-8?B?{b64}?= weekly",
    ], "body"))
    assert m["subject"] == "Zürich weekly"


def test_transfer_encodings():
    body = "line one.\nline two."
    m = parse_eml(_msg([
        "From: a@x", "Subject: s",
        "Content-Transfer-Encoding: base64",
        "Content-Type: text/plain; charset=utf-8",
    ], base64.encodebytes(body.encode()).decode()))
    assert m["text"] == body
    m = parse_eml(_msg([
        "From: a@x", "Subject: s",
        "Content-Type: text/plain; charset=utf-8",
        "Content-Transfer-Encoding: quoted-printable",
    ], "caf=C3=A9 and a soft =\nbreak=2E"))
    assert m["text"] == "café and a soft break."
    # non-ascii bytes under the default us-ascii charset reject whole
    assert parse_eml(_msg(["From: a@x", "Subject: s"],
                          "caf\xc3\xa9")) is None


def test_multipart_and_attachments():
    raw = _msg([
        "From: a@x", "Subject: s",
        'Content-Type: multipart/mixed; boundary="B"',
    ], "\n".join([
        "preamble is ignored",
        "--B", "Content-Type: text/plain", "", "visible plain",
        "--B", "Content-Type: text/html", "", "<p>visible html</p>",
        "--B", "Content-Type: image/png",
        "Content-Disposition: attachment", "", "PNGBYTES",
        "--B--",
        "epilogue ignored",
    ]))
    m = parse_eml(raw)
    assert m["n_parts"] == 3 and m["n_attachments"] == 1
    assert m["text"] == "visible plain\nvisible html"
    assert "PNGBYTES" not in m["text"]


def test_mbox_walk():
    raw = b"\n".join([
        b"From a@x Thu Jan  1 00:00:00 2026",
        b"From: a@x", b"Subject: first", b"", b"alpha body",
        b"From b@x Thu Jan  1 00:00:01 2026",
        b"From: b@x", b"Subject: second", b"", b"beta body",
    ])
    m = parse_mbox(raw)
    assert m["n_messages"] == 2 and m["subject"] == "first"
    assert m["text"] == "alpha body\n\nbeta body"
    assert parse_mail(raw)["variant"] == "mbox"


def test_rejects():
    assert parse_eml(b"no header body split at all") is None
    assert parse_eml(_msg(["From: a@x", "Subject: s",
                           "Content-Transfer-Encoding: base64"],
                          "!!! not base64 !!!")) is None
    assert parse_eml(_msg(["From: a@x", "Subject: s",
                           "Content-Type: text/plain; charset=klingon"],
                          "body")) is None
    assert parse_eml(_msg(["From: a@x", "Subject: s",
                           'Content-Type: multipart/mixed; boundary="B"'],
                          "--B\nContent-Type: text/plain\n\nx\n")) is None
    assert parse_eml(_msg(["From: a@x", "Subject: s",
                           "Content-Transfer-Encoding: rot13"],
                          "body")) is None
    assert parse_eml(_msg(["bad header line without colon"], "x")) is None
    assert parse_mbox(b"From only an envelope") is None
    assert parse_mail(b"") is None


def test_synth_grid():
    for d in range(150):
        r = parse_mail(synth_mail(d))
        v = d % 5
        if (v == 0 and d % 23 == 15) or (v == 1 and d % 17 == 4) or (
            v == 3 and d % 19 == 8
        ):
            assert r is None, d
            continue
        assert r is not None, d
        if v == 4:
            assert r["variant"] == "mbox" and r["n_messages"] == 2 + d % 3
            assert r["subject"] == f"Msg 0 of {d}"
        else:
            assert r["variant"] == "eml" and r["subject"] == f"Report {d}"
            assert r["from_addr"] == f"sender{d % 20}@example.com"
        if v == 3:
            assert r["n_parts"] == 3 and r["n_attachments"] == 1


def test_fuzz_never_raises():
    rng = random.Random(13)
    for d in range(15):
        base = bytearray(synth_mail(d))
        for _ in range(25):
            mut = bytearray(base)
            for _ in range(rng.randrange(1, 5)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
            parse_mail(bytes(mut))
        for cut in (0, 1, len(base) // 2, len(base) - 1):
            parse_mail(bytes(base[:cut]))


def test_harvest_routes_mail():
    from danae_spark.multimodal.harvest import harvest_text

    h = harvest_text(synth_mail(6))  # v=1: base64 eml
    assert h is not None and h["doc_class"] == "email" and h["format"] == "eml"
    assert h["title"] == "Report 6"
    h = harvest_text(synth_mail(9))  # v=4: mbox
    assert h["doc_class"] == "email" and h["format"] == "mbox"
    # signed-but-broken mail rejects whole, never class "text"
    assert harvest_text(synth_mail(21)) is None  # v=1, 21%17==4: bad base64
    # plain text with a colon'd first line but no mail headers stays text
    assert not looks_like_mail(b"Note: this is not an email\njust text")
    assert harvest_text(b"Note: plain\njust text")["doc_class"] == "text"


def test_frame_api(spark):
    rows = [(d, bytearray(synth_mail(d))) for d in (0, 3, 9, 21)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in mail_extract_frame(df).collect()}
    assert out[21]["variant"] is None  # bad base64 reject leg
    assert out[3]["n_attachments"] == 1 and out[9]["variant"] == "mbox"
    plan = mail_extract_frame(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_eml_inside_archive_harvests():
    """An .eml member routes through the member walk by CONTENT (the
    header-shape identity), no extension needed."""
    from danae_spark.multimodal.archive import _zip_build
    from danae_spark.multimodal.harvest import harvest_text

    z = _zip_build([("mail/msg1.eml", synth_mail(6), 0),
                    ("notes.txt", b"plain member", 8)])
    h = harvest_text(z)
    assert h is not None and h["doc_class"] == "archive"
    assert "Mail body 6 line 0." in h["text"] and "plain member" in h["text"]
