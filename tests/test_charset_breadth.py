"""WHATWG charset breadth (r12): declared CJK / Cyrillic / Central
European pages decode through the stdlib-backed WHATWG label map, and
the undeclared-charset windows-1252 fallback is guarded by a
post-decode mojibake gate so a multibyte page that HAPPENS to decode
under cp1252 rejects instead of polluting harvested text."""

from __future__ import annotations

import pytest

from danae_spark.multimodal.htmltext import (
    _decode_page,
    _fallback_gibberish,
    _LEGACY_CHARSETS,
    parse_html_text,
)
from danae_spark.multimodal.warc import (
    _CHARSET_PAGES,
    _CHARSET_REJECT_PAGES,
    charset_page_text,
    charset_page_title,
    content_type_charset,
    iter_warc_responses,
    synth_charset_warc,
)


def test_whatwg_labels_resolve_to_importable_codecs():
    import codecs

    for label, codec in _LEGACY_CHARSETS.items():
        codecs.lookup(codec)  # raises LookupError on a bad name
    # spot-check the WHATWG aliasing rules
    assert _LEGACY_CHARSETS["shift_jis"] == "cp932"  # windows-31j
    assert _LEGACY_CHARSETS["euc-kr"] == "cp949"  # windows-949
    assert _LEGACY_CHARSETS["gb2312"] == "gb18030"  # GBK decodes via gb18030
    assert _LEGACY_CHARSETS["iso-8859-9"] == "windows-1254"
    assert _LEGACY_CHARSETS["tis-620"] == "cp874"
    assert _LEGACY_CHARSETS["latin1"] == "windows-1252"


DECLARED = [
    ("shift_jis", "cp932", "日本語のテスト 文書"),
    ("euc-jp", "euc_jp", "日本語のテスト 文書"),
    ("gbk", "gb18030", "中文测试 页面 内容"),
    ("gb18030", "gb18030", "中文测试 页面 内容"),
    ("big5", "big5hkscs", "中文測試 頁面 內容"),
    ("euc-kr", "cp949", "한국어 테스트 문서"),
    ("koi8-r", "koi8-r", "русский текст данные"),
    ("windows-1251", "windows-1251", "русский текст данные"),
    ("iso-8859-2", "iso8859-2", "příliš žluťoučký kůň"),
    ("windows-1250", "windows-1250", "příliš žluťoučký kůň"),
    ("iso-8859-7", "iso8859-7", "ελληνικό κείμενο εδώ"),
    ("windows-1255", "windows-1255", "טקסט בעברית כאן"),
    ("windows-1256", "windows-1256", "نص عربي هنا"),
    ("ibm866", "cp866", "русский текст данные"),
    # bare script-name labels map to the ISO-8859 family, NOT the
    # windows-125x pages (WHATWG "Names and labels"; r13 ADVICE fix)
    ("cyrillic", "iso8859-5", "русский текст данные"),
    ("greek", "iso8859-7", "ελληνικό κείμενο εδώ"),
    ("greek8", "iso8859-7", "ελληνικό κείμενο εδώ"),
    ("arabic", "iso8859-6", "نص عربي هنا"),
]


@pytest.mark.parametrize("label,codec,text", DECLARED)
def test_meta_declared_legacy_pages_decode(label, codec, text):
    page = (
        f'<html><head><meta charset="{label}"><title>t</title></head>'
        f"<body><p>{text}</p></body></html>"
    ).encode(codec)
    got = parse_html_text(page)
    assert got is not None and got["text"] == text, label


@pytest.mark.parametrize("label,codec,text", DECLARED)
def test_header_declared_legacy_pages_decode(label, codec, text):
    page = f"<html><body><p>{text}</p></body></html>".encode(codec)
    got = parse_html_text(page, label)
    assert got is not None and got["text"] == text, label


def test_undeclared_multibyte_page_rejects_via_gate():
    # EUC-JP bytes live in 0xA1-0xFE: cp1252 'decodes' them happily —
    # the mojibake gate must reject, not ship garbage
    page = "<html><body><p>日本語の文書です。これはテストです。</p></body></html>".encode("euc_jp")
    assert _decode_page(page) is None
    assert parse_html_text(page) is None
    # same content DECLARED decodes fine
    page2 = (
        '<html><head><meta charset="euc-jp"></head>'
        "<body><p>日本語の文書です。</p></body></html>"
    ).encode("euc_jp")
    assert parse_html_text(page2) is not None


def test_gate_passes_genuine_latin_prose():
    for text in (
        "naïve déjà vu — l’œuvre complète… «très bien» café crème",
        "Füße, Größe und Übermut — schön!",
        "¡Hola! ¿Qué tal? El niño comió jalapeños.",
        "plain ascii with no high bytes at all",
    ):
        assert not _fallback_gibberish(f"<html><body><p>{text}</p></body></html>")
        got = parse_html_text(f"<html><body><p>{text}</p></body></html>".encode("windows-1252"))
        assert got is not None and got["text"] == text


def test_gate_rejects_mojibake_samples():
    for true_codec, sample in (
        ("euc_jp", "多言語の文章です。これはテストの文書です。"),
        ("gb18030", "中文内容测试页面，这是一个文档。"),
        ("cp949", "한국어 문서 테스트 내용입니다."),
    ):
        moji = sample.encode(true_codec).decode("windows-1252", errors="ignore")
        assert _fallback_gibberish(f"<p>{moji}</p>"), true_codec


def test_charset_grid_rejects_exactly_page9():
    for d in (0, 3, 7, 12):
        pages = list(iter_warc_responses(synth_charset_warc(d)))
        assert len(pages) == len(_CHARSET_PAGES)
        for p, (uri, status, ctype, body) in enumerate(pages):
            got = parse_html_text(body, content_type_charset(ctype))
            if p in _CHARSET_REJECT_PAGES:
                assert got is None, (d, p)
            else:
                assert got is not None, (d, p)
                assert got["title"] == charset_page_title(d, p)
                assert got["text"] == charset_page_text(d, p)


def test_cjk_pages_flow_through_harvest():
    from danae_spark.multimodal.harvest import harvest_text

    page = (
        '<html><head><meta charset="shift_jis"><title>日本</title></head>'
        "<body><p>日本語 t3 テスト</p></body></html>"
    ).encode("cp932")
    got = harvest_text(page)
    assert got is not None and got["doc_class"] == "html"
    assert got["text"] == "日本語 t3 テスト"
