"""Cavnar–Trenkle language ID (operators/langid.py, r12): held-out
per-script accuracy, the 'und' contract, Spark-plan parity with the
pure-Python statement on non-Latin text, and strata consistency."""

from __future__ import annotations

import pytest

from danae_spark.operators.langid import (
    _CORPORA,
    _PROFILES,
    _PROFILE_SIZE,
    build_profiles,
    classify_py,
    lang_id_ngram_frame,
)

# held-out sentences (none appear in the training corpora)
HELD_OUT = {
    "en": "a small child reads a good book near the window every evening",
    "es": "una niña pequeña lee un buen libro cerca de la ventana cada noche y después escribe una carta para su abuela",
    "fr": "une petite fille lit un bon livre près de la fenêtre chaque soir",
    "de": "ein kleines kind liest jeden abend ein gutes buch am fenster",
    "it": "una piccola bambina legge un buon libro vicino alla finestra ogni sera e poi scrive una lettera per la sua nonna che abita in città",
    "pt": "uma menina pequena lê um bom livro perto da janela todas as noites e depois escreve uma carta para a sua avó",
    "nl": "een klein kind leest elke avond een goed boek bij het raam",
    "pl": "małe dziecko czyta dobrą książkę przy oknie każdego wieczoru",
    "cs": "malé dítě čte každý večer dobrou knihu u okna a potom píše dopis pro svou babičku která bydlí ve městě",
    "tr": "küçük bir çocuk her akşam pencerenin yanında güzel bir kitap okur",
    "ru": "маленький ребёнок читает хорошую книгу у окна каждый вечер",
    "el": "ένα μικρό παιδί διαβάζει ένα καλό βιβλίο κοντά στο παράθυρο κάθε βράδυ",
    "ja": "小さな子供は毎晩窓のそばで良い本を読んでいます",
    "zh": "小孩子每天晚上在窗边读一本好书",
    "ko": "어린 아이가 매일 저녁 창가에서 좋은 책을 읽는다",
    "ar": "طفل صغير يقرأ كتابا جيدا بجانب النافذة كل مساء",
    # r14 breadth: the other nine of the top-25 crawl languages
    "hi": "आज बाजार में बहुत से लोग थे और बच्चों ने मिठाई खरीदी क्योंकि शाम को त्योहार है",
    "th": "วันนี้อากาศดีมากเราจึงไปเดินเล่นที่สวนสาธารณะและซื้อผลไม้กลับบ้าน",
    "he": "בבוקר הלכנו לשוק לקנות ירקות טריים ולחם חם ואחר כך שתינו קפה ליד הים",
    "vi": "hôm nay trời đẹp nên chúng tôi ra công viên chơi và mua trái cây về nhà cho cả gia đình",
    "id": "hari ini kami pergi ke pasar untuk membeli sayur dan buah karena besok ada acara keluarga di rumah",
    "sv": "idag gick vi till torget för att köpa grönsaker och färskt bröd och sedan drack vi kaffe vid havet",
    "da": "i dag gik vi på markedet for at købe grøntsager og frisk brød og bagefter drak vi kaffe ved havet",
    "fi": "tänään kävimme torilla ostamassa vihanneksia ja tuoretta leipää ja sen jälkeen joimme kahvia meren rannalla",
    "uk": "ця книжка є дуже цікавою і її автор відомий у всьому світі бо він пише щиро про життя звичайних людей",
}


@pytest.mark.parametrize("lang", sorted(HELD_OUT))
def test_held_out_sentence_classifies(lang):
    assert classify_py(HELD_OUT[lang]) == lang


def test_profiles_shape_and_determinism():
    assert _PROFILES == build_profiles()  # deterministic rebuild
    langs = {l for l, _, _ in _PROFILES}
    assert langs == set(_CORPORA) and len(langs) == 25
    for lang in langs:
        ranks = [r for l, _, r in _PROFILES if l == lang]
        assert ranks == list(range(1, _PROFILE_SIZE + 1))


def test_und_for_letterless_text():
    assert classify_py("12345 !!! 89 --- 00") == "und"
    assert classify_py("") == "und"


def test_spark_frame_matches_python_on_mixed_scripts(spark):
    rows = [(i, text, lang) for i, (lang, text) in enumerate(sorted(HELD_OUT.items()))]
    rows.append((99, "1234 #### 5678", "zz"))  # letter-less -> und
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: (r["predicted"], r["n_profile"])
        for r in lang_id_ngram_frame(df).collect()
    }
    for i, (lang, text) in enumerate(sorted(HELD_OUT.items())):
        assert got[i][0] == classify_py(text) == lang, lang
    assert got[99] == ("und", 0)


def test_strata_totals_match_doc_count(spark, sf_dir):
    from danae_spark.catalog import load_table
    from danae_spark.operators.langid import corpus_lang_strata

    n_docs = load_table(spark, sf_dir, "documents").count()
    strata = corpus_lang_strata(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in strata) == n_docs
    assert all(0 <= r["q_bucket"] <= 4 for r in strata)


def test_lang_stopwords_derive_from_corpora():
    from danae_spark.operators.langid import (
        _STOPWORD_LANGS,
        lang_stopwords,
    )

    assert "ja" not in _STOPWORD_LANGS and "zh" not in _STOPWORD_LANGS
    assert "the" in lang_stopwords("en")
    assert "de" in lang_stopwords("es") or "el" in lang_stopwords("es")
    assert "und" in lang_stopwords("de")
    for lng in _STOPWORD_LANGS:
        words = lang_stopwords(lng)
        assert len(words) == 12 and len(set(words)) == 12
        assert lang_stopwords(lng) == words  # deterministic


def test_quality_multilang_routes_by_language(spark, sf_dir):
    from danae_spark.operators.langid import quality_multilang

    rows = quality_multilang(spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        if r["predicted"] in ("ja", "zh", "und"):
            assert r["stop_hits"] is None and r["stop_ratio"] is None
        else:
            assert r["stop_hits"] is not None
        assert 0.0 <= r["mq_score"] <= 1.0


def test_crawl_lang_report_scripts(spark, sf_dir):
    """The charset->language composition: each CJK/Cyrillic page class
    of the charset grid lands in its own language stratum with exactly
    one page per doc."""
    from danae_spark.catalog import load_table
    from danae_spark.operators.langid import crawl_lang_report

    n_docs = load_table(spark, sf_dir, "documents").count()
    got = {r["predicted"]: r["n_pages"] for r in crawl_lang_report(spark, sf_dir).collect()}
    for lang in ("ja", "ko", "zh", "ru"):
        assert got[lang] == n_docs, (lang, got)
    # 9 shipped pages per doc total (p9 rejected by the mojibake gate)
    assert sum(got.values()) == 9 * n_docs
