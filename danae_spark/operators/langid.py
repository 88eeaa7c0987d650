"""Cavnar–Trenkle character-n-gram language identification (r12).

The public method of Cavnar & Trenkle, "N-Gram-Based Text
Categorization" (SDAIR-94), restated for a distributed engine with a
full-value SQL oracle:

  - per LANGUAGE, a rank profile: the top-`_PROFILE_SIZE` most
    frequent character 1/2/3-GRAMS of a deterministic training corpus
    (embedded below — no external model), ranked 1..N with ties broken
    by gram;
  - per DOCUMENT, the same profile over the first `_DOC_CAP` chars of
    the letters-only normalized text (top `_DOC_PROFILE` grams —
    unigrams identify the SCRIPT, so unseen CJK/Cyrillic vocabulary
    still routes to the right language family);
  - distance = the "out-of-place" measure: for each doc-profile gram,
    |doc_rank - lang_rank| when the language profile contains it, else
    the maximum penalty (`_PROFILE_SIZE`); predicted language =
    argmin, ties broken lexicographically; a document with no trigrams
    is 'und'.

Everything runs as built-in expressions: one explode of capped
trigrams, two windowed ranks, and a broadcast join against the (lang,
gram, rank) profile table — no Python in the per-doc path, and the
profile table (25 languages x 100 grams = 2500 rows) broadcasts
trivially at any corpus scale; breadth grows the VALUES table, never
the plan. The oracle restates the identical
pipeline in DuckDB SQL with the profiles inlined as VALUES rows
generated from the SAME Python constant, so the two sides cannot
drift.

Reference parity note: the reference (smartdatalake/danae) has no
language ID; this is mandated LLM-pipeline extension surface (the
multilingual strata a crawl-scale corpus needs, paired with the r12
WHATWG charset breadth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from danae_spark.catalog import load_table
from danae_spark.session import stage_parallelism

_PROFILE_SIZE = 100  # grams per language profile; also the miss penalty
_DOC_PROFILE = 60  # grams per document profile
_DOC_CAP = 600  # chars of normalized text fed to the n-gram explode
_GRAM_SIZES = (1, 2, 3)  # unigrams carry the SCRIPT, trigrams the language

# deterministic per-language training corpora — ordinary prose written
# for this table, chosen to exercise each script (Latin with the
# accent repertoires the charset work unlocks, Cyrillic, Greek, CJK,
# Hangul, Arabic). The profile TABLE derived from these constants is
# the model; both the Spark plan and the DuckDB oracle consume it.
_CORPORA: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then the dog "
        "runs into the forest where the trees are tall and the light is "
        "soft in the morning and everyone walks to the river with their "
        "friends because the water is clear and the weather is warm"
        " people often say that reading gives you a new way to see the world and a quiet evening at home is better than anything else"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y luego el "
        "perro corre hacia el bosque donde los árboles son altos y la luz "
        "es suave por la mañana y todos caminan al río con sus amigos "
        "porque el agua es clara y el tiempo es cálido"
        " la gente dice a menudo que leer te da una nueva manera de ver el mundo y una noche tranquila en casa es mejor que cualquier otra cosa"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et "
        "ensuite le chien court dans la forêt où les arbres sont grands "
        "et la lumière est douce le matin et tout le monde marche vers la "
        "rivière avec ses amis parce que l'eau est claire"
        " les gens disent souvent que la lecture donne une nouvelle façon de voir le monde et une soirée tranquille à la maison est mieux que tout"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und dann "
        "läuft der hund in den wald wo die bäume hoch sind und das licht "
        "am morgen weich ist und alle gehen mit ihren freunden zum fluss "
        "weil das wasser klar und das wetter warm ist"
        " die leute sagen oft dass lesen einem eine neue art gibt die welt zu sehen und ein ruhiger abend zu hause ist besser als alles andere"
    ),
    "it": (
        "la rapida volpe marrone salta sopra il cane pigro e poi il cane "
        "corre nella foresta dove gli alberi sono alti e la luce è "
        "morbida al mattino e tutti camminano verso il fiume con i loro "
        "amici perché l'acqua è chiara e il tempo è caldo"
        " la gente dice spesso che leggere ti dà un nuovo modo di vedere il mondo e una serata tranquilla a casa è meglio di qualsiasi altra cosa"
    ),
    "pt": (
        "a rápida raposa marrom pula sobre o cão preguiçoso e depois o "
        "cão corre para a floresta onde as árvores são altas e a luz é "
        "suave pela manhã e todos caminham até o rio com os seus amigos "
        "porque a água é clara e o tempo é quente"
        " as pessoas dizem muitas vezes que ler dá uma nova maneira de ver o mundo e uma noite tranquila em casa é melhor do que qualquer outra coisa"
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond en daarna rent de "
        "hond het bos in waar de bomen hoog zijn en het licht zacht is in "
        "de ochtend en iedereen loopt met zijn vrienden naar de rivier "
        "omdat het water helder is en het weer warm is"
        " mensen zeggen vaak dat lezen je een nieuwe manier geeft om de wereld te zien en een rustige avond thuis is beter dan wat dan ook"
    ),
    "pl": (
        "szybki brązowy lis przeskakuje nad leniwym psem a potem pies "
        "biegnie do lasu gdzie drzewa są wysokie a światło jest miękkie "
        "rano i wszyscy idą nad rzekę ze swoimi przyjaciółmi ponieważ "
        "woda jest czysta a pogoda jest ciepła"
        " ludzie często mówią że czytanie daje nowy sposób patrzenia na świat a spokojny wieczór w domu jest lepszy niż cokolwiek innego"
    ),
    "cs": (
        "rychlá hnědá liška skáče přes líného psa a potom pes běží do "
        "lesa kde jsou stromy vysoké a světlo je ráno měkké a všichni "
        "jdou k řece se svými přáteli protože voda je čistá a počasí je "
        "teplé a příliš žluťoučký kůň úpěl ďábelské ódy"
        " lidé často říkají že čtení dává nový způsob jak vidět svět a klidný večer doma je lepší než cokoli jiného"
    ),
    "tr": (
        "hızlı kahverengi tilki tembel köpeğin üzerinden atlar ve sonra "
        "köpek ormana koşar orada ağaçlar yüksektir ve sabah ışık "
        "yumuşaktır ve herkes arkadaşlarıyla nehre yürür çünkü su "
        "berraktır ve hava sıcaktır"
        " insanlar sık sık okumanın dünyayı görmek için yeni bir yol verdiğini söyler ve evde sakin bir akşam her şeyden daha iyidir"
    ),
    "ru": (
        "быстрая коричневая лиса прыгает через ленивую собаку а потом "
        "собака бежит в лес где деревья высокие а свет мягкий утром и "
        "все идут к реке со своими друзьями потому что вода чистая и "
        "погода тёплая"
        " люди часто говорят что чтение даёт новый взгляд на мир и тихий вечер дома лучше чем что либо другое"
    ),
    "el": (
        "η γρήγορη καφέ αλεπού πηδά πάνω από τον τεμπέλη σκύλο και μετά "
        "ο σκύλος τρέχει στο δάσος όπου τα δέντρα είναι ψηλά και το φως "
        "είναι απαλό το πρωί και όλοι περπατούν στο ποτάμι με τους "
        "φίλους τους επειδή το νερό είναι καθαρό"
        " οι άνθρωποι λένε συχνά ότι το διάβασμα δίνει έναν νέο τρόπο να βλέπεις τον κόσμο και ένα ήσυχο βράδυ στο σπίτι είναι καλύτερο από οτιδήποτε"
    ),
    "ja": (
        "速い茶色の狐はのろまな犬を飛び越えてそれから犬は森へ走っていき"
        "そこでは木々が高く朝の光は柔らかくみんなは友達と川へ歩いていく"
        "なぜなら水は澄んでいて天気は暖かいからだ日本語の文章はこのように続く"
        " 人々はよく読書は世界を見る新しい方法を与えてくれると言い家での静かな夜は何よりも良いものだ"
    ),
    "zh": (
        "敏捷的棕色狐狸跳过懒惰的狗然后狗跑进森林那里的树木很高早晨的光线"
        "很柔和大家都和朋友们走到河边因为水很清澈天气很温暖中文的文章就这样继续"
        " 人们常说读书给你一种看世界的新方法在家里安静的夜晚比什么都好"
    ),
    "ko": (
        "빠른 갈색 여우가 게으른 개를 뛰어넘고 그 다음 개는 숲으로 달려간다 "
        "그곳의 나무들은 높고 아침의 빛은 부드럽다 모두가 친구들과 강으로 "
        "걸어간다 왜냐하면 물이 맑고 날씨가 따뜻하기 때문이다"
        " 사람들은 흔히 독서가 세상을 보는 새로운 방법을 준다고 말하며 집에서의 조용한 저녁은 무엇보다 좋다"
    ),
    "ar": (
        "الثعلب البني السريع يقفز فوق الكلب الكسول ثم يركض الكلب إلى "
        "الغابة حيث الأشجار عالية والضوء ناعم في الصباح والجميع يمشون "
        "إلى النهر مع أصدقائهم لأن الماء صاف والطقس دافئ"
        " يقول الناس غالبا إن القراءة تعطيك طريقة جديدة لرؤية العالم وأمسية هادئة في المنزل أفضل من أي شيء آخر"
    ),
    # r14 breadth: the rest of the top-25 crawl languages — Devanagari,
    # Thai (unsegmented), Hebrew, Vietnamese (Latin + stacked
    # diacritics), Indonesian, the Nordic trio, Ukrainian (Cyrillic
    # that must separate from ru)
    "hi": (
        "तेज भूरी लोमड़ी आलसी कुत्ते के ऊपर कूदती है फिर कुत्ता जंगल की ओर "
        "दौड़ता है जहां पेड़ ऊंचे हैं और सुबह की रोशनी कोमल है सब लोग अपने "
        "दोस्तों के साथ नदी की ओर चलते हैं क्योंकि पानी साफ है और मौसम गरम है"
        " लोग अक्सर कहते हैं कि पढ़ना दुनिया को देखने का नया तरीका देता है और घर की शांत शाम सबसे अच्छी होती है"
    ),
    "th": (
        "สุนัขจิ้งจอกสีน้ำตาลตัวไวกระโดดข้ามสุนัขขี้เกียจแล้วสุนัขวิ่งเข้าไปในป่าที่ต้นไม้สูง"
        "และแสงยามเช้านุ่มนวลทุกคนเดินไปที่แม่น้ำกับเพื่อนเพราะน้ำใสและอากาศอบอุ่น"
        "ผู้คนมักพูดว่าการอ่านให้วิธีใหม่ในการมองโลกและค่ำคืนที่เงียบสงบที่บ้านดีที่สุด"
    ),
    "he": (
        "השועל החום המהיר קופץ מעל הכלב העצלן ואז הכלב רץ אל היער שם "
        "העצים גבוהים והאור בבוקר רך כולם הולכים אל הנהר עם החברים שלהם "
        "כי המים צלולים ומזג האוויר חם"
        " אנשים אומרים לעתים קרובות שקריאה נותנת דרך חדשה לראות את העולם וערב שקט בבית טוב מכל דבר אחר"
    ),
    "vi": (
        "con cáo nâu nhanh nhẹn nhảy qua con chó lười biếng rồi con chó "
        "chạy vào rừng nơi những cái cây cao và ánh sáng buổi sáng dịu "
        "dàng mọi người đi bộ ra sông cùng bạn bè vì nước trong và thời tiết ấm áp"
        " người ta thường nói rằng đọc sách cho bạn một cách mới để nhìn thế giới và một buổi tối yên tĩnh ở nhà tốt hơn mọi thứ khác"
    ),
    "id": (
        "rubah coklat yang cepat melompati anjing yang malas lalu anjing "
        "itu berlari ke hutan di mana pohon pohon tinggi dan cahaya pagi "
        "lembut semua orang berjalan ke sungai bersama teman teman mereka "
        "karena airnya jernih dan cuacanya hangat"
        " orang sering berkata bahwa membaca memberi cara baru untuk melihat dunia dan malam yang tenang di rumah lebih baik dari segalanya"
    ),
    "sv": (
        "den snabba bruna räven hoppar över den lata hunden sedan springer "
        "hunden till skogen där träden är höga och ljuset på morgonen är "
        "mjukt alla går till floden med sina vänner eftersom vattnet är "
        "klart och vädret är varmt"
        " folk säger ofta att läsning ger dig ett nytt sätt att se världen och en lugn kväll hemma är bättre än allt annat"
    ),
    "da": (
        "den hurtige brune ræv hopper over den dovne hund så løber hunden "
        "til skoven hvor træerne er høje og lyset om morgenen er blødt "
        "alle går til floden med deres venner fordi vandet er klart og "
        "vejret er varmt"
        " folk siger ofte at læsning giver dig en ny måde at se verden på og en stille aften derhjemme er bedre end alt andet"
    ),
    "fi": (
        "nopea ruskea kettu hyppää laiskan koiran yli sitten koira juoksee "
        "metsään jossa puut ovat korkeita ja aamun valo on pehmeää kaikki "
        "kävelevät joelle ystäviensä kanssa koska vesi on kirkasta ja sää "
        "on lämmin"
        " ihmiset sanovat usein että lukeminen antaa uuden tavan nähdä maailma ja hiljainen ilta kotona on parempi kuin mikään muu"
    ),
    "uk": (
        "швидка бура лисиця стрибає через ледачого пса потім пес біжить до "
        "лісу де дерева високі а світло вранці мяке всі йдуть до річки зі "
        "своїми друзями бо вода чиста і погода тепла"
        " люди часто кажуть що читання дає новий спосіб бачити світ а тихий вечір удома кращий за все інше"
    ),
}


def _norm_py(text: str) -> str:
    """The Python statement of the shared normalization: lowercase,
    non-letter runs collapse to single spaces, one boundary space on
    each side (so word-boundary trigrams exist)."""
    words = "".join(c if c.isalpha() else " " for c in text.lower()).split()
    return " " + " ".join(words) + " " if words else ""


def _profile_py(text: str, size: int) -> list[str]:
    """Rank profile of a text: top-`size` trigrams by (count desc,
    gram asc) — the tie rule both engines restate via row_number."""
    norm = _norm_py(text)
    counts: dict[str, int] = {}
    for n in _GRAM_SIZES:
        for i in range(len(norm) - n + 1):
            g = norm[i : i + n]
            counts[g] = counts.get(g, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [g for g, _ in ranked[:size]]


def build_profiles() -> list[tuple[str, str, int]]:
    """(lang, gram, rank) rows for every language — the model table."""
    rows: list[tuple[str, str, int]] = []
    for lang in sorted(_CORPORA):
        for rank, gram in enumerate(_profile_py(_CORPORA[lang], _PROFILE_SIZE), 1):
            rows.append((lang, gram, rank))
    return rows


_PROFILES = build_profiles()


def classify_py(text: str) -> str:
    """Driver-side single-text classifier (tests / spot checks) — the
    same arithmetic the Spark plan and the oracle restate."""
    doc = _profile_py(text, _DOC_PROFILE)
    if not doc:
        return "und"
    by_lang: dict[str, dict[str, int]] = {}
    for lang, gram, rank in _PROFILES:
        by_lang.setdefault(lang, {})[gram] = rank
    best = None
    for lang in sorted(by_lang):
        prof = by_lang[lang]
        dist = sum(
            abs(drank - prof[g]) if g in prof else _PROFILE_SIZE
            for drank, g in enumerate(doc, 1)
        )
        if best is None or dist < best[0]:
            best = (dist, lang)
    return best[1]


# ------------------------------------------------------------ Spark plan

# shared normalization, as a SQL expression over a `text` column: both
# Spark (Java regex) and DuckDB (RE2) support \p{L}
_NORM_SQL = (
    r"CASE WHEN trim(regexp_replace(lower({t}), '[^\\p{{L}}]+', ' ')) = '' "
    r"THEN '' ELSE ' ' || "
    r"trim(regexp_replace(lower({t}), '[^\\p{{L}}]+', ' ')) || ' ' END"
)


def lang_id_ngram_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    label_col: str | None = "lang",
) -> DataFrame:
    """Cavnar–Trenkle language ID over any (id, text) frame. One
    trigram explode (capped at `_DOC_CAP` normalized chars), a count +
    rank window per document, a broadcast join against the profile
    table, and an argmin window — no UDFs anywhere."""
    spark = docs.sparkSession
    profiles = F.broadcast(
        spark.createDataFrame(_PROFILES, "lang string, gram string, lrank int")
    )

    norm = F.expr(
        f"substring({_NORM_SQL.format(t=text_col)}, 1, {_DOC_CAP})"
    ).alias("norm")
    base = docs.select(F.col(id_col), norm, *( [F.col(label_col)] if label_col else [] ))
    gram_lists = ", ".join(
        f"CASE WHEN length(norm) < {n} THEN array() "
        f"ELSE transform(sequence(1, length(norm) - {n - 1}), "
        f"i -> substring(norm, i, {n})) END"
        for n in _GRAM_SIZES
    )
    grams = base.select(
        id_col,
        F.explode(F.expr(f"concat({gram_lists})")).alias("gram"),
    )
    counts = grams.groupBy(id_col, "gram").count()
    wrank = W.partitionBy(id_col).orderBy(F.desc("count"), F.asc("gram"))
    doc_prof = (
        counts.withColumn("drank", F.row_number().over(wrank))
        .where(F.col("drank") <= _DOC_PROFILE)
        .select(id_col, "gram", "drank")
    )
    # Out-of-place distance, HIT-ONLY formulation (r17 perf; output
    # row-identical to the r12 crossJoin-all-25-languages plan, pinned
    # by the oracle + the row-wise-twin parity test). For a doc profile
    # of np grams, a language's distance decomposes as
    #   dist(lang) = Σ_hits |drank - lrank| + (np - n_hits(lang)) * P
    # so only actual (gram ∈ lang profile) matches need to flow through
    # the join — an INNER broadcast join on gram (~2 langs match per
    # gram) instead of 25 rows per doc-profile gram (the old plan
    # shuffled and aggregated 12x more rows), and the per-doc argmin
    # becomes a min(struct(dist, lang)) aggregate instead of a second
    # row_number window (one shuffle + full sort removed). Languages
    # with zero hits share dist = np * P; the argmin only needs the
    # lexicographically FIRST zero-hit language, recovered analytically
    # via array_except over the sorted language list.
    np_df = doc_prof.groupBy(id_col).agg(F.count("*").alias("__np"))
    hit_dists = (
        doc_prof.join(profiles, "gram")
        .groupBy(id_col, "lang")
        .agg(
            F.sum(F.abs(F.col("drank") - F.col("lrank"))).alias("__s"),
            F.count("*").alias("__h"),
        )
    )
    per_doc = hit_dists.groupBy(id_col).agg(
        # (np - h) * P added after the join with np_df below; min over
        # (s - h*P, lang) orders identically because np*P is constant
        # per doc
        F.min(
            F.struct(
                (F.col("__s") - F.col("__h") * F.lit(_PROFILE_SIZE)).alias("d0"),
                F.col("lang"),
            )
        ).alias("__bh"),
        F.collect_set("lang").alias("__hl"),
    )
    all_langs = sorted({l for l, _, _ in _PROFILES})
    langs_arr = F.array(*[F.lit(l) for l in all_langs])
    cand = np_df.join(per_doc, id_col, "left")
    miss_lang = F.get(
        F.array_except(langs_arr, F.coalesce("__hl", F.array())), F.lit(0)
    )
    hit_struct = F.when(
        F.col("__bh").isNotNull(),
        F.struct(
            (F.col("__bh.d0") + F.col("__np") * F.lit(_PROFILE_SIZE)).alias("dist"),
            F.col("__bh.lang").alias("lang"),
        ),
    )
    miss_struct = F.when(
        miss_lang.isNotNull(),
        F.struct(
            (F.col("__np") * F.lit(_PROFILE_SIZE)).alias("dist"),
            miss_lang.alias("lang"),
        ),
    )
    # least() skips NULLs: docs where every language hits lose the miss
    # candidate, docs with zero hits lose the hit candidate — np > 0
    # guarantees at least one of the two exists
    best_struct = F.least(hit_struct, miss_struct)
    best = cand.withColumn("__best", best_struct).select(
        id_col,
        F.col("__best.lang").alias("predicted"),
        F.col("__best.dist").alias("best_dist"),
        F.col("__np").cast("int").alias("n_profile"),
    )
    out = base.select(id_col, *( [label_col] if label_col else [] )).join(
        best, id_col, "left"
    )
    out = out.select(
        id_col,
        F.coalesce("n_profile", F.lit(0)).alias("n_profile"),
        F.coalesce("predicted", F.lit("und")).alias("predicted"),
        "best_dist",
        *(
            [
                (F.coalesce("predicted", F.lit("und")) == F.col(label_col))
                .cast("int")
                .alias("agrees_with_label")
            ]
            if label_col
            else []
        ),
    )
    return out.orderBy(id_col)


def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return lang_id_ngram_frame(
        docs.repartition(stage_parallelism(spark), "doc_id")
    )


def _profiles_values_sql() -> str:
    rows = ", ".join(
        f"('{lang}', '{gram}', {rank})" for lang, gram, rank in _PROFILES
    )
    return f"(VALUES {rows}) AS prof(lang, gram, lrank)"


def lang_id_ngram_oracle(source: str = "documents", label: bool = True) -> str:
    """The identical pipeline in DuckDB SQL, profiles inlined from the
    same Python constant. `source` is the relation/CTE holding
    (doc_id, text[, lang]); `label=False` drops the lang join and the
    agrees_with_label column (for sources with no gold label) —
    defaults produce the registered entry's exact SQL."""
    norm = _NORM_SQL.format(t="text").replace("\\\\p", "\\p")
    # DuckDB's regexp_replace is FIRST-match unless the 'g' flag is
    # given (Spark/Java replace globally by default) — without it a
    # text whose non-letter runs aren't all single spaces normalizes
    # differently on the two sides
    norm = norm.replace("', ' ')", "', ' ', 'g')")
    agrees = (
        ",\n       CAST(COALESCE(t.predicted, 'und') = b.lang AS INT)"
        " AS agrees_with_label" if label else ""
    )
    gram_lists = " || ".join(
        f"(CASE WHEN length(norm) < {n} THEN [] "
        f"ELSE list_transform(range(1, length(norm) - {n - 2}), "
        f"i -> substring(norm, i, {n})) END)"
        for n in _GRAM_SIZES
    )
    return f"""
WITH base AS (
  SELECT doc_id,{" lang," if label else ""}
         substring({norm}, 1, {_DOC_CAP}) AS norm
  FROM {source}
),
grams AS (
  SELECT doc_id, unnest(
    {gram_lists}
  ) AS gram
  FROM base
),
counts AS (
  SELECT doc_id, gram, COUNT(*) AS cnt FROM grams GROUP BY doc_id, gram
),
doc_prof AS (
  SELECT doc_id, gram, drank FROM (
    SELECT doc_id, gram,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY cnt DESC, gram ASC) AS drank
    FROM counts
  ) WHERE drank <= {_DOC_PROFILE}
),
prof AS (SELECT * FROM {_profiles_values_sql()}),
langs AS (SELECT DISTINCT lang FROM prof),
dists AS (
  SELECT d.doc_id, l.lang,
         CAST(SUM(COALESCE(abs(d.drank - p.lrank), {_PROFILE_SIZE}))
              AS BIGINT) AS dist,
         COUNT(*) AS n_profile
  FROM doc_prof d CROSS JOIN langs l
  LEFT JOIN prof p ON p.lang = l.lang AND p.gram = d.gram
  GROUP BY d.doc_id, l.lang
),
best AS (
  SELECT doc_id, lang AS predicted, dist AS best_dist,
         CAST(n_profile AS INT) AS n_profile
  FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY dist ASC, lang ASC) AS rn
    FROM dists
  ) WHERE rn = 1
)
SELECT b.doc_id,
       COALESCE(t.n_profile, 0) AS n_profile,
       COALESCE(t.predicted, 'und') AS predicted,
       t.best_dist{agrees}
FROM base b LEFT JOIN best t ON b.doc_id = t.doc_id
ORDER BY b.doc_id
"""


# ------------------------------------- language strata over the corpus


def corpus_lang_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus stratification a multilingual pipeline reads before
    sampling: predicted language (Cavnar–Trenkle, above) x quality
    bucket (the certified text_quality score, floor(score*5) capped at
    4), with doc counts, mean quality, and the token budget each
    stratum holds. Composes the two certified plans by doc_id — the
    oracle composes the SAME two oracle SQL bodies, so the strata can
    never disagree with the row-level entries."""
    from danae_spark.functions.rounding import rnd
    from danae_spark.operators.textstats import text_quality

    lang = lang_id_ngram(spark, sf_dir).select("doc_id", "predicted")
    q = text_quality(spark, sf_dir).select("doc_id", "quality_score", "n_tokens")
    j = lang.join(q, "doc_id")
    bucket = F.least(F.floor(F.col("quality_score") * 5), F.lit(4)).cast("int")
    return (
        j.groupBy(
            F.col("predicted").alias("lang_pred"), bucket.alias("q_bucket")
        )
        .agg(
            F.count("*").alias("n_docs"),
            rnd(F.avg("quality_score"), 6).alias("avg_quality"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("lang_pred", "q_bucket")
    )


def corpus_lang_strata_oracle() -> str:
    from danae_spark.operators.textstats import text_quality_oracle

    return f"""
WITH lang AS ({lang_id_ngram_oracle()}),
q AS ({text_quality_oracle()})
SELECT l.predicted AS lang_pred,
       CAST(least(floor(q.quality_score * 5), 4) AS INT) AS q_bucket,
       COUNT(*) AS n_docs,
       floor(avg(q.quality_score) * power(10, 6) + 0.5001) / power(10, 6)
         AS avg_quality,
       CAST(SUM(q.n_tokens) AS BIGINT) AS total_tokens
FROM lang l JOIN q ON l.doc_id = q.doc_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --------------------------- language-routed quality scoring (r12)

# languages whose corpora are whitespace-segmented: stopword tables
# derive deterministically from the SAME embedded corpora as the rank
# profiles (top tokens by count desc, token asc). ja/zh have no space
# segmentation — their stopword leg is NULL and the score falls back
# to a neutral stop component.
_STOPWORD_LANGS = tuple(l for l in sorted(_CORPORA) if l not in ("ja", "zh", "th"))
_STOPWORDS_PER_LANG = 12


def lang_stopwords(lang: str, size: int = _STOPWORDS_PER_LANG) -> list[str]:
    """Top-`size` tokens of the language's training corpus — the
    function words that dominate any prose sample of that language."""
    counts: dict[str, int] = {}
    for tok in _norm_py(_CORPORA[lang]).split():
        counts[tok] = counts.get(tok, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [t for t, _ in ranked[:size]]


def quality_multilang_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Language-ROUTED quality scoring over any (id, text) frame (r12;
    frame-factored in r14 so the curate pipelines compose it): the
    English-stopword leg of the heuristic quality score mis-scores
    every non-English doc — this variant routes each document's
    stopword ratio through ITS predicted language's table (derived
    from the langid corpora, so the two models cannot drift). Columns:
    predicted language, token count (letters-only, \\p{L} split —
    multilingual), stopword hits / ratio against the routed table
    (NULL for the unsegmented CJK languages), and the composite score
    with a neutral stop component when no table applies. One scan +
    the lang_id join; the stopword filter is a CASE over
    broadcast-inlined constant lists."""
    from danae_spark.functions.rounding import rnd

    lang = lang_id_ngram_frame(
        docs.select(id_col, text_col), id_col=id_col, text_col=text_col,
        label_col=None,
    ).select(id_col, "predicted")
    toks = rf"filter(split(lower({text_col}), '[^\\p{{L}}]+'), t -> t <> '')"
    branches = " ".join(
        "WHEN '{}' THEN size(filter({}, t -> t in ({})))".format(
            lng, toks, ", ".join(f"'{w}'" for w in lang_stopwords(lng))
        )
        for lng in _STOPWORD_LANGS
    )
    j = docs.select(id_col, text_col).join(lang, id_col)
    j = j.select(
        id_col,
        "predicted",
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(f"CASE predicted {branches} ELSE NULL END").alias("stop_hits"),
    )
    stop_ratio = F.col("stop_hits") / F.greatest(F.col("n_tokens"), F.lit(1))
    # the neutral leg must be an explicit CASE: least() IGNORES nulls
    # (least(NULL, 1.0) = 1.0 in Spark AND DuckDB), so a
    # coalesce-around-least silently scored unsegmented languages 1.0
    # instead of the documented 0.5 (r14 fix, mirrored in the oracle)
    stop_leg = F.when(
        F.col("stop_hits").isNull(), F.lit(0.5)
    ).otherwise(F.least(stop_ratio * 5, F.lit(1.0)))
    score = F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.5 + stop_leg * 0.5
    return j.select(
        id_col,
        "predicted",
        "n_tokens",
        "stop_hits",
        rnd(stop_ratio, 6).alias("stop_ratio"),
        rnd(score, 6).alias("mq_score"),
    ).orderBy(id_col)


def quality_multilang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered documents-table entry — delegates to
    quality_multilang_frame (identical plan to the pre-r14 inline
    form; the label join the old lang_id_ngram call carried was
    projected away immediately)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_multilang_frame(
        docs.repartition(stage_parallelism(spark), "doc_id")
    )


def quality_multilang_oracle(source: str = "documents", label: bool = True) -> str:
    """DuckDB restatement, source-parameterized (r14) so the curate
    compositions reuse the exact CTE body over crawled pages.
    `source` holds (doc_id, text[, lang]); `label=False` matches the
    frame form's label-free langid subplan."""
    toks = "list_filter(string_split_regex(lower(text), '[^\\p{L}]+'), t -> t <> '')"
    branches = " ".join(
        "WHEN '{}' THEN len(list_filter({}, t -> t IN ({})))".format(
            lng, toks, ", ".join(f"'{w}'" for w in lang_stopwords(lng))
        )
        for lng in _STOPWORD_LANGS
    )
    return f"""
WITH lang AS ({lang_id_ngram_oracle(source=source, label=label)}),
m AS (
  SELECT d.doc_id, l.predicted,
         CAST(len({toks}) AS INT) AS n_tokens,
         CAST(CASE l.predicted {branches} ELSE NULL END AS INT) AS stop_hits
  FROM {source} d JOIN lang l ON d.doc_id = l.doc_id
)
SELECT doc_id, predicted, n_tokens, stop_hits,
       floor((stop_hits * 1.0 / greatest(n_tokens, 1)) * power(10, 6) + 0.5001)
         / power(10, 6) AS stop_ratio,
       floor((least(n_tokens / 100.0, 1.0) * 0.5
              + (CASE WHEN stop_hits IS NULL THEN 0.5
                      ELSE least(stop_hits * 1.0 / greatest(n_tokens, 1) * 5,
                                 1.0) END) * 0.5) * power(10, 6) + 0.5001)
         / power(10, 6) AS mq_score
FROM m ORDER BY doc_id
"""


# ------------------------ language ID over the decoded crawl (r12)


def crawl_lang_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The charset->language composition capstone (r12): the certified
    charset-routed crawl extraction (crawl_charset_extract — WHATWG
    precedence over the 10-page grid incl. declared CJK/Cyrillic pages
    and the mojibake-gated reject) feeds the certified language
    classifier, and the report counts pages per PREDICTED language —
    the number a multilingual crawl operator reads to see what the
    charset work actually unlocked. Rejected pages (NULL text) are
    excluded BEFORE classification, so the report reflects only text
    that shipped."""
    from danae_spark.multimodal.warc import crawl_charset_extract_roundtrip
    from danae_spark.streaming.langstream import lang_id_stream

    pages = crawl_charset_extract_roundtrip(spark, sf_dir)
    pages = pages.where(F.col("text").isNotNull()).select(
        (
            F.col("doc_id") * 10
            + F.substring_index("uri", "/c", -1).cast("int")
        ).alias("page_id"),
        "text",
    )
    # classifier regime switch (r14): crawl pages here are SHORT
    # (tens of chars), where the row-wise array-expression classifier
    # (langstream.py — no gram explode, no shuffle; output-identical,
    # parity-pinned by tests/test_streaming_langid.py) runs ~3x
    # faster than the explode+window plan (5.1 s vs 15.1 s over 50k
    # pages at sf0.1). Long documents keep the explode plan — the
    # row-wise profile is O(|distinct grams|^2) per row.
    lang = lang_id_stream(pages, id_col="page_id", text_col="text")
    return (
        lang.groupBy("predicted")
        .agg(F.count("*").alias("n_pages"))
        .orderBy("predicted")
    )


def crawl_lang_report_oracle() -> str:
    from danae_spark.multimodal.warc import CRAWL_CHARSET_ORACLE

    return f"""
WITH charset_pages AS ({CRAWL_CHARSET_ORACLE}),
cpages AS (
  SELECT doc_id * 10 + CAST(str_split(uri, '/c')[2] AS INT) AS doc_id, text
  FROM charset_pages WHERE text IS NOT NULL
),
lang AS ({lang_id_ngram_oracle(source="cpages", label=False)})
SELECT predicted, CAST(COUNT(*) AS BIGINT) AS n_pages
FROM lang GROUP BY predicted ORDER BY predicted
"""
