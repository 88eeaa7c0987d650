"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All built-in-function expressions (whole-stage
codegen) except the fingerprint bottom-k, which is a window over hashed
grams — no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from danae_spark.catalog import load_table, widen
from danae_spark.functions.rounding import rnd
from danae_spark.session import stage_parallelism

# ------------------------------------------------------------- C8: language ID

STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "for", "on", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "para"),
    "fr": ("le", "la", "de", "et", "un", "que", "pour", "dans", "sur", "avec"),
}
LANG_ORDER = ("en", "es", "fr")  # deterministic tie-break preference


def _hits(lang: str) -> F.Column:
    terms = ", ".join(f"'{t}'" for t in STOPWORDS[lang])
    return F.expr(
        f"size(filter(split(lower(text), '[^a-z0-9]+'), t -> t in ({terms})))"
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword-heuristic language ID. Predicted = language with
    the most stopword hits (ties broken en > es > fr, 'und' if none)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    scored = docs.select(
        "doc_id",
        "lang",
        *[_hits(lang).alias(f"{lang}_hits") for lang in LANG_ORDER],
    )
    best = F.greatest(*[F.col(f"{lang}_hits") for lang in LANG_ORDER])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_ORDER:
        pred = pred.when(F.col(f"{lang}_hits") == best, F.lit(lang))
    return scored.withColumn("predicted", pred).select(
        "doc_id",
        "en_hits",
        "es_hits",
        "fr_hits",
        "predicted",
        (F.col("predicted") == F.col("lang")).cast("int").alias("agrees_with_label"),
    ).orderBy("doc_id")


def lang_id_oracle() -> str:
    hits = {
        lang: "len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
        f" t -> t IN ({', '.join(repr(t) for t in STOPWORDS[lang])})))"
        for lang in LANG_ORDER
    }
    best = f"greatest({hits['en']}, {hits['es']}, {hits['fr']})"
    return f"""
    SELECT doc_id,
           {hits['en']} AS en_hits,
           {hits['es']} AS es_hits,
           {hits['fr']} AS fr_hits,
           CASE WHEN {best} = 0 THEN 'und'
                WHEN {hits['en']} = {best} THEN 'en'
                WHEN {hits['es']} = {best} THEN 'es'
                ELSE 'fr' END AS predicted,
           CAST((CASE WHEN {best} = 0 THEN 'und'
                WHEN {hits['en']} = {best} THEN 'en'
                WHEN {hits['es']} = {best} THEN 'es'
                ELSE 'fr' END) = lang AS INT) AS agrees_with_label
    FROM documents ORDER BY doc_id
    """


# ---------------------------------------------------------- C9: quality score


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/punctuation/stopword-ratio quality metrics + composite score
    (the heuristics pre-training pipelines use for corpus filtering)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_chars = F.length("text")
    toks = F.expr("filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')")
    n_tokens = F.size(toks)
    en = ", ".join(f"'{t}'" for t in STOPWORDS["en"])
    stop_hits = F.expr(
        f"size(filter(split(lower(text), '[^a-z0-9]+'), t -> t in ({en})))"
    )
    punct = n_chars - F.length(F.regexp_replace("text", r"[.,;:!?]", ""))
    digits = n_chars - F.length(F.regexp_replace("text", "[0-9]", ""))
    # score is computed from the RAW ratios (not the display-rounded ones):
    # rounded inputs like 0.106383 make weighted sums land on exact decimal
    # halves where engines' round() implementations disagree
    punct_raw = punct / n_chars
    stop_raw = stop_hits / n_tokens
    score = (
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.4
        + (1 - F.least(F.col("punct_raw") * 10, F.lit(1.0))) * 0.3
        + F.least(F.col("stop_raw") * 5, F.lit(1.0)) * 0.3
    )
    return (
        docs.select(
            "doc_id",
            n_chars.alias("n_chars"),
            n_tokens.alias("n_tokens"),
            rnd(
                F.length(
                    F.concat_ws("", F.expr("filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')"))
                )
                / n_tokens,
                4,
            ).alias("avg_token_len"),
            rnd(punct / n_chars, 6).alias("punct_ratio"),
            rnd(digits / n_chars, 6).alias("digit_ratio"),
            rnd(stop_hits / n_tokens, 6).alias("stopword_ratio"),
            punct_raw.alias("punct_raw"),
            stop_raw.alias("stop_raw"),
        )
        .withColumn("quality_score", rnd(score, 6))
        .drop("punct_raw", "stop_raw")
        .orderBy("doc_id")
    )


def text_quality_oracle() -> str:
    en = ", ".join(repr(t) for t in STOPWORDS["en"])
    toks = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    stop = (
        f"len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
        f" t -> t IN ({en})))"
    )
    return f"""
    WITH m AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len({toks}) AS n_tokens,
             floor((length(array_to_string({toks}, '')) * 1.0 / len({toks})) * power(10, 4) + 0.5001) / power(10, 4)
               AS avg_token_len,
             floor(((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                   * 1.0 / length(text)) * power(10, 6) + 0.5001) / power(10, 6) AS punct_ratio,
             floor(((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                   * 1.0 / length(text)) * power(10, 6) + 0.5001) / power(10, 6) AS digit_ratio,
             floor(({stop} * 1.0 / len({toks})) * power(10, 6) + 0.5001) / power(10, 6) AS stopword_ratio,
             (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                   * 1.0 / length(text) AS punct_raw,
             {stop} * 1.0 / len({toks}) AS stop_raw
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens, avg_token_len, punct_ratio, digit_ratio,
           stopword_ratio,
           floor((least(n_tokens / 100.0, 1.0) * 0.4
                 + (1 - least(punct_raw * 10, 1.0)) * 0.3
                 + least(stop_raw * 5, 1.0) * 0.3) * power(10, 6) + 0.5001) / power(10, 6) AS quality_score
    FROM m ORDER BY doc_id
    """


# ----------------------------------------------------------- C10: token count

_BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per doc."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        F.size(F.expr("filter(split(text, ' +'), t -> t <> '')")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_BPE_PATTERN), F.lit(0))).alias(
            "bpe_tokens"
        ),
        F.length("text").alias("n_chars"),
    ).orderBy("doc_id")


def token_count_oracle() -> str:
    return f"""
    SELECT doc_id,
           len(list_filter(string_split_regex(text, ' +'), t -> t <> '')) AS ws_tokens,
           len(regexp_extract_all(lower(text), '{_BPE_PATTERN}')) AS bpe_tokens,
           length(text) AS n_chars
    FROM documents ORDER BY doc_id
    """


# ------------------------------------- C8+C9+C10: combined per-doc text stats


def text_stats_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = "lang",
    _extra_cols: list | None = None,
) -> DataFrame:
    """Language ID + quality metrics + token counts over ANY (id, text[,
    lang]) frame in ONE scan (merged r2 registry entry: every column is a
    row-wise built-in expression, so fusing the three operators removes
    two full table scans; whole-stage codegen keeps it a single pipelined
    stage — no joins, no shuffle until the final sort). When `lang_col`
    is None (no ground-truth labels — the common production case) the
    `agrees_with_label` column is null.
    Column semantics identical to lang_id / text_quality / token_count."""
    cols = [F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")]
    if lang_col is not None:
        cols.append(F.col(lang_col).alias("lang"))
    # heavy per-row regex/array work → spread beyond the file's scan tasks
    docs = widen(docs.select(*cols))

    # language ID columns
    best = F.greatest(*[_hits(lang) for lang in LANG_ORDER])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_ORDER:
        pred = pred.when(_hits(lang) == best, F.lit(lang))

    # quality columns (raw ratios feed the score — see text_quality)
    n_chars = F.length("text")
    toks = F.expr("filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')")
    n_tokens = F.size(toks)
    en = ", ".join(f"'{t}'" for t in STOPWORDS["en"])
    stop_hits = F.expr(
        f"size(filter(split(lower(text), '[^a-z0-9]+'), t -> t in ({en})))"
    )
    punct = n_chars - F.length(F.regexp_replace("text", r"[.,;:!?]", ""))
    digits = n_chars - F.length(F.regexp_replace("text", "[0-9]", ""))
    punct_raw = punct / n_chars
    stop_raw = stop_hits / n_tokens
    score = (
        F.least(n_tokens / 100.0, F.lit(1.0)) * 0.4
        + (1 - F.least(punct_raw * 10, F.lit(1.0))) * 0.3
        + F.least(stop_raw * 5, F.lit(1.0)) * 0.3
    )
    agrees = (
        (pred == F.col("lang")).cast("int")
        if lang_col is not None
        else F.lit(None).cast("int")
    )
    return docs.select(
        "doc_id",
        *[_hits(lang).alias(f"{lang}_hits") for lang in LANG_ORDER],
        pred.alias("predicted"),
        agrees.alias("agrees_with_label"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        rnd(F.length(F.concat_ws("", toks)) / n_tokens, 4).alias("avg_token_len"),
        rnd(punct / n_chars, 6).alias("punct_ratio"),
        rnd(digits / n_chars, 6).alias("digit_ratio"),
        rnd(stop_hits / n_tokens, 6).alias("stopword_ratio"),
        rnd(score, 6).alias("quality_score"),
        F.size(F.expr("filter(split(text, ' +'), t -> t <> '')")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_BPE_PATTERN), F.lit(0))).alias(
            "bpe_tokens"
        ),
        # extra row-wise columns riding the same scan/projection —
        # callers fusing signals (quality_filter's PII count) pass
        # already-aliased expressions over the `text` column
        *(_extra_cols or []),
    ).orderBy("doc_id")


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents-table entry point of `text_stats_frame`."""
    return text_stats_frame(load_table(spark, sf_dir, "documents"))


def text_stats_oracle(order_by: bool = True, source: str = "documents") -> str:
    """`order_by=False` returns the unordered core for composition into
    larger oracles (quality_filter) — safer than callers doing string
    surgery on the trailing ORDER BY. `source` renames the input
    relation (a (doc_id, text, lang) CTE) so compositions like
    crawl_curate can run the fragment VERBATIM over derived frames."""
    en = ", ".join(repr(t) for t in STOPWORDS["en"])
    toks = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    stop = (
        f"len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
        f" t -> t IN ({en})))"
    )
    hits = {
        lang: "len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
        f" t -> t IN ({', '.join(repr(t) for t in STOPWORDS[lang])})))"
        for lang in LANG_ORDER
    }
    best = f"greatest({hits['en']}, {hits['es']}, {hits['fr']})"
    pred = (
        f"CASE WHEN {best} = 0 THEN 'und'"
        f" WHEN {hits['en']} = {best} THEN 'en'"
        f" WHEN {hits['es']} = {best} THEN 'es'"
        f" ELSE 'fr' END"
    )
    return f"""
    WITH m AS (
      SELECT doc_id,
             {hits['en']} AS en_hits, {hits['es']} AS es_hits, {hits['fr']} AS fr_hits,
             {pred} AS predicted,
             CAST(({pred}) = lang AS INT) AS agrees_with_label,
             length(text) AS n_chars,
             len({toks}) AS n_tokens,
             floor((length(array_to_string({toks}, '')) * 1.0 / len({toks})) * power(10, 4) + 0.5001) / power(10, 4)
               AS avg_token_len,
             floor(((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                   * 1.0 / length(text)) * power(10, 6) + 0.5001) / power(10, 6) AS punct_ratio,
             floor(((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                   * 1.0 / length(text)) * power(10, 6) + 0.5001) / power(10, 6) AS digit_ratio,
             floor(({stop} * 1.0 / len({toks})) * power(10, 6) + 0.5001) / power(10, 6) AS stopword_ratio,
             (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                   * 1.0 / length(text) AS punct_raw,
             {stop} * 1.0 / len({toks}) AS stop_raw,
             len(list_filter(string_split_regex(text, ' +'), t -> t <> '')) AS ws_tokens,
             len(regexp_extract_all(lower(text), '{_BPE_PATTERN}')) AS bpe_tokens
      FROM {source}
    )
    SELECT doc_id, en_hits, es_hits, fr_hits, predicted, agrees_with_label,
           n_chars, n_tokens, avg_token_len, punct_ratio, digit_ratio,
           stopword_ratio,
           floor((least(n_tokens / 100.0, 1.0) * 0.4
                 + (1 - least(punct_raw * 10, 1.0)) * 0.3
                 + least(stop_raw * 5, 1.0) * 0.3) * power(10, 6) + 0.5001) / power(10, 6) AS quality_score,
           ws_tokens, bpe_tokens
    FROM m {"ORDER BY doc_id" if order_by else ""}
    """


# --------------------------- repetition signals (Gopher-style filtering)

DUP_2GRAM_MAX = 0.20
TOP_2GRAM_MAX = 0.30


def text_repetition_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Repetition-based quality signals over ANY (id, text) frame (the
    Gopher/RefinedWeb-style repetitious-text filters a pre-training
    pipeline runs corpus-wide):

    - dup_2gram_frac: fraction of word-2-gram occurrences that are
      repeats (1 − distinct/total),
    - top_2gram_frac: share of occurrences held by the doc's most
      frequent 2-gram,
    - dup_sent_frac: fraction of sentence occurrences that are repeats
      (sentences split on [.!?]),
    - keep: the filter decision (thresholds DUP_2GRAM_MAX/TOP_2GRAM_MAX).

    Plan: ONE explode of the 2-gram array + a (doc, gram) aggregation
    yields total/distinct/top counts together (one shuffle, map-side
    combined); sentence stats are row-wise over a once-projected array.

    Expression-cost note (the r6 35 s → 2 s fix): higher-order-function
    lambda bodies textually re-inline their captured expressions per
    ELEMENT, so building the gram array with `slice(<full tokenize
    expr>, i, 2)` re-ran the regex tokenizer ~n_tokens times per row —
    and deriving n/distinct/top from three separate array expressions
    re-ran the gram build per expression (and again inside every
    pushed-down filter that referenced the derived `keep`). Tokenize
    ONCE into a projected column behind the explode generator and
    derive every gram stat from the exploded aggregation instead."""
    docs = widen(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")))
    toks = "filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    sents = "filter(transform(split(text, '[.!?]+'), s -> trim(s)), s -> s <> '')"
    with_toks = docs.select(
        "doc_id",
        F.expr(toks).alias("tk"),
        F.expr(f"size({sents})").alias("n_sents"),
        F.expr(f"size(array_distinct({sents}))").alias("distinct_sents"),
    )
    from danae_spark.functions.grams import ngram_expr

    grams = ngram_expr("tk", 2)  # zipped shifted slices: ~8× cheaper than
    # a per-element slice lambda, identical values (functions/grams.py)
    gstats = (
        # the two sentence counters ride through the explode (+8 bytes
        # per gram row) so the WHOLE operator is one corpus scan — the
        # alternative is re-reading the table for a second branch
        with_toks.select(
            "doc_id",
            "n_sents",
            "distinct_sents",
            F.explode_outer(F.expr(grams)).alias("gram"),
        )
        .groupBy("doc_id", "gram")
        .agg(
            F.count("*").alias("cnt"),
            F.first("n_sents").alias("n_sents"),
            F.first("distinct_sents").alias("distinct_sents"),
        )
        .groupBy("doc_id")
        .agg(
            # explode_outer keeps gram-less docs as one NULL-gram row so
            # they survive to the output; count only real grams
            F.sum(F.when(F.col("gram").isNotNull(), F.col("cnt"))).alias("n_2grams_l"),
            F.count(F.when(F.col("gram").isNotNull(), True)).alias("distinct_2grams"),
            F.max(F.when(F.col("gram").isNotNull(), F.col("cnt"))).alias(
                "top_2gram_cnt"
            ),
            F.first("n_sents").alias("n_sents"),
            F.first("distinct_sents").alias("distinct_sents"),
        )
    )
    frac = lambda num, den: F.when(den > 0, rnd(num / den, 6)).otherwise(F.lit(0.0))  # noqa: E731
    out = (
        gstats
        .select(
            "doc_id",
            # int64 like the oracle (and a 100 TB corpus) needs —
            # match types exactly so the driver's Arrow hash agrees
            F.coalesce(F.col("n_2grams_l"), F.lit(0)).cast("long").alias("n_2grams"),
            frac(
                F.coalesce(F.col("n_2grams_l"), F.lit(0)) - F.col("distinct_2grams"),
                F.coalesce(F.col("n_2grams_l"), F.lit(0)),
            ).alias("dup_2gram_frac"),
            frac(
                F.coalesce(F.col("top_2gram_cnt"), F.lit(0)),
                F.coalesce(F.col("n_2grams_l"), F.lit(0)),
            ).alias("top_2gram_frac"),
            frac(F.col("n_sents") - F.col("distinct_sents"), F.col("n_sents")).alias(
                "dup_sent_frac"
            ),
        )
        .withColumn(
            "keep",
            (
                (F.col("dup_2gram_frac") <= DUP_2GRAM_MAX)
                & (F.col("top_2gram_frac") <= TOP_2GRAM_MAX)
            ).cast("int"),
        )
        .orderBy("doc_id")
    )
    return out


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents-table entry point of `text_repetition_frame`."""
    return text_repetition_frame(load_table(spark, sf_dir, "documents"))


def text_repetition_oracle(order_by: bool = True, source: str = "documents") -> str:
    """`order_by=False` returns the unordered core for composition (see
    text_stats_oracle); `source` renames the input relation."""
    toks = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    sents = "list_filter(list_transform(string_split_regex(text, '[.!?]+'), s -> trim(s)), s -> s <> '')"
    return f"""
    WITH d AS (
      SELECT doc_id, {toks} AS lt, {sents} AS ls FROM {source}
    ),
    grams AS (
      SELECT doc_id, array_to_string(list_slice(lt, t.i, t.i + 1), ' ') AS gram
      FROM d, range(1, 8192) t(i)
      WHERE len(lt) >= 2 AND t.i <= len(lt) - 1
    ),
    gstats AS (
      SELECT doc_id, sum(cnt) AS n_2grams, count(*) AS distinct_2grams,
             max(cnt) AS top_2gram_cnt
      FROM (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY doc_id, gram)
      GROUP BY doc_id
    ),
    base AS (
      SELECT d.doc_id,
             CAST(coalesce(g.n_2grams, 0) AS BIGINT) AS n_2grams,
             coalesce(g.distinct_2grams, 0) AS distinct_2grams,
             coalesce(g.top_2gram_cnt, 0) AS top_2gram_cnt,
             len(ls) AS n_sents,
             len(list_distinct(ls)) AS distinct_sents
      FROM d LEFT JOIN gstats g USING (doc_id)
    )
    SELECT doc_id, n_2grams,
           CASE WHEN n_2grams > 0 THEN floor(((n_2grams - distinct_2grams) * 1.0 / n_2grams) * power(10, 6) + 0.5001) / power(10, 6) ELSE 0.0 END AS dup_2gram_frac,
           CASE WHEN n_2grams > 0 THEN floor((top_2gram_cnt * 1.0 / n_2grams) * power(10, 6) + 0.5001) / power(10, 6) ELSE 0.0 END AS top_2gram_frac,
           CASE WHEN n_sents > 0 THEN floor(((n_sents - distinct_sents) * 1.0 / n_sents) * power(10, 6) + 0.5001) / power(10, 6) ELSE 0.0 END AS dup_sent_frac,
           CAST(
             (CASE WHEN n_2grams > 0 THEN floor(((n_2grams - distinct_2grams) * 1.0 / n_2grams) * power(10, 6) + 0.5001) / power(10, 6) ELSE 0.0 END) <= {DUP_2GRAM_MAX}
             AND
             (CASE WHEN n_2grams > 0 THEN floor((top_2gram_cnt * 1.0 / n_2grams) * power(10, 6) + 0.5001) / power(10, 6) ELSE 0.0 END) <= {TOP_2GRAM_MAX}
             AS INT) AS keep
    FROM base {"ORDER BY doc_id" if order_by else ""}
    """


# ------------------------------------------------------- C11: doc fingerprint

GRAM_CHARS = 8
BOTTOM_K = 4


def doc_fingerprint_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Bottom-k sketch of rolling char-8-gram hashes over ANY (id, text)
    frame (winnowing-style fingerprint; two docs sharing fingerprint
    values share content regions). `hash_fn='md5'` (default) is the
    portable family the DuckDB oracle reproduces exactly;
    `hash_fn='xxhash64'` is the JVM-native throughput twin for 100 TB
    runs (identical plan shape, different hash values)."""
    docs = widen(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")))
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(text) - {GRAM_CHARS} + 1),"
                f" i -> substring(text, i, {GRAM_CHARS}))"
            )
        ).alias("gram"),
    ).filter(F.length("text") >= GRAM_CHARS)
    if hash_fn == "xxhash64":
        # sign-bit mask, not abs(): abs(Long.MIN_VALUE) overflows (throws
        # under ANSI mode, stays negative otherwise)
        h = F.xxhash64("gram").bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF))
    else:
        h = F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long")
    hashed = grams.select("doc_id", h.alias("h")).distinct()
    w = W.partitionBy("doc_id").orderBy("h")
    bottom = hashed.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= BOTTOM_K)
    return (
        bottom.groupBy("doc_id")
        .pivot("rk", list(range(1, BOTTOM_K + 1)))
        .agg(F.first("h"))
        .select(
            "doc_id",
            *[F.col(str(i)).alias(f"fp{i}") for i in range(1, BOTTOM_K + 1)],
        )
        .orderBy("doc_id")
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents-table entry point of `doc_fingerprint_frame`."""
    return doc_fingerprint_frame(load_table(spark, sf_dir, "documents"))


def doc_fingerprint_oracle() -> str:
    return f"""
    WITH grams AS (
      -- fixed-bound position table (docs cap out well under 4096 chars);
      -- duckdb's range() can't take lateral column bounds
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(substr(text, t.i::INT, {GRAM_CHARS})), 1, 8))::BIGINT AS h
      FROM documents, range(1, 4096) t(i)
      WHERE length(text) >= {GRAM_CHARS}
        AND t.i <= length(text) - {GRAM_CHARS} + 1
    ), ranked AS (
      SELECT doc_id, h, row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rk
      FROM grams
    )
    SELECT doc_id,
           max(CASE WHEN rk = 1 THEN h END) AS fp1,
           max(CASE WHEN rk = 2 THEN h END) AS fp2,
           max(CASE WHEN rk = 3 THEN h END) AS fp3,
           max(CASE WHEN rk = 4 THEN h END) AS fp4
    FROM ranked WHERE rk <= {BOTTOM_K}
    GROUP BY doc_id ORDER BY doc_id
    """


# ------------------------------- corpus-curation decision (fused filter)

MIN_QUALITY = 0.5


def quality_filter_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = MIN_QUALITY,
    check_pii: bool = True,
    order: bool = True,
    include_tokens: bool = False,
) -> DataFrame:
    """THE curation decision a pre-training pipeline actually executes:
    one keep/drop row per document combining the heuristic quality
    score (text_stats), the Gopher-style repetition filter and the PII
    scan. The quality score and PII count are BOTH row-wise, so they
    ride ONE projection of one scan (same formulas as the standalone
    operators — merging branches cannot change a value); only the
    repetition signal needs its own scan for the gram explode+agg, one
    doc_id join total."""
    from danae_spark.operators.pii import PII_PATTERNS

    docs = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    if check_pii:
        n_pii = sum(
            F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
            for _n, pat, _s in PII_PATTERNS
        )
        ts = text_stats_frame(
            docs,
            lang_col=None,
            _extra_cols=[(n_pii > 0).cast("int").alias("has_pii")],
        ).select("doc_id", "n_tokens", "quality_score", "has_pii")
    else:
        ts = text_stats_frame(docs, lang_col=None).select(
            "doc_id", "n_tokens", "quality_score"
        )
    rep = text_repetition_frame(docs).select(
        "doc_id", F.col("keep").alias("rep_keep")
    )
    out = ts.join(rep, "doc_id")
    if not check_pii:
        out = out.withColumn("has_pii", F.lit(0))
    keep = (
        (F.col("quality_score") >= min_quality)
        & (F.col("rep_keep") == 1)
        & (F.col("has_pii") == 0)
    )
    # include_tokens adds the n_tokens passthrough for composition
    # (corpus_report) without changing the registered entry's schema
    tok_cols = [F.col("n_tokens").cast("long").alias("n_tokens")] if include_tokens else []
    out = out.select(
        "doc_id", *tok_cols, "quality_score", "rep_keep", "has_pii",
        keep.cast("int").alias("keep"),
    )
    # order=False skips the global sort for composition (the consumers
    # re-shuffle on a join key anyway; a sort feeding a join is pure cost)
    return out.orderBy("doc_id") if order else out


def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents-table entry point of `quality_filter_frame`."""
    return quality_filter_frame(load_table(spark, sf_dir, "documents"))


def quality_filter_oracle(
    min_quality: float = MIN_QUALITY, source: str = "documents"
) -> str:
    from danae_spark.operators.pii import PII_PATTERNS

    ts = text_stats_oracle(order_by=False, source=source)
    tr = text_repetition_oracle(order_by=False, source=source)
    pii_total = " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))" for _n, pat, _s in PII_PATTERNS
    )
    return f"""
    WITH ts_q AS ({ts}),
    tr_q AS ({tr}),
    p_q AS (
      SELECT doc_id, CAST(({pii_total}) > 0 AS INT) AS has_pii FROM {source}
    )
    SELECT ts_q.doc_id, ts_q.quality_score, tr_q.keep AS rep_keep, p_q.has_pii,
           CAST(ts_q.quality_score >= {min_quality}
                AND tr_q.keep = 1 AND p_q.has_pii = 0 AS INT) AS keep
    FROM ts_q JOIN tr_q ON ts_q.doc_id = tr_q.doc_id
              JOIN p_q ON ts_q.doc_id = p_q.doc_id
    ORDER BY ts_q.doc_id
    """


# ------------------- corpus-internal unigram LM score (perplexity proxy)


def unigram_logprob_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document unigram cross-entropy against the corpus's own
    unigram distribution — the self-contained stand-in for the CCNet
    (Wenzek et al.) KenLM-perplexity quality signal: documents whose
    token mix is "typical" of the corpus score low, gibberish and
    boilerplate-stuffed outliers score high. No external model: p(t) =
    corpus_count(t) / total_tokens, score = −mean ln p(tᵢ) (nats).

    Plan: tokenize+explode (widened past the file layout), ONE corpus
    aggregation on the term for counts, broadcast-join the vocab back,
    per-doc mean — two shuffles total (term, doc), everything codegen.
    `broadcast_vocab=False` is the web-scale switch: a 100 TB corpus's
    vocabulary (hundreds of millions of terms) outgrows a broadcast —
    the term join then runs as a shuffle join on the same key the vocab
    aggregation already hashed on."""
    docs = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    toks = widen(docs).select(
        "doc_id",
        F.explode(
            F.expr("filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')")
        ).alias("term"),
    )
    vocab = toks.groupBy("term").agg(F.count("*").alias("ct"))
    total = vocab.agg(F.sum("ct").alias("tt"))
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    scored = (
        toks.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .select("doc_id", (-F.log(F.col("ct") / F.col("tt"))).alias("nll"))
    )
    from danae_spark.functions.rounding import davg

    # davg, not avg: double summation is partition-order-dependent and a
    # sum within error of the rounding boundary would flip the driver's
    # value hash (the r1 failure class) — the decimal-exact average is
    # order-independent on both engines
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            rnd(davg(F.col("nll")), 4).alias("unigram_nll"),
        )
        .orderBy("doc_id")
    )


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents-table entry point of `unigram_logprob_frame`."""
    return unigram_logprob_frame(load_table(spark, sf_dir, "documents"))


def unigram_logprob_oracle() -> str:
    from danae_spark.functions.rounding import davg_sql

    toks = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    return f"""
    WITH t AS (
      SELECT doc_id, unnest({toks}) AS term FROM documents
    ),
    v AS (SELECT term, count(*) AS ct FROM t GROUP BY term),
    tot AS (SELECT sum(ct) AS tt FROM v),
    s AS (
      SELECT t.doc_id, -ln(v.ct * 1.0 / tot.tt) AS nll
      FROM t JOIN v USING (term) CROSS JOIN tot
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           floor(({davg_sql("nll")}) * power(10, 4) + 0.5001) / power(10, 4) AS unigram_nll
    FROM s GROUP BY doc_id ORDER BY doc_id
    """


# --------------- CCNet-style perplexity bucketing (head / middle / tail)

PPL_BUCKETS = 3
PPL_BUCKET_NAMES = ("head", "middle", "tail")


def perplexity_buckets_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = "lang",
    n_buckets: int = PPL_BUCKETS,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """CCNet's (Wenzek et al. 2020) perplexity bucketing: rank documents
    by language-model surprise WITHIN each language and cut into equal
    head / middle / tail thirds — the head is "most like the reference
    corpus", the tail is the noise you drop or down-sample. The LM is the
    corpus-internal unigram model (`unigram_logprob_frame`) so the
    operator is fully self-contained.

    Plan: the unigram score's two shuffles, one doc_id join back for the
    language label, then ONE ntile window partitioned by language —
    per-language partitions at 100 TB hold doc-count rows (not token
    rows), and a language is the natural parallelism unit here exactly
    as in CCNet's per-language shards. Deterministic: the window orders
    by (nll, doc_id), a unique key, so bucket edges cannot flip."""
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    nll = unigram_logprob_frame(base, broadcast_vocab=broadcast_vocab)
    if lang_col is not None:
        labels = docs.select(
            F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")
        )
    else:
        labels = docs.select(F.col(id_col).alias("doc_id"), F.lit("all").alias("lang"))
    j = nll.join(labels, "doc_id")
    w = W.partitionBy("lang").orderBy(F.asc("unigram_nll"), F.asc("doc_id"))
    names = F.array(*[F.lit(n) for n in PPL_BUCKET_NAMES])
    bucket_no = F.ntile(n_buckets).over(w)
    name = (
        F.element_at(names, bucket_no)
        if n_buckets == len(PPL_BUCKET_NAMES)
        else F.concat(F.lit("b"), bucket_no.cast("string"))
    )
    return j.select(
        "doc_id",
        "lang",
        "n_tokens",
        "unigram_nll",
        bucket_no.cast("int").alias("bucket_no"),
        name.alias("bucket"),
    ).orderBy("doc_id")


def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents-table entry point of `perplexity_buckets_frame`."""
    return perplexity_buckets_frame(load_table(spark, sf_dir, "documents"))


def perplexity_buckets_oracle(n_buckets: int = PPL_BUCKETS) -> str:
    nll = unigram_logprob_oracle()
    # mirror the frame's naming fallback so a non-default bucket count
    # registered against this oracle can't silently produce NULL names
    if n_buckets == len(PPL_BUCKET_NAMES):
        names = ", ".join(f"'{n}'" for n in PPL_BUCKET_NAMES)
    else:
        names = ", ".join(f"'b{i + 1}'" for i in range(n_buckets))
    return f"""
    WITH nll_q AS ({nll}),
    j AS (
      SELECT n.doc_id, d.lang, n.n_tokens, n.unigram_nll,
             CAST(ntile({n_buckets}) OVER (
               PARTITION BY d.lang ORDER BY n.unigram_nll ASC, n.doc_id ASC
             ) AS INT) AS bucket_no
      FROM nll_q n JOIN documents d ON n.doc_id = d.doc_id
    )
    SELECT doc_id, lang, n_tokens, unigram_nll, bucket_no,
           ([{names}])[bucket_no] AS bucket
    FROM j ORDER BY doc_id
    """


# ------- pseudo-labeled Naive-Bayes quality classifier (GPT-3 style)


def nb_train_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    labels: DataFrame | None = None,
    _toks: DataFrame | None = None,
) -> DataFrame:
    """The TRAINING half of the Naive-Bayes quality classifier as a
    standalone (term, w) model frame — one aggregation over token×label
    counts, add-one smoothed:
      w(t) = ln((ct₁(t)+1)/(N₁+V)) − ln((ct₀(t)+1)/(N₀+V)).
    Feed it back to `nb_quality_classifier_frame` (which calls this) or
    ship it to the streaming scorer (streaming/curation.nb_score_stream)
    — train batch, score stream."""
    docs = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    if labels is None:
        labels = quality_filter_frame(docs).select("doc_id", "keep")
    else:
        labels = labels.select("doc_id", F.col("keep").cast("int").alias("keep"))
    toks = _toks if _toks is not None else widen(docs).select(
        "doc_id",
        F.explode(
            F.expr("filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')")
        ).alias("term"),
    )
    lt = toks.join(labels, "doc_id")
    per_term = lt.groupBy("term").agg(
        F.sum("keep").cast("long").alias("ct1"),
        F.sum(1 - F.col("keep")).cast("long").alias("ct0"),
    )
    totals = per_term.agg(
        F.sum("ct1").cast("long").alias("n1"),
        F.sum("ct0").cast("long").alias("n0"),
        F.count("*").cast("long").alias("v"),
    )
    return per_term.crossJoin(F.broadcast(totals)).select(
        "term",
        (
            F.log((F.col("ct1") + 1) / (F.col("n1") + F.col("v")))
            - F.log((F.col("ct0") + 1) / (F.col("n0") + F.col("v")))
        ).alias("w"),
    )


def nb_quality_classifier_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    labels: DataFrame | None = None,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """GPT-3/PaLM-style learned quality classifier, self-contained: train
    a Naive-Bayes unigram model on labeled seed documents and score
    EVERY document by its mean token log-odds of being high-quality.
    `labels` is any (doc_id, keep∈{0,1}) frame — by default the
    heuristic `quality_filter_frame` verdict acts as the pseudo-label
    seed (the bootstrap every production pipeline starts from: a cheap
    heuristic labels a seed, a learned model generalizes it).

    Model: add-one-smoothed class-conditional unigram likelihoods,
      w(t) = ln((ct₁(t)+1)/(N₁+V)) − ln((ct₀(t)+1)/(N₀+V)),
    doc score = mean over the doc's tokens of w(t); predict keep ⇔
    score ≥ 0. Training IS one aggregation: token×label counts in a
    single groupBy — no iterations, no driver-side model state; the
    "model" is a (term, weight) frame joined back to the tokens, so at
    100 TB both training and inference are two shuffles each on keys
    the data is already hashed by (term, doc_id). `broadcast_vocab`
    mirrors unigram_logprob_frame's web-scale switch.

    Everything is plain aggregates + IEEE ln on engine-identical
    doubles, so the whole classifier — training included — is
    value-checked by the DuckDB oracle."""
    docs = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    toks = widen(docs).select(
        "doc_id",
        F.explode(
            F.expr("filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')")
        ).alias("term"),
    )
    weights = nb_train_weights(docs, labels=labels, _toks=toks)
    if broadcast_vocab:
        weights = F.broadcast(weights)
    from danae_spark.functions.rounding import davg

    return (
        toks.join(weights, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            rnd(davg(F.col("w")), 4).alias("nb_logodds"),
        )
        .withColumn("pred_keep", (F.col("nb_logodds") >= 0).cast("int"))
        .orderBy("doc_id")
    )


def nb_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents-table entry point of `nb_quality_classifier_frame`
    (pseudo-labels = the heuristic quality_filter verdict)."""
    return nb_quality_classifier_frame(load_table(spark, sf_dir, "documents"))


def nb_quality_classifier_oracle() -> str:
    from danae_spark.functions.rounding import davg_sql

    toks = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    qf = quality_filter_oracle()
    return f"""
    WITH labels AS (
      SELECT doc_id, keep FROM ({qf})
    ),
    t AS (
      SELECT doc_id, unnest({toks}) AS term FROM documents
    ),
    per_term AS (
      SELECT t.term,
             CAST(sum(l.keep) AS BIGINT) AS ct1,
             CAST(sum(1 - l.keep) AS BIGINT) AS ct0
      FROM t JOIN labels l USING (doc_id) GROUP BY t.term
    ),
    tot AS (
      SELECT CAST(sum(ct1) AS BIGINT) AS n1, CAST(sum(ct0) AS BIGINT) AS n0,
             CAST(count(*) AS BIGINT) AS v
      FROM per_term
    ),
    wt AS (
      SELECT term,
             ln((ct1 + 1) * 1.0 / (n1 + v)) - ln((ct0 + 1) * 1.0 / (n0 + v)) AS w
      FROM per_term CROSS JOIN tot
    ),
    scored AS (
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             floor(({davg_sql("wt.w")}) * power(10, 4) + 0.5001) / power(10, 4)
               AS nb_logodds
      FROM t JOIN wt USING (term) GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens, nb_logodds,
           CAST(nb_logodds >= 0 AS INT) AS pred_keep
    FROM scored ORDER BY doc_id
    """


# ------------- hashed bag-of-words document embeddings (text → vector)

DOC_EMB_DIMS = 16


def doc_embedding_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dims: int = DOC_EMB_DIMS,
    as_array: bool = False,
) -> DataFrame:
    """Deterministic hashed bag-of-words document embedding: each DISTINCT
    term gets a dims-dim md5-derived pseudo-vector (the engine's
    portable stand-in convention, profiling/tfidf.py
    categorical_column_embeddings), and a document's vector is the mean
    over its token stream (tf-weighted by construction since tokens
    repeat). This is the text→vector bridge that lets a text-only corpus
    use the embedding operator family (semantic_dedup, ANN, quantize)
    with no external encoder — swap in a real encoder by joining any
    (term, vector) table instead, exactly like the GloVe plug point.

    Scale shape: the per-term vectors are computed ONCE on the distinct
    vocabulary (a term-keyed aggregate, not per token), joined back
    broadcast AGAINST (doc, term, count) rows — the token stream folds
    to its per-doc term counts first, so the join and the decimal mean
    touch ~2× fewer rows than raw tokens and the weighted decimal sum
    Σ ct·eᵢ is EXACTLY the per-token sum (ct·eᵢ has ≤ 6 decimal
    digits, converted losslessly — bit-identical to the per-token davg
    the oracle states). Two doc-keyed shuffles total, everything
    codegen.

    `as_array=True` returns (doc_id, n_tokens, embedding array<double>)
    for composition into the vector operators; the default scalar
    columns e0..e{dims-1} are the registered oracle layout."""
    from danae_spark.functions.rounding import dsum

    docs = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    toks = widen(docs).select(
        "doc_id",
        F.explode(
            F.expr("filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')")
        ).alias("term"),
    )
    tct = toks.groupBy("doc_id", "term").agg(F.count("*").alias("ct"))
    dim_cols = [
        (
            F.conv(
                F.substring(F.md5(F.concat(F.col("term"), F.lit(f"#d{i}"))), 1, 8),
                16,
                10,
            ).cast("long")
            % 2000
            / 1000.0
            - 1.0
        ).alias(f"e{i}")
        for i in range(dims)
    ]
    vocab = tct.select("term").distinct().select("term", *dim_cols)
    joined = tct.join(F.broadcast(vocab), "term")
    n_tokens = F.sum("ct")
    agg = joined.groupBy("doc_id").agg(
        n_tokens.cast("long").alias("n_tokens"),
        *[
            rnd(dsum(F.col("ct") * F.col(f"e{i}")) / F.sum("ct"), 6).alias(f"e{i}")
            for i in range(dims)
        ],
    )
    if as_array:
        # doubles, not float32: the rnd-6 dim values must survive exactly
        # so downstream cosines match the SQL oracle bit-for-bit
        arr = F.array(*[F.col(f"e{i}").cast("double") for i in range(dims)])
        return agg.select("doc_id", "n_tokens", arr.alias("embedding")).orderBy(
            "doc_id"
        )
    return agg.orderBy("doc_id")


def doc_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents-table entry point of `doc_embedding_frame`."""
    return doc_embedding_frame(load_table(spark, sf_dir, "documents"))


def doc_embedding_oracle(dims: int = DOC_EMB_DIMS) -> str:
    from danae_spark.functions.rounding import davg_sql

    toks = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    dim_defs = ", ".join(
        f"('0x' || substr(md5(term || '#d{i}'), 1, 8))::BIGINT % 2000"
        f" / 1000.0 - 1.0 AS e{i}"
        for i in range(dims)
    )
    dim_aggs = ", ".join(
        f"floor(({davg_sql(f'v.e{i}')}) * power(10, 6) + 0.5001) / power(10, 6)"
        f" AS e{i}"
        for i in range(dims)
    )
    return f"""
    WITH t AS (
      SELECT doc_id, unnest({toks}) AS term FROM documents
    ),
    vocab AS (
      SELECT term, {dim_defs} FROM (SELECT DISTINCT term FROM t)
    )
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens, {dim_aggs}
    FROM t JOIN vocab v USING (term)
    GROUP BY t.doc_id ORDER BY t.doc_id
    """


def semantic_dedup_text_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dims: int = DOC_EMB_DIMS,
    tau: float = 0.9,
    codebook=None,
) -> DataFrame:
    """SemDeDup for a TEXT-ONLY corpus: hashed bag-of-words doc
    embeddings (doc_embedding_frame) piped into the cluster-then-dedup
    verdicts (operators/dedup.py semantic_dedup_frame). τ defaults
    higher than the raw-embedding default because hashed-BoW cosine of
    unrelated docs concentrates well above random-vector cosine (shared
    stopword mass); 0.9 ≈ near-identical token distributions."""
    from danae_spark.operators.dedup import semantic_dedup_frame

    emb = doc_embedding_frame(
        docs, id_col=id_col, text_col=text_col, dims=dims, as_array=True
    )
    return semantic_dedup_frame(
        emb, id_col="doc_id", vec_col="embedding", tau=tau, codebook=codebook
    )


# ------------------------- corpus composition report (source × language)


def corpus_report_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
) -> DataFrame:
    """The corpus dashboard every data team looks at before training:
    per (source, language) stratum — document count, token total, mean
    heuristic quality, quality_filter keep rate, and the count of
    PII-bearing documents. Composes the per-doc signal operators (each
    already value-checked) with one final groupBy over doc-count rows,
    so the report itself adds a single tiny shuffle. The fused
    quality_filter (include_tokens passthrough) supplies every per-doc
    signal — two corpus scans total, not five."""
    from danae_spark.functions.rounding import davg

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.col(lang_col).alias("lang"),
        F.col(source_col).alias("source"),
    )
    qf = quality_filter_frame(base, order=False, include_tokens=True).select(
        "doc_id", "n_tokens", "quality_score", "keep", "has_pii"
    )
    per_doc = base.select("doc_id", "lang", "source").join(qf, "doc_id")
    return (
        per_doc.groupBy("source", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            rnd(davg(F.col("quality_score")), 4).alias("avg_quality"),
            rnd(F.sum("keep") / F.count("*"), 4).alias("keep_rate"),
            F.sum("has_pii").cast("long").alias("pii_docs"),
        )
        .orderBy("source", "lang")
    )


def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents-table entry point of `corpus_report_frame`."""
    return corpus_report_frame(load_table(spark, sf_dir, "documents"))


def corpus_report_oracle() -> str:
    from danae_spark.functions.rounding import davg_sql

    qf = quality_filter_oracle()
    ts = text_stats_oracle(order_by=False)
    return f"""
    WITH ts_all AS ({ts}),
    qf_all AS ({qf}),
    per_doc AS (
      SELECT d.source, d.lang, t.n_tokens, t.quality_score, q.keep, q.has_pii
      FROM documents d
      JOIN ts_all t ON d.doc_id = t.doc_id
      JOIN qf_all q ON d.doc_id = q.doc_id
    )
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           floor(({davg_sql("quality_score")}) * power(10, 4) + 0.5001)
             / power(10, 4) AS avg_quality,
           floor((sum(keep) * 1.0 / count(*)) * power(10, 4) + 0.5001)
             / power(10, 4) AS keep_rate,
           CAST(sum(has_pii) AS BIGINT) AS pii_docs
    FROM per_doc GROUP BY source, lang ORDER BY source, lang
    """


TEXT_ANN_QUERIES = 20
TEXT_ANN_K = 5


def text_ann_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = TEXT_ANN_K,
    n_queries: int = TEXT_ANN_QUERIES,
) -> DataFrame:
    """No-encoder text similarity search end to end: hashed BoW doc
    embeddings (doc_embedding_frame) + brute-force cosine top-k
    (operators/ann.cosine_topk; queries broadcast, corpus streamed).
    Brute force is the declared baseline exactly as in the embedding
    ANN family — the LSH/IVF variants apply unchanged to these vectors
    for the 100 TB path."""
    from danae_spark.operators.ann import cosine_topk

    docs = load_table(spark, sf_dir, "documents")
    # build the query-side embeddings from PRE-filtered docs: per-term
    # vectors are a pure function of the term (md5), so a vocab built
    # from the 20 query docs is identical where it matters and the
    # whole query branch prunes at the scan — filtering the full
    # embedding frame instead left its vocab subtree scanning the
    # entire corpus (r6 review finding)
    q = doc_embedding_frame(
        docs.filter(F.col("doc_id") < n_queries), as_array=True
    )
    emb = doc_embedding_frame(docs, as_array=True)
    return cosine_topk(
        q, emb, k=k,
        query_id="doc_id", query_vec="embedding",
        cand_id="doc_id", cand_vec="embedding",
    )


def text_ann_topk_oracle(
    k: int = TEXT_ANN_K,
    n_queries: int = TEXT_ANN_QUERIES,
    dims: int = DOC_EMB_DIMS,
) -> str:
    emb_core = doc_embedding_oracle(dims).rsplit(" ORDER BY ", 1)[0]
    dot = " + ".join(f"q.e{i} * c.e{i}" for i in range(dims))
    qn = " + ".join(f"q.e{i} * q.e{i}" for i in range(dims))
    cn = " + ".join(f"c.e{i} * c.e{i}" for i in range(dims))
    cos6 = f"floor((({dot}) / (sqrt({qn}) * sqrt({cn}))) * 1000000.0 + 0.5001) / 1000000.0"
    return f"""
    WITH emb AS ({emb_core})
    SELECT query_id, cand_id, cosine, rank FROM (
      SELECT q.doc_id AS query_id, c.doc_id AS cand_id,
             {cos6} AS cosine,
             row_number() OVER (PARTITION BY q.doc_id
                                ORDER BY {cos6} DESC, c.doc_id) AS rank
      FROM emb q JOIN emb c ON q.doc_id <> c.doc_id
      WHERE q.doc_id < {n_queries}
    ) WHERE rank <= {k}
    ORDER BY query_id, rank
    """


# ----------------------- frequent n-gram mining (boilerplate analysis)

FREQ_NGRAM_N = 3
FREQ_NGRAM_K = 50


def frequent_ngrams_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = FREQ_NGRAM_N,
    k: int = FREQ_NGRAM_K,
) -> DataFrame:
    """Corpus-wide frequent word n-grams with term and document
    frequencies — the ANALYSIS side of boilerplate removal: before
    cutting repeated lines/spans, a pipeline looks at WHAT repeats
    (license headers, navigation chrome, templated boilerplate) and how
    broadly. Top-k by total occurrences, tie-broken by gram text for
    determinism.

    One scan: tokenize once into a projected column, build the n-gram
    array referencing it (never re-inlining the tokenizer — the r6
    lesson), one explode + two-level aggregation; top-k is a single
    window over gram-count rows."""
    from danae_spark.functions.grams import ngram_expr

    docs = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    toks = "filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    grams = ngram_expr("tk", n)
    rows = (
        widen(docs)
        .select("doc_id", F.expr(toks).alias("tk"))
        .select("doc_id", F.explode(F.expr(grams)).alias("gram"))
    )
    per_doc = rows.groupBy("gram", "doc_id").agg(F.count("*").alias("ct"))
    stats = per_doc.groupBy("gram").agg(
        F.sum("ct").cast("long").alias("tf"),
        F.count("*").cast("long").alias("df"),
    )
    # top-k FIRST via distributed TakeOrdered (per-partition top-k then
    # merge — never a global single-task window over the full gram
    # table, which at 100 TB holds billions of rows); the dense rank is
    # then a window over k rows only
    topk = stats.orderBy(F.desc("tf"), F.asc("gram")).limit(k)
    w = W.orderBy(F.desc("tf"), F.asc("gram"))
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select("rank", "gram", "tf", "df")
        .orderBy("rank")
    )


def frequent_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents-table entry point of `frequent_ngrams_frame`."""
    return frequent_ngrams_frame(load_table(spark, sf_dir, "documents"))


def frequent_ngrams_oracle(n: int = FREQ_NGRAM_N, k: int = FREQ_NGRAM_K) -> str:
    toks = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    return f"""
    WITH tk AS (SELECT doc_id, {toks} AS ts FROM documents),
    g AS (
      SELECT doc_id,
             list_aggregate(ts[(i+1):(i+{n})], 'string_agg', ' ') AS gram
      FROM tk, LATERAL (
        SELECT unnest(range(len(ts) - {n} + 1)) AS i
      )
      WHERE len(ts) >= {n}
    ),
    stats AS (
      SELECT gram, CAST(count(*) AS BIGINT) AS tf,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM g GROUP BY gram
    )
    SELECT rank, gram, tf, df FROM (
      SELECT CAST(row_number() OVER (ORDER BY tf DESC, gram ASC) AS INT) AS rank, *
      FROM stats
    ) WHERE rank <= {k}
    ORDER BY rank
    """


# ------------- late-interaction text retrieval (ColBERT-style MaxSim)

MAXSIM_QUERIES = 10
MAXSIM_Q_TERMS = 8
MAXSIM_C_TERMS = 16
MAXSIM_K = 5


def maxsim_topk_frame(
    docs: DataFrame,
    query_ids,
    id_col: str = "doc_id",
    text_col: str = "text",
    q_terms: int = MAXSIM_Q_TERMS,
    c_terms: int = MAXSIM_C_TERMS,
    k: int = MAXSIM_K,
    dims: int = DOC_EMB_DIMS,
) -> DataFrame:
    """Late-interaction text retrieval (the ColBERT MaxSim scoring
    shape, Khattab & Zaharia 2020): instead of one pooled vector per
    document (text_ann_topk), each document keeps a BAG of term
    vectors, and score(q, c) = Σ over q's terms of the MAX cosine to
    any of c's terms — fine-grained term matching that single-vector
    pooling averages away.

    Spark-first bounds: per doc only the top `c_terms` distinct terms
    by tf (ties by term) represent it, and a query contributes its top
    `q_terms` — so the interaction join is |corpus terms kept| ×
    (|queries|·q_terms), with the query side BROADCAST (tiny by
    construction) and the candidate side linear in the corpus; two
    doc-keyed aggregations finish it. Term vectors are the engine's
    md5-derived pseudo-vectors (the doc_embedding convention — a real
    encoder plugs in as a (term, vector) table), so the WHOLE retrieval
    is DuckDB-value-checked.

    The dim columns are pure functions of the term, computed INLINE on
    BOTH sides (codegen, per-row) with no vocabulary relation at all.
    The query side is then self-contained and broadcasts directly — no
    more driver-side collect/recreate hop, which had existed only
    because nesting the old vocab broadcast inside qt's broadcast build
    deadlocked past spark.sql.broadcastTimeout. The candidate side pays
    a per-row md5 recompute instead of a vocab dedup join, and that is
    deliberate: the r7 scaling curves showed Catalyst flipping the
    dedup join to broadcast the CORPUS term relation (the unbounded
    broadcast the advisor flagged), and the joined side inheriting one
    AQE-coalesced partition that ran the whole q×c interaction
    single-core. Per-row codegen has neither failure mode and scales
    embarrassingly."""
    from danae_spark.functions.rounding import dsum

    docs = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    toks = widen(docs).select(
        "doc_id",
        F.explode(
            F.expr("filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')")
        ).alias("term"),
    )
    tct = toks.groupBy("doc_id", "term").agg(F.count("*").alias("ct"))
    wdoc = W.partitionBy("doc_id").orderBy(F.desc("ct"), F.asc("term"))
    ranked = tct.withColumn("rk", F.row_number().over(wdoc))

    def dim_cols(prefix: str):
        return [
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("term"), F.lit(f"#d{i}"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % 2000
                / 1000.0
                - 1.0
            ).alias(f"{prefix}{i}")
            for i in range(dims)
        ]

    def nrm(prefix: str) -> F.Column:
        return F.sqrt(
            sum(F.col(f"{prefix}{i}") * F.col(f"{prefix}{i}") for i in range(dims))
        )

    qt = (
        ranked.filter(F.col("doc_id").isin(list(query_ids)) & (F.col("rk") <= q_terms))
        .select(
            F.col("doc_id").alias("query_id"),
            F.col("term").alias("qterm"),
            F.col("term"),
            *dim_cols("q"),
        )
        .withColumn("qn", nrm("q"))
        .drop("term")
    )
    # The candidate side computes its dim columns INLINE too — no vocab
    # relation, no join. The r7 scaling curve killed the dedup-via-vocab
    # variants: with a tiny vocab Catalyst flips the join and broadcasts
    # the CORPUS term relation (unbounded — the exact hazard the vocab
    # refactor was meant to remove), and either way the streamed side
    # inherits ONE AQE-coalesced partition (the upstream shuffle is slim
    # before the 65 double columns fan out), so the whole q×c
    # interaction + aggregation ran single-core (sf1: 33 s → 6 s fixed).
    # The numbered repartition is load-bearing: it is exempt from AQE
    # coalescing, shuffles only the slim (doc_id, term) relation, and
    # gives the interaction stage its parallelism.
    ct_side = (
        ranked.filter(F.col("rk") <= c_terms)
        .select("doc_id", "term")
        .repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .select(F.col("doc_id").alias("cand_id"), "term", *dim_cols("e"))
        .withColumn("cn", nrm("e"))
        .drop("term")
    )
    dot = sum(F.col(f"q{i}") * F.col(f"e{i}") for i in range(dims))
    sims = (
        ct_side.join(F.broadcast(qt), F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            "qterm",
            rnd(dot / (F.col("qn") * F.col("cn")), 6).alias("sim"),
        )
        .groupBy("query_id", "cand_id", "qterm")
        .agg(F.max("sim").alias("maxsim"))
    )
    scored = sims.groupBy("query_id", "cand_id").agg(
        rnd(dsum(F.col("maxsim")), 6).alias("score")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "score", "rank")
        .orderBy("query_id", "rank")
    )


def maxsim_text_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents-table entry: the first MAXSIM_QUERIES doc_ids query the
    whole corpus."""
    return maxsim_topk_frame(
        load_table(spark, sf_dir, "documents"), list(range(MAXSIM_QUERIES))
    )


def maxsim_text_topk_oracle(
    q_terms: int = MAXSIM_Q_TERMS,
    c_terms: int = MAXSIM_C_TERMS,
    k: int = MAXSIM_K,
    dims: int = DOC_EMB_DIMS,
    n_queries: int = MAXSIM_QUERIES,
) -> str:
    from danae_spark.functions.rounding import dsum_sql

    toks = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    dim_defs = ", ".join(
        f"('0x' || substr(md5(term || '#d{i}'), 1, 8))::BIGINT % 2000"
        f" / 1000.0 - 1.0 AS e{i}"
        for i in range(dims)
    )
    nrm = "sqrt(" + " + ".join(f"e{i} * e{i}" for i in range(dims)) + ")"
    dot = " + ".join(f"q.e{i} * c.e{i}" for i in range(dims))
    return f"""
    WITH t AS (
      SELECT doc_id, unnest({toks}) AS term FROM documents
    ),
    tct AS (
      SELECT doc_id, term, count(*) AS ct FROM t GROUP BY doc_id, term
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY ct DESC, term) AS rk
      FROM tct
    ),
    vocab AS (
      SELECT term, {dim_defs}
      FROM (SELECT DISTINCT term FROM ranked)
    ),
    vocab_n AS (SELECT *, {nrm} AS nrm FROM vocab),
    qt AS (
      SELECT r.doc_id AS query_id, r.term AS qterm, v.*
      FROM ranked r JOIN vocab_n v USING (term)
      WHERE r.doc_id < {n_queries} AND r.rk <= {q_terms}
    ),
    cs AS (
      SELECT r.doc_id AS cand_id, v.*
      FROM ranked r JOIN vocab_n v USING (term)
      WHERE r.rk <= {c_terms}
    ),
    sims AS (
      SELECT q.query_id, c.cand_id, q.qterm,
             max(floor(({dot}) / (q.nrm * c.nrm) * 1000000.0 + 0.5001)
                 / 1000000.0) AS maxsim
      FROM cs c JOIN qt q ON q.query_id <> c.cand_id
      GROUP BY q.query_id, c.cand_id, q.qterm
    ),
    scored AS (
      SELECT query_id, cand_id,
             floor(({dsum_sql("maxsim")}) * 1000000.0 + 0.5001) / 1000000.0
               AS score
      FROM sims GROUP BY query_id, cand_id
    )
    SELECT query_id, cand_id, score, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, cand_id) AS INT)
                  AS rank
      FROM scored
    ) WHERE rank <= {k}
    ORDER BY query_id, rank
    """


# ------------------------------------------------------ Gopher rule set

# the published Gopher quality-filter thresholds (Rae et al. 2021,
# table A1), restated as row-wise column expressions — one scan, all
# codegen. Word-count bounds are parameterized down for the test lake
# (the paper's 50..100k assumes web pages, not 300-char fixtures).
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 100_000,
    mean_len_lo: float = 3.0,
    mean_len_hi: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stops: int = 2,
) -> DataFrame:
    """Per-document Gopher rule verdicts: every rule's measured value
    AND boolean, plus the conjunction `keep` — a pipeline debugging a
    filter wants to see WHICH rule fired, not just the verdict.
    All row-wise (split/filter/aggregate over the word and line
    arrays): one JVM projection of one scan, no shuffle, no Python
    (higher-order functions evaluate interpreted, outside whole-stage
    codegen, but never leave the JVM)."""
    words = F.expr(f"filter(split({text_col}, ' +'), t -> t <> '')")
    lines = F.expr(f"filter(split({text_col}, '\\n'), l -> l <> '')")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        words.alias("__w"),
        lines.alias("__l"),
    )
    n_words = F.size("__w")
    n_lines = F.size("__l")
    mean_len = rnd(
        F.expr("aggregate(__w, 0L, (a, w) -> a + length(w))") / n_words, 6
    )
    # words containing at least one ASCII letter
    alpha_ratio = rnd(
        F.size(F.expr("filter(__w, w -> w rlike '[A-Za-z]')")) / n_words, 6
    )
    # hash/ellipsis symbols per word
    sym = F.expr(
        "aggregate(__w, 0, (a, w) -> a + length(w) - length(replace(w, '#', '')))"
    ) + F.expr(
        "aggregate(__w, 0, (a, w) -> a + CAST((length(w) - "
        "length(replace(w, '...', ''))) / 3 AS INT))"
    )
    symbol_ratio = rnd(sym / n_words, 6)
    bullet_ratio = rnd(
        F.size(
            F.expr(
                "filter(__l, l -> l like '-%' or l like '*%' "
                "or startswith(l, chr(8226)))"
            )
        )
        / n_lines,
        6,
    )
    ellipsis_ratio = rnd(
        F.size(F.expr("filter(__l, l -> l like '%...')")) / n_lines, 6
    )
    n_stops = F.size(
        F.expr(
            "filter(__w, w -> array_contains("
            + "array("
            + ",".join(f"'{s}'" for s in GOPHER_STOPS)
            + "), lower(w)))"
        )
    )
    out = d.select(
        "doc_id",
        n_words.cast("int").alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha_ratio.alias("alpha_ratio"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
        n_stops.cast("int").alias("n_stop_words"),
    )
    rules = out.select(
        "*",
        ((F.col("n_words") >= min_words) & (F.col("n_words") <= max_words))
        .cast("int")
        .alias("ok_words"),
        (
            (F.col("mean_word_len") >= mean_len_lo)
            & (F.col("mean_word_len") <= mean_len_hi)
        )
        .cast("int")
        .alias("ok_mean_len"),
        (F.col("alpha_ratio") >= min_alpha_ratio).cast("int").alias("ok_alpha"),
        (F.col("symbol_ratio") <= max_symbol_ratio).cast("int").alias("ok_symbol"),
        (F.col("bullet_ratio") <= max_bullet_ratio).cast("int").alias("ok_bullet"),
        (F.col("ellipsis_ratio") <= max_ellipsis_ratio)
        .cast("int")
        .alias("ok_ellipsis"),
        (F.col("n_stop_words") >= min_stops).cast("int").alias("ok_stops"),
    )
    keep = (
        (F.col("ok_words") == 1)
        & (F.col("ok_mean_len") == 1)
        & (F.col("ok_alpha") == 1)
        & (F.col("ok_symbol") == 1)
        & (F.col("ok_bullet") == 1)
        & (F.col("ok_ellipsis") == 1)
        & (F.col("ok_stops") == 1)
    )
    return rules.withColumn("keep", keep.cast("int"))


def gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents-table entry: the Gopher rule verdicts per doc."""
    docs = load_table(spark, sf_dir, "documents")
    return gopher_rules_frame(docs).orderBy("doc_id")


GOPHER_QUALITY_ORACLE = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, ' +'), t -> t <> '') AS w,
         list_filter(string_split(text, chr(10)), l -> l <> '') AS l
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(w) AS INT) AS n_words,
         floor((CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
               / len(w)) * 1000000.0 + 0.5001) / 1000000.0 AS mean_word_len,
         floor((CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
               AS DOUBLE) / len(w)) * 1000000.0 + 0.5001) / 1000000.0 AS alpha_ratio,
         floor((CAST(list_sum(list_transform(w, x ->
                 length(x) - length(replace(x, '#', ''))))
               + list_sum(list_transform(w, x -> CAST((length(x)
                 - length(replace(x, '...', ''))) / 3 AS INT)))
               AS DOUBLE) / len(w)) * 1000000.0 + 0.5001) / 1000000.0 AS symbol_ratio,
         floor((CAST(len(list_filter(l, x -> x LIKE '-%' OR x LIKE '*%'
                 OR x LIKE chr(8226) || '%')) AS DOUBLE) / len(l))
           * 1000000.0 + 0.5001) / 1000000.0 AS bullet_ratio,
         floor((CAST(len(list_filter(l, x -> x LIKE '%...')) AS DOUBLE)
               / len(l)) * 1000000.0 + 0.5001) / 1000000.0 AS ellipsis_ratio,
         CAST(len(list_filter(w, x -> list_contains(
                 ['the','be','to','of','and','that','have','with'],
                 lower(x)))) AS INT) AS n_stop_words
  FROM d
),
r AS (
  SELECT *,
         CAST(n_words >= 20 AND n_words <= 100000 AS INT) AS ok_words,
         CAST(mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS INT)
           AS ok_mean_len,
         CAST(alpha_ratio >= 0.8 AS INT) AS ok_alpha,
         CAST(symbol_ratio <= 0.1 AS INT) AS ok_symbol,
         CAST(bullet_ratio <= 0.9 AS INT) AS ok_bullet,
         CAST(ellipsis_ratio <= 0.3 AS INT) AS ok_ellipsis,
         CAST(n_stop_words >= 2 AS INT) AS ok_stops
  FROM m
)
SELECT doc_id, n_words, mean_word_len, alpha_ratio, symbol_ratio,
       bullet_ratio, ellipsis_ratio, n_stop_words,
       ok_words, ok_mean_len, ok_alpha, ok_symbol, ok_bullet,
       ok_ellipsis, ok_stops,
       CAST(ok_words = 1 AND ok_mean_len = 1 AND ok_alpha = 1
            AND ok_symbol = 1 AND ok_bullet = 1 AND ok_ellipsis = 1
            AND ok_stops = 1 AS INT) AS keep
FROM r ORDER BY doc_id
"""
