"""Term frequency / TF-IDF extraction.

Reference parity: `ingest/profiling/filters.py:137 fetch_top_k` pulls
per-column term vectors from Elasticsearch and keeps the top-k terms by
raw term frequency (tf=True) or by `(term_freq / ttf) * ln(N / doc_freq)`
(tf=False), where ttf is the corpus-wide total frequency of the term and
N the number of documents. `profiler.py:122` builds the per-column text
by concatenating all values of a categorical column.

Spark-first redesign: tokenization is `explode(split(...))` (JVM-side,
codegen), term stats are two groupBy aggregates (doc-level tf, corpus-level
ttf/df) joined back — the df/ttf side is tiny (vocabulary-sized) and
broadcast. N comes from a broadcast scalar, never a driver round-trip.
Skew note (100 TB): stop-word-grade terms concentrate in the corpus agg;
partial aggregation absorbs them map-side, and the final top-k per doc is
a bounded window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from danae_spark.catalog import load_table, widen
from danae_spark.functions.rounding import rnd

# categorical columns profiled for top-k terms (reference: profile['columns'])
CATEGORICAL_PROFILE_COLS = (
    ("customer", "c_mktsegment"),
    ("orders", "o_orderpriority"),
    ("part", "p_type"),
    ("events", "event_type"),
    ("documents", "lang"),
    ("documents", "source"),
)


def tokenize(df: DataFrame, text_col: str) -> DataFrame:
    """Lowercased whitespace/non-alpha tokenization → one row per token."""
    return (
        df.select(
            "*",
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )


def categorical_topk(
    spark: SparkSession,
    sf_dir: str,
    cols: tuple[tuple[str, str], ...] = CATEGORICAL_PROFILE_COLS,
    k: int = 10,
) -> DataFrame:
    """Top-k most frequent terms per categorical column (fetch_top_k tf=True)."""
    parts = []
    for t, c in cols:
        df = load_table(spark, sf_dir, t).select(F.col(c).alias("val"))
        toks = tokenize(df, "val").select(
            F.lit(t).alias("table_name"), F.lit(c).alias("column_name"), "term"
        )
        parts.append(toks)
    all_toks = parts[0]
    for p in parts[1:]:
        all_toks = all_toks.unionByName(p)
    counts = all_toks.groupBy("table_name", "column_name", "term").agg(
        F.count("*").alias("freq")
    )
    w = W.partitionBy("table_name", "column_name").orderBy(F.desc("freq"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("table_name", "column_name", "rank")
    )


def categorical_topk_oracle(
    cols: tuple[tuple[str, str], ...] = CATEGORICAL_PROFILE_COLS, k: int = 10
) -> str:
    branches = [
        f"""
    SELECT '{t}' AS table_name, '{c}' AS column_name, term
    FROM (SELECT unnest(string_split_regex(lower({c}), '[^a-z0-9]+')) AS term FROM {t})
    WHERE term <> ''"""
        for t, c in cols
    ]
    union = " UNION ALL ".join(branches)
    return f"""
    WITH toks AS ({union}),
    counts AS (
      SELECT table_name, column_name, term, count(*) AS freq
      FROM toks GROUP BY table_name, column_name, term
    )
    SELECT table_name, column_name, term, freq, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY table_name, column_name
                                   ORDER BY freq DESC, term) AS rank
      FROM counts
    ) WHERE rank <= {k}
    ORDER BY table_name, column_name, rank
    """


def categorical_topk_tfidf(
    spark: SparkSession,
    sf_dir: str,
    cols: tuple[tuple[str, str], ...] = CATEGORICAL_PROFILE_COLS,
    k: int = 10,
    rounding: int = 6,
) -> DataFrame:
    """Top-k terms per categorical column by tf-idf (fetch_top_k tf=False:
    `(term_freq / ttf) * ln(N / doc_freq)` where each COLUMN is a
    document and the lake's profiled columns are the corpus)."""
    parts = []
    for t, c in cols:
        df = load_table(spark, sf_dir, t).select(F.col(c).alias("val"))
        toks = tokenize(df, "val").select(
            F.concat_ws(".", F.lit(t), F.lit(c)).alias("col_id"), "term"
        )
        parts.append(toks)
    all_toks = parts[0]
    for p in parts[1:]:
        all_toks = all_toks.unionByName(p)
    tf = all_toks.groupBy("col_id", "term").agg(F.count("*").alias("tf"))
    corpus = tf.groupBy("term").agg(F.sum("tf").alias("ttf"), F.count("*").alias("df"))
    n_cols = F.lit(len(cols))
    scored = tf.join(F.broadcast(corpus), "term").withColumn(
        "tfidf",
        rnd((F.col("tf") / F.col("ttf")) * F.log(n_cols / F.col("df")), rounding),
    )
    w = W.partitionBy("col_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("col_id", "term", "tf", "tfidf", "rank")
        .orderBy("col_id", "rank")
    )


def categorical_topk_tfidf_oracle(
    cols: tuple[tuple[str, str], ...] = CATEGORICAL_PROFILE_COLS,
    k: int = 10,
    rounding: int = 6,
) -> str:
    branches = [
        f"""
    SELECT '{t}.{c}' AS col_id, term
    FROM (SELECT unnest(string_split_regex(lower({c}), '[^a-z0-9]+')) AS term FROM {t})
    WHERE term <> ''"""
        for t, c in cols
    ]
    union = " UNION ALL ".join(branches)
    return f"""
    WITH toks AS ({union}),
    tf AS (SELECT col_id, term, count(*) AS tf FROM toks GROUP BY col_id, term),
    corpus AS (SELECT term, sum(tf) AS ttf, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT col_id, term, tf,
             floor(((tf * 1.0 / ttf) * ln({len(cols)} * 1.0 / df)) * power(10, {rounding})
                   + 0.5001) / power(10, {rounding}) AS tfidf
      FROM tf JOIN corpus USING (term)
    )
    SELECT col_id, term, tf, tfidf, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY col_id
                                   ORDER BY tfidf DESC, term) AS rank
      FROM scored
    ) WHERE rank <= {k}
    ORDER BY col_id, rank
    """


def categorical_topk_combined(
    spark: SparkSession,
    sf_dir: str,
    cols: tuple[tuple[str, str], ...] = CATEGORICAL_PROFILE_COLS,
    k: int = 10,
    rounding: int = 6,
) -> DataFrame:
    """Both fetch_top_k modes (filters.py:137 tf=True / :152 tf=False) in
    ONE aggregate pass: per categorical column the top-k terms by raw
    frequency AND by corpus tf-idf `(tf/ttf)·ln(N/df)`. A term outside
    one of the two top-k lists carries a NULL rank for that mode.

    Plan: one tokenize+count shuffle on (table, column, term); the
    vocabulary-sized corpus stats are broadcast back; both rankings are
    windows over the same partitioning — no second scan."""
    parts = []
    for t, c in cols:
        df = load_table(spark, sf_dir, t).select(F.col(c).alias("val"))
        toks = tokenize(df, "val").select(
            F.lit(t).alias("table_name"), F.lit(c).alias("column_name"), "term"
        )
        parts.append(toks)
    all_toks = parts[0]
    for p in parts[1:]:
        all_toks = all_toks.unionByName(p)
    counts = all_toks.groupBy("table_name", "column_name", "term").agg(
        F.count("*").alias("freq")
    )
    corpus = counts.groupBy("term").agg(
        F.sum("freq").alias("ttf"), F.count("*").alias("df")
    )
    scored = counts.join(F.broadcast(corpus), "term").withColumn(
        "tfidf",
        rnd((F.col("freq") / F.col("ttf")) * F.log(F.lit(len(cols)) / F.col("df")), rounding),
    )
    wp = W.partitionBy("table_name", "column_name")
    rf = F.row_number().over(wp.orderBy(F.desc("freq"), F.asc("term")))
    rt = F.row_number().over(wp.orderBy(F.desc("tfidf"), F.asc("term")))
    ranked = scored.withColumn("rf", rf).withColumn("rt", rt)
    return (
        ranked.filter((F.col("rf") <= k) | (F.col("rt") <= k))
        .select(
            "table_name",
            "column_name",
            "term",
            "freq",
            F.when(F.col("rf") <= k, F.col("rf")).alias("rank_freq"),
            "tfidf",
            F.when(F.col("rt") <= k, F.col("rt")).alias("rank_tfidf"),
        )
        .orderBy("table_name", "column_name", "term")
    )


def categorical_topk_combined_oracle(
    cols: tuple[tuple[str, str], ...] = CATEGORICAL_PROFILE_COLS,
    k: int = 10,
    rounding: int = 6,
) -> str:
    branches = [
        f"""
    SELECT '{t}' AS table_name, '{c}' AS column_name, term
    FROM (SELECT unnest(string_split_regex(lower({c}), '[^a-z0-9]+')) AS term FROM {t})
    WHERE term <> ''"""
        for t, c in cols
    ]
    union = " UNION ALL ".join(branches)
    return f"""
    WITH toks AS ({union}),
    counts AS (
      SELECT table_name, column_name, term, count(*) AS freq
      FROM toks GROUP BY table_name, column_name, term
    ),
    corpus AS (SELECT term, sum(freq) AS ttf, count(*) AS df FROM counts GROUP BY term),
    scored AS (
      SELECT counts.*,
             floor(((freq * 1.0 / ttf) * ln({len(cols)} * 1.0 / df)) * power(10, {rounding})
                   + 0.5001) / power(10, {rounding}) AS tfidf
      FROM counts JOIN corpus USING (term)
    ),
    ranked AS (
      SELECT *,
        row_number() OVER (PARTITION BY table_name, column_name
                           ORDER BY freq DESC, term) AS rf,
        row_number() OVER (PARTITION BY table_name, column_name
                           ORDER BY tfidf DESC, term) AS rt
      FROM scored
    )
    SELECT table_name, column_name, term, freq,
           CASE WHEN rf <= {k} THEN rf END AS rank_freq,
           tfidf,
           CASE WHEN rt <= {k} THEN rt END AS rank_tfidf
    FROM ranked
    WHERE rf <= {k} OR rt <= {k}
    ORDER BY table_name, column_name, term
    """


# ------------------------------------------- categorical column embeddings

EMB_DIMS = 8


def categorical_column_embeddings(
    spark: SparkSession,
    sf_dir: str,
    dims: int = EMB_DIMS,
    embeddings: DataFrame | None = None,
) -> DataFrame:
    """Mean word-vector per categorical column (word_aggregator.py:13
    transform_sentence: average embedding of the column's top-k terms).

    `embeddings` is the pluggable term→vector lookup table
    (`term string, vector array<double-ish>`, e.g. GloVe-50d loaded
    from its published text file): top-k terms inner-join the vocab
    (OOV terms are skipped, as the reference's KeyedVectors lookup
    does) and the column vector is the per-dimension mean. The vocab is
    bounded (≈400k rows for GloVe) so it broadcasts; `dims` must match
    the vector length.

    With `embeddings=None` (default — this container ships no embedding
    file), a `dims`-dim deterministic md5-derived vector stands in for
    the lookup (portable → oracle-checked); the Spark-side semantics
    (top-k terms → per-term vector join → mean) are identical. Feeds
    both the column_embedding query and the Categorical branch of the
    search index (content_search.py:33 catTree)."""
    from danae_spark.functions.rounding import rnd

    topk = categorical_topk(spark, sf_dir)
    if embeddings is not None:
        vecs = topk.join(F.broadcast(embeddings), "term")
        return (
            vecs.groupBy("table_name", "column_name")
            .agg(
                F.count("*").alias("n_terms"),
                *[
                    rnd(F.avg(F.col("vector")[i].cast("double")), 6).alias(f"e{i}")
                    for i in range(dims)
                ],
            )
            .orderBy("table_name", "column_name")
        )
    dim_cols = [
        (
            F.conv(F.substring(F.md5(F.concat(F.col("term"), F.lit(f"#d{i}"))), 1, 8), 16, 10)
            .cast("long")
            % 2000
            / 1000.0
            - 1.0
        ).alias(f"e{i}")
        for i in range(dims)
    ]
    with_vecs = topk.select("table_name", "column_name", "term", *dim_cols)
    return (
        with_vecs.groupBy("table_name", "column_name")
        .agg(
            F.count("*").alias("n_terms"),
            *[rnd(F.avg(f"e{i}"), 6).alias(f"e{i}") for i in range(dims)],
        )
        .orderBy("table_name", "column_name")
    )


def categorical_column_embeddings_oracle(dims: int = EMB_DIMS) -> str:
    topk_sql = categorical_topk_oracle().rsplit(" ORDER BY ", 1)[0].replace(
        "SELECT table_name, column_name, term, freq, rank FROM (",
        "SELECT table_name, column_name, term FROM (",
        1,
    )
    dim_exprs = ", ".join(
        f"floor((avg(('0x' || substr(md5(term || '#d{i}'), 1, 8))::BIGINT % 2000"
        f" / 1000.0 - 1.0)) * power(10, 6) + 0.5001) / power(10, 6) AS e{i}"
        for i in range(dims)
    )
    return f"""
    WITH topk AS ({topk_sql})
    SELECT table_name, column_name, count(*) AS n_terms, {dim_exprs}
    FROM topk GROUP BY table_name, column_name
    ORDER BY table_name, column_name
    """


def tfidf_topk(
    spark: SparkSession, sf_dir: str, k: int = 5, rounding: int = 6
) -> DataFrame:
    """Top-k terms per document by tf-idf over the `documents` corpus.

    Formula per filters.py:152: (term_freq / ttf) * ln(N / doc_freq).
    """
    docs = widen(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = tokenize(docs, "text").select("doc_id", "term")

    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    corpus = tf.groupBy("term").agg(
        F.sum("tf").alias("ttf"), F.count("*").alias("df")
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))

    scored = (
        tf.join(F.broadcast(corpus), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            rnd(
                (F.col("tf") / F.col("ttf")) * F.log(F.col("n_docs") / F.col("df")),
                rounding,
            ),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "tfidf", "rank")
        .orderBy("doc_id", "rank")
    )


def tfidf_topk_oracle(k: int = 5, rounding: int = 6) -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
      FROM documents
    ), toks_f AS (
      SELECT doc_id, term FROM toks WHERE term <> ''
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks_f GROUP BY doc_id, term
    ), corpus AS (
      SELECT term, sum(tf) AS ttf, count(*) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             floor(((tf.tf / ttf) * ln(n_docs / df)) * power(10, {rounding}) + 0.5001) / power(10, {rounding}) AS tfidf
      FROM tf JOIN corpus USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, tfidf, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rank
      FROM scored
    ) WHERE rank <= {k}
    ORDER BY doc_id, rank
    """
