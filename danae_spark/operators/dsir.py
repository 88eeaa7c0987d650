"""Data Selection with Importance Resampling (DSIR).

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling", NeurIPS): choose corpus documents whose hashed-n-gram
distribution resembles a TARGET corpus. Per document, the log
importance weight is

    log w(x) = Σ_grams  ln p_target[b(g)] − ln p_raw[b(g)]

where b(g) hashes each unigram/bigram into a fixed number of buckets
and the two bag-of-words models are add-one-smoothed bucket
frequencies fit on the target corpus and the raw corpus respectively.
Selection is Gumbel-top-k over log w + g_i — sampling without
replacement proportional to the softmax of the weights, which the
paper shows beats both hard top-k and random sampling.

Spark-first shape (100 TB): the model is AT MOST `n_buckets` rows —
that is the whole point of hashed features (the paper uses 10k buckets
for the Pile) — so it broadcasts no matter how large the corpus is.
Fitting it is one groupBy over the exploded grams of each side;
scoring is one broadcast join + one aggregation keyed doc_id. Nothing
iterates, nothing collects beyond the bucket table.

Everything — hashing, smoothing, ln ratios, the Gumbel perturbation —
is engine-portable arithmetic (md5-derived hashes and uniforms, exact
decimal summation for the per-doc Σλ), so the ENTIRE selection,
including which k documents come out, is value-checked by the DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from danae_spark.catalog import load_table, widen
from danae_spark.functions.rounding import dsum, dsum_sql, rnd, rnd_sql

DSIR_BUCKETS = 256
DSIR_K = 100
DSIR_SALT = "danae-dsir"

# uniforms come from an 8-hex-digit md5 prefix; +0.5 keeps u strictly
# inside (0, 1) so ln(-ln(u)) is always finite
_U_DENOM = float(16**8)


def _with_grams(docs: DataFrame) -> DataFrame:
    """Add a `grams` array column: lowercase word unigrams + bigrams
    (the paper's hashed n-gram feature set).

    Bigrams come from the shared zip_with builder
    (functions/grams.ngram_expr) — NOT `transform(sequence(...), i ->
    toks[i] ...)`: a non-literal subscript inside a HOF lambda
    re-inlines the captured tokenizer expression per element (the
    SURVEY §4 hazard; measured 12× slower at sf0.1)."""
    from danae_spark.functions.grams import ngram_expr

    return docs.withColumn(
        "toks", F.expr("filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')")
    ).withColumn("grams", F.expr(f"concat(toks, {ngram_expr('toks', 2)})"))


def _bucket(col, n_buckets: int = DSIR_BUCKETS) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % n_buckets


def _gram_bucket_frames(
    corpus: DataFrame, target: DataFrame, n_buckets: int
) -> tuple[DataFrame, DataFrame]:
    """The shared input frames (already column-normalized corpus/target):
    corpus per-(doc, bucket) gram counts — the gram stream is
    |corpus tokens|×2 rows, the counts at most |docs|×n_buckets, so this
    is the frame worth materializing — and the target bucket stream.
    ONE definition feeds both dsir_scores_frame and dsir_model, so the
    batch scorer and the shipped streaming model can never drift."""
    cg_counts = (
        _with_grams(widen(corpus, force=True))
        .select("doc_id", F.explode("grams").alias("gram"))
        .select("doc_id", _bucket(F.col("gram"), n_buckets).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    tg = _with_grams(target).select(F.explode("grams").alias("gram")).select(
        _bucket(F.col("gram"), n_buckets).alias("bucket")
    )
    return cg_counts, tg


def dsir_scores_frame(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    salt: str = DSIR_SALT,
) -> DataFrame:
    """Every corpus doc's DSIR importance score toward `target`:
    (doc_id, n_grams, logw, gumbel, score) at full precision — the
    frame `dsir_select_frame` cuts its top-k from, exposed so a
    consumer can apply its own budgeted cut, and so the streaming
    scorer (streaming/curation.dsir_score_stream) has an exact batch
    twin to match.

    Deterministic end to end: hashes and Gumbel uniforms are
    md5-derived, the per-doc Σλ accumulates in exact decimal (partition
    order can never flip the selection boundary), ties break by doc_id.
    """
    corpus = corpus.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    target = target.select(F.col(text_col).alias("text"))

    # localCheckpoint because BOTH the raw model fit and the scoring
    # join consume the counts (without it the scan+explode+md5 chain
    # runs twice; the first cut of this operator did exactly that and
    # was 10× slower than every sibling text operator at sf0.1)
    cg_counts, tg = _gram_bucket_frames(corpus, target, n_buckets)
    cg_counts = cg_counts.localCheckpoint()

    model = _fit_model(cg_counts, tg, n_buckets)

    # logw = Σ_b cnt_b · λ_b — the λ·cnt product is rounded to decimal
    # ONCE per (doc, bucket), mirrored exactly in the oracle
    scored = (
        cg_counts.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            dsum(F.col("lam") * F.col("cnt")).alias("logw"),
        )
    )
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("#", F.lit(salt), F.col("doc_id"))), 1, 8
                ),
                16,
                10,
            ).cast("double")
            + F.lit(0.5)
        )
        / F.lit(_U_DENOM)
    )
    return (
        corpus.select("doc_id")
        .join(scored, "doc_id", "left")
        .na.fill({"n_grams": 0, "logw": 0.0})
        .withColumn("gumbel", -F.log(-F.log(u)))
        .withColumn("score", F.col("logw") + F.col("gumbel"))
    )


def _fit_model(cg_counts: DataFrame, tg: DataFrame, n_buckets: int) -> DataFrame:
    """(bucket, lam) from corpus per-(doc,bucket) counts + target bucket
    stream — AT MOST n_buckets rows regardless of corpus size."""
    raw_ct = cg_counts.groupBy("bucket").agg(F.sum("cnt").cast("long").alias("cr"))
    tgt_ct = tg.groupBy("bucket").agg(F.count("*").cast("long").alias("ct"))
    # totals are 1-row aggregates: Nt/Nr are FULL gram counts per side
    # (not sums over the joined buckets — a target bucket absent from
    # the raw side still belongs in Nt)
    # explicit broadcast: both sides are 1-row aggregates, but without
    # the hint a session with auto-broadcast disabled plans a
    # CartesianProduct here
    totals = (
        tgt_ct.agg(F.sum("ct").alias("nt"))
        .crossJoin(F.broadcast(raw_ct.agg(F.sum("cr").alias("nr"))))
    )
    m = F.lit(float(n_buckets))
    # tgt_ct is ≤ n_buckets rows — always broadcastable; without the
    # hint Spark has no stats for the checkpointed aggregate and plans
    # a sort-merge join of two tiny tables
    return (
        raw_ct.join(F.broadcast(tgt_ct), "bucket", "left")
        .na.fill({"ct": 0})
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.col("ct") + 1) / (F.col("nt") + m))
                - F.log((F.col("cr") + 1) / (F.col("nr") + m))
            ).alias("lam"),
        )
    )


def dsir_model(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """The fitted (bucket, lam) importance model alone. Train it batch,
    ship it to the streaming scorer (the nb_score_stream pattern)."""
    corpus = corpus.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    target = target.select(F.col(text_col).alias("text"))
    cg_counts, tg = _gram_bucket_frames(corpus, target, n_buckets)
    return _fit_model(cg_counts, tg, n_buckets)


def dsir_select_frame(
    corpus: DataFrame,
    target: DataFrame,
    k: int = DSIR_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    salt: str = DSIR_SALT,
) -> DataFrame:
    """Select k corpus docs by importance resampling toward `target`
    (any frame with the same text column): Gumbel-top-k over
    `dsir_scores_frame`. Returns the selected rows (doc_id, n_grams,
    logw, score) ordered by doc_id."""
    all_scored = dsir_scores_frame(
        corpus, target, id_col=id_col, text_col=text_col,
        n_buckets=n_buckets, salt=salt,
    )
    return (
        all_scored.orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
        .select(
            "doc_id",
            "n_grams",
            rnd(F.col("logw"), 4).alias("logw"),
            rnd(F.col("score"), 4).alias("score"),
        )
        .orderBy("doc_id")
    )


def dsir_select(spark: SparkSession, sf_dir: str, k: int = DSIR_K) -> DataFrame:
    """Lake entry: resample the documents table toward its English
    subset (lang = 'en') — "make the mix look like the English docs",
    a realistic domain-matching target with no external data."""
    docs = load_table(spark, sf_dir, "documents")
    return dsir_select_frame(docs, docs.filter(F.col("lang") == "en"), k=k)


def dsir_select_oracle(
    k: int = DSIR_K, n_buckets: int = DSIR_BUCKETS, salt: str = DSIR_SALT
) -> str:
    grams = (
        "list_concat(toks, CASE WHEN len(toks) >= 2 THEN "
        "list_transform(generate_series(1, len(toks) - 1), "
        "i -> toks[i] || ' ' || toks[i+1]) ELSE CAST([] AS VARCHAR[]) END)"
    )
    bucket = f"(('0x' || substr(md5(gram), 1, 8))::BIGINT % {n_buckets})"
    u = (
        f"((('0x' || substr(md5('{salt}' || '#' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT"
        f" + 0.5) / {_U_DENOM})"
    )
    return f"""
    WITH tk AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    cgc AS (
      SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT doc_id, {bucket} AS bucket
            FROM (SELECT doc_id, unnest({grams}) AS gram FROM tk))
      GROUP BY doc_id, bucket
    ),
    tg AS (
      SELECT {bucket} AS bucket
      FROM (SELECT unnest({grams}) AS gram FROM tk WHERE lang = 'en')
    ),
    raw_ct AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS cr FROM cgc GROUP BY bucket),
    tgt_ct AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ct FROM tg GROUP BY bucket),
    tot AS (
      SELECT (SELECT sum(ct) FROM tgt_ct) AS nt,
             (SELECT sum(cr) FROM raw_ct) AS nr
    ),
    model AS (
      SELECT r.bucket,
             ln((coalesce(t.ct, 0) + 1) * 1.0 / (tot.nt + {float(n_buckets)}))
               - ln((r.cr + 1) * 1.0 / (tot.nr + {float(n_buckets)})) AS lam
      FROM raw_ct r LEFT JOIN tgt_ct t USING (bucket) CROSS JOIN tot
    ),
    scored AS (
      SELECT c.doc_id, CAST(sum(c.cnt) AS BIGINT) AS n_grams,
             {dsum_sql("m.lam * c.cnt")} AS logw
      FROM cgc c JOIN model m USING (bucket) GROUP BY c.doc_id
    ),
    perturbed AS (
      SELECT d.doc_id,
             coalesce(s.n_grams, 0) AS n_grams,
             coalesce(s.logw, 0.0) AS logw,
             coalesce(s.logw, 0.0) + (-ln(-ln({u}))) AS score
      FROM (SELECT doc_id FROM documents) d LEFT JOIN scored s USING (doc_id)
    ),
    topk AS (
      SELECT * FROM perturbed ORDER BY score DESC, doc_id LIMIT {k}
    )
    SELECT doc_id, n_grams,
           {rnd_sql("logw", 4)} AS logw,
           {rnd_sql("score", 4)} AS score
    FROM topk ORDER BY doc_id
    """
