"""Streaming corpus curation: the quality/PII keep-drop decision over a
document STREAM.

Incremental corpus ingest (a crawler landing parquet files
continuously) wants the curation verdict per micro-batch, not a nightly
batch job. Because the full repetition signal needs a per-doc
aggregation, the streaming path computes the two stateless signals
(quality score, PII) plus the dup-2gram/top-2gram fractions as pure
row-wise array expressions — every column is whole-stage-codegen, so
the stream stage has NO state store at all (stateless append): exactly
the operator shape Structured Streaming scales linearly.

Decision parity with the batch `quality_filter` is pytest-verified
(tests/test_streaming_curation.py) — the row-wise top-2gram computation
is the same value the batch explode+agg produces, just computed inside
the array expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from danae_spark.catalog import table_path
from danae_spark.operators.pii import PII_PATTERNS
from danae_spark.operators.textstats import (
    DUP_2GRAM_MAX,
    MIN_QUALITY,
    TOP_2GRAM_MAX,
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream pinned to the documents table (same pattern as
    events: the file source needs a directory + glob)."""
    schema = spark.read.parquet(table_path(sf_dir, "documents")).schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir.rstrip("/"))
    )


def _rowwise_2gram_fracs(grams_col: str = "gr"):
    """dup/top 2-gram fractions as pure array expressions (no explode,
    no shuffle) over a PRE-PROJECTED gram-array column: aggregate over
    the distinct grams of the doc's own 2-gram array — identical values
    to the batch explode+groupBy since both operate on the same per-doc
    gram multiset. Referencing a projected column matters: embedding the
    tokenizer expression textually re-runs it per lambda ELEMENT (the
    r6 batch-side 20× finding), a column reference binds once per row."""
    g = grams_col
    n2 = f"size({g})"
    nd = f"size(array_distinct({g}))"
    top = (
        f"CASE WHEN size({g}) > 0 THEN "
        f"array_max(transform(array_distinct({g}),"
        f" x -> size(filter({g}, y -> y = x)))) ELSE 0 END"
    )
    dup_frac = f"CASE WHEN ({n2}) > 0 THEN (({n2}) - ({nd})) / CAST(({n2}) AS DOUBLE) ELSE 0.0 END"
    top_frac = f"CASE WHEN ({n2}) > 0 THEN ({top}) / CAST(({n2}) AS DOUBLE) ELSE 0.0 END"
    return F.expr(dup_frac), F.expr(top_frac)


def curated_stream(
    docs_stream: DataFrame,
    min_quality: float = MIN_QUALITY,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: list | None = None,
    with_tokens: bool = False,
) -> DataFrame:
    """Per-document curation verdict as a STATELESS streaming projection:
    (doc_id, quality_score, dup_2gram_frac, top_2gram_frac, has_pii,
    keep). Append-mode, no watermark, no state store — scales with
    input rate only. `passthrough` carries extra source columns (e.g.
    lang/source for the streaming report); `with_tokens` adds
    n_tokens."""
    # tokenize + build grams ONCE into projected columns; every signal
    # references the columns (expression re-inlining is the r6 20× bug)
    from danae_spark.functions.grams import ngram_expr

    toks_expr = "filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    grams_expr = ngram_expr("tk", 2)  # zipped slices, identical values
    # (functions/grams.py) — keeps exact batch parity with
    # text_repetition_frame, which builds its grams the same way
    extra = list(passthrough or [])
    src = (
        docs_stream.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"), *extra
        )
        .withColumn("tk", F.expr(toks_expr))
        .withColumn("gr", F.expr(grams_expr))
    )
    # text_stats_frame ends with orderBy (and widen), which streams
    # reject — build the identical row-wise columns directly instead
    n_pii = sum(
        F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
        for _n, pat, _s in PII_PATTERNS
    )
    dup_frac, top_frac = _rowwise_2gram_fracs("gr")
    # quality score: same formula as text_stats_frame (row-wise)
    from danae_spark.operators.textstats import STOPWORDS

    en = ", ".join(f"'{t}'" for t in STOPWORDS["en"])
    n_tokens = F.expr("size(tk)")
    stop_hits = F.expr(f"size(filter(tk, t -> t in ({en})))")
    n_chars = F.length("text")
    punct = n_chars - F.length(F.regexp_replace("text", r"[.,;:!?]", ""))
    score = (
        F.least(n_tokens / 100.0, F.lit(1.0)) * 0.4
        + (1 - F.least(punct / n_chars * 10, F.lit(1.0))) * 0.3
        + F.least(stop_hits / n_tokens * 5, F.lit(1.0)) * 0.3
    )
    from danae_spark.functions.rounding import rnd

    out = src.select(
        "doc_id",
        *extra,
        *([n_tokens.cast("long").alias("n_tokens")] if with_tokens else []),
        rnd(score, 6).alias("quality_score"),
        rnd(dup_frac, 6).alias("dup_2gram_frac"),
        rnd(top_frac, 6).alias("top_2gram_frac"),
        (n_pii > 0).cast("int").alias("has_pii"),
    )
    keep = (
        (F.col("quality_score") >= min_quality)
        & (F.col("dup_2gram_frac") <= DUP_2GRAM_MAX)
        & (F.col("top_2gram_frac") <= TOP_2GRAM_MAX)
        & (F.col("has_pii") == 0)
    )
    return out.withColumn("keep", keep.cast("int"))


def curated_publish_sink(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    query_name: str = "curation_publish",
    keep_only: bool = True,
):
    """Replay-safe publish of the curated corpus: each micro-batch lands
    its rows (by default only `keep = 1` survivors) via dynamic partition
    overwrite of its own `batch_id=` partition — the profile_stream.py
    exactly-once pattern. foreachBatch is at-least-once on retry; because
    a replayed batch OVERWRITES its previous attempt's partition instead
    of appending, the published table is idempotent per batch id, so
    kill-and-replay yields byte-identical contents. Returns the
    writeStream handle (availableNow trigger set; call `.start()`)."""

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df.filter(F.col("keep") == 1) if keep_only else batch_df
        (
            out.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return (
        stream_df.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .queryName(query_name)
    )


def run_curation_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain the curation stream (append mode — stateless) into an
    in-memory table and return it as a batch frame."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def nb_score_stream(
    docs_stream: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weight_budget_bytes: int = 100 * 1024 * 1024,
) -> DataFrame:
    """Stateless streaming inference with a batch-trained model: score
    each streamed document by its mean Naive-Bayes token log-odds (the
    model `nb_quality_classifier_frame` trains — pass its internal
    (term, w) weights frame, or any model reducible to per-token
    weights).

    The train-batch / score-stream split is how learned quality filters
    run in production: training needs the full-corpus aggregation, but
    scoring is embarrassingly per-document — so the stream stage is a
    single Arrow mapInPandas projection with the model dictionary
    shipped in the closure (bounded by `weight_budget_bytes`, the IVF
    codebook budget class; a vocabulary beyond it belongs in a
    stream-static join instead). Append mode, no state store.

    Tokenization matches the engine's split('[^a-z0-9]+') convention;
    unseen tokens score 0 (log-odds-neutral), mirroring how the batch
    scorer's vocab join drops them."""
    import re

    import numpy as np
    import pandas as pd

    rows = weights.collect()  # bounded: vocab x (term, float)
    approx = sum(len(r[0]) + 8 for r in rows)
    if approx > weight_budget_bytes:
        raise ValueError(
            f"nb_score_stream: collected weights ~{approx >> 20} MiB exceed "
            f"the {weight_budget_bytes >> 20} MiB closure budget; use a "
            "stream-static join for web-scale vocabularies"
        )
    wmap = {r[0]: float(r[1]) for r in rows}
    tok = re.compile(r"[^a-z0-9]+")

    src = docs_stream.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, scores, nt = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [t for t in tok.split((text or "").lower()) if t]
                ws = [wmap[t] for t in toks if t in wmap]
                if not ws:
                    # the batch scorer's vocab join drops docs with zero
                    # in-vocabulary tokens (no output row) — mirror it
                    # instead of inventing a neutral keep verdict
                    continue
                ids.append(doc_id)
                nt.append(len(ws))
                scores.append(float(np.mean(ws)))
            if not ids:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "n_tokens": np.asarray(nt, dtype=np.int64),
                    "nb_logodds": np.asarray(scores, dtype=np.float64),
                }
            )

    out = src.mapInPandas(
        score_batches, schema="doc_id long, n_tokens long, nb_logodds double"
    )
    return out.withColumn("pred_keep", (F.col("nb_logodds") >= 0).cast("int"))


def dsir_score_stream(
    docs_stream: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Stateless streaming DSIR scoring with a batch-trained importance
    model (operators/dsir.dsir_model — a (bucket, lam) frame of at most
    n_buckets rows, so the closure ship is always bounded): each
    streamed doc gets the same (n_grams, logw, gumbel, score) row the
    batch `dsir_scores_frame` computes — EXACT parity: the
    decimal-quantized Σ cnt·λ is mirrored per Spark's
    double→decimal(28,6) HALF_UP on the shortest-repr value, and the
    Gumbel/score columns are the SAME Spark expressions as the batch
    side (JVM ln — a Python math.log twin differs in the last ulp).

    The global top-k cut is inherently batch (it ranks the whole
    corpus); a streaming consumer thresholds on `score` or keeps a
    running top-k downstream. Append mode, no state store."""
    import hashlib
    import re
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    from danae_spark.operators.dsir import DSIR_BUCKETS, DSIR_SALT, _U_DENOM

    salt = DSIR_SALT if salt is None else salt
    lam = {int(r[0]): float(r[1]) for r in model.collect()}  # ≤ n_buckets rows
    # n_buckets must match the model's training value (review finding:
    # a hardcoded 256 silently mis-bucketed models trained with any
    # other width)
    n_buckets = DSIR_BUCKETS if n_buckets is None else n_buckets
    tok = re.compile(r"[^a-z0-9]+")
    q6 = Decimal("0.000001")

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets

    src = docs_stream.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [t for t in tok.split((text or "").lower()) if t]
                grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
                counts: dict[int, int] = {}
                for g in grams:
                    b = bucket(g)
                    counts[b] = counts.get(b, 0) + 1
                # Σ cnt·λ in exact decimal, quantized per (bucket) term
                # exactly as Spark's cast(double as decimal(28,6)):
                # HALF_UP on the shortest decimal repr of the product.
                # n_grams counts only model-bucket grams — the batch
                # scorer's inner join on bucket does exactly that (a
                # bucket unseen in the training corpus contributes
                # neither weight nor count)
                acc = Decimal(0)
                n_grams = 0
                for b, cnt in counts.items():
                    if b in lam:
                        n_grams += cnt
                        acc += Decimal(repr(lam[b] * cnt)).quantize(
                            q6, ROUND_HALF_UP
                        )
                logw = float(acc)
                rows.append((int(doc_id), n_grams, logw))
            if rows:
                yield pd.DataFrame(rows, columns=["doc_id", "n_grams", "logw"])

    scored = src.mapInPandas(
        score_batches, schema="doc_id long, n_grams long, logw double"
    )
    # gumbel/score as Spark COLUMN expressions — byte-identical to the
    # batch side's (JVM ln on the same md5-derived uniform)
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws("#", F.lit(salt), F.col("doc_id"))), 1, 8),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(_U_DENOM)
    return scored.withColumn("gumbel", -F.log(-F.log(u))).withColumn(
        "score", F.col("logw") + F.col("gumbel")
    )


# ------------------- streaming corpus report (live composition state)


def corpus_report_sink(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    query_name: str = "corpus_report_stream",
):
    """Live corpus-composition dashboard over the document stream: each
    micro-batch lands its per-(source, lang) PARTIAL sums as a
    batch_id-partitioned parquet state table (dynamic partition
    overwrite — the exactly-once profile_stream pattern, so replays are
    idempotent). The sums are exactly mergeable: counts are integers,
    and quality accumulates as decimal(28,6) — so the folded report is
    bit-identical to the batch `corpus_report` no matter how the stream
    was micro-batched. Fold with `streamed_corpus_report`."""
    verdicts = curated_stream(
        docs_stream, passthrough=["lang", "source"], with_tokens=True
    )

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        partial = batch_df.groupBy("source", "lang").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(F.col("quality_score").cast("decimal(28,6)")).alias("q_sum"),
            F.sum("keep").cast("long").alias("keep_docs"),
            F.sum("has_pii").cast("long").alias("pii_docs"),
        )
        (
            partial.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )

    return (
        verdicts.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .queryName(query_name)
    )


def streamed_corpus_report(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold the landed per-batch partials into the live report — same
    shape and values as the batch `corpus_report` (decimal quality sums
    merge exactly; ratios are single IEEE divisions on identical
    inputs). State is stratum-count-sized; the fold never touches the
    corpus."""
    from danae_spark.functions.rounding import rnd

    state = spark.read.parquet(state_dir)
    merged = state.groupBy("source", "lang").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("total_tokens").cast("long").alias("total_tokens"),
        F.sum("q_sum").alias("q_sum"),
        F.sum("keep_docs").cast("long").alias("keep_docs"),
        F.sum("pii_docs").cast("long").alias("pii_docs"),
    )
    return merged.select(
        "source",
        "lang",
        "n_docs",
        "total_tokens",
        rnd(F.col("q_sum").cast("double") / F.col("n_docs"), 4).alias("avg_quality"),
        rnd(F.col("keep_docs") / F.col("n_docs"), 4).alias("keep_rate"),
        "pii_docs",
    ).orderBy("source", "lang")


def bpe_tokenize_stream(
    docs_stream: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a batch-trained BPE merge list to the document STREAM —
    the tokenize step of a streaming ingest pipeline, stateless like
    the NB scorer: `operators/bpe.bpe_tokenize_frame` already works on
    any frame including a streaming one (its Arrow closure carries the
    bounded merge table), so this is a thin, intention-revealing alias
    that also asserts the stream contract."""
    from danae_spark.operators.bpe import bpe_tokenize_frame

    out = bpe_tokenize_frame(docs_stream, merges, id_col=id_col, text_col=text_col)
    if not out.isStreaming:
        raise TypeError("bpe_tokenize_stream expects a streaming input")
    return out


def ann_candidates_stream(
    query_stream: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries_are_corpus_rows: bool = False,
    persist_corpus: bool = True,
) -> DataFrame:
    """Streaming retrieval primitive: LSH-bucketed candidate generation
    for a STREAM of query vectors against a static embedding corpus —
    the stateless half of online ANN serving. The shared batch/stream
    pipeline (`ann.lsh_candidate_pairs` — the exact code path
    `ann_lsh_bucketed` ranks) buckets each streamed query with the
    fixed-seed hyperplanes (dimension probed from the corpus) and a
    STREAM-STATIC equi-join on the bucket id yields scored candidate
    pairs (query_id, cand_id, cosine). Per-query top-k is a stateful
    aggregation a streaming sink cannot do in append mode without a
    watermark — by design the consumer ranks candidates (bucket-
    bounded, ~N/2^planes each), exactly how online retrieval tiers
    split candidate generation from ranking.

    `queries_are_corpus_rows=True` drops id-equal self-pairs — ONLY
    correct when the stream replays actual corpus rows; an external
    query stream's ids share no space with the corpus, so the default
    keeps every candidate (an id collision is not a self-pair).
    `persist_corpus` caches the bucketed static side so a long-running
    stream doesn't re-scan and re-bucket the corpus per micro-batch."""
    from danae_spark.operators.ann import _hyperplanes, lsh_candidate_pairs
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(corpus.sparkSession)
    q = query_stream.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb")
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_emb"))
    dim_row = (
        corpus.select(F.size(F.col(vec_col)).alias("d")).filter("d > 0").head(1)
    )
    if not dim_row:
        raise ValueError(
            "ann_candidates_stream: corpus has no non-empty embedding to "
            "probe the vector dimension from"
        )
    planes = _hyperplanes(dim=dim_row[0].d)
    if persist_corpus:
        c = c.persist()
    out = lsh_candidate_pairs(q, c, planes, drop_self=queries_are_corpus_rows)
    if not out.isStreaming:
        raise TypeError("ann_candidates_stream expects a streaming query side")
    return out
