"""Learned byte-pair-encoding tokenizer: train on a bounded sample,
apply distributed.

The engine's `token_count` reports a BPE-ISH regex estimate; this module
is the real thing a pipeline trains before tokenizing a corpus:

- `train_bpe(docs, ...)` — classic BPE merge learning (Sennrich et al.
  2016): start from characters, repeatedly merge the most frequent
  adjacent symbol pair. Full-corpus BPE re-aggregates pair counts per
  merge (thousands of scans — a non-starter at 100 TB); the scalable
  shape is the IVF-codebook pattern: ONE distributed aggregation builds
  the word-frequency table, a deterministic hash-capped sample of it is
  collected within a byte budget, and the merge loop runs driver-side
  over that bounded table (word-frequency BPE is exactly how the
  reference implementations train — the corpus only matters through its
  word counts).
- `bpe_tokenize_frame(docs, merges)` — apply the learned merges to ANY
  corpus distributed: the merge list ships in an Arrow `mapInPandas`
  closure (same budget class as the NB weights / IVF codebook), each
  word is merged greedily by learned rank, results are cached per
  distinct word within a batch.

Determinism: the sample is hash-residue selected (no RNG), ties in pair
frequency break lexicographically, so the same corpus always yields the
same vocabulary on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from danae_spark.catalog import load_table, widen

BPE_MERGES = 200
BPE_SAMPLE_BUDGET_BYTES = 100 * 1024 * 1024
END_OF_WORD = "</w>"


def _word_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # alias first, reference the alias (the repo convention — a caller
    # column named e.g. `content` must not leak into the expr)
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    return (
        widen(base)
        .select(
            F.explode(
                F.expr("filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("ct"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_budget_bytes: int = BPE_SAMPLE_BUDGET_BYTES,
) -> list:
    """Learn `n_merges` BPE merges from the corpus word-frequency table.

    Returns the ordered merge list [(left, right), ...] — rank is the
    list position, exactly the artifact a tokenizer file stores."""
    wc = _word_counts(docs, id_col, text_col).persist()
    try:
        n_words = wc.count()
        # ~avg word bytes + count; hash-cap the DISTINCT-WORD table to
        # budget — CEILING division, so the kept fraction never exceeds
        # the budget (floor let a 1.9x-cap vocab through whole)
        est_row_bytes = 24
        cap = max(1, sample_budget_bytes // est_row_bytes)
        sampled = wc
        if n_words > cap:
            m = -(-n_words // cap)
            sampled = wc.filter(F.pmod(F.xxhash64("word"), F.lit(m)) == 0)
        rows = sampled.collect()
    finally:
        wc.unpersist()

    vocab = {}
    for r in rows:
        symbols = tuple(r.word) + (END_OF_WORD,)
        vocab[symbols] = vocab.get(symbols, 0) + r.ct

    merges: list = []
    for _ in range(n_merges):
        pair_counts: dict = {}
        for symbols, ct in vocab.items():
            for i in range(len(symbols) - 1):
                p = (symbols[i], symbols[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + ct
        if not pair_counts:
            break
        # max count, ties broken lexicographically — deterministic
        best_pair, best_ct = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best_ct < 2:
            break
        merges.append(best_pair)
        merged_sym = best_pair[0] + best_pair[1]
        new_vocab = {}
        for symbols, ct in vocab.items():
            out = []
            i = 0
            while i < len(symbols):
                if (
                    i < len(symbols) - 1
                    and symbols[i] == best_pair[0]
                    and symbols[i + 1] == best_pair[1]
                ):
                    out.append(merged_sym)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + ct
        vocab = new_vocab
    return merges


def _apply_merges(word: str, ranks: dict) -> list:
    symbols = list(word) + [END_OF_WORD]
    while len(symbols) > 1:
        best_rank, best_i = None, None
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_tokenize_frame(
    docs: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply learned BPE merges to every document, distributed: returns
    (doc_id, n_words, n_bpe_tokens, tokens array<string>). The merge
    table ships in the Arrow closure; per-batch memoization means each
    distinct word in a batch is merged once."""
    import re

    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    tok = re.compile(r"[^a-z0-9]+")

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    id_type = dict(src.dtypes)["doc_id"]  # carry the caller's id type

    def tokenize_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            memo: dict = {}
            ids, n_words, n_toks, toks_out = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in tok.split((text or "").lower()) if w]
                toks: list = []
                for w in words:
                    got = memo.get(w)
                    if got is None:
                        got = _apply_merges(w, ranks)
                        memo[w] = got
                    toks.extend(got)
                ids.append(doc_id)
                n_words.append(len(words))
                n_toks.append(len(toks))
                toks_out.append(toks)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_words": n_words,
                    "n_bpe_tokens": n_toks,
                    "tokens": toks_out,
                }
            )

    # ship the package to workers: the Arrow closure references
    # module-level _apply_merges by module, and non-registry callers
    # (bpe_tokenize_stream, engine.bpe_tokenize) don't pass through the
    # registry wrapper that normally calls this
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(docs.sparkSession)
    # widen needs scan metadata / partition counts — neither exists for
    # a streaming frame (micro-batch parallelism is the source's job)
    if not src.isStreaming:
        src = widen(src)
    return src.mapInPandas(
        tokenize_batches,
        schema=f"doc_id {id_type}, n_words long, n_bpe_tokens long, "
        "tokens array<string>",
    )


def bpe_token_count(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> DataFrame:
    """Lake entry point: train on the documents table, tokenize it, and
    report per-doc learned-BPE token counts (ordered, no token arrays —
    the counts row a budgeting pipeline reads)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, n_merges=n_merges)
    return (
        bpe_tokenize_frame(docs, merges)
        .select("doc_id", "n_words", "n_bpe_tokens")
        .orderBy("doc_id")
    )
