"""Deterministic corpus sampling / data-mixing operators.

Training-data pipelines rarely take "all of source X": they MIX sources
to target token budgets (so a small high-quality source isn't drowned by
a large crawl). `token_budget_mix` selects, per source, the documents
with the smallest content hash until the source's token budget is
reached — the same content-hash priority order as
`deterministic_sample`, so the selection is reproducible across
runs/engines/cluster sizes and is stable under corpus growth (new docs
only displace selected docs they out-rank).

Plan shape: one shuffle on source; the priority window and the running
token sum reuse that partitioning; the final decision is a row-wise
comparison of the running sum against the broadcast budget map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from danae_spark.catalog import load_table

# testdata sources are src0..src19; budget a skewed mix over a subset so
# both selected-and-cut and excluded sources are exercised
DEFAULT_BUDGETS = {
    "src0": 400, "src1": 300, "src2": 200, "src3": 150, "src4": 100,
    "src5": 100, "src6": 50, "src7": 50,
}


def token_budget_mix_frame(
    docs: DataFrame,
    budgets: dict[str, int],
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Select docs per source until the source's token budget is hit,
    over ANY (id, source, text) frame.

    A doc is selected if the budget was not yet exhausted when its turn
    came (running token sum BEFORE the doc < budget) — so the budget can
    be overshot by at most one document, and the cut point is identical
    on any engine. Sources without a budget entry get 0 (excluded).
    Returns per-doc decisions; aggregate for the mix summary."""
    # alias first, then build the token expression against the alias —
    # interpolating the raw caller-supplied name into F.expr breaks on
    # names needing backticks (matches text_stats_frame's convention)
    docs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.col(text_col).alias("text"),
    ).withColumn("tokens", F.size(F.expr("filter(split(text, ' +'), t -> t <> '')")))
    w = W.partitionBy("source").orderBy(F.md5("text"), "doc_id")
    budget = F.coalesce(
        *[F.when(F.col("source") == s, F.lit(b)) for s, b in budgets.items()],
        F.lit(0),
    )
    running_before = F.coalesce(
        F.sum("tokens").over(w.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
    )
    return (
        docs.withColumn("tokens_before", running_before)
        .withColumn("selected", (F.col("tokens_before") < budget).cast("int"))
        .select("doc_id", "source", "tokens", "tokens_before", "selected")
        .orderBy("doc_id")
    )


def token_budget_mix(
    spark: SparkSession,
    sf_dir: str,
    budgets: dict[str, int] | None = None,
) -> DataFrame:
    """The documents-table entry point of `token_budget_mix_frame`."""
    budgets = dict(DEFAULT_BUDGETS if budgets is None else budgets)
    return token_budget_mix_frame(load_table(spark, sf_dir, "documents"), budgets)


def token_budget_mix_oracle(budgets: dict[str, int] | None = None) -> str:
    budgets = dict(DEFAULT_BUDGETS if budgets is None else budgets)
    budget_case = " ".join(f"WHEN source = '{s}' THEN {b}" for s, b in budgets.items())
    return f"""
    WITH d AS (
      SELECT doc_id, source, text,
             len(list_filter(string_split_regex(text, ' +'), t -> t <> '')) AS tokens
      FROM documents
    ),
    r AS (
      SELECT doc_id, source, tokens,
             coalesce(sum(tokens) OVER (PARTITION BY source ORDER BY md5(text), doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
      FROM d
    )
    SELECT doc_id, source, tokens, tokens_before,
           CAST(tokens_before < (CASE {budget_case} ELSE 0 END) AS INT) AS selected
    FROM r ORDER BY doc_id
    """


# ------------------------- deterministic train/val/test corpus splitting

DEFAULT_SPLITS = {"train": 0.9, "val": 0.05, "test": 0.05}


def deterministic_split_frame(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    salt: str = "danae-split",
    group_col: str | None = None,
) -> DataFrame:
    """Reproducible corpus splitting: every row assigned to a named
    split by its content-independent id hash — the same row lands in the
    same split on any engine, any cluster size, any run, and the
    assignment is stable under corpus growth (new ids don't move old
    rows). The standard alternative, `randomSplit`, is neither
    deterministic across executions nor engine-portable.

    `splits` maps name → fraction (must sum to ~1); boundaries are laid
    out on a md5-derived uniform in [0, 1) (portable — the DuckDB oracle
    reproduces assignments exactly). `salt` decorrelates independent
    splits of the same corpus.

    `group_col` is the LEAKAGE-SAFE mode: hash the group key (domain,
    source document, user …) instead of the row id, so every member of
    a group lands in the SAME split — row-level hashing puts near-
    identical rows of one origin on both sides of the train/test
    boundary, silently inflating eval scores. Fractions then apportion
    GROUPS, not rows (skewed group sizes skew row counts — by design)."""
    splits = dict(DEFAULT_SPLITS if splits is None else splits)
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions sum to {total}, expected 1")
    key = F.col(group_col if group_col is not None else id_col)
    # md5 prefix → uniform in [0, 1): 8 hex chars / 16^8
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws("#", F.lit(salt), key)), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**8))
    )
    assign = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = u < F.lit(acc)
        assign = F.when(cond, F.lit(name)) if assign is None else assign.when(cond, F.lit(name))
    assign = F.lit(names[-1]) if assign is None else assign.otherwise(F.lit(names[-1]))
    return df.withColumn("split", assign)


def deterministic_split(
    spark: SparkSession, sf_dir: str, splits: dict[str, float] | None = None
) -> DataFrame:
    """Documents-table entry: per-doc split assignment + a stable
    per-split summary row count (what a pipeline audits before
    training)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return (
        deterministic_split_frame(docs, "doc_id", splits)
        .select("doc_id", "split")
        .orderBy("doc_id")
    )


def deterministic_split_oracle(
    splits: dict[str, float] | None = None,
    salt: str = "danae-split",
    group_col: str | None = None,
) -> str:
    """`salt`/`group_col` must mirror deterministic_split_frame's —
    parameter-parallel so a caller registering a salted or grouped
    split can't silently mismatch."""
    splits = dict(DEFAULT_SPLITS if splits is None else splits)
    names = list(splits)
    key = group_col if group_col is not None else "doc_id"
    u = (
        f"('0x' || substr(md5('{salt}' || '#' || CAST({key} AS VARCHAR)), 1, 8))::BIGINT"
        f" * 1.0 / {float(16**8)}"
    )
    acc = 0.0
    cases = []
    for name in names[:-1]:
        acc += splits[name]
        cases.append(f"WHEN ({u}) < {acc} THEN '{name}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    return f"""
    SELECT doc_id, {case} AS split FROM documents ORDER BY doc_id
    """


# ------------------- overlapping token-window chunking (RAG / context prep)

CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16


def chunk_documents_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Split every document into fixed-size token windows with overlap —
    the retrieval/context-window prep step (RAG chunking, long-doc
    embedding prep): chunk i covers tokens [i·stride, i·stride+chunk)
    with stride = chunk_tokens − overlap, so consecutive chunks share
    `overlap` tokens and no token is dropped; the last chunk may be
    short. Zero-token docs produce no chunks.

    Unlike `pack_sequences_frame` (which places docs into a GLOBAL
    packed stream and needs a distributed prefix sum), chunking is
    per-document: one explode over a per-row sequence — embarrassingly
    parallel, no shuffle, linear in output size at any corpus scale.
    Tokenizer is the whitespace one shared with packing/span-rewrite."""
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError(f"overlap {overlap} must be < chunk_tokens {chunk_tokens}")
    # alias the caller's columns BEFORE building exprs against them —
    # interpolating a raw caller name into F.expr breaks on names
    # needing backticks (the token_budget_mix_frame convention)
    base = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .select(
            "doc_id",
            F.expr("filter(split(coalesce(text, ''), ' +'), t -> t <> '')").alias(
                "toks"
            ),
        )
        .withColumn("n_tokens", F.size("toks").cast("long"))
    )
    n_chunks = F.when(F.col("n_tokens") <= 0, F.lit(0)).otherwise(
        1 + F.ceil(F.greatest(F.col("n_tokens") - chunk_tokens, F.lit(0)) / stride)
    )
    return (
        base.withColumn("n_chunks", n_chunks.cast("long"))
        .withColumn(
            "chunk_id",
            F.explode(
                F.expr("CASE WHEN n_chunks > 0 THEN sequence(0, n_chunks - 1) "
                       "ELSE CAST(array() AS array<long>) END")
            ),
        )
        .withColumn("start_tok", (F.col("chunk_id") * stride).cast("long"))
        .select(
            "doc_id",
            "chunk_id",
            "start_tok",
            F.least(F.lit(chunk_tokens).cast("long"), F.col("n_tokens") - F.col("start_tok"))
            .alias("chunk_len"),
            F.array_join(
                F.slice(F.col("toks"), F.col("start_tok") + 1, F.lit(chunk_tokens)), " "
            ).alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_id")
    )


def chunk_documents(
    spark: SparkSession,
    sf_dir: str,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """The documents-table entry point of `chunk_documents_frame`."""
    return chunk_documents_frame(
        load_table(spark, sf_dir, "documents"),
        chunk_tokens=chunk_tokens,
        overlap=overlap,
    )


def chunk_documents_oracle(
    chunk_tokens: int = CHUNK_TOKENS, overlap: int = CHUNK_OVERLAP
) -> str:
    stride = chunk_tokens - overlap
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(coalesce(text, ''), ' +'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    n AS (
      SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE WHEN len(toks) <= 0 THEN 0
                  ELSE 1 + CAST(ceil(greatest(len(toks) - {chunk_tokens}, 0)
                                     * 1.0 / {stride}) AS BIGINT)
             END AS n_chunks
      FROM t
    ),
    c AS (
      SELECT doc_id, toks, n_tokens,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_id
      FROM n WHERE n_chunks > 0
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(chunk_id * {stride} AS BIGINT) AS start_tok,
           CAST(least({chunk_tokens}, n_tokens - chunk_id * {stride}) AS BIGINT)
             AS chunk_len,
           array_to_string(
             toks[(chunk_id * {stride} + 1):(chunk_id * {stride} + {chunk_tokens})],
             ' ') AS chunk_text
    FROM c ORDER BY doc_id, chunk_id
    """


# -------------- training-sequence packing (tokenization-prep chunking)

PACK_SEQ_LEN = 2048


def pack_sequences_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = PACK_SEQ_LEN,
) -> DataFrame:
    """GPT-style training-sequence packing plan: documents are
    concatenated in a deterministic order and the token stream is cut
    into fixed seq_len sequences; each document's row says exactly
    where it lands — (start_pos, end_pos) in the global stream, the
    first/last sequence ids it touches, and how many sequences it
    spans. This is the index a tokenizer/loader consumes to emit
    packed training examples with correct document boundaries.

    The global cumulative token count is a DISTRIBUTED two-phase prefix
    sum — NOT an unpartitioned window (which executes on one task):
    range-partition by the ordering key, partition-LOCAL running sums
    accumulated inside one Arrow pass (no second exchange — a
    window partitioned on the partition id would re-shuffle every row
    to no effect), then one bounded collect of per-partition totals
    (num-partitions rows) broadcast back as additive offsets. The
    local-sum frame is checkpointed before the totals collect so the
    offsets join sees the SAME partitioning/values (range boundaries
    are sampled; an uncached second evaluation could re-draw them).
    The same pattern scales to any monotone global numbering at 100 TB.

    Deterministic: ordering is by doc id (use a hash column upstream
    for shuffled packing); token counts are the whitespace tokenizer's
    (the span rewriter's measure); NULL text counts as zero tokens."""
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).select(
        "doc_id",
        F.size(
            F.expr("filter(split(coalesce(text, ''), ' +'), t -> t <> '')")
        ).cast("long").alias("n_tokens"),
    )
    part = base.repartitionByRange("doc_id").sortWithinPartitions("doc_id")

    def local_cumsum(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        acc = 0
        for pdf in batches:
            if not len(pdf):
                continue
            ends = pdf["n_tokens"].cumsum() + acc
            acc = int(ends.iloc[-1])
            pdf = pdf.assign(pid=pid, local_end=ends)
            yield pdf[["doc_id", "n_tokens", "pid", "local_end"]]

    id_type = dict(base.dtypes)["doc_id"]  # carry the caller's id type
    local = part.mapInPandas(
        local_cumsum,
        schema=f"doc_id {id_type}, n_tokens long, pid int, local_end long",
    ).localCheckpoint()
    # bounded collect: one row per partition
    totals = (
        local.groupBy("pid").agg(F.max("local_end").alias("ptotal")).collect()
    )
    offsets = {}
    acc = 0
    for r in sorted(totals, key=lambda r: r.pid):
        offsets[r.pid] = acc
        acc += r.ptotal
    off_df = F.broadcast(
        local.sparkSession.createDataFrame(
            sorted(offsets.items()), "pid int, offset long"
        )
    )
    g = local.join(off_df, "pid")
    end_pos = F.col("offset") + F.col("local_end")
    start_pos = end_pos - F.col("n_tokens")
    return (
        g.select(
            "doc_id",
            "n_tokens",
            start_pos.alias("start_pos"),
            end_pos.alias("end_pos"),
            F.floor(start_pos / seq_len).cast("long").alias("first_seq"),
            # a doc's last token is at end_pos - 1; empty docs stay in
            # their start sequence
            F.floor(
                F.greatest(end_pos - 1, start_pos) / seq_len
            ).cast("long").alias("last_seq"),
        )
        .withColumn(
            "n_seqs", (F.col("last_seq") - F.col("first_seq") + 1).cast("long")
        )
        .orderBy("doc_id")
    )


def pack_sequences(spark: SparkSession, sf_dir: str, seq_len: int = 256) -> DataFrame:
    """The documents-table entry point of `pack_sequences_frame`
    (seq_len 256 so lake docs actually straddle sequence boundaries)."""
    from danae_spark.catalog import load_table

    return pack_sequences_frame(
        load_table(spark, sf_dir, "documents"), seq_len=seq_len
    )


def pack_sequences_oracle(seq_len: int = 256) -> str:
    return f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, ' +'), x -> x <> ''))
                  AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS end_pos
      FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(end_pos - n_tokens AS BIGINT) AS start_pos,
           end_pos,
           CAST(floor((end_pos - n_tokens) / {seq_len}) AS BIGINT) AS first_seq,
           CAST(floor(greatest(end_pos - 1, end_pos - n_tokens) / {seq_len}) AS BIGINT)
             AS last_seq,
           CAST(floor(greatest(end_pos - 1, end_pos - n_tokens) / {seq_len})
                - floor((end_pos - n_tokens) / {seq_len}) + 1 AS BIGINT) AS n_seqs
    FROM c ORDER BY doc_id
    """


# ------------------- deterministic shuffle-shard training export

N_SHARDS = 8
SHARD_SALT = "danae-shards"
_CHECKSUM_MOD = 2_147_483_647  # per-doc summand < 2^31: sums never overflow


def shuffle_shards_frame(
    docs: DataFrame,
    n_shards: int = N_SHARDS,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = SHARD_SALT,
) -> DataFrame:
    """Per-doc shard assignment + within-shard shuffle order for a
    training-data export, over any (id, text) frame.

    Training runs want the corpus GLOBALLY shuffled (so a data-parallel
    reader never sees source- or time-clustered batches) and cut into
    fixed shards — but `orderBy(rand())` is neither reproducible nor
    resumable. Here both decisions derive from a salted md5 of the id:

      shard_id = H(salt#id) % n_shards       (uniform, so shards balance)
      seq      = rank of H'(salt~id) within the shard (the shuffle order)

    Same doc -> same shard and position on any engine, any cluster size,
    any run; changing `salt` is a fresh, decorrelated shuffle. Plan: one
    hash shuffle on shard_id; the seq window reuses that partitioning,
    and shards are hash-balanced at ~rows/n_shards each, so the per-
    shard sort is the SAME work the shard writer needs anyway."""
    out = _shard_assign(docs, n_shards, id_col, text_col, salt)
    w = W.partitionBy("shard_id").orderBy("pos_key")
    return out.withColumn("seq", F.row_number().over(w))


def _shard_assign(
    docs: DataFrame, n_shards: int, id_col: str, text_col: str, salt: str
) -> DataFrame:
    """Window-free shard assignment (shard_id / pos_key / tokens) — the
    manifest aggregates over this directly so its plan has no Window."""
    key = F.conv(
        F.substring(F.md5(F.concat_ws("#", F.lit(salt), F.col(id_col))), 1, 15),
        16,
        10,
    ).cast("bigint")
    # unique string (md5 # id) so ordering/min_by never ties
    pos = F.concat_ws(
        "#",
        F.md5(F.concat_ws("~", F.lit(salt), F.col(id_col))),
        F.col(id_col).cast("string"),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        (key % n_shards).alias("shard_id"),
        pos.alias("pos_key"),
        (key % _CHECKSUM_MOD).alias("key_sum"),
        F.size(F.expr(f"filter(split({text_col}, ' +'), t -> t <> '')")).alias(
            "tokens"
        ),
    )


def shard_manifest_frame(assigned: DataFrame) -> DataFrame:
    """Per-shard manifest over shuffle_shards_frame output: row/token
    counts, id range, the first doc in shuffle order, and an order-
    independent checksum of the member key hashes — what a reader
    verifies before training and a writer publishes next to the files.
    No window needed: pure map-side-combined aggregates."""
    return (
        assigned.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").cast("bigint").alias("n_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.min_by("doc_id", "pos_key").alias("first_doc"),
            F.sum("key_sum").cast("bigint").alias("checksum"),
        )
        .orderBy("shard_id")
    )


def write_shuffle_shards(
    docs: DataFrame,
    path: str,
    n_shards: int = N_SHARDS,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = SHARD_SALT,
    mode: str = "error",
) -> DataFrame:
    """Materialize the shuffled export: parquet under
    `path/shard_id=K/`, rows inside each shard in shuffle (seq) order,
    plus the manifest at `path/_shard_manifest` (underscore-prefixed, so
    readers of `path` skip it). One shuffle total: the seq window hash-
    partitions on shard_id, rows leave the window sorted by pos_key, and
    partitionBy('shard_id') splits each task's (single-shard) output
    into its directory preserving that order. Returns the manifest."""
    assigned = shuffle_shards_frame(docs, n_shards, id_col, text_col, salt)
    joined = assigned.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        "doc_id",
    )
    # re-sort within the (already shard-partitioned) tasks: the join may
    # have disturbed the window's row order
    (
        joined.repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "pos_key")
        .select("doc_id", "shard_id", "seq", "tokens", "text")
        .write.mode(mode)
        .partitionBy("shard_id")
        .parquet(path)
    )
    manifest = shard_manifest_frame(assigned)
    manifest.coalesce(1).write.mode(mode).parquet(path + "/_shard_manifest")
    return manifest


def shuffle_shards(
    spark: SparkSession, sf_dir: str, n_shards: int = N_SHARDS
) -> DataFrame:
    """Documents-table entry: the shard manifest of the deterministic
    shuffle export (shard sizes, token counts, shuffle-order head,
    member checksum). Window-free: the manifest is a single map-side-
    combined aggregate over the assignment expressions."""
    return shard_manifest_frame(
        _shard_assign(
            load_table(spark, sf_dir, "documents"),
            n_shards, "doc_id", "text", SHARD_SALT,
        )
    )


def shuffle_shards_oracle(n_shards: int = N_SHARDS, salt: str = SHARD_SALT) -> str:
    return f"""
    WITH d AS (
      SELECT doc_id,
             ('0x' || substr(md5('{salt}' || '#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               AS key_hash,
             md5('{salt}' || '~' || CAST(doc_id AS VARCHAR))
               || '#' || CAST(doc_id AS VARCHAR) AS pos_key,
             len(list_filter(string_split_regex(text, ' +'), t -> t <> '')) AS tokens
      FROM documents
    )
    SELECT key_hash % {n_shards} AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(tokens) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc,
           arg_min(doc_id, pos_key) AS first_doc,
           CAST(SUM(key_hash % {_CHECKSUM_MOD}) AS BIGINT) AS checksum
    FROM d GROUP BY shard_id ORDER BY shard_id
    """


def shard_manifest_state(assigned: DataFrame) -> DataFrame:
    """Manifest in its incremental STATE form: the public manifest
    columns plus first_pos_key — the piece a later merge needs to
    decide which side's head doc stays first in shuffle order."""
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").cast("bigint").alias("n_tokens"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.min_by("doc_id", "pos_key").alias("first_doc"),
        F.min("pos_key").alias("first_pos_key"),
        F.sum("key_sum").cast("bigint").alias("checksum"),
    )


def merge_shard_manifests(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two manifest-state frames (yesterday's corpus + today's
    batch): counts/tokens/checksums add, id ranges widen, the shuffle-
    order head is the pos-key argmin across both sides. Shards present
    on one side only pass through. All map-side-combinable aggregates —
    manifest maintenance costs O(shards), never a corpus re-scan, which
    is the operational point: the 100 TB export's bookkeeping is a few
    thousand rows."""
    both = state.unionByName(delta)
    return both.groupBy("shard_id").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.min("min_doc").alias("min_doc"),
        F.max("max_doc").alias("max_doc"),
        F.min_by("first_doc", "first_pos_key").alias("first_doc"),
        F.min("first_pos_key").alias("first_pos_key"),
        F.sum("checksum").cast("bigint").alias("checksum"),
    )


def shuffle_shards_incremental(
    spark: SparkSession, sf_dir: str, n_shards: int = N_SHARDS
) -> DataFrame:
    """Incremental export bookkeeping, certified by the strongest
    available invariant: yesterday's corpus (doc_id %3 < 2) is
    compacted to manifest state, today's batch (%3 == 2) produces its
    own delta, and the MERGE must equal the from-scratch full-corpus
    manifest EXACTLY — same oracle SQL as shuffle_shards, so checksum,
    head doc and token totals are all value-hashed. (Hash sharding is
    what makes the incremental shape trivial: assignment never depends
    on state, so only the O(shards) manifest needs merging.)"""
    docs = load_table(spark, sf_dir, "documents")
    a = _shard_assign(
        docs.filter(F.col("doc_id") % 3 < 2), n_shards, "doc_id", "text", SHARD_SALT
    )
    b = _shard_assign(
        docs.filter(F.col("doc_id") % 3 == 2), n_shards, "doc_id", "text", SHARD_SALT
    )
    merged = merge_shard_manifests(shard_manifest_state(a), shard_manifest_state(b))
    return merged.select(
        "shard_id",
        F.col("n_docs"),
        "n_tokens",
        "min_doc",
        "max_doc",
        "first_doc",
        "checksum",
    ).orderBy("shard_id")


# ------------------------------------------------- stratified sampling

# per-language budgets for the registered entry: en is capped below its
# count, mid-size languages select exactly n, and the default exercises
# the take-all leg for any stratum smaller than its budget
STRATA_BUDGETS = {"en": 60, "zh": 40}
STRATA_DEFAULT_N = 25
STRATA_SALT = "strata-v1"

# md5-prefix keys are 60-bit: [0, 2^60)
_HASH_MAX = 1 << 60


def stratified_sample_frame(
    docs: DataFrame,
    stratum_col: str = "lang",
    budgets: dict[str, int] | None = None,
    default_n: int = STRATA_DEFAULT_N,
    id_col: str = "doc_id",
    salt: str = STRATA_SALT,
    margin: int = 4,
) -> DataFrame:
    """EXACT per-stratum budgets with deterministic selection: within
    each stratum keep the `n_s` docs with the smallest salted md5 hash
    (ties impossible — the order key is (hash, id)). Reproducible
    across engines/cluster sizes/runs, and stable under corpus growth
    (a new doc only displaces the one doc it out-ranks).

    Scale design — the naive plan is a row_number window partitioned
    by stratum, which serializes each stratum through ONE task: a
    3-stratum 100 TB corpus would sort 100 TB on 3 reducers. Instead:

      1. one map-side-combined count per stratum (tiny aggregate);
      2. hash-prefix prefilter: keep rows with hash <= margin * n/N *
         MAX — because the filter is a PREFIX of the hash order, the
         survivors' ranks ARE the true stratum ranks; survivors are
         ~margin*n rows per stratum regardless of corpus size;
      3. a guard aggregate: any stratum whose survivor count fell
         below min(n, N) (Chernoff probability ~exp(-n), but never
         assumed) is rescued by unioning its full population back;
      4. the exact row_number window runs on the tiny survivor set.

    The two collects are metadata-sized (one row per stratum), like
    AQE statistics — never O(corpus)."""
    budgets = STRATA_BUDGETS if budgets is None else budgets
    s = F.col(stratum_col)
    n_expr = F.coalesce(
        *(
            [F.when(s == k, F.lit(v)) for k, v in sorted(budgets.items())]
            + [F.lit(default_n)]
        )
    ).cast("bigint")
    key = F.conv(
        F.substring(F.md5(F.concat_ws("#", F.lit(salt), F.col(id_col))), 1, 15),
        16,
        10,
    ).cast("bigint")
    hashed = docs.select(
        s.alias("stratum"),
        F.col(id_col).alias("doc_id"),
        key.alias("__h"),
        n_expr.alias("__n"),
    )

    counts = {
        r["stratum"]: r["cnt"]
        for r in hashed.groupBy("stratum").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    thresholds = {}
    for stratum, total in counts.items():
        n_s = budgets.get(stratum, default_n)
        if total <= n_s:
            thresholds[stratum] = _HASH_MAX
        else:
            thresholds[stratum] = min(_HASH_MAX, (_HASH_MAX // total) * n_s * margin)
    t_expr = F.coalesce(
        *(
            [
                F.when(F.col("stratum").eqNullSafe(k), F.lit(v))
                for k, v in sorted(thresholds.items(), key=lambda kv: str(kv[0]))
            ]
            + [F.lit(_HASH_MAX)]
        )
    )
    surv = hashed.filter(F.col("__h") <= t_expr)

    # guard: a stratum that lost part of its true top-n to the prefilter
    # (survivors < min(n, N)) is rescued with its full population
    surv_counts = {
        r["stratum"]: r["cnt"]
        for r in surv.groupBy("stratum").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    bad = [
        stratum
        for stratum, total in counts.items()
        if surv_counts.get(stratum, 0) < min(budgets.get(stratum, default_n), total)
    ]
    if bad:
        # null-safe membership: isin() never matches NULL, so a
        # prefilter-starved NULL stratum would silently skip rescue
        is_bad = F.lit(False)
        for stratum in bad:
            is_bad = is_bad | F.col("stratum").eqNullSafe(F.lit(stratum))
        surv = surv.filter(~is_bad).unionByName(hashed.filter(is_bad))

    w = W.partitionBy("stratum").orderBy("__h", "doc_id")
    return (
        surv.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.col("__n"))
        .select("stratum", "doc_id", F.col("rk").cast("int").alias("rk"))
    )


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents-table entry: exact per-language sample (en capped at
    60, zh at 40, every other language at 25; languages smaller than
    their budget are taken whole)."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample_frame(docs).orderBy("stratum", "rk")


def stratified_sample_oracle(
    budgets: dict[str, int] | None = None,
    default_n: int = STRATA_DEFAULT_N,
    salt: str = STRATA_SALT,
) -> str:
    budgets = STRATA_BUDGETS if budgets is None else budgets
    cases = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in sorted(budgets.items())
    )
    return f"""
    WITH d AS (
      SELECT lang AS stratum, doc_id,
             ('0x' || substr(md5('{salt}' || '#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h,
             CASE {cases} ELSE {default_n} END AS n_s
      FROM documents
    ),
    ranked AS (
      SELECT stratum, doc_id, n_s,
             row_number() OVER (PARTITION BY stratum ORDER BY h, doc_id) AS rk
      FROM d
    )
    SELECT stratum, doc_id, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= n_s
    ORDER BY stratum, rk
    """


# -------------------------------------------------- weighted sampling

WEIGHTED_SALT = "wsample-v1"
WEIGHTED_N = 100


def weighted_sample_frame(
    docs: DataFrame,
    weight_col: str,
    n: int = WEIGHTED_N,
    id_col: str = "doc_id",
    salt: str = WEIGHTED_SALT,
) -> DataFrame:
    """Deterministic weight-biased sample of n docs without
    replacement: rank by key = h // w (salted 60-bit md5 hash,
    integer-divided by the positive integer weight) and keep the n
    smallest keys. A doc with twice the weight halves its key range,
    so inclusion odds grow monotonically with weight — the
    integer-exact flavor of priority/PPS sampling (the float
    exponential-key variant trades cross-engine exactness for
    calibrated probabilities; this one is reproducible bit-for-bit on
    any engine, which is what corpus reproducibility needs).
    Rows with NULL or non-positive weight are excluded.

    Scale: orderBy(key).limit(n) plans as TakeOrderedAndProject —
    each partition keeps its local top-n and only n-row heads travel;
    no global sort, no full shuffle."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("#", F.lit(salt), F.col(id_col))), 1, 15),
        16,
        10,
    ).cast("bigint")
    w = F.col(weight_col).cast("bigint")
    keyed = (
        docs.filter(w > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            w.alias("weight"),
            h.alias("__h"),
        )
        .withColumn("key", F.expr("__h div weight"))
    )
    top = keyed.orderBy("key", "__h", "doc_id").limit(n)
    w2 = W.orderBy("key", "__h", "doc_id")
    return top.withColumn("rk", F.row_number().over(w2).cast("int")).select(
        "doc_id", "weight", "key", "rk"
    )


def weighted_sample(spark: SparkSession, sf_dir: str, n: int = WEIGHTED_N) -> DataFrame:
    """Documents-table entry: length-weighted deterministic sample
    (weight = n_chars) — longer documents proportionally likelier,
    selection reproducible across engines and runs."""
    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample_frame(docs, "n_chars", n).orderBy("rk")


def weighted_sample_oracle(n: int = WEIGHTED_N, salt: str = WEIGHTED_SALT) -> str:
    return f"""
    WITH d AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
             ('0x' || substr(md5('{salt}' || '#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM documents WHERE n_chars > 0
    ),
    ranked AS (
      SELECT doc_id, weight, h // weight AS key,
             row_number() OVER (ORDER BY h // weight, h, doc_id) AS rk
      FROM d
    )
    SELECT doc_id, weight, key, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {n} ORDER BY rk
    """


# ---------------------------------------------------- mixture planning

MIX_TOKEN_BUDGETS = {
    "src0": 20000, "src1": 15000, "src2": 8000, "src3": 4000,
    "src4": 2000, "src5": 1000,
}


def mixture_plan_frame(
    docs: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Training-mix epoch plan: per source, how many FULL passes
    (epochs) plus what tail fraction of one more pass hits the
    source's token budget. The operational question behind data
    mixing — a small high-quality source is repeated (epochs > 1), a
    huge crawl is subsampled (epochs = 0, tail < 1). One map-side-
    combined aggregate; the budget map is a broadcast literal."""
    s = F.col(source_col)
    budget = F.coalesce(
        *(
            [F.when(s == k, F.lit(v)) for k, v in sorted(budgets.items())]
            + [F.lit(0)]
        )
    ).cast("bigint")
    tokens = F.size(F.expr(f"filter(split({text_col}, ' +'), t -> t <> '')"))
    agg = (
        docs.select(
            s.alias("source"), budget.alias("budget"), tokens.alias("tokens")
        )
        .groupBy("source", "budget")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").cast("bigint").alias("n_tokens"),
        )
    )
    return (
        agg.withColumn("epochs", F.expr("budget div n_tokens"))
        .withColumn(
            "tail_tokens",
            (F.col("budget") - F.col("epochs") * F.col("n_tokens")).cast("bigint"),
        )
        .withColumn(
            "oversample",
            F.round(F.col("budget").cast("double") / F.col("n_tokens"), 6),
        )
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "n_tokens",
            "budget",
            F.col("epochs").cast("int").alias("epochs"),
            "tail_tokens",
            "oversample",
        )
        .orderBy("source")
    )


def mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents-table entry: the epoch/tail plan for the default
    per-source token budgets (sources outside the map get budget 0 —
    visible as excluded, not silently dropped)."""
    docs = load_table(spark, sf_dir, "documents")
    return mixture_plan_frame(docs, MIX_TOKEN_BUDGETS)


def mixture_plan_oracle(budgets: dict[str, int] | None = None) -> str:
    budgets = MIX_TOKEN_BUDGETS if budgets is None else budgets
    cases = " ".join(f"WHEN source = '{k}' THEN {v}" for k, v in sorted(budgets.items()))
    return f"""
    WITH d AS (
      SELECT source,
             CAST(CASE {cases} ELSE 0 END AS BIGINT) AS budget,
             len(list_filter(string_split_regex(text, ' +'), t -> t <> '')) AS tokens
      FROM documents
    ),
    agg AS (
      SELECT source, budget, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(tokens) AS BIGINT) AS n_tokens
      FROM d GROUP BY source, budget
    )
    SELECT source, n_docs, n_tokens, budget,
           CAST(budget // n_tokens AS INT) AS epochs,
           CAST(budget - (budget // n_tokens) * n_tokens AS BIGINT) AS tail_tokens,
           round(CAST(budget AS DOUBLE) / n_tokens, 6) AS oversample
    FROM agg ORDER BY source
    """


def weighted_sample_incremental(
    spark: SparkSession, sf_dir: str, n: int = WEIGHTED_N
) -> DataFrame:
    """Incremental weighted-sample maintenance, certified by the
    strongest invariant available: yesterday's corpus (doc_id % 3 < 2)
    is reduced to its top-n state (doc_id, weight, key rows — n rows,
    not the corpus), today's batch (% 3 == 2) to its own top-n, and
    the merged top-n of (state ∪ batch-top) must EQUAL the
    from-scratch sample over the full corpus — same oracle SQL as
    weighted_sample. The algebra that makes this exact: the priority
    key depends only on (id, weight), never on the rest of the
    corpus, so top-n is a semilattice merge — any doc outside either
    side's top-n is outside the union's. State is O(n); a daily batch
    re-ranks n + |batch| rows, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    state = weighted_sample_frame(
        docs.filter(F.col("doc_id") % 3 < 2), "n_chars", n
    ).select("doc_id", "weight", "key")
    batch_top = weighted_sample_frame(
        docs.filter(F.col("doc_id") % 3 == 2), "n_chars", n
    ).select("doc_id", "weight", "key")
    merged = state.unionByName(batch_top)
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("#", F.lit(WEIGHTED_SALT), F.col("doc_id"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    keyed = merged.withColumn("__h", h)
    top = keyed.orderBy("key", "__h", "doc_id").limit(n)
    w2 = W.orderBy("key", "__h", "doc_id")
    return (
        top.withColumn("rk", F.row_number().over(w2).cast("int"))
        .select("doc_id", "weight", "key", "rk")
        .orderBy("rk")
    )


# --------------------------------------------------- corpus build capstone

BUILD_BUDGETS = {"en": 40, "zh": 25}
BUILD_DEFAULT_N = 15


def corpus_build_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-builder capstone: quality-gate then budget-select in
    one call — documents pass the Gopher rule set (the published
    thresholds, operators/textstats.gopher_rules_frame), survivors are
    stratified by language with EXACT per-language budgets
    (stratified_sample_frame's prefilter+rescue plan over the PASSING
    population only — a dropped doc can neither ship nor consume a
    budget slot), and each selected doc carries its token count so the
    result audits directly against a mixture plan. Composes two
    certified operators; the oracle restates the same gate + window."""
    from danae_spark.operators.textstats import gopher_rules_frame

    docs = load_table(spark, sf_dir, "documents")
    g = gopher_rules_frame(docs).filter(F.col("keep") == 1).select("doc_id")
    passing = docs.join(g, "doc_id").select(
        "doc_id",
        "lang",
        F.size(F.expr("filter(split(text, ' +'), t -> t <> '')")).alias("tokens"),
    )
    sel = stratified_sample_frame(
        passing, stratum_col="lang", budgets=BUILD_BUDGETS,
        default_n=BUILD_DEFAULT_N, salt=STRATA_SALT,
    )
    return (
        sel.join(passing.select("doc_id", "tokens"), "doc_id")
        .select("stratum", "doc_id", "rk", F.col("tokens").cast("int").alias("tokens"))
        .orderBy("stratum", "rk")
    )


def corpus_build_select_oracle() -> str:
    from danae_spark.operators.textstats import GOPHER_QUALITY_ORACLE

    cases = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in sorted(BUILD_BUDGETS.items())
    )
    return f"""
    WITH gq AS ({GOPHER_QUALITY_ORACLE.replace("ORDER BY doc_id", "")}),
    passing AS (
      SELECT d.doc_id, d.lang,
             len(list_filter(string_split_regex(d.text, ' +'), t -> t <> ''))
               AS tokens,
             ('0x' || substr(md5('{STRATA_SALT}' || '#'
                || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT AS h,
             CASE {cases} ELSE {BUILD_DEFAULT_N} END AS n_s
      FROM documents d JOIN gq ON gq.doc_id = d.doc_id AND gq.keep = 1
    ),
    ranked AS (
      SELECT lang AS stratum, doc_id, tokens, n_s,
             row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
      FROM passing
    )
    SELECT stratum, doc_id, CAST(rk AS INT) AS rk, CAST(tokens AS INT) AS tokens
    FROM ranked WHERE rk <= n_s
    ORDER BY stratum, rk
    """


def stratified_sample_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental stratified-sample maintenance — the per-stratum
    analogue of weighted_sample_incremental: within each stratum the
    selection key (salted id hash) is corpus-independent, so the
    per-stratum top-n is a semilattice — yesterday's state (top-n
    rows per stratum, O(strata * n)) merged with the batch's own
    top-n re-ranks a bounded set and must EQUAL the from-scratch
    sample over the full corpus. Registers against the SAME oracle
    SQL as stratified_sample, so the merge exactness is value-hashed.
    State never depends on corpus size; a daily batch costs
    O(|batch| + strata * n)."""
    docs = load_table(spark, sf_dir, "documents")
    state = stratified_sample_frame(docs.filter(F.col("doc_id") % 3 < 2))
    batch = stratified_sample_frame(docs.filter(F.col("doc_id") % 3 == 2))
    merged = state.select("stratum", "doc_id").unionByName(
        batch.select("stratum", "doc_id")
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("#", F.lit(STRATA_SALT), F.col("doc_id"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    s = F.col("stratum")
    n_expr = F.coalesce(
        *(
            [F.when(s == k, F.lit(v)) for k, v in sorted(STRATA_BUDGETS.items())]
            + [F.lit(STRATA_DEFAULT_N)]
        )
    )
    keyed = merged.withColumn("__h", h)
    w = W.partitionBy("stratum").orderBy("__h", "doc_id")
    return (
        keyed.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= n_expr)
        .select("stratum", "doc_id", "rk")
        .orderBy("stratum", "rk")
    )
