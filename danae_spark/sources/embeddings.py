"""GloVe-format word-embedding loader.

The reference's Categorical search index averages pre-trained GloVe-50d
word vectors over a column's top terms (word_aggregator.py:5 loads
`embeddings/glove.6B.50d.txt`, :13 mean-vector). This container ships no
embedding file, but the engine's `embeddings=` plug point
(search/knn.py `typed_signatures`, profiling/tfidf.py
`categorical_column_embeddings`) accepts any `(term string, vector
array<double>)` frame — this module turns the standard published GloVe
text format (`word v1 v2 … vd`, space-separated, one term per line) into
exactly that frame, so a user with the real file gets reference behavior
by passing `load_glove(spark, path)`.

Scale notes: the file is read with the distributed text source (a 400k ×
50d GloVe file is ~170 MB — a handful of partitions), parsed with
codegen array expressions (no Python UDF), and the resulting vocab frame
is broadcast by its consumers, never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_glove(
    spark: SparkSession,
    path: str,
    dims: int | None = None,
    lowercase: bool = False,
) -> DataFrame:
    """Parse a GloVe-format text file into a (term, vector) frame.

    - `dims`: expected vector length; inferred from the first line when
      omitted. Lines with a different token count (malformed, or the
      word2vec-style `<count> <dims>` header line some exports carry)
      are dropped rather than failing the job.
    - `lowercase`: fold terms to lowercase (GloVe 6B is already
      lowercased; 840B is cased — set True to match a lowercased
      tokenizer).

    Everything is built-in expressions: split → slice → transform(cast)
    stays in whole-stage codegen."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), " +")
    if dims is None:
        head = spark.read.text(path).limit(8).collect()
        counts = [len(r.value.split()) - 1 for r in head if len(r.value.split()) > 2]
        if not counts:
            raise ValueError(f"load_glove: no parseable embedding lines in {path}")
        # the word2vec header line (`<count> <dims>`) has 1 "dimension";
        # real lines dominate any sane file's first rows
        dims = max(counts)
    term = parts.getItem(0)
    if lowercase:
        term = F.lower(term)
    # try_cast, not cast: a malformed line must drop (the exists-null
    # filter below), not fail the whole read under ANSI mode
    vec = F.transform(F.slice(parts, 2, dims), lambda c: c.try_cast("double"))
    return (
        lines.filter(F.size(parts) == dims + 1)
        .select(term.alias("term"), vec.alias("vector"))
        .filter(~F.exists("vector", lambda x: x.isNull()))
    )


def mean_vector(
    embeddings: DataFrame,
    terms: DataFrame,
    dims: int,
    term_col: str = "term",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group mean embedding of a term list (word_aggregator.py:13
    transform_sentence: OOV terms are skipped via the inner join, the
    vector is the per-dimension mean of the hits). With no `group_cols`
    the whole frame is one group (a single sentence/column)."""
    joined = terms.select(
        *(group_cols or []), F.col(term_col).alias("term")
    ).join(F.broadcast(embeddings), "term")
    keys = group_cols or []
    agg = joined.groupBy(*keys).agg(
        F.count("*").alias("n_terms"),
        *[F.avg(F.col("vector")[i]).alias(f"e{i}") for i in range(dims)],
    )
    return agg
