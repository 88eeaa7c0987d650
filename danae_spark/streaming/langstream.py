"""Streaming twin of the Cavnar-Trenkle language classifier.

A crawler lands decoded pages continuously; the language verdict
should flow per micro-batch. The batch plan (operators/langid.py)
builds the per-document gram profile with an explode + two windows —
a shuffle shape Structured Streaming cannot run as a stateless
append. This twin restates the ENTIRE per-document computation as
pure row-wise array expressions (the streaming/curation.py pattern,
taken further):

  - the capped 1/2/3-gram multiset as nested `transform`s over
    substrings;
  - the rank profile as `array_sort` with an explicit (count desc,
    gram asc) comparator over the distinct grams — the same total
    order the batch row_number states;
  - the out-of-place distance per language as one `aggregate` over
    the ranked profile against a CONSTANT map literal (gram -> rank)
    inlined from the SAME `_PROFILES` table the batch plan
    broadcasts — 25 maps x 100 entries, folded into the plan;
  - argmin with the lexicographic tie via `array_sort` over
    (dist, lang) structs.

Every column is whole-stage-codegen: NO shuffle, NO state store, NO
Python — the stream stage is a stateless append that scales linearly
with executor count, and the SAME select works on a batch frame,
which is how the parity test pins row-identical output against
lang_id_ngram_frame (predicted, n_profile, best_dist all equal).

Cost note: the per-distinct-gram count is O(|distinct| x |grams|)
array work per row — bounded by the _DOC_CAP=600-char normalization
cap, and the price of statelessness; the batch plan stays the right
shape for offline sweeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from danae_spark.operators.langid import (
    _DOC_CAP,
    _DOC_PROFILE,
    _GRAM_SIZES,
    _NORM_SQL,
    _PROFILES,
    _PROFILE_SIZE,
)


def _profile_map_sql(lang: str) -> str:
    """The language's (gram -> rank) profile as a map literal."""
    pairs = ", ".join(
        "'{}', {}".format(g.replace("'", "''"), r)
        for l, g, r in _PROFILES
        if l == lang
    )
    return f"map({pairs})"


def lang_id_stream(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Row-wise language ID over any (id, text) frame — streaming OR
    batch (same plan; the parity test exploits that). Output matches
    lang_id_ngram_frame's label-free form: (id, n_profile, predicted,
    best_dist)."""
    langs = sorted({l for l, _, _ in _PROFILES})
    norm = F.expr(
        f"substring({_NORM_SQL.format(t=text_col)}, 1, {_DOC_CAP})"
    ).alias("__norm")
    d = docs.select(F.col(id_col), norm)
    gram_lists = ", ".join(
        f"CASE WHEN length(__norm) < {n} THEN array() "
        f"ELSE transform(sequence(1, length(__norm) - {n - 1}), "
        f"i -> substring(__norm, i, {n})) END"
        for n in _GRAM_SIZES
    )
    d = d.select(id_col, F.expr(f"concat({gram_lists})").alias("__g"))
    # ranked doc profile: distinct grams sorted by (count desc, gram
    # asc) — the row_number order of the batch plan — then indexed
    d = d.select(
        id_col,
        F.expr(
            "slice(array_sort("
            "  transform(array_distinct(__g),"
            "            x -> struct(size(filter(__g, y -> y = x)) AS c, x AS g)),"
            "  (a, b) -> CASE WHEN a.c > b.c THEN -1 WHEN a.c < b.c THEN 1"
            "                 WHEN a.g < b.g THEN -1 WHEN a.g > b.g THEN 1"
            "                 ELSE 0 END), "
            f" 1, {_DOC_PROFILE})"
        ).alias("__prof"),
    )
    d = d.select(
        id_col,
        F.expr(
            # sequence(1, 0) counts DOWN in Spark, so the empty
            # profile needs an explicit guard
            "CASE WHEN size(__prof) = 0 THEN array() ELSE "
            "transform(sequence(1, size(__prof)),"
            " i -> struct(i AS drank, element_at(__prof, i).g AS g)) END"
        ).alias("__ranked"),
    )
    dist_structs = ", ".join(
        "struct(aggregate(__ranked, 0L, (acc, p) -> acc +"
        f" coalesce(abs(p.drank - {_profile_map_sql(lang)}[p.g]),"
        f" {_PROFILE_SIZE}L)) AS dist, '{lang}' AS lang)"
        for lang in langs
    )
    d = d.select(
        id_col,
        F.expr("size(__ranked)").alias("__np"),
        F.expr(
            f"element_at(array_sort(array({dist_structs})), 1)"
        ).alias("__best"),
    )
    return d.select(
        id_col,
        F.coalesce(F.col("__np"), F.lit(0)).cast("int").alias("n_profile"),
        F.when(F.col("__np") > 0, F.col("__best.lang"))
        .otherwise(F.lit("und"))
        .alias("predicted"),
        F.when(F.col("__np") > 0, F.col("__best.dist")).alias("best_dist"),
    )
