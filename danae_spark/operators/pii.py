"""PII detection / redaction for training-data pipelines.

Every production pre-training pipeline (C4, RefinedWeb, Dolma class)
runs a PII pass before publishing a corpus: find personally
identifiable strings (emails, IPv4 addresses, phone-shaped numbers)
and either count them (filter signal) or replace them with sentinel
tokens (redaction). Both operators here are pure codegen
`regexp_extract_all` / `regexp_replace` expressions — no Python in the
row path, one scan, no shuffle until the final sort — so they run at
full JVM speed on any corpus size.

Patterns are deliberately conservative and engine-portable (identical
semantics under Java regex and RE2/DuckDB): explicit character
classes, no backreferences, no lookaround.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from danae_spark.catalog import load_table, widen

# pattern → sentinel. Order matters for redaction: emails first so the
# user@host form is consumed before the phone/number patterns see it.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
)


def pii_scan_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc PII match counts + the keep/flag decision, over ANY
    (id, text) frame. One scan, all codegen."""
    docs = widen(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")))
    counts = [
        F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0))).cast("long").alias(
            f"n_{name}"
        )
        for name, pat, _s in PII_PATTERNS
    ]
    out = docs.select("doc_id", *counts)
    total = sum(F.col(f"n_{name}") for name, _p, _s in PII_PATTERNS)
    return (
        out.withColumn("n_pii", total.cast("long"))
        .withColumn("has_pii", (F.col("n_pii") > 0).cast("int"))
        .orderBy("doc_id")
    )


def pii_redact_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Sentinel-token redaction over ANY (id, text) frame: each PII
    class replaced in PII_PATTERNS order. Returns (doc_id,
    redacted_text); chain `.filter` on pii_scan_frame for
    drop-instead-of-redact policies."""
    docs = widen(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")))
    red = F.col("text")
    for _name, pat, sentinel in PII_PATTERNS:
        red = F.regexp_replace(red, pat, sentinel)
    return docs.select("doc_id", red.alias("redacted_text")).orderBy("doc_id")


# ------------------------------------------------- registered lake entry

# The synthetic documents carry no real PII, so the registered entry
# injects a deterministic doc_id-derived PII suffix into each text ON
# BOTH ENGINES and runs the real scan + redaction over the result —
# nonzero counts, value-checked end to end.
_INJECT = (
    "concat(text, ' contact user', CAST(doc_id AS STRING), '@example.com'"
    ", ' from 10.1.', CAST(doc_id % 256 AS STRING), '.7'"
    ", CASE WHEN doc_id % 3 = 0 THEN ' call 555-867-5309' ELSE '' END)"
)


def pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lake entry: scan + redaction digest over PII-injected documents
    (see _INJECT). `redacted_len` pins the regexp_replace semantics into
    the value hash without hauling full texts through the compare."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_INJECT).alias("text")
    )
    scanned = pii_scan_frame(docs)
    red = pii_redact_frame(docs).select(
        "doc_id", F.length("redacted_text").cast("long").alias("redacted_len")
    )
    return (
        scanned.join(red, "doc_id")
        .select(
            "doc_id", "n_email", "n_ipv4", "n_phone", "n_pii", "has_pii", "redacted_len"
        )
        .orderBy("doc_id")
    )


def pii_scan_oracle() -> str:
    email, ipv4, phone = (p for _n, p, _s in PII_PATTERNS)
    inject = _INJECT.replace("CAST(doc_id AS STRING)", "CAST(doc_id AS VARCHAR)").replace(
        "CAST(doc_id % 256 AS STRING)", "CAST(doc_id % 256 AS VARCHAR)"
    )
    red = "t"
    for _n, pat, sentinel in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{sentinel}', 'g')"
    return f"""
    WITH d AS (SELECT doc_id, {inject} AS t FROM documents),
    c AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '{email}')) AS BIGINT) AS n_email,
             CAST(len(regexp_extract_all(t, '{ipv4}')) AS BIGINT) AS n_ipv4,
             CAST(len(regexp_extract_all(t, '{phone}')) AS BIGINT) AS n_phone,
             CAST(length({red}) AS BIGINT) AS redacted_len
      FROM d
    )
    SELECT doc_id, n_email, n_ipv4, n_phone,
           CAST(n_email + n_ipv4 + n_phone AS BIGINT) AS n_pii,
           CAST(n_email + n_ipv4 + n_phone > 0 AS INT) AS has_pii,
           redacted_len
    FROM c ORDER BY doc_id
    """


# ------------- corpus PII report: text findings x media EXIF GPS

# conditional variant of _INJECT: %4==1 docs keep their clean text, so
# the report exercises every action leg (publish / strip_exif /
# redact_text / redact_and_strip)
_INJECT_SOME = f"CASE WHEN doc_id % 4 = 1 THEN text ELSE {_INJECT} END"


def corpus_pii_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc PII verdict across BOTH modalities — what a publishing
    pipeline actually gates on: the text scan (emails/IPs/phones, with
    the redacted length pinning the rewrite) joined with the doc's
    image EXIF GPS presence (multimodal/exif.py — coordinates locate a
    person the way a phone number does), fused into one action:
    publish / redact_text / strip_exif / redact_and_strip. Both legs
    are certified subplans; the composition is one hash join on
    doc_id, all codegen before it."""
    from danae_spark.multimodal.exif import image_exif_roundtrip

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_INJECT_SOME).alias("text")
    )
    scanned = pii_scan_frame(docs).select("doc_id", "n_pii")
    red = pii_redact_frame(docs).select(
        "doc_id", F.length("redacted_text").cast("long").alias("redacted_len")
    )
    media = image_exif_roundtrip(spark, sf_dir).select(
        "doc_id", F.coalesce("has_gps", F.lit(0)).alias("has_gps")
    )
    action = (
        F.when((F.col("n_pii") > 0) & (F.col("has_gps") == 1), F.lit("redact_and_strip"))
        .when(F.col("n_pii") > 0, F.lit("redact_text"))
        .when(F.col("has_gps") == 1, F.lit("strip_exif"))
        .otherwise(F.lit("publish"))
    )
    return (
        scanned.join(red, "doc_id")
        .join(media, "doc_id")
        .select("doc_id", "n_pii", "redacted_len", "has_gps", action.alias("action"))
        .orderBy("doc_id")
    )


def corpus_pii_report_oracle() -> str:
    email, ipv4, phone = (p for _n, p, _s in PII_PATTERNS)
    inject = _INJECT_SOME.replace("CAST(doc_id AS STRING)", "CAST(doc_id AS VARCHAR)").replace(
        "CAST(doc_id % 256 AS STRING)", "CAST(doc_id % 256 AS VARCHAR)"
    )
    red = "t"
    for _n, pat, sentinel in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{sentinel}', 'g')"
    return f"""
    WITH d AS (SELECT doc_id, {inject} AS t FROM documents),
    c AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '{email}'))
                  + len(regexp_extract_all(t, '{ipv4}'))
                  + len(regexp_extract_all(t, '{phone}')) AS BIGINT) AS n_pii,
             CAST(length({red}) AS BIGINT) AS redacted_len
      FROM d
    ),
    m AS (
      SELECT doc_id,
             CAST(CASE WHEN doc_id % 7 <> 6 AND doc_id % 13 <> 12
                        AND doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT) AS has_gps
      FROM documents
    )
    SELECT c.doc_id, n_pii, redacted_len, has_gps,
           CASE WHEN n_pii > 0 AND has_gps = 1 THEN 'redact_and_strip'
                WHEN n_pii > 0 THEN 'redact_text'
                WHEN has_gps = 1 THEN 'strip_exif'
                ELSE 'publish' END AS action
    FROM c JOIN m ON c.doc_id = m.doc_id
    ORDER BY c.doc_id
    """
