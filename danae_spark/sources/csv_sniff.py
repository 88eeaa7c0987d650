"""CSV ingestion with dialect sniffing.

Reference parity: `ingest/profiling/filters.py:12-57` — the reference
sniffs encoding (chardet over the first 50 lines), separator (pandas
python-engine dialect detection), header readability, and row counts,
then parses with pandas on the driver.

Spark-first redesign: only the *sniff* reads a bounded head sample on
the driver (a few KB — this is inherently a small-sample operation);
the actual parse is a distributed `spark.read.csv` with the sniffed
options, so a 100 TB CSV lake ingests in parallel. Encoding detection
uses BOM + UTF-8 validation (chardet isn't vendored here); separator
detection uses csv.Sniffer with a frequency fallback — both driver-side
over the sample only.
"""

from __future__ import annotations

import csv
import gzip
import io
import os

from pyspark.sql import DataFrame, SparkSession

SAMPLE_BYTES = 64 * 1024
CANDIDATE_SEPS = (",", ";", "\t", "|")


def _read_head(path: str, n_bytes: int = SAMPLE_BYTES) -> bytes:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        return f.read(n_bytes)


def sniff_encoding(head: bytes) -> str:
    """BOM detection + UTF-8 validation fallback (filters.py:12 get_encoding)."""
    if head.startswith(b"\xef\xbb\xbf"):
        return "UTF-8"
    if head.startswith((b"\xff\xfe", b"\xfe\xff")):
        return "UTF-16"
    try:
        head.decode("utf-8")
        return "UTF-8"
    except UnicodeDecodeError:
        return "ISO-8859-1"


def sniff_separator(sample: str) -> str:
    """csv.Sniffer with most-frequent-candidate fallback (filters.py:26)."""
    first_lines = "\n".join(sample.splitlines()[:10])
    try:
        return csv.Sniffer().sniff(first_lines, delimiters="".join(CANDIDATE_SEPS)).delimiter
    except csv.Error:
        counts = {s: first_lines.count(s) for s in CANDIDATE_SEPS}
        return max(counts, key=counts.get)


def collect_header(sample: str, sep: str) -> list[str]:
    reader = csv.reader(io.StringIO(sample), delimiter=sep)
    return next(reader, [])


def is_csv_readable(header: list[str]) -> bool:
    """filters.py:44 — reject HTML/JSON masquerading as CSV."""
    if not header:
        return False
    joined = ";".join(header)
    return not ("<!DOCTYPE" in joined or joined.startswith("{") or joined.startswith("["))


def sniff(path: str) -> dict:
    head = _read_head(path)
    encoding = sniff_encoding(head)
    sample = head.decode(encoding, errors="replace")
    sep = sniff_separator(sample)
    header = collect_header(sample, sep)
    return {
        "encoding": encoding,
        "separator": sep,
        "header": header,
        "num_columns": len(header),
        "is_csv_readable": is_csv_readable(header),
        "compressed": path.endswith(".gz"),
    }


def read_csv_sniffed(spark: SparkSession, path: str, infer_schema: bool = True) -> DataFrame:
    """Sniff dialect from a head sample, then parse distributed."""
    profile = sniff(path)
    if not profile["is_csv_readable"]:
        raise ValueError(f"{os.path.basename(path)}: not parseable as CSV")
    return (
        spark.read.option("header", "true")
        .option("sep", profile["separator"])
        .option("encoding", profile["encoding"])
        .option("inferSchema", str(infer_schema).lower())
        .csv(path)
    )
