"""URL parsing + per-domain quota — the provenance stage of a web
curation pipeline.

RefinedWeb / C4 / Gopher all gate on URL structure before any content
signal: parse scheme/host/path, reduce the host to its registrable
domain, then cap how many documents any single domain may contribute
(a handful of template-heavy domains otherwise dominate a crawl).

The lake's documents table has no URL column, so the registered entry
derives a deterministic synthetic URL per document from (doc_id,
source) — the same convention as the spatial profile's synthesized geo
(profiling/profiler.py SPATIAL_SIG_TABLES): the operator under test is
the PARSING + CAPPING plan, which is exactly what a real crawl table
would execute; `url_domain_cap_frame` takes any (id, url) frame.

Plan shape (100 TB): parsing is all row-wise codegen (regexp_extract /
split — no UDF); the cap is one window partitioned by domain ordered
by a content-independent hash (smallest-hash-first, the
deterministic_sample priority convention, so the kept set is stable
across runs/engines/cluster sizes). One shuffle, keyed on the domain —
the key the next stage (per-domain stats) wants anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from danae_spark.catalog import load_table

N_DOMAINS = 41
DOMAIN_CAP = 20
_TLDS = ("com", "org", "net")

# Common second-level public suffixes: a registrable domain under one of
# these spans THREE labels ("example.co.uk"), not two — without this every
# .co.uk site shares one cap bucket (silent mass-drop on a real crawl).
# Deliberately a small built-in subset of the public-suffix list, not the
# full Mozilla PSL (no bundled data files in this engine); callers with
# exotic ccTLD corpora can pass their own set.
TWO_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.nz", "net.nz", "org.nz",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.in", "net.in", "org.in", "co.za", "co.kr", "or.kr", "co.id",
)


def synth_url() -> F.Column:
    """Deterministic URL for a documents-table row: domain/TLD/path
    shape all derived from (doc_id, source) arithmetic — mirrored
    exactly in the oracle SQL."""
    dom = (F.col("doc_id") * 7919) % N_DOMAINS
    tld_ix = (F.col("doc_id") * 104729) % len(_TLDS)
    tld = F.coalesce(
        *[F.when(tld_ix == i, F.lit(t)) for i, t in enumerate(_TLDS)]
    )
    www = F.when(F.col("doc_id") % 2 == 0, F.lit("www.")).otherwise(F.lit(""))
    path = F.when(
        F.col("doc_id") % 3 == 0, F.concat(F.lit("/"), F.col("source"))
    ).otherwise(
        F.concat(F.lit("/"), F.col("source"), F.lit("/doc/"), F.col("doc_id"))
    )
    return F.concat(
        F.lit("https://"), www, F.lit("site"), dom, F.lit("."), tld, path
    )


def _synth_url_sql() -> str:
    tld = (
        f"CASE (doc_id * 104729) % {len(_TLDS)} "
        + " ".join(f"WHEN {i} THEN '{t}'" for i, t in enumerate(_TLDS))
        + " END"
    )
    return (
        "'https://' || (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END)"
        f" || 'site' || CAST((doc_id * 7919) % {N_DOMAINS} AS VARCHAR)"
        f" || '.' || ({tld})"
        " || (CASE WHEN doc_id % 3 = 0 THEN '/' || source"
        " ELSE '/' || source || '/doc/' || CAST(doc_id AS VARCHAR) END)"
    )


def registrable_domain(url_col) -> F.Column:
    """Registrable domain of a URL column — the SAME arithmetic
    url_domain_cap_frame applies (scheme-insensitive host parse, port
    strip, lowercase, last-2-labels with the public-suffix-subset
    3-label exception, bare-host/IPv4 passthrough), factored out (r14)
    so the canonical-link dedup guard and the cap share one
    definition. All codegen expressions, no UDF."""
    url_col = F.col(url_col) if isinstance(url_col, str) else url_col
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url_col, r"^(?i)https?://([^/]+)", 1)),
        r":\d+$",
        "",
    )
    parts = F.split(host, r"\.")
    np_ = F.size(parts)
    last2 = F.array_join(F.slice(parts, np_ - F.lit(1), F.lit(2)), ".")
    last3 = F.array_join(F.slice(parts, np_ - F.lit(2), F.lit(3)), ".")
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    return (
        F.when((np_ <= 1) | is_ip, host)
        .when((np_ >= 3) & last2.isin(*TWO_LABEL_SUFFIXES), last3)
        .otherwise(last2)
    )


def url_domain_cap_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    cap: int = DOMAIN_CAP,
) -> DataFrame:
    """Parse each URL and keep at most `cap` documents per registrable
    domain. Output per doc: host, registrable domain, TLD, path depth,
    the domain's total doc count, and the kept verdict.

    The keep priority is smallest md5(doc_id) first — content- and
    order-independent, so the kept set never changes under corpus
    reordering, engine swap, or cluster resize; new docs only displace
    docs they out-hash."""
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(url_col).alias("url"))
    # lowercase + port strip so caller-frame URLs ("HTTPS://Ex.COM:8080/x")
    # parse like canonical ones; no-ops on the synthesized lake URLs, so
    # the oracle needs no mirror
    host = F.regexp_replace(
        F.lower(F.regexp_extract("url", r"^(?i)https?://([^/]+)", 1)),
        r":\d+$",
        "",
    )
    d = d.withColumn("host", host)
    # Registrable domain: last 2 host labels, or last 3 when the 2-label
    # tail is a known public suffix (example.co.uk → example.co.uk, not
    # co.uk). Bare hosts (localhost) and IPv4 literals have no registrable
    # domain — the host itself is the cap key so they don't all collapse
    # into one '' bucket. All codegen expressions, no UDF; a no-op on the
    # synthesized lake URLs (single-label TLDs, ≥2 labels), so the
    # registered oracle needs no mirror.
    parts = F.split("host", r"\.")
    np_ = F.size(parts)
    last2 = F.array_join(F.slice(parts, np_ - F.lit(1), F.lit(2)), ".")
    last3 = F.array_join(F.slice(parts, np_ - F.lit(2), F.lit(3)), ".")
    is_ip = F.col("host").rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    d = d.withColumn(
        "domain",
        F.when((np_ <= 1) | is_ip, F.col("host"))
        .when((np_ >= 3) & last2.isin(*TWO_LABEL_SUFFIXES), last3)
        .otherwise(last2),
    ).withColumn("tld", F.regexp_extract("host", r"\.([a-z]+)$", 1))
    path = F.regexp_extract("url", r"^(?i)https?://[^/]+(/.*)$", 1)
    d = d.withColumn("__path", path).withColumn(
        "path_depth", F.size(F.expr("filter(split(__path, '/'), s -> s <> '')"))
    )
    w = W.partitionBy("domain")
    rank = F.row_number().over(
        w.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    )
    return (
        d.withColumn("n_domain_docs", F.count("*").over(w).cast("long"))
        .withColumn("kept", (rank <= cap).cast("int"))
        .select(
            "doc_id", "host", "domain", "tld", "path_depth", "n_domain_docs", "kept"
        )
        .orderBy("doc_id")
    )


def url_domain_cap(spark: SparkSession, sf_dir: str, cap: int = DOMAIN_CAP) -> DataFrame:
    """Lake entry: synthesize the deterministic URL column, then run the
    real parse + per-domain cap plan."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return url_domain_cap_frame(docs.withColumn("url", synth_url()), cap=cap)


def url_domain_cap_oracle(cap: int = DOMAIN_CAP) -> str:
    return f"""
    WITH u AS (
      SELECT doc_id, {_synth_url_sql()} AS url FROM documents
    ),
    p AS (
      SELECT doc_id, url,
             regexp_extract(url, '^https?://([^/]+)', 1) AS host,
             regexp_extract(regexp_extract(url, '^https?://([^/]+)', 1),
                            '([a-z0-9-]+\\.[a-z]+)$', 1) AS domain,
             regexp_extract(regexp_extract(url, '^https?://([^/]+)', 1),
                            '\\.([a-z]+)$', 1) AS tld,
             len(list_filter(string_split(
                 regexp_extract(url, '^https?://[^/]+(/.*)$', 1), '/'),
                 s -> s <> '')) AS path_depth
      FROM u
    )
    SELECT doc_id, host, domain, tld, path_depth,
           CAST(count(*) OVER (PARTITION BY domain) AS BIGINT) AS n_domain_docs,
           CAST(row_number() OVER (
                  PARTITION BY domain
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                ) <= {cap} AS INT) AS kept
    FROM p ORDER BY doc_id
    """


# --------------------------------------------------- URL canonicalization

# RFC 3986 §6 normalization + the crawl-dedup conventions (documented
# where they go beyond the RFC): lowercase scheme/host, strip default
# ports (http:80 / https:443), remove the fragment, resolve ./ and ../
# path segments (§5.2.4), percent-decode unreserved characters and
# uppercase the remaining escape hex (§6.2.2), and SORT query
# parameters (beyond the RFC: the standard crawl-frontier choice so
# ?a=1&b=2 and ?b=2&a=1 dedup to one fetch).

import re as _re  # noqa: E402

_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def _norm_escapes(s: str) -> str | None:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "%":
            hex2 = s[i + 1 : i + 3]
            if len(hex2) != 2 or not all(h in "0123456789abcdefABCDEF" for h in hex2):
                return None  # malformed escape
            ch = chr(int(hex2, 16))
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + hex2.upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _resolve_dots(path: str) -> str:
    segs = path.split("/")
    out: list[str] = []
    for seg in segs[1:]:  # leading '' from the absolute path
        if seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    return "/" + "/".join(out)


def resolve_reference(base: str, ref: str) -> str | None:
    """RFC 3986 §5 reference resolution + canonicalization: turn the
    href values a page actually carries — absolute URLs, scheme-
    relative (`//host/x`), absolute-path (`/x`), relative-path
    (`a/b`, `../x`), and query-only (`?q`) references — into absolute
    CANONICAL URLs against the page's base URL. Fragment-only
    references (`#frag`) return None (same-document, nothing to
    enqueue), as do unresolvable refs and non-http(s) targets —
    exactly the canonicalize_url contract, because the result routes
    through it."""
    if ref is None or ref == "" or ref.startswith("#"):
        return None
    if _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", ref):
        # any scheme prefix makes the ref absolute (RFC 3986 §4.1);
        # non-http(s) targets (mailto:, javascript:, tel:) yield None
        # via the canonicalize_url contract
        return canonicalize_url(ref)
    bm = _re.match(
        r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(\?[^#]*)?(#.*)?$", base
    )
    if not bm:
        return None
    scheme, netloc, bpath, bquery, _f = bm.groups()
    if ref.startswith("//"):
        return canonicalize_url(f"{scheme}:{ref}")
    ref_nofrag = ref.split("#", 1)[0]
    if not ref_nofrag:
        return None  # fragment-only after split
    if ref_nofrag.startswith("/"):
        return canonicalize_url(f"{scheme}://{netloc}{ref_nofrag}")
    if ref_nofrag.startswith("?"):
        base_path = bpath if bpath else "/"
        return canonicalize_url(f"{scheme}://{netloc}{base_path}{ref_nofrag}")
    # relative path: merge with the base path's directory (RFC 3986 §5.3.3)
    base_path = bpath if bpath else "/"
    merged = base_path[: base_path.rfind("/") + 1] + ref_nofrag
    return canonicalize_url(f"{scheme}://{netloc}{merged}")


def canonicalize_url(url: str) -> str | None:
    """Canonicalize one absolute http(s) URL; None for anything the
    grammar can't read (relative refs, other schemes, malformed
    escapes, empty host) — a frontier must not enqueue URLs it cannot
    normalize deterministically."""
    m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(\?[^#]*)?(#.*)?$", url)
    if not m:
        return None
    scheme, netloc, path, query, _frag = m.groups()
    scheme = scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host, _, port = netloc.partition(":")
    host = host.lower()
    if not host:
        return None
    if port:
        if not port.isdigit():
            return None
        if (scheme, int(port)) in (("http", 80), ("https", 443)):
            port = ""
    path = _norm_escapes(path if path else "/")
    if path is None:
        return None
    path = _resolve_dots(path)
    q = ""
    if query and query != "?":
        parts = []
        for p in query[1:].split("&"):
            p = _norm_escapes(p)
            if p is None:
                return None
            parts.append(p)
        q = "?" + "&".join(sorted(parts))
    return f"{scheme}://{host}{(':' + port) if port else ''}{path}{q}"


def synth_messy_url(d: int) -> str:
    """Doc-deterministic messy URL exercising every normalization
    rule: case mess, default vs explicit ports, dot segments, an
    escaped-unreserved octet, unsorted query params, a fragment."""
    scheme = "HTTP" if d % 2 == 1 else "https"
    host = f"WwW.Site{d % 7}.ExAmple.COM"
    if d % 3 == 0:
        port = ":80" if d % 2 == 1 else ":443"
    elif d % 3 == 1:
        port = ":8080"
    else:
        port = ""
    path = f"/a{d % 4}/b/../c/./p%7e{d % 5}"
    query = f"?b=2&a={d % 5}" if d % 2 == 1 else ""
    frag = "#frag" if d % 5 == 2 else ""
    return f"{scheme}://{host}{port}{path}{query}{frag}"


def url_canonicalize_frame(df, id_col: str = "doc_id", url_col: str = "url"):
    """Canonicalization over any (id, url) frame; null canon for URLs
    outside the grammar. Group by `url_canon` downstream to dedup a
    frontier."""
    import pandas as _pd

    def batches(it):
        for pdf in it:
            canon = [canonicalize_url(str(u)) if u is not None else None for u in pdf[url_col]]
            hosts = [
                c.split("://", 1)[1].split("/", 1)[0].split(":")[0] if c else None
                for c in canon
            ]
            yield _pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "url_raw": pdf[url_col],
                    "url_canon": canon,
                    "host": hosts,
                }
            )

    schema = f"{id_col} bigint, url_raw string, url_canon string, host string"
    return df.mapInPandas(batches, schema=schema)


def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable canonicalization: per doc a messy URL is
    synthesized (case mess, default ports, ../ and ./ segments, a
    %7E-escaped unreserved octet, unsorted query, fragment), pushed
    through the real RFC 3986 normalizer, and the CANONICAL STRING
    restated in SQL."""
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    import pandas as _pd

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                raw = synth_messy_url(d)
                canon = canonicalize_url(raw)
                host = canon.split("://", 1)[1].split("/", 1)[0].split(":")[0]
                rows.append(
                    {"doc_id": d, "url_raw": raw, "url_canon": canon, "host": host}
                )
            yield _pd.DataFrame(
                rows, columns=["doc_id", "url_raw", "url_canon", "host"]
            )

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(
            batches, schema="doc_id bigint, url_raw string, url_canon string, host string"
        )
        .orderBy("doc_id")
    )


def messy_url_sql_exprs(e: str) -> dict[str, str]:
    """The synth_messy_url arithmetic as SQL expressions over an
    integer expression `e` — the single source the C69/C70/C71 oracles
    all build from, so the raw/canonical restatements can never drift:
    keys 'raw', 'canon', 'host'."""
    scheme_raw = f"CASE WHEN ({e}) % 2 = 1 THEN 'HTTP' ELSE 'https' END"
    scheme = f"CASE WHEN ({e}) % 2 = 1 THEN 'http' ELSE 'https' END"
    host_raw = f"'WwW.Site' || CAST(({e}) % 7 AS VARCHAR) || '.ExAmple.COM'"
    host = f"'www.site' || CAST(({e}) % 7 AS VARCHAR) || '.example.com'"
    port_raw = (
        f"CASE WHEN ({e}) % 3 = 0 THEN "
        f"CASE WHEN ({e}) % 2 = 1 THEN ':80' ELSE ':443' END "
        f"WHEN ({e}) % 3 = 1 THEN ':8080' ELSE '' END"
    )
    port = f"CASE WHEN ({e}) % 3 = 1 THEN ':8080' ELSE '' END"
    path_raw = (
        f"'/a' || CAST(({e}) % 4 AS VARCHAR) || '/b/../c/./p%7e' "
        f"|| CAST(({e}) % 5 AS VARCHAR)"
    )
    path = f"'/a' || CAST(({e}) % 4 AS VARCHAR) || '/c/p~' || CAST(({e}) % 5 AS VARCHAR)"
    q_raw = (
        f"CASE WHEN ({e}) % 2 = 1 THEN '?b=2&a=' || CAST(({e}) % 5 AS VARCHAR) "
        f"ELSE '' END"
    )
    q = (
        f"CASE WHEN ({e}) % 2 = 1 THEN '?a=' || CAST(({e}) % 5 AS VARCHAR) || '&b=2' "
        f"ELSE '' END"
    )
    frag = f"CASE WHEN ({e}) % 5 = 2 THEN '#frag' ELSE '' END"
    return {
        "raw": f"{scheme_raw} || '://' || {host_raw} || {port_raw} || {path_raw} || {q_raw} || {frag}",
        "canon": f"{scheme} || '://' || {host} || {port} || {path} || {q}",
        "host": host,
    }


_U = messy_url_sql_exprs("doc_id")

URL_CANONICALIZE_ORACLE = f"""
SELECT doc_id,
       {_U["raw"]} AS url_raw,
       {_U["canon"]} AS url_canon,
       {_U["host"]} AS host
FROM documents
ORDER BY doc_id
"""


# ------------------------- cross-snapshot inventory diff

def snapshot_diff_frame(
    a: DataFrame,
    b: DataFrame,
    key_cols: tuple[str, ...] = ("url",),
    digest_col: str = "digest",
) -> DataFrame:
    """Diff two keyed digest inventories — the op a recurring crawl
    runs between dumps (url -> payload digest), and equally a partition
    -manifest or state-table reconciliation: every key classified as
    `added` (B only), `gone` (A only), `changed` (digest differs) or
    `unchanged`, with both digests carried for audit.

    Plan: one hash shuffle per side on the key set, a single full-outer
    sort-merge/hash join, row-wise CASE — no windows, no collects; AQE
    skew-splits a hot key (one mega-host's URLs) at runtime."""
    keys = list(key_cols)
    a2 = a.select(*keys, F.col(digest_col).alias("digest_a"))
    b2 = b.select(*keys, F.col(digest_col).alias("digest_b"))
    verdict = (
        F.when(F.col("digest_a").isNull(), F.lit("added"))
        .when(F.col("digest_b").isNull(), F.lit("gone"))
        .when(F.col("digest_a") != F.col("digest_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        a2.join(b2, on=keys, how="full_outer")
        .withColumn("verdict", verdict)
        .select(*keys, "verdict", "digest_a", "digest_b")
    )
