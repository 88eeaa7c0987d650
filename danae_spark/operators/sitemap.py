"""Sitemap extraction (sitemaps.org protocol) — the third leg of the
crawl-frontier stack after robots_check (C68) and url_canonicalize
(C69): robots names the sitemaps, sitemaps name the URLs, the
canonicalizer dedups them.

Implemented as a strict walk of the protocol's XML subset (the tag
scanner is shared with the HTML extractor — one quote-aware scanner
in the engine, one set of acceptance semantics):

  - `<?xml ...?>` prolog and comments skipped; exactly one root
    element, `urlset` (leaf sitemap) or `sitemapindex` (index of
    sitemaps); children `url` / `sitemap` respectively.
  - Per entry: `loc` (required, non-empty, XML entities decode —
    the protocol REQUIRES `&` in URLs be escaped as `&amp;`),
    optional `lastmod` (W3C date: YYYY-MM-DD with optional time
    suffix), `changefreq` (the protocol's nine tokens), `priority`
    (0.0..1.0). Unknown child elements are skipped (forward compat).
  - `.xml.gz`: single-member gzip (trailing garbage rejects —
    the same contract as tar.gz).
  - Every loc is routed through urlops.canonicalize_url; locs the
    canonicalizer rejects are counted, not silently kept — a frontier
    must know how many sitemap entries it cannot enqueue.

Reject-whole (return None): undecodable UTF-8, wrong root, an entry
without loc, malformed nesting / unterminated tags, out-of-range
priority, non-W3C lastmod, unknown changefreq token — sitemaps are
machine-generated; a malformed one signals a broken generator, and
its URLs should come from the crawl itself instead.

Reference parity note: the reference (smartdatalake/danae) has no
crawl frontier; this is mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd

__all__ = [
    "parse_sitemap",
    "parse_sitemap_bundle",
    "synth_sitemap",
    "synth_sitemap_bundle",
    "sitemap_extract_frame",
    "sitemap_bundle_frame",
    "sitemap_extract_roundtrip",
    "sitemap_bundle_roundtrip",
    "SITEMAP_ORACLE",
    "SITEMAP_BUNDLE_ORACLE",
]

_CHANGEFREQ = frozenset(
    "always hourly daily weekly monthly yearly never".split()
)
_LASTMOD_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}(T\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|[+-]\d{2}:\d{2}))?$"
)


def _walk_entries(text: str) -> tuple[str, list[dict]] | None:
    """Walk the XML subset into (root_kind, entries)."""
    from danae_spark.multimodal.htmltext import _decode_entities, _scan_tag

    n = len(text)
    pos = 0
    root: str | None = None
    entries: list[dict] = []
    stack: list[str] = []
    cur: dict | None = None
    cur_field: str | None = None
    buf: list[str] = []

    while pos < n:
        lt = text.find("<", pos)
        if lt == -1:
            if text[pos:].strip():
                return None  # text outside any element
            break
        chunk = text[pos:lt]
        if cur_field is not None:
            buf.append(chunk)
        elif chunk.strip():
            return None  # stray text between structural elements
        pos = lt
        if text.startswith("<!--", pos):
            end = text.find("-->", pos + 4)
            if end == -1:
                return None
            pos = end + 3
            continue
        if text.startswith("<?", pos) or text.startswith("<!", pos):
            end = text.find(">", pos + 2)
            if end == -1:
                return None
            pos = end + 1
            continue
        tag = _scan_tag(text, pos)
        if tag is None:
            return None
        name, is_close, self_closing, _attrs, pos = tag
        if not is_close:
            if root is None:
                if name not in ("urlset", "sitemapindex"):
                    return None
                root = name
                stack.append(name)
            elif len(stack) == 1:
                want = "url" if root == "urlset" else "sitemap"
                if name != want:
                    return None
                cur = {}
                stack.append(name)
            elif len(stack) == 2:
                stack.append(name)
                cur_field = name
                buf = []
            else:
                return None  # deeper nesting is not sitemap XML
            if self_closing:
                # an empty element closes immediately; an empty entry
                # has no loc, which the close path below would reject
                stack.pop()
                if len(stack) == 2:
                    cur_field = None
                elif len(stack) == 1:
                    return None  # <url/> / <sitemap/>: entry without loc
                else:
                    return None  # <urlset/>: empty root
        else:
            if not stack or stack[-1] != name:
                return None
            stack.pop()
            if cur_field == name:
                value = _decode_entities("".join(buf).strip())
                if name in ("loc", "lastmod", "changefreq", "priority"):
                    cur[name] = value  # unknown fields: skipped
                cur_field = None
            elif len(stack) == 1:  # closed a url/sitemap entry
                if cur is None or "loc" not in cur or not cur["loc"]:
                    return None
                entries.append(cur)
                cur = None
            elif not stack:
                if pos < n and text[pos:].strip():
                    return None  # trailing content after the root closes
                break
    if stack or root is None:
        return None
    return root, entries


def _load_entries(payload: bytes) -> tuple[str, list[dict], bool] | None:
    """Gunzip (single-member .xml.gz) + decode + walk; returns
    (root, entries, is_gzip) or None."""
    p = bytes(payload) if payload is not None else b""
    is_gzip = p[:2] == b"\x1f\x8b"
    if is_gzip:
        d = zlib.decompressobj(31)
        try:
            raw = d.decompress(p)
        except zlib.error:
            return None
        if not d.eof or d.unused_data:
            return None
        p = raw
    try:
        text = p.decode("utf-8")
    except UnicodeDecodeError:
        return None
    got = _walk_entries(text)
    if got is None:
        return None
    return got[0], got[1], is_gzip


def _validate_entries(entries: list[dict]) -> dict | None:
    """The protocol's per-entry field rules + canonicalization census,
    shared between parse_sitemap and the bundle walk so leaf and
    composed readings cannot drift. None on any field violation."""
    from danae_spark.operators.urlops import canonicalize_url

    n_lastmod = 0
    n_canonical = 0
    first_loc = first_canon = None
    for e in entries:
        lm = e.get("lastmod")
        if lm is not None:
            if not _LASTMOD_RE.match(lm):
                return None
            n_lastmod += 1
        cf = e.get("changefreq")
        if cf is not None and cf not in _CHANGEFREQ:
            return None
        pr = e.get("priority")
        if pr is not None:
            try:
                v = float(pr)
            except ValueError:
                return None
            if not 0.0 <= v <= 1.0:
                return None
        canon = canonicalize_url(e["loc"])
        if canon is not None:
            n_canonical += 1
        if first_loc is None:
            first_loc = e["loc"]
            first_canon = canon
    return {
        "n_lastmod": n_lastmod,
        "n_canonical": n_canonical,
        "first_loc": first_loc,
        "first_loc_canon": first_canon,
    }


def parse_sitemap(payload: bytes) -> dict | None:
    """Parse a sitemap / sitemap index into one census row:

      kind ('urlset' | 'index'), is_gzip, n_entries, n_lastmod,
      n_canonical (locs the RFC 3986 canonicalizer accepts),
      first_loc, first_loc_canon
    """
    got = _load_entries(payload)
    if got is None:
        return None
    root, entries, is_gzip = got
    v = _validate_entries(entries)
    if v is None:
        return None
    return {
        "kind": "index" if root == "sitemapindex" else "urlset",
        "is_gzip": is_gzip,
        "n_entries": len(entries),
        "n_lastmod": v["n_lastmod"],
        "n_canonical": v["n_canonical"],
        "first_loc": v["first_loc"],
        "first_loc_canon": v["first_loc_canon"],
    }


def parse_sitemap_bundle(payload: bytes) -> dict | None:
    """Walk a sitemap DUMP bundle — an archive (zip/tar/tar.gz) holding
    ONE sitemap index (`sitemap.xml`/`sitemap.xml.gz`) plus the child
    sitemaps it names, resolved by loc basename (the layout sitemap
    dumps and crawler caches actually use). Recursion is ONE level by
    protocol rule: an index must not name another index, so a resolved
    child that parses as an index rejects the bundle whole. Children
    the bundle does not contain (remote-only locs) are counted as
    unresolved, not rejected. Census:

      n_children, n_resolved, n_urls, n_lastmod, n_canonical (child
      url totals through the SAME _validate_entries rules as the leaf
      entry), first_child (basename), first_url, first_url_canon
    """
    from danae_spark.multimodal.archive import iter_archive_members

    members: dict[str, bytes] = {}
    for name, is_dir, data in iter_archive_members(payload):
        if not is_dir:
            members[name.rsplit("/", 1)[-1]] = data
    if not members:
        return None
    idx_payload = members.get("sitemap.xml", members.get("sitemap.xml.gz"))
    if idx_payload is None:
        return None
    idx = _load_entries(idx_payload)
    if idx is None or idx[0] != "sitemapindex":
        return None
    if _validate_entries(idx[1]) is None:
        return None
    n_resolved = 0
    n_urls = n_lastmod = n_canonical = 0
    first_child = first_url = first_url_canon = None
    for e in idx[1]:
        base = e["loc"].rsplit("/", 1)[-1]
        if first_child is None:
            first_child = base
        child = members.get(base)
        if child is None or base in ("sitemap.xml", "sitemap.xml.gz"):
            continue  # remote-only (or self-referential) loc: unresolved
        got = _load_entries(child)
        if got is None:
            return None  # a present child that cannot be walked
        root, entries, _gz = got
        if root != "urlset":
            return None  # index-in-index: the one-level protocol rule
        v = _validate_entries(entries)
        if v is None:
            return None
        n_resolved += 1
        n_urls += len(entries)
        n_lastmod += v["n_lastmod"]
        n_canonical += v["n_canonical"]
        if first_url is None:
            first_url = v["first_loc"]
            first_url_canon = v["first_loc_canon"]
    return {
        "n_children": len(idx[1]),
        "n_resolved": n_resolved,
        "n_urls": n_urls,
        "n_lastmod": n_lastmod,
        "n_canonical": n_canonical,
        "first_child": first_child,
        "first_url": first_url,
        "first_url_canon": first_url_canon,
    }


# ------------------------------------------------------------- synthesis


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;")


def sitemap_n_entries(d: int) -> int:
    return 2 + d % 5


def entry_loc(d: int, i: int) -> str:
    from danae_spark.operators.urlops import synth_messy_url

    if (d + i) % 7 == 5:
        return f"ftp://bad{i}.example/x"  # uncanonicalizable, counted
    return synth_messy_url(d * 8 + i)


def synth_sitemap(doc_id: int) -> bytes:
    """Doc-deterministic sitemap: sitemapindex on d % 4 == 3 else
    urlset; entries carry messy locs (XML-escaped — '&' in query
    strings becomes &amp;), lastmod on even i, changefreq/priority
    sometimes, an unknown child element, a comment; gzip on
    d % 3 == 1."""
    d = doc_id
    kind = "sitemapindex" if d % 4 == 3 else "urlset"
    child = "sitemap" if kind == "sitemapindex" else "url"
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        "<!-- synth sitemap fixture -->",
        f'<{kind} xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for i in range(sitemap_n_entries(d)):
        out.append(f"  <{child}>")
        out.append(f"    <loc>{_xml_escape(entry_loc(d, i))}</loc>")
        if i % 2 == 0:
            out.append(f"    <lastmod>2026-0{1 + (d + i) % 9}-15</lastmod>")
        if kind == "urlset" and i % 3 == 0:
            out.append("    <changefreq>daily</changefreq>")
            out.append(f"    <priority>0.{(d + i) % 10}</priority>")
        if i == 0:
            out.append("    <mobile>yes</mobile>")  # unknown child: skipped
        out.append(f"  </{child}>")
    out.append(f"</{kind}>")
    xml = "\n".join(out).encode("utf-8")
    if d % 3 == 1:
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        return c.compress(xml) + c.flush()
    return xml


# ----------------------------------------------------------- bundle synth


def bundle_n_children(d: int) -> int:
    return 1 + d % 3


def _synth_child_urlset(e: int) -> bytes:
    """A child urlset at synth parameter e: sitemap_n_entries(e)
    entries of entry_loc(e, i), lastmod on even i."""
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for i in range(sitemap_n_entries(e)):
        out.append("  <url>")
        out.append(f"    <loc>{_xml_escape(entry_loc(e, i))}</loc>")
        if i % 2 == 0:
            out.append(f"    <lastmod>2026-0{1 + (e + i) % 9}-15</lastmod>")
        out.append("  </url>")
    out.append("</urlset>")
    return "\n".join(out).encode("utf-8")


def synth_sitemap_bundle(doc_id: int) -> bytes:
    """Doc-deterministic sitemap dump: a ZIP holding `maps/sitemap.xml`
    (a sitemapindex) plus the 1-3 child sitemaps it names — gzipped
    `.xml.gz` except child k with (d+k) % 4 == 1 (plain `.xml`), so
    both wire forms walk. Docs with d % 5 == 2 also name a
    `missing.xml.gz` the bundle does not contain (unresolved, counted
    not rejected). Child k's urlset is _synth_child_urlset(d*4 + k)."""
    from danae_spark.multimodal.archive import _zip_build

    d = doc_id
    host = f"site{d % 5}.example"
    entries = []
    index_lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for k in range(bundle_n_children(d)):
        gz = (d + k) % 4 != 1
        name = f"c{k}.xml.gz" if gz else f"c{k}.xml"
        xml = _synth_child_urlset(d * 4 + k)
        if gz:
            c = zlib.compressobj(6, zlib.DEFLATED, 31)
            data = c.compress(xml) + c.flush()
        else:
            data = xml
        entries.append((f"maps/{name}", data, 0 if gz else 8))
        index_lines.append(
            f"  <sitemap><loc>https://{host}/maps/{name}</loc></sitemap>"
        )
    if d % 5 == 2:
        index_lines.append(
            f"  <sitemap><loc>https://{host}/maps/missing.xml.gz</loc></sitemap>"
        )
    index_lines.append("</sitemapindex>")
    index = "\n".join(index_lines).encode("utf-8")
    return _zip_build([("maps/", b"", 0), ("maps/sitemap.xml", index, 8)] + entries)


# ----------------------------------------------------- Spark entry points

_COLS = [
    "kind",
    "is_gzip",
    "n_entries",
    "n_lastmod",
    "n_canonical",
    "first_loc",
    "first_loc_canon",
]

_SCHEMA = (
    "doc_id bigint, kind string, is_gzip boolean, n_entries int, "
    "n_lastmod int, n_canonical int, first_loc string, first_loc_canon string"
)


def sitemap_extract_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Sitemap extraction over any (id, binary) frame; nulls for
    files outside the protocol subset."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                c = parse_sitemap(bytes(payload)) if payload is not None else None
                row = {id_col: rid}
                row.update({k: (c.get(k) if c else None) for k in _COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=[id_col] + _COLS)

    return df.mapInPandas(batches, schema=_SCHEMA.replace("doc_id", id_col, 1))


def sitemap_extract_roundtrip(spark, sf_dir: str):
    """Oracle-checkable sitemap extraction: per doc a real sitemap or
    sitemap index (XML-escaped messy locs, W3C lastmods, unknown
    children, a comment; single-member gzip on d % 3 == 1) is walked
    by the shared tag scanner, every loc routed through the C69
    canonicalizer, and the census — including the first loc RAW and
    CANONICAL strings — restated in SQL from the same messy-URL
    fragment as C69/C70."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                c = parse_sitemap(synth_sitemap(d))
                row = {"doc_id": d}
                row.update({k: (c.get(k) if c else None) for k in _COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + _COLS)

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=_SCHEMA)
        .orderBy("doc_id")
    )


def _sitemap_oracle() -> str:
    from danae_spark.operators.urlops import messy_url_sql_exprs

    u0 = messy_url_sql_exprs("doc_id * 8")  # entry i = 0
    return f"""
WITH g AS (
  SELECT doc_id, CAST(2 + doc_id % 5 AS INT) AS n_entries FROM documents
),
ent AS (
  SELECT g.doc_id, i.i,
         (g.doc_id + i.i) % 7 = 5 AS bad
  FROM g, generate_series(0, 6) i(i)
  WHERE i.i < g.n_entries
),
agg AS (
  SELECT doc_id,
         CAST(count(*) FILTER (WHERE i % 2 = 0) AS INT) AS n_lastmod,
         CAST(count(*) FILTER (WHERE NOT bad) AS INT) AS n_canonical
  FROM ent GROUP BY doc_id
)
SELECT g.doc_id,
       CASE WHEN g.doc_id % 4 = 3 THEN 'index' ELSE 'urlset' END AS kind,
       g.doc_id % 3 = 1 AS is_gzip,
       g.n_entries,
       a.n_lastmod,
       a.n_canonical,
       CASE WHEN g.doc_id % 7 = 5 THEN 'ftp://bad0.example/x'
            ELSE {u0["raw"]} END AS first_loc,
       CASE WHEN g.doc_id % 7 = 5 THEN NULL
            ELSE {u0["canon"]} END AS first_loc_canon
FROM g JOIN agg a USING (doc_id)
ORDER BY g.doc_id
"""


SITEMAP_ORACLE = _sitemap_oracle()


_BUNDLE_COLS = [
    "n_children",
    "n_resolved",
    "n_urls",
    "n_lastmod",
    "n_canonical",
    "first_child",
    "first_url",
    "first_url_canon",
]


def sitemap_bundle_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Bundle walk over any (id, binary) frame; nulls for archives the
    bundle grammar rejects."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                c = parse_sitemap_bundle(bytes(payload)) if payload is not None else None
                row = {id_col: rid}
                row.update({k: (c.get(k) if c else None) for k in _BUNDLE_COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=[id_col] + _BUNDLE_COLS)

    schema = (
        f"{id_col} bigint, n_children int, n_resolved int, n_urls int, "
        "n_lastmod int, n_canonical int, first_child string, "
        "first_url string, first_url_canon string"
    )
    return df.mapInPandas(batches, schema=schema)


def sitemap_bundle_roundtrip(spark, sf_dir: str):
    """Oracle-checkable sitemap-dump walk: per doc a real ZIP (full
    CRC-verified members) holding a sitemapindex + the .xml/.xml.gz
    child urlsets it names is walked by the archive layer, the index
    recursed ONE level into the children (protocol rule pinned by
    pytest: an index child rejects), every child loc through the same
    entry validation + canonicalization as the leaf entry, and the
    census restated from the shared messy-URL fragment."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                c = parse_sitemap_bundle(synth_sitemap_bundle(d))
                row = {"doc_id": d}
                row.update({k: (c.get(k) if c else None) for k in _BUNDLE_COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + _BUNDLE_COLS)

    schema = (
        "doc_id bigint, n_children int, n_resolved int, n_urls int, "
        "n_lastmod int, n_canonical int, first_child string, "
        "first_url string, first_url_canon string"
    )
    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=schema)
        .orderBy("doc_id")
    )


def _sitemap_bundle_oracle() -> str:
    from danae_spark.operators.urlops import messy_url_sql_exprs

    u0 = messy_url_sql_exprs("doc_id * 32")  # child k=0 -> e=4d, entry 0
    return f"""
WITH g AS (
  SELECT doc_id, CAST(1 + doc_id % 3 AS INT) AS nk FROM documents
),
kid AS (
  SELECT g.doc_id, k.k, (g.doc_id * 4 + k.k) AS e
  FROM g, generate_series(0, 2) k(k) WHERE k.k < g.nk
),
u AS (
  SELECT kid.doc_id, kid.e, i.i, (kid.e + i.i) % 7 = 5 AS bad
  FROM kid, generate_series(0, 6) i(i)
  WHERE i.i < 2 + kid.e % 5
),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS INT) AS n_urls,
         CAST(count(*) FILTER (WHERE i % 2 = 0) AS INT) AS n_lastmod,
         CAST(count(*) FILTER (WHERE NOT bad) AS INT) AS n_canonical
  FROM u GROUP BY doc_id
)
SELECT g.doc_id,
       CAST(g.nk + CASE WHEN g.doc_id % 5 = 2 THEN 1 ELSE 0 END AS INT)
         AS n_children,
       g.nk AS n_resolved,
       a.n_urls, a.n_lastmod, a.n_canonical,
       'c0.xml' || CASE WHEN g.doc_id % 4 = 1 THEN '' ELSE '.gz' END
         AS first_child,
       CASE WHEN (g.doc_id * 4) % 7 = 5 THEN 'ftp://bad0.example/x'
            ELSE {u0["raw"]} END AS first_url,
       CASE WHEN (g.doc_id * 4) % 7 = 5 THEN NULL
            ELSE {u0["canon"]} END AS first_url_canon
FROM g JOIN agg a USING (doc_id)
ORDER BY g.doc_id
"""


SITEMAP_BUNDLE_ORACLE = _sitemap_bundle_oracle()
