"""RSS / Atom feed extraction — the push-side text source a crawl
ingests alongside pages: feed items carry exactly the title/summary
prose an LLM corpus wants, already boilerplate-free.

Strict walk of the two feed grammars via the engine's shared
quote-aware tag scanner (htmltext._scan_tag):

  - RSS 2.0 / 0.9x: `<rss version=...><channel>` with channel-level
    title / link / description, then `<item>` children each carrying
    title (required), link, description, pubDate; unknown elements
    skipped (forward compat — real feeds are full of namespaced
    extensions, whose children are skipped as subtrees). The version
    attribute is not load-bearing: 0.91/0.92 feeds share the grammar.
  - RSS 1.0 (RDF): `<rdf:RDF>` root with a `<channel>` (title / link /
    description) and `<item>` elements as ROOT-LEVEL SIBLINGS of the
    channel (the structural difference from 2.0); rdf:about
    attributes and the channel's rdf:Seq table of contents are
    skipped as unknown subtrees.
  - Atom (RFC 4287): `<feed>` with feed-level title, `<link href>`
    (attribute, not text), `<entry>` children each carrying title
    (required), link href, content and/or summary — `<content>`
    OUTRANKS `<summary>` for harvested text (content is the full
    prose; summary its abbreviation).
  - XML entities decode in all text (`&amp;` is mandatory in XML);
    CDATA sections in item text decode verbatim (descriptions
    commonly ship as CDATA-wrapped HTML snippets — kept as text,
    the HTML extractor is one call away).

The harvest contract: `text` is every item's title and description/
summary in document order, newline-joined — the column the curation
stack consumes.

Reject-whole (return None): undecodable UTF-8, wrong root, an
item/entry without a title, malformed nesting, trailing content —
feeds are machine-generated; a malformed one signals a broken
generator.

Reference parity note: the reference (smartdatalake/danae) has no
feed ingestion; this is mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

__all__ = [
    "parse_feed",
    "synth_feed",
    "feed_extract_frame",
    "feed_extract_roundtrip",
    "FEED_ORACLE",
]

_RSS_ITEM_FIELDS = frozenset(("title", "link", "description", "pubdate"))
_RDF_ITEM_FIELDS = frozenset(("title", "link", "description"))
_ATOM_ENTRY_FIELDS = frozenset(("title", "link", "summary", "content"))


def _walk_feed(text: str) -> dict | None:
    from danae_spark.multimodal.htmltext import _decode_entities, _scan_tag

    n = len(text)
    pos = 0
    kind: str | None = None
    feed_title: str | None = None
    items: list[dict] = []
    # stack of element names from the root down
    stack: list[str] = []
    cur_item: dict | None = None
    buf: list[str] = []
    capturing = False  # collecting text for the innermost known field
    skip_depth = 0  # inside an unknown subtree

    def known_field(name: str) -> bool:
        if kind == "rss":
            if len(stack) == 2 and cur_item is None:
                return name in ("title", "link", "description")
            if len(stack) == 3 and cur_item is not None:
                return name in _RSS_ITEM_FIELDS
        elif kind == "rdf":
            if len(stack) == 2 and cur_item is None and stack[-1] == "channel":
                return name in ("title", "link", "description")
            if len(stack) == 2 and cur_item is not None:
                return name in _RDF_ITEM_FIELDS
        else:
            if len(stack) == 1 and cur_item is None:
                return name == "title"
            if len(stack) == 2 and cur_item is not None:
                return name in _ATOM_ENTRY_FIELDS
        return False

    while pos < n:
        lt = text.find("<", pos)
        if lt == -1:
            if text[pos:].strip():
                return None
            break
        chunk = text[pos:lt]
        if capturing:
            buf.append(chunk)
        elif chunk.strip() and skip_depth == 0:
            return None  # stray text between structural elements
        pos = lt
        if text.startswith("<!--", pos):
            end = text.find("-->", pos + 4)
            if end == -1:
                return None
            pos = end + 3
            continue
        if text.startswith("<![CDATA[", pos):
            end = text.find("]]>", pos + 9)
            if end == -1:
                return None
            if capturing:
                buf.append(text[pos + 9 : end])
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
        name, is_close, self_closing, attrs, pos = tag

        if skip_depth > 0:
            if not is_close and not self_closing:
                skip_depth += 1
            elif is_close:
                skip_depth -= 1
            continue

        if not is_close:
            if kind is None:
                if name == "rss":
                    kind = "rss"
                elif name == "feed":
                    kind = "atom"
                elif name == "rdf:rdf":
                    kind = "rdf"  # RSS 1.0: items are root-level siblings
                else:
                    return None
                stack.append(name)
                continue
            if not stack:
                return None  # content after the root closed
            if kind == "rss" and len(stack) == 1:
                if name != "channel":
                    return None
                stack.append(name)
                continue
            if kind == "rdf" and len(stack) == 1 and name == "channel":
                stack.append(name)
                continue
            item_tag = "entry" if kind == "atom" else "item"
            at_item_level = len(stack) == (2 if kind == "rss" else 1)
            if at_item_level and name == item_tag:
                cur_item = {}
                stack.append(name)
                continue
            if known_field(name):
                if kind == "atom" and name == "link":
                    # Atom link is an attribute; the element is empty
                    href = _decode_entities(attrs.get("href", ""))
                    if cur_item is not None:
                        cur_item.setdefault("link", href)
                    if not self_closing:
                        stack.append(name)
                        capturing = True
                        buf = []
                    continue
                if self_closing:
                    target = cur_item if cur_item is not None else None
                    if target is not None:
                        target.setdefault(name, "")
                    elif name == "title" and feed_title is None:
                        feed_title = ""
                    continue
                stack.append(name)
                capturing = True
                buf = []
                continue
            # unknown element: skip its whole subtree
            if not self_closing:
                skip_depth = 1
            continue

        # close tag
        if capturing and stack and stack[-1] == name:
            value = _decode_entities("".join(buf).strip())
            stack.pop()
            capturing = False
            if kind == "atom" and name == "link":
                pass  # href already taken from the attribute
            elif cur_item is not None:
                cur_item.setdefault(name, value)
            elif name == "title" and feed_title is None:
                feed_title = value
            continue
        if capturing:
            return None  # a mismatched close tag inside captured text
        if not stack or stack[-1] != name:
            return None
        stack.pop()
        if name in ("item", "entry"):
            if cur_item is None or not cur_item.get("title"):
                return None  # item without a title
            items.append(cur_item)
            cur_item = None
    if stack or kind is None:
        return None
    return {"kind": kind, "feed_title": feed_title or "", "items": items}


def parse_feed(payload: bytes) -> dict | None:
    """Parse an RSS 2.0 or Atom feed into one census row:

      kind ('rss' | 'atom'), feed_title, n_items, n_links,
      first_item_title, text (every item's title + description/summary
      in order, newline-joined), n_chars, n_words
    """
    try:
        text = payload.decode("utf-8")
    except (UnicodeDecodeError, AttributeError):
        return None
    got = _walk_feed(text)
    if got is None:
        return None
    lines: list[str] = []
    n_links = 0
    for it in got["items"]:
        lines.append(it["title"])
        # rss/rdf carry description; Atom's <content> outranks <summary>
        body = it.get("description") or it.get("content") or it.get("summary")
        if body:
            lines.append(body)
        if it.get("link"):
            n_links += 1
    full = "\n".join(lines)
    return {
        "kind": got["kind"],
        "feed_title": got["feed_title"],
        "n_items": len(got["items"]),
        "n_links": n_links,
        "first_item_title": got["items"][0]["title"] if got["items"] else None,
        "text": full,
        "n_chars": len(full),
        "n_words": len(full.split()),
    }


# ------------------------------------------------------------- synthesis


def feed_n_items(d: int) -> int:
    return 2 + d % 4


def item_title(d: int, i: int) -> str:
    return " ".join(f"f{(d * 5 + i * 3 + j) % 60}" for j in range(2 + (d + i) % 2))


def item_body(d: int, i: int) -> str | None:
    if i % 2 == 0:
        return f"desc d{(d + i) % 9} & more"  # '&' round-trips via &amp;/CDATA
    return None


def synth_feed(doc_id: int) -> bytes:
    """Doc-deterministic feed over one shared item arithmetic:

      d % 4 == 0 -> RSS 2.0 (descriptions alternate plain-escaped and
                    CDATA); version "0.91" on d % 8 == 0 — same
                    grammar, certifying the 0.9x family
      d % 4 == 2 -> RSS 1.0 (RDF): channel AND items as root-level
                    siblings, rdf:about attributes, the channel's
                    rdf:Seq table of contents skipped as a subtree
      d % 2 == 1 -> Atom (attribute links, a namespaced unknown
                    extension subtree); bodies ship as <summary> on
                    i % 4 == 0 and as <content> PLUS A DECOY
                    <summary> otherwise — the decoy never reaches the
                    extracted text, value-certifying the
                    content-over-summary precedence

    All three branches emit the same titles/bodies, so the oracle's
    text arithmetic is shared and only `kind` varies."""
    d = doc_id
    out = ['<?xml version="1.0" encoding="UTF-8"?>']
    if d % 4 == 0:
        ver = "0.91" if d % 8 == 0 else "2.0"
        out.append(f'<rss version="{ver}">')
        out.append("  <channel>")
        out.append(f"    <title>Feed {d} c{d % 8}</title>")
        out.append(f"    <link>https://site{d % 5}.example/</link>")
        out.append("    <description>synth channel</description>")
        for i in range(feed_n_items(d)):
            out.append("    <item>")
            out.append(f"      <title>{item_title(d, i)}</title>")
            out.append(f"      <link>https://site{d % 5}.example/a{i}</link>")
            body = item_body(d, i)
            if body is not None:
                if i % 4 == 0:
                    out.append(f"      <description><![CDATA[{body}]]></description>")
                else:
                    out.append(
                        "      <description>"
                        + body.replace("&", "&amp;")
                        + "</description>"
                    )
            out.append("      <pubDate>Fri, 15 Aug 2026 00:00:00 GMT</pubDate>")
            out.append("    </item>")
        out.append("  </channel>")
        out.append("</rss>")
    elif d % 4 == 2:
        out.append(
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns="http://purl.org/rss/1.0/">'
        )
        out.append(f'  <channel rdf:about="https://site{d % 5}.example/">')
        out.append(f"    <title>Feed {d} c{d % 8}</title>")
        out.append(f"    <link>https://site{d % 5}.example/</link>")
        out.append("    <description>synth channel</description>")
        out.append("    <items><rdf:Seq><rdf:li resource=\"x\"/></rdf:Seq></items>")
        out.append("  </channel>")
        for i in range(feed_n_items(d)):
            out.append(f'  <item rdf:about="https://site{d % 5}.example/a{i}">')
            out.append(f"    <title>{item_title(d, i)}</title>")
            out.append(f"    <link>https://site{d % 5}.example/a{i}</link>")
            body = item_body(d, i)
            if body is not None:
                out.append(
                    "    <description>"
                    + body.replace("&", "&amp;")
                    + "</description>"
                )
            out.append("  </item>")
        out.append("</rdf:RDF>")
    else:
        out.append('<feed xmlns="http://www.w3.org/2005/Atom">')
        out.append(f"  <title>Feed {d} c{d % 8}</title>")
        out.append('  <unknown:ext attr="x"><nested>skipped</nested></unknown:ext>')
        for i in range(feed_n_items(d)):
            out.append("  <entry>")
            out.append(f"    <title>{item_title(d, i)}</title>")
            out.append(f'    <link href="https://site{d % 5}.example/a{i}"/>')
            body = item_body(d, i)
            if body is not None:
                if i % 4 == 0:
                    out.append(
                        "    <summary>" + body.replace("&", "&amp;") + "</summary>"
                    )
                else:
                    out.append(
                        "    <content>" + body.replace("&", "&amp;") + "</content>"
                    )
                    out.append(f"    <summary>decoy s{i} must not appear</summary>")
            out.append("  </entry>")
        out.append("</feed>")
    return "\n".join(out).encode("utf-8")


# ----------------------------------------------------- Spark entry points

_COLS = [
    "kind",
    "feed_title",
    "n_items",
    "n_links",
    "first_item_title",
    "text",
    "n_chars",
    "n_words",
]

_SCHEMA = (
    "doc_id bigint, kind string, feed_title string, n_items int, n_links int, "
    "first_item_title string, text string, n_chars int, n_words int"
)


def feed_extract_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Feed extraction over any (id, binary) frame; nulls for payloads
    outside the two grammars. `text` feeds the curation stack."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                c = parse_feed(bytes(payload)) if payload is not None else None
                row = {id_col: rid}
                row.update({k: (c.get(k) if c else None) for k in _COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=[id_col] + _COLS)

    return df.mapInPandas(batches, schema=_SCHEMA.replace("doc_id", id_col, 1))


def feed_extract_roundtrip(spark, sf_dir: str):
    """Oracle-checkable feed extraction: per doc a real RSS or Atom
    feed (CDATA and escaped descriptions, attribute links, a
    namespaced unknown subtree) is walked by the shared scanner, and
    the extracted item text restated in SQL."""
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
                c = parse_feed(synth_feed(d))
                row = {"doc_id": d}
                row.update({k: (c.get(k) if c else None) for k in _COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + _COLS)

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=_SCHEMA)
        .orderBy("doc_id")
    )


FEED_ORACLE = """
WITH g AS (
  SELECT doc_id, CAST(2 + doc_id % 4 AS INT) AS n_items FROM documents
),
w AS (
  SELECT g.doc_id, i.i, j.j,
         'f' || CAST((g.doc_id * 5 + i.i * 3 + j.j) % 60 AS VARCHAR) AS word
  FROM g, generate_series(0, 5) i(i), generate_series(0, 2) j(j)
  WHERE i.i < g.n_items AND j.j < 2 + (g.doc_id + i.i) % 2
),
titles AS (
  SELECT doc_id, i, string_agg(word, ' ' ORDER BY j) AS title
  FROM w GROUP BY doc_id, i
),
lines AS (
  SELECT doc_id, i, 0 AS sub, title AS line FROM titles
  UNION ALL
  SELECT doc_id, i.i, 1,
         'desc d' || CAST((g.doc_id + i.i) % 9 AS VARCHAR) || ' & more'
  FROM g, generate_series(0, 5) i(i)
  WHERE i.i < g.n_items AND i.i % 2 = 0
),
doc_text AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY i, sub) AS text
  FROM lines GROUP BY doc_id
)
SELECT g.doc_id,
       CASE WHEN g.doc_id % 4 = 0 THEN 'rss'
            WHEN g.doc_id % 4 = 2 THEN 'rdf'
            ELSE 'atom' END AS kind,
       'Feed ' || CAST(g.doc_id AS VARCHAR) || ' c'
         || CAST(g.doc_id % 8 AS VARCHAR) AS feed_title,
       g.n_items,
       g.n_items AS n_links,
       t0.title AS first_item_title,
       dt.text,
       CAST(length(dt.text) AS INT) AS n_chars,
       CAST(length(dt.text)
            - length(replace(replace(dt.text, chr(10), ' '), ' ', ''))
            + 1 AS INT) AS n_words
FROM g
JOIN doc_text dt USING (doc_id)
JOIN titles t0 ON t0.doc_id = g.doc_id AND t0.i = 0
ORDER BY g.doc_id
"""
