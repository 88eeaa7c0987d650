"""Crawl-frontier plan — the three compliance legs composed into the
decision a polite crawler actually executes per URL:

    sitemap walk (operators/sitemap.py, the real XML walker)
      -> URL canonicalization (operators/urlops.canonicalize_url)
      -> robots evaluation (operators/robots.robots_allowed, RFC 9309
         longest-match / allow-wins-ties / fail-closed)
      -> enqueue verdict + crawl-delay budget

Each stage is the SAME function its registered unit entry certifies
(C68 robots_check, C69 url_canonicalize, C71 sitemap_extract), and the
composition's oracle restates the verdicts as doc arithmetic — so a
drift in any leg breaks BOTH its unit entry and this plan.

Per synth site: a robots.txt with a Disallow + longer Allow carve-out
(+ a wildcard-$ pdf rule on d % 6 == 3) and a urlset whose paths cycle
the four interesting shapes — carve-out hit (allowed), disallowed
prefix, pdf (allowed unless the $-rule site), and no-rule-match
(allowed). Locs arrive MESSY (scheme case, default :443 port) so the
canonicalizer has real work; an uncanonicalizable ftp loc (d % 7 == 2)
yields a NULL-verdict row — a frontier must surface what it cannot
enqueue, never silently drop it.

Reference parity note: the reference (smartdatalake/danae) has no
crawl frontier; this is mandated LLM-pipeline extension surface (the
composition capstone of the r10 frontier stack).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

__all__ = [
    "synth_frontier_sitemap",
    "frontier_plan_rows",
    "frontier_plan_roundtrip",
    "FRONTIER_PLAN_ORACLE",
]


def frontier_n_locs(d: int) -> int:
    return 3 + d % 4


def frontier_path(d: int, i: int) -> str:
    k = i % 4
    if k == 0:
        return f"/private{d % 3}/public/page{i}"  # allow carve-out wins
    if k == 1:
        return f"/private{d % 3}/x{i}"  # disallowed prefix
    if k == 2:
        return f"/doc{i}.pdf"  # hits the $-rule only on d % 6 == 3
    return f"/open/{i}"  # no rule matches -> allowed


def frontier_loc(d: int, i: int) -> str:
    if i == 1 and d % 7 == 2:
        return f"ftp://bad{d % 5}.example/x"  # uncanonicalizable
    scheme = "HTTPS" if i % 2 == 1 else "https"
    port = ":443" if i % 3 == 0 else ""
    return f"{scheme}://Site{d % 5}.EXAMPLE{port}{frontier_path(d, i)}"


def synth_frontier_sitemap(d: int) -> bytes:
    from danae_spark.operators.sitemap import _xml_escape

    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for i in range(frontier_n_locs(d)):
        out.append(f"  <url><loc>{_xml_escape(frontier_loc(d, i))}</loc></url>")
    out.append("</urlset>")
    return "\n".join(out).encode("utf-8")


def frontier_plan_rows(d: int, agent: str = "danaebot") -> list[dict]:
    """The per-site frontier plan: walk the sitemap, canonicalize each
    loc, evaluate robots for `agent` on its path, decide enqueue.
    Uncanonicalizable locs yield NULL path/allowed and enqueue=0."""
    from danae_spark.operators.robots import parse_robots, robots_allowed, synth_robots
    from danae_spark.operators.sitemap import _load_entries
    from danae_spark.operators.urlops import canonicalize_url

    robots = parse_robots(synth_robots(d))
    got = _load_entries(synth_frontier_sitemap(d))
    if robots is None or got is None or got[0] != "urlset":
        return []
    rows = []
    for i, e in enumerate(got[1]):
        canon = canonicalize_url(e["loc"])
        if canon is None:
            rows.append(
                {
                    "doc_id": d,
                    "loc_ix": i,
                    "url_canon": None,
                    "path": None,
                    "allowed": None,
                    "crawl_delay": None,
                    "enqueue": 0,
                }
            )
            continue
        after = canon.split("://", 1)[1]
        path = after[after.find("/") :]
        allowed, delay = robots_allowed(robots, agent, path)
        rows.append(
            {
                "doc_id": d,
                "loc_ix": i,
                "url_canon": canon,
                "path": path,
                "allowed": bool(allowed),
                "crawl_delay": delay,
                "enqueue": int(allowed),
            }
        )
    return rows


def frontier_plan_roundtrip(spark, sf_dir: str):
    """Oracle-checkable frontier plan: per doc a robots.txt AND a
    messy-loc urlset are synthesized, the three certified frontier
    operators compose into per-URL enqueue decisions, and every
    verdict + canonical string restates as doc arithmetic."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    cols = ["doc_id", "loc_ix", "url_canon", "path", "allowed", "crawl_delay", "enqueue"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                rows.extend(frontier_plan_rows(int(doc_id)))
            yield pd.DataFrame(rows, columns=cols)

    schema = (
        "doc_id bigint, loc_ix int, url_canon string, path string, "
        "allowed boolean, crawl_delay int, enqueue int"
    )
    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=schema)
        .orderBy("doc_id", "loc_ix")
    )


FRONTIER_PLAN_ORACLE = """
WITH g AS (
  SELECT doc_id, CAST(3 + doc_id % 4 AS INT) AS n_locs FROM documents
),
loc AS (
  SELECT g.doc_id, i.i,
         i.i = 1 AND g.doc_id % 7 = 2 AS bad,
         CASE i.i % 4
           WHEN 0 THEN '/private' || CAST(g.doc_id % 3 AS VARCHAR)
                        || '/public/page' || CAST(i.i AS VARCHAR)
           WHEN 1 THEN '/private' || CAST(g.doc_id % 3 AS VARCHAR)
                        || '/x' || CAST(i.i AS VARCHAR)
           WHEN 2 THEN '/doc' || CAST(i.i AS VARCHAR) || '.pdf'
           ELSE '/open/' || CAST(i.i AS VARCHAR)
         END AS path,
         CASE i.i % 4
           WHEN 0 THEN TRUE
           WHEN 1 THEN FALSE
           WHEN 2 THEN g.doc_id % 6 <> 3
           ELSE TRUE
         END AS allowed
  FROM g, generate_series(0, 6) i(i)
  WHERE i.i < g.n_locs
)
SELECT doc_id,
       CAST(i AS INT) AS loc_ix,
       CASE WHEN bad THEN NULL
            ELSE 'https://site' || CAST(doc_id % 5 AS VARCHAR)
                 || '.example' || path END AS url_canon,
       CASE WHEN bad THEN NULL ELSE path END AS path,
       CASE WHEN bad THEN NULL ELSE allowed END AS allowed,
       CASE WHEN bad THEN NULL ELSE CAST(1 + doc_id % 5 AS INT) END
         AS crawl_delay,
       CAST(CASE WHEN bad THEN 0 WHEN allowed THEN 1 ELSE 0 END AS INT)
         AS enqueue
FROM loc
ORDER BY doc_id, loc_ix
"""
