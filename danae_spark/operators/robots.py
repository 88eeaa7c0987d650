"""robots.txt parsing + evaluation (RFC 9309) — the compliance gate a
crawl pipeline applies before any page enters the corpus.

Implemented from the spec:

  - Grammar: `field: value` lines, `#` comments (inline and
    whole-line), blank-line-insensitive grouping — consecutive
    `User-agent` lines share the following rule block; `Allow` /
    `Disallow` / `Crawl-delay` attach to the current group;
    `Sitemap` is group-independent. Unknown fields are skipped
    (forward compat); a rule line BEFORE any User-agent line rejects
    the file (it belongs to no group).
  - Group selection: the group whose User-agent token is the LONGEST
    case-insensitive prefix of the product token wins; `*` matches
    any agent and loses to every specific match (RFC 9309 §2.2.1).
  - Rule evaluation: the longest-match rule wins; on a length tie,
    Allow beats Disallow (§2.2.2). Patterns support `*` (any char
    run) and a trailing `$` (end anchor). An empty Disallow value
    matches nothing (allow-all). No matching rule -> allowed.
  - Percent-encoding: rule paths and probe paths compare after
    uppercasing escape hex (the octet semantics are the caller's
    canonicalizer's job — see urlops.canonicalize_url).

Reject-whole (return None): undecodable UTF-8, a field line without
':', or a rule before any group — a robots file that cannot be read
deterministically must fail CLOSED at the pipeline layer, not default
to crawl-everything.

Reference parity note: the reference (smartdatalake/danae) has no
crawl compliance; this is mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

__all__ = [
    "parse_robots",
    "robots_allowed",
    "synth_robots",
    "probe_path",
    "expected_allowed",
    "robots_check_frame",
    "robots_check_roundtrip",
    "ROBOTS_CHECK_ORACLE",
]


def parse_robots(payload: bytes) -> dict | None:
    """Parse a robots.txt into {'groups': [(agents, rules)],
    'sitemaps': [...], } where rules are (is_allow, pattern) in file
    order. None on the reject conditions above."""
    try:
        text = payload.decode("utf-8")
    except (UnicodeDecodeError, AttributeError):
        return None
    groups: list[tuple[list[str], list[tuple[bool, str]], int | None]] = []
    sitemaps: list[str] = []
    cur_agents: list[str] | None = None
    cur_rules: list[tuple[bool, str]] = []
    cur_delay: int | None = None
    agents_open = False  # consecutive User-agent lines accumulate

    def close_group() -> None:
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents is not None:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = None, [], None

    for raw in text.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if ":" not in line:
            return None
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not agents_open:
                close_group()
                cur_agents = []
            agents_open = True
            cur_agents.append(value.lower())
            continue
        agents_open = False
        if field in ("allow", "disallow"):
            if cur_agents is None:
                return None  # rule before any group
            cur_rules.append((field == "allow", value))
        elif field == "crawl-delay":
            if cur_agents is None:
                return None
            if value.isdigit():
                cur_delay = int(value)
        elif field == "sitemap":
            sitemaps.append(value)
        # unknown fields: skipped (forward compat)
    close_group()
    return {"groups": groups, "sitemaps": sitemaps}


def _pattern_matches(pattern: str, path: str) -> int | None:
    """Match an RFC 9309 pattern against a path; returns the pattern's
    specificity (its length) on match, None otherwise. Supports '*'
    and a trailing '$'."""
    if pattern == "":
        return None  # empty Disallow matches nothing
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else re.escape(c) for c in core)
    rx = "^" + rx + ("$" if anchored else "")
    return len(pattern) if re.match(rx, path) else None


def _select_group(robots: dict, agent: str):
    agent = agent.lower()
    star = None
    best = None
    best_len = -1
    for agents, rules, delay in robots["groups"]:
        for a in agents:
            if a == "*":
                if star is None:
                    star = (rules, delay)
            elif agent.startswith(a) and len(a) > best_len:
                best, best_len = (rules, delay), len(a)
    return best if best is not None else star


def robots_allowed(robots: dict, agent: str, path: str) -> tuple[bool, int | None]:
    """Evaluate (allowed, crawl_delay) for agent+path: longest-match
    rule wins, Allow beats Disallow on ties, no match -> allowed."""
    got = _select_group(robots, agent)
    if got is None:
        return True, None
    rules, delay = got
    best_len = -1
    allowed = True
    for is_allow, pattern in rules:
        m = _pattern_matches(pattern, path)
        if m is None:
            continue
        if m > best_len or (m == best_len and is_allow and not allowed):
            best_len = m
            allowed = is_allow
    return allowed, delay


# ------------------------------------------------------------- synthesis


def synth_robots(doc_id: int) -> bytes:
    """Doc-deterministic robots.txt: a '*' group with a Disallow, a
    longer Allow carve-out, a Crawl-delay and (on d % 6 == 3) a
    wildcard-$ rule; a specific-agent group; comments; a Sitemap."""
    d = doc_id
    out = [
        "# synth robots fixture",
        "User-agent: *",
        f"Disallow: /private{d % 3}/",
        f"Allow: /private{d % 3}/public/  # carve-out",
    ]
    if d % 6 == 3:
        out.append("Disallow: /*.pdf$")
    out += [
        f"Crawl-delay: {1 + d % 5}",
        "",
        "User-agent: strictbot",
        "Disallow: /",
        "",
        f"Sitemap: https://site{d % 5}.example/sitemap{d % 4}.xml",
    ]
    return "\n".join(out).encode("utf-8")


def probe_path(doc_id: int) -> str:
    d = doc_id
    if d % 6 == 3:
        return f"/doc{d % 7}.pdf"  # hits the wildcard-$ disallow
    if d % 2 == 0:
        return f"/private{d % 3}/public/page{d % 7}"  # allow carve-out wins
    return f"/private{d % 3}/x{d % 7}"  # disallowed


def expected_allowed(doc_id: int) -> bool:
    return doc_id % 6 != 3 and doc_id % 2 == 0


# ----------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, n_groups int, n_rules int, n_sitemaps int, "
    "crawl_delay int, probe string, allowed boolean, strict_allowed boolean"
)


def robots_check_frame(
    df, id_col: str = "doc_id", payload_col: str = "payload", path_col: str = "path",
    agent: str = "danaebot",
):
    """Robots evaluation over any (id, robots-bytes, probe-path)
    frame; nulls for unreadable robots files (fail CLOSED upstream)."""

    cols = [
        "n_groups", "n_rules", "n_sitemaps", "crawl_delay", "probe",
        "allowed", "strict_allowed",
    ]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload, path in zip(pdf[id_col], pdf[payload_col], pdf[path_col]):
                row = {id_col: rid}
                r = parse_robots(bytes(payload)) if payload is not None else None
                if r is None:
                    row.update({k: None for k in cols})
                else:
                    allowed, delay = robots_allowed(r, agent, str(path))
                    s_allowed, _ = robots_allowed(r, "strictbot", str(path))
                    row.update(
                        {
                            "n_groups": len(r["groups"]),
                            "n_rules": sum(len(g[1]) for g in r["groups"]),
                            "n_sitemaps": len(r["sitemaps"]),
                            "crawl_delay": delay,
                            "probe": str(path),
                            "allowed": allowed,
                            "strict_allowed": s_allowed,
                        }
                    )
                rows.append(row)
            yield pd.DataFrame(rows, columns=[id_col] + cols)

    schema = _SCHEMA.replace("doc_id", id_col, 1)
    return df.mapInPandas(batches, schema=schema)


def robots_check_roundtrip(spark, sf_dir: str):
    """Oracle-checkable robots evaluation: per doc a real robots.txt
    (wildcard-$ rules, carve-outs, comments, a specific-agent group)
    and a probe path are synthesized, parsed and evaluated by the real
    RFC 9309 longest-match logic for BOTH the generic agent (hits the
    '*' group) and 'strictbot' (hits its Disallow-/ group), and every
    field restated in SQL."""
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
                r = parse_robots(synth_robots(d))
                path = probe_path(d)
                allowed, delay = robots_allowed(r, "danaebot", path)
                s_allowed, _ = robots_allowed(r, "strictbot", path)
                rows.append(
                    {
                        "doc_id": d,
                        "n_groups": len(r["groups"]),
                        "n_rules": sum(len(g[1]) for g in r["groups"]),
                        "n_sitemaps": len(r["sitemaps"]),
                        "crawl_delay": delay,
                        "probe": path,
                        "allowed": allowed,
                        "strict_allowed": s_allowed,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_groups", "n_rules", "n_sitemaps",
                    "crawl_delay", "probe", "allowed", "strict_allowed",
                ],
            )

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=_SCHEMA)
        .orderBy("doc_id")
    )


ROBOTS_CHECK_ORACLE = """
SELECT doc_id,
       CAST(2 AS INT) AS n_groups,
       CAST(CASE WHEN doc_id % 6 = 3 THEN 4 ELSE 3 END AS INT) AS n_rules,
       CAST(1 AS INT) AS n_sitemaps,
       CAST(1 + doc_id % 5 AS INT) AS crawl_delay,
       CASE WHEN doc_id % 6 = 3
            THEN '/doc' || CAST(doc_id % 7 AS VARCHAR) || '.pdf'
            WHEN doc_id % 2 = 0
            THEN '/private' || CAST(doc_id % 3 AS VARCHAR) || '/public/page'
                 || CAST(doc_id % 7 AS VARCHAR)
            ELSE '/private' || CAST(doc_id % 3 AS VARCHAR) || '/x'
                 || CAST(doc_id % 7 AS VARCHAR) END AS probe,
       doc_id % 6 <> 3 AND doc_id % 2 = 0 AS allowed,
       FALSE AS strict_allowed
FROM documents
ORDER BY doc_id
"""
