"""Mechanically derive the repo's gate-count claims (registry entries,
oracle count, pytest suite size) and rewrite the live claim lines in
README.md and SURVEY.md — hand-typed numbers drift (the r16 verdict
caught a 1426-vs-1427 doc drift); derived ones cannot.

Usage:
    python tools/update_counts.py            # derive + rewrite + report
    python tools/update_counts.py --check    # derive + report only
Historical per-round logs (SURVEY §8) are never rewritten — they are
statements about past rounds; only the present-tense claims update.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def registry_counts() -> tuple[int, int]:
    from danae_spark.queries import load_all

    reg = load_all()
    return len(reg), sum(1 for q in reg.values() if q.oracle)


def suite_size() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=ROOT, capture_output=True, text=True, timeout=600,
    )
    m = re.search(r"(\d+) tests? collected", out.stdout)
    if not m:
        raise SystemExit(f"could not parse pytest collection:\n{out.stdout[-500:]}")
    return int(m.group(1))


def rewrite(path: str, subs: list[tuple[str, str]], check: bool) -> list[str]:
    full = os.path.join(ROOT, path)
    text = open(full).read()
    changed = []
    for pattern, repl in subs:
        new, n = re.subn(pattern, repl, text, count=1, flags=re.S)
        if n and new != text:
            changed.append(pattern)
            text = new
    if changed and not check:
        open(full, "w").write(text)
    return changed


def main() -> int:
    check = "--check" in sys.argv
    n_entries, n_oracles = registry_counts()
    n_tests = suite_size()
    print(f"registry: {n_entries} entries / {n_oracles} oracles; "
          f"suite: {n_tests} tests collected")

    readme_subs = [
        (r"`queries\(\)` \(\d+ entries covering",
         f"`queries()` ({n_entries} entries covering"),
        (r"`oracle_sql\(\)` \(\d+ DuckDB equivalents\)",
         f"`oracle_sql()` ({n_oracles} DuckDB equivalents)"),
        (r"pytest suite \(\d+ tests\)", f"pytest suite ({n_tests} tests)"),
    ]
    survey_subs = [
        (r"\*\*\d+\n`queries\(\)` entries, \d+ with oracles\*\*",
         f"**{n_entries}\n`queries()` entries, {n_oracles} with oracles**"),
    ]
    c1 = rewrite("README.md", readme_subs, check)
    c2 = rewrite("SURVEY.md", survey_subs, check)
    verb = "would update" if check else "updated"
    print(f"README.md: {verb} {len(c1)} claim(s); SURVEY.md: {verb} {len(c2)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
