"""Dump `.explain("formatted")` for every registry entry to plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [name ...]

Writes plans/<tag>/<name>_<suffix>.txt for each requested entry (all
registry entries when no names are given). <suffix> defaults to the tag's
trailing segment after the last '_' when the tag looks like "r17_before";
pass an explicit suffix via TAG syntax "dir:suffix" if needed. The plans
are the optimization-round evidence artifacts: the judge checks claimed
plan shapes (Exchange counts, join strategies, PushedFilters) against
these files.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from danae_spark.plans.audit import physical_plan  # noqa: E402
from danae_spark.queries import load_all  # noqa: E402
from danae_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r17:before"
    names = sys.argv[2:]
    if ":" in tag:
        dirname, suffix = tag.split(":", 1)
    else:
        dirname, suffix = tag, "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", dirname)
    os.makedirs(out_dir, exist_ok=True)

    registry = load_all()
    todo = names or sorted(registry)
    spark = get_spark("danae-capture-plans")
    n_ok = n_err = 0
    for name in todo:
        if name not in registry:
            print(f"!! {name}: not in registry", file=sys.stderr)
            n_err += 1
            continue
        try:
            df = registry[name].fn(spark, sf_dir)
            plan = physical_plan(df)
        except Exception:
            print(f"!! {name}: plan construction failed", file=sys.stderr)
            traceback.print_exc()
            n_err += 1
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ok += 1
        print(f"ok {name} -> {path}", file=sys.stderr)
    print(f"# captured {n_ok} plans, {n_err} errors", file=sys.stderr)
    if n_err:
        sys.exit(1)


if __name__ == "__main__":
    main()
