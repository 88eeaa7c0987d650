"""Profile one or more registry queries: wall time (count + noop tracks,
min-of-2), Spark job count, and the FINAL executed plan (AQE, with
ReusedExchange/AQEShuffleRead visible — the initial explain hides both).

Usage: python tools/profile_query.py <name> [name ...]
       SPARK_GRAFT_SF_DIR picks the lake (default /root/testdata/sf0.1).

Writes nothing to the repo; prints to stdout. Use during optimization to
see where a query's time actually goes before/after a change.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from danae_spark.queries import load_all  # noqa: E402
from danae_spark.session import get_spark  # noqa: E402


def final_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_query.py <name> [name ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = get_spark("danae-profile")
    sc = spark.sparkContext
    # warmups (mirror bench.py)
    spark.range(1000).count()
    try:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _warm(s):
            return s

        spark.range(64).repartition(32).select(_warm("id")).count()
        from danae_spark.shipping import ensure_shipped

        ensure_shipped(spark)

        def _preimport(it):
            import danae_spark.multimodal.pixels  # noqa: F401
            import danae_spark.multimodal.triage  # noqa: F401
            import danae_spark.operators.dedup  # noqa: F401
            import danae_spark.operators.textstats  # noqa: F401

            yield from it

        spark.range(64).repartition(32).mapInPandas(
            _preimport, schema="id long"
        ).count()
    except Exception:
        pass

    for name in names:
        fn = registry[name].fn
        tracker = sc.statusTracker()
        # --- count track (min of 2)
        best_c = None
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            el = time.time() - t0
            best_c = el if best_c is None else min(best_c, el)
        # --- noop track (min of 2), capture job ids around the last run
        best_m = None
        for i in range(2):
            jobs_before = len(tracker.getJobIdsForGroup(None) or [])
            # time construction + write together: operators with eager
            # internal actions (localCheckpoint, codebook collects) do
            # real work during fn()
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            best_m = el if best_m is None else min(best_m, el)
        print(f"\n===== {name}: rows={n} count={best_c:.3f}s noop={best_m:.3f}s")
        # execute THIS df's own QueryExecution so its AdaptiveSparkPlan
        # reaches isFinalPlan=true — count()/noop-write each wrap a fresh
        # QueryExecution, whose final plan (exchange reuse, AQE coalesce)
        # is invisible from here
        qe = df._jdf.queryExecution()
        qe.toRdd().count()
        plan = final_plan(df)
        import re

        for pat in (
            r"\bExchange ", "ReusedExchange", "AQEShuffleRead", "Scan parquet",
            "InMemoryTableScan", "MapInPandas", "ArrowEvalPython",
            "BatchEvalPython", "SortMergeJoin", "BroadcastHashJoin",
            "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct",
        ):
            c = len(re.findall(pat, plan))
            if c:
                print(f"  {pat.strip()}: {c}")
        if "--plan" in os.environ.get("PROFILE_FLAGS", ""):
            print(plan)


if __name__ == "__main__":
    main()
