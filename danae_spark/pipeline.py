"""Declarative pipeline orchestration.

The reference's ingestion is a chain of polling workers flipping status
flags in Elasticsearch (`publish → profile(pending→done) →
tfidf(pending→done) → index → serve`, see ingest/profiling/profiler.py's
while-loop). Spark-first replacement: a small DAG runner where each step
is a DataFrame-producing function, results materialize to parquet in a
workspace, and completed steps are skipped on re-run — so a failed or
incremental run resumes from the last materialized stage instead of
re-polling. This is the "orchestration layer" around the engine's
operators; at 100 TB each materialization is a partitioned parquet
dataset and steps parallelize across the cluster like any other job.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

StepFn = Callable[[SparkSession, str, dict[str, DataFrame]], DataFrame]


@dataclass(frozen=True)
class Step:
    name: str
    fn: StepFn
    deps: tuple[str, ...] = ()


@dataclass
class StepResult:
    name: str
    status: str  # "computed" | "skipped"
    seconds: float
    path: str


@dataclass
class Pipeline:
    workspace: str
    steps: list[Step] = field(default_factory=list)

    def add(self, name: str, fn: StepFn, deps: Sequence[str] = ()) -> "Pipeline":
        if any(s.name == name for s in self.steps):
            raise ValueError(f"duplicate step {name!r}")
        known = {s.name for s in self.steps}
        missing = set(deps) - known
        if missing:
            raise ValueError(f"step {name!r} depends on unknown steps {sorted(missing)}")
        self.steps.append(Step(name, fn, tuple(deps)))
        return self

    def _path(self, name: str) -> str:
        return os.path.join(self.workspace, name)

    def _done(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def run(
        self, spark: SparkSession, sf_dir: str, force: bool = False
    ) -> list[StepResult]:
        """Execute steps in insertion order (which must be topological —
        `add` enforces deps-before-use). Materialized steps are skipped
        unless `force`."""
        os.makedirs(self.workspace, exist_ok=True)
        results: list[StepResult] = []
        outputs: dict[str, DataFrame] = {}
        for step in self.steps:
            path = self._path(step.name)
            t0 = time.time()
            if not force and self._done(step.name):
                outputs[step.name] = spark.read.parquet(path)
                results.append(StepResult(step.name, "skipped", 0.0, path))
                continue
            inputs = {d: outputs[d] for d in step.deps}
            df = step.fn(spark, sf_dir, inputs)
            df.write.mode("overwrite").parquet(path)
            outputs[step.name] = spark.read.parquet(path)
            results.append(
                StepResult(step.name, "computed", round(time.time() - t0, 3), path)
            )
        return results


def ingest_pipeline(workspace: str) -> Pipeline:
    """The danae ingestion/search flow as a resumable DAG:
    catalog → profiles → term extraction → column similarities →
    dataset matching → combined dataset search."""
    from danae_spark import catalog as cat
    from danae_spark.profiling import profiler, tfidf
    from danae_spark.search import engine, knn, matching

    p = Pipeline(workspace)
    p.add("catalog", lambda s, d, i: cat.catalog_datasets(s, d))
    p.add("profiles", lambda s, d, i: profiler.numeric_profile(s, d))
    p.add("signatures", lambda s, d, i: profiler.signature_profile(s, d))
    p.add("column_terms", lambda s, d, i: tfidf.categorical_topk(s, d))
    p.add(
        "column_similarity",
        lambda s, d, i: knn.content_similarity(s, d),
        deps=("signatures",),
    )
    p.add(
        "matching_scores",
        lambda s, d, i: matching.dataset_matching_scores(s, d),
        deps=("column_similarity",),
    )
    p.add(
        "dataset_search",
        lambda s, d, i: engine.dataset_search(s, d),
        deps=("matching_scores",),
    )
    return p
