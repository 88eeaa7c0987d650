"""Pipeline orchestration: materialization, resume-by-skip, DAG checks."""

from __future__ import annotations

import pytest

from danae_spark.pipeline import Pipeline, ingest_pipeline


def test_ingest_pipeline_runs_and_resumes(spark, sf_dir, tmp_path):
    p = ingest_pipeline(str(tmp_path / "ws"))
    r1 = p.run(spark, sf_dir)
    assert [s.status for s in r1] == ["computed"] * len(r1)
    names = [s.name for s in r1]
    assert names[0] == "catalog" and names[-1] == "dataset_search"

    # resume: everything already materialized → all skipped
    r2 = p.run(spark, sf_dir)
    assert [s.status for s in r2] == ["skipped"] * len(r2)

    # outputs are readable parquet with expected shapes
    final = spark.read.parquet(r1[-1].path)
    assert final.count() > 0
    assert {"q_table", "cand_table", "overall_score", "rank"} <= set(final.columns)


def test_force_recompute(spark, sf_dir, tmp_path):
    p = Pipeline(str(tmp_path / "ws2"))
    p.add("catalog", lambda s, d, i: __import__("danae_spark.catalog", fromlist=["c"]).catalog_datasets(s, d))
    p.run(spark, sf_dir)
    r = p.run(spark, sf_dir, force=True)
    assert r[0].status == "computed"


def test_dag_validation(tmp_path):
    p = Pipeline(str(tmp_path / "ws3"))
    p.add("a", lambda s, d, i: None)
    with pytest.raises(ValueError):
        p.add("a", lambda s, d, i: None)
    with pytest.raises(ValueError):
        p.add("b", lambda s, d, i: None, deps=("missing",))
