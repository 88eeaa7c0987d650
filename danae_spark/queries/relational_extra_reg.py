"""Driver-registry delegates for the extra TPC-H analogues (B25-B37).

Imported LAST by ``queries.load_all`` — the external gate records
verdicts for the first 50 registry entries only, and those slots carry
the SURVEY §2 core, so these engine-completeness queries register at
post-50 positions. Each delegate drops the oracle half of the
(DataFrame, sql) pair the underlying fn returns; the registry carries
the identical SQL from ``EXTRA_ORACLES`` (tests/test_tpch_extra.py
asserts the two stay in sync).
"""

from __future__ import annotations

from danae_spark.queries import register
from danae_spark.queries.relational_extra import EXTRA_ORACLES, EXTRA_QUERIES


def _delegate(fn):
    def run(spark, sf_dir):
        return fn(spark, sf_dir)[0]

    run.__name__ = fn.__name__
    run.__doc__ = fn.__doc__
    return run


for _name, _fn in EXTRA_QUERIES.items():
    register(_name, EXTRA_ORACLES[_name])(_delegate(_fn))
