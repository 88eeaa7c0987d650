"""Ship the danae_spark package to Spark Python workers.

Operators that use Arrow-batched pandas UDFs (`applyInPandas` /
`mapInPandas`) close over functions defined in this package; cloudpickle
serializes those by module reference, so the worker processes must be
able to import `danae_spark` regardless of their working directory. On a
real cluster you'd `--py-files` the wheel; here we zip the package once
per session and `addPyFile` it — the same mechanism, self-contained.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, "_danae_spark_shipped", False):
        return
    zip_path = os.path.join(
        tempfile.gettempdir(), f"danae_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(_PKG_DIR):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(
                        "danae_spark", os.path.relpath(full, _PKG_DIR)
                    )
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    sc._danae_spark_shipped = True
