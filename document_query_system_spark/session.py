"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the configs below are the ones that
also matter on a real cluster: AQE (runtime re-plan, skew-join
handling, shuffle coalescing), Arrow for the Pandas-UDF path, UTC
session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "document_query_system_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: match cores, not the 200 default (which creates
        # tiny shuffle files); on a real cluster this is sized to data
        # volume and AQE coalesces down at runtime.
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_worker_imports(spark: SparkSession) -> None:
    """Make this package importable inside executor Python workers.

    UDF-backed queries (mapInPandas / pandas_udf) reference functions
    in this package; cloudpickle serializes module-level functions *by
    reference*, so the worker must be able to ``import
    document_query_system_spark``. The driver process may have been
    started anywhere (the driver contract makes no cwd/PYTHONPATH
    promise), so we ship the package as a zip via ``sc.addPyFile`` —
    the same mechanism used to distribute code to a real cluster.
    Idempotent per SparkContext.
    """
    sc = spark.sparkContext
    if getattr(sc, "_dqs_pyfiles_added", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}-pyfiles.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    arc = os.path.join(
                        pkg_name, os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, arc)
    sc.addPyFile(zpath)
    sc._dqs_pyfiles_added = True
