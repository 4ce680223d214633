"""SparkSession factory with engine defaults.

Local-mode testing uses ``local[N]``; the same config block is what we
would ship on a real cluster (AQE on, sane shuffle partitioning,
Arrow-enabled Python interop, UTC session time zone for deterministic
timestamp semantics vs. the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB scale, shuffle partitions should target ~128-200 MB
# post-AQE; AQE coalescing makes the static number a ceiling, so we
# set it near total cores locally and rely on
# spark.sql.adaptive.coalescePartitions for the rest.
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(app_name: str = "tp_integ_data_pipeline_spark", cpus: int | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Runtime bloom-filter semi-join reduction: on a selective join
        # the big side is pre-filtered by a bloom filter built from the
        # small side — at 100 TB this skips whole row groups before the
        # shuffle. Catalyst only injects it where estimated-selective,
        # so locally it is a no-op with zero risk.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as long and convert (sources/fixtures.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if os.environ.get("SPARK_GRAFT_WAREHOUSE"):
        builder = builder.config("spark.sql.warehouse.dir", os.environ["SPARK_GRAFT_WAREHOUSE"])
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on Python WORKERS regardless of the
    driver's cwd/PYTHONPATH.

    cloudpickle serializes module-level functions (mapInPandas stubs,
    applyInPandasWithState handlers, UDTF classes) BY REFERENCE, so the
    worker process must be able to `import tp_integ_data_pipeline_spark`
    itself — which fails when the harness launches from another cwd.
    addPyFile of a package zip puts it on every worker's sys.path.
    """
    if getattr(spark, "_tp_integ_pkg_shipped", False):
        return
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "tp_integ_data_pipeline_spark_pkg.zip"
    )
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    rel = os.path.join(
                        "tp_integ_data_pipeline_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:  # pragma: no cover - e.g. identical re-add
        pass
    spark._tp_integ_pkg_shipped = True


def tune_for_session(spark: SparkSession) -> SparkSession:
    """Apply engine runtime confs to an externally-created session.

    The driver harness owns its SparkSession; it may not have our
    builder confs. Everything here is runtime-settable.
    """
    _ship_package(spark)
    for key, value in (
        ("spark.sql.shuffle.partitions", str(DEFAULT_CPUS)),
        ("spark.sql.optimizer.runtime.bloomFilter.enabled", "true"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - immutable conf in some envs
            pass
    return spark
