"""SparkSession factory with the engine's scale-oriented defaults.

Tuned for the target workload (fat ``html BINARY`` rows through Arrow-batched
pandas UDFs, skewed url-host key space, 100 TB-class scans):

  * AQE on (+ skew-join + partition coalescing) — runtime re-planning;
  * Arrow ``maxRecordsPerBatch`` sized for the payload: 512 rows is the
    measured optimum for few-KB pages (14k vs 9.9k docs/sec at 128); drop to
    64–128 when pages run to megabytes (SURVEY.md §4) — batch bytes, not
    batch rows, are what must fit comfortably in the python worker;
  * shuffle partitions sized to cores locally — on a real cluster this is
    set to ~2-3× total executor cores via spark-submit conf;
  * UTC session timezone so DuckDB-oracle comparisons are stable;
  * python worker reuse so kernel module state (lazy singletons) persists.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ocr_model_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 512,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = int(cpus) if str(cpus).isdigit() else 32
        shuffle_partitions = max(8, n)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
