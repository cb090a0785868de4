"""SparkSession factory with the engine's scale profile.

The same settings we would submit on a real cluster via
``spark-submit --py-files deidcm_spark.zip --conf ...``; in this sandbox the
master is local[N] but every choice is made for multi-executor behavior:

* AQE on with coalescing + skew handling — at 100 TB the post-shuffle
  partition count must be decided from runtime stats, not a constant;
* Arrow enabled with a bounded ``maxRecordsPerBatch`` — span arrays are wide,
  so Python-worker memory is bounded by batch rows × avg doc size;
* shuffle partitions sized for the test scale; on a 1000-executor cluster
  this comes from ``spark.sql.shuffle.partitions`` at submit time and AQE
  coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "deidcm_spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
