"""Worker for bench_scaling: run the deid pipeline once on a pre-written
corpus and print docs/sec.  Invoked via spark-submit at different local[N]
parallelism levels on IDENTICAL input (the sandbox substitute for N vs 4N
executors mandated by BASELINE.json's north_rule).

Usage: spark-submit --master local[N] tools/scaling_worker.py <corpus_parquet> <n_partitions>
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, "/root/repo")

from deidcm_spark.operators.deidentify import deidentify_attributes  # noqa: E402


def main() -> None:
    corpus_path = sys.argv[1]
    n_partitions = int(sys.argv[2])
    spark = (
        SparkSession.builder.appName("scaling_worker")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.shuffle.partitions", str(n_partitions))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(corpus_path)
    # warm-up: JVM codegen, Arrow python workers (full UDF path), parquet
    # footers — excluded from the timed window
    warm = deidentify_attributes(docs.limit(512), "9.9.9.9.9", "warm")
    warm.agg(F.count("*")).collect()

    t0 = time.perf_counter()
    out = deidentify_attributes(docs, "9.9.9.9.9", "scaling", num_partitions=n_partitions)
    n_docs, n_spans = out.agg(
        F.count("*"), F.sum(F.size("spans"))
    ).collect()[0]
    elapsed = time.perf_counter() - t0
    print(json.dumps({
        "n_docs": n_docs,
        "n_spans_out": int(n_spans),
        "elapsed_sec": round(elapsed, 3),
        "docs_per_sec": round(n_docs / elapsed, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
