"""Table maintenance: small-file compaction.

A 10^12-row table accumulates small files — per-bucket commits, streaming
micro-batches, skewed dynamic partitions — and scan cost degrades with
file COUNT (footer reads, task scheduling), not just bytes.  Real table
formats run a compaction job (Iceberg's ``rewrite_data_files``); this is
that job for the parquet-emulation layout this repo uses.

Sizing reads the actual on-disk bytes through the Hadoop FileSystem API
(works for any scheme Spark can reach, not just ``file://``), targets
``target_bytes`` per output file, and rewrites with ``repartition(n)``
— a full shuffle, which is the point: compaction exists to pay one
clean rewrite so every later scan is cheap.  The rewrite lands in a NEW
directory (the caller swaps it in, or an Iceberg commit would make the
swap transactional) — compaction never overwrites its own input.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under ``path`` via the Hadoop FS API —
    counts data files only (skips _SUCCESS/_metadata/dot files)."""
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    it = fs.listFiles(p, True)
    n, total = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        n += 1
        total += st.getLen()
    return n, total


def compact_parquet(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite ``in_dir`` into ``out_dir`` with ~``target_bytes`` files.

    Returns the before/after accounting.  ``out_dir`` must differ from
    ``in_dir`` (never rewrite input in place — a failed job would
    destroy the table; with Iceberg the directory swap is one commit)."""
    if in_dir.rstrip("/") == out_dir.rstrip("/"):
        raise ValueError("compaction must write to a NEW directory")
    files_in, total = dir_stats(spark, in_dir)
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(in_dir)
    df.repartition(n_out).write.mode("overwrite").parquet(out_dir)
    files_out, bytes_out = dir_stats(spark, out_dir)
    return {
        "files_in": files_in,
        "files_out": files_out,
        "bytes_in": total,
        "bytes_out": bytes_out,
        "target_files": n_out,
    }
