"""Diagnosis worker for the bucketed winner-agg 8→32 inversion (r4 VERDICT
item 7): time the dedup-winner aggregation over one layout and report the
scan-side task count — the quantity the bucket-cap hypothesis rests on
(a bucketed scan runs EXACTLY one task per bucket; it is never split, so
the layout caps parallelism at n_buckets regardless of cores).

argv: fp_parquet table_loc n_buckets mode(shuffled|bucketed) table_name
Prints one JSON line.
"""
import json
import sys
import time

from pyspark.sql import functions as F

from deidcm_spark.session import get_spark
from deidcm_spark.sources import register_bucketed


def main() -> None:
    fp_path, table_loc, n_buckets, mode, name = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5])
    spark = get_spark(app_name=f"winner_diag_{mode}_{n_buckets}")
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "bucketed":
        register_bucketed(
            spark, name, table_loc, "fp BIGINT, doc_id BIGINT", "fp",
            n_buckets,
        )
        df = spark.table(name)
    else:
        df = spark.read.parquet(fp_path)

    def winner_totals(d):
        win = d.groupBy("fp").agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_dupes"),
        )
        row = win.agg(F.count("*"), F.sum("n_dupes")).collect()[0]
        return int(row[0]), int(row[1])

    winner_totals(df.limit(4096))  # warm readers/codegen
    scan_tasks = df.rdd.getNumPartitions()
    t0 = time.perf_counter()
    n_groups, n_rows = winner_totals(df)
    elapsed = time.perf_counter() - t0
    print(json.dumps({
        "mode": mode,
        "n_buckets": n_buckets,
        "scan_tasks": scan_tasks,
        "elapsed_sec": round(elapsed, 3),
        "rows": n_rows,
        "groups": n_groups,
        "rows_per_sec": round(n_rows / elapsed, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
