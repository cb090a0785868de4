"""Z-order pruning evidence → BENCH/ZORDER.md.

Builds a 20.48M-row two-dimensional table once (deterministic), writes
it twice — unclustered (round-robin repartition) and Z-ordered
(``maintenance.zorder_rewrite``) — then times the same two-column range
query against both layouts and reports, per layout:

* wall time (warm + best-of-3) for ``x BETWEEN a AND b AND y BETWEEN
  c AND d`` (selects ~0.25% of rows);
* files whose footer min/max box intersects the predicate (the pruning
  a real lakehouse reader does at PLANNING time; Spark's parquet reader
  additionally row-group-skips inside the files it opens — both effects
  land in the measured wall).

Run: ``python tools/bench_zorder.py`` (no args; ~2 min).  Like
bench_skew.py this is an evidence generator, not part of bench.py's
timed headline.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyarrow.parquet as pq_meta  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from deidcm_spark.maintenance import zorder_rewrite  # noqa: E402
from deidcm_spark.session import get_spark  # noqa: E402

N_ROWS = 20_480_000
N_FILES = 64
BASE = "/tmp/zorder_bench_base"
ZDIR = "/tmp/zorder_bench_z"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH", "ZORDER.md")

# ~0.25% of the (0..1999)^2 plane
PRED = "x BETWEEN 400 AND 499 AND y BETWEEN 1200 AND 1299"


def build(spark) -> None:
    if os.path.exists(os.path.join(BASE, "_SUCCESS")) and os.path.exists(
        os.path.join(ZDIR, "_SUCCESS")
    ):
        return
    # x and y must be INDEPENDENT coordinates (two different id digits in
    # base 2000, md5-scrambled) — deriving both from id % 2000 couples
    # them onto a 1-D lattice and every 2-D box is empty
    df = spark.range(N_ROWS).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "cast(conv(substring(md5(cast(id % 2000 as string)), 1, 8), 16, 10)"
            " % 2000 as bigint)"
        ).alias("x"),
        F.expr(
            "cast(conv(substring(md5(concat('y', cast(id div 2000 as string))),"
            " 1, 8), 16, 10) % 2000 as bigint)"
        ).alias("y"),
        (F.col("id") % 97).cast("double").alias("payload"),
    )
    df.repartition(N_FILES).write.mode("overwrite").parquet(BASE)
    zorder_rewrite(spark, BASE, ZDIR, ["x", "y"], n_files=N_FILES)


def file_hits(path: str) -> tuple[int, int]:
    """(intersecting_files, total_files) for PRED from the footers."""
    xs, ys = (400, 499), (1200, 1299)
    total = hits = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq_meta.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        lo = {c: None for c in ("x", "y")}
        hi = {c: None for c in ("x", "y")}
        for rg in range(md.num_row_groups):
            for c in ("x", "y"):
                st = md.row_group(rg).column(names.index(c)).statistics
                lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
                hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
        total += 1
        if not (hi["x"] < xs[0] or lo["x"] > xs[1]) and not (
            hi["y"] < ys[0] or lo["y"] > ys[1]
        ):
            hits += 1
    return hits, total


def timed_query(spark, path: str) -> tuple[float, int]:
    df = spark.read.parquet(path).filter(PRED)
    agg = lambda: df.agg(F.count("*"), F.sum("payload")).collect()  # noqa: E731
    rows = int(agg()[0][0])  # warm
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        agg()
        samples.append(time.perf_counter() - t0)
    return min(samples), rows


def main() -> None:
    spark = get_spark(app_name="bench_zorder", master="local[8]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    base_hits, base_total = file_hits(BASE)
    z_hits, z_total = file_hits(ZDIR)
    base_sec, base_rows = timed_query(spark, BASE)
    z_sec, z_rows = timed_query(spark, ZDIR)
    assert base_rows == z_rows, (base_rows, z_rows)
    result = {
        "n_rows": N_ROWS,
        "selected_rows": base_rows,
        "predicate": PRED,
        "base_sec": round(base_sec, 3),
        "zorder_sec": round(z_sec, 3),
        "speedup": round(base_sec / z_sec, 2),
        "base_files_hit": f"{base_hits}/{base_total}",
        "zorder_files_hit": f"{z_hits}/{z_total}",
    }
    print(json.dumps(result))
    with open(OUT, "w") as f:
        f.write(
            "# Z-order pruning evidence (tools/bench_zorder.py)\n\n"
            f"{N_ROWS:,}-row table `(doc_id, x, y, payload)` with x, y "
            "uniform on [0, 2000); the SAME two-column range predicate\n"
            f"(`{PRED}`, {base_rows:,} rows ≈ "
            f"{100.0 * base_rows / N_ROWS:.2f}% of the table) against two "
            "layouts of identical content:\n\n"
            "| layout | files intersecting the predicate box | query wall "
            "(warm, best-of-3, local[8]) |\n|---|---|---|\n"
            f"| unclustered ({N_FILES} round-robin files) | "
            f"{base_hits}/{base_total} | {base_sec:.3f}s |\n"
            f"| z-ordered on (x, y) | {z_hits}/{z_total} | {z_sec:.3f}s |\n\n"
            f"Speedup {base_sec / z_sec:.2f}x.  Every unclustered file "
            "spans the full plane, so the footer check prunes nothing and "
            "every row group is read; the Morton layout confines the "
            "predicate box to a handful of curve segments — the footer "
            "min/max (the same statistics Iceberg/Delta planning uses) "
            "eliminates the rest before any column data is touched, and "
            "Spark's row-group skipping compounds inside the survivors.  "
            "At 100 TB this gap widens: planning-time file pruning scales "
            "with METADATA size while the unclustered scan scales with "
            "DATA size.\n"
        )
    print(f"wrote {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
