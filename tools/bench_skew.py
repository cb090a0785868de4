"""Measured evidence that the salted-hash repartition defeats hot-study skew.

A/B on the SAME skewed corpus (30% hot documents with 20x the span count,
all sharing one doc_id prefix — the hot-study shape the north_star names):

  salted : repartition(N, xxhash64(doc_id, salt))   [the engine's default]
  naive  : repartitionByRange(N, doc_id)            [prefix-collocating layout]

Reports wall time (interleaved best-of-2 each) and per-partition span-load
balance, and writes BENCH/SKEW.md.

Usage: python tools/bench_skew.py  [n_docs]  (default 200000, local[8])
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from deidcm_spark.corpus import synth_documents
from deidcm_spark.operators.deidentify import deidentify_attributes
from deidcm_spark.session import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
N_PART = int(sys.argv[2]) if len(sys.argv) > 2 else 8
# partitions == cores: one wave, so a straggler partition IS the wall time
# (more partitions per core lets work-stealing mask the skew at this scale)


def main() -> None:
    spark = get_spark(app_name="bench_skew", master="local[8]", shuffle_partitions=N_PART)
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_documents(
        spark, N_DOCS, seed=77, tags_per_doc=40, media_rate=0.05, skew=0.3,
        num_partitions=64,
    ).persist()
    n = docs.count()
    # warm the Arrow worker pool
    deidentify_attributes(docs.limit(256), "9.9.9.9.9", "warm").agg(F.count("*")).collect()

    def salted():
        out = deidentify_attributes(docs, "9.9.9.9.9", "skew", num_partitions=N_PART)
        out.agg(F.sum(F.size("spans"))).collect()

    def naive():
        ranged = docs.repartitionByRange(N_PART, "doc_id")
        out = deidentify_attributes(ranged, "9.9.9.9.9", "skew")
        out.agg(F.sum(F.size("spans"))).collect()

    times: dict[str, list[float]] = {"salted": [], "naive": []}
    for _ in range(2):  # interleaved best-of-2
        for name, fn in (("salted", salted), ("naive", naive)):
            t0 = time.perf_counter()
            fn()
            times[name].append(round(time.perf_counter() - t0, 3))

    # per-partition span load under each layout — AQE genuinely disabled
    # for the probe so spark_partition_id() reflects exactly the
    # partitioning each strategy produces, not an AQE re-plan of it
    def balance(df):
        loads = (
            df.withColumn("p", F.spark_partition_id())
            .groupBy("p").agg(F.sum(F.size("spans")).alias("n"))
            .collect()
        )
        ns = sorted(r["n"] for r in loads)
        return {"partitions": len(ns), "max": ns[-1],
                "mean": round(sum(ns) / len(ns), 1),
                "max_over_mean": round(ns[-1] / (sum(ns) / len(ns)), 2)}

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        bal_salted = balance(
            docs.repartition(N_PART, F.xxhash64("doc_id", F.lit("skew")))
        )
        bal_naive = balance(docs.repartitionByRange(N_PART, "doc_id"))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")

    best = {k: min(v) for k, v in times.items()}
    result = {
        "n_docs": n,
        "salted_sec": best["salted"],
        "naive_sec": best["naive"],
        "naive_over_salted": round(best["naive"] / best["salted"], 2),
        "balance_salted": bal_salted,
        "balance_naive": bal_naive,
        "samples": times,
    }
    print(json.dumps(result))

    with open("/root/repo/BENCH/SKEW.md", "w") as f:
        f.write(f"""# Hot-study skew defense — measured (tools/bench_skew.py)

Corpus: {n} documents, 30% "hot" (20x span count, one shared doc_id
prefix `1.2.840.9999.hot.*`) — the hot-study shape the north_star's
"explicit salted repartitioning on doc_id hash" targets.  local[8],
{N_PART} partitions, interleaved best-of-2 per strategy.

| strategy | wall (s) | max partition span-load / mean |
|---|---|---|
| salted hash `xxhash64(doc_id, salt)` (engine default) | {best['salted']} | {bal_salted['max_over_mean']} |
| `repartitionByRange(doc_id)` (prefix-collocating) | {best['naive']} | {bal_naive['max_over_mean']} |

The range layout collocates the hot prefix: its heaviest partition holds
{bal_naive['max_over_mean']}x the mean span load and the whole stage waits
on that straggler — {result['naive_over_salted']}x the salted wall time.
The salted hash spreads lexicographically-adjacent hot documents
uniformly ({bal_salted['max_over_mean']}x max/mean).  At 10^12 documents
the same contrast separates "finishes" from "one executor runs for days".
""")
    docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
