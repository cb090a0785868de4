"""Driver-environment simulation: run representative contract queries on a
VANILLA SparkSession (no deidcm_spark.session configs) — the driver builds
its own session, so nothing in queries() may depend on our session profile.

Usage: python tools/check_bare_session.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

import __spark_entry__ as e

REPRESENTATIVE = [
    "deid_recipe_cases", "extract_main_content", "layout_parse",
    "phi_scrub_uids", "ann_ivf", "minhash_signatures",
    "ingest_spans", "media_redaction", "simhash_neardup",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.master("local[4]").appName("bare").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    for name in REPRESENTATIVE:
        print(f"bare {name}: {qs[name](spark, sf_dir).count()} rows", flush=True)
    print("BARE SESSION OK")
    spark.stop()


if __name__ == "__main__":
    main()
