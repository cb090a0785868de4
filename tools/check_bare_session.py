"""Driver-environment simulation: run representative contract queries on a
VANILLA SparkSession (no deidcm_spark.session configs) — the driver builds
its own session, so nothing in queries() may depend on our session profile.

Usage: python tools/check_bare_session.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

import __spark_entry__ as e

def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.master("local[4]").appName("bare").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    failed = []
    from tools.check_oracle import assert_scalar_schema

    for name, fn in e.queries().items():  # EVERY contract entry
        try:
            df = fn(spark, sf_dir)
            assert_scalar_schema(name, df)  # driver canonicalizer contract
            print(f"bare {name}: {len(df.collect())} rows", flush=True)
        except Exception as ex:  # noqa: BLE001 — report all, then fail
            failed.append(name)
            print(f"bare {name}: FAILED {str(ex)[:200]}", flush=True)
    if failed:
        print(f"BARE SESSION FAILURES: {failed}")
        sys.exit(1)
    print("BARE SESSION OK")
    spark.stop()


if __name__ == "__main__":
    main()
