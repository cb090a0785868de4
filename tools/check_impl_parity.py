"""Large randomized parity sweep: the Arrow deid kernel vs the pandas
reference implementation on a bigger corpus than the unit tests use
(span-for-span + counter equality).  Usage:
    python tools/check_impl_parity.py [n_docs] [seed]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from deidcm_spark.corpus import synth_documents
from deidcm_spark.operators.deidentify import deidentify_attributes
from deidcm_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 101
    spark = get_spark(app_name="impl_parity", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_documents(
        spark, n, seed=seed, media_rate=0.2, skew=0.05, tags_per_doc=40
    ).persist()
    docs.count()
    frames = {}
    for impl in ("arrow", "pandas"):
        out = deidentify_attributes(
            docs, "9.9.9.9.9", "parity", with_metrics=True, impl=impl
        )
        frames[impl] = out.select(
            "doc_id",
            F.md5(F.to_json(F.struct("spans"))).alias("spans_md5"),
            "n_removed", "n_erased", "n_pseudonymized", "n_kept",
        )
    diff = frames["arrow"].exceptAll(frames["pandas"]).count() + \
        frames["pandas"].exceptAll(frames["arrow"]).count()
    assert diff == 0, f"{diff} differing rows"
    print(f"PARITY OK: {n} docs, seed {seed}, 0 differing rows")
    spark.stop()


if __name__ == "__main__":
    main()
