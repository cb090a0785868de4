"""Small-file compaction: data-lossless, file-count math, safety guard."""

import glob

import pytest

from deidcm_spark.maintenance import compact_parquet, dir_stats

SF = "/root/testdata/sf0.001/documents.parquet"


def test_compaction_preserves_data_and_reduces_files(spark, tmp_path):
    frag = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    # simulate a streaming/per-bucket sink: 64 tiny files
    docs = spark.read.parquet(SF)
    docs.repartition(64).write.parquet(frag)
    files_in, bytes_in = dir_stats(spark, frag)
    assert files_in == 64

    stats = compact_parquet(spark, frag, out, target_bytes=bytes_in)
    assert stats["files_in"] == 64
    assert stats["files_out"] == stats["target_files"] == 1
    # lossless: same rows, same values
    a = sorted(r["doc_id"] for r in spark.read.parquet(frag).collect())
    b = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert a == b and len(a) == 500
    # on-disk part files really did collapse
    assert len(glob.glob(out + "/part-*")) == 1


def test_compaction_target_math(spark, tmp_path):
    frag = str(tmp_path / "frag2")
    out = str(tmp_path / "out2")
    spark.read.parquet(SF).repartition(16).write.parquet(frag)
    _, bytes_in = dir_stats(spark, frag)
    # quarter-size target → 4-ish output files (ceil math exact)
    stats = compact_parquet(spark, frag, out,
                            target_bytes=max(1, bytes_in // 4))
    assert stats["target_files"] in (4, 5)  # ceil(total/target)
    assert stats["files_out"] == stats["target_files"]


def test_compaction_refuses_in_place(spark, tmp_path):
    d = str(tmp_path / "same")
    spark.read.parquet(SF).limit(5).write.parquet(d)
    with pytest.raises(ValueError, match="NEW directory"):
        compact_parquet(spark, d, d + "/")
