"""Streaming facade test: incremental de-identification equals the batch
pipeline, and restarts don't duplicate (streaming checkpoint log)."""

from deidcm_spark import corpus
from deidcm_spark.operators.deidentify import deidentify_attributes
from deidcm_spark.streaming import stream_deidentify

ORG_ROOT = "9.9.9.9.9"
SALT = "stream_salt"


def _snapshot(df):
    rows = [r.asDict(recursive=True) for r in df.select("doc_id", "spans").collect()]
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"])
            for s in sorted(r["spans"], key=lambda s: s["offset"])
        ]
        for r in rows
    }


def test_stream_matches_batch_and_resumes(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    docs1 = corpus.synth_documents(spark, 60, seed=41, media_rate=0.1)
    docs1.write.mode("append").parquet(in_dir)

    q = stream_deidentify(spark, in_dir, out_dir, ckpt, ORG_ROOT, SALT)
    q.awaitTermination(120)

    got1 = spark.read.parquet(out_dir)
    assert got1.count() == 60

    # more documents land; a NEW stream run from the same checkpoint picks up
    # only the delta (no reprocessing of already-committed files)
    docs2 = corpus.synth_documents(spark, 40, seed=42, media_rate=0.1)
    docs2 = docs2.selectExpr("concat('b.', doc_id) as doc_id", "spans")
    docs2.write.mode("append").parquet(in_dir)

    q2 = stream_deidentify(spark, in_dir, out_dir, ckpt, ORG_ROOT, SALT)
    q2.awaitTermination(120)

    out = spark.read.parquet(out_dir)
    assert out.count() == 100
    assert out.select("doc_id").distinct().count() == 100

    batch = deidentify_attributes(spark.read.parquet(in_dir), ORG_ROOT, SALT)
    assert _snapshot(out) == _snapshot(batch)


def test_watermarked_event_windows_match_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from deidcm_spark.streaming import stream_event_counts

    in_dir = str(tmp_path / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(in_dir)

    q = stream_event_counts(spark, in_dir, str(tmp_path / "ck"), queryName="ec_test")
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from ec_test").collect()
    }
    batch = (
        spark.read.parquet(in_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 3).alias("s"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "s")
    )
    want = {(r["ws"], r["event_type"]): (r["n"], r["s"]) for r in batch.collect()}
    assert got == want
