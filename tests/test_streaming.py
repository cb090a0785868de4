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


def test_sessionization_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from deidcm_spark.streaming import sessionize_events

    in_dir = str(tmp_path / "sess_events")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # sentinel far-future event per user forces every real session past the
    # watermark so append mode emits them all during the availableNow drain
    sentinel = ev.groupBy("user_id").agg(F.max("ts").alias("ts")).select(
        F.lit(-1).alias("event_id"),
        F.expr("timestampadd(YEAR, 10, ts)").alias("ts"),
        "user_id", F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"), F.lit("").alias("props"),
    )
    ev.select("event_id", "ts", "user_id", "event_type", "value", "props").union(
        sentinel
    ).write.parquet(in_dir)

    q = sessionize_events(spark, in_dir, str(tmp_path / "sck"), queryName="sess_test")
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in spark.sql(
            "select * from sess_test where n_events > 1 or sum_value != 0.0"
        ).collect()
    }
    batch = (
        spark.read.parquet(in_dir)
        .filter("event_type != 'sentinel'")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 3).alias("s"))
    )
    want = {
        (r["user_id"], r["w"]["start"]): (r["n"], r["s"])
        for r in batch.collect()
        if not (r["n"] == 1 and r["s"] == 0.0)
    }
    assert got == want and len(got) > 0


def test_applyinpandaswithstate_running_totals(spark, tmp_path):
    from pyspark.sql import functions as F

    from deidcm_spark.streaming import running_user_totals

    in_dir = str(tmp_path / "rt_events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").repartition(8).write.parquet(in_dir)

    q = running_user_totals(spark, in_dir, str(tmp_path / "rck"), queryName="rt_test")
    q.awaitTermination(180)

    # the LAST update per user must equal the batch totals (state accumulated
    # across micro-batches)
    updates = spark.sql("select * from rt_test")
    final = {r["user_id"]: (r["n_events"], r["total_value"])
             for r in updates.collect()}  # memory sink keeps every update;
    # take max n_events per user as the final state
    agg = {}
    for r in updates.collect():
        cur = agg.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            agg[r["user_id"]] = (r["n_events"], r["total_value"])
    batch = {
        r["user_id"]: (r["n"], r["t"])
        for r in spark.read.parquet(in_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 3).alias("t"))
        .collect()
    }
    assert agg == batch


def test_stream_rollup_matches_batch(spark, tmp_path):
    """Continuous-aggregate refresh: two micro-batch drops of events →
    partial log → read_rollup must equal the batch hypertable_rollup over
    everything seen (decomposable partials compose exactly)."""
    from pyspark.sql import functions as F

    from deidcm_spark.operators.rollup import hypertable_rollup
    from deidcm_spark.streaming import read_rollup, stream_rollup

    in_dir = str(tmp_path / "events_in")
    out_dir = str(tmp_path / "rollup_partials")
    ck = str(tmp_path / "ck")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a, b = events.filter("event_id % 2 = 0"), events.filter("event_id % 2 = 1")

    a.write.parquet(in_dir)
    q = stream_rollup(spark, in_dir, out_dir, ck, queryName="ru1")
    q.awaitTermination(120)
    b.write.mode("append").parquet(in_dir)
    q2 = stream_rollup(spark, in_dir, out_dir, ck, queryName="ru2")
    q2.awaitTermination(120)

    def snap(df):
        return {
            (str(r["bucket"]), r["granularity"], r["event_type"]): (
                r["n_events"], round(r["sum_value"], 6),
                r["min_value"], r["max_value"],
            )
            for r in df.collect()
        }

    got = snap(read_rollup(spark, out_dir))
    want = snap(hypertable_rollup(
        spark.read.parquet(in_dir).withColumn("ts", F.col("ts").cast("timestamp")),
        "ts", ["event_type"], "value"))
    assert got == want and len(want) > 10
    # the partial log really is incremental: both micro-batches present
    batches = {r["batch_id"] for r in
               spark.read.parquet(out_dir).select("batch_id").distinct().collect()}
    assert len(batches) == 2


def test_stream_cdf_matches_batch(spark, tmp_path):
    """Streaming sketch refresh: two value drops → partial log →
    read_cdf must equal the batch cdf_build over everything seen, and
    the compacted sketch answers quantiles through the normal lane."""
    from pyspark.sql import functions as F

    from deidcm_spark.operators.quantile import cdf_build, cdf_quantile
    from deidcm_spark.streaming import read_cdf, stream_cdf

    in_dir = str(tmp_path / "vals_in")
    out_dir = str(tmp_path / "cdf_partials")
    ck = str(tmp_path / "cdf_ck")
    lo, hi, m = 0.0, 100.0, 64
    rows = [(i, float((i * 37) % 100)) for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, value double")
    a, b = df.filter("doc_id % 2 = 0"), df.filter("doc_id % 2 = 1")

    a.write.parquet(in_dir)
    q = stream_cdf(spark, in_dir, out_dir, ck, "value", lo, hi, m,
                   queryName="cdf1")
    q.awaitTermination(120)
    b.write.mode("append").parquet(in_dir)
    q2 = stream_cdf(spark, in_dir, out_dir, ck, "value", lo, hi, m,
                    queryName="cdf2")
    q2.awaitTermination(120)

    def snap(d):
        return {r["bucket_idx"]: r["cnt"] for r in d.collect()}

    got = snap(read_cdf(spark, out_dir))
    want = snap(cdf_build(spark.read.parquet(in_dir), "value", lo, hi, m))
    assert got == want and sum(got.values()) == 5000
    # the log is incremental (one partial per micro-batch: two starts
    # under one checkpoint lineage -> batch ids 0 and 1) and bounded at
    # <= m rows per batch
    log = spark.read.parquet(out_dir)
    batches = {r["batch_id"] for r in log.select("batch_id").distinct().collect()}
    assert len(batches) == 2
    per_batch = {r["batch_id"]: r["n"] for r in
                 log.groupBy("batch_id").agg(F.count("*").alias("n")).collect()}
    assert all(n <= m for n in per_batch.values())
    # quantile query runs on the compacted log directly
    qrow = cdf_quantile(read_cdf(spark, out_dir), [0.5], lo, hi, m).collect()[0]
    assert qrow["total"] == 5000 and 0 <= qrow["bucket_idx"] < m
