"""Failure-injection + resume tests for the lineage-checkpointed job."""

import pytest
from pyspark.sql import functions as F

from deidcm_spark import corpus
from deidcm_spark.lineage import (
    committed_buckets,
    read_lineage,
    read_output,
    run_deid_job,
)
from deidcm_spark.operators.deidentify import deidentify_attributes

ORG_ROOT = "9.9.9.9.9"
SALT = "lineage_salt"
N_BUCKETS = 8


def _docs(spark, n=150):
    return corpus.synth_documents(spark, n, seed=21, media_rate=0.1, skew=0.05)


def _snapshot(df):
    rows = [r.asDict(recursive=True) for r in df.select("doc_id", "spans").collect()]
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"])
            for s in sorted(r["spans"], key=lambda s: s["offset"])
        ]
        for r in rows
    }


def test_crash_and_resume_produces_single_shot_result(spark, tmp_path):
    docs = _docs(spark)
    out_crash = str(tmp_path / "crash")
    out_clean = str(tmp_path / "clean")

    # attempt 1 "crashes" after 3 buckets
    s1 = run_deid_job(spark, docs, out_crash, ORG_ROOT, SALT, N_BUCKETS, "r1",
                      max_buckets_this_attempt=3)
    assert s1["processed"] == 3
    assert committed_buckets(spark, out_crash, "r1") == {0, 1, 2}

    # resume completes only the remaining buckets
    s2 = run_deid_job(spark, docs, out_crash, ORG_ROOT, SALT, N_BUCKETS, "r1")
    assert s2["committed_before"] == 3
    assert s2["processed"] == N_BUCKETS - 3

    # single-shot reference run
    run_deid_job(spark, docs, out_clean, ORG_ROOT, SALT, N_BUCKETS, "rX")

    got = _snapshot(read_output(spark, out_crash))
    want = _snapshot(read_output(spark, out_clean))
    assert got == want
    assert len(got) == docs.count()  # no duplicates, no losses


def test_rerun_is_noop_after_completion(spark, tmp_path):
    docs = _docs(spark, 60)
    out = str(tmp_path / "noop")
    run_deid_job(spark, docs, out, ORG_ROOT, SALT, N_BUCKETS, "r1")
    s = run_deid_job(spark, docs, out, ORG_ROOT, SALT, N_BUCKETS, "r1")
    assert s["processed"] == 0 and s["committed_before"] == N_BUCKETS


def test_lineage_metrics_consistent(spark, tmp_path):
    docs = _docs(spark, 100)
    out = str(tmp_path / "metrics")
    run_deid_job(spark, docs, out, ORG_ROOT, SALT, N_BUCKETS, "r1")
    lineage = read_lineage(spark, out)
    assert lineage is not None
    agg = lineage.agg(
        F.sum("n_docs").alias("docs"),
        F.sum("n_spans_out").alias("spans_out"),
        F.sum("n_removed").alias("removed"),
    ).collect()[0]
    assert agg["docs"] == 100
    output = read_output(spark, out)
    assert agg["spans_out"] == output.agg(F.sum(F.size("spans"))).collect()[0][0]
    assert agg["removed"] > 0
    # every bucket committed exactly once
    per_bucket = lineage.groupBy("bucket").count().collect()
    assert len(per_bucket) == N_BUCKETS
    assert all(r["count"] == 1 for r in per_bucket)


def test_output_equals_direct_pipeline(spark, tmp_path):
    docs = _docs(spark, 80)
    out = str(tmp_path / "direct")
    run_deid_job(spark, docs, out, ORG_ROOT, SALT, N_BUCKETS, "r1")
    direct = deidentify_attributes(docs, ORG_ROOT, SALT)
    assert _snapshot(read_output(spark, out)) == _snapshot(direct)


def test_bucketed_input_zero_exchange_same_result(spark, tmp_path):
    """prepare_bucketed_corpus + input_bucketed=True: the deid stage plan
    has NO Exchange (the span payload never shuffles), and the committed
    output equals the shuffled path byte for byte."""
    from deidcm_spark.lineage import bucket_expr, prepare_bucketed_corpus
    from deidcm_spark.operators.deidentify import deidentify_attributes as deid

    docs = _docs(spark, 120)
    prepare_bucketed_corpus(docs, "bt_deid_corpus", SALT, N_BUCKETS)
    bucketed = spark.table("bt_deid_corpus")

    # plan shape: filter + mapInArrow over the bucketed scan, zero Exchange
    # (CLAUDE.md AQE rule: execute the SAME DataFrame before reading
    # executedPlan, else the assertion runs on the non-final plan)
    todo = bucketed.filter(F.col("bucket").isin(list(range(N_BUCKETS))))
    out = deid(todo, ORG_ROOT, SALT, with_metrics=True)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "MapInArrow" in plan

    # end-to-end: bucketed job == shuffled job
    d1 = str(tmp_path / "bucketed_out")
    d2 = str(tmp_path / "shuffled_out")
    s1 = run_deid_job(spark, bucketed, d1, ORG_ROOT, SALT, n_buckets=N_BUCKETS,
                      input_bucketed=True)
    s2 = run_deid_job(spark, docs, d2, ORG_ROOT, SALT, n_buckets=N_BUCKETS)
    assert s1["processed"] == s2["processed"] == N_BUCKETS
    assert _snapshot(read_output(spark, d1)) == _snapshot(read_output(spark, d2))
    # the stored bucket column matches the job's own bucket function
    mismatch = (
        bucketed.withColumn("b2", bucket_expr(SALT, N_BUCKETS))
        .filter("bucket != b2").count()
    )
    assert mismatch == 0


def test_extract_job_bucketed_zero_exchange(spark, tmp_path):
    """run_extract_job(input_bucketed=True) over a pre-bucketed raw corpus:
    same committed output as the shuffled path."""
    from deidcm_spark.lineage import (
        prepare_bucketed_raw_corpus,
        run_extract_job,
    )

    raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    prepare_bucketed_raw_corpus(raw, "bt_extract_corpus", SALT, N_BUCKETS)

    d1 = str(tmp_path / "ex_bucketed")
    d2 = str(tmp_path / "ex_shuffled")
    s1 = run_extract_job(spark, spark.table("bt_extract_corpus"), d1, SALT,
                         n_buckets=N_BUCKETS, input_bucketed=True)
    s2 = run_extract_job(spark, raw, d2, SALT, n_buckets=N_BUCKETS)
    assert s1["processed"] == s2["processed"] == N_BUCKETS
    assert _snapshot(read_output(spark, d1)) == _snapshot(read_output(spark, d2))


def test_bucketed_crash_resume_and_guards(spark, tmp_path):
    from deidcm_spark.lineage import prepare_bucketed_corpus

    docs = _docs(spark, 100)
    prepare_bucketed_corpus(docs, "bt_resume_corpus", SALT, N_BUCKETS)
    bucketed = spark.table("bt_resume_corpus")
    out = str(tmp_path / "resume_out")

    # crash after 3 buckets, then resume — completion reconciles doc totals
    s1 = run_deid_job(spark, bucketed, out, ORG_ROOT, SALT, n_buckets=N_BUCKETS,
                      input_bucketed=True, max_buckets_this_attempt=3)
    assert s1["processed"] == 3 and "reconciled_docs" not in s1
    s2 = run_deid_job(spark, bucketed, out, ORG_ROOT, SALT, n_buckets=N_BUCKETS,
                      input_bucketed=True)
    assert s2["committed_before"] == 3 and s2["processed"] == N_BUCKETS - 3
    assert s2["reconciled_docs"] == 100
    assert _snapshot(read_output(spark, out)) == _snapshot(
        deidentify_attributes(docs, ORG_ROOT, SALT)
    )

    # guard: input_bucketed without a bucket column refuses
    with pytest.raises(ValueError, match="bucket"):
        run_deid_job(spark, docs, str(tmp_path / "x1"), ORG_ROOT, SALT,
                     n_buckets=N_BUCKETS, input_bucketed=True)
    # guard: stored bucket from a DIFFERENT salt fails the probe
    from deidcm_spark.lineage import bucket_expr

    wrong = docs.withColumn("bucket", bucket_expr("other_salt", N_BUCKETS))
    with pytest.raises(ValueError, match="does not"):
        run_deid_job(spark, wrong, str(tmp_path / "x2"), ORG_ROOT, SALT,
                     n_buckets=N_BUCKETS, input_bucketed=True)


def test_lineage_read_fallback_only_on_path_not_found(spark, tmp_path):
    """Only the first-run path-not-found case may fall back to 'nothing
    committed' — any other read failure must raise: silently restarting
    reprocesses every bucket AND appends duplicate committed rows that
    break the completion reconciliation (the streaming Bloom/LSH log
    contract)."""
    from deidcm_spark.lineage import committed_buckets

    # genuinely absent -> first run, empty set
    assert committed_buckets(spark, str(tmp_path / "never"), "r") == set()
    # existing but unreadable-as-parquet (empty dir: schema inference
    # fails with a different error class) -> must raise, not restart
    bad = tmp_path / "exists"
    (bad / "_lineage").mkdir(parents=True)
    with pytest.raises(Exception, match="(?i)schema|parquet|infer"):
        committed_buckets(spark, str(bad), "r")
