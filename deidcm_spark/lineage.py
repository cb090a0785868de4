"""Checkpointed, resumable de-identification job with per-partition lineage.

The reference has NO resume story: a rerun wipes the output directory and
starts over (``deidcm/dicom/deid_mammogram.py:294-296``).  At 10^12 documents
a job WILL lose executors/the driver mid-run, so the engine processes the
corpus in ``n_buckets`` salted hash buckets (``pmod(xxhash64(doc_id, salt),
n_buckets)``) and records one lineage row per committed bucket.

Commit protocol (Iceberg-snapshot emulation over plain parquet — this
sandbox has no Iceberg runtime jar; with Iceberg the output append and the
lineage append would ride one transaction, see SURVEY.md §4):

1. output rows are written ``partitionBy(bucket)`` with DYNAMIC partition
   overwrite — rewriting a bucket is idempotent, so a crash between steps 1
   and 2 leaves an orphan bucket directory that the resume simply rewrites;
2. a lineage row (bucket, doc/span/action counters, status=committed) is
   appended only after the bucket's data is on disk.

Resume = anti-join of the bucket domain against committed lineage: only
missing buckets are recomputed.  Bucket metrics are aggregated from the
WRITTEN output (column-pruned parquet read of the counter columns), never by
re-running the UDF stage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from deidcm_spark.operators.deidentify import deidentify_attributes


def _lineage_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def _data_path(out_dir: str) -> str:
    return os.path.join(out_dir, "data")


def _read_parquet_or_none(spark: SparkSession, path: str):
    """ONLY the path-not-found case (first run ever) may fall back to
    'nothing committed yet' — a transient FS/read error on an EXISTING
    lineage log must fail the attempt: silently restarting reprocesses
    every bucket and appends duplicate committed rows, which the
    completion reconciliation then reports as a (false) corpus-coverage
    error.  Same contract as streaming's Bloom/LSH log reads."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        cond = getattr(e, "getCondition", e.getErrorClass)()
        if cond != "PATH_NOT_FOUND":
            raise
        return None


def committed_buckets(spark: SparkSession, out_dir: str, run_id: str) -> set[int]:
    lineage = _read_parquet_or_none(spark, _lineage_path(out_dir))
    if lineage is None:
        return set()
    rows = (
        lineage.filter((F.col("run_id") == run_id) & (F.col("status") == "committed"))
        .select("bucket")
        .distinct()
        .collect()
    )
    return {r["bucket"] for r in rows}


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame | None:
    return _read_parquet_or_none(spark, _lineage_path(out_dir))


def bucket_expr(salt: str, n_buckets: int):
    """THE bucket function — shared by the job, the pre-bucketing writer,
    and the resume check: ``pmod(xxhash64(doc_id, salt), n_buckets)``."""
    return F.pmod(F.xxhash64("doc_id", F.lit(salt)), F.lit(n_buckets)).cast("int")


def prepare_bucketed_corpus(
    documents: DataFrame,
    table: str,
    salt: str = "deidcm_spark",
    n_buckets: int = 32,
) -> None:
    """One-time ingest shuffle: persist the corpus bucketed on the SAME
    salted bucket function the deid job partitions by (the sandbox stand-in
    for an Iceberg ``bucket(N, key)`` partition spec).  Every subsequent
    ``run_deid_job(..., input_bucketed=True)`` — including every resume
    attempt — then runs a ZERO-exchange plan: scan → mapInArrow → sink,
    the span payload never crosses a shuffle again."""
    from deidcm_spark.sources import write_bucketed

    with_bucket = documents.withColumn("bucket", bucket_expr(salt, n_buckets))
    write_bucketed(with_bucket, table, "bucket", n_buckets)


def prepare_bucketed_raw_corpus(
    raw_documents: DataFrame,
    table: str,
    salt: str = "deidcm_spark",
    n_buckets: int = 32,
) -> None:
    """Extraction-lane analogue of :func:`prepare_bucketed_corpus`: cluster
    the RAW (doc_id, text, lang, source) corpus on the extract job's bucket
    function.  doc_id is cast to string FIRST — the extractor's id domain —
    so the stored bucket matches what ``run_extract_job`` recomputes, and
    ``run_extract_job(..., input_bucketed=True)`` runs the zero-exchange
    plan: scan → html → mapInPandas → sink."""
    from deidcm_spark.sources import write_bucketed

    with_bucket = raw_documents.withColumn(
        "doc_id", F.col("doc_id").cast("string")
    ).withColumn("bucket", bucket_expr(salt, n_buckets))
    write_bucketed(with_bucket, table, "bucket", n_buckets)


def run_deid_job(
    spark: SparkSession,
    documents: DataFrame,
    out_dir: str,
    org_root: str,
    salt: str = "deidcm_spark",
    n_buckets: int = 32,
    run_id: str = "run0",
    max_buckets_this_attempt: int | None = None,
    date_mode: str = "first_day_year",
    date_offset: int = 100000,
    input_bucketed: bool = False,
) -> dict:
    """Process all not-yet-committed buckets; returns a summary dict.

    ``max_buckets_this_attempt`` exists for failure-injection tests: it
    commits only the first K pending buckets and stops, simulating a crash
    partway through the corpus.

    ``input_bucketed=True`` declares that ``documents`` is already stored
    clustered on this job's bucket function (written by
    :func:`prepare_bucketed_corpus` with the same salt/n_buckets): the
    repartition exchange — the single shuffle of the full span payload —
    is skipped, and the plan is scan → filter → mapInArrow → sink.  At
    32 local cores that shuffle is the measured kernel-time bottleneck
    (BENCH/BASELINE.md); on a real cluster it is the network-heavy stage.
    """
    done = committed_buckets(spark, out_dir, run_id)
    pending = sorted(set(range(n_buckets)) - done)
    if max_buckets_this_attempt is not None:
        pending = pending[:max_buckets_this_attempt]
    summary = {"run_id": run_id, "committed_before": len(done), "processed": 0}
    if not pending:
        return summary

    if input_bucketed:
        if "bucket" not in documents.columns:
            raise ValueError(
                "input_bucketed=True requires a stored 'bucket' column "
                "(prepare_bucketed_corpus writes one); refusing to silently "
                "run the unclustered plan"
            )
        bucketed = documents
        # the stored bucket column must be THIS job's bucket function —
        # a different salt/n_buckets would silently mark out-of-range
        # buckets "complete" on resume.  Two-level defense: a cheap 1k-row
        # probe fails fast on a wholesale mismatch here, and after the LAST
        # bucket commits the lineage totals are reconciled against the
        # source count (below) — which catches even a partially
        # mis-bucketed corpus (e.g. two prepares unioned) with one
        # metadata-cheap count instead of a full-corpus validation scan
        # per attempt.
        probe = (
            documents.limit(1000)
            .withColumn("_b2", bucket_expr(salt, n_buckets))
            .filter(F.col("bucket") != F.col("_b2"))
            .count()
        )
        if probe:
            raise ValueError(
                f"input_bucketed=True but the stored bucket column does not "
                f"match pmod(xxhash64(doc_id, {salt!r}), {n_buckets}) — "
                f"re-run prepare_bucketed_corpus with this job's salt/n_buckets"
            )
    else:
        bucketed = documents.withColumn("bucket", bucket_expr(salt, n_buckets))
    todo = bucketed.filter(F.col("bucket").isin(pending))
    if not input_bucketed:
        # salted repartition happens here: one shuffle, partitioned by bucket
        # so the dynamic-overwrite write aligns with processing partitions
        todo = todo.repartition(len(pending), "bucket")
    result = deidentify_attributes(
        todo, org_root, salt, with_metrics=True,
        date_mode=date_mode, date_offset=date_offset,
    )

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        result.write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(_data_path(out_dir))
    )

    # lineage metrics from the WRITTEN data (column-pruned scan, no recompute)
    written = spark.read.parquet(_data_path(out_dir)).filter(
        F.col("bucket").isin(pending)
    )
    # right-join against the full pending list so EMPTY buckets also commit
    # (otherwise a doc-less bucket would be "pending" forever on resume)
    pending_df = spark.createDataFrame([(b,) for b in pending], "bucket: int")
    lineage_rows = (
        written.groupBy("bucket")
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.sum(F.col("n_removed") + F.col("n_erased") + F.col("n_pseudonymized") + F.col("n_kept"))
            .cast("int")
            .alias("n_spans_in"),
            F.sum(F.size("spans")).cast("int").alias("n_spans_out"),
            F.sum("n_removed").cast("int").alias("n_removed"),
            F.sum("n_erased").cast("int").alias("n_erased"),
            F.sum("n_pseudonymized").cast("int").alias("n_pseudonymized"),
            F.sum("n_kept").cast("int").alias("n_kept"),
        )
        .join(pending_df, "bucket", "right")
        .na.fill(0)
        .withColumn("run_id", F.lit(run_id))
        .withColumn("status", F.lit("committed"))
        .select(
            "run_id", "bucket", "n_docs", "n_spans_in", "n_spans_out",
            "n_removed", "n_erased", "n_pseudonymized", "n_kept", "status",
        )
    )
    lineage_rows.write.mode("append").parquet(_lineage_path(out_dir))
    summary["processed"] = len(pending)

    # completion reconciliation: once every bucket is committed, the
    # lineage doc total must equal the source count (a metadata-cheap
    # parquet count) — catches rows whose stored bucket fell outside
    # range(n_buckets) and was therefore never selected by any attempt
    if input_bucketed and set(range(n_buckets)) <= (done | set(pending)):
        committed_docs = (
            spark.read.parquet(_lineage_path(out_dir))
            .filter((F.col("run_id") == run_id) & (F.col("status") == "committed"))
            .agg(F.sum("n_docs"))
            .collect()[0][0]
        ) or 0
        src_docs = documents.count()
        if committed_docs != src_docs:
            raise ValueError(
                f"bucketed run committed {committed_docs} documents but the "
                f"source has {src_docs} — the stored bucket column does not "
                f"cover range({n_buckets}) for every row (mixed prepares?)"
            )
        summary["reconciled_docs"] = int(committed_docs)
    return summary


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(_data_path(out_dir))


def run_extract_job(
    spark: SparkSession,
    raw_documents: DataFrame,
    out_dir: str,
    salt: str = "deidcm_spark",
    n_buckets: int = 32,
    run_id: str = "run0",
    max_buckets_this_attempt: int | None = None,
    input_bucketed: bool = False,
) -> dict:
    """Resumable main-content extraction (north_rule lane) under the same
    bucket-commit protocol as ``run_deid_job``: salted hash buckets, dynamic
    partition overwrite (idempotent bucket rewrite), lineage row appended
    only after the bucket's data is on disk, metrics aggregated from the
    WRITTEN output.  ``raw_documents`` = (doc_id, text, lang, source).

    ``input_bucketed=True`` — same contract as ``run_deid_job``: the input
    is stored clustered on this job's bucket function (string-cast doc_id),
    so the repartition exchange is skipped.
    """
    from deidcm_spark.operators import extract

    done = committed_buckets(spark, out_dir, run_id)
    pending = sorted(set(range(n_buckets)) - done)
    if max_buckets_this_attempt is not None:
        pending = pending[:max_buckets_this_attempt]
    summary = {"run_id": run_id, "committed_before": len(done), "processed": 0}
    if not pending:
        return summary

    # cast doc_id to string FIRST: the extractor emits string doc_ids, and
    # the write-side bucket recomputation below hashes that string.  A
    # STORED bucket column is never trusted here — it may have been hashed
    # from the pre-cast value (long doc_id), and a filter/write mismatch
    # would scatter rows across partitions and lose data on a resumed
    # dynamic overwrite.  Recomputing keeps filter ≡ write unconditionally;
    # input_bucketed then only skips the repartition (zero-exchange still
    # holds when the corpus was prepared from string-cast ids).
    bucketed = raw_documents.withColumn(
        "doc_id", F.col("doc_id").cast("string")
    ).withColumn("bucket", bucket_expr(salt, n_buckets))
    todo = bucketed.filter(F.col("bucket").isin(pending))
    if not input_bucketed:
        todo = todo.repartition(len(pending), "bucket")
    html = todo.select("doc_id", "bucket", F.expr(extract.html_expr("spark")).alias("html"))
    # mapInPandas consumes all columns; re-attach bucket afterwards is not
    # needed — extract preserves only (doc_id, spans), so compute the bucket
    # again from doc_id (pure function of doc_id+salt, no join)
    result = extract.extract_main_content(html).withColumn(
        "bucket",
        F.pmod(F.xxhash64("doc_id", F.lit(salt)), F.lit(n_buckets)).cast("int"),
    )

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    result.write.mode("overwrite").partitionBy("bucket").parquet(_data_path(out_dir))

    written = spark.read.parquet(_data_path(out_dir)).filter(
        F.col("bucket").isin(pending)
    )
    pending_df = spark.createDataFrame([(b,) for b in pending], "bucket: int")
    lineage_rows = (
        written.groupBy("bucket")
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.sum(F.size("spans")).cast("int").alias("n_spans_out"),
            F.sum(F.size(F.filter("spans", lambda s: s["kind"] == "text")))
            .cast("int").alias("n_text_spans"),
            F.sum(F.size(F.filter("spans", lambda s: s["kind"] == "media")))
            .cast("int").alias("n_media_spans"),
        )
        .join(pending_df, "bucket", "right")
        .na.fill(0)
        .withColumn("run_id", F.lit(run_id))
        .withColumn("status", F.lit("committed"))
        .select(
            "run_id", "bucket", "n_docs", "n_spans_out",
            "n_text_spans", "n_media_spans", "status",
        )
    )
    lineage_rows.write.mode("append").parquet(_lineage_path(out_dir))
    summary["processed"] = len(pending)
    return summary
