"""Top-level composed pipelines — the two north-star flows as one call each.

**Free-text lane** (web-style interleaved content):

    raw documents (doc_id, text, lang, source)
      → free-text PHI scrub   (scrub.py: date/time/email/name regex chain +
                               consistent salted-hash UID remap)
      → main-content extraction (extract.py: DOM heuristics → interleaved
                               text+media spans)

    The scrub IS the de-identification for free text; the recipe lane
    below is for attribute-encoded spans only (a free-text span has no
    DICOM tag path, so the zero-trust recipe would RETIRER it —
    deliberately: unclassifiable content must not leak).

**Structured lane** (attribute-encoded spans, the reference's pipeline):

    raw documents → ingest.documents_to_spans (recipe-tagged span form)
      → salted repartition → recipe de-identification (deidentify.py,
        Arrow kernel; marker span appended)

Both compositions are narrow chains — the only shuffle anywhere is the
mandated salted repartition before the deid kernel.  Resumable variants:
lineage.run_extract_job / run_deid_job; incremental: streaming.*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from deidcm_spark.ingest import documents_to_spans
from deidcm_spark.operators import extract, scrub
from deidcm_spark.operators.deidentify import deidentify_attributes


def scrub_extract(
    raw_documents: DataFrame,
    org_root: str,
    names: list[str] | None = None,
) -> DataFrame:
    """(doc_id, text, lang, source) → PHI-scrubbed main-content spans."""
    scrubbed = scrub.scrub_documents(raw_documents, org_root, names)
    return extract.extract_main_content(extract.with_html(scrubbed))


def ingest_deidentify(
    raw_documents: DataFrame,
    org_root: str,
    salt: str = "deidcm_spark",
    num_partitions: int | None = None,
    with_metrics: bool = False,
) -> DataFrame:
    """(doc_id, text, lang, source) → de-identified attribute-span table."""
    spans = documents_to_spans(raw_documents)
    return deidentify_attributes(
        spans, org_root, salt,
        num_partitions=num_partitions, with_metrics=with_metrics,
    )


def curate(
    spark,
    docs: DataFrame,
    out_dir: str,
    seq_len: int = 2048,
    gate_overrides: dict | None = None,
    min_line_chars: int = 1,
    nfc: bool = False,
    hash_impl: str = "fast",
    pii: bool = False,
    classifier_positive: DataFrame | None = None,
    classifier_alpha: float = 9.0,
) -> dict:
    """The full training-data curation flow as ONE job — the pipeline a
    100 TB pretraining corpus actually runs, each stage an operator this
    engine already oracles individually:

        raw (doc_id, text)
          → normalize_text      (codegen hygiene; typographic variants
                                 collapse to one dedup fingerprint)
          → scrub_pii           (optional, ``pii=True``: Luhn cards,
                                 phones, IPv4 — zero-shuffle Arrow pass
                                 fused into the normalize write)
          → quality_gate        (Gopher/C4 rule cascade, keep == no
                                 violated rule)
          → classifier gate     (optional, ``classifier_positive=``:
                                 GPT-3 NB + Pareto acceptance over the
                                 gate survivors; raw-as-negative)
          → line_dedup          (corpus-duplicated boilerplate lines out,
                                 documents rebuilt)
          → exact dedup         (NORM_FP winners, smallest doc_id kept)
          → pack_sequences      (fixed seq_len pieces, the loader layout)

    Every stage MATERIALIZES to ``<out_dir>/<stage>`` and the next stage
    reads the parquet back — deliberate at scale: a stage barrier caps
    recomputation on failure, makes each intermediate inspectable /
    resumable, and keeps any one job's lineage shallow (the same reason
    lineage.run_deid_job commits per bucket).  Returns the stage-by-stage
    document accounting (the drop-mass ledger a dataset card needs).
    """
    from pyspark.sql import functions as F

    from deidcm_spark.operators import dedup, spandedup, textops

    base = docs.select("doc_id", "text")

    norm = textops.normalize_text(base, nfc=nfc)
    if pii:
        from deidcm_spark.operators.scrub import scrub_pii

        norm = scrub_pii(norm)  # row-local: fuses into the same write
    norm.write.mode("overwrite").parquet(f"{out_dir}/normalized")
    norm = spark.read.parquet(f"{out_dir}/normalized")
    # normalize/scrub are row-preserving, so the input count is free from
    # the materialized parquet's footers — counting `base` directly would
    # be one extra full pass over the raw corpus
    n_in = norm.count()

    gate = textops.quality_gate(norm, overrides=gate_overrides)
    kept = norm.join(
        gate.filter("keep").select("doc_id"), "doc_id", "left_semi"
    )
    kept.write.mode("overwrite").parquet(f"{out_dir}/gated")
    kept = spark.read.parquet(f"{out_dir}/gated")
    n_gated = kept.count()

    n_classified = None
    if classifier_positive is not None:
        from deidcm_spark.operators.classify import quality_classifier_select

        chosen = quality_classifier_select(
            kept, classifier_positive.select("doc_id", "text"), norm,
            alpha=classifier_alpha, hash_impl=hash_impl,
        ).select("doc_id")
        kept = kept.join(chosen, "doc_id", "left_semi")
        kept.write.mode("overwrite").parquet(f"{out_dir}/classified")
        kept = spark.read.parquet(f"{out_dir}/classified")
        n_classified = kept.count()

    ld = spandedup.line_dedup(
        kept, min_line_chars=min_line_chars, hash_impl=hash_impl
    ).select("doc_id", "text")
    ld.write.mode("overwrite").parquet(f"{out_dir}/line_deduped")
    ld = spark.read.parquet(f"{out_dir}/line_deduped")

    winners = dedup.dedup_exact(ld).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    final = ld.join(winners, "doc_id", "left_semi")
    final.write.mode("overwrite").parquet(f"{out_dir}/deduped")
    final = spark.read.parquet(f"{out_dir}/deduped")
    n_final = final.count()

    packed = textops.pack_sequences(final, seq_len=seq_len)
    packed.write.mode("overwrite").parquet(f"{out_dir}/sequences")
    packed = spark.read.parquet(f"{out_dir}/sequences")
    n_seq = int(packed.agg(F.countDistinct("seq_id")).first()[0])

    out = {
        "docs_in": n_in,
        "docs_after_gate": n_gated,
        "docs_after_dedup": n_final,
        "sequences": n_seq,
        "seq_len": seq_len,
    }
    if n_classified is not None:
        out["docs_after_classifier"] = n_classified
    return out
