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
