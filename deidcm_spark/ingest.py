"""Ingest: map a plain documents table into the span model.

The analogue of the reference's parse+flatten stage (S2/S3,
``deidcm/dicom/dicom2df.py:31-90``): there, a DICOM file becomes one wide
row; here, a (doc_id, text, lang, source, n_chars) row becomes one
``(doc_id, spans)`` row — a handful of attribute-encoded metadata spans plus
the body chunked into fixed-size text spans under a recipe-governed key.

Pure Spark SQL expressions (codegen; no Python), so ingest runs at scan
speed and Catalyst prunes unused source columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CHUNK = 200

# body chunks ride ImageComments (0x00204000, LT) — a recipe-governed tag;
# metadata spans use real recipe tags so every action class is exercised.
# doc_id may be NON-NUMERIC (the WARC lane's md5-hex ids): date arithmetic
# goes through try_cast with an ascii fallback (ANSI would otherwise raise
# CAST_INVALID_INPUT), and text/lang/source are coalesced — a NULL field
# must never null-propagate into a span's text (the correctness surface).
# Mirrored verbatim in __spark_entry__._ingest_spans_cte.
_DID = ("coalesce(try_cast(doc_id as bigint), "
        "ascii(substring(cast(doc_id as string), 1, 1)), 0)")

_SPAN_EXPR = f"""
concat(
  array(
    named_struct('kind', 'text',
                 'text', concat('SOPInstanceUID_0x00080018_UI_1____=1.2.840.', cast(doc_id as string)),
                 'media_ref', '', 'offset', 0),
    named_struct('kind', 'text',
                 'text', concat('PatientName_0x00100010_PN_1____=Doc ', cast(doc_id as string), ' Author'),
                 'media_ref', '', 'offset', 1),
    named_struct('kind', 'text',
                 'text', concat('StudyDate_0x00080020_DA_1____=2023', lpad(cast({_DID} % 12 + 1 as string), 2, '0'), lpad(cast({_DID} % 28 + 1 as string), 2, '0')),
                 'media_ref', '', 'offset', 2),
    named_struct('kind', 'text',
                 'text', concat('SpecificCharacterSet_0x00080005_CS_1____=', coalesce(lang, '')),
                 'media_ref', '', 'offset', 3),
    named_struct('kind', 'text',
                 'text', concat('InstitutionName_0x00080080_LO_1____=', coalesce(source, '')),
                 'media_ref', '', 'offset', 4)
  ),
  transform(
    sequence(0, cast(greatest(ceil(length(coalesce(text, '')) / {CHUNK}.0) - 1, 0) as int)),
    i -> named_struct('kind', 'text',
                      'text', concat('ImageComments_0x00204000_LT_1____=', substring(coalesce(text, ''), i * {CHUNK} + 1, {CHUNK})),
                      'media_ref', '', 'offset', 5 + i)
  )
)
"""


def documents_to_spans(df: DataFrame) -> DataFrame:
    """(doc_id, text, lang, source, ...) → (doc_id, spans) span-form table."""
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.expr(_SPAN_EXPR).alias("spans"),
    )
