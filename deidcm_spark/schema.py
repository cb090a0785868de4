"""Fixed nested schema for the interleaved text+media document table.

The reference flattens every DICOM element of a file into one dynamically
named pandas column (``deidcm/dicom/dicom2df.py:93-122``); the entire element
schema is serialized into the column NAME
(``{Keyword}_{0xGGGGEEEE}_{VR}_{VM}_{dWidth}_{uLen}_{mBytes}_{sVR}``, nested
sequences as ``Parent..._SQ_...@{i}.Child...``).  That is hostile to a
columnar engine: the column set is per-corpus and unbounded.

Here the same information rides a FIXED schema — one row per document, the
elements as an ordered span array.  A text span's ``text`` field is
``"<attr_key>=<encoded_value>"`` where ``attr_key`` is the reference's
column-name encoding verbatim, so fixtures line up byte-for-byte; a media
span carries a pointer into a payload table instead of inline pixels.
"""

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), False),
    ]
)

SPAN_SCHEMA = ArrayType(SPAN_STRUCT, False)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", SPAN_SCHEMA, False),
    ]
)

# Synthetic media payloads (analogue of DICOM PixelData, stored out-of-row so
# shuffles stay slim — SURVEY.md §7 risk register: media rides media_ref
# pointers, not inline bytes).
MEDIA_PAYLOADS_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("channels", IntegerType(), False),
        StructField("bits", IntegerType(), False),
        StructField("pixels", BinaryType(), False),
    ]
)

# Ground-truth OCR boxes embedded by the corpus synthesizer and consumed by
# the deterministic OCR stub (contract mirrors easyOCR's
# ``(4-corner box, text, confidence)`` output, deid_mammogram.py:169-174).
OCR_BOXES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("box_idx", IntegerType(), False),
        StructField("x1", IntegerType(), False),
        StructField("y1", IntegerType(), False),
        StructField("x2", IntegerType(), False),
        StructField("y2", IntegerType(), False),
        StructField("word", StringType(), False),
        StructField("confidence", DoubleType(), False),
    ]
)

RECIPE_SCHEMA = StructType(
    [
        StructField("tag", StringType(), False),
        StructField("keyword", StringType(), True),
        StructField("vr", StringType(), True),
        StructField("action", StringType(), False),
    ]
)

SPECIFIC_RULES_SCHEMA = StructType(
    [
        StructField("child_tag", StringType(), False),
        StructField("seq_tag", StringType(), False),
        StructField("rule", StringType(), False),
    ]
)

LINEAGE_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("bucket", IntegerType(), False),
        StructField("n_docs", IntegerType(), False),
        StructField("n_spans_in", IntegerType(), False),
        StructField("n_spans_out", IntegerType(), False),
        StructField("n_removed", IntegerType(), False),
        StructField("n_erased", IntegerType(), False),
        StructField("n_pseudonymized", IntegerType(), False),
        StructField("n_kept", IntegerType(), False),
        StructField("status", StringType(), False),
    ]
)


# ---------------------------------------------------------------------------
# shared media-fixture constants — single source of truth (corpus synthesis,
# the SQL box corpus in duck_oracle, and the redaction operators all key off
# these; divergent copies would silently break gate/clamp parity)
# ---------------------------------------------------------------------------

MEDIA_W = MEDIA_H = 96
BOX_WORDS = ["JTRX4", "DSLC72", "PATIENT", "X", "HELLO", "SHOCR", "NAME22"]
