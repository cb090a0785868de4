"""Raw-file source + span-level projection flags.

S1/S2 analogue for raw files (the reference walks a directory and parses each
file, ``deidcm/dicom/dicom2df.py:72-90``): ``spark.read.format("binaryFile")``
enumerates the tree distributedly (Catalyst handles listing parallelism and
partition sizing), and the parse to span form happens in pure SQL expressions
— one text span per non-empty ``key=value`` line, offsets in file order;
the filename stem is the document id.

P1 projection flags (``flat_dicom(with_private, with_pixels, with_seqs)``,
dicom2df.py:84-86) as an in-row span filter — ``filter()`` higher-order
function, JVM-side, no explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_PARSE_SPANS = """
filter(
  transform(
    split(decode(content, 'utf-8'), '\\n'),
    (line, i) -> named_struct(
      'kind', case when line like 'media:%' then 'media' else 'text' end,
      'text', case when line like 'media:%' then '' else line end,
      'media_ref', case when line like 'media:%' then substring(line, 7) else '' end,
      'offset', i)
  ),
  s -> s.text != '' or s.media_ref != ''
)
"""


def read_raw_documents(spark: SparkSession, path: str) -> DataFrame:
    """Directory of ``<doc_id>.spans`` text files → (doc_id, spans)."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.regexp_replace(
            F.element_at(F.split(F.col("path"), "/"), -1), r"\.[^.]*$", ""
        ).alias("doc_id"),
        F.expr(_PARSE_SPANS).alias("spans"),
    )


# a span is "private" when any tag in its key path has an odd group number
# (element.is_private, dicom2df.py:85); sequence content is any '@'-nested key
_PRIVATE = (
    "exists(regexp_extract_all(split(s.text, '=')[0], '0x([0-9a-f]{4})', 1),"
    " g -> conv(g, 16, 10) % 2 = 1)"
)
_IN_SEQ = "instr(split(s.text, '=')[0], '@') > 0"


def filter_spans(
    df: DataFrame,
    with_private: bool = False,
    with_seqs: bool = True,
    with_media: bool = True,
) -> DataFrame:
    """Span-level projection flags; pure in-row ``filter()`` HOF."""
    conds = []
    if not with_private:
        conds.append(f"not (s.kind = 'text' and {_PRIVATE})")
    if not with_seqs:
        conds.append(f"not (s.kind = 'text' and {_IN_SEQ})")
    if not with_media:
        conds.append("s.kind != 'media'")
    if not conds:
        return df
    pred = " and ".join(conds)
    return df.withColumn("spans", F.expr(f"filter(spans, s -> {pred})"))


def read_dcm_documents(
    spark: SparkSession, path: str, binary_vr: str = "strict"
) -> DataFrame:
    """Directory of real ``.dcm`` files → (doc_id, spans, width, height,
    channels, bits, pixels) — the full dicom2df analogue over BINARY DICOM
    (dicom2df.py:72-90 walks a tree and parses each file with pydicom; here
    ``binaryFile`` enumerates distributedly and ``dcm.parse_part10`` decodes
    each stream executor-side).

    Text elements become spans in file (= ascending tag) order — INCLUDING
    the group-0002 file meta, exactly like the reference's flat_dicom which
    chains ``ds.file_meta`` and ``ds`` (dicom2df.py:83); an embedded
    pixel module becomes a media span whose ``media_ref`` is ``m_<doc_id>``
    with the payload carried in the flat columns (NULL when the file has no
    PixelData).  ``documents_view``/``payloads_view`` below split the result
    into the engine's two-table shape."""
    import pandas as pd

    from deidcm_spark.dcm import keyword_map, parse_part10
    from deidcm_spark.schema import SPAN_SCHEMA

    out_schema = StructType(
        [
            StructField("doc_id", StringType(), False),
            StructField("spans", SPAN_SCHEMA, False),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("channels", IntegerType(), True),
            StructField("bits", IntegerType(), True),
            StructField("pixels", BinaryType(), True),
        ]
    )
    keywords = keyword_map()  # closed over → shipped once per task

    def run(batches):
        from urllib.parse import unquote

        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                # inverse of export_dcm's percent-encoded filenames
                # (identity for names that never needed encoding)
                doc_id = unquote(p.rsplit("/", 1)[-1].rsplit(".", 1)[0])
                parsed = parse_part10(bytes(content), keywords=keywords,
                                      include_meta=True, binary_vr=binary_vr)
                spans = parsed["spans"]
                row = {"doc_id": doc_id, "spans": spans, "width": None,
                       "height": None, "channels": None, "bits": None,
                       "pixels": None}
                if parsed["media"] is not None:
                    m = parsed["media"]
                    spans.append({"kind": "media", "text": "",
                                  "media_ref": f"m_{doc_id}",
                                  "offset": len(spans)})
                    row.update({k: m[k] for k in
                                ("width", "height", "channels", "bits",
                                 "pixels")})
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=["doc_id", "spans", "width", "height",
                               "channels", "bits", "pixels"])

    raw = spark.read.format("binaryFile").load(path)
    return raw.select("path", "content").mapInPandas(run, out_schema)


def documents_view(dcm_df: DataFrame) -> DataFrame:
    """(doc_id, spans) projection of :func:`read_dcm_documents`."""
    return dcm_df.select("doc_id", "spans")


def payloads_view(dcm_df: DataFrame) -> DataFrame:
    """media_payloads projection (MEDIA_PAYLOADS_SCHEMA shape) of
    :func:`read_dcm_documents` — one row per file with PixelData."""
    return dcm_df.filter(F.col("pixels").isNotNull()).select(
        F.concat(F.lit("m_"), F.col("doc_id")).alias("media_ref"),
        "width", "height", "channels", "bits", "pixels",
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist a table bucketed (and sorted) on its join key.

    At 100 TB the big-big joins (e.g. span table x media-payload table, or
    repeated joins against the same doc_id key) should be co-located: both
    sides bucketed on the key with the same bucket count → the sort-merge
    join reads matching buckets file-to-file with NO exchange and (sorted)
    no sort.  ``test_plans.test_bucketed_join_no_exchange`` asserts the
    plan shape.  Spark-native bucketing (in-memory/warehouse catalog), the
    sandbox stand-in for Iceberg's ``bucket(N, key)`` partition transform.
    """
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession

    def _clear(name: str) -> None:
        # a stale location left by a PREVIOUS session's warehouse blocks
        # saveAsTable (LOCATION_ALREADY_EXISTS) even in overwrite mode,
        # because the new session's catalog has no entry to drop
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        if warehouse:
            shutil.rmtree(
                f"{warehouse.rstrip('/')}/{name.lower()}", ignore_errors=True
            )

    # WRITE-THEN-SWAP: materialize into a staging table first so (a) the
    # current table survives a mid-write failure, and (b) re-bucketing a
    # table from itself (df derived from spark.table(table)) still has its
    # source on disk while the plan executes.  The swap itself renames the
    # old table to a backup BEFORE the staging table takes its name, so no
    # step ever deletes the only copy: a crash mid-swap leaves the data in
    # __staging and/or __backup, both recoverable (the backup is dropped
    # only after the new table is in place).
    staging = f"{table}__staging"
    backup = f"{table}__backup"
    _clear(staging)
    _clear(backup)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(staging)
    if spark.catalog.tableExists(table):
        spark.sql(f"ALTER TABLE {table} RENAME TO {backup}")
    else:
        # stale location without a catalog entry (previous session's
        # warehouse): move it aside rather than deleting it pre-swap
        import os

        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        old_loc = f"{warehouse.rstrip('/')}/{table.lower()}"
        if warehouse and os.path.exists(old_loc):
            os.rename(old_loc, f"{warehouse.rstrip('/')}/{backup.lower()}_loc")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
    _clear(backup)
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    if warehouse:
        shutil.rmtree(f"{warehouse.rstrip('/')}/{backup.lower()}_loc", ignore_errors=True)


def register_bucketed(
    spark,
    table: str,
    location: str,
    schema_ddl: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Re-attach a bucketed table written by a PREVIOUS session.

    :func:`write_bucketed` records the bucket spec in the session catalog;
    with the sandbox's in-memory catalog that metadata dies with the
    session, so a fresh job reading the same files as plain parquet loses
    the exchange elimination the layout paid for.  This issues the
    Spark-native datasource DDL (``USING parquet CLUSTERED BY ...
    LOCATION ...``) over the existing files — pure metadata, no data is
    read or moved — after which ``spark.table(table)`` scans report
    ``HashPartitioning(bucket_col)`` and a ``groupBy(bucket_col)`` or a
    same-bucketing join runs with ZERO exchanges
    (tests/test_plans.py asserts both).  In a real deployment a
    persistent catalog (Hive metastore / Iceberg ``bucket(N, key)``)
    carries this metadata; this helper is the explicit stand-in.
    """
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    sorted_by = f"SORTED BY ({bucket_col}) " if sort else ""
    spark.sql(
        f"CREATE TABLE {table} ({schema_ddl}) USING parquet "
        f"CLUSTERED BY ({bucket_col}) {sorted_by}INTO {n_buckets} BUCKETS "
        f"LOCATION '{location}'"
    )
