"""Free-text PHI scrubbing (north_star: "regex+dictionary PHI scrubbing
(names, dates, UIDs) with consistent salted-hash UID remapping").

The recipe lane (operators/deidentify.py) handles *structured* attribute
spans; this lane scrubs *free text* — the extracted main content of the
interleaved corpus (operators/extract.py) or any plain text column:

* **dates**  — coarsened to January 1st, year preserved (the same policy as
  the recipe's DA/DT action, deid_mammogram.py:483-485): ``2021-07-19`` →
  ``2021-01-01``, ``19/07/2021`` → ``01/01/2021``, bare ``20210719`` →
  ``20210101``;
* **times**  — ``14:31:07`` → ``00:00:00`` (recipe TM action analogue);
* **emails** — local part replaced: ``[EMAIL]@domain`` (domain kept —
  population-level, not identifying);
* **names**  — dictionary-driven word-boundary replacement with
  ``[NAME]`` (broadcast list — the engine analogue of deidcm's
  authorized-words dictionary, inverted: listed words are *redacted*
  here, matching PHI-scrub semantics);
* **UIDs**   — dotted OIDs (``1.2.840....``) remapped through the SAME
  deterministic salted-hash as the recipe lane (kernels.gen_dicom_uid):
  one UID maps to one pseudonym EVERYWHERE in the corpus — referential
  integrity across documents survives scrubbing.

All but the UID stage are pure ``regexp_replace`` chains — whole-stage
codegen, byte-identical DuckDB oracle (two-dialect spec like
operators/extract.py).  The UID stage needs sha256→decimal (not
SQL-expressible) and runs as one Arrow-batched ``mapInPandas`` pass.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from deidcm_spark.kernels import gen_dicom_uid

# ---------------------------------------------------------------------------
# shared regex spec (Java regex and RE2 agree on this subset)
# ---------------------------------------------------------------------------

DATE_ISO_RE = r"(\d{4})-(\d{2})-(\d{2})"          # 2021-07-19
DATE_EU_RE = r"(\d{2})/(\d{2})/(\d{4})"            # 19/07/2021
DATE_BARE_RE = r"\b(\d{4})(0[1-9]|1[0-2])(\d{2})\b"  # 20210719
TIME_RE = r"\b(\d{2}):(\d{2}):(\d{2})\b"
# the local part must not be preceded by '@' or another local-part char —
# otherwise "a@b@c" rescrubs forever ("[EMAIL]@b@c" → "[EMAIL]@[EMAIL]@c").
# RE2 (the DuckDB oracle) has no lookbehind, so the preceding char is a
# captured prefix group re-emitted in the replacement.
EMAIL_RE = r"(^|[^@A-Za-z0-9._%+-])([A-Za-z0-9._%+-]+)@([A-Za-z0-9.-]+)"
UID_RE = r"\b\d+(?:\.\d+){3,}\b"                   # dotted OID, >= 4 arcs

# (pattern, spark_replacement, duckdb_replacement) applied in ORDER
_SQL_STEPS: list[tuple[str, str, str]] = [
    (DATE_ISO_RE, "$1-01-01", r"\1-01-01"),
    (DATE_EU_RE, "01/01/$3", r"01/01/\3"),
    (DATE_BARE_RE, "$10101", r"\10101"),
    (TIME_RE, "00:00:00", "00:00:00"),
    (EMAIL_RE, "$1[EMAIL]@$3", r"\1[EMAIL]@\3"),
]


def _pat_sql(pat: str, dialect: str) -> str:
    # Spark SQL string literals process backslash escapes (\b would become
    # backspace) — double them; DuckDB literals are raw
    return pat.replace("\\", "\\\\") if dialect == "spark" else pat


def scrub_text_expr(col: str, names: list[str], dialect: str = "spark") -> str:
    """The SQL-expressible scrub chain (dates, times, emails, name
    dictionary) as one nested regexp_replace expression."""
    g = ", 'g'" if dialect == "duckdb" else ""
    e = col
    for pat, spark_rep, duck_rep in _SQL_STEPS:
        rep = spark_rep if dialect == "spark" else duck_rep
        e = f"regexp_replace({e}, '{_pat_sql(pat, dialect)}', '{rep}'{g})"
    if names:
        # names are user input (CLI --names): regex-escape each one (re.escape
        # emits only the \<punct> forms Java regex and RE2 share for ASCII) and
        # escape single quotes for the SQL string literal ('' in both dialects)
        alt = "|".join(re.escape(n) for n in sorted(names))
        name_pat = _pat_sql(rf"(?i)\b({alt})\b", dialect).replace("'", "''")
        e = f"regexp_replace({e}, '{name_pat}', '[NAME]'{g})"
    return e


def scrub_text(df: DataFrame, names: list[str] | None = None,
               text_col: str = "text") -> DataFrame:
    """Plain-text column scrub — pure codegen, no Python."""
    return df.withColumn(
        text_col, F.expr(scrub_text_expr(text_col, names or []))
    )


# ---------------------------------------------------------------------------
# consistent UID remapping (salted hash, same kernel as the recipe lane)
# ---------------------------------------------------------------------------

_UID_PAT = re.compile(UID_RE)


def remap_uids_in_text(text: str, org_root: str) -> str:
    """Replace every dotted OID with its deterministic pseudonym.  Same
    input UID → same output UID across every call site (kernels.
    gen_dicom_uid parity with the structured lane)."""
    return _UID_PAT.sub(lambda m: gen_dicom_uid("", m.group(0), org_root), text)


def scrub_uids(df: DataFrame, org_root: str, text_col: str = "text") -> DataFrame:
    """Arrow-batched UID remap pass (sha256→30-decimal-digit is not
    SQL-expressible).  A per-batch memo dict makes repeated UIDs a hash
    hit — the corpus-wide UID universe is far smaller than its mentions."""
    schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, str] = {}

        def remap(m: re.Match) -> str:
            uid = m.group(0)
            hit = memo.get(uid)
            if hit is None:
                hit = memo[uid] = gen_dicom_uid("", uid, org_root)
            return hit

        for pdf in batches:
            pdf[text_col] = [
                _UID_PAT.sub(remap, t) if t else t for t in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema)


def scrub_documents(
    df: DataFrame,
    org_root: str,
    names: list[str] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Full free-text scrub: UID remap first (dotted OIDs would otherwise
    be chewed by the bare-date rule), then the SQL chain."""
    return scrub_text(scrub_uids(df, org_root, text_col), names, text_col)


def scrub_spans(df: DataFrame, names: list[str] | None = None) -> DataFrame:
    """Scrub the TEXT spans of an interleaved (doc_id, spans) table in-row
    — ``transform()`` higher-order function, media spans untouched, order
    preserved.  (SQL chain only; compose with scrub_uids via
    posexplode/regroup or run scrub_documents upstream on raw text.)"""
    inner = scrub_text_expr("s.text", names or [])
    return df.withColumn(
        "spans",
        F.expr(
            "transform(spans, s -> if(s.kind = 'text', "
            f"named_struct('kind', s.kind, 'text', {inner}, "
            "'media_ref', s.media_ref, 'offset', s.offset), s))"
        ),
    )


def scrub_spans_full(
    df: DataFrame, org_root: str, names: list[str] | None = None
) -> DataFrame:
    """Complete span-table scrub: UID remap FIRST (an OID arc that looks
    like a bare date would otherwise be chewed by the date rule — same
    ordering as scrub_documents; a remapped 30-digit arc can never match
    the 8-digit \\b-bounded date pattern), then the SQL chain via in-row
    ``transform()``.  Media spans and order untouched; same memo-per-batch
    as scrub_uids so repeated UIDs hash once."""
    schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, str] = {}

        def remap(m: re.Match) -> str:
            uid = m.group(0)
            hit = memo.get(uid)
            if hit is None:
                hit = memo[uid] = gen_dicom_uid("", uid, org_root)
            return hit

        for pdf in batches:
            pdf["spans"] = [
                [
                    {**s, "text": _UID_PAT.sub(remap, s["text"])}
                    if s["kind"] == "text" and s["text"]
                    else s
                    for s in spans
                ]
                for spans in pdf["spans"]
            ]
            yield pdf

    return scrub_spans(df.mapInPandas(run, schema), names)
