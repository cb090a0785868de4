"""DuckDB-side SQL generators for the driver oracle (non-trivial cases).

The driver contract runs ``oracle_sql()`` strings against a DuckDB with the
parquet tables registered as views — no Python UDFs, no parameters.  This
module generates pure-SQL re-derivations for semantics that LOOK
non-SQL-expressible:

* :func:`dec30_ctes` — ``str(int(sha256_hex, 16))[:30]`` (the gen_dicom_uid
  core, deid_mammogram.py:446-457) via 8x32-bit limb long division: nine
  passes of divide-by-10^9 over the limb array, each pass a chain of
  DuckDB lateral column aliases in BIGINT arithmetic.  Completely
  independent of the Python kernel — an actual arbitrary-precision base
  conversion in SQL.
* :func:`sign_bits_duck` — the hyperplane sign bits of
  ``similarity.signature_expr`` as explicit unrolled double chains
  (1-based list indexing, same IEEE accumulation order).
* :func:`boxes_sql` — the SQL-expressible OCR-box corpus (shared
  two-dialect spec; the Spark twin is ``__spark_entry__._sql_boxes``, which runs ``boxes_sql('spark')`` through ``spark.sql``): every coordinate /
  word / confidence is md5 arithmetic over doc_id, so Spark and DuckDB
  derive the identical box table from the ``documents`` view.
"""

from __future__ import annotations

_B = 1 << 32  # limb base (8 hex chars)
_D = 1_000_000_000  # division chunk: 9 decimal digits per pass
_N_LIMBS = 8  # 64 hex chars
_N_PASSES = 9  # 9 * 9 = 81 >= 78 decimal digits of 2^256


def dec30_ctes(src: str, hex_col: str, prefix: str = "hx") -> tuple[str, str, str]:
    """CTE chain converting ``hex_col`` (64 lowercase hex chars) in CTE
    ``src`` to its full decimal string, truncated to 30 digits.

    Returns ``(cte_fragment, last_cte_name, dec30_expr)``: splice
    ``cte_fragment`` into a WITH chain (it starts with a comma), then
    select ``dec30_expr`` FROM ``last_cte_name``.  All other columns of
    ``src`` are carried through via ``SELECT *``.
    """
    p = prefix
    # limb split, big-endian: limb 0 = most significant 8 hex chars
    limb_cols = ", ".join(
        f"CAST(concat('0x', substr({hex_col}, {1 + 8 * j}, 8)) AS bigint) AS {p}_a0_{j}"
        for j in range(_N_LIMBS)
    )
    ctes = [f"{p}_p0 AS (SELECT *, {limb_cols} FROM {src})"]
    # pass k: divide the limb vector a{k-1} by 10^9 -> quotient limbs a{k}
    # and remainder digit group g{k-1} (9 decimal digits, low groups first)
    for k in range(1, _N_PASSES + 1):
        pa = f"{p}_a{k - 1}"
        na = f"{p}_a{k}"
        cols = [
            f"{pa}_0 // {_D} AS {na}_0",
            f"{pa}_0 % {_D} AS {p}_s{k}_0",
        ]
        for j in range(1, _N_LIMBS):
            c = f"({p}_s{k}_{j - 1} * {_B} + {pa}_{j})"
            cols.append(f"{c} // {_D} AS {na}_{j}")
            cols.append(f"{c} % {_D} AS {p}_s{k}_{j}")
        cols.append(f"{p}_s{k}_{_N_LIMBS - 1} AS {p}_g{k - 1}")
        ctes.append(
            f"{p}_p{k} AS (SELECT *, {', '.join(cols)} FROM {p}_p{k - 1})"
        )
    groups = " || ".join(
        f"lpad(CAST({p}_g{k} AS varchar), 9, '0')"
        for k in range(_N_PASSES - 1, -1, -1)
    )
    dec = f"coalesce(nullif(ltrim({groups}, '0'), ''), '0')"
    fragment = ",\n".join(ctes)
    return ",\n" + fragment, f"{p}_p{_N_PASSES}", f"substr({dec}, 1, 30)"


def gen_dicom_uid_sql(src: str, uid_col: str, org_root: str,
                      prefix: str = "uidp") -> tuple[str, str, str]:
    """kernels.gen_dicom_uid for an empty patient_id over a UID column:
    ``org_root || '.' || first 30 decimal digits of sha256(uid sans dots)``.

    Returns ``(cte_fragment, last_cte_name, pseudonym_expr)``.
    """
    hashed = (
        f",\n{prefix}_h AS (SELECT *, sha256(replace({uid_col}, '.', '')) "
        f"AS {prefix}_hex FROM {src})"
    )
    frag, last, dec30 = dec30_ctes(f"{prefix}_h", f"{prefix}_hex", prefix)
    return hashed + frag, last, f"'{org_root}.' || {dec30}"


def sign_bits_duck(col: str, n_planes: int, dim: int) -> list[str]:
    """Hyperplane sign bits ('1'/'0' varchar exprs) for a DuckDB list
    column — the oracle twin of similarity.hyperplane_sign_expr.  Unrolled
    left-assoc chain == the Spark fold's IEEE accumulation order."""
    from deidcm_spark.operators.similarity import _plane_coeff

    bits = []
    for pl in range(n_planes):
        terms = " + ".join(
            f"CAST({col}[{d + 1}] AS double) * ({_plane_coeff(pl, d)})"
            for d in range(dim)
        )
        bits.append(f"CASE WHEN ({terms}) > 0 THEN '1' ELSE '0' END")
    return bits


# ---------------------------------------------------------------------------
# SQL-expressible OCR-box corpus (shared spec, two dialects)
# ---------------------------------------------------------------------------
# Unlike corpus.media_ground_truth (Mersenne-Twister-based, Python-only),
# every quantity here is md5 arithmetic — both engines derive the identical
# box table from the documents view, making the media-gate lane
# driver-oracle-checkable.  The categories still cover every redaction gate:
# len-1 words (X), authorized words (HELLO/SHOCR), low-confidence first
# boxes, edge boxes.

from deidcm_spark.schema import BOX_WORDS, MEDIA_H, MEDIA_W  # shared spec


def _h(key: str, dialect: str) -> str:
    """First-8-hex-chars-of-md5 as bigint — the shared integer hash."""
    if dialect == "spark":
        return f"cast(conv(substring(md5({key}), 1, 8), 16, 10) as bigint)"
    return f"CAST(concat('0x', substr(md5({key}), 1, 8)) AS bigint)"


def _media_gate(media_rate_millis: int) -> str:
    """THE media-membership predicate (corpus.has_media twin) — one copy
    shared by boxes_sql (both dialects) and media_universe_sql: an edit to
    one inlined copy would silently diverge the confusion matrix's TN
    population from the box corpus (dialect-identical text)."""
    return f"(doc_id % 1000003) * 2246822519 % 1000 < {media_rate_millis}"


def boxes_sql(dialect: str, media_rate_millis: int = 500) -> str:
    """SELECT producing (media_ref, box_idx, x1, y1, x2, y2, word,
    confidence) from the ``documents`` relation.  Same text modulo dialect
    differences (conv vs 0x-cast, sequence vs generate_series, 0- vs
    1-based list indexing)."""
    s = "string" if dialect == "spark" else "varchar"
    d = f"CAST(doc_id AS {s})"

    def key(*parts: str) -> str:
        return "concat('bx|', " + ", '|', ".join(parts) + ")"

    h_n = _h(key(d, "'n'"), dialect)
    b = "CAST(b AS " + s + ")"
    h_x1 = _h(key(d, b, "'x1'"), dialect)
    h_y1 = _h(key(d, b, "'y1'"), dialect)
    h_w = _h(key(d, b, "'w'"), dialect)
    h_h = _h(key(d, b, "'h'"), dialect)
    h_word = _h(key(d, b, "'word'"), dialect)
    h_c = _h(key(d, b, "'c'"), dialect)
    h_lc = _h(key(d, "'lc'"), dialect)
    words = ", ".join(f"'{w}'" for w in BOX_WORDS)
    if dialect == "spark":
        word = f"element_at(array({words}), cast({h_word} % 7 as int) + 1)"
        gen = (
            "LATERAL VIEW explode(sequence(0, cast(n_boxes as int) - 1)) t AS b"
        )
        frame = f"""
  SELECT doc_id, {h_n} % 5 AS n_boxes, {h_lc} % 100 < 15 AS low_conf_first
  FROM documents
  WHERE {_media_gate(media_rate_millis)}
"""
        body = f"""
SELECT concat('m_sql_', CAST(doc_id AS {s})) AS media_ref,
       cast(b as int) AS box_idx,
       cast({h_x1} % {MEDIA_W - 20} as int) AS x1,
       cast({h_y1} % {MEDIA_H - 12} as int) AS y1,
       cast(least({MEDIA_W - 1}, {h_x1} % {MEDIA_W - 20} + 8 + {h_w} % 17) as int) AS x2,
       cast(least({MEDIA_H - 1}, {h_y1} % {MEDIA_H - 12} + 4 + {h_h} % 7) as int) AS y2,
       {word} AS word,
       cast(if(b = 0 AND low_conf_first, 0.1d,
               round(0.35d + ({h_c} % 1000) / 1000.0d * 0.6d, 3)) as double) AS confidence
FROM ({frame}) src {gen}
WHERE n_boxes > 0
"""
        return body
    word = f"list_extract([{words}], CAST({h_word} % 7 AS int) + 1)"
    return f"""
SELECT 'm_sql_' || CAST(doc_id AS varchar) AS media_ref,
       CAST(b AS int) AS box_idx,
       CAST({h_x1} % {MEDIA_W - 20} AS int) AS x1,
       CAST({h_y1} % {MEDIA_H - 12} AS int) AS y1,
       CAST(least({MEDIA_W - 1}, {h_x1} % {MEDIA_W - 20} + 8 + {h_w} % 17) AS int) AS x2,
       CAST(least({MEDIA_H - 1}, {h_y1} % {MEDIA_H - 12} + 4 + {h_h} % 7) AS int) AS y2,
       {word} AS word,
       CAST(CASE WHEN b = 0 AND low_conf_first THEN 0.1
            ELSE round(0.35 + ({h_c} % 1000) / 1000.0 * 0.6, 3) END AS double) AS confidence
FROM (
  SELECT doc_id, {h_n} % 5 AS n_boxes, {h_lc} % 100 < 15 AS low_conf_first
  FROM documents
  WHERE {_media_gate(media_rate_millis)}
) f, unnest(generate_series(0, CAST(n_boxes AS int) - 1)) AS t(b)
WHERE n_boxes > 0
"""


def media_universe_sql(dialect: str, media_rate_millis: int = 500) -> str:
    """All media refs of the SQL box corpus (including zero-box images —
    they are the TN population of the confusion matrix)."""
    s = "string" if dialect == "spark" else "varchar"
    return (
        f"SELECT concat('m_sql_', CAST(doc_id AS {s})) AS media_ref "
        f"FROM documents WHERE {_media_gate(media_rate_millis)}"
    )
