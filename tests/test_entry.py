"""Driver-contract smoke tests: entry() runs, every queries() entry returns a
DataFrame, and a fast subset of oracle_sql() matches DuckDB exactly
(the full sweep is tools/check_oracle.py, run at sf0.01)."""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tools.check_oracle import canon as _canon, frame_multiset as _multiset

SF = "/root/testdata/sf0.001"

FAST_ORACLE_SUBSET = [
    "q1_pricing_summary",
    "join_customer_nation_region",
    "orders_priority_counts",
    "rule_classification",
    "scalar_kernels",
    "text_stats",
    "gopher_repetition",
    "decontaminate",
    "passage_dedup",
    "events_asof_join",
    "dedup_exact",
    "ann_threshold",
]


# canonicalization is imported from tools.check_oracle — ONE spec: a local
# copy drifted once (missing bool branch, coarser float precision), making
# the fast pytest subset and the full gate silently disagree


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "doc_id", "n_spans_out", "n_removed", "n_erased", "n_pseudonymized", "n_kept"
    }


def test_every_query_key_has_callable():
    qs = entry_mod.queries()
    # EXACTLY 50: the driver caps its CORRECTNESS artifact at 50 entries
    # and silently drops the 51st (r2 observation; CLAUDE.md invariant) —
    # >= checks let an over-cap entry ship unverified
    assert len(qs) == 50
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 15


@pytest.mark.parametrize("name", FAST_ORACLE_SUBSET)
def test_oracle_subset_matches(spark, duck, name):
    sdf = entry_mod.queries()[name](spark, SF)
    srows = sdf.collect()
    res = duck.execute(entry_mod.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    sm = _multiset(sdf.columns, [[r[c] for c in sdf.columns] for r in srows])
    om = _multiset(ocols, orows)
    assert sm == om


# --- driver canonicalizer contract (r4 regression: quality_gate red row) ---
#
# The driver canonicalizes each queries() output with pandas
# ``df.sort_values(by=<all columns>)`` before hashing; list/dict-typed cells
# are unhashable there, so EVERY contract output column must be scalar-typed.
# tools/check_oracle.assert_scalar_schema is the local gate; these tests pin
# (a) that the gate rejects non-scalar schemas loudly, and (b) that every
# current contract entry passes a faithful simulation of the driver's canon.

def test_scalar_schema_gate_rejects_arrays(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.check_oracle import assert_scalar_schema

    import pyspark.sql.functions as F

    bad = spark.range(3).select("id", F.array(F.lit("a"), F.lit("b")).alias("reasons"))
    with pytest.raises(TypeError, match="non-scalar"):
        assert_scalar_schema("bad_query", bad)

    good = spark.range(3).select("id", F.lit("a|b").alias("reasons"))
    assert assert_scalar_schema("good_query", good) == []


def test_all_contract_queries_scalar_schema(spark):
    """Every queries() entry must produce only scalar-typed columns (schema
    analysis only — no execution), so no future promotion can repeat the r4
    array<string> driver failure."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.check_oracle import assert_scalar_schema

    for name, fn in entry_mod.queries().items():
        assert_scalar_schema(name, fn(spark, SF))


def test_quality_gate_survives_driver_canonicalizer(spark):
    """Faithful replica of the driver-side pandas canonicalization that broke
    in r4 (sort_values over all columns → Categorical factorize → hash)."""
    sdf = entry_mod.queries()["quality_gate"](spark, SF)
    pdf = sdf.toPandas()
    canon = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    assert len(canon) == len(pdf)
    assert canon["reasons"].map(type).eq(str).all()


def test_ingest_handles_string_ids_and_null_fields(spark):
    """The WARC lane feeds md5-hex doc_ids into the ingest span synth:
    date arithmetic must not ANSI-raise on a non-numeric id, and NULL
    text/lang/source must never null-propagate into a span's text (both
    mirrored in the DuckDB CTE — a cross-engine spot check runs here)."""
    import duckdb

    from deidcm_spark.ingest import documents_to_spans
    import __spark_entry__ as e

    df = spark.createDataFrame(
        [("9e107d9d2a", "hello world", None, None),
         ("12", None, "en", "s")],
        "doc_id string, text string, lang string, source string",
    )
    got = {r["doc_id"]: [s["text"] for s in r["spans"]]
           for r in documents_to_spans(df).collect()}
    assert all(t is not None for texts in got.values() for t in texts)
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE documents AS "
        "SELECT '9e107d9d2a' AS doc_id, 'hello world' AS text, "
        "CAST(NULL AS varchar) AS lang, CAST(NULL AS varchar) AS source "
        "UNION ALL SELECT '12', NULL, 'en', 's'"
    )
    duck: dict = {}
    for doc_id, pos, _kind, text, _mr in con.sql(e._ingest_spans_sql()).fetchall():
        duck.setdefault(doc_id, {})[pos] = text
    for k, texts in got.items():
        assert texts == [duck[k][i] for i in sorted(duck[k])]
