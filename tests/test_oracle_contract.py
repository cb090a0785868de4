"""In-suite slice of the driver's correctness gate: a representative subset
of queries() vs oracle_sql() compared Spark-vs-DuckDB at sf0.001, so plain
``pytest`` guards the contract even without running tools/check_oracle.py
(which remains the full 51-query sweep)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# one per oracle strategy: limb-division SQL, LSH probe SQL, recipe-derived
# metrics, VALUES-from-independent-oracle, box-corpus SQL, prefix-sum
# window, recursive closure
SUBSET = [
    "phi_scrub_uids", "ann_lsh", "deid_ingest_testdata", "deid_recipe_cases",
    "media_redaction", "pack_shards", "neardup_components",
]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = "|".join(_canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_contract_query_matches_oracle(spark, duck, name):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    sdf = qs[name](spark, SF)
    srows = sdf.collect()
    cur = duck.execute(oracles[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols), (sdf.columns, dcols)
    assert len(srows) == len(drows)
    assert _multiset(sdf.columns, [tuple(r) for r in srows]) == _multiset(dcols, drows)
