"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at a given sf dir, compare row count,
column names, and an order-insensitive value multiset (canonicalized).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entry_mod
from deidcm_spark.session import get_spark

from pyspark.sql import types as T


def assert_scalar_schema(name: str, sdf) -> list[str]:
    """The driver's pandas canonicalizer sorts cell values and cannot hash
    list/dict-typed cells (r4: quality_gate red on array<string>).  Every
    contract output column MUST be scalar-typed; fail loudly otherwise."""
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    if bad:
        raise TypeError(
            f"{name}: non-scalar output column(s) {bad} — the driver's "
            "canonicalizer rejects Array/Map/Struct cells; project through "
            "array_join()/to_json() to a scalar (see CLAUDE.md)"
        )
    return bad

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v) -> str:
    """FULL-precision canonicalization — the driver hashes the values the
    entries emit, so the local gate must too: the old 6-significant-digit
    collapse certified values the driver could reject (sum_base_price ~3e9
    tolerated ~1e4 of cross-engine drift).  Entries pre-round every float
    (CLAUDE.md), so exact repr equality is the contract.  DuckDB DECIMAL
    results normalize through float first ('123.400' vs '123.4')."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def frame_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = "|".join(canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check_oracle", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # the driver caps the CORRECTNESS artifact at 50 entries and SILENTLY
    # drops the 51st (r2 observation, CLAUDE.md invariant) — fail loudly
    if len(queries) != 50:
        raise SystemExit(
            f"queries() has {len(queries)} entries — the driver contract is "
            f"EXACTLY 50 (a 51st is silently dropped); merge or split entries"
        )
    unknown = only - set(queries)
    if unknown:
        # a typo'd name would otherwise skip everything and print ALL OK
        raise SystemExit(f"unknown query name(s): {sorted(unknown)}")
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            assert_scalar_schema(name, sdf)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:160]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only check)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0][:160]}")
            failures += 1
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} duckdb={sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duckdb={len(orows)}")
            ok = False
        else:
            sm = frame_multiset(scols, [[r[c] for c in scols] for r in srows])
            om = frame_multiset(ocols, orows)
            if sm != om:
                diff_s = {k: v for k, v in sm.items() if om.get(k) != v}
                diff_o = {k: v for k, v in om.items() if sm.get(k) != v}
                print(f"FAIL  {name}: value mismatch ({len(diff_s)} spark-only / {len(diff_o)} duckdb-only)")
                for k in list(diff_s)[:3]:
                    print(f"        spark : {k[:200]}")
                for k in list(diff_o)[:3]:
                    print(f"        duckdb: {k[:200]}")
                ok = False
        if ok:
            print(f"OK    {name}: {len(srows)} rows")
        else:
            failures += 1
    spark.stop()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
