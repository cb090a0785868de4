"""Range-join operator: brute-force equality, boundary semantics, bin
independence, left-join shape, and the no-theta-join plan guarantee."""

import pytest
from pyspark.sql import Row, functions as F

from deidcm_spark.operators.rangejoin import range_join


def _hash_int(a: int, b: int, mod: int) -> int:
    # deterministic pseudo-random stream (no RNG — engine rule)
    import hashlib

    return int(hashlib.md5(f"{a}:{b}".encode()).hexdigest(), 16) % mod


def _fixtures(spark, n_points=300, n_ivs=120, domain=10_000, keys=7):
    pts = [
        Row(pid=i, k=_hash_int(i, 1, keys), x=_hash_int(i, 2, domain))
        for i in range(n_points)
    ]
    ivs = []
    for j in range(n_ivs):
        s = _hash_int(j, 3, domain)
        ivs.append(
            Row(iid=j, k=_hash_int(j, 4, keys), s=s,
                e=s + _hash_int(j, 5, 900))
        )
    return (
        spark.createDataFrame(pts).repartition(4),
        spark.createDataFrame(ivs).repartition(4),
    )


def _brute(points_rows, iv_rows):
    return {
        (p.pid, i.iid)
        for p in points_rows
        for i in iv_rows
        if p.k == i.k and i.s <= p.x <= i.e
    }


@pytest.mark.parametrize("bin_width", [1000, 250, 7])
def test_range_join_matches_brute_force(spark, bin_width):
    """The binned equi-join equals the naive theta join for any bin width —
    including widths far smaller than the interval span (explode factor
    >> 2), which exercises the multi-bin dedup-free invariant."""
    pts, ivs = _fixtures(spark)
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            pts, ivs, key="k", point_col="x", start_col="s", end_col="e",
            bin_width=bin_width,
        ).collect()
    }
    want = _brute(pts.collect(), ivs.collect())
    assert got == want and len(want) > 50


def test_range_join_boundaries_inclusive(spark):
    pts = spark.createDataFrame(
        [Row(pid=0, k=1, x=100), Row(pid=1, k=1, x=200),
         Row(pid=2, k=1, x=99), Row(pid=3, k=1, x=201),
         Row(pid=4, k=2, x=150)]  # right value, wrong key
    )
    ivs = spark.createDataFrame([Row(iid=0, k=1, s=100, e=200)])
    got = sorted(
        r["pid"] for r in range_join(
            pts, ivs, key="k", point_col="x", start_col="s", end_col="e",
            bin_width=64,
        ).collect()
    )
    assert got == [0, 1]  # both ends inclusive, key respected


def test_range_join_left_keeps_unmatched(spark):
    pts, ivs = _fixtures(spark, n_points=80, n_ivs=30)
    out = range_join(
        pts, ivs, key="k", point_col="x", start_col="s", end_col="e",
        bin_width=500, how="left",
    ).collect()
    matched = _brute(pts.collect(), ivs.collect())
    got_pairs = {(r["pid"], r["iid"]) for r in out if r["iid"] is not None}
    assert got_pairs == matched
    # every point appears; unmatched exactly once with NULL interval cols
    unmatched_pids = {r["pid"] for r in out if r["iid"] is None}
    matched_pids = {p for p, _ in matched}
    assert unmatched_pids == {r["pid"] for r in pts.collect()} - matched_pids
    assert len(out) == len(matched) + len(unmatched_pids)


def test_range_join_plan_has_no_theta_join(spark):
    pts, ivs = _fixtures(spark, n_points=50, n_ivs=20)
    df = range_join(
        pts, ivs, key="k", point_col="x", start_col="s", end_col="e",
        bin_width=1000,
    )
    df.collect()  # finalize AQE before reading the executed plan (CLAUDE.md)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_validates_args(spark):
    pts, ivs = _fixtures(spark, n_points=5, n_ivs=5)
    with pytest.raises(ValueError, match="bin_width"):
        range_join(pts, ivs, "k", "x", "s", "e", bin_width=0)
    with pytest.raises(ValueError, match="how"):
        range_join(pts, ivs, "k", "x", "s", "e", bin_width=10, how="outer")


def test_asof_join_null_semantics_match_duckdb(spark):
    """DuckDB-ASOF parity (the operator's documented oracle semantics):
    a right row with NULL ts never matches (it used to sort FIRST and
    leak its payload into every left row), NULL keys never join (NULL =
    NULL is not an equality match), and a left row with NULL ts gets a
    NULL payload.  Reserved/colliding column names are loud errors."""
    import pytest as _pytest

    from deidcm_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (2, None, 100), (3, 10, None)],
        "event_id long, user_id long, ts long",
    )
    right = spark.createDataFrame(
        [(99, 10, None, 5.0),    # NULL ts: never matches
         (98, None, 50, 6.0),    # NULL key: never matches
         (97, 10, 40, 7.0)],     # the only legitimate match (for event 1)
        "event_id long, user_id long, ts long, value double",
    )
    out = {r["event_id"]: (r["asof_event_id"], r["asof_value"])
           for r in asof_join(left, right, "user_id", "ts",
                              ["event_id", "value"], seq_col="event_id").collect()}
    assert out[1] == (97, 7.0)
    assert out[2] == (None, None)  # NULL-key left row: no phantom match
    assert out[3] == (None, None)  # NULL-ts left row: nothing is <= NULL
    with _pytest.raises(ValueError, match="_side"):
        asof_join(left.withColumn("_side", left.event_id), right,
                  "user_id", "ts", ["value"])
    with _pytest.raises(ValueError, match="prefix"):
        asof_join(left.withColumn("asof_value", left.event_id), right,
                  "user_id", "ts", ["value"])
