"""Hypertable rollup: hierarchical re-aggregation equals direct
aggregation at every resolution, and the finest-level exchange is
computed once and reused by the coarser levels."""

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from deidcm_spark.operators.rollup import hypertable_rollup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def _direct(events, gran):
    return (
        events.groupBy(
            F.date_trunc(gran, "ts").alias("bucket"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def test_rollup_levels_equal_direct_aggregation(spark, events):
    out = hypertable_rollup(
        events, "ts", ["event_type"], "value",
        granularities=["hour", "day", "week"],
    )
    for gran in ["hour", "day", "week"]:
        got = {
            (r["bucket"], r["event_type"]): (
                r["n_events"], round(r["sum_value"], 6),
                r["min_value"], r["max_value"],
            )
            for r in out.filter(F.col("granularity") == gran).collect()
        }
        want = {
            (r["bucket"], r["event_type"]): (
                r["n_events"], r["sum_value"], r["min_value"], r["max_value"]
            )
            for r in _direct(events, gran).collect()
        }
        assert got == want and len(want) > 0, gran


def test_rollup_single_corpus_shuffle(spark, events):
    """The AQE-final plan must read the corpus ONCE: coarser levels start
    from a ReusedExchange of the finest level's shuffle, never a second
    scan (GROUPING SETS would expand the input per resolution instead)."""
    out = hypertable_rollup(
        events, "ts", ["event_type"], "value",
        granularities=["hour", "day", "week"],
    )
    out.collect()  # finalize AQE before reading the executed plan (CLAUDE.md)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    final = buf.getvalue().split("== Initial Plan ==")[0]
    assert len(re.findall(r"\bScan parquet\b", final)) == 1
    assert len(re.findall(r"\bReusedExchange\b", final)) == 2


def test_rollup_validates_granularities(spark, events):
    with pytest.raises(ValueError, match="unknown granularities"):
        hypertable_rollup(events, "ts", ["event_type"], "value",
                          granularities=["hour", "fortnight"])


def test_rollup_orders_mixed_granularity_input(spark, events):
    """Caller order doesn't matter: the finest requested resolution is the
    aggregation base."""
    out = hypertable_rollup(
        events, "ts", ["event_type"], "value",
        granularities=["week", "hour"],
    )
    grans = {r["granularity"] for r in out.select("granularity").distinct().collect()}
    assert grans == {"hour", "week"}


def test_rollup_week_finest_does_not_misbucket_months(spark):
    """Weeks don't nest in months: an event on Feb 1 whose Monday-truncated
    week starts Jan 29 must still land in the February month bucket (the
    internal base drops to 'day' when week is finest with coarser levels)."""
    from pyspark.sql import Row

    events = spark.createDataFrame(
        [Row(ts="2024-02-01 12:00:00", event_type="click", value=5.0)]
    ).select(
        F.col("ts").cast("timestamp_ntz").alias("ts"), "event_type", "value"
    )
    out = hypertable_rollup(
        events, "ts", ["event_type"], "value",
        granularities=["week", "month"],
    )
    rows = {r["granularity"]: str(r["bucket"]) for r in out.collect()}
    assert rows["week"].startswith("2024-01-29")
    assert rows["month"].startswith("2024-02-01")
    grans = {r["granularity"] for r in out.collect()}
    assert grans == {"week", "month"}  # internal day base is not emitted


# ---------- gap_fill (time_bucket_gapfill analogue) ----------

def test_gap_fill_matches_python_oracle(spark):
    """Sparse hourly series with multi-hour holes: the dense series and
    every fill method re-derived in pure Python."""
    import datetime as dt

    from deidcm_spark.operators.rollup import gap_fill

    def t(h):
        return dt.datetime(2024, 3, 1, h)

    rows = [
        ("a", t(1), 3, 30.0), ("a", t(2), 1, 10.0), ("a", t(6), 2, 20.0),
        ("b", t(4), 5, 50.0), ("b", t(5), 1, 5.0),
        ("c", t(9), 7, 70.0),                     # single bucket: no gaps
    ]
    roll = spark.createDataFrame(
        rows, "event_type string, bucket timestamp, n_events long, sum_value double"
    )

    def oracle(method):
        got = {}
        for key in {r[0] for r in rows}:
            series = sorted((r[1], r[2], r[3]) for r in rows if r[0] == key)
            first, last = series[0][0], series[-1][0]
            real = {b: (n, v) for b, n, v in series}
            prev = (None, None)
            cur = first
            while cur <= last:
                if cur in real:
                    prev = real[cur]
                    got[(key, cur)] = (False, *real[cur])
                else:
                    fills = {
                        "locf": prev,
                        "zero": (0, 0.0),
                        "null": (None, None),
                    }[method]
                    got[(key, cur)] = (True, *fills)
                cur += dt.timedelta(hours=1)
        return got

    for method in ("locf", "zero", "null"):
        out = gap_fill(
            roll, "hour", ["event_type"], ["n_events", "sum_value"], method
        )
        got = {
            (r.event_type, r.bucket): (r.filled, r.n_events, r.sum_value)
            for r in out.collect()
        }
        assert got == oracle(method), method


def test_gap_fill_on_rollup_output(spark, events):
    """Composes with hypertable_rollup: the day level densifies with no
    holes left, real buckets keep their aggregates bit-for-bit."""
    from deidcm_spark.operators.rollup import gap_fill

    day = hypertable_rollup(
        events, "ts", ["event_type"], "value", ["day"]
    ).drop("granularity")
    dense = gap_fill(day, "day", ["event_type"], ["n_events", "sum_value"])
    real = {(r.event_type, r.bucket): (r.n_events, r.sum_value) for r in day.collect()}
    out = {(r.event_type, r.bucket): r for r in dense.collect()}
    for k, (n, v) in real.items():
        assert not out[k].filled and (out[k].n_events, out[k].sum_value) == (n, v)
    # dense: per key, count == span in days
    import collections
    per_key = collections.defaultdict(list)
    for (k, b) in out:
        per_key[k].append(b)
    for k, buckets in per_key.items():
        buckets.sort()
        span = (buckets[-1] - buckets[0]).days + 1
        assert len(buckets) == span, k


def test_gap_fill_validations(spark):
    from deidcm_spark.operators.rollup import gap_fill

    df = spark.createDataFrame(
        [], "event_type string, bucket timestamp, n_events long"
    )
    with pytest.raises(ValueError, match="method"):
        gap_fill(df, "hour", ["event_type"], ["n_events"], method="bogus")
    with pytest.raises(ValueError, match="granularity"):
        gap_fill(df, "minute", ["event_type"], ["n_events"])
    assert gap_fill(df, "hour", ["event_type"], ["n_events"]).count() == 0


def test_gap_fill_real_null_aggregates_survive(spark):
    """A REAL bucket whose aggregate is legitimately NULL (every event's
    value NULL that hour) must stay distinguishable from an observed
    zero: 'zero' fills only synthesized rows, and 'locf' carries the last
    real row's value — NULL included — instead of skipping past it."""
    import datetime as dt

    from deidcm_spark.operators.rollup import gap_fill

    rows = [
        ("a", dt.datetime(2024, 1, 1, 0), 3, 5.0),    # real, value 5
        ("a", dt.datetime(2024, 1, 1, 1), 2, None),   # real, NULL sum
        # hour 2 missing (synthesized)
        ("a", dt.datetime(2024, 1, 1, 3), 1, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, bucket timestamp, n_events long, sum_value double"
    )
    zero = {r["bucket"].hour: (r["sum_value"], r["filled"]) for r in gap_fill(
        df, "hour", ["event_type"], ["sum_value"], method="zero").collect()}
    assert zero[1] == (None, False)   # real NULL kept, NOT coalesced to 0
    assert zero[2] == (0, True)       # synthesized row filled with 0
    locf = {r["bucket"].hour: r["sum_value"] for r in gap_fill(
        df, "hour", ["event_type"], ["sum_value"], method="locf").collect()}
    assert locf[1] is None            # real NULL carried as itself
    assert locf[2] is None            # gap carries the LAST REAL value (NULL)
    assert locf[3] == 7.0
