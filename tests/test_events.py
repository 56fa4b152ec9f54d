"""Event analytics: gap sessionization + JSON props stats.

The contract oracles pin Spark-vs-DuckDB value equality at sf0.01;
these tests pin boundary semantics and the plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pysparkenc.events import props_stats, sessionize


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_session_breaks_exactly_past_the_gap(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (0, t0, 1, 1.0),
        (1, t0 + dt.timedelta(minutes=30), 1, 1.0),          # == gap: same session
        (2, t0 + dt.timedelta(minutes=60, seconds=1), 1, 1.0),  # > gap: new session
        (3, t0, 2, 2.0),                                      # other user independent
    ]
    out = sessionize(_ev(spark, rows), gap_minutes=30).collect()
    u1 = sorted((r["session_id"], r["n_events"]) for r in out if r["user_id"] == 1)
    assert u1 == [(1, 2), (2, 1)]
    u2 = [(r["session_id"], r["n_events"]) for r in out if r["user_id"] == 2]
    assert u2 == [(1, 1)]


def test_session_duration_and_sum(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(i, t0 + dt.timedelta(minutes=i), 7, 0.01 * i) for i in range(5)]
    (r,) = sessionize(_ev(spark, rows), gap_minutes=30).collect()
    assert r["n_events"] == 5
    assert r["duration_sec"] == 240
    assert r["sum_cents"] == sum(range(5))  # 0.01*i -> i cents, exact


def test_sessionize_single_shuffle_no_python(spark):
    import contextlib
    import io

    df = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sessionize(df).explain("formatted")
    plan = buf.getvalue()
    tree = [ln for ln in plan.splitlines()
            if ln.lstrip().startswith(("+-", ":-", "Adaptive", "*("))]
    assert sum("Exchange" in ln for ln in tree) == 1, plan
    assert "BatchEvalPython" not in plan


def test_props_stats_missing_key_counts_zero(spark):
    df = spark.createDataFrame(
        [("a", '{"k": 3}'), ("a", '{"x": 9}'), ("b", "not json")],
        "event_type string, props string",
    )
    out = {r["event_type"]: (r["n_with_key"], r["sum_val"])
           for r in props_stats(df).collect()}
    assert out["a"] == (1, 3)   # the x-only row has no k
    assert out["b"] == (0, None)
