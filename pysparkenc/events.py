"""Event-stream analytics: sessionization and JSON property stats.

Two more canonical shapes over the `events` table (event_id, ts,
user_id, event_type, value, props-json), both pure
``pyspark.sql.functions`` with full DuckDB oracles:

- :func:`sessionize` — gap-based sessions: a session breaks when a
  user's inter-event gap exceeds the timeout. The classic stateful
  operator, expressed statelessly as window lag → boundary flag →
  running sum (session ordinal) → per-session aggregate. Scale shape:
  ONE shuffle by user_id (the sort inside each user is partition-local),
  and Catalyst reuses the window's hash partitioning for the session
  groupBy — no second exchange, same elision :mod:`pipeline`'s packing
  relies on.
- :func:`props_stats` — per-event-type stats over a JSON property
  (``get_json_object`` stays in codegen; no Python). Sums are exact
  integers so the hash gate is float-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: one row per (user, session).

    A new session starts at a user's first event and whenever the gap
    since their previous event exceeds ``gap_minutes``. Deterministic
    (ties inside a timestamp break by ``tiebreak_col`` — pass any stable
    unique key when the dataframe has no ``event_id``), so the whole
    result is value-hash oracle-checkable.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    gap_s = F.lit(int(gap_minutes) * 60)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)) > gap_s),
        F.lit(1),
    ).otherwise(F.lit(0))
    with_sess = df.withColumn("__new", is_new).withColumn(
        "session_id",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    return (
        with_sess.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col(value_col) * 100).cast("long"))
            .cast("long")
            .alias("sum_cents"),
        )
        .withColumn(
            "duration_sec",
            (
                F.unix_timestamp("session_end")
                - F.unix_timestamp("session_start")
            ).cast("long"),
        )
    )


def props_stats(
    df: DataFrame,
    *,
    key: str = "k",
    props_col: str = "props",
    group_col: str = "event_type",
) -> DataFrame:
    """Per-group stats over one JSON property of the props column:
    count of rows carrying the key, exact integer sum, min/max. JSON
    extraction stays JVM-side (``get_json_object``) — at 100 TB this is
    a narrow codegen scan, no Python, no shuffle beyond the tiny final
    aggregate."""
    v = F.get_json_object(F.col(props_col), f"$.{key}").cast("long")
    return (
        df.select(F.col(group_col), v.alias("__v"))
        .groupBy(group_col)
        .agg(
            F.count("__v").cast("long").alias("n_with_key"),
            F.sum("__v").cast("long").alias("sum_val"),
            F.min("__v").cast("long").alias("min_val"),
            F.max("__v").cast("long").alias("max_val"),
        )
    )
