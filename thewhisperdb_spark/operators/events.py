"""Event-log analytics: retention cohorts and funnel conversion.

The reference has no event log at all (its only time dimension is the node
``date`` field, ``include/core/GNode.hpp:50``); these certify the event
surface every production deployment of a store like it grows — "how many of
the users acquired on day X came back on day X+k" and "how far down the
view→click→purchase path do users get". Both are shaped for 100 TB event
logs: everything is one shuffle on ``user_id`` followed by in-partition
window/aggregate passes, then a tiny (days × offsets / steps) result
aggregation. No self-joins of the event table against itself — the naive
retention formulation (events ⋈ events on user) is quadratic on hot users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", max_offset: int | None = None) -> DataFrame:
    """Classic cohort-retention matrix: cohort = the calendar day of a user's
    FIRST event; a user counts toward offset k if they were active on
    cohort_day + k. Returns (cohort_day, day_offset, n_users).

    Plan shape: distinct (user, day) — the first shuffle, and the only one
    that touches the raw event volume; per-group state is one row, so hot
    users (bots with millions of events) collapse here. The per-user min-day
    window then re-shuffles only |users|·|active days| rows (calendar-bounded,
    orders of magnitude below the event count), and the final (day, offset)
    count is days²-sized. Three exchanges, but only the first sees big data.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    active = events.select(F.col(user_col).alias("u"), day.alias("d")).distinct()
    w = Window.partitionBy("u")
    per_user = active.withColumn("cohort", F.min("d").over(w))
    offs = per_user.select(
        "u", "cohort", F.datediff(F.col("d"), F.col("cohort")).alias("day_offset"))
    if max_offset is not None:
        offs = offs.filter(F.col("day_offset") <= max_offset)
    return (offs.groupBy(F.col("cohort").alias("cohort_day"), "day_offset")
            .agg(F.count(F.lit(1)).alias("n_users")))


def funnel_conversion(events: DataFrame, steps: list[str],
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel analysis: a user completes step i when they have a
    ``steps[i]`` event at-or-after their completion time of step i-1 (first
    qualifying event wins). Returns (step_idx, step, n_users) with n_users
    non-increasing down the funnel.

    Plan shape: ONE shuffle on user, then a cascade of per-user window mins
    (step i's window expression references step i-1's materialized column, so
    each pass reuses the same partitioning — Spark plans them as consecutive
    Window nodes over one Exchange). The final count per step is a
    len(steps)-row aggregate. The naive alternative — len(steps)-way
    self-join on user with ts inequalities — is |events|^steps on hot users.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col)
    df = events.select(user_col, ts_col, type_col)
    prev = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev))
        col = f"_t{i}"
        df = df.withColumn(col, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = col
    per_user = df.groupBy(user_col).agg(
        *[F.max(f"_t{i}").alias(f"_t{i}") for i in range(len(steps))])
    counts = per_user.agg(
        *[F.count(f"_t{i}").cast("long").alias(f"_n{i}")
          for i in range(len(steps))])
    # tiny pivot: len(steps) literal rows from a 1-row aggregate
    rows = [F.struct(F.lit(i).cast("long").alias("step_idx"),
                     F.lit(s).alias("step"),
                     F.col(f"_n{i}").alias("n_users"))
            for i, s in enumerate(steps)]
    return (counts.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.step_idx", "r.step", "r.n_users"))
