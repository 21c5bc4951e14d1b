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


def interval_union_length(events: DataFrame, user_col: str = "user_id",
                          ts_col: str = "ts",
                          duration_s: int = 1800,
                          end_col: str | None = None) -> DataFrame:
    """Gaps-and-islands: total COVERED time per user when each event opens
    an activity window [ts, ts + duration) — overlapping windows must not
    double-count, so naive sum(duration) is wrong and a per-second
    explode is quadratic. The standard O(n log n) rewrite:

      1. order each user's events by start; an event begins a NEW island
         iff its start exceeds the running max of all PREVIOUS ends
         (window frame ...PRECEDING AND 1 PRECEDING) — the running MAX,
         not the previous row's end, is what makes variable-length
         intervals correct (a long interval can swallow several later
         short ones);
      2. island id = running count of new-island flags;
      3. island length = max(end) - min(start); active time = Σ islands.

    ``end_col`` (a timestamp column) switches from fixed ``duration_s``
    to per-row interval ends — true sessions, bookings, on-call shifts.
    Everything is integer epoch-second arithmetic — engine-exact. One
    exchange on the user key serves both windows and the final aggregate.
    Returns (user, n_islands, active_seconds)."""
    start = F.unix_timestamp(F.col(ts_col))
    end = (F.unix_timestamp(F.col(end_col)) if end_col is not None
           else start + F.lit(duration_s))
    d = events.select(F.col(user_col).alias("user"),
                      start.alias("s"), end.alias("e"))
    w = Window.partitionBy("user").orderBy("s", "e")
    prev_max_end = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = d.withColumn(
        "new_island",
        (prev_max_end.isNull() | (F.col("s") > prev_max_end)).cast("long"))
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    per_island = (islands.groupBy("user", "island")
                  .agg(F.min("s").alias("is_"), F.max("e").alias("ie")))
    return (per_island.groupBy(F.col("user").alias(user_col))
            .agg(F.count(F.lit(1)).alias("n_islands"),
                 F.sum(F.col("ie") - F.col("is_")).alias("active_seconds")))
