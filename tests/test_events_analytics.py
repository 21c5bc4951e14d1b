"""Retention-cohort and funnel semantics on hand-built event logs where the
correct answer is countable by eye — especially the funnel's ORDERING rule
(a click before your first view does not advance the funnel)."""

from __future__ import annotations

from thewhisperdb_spark.operators import events as EV


def _events(spark, rows):
    from datetime import datetime

    rows = [(u, datetime.fromisoformat(ts), et) for u, ts, et in rows]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")


def test_retention_cohorts(spark):
    ev = _events(spark, [
        # user 1: first day Jan 1, back on Jan 2 and Jan 4 (two events Jan 2)
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-02 09:00:00", "view"),
        (1, "2024-01-02 23:00:00", "click"),
        (1, "2024-01-04 01:00:00", "view"),
        # user 2: first day Jan 2 only
        (2, "2024-01-02 12:00:00", "view"),
        # user 3: first day Jan 1, back Jan 2
        (3, "2024-01-01 00:00:01", "view"),
        (3, "2024-01-02 00:00:01", "view"),
    ])
    got = {(str(r.cohort_day), r.day_offset): r.n_users
           for r in EV.retention_cohorts(ev).collect()}
    assert got == {
        ("2024-01-01", 0): 2,   # users 1, 3
        ("2024-01-01", 1): 2,   # users 1, 3 back on Jan 2
        ("2024-01-01", 3): 1,   # user 1 on Jan 4
        ("2024-01-02", 0): 1,   # user 2's own cohort
    }


def test_retention_max_offset(spark):
    ev = _events(spark, [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-09 10:00:00", "view"),
    ])
    got = EV.retention_cohorts(ev, max_offset=7).collect()
    assert {(r.day_offset, r.n_users) for r in got} == {(0, 1)}


def test_funnel_ordering(spark):
    ev = _events(spark, [
        # user 1 completes the full funnel in order
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:05:00", "click"),
        (1, "2024-01-01 10:10:00", "purchase"),
        # user 2 clicks BEFORE their first view -> stuck at step 0
        (2, "2024-01-01 09:00:00", "click"),
        (2, "2024-01-01 11:00:00", "view"),
        # user 3 views and clicks, purchase precedes the click -> step 1
        (3, "2024-01-01 08:00:00", "view"),
        (3, "2024-01-01 08:30:00", "purchase"),
        (3, "2024-01-01 09:30:00", "click"),
        # user 4 never views -> not even step 0
        (4, "2024-01-01 07:00:00", "purchase"),
    ])
    got = {r.step: r.n_users for r in
           EV.funnel_conversion(ev, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_same_timestamp_counts(spark):
    # at-or-after semantics: a click at the exact view timestamp advances
    ev = _events(spark, [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:00:00", "click"),
    ])
    got = {r.step: r.n_users for r in
           EV.funnel_conversion(ev, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 1}


def test_asof_join_nearest_directions_and_ties(spark):
    """Bidirectional nearest-click join: backward preferred on equal gaps,
    forward used when closer, null when the user never clicked."""
    from pyspark.sql import functions as F

    from thewhisperdb_spark.operators.relational import asof_join

    rows = [
        # user 1: clicks at t=100 and t=300, purchase at t=180 -> backward
        # click (gap 80) beats forward (gap 120)
        (1, 1, "click", 100), (2, 1, "click", 300), (3, 1, "purchase", 180),
        # user 2: clicks at t=100 and t=300, purchase at t=200 -> equal gaps
        # (100 both ways), backward wins the tie
        (4, 2, "click", 100), (5, 2, "click", 300), (6, 2, "purchase", 200),
        # user 3: only a later click -> forward match
        (7, 3, "purchase", 50), (8, 3, "click", 90),
        # user 4: never clicks -> nulls
        (9, 4, "purchase", 10),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, sec long"
    ).withColumn("ts", F.timestamp_seconds("sec"))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("event_id", "user_id", "ts"))
    c = (ev.filter(F.col("event_type") == "click")
         .select("user_id", F.col("ts").alias("cts"),
                 F.col("event_id").alias("cid")))
    back = (asof_join(p, c, key="user_id", left_ts="ts", right_ts="cts",
                      right_vals=("cts", "cid"), direction="backward")
            .select("event_id", F.col("asof_cts").alias("b_ts"),
                    F.col("asof_cid").alias("b_id")))
    fwd = (asof_join(p, c, key="user_id", left_ts="ts", right_ts="cts",
                     right_vals=("cts", "cid"), direction="forward")
           .select("event_id", F.col("asof_cts").alias("f_ts"),
                   F.col("asof_cid").alias("f_id")))
    j = p.join(back, "event_id", "left").join(fwd, "event_id", "left")
    gap_b = F.unix_timestamp("ts") - F.unix_timestamp("b_ts")
    gap_f = F.unix_timestamp("f_ts") - F.unix_timestamp("ts")
    prefer_back = F.col("f_id").isNull() | (F.col("b_id").isNotNull()
                                            & (gap_b <= gap_f))
    got = {r.event_id: (r.nearest, r.gap) for r in j.select(
        "event_id",
        F.when(prefer_back, F.col("b_id")).otherwise(F.col("f_id"))
        .alias("nearest"),
        F.when(prefer_back, gap_b).otherwise(gap_f).cast("long")
        .alias("gap")).collect()}
    assert got[3] == (1, 80)       # backward closer
    assert got[6] == (4, 100)      # tie -> backward
    assert got[7] == (8, 40)       # forward only
    assert got[9] == (None, None)  # no clicks at all


def test_interval_union_length_merges_overlaps(spark):
    """Hand-computed islands: overlapping/touching windows merge, disjoint
    ones don't, and covered time never double-counts."""
    from pyspark.sql import functions as F

    from thewhisperdb_spark.operators import events as EV

    rows = [  # user 1: 0s and 100s overlap (dur 200) -> one island [0, 300)
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:01:40"),
        # user 1: far later -> second island [10000, 10200)
        (1, "2024-01-01 02:46:40"),
        # user 2: touching (end == next start) merges: [0,200)+[200,400)
        (2, "2024-01-01 00:00:00"),
        (2, "2024-01-01 00:03:20"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts"))
    got = {r["user_id"]: (r["n_islands"], r["active_seconds"])
           for r in EV.interval_union_length(df, duration_s=200).collect()}
    assert got == {1: (2, 500), 2: (1, 400)}


def test_interval_union_variable_ends_swallowed_intervals(spark):
    """Variable-length intervals: a long interval swallows several later
    short ones (the case where 'previous row's end' instead of the
    running max would be wrong)."""
    from pyspark.sql import functions as F

    from thewhisperdb_spark.operators import events as EV

    rows = [  # [0, 1000) swallows [100, 200) and [300, 400); [1500, 1600) apart
        (1, "2024-01-01 00:00:00", "2024-01-01 00:16:40"),
        (1, "2024-01-01 00:01:40", "2024-01-01 00:03:20"),
        (1, "2024-01-01 00:05:00", "2024-01-01 00:06:40"),
        (1, "2024-01-01 00:25:00", "2024-01-01 00:26:40"),
    ]
    df = (spark.createDataFrame(rows, "user_id long, ts string, te string")
          .withColumn("ts", F.to_timestamp("ts"))
          .withColumn("te", F.to_timestamp("te")))
    got = EV.interval_union_length(df, end_col="te").collect()[0]
    assert (got["n_islands"], got["active_seconds"]) == (2, 1100)
