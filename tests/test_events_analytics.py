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
