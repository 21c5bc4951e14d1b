"""Scale-pattern guarantees asserted on physical plans: bucketed joins must
not shuffle, salted joins must preserve join semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thewhisperdb_spark.catalog import save_bucketed
from thewhisperdb_spark.operators.relational import salted_join


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # saveAsTable needs a warehouse; session fixture already has one under cwd
    return spark


def test_bucketed_join_has_no_shuffle(spark):
    o = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a"))
    li = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("k"), (F.col("id") % 13).alias("b"))
    save_bucketed(o, "t_orders_b", "k", n_buckets=8)
    save_bucketed(li, "t_lineitem_b", "k", n_buckets=8)
    # disable auto-broadcast: at test sizes the planner would broadcast (and
    # rightly skip bucketing); the no-shuffle property matters for the
    # big-to-big sort-merge case
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_orders_b").join(spark.table("t_lineitem_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, \
            f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan
        assert joined.count() == 5000
        # contrast: the same join on plain (unbucketed) inputs does shuffle
        plain = o.join(li, "k")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_has_no_shuffle(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v"))
    save_bucketed(df, "t_agg_b", "k", n_buckets=4)
    agg = spark.table("t_agg_b").groupBy("k").agg(F.sum("v").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, \
        f"bucketed agg still shuffles:\n{plan}"
    assert agg.count() == 100


def test_salted_join_matches_plain_join(spark):
    # heavy skew: 90% of left rows share key 0
    left = spark.range(0, 1000).select(
        F.when(F.col("id") < 900, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("lv"))
    right = spark.createDataFrame(
        [(0, "hot"), (950, "cold"), (999, "cold")], "k long, rv string")
    got = salted_join(left, right, "k", n_salts=4)
    plain = left.join(right, "k")
    assert got.count() == plain.count() == 902
    assert (sorted(r["lv"] for r in got.filter(F.col("rv") == "cold").collect())
            == [950, 999])


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    from thewhisperdb_spark.catalog import load_table, save_partitioned

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev = ev.withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "events_by_day")
    save_partitioned(ev, path, "day")

    one_day = spark.read.parquet(path).filter(F.col("day") == "2024-01-02")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan (directory pruning, not row filter)
    assert "PartitionFilters: [" in plan and "day" in plan.split(
        "PartitionFilters")[1][:120]
    got = one_day.count()
    expect = ev.filter(F.to_date("ts") == "2024-01-02").count()
    assert got == expect > 0

    # and a row-level predicate on the same read still pushes down to parquet
    pushed = spark.read.parquet(path).filter(
        (F.col("day") == "2024-01-02") & (F.col("event_type") == "click"))
    pplan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in pplan and "event_type" in pplan.split(
        "PushedFilters")[1][:200]


def test_hll_sketch_distinct_within_error_bounds(spark):
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = {r["event_type"]: r for r in
           entrymod.queries()["events_distinct_users_hll"](spark, sf).collect()}
    from thewhisperdb_spark.catalog import load_table
    exact = {r["event_type"]: r["n_users"] for r in
             load_table(spark, sf, "events").groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("n_users")).collect()}
    assert set(got) == set(exact) and len(got) > 0
    for et, row in got.items():
        # HLL at lgK=14: rse ~ 1.04/sqrt(2^14) ~ 0.8%; allow 3 sigma
        assert abs(row["n_users_approx"] - exact[et]) <= max(3, 0.025 * exact[et])

    # the sketch aggregate must partial-aggregate map-side (mergeable), not
    # expand to a distinct-style double shuffle
    plan = (entrymod.queries()["events_distinct_users_hll"](spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1
