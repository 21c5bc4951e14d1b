"""Relational operators beyond the reference's surface (SURVEY §2.3 note:
the reference has no cross-table joins at all — these certify the Spark
relational layer the engine rides on, plus the as-of join every event/feature
pipeline needs).

The as-of join deliberately avoids the naive range join (equi-key + ts
inequality), whose intermediate size is Σ_key |L_key|·|R_key| — quadratic on
hot keys. Instead it uses the union + ordered-window formulation: tag both
inputs, union, sort within key by time, and carry the last right-side value
forward. One shuffle on (key), one in-partition sort — linear in input size,
the standard scalable shape (same plan Flink/kdb-style asof joins lower to).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              right_vals: tuple[str, ...],
              direction: str = "backward") -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right.right_ts <= left.left_ts`` (direction="backward"; "forward" gives
    the next one instead). Right-side ties at the same key/timestamp resolve
    to the greatest value tuple (deterministic).

    Returns left columns + ``asof_<col>`` for each of ``right_vals`` +
    ``n_prior`` (count of right rows at or before the left timestamp).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    lt = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"), F.struct(*left.columns).alias("_lrow"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_rv_{c}")
          for c in right_vals])
    rt = right.select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(lt.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_vals])
    u = lt.unionByName(rt)
    # at equal timestamps right rows sort before left (<= semantics); equal
    # (key, ts) right rows tie-break by value columns so `last` is
    # deterministic (greatest tuple wins)
    ties = [F.col(f"_rv_{c}").asc_nulls_first() for c in right_vals]
    if direction == "backward":
        w = (Window.partitionBy("_k")
             .orderBy(F.col("_t").asc(), F.col("_is_left").asc(), *ties)
             .rowsBetween(Window.unboundedPreceding, 0))
    else:
        w = (Window.partitionBy("_k")
             .orderBy(F.col("_t").desc(), F.col("_is_left").asc(), *ties)
             .rowsBetween(Window.unboundedPreceding, 0))
    carried = u.select(
        "_is_left", "_lrow",
        *[F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
          for c in right_vals],
        F.sum(1 - F.col("_is_left")).over(w).alias("n_prior"),
    )
    out = carried.filter(F.col("_is_left") == 1)
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"asof_{c}") for c in right_vals],
        F.col("n_prior").cast("long").alias("n_prior"))


def salted_join(left: DataFrame, right: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Skew-mitigated equi-join: left rows get a deterministic salt
    (hash of the full row spread across ``n_salts``), right rows are
    replicated once per salt, and the join key becomes (key, salt) — a hot
    key's rows now land on ``n_salts`` reducers instead of one.

    Use when a handful of keys dominate (AQE's skew-join split handles
    partition-level skew, but a single giant key inside one partition still
    serializes without salting). Cost: right side × n_salts replication —
    pick the smaller side as ``right``.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                  F.lit(n_salts)).cast("int")
    l_s = left.withColumn("_salt", salt)
    r_s = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return l_s.join(r_s, [key, "_salt"], how).drop("_salt")


def range_join_bucketed(left: DataFrame, right: DataFrame,
                        left_lo: Column, left_hi: Column,
                        right_pt: Column, bucket_width: int,
                        keys: list[str] | None = None) -> DataFrame:
    """Interval × point range join via bucketing: each interval explodes to
    its covered buckets, points map to one bucket, the join becomes an
    equi-join on (keys +) bucket + exact re-check — Σ bucket² work instead of
    |L|·|R| (the same candidate-generation idea as the LSH joins). A point
    lands in exactly one bucket, so no pair is produced twice.

    ``keys`` adds equi-join columns (same name on both sides) to the bucket
    key — the common shape "same user within ±1 h" — which also keeps each
    bucket's population per-key, not global."""
    l_b = left.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(left_lo / bucket_width).cast("long"),
                             F.floor(left_hi / bucket_width).cast("long"))))
    r_b = right.withColumn("_bucket",
                           F.floor(right_pt / bucket_width).cast("long"))
    joined = l_b.join(r_b, (keys or []) + ["_bucket"]).drop("_bucket")
    return joined.filter((right_pt >= left_lo) & (right_pt <= left_hi))
