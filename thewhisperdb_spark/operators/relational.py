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
    the next one, i.e. ``right_ts >= left_ts``). Right-side ties at the same
    key/timestamp resolve to the greatest value tuple (deterministic).

    The matched right row is carried as ONE struct, so its value columns
    arrive atomically — a NULL in one value column of the matched row stays
    NULL instead of falling back to an older row per-column.

    Returns left columns + ``asof_<col>`` for each of ``right_vals`` +
    ``n_prior``: the count of right rows the frame has passed — at-or-before
    the left timestamp for backward, at-or-after for forward.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    rstruct = F.struct(*[F.col(c) for c in right_vals])
    lt = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"), F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(right.select(rstruct).schema[0].dataType)
        .alias("_rvals"))
    rt = right.select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(lt.schema["_lrow"].dataType).alias("_lrow"),
        rstruct.alias("_rvals"))
    u = lt.unionByName(rt)
    # at equal timestamps right rows sort before left (<= semantics); equal
    # (key, ts) right rows tie-break by the value struct so `last` is
    # deterministic (greatest tuple wins)
    if direction == "backward":
        w = (Window.partitionBy("_k")
             .orderBy(F.col("_t").asc(), F.col("_is_left").asc(),
                      F.col("_rvals").asc_nulls_first())
             .rowsBetween(Window.unboundedPreceding, 0))
    else:
        w = (Window.partitionBy("_k")
             .orderBy(F.col("_t").desc(), F.col("_is_left").asc(),
                      F.col("_rvals").asc_nulls_first())
             .rowsBetween(Window.unboundedPreceding, 0))
    carried = u.select(
        "_is_left", "_lrow",
        F.last("_rvals", ignorenulls=True).over(w).alias("_asof"),
        F.sum(1 - F.col("_is_left")).over(w).alias("n_prior"),
    )
    out = carried.filter(F.col("_is_left") == 1)
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in right_vals],
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

    ``how`` must be left-preserving: a right-preserving join would emit each
    unmatched right row once per salt replica.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"):
        raise ValueError(
            f"salted_join replicates the right side; join type {how!r} "
            "would duplicate unmatched right rows n_salts times")
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


def _bit_mask(sh: Column) -> Column:
    """1 << sh for a COLUMN shift amount in [0, 63] (the shiftleft builtin
    only takes a literal shift). 2^sh is exact in doubles up to 62; bit 63 is
    the sign bit, special-cased to Long.MIN_VALUE."""
    return (F.when(sh == 63, F.lit(-(2 ** 63)).cast("long"))
            .otherwise(F.pow(F.lit(2.0), sh.cast("double")).cast("long")))


def bloom_bitmap(keys_df: DataFrame, key: str, m_words: int = 1024,
                 k: int = 5) -> list[int]:
    """Build a Bloom filter over a key column, returned as ``m_words`` 64-bit
    words. The bit positions aggregate distributively (per-word bitwise OR),
    so the build is one narrow shuffle of (word_idx, mask) pairs; the
    collected bitmap is metadata-scale (8 KB at the default m) regardless of
    key cardinality. With default sizing, ~1% false-positive rate up to
    ~65k keys; callers with bigger build sides raise ``m_words``.
    """
    m_bits = m_words * 64
    # hash the STRING form: xxhash64 is type-sensitive (int 1 and bigint 1
    # hash differently), so hashing raw columns would silently drop matches
    # when the two sides' key dtypes differ
    kc = F.col(key).cast("string")
    pos = keys_df.select(F.explode(F.array(*[
        F.pmod(F.xxhash64(kc, F.lit(s)), F.lit(m_bits))
        for s in range(k)])).alias("p"))
    words = (pos.select((F.col("p") / 64).cast("int").alias("i"),
                        _bit_mask(F.pmod(F.col("p"), F.lit(64))).alias("m"))
             .groupBy("i").agg(F.bit_or("m").alias("w"))
             .collect())
    bitmap = [0] * m_words
    for r in words:
        bitmap[r["i"]] = r["w"]
    return bitmap


def bloom_semi_join(fact: DataFrame, keys_df: DataFrame, key: str,
                    m_words: int = 1024, k: int = 5) -> DataFrame:
    """Exact semi-join with a Bloom pre-filter: the fact side is first thinned
    by a broadcast bitmap membership test (pure codegen'd bit arithmetic — no
    shuffle, no join), then the survivors go through the real semi-join for
    exactness. At 100 TB this is the difference between shuffling the whole
    fact table into the join and shuffling only the ~matching slice plus the
    Bloom's false positives: the same runtime-filter idea Spark's
    spark.sql.optimizer.runtime.bloomFilter applies automatically, spelled
    out as an operator so it also works across separately-computed stages.
    """
    bitmap = bloom_bitmap(keys_df, key, m_words=m_words, k=k)
    # F.lit(list) -> ONE array Literal node; an F.array of m_words literal
    # children would re-enter analysis/codegen per reference and dominate
    # planning time
    words = F.lit(bitmap)
    m_bits = m_words * 64

    def bit_set(s: int) -> Column:
        # string-cast to match bloom_bitmap's type-insensitive hashing
        p = F.pmod(F.xxhash64(F.col(key).cast("string"), F.lit(s)),
                   F.lit(m_bits))
        w = F.element_at(words, ((p / 64).cast("int") + 1))
        return w.bitwiseAND(_bit_mask(F.pmod(p, F.lit(64)))) != 0
    maybe = fact
    for s in range(k):
        maybe = maybe.filter(bit_set(s))
    return maybe.join(keys_df.select(key).distinct(), key, "left_semi")


def scd2_point_in_time_join(fact: DataFrame, dim: DataFrame, key: str,
                            fact_ts: str, valid_from: str = "valid_from",
                            valid_to: str = "valid_to") -> DataFrame:
    """Point-in-time (SCD Type 2) dimension join: each fact row picks the
    dimension version whose validity interval contains the fact timestamp
    (``valid_from <= ts < valid_to``; open-ended current version has NULL
    valid_to).

    Scale shape: this is an EQUI-join on the dimension key with the interval
    predicate as a post-join residual — versions per key are bounded (a
    dimension's change history), so the fan-out before the residual filter is
    |fact| x versions_per_key, never a cross product. One hash shuffle on the
    key (or none, if both sides are bucketed on it); broadcast when the whole
    history fits.
    """
    resid = ((F.col(fact_ts) >= F.col(valid_from))
             & (F.col(valid_to).isNull() | (F.col(fact_ts) < F.col(valid_to))))
    return fact.join(dim, on=key).filter(resid)


def cdc_apply(target: DataFrame, changes: DataFrame,
              key_cols: list[str], change_col: str = "change") -> DataFrame:
    """Apply an insert/update/delete change feed to a snapshot — the
    MERGE INTO rewrite Spark-native engines use under the hood: rows whose
    key appears as a delete OR update are removed from the target by one
    LEFT ANTI join, then the feed's insert+update rows (carrying the new
    values) union back in. Exactly-once per key by construction (a key
    cannot survive the anti-join and also arrive twice unless the feed
    itself is malformed — feeds with duplicate keys should be deduped to
    the latest change upstream, e.g. by a row_number over a change
    sequence).

    Scale shape: the anti-join shuffles on the key — the same partitioning
    a bucketed target already has — and the change feed is typically a
    tiny fraction of the snapshot, so the join broadcasts. No full-table
    rewrite logic here: at 100 TB you'd wrap this per file-group the way
    Delta/Iceberg do, but the row-level algebra is exactly this.

    ``changes`` columns: key_cols + the full row payload + ``change_col``
    in ('insert'|'update'|'delete'); delete rows' payload is ignored.

    SQL MERGE semantics exactly: an UPDATE whose key is absent from the
    target is a no-op (WHEN MATCHED THEN UPDATE matches nothing), so a
    replayed or out-of-order feed cannot resurrect a deleted row — the
    update rows are semi-joined against the target's keys before they
    union back in. An INSERT for an existing key, the other malformed-
    feed case, still duplicates (SQL MERGE would too unless WHEN NOT
    MATCHED guards it); dedupe feeds upstream."""
    touched = (changes
               .filter(F.col(change_col).isin("delete", "update"))
               .select(*key_cols).distinct())
    updates = (changes
               .filter(F.col(change_col) == "update")
               .drop(change_col)
               .join(target.select(*key_cols).distinct(),
                     key_cols, "left_semi"))
    inserts = changes.filter(F.col(change_col) == "insert").drop(change_col)
    kept = target.join(touched, key_cols, "left_anti")
    return (kept.unionByName(updates.select(*kept.columns))
            .unionByName(inserts.select(*kept.columns)))


def scd2_build(changes: DataFrame, key: str, ts_col: str,
               payload_cols: list[str],
               tiebreak_cols: list[str] | None = None) -> DataFrame:
    """Build an SCD Type 2 history from a change log — the inverse of
    ``scd2_point_in_time_join``'s consumption side: per key, collapse
    consecutive rows with identical payload into runs (re-stating the same
    value is not a new version), then ``valid_from`` = the run's first
    timestamp and ``valid_to`` = the next run's start (NULL = current
    version, the open-ended interval the join expects).

    Two window passes over the same (key, ts) ordering — the second
    window reuses the first's sort and hash partitioning, so the whole
    build is ONE exchange. ``tiebreak_cols`` pins the order of same-
    timestamp changes (defaults to the payload itself) so the history is
    deterministic on any engine."""
    tb = tiebreak_cols if tiebreak_cols is not None else payload_cols
    order = [F.col(ts_col), *[F.col(c) for c in tb]]
    w = Window.partitionBy(key).orderBy(*order)
    lagged = changes.select(
        key, ts_col, *payload_cols,
        F.lag(F.struct(*payload_cols)).over(w).alias("_prev"))
    runs = lagged.filter(
        F.col("_prev").isNull()
        | (F.col("_prev") != F.struct(*payload_cols))).drop("_prev")
    return runs.select(
        key, *payload_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"))


def incremental_agg_update(old_agg: DataFrame, signed_delta: DataFrame,
                           key_cols: list[str],
                           sum_cols: list[str],
                           count_col: str = "n") -> DataFrame:
    """Incremental view maintenance for SUM/COUNT aggregates: fold a
    SIGNED delta (rows carrying +measure for arrivals and −measure for
    removals; an update contributes both) into a materialized aggregate
    WITHOUT rescanning the base table — new_agg = old_agg ⊕ Σ delta per
    key, groups whose count reaches zero dropped. SUM and COUNT are
    self-maintainable (MIN/MAX are not under deletes — they need the
    base or an auxiliary structure; refuse them upstream).

    Cost: |old_agg| + |delta| rows through one grouped sum — the
    materialized-view refresh a streaming/batch CDC pipeline runs per
    tick, instead of the full base aggregation. Exactness requires the
    measures to be exactly additive — pass decimals, not floats."""
    cols = [*key_cols, *sum_cols, count_col]
    both = (old_agg.select(*cols)
            .unionByName(signed_delta.select(*cols)))
    out = (both.groupBy(*key_cols)
           .agg(*[F.sum(c).alias(c) for c in sum_cols],
                F.sum(count_col).alias(count_col)))
    return out.filter(F.col(count_col) > 0)
