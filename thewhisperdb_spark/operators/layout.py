"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the scan is the dominant cost, and parquet row-group/file min-max
statistics are the pruning mechanism. A single-column sort gives perfect
pruning on that column and none on any other; Z-ordering (bit-interleaved
Morton codes) spreads locality across two+ columns so selective filters on
EITHER column skip most files. This is the layout trick behind
Delta/Iceberg's OPTIMIZE ZORDER, expressed with plain DataFrame ops:
normalize each column to a fixed-width integer rank, interleave bits,
range-partition + sort by the Z-value, write.

No Python in the data path — the Morton code is a codegen'd aggregate fold
over bit positions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # per-dimension resolution; 2 dims x 16 bits = 32-bit Z-values


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min-max normalize a long column to [0, 2^bits). The ratio goes
    through a double ((col-lo)*maxv as pure integer math would overflow
    ANSI-mode longs once span > 2^47); sub-ulp rounding only perturbs which
    side of a bucket boundary a value lands on — irrelevant for layout
    clustering, which has no correctness contract on exact bucket edges."""
    span = F.greatest(hi.cast("double") - lo.cast("double"), F.lit(1.0))
    maxv = F.lit(float((1 << bits) - 1))
    return ((col.cast("double") - lo.cast("double")) / span * maxv).cast("long")


def zvalue(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Interleave the low ``bits`` bits of two normalized longs into a Morton
    Z-value: x occupies even bit positions, y odd. Pure SQL fold; 4^b terms
    stay exact in doubles for bits <= 26."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + (F.floor(x / F.pow(F.lit(2.0), b)).cast("long") % 2)
        * F.pow(F.lit(4.0), b).cast("long")
        + (F.floor(y / F.pow(F.lit(2.0), b)).cast("long") % 2)
        * F.pow(F.lit(4.0), b).cast("long") * 2,
    )


def zorder_by(df: DataFrame, c1: str, c2: str, n_partitions: int | None = None,
              bits: int = ZBITS) -> DataFrame:
    """Cluster a DataFrame by the Z-order of two long-typed columns: compute
    global min/max per column (one tiny agg, broadcast back), normalize,
    Morton-interleave, then range-partition + sort by the Z-value so each
    output partition (= parquet file on write) covers a compact rectangle of
    the (c1, c2) space.

    ``n_partitions`` defaults to the session's shuffle parallelism, so the
    same call is right on local[32] and on a 1000-executor cluster.
    """
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = max(spark.sparkContext.defaultParallelism, 2)
    # internal names are __zo_-prefixed so a user column named lo1/hi1/_z
    # can't collide with (or be dropped by) the bounds join
    bounds = df.agg(F.min(c1).alias("__zo_lo1"), F.max(c1).alias("__zo_hi1"),
                    F.min(c2).alias("__zo_lo2"), F.max(c2).alias("__zo_hi2"))
    z = zvalue(
        _scale_to_bits(F.col(c1), F.col("__zo_lo1"), F.col("__zo_hi1"), bits),
        _scale_to_bits(F.col(c2), F.col("__zo_lo2"), F.col("__zo_hi2"), bits),
        bits,
    )
    return (df.crossJoin(F.broadcast(bounds))
            .withColumn("__zo_z", z)
            .repartitionByRange(n_partitions, "__zo_z")
            .sortWithinPartitions("__zo_z")
            .drop("__zo_z", "__zo_lo1", "__zo_hi1", "__zo_lo2", "__zo_hi2"))


def zorder_write(df: DataFrame, path: str, c1: str, c2: str,
                 n_files: int | None = None, bits: int = ZBITS) -> None:
    """Write ``df`` as parquet Z-ordered on (c1, c2) — downstream scans
    filtered on either column prune most files via row-group min/max stats."""
    zorder_by(df, c1, c2, n_partitions=n_files, bits=bits).write.mode(
        "overwrite").parquet(path)


def file_bounding_boxes(spark, path: str, c1: str, c2: str) -> DataFrame:
    """Per-file min/max extents of two columns for a parquet directory —
    the observable that layout clustering improves. Returns
    (file, lo1, hi1, lo2, hi2, area) where area is the normalized bounding-box
    product; Σ area ≈ expected fraction of files a random point filter hits."""
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    g = df.groupBy("_f").agg(F.min(c1).alias("lo1"), F.max(c1).alias("hi1"),
                             F.min(c2).alias("lo2"), F.max(c2).alias("hi2"))
    # greatest(span, 1): a constant column would otherwise divide by zero
    # (ANSI throws; non-ANSI silently NULLs the area)
    tot = df.agg(
        F.greatest((F.max(c1) - F.min(c1)).cast("double"), F.lit(1.0))
        .alias("s1"),
        F.greatest((F.max(c2) - F.min(c2)).cast("double"), F.lit(1.0))
        .alias("s2"))
    return (g.crossJoin(F.broadcast(tot))
            .select(F.col("_f").alias("file"), "lo1", "hi1", "lo2", "hi2",
                    (((F.col("hi1") - F.col("lo1")) / F.col("s1"))
                     * ((F.col("hi2") - F.col("lo2")) / F.col("s2"))
                     ).alias("area")))
