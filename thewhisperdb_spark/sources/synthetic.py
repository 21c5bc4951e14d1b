"""S9 synthetic DB generator (SURVEY §2.1; ref ``utils/generate_db.py:1-20``).

The reference fabricates ``{"nodes": [{id, title, description} × N]}`` in a
driver-side Python loop and dumps one JSON file. Here generation is
``spark.range(N)`` — distributed from the first row, so N can be 100k (the
reference's load-test size) or 100B without a driver-side list. The optional
full-schema variant emits rows valid under NODE_SCHEMA so the output feeds
directly into GraphEngine / the operator suite for load tests at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synthetic_nodes(spark: SparkSession, n: int,
                    num_partitions: int | None = None) -> DataFrame:
    """The reference's exact shape: ids 1..N, ``title="Node{i}"``,
    ``description="/tmp/node_{i}"`` (``utils/generate_db.py:6-11``)."""
    rng = (spark.range(1, n + 1, 1, num_partitions) if num_partitions
           else spark.range(1, n + 1))
    return rng.select(
        "id",
        F.concat(F.lit("Node"), F.col("id")).alias("title"),
        F.concat(F.lit("/tmp/node_"), F.col("id")).alias("description"),
    )


def synthetic_full_nodes(spark: SparkSession, n: int, n_tags: int = 20,
                         tags_per_node: int = 3, embed_dim: int = 0,
                         num_partitions: int | None = None) -> DataFrame:
    """NODE_SCHEMA-complete synthetic nodes for operator load tests: derived
    deterministic tags (``tag{k}`` over a vocabulary of ``n_tags``) and,
    when ``embed_dim > 0``, a deterministic unit-norm embedding derived from
    the id — everything fabricated from ``id`` with column expressions, so
    the generator itself adds no shuffle and no Python."""
    base = synthetic_nodes(spark, n, num_partitions)
    tags = F.transform(
        F.sequence(F.lit(0), F.lit(tags_per_node - 1)),
        lambda j: F.concat(F.lit("tag"),
                           F.pmod(F.xxhash64(F.col("id"), j), F.lit(n_tags))),
    )
    out = base.select(
        "id", "title",
        F.lit("gen").alias("author"),
        F.concat(F.lit("subject"), F.pmod(F.col("id"), F.lit(5))).alias("subject"),
        F.pmod(F.col("id"), F.lit(1000)).cast("int").alias("course"),
        F.col("description"),
        F.lit("2026-01-01 00:00:00").alias("date"),
        F.array_distinct(tags).alias("tags"),
        F.lit(None).cast("string").alias("storage_path"),
        F.array().cast("array<long>").alias("linked_nodes"),
    )
    if embed_dim > 0:
        raw = F.transform(
            F.sequence(F.lit(0), F.lit(embed_dim - 1)),
            lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(2001)) - 1000)
            .cast("double") / 1000.0,
        )
        norm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x))
        emb = F.transform(raw, lambda x: (x / norm).cast("float"))
        return out.withColumn("embedding", emb)
    return out.withColumn("embedding", F.lit(None).cast("array<float>"))
