"""Tag algebra: membership, shared-tag joins, Jaccard similarity joins
(SURVEY §2.3 J1-J4, §2.6 U1-U3, tag bank A8).

The reference runs these as per-node O(n) / O(n²) loops
(``src/core/GraphDB.cpp:508-603``). Spark-first shape: explode the tag array
into an inverted index (tag -> node) once, then every tag join is an equi-join
on ``tag`` — shuffle on the tag key, no cross product. Jaccard needs only
|A∩B| (co-occurrence count of distinct tags) and the two set sizes:
J(A,B) = c / (|A| + |B| - c), so the whole threshold self-join is
explode -> self-equi-join -> count -> arithmetic — no array comparison of
pairs at all, and it scales linearly in the inverted-index fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tag_index(nodes: DataFrame, id_col: str = "id", tags_col: str = "tags") -> DataFrame:
    """Inverted index (id, tag) with distinct tags per node."""
    return nodes.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(F.col(tags_col))).alias("tag"),
    )


def nodes_by_tag(nodes: DataFrame, tag: str, tags_col: str = "tags") -> DataFrame:
    """J1 ``findNodesByTag`` (``src/core/GraphDB.cpp:508-517``)."""
    return nodes.filter(F.array_contains(F.col(tags_col), tag))


def shared_tag_partners(nodes: DataFrame, node_id: int,
                        id_col: str = "id", tags_col: str = "tags") -> DataFrame:
    """J2 ``findNodesWithSharedTags`` (``src/core/GraphDB.cpp:519-546``):
    distinct other nodes sharing >= 1 tag with ``node_id``.

    The probe side is one node -> its tag set is broadcast; the join is a
    broadcast semi-join against the inverted index, no shuffle of the big side.
    """
    idx = tag_index(nodes, id_col, tags_col)
    probe = idx.filter(F.col("id") == node_id).select(F.col("tag"))
    return (
        idx.join(F.broadcast(probe), "tag")
        .filter(F.col("id") != node_id)
        .select("id")
        .distinct()
    )


def jaccard_pairs(nodes: DataFrame, id_col: str = "id", tags_col: str = "tags",
                  threshold: float | None = None) -> DataFrame:
    """J3/J4 kernel: all unordered pairs (a < b) of nodes with >= 1 shared tag,
    with exact Jaccard over distinct tag sets.

    Returns (a, b, inter, union_size, jaccard). Empty-tag nodes never appear
    (they match no index row) — same exclusion as the reference
    (``src/core/GraphDB.cpp:583-585``).

    The duplicate-sensitive quirk of the reference's intersection
    (``src/core/GraphDB.cpp:548-574``) is irrelevant on distinct tag sets,
    which is what its normalized tags are in practice (SURVEY §7).

    Scale note: cost is sum over tags of df(tag)²; for heavy-hitter tags use
    ``minhash_lsh`` (dedup.py) instead — this exact kernel is the oracle path.
    """
    idx = tag_index(nodes, id_col, tags_col)
    sizes = idx.groupBy("id").agg(F.count(F.lit(1)).alias("n_tags"))
    a = idx.alias("a")
    b = idx.alias("b")
    co = (
        a.join(b, (F.col("a.tag") == F.col("b.tag")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("a"), F.col("n_tags").alias("na"))
    sb = sizes.select(F.col("id").alias("b"), F.col("n_tags").alias("nb"))
    out = (
        co.join(sa, "a").join(sb, "b")
        .withColumn("union_size", F.col("na") + F.col("nb") - F.col("inter"))
        .withColumn("jaccard", F.col("inter").cast("double") / F.col("union_size"))
        .select("a", "b", "inter", "union_size", "jaccard")
    )
    if threshold is not None:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def jaccard_partners(nodes: DataFrame, node_id: int, threshold: float = 0.3,
                     id_col: str = "id", tags_col: str = "tags") -> DataFrame:
    """J4 ``findSimilarNodesByTags`` (``src/core/GraphDB.cpp:576-603``, default
    θ=0.3 ``include/core/GraphDB.hpp:51``): partners of one node with
    Jaccard >= θ. Returns (id, jaccard)."""
    pairs = jaccard_pairs(nodes, id_col, tags_col, threshold)
    mine = pairs.filter((F.col("a") == node_id) | (F.col("b") == node_id))
    partner = F.when(F.col("a") == node_id, F.col("b")).otherwise(F.col("a"))
    return mine.select(partner.alias("id"), "jaccard")


def tag_bank_union(bank: DataFrame, new_tags: DataFrame) -> DataFrame:
    """A8/U2 tag-bank distinct union (``src/core/GraphDB.cpp:499-506``)."""
    return bank.union(new_tags.select(*bank.columns)).distinct()


def merge_links(links_a: DataFrame, links_b: DataFrame) -> DataFrame:
    """U1 link-merge: union-distinct of edge sets
    (``src/embedding/EmbeddingService.cpp:117-126``)."""
    return links_a.union(links_b.select(*links_a.columns)).distinct()
