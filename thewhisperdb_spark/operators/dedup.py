"""Deduplication operators (north-star §2.11): exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine near-dup.

All candidate generation is equi-join shaped (group on a key: text hash,
shingle, band bucket, simhash band) — never a cross join — so each op's cost
is Σ bucket² instead of n², which is the property that survives 100 TB.
Hashing uses the built-in ``xxhash64`` (JVM, codegen) so nothing here drops
into Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from thewhisperdb_spark.operators.text import char_ngrams, tags_of


def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact dedup via hash-groupBy: duplicate groups with the kept (min) id.
    Returns (text, n_dups, keeper) for groups of size > 1."""
    return (
        df.groupBy(text_col)
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keeper"))
        .filter(F.col("n_dups") > 1)
    )


def drop_exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Keep min-id row per distinct text. Shuffles on text hash once."""
    keep = df.groupBy(text_col).agg(F.min(id_col).alias(id_col))
    return df.join(keep, [text_col, id_col])


def shingle_jaccard_pairs(df: DataFrame, n: int = 3, threshold: float = 0.9,
                          id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """N-gram Jaccard near-dup: char-n-gram shingle sets, exact Jaccard via the
    inverted-index co-occurrence identity J = c/(|A|+|B|-c) (same kernel as
    tags.jaccard_pairs, different shingling). Returns (a, b, jaccard)."""
    sh = df.select(F.col(id_col).alias("id"),
                   F.explode(char_ngrams(F.col(text_col), n)).alias("sh"))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    co = (
        sh.alias("x").join(sh.alias("y"),
                           (F.col("x.sh") == F.col("y.sh")) & (F.col("x.id") < F.col("y.id")))
        .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        co.join(sizes.select(F.col("id").alias("a"), F.col("n_sh").alias("na")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("n_sh").alias("nb")), "b")
        .withColumn("jaccard",
                    F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return out


def minhash_signature(set_col: Column, n_hashes: int = 64, seed: int = 42) -> Column:
    """MinHash signature over a string-array column: h_i(S) = min over elements
    of xxhash64(seed+i, element). Array of n_hashes longs."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(
            F.transform(set_col, lambda s: F.xxhash64(F.lit(seed) + i, s))),
    )


def minhash_lsh_pairs(df: DataFrame, n_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.8, shingle_n: int = 3,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """MinHash+LSH near-dup (shingle -> minhash -> band -> bucket equi-join ->
    exact-signature Jaccard re-check). Candidate pairs are generated per band
    bucket — Σ bucket² work — then scored by estimated Jaccard (fraction of
    agreeing minhashes). Returns (a, b, est_jaccard)."""
    rows_per_band = n_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(char_ngrams(F.col(text_col), shingle_n), n_hashes).alias("sig"),
    )
    banded = sig.select(
        "id", "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.slice(F.col("sig"), b * rows_per_band + 1,
                                                 rows_per_band).cast("array<string>"))
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"),
              (F.col("x.band") == F.col("y.band"))
              & (F.col("x.bucket") == F.col("y.bucket"))
              & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"),
                F.col("x.sig").alias("siga"), F.col("y.sig").alias("sigb"))
        .dropDuplicates(["a", "b"])
    )
    est = (
        F.size(F.filter(F.zip_with(F.col("siga"), F.col("sigb"),
                                   lambda x, y: x == y), lambda m: m))
        .cast("double") / F.lit(n_hashes)
    )
    return (
        cand.select("a", "b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def simhash(set_col: Column, bits: int = 64) -> Column:
    """SimHash fingerprint of a string-array column: sign-sum of per-element
    hash bits, packed to a long. Near-dup candidates = equal values (or equal
    band slices for Hamming-distance tolerance).

    Each bit uses an independent element hash (xxhash64 seeded with the bit
    index) — equivalent to projecting on independent random hyperplanes, and it
    keeps everything one codegen'd expression per document."""
    def vote_fn(j):
        # bind j by closure — the lambda itself must take exactly (acc, e)
        return lambda acc, e: acc + F.when(
            F.pmod(F.xxhash64(F.lit(j), e), F.lit(2)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    fp = F.lit(0).cast("long")
    for j in range(bits):
        vote = F.aggregate(set_col, F.lit(0), vote_fn(j))
        fp = fp + F.when(vote >= 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long"))
    return fp


def simhash_duplicates(df: DataFrame, bits: int = 32,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """SimHash near-dup groups: docs whose token-set simhash collides.
    Returns (simhash, n_docs, member_ids_csv) for groups of size > 1."""
    h = df.select(F.col(id_col).alias("id"),
                  simhash(tags_of(F.col(text_col)), bits).alias("simhash"))
    return (
        h.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.array_join(F.array_sort(F.collect_list("id")), ",").alias("member_ids_csv"))
        .filter(F.col("n_docs") > 1)
    )


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.99,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup: cosine >= θ pairs (θ near 1). Exact kernel;
    at scale swap in vectors.ann_lsh_pairs for candidate generation."""
    from thewhisperdb_spark.operators.vectors import similar_pairs

    return similar_pairs(embeddings, threshold, id_col, vec_col)
