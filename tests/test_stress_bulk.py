"""Bulk smoke at ~20-40x the bench corpus: operators must complete and give
exactly predictable answers on 100k synthetic documents with planted
duplicates. Generation is pure column expressions (no driver lists); the
whole file budgets ~60-90s so the verification suite stays fast."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.slow  # bulk stress: excluded from the fast dev loop

N = 100_000          # documents
DUP_STRIDE = 100     # ids ending in 00/01 share identical text -> N/100 pairs


@pytest.fixture(scope="module")
def bulk_docs(spark):
    ids = spark.range(0, N)
    base_id = F.when(F.col("id") % DUP_STRIDE == 1, F.col("id") - 1) \
               .otherwise(F.col("id"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda j: F.concat(F.lit("w"), F.pmod(F.xxhash64(base_id, j),
                                              F.lit(500))))
    df = ids.select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
        F.concat(F.lit("src"), F.pmod(F.col("id"), F.lit(20)))
        .alias("source"))
    return df.localCheckpoint(eager=True)


def test_exact_dedup_exact_counts_at_bulk(bulk_docs):
    from thewhisperdb_spark.operators import dedup as D

    kept = D.drop_exact_duplicates(bulk_docs).count()
    # every id ending in 01 duplicates its 00 neighbor; nothing else
    # collides (30 words over a 500-word vocab keyed by xxhash64(base_id))
    assert kept == N - N // DUP_STRIDE


def test_minhash_lsh_finds_planted_dups_at_bulk(bulk_docs):
    from thewhisperdb_spark.operators import dedup as D

    pairs = D.minhash_lsh_pairs(bulk_docs, n_hashes=32, bands=8,
                                threshold=0.9, shingle_n=3,
                                portable=False)
    planted = pairs.filter((F.col("a") % DUP_STRIDE == 0)
                           & (F.col("b") == F.col("a") + 1))
    assert planted.count() == N // DUP_STRIDE  # banding lossless on J=1 pairs
    # identical texts -> identical signatures -> estimated jaccard exactly 1
    assert planted.filter(F.col("est_jaccard") < 1.0).count() == 0


def test_quality_and_mixture_single_pass_at_bulk(bulk_docs):
    from thewhisperdb_spark.operators.sampling import mixture_weights
    from thewhisperdb_spark.operators.text import gopher_quality_flags

    g = gopher_quality_flags(bulk_docs)
    # every doc is 30 words of 2-4 chars and passes nothing but the length
    # check; the aggregate touches all N rows in one pass
    agg = g.agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("keep").cast("long")).alias("kept")).collect()[0]
    assert agg.n == N and agg.kept == 0    # 30 words < the 50-word floor
    mw = {r.source: r for r in mixture_weights(bulk_docs).collect()}
    assert len(mw) == 20
    assert sum(r.n_docs for r in mw.values()) == N
    assert abs(sum(r.token_share for r in mw.values()) - 1.0) < 1e-4
