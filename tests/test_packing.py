"""Packing/chunking semantics on tiny hand-countable corpora, plus the
weighted-sample distribution sanity check."""

from __future__ import annotations

from pyspark.sql import functions as F

from thewhisperdb_spark.operators import packing as PK
from thewhisperdb_spark.operators import sampling as SM


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_pack_sequences_bins(spark):
    # lang 'a': docs of 3, 4, 2 tokens, budget 5 ->
    #   doc 1 starts at 0 (bin 0), doc 2 at 3 (bin 0), doc 3 at 7 (bin 1)
    df = _docs(spark, [
        (1, "a", "w w w"),
        (2, "a", "w w w w"),
        (3, "a", "w w"),
        (10, "b", "w w w w w w"),   # 6 tokens, starts bin 0
    ])
    got = {(r.shard, r.bin_id): (r.n_docs, r.bin_tokens)
           for r in PK.pack_sequences(df, budget=5).collect()}
    assert got == {("a", 0): (2, 7), ("a", 1): (1, 2), ("b", 0): (1, 6)}


def test_chunk_documents_windows(spark):
    # 10 tokens, width 4, stride 3 -> starts 1,4,7,10; last two clamp
    df = _docs(spark, [(1, "a", " ".join(f"t{i}" for i in range(10)))])
    out = (PK.chunk_documents(df, width=4, stride=3)
           .orderBy("chunk_start").collect())
    assert [(r.chunk_start, r.n_chunk_tokens) for r in out] == [
        (1, 4), (4, 4), (7, 4), (10, 1)]
    # overlapping windows with identical content hash equal
    df2 = _docs(spark, [(1, "a", "x y z"), (2, "b", "x y z")])
    hashes = (PK.chunk_documents(df2, width=4, stride=3)
              .select("chunk_hash").distinct().count())
    assert hashes == 1


def test_chunk_documents_skips_empty(spark):
    df = _docs(spark, [(1, "a", ""), (2, "a", "w")])
    assert PK.chunk_documents(df).count() == 1


def test_weighted_sample_biased_to_heavy(spark):
    # weights 100 vs 1: heavy rows should dominate a half-size sample
    rows = [(i, "a", "x", 100 if i % 2 == 0 else 1) for i in range(1000)]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, text string, n_chars long")
    picked = SM.weighted_sample_aes(df, k=200).collect()
    heavy = sum(1 for r in picked if r.n_chars == 100)
    assert len(picked) == 200
    assert heavy > 170  # expected ~198; far above the unweighted 100

    # deterministic: same draw twice
    again = {r.doc_id for r in SM.weighted_sample_aes(df, k=200).collect()}
    assert {r.doc_id for r in picked} == again


def test_weighted_sample_plan_is_topk(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "doc_id long, n_chars long")
    plan = (SM.weighted_sample_aes(df, k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan  # top-k, not global sort
