"""End-to-end pretraining pipeline composite (plans/pipeline.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from thewhisperdb_spark.catalog import load_table
from thewhisperdb_spark.plans.pipeline import run_pretraining_pipeline

SF_DIR = "/root/testdata/sf0.001"


def test_pipeline_stages_monotone_and_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents")
    res = run_pretraining_pipeline(docs)
    stages = dict(res["stages"])
    order = [s for s, _ in res["stages"]]
    assert order == ["ingest", "quality_filter", "language_filter",
                     "exact_dedup", "near_dedup", "train_split",
                     "decontaminated_train", "packed_bins"]
    # every filtering stage can only shrink the row count
    counts = [n for _, n in res["stages"][:7]]
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert stages["ingest"] == docs.count()
    assert stages["decontaminated_train"] > 0
    assert stages["packed_bins"] > 0
    # pure function of the input: a second run agrees exactly
    res2 = run_pretraining_pipeline(docs)
    assert res["stages"] == res2["stages"]


def test_pipeline_train_split_is_clean(spark):
    docs = load_table(spark, SF_DIR, "documents")
    res = run_pretraining_pipeline(docs)
    train = res["train"]
    # only the requested language and split survive
    assert train.filter(F.col("lang") != "en").count() == 0
    assert train.filter(F.col("split") != "train").count() == 0
    # no exact duplicates remain
    assert (train.groupBy("text").count().filter(F.col("count") > 1)
            .count()) == 0
    # packing accounted for every surviving train document
    n_docs_binned = (res["bins"].agg(F.sum("n_docs")).collect()[0][0])
    assert n_docs_binned == train.count()
