"""Streaming twins verified against their batch equivalents: the same rows
through readStream must produce the same aggregates as the batch query."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from thewhisperdb_spark.streaming import jobs as SJ


def _t(minute: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1, 12, 0) + dt.timedelta(minutes=minute)


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    rows = [
        # user 1: two sessions (gap > 30 min between minute 10 and 50)
        (1, _t(0), 1, "click", 1.0, ""),
        (2, _t(10), 1, "click", 2.0, ""),
        (3, _t(50), 1, "view", 3.0, ""),
        # user 2: one session
        (4, _t(5), 2, "click", 4.0, ""),
        (5, _t(20), 2, "view", 5.0, ""),
        # next hour bucket
        (6, _t(70), 1, "click", 6.0, ""),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    path = str(tmp_path_factory.mktemp("stream") / "events")
    df.repartition(2).write.parquet(path)
    return path


def test_windowed_counts_match_batch(spark, event_dir):
    stream = SJ.stream_events_from_dir(spark, event_dir)
    assert stream.isStreaming
    out = SJ.run_to_memory(
        SJ.windowed_event_counts(stream, "1 hour"), "win_counts", "complete")
    got = {(r["win_start"].minute + 60 * r["win_start"].hour, r["event_type"]): r["n"]
           for r in out.collect()}
    batch = spark.read.parquet(event_dir)
    expect = {(r["h"].minute + 60 * r["h"].hour, r["event_type"]): r["n"]
              for r in batch.groupBy(F.date_trunc("hour", "ts").alias("h"),
                                     "event_type")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == expect and len(got) == 3


def test_sessionize_stream(spark, event_dir):
    stream = SJ.stream_events_from_dir(spark, event_dir)
    out = SJ.run_to_memory(
        SJ.sessionize_stream(stream, gap="30 minutes"), "sessions", "complete")
    sessions = sorted((r["user_id"], r["n_events"]) for r in out.collect())
    # user 1: {0,10} then {50,70} (20-min gap < 30 merges them); user 2: {5,20}
    assert sessions == [(1, 2), (1, 2), (2, 2)]


def test_stateful_running_totals(spark, event_dir):
    stream = SJ.stream_events_from_dir(spark, event_dir)
    out = SJ.run_to_memory(
        SJ.sessionize_with_state(stream), "user_state", "update")
    # last update per user = final running totals
    final = {r["user_id"]: (r["n_events"], r["total_value"])
             for r in out.orderBy("n_batches").collect()}
    assert final[1] == (4, 12.0)
    assert final[2] == (2, 9.0)


def test_real_events_table_replay(spark, tmp_path):
    # end-to-end on driver testdata: replay sf0.001 events as a stream and
    # compare totals to the batch count
    sf = "/root/testdata/sf0.001"
    path = SJ.events_to_stream_dir(spark, sf, str(tmp_path), n_chunks=3)
    stream = SJ.stream_events_from_dir(spark, path, max_files_per_trigger=1)
    out = SJ.run_to_memory(
        SJ.windowed_event_counts(stream, "1 hour"), "real_win", "complete")
    total_streamed = out.agg(F.sum("n")).collect()[0][0]
    assert total_streamed == spark.read.parquet(path).count()


def test_dedup_stream_drops_repeats(spark, event_dir, tmp_path):
    # duplicate the event files so every event_id appears twice in the stream
    dup = str(tmp_path / "dup_events")
    base = spark.read.parquet(event_dir)
    base.union(base).repartition(3).write.parquet(dup)
    stream = SJ.stream_events_from_dir(spark, dup)
    out = SJ.run_to_memory(SJ.dedup_stream(stream), "dedup_ev", "append")
    ids = sorted(r["event_id"] for r in out.collect())
    assert ids == [1, 2, 3, 4, 5, 6]


def test_hopping_counts_match_batch(spark, event_dir):
    stream = SJ.stream_events_from_dir(spark, event_dir)
    out = SJ.run_to_memory(
        SJ.hopping_event_counts(stream, "10 minutes", "5 minutes"),
        "hop_counts", "complete")
    got = {(r["wstart"].hour * 60 + r["wstart"].minute, r["event_type"]): r["n"]
           for r in out.collect()}
    batch = spark.read.parquet(event_dir)
    expect = {(r["w"]["start"].hour * 60 + r["w"]["start"].minute,
               r["event_type"]): r["n"]
              for r in batch.groupBy(F.window("ts", "10 minutes", "5 minutes")
                                     .alias("w"), "event_type")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == expect
    # every event appears in exactly window/slide = 2 windows
    assert sum(got.values()) == 2 * batch.count()


def test_stream_stream_interval_join(spark, event_dir, tmp_path_factory):
    import os

    rows = [
        # purchase at minute 30; clicks at 0 (1800s before) and 29;
        # click at minute 31 is AFTER the purchase -> excluded
        (10, _t(0), 7, "click", 0.0, ""),
        (11, _t(29), 7, "click", 0.0, ""),
        (12, _t(30), 7, "purchase", 9.0, ""),
        (13, _t(31), 7, "click", 0.0, ""),
        # other user's click must not attribute
        (14, _t(29), 8, "click", 0.0, ""),
        # click 61 min before purchase -> outside the 3600 s window
        (15, _t(120), 9, "purchase", 1.0, ""),
        (16, _t(59), 9, "click", 0.0, ""),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    path = str(tmp_path_factory.mktemp("sj") / "events")
    df.repartition(2).write.parquet(path)
    stream = SJ.stream_events_from_dir(spark, path)
    out = SJ.run_to_memory(
        SJ.click_purchase_interval_join(stream, max_gap_s=3600),
        "cp_join", "append")
    got = sorted((r["purchase_id"], r["click_id"], r["secs_before"])
                 for r in out.collect())
    assert got == [(12, 10, 1800), (12, 11, 60)]


def test_stream_static_enrichment(spark, event_dir):
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id_d long, tier string")
    stream = SJ.stream_events_from_dir(spark, event_dir)
    out = SJ.run_to_memory(
        SJ.enrich_with_dim(stream, dim, "user_id", "user_id_d")
        .groupBy("tier").count(),
        "enriched", "complete")
    got = {r.tier: r["count"] for r in out.collect()}
    assert got == {"gold": 4, "silver": 2}


def test_idempotent_sink_replay_no_duplicates(spark, event_dir, tmp_path):
    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")
    stream = SJ.stream_events_from_dir(spark, event_dir)
    q = SJ.idempotent_parquet_sink(stream, out, ckpt)
    q.awaitTermination()
    first = spark.read.parquet(out)
    n = first.count()
    assert n == spark.read.parquet(event_dir).count()
    # simulate a redelivered batch: rewrite batch 0 with the same data —
    # overwrite-by-batch-dir means row count is unchanged (no append dupes)
    import os as _os
    bdir = sorted(p for p in _os.listdir(out) if p.startswith("batch_id="))[0]
    batch_df = spark.read.parquet(_os.path.join(out, bdir))
    redelivered = spark.createDataFrame(batch_df.collect(), batch_df.schema)
    redelivered.write.mode("overwrite").parquet(_os.path.join(out, bdir))
    assert spark.read.parquet(out).count() == n


def test_gopher_filter_runs_under_readstream(spark, tmp_path_factory):
    """The round-4 quality pass is stateless column expressions, so the SAME
    operator must run unchanged on a file stream (the live-ingest filter a
    pretraining pipeline runs before anything stateful) and agree with the
    batch result row-for-row."""
    from thewhisperdb_spark.operators.text import gopher_quality_flags

    rows = [
        (1, "the of " + " ".join(["word"] * 58)),   # passes every rule
        (2, "too short"),                           # word-count fail
        (3, " ".join(["12345"] * 60)),              # alpha-ratio fail
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path_factory.mktemp("gopher_stream") / "docs")
    df.write.parquet(path)

    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(path))
    out = SJ.run_to_memory(
        gopher_quality_flags(stream).select("doc_id", "n_words", "keep"),
        "gopher_stream", "append")
    got = {r.doc_id: (r.n_words, r.keep) for r in out.collect()}
    expect = {r.doc_id: (r.n_words, r.keep)
              for r in gopher_quality_flags(df)
              .select("doc_id", "n_words", "keep").collect()}
    assert got == expect
    assert got[1][1] and not got[2][1] and not got[3][1]


def test_stream_shards_sink_matches_batch_export(spark, tmp_path):
    """Incremental shard publishing must land in the SAME deterministic
    layout as the batch export: after draining the stream, the shard
    manifest over the streamed tree equals the manifest over a batch
    write_training_shards of the same rows (ignoring the idempotency
    batch_id sub-partition)."""
    from pyspark.sql import functions as F

    from thewhisperdb_spark.sources import textio

    docs = spark.createDataFrame(
        [(i, f"doc-{i}", "en") for i in range(300)],
        "doc_id long, text string, lang string")
    src = str(tmp_path / "src")
    docs.repartition(3).write.parquet(src)  # 3 files -> up to 3 micro-batches
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out, ckpt = str(tmp_path / "shards"), str(tmp_path / "ckpt")
    q = SJ.stream_shards_sink(stream, out, ckpt, "doc_id", n_shards=4)
    q.awaitTermination()
    batch_out = str(tmp_path / "batch_shards")
    textio.write_training_shards(docs, batch_out, "doc_id", n_shards=4)
    man_s = sorted(map(tuple, textio.shard_manifest(
        spark, out, "doc_id", ("text", "lang")).collect()))
    man_b = sorted(map(tuple, textio.shard_manifest(
        spark, batch_out, "doc_id", ("text", "lang")).collect()))
    assert man_s == man_b and len(man_s) == 4


def test_streaming_jobs_survive_empty_input(spark, tmp_path_factory):
    """An input directory whose parquet holds ZERO rows (schema only) must
    run every streaming job to completion with empty output — the
    no-events-yet cold start every deployed pipeline hits."""
    path = str(tmp_path_factory.mktemp("stream_empty") / "events")
    (spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string")
     .write.parquet(path))
    stream = SJ.stream_events_from_dir(spark, path)
    assert SJ.run_to_memory(
        SJ.windowed_event_counts(stream, "1 hour"),
        "empty_win", "complete").count() == 0
    stream2 = SJ.stream_events_from_dir(spark, path)
    assert SJ.run_to_memory(
        SJ.sessionize_stream(stream2), "empty_sess", "append").count() == 0
    stream3 = SJ.stream_events_from_dir(spark, path)
    assert SJ.run_to_memory(
        SJ.kmv_distinct_stream(stream3), "empty_kmv", "update").count() == 0


@pytest.mark.slow  # index-lifecycle marathon: CI-tier
def test_stream_append_to_lsh_matches_batch_append(spark, tmp_path):
    """Documents arriving over N micro-batches must produce a
    bit-identical LSH index to one batch append of the same rows:
    identical signature sets and identical probe output (signatures are
    content-deterministic, so row-set equality IS bit-identity here)."""
    from thewhisperdb_spark.catalog import load_table
    from thewhisperdb_spark.operators import dedup as D
    from thewhisperdb_spark.streaming import jobs as SJ

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 30)
    delta = docs.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 60))

    batch_path = str(tmp_path / "lsh_batch")
    D.lsh_index_build(base, batch_path, n_hashes=16, bands=4, shingle_n=5)
    D.lsh_index_append(spark, batch_path, delta)

    stream_path = str(tmp_path / "lsh_stream")
    D.lsh_index_build(base, stream_path, n_hashes=16, bands=4, shingle_n=5)
    src = str(tmp_path / "src")
    delta.repartition(3).write.parquet(src)          # 3 micro-batches
    stream = (spark.readStream.schema(delta.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = SJ.stream_append_to_lsh(stream, stream_path, str(tmp_path / "ckpt"))
    q.awaitTermination()

    def sig_rows(path):
        return sorted((r["id"], tuple(r["sig"])) for r in
                      spark.read.parquet(f"{path}/signatures").collect())

    assert sig_rows(stream_path) == sig_rows(batch_path)
    probe_in = docs.filter(F.col("doc_id") >= 50).limit(20)

    def probe(path):
        return sorted(
            (r["batch_id"], r["index_id"], round(r["est_jaccard"], 6))
            for r in D.lsh_index_probe(spark, path, probe_in,
                                       threshold=0.9).collect())

    got, want = probe(stream_path), probe(batch_path)
    assert got == want and len(got) > 0


SYN_A = ("the amazing zebra quantum physics lecture covered entanglement "
         "superposition decoherence and measurement in exhaustive detail "
         "for the thirty fifth session of the seminar series")
SYN_B = ("completely different prose about medieval agriculture crop "
         "rotation three field systems oxen ploughs and the gradual "
         "adoption of the heavy wheeled plough across northern europe")


@pytest.mark.slow  # index-lifecycle marathon: CI-tier
def test_dedup_ingest_batch_full_loop_and_replay(spark, tmp_path):
    """The complete daily-crawl loop per micro-batch: cross-corpus dups
    dropped via the index probe, within-batch dups collapsed to the min-id
    survivor, survivors published under their batch partition and appended
    to the index — and an exact replay of a batch changes NOTHING."""
    from thewhisperdb_spark.catalog import load_table
    from thewhisperdb_spark.operators import dedup as D
    from thewhisperdb_spark.streaming import jobs as SJ

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 30)
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    D.lsh_index_build(base, idx, n_hashes=16, bands=4, shingle_n=5)
    t5 = docs.filter(F.col("doc_id") == 5).collect()[0]["text"]

    b0 = (docs.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 40))
          .unionByName(spark.createDataFrame(
              [(2001, SYN_A),    # within-batch dup pair: 2001 survives
               (2002, SYN_A),    # ... 2002 dropped (min-id keep)
               (2003, t5)],      # cross-corpus dup of indexed doc 5: dropped
              "doc_id long, text string")))
    SJ.dedup_ingest_batch(b0, 0, idx, out, threshold=0.9)

    def published():
        return {(r["doc_id"], r["ingest_batch"])
                for r in spark.read.parquet(out).collect()}

    def index_counts():
        return (spark.read.parquet(f"{idx}/signatures").count(),
                spark.read.parquet(f"{idx}/buckets").count())

    surv0 = {d for d, b in published() if b == 0}
    assert 2001 in surv0 and 2002 not in surv0 and 2003 not in surv0
    assert surv0 <= {r["doc_id"] for r in b0.collect()}
    state = (published(), index_counts())

    # exact replay of batch 0: same published rows, same index
    SJ.dedup_ingest_batch(b0, 0, idx, out, threshold=0.9)
    assert (published(), index_counts()) == state

    # batch 1: a dup of a batch-0 SURVIVOR is dropped (the index grew),
    # genuinely new text survives
    b1 = spark.createDataFrame([(3001, SYN_A), (3002, SYN_B)],
                               "doc_id long, text string")
    SJ.dedup_ingest_batch(b1, 1, idx, out, threshold=0.9)
    surv1 = {d for d, b in published() if b == 1}
    assert surv1 == {3002}
    assert {d for d, b in published() if b == 0} == surv0  # batch 0 intact


@pytest.mark.slow  # index-lifecycle marathon: CI-tier
def test_stream_dedup_ingest_runs_end_to_end(spark, tmp_path):
    """The streaming wrapper drains a real readStream through the loop:
    survivors published, index grown by exactly the survivor count."""
    from thewhisperdb_spark.catalog import load_table
    from thewhisperdb_spark.operators import dedup as D
    from thewhisperdb_spark.streaming import jobs as SJ

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 30)
    idx = str(tmp_path / "idx2")
    out = str(tmp_path / "out2")
    D.lsh_index_build(base, idx, n_hashes=16, bands=4, shingle_n=5)
    n_base = spark.read.parquet(f"{idx}/signatures").count()

    delta = docs.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 50))
    src = str(tmp_path / "src2")
    delta.repartition(2).write.parquet(src)       # 2 micro-batches
    stream = (spark.readStream.schema(delta.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = SJ.stream_dedup_ingest(stream, idx, out, str(tmp_path / "ckpt2"),
                               threshold=0.9)
    q.awaitTermination()

    surv = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert surv <= {r["doc_id"] for r in delta.collect()} and surv
    assert spark.read.parquet(f"{idx}/signatures").count() \
        == n_base + len(surv)


def test_dedup_ingest_batch_quality_preferring_survivors(spark, tmp_path):
    """quality_col routes within-batch groups through pick_survivors: the
    HIGHEST-quality member survives (not the min id), and only the
    survivor is published and indexed."""
    from thewhisperdb_spark.catalog import load_table
    from thewhisperdb_spark.operators import dedup as D
    from thewhisperdb_spark.streaming import jobs as SJ

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")
    idx = str(tmp_path / "idxq")
    out = str(tmp_path / "outq")
    D.lsh_index_build(docs.filter(F.col("doc_id") < 10), idx,
                      n_hashes=16, bands=4, shingle_n=5)
    b0 = spark.createDataFrame(
        [(2001, SYN_A, 5.0),       # dup pair: 2002 has HIGHER quality
         (2002, SYN_A, 9.0),       # ... so 2002 survives despite larger id
         (2003, SYN_B, 1.0)],      # singleton survives regardless
        "doc_id long, text string, quality double")
    SJ.dedup_ingest_batch(b0, 0, idx, out, threshold=0.9,
                          quality_col="quality")
    surv = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert surv == {2002, 2003}
    indexed = {r["id"] for r in
               spark.read.parquet(f"{idx}/signatures").collect()}
    assert 2002 in indexed and 2001 not in indexed


@pytest.mark.slow  # crash/replay marathon: CI-tier
def test_embedding_dedup_ingest_batch_and_replay(spark, tmp_path):
    """The embedding twin of the daily loop: cross-corpus cosine dups
    dropped via the persisted IVF probe (exhaustive n_probe here),
    within-batch dups collapse to the min-id survivor, survivors are
    published and appended, and an exact replay changes nothing."""
    from thewhisperdb_spark.operators import vectors as V
    from thewhisperdb_spark.streaming import jobs as SJ

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding")
    idx = str(tmp_path / "ivf_ing")
    out = str(tmp_path / "out_ing")
    V.ivf_index_build(emb.filter(F.col("vec_id") < 300), idx, n_cells=4)

    v5 = emb.filter(F.col("vec_id") == 5).collect()[0]["embedding"]
    uniq = [1.0] + [0.0] * (len(v5) - 1)
    # planted rows must match the index's at-rest vector type (the append
    # type gate rejects drift) — testdata embeddings are array<float>
    vt = emb.schema["embedding"].dataType.simpleString()
    b0 = (emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 310))
          .unionByName(spark.createDataFrame(
              [(9005, list(v5)),    # exact copy of indexed vec 5: dropped
               (9100, uniq),        # within-batch dup pair: 9100 survives
               (9101, uniq)],       # ... 9101 dropped (min-id keep)
              "vec_id long, embedding array<double>")
              .select("vec_id", F.col("embedding").cast(vt)
                      .alias("embedding"))))
    SJ.embedding_dedup_ingest_batch(b0, 0, idx, out, threshold=0.999,
                                    n_probe=4)

    def published():
        return {r["vec_id"] for r in spark.read.parquet(out).collect()}

    surv = published()
    assert 9100 in surv and 9101 not in surv and 9005 not in surv
    n_lists = spark.read.parquet(f"{idx}/lists").count()
    assert n_lists == 300 + len(surv)
    SJ.embedding_dedup_ingest_batch(b0, 0, idx, out, threshold=0.999,
                                    n_probe=4)                 # replay
    assert published() == surv
    assert spark.read.parquet(f"{idx}/lists").count() == n_lists

    # blas=True (the real-dims production probe, 2.8x at dim 768): same
    # survivors on a fresh index — with r8's lexsort tie-break the kernel
    # is batch-split-deterministic, and away from threshold-boundary
    # pairs it is decision-identical to the fold
    idx2 = str(tmp_path / "ivf_ing_blas")
    out2 = str(tmp_path / "out_ing_blas")
    V.ivf_index_build(emb.filter(F.col("vec_id") < 300), idx2, n_cells=4)
    SJ.embedding_dedup_ingest_batch(b0, 0, idx2, out2, threshold=0.999,
                                    n_probe=4, blas=True)
    assert {r["vec_id"]
            for r in spark.read.parquet(out2).collect()} == surv


@pytest.mark.slow  # index-lifecycle marathon: CI-tier
def test_stream_embedding_dedup_ingest_runs(spark, tmp_path):
    from thewhisperdb_spark.operators import vectors as V
    from thewhisperdb_spark.streaming import jobs as SJ

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding")
    idx = str(tmp_path / "ivf_s2")
    out = str(tmp_path / "out_s2")
    V.ivf_index_build(emb.filter(F.col("vec_id") < 300), idx, n_cells=4)
    delta = emb.filter(F.col("vec_id") >= 300)
    src = str(tmp_path / "src_s2")
    delta.repartition(2).write.parquet(src)
    stream = (spark.readStream.schema(delta.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = SJ.stream_embedding_dedup_ingest(stream, idx, out,
                                         str(tmp_path / "ck_s2"),
                                         threshold=0.999, n_probe=4)
    q.awaitTermination()
    surv = {r["vec_id"] for r in spark.read.parquet(out).collect()}
    assert surv <= {r["vec_id"] for r in delta.collect()} and surv
    assert spark.read.parquet(f"{idx}/lists").count() == 300 + len(surv)


@pytest.mark.slow  # crash/replay marathon: CI-tier
def test_compact_ingest_survivors_folds_old_batches(spark, tmp_path):
    """Compaction folds all but the newest keep_last_n batch partitions
    into the archive (ingest_batch=-1) with the row SET conserved, keeps
    the replay window batch-addressed, and re-running converges (the
    id-dedupe absorbs a crash between archive write and dir deletion)."""
    import glob

    from thewhisperdb_spark.catalog import load_table
    from thewhisperdb_spark.operators import dedup as D
    from thewhisperdb_spark.streaming import jobs as SJ

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    D.lsh_index_build(docs.filter(F.col("doc_id") < 10), idx,
                      n_hashes=16, bands=4, shingle_n=5)
    for i, lo in enumerate((10, 20, 30, 40)):
        SJ.dedup_ingest_batch(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 10)),
            i, idx, out, threshold=0.95)

    def rows():
        return {(r["doc_id"], r["ingest_batch"])
                for r in spark.read.parquet(out).collect()}

    before_ids = {d for d, _ in rows()}
    SJ.compact_ingest_survivors(spark, out, "doc_id", keep_last_n=2)
    after = rows()
    assert {d for d, _ in after} == before_ids          # set conserved
    assert {b for _, b in after if b >= 0} == {2, 3}    # replay window kept
    assert any(b == -1 for _, b in after)               # archive exists
    assert not glob.glob(f"{out}/ingest_batch=0") and \
        not glob.glob(f"{out}/ingest_batch=1")
    # idempotent re-run (also the crash-recovery path)
    SJ.compact_ingest_survivors(spark, out, "doc_id", keep_last_n=2)
    assert rows() == after
    # later: fold the rest too
    SJ.compact_ingest_survivors(spark, out, "doc_id", keep_last_n=0)
    final = rows()
    assert {d for d, _ in final} == before_ids
    assert {b for _, b in final} == {-1}


@pytest.mark.slow  # crash/replay marathon: CI-tier
def test_compaction_crash_window_converges(spark, tmp_path):
    """The self-healing claim in compact_ingest_survivors, as a test: a
    crash BETWEEN the archive write and the folded-dir deletes leaves
    duplicate rows split across archive and un-deleted partitions; a
    compaction re-run over that torn state must converge to exactly the
    clean path's row set. Exercised on BOTH modalities' survivors dirs
    (text/LSH and embedding/IVF ingest loops)."""
    import shutil

    from thewhisperdb_spark.catalog import load_table
    from thewhisperdb_spark.operators import dedup as D
    from thewhisperdb_spark.operators import vectors as V
    from thewhisperdb_spark.streaming import jobs as SJ

    # --- build one survivors dir per modality via the real ingest loops
    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")
    lsh = str(tmp_path / "lsh_idx")
    text_out = str(tmp_path / "text_out")
    D.lsh_index_build(docs.filter(F.col("doc_id") < 10), lsh,
                      n_hashes=16, bands=4, shingle_n=5)
    for i, lo in enumerate((10, 20, 30, 40)):
        SJ.dedup_ingest_batch(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 10)),
            i, lsh, text_out, threshold=0.95)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding")
    ivf = str(tmp_path / "ivf_idx")
    emb_out = str(tmp_path / "emb_out")
    V.ivf_index_build(emb.filter(F.col("vec_id") < 50), ivf, n_cells=4)
    for i, lo in enumerate((50, 80, 110, 140)):
        SJ.embedding_dedup_ingest_batch(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 30)),
            i, ivf, emb_out, threshold=0.999)

    for out, id_col in ((text_out, "doc_id"), (emb_out, "vec_id")):
        torn = f"{out}_torn"
        shutil.copytree(out, torn)
        # clean path on the original
        SJ.compact_ingest_survivors(spark, out, id_col, keep_last_n=2)
        clean_rows = {(r[id_col], r["ingest_batch"])
                      for r in spark.read.parquet(out).collect()}
        # torn path on the copy: archive written, deletes skipped — the
        # exact crash window (rows now DUPLICATED across archive and the
        # still-present folded partitions)
        fold = SJ._archive_fold_write(spark, torn, id_col,
                                      keep_last_n=2,
                                      target_rows_per_file=4_000_000)
        assert fold == [0, 1]
        torn_df = spark.read.parquet(torn)
        n_ids = torn_df.select(id_col).distinct().count()
        assert torn_df.count() > n_ids            # duplicates present
        # re-run over the torn state -> converges to the clean row set
        SJ.compact_ingest_survivors(spark, torn, id_col, keep_last_n=2)
        torn_rows = {(r[id_col], r["ingest_batch"])
                     for r in spark.read.parquet(torn).collect()}
        assert torn_rows == clean_rows


@pytest.mark.slow  # crash/replay marathon: CI-tier
def test_stream_dedup_ingest_checkpoint_restart(spark, tmp_path,
                                                monkeypatch):
    """VERDICT r8 #2: the replay-idempotence claims, exercised through a
    REAL streaming restart rather than by construction. Three lifecycles
    against one checkpointLocation:
    (1) a clean availableNow drain of the first file (stop between
        micro-batches),
    (2) a run that CRASHES INSIDE batch 1 — an injected failure between
        the survivors publish and the index append, the torn point the
        sink-before-append ordering exists for,
    (3) a restart from the same checkpoint that replays batch 1 and
        finishes batch 2.
    Final published survivors (id -> batch) and the full at-rest index
    state (signature rows, bucket rows) must equal a single
    uninterrupted run over the same source — and the mid-crash state
    must be the documented torn shape (published but not yet indexed)."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from thewhisperdb_spark.catalog import load_table
    from thewhisperdb_spark.operators import dedup as D
    from thewhisperdb_spark.streaming import jobs as SJ

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 30)
    t5 = docs.filter(F.col("doc_id") == 5).collect()[0]["text"]
    schema = "doc_id long, text string"
    # three one-file micro-batches: plain docs; a within-batch dup pair;
    # a cross-corpus dup of indexed doc 5 plus fresh docs
    f1 = docs.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 36))
    f2 = (docs.filter((F.col("doc_id") >= 36) & (F.col("doc_id") < 40))
          .unionByName(spark.createDataFrame(
              [(2001, SYN_A), (2002, SYN_A)], schema)))
    f3 = (docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 44))
          .unionByName(spark.createDataFrame([(2003, t5)], schema)))

    def run_all(tag, staged):
        idx = str(tmp_path / f"idx_{tag}")
        out = str(tmp_path / f"out_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")
        src = str(tmp_path / f"src_{tag}")
        D.lsh_index_build(base, idx, n_hashes=16, bands=4, shingle_n=5)

        def drain():
            stream = (spark.readStream.schema(f1.schema)
                      .option("maxFilesPerTrigger", 1).parquet(src))
            return SJ.stream_dedup_ingest(stream, idx, out, ckpt,
                                          threshold=0.9)

        if not staged:
            for f in (f1, f2, f3):
                f.coalesce(1).write.mode("append").parquet(src)
            drain().awaitTermination()
            return idx, out
        # (1) clean stop after the first micro-batch
        f1.coalesce(1).write.mode("append").parquet(src)
        drain().awaitTermination()
        # (2) crash INSIDE batch 1: publish lands, index append does not
        f2.coalesce(1).write.mode("append").parquet(src)
        f3.coalesce(1).write.mode("append").parquet(src)
        state = {"crashed": False}
        real_append = D.lsh_index_append

        def failing_append(*a, **kw):
            if not state["crashed"]:
                state["crashed"] = True
                raise RuntimeError("injected crash before index append")
            return real_append(*a, **kw)

        monkeypatch.setattr(D, "lsh_index_append", failing_append)
        with pytest.raises(StreamingQueryException,
                           match="injected crash"):
            drain().awaitTermination()
        assert state["crashed"]
        # torn mid-crash shape: batch-1 survivors PUBLISHED (sink writes
        # first) but NOT indexed (2001's signature is absent)
        pub = {r["doc_id"]: r["ingest_batch"]
               for r in spark.read.parquet(out).collect()}
        assert pub[2001] == 1
        idx_ids = {r["id"] for r in spark.read.schema(
            "id long, sig array<long>")
            .parquet(f"{idx}/signatures").select("id").collect()}
        assert 2001 not in idx_ids and 2002 not in idx_ids
        # (3) restart from the same checkpoint: batch 1 replays, 2 runs
        monkeypatch.setattr(D, "lsh_index_append", real_append)
        drain().awaitTermination()
        return idx, out

    idx_o, out_o = run_all("oracle", staged=False)
    idx_s, out_s = run_all("staged", staged=True)

    def published(out):
        return {r["doc_id"]: r["ingest_batch"]
                for r in spark.read.parquet(out).collect()}

    def index_state(idx):
        sig = {(r["id"], tuple(r["sig"])) for r in spark.read.schema(
            "id long, sig array<long>").parquet(f"{idx}/signatures")
            .collect()}
        buckets = sorted(
            (r["id"], r["band"], r["bucket"]) for r in spark.read.schema(
                "id long, bucket long, band int")
            .parquet(f"{idx}/buckets").collect())
        return sig, buckets

    assert published(out_s) == published(out_o)
    assert set(published(out_s)) >= {30, 2001, 40}
    assert 2002 not in published(out_s)          # within-batch dup dropped
    assert 2003 not in published(out_s)          # cross-corpus dup dropped
    assert index_state(idx_s) == index_state(idx_o)
    # and a probe over the restarted index equals the oracle's
    probe_in = docs.filter(F.col("doc_id") < 44)
    got = {(r["batch_id"], r["index_id"]) for r in D.lsh_index_probe(
        spark, idx_s, probe_in, threshold=0.9).collect()}
    want = {(r["batch_id"], r["index_id"]) for r in D.lsh_index_probe(
        spark, idx_o, probe_in, threshold=0.9).collect()}
    assert got == want and got
def test_stream_crawl_curation_two_batches(spark, tmp_path):
    """Streaming crawl curation (streaming/jobs.py r10): archives stream
    in, curated text lands batch-partitioned; blocklist + robots both
    enforced; a second lifecycle against the same checkpoint processes
    only the new archive."""
    import time

    from pyspark.sql import functions as F

    from thewhisperdb_spark.operators.robots import extract_robots_rules
    from thewhisperdb_spark.sources.warc import (
        build_http_response,
        build_warc,
        build_warc_record,
    )
    from thewhisperdb_spark.streaming.jobs import stream_crawl_curation

    def page(uri, body):
        return build_warc_record(
            "response", build_http_response(
                b"<html><body><p>" + body + b"</p></body></html>"),
            target_uri=uri)

    src = tmp_path / "arrivals"
    out = str(tmp_path / "survivors")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    arc1 = build_warc([
        page("https://ok.com/a", b"clean page one"),
        page("https://evil.com/x", b"blocked host"),
        page("https://ok.com/private/x", b"robots disallowed"),
    ], gzip_per_record=True)
    spark.createDataFrame([("b1", arc1)], "path string, content binary") \
        .write.mode("overwrite").parquet(str(src / "f1.parquet"))

    blocklist = spark.createDataFrame([("evil.com",)], "domain string")
    robots = extract_robots_rules(spark.createDataFrame(
        [("ok.com", "User-agent: *\nDisallow: /private\n")],
        "host string, robots_txt string"))

    def run_once():
        stream = (spark.readStream
                  .schema("path string, content binary")
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src) + "/*"))
        q = stream_crawl_curation(stream, out, ckpt,
                                  blocklist=blocklist,
                                  robots_rules=robots)
        q.awaitTermination(120)
        time.sleep(0.2)

    run_once()
    rows = spark.read.parquet(out).collect()
    assert {r["url"] for r in rows} == {"https://ok.com/a"}
    assert rows[0]["text"] == "clean page one"
    assert rows[0]["registrable_domain"] == "ok.com"

    # second arrival -> new lifecycle, same checkpoint: only batch 2
    arc2 = build_warc([page("https://fresh.org/b", b"second wave")])
    spark.createDataFrame([("b2", arc2)], "path string, content binary") \
        .write.mode("overwrite").parquet(str(src / "f2.parquet"))
    run_once()
    rows = spark.read.parquet(out).collect()
    assert {r["url"] for r in rows} == {"https://ok.com/a",
                                        "https://fresh.org/b"}
    assert len({r["ingest_batch"] for r in rows}) == 2


def test_stream_crawl_policy_refresh_between_batches(spark, tmp_path):
    """VERDICT r10 #7: robots rules passed as a versioned snapshot-store
    path are reloaded at every micro-batch — publishing a new rule
    between two arrivals changes admission for the second batch only,
    with no query restart."""
    import time

    from thewhisperdb_spark.operators.policystore import (
        latest_policy_version,
        publish_policy_snapshot,
    )
    from thewhisperdb_spark.operators.robots import extract_robots_rules
    from thewhisperdb_spark.sources.warc import (
        build_http_response,
        build_warc,
        build_warc_record,
    )
    from thewhisperdb_spark.streaming.jobs import stream_crawl_curation

    def page(uri, body):
        return build_warc_record(
            "response", build_http_response(
                b"<html><body><p>" + body + b"</p></body></html>"),
            target_uri=uri)

    src = tmp_path / "arrivals"
    out = str(tmp_path / "survivors")
    ckpt = str(tmp_path / "ckpt")
    rules_store = str(tmp_path / "robots_snapshots")
    src.mkdir()

    def rules_for(body):
        return extract_robots_rules(spark.createDataFrame(
            [("site.com", body)], "host string, robots_txt string"))

    v1 = publish_policy_snapshot(
        rules_for("User-agent: *\nDisallow: /private\n"), rules_store)
    assert v1 == 1

    def run_once():
        stream = (spark.readStream
                  .schema("path string, content binary")
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src) + "/*"))
        q = stream_crawl_curation(stream, out, ckpt,
                                  robots_rules=rules_store)
        q.awaitTermination(120)
        time.sleep(0.2)

    arc1 = build_warc([page("https://site.com/news/a", b"wave one")],
                      gzip_per_record=True)
    spark.createDataFrame([("b1", arc1)], "path string, content binary") \
        .write.mode("overwrite").parquet(str(src / "f1.parquet"))
    run_once()
    assert {r["url"] for r in spark.read.parquet(out).collect()} == \
        {"https://site.com/news/a"}

    # policy change between batches: /news is now disallowed
    v2 = publish_policy_snapshot(
        rules_for("User-agent: *\nDisallow: /private\n"
                  "Disallow: /news\n"), rules_store)
    assert v2 == 2
    assert latest_policy_version(spark, rules_store) == 2

    arc2 = build_warc([page("https://site.com/news/b", b"now blocked"),
                       page("https://site.com/ok/c", b"still fine")],
                      gzip_per_record=True)
    spark.createDataFrame([("b2", arc2)], "path string, content binary") \
        .write.mode("overwrite").parquet(str(src / "f2.parquet"))
    run_once()
    got = {r["url"] for r in spark.read.parquet(out).collect()}
    # batch-1 survivor untouched (no retroactive re-filtering);
    # batch 2 admitted under the NEW rules
    assert got == {"https://site.com/news/a", "https://site.com/ok/c"}


def test_policy_store_versions_and_torn_write(spark, tmp_path):
    """Store semantics: versions are immutable and monotonically
    numbered; a torn (no _SUCCESS) directory is invisible to readers."""
    import pytest as _pytest

    from thewhisperdb_spark.operators.policystore import (
        latest_policy_version,
        load_policy_snapshot,
        publish_policy_snapshot,
    )

    store = str(tmp_path / "policies")
    with _pytest.raises(ValueError, match="no complete"):
        load_policy_snapshot(spark, store)
    df1 = spark.createDataFrame([("a.com",)], "domain string")
    df2 = spark.createDataFrame([("a.com",), ("b.com",)],
                                "domain string")
    assert publish_policy_snapshot(df1, store) == 1
    assert publish_policy_snapshot(df2, store) == 2
    assert load_policy_snapshot(spark, store).count() == 2
    assert load_policy_snapshot(spark, store, version=1).count() == 1
    # torn write: v3 exists but has no _SUCCESS -> still serves v2
    import os
    import shutil
    v3 = os.path.join(store, "v000000003")
    shutil.copytree(os.path.join(store, "v000000002"), v3)
    os.remove(os.path.join(v3, "_SUCCESS"))
    assert latest_policy_version(spark, store) == 2
    assert load_policy_snapshot(spark, store).count() == 2
    # publisher recovery (ADVICE r11): the torn v3 still OCCUPIES its
    # number — the next publish must skip to v4, not wedge forever on
    # errorifexists against the debris; readers promote it via _SUCCESS
    assert publish_policy_snapshot(df1, store) == 4
    assert latest_policy_version(spark, store) == 4
    assert load_policy_snapshot(spark, store).count() == 1


def test_frontier_schedule_batches_continue_and_replay(spark, tmp_path):
    """Stateful politeness: batch 2's offsets for a host CONTINUE from
    batch 1's cursor (last slot + one delay); a host absent from batch
    2 carries its cursor forward; replaying batch 2 reproduces the
    identical schedule and cursor (no double-advance)."""
    from thewhisperdb_spark.streaming.jobs import frontier_schedule_batch

    sched_dir = str(tmp_path / "sched")
    cur_dir = str(tmp_path / "cursor")

    b1 = spark.createDataFrame(
        [("https://a.com/1",), ("https://a.com/2",), ("https://b.com/1",)],
        "url string")
    frontier_schedule_batch(b1, 0, sched_dir, cur_dir, default_delay_s=2.0)
    s1 = {r["url"]: r for r in
          spark.read.parquet(sched_dir).collect()}
    assert s1["https://a.com/1"]["fetch_offset_s"] == 0.0
    assert s1["https://a.com/2"]["fetch_offset_s"] == 2.0
    cur = {r["host"]: r["next_offset_s"] for r in
           spark.read.parquet(cur_dir)
           .filter(F.col("upto_batch") == 0).collect()}
    # a.com last slot 2.0 + delay 2.0 = 4.0; b.com 0.0 + 2.0 = 2.0
    assert cur == {"a.com": 4.0, "b.com": 2.0}

    b2 = spark.createDataFrame(
        [("https://a.com/3",), ("https://c.com/1",)], "url string")
    frontier_schedule_batch(b2, 1, sched_dir, cur_dir, default_delay_s=2.0)
    s2 = {r["url"]: r for r in
          spark.read.parquet(sched_dir)
          .filter(F.col("ingest_batch") == 1).collect()}
    assert s2["https://a.com/3"]["fetch_offset_s"] == 4.0  # continues
    assert s2["https://c.com/1"]["fetch_offset_s"] == 0.0  # new host
    cur2 = {r["host"]: r["next_offset_s"] for r in
            spark.read.parquet(cur_dir)
            .filter(F.col("upto_batch") == 1).collect()}
    assert cur2 == {"a.com": 6.0, "b.com": 2.0, "c.com": 2.0}

    # replay batch 1: identical schedule rows + identical cursor
    frontier_schedule_batch(b2, 1, sched_dir, cur_dir, default_delay_s=2.0)
    s2r = {r["url"]: r["fetch_offset_s"] for r in
           spark.read.parquet(sched_dir)
           .filter(F.col("ingest_batch") == 1).collect()}
    assert s2r == {u: r["fetch_offset_s"] for u, r in s2.items()}
    cur2r = {r["host"]: r["next_offset_s"] for r in
             spark.read.parquet(cur_dir)
             .filter(F.col("upto_batch") == 1).collect()}
    assert cur2r == cur2


def test_stream_frontier_schedule_end_to_end(spark, tmp_path):
    """The streaming wrapper drains a file source through the cursor
    loop (availableNow), producing batch-partitioned schedules."""
    from thewhisperdb_spark.streaming.jobs import stream_frontier_schedule

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [("https://x.com/a",), ("https://x.com/b",)],
        "url string").write.json(src)
    q = stream_frontier_schedule(
        spark.readStream.schema("url string").json(src),
        str(tmp_path / "out"), str(tmp_path / "cur"),
        str(tmp_path / "ckpt"), default_delay_s=0.5)
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    offs = sorted(r["fetch_offset_s"] for r in out.collect())
    assert offs == [0.0, 0.5]
