import pytest
import math

from pyspark.sql import functions as F

from thewhisperdb_spark.operators import tags as TG
from thewhisperdb_spark.operators import vectors as V


def test_nodes_by_tag(nodes_df):
    assert sorted(r["id"] for r in TG.nodes_by_tag(nodes_df, "spark").collect()) \
        == [1, 2, 6]


def test_shared_tag_partners_excludes_self(nodes_df):
    got = sorted(r["id"] for r in TG.shared_tag_partners(nodes_df, 1).collect())
    assert got == [2, 3, 6]  # share 'spark' or 'intro'; node 4 (no tags) excluded


def test_jaccard_pairs_exact(nodes_df):
    rows = {(r["a"], r["b"]): r["jaccard"]
            for r in TG.jaccard_pairs(nodes_df).collect()}
    # nodes 1 {spark,intro} vs 6 {spark,intro,dup}: inter=2, union=3
    assert math.isclose(rows[(1, 6)], 2 / 3)
    # nodes 1 vs 2 {spark,advanced}: inter=1, union=3
    assert math.isclose(rows[(1, 2)], 1 / 3)
    # empty-tag node 4 appears in no pair (src/core/GraphDB.cpp:583-585)
    assert not any(4 in p for p in rows)


def test_jaccard_partners_threshold(nodes_df):
    got = {r["id"]: r["jaccard"] for r in
           TG.jaccard_partners(nodes_df, 1, threshold=0.5).collect()}
    assert set(got) == {6}


def test_cosine_edge_rules(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]),
         ([1.0, 0.0], [0.0, 0.0]), ([1.0, 0.0], [1.0, 0.0, 0.0])],
        "a array<double>, b array<double>")
    got = [r["c"] for r in df.select(V.cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert got[0] == 1.0
    assert got[1] == 0.0
    assert got[2] == 0.0  # zero-norm -> 0 (src/embedding/Clustering.cpp:22-24)
    assert got[3] == 0.0  # dim mismatch -> 0


def test_similar_pairs_and_topk(nodes_df):
    emb = nodes_df.filter(F.col("embedding").isNotNull()).select(
        F.col("id").alias("vec_id"), "embedding")
    pairs = {(r["a"], r["b"]): r["similarity"]
             for r in V.similar_pairs(emb, 0.95).collect()}
    assert (1, 6) in pairs and math.isclose(pairs[(1, 6)], 1.0)
    assert (1, 2) in pairs  # cos ≈ 0.9939
    assert not any(5 in p for p in pairs)  # zero vector similar to nothing

    top = V.topk_similar(emb, 1, k=2).collect()
    assert [r["vec_id"] for r in top] == [6, 2]


def test_ann_lsh_recall_on_exact_neighbors(spark):
    import random

    random.seed(7)
    base = [[random.gauss(0, 1) for _ in range(16)] for _ in range(30)]
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v))
        # planted near-duplicate partner
        rows.append((100 + i, [x + random.gauss(0, 0.01) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {(r["a"], r["b"]) for r in V.similar_pairs(emb, 0.99).collect()}
    approx = {(r["a"], r["b"]) for r in
              V.ann_lsh_pairs(emb, 0.99, dim=16, n_planes=6, n_tables=6).collect()}
    assert approx <= exact  # re-check guarantees no false positives
    assert len(approx) >= 0.8 * len(exact)  # high recall on near-identical pairs


def test_ivf_knn_recall(spark):
    # 40 deterministic 8-dim vectors; IVF probing half the cells must recover
    # most of brute-force top-3 (structural recall check, not exactness)
    import random
    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in V.brute_force_knn_join(queries, df, k=3).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in V.ivf_knn_join(queries, df, k=3, n_cells=4, n_probe=2).collect()}
    # every query answered with k rows
    assert len(approx) == 15
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_pq_knn_recall_with_rerank(spark):
    # PQ codes only have to get the candidate NEIGHBORHOOD right — the exact
    # cosine re-rank fixes the order — so recall of brute-force top-3 should
    # be high even with coarse 16-centroid codebooks
    import random
    rnd = random.Random(11)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in V.brute_force_knn_join(queries, df, k=3).collect()}
    approx_rows = V.pq_knn_join(queries, df, k=3, m=4, n_centroids=16,
                                rerank=20).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    assert len(approx) == 15               # k rows per query
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"PQ recall too low: {recall}"
    # re-ranked similarity is the EXACT cosine: for pairs in both sets the
    # reported value must match brute force to float tolerance
    bf = {(r["query_id"], r["neighbor_id"]): r["similarity"]
          for r in V.brute_force_knn_join(queries, df, k=3).collect()}
    for r in approx_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in bf:
            assert abs(r["similarity"] - bf[key]) < 1e-9


def test_pq_encode_shapes_and_determinism(spark):
    rows = [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = V.pq_train(df, m=4, n_centroids=8, sample_size=30)
    assert cb.shape == (4, 8, 2)
    codes = {r["id"]: list(r["codes"]) for r in V.pq_encode(df, cb).collect()}
    assert len(codes) == 30
    assert all(len(c) == 4 for c in codes.values())
    assert all(0 <= x < 8 for c in codes.values() for x in c)
    # deterministic: retrain + re-encode yields identical codes
    cb2 = V.pq_train(df, m=4, n_centroids=8, sample_size=30)
    codes2 = {r["id"]: list(r["codes"]) for r in V.pq_encode(df, cb2).collect()}
    assert codes == codes2


def test_ivf_assign_covers_all_rows(spark):
    rows = [(i, [float(i % 5), float(i % 3)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, centroids = V.ivf_assign(df, n_cells=5)
    assert assigned.count() == 30  # every vector lands in exactly one cell
    assert centroids.count() == 5
    assert assigned.select("cell").distinct().count() <= 5


def test_kmeans_recovers_blobs_and_is_deterministic(spark):
    from thewhisperdb_spark.operators.vectors import kmeans_assign

    # three tight, well-separated blobs on the unit sphere
    import random

    rnd = random.Random(7)
    centers = [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)]
    rows = []
    for i in range(90):
        cx, cy, cz = centers[i % 3]
        rows.append((i, [cx + rnd.uniform(-0.05, 0.05),
                         cy + rnd.uniform(-0.05, 0.05),
                         cz + rnd.uniform(-0.05, 0.05)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    lab = kmeans_assign(df, k=3, max_iter=5)
    got = {r.vec_id: r.cluster for r in lab.collect()}
    # every blob lands in exactly one cluster, and the three are distinct
    blob_clusters = [{got[i] for i in range(90) if i % 3 == b} for b in range(3)]
    assert all(len(s) == 1 for s in blob_clusters)
    assert len(set().union(*blob_clusters)) == 3
    # deterministic end-to-end (init, iteration order, tiebreaks)
    lab2 = kmeans_assign(df, k=3, max_iter=5)
    assert got == {r.vec_id: r.cluster for r in lab2.collect()}


def test_ivf_index_persist_probe_matches_online(spark, tmp_path):
    """Persisted IVF index returns the same neighbors as the online
    ivf_knn_join (same centroids), and the probed scan partition-prunes."""
    from thewhisperdb_spark.catalog import load_table
    from thewhisperdb_spark.operators import vectors as V

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.limit(10)
    path = str(tmp_path / "ivf")
    V.ivf_index_build(emb, path, n_cells=8)
    got = V.ivf_index_probe(spark, path, q, k=5, n_probe=2)
    # same centroids as the build (deterministic ivf_assign default), so the
    # online join must agree row-for-row
    want = V.ivf_knn_join(q, emb, k=5, n_cells=8, n_probe=2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # static partition pruning: the lists scan carries a PartitionFilters
    # entry restricting `cell`
    plan = (spark.read.parquet(f"{path}/lists")
            .filter(F.col("cell").isin([1, 2]))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan and "cell" in plan


def test_ivf_index_format_version_guard(spark, tmp_path):
    """Probe/append refuse an index without a format marker (pre-v2 build)
    or with a mismatched version, instead of silently mis-assigning cells
    across hash-scheme generations (CHANGELOG round 4)."""
    import shutil

    import pytest

    from thewhisperdb_spark.catalog import load_table
    from thewhisperdb_spark.operators import vectors as V

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.limit(2)
    path = str(tmp_path / "ivf_ver")
    V.ivf_index_build(emb.limit(100), path, n_cells=4)
    meta = spark.read.parquet(f"{path}/meta").collect()
    assert meta[0]["format_version"] == V.INDEX_FORMAT_VERSION
    # versioned index probes fine
    assert V.ivf_index_probe(spark, path, q, k=2, n_probe=2).count() > 0
    # stale version -> loud failure
    (spark.createDataFrame([(1, "xxhash64-v1")],
                           "format_version int, hash_scheme string")
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta"))
    with pytest.raises(ValueError, match="format v1"):
        V.ivf_index_probe(spark, path, q, k=2, n_probe=2)
    # interrupted build (-1 sentinel: build died between invalidate and
    # final stamp) -> loud failure, distinct message
    (spark.createDataFrame([(-1, "md5-min-v2")],
                           "format_version int, hash_scheme string")
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta"))
    with pytest.raises(ValueError, match="in-progress/interrupted"):
        V.ivf_index_probe(spark, path, q, k=2, n_probe=2)
    # missing marker (pre-versioning index) -> loud failure on append too
    shutil.rmtree(f"{path}/meta")
    with pytest.raises(ValueError, match="no meta"):
        V.ivf_index_append(spark, path, emb.limit(5))


def test_ivf_index_append_matches_full_build(spark, tmp_path):
    """Appending a delta to a persisted index == building the index over the
    full corpus with the SAME centroids (assignment is centroid-determined,
    so the split point can't matter)."""
    from thewhisperdb_spark.catalog import load_table
    from thewhisperdb_spark.operators import vectors as V

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    first = emb.filter(F.col("vec_id") < 300)
    delta = emb.filter(F.col("vec_id") >= 300)
    q = emb.limit(8)

    inc_path = str(tmp_path / "ivf_inc")
    V.ivf_index_build(first, inc_path, n_cells=8)
    V.ivf_index_append(spark, inc_path, delta)

    cents = spark.read.parquet(f"{inc_path}/centroids")
    full_path = str(tmp_path / "ivf_full")
    V.ivf_index_build(emb, full_path, n_cells=8, centroids=cents)

    got = V.ivf_index_probe(spark, inc_path, q, k=5, n_probe=2)
    want = V.ivf_index_probe(spark, full_path, q, k=5, n_probe=2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stream_append_to_ivf(spark, tmp_path):
    """Vectors arriving as a stream land in the same inverted lists as a
    batch append."""
    from thewhisperdb_spark.catalog import load_table
    from thewhisperdb_spark.operators import vectors as V
    from thewhisperdb_spark.streaming import jobs as SJ

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    first = emb.filter(F.col("vec_id") < 300)
    delta = emb.filter(F.col("vec_id") >= 300)
    path = str(tmp_path / "ivf_s")
    V.ivf_index_build(first, path, n_cells=8)

    stream_src = str(tmp_path / "src")
    delta.repartition(2).write.parquet(stream_src)
    stream = (spark.readStream.schema(delta.schema)
              .option("maxFilesPerTrigger", 1).parquet(stream_src))
    q_ = SJ.stream_append_to_ivf(stream, path, str(tmp_path / "ckpt"))
    q_.awaitTermination()

    lists = spark.read.parquet(f"{path}/lists")
    assert lists.count() == emb.count()
    assert lists.select("vec_id").distinct().count() == emb.count()


def test_ivf_index_probe_recall_on_testdata(spark, tmp_path):
    """Pin the IVF quality claim numerically on the real embeddings table:
    recall@10 of the persisted-index probe vs brute force, and that recall is
    monotone-ish in n_probe (probing every cell = exhaustive = recall 1)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.limit(10)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in V.brute_force_knn_join(q, emb, k=10).collect()}
    path = str(tmp_path / "ivf_recall")
    V.ivf_index_build(emb, path, n_cells=8)
    recalls = {}
    for n_probe in (2, 8):
        got = {(r["query_id"], r["neighbor_id"])
               for r in V.ivf_index_probe(spark, path, q, k=10,
                                          n_probe=n_probe).collect()}
        recalls[n_probe] = len(exact & got) / len(exact)
    # probing all 8 cells is exhaustive search -> exact recall
    assert recalls[8] == 1.0, f"full probe must be exact: {recalls}"
    # the testdata embeddings are near-uniform (unclustered), the worst case
    # for IVF: a 2/8 probe must still beat the n_probe/n_cells = 0.25 chance
    # level (measured ~0.39 — locality of the centroid cells)
    assert recalls[2] >= 0.3, f"IVF probe recall@10 at chance level: {recalls}"
    assert recalls[2] <= recalls[8]


def test_kmeans_update_plan_is_dim_independent(spark):
    """The Lloyd's update must plan a constant-size aggregate whatever the
    embedding dim (VERDICT r5: the per-component unrolled form generated
    dim avg expressions — a 1024-column codegen blob at real dims). At
    dim=300 the plan carries one sum/sum mean over posexploded BLAS
    partials, and the fit itself still recovers structure end-to-end."""
    from thewhisperdb_spark.operators.vectors import (
        _kmeans_centroid_update, kmeans_fit, with_unit_vector)

    dim = 300
    # 3 orthogonal band blobs: blob b = mass in dims [100b, 100b+100)
    # plus small hash noise — cleanly separable under cosine
    base = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.when(F.floor(i / 100) == F.col("id") % 3,
                             F.lit(1.0)).otherwise(0.0)
            + F.pmod(F.xxhash64(F.col("id"), i), F.lit(100))
            .cast("double") / 1000.0).alias("embedding"))
    emb_u = (with_unit_vector(base, "embedding", "_u")
             .select(F.col("vec_id").alias("_id"), "_u"))
    lits = [(0, [1.0] + [0.0] * (dim - 1)), (1, [0.0, 1.0] + [0.0] * (dim - 2))]
    plan = (_kmeans_centroid_update(emb_u, lits)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("sum(") <= 8, plan          # partial+final, not dim×
    assert "Generate" in plan                      # the posexplode
    # r7 placement pins: assignment+accumulation is ONE Arrow BLAS stage
    # (MapInPandas, k rows per batch), computed BELOW the Generate (tree
    # prints parent-first, so its offset is after Generate's) — the
    # Python stage must run once per input batch, never per exploded
    # element (the co-selected HOF-argmax form re-evaluated the
    # assignment dim× — a 7.8s pass became a 100-minute step at dim 768);
    # and no row-at-a-time Python anywhere
    assert "MapInPandas" in plan, plan
    assert plan.index("MapInPandas") > plan.index("Generate"), plan
    assert "BatchEvalPython" not in plan, plan
    # end-to-end at high dim: 3 planted blobs recovered, full-length cvecs
    cents = kmeans_fit(base, k=3, max_iter=4).collect()
    assert len(cents) == 3
    assert all(len(r["cvec"]) == dim for r in cents)


@pytest.mark.slow  # index-lifecycle marathon: CI-tier
def test_ivf_index_rebalance_fixes_append_drift(spark, tmp_path):
    """Appends assigned to stale centroids pile a shifted corpus into hot
    cells; rebalance (warm-started Lloyd refinement + sentinel-bracketed
    rewrite) must rebalance the lists WITHOUT losing a single id, keep the
    version gate green, and keep exhaustive probe results exact."""
    from thewhisperdb_spark.operators import vectors as V

    dim = 16

    def blob(start, n, axis):
        # n vectors tightly around basis direction `axis`
        return spark.range(start, start + n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.when(i == axis, F.lit(1.0)).otherwise(
                    F.pmod(F.xxhash64(F.col("id"), i), F.lit(50))
                    .cast("double") / 1000.0)).alias("embedding"))

    a = blob(0, 200, 0)
    path = str(tmp_path / "ivf_rb")
    V.ivf_index_build(a, path, n_cells=4)
    # a far-away blob appended against blob-A centroids: hot-cell skew
    b = blob(1000, 200, 8)
    V.ivf_index_append(spark, path, b)

    def cell_sizes():
        return {r["cell"]: r["n"] for r in
                spark.read.parquet(f"{path}/lists")
                .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()}

    def ids():
        return {r["vec_id"] for r in
                spark.read.parquet(f"{path}/lists").select("vec_id").collect()}

    before_sizes, before_ids = cell_sizes(), ids()
    assert max(before_sizes.values()) >= 200      # blob B piled together
    V.ivf_index_rebalance(spark, path, max_iter=3)
    after_sizes, after_ids = cell_sizes(), ids()
    assert after_ids == before_ids                # no id lost or invented
    assert max(after_sizes.values()) < max(before_sizes.values())
    # refreshed centroids separate the blobs: exhaustive probe stays exact
    q = blob(0, 5, 0).unionByName(blob(1000, 5, 8))
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in V.ivf_index_probe(spark, path, q, k=3,
                                      n_probe=4).collect()}
    want = {(r["query_id"], r["rank"]): r["neighbor_id"]
            for r in V.brute_force_knn_join(
                q, a.unionByName(b), k=3).collect()}
    assert got == want
    # gate still green (sentinel re-stamped by the rewrite)
    V.ivf_index_probe(spark, path, q, k=1, n_probe=1).collect()


def test_ivf_index_stats_tracks_drift_and_rebalance(spark, tmp_path):
    """Stats expose the rebalance trigger: skew jumps after a drifted
    append and falls back after rebalance; counts stay conserved."""
    from thewhisperdb_spark.operators import vectors as V

    dim = 16

    def blob(start, n, axis):
        return spark.range(start, start + n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.when(i == axis, F.lit(1.0)).otherwise(
                    F.pmod(F.xxhash64(F.col("id"), i), F.lit(50))
                    .cast("double") / 1000.0)).alias("embedding"))

    path = str(tmp_path / "ivf_st")
    V.ivf_index_build(blob(0, 200, 0), path, n_cells=4)
    V.ivf_index_append(spark, path, blob(1000, 200, 8))
    before = V.ivf_index_stats(spark, path).collect()[0]
    assert before["n_vectors"] == 400 and before["n_cells"] == 4
    V.ivf_index_rebalance(spark, path, max_iter=3)
    after = V.ivf_index_stats(spark, path).collect()[0]
    assert after["n_vectors"] == 400
    assert after["skew"] < before["skew"]
    assert after["max_cell"] < before["max_cell"]


def test_ivf_index_delete_takedown(spark, tmp_path):
    """Takedown on the IVF index: deleted vectors vanish from probes and
    stats, survivors and centroids untouched, replay idempotent."""
    from thewhisperdb_spark.operators import vectors as V

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding")
    path = str(tmp_path / "ivf_del")
    V.ivf_index_build(emb, path, n_cells=4)
    q = emb.limit(5)
    kill = spark.createDataFrame([(r["neighbor_id"],) for r in
                                  V.ivf_index_probe(spark, path, q, k=1,
                                                    n_probe=4).collect()],
                                 "vec_id long")
    n_kill = kill.distinct().count()
    V.ivf_index_delete(spark, path, kill)
    killed = {r["vec_id"] for r in kill.collect()}
    got = {r["neighbor_id"] for r in
           V.ivf_index_probe(spark, path, q, k=3, n_probe=4).collect()}
    assert not (got & killed)
    st = V.ivf_index_stats(spark, path).collect()[0]
    assert st["n_vectors"] == emb.count() - n_kill
    V.ivf_index_delete(spark, path, kill)       # replay: no-op
    assert V.ivf_index_stats(spark, path).collect()[0]["n_vectors"] \
        == emb.count() - n_kill


def test_ivf_index_append_replay_is_noop(spark, tmp_path):
    """Retrying an IVF append (the normal failure mode for batch jobs)
    must leave the index identical: list counts and probe output
    unchanged, meta stamped valid; a partial replay lands only the new
    ids."""
    from thewhisperdb_spark.operators import vectors as V

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding")
    path = str(tmp_path / "ivf_replay")
    V.ivf_index_build(emb.filter(F.col("vec_id") < 300), path, n_cells=4)
    delta = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 350))
    V.ivf_index_append(spark, path, delta)

    def state():
        q = emb.limit(5)
        probe = sorted((r["query_id"], r["neighbor_id"], r["rank"]) for r in
                       V.ivf_index_probe(spark, path, q, k=3,
                                         n_probe=4).collect())
        return spark.read.parquet(f"{path}/lists").count(), probe

    before = state()
    V.ivf_index_append(spark, path, delta)        # exact replay
    assert state() == before
    # partial replay: 20 already-indexed + 20 new -> exactly 20 land
    mixed = emb.filter((F.col("vec_id") >= 330) & (F.col("vec_id") < 370))
    V.ivf_index_append(spark, path, mixed)
    assert spark.read.parquet(f"{path}/lists").count() == before[0] + 20
    assert spark.read.parquet(f"{path}/lists") \
        .select("vec_id").distinct().count() == before[0] + 20
    ver = spark.read.parquet(f"{path}/meta").collect()[0]["format_version"]
    assert ver == V.INDEX_FORMAT_VERSION


def test_ivf_index_append_type_gate(spark, tmp_path):
    """Appending a batch whose vector type differs from the at-rest lists
    must fail LOUDLY (mixed-type parquet poisons every later read with an
    opaque decode error)."""
    import pytest

    from thewhisperdb_spark.operators import vectors as V

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding")
    path = str(tmp_path / "ivf_tg")
    V.ivf_index_build(emb.filter(F.col("vec_id") < 100), path, n_cells=4)
    drifted = spark.createDataFrame(
        [(9000, [1.0, 0.0])], "vec_id long, embedding array<double>")
    at_rest = emb.schema["embedding"].dataType.simpleString()
    if at_rest != "array<double>":
        with pytest.raises(ValueError, match="would corrupt the index"):
            V.ivf_index_append(spark, path, drifted)
    # correctly-typed append still works
    ok = drifted.select("vec_id",
                        F.col("embedding").cast(at_rest).alias("embedding"))
    V.ivf_index_append(spark, path, ok)
    assert spark.read.parquet(f"{path}/lists").count() == 101


def test_ivf_index_delete_all_then_append_reseeds(spark, tmp_path):
    """A takedown that empties the index entirely must leave it usable:
    probe returns empty, and the next append re-seeds the lists."""
    from thewhisperdb_spark.operators import vectors as V

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding")
    part = emb.filter(F.col("vec_id") < 50)
    path = str(tmp_path / "ivf_all")
    V.ivf_index_build(part, path, n_cells=4)
    V.ivf_index_delete(spark, path, part.select("vec_id"))
    q = emb.limit(3)
    assert V.ivf_index_probe(spark, path, q, k=3, n_probe=4).count() == 0
    assert V.ivf_index_stats(spark, path).collect()[0]["n_vectors"] == 0
    V.ivf_index_append(spark, path,
                       emb.filter(F.col("vec_id") < 20))
    assert spark.read.parquet(f"{path}/lists").count() == 20
    got = V.ivf_index_probe(spark, path, q, k=3, n_probe=4)
    assert got.count() > 0


def test_ivf_index_single_writer_claim_and_delete_type_gate(spark, tmp_path):
    """IVF twin of the LSH single-writer test, plus the delete id-type
    gate: a claimed sentinel rejects a racing append/delete up front, and
    a delete set whose id type differs from the at-rest lists raises
    instead of silently anti-join-matching nothing."""
    import pytest

    from thewhisperdb_spark.operators.indexmeta import (
        ClaimLostError, claim_sentinel, release_claim, verify_claim)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding")
    path = str(tmp_path / "ivf_claim")
    V.ivf_index_build(emb.filter(F.col("vec_id") < 300), path, n_cells=4)
    wm = V._ivf_meta_writer(spark, path)
    delta = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 320))
    wm(-1)
    with pytest.raises(ValueError, match="in-progress"):
        V.ivf_index_append(spark, path, delta)
    with pytest.raises(ValueError, match="in-progress"):
        V.ivf_index_delete(
            spark, path,
            spark.createDataFrame([(1,)], "vec_id long"))
    wm(V.INDEX_FORMAT_VERSION)
    V.ivf_index_append(spark, path, delta)        # bracket closed: works
    # claim race (v3, newest wins): the older claimant loses its verify
    # without touching data, and the sentinel stays valid throughout
    a = claim_sentinel(spark, f"{path}/meta")
    b = claim_sentinel(spark, f"{path}/meta")
    with pytest.raises(ClaimLostError, match="another writer"):
        verify_claim(spark, f"{path}/meta", a)
    # the losing claim kept the version valid: probes serve mid-claim
    assert V.ivf_index_probe(spark, path, delta, k=3, n_probe=4).count() > 0
    release_claim(spark, f"{path}/meta", b)
    # delete id-type gate: string ids vs long at-rest lists must refuse
    with pytest.raises(ValueError, match="silently match nothing"):
        V.ivf_index_delete(
            spark, path, spark.createDataFrame([("300",)], "vec_id string"))
    # a correctly-typed delete still works after all of the above
    V.ivf_index_delete(spark, path,
                       spark.createDataFrame([(300,)], "vec_id long"))
    got = {r["neighbor_id"] for r in
           V.ivf_index_probe(spark, path, delta, k=3, n_probe=4).collect()}
    assert 300 not in got and len(got) > 0


def test_ivf_blas_scoring_matches_exact_fold(spark, tmp_path):
    """blas=True (Arrow per-cell gram + in-cell top-k) must return the same
    (query, rank) -> neighbor table as the codegen'd per-pair fold on both
    IVF paths — only the float summation ORDER differs (last-ulp), never
    the neighbor set or tie resolution."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding")
    q = emb.limit(25)

    def table(df):
        return {(r["query_id"], r["rank"]): r["neighbor_id"]
                for r in df.collect()}

    exact = table(V.ivf_knn_join(q, emb, k=5, n_cells=8, n_probe=3))
    fast = table(V.ivf_knn_join(q, emb, k=5, n_cells=8, n_probe=3,
                                blas=True))
    assert fast == exact and len(exact) > 0

    path = str(tmp_path / "ivf_blas")
    V.ivf_index_build(emb, path, n_cells=8)
    exact_p = table(V.ivf_index_probe(spark, path, q, k=5, n_probe=3))
    fast_p = table(V.ivf_index_probe(spark, path, q, k=5, n_probe=3,
                                     blas=True))
    assert fast_p == exact_p and len(exact_p) > 0
    # the blas path must stream the corpus through ONE Arrow stage (the
    # broadcast-probe mapInPandas) — no corpus shuffle before it, and no
    # row-at-a-time Python anywhere
    plan = (V.ivf_index_probe(spark, path, q, k=5, n_probe=3, blas=True)
            ._jdf.queryExecution().executedPlan().toString())
    assert "MapInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # the only Exchange below the final window is the |Q|*k local-top-k
    # rows; the vector scan feeds MapInPandas directly
    scan_to_map = plan[plan.index("MapInPandas"):]
    assert "Exchange" not in scan_to_map, plan


def test_ivf_probe_schema_stable_cold_vs_warm(spark, tmp_path):
    """Code-review r8: the probe's neighbor_id type must not flip between
    the EMPTY and populated states of the same index when query and
    corpus id types differ — build records the corpus id type in meta, so
    the cold-start empty frame carries it."""
    emb = spark.createDataFrame(
        [(i, [1.0, float(i % 3)]) for i in range(20)],
        "vec_id long, embedding array<float>")
    path = str(tmp_path / "cold_ivf")
    V.ivf_index_build(emb.limit(0), path, n_cells=2)   # empty build
    q = spark.createDataFrame([(7, [1.0, 0.0])],
                              "vec_id int, embedding array<float>")
    cold = V.ivf_index_probe(spark, path, q, k=3, n_probe=2)
    assert cold.count() == 0
    assert cold.schema["neighbor_id"].dataType.simpleString() == "bigint"
    V.ivf_index_build(emb, path, n_cells=2)            # now populated
    warm = V.ivf_index_probe(spark, path, q, k=3, n_probe=2)
    assert warm.schema["neighbor_id"].dataType.simpleString() == "bigint"
    assert warm.count() == 3


def test_ivf_rebalance_claims_before_reading(spark, tmp_path):
    """Code-review r8: rebalance must CLAIM before its corpus
    read/checkpoint (the longest delta window of any mutation) — pinned
    structurally: a foreign in-progress -1 sentinel refuses the rebalance
    up front, and after a successful rebalance the sentinel is stamped
    valid with no leftover claim file."""
    import pytest

    from thewhisperdb_spark.operators.indexmeta import _list_claims

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding").filter(F.col("vec_id") < 100)
    path = str(tmp_path / "reb_ivf")
    V.ivf_index_build(emb, path, n_cells=4)
    wm = V._ivf_meta_writer(spark, path)
    wm(-1)
    with pytest.raises(ValueError, match="in-progress"):
        V.ivf_index_rebalance(spark, path, max_iter=1)
    wm(V.INDEX_FORMAT_VERSION)
    V.ivf_index_rebalance(spark, path, max_iter=1)
    row = spark.read.parquet(f"{path}/meta").collect()[0]
    assert row["format_version"] == V.INDEX_FORMAT_VERSION
    assert _list_claims(spark, f"{path}/meta") == []
    assert spark.read.parquet(f"{path}/lists").count() == 100


def test_ivf_blas_tie_break_on_duplicate_vectors(spark, tmp_path):
    """ADVICE r7 (medium): exact-duplicate vectors — the core dedup
    workload — are ALL ties at the k boundary. The blas kernel's local
    truncation must apply the full (sim desc, neighbor_id asc) rule
    before dropping candidates, or the surviving neighbor set depends on
    Arrow batch splits. 40 identical vectors, k=5: both paths must return
    neighbors {0..4} (ids 0-4, the smallest non-self ids... for query 0
    the self-match is excluded so {1..5})."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(40)]
    emb = (spark.createDataFrame(rows, "vec_id long, embedding array<float>")
           .repartition(8))  # force multiple Arrow batches
    q = emb.filter(F.col("vec_id").isin([0, 7]))
    path = str(tmp_path / "dup_ivf")
    V.ivf_index_build(emb, path, n_cells=2)
    for blas in (False, True):
        got = V.ivf_index_probe(spark, path, q, k=5, n_probe=2, blas=blas)
        by_q = {}
        for r in got.collect():
            by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        assert by_q[0] == {1, 2, 3, 4, 5}, (blas, by_q)
        assert by_q[7] == {0, 1, 2, 3, 4}, (blas, by_q)
    # and the online join path agrees
    got = V.ivf_knn_join(q, emb, k=5, n_cells=2, n_probe=2, blas=True)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert by_q[0] == {1, 2, 3, 4, 5} and by_q[7] == {0, 1, 2, 3, 4}
    # brute force (same argpartition pattern, same fix) agrees too
    got = V.brute_force_knn_join(q, emb, k=5)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert by_q[0] == {1, 2, 3, 4, 5} and by_q[7] == {0, 1, 2, 3, 4}


def test_ivf_blas_neighbor_id_keeps_corpus_type(spark, tmp_path):
    """ADVICE r7 (low): blas=True must return neighbor_id in the CORPUS id
    type (the exact fold path's behavior), not coerced to the query id
    type — probing a long-id index with int query ids must not change
    the neighbor column's type between blas modes."""
    rows = [(i, [float(i % 3 == 0), 1.0, float(i % 2)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "typed_ivf")
    V.ivf_index_build(emb, path, n_cells=2)
    q = spark.createDataFrame([(1001, [1.0, 0.0, 0.0])],
                              "vec_id int, embedding array<float>")
    slow = V.ivf_index_probe(spark, path, q, k=3, n_probe=2, blas=False)
    fast = V.ivf_index_probe(spark, path, q, k=3, n_probe=2, blas=True)
    assert slow.schema["neighbor_id"].dataType.simpleString() == "bigint"
    assert fast.schema["neighbor_id"].dataType.simpleString() == "bigint"
    t = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in slow.collect()}
    f = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in fast.collect()}
    assert t == f and len(t) == 3
