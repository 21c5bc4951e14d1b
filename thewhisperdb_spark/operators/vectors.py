"""Embedding / vector operators: cosine similarity, threshold self-join,
top-k nearest neighbors, and scale-path approximate variants
(SURVEY §2.3 J5-J7, §2.11 similarity search).

The reference computes cosine in a hand loop and joins by O(n²) nested loops
(``src/embedding/Clustering.cpp:7-53``; k-NN ``src/main.cpp:518-577``).
Spark-first shape: cosine as a codegen'd higher-order-function expression over
double arrays (no Python), pre-normalized vectors so the join predicate is a
plain dot product, and top-k via TakeOrderedAndProject. The exact pair join is
a block cross-join — correct at oracle scale; the 100 TB path is the LSH
bucketing in ``ann_lsh_*`` which turns the cross product into an equi-join on
bucket ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from thewhisperdb_spark.operators.indexmeta import (
    claim_sentinel, confirm_claim, release_claim, verify_claim,
    write_meta_row)


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a left-fold — deterministic order, double precision."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """J5 cosine with the reference's edge rules: 0.0 on dimension mismatch or
    zero norm (``src/embedding/Clustering.cpp:7-27``).

    The three folds (dot, both norms) are bound once through a single-element
    ``transform`` lambda: referencing a fold expression twice in the output
    expression would re-evaluate it after projection collapse."""
    a = a.cast("array<double>")
    b = b.cast("array<double>")

    def _cos(s: Column) -> Column:
        return (
            F.when((F.size(a) != F.size(b)) | (s["na"] == 0.0) | (s["nb"] == 0.0),
                   F.lit(0.0))
            .otherwise(s["d"] / (s["na"] * s["nb"]))
        )

    parts = F.struct(dot(a, b).alias("d"), norm(a).alias("na"), norm(b).alias("nb"))
    return F.element_at(F.transform(F.array(parts), _cos), 1)


def with_unit_vector(df: DataFrame, vec_col: str = "embedding",
                     out_col: str = "unit") -> DataFrame:
    """Pre-normalize once so every downstream pair computation is a single dot
    product — at n² pair scale this halves the flops and lets the norm be
    computed in the scan stage instead of inside the join."""
    v = F.col(vec_col).cast("array<double>")

    # bind the norm once via a lambda variable: referencing the norm fold
    # inside the per-element division would re-evaluate it |v| times per row
    def _unit(n: Column) -> Column:
        return F.when(n == 0.0, v).otherwise(F.transform(v, lambda x: x / n))

    unit = F.element_at(F.transform(F.array(norm(v)), _unit), 1)
    return df.withColumn(out_col, unit)


_BLOCK_ROW_BYTES = 528   # planning estimate: 64-dim double vector + id


def _block_count(embeddings: DataFrame, block_rows: int) -> int:
    """Block-count decision WITHOUT a planning-time count() job
    (optimization r13, VERDICT r12 #5): the block count only sets task
    granularity — every unordered pair lands in exactly one block pair
    for ANY n_blocks, so the result set is block-count-independent. Use
    Catalyst's plan statistics (file size for parquet scans — no Spark
    job) and a bytes-per-row estimate; fall back to the exact count()
    only when the estimate is unusable (unknown stats surface as
    Long.MaxValue-ish placeholders, e.g. over localCheckpoint inputs,
    where a garbage 64-block fan-out of a tiny frame would dominate
    runtime)."""
    try:
        size = int(embeddings._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
    except Exception:
        size = None
    if size is not None and 0 < size < (1 << 44):  # sane estimate only
        est_rows = max(1, size // _BLOCK_ROW_BYTES)
    else:
        est_rows = embeddings.count()
    return max(1, min(64, (est_rows + block_rows - 1) // block_rows))


def similar_pairs(embeddings: DataFrame, threshold: float,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  block_rows: int = 2048) -> DataFrame:
    """J6 ``findSimilarPairs``: unordered pairs (a < b) with cosine >= θ
    (``src/embedding/Clustering.cpp:29-53``). Exact O(n²) — executed as a
    **blocked gram-matrix product**: rows are hash-bucketed into √-scale
    blocks, each unordered block pair becomes one task whose pairwise
    similarities are a single BLAS matmul over the Arrow batch (numpy),
    thresholded before anything is emitted.

    This is the dense-linear-algebra case where a vectorized Pandas path
    beats per-pair codegen'd folds by ~10×: the all-pairs dot products are
    one n_a×d @ d×n_b multiply per block pair instead of 25M interpreted
    array folds. Replication factor is #blocks (each row joins every other
    block once) — the standard distributed outer-product layout; at larger n
    swap in ``ann_lsh_pairs``/``ivf_knn_join`` to prune candidates instead.

    Returns (a, b, similarity).
    """
    import pandas as pd

    n_blocks = _block_count(embeddings, block_rows)
    base = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    blk = F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)).cast("int")
    rows = base.withColumn("blk", blk)
    # A-side of pair (i, j>=i): block i; B-side: block j>i (diagonal pairs
    # compute their own triangle from the A rows alone). Both sides are
    # emitted from ONE explode over the input (optimization r12): the
    # previous a_side.unionByName(b_side) referenced ``rows`` twice, so
    # the upstream scan executed once per branch (and when a caller
    # passes a derived frame, its whole pipeline ran twice).
    a_tgts = F.transform(
        F.sequence(F.col("blk"), F.lit(n_blocks - 1)),
        lambda j: F.struct(F.col("blk").alias("bi"),
                           j.cast("int").alias("bj"),
                           F.lit(0).alias("side")))
    # blk=0 rows have no B-side targets; sequence() under ANSI refuses
    # an empty 0..-1 range, so pad to 0..max(blk-1, 0) and filter the
    # padding back out (bi < blk keeps exactly the real targets)
    b_tgts = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.col("blk") - 1, F.lit(0))),
            lambda i: F.struct(i.cast("int").alias("bi"),
                               F.col("blk").alias("bj"),
                               F.lit(1).alias("side"))),
        lambda t: t["bi"] < F.col("blk"))
    grouped = (rows
               .select("id", "v",
                       F.explode(F.concat(a_tgts, b_tgts)).alias("t"))
               .select("id", "v", F.col("t.bi").alias("bi"),
                       F.col("t.bj").alias("bj"),
                       F.col("t.side").alias("side")))

    thr = float(threshold)

    def gram(key, pdf: pd.DataFrame):
        import numpy as np

        a = pdf[pdf["side"] == 0]
        b = a if key[0] == key[1] else pdf[pdf["side"] == 1]
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame({"a": [], "b": [], "similarity": []})
        diag = b is a
        # Rows are grouped by vector DIMENSION before the matmul: a corpus
        # with a truncated/NULL embedding must not crash the whole block
        # (np.array on ragged rows throws) — per the reference edge rule
        # (Clustering.cpp:7-27) cross-dimension pairs score 0.0, so they
        # can only be emitted at thr <= 0 and same-dim subgroups keep the
        # dense BLAS path.
        _empty = np.zeros(0)
        va = [_empty if x is None else np.asarray(x, dtype=np.float64)
              for x in a["v"]]
        ids_a_all = a["id"].to_numpy()
        if diag:
            vb, ids_b_all = va, ids_a_all
        else:
            vb = [_empty if x is None else np.asarray(x, dtype=np.float64)
                  for x in b["v"]]
            ids_b_all = b["id"].to_numpy()

        def by_dim(vs):
            g: dict[int, list[int]] = {}
            for i, v in enumerate(vs):
                g.setdefault(v.shape[0], []).append(i)
            return g

        ga = by_dim(va)
        gb = ga if diag else by_dim(vb)
        frames = []

        def emit(ids_a, ids_b, sims_vals):
            sims_vals = np.asarray(sims_vals)
            if diag:
                # block is its own partner: keep the upper triangle
                keep = ids_a < ids_b
            else:
                lo = np.minimum(ids_a, ids_b)
                hi = np.maximum(ids_a, ids_b)
                keep = lo < hi  # drops only (impossible) id collisions
                ids_a, ids_b = lo, hi
            frames.append(pd.DataFrame({
                "a": ids_a[keep], "b": ids_b[keep],
                "similarity": sims_vals[keep]}))

        for d, ia_idx in ga.items():
            ib_idx = gb.get(d)
            if not ib_idx:
                continue
            ma = (np.stack([va[i] for i in ia_idx])
                  if d else np.zeros((len(ia_idx), 0)))
            same = diag  # diagonal block: subgroup indices are identical
            mb = ma if same else (np.stack([vb[i] for i in ib_idx])
                                  if d else np.zeros((len(ib_idx), 0)))
            na = np.linalg.norm(ma, axis=1) if d else np.zeros(len(ia_idx))
            nb = na if same else (np.linalg.norm(mb, axis=1) if d
                                  else np.zeros(len(ib_idx)))
            na = np.where(na == 0.0, np.inf, na)  # zero-norm -> sim 0
            nb = na if same else np.where(nb == 0.0, np.inf, nb)
            sims = ((ma / na[:, None]) @ (mb / nb[:, None]).T
                    if d else np.zeros((len(ia_idx), len(ib_idx))))
            ii, jj = np.nonzero(sims >= thr)
            emit(ids_a_all[np.asarray(ia_idx)[ii]],
                 ids_b_all[np.asarray(ib_idx)[jj]], sims[ii, jj])
        if thr <= 0.0:
            # cross-dimension pairs are exactly 0.0 (reference rule) and
            # only reachable when the threshold admits them
            for da, ia_idx in ga.items():
                for db, ib_idx in gb.items():
                    if da == db:
                        continue
                    ii, jj = np.meshgrid(np.arange(len(ia_idx)),
                                         np.arange(len(ib_idx)),
                                         indexing="ij")
                    emit(ids_a_all[np.asarray(ia_idx)[ii.ravel()]],
                         ids_b_all[np.asarray(ib_idx)[jj.ravel()]],
                         np.zeros(ii.size))
        if not frames:
            return pd.DataFrame({"a": [], "b": [], "similarity": []})
        return pd.concat(frames, ignore_index=True)

    return (grouped.groupBy("bi", "bj")
            .applyInPandas(gram, "a long, b long, similarity double"))


def topk_similar(embeddings: DataFrame, query_id: int, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """J7 k-NN for one node: cosine vs every other embedded node, top-k desc
    (``src/main.cpp:518-577``, default k=10). The probe vector is a broadcast
    1-row side; the scan side streams — one pass, TakeOrderedAndProject top-k,
    never a full sort. Returns (vec_id, similarity)."""
    probe = embeddings.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec"))
    scored = (
        embeddings.filter(F.col(id_col) != query_id)
        .join(F.broadcast(probe))
        .select(F.col(id_col), cosine(F.col(vec_col), F.col("_qvec")).alias("similarity"))
    )
    return scored.orderBy(F.col("similarity").desc(), F.col(id_col).asc()).limit(k)


def brute_force_knn_join(queries: DataFrame, corpus: DataFrame, k: int,
                         q_id: str = "vec_id", c_id: str = "vec_id",
                         vec_col: str = "embedding",
                         max_query_rows: int = 65_536) -> DataFrame:
    """North-star ANN baseline: exact top-k per query. The query matrix is
    broadcast to every corpus partition; each Arrow batch computes one BLAS
    matmul (|Q|×d @ d×|batch|) and emits only its local top-k per query, so
    the shuffle carries |Q|·k rows per partition, then a per-query window
    keeps the global top-k. Scales with the corpus partition count; the
    cross-join + per-pair fold shape this replaces interprets |Q|·|C| array
    folds. The query side is driver-collected for the broadcast (same
    contract as F.broadcast: it must be the small side — for query sets too
    large to broadcast, fall back to ``similar_pairs``-style blocking or
    ``ivf_knn_join``). The contract is ENFORCED: the collect itself is capped
    at ``max_query_rows + 1`` rows — one job learns both the data and whether
    the cap is blown (a limit never pulls more than cap+1 rows to the driver,
    however large the query side actually is), and overflow raises instead of
    silently OOMing the driver (at 64 k rows × 64-dim doubles the broadcast
    is ~32 MB — inside the executor-memory envelope; 10× that is not).
    Returns (query_id, neighbor_id, similarity, rank)."""
    import pandas as pd
    from pyspark.sql import Window

    q_rows = (queries.select(F.col(q_id).alias("query_id"),
                             F.col(vec_col).alias("qv"))
              .limit(max_query_rows + 1).collect())
    if len(q_rows) > max_query_rows:
        raise ValueError(
            f"brute_force_knn_join: query side exceeds the "
            f"driver-collect cap of {max_query_rows}. Use ivf_knn_join (IVF "
            f"inverted-list probe) or ann_lsh_pairs (bucketed LSH) for large "
            f"query sets, or raise max_query_rows explicitly.")
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, similarity double, rank long")
    import numpy as np

    # Degenerate queries (NULL / zero-dim / zero-norm vector) are DROPPED
    # here, before the broadcast: such a query scores 0.0 against every
    # corpus vector (reference edge rule, Clustering.cpp:7-27), so its
    # "top-k" would be k arbitrary ids at similarity 0.0 — a fabricated
    # neighbor list with no signal (ADVICE r5). No rows for them is the
    # honest answer; callers needing the pair-level 0.0 semantics use
    # cosine()/similar_pairs, which keep it.
    qv_list = [np.zeros(0) if r["qv"] is None
               else np.asarray(r["qv"], dtype=np.float64) for r in q_rows]
    keep_q = [i for i, v in enumerate(qv_list)
              if v.shape[0] > 0 and np.linalg.norm(v) > 0.0]
    if not keep_q:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, similarity double, rank long")
    q_ids = np.array([q_rows[i]["query_id"] for i in keep_q])
    qv_list = [qv_list[i] for i in keep_q]
    # Queries grouped by DIMENSION before normalization: a ragged query set
    # (truncated embeddings) must not crash the broadcast build, and per
    # the reference edge rule cross-dimension pairs score exactly 0.0 —
    # the zero-initialized sims matrix below encodes that for free.
    q_groups: dict[int, list[int]] = {}
    for i, v in enumerate(qv_list):
        q_groups.setdefault(v.shape[0], []).append(i)
    q_norm = {}
    for d, idx in q_groups.items():
        m = np.stack([qv_list[i] for i in idx])
        n = np.linalg.norm(m, axis=1)
        q_norm[d] = (np.asarray(idx), m / n[:, None])
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_norm))

    kk = int(k)

    def score(batches):
        ids_q, by_dim = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            _e = np.zeros(0)
            cv_list = [_e if x is None else np.asarray(x, dtype=np.float64)
                       for x in pdf["cv"]]
            c_groups: dict[int, list[int]] = {}
            for j, v in enumerate(cv_list):
                c_groups.setdefault(v.shape[0], []).append(j)
            sims = np.zeros((len(ids_q), len(pdf)))        # |Q| × batch
            for d, (qidx, qmat) in by_dim.items():
                jidx = c_groups.get(d)
                if not jidx:
                    continue
                mc = np.stack([cv_list[j] for j in jidx])
                cn = np.linalg.norm(mc, axis=1)
                cn[cn == 0.0] = np.inf
                sims[np.ix_(qidx, jidx)] = qmat @ (mc / cn[:, None]).T
            c_ids = pdf["neighbor_id"].to_numpy()
            mask = ids_q[:, None] == c_ids[None, :]        # self-match exclusion
            sims[mask] = -np.inf
            top = min(kk, sims.shape[1])
            # full (sim desc, neighbor_id asc) order per query BEFORE the
            # local truncation — argpartition alone drops boundary ties
            # arbitrarily per Arrow batch, so exact-duplicate corpora (the
            # core dedup workload) would return a batch-split-dependent
            # neighbor set that the global window can't repair. lexsort is
            # O(n log n) vs the matmul's O(n·d): invisible at d >= 64.
            order = np.lexsort(
                (np.broadcast_to(c_ids, sims.shape), -sims), axis=1)
            part = order[:, :top]
            rows_q = np.repeat(np.arange(len(ids_q)), top)
            rows_c = part.ravel()
            sel = sims[rows_q, rows_c]
            keep = sel > -np.inf
            yield pd.DataFrame({"query_id": ids_q[rows_q[keep]],
                                "neighbor_id": c_ids[rows_c[keep]],
                                "similarity": sel[keep]})

    local_top = corpus.select(F.col(c_id).alias("neighbor_id"),
                              F.col(vec_col).alias("cv")).mapInPandas(
        score, "query_id long, neighbor_id long, similarity double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id").asc())
    return (local_top.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def rp_planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix for random-projection LSH, seeded
    driver-side. Exposed (not an underscore helper) because the oracle SQL
    inlines the SAME literals — signatures are engine-reproducible from the
    (dim, n_planes, seed) triple alone."""
    import random

    rnd = random.Random(seed)
    return [[1.0 if rnd.random() < 0.5 else -1.0 for _ in range(dim)]
            for _ in range(n_planes)]


def _rp_signs(vec: Column, dim: int, n_planes: int, seed: int) -> Column:
    """Sign bits of <v, r_j> for deterministic pseudo-random hyperplanes.

    The ±1 planes come from ``rp_planes`` as LITERAL arrays baked into the
    plan (dim × n_planes constants — bytes, not a broadcast), and each dot
    product is a sequential left-to-right fold, so any engine that folds the
    same literals in the same order reproduces the exact sign bits."""
    v = vec.cast("array<double>")
    sign_bits = []
    for plane in rp_planes(dim, n_planes, seed):
        # one Literal node per plane (F.lit(list)), not dim element
        # literals — same expression-tree-size fix as _nearest_cell
        r = F.lit([float(x) for x in plane])
        dot = F.aggregate(F.zip_with(v, r, lambda x, w: x * w),
                          F.lit(0.0), lambda a, x: a + x)
        sign_bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)))
    return F.array(*sign_bits)


def ann_lsh_buckets(df: DataFrame, dim: int, n_planes: int = 12, seed: int = 42,
                    vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane (SimHash-family) LSH bucketing for cosine similarity:
    adds a ``bucket`` column. At scale, candidate generation is an equi-join on
    bucket instead of a cross join; multiple (seed) tables raise recall."""
    bits = _rp_signs(F.col(vec_col), dim, n_planes, seed)
    bucket = F.aggregate(bits, F.lit(0).cast("long"),
                         lambda acc, b: acc * 2 + b)
    return df.withColumn("bucket", bucket)


def ivf_assign(embeddings: DataFrame, n_cells: int,
               id_col: str = "vec_id", vec_col: str = "embedding",
               centroids: DataFrame | None = None) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer (north-star ANN scale path): partition the vector
    space into ``n_cells`` inverted lists keyed by nearest centroid.

    Centroids default to a deterministic pseudo-random subsample: the
    ``n_cells`` rows minimizing an md5-derived 60-bit key of the id — a
    TakeOrderedAndProject top-k (per-partition top-k + single merge, no
    global sort), scalable and RNG-free, and engine-portable (any engine
    with md5 selects the same centroid set, which is what lets the DuckDB
    oracle re-derive the same inverted lists). It stands in for a k-means
    codebook (pyspark.ml KMeans can be dropped in; assignment below is
    identical either way). The centroid set is tiny (≈√n) so assignment is
    a broadcast join + per-row argmax: one scan of the corpus, no shuffle
    of the big side.

    Returns (assigned, centroids) where assigned = embeddings + ``cell`` column
    and centroids = (cell, cvec).
    """
    if centroids is None:
        sel_key = F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
            16, 10).cast("long")
        centroids = (
            embeddings.select(F.col(id_col), F.col(vec_col))
            .orderBy(sel_key.asc(), F.col(id_col).asc())
            .limit(n_cells)
            .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cvec"))
        )
    cent_u = with_unit_vector(centroids, "cvec", "cu").select("cell", "cu")
    emb_u = with_unit_vector(embeddings, vec_col, "_u")
    scored = emb_u.join(F.broadcast(cent_u))
    best = (
        scored.groupBy(id_col)
        .agg(F.max(F.struct(dot(F.col("_u"), F.col("cu")).alias("sim"),
                            F.col("cell"))).alias("_best"))
        .select(F.col(id_col), F.col("_best.cell").alias("cell"))
    )
    return embeddings.join(best, id_col), centroids


def _nearest_cell(u: Column, cents: list[tuple[int, list[float]]]) -> Column:
    """Argmax-cosine cell id for unit-vector column ``u`` against LITERAL
    centroids: transform each (cell, unit-centroid) literal to a (sim, cell)
    struct, take array_max (lexicographic -> max sim, cell breaks ties, same
    rule as ivf_assign's struct max and the BLAS argmax in
    ``_kmeans_centroid_update``). Pure codegen'd map — no join, no
    shuffle, no broadcast variable, no Python — the JVM-only assignment
    kernel for pipelines that must stay Arrow-free; the k-means fit itself
    uses the BLAS pass (the interpreted HOF fold is ~3 orders slower at
    real dims).

    Each centroid vector is ONE ``F.lit(list)`` Literal node, not a
    ``CreateArray`` of dim element literals: the per-element form plans a
    k·dim-node expression tree (12k nodes at k=16, dim=768) whose
    analysis/codegen dominated the fit at real embedding dims — the same
    expression-tree blowup the r6 dim-independent UPDATE fix removed from
    the aggregate side."""
    cent_arr = F.array(*[
        F.struct(F.lit(cell).cast("long").alias("cell"),
                 F.lit([float(x) for x in cu]).alias("cu"))
        for cell, cu in cents])
    scored = F.transform(
        cent_arr,
        lambda ce: F.struct(
            F.aggregate(F.zip_with(u, ce["cu"], lambda a, b: a * b),
                        F.lit(0.0), lambda acc, x: acc + x).alias("sim"),
            ce["cell"].alias("cell")))
    return F.array_max(scored)["cell"]


def kmeans_fit(embeddings: DataFrame, k: int = 10, max_iter: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding",
               init: list | None = None) -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column (spherical:
    cosine assignment on unit vectors) — the document-clustering /
    IVF-codebook kernel.

    Every step is DataFrame-shaped and scales to a 1000-executor corpus —
    per iteration the corpus is scanned once and shuffled never:

    - **init**: the k rows minimizing ``xxhash64(id)`` — TakeOrderedAndProject
      (per-partition top-k + merge), deterministic, no RNG, no global sort;
    - **assign + update**: one Arrow-batched BLAS pass per iteration
      (``_kmeans_centroid_update``: ``M @ C.T`` argmax + one-hot partial
      sums, k rows out per Arrow batch), then ONE partial-aggregating
      shuffle of k·dim running sums — no join, no broadcast variable,
      dim-independent plan (see the update's docstring for the two slower
      forms this replaced);
    - the driver round-trip also cuts lineage, so the plan doesn't nest
      ``max_iter`` levels deep.

    Clusters that lose all members drop out (k may shrink); callers needing
    exactly k re-seed. ``init`` seeds the fit with EXISTING (cell, vector)
    pairs instead of the xxhash64-min rows — the warm-start path for index
    REBALANCING, where Lloyd steps refine drifted centroids in place
    (labels keep their original cell ids). Returns a (cell, cvec) centroid
    DataFrame; feed to ``ivf_assign(embeddings, k, centroids=...)`` (or
    ``kmeans_assign``) to label rows."""
    import numpy as np

    dim_row = (embeddings.select(vec_col)
               .filter(F.col(vec_col).isNotNull()).first())
    if dim_row is None:
        raise ValueError(
            "kmeans_fit: no non-null vectors in the corpus — nothing to "
            "cluster")
    dim = len(dim_row[0])
    spark = embeddings.sparkSession
    # centroid estimation uses only valid vectors (non-NULL, detected dim):
    # a NULL row seeded as a centroid or a short row indexed at _u[i] under
    # ANSI mode would crash the fit; assignment of irregular rows is the
    # caller's concern (ivf_assign degrades them gracefully)
    emb_u = (with_unit_vector(embeddings, vec_col, "_u")
             .filter(F.size(F.col(vec_col)) == dim)
             .select(F.col(id_col).alias("_id"), "_u"))
    # k-means re-scans the unit vectors max_iter times; materialize once
    emb_u = emb_u.localCheckpoint(eager=True)
    if init is not None:
        cents = [(int(c), list(v)) for c, v in init]
    else:
        seeds = (emb_u.orderBy(F.xxhash64(F.col("_id")).asc(),
                               F.col("_id").asc())
                 .limit(k).collect())
        cents = [(int(r["_id"]), list(r["_u"])) for r in seeds]

    def unit(v):
        n = float(np.linalg.norm(v))
        return [x / n for x in v] if n > 0 else v

    for _ in range(max_iter):
        lits = [(c, unit(v)) for c, v in cents]
        rows = _kmeans_centroid_update(emb_u, lits).collect()
        acc: dict[int, list[float]] = {}
        for r in rows:
            acc.setdefault(int(r["cell"]), [0.0] * dim)[r["pos"]] = r["c"]
        prev, cents = cents, sorted(acc.items())
        if cents == prev:
            # exact fixpoint: identical centroids make every remaining
            # Lloyd step a bit-for-bit no-op — returning now changes
            # NOTHING about the result, only skips dead iterations
            # (common at small corpora, where assignments stabilize well
            # before max_iter)
            break
    return spark.createDataFrame(
        [(c, v) for c, v in cents], "cell long, cvec array<double>")


def _kmeans_centroid_update(emb_u: DataFrame, lits) -> DataFrame:
    """One Lloyd's update step as (cell, pos, c) component rows.

    Assignment + accumulation run as ONE Arrow-batched BLAS pass
    (``mapInPandas``, the repo's standard kernel for dense vector math):
    per batch, ``sims = M @ C.T`` (n×k), a tie-aware argmax reproducing
    the lexicographic (sim, cell)-struct-max rule (max sim, ties → larger
    cell — the same rule as ``ivf_assign``/``_nearest_cell``), then a
    one-hot partial ``onehot.T @ M`` — emitting at most k rows per Arrow
    batch (cell, cnt, sums). The downstream explode + sum/sum mean runs
    over k·n_batches partial rows (hundreds) instead of n·dim exploded
    components (15M at 20k×768), and the shuffle carries k·dim running
    sums either way. The plan stays constant-size at any dim.

    History of the two prior forms, both plan-tested against
    regression: (a) per-component ``F.avg(_u[i]) for i in range(dim)``
    planned dim aggregate expressions — a 1024-column codegen blob at
    real dims; (b) the HOF argmax co-selected with ``posexplode`` planned
    the argmax in the Project ABOVE the Generate, re-evaluating it once
    per EXPLODED ELEMENT — dim× the work (at dim 768 a 7.8s assignment
    became a 100-minute update step), and even placed correctly the
    interpreted HOF fold ran at ~32 Mflops — 3 orders under BLAS."""
    import numpy as np
    import pandas as pd

    pairs = sorted((int(c), [float(x) for x in v]) for c, v in lits)
    cells = np.array([c for c, _ in pairs], dtype=np.int64)
    cmat = np.array([v for _, v in pairs], dtype=np.float64)   # k × dim
    k = len(pairs)

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["_u"].to_numpy()).astype(np.float64)
            sims = m @ cmat.T                                  # n × k
            # lexicographic (sim, cell) max: cells are sorted ascending,
            # so among tied max sims pick the LARGEST cell via the
            # reversed argmax (np.argmax alone returns the first/lowest)
            best = (k - 1) - np.argmax(sims[:, ::-1], axis=1)
            onehot = np.zeros((len(m), k))
            onehot[np.arange(len(m)), best] = 1.0
            sums = onehot.T @ m                                # k × dim
            cnts = onehot.sum(axis=0).astype(np.int64)
            mask = cnts > 0
            yield pd.DataFrame({
                "cell": cells[mask], "cnt": cnts[mask],
                "sums": [row.tolist() for row in sums[mask]]})

    parts = emb_u.mapInPandas(
        partials, "cell long, cnt long, sums array<double>")
    return (parts
            .select("cell", "cnt", F.posexplode("sums").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg((F.sum("val") / F.sum("cnt")).alias("c")))


def kmeans_assign(embeddings: DataFrame, k: int = 10, max_iter: int = 5,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Fit + label: every row gets its nearest (cosine) final centroid.
    Returns (id_col, cluster)."""
    cent = kmeans_fit(embeddings, k, max_iter, id_col, vec_col)
    assigned, _ = ivf_assign(embeddings, k, id_col, vec_col, centroids=cent)
    return assigned.select(id_col, F.col("cell").alias("cluster"))


def _ivf_blas_topk(probes: DataFrame, corp_u: DataFrame, k: int,
                   qt: str, max_query_rows: int = 65_536) -> DataFrame:
    """BLAS scoring for the IVF paths, shaped like ``brute_force_knn_join``
    with a cell mask: the (query, probed-cell) set is driver-collected and
    BROADCAST (same enforced small-side cap as the brute-force path — for
    query batches past the cap use ``blas=False``, whose join never
    collects), and the corpus streams IN PLACE through one ``mapInPandas``
    that per Arrow batch computes ``Q_cell @ C.T`` per (cell, dim)
    subgroup and emits only its local top-k per query — the shuffle into
    the final window carries |Q|·k rows per partition, never the vectors.

    Two earlier shapes this replaces, both measured at 50k×768: the
    per-pair codegen'd fold interprets every dot at ~32 Mflops, and a
    ``groupBy(cell).applyInPandas`` gram shuffles the corpus vectors
    (~300 MB) to the kernel — streaming the big side is the whole point.
    Ragged vectors are grouped by dim (cross-dim cosine is 0 by the
    reference rule and can't reach a positive top-k); NULL vectors are
    skipped; self-matches (query_id == neighbor_id) are excluded, as in
    the exact path; ties break (similarity desc, neighbor_id asc)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    spark = probes.sparkSession
    # neighbor_id carries the CORPUS/index id type, not the query's: the
    # exact fold path returns the corpus's own id type, and a mixed-type
    # probe (string queries over a long-id index) must not silently coerce
    # — or fail at Arrow conversion — on the blas path only.
    nt = corp_u.schema["neighbor_id"].dataType.simpleString()
    p_rows = probes.limit(max_query_rows + 1).collect()
    if len(p_rows) > max_query_rows:
        raise ValueError(
            f"ivf blas=True probes exceed the driver-collect cap of "
            f"{max_query_rows} (query, cell) rows; use blas=False (the "
            "join-based fold, which never collects) or raise the cap")
    if not p_rows:
        return spark.createDataFrame(
            [], f"query_id {qt}, neighbor_id {nt}, similarity double, "
                "rank int")
    # broadcast index: cell -> dim -> (query ids, unit-query matrix)
    by_cell: dict = {}
    for r in p_rows:
        qu = r["qu"]
        if qu is None or len(qu) == 0:
            continue
        by_cell.setdefault(r["cell"], {}).setdefault(len(qu), []).append(
            (r["query_id"], np.asarray(qu, dtype=np.float64)))
    packed = {
        cell: {d: (np.array([i for i, _ in rows]),
                   np.stack([v for _, v in rows]))
               for d, rows in dims.items()}
        for cell, dims in by_cell.items()}
    bq = spark.sparkContext.broadcast(packed)
    kk = int(k)

    def score(batches):
        cells = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            for cell, grp in pdf.groupby("cell"):
                dims = cells.get(cell)
                if dims is None:
                    continue
                cv = [None if x is None else np.asarray(x, dtype=np.float64)
                      for x in grp["cu2"]]
                c_groups: dict[int, list[int]] = {}
                for j, v in enumerate(cv):
                    if v is not None and v.shape[0] > 0:
                        c_groups.setdefault(v.shape[0], []).append(j)
                cid_all = grp["neighbor_id"].to_numpy()
                for d, (qids, qmat) in dims.items():
                    jidx = c_groups.get(d)
                    if not jidx:
                        continue
                    cmat = np.stack([cv[j] for j in jidx])
                    cid = cid_all[np.asarray(jidx)]
                    sims = qmat @ cmat.T
                    sims[qids[:, None] == cid[None, :]] = -np.inf
                    top = min(kk, sims.shape[1])
                    # local truncation under the FULL (sim desc,
                    # neighbor_id asc) tie rule — argpartition alone drops
                    # boundary ties arbitrarily per Arrow batch (exact
                    # duplicates, the core dedup workload, would get a
                    # batch-split-dependent neighbor set the global window
                    # can't repair)
                    order = np.lexsort(
                        (np.broadcast_to(cid, sims.shape), -sims), axis=1)
                    part = order[:, :top]
                    rq = np.repeat(np.arange(len(qids)), top)
                    rc = part.ravel()
                    sel = sims[rq, rc]
                    keep = sel > -np.inf
                    yield pd.DataFrame({
                        "query_id": qids[rq[keep]],
                        "neighbor_id": cid[rc[keep]],
                        "similarity": sel[keep]})

    local_top = (corp_u
                 .filter(F.col("cell").isin(list(packed)))
                 .select("neighbor_id", "cu2", "cell")
                 .mapInPandas(
                     score,
                     f"query_id {qt}, neighbor_id {nt}, similarity double"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id").asc())
    return (local_top.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ivf_knn_join(queries: DataFrame, corpus: DataFrame, k: int,
                 n_cells: int = 16, n_probe: int = 4,
                 q_id: str = "vec_id", c_id: str = "vec_id",
                 vec_col: str = "embedding", blas: bool = False) -> DataFrame:
    """Approximate k-NN join via IVF: corpus vectors bucketed into inverted
    lists; each query probes its ``n_probe`` nearest cells and ranks exact
    cosine only within those lists. Candidate volume ≈ n·(n_probe/n_cells) per
    query instead of n — the 100 TB path where the corpus inverted lists are a
    partitioned table reused across query batches.

    Returns (query_id, neighbor_id, similarity, rank); recall < 1 by design
    (tests measure it against brute_force_knn_join).

    ``blas=True`` swaps the per-pair codegen'd dot products for the
    broadcast-probe BLAS kernel (``_ivf_blas_topk``) — same neighbors,
    same tie rule, float sums in BLAS order instead of the sequential
    fold (last-ulp differences; the default stays the fold because the
    oracle re-derives it bit-for-bit). NOTE: in this ONLINE join the
    corpus assignment (computed fresh every call) dominates, so blas
    barely moves the total — the 2.8× measured win is on
    ``ivf_index_probe``, where the at-rest pruned scan feeds Arrow
    directly; that is the path production runs.
    """
    from pyspark.sql import Window

    assigned, centroids = ivf_assign(corpus, n_cells, c_id, vec_col)
    cent_u = with_unit_vector(centroids, "cvec", "cu").select("cell", "cu")
    q_u = with_unit_vector(
        queries.select(F.col(q_id).alias("query_id"), F.col(vec_col).alias("qv")),
        "qv", "qu")
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_csim").desc(), F.col("cell").asc())
    probes = (
        q_u.join(F.broadcast(cent_u))
        .select("query_id", "qu", "cell", dot(F.col("qu"), F.col("cu")).alias("_csim"))
        .withColumn("_crk", F.row_number().over(wq))
        .filter(F.col("_crk") <= n_probe)
        .select("query_id", "qu", "cell")
    )
    corp_u = with_unit_vector(
        assigned.select(F.col(c_id).alias("neighbor_id"), F.col(vec_col).alias("cv"),
                        "cell"), "cv", "cu2")
    if blas:
        return _ivf_blas_topk(probes, corp_u, k,
                              queries.schema[q_id].dataType.simpleString())
    scored = (
        probes.join(corp_u, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                dot(F.col("qu"), F.col("cu2")).alias("similarity"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---- product quantization (PQ) ANN ----------------------------------------

def pq_train(corpus: DataFrame, m: int = 8, n_centroids: int = 16,
             sample_size: int = 10_000, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding"):
    """Train PQ codebooks on a bounded corpus sample (driver-side numpy
    k-means — metadata-scale by construction: the sample is capped, and the
    codebook is m × n_centroids × (d/m) floats, a few KB).

    The sample is the ``sample_size`` rows minimizing ``xxhash64(id)`` — a
    TakeOrderedAndProject (per-partition top-k + merge), deterministic and
    uniform-ish without an RNG over the data. Vectors are unit-normalized
    first so PQ inner-product tables approximate cosine. Returns a numpy
    array of shape (m, n_centroids, d//m)."""
    import numpy as np

    rows = (corpus.select(F.col(vec_col).alias("v"), F.col(id_col).alias("i"))
            .orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
            .limit(sample_size).collect())
    dims = {(0 if r["v"] is None else len(r["v"])): r["i"] for r in rows}
    if len(dims) > 1:
        # fail loudly with the offending ids — PQ requires one fixed dim
        # (codebooks are per-subspace), and the bare numpy 'inhomogeneous
        # shape' error names nothing
        raise ValueError(
            f"pq_train: embeddings must share one dimension, found dims "
            f"{sorted(dims)} (example ids: {dims}); clean or filter the "
            "corpus before PQ")
    X = np.array([np.asarray(r["v"], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0.0] = np.inf
    X = X / norms[:, None]
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    k = min(n_centroids, len(X))
    rng = np.random.RandomState(seed)
    codebooks = np.zeros((m, k, dsub))
    for j in range(m):
        sub = X[:, j * dsub:(j + 1) * dsub]
        cent = sub[rng.choice(len(sub), size=k, replace=False)].copy()
        for _ in range(10):                       # Lloyd iterations
            # argmin ||x-c||^2 == argmin (||c||^2 - 2 x.c): the matmul
            # form — the broadcast-subtract form allocates an n*k*dsub
            # temp (120 MB per step at 10k x 16 x 96) and ran ~10x slower
            d2 = (cent ** 2).sum(1)[None, :] - 2.0 * (sub @ cent.T)
            assign = d2.argmin(1)
            for c in range(k):
                pts = sub[assign == c]
                if len(pts):
                    cent[c] = pts.mean(0)
        codebooks[j] = cent
    return codebooks


def pq_encode(corpus: DataFrame, codebooks, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Encode each (unit-normalized) vector as ``m`` small codes — nearest
    codebook centroid per subspace — via Arrow-batched mapInPandas argmin.
    At 100 TB this is the point of PQ: a 64-dim float32 corpus (256 B/vec)
    scans as m = 8 one-byte codes, a 32× I/O and memory reduction for the
    candidate pass. Returns (id, codes array<int>)."""
    import numpy as np
    import pandas as pd

    sc = corpus.sparkSession.sparkContext
    bcb = sc.broadcast(codebooks)
    mm, _, dsub = codebooks.shape

    def enc(batches):
        cb = bcb.value
        d_expect = mm * dsub
        for pdf in batches:
            if len(pdf) == 0:
                continue
            bad = {int(i): (0 if v is None else len(v))
                   for i, v in zip(pdf["id"], pdf["v"])
                   if v is None or len(v) != d_expect}
            if bad:
                # same loud contract as pq_train: a ragged/NULL vector must
                # name itself, not die as a numpy shape error
                sample = dict(list(bad.items())[:5])
                raise ValueError(
                    f"pq_encode: {len(bad)} vector(s) don't match the "
                    f"codebook dim {d_expect} (id->dim sample: {sample}); "
                    "clean or filter the corpus before PQ")
            X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            norms = np.linalg.norm(X, axis=1)
            norms[norms == 0.0] = np.inf
            X = X / norms[:, None]
            codes = np.empty((len(X), mm), dtype=np.int32)
            for j in range(mm):
                sub = X[:, j * dsub:(j + 1) * dsub]
                # same matmul identity as pq_train's Lloyd step
                d2 = (cb[j] ** 2).sum(1)[None, :] - 2.0 * (sub @ cb[j].T)
                codes[:, j] = d2.argmin(1)
            yield pd.DataFrame({"id": pdf["id"].to_numpy(),
                                "codes": list(codes.tolist())})

    return (corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .mapInPandas(enc, "id long, codes array<int>"))


def pq_knn_join(queries: DataFrame, corpus: DataFrame, k: int,
                m: int = 8, n_centroids: int = 16, rerank: int = 64,
                q_id: str = "vec_id", c_id: str = "vec_id",
                vec_col: str = "embedding",
                max_query_rows: int = 65_536) -> DataFrame:
    """Approximate k-NN via PQ + ADC scan + exact re-rank:

    1. train codebooks on a corpus sample (driver, metadata-scale);
    2. encode the corpus once (m bytes/vector — the pass over 100 TB of
       vectors becomes a pass over ~3 TB of codes);
    3. per query, precompute the m × n_centroids inner-product table and
       score every corpus code by table lookup (ADC) — no float vector is
       touched in the scan; keep the top ``rerank`` candidates per query;
    4. re-rank candidates with exact cosine on the true vectors, take top-k.

    The re-rank step joins only |Q|·rerank rows back to the corpus, so the
    lossy code distance only has to get the neighborhood right, not the
    order. Returns (query_id, neighbor_id, similarity, rank) like
    brute_force_knn_join (similarity = exact cosine)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    # capped collect doubles as the size guard (one job, never pulls more
    # than cap+1 rows — see brute_force_knn_join)
    q_rows = (queries.select(F.col(q_id).alias("query_id"),
                             F.col(vec_col).alias("qv"))
              .limit(max_query_rows + 1).collect())
    if len(q_rows) > max_query_rows:
        raise ValueError(
            f"pq_knn_join: query side exceeds the broadcast cap of "
            f"{max_query_rows} rows; shard the query set or raise the cap.")
    codebooks = pq_train(corpus, m=m, n_centroids=n_centroids,
                         id_col=c_id, vec_col=vec_col)
    codes = pq_encode(corpus, codebooks, id_col=c_id, vec_col=vec_col)
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, similarity double, rank long")
    q_ids = np.array([r["query_id"] for r in q_rows])
    qm = np.array([np.asarray(r["qv"], dtype=np.float64) for r in q_rows])
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0.0] = np.inf
    qm = qm / qn[:, None]
    mm, kk, dsub = codebooks.shape
    # ADC tables: T[q, j, c] = <q_subj, codebook[j, c]>
    tables = np.einsum("qjd,jcd->qjc",
                       qm.reshape(len(qm), mm, dsub), codebooks)
    sc = corpus.sparkSession.sparkContext
    bt = sc.broadcast((q_ids, tables))
    rr = int(rerank)

    def adc_scan(batches):
        ids_q, T = bt.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(list(pdf["codes"]), dtype=np.int64)   # (B, m)
            c_ids = pdf["id"].to_numpy()
            # sims[q, b] = Σ_j T[q, j, C[b, j]]
            sims = np.zeros((len(ids_q), len(C)))
            for j in range(T.shape[1]):
                sims += T[:, j, :][:, C[:, j]]
            mask = ids_q[:, None] == c_ids[None, :]
            sims[mask] = -np.inf
            top = min(rr, sims.shape[1])
            part = np.argpartition(-sims, top - 1, axis=1)[:, :top]
            rows_q = np.repeat(np.arange(len(ids_q)), top)
            rows_c = part.ravel()
            sel = sims[rows_q, rows_c]
            keep = sel > -np.inf
            yield pd.DataFrame({"query_id": ids_q[rows_q[keep]],
                                "neighbor_id": c_ids[rows_c[keep]],
                                "approx_sim": sel[keep]})

    local = codes.mapInPandas(
        adc_scan, "query_id long, neighbor_id long, approx_sim double")
    w_cand = Window.partitionBy("query_id").orderBy(
        F.col("approx_sim").desc(), F.col("neighbor_id").asc())
    cand = (local.withColumn("_r", F.row_number().over(w_cand))
            .filter(F.col("_r") <= rerank).drop("_r", "approx_sim"))
    # exact re-rank: candidates join back to true vectors (|Q|·rerank rows)
    qdf = queries.select(F.col(q_id).alias("query_id"),
                         F.col(vec_col).alias("_qv"))
    cvec = corpus.select(F.col(c_id).alias("neighbor_id"),
                         F.col(vec_col).alias("_cv"))
    scored = (cand.join(cvec, "neighbor_id")
              .join(F.broadcast(qdf), "query_id")
              .select("query_id", "neighbor_id",
                      cosine(F.col("_qv"), F.col("_cv")).alias("similarity")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ann_lsh_pairs(embeddings: DataFrame, threshold: float, dim: int,
                  n_planes: int = 8, n_tables: int = 4,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate J6 at scale: union of per-table bucket equi-joins, exact
    cosine re-check on candidates, distinct pairs. Candidate volume is
    Σ_buckets n_b² per table instead of n²."""
    cand = None
    for t in range(n_tables):
        b = ann_lsh_buckets(embeddings.select(id_col, vec_col), dim, n_planes,
                            seed=42 + t, vec_col=vec_col)
        lhs = b.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"),
                       F.col("bucket"))
        rhs = b.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
                       F.col("bucket"))
        p = lhs.join(rhs, ["bucket"]).filter(F.col("a") < F.col("b")).drop("bucket")
        cand = p if cand is None else cand.union(p)
    cand = cand.dropDuplicates(["a", "b"])
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        cand.select("a", "b", sim.alias("similarity"))
        .filter(F.col("similarity") >= threshold)
    )


# ---- persisted IVF index (build once, probe many) --------------------------

# On-disk index format version. v2 (round 3+) selects seed centroids via
# md5-min subsampling (engine-portable); v1 used xxhash64. Mixed-version
# probe/append against a stale index would silently mis-assign cells, so the
# build stamps this into <path>/meta and probe/append refuse a mismatch
# (see CHANGELOG.md).
INDEX_FORMAT_VERSION = 2


def _check_index_version(spark, path: str) -> dict:
    """Raise loudly when probing/appending an index whose on-disk format
    version doesn't match this module (or that predates versioning).
    Only a MISSING meta is translated into the rebuild message — transient
    IO/permission/corruption errors propagate with their real cause, so a
    healthy index never gets misdiagnosed as pre-versioning. Returns the
    meta row as a dict (``id_type`` may be absent on pre-r8 metas)."""
    from pyspark.errors import AnalysisException

    from thewhisperdb_spark.operators.indexmeta import read_meta_rows

    try:
        meta = read_meta_rows(spark, f"{path}/meta")
    except AnalysisException as e:
        raise ValueError(
            f"IVF index at {path} has no meta/format marker — it was built "
            f"by a pre-v{INDEX_FORMAT_VERSION} build whose hash scheme is "
            "incompatible, or an interrupted build removed it; rebuild "
            "with ivf_index_build") from e
    ver = int(meta[0]["format_version"]) if meta else 0
    if ver == -1:
        raise ValueError(
            f"IVF index at {path} is marked in-progress/interrupted "
            "(format_version -1): a rebuild died before completing; "
            "rebuild with ivf_index_build")
    if ver != INDEX_FORMAT_VERSION:
        raise ValueError(
            f"IVF index at {path} is format v{ver}, this build writes "
            f"v{INDEX_FORMAT_VERSION}; sketches across versions do not "
            "compare equal — rebuild with ivf_index_build")
    return dict(meta[0]) if meta else {}


def _ivf_meta_writer(spark, path: str, id_type: str | None = None):
    """One meta writer shared by build/append/delete/rebalance so the
    sentinel protocol is spelled identically at every site; writer claims
    live in separate uniquely-named files (``indexmeta`` v3) — the
    sentinel never carries a token, so a claim can never clobber an
    in-progress ``-1``. ``id_type``
    (recorded by build since r8) lets the probe's cold-start empty frames
    carry the CORPUS id type — without it an empty index would type
    neighbor_id from the query side, flipping the probe's output schema
    between cold and warm states. None preserves whatever the at-rest
    meta already records (or omits, on pre-r8 metas)."""
    if id_type is None:
        try:
            from thewhisperdb_spark.operators.indexmeta import (
                read_meta_rows)
            rows = read_meta_rows(spark, f"{path}/meta")
            id_type = rows[0].get("id_type") if rows else None
        except Exception:
            id_type = None

    def write_meta(version: int) -> None:
        write_meta_row(
            spark, f"{path}/meta",
            "format_version int, hash_scheme string, id_type string",
            (version, "md5-min-v2", id_type))
    return write_meta


def ivf_index_build(corpus: DataFrame, path: str, n_cells: int = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    centroids: DataFrame | None = None) -> None:
    """Materialize an IVF index on disk: ``<path>/centroids`` (tiny) and
    ``<path>/lists`` — the corpus hive-PARTITIONED BY cell. Partitioning is
    the scale payoff: a probe that touches n_probe of n_cells cells reads
    n_probe/n_cells of the data via directory-level partition pruning, and
    the build cost amortizes over every subsequent query batch (the
    reference recomputes its O(n²) similarity scan per request,
    ``src/main.cpp:539-561``; this is the at-rest inverse of that).
    """
    assigned, cents = ivf_assign(corpus, n_cells, id_col, vec_col,
                                 centroids=centroids)
    spark = corpus.sparkSession
    write_meta = _ivf_meta_writer(
        spark, path,
        id_type=corpus.schema[id_col].dataType.simpleString())
    # meta is the build-completion sentinel: invalidate it FIRST (version
    # -1), write the data, then stamp the real version LAST — a build that
    # dies anywhere in between leaves an index that loudly FAILS the
    # version gate instead of one that passes it with mixed-generation
    # centroids/lists (this covers rebuilds over an existing same-version
    # index too, where ordering alone wouldn't)
    write_meta(-1)
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    (assigned.write.mode("overwrite").partitionBy("cell")
     .parquet(f"{path}/lists"))
    write_meta(INDEX_FORMAT_VERSION)


def ivf_index_probe(spark, path: str, queries: DataFrame, k: int,
                    n_probe: int = 4, q_id: str = "vec_id",
                    vec_col: str = "embedding", blas: bool = False) -> DataFrame:
    """k-NN against a persisted IVF index: rank exact cosine only inside each
    query's ``n_probe`` nearest cells.

    The probed cell set is collected (<= n_cells longs — metadata-scale) and
    applied as a STATIC IN-filter on the partition column, so the inverted-
    list scan prunes directories at planning time (visible as
    PartitionFilters in the plan) — no reliance on runtime DPP. Returns
    (query_id, neighbor_id, similarity, rank).

    ``blas=True``: Arrow-grouped per-cell gram scoring with in-cell
    top-k (``_ivf_blas_topk``) instead of the per-pair codegen'd fold —
    the production setting at real embedding dims (same neighbors and
    tie rule; see ``ivf_knn_join``).
    """
    from pyspark.errors import AnalysisException
    from pyspark.sql import Window

    meta = _check_index_version(spark, path)
    qt = queries.schema[q_id].dataType.simpleString()
    # cold-start empty frames carry the CORPUS id type from meta (r8):
    # the probe's output schema must not flip between the empty and
    # populated states of the same index. Pre-r8 metas lack the column —
    # fall back to the query type, the old behavior.
    nt = meta.get("id_type") or qt
    try:
        cents = spark.read.parquet(f"{path}/centroids")
    except AnalysisException:
        # cold start (index built over an empty corpus): no centroids, so
        # every query's neighbor set is vacuously empty
        return spark.createDataFrame(
            [], f"query_id {qt}, neighbor_id {nt}, similarity double, "
                "rank int")
    cent_u = with_unit_vector(cents, "cvec", "cu").select("cell", "cu")
    q_u = with_unit_vector(
        queries.select(F.col(q_id).alias("query_id"),
                       F.col(vec_col).alias("qv")), "qv", "qu")
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_csim").desc(), F.col("cell").asc())
    probes = (
        q_u.join(F.broadcast(cent_u))
        .select("query_id", "qu", "cell",
                dot(F.col("qu"), F.col("cu")).alias("_csim"))
        .withColumn("_crk", F.row_number().over(wq))
        .filter(F.col("_crk") <= n_probe)
        .select("query_id", "qu", "cell"))
    probes = probes.localCheckpoint(eager=True)
    cells = [r["cell"] for r in probes.select("cell").distinct().collect()]
    try:
        lists = (spark.read.parquet(f"{path}/lists")
                 .filter(F.col("cell").isin(cells)))
    except AnalysisException:
        # lists are hive-partitioned, so an empty build leaves NO parts to
        # infer from even though the (unpartitioned) centroids file reads —
        # same cold-start case as above
        return spark.createDataFrame(
            [], f"query_id {qt}, neighbor_id {nt}, similarity double, "
                "rank int")
    corp_u = with_unit_vector(
        lists.select(F.col("vec_id").alias("neighbor_id"),
                     F.col(vec_col).alias("cv"), "cell"), "cv", "cu2")
    if blas:
        return _ivf_blas_topk(probes, corp_u, k,
                              queries.schema[q_id].dataType.simpleString())
    scored = (
        probes.join(corp_u, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                dot(F.col("qu"), F.col("cu2")).alias("similarity")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ivf_index_append(spark, path: str, new_vectors: DataFrame,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> None:
    """Incremental index maintenance: assign NEW vectors to the index's
    EXISTING centroids and append them to the partitioned inverted lists —
    the arriving-corpus path (a nightly crawl delta, a stream batch) that
    avoids rebuilding the index. Assignment is the same broadcast-centroid
    argmax as the build; the write is an append of only the delta's
    partitions. Centroid drift is the accepted tradeoff (rebalance cadence
    is the knob — ``ivf_index_rebalance``).

    Retry-idempotent and crash-atomic (same discipline as
    lsh_index_append): already-indexed ids are anti-joined away before
    writing, so a replayed batch job is a no-op, and the write is
    bracketed by the meta sentinel so a crash mid-append leaves an index
    that loudly fails the gate rather than one with a partially-written
    delta. Single-writer per index, ENFORCED: a uniquely-named claim
    file is PUT (``indexmeta.claim_sentinel``, protocol v3) BEFORE the
    anti-join reads the at-rest lists, re-verified (``verify_claim``)
    before the ``-1`` stamp and re-confirmed (``confirm_claim``) after
    it — a racing second appender either loses the newest-claim check
    having written nothing, fails the re-verify/confirm, or claims after
    the original stamped and anti-joins a state that already contains
    its rows (the intended no-op). Readers are NOT blocked by the claim:
    it never writes the sentinel (probes keep serving the last stamped
    state through the whole anti-join/assignment phase); only the data
    write itself is
    bracketed by the in-progress ``-1`` — a window sized by one delta's
    parquet append, not by the delta computation."""
    from pyspark.errors import AnalysisException

    _check_index_version(spark, path)
    try:
        from thewhisperdb_spark.operators.indexmeta import (
            parquet_row_count)
        cents = spark.read.parquet(f"{path}/centroids")
        n_cells = parquet_row_count(spark, f"{path}/centroids")
    except AnalysisException:
        n_cells = 0
    if n_cells == 0:
        raise ValueError(
            f"IVF index at {path} has no centroids (built over an empty "
            "corpus) — appended vectors would assign to nothing and be "
            "silently stranded; rebuild with ivf_index_build over a "
            "non-empty corpus")
    try:
        lists = spark.read.parquet(f"{path}/lists")
    except AnalysisException:
        # a takedown can delete EVERY vector (lists dir left partless while
        # centroids remain) — the next append re-seeds the lists
        lists = None
    if lists is not None:
        # column-SET gate: appending a batch whose columns differ from the
        # at-rest lists (an extra payload column, a missing one) writes
        # mixed-schema parquet — later reads silently pick one schema and
        # drop/null the other's columns. Project the batch to the index's
        # columns before appending.
        at_rest_cols = sorted(c for c in lists.columns if c != "cell")
        in_cols = sorted(new_vectors.columns)
        if at_rest_cols != in_cols:
            raise ValueError(
                f"IVF index at {path} stores columns {at_rest_cols}; "
                f"appending {in_cols} would drift the lists schema — "
                "project the batch to the index's columns first")
        # type gate (the LSH id-type discipline): appending a batch whose
        # id or vector type differs from the at-rest lists writes
        # mixed-type parquet that poisons every subsequent read with an
        # opaque decode error
        for col in (id_col, vec_col):
            at_rest = lists.schema[col].dataType.simpleString()
            incoming = new_vectors.schema[col].dataType.simpleString()
            if at_rest != incoming:
                raise ValueError(
                    f"IVF index at {path} stores {col} as {at_rest}; "
                    f"appending {incoming} would corrupt the index "
                    "(cast the batch first)")
    write_meta = _ivf_meta_writer(spark, path)
    # claim BEFORE the anti-join (the LSH append's discipline): the
    # at-rest file listing is resolved under the claim, so a retry that
    # raced the original append either loses the claim/re-verify or
    # anti-joins a state already containing the original's rows (lands as
    # the intended no-op). The claim keeps the version VALID — probes keep
    # serving through this whole phase. A failure during the delta
    # computation releases the claim before re-raising (nothing written).
    meta_dir = f"{path}/meta"
    token = claim_sentinel(spark, meta_dir)
    try:
        from thewhisperdb_spark.operators import checkpoint_counted
        try:
            at_rest_ids = (spark.read.parquet(f"{path}/lists")
                           .select(F.col(id_col)))
            # emptiness rides the checkpoint job (optimization r13)
            fresh, n_fresh = checkpoint_counted(
                new_vectors.join(at_rest_ids, id_col, "left_anti"))
        except AnalysisException:
            # partless lists dir (total takedown): this append re-seeds it
            fresh, n_fresh = checkpoint_counted(new_vectors)
        if n_fresh == 0:
            release_claim(spark, meta_dir, token)  # replayed batch: no-op
            return
        assigned, _ = ivf_assign(fresh, n_cells, id_col, vec_col,
                                 centroids=cents)
        assigned = assigned.localCheckpoint(eager=True)
    except Exception:
        release_claim(spark, meta_dir, token)      # nothing written
        raise
    # in-progress bracket around ONLY the state-mutating write; confirm
    # AFTER the -1 stamp closes the verify->stamp claim window
    verify_claim(spark, meta_dir, token)
    write_meta(-1)
    confirm_claim(spark, meta_dir, token)
    (assigned.write.mode("append").partitionBy("cell")
     .parquet(f"{path}/lists"))
    write_meta(INDEX_FORMAT_VERSION)
    release_claim(spark, meta_dir, token, sweep=True)


def ivf_index_delete(spark, path: str, ids: DataFrame,
                     id_col: str = "vec_id") -> None:
    """Takedown support for the IVF index (see ``lsh_index_delete`` — same
    rationale): remove vectors by id from the inverted lists. Centroids
    are untouched (they are statistics, not documents — the next
    ``ivf_index_rebalance`` re-fits them over the survivors); the lists
    are anti-joined against the (broadcast) delete set and rewritten
    under the meta sentinel, preserving the cell partitioning. Idempotent
    for absent ids. No-op on a cold (empty) index.

    The at-rest lists are read and checkpointed UNDER the writer claim
    (claim first, then read — the append discipline): reading before the
    claim opens a lost-update window where an append that commits between
    the checkpoint and the claim is silently erased by the overwrite.
    The claim keeps the version valid (probes serve through the anti-join
    phase); only the rewrite itself is bracketed by ``-1``."""
    from pyspark.errors import AnalysisException

    _check_index_version(spark, path)
    write_meta = _ivf_meta_writer(spark, path)
    del_ids = ids.select(F.col(id_col).alias(id_col)).distinct()
    meta_dir = f"{path}/meta"
    token = claim_sentinel(spark, meta_dir)
    try:
        try:
            lists = spark.read.parquet(f"{path}/lists")
        except AnalysisException:
            # cold start: nothing to delete
            release_claim(spark, meta_dir, token)
            return
        # id-type gate (the LSH delete discipline): a delete set whose id
        # type differs from the at-rest lists silently matches NOTHING in
        # the anti-join — the takedown would "succeed" removing zero rows
        at_rest = lists.schema[id_col].dataType.simpleString()
        incoming = del_ids.schema[id_col].dataType.simpleString()
        if at_rest != incoming:
            raise ValueError(
                f"IVF index at {path} stores {id_col} as {at_rest}; a "
                f"delete set with {incoming} ids would silently match "
                "nothing (cast the ids first)")
        lists = (lists.join(F.broadcast(del_ids), id_col, "left_anti")
                 .localCheckpoint(eager=True))
        from thewhisperdb_spark.operators.indexmeta import (
            parquet_row_count)
        n_cells = parquet_row_count(spark, f"{path}/centroids")
    except Exception:
        release_claim(spark, meta_dir, token)      # nothing written
        raise
    verify_claim(spark, meta_dir, token)
    write_meta(-1)
    confirm_claim(spark, meta_dir, token)
    (lists.repartition(max(int(n_cells), 1), "cell")
     .write.mode("overwrite").partitionBy("cell")
     .parquet(f"{path}/lists"))
    write_meta(INDEX_FORMAT_VERSION)
    release_claim(spark, meta_dir, token, sweep=True)


def ivf_index_stats(spark, path: str) -> DataFrame:
    """Operational health of a persisted IVF index, as one row — the
    measurement behind the rebalance-cadence knob (PLANS.md): ``skew`` =
    max cell size / median cell size is THE append-drift indicator (a
    shifted corpus piles into hot cells; rebalance when skew degrades),
    and ``n_empty_cells`` shows centroids stranded by drift. Aggregates
    ride the at-rest partitioned lists. Returns (n_cells, n_vectors,
    max_cell, median_cell, skew, n_empty_cells)."""
    from pyspark.errors import AnalysisException

    _check_index_version(spark, path)
    try:
        from thewhisperdb_spark.operators.indexmeta import (
            parquet_row_count)
        n_cents = parquet_row_count(spark, f"{path}/centroids")
        per_cell = (spark.read.parquet(f"{path}/lists")
                    .groupBy("cell").agg(F.count(F.lit(1)).alias("n")))
    except AnalysisException:
        # cold start: an index built over an EMPTY corpus has no parquet
        # parts to infer from (no centroids, no lists) — a valid index
        # whose health row is all zeros, not an error
        return spark.createDataFrame(
            [(0, 0, 0, 0, 1.0, 0)],
            "n_cells long, n_vectors long, max_cell long, "
            "median_cell long, skew double, n_empty_cells long")
    # coalesce to 0 / skew 1.0: an index whose lists are empty (cold
    # start) reports zeros, not NULLs
    return per_cell.agg(
        F.count(F.lit(1)).alias("n_nonempty"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("n_vectors"),
        F.coalesce(F.max("n"), F.lit(0)).alias("max_cell"),
        F.coalesce(F.percentile_approx("n", 0.5), F.lit(0))
        .alias("median_cell"),
    ).select(
        F.lit(n_cents).alias("n_cells"), "n_vectors", "max_cell",
        "median_cell",
        F.when(F.col("median_cell") > 0,
               F.col("max_cell").cast("double") / F.col("median_cell"))
        .otherwise(F.lit(1.0)).alias("skew"),
        (F.lit(n_cents) - F.col("n_nonempty")).cast("long")
        .alias("n_empty_cells"))


def ivf_index_rebalance(spark, path: str, max_iter: int = 3,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> None:
    """The rebuild-cadence knob made concrete: counter the centroid drift
    that ``ivf_index_append`` accepts (appended deltas are assigned to
    STALE centroids, so a shifted corpus piles into a few hot cells,
    degrading both probe recall and partition balance).

    Refines the centroids with ``max_iter`` Lloyd steps over the CURRENT
    corpus, warm-started from the existing centroids (cell ids are
    preserved — no re-init, so a mild drift converges in 1-2 cheap
    rounds), then rewrites the inverted lists under the refreshed
    assignment via ``ivf_index_build`` — inheriting its meta-sentinel
    protocol, so a rebalance that dies mid-rewrite leaves an index that
    loudly fails the version gate. The corpus is localCheckpointed first
    (the rewrite cannot stream from the files it overwrites). Ids and
    row count are preserved exactly; only cell membership moves.

    CLAIM-FIRST like every other mutation (code-review r8): the corpus
    read/checkpoint and the multi-iteration Lloyd refinement — the
    LONGEST delta window of any index mutation — run under the writer
    claim, so an append committing mid-rebalance either loses its own
    claim or makes this rebalance lose its re-verify; a rebalance that
    read before claiming would silently erase that append in its
    overwrite. Probes keep serving throughout (the claim keeps the
    version valid; only ivf_index_build's rewrite brackets with -1)."""
    from pyspark.errors import AnalysisException

    _check_index_version(spark, path)
    write_meta = _ivf_meta_writer(spark, path)
    meta_dir = f"{path}/meta"
    token = claim_sentinel(spark, meta_dir)
    try:
        try:
            cents = spark.read.parquet(f"{path}/centroids")
            init = [(int(r["cell"]), list(r["cvec"]))
                    for r in cents.collect()]
            corpus = (spark.read.parquet(f"{path}/lists")
                      .select(id_col, vec_col).localCheckpoint(eager=True))
        except AnalysisException:
            # cold start: nothing to rebalance, index left untouched
            release_claim(spark, meta_dir, token)
            return
        refreshed = kmeans_fit(corpus, k=len(init), max_iter=max_iter,
                               id_col=id_col, vec_col=vec_col, init=init)
        refreshed = refreshed.localCheckpoint(eager=True)
    except Exception:
        release_claim(spark, meta_dir, token)      # nothing written
        raise
    # stamp -1 HERE (ivf_index_build re-stamps it, harmlessly) so the
    # confirm runs after the invalidate — same verify->stamp->confirm
    # discipline as every other mutation
    verify_claim(spark, meta_dir, token)
    write_meta(-1)
    confirm_claim(spark, meta_dir, token)
    ivf_index_build(corpus, path, n_cells=len(init), id_col=id_col,
                    vec_col=vec_col, centroids=refreshed)
    release_claim(spark, meta_dir, token, sweep=True)
