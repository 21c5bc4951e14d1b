"""Measured SKEWED 10x scale point (VERDICT r8 item 1).

The r8 probe (tools/scale_probe.py) measured 10x/100x exponents on corpora
that are uniform BY CONSTRUCTION: zero cross-copy shingle overlap, constant
cluster sizes, per-copy-identical topology. Real 100 TB crawls are
power-law. This probe re-measures the skew-guarded kernels on corpora
built to hit each guard where the uniform probe could not:

- **hot-shingle documents**: the scale_probe marker-interleave transform
  (cross-copy shingle sets never collide) PLUS one global boilerplate
  sentence appended to 30% of docs — its word-5-grams have df = 0.3*N,
  the stop-shingle regime where the naive inverted-index join costs
  sum(df^2) = O(N^2). Probes ``minhash_lsh_dedup`` and
  ``containment_dedup_pairs`` (the ``max_df`` cap + exact re-score,
  ``operators/dedup.py:_shingle_cooccurrence``).
- **Zipf-degree graph** (rank-1 out-degrees, degree-distribution exponent
  ~2): node of rank r gets ceil(C/r) stubs to uniform targets — the hub
  touches most of the graph and its degree grows 10x with the corpus.
  Probes the 5 iterative kernels plus degree-ordered triangles
  (``operators/graph.py:173``) and the sort-based h-index coreness
  (``graph.py:350``).
- **mega-cluster embeddings**: the scale_probe clustered corpus with 30%
  of all vectors moved into ONE broad blob (noise sigma 1.8, so typical
  intra-blob cosine ~0.24 stays under the 0.45 pair threshold — the work
  is skewed, not the answer). Probes ``semantic_dedup_pairs``' two
  composed guards: k-means carving (k scales with n) and the
  ``block_rows`` block-pair split (``operators/dedup.py:450``).

Besides the wall-clock exponent (same protocol as scale_probe: one
session, warm-up + median of 3, 1x immediately followed by 10x), each
probe records TASK-LEVEL skew at 10x from the Spark UI REST API: for
every stage the probe ran with >= 8 tasks and a max task >= 200 ms,
``max task time / median task time`` — the straggler factor the wall
clock alone can hide (a stage is as slow as its fattest task). The
verdict gate: no super-linear exponent AND no unbounded task blowup.

Usage: python tools/skew_probe.py [--copies 10] [--out SKEW_PROBE.json]
       [--only probe1,probe2]
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

import scale_probe as SP  # noqa: E402  (build_documents/_union_all reuse)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/whisper_skew"
UI_PORT = 4055
BOILERPLATE = ("subscribe to our newsletter for updates and follow us on "
               "social media for the latest news terms of service apply "
               "copyright all rights reserved contact the webmaster")


def get_ui_spark():
    """scale_probe session settings, but with the UI on so the REST API
    can report per-task quantiles (the straggler metric)."""
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count()
    return (
        SparkSession.builder.appName("skew_probe")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold",
                str(64 * 1024 * 1024))
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.retainedStages", "5000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate())


# ---------------------------------------------------------------- corpora

def build_hot_shingle_documents(spark, out_dir: str, copies: int) -> None:
    """scale_probe's marker-interleaved documents (cross-copy overlap = 0
    by construction) + the SAME marker-free boilerplate sentence appended
    to a hash-selected 30% of every copy's docs. Boilerplate shingle df
    is 0.3*N at either scale — over any sane max_df, and growing 10x."""
    SP.SRC = SRC
    SP.build_documents(spark, out_dir, copies)
    base = spark.read.parquet(f"{out_dir}/documents.parquet")
    hot = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(31)), F.lit(10)) < 3
    txt = F.when(hot, F.concat_ws(" ", F.col("text"), F.lit(BOILERPLATE))) \
        .otherwise(F.col("text"))
    out = base.select(
        "doc_id", "lang", "source",
        F.length(txt).cast(dict(base.dtypes)["n_chars"]).alias("n_chars"),
        txt.alias("text")).localCheckpoint(eager=True)
    (out.repartition(32).write.mode("overwrite")
     .parquet(f"{out_dir}/documents.parquet"))


def build_zipf_graph(spark, out_dir: str, copies: int,
                     n_base: int = 2000, e_per_node: int = 10) -> None:
    """Rank-r node gets ceil(C/r) out-stubs to uniform targets (C sized so
    |E| ~ e_per_node * N): a Zipf(1) out-degree sequence = power-law
    degree distribution with exponent ~2. The rank-1 hub's degree grows
    10x with the corpus — the uniform probe's per-copy-identical topology
    could never produce that."""
    n = n_base * copies
    harmonic = sum(1.0 / r for r in range(1, n + 1))
    c = max(1, int(e_per_node * n / harmonic))
    nodes = spark.range(n)
    deg = F.greatest(
        F.lit(1),
        F.ceil(F.lit(c) / (F.col("id") + 1)).cast("int"))
    edges = (nodes
             .select(F.col("id").alias("src"),
                     F.explode(F.sequence(F.lit(1), deg)).alias("s"))
             .select("src",
                     F.pmod(F.xxhash64("src", "s", F.lit(99)),
                            F.lit(n)).alias("dst"))
             .filter(F.col("src") != F.col("dst"))
             .distinct())
    (edges.repartition(32).write.mode("overwrite")
     .parquet(f"{out_dir}/edges.parquet"))
    (nodes.select(F.col("id")).repartition(32)
     .write.mode("overwrite").parquet(f"{out_dir}/nodes.parquet"))


def build_megacluster_embeddings(spark, out_dir: str, copies: int,
                                 n_base: int = 2000, dim: int = 64,
                                 clusters_per_base: int = 40) -> None:
    """scale_probe's cluster-structured corpus (cluster COUNT scales with
    n, size constant) with 30% of ALL vectors re-rooted onto ONE shared
    blob center with noise sigma 1.8: typical intra-blob cosine
    ~1/(1+sigma^2) ~ 0.24 < the 0.45 pair threshold, so the blob skews
    the WORK (one region holding 0.3n rows) without making the answer
    quadratic."""
    n = n_base * copies
    k = clusters_per_base * copies
    ids = spark.range(n).repartition(32)
    in_blob = F.pmod(F.xxhash64(F.col("id"), F.lit(5)), F.lit(10)) < 3
    cl = F.when(in_blob, F.lit(-1)).otherwise(
        F.pmod(F.xxhash64(F.col("id"), F.lit(777)), F.lit(k)))
    sigma = F.when(in_blob, F.lit(1.8)).otherwise(F.lit(0.25))

    def comp(j):
        center = (F.pmod(F.xxhash64(cl, j, F.lit(1)), F.lit(2001))
                  - F.lit(1000)).cast("double") / 1000.0
        noise = (F.pmod(F.xxhash64(F.col("id"), j, F.lit(2)), F.lit(2001))
                 - F.lit(1000)).cast("double") / 1000.0
        return center + sigma * noise

    raw = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), comp)
    norm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x))
    emb = F.transform(raw, lambda x: (x / norm).cast("float"))
    (ids.select(F.col("id").alias("vec_id"), emb.alias("embedding"))
     .write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet"))


PROBE_INPUTS = {
    "minhash_lsh_dedup": "documents",
    "containment_dedup_pairs": "documents",
    "cc_kernel": "graph", "pagerank_kernel": "graph",
    "bfs_kernel": "graph", "lpa_kernel": "graph", "core_kernel": "graph",
    "triangle_kernel": "graph",
    "semantic_pairs_kernel": "embeddings",
}


def build_dir(spark, copies: int, needs: set | None = None) -> str:
    out_dir = f"{ROOT}/x{copies}"
    needs = needs or {"documents", "graph", "embeddings"}
    if "documents" in needs:
        build_hot_shingle_documents(spark, out_dir, copies)
    if "graph" in needs:
        build_zipf_graph(spark, out_dir, copies)
    if "embeddings" in needs:
        build_megacluster_embeddings(spark, out_dir, copies)
    return out_dir


def probes(spark, d: str, copies: int) -> dict:
    import __spark_entry__ as entrymod

    from thewhisperdb_spark.operators import dedup as D
    from thewhisperdb_spark.operators import graph as G

    qs = entrymod.queries()
    out = {k: (lambda k=k: qs[k](spark, d))
           for k in ("minhash_lsh_dedup", "containment_dedup_pairs")}

    def edges():
        return spark.read.parquet(f"{d}/edges.parquet")

    def nodes():
        return spark.read.parquet(f"{d}/nodes.parquet")

    out["cc_kernel"] = lambda: G.connected_components(nodes(), edges())
    out["pagerank_kernel"] = lambda: G.pagerank(nodes(), edges(), n_iter=10)
    # source 0 IS the hub: the very first frontier is the whole hot
    # neighborhood, the worst case for the per-hop expansion join
    out["bfs_kernel"] = lambda: G.bfs_levels(edges(), source=0, max_iter=15)
    out["lpa_kernel"] = lambda: G.label_propagation(nodes(), edges())
    out["core_kernel"] = lambda: G.core_numbers(edges())
    out["triangle_kernel"] = lambda: G.triangle_count(edges())
    out["semantic_pairs_kernel"] = lambda: D.semantic_dedup_pairs(
        spark.read.parquet(f"{d}/embeddings.parquet")
        .select("vec_id", "embedding"),
        threshold=0.45, k=8 * copies, max_iter=3)
    return out


# ------------------------------------------------------- task-skew (REST)

def _rest(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=15) as r:
        return json.loads(r.read())


def _app_id() -> str:
    return _rest("applications")[0]["id"]


def _completed_stage_keys(app: str) -> set:
    return {(s["stageId"], s["attemptId"])
            for s in _rest(f"applications/{app}/stages?status=complete")}


def task_skew(app: str, before: set) -> dict:
    """max/median task runtime over the probe's own completed stages,
    restricted to stages with >= 8 tasks and a max task >= 200 ms (below
    that, scheduling jitter dominates and the ratio is noise)."""
    worst = {"stage_skew": 0.0, "max_task_sec": 0.0, "n_stages": 0}
    for s in _rest(f"applications/{app}/stages?status=complete"):
        key = (s["stageId"], s["attemptId"])
        if key in before or s.get("numCompleteTasks", 0) < 8:
            continue
        try:
            q = _rest(f"applications/{app}/stages/{key[0]}/{key[1]}/"
                      "taskSummary?quantiles=0.5,1.0")
        except Exception:
            continue  # evicted stage data: skip, never fail the probe
        med, mx = q["executorRunTime"]
        if mx < 200.0:
            continue
        worst["n_stages"] += 1
        ratio = mx / max(med, 50.0)
        if ratio > worst["stage_skew"]:
            worst["stage_skew"] = round(ratio, 2)
        worst["max_task_sec"] = max(worst["max_task_sec"],
                                    round(mx / 1000.0, 2))
    return worst


def _median_time(mk, runs: int = 3, warmup: bool = True) -> float:
    if warmup:
        mk().count()
    ts = []
    for _ in range(runs):
        t0 = time.time()
        mk().count()
        ts.append(time.time() - t0)
    return round(statistics.median(ts), 3)


def main():
    copies, out_path, only = 10, "SKEW_PROBE.json", None
    args = sys.argv[1:]
    if "--copies" in args:
        copies = int(args[args.index("--copies") + 1])
    if copies < 2:
        raise SystemExit("--copies must be >= 2")
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    if "--only" in args:
        only = set(args[args.index("--only") + 1].split(","))

    spark = get_ui_spark()
    spark.sparkContext.setLogLevel("ERROR")
    needs = ({PROBE_INPUTS[n] for n in only} if only else None)
    print("building skewed corpora ...", file=sys.stderr)
    d1 = build_dir(spark, 1, needs)
    d10 = build_dir(spark, copies, needs)
    try:
        app = _app_id()
    except Exception:
        app = None
        print("WARN: UI REST unavailable — exponents only", file=sys.stderr)

    results = {}
    p1, p10 = probes(spark, d1, 1), probes(spark, d10, copies)
    if only:
        p1 = {k: v for k, v in p1.items() if k in only}
        p10 = {k: v for k, v in p10.items() if k in only}
    for name in p1:
        spark.sparkContext._jvm.System.gc()
        t1 = _median_time(p1[name])
        p10[name]().count()                        # warm-up OUTSIDE the
        before = _completed_stage_keys(app) if app else set()   # snapshot:
        # cold-run JIT/Arrow tasks would otherwise pollute the straggler
        # metric with first-call costs that are not data skew
        t10 = _median_time(p10[name], warmup=False)
        skew = task_skew(app, before) if app else {}
        exp = round(math.log(max(t10, 1e-3) / max(t1, 1e-3))
                    / math.log(copies), 2)
        results[name] = {"t_1x": t1, f"t_{copies}x": t10,
                         "ratio": round(t10 / max(t1, 1e-3), 2),
                         "exponent": exp, **skew}
        print(f"# {name}: {t1}s -> {t10}s  exp {exp}  "
              f"task_skew {skew.get('stage_skew')} "
              f"max_task {skew.get('max_task_sec')}s", file=sys.stderr)
    payload = {"metric": "skew_probe", "copies": copies, "sf_base": 0.1,
               "hot_doc_fraction": 0.3, "zipf_exponent": 2,
               "blob_fraction": 0.3, "results": results}
    here = os.path.dirname(HERE)
    with open(os.path.join(here, out_path), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"metric": "skew_probe", "copies": copies,
                      "n_probes": len(results)}))


if __name__ == "__main__":
    main()
