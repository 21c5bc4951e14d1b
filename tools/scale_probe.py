"""Measured 10x scale point for the heaviest kernels (VERDICT r7 item 1).

Every 100x-scale claim in SURVEY/BASELINE previously rested on plan shape
and asymptotics alone; this probe adds the second MEASURED data point.
Protocol (BASELINE.md noise rules): everything in ONE session, per probe
one warm-up then median of 3 timed full executions, 1x immediately
followed by 10x so the pair is same-JVM comparable; the scaling exponent
is log10(t10/t1) — 1.0 = perfectly linear in data, < 1 = latency/overhead
bound at this size, > 1 = super-linear (needs a named cause or a fix).

The 10x corpora are self-consistent transforms of sf0.1 (both scale
points run the SAME transform, so per-row work is identical by
construction):

- documents: each copy c interleaves a copy-specific marker token every 4
  words — every word-5-gram (and 8-gram) contains a marker, so shingle
  sets NEVER collide across copies (cross-copy Jaccard = 0) while
  within-copy near-dup structure is preserved. Dedup workload therefore
  scales linearly in copies, not quadratically via fabricated dup cliques.
- lineitem: l_orderkey offset per copy (baskets/quantile samples scale
  linearly; partkeys shared so co-occurrence pair counts scale in rows).
- embeddings: freshly generated cluster-structured vectors (seeded
  xxhash64 centers + noise, unit-norm) at n and 10n with cluster COUNT
  scaled with n (constant cluster size — the honest operating point: a
  10x corpus gets 10x IVF cells / k-means clusters, not 10x-fat cells).
- graph kernels: the REAL sf0.1 similarity edge set, materialized once,
  then 10 id-offset copies — 10x vertices, 10x edges, identical per-copy
  topology (so iteration counts match and only the data term scales).

Usage:  python tools/scale_probe.py [--copies 10] [--out SCALE_PROBE.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/whisper_scale"
COS_EDGE_THRESHOLD = 0.35  # __spark_entry__.py's similarity-graph edge rule


def _union_all(frames):
    return reduce(lambda a, b: a.unionByName(b), frames)


def build_documents(spark, out_dir: str, copies: int) -> None:
    base = spark.read.parquet(f"{SRC}/documents.parquet")
    outs = []
    for c in range(copies):
        salt = F.lit(f"zq{c}x")
        tk = F.split(F.col("text"), " ")
        n4 = F.ceil(F.size(tk) / F.lit(4)).cast("int")
        chunks = F.transform(
            F.sequence(F.lit(0), F.greatest(n4 - F.lit(1), F.lit(0))),
            lambda i: F.concat_ws(
                " ", F.concat(F.slice(tk, i * F.lit(4) + F.lit(1), 4),
                              F.array(salt))))
        txt = F.array_join(chunks, " ")
        outs.append(base.select(
            (F.col("doc_id") + F.lit(c * 1_000_000)).alias("doc_id"),
            F.col("lang"), F.col("source"),
            F.length(txt).cast(dict(base.dtypes)["n_chars"])
            .alias("n_chars"),
            txt.alias("text")))
    (_union_all(outs).repartition(32)
     .write.mode("overwrite").parquet(f"{out_dir}/documents.parquet"))


def build_lineitem(spark, out_dir: str, copies: int) -> None:
    base = spark.read.parquet(f"{SRC}/lineitem.parquet")
    cols = [c for c in base.columns if c != "l_orderkey"]
    outs = [base.select(
        (F.col("l_orderkey") + F.lit(c * 100_000_000)).alias("l_orderkey"),
        *cols) for c in range(copies)]
    (_union_all(outs).repartition(32)
     .write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet"))


def build_embeddings(spark, out_dir: str, copies: int,
                     n_base: int = 2000, dim: int = 64,
                     clusters_per_base: int = 40) -> None:
    n = n_base * copies
    k = clusters_per_base * copies      # constant cluster SIZE across scales
    ids = spark.range(n).repartition(32)
    cl = F.pmod(F.xxhash64(F.col("id"), F.lit(777)), F.lit(k))

    def comp(j):
        center = (F.pmod(F.xxhash64(cl, j, F.lit(1)), F.lit(2001))
                  - F.lit(1000)).cast("double") / 1000.0
        noise = (F.pmod(F.xxhash64(F.col("id"), j, F.lit(2)), F.lit(2001))
                 - F.lit(1000)).cast("double") / 1000.0
        return center + F.lit(0.25) * noise

    raw = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), comp)
    norm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x))
    emb = F.transform(raw, lambda x: (x / norm).cast("float"))
    (ids.select(F.col("id").alias("vec_id"), emb.alias("embedding"),
                cl.cast("int").alias("label"))
     .write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet"))


def build_graph(spark, out_dir: str, copies: int) -> None:
    """Materialize the REAL sf0.1 similarity graph once, then id-offset
    copies — the kernels' input scales in data while topology (and thus
    iteration counts) stays per-copy identical."""
    from thewhisperdb_spark.operators import vectors as V

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet") \
        .select("vec_id", "embedding")
    pairs = V.similar_pairs(emb, COS_EDGE_THRESHOLD) \
        .select("a", "b").localCheckpoint(eager=True)
    nodes = emb.select(F.col("vec_id").alias("id"))
    e_out = [pairs.select((F.col("a") + F.lit(c * 1_000_000)).alias("a"),
                          (F.col("b") + F.lit(c * 1_000_000)).alias("b"))
             for c in range(copies)]
    n_out = [nodes.select((F.col("id") + F.lit(c * 1_000_000)).alias("id"))
             for c in range(copies)]
    (_union_all(e_out).repartition(32)
     .write.mode("overwrite").parquet(f"{out_dir}/edges.parquet"))
    (_union_all(n_out).repartition(32)
     .write.mode("overwrite").parquet(f"{out_dir}/nodes.parquet"))


# which input each probe consumes — lets --only builds skip unused tables
PROBE_INPUTS = {
    "minhash_lsh_dedup": "documents", "winnowing_fingerprints": "documents",
    "decontaminate_train_test": "documents",
    "containment_dedup_pairs": "documents",
    "price_quantiles_kmv_sample": "lineitem",
    "part_cooccurrence_top": "lineitem", "ivf_knn": "embeddings",
    "cc_kernel": "graph", "pagerank_kernel": "graph", "bfs_kernel": "graph",
    "lpa_kernel": "graph", "core_kernel": "graph",
    "semantic_pairs_kernel": "embeddings",
    "dhash_pairs_kernel": "documents",
    "psl_match_kernel": "documents",
    "crawl_curation_kernel": "documents",
    "video_clip_kernel": "documents",
    "langid_buckets_kernel": "documents",
}


def build_dir(spark, copies: int, needs: set | None = None) -> str:
    out_dir = f"{ROOT}/x{copies}"
    needs = needs or {"documents", "lineitem", "embeddings", "graph"}
    if "documents" in needs:
        build_documents(spark, out_dir, copies)
    if "lineitem" in needs:
        build_lineitem(spark, out_dir, copies)
    if "embeddings" in needs:
        build_embeddings(spark, out_dir, copies)
    if "graph" in needs:
        build_graph(spark, out_dir, copies)
    return out_dir


def _median_time(mk, runs: int = 3) -> float:
    mk().count()                         # warm-up
    ts = []
    for _ in range(runs):
        t0 = time.time()
        mk().count()
        ts.append(time.time() - t0)
    return round(statistics.median(ts), 3)


def probes(spark, d: str, copies: int) -> dict:
    """name -> zero-arg DataFrame factory over scale dir ``d``."""
    import __spark_entry__ as entrymod

    from thewhisperdb_spark.operators import dedup as D
    from thewhisperdb_spark.operators import graph as G

    qs = entrymod.queries()
    reg = ["minhash_lsh_dedup", "winnowing_fingerprints",
           "decontaminate_train_test", "containment_dedup_pairs",
           "price_quantiles_kmv_sample", "part_cooccurrence_top", "ivf_knn"]
    out = {k: (lambda k=k: qs[k](spark, d)) for k in reg}

    def edges():
        return spark.read.parquet(f"{d}/edges.parquet").select(
            F.col("a").alias("src"), F.col("b").alias("dst"))

    def nodes():
        return spark.read.parquet(f"{d}/nodes.parquet")

    out["cc_kernel"] = lambda: G.connected_components(nodes(), edges())
    out["pagerank_kernel"] = lambda: G.pagerank(nodes(), edges(), n_iter=10)
    out["bfs_kernel"] = lambda: G.bfs_levels(edges(), source=0, max_iter=15)
    out["lpa_kernel"] = lambda: G.label_propagation(nodes(), edges())
    out["core_kernel"] = lambda: G.core_numbers(edges())
    # operating-point scaling: cluster COUNT grows with the corpus
    # (constant cluster size), the 100 TB posture — Σ|c|²·d stays linear
    out["semantic_pairs_kernel"] = lambda: D.semantic_dedup_pairs(
        spark.read.parquet(f"{d}/embeddings.parquet")
        .select("vec_id", "embedding"),
        threshold=0.45, k=8 * copies, max_iter=3)

    def dhash_pairs():
        # perceptual dedup (r9): deterministic raster render -> 64-bit
        # dHash (Arrow mapInPandas, embarrassingly parallel) -> 5-band
        # multi-index-hamming join. The marker-salted copies give
        # near-random cross-copy hashes, so the candidate term scales as
        # bands * n^2 / 2^~12.8 — the probe measures where the linear
        # decode and the quadratic-with-tiny-constant join cross over.
        from thewhisperdb_spark.operators.imagededup import (
            hamming_near_dup_pairs, image_dhash)
        from thewhisperdb_spark.sources.multimodal import (
            deterministic_fake_decoder)
        docs = spark.read.parquet(f"{d}/documents.parquet")
        media = docs.select(
            F.format_string("%09d", "doc_id").alias("path"),
            F.encode("text", "utf-8").alias("content"),
            F.lit("image").alias("modality"))
        return hamming_near_dup_pairs(
            image_dhash(media, decoder=deterministic_fake_decoder),
            max_hamming=4)

    out["dhash_pairs_kernel"] = dhash_pairs

    def psl_match():
        # PSL eTLD+1 grouping (r10): every doc mints a DISTINCT host
        # (the distinct-host explosion is the work term — crawls repeat
        # hosts, so this is the adversarial operating point) across the
        # four rule classes (private / multi-part / wildcard / default).
        from thewhisperdb_spark.operators.psl import (
            load_psl, with_registrable_domain)
        docs = spark.read.parquet(f"{d}/documents.parquet")
        suf = F.element_at(
            F.array(F.lit("github.io"), F.lit("example.co.uk"),
                    F.lit("site.bd"), F.lit("example.zz")),
            (F.col("doc_id") % 4 + 1).cast("int"))
        hosts = docs.select(F.concat(
            F.lit("h"), F.col("doc_id").cast("string"), F.lit("."),
            suf).alias("host"))
        return with_registrable_domain(hosts, load_psl(spark))

    out["psl_match_kernel"] = psl_match

    def crawl_curation():
        # the r10 composite: WARC synth -> explode -> html_extract ->
        # url features -> blocklist -> cap. Row-linear stages throughout;
        # the probe pins that the applyInPandas archive packing and the
        # window cap stay linear as archives and domains both grow 10x.
        import pandas as pd

        from thewhisperdb_spark.operators.htmltext import html_extract
        from thewhisperdb_spark.operators.sampling import per_stratum_cap
        from thewhisperdb_spark.operators.urls import url_features
        from thewhisperdb_spark.sources import warc as W
        docs = spark.read.parquet(f"{d}/documents.parquet")
        html = F.concat(F.lit("<html><body><p>"), F.col("text"),
                        F.lit("</p></body></html>"))
        url = F.concat(F.lit("https://h"),
                       (F.col("doc_id") % (200 * copies)).cast("string"),
                       F.lit(".example.com/p/"),
                       F.col("doc_id").cast("string"))
        pages = docs.select("doc_id", url.alias("url"),
                            html.alias("html"),
                            (F.col("doc_id") % (12 * copies))
                            .alias("archive"))

        def pack(key, pdf):
            pdf = pdf.sort_values("doc_id")
            recs = [W.build_warc_record(
                "response", W.build_http_response(r["html"].encode()),
                target_uri=r["url"]) for _, r in pdf.iterrows()]
            return pd.DataFrame({"path": [f"mem://a{key[0]}"],
                                 "content": [W.build_warc(recs)]})

        records = pages.groupBy("archive").applyInPandas(
            pack, "path string, content binary")
        ex = html_extract(
            W.explode_warc(records)
            .filter(F.col("status") == "ok")
            .withColumn("html", F.col("payload").cast("string")),
            html_col="html", id_col="target_uri")
        feats = url_features(
            ex.filter(F.length("text") > 0)
            .withColumnRenamed("doc_id", "url"), url_col="url")
        return per_stratum_cap(
            feats.withColumn("n_chars", F.length("text")),
            strata_col="registrable_domain", cap=6, order_col="n_chars",
            id_col="url")

    out["crawl_curation_kernel"] = crawl_curation

    def video_clip():
        # clip-level video dedup (r11): the probe measures the CLIP
        # JOIN kernel (fingerprint pack -> sub-band candidates ->
        # hamming verify -> containment), not the codec — frame hashing
        # is embarrassingly parallel and measured by dhash_pairs.
        # Frame-hash sequences are minted JVM-side: 6 xxhash64 frames
        # per doc (near-random cross-doc, the adversarial point for the
        # 5-bit sub-slices), plus a 3-bit-drifted "re-encode" copy for
        # every 4th doc — so the candidate term carries both the
        # quadratic-with-tiny-constant random collisions and the real
        # matches.
        from thewhisperdb_spark.operators.imagededup import (
            video_clip_near_dup_pairs)
        docs = spark.read.parquet(f"{d}/documents.parquet")
        frames = docs.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(5))).alias("frame_idx"))
        h = F.xxhash64("doc_id", "frame_idx")
        base = frames.select(
            F.format_string("o%012d", "doc_id").alias("path"),
            "frame_idx", h.alias("dhash"))

        def flip(seed):
            # DataFrame shiftleft() wants a literal bit count; the SQL
            # form takes a column
            return F.expr(
                f"shiftleft(1L, cast(pmod(xxhash64({seed}L, doc_id, "
                "frame_idx), 63) as int))")

        drift = flip(1).bitwiseOR(flip(2)).bitwiseOR(flip(3))
        cop = (frames.filter(F.col("doc_id") % 4 == 0)
               .select(F.format_string("c%012d", "doc_id").alias("path"),
                       "frame_idx",
                       h.bitwiseXOR(drift).alias("dhash")))
        allf = base.unionByName(cop).withColumn("status", F.lit("ok"))
        return video_clip_near_dup_pairs(allf)

    out["video_clip_kernel"] = video_clip

    def langid_buckets():
        # profile langID + CCNet buckets (r12): scoring is explode ->
        # broadcast profile join -> doc-keyed aggregate -> argmin, then
        # the bucket cuts run over the compressed (lang, score)
        # histogram. Both stages should scale linearly in corpus rows
        # with a constant broadcast term — the probe pins that the
        # histogram window (NOT a per-doc sort) keeps the 10x point on
        # the data-linear line.
        from thewhisperdb_spark.operators.langid import (
            language_id_profile, perplexity_buckets)
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return perplexity_buckets(language_id_profile(docs))

    out["langid_buckets_kernel"] = langid_buckets
    return out


def main():
    copies = 10
    out_path = "SCALE_PROBE.json"
    only = None
    args = sys.argv[1:]
    if "--copies" in args:
        copies = int(args[args.index("--copies") + 1])
    if copies < 2:
        raise SystemExit("--copies must be >= 2 (the exponent divides by "
                         "log(copies)); use the unit tests for smoke runs")
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    if "--only" in args:
        only = set(args[args.index("--only") + 1].split(","))

    from thewhisperdb_spark.session import get_spark
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    import math
    needs = ({PROBE_INPUTS[n] for n in only} if only else None)
    print("building scale dirs ...", file=sys.stderr)
    d1 = build_dir(spark, 1, needs)
    d10 = build_dir(spark, copies, needs)
    results = {}
    p1, p10 = probes(spark, d1, 1), probes(spark, d10, copies)
    if only:
        p1 = {k: v for k, v in p1.items() if k in only}
        p10 = {k: v for k, v in p10.items() if k in only}
    for name in p1:
        spark.sparkContext._jvm.System.gc()
        t1 = _median_time(p1[name])
        t10 = _median_time(p10[name])
        exp = round(math.log(max(t10, 1e-3) / max(t1, 1e-3))
                    / math.log(copies), 2)
        results[name] = {"t_1x": t1, f"t_{copies}x": t10,
                         "ratio": round(t10 / max(t1, 1e-3), 2),
                         "exponent": exp}
        print(f"# {name}: {t1}s -> {t10}s  ratio {t10/max(t1,1e-3):.1f} "
              f"exp {exp}", file=sys.stderr)
    payload = {"metric": "scale_probe", "copies": copies, "sf_base": 0.1,
               "results": results}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, out_path), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"metric": "scale_probe", "copies": copies,
                      "n_probes": len(results)}))


if __name__ == "__main__":
    main()
