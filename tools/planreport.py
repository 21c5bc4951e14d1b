"""Dump `explain("formatted")` physical plans of the bench headline queries
to PLANS.md — the audit trail for the scale-design claims (pushed filters,
pruned read schemas, broadcast-vs-shuffle choices, WholeStageCodegen spans).

Usage: python tools/planreport.py [sf_dir] [out_md]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
KNOB_INDEX = """## Cluster tuning knobs (the one-page index)

`session.py` pins the session-wide posture — AQE + skew-join handling +
post-shuffle coalescing, `spark.sql.shuffle.partitions` = cores (override to
~2-3x total executor cores on a cluster), 64 MiB autoBroadcast threshold,
Arrow for the pandas-UDF stages. Per-operator knobs, all plumbed as Python
arguments (no config-file indirection), and what to move at 100 TB:

| Operator (where) | Knob(s) | Default | At 100 TB |
|---|---|---|---|
| MinHash LSH dedup (`operators/dedup.py:minhash_lsh_pairs`) | `n_hashes`, `bands` (rows/band = n_hashes/bands sets the S-curve), `threshold` | 64 hashes, 16 bands | more bands -> more recall + bigger candidate join; keep rows/band >= 4 so buckets stay selective; candidate join is banded equi-join, AQE handles skewed buckets |
| N-gram Jaccard dedup (`dedup.py:shingle_jaccard_pairs`) | `n` (shingle width), `threshold`, `max_df` hot-shingle cap | 3-gram, 0.9, max_df off | SET `max_df` first (100-1000): it bounds the co-occurrence join fan-out (a shingle in d docs mints d^2 pairs) at a provably-zero recall cost for pairs under the threshold |
| Containment dedup (`dedup.py:containment_pairs`) | `shingle_n`, `threshold` (C = inter/min-size), `max_df` | word-5-gram, 0.8, max_df off | same Σ df² kernel + cap as Jaccard; catches sub-document/quote containment symmetric overlap misses; integer inter/sizes ride the output so thresholds stay exact |
| SimHash dedup (`dedup.py:simhash_band_pairs`) | `bits`, `bands` (pigeonhole-lossless for hamming <= bands-1) | 32 bits, 4 bands | band join scales linearly in bands; raise bits for selectivity before raising bands (bands drive candidate volume) |
| Span scrub (`dedup.py:repeated_span_scrub`) | `k` (span tokens), `min_count` | 8, 2 | duplicated-shingle join is AQE-size-gated (no forced broadcast); raise min_count on boilerplate-heavy corpora to shrink the dup side |
| Incremental LSH index (`dedup.py:lsh_index_build/append/probe/compact`) | `n_hashes`, `bands`, `shingle_n` (frozen in meta at build), probe `threshold`, compaction cadence | 32 hashes, 8 bands, 5-gram | corpus signatures computed once at rest; probes hash only the delta; parameter drift fails the meta gate; compact after N appends to bound probe-time file count; probe prunes the signature verify-scan with a broadcast semi on the (batch-bounded) candidate ids; append anti-joins vs persisted signatures (replay-safe) under the same meta sentinel as build/compact; `lsh_index_stats` measures the file-count/hot-bucket triggers; `lsh_index_delete` = sentinel-bracketed takedown rewrite |
| Semantic dedup (`dedup.py:semantic_dedup_pairs/semantic_dedup`) | `k` (clusters), `block_rows` (oversized clusters hash-split into exact block-pair tasks — the mega-cluster guard), `threshold` (θ≈1 for the SemDeDup premise), `max_iter` | k=16, θ=0.95, 4096 rows/block | BLAS gram per (cluster, block-pair) via applyInPandas; no single task ever exceeds block_rows² sims, exactness preserved (pytest-pinned vs unblocked); recall loss only for pairs straddling clusters (total at θ≈1) |
| Daily-crawl ingest loop (`streaming/jobs.py:stream_dedup_ingest`) | probe `threshold`; banding frozen by the index meta; micro-batch size via source trigger; `quality_col` survivor policy | θ=0.8, min-id keep | the only stateful structure is the index; each day shingles only its delta; survivors sink is batch-partitioned dynamic-overwrite (replayed batch rewrites exactly itself; `compact_ingest_survivors` folds aged batches into the archive partition, keeping the replay window batch-addressed); single-writer per index, ENFORCED via the meta writer-token claim + pre-write re-verify (indexmeta): a racing second writer aborts having written nothing; probes are NOT blocked by a claim (r8: claims re-stamp the current version, readers serve the last stamped state through the delta computation; only the data-write bracket is gate-unreadable) |
| Decontamination (`dedup.py:contamination_overlap_scores`) | shingle `n`, test-side broadcast | 8-gram | test split is the small side — broadcast survives as long as test fits executors; else plain equi-join, still one shuffle |
| IVF k-NN (`operators/vectors.py:ivf_assign/ivf_index_*`) | `n_cells`, `n_probe`, rebalance cadence (append drifts centroids; `ivf_index_rebalance` = warm-started Lloyd refinement + sentinel-bracketed list rewrite; `ivf_index_stats` measures the max/median cell skew trigger) | 16 cells, 4 probes | n_cells ~ sqrt(corpus); probe cost = n_probe/n_cells of the lists; persisted index prunes partitions at planning time (static IN on `cell`); rebalance after N appends or when skew degrades; `ivf_index_delete` = sentinel-bracketed takedown rewrite |
| PQ ADC (`vectors.py:pq_train/pq_knn_join`) | `m` subspaces, `n_centroids` per subspace, `sample_size` for training, exact re-rank depth | m=8, 16 codes, 10k sample | codebooks broadcast (m*n_centroids*dim/m floats — tiny); re-rank depth trades recall for exact-scan cost on the shortlist |
| k-means (`vectors.py:kmeans_fit`) | `k`, `max_iter` | 10, 5 | per-iter cost = one corpus scan + k*dim-float driver roundtrip; localCheckpoint the unit vectors once (done) |
| ANN LSH (`vectors.py:ann_lsh_pairs`) | `n_planes`, `n_tables` | 8 planes, 4 tables | recall knob is tables (union of buckets), precision knob is planes (bucket selectivity); both scale as equi-joins |
| Connected components (`operators/graph.py:connected_components`) | checkpoint cadence (pointer-doubling rounds) | every round | rounds = O(log diameter); edge-touched vertices only — singletons never shuffle |
| PageRank (`graph.py:pagerank`) | `max_iter`, checkpoint every 2 rounds | 10 iters | contribution agg is one shuffle/round on src; dangling mass is a 1-row broadcast fold |
| LPA / coreness (`graph.py`) | `max_iter` (2 sync rounds per materialization) | 10 | cost is iteration count, not plan shape; early-stops on 2-periodic fixpoints |
| BFS (`graph.py:bfs_hops`) | checkpoint EVERY hop (do not batch — frontier lineage compounds) | per hop | sum of work = edges touched; frontier anti-join stays semi-join shaped |
| Sketches (`operators/aggregates.py` CMS/HLL/KMV) | CMS `depth x width`, HLL `b` (2^b registers), KMV `k` | 4x1024, b=8, k=256 | all mergeable partial aggregates — shard output is <= depth*width / 2^b / k rows regardless of input size; rollups reuse shards (`rolling_distinct_users_kmv_7d` pattern) |
| Streaming jobs (`streaming/jobs.py`) | watermark delay, window/slide, state timeout | 10 min watermark | watermark bounds state; KMV/session state is per-key-bounded (k rows / gap timeout) |
| Sampling / mixtures (`operators/sampling.py`) | strata caps, `k`, md5 key | — | md5-keyed order is partition-count-independent: same sample on any cluster layout |
| Text quality (`operators/text.py` Gopher/entropy/BPE) | n-gram widths, BPE `vocab_size`/`min_pair` | — | all bound-array HOFs per row; BPE train collapses to vocab-first aggregate, apply is a broadcast trie |
| Packing (`operators/packing.py:pack_sequences`) | `budget` (tokens per packed sequence), `shard_col` | caller-set | per-shard window math; shards are independent — partition on shard_col |
| Shard export (`sources/textio.py:write_training_shards`) | `n_shards` (md5-assigned, layout-independent) | 8 | size shards to ~`spark.sql.files.maxPartitionBytes` (128 MiB) so downstream scans get 1 task/shard; manifest audits the export without a row compare |
| Perceptual dedup (`operators/imagededup.py:hamming_near_dup_pairs`) | `max_hamming`, `bands` (default d+1 = the multi-index-hamming optimum: fewest lossless bands -> widest slices -> strongest blocking), `block_cols` | d=4, 5 bands | random-hash candidate volume is bands*n²/2^slice_bits — NEVER raise bands past d+1; at corpus scale add `block_cols` (dimension bucket / source domain) so candidates scale with the largest block |
| Perceptual hash index (`operators/hashindex.py`) | banding frozen in meta at build; probe `max_hamming` <= index's (lossy probes refused) | d=4 | at-rest band rows hive-partitioned by band; probes band only the batch; appends claim-first anti-joined (replay = no-op) under the shared sentinel/claim-v3 contract |
| HTML extraction (`operators/htmltext.py`) | block filter thresholds (`link_density`, `n_chars`) downstream of `html_extract_blocks` | caller-set | the readability cut is a Catalyst predicate over per-block stats — tune per corpus, nothing re-parses |
| URL blocklists (`operators/urls.py:drop_blocklisted`) | blocklist table (broadcast), suffix table in `MULTI_SUFFIXES` | built-in baseline | suffix explosion is per DISTINCT host (~5 rows each); swap the full Public Suffix List in as data when precision matters |
| PSL grouping (`operators/psl.py:with_registrable_domain`) | rules file (`load_psl` path; full upstream list drops in), `include_private` | committed curated snapshot | rules are a ~10k-row broadcast; work term = DISTINCT hosts x ~5 suffixes; verdict joins back on the host key (shuffle equi-join) — at 100 TB pre-aggregate to distinct hosts ONCE and reuse the mapping across downstream ops |
| robots.txt admission (`operators/robots.py`) | `agent`, rules from `extract_robots_rules` | `*` | per-URL cost = one host equi-join + struct-max; rules side is per-host-small (broadcast when the host universe allows); rlike patterns are per-ROW literals, precompiled by the regex cache per task |
| Charset decode (`operators/encoding.py:decode_payload_text`) | content-type column opt-in | cascade (BOM>header>meta>utf-8, latin-1 rescue) | Arrow-batched Python by necessity (arbitrary charsets have no JVM expression); keep it fused with the WARC explode stage so payload bytes cross into Python once, not twice |
| Crawl curation composite (`crawl_curation_pipeline`) | blocklist table, cap (`per_stratum_cap`), extraction thresholds | blocklist 2 entries, cap 6 | each stage is row-linear; stage counts come off 3 localCheckpoints so the parse/extract work runs once, not once per count; 10x probe exponent 0.06 (SCALE_PROBE_r10) |
| Video frame dedup (`operators/imagededup.py:video_frame_dhash`) | `max_frames`, then the shared hamming-banding knobs | 16 | MJPEG decode is per-frame independent (Arrow batch); frames feed the SAME banded hash index as images — one dedup infrastructure across modalities |
| Video CLIP dedup (`imagededup.py:video_clip_near_dup_pairs`) | `k` (window frames), `bands` (k*ceil(64/bands) <= 63), `max_hamming` (window budget), `min_containment`, `max_bucket_df`, `block_cols` | k=3, 4 bands, d=8, 0.35, df=50 | tolerance budget thins sub-slices (48-bit window / 9 sub-bands ~ 5 bits), so at corpus scale `block_cols` (duration bucket — a re-encode preserves it) is the selectivity lever; DISTINCT-before-join kills static-clip quadratics; bucket cap bounds test-card hot keys |
| IDN normalization (`operators/idn.py`) | — (pure function; `with_ascii_host` wrapper) | IDNA 2003 + punycode fallback | Python codec sees only DISTINCT NON-ASCII hosts (JVM rlike gate); one broadcast join back — cost is per-distinct-unicode-host, ~0 on ASCII corpora |
| PSL grouping (`operators/psl.py`) | `include_private`, `idna` | full upstream list, idna on | rules broadcast (~10k rows); per-DISTINCT-host suffix explode; idna adds one distinct + one broadcast map join, nothing per-row |
| Quality ensemble (`operators/dq.py:quality_keep_verdict`) | per-rule thresholds; `lm_model` (rule active iff given); `include_compression` | gopher defaults, rep<=0.2, bits<=9, deflate in [0.1,1.1] | gopher/repetition ride the scan; LM = explode + broadcast model join (charset-bounded model); compression is the one Arrow stage — drop it (include_compression=False) if the corpus already carries deflate sizes; calibrate thresholds off `quality_attribution_report` sole-blocker counts |
| Policy snapshots (`operators/policystore.py` + `stream_crawl_curation`) | snapshot path vs static frame per policy | static | per-batch reload = one listing + one small parquet read; publish cadence bounds staleness; _SUCCESS promotion means readers never see torn snapshots |
| Persisted clip index (`operators/clipindex.py` + `stream_clip_dedup_ingest`) | window (k, bands) frozen in clipmeta; probe `min_containment`; hash-index `max_hamming`/sub-band count frozen at build | k=3, 4 vbands, d=8, 0.35 | probes fingerprint only the batch vs the at-rest band layout; index totals = one pruned id scan; same bucket-selectivity calculus as the in-memory kernel — block upstream (duration bucket in the id universe) when the corpus outgrows the sub-slices |
| Profile langID (`operators/langid.py:language_id_profile`) | `top_k` trigrams/language profile; seed corpus (committed literal) | 17 langs, top_k=200 | the profile is bounded by construction (langs x top_k rows, always broadcast); scoring is explode -> broadcast join -> doc-keyed aggregate — no new shuffle key at any corpus size; grow the seed, not the plan |
| Perplexity buckets (`langid.py:perplexity_buckets`) | tercile rule fixed (percentile_disc over ceil(n/3) cuts); score column pluggable | bits_per_trigram from langID | corpus table sees ONE groupBy (lang, score) onto a compressed histogram (scores pre-rounded to 6dp); the cumulative window runs over the histogram only and one-row-per-lang cuts broadcast back — never ntile over a language partition |
| Threshold sweep (`operators/dq.py:quality_threshold_sweep`) | per-rule threshold grids (literal arrays) | 3 grids x 3 rules | one posexplode over grid literals (xN rows, N = grid size, bounded) + one aggregate; rules are already per-row booleans from the scan — the sweep adds zero joins; widen grids freely, cost is linear in grid size |
| Avro OCF (`sources/avroio.py`) | codec (null/deflate), sync-marker honored; schema projected at read | deflate | mapInPandas over whole files for OCF framing (Arrow-batched, spec-driven); at 100 TB prefer a directory of many OCFs (file-parallel) — single giant OCF serializes on its sync-block chain |
| Epoch schedule (`operators/sampling.py:epoch_schedule`) | `budget_tokens`, per-stratum `targets`, `max_epochs` repetition cap | uniform targets, no cap | one token-count aggregate rides the scan; all recipe arithmetic on the \|strata\|-row frame; realized-vs-target drift is reported, not renormalized — the recipe signal |
| Frontier politeness (`operators/urls.py:frontier_schedule`) | per-host `delay_col` (robots/policy-sourced) or `default_delay_s`; `priority_col` | 1.0s/host | one host-keyed shuffle; per-host window is the politeness semantic (minimum grain); `host_drain_s` is the mega-host signal — cap or re-queue tails that outlast the crawl window |
| Streaming politeness (`streaming/jobs.py:stream_frontier_schedule`) | same knobs + cursor store path; micro-batch size via trigger | availableNow drain | per-host cursors persist across batches (1 row/host, AQE-sized hash join); replay recomputes exactly itself (batch-B cursor derives only from B-1); prune aged cursor partitions like survivors stores |
"""



def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "PLANS.md"

    sys.path.insert(0, "/root/repo")
    import bench
    import __spark_entry__ as entrymod
    from thewhisperdb_spark.session import get_spark

    spark = get_spark("planreport")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    sections = []
    for key in bench.HEADLINE:
        fn = qs[key]
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            # NUL separators from row-canon hash literals render the file
            # "binary" to grep — keep PLANS.md plain text
            plan = buf.getvalue().rstrip().replace("\x00", "\\0")
        except Exception as e:  # streaming twins can't explain pre-start
            plan = f"(not explainable: {type(e).__name__}: {e})"
        sections.append(f"## {key}\n\n```\n{plan}\n```\n")
        print(f"# {key}: ok", file=sys.stderr)

    header = (
        "# PLANS — formatted physical plans of the bench headline queries\n\n"
        f"Generated by tools/planreport.py at {sf_dir}. Things to read for:\n"
        "PushedFilters / pruned ReadSchema on scans, BroadcastHashJoin only\n"
        "on dimension-sized sides, TakeOrderedAndProject for top-k, and wide\n"
        "WholeStageCodegen spans (no per-row Python anywhere).\n\n"
        + KNOB_INDEX + "\n")
    with open(out_md, "w") as f:
        f.write(header + "\n".join(sections))
    print(f"wrote {out_md} ({len(sections)} plans)")


if __name__ == "__main__":
    main()

