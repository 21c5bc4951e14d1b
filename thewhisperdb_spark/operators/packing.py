"""Sequence packing and document chunking — the two reshape steps between a
cleaned corpus and a training/indexing job.

Packing (concat-and-chunk): training consumes fixed-length token sequences;
documents arrive in wildly varying lengths. The standard recipe concatenates
documents in a deterministic order inside each shard and cuts every `budget`
tokens. Here the shard is the partition column (``lang`` in the tests; a
hash-derived shard id at scale), so packing is embarrassingly parallel
ACROSS shards and sequential only WITHIN one — exactly the contract of the
window cumsum the plan lowers to. A document is assigned to the bin where it
STARTS (its tokens may spill into the next bin — that's the concat-and-chunk
semantics, a document boundary never forces padding).

Chunking: retrieval/embedding pipelines cut each document into overlapping
token windows (width W, stride S < W). Pure per-row explode — no shuffle at
all; the chunk table rides the document scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from thewhisperdb_spark.operators.text import tokens


def pack_sequences(df: DataFrame, budget: int, shard_col: str = "lang",
                   order_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Assign each document to a training bin of ``budget`` tokens within its
    shard (deterministic ``order_col`` order), and report per-bin occupancy:
    (shard, bin_id, n_docs, bin_tokens) where ``bin_tokens`` counts the
    tokens of documents *starting* in the bin.

    One shuffle on the shard column; the cumsum window is per-shard
    sequential — shard granularity IS the parallelism knob (at 100 TB, shard
    by pmod(hash(id), k·cores), not by a 10-value language column).
    """
    tok = F.size(tokens(F.col(text_col))).cast("long")
    w = (Window.partitionBy("shard").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("long"))
    binned = (df.select(F.col(shard_col).alias("shard"),
                        F.col(order_col), tok.alias("n_tok"))
              .withColumn("bin_id", (cum_before / budget)
                          .cast("long")))
    return (binned.groupBy("shard", "bin_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("bin_tokens")))


def chunk_documents(df: DataFrame, width: int = 64, stride: int = 48,
                    id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Cut each document into overlapping token windows: starts 1, 1+S,
    1+2S, … while start ≤ n_tokens; window i covers tokens
    [start, start+width). Tail windows may be short (clamped slice, never
    empty). Returns (id_col, chunk_start, n_chunk_tokens, chunk_hash) with
    ``chunk_hash`` = md5 of the space-rejoined window — the content key a
    downstream embedder or chunk-level dedup would use.

    No shuffle: sequence+explode+slice are all row-local, so the chunk table
    streams out of the scan at full parallelism. Chunk count per doc is
    ceil(max(n-?)/S)-ish — bounded by n/S, so output is a constant factor of
    input tokens (W/S overlap factor), not quadratic.
    """
    toks = tokens(F.col(text_col))
    base = (df.select(F.col(id_col), toks.alias("_toks"))
            .filter(F.size("_toks") > 0))
    starts = F.sequence(F.lit(1), F.size("_toks"), F.lit(stride))
    chunk = F.slice(F.col("_toks"), F.col("chunk_start"), width)
    return (base.withColumn("chunk_start", F.explode(starts))
            .select(id_col,
                    F.col("chunk_start").cast("long").alias("chunk_start"),
                    F.size(chunk).cast("long").alias("n_chunk_tokens"),
                    F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash")))
