"""Text-corpus ingest/egress beyond parquet: JSONL and CSV document sources
with malformed-record quarantine, and small-files-aware compacted writes.

A crawl pipeline's raw input is line-delimited JSON or CSV long before it is
parquet, and at 100 TB two things dominate: (a) one bad line must not kill a
multi-hour ingest — PERMISSIVE mode quarantines it into a corrupt-record
column for a dead-letter sink instead; (b) output file count must track data
size, not task count — a 32k-task job writing 32k tiny files per day grinds
the next scan's file-listing and loses scan locality (the classic
small-files problem).

Reference parity: the reference ingests one JSON document per request
(``src/server/wserver.cpp`` handlers -> ``GraphDB::fromJson``); here the
same lenient-ingest contract is applied to bulk line-delimited corpora.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOC_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("n_chars", LongType()),
])

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    return StructType(schema.fields + [StructField(CORRUPT_COL, StringType())])


def read_jsonl(spark: SparkSession, path: str,
               schema: StructType = DOC_SCHEMA) -> DataFrame:
    """Read line-delimited JSON with a DECLARED schema (no sampling-based
    inference pass — at 100 TB inference is a full extra scan) in PERMISSIVE
    mode: malformed lines land in ``_corrupt_record`` with every data column
    null, instead of failing the job (FAILFAST) or silently vanishing
    (DROPMALFORMED).

    Built as ``spark.read.text`` + ``from_json`` rather than the JSON
    datasource, because the datasource breaks line conservation on lines
    that are top-level JSON ARRAYS: it expands them into one row per
    element, so ``[]`` silently vanishes (neither clean nor quarantined)
    and ``[1,2]`` multiplies into two corrupt rows. ``from_json`` with a
    struct schema is 1 line in -> exactly 1 row out BY CONSTRUCTION:
    array/scalar/garbage lines parse to a row whose ``_corrupt_record``
    holds the raw line, and empty/whitespace lines (null struct) are
    routed to quarantine explicitly. The text scan still splits large
    files on line boundaries, so parallelism is unchanged; schema pruning
    of the parse happens inside ``from_json`` (Catalyst prunes unreferenced
    struct fields via OptimizeJsonExprs/SchemaPruning)."""
    full = _with_corrupt(schema)
    parsed = F.from_json(
        F.col("value"), full,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL})
    corrupt = F.when(
        parsed.isNull() | parsed[CORRUPT_COL].isNotNull(), F.col("value"))
    return (spark.read.text(path)
            .select(*[parsed[f.name].alias(f.name) for f in schema.fields],
                    corrupt.alias(CORRUPT_COL)))


def read_csv(spark: SparkSession, path: str,
             schema: StructType = DOC_SCHEMA, header: bool = True) -> DataFrame:
    """CSV twin of ``read_jsonl``: declared schema, PERMISSIVE quarantine."""
    return (spark.read.schema(_with_corrupt(schema))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .option("header", str(header).lower())
            .csv(path))


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): clean rows lose the corrupt column; quarantined
    rows keep the full row — ``_corrupt_record`` holds the raw line (the
    dead-letter payload) with the data columns null. Keeping the data columns
    in the quarantine frame also satisfies Spark's restriction that a raw
    CSV scan may not reference ONLY the internal corrupt column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN). Note the flip side: aggregates that
    prune to the corrupt column alone (e.g. ``bad.count()``) still trip that
    restriction on the CSV path — materialize first (write the dead-letter
    sink, cache, or collect), which is what a real quarantine path does
    anyway. The JSONL path (``from_json`` over a text scan) has no such
    restriction."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


def write_compacted(df: DataFrame, path: str, target_rows_per_file: int,
                    n_rows: int | None = None) -> int:
    """Write parquet with file count derived from DATA SIZE, not task count:
    ceil(n / target_rows_per_file) output files via a round-robin
    repartition. Returns the file count. ``n_rows`` skips the count when the
    caller already knows it (e.g. from a prior aggregate)."""
    n = n_rows if n_rows is not None else df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return n_files


def read_text_lines(spark: SparkSession, path: str,
                    source_tag: str | None = None) -> DataFrame:
    """Raw line-oriented corpus reader (one document per line — the WET/LM
    plain-text interchange shape): ``spark.read.text`` plus a deterministic
    per-line id derived from (file, byte-order position is NOT stable across
    splits, so the id is the xxhash64 of file + line content + per-file line
    rank). Keeps file provenance for per-source accounting.

    Scale note: .text splits large files on line boundaries for free; the
    window for the per-file line rank shuffles on the file name — at 100 TB
    prefer ids minted upstream, or hash-only ids when exact rank is not
    needed."""
    from pyspark.sql import Window

    df = (spark.read.text(path)
          .withColumn("source_file", F.input_file_name()))
    w = Window.partitionBy("source_file").orderBy(F.col("value"))
    out = (df.withColumn("line_rank", F.row_number().over(w).cast("long"))
           .select(
               F.xxhash64("source_file", "value", "line_rank").alias("doc_id"),
               F.col("value").alias("text"),
               "source_file", "line_rank"))
    if source_tag is not None:
        out = out.withColumn("source", F.lit(source_tag))
    return out


def write_orc(df: DataFrame, path: str) -> None:
    """ORC egress (zlib by default): the other columnar interchange format a
    warehouse neighbor may require. Same writer contract as parquet."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source. Predicate pushdown + column pruning work as with parquet
    (Spark's OrcScan exposes PushedFilters), so downstream operators keep
    their scan-pruning behavior."""
    return spark.read.orc(path)


def shard_assign(df: DataFrame, id_col: str, n_shards: int):
    """Deterministic, engine-portable shard assignment: low 60 bits of
    md5(id) mod n_shards. Independent of partitioning, ordering, cluster
    size, and engine — re-running the export (or recomputing the
    assignment in a different system for audit) lands every row in the
    same shard. Returns the input with a ``shard`` int column."""
    from thewhisperdb_spark.operators.aggregates import md5_hash60

    return df.withColumn(
        "shard", F.pmod(md5_hash60(id_col), F.lit(n_shards)).cast("int"))


def write_training_shards(df: DataFrame, path: str, id_col: str,
                          n_shards: int = 8) -> None:
    """Training-data shard export: hive-partitioned parquet
    (``path/shard=K/``) with deterministic md5-based assignment.

    Why not ``repartition(n).write``: task-number sharding changes with
    cluster size and retries, so two exports of the same data could shard
    differently — md5(id) sharding is reproducible by construction, and
    downstream loaders can locate any document's shard from its id alone.
    The write repartitions BY the shard column first so each shard is
    written by the tasks owning it (one file per shard per final task,
    not n_tasks × n_shards fragments)."""
    sharded = shard_assign(df, id_col, n_shards)
    (sharded.repartition(n_shards, F.col("shard"))
     .write.mode("overwrite").partitionBy("shard").parquet(path))


def shard_manifest(spark: SparkSession, path: str, id_col: str,
                   content_cols: tuple[str, ...]) -> DataFrame:
    """Release manifest over an exported shard tree: per shard, row count
    and an order-insensitive content checksum (sum of md5-derived 60-bit
    row hashes in exact decimal — same scheme as
    ``aggregates.table_checksum``). Re-derivable by any engine straight
    from the source table, which is the audit property: manifest(export)
    == manifest(source) proves the export is complete and bit-identical
    without comparing rows. Returns (shard, n_rows, checksum)."""
    from thewhisperdb_spark.operators.aggregates import row_canon_hash60

    df = spark.read.parquet(path)
    h = row_canon_hash60(id_col, *content_cols)
    return (df.groupBy(F.col("shard").cast("int").alias("shard"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(h.cast("decimal(38,0)")).cast("string")
                 .alias("checksum")))
