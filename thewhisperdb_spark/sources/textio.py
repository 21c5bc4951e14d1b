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
    (DROPMALFORMED)."""
    return (spark.read.schema(_with_corrupt(schema))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path))


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
    JSON/CSV scan may not reference ONLY the internal corrupt column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN). Note the flip side: aggregates that
    prune to the corrupt column alone (e.g. ``bad.count()``) still trip that
    restriction — materialize first (write the dead-letter sink, cache, or
    collect), which is what a real quarantine path does anyway."""
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
