"""Versioned POLICY snapshots (robots rules, PSL, blocklists) for
long-running loops — the freshness half of the crawl-policy family.

A batch job holds its policy frames for one run, but a streaming crawl
loop runs for days while robots.txt files change and the PSL updates.
The r10 loop took STATIC frames captured at start time
(``streaming/jobs.py``); this module is the re-broadcast pattern the
VERDICT asked for: a publisher stamps immutable versioned snapshots,
and the loop RELOADS THE LATEST SNAPSHOT AT EVERY MICRO-BATCH — policy
changes land at the next batch boundary without restarting the query.

Layout: ``<dir>/v000000001/``, ``v000000002/``, ... — each a plain
parquet directory. A version is complete iff Spark's ``_SUCCESS``
marker exists (the committer writes it last), so a reader never sees a
torn snapshot: it lists versions, takes the max complete one, and
reads only that directory. Single-publisher semantics (same posture as
the index meta sentinel in ``indexmeta.py``); concurrent publishers
would need the claim protocol, which policy refresh — a scheduled
fetcher — does not.

Scale shape: snapshots are broadcast-sized policy tables (rules, not
facts); the per-batch reload is one directory listing + one small
parquet read, dwarfed by any micro-batch's work.

The reference has no streaming or policy surface; north-star extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def _version_name(v: int) -> str:
    return f"v{v:09d}"


def _scan_versions(spark: SparkSession,
                   snapshot_dir: str) -> list[tuple[int, bool]]:
    """All ``v<N>`` directories as ``(version, complete)`` pairs, where
    complete means the ``_SUCCESS`` marker exists. Torn directories
    (publisher crashed mid-write) appear with ``complete=False`` — they
    must still OCCUPY their version number, or the next publish would
    collide with the debris forever."""
    fs, p = _fs_path(spark, snapshot_dir)
    if not fs.exists(p):
        return []
    jvm = spark._jvm
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("v")
                and name[1:].isdigit()):
            continue
        ok = fs.exists(jvm.org.apache.hadoop.fs.Path(
            f"{snapshot_dir.rstrip('/')}/{name}/_SUCCESS"))
        out.append((int(name[1:]), bool(ok)))
    return out


def latest_policy_version(spark: SparkSession,
                          snapshot_dir: str) -> int | None:
    """Largest COMPLETE (``_SUCCESS``-stamped) version in the store;
    None when the store is empty or absent."""
    complete = [v for v, ok in _scan_versions(spark, snapshot_dir) if ok]
    return max(complete) if complete else None


def publish_policy_snapshot(df: DataFrame, snapshot_dir: str) -> int:
    """Write ``df`` as the next immutable version and return its
    number. The write lands in a fresh ``v<N+1>`` directory, so readers
    holding version N are never disturbed, and ``_SUCCESS`` (written
    last by the committer) is what promotes the new version.

    The next version is computed over ALL ``v*`` directories, complete
    or torn: a publisher crash leaves a ``v<N>`` directory without
    ``_SUCCESS``, and if that debris were ignored the next publish would
    recompute the same N and wedge on ``errorifexists`` forever while
    the streaming loop silently ran on stale policy. Skipping past torn
    versions makes every retry land on a fresh number; readers never see
    the gap because promotion is ``_SUCCESS``-gated."""
    spark = df.sparkSession
    raw = [v for v, _ok in _scan_versions(spark, snapshot_dir)]
    v = (max(raw) if raw else 0) + 1
    df.write.mode("errorifexists").parquet(
        f"{snapshot_dir.rstrip('/')}/{_version_name(v)}")
    return v


def load_policy_snapshot(spark: SparkSession, snapshot_dir: str,
                         version: int | None = None) -> DataFrame:
    """The latest complete snapshot (or a pinned ``version``) as a
    DataFrame. Raises ``ValueError`` on an empty store — a loop that
    REQUIRES a policy should fail loudly rather than silently crawl
    unfiltered; pass a static frame instead when no store exists."""
    v = version if version is not None \
        else latest_policy_version(spark, snapshot_dir)
    if v is None:
        raise ValueError(
            f"no complete policy snapshot under {snapshot_dir}")
    return spark.read.parquet(
        f"{snapshot_dir.rstrip('/')}/{_version_name(v)}")
