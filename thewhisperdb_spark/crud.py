"""Snapshot-transform CRUD engine (SURVEY §2.8 M1-M6, §2.1 S1-S4).

The reference mutates an in-memory node map and rewrites the whole JSON file
on every mutation (``src/core/GraphDB.cpp:326-374``, called from
``:188,388,412,429,446,473,496,505``). DataFrames are immutable, so every
mutation here is a snapshot transformation — read state, produce the next
state — which is exactly the reference's persistence model, minus the
O(DB-size) synchronous rewrite per write: persistence is an explicit
``save()`` of columnar Parquet, partitionable at scale.

Single-writer semantics throughout (the reference is a single-threaded server,
``src/server/wserver.cpp:112-293``): id generation is ``max(id)+1``
(``src/core/GraphDB.cpp:485-491``), NOT ``monotonically_increasing_id`` —
contiguity is part of the observable contract.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType

from thewhisperdb_spark.schemas import (
    NODE_FILES_SCHEMA,
    NODE_SCHEMA,
    REQUIRED_NODE_FIELDS,
    TAG_BANK_SCHEMA,
)

_TABLES = ("nodes", "node_files", "tag_bank")

# Patch-field type validators mirroring the reference's partial-update rules
# (``src/core/GNode.cpp:148-205``): a field is applied only when present AND
# type-valid; invalid-typed fields are silently skipped, not errors.
_STRING_FIELDS = ("title", "author", "subject", "description", "date",
                  "storage_path")


def _valid_course(v: Any) -> int | None:
    """int, or string parseable as int; else None (skip). ``GNode.cpp:156-168``."""
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v
    if isinstance(v, str):
        try:
            return int(v)
        except ValueError:
            return None
    return None


def _valid_tags(v: Any) -> list[str] | None:
    """array of strings, or CSV string -> trimmed non-empty list
    (``src/core/GNode.cpp:32-48,170-180``)."""
    if isinstance(v, str):
        parts = [t.strip() for t in v.split(",")]
        return [t for t in parts if t]
    if isinstance(v, list) and all(isinstance(t, str) for t in v):
        return [t.strip() for t in v if t.strip()]
    return None


class GraphEngine:
    """State tables as DataFrames + snapshot-transform mutations.

    ``nodes`` carries ``linked_nodes`` (adjacency embedded per row, like the
    reference's ``LinkedNodes``); ``edges()`` derives the normalized view.
    """

    def __init__(self, spark: SparkSession, nodes: DataFrame | None = None,
                 node_files: DataFrame | None = None,
                 tag_bank: DataFrame | None = None):
        self.spark = spark
        self.nodes = nodes if nodes is not None else \
            spark.createDataFrame([], NODE_SCHEMA)
        self.node_files = node_files if node_files is not None else \
            spark.createDataFrame([], NODE_FILES_SCHEMA)
        self.tag_bank = tag_bank if tag_bank is not None else \
            spark.createDataFrame([], TAG_BANK_SCHEMA)

    # ---- S1-S3 persistence -------------------------------------------------

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "GraphEngine":
        """S1 with the corrupt-fallback semantics of ``GraphDB.cpp:247-301``:
        unreadable/absent state -> fresh empty DB."""
        dfs = {}
        for t in _TABLES:
            try:
                dfs[t] = spark.read.parquet(os.path.join(path, t))
            except Exception:
                dfs[t] = None
        return cls(spark, dfs["nodes"], dfs["node_files"], dfs["tag_bank"])

    def _save_atomic(self, path: str, fmt: str) -> None:
        """Write-temp-then-rename snapshot save.

        A direct ``mode("overwrite")`` to the load path is a data-loss bug:
        DataFrames are lazy, so the overwrite deletes the very parquet files
        the un-materialized state still needs mid-write — the reference's
        rewrite-in-place persistence (``GraphDB.cpp:326-374``) must therefore
        be temp-dir + rename here. Each table is written to a hidden temp
        sibling first (reading the OLD files while they still exist), then
        swapped into place, then the in-memory state is re-pointed at the
        fresh snapshot so no lineage references the replaced files."""
        import shutil
        import uuid as _uuid

        os.makedirs(path, exist_ok=True)
        tmp = os.path.join(path, f".tmp-{_uuid.uuid4().hex[:8]}")
        ordered = {"nodes": self.nodes.orderBy("id"),
                   "node_files": self.node_files,
                   "tag_bank": self.tag_bank}
        try:
            for t, df in ordered.items():
                getattr(df.write.mode("overwrite"), fmt)(os.path.join(tmp, t))
            for t in _TABLES:
                final = os.path.join(path, t)
                old = final + ".old"
                shutil.rmtree(old, ignore_errors=True)
                if os.path.exists(final):
                    os.rename(final, old)
                os.rename(os.path.join(tmp, t), final)
                shutil.rmtree(old, ignore_errors=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        # re-point state at the snapshot just written (schemas preserved:
        # parquet is self-describing; json re-reads under the declared schema)
        if fmt == "parquet":
            self.nodes = self.spark.read.parquet(os.path.join(path, "nodes"))
            self.node_files = self.spark.read.parquet(
                os.path.join(path, "node_files"))
            self.tag_bank = self.spark.read.parquet(
                os.path.join(path, "tag_bank"))
        else:
            self.nodes = self.spark.read.schema(NODE_SCHEMA).json(
                os.path.join(path, "nodes"))
            self.node_files = self.spark.read.schema(NODE_FILES_SCHEMA).json(
                os.path.join(path, "node_files"))
            self.tag_bank = self.spark.read.schema(TAG_BANK_SCHEMA).json(
                os.path.join(path, "tag_bank"))

    def save(self, path: str) -> None:
        """S2: snapshot write, nodes ordered by id (``GraphDB.cpp:326-374``).
        Parquet per table; at scale, partition ``nodes`` by a stable key and
        let writers emit one file per partition. Safe to call with the same
        path the engine loaded from (temp-write + rename, see _save_atomic)."""
        self._save_atomic(path, "parquet")

    def save_json(self, path: str) -> None:
        """S2, JSON-faithful variant: the reference persists one JSON document
        per database (``GraphDB.cpp:326-374``); here each table is a JSON
        *directory* (one file per partition at scale), nodes id-ordered.
        Same-path-safe (see _save_atomic)."""
        self._save_atomic(path, "json")

    @classmethod
    def load_json(cls, spark: SparkSession, path: str) -> "GraphEngine":
        """S1 JSON load with declared schemas (no inference — the lenient
        coercions happen at ingest, not at rest) and the corrupt-fallback."""
        from pyspark.sql.types import StructType as _St

        def rd(sub: str, schema: _St):
            try:
                df = spark.read.schema(schema).json(os.path.join(path, sub))
                df.first()
                return df
            except Exception:
                return None

        return cls(spark,
                   rd("nodes", NODE_SCHEMA),
                   rd("node_files", NODE_FILES_SCHEMA),
                   rd("tag_bank", TAG_BANK_SCHEMA))

    def serialize(self) -> list[str]:
        """S4 ``serialize`` (``GraphDB.cpp:232-245``): JSON rows ordered by id.
        Driver-side collect by design — this is the API-response path."""
        return self.nodes.orderBy("id").toJSON().collect()

    # ---- reads -------------------------------------------------------------

    def find(self, node_id: int) -> dict:
        """F7 PK lookup; raises KeyError if missing (``GraphDB.cpp:30-38``)."""
        rows = self.nodes.filter(F.col("id") == node_id).limit(1).collect()
        if not rows:
            raise KeyError(node_id)
        return rows[0].asDict()

    def exists(self, node_id: int) -> bool:
        """F8 (``GraphDB.cpp:40-43``)."""
        return bool(self.nodes.filter(F.col("id") == node_id).limit(1).count())

    def count(self) -> int:
        """A1 (``GraphDB.cpp:195-197``)."""
        return self.nodes.count()

    def next_id(self) -> int:
        """M1 id generation: ``max(id) + 1`` — one scalar aggregate,
        single-writer. Intentional divergence from the reference
        (``GraphDB.cpp:485-491``): its static counter restarts at 1 per
        process and re-fills gaps left by deletions after a restart; here
        ids of deleted nodes are NEVER reused (monotone over the life of the
        stored snapshot), which is the safer contract when ids leak into
        edges, files, and external references."""
        row = self.nodes.agg(F.max("id").alias("m")).collect()[0]
        return int(row["m"] or 0) + 1

    # ---- M1/M6 ingest ------------------------------------------------------

    def ingest_node(self, meta: dict[str, Any],
                    files: list[tuple[str, bytes]] | None = None,
                    storage_root: str | None = None) -> int:
        """M6 upload pipeline (``src/server/UploadHandler.cpp:14-81``):
        validate required fields -> coerce -> default date -> M1 add -> M4
        per file. Returns the new node id; raises ValueError on validation
        failure (the 400 path, ``UploadHandler.cpp:83-155``)."""
        for fld in REQUIRED_NODE_FIELDS:
            v = meta.get(fld)
            if not isinstance(v, str) or not v.strip():
                raise ValueError(f"missing or empty required field: {fld}")
        course = _valid_course(meta.get("course", 0))
        tags = _valid_tags(meta.get("tags", []))
        date = meta.get("date")
        if not isinstance(date, str) or not date:
            import datetime as _dt

            date = _dt.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
        new_id = self.next_id()
        row = {
            "id": new_id,
            "title": meta["title"],
            "author": meta["author"],
            "subject": meta["subject"],
            "course": course if course is not None else 0,
            "description": meta.get("description", "") if
            isinstance(meta.get("description", ""), str) else "",
            "date": date,
            "tags": tags if tags is not None else [],
            "storage_path": None,
            "linked_nodes": [],
            "embedding": None,
        }
        new_df = self.spark.createDataFrame([row], NODE_SCHEMA)
        self.nodes = self.nodes.unionByName(new_df)
        for orig_name, content in (files or []):
            self.add_file(new_id, orig_name, content, storage_root)
        return new_id

    # ---- M2 partial update -------------------------------------------------

    def update_node(self, node_id: int, patch: dict[str, Any]) -> None:
        """M2: patch only present-and-type-valid fields; id immutable
        (stripped at the API layer, ``src/main.cpp:275``; field rules
        ``src/core/GNode.cpp:148-205``). Raises KeyError if absent."""
        if not self.exists(node_id):
            raise KeyError(node_id)
        df = self.nodes
        hit = F.col("id") == node_id

        def apply(col: str, value) -> None:
            nonlocal df
            field_type = dict((f.name, f.dataType) for f in NODE_SCHEMA.fields)[col]
            df = df.withColumn(
                col, F.when(hit, F.lit(value).cast(field_type)).otherwise(F.col(col)))

        for fld in _STRING_FIELDS:
            if fld in patch and isinstance(patch[fld], str):
                apply(fld, patch[fld])
        if "course" in patch:
            c = _valid_course(patch["course"])
            if c is not None:
                apply("course", c)
        if "tags" in patch:
            t = _valid_tags(patch["tags"])
            if t is not None:
                df = df.withColumn(
                    "tags", F.when(hit, F.array(*[F.lit(x) for x in t])
                                   if t else F.array().cast("array<string>"))
                    .otherwise(F.col("tags")))
        if "linked_nodes" in patch and isinstance(patch["linked_nodes"], list):
            ln = [int(x) for x in patch["linked_nodes"]]
            df = df.withColumn(
                "linked_nodes",
                F.when(hit, F.array(*[F.lit(x).cast("long") for x in ln])
                       if ln else F.array().cast("array<long>"))
                .otherwise(F.col("linked_nodes")))
        if "embedding" in patch and isinstance(patch["embedding"], list):
            emb = [float(x) for x in patch["embedding"]]
            df = df.withColumn(
                "embedding",
                F.when(hit, F.array(*[F.lit(x).cast("float") for x in emb])
                       if emb else F.lit(None).cast("array<float>"))
                .otherwise(F.col("embedding")))
        self.nodes = df

    def merge_nodes(self, updates, delete_ids=None) -> None:
        """Batch MERGE INTO: one full-outer join on id — matched rows are
        replaced by the update row, unmatched update rows are inserted,
        untouched rows pass through; ids listed in ``delete_ids`` (an
        iterable or a 1-column DataFrame) are removed — the WHEN MATCHED
        THEN DELETE clause. This is the set-oriented form of M1/M2/M3: where
        the reference pays a whole-DB rewrite PER mutation
        (``src/core/GraphDB.cpp:388,412``) and ``update_node`` patches one
        row per call, a 10M-row delta costs ONE shuffle join (plus an
        anti-join for deletes) and one snapshot write. ``updates`` must
        carry the full node schema."""
        up = updates.select(*[F.col(f.name).cast(f.dataType)
                              for f in NODE_SCHEMA.fields])
        # Real MERGE INTO rejects multiple matches per target row; a
        # duplicate id in `updates` would otherwise fan out through the
        # full-outer join. Resolve deterministically: keep the greatest
        # tuple per id (stable regardless of partitioning).
        # Scalar fields first, then a stable digest over the array/map
        # columns as the final tiebreak — without it two updates differing
        # only in tags/linked_nodes/embedding would resolve
        # partition-dependently (ADVICE r3).
        wdup = Window.partitionBy("id").orderBy(
            *[F.col(f.name).desc_nulls_last() for f in NODE_SCHEMA.fields
              if f.name != "id" and not isinstance(
                  f.dataType, (ArrayType, MapType))],
            F.md5(F.to_json(F.struct(*[
                f.name for f in NODE_SCHEMA.fields
                if isinstance(f.dataType, (ArrayType, MapType))
            ]))).desc_nulls_last())
        up = (up.withColumn("_rn", F.row_number().over(wdup))
              .filter(F.col("_rn") == 1).drop("_rn"))
        o = self.nodes.alias("o")
        u = up.withColumn("_is_up", F.lit(True)).alias("u")
        joined = o.join(u, F.col("o.id") == F.col("u.id"), "full_outer")
        merged = joined.select(*[
            F.when(F.col("u._is_up").isNotNull(), F.col(f"u.{c}"))
            .otherwise(F.col(f"o.{c}")).alias(c)
            for c in [f.name for f in NODE_SCHEMA.fields]])
        if delete_ids is not None:
            if isinstance(delete_ids, DataFrame):
                dels = delete_ids.select(
                    F.col(delete_ids.columns[0]).cast("long").alias("id"))
            else:
                dels = self.spark.createDataFrame(
                    [(int(i),) for i in delete_ids], "id long")
            merged = merged.join(dels, "id", "left_anti")
        self.nodes = merged

    # ---- M3 delete ---------------------------------------------------------

    def delete_node(self, node_id: int, storage_root: str | None = None) -> None:
        """M3: remove node + cascade its files (``GraphDB.cpp:392-414``)."""
        if not self.exists(node_id):
            raise KeyError(node_id)
        if storage_root:
            from thewhisperdb_spark.storage import delete_file

            for r in self.node_files.filter(F.col("node_id") == node_id).collect():
                delete_file(storage_root, r["file_path"])
        self.nodes = self.nodes.filter(F.col("id") != node_id)
        self.node_files = self.node_files.filter(F.col("node_id") != node_id)

    # ---- M4/M5 file attachment --------------------------------------------

    def add_file(self, node_id: int, orig_name: str, content: bytes,
                 storage_root: str | None = None) -> str:
        """M4 (``GraphDB.cpp:416-448``): save bytes (S5), append path row,
        first file sets ``storage_path``."""
        if not self.exists(node_id):
            raise KeyError(node_id)
        from thewhisperdb_spark.storage import save_file

        rel_path = save_file(storage_root, orig_name, content) if storage_root \
            else orig_name
        new_row = self.spark.createDataFrame(
            [(node_id, rel_path)], NODE_FILES_SCHEMA)
        had_files = bool(
            self.node_files.filter(F.col("node_id") == node_id).limit(1).count())
        self.node_files = self.node_files.unionByName(new_row)
        if not had_files:
            self.nodes = self.nodes.withColumn(
                "storage_path",
                F.when(F.col("id") == node_id, F.lit(rel_path))
                .otherwise(F.col("storage_path")))
        return rel_path

    def remove_file(self, node_id: int, rel_path: str,
                    storage_root: str | None = None) -> None:
        """M5 (``GraphDB.cpp:450-475``): drop path row (+disk). Matching the
        reference exactly: ``storage_path`` is cleared only when the LAST
        file goes (``GraphDB.cpp:468-471``) — removing a non-current file
        leaves ``storage_path`` untouched, even if it pointed at the removed
        file (the reference never re-points it)."""
        if storage_root:
            from thewhisperdb_spark.storage import delete_file

            delete_file(storage_root, rel_path)
        self.node_files = self.node_files.filter(
            ~((F.col("node_id") == node_id) & (F.col("file_path") == rel_path)))
        has_files = bool(
            self.node_files.filter(F.col("node_id") == node_id).limit(1).count())
        if not has_files:
            self.nodes = self.nodes.withColumn(
                "storage_path",
                F.when(F.col("id") == node_id, F.lit(None).cast("string"))
                .otherwise(F.col("storage_path")))

    # ---- edges / tag bank --------------------------------------------------

    def edges(self) -> DataFrame:
        """Normalized undirected edge view of ``linked_nodes``."""
        return (self.nodes
                .select(F.col("id").alias("src"),
                        F.explode_outer("linked_nodes").alias("dst"))
                .filter(F.col("dst").isNotNull()))

    def add_tags_to_bank(self, tags: list[str]) -> None:
        """A8 (``GraphDB.cpp:499-506``)."""
        from thewhisperdb_spark.operators.tags import tag_bank_union

        new = self.spark.createDataFrame([(t,) for t in tags], TAG_BANK_SCHEMA)
        self.tag_bank = tag_bank_union(self.tag_bank, new)

    def checkpoint(self) -> None:
        """Cut lineage after a mutation burst: long withColumn/union chains
        grow the logical plan; localCheckpoint keeps planning O(1) per op.
        ALL state tables are checkpointed — tag_bank included, so a
        checkpointed engine can save back to its own load path."""
        self.nodes = self.nodes.localCheckpoint(eager=True)
        self.node_files = self.node_files.localCheckpoint(eager=True)
        self.tag_bank = self.tag_bank.localCheckpoint(eager=True)

    # ---- versioned snapshots (time travel) ---------------------------------
    # Lakehouse-style versioning over the reference's whole-DB-rewrite model
    # (src/core/GraphDB.cpp:326-374). Each save appends an immutable v=<n>
    # directory (never touching the files the lazy in-memory state still
    # reads — append-only needs no temp-and-rename dance), then swings the
    # _LATEST pointer atomically (write-temp + os.replace). Readers of any
    # pinned version are isolated from concurrent saves; pruning is an
    # explicit, pointer-respecting GC (prune_versions).

    def save_version(self, path: str) -> int:
        vs = _version_dirs(path)
        n = (vs[-1] + 1) if vs else 1
        vdir = os.path.join(path, f"v={n}")
        ordered = {"nodes": self.nodes.orderBy("id"),
                   "node_files": self.node_files,
                   "tag_bank": self.tag_bank}
        for t, df in ordered.items():
            df.write.mode("errorifexists").parquet(os.path.join(vdir, t))
        tmp = os.path.join(path, f"._LATEST.{n}")
        with open(tmp, "w") as f:
            f.write(str(n))
        os.replace(tmp, os.path.join(path, "_LATEST"))
        # re-point in-memory state at the immutable snapshot just written
        self.nodes = self.spark.read.parquet(os.path.join(vdir, "nodes"))
        self.node_files = self.spark.read.parquet(
            os.path.join(vdir, "node_files"))
        self.tag_bank = self.spark.read.parquet(os.path.join(vdir, "tag_bank"))
        return n

    @classmethod
    def load_version(cls, spark: SparkSession, path: str,
                     version: int | None = None) -> "GraphEngine":
        """Open a snapshot: ``version=None`` resolves the ``_LATEST`` pointer
        (falling back to the highest directory if the pointer is missing);
        a pinned int time-travels to that exact state."""
        if version is None:
            version = _read_latest_pointer(path)
        if version is None:
            vs = _version_dirs(path)
            version = vs[-1] if vs else None
        if version is None:
            return cls(spark)  # no snapshots yet -> empty DB (S3 semantics)
        vdir = os.path.join(path, f"v={version}")
        # A pinned (or pointer-resolved) version must exist: silently
        # returning an empty DB for a pruned/mistyped version would make a
        # time-travel read lie. The empty-DB fallback above is reserved for
        # version=None with no snapshots at all.
        if not os.path.isdir(vdir):
            raise FileNotFoundError(
                f"snapshot version {version} not found under {path}")
        dfs = {}
        for t in _TABLES:
            tdir = os.path.join(vdir, t)
            if not os.path.exists(tdir):
                dfs[t] = None  # table legitimately absent in this snapshot
            else:
                # corrupt/unreadable table in an existing snapshot -> raise;
                # swallowing it would silently drop data from the read
                dfs[t] = spark.read.parquet(tdir)
        return cls(spark, dfs["nodes"], dfs["node_files"], dfs["tag_bank"])


# ---- versioned snapshots (time travel) -------------------------------------

def _version_dirs(path: str) -> list[int]:
    try:
        return sorted(int(d.split("=", 1)[1]) for d in os.listdir(path)
                      if d.startswith("v=") and d.split("=", 1)[1].isdigit())
    except FileNotFoundError:
        return []


def list_versions(path: str) -> list[int]:
    """All snapshot versions present under ``path``, ascending."""
    return _version_dirs(path)


def prune_versions(path: str, keep: int = 3) -> list[int]:
    """Drop all but the newest ``keep`` versions; returns the pruned ids.
    Never touches the version the ``_LATEST`` pointer names."""
    import shutil

    vs = _version_dirs(path)
    latest = _read_latest_pointer(path)
    drop = [v for v in vs[:-keep] if v != latest] if keep > 0 else []
    for v in drop:
        shutil.rmtree(os.path.join(path, f"v={v}"), ignore_errors=True)
    return drop


def _read_latest_pointer(path: str) -> int | None:
    try:
        with open(os.path.join(path, "_LATEST")) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def diff_versions(spark: SparkSession, path: str, v_old: int,
                  v_new: int) -> DataFrame:
    """Change summary between two snapshot versions (time travel x CDC):
    per table, how many rows were inserted / deleted / updated. ``nodes``
    diffs by primary key with full-row comparison (update = same id,
    different content); ``node_files`` and ``tag_bank`` have set semantics —
    whole-row membership, so changes are inserts/deletes only. One
    full-outer join per table on metadata-scale state.

    Returns (table, inserts, deletes, updates)."""
    old_eng = GraphEngine.load_version(spark, path, v_old)
    new_eng = GraphEngine.load_version(spark, path, v_new)

    def keyed_diff(old: DataFrame, new: DataFrame, key_cols: list[str]):
        rest = [c for c in old.columns if c not in key_cols]
        pack = lambda df: df.select(  # noqa: E731
            *key_cols, F.to_json(F.struct(*rest)).alias("_row"))
        o = pack(old).alias("o")
        n = pack(new).alias("n")
        cond = [F.col(f"o.{k}") == F.col(f"n.{k}") for k in key_cols]
        j = o.join(n, cond, "full_outer")
        o_absent = F.col(f"o.{key_cols[0]}").isNull()
        n_absent = F.col(f"n.{key_cols[0]}").isNull()
        return j.agg(
            F.sum(o_absent.cast("long")).alias("inserts"),
            F.sum(n_absent.cast("long")).alias("deletes"),
            F.sum((~o_absent & ~n_absent
                   & (F.col("o._row") != F.col("n._row"))).cast("long"))
            .alias("updates"))

    def set_diff(old: DataFrame, new: DataFrame):
        return spark.createDataFrame([(
            new.exceptAll(old).count(), old.exceptAll(new).count(), 0,
        )], "inserts long, deletes long, updates long")

    parts = [
        keyed_diff(old_eng.nodes, new_eng.nodes, ["id"])
        .select(F.lit("nodes").alias("table"), "inserts", "deletes",
                "updates"),
        set_diff(old_eng.node_files, new_eng.node_files)
        .select(F.lit("node_files").alias("table"), "inserts", "deletes",
                "updates"),
        set_diff(old_eng.tag_bank, new_eng.tag_bank)
        .select(F.lit("tag_bank").alias("table"), "inserts", "deletes",
                "updates"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
