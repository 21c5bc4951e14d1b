"""Engine-API facade mirroring the reference's REST surface
(``src/main.cpp`` endpoint handlers): same parameters, same envelope shapes,
same error discipline — on DataFrames instead of an in-memory node map.
Transport (HTTP/multipart parsing, ``src/server/wserver.cpp``) is out of
engine scope; this layer is what such a server would call.

Endpoint parity map (all 16 reference routes):
- GET    /api/nodes              -> list_nodes        (``src/main.cpp:63-123``)
- GET    /api/nodes/:id          -> get_node          (``src/main.cpp:127-160``)
- POST   /api/nodes              -> create_node       (``src/main.cpp:164-238``)
- PUT    /api/nodes/:id          -> update_node       (``src/main.cpp:242-292``)
- DELETE /api/nodes/:id          -> delete_node       (``src/main.cpp:296-330``)
- GET    /api/nodes/count        -> count_nodes       (``src/main.cpp:334-369``)
- GET    /api/nodes/:id/files    -> node_files        (``src/main.cpp:330-348``)
- POST   /api/nodes/:id/files    -> add_files_to_node (``src/main.cpp:350-389``)
- POST   /api/nodes/:id/embedding-> generate_node_embedding (``src/main.cpp:478-512``)
- GET    /api/nodes/:id/similar  -> similar_nodes     (``src/main.cpp:518-577``)
- POST   /api/nodes/:id/tags     -> generate_node_tags(``src/main.cpp:580-615``)
- GET    /api/tags               -> tag_bank          (``src/main.cpp:619-631``)
- GET    /api/tags/:tag/nodes    -> tag_nodes         (``src/main.cpp:634-659``)
- POST   /api/tags/link-all      -> link_all_tags     (``src/main.cpp:662-694``)
- GET    /api/clusters           -> clusters          (``src/main.cpp:697-726``)
- POST   /api/cluster            -> run_cluster_job   (``src/main.cpp:441-476``)

The reference gates the embedding/tags/link-all/clusters routes on its LLM
services being configured (OPENAI_API_KEY / DEEPSEEK_API_KEY env,
``main.cpp:483,585``); this repo's stance (SURVEY §2.10) is that the
deterministic fallback clients (``functions/llm.py``) play always-initialized
services, so those routes never 500 on configuration — inject a real client
via the ``embedder``/``tagger`` parameters to call out.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from thewhisperdb_spark.crud import GraphEngine
from thewhisperdb_spark.operators.filters import (
    conjunction,
    contains_filter,
    eq_filter,
    has_embedding,
    tag_filter,
)
from thewhisperdb_spark.operators.sorting import paginate, sort_nodes

# whitelisted filter keys (``src/main.cpp:72-78``)
FILTER_KEYS = ("subject", "author", "course", "title", "tag")


class ApiError(Exception):
    """Carries the HTTP status the reference would return."""

    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


def _node_rows(df) -> list[dict[str, Any]]:
    # F9 projection shape: embedding omitted when absent (GNode.cpp:132-134)
    out = []
    for r in df.collect():
        d = r.asDict()
        if d.get("embedding") in (None, []):
            d.pop("embedding", None)
        out.append(d)
    return out


def _parse_int(value: Any, name: str) -> int:
    try:
        return int(value)
    except (TypeError, ValueError):
        raise ApiError(400, f"invalid integer for {name}: {value!r}") from None


def _build_predicate(filters: dict[str, str]):
    preds = []
    for k, v in filters.items():
        if k not in FILTER_KEYS:
            continue  # unknown filter keys are ignored (whitelist semantics)
        if k == "title":
            preds.append(contains_filter("title", v))        # F4 substring
        elif k == "tag":
            preds.append(tag_filter(v))                      # F5 membership
        elif k == "course":
            try:
                preds.append(eq_filter("course", int(v)))    # F3 parse
            except ValueError:
                preds.append(F.lit(False))  # unparseable course excludes all
        else:
            preds.append(eq_filter(k, v))                    # F1/F2 equality
    return conjunction(*preds) if preds else None


def list_nodes(engine: GraphEngine, filters: dict[str, str] | None = None,
               sort: str = "id", order: str = "asc",
               limit: Any = 0, offset: Any = 0) -> dict:
    """GET /api/nodes: filter conjunction -> sort -> offset/limit -> envelope
    {status, count, nodes[, limit, offset]}."""
    limit_i = _parse_int(limit, "limit")
    offset_i = _parse_int(offset, "offset")
    if order not in ("asc", "desc"):
        order = "asc"
    df = engine.nodes
    pred = _build_predicate(filters or {})
    if pred is not None:
        df = df.filter(pred)
    df = sort_nodes(df, sort, ascending=(order == "asc"))
    if offset_i < 0 or limit_i < 0:
        raise ApiError(400, "limit/offset must be non-negative")
    page = paginate(df, offset=offset_i, limit=limit_i)
    nodes = _node_rows(page)
    env = {"status": "success", "count": len(nodes), "nodes": nodes}
    if limit_i or offset_i:
        env["limit"] = limit_i
        env["offset"] = offset_i
    return env


def get_node(engine: GraphEngine, node_id: Any) -> dict:
    nid = _parse_int(node_id, "id")
    try:
        node = engine.find(nid)
    except KeyError:
        raise ApiError(404, f"node {nid} not found") from None
    if node.get("embedding") in (None, []):
        node.pop("embedding", None)
    return {"status": "success", "node": node}


def create_node(engine: GraphEngine, meta: dict,
                files: list[tuple[str, bytes]] | None = None,
                storage_root: str | None = None) -> dict:
    try:
        nid = engine.ingest_node(meta, files, storage_root)
    except ValueError as e:
        raise ApiError(400, str(e)) from None
    return {"status": "success", "nodeId": nid}   # 201 envelope


def update_node(engine: GraphEngine, node_id: Any, patch: dict) -> dict:
    nid = _parse_int(node_id, "id")
    patch = {k: v for k, v in patch.items() if k != "id"}  # id immutable
    try:
        engine.update_node(nid, patch)
    except KeyError:
        raise ApiError(404, f"node {nid} not found") from None
    return {"status": "success", "nodeId": nid}


def delete_node(engine: GraphEngine, node_id: Any,
                storage_root: str | None = None) -> dict:
    nid = _parse_int(node_id, "id")
    try:
        engine.delete_node(nid, storage_root)
    except KeyError:
        raise ApiError(404, f"node {nid} not found") from None
    return {"status": "success", "deleted": nid}


def count_nodes(engine: GraphEngine, filters: dict[str, str] | None = None) -> dict:
    df = engine.nodes
    pred = _build_predicate(filters or {})
    if pred is not None:
        df = df.filter(pred)
    return {"status": "success", "count": df.count()}


def similar_nodes(engine: GraphEngine, node_id: Any, k: Any = 10) -> dict:
    """GET /api/nodes/:id/similar: cosine top-k among embedded nodes, each
    result row carrying its similarity (``src/main.cpp:518-577``)."""
    from thewhisperdb_spark.operators.vectors import topk_similar

    nid = _parse_int(node_id, "id")
    k_i = _parse_int(k, "k")
    if not engine.exists(nid):
        raise ApiError(404, f"node {nid} not found")
    embedded = engine.nodes.filter(has_embedding("embedding"))
    probe = embedded.filter(F.col("id") == nid)
    if not probe.limit(1).count():
        raise ApiError(400, f"node {nid} has no embedding")
    top = topk_similar(embedded.select("id", "embedding"), nid, k=k_i,
                       id_col="id")
    sims = {r["id"]: r["similarity"] for r in top.collect()}
    rows = _node_rows(engine.nodes.filter(F.col("id").isin(list(sims))))
    for d in rows:
        d["similarity"] = sims[d["id"]]
    rows.sort(key=lambda d: (-d["similarity"], d["id"]))
    return {"status": "success", "count": len(rows), "nodes": rows}


def run_cluster_job(engine: GraphEngine, threshold: Any = 0.75,
                    embedder=None, dim: int = 64) -> dict:
    """POST /api/cluster: the G7 composite job; updates the engine's nodes
    (REPLACE link semantics) and returns clusters + stats."""
    from thewhisperdb_spark.plans.jobs import run_clustering

    try:
        th = float(threshold)
    except (TypeError, ValueError):
        raise ApiError(400, f"invalid threshold: {threshold!r}") from None
    out = run_clustering(engine.nodes, threshold=th, embedder=embedder, dim=dim)
    engine.nodes = out["nodes"]
    clusters = (out["labels"].groupBy("component")
                .agg(F.array_sort(F.collect_list("id")).alias("members"))
                .filter(F.size("members") > 1))
    stats = out["stats"].collect()[0].asDict()
    return {"status": "success",
            "clusters": [list(r["members"]) for r in
                         clusters.orderBy(F.size("members").desc(),
                                          "component").collect()],
            "statistics": stats}


def node_files(engine: GraphEngine, node_id: Any) -> dict:
    """GET /api/nodes/:id/files (``src/main.cpp:330-348``): 404 on unknown
    node, else the node's file paths in insertion order."""
    nid = _parse_int(node_id, "id")
    if not engine.exists(nid):
        raise ApiError(404, f"Node not found: {nid}")
    rows = (engine.node_files.filter(F.col("node_id") == nid)
            .select("file_path").collect())
    return {"status": "success", "nodeId": nid,
            "files": [r["file_path"] for r in rows]}


def add_files_to_node(engine: GraphEngine, node_id: Any,
                      files: list[tuple[str, bytes]] | None,
                      storage_root: str | None = None) -> dict:
    """POST /api/nodes/:id/files (``src/main.cpp:350-389``): 404 on unknown
    node, 400 "No files provided" when the multipart carried no file parts,
    else add every part (M4) and return the stored paths (201 envelope)."""
    nid = _parse_int(node_id, "id")
    if not engine.exists(nid):
        raise ApiError(404, f"Node not found: {nid}")
    if not files:
        raise ApiError(400, "No files provided")
    added = [engine.add_file(nid, name, data, storage_root)
             for name, data in files]
    return {"status": "success", "nodeId": nid, "addedFiles": added}


def _node_text(node: dict) -> str:
    """Single-node content assembly: newline-joined title/subject/description
    (``EmbeddingService.cpp:8-43`` / ``TagService.cpp:12-42`` metadata part;
    file-text enrichment is the batch path's job, ``assemble_node_text``)."""
    return "\n".join(str(node.get(c) or "")
                     for c in ("title", "subject", "description"))


def generate_node_embedding(engine: GraphEngine, node_id: Any,
                            embedder=None, dim: int = 64) -> dict:
    """POST /api/nodes/:id/embedding (``src/main.cpp:478-512``,
    ``EmbeddingService.cpp:45-62``): unconditionally re-embed ONE node's
    assembled text (even if an embedding exists — unlike the batch
    ``embed_missing``) and store it. Single-node by contract, so the one
    client call happens driver-side; the batch path stays in mapInPandas."""
    from thewhisperdb_spark.functions.llm import hash_embedder

    nid = _parse_int(node_id, "id")
    if not engine.exists(nid):
        raise ApiError(404, f"Node not found: {nid}")
    emb = (embedder or hash_embedder(dim))([_node_text(engine.find(nid))])[0]
    vec = F.array(*[F.lit(float(v)).cast("float") for v in emb])
    engine.nodes = engine.nodes.withColumn(
        "embedding",
        F.when(F.col("id") == nid, vec).otherwise(F.col("embedding")))
    return {"status": "success", "message": "Embedding generated",
            "nodeId": nid}


def generate_node_tags(engine: GraphEngine, node_id: Any,
                       tagger=None) -> dict:
    """POST /api/nodes/:id/tags (``src/main.cpp:580-615``,
    ``TagService.cpp:44-94``): tag ONE node from its assembled content,
    report which tags are new to the bank, add them (A8), REPLACE the node's
    tags, then merge-link it to Jaccard>=0.3 partners (bidirectional,
    append-if-absent — ``TagService.cpp:107-151``)."""
    from thewhisperdb_spark.functions.llm import keyword_tagger
    from thewhisperdb_spark.operators.tags import jaccard_partners

    nid = _parse_int(node_id, "id")
    if not engine.exists(nid):
        raise ApiError(404, f"Node not found: {nid}")
    content = _node_text(engine.find(nid)).strip()
    if not content:
        raise ApiError(500, "No content to generate tags from")
    bank = [r["tag"] for r in engine.tag_bank.collect()]
    if tagger is None:  # deterministic stand-in honoring TagClient's contract
        tagger = keyword_tagger(bank)
    tags = list(tagger([content])[0])
    new_tags = [t for t in tags if t not in set(bank)]
    if new_tags:
        engine.add_tags_to_bank(new_tags)
    engine.nodes = engine.nodes.withColumn(
        "tags", F.when(F.col("id") == nid,
                       F.array(*[F.lit(t) for t in tags]) if tags
                       else F.array().cast("array<string>"))
        .otherwise(F.col("tags")))
    # updateLinksForNode(nid, 0.3): partner set is per-node-k-sized (metadata
    # scale) — the array surgery stays JVM-side.
    partners = [r["id"] for r in
                jaccard_partners(engine.nodes, nid, threshold=0.3).collect()]
    if partners:
        mine = F.array(*[F.lit(int(p)).cast("long") for p in partners])
        engine.nodes = engine.nodes.withColumn(
            "linked_nodes",
            F.when(F.col("id") == nid,
                   F.array_union(F.coalesce(F.col("linked_nodes"),
                                            F.array().cast("array<long>")),
                                 mine))
            .when(F.col("id").isin(partners),
                  F.array_union(F.coalesce(F.col("linked_nodes"),
                                           F.array().cast("array<long>")),
                                F.array(F.lit(int(nid)).cast("long"))))
            .otherwise(F.col("linked_nodes")))
    return {"status": "success", "nodeId": nid, "tags": tags,
            "newTagsAdded": new_tags, "linkedNodes": sorted(partners)}


def tag_bank(engine: GraphEngine) -> dict:
    """GET /api/tags (``src/main.cpp:619-631``): the bank + its size."""
    bank = sorted(r["tag"] for r in engine.tag_bank.collect())
    return {"status": "success", "tagBank": bank, "count": len(bank)}


def tag_nodes(engine: GraphEngine, tag: str) -> dict:
    """GET /api/tags/:tag/nodes (``src/main.cpp:634-659``): full node
    envelopes for every node carrying the tag (J1 + F9 projection)."""
    from thewhisperdb_spark.operators.tags import nodes_by_tag

    rows = _node_rows(nodes_by_tag(engine.nodes, tag).orderBy("id"))
    return {"status": "success", "tag": tag, "nodes": rows,
            "count": len(rows)}


def link_all_tags(engine: GraphEngine, threshold: Any = 0.3) -> dict:
    """POST /api/tags/link-all (``src/main.cpp:662-694``,
    ``TagService.cpp:155-167``): batch-relink every tagged node at the
    Jaccard threshold (G5 — ONE self-join, vs the reference's per-node J4
    loop) and report how many new undirected links were created (each new
    pair counts once, matching the reference's already-linked skip)."""
    from thewhisperdb_spark.plans.jobs import relink_by_tags

    try:
        th = float(threshold)
    except (TypeError, ValueError):
        raise ApiError(400, "Invalid threshold parameter") from None
    if not (0.0 <= th <= 1.0):
        raise ApiError(400, "Threshold must be between 0 and 1")
    before = engine.edges().distinct().count()
    engine.nodes = relink_by_tags(engine.nodes, threshold=th)
    after = engine.edges().distinct().count()
    return {"status": "success", "linksCreated": (after - before) // 2,
            "threshold": th}


def clusters(engine: GraphEngine) -> dict:
    """GET /api/clusters (``src/main.cpp:697-726``, ``TagService.cpp:169-253``):
    connected components over the stored links (G2, singletons included),
    shared tags per the A5 >=2-occurrences rule (single-node clusters show
    all their tags), sorted by size desc and renumbered 1..n (A6)."""
    from thewhisperdb_spark.operators.aggregates import (
        cluster_sizes,
        shared_tags_per_cluster,
    )
    from thewhisperdb_spark.operators.graph import connected_components

    labels = connected_components(engine.nodes.select("id"), engine.edges())
    tagged = (engine.nodes.select("id", "tags")
              .join(labels.withColumnRenamed("component", "cluster_id"), "id"))
    ranked = cluster_sizes(tagged)  # (cluster_id, size, cluster_rank)
    shared = (shared_tags_per_cluster(tagged)
              .groupBy("cluster_id")
              .agg(F.array_sort(F.collect_list("tag")).alias("sharedTags")))
    members = (tagged.groupBy("cluster_id")
               .agg(F.array_sort(F.collect_list("id")).alias("members")))
    report = (ranked.join(members, "cluster_id")
              .join(shared, "cluster_id", "left")
              .orderBy("cluster_rank"))
    out = [{"id": r["cluster_rank"], "nodes": list(r["members"]),
            "size": r["size"], "sharedTags": list(r["sharedTags"] or [])}
           for r in report.collect()]
    return {"status": "success", "count": len(out), "clusters": out}


# ---------------------------------------------------------------------------
# transport-free router
# ---------------------------------------------------------------------------

# (method, path-pattern) endpoint table mirroring the reference's
# ``server->add_endpoint`` registrations (``src/main.cpp:63-577,392-406``).
# Patterns are '/'-segmented; ':name' segments capture path params. Order
# matters: '/api/nodes/count' is matched before '/api/nodes/:id', same as the
# reference's first-match loop (``src/server/wserver.cpp:226-231``).
_ROUTES: list[tuple[str, str]] = [
    ("GET", "/health"),
    ("GET", "/api/nodes/count"),
    ("GET", "/api/nodes/:id/similar"),
    ("GET", "/api/nodes/:id/files"),
    ("POST", "/api/nodes/:id/files"),
    ("POST", "/api/nodes/:id/embedding"),
    ("POST", "/api/nodes/:id/tags"),
    ("GET", "/api/nodes/:id"),
    ("GET", "/api/nodes"),
    ("POST", "/api/nodes"),
    ("PUT", "/api/nodes/:id"),
    ("DELETE", "/api/nodes/:id"),
    ("POST", "/api/tags/link-all"),
    ("GET", "/api/tags/:tag/nodes"),
    ("GET", "/api/tags"),
    ("GET", "/api/clusters"),
    ("POST", "/api/cluster"),
]

_LIST_PARAMS = ("sort", "order", "limit", "offset")


def _match(pattern: str, path: str) -> dict[str, str] | None:
    pseg = pattern.strip("/").split("/")
    seg = path.strip("/").split("/")
    if len(pseg) != len(seg):
        return None
    params: dict[str, str] = {}
    for p, s in zip(pseg, seg):
        if p.startswith(":"):
            params[p[1:]] = s
        elif p != s:
            return None
    return params


def _parse_body(body) -> dict:
    """JSON-body discipline of the reference's POST/PUT handlers: no body ->
    400 "No data received" (``src/main.cpp:196``), malformed JSON -> 400
    "Invalid JSON: ..." (``src/main.cpp:235``); a pre-parsed dict passes
    through (the multipart metadata part after extraction)."""
    import json

    if body is None or body == "":
        raise ApiError(400, "No data received")
    if isinstance(body, dict):
        return body
    try:
        parsed = json.loads(body)
    except (TypeError, ValueError) as e:
        raise ApiError(400, f"Invalid JSON: {e}") from None
    if not isinstance(parsed, dict):
        raise ApiError(400, "Invalid JSON body")
    return parsed


def dispatch(engine: GraphEngine, method: str, path: str,
             query: dict[str, str] | None = None, body=None,
             files: list[tuple[str, bytes]] | None = None,
             storage_root: str | None = None,
             embedder=None, tagger=None) -> tuple[int, dict]:
    """Route one request to its handler and return ``(http_status,
    envelope)`` — the reference's ``wserver.cpp`` request loop minus the
    socket: unknown path -> 404 "Endpoint not found", known path with the
    wrong method -> 405 "Method not allowed"
    (``src/server/wserver.cpp:233-243``), handler-raised ApiError -> its
    status with the error envelope, success -> 200 (201 for create)."""
    method = method.upper()
    query = query or {}
    matched = None
    path_exists = False
    for m, pattern in _ROUTES:
        params = _match(pattern, path)
        if params is None:
            continue
        path_exists = True
        if m == method:
            matched = (pattern, params)
            break
    try:
        if matched is None:
            if path_exists:
                raise ApiError(405, "Method not allowed")
            raise ApiError(404, "Endpoint not found")
        pattern, params = matched
        if pattern == "/health":
            return 200, {"status": "ok", "service": "TheWhisperDB",
                         "nodes_count": engine.count()}
        if pattern == "/api/nodes/count":
            filters = {k: v for k, v in query.items() if k in FILTER_KEYS}
            return 200, count_nodes(engine, filters)
        if pattern == "/api/nodes/:id/similar":
            return 200, similar_nodes(engine, params["id"],
                                      k=query.get("k", 10))
        if pattern == "/api/nodes/:id/files":
            if method == "GET":
                return 200, node_files(engine, params["id"])
            return 201, add_files_to_node(engine, params["id"], files,
                                          storage_root)
        if pattern == "/api/nodes/:id/embedding":
            return 200, generate_node_embedding(engine, params["id"],
                                                embedder=embedder)
        if pattern == "/api/nodes/:id/tags":
            return 200, generate_node_tags(engine, params["id"],
                                           tagger=tagger)
        if pattern == "/api/tags/link-all":
            return 200, link_all_tags(engine,
                                      query.get("threshold", 0.3))
        if pattern == "/api/tags/:tag/nodes":
            return 200, tag_nodes(engine, params["tag"])
        if pattern == "/api/tags":
            return 200, tag_bank(engine)
        if pattern == "/api/clusters":
            return 200, clusters(engine)
        if pattern == "/api/nodes/:id":
            if method == "GET":
                return 200, get_node(engine, params["id"])
            if method == "PUT":
                return 200, update_node(engine, params["id"],
                                        _parse_body(body))
            return 200, delete_node(engine, params["id"], storage_root)
        if pattern == "/api/nodes":
            if method == "GET":
                filters = {k: v for k, v in query.items() if k in FILTER_KEYS}
                return 200, list_nodes(
                    engine, filters,
                    sort=query.get("sort", "id"),
                    order=query.get("order", "asc"),
                    limit=query.get("limit", 0),
                    offset=query.get("offset", 0))
            return 201, create_node(engine, _parse_body(body), files,
                                    storage_root)
        # POST /api/cluster
        b = _parse_body(body) if body not in (None, "") else {}
        return 200, run_cluster_job(engine, b.get("threshold", 0.75))
    except ApiError as e:
        return e.status, {"status": "error", "message": str(e)}
