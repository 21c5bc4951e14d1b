"""Engine-API facade mirroring the reference's REST surface
(``src/main.cpp`` endpoint handlers): same parameters, same envelope shapes,
same error discipline — on DataFrames instead of an in-memory node map.
Transport (HTTP/multipart parsing, ``src/server/wserver.cpp``) is out of
engine scope; this layer is what such a server would call.

Endpoint parity map:
- GET    /api/nodes            -> list_nodes      (``src/main.cpp:63-123``)
- GET    /api/nodes/:id        -> get_node        (``src/main.cpp:127-160``)
- POST   /api/nodes            -> create_node     (``src/main.cpp:164-238``)
- PUT    /api/nodes/:id        -> update_node     (``src/main.cpp:242-292``)
- DELETE /api/nodes/:id        -> delete_node     (``src/main.cpp:296-330``)
- GET    /api/nodes/count      -> count_nodes     (``src/main.cpp:334-369``)
- GET    /api/nodes/:id/similar-> similar_nodes   (``src/main.cpp:518-577``)
- POST   /api/cluster          -> run_cluster_job (``src/main.cpp:441-476``)
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
    ("GET", "/api/nodes/:id"),
    ("GET", "/api/nodes"),
    ("POST", "/api/nodes"),
    ("PUT", "/api/nodes/:id"),
    ("DELETE", "/api/nodes/:id"),
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
             storage_root: str | None = None) -> tuple[int, dict]:
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
