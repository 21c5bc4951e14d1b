"""API-facade parity with the reference's endpoint envelopes and error codes
(CURL_TESTS.md golden outputs: list/get/create/update/delete/count/similar,
404/400 paths)."""

from __future__ import annotations

import pytest

from thewhisperdb_spark import api
from thewhisperdb_spark.crud import GraphEngine
from thewhisperdb_spark.functions.llm import hash_embedder


@pytest.fixture()
def engine(spark):
    e = GraphEngine(spark)
    api.create_node(e, {"title": "Spark Intro", "author": "ada", "subject": "cs",
                        "course": 101, "tags": ["spark", "intro"]})
    api.create_node(e, {"title": "Advanced Spark", "author": "ada", "subject": "cs",
                        "course": 201, "tags": ["spark"]})
    api.create_node(e, {"title": "Poetry", "author": "cat", "subject": "lit"})
    return e


def test_list_filter_sort_paginate(engine):
    env = api.list_nodes(engine, {"author": "ada"}, sort="course", order="desc")
    assert env["status"] == "success" and env["count"] == 2
    assert [n["course"] for n in env["nodes"]] == [201, 101]
    # title substring filter (F4), not equality
    env = api.list_nodes(engine, {"title": "Spark"})
    assert env["count"] == 2
    # tag membership (F5)
    env = api.list_nodes(engine, {"tag": "intro"})
    assert env["count"] == 1
    # pagination envelope carries limit/offset
    env = api.list_nodes(engine, sort="id", limit=2, offset=1)
    assert env["limit"] == 2 and env["offset"] == 1
    assert [n["id"] for n in env["nodes"]] == [2, 3]
    # unknown sort key falls back to id (GraphDB.cpp:60-82)
    env = api.list_nodes(engine, sort="bogus")
    assert [n["id"] for n in env["nodes"]] == [1, 2, 3]
    # unparseable course filter excludes everything (GraphDB.cpp:119-122)
    assert api.count_nodes(engine, {"course": "NaN"})["count"] == 0


def test_get_update_delete_errors(engine):
    assert api.get_node(engine, 1)["node"]["title"] == "Spark Intro"
    # embedding omitted from the envelope when absent (GNode.cpp:132-134)
    assert "embedding" not in api.get_node(engine, 1)["node"]
    with pytest.raises(api.ApiError) as e:
        api.get_node(engine, 99)
    assert e.value.status == 404
    with pytest.raises(api.ApiError) as e:
        api.get_node(engine, "abc")
    assert e.value.status == 400
    with pytest.raises(api.ApiError) as e:
        api.create_node(engine, {"author": "x", "subject": "s"})
    assert e.value.status == 400
    # id is stripped from patches (src/main.cpp:275)
    api.update_node(engine, 1, {"id": 999, "title": "Renamed"})
    assert api.get_node(engine, 1)["node"]["title"] == "Renamed"
    api.delete_node(engine, 3)
    assert api.count_nodes(engine)["count"] == 2
    with pytest.raises(api.ApiError) as e:
        api.delete_node(engine, 3)
    assert e.value.status == 404


@pytest.mark.slow  # crash/replay marathon: CI-tier
def test_similar_and_cluster_job(engine):
    # no embedding yet -> 400 (src/main.cpp:539-546 error path)
    with pytest.raises(api.ApiError) as e:
        api.similar_nodes(engine, 1)
    assert e.value.status == 400
    # cluster job embeds missing nodes, links similar ones
    out = api.run_cluster_job(engine, threshold=0.95,
                              embedder=hash_embedder(16), dim=16)
    assert out["status"] == "success"
    stats = out["statistics"]
    assert stats["nodesProcessed"] == 3 and stats["embeddingsGenerated"] == 3
    env = api.similar_nodes(engine, 1, k=2)
    assert env["count"] == 2
    assert all("similarity" in n for n in env["nodes"])
    sims = [n["similarity"] for n in env["nodes"]]
    assert sims == sorted(sims, reverse=True)


def test_dispatch_error_matrix(engine):
    """The reference's documented error paths (CURL_TESTS.md:326-445) through
    the transport-free router: every row is (request) -> (status code,
    error envelope) exactly as the golden curl outputs discriminate them."""
    # node not found -> 404 {"status":"error","message":...}
    code, env = api.dispatch(engine, "GET", "/api/nodes/999")
    assert code == 404 and env["status"] == "error"
    assert "999" in env["message"]
    # wrong method on an existing path -> 405 "Method not allowed"
    code, env = api.dispatch(engine, "DELETE", "/api/nodes")
    assert (code, env) == (405, {"status": "error",
                                 "message": "Method not allowed"})
    # missing required field -> 400
    code, env = api.dispatch(engine, "POST", "/api/nodes",
                             body={"title": "Без автора"})
    assert code == 400 and env["status"] == "error"
    # invalid JSON -> 400 "Invalid JSON: ..."
    code, env = api.dispatch(engine, "POST", "/api/nodes", body="{invalid}")
    assert code == 400 and env["message"].startswith("Invalid JSON")
    # empty body -> 400 "No data received" (src/main.cpp:196)
    code, env = api.dispatch(engine, "POST", "/api/nodes", body=None)
    assert (code, env) == (400, {"status": "error",
                                 "message": "No data received"})
    # unknown endpoint -> 404 "Endpoint not found"
    code, env = api.dispatch(engine, "GET", "/api/unknown")
    assert (code, env) == (404, {"status": "error",
                                 "message": "Endpoint not found"})
    # non-integer id -> 400 (endpoint.hpp int param coercion)
    code, env = api.dispatch(engine, "GET", "/api/nodes/abc")
    assert code == 400 and env["status"] == "error"


def test_dispatch_crud_roundtrip(engine):
    """CURL_TESTS.md full CRUD script (:389-445) through dispatch: health ->
    create -> get -> update -> verify -> list -> delete -> verify-gone."""
    code, env = api.dispatch(engine, "GET", "/health")
    assert code == 200 and env["status"] == "ok"
    assert env["service"] == "TheWhisperDB" and env["nodes_count"] == 3

    code, env = api.dispatch(
        engine, "POST", "/api/nodes",
        body='{"title":"Test Node","author":"Tester","subject":"Testing"}')
    assert code == 201 and env["status"] == "success"
    nid = env["nodeId"]

    code, env = api.dispatch(engine, "GET", f"/api/nodes/{nid}")
    assert code == 200 and env["node"]["title"] == "Test Node"

    code, env = api.dispatch(
        engine, "PUT", f"/api/nodes/{nid}",
        body='{"title":"Updated Title","description":"Added description"}')
    assert code == 200 and env["status"] == "success"
    code, env = api.dispatch(engine, "GET", f"/api/nodes/{nid}")
    assert env["node"]["title"] == "Updated Title"

    code, env = api.dispatch(engine, "GET", "/api/nodes")
    assert code == 200 and env["count"] == 4
    code, env = api.dispatch(engine, "GET", "/api/nodes/count",
                             query={"author": "Tester"})
    assert code == 200 and env["count"] == 1

    code, env = api.dispatch(engine, "DELETE", f"/api/nodes/{nid}")
    assert code == 200 and env["status"] == "success"
    code, env = api.dispatch(engine, "GET", f"/api/nodes/{nid}")
    assert code == 404 and env["status"] == "error"


# ---------------------------------------------------------------------------
# the 8 routes added for full main.cpp parity (r10)
# ---------------------------------------------------------------------------

def test_node_files_routes(engine, tmp_path):
    """GET/POST /api/nodes/:id/files golden matrix (CURL_TESTS.md:251-296):
    list envelope {nodeId, files}, add envelope {nodeId, addedFiles} at 201,
    multi-part add, 404 unknown node, 400 no files."""
    root = str(tmp_path)
    code, env = api.dispatch(engine, "GET", "/api/nodes/1/files")
    assert code == 200 and env == {"status": "success", "nodeId": 1,
                                   "files": []}
    code, env = api.dispatch(engine, "POST", "/api/nodes/1/files",
                             files=[("notes.txt", b"hello")],
                             storage_root=root)
    assert code == 201 and env["nodeId"] == 1 and len(env["addedFiles"]) == 1
    assert env["addedFiles"][0].endswith(".txt")
    # multi-file add (CURL_TESTS.md:284-291)
    code, env = api.dispatch(engine, "POST", "/api/nodes/1/files",
                             files=[("a.pdf", b"%PDF"), ("b.png", b"\x89PNG")],
                             storage_root=root)
    assert code == 201 and len(env["addedFiles"]) == 2
    code, env = api.dispatch(engine, "GET", "/api/nodes/1/files")
    assert env["files"][0].endswith(".txt") and len(env["files"]) == 3
    # first file set storage_path (GraphDB.cpp:416-448)
    assert api.get_node(engine, 1)["node"]["storage_path"].endswith(".txt")
    # error rows
    code, env = api.dispatch(engine, "GET", "/api/nodes/999/files")
    assert code == 404 and "999" in env["message"]
    code, env = api.dispatch(engine, "POST", "/api/nodes/999/files",
                             files=[("x", b"y")])
    assert code == 404
    code, env = api.dispatch(engine, "POST", "/api/nodes/1/files", files=[])
    assert (code, env) == (400, {"status": "error",
                                 "message": "No files provided"})
    # wrong method on the files path -> 405
    code, env = api.dispatch(engine, "PUT", "/api/nodes/1/files")
    assert code == 405


def test_generate_embedding_route(engine):
    """POST /api/nodes/:id/embedding (main.cpp:478-512): unconditional
    re-embed of one node; 404 unknown node."""
    code, env = api.dispatch(engine, "POST", "/api/nodes/2/embedding")
    assert code == 200 and env == {"status": "success",
                                   "message": "Embedding generated",
                                   "nodeId": 2}
    node = api.get_node(engine, 2)["node"]
    assert len(node["embedding"]) == 64
    first = list(node["embedding"])
    # regenerating after a text change REPLACES (EmbeddingService.cpp:45-62)
    api.update_node(engine, 2, {"title": "Entirely different"})
    api.dispatch(engine, "POST", "/api/nodes/2/embedding")
    assert api.get_node(engine, 2)["node"]["embedding"] != first
    code, env = api.dispatch(engine, "POST", "/api/nodes/999/embedding")
    assert code == 404
    code, env = api.dispatch(engine, "GET", "/api/nodes/2/embedding")
    assert code == 405


def test_generate_tags_route(engine):
    """POST /api/nodes/:id/tags (TagService.cpp:44-94): tags replace, new
    tags enter the bank, node gets merge-linked to Jaccard>=0.3 partners."""
    code, env = api.dispatch(engine, "POST", "/api/nodes/1/tags")
    assert code == 200 and env["nodeId"] == 1
    assert env["tags"], "content-bearing node must yield tags"
    # every reported new tag is now in the bank
    bank = api.tag_bank(engine)["tagBank"]
    assert set(env["newTagsAdded"]) <= set(bank)
    # node's tags were REPLACED with the generated set
    assert api.get_node(engine, 1)["node"]["tags"] == env["tags"]
    # second call: same deterministic tags, nothing new for the bank
    code, env2 = api.dispatch(engine, "POST", "/api/nodes/1/tags")
    assert env2["tags"] == env["tags"] and env2["newTagsAdded"] == []
    # linked nodes are mirrored bidirectionally (TagService.cpp:107-133)
    for other in env2["linkedNodes"]:
        assert 1 in api.get_node(engine, other)["node"]["linked_nodes"]
    code, env = api.dispatch(engine, "POST", "/api/nodes/999/tags")
    assert code == 404


def test_tag_bank_and_nodes_by_tag_routes(engine):
    """GET /api/tags + GET /api/tags/:tag/nodes (main.cpp:619-659)."""
    engine.add_tags_to_bank(["spark", "intro"])
    code, env = api.dispatch(engine, "GET", "/api/tags")
    assert code == 200 and env["count"] == len(env["tagBank"]) == 2
    code, env = api.dispatch(engine, "GET", "/api/tags/spark/nodes")
    assert code == 200 and env["tag"] == "spark" and env["count"] == 2
    assert [n["id"] for n in env["nodes"]] == [1, 2]
    # full node envelopes, embedding omitted when absent (F9)
    assert all("title" in n and "embedding" not in n for n in env["nodes"])
    code, env = api.dispatch(engine, "GET", "/api/tags/nosuch/nodes")
    assert code == 200 and env["count"] == 0 and env["nodes"] == []
    code, env = api.dispatch(engine, "DELETE", "/api/tags")
    assert code == 405


def test_link_all_and_clusters_routes(engine):
    """POST /api/tags/link-all + GET /api/clusters (main.cpp:662-726):
    batch relink creates each new undirected link once; clusters report
    components size-desc renumbered with the >=2-shared-tags rule."""
    code, env = api.dispatch(engine, "POST", "/api/tags/link-all")
    assert code == 200 and env["threshold"] == 0.3
    # nodes 1,2 share 'spark' (J=1/2 vs {spark,intro} -> 0.5 >= 0.3): 1 link
    assert env["linksCreated"] == 1
    # idempotent: re-running creates nothing new (already-linked skip)
    code, env = api.dispatch(engine, "POST", "/api/tags/link-all")
    assert env["linksCreated"] == 0
    # threshold validation rows (main.cpp:668-680)
    code, env = api.dispatch(engine, "POST", "/api/tags/link-all",
                             query={"threshold": "1.5"})
    assert (code, env["message"]) == (400, "Threshold must be between 0 and 1")
    code, env = api.dispatch(engine, "POST", "/api/tags/link-all",
                             query={"threshold": "abc"})
    assert (code, env["message"]) == (400, "Invalid threshold parameter")

    code, env = api.dispatch(engine, "GET", "/api/clusters")
    assert code == 200 and env["count"] == 2
    big, single = env["clusters"]
    assert (big["id"], big["size"], big["nodes"]) == (1, 2, [1, 2])
    # shared tags = tags on >=2 members: 'spark' only
    assert big["sharedTags"] == ["spark"]
    # singleton shows ALL its tags (TagService.cpp:225-231); node 3 has none
    assert (single["id"], single["nodes"], single["sharedTags"]) == (2, [3], [])
    code, env = api.dispatch(engine, "POST", "/api/clusters")
    assert code == 405
