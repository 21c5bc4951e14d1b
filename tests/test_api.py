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
