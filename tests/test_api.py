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
