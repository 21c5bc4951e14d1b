"""Driver-contract shape checks (cheap — the heavy oracle comparison lives in
tools/selfcheck.py, run separately)."""

import __spark_entry__ as E


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert df.columns == ["doc_id", "lang", "source", "n_chars", "n_tags"]


def test_registry_shape():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 35
    assert set(oracles) <= set(qs)
    # every oracle references at least one registered table
    tables = ("documents", "embeddings", "events", "lineitem", "orders",
              "customer", "nation", "region", "part", "supplier")
    for key, sql in oracles.items():
        assert any(t in sql for t in tables), key


def test_spot_queries_run(spark):
    sf = "/root/testdata/sf0.001"
    qs = E.queries()
    for key in ("scan_nodes", "tpch_q1_pricing_summary", "topk_similar",
                "events_sessionize"):
        assert qs[key](spark, sf).count() > 0, key
