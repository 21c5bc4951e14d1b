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


def test_verification_queue_ordering_rule():
    """queries() must lead with keys the driver has never stamped green
    (derived from committed CORRECTNESS files), oracle-backed before
    rows-only, stamped keys last — the self-maintaining rotation that
    replaced the hand-edited list in round 4."""
    green = E._driver_green_rounds()
    assert green, "no committed CORRECTNESS rows parsed"
    keys = list(E.queries())
    oracles = E.oracle_sql()
    seen_rows_only = seen_stamped = False
    for k in keys:
        if k in green:
            seen_stamped = True
            continue
        assert not seen_stamped, (
            f"unstamped key {k} ordered after a stamped key")
        if k not in oracles:
            seen_rows_only = True
        else:
            assert not seen_rows_only, (
                f"oracle-backed unstamped {k} ordered after rows-only keys")
    # bench headliners must all be registered
    import bench

    missing = [k for k in bench.HEADLINE if k not in keys]
    assert not missing, missing


def test_spot_queries_run(spark):
    sf = "/root/testdata/sf0.001"
    qs = E.queries()
    for key in ("scan_nodes", "tpch_q1_pricing_summary", "topk_similar",
                "events_sessionize"):
        assert qs[key](spark, sf).count() > 0, key


def test_bench_headline_contract():
    """Every bench headline key must be a registered query, with no
    duplicates — and the compact summary line bench.py prints last must
    stay well inside the driver's ~2KB stdout tail capture (round 4
    recorded parsed:null when the one-line JSON outgrew it)."""
    import json

    import bench

    qs = E.queries()
    missing = [k for k in bench.HEADLINE if k not in qs]
    assert missing == []
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    # reconstruct the summary line shape with worst-case float widths
    slowest = {k: 999.999 for k in bench.HEADLINE[:10]}
    line = json.dumps({
        "metric": "headline_queries_total_sec", "value": 99999.999,
        "unit": "sec", "sf": 0.1, "n_queries": len(bench.HEADLINE),
        "queries": slowest})
    assert len(line) < 1500
