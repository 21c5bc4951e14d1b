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
    # the maintenance section (index rebuild keys, r9) is registered,
    # duplicate-free, and disjoint from the headline total
    assert [k for k in bench.MAINTENANCE if k not in qs] == []
    assert len(bench.MAINTENANCE) == len(set(bench.MAINTENANCE))
    assert not set(bench.MAINTENANCE) & set(bench.HEADLINE)
    # every MAINTENANCE key has a build/op phase factory and vice versa
    # (r10 split): a key in one registry but not the other would either
    # crash bench.py or silently skip the phase timing
    assert set(bench.MAINTENANCE) == set(E.maintenance_split())
    # reconstruct the summary line shape with worst-case float widths
    slowest = {k: 999.999 for k in bench.HEADLINE[:10]}
    line = json.dumps({
        "metric": "headline_queries_total_sec", "value": 99999.999,
        "unit": "sec", "sf": 0.1, "n_queries": len(bench.HEADLINE),
        "queries": slowest})
    assert len(line) < 1500


def test_stamp_freshness_rotation_converges():
    """VERDICT r8 #3 / r10 #5: nothing previously ENFORCED that the
    stalest-first rotation actually converges — this does. The bound is
    REGISTRY-SIZE-DERIVED (VERDICT r10: a fixed '5 rounds' silently
    diluted as the registry grew): with N keys and a ~50-key driver
    window, steady state re-stamps every key within ceil(N/50) rounds,
    so no key's latest green stamp may be older than ceil(N/50)+1
    rounds relative to the newest committed CORRECTNESS file (the +1 is
    the key the CURRENT round's window is about to re-stamp; older
    means the rotation broke). Growth policy (documented here because
    this bound is the budget): prefer extending an existing key or
    landing composites that subsume older keys over minting new
    near-twin keys — every +50 keys costs one more round of stamp
    staleness for the whole registry. Never-stamped keys are allowed
    only while they'd land in the next driver window (the rotation
    fronts them)."""
    green = E._driver_green_rounds()
    assert green, "no committed CORRECTNESS rows parsed"
    import glob
    import math
    import os
    import re

    here = os.path.dirname(os.path.abspath(E.__file__))
    latest_round = max(
        int(re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
    bound = math.ceil(len(E._REGISTRY) / 50) + 1
    stale = {k: latest_round - rnd for k, rnd in green.items()
             if k in E._REGISTRY and latest_round - rnd > bound}
    assert not stale, (
        f"rotation broke: {len(stale)} keys with latest green stamp "
        f"older than {bound} rounds (= ceil({len(E._REGISTRY)}/50)+1) "
        f"vs r{latest_round}: "
        f"{sorted(stale.items(), key=lambda kv: -kv[1])[:10]}")
    # the window the driver checks next must BE the stalest cohort:
    # every never-stamped key plus the oldest stamps come first
    ordered = list(E.queries())
    window = set(ordered[:50])
    unstamped = [k for k in ordered if k not in green]
    assert len(unstamped) <= 50, (
        f"{len(unstamped)} never-stamped keys exceed one driver window — "
        "stop adding keys until the rotation catches up")
    assert set(unstamped) <= window
    if len(unstamped) < 50:
        oldest_in = max(green[k] for k in window if k in green)
        oldest_out = min((green[k] for k in ordered[50:] if k in green),
                        default=oldest_in)
        assert oldest_in <= oldest_out, (
            "window is not stalest-first: a fresher stamp sits inside the "
            "window while a staler one waits outside")
