"""In-suite DuckDB-oracle parity for the round-2 query additions at sf0.001.

The driver's CORRECTNESS harness appears to evaluate a bounded window of
queries() entries per round; this test gives the newest oracle-checked keys
standing verification inside pytest regardless of that window (same
comparator as tools/selfcheck.py: rowcount + column set + order-insensitive
value hash)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import selfcheck  # noqa: E402  (tools/selfcheck.py)

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

ROUND2_KEYS = [
    "token_entropy_score",
    "bpe_pair_counts",
    "phrase_search",
    "bloom_semi_join_lineitem",
    "scd2_point_in_time_join",
    "orc_roundtrip_by_source",
    "rolling_active_users_7d",
    "part_cooccurrence_top",
    "window_analytics_suite",
    "fuzzy_vocab_pairs",
    "dedup_exact_seeded",
    "sql_interface_demo",
    "hybrid_search_rrf",
    "bfs_hops",
]


@pytest.fixture(scope="module")
def duck():
    con = selfcheck.duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("key", ROUND2_KEYS)
def test_round2_key_matches_oracle(spark, duck, key):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert key in oracles, f"{key} is declared oracle-checked"
    problems = selfcheck.compare_key(spark, duck, qs, oracles, key, SF_DIR)
    assert not problems, f"{key}: {problems}"
