"""Property-based tests (hypothesis) for the algebraic invariants the
operator library leans on. Each test collects a BATCH of generated inputs
into one DataFrame so a hypothesis example costs one Spark job, and keeps
max_examples small — the properties are exact (no tolerance), so a handful
of adversarial-ish draws is worth more than thousands of tiny ones.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# derandomize: the properties are exact invariants (any draw that fails is
# a real bug), and the driver's verification run must never flake on an
# unlucky generation-health path
SETTINGS = settings(max_examples=5, deadline=None, derandomize=True,
                    suppress_health_check=[HealthCheck.too_slow])


def _py_h_index(xs: list[int]) -> int:
    xs = sorted(xs, reverse=True)
    h = 0
    for i, v in enumerate(xs, start=1):
        if v >= i:
            h = i
    return h


@SETTINGS
@given(st.lists(st.lists(st.integers(min_value=0, max_value=50),
                         min_size=1, max_size=30),
                min_size=1, max_size=40))
def test_h_index_expr_matches_reference(spark, arrays):
    from thewhisperdb_spark.operators.graph import _h_index

    df = spark.createDataFrame([(i, a) for i, a in enumerate(arrays)],
                               "i long, arr array<long>")
    got = {r.i: r.h for r in
           df.select("i", _h_index(F.col("arr")).alias("h")).collect()}
    assert got == {i: _py_h_index(a) for i, a in enumerate(arrays)}


@SETTINGS
@given(st.lists(
    st.tuples(st.sets(st.text(alphabet="abcdefgh", min_size=1, max_size=4),
                      min_size=1, max_size=12),
              st.sets(st.text(alphabet="abcdefgh", min_size=1, max_size=4),
                      min_size=1, max_size=12)),
    min_size=1, max_size=15))
def test_minhash_signature_union_is_elementwise_min(spark, pairs):
    """MinHash's defining algebra: sig(A ∪ B) == elementwise_min(sig(A),
    sig(B)), and the signature depends only on the SET (order/duplicate
    invariance). Exact — no estimator tolerance involved."""
    from thewhisperdb_spark.operators.dedup import minhash_signature

    rows = [(i, sorted(a), sorted(b), sorted(a | b))
            for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(
        rows, "i long, a array<string>, b array<string>, u array<string>")
    n = 16
    out = df.select(
        "i",
        minhash_signature(F.col("a"), n_hashes=n).alias("sa"),
        minhash_signature(F.col("b"), n_hashes=n).alias("sb"),
        minhash_signature(F.col("u"), n_hashes=n).alias("su"),
        minhash_signature(F.reverse(F.concat(F.col("a"), F.col("a"))),
                          n_hashes=n).alias("sa_dup"),
    ).collect()
    for r in out:
        assert [min(x, y) for x, y in zip(r.sa, r.sb)] == list(r.su)
        assert list(r.sa) == list(r.sa_dup)  # order/duplicate invariance


def _py_gopher(text: str):
    ws = [w for w in text.split(" ") if w != ""]
    n = len(ws)
    chars = sum(len(w) for w in ws)
    alpha = sum(1 for w in ws if any(c.isascii() and c.isalpha() for c in w))
    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    stop = len({w.lower() for w in ws} & stops)
    denom = max(n, 1)
    return (n, round(chars / denom, 6), round(alpha / denom, 6), stop)


@SETTINGS
@given(st.lists(
    st.lists(st.text(alphabet="abc THEof123", min_size=1, max_size=8),
             min_size=0, max_size=80).map(" ".join),
    min_size=1, max_size=25))
def test_gopher_stats_match_reference(spark, texts):
    from thewhisperdb_spark.operators.text import gopher_quality_flags

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r.doc_id: (r.n_words, r.mean_word_len, r.alpha_word_ratio,
                      r.n_required_stop)
           for r in gopher_quality_flags(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _py_gopher(t), f"doc {i}: {t!r}"
