"""Plan doctor: lint a DataFrame's PHYSICAL plan for the scale-killer
shapes this repo bans — the checks the global headline plan-gate test
runs, packaged for ad-hoc use on any query a user is about to ship.

Heuristics, not proofs: the linter reads the executed-plan string the
same way a reviewer does. Every finding names the operator and why it
bites at scale; an empty list means none of the KNOWN bad shapes
appeared, not that the plan is optimal.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# (pattern, why it bites at 100x) — order = severity
_RULES: list[tuple[str, str]] = [
    ("CartesianProduct",
     "cartesian product: |L|x|R| rows — an unintended cross join is the "
     "classic silent scale-killer; add the join condition or broadcast a "
     "1-row side"),
    ("BatchEvalPython",
     "row-at-a-time Python UDF: every row round-trips the JVM<->Python "
     "boundary unbatched; rewrite with built-in expressions or an "
     "Arrow-batched mapInPandas/applyInPandas"),
    ("StreamingSymmetricHashJoin.*(?:full|Full)",
     "unwatermarked stream-stream full join: state grows without bound"),
]


def _count_unbounded_conditionless_joins(df: DataFrame):
    """Walk the OPTIMIZED LOGICAL plan and return ``(n_unbounded,
    n_seen)`` over condition-less Cross/Inner joins: how many have
    NEITHER side provably bounded, and how many were visited at all.
    Catalyst's own ``maxRows`` is the proof engine: a global aggregate
    (no grouping keys) reports ``Some(1)``, a literal LocalRelation
    reports its fixed row count, limits/projections/joins propagate — so
    "the build side is a 1-row total/threshold/norm-constant broadcast"
    is checked mechanically instead of via a hand-maintained allowlist
    (VERDICT r7 item 7). A side the optimizer cannot bound (a filter on
    a fact table, however selective in practice) counts as unbounded —
    that is the conservative direction. ``n_seen`` exists so the CALLER
    can stay conservative too (code-review r9): when the physical plan
    shows a nested-loop join but this walker visits zero condition-less
    Join nodes (node-name drift across Spark versions, py4j quirks),
    suppression would be a silent false-negative — only a positive
    all-bounded proof (n_unbounded == 0 AND n_seen > 0) may suppress."""
    root = df._jdf.queryExecution().optimizedPlan()
    n_unbounded, n_seen = 0, 0
    stack = [root]
    while stack:
        node = stack.pop()
        try:
            ch = node.children()
            kids = [ch.apply(i) for i in range(ch.size())]
        except Exception:
            kids = []
        stack.extend(kids)
        if node.getClass().getSimpleName() != "Join":
            continue
        if not node.condition().isEmpty():
            continue
        if node.joinType().toString() not in ("Cross", "Inner"):
            continue
        n_seen += 1
        bounded = False
        for side in (node.left(), node.right()):
            mr = side.maxRows()
            if not mr.isEmpty() and int(mr.get()) <= 1:
                bounded = True
        if not bounded:
            n_unbounded += 1
    return n_unbounded, n_seen


def plan_lints(df: DataFrame) -> list[str]:
    """Return human-readable findings for known scale-killer operators in
    ``df``'s physical plan (empty list = none found)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = [why for pat, why in _RULES if re.search(pat, plan)]
    # a nested-loop join WITHOUT a condition is a cross product that
    # merely fit under the broadcast threshold today — same |L|x|R| blowup
    # when the build side grows. Intended 1-row-aggregate crossJoins
    # (totals, thresholds, norm constants) are AUTO-PASSED by proving the
    # bound on the logical plan (Catalyst maxRows == 1); only a POSITIVE
    # proof suppresses (code-review r9): if the logical walker finds no
    # condition-less Join to prove (node-name drift, py4j failure) while
    # the physical regex matched, the warning fires anyway — walker
    # failure must not read as "bounded".
    if re.search(r"BroadcastNestedLoopJoin\s+Build(?:Left|Right),"
                 r"\s+(?:Cross|Inner)[ \t]*(?:\n|$)", plan):
        try:
            n_unbounded, n_seen = _count_unbounded_conditionless_joins(df)
            proven_bounded = n_unbounded == 0 and n_seen > 0
        except Exception:
            proven_bounded = False
        if not proven_bounded:
            out.append(
                "condition-less nested-loop (cartesian) join: |L|x|R| when "
                "the build side grows — fine only if the build side is "
                "provably bounded (a 1-row aggregate); otherwise add the "
                "join condition")
    # single-partition global window over a plausibly-large input: an
    # Exchange SinglePartition feeding a Window (fine on aggregated
    # frames, fatal on facts — flag it with the caveat)
    # (the tree prints parent-first: the Window operator precedes its
    # SinglePartition child exchange in the string)
    if re.search(r"Window\b[\s\S]{0,500}?Exchange SinglePartition", plan):
        out.append(
            "global (single-partition) window: every row funnels through "
            "ONE task — fine over an already-aggregated small frame, fatal "
            "over a fact table; verify the window's input grain")
    # a parquet scan reading every column under a narrow projection
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if m and len([c for c in m.group(1).split(",") if c]) > 24:
        out.append(
            "scan reads >24 columns: column pruning may not have reached "
            "the source — check that the projection is declared before "
            "wide intermediate structs")
    return out
