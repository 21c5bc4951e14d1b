"""Data-quality constraint checks (the Deequ/dbt-test shape, Spark-native):
declarative rules evaluated as aggregates, emitting one (check,
n_violations, n_rows) row per rule — the pre-publication gate a training-
data or warehouse pipeline runs before promoting a snapshot.

Design for scale: all PREDICATE rules over one table fold into a SINGLE
aggregate scan (each rule is one conditional sum — adding a rule costs an
expression, not a pass); uniqueness is one groupBy on the key; referential
integrity is one anti-join with the parent's key projection broadcast when
small. Nothing collects row-level violations — those are a filter away
with the same predicates, kept out of the report path on purpose.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REPORT_COLS = ("check", "n_violations", "n_rows")


def dq_predicate_report(df: DataFrame,
                        rules: dict[str, Column]) -> DataFrame:
    """Evaluate VIOLATION predicates in one scan. ``rules`` maps check
    name -> a Column that is true for violating rows (null predicate
    results count as violations — an unevaluable rule should fail loudly,
    matching NOT-NULL-style semantics). Returns (check, n_violations,
    n_rows) with one row per rule, assembled by a tiny literal explode of
    the 1-row aggregate."""
    aggs = [F.sum(F.coalesce(c.cast("long"), F.lit(1))).alias(f"_v{i}")
            for i, c in enumerate(rules.values())]
    row = df.agg(*aggs, F.count(F.lit(1)).alias("_n"))
    structs = [F.struct(F.lit(name).alias("check"),
                        F.coalesce(F.col(f"_v{i}"), F.lit(0))
                        .alias("n_violations"),
                        F.col("_n").alias("n_rows"))
               for i, name in enumerate(rules)]
    return (row.select(F.explode(F.array(*structs)).alias("r"))
            .select("r.check", "r.n_violations", "r.n_rows"))


def dq_unique_report(df: DataFrame, key_cols: list[str],
                     check: str) -> DataFrame:
    """Uniqueness: n_violations = rows belonging to a duplicated key
    (every member of a >1 group counts, so the number reads as 'rows you
    would have to inspect'). One partial-aggregating shuffle on the key;
    the totals ride the same aggregate (sum of group counts), so the
    source is scanned once."""
    per = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_c"))
    return (per.agg(
        F.coalesce(
            F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(F.lit(0))),
            F.lit(0)).cast("long").alias("n_violations"),
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_rows"))
        .select(F.lit(check).alias("check"), "n_violations", "n_rows"))


def dq_fk_report(child: DataFrame, parent: DataFrame, child_key: str,
                 parent_key: str, check: str) -> DataFrame:
    """Referential integrity: child rows whose key has no parent (NULL
    child keys are orphans too — use a predicate rule to allow optional
    FKs). Anti-join against the parent's DISTINCT key projection — the
    side that stays broadcastable long after the parent table itself
    outgrows it. Fully lazy: both counts are 1-row aggregates crossed
    together, no driver-side action."""
    orphans = (child.select(F.col(child_key))
               .join(parent.select(F.col(parent_key).alias(child_key))
                     .distinct(),
                     child_key, "left_anti")
               .agg(F.count(F.lit(1)).alias("n_violations")))
    total = child.agg(F.count(F.lit(1)).alias("n_rows"))
    return (orphans.crossJoin(total)
            .select(F.lit(check).alias("check"), "n_violations", "n_rows"))


def dq_union(*reports: DataFrame) -> DataFrame:
    """Assemble one report: union of per-rule rows, stable column set."""
    out = reports[0].select(*_REPORT_COLS)
    for r in reports[1:]:
        out = out.unionByName(r.select(*_REPORT_COLS))
    return out


def snapshot_drift_report(old: DataFrame, new: DataFrame,
                          key_col: str, min_share: float = 1e-6) -> DataFrame:
    """Distribution drift between two corpus snapshots over a categorical
    key (lang, source/domain, quality bucket) — the monitor a training-data
    pipeline runs per crawl to catch a mix shift (a scraper losing a
    domain, a language collapsing) BEFORE the snapshot is promoted.

    Per key: counts, shares, and the Population Stability Index
    contribution ``psi = (p_new − p_old) · ln(p_new / p_old)`` (the
    standard drift score; total PSI = sum of the column — the usual rule
    of thumb reads <0.1 stable, 0.1–0.25 drifting, >0.25 shifted). Keys
    absent from one snapshot get ``min_share`` as the floor instead of an
    infinite contribution (the industry epsilon convention), so
    new/vanished categories surface as LARGE-but-finite psi.

    Scale shape: one groupBy per snapshot (map-side combined), a
    broadcast 1-row total joined into each (flagged-by-design as a
    bounded nested-loop), and a full outer join on the (small,
    category-cardinality) aggregates — the fact tables are scanned once
    each and never joined row-to-row. Shares and psi round to 6 decimals
    (the repo's float-parity convention). Returns
    (key, n_old, n_new, share_old, share_new, psi)."""
    def shares(df: DataFrame, n_alias: str, s_alias: str) -> DataFrame:
        per = (df.groupBy(F.col(key_col).alias("key"))
               .agg(F.count(F.lit(1)).alias(n_alias)))
        tot = per.agg(F.sum(n_alias).alias("_tot"))
        return (per.join(F.broadcast(tot))
                .withColumn(s_alias,
                            F.col(n_alias).cast("double") / F.col("_tot"))
                .drop("_tot"))

    o = shares(old, "n_old", "share_old")
    n = shares(new, "n_new", "share_new")
    po = F.greatest(F.coalesce(F.col("share_old"), F.lit(0.0)),
                    F.lit(float(min_share)))
    pn = F.greatest(F.coalesce(F.col("share_new"), F.lit(0.0)),
                    F.lit(float(min_share)))
    return (o.join(n, "key", "full_outer")
            .select("key",
                    F.coalesce("n_old", F.lit(0)).alias("n_old"),
                    F.coalesce("n_new", F.lit(0)).alias("n_new"),
                    F.round(po, 6).alias("share_old"),
                    F.round(pn, 6).alias("share_new"),
                    F.round((pn - po) * F.log(pn / po), 6).alias("psi")))


# ---- compression-ratio quality signal --------------------------------------

COMPRESSION_SCHEMA_COLS = ("n_raw", "n_deflate", "deflate_ratio")


def compression_ratio(df: DataFrame, text_col: str = "text",
                      level: int = 6) -> DataFrame:
    """Append (n_raw, n_deflate, deflate_ratio): zlib-deflate size over
    UTF-8 byte size — the classic templated/spam text detector
    (boilerplate and repetition compress far below natural prose;
    random/encrypted blobs sit near or above 1.0). Arrow-batched
    ``mapInPandas`` (the DEFLATE bitstream has no JVM expression);
    ``level`` is pinned so the signal is deterministic across runs.
    Empty text gets ratio NULL (no bytes to compare)."""
    import zlib
    from collections.abc import Iterator as _It

    import pandas as pd
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType)

    out_schema = StructType(df.schema.fields + [
        StructField("n_raw", LongType()),
        StructField("n_deflate", LongType()),
        StructField("deflate_ratio", DoubleType()),
    ])
    cols = df.columns

    def run(batches: _It[pd.DataFrame]):
        for pdf in batches:
            raws, defs, ratios = [], [], []
            for t in pdf[text_col]:
                b = (t or "").encode("utf-8")
                c = len(zlib.compress(b, level))
                raws.append(len(b))
                defs.append(c)
                ratios.append(round(c / len(b), 6) if b else None)
            pdf = pdf.copy()
            pdf["n_raw"] = raws
            pdf["n_deflate"] = defs
            pdf["deflate_ratio"] = ratios
            yield pdf[cols + list(COMPRESSION_SCHEMA_COLS)]

    return df.mapInPandas(run, out_schema)


def quality_keep_verdict(df: DataFrame,
                         lm_model: tuple | None = None,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         min_words: int = 50, max_words: int = 100_000,
                         min_mean_len: float = 3.0,
                         max_mean_len: float = 10.0,
                         min_alpha_ratio: float = 0.8,
                         min_stopwords: int = 2,
                         max_repetition: float = 0.2, rep_n: int = 3,
                         max_bits_per_trigram: float = 9.0,
                         min_deflate_ratio: float = 0.10,
                         max_deflate_ratio: float = 1.10,
                         include_compression: bool = True) -> DataFrame:
    """The FineWeb-style quality ENSEMBLE (VERDICT r10 #8): the four
    independent signals this repo already computes — Gopher rule pass
    (``text.gopher_quality_flags``), word-trigram repetition
    (``text.repetition_ratio``), character-LM surprisal
    (``text.lm_doc_bits``, active iff ``lm_model=(counts, totals,
    vocab)`` from ``char_trigram_lm`` is given), and zlib compression
    ratio (``compression_ratio``, Arrow pass — set
    ``include_compression=False`` for a pure-JVM/SQL-derivable plan) —
    composed into ONE calibrated keep/drop verdict with per-rule
    attribution.

    Appends: the component stats, one ``<rule>_ok`` boolean per active
    rule (``gopher_ok``, ``repetition_ok``, ``lm_ok``,
    ``compression_ok``), ``fail_reasons`` (array of failed rule names,
    empty = clean), and ``keep`` = conjunction of active rules.
    Degenerate posture: a doc too short to score a rule FAILS that rule
    (no trigrams -> lm fail; empty text -> compression fail) — junk
    must not pass by being unmeasurable; ``fail_reasons`` says why.

    Scale shape: gopher/repetition are per-row expressions riding the
    scan; LM scoring is one explode + broadcast model join (charset-
    bounded model); compression is the one Arrow stage. Attribution
    DASHBOARDS are a plain aggregate over the rule booleans downstream.
    """
    from thewhisperdb_spark.operators.text import (
        gopher_quality_flags,
        lm_doc_bits,
        repetition_ratio,
    )

    out = gopher_quality_flags(
        df, text_col=text_col, min_words=min_words, max_words=max_words,
        min_mean_len=min_mean_len, max_mean_len=max_mean_len,
        min_alpha_ratio=min_alpha_ratio, min_stopwords=min_stopwords) \
        .withColumnRenamed("keep", "gopher_ok")
    rep = repetition_ratio(F.col(text_col), n=rep_n)
    out = out.withColumn("repetition_3", F.round(F.coalesce(
        rep, F.lit(0.0)), 6))
    out = out.withColumn(
        "repetition_ok", F.col("repetition_3") <= max_repetition)
    rules = ["gopher", "repetition"]
    if lm_model is not None:
        counts, totals, vocab = lm_model
        # LM scoring keys on a CONTENT hash of (id, text), not id alone:
        # callers don't always have unique ids (the streaming path keys
        # on url, and one crawl batch can carry the same URL twice), and
        # grouping trigram stats by a duplicated id would merge BOTH
        # documents' counts into one bits_per_trigram applied to every
        # duplicate row (ADVICE r11). Same (id, text) rows merging is
        # harmless — total_bits / n_trigrams is invariant under exact
        # duplication — and distinct texts under one id now score
        # independently. Null text folds to a sentinel so it cannot
        # alias a real text's hash.
        lmk = F.xxhash64(F.col(id_col).cast("string"),
                         F.coalesce(F.col(text_col),
                                    F.lit("\x00<null-text>")))
        keyed = (df.select(lmk.alias("_lmk"),
                           F.col(text_col))
                 .dropDuplicates(["_lmk"]))
        bits = lm_doc_bits(
            keyed, counts, totals, vocab,
            text_col=text_col, id_col="_lmk") \
            .select("_lmk",
                    F.round(F.col("total_bits")
                            / F.col("n_trigrams"), 6)
                    .alias("bits_per_trigram"))
        out = (out.withColumn("_lmk", lmk)
               .join(bits, "_lmk", "left").drop("_lmk")
               .withColumn("lm_ok",
                           F.coalesce(F.col("bits_per_trigram")
                                      <= max_bits_per_trigram,
                                      F.lit(False))))
        rules.append("lm")
    if include_compression:
        out = compression_ratio(out, text_col=text_col)
        out = out.withColumn(
            "compression_ok",
            F.coalesce(F.col("deflate_ratio").between(
                min_deflate_ratio, max_deflate_ratio), F.lit(False)))
        rules.append("compression")
    fails = F.filter(
        F.array(*[F.struct(F.lit(r).alias("r"),
                           F.col(f"{r}_ok").alias("ok"))
                  for r in rules]),
        lambda s: ~s["ok"])
    out = out.withColumn("fail_reasons",
                         F.transform(fails, lambda s: s["r"]))
    keep = F.lit(True)
    for r in rules:
        keep = keep & F.col(f"{r}_ok")
    return out.withColumn("keep", keep)


def quality_attribution_report(verdicts: DataFrame) -> DataFrame:
    """One row per rule over a ``quality_keep_verdict`` output:
    ``(rule, n_failed, n_sole_blocker, fail_rate, n_docs, n_kept)`` —
    ``n_sole_blocker`` counts docs ONLY that rule rejected (the
    calibration signal: a rule with many sole-blocks is doing real
    work; one with none is redundant at its threshold); ``n_docs`` /
    ``n_kept`` repeat the corpus totals on every row. One aggregate
    pass over the exploded fail_reasons + one 1-row broadcast join —
    no driver-side collect.

    Calibration recipe: this report is a single point per rule at the
    CURRENT thresholds; run :func:`quality_threshold_sweep` over a
    grid first to pick thresholds from the keep-rate /
    sole-blocker-rate curves, then read this report as the ongoing
    drift monitor at the chosen operating point."""
    tot = verdicts.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long")
        .alias("n_kept"))
    per_rule = (verdicts
                .select(F.explode("fail_reasons").alias("rule"),
                        (F.size("fail_reasons") == 1).alias("sole"))
                .groupBy("rule")
                .agg(F.count(F.lit(1)).cast("long").alias("n_failed"),
                     F.sum(F.when(F.col("sole"), 1).otherwise(0))
                     .cast("long").alias("n_sole_blocker")))
    return (per_rule.join(F.broadcast(tot))
            .withColumn("fail_rate",
                        F.round(F.col("n_failed")
                                / F.greatest(F.col("n_docs"), F.lit(1))
                                .cast("double"), 6))
            .select("rule", "n_failed", "n_sole_blocker", "fail_rate",
                    "n_docs", "n_kept"))


SWEEP_RULES = {
    "gopher_min_words": "gopher_ok",
    "repetition_max": "repetition_ok",
    "lm_max_bits": "lm_ok",
    "compression_max_ratio": "compression_ok",
}


def quality_threshold_sweep(verdicts: DataFrame,
                            grids: dict[str, list[float]],
                            max_words: int = 100_000,
                            min_mean_len: float = 3.0,
                            max_mean_len: float = 10.0,
                            min_alpha_ratio: float = 0.8,
                            min_stopwords: int = 2,
                            min_deflate_ratio: float = 0.10) -> DataFrame:
    """Keep-rate-vs-threshold calibration sweep over a
    ``quality_keep_verdict`` output (VERDICT r11 #3) — the pass every
    real deployment runs BEFORE fixing thresholds: for each
    (rule, candidate threshold) it reports, in ONE aggregation pass,
    what the corpus-level outcome would be if THAT rule moved to that
    threshold while every other rule stayed at its default verdict.

    ``grids`` maps a swept knob to its candidate values:
    ``gopher_min_words`` (keep needs ``n_words >= t`` plus the
    remaining gopher sub-rules at the fixed parameters),
    ``repetition_max`` (``repetition_3 <= t``), ``lm_max_bits``
    (``bits_per_trigram <= t``, unscored fails), and
    ``compression_max_ratio`` (``deflate_ratio`` in
    ``[min_deflate_ratio, t]``, unscored fails). Only rules whose
    columns exist in the verdict frame may be swept.

    Per (rule, threshold): ``n_failed``/``fail_rate`` = docs failing
    the swept rule alone; ``n_kept``/``keep_rate`` = docs passing the
    swept rule AND every other rule's default verdict;
    ``n_sole_blocker``/``sole_blocker_rate`` = docs the swept rule
    would reject while all other rules pass — the "is this threshold
    doing real work" curve ``quality_attribution_report`` gives a
    single point of.

    Semantics note: sweep booleans derive from the verdict frame's
    EMITTED stat columns; ``mean_word_len``/``alpha_word_ratio`` are
    rounded to 6 there, so a gopher rest-clause can disagree with the
    unrounded verdict only when a raw ratio sits within 5e-7 of a
    fixed threshold — impossible for k/n ratios until n approaches
    2M words.

    Scale shape: one explode of a literal (rule, threshold) array per
    row (grid-size fan-out, combined map-side) into a groupBy over
    |grid| groups — rides the verdict scan, no joins, no windows.
    """
    cols = set(verdicts.columns)
    bad = [r for r in grids
           if r not in SWEEP_RULES or SWEEP_RULES[r] not in cols]
    if bad:
        raise ValueError(
            f"cannot sweep {bad}: supported rules are "
            f"{sorted(SWEEP_RULES)} and the verdict frame must carry "
            "the rule's columns (lm/compression are opt-in)")
    if not grids:
        raise ValueError("grids must name at least one rule")
    entries = [F.struct(F.lit(r).alias("rule"),
                        F.lit(float(t)).alias("threshold"))
               for r in sorted(grids) for t in grids[r]]
    g = verdicts.withColumn("_g", F.explode(F.array(*entries)))
    thr = F.col("_g.threshold")
    rule = F.col("_g.rule")
    gopher_rest = ((F.col("n_words") <= max_words)
                   & F.col("mean_word_len").between(min_mean_len,
                                                    max_mean_len)
                   & (F.col("alpha_word_ratio") >= min_alpha_ratio)
                   & (F.col("n_required_stop") >= min_stopwords))
    ok_exprs = {
        "gopher_min_words": (F.col("n_words") >= thr) & gopher_rest,
        "repetition_max": F.col("repetition_3") <= thr,
        "lm_max_bits": F.coalesce(F.col("bits_per_trigram") <= thr,
                                  F.lit(False))
        if "lm_ok" in cols else None,
        "compression_max_ratio": F.coalesce(
            (F.col("deflate_ratio") >= min_deflate_ratio)
            & (F.col("deflate_ratio") <= thr), F.lit(False))
        if "compression_ok" in cols else None,
    }
    rule_cols = [c for c in ("gopher_ok", "repetition_ok", "lm_ok",
                             "compression_ok") if c in cols]
    ok_t = F.lit(None).cast("boolean")
    others_ok = F.lit(None).cast("boolean")
    for r in sorted(grids):
        ok_t = F.when(rule == r, ok_exprs[r]).otherwise(ok_t)
        oth = F.lit(True)
        for c in rule_cols:
            if c != SWEEP_RULES[r]:
                oth = oth & F.col(c)
        others_ok = F.when(rule == r, oth).otherwise(others_ok)
    n_docs = F.count(F.lit(1)).cast("long")
    cnt = (lambda cond: F.sum(F.when(cond, 1).otherwise(0))
           .cast("long"))
    agg = (g.groupBy(rule.alias("rule"), thr.alias("threshold"))
           .agg(n_docs.alias("n_docs"),
                cnt(~ok_t).alias("n_failed"),
                cnt(ok_t & others_ok).alias("n_kept"),
                cnt(~ok_t & others_ok).alias("n_sole_blocker")))
    rate = (lambda c: F.round(
        F.col(c) / F.greatest(F.col("n_docs"), F.lit(1))
        .cast("double"), 6))
    return agg.select(
        "rule", "threshold", "n_docs",
        "n_failed", rate("n_failed").alias("fail_rate"),
        "n_kept", rate("n_kept").alias("keep_rate"),
        "n_sole_blocker",
        rate("n_sole_blocker").alias("sole_blocker_rate"))
