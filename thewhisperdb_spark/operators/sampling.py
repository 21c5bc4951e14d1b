"""Deterministic sampling + skew-safe aggregation (training-pipeline surface).

A 100 TB corpus is sampled constantly — eval slices, ablation subsets, manual
QA draws — and `rand()`-based sampling is non-reproducible across runs and
engines. Everything here keys off a content hash (md5 of the row id), so the
same row lands in the same sample on any engine, any partitioning, any day:
the sample is a *property of the data*, not of the run. All expressions are
built-in SQL (JVM codegen, embarrassingly parallel, no shuffle for the flat
sample; one bounded shuffle for the stratified variant).

Skew-safe aggregation: two-phase rewrites that keep a hot key (one user with
10% of all events, one language with 90% of the corpus) from pinning a single
reducer. Spark's map-side partial aggregation already handles skewed
`SUM`/`COUNT`; the rewrites that matter are the ones with per-key state —
COUNT(DISTINCT) and collect-like aggregates — where phase 1 spreads the hot
key's state across `(key, salt)` or `(key, value)` groups and phase 2 merges
bounded partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample_key(id_col: Column) -> Column:
    """Deterministic per-row sample key in [0, 256): the first byte of
    md5(id-as-string). md5 is bit-identical everywhere (engine, platform,
    version), unlike `rand(seed)`, whose stream depends on partitioning."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 2), 16, 10).cast("int")


def hash_sample(df: DataFrame, keep_bytes: int, id_col: str = "doc_id") -> DataFrame:
    """Keep rows whose sample key < keep_bytes, i.e. a keep_bytes/256 fraction.
    Filter-only: pushes to the scan, no shuffle, reproducible across engines."""
    return df.filter(sample_key(F.col(id_col)) < keep_bytes)


def stratified_sample(df: DataFrame, strata_col: str, n_per_stratum: int,
                      id_col: str = "doc_id") -> DataFrame:
    """First n_per_stratum rows per stratum in deterministic md5 order (a
    uniform draw within each stratum, reproducible). One shuffle on the
    stratum key; per-stratum state is a bounded top-n heap (rank pushdown),
    so a giant stratum costs memory O(n_per_stratum), not O(|stratum|)."""
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col))
    return (df.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= n_per_stratum))


def mixture_sample(df: DataFrame, rates: dict[str, float], strata_col: str,
                   default_rate: float = 0.0,
                   id_col: str = "doc_id") -> DataFrame:
    """Training-mix resampling: keep each stratum at its configured rate
    (e.g. web 0.5, code 1.0, forums 0.25 — the knob every pretraining data
    recipe turns). Rates quantize to 256ths of the md5 sample key, so the
    draw is deterministic AND nested: raising a rate strictly grows the kept
    set without reshuffling rows already in it (ablations stay comparable).
    Filter-only -> rides the scan, no shuffle."""
    key = sample_key(F.col(id_col))
    thresh = F.lit(int(round(default_rate * 256)))
    for value, rate in rates.items():
        br = F.lit(int(round(rate * 256)))
        thresh = F.when(F.col(strata_col) == value, br).otherwise(thresh)
    return df.filter(key < thresh)


def mixture_weights(df: DataFrame, strata_col: str = "source",
                    text_col: str = "text",
                    targets: dict[str, float] | None = None) -> DataFrame:
    """The planning half of mixture_sample: per stratum (source/domain),
    actual document and token counts, the stratum's token share, and the
    resampling weight that would move the mix to its target share
    (target/actual — the number a data recipe feeds into per-domain
    up/down-sampling). ``targets`` maps stratum -> target share; default is
    a uniform mix across the observed strata.

    One per-doc token count riding the scan, one partial-aggregating
    shuffle on the stratum key; corpus totals come from a global window
    over the already-aggregated |strata|-row frame (a single-partition
    window is exactly right at that size, and it avoids re-scanning the
    corpus for a separate totals aggregate — .explain shows one
    ReadSchema, not two). Returns (strata_col, n_docs, n_tokens,
    token_share, mix_weight), ratios rounded to 6.

    Unknown-target validation is LAZY (a raise_error column over the
    |strata|-row aggregate, see below) and therefore only fires when at
    least one stratum row exists: on an EMPTY corpus there are zero rows
    for the guard to evaluate, so unknown targets pass silently and the
    result is simply empty. Documented trade-off (ADVICE r5) — the empty
    frame is unambiguous ("no data"), and the alternative eager emptiness
    check would re-introduce the double corpus scan the lazy guard was
    built to remove."""
    from thewhisperdb_spark.operators.text import token_count

    per = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col)).cast("long")).alias("n_tokens"))
    wall = Window.partitionBy()
    out = per.withColumn("_total", F.sum("n_tokens").over(wall)) \
             .withColumn("_n_strata", F.count(F.lit(1)).over(wall))
    if targets is None:
        target = F.lit(1.0) / F.col("_n_strata")
    else:
        # a target key matching no observed stratum is almost always a typo
        # that would silently zero-weight the real stratum — fail loudly.
        # The check is LAZY (raise_error over the |strata|-row window, no
        # eager collect): the old plan-construction-time .collect() forced
        # a full corpus aggregation twice — once for the check, once when
        # the returned frame ran (ADVICE r4).
        matched = F.sum(
            F.when(F.col(strata_col).isin(list(targets)), 1).otherwise(0)
        ).over(wall)
        guard = F.when(
            matched < F.lit(len(set(targets))),
            F.raise_error(F.concat(
                F.lit("mixture_weights: targets name strata not present "
                      "in the data; expected all of "),
                F.lit(str(sorted(targets))))).cast("double"))
        # observed strata absent from `targets` get weight 0.0 — the
        # explicit "drop unlisted domains" semantic
        target = F.lit(0.0)
        for value, share in targets.items():
            target = F.when(F.col(strata_col) == value,
                            F.lit(float(share))).otherwise(target)
        target = F.coalesce(guard, target)
    share = F.col("n_tokens").cast("double") / F.col("_total")
    return out.select(
        strata_col, "n_docs", "n_tokens",
        F.round(share, 6).alias("token_share"),
        F.round(target / share, 6).alias("mix_weight"))


def weighted_sample_aes(df: DataFrame, k: int, weight_col: str = "n_chars",
                        id_col: str = "doc_id") -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    each row gets key u^(1/w) for a uniform u and weight w; the k largest
    keys ARE a weighted sample without replacement. Ranking by
    -ln(u)/w ascending is the same order in exact arithmetic and
    numerically safer (no underflow for tiny u^(1/w) at large w).

    u derives from the id via integer arithmetic — multiply by Knuth's
    2654435761, mod the prime 1000003, shift into (0,1) — identical on any
    engine, so the sample is reproducible like everything else here. Plan:
    per-partition top-k (TakeOrderedAndProject) — no full sort, no shuffle
    beyond the k-row merge at the driver-side limit."""
    u = ((F.col(id_col) * F.lit(2654435761)) % F.lit(1000003) + 1) / 1000004.0
    ekey = (-F.log(u) / F.col(weight_col))
    return (df.filter(F.col(weight_col) > 0)
            .withColumn("ekey", ekey)
            .orderBy("ekey", id_col)
            .limit(k))


def skew_safe_count_distinct(df: DataFrame, key_col: str, distinct_col: str,
                             alias: str = "n_distinct") -> DataFrame:
    """COUNT(DISTINCT x) GROUP BY k as two shuffles with bounded state:
    phase 1 dedups on (k, x) — the hot key's distinct set is spread across
    every (k, x) hash bucket instead of materializing in one reducer's
    hash set — phase 2 counts rows per k (stateless sum). Same result as
    the direct form; at 100 TB the direct form's per-key distinct set is
    the thing that OOMs."""
    return (df.select(key_col, distinct_col).distinct()
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).alias(alias)))


def salted_sum(df: DataFrame, key_col: str, value_col: Column, salt_col: Column,
               salt_mod: int, sum_alias: str, count_alias: str = "n_rows") -> DataFrame:
    """SUM + COUNT per key via explicit (key, salt) partials then a per-key
    merge of ``salt_mod`` bounded partials. The explicit form of what AQE
    skew-split does at runtime; result is identical to the direct groupBy
    when ``value_col`` is exactly additive (use a decimal cast for doubles —
    float partial merge order would otherwise perturb low bits)."""
    salted = df.withColumn("_salt", F.pmod(salt_col, F.lit(salt_mod)))
    p1 = salted.groupBy(key_col, "_salt").agg(
        F.sum(value_col).alias("_psum"), F.count(F.lit(1)).alias("_pn"))
    return p1.groupBy(key_col).agg(
        F.sum("_psum").alias(sum_alias), F.sum("_pn").alias(count_alias))


def per_stratum_cap(df: DataFrame, strata_col: str, cap: int, order_col: str,
                    id_col: str = "doc_id") -> DataFrame:
    """Per-domain quota cap: keep at most ``cap`` rows per stratum, best
    first (``order_col`` descending, id tiebreak) — the standard guard
    against a single domain (one crawl host, one source) dominating a
    training mix. Unlike ``stratified_sample``'s uniform draw, this is a
    quality-ranked quota.

    One shuffle on the stratum key; rank-pushdown keeps per-key state at
    O(cap) (Spark's WindowGroupLimit prunes rows past the cap before the
    sort spills), so a pathological million-row stratum costs the cap,
    not the stratum.
    """
    w = Window.partitionBy(strata_col).orderBy(
        F.col(order_col).desc(), F.col(id_col))
    return (df.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= cap))


def three_way_split(df: DataFrame, train_hex: str = "cc", val_hex: str = "e6",
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic train/val/test assignment from the md5 hex prefix of
    the id: split is a pure function of the row, so every engine, run, and
    repartitioning agrees, and growing the corpus never moves an existing
    row between splits (the contamination-safety property random splits
    lack). Default bounds: 'cc'/256 ~ 79.7% train, ~10.2% val, rest test.
    Filter-free single projection — rides the scan."""
    key = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    return df.withColumn(
        "split",
        F.when(key < train_hex, "train")
        .when(key < val_hex, "val")
        .otherwise("test"))


def sample_quantiles(df: DataFrame, value_col: str, id_cols: list[str],
                     qs: tuple[float, ...] = (0.25, 0.5, 0.75),
                     group_cols: tuple[str, ...] = (),
                     k: int = 512, portable: bool = True) -> DataFrame:
    """Deterministic mergeable quantile estimates: the k rows with the
    smallest md5(id) per group form a REPRODUCIBLE uniform sample (same
    rows on any engine, partitioning, or cluster size — the quantile
    analog of the KMV bottom-k sketch, and mergeable the same way: the
    union's bottom-k by id-hash is within each side's), and each quantile
    is the sample value at rank ceil(q·n) (discrete convention, ties in
    value broken by the id hash). Selection only, no arithmetic on the
    values — so unlike t-digest/GK sketches the result is bit-identical
    across engines and directly oracle-checkable. Below k rows the sample
    is the whole group and the quantiles are exact.

    Error: sample quantiles of a uniform k-sample sit within
    O(sqrt(q(1-q)/k)) of the true quantile rank w.h.p. — k=512 gives
    ~±2 percentile points at the median.

    Returns (group..., n_sample, q_<percent> per requested q).

    ``portable=False`` swaps the md5 sample key for xxhash64 — ~2x
    faster scans (the md5 IS the dominant cost on wide tables, same
    trade the MinHash family documents) at the price of oracle/cross-
    engine reproducibility; single-engine deployments can take it."""
    from thewhisperdb_spark.operators.aggregates import md5_hash60

    if portable:
        hid = md5_hash60(F.concat_ws("|", *[F.col(c).cast("string")
                                            for c in id_cols]))
    else:
        hid = F.xxhash64(*[F.col(c) for c in id_cols])
    base = df.select(*group_cols, F.col(value_col).alias("_v"),
                     hid.alias("_h"))
    # EXACT two-phase bottom-k: with few groups a single per-group window
    # sorts the whole table across |groups| tasks. Phase 1 ranks within
    # (group, salt) — 32x the parallelism — and keeps each bucket's own
    # bottom-k (the true group bottom-k is a subset of the union of
    # per-salt bottom-k's, so nothing is lost); phase 2 cuts the final k
    # from the <= 32k survivors. Same rows, bounded sort sizes.
    salt = F.pmod(F.col("_h"), F.lit(32))
    wpre = (Window.partitionBy(*[F.col(c) for c in group_cols], salt)
            .orderBy("_h"))
    pruned = (base.withColumn("_rk", F.row_number().over(wpre))
              .filter(F.col("_rk") <= k).drop("_rk"))
    wsel = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("_h")
    sample = (pruned.withColumn("_rk", F.row_number().over(wsel))
              .filter(F.col("_rk") <= k).drop("_rk"))
    wval = (Window.partitionBy(*[F.col(c) for c in group_cols])
            .orderBy("_v", "_h"))
    ranked = (sample.withColumn("_rv", F.row_number().over(wval))
              .withColumn("_n", F.count(F.lit(1)).over(
                  Window.partitionBy(*[F.col(c) for c in group_cols]))))
    aggs = [F.count(F.lit(1)).alias("n_sample")]
    for q in qs:
        target = F.ceil(F.lit(q) * F.col("_n")).cast("long")
        aggs.append(
            F.max(F.when(F.col("_rv") == target, F.col("_v")))
            .alias(f"q_{int(round(q * 100))}"))
    return ranked.groupBy(*group_cols).agg(*aggs)


def epoch_schedule(df: DataFrame, budget_tokens: int,
                   targets: dict[str, float] | None = None,
                   max_epochs: float | None = None,
                   strata_col: str = "source",
                   text_col: str = "text") -> DataFrame:
    """The data-recipe table a pretraining run is actually configured
    from (the Llama-style "sampling proportion + epochs" per dataset):
    given an absolute token ``budget_tokens`` and per-stratum target
    shares, how many tokens each domain contributes, how many passes
    (epochs) over the domain that implies, and — when ``max_epochs``
    bounds acceptable repetition (data-constrained scaling: repeating a
    small domain too often stops helping) — where the cap binds and
    what mix the budget then actually realizes.

    Per stratum: ``n_tokens`` available, ``target_share``,
    ``tokens_requested`` = round(budget * share),
    ``epochs_uncapped`` = requested/available (4dp),
    ``tokens_planned`` = min(requested, round(available * max_epochs)),
    ``epochs`` = planned/available (4dp), ``capped`` flag, and
    ``realized_share`` = planned / Σ planned (6dp) — the share drift the
    cap causes (un-renormalized by design: the gap between target_share
    and realized_share IS the signal that the recipe needs more data or
    a higher cap; silent renormalization would hide it).

    Same scale shape as mixture_weights: one per-doc token count riding
    the scan, one partial-aggregating shuffle on the stratum key, then
    all schedule arithmetic over the |strata|-row frame (the global
    window there is the documented single-partition carve-out — it IS
    the right plan at dimension size). All quantities are integers or
    round()-pinned ratios of integers and double literals, so a SQL
    oracle re-derives them exactly. ``targets`` defaults to uniform;
    unknown-target validation is the same lazy raise_error guard as
    mixture_weights.
    """
    from thewhisperdb_spark.operators.text import token_count

    per = df.groupBy(strata_col).agg(
        F.sum(token_count(F.col(text_col)).cast("long")).alias("n_tokens"))
    wall = Window.partitionBy()
    out = per.withColumn("_n_strata", F.count(F.lit(1)).over(wall))
    if targets is None:
        share = F.lit(1.0) / F.col("_n_strata")
    else:
        matched = F.sum(
            F.when(F.col(strata_col).isin(list(targets)), 1).otherwise(0)
        ).over(wall)
        guard = F.when(
            matched < F.lit(len(set(targets))),
            F.raise_error(F.concat(
                F.lit("epoch_schedule: targets name strata not present "
                      "in the data; expected all of "),
                F.lit(str(sorted(targets))))).cast("double"))
        share = F.lit(0.0)
        for value, s in targets.items():
            share = F.when(F.col(strata_col) == value,
                           F.lit(float(s))).otherwise(share)
        share = F.coalesce(guard, share)
    requested = F.round(F.lit(int(budget_tokens)) * share, 0).cast("long")
    if max_epochs is None:
        planned = requested
    else:
        cap = F.round(F.col("n_tokens") * F.lit(float(max_epochs)), 0) \
               .cast("long")
        planned = F.least(requested, cap)
    # degenerate posture (tests/test_degenerate_inputs.py contract): a
    # stratum with ZERO available tokens (empty/whitespace docs) plans 0
    # tokens regardless of cap mode — you cannot upsample data that does
    # not exist — with epochs NULL (not Inf/NaN from the 0-division) and
    # capped = "the request was not met". Explicit rows, never dropped.
    planned = F.when(F.col("n_tokens") == 0, F.lit(0)).otherwise(planned)
    out = (out
           .withColumn("target_share", F.round(share, 6))
           .withColumn("tokens_requested", requested)
           .withColumn("tokens_planned", planned))
    ep = lambda c: F.when(
        F.col("n_tokens") > 0,
        F.round(c.cast("double") / F.col("n_tokens"), 4))
    return (out
            .withColumn("_planned_total",
                        F.sum("tokens_planned").over(wall))
            .select(
                strata_col, "n_tokens", "target_share", "tokens_requested",
                ep(F.col("tokens_requested")).alias("epochs_uncapped"),
                "tokens_planned",
                ep(F.col("tokens_planned")).alias("epochs"),
                (F.col("tokens_planned") < F.col("tokens_requested"))
                .alias("capped"),
                F.when(F.col("_planned_total") > 0,
                       F.round(F.col("tokens_planned").cast("double")
                               / F.col("_planned_total"), 6))
                .alias("realized_share")))
