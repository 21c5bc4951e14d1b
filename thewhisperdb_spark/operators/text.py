"""Text derivations + text-analysis operators (SURVEY §2.9, §2.11).

Tokenization here is the shared building block: ``documents.text`` stands in
for the reference's tag arrays (FIXTURES.md §2 mapping), so ``tags_of`` =
distinct whitespace tokens. Everything stays in built-in SQL functions
(whole-stage codegen, no Python in the hot path).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# A small multilingual stopword list for the quality / language heuristics.
# Deterministic + public knowledge; good enough for the synthetic corpus.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(col: Column) -> Column:
    """Whitespace tokens, empty strings dropped."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))


def tags_of(col: Column) -> Column:
    """Distinct token set — the documents-table analog of node ``tags``."""
    return F.array_distinct(tokens(col))


def with_tags(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("tags", tags_of(F.col(text_col)))


def token_count(col: Column) -> Column:
    """Token counting (north-star text analysis): whitespace tokens."""
    return F.size(tokens(col))


# GPT-2-style pre-tokenizer pattern, restricted to constructs shared by Java
# regex (Spark) and RE2 (DuckDB oracle): contractions, space-prefixed letter
# runs, digit runs, punctuation runs, residual whitespace. No lookahead (RE2
# has none).
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count(col: Column) -> Column:
    """Token counting, BPE-ish flavor (north-star text analysis): counts
    pre-tokenizer segments — the standard proxy for LLM token budgets when the
    real vocabulary isn't at hand. One codegen'd regexp_count, no Python."""
    return F.regexp_count(col, F.lit(BPE_ISH_PATTERN))


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Character n-gram shingles (dedup building block). Pure SQL:
    sequence over offsets -> substring -> distinct."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(1))),
            lambda i: F.substring(col, i, n),  # noqa: B023 — substring(col, start, len)
        )
    )


def word_ngrams(col: Column, n: int = 5) -> Column:
    """Word n-gram shingles (dedup building block) — the operating point the
    published web-scale dedup pipelines use (word 5-grams): ~6× fewer shingles
    per document than char-3-grams on English text, and far less cross-document
    background overlap. Docs shorter than ``n`` words yield one whole-doc
    shingle.

    The token array is bound through a single-element ``transform`` lambda so
    it is evaluated once per row: referencing the ``tokens(col)`` expression
    directly inside the per-shingle lambda would re-run the split for every
    shingle after Catalyst's projection collapse (measured ~10× slower)."""
    def ngrams_of(tk: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tk) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
        )

    return F.array_distinct(
        F.element_at(F.transform(F.array(tokens(col)), ngrams_of), 1)
    )


def word_ngrams_all(col: Column, n: int = 3) -> Column:
    """Word n-grams WITH multiplicity (repetition analysis needs the
    duplicates that the shingle variant's array_distinct drops). Same
    bind-once trick as word_ngrams. Docs shorter than ``n`` words yield one
    whole-doc gram."""
    def ngrams_of(tk: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tk) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
        )

    return F.element_at(F.transform(F.array(tokens(col)), ngrams_of), 1)


def repetition_ratio(col: Column, n: int = 3) -> Column:
    """Gopher-style repetition signal: fraction of word n-gram occurrences
    that are repeats, 1 - distinct/total (0 = no repetition). Exact-integer
    division -> bit-identical across engines. Pure SQL over one bound gram
    array; embarrassingly parallel."""
    grams = word_ngrams_all(col, n)
    stat = F.transform(
        F.array(grams),
        lambda g: F.lit(1.0) - F.size(F.array_distinct(g)).cast("double") / F.size(g))
    return F.element_at(stat, 1)


def unigram_surprisal(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Corpus-trained unigram LM scoring — the cheap stand-in for the
    perplexity quality filter every pretraining pipeline runs: documents made
    of globally-rare tokens score high (gibberish/noise candidates), ones
    made of common tokens score low.

    Two passes over the corpus, both scale-shaped: (1) token frequencies =
    explode + partial-aggregated count (the Zipf head combines map-side);
    (2) score = token->frequency equi-join + per-doc mean of -ln(p). The
    frequency table is vocab-sized: broadcast it when bounded, shuffle-join
    when web-scale. Per-token surprisals are rounded to 9 dp and summed as
    DECIMAL so the per-doc mean is independent of partial-merge order.
    Returns (id_col, n_tokens, avg_surprisal); token-less documents come
    back as (id, 0, 0.0) rather than silently vanishing through the
    explode (same rule as token_entropy — a missing score row could let a
    junk doc slip past a downstream filter)."""
    tok = df.select(F.col(id_col).alias("_id"),
                    F.explode(tokens(F.col(text_col))).alias("w"))
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    surp = (tok.join(freq, "w")
            .crossJoin(F.broadcast(total))
            .select("_id",
                    F.round(-F.log(F.col("cnt").cast("double")
                                   / F.col("total")), 9)
                    .cast("decimal(18,9)").alias("s")))
    scored = (surp.groupBy("_id")
              .agg(F.count(F.lit(1)).alias("n_tokens"),
                   F.round((F.sum("s").cast("double")
                            / F.count(F.lit(1))), 4).alias("avg_surprisal"))
              .select(F.col("_id").alias(id_col), "n_tokens",
                      "avg_surprisal"))
    # same cheap token-less predicate as token_entropy (rlike, no re-split)
    empties = (df.filter(
        ~F.coalesce(F.col(text_col).rlike(r"\S"), F.lit(False)))
        .select(F.col(id_col),
                F.lit(0).cast("long").alias("n_tokens"),
                F.lit(0.0).alias("avg_surprisal")))
    return scored.unionByName(empties)


def truncate_text(col: Column, limit: int = 8000, ellipsis: bool = False) -> Column:
    """S8 truncation semantics: extract caps at 8000 chars
    (``src/embedding/TextExtractor.cpp:10,19-24``); the tagging path uses a
    2000-char cap + ``"..."`` suffix (``src/tagging/TagService.cpp:32-36``)."""
    cut = F.substring(col, 1, limit)
    if not ellipsis:
        return cut
    return F.when(F.length(col) > limit, F.concat(cut, F.lit("..."))).otherwise(col)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """North-star quality scoring: length, token stats, stopword ratio,
    punctuation ratio, alpha ratio — all codegen'd column expressions."""
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    return df.select(
        *df.columns,
        n_chars.alias("q_chars"),
        n_tok.alias("q_tokens"),
        (n_chars.cast("double") / F.greatest(n_tok, F.lit(1))).alias("q_avg_token_len"),
        (n_stop.cast("double") / F.greatest(n_tok, F.lit(1))).alias("q_stopword_ratio"),
        (n_punct.cast("double") / F.greatest(n_chars, F.lit(1))).alias("q_punct_ratio"),
        (n_alpha.cast("double") / F.greatest(n_chars, F.lit(1))).alias("q_alpha_ratio"),
    )


# Required-stopword set for the Gopher document-quality rule
# (Rae et al. 2021, "Scaling Language Models: ... Gopher", appendix A1.1:
# a document must contain at least 2 of these to pass).
GOPHER_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that",
                             "have", "with")


def gopher_quality_flags(df: DataFrame, text_col: str = "text",
                         min_words: int = 50, max_words: int = 100_000,
                         min_mean_len: float = 3.0,
                         max_mean_len: float = 10.0,
                         min_alpha_ratio: float = 0.8,
                         min_stopwords: int = 2) -> DataFrame:
    """Gopher-style document-quality rule pass (Rae et al. 2021, A1.1):
    word-count bounds, mean-word-length bounds, alpha-word ratio, and the
    required-stopword rule, plus the conjunctive ``keep`` verdict. The whole
    pass is per-row column expressions over ONE bound token array (the same
    bind-once trick as word_ngrams — the split runs once per row, not once
    per statistic): embarrassingly parallel, rides the scan, no shuffle.

    Adds: n_words, mean_word_len, alpha_word_ratio (both rounded to 6),
    n_required_stop, keep. Thresholds compare the UNROUNDED ratios."""
    added = ("n_words", "mean_word_len", "alpha_word_ratio",
             "n_required_stop", "keep", "_st")
    clash = [c for c in df.columns if c in added]
    if clash:
        raise ValueError(
            f"input already has column(s) {clash} that this pass would "
            "add — rename or drop them first (re-running the pass on its "
            "own output is the usual cause)")
    stop_lit = F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPWORDS])
    st = F.element_at(
        F.transform(
            F.array(tokens(F.col(text_col))),
            lambda ws: F.struct(
                F.size(ws).cast("long").alias("n"),
                F.aggregate(ws, F.lit(0).cast("long"),
                            lambda a, w: a + F.length(w)).alias("chars"),
                F.size(F.filter(
                    ws, lambda w: w.rlike("[A-Za-z]"))).cast("long")
                .alias("alpha"),
                F.size(F.array_intersect(
                    F.array_distinct(F.transform(ws, F.lower)), stop_lit))
                .cast("long").alias("stop"),
            )),
        1)
    out = df.withColumn("_st", st)
    n = F.col("_st.n")
    denom = F.greatest(n, F.lit(1))
    mean_len = F.col("_st.chars").cast("double") / denom
    alpha_ratio = F.col("_st.alpha").cast("double") / denom
    keep = (n.between(min_words, max_words)
            & mean_len.between(min_mean_len, max_mean_len)
            & (alpha_ratio >= min_alpha_ratio)
            & (F.col("_st.stop") >= min_stopwords))
    return out.select(
        *df.columns,
        n.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        F.col("_st.stop").alias("n_required_stop"),
        keep.alias("keep"))


def top_ngram_char_stats(df: DataFrame, ns: tuple[int, ...] = (2, 3, 4),
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Gopher repetition rule, "top n-gram" family: per document and per n,
    the most frequent word n-gram and the fraction of the document's
    characters its occurrences account for (count x gram length / text
    length). High top-2/3/4-gram char fractions flag boilerplate loops.

    Shape: one explode of all tagged gram arrays -> one (doc, n, gram)
    count aggregate -> per-(doc, n) ``min_by`` argmax over the ordering
    key (-count, gram): highest count, lexicographically smallest gram on
    ties — as one more hash aggregate instead of a window sort (two
    map-side-combining aggregates, zero sorts). Nothing is per-row
    quadratic, so an 8k-token document costs 8k rows per n, not 64M HOF
    steps.

    Returns (id_col, n, top_gram, top_cnt, char_frac); char_frac rounded
    to 6."""
    d = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"),
                  F.length(text_col).cast("long").alias("len"))
    tagged = d.select(
        "id", "len",
        F.explode(F.array(*[
            F.struct(F.lit(n).cast("long").alias("n"),
                     word_ngrams_all(F.col("t"), n).alias("gs"))
            for n in ns])).alias("x"))
    g = tagged.select("id", "len", F.col("x.n").alias("n"),
                      F.explode("x.gs").alias("g"))
    cnt = g.groupBy("id", "len", "n", "g").agg(
        F.count(F.lit(1)).alias("cnt"))
    top = cnt.groupBy("id", "len", "n").agg(
        F.min_by(F.struct("g", "cnt"),
                 F.struct((-F.col("cnt")).alias("nc"), F.col("g")))
        .alias("m"))
    return top.select(
        F.col("id").alias(id_col), "n",
        F.col("m.g").alias("top_gram"),
        F.col("m.cnt").alias("top_cnt"),
        F.round((F.col("m.cnt") * F.length("m.g")).cast("double")
                / F.greatest(F.col("len"), F.lit(1)), 6)
        .alias("char_frac"))


def dup_ngram_char_fraction(df: DataFrame, n: int = 5,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Gopher repetition rule, "duplicate n-gram" family: fraction of a
    document's characters accounted for by word n-grams that occur more
    than once (Σ count x gram length over duplicated grams / text length —
    the standard overlap-tolerant approximation, so values can exceed 1 on
    degenerate loops). Explode -> count -> conditional sum in ONE corpus
    scan: every document yields at least one gram (word_ngrams_all's
    whole-doc fallback), so zero-dup docs get their 0.0 row from the
    aggregate itself — no join back to the input.

    Returns (id_col, dup_frac)."""
    d = df.select(F.col(id_col).alias("id"),
                  F.length(text_col).cast("long").alias("len"),
                  F.explode(word_ngrams_all(F.col(text_col), n)).alias("g"))
    cnt = d.groupBy("id", "len", "g").agg(F.count(F.lit(1)).alias("cnt"))
    return (cnt.groupBy("id", "len")
            .agg(F.sum(F.when(F.col("cnt") > 1,
                              F.col("cnt") * F.length("g"))
                       .otherwise(F.lit(0))).alias("dup_chars"))
            .select(F.col("id").alias(id_col),
                    F.round(F.col("dup_chars").cast("double")
                            / F.greatest(F.col("len"), F.lit(1)), 6)
                    .alias("dup_frac")))


def winnow_fingerprints(df: DataFrame, k: int = 5, w: int = 4,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS scheme): hash every char ``k``-gram, then keep the
    MINIMUM hash of each sliding window of ``w`` consecutive k-grams. The
    selected set is position-robust (insertions shift positions but leave
    distant selections untouched) and guarantees any match of length
    >= w + k - 1 shares a fingerprint — the localization property plain
    MinHash lacks.

    Execution: the ENTIRE selection happens in-row as array HOFs — hash the
    gram array once (bind-once trick so Catalyst's projection collapse
    can't re-derive it per window), take array_min over each w-slice,
    array_distinct, explode. No shuffle, no window sort: the operator rides
    the scan, and cost is O(n_grams x w) per document. Hashes are
    md5-derived 60-bit values, so the set is engine-portable and the whole
    operator oracle-checkable; within-window hash ties are astronomically
    unlikely at 60 bits and cannot change the selected SET anyway (the
    tied value is what's selected). Docs shorter than one window select
    the minimum of their available grams (the slice truncates).

    Returns (id_col, fingerprint) — one row per distinct selected hash.
    """
    grams = F.transform(
        F.sequence(F.lit(1),
                   F.greatest(F.length(text_col) - (k - 1), F.lit(1))),
        lambda i: F.substring(F.col(text_col), i, k))  # noqa: B023
    hashes = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"))

    def selected_of(hs):
        starts = F.sequence(F.lit(1), F.greatest(F.size(hs) - (w - 1),
                                                 F.lit(1)))
        return F.array_distinct(
            F.transform(starts, lambda i: F.array_min(F.slice(hs, i, w))))

    sels = F.element_at(F.transform(F.array(hashes), selected_of), 1)
    return df.select(F.col(id_col).alias(id_col),
                     F.explode(sels).alias("fingerprint"))


def winnow_overlap_pairs(df: DataFrame, k: int = 5, w: int = 4,
                         min_shared: int = 3, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Winnowing-based near-dup candidates: document pairs sharing at least
    ``min_shared`` selected fingerprints — the MOSS matching step. Shared
    winnowed prints localize overlap (each shared print certifies a shared
    substring of length >= k), so the overlap count grades HOW MUCH
    verbatim text two documents share, not just whether their token bags
    look alike.

    Shape: fingerprint equi-join, Σ df(print)² like every candidate join
    here — winnowing keeps ~2/(w+1) of gram positions, so the inverted
    index is ~3x slimmer than raw shingles at the same k. Boilerplate-hot
    prints are the residual risk at corpus scale: cap them with the same
    document-frequency argument as shingle_jaccard_pairs(max_df=...), or
    route through minhash_lsh_pairs when the corpus is stop-print heavy.

    Returns (a, b, n_shared)."""
    # materialize the fingerprints once (optimization r12): both sides
    # of the self-join reference fp, and without a barrier the md5
    # winnowing selection re-runs per branch (the same store-once trade
    # as minhash_lsh_pairs' signature checkpoint)
    fp = winnow_fingerprints(df, k=k, w=w, id_col=id_col,
                             text_col=text_col).localCheckpoint(eager=True)
    x = fp.select(F.col(id_col).alias("a"),
                  F.col("fingerprint").alias("f"))
    y = fp.select(F.col(id_col).alias("b"),
                  F.col("fingerprint").alias("f"))
    return (x.join(y, "f")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))


def fingerprint(col: Column) -> Column:
    """Document fingerprinting (north-star): order-insensitive 60-bit content
    fingerprint = XOR of per-token md5-derived hashes of the DISTINCT token
    set (distinct -> no duplicate tokens, so XOR's even-count cancellation
    can't trigger; XOR, not sum: ANSI mode rejects long overflow). md5 (not
    xxhash64) so the fingerprint is engine-portable — any engine with md5
    re-derives identical fingerprints, and the operator is
    oracle-checkable."""
    return F.aggregate(
        F.transform(tags_of(col),
                    lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10)
                    .cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseXOR(x),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """North-star language-ID heuristic: pick the language whose stopword set
    overlaps the token set most. The synthetic corpus is English-vocab, so this
    is exercised structurally (scores + argmax) rather than linguistically."""
    profiles = {
        "en": ("the", "and", "of", "to"),
        "es": ("el", "la", "de", "que"),
        "fr": ("le", "la", "et", "que"),
        "de": ("der", "die", "und", "das"),
    }
    toks = F.array_distinct(F.transform(tokens(F.col(text_col)), F.lower))
    scores = F.map_from_arrays(
        F.array(*[F.lit(k) for k in profiles]),
        F.array(*[
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
            for words in profiles.values()
        ]),
    )
    entries = F.map_entries(scores)
    best = F.array_max(F.transform(entries, lambda e: F.struct(e["value"].alias("s"), e["key"].alias("k"))))
    return df.select(*df.columns, best["k"].alias("predicted_lang"), best["s"].alias("lang_score"))


def bm25_scores(df: DataFrame, terms: list[str], text_col: str = "text",
                id_col: str = "doc_id", k1: float = 1.2,
                b: float = 0.75) -> DataFrame:
    """BM25 relevance of every document against a fixed query term set
    (Robertson–Spärck Jones probabilistic ranking; the Lucene-default IDF
    variant ``ln(1 + (N - df + 0.5) / (df + 0.5))``, which is always
    positive). The retrieval-side complement of ``tfidf``: this is what a
    training pipeline uses to mine topic-targeted subsets from a 100 TB
    corpus.

    Scale shape: the explode is filtered to the query terms immediately
    (so the shuffled tf table is |matching (doc, term)| rows, not the full
    token stream); df (|terms| rows) and the global (N, avgdl) stats
    (1 row) are broadcast back — no window, no all-pairs. avgdl is an
    exact long-sum divided once, so it is bit-identical across engines.

    Float parity: each (doc, term) contribution is rounded to 6 decimals
    and summed as DECIMAL(18,6), making the doc score independent of both
    term order and engine summation order.

    Returns (id_col, bm25) for every doc containing >= 1 query term.
    """
    d = df.select(id_col, text_col)
    tok = d.select(id_col, F.explode(tokens(F.col(text_col))).alias("term"))
    tf = (tok.filter(F.col("term").isin(list(terms)))
          .groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = d.select(id_col, token_count(F.col(text_col)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"))
    idf = F.log(F.lit(1.0) + ((F.col("n") - F.col("df")) + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
                                   + F.lit(b) * (F.col("dl") / F.col("avgdl"))))
    contrib = F.round(idf * norm, 6).cast("decimal(18,6)")
    return (tf.join(F.broadcast(dfreq), "term")
            .join(dl, id_col)
            .join(F.broadcast(stats))
            .groupBy(id_col)
            .agg(F.sum(contrib).cast("double").alias("bm25")))


def vocab_jaccard_by_group(df: DataFrame, group_col: str,
                           text_col: str = "text") -> DataFrame:
    """Vocabulary overlap (Jaccard) between every pair of groups (e.g.
    languages or sources) — the corpus-profiling op behind contamination
    triage and language-mix sanity checks.

    Scale shape: the distinct (group, term) table is one hash shuffle;
    the pair generation is a term-keyed equi-join whose fan-out per term
    is bounded by the number of groups (squared), NOT the corpus size —
    with G groups the join emits <= G^2/2 rows per term. Group sizes
    (G rows) broadcast back.

    Returns (ga, gb, n_a, n_b, n_common, jaccard) for ga < gb.
    """
    v = (df.select(F.col(group_col).alias("g"),
                   F.explode(tags_of(F.col(text_col))).alias("term"))
         .distinct())
    sizes = v.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    inter = (v.alias("a").join(v.alias("b"), "term")
             .filter(F.col("a.g") < F.col("b.g"))
             .groupBy(F.col("a.g").alias("ga"), F.col("b.g").alias("gb"))
             .agg(F.count(F.lit(1)).alias("n_common")))
    return (inter
            .join(F.broadcast(sizes.select(F.col("g").alias("ga"),
                                           F.col("n").alias("n_a"))), "ga")
            .join(F.broadcast(sizes.select(F.col("g").alias("gb"),
                                           F.col("n").alias("n_b"))), "gb")
            .select("ga", "gb", "n_a", "n_b", "n_common",
                    F.round(F.col("n_common").cast("double")
                            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                            6).alias("jaccard")))


def token_entropy(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-document Shannon entropy of the token distribution — the
    information-density quality signal (near-zero entropy = degenerate
    repeated-token docs; template/boilerplate scores low, diverse prose high).

    Scale shape: one explode + (doc, token) count (Zipf head combines
    map-side), per-doc totals joined back on the doc key — two hash shuffles
    on doc_id, no windows, no all-pairs. Float parity follows the repo rule
    (header of ``__spark_entry__.py``): each token's -p*log2(p) contribution
    is rounded to 9 dp and summed as DECIMAL so the per-doc entropy is
    independent of engine/partial-merge summation order.

    Returns (id_col, n_tokens, entropy) with entropy rounded to 4 dp.
    Token-less documents (empty/whitespace/NULL text) return as
    (id, 0, 0.0) — the degenerate-quality floor — instead of silently
    vanishing through the explode (a missing score row could let a junk
    doc slip past a downstream entropy filter).
    """
    tok = df.select(F.col(id_col).alias("_id"),
                    F.explode(tokens(F.col(text_col))).alias("w"))
    cnt = tok.groupBy("_id", "w").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    contrib = F.round(-p * F.log2(p), 9).cast("decimal(18,9)")
    scored = (cnt.join(tot, "_id")
              .groupBy("_id")
              .agg(F.max("n").alias("n_tokens"),
                   F.round(F.sum(contrib).cast("double"), 4).alias("entropy"))
              .select(F.col("_id").alias(id_col), "n_tokens", "entropy"))
    # token-less <=> no non-whitespace char (tokens() splits on \s+) — a
    # short-circuiting rlike, NOT a second tokenization of the corpus
    empties = (df.filter(
        ~F.coalesce(F.col(text_col).rlike(r"\S"), F.lit(False)))
        .select(F.col(id_col),
                F.lit(0).cast("long").alias("n_tokens"),
                F.lit(0.0).alias("entropy")))
    return scored.unionByName(empties)


def bpe_pair_counts(df: DataFrame, text_col: str = "text",
                    lowercase: bool = True) -> DataFrame:
    """Adjacent-character pair frequencies over the corpus — the statistic a
    BPE tokenizer trainer maximizes at every merge step.

    Scale shape (the classic vocab-first trick): the token stream first
    collapses to a (word, count) vocabulary table — one hash shuffle whose
    Zipf head combines map-side, output is |vocab| rows, not |corpus| tokens.
    Pair stats are then derived from the vocabulary weighted by word count,
    so a 100 TB corpus pays the pair explode only over its (tiny) vocab.

    Returns (pair, cnt), exact integer counts.
    """
    w = F.lower(F.col("w")) if lowercase else F.col("w")
    vocab = (df.select(F.explode(tokens(F.col(text_col))).alias("w"))
             .select(w.alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("wc")))
    pairs_of = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("w") - 1, F.lit(1))),
        lambda i: F.substring(F.col("w"), i, 2),  # noqa: B023
    )
    pairs = (vocab.filter(F.length("w") >= 2)
             .select(F.explode(pairs_of).alias("pair"), "wc"))
    return pairs.groupBy("pair").agg(F.sum("wc").alias("cnt"))


def bpe_train_merges(df: DataFrame, n_merges: int = 8,
                     text_col: str = "text") -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges over the corpus (greedy most-frequent
    adjacent symbol pair, left-to-right merge application — the published BPE
    algorithm, operating on the vocab-first representation).

    Each round is one distributed pair-count aggregation over the
    (symbols, count) vocabulary plus a driver-side argmax of ONE row
    (metadata-scale collect; ties broken lexicographically so training is
    deterministic). The merge itself is a left-fold over each word's symbol
    array — pure codegen'd SQL, no Python in the data path.

    Returns the ordered merge list [(left, right), ...].
    """
    spark = df.sparkSession
    vocab = (df.select(F.explode(tokens(F.col(text_col))).alias("w"))
             .select(F.lower("w").alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("wc"))
             .select(F.split("w", "").alias("syms"), "wc"))
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # the >=2-symbol filter must sit BELOW the explode: under ANSI mode
        # element_at(syms, i+1) on a 1-symbol word would throw if the
        # transform ever evaluated — don't rely on the optimizer pushing a
        # later filter through the Generate
        pair_cnt = (vocab.filter(F.size("syms") >= 2)
            .select(
            F.explode(F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(F.element_at("syms", i).alias("a"),
                                   F.element_at("syms", i + 1).alias("b")),
            )).alias("p"), "wc")
            .groupBy("p").agg(F.sum("wc").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p.a").asc(), F.col("p.b").asc())
            .limit(1).collect())
        if not pair_cnt:
            break
        a, b = pair_cnt[0]["p"]["a"], pair_cnt[0]["p"]["b"]
        merges.append((a, b))
        merged = F.aggregate(
            "syms", F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1),
                         F.array(F.concat(F.element_at(acc, -1), s))),
            ).otherwise(F.concat(acc, F.array(s))),
        )
        vocab = (vocab.select(merged.alias("syms"), "wc")
                 .localCheckpoint(eager=True))
    return merges


def phrase_match(col: Column, phrase: str) -> Column:
    """Token-adjacency phrase predicate: true when the phrase's words appear
    consecutively in the document's token stream (positional-index phrase
    search semantics, NOT substring match — 'big data' does not match
    'bigger database').

    Pure codegen'd SQL: one tokenize per row (bound once through the
    transform-array trick, see word_ngrams) and an EXISTS over start
    offsets; embarrassingly parallel, no shuffle.
    """
    words = phrase.split()
    n = len(words)

    def found(tk: Column) -> Column:
        hit = F.exists(
            F.sequence(F.lit(1), F.greatest(F.size(tk) - (n - 1), F.lit(1))),
            lambda i: reduce(
                lambda acc, j: acc & (F.element_at(tk, i + j) == F.lit(words[j])),
                range(1, n),
                F.element_at(tk, i + 0) == F.lit(words[0]),
            ),
        )
        return F.when(F.size(tk) >= n, hit).otherwise(F.lit(False))

    return F.element_at(F.transform(F.array(tokens(col)), found), 1)


def deletion_variants(col: Column, k: int = 2) -> Column:
    """SymSpell deletion neighborhood: the word plus every string reachable
    by deleting up to ``k`` characters. Two words within Levenshtein
    distance k always share a variant, so equality on variants is a LOSSLESS
    candidate blocking key for a fuzzy join (false positives allowed,
    verified later; false negatives impossible). Pure codegen'd SQL."""
    if k not in (1, 2):
        raise ValueError("k must be 1 or 2")

    def deletes(word: Column) -> Column:
        # all single-character deletions of `word` (empty array for "")
        return F.when(
            F.length(word) >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(word), F.lit(1))),
                lambda i: F.concat(F.substring(word, 1, i - 1),  # noqa: B023
                                   word.substr(i + 1, F.length(word))),
            ),
        ).otherwise(F.array().cast("array<string>"))

    d1 = deletes(col)
    out = F.concat(F.array(col), d1)
    if k == 2:
        d2 = F.flatten(F.transform(d1, deletes))
        out = F.concat(out, d2)
    return F.array_distinct(out)


def fuzzy_vocab_pairs(df: DataFrame, text_col: str = "text",
                      max_dist: int = 2) -> DataFrame:
    """Fuzzy (edit-distance) vocabulary self-join — the typo/variant-merging
    step of entity resolution and query-spelling pipelines.

    Scale shape (the SymSpell trick distributed): the corpus collapses to a
    distinct vocabulary first; each word explodes to its deletion
    neighborhood; candidates are an EQUI-join on the variant key (Σ per-
    variant-bucket², never |vocab|²); the exact ``levenshtein`` verifies.
    Everything after the vocab collapse is vocabulary-sized, not
    corpus-sized. Returns (wa, wb, dist) with wa < wb.
    """
    vocab = (df.select(F.explode(tokens(F.col(text_col))).alias("w"))
             .select(F.lower("w").alias("w")).distinct())
    v = vocab.select(
        "w", F.explode(deletion_variants(F.col("w"), max_dist)).alias("v"))
    cand = (v.alias("a").join(v.alias("b"), "v")
            .filter(F.col("a.w") < F.col("b.w"))
            .select(F.col("a.w").alias("wa"), F.col("b.w").alias("wb"))
            .distinct())
    return (cand
            .withColumn("dist", F.levenshtein("wa", "wb").cast("long"))
            .filter(F.col("dist") <= max_dist))


def bpe_apply_merges(col: Column, merges: list[tuple[str, str]]) -> Column:
    """Encode a word column with a trained merge list (``bpe_train_merges``):
    start from characters, apply each merge as a left-to-right greedy fold in
    training order — the standard BPE encode. One codegen'd expression
    (``len(merges)`` chained folds), no Python, no shuffle; at 100 TB this
    rides the scan like any other projection. Returns array<string> symbols."""
    syms = F.split(F.lower(col), "")

    def merge_pass(cur: Column, a: str, b: str) -> Column:
        return F.aggregate(
            cur, F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1),
                         F.array(F.concat(F.element_at(acc, -1), s))),
            ).otherwise(F.concat(acc, F.array(s))),
        )

    for a, b in merges:
        syms = merge_pass(syms, a, b)
    return syms


# ---- character-LM quality scoring (CCNet-style perplexity filter) ----------

def char_trigrams(col: Column) -> Column:
    """All overlapping character trigrams of ``col`` (empty for texts
    shorter than 3 chars). Pure HOF — rides the scan."""
    n = F.length(col)
    return F.when(n >= 3, F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: col.substr(i, F.lit(3)))) \
        .otherwise(F.array().cast("array<string>"))


def char_trigram_lm(train: DataFrame, text_col: str = "text"
                    ) -> tuple[DataFrame, DataFrame, int]:
    """Train the character-trigram LM the CCNet-style quality filter
    scores against: returns ``(counts(ctx, ch, cnt), totals(ctx, tot),
    vocab_size)`` where ctx = first 2 chars, ch = the next char, and
    vocab_size = distinct next-chars in training (the add-one smoothing
    denominator). Two aggregations over the training slice; the model
    is charset-bounded (|charset|^2 contexts), so downstream joins
    BROADCAST it regardless of corpus size."""
    tri = (train.select(F.explode(char_trigrams(F.col(text_col)))
                        .alias("tri"))
           .select(F.col("tri").substr(1, 2).alias("ctx"),
                   F.col("tri").substr(3, 1).alias("ch")))
    counts = tri.groupBy("ctx", "ch").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"))
    totals = counts.groupBy("ctx").agg(F.sum("cnt").alias("tot"))
    vocab = counts.select("ch").distinct().count()
    return counts, totals, int(vocab)


def lm_doc_bits(docs: DataFrame, counts: DataFrame, totals: DataFrame,
                vocab_size: int, text_col: str = "text",
                id_col: str = "doc_id",
                round_digits: int = 4) -> DataFrame:
    """Per-document surprisal under the trained character LM:
    ``total_bits`` = Σ round(-log2((cnt+1)/(tot+V)), round_digits) over
    the doc's trigrams (add-one smoothing; unseen context -> uniform
    1/V). The round-BEFORE-sum + DECIMAL accumulation makes the sum
    order-independent and oracle-portable; ``sum_cnt``/``sum_tot`` ride
    along as exact integers. High bits-per-trigram = out-of-domain /
    garbage text — the CCNet perplexity cut is a plain filter over
    ``total_bits / n_trigrams``."""
    tri = docs.select(
        F.col(id_col),
        F.explode(char_trigrams(F.col(text_col))).alias("tri")).select(
        id_col, F.col("tri").substr(1, 2).alias("ctx"),
        F.col("tri").substr(3, 1).alias("ch"))
    joined = (tri.join(F.broadcast(counts), ["ctx", "ch"], "left")
              .join(F.broadcast(totals), ["ctx"], "left")
              .select(id_col,
                      F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
                      F.coalesce(F.col("tot"), F.lit(0)).alias("tot")))
    bits = F.round(-F.log2((F.col("cnt") + 1)
                           / (F.col("tot") + F.lit(vocab_size))),
                   round_digits).cast("decimal(18,6)")
    return (joined.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_trigrams"),
                 F.sum(bits).alias("_bits"),
                 F.sum("cnt").cast("long").alias("sum_cnt"),
                 F.sum("tot").cast("long").alias("sum_tot"))
            .withColumn("total_bits", F.col("_bits").cast("double"))
            .drop("_bits"))
