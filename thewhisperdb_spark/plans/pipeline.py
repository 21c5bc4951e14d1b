"""End-to-end pretraining-data pipeline: the composite job that strings the
engine's corpus operators into the shape every LLM data team actually runs —
ingest -> quality filter -> language filter -> exact dedup -> near-dup drop ->
split assignment -> train-split decontamination -> sequence packing.

Each stage is one of the already-tested operators (quality features,
drop_exact_duplicates, drop_near_duplicates, three_way_split,
cross_split_contamination, pack_sequences); this module adds only the
composition and per-stage accounting. Scale posture is inherited: every stage
is scan- or equi-join-shaped, the only iteration is the near-dup connected
components, and nothing collects to the driver except the per-stage counts
(one long each).

The reference has no such pipeline (its only composite is the clustering job,
``src/embedding/EmbeddingService.cpp:140-193``); this is north-star §2.11
surface built from the same composition machinery as plans/jobs.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from thewhisperdb_spark.operators import dedup as D
from thewhisperdb_spark.operators import packing as PK
from thewhisperdb_spark.operators import sampling as SM
from thewhisperdb_spark.operators import text as TX


def _quality_pred(text_col: str, n_chars_col: str):
    """C4-style conjunctive quality predicate (same operating point as the
    ``quality_filter_pipeline`` query): token floor, length window, stopword
    ratio floor, repetition-ratio ceiling. One codegen'd scan, no shuffle."""
    c = F.col(text_col)
    toks = TX.tokens(c)
    stop = F.array(*[F.lit(s) for s in TX.STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
    stop_ratio = n_stop.cast("double") / F.greatest(F.size(toks), F.lit(1))
    return ((F.size(toks) >= 10)
            & F.col(n_chars_col).between(50, 5000)
            & (stop_ratio >= 0.05)
            & (TX.repetition_ratio(c, 3) <= 0.2))


def run_pretraining_pipeline(docs: DataFrame, *, lang: str = "en",
                             id_col: str = "doc_id", text_col: str = "text",
                             decontam_ngram: int = 8,
                             pack_budget: int = 256) -> dict:
    """Run the full cleaning pipeline over a documents table.

    Returns a dict with:
    - ``stages``: list of (stage_name, rows_surviving) in pipeline order —
      the dataset-card accounting every release needs;
    - ``train``: the final cleaned, deduplicated, decontaminated train split;
    - ``bins``: the packed training-bin occupancy table.

    Stage boundaries materialize once each: every counted stage is
    localCheckpoint'ed first, so its count AND the next stage read the
    materialized rows instead of replaying the whole upstream pipeline per
    action (on a real cluster, swap localCheckpoint for persist(DISK_ONLY) /
    reliable checkpoint — same shape, spill-safe).
    """
    stages: list[tuple[str, int]] = [("ingest", docs.count())]

    quality = (docs.filter(_quality_pred(text_col, "n_chars"))
               .localCheckpoint(eager=True))
    stages.append(("quality_filter", quality.count()))

    langf = quality.filter(F.col("lang") == lang).localCheckpoint(eager=True)
    stages.append(("language_filter", langf.count()))

    exact = (D.drop_exact_duplicates(langf, id_col=id_col, text_col=text_col)
             .localCheckpoint(eager=True))
    stages.append(("exact_dedup", exact.count()))

    near = D.drop_near_duplicates(exact, id_col=id_col, text_col=text_col)
    near = near.localCheckpoint(eager=True)  # cut the CC-iteration lineage
    stages.append(("near_dedup", near.count()))

    split = SM.three_way_split(near, id_col=id_col)
    train = split.filter(F.col("split") == "train")
    stages.append(("train_split", train.count()))

    leaked = D.cross_split_contamination(
        split, F.col("split") == "train", n=decontam_ngram,
        id_col=id_col, text_col=text_col)
    clean_train = (train.join(leaked, id_col, "left_anti")
                   .localCheckpoint(eager=True))
    stages.append(("decontaminated_train", clean_train.count()))

    # privacy scrub: per-row transform (row count unchanged, so no stage
    # boundary) — rides the same scan as the join output
    from thewhisperdb_spark.operators.privacy import redact_pii

    clean_train = clean_train.withColumn(text_col,
                                         redact_pii(F.col(text_col)))

    bins = PK.pack_sequences(clean_train, budget=pack_budget,
                             shard_col="lang", order_col=id_col,
                             text_col=text_col)
    stages.append(("packed_bins", bins.count()))

    return {"stages": stages, "train": clean_train, "bins": bins}


def pipeline_stage_counts(docs: DataFrame, **kw) -> DataFrame:
    """The pipeline's accounting as a DataFrame (stage order preserved via an
    explicit index): (stage_idx, stage, rows)."""
    res = run_pretraining_pipeline(docs, **kw)
    spark = docs.sparkSession
    rows = [(i, name, int(n)) for i, (name, n) in enumerate(res["stages"])]
    return spark.createDataFrame(rows, "stage_idx int, stage string, rows long")
