"""LLM-backed column transforms with deterministic local fallbacks
(SURVEY §2.10: the reference's two extension points are an OpenAI embeddings
client, ``src/embedding/EmbeddingClient.cpp:51-122``, and a chat-completions
tagger with a controlled vocabulary + max-3-new-tags prompt contract,
``src/tagging/TagClient.cpp:62-99,159-211``).

Spark shape: both are *batched* pandas transforms over ``mapInPandas`` — one
API call per Arrow batch (the reference supports batch embedding but calls
per-node, ``EmbeddingClient.cpp:90-122`` vs ``EmbeddingService.cpp:68-83``;
batching is the first thing distribution fixes). The network client is an
injected callable; the default implementations here are deterministic and
network-free so the oracle/test harness never needs credentials.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    StringType,
    StructField,
    StructType,
)

Embedder = Callable[[list[str]], list[list[float]]]


def _hash_embed_batch(texts: list[str], dim: int) -> list[list[float]]:
    """Deterministic local embedder: feature-hash token counts into ``dim``
    buckets with a sign hash, then L2-normalize (the classic hashing trick —
    stable across runs/machines, no vocabulary)."""
    out = []
    for t in texts:
        vec = [0.0] * dim
        for tok in re.findall(r"\w+", (t or "").lower()):
            h = hashlib.blake2b(tok.encode(), digest_size=8).digest()
            idx = int.from_bytes(h[:4], "big") % dim
            sign = 1.0 if h[4] & 1 else -1.0
            vec[idx] += sign
        n = math.sqrt(sum(x * x for x in vec))
        out.append([x / n for x in vec] if n else vec)
    return out


def hash_embedder(dim: int = 64) -> Embedder:
    return lambda texts: _hash_embed_batch(texts, dim)


def assemble_node_text(df: DataFrame, cols: tuple[str, ...] =
                       ("title", "subject", "description"),
                       out_col: str = "doc_text") -> DataFrame:
    """Document-text assembly for embedding/tagging: newline-joined metadata
    (``src/embedding/EmbeddingService.cpp:8-43``,
    ``src/tagging/TagService.cpp:12-42``) — pure concat_ws, JVM-side."""
    return df.withColumn(out_col, F.concat_ws(
        "\n", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]))


def embed_missing(df: DataFrame, text_col: str, embedder: Embedder,
                  dim: int, emb_col: str = "embedding") -> DataFrame:
    """§3.3b ``generateMissingEmbeddings``: fill ``emb_col`` only where absent.
    Only the missing slice crosses into Python (filter first, union back) —
    the already-embedded majority never leaves the JVM."""
    out_schema = StructType(df.schema.fields[:])
    if emb_col not in df.columns:
        out_schema = StructType(df.schema.fields +
                                [StructField(emb_col, ArrayType(FloatType()))])
        df = df.withColumn(emb_col, F.lit(None).cast("array<float>"))
    missing = df.filter(F.col(emb_col).isNull() | (F.size(emb_col) == 0))
    present = df.filter(~(F.col(emb_col).isNull() | (F.size(emb_col) == 0)))
    cols = [f.name for f in out_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = embedder(list(pdf[text_col].fillna("")))
            pdf = pdf.copy()
            pdf[emb_col] = vecs
            yield pdf[cols]

    filled = missing.mapInPandas(run, out_schema)
    return present.select(*cols).unionByName(filled)


# ---- controlled-vocabulary tagger ------------------------------------------

def _normalize_tag(s: str) -> str:
    """lowercase, whitespace-runs -> '-', strip trailing '-'
    (``src/tagging/TagClient.cpp:101-124``)."""
    return re.sub(r"-+$", "", re.sub(r"\s+", "-", s.strip().lower()))


def keyword_tagger(vocabulary: list[str], max_tags: int = 5,
                   max_new: int = 3) -> Callable[[list[str]], list[list[str]]]:
    """Deterministic stand-in for the LLM tagger, honoring its contract
    (``TagClient.cpp:62-99``): prefer tags from the controlled vocabulary
    (token overlap), allow at most ``max_new`` new tags (most frequent
    non-vocab tokens), all normalized."""
    vocab = [_normalize_tag(v) for v in vocabulary]

    def tag_batch(texts: list[str]) -> list[list[str]]:
        out = []
        for t in texts:
            toks = re.findall(r"\w+", (t or "").lower())
            tokset = set(toks)
            from_vocab = [v for v in vocab if v in tokset][:max_tags]
            room = min(max_tags - len(from_vocab), max_new)
            new: list[str] = []
            if room > 0:
                freq: dict[str, int] = {}
                for tok in toks:
                    if tok not in vocab and len(tok) > 3:
                        freq[tok] = freq.get(tok, 0) + 1
                ranked = sorted(freq, key=lambda k: (-freq[k], k))
                new = [_normalize_tag(x) for x in ranked[:room]]
            out.append(from_vocab + new)
        return out

    return tag_batch


def extract_tag_array(raw, normalize: bool = True):
    """Model-output parse step (``src/tagging/TagClient.cpp:126-157``): the
    real LLM tagger returns free text containing a JSON array; extract the
    first ``[...]`` region and parse it as ``array<string>``. Unparseable /
    array-free output yields NULL (the reference's parse failure returns an
    empty tag list — callers ``coalesce`` to empty as needed). Pure column
    expression (``from_json(regexp_extract(...))``, SURVEY §2.9) — JVM-side,
    no Python in the parse path. Normalization applies the reference's tag
    rules (``TagClient.cpp:101-124``) to every parsed element."""
    from thewhisperdb_spark.schemas import normalize_tag

    arr = F.from_json(F.regexp_extract(raw, r"(\[[^\]]*\])", 1),
                      "array<string>")
    if normalize:
        arr = F.transform(arr, normalize_tag)
    return arr


def generate_tags_from_model_output(df: DataFrame, text_col: str,
                                    model: Callable[[list[str]], list[str]],
                                    out_col: str = "generated_tags",
                                    raw_col: str | None = None) -> DataFrame:
    """The full LLM tagging path of the reference (``TagClient.cpp:159-211``):
    batched model calls return RAW completion text; the JSON-array parse +
    normalization happens as a column expression (``extract_tag_array``), so
    only the network call crosses into Python. ``model`` maps a batch of
    input texts to a batch of raw model-output strings."""
    tmp = raw_col or "_raw_model_output"
    out_schema = StructType(df.schema.fields + [StructField(tmp, StringType())])
    cols = [f.name for f in out_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[tmp] = model(list(pdf[text_col].fillna("")))
            yield pdf[cols]

    raw = df.mapInPandas(run, out_schema)
    out = raw.withColumn(
        out_col, F.coalesce(extract_tag_array(F.col(tmp)),
                            F.array().cast("array<string>")))
    return out if raw_col else out.drop(tmp)


def generate_tags(df: DataFrame, text_col: str,
                  tagger: Callable[[list[str]], list[list[str]]],
                  out_col: str = "generated_tags") -> DataFrame:
    """Batched tag generation over mapInPandas (one model call per Arrow
    batch). Output column is array<string> of normalized tags."""
    out_schema = StructType(df.schema.fields +
                            [StructField(out_col, ArrayType(StringType()))])
    cols = [f.name for f in out_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = tagger(list(pdf[text_col].fillna("")))
            yield pdf[cols]

    return df.mapInPandas(run, out_schema)
