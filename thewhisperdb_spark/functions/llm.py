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


# ---- optional network clients (OpenAI-compatible HTTP) ---------------------
#
# Shippable counterparts of the reference's libcurl clients
# (``src/embedding/EmbeddingClient.cpp:51-122`` batch embeddings,
# ``src/tagging/TagClient.cpp:159-211`` chat-completions tagger with
# temperature/max_tokens). Nothing below is imported by the oracle surface,
# and the offline test suite only exercises them with an injected stub
# transport — the default transport is stdlib urllib, used only when a user
# actually configures a base URL + key.

def _resolve_llm_config(base_url, model, model_env: str, model_default: str,
                        api_key, timeout, transport):
    """Shared ctor plumbing for both HTTP clients: env fallbacks for base
    URL / model / key, default transport — one place, no copy-paste drift."""
    import os

    resolved_key = (api_key if api_key is not None
                    else os.environ.get("WHISPERDB_LLM_API_KEY", ""))
    resolved_transport = transport or _default_transport
    if (resolved_transport is _default_transport and api_key is None
            and not resolved_key):
        # a misconfigured deployment would otherwise send
        # "Authorization: Bearer " (empty) over the network and surface as
        # a confusing remote 401 — fail fast at construction (ADVICE r4).
        # An injected transport (tests, custom auth) skips the check, and
        # an EXPLICITLY passed api_key — including "" — is intentional
        # (keyless local endpoints: vLLM/ollama via WHISPERDB_LLM_BASE_URL),
        # so only a key left to env resolution that came back empty raises
        # (ADVICE r5).
        raise ValueError(
            "no API key: pass api_key= (use api_key='' for keyless local "
            "endpoints) or set WHISPERDB_LLM_API_KEY "
            "(required when using the default HTTP transport)")
    return (
        (base_url or os.environ.get("WHISPERDB_LLM_BASE_URL",
                                    "https://api.openai.com")).rstrip("/"),
        model or os.environ.get(model_env, model_default),
        resolved_key,
        float(timeout),
        resolved_transport,
    )


def _default_transport(url: str, headers: dict, payload: dict,
                       timeout: float) -> dict:
    """POST ``payload`` as JSON, return the decoded JSON response.
    stdlib-only; swap via the ``transport`` ctor arg for tests/retries."""
    import json
    import urllib.request

    req = urllib.request.Request(
        url, data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json", **headers},
        method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))


class HttpEmbedder:
    """OpenAI-compatible ``POST {base_url}/v1/embeddings`` client, usable as
    an ``Embedder`` for :func:`embed_missing`.

    Mirrors the reference's request contract (model + batch ``input`` array,
    bearer auth — ``EmbeddingClient.cpp:51-88``) but keeps its batch path:
    one request per ``batch_size`` texts instead of the reference's
    per-node calls (``EmbeddingService.cpp:68-83``). Config falls back to
    env vars ``WHISPERDB_LLM_BASE_URL`` / ``WHISPERDB_EMBED_MODEL`` /
    ``WHISPERDB_LLM_API_KEY``; the ``transport`` argument injects the HTTP
    layer (tests pass a stub — no network in the suite). Response
    embeddings are re-ordered by the API's ``index`` field, so out-of-order
    responses still line up with inputs."""

    def __init__(self, base_url: str | None = None, model: str | None = None,
                 api_key: str | None = None, batch_size: int = 128,
                 timeout: float = 30.0, transport=None):
        (self.base_url, self.model, self.api_key, self.timeout,
         self.transport) = _resolve_llm_config(
            base_url, model, "WHISPERDB_EMBED_MODEL",
            "text-embedding-3-small", api_key, timeout, transport)
        self.batch_size = int(batch_size)

    def __call__(self, texts: list[str]) -> list[list[float]]:
        url = f"{self.base_url}/v1/embeddings"
        headers = {"Authorization": f"Bearer {self.api_key}"}
        out: list[list[float]] = []
        for i in range(0, len(texts), self.batch_size):
            chunk = texts[i:i + self.batch_size]
            resp = self.transport(url, headers,
                                  {"model": self.model, "input": chunk},
                                  self.timeout)
            data = sorted(resp["data"], key=lambda d: d["index"])
            if len(data) != len(chunk):
                raise ValueError(
                    f"embeddings response has {len(data)} rows for "
                    f"{len(chunk)} inputs")
            out.extend([float(x) for x in d["embedding"]] for d in data)
        return out


class HttpTagGenerator:
    """OpenAI-compatible ``POST {base_url}/v1/chat/completions`` tagger,
    usable as the ``model`` for :func:`generate_tags_from_model_output`
    (which then applies the JSON-array parse + normalization as column
    expressions).

    Prompt contract mirrors ``TagClient.cpp:62-99``: the controlled
    vocabulary is listed, the model may add at most ``max_new`` new tags,
    and must answer with a JSON array. ``temperature`` / ``max_tokens``
    are the reference's request knobs (``TagClient.cpp:159-211``). Env
    fallbacks: ``WHISPERDB_LLM_BASE_URL`` / ``WHISPERDB_TAG_MODEL`` /
    ``WHISPERDB_LLM_API_KEY``. Returns one RAW completion string per input
    text (parse failures downstream yield empty tag arrays, matching the
    reference's behavior)."""

    def __init__(self, vocabulary: list[str], max_tags: int = 5,
                 max_new: int = 3, base_url: str | None = None,
                 model: str | None = None, api_key: str | None = None,
                 temperature: float = 0.2, max_tokens: int = 128,
                 timeout: float = 30.0, transport=None):
        self.vocabulary = [_normalize_tag(v) for v in vocabulary]
        self.max_tags = int(max_tags)
        self.max_new = int(max_new)
        (self.base_url, self.model, self.api_key, self.timeout,
         self.transport) = _resolve_llm_config(
            base_url, model, "WHISPERDB_TAG_MODEL", "gpt-4o-mini",
            api_key, timeout, transport)
        self.temperature = float(temperature)
        self.max_tokens = int(max_tokens)

    def prompt(self, text: str) -> str:
        return (
            "Tag the following document. Prefer tags from this vocabulary: "
            f"[{', '.join(self.vocabulary)}]. You may invent at most "
            f"{self.max_new} new tags; return at most {self.max_tags} tags "
            "total, as a single JSON array of lowercase strings and nothing "
            f"else.\n\nDocument:\n{text}")

    def __call__(self, texts: list[str]) -> list[str]:
        url = f"{self.base_url}/v1/chat/completions"
        headers = {"Authorization": f"Bearer {self.api_key}"}
        out = []
        for t in texts:
            resp = self.transport(
                url, headers,
                {"model": self.model,
                 "temperature": self.temperature,
                 "max_tokens": self.max_tokens,
                 "messages": [{"role": "user", "content": self.prompt(t)}]},
                self.timeout)
            out.append(resp["choices"][0]["message"]["content"])
        return out


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
