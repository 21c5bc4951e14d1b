"""HTML -> text extraction: the first transform of every web-crawl
training pipeline (WET-style text stripping), plus the standard
boilerplate signals (title, link density, paragraph count).

Stdlib ``html.parser`` (tolerant, never raises on malformed markup —
real crawl HTML is malformed), Arrow-batched over the corpus. Rules:
- ``script``/``style``/``template``/``noscript`` subtrees and comments
  contribute nothing;
- block-level boundaries (p, div, li, headings, rows, br, ...) become
  newlines, inline flow keeps spaces; whitespace runs collapse (WET
  convention — layout indentation is markup, not content);
- character/entity references decode (``&amp;`` -> ``&``);
- link density = visible chars inside ``<a>`` / total visible chars —
  the classic navigation/boilerplate discriminator (high-link-density
  pages are menus), used downstream exactly like the Gopher text flags.

The reference has no HTML handling (its ingest is plain text + pdftotext,
``src/embedding/TextExtractor.cpp``); north-star extension surface.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_SKIP = {"script", "style", "template", "noscript"}
_BLOCK = {"p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4",
          "h5", "h6", "tr", "table", "section", "article", "header",
          "footer", "blockquote", "pre", "hr", "form", "nav", "aside",
          "main", "figure", "figcaption", "dd", "dt", "dl"}


class _TextExtractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self.n_links = 0
        self.link_chars = 0
        self.total_chars = 0
        self.n_paragraphs = 0
        self._skip_depth = 0
        self._in_title = False
        self._link_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
        elif tag == "title":
            self._in_title = True
        elif tag == "a":
            self._link_depth += 1
            if not self._skip_depth:   # links inside <script>/<template>
                self.n_links += 1      # subtrees are not document links
        elif tag == "p":
            if not self._skip_depth:
                self.n_paragraphs += 1
        if tag in _BLOCK:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP and self._skip_depth:
            self._skip_depth -= 1
        elif tag == "title":
            self._in_title = False
        elif tag == "a" and self._link_depth:
            self._link_depth -= 1
        if tag in _BLOCK:
            self.parts.append("\n")

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            self.title_parts.append(data)
            return
        self.parts.append(data)
        n = len("".join(data.split()))
        self.total_chars += n
        if self._link_depth:
            self.link_chars += n


def html_to_text(html: str) -> dict:
    """Parse one HTML document: ``{"text", "title", "n_links",
    "n_paragraphs", "link_density"}``. Whitespace-normalized text with
    newline block boundaries; never raises on malformed markup (the
    stdlib parser is recovery-based by design)."""
    p = _TextExtractor()
    p.feed(html or "")
    p.close()
    lines = [" ".join(seg.split())
             for seg in "".join(p.parts).split("\n")]
    text = "\n".join(ln for ln in lines if ln)
    return {
        "text": text,
        "title": " ".join("".join(p.title_parts).split()) or None,
        "n_links": p.n_links,
        "n_paragraphs": p.n_paragraphs,
        "link_density": (p.link_chars / p.total_chars
                         if p.total_chars else 0.0),
    }


class _BlockExtractor(HTMLParser):
    """Per-block accumulation: a new block opens at every block-level
    start tag; text/link char counts are tracked per block so boilerplate
    removal (menus, footers) becomes a plain filter over the output."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._cur: list[str] = []
        self._link_chars = 0
        self._total_chars = 0
        self._skip_depth = 0
        self._link_depth = 0
        self._tag = None

    def _flush(self):
        text = " ".join("".join(self._cur).split())
        if text:
            self.blocks.append({
                "text": text,
                "tag": self._tag,
                "n_chars": self._total_chars,
                "link_density": (self._link_chars / self._total_chars
                                 if self._total_chars else 0.0),
            })
        self._cur, self._link_chars, self._total_chars = [], 0, 0

    def handle_starttag(self, tag, attrs):
        # <title> is head metadata, not a content block (ADVICE r9)
        if tag in _SKIP or tag == "title":
            self._skip_depth += 1
        elif tag == "a":
            self._link_depth += 1
        if tag in _BLOCK:
            self._flush()
            self._tag = tag

    def handle_endtag(self, tag):
        if (tag in _SKIP or tag == "title") and self._skip_depth:
            self._skip_depth -= 1
        elif tag == "a" and self._link_depth:
            self._link_depth -= 1
        if tag in _BLOCK:
            self._flush()
            # text after a closed block belongs to no tag, not the
            # previous block's (ADVICE r9)
            self._tag = None

    def handle_data(self, data):
        if self._skip_depth:
            return
        self._cur.append(data)
        n = len("".join(data.split()))
        self._total_chars += n
        if self._link_depth:
            self._link_chars += n


def html_blocks(html: str) -> list[dict]:
    """Split one HTML document into text blocks with per-block
    boilerplate stats: ``[{"block_idx", "tag", "text", "n_chars",
    "link_density"}]``. The readability-lite contract: main content =
    blocks with low link density and enough characters — a FILTER over
    this output, tuned per corpus, instead of a baked-in heuristic."""
    p = _BlockExtractor()
    p.feed(html or "")
    p.close()
    p._flush()
    for k, b in enumerate(p.blocks):
        b["block_idx"] = k
    return p.blocks


HTML_BLOCKS_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("block_idx", IntegerType()),
    StructField("tag", StringType()),
    StructField("text", StringType()),
    StructField("n_chars", IntegerType()),
    StructField("link_density", DoubleType()),
])


def html_extract_blocks(df: DataFrame, html_col: str = "html",
                        id_col: str = "doc_id") -> DataFrame:
    """One row per text block per document (Arrow ``mapInPandas`` row
    explosion, executor-side): content selection downstream is
    ``filter(link_density < theta AND n_chars >= k)`` — the
    readability-style boilerplate cut as a Catalyst predicate."""
    src = df.select(F.col(id_col).cast("string").alias("doc_id"),
                    F.col(html_col).alias("html"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in HTML_BLOCKS_SCHEMA.fields}
            for did, html in zip(pdf["doc_id"], pdf["html"]):
                for b in html_blocks(html if html is not None else ""):
                    rows["doc_id"].append(did)
                    for k in ("block_idx", "tag", "text", "n_chars",
                              "link_density"):
                        rows[k].append(b[k])
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, HTML_BLOCKS_SCHEMA)


HTML_EXTRACT_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("text", StringType()),
    StructField("title", StringType()),
    StructField("n_links", IntegerType()),
    StructField("n_paragraphs", IntegerType()),
    StructField("link_density", DoubleType()),
])


def html_extract(df: DataFrame, html_col: str = "html",
                 id_col: str = "doc_id") -> DataFrame:
    """One extracted row per document: (doc_id, text, title, n_links,
    n_paragraphs, link_density). Arrow-batched ``mapInPandas``; the id is
    carried as a string so any id type passes through losslessly (cast
    back downstream if needed). NULL html extracts as an empty row, not
    an error — the parser itself never raises on malformed markup."""
    src = df.select(F.col(id_col).cast("string").alias("doc_id"),
                    F.col(html_col).alias("html"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in HTML_EXTRACT_SCHEMA.fields}
            for did, html in zip(pdf["doc_id"], pdf["html"]):
                got = html_to_text(html if html is not None else "")
                rows["doc_id"].append(did)
                for k in ("text", "title", "n_links", "n_paragraphs",
                          "link_density"):
                    rows[k].append(got[k])
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, HTML_EXTRACT_SCHEMA)
