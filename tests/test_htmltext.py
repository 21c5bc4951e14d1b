"""HTML -> text extraction (operators/htmltext.py): tag stripping,
entity decoding, block boundaries, boilerplate signals, malformed-markup
tolerance, and the Arrow pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from thewhisperdb_spark.operators.htmltext import html_extract, html_to_text


def test_html_to_text_rules():
    got = html_to_text(
        "<html><head><title> My  Page </title>"
        "<style>body { color: red }</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><h1>Head&amp;line</h1>"
        "<p>First <b>para</b>graph.</p>"
        "<p>Second with a <a href='/x'>link text</a> inside.</p>"
        "<ul><li>alpha</li><li>beta</li></ul>"
        "<!-- a comment --><div>Tail &#65; text</div></body></html>")
    assert got["title"] == "My Page"
    assert got["text"] == ("Head&line\n"
                           "First paragraph.\n"
                           "Second with a link text inside.\n"
                           "alpha\nbeta\n"
                           "Tail A text")
    assert got["n_paragraphs"] == 2 and got["n_links"] == 1
    # link density: "linktext" = 8 visible chars over all visible chars
    assert abs(got["link_density"]
               - 8 / len("".join(got["text"].split()))) < 1e-12

    # malformed markup never raises; empty/None extract as empty
    assert html_to_text("<p>unclosed <b>bold")["text"] == "unclosed bold"
    assert html_to_text("<a><p></a junk<>")["text"] == ""
    assert html_to_text("")["text"] == "" and html_to_text("")["title"] \
        is None
    # a pure-navigation fragment scores link density 1.0
    nav = html_to_text("<nav><a>Home</a> <a>About</a></nav>")
    assert nav["link_density"] == 1.0 and nav["n_links"] == 2


def test_html_extract_pipeline_roundtrip(spark):
    """JVM-side-built HTML wrappers around real document text must
    round-trip: extracted body text equals the whitespace-normalized
    original, title carries the id, the script payload never leaks."""
    from thewhisperdb_spark.catalog import load_table

    docs = (load_table(spark, "/root/testdata/sf0.001", "documents")
            .filter(F.col("doc_id") < 50).select("doc_id", "text"))
    F2 = F
    html = docs.select(
        "doc_id", "text",
        F2.concat(
            F2.lit("<html><head><title>Doc "), F2.col("doc_id"),
            F2.lit("</title><script>SECRET_PAYLOAD</script></head>"
                   "<body><p>"),
            F2.col("text"),
            F2.lit("</p><div>x &amp; y</div></body></html>"),
        ).alias("html"))
    out = html_extract(html).withColumnRenamed("text", "etext")
    joined = (out.join(docs.select(F2.col("doc_id").cast("string")
                                   .alias("doc_id"), "text"), "doc_id")
              .collect())
    assert len(joined) == 50
    for r in joined:
        norm = " ".join(r["text"].split())
        assert r["etext"] == (norm + "\nx & y" if norm else "x & y")
        assert r["title"] == f"Doc {r['doc_id']}"
        assert "SECRET_PAYLOAD" not in r["etext"]
        assert 0.0 <= r["link_density"] <= 1.0


def test_html_blocks_boilerplate_cut(spark):
    """Per-block stats make the readability cut a plain predicate: the
    nav menu (link density 1.0) and the footer fall to the filter while
    both content paragraphs survive."""
    from thewhisperdb_spark.operators.htmltext import (
        html_blocks,
        html_extract_blocks,
    )

    page = ("<body><nav><a>Home</a> <a>About</a> <a>Contact</a></nav>"
            "<p>This is the actual article content, long enough to "
            "matter and containing <a href='#'>one link</a> only.</p>"
            "<p>Second content paragraph with more real prose here.</p>"
            "<footer><a>Terms</a> | <a>Privacy</a></footer></body>")
    blocks = html_blocks(page)
    assert [b["tag"] for b in blocks] == ["nav", "p", "p", "footer"]
    assert blocks[0]["link_density"] == 1.0
    assert blocks[1]["link_density"] < 0.2
    assert blocks[1]["block_idx"] == 1
    # the distributed explosion + the content filter
    df = spark.createDataFrame([("d1", page), ("d2", None)],
                               "doc_id string, html string")
    out = html_extract_blocks(df)
    kept = (out.filter((F.col("link_density") < 0.5)
                       & (F.col("n_chars") >= 40))
            .select("doc_id", "block_idx").collect())
    assert {(r["doc_id"], r["block_idx"]) for r in kept} == {("d1", 1),
                                                             ("d1", 2)}
    assert out.filter(F.col("doc_id") == "d2").count() == 0


def test_block_extractor_title_and_tag_reset():
    """ADVICE r9: <title> is head metadata (never a content block); text
    after a closed block is not attributed to that block's tag; links in
    skipped subtrees don't count."""
    from thewhisperdb_spark.operators.htmltext import html_blocks

    html = ("<html><head><title>Head Title</title></head><body>"
            "<p>para text</p>tail text"
            "<script><a href='x'>ghost</a></script></body></html>")
    blocks = html_blocks(html)
    texts = {b["text"]: b["tag"] for b in blocks}
    assert "Head Title" not in texts
    assert texts["para text"] == "p"
    # tail text after </p> carries no tag, not 'p'
    assert texts["tail text"] is None
    stats = html_to_text(html)
    assert stats["n_links"] == 0 and stats["title"] == "Head Title"
