"""Multimodal plumbing, LLM-fallback transforms, and composite jobs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thewhisperdb_spark.functions.llm import (
    assemble_node_text,
    embed_missing,
    generate_tags,
    hash_embedder,
    keyword_tagger,
)
from thewhisperdb_spark.plans.jobs import (
    relink_by_embedding,
    relink_by_tags,
    run_clustering,
)
from thewhisperdb_spark.sources.multimodal import (
    deterministic_fake_decoder,
    extract_image_features,
    extract_text,
    read_binary_files,
    sample_frames,
    with_media_metadata,
)


@pytest.fixture(scope="module")
def media_df(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("media")
    (root / "a.txt").write_bytes(b"hello multimodal world")
    (root / "b.md").write_bytes(b"# heading\nbody " + b"x" * 9000)
    (root / "c.png").write_bytes(b"\x89PNG-fake-bytes-0123456789")
    (root / "d.mp4").write_bytes(bytes(range(256)) * 1024)  # 256 KiB
    (root / "e.bin").write_bytes(b"\x00\x01")
    (root / "f.wav").write_bytes(b"RIFF-fake-audio-payload-9876543210")
    return with_media_metadata(read_binary_files(spark, str(root)))


def test_media_metadata(media_df):
    rows = {r["path"].rsplit("/", 1)[-1]: (r["modality"], r["mime"], r["n_bytes"])
            for r in media_df.collect()}
    assert rows["a.txt"] == ("text", "text/plain", 22)
    assert rows["c.png"][0] == "image"
    assert rows["d.mp4"][0] == "video"
    assert rows["e.bin"] == ("unknown", "application/octet-stream", 2)


def test_extract_text_cap(media_df):
    got = {r["path"].rsplit("/", 1)[-1]: (r["extracted"], r["status"])
           for r in extract_text(media_df, cap=100).collect()}
    assert got["a.txt"] == ("hello multimodal world", "ok")
    assert len(got["b.md"][0]) == 100       # truncation semantics (S8)
    assert got["b.md"][1] == "ok"
    assert got["c.png"] == ("", "unsupported")   # non-text: attributable ""
    assert got["d.mp4"][1] == "unsupported"


def test_extract_text_status_attributes_empties(spark, tmp_path):
    """"" results must carry WHY (VERDICT r5: a missing pdftotext was
    indistinguishable from an empty document): empty text file -> empty,
    pdf without the tool (or a broken pdf with it) -> tool_missing/error/
    timeout, never 'ok'; unknown mime -> unsupported."""
    from thewhisperdb_spark.sources.multimodal import (
        _pdf_to_text, read_binary_files, with_media_metadata)

    root = tmp_path / "m"
    root.mkdir()
    (root / "fake.pdf").write_bytes(b"%PDF-1.4 not really a pdf")
    (root / "blob.xyz").write_bytes(b"\x01\x02")
    got = {r["path"].rsplit("/", 1)[-1]: (r["extracted"], r["status"])
           for r in extract_text(
               with_media_metadata(read_binary_files(spark, str(root)))
           ).collect()}
    # zero-byte / NULL-content rows (binaryFile skips 0-byte files, so
    # pin via a constructed frame): legitimately empty -> 'empty'
    made = spark.createDataFrame(
        [("m/e.txt", "text/plain", b""), ("m/n.txt", "text/plain", None)],
        "path string, mime string, content binary")
    for r in extract_text(made).collect():
        assert (r["extracted"], r["status"]) == ("", "empty")
    assert got["blob.xyz"] == ("", "unsupported")
    pdf_text, pdf_status = got["fake.pdf"]
    assert pdf_text == ""
    assert pdf_status in ("tool_missing", "error", "timeout")
    # the helper's status mapping, pinned directly
    text, status = _pdf_to_text(b"%PDF junk")
    assert (text, status == "tool_missing" or status == "error") == ("", True)


def test_image_features_deterministic(media_df):
    out = extract_image_features(media_df, deterministic_fake_decoder).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["height"], r["width"]) == (8, 8)
    assert 0.0 < r["mean_intensity"] < 1.0
    assert abs(sum(r["histogram"]) - 1.0) < 1e-9
    # decode without a codec hook is an explicit NotImplementedError gate
    with pytest.raises(Exception):
        extract_image_features(media_df, None).collect()


def test_resize_images_nearest_neighbor(media_df):
    from thewhisperdb_spark.sources.multimodal import resize_images

    # downsample 8x8 -> 4x4: nearest-neighbor must pick source pixels
    # (2*r+1, 2*c+1) for output (r, c) — pin against the fake decoder's
    # deterministic raster
    out = resize_images(media_df, 4, 4, deterministic_fake_decoder).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["height"], r["width"]) == (4, 4)
    content = [row["content"] for row in media_df.collect()
               if row["path"].endswith("c.png")][0]
    src = deterministic_fake_decoder(bytes(content))
    for i in range(4):
        for j in range(4):
            assert r["pixels"][i][j] == src[2 * i + 1][2 * j + 1]
    # upsample 2x2 -> 4x4 duplicates each source pixel into a 2x2 block
    up = resize_images(media_df, 4, 4,
                       lambda b: [[0.1, 0.2], [0.3, 0.4]]).collect()[0]
    assert up["pixels"] == [[0.1, 0.1, 0.2, 0.2], [0.1, 0.1, 0.2, 0.2],
                            [0.3, 0.3, 0.4, 0.4], [0.3, 0.3, 0.4, 0.4]]
    # same missing-codec gate as the feature extractor
    with pytest.raises(Exception):
        resize_images(media_df, 4, 4, None).collect()


def test_image_pipeline_real_bytes_no_injection(spark):
    """binaryFile -> metadata -> decode -> features -> resize end-to-end on
    COMMITTED real image bytes with the default stdlib codec — no injected
    fakes (VERDICT r4 item 5). Fixtures:
    tests/fixtures/tiny.{ppm,bmp,pgm,png,jpg}."""
    import os
    import sys

    from thewhisperdb_spark.sources.multimodal import (
        decode_ppm_bmp,
        resize_images,
    )

    root = os.path.join(os.path.dirname(__file__), "fixtures")
    media = with_media_metadata(
        read_binary_files(spark, root, glob="tiny.*"))
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in media.collect()}
    assert rows["tiny.ppm"]["modality"] == "image"
    assert rows["tiny.bmp"]["mime"] == "image/bmp"
    assert rows["tiny.pgm"]["mime"] == "image/x-portable-graymap"

    feats = {r["path"].rsplit("/", 1)[-1]: r
             for r in extract_image_features(media).collect()}
    # P6 PPM: 6x4 gradient, pixel (r,c) = (40c, 60r, 128)
    assert (feats["tiny.ppm"]["height"], feats["tiny.ppm"]["width"]) == (4, 6)
    exp_mean = sum((min(255, 40 * c) + min(255, 60 * r) + 128) / (3 * 255.0)
                   for r in range(4) for c in range(6)) / 24
    assert abs(feats["tiny.ppm"]["mean_intensity"] - exp_mean) < 1e-12
    # BMP: bottom-up storage must come back top-down; pixel (r,c) BGR =
    # (10r, 20c, 255)
    assert (feats["tiny.bmp"]["height"], feats["tiny.bmp"]["width"]) == (4, 4)
    bmp_raster = decode_ppm_bmp(
        open(os.path.join(root, "tiny.bmp"), "rb").read())
    assert bmp_raster[0][0] == 255 / (3 * 255.0)          # r=0,c=0
    assert bmp_raster[3][2] == (30 + 40 + 255) / (3 * 255.0)
    # ASCII PGM: 3x2 with maxval 15
    pgm = decode_ppm_bmp(open(os.path.join(root, "tiny.pgm"), "rb").read())
    assert pgm == [[0 / 15, 5 / 15, 10 / 15], [15 / 15, 3 / 15, 9 / 15]]
    # PNG (r6 gate closed): 6x4 RGB, pixel (r,c) = (40r+10c, 20r+5c, 128),
    # one scanline filter per row (None/Sub/Up/Paeth) so the COMMITTED
    # fixture exercises the filter decoders, not just filter 0
    assert rows["tiny.png"]["mime"] == "image/png"
    assert (feats["tiny.png"]["height"], feats["tiny.png"]["width"]) == (4, 6)
    png_raster = decode_ppm_bmp(
        open(os.path.join(root, "tiny.png"), "rb").read())
    assert png_raster == [[(60 * r + 15 * c + 128) / 765.0
                           for c in range(6)] for r in range(4)]

    # JPEG (r8 gate closed): committed 24x20 grayscale baseline fixture
    # (tools/make_jpeg_fixture.py — Annex K tables, restart interval 2);
    # lossy, so the check is dimensions + closeness to the source pattern
    assert rows["tiny.jpg"]["mime"] == "image/jpeg"
    assert (feats["tiny.jpg"]["height"], feats["tiny.jpg"]["width"]) == (20, 24)
    jpg_raster = decode_ppm_bmp(
        open(os.path.join(root, "tiny.jpg"), "rb").read())
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_jpeg_fixture import make_pattern
    src = make_pattern()
    err = sum(abs(jpg_raster[r][c] * 255.0 - src[r][c])
              for r in range(20) for c in range(24)) / (20 * 24)
    assert err < 10.0  # quality-50 quantization loss, not decoder error

    # resize through the same default codec
    rs = {r["path"].rsplit("/", 1)[-1]: r
          for r in resize_images(media, 2, 2).collect()}
    assert all(r["height"] == 2 and r["width"] == 2 for r in rs.values())
    # ppm, pgm, bmp, png, jpg, gif, tif — all default-codec decodable
    assert len(rs) == 7


def test_audio_pipeline_real_bytes_no_injection(spark):
    """binaryFile -> decode -> audio features on a COMMITTED 16-bit PCM WAV
    with the default stdlib RIFF parser — no injected fakes. The fixture is
    a 200-sample 400 Hz sine at 8 kHz, amplitude 16000/32768, so RMS ~
    0.488/sqrt(2) and ZCR ~ 2*400/8000."""
    import math
    import os
    import struct

    from thewhisperdb_spark.sources.multimodal import (
        decode_wav,
        extract_audio_features,
    )

    root = os.path.join(os.path.dirname(__file__), "fixtures")
    media = with_media_metadata(read_binary_files(spark, root, glob="*.wav"))
    r = extract_audio_features(media).collect()[0]
    assert r["sample_rate"] == 8000
    assert abs(r["duration_s"] - 200 / 8000) < 1e-12
    assert abs(r["rms"] - (16000 / 32768) / math.sqrt(2)) < 0.01
    assert abs(r["zero_crossing_rate"] - 2 * 400 / 8000) < 0.02

    # stereo averaging: L=+0.5, R=-0.5 -> mono 0.0
    n = 4
    frames = struct.pack(f"<{2 * n}h", *([16384, -16384] * n))
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    riff = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(frames)) + frames)
    rate, pcm = decode_wav(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    assert rate == 8000 and pcm == [0.0] * n
    # 8-bit unsigned: 128 is silence, 255 ~ +1
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    riff8 = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt8)) + fmt8
             + b"data" + struct.pack("<I", 3) + bytes([128, 255, 0]))
    _, pcm8 = decode_wav(b"RIFF" + struct.pack("<I", len(riff8) + 1) + riff8)
    assert pcm8 == [0.0, 127 / 128, -1.0]
    # compressed/unknown formats keep the loud injection gate
    import pytest

    with pytest.raises(NotImplementedError, match="RIFF/WAVE PCM"):
        decode_wav(b"\xff\xfb\x90mp3-frame-bytes")


def test_frame_sampling(media_df):
    frames = sample_frames(media_df, every_n_bytes=1 << 16, frame_bytes=64).collect()
    assert len(frames) == 4                 # 256 KiB / 64 KiB
    assert all(len(r["frame"]) == 64 for r in frames)
    assert sorted(r["frame_idx"] for r in frames) == [0, 1, 2, 3]


def test_hash_embedder_and_embed_missing(spark):
    df = spark.createDataFrame(
        [(1, "spark sql engine", [0.5] * 4), (2, "vector search", None),
         (3, "", None)],
        "id long, txt string, embedding array<float>")
    out = embed_missing(df, "txt", hash_embedder(8), dim=8)
    rows = {r["id"]: r["embedding"] for r in out.collect()}
    assert rows[1] == [0.5] * 4             # present rows never re-embedded
    assert len(rows[2]) == 8
    n = sum(x * x for x in rows[2])
    assert abs(n - 1.0) < 1e-5              # L2-normalized
    assert rows[3] == [0.0] * 8             # empty text -> zero vector
    # determinism across invocations
    again = {r["id"]: r["embedding"]
             for r in embed_missing(df, "txt", hash_embedder(8), dim=8).collect()}
    assert again[2] == rows[2]


def test_keyword_tagger_contract(spark):
    tagger = keyword_tagger(["spark", "Graph Algo"], max_tags=4, max_new=2)
    df = spark.createDataFrame(
        [(1, "spark streaming with watermark watermark checkpoint")],
        "id long, txt string")
    [row] = generate_tags(df, "txt", tagger).collect()
    tags = row["generated_tags"]
    assert tags[0] == "spark"               # vocabulary tags first
    assert "graph-algo" not in tags         # vocab tag not in text excluded
    assert len([t for t in tags if t not in ("spark",)]) <= 2  # max_new
    assert "watermark" in tags              # most-frequent new token


def test_run_clustering_replaces_links(spark):
    rows = [
        (1, "a", [1.0, 0.0], [9]),   # pre-linked to 9; will match 2
        (2, "b", [1.0, 0.01], []),
        (3, "c", [0.0, 1.0], [9]),   # isolated in similarity graph
        (9, "z", None, [1, 3]),      # no embedding
    ]
    nodes = spark.createDataFrame(
        rows, "id long, title string, embedding array<float>, linked_nodes array<long>")
    out = run_clustering(nodes, threshold=0.9)
    links = {r["id"]: list(r["linked_nodes"]) for r in out["nodes"].collect()}
    assert links[1] == [2]                  # REPLACED (old link to 9 gone)
    assert links[2] == [1]
    assert links[3] == [9]                  # untouched (no new edges)
    assert links[9] == [1, 3]
    stats = out["stats"].collect()[0]
    assert stats["linksCreated"] == 1 and stats["clustersFound"] == 1
    comp = {r["id"]: r["component"] for r in out["labels"].collect()}
    assert comp[1] == comp[2] and comp[3] != comp[1]


def test_run_clustering_embeds_missing(spark):
    nodes = spark.createDataFrame(
        [(1, "same text", None, []), (2, "same text", None, [])],
        "id long, title string, embedding array<float>, linked_nodes array<long>")
    out = run_clustering(nodes, threshold=0.99, embedder=hash_embedder(16), dim=16)
    stats = out["stats"].collect()[0]
    assert stats["embeddingsGenerated"] == 2
    links = {r["id"]: list(r["linked_nodes"]) for r in out["nodes"].collect()}
    assert links == {1: [2], 2: [1]}        # identical text -> cosine 1.0


def test_relink_by_tags_merges(spark):
    nodes = spark.createDataFrame(
        [(1, ["x", "y"], [5]), (2, ["x", "y"], []), (5, ["q"], [1])],
        "id long, tags array<string>, linked_nodes array<long>")
    out = relink_by_tags(nodes, threshold=0.9)
    links = {r["id"]: list(r["linked_nodes"]) for r in out.collect()}
    assert links[1] == [2, 5]               # MERGED: old 5 + new 2
    assert links[2] == [1]
    assert links[5] == [1]


def test_relink_by_embedding_merges_vs_clustering_replaces(spark):
    # G6 (EmbeddingService.cpp:117-134 updateLinks, MERGE) vs G7
    # (EmbeddingService.cpp:177-187, REPLACE) on the SAME input — the
    # replace-vs-merge split SURVEY §7 flags as a correctness trap.
    rows = [
        (1, [1.0, 0.0], [9]),    # pre-linked to 9; will match 2
        (2, [1.0, 0.01], []),
        (9, [0.0, 1.0], [1]),    # dissimilar to both
    ]
    nodes = spark.createDataFrame(
        rows, "id long, embedding array<float>, linked_nodes array<long>")
    merged = relink_by_embedding(nodes, threshold=0.9)
    m = {r["id"]: list(r["linked_nodes"]) for r in merged.collect()}
    assert m[1] == [2, 9]                   # MERGE: old 9 survives, new 2 added
    assert m[2] == [1]
    assert m[9] == [1]
    replaced = run_clustering(nodes.withColumn("title", F.lit("t")),
                              threshold=0.9)["nodes"]
    r = {row["id"]: list(row["linked_nodes"]) for row in replaced.collect()}
    assert r[1] == [2]                      # REPLACE: old 9 gone
    assert m[1] != r[1]                     # the two modes genuinely diverge


def test_model_output_tag_extraction(spark):
    # full LLM tagging path: raw completions -> column-side JSON-array parse
    from thewhisperdb_spark.functions.llm import (
        extract_tag_array,
        generate_tags_from_model_output,
    )

    df = spark.createDataFrame(
        [(1, "spark doc"), (2, "broken doc"), (3, "other doc")],
        "id long, text string")

    def fake_model(texts):
        out = []
        for t in texts:
            if "broken" in t:
                out.append("I'm sorry, I can't tag that.")
            else:
                out.append(f'Tags: ["Big Data", "{t.split()[0]}"] — cheers!')
        return out

    got = {r["id"]: list(r["generated_tags"])
           for r in generate_tags_from_model_output(df, "text", fake_model)
           .collect()}
    assert got[1] == ["big-data", "spark"]  # normalized (space -> '-')
    assert got[2] == []                     # parse failure -> empty, not null
    assert got[3] == ["big-data", "other"]
    # scalar: malformed JSON inside brackets -> NULL from from_json
    bad = spark.range(1).select(
        extract_tag_array(F.lit("x [not json] y")).alias("t")).collect()[0]["t"]
    assert bad is None


def test_http_embedder_request_response_shape():
    # OpenAI-compatible embeddings client against a stub transport: request
    # contract (url path, bearer auth, model + batch input) and response
    # handling (index re-ordering, batch chunking) — no network, no Spark
    from thewhisperdb_spark.functions.llm import HttpEmbedder

    calls = []

    def stub(url, headers, payload, timeout):
        calls.append((url, headers, payload))
        # answer out of order: the client must re-sort by index
        return {"data": [
            {"index": i, "embedding": [float(i), 0.5]}
            for i in reversed(range(len(payload["input"])))]}

    emb = HttpEmbedder(base_url="https://llm.example.test/", model="emb-x",
                       api_key="sk-test", batch_size=2, transport=stub)
    got = emb(["a", "b", "c"])
    assert got == [[0.0, 0.5], [1.0, 0.5], [0.0, 0.5]]
    assert len(calls) == 2                      # 3 texts, batch_size 2
    url, headers, payload = calls[0]
    assert url == "https://llm.example.test/v1/embeddings"
    assert headers["Authorization"] == "Bearer sk-test"
    assert payload == {"model": "emb-x", "input": ["a", "b"]}
    assert calls[1][2]["input"] == ["c"]
    # row-count mismatch fails loudly instead of misaligning vectors
    import pytest

    bad = HttpEmbedder(base_url="x", transport=lambda *a: {"data": []})
    with pytest.raises(ValueError, match="0 rows"):
        bad(["a"])


def test_http_clients_fail_fast_without_api_key(monkeypatch):
    # default transport + no resolvable key must raise at construction, not
    # send "Authorization: Bearer " (empty) to a real endpoint (ADVICE r4)
    import pytest

    from thewhisperdb_spark.functions.llm import HttpEmbedder, HttpTagGenerator

    monkeypatch.delenv("WHISPERDB_LLM_API_KEY", raising=False)
    with pytest.raises(ValueError, match="API key"):
        HttpEmbedder(base_url="https://llm.example.test")
    with pytest.raises(ValueError, match="API key"):
        HttpTagGenerator(["t"], base_url="https://llm.example.test")
    # an injected transport is exempt (tests, custom auth schemes)
    HttpEmbedder(base_url="x", transport=lambda *a: {"data": []})
    # an EXPLICITLY passed key — including "" for keyless local endpoints
    # (vLLM/ollama) — is intentional and exempt (ADVICE r5)
    assert HttpEmbedder(base_url="x", api_key="").api_key == ""
    assert HttpTagGenerator(["t"], base_url="x", api_key="").api_key == ""
    # and an env-provided key satisfies the default transport
    monkeypatch.setenv("WHISPERDB_LLM_API_KEY", "sk-env")
    assert HttpEmbedder(base_url="x").api_key == "sk-env"


def test_http_tag_generator_request_response_shape():
    # chat-completions tagger: vocabulary + max-new-tags prompt contract,
    # temperature/max_tokens knobs (TagClient.cpp:159-211), raw completions
    # returned for the column-side JSON-array parse
    from thewhisperdb_spark.functions.llm import HttpTagGenerator

    calls = []

    def stub(url, headers, payload, timeout):
        calls.append((url, headers, payload))
        return {"choices": [{"message": {"content": '["spark", "etl"]'}}]}

    tagger = HttpTagGenerator(["Big Data", "spark"], max_new=2,
                              base_url="https://llm.example.test",
                              model="tag-x", api_key="sk-t",
                              temperature=0.7, max_tokens=64, transport=stub)
    got = tagger(["doc one", "doc two"])
    assert got == ['["spark", "etl"]', '["spark", "etl"]']
    assert len(calls) == 2                      # one completion per text
    url, headers, payload = calls[0]
    assert url == "https://llm.example.test/v1/chat/completions"
    assert headers["Authorization"] == "Bearer sk-t"
    assert payload["model"] == "tag-x"
    assert payload["temperature"] == 0.7
    assert payload["max_tokens"] == 64
    prompt = payload["messages"][0]["content"]
    assert "big-data" in prompt                 # vocabulary is normalized
    assert "at most 2 new tags" in prompt
    assert "doc one" in prompt


def test_synthetic_generator_matches_reference_shape(spark):
    # S9 (utils/generate_db.py:1-20): id 1..N, Node{i}, /tmp/node_{i}
    from thewhisperdb_spark.sources.synthetic import (
        synthetic_full_nodes,
        synthetic_nodes,
    )

    df = synthetic_nodes(spark, 5)
    rows = {r["id"]: r for r in df.collect()}
    assert sorted(rows) == [1, 2, 3, 4, 5]
    assert rows[3]["title"] == "Node3"
    assert rows[3]["description"] == "/tmp/node_3"
    # full-schema variant feeds GraphEngine / operators directly
    from thewhisperdb_spark.schemas import NODE_SCHEMA

    full = synthetic_full_nodes(spark, 50, embed_dim=8)
    assert {f.name for f in full.schema.fields} == \
        {f.name for f in NODE_SCHEMA.fields}
    emb = full.filter(F.col("id") == 7).collect()[0]["embedding"]
    norm = sum(x * x for x in emb) ** 0.5
    assert abs(norm - 1.0) < 1e-5           # unit-norm, deterministic


def test_synthetic_generator_drives_operators_at_larger_n(spark):
    # S9's purpose in the reference is load testing; use it to exercise the
    # CC kernel and minhash far above the parquet fixtures' row counts.
    from thewhisperdb_spark.operators.graph import clusters_from_pairs
    from thewhisperdb_spark.sources.synthetic import synthetic_full_nodes

    n = 20_000
    nodes = synthetic_full_nodes(spark, n, n_tags=50, tags_per_node=3)
    # ring edges 1-2, 2-3, ..., plus a long-range chord every 1000
    ids = nodes.select("id")
    ring = ids.select(F.col("id").alias("a"),
                      (F.col("id") % n + 1).alias("b"))
    labels = clusters_from_pairs(ids, ring)
    assert labels.count() == n
    # a ring is one component
    assert labels.select("component").distinct().count() == 1


def test_audio_features_deterministic(media_df):
    from thewhisperdb_spark.sources.multimodal import (
        deterministic_fake_audio_decoder,
        extract_audio_features,
    )

    out = extract_audio_features(
        media_df, deterministic_fake_audio_decoder).collect()
    assert len(out) == 1
    r = out[0]
    assert r["path"].endswith("f.wav")
    assert r["sample_rate"] == 8000
    assert abs(r["duration_s"] - 1024 / 8000) < 1e-12
    assert 0.0 < r["rms"] < 1.0
    assert 0.0 < r["zero_crossing_rate"] < 1.0
    # deterministic: a second run reproduces the exact features
    again = extract_audio_features(
        media_df, deterministic_fake_audio_decoder).collect()[0]
    assert (again["rms"], again["zero_crossing_rate"]) == \
        (r["rms"], r["zero_crossing_rate"])
    # decode without a codec hook is an explicit NotImplementedError gate
    with pytest.raises(Exception):
        extract_audio_features(media_df, None).collect()


def test_quarantine_mode_isolates_corrupt_media(media_df):
    """on_error='quarantine' — the 100 TB operating mode: one corrupt or
    codec-less file must not abort a million-file job. Failed rows come
    back with NULL features and an attributable status; clean rows are
    bit-identical to the default mode; the default stays LOUD."""
    import pytest

    from thewhisperdb_spark.sources.multimodal import (
        extract_audio_features, extract_image_features, resize_images)

    # media_df has c.png (fake PNG -> no built-in codec) among images and
    # f.wav (fake RIFF bytes -> parse error) among audio
    out = {r["path"].rsplit("/", 1)[-1]: r
           for r in extract_image_features(
               media_df, None, on_error="quarantine").collect()}
    assert out["c.png"]["mean_intensity"] is None
    assert out["c.png"]["status"].startswith("NotImplementedError")
    rz = {r["path"].rsplit("/", 1)[-1]: r
          for r in resize_images(media_df, 4, 4, None,
                                 on_error="quarantine").collect()}
    assert rz["c.png"]["pixels"] is None
    assert rz["c.png"]["status"].startswith("NotImplementedError")
    au = {r["path"].rsplit("/", 1)[-1]: r
          for r in extract_audio_features(
              media_df, None, on_error="quarantine").collect()}
    assert au["f.wav"]["rms"] is None
    assert au["f.wav"]["status"].startswith(("NotImplementedError",
                                             "ValueError"))
    # clean rows match the default mode exactly (deterministic decoder)
    ok = {r["path"]: r["mean_intensity"] for r in extract_image_features(
        media_df, deterministic_fake_decoder).collect()}
    qk = {r["path"]: (r["mean_intensity"], r["status"])
          for r in extract_image_features(
              media_df, deterministic_fake_decoder,
              on_error="quarantine").collect()}
    assert {p: v for p, (v, s) in qk.items()} == ok
    assert all(s == "ok" for _, s in qk.values())
    # default mode unchanged: loud per-format gate
    with pytest.raises(Exception, match="no built-in codec"):
        extract_image_features(media_df, None).collect()
    with pytest.raises(ValueError, match="on_error"):
        extract_image_features(media_df, None, on_error="skip")


def _make_png(w, h, depth, ctype, rasters, filters, plte=None,
              interlace=0):
    """Minimal PNG writer for decoder tests: ``rasters`` is a list of h
    raw scanlines (bytes, w*channels each), ``filters`` the per-row filter
    type whose FORWARD transform is applied here so the decoder's inverse
    is what's under test."""
    import struct
    import zlib

    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    prev = bytes(w * nch)
    scan = b""
    for row, ft in zip(rasters, filters):
        out = bytearray([ft])
        for k in range(len(row)):
            a = row[k - nch] if k >= nch else 0
            b, c = prev[k], (prev[k - nch] if k >= nch else 0)
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                          else c)
            out.append((row[k] - pred) & 0xFF)
        scan += bytes(out)
        prev = row

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    body = chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0,
                                      interlace))
    if plte is not None:
        body += chunk(b"PLTE", plte)
    return (b"\x89PNG\r\n\x1a\n" + body
            + chunk(b"IDAT", __import__("zlib").compress(scan))
            + chunk(b"IEND", b""))


def test_png_decoder_filters_color_types_and_gates():
    """The stdlib PNG decoder: every scanline filter (None/Sub/Up/Average/
    Paeth) inverts exactly, every 8-bit color type (gray/RGB/palette/
    gray+alpha/RGBA) maps to the documented grayscale, and the unsupported
    corners (interlaced, 16-bit, JPEG) fail loudly for quarantine mode."""
    import pytest

    from thewhisperdb_spark.sources.multimodal import decode_ppm_bmp

    # all five filters on one grayscale image: 5 rows, deliberately
    # non-monotone values so Average/Paeth predictions differ from Sub/Up
    rows = [bytes([7, 200, 13, 255]), bytes([0, 90, 91, 2]),
            bytes([250, 1, 128, 129]), bytes([33, 34, 200, 5]),
            bytes([100, 99, 98, 97])]
    png = _make_png(4, 5, 8, 0, rows, filters=[0, 1, 2, 3, 4])
    assert decode_ppm_bmp(png) == [[v / 255.0 for v in r] for r in rows]

    # palette: indices map through PLTE, grayscale = RGB mean
    plte = bytes([255, 0, 0, 0, 255, 0, 10, 20, 30])
    png = _make_png(3, 1, 8, 3, [bytes([2, 0, 1])], [0], plte=plte)
    assert decode_ppm_bmp(png) == [[60 / 765, 255 / 765, 255 / 765]]
    # palette index out of range is a loud error, not an IndexError deep
    # in a comprehension
    bad = _make_png(1, 1, 8, 3, [bytes([5])], [0], plte=plte)
    with pytest.raises(ValueError, match="palette index"):
        decode_ppm_bmp(bad)

    # gray+alpha and RGBA: alpha ignored, RGB averaged
    png = _make_png(2, 1, 8, 4, [bytes([100, 7, 200, 250])], [1])
    assert decode_ppm_bmp(png) == [[100 / 255, 200 / 255]]
    png = _make_png(1, 2, 8, 6, [bytes([30, 60, 90, 0]),
                                 bytes([90, 120, 150, 255])], [0, 4])
    assert decode_ppm_bmp(png) == [[180 / 765], [360 / 765]]

    # gates: interlaced and 16-bit raise NotImplementedError (the
    # injected-codec/quarantine contract), JPEG magic keeps its gate
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_ppm_bmp(_make_png(4, 1, 8, 0, [bytes(4)], [0], interlace=1))
    with pytest.raises(NotImplementedError, match="8-bit"):
        # raster irrelevant: the gate fires at the IHDR depth check
        decode_ppm_bmp(_make_png(2, 1, 16, 0, [], []))
    # JPEG magic now routes to the baseline decoder (r8): structurally
    # corrupt bytes are a ValueError (corrupt-data taxonomy), no longer a
    # missing-codec NotImplementedError
    with pytest.raises(ValueError):
        decode_ppm_bmp(b"\xff\xd8\xff\xe0jpeg-bytes")
    # truncation raises via length/zlib checks even though CRCs are not
    # verified: cut mid-IDAT-data (sig 8 + IHDR 25 + IDAT header 8 + 5 of
    # its data bytes), which trips the chunk-length check
    good = _make_png(4, 2, 8, 0, [bytes([1, 2, 3, 4])] * 2, [0, 2])
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm_bmp(good[:46])


def test_jpeg_decoder_baseline_roundtrip_and_gates():
    """The stdlib+numpy baseline JPEG decoder (r8, VERDICT r7 #5): decodes
    the committed encoder-made fixture close to its source pattern
    (restart-interval path included — the fixture uses DRI=2), and the
    unsupported variants fail with the quarantine taxonomy:
    NotImplementedError = missing codec (arithmetic), ValueError =
    corrupt bytes (truncated entropy stream, or a baseline scan header
    re-marked SOF2 — a sequential Ss=0..63 scan is not a legal
    progressive scan)."""
    import os

    import pytest

    from thewhisperdb_spark.sources.multimodal import _decode_jpeg

    root = os.path.join(os.path.dirname(__file__), "fixtures")
    data = open(os.path.join(root, "tiny.jpg"), "rb").read()
    img = _decode_jpeg(data)
    assert (len(img), len(img[0])) == (20, 24)
    assert all(0.0 <= v <= 1.0 for row in img for v in row)
    # gradient must survive: later columns brighter within a checker cell
    assert img[0][3] < img[0][20]
    # SOF0 re-marked SOF2 routes to the progressive decoder, whose scan
    # validation rejects the sequential scan header as corrupt bytes
    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="DC scan with Se"):
        _decode_jpeg(prog)
    # arithmetic coding stays behind the missing-codec gate
    arith = data.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        _decode_jpeg(arith)
    # truncated entropy stream = corrupt-data taxonomy
    with pytest.raises(ValueError):
        _decode_jpeg(data[:len(data) // 2])
    # 12-bit gate: patch SOF precision byte (first byte of SOF0 payload)
    at = data.index(b"\xff\xc0") + 4
    with pytest.raises(NotImplementedError, match="12-bit"):
        _decode_jpeg(data[:at] + b"\x0c" + data[at + 1:])

    # T.81 A.2.2 (code-review r8): a ONE-component scan is non-interleaved
    # — MCU = one 8x8 block in raster order REGARDLESS of declared
    # sampling factors. Patching this grayscale fixture's sampling byte
    # 0x11 -> 0x22 yields a spec-valid file whose correct decode is
    # IDENTICAL (1x1-interleaved MCU order == raster order); honoring the
    # factors as interleave geometry would block-scramble it.
    samp_at = data.index(b"\xff\xc0") + 11  # ln(2)+prec(1)+h(2)+w(2)+nc(1)+id(1)
    assert data[samp_at] == 0x11
    patched = data[:samp_at] + b"\x22" + data[samp_at + 1:]
    assert _decode_jpeg(patched) == img
    # spec-legal 0xFF fill bytes before markers decode identically too
    assert _decode_jpeg(data[:2] + b"\xff\xff" + data[2:]) == img

    # 4-component (Adobe CMYK/YCCK) routes to the missing-codec gate —
    # the first channel is NOT luma; returning it silently would poison
    # features. Synthesize: fixture's DQT+DHT segments + 4-comp SOF/SOS.
    def seg_of(marker):
        a = data.index(marker)
        ln = int.from_bytes(data[a + 2:a + 4], "big")
        return data[a:a + 2 + ln]

    dqt = seg_of(b"\xff\xdb")
    dhts = b""
    a = 0
    while True:
        a = data.find(b"\xff\xc4", a)
        if a < 0:
            break
        ln = int.from_bytes(data[a + 2:a + 4], "big")
        dhts += data[a:a + 2 + ln]
        a += 2 + ln
    sof4 = (b"\xff\xc0" + (2 + 6 + 12).to_bytes(2, "big") + b"\x08"
            + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") + b"\x04"
            + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00\x04\x11\x00")
    sos4 = (b"\xff\xda" + (2 + 1 + 8 + 3).to_bytes(2, "big") + b"\x04"
            + b"\x01\x00\x02\x00\x03\x00\x04\x00" + b"\x00\x3f\x00")
    cmyk = b"\xff\xd8" + dqt + dhts + sof4 + sos4 + b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="CMYK"):
        _decode_jpeg(cmyk)


def test_jpeg_decoder_fuzz_never_leaks_foreign_exceptions():
    """Quarantine-taxonomy fuzz: corrupt JPEGs must surface as ValueError
    (corrupt bytes) or NotImplementedError (unsupported variant) — never
    KeyError/IndexError/ZeroDivisionError, whose class names would
    mis-taxonomize the quarantine status and lose the forensics. 400
    deterministic mutations of the committed fixture (byte flips,
    truncations) plus FFD8-prefixed random garbage. r9: alternate trials
    mutate the PROGRESSIVE fixture instead — the multi-scan decoder's
    EOB-run/refinement state machine holds the same taxonomy."""
    import os
    import random

    import numpy as np

    from thewhisperdb_spark.sources.multimodal import _decode_jpeg

    root = os.path.join(os.path.dirname(__file__), "fixtures")
    base_seq = bytearray(open(os.path.join(root, "tiny.jpg"), "rb").read())
    base_prog = bytearray(
        open(os.path.join(root, "tiny_prog.jpg"), "rb").read())
    rng = random.Random(20260815)
    for trial in range(400):
        data = base_prog if trial % 2 else base_seq
        buf = bytearray(data)
        kind = trial % 4
        if kind == 0:                              # single byte flip
            i = rng.randrange(2, len(buf))
            buf[i] ^= 1 << rng.randrange(8)
        elif kind == 1:                            # truncate anywhere
            buf = buf[:rng.randrange(2, len(buf))]
        elif kind == 2:                            # 8-byte burst corruption
            i = rng.randrange(2, len(buf) - 8)
            for k in range(8):
                buf[i + k] = rng.randrange(256)
        else:                                      # SOI + random garbage
            buf = bytearray(b"\xff\xd8") + bytearray(
                rng.randrange(256) for _ in range(rng.randrange(4, 200)))
        try:
            out = _decode_jpeg(bytes(buf))
            # when a mutation survives decode, the contract shape holds
            assert np.asarray(out).ndim == 2
        except (ValueError, NotImplementedError):
            pass  # the two taxonomy classes — correct
        # anything else (KeyError/IndexError/...) propagates = test fails


def test_jpeg_progressive_decoder_matches_source_pattern():
    """The SOF2 progressive decoder (VERDICT r8 #4): tiny_prog.jpg is the
    SAME 20x24 test card as tiny.jpg but encoded PROGRESSIVE by Java
    ImageIO (an independent real encoder, 6-scan script: DC first + two
    spectral AC bands + two successive-approximation refinements + DC
    refinement; see tools/make_progressive_fixture.py, which also
    value-checks the committed bytes against ImageIO's own decode).
    Decoding it must recover the source pattern as faithfully as the
    baseline fixture does; the color fixture exercises the interleaved
    multi-component DC scan path (10-scan script)."""
    import os

    import numpy as np
    import pytest

    from thewhisperdb_spark.sources.multimodal import _decode_jpeg

    root = os.path.join(os.path.dirname(__file__), "fixtures")
    data = open(os.path.join(root, "tiny_prog.jpg"), "rb").read()
    assert b"\xff\xc2" in data                   # really SOF2
    img = np.array(_decode_jpeg(data))
    assert img.shape == (20, 24)
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0
    # source pattern: 32 + 128*checker(4x4) + 4x + 2y, in [0,255]
    y, x = np.mgrid[0:20, 0:24]
    pattern = np.clip(32 + 128 * ((x // 4 + y // 4) % 2) + x * 4 + y * 2,
                      0, 255) / 255.0
    d = np.abs(img - pattern)
    # ImageIO's q=0.7 table is lossier than tiny.jpg's Annex-K Q50 —
    # the decode itself matches ImageIO within 0.001 (generator-gated)
    assert d.mean() < 0.03 and d.max() < 0.12, (d.mean(), d.max())
    # and it matches the BASELINE decode of the same card
    base = np.array(_decode_jpeg(
        open(os.path.join(root, "tiny.jpg"), "rb").read()))
    assert np.abs(img - base).mean() < 0.03
    # interleaved multi-component progressive (color, 3 comps)
    color = open(os.path.join(root, "tiny_prog_color.jpg"), "rb").read()
    cimg = np.array(_decode_jpeg(color))
    assert cimg.shape == (40, 32)
    # luma of the generator's RGB card rises with y (G channel: 16+5y)
    assert cimg[35, :8].mean() > cimg[2, :8].mean()
    # truncating a progressive stream = corrupt-bytes taxonomy
    with pytest.raises(ValueError):
        _decode_jpeg(data[:len(data) // 2])
    # a stream that never transmits the luma DC scan fails loudly: keep
    # headers up to the first SOS, then jump straight to EOI
    first_sos = data.index(b"\xff\xda")
    with pytest.raises(ValueError, match="missing SOF/SOS|DC scan"):
        _decode_jpeg(data[:first_sos] + b"\xff\xd9")


def test_jpeg_decoder_cpu_cap_routes_large_images_to_codec_gate():
    """Code-review r9: the plane cap is CPU-sized (4 MP), not just
    allocation-sized — the pure-Python per-bit entropy decode would
    monopolize an Arrow task for minutes on a large-but-valid image, so
    those must quarantine as missing-codec (NotImplementedError), not
    decode. Built by patching the fixture's SOF to 2048x2048 and padding
    the entropy stream past the bits-per-MCU plausibility floor, so THIS
    gate (not the corrupt-header one) is what fires."""
    import os

    import pytest

    from thewhisperdb_spark.sources.multimodal import _decode_jpeg

    root = os.path.join(os.path.dirname(__file__), "fixtures")
    data = open(os.path.join(root, "tiny.jpg"), "rb").read()
    sof = data.index(b"\xff\xc0")
    big = (data[:sof + 5] + (2048).to_bytes(2, "big")
           + (2048).to_bytes(2, "big") + data[sof + 9:])
    # pad entropy data (0x00 bytes are marker-safe) so 2048x2048 with 1x1
    # sampling (256*256 = 65536 MCUs) passes the >=2-bits-per-MCU check
    assert big.endswith(b"\xff\xd9")
    big = big[:-2] + b"\x00" * 17000 + b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="4 MP plane"):
        _decode_jpeg(big)


def test_jpeg_decoder_zrl_past_block_end_is_corrupt_bytes():
    """Code-review r9: a corrupt stream emitting ZRL (run=15, size=0)
    near the block end must surface as the corrupt-bytes ValueError, not
    silently advance k past 63 and hand garbage coefficients to the
    quarantine-free path. Hand-built 8x8 grayscale JPEG with one-entry
    huffman tables (DC: '0'->size 0; AC: '0'->ZRL) so an all-zero entropy
    byte decodes DC then ZRL,ZRL,ZRL,ZRL -> k = 1+16*4 = 65 > 63."""
    import pytest

    from thewhisperdb_spark.sources.multimodal import _decode_jpeg

    def seg(marker, payload):
        return marker + (len(payload) + 2).to_bytes(2, "big") + payload

    dqt = seg(b"\xff\xdb", b"\x00" + b"\x01" * 64)
    sof = seg(b"\xff\xc0", b"\x08" + (8).to_bytes(2, "big")
              + (8).to_bytes(2, "big") + b"\x01" + b"\x01\x11\x00")
    counts_one = bytes([1] + [0] * 15)
    dht_dc = seg(b"\xff\xc4", b"\x00" + counts_one + b"\x00")
    dht_ac = seg(b"\xff\xc4", b"\x10" + counts_one + b"\xf0")  # '0' = ZRL
    sos = seg(b"\xff\xda", b"\x01" + b"\x01\x00" + b"\x00\x3f\x00")
    jpg = (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
           + b"\x00" + b"\xff\xd9")
    with pytest.raises(ValueError, match="AC run past block end"):
        _decode_jpeg(jpg)


def test_jpeg_decoder_real_world_420_vs_imageio(spark):
    """Value-level cross-check against an INDEPENDENT decoder: Java
    ImageIO (Spark's `image` data source) on the Spark distribution's
    real camera JPEG — baseline SOF0, 3 components, 4:2:0 (Y 2x2), the
    dominant wild format. Our Y-plane output must match ImageIO's
    RGB->BT.601 luma up to chroma rounding/clamping. Skipped when the
    Spark sample data is absent."""
    import os

    import numpy as np
    import pytest

    from thewhisperdb_spark.sources.multimodal import _decode_jpeg

    path = ("/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
            "multi-channel/chr30.4.184.jpg")
    if not os.path.exists(path):
        pytest.skip("Spark sample images not present")
    row = spark.read.format("image").load(path).collect()[0]["image"]
    h, w, nc = row["height"], row["width"], row["nChannels"]
    bgr = (np.frombuffer(bytes(row["data"]), dtype=np.uint8)
           .reshape(h, w, nc).astype(np.float64))
    luma = (0.114 * bgr[:, :, 0] + 0.587 * bgr[:, :, 1]
            + 0.299 * bgr[:, :, 2]) / 255.0
    mine = np.array(_decode_jpeg(open(path, "rb").read()))
    assert mine.shape == (h, w) == (215, 300)
    d = np.abs(luma - mine)
    assert d.mean() < 0.005 and np.percentile(d, 99) < 0.02


def test_gif_decoder_matches_imageio_fixtures():
    """GIF87a/89a decoder: tiny.gif is the SAME 20x24 test card as
    tiny.jpg encoded by Java ImageIO's GIF writer (independent real
    encoder; tools/make_gif_fixture.py refuses to write fixtures whose
    _decode_gif raster differs from ImageIO's own decode). GIF is
    LOSSLESS, so the committed bytes must reproduce the source pattern
    EXACTLY — and tiny_inter.gif (ImageIO progressive mode = the 4-pass
    row interlace, odd 33x29 dims) must reproduce its indexed-color card
    exactly through the de-interleave."""
    import os

    import numpy as np

    from thewhisperdb_spark.sources.multimodal import _decode_gif

    root = os.path.join(os.path.dirname(__file__), "fixtures")
    data = open(os.path.join(root, "tiny.gif"), "rb").read()
    img = np.array(_decode_gif(data))
    y, x = np.mgrid[0:20, 0:24]
    pattern = np.clip(32 + 128 * ((x // 4 + y // 4) % 2) + x * 4 + y * 2,
                      0, 255) / 255.0
    assert img.shape == (20, 24)
    assert np.abs(img - pattern).max() < 1e-12

    inter = open(os.path.join(root, "tiny_inter.gif"), "rb").read()
    # really interlaced: image-descriptor packed byte, bit 6
    packed = inter[10]
    j = 13 + (3 * (2 << (packed & 7)) if packed & 0x80 else 0)
    while inter[j] == 0x21:
        j += 2
        while inter[j] != 0:
            j += 1 + inter[j]
        j += 1
    assert inter[j] == 0x2C and inter[j + 9] & 0x40, "fixture not interlaced"
    cimg = np.array(_decode_gif(inter))
    yy, xx = np.mgrid[0:29, 0:33]
    card = ((xx % 6) * 51 + (yy % 6) * 51
            + ((xx // 4 + yy // 4) % 6) * 51) / (3 * 255.0)
    assert cimg.shape == (29, 33)
    assert np.abs(cimg - card).max() < 1e-12


def test_gif_decoder_local_palette_offset_frame_and_background():
    """Hand-built minimal GIF (clear-code-per-pixel LZW, so the byte
    stream is spec-trivial): a 2x2 frame with a LOCAL color table at
    offset (1,1) inside a 4x3 logical screen whose global table paints
    the background — composition, LCT precedence, and the GCE skip are
    all visible in the output raster."""
    import numpy as np

    from thewhisperdb_spark.sources.multimodal import _decode_gif

    def lzw_trivial(pixels, min_code):
        # CLEAR before every root code: decoder never grows the dict, so
        # the width stays min_code+1 throughout; END terminates
        clear, end, width = 1 << min_code, (1 << min_code) + 1, min_code + 1
        bits, buf, nbits = [], 0, 0
        out = bytearray()
        for code in [clear] + [c for p in pixels for c in (p, clear)][:-1] \
                + [end]:
            buf |= code << nbits
            nbits += width
            while nbits >= 8:
                out.append(buf & 0xFF)
                buf >>= 8
                nbits -= 8
        if nbits:
            out.append(buf & 0xFF)
        return bytes(out)

    gct = bytes([30, 60, 90] + [0, 0, 0] * 3)          # bg = entry 0
    lct = bytes([255, 255, 255, 0, 0, 0] + [0, 0, 0] * 2)  # white, black
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])        # skipped extension
    data = lzw_trivial([0, 1, 1, 0], min_code=2)
    gif = (b"GIF89a"
           + (4).to_bytes(2, "little") + (3).to_bytes(2, "little")
           + bytes([0x80 | 0x01, 0, 0])                 # GCT, 4 entries
           + gct + gce
           + b"\x2C" + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
           + bytes([0x80 | 0x01])                       # LCT, 4 entries
           + lct + bytes([2])
           + bytes([len(data)]) + data + b"\x00" + b"\x3B")
    img = np.array(_decode_gif(gif))
    bg = (30 + 60 + 90) / (3 * 255.0)
    exp = np.full((3, 4), bg)
    exp[1, 1], exp[1, 2] = 1.0, 0.0
    exp[2, 1], exp[2, 2] = 0.0, 1.0
    assert np.abs(img - exp).max() < 1e-12


def test_gif_decoder_corrupt_bytes_taxonomy():
    """Byte-level fuzz over the committed fixtures: every mutation either
    decodes to a well-formed raster or raises the two taxonomy classes
    (ValueError = corrupt bytes, NotImplementedError = missing codec /
    over-cap) — never KeyError/IndexError/MemoryError. Plus the explicit
    gates: truncation, no-image stream, over-cap dimensions, index beyond
    the palette."""
    import os
    import random

    import numpy as np
    import pytest

    from thewhisperdb_spark.sources.multimodal import _decode_gif

    root = os.path.join(os.path.dirname(__file__), "fixtures")
    for name in ("tiny.gif", "tiny_inter.gif"):
        base = open(os.path.join(root, name), "rb").read()
        rng = random.Random(hash(name) & 0xFFFF)
        for case in range(150):
            buf = bytearray(base)
            mode = case % 3
            if mode == 0:                       # truncate
                del buf[rng.randrange(7, len(buf)):]
            elif mode == 1:                     # point mutations
                for _ in range(rng.randrange(1, 6)):
                    buf[rng.randrange(6, len(buf))] = rng.randrange(256)
            else:                               # garbage after signature
                buf = bytearray(b"GIF89a") + bytearray(
                    rng.randrange(256) for _ in range(rng.randrange(2, 80)))
            try:
                out = _decode_gif(bytes(buf))
                assert np.asarray(out).ndim == 2
            except (ValueError, NotImplementedError):
                pass
    # explicit gates
    with pytest.raises(ValueError, match="signature"):
        _decode_gif(b"GIF90a" + b"\x00" * 20)
    with pytest.raises(ValueError, match="no image data"):
        _decode_gif(b"GIF89a" + (1).to_bytes(2, "little") * 2
                    + b"\x00\x00\x00" + b"\x3B")
    with pytest.raises(NotImplementedError, match="4 MP plane cap"):
        _decode_gif(b"GIF89a" + (4000).to_bytes(2, "little")
                    + (4000).to_bytes(2, "little") + b"\x00\x00\x00\x3B")


def test_gif_feature_pipeline_end_to_end(spark, tmp_path):
    """binaryFile -> with_media_metadata -> extract_image_features over a
    real committed GIF: .gif maps to the image modality and the default
    decoder produces exact features (GIF is lossless)."""
    import os
    import shutil

    from thewhisperdb_spark.sources.multimodal import (
        extract_image_features,
        read_binary_files,
        with_media_metadata,
    )

    root = os.path.join(os.path.dirname(__file__), "fixtures")
    shutil.copy(os.path.join(root, "tiny.gif"), tmp_path / "tiny.gif")
    media = with_media_metadata(
        read_binary_files(spark, str(tmp_path), glob="*.gif"))
    row = media.collect()[0]
    assert row["modality"] == "image" and row["mime"] == "image/gif"
    feats = extract_image_features(media, on_error="quarantine").collect()
    assert len(feats) == 1 and feats[0]["status"] == "ok"
    assert (feats[0]["height"], feats[0]["width"]) == (20, 24)
    import numpy as np
    y, x = np.mgrid[0:20, 0:24]
    pattern = np.clip(32 + 128 * ((x // 4 + y // 4) % 2) + x * 4 + y * 2,
                      0, 255) / 255.0
    assert abs(feats[0]["mean_intensity"] - pattern.mean()) < 1e-12


def _gif_lzw_trivial(pixels, min_code):
    """CLEAR before every root code: the decoder never grows the dict, so
    the code width stays min_code+1 throughout; END terminates."""
    clear, end, width = 1 << min_code, (1 << min_code) + 1, min_code + 1
    buf = nbits = 0
    out = bytearray()
    for code in [clear] + [c for p in pixels for c in (p, clear)][:-1] \
            + [end]:
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def _gif_image_block(left, top, iw, ih, pixels, min_code=2):
    data = _gif_lzw_trivial(pixels, min_code)
    return (b"\x2C" + left.to_bytes(2, "little") + top.to_bytes(2, "little")
            + iw.to_bytes(2, "little") + ih.to_bytes(2, "little")
            + b"\x00" + bytes([min_code, len(data)]) + data + b"\x00")


def _gce(disposal, delay_cs, transparent=None):
    packed = (disposal & 7) << 2 | (1 if transparent is not None else 0)
    return bytes([0x21, 0xF9, 4, packed, delay_cs & 0xFF, delay_cs >> 8,
                  transparent if transparent is not None else 0, 0])


def test_gif_animation_disposal_and_transparency():
    """The GIF89a animation model, pinned frame by frame on a hand-built
    3-frame stream: GCE transparency leaves the prior canvas visible,
    disposal 2 restores the frame rect to background before the next
    frame, disposal 3 restores the whole pre-frame canvas, and delays
    surface per frame. Palette grays: c0=0, c1=85, c2=170, c3=255 (so
    every composite is exact)."""
    import numpy as np

    from thewhisperdb_spark.sources.multimodal import (
        _decode_gif,
        decode_gif_frames,
    )

    gct = bytes(v for k in range(4) for v in (85 * k,) * 3)
    c = [k * 85 / 255.0 for k in range(4)]
    # frame 1: full 4x3 screen, rows = [0 1 2 3 / 3 2 1 0 / 1 1 2 2]
    f1 = _gif_image_block(0, 0, 4, 3, [0, 1, 2, 3, 3, 2, 1, 0, 1, 1, 2, 2])
    # frame 2: 2x2 at (1,1), disposal 2, transparent=3, delay 5
    #   pixels [1, 3t / 3t, 0] -> only (1,1)=c1 and (2,2)=c0 painted
    f2 = _gce(2, 5, transparent=3) + _gif_image_block(1, 1, 2, 2,
                                                      [1, 3, 3, 0])
    # frame 3: 1x1 at (0,0) painting c2, disposal 3, delay 7
    f3 = _gce(3, 7) + _gif_image_block(0, 0, 1, 1, [2])
    gif = (b"GIF89a" + (4).to_bytes(2, "little") + (3).to_bytes(2, "little")
           + bytes([0x80 | 0x01, 3, 0])          # GCT 4 entries, bg index 3
           + gct + f1 + f2 + f3 + b"\x3B")

    frames = decode_gif_frames(gif)
    assert [(i, d) for i, d, _ in frames] == [(0, 0), (1, 5), (2, 7)]
    exp1 = np.array([[c[0], c[1], c[2], c[3]],
                     [c[3], c[2], c[1], c[0]],
                     [c[1], c[1], c[2], c[2]]])
    assert np.abs(np.array(frames[0][2]) - exp1).max() < 1e-12
    exp2 = exp1.copy()
    exp2[1, 1] = c[1]          # non-transparent pixels painted...
    exp2[2, 2] = c[0]
    # ...(1,2) and (2,1) are transparent -> frame-1 canvas shows through
    assert np.abs(np.array(frames[1][2]) - exp2).max() < 1e-12
    # disposal 2 restored frame 2's rect to background (bg = index 3)
    exp3 = exp1.copy()
    exp3[1:3, 1:3] = c[3]
    exp3[0, 0] = c[2]          # frame 3's own pixel
    assert np.abs(np.array(frames[2][2]) - exp3).max() < 1e-12
    # the still-image view is frame 1; max_frames truncates
    assert np.abs(np.array(_decode_gif(gif)) - exp1).max() < 1e-12
    assert len(decode_gif_frames(gif, max_frames=2)) == 2

    # disposal 3: a 4th frame after f3 must composite on the PRE-f3
    # canvas (f3's pixel at (0,0) wiped, its rect-2 restore kept)
    f4 = _gif_image_block(3, 0, 1, 1, [1])
    gif4 = gif[:-1] + f4 + b"\x3B"
    last = np.array(decode_gif_frames(gif4)[3][2])
    exp4 = exp3.copy()
    exp4[0, 0] = exp1[0, 0]    # disposal-3 restore
    exp4[0, 3] = c[1]          # frame 4's own pixel
    assert np.abs(last - exp4).max() < 1e-12


def test_gif_animation_sampler_end_to_end(spark, tmp_path):
    """sample_animation_frames: executor-side row explosion over real
    bytes — the committed (still) GIF yields exactly one composited
    frame row, a non-GIF image quarantines as missing-codec, and the
    pixels column round-trips through Arrow as array<array<double>>."""
    import os
    import shutil

    import numpy as np

    from thewhisperdb_spark.sources.multimodal import (
        read_binary_files,
        sample_animation_frames,
        with_media_metadata,
    )

    root = os.path.join(os.path.dirname(__file__), "fixtures")
    shutil.copy(os.path.join(root, "tiny.gif"), tmp_path / "tiny.gif")
    shutil.copy(os.path.join(root, "tiny.png"), tmp_path / "tiny.png")
    media = with_media_metadata(read_binary_files(spark, str(tmp_path)))
    rows = {(r["path"].rsplit("/", 1)[-1], r["frame_idx"]): r
            for r in sample_animation_frames(
                media, on_error="quarantine").collect()}
    assert set(rows) == {("tiny.gif", 0), ("tiny.png", None)}
    gif_row = rows[("tiny.gif", 0)]
    assert gif_row["status"] == "ok" and gif_row["delay_cs"] == 0
    assert (gif_row["height"], gif_row["width"]) == (20, 24)
    y, x = np.mgrid[0:20, 0:24]
    pattern = np.clip(32 + 128 * ((x // 4 + y // 4) % 2) + x * 4 + y * 2,
                      0, 255) / 255.0
    assert np.abs(np.array(gif_row["pixels"]) - pattern).max() < 1e-12
    assert rows[("tiny.png", None)]["status"].startswith(
        "NotImplementedError")


def test_tiff_decoder_matches_imageio_fixtures():
    """Baseline TIFF decoder: tiny.tif is the SAME 20x24 test card as
    tiny.jpg encoded UNCOMPRESSED by Java ImageIO's TIFF plugin
    (independent real encoder; tools/make_tiff_fixture.py refuses to
    write fixtures whose _decode_tiff raster differs from ImageIO's own
    decode), and tiny_pb.tif is an RGB card under PackBits (32773).
    TIFF is lossless -> both must reproduce their source patterns
    EXACTLY."""
    import os

    import numpy as np
    import pytest

    from thewhisperdb_spark.sources.multimodal import (
        _decode_tiff,
        _packbits,
        decode_ppm_bmp,
    )

    root = os.path.join(os.path.dirname(__file__), "fixtures")
    data = open(os.path.join(root, "tiny.tif"), "rb").read()
    img = np.array(decode_ppm_bmp(data))        # magic dispatch covers TIFF
    y, x = np.mgrid[0:20, 0:24]
    pattern = np.clip(32 + 128 * ((x // 4 + y // 4) % 2) + x * 4 + y * 2,
                      0, 255) / 255.0
    assert img.shape == (20, 24)
    assert np.abs(img - pattern).max() < 1e-12

    pb = open(os.path.join(root, "tiny_pb.tif"), "rb").read()
    cimg = np.array(_decode_tiff(pb))
    yy, xx = np.mgrid[0:21, 0:24]
    card = (np.where(xx < 12, 40, 200) + (yy * 9) % 256
            + np.where((yy // 3) % 2 == 0, 15, 230)) / (3 * 255.0)
    assert cimg.shape == (21, 24)
    assert np.abs(cimg - card).max() < 1e-9

    # PackBits unit: literals, repeats, the -128 no-op, truncation
    assert _packbits(bytes([2, 10, 11, 12, 0xFF, 7, 0x80, 0, 9]), 6) \
        == bytes([10, 11, 12, 7, 7, 9])
    with pytest.raises(ValueError, match="ends early"):
        _packbits(bytes([2, 10, 11, 12]), 6)

    # explicit gates: tiled layout and non-8-bit depths route to the
    # injected-codec gate, never to silent misdecode
    import struct

    def ifd_patch_tag(buf, tag, new_tag):
        bo = "<" if buf[:2] == b"II" else ">"
        ifd = struct.unpack_from(bo + "I", buf, 4)[0]
        n = struct.unpack_from(bo + "H", buf, ifd)[0]
        out = bytearray(buf)
        for k in range(n):
            e = ifd + 2 + 12 * k
            if struct.unpack_from(bo + "H", buf, e)[0] == tag:
                struct.pack_into(bo + "H", out, e, new_tag)
        return bytes(out)

    tiled = ifd_patch_tag(data, 273, 322)       # StripOffsets -> TileOffsets
    with pytest.raises(NotImplementedError, match="tiled TIFF"):
        _decode_tiff(tiled)
    with pytest.raises(ValueError, match="unknown byte order"):
        _decode_tiff(b"XX*\x00" + data[4:])


def test_tiff_decoder_corrupt_bytes_taxonomy():
    """Byte-level fuzz over both committed TIFF fixtures: every mutation
    decodes to a raster or raises the two taxonomy classes — never
    struct.error/KeyError/IndexError/MemoryError."""
    import os
    import random

    import numpy as np

    from thewhisperdb_spark.sources.multimodal import _decode_tiff

    root = os.path.join(os.path.dirname(__file__), "fixtures")
    for name in ("tiny.tif", "tiny_pb.tif"):
        base = open(os.path.join(root, name), "rb").read()
        rng = random.Random(len(name))
        for case in range(150):
            buf = bytearray(base)
            mode = case % 3
            if mode == 0:
                del buf[rng.randrange(4, len(buf)):]
            elif mode == 1:
                for _ in range(rng.randrange(1, 6)):
                    buf[rng.randrange(2, len(buf))] = rng.randrange(256)
            else:
                buf = bytearray(base[:4]) + bytearray(
                    rng.randrange(256) for _ in range(rng.randrange(4, 80)))
            try:
                out = _decode_tiff(bytes(buf))
                assert np.asarray(out).ndim == 2
            except (ValueError, NotImplementedError):
                pass


def test_image_quality_features_exact(spark, tmp_path):
    """Quality triage features pinned on constructed rasters: a flat
    fill scores zero sharpness/contrast/entropy (the synthetic-fill
    signature), a checkerboard scores maximal sharpness and exactly one
    bit of entropy, and extreme_fraction counts clipped pixels; corrupt
    bytes quarantine."""
    import os
    import shutil

    from thewhisperdb_spark.sources.multimodal import (
        image_quality_features,
        read_binary_files,
        with_media_metadata,
    )

    def decoder(content: bytes):
        kind = bytes(content).decode()
        if kind == "flat":
            return [[0.5] * 8 for _ in range(8)]
        if kind == "checker":
            return [[float((r + c) % 2) for c in range(8)]
                    for r in range(8)]
        raise ValueError("corrupt test raster")

    for name, body in (("flat.png", b"flat"), ("check.png", b"checker"),
                       ("bad.png", b"nope")):
        (tmp_path / name).write_bytes(body)
    media = with_media_metadata(read_binary_files(spark, str(tmp_path)))
    rows = {r["path"].rsplit("/", 1)[-1]: r
            for r in image_quality_features(media, decoder).collect()}
    flat = rows["flat.png"]
    assert flat["status"] == "ok"
    assert flat["sharpness"] == 0.0 and flat["contrast"] == 0.0
    assert flat["entropy_bits"] == 0.0 and flat["extreme_fraction"] == 0.0
    chk = rows["check.png"]
    # interior Laplacian of a 0/1 checkerboard: |4*v - 4*(1-v)| = 4
    assert abs(chk["sharpness"] - 4.0) < 1e-12
    assert abs(chk["contrast"] - 1.0) < 1e-12
    assert abs(chk["entropy_bits"] - 1.0) < 1e-12   # two equal buckets
    assert chk["extreme_fraction"] == 1.0           # all pixels clipped
    assert rows["bad.png"]["status"].startswith("ValueError")
    assert rows["bad.png"]["sharpness"] is None
    # real fixture through the default codec: sane, non-degenerate values
    shutil.copy(os.path.join(os.path.dirname(__file__), "fixtures",
                             "tiny.gif"), tmp_path / "tiny.gif")
    media2 = with_media_metadata(
        read_binary_files(spark, str(tmp_path), glob="tiny.gif"))
    real = image_quality_features(media2).collect()[0]
    assert real["status"] == "ok" and real["sharpness"] > 0.1
    assert 0.4 < real["contrast"] <= 1.0 and real["entropy_bits"] > 2.0


def test_pdf_builtin_extraction_end_to_end(spark, tmp_path):
    """Built-in baseline PDF text extraction (the reference's core S8
    path, previously hard-gated on a pdftotext binary): the committed
    FlateDecode fixture — Tj, kerned TJ arrays, paren/octal/continuation
    escapes, hex strings, the ' operator, Td line breaks — extracts
    EXACTLY (generator-gated, tools/make_pdf_fixture.py), through both
    the helper and the binaryFile -> extract_text pipeline."""
    import os
    import shutil

    from thewhisperdb_spark.sources.multimodal import (
        _pdf_text_builtin,
        _pdf_to_text,
        extract_text,
        read_binary_files,
        with_media_metadata,
    )

    root = os.path.join(os.path.dirname(__file__), "fixtures")
    data = open(os.path.join(root, "tiny.pdf"), "rb").read()
    expected = ("Hello, multimodal world!\n"
                "Kerned array text.\n"
                "Escapes: (parens), back\\slash, octal ABC, continued.\n"
                "Hex string\n"
                "Next line via quote.\n")
    assert _pdf_text_builtin(data) == expected
    text, status = _pdf_to_text(data)        # no pdftotext here -> builtin
    assert (text, status) == (expected, "ok")
    shutil.copy(os.path.join(root, "tiny.pdf"), tmp_path / "tiny.pdf")
    media = with_media_metadata(read_binary_files(spark, str(tmp_path)))
    row = extract_text(media).collect()[0]
    assert row["status"] == "ok" and row["extracted"] == expected

    # gates/taxonomy: encrypted -> tool_missing (builtin has no crypto),
    # structurally fake -> error, unterminated string -> error
    enc = data.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    assert _pdf_to_text(enc) == ("", "tool_missing")
    assert _pdf_to_text(b"%PDF-1.4 not really a pdf") == ("", "error")
    import pytest as _pt
    with _pt.raises(ValueError, match="unterminated"):
        _pdf_text_builtin(
            b"%PDF-1.4\n1 0 obj\n<< /Length 99 >>\nstream\n"
            + b"BT (oops Tj ET" + b"\nendstream\nendobj\ntrailer")
    # a streams-without-text PDF is EMPTY (auditable), not an error
    img_only = data.replace(b"/Filter /FlateDecode", b"/Filter /DCTDecode")
    assert _pdf_to_text(img_only) == ("", "empty")


def test_pdf_builtin_corrupt_bytes_never_raise():
    """_pdf_to_text is the quarantine boundary for PDFs: any mutation of
    the committed fixture comes back as a (text, status) verdict — the
    builtin parser's errors are caught and mapped to the status
    taxonomy, never raised into the extraction job."""
    import os
    import random

    from thewhisperdb_spark.sources.multimodal import _pdf_to_text

    base = open(os.path.join(os.path.dirname(__file__), "fixtures",
                             "tiny.pdf"), "rb").read()
    rng = random.Random(5)
    for case in range(150):
        buf = bytearray(base)
        mode = case % 3
        if mode == 0:
            del buf[rng.randrange(1, len(buf)):]
        elif mode == 1:
            for _ in range(rng.randrange(1, 8)):
                buf[rng.randrange(len(buf))] = rng.randrange(256)
        else:
            buf = bytearray(b"%PDF-1.4\n") + bytearray(
                rng.randrange(256) for _ in range(rng.randrange(4, 120)))
        text, status = _pdf_to_text(bytes(buf))
        assert isinstance(text, str)
        assert status in ("ok", "empty", "error", "tool_missing")


def _make_docx(paragraphs) -> bytes:
    import io
    import zipfile

    W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    t_open = '<w:r><w:t xml:space="preserve">'
    body = "".join(
        "<w:p>" + "".join(t_open + t + "</w:t></w:r>" for t in runs)
        + "</w:p>" for runs in paragraphs)
    doc = (f'<?xml version="1.0"?><w:document xmlns:w="{W}">'
           f"<w:body>{body}</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", doc)
    return buf.getvalue()


def _make_epub(chapters, spine_order) -> bytes:
    """chapters: {name: html}; spine_order: names in reading order."""
    import io
    import zipfile

    items = "".join(
        f'<item id="c{i}" href="{n}" media-type="application/xhtml+xml"/>'
        for i, n in enumerate(sorted(chapters)))
    idref = {n: f"c{i}" for i, n in enumerate(sorted(chapters))}
    refs = "".join(f'<itemref idref="{idref[n]}"/>' for n in spine_order)
    opf = ('<?xml version="1.0"?>'
           '<package xmlns="http://www.idpf.org/2007/opf">'
           f"<manifest>{items}</manifest><spine>{refs}</spine></package>")
    container = ('<?xml version="1.0"?><container xmlns="urn:oasis:names:'
                 'tc:opendocument:xmlns:container"><rootfiles><rootfile '
                 'full-path="OEBPS/content.opf"/></rootfiles></container>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr("META-INF/container.xml", container)
        zf.writestr("OEBPS/content.opf", opf)
        for name, html in chapters.items():
            zf.writestr(f"OEBPS/{name}", html)
    return buf.getvalue()


def test_docx_epub_extraction(spark, tmp_path):
    """OOXML and EPUB text through the S8 dispatch: docx paragraphs
    (with tab/break runs) join in document order, epub chapters follow
    the SPINE order (deliberately non-alphabetical here), and corrupt
    containers report 'error' — all through the real extract_text
    pipeline."""
    from thewhisperdb_spark.sources.multimodal import (
        _docx_to_text,
        _epub_to_text,
        extract_text,
        read_binary_files,
        with_media_metadata,
    )

    docx = _make_docx([["Title line"], ["Body ", "with two runs."]])
    assert _docx_to_text(docx) == ("Title line\nBody with two runs.", "ok")
    assert _docx_to_text(b"PK\x03\x04 corrupt")[1] == "error"

    # spine order z-then-a: alphabetical fallback would invert it
    epub = _make_epub(
        {"a_ch.xhtml": "<html><body><p>Second by spine.</p></body></html>",
         "z_ch.xhtml": "<html><body><p>First by spine.</p></body></html>"},
        spine_order=["z_ch.xhtml", "a_ch.xhtml"])
    text, status = _epub_to_text(epub)
    assert status == "ok"
    assert text == "First by spine.\nSecond by spine."
    assert _epub_to_text(b"not a zip")[1] == "error"

    (tmp_path / "doc.docx").write_bytes(docx)
    (tmp_path / "book.epub").write_bytes(epub)
    media = with_media_metadata(read_binary_files(spark, str(tmp_path)))
    rows = {r["path"].rsplit("/", 1)[-1]: r
            for r in extract_text(media).collect()}
    assert rows["doc.docx"]["status"] == "ok"
    assert rows["doc.docx"]["extracted"].startswith("Title line")
    assert rows["book.epub"]["extracted"] == ("First by spine.\n"
                                              "Second by spine.")


def test_png_encoder_roundtrip_and_thumbnails(spark, tmp_path):
    """The egress half of the codec story: encode_png_gray bytes decode
    EXACTLY through the repo's own PNG decoder (values snap to k/255)
    AND through Java ImageIO (independent real decoder); the thumbnail
    pipeline decodes/resizes/re-encodes executor-side with quarantine,
    and the written PNGs reopen as valid images."""
    import os
    import shutil

    import numpy as np

    from thewhisperdb_spark.sources.multimodal import (
        _decode_png,
        encode_png_gray,
        read_binary_files,
        render_thumbnails,
        with_media_metadata,
    )

    raster = [[(r * 9 + c) % 256 / 255.0 for c in range(9)]
              for r in range(7)]
    png = encode_png_gray(raster)
    assert np.abs(np.array(_decode_png(png)) - np.array(raster)).max() \
        < 1e-12
    # independent decoder: Java ImageIO raster samples must agree
    jvm = spark._jvm
    bi = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(png)))
    jraster = bi.getRaster()
    for r in range(7):
        for c in range(9):
            assert jraster.getSample(c, r, 0) == round(raster[r][c] * 255)

    root = os.path.join(os.path.dirname(__file__), "fixtures")
    shutil.copy(os.path.join(root, "tiny.gif"), tmp_path / "tiny.gif")
    (tmp_path / "bad.png").write_bytes(b"\x89PNG\r\n\x1a\njunk")
    media = with_media_metadata(read_binary_files(spark, str(tmp_path)))
    rows = {r["path"].rsplit("/", 1)[-1]: r
            for r in render_thumbnails(media, 16, 16).collect()}
    assert rows["bad.png"]["thumbnail_png"] is None
    assert rows["bad.png"]["status"].startswith("ValueError")
    ok = rows["tiny.gif"]
    assert ok["status"] == "ok" and (ok["height"], ok["width"]) == (16, 16)
    thumb = np.array(_decode_png(bytes(ok["thumbnail_png"])))
    assert thumb.shape == (16, 16)
    # the thumbnail preserves the card's gradient direction
    assert thumb[:, 12:].mean() > thumb[:, :4].mean()


def test_pdf_length_keyed_stream_slicing():
    """ADVICE r9: binary stream payloads may contain the literal bytes
    b'endstream' — the direct /Length slices past them; indirect lengths
    (/Length N 0 R) still fall back to the keyword scan."""
    import zlib

    from thewhisperdb_spark.sources.multimodal import _pdf_text_builtin

    def pdf(body: bytes, length_entry: bytes, flate: bool = False) -> bytes:
        filt = b" /Filter /FlateDecode" if flate else b""
        return (b"%PDF-1.4\n1 0 obj\n<< " + length_entry + filt +
                b" >>\nstream\n" + body +
                b"\nendstream\nendobj\ntrailer\n")

    # adversarial: an UNFILTERED content stream whose string literal
    # contains the bytes 'endstream' — the old keyword scan truncated
    # here (unterminated string); /Length slices the full payload
    evil = b"BT (before endstream after) Tj ET"
    doc = pdf(evil, b"/Length %d" % len(evil))
    assert _pdf_text_builtin(doc) == "before endstream after\n"
    # indirect length -> scan fallback still extracts clean payloads
    payload = zlib.compress(b"BT (sliced by length) Tj ET")
    doc = pdf(payload, b"/Length 7 0 R", flate=True)
    assert _pdf_text_builtin(doc) == "sliced by length\n"
    # wrong direct length (doesn't land on endstream) -> scan fallback
    doc = pdf(payload, b"/Length 9999", flate=True)
    assert _pdf_text_builtin(doc) == "sliced by length\n"


def test_tiff_rgb_spp_validation():
    """ADVICE r9: photometric=2 (RGB) with SamplesPerPixel < 3 is a
    ValueError, not an IndexError from strip assembly."""
    import os

    import pytest as _pt

    from thewhisperdb_spark.sources.multimodal import _decode_tiff

    root = os.path.join(os.path.dirname(__file__), "fixtures")
    base = bytearray(open(os.path.join(root, "tiny.tif"), "rb").read())
    # locate the IFD entries: tag 262 (photometric) and 277 (spp) are
    # shorts in the file's byte order; patch photometric->2, spp->1
    import struct
    bo = "<" if bytes(base[:2]) == b"II" else ">"

    def patch(tag: int, value: int) -> None:
        off = struct.unpack_from(bo + "I", base, 4)[0]
        n = struct.unpack_from(bo + "H", base, off)[0]
        for k in range(n):
            e = off + 2 + 12 * k
            if struct.unpack_from(bo + "H", base, e)[0] == tag:
                struct.pack_into(bo + "H", base, e + 8, value)
                return
        raise AssertionError(f"tag {tag} not in fixture IFD")

    patch(262, 2)
    patch(277, 1)
    with _pt.raises(ValueError, match="SamplesPerPixel"):
        _decode_tiff(bytes(base))


def test_avi_mjpeg_frames_end_to_end(spark, tmp_path):
    """MJPEG-in-AVI (VERDICT r9 #6): the committed generator-gated
    fixture decodes through the RIFF walk + built-in JPEG path — frame
    count, stream timestamps from dwMicroSecPerFrame, rec-list recursion
    (frame 2 lives inside 'rec '), JPEG-tolerance pixel match, and the
    sample_video_frames pipeline with quarantine taxonomy."""
    import os
    import shutil

    import numpy as np

    from thewhisperdb_spark.sources.multimodal import (
        decode_avi_frames,
        read_binary_files,
        sample_video_frames,
        with_media_metadata,
    )
    from tools.make_avi_fixture import H, W, make_pattern

    root = os.path.join(os.path.dirname(__file__), "fixtures")
    data = open(os.path.join(root, "tiny.avi"), "rb").read()
    frames = decode_avi_frames(data)
    assert [(i, ms) for i, ms, _ in frames] == [(0, 0), (1, 40), (2, 80)]
    base = make_pattern(H, W)
    expected = [base, np.roll(base, 5, axis=1), 255.0 - base]
    for (_, _, raster), src in zip(frames, expected):
        a = np.array(raster) * 255.0
        assert a.shape == (H, W)
        # JPEG q50 tolerance: tight on the mean, loose at ringing edges
        assert np.abs(a - src).mean() < 10.0
    # max_frames truncation
    assert len(decode_avi_frames(data, max_frames=2)) == 2

    shutil.copy(os.path.join(root, "tiny.avi"), tmp_path / "tiny.avi")
    (tmp_path / "fake.avi").write_bytes(b"RIFF\x04\x00\x00\x00AVI ")
    media = with_media_metadata(read_binary_files(spark, str(tmp_path)))
    rows = {os.path.basename(r["path"]): r
            for r in sample_video_frames(
                media, on_error="quarantine").collect()}
    # 3 ok frame rows for the real fixture + 1 quarantine row
    ok = [r for r in sample_video_frames(media, on_error="quarantine")
          .filter("status = 'ok'").collect()]
    assert len(ok) == 3 and all(r["height"] == H for r in ok)
    assert rows["fake.avi"]["status"].startswith("ValueError")


def test_avi_taxonomy_and_fuzz():
    """Non-AVI/truncated bytes -> ValueError; a non-MJPEG vids stream ->
    NotImplementedError; random mutations never escape the taxonomy."""
    import os
    import random
    import struct

    import pytest as _pt

    from thewhisperdb_spark.sources.multimodal import (
        _avi_mjpeg_frames,
        decode_avi_frames,
    )

    root = os.path.join(os.path.dirname(__file__), "fixtures")
    base = open(os.path.join(root, "tiny.avi"), "rb").read()
    with _pt.raises(ValueError, match="RIFF/AVI"):
        decode_avi_frames(b"\x00" * 32)
    # flip the frame payloads to a non-JPEG codec signature
    h264ish = base.replace(b"\xff\xd8\xff", b"\x00\x00\x01")
    with _pt.raises(NotImplementedError, match="MJPEG"):
        _avi_mjpeg_frames(h264ish)
    # truncated/bit-flipped archives: ValueError/NotImplementedError only
    rng = random.Random(7)
    for case in range(200):
        buf = bytearray(base)
        if case % 3 == 0:
            del buf[rng.randrange(12, len(buf)):]
        elif case % 3 == 1:
            for _ in range(rng.randrange(1, 5)):
                buf[rng.randrange(8, len(buf))] = rng.randrange(256)
        else:
            struct.pack_into(
                "<I", buf, rng.randrange(4, len(buf) - 4) & ~3,
                rng.randrange(1 << 31))
        try:
            out = decode_avi_frames(bytes(buf))
            assert out and all(len(r) == 3 for r in out)
        except (ValueError, NotImplementedError):
            pass
