"""Avro OCF codec (sources/avroio.py): spec-level fixture decode
(bytes hand-built from the Apache Avro 1.11 spec, independent of the
writer), full-type roundtrip, null handling, deflate + bomb cap, and
refusal posture."""
from __future__ import annotations

import datetime
import io
import json
import struct
import zlib

import pytest

from thewhisperdb_spark.sources.avroio import (
    MAGIC,
    avro_schema_of,
    read_avro,
    spark_schema_of,
    write_avro,
    _zz_decode,
    _zz_encode,
)


def test_zigzag_spec_vectors():
    """The spec's own varint examples (Avro 1.11 'binary encoding'):
    0->00, -1->01, 1->02, -2->03, 2->04, -64->7f, 64->80 01."""
    vectors = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03",
               2: b"\x04", -64: b"\x7f", 64: b"\x80\x01"}
    for n, b in vectors.items():
        assert _zz_encode(n) == b, n
        v, pos = _zz_decode(memoryview(b), 0)
        assert v == n and pos == len(b)


def _hand_built_ocf() -> bytes:
    """An OCF encoded BY HAND from the spec (no writer involved):
    record {id: long, name: ["null","string"], score: double},
    null codec, two rows: (7, 'ab', 1.5), (-3, null, -0.25)."""
    schema = {"type": "record", "name": "row", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"}]}
    sj = json.dumps(schema).encode()
    out = io.BytesIO()
    out.write(MAGIC)
    out.write(b"\x04")                         # map block: 2 entries
    for k, v in ((b"avro.schema", sj), (b"avro.codec", b"null")):
        out.write(_zz_encode(len(k)) + k)
        out.write(_zz_encode(len(v)) + v)
    out.write(b"\x00")                         # end of map
    sync = bytes(range(16))
    out.write(sync)
    body = io.BytesIO()
    # row 1: id=7 -> 0e ; name union branch 1 + len 2 'ab'; 1.5 LE
    body.write(b"\x0e")
    body.write(b"\x02" + b"\x04" + b"ab")
    body.write(struct.pack("<d", 1.5))
    # row 2: id=-3 -> 05 ; name union branch 0 (null); -0.25
    body.write(b"\x05")
    body.write(b"\x00")
    body.write(struct.pack("<d", -0.25))
    raw = body.getvalue()
    out.write(_zz_encode(2))                   # object count
    out.write(_zz_encode(len(raw)))            # block size
    out.write(raw)
    out.write(sync)
    return out.getvalue()


def test_reader_decodes_hand_built_file(spark, tmp_path):
    p = tmp_path / "hand"
    p.mkdir()
    (p / "part-00000.avro").write_bytes(_hand_built_ocf())
    got = sorted(read_avro(spark, str(p)).collect(),
                 key=lambda r: r["id"])
    assert [(r["id"], r["name"], r["score"]) for r in got] == \
        [(-3, None, -0.25), (7, "ab", 1.5)]


def test_roundtrip_all_types_and_codecs(spark, tmp_path):
    rows = [
        (1, 42, 1.5, 2.25, "héllo", True, b"\x00\xff",
         datetime.datetime(2024, 5, 17, 12, 30, 45, 123456)),
        (2, None, None, None, None, None, None, None),
        (-9, -7, -0.125, -8.0, "", False, b"",
         datetime.datetime(1969, 12, 31, 23, 59, 59)),
    ]
    schema = ("id long, i int, d double, f float, s string, "
              "b boolean, raw binary, ts timestamp")
    df = spark.createDataFrame(rows, schema)
    for codec in ("null", "deflate"):
        out = str(tmp_path / f"rt_{codec}")
        n = write_avro(df.repartition(2), out, codec=codec)
        assert n == 3
        back = read_avro(spark, out)
        assert back.schema == df.schema
        a = sorted(df.collect(), key=lambda r: r["id"])
        b = sorted(back.collect(), key=lambda r: r["id"])
        assert a == b


def test_schema_mapping_and_refusals(spark, tmp_path):
    from pyspark.sql import types as T

    df = spark.createDataFrame([(1, ["x"])], "id long, tags array<string>")
    with pytest.raises(ValueError, match="unsupported type"):
        write_avro(df, str(tmp_path / "nope"))
    # schema json round-trips through both mappers
    flat = df.select("id").schema
    assert spark_schema_of(avro_schema_of(flat)) == flat
    with pytest.raises(ValueError, match="no .avro files"):
        read_avro(spark, str(tmp_path / "empty_dir"))
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part-00000.avro").write_bytes(b"PK\x03\x04 not avro")
    with pytest.raises(Exception, match="not an Avro"):
        read_avro(spark, str(bad)).collect()


def test_deflate_bomb_cap(spark, tmp_path):
    """A block whose deflate payload expands past MAX_BLOCK_BYTES is
    refused INSIDE the block (WARC posture) — build one by patching a
    legitimate file's block with a hand-compressed bomb."""
    import thewhisperdb_spark.sources.avroio as A

    df = spark.createDataFrame([(1, "x")], "id long, s string")
    out = tmp_path / "bomb"
    write_avro(df, str(out), codec="deflate")
    fn = next(out.glob("*.avro"))
    content = fn.read_bytes()
    # reuse header+sync; replace the single data block with a bomb
    schema, codec, sync, pos = A._read_header(memoryview(content))
    c = zlib.compressobj(9, zlib.DEFLATED, -15)
    bomb = c.compress(b"\x02" * (4 * 1024 * 1024)) + c.flush()
    patched = (content[:pos] + A._zz_encode(1)
               + A._zz_encode(len(bomb)) + bomb + sync)
    # decode driver-side with a lowered cap (the worker closure reads
    # the module constant at decode time; patching it here exercises
    # the exact code path read_avro's workers run)
    old = A.MAX_BLOCK_BYTES
    A.MAX_BLOCK_BYTES = 1024 * 1024
    try:
        with pytest.raises(ValueError, match="bomb|cap"):
            A._decode_rows(patched)
    finally:
        A.MAX_BLOCK_BYTES = old
    # and the unpatched 256 MiB default accepts the legitimate file
    A._decode_rows(content)


def test_replay_writes_identical_bytes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], "id long, s string") \
        .repartition(2)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_avro(df, a)
    write_avro(df, b)
    fa = {p.name: p.read_bytes() for p in (tmp_path / "a").glob("*.avro")}
    fb = {p.name: p.read_bytes() for p in (tmp_path / "b").glob("*.avro")}
    assert fa == fb
