"""TIFF fixture generator (tests/fixtures/tiny.tif, tiny_pb.tif) —
encoded by Java ImageIO's TIFF plugin (an INDEPENDENT, real encoder), so
the committed fixtures pin our IFD/strip decoder against bytes we did
not produce ourselves.

- tiny.tif: the SAME 20x24 gradient-x-checker test card as tiny.jpg
  (tools/make_jpeg_fixture.make_pattern), 8-bit grayscale, uncompressed.
- tiny_pb.tif: a 24x21 RGB card, PackBits compression (long horizontal
  runs so the RLE path is non-trivial).

TIFF is lossless here, so the validation gate is EXACT: each fixture's
``_decode_tiff`` raster must equal ImageIO's own decode of the same
bytes (RGB averaged) to 1e-12.

Usage: python tools/make_tiff_fixture.py [fixtures_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_jpeg_fixture import make_pattern  # noqa: E402

from thewhisperdb_spark.sources.multimodal import _decode_tiff  # noqa: E402


def _jvm():
    from thewhisperdb_spark.session import get_spark

    spark = get_spark("make_tiff_fixture", cpus=2)
    return spark, spark._jvm


def encode_tiff(jvm, gray: np.ndarray | None = None,
                rgb: np.ndarray | None = None,
                compression: str | None = None) -> bytes:
    BI = jvm.java.awt.image.BufferedImage
    if gray is not None:
        h, w = gray.shape
        bi = BI(w, h, BI.TYPE_BYTE_GRAY)
        raster = bi.getRaster()
        for y in range(h):
            for x in range(w):
                raster.setSample(x, y, 0, int(gray[y, x]))
    else:
        h, w, _ = rgb.shape
        bi = BI(w, h, BI.TYPE_INT_RGB)
        for y in range(h):
            for x in range(w):
                r, g, b = (int(v) for v in rgb[y, x])
                argb = (255 << 24) | (r << 16) | (g << 8) | b
                bi.setRGB(x, y, argb - (1 << 32))  # Java int is signed
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "tiff").next()
    param = writer.getDefaultWriteParam()
    if compression:
        param.setCompressionMode(2)              # MODE_EXPLICIT
        param.setCompressionType(compression)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    ios.flush()
    data = bytes(baos.toByteArray())
    writer.dispose()
    return data


def imageio_decode_mean_rgb(jvm, data: bytes) -> np.ndarray:
    bais = jvm.java.io.ByteArrayInputStream(bytearray(data))
    bi = jvm.javax.imageio.ImageIO.read(bais)
    h, w = bi.getHeight(), bi.getWidth()
    out = np.zeros((h, w))
    if bi.getColorModel().getNumComponents() == 1:
        raster = bi.getRaster()                  # avoid gray->sRGB gamma
        for y in range(h):
            for x in range(w):
                out[y, x] = raster.getSample(x, y, 0)
    else:
        for y in range(h):
            for x in range(w):
                argb = bi.getRGB(x, y)
                r, g, b = (argb >> 16) & 255, (argb >> 8) & 255, argb & 255
                out[y, x] = (r + g + b) / 3.0
    return out / 255.0


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures")
    spark, jvm = _jvm()

    gray = make_pattern()
    data = encode_tiff(jvm, gray=gray)
    assert data[:4] in (b"II*\x00", b"MM\x00*")
    mine = np.array(_decode_tiff(data))
    ref = imageio_decode_mean_rgb(jvm, data)
    assert mine.shape == gray.shape == ref.shape
    d = np.abs(mine - ref)
    print(f"gray: {mine.shape} max|d|={d.max():.2e}")
    assert d.max() < 1e-12, "TIFF decode must be EXACT vs ImageIO"
    with open(os.path.join(out_dir, "tiny.tif"), "wb") as f:
        f.write(data)

    # RGB card with long horizontal runs (PackBits-friendly) + gradients
    yy, xx = np.mgrid[0:21, 0:24]
    rgb = np.stack([np.where(xx < 12, 40, 200) + 0 * yy,
                    (yy * 9) % 256,
                    np.where((yy // 3) % 2 == 0, 15, 230) + 0 * xx],
                   axis=-1)
    data_pb = encode_tiff(jvm, rgb=rgb, compression="PackBits")
    mine_pb = np.array(_decode_tiff(data_pb))
    ref_pb = imageio_decode_mean_rgb(jvm, data_pb)
    assert mine_pb.shape == (21, 24) == ref_pb.shape
    d = np.abs(mine_pb - ref_pb)
    print(f"packbits rgb: {mine_pb.shape} max|d|={d.max():.2e}")
    assert d.max() < 1e-12, "PackBits TIFF decode must be EXACT vs ImageIO"
    with open(os.path.join(out_dir, "tiny_pb.tif"), "wb") as f:
        f.write(data_pb)
    print("fixtures written to", out_dir)
    spark.stop()


if __name__ == "__main__":
    main()
