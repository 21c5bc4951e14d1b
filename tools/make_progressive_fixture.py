"""Progressive-JPEG fixture generator (tests/fixtures/tiny_prog.jpg,
tiny_prog_color.jpg) — encoded by Java ImageIO (an INDEPENDENT, real
encoder: ``ImageWriteParam.setProgressiveMode(MODE_DEFAULT)`` emits the
standard multi-scan progressive script), so the committed fixtures pin our
SOF2 decoder against bytes we did not produce ourselves.

- tiny_prog.jpg: the SAME 20x24 gradient-x-checker test card as tiny.jpg
  (tools/make_jpeg_fixture.make_pattern), single-component grayscale —
  DC-first + spectral-split AC scans + successive-approximation
  refinements.
- tiny_prog_color.jpg: a 40x32 3-component RGB card — interleaved DC
  scans with per-component tables and (writer-chosen) sampling factors.

The generator is also the first validation gate: it decodes each fixture
with ``_decode_jpeg`` and compares against ImageIO's own decode of the
same bytes (luma for color), refusing to write fixtures that do not
match.

Usage: python tools/make_progressive_fixture.py [fixtures_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_jpeg_fixture import make_pattern  # noqa: E402

from thewhisperdb_spark.sources.multimodal import _decode_jpeg  # noqa: E402


def _jvm():
    from thewhisperdb_spark.session import get_spark

    spark = get_spark("make_prog_fixture", cpus=2)
    return spark, spark._jvm


def encode_progressive(jvm, gray: np.ndarray | None = None,
                       rgb: np.ndarray | None = None,
                       quality: float = 0.7) -> bytes:
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
                bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "jpeg").next()
    param = writer.getDefaultWriteParam()
    # javax.imageio.ImageWriteParam constants (py4j can't read static
    # fields off an instance): MODE_DEFAULT=1, MODE_EXPLICIT=2
    param.setProgressiveMode(1)
    param.setCompressionMode(2)
    param.setCompressionQuality(float(quality))
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    ios.flush()
    data = bytes(baos.toByteArray())
    writer.dispose()
    return data


def imageio_decode_luma(jvm, data: bytes) -> np.ndarray:
    bais = jvm.java.io.ByteArrayInputStream(bytearray(data))
    bi = jvm.javax.imageio.ImageIO.read(bais)
    h, w = bi.getHeight(), bi.getWidth()
    out = np.zeros((h, w))
    if bi.getColorModel().getNumComponents() == 1:
        # grayscale: read raw raster samples — getRGB() would run the
        # linear-gray -> sRGB gamma conversion and brighten everything
        raster = bi.getRaster()
        for y in range(h):
            for x in range(w):
                out[y, x] = raster.getSample(x, y, 0)
    else:
        for y in range(h):
            for x in range(w):
                argb = bi.getRGB(x, y)
                r, g, b = (argb >> 16) & 255, (argb >> 8) & 255, argb & 255
                out[y, x] = 0.299 * r + 0.587 * g + 0.114 * b
    return out / 255.0


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures")
    spark, jvm = _jvm()

    gray = make_pattern()                      # the tiny.jpg test card
    data = encode_progressive(jvm, gray=gray)
    assert data[:2] == b"\xff\xd8" and b"\xff\xc2" in data, \
        "ImageIO did not emit SOF2"
    mine = np.array(_decode_jpeg(data))
    ref = imageio_decode_luma(jvm, data)
    d = np.abs(mine - ref)
    print(f"gray: {mine.shape} scans={data.count(bytes([0xFF, 0xDA]))} "
          f"mean|d|={d.mean():.5f} p99={np.percentile(d, 99):.5f}")
    assert mine.shape == gray.shape
    assert d.mean() < 0.004 and np.percentile(d, 99) < 0.02, \
        "progressive decode disagrees with ImageIO"
    with open(os.path.join(out_dir, "tiny_prog.jpg"), "wb") as f:
        f.write(data)

    yy, xx = np.mgrid[0:40, 0:32]
    rgb = np.stack([
        np.clip(32 + xx * 6 + ((xx // 4 + yy // 4) % 2) * 64, 0, 255),
        np.clip(16 + yy * 5, 0, 255),
        np.clip(255 - xx * 7, 0, 255)], axis=-1)
    data_c = encode_progressive(jvm, rgb=rgb)
    assert b"\xff\xc2" in data_c, "ImageIO did not emit SOF2"
    mine_c = np.array(_decode_jpeg(data_c))
    ref_c = imageio_decode_luma(jvm, data_c)
    d = np.abs(mine_c - ref_c)
    print(f"color: {mine_c.shape} scans={data_c.count(bytes([0xFF, 0xDA]))} "
          f"mean|d|={d.mean():.5f} p99={np.percentile(d, 99):.5f}")
    assert mine_c.shape == (40, 32)
    # chroma contributes to ImageIO's RGB luma via rounding/clamping at
    # gamut edges; our Y-plane is pre-colorspace — allow the same slack
    # as the baseline 4:2:0 camera-JPEG test
    assert d.mean() < 0.01 and np.percentile(d, 99) < 0.04, \
        "progressive color decode disagrees with ImageIO"
    with open(os.path.join(out_dir, "tiny_prog_color.jpg"), "wb") as f:
        f.write(data_c)
    print("fixtures written to", out_dir)
    spark.stop()


if __name__ == "__main__":
    main()
