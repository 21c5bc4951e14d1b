"""GIF fixture generator (tests/fixtures/tiny.gif, tiny_inter.gif) —
encoded by Java ImageIO (an INDEPENDENT, real encoder), so the committed
fixtures pin our LZW decoder against bytes we did not produce ourselves.

- tiny.gif: the SAME 20x24 gradient-x-checker test card as tiny.jpg
  (tools/make_jpeg_fixture.make_pattern), grayscale, non-interlaced.
- tiny_inter.gif: a 33x29 indexed-color card written with
  ``ImageWriteParam.setProgressiveMode(MODE_DEFAULT)`` — for GIF that is
  the 4-pass ROW INTERLACE (odd dimensions so every pass length is
  non-trivial).

GIF is lossless, so the generator's validation gate is EXACT: each
fixture's ``_decode_gif`` raster must equal ImageIO's own decode of the
same bytes (palette RGB averaged) to 1e-12.

Usage: python tools/make_gif_fixture.py [fixtures_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_jpeg_fixture import make_pattern  # noqa: E402

from thewhisperdb_spark.sources.multimodal import _decode_gif  # noqa: E402


def _jvm():
    from thewhisperdb_spark.session import get_spark

    spark = get_spark("make_gif_fixture", cpus=2)
    return spark, spark._jvm


def encode_gif(jvm, gray: np.ndarray | None = None,
               indexed_rgb: np.ndarray | None = None,
               interlace: bool = False) -> bytes:
    BI = jvm.java.awt.image.BufferedImage
    if gray is not None:
        h, w = gray.shape
        bi = BI(w, h, BI.TYPE_BYTE_GRAY)
        raster = bi.getRaster()
        for y in range(h):
            for x in range(w):
                raster.setSample(x, y, 0, int(gray[y, x]))
    else:
        h, w, _ = indexed_rgb.shape
        # TYPE_BYTE_INDEXED: the default 6x6x6 cube + grays palette; the
        # card below uses only exact cube colors, so indexing is lossless
        bi = BI(w, h, BI.TYPE_BYTE_INDEXED)
        for y in range(h):
            for x in range(w):
                r, g, b = (int(v) for v in indexed_rgb[y, x])
                argb = (255 << 24) | (r << 16) | (g << 8) | b
                bi.setRGB(x, y, argb - (1 << 32))  # Java int is signed
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "gif").next()
    param = writer.getDefaultWriteParam()
    # ImageWriteParam constants (py4j can't read static fields off an
    # instance): MODE_DISABLED=0, MODE_DEFAULT=1 — for GIF, progressive
    # mode = the 4-pass row interlace
    param.setProgressiveMode(1 if interlace else 0)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    ios.flush()
    data = bytes(baos.toByteArray())
    writer.dispose()
    return data


def imageio_decode_mean_rgb(jvm, data: bytes) -> np.ndarray:
    """ImageIO decode -> (r+g+b)/3 in [0,1] — the repo decoders' grayscale
    convention (NOT 601 luma)."""
    bais = jvm.java.io.ByteArrayInputStream(bytearray(data))
    bi = jvm.javax.imageio.ImageIO.read(bais)
    h, w = bi.getHeight(), bi.getWidth()
    out = np.zeros((h, w))
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

    gray = make_pattern()                      # the tiny.jpg test card
    data = encode_gif(jvm, gray=gray)
    assert data[:6] in (b"GIF87a", b"GIF89a")
    mine = np.array(_decode_gif(data))
    ref = imageio_decode_mean_rgb(jvm, data)
    assert mine.shape == gray.shape == ref.shape
    d = np.abs(mine - ref)
    print(f"gray: {mine.shape} interlaced={bool(data[10] and False)} "
          f"max|d|={d.max():.2e}")
    assert d.max() < 1e-12, "GIF decode must be EXACT vs ImageIO"
    with open(os.path.join(out_dir, "tiny.gif"), "wb") as f:
        f.write(data)

    # 33x29 (odd dims: interlace passes 8/8/4/2 all non-trivial), colors
    # drawn from the 6x6x6 cube (multiples of 51) so indexing is lossless
    yy, xx = np.mgrid[0:29, 0:33]
    rgb = np.stack([(xx % 6) * 51, (yy % 6) * 51,
                    ((xx // 4 + yy // 4) % 6) * 51], axis=-1)
    data_i = encode_gif(jvm, indexed_rgb=rgb, interlace=True)
    # image descriptor packed byte: find the 0x2C block and check bit 6
    mine_i = np.array(_decode_gif(data_i))
    ref_i = imageio_decode_mean_rgb(jvm, data_i)
    assert mine_i.shape == (29, 33) == ref_i.shape
    d = np.abs(mine_i - ref_i)
    print(f"indexed: {mine_i.shape} max|d|={d.max():.2e}")
    assert d.max() < 1e-12, "interlaced GIF decode must be EXACT vs ImageIO"
    # the interlaced bytes must NOT equal a straight re-read: prove the
    # interlace flag is actually set in the committed fixture
    data_n = encode_gif(jvm, indexed_rgb=rgb, interlace=False)
    assert data_i != data_n, "progressive mode produced identical bytes"
    assert np.abs(np.array(_decode_gif(data_n)) - ref_i).max() < 1e-12
    with open(os.path.join(out_dir, "tiny_inter.gif"), "wb") as f:
        f.write(data_i)
    print("fixtures written to", out_dir)
    spark.stop()


if __name__ == "__main__":
    main()
