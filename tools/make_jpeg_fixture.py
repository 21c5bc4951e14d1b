"""Deterministic baseline-JPEG fixture generator (tests/fixtures/tiny.jpg).

A minimal GRAYSCALE baseline encoder (ITU-T T.81 Annex K quant + huffman
tables, restart interval 2 to exercise the decoder's RST path, 20x24 px so
MCU cropping is non-trivial). Stdlib + numpy only — the same constraint the
decoder honors. The 4:2:0 color-interleave decode path is validated against
real camera JPEGs (Java ImageIO cross-check, tests/test_multimodal_llm_jobs
gated on the Spark distribution's sample images); this fixture pins the
committed end-to-end pipeline bytes.

Usage: python tools/make_jpeg_fixture.py [out_path]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# encoder core lives in the package now (sources/jpegenc.py) so synthesis
# can run executor-side; this tool stays the committed-fixture gate
from thewhisperdb_spark.sources.jpegenc import (  # noqa: E402,F401
    encode_gray_baseline,
    make_pattern,
)

def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/tiny.jpg"
    img = make_pattern()
    data = encode_gray_baseline(img)
    with open(out, "wb") as f:
        f.write(data)
    # self-check: decode what we wrote and compare
    from thewhisperdb_spark.sources.multimodal import _decode_jpeg
    dec = np.array(_decode_jpeg(data)) * 255.0
    err = np.abs(dec - img)
    print(f"wrote {out}: {len(data)} bytes, {img.shape[1]}x{img.shape[0]}, "
          f"mean abs err {err.mean():.2f}/255 max {err.max():.2f}")


if __name__ == "__main__":
    main()
