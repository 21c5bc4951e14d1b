"""Deterministic MJPEG-in-AVI fixture generator (tests/fixtures/tiny.avi).

Thin wrapper over the package encoders (sources/jpegenc.py:
encode_gray_baseline + encode_mjpeg_avi) so the committed fixture bytes
stay generator-gated: a spec-complete AVI RIFF form (LIST hdrl {avih,
LIST strl {strh 'vids'/'MJPG', strf}}, LIST movi with one 00dc chunk per
frame — the third inside a 'rec ' grouping list, exercising the
recursive walk — and an idx1 index) wrapping three baseline JPEGs from
the repo's own T.81 Annex-K encoder.

Usage: python tools/make_avi_fixture.py [out_path]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from thewhisperdb_spark.sources.jpegenc import (  # noqa: E402
    encode_gray_baseline,
    encode_mjpeg_avi,
    make_pattern,
)

USEC_PER_FRAME = 40_000          # 25 fps
W, H = 24, 20


def make_frames() -> list[bytes]:
    base = make_pattern(H, W)
    shifted = np.roll(base, 5, axis=1)            # frame 1: shifted copy
    inverted = 255.0 - base                        # frame 2: inverted
    return [encode_gray_baseline(f.astype(np.float64))
            for f in (base, shifted, inverted)]


def make_avi(frames: list[bytes]) -> bytes:
    return encode_mjpeg_avi(frames, usec_per_frame=USEC_PER_FRAME,
                            width=W, height=H)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/tiny.avi"
    frames = make_frames()
    data = make_avi(frames)
    with open(out, "wb") as f:
        f.write(data)
    # self-check: decode what we wrote, compare to the source rasters
    from thewhisperdb_spark.sources.multimodal import decode_avi_frames

    decoded = decode_avi_frames(data, max_frames=8)
    assert [i for i, _, _ in decoded] == [0, 1, 2]
    assert [ms for _, ms, _ in decoded] == [0, 40, 80]
    worst = 0.0
    for (_, _, raster), src in zip(decoded, (make_pattern(H, W),
                                             np.roll(make_pattern(H, W), 5,
                                                     axis=1),
                                             255.0 - make_pattern(H, W))):
        err = np.abs(np.array(raster) * 255.0 - src)
        worst = max(worst, float(err.max()))
    print(f"wrote {out}: {len(data)} bytes, {len(frames)} frames, "
          f"max abs err {worst:.2f}/255")


if __name__ == "__main__":
    main()
