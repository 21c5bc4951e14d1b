"""PDF fixture generator (tests/fixtures/tiny.pdf): a minimal but fully
valid PDF 1.4 (catalog / pages / page / Helvetica / xref / trailer) whose
FlateDecode content stream exercises every text construct the built-in
extractor handles — Tj, TJ arrays with kerning numbers, literal-string
escapes (parens, octal, line continuation), hex strings, the ' next-line
operator, and Td line breaks. The expected extraction is declared here
(EXPECTED) and the generator refuses to write a fixture the extractor
does not reproduce EXACTLY; when a pdftotext binary is available it is
cross-checked too (word-for-word, whitespace-insensitive).

Usage: python tools/make_pdf_fixture.py [fixtures_dir]
"""

from __future__ import annotations

import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from thewhisperdb_spark.sources.multimodal import _pdf_text_builtin  # noqa: E402

CONTENT = rb"""BT
/F1 12 Tf
72 720 Td
(Hello, multimodal world!) Tj
0 -16 Td
[(Ker) 40 (ned ar) -120 (ray text.)] TJ
0 -16 Td
(Escapes: \(parens\), back\\slash, octal \101\102\103, cont\
inued.) Tj
0 -16 Td
<48657820737472696E67> Tj
(Next line via quote.) '
ET
"""

EXPECTED = ("Hello, multimodal world!\n"
            "Kerned array text.\n"
            "Escapes: (parens), back\\slash, octal ABC, continued.\n"
            "Hex string\n"
            "Next line via quote.\n")


def make_pdf() -> bytes:
    stream = zlib.compress(CONTENT)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Length " + str(len(stream)).encode() +
        b" /Filter /FlateDecode >>\nstream\n" + stream + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for k, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{k} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n"
            + str(xref_at).encode() + b"\n%%EOF\n")
    return bytes(out)


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures")
    data = make_pdf()
    got = _pdf_text_builtin(data)
    assert got == EXPECTED, f"extractor mismatch:\n{got!r}\n!=\n{EXPECTED!r}"
    # cross-check against pdftotext when installed (not in this container)
    import shutil as _sh
    import subprocess
    if _sh.which("pdftotext"):
        ref = subprocess.run(["pdftotext", "-", "-"], input=data,
                             capture_output=True, timeout=30)
        assert ref.returncode == 0, ref.stderr
        assert got.split() == ref.stdout.decode().split(), \
            "builtin extraction disagrees with pdftotext word stream"
        print("pdftotext cross-check: OK")
    with open(os.path.join(out_dir, "tiny.pdf"), "wb") as f:
        f.write(data)
    print("fixture written:", os.path.join(out_dir, "tiny.pdf"),
          f"({len(data)} bytes)")


if __name__ == "__main__":
    main()
