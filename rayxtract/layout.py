"""PDFL — deterministic page-description binary format + layout parser.

The reference's PDF path renders each page and OCRs it, accumulating
``page_text + "\n"`` with a final ``.strip()`` (reference: utils.py:73-128,
join at utils.py:110, strip at utils.py:122). This sandbox has no
Tesseract/PyMuPDF, so the stateful "OCR/layout-parse" stage consumes a
from-scratch positioned-text-run format instead (FIXTURES.md F2); the
reading-order reconstruction and join/strip conventions are the semantics
under test.

Wire format (little-endian):

    b"PDFL" | uint16 n_pages
    per page:  uint16 n_runs
    per run:   uint16 x | uint16 y | uint16 byte_len | utf-8 bytes

Reading order: within a page, runs sorted by (y, x); runs joined with a
single space; pages joined with "\n"; final strip.
"""

from __future__ import annotations

import struct

__all__ = ["PDFL_MAGIC", "encode_pdfl", "decode_pdfl", "layout_text", "parse_pdfl"]

PDFL_MAGIC = b"PDFL"
_U16 = struct.Struct("<H")


def encode_pdfl(pages: list[list[tuple[int, int, str]]]) -> bytes:
    """Encode pages of (x, y, run_text) into PDFL bytes (used by synth)."""
    out = [PDFL_MAGIC, _U16.pack(len(pages))]
    for runs in pages:
        out.append(_U16.pack(len(runs)))
        for x, y, run in runs:
            b = run.encode("utf-8")
            out.append(_U16.pack(x))
            out.append(_U16.pack(y))
            out.append(_U16.pack(len(b)))
            out.append(b)
    return b"".join(out)


def decode_pdfl(data: bytes) -> list[list[tuple[int, int, str]]]:
    """Decode PDFL bytes; raises ValueError on any malformation."""
    if len(data) < 6 or data[:4] != PDFL_MAGIC:
        raise ValueError("not a PDFL payload")
    pos = 4
    (n_pages,) = _U16.unpack_from(data, pos)
    pos += 2
    pages: list[list[tuple[int, int, str]]] = []
    for _ in range(n_pages):
        if pos + 2 > len(data):
            raise ValueError("truncated PDFL page header")
        (n_runs,) = _U16.unpack_from(data, pos)
        pos += 2
        runs: list[tuple[int, int, str]] = []
        for _ in range(n_runs):
            if pos + 6 > len(data):
                raise ValueError("truncated PDFL run header")
            x, y, blen = struct.unpack_from("<HHH", data, pos)
            pos += 6
            if pos + blen > len(data):
                raise ValueError("truncated PDFL run payload")
            runs.append((x, y, data[pos : pos + blen].decode("utf-8")))
            pos += blen
        pages.append(runs)
    if pos != len(data):
        raise ValueError("trailing bytes after PDFL payload")
    return pages


def layout_text(pages: list[list[tuple[int, int, str]]]) -> tuple[str, list[dict]]:
    """Reading-order text + per-page spans from decoded runs.

    Per page: sort runs by (y, x), join with " "; pages joined with "\n";
    final strip — the reference's page-join/strip convention
    (reference: utils.py:110,122).
    """
    page_texts = [
        " ".join(run for _, _, run in sorted(runs, key=lambda r: (r[1], r[0])))
        for runs in pages
    ]
    full = "\n".join(page_texts)
    text = full.strip()
    # spans are computed on the unstripped join, then shifted/clamped so
    # empty leading/trailing pages (n_runs=0) can't misalign offsets
    lead = len(full) - len(full.lstrip())
    spans: list[dict] = []
    pos = 0
    for pt in page_texts:
        start = max(0, min(pos - lead, len(text)))
        end = max(0, min(pos + len(pt) - lead, len(text)))
        spans.append({"start": start, "end": end, "kind": "page"})
        pos += len(pt) + 1
    return text, spans


def parse_pdfl(data: bytes) -> tuple[str, list[dict]]:
    """Decode + reconstruct; ValueError propagates for sentinel handling."""
    return layout_text(decode_pdfl(data))
