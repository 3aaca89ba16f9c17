"""XLSL — synthetic spreadsheet binary + table-text extractor (M8).

Carries the reference's Excel extraction semantics byte-exactly
(reference: utils.py:164-206): per sheet emit ``"Sheet: {name}\n"``, then
each row as a tab-join of ``str(cell)`` (``None`` -> ``""``), keeping only
rows whose joined text is non-blank (``row_text.strip()``), a ``"\n"``
after each sheet, and a final ``.strip()``.

Wire format (little-endian):

    b"XLSL" | uint16 n_sheets
    per sheet: uint16 name_len | name utf-8 | uint16 n_rows
    per row:   uint16 n_cells
    per cell:  uint16 flag_len  (0xFFFF = None cell; else byte length)
               | utf-8 bytes
"""

from __future__ import annotations

import struct

__all__ = [
    "XLSL_MAGIC",
    "encode_xlsl",
    "decode_xlsl",
    "table_text",
    "table_text_spans",
    "parse_xlsl",
]

XLSL_MAGIC = b"XLSL"
_U16 = struct.Struct("<H")
_NONE_CELL = 0xFFFF

Sheet = tuple[str, list[list[object]]]  # (name, rows of cells; cell: str|None)


def encode_xlsl(sheets: list[Sheet]) -> bytes:
    out = [XLSL_MAGIC, _U16.pack(len(sheets))]
    for name, rows in sheets:
        nb = name.encode("utf-8")
        out.append(_U16.pack(len(nb)))
        out.append(nb)
        out.append(_U16.pack(len(rows)))
        for row in rows:
            out.append(_U16.pack(len(row)))
            for cell in row:
                if cell is None:
                    out.append(_U16.pack(_NONE_CELL))
                else:
                    b = str(cell).encode("utf-8")
                    if len(b) >= _NONE_CELL:
                        raise ValueError("cell too large for XLSL")
                    out.append(_U16.pack(len(b)))
                    out.append(b)
    return b"".join(out)


def decode_xlsl(data: bytes) -> list[Sheet]:
    if len(data) < 6 or data[:4] != XLSL_MAGIC:
        raise ValueError("not an XLSL payload")
    pos = 4
    (n_sheets,) = _U16.unpack_from(data, pos)
    pos += 2
    sheets: list[Sheet] = []
    for _ in range(n_sheets):
        if pos + 2 > len(data):
            raise ValueError("truncated XLSL sheet header")
        (name_len,) = _U16.unpack_from(data, pos)
        pos += 2
        if pos + name_len + 2 > len(data):
            raise ValueError("truncated XLSL sheet name")
        name = data[pos : pos + name_len].decode("utf-8")
        pos += name_len
        (n_rows,) = _U16.unpack_from(data, pos)
        pos += 2
        rows: list[list[object]] = []
        for _ in range(n_rows):
            if pos + 2 > len(data):
                raise ValueError("truncated XLSL row header")
            (n_cells,) = _U16.unpack_from(data, pos)
            pos += 2
            row: list[object] = []
            for _ in range(n_cells):
                if pos + 2 > len(data):
                    raise ValueError("truncated XLSL cell header")
                (clen,) = _U16.unpack_from(data, pos)
                pos += 2
                if clen == _NONE_CELL:
                    row.append(None)
                    continue
                if pos + clen > len(data):
                    raise ValueError("truncated XLSL cell payload")
                row.append(data[pos : pos + clen].decode("utf-8"))
                pos += clen
            rows.append(row)
        sheets.append((name, rows))
    if pos != len(data):
        raise ValueError("trailing bytes after XLSL payload")
    return sheets


def table_text(sheets: list[Sheet]) -> str:
    """The reference's Excel text rule, byte-exact (utils.py:185-201)."""
    text = ""
    for name, rows in sheets:
        text += f"Sheet: {name}\n"
        for row in rows:
            row_text = "\t".join(
                str(cell) if cell is not None else "" for cell in row
            )
            if row_text.strip():
                text += row_text + "\n"
        text += "\n"
    return text.strip()


def table_text_spans(sheets: list[Sheet]) -> tuple[str, list[dict]]:
    """Text (reference rule) + per-sheet char spans."""
    text = table_text(sheets)
    # sheet spans computed against the UNSTRIPPED layout, then clamped
    spans: list[dict] = []
    pos = 0
    for name, rows in sheets:
        chunk = f"Sheet: {name}\n"
        for row in rows:
            row_text = "\t".join(
                str(cell) if cell is not None else "" for cell in row
            )
            if row_text.strip():
                chunk += row_text + "\n"
        start = pos
        end = pos + len(chunk)
        pos = end + 1  # the inter-sheet "\n"
        spans.append(
            {
                "start": min(start, len(text)),
                "end": min(end, len(text)),
                "kind": "sheet",
            }
        )
    return text, spans


def parse_xlsl(data: bytes) -> tuple[str, list[dict]]:
    """Decode + extract; ValueError propagates for sentinel handling."""
    return table_text_spans(decode_xlsl(data))
