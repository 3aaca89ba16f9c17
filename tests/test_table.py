"""XLSL table payload tests — reference Excel semantics (utils.py:164-206)."""

import pytest

from rayxtract.table import (
    decode_xlsl,
    encode_xlsl,
    parse_xlsl,
    table_text,
    table_text_spans,
)


def test_roundtrip():
    sheets = [
        ("Plan1", [["a", "1", None], ["", "", ""], ["x", "y", "z"]]),
        ("Data", [[None, None]]),
    ]
    data = encode_xlsl(sheets)
    assert decode_xlsl(data) == [
        ("Plan1", [["a", "1", None], ["", "", ""], ["x", "y", "z"]]),
        ("Data", [[None, None]]),
    ]


def test_reference_join_rules():
    # per sheet: "Sheet: {name}\n"; rows tab-joined (None->""); blank rows
    # skipped; "\n" between sheets; final strip
    sheets = [
        ("Plan1", [["a", "1", None], [None, None], ["x", "y"]]),
        ("Empty", [[None], ["", ""]]),
    ]
    text = table_text(sheets)
    assert text == "Sheet: Plan1\na\t1\t\nx\ty\n\nSheet: Empty"


def test_parse_matches_shared_helper():
    sheets = [("S", [["v1", "v2"], ["v3", None]])]
    assert parse_xlsl(encode_xlsl(sheets)) == table_text_spans(sheets)
    text, spans = parse_xlsl(encode_xlsl(sheets))
    # the final .strip() also eats the trailing tab of the last row
    assert text == "Sheet: S\nv1\tv2\nv3"
    assert spans[0]["kind"] == "sheet"


def test_truncation_raises():
    data = encode_xlsl([("S", [["abc"]])])
    with pytest.raises(ValueError):
        decode_xlsl(data[:-1])
    with pytest.raises(ValueError):
        decode_xlsl(b"NOPE" + data[4:])
    with pytest.raises(ValueError):
        decode_xlsl(data + b"x")
