"""Arrow schemas for the pages input table, extraction output and metrics.

Input schema follows BASELINE.json's input_hint exactly:
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.

The reference keeps all per-document state as mutable columns of one SQLite
row (reference: models.py:15-44); here every stage appends immutable Arrow
columns instead.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# pages — primary input (Common-Crawl-style). FIXTURES.md F1.
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),  # WET-style full-page text, NOT the target
        ("lang", pa.string()),
    ]
)

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("start", pa.int64()),
            ("end", pa.int64()),
            ("kind", pa.string()),
        ]
    )
)

# extracted — output of the extraction pipeline, one row per unique url.
EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("doc_type", pa.string()),  # html | pdfl | garbage
        ("text", pa.string()),  # extracted main content (byte-identical contract)
        ("spans", SPAN_TYPE),
        ("lang", pa.string()),
        ("n_chars", pa.int64()),
        ("is_ocr_fallback", pa.bool_()),  # routed through the layout/"OCR" parser
        ("is_parse_failure", pa.bool_()),
        ("error", pa.string()),  # sentinel text for failure rows (never drop rows)
        ("text_crc", pa.int64()),  # crc32 of text bytes — partition fingerprinting
        ("partition_id", pa.int64()),
    ]
)

# golden — expected extraction per unique url (pytest oracle). FIXTURES.md F3.
GOLDEN_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("golden_text", pa.string()),
        ("golden_spans", SPAN_TYPE),
        ("doc_type", pa.string()),  # expected sniffed type (oracle column)
        ("expect_ocr_fallback", pa.bool_()),
        ("expect_parse_failure", pa.bool_()),
    ]
)

DOC_TYPE_HTML = "html"
DOC_TYPE_PDFL = "pdfl"
DOC_TYPE_XLSL = "xlsl"
DOC_TYPE_DOCL = "docl"
DOC_TYPE_GARBAGE = "garbage"
