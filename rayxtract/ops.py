"""Stateless/stateful batch operators for the extraction pipeline.

Maps the reference's per-document task chain (validate -> detect type ->
extract -> sentinel-on-failure, reference: main.py:240-269, utils.py:208-233,
workers.py:39-143) onto Ray Data ``map_batches`` stages over zero-copy Arrow.

``ExtractBatch`` is the pipeline's workhorse: a callable class run as an
actor pool (state — compiled regexes, decode tables, config — built once per
actor in ``__init__``, reference analogue: the warm Ollama/Tesseract services,
supervisord.conf:27-36), dispatching per row on sniffed payload type the way
the reference dispatches on file extension (utils.py:208-233).
"""

from __future__ import annotations

import zlib
from struct import error as struct_error

import pyarrow as pa

from .dom import DomConfig, extract_main_content
from .layout import PDFL_MAGIC, parse_pdfl
from .schema import (
    DOC_TYPE_GARBAGE,
    DOC_TYPE_HTML,
    DOC_TYPE_PDFL,
    EXTRACTED_SCHEMA,
    SPAN_TYPE,
)
from .synth import sentinel_error

__all__ = [
    "ExtractBatch",
    "ExtractConfig",
    "detect_type",
    "partition_of",
    "add_partition_id",
]


def detect_type(payload: bytes) -> str:
    """Sniff payload type from magic bytes (the reference detects by file
    extension, main.py:269; content sniffing is the columnar equivalent)."""
    if payload[:4] == PDFL_MAGIC:
        return DOC_TYPE_PDFL
    head = payload[:256].lstrip()
    if head[:1] == b"<":
        return DOC_TYPE_HTML
    return DOC_TYPE_GARBAGE


def partition_of(url: str, n_partitions: int) -> int:
    """Stable hash(url) -> partition id. crc32, never Python hash() —
    must agree across processes and runs (checkpoint identity)."""
    return zlib.crc32(url.encode("utf-8")) % n_partitions


class ExtractConfig:
    """Pipeline knobs (the reference's env-config analogue, utils.py:19-23)."""

    __slots__ = (
        "n_partitions",
        "max_bytes",
        "batch_size",
        "concurrency",
        "dom",
    )

    def __init__(
        self,
        n_partitions: int = 64,
        max_bytes: int = 50 * 1024 * 1024,  # reference MAX_FILE_SIZE, utils.py:23
        batch_size: int = 128,
        concurrency: tuple[int, int] | int = (2, 16),
        dom: DomConfig | None = None,
    ) -> None:
        self.n_partitions = n_partitions
        self.max_bytes = max_bytes
        self.batch_size = batch_size
        self.concurrency = concurrency
        self.dom = dom or DomConfig()


def add_partition_id(batch: pa.Table, n_partitions: int) -> pa.Table:
    """Cheap first stage: partition_id from url (resume filtering runs on
    this before any heavy work)."""
    pids = pa.array(
        [partition_of(u, n_partitions) for u in batch["url"].to_pylist()],
        type=pa.int64(),
    )
    return batch.append_column("partition_id", pids)


class ExtractBatch:
    """Actor-pool extraction stage: DOM strip / PDFL layout parse / sentinel.

    Usage::

        ds.map_batches(ExtractBatch, fn_constructor_kwargs={"cfg": cfg},
                       batch_format="pyarrow", batch_size=cfg.batch_size,
                       concurrency=cfg.concurrency)

    Per-row try/except keeps poison documents as sentinel rows instead of
    failing the whole block (reference rows go to status=ERROR with an
    error_message, workers.py:126-134 — never dropped).
    """

    def __init__(self, cfg: ExtractConfig | None = None) -> None:
        self.cfg = cfg or ExtractConfig()

    def _extract_one(self, url: str, payload: bytes) -> tuple[str, str, list, bool, bool, str]:
        """(doc_type, text, spans, is_ocr, is_fail, error)"""
        if payload is None or len(payload) > self.cfg.max_bytes:
            return (
                DOC_TYPE_GARBAGE,
                sentinel_error(url),
                [],
                False,
                True,
                "payload missing or exceeds max_bytes",
            )
        doc_type = detect_type(payload)
        try:
            if doc_type == DOC_TYPE_PDFL:
                text, spans = parse_pdfl(payload)
                return doc_type, text, spans, True, False, ""
            if doc_type == DOC_TYPE_HTML:
                text, spans = extract_main_content(
                    payload.decode("utf-8"), self.cfg.dom
                )
                if not text:
                    # reference's empty-extraction sentinel, workers.py:70-75
                    return doc_type, sentinel_error(url), [], False, False, "empty extraction"
                return doc_type, text, spans, False, False, ""
            raise ValueError("unrecognized payload")
        except (ValueError, UnicodeDecodeError, struct_error) as e:
            return DOC_TYPE_GARBAGE, sentinel_error(url), [], False, True, str(e)[:200]

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        payloads = batch["html"].to_pylist()
        langs = (
            batch["lang"].to_pylist() if "lang" in batch.column_names else [""] * len(urls)
        )
        if "partition_id" in batch.column_names:
            pids = batch["partition_id"].to_pylist()
        else:
            pids = [partition_of(u, self.cfg.n_partitions) for u in urls]

        doc_types, texts, spans_col, ocr, fail, errs, crcs = [], [], [], [], [], [], []
        for url, payload in zip(urls, payloads):
            dt, text, spans, is_ocr, is_fail, err = self._extract_one(url, payload)
            doc_types.append(dt)
            texts.append(text)
            spans_col.append(spans)
            ocr.append(is_ocr)
            fail.append(is_fail)
            errs.append(err)
            crcs.append(zlib.crc32(text.encode("utf-8")))

        n_chars = [len(t) for t in texts]
        return pa.Table.from_arrays(
            [
                pa.array(urls, type=pa.string()),
                batch["warc_ts"].combine_chunks()
                if isinstance(batch["warc_ts"], pa.ChunkedArray)
                else batch["warc_ts"],
                pa.array(doc_types, type=pa.string()),
                pa.array(texts, type=pa.string()),
                pa.array(spans_col, type=SPAN_TYPE),
                pa.array(langs, type=pa.string()),
                pa.array(n_chars, type=pa.int64()),
                pa.array(ocr, type=pa.bool_()),
                pa.array(fail, type=pa.bool_()),
                pa.array(errs, type=pa.string()),
                pa.array(crcs, type=pa.int64()),
                pa.array(pids, type=pa.int64()),
            ],
            schema=EXTRACTED_SCHEMA,
        )
