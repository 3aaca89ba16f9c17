"""WARC ingest: Common-Crawl's container format -> the engine's pages table.

The engine's native input is a Parquet pages table (url, warc_ts, html,
text, lang — schema.PAGES_SCHEMA / BASELINE input_hint), but the upstream
artifact those tables are built FROM is WARC (ISO 28500): the crawl archive
format Common Crawl publishes. ``read_warc`` closes that gap as a Ray Data
source: binary-file read -> per-file record parse in ``map_batches``
(embarrassingly parallel — one WARC shard per task, the same partitioning
CC itself uses) -> PAGES_SCHEMA rows (text/lang empty — the WET/CLD stages
that fill them are downstream of raw-WARC ingest) ready for the extraction
pipeline or a one-time ``write_parquet`` conversion.

Parser scope (documented, deliberately minimal): WARC/1.0-1.1 'response'
records with an HTTP payload; gzip members are handled transparently
(both whole-file gzip and the per-record-member form CC uses — zlib
decompresses concatenated members in one pass); WARC/1.1 fractional-second
dates accepted. Malformed records — damaged Content-Length, unparseable
WARC-Date — are SKIPPED via boundary resync, never fatal: one corrupted
record in a 10^4-record shard must not drop the shard. Truncated trailing
records are likewise dropped, matching the resumable-ingest posture of the
rest of the engine.
"""

from __future__ import annotations

import gzip
import zlib
from datetime import datetime, timezone

import pandas as pd
import pyarrow as pa

__all__ = ["parse_warc_records", "read_warc", "warc_bytes"]

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(buf: bytes) -> bytes:
    """Decompress ALL concatenated gzip members (CC writes one member per
    record; a plain single-member file is the degenerate case)."""
    out = []
    while buf:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(buf))
        out.append(d.flush())
        buf = d.unused_data
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # [0] is the version / status line
        k, sep, v = line.partition(b":")
        if sep:
            # WARC headers are UTF-8 (ISO 28500 §4); replace (not raise) on
            # invalid bytes — a mojibake url beats a dead shard task
            headers[k.strip().decode("utf-8", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
    return headers


def _warc_ts_us(warc_date: str) -> int:
    """WARC-Date -> epoch microseconds. Accepts both the WARC/1.0 whole-
    second form and WARC/1.1 fractional seconds. Raises ValueError on
    anything else (caller skips the record)."""
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            dt = datetime.strptime(warc_date, fmt).replace(tzinfo=timezone.utc)
        except ValueError:
            continue
        # exact integer epoch math — float .timestamp() has ~0.5 us error
        # at current-epoch magnitudes
        delta = dt - datetime(1970, 1, 1, tzinfo=timezone.utc)
        return (
            delta.days * 86_400_000_000
            + delta.seconds * 1_000_000
            + delta.microseconds
        )
    raise ValueError(f"unparseable WARC-Date: {warc_date!r}")


def _resync(buf: bytes, pos: int) -> int:
    """Next record boundary at/after ``pos`` (or len(buf) when none):
    tolerates leading garbage and records with damaged headers."""
    nxt = buf.find(b"\r\n\r\nWARC/", pos)
    return len(buf) if nxt == -1 else nxt + 4


def parse_warc_records(buf: bytes) -> list[dict]:
    """Parse one WARC file's bytes into [{url, warc_ts_us, html}] rows
    (response records only). Pure function — unit-tested directly.
    Malformed records skip forward to the next boundary; only a truncated
    TRAILING record ends the scan early."""
    if buf[:2] == b"\x1f\x8b":
        buf = _gunzip_members(buf)
    rows: list[dict] = []
    pos = 0
    n = len(buf)
    while pos < n:
        if not buf.startswith(b"WARC/", pos):
            pos = _resync(buf, pos)
            continue
        hdr_end = buf.find(_CRLF2, pos)
        if hdr_end == -1:
            break
        headers = _parse_headers(buf[pos:hdr_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            # damaged header: skip THIS record only, resync on the next
            # boundary (a single corrupt record must not drop the shard)
            pos = _resync(buf, pos + 5)
            continue
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end > n:  # truncated trailing record
            break
        if headers.get("warc-type") == "response":
            try:
                ts_us = _warc_ts_us(
                    headers.get("warc-date", "1970-01-01T00:00:00Z")
                )
            except ValueError:
                pos = body_end + 4
                continue
            payload = buf[body_start:body_end]
            # HTTP payload: strip the response head; a payload without an
            # HTTP head (identity payloads) is taken whole
            if payload[:5] == b"HTTP/":
                http_end = payload.find(_CRLF2)
                body = payload[http_end + 4 :] if http_end != -1 else b""
            else:
                body = payload
            url = headers.get("warc-target-uri", "")
            rows.append({"url": url, "warc_ts_us": ts_us, "html": body})
        pos = body_end + 4  # records terminate with \r\n\r\n
    return rows


def read_warc(paths):
    """Ray Data source over WARC shard files, emitting PAGES_SCHEMA rows
    (url, warc_ts: timestamp[us], html, text='', lang='') — directly
    consumable by ``pipeline.run_extraction`` after a ``write_parquet``
    (integration-tested end-to-end in tests/test_warc.py).

    One shard parses per task (``read_binary_files`` yields one row per
    file; the parse fans out in map_batches with batch_size=1 so a giant
    shard never shares a task's heap with its peers).
    """
    import ray.data

    ds = ray.data.read_binary_files(paths)

    def parse(batch: pd.DataFrame) -> pa.Table:
        rows: list[dict] = []
        for buf in batch["bytes"]:
            rows.extend(parse_warc_records(bytes(buf)))
        return pa.table(
            {
                "url": pa.array([r["url"] for r in rows], type=pa.string()),
                "warc_ts": pa.array(
                    [r["warc_ts_us"] for r in rows], type=pa.timestamp("us")
                ),
                "html": pa.array([r["html"] for r in rows], type=pa.binary()),
                "text": pa.array([""] * len(rows), type=pa.string()),
                "lang": pa.array([""] * len(rows), type=pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pandas", batch_size=1)


def warc_bytes(records: list[dict], gzip_members: bool = False) -> bytes:
    """Serialize [{url, warc_ts_us, html}] to WARC/1.0/1.1 response records
    — the test/synth twin of :func:`parse_warc_records` (round-trip gated,
    including sub-second timestamps via the WARC/1.1 fractional form)."""
    out = []
    for r in records:
        secs, us = divmod(int(r["warc_ts_us"]), 1_000_000)
        dt = datetime.fromtimestamp(secs, tz=timezone.utc).replace(
            microsecond=us
        )
        if us:
            date = dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ")
        else:
            date = dt.strftime("%Y-%m-%dT%H:%M:%SZ")
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + r["html"]
        )
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {date}\r\n"
            f"Content-Length: {len(http)}\r\n"
        ).encode()
        rec = head + b"\r\n" + http + b"\r\n\r\n"
        out.append(gzip.compress(rec) if gzip_members else rec)
    return b"".join(out)
