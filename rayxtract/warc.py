"""WARC ingest: Common-Crawl's container format -> the engine's pages table.

The engine's native input is a Parquet pages table (url, warc_ts, html —
BASELINE input_hint), but the upstream artifact those tables are built FROM
is WARC (ISO 28500): the crawl archive format Common Crawl publishes.
``read_warc`` closes that gap as a Ray Data source: binary-file read ->
per-file record parse in ``map_batches`` (embarrassingly parallel — one
WARC shard per task, the same partitioning CC itself uses) -> (url,
warc_ts, html) rows ready for the extraction pipeline or a one-time
``write_parquet`` conversion.

Parser scope (documented, deliberately minimal): WARC/1.0-1.1 'response'
records with an HTTP payload; gzip members are handled transparently
(both whole-file gzip and the per-record-member form CC uses — zlib
decompresses concatenated members in one pass). Non-response records
(warcinfo, request, metadata) are skipped. Truncated trailing records are
dropped, not errored — a partial shard download should yield its complete
prefix, matching the resumable-ingest posture of the rest of the engine.
"""

from __future__ import annotations

import gzip
import zlib
from datetime import datetime, timezone

import pandas as pd

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
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
    return headers


def _warc_ts_us(warc_date: str) -> int:
    """WARC-Date (ISO 8601 Zulu) -> epoch microseconds."""
    dt = datetime.strptime(warc_date, "%Y-%m-%dT%H:%M:%SZ").replace(
        tzinfo=timezone.utc
    )
    return int(dt.timestamp() * 1_000_000)


def parse_warc_records(buf: bytes) -> list[dict]:
    """Parse one WARC file's bytes into [{url, warc_ts_us, html}] rows
    (response records only). Pure function — unit-tested directly."""
    if buf[:2] == b"\x1f\x8b":
        buf = _gunzip_members(buf)
    rows: list[dict] = []
    pos = 0
    n = len(buf)
    while pos < n:
        if not buf.startswith(b"WARC/", pos):
            # resync: skip to the next record boundary (tolerates leading
            # garbage / truncated previous record)
            nxt = buf.find(b"\r\n\r\nWARC/", pos)
            if nxt == -1:
                break
            pos = nxt + 4
            continue
        hdr_end = buf.find(_CRLF2, pos)
        if hdr_end == -1:
            break
        headers = _parse_headers(buf[pos:hdr_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            break
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end > n:  # truncated trailing record
            break
        if headers.get("warc-type") == "response":
            payload = buf[body_start:body_end]
            # HTTP payload: strip the response head; a payload without an
            # HTTP head (identity payloads) is taken whole
            if payload[:5] == b"HTTP/":
                http_end = payload.find(_CRLF2)
                body = payload[http_end + 4 :] if http_end != -1 else b""
            else:
                body = payload
            url = headers.get("warc-target-uri", "")
            date = headers.get("warc-date", "1970-01-01T00:00:00Z")
            rows.append(
                {"url": url, "warc_ts_us": _warc_ts_us(date), "html": body}
            )
        pos = body_end + 4  # records terminate with \r\n\r\n
    return rows


def read_warc(paths):
    """Ray Data source over WARC shard files: (url, warc_ts_us, html) rows.

    One shard parses per task (``read_binary_files`` yields one row per
    file; the parse fans out in map_batches with batch_size=1 so a giant
    shard never shares a task's heap with its peers). Feed the result to
    the extraction pipeline directly or ``write_parquet`` it once into the
    engine's native pages layout.
    """
    import ray.data

    ds = ray.data.read_binary_files(paths)

    def parse(batch: pd.DataFrame) -> pd.DataFrame:
        rows: list[dict] = []
        for buf in batch["bytes"]:
            rows.extend(parse_warc_records(bytes(buf)))
        return pd.DataFrame(
            {
                "url": pd.Series([r["url"] for r in rows], dtype="object"),
                "warc_ts_us": pd.Series(
                    [r["warc_ts_us"] for r in rows], dtype="int64"
                ),
                "html": pd.Series([r["html"] for r in rows], dtype="object"),
            }
        )

    return ds.map_batches(parse, batch_format="pandas", batch_size=1)


def warc_bytes(records: list[dict], gzip_members: bool = False) -> bytes:
    """Serialize [{url, warc_ts_us, html}] to WARC/1.0 response records —
    the test/synth twin of :func:`parse_warc_records` (round-trip gated)."""
    out = []
    for r in records:
        dt = datetime.fromtimestamp(
            r["warc_ts_us"] / 1_000_000, tz=timezone.utc
        )
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + r["html"]
        )
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {dt.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            f"Content-Length: {len(http)}\r\n"
        ).encode()
        rec = head + b"\r\n" + http + b"\r\n\r\n"
        out.append(gzip.compress(rec) if gzip_members else rec)
    return b"".join(out)
