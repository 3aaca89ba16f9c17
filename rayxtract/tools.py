"""Operational utilities: re-extraction probe, retention sweep, status report.

Parity for the reference's ops surface:
  * ``reextract_url`` — the debug/repair re-extraction probe
    (reference: main.py:1177-1199, fix_extraction_bug.py:153-220): re-run
    extraction for one url against the stored input, compare with the
    written output. Idempotent by construction (pure per-row extraction).
  * ``retention_sweep`` — the hourly cleanup beat
    (reference: workers.py:347-380, utils.py:476-502) re-expressed as an
    output-directory retention policy over partition manifests.
  * ``status_report`` — the queue-status listing
    (reference: main.py:339-382, ORDER BY created_at DESC): newest-first
    crawl listing over extraction output.
"""

from __future__ import annotations

import os
import shutil
import time

from . import manifest as mf
from .ops import ExtractConfig, _extract_one
from .pipeline import list_shards

__all__ = ["reextract_url", "retention_sweep", "status_report"]


def reextract_url(
    pages_path: str, url: str, cfg: ExtractConfig | None = None
) -> dict:
    """Re-run extraction for one url from the raw input (latest crawl).

    Driver-side diagnostic (point lookup, not a pipeline stage) — the
    reference's re-extraction probe semantics. Returns the freshly
    extracted record."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    cfg = cfg or ExtractConfig()
    best = None
    for shard in list_shards(pages_path):
        t = pq.read_table(shard, columns=["url", "warc_ts", "html"])
        m = pc.equal(t["url"], url)
        hit = t.filter(m)
        for i in range(hit.num_rows):
            ts = hit["warc_ts"][i].value
            if best is None or ts > best[0]:
                best = (ts, hit["html"][i].as_py())
    if best is None:
        raise KeyError(f"url not found in input: {url}")
    ts, payload = best
    doc_type, text, spans, ocr, fail, err, _ = _extract_one(url, payload, cfg)
    return {
        "url": url,
        "warc_ts": ts,
        "doc_type": doc_type,
        "text": text,
        "spans": spans,
        "is_ocr_fallback": ocr,
        "is_parse_failure": fail,
        "error": err,
    }


def retention_sweep(out_dir: str, max_age_hours: float) -> list[int]:
    """Delete output partitions whose manifest is older than the cutoff
    (reference MAX_RECORD_AGE_HOURS semantics, utils.py:482-483). Returns
    the swept partition ids."""
    cutoff = time.time() - max_age_hours * 3600.0
    swept: list[int] = []
    for pid in sorted(mf.completed_partitions(out_dir)):
        path = os.path.join(mf.partition_dir(out_dir, pid), mf.MANIFEST_NAME)
        if os.path.getmtime(path) < cutoff:
            shutil.rmtree(mf.partition_dir(out_dir, pid), ignore_errors=True)
            swept.append(pid)
    return swept


def status_report(out_dir: str, limit: int = 50):
    """Newest-first listing over extraction output (the reference's queue
    status endpoint shape: ORDER BY created_at DESC, main.py:350-354)."""
    import ray.data

    return (
        ray.data.read_parquet(
            out_dir, columns=["url", "warc_ts", "doc_type", "n_chars", "error"]
        )
        .sort("warc_ts", descending=True)
        .limit(limit)
    )
