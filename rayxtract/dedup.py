"""Dedup-by-url: keep the latest crawl per url (SURVEY.md §2.6).

Common-Crawl-style tables contain recrawls; "byte-identical text per url"
presupposes one row per url, keyed by max ``warc_ts`` (tie-break: smallest
text crc, then smallest text — fully deterministic regardless of block
layout, SURVEY.md §7.4 item 1).

Scale notes:
  * Dedup runs AFTER extraction, so the all-to-all shuffle moves extracted
    text (small) instead of raw html (large) — at 100 TB the shuffled bytes
    dominate cost, and recrawl rate (~5%) makes the wasted duplicate
    extraction cheap by comparison.
  * A within-batch local combiner drops duplicates that landed in the same
    block before the shuffle (recrawls are usually adjacent in crawl order),
    shrinking the exchange further.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["dedup_keep_latest", "local_keep_latest"]


def _keep_latest_table(t: pa.Table) -> pa.Table:
    """One winner row per url within ``t`` (deterministic)."""
    if t.num_rows <= 1:
        return t
    # sort: url asc, warc_ts desc, then every remaining sortable column asc
    # — ties (equal url+ts) resolve identically regardless of block layout
    keys = [("url", "ascending"), ("warc_ts", "descending")]
    keyed = {"url", "warc_ts"}
    for name, typ in zip(t.column_names, t.schema.types):
        if name not in keyed and (
            pa.types.is_primitive(typ) or pa.types.is_string(typ)
        ):
            keys.append((name, "ascending"))
    idx = pc.sort_indices(t, sort_keys=keys)
    t = t.take(idx)
    import numpy as np

    urls = np.asarray(t["url"].to_pandas(), dtype=object)
    mask = np.empty(len(urls), dtype=bool)
    mask[0] = True
    mask[1:] = urls[1:] != urls[:-1]
    return t.filter(pa.array(mask))


def local_keep_latest(batch: pa.Table) -> pa.Table:
    """Within-block combiner — safe pre-shuffle reduction."""
    return _keep_latest_table(batch)


def _group_keep_latest(group: pa.Table) -> pa.Table:
    return _keep_latest_table(group)


def dedup_keep_latest(ds, by_partition: bool = True):
    """EXCHANGE-based dedup: local combine -> groupby shuffle -> per-group
    pick. This is the strict/general-purpose op; the flagship pipeline
    resolves recrawls WITHOUT moving payloads (pipeline.py pass A winner
    map) and does not call this.

    With ``by_partition=True`` (requires a ``partition_id`` column whose
    value is a function of url, e.g. hash(url) % P) the exchange groups by
    partition_id: all crawls of a url share its partition, so within-group
    url-dedup is globally exact, the exchange has P groups instead of
    |urls|, and output blocks align with partitions (no tiny-file fanout
    under ``partition_cols`` writes). ``by_partition=False`` groups by url
    directly — for ad-hoc tables without a partition column.
    """
    ds = ds.map_batches(local_keep_latest, batch_format="pyarrow")
    key = "partition_id" if by_partition else "url"
    return ds.groupby(key).map_groups(_group_keep_latest, batch_format="pyarrow")
