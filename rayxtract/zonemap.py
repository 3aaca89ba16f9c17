"""Zone maps from parquet footers: prune-at-the-read planning.

Every parquet shard's footer already carries per-row-group min/max
statistics. Folding them per shard gives a ZONE MAP (Moerkotte's "small
materialized aggregates"; the same structure behind every warehouse's
block-skipping index): the planner consults per-shard spans BEFORE
scheduling any data-page read and simply never opens shards whose
[min, max] excludes the predicate. At the 10^12-doc tier this is the
difference between a point probe costing |hit shards| reads and costing
|corpus| reads — parquet row-group pushdown only helps once a file is
already open; zone maps keep the file closed.

Consumers:
  * ``queries.q_pages_zone_maps`` — the planner input as an
    oracle-checked query (spans re-derived by scanning on the DuckDB
    side).
  * ``queries.q_pages_ts_range`` — a ts-range scan that schedules data
    reads only for intersecting shards (the synth corpus is
    crawl-ordered, so warc_ts is naturally clustered by shard — exactly
    the Common-Crawl layout).
  * ``tools.reextract_url`` — the reference's re-extraction probe
    (reference: main.py:1177-1199) skips shards whose url span excludes
    the target before the per-shard predicate scan even starts.

Footer reads are one raw Ray task per shard (a Dataset job's startup
dwarfs a footer read — same rationale as the flagship's winner pass).
"""

from __future__ import annotations

import pandas as pd

__all__ = ["shard_zone_map", "build_zone_maps", "prune"]

ZONE_COLUMNS = [
    "shard_id", "n_rows", "min_url", "max_url", "min_ts_us", "max_ts_us",
]


def shard_zone_map(path: str, sid: int) -> dict | None:
    """Fold one shard's row-group footer statistics into a zone-map row.

    Returns None for an empty shard (nothing to prune — and nothing the
    scanning oracle would see either). Raises when a shard has rows but
    no url/warc_ts statistics: the planner would silently lose
    prunability AND a scanning oracle would emit a row the engine skips
    — refuse loudly instead.
    """
    import numpy as _np
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    min_u = max_u = None
    min_t = max_t = None
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            st = c.statistics
            if st is None or not st.has_min_max:
                continue
            if c.path_in_schema == "url":
                lo, hi = st.min, st.max
                min_u = lo if min_u is None else min(min_u, lo)
                max_u = hi if max_u is None else max(max_u, hi)
            elif c.path_in_schema == "warc_ts":
                lo = _np.datetime64(st.min, "us").astype("int64")
                hi = _np.datetime64(st.max, "us").astype("int64")
                min_t = lo if min_t is None else min(min_t, lo)
                max_t = hi if max_t is None else max(max_t, hi)
    if md.num_rows == 0:
        return None
    if min_u is None or min_t is None:
        raise RuntimeError(
            f"shard {path} has {md.num_rows} rows but no url/warc_ts "
            "footer statistics; zone-map planning requires stats"
        )
    return {
        "shard_id": sid,
        "n_rows": int(md.num_rows),
        "min_url": min_u,
        "max_url": max_u,
        "min_ts_us": int(min_t),
        "max_ts_us": int(max_t),
    }


def build_zone_maps(shards: list[str]) -> pd.DataFrame:
    """Zone maps for a shard list (footer-only, zero data pages) — one
    raw Ray task per shard; shard_id = the caller's list index (absolute,
    matching ``pipeline.list_shards`` order; empty shards leave gaps
    rather than shifting later ids)."""
    import ray

    zone = ray.remote(num_cpus=1)(shard_zone_map)
    recs = [
        r
        for r in ray.get([zone.remote(p, i) for i, p in enumerate(shards)])
        if r is not None
    ]
    df = pd.DataFrame(recs, columns=ZONE_COLUMNS)
    return df.astype(
        {"shard_id": "int64", "n_rows": "int64",
         "min_ts_us": "int64", "max_ts_us": "int64"}
    )


def prune(
    zones: pd.DataFrame,
    url: str | None = None,
    ts_lo_us: int | None = None,
    ts_hi_us: int | None = None,
) -> list[int]:
    """Shard ids whose zone intersects the predicate (surviving shards).

    Conjunctive semantics: every given predicate must intersect. A shard
    absent from ``zones`` (empty) never survives — it has no rows to
    contribute. Pruning is SAFE, not exact: a surviving shard may still
    contain zero matching rows (spans overlap without containment); the
    caller's row-level filter remains mandatory.
    """
    keep = pd.Series(True, index=zones.index)
    if url is not None:
        keep &= (zones["min_url"] <= url) & (url <= zones["max_url"])
    if ts_lo_us is not None:
        keep &= zones["max_ts_us"] >= int(ts_lo_us)
    if ts_hi_us is not None:
        keep &= zones["min_ts_us"] <= int(ts_hi_us)
    return zones.loc[keep, "shard_id"].astype(int).tolist()
