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


def decontaminate(
    ds,
    eval_ds,
    text_col: str = "text",
    eval_text_col: str = "text",
    broadcast_limit: int = 5_000_000,
):
    """Remove training rows whose EXACT text appears in a held-out /
    benchmark set — the decontamination step every serious training-data
    pipeline runs before a model ever sees the corpus (Dolma/RedPajama
    pattern; the reference has no notion of eval splits at all).

    Shape: md5 the eval side down to a fingerprint set. Below
    ``broadcast_limit`` fingerprints the set ships once via ``ray.put``
    and the training stream filters against it per batch (zero shuffle —
    eval sets are orders of magnitude smaller than the corpus, this is
    the path you run at any scale). Past the limit, fall back to a
    hash-bucketed anti-join on the fingerprint (both sides shuffle only
    (fp, id) — never text).
    """
    import hashlib

    import numpy as np
    import pandas as pd
    import ray

    def fp_batch(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "fp": [
                    hashlib.md5(t.encode("utf-8")).hexdigest()
                    for t in batch[eval_text_col]
                ]
            }
        )

    fps = set()
    small = True
    for b in eval_ds.map_batches(fp_batch, batch_format="pandas").iter_batches(
        batch_size=65536, batch_format="pandas"
    ):
        fps.update(b["fp"])
        if len(fps) > broadcast_limit:
            small = False
            break
    if small:
        fp_ref = ray.put(frozenset(fps))

        def keep(batch: pd.DataFrame) -> pd.DataFrame:
            bad = ray.get(fp_ref)
            mask = np.fromiter(
                (
                    hashlib.md5(t.encode("utf-8")).hexdigest() not in bad
                    for t in batch[text_col]
                ),
                dtype=bool,
                count=len(batch),
            )
            return batch[mask]

        return ds.map_batches(keep, batch_format="pandas")

    # corpus-sized eval side (rare): bucketed anti-join on the fingerprint
    from .joins import bucketed_join

    def fp_rows(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["__fpi"] = [
            int.from_bytes(
                hashlib.md5(t.encode("utf-8")).digest()[:8], "big", signed=True
            )
            for t in batch[text_col]
        ]
        return out

    def fp_eval(batch: pd.DataFrame) -> pd.DataFrame:
        fpe = pd.Series(
            [
                int.from_bytes(
                    hashlib.md5(t.encode("utf-8")).digest()[:8],
                    "big",
                    signed=True,
                )
                for t in batch[eval_text_col]
            ],
            dtype="int64",
        ).drop_duplicates()
        # bucketed_join drops the right KEY column from its output, so the
        # hit signal must travel as a separate marker column
        return pd.DataFrame(
            {"__fpe": fpe, "__hit": pd.Series(1, index=fpe.index, dtype="int64")}
        )

    tagged = ds.map_batches(fp_rows, batch_format="pandas")
    evs = eval_ds.map_batches(fp_eval, batch_format="pandas")
    joined = bucketed_join(tagged, evs, "__fpi", "__fpe", n_buckets=32, how="left")

    def anti(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[batch["__hit"].isna()].drop(columns=["__fpi", "__hit"])
        # the join widened left columns to nullable Int64; surviving rows
        # are real left rows (no NAs possible) — restore plain int64 so
        # both decontaminate paths emit identical schemas
        for c in out.columns:
            if str(out[c].dtype) == "Int64":
                out[c] = out[c].astype("int64")
        return out

    return joined.map_batches(anti, batch_format="pandas")
