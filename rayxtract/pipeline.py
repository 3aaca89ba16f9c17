"""The flagship extraction pipeline: one streaming Ray Data DAG.

Replaces the reference's API + Redis queue + 3 Celery stages + SQLite
checkpoints (reference: main.py:178-325, workers.py:39-345) with::

    read_parquet(pages, columns=[url, warc_ts, html, lang])
      -> map_batches(add_partition_id)          # cheap; resume filter point
      -> [filter out completed partitions]      # resume-from-checkpoint
      -> map_batches(ExtractBatch, actor pool)  # DOM strip / layout parse
      -> dedup_keep_latest                      # one shuffle, post-extraction
      -> write_parquet(partition_cols=[partition_id])
      -> metrics read-back -> per-partition _manifest.json

Stage sizing: the extract stage is an autoscaling actor pool with a modest
``batch_size`` so a heavy-tail blob (multi-MB html) occupies one small batch
instead of stalling a big one — skew control without a pre-shuffle
(SURVEY.md §4). Column pruning at the read drops the WET ``text`` column
(never needed for extraction).
"""

from __future__ import annotations

import time

import pyarrow as pa

from . import manifest as mf
from .dedup import dedup_keep_latest
from .ops import ExtractBatch, ExtractConfig, add_partition_id

__all__ = ["extraction_dataset", "run_extraction"]


def extraction_dataset(pages_path: str, cfg: ExtractConfig | None = None, skip_partitions: set[int] | None = None):
    """Build the lazy extraction Dataset (no output side effects)."""
    import ray.data

    cfg = cfg or ExtractConfig()
    ds = ray.data.read_parquet(
        pages_path, columns=["url", "warc_ts", "html", "lang"]
    )
    n_parts = cfg.n_partitions
    ds = ds.map_batches(
        lambda b: add_partition_id(b, n_parts), batch_format="pyarrow"
    )
    if skip_partitions:
        skip = skip_partitions
        ds = ds.map_batches(
            lambda b: b.filter(
                pa.array([p not in skip for p in b["partition_id"].to_pylist()])
            ),
            batch_format="pyarrow",
        )
    ds = ds.map_batches(
        ExtractBatch,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.concurrency,
    )
    return dedup_keep_latest(ds)


def run_extraction(
    pages_path: str,
    out_dir: str,
    cfg: ExtractConfig | None = None,
    resume: bool = True,
) -> dict:
    """Run (or resume) the pipeline to partitioned parquet + manifests.

    Returns a job report: per-partition metrics totals and timing.
    """
    import ray.data

    cfg = cfg or ExtractConfig()
    t0 = time.monotonic()

    done = mf.completed_partitions(out_dir) if resume else set()
    if not resume:
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
    wiped = mf.clean_incomplete(out_dir, done)

    skipped = len(done)
    if len(done) < cfg.n_partitions:
        ds = extraction_dataset(pages_path, cfg, skip_partitions=done)
        ds.write_parquet(out_dir, partition_cols=["partition_id"])

    # Metrics read-back: fingerprint what was actually written (the
    # reference's lesson — completion flags lie, fix_extraction_bug.py:26-46).
    from ray.data.aggregate import Count, Max, Sum

    out_ds = ray.data.read_parquet(
        out_dir,
        columns=[
            "partition_id",
            "n_chars",
            "is_ocr_fallback",
            "is_parse_failure",
            "text_crc",
        ],
    )
    stats = (
        out_ds.groupby("partition_id")
        .aggregate(
            Count(alias_name="rows"),
            Sum("n_chars", alias_name="chars"),
            Sum("is_ocr_fallback", alias_name="ocr_fallbacks"),
            Sum("is_parse_failure", alias_name="parse_failures"),
            Sum("text_crc", alias_name="crc_sum"),
            Max("n_chars", alias_name="max_chars"),
        )
        .to_pandas()
    )
    elapsed = time.monotonic() - t0
    totals = {
        "rows": int(stats["rows"].sum()),
        "chars": int(stats["chars"].sum()),
        "ocr_fallbacks": int(stats["ocr_fallbacks"].sum()),
        "parse_failures": int(stats["parse_failures"].sum()),
        "partitions": int(len(stats)),
        "partitions_skipped_on_resume": skipped,
        "partitions_wiped_incomplete": wiped,
        "wall_sec": elapsed,
    }
    for rec in stats.to_dict("records"):
        pid = int(rec["partition_id"])
        if pid in done:
            continue  # keep original lineage record for already-complete parts
        mf.write_manifest(
            out_dir,
            pid,
            {
                "rows": int(rec["rows"]),
                "chars": int(rec["chars"]),
                "ocr_fallbacks": int(rec["ocr_fallbacks"]),
                "parse_failures": int(rec["parse_failures"]),
                "crc_sum": int(rec["crc_sum"]),
                "max_chars": int(rec["max_chars"]),
                "input": pages_path,
            },
        )
    return totals
