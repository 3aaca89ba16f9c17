"""rayxtract — a Ray-Data-native main-content extraction engine.

A from-scratch re-expression of the capabilities of
``CarlosMagnoSTavares/document-local-ai-processor`` (studied read-only at
/root/reference; see SURVEY.md) as a streaming Ray Data batch job:

  read_parquet(pages) -> map_batches(type detect)
                      -> map_batches(ExtractBatch actor pool)   # DOM strip / PDFL layout parse
                      -> dedup-by-url (keep latest warc_ts)
                      -> write_parquet(partitioned) + per-partition manifests

The reference is a FastAPI/Celery/Redis/SQLite per-document queue
(reference: workers.py:39-345, main.py:178-325); this engine replaces the
queue with a single streaming Dataset DAG and the per-row status checkpoints
with per-partition lineage manifests (reference: models.py:8-13).
"""

__version__ = "0.1.0"


def configure_context() -> None:
    """Set the engine's Ray Data execution knobs on the current DataContext.

    Called at every dataset-creation entry point (pipeline, queries, bench).
    HASH_SHUFFLE: the engine's exchanges are keyed repartitions and hash
    aggregations — none need sorted output, and the keyed-repartition dedup
    path requires it. Datasets snapshot their context at creation, so this
    must run before ``read_parquet``.
    """
    import ray
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    # keep the default sort-based shuffle: the 2.49 hash-shuffle path spawns
    # an aggregator actor pool (cap 64) that oversubscribes small CPU counts
    # and stalls (measured: 8-CPU job 321s -> >12min). The flagship needs no
    # keyed exchange at all (see pipeline.py); ad-hoc groupbys sort.
    # Size the hash aggregator cap anyway in case a caller opts in.
    try:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        n_cpus = 8
    ctx.max_hash_shuffle_aggregators = max(2, min(64, n_cpus // 2))
    # Skew: cap per-task payload. Map-stage fusion makes the read task's
    # dynamic output splitting the unit of extraction work, so the default
    # 128-MiB target lets one task accumulate ~128 MiB of html while its
    # peers idle at the stream tail. 32 MiB bounds the p99 task 4x tighter
    # at negligible block-count overhead (heavy single rows above the
    # target are isolated by ops.isolate_heavy; a row cannot be split).
    ctx.target_max_block_size = 32 * 1024 * 1024
