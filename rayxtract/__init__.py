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
