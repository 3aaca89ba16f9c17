"""Per-partition lineage manifests: checkpoint, metrics, resume.

The reference checkpoints per-ROW via a status enum persisted after each
stage (reference: models.py:8-13, workers.py:82-109) and its repair scripts
show why completion flags alone are not enough — status can say done while
the data is empty (reference: fix_extraction_bug.py:26-46, main.py:433-447).
Here the checkpoint unit is the PARTITION: output is hash(url)-partitioned
parquet, and each completed partition gets a ``_manifest.json`` that
fingerprints the ACTUAL written rows (row count + order-independent crc sum),
not just a done-bit.

Resume = read manifests, skip complete partitions at the head of the DAG
(filter on the cheap partition_id stage), wipe any partial unmanifested
partition dirs, re-run the remainder.
"""

from __future__ import annotations

import json
import os
import shutil

__all__ = [
    "partition_dir",
    "write_manifest",
    "read_manifest",
    "completed_partitions",
    "clean_incomplete",
    "MANIFEST_NAME",
]

MANIFEST_NAME = "_manifest.json"


def partition_dir(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, f"partition_id={pid}")


def write_manifest(out_dir: str, pid: int, metrics: dict) -> None:
    """Atomically persist a partition's lineage record (write temp + rename)."""
    pdir = partition_dir(out_dir, pid)
    os.makedirs(pdir, exist_ok=True)
    path = os.path.join(pdir, MANIFEST_NAME)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"partition_id": pid, **metrics}, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def read_manifest(out_dir: str, pid: int) -> dict | None:
    path = os.path.join(partition_dir(out_dir, pid), MANIFEST_NAME)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None


def completed_partitions(out_dir: str) -> set[int]:
    """Partition ids with a valid manifest."""
    done: set[int] = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if not name.startswith("partition_id="):
            continue
        try:
            pid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if read_manifest(out_dir, pid) is not None:
            done.add(pid)
    return done


def clean_incomplete(out_dir: str, done: set[int]) -> list[int]:
    """Delete partition dirs that have files but no manifest (partial write
    from a killed run); returns the wiped pids."""
    wiped = []
    if not os.path.isdir(out_dir):
        return wiped
    for name in os.listdir(out_dir):
        if not name.startswith("partition_id="):
            continue
        try:
            pid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if pid not in done:
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
            wiped.append(pid)
    return wiped
