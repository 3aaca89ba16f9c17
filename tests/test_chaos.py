"""Fault-injection probes: a Ray worker process dying mid-batch (the
routine failure mode on a multi-node cluster — OOM kill, node preemption,
segfaulting native lib) must not corrupt results. Ray Data retries the
failed task / restarts the pool actor; these tests kill a worker with
os._exit (a SYSTEM_ERROR death, not a Python exception) and assert the
output is exactly what the healthy run produces.

Distinct from the driver-death probe (tests/test_pipeline.py resume
tests + the verify skill's kill+resume recipe): here the DRIVER survives
and the retry is Ray-internal, no manifest machinery involved.
"""

import os
import uuid

import pandas as pd
import pytest


def _marker() -> str:
    return f"/tmp/rayxtract_chaos_{uuid.uuid4().hex}"


def _crash_once_cls(marker: str):
    class CrashOnce:
        """Actor-pool stage: the FIRST actor to see a batch dies with
        os._exit (worker-process death). The marker file (shared fs on a
        single node) makes every later call healthy; a benign race where
        two actors both crash only exercises the retry twice."""

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not os.path.exists(marker):
                open(marker, "w").close()
                os._exit(1)
            out = pd.DataFrame({"id": batch["id"].astype("int64")})
            out["y"] = out["id"] * 2
            return out

    return CrashOnce


def test_actor_pool_survives_worker_crash(ray_session):
    import ray.data

    marker = _marker()
    ds = ray.data.range(20_000, override_num_blocks=8).map_batches(
        _crash_once_cls(marker), batch_format="pandas", concurrency=2
    )
    df = ds.to_pandas()
    assert os.path.exists(marker), "fault was never injected"
    os.remove(marker)
    assert len(df) == 20_000
    assert int(df["y"].sum()) == 2 * sum(range(20_000))
    assert df["id"].nunique() == 20_000  # no duplicated retry output


def test_shuffle_stage_survives_worker_crash(ray_session):
    """Crash inside a map_groups task (post-exchange side): the keyed
    aggregate must still be exact — retries must not double-count."""
    import ray.data

    marker = _marker()

    def agg_group(group: pd.DataFrame) -> pd.DataFrame:
        if not os.path.exists(marker):
            open(marker, "w").close()
            os._exit(1)
        return pd.DataFrame(
            {"k": [int(group["k"].iloc[0])], "s": [int(group["id"].sum())]}
        )

    base = ray.data.range(10_000, override_num_blocks=8).map_batches(
        lambda b: pd.DataFrame(
            {"id": b["id"].astype("int64"), "k": b["id"].astype("int64") % 7}
        ),
        batch_format="pandas",
    )
    df = base.groupby("k").map_groups(agg_group, batch_format="pandas").to_pandas()
    assert os.path.exists(marker), "fault was never injected"
    os.remove(marker)
    assert len(df) == 7
    expect = pd.Series(range(10_000)).groupby(pd.Series(range(10_000)) % 7).sum()
    got = df.set_index("k")["s"].sort_index()
    assert got.to_dict() == {int(k): int(v) for k, v in expect.items()}
