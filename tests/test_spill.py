"""Spill-cache discipline (VERDICT r3 next #5/#8): the marker-gated
parquet spill must (a) serve byte-identical data on cold build and warm
hit, (b) reject a cache built with different operator parameters, (c)
survive a mid-publish kill — a crashed writer leaves NO readable cache
and the next run recomputes from scratch — and (d) back the embedding
fixpoints without pinning the table in the object store."""

import os
import shutil
import signal
import subprocess
import sys
import textwrap
import time

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _fresh_dir(name: str) -> str:
    d = f"/tmp/rayxtract_spill_test_{name}"
    shutil.rmtree(d, ignore_errors=True)
    for stale in __import__("glob").glob(f"{d}.tmp.*"):
        shutil.rmtree(stale, ignore_errors=True)
    return d


def test_spill_cold_and_warm_identity(ray_session):
    import ray.data

    from rayxtract.neardup import _spill_and_reread

    df = pd.DataFrame(
        {"k": np.arange(500, dtype="int64"), "v": np.arange(500, dtype="int64") * 7}
    )
    spill = _fresh_dir("identity")
    params = {"op": "t", "ver": 1}
    cold = (
        _spill_and_reread(ray.data.from_pandas(df).repartition(4), spill, params)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert os.path.exists(os.path.join(spill, "_SPILL_COMPLETE"))
    # warm hit: the input dataset is NOT re-executed (feed a poisoned one)
    def boom(_b):
        raise RuntimeError("cache miss executed the input")

    poisoned = ray.data.from_pandas(df).map_batches(boom, batch_format="pandas")
    warm = (
        _spill_and_reread(poisoned, spill, params)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(cold, warm)
    pd.testing.assert_frame_equal(cold, df)
    # parameter mismatch must refuse the cache, not silently serve it
    with pytest.raises(ValueError, match="built with"):
        _spill_and_reread(poisoned, spill, {"op": "t", "ver": 2})
    shutil.rmtree(spill, ignore_errors=True)


def test_spill_kill_mid_publish_recomputes(ray_session):
    """SIGKILL a writer mid-spill: the unpublished ``.tmp.<pid>`` dir must
    never be readable as a cache (no _SPILL_COMPLETE in the final path),
    and the next run recomputes and serves identical rows."""
    import ray.data

    from rayxtract.neardup import _spill_and_reread

    spill = _fresh_dir("kill")
    script = textwrap.dedent(f"""
        import time
        import numpy as np, pandas as pd, ray
        ray.init(address="local", num_cpus=2, include_dashboard=False,
                 logging_level="ERROR")
        import ray.data
        from rayxtract.neardup import _spill_and_reread

        df = pd.DataFrame({{"k": np.arange(400, dtype="int64")}})

        def slow(b):
            time.sleep(0.5)   # stretch the write window for the kill
            return b

        ds = ray.data.from_pandas(df).repartition(16).map_batches(
            slow, batch_format="pandas")
        print("SPILL_START", flush=True)
        _spill_and_reread(ds, {spill!r}, params={{"op": "kill-probe"}})
        print("SPILL_DONE", flush=True)
    """)
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.Popen(
        [sys.executable, "-c", script], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    # wait for the writer to reach the spill, then kill it mid-write
    line = proc.stdout.readline()
    assert "SPILL_START" in line, line
    deadline = time.monotonic() + 60
    tmp_seen = False
    while time.monotonic() < deadline:
        if any(".tmp." in d for d in __import__("glob").glob(f"{spill}.tmp.*")):
            tmp_seen = True
            break
        if proc.poll() is not None:
            break
        time.sleep(0.1)
    proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=30)
    assert tmp_seen, "writer never opened its tmp spill dir"
    # the crash must not have published anything readable
    assert not os.path.exists(os.path.join(spill, "_SPILL_COMPLETE"))

    # next run recomputes from the REAL input and serves identical rows
    df = pd.DataFrame({"k": np.arange(400, dtype="int64")})
    out = (
        _spill_and_reread(
            ray.data.from_pandas(df).repartition(4), spill,
            params={"op": "kill-probe"},
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, df)
    assert os.path.exists(os.path.join(spill, "_SPILL_COMPLETE"))
    shutil.rmtree(spill, ignore_errors=True)
    for stale in __import__("glob").glob(f"{spill}.tmp.*"):
        shutil.rmtree(stale, ignore_errors=True)


def test_emb_spill_serves_identical_table(ray_session):
    """The embedding fixpoints' disk-backed input equals the direct
    pruned read row-for-row, and a warm q_emb_kmeans (spill hit) matches
    the cold run exactly."""
    from rayxtract.queries import QUERIES, _emb_spilled, _read

    direct = (
        _read(SF_DIR, "embeddings", ["vec_id", "embedding"])
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    spilled = (
        _emb_spilled(SF_DIR).to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert direct["vec_id"].tolist() == spilled["vec_id"].tolist()
    for a, b in zip(direct["embedding"], spilled["embedding"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    cold = QUERIES["emb_kmeans"](SF_DIR).to_pandas().sort_values("cluster")
    warm = QUERIES["emb_kmeans"](SF_DIR).to_pandas().sort_values("cluster")
    pd.testing.assert_frame_equal(
        cold.reset_index(drop=True), warm.reset_index(drop=True)
    )
