"""Delta-crawl incremental build: resume against a GROWN input must run
only the new shards (plus winner-drift-touched old ones) and produce
output identical to a from-scratch build."""

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayxtract.ops import ExtractConfig
from rayxtract.pipeline import run_extraction

_BASE = 1_800_000_000_000_000


def _shard(path, idxs, crawl=0, tag="base"):
    """One input shard: url/ts derive from idx; html is a real page."""
    t = pa.table(
        {
            "url": [f"https://d.example/p/{i:08d}" for i in idxs],
            "warc_ts": pa.array(
                [_BASE + i * 1_000_000 + crawl * 500_000 for i in idxs],
                type=pa.timestamp("us"),
            ),
            "html": [
                f"<!DOCTYPE html><html><body><p>doc {i} {tag} delta "
                "incremental build paragraph body text</p></body>"
                "</html>".encode()
                for i in idxs
            ],
            "lang": ["en"] * len(idxs),
        }
    )
    pq.write_table(t, path)


def _read_sorted(out_dir):
    import ray.data

    df = ray.data.read_parquet(
        out_dir, columns=["url", "warc_ts", "text"]
    ).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


@pytest.fixture()
def grown_input(tmp_path):
    """3 base shards (disjoint idx ranges), grow helper appends more."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for k in range(3):
        _shard(str(in_dir / f"s{k:05d}.parquet"), range(k * 20, (k + 1) * 20))
    return in_dir


def test_delta_append_only_runs_new_shards(grown_input, tmp_path, ray_session):
    in_dir = str(grown_input)
    out = str(tmp_path / "out")
    rep = run_extraction(in_dir, out, ExtractConfig(), resume=False)
    assert rep["rows"] == 60
    # the delta arrives: 2 new shards, all-new urls
    _shard(os.path.join(in_dir, "s00003.parquet"), range(60, 80), tag="new")
    _shard(os.path.join(in_dir, "s00004.parquet"), range(80, 90), tag="new")
    rep2 = run_extraction(in_dir, out, ExtractConfig(), resume=True)
    assert rep2["partitions_skipped_on_resume"] == 3   # only new shards ran
    assert rep2["partitions_invalidated_delta"] == []
    assert rep2["rows"] == 90
    # combined output == from-scratch over the grown input
    scratch = str(tmp_path / "scratch")
    run_extraction(in_dir, scratch, ExtractConfig(), resume=False)
    pd.testing.assert_frame_equal(_read_sorted(out), _read_sorted(scratch))


def test_delta_recrawl_invalidates_touched_partition(
    grown_input, tmp_path, ray_session
):
    """A new shard recrawling urls from base shard 0 must invalidate
    EXACTLY partition 0 (winner drift), and the stale old rows must be
    gone from the combined output."""
    in_dir = str(grown_input)
    out = str(tmp_path / "out")
    run_extraction(in_dir, out, ExtractConfig(), resume=False)
    # newer crawl (crawl=1 -> later warc_ts) of 5 urls living in shard 0
    _shard(
        os.path.join(in_dir, "s00003.parquet"), range(0, 5), crawl=1,
        tag="recrawl",
    )
    rep = run_extraction(in_dir, out, ExtractConfig(), resume=True)
    assert rep["partitions_invalidated_delta"] == [0]
    assert rep["partitions_skipped_on_resume"] == 2    # shards 1, 2 skipped
    assert rep["rows"] == 60                            # still one row per url
    combined = _read_sorted(out)
    # the recrawled urls carry the NEW text and the NEW (later) ts
    hit = combined[combined["url"] == "https://d.example/p/00000003"]
    assert len(hit) == 1
    assert "recrawl" in hit.iloc[0]["text"]
    # byte-identical to a from-scratch build over the grown input
    scratch = str(tmp_path / "scratch")
    run_extraction(in_dir, scratch, ExtractConfig(), resume=False)
    pd.testing.assert_frame_equal(combined, _read_sorted(scratch))


def test_delta_removed_shard_full_rebuild(grown_input, tmp_path, ray_session):
    """Removing a shard (even the LAST one, which shifts no indices) must
    force a full rebuild — its rows may have been suppressing other
    shards' rows as winners."""
    in_dir = str(grown_input)
    out = str(tmp_path / "out")
    run_extraction(in_dir, out, ExtractConfig(), resume=False)
    os.remove(os.path.join(in_dir, "s00002.parquet"))
    rep = run_extraction(in_dir, out, ExtractConfig(), resume=True)
    assert rep["partitions_skipped_on_resume"] == 0
    assert rep["rows"] == 40


def test_delta_rewrite_in_place_full_rebuild(grown_input, tmp_path, ray_session):
    """A shard rewritten under the same name invalidates everything: its
    OLD url set is unknowable, so winner drift can't be bounded."""
    in_dir = str(grown_input)
    out = str(tmp_path / "out")
    run_extraction(in_dir, out, ExtractConfig(), resume=False)
    p = os.path.join(in_dir, "s00001.parquet")
    _shard(p, range(100, 110), tag="rewritten")
    os.utime(p)  # ensure mtime_ns drift even on coarse filesystems
    rep = run_extraction(in_dir, out, ExtractConfig(), resume=True)
    assert rep["partitions_skipped_on_resume"] == 0
    assert rep["rows"] == 50
    scratch = str(tmp_path / "scratch")
    run_extraction(in_dir, scratch, ExtractConfig(), resume=False)
    pd.testing.assert_frame_equal(_read_sorted(out), _read_sorted(scratch))


def test_plain_interrupted_resume_unchanged(grown_input, tmp_path, ray_session):
    """Same input list -> reconciliation must NOT add work: wiping two
    partitions' manifests simulates an interrupted run; resume re-runs
    exactly those, no overlap scan invalidation."""
    in_dir = str(grown_input)
    out = str(tmp_path / "out")
    run_extraction(in_dir, out, ExtractConfig(), resume=False)
    from rayxtract import manifest as mf

    shutil.rmtree(mf.partition_dir(out, 1))
    rep = run_extraction(in_dir, out, ExtractConfig(), resume=True)
    assert rep["partitions_skipped_on_resume"] == 2
    assert rep["partitions_invalidated_delta"] == []
    assert rep["rows"] == 60


def test_cli_delta_flag(grown_input, tmp_path, capsys, ray_session):
    from rayxtract.__main__ import main

    in_dir = str(grown_input)
    out = str(tmp_path / "out")
    assert main(["extract", "--pages", in_dir, "--out", out]) == 0
    capsys.readouterr()
    _shard(os.path.join(in_dir, "s00003.parquet"), range(60, 70), tag="new")
    assert main(["extract", "--pages", in_dir, "--out", out, "--delta"]) == 0
    import json

    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["partitions_skipped_on_resume"] == 3
    assert rep["rows"] == 70
