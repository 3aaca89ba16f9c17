"""Zone-map pruned reads: footer-only planning must open FEWER shards
while losing no rows (byte-identical results vs the full scan)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayxtract.pipeline import list_shards
from rayxtract.zonemap import build_zone_maps, prune, shard_zone_map


def _write_url_clustered(tmp_path, n_shards=4, rows_per=50):
    """A url-SORTED corpus: shard k holds urls [k*rows_per, (k+1)*rows_per)
    — disjoint url and ts spans per shard, so zone maps can prune."""
    base = 1_700_000_000_000_000
    paths = []
    for k in range(n_shards):
        idx = range(k * rows_per, (k + 1) * rows_per)
        t = pa.table(
            {
                "url": [f"https://z.example/p/{i:08d}" for i in idx],
                "warc_ts": pa.array(
                    [base + i * 1_000_000 for i in idx],
                    type=pa.timestamp("us"),
                ),
                "html": [
                    f"<!DOCTYPE html><html><body><p>doc {i} zone map "
                    "pruning probe paragraph body</p></body></html>".encode()
                    for i in idx
                ],
                "lang": ["en"] * rows_per,
            }
        )
        p = str(tmp_path / f"s{k:05d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths, base, rows_per


def test_zone_maps_match_scan(tmp_path, ray_session):
    paths, base, rows_per = _write_url_clustered(tmp_path)
    zones = build_zone_maps(paths)
    assert list(zones["shard_id"]) == [0, 1, 2, 3]
    assert list(zones["n_rows"]) == [rows_per] * 4
    # footer spans equal the scanned truth per shard
    for k, p in enumerate(paths):
        t = pq.read_table(p, columns=["url", "warc_ts"])
        urls = t["url"].to_pylist()
        z = zones.iloc[k]
        assert z["min_url"] == min(urls) and z["max_url"] == max(urls)
        ts = t["warc_ts"].cast(pa.int64()).to_pylist()
        assert z["min_ts_us"] == min(ts) and z["max_ts_us"] == max(ts)


def test_prune_url_point(tmp_path, ray_session):
    paths, _, rows_per = _write_url_clustered(tmp_path)
    zones = build_zone_maps(paths)
    # a url in shard 2's span survives only there
    assert prune(zones, url=f"https://z.example/p/{2 * rows_per + 3:08d}") == [2]
    # a url outside every span survives nowhere
    assert prune(zones, url="https://zzz.example/x") == []


def test_prune_ts_range_no_rows_lost(tmp_path, ray_session):
    paths, base, rows_per = _write_url_clustered(tmp_path)
    zones = build_zone_maps(paths)
    lo = base + (rows_per + 5) * 1_000_000       # inside shard 1
    hi = base + (2 * rows_per + 5) * 1_000_000   # inside shard 2
    keep = prune(zones, ts_lo_us=lo, ts_hi_us=hi)
    assert keep == [1, 2]  # shards 0 and 3 never opened
    # pruned read + exact filter == full scan + exact filter
    full = pa.concat_tables(
        [pq.read_table(p, columns=["url", "warc_ts"]) for p in paths]
    ).to_pandas()
    full["ts"] = full["warc_ts"].astype("datetime64[us]").astype("int64")
    want = full[(full["ts"] >= lo) & (full["ts"] <= hi)]["url"].sort_values()
    got = pa.concat_tables(
        [pq.read_table(paths[i], columns=["url", "warc_ts"]) for i in keep]
    ).to_pandas()
    got["ts"] = got["warc_ts"].astype("datetime64[us]").astype("int64")
    got = got[(got["ts"] >= lo) & (got["ts"] <= hi)]["url"].sort_values()
    assert list(got) == list(want)


def test_empty_shard_leaves_gap(tmp_path, ray_session):
    paths, _, _ = _write_url_clustered(tmp_path, n_shards=2)
    empty = str(tmp_path / "s99999.parquet")
    pq.write_table(
        pq.read_table(paths[0]).slice(0, 0), empty
    )
    zones = build_zone_maps(paths + [empty])
    # absolute ids: the empty shard reports nothing, later ids don't shift
    assert list(zones["shard_id"]) == [0, 1]


def test_stats_less_shard_refuses(tmp_path, ray_session):
    paths, _, _ = _write_url_clustered(tmp_path, n_shards=1)
    bare = str(tmp_path / "bare.parquet")
    pq.write_table(
        pq.read_table(paths[0]), bare, write_statistics=False
    )
    with pytest.raises(RuntimeError, match="footer statistics"):
        shard_zone_map(bare, 0)


def test_reextract_zone_pruned(tmp_path, ray_session):
    """The probe must not even OPEN shards whose url span excludes the
    target (zone-pruned), and must return the same record it would on a
    full scan."""
    from rayxtract.tools import reextract_url

    paths, _, rows_per = _write_url_clustered(tmp_path)
    url = f"https://z.example/p/{3 * rows_per + 7:08d}"
    rec = reextract_url(str(tmp_path), url)
    assert rec["shards_total"] == 4
    assert rec["shards_zone_pruned"] == 3   # only shard 3 survives
    assert rec["shards_payload_read"] == 1
    assert f"doc {3 * rows_per + 7}" in rec["text"]


def test_pages_ts_range_prunes_on_synth(small_corpus, ray_session):
    """On the real synth corpus (crawl-ordered → ts-clustered shards) the
    window must prune most shards and still return exactly the full-scan
    rows."""
    import ray.data

    from rayxtract.queries import _ts_range_bounds, q_pages_ts_range

    pages_dir, _ = small_corpus
    shards = list_shards(pages_dir)
    zones = build_zone_maps(shards)
    lo, hi = _ts_range_bounds(1000)
    keep = prune(zones, ts_lo_us=lo, ts_hi_us=hi)
    assert 0 < len(keep) < len(shards)  # pruning actually fires

    # sf0.001 maps to the same 1000-page cached corpus as small_corpus
    got = q_pages_ts_range("/root/testdata/sf0.001")
    # ground truth by scanning everything
    full = ray.data.read_parquet(pages_dir, columns=["url", "warc_ts"]).to_pandas()
    ts = full["warc_ts"].astype("datetime64[us]").astype("int64")
    want = full.loc[(ts >= lo) & (ts <= hi), "url"].sort_values()
    assert sorted(got["url"]) == list(want)
    assert len(got) > 0


def _write_crawl_ordered(tmp_path, n_shards=4, rows_per=50):
    """A crawl-ordered corpus: urls are round-robin across shards, so
    EVERY shard's [min_url, max_url] span covers ~the whole url space —
    the layout where url zone maps cannot prune (the cluster job's
    input condition)."""
    base = 1_700_000_000_000_000
    n = n_shards * rows_per
    paths = []
    for k in range(n_shards):
        idx = [i for i in range(n) if i % n_shards == k]
        t = pa.table(
            {
                "url": [f"https://z.example/p/{i:08d}" for i in idx],
                "warc_ts": pa.array(
                    [base + i * 1_000_000 for i in idx],
                    type=pa.timestamp("us"),
                ),
                "html": [
                    f"<!DOCTYPE html><html><body><p>doc {i} cluster "
                    "rewrite probe paragraph body</p></body></html>".encode()
                    for i in idx
                ],
                "lang": ["en"] * len(idx),
            }
        )
        p = str(tmp_path / f"in" / f"s{k:05d}.parquet")
        os.makedirs(str(tmp_path / "in"), exist_ok=True)
        pq.write_table(t, p)
        paths.append(p)
    return str(tmp_path / "in"), paths, base, n


def test_cluster_by_url_rewrites_to_disjoint_spans(tmp_path, ray_session):
    """cluster_by_url on a crawl-ordered corpus: content identity (every
    row moved exactly once, html bytes intact), DISJOINT url spans, and
    a point probe that opens exactly ONE shard where the input layout
    opened all of them."""
    from rayxtract.tools import cluster_by_url, reextract_url

    in_dir, in_paths, _, n = _write_crawl_ordered(tmp_path)
    # input layout: url pruning is useless — every shard survives
    probe_url = f"https://z.example/p/{n // 2:08d}"
    in_zones = build_zone_maps(in_paths)
    assert len(prune(in_zones, url=probe_url)) == len(in_paths)

    dest = str(tmp_path / "clustered")
    res = cluster_by_url(in_dir, dest, n_ranges=8, sample_per_shard=64)
    assert res["rows"] == n
    assert res["n_ranges"] >= 2  # sampled boundaries actually split

    out_paths = list_shards(dest)
    zones = build_zone_maps(out_paths).sort_values("min_url")
    # spans are pairwise disjoint by construction
    assert (
        zones["max_url"].iloc[:-1].to_numpy()
        < zones["min_url"].iloc[1:].to_numpy()
    ).all()
    # clustered layout: the same probe opens exactly one shard
    assert len(prune(zones, url=probe_url)) == 1

    # content identity: (url, ts, html) multiset unchanged
    import pandas as pd

    def _frame(paths):
        t = pa.concat_tables([pq.read_table(p) for p in paths])
        df = t.to_pandas()
        df["warc_ts"] = df["warc_ts"].astype("datetime64[us]")
        return df.sort_values("url").reset_index(drop=True)

    pd.testing.assert_frame_equal(
        _frame(in_paths), _frame(out_paths)[list(_frame(in_paths).columns)]
    )

    # the re-extraction probe rides the new layout: 1 payload read
    rec = reextract_url(dest, probe_url)
    assert rec["shards_payload_read"] == 1
    assert rec["shards_zone_pruned"] == len(out_paths) - 1
    assert f"doc {n // 2}" in rec["text"]


def test_cluster_by_url_recrawls_colocate(tmp_path, ray_session):
    """Equal urls (recrawls) must land in the SAME range shard — the
    invariant keep-latest dedup over a clustered layout relies on."""
    from rayxtract.tools import cluster_by_url

    in_dir, _, base, n = _write_crawl_ordered(tmp_path, n_shards=2, rows_per=40)
    # append a recrawl shard duplicating every 5th url at a later ts
    dup_idx = list(range(0, n, 5))
    t = pa.table(
        {
            "url": [f"https://z.example/p/{i:08d}" for i in dup_idx],
            "warc_ts": pa.array(
                [base + (n + i) * 1_000_000 for i in dup_idx],
                type=pa.timestamp("us"),
            ),
            "html": [b"<html><body><p>recrawl</p></body></html>"] * len(dup_idx),
            "lang": ["en"] * len(dup_idx),
        }
    )
    pq.write_table(t, os.path.join(in_dir, "s99998.parquet"))

    dest = str(tmp_path / "clustered2")
    cluster_by_url(in_dir, dest, n_ranges=6, sample_per_shard=64)
    per_shard = {
        p: set(pq.read_table(p, columns=["url"])["url"].to_pylist())
        for p in list_shards(dest)
    }
    for i in dup_idx:
        u = f"https://z.example/p/{i:08d}"
        hits = [p for p, urls in per_shard.items() if u in urls]
        assert len(hits) == 1, f"recrawl url {u} split across {hits}"


def test_cluster_by_url_dest_exists(tmp_path, ray_session):
    from rayxtract.tools import cluster_by_url

    in_dir, _, _, _ = _write_crawl_ordered(tmp_path, n_shards=1, rows_per=10)
    dest = str(tmp_path / "taken")
    os.makedirs(dest)
    with pytest.raises(FileExistsError):
        cluster_by_url(in_dir, dest)
