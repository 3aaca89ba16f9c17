"""KLL quantile sketch: rank-error bounds, merge associativity, and the
grouped combiner-tree path vs the exact shuffle path (VERDICT r2 next #7)."""

import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def _rank_error(sorted_vals: np.ndarray, est: int, q: float) -> float:
    n = len(sorted_vals)
    lo = np.searchsorted(sorted_vals, est, side="left")
    hi = np.searchsorted(sorted_vals, est, side="right")
    target = q * n
    if lo <= target <= hi:
        return 0.0
    return min(abs(lo - target), abs(hi - target)) / n


def test_kll_rank_error_single():
    from rayxtract.sketch import KLLSketch

    rng = np.random.RandomState(0)
    data = rng.randint(0, 1_000_000, size=50_000).astype(np.int64)
    sk = KLLSketch(256)
    sk.update_many(data)
    assert sk.size() <= 256 * len(sk.levels)
    s = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        assert _rank_error(s, sk.quantile(q), q) <= 0.05


def test_kll_merge_matches_bulk():
    """Merging chunk sketches stays within the error bound (the combiner
    contract) on skewed data."""
    from rayxtract.sketch import KLLSketch

    rng = np.random.RandomState(1)
    data = np.concatenate(
        [
            rng.zipf(1.5, size=20_000).astype(np.int64),
            rng.randint(0, 100, size=20_000).astype(np.int64),
        ]
    )
    chunks = np.array_split(data, 16)
    sks = []
    for c in chunks:
        sk = KLLSketch(256)
        sk.update_many(c)
        sks.append(sk)
    merged = sks[0]
    for o in sks[1:]:
        merged.merge(o)
    assert merged.n == len(data)
    s = np.sort(data)
    for q in (0.25, 0.5, 0.9):
        assert _rank_error(s, merged.quantile(q), q) <= 0.05


def test_sketch_grouped_quantiles_vs_exact(ray_session):
    """The distributed sketch path lands within 5% rank error of the exact
    per-group quantiles on the events table."""
    import duckdb

    from rayxtract.queries import q_events_quantiles_sketch

    approx = q_events_quantiles_sketch(SF_DIR).to_pandas()
    con = duckdb.connect()
    exact_vals = con.execute(
        f"""SELECT event_type,
                   list_sort(list(CAST(FLOOR(value * 100.0) AS BIGINT))) AS cents
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY event_type"""
    ).df()
    con.close()
    assert set(approx["event_type"]) == set(exact_vals["event_type"])
    for _, row in exact_vals.iterrows():
        s = np.asarray(row["cents"], dtype=np.int64)
        a = approx[approx["event_type"] == row["event_type"]].iloc[0]
        for col, q in (("p25_cents", 0.25), ("p50_cents", 0.5), ("p90_cents", 0.9)):
            assert _rank_error(s, int(a[col]), q) <= 0.05, (
                row["event_type"], col, int(a[col])
            )
