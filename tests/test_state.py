"""Sharded mutable fingerprint index (state.FingerprintIndex)."""

import numpy as np
import pandas as pd


def test_incremental_index_min_wins_is_order_independent(ray_session):
    """Offering the delta in two different batch orders yields identical
    winners — the determinism claim the oracle check relies on."""
    import ray.data as rd

    from rayxtract.state import FingerprintIndex

    rng = np.random.default_rng(9)
    base_fps = [f"fp{i}" for i in range(50)]
    # delta: 30 new fps, several claimed by multiple doc_ids + 10 colliding with base
    delta_rows = []
    did = 1000
    for i in range(30):
        for _ in range(int(rng.integers(1, 4))):
            delta_rows.append((did, f"new{i}"))
            did += 1
    for i in range(10):
        delta_rows.append((did, f"fp{i}"))
        did += 1

    def run(order):
        idx = FingerprintIndex(n_shards=4)
        try:
            bdf = pd.DataFrame({"fp": pd.Series(base_fps, dtype="object")})
            idx.load_base(rd.from_pandas(bdf).repartition(3), fp_col="fp")
            rows = list(order)
            ddf = pd.DataFrame(
                {
                    "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
                    "fp": pd.Series([r[1] for r in rows], dtype="object"),
                }
            )
            idx.offer_delta(rd.from_pandas(ddf).repartition(5))
            w = idx.winners()
        finally:
            idx.shutdown()
        return sorted(map(tuple, w[["fp", "doc_id"]].itertuples(index=False)))

    fwd = run(delta_rows)
    rev = run(delta_rows[::-1])
    assert fwd == rev
    # base collisions never win; min doc_id per new fp wins
    want = {}
    for did_, fp in delta_rows:
        if fp.startswith("new"):
            want[fp] = min(want.get(fp, 1 << 60), did_)
    assert fwd == sorted(want.items())


def test_index_shard_stats(ray_session):
    import ray

    from rayxtract.state import FingerprintIndex

    idx = FingerprintIndex(n_shards=2)
    try:
        import ray.data as rd

        idx.load_base(
            rd.from_pandas(
                pd.DataFrame({"fp": pd.Series([f"x{i}" for i in range(20)])})
            ),
            fp_col="fp",
        )
        stats = ray.get([s.stats.remote() for s in idx.shards])
        assert sum(b for b, _ in stats) == 20
    finally:
        idx.shutdown()
