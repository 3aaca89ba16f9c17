"""KLL quantile sketch: rank-error bounds, merge associativity, and the
grouped combiner-tree path vs the exact shuffle path (VERDICT r2 next #7)."""

import numpy as np
import pandas as pd
import pytest

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


def test_misra_gries_bounds_and_guarantee():
    """MG invariant: true - dec <= est <= true for every item, and every
    item with true count > dec is present in the summary."""
    from collections import Counter

    from rayxtract.sketch import MisraGries

    rng = np.random.default_rng(7)
    # zipf-ish stream with a long tail: ~200 distinct heavy + noise
    items = [f"w{int(v)}" for v in rng.zipf(1.3, size=20000) % 5000]
    truth = Counter(items)
    sk = MisraGries(m=64)
    for lo in range(0, len(items), 500):
        sk.update_many(items[lo : lo + 500])
    assert len(sk.counters) <= 64
    for it, true in truth.items():
        est = sk.counters.get(it, 0)
        assert est <= true
        assert est >= true - sk.dec
    for it, true in truth.items():
        if true > sk.dec:
            assert it in sk.counters


def test_misra_gries_merge_matches_single_stream():
    """Merging per-chunk sketches preserves the same error invariant as
    one sketch over the concatenated stream (mergeable-summaries
    property), including weighted updates."""
    from collections import Counter

    from rayxtract.sketch import MisraGries

    rng = np.random.default_rng(11)
    chunks = [
        [f"t{int(v)}" for v in rng.zipf(1.5, size=3000) % 800]
        for _ in range(6)
    ]
    truth = Counter(x for c in chunks for x in c)
    merged = MisraGries(m=48)
    for c in chunks:
        part = MisraGries(m=48)
        vc = Counter(c)
        part.update_many(list(vc.keys()), list(vc.values()))
        merged.merge(part)
    assert len(merged.counters) <= 48
    for it, true in truth.items():
        est = merged.counters.get(it, 0)
        assert est <= true
        assert est >= true - merged.dec
    n_total = sum(truth.values())
    assert merged.dec <= n_total // (48 + 1) + 1


def test_exact_heavy_hitters_matches_exact_topk(ray_session):
    """Sketch-guided two-pass equals the plain exact top-k on a skewed
    word stream, and trips RuntimeError when capacity is hopeless."""
    import ray.data as rd

    from rayxtract.sketch import exact_heavy_hitters

    rng = np.random.default_rng(3)
    words = [f"w{int(v)}" for v in rng.zipf(1.2, size=30000) % 2000]
    df = pd.DataFrame({"word": pd.Series(words, dtype="object")})
    ds = rd.from_pandas(df).repartition(8)
    got = exact_heavy_hitters(ds, "word", k=10, m=512).to_pandas()
    exact = (
        df["word"].value_counts().rename_axis("value").reset_index(name="n")
        .sort_values(["n", "value"], ascending=[False, True], kind="mergesort")
        .head(10).reset_index(drop=True)
    )
    got = got.sort_values(["n", "value"], ascending=[False, True], kind="mergesort").reset_index(drop=True)
    assert got["value"].tolist() == exact["value"].tolist()
    assert got["n"].tolist() == exact["n"].tolist()


def test_bigram_fluency_matches_reference(ray_session):
    """lm.bigram_fluency equals a single-process reference over the same
    scaled-integer MLE definition."""
    import ray.data as rd

    from rayxtract.lm import SCALE, bigram_fluency

    rng = np.random.default_rng(5)
    vocab = [f"v{i}" for i in range(40)]
    docs = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 30))))
        for _ in range(200)
    ]
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64), "text": docs})

    # reference: global bigram/unigram-first counts, per-doc mean
    from collections import Counter

    c12: Counter = Counter()
    c1: Counter = Counter()
    for t in docs:
        toks = t.split()
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    want = {}
    for did, t in zip(df["doc_id"], docs):
        toks = t.split()
        bigs = list(zip(toks, toks[1:]))
        if not bigs:
            continue
        s = sum(c12[p] * SCALE // c1[p[0]] for p in bigs)
        want[int(did)] = (len(bigs), s // len(bigs))

    got = bigram_fluency(rd.from_pandas(df).repartition(6)).to_pandas()
    got_map = {
        int(r.doc_id): (int(r.n_bigrams), int(r.fluency))
        for r in got.itertuples()
    }
    assert got_map == want


def test_score_bucket_no_int64_overflow():
    """A bigram whose global count exceeds 2^63/SCALE must not wrap int64
    in the c12*SCALE ratio — the guard falls back to Python-int math."""
    from rayxtract.lm import SCALE, score_bucket

    half = (2**63 - 1) // SCALE // 2 + 7  # 2*half*SCALE would overflow
    g = pd.DataFrame(
        {
            "doc_id": pd.Series([1, 2, 3], dtype="int64"),
            "w1": ["the", "the", "the"],
            "w2": ["cat", "cat", "dog"],
            "occ": pd.Series([half, half, 10], dtype="int64"),
        }
    )
    out = score_bucket(g).set_index("doc_id")
    c1 = 2 * half + 10  # global 'the'-first count
    cat_ratio = (2 * half) * SCALE // c1  # Python-int exact
    dog_ratio = 10 * SCALE // c1
    assert int(out.loc[1, "contrib"]) == half * cat_ratio
    assert int(out.loc[2, "contrib"]) == half * cat_ratio
    assert int(out.loc[3, "contrib"]) == 10 * dog_ratio
    assert 0 < cat_ratio < SCALE  # a wrapped int64 would be negative


def test_hll_error_bound_and_merge():
    """HLL estimate within 3x standard error (~5% at p=12) across
    magnitudes; merging per-chunk sketches equals the bulk sketch
    register-for-register."""
    from rayxtract.sketch import HyperLogLog

    for n in (50, 1000, 30000):
        h = HyperLogLog(12)
        h.update_many([f"it{i}" for i in range(n)])
        est = h.estimate()
        assert abs(est - n) / n < 0.05, (n, est)

    chunks = [[f"v{i}" for i in range(lo, lo + 4000)] for lo in range(0, 12000, 4000)]
    merged = HyperLogLog(12)
    for c in chunks:
        part = HyperLogLog(12)
        part.update_many(c)
        merged.merge(part)
    bulk = HyperLogLog(12)
    bulk.update_many([x for c in chunks for x in c])
    assert (merged.regs == bulk.regs).all()


def test_hll_int_items_canonical_encoding():
    """Integer items hash their VALUE (8-byte big-endian), not a
    zero-buffer of magnitude-as-length — large 64-bit ids must be cheap
    and distinct values must land on distinct registers statistically."""
    from rayxtract.sketch import HyperLogLog

    big_ids = [10**15 + i for i in range(5000)]  # bytes(10**15) would OOM
    h = HyperLogLog(12)
    h.update_many(big_ids)
    est = h.estimate()
    assert abs(est - 5000) / 5000 < 0.05, est

    # numpy ints and Python ints of the same value are the same item
    a, b = HyperLogLog(12), HyperLogLog(12)
    a.update_many([int(x) for x in range(1000)])
    b.update_many(list(np.arange(1000, dtype=np.int64)))
    assert (a.regs == b.regs).all()

    with pytest.raises(TypeError):
        HyperLogLog(12).update_many([3.14])


def test_bloom_no_false_negatives_and_fp_bound():
    """Every inserted fingerprint is found (the guarantee decontaminate's
    prefilter relies on); false-positive rate on non-members stays near
    the theoretical (1-e^{-kn/m})^k for the chosen geometry."""
    from rayxtract.sketch import BloomFilter

    rng = np.random.RandomState(2)
    members = np.unique(rng.randint(-(2**62), 2**62, size=20_000).astype(np.int64))
    bf = BloomFilter(1 << 18, k=7)
    bf.add_many(members)
    assert bf.contains_many(members).all()

    others = rng.randint(-(2**62), 2**62, size=50_000).astype(np.int64)
    others = others[~np.isin(others, members)]
    observed_fp = float(bf.contains_many(others).mean())
    assert observed_fp < 0.02
    # fp_rate() (from actual fill ratio) tracks the observed rate
    assert observed_fp <= 3 * bf.fp_rate() + 1e-3


def test_bloom_merge_equals_bulk():
    """OR-merging per-chunk blooms is bit-identical to one bulk bloom —
    the partial-merge-tree contract."""
    from rayxtract.sketch import BloomFilter

    rng = np.random.RandomState(3)
    data = rng.randint(-(2**62), 2**62, size=9_000).astype(np.int64)
    merged = BloomFilter(1 << 16, k=5)
    for chunk in np.array_split(data, 7):
        part = BloomFilter(1 << 16, k=5)
        part.add_many(chunk)
        merged.merge(part)
    bulk = BloomFilter(1 << 16, k=5)
    bulk.add_many(data)
    assert (merged.bits == bulk.bits).all()


def test_bloom_geometry_and_empty():
    import pytest

    from rayxtract.sketch import BloomFilter

    with pytest.raises(ValueError):
        BloomFilter(1000)  # not a power of two
    with pytest.raises(ValueError):
        BloomFilter(1 << 16, k=0)
    a = BloomFilter(1 << 16, k=5)
    b = BloomFilter(1 << 17, k=5)
    with pytest.raises(ValueError):
        a.merge(b)
    a.add_many(np.array([], dtype=np.int64))
    assert a.fill_ratio() == 0.0
    assert a.contains_many(np.array([], dtype=np.int64)).shape == (0,)
    assert not a.contains_many(np.array([42], dtype=np.int64))[0]


def test_pmi_bigrams_matches_reference(ray_session):
    """lm.pmi_bigrams equals a single-process big-int reference over the
    same corpus — counts, marginals, N, and the floor-divided odds ratio,
    regardless of batch/bucket placement."""
    import ray.data as rd

    from rayxtract.lm import SCALE, pmi_bigrams

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(30)] + ["the", "of", "rare", "pair"]
    texts = [
        " ".join(rng.choice(vocab, rng.randint(5, 40)))
        for _ in range(200)
    ]
    # plant a high-PMI collocation: "rare pair" co-occur far above chance
    texts += ["rare pair filler"] * 8

    # reference: exact Python-int PMI over all bigrams
    c12: dict = {}
    for t in texts:
        toks = t.split()
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    c1: dict = {}
    c2: dict = {}
    for (a, b), n in c12.items():
        c1[a] = c1.get(a, 0) + n
        c2[b] = c2.get(b, 0) + n
    n_total = sum(c12.values())
    rows = [
        (a, b, n, n * n_total * SCALE // (c1[a] * c2[b]))
        for (a, b), n in c12.items()
        if n >= 5
    ]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    exp = pd.DataFrame(
        rows[:50], columns=["w1", "w2", "c12", "pmi_micro"]
    ).reset_index(drop=True)

    got = (
        pmi_bigrams(
            rd.from_pandas(pd.DataFrame({"text": texts})).repartition(7),
            min_count=5,
            k=50,
        )
        .to_pandas()
        .sort_values(["pmi_micro", "w1", "w2"], ascending=[False, True, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["w1", "w2", "c12", "pmi_micro"]].astype(
            {"c12": "int64", "pmi_micro": "int64"}
        ),
        exp.astype({"c12": "int64", "pmi_micro": "int64"}),
    )
    # the planted collocation survives min_count and makes the top-k
    planted = set(zip(got["w1"], got["w2"]))
    assert ("rare", "pair") in planted and ("pair", "filler") in planted
