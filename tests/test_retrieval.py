"""Planted-input unit tests for the retrieval family (_bm25_topk) and
cross-corpus novelty — edge cases the corpus-level oracle parity can't
plant deliberately: score ties at the k boundary, docs without query
terms, exact window-overlap counts including within-doc duplicates.
"""

import numpy as np
import pandas as pd


def _from_pandas(df, blocks=3):
    import ray.data

    return ray.data.from_pandas(df).repartition(blocks)


def test_bm25_scores_match_bruteforce_and_tiebreak(ray_session):
    from rayxtract.queries import _bm25_topk

    # 6 docs; docs 4 and 5 are word-identical -> identical integer score,
    # tie broken by id ascending inside the top-k total order
    texts = [
        "alpha beta alpha gamma",
        "beta beta beta",
        "gamma alpha",
        "delta delta delta delta",
        "alpha beta gamma",
        "alpha beta gamma",
    ]
    df = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64), "text": texts})
    terms = ("alpha", "beta")
    out = (
        _bm25_topk(lambda: _from_pandas(df), "doc_id", terms, k=4)
        .to_pandas()
        .reset_index(drop=True)
    )

    # brute-force the same integer formula
    toks = [t.split() for t in texts]
    n = len(toks)
    t_tot = sum(len(w) for w in toks)
    dfs = [sum(1 for w in toks if term in w) for term in terms]
    SCALE = 1_000_000
    exp = []
    for did, w in enumerate(toks):
        tfs = [w.count(term) for term in terms]
        if not any(tfs):
            continue
        dl = len(w)
        s = 0
        for tf, dfreq in zip(tfs, dfs):
            if tf:
                s += (22 * tf * t_tot * (2 * (n - dfreq) + 1) * SCALE) // (
                    (10 * tf * t_tot + 3 * t_tot + 9 * dl * n) * (2 * dfreq + 1)
                )
        exp.append((did, dl, s))
    exp.sort(key=lambda r: (-r[2], r[0]))
    exp = exp[:4]

    assert list(out.columns) == ["doc_id", "n_tokens", "score"]
    assert [tuple(r) for r in out.to_numpy()] == exp
    # the tie pair (docs 4, 5) must appear in id order
    ids = out["doc_id"].tolist()
    assert ids.index(4) < ids.index(5)
    # doc 3 (no query terms) never surfaces
    assert 3 not in ids


def test_cross_corpus_novelty_planted_counts(ray_session):
    from rayxtract.dedup import cross_corpus_novelty

    # w=3 windows. Old corpus defines the seen set; new docs overlap in
    # controlled ways (including a repeated window inside one doc).
    old = pd.DataFrame(
        {
            "doc_id": np.array([100, 101], dtype=np.int64),
            "text": [
                "a b c d",        # windows: "a b c", "b c d"
                "x y z",           # window:  "x y z"
            ],
        }
    )
    new = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
            "text": [
                "a b c d e",       # windows: abc*, bcd*, cde -> 3 windows, 2 seen
                "a b c a b c",     # abc*, bca, cab, abc* -> 4 windows, 2 seen
                "p q r s",         # 3 windows? no: p q r, q r s -> 0 seen
                "x y",             # < w -> no windows, no row
            ],
        }
    )
    out = (
        cross_corpus_novelty(
            _from_pandas(old), _from_pandas(new), w=3, n_buckets=4
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = {
        int(r.doc_id): (int(r.n_windows), int(r.n_seen))
        for r in out.itertuples()
    }
    assert got == {1: (3, 2), 2: (4, 2), 3: (2, 0)}


def test_bloom_prefilter_no_false_negatives(ray_session):
    """Every probe row whose key exists in the build side MUST survive
    the prefilter (bloom misses are guaranteed non-members); the
    composed inner join equals the unfiltered join exactly."""
    from rayxtract.joins import bloom_prefilter, bucketed_join

    rng = np.random.default_rng(7)
    probe = pd.DataFrame(
        {
            "k": rng.integers(0, 10_000, size=20_000).astype(np.int64),
            "v": np.arange(20_000, dtype=np.int64),
        }
    )
    build = pd.DataFrame(
        {"k2": np.arange(0, 400, dtype=np.int64), "w": np.arange(400, dtype=np.int64)}
    )  # 4% of the key space
    p_ds, b_ds = _from_pandas(probe, 4), _from_pandas(build, 2)

    pruned = bloom_prefilter(p_ds, b_ds, "k", "k2", n_bits=1 << 16)
    got = (
        bucketed_join(pruned, b_ds, "k", "k2", n_buckets=4)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    exp = (
        probe.merge(build, left_on="k", right_on="k2")
        .drop(columns=["k2"])
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)
    # the prefilter must actually prune (~96% of probe rows are misses;
    # a tiny false-positive rate is fine, keeping half is not)
    n_kept = bloom_prefilter(p_ds, b_ds, "k", "k2", n_bits=1 << 16).count()
    assert n_kept < 0.1 * len(probe)
    assert n_kept >= len(exp.drop_duplicates(subset=["k", "v"]))


def test_bloom_prefilter_string_keys(ray_session):
    from rayxtract.joins import bloom_prefilter

    probe = pd.DataFrame(
        {"u": [f"http://site{i}/p" for i in range(2000)]}
    )
    build = pd.DataFrame({"b": [f"http://site{i}/p" for i in range(0, 2000, 50)]})
    kept = (
        bloom_prefilter(
            _from_pandas(probe, 3), _from_pandas(build, 2), "u", "b",
            n_bits=1 << 14,
        )
        .to_pandas()["u"]
        .tolist()
    )
    required = set(build["b"])
    assert required <= set(kept)
    assert len(kept) < 0.2 * len(probe)


def test_bloom_prefilter_empty_build_side(ray_session):
    """An empty build side means no probe row can match: the prefilter
    must return an empty (schema-intact) probe, not crash."""
    from rayxtract.joins import bloom_prefilter

    probe = pd.DataFrame({"k": np.arange(100, dtype=np.int64)})
    build = pd.DataFrame({"k2": pd.Series([], dtype="int64")})
    out = bloom_prefilter(
        _from_pandas(probe, 2), _from_pandas(build, 1), "k", "k2",
        n_bits=1 << 12,
    ).to_pandas()
    assert len(out) == 0


def test_pq_adc_recall_floor(ray_session):
    """ADC recall gate: the synthetic embeddings are uniform randoms —
    PQ's adversarial case (no cluster structure to exploit), so 16-bit
    codes legitimately sit in the 2-3/10 recall regime. The floor that
    must ALWAYS hold: every query recovers at least one true neighbor
    (the query vector itself is in the table; its ADC distance is pure
    quantization error and stays near the top)."""
    from rayxtract.queries import QUERIES

    df = QUERIES["emb_pq_adc_recall"]("/root/testdata/sf0.001")
    assert list(df["k"]) == [10, 10]
    assert (df["n_overlap"] >= 1).all()
