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
