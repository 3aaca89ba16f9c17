"""Distributed PCA vs single-machine numpy: the moment-tree fit must
reproduce the full-data covariance eigenvectors, and the projection
query must match an all-in-memory reference projection."""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _ref_pca(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps


def test_pca_fit_matches_numpy(ray_session):
    import ray.data

    from rayxtract.ann import pca_fit

    ds = ray.data.read_parquet(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    x = np.stack(ds.to_pandas()["embedding"].to_numpy()).astype(np.float64)
    mean, comps = pca_fit(ds, n_components=4)
    ref_mean, ref_comps = _ref_pca(x, 4)
    np.testing.assert_allclose(mean, ref_mean, rtol=0, atol=1e-9)
    np.testing.assert_allclose(comps, ref_comps, rtol=0, atol=1e-6)


def test_pca_project_variance_ordering(ray_session):
    """Projected variance decreases across components and dominates any
    random direction's variance (the PCA optimality property)."""
    import ray.data

    from rayxtract.ann import pca_fit, pca_project

    ds = ray.data.read_parquet(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    mean, comps = pca_fit(ds, n_components=3)
    out = pca_project(ds, mean, comps).to_pandas()
    assert list(out.columns) == ["vec_id", "pc0", "pc1", "pc2"]
    v = [out[f"pc{i}"].var(ddof=1) for i in range(3)]
    assert v[0] >= v[1] >= v[2] > 0

    x = np.stack(ds.to_pandas()["embedding"].to_numpy()).astype(np.float64)
    rng = np.random.RandomState(0)
    for _ in range(5):
        d = rng.randn(x.shape[1])
        d /= np.linalg.norm(d)
        assert v[0] >= ((x - x.mean(axis=0)) @ d).var(ddof=1) - 1e-9


def test_emb_pca_project_query(ray_session):
    """The registered query emits one int64 row per vector, deterministic
    across two runs (block layout independent up to 1e-6 scaling)."""
    from rayxtract.queries import QUERIES

    a = QUERIES["emb_pca_project"](SF_DIR).to_pandas().sort_values("vec_id")
    b = QUERIES["emb_pca_project"](SF_DIR).to_pandas().sort_values("vec_id")
    assert len(a) == len(set(a["vec_id"]))
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_kmeans_matches_dense_reference(ray_session):
    """Distributed Lloyd == dense numpy Lloyd with identical init: same
    centroids (atol bounded by float-sum reorder) and same inertia."""
    import ray.data

    from rayxtract.ann import _kmeans_init, kmeans_fit, kmeans_reference

    ds = ray.data.read_parquet(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cents, inertia = kmeans_fit(ds, k=6, n_iter=6, seed=13)
    init = _kmeans_init(ds, 6, 13, "vec_id", "embedding")
    x = np.stack(ds.to_pandas()["embedding"].to_numpy()).astype(np.float64)
    ref_cents, ref_inertia = kmeans_reference(x, init, n_iter=6)
    np.testing.assert_allclose(cents, ref_cents, rtol=0, atol=1e-9)
    assert inertia == pytest.approx(ref_inertia, rel=1e-12)


def test_kmeans_assign_partitions_all_rows(ray_session):
    """Every vector lands in exactly one cluster; assignment is the argmin
    of true squared distances (spot-checked densely)."""
    import ray.data

    from rayxtract.ann import kmeans_assign, kmeans_fit

    ds = ray.data.read_parquet(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cents, _ = kmeans_fit(ds, k=5, n_iter=4, seed=7)
    out = kmeans_assign(ds, cents).to_pandas()
    pdf = ds.to_pandas()
    assert len(out) == len(pdf)
    assert out["cluster"].between(0, 4).all()
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    d2 = (
        (x * x).sum(axis=1)[:, None]
        - 2.0 * (x @ cents.T)
        + (cents * cents).sum(axis=1)[None, :]
    )
    exp = d2.argmin(axis=1)
    got = out.set_index("vec_id").loc[pdf["vec_id"]]["cluster"].to_numpy()
    np.testing.assert_array_equal(got, exp)


def test_semdedup_prune_planted(ray_session):
    """Planted near-dup triple: identical vectors keep ONLY the min id;
    orthogonal singletons all survive. The keep rule is pairwise
    (smaller-id member at cos >= tau prunes), so the expected set is
    exact."""
    import numpy as np
    import ray.data

    from rayxtract.queries import _semdedup_keep, _semdedup_prune_ds

    rng = np.random.default_rng(5)
    base = rng.normal(size=64)
    rows = []
    for i in range(3):  # ids 10, 11, 12: near-identical POSITION (same
        # k-means cell) and cos ~ 1 (pruned by the min id)
        rows.append(
            {"vec_id": 10 + i, "embedding": base * (1.0 + 1e-4 * i)}
        )
    for i in range(40):  # background spread so k=8 cells are occupied
        rows.append(
            {"vec_id": 100 + i, "embedding": rng.normal(size=64) * 3.0}
        )
    out = (
        _semdedup_prune_ds(ray.data.from_items(rows), pin=True)
        .to_pandas()
        .set_index("vec_id")["keep"]
    )
    assert out.loc[10] == 1
    assert out.loc[11] == 0 and out.loc[12] == 0  # covered by id 10
    # kernel-level check independent of clustering
    mat = np.stack([r["embedding"] for r in rows[:3]])
    ids = np.array([10, 11, 12])
    keep = _semdedup_keep(mat, ids)
    assert keep.tolist() == [True, False, False]


def test_knn_graph_exact_planted(ray_session):
    """Planted structure: two tight pairs and noise — each planted vector's
    nearest neighbor (by quantized dot product) must be its partner; the
    graph has exactly k rows per vector with deterministic tiebreaks."""
    import numpy as np
    import ray.data

    from rayxtract.ann import knn_graph_exact

    rng = np.random.default_rng(7)
    rows = []
    a = np.abs(rng.normal(size=64)) + 2.0  # large positive => dominant dot
    b = -(np.abs(rng.normal(size=64)) + 2.0)
    rows.append({"vec_id": 1, "embedding": a})
    rows.append({"vec_id": 2, "embedding": a * 1.001})
    rows.append({"vec_id": 3, "embedding": b})
    rows.append({"vec_id": 4, "embedding": b * 1.001})
    for i in range(30):
        rows.append({"vec_id": 100 + i, "embedding": rng.normal(size=64) * 0.1})
    out = knn_graph_exact(ray.data.from_items(rows), k=3).to_pandas()
    assert (out.groupby("vec_id").size() == 3).all()
    top = (
        out.sort_values(["vec_id", "sim", "nbr_id"], ascending=[True, False, True])
        .groupby("vec_id")
        .head(1)
        .set_index("vec_id")["nbr_id"]
    )
    assert top.loc[1] == 2 and top.loc[2] == 1
    # the exact graph matches a dense numpy replay on the same codes
    from rayxtract.ann import _dim_minmax, _quantize_u8

    ds = ray.data.from_items(rows)
    mn, mx = _dim_minmax(ds)
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    codes = _quantize_u8(np.stack([r["embedding"] for r in rows]), mn, mx)
    sims = codes @ codes.T
    for i, vid in enumerate(ids):
        mask = ids != vid
        order = np.lexsort((ids[mask], -sims[i][mask]))[:3]
        exp = ids[mask][order]
        got = (
            out[out["vec_id"] == vid]
            .sort_values(["sim", "nbr_id"], ascending=[False, True])["nbr_id"]
            .to_numpy()
        )
        np.testing.assert_array_equal(got, exp)


def test_knn_graph_exact_cap(ray_session):
    import numpy as np
    import pytest
    import ray.data

    from rayxtract.ann import knn_graph_exact

    rng = np.random.default_rng(3)
    rows = [{"vec_id": i, "embedding": rng.normal(size=8)} for i in range(20)]
    with pytest.raises(ValueError, match="baseline"):
        knn_graph_exact(ray.data.from_items(rows), k=2, cap=10)


def test_knn_graph_ivf_recall_floor(ray_session):
    """The in-engine gate: mean IVF-graph recall >= 0.5 on the uniform
    sf0.001 embeddings (measured 0.579-0.598 at nprobe=4 across tiers —
    uniform vectors are the ANN worst case), and the summary row carries
    the mean."""
    from rayxtract.queries import QUERIES

    df = QUERIES["emb_knn_graph_recall"]("/root/testdata/sf0.001")
    mean_e3 = int(df.loc[df["vec_id"] == -1, "n_overlap"].iloc[0])
    assert mean_e3 >= 500, f"IVF graph recall {mean_e3}/1000 below floor"
    per = df[df["vec_id"] != -1]
    assert (per["k"] == 5).all()
    assert per["n_overlap"].between(0, 5).all()


def test_cluster_sample_balance(ray_session):
    """Cluster-balanced sampler: every cell keeps a count binomial around
    the uniform quota (exact-set determinism is gated by
    emb_cluster_sample_agreement; here we pin the balance property and
    determinism across runs)."""
    from rayxtract.queries import QUERIES

    df = QUERIES["emb_cluster_sample"]("/root/testdata/sf0.001").to_pandas()
    per = df.groupby("cluster").size()
    n = 500
    quota = (n // 4) // 8  # 15
    # binomial(n_cell, quota/n_cell): allow +-4 sigma-ish slack
    assert per.between(quota - 12, quota + 12).all(), per.to_dict()
    assert 0.15 <= len(df) / n <= 0.35
    # deterministic: identical keep set on a second run
    df2 = QUERIES["emb_cluster_sample"]("/root/testdata/sf0.001").to_pandas()
    assert set(df["vec_id"]) == set(df2["vec_id"])
