"""Approximate-nearest-neighbor search over an embedding column.

Two paths (SURVEY/driver mandate for training-data pipelines):

  * ``knn_bruteforce`` — exact cosine top-k: the query matrix is broadcast
    once via ``ray.put`` and every batch does one numpy matmul against it;
    per-batch partial top-k rows are then reduced in a tiny final groupby.
    This is the correctness baseline AND the honest small-query-set path at
    scale (compute is embarrassingly parallel; only q x k rows shuffle).
  * ``knn_ivf`` — IVF-style scale path: coarse centroids from a seeded
    sample (trained once, broadcast), every vector assigned to its nearest
    centroid partition; queries probe only ``nprobe`` partitions, so the
    scan touches a fraction of the corpus. Recall < 1.0 by design.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["knn_bruteforce", "knn_ivf"]


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def knn_bruteforce(
    ds,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Exact cosine top-k per query row. Returns (query_id, vec_id, cosine),
    k rows per query, ordered tie-break by vec_id asc."""
    import ray

    q_unit = _unit(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q_unit)

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(q_ref)
        vecs = _unit(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        ids = batch[id_col].astype("int64").to_numpy()
        sims = vecs @ q.T  # (n, nq)
        kk = min(k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for qi in range(q.shape[0]):
            col = sims[:, qi]
            # top-k by (sim desc, vec_id asc) — deterministic
            order = np.lexsort((ids, -col))[:kk]
            out_q.extend([qi] * len(order))
            out_id.extend(ids[order])
            out_sim.extend(col[order])
        return pd.DataFrame(
            {
                "query_id": pd.Series(out_q, dtype="int64"),
                id_col: pd.Series(out_id, dtype="int64"),
                "cosine": pd.Series(out_sim, dtype="float64"),
            }
        )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["cosine", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)
        return g

    partials = ds.map_batches(partial_topk, batch_format="pandas")
    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def knn_ivf(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_sample: int = 2048,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """IVF-bucketed ANN: centroids from a seeded sample, probe top-nprobe
    centroid partitions per query. Returns (query_id, vec_id, cosine)."""
    import ray

    # train coarse quantizer on a driver-side sample (small by construction)
    sample = ds.random_sample(
        min(1.0, train_sample / max(1, ds.count())), seed=seed
    ).take_all()
    mat = _unit(np.stack([np.asarray(r[vec_col]) for r in sample]).astype(np.float64))
    rng = np.random.RandomState(seed)
    cents = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(8):  # fixed-round Lloyd on the sample
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(cents.shape[0]):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    cents_ref = ray.put(cents)

    q_unit = _unit(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q_unit @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_sets = [set(map(int, row)) for row in probe]
    q_ref = ray.put((q_unit, probe_sets))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cents_ref)
        q, probes = ray.get(q_ref)
        vecs = _unit(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        ids = batch[id_col].astype("int64").to_numpy()
        assign = np.argmax(vecs @ c.T, axis=1)
        out_q, out_id, out_sim = [], [], []
        for qi in range(q.shape[0]):
            mask = np.isin(assign, list(probes[qi]))
            if not mask.any():
                continue
            sub_ids = ids[mask]
            sims = vecs[mask] @ q[qi]
            order = np.lexsort((sub_ids, -sims))[: min(k, len(sub_ids))]
            out_q.extend([qi] * len(order))
            out_id.extend(sub_ids[order])
            out_sim.extend(sims[order])
        return pd.DataFrame(
            {
                "query_id": pd.Series(out_q, dtype="int64"),
                id_col: pd.Series(out_id, dtype="int64"),
                "cosine": pd.Series(out_sim, dtype="float64"),
            }
        )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["cosine", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)

    return ds.map_batches(partial, batch_format="pandas").groupby(
        "query_id"
    ).map_groups(final_topk, batch_format="pandas")
