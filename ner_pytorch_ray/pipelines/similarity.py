"""Similarity search over the embeddings table (list<float> column).

  * ``knn_topk`` — brute-force cosine top-k: the query matrix is broadcast
    once (``ray.put``) and every batch does one numpy matmul against it —
    the baseline the task brief asks for.
  * ``ann_lsh_topk`` — random-hyperplane LSH variant: candidates come only
    from matching hash buckets (multi-probe by signature distance), then
    exact re-rank. The scale path: at 10^12 rows the matmul per batch stays,
    but against per-bucket slices instead of the full matrix.

Ranks are deterministic: ties broken by vec_id ascending; scores computed
in float64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data


def _load_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_numpy())
    M = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    order = np.argsort(ids)
    return ids[order], M[order]


def knn_topk(
    sf_dir: str, n_queries: int = 10, k: int = 5
) -> ray.data.Dataset:
    """Top-k cosine neighbors for the first ``n_queries`` vec_ids.

    The *corpus* streams (map_batches over the embeddings table); the small
    query matrix is broadcast. Each batch emits its local top-k per query;
    a final per-query groupby merges local top-ks (classic distributed
    top-k: shuffle moves n_queries * k rows per block, not the corpus).
    Output: (query_id, neighbor_id, rank) — integers only.
    """
    ids, M = _load_matrix(sf_dir)
    q_mask = ids < n_queries
    q_ids, Q = ids[q_mask], M[q_mask]
    q_ref = ray.put((q_ids, Q))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    class LocalTopK:
        def __init__(self, q_ref, k):
            self.q_ids, self.Q = ray.get(q_ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            c_ids = np.asarray(batch.column("vec_id").to_numpy())
            C = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
            C /= np.linalg.norm(C, axis=1, keepdims=True)
            S = self.Q @ C.T  # [nq, nc]
            # exclude self-matches
            S[self.q_ids[:, None] == c_ids[None, :]] = -np.inf
            k = min(self.k, S.shape[1])
            out_q, out_n, out_s = [], [], []
            for qi in range(S.shape[0]):
                # deterministic local top-k: sort by (-score, vec_id)
                order = np.lexsort((c_ids, -S[qi]))[:k]
                sel = order[np.isfinite(S[qi][order])]
                out_q.extend([int(self.q_ids[qi])] * len(sel))
                out_n.extend(c_ids[sel].tolist())
                out_s.extend(S[qi][sel].tolist())
            return pa.Table.from_pydict(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "neighbor_id": pa.array(out_n, type=pa.int64()),
                    "score": pa.array(out_s, type=pa.float64()),
                }
            )

    local = ds.map_batches(
        LocalTopK, fn_constructor_args=(q_ref, k), concurrency=(1, 32),
        batch_format="pyarrow",
    )

    def merge(df):
        import pandas as pd

        out = []
        for qid, g in df.groupby("query_id", sort=False):
            g = g.sort_values(
                ["score", "neighbor_id"], ascending=[False, True], kind="stable"
            ).head(k)
            g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
            out.append(g[["query_id", "neighbor_id", "rank"]])
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    "neighbor_id": pd.Series([], dtype="int64"),
                    "rank": pd.Series([], dtype="int64"),
                }
            )
        )

    return local.groupby("query_id").map_groups(merge, batch_format="pandas")


# ------------------------------------------------------------------ LSH ANN
def _hyperplanes(dim: int, n_bits: int, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_bits, dim)).astype(np.float64)


def ann_lsh_topk(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 5,
    n_bits: int = 12,
    max_probe_distance: int = 2,
) -> ray.data.Dataset:
    """Approximate top-k: random-hyperplane signatures bucket the corpus;
    each query only scores candidates whose signature is within
    ``max_probe_distance`` bits of its own (multi-probe LSH)."""
    ids, M = _load_matrix(sf_dir)
    q_mask = ids < n_queries
    q_ids, Q = ids[q_mask], M[q_mask]
    H = _hyperplanes(M.shape[1], n_bits)
    q_sigs = (Q @ H.T > 0).astype(np.uint64)
    q_keys = np.zeros(len(q_ids), dtype=np.uint64)
    for b in range(n_bits):
        q_keys |= q_sigs[:, b] << np.uint64(b)
    q_ref = ray.put((q_ids, Q, q_keys))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    class BucketTopK:
        def __init__(self, q_ref, H, k, max_d):
            self.q_ids, self.Q, self.q_keys = ray.get(q_ref)
            self.H, self.k, self.max_d = H, k, max_d

        def __call__(self, batch: pa.Table) -> pa.Table:
            c_ids = np.asarray(batch.column("vec_id").to_numpy())
            C = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
            C /= np.linalg.norm(C, axis=1, keepdims=True)
            sigs = (C @ self.H.T > 0).astype(np.uint64)
            keys = np.zeros(len(c_ids), dtype=np.uint64)
            for b in range(self.H.shape[0]):
                keys |= sigs[:, b] << np.uint64(b)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(self.q_ids)):
                x = keys ^ self.q_keys[qi]
                ham = np.array([bin(int(v)).count("1") for v in x])
                cand = np.nonzero((ham <= self.max_d) & (c_ids != self.q_ids[qi]))[0]
                if len(cand) == 0:
                    continue
                s = C[cand] @ self.Q[qi]
                order = np.lexsort((c_ids[cand], -s))[: self.k]
                out_q.extend([int(self.q_ids[qi])] * len(order))
                out_n.extend(c_ids[cand][order].tolist())
                out_s.extend(s[order].tolist())
            return pa.Table.from_pydict(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "neighbor_id": pa.array(out_n, type=pa.int64()),
                    "score": pa.array(out_s, type=pa.float64()),
                }
            )

    local = ds.map_batches(
        BucketTopK, fn_constructor_args=(q_ref, H, k, max_probe_distance),
        concurrency=(1, 32), batch_format="pyarrow",
    )

    def merge(df):
        import pandas as pd

        out = []
        for qid, g in df.groupby("query_id", sort=False):
            g = g.sort_values(
                ["score", "neighbor_id"], ascending=[False, True], kind="stable"
            ).head(k)
            g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
            out.append(g[["query_id", "neighbor_id", "rank"]])
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    "neighbor_id": pd.Series([], dtype="int64"),
                    "rank": pd.Series([], dtype="int64"),
                }
            )
        )

    return local.groupby("query_id").map_groups(merge, batch_format="pandas")
