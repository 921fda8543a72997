"""SemDeDup — semantic deduplication via embedding-cluster near-dup removal
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication").

The scale shape is the paper's: a spherical k-means fit partitions the
embedding space so that near-duplicate candidates are confined to one
cluster each, then the all-pairs cosine check runs ONLY within clusters —
cluster count grows with corpus size (the paper uses k=50k for LAION), so
per-cluster work stays bounded and the pair stage never sees a corpus-scale
cross product.  Ray-Data-first layout:

- **fit**: the deterministic seeded spherical k-means already used by the
  IVF index (``similarity._fit_centroids``) on the vec_id-sorted sample
  (``fit_centroids_distributed`` is the same 100 TB-scale refinement path).
- **assign** (corpus-scale, streaming): centroids quantized to int64
  MILLIONTHS ship in the task closure; each batch assigns rows by INTEGER
  argmax dot product (ties -> lowest centroid id) — integer comparisons are
  exact, so assignment is bit-identical under any batching/host BLAS.
- **within-cluster dedup**: one ``groupby(cluster)`` collect (group size
  bounded by the fit, the paper's contract), then per group a vectorized
  int64 Gram matrix over the quantized embeddings; pairs with
  ``x_i . x_j >= tau_int`` (cosine scaled by 1e12) join a union-find; each
  duplicate component KEEPS the member with the LOWEST similarity to its
  centroid (the paper's "keep the outlier" rule; ties -> lowest vec_id).

Everything after the float fit is integer arithmetic, so the result is
partitioning-proof; the sequential oracle is
``tools/make_expected.semdedup_expected``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ner_pytorch_ray.pipelines.similarity import (
    _fit_centroids,
    _load_matrix,
    fit_centroids_distributed,
    normalized_rows,
)
from ner_pytorch_ray.stages.groupby_utils import (
    collect_tuples,
    flat_map_groups,
)

Q_SCALE = 1_000_000  # embedding quantization: int64 millionths
# pair threshold on the int64 dot of two quantized unit rows (~cosine*1e12)
DEFAULT_TAU_INT = 450_000_000_000


def _quantize(M: np.ndarray) -> np.ndarray:
    return np.rint(M * Q_SCALE).astype(np.int64)


def semdedup(
    sf_dir: str,
    n_centroids: int = 8,
    tau_int: int = DEFAULT_TAU_INT,
    sample: int = 4096,
    fit: str = "auto",
    fit_threshold: int = 100_000,
    concurrency: int | tuple[int, int] = (1, 32),
) -> ray.data.Dataset:
    """Per-vector SemDeDup verdicts: (vec_id:int64, cluster:int64,
    keep:bool). ``fit`` routes like ``ivf_topk``: seeded sample k-means
    below ``fit_threshold`` corpus rows, distributed integer-partial
    refinement above."""
    path = f"{sf_dir}/embeddings.parquet"
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])

    # fit sample = rows with vec_id < sample — a pushed-down parquet read,
    # never a corpus-scale driver load (ids are assigned dense by ingest)
    _, Mfit = _load_matrix(sf_dir, max_vec_id=sample)
    C = _fit_centroids(Mfit, n_centroids)
    if fit == "distributed" or (
        fit == "auto" and ds.count() > fit_threshold
    ):
        C = fit_centroids_distributed(ds, C, concurrency=concurrency)
    Ci = _quantize(C)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "cluster": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cdot": pa.array([], type=pa.int64()),
                    "xq": pa.array([], type=pa.binary()),
                }
            )
        X = _quantize(normalized_rows(batch.column("embedding")))
        D = X @ Ci.T  # exact int64: |x|,|c| <= 1e6 per dim
        cl = np.argmax(D, axis=1)  # ties -> lowest index (numpy argmax)
        cdot = D[np.arange(len(X)), cl]
        return pa.Table.from_pydict(
            {
                "cluster": pa.array(cl.astype(np.int64)),
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "cdot": pa.array(cdot.astype(np.int64)),
                "xq": pa.array(
                    [x.astype("<i8").tobytes() for x in X],
                    type=pa.binary(),
                ),
            }
        )

    rows = ds.map_batches(assign, batch_format="pyarrow")
    groups = collect_tuples(
        rows, keys=["cluster"], value_cols=["vec_id", "cdot", "xq"]
    )

    def dedup_group(key, items) -> pa.Table:
        empty = pa.Table.from_pydict(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "cluster": pa.array([], type=pa.int64()),
                "keep": pa.array([], type=pa.bool_()),
            }
        )
        if key is None:
            return empty
        (cluster,) = key
        items = sorted(items, key=lambda r: r[0])  # by vec_id: determinism
        ids = np.array([r[0] for r in items], dtype=np.int64)
        cdots = np.array([r[1] for r in items], dtype=np.int64)
        X = np.stack([np.frombuffer(r[2], dtype="<i8") for r in items])
        n = len(ids)
        # union-find over tau-similar pairs (group bounded by the fit)
        parent = list(range(n))

        def find(a: int) -> int:
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        S = X @ X.T  # exact int64 Gram
        ai, bi = np.nonzero(np.triu(S >= tau_int, k=1))
        for a, b in zip(ai.tolist(), bi.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comps: dict[int, list[int]] = {}
        for i in range(n):
            comps.setdefault(find(i), []).append(i)
        keep = np.zeros(n, dtype=bool)
        for members in comps.values():
            # keep the member FARTHEST from the centroid (paper rule);
            # ties -> lowest vec_id (members are vec_id-sorted already)
            winner = min(members, key=lambda i: (cdots[i], ids[i]))
            keep[winner] = True
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids),
                "cluster": pa.array(
                    np.full(n, cluster, dtype=np.int64)
                ),
                "keep": pa.array(keep),
            }
        )

    return flat_map_groups(groups, dedup_group, keys=["cluster"]).sort(
        "vec_id"
    )
