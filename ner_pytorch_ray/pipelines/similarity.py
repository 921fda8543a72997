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


def list_col_f64(col) -> np.ndarray:
    """Zero-copy-path load of a fixed-dim ``list<float>`` column into an
    ``[n, dim]`` float64 matrix.

    Arrow list storage is (offsets, flat values); ``flatten()`` →
    ``to_numpy()`` → ``reshape`` touches no per-row Python objects (vs
    ``.to_pylist()``, which materializes one Python list per row — measured
    meaningfully slower at wide batches). Embedding columns have no nulls
    and a constant dim, which this helper assumes."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    vals = col.flatten().to_numpy(zero_copy_only=False)
    if vals.dtype != np.float64:
        vals = vals.astype(np.float64)
    return vals.reshape(n, -1)


def normalized_rows(col) -> np.ndarray:
    """``list_col_f64`` + out-of-place L2 row normalization (the Arrow
    buffer may be zero-copy and therefore read-only)."""
    M = list_col_f64(col)
    if not len(M):
        return M
    return M / np.linalg.norm(M, axis=1, keepdims=True)


def _load_matrix(
    sf_dir: str, max_vec_id: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side load of (a prefix of) the embeddings table, sorted by
    vec_id (so "the first n vec_ids" is well-defined regardless of parquet
    file order — the expected-parquet generator uses the same rule).

    ``max_vec_id`` pushes a row filter into the parquet read: the ANN/kNN
    entry points only need the QUERY vectors (and a bounded fit sample) on
    the driver — never the 10^12-row corpus, which streams through
    map_batches."""
    filters = [("vec_id", "<", max_vec_id)] if max_vec_id is not None else None
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=filters,
    )
    ids = np.asarray(t.column("vec_id").to_numpy())
    M = normalized_rows(t.column("embedding"))
    order = np.argsort(ids)
    return ids[order], M[order]


def _merge_topk(local: ray.data.Dataset, k: int) -> ray.data.Dataset:
    """Arrow-native per-query merge of per-block local top-ks.

    Input: (query_id, neighbor_id, score) — at most k rows per query per
    block, so each group is <= k * #blocks rows. The group travels as a
    collect aggregate and is folded vectorized inside map_batches
    (``flat_map_groups``), avoiding the per-group-UDF cost of
    ``groupby().map_groups`` documented in stages/groupby_utils.py:1-8.
    Ordering matches the former pandas merge exactly: stable sort by
    (score desc, neighbor_id asc), head(k), rank = 1..n."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    collected = collect_tuples(
        local, ["query_id"], ["neighbor_id", "score"], name="items"
    )
    empty = pa.schema(
        [
            ("query_id", pa.int64()),
            ("neighbor_id", pa.int64()),
            ("rank", pa.int64()),
        ]
    )

    def pick(key, items):
        if items is None or not items:
            return empty.empty_table()
        top = sorted(items, key=lambda x: (-x[1], x[0]))[:k]
        n = len(top)
        return pa.Table.from_pydict(
            {
                "query_id": pa.array([int(key[0])] * n, type=pa.int64()),
                "neighbor_id": pa.array(
                    [int(i) for i, _ in top], type=pa.int64()
                ),
                "rank": pa.array(range(1, n + 1), type=pa.int64()),
            }
        )

    return flat_map_groups(collected, pick, ["query_id"], items_col="items")


def knn_topk(
    sf_dir: str, n_queries: int = 10, k: int = 5
) -> ray.data.Dataset:
    """Top-k cosine neighbors for the first ``n_queries`` vec_ids.

    The *corpus* streams (map_batches over the embeddings table); the small
    query matrix is broadcast (driver reads ONLY the query rows via a
    pushed-down parquet filter). Each batch emits its local top-k per
    query; a final per-query groupby merges local top-ks (classic
    distributed top-k: shuffle moves n_queries * k rows per block, not the
    corpus). Output: (query_id, neighbor_id, rank) — integers only.
    """
    q_ids, Q = _load_matrix(sf_dir, max_vec_id=n_queries)
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
            C = normalized_rows(batch.column("embedding"))
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

    return _merge_topk(local, k)


# ------------------------------------------------------------------ LSH ANN
def _hyperplanes(dim: int, n_bits: int, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_bits, dim)).astype(np.float64)


def _popcount16_lut() -> np.ndarray:
    """16-bit popcount lookup table (vectorized hamming for sigs <= 64 bits)."""
    v = np.arange(1 << 16, dtype=np.uint16)
    c = np.zeros(1 << 16, dtype=np.uint8)
    while v.any():
        c += (v & 1).astype(np.uint8)
        v >>= 1
    return c


def _popcount(x: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array via 4x16-bit LUT chunks."""
    x = x.astype(np.uint64)
    out = lut[(x & np.uint64(0xFFFF)).astype(np.uint32)].astype(np.int64)
    for shift in (16, 32, 48):
        out += lut[((x >> np.uint64(shift)) & np.uint64(0xFFFF)).astype(np.uint32)]
    return out


def ann_lsh_topk(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 5,
    n_bits: int = 12,
    max_probe_distance: int = 2,
    n_bands: int = 4,
) -> ray.data.Dataset:
    """Approximate top-k: random-hyperplane signatures; each query scores
    only candidates within ``max_probe_distance`` signature bits.

    Bucket-native shape (no per-query corpus scan): signatures split into
    ``n_bands`` bands; a pair within hamming ``max_d < n_bands`` agrees
    EXACTLY on >= n_bands - max_d bands (pigeonhole), so candidates are
    found by an in-batch hash-join of corpus band keys against the
    broadcast query band index — cost is proportional to bucket collisions,
    not n_queries x batch_rows, and the output is IDENTICAL to the
    exhaustive hamming scan. Hamming verification is LUT-popcount
    vectorized. The corpus streams; only (band_key -> query rows) dicts are
    broadcast — the same shape works at 10^12 corpus rows with the query
    set sharded if it outgrows a broadcast.
    """
    assert max_probe_distance < n_bands
    q_ids, Q = _load_matrix(sf_dir, max_vec_id=n_queries)
    H = _hyperplanes(Q.shape[1], n_bits)
    q_sigs = (Q @ H.T > 0).astype(np.uint64)
    q_keys = np.zeros(len(q_ids), dtype=np.uint64)
    for b in range(n_bits):
        q_keys |= q_sigs[:, b] << np.uint64(b)
    q_ref = ray.put((q_ids, Q, q_keys))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    # band boundaries: n_bits split as evenly as possible
    widths = [n_bits // n_bands + (1 if b < n_bits % n_bands else 0)
              for b in range(n_bands)]
    shifts = np.cumsum([0] + widths[:-1]).tolist()

    def _band_keys(keys: np.ndarray, band: int) -> np.ndarray:
        mask = np.uint64((1 << widths[band]) - 1)
        return (keys >> np.uint64(shifts[band])) & mask

    class BucketTopK:
        def __init__(self, q_ref, k, max_d):
            self.q_ids, self.Q, self.q_keys = ray.get(q_ref)
            self.k, self.max_d = k, max_d
            self.lut = _popcount16_lut()
            # per-band inverted index: band_key -> query row indices
            self.band_idx = []
            for band in range(n_bands):
                bk = _band_keys(self.q_keys, band)
                order = np.argsort(bk, kind="stable")
                uniq, starts = np.unique(bk[order], return_index=True)
                d = {
                    int(u): order[s:e]
                    for u, s, e in zip(
                        uniq, starts, list(starts[1:]) + [len(order)]
                    )
                }
                self.band_idx.append(d)

        def __call__(self, batch: pa.Table) -> pa.Table:
            c_ids = np.asarray(batch.column("vec_id").to_numpy())
            C = normalized_rows(batch.column("embedding"))
            sigs = (C @ H.T > 0).astype(np.uint64)
            keys = np.zeros(len(c_ids), dtype=np.uint64)
            for b in range(H.shape[0]):
                keys |= sigs[:, b] << np.uint64(b)

            # hash-join corpus band keys against the query band index
            pair_q: list[np.ndarray] = []
            pair_c: list[np.ndarray] = []
            for band in range(n_bands):
                idx = self.band_idx[band]
                bk = _band_keys(keys, band)
                order = np.argsort(bk, kind="stable")
                uniq, starts = np.unique(bk[order], return_index=True)
                ends = list(starts[1:]) + [len(order)]
                for u, s, e in zip(uniq, starts, ends):
                    qrows = idx.get(int(u))
                    if qrows is None:
                        continue
                    crows = order[s:e]
                    pair_q.append(np.repeat(qrows, len(crows)))
                    pair_c.append(np.tile(crows, len(qrows)))
            if not pair_q:
                return pa.Table.from_pydict(
                    {
                        "query_id": pa.array([], type=pa.int64()),
                        "neighbor_id": pa.array([], type=pa.int64()),
                        "score": pa.array([], type=pa.float64()),
                    }
                )
            qi = np.concatenate(pair_q)
            ci = np.concatenate(pair_c)
            # dedup pairs found via several bands
            key = qi.astype(np.int64) * len(c_ids) + ci
            _, first = np.unique(key, return_index=True)
            qi, ci = qi[first], ci[first]
            # vectorized hamming verify + self-exclusion
            ham = _popcount(self.q_keys[qi] ^ keys[ci], self.lut)
            keep = (ham <= self.max_d) & (self.q_ids[qi] != c_ids[ci])
            qi, ci = qi[keep], ci[keep]
            if not len(qi):
                return pa.Table.from_pydict(
                    {
                        "query_id": pa.array([], type=pa.int64()),
                        "neighbor_id": pa.array([], type=pa.int64()),
                        "score": pa.array([], type=pa.float64()),
                    }
                )
            s = np.einsum("ij,ij->i", self.Q[qi], C[ci])
            # per-query local top-k: sort (query, -score, neighbor_id)
            order = np.lexsort((c_ids[ci], -s, qi))
            qi, ci, s = qi[order], ci[order], s[order]
            # rank within query, keep rank < k
            starts = np.r_[0, np.nonzero(np.diff(qi))[0] + 1]
            rank = np.arange(len(qi)) - np.repeat(
                starts, np.diff(np.r_[starts, len(qi)])
            )
            keep = rank < self.k
            return pa.Table.from_pydict(
                {
                    "query_id": pa.array(
                        self.q_ids[qi[keep]], type=pa.int64()
                    ),
                    "neighbor_id": pa.array(c_ids[ci[keep]], type=pa.int64()),
                    "score": pa.array(s[keep], type=pa.float64()),
                }
            )

    local = ds.map_batches(
        BucketTopK, fn_constructor_args=(q_ref, k, max_probe_distance),
        concurrency=(1, 32), batch_format="pyarrow",
    )

    return _merge_topk(local, k)


# ------------------------------------------------------------------ IVF ANN
def _fit_centroids(
    M: np.ndarray, n_centroids: int, n_iter: int = 5, seed: int = 23
) -> np.ndarray:
    """Deterministic spherical k-means on (a sample of) the corpus.

    At 10^12 rows the fit input is a driver-side SAMPLE (standard IVF
    practice — centroid quality needs ~100x n_centroids vectors, not the
    corpus); assignment stays fully distributed. Seeded init + fixed
    iteration count => bit-reproducible centroids."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(M), size=min(len(M), n_centroids), replace=False)
    C = M[np.sort(idx)].copy()
    for _ in range(n_iter):
        assign = np.argmax(M @ C.T, axis=1)
        for c in range(len(C)):
            members = M[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[c] = v / n
    return C


_FIT_SCALE = 1_000_000_000


def fit_centroids_distributed(
    ds: ray.data.Dataset,
    init: np.ndarray,
    n_iter: int = 5,
    concurrency: int | tuple[int, int] = (1, 32),
) -> np.ndarray:
    """Distributed spherical k-means refinement (the 100 TB fit path).

    Each iteration is ONE streaming pass over the embeddings Dataset: a
    per-batch assignment matmul against the broadcast centroids, then
    per-centroid partial sums quantized to INTEGER billionths — integer
    addition is order-independent, so the fitted centroids are
    bit-identical under any partitioning / CPU count (property-tested).
    The shuffle-free reduce moves n_centroids rows per batch (vector sums
    as binary cells), never corpus rows."""
    C = init.astype(np.float64).copy()
    n_c, dim = C.shape

    class AssignPartials:
        def __init__(self, c_ref):
            self.C = ray.get(c_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            M = normalized_rows(batch.column("embedding"))
            if not len(M):
                return pa.Table.from_pydict(
                    {
                        "centroid": pa.array([], type=pa.int32()),
                        "n": pa.array([], type=pa.int64()),
                        "vsum": pa.array([], type=pa.binary()),
                    }
                )
            assign = np.argmax(M @ self.C.T, axis=1)
            cents, counts = np.unique(assign, return_counts=True)
            # quantize per ROW, then sum integers: a per-batch float sum
            # would make the rounded partial depend on batch composition
            Mi = np.rint(M * _FIT_SCALE).astype(np.int64)
            sums = [
                Mi[assign == c].sum(axis=0).astype("<i8").tobytes()
                for c in cents
            ]
            return pa.Table.from_pydict(
                {
                    "centroid": pa.array(cents.astype(np.int32)),
                    "n": pa.array(counts.astype(np.int64)),
                    "vsum": pa.array(sums, type=pa.binary()),
                }
            )

    for _ in range(n_iter):
        c_ref = ray.put(C)
        parts = ds.map_batches(
            AssignPartials,
            fn_constructor_args=(c_ref,),
            concurrency=concurrency,
            batch_format="pyarrow",
        )
        tot = np.zeros((n_c, dim), dtype=np.int64)
        cnt = np.zeros(n_c, dtype=np.int64)
        for b in parts.iter_batches(batch_format="pyarrow"):
            for c, n, blob in zip(
                b.column("centroid").to_pylist(),
                b.column("n").to_pylist(),
                b.column("vsum").to_pylist(),
            ):
                tot[c] += np.frombuffer(blob, dtype="<i8")
                cnt[c] += n
        for c in range(n_c):
            if cnt[c]:
                v = tot[c].astype(np.float64) / _FIT_SCALE
                nrm = np.linalg.norm(v)
                if nrm > 0:
                    C[c] = v / nrm
    return C


def ivf_topk(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    sample: int = 4096,
    fit: str = "auto",
    fit_threshold: int = 100_000,
) -> ray.data.Dataset:
    """IVF (inverted-file) approximate top-k — the centroid-bucketed scale
    path next to the LSH one.

    Fit (``fit=``): "sample" = seeded spherical k-means on a bounded
    driver-side sample (the first ``sample`` vec_ids after the vec_id
    sort — deterministic); "distributed" = the same seeded init refined by
    ``fit_centroids_distributed`` streaming passes over the WHOLE corpus
    (integer-billionths partials — bit-deterministic under partitioning);
    "auto" routes by corpus row count (metadata only): sample below
    ``fit_threshold`` rows, distributed above. Probe: each query scores
    only corpus rows whose nearest centroid is among the query's
    ``n_probe`` closest centroids — per batch a vectorized
    centroid-assignment matmul plus one masked score matmul per probe
    bucket. The corpus streams; shuffle-free (local top-k rows merge per
    query, exactly like knn_topk).
    """
    ids, M = _load_matrix(sf_dir, max_vec_id=max(sample, n_queries))
    C = _fit_centroids(M[:sample], n_centroids)
    if fit == "auto":
        n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
        fit = "distributed" if n_rows > fit_threshold else "sample"
    if fit == "distributed":
        corpus = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["embedding"]
        )
        C = fit_centroids_distributed(corpus, C)
    elif fit != "sample":
        raise ValueError(f"unknown fit mode {fit!r}")
    q_mask = ids < n_queries
    q_ids, Q = ids[q_mask], M[q_mask]
    # per-query probe sets: n_probe nearest centroids
    probe = np.argsort(-(Q @ C.T), axis=1, kind="stable")[:, :n_probe]
    q_ref = ray.put((q_ids, Q, probe))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    class IvfTopK:
        def __init__(self, q_ref, C, k):
            self.q_ids, self.Q, self.probe = ray.get(q_ref)
            self.C, self.k = C, k
            # centroid -> query rows probing it (inverted probe index)
            self.by_centroid: dict[int, np.ndarray] = {}
            for c in range(len(C)):
                rows = np.nonzero((self.probe == c).any(axis=1))[0]
                if len(rows):
                    self.by_centroid[c] = rows

        def __call__(self, batch: pa.Table) -> pa.Table:
            c_ids = np.asarray(batch.column("vec_id").to_numpy())
            Cm = normalized_rows(batch.column("embedding"))
            assign = np.argmax(Cm @ self.C.T, axis=1)
            out_q, out_n, out_s = [], [], []
            for c in np.unique(assign):
                qrows = self.by_centroid.get(int(c))
                if qrows is None:
                    continue
                rows = np.nonzero(assign == c)[0]
                S = self.Q[qrows] @ Cm[rows].T  # [nq_probe, n_bucket]
                S[self.q_ids[qrows][:, None] == c_ids[rows][None, :]] = -np.inf
                for qi_local in range(len(qrows)):
                    s = S[qi_local]
                    order = np.lexsort((c_ids[rows], -s))[: self.k]
                    sel = order[np.isfinite(s[order])]
                    out_q.extend([int(self.q_ids[qrows[qi_local]])] * len(sel))
                    out_n.extend(c_ids[rows][sel].tolist())
                    out_s.extend(s[sel].tolist())
            return pa.Table.from_pydict(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "neighbor_id": pa.array(out_n, type=pa.int64()),
                    "score": pa.array(out_s, type=pa.float64()),
                }
            )

    local = ds.map_batches(
        IvfTopK, fn_constructor_args=(q_ref, C, k), concurrency=(1, 32),
        batch_format="pyarrow",
    )

    return _merge_topk(local, k)


# ------------------------------------------------------------------- PQ ANN
def _fit_pq_codebooks(
    M: np.ndarray, n_subq: int, n_codes: int, n_iter: int = 8, seed: int = 31
) -> np.ndarray:
    """[n_subq, n_codes, d] product-quantization codebooks (Jegou et al.
    2011): per subspace, seeded k-means on the (driver-side, bounded)
    sample. Deterministic: seeded init, fixed iterations."""
    D = M.shape[1]
    assert D % n_subq == 0
    d = D // n_subq
    books = []
    for s in range(n_subq):
        sub = M[:, s * d : (s + 1) * d]
        rng = np.random.RandomState(seed + s)
        idx = rng.choice(len(sub), size=min(len(sub), n_codes), replace=False)
        C = sub[np.sort(idx)].copy()
        for _ in range(n_iter):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(C)):
                members = sub[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append(C)
    return np.stack(books)


def pq_encode(M: np.ndarray, books: np.ndarray) -> np.ndarray:
    """[n, n_subq] uint8 PQ codes: per subspace, nearest codebook entry
    (argmin squared distance, vectorized)."""
    n_subq, n_codes, d = books.shape
    codes = np.empty((len(M), n_subq), dtype=np.uint8)
    for s in range(n_subq):
        sub = M[:, s * d : (s + 1) * d]
        # argmin |x - c|^2 == argmax (x.c - |c|^2/2)
        sc = sub @ books[s].T - 0.5 * (books[s] ** 2).sum(axis=1)[None, :]
        codes[:, s] = np.argmax(sc, axis=1)
    return codes


def pq_topk(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 5,
    n_subq: int = 4,
    n_codes: int = 16,
    sample: int = 4096,
) -> ray.data.Dataset:
    """PQ/ADC approximate top-k — the third ANN family beside banded-LSH
    and IVF, and the memory-bound scale path: the corpus collapses to
    ``n_subq`` bytes per vector (here 4 B vs 8*dim B), so a 10^12-row
    index fits RAM where raw vectors cannot.

    Fit: per-subspace codebooks on the bounded driver sample (seeded —
    deterministic). Search: asymmetric distance computation — each query
    precomputes a [n_subq, n_codes] inner-product lookup table ONCE
    (broadcast with the codebooks); each corpus batch is PQ-encoded and
    scored by pure table lookups + a fixed-order sum over n_subq float64
    terms (no query-corpus matmul), so scores are bit-deterministic under
    any batching. Local top-k rows merge per query like knn_topk."""
    ids, M = _load_matrix(sf_dir, max_vec_id=max(sample, n_queries))
    books = _fit_pq_codebooks(M[:sample], n_subq, n_codes)
    q_mask = ids < n_queries
    q_ids, Q = ids[q_mask], M[q_mask]
    n_sq, n_c, d = books.shape
    # per-query ADC tables: lut[q, s, c] = Q[q]_s . books[s, c].
    # Built one query at a time with the SAME einsum expression the
    # sequential oracle uses — a single batched einsum can sum in a
    # different order and drift the last ulp.
    lut = np.stack(
        [
            np.einsum("sd,scd->sc", q.reshape(n_sq, d), books)
            for q in Q
        ]
    )
    state = ray.put((q_ids, lut, books))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    class PqTopK:
        def __init__(self, state, k):
            self.q_ids, self.lut, self.books = ray.get(state)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            c_ids = np.asarray(batch.column("vec_id").to_numpy())
            C = normalized_rows(batch.column("embedding"))
            if not len(C):
                return pa.Table.from_pydict(
                    {
                        "query_id": pa.array([], type=pa.int64()),
                        "neighbor_id": pa.array([], type=pa.int64()),
                        "score": pa.array([], type=pa.float64()),
                    }
                )
            codes = pq_encode(C, self.books)
            nq = len(self.q_ids)
            # ADC: scores[q, i] = sum_s lut[q, s, codes[i, s]]
            S = np.zeros((nq, len(C)), dtype=np.float64)
            for s in range(codes.shape[1]):
                S += self.lut[:, s, codes[:, s]]
            S[self.q_ids[:, None] == c_ids[None, :]] = -np.inf
            kk = min(self.k, S.shape[1])
            out_q, out_n, out_s = [], [], []
            for qi in range(nq):
                order = np.lexsort((c_ids, -S[qi]))[:kk]
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
        PqTopK, fn_constructor_args=(state, k), concurrency=(1, 32),
        batch_format="pyarrow",
    )

    return _merge_topk(local, k)


# ---------------------------------------------------------------------------
# Distributed PCA over the embedding table (whitening prep for ANN)
# ---------------------------------------------------------------------------

_PCA_SUM_SCALE = 1_000_000_000  # per-dim sums in billionths
_PCA_COV_SCALE = 1_000_000  # per-row outer products in millionths
_PCA_OUT_SCALE = 10_000  # reported coords/eigvals in tenth-millis


def pca_moments(
    vectors: ray.data.Dataset, col: str = "embedding"
) -> tuple[int, np.ndarray, np.ndarray]:
    """Distributed UNCENTERED moments (n, Σ round(x·1e9), Σ per-row
    round(x xᵀ·1e6)) with the repo's integer-partial determinism
    contract: both sums are order-free integer folds, so the result is
    bit-identical under any partitioning — AND mergeable across deltas
    by plain addition, which is what makes PCA state incrementally
    maintainable (pipelines/incremental.ingest_pca_delta). d x d at
    d=64 is 32 KB per block partial; the driver fold is O(#blocks)
    (tree-fold past ~1e4 blocks, the bloom/sequence-pack precedent)."""

    def partial(batch: pa.Table) -> pa.Table:
        m = np.stack(
            batch.column(col).to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        s = np.rint(m * _PCA_SUM_SCALE).astype(np.int64).sum(axis=0)
        o = np.rint(
            np.einsum("ni,nj->nij", m, m) * _PCA_COV_SCALE
        ).astype(np.int64).sum(axis=0)
        return pa.table(
            {
                "n": pa.array([len(m)], pa.int64()),
                "s": pa.array([s.tobytes()], pa.binary()),
                "m": pa.array([o.tobytes()], pa.binary()),
            }
        )

    n, s, m = 0, None, None
    for row in vectors.map_batches(
        partial, batch_format="pyarrow", batch_size=1024
    ).take_all():
        sv = np.frombuffer(row["s"], dtype=np.int64)
        mv = np.frombuffer(row["m"], dtype=np.int64)
        s = sv.copy() if s is None else s + sv
        m = mv.copy() if m is None else m + mv
        n += row["n"]
    return n, s, m


def pca_cov_from_moments(
    n: int, s: np.ndarray, m: np.ndarray
) -> np.ndarray:
    """Finalize: C = M/1e6/n − μμᵀ with μ = S/1e9/n — one deterministic
    driver-side float expression over the folded integers."""
    d = len(s)
    mu = s.astype(np.float64) / _PCA_SUM_SCALE / n
    return m.reshape(d, d).astype(np.float64) / _PCA_COV_SCALE / n - np.outer(
        mu, mu
    )


def _pca_covariance(sf_dir: str) -> tuple[np.ndarray, int]:
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )
    n, s, m = pca_moments(ds)
    return pca_cov_from_moments(n, s, m), n


def pca_sign_fix(v: np.ndarray) -> np.ndarray:
    """Deterministic eigenvector orientation: flip so the first
    coordinate with |value| > 1e-9 is positive."""
    for x in v:
        if abs(x) > 1e-9:
            return v if x > 0 else -v
    return v


def pca_components(sf_dir: str, k: int = 2) -> ray.data.Dataset:
    """Top-k principal components of the embedding table — the
    whitening / dimensionality-reduction preprocessor in front of the
    ANN stack (IVF/PQ train better in the rotated basis).

    The heavy work is the two distributed integer-partial passes in
    :func:`_pca_covariance`; the eigendecomposition runs driver-side on
    the d x d reduction (d = 64 here; the pattern holds to d ~ few
    thousand, past which power iteration over the same partials takes
    over). Output coordinates and eigenvalues are rounded to 1e-4 —
    coarse enough to absorb cross-host LAPACK last-bit drift, the
    neural_epoch_loss host-portability lesson."""
    cov, _n = _pca_covariance(sf_dir)
    return pca_table_from_cov(cov, k)


def pca_table_from_cov(cov: np.ndarray, k: int) -> ray.data.Dataset:
    """eigh + deterministic sign/rounding -> the component table."""
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps, dims, vals, eigs = [], [], [], []
    for rank, idx in enumerate(order):
        vec = pca_sign_fix(v[:, idx])
        for j, x in enumerate(vec):
            comps.append(rank)
            dims.append(j)
            vals.append(int(np.rint(x * _PCA_OUT_SCALE)))
            eigs.append(int(np.rint(w[idx] * _PCA_OUT_SCALE)))
    return ray.data.from_arrow(
        pa.table(
            {
                "component": pa.array(comps, pa.int64()),
                "dim_idx": pa.array(dims, pa.int64()),
                "value_tm": pa.array(vals, pa.int64()),
                "eigval_tm": pa.array(eigs, pa.int64()),
            }
        )
    )


# -------------------------------------------------------------- IVF-PQ ANN
def ivfpq_topk(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_subq: int = 4,
    n_codes: int = 16,
    sample: int = 4096,
) -> ray.data.Dataset:
    """IVF-PQ approximate top-k — the composite that production ANN
    (FAISS IVFPQ, Jegou et al. 2011) actually ships at 10^12 rows: the
    IVF coarse partition bounds WHICH rows each query scores (n_probe of
    n_centroids lists) while PQ codes over the CENTROID RESIDUALS bound
    the BYTES per row (n_subq codes vs 8*dim raw), so the index is both
    compute- and memory-feasible where either alone is not.

    Deterministic contract: seeded sample fits for centroids and
    residual codebooks; score(q, x) = q.C[a(x)] + sum_s lut[q][s][code]
    accumulated in fixed subspace order (float64), self-matches masked,
    ties broken by neighbor_id — the frozen sequential oracle replays
    the identical arithmetic. The corpus streams through an actor pool
    holding (queries, luts, centroids, codebooks) from one ``ray.put``;
    shuffle-free local top-k rows merge per query like ivf/pq."""
    ids, M = _load_matrix(sf_dir, max_vec_id=max(sample, n_queries))
    C = _fit_centroids(M[:sample], n_centroids)
    assign_s = np.argmax(M[:sample] @ C.T, axis=1)
    books = _fit_pq_codebooks(M[:sample] - C[assign_s], n_subq, n_codes)
    q_mask = ids < n_queries
    q_ids, Q = ids[q_mask], M[q_mask]
    n_sq, n_c, d = books.shape
    lut = np.stack(
        [np.einsum("sd,scd->sc", q.reshape(n_sq, d), books) for q in Q]
    )
    # per-query GEMV (not one GEMM): the same expression the sequential
    # oracle evaluates, so the coarse term matches to the last ulp
    lut_c = np.stack([q @ C.T for q in Q])
    probe = np.stack(
        [
            np.argsort(-(q @ C.T), kind="stable")[:n_probe]
            for q in Q
        ]
    )
    state = ray.put((q_ids, probe, lut, lut_c))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    class IvfPqTopK:
        def __init__(self, state, C, books, k):
            self.q_ids, self.probe, self.lut, self.lut_c = ray.get(state)
            self.C, self.books, self.k = C, books, k
            self.by_centroid: dict[int, np.ndarray] = {}
            for c in range(len(C)):
                rows = np.nonzero((self.probe == c).any(axis=1))[0]
                if len(rows):
                    self.by_centroid[c] = rows

        def __call__(self, batch: pa.Table) -> pa.Table:
            c_ids = np.asarray(batch.column("vec_id").to_numpy())
            X = normalized_rows(batch.column("embedding"))
            out_q, out_n, out_s = [], [], []
            if len(X):
                a = np.argmax(X @ self.C.T, axis=1)
                codes = pq_encode(X - self.C[a], self.books)
                for c, qrows in self.by_centroid.items():
                    rows = np.nonzero(a == c)[0]
                    if not len(rows):
                        continue
                    # fixed-order ADC accumulation: coarse term, then
                    # subspace terms in ascending s — the oracle's order
                    S = np.repeat(
                        self.lut_c[qrows, c][:, None], len(rows), axis=1
                    )
                    for s in range(codes.shape[1]):
                        S += self.lut[qrows][:, s, codes[rows, s]]
                    S[
                        self.q_ids[qrows][:, None] == c_ids[rows][None, :]
                    ] = -np.inf
                    for ql in range(len(qrows)):
                        sc = S[ql]
                        order = np.lexsort((c_ids[rows], -sc))[: self.k]
                        sel = order[np.isfinite(sc[order])]
                        out_q.extend(
                            [int(self.q_ids[qrows[ql]])] * len(sel)
                        )
                        out_n.extend(c_ids[rows][sel].tolist())
                        out_s.extend(sc[sel].tolist())
            return pa.Table.from_pydict(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "neighbor_id": pa.array(out_n, type=pa.int64()),
                    "score": pa.array(out_s, type=pa.float64()),
                }
            )

    local = ds.map_batches(
        IvfPqTopK,
        fn_constructor_args=(state, C, books, k),
        concurrency=(1, 32),
        batch_format="pyarrow",
    )

    return _merge_topk(local, k)


def pca_project(sf_dir: str, k: int = 2) -> ray.data.Dataset:
    """Project every embedding row onto the top-k principal components —
    the dimensionality-reduction output PCA exists for (64 floats -> k
    coordinates per row ahead of ANN / clustering / dedup).

    Exact-integer contract: rows quantize to int64 billionths and the
    component vectors to int64 tenth-millis (their reported precision),
    so each projection is an INTEGER dot product — identical under any
    batching, GEMM shape, or host BLAS, and the frozen sequential oracle
    reproduces it exactly. Output: (vec_id, p0_i, ..., p{k-1}_i) with
    p_i in 1e-13 units (1e-9 x 1e-4)."""
    comp = pca_components(sf_dir, k=k).take_all()
    V = np.zeros((max(r["dim_idx"] for r in comp) + 1, k), dtype=np.int64)
    for r in comp:
        V[r["dim_idx"], r["component"]] = r["value_tm"]

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def project(batch: pa.Table) -> pa.Table:
        M = np.stack(
            batch.column("embedding").to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        X = np.rint(M * _PCA_SUM_SCALE).astype(np.int64)
        P = X @ V  # integer matmul — exact, order-free
        cols = {"vec_id": batch.column("vec_id")}
        for j in range(k):
            cols[f"p{j}_i"] = pa.array(P[:, j])
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow").sort("vec_id")


def ann_recall(
    sf_dir: str, n_queries: int = 10, k: int = 5
) -> ray.data.Dataset:
    """Quality evaluation of every approximate-NN variant against the
    exact brute-force baseline — recall@k, the number the ANN literature
    reports and the check that keeps "fast" honest: (method, n_hits,
    recall_ppm) with ``recall_ppm = 1e6 * |approx ∩ exact| // (q*k)``.

    All five top-k pipelines run as-is; their (query, neighbor) pairs
    are tiny (q*k rows per method) but the comparison still runs
    distributed: pairs tag with their method, union with the
    truth-tagged exact pairs, ONE keyed collect per (query, neighbor)
    (group size <= #methods+1) emits a hit row per method present
    alongside the truth, and a grouped sum folds per-method totals.
    Exact integers end to end."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
        grouped_sum,
    )

    # run the five index jobs ONE AT A TIME (each output is q*k rows, so
    # materializing is free) — unioning them lazily would execute five
    # actor-pool pipelines under one streaming plan, whose summed minimum
    # pool reservations can exceed a small node's CPUs and deadlock
    methods = {
        "ann_lsh": ann_lsh_topk(
            sf_dir, n_queries=n_queries, k=k
        ).materialize(),
        "ivf": ivf_topk(sf_dir, n_queries=n_queries, k=k).materialize(),
        "pq": pq_topk(sf_dir, n_queries=n_queries, k=k).materialize(),
        "ivfpq": ivfpq_topk(sf_dir, n_queries=n_queries, k=k).materialize(),
    }
    truth = knn_topk(sf_dir, n_queries=n_queries, k=k).materialize()

    def tag(name: str):
        def rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "query_id": batch.column("query_id"),
                    "neighbor_id": batch.column("neighbor_id"),
                    "method": pa.array(
                        [name] * len(batch), type=pa.string()
                    ),
                }
            )

        return rows

    unioned = truth.map_batches(tag("truth"), batch_format="pyarrow")
    for name, ds in methods.items():
        unioned = unioned.union(
            ds.map_batches(tag(name), batch_format="pyarrow")
        )
    groups = collect_tuples(
        unioned, ["query_id", "neighbor_id"], ["method"]
    )
    hit_schema = pa.schema([("method", pa.string()), ("n_hits", pa.int64())])

    def emit(key, items) -> pa.Table:
        if items is None:
            return hit_schema.empty_table()
        names = {m for (m,) in items}
        if "truth" not in names:
            return hit_schema.empty_table()
        names.discard("truth")
        ms = sorted(names)
        return pa.table(
            {
                "method": pa.array(ms, type=pa.string()),
                "n_hits": pa.array([1] * len(ms), type=pa.int64()),
            }
        )

    hits = grouped_sum(
        flat_map_groups(groups, emit, ["query_id", "neighbor_id"]),
        ["method"],
        sum_cols=["n_hits"],
    )
    denom = n_queries * k
    all_methods = sorted(methods)

    def finish(batch: pa.Table) -> pa.Table:
        got = dict(
            zip(
                batch.column("method").to_pylist(),
                batch.column("n_hits").to_pylist(),
            )
        )
        ms = all_methods
        n = [int(got.get(m, 0)) for m in ms]
        return pa.table(
            {
                "method": pa.array(ms, type=pa.string()),
                "n_hits": pa.array(n, type=pa.int64()),
                "recall_ppm": pa.array(
                    [1_000_000 * x // denom for x in n], type=pa.int64()
                ),
            }
        )

    # the per-method totals are |methods| rows: fold them in one block so
    # zero-recall methods still appear
    return hits.repartition(1).map_batches(
        finish, batch_size=None, batch_format="pyarrow"
    )
