"""Deduplication operators over the documents table (training-data ops).

Five dedup families, all Ray-Data-first (SURVEY.md §2.7 + task brief):

  * exact          — hash-partition + per-group first (D1 analog)
  * n-gram Jaccard — exact set-similarity via shingle inverted index
                     (distributed: shingle groupby -> pair partial counts ->
                     pair groupby; integer outputs, SQL-oracle-able)
  * MinHash + LSH  — shingle -> minhash sigs -> band buckets -> candidate
                     pairs -> estimated-jaccard filter (the 100 TB path:
                     never materializes the pair matrix)
  * SimHash        — 64-bit signature, 4-band pigeonhole buckets, hamming
                     verify
  * embedding cosine — near-dup pairs over the embeddings table (brute-force
                     broadcast matmul at small scale; LSH variant in
                     similarity.py is the scale path)

Every stochastic choice is seeded/keyed (hash functions fixed by constants),
so outputs are identical under retries and any partitioning.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_SHINGLE_K = 3
_MERSENNE = (1 << 61) - 1


def _stable_u64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


def doc_shingles(text: str, k: int = _SHINGLE_K) -> np.ndarray:
    """Distinct k-token shingle hashes (uint64) of a document."""
    toks = text.split(" ")
    if len(toks) < k:
        return np.empty(0, dtype=np.uint64)
    hs = {
        _stable_u64(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)
    }
    return np.fromiter(hs, dtype=np.uint64, count=len(hs))


# ------------------------------------------------------------------ exact
def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """One row per distinct text: (keeper=min doc_id, n_copies).

    Combiner: per-block groupby on a 128-bit text digest (so the shuffle
    moves 16-byte keys, not full documents), then a small merge groupby.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["h"] = [
            hashlib.blake2b(t.encode(), digest_size=16).hexdigest()
            for t in df["text"]
        ]
        g = df.groupby("h", as_index=False).agg(
            keeper=("doc_id", "min"), n_copies=("doc_id", "size")
        )
        return pa.Table.from_pandas(g[["h", "keeper", "n_copies"]], preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("h", as_index=False).agg(
            keeper=("keeper", "min"), n_copies=("n_copies", "sum")
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .map_groups(merge, batch_format="pandas")
    )
    return merged.map_batches(
        lambda t: t.select(["keeper", "n_copies"]).set_column(
            1, "n_copies", t.column("n_copies").cast(pa.int64())
        ),
        batch_format="pyarrow",
    )


# ------------------------------------------------------- n-gram jaccard
def _shingle_rows(batch: pa.Table, k: int) -> pa.Table:
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_doc, out_sh, out_n = [], [], []
    for d, t in zip(doc_ids, texts):
        hs = doc_shingles(t, k)
        n = len(hs)
        out_doc.extend([d] * n)
        out_sh.extend(hs.tolist())
        out_n.extend([n] * n)
    return pa.Table.from_pydict(
        {
            "shingle": pa.array(out_sh, type=pa.uint64()),
            "doc_id": pa.array(out_doc, type=pa.int64()),
            "n_doc": pa.array(out_n, type=pa.int64()),
        }
    )


def _pairs_of_group(df: pd.DataFrame, max_group: int) -> pd.DataFrame:
    frames = []
    for _, g in df.groupby("shingle", sort=False):
        if len(g) < 2 or len(g) > max_group:
            continue
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        ns = g["n_doc"].to_numpy()
        ai, bi = np.triu_indices(len(ids), k=1)
        frames.append(
            pd.DataFrame(
                {
                    "doc_a": ids[ai],
                    "doc_b": ids[bi],
                    "n_a": ns[ai],
                    "n_b": ns[bi],
                    "n_shared": 1,
                }
            )
        )
    if not frames:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "n_a": pd.Series([], dtype="int64"),
                "n_b": pd.Series([], dtype="int64"),
                "n_shared": pd.Series([], dtype="int64"),
            }
        )
    out = pd.concat(frames, ignore_index=True)
    # block-local combine before the pair shuffle
    return out.groupby(["doc_a", "doc_b", "n_a", "n_b"], as_index=False).agg(
        n_shared=("n_shared", "sum")
    )


def ngram_jaccard_pairs(
    sf_dir: str, tau: float = 0.5, k: int = _SHINGLE_K, max_group: int = 1000
) -> ray.data.Dataset:
    """Exact near-dup pairs with |A∩B|/|A∪B| >= tau.

    Inverted-index algorithm: shingle rows -> groupby(shingle) -> per-group
    pairs (groups larger than ``max_group`` are dropped — a stop-word
    shingle would otherwise explode quadratically; at tau>=0.1 such
    shingles cannot decide a pair on their own) -> pair-count groupby ->
    jaccard filter. Integer outputs only (doc_a, doc_b, n_shared, n_a, n_b).
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    shingles = ds.map_batches(lambda b: _shingle_rows(b, k), batch_format="pyarrow")
    pair_partials = shingles.groupby("shingle").map_groups(
        lambda df: _pairs_of_group(df, max_group), batch_format="pandas"
    )

    def merge_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_a", "doc_b", "n_a", "n_b"], as_index=False).agg(
            n_shared=("n_shared", "sum")
        )
        c, na, nb = g["n_shared"], g["n_a"], g["n_b"]
        g = g[c * 1.0 / (na + nb - c) >= tau]
        return g[["doc_a", "doc_b", "n_shared", "n_a", "n_b"]]

    return pair_partials.groupby(["doc_a", "doc_b"]).map_groups(
        merge_pairs, batch_format="pandas"
    )


# ------------------------------------------------------------ minhash/LSH
_N_PERM = 64
_N_BANDS = 16  # 4 rows per band


def _perm_params(n_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(
    texts: list[str], n_perm: int = _N_PERM, k: int = _SHINGLE_K
) -> np.ndarray:
    """[n_docs, n_perm] uint64 minhash signatures (vectorized per doc)."""
    a, b = _perm_params(n_perm)
    sigs = np.full((len(texts), n_perm), _MERSENNE, dtype=np.uint64)
    for i, t in enumerate(texts):
        hs = doc_shingles(t, k)
        if len(hs) == 0:
            continue
        # universal hash: (a*x + b) mod p, vectorized [n_perm, n_shingles]
        vals = (a[:, None] * (hs[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
        sigs[i] = vals.min(axis=1)
    return sigs


def minhash_lsh_pairs(
    sf_dir: str,
    tau: float = 0.5,
    n_perm: int = _N_PERM,
    n_bands: int = _N_BANDS,
    max_bucket: int = 200,
) -> ray.data.Dataset:
    """Near-dup candidate pairs via banded MinHash, filtered by estimated
    jaccard (fraction of agreeing signature rows) >= tau.

    The scale path: signatures are ``n_perm * 8`` bytes/doc; the shuffle
    moves (band_key, doc_id, sig) rows — never shingle sets or documents.
    Output: (doc_a, doc_b) int rows.
    """
    r = n_perm // n_bands
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def band_rows(batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(batch.column("doc_id").to_numpy())
        sigs = minhash_signatures(batch.column("text").to_pylist(), n_perm)
        n = len(doc_ids)
        band_id = np.repeat(np.arange(n_bands, dtype=np.int32), n)
        doc_rep = np.tile(doc_ids, n_bands)
        keys = np.empty(n * n_bands, dtype=np.uint64)
        for bnd in range(n_bands):
            seg = sigs[:, bnd * r : (bnd + 1) * r]
            kb = np.zeros(n, dtype=np.uint64)
            for j in range(r):
                kb = kb * np.uint64(1099511628211) + seg[:, j]
            keys[bnd * n : (bnd + 1) * n] = kb
        return pa.Table.from_pydict(
            {
                "band": pa.array(band_id),
                "key": pa.array(keys, type=pa.uint64()),
                "doc_id": pa.array(doc_rep, type=pa.int64()),
                "sig": pa.array(
                    np.tile(sigs, (n_bands, 1)).tolist(), type=pa.list_(pa.uint64())
                ),
            }
        )

    bands = ds.map_batches(band_rows, batch_format="pyarrow")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in df.groupby(["band", "key"], sort=False):
            if len(g) < 2 or len(g) > max_bucket:
                continue
            g = g.sort_values("doc_id")
            ids = g["doc_id"].to_numpy()
            sigs = np.asarray(g["sig"].tolist(), dtype=np.uint64)
            ai, bi = np.triu_indices(len(ids), k=1)
            est = (sigs[ai] == sigs[bi]).mean(axis=1)
            keep = est >= tau
            out_a.extend(ids[ai[keep]].tolist())
            out_b.extend(ids[bi[keep]].tolist())
        return pd.DataFrame(
            {
                "doc_a": pd.Series(out_a, dtype="int64"),
                "doc_b": pd.Series(out_b, dtype="int64"),
            }
        )

    pairs = bands.groupby(["band", "key"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # same pair can surface from several bands -> distinct
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda df: df.drop_duplicates(), batch_format="pandas"
    )


# ---------------------------------------------------------------- simhash
def simhash64(texts: list[str]) -> np.ndarray:
    """64-bit SimHash over token multisets (uint64 per doc)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    bit_cols = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        if not toks:
            continue
        acc = np.zeros(64, dtype=np.int64)
        from collections import Counter

        for w, cnt in Counter(toks).items():
            h = np.uint64(_stable_u64(w))
            bits = ((h >> bit_cols) & np.uint64(1)).astype(np.int64)
            acc += (2 * bits - 1) * cnt
        bits = (acc > 0).astype(np.uint64)
        out[i] = np.bitwise_or.reduce(bits << bit_cols)
    return out


def simhash_pairs(
    sf_dir: str, max_hamming: int = 3, n_bands: int = 4
) -> ray.data.Dataset:
    """Near-dup pairs with hamming(simhash_a, simhash_b) <= max_hamming.

    Pigeonhole banding: split 64 bits into ``n_bands`` bands; any pair
    within ``max_hamming < n_bands`` must agree exactly on >= 1 band, so
    bucket-by-band has perfect recall. Output: (doc_a, doc_b, hamming).
    """
    assert max_hamming < n_bands
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def band_rows(batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(batch.column("doc_id").to_numpy())
        sh = simhash64(batch.column("text").to_pylist())
        n = len(doc_ids)
        band = np.repeat(np.arange(n_bands, dtype=np.int32), n)
        keys = np.concatenate(
            [(sh >> np.uint64(b * width)) & mask for b in range(n_bands)]
        )
        return pa.Table.from_pydict(
            {
                "band": pa.array(band),
                "key": pa.array(keys, type=pa.uint64()),
                "doc_id": pa.array(np.tile(doc_ids, n_bands), type=pa.int64()),
                "sim": pa.array(np.tile(sh, n_bands), type=pa.uint64()),
            }
        )

    bands = ds.map_batches(band_rows, batch_format="pyarrow")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows_a, rows_b, hams = [], [], []
        for _, g in df.groupby(["band", "key"], sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("doc_id").drop_duplicates("doc_id")
            ids = g["doc_id"].to_numpy()
            sims = g["sim"].to_numpy().astype(np.uint64)
            ai, bi = np.triu_indices(len(ids), k=1)
            x = sims[ai] ^ sims[bi]
            ham = np.array([bin(int(v)).count("1") for v in x])
            keep = ham <= max_hamming
            rows_a.extend(ids[ai[keep]].tolist())
            rows_b.extend(ids[bi[keep]].tolist())
            hams.extend(ham[keep].tolist())
        return pd.DataFrame(
            {
                "doc_a": pd.Series(rows_a, dtype="int64"),
                "doc_b": pd.Series(rows_b, dtype="int64"),
                "hamming": pd.Series(hams, dtype="int64"),
            }
        )

    pairs = bands.groupby(["band", "key"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda df: df.drop_duplicates(["doc_a", "doc_b"]), batch_format="pandas"
    )


# ------------------------------------------------------- embedding cosine
def embedding_near_dup(sf_dir: str, tau: float = 0.45) -> ray.data.Dataset:
    """All pairs (a < b) with cosine >= tau over the embeddings table.

    Small-side broadcast: the normalized matrix is ``ray.put`` once; each
    batch does one float64 matmul against it. (The LSH-bucketed variant for
    scale lives in similarity.py.)
    """
    import pyarrow.parquet as pq

    full = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.asarray(full.column("vec_id").to_numpy())
    M = np.asarray(full.column("embedding").to_pylist(), dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((ids, M))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    class PairFinder:
        def __init__(self, ref):
            self.ids, self.M = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            q_ids = np.asarray(batch.column("vec_id").to_numpy())
            Q = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
            Q /= np.linalg.norm(Q, axis=1, keepdims=True)
            S = Q @ self.M.T
            qi, mi = np.nonzero((S >= tau) & (q_ids[:, None] < self.ids[None, :]))
            return pa.Table.from_pydict(
                {
                    "vec_a": pa.array(q_ids[qi], type=pa.int64()),
                    "vec_b": pa.array(self.ids[mi], type=pa.int64()),
                }
            )

    return ds.map_batches(
        PairFinder, fn_constructor_args=(ref,), concurrency=(1, 4),
        batch_format="pyarrow",
    )
