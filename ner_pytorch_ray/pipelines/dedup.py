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
  * embedding cosine — near-dup pairs over the embeddings table, routed by
                     corpus size: brute-force broadcast matmul below the
                     threshold, hyperplane-LSH buckets + exact in-bucket
                     verify above it (embedding_near_dup_lsh)

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

from ner_pytorch_ray.pipelines.similarity import normalized_rows

_SHINGLE_K = 3
_MERSENNE = (1 << 61) - 1


def _stable_u64(s: str) -> int:
    """Stable 63-bit hash (positive int64 — arrow/aggregate-transport safe).

    md5-based so it is DuckDB-expressible for the driver's oracle gate:
    ``CAST(md5_number_upper(s) & 9223372036854775807 AS BIGINT)`` produces
    the identical value (md5_number_upper = first 8 md5 bytes, little-endian).
    """
    v = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
    return v & 0x7FFFFFFFFFFFFFFF


def doc_shingles(text: str, k: int = _SHINGLE_K) -> np.ndarray:
    """Distinct k-token shingle hashes (int64) of a document."""
    toks = text.split(" ")
    if len(toks) < k:
        return np.empty(0, dtype=np.int64)
    hs = {
        _stable_u64(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)
    }
    return np.fromiter(hs, dtype=np.int64, count=len(hs))


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
        # the per-text blake2b is inherently a Python loop (no vectorized
        # kernel exists); the group-combine is pure Arrow — no pandas copy
        h = pa.array(
            [
                hashlib.blake2b(t.encode(), digest_size=16).hexdigest()
                for t in batch.column("text").to_pylist()
            ],
            type=pa.string(),
        )
        t2 = pa.table({"h": h, "doc_id": batch.column("doc_id").combine_chunks()})
        g = t2.group_by("h").aggregate([("doc_id", "min"), ("doc_id", "count")])
        return pa.table(
            {
                "h": g.column("h"),
                "keeper": g.column("doc_id_min").cast(pa.int64()),
                "n_copies": g.column("doc_id_count").cast(pa.int64()),
            }
        )

    from ray.data.aggregate import Min, Sum

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("keeper"), Sum("n_copies"))
    )
    return merged.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "keeper": t.column("min(keeper)").cast(pa.int64()),
                "n_copies": t.column("sum(n_copies)").cast(pa.int64()),
            }
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
            "shingle": pa.array(out_sh, type=pa.int64()),
            "doc_id": pa.array(out_doc, type=pa.int64()),
            "n_doc": pa.array(out_n, type=pa.int64()),
        }
    )


_PAIR_SCHEMA = pa.schema(
    [
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
        ("n_a", pa.int64()),
        ("n_b", pa.int64()),
        ("n_shared", pa.int64()),
    ]
)


def ngram_jaccard_pairs(
    sf_dir: str, tau: float = 0.5, k: int = _SHINGLE_K, max_group: int = 1000
) -> ray.data.Dataset:
    """Exact near-dup pairs with |A∩B|/|A∪B| >= tau.

    Inverted-index algorithm: shingle rows -> collect (doc_id, n_doc) per
    shingle (aggregate, not per-group UDF) -> vectorized pair generation ->
    pair-count groupby-sum -> jaccard filter. Groups larger than
    ``max_group`` are dropped (a stop-word shingle would explode
    quadratically; at tau>=0.1 it cannot decide a pair alone). Integer
    outputs only (doc_a, doc_b, n_shared, n_a, n_b).
    """
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
        grouped_sum,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    shingles = ds.map_batches(lambda b: _shingle_rows(b, k), batch_format="pyarrow")
    collected = collect_tuples(shingles, ["shingle"], ["doc_id", "n_doc"])

    def gen_pairs(key, items) -> pa.Table:
        if items is None or len(items) < 2 or len(items) > max_group:
            return _PAIR_SCHEMA.empty_table()
        items = sorted({tuple(x) for x in items})
        ids = np.array([d for d, _ in items], dtype=np.int64)
        ns = np.array([n for _, n in items], dtype=np.int64)
        ai, bi = np.triu_indices(len(ids), k=1)
        return pa.Table.from_arrays(
            [
                pa.array(ids[ai]),
                pa.array(ids[bi]),
                pa.array(ns[ai]),
                pa.array(ns[bi]),
                pa.array(np.ones(len(ai), dtype=np.int64)),
            ],
            schema=_PAIR_SCHEMA,
        )

    pair_partials = flat_map_groups(collected, gen_pairs, ["shingle"])
    merged = grouped_sum(
        pair_partials, ["doc_a", "doc_b", "n_a", "n_b"], sum_cols=["n_shared"]
    )

    def jac_filter(t: pa.Table) -> pa.Table:
        c = t.column("n_shared").to_numpy()
        na = t.column("n_a").to_numpy()
        nb = t.column("n_b").to_numpy()
        mask = c * 1.0 / (na + nb - c) >= tau
        return t.filter(pa.array(mask)).select(
            ["doc_a", "doc_b", "n_shared", "n_a", "n_b"]
        )

    return merged.map_batches(jac_filter, batch_format="pyarrow")


# ------------------------------------------------------------ minhash/LSH
_N_PERM = 64
_N_BANDS = 16  # 4 rows per band


def _perm_params(n_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    # a < 2^31 and x < 2^32 keep a*x + b < 2^63: exact int64 arithmetic
    a = rng.randint(1, 2**31, size=n_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64)
    return a, b


def minhash_signatures(
    texts: list[str], n_perm: int = _N_PERM, k: int = _SHINGLE_K
) -> np.ndarray:
    """[n_docs, n_perm] int64 minhash signatures (vectorized per doc).

    Docs with no shingles (< k tokens) keep the all-sentinel row; callers
    banding signatures must EXCLUDE them (an empty shingle set has no
    meaningful jaccard and two such docs would otherwise always pair)."""
    a, b = _perm_params(n_perm)
    sigs = np.full((len(texts), n_perm), _MERSENNE, dtype=np.int64)
    for i, t in enumerate(texts):
        hs = doc_shingles(t, k)
        if len(hs) == 0:
            continue
        x = hs & 0xFFFFFFFF  # 32-bit shingle identity (exact in int64)
        # universal hash: (a*x + b) mod p, vectorized [n_perm, n_shingles]
        vals = (a[:, None] * x[None, :] + b[:, None]) % _MERSENNE
        sigs[i] = vals.min(axis=1)
    return sigs


def minhash_band_rows_fn(n_perm: int = _N_PERM, n_bands: int = _N_BANDS):
    """Per-batch kernel: documents -> (band, key, doc_id, sig) band rows.
    Pure function of each document's text (no corpus state), so band rows
    from disjoint crawl deltas UNION to exactly the batch band table — the
    property the incremental minhash ingestion builds on."""
    r = n_perm // n_bands

    def band_rows(batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(batch.column("doc_id").to_numpy())
        texts = batch.column("text").to_pylist()
        sigs = minhash_signatures(texts, n_perm)
        # shingle-less docs (< k tokens) have no jaccard identity: drop
        # before banding (matches the shingle-set oracle semantics)
        has = np.array(
            [len(t.split(" ")) >= _SHINGLE_K for t in texts], dtype=bool
        )
        doc_ids, sigs = doc_ids[has], sigs[has]
        n = len(doc_ids)
        band_id = np.repeat(np.arange(n_bands, dtype=np.int32), n)
        doc_rep = np.tile(doc_ids, n_bands)
        keys = np.empty(n * n_bands, dtype=np.int64)
        for bnd in range(n_bands):
            seg = sigs[:, bnd * r : (bnd + 1) * r].astype(np.uint64)
            kb = np.zeros(n, dtype=np.uint64)
            for j in range(r):
                kb = kb * np.uint64(1099511628211) + seg[:, j]
            # 63-bit band key: int64-transportable through aggregates
            keys[bnd * n : (bnd + 1) * n] = (
                kb & np.uint64(0x7FFFFFFFFFFFFFFF)
            ).astype(np.int64)
        # signatures travel as packed little-endian int64 bytes: one
        # binary cell per row instead of a 64-element python list (the
        # aggregate's tuple transport is ~10x lighter)
        sig_bytes = [sigs[i].astype("<i8").tobytes() for i in range(n)]
        return pa.Table.from_pydict(
            {
                "band": pa.array(band_id),
                "key": pa.array(keys, type=pa.int64()),
                "doc_id": pa.array(doc_rep, type=pa.int64()),
                "sig": pa.array(sig_bytes * n_bands, type=pa.binary()),
            }
        )

    return band_rows


def minhash_bucket_pairs_fn(
    tau: float, max_bucket: int, provenance: bool = False
):
    """Per-bucket kernel for flat_map_groups over collected (band, key)
    groups: all within-bucket pairs with estimated jaccard (agreeing
    signature fraction) >= tau; oversized buckets (> max_bucket) emit
    nothing. ``provenance=True`` adds the (band, key) columns — the
    incremental state needs pair provenance so a bucket that later
    overflows can retract exactly its own pairs."""
    if provenance:
        empty = pa.schema(
            [
                ("band", pa.int32()),
                ("key", pa.int64()),
                ("doc_a", pa.int64()),
                ("doc_b", pa.int64()),
            ]
        )
    else:
        empty = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])

    def bucket_pairs(key, items) -> pa.Table:
        if items is None or len(items) < 2 or len(items) > max_bucket:
            return empty.empty_table()
        items = sorted({(d, sg) for d, sg in items})
        ids = np.array([d for d, _ in items], dtype=np.int64)
        sigs = np.stack(
            [np.frombuffer(sg, dtype="<i8") for _, sg in items]
        )
        ai, bi = np.triu_indices(len(ids), k=1)
        est = (sigs[ai] == sigs[bi]).mean(axis=1)
        keep = est >= tau
        cols = {
            "doc_a": pa.array(ids[ai[keep]], type=pa.int64()),
            "doc_b": pa.array(ids[bi[keep]], type=pa.int64()),
        }
        if provenance:
            n_out = int(keep.sum())
            cols = {
                "band": pa.array([key[0]] * n_out, type=pa.int32()),
                "key": pa.array([key[1]] * n_out, type=pa.int64()),
                **cols,
            }
        return pa.Table.from_pydict(cols)

    return bucket_pairs


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
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    bands = ds.map_batches(
        minhash_band_rows_fn(n_perm, n_bands), batch_format="pyarrow"
    )
    collected = collect_tuples(
        bands, ["band", "key"], ["doc_id", "sig"], shuffle_blocks="auto"
    )
    pairs = flat_map_groups(
        collected, minhash_bucket_pairs_fn(tau, max_bucket), ["band", "key"]
    )
    # same pair can surface from several bands -> distinct via count-agg
    # (pair rows are few: coalesce before the shuffle)
    from ray.data.aggregate import Count

    distinct = pairs.repartition(8).groupby(["doc_a", "doc_b"]).aggregate(Count())
    return distinct.map_batches(
        lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow"
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
    from ner_pytorch_ray.pipelines.similarity import _popcount, _popcount16_lut

    assert max_hamming < n_bands
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    _SIM_LUT = _popcount16_lut()
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
        ).astype(np.int64)  # band keys < 2^width: int64-safe
        return pa.Table.from_pydict(
            {
                "band": pa.array(band),
                "key": pa.array(keys, type=pa.int64()),
                "doc_id": pa.array(np.tile(doc_ids, n_bands), type=pa.int64()),
                # two's-complement view: bit pattern preserved, int64 transport
                "sim": pa.array(np.tile(sh, n_bands).view(np.int64), type=pa.int64()),
            }
        )

    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )
    from ray.data.aggregate import Min

    bands = ds.map_batches(band_rows, batch_format="pyarrow")
    collected = collect_tuples(
        bands, ["band", "key"], ["doc_id", "sim"], shuffle_blocks="auto"
    )
    empty = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())]
    )

    def bucket_pairs(key, items) -> pa.Table:
        if items is None or len(items) < 2:
            return empty.empty_table()
        items = sorted({tuple(x) for x in items})
        ids = np.array([d for d, _ in items], dtype=np.int64)
        sims = np.array([sm for _, sm in items], dtype=np.int64)
        ai, bi = np.triu_indices(len(ids), k=1)
        # XOR on the two's-complement view == XOR on the original uint64 bits
        x = (sims[ai] ^ sims[bi]).view(np.uint64)
        ham = _popcount(x, _SIM_LUT)
        keep = ham <= max_hamming
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(ids[ai[keep]], type=pa.int64()),
                "doc_b": pa.array(ids[bi[keep]], type=pa.int64()),
                "hamming": pa.array(ham[keep], type=pa.int64()),
            }
        )

    pairs = flat_map_groups(collected, bucket_pairs, ["band", "key"])
    distinct = pairs.repartition(8).groupby(["doc_a", "doc_b"]).aggregate(Min("hamming"))
    return distinct.map_batches(
        lambda t: t.rename_columns(["doc_a", "doc_b", "hamming"]),
        batch_format="pyarrow",
    )


# ------------------------------------------------------- embedding cosine
def embedding_near_dup(
    sf_dir: str, tau: float = 0.45, lsh_threshold: int = 100_000
) -> ray.data.Dataset:
    """All pairs (a < b) with cosine >= tau over the embeddings table.

    Routed by corpus size (parquet metadata, no read):
      * n <= ``lsh_threshold``: exact O(n^2) broadcast-matmul path — the
        matrix fits a broadcast and the quadratic is cheap;
      * n  > ``lsh_threshold``: hyperplane-LSH bucketed path
        (``embedding_near_dup_lsh``) — candidates from signature-band
        buckets, exact cosine verify in-bucket; the only shuffle moves
        (band, key, vec_id, embedding) rows. Recall is probabilistic
        (documented there); both paths verify pairs exactly, so precision
        is 1 either way.
    """
    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    if n_rows > lsh_threshold:
        return embedding_near_dup_lsh(sf_dir, tau)

    full = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.asarray(full.column("vec_id").to_numpy())
    M = normalized_rows(full.column("embedding"))
    ref = ray.put((ids, M))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    class PairFinder:
        def __init__(self, ref):
            self.ids, self.M = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            q_ids = np.asarray(batch.column("vec_id").to_numpy())
            Q = normalized_rows(batch.column("embedding"))
            S = Q @ self.M.T
            qi, mi = np.nonzero((S >= tau) & (q_ids[:, None] < self.ids[None, :]))
            return pa.Table.from_pydict(
                {
                    "vec_a": pa.array(q_ids[qi], type=pa.int64()),
                    "vec_b": pa.array(self.ids[mi], type=pa.int64()),
                }
            )

    return ds.map_batches(
        PairFinder, fn_constructor_args=(ref,), concurrency=(1, 32),
        batch_format="pyarrow",
    )


def embedding_near_dup_lsh(
    sf_dir: str,
    tau: float = 0.45,
    n_bits: int = 16,
    n_bands: int = 8,
    max_bucket: int = 2000,
) -> ray.data.Dataset:
    """Hyperplane-LSH near-dup pairs — the 100 TB path.

    Each vector gets an ``n_bits`` random-hyperplane signature split into
    ``n_bands`` bands; vectors sharing ANY band key land in a bucket, and
    pairs verify by EXACT cosine >= tau inside the bucket (precision 1).
    Recall: a pair at angle theta collides on one band with prob
    (1 - theta/pi)^(n_bits/n_bands) per band; at tau=0.45 (theta ~ 63deg,
    2-bit bands) that is ~0.42/band -> ~99% over 8 bands. Buckets larger
    than ``max_bucket`` are dropped (a degenerate hub region would go
    quadratic; raise n_bits to split it instead). The shuffle moves
    (band, key, vec_id, embedding) rows only.
    """
    from ner_pytorch_ray.pipelines.similarity import _hyperplanes
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )
    from ray.data.aggregate import Count

    assert n_bits % n_bands == 0
    width = n_bits // n_bands
    mask = np.uint64((1 << width) - 1)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_numpy())
        M = normalized_rows(batch.column("embedding"))
        H = _hyperplanes(M.shape[1], n_bits)
        sigs = (M @ H.T > 0).astype(np.uint64)
        keys = np.zeros(len(ids), dtype=np.uint64)
        for b in range(n_bits):
            keys |= sigs[:, b] << np.uint64(b)
        n = len(ids)
        band = np.repeat(np.arange(n_bands, dtype=np.int32), n)
        bkeys = np.concatenate(
            [((keys >> np.uint64(b * width)) & mask) for b in range(n_bands)]
        ).astype(np.int64)
        # float32 little-endian bytes, ONE binary cell per row: the collect
        # aggregate ships python tuples, and a bytes object is ~10x lighter
        # than a python list of floats (same packing the minhash path uses);
        # ~2x corpus bytes through the wire instead of 8x float64 lists.
        emb32 = [r.astype("<f4").tobytes() for r in M]
        return pa.Table.from_pydict(
            {
                "band": pa.array(band),
                "key": pa.array(bkeys, type=pa.int64()),
                "vec_id": pa.array(np.tile(ids, n_bands), type=pa.int64()),
                "emb": pa.array(emb32 * n_bands, type=pa.binary()),
            }
        )

    bands = ds.map_batches(band_rows, batch_format="pyarrow")
    collected = collect_tuples(bands, ["band", "key"], ["vec_id", "emb"])
    empty = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])

    def bucket_pairs(key, items) -> pa.Table:
        if items is None or len(items) < 2 or len(items) > max_bucket:
            return empty.empty_table()
        seen = {}
        for vid, emb in items:
            seen.setdefault(vid, emb)
        ids = np.array(sorted(seen), dtype=np.int64)
        # unpack float32 bytes; renormalize in float64 (quantization nudges
        # the norm off 1 by ~1e-7 — renormalizing keeps cosine exact-unit)
        M = np.stack(
            [np.frombuffer(seen[v], dtype="<f4").astype(np.float64) for v in ids]
        )
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        S = M @ M.T
        ai, bi = np.nonzero(np.triu(S >= tau, k=1))
        return pa.Table.from_pydict(
            {
                "vec_a": pa.array(ids[ai], type=pa.int64()),
                "vec_b": pa.array(ids[bi], type=pa.int64()),
            }
        )

    pairs = flat_map_groups(collected, bucket_pairs, ["band", "key"])
    distinct = pairs.repartition(8).groupby(["vec_a", "vec_b"]).aggregate(Count())
    return distinct.map_batches(
        lambda t: t.select(["vec_a", "vec_b"]), batch_format="pyarrow"
    )


# ------------------------------------------------- containment (substring)
def _gram_hash_rows(
    texts: list[str], doc_ids, m: int
) -> tuple[list[int], list[int], list[int]]:
    """(gram_hash, doc_id, is_probe) triples: every token-aligned m-gram of
    each >=m-token doc (distinct per doc) as member rows, plus the doc's
    PREFIX m-gram as its probe row."""
    grams, docs, probes = [], [], []
    for d, t in zip(doc_ids, texts):
        toks = t.split(" ")
        if len(toks) < m:
            continue
        seen = set()
        for i in range(len(toks) - m + 1):
            h = _stable_u64(" ".join(toks[i : i + m]))
            if h not in seen:
                seen.add(h)
                grams.append(h)
                docs.append(int(d))
                probes.append(0)
        grams.append(_stable_u64(" ".join(toks[:m])))
        docs.append(int(d))
        probes.append(1)
    return grams, docs, probes


def _containment_candidates(
    sf_dir: str, m: int, max_bucket: int
) -> ray.data.Dataset:
    """(inner_doc, outer_doc) candidates: inner's PREFIX m-gram occurs
    token-aligned in outer. If inner's full text is contained in outer, its
    prefix gram necessarily is too — so this is a COMPLETE candidate set
    for full containment (docs >= m tokens), and exactly the answer for
    the prefix query. One shuffle: (gram, doc, is_probe) rows bucket by
    gram; a bucket's pairs = probes x members. Buckets above
    ``max_bucket`` (boilerplate grams) are dropped — raise m to split
    them."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def rows(batch: pa.Table) -> pa.Table:
        grams, docs, probes = _gram_hash_rows(
            batch.column("text").to_pylist(),
            batch.column("doc_id").to_pylist(),
            m,
        )
        return pa.Table.from_pydict(
            {
                "gram": pa.array(grams, type=pa.int64()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "is_probe": pa.array(probes, type=pa.int64()),
            }
        )

    collected = collect_tuples(
        ds.map_batches(rows, batch_format="pyarrow"),
        ["gram"],
        ["doc_id", "is_probe"],
        shuffle_blocks="auto",  # many tiny gram groups: the sort-aggregate
        # floor grows with input block count
    )
    empty = pa.schema([("inner_doc", pa.int64()), ("outer_doc", pa.int64())])

    def bucket_pairs(key, items) -> pa.Table:
        if items is None or len(items) < 2 or len(items) > max_bucket:
            return empty.empty_table()
        probes = sorted({d for d, p in items if p})
        members = sorted({d for d, p in items if not p})
        out_a, out_b = [], []
        for a in probes:
            for b in members:
                if b != a:
                    out_a.append(a)
                    out_b.append(b)
        return pa.Table.from_pydict(
            {
                "inner_doc": pa.array(out_a, type=pa.int64()),
                "outer_doc": pa.array(out_b, type=pa.int64()),
            }
        )

    return flat_map_groups(collected, bucket_pairs, ["gram"])


def prefix_containment(
    sf_dir: str, m: int = 5, max_bucket: int = 100_000
) -> ray.data.Dataset:
    """Pairs (inner, outer) where inner's first ``m`` tokens occur
    token-aligned anywhere in outer (boilerplate/quoted-prefix detection).
    A doc's prefix gram is unique, so each inner pairs from exactly one
    bucket — no dedup groupby needed."""
    return _containment_candidates(sf_dir, m, max_bucket)


def substring_containment(
    sf_dir: str, m: int = 5, max_bucket: int = 100_000
) -> ray.data.Dataset:
    """Exact containment dedup: pairs (inner, outer) where inner's FULL
    token sequence occurs contiguously in outer (quoted / wrapped / mirror
    documents — docs >= m tokens). Candidates from the prefix-gram buckets
    (complete: containment implies the prefix gram matches), then exact
    verification with the two texts co-located by TWO bounded keyed
    collects — no broadcast of the corpus, no driver-side loop:

      1. candidates key by inner doc; union with (doc, text) rows; a
         group = one text + that doc's candidate fan -> (outer, inner,
         text_inner);
      2. re-key by outer doc; union with texts again; verify
         ``' '+inner+' ' in ' '+outer+' '`` (space padding = token
         alignment) vectorized per group.
    """
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    cands = _containment_candidates(sf_dir, m, max_bucket)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    # kind 0 = text row (payload = text), kind 1 = candidate (payload = peer)
    def text_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "key": batch.column("doc_id"),
                "kind": pa.array(np.zeros(n, dtype=np.int8), type=pa.int8()),
                "peer": pa.array(np.zeros(n, dtype=np.int64), type=pa.int64()),
                "payload": batch.column("text"),
            }
        )

    def cand_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "key": batch.column("inner_doc"),
                "kind": pa.array(np.ones(n, dtype=np.int8), type=pa.int8()),
                "peer": batch.column("outer_doc"),
                "payload": pa.array([""] * n, type=pa.string()),
            }
        )

    stage1 = docs.map_batches(text_rows, batch_format="pyarrow").union(
        cands.map_batches(cand_rows, batch_format="pyarrow")
    )
    mid_schema = pa.schema(
        [
            ("key", pa.int64()),       # outer doc
            ("kind", pa.int8()),       # 1 = pending pair
            ("peer", pa.int64()),      # inner doc
            ("payload", pa.string()),  # inner text
        ]
    )

    def attach_inner(key, items) -> pa.Table:
        if items is None or not items:
            return mid_schema.empty_table()
        (inner,) = key
        text = None
        outers = []
        for kind, peer, payload in items:
            if kind == 0:
                text = payload
            else:
                outers.append(peer)
        if text is None or not outers:
            return mid_schema.empty_table()
        outers = sorted(set(outers))
        n = len(outers)
        return pa.Table.from_pydict(
            {
                "key": pa.array(outers, type=pa.int64()),
                "kind": pa.array([1] * n, type=pa.int8()),
                "peer": pa.array([inner] * n, type=pa.int64()),
                "payload": pa.array([text] * n, type=pa.string()),
            }
        )

    mid = flat_map_groups(
        collect_tuples(
            stage1, ["key"], ["kind", "peer", "payload"],
            shuffle_blocks="auto",
        ),
        attach_inner,
        ["key"],
    )

    out_schema = pa.schema(
        [("inner_doc", pa.int64()), ("outer_doc", pa.int64())]
    )

    def verify(key, items) -> pa.Table:
        if items is None or not items:
            return out_schema.empty_table()
        (outer,) = key
        text = None
        pend = []
        for kind, peer, payload in items:
            if kind == 0:
                text = payload
            else:
                pend.append((peer, payload))
        if text is None or not pend:
            return out_schema.empty_table()
        padded = " " + text + " "
        inner = sorted(
            {p for p, t in pend if (" " + t + " ") in padded}
        )
        return pa.Table.from_pydict(
            {
                "inner_doc": pa.array(inner, type=pa.int64()),
                "outer_doc": pa.array([outer] * len(inner), type=pa.int64()),
            }
        )

    stage2 = docs.map_batches(text_rows, batch_format="pyarrow").union(mid)
    return flat_map_groups(
        collect_tuples(
            stage2, ["key"], ["kind", "peer", "payload"],
            shuffle_blocks="auto",
        ),
        verify,
        ["key"],
    )


_COS_PAIR_SCHEMA = pa.schema(
    [
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
        ("norm2_a", pa.int64()),
        ("norm2_b", pa.int64()),
        ("dot", pa.int64()),
    ]
)


def doc_cosine_pairs(
    sf_dir: str, tau2_ppm: int = 810_000, max_group: int = 1000
) -> ray.data.Dataset:
    """Exact sparse cosine all-pairs over whole-document TERM-FREQUENCY
    vectors (the inverted-index all-pairs design of Bayardo, Ma &
    Srikant 2007, WWW — "Scaling Up All Pairs Similarity Search"):
    pairs with cos²(a, b) >= tau2_ppm / 1e6, scored in exact integers —
    ``cos2_ppm = 1e6 * dot² // (norm2_a * norm2_b)`` avoids the
    irrational square roots, and thresholding cos² IS thresholding cos
    for non-negative tf vectors.

    Shape mirrors :func:`ngram_jaccard_pairs`: tf posting rows
    (token, doc, tf, norm2) -> ONE keyed collect per token (the posting
    list) -> vectorized triangular pair generation carrying the
    endpoint norms IN the grouping key -> one grouped sum folds the
    per-token dot contributions -> vectorized threshold filter. Tokens
    whose posting list exceeds ``max_group`` are dropped before pairing
    (a stop word pairs quadratically; its dot contribution is the
    least discriminative — same guard contract as the jaccard/minhash
    family, mirrored by the SQL oracle's df filter). The final square
    is size-routed: int64 numpy when dot² * 1e6 fits, exact Python
    big-ints for web-scale norms."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
        grouped_sum,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def postings(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        rep = np.diff(offs)
        did = np.repeat(doc_ids, rep)
        t = pa.table(
            {
                "doc_id": pa.array(did, type=pa.int64()),
                "token": flat,
            }
        )
        g = t.group_by(["doc_id", "token"]).aggregate([([], "count_all")])
        tf = g.column("count_all").to_numpy(zero_copy_only=False)
        gd = g.column("doc_id").to_numpy(zero_copy_only=False)
        # per-doc norm2 = sum tf^2 (docs are block-local: one parquet row
        # never splits across batches)
        order = np.argsort(gd, kind="stable")
        gd_s = gd[order]
        tf_s = tf[order]
        uniq, starts = np.unique(gd_s, return_index=True)
        n2 = np.add.reduceat(tf_s * tf_s, starts)
        n2_by_doc = dict(zip(uniq.tolist(), n2.tolist()))
        norm2 = np.array([n2_by_doc[d] for d in gd], dtype=np.int64)
        return pa.table(
            {
                "token": g.column("token"),
                "doc_id": pa.array(gd, type=pa.int64()),
                "tf": pa.array(tf.astype(np.int64)),
                "norm2": pa.array(norm2),
            }
        )

    posts = ds.map_batches(postings, batch_format="pyarrow")
    collected = collect_tuples(posts, ["token"], ["doc_id", "tf", "norm2"])

    def gen_pairs(key, items) -> pa.Table:
        if items is None or len(items) < 2 or len(items) > max_group:
            return _COS_PAIR_SCHEMA.empty_table()
        items = sorted(items)
        ids = np.array([d for d, _, _ in items], dtype=np.int64)
        tfs = np.array([t for _, t, _ in items], dtype=np.int64)
        n2s = np.array([n for _, _, n in items], dtype=np.int64)
        ai, bi = np.triu_indices(len(ids), k=1)
        return pa.Table.from_arrays(
            [
                pa.array(ids[ai]),
                pa.array(ids[bi]),
                pa.array(n2s[ai]),
                pa.array(n2s[bi]),
                pa.array(tfs[ai] * tfs[bi]),
            ],
            schema=_COS_PAIR_SCHEMA,
        )

    pair_partials = flat_map_groups(collected, gen_pairs, ["token"])
    merged = grouped_sum(
        pair_partials,
        ["doc_a", "doc_b", "norm2_a", "norm2_b"],
        sum_cols=["dot"],
    )

    def score(batch: pa.Table) -> pa.Table:
        dot = batch.column("dot").to_numpy(zero_copy_only=False)
        na = batch.column("norm2_a").to_numpy(zero_copy_only=False)
        nb = batch.column("norm2_b").to_numpy(zero_copy_only=False)
        if len(dot) == 0:
            cos2 = np.zeros(0, dtype=np.int64)
        elif (
            int(dot.max()) ** 2 <= (2**63 - 1) // 1_000_000
            and int(na.max()) * int(nb.max()) <= 2**63 - 1
        ):
            cos2 = 1_000_000 * dot * dot // (na * nb)
        else:  # exact big-int path for web-scale norms
            cos2 = np.array(
                [
                    1_000_000 * int(d) * int(d) // (int(x) * int(y))
                    for d, x, y in zip(dot, na, nb)
                ],
                dtype=np.int64,
            )
        t = pa.table(
            {
                "doc_a": batch.column("doc_a"),
                "doc_b": batch.column("doc_b"),
                "dot": batch.column("dot"),
                "norm2_a": batch.column("norm2_a"),
                "norm2_b": batch.column("norm2_b"),
                "cos2_ppm": pa.array(cos2.astype(np.int64)),
            }
        )
        return t.filter(pa.array(cos2 >= tau2_ppm))

    return merged.map_batches(score, batch_format="pyarrow").sort(
        ["doc_a", "doc_b"]
    )


def dedup_consensus(sf_dir: str) -> ray.data.Dataset:
    """Consensus near-dup verdict — the production dedup decision layer
    that never trusts ONE signal: every candidate pair flagged by any of
    the three banded detectors (token-shingle jaccard, simhash hamming,
    minhash-LSH jaccard) with per-method flags and the vote count;
    pairs with ``n_votes >= 2`` are the high-confidence removals.
    Output (doc_a, doc_b, ngram, simhash, minhash, n_votes), sorted.

    The three detectors run as their OWN pipelines sequentially (each
    output is a pair table ≪ corpus — materializing avoids co-scheduling
    three banded shuffles under one plan); the consensus itself is ONE
    keyed collect per (doc_a, doc_b) (group ≤ 3 rows) folding the
    method tags."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    from ner_pytorch_ray.pipelines.dedup import (  # self-imports for clarity
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    methods = {
        "ngram": ngram_jaccard_pairs(sf_dir).materialize(),
        "simhash": simhash_pairs(sf_dir).materialize(),
        "minhash": minhash_lsh_pairs(sf_dir).materialize(),
    }

    def tag(name: str):
        def rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_a": batch.column("doc_a").cast(pa.int64()),
                    "doc_b": batch.column("doc_b").cast(pa.int64()),
                    "method": pa.array(
                        [name] * len(batch), type=pa.string()
                    ),
                }
            )

        return rows

    unioned = None
    for name, ds in methods.items():
        part = ds.map_batches(tag(name), batch_format="pyarrow")
        unioned = part if unioned is None else unioned.union(part)
    groups = collect_tuples(unioned, ["doc_a", "doc_b"], ["method"])
    out_schema = pa.schema(
        [
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            ("ngram", pa.int64()),
            ("simhash", pa.int64()),
            ("minhash", pa.int64()),
            ("n_votes", pa.int64()),
        ]
    )

    def emit(key, items) -> pa.Table:
        if items is None:
            return out_schema.empty_table()
        names = {m for (m,) in items}
        flags = [int(n in names) for n in ("ngram", "simhash", "minhash")]
        return pa.table(
            {
                "doc_a": pa.array([key[0]], type=pa.int64()),
                "doc_b": pa.array([key[1]], type=pa.int64()),
                "ngram": pa.array([flags[0]], type=pa.int64()),
                "simhash": pa.array([flags[1]], type=pa.int64()),
                "minhash": pa.array([flags[2]], type=pa.int64()),
                "n_votes": pa.array([sum(flags)], type=pa.int64()),
            }
        )

    return flat_map_groups(groups, emit, ["doc_a", "doc_b"]).sort(
        ["doc_a", "doc_b"]
    )
