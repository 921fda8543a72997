"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"): pick the
raw-corpus documents whose hashed n-gram profile looks most like a target
domain.

The paper's estimator is a bag-of-hashed-bigrams class ratio: featurize
every document into B hash buckets, fit target and raw bucket
distributions, and score each document by the sum over its bigrams of
``log p_target(bucket) - log p_raw(bucket)``. Ray-Data-first shape:

1. **fit (one corpus scan)** — per-block ``np.bincount`` histograms over
   the hashed-bigram buckets (two int64 vectors of length B per block:
   raw = every doc, target = the target-domain docs), folded by one
   B-row ``grouped_sum``. B is fixed (default 4096), so the shuffle is
   bucket-bounded no matter the corpus size.
2. **price** — the driver turns the two histograms into per-bucket
   log-ratio weights with add-one smoothing, SCALED TO INTEGER MILLIONTHS
   (``lam_b = round(1e6 * (ln((t_b+1)/(T+B)) - ln((r_b+1)/(R+B))))``).
   Floats exist only in this driver-side O(B) step; everything that sums
   across rows/blocks is int64, so document scores are bit-identical
   under any partitioning.
3. **score (one corpus scan)** — per-block vectorized re-featurize +
   ``np.add.at`` integer gather of ``lam`` per document; top-k by
   (weight desc, doc_id) selects the resample.

Featurization is the scale-shaped part: token hashes come from a
per-call DISTINCT-token blake2b cache (vocab-bounded Python, not
per-token), and bigram buckets are one uint64 numpy expression over the
hash pairs — no Python loop over bigrams.

Sequential oracle: ``tools/make_expected.dsir_expected``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ner_pytorch_ray.stages.groupby_utils import grouped_sum

N_BUCKETS = 4096
LAM_SCALE = 1_000_000


def _token_hash(tok: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little"
    )


def _bigram_buckets(
    texts: pa.ChunkedArray | pa.Array, n_buckets: int
) -> tuple[np.ndarray, np.ndarray]:
    """(parent_doc_index, bucket_id) for every in-document token bigram
    of a batch — distinct-token hash cache + one vectorized uint64 mix."""
    toks = pc.split_pattern(texts, " ")
    flat = pc.list_flatten(toks).to_pylist()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    cache: dict = {}
    h = np.fromiter(
        (
            cache.get(t) or cache.setdefault(t, _token_hash(t))
            for t in flat
        ),
        dtype=np.uint64,
        count=len(flat),
    )
    # bigram (i, i+1) pairs that do not straddle a document boundary
    n = len(h)
    if n < 2:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    parent_tok = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    keep = parent_tok[:-1] == parent_tok[1:]
    h1, h2 = h[:-1][keep], h[1:][keep]
    mix = (h1 * np.uint64(1_000_003)) ^ h2
    return parent_tok[:-1][keep], (mix % np.uint64(n_buckets)).astype(
        np.int64
    )


def _hist_partials(target_expr_col: str, n_buckets: int):
    def partial(batch: pa.Table) -> pa.Table:
        parent, bucket = _bigram_buckets(
            batch.column("text"), n_buckets
        )
        raw = np.bincount(bucket, minlength=n_buckets)
        is_t = np.asarray(
            batch.column(target_expr_col).to_numpy(zero_copy_only=False)
        )
        tgt = np.bincount(
            bucket[is_t[parent]], minlength=n_buckets
        )
        return pa.table(
            {
                "bucket": pa.array(
                    np.arange(n_buckets, dtype=np.int64)
                ),
                "t_cnt": pa.array(tgt.astype(np.int64)),
                "r_cnt": pa.array(raw.astype(np.int64)),
            }
        )

    return partial


def dsir_select(
    sf_dir: str,
    target_lang: str = "en",
    k: int = 100,
    n_buckets: int = N_BUCKETS,
) -> ray.data.Dataset:
    """Top-``k`` documents by integer DSIR importance weight toward the
    ``target_lang`` domain: (doc_id, weight_i) by (weight desc, doc_id).
    """
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "is_target",
            pc.equal(batch.column("lang"), pa.scalar(target_lang)),
        )

    tagged = docs.map_batches(tag, batch_format="pyarrow").materialize()

    hist_rows = grouped_sum(
        tagged.map_batches(
            _hist_partials("is_target", n_buckets),
            batch_format="pyarrow",
        ),
        keys=["bucket"],
        sum_cols=["t_cnt", "r_cnt"],
    ).take_all()  # exactly n_buckets rows — bounded driver state
    t_cnt = np.zeros(n_buckets, dtype=np.int64)
    r_cnt = np.zeros(n_buckets, dtype=np.int64)
    for r in hist_rows:
        t_cnt[r["bucket"]] = r["t_cnt"]
        r_cnt[r["bucket"]] = r["r_cnt"]
    T, R = int(t_cnt.sum()), int(r_cnt.sum())
    lam = np.rint(
        LAM_SCALE
        * (
            np.log((t_cnt + 1) / (T + n_buckets))
            - np.log((r_cnt + 1) / (R + n_buckets))
        )
    ).astype(np.int64)
    lam_ref = ray.put(lam)

    class Score:
        def __init__(self, ref):
            self._lam = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            parent, bucket = _bigram_buckets(
                batch.column("text"), n_buckets
            )
            w = np.zeros(batch.num_rows, dtype=np.int64)
            np.add.at(w, parent, self._lam[bucket])
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "weight_i": pa.array(w),
                }
            )

    scored = tagged.map_batches(
        Score,
        fn_constructor_args=(lam_ref,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return scored.sort(
        ["weight_i", "doc_id"], descending=[True, False]
    ).limit(k)
