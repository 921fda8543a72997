"""Text quality scoring, language-ID and fingerprinting (training-data ops).

  * ``quality_stats`` — integer per-doc features (token/type/stopword/char
    counts) — fully vectorized, SQL-oracle-able.
  * ``doc_fingerprint`` — md5 content fingerprint (SQL-oracle-able) plus a
    winnowing fingerprint set (rolling-hash minima) for robust overlap
    detection (pytest-verified).
  * ``language_id`` — character/stopword-profile heuristic returning
    (doc_id, lang_pred, confidence); on this synthetic corpus the text is
    language-independent so the heuristic is exercised for plumbing +
    determinism, not accuracy.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

STOPWORDS = ("the", "a")


def _quality_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    toks = pc.split_pattern(text, pattern=" ")
    n_tokens = pc.list_value_length(toks).cast(pa.int64())
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    vals = np.asarray(flat, dtype=object)

    n_types = np.empty(len(lens), dtype=np.int64)
    n_stop = np.empty(len(lens), dtype=np.int64)
    max_len = np.empty(len(lens), dtype=np.int64)
    stop = set(STOPWORDS)
    tok_lens = pc.utf8_length(flat).to_numpy().astype(np.int64)
    is_stop = np.isin(vals, list(stop))
    for i in range(len(lens)):
        lo, hi = offsets[i], offsets[i + 1]
        seg = vals[lo:hi]
        n_types[i] = len(set(seg))
        n_stop[i] = int(is_stop[lo:hi].sum())
        max_len[i] = int(tok_lens[lo:hi].max()) if hi > lo else 0

    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": n_tokens,
            "n_types": pa.array(n_types),
            "n_stopwords": pa.array(n_stop),
            "max_token_len": pa.array(max_len),
            "n_chars": pc.utf8_length(text).cast(pa.int64()),
        }
    )


def quality_stats(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(_quality_batch, batch_format="pyarrow")


# ---------------------------------------------------------------- fingerprint
def doc_fingerprint(sf_dir: str) -> ray.data.Dataset:
    """md5 hex fingerprint per document (exact-dup key, SQL: md5(text))."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "fingerprint": pa.array(
                    [hashlib.md5(t.encode()).hexdigest() for t in texts],
                    type=pa.string(),
                ),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


def winnow_fingerprints(
    sf_dir: str, k: int = 4, window: int = 5
) -> ray.data.Dataset:
    """Winnowing (Schleimer et al. 2003): per doc, the set of per-window
    minimum k-gram rolling hashes. Deterministic; output one row per
    selected fingerprint (doc_id, fp:uint64)."""
    from ner_pytorch_ray.pipelines.dedup import _stable_u64

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def winnow(batch: pa.Table) -> pa.Table:
        out_doc, out_fp = [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = t.split(" ")
            if len(toks) < k:
                continue
            hs = np.fromiter(
                (
                    _stable_u64(" ".join(toks[i : i + k]))
                    for i in range(len(toks) - k + 1)
                ),
                dtype=np.int64,
            )
            if len(hs) <= window:
                sel = {int(hs.min())}
            else:
                sel = set()
                # sliding-window minima (small windows; simple loop)
                for i in range(len(hs) - window + 1):
                    sel.add(int(hs[i : i + window].min()))
            out_doc.extend([d] * len(sel))
            out_fp.extend(sorted(sel))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "fp": pa.array(out_fp, type=pa.int64()),
            }
        )

    return ds.map_batches(winnow, batch_format="pyarrow")


# ---------------------------------------------------------------- language id
_LANG_PROFILES = {
    # stopword/character heuristic profiles (tiny, deterministic)
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "los", "las", "y"),
    "zh": (),
}


def lid_doc(text: str, toks: list[str]) -> tuple[str, float]:
    """LID decision for ONE document (shared by ``language_id`` and
    ``webtext.corpus_filter``): CJK character ratio first, then
    stopword-profile hit rates with en>de>fr>es tie priority (profile
    iteration order + strict >)."""
    n = max(len(toks), 1)
    cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
    if cjk / max(len(text), 1) > 0.2:
        return "zh", cjk / max(len(text), 1)
    best, score = "en", -1.0
    for lang, words in _LANG_PROFILES.items():
        if not words:
            continue
        s = sum(1 for w in toks if w in words) / n
        if s > score:
            best, score = lang, s
    return best, max(score, 0.0)


def language_id(sf_dir: str) -> ray.data.Dataset:
    """Heuristic LID: stopword-profile hit rates + CJK character ratio."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def lid(batch: pa.Table) -> pa.Table:
        preds, confs = [], []
        for t in batch.column("text").to_pylist():
            pred, conf = lid_doc(t, t.split(" "))
            preds.append(pred)
            confs.append(conf)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(preds, type=pa.string()),
                "confidence": pa.array(confs, type=pa.float64()),
            }
        )

    return ds.map_batches(lid, batch_format="pyarrow")


# ------------------------------------------------------------- repetition
def repetition_stats(sf_dir: str, max_ngram: int = 3) -> ray.data.Dataset:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1
    analog for this corpus shape): for n in 1..max_ngram, the fraction of
    n-gram occurrences that are repeats of an already-seen n-gram
    (1 - distinct/total). High values flag boilerplate/spam for filtering.

    Per-doc dict-based n-gram counting (bounded by doc length, no
    cross-doc state); integer numerators/denominators are emitted alongside
    the fractions so the SQL oracle compares exactly.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def rep(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        cols: dict[str, list] = {"doc_id": doc_ids}
        for n in range(1, max_ngram + 1):
            tot_l, dup_l = [], []
            for t in texts:
                toks = t.split(" ")
                total = max(len(toks) - n + 1, 0)
                if total <= 0:
                    tot_l.append(0)
                    dup_l.append(0)
                    continue
                grams = {}
                for i in range(total):
                    g = tuple(toks[i : i + n])
                    grams[g] = grams.get(g, 0) + 1
                dup_l.append(total - len(grams))
                tot_l.append(total)
            cols[f"n{n}_total"] = tot_l
            cols[f"n{n}_dup"] = dup_l
        out = {"doc_id": pa.array(cols["doc_id"], type=pa.int64())}
        for n in range(1, max_ngram + 1):
            out[f"n{n}_total"] = pa.array(cols[f"n{n}_total"], type=pa.int64())
            out[f"n{n}_dup"] = pa.array(cols[f"n{n}_dup"], type=pa.int64())
            out[f"n{n}_dup_frac"] = pa.array(
                [
                    d * 1.0 / t if t else 0.0
                    for d, t in zip(cols[f"n{n}_dup"], cols[f"n{n}_total"])
                ],
                type=pa.float64(),
            )
        return pa.Table.from_pydict(out)

    return ds.map_batches(rep, batch_format="pyarrow")


# -------------------------------------------------------------- sampling
def hash_sample(sf_dir: str, rate_pct: int = 10, salt: str = "s0") -> ray.data.Dataset:
    """Deterministic stratum-free document sampling: keep a doc iff
    md5-hash(salt || doc_id) mod 100 < rate_pct. The standard reproducible
    corpus-subsetting op at web scale — no RNG state, stable under any
    partitioning/retry, SQL-expressible for the oracle gate."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def _u64(s: str) -> int:
        v = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
        return v & 0x7FFFFFFFFFFFFFFF

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        mask = [(_u64(f"{salt}:{d}") % 100) < rate_pct for d in ids]
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
