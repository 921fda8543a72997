"""Training-corpus hygiene operators: benchmark decontamination, PII
detect/redact, and deterministic stratified sampling.

These are the corpus-hygiene stages a web-scale LLM-data pipeline runs
between raw-crawl filtering (``webtext.corpus_filter``) and packing
(``webtext.sequence_pack``); the reference repo's own data prep is
file-local (loader.py:20-71 reads one CoNLL file), so these are the
distributed generalizations, not ports.

Scale shapes
------------
- ``decontaminate``: the eval/benchmark side is SMALL by construction
  (benchmarks are MBs, the corpus is TBs) — its distinct n-gram set is
  built with a combiner'd distinct and broadcast ONCE via ``ray.put``;
  each corpus task probes the shared set zero-copy. No shuffle touches
  the corpus side.
- ``pii_scrub``: pure vectorized RE2 kernels (``pc.count_substring_regex``
  / ``pc.replace_substring_regex``) over the raw column, then a two-level
  combiner'd groupby whose keys are (event_type, redacted-template) —
  the shuffle moves templates, not payloads.
- ``stratified_sample``: per-block local top-n per stratum, then one
  bounded per-stratum merge — driver never sees more than
  n_strata x n rows. The sampling key is ``md5(str(id))`` so the sample
  is deterministic, reproducible across engines (DuckDB's ``md5`` agrees
  byte-for-byte), and uniform regardless of id distribution.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# ------------------------------------------------------------ decontaminate

_DECON_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_grams", pa.int64()),
        ("n_hit", pa.int64()),
        ("contaminated", pa.int64()),
    ]
)


def _doc_grams(text: str, n: int) -> set[str]:
    toks = text.split(" ")
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _eval_gram_rows(batch: pa.Table, n: int, eval_mod: int) -> pa.Table:
    """Per-block distinct n-grams of the eval-side docs (combiner)."""
    doc_ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    grams: set[str] = set()
    for d, t in zip(doc_ids, texts):
        if d % eval_mod == 0:
            grams |= _doc_grams(t, n)
    return pa.table({"gram": pa.array(sorted(grams), type=pa.string())})


class _Decontaminator:
    """Actor-pool probe stage: deserializes the broadcast gram set once per
    actor (``__init__``), probes per batch. At 100 TB the eval set rides the
    object store to each node exactly once."""

    def __init__(self, grams_ref, n: int, eval_mod: int):
        self.grams: set[str] = ray.get(grams_ref)
        self.n = n
        self.eval_mod = eval_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        out_d, out_g, out_h, out_c = [], [], [], []
        for d, t in zip(doc_ids, texts):
            if d % self.eval_mod == 0:
                continue  # eval docs are not corpus candidates
            grams = _doc_grams(t, self.n)
            if not grams:
                continue  # <n tokens: no gram evidence either way
            hit = len(grams & self.grams)
            out_d.append(int(d))
            out_g.append(len(grams))
            out_h.append(hit)
            out_c.append(1 if hit else 0)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_d, type=pa.int64()),
                "n_grams": pa.array(out_g, type=pa.int64()),
                "n_hit": pa.array(out_h, type=pa.int64()),
                "contaminated": pa.array(out_c, type=pa.int64()),
            },
            schema=_DECON_SCHEMA,
        )


def decontaminate(
    sf_dir: str,
    n: int = 8,
    eval_mod: int = 13,
    concurrency: int | tuple[int, int] = (1, 64),
) -> ray.data.Dataset:
    """Benchmark decontamination: flag corpus docs sharing any word n-gram
    with the held-out eval split (doc_id % eval_mod == 0 plays the
    benchmark; in production it is the actual eval files).

    Output per corpus doc: distinct n-gram count, distinct grams also in
    the eval set, and a 0/1 contaminated verdict (the drop rule of
    Brown et al. 2020 appendix C / Gao et al. 2020 — any n-gram overlap)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    # the eval side is the SMALL side by construction: bounded driver pull,
    # broadcast once (the ray.put object is shared, not per-task copied).
    # Dataset.unique returns the (small) distinct list to the driver.
    eval_grams = ds.map_batches(
        lambda b: _eval_gram_rows(b, n, eval_mod), batch_format="pyarrow"
    ).unique("gram")
    grams_ref = ray.put(set(eval_grams))
    return ds.map_batches(
        _Decontaminator,
        fn_constructor_args=(grams_ref, n, eval_mod),
        concurrency=concurrency,
        batch_format="pyarrow",
    )


# ------------------------------------------------------------------ pii scrub

# RE2 syntax on both sides: pyarrow::compute uses RE2, DuckDB regexp_* uses
# RE2 — patterns below are engine-portable byte-for-byte. The digit-run rule
# stands in for account/phone-number hygiene on the synthetic corpus; the
# email/IPv4 alternates show the production pattern set.
PII_PATTERNS = {
    "number": r"\d+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
}


def pii_scrub(sf_dir: str, pattern: str = PII_PATTERNS["number"]) -> ray.data.Dataset:
    """Detect + redact PII-shaped tokens in ``events.props``; report per
    event_type: event count, total matches, and distinct redacted
    templates. Redaction itself (`<NUM>` substitution) happens in the same
    vectorized pass that counts — a production sink would write the
    redacted column instead of dropping it."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        props = batch.column("props").combine_chunks()
        t = pa.table(
            {
                "event_type": batch.column("event_type").combine_chunks(),
                "redacted": pc.replace_substring_regex(props, pattern, "<NUM>"),
                "n_matches": pc.cast(
                    pc.count_substring_regex(props, pattern), pa.int64()
                ),
            }
        )
        g = t.group_by(["event_type", "redacted"]).aggregate(
            [("n_matches", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "redacted": g.column("redacted"),
                "n_matches": g.column("n_matches_sum").cast(pa.int64()),
                "n_events": g.column("count_all").cast(pa.int64()),
            }
        )

    per_template = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "redacted"],
        sum_cols=["n_matches", "n_events"],
    )

    def fold(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type"]).aggregate(
            [("n_events", "sum"), ("n_matches", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "n_events": g.column("n_events_sum").cast(pa.int64()),
                "n_matches": g.column("n_matches_sum").cast(pa.int64()),
                "n_distinct_redacted": g.column("count_all").cast(pa.int64()),
            }
        )

    final = grouped_sum(
        per_template.map_batches(fold, batch_format="pyarrow"),
        ["event_type"],
        sum_cols=["n_events", "n_matches", "n_distinct_redacted"],
    )
    return final.sort("event_type")


# -------------------------------------------------------- stratified sample

_STRAT_SCHEMA = pa.schema(
    [("lang", pa.string()), ("doc_id", pa.int64()), ("rn", pa.int64())]
)


def _md5_hex(vals: np.ndarray) -> list[str]:
    return [hashlib.md5(str(int(v)).encode()).hexdigest() for v in vals]


def stratified_sample(
    sf_dir: str, per_stratum: int = 20, stratum_col: str = "lang"
) -> ray.data.Dataset:
    """Deterministic stratified sample: the ``per_stratum`` docs with the
    smallest md5(doc_id) per stratum, ranked. Equivalent to a uniform
    without-replacement sample that any engine can reproduce (DuckDB:
    row_number over md5(CAST(doc_id AS VARCHAR))).

    Two-level top-n: per-block local top-n per stratum (combiner — each
    block emits <= n_strata x n rows), then a bounded per-stratum merge.
    No global sort, no driver collect of the corpus."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", stratum_col]
    )

    def local_topn(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy()
        strat = np.asarray(batch.column(stratum_col).to_pylist(), dtype=object)
        hk = np.asarray(_md5_hex(doc), dtype=object)
        order = np.lexsort((doc, hk, strat))
        strat, doc, hk = strat[order], doc[order], hk[order]
        keep = np.ones(len(doc), dtype=bool)
        # positions within each stratum run (input sorted by stratum)
        if len(doc):
            new = np.r_[True, strat[1:] != strat[:-1]]
            run_id = np.cumsum(new) - 1
            pos = np.arange(len(doc)) - np.r_[
                np.nonzero(new)[0]
            ][run_id]
            keep = pos < per_stratum
        # pack (hash, doc_id) into one string so the collect shuffle stays
        # Arrow-native (mixed-type tuples would pickle-fallback); md5 hex is
        # fixed-width so lexicographic order == (hk, then tie-break) order,
        # and hashes of distinct ids never collide in practice
        cand = [f"{h}:{int(d)}" for h, d in zip(hk[keep], doc[keep])]
        return pa.table(
            {
                stratum_col: pa.array(strat[keep].tolist(), type=pa.string()),
                "cand": pa.array(cand, type=pa.string()),
            }
        )

    partial = ds.map_batches(local_topn, batch_format="pyarrow")
    collected = collect_tuples(
        partial, [stratum_col], ["cand"], name="cand", shuffle_blocks="auto"
    )

    def pick(key, items) -> pa.Table:
        if items is None or not items:
            return _STRAT_SCHEMA.empty_table()
        (stratum,) = key
        uniq = sorted({c for (c,) in items})[:per_stratum]
        return pa.Table.from_pydict(
            {
                "lang": pa.array([stratum] * len(uniq), type=pa.string()),
                "doc_id": pa.array(
                    [int(c.split(":", 1)[1]) for c in uniq], type=pa.int64()
                ),
                "rn": pa.array(range(1, len(uniq) + 1), type=pa.int64()),
            },
            schema=_STRAT_SCHEMA,
        )

    return flat_map_groups(collected, pick, [stratum_col], items_col="cand")


def corpus_mixture(
    sf_dir: str,
    budget_tokens: int = 50_000,
    weights: dict[str, int] | None = None,
) -> ray.data.Dataset:
    """Token-budget corpus MIXTURE sampling — the data-mixing step of an
    LM training pipeline ("X% of the token budget from each source"):
    per source, documents are taken in deterministic-shuffle order
    (ascending ``md5(doc_id)``, the engine's sampling key) until the
    source's token budget is exhausted; the straddling document that
    crosses the budget is the last one kept, so every source's selection
    is a prefix under the hash order and reproducible anywhere.

    ``weights`` maps source -> integer percent (default: uniform over
    observed sources via integer division, remainder to the
    lexicographically first sources — fully deterministic). Budgets are
    ``budget_tokens * pct // 100``.

    Distributed shape: one metadata scan emits (source, doc_id, hash,
    n_tokens) rows — 40-byte rows, never text; the per-source running
    token sum is :func:`~ner_pytorch_ray.stages.groupby_utils.
    grouped_running_sum` (global sort + O(#blocks) carry chain — a hot
    source never lands in one task); the keep filter is block-local.
    Output (doc_id, source, n_tokens, cum_tokens) sorted by
    (source, doc_id)."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_running_sum, grouped_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def meta_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(batch.column("text"), " ")
        return pa.table(
            {
                "source": batch.column("source"),
                "hk": pa.array(_md5_hex(doc), type=pa.string()),
                "doc_id": batch.column("doc_id"),
                "n_tokens": pc.list_value_length(toks).cast(pa.int64()),
            }
        )

    meta = ds.map_batches(meta_rows, batch_format="pyarrow").materialize()

    if weights is None:
        srcs = sorted(
            r["source"]
            for r in grouped_sum(
                meta.map_batches(
                    lambda t: pa.table(
                        {
                            "source": t.column("source"),
                            "one": pa.array([1] * len(t), type=pa.int64()),
                        }
                    ),
                    batch_format="pyarrow",
                ),
                ["source"],
                sum_cols=["one"],
            ).take_all()  # |sources| rows — bounded
        )
        base, rem = 100 // len(srcs), 100 % len(srcs)
        weights = {
            s: base + (1 if i < rem else 0) for i, s in enumerate(srcs)
        }
    budgets = {s: budget_tokens * p // 100 for s, p in weights.items()}

    summed = grouped_running_sum(
        meta,
        part_keys=["source"],
        order_keys=["hk", "doc_id"],
        descending=[False, False],
        value_col="n_tokens",
        out_col="cum_tokens",
    )

    def keep(batch: pa.Table) -> pa.Table:
        srcs_col = batch.column("source").to_pylist()
        cum = batch.column("cum_tokens").to_numpy(zero_copy_only=False)
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        # keep while the PREVIOUS cumulative (cum - n) is under budget:
        # the straddling doc is included, everything after is not
        mask = np.array(
            [
                (int(c) - int(k)) < budgets.get(s, 0)
                for s, c, k in zip(srcs_col, cum, n)
            ]
        )
        t = batch.filter(pa.array(mask))
        return t.select(["doc_id", "source", "n_tokens", "cum_tokens"])

    return summed.map_batches(keep, batch_format="pyarrow").sort(
        ["source", "doc_id"]
    )


SPAN_HASH_MOD = 1 << 32
SPAN_HASH_MIX = 2654435761  # Knuth multiplicative constant
SPAN_START_T = 214_748_364  # floor(0.05 * 2^32): 5% span starts
SPAN_LEN = 3


def span_corruption_stats(sf_dir: str) -> ray.data.Dataset:
    """T5-style span-corruption accounting (Raffel et al. 2020): decide
    deterministically which token positions start a corruption span
    (pseudo-rand ``((doc_id*1000003 + pos) % 2^32) * 2654435761 % 2^32 <
    0.05*2^32``; spans cover 3 tokens, overlaps merge) and report per
    document (doc_id, n_tokens, n_starts, n_masked) — the mask itself is
    a pure function of (doc_id, pos), so the downstream input/target
    split needs no stored state and any engine reproduces it exactly
    (mod-2^32 distributes over the multiply, so the mix stays in
    uint64/HUGEINT).

    One streaming scan; everything vectorized numpy (position arrays via
    repeat/arange over the token-list offsets, the 2-shift OR for span
    coverage guarded at document boundaries); per-doc sums via bincount.
    """
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def stats(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = lens.astype(np.int64)
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        # position within each document
        starts_of_doc = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts_of_doc[1:])
        pos = np.arange(len(parent), dtype=np.int64) - starts_of_doc[parent]
        m = (
            doc_ids[parent].astype(np.uint64) * np.uint64(1_000_003)
            + pos.astype(np.uint64)
        ) % np.uint64(SPAN_HASH_MOD)
        h = (m * np.uint64(SPAN_HASH_MIX)) % np.uint64(SPAN_HASH_MOD)
        st = h < np.uint64(SPAN_START_T)
        masked = st.copy()
        for k in range(1, SPAN_LEN):
            shifted = np.zeros_like(st)
            shifted[k:] = st[:-k]
            # a start only covers positions in the SAME document
            same = np.zeros_like(st)
            same[k:] = parent[k:] == parent[:-k]
            masked |= shifted & same
        n_starts = np.bincount(
            parent, weights=st.astype(np.int64), minlength=len(lens)
        ).astype(np.int64)
        n_masked = np.bincount(
            parent, weights=masked.astype(np.int64), minlength=len(lens)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(lens),
                "n_starts": pa.array(n_starts),
                "n_masked": pa.array(n_masked),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow").sort("doc_id")


def doc_chunks(
    sf_dir: str, chunk: int = 32, overlap: int = 8
) -> ray.data.Dataset:
    """RAG-style overlapping document chunking — the retrieval-corpus
    prep every embedding/indexing pipeline runs first: fixed ``chunk``
    token windows advancing by ``chunk - overlap``, so consecutive
    chunks share ``overlap`` tokens of context. Per doc, chunk i starts
    at ``i * stride`` and is emitted iff ``i == 0`` (every doc yields at
    least one chunk) or ``i*stride + overlap < n_tokens`` (a tail that
    adds nothing beyond the shared overlap is suppressed). Output
    (doc_id, chunk_id, start_tok, n_tokens, chunk_text), sorted.

    Fully Arrow-vectorized and embarrassingly parallel (NO shuffle): the
    flat token buffer + numpy offset arithmetic produce every chunk's
    token indices, one ``take`` gathers them, a reconstructed ListArray
    + ``pc.binary_join`` emits the chunk texts — no Python loop over
    chunks or tokens."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        lambda b: chunk_block(b, chunk, overlap), batch_format="pyarrow"
    ).sort(["doc_id", "chunk_id"])


def chunk_block(batch: pa.Table, chunk: int, overlap: int) -> pa.Table:
    """Block kernel of :func:`doc_chunks`, reusable by any composed
    pipeline holding a (doc_id, text) batch."""
    stride = chunk - overlap
    if stride <= 0:
        raise ValueError("chunk must exceed overlap")
    toks = pc.split_pattern(batch.column("text"), pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    offs = offs - offs[0]
    n = np.diff(offs)  # tokens per doc
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    # chunks per doc: i == 0 always; i >= 1 iff i*stride+overlap < n
    extra = np.maximum(0, (n - overlap - 1) // stride)
    k = 1 + extra
    total = int(k.sum())
    if total == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "chunk_id": pa.array([], type=pa.int64()),
                "start_tok": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "chunk_text": pa.array([], type=pa.string()),
            }
        )
    did = np.repeat(doc_ids, k)
    doc_n = np.repeat(n, k)
    doc_base = np.repeat(offs[:-1], k)
    # per-doc chunk index 0..k-1 via global arange minus repeated base
    cum = np.concatenate(([0], np.cumsum(k)[:-1]))
    cid = np.arange(total, dtype=np.int64) - np.repeat(cum, k)
    start = cid * stride
    cnt = np.minimum(chunk, doc_n - start)
    # gather every chunk's token indices with one take
    out_off = np.concatenate(([0], np.cumsum(cnt)))
    idx = (
        np.repeat(doc_base + start, cnt)
        + np.arange(int(out_off[-1]), dtype=np.int64)
        - np.repeat(out_off[:-1], cnt)
    )
    gathered = flat.take(pa.array(idx, type=pa.int64()))
    chunks_list = pa.ListArray.from_arrays(
        pa.array(out_off, type=pa.int32()), gathered
    )
    text = pc.binary_join(chunks_list, " ")
    return pa.table(
        {
            "doc_id": pa.array(did, type=pa.int64()),
            "chunk_id": pa.array(cid, type=pa.int64()),
            "start_tok": pa.array(start, type=pa.int64()),
            "n_tokens": pa.array(cnt, type=pa.int64()),
            "chunk_text": text,
        }
    )




def systematic_sample(sf_dir: str, step: int = 20) -> ray.data.Dataset:
    """Systematic (every k-th) sampling over the doc_id order — the
    eval-slice sampler that guarantees EXACT 1/k coverage evenly spread
    across the corpus, where hash sampling only hits 1/k in expectation:
    rows at global positions 0, k, 2k, ... of the doc_id-sorted corpus.
    Output (doc_id, row_idx, n_tokens), sorted.

    Distributed: global sort + `add_global_index` (O(#blocks) driver
    prefix, blocks never move) assigns positions; the modulo filter is
    one vectorized compare. Unlike LIMIT-based sampling the driver never
    sees a row."""
    from ner_pytorch_ray.stages.groupby_utils import add_global_index

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def stats(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pc.list_value_length(toks).cast(pa.int64()),
            }
        )

    indexed = add_global_index(
        ds.map_batches(stats, batch_format="pyarrow").sort("doc_id"),
        col="row_idx",
    )

    def pick(batch: pa.Table) -> pa.Table:
        idx = batch.column("row_idx").to_numpy(zero_copy_only=False)
        kept = batch.filter(pa.array(idx % step == 0))
        return kept.select(["doc_id", "row_idx", "n_tokens"])

    return indexed.map_batches(pick, batch_format="pyarrow").sort("doc_id")
