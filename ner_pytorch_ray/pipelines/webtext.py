"""Corpus-level webtext curation: the composed "so what" operators a
production training-data pipeline runs over the raw signals the rest of the
engine computes per-document.

  * ``corpus_filter`` — a C4/Gopher-style keep/drop gate (Raffel et al.
    2020 §2.2; Rae et al. 2021 §A1.1): ONE streaming scan computes every
    signal (LID, token stats, stopword rate, unigram repetition) and folds
    them through a fixed rule cascade into (kept, reason). All decisions
    use integer cross-multiplication — no float thresholds — so the SQL
    oracle compares bit-exactly.
  * ``sentence_dedup`` — CCNet-style duplicated-span removal (Wenzek et
    al. 2020 §3.1) at sentence granularity (this corpus has no newlines;
    sentences are the engine-wide 12-token rule, `sources/pages.py`):
    global keep-first-occurrence by (doc_id, sent_id), reported as per-doc
    duplicate counts.
  * ``near_dup_clusters`` — the corpus-level near-dup REMOVAL verdict:
    exact n-gram-Jaccard pairs (`dedup.ngram_jaccard_pairs`) -> connected
    components (`graph_ops.components_over_edges`) -> keep the minimum
    doc_id per cluster; singleton docs keep themselves. Composes the pair
    and graph machinery into the operator users actually run.
  * ``domain_token_stats`` — corpus composition by (source, lang) — the
    C4/Gopher per-domain token-count report. `source` plays the
    registered-domain role in this synthetic corpus (the derived page
    urls are one unique host per doc, `sources/pages.py:doc_url`).
  * ``sequence_pack`` — LM training-sequence packing via a distributed
    prefix sum over per-doc token counts (chunked: per-chunk sums to the
    driver, exclusive prefix broadcast, per-chunk local cumsum).
  * ``boilerplate_ngrams`` — corpus-global top-k stop-gram mining
    (occurrence + doc-frequency counts over the vocabulary-sized gram
    table, local-then-merged top-k).
  * ``adaptive_length_filter`` — two-stage data-dependent gate: the keep
    threshold is the corpus's own p-quantile of token counts, broadcast
    as one scalar into a second streaming scan.

Scale notes (100 TB): every operator here is a streaming scan plus
combiner-first shuffles over metadata-sized rows — document text never
enters a shuffle. ``sentence_dedup`` keeps NO per-hash state lists: the
packed occurrence key makes the global keep-first winner a combiner'd
grouped MIN whose value names the owning doc, so a boilerplate sentence
repeated across a billion docs costs one min-partial per block.
``near_dup_clusters`` unions the (tiny) component labels with a
doc_id-only scan and resolves keepers with one grouped-min — no join
against the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ner_pytorch_ray.pipelines.dedup import _stable_u64
from ner_pytorch_ray.pipelines.quality import STOPWORDS, lid_doc

# rule thresholds (integer cross-multiplication; see corpus_filter)
MIN_TOKENS = 20
MAX_TOKENS = 10_000
MAX_TOKEN_LEN = 20
MIN_STOPWORD_PERMILLE = 30  # n_stopwords / n_tokens >= 3%
MAX_DUP_PERMILLE = 650  # unigram dup fraction <= 0.65

_FILTER_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("lang_pred", pa.string()),
        ("n_tokens", pa.int64()),
        ("max_token_len", pa.int64()),
        ("n_stopwords", pa.int64()),
        ("n1_total", pa.int64()),
        ("n1_dup", pa.int64()),
        ("kept", pa.int64()),
        ("reason", pa.string()),
    ]
)


def _filter_batch(batch: pa.Table) -> pa.Table:
    """All quality signals + the rule cascade for one Arrow batch."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    stop = set(STOPWORDS)
    rows: dict[str, list] = {name: [] for name in _FILTER_SCHEMA.names}
    for d, t in zip(doc_ids, texts):
        toks = t.split(" ")
        n_tokens = len(toks)
        max_len = max((len(w) for w in toks), default=0)
        n_stop = sum(1 for w in toks if w in stop)
        n1_total = n_tokens
        n1_dup = n_tokens - len(set(toks))
        lang, _ = lid_doc(t, toks)
        # fixed cascade: FIRST failing rule names the reason
        if n_tokens < MIN_TOKENS:
            kept, reason = 0, "too_short"
        elif n_tokens > MAX_TOKENS:
            kept, reason = 0, "too_long"
        elif max_len > MAX_TOKEN_LEN:
            kept, reason = 0, "long_token"
        elif lang != "en":
            kept, reason = 0, "non_english"
        elif n_stop * 1000 < MIN_STOPWORD_PERMILLE * n_tokens:
            kept, reason = 0, "low_stopword"
        elif n1_dup * 1000 > MAX_DUP_PERMILLE * n1_total:
            kept, reason = 0, "repetitive"
        else:
            kept, reason = 1, "ok"
        for name, val in zip(
            _FILTER_SCHEMA.names,
            (d, lang, n_tokens, max_len, n_stop, n1_total, n1_dup, kept, reason),
        ):
            rows[name].append(val)
    return pa.Table.from_pydict(
        {n: pa.array(rows[n], type=_FILTER_SCHEMA.field(n).type) for n in rows}
    )


def corpus_filter(sf_dir: str) -> ray.data.Dataset:
    """Per-doc keep/drop verdict with signals and reason code. One pruned
    scan, zero shuffles — the gate streams at read bandwidth."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(_filter_batch, batch_format="pyarrow")


# ------------------------------------------------------------- sentence dedup
_SENT_LEN = 12  # engine-wide sentence rule (sources/pages.py SENT_TOKENS)
_KEY_SHIFT = 20  # packed key = doc_id << 20 | sent_id (sent_id < 2^20)

def _sent_rows(batch: pa.Table) -> pa.Table:
    """(h, doc_id, cnt, minkey) — pre-combined per (sentence-hash, doc)
    within the block, so shuffle volume is bounded by distinct
    (hash, doc, block), not sentence occurrences."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    acc: dict[tuple[int, int], list[int]] = {}
    for d, t in zip(doc_ids, texts):
        toks = t.split(" ")
        n_sents = (len(toks) + _SENT_LEN - 1) // _SENT_LEN
        if n_sents >= (1 << _KEY_SHIFT):
            # the packed key would spill sent_id into the doc_id bits and
            # silently credit the wrong winner — fail loudly instead
            raise ValueError(
                f"doc {d} has {n_sents} sentences >= 2^{_KEY_SHIFT}; "
                f"raise _KEY_SHIFT (doc too long for the packed key)"
            )
        for sent_id in range(n_sents):
            sent = " ".join(toks[sent_id * _SENT_LEN : (sent_id + 1) * _SENT_LEN])
            h = _stable_u64(sent)
            key = (d << _KEY_SHIFT) | sent_id
            cur = acc.get((h, d))
            if cur is None:
                acc[(h, d)] = [1, key]
            else:
                cur[0] += 1
                if key < cur[1]:
                    cur[1] = key
    ks = sorted(acc)
    return pa.Table.from_pydict(
        {
            "h": pa.array([k[0] for k in ks], type=pa.int64()),
            "doc_id": pa.array([k[1] for k in ks], type=pa.int64()),
            "cnt": pa.array([acc[k][0] for k in ks], type=pa.int64()),
            "minkey": pa.array([acc[k][1] for k in ks], type=pa.int64()),
        }
    )


def sentence_dedup(sf_dir: str) -> ray.data.Dataset:
    """Per-doc (n_sents, n_dup_sents) under the global keep-first rule:
    a sentence occurrence is a duplicate iff an identical sentence exists
    at a smaller (doc_id, sent_id). Dedup key is the 63-bit md5 hash of
    the sentence text (`dedup._stable_u64`; collisions are ~2^-63 per
    pair and would only merge two sentences, as in any hash-keyed dedup).

    Boilerplate-safe shape — NO per-hash group lists and no join. The
    packed occurrence key (doc_id << 20 | sent_id) makes the global
    winner per hash a plain grouped MIN, and the winner key itself
    encodes which doc owns the kept occurrence. Then per doc:

        n_dup_sents = n_sents - #{hashes whose winner this doc owns}

    so a sentence repeated across a billion docs costs one combiner'd
    min-partial per block — state never grows with its popularity. Three
    combiner-friendly shuffles of integer rows; text never shuffles.
    """
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sents = ds.map_batches(_sent_rows, batch_format="pyarrow").materialize()

    # per-doc sentence totals: sum of occurrence counts across hashes
    totals = grouped_sum(
        sents.select_columns(["doc_id", "cnt"]), ["doc_id"], sum_cols=["cnt"]
    ).map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "n_sents": t.column("cnt").cast(pa.int64()),
                "n_win": pa.array([0] * len(t), type=pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    # global winner occurrence per hash = min packed key; the key's high
    # bits name the owning doc, so winner credits need no join-back
    winners = grouped_sum(
        sents.select_columns(["h", "minkey"]),
        ["h"],
        sum_cols=[],
        min_cols=["minkey"],
    )

    def credit_partials(t: pa.Table) -> pa.Table:
        wdoc = t.column("minkey").to_numpy(zero_copy_only=False) >> _KEY_SHIFT
        docs, counts = np.unique(wdoc, return_counts=True)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(docs, type=pa.int64()),
                "n_sents": pa.array(
                    np.zeros(len(docs), dtype=np.int64)
                ),
                "n_win": pa.array(counts.astype(np.int64)),
            }
        )

    credits = winners.map_batches(credit_partials, batch_format="pyarrow")

    merged = grouped_sum(
        totals.union(credits), ["doc_id"], sum_cols=["n_sents", "n_win"]
    )

    def finish(t: pa.Table) -> pa.Table:
        n_sents = t.column("n_sents").to_numpy(zero_copy_only=False)
        n_win = t.column("n_win").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "n_sents": pa.array(n_sents),
                "n_dup_sents": pa.array(n_sents - n_win),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------- near-dup clusters
def near_dup_clusters(sf_dir: str, tau: float = 0.5) -> ray.data.Dataset:
    """(doc_id, cluster, kept) for EVERY document: near-dup clusters from
    exact Jaccard pairs + connected components; keeper = minimum doc_id in
    the cluster (the `exact_dedup` rule); singletons keep themselves.

    Join-free keeper resolution: component labels (tiny — only docs that
    appear in a pair) union a doc_id-only corpus scan, then ONE grouped
    min. Hash-min components satisfy component <= doc_id, so
    min(doc_id, component) IS the cluster id and kept == (cluster ==
    doc_id).
    """
    from ner_pytorch_ray.pipelines.dedup import ngram_jaccard_pairs
    from ner_pytorch_ray.pipelines.graph_ops import components_over_edges
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    pairs = ngram_jaccard_pairs(sf_dir, tau=tau)

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "a": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "b": pa.array(np.concatenate([b, a]), type=pa.int64()),
            }
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow")
    labels = components_over_edges(edges).map_batches(
        lambda t: t.rename_columns(["doc_id", "label"]), batch_format="pyarrow"
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(
        lambda t: pa.Table.from_pydict(
            {"doc_id": t.column("doc_id"), "label": t.column("doc_id")}
        ),
        batch_format="pyarrow",
    )

    merged = grouped_sum(
        docs.union(labels), ["doc_id"], sum_cols=[], min_cols=["label"]
    )

    def verdict(t: pa.Table) -> pa.Table:
        cluster = t.column("label")
        kept = pc.cast(pc.equal(t.column("doc_id"), cluster), pa.int64())
        return pa.Table.from_pydict(
            {"doc_id": t.column("doc_id"), "cluster": cluster, "kept": kept}
        )

    return merged.map_batches(verdict, batch_format="pyarrow")


# ------------------------------------------------------------ sequence pack
def sequence_pack(
    sf_dir: str, seq_len: int = 512
) -> ray.data.Dataset:
    """Pack documents (doc_id order) into fixed-length token sequences —
    the LM-training sequence-packing map: every doc gets its global token
    offset and the [seq_first, seq_last] range of training sequences it
    lands in. The core is a DISTRIBUTED PREFIX SUM over per-doc token
    counts (`groupby_utils.add_exclusive_prefix`):

      1. one scan -> (doc_id, n_tokens) metadata rows;
      2. global sort by doc_id (16-byte rows — the shuffle moves counts,
         never text);
      3. two-phase block prefix: per-block totals -> O(#blocks) driver
         offsets -> per-block local cumsum + base. No driver-side per-row
         or per-chunk state at ANY corpus size (the round-3 version held
         one row per 4096 docs on the driver).

    Output: (doc_id, n_tokens, tok_start, seq_first, seq_last), oracle =
    SQL window SUM OVER (ORDER BY doc_id).
    """
    from ner_pytorch_ray.stages.groupby_utils import add_exclusive_prefix

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def count_rows(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        n = pc.list_value_length(toks).cast(pa.int64())
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id"), "n_tokens": n}
        )

    counts = ds.map_batches(count_rows, batch_format="pyarrow").sort("doc_id")
    with_start = add_exclusive_prefix(counts, "n_tokens", "tok_start")

    def seq_range(batch: pa.Table) -> pa.Table:
        starts = np.asarray(batch.column("tok_start").to_numpy())
        ns = np.asarray(batch.column("n_tokens").to_numpy())
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": batch.column("n_tokens"),
                "tok_start": batch.column("tok_start"),
                "seq_first": pa.array(starts // seq_len, type=pa.int64()),
                "seq_last": pa.array(
                    (starts + np.maximum(ns, 1) - 1) // seq_len,
                    type=pa.int64(),
                ),
            }
        )

    return with_start.map_batches(seq_range, batch_format="pyarrow")


# --------------------------------------------------------- boilerplate mining
def boilerplate_ngrams(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Corpus-global top-k most frequent word trigrams with doc
    frequencies — the stop-gram mining pass behind boilerplate filters
    (the corpus-level complement of the per-doc `repetition_stats`).

    Block-local occurrence/doc-frequency partials -> grouped sum (gram
    table is vocabulary-sized, far below corpus size) -> block-local
    top-k -> single tiny merge. Deterministic order: (-n_occ, gram).
    """
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        occ: dict[str, int] = {}
        df: dict[str, int] = {}
        for t in batch.column("text").to_pylist():
            toks = t.split(" ")
            seen = set()
            for i in range(len(toks) - 2):
                g = " ".join(toks[i : i + 3])
                occ[g] = occ.get(g, 0) + 1
                seen.add(g)
            for g in seen:
                df[g] = df.get(g, 0) + 1
        ks = sorted(occ)
        return pa.Table.from_pydict(
            {
                "gram": pa.array(ks, type=pa.string()),
                "n_occ": pa.array([occ[g] for g in ks], type=pa.int64()),
                "n_docs": pa.array([df[g] for g in ks], type=pa.int64()),
            }
        )

    # shuffle_blocks=None: the gram table scales with corpus vocabulary,
    # so block-local partials barely shrink and the pre-shuffle coalesce
    # would be a second full exchange (grouped_sum docstring's large-
    # keyspace case). The exact global count is inherently one
    # corpus-vocabulary shuffle; it moves (gram, int, int) rows only.
    merged = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["gram"],
        sum_cols=["n_occ", "n_docs"],
        shuffle_blocks=None,
    )

    def local_topk(t: pa.Table) -> pa.Table:
        occ = t.column("n_occ").to_numpy(zero_copy_only=False)
        grams = np.asarray(t.column("gram").to_pylist(), dtype=object)
        idx = np.lexsort((grams, -occ))[:k]  # (-n_occ, gram) order
        return t.take(pa.array(idx))

    def final_topk(t: pa.Table) -> pa.Table:
        t = local_topk(t)
        return t.append_column(
            "rank", pa.array(np.arange(1, len(t) + 1, dtype=np.int64))
        )

    return (
        merged.map_batches(local_topk, batch_format="pyarrow")
        .repartition(1)
        # batch_size=None is LOAD-BEARING: final_topk must see the single
        # repartition(1) block whole — a sub-block batch size would emit one
        # top-k (with duplicate ranks) per sub-batch
        .map_batches(final_topk, batch_format="pyarrow", batch_size=None)
    )


# ------------------------------------------------------ adaptive length gate
def adaptive_length_filter(sf_dir: str, p: float = 0.1) -> ray.data.Dataset:
    """Two-stage DATA-DEPENDENT gate: the keep threshold is the corpus's
    own p-quantile of token counts (distributed histogram walk, reusing
    `analysis.token_count_quantiles`' tested kernel), broadcast as one
    scalar into a second streaming scan. The composition pattern for
    percentile-based filters ("drop the shortest decile") where no fixed
    threshold exists ahead of time."""
    from ner_pytorch_ray.pipelines.analysis import token_count_quantiles

    q = token_count_quantiles(sf_dir, ps=(p,))
    rows = q.to_pylist() if isinstance(q, pa.Table) else q.take_all()
    thr = int(rows[0]["n_tokens"])

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def gate(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(
            pc.split_pattern(batch.column("text"), pattern=" ")
        ).cast(pa.int64())
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": n,
                "threshold": pa.array([thr] * len(batch), type=pa.int64()),
                "kept": pc.cast(
                    pc.greater_equal(n, pa.scalar(thr, type=pa.int64())),
                    pa.int64(),
                ),
            }
        )

    return ds.map_batches(gate, batch_format="pyarrow")


# --------------------------------------------------------- corpus composition
def domain_token_stats(sf_dir: str) -> ray.data.Dataset:
    """Corpus composition by (source, lang): docs, tokens, chars — the
    per-domain token-count report (C4 §2.2 analog). Combiner partials per
    block, then one small grouped sum; group count is bounded by
    |sources| x |langs|, not corpus size."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        tab = pa.Table.from_pydict(
            {
                "source": batch.column("source"),
                "lang": batch.column("lang"),
                "n_docs": pa.array(np.ones(len(batch), dtype=np.int64)),
                "n_tokens": pc.list_value_length(toks).cast(pa.int64()),
                "n_chars": pc.utf8_length(batch.column("text")).cast(pa.int64()),
            }
        )
        agg = tab.group_by(["source", "lang"]).aggregate(
            [("n_docs", "sum"), ("n_tokens", "sum"), ("n_chars", "sum")]
        )
        return pa.Table.from_pydict(
            {
                "source": agg.column("source"),
                "lang": agg.column("lang"),
                "n_docs": agg.column("n_docs_sum"),
                "n_tokens": agg.column("n_tokens_sum"),
                "n_chars": agg.column("n_chars_sum"),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_sum(
        partials, ["source", "lang"], sum_cols=["n_docs", "n_tokens", "n_chars"]
    ).sort(["source", "lang"])


def retrieval_corpus_build(
    sf_dir: str, chunk: int = 32, overlap: int = 8
) -> ray.data.Dataset:
    """Composed end-to-end retrieval-corpus build — the "so what" DAG a
    RAG ingestion job runs: quality gate (``corpus_filter``'s exact rule
    cascade, applied block-local) → overlapping chunker
    (``scrub.chunk_block``) → chunk-level exact dedup → ONE summary row
    (n_docs_kept, n_chunks, n_unique_chunks, total_chunk_tokens).

    Scale shape: the gate and chunker fuse into one streaming scan
    (corpus never shuffles); dedup exchanges only 16-byte blake2b chunk
    digests with block-local pre-combine (``exact_dedup``'s contract);
    doc identity rides the same digest exchange as marker rows, so the
    whole job is ONE key-bounded shuffle + an O(|unique|) fold."""
    import hashlib

    from ner_pytorch_ray.pipelines.scrub import chunk_block
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def gate_and_chunk(batch: pa.Table) -> pa.Table:
        sig = _filter_batch(batch)  # row-aligned with the batch
        kept = batch.filter(pc.equal(sig.column("kept"), pa.scalar(1)))
        chunks = chunk_block(kept, chunk, overlap)
        # digest partials: kind 0 = chunk-text digest, kind 1 = doc marker
        texts = chunks.column("chunk_text").to_pylist()
        digs = [
            hashlib.blake2b(t.encode(), digest_size=16).digest()
            for t in texts
        ]
        toks = chunks.column("n_tokens").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "kind": pa.array(
                    np.zeros(len(digs), dtype=np.int64)
                ),
                "key": pa.array(digs, type=pa.binary(16)),
                "n": pa.array(np.ones(len(digs), dtype=np.int64)),
                "toks": pa.array(toks.astype(np.int64)),
            }
        )
        g = t.group_by(["kind", "key"]).aggregate(
            [("n", "sum"), ("toks", "sum")]
        ).rename_columns(["kind", "key", "n", "toks"])
        doc_ids = kept.column("doc_id").to_numpy(zero_copy_only=False)
        dmark = pa.table(
            {
                "kind": pa.array(np.ones(len(doc_ids), dtype=np.int64)),
                "key": pa.array(
                    [
                        int(d).to_bytes(16, "big", signed=True)
                        for d in doc_ids
                    ],
                    type=pa.binary(16),
                ),
                "n": pa.array(np.ones(len(doc_ids), dtype=np.int64)),
                "toks": pa.array(np.zeros(len(doc_ids), dtype=np.int64)),
            }
        )
        return pa.concat_tables([g, dmark])

    folded = grouped_sum(
        ds.map_batches(gate_and_chunk, batch_format="pyarrow"),
        keys=["kind", "key"],
        sum_cols=["n", "toks"],
    )

    def summarize(batch: pa.Table) -> pa.Table:
        kind = batch.column("kind").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        toks = batch.column("toks").to_numpy(zero_copy_only=False)
        is_chunk = kind == 0
        return pa.table(
            {
                "one": pa.array([1], type=pa.int64()),
                "n_docs_kept": pa.array(
                    [int((~is_chunk).sum())], type=pa.int64()
                ),
                "n_chunks": pa.array(
                    [int(n[is_chunk].sum())], type=pa.int64()
                ),
                "n_unique_chunks": pa.array(
                    [int(is_chunk.sum())], type=pa.int64()
                ),
                "total_chunk_tokens": pa.array(
                    [int(toks[is_chunk].sum())], type=pa.int64()
                ),
            }
        )

    out = grouped_sum(
        folded.map_batches(summarize, batch_format="pyarrow"),
        keys=["one"],
        sum_cols=[
            "n_docs_kept",
            "n_chunks",
            "n_unique_chunks",
            "total_chunk_tokens",
        ],
    )

    def drop_key(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["one"])

    return out.map_batches(drop_key, batch_format="pyarrow")
