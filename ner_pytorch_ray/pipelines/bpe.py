"""Distributed BPE tokenizer training — learn the subword merge table from
the corpus itself.

The reference consumes a FIXED vocabulary (word + char mappings built by
``loader.py:96-133`` ``word_mapping``/``char_mapping``); a web-scale
training-data engine must also LEARN the subword vocabulary its tokenizer
will use.  This implements classic byte-pair-encoding merge learning
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare Words
with Subword Units") Ray-Data-first:

1. **Word counting** — the only corpus-scale stage.  One streaming
   ``map_batches`` pass computes per-block ``(word, freq)`` partials with a
   vectorized Arrow ``value_counts`` (no Python token loop), then ONE
   ``groupby("word").sum`` shuffle folds them.  At 100 TB this moves the
   distinct-word table (~1e8 rows), never the corpus.
2. **Merge loop over the DISTINCT-WORD table** — each word is a
   space-joined symbol string (chars + a ``</w>`` end marker).  Per merge
   round:
   - *pair counting*: ``map_batches`` turns each block into
     ``(left, right, cnt)`` partials via flat ``offsets`` arithmetic over
     the split symbol lists (vectorized numpy, combined block-locally with
     an Arrow-native hash ``group_by``), then one small ``grouped_sum``
     shuffle over the pair table (bounded by the symbol vocabulary, NOT
     the corpus).
   - *argmax*: per-block local top-1 under the total order
     ``(-count, left, right)``, collected (≤ #blocks tiny rows) and reduced
     on the driver.  Top-1 under a total order is associative, so the
     winner is partitioning-independent.
   - *apply*: the winning pair ships in the task closure (two strings);
     a vectorized ``match_substring`` pre-filter finds the words containing
     the pair at a symbol boundary, and ONLY those rows are rewritten with
     the classic greedy left-to-right list merge (typically a small
     fraction of the vocabulary per round).  The word table
     re-materializes per round (like the PageRank loop in
     ``graph_ops.py``) so lineage stays flat.

All counts are exact int64 — bit-identical results under any partitioning
(property-tested).  The sequential oracle is
``tools/make_expected.bpe_expected`` — a plain ``collections.Counter``
re-implementation with the identical tie-break, no engine imports.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ner_pytorch_ray.stages.groupby_utils import grouped_sum

# Scale guard: skip pathological "words" (base64 blobs, URLs) whose symbol
# sequences would dominate pair counting. Frozen: the oracle applies the
# same cap.
WORD_MAX_CHARS = 32

END_OF_WORD = "</w>"


def word_counts(sf_dir: str) -> ray.data.Dataset:
    """(word, freq) over whitespace tokens of ``documents.text`` —
    the corpus-scale distinct-word table."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        flat = pc.list_flatten(toks)
        keep = pc.and_(
            pc.and_(
                pc.greater(pc.utf8_length(flat), 0),
                pc.less_equal(pc.utf8_length(flat), WORD_MAX_CHARS),
            ),
            # exclude words with embedded newlines: the "(.)" symbolizer
            # regex does not match \n, which would desync the symbol
            # representation (oracle applies the same rule)
            pc.invert(pc.match_substring_regex(flat, pattern="[\\n\\r]")),
        )
        vc = flat.filter(keep).value_counts()
        return pa.Table.from_pydict(
            {
                "word": vc.field("values"),
                "freq": vc.field("counts").cast(pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_sum(parts, keys=["word"], sum_cols=["freq"])


def symbolized_words(sf_dir: str) -> ray.data.Dataset:
    """Word table plus ``sym``: the word as a space-joined symbol string
    ``"h e l l o </w>"`` — one vectorized RE2 rewrite, no row loop."""

    def add_sym(batch: pa.Table) -> pa.Table:
        w = batch.column("word")
        # "(.)" matches one codepoint; "\\1 " interleaves spaces, leaving a
        # trailing space the end-of-word marker concatenates onto.
        spaced = pc.replace_substring_regex(
            w, pattern="(.)", replacement="\\1 "
        )
        sym = pc.binary_join_element_wise(
            spaced,
            pa.array([END_OF_WORD] * len(batch), type=pa.string()),
            "",
        )
        return batch.append_column("sym", sym)

    return word_counts(sf_dir).map_batches(add_sym, batch_format="pyarrow")


def _pair_partials(batch: pa.Table) -> pa.Table:
    """Per-block (left, right, cnt) partials: adjacent symbol pairs of each
    word weighted by its corpus frequency. Flat offsets arithmetic over the
    split lists; block-local combine via Arrow hash group_by."""
    empty = pa.Table.from_pydict(
        {
            "left": pa.array([], type=pa.string()),
            "right": pa.array([], type=pa.string()),
            "cnt": pa.array([], type=pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    lists = pc.split_pattern(batch.column("sym"), pattern=" ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    freq = batch.column("freq").to_numpy()
    return _pairs_from_lists(lists, freq, empty)


def _pairs_from_lists(
    lists: pa.ListArray, freq: np.ndarray, empty: pa.Table
) -> pa.Table:
    """Flat-offset adjacent-pair kernel; handles sliced ListArrays.

    Normalize the slice offset (offs may not start at 0 for a sliced
    ListArray) and use flatten() — which respects the slice — instead of
    raw .values, matching the other flat-offset kernels (dedup.postings,
    scrub.chunk_block, analysis partials)."""
    offsets = lists.offsets.to_numpy()
    offsets = offsets - offsets[0]
    values = lists.flatten()
    counts = np.diff(offsets)
    n = len(values)
    if n == 0:
        return empty
    # valid pair-start positions: every value index except each list's last
    valid = np.ones(n, dtype=bool)
    last = offsets[1:] - 1
    valid[last[counts > 0]] = False
    idx = np.flatnonzero(valid)
    if len(idx) == 0:
        return empty
    list_ids = np.repeat(np.arange(len(counts)), counts)
    t = pa.Table.from_pydict(
        {
            "left": values.take(pa.array(idx)),
            "right": values.take(pa.array(idx + 1)),
            "cnt": pa.array(freq[list_ids[idx]], type=pa.int64()),
        }
    )
    return (
        t.group_by(["left", "right"])
        .aggregate([("cnt", "sum")])
        .rename_columns(["left", "right", "cnt"])
    )


def _local_top1(batch: pa.Table) -> pa.Table:
    """Block-local best pair under the total order (-cnt, left, right)."""
    if batch.num_rows == 0:
        return batch
    rows = list(
        zip(
            batch.column("cnt").to_pylist(),
            batch.column("left").to_pylist(),
            batch.column("right").to_pylist(),
        )
    )
    cnt, left, right = min(rows, key=lambda r: (-r[0], r[1], r[2]))
    return pa.Table.from_pydict(
        {
            "left": pa.array([left], type=pa.string()),
            "right": pa.array([right], type=pa.string()),
            "cnt": pa.array([cnt], type=pa.int64()),
        }
    )


def _merge_word(symbols: list[str], left: str, right: str) -> list[str]:
    """Classic greedy left-to-right single-pair merge."""
    out: list[str] = []
    i, n = 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _apply_merge(left: str, right: str):
    pat = f" {left} {right} "

    def apply(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        pad = pa.array([" "] * len(batch), type=pa.string())
        padded = pc.binary_join_element_wise(
            pad, batch.column("sym"), pad, ""
        )
        hits = pc.match_substring(padded, pattern=pat).to_numpy(
            zero_copy_only=False
        )
        if not hits.any():
            return batch
        sym = batch.column("sym").to_pylist()
        for i in np.flatnonzero(hits):
            sym[int(i)] = " ".join(
                _merge_word(sym[int(i)].split(" "), left, right)
            )
        return batch.set_column(
            batch.schema.get_field_index("sym"),
            "sym",
            pa.array(sym, type=pa.string()),
        )

    return apply


def train_merges(
    state: ray.data.Dataset, n_merges: int, min_count: int
) -> tuple[list[tuple[int, str, str, int]], ray.data.Dataset]:
    """Run the merge loop over a symbolized word table; returns
    (merge list, final word-symbol table)."""
    state = state.materialize()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = grouped_sum(
            state.map_batches(_pair_partials, batch_format="pyarrow"),
            keys=["left", "right"],
            sum_cols=["cnt"],
        )
        tops = pairs.map_batches(
            _local_top1, batch_format="pyarrow"
        ).take_all()
        if not tops:
            break
        best = min(tops, key=lambda r: (-r["cnt"], r["left"], r["right"]))
        if best["cnt"] < min_count:
            break
        left, right = best["left"], best["right"]
        merges.append((rank, left, right, int(best["cnt"])))
        state = state.map_batches(
            _apply_merge(left, right), batch_format="pyarrow"
        ).materialize()
    return merges, state


def bpe_train(
    sf_dir: str, n_merges: int = 20, min_count: int = 2
) -> ray.data.Dataset:
    """Learn ``n_merges`` BPE merges over the document corpus; returns the
    merge table (rank:int64, left:string, right:string, pair_count:int64)
    in learned order. Stops early when no pair reaches ``min_count``."""
    merges, _ = train_merges(symbolized_words(sf_dir), n_merges, min_count)
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "rank": pa.array([m[0] for m in merges], type=pa.int64()),
                "left": pa.array([m[1] for m in merges], type=pa.string()),
                "right": pa.array([m[2] for m in merges], type=pa.string()),
                "pair_count": pa.array(
                    [m[3] for m in merges], type=pa.int64()
                ),
            }
        )
    )


def bpe_piece_stats(
    sf_dir: str, n_merges: int = 20, min_count: int = 2
) -> ray.data.Dataset:
    """Segmentation-quality summary after training: for each piece-per-word
    count, how many DISTINCT words segment into that many pieces and their
    total corpus frequency — (n_pieces:int64, n_words:int64,
    total_freq:int64), the standard 'is the learned vocab compressing'
    diagnostic. Distributed: per-block partials + one tiny grouped_sum."""
    _, state = train_merges(symbolized_words(sf_dir), n_merges, min_count)

    def stats(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "n_pieces": pa.array([], type=pa.int64()),
                    "n_words": pa.array([], type=pa.int64()),
                    "total_freq": pa.array([], type=pa.int64()),
                }
            )
        pieces = pc.list_value_length(
            pc.split_pattern(batch.column("sym"), pattern=" ")
        ).cast(pa.int64())
        t = pa.Table.from_pydict(
            {
                "n_pieces": pieces,
                "n_words": pa.array([1] * len(batch), type=pa.int64()),
                "total_freq": batch.column("freq"),
            }
        )
        return (
            t.group_by(["n_pieces"])
            .aggregate([("n_words", "sum"), ("total_freq", "sum")])
            .rename_columns(["n_pieces", "n_words", "total_freq"])
        )

    return grouped_sum(
        state.map_batches(stats, batch_format="pyarrow"),
        keys=["n_pieces"],
        sum_cols=["n_words", "total_freq"],
    ).sort("n_pieces")


# ------------------------------------------------------------ encode apply
def _encode_word(word: str, ranks: dict) -> list[str]:
    """Deterministic BPE encode of one word with a trained merge table:
    start from chars + ``</w>``; repeatedly apply the LOWEST-rank merge
    present (greedy left-to-right within a rank), until no trained pair
    remains — the standard inference-time algorithm (Sennrich et al.
    2016), identical piece output to applying the merges in rank order."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        syms = _merge_word(syms, best_pair[0], best_pair[1])
    return syms


class BpeEncoder:
    """Actor-pool tokenizer: the merge table builds ONCE per actor in
    ``__init__`` (rank dict + a distinct-word piece cache that persists
    across batches — the classic tokenizer memoization, impossible in a
    per-batch closure), then each ``__call__`` encodes a batch of
    documents and emits per-doc token accounting."""

    def __init__(self, merges_ref):
        import ray

        rows = ray.get(merges_ref)
        self._ranks = {
            (left, right): rank for rank, left, right in rows
        }
        self._cache: dict = {}

    def _pieces(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            n = len(_encode_word(word, self._ranks))
            self._cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        n_words = pc.list_value_length(toks).cast(pa.int64())
        pieces = [
            sum(self._pieces(w) for w in words)
            for words in toks.to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": n_words,
                "n_pieces": pa.array(pieces, type=pa.int64()),
            }
        )


def bpe_encoded_lengths(
    sf_dir: str,
    n_merges: int = 20,
    min_count: int = 2,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 256,
) -> ray.data.Dataset:
    """Tokenize the corpus with its OWN learned BPE vocabulary: train the
    merge table (distinct-word-table loop), broadcast it once with
    ``ray.put``, then one streaming actor-pool pass over ``documents``
    emits exact per-doc (doc_id, n_words, n_pieces). The encode state
    (rank dict + word→pieces memo) lives in actor ``__init__``; the
    corpus never shuffles."""
    import ray

    merges, _ = train_merges(symbolized_words(sf_dir), n_merges, min_count)
    merges_ref = ray.put([(m[0], m[1], m[2]) for m in merges])
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(
        BpeEncoder,
        fn_constructor_args=(merges_ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    ).sort("doc_id")
