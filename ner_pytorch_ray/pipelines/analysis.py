"""Text-analysis operators over the documents/pages tables.

Covers SURVEY.md §2.5 A1/A2 (vocabulary counting — the reference's
create_dico/create_mapping, utils.py:44-67) plus the training-data-pipeline
text ops (token counting, quality scoring, language-ID, fingerprinting).
All counting is two-phase: vectorized block-local partials inside
``map_batches``, then a small ``groupby().sum`` shuffle over partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _token_count_partial(batch: pa.Table) -> pa.Table:
    toks = pc.list_flatten(pc.split_pattern(batch.column("text"), pattern=" "))
    vc = toks.value_counts()
    return pa.Table.from_pydict(
        {
            "token": vc.field("values").cast(pa.string()),
            "freq": vc.field("counts").cast(pa.int64()),
        }
    )


def vocab_count(sf_dir: str) -> ray.data.Dataset:
    """token -> corpus frequency (A1). Partial value_counts per block, then a
    tiny groupby-sum shuffle; sorted by (-freq, token) like create_mapping
    (utils.py:59-67)."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    partial = ds.map_batches(_token_count_partial, batch_format="pyarrow")
    merged = grouped_sum(partial, ["token"], sum_cols=["freq"])
    return merged.sort(["freq", "token"], descending=[True, False])


def vocab_mapping(sf_dir: str) -> dict[str, int]:
    """create_mapping semantics (utils.py:59-67) as a DRIVER-SIDE dict — the
    convenience form the neural path feeds to encode_stage with a small
    (sampled or gated) vocabulary. Inherently a collect because the return
    type is a dict; web-scale callers use :func:`vocab_mapping_table`, whose
    ranking never materializes on the driver."""
    rows = vocab_mapping_table(sf_dir).take_all()
    return {r["token"]: r["word_id"] for r in rows}


def vocab_mapping_table(sf_dir: str) -> ray.data.Dataset:
    """create_mapping as a Dataset (token, word_id): contiguous ids ranked
    by (-freq, token) — utils.py:59-67 determinism — WITHOUT a driver
    collect. vocab_count's distributed sort puts blocks in global rank
    order; add_global_index assigns each block's id range from an O(#blocks)
    metadata prefix sum. At web scale (1e8+ distinct tokens incl. the typo
    tail) the driver holds block counts, never the vocabulary."""
    from ner_pytorch_ray.stages.groupby_utils import add_global_index

    ranked = add_global_index(vocab_count(sf_dir), col="word_id")

    def project(t: pa.Table) -> pa.Table:
        return t.select(["token", "word_id"])

    return ranked.map_batches(project, batch_format="pyarrow")


# BPE-ish tokenization regex (RE2-safe: identical semantics in pyarrow's
# count_substring_regex and DuckDB's regexp_extract_all): letter runs,
# digit runs, or single non-space symbols.
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_token_counts(sf_dir: str) -> ray.data.Dataset:
    """Per-document token counts under whitespace AND a BPE-ish regex
    tokenizer — the token-counting op of a training-data pipeline, fully
    vectorized (one RE2 scan per batch column)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def stats(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        ws = pc.list_value_length(pc.split_pattern(text, pattern=" "))
        bpe = pc.count_substring_regex(text, pattern=BPE_TOKEN_RE)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_ws_tokens": ws.cast(pa.int64()),
                "n_bpe_tokens": bpe.cast(pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def _doc_stats(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    toks = pc.split_pattern(text, pattern=" ")
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pc.list_value_length(toks).cast(pa.int64()),
            "text_chars": pc.utf8_length(text).cast(pa.int64()),
        }
    )


def doc_token_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-document token/char counts (token-counting op), fully vectorized."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(_doc_stats, batch_format="pyarrow")


def lang_counts(sf_dir: str) -> ray.data.Dataset:
    """Document count per declared language (filter/agg demo)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])

    def partial(batch: pa.Table) -> pa.Table:
        vc = batch.column("lang").combine_chunks().value_counts()
        return pa.Table.from_pydict(
            {
                "lang": vc.field("values").cast(pa.string()),
                "n_docs": vc.field("counts").cast(pa.int64()),
            }
        )

    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_sum(partials, ["lang"], sum_cols=["n_docs"]).sort("lang")


def subword_offsets(sf_dir: str) -> ray.data.Dataset:
    """C7 (get_bert_embedding.py:59-63): per-token first-subword index in
    the sentence's subword stream (1-based; position 0 = [CLS]).

    Per batch: unique tokens resolve their piece count ONCE (dictionary
    encode), then offsets are a per-sentence cumulative sum — no per-token
    re-tokenization. Output: (url, sent_id, position, token, sub_start,
    n_subwords), SQL-verifiable via regexp_extract_all + a window cumsum.
    """
    from ner_pytorch_ray.functions.subword import subword_tokenize
    from ner_pytorch_ray.sources.pages import pages_from_documents
    from ner_pytorch_ray.stages.extract import extract_stage
    from ner_pytorch_ray.stages.sentences import sentences_stage

    sents = sentences_stage(
        extract_stage(pages_from_documents(sf_dir)), zeros=True
    )

    def offs(batch: pa.Table) -> pa.Table:
        tokens = batch.column("tokens")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        lens = pc.list_value_length(tokens).to_numpy().astype(np.int64)
        offsets = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        flat = pc.list_flatten(tokens)
        enc = flat.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        uniq = enc.dictionary.to_pylist()
        codes = np.asarray(
            enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64
        )
        piece_of = np.array(
            [len(subword_tokenize(w)) for w in uniq], dtype=np.int64
        )
        n_sub = piece_of[codes]
        # per-sentence exclusive cumsum + 1
        cs = np.zeros(len(n_sub) + 1, dtype=np.int64)
        np.cumsum(n_sub, out=cs[1:])
        sent_base = np.repeat(cs[offsets[:-1]], lens)
        sub_start = cs[:-1] - sent_base + 1
        row_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        position = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            offsets[:-1], lens
        )
        take = pa.array(row_idx)
        return pa.Table.from_pydict(
            {
                "url": pc.take(batch.column("url"), take),
                "sent_id": pc.take(batch.column("sent_id"), take),
                "position": pa.array(position, type=pa.int64()),
                "token": flat.cast(pa.string()),
                "sub_start": pa.array(sub_start, type=pa.int64()),
                "n_subwords": pa.array(n_sub, type=pa.int64()),
            }
        )

    return sents.map_batches(offs, batch_format="pyarrow")


def tfidf_top_terms(
    sf_dir: str, k: int = 5, broadcast_df: bool = True
) -> ray.data.Dataset:
    """Per-document top-``k`` terms by tf-idf (A1-family corpus statistic
    every training-data pipeline needs for keyword/boilerplate analysis).

    idf uses a SCALED-INTEGER surrogate — ``idf_i = (1_000_000 * N) // df``
    — instead of ``ln(N/df)``: rank-equivalent per fixed tf (monotone in
    N/df), and exactly representable, so the driver's DuckDB oracle
    compares bit-for-bit (libm ``ln`` differs across engines in the last
    ulp). score_i = tf * idf_i; ties break on term asc.

    Scale shape: per-block (doc, term, tf) partials (docs never split
    across blocks after the read). Two df attachment paths:
      * ``broadcast_df=True`` (default): the df table ships once via
        ``ray.put`` — right while the vocabulary fits a broadcast;
      * ``broadcast_df=False``: term-keyed collect co-locates each term's
        df with its (doc, tf) postings, then a doc-keyed collect rebuilds
        per-doc postings for the top-k cut — two bounded-group shuffles,
        no vocab-sized object anywhere (the 10^8-term path). Both paths
        emit identical rows (tested).
    """
    from collections import Counter

    import ray as _ray

    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def df_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(set(t.split(" ")))
        return pa.Table.from_pydict(
            {
                "term": pa.array(list(c.keys()), type=pa.string()),
                "df": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    df_tbl = grouped_sum(
        ds.map_batches(df_partial, batch_format="pyarrow"), ["term"], ["df"]
    )
    n_docs = ds.count()
    if not broadcast_df:
        return _tfidf_via_join(ds, df_tbl, n_docs, k)
    df_map: dict[str, int] = {}
    for b in df_tbl.iter_batches(batch_format="pyarrow"):
        for t, d in zip(b.column("term").to_pylist(), b.column("df").to_pylist()):
            df_map[t] = df_map.get(t, 0) + d
    df_ref = _ray.put(df_map)

    class TopK:
        """Actor pool: the vocab-sized df dict is fetched/deserialized ONCE
        per worker in __init__ (not once per batch — per-batch ray.get of a
        broadcast is the anti-pattern every other broadcast consumer in the
        package avoids)."""

        def __init__(self, df_ref, n_docs, k):
            import ray as _r

            self.dfm = _r.get(df_ref)
            self.n_docs, self.k = n_docs, k

        def __call__(self, batch: pa.Table) -> pa.Table:
            dfm, n_docs, k = self.dfm, self.n_docs, self.k
            out = {c: [] for c in ("doc_id", "term", "tf", "df", "score_i", "rank")}
            for d, t in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            ):
                tf = Counter(t.split(" "))
                scored = sorted(
                    (
                        (-c * ((1_000_000 * n_docs) // dfm[w]), w, c)
                        for w, c in tf.items()
                    ),
                )[:k]
                for r, (neg_s, w, c) in enumerate(scored, start=1):
                    out["doc_id"].append(d)
                    out["term"].append(w)
                    out["tf"].append(c)
                    out["df"].append(dfm[w])
                    out["score_i"].append(-neg_s)
                    out["rank"].append(r)
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                    "term": pa.array(out["term"], type=pa.string()),
                    "tf": pa.array(out["tf"], type=pa.int64()),
                    "df": pa.array(out["df"], type=pa.int64()),
                    "score_i": pa.array(out["score_i"], type=pa.int64()),
                    "rank": pa.array(out["rank"], type=pa.int64()),
                }
            )

    return ds.map_batches(
        TopK,
        fn_constructor_args=(df_ref, n_docs, k),
        concurrency=(1, 32),
        batch_format="pyarrow",
    )


def token_count_quantiles(
    sf_dir: str, ps: tuple = (0.25, 0.5, 0.75, 0.9, 0.99)
) -> ray.data.Dataset:
    """Discrete quantiles of per-document token counts — the classic
    two-phase distributed percentile: block-local value histograms (token
    counts are small-cardinality ints) -> tiny grouped sum -> driver-side
    cumulative walk. quantile_disc semantics: smallest value whose
    cumulative count reaches ceil(p * N). No sort of the data, ever."""
    import math

    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def hist(batch: pa.Table) -> pa.Table:
        counts = pc.list_value_length(
            pc.split_pattern(batch.column("text"), pattern=" ")
        ).cast(pa.int64())
        vc = counts.combine_chunks().value_counts() if isinstance(
            counts, pa.ChunkedArray
        ) else counts.value_counts()
        return pa.Table.from_pydict(
            {
                "n_tokens": vc.field("values").cast(pa.int64()),
                "freq": vc.field("counts").cast(pa.int64()),
            }
        )

    merged = grouped_sum(
        ds.map_batches(hist, batch_format="pyarrow"), ["n_tokens"], ["freq"]
    )
    # the histogram is tiny (distinct token counts), the walk is driver-side
    pairs = sorted(
        (r["n_tokens"], r["freq"])
        for b in merged.iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    )
    total = sum(f for _, f in pairs)
    out_p, out_v = [], []
    for p in ps:
        need = max(1, math.ceil(p * total))
        acc = 0
        for v, f in pairs:
            acc += f
            if acc >= need:
                out_p.append(float(p))
                out_v.append(int(v))
                break
    return pa.Table.from_pydict(
        {
            "p": pa.array(out_p, type=pa.float64()),
            "n_tokens": pa.array(out_v, type=pa.int64()),
        }
    )


def _tfidf_via_join(
    ds: ray.data.Dataset, df_tbl: ray.data.Dataset, n_docs: int, k: int
) -> ray.data.Dataset:
    """Broadcast-free tf-idf: term-keyed df attachment + doc-keyed top-k.

    Postings (doc_id, term, tf) union with df rows (term marked doc_id=-1);
    one term-keyed collect attaches df to every posting (group = one term's
    postings — the same bounded-bucket shape as the shingle index, with the
    stop-term caveat that a term in EVERY doc makes its group corpus-sized;
    such terms have minimal idf and could be capped like stop-shingles);
    one doc-keyed collect then rebuilds per-doc postings for the local
    top-k cut."""
    from collections import Counter

    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    def postings(batch: pa.Table) -> pa.Table:
        out = {"term": [], "doc_id": [], "tf": []}
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for w, c in Counter(t.split(" ")).items():
                out["term"].append(w)
                out["doc_id"].append(d)
                out["tf"].append(c)
        return pa.Table.from_pydict(
            {
                "term": pa.array(out["term"], type=pa.string()),
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "tf": pa.array(out["tf"], type=pa.int64()),
            }
        )

    def df_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "term": batch.column("term"),
                "doc_id": pa.array([-1] * len(batch), type=pa.int64()),
                "tf": batch.column("df"),
            }
        )

    both = ds.map_batches(postings, batch_format="pyarrow").union(
        df_tbl.map_batches(df_rows, batch_format="pyarrow")
    )
    per_term = collect_tuples(both, ["term"], ["doc_id", "tf"], name="p")

    attach_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.string()),
            ("tf", pa.int64()),
            ("df", pa.int64()),
        ]
    )

    def attach(key, items) -> pa.Table:
        if items is None or not items:
            return attach_schema.empty_table()
        (term,) = key
        df = next((tf for d, tf in items if d == -1), None)
        if df is None:
            return attach_schema.empty_table()
        docs = [(d, tf) for d, tf in items if d != -1]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                "term": pa.array([term] * len(docs), type=pa.string()),
                "tf": pa.array([tf for _, tf in docs], type=pa.int64()),
                "df": pa.array([df] * len(docs), type=pa.int64()),
            }
        )

    attached = flat_map_groups(per_term, attach, ["term"], items_col="p")
    per_doc = collect_tuples(attached, ["doc_id"], ["term", "tf", "df"], name="p")

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.string()),
            ("tf", pa.int64()),
            ("df", pa.int64()),
            ("score_i", pa.int64()),
            ("rank", pa.int64()),
        ]
    )

    def topk(key, items) -> pa.Table:
        if items is None or not items:
            return out_schema.empty_table()
        (doc_id,) = key
        scored = sorted(
            (
                (-tf * ((1_000_000 * n_docs) // df), w, tf, df)
                for w, tf, df in {tuple(x) for x in items}
            )
        )[:k]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([doc_id] * len(scored), type=pa.int64()),
                "term": pa.array([s[1] for s in scored], type=pa.string()),
                "tf": pa.array([s[2] for s in scored], type=pa.int64()),
                "df": pa.array([s[3] for s in scored], type=pa.int64()),
                "score_i": pa.array([-s[0] for s in scored], type=pa.int64()),
                "rank": pa.array(
                    range(1, len(scored) + 1), type=pa.int64()
                ),
            }
        )

    return flat_map_groups(per_doc, topk, ["doc_id"], items_col="p")


def value_histogram(sf_dir: str, n_bins: int = 16) -> ray.data.Dataset:
    """Equi-width histogram of the event value (exact cents) — the
    column-statistics primitive a query optimizer feeds on.

    Two streaming passes: (1) one global (min, max) aggregate (two int64
    scalars to the driver), (2) vectorized integer binning per block
    (``bin = (v - lo) * n_bins // span`` — pure int64 arithmetic, so the
    SQL oracle computes the identical bin for every row) + one grouped
    sum over at most ``n_bins`` keys. Empty bins are emitted with
    n_events = 0 so the output shape is the bin count, not the data."""
    from ner_pytorch_ray.pipelines.relational import _cents
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["value"]
    ).map_batches(
        lambda b: pa.table({"cents": _cents(b.column("value"))}),
        batch_format="pyarrow",
    ).materialize()

    mm = ds.aggregate(
        ray.data.aggregate.Min("cents"), ray.data.aggregate.Max("cents")
    )
    lo, hi = int(mm["min(cents)"]), int(mm["max(cents)"])
    span = hi - lo + 1  # +1 so v == hi lands in the last bin

    def binned(batch: pa.Table) -> pa.Table:
        v = batch.column("cents").to_numpy(zero_copy_only=False)
        b = (v - lo) * n_bins // span
        bins, counts = np.unique(b, return_counts=True)
        return pa.table(
            {
                "bin": pa.array(bins.astype(np.int64)),
                "n_events": pa.array(counts.astype(np.int64)),
            }
        )

    filled = grouped_sum(
        ds.map_batches(binned, batch_format="pyarrow").union(
            ray.data.from_arrow(
                pa.table(
                    {
                        "bin": pa.array(range(n_bins), pa.int64()),
                        "n_events": pa.array([0] * n_bins, pa.int64()),
                    }
                )
            )
        ),
        ["bin"],
        sum_cols=["n_events"],
    )

    def edges(batch: pa.Table) -> pa.Table:
        b = batch.column("bin").to_numpy(zero_copy_only=False)
        # smallest v with (v-lo)*n_bins//span == k is ceil(k*span/n_bins)+lo
        lo_edge = lo + (b * span + n_bins - 1) // n_bins
        hi_edge = lo + ((b + 1) * span + n_bins - 1) // n_bins - 1
        return pa.table(
            {
                "bin": batch.column("bin"),
                "lo_cents": pa.array(lo_edge.astype(np.int64)),
                "hi_cents": pa.array(hi_edge.astype(np.int64)),
                "n_events": batch.column("n_events"),
            }
        )

    return filled.map_batches(edges, batch_format="pyarrow").sort("bin")


def profile_table(sf_dir: str, table: str = "orders") -> ray.data.Dataset:
    """Column-profile sweep — the data-quality / optimizer-stats report
    (n_nulls, exact n_distinct, lexicographic min/max of the canonical
    string form) for EVERY column of a table in two exchanges:

    1. per block, per column: null count + the block's DISTINCT canonical
       values as (column, value) rows — the only thing that shuffles is
       the per-block distinct reduction, never the rows;
    2. one grouped distinct over (column, value) -> per-column counts +
       min/max by a second tiny aggregate over |columns| x |distinct|
       keys.

    Canonical string form: timestamps as epoch micros, floats as exact
    cents (the table_checksum convention), so the SQL oracle compares
    identically."""
    import pyarrow.compute as pc

    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet")

    def canon(col):
        t = col.type
        if pa.types.is_timestamp(t):
            col = pc.cast(col, pa.int64())
        elif pa.types.is_floating(t):
            col = pc.cast(
                pc.round(
                    pc.multiply(col, pa.scalar(100.0)),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
        return pc.cast(col, pa.string())

    ds = ds.materialize()

    def value_partial(batch: pa.Table) -> pa.Table:
        cols, vals = [], []
        for c in sorted(batch.column_names):
            uniq = pc.drop_null(canon(batch.column(c)).combine_chunks().unique())
            cols.extend([c] * len(uniq))
            vals.extend(uniq.to_pylist())
        return pa.table(
            {
                "column": pa.array(cols, pa.string()),
                "value": pa.array(vals, pa.string()),
                "one": pa.array(np.ones(len(cols), np.int64)),
            }
        )

    def null_partial(batch: pa.Table) -> pa.Table:
        cols = sorted(batch.column_names)
        return pa.table(
            {
                "column": pa.array(cols, pa.string()),
                "n_nulls": pa.array(
                    [
                        int(
                            pc.sum(
                                pc.is_null(batch.column(c)).cast(pa.int8())
                            ).as_py()
                            or 0
                        )
                        for c in cols
                    ],
                    pa.int64(),
                ),
            }
        )

    # exchange 1: the per-block DISTINCT reduction per column
    per_value = grouped_sum(
        ds.map_batches(value_partial, batch_format="pyarrow"),
        ["column", "value"],
        sum_cols=["one"],
    )
    # exchange 2 (tiny): per-column null totals, |columns| x #blocks rows
    nulls = {
        r["column"]: r["n_nulls"]
        for r in grouped_sum(
            ds.map_batches(null_partial, batch_format="pyarrow"),
            ["column"],
            sum_cols=["n_nulls"],
        ).take_all()
    }

    def col_partial(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["column"]).aggregate(
            [("value", "min"), ("value", "max"), ([], "count_all")]
        )
        return out.rename_columns(
            ["column", "min_value", "max_value", "n_distinct"]
        )

    from ray.data.aggregate import Max, Min, Sum

    final = (
        per_value.map_batches(col_partial, batch_format="pyarrow")
        .groupby("column")
        .aggregate(Sum("n_distinct"), Min("min_value"), Max("max_value"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.rename_columns(
            ["column", "n_distinct", "min_value", "max_value"]
        )
        cols = t.column("column").to_pylist()
        return pa.table(
            {
                "column": t.column("column"),
                "n_distinct": t.column("n_distinct").cast(pa.int64()),
                "n_nulls": pa.array(
                    [nulls[c] for c in cols], pa.int64()
                ),
                "min_value": t.column("min_value"),
                "max_value": t.column("max_value"),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow").sort("column")


def equidepth_histogram(sf_dir: str, n_bins: int = 8) -> ray.data.Dataset:
    """Equi-DEPTH histogram of the event value — the complement of
    :func:`value_histogram`: bins hold (near-)equal ROW counts instead of
    equal value ranges, which is what selectivity estimators want on
    skewed columns.

    Exact integer spec shared with the SQL oracle: rows sort globally by
    (cents, event_id), each row's bin is ``(global_rank * n_bins) // n``
    (rank 0-based), then one grouped aggregate per bin emits count and
    the bin's min/max cents. The distributed rank comes from
    ``add_global_index`` (per-block offset prefix over metadata — no
    driver materialization), so the only full exchange is the sort."""
    from ner_pytorch_ray.pipelines.relational import _cents
    from ner_pytorch_ray.stages.groupby_utils import (
        add_global_index,
        grouped_sum,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cents": _cents(batch.column("value")),
                "event_id": batch.column("event_id"),
            }
        )

    ordered = add_global_index(
        ds.map_batches(prep, batch_format="pyarrow").sort(
            ["cents", "event_id"]
        ),
        col="r",
    )
    n = ordered.count()

    def binned(batch: pa.Table) -> pa.Table:
        r = batch.column("r").to_numpy(zero_copy_only=False)
        c = batch.column("cents").to_numpy(zero_copy_only=False)
        b = (r * n_bins) // n
        t = pa.table(
            {
                "bin": pa.array(b.astype(np.int64)),
                "n_events": pa.array(np.ones(len(b), np.int64)),
                "lo_cents": pa.array(c),
                "hi_cents": pa.array(c),
            }
        )
        g = t.group_by(["bin"]).aggregate(
            [("n_events", "sum"), ("lo_cents", "min"), ("hi_cents", "max")]
        )
        return g.rename_columns(["bin", "n_events", "lo_cents", "hi_cents"])

    merged = grouped_sum(
        ordered.map_batches(binned, batch_format="pyarrow"),
        ["bin"],
        sum_cols=["n_events"],
        min_cols=["lo_cents"],
    )
    # max needs its own tiny pass over the per-block partials
    from ray.data.aggregate import Max

    mx = {
        r["bin"]: r["max(hi_cents)"]
        for r in ordered.map_batches(binned, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Max("hi_cents"))
        .take_all()
    }

    def attach(batch: pa.Table) -> pa.Table:
        bins = batch.column("bin").to_pylist()
        return pa.table(
            {
                "bin": batch.column("bin"),
                "n_events": batch.column("n_events"),
                "lo_cents": batch.column("lo_cents"),
                "hi_cents": pa.array(
                    [mx[b] for b in bins], pa.int64()
                ),
            }
        )

    return merged.map_batches(attach, batch_format="pyarrow").sort("bin")


def collocations(sf_dir: str, min_count: int = 3) -> ray.data.Dataset:
    """PMI-style bigram collocation mining (the classic "which word pairs
    stick together" corpus statistic — Manning & Schütze ch. 5): every
    adjacent whitespace bigram occurring >= ``min_count`` times, with its
    lift score ``lift_ppm = 1e6 * n_ab * N // (n_w1 * n_w2)`` (N = corpus
    token count) — the exact integer monotone transform of pointwise
    mutual information (PMI = log of lift/1e6), so ranking by it IS
    ranking by PMI while staying bit-reproducible.

    Distributed shape: ONE corpus scan emits kind-tagged (unigram,
    bigram) count partials — bigrams built from the flattened token
    buffer with doc-boundary masking, counted via Arrow's native hash
    group_by per block — then one grouped sum over the tagged keyspace.
    Unigram counts attach to the surviving bigrams through Ray Data's
    partitioned hash join (twice, once per endpoint): a hot word like
    "the" pairs with vocabulary-many partners, so the union-tag keyed
    collect the graph annotates with would build an unbounded group here;
    the streaming hash join has no per-group state. The lift arithmetic
    is size-routed: int64 numpy when the block's max product fits, exact
    Python big-ints otherwise (counts at 100 TB overflow
    1e6 * n_ab * N)."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]  # absolute offsets of a sliced array
        uni = flat.value_counts()
        n_uni = len(uni)
        n_flat = len(flat)
        tables = [
            pa.Table.from_pydict(
                {
                    "kind": pa.array([0] * n_uni, type=pa.int64()),
                    "w1": uni.field("values").cast(pa.string()),
                    "w2": pa.array([""] * n_uni, type=pa.string()),
                    "n": uni.field("counts").cast(pa.int64()),
                }
            )
        ]
        if n_flat >= 2:
            # adjacent pairs in the flat buffer, masking doc boundaries
            keep = np.ones(n_flat - 1, dtype=bool)
            ends = offs[1:-1] - 1  # last token of each doc but the last
            keep[ends[(ends >= 0) & (ends < n_flat - 1)]] = False
            idx = np.flatnonzero(keep)
            pairs = pa.table(
                {
                    "w1": flat.take(pa.array(idx, type=pa.int64())),
                    "w2": flat.take(pa.array(idx + 1, type=pa.int64())),
                }
            )
            g = pairs.group_by(["w1", "w2"]).aggregate([([], "count_all")])
            nb = len(g)
            tables.append(
                pa.Table.from_pydict(
                    {
                        "kind": pa.array([1] * nb, type=pa.int64()),
                        "w1": g.column("w1").cast(pa.string()),
                        "w2": g.column("w2").cast(pa.string()),
                        "n": g.column("count_all").cast(pa.int64()),
                    }
                )
            )
        return pa.concat_tables(tables)

    counts = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["kind", "w1", "w2"],
        sum_cols=["n"],
    ).materialize()

    uni = counts.filter(expr="kind == 0").select_columns(["w1", "n"])

    def uni_named(name: str):
        def rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"w": batch.column("w1"), name: batch.column("n")}
            )

        return rows

    big = counts.filter(expr=f"kind == 1 and n >= {int(min_count)}")

    def big_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "w1": batch.column("w1"),
                "w2": batch.column("w2"),
                "n_ab": batch.column("n"),
            }
        )

    total = uni.sum("n") or 0
    # floor of ONE partition: a near-empty vocabulary (tiny fixtures) can
    # hash every key into one bucket and Ray's hash join chokes on the
    # empty sibling partition; web-scale count tables size the fan-out
    n_parts = int(min(64, max(1, (counts.count()) // 250_000)))
    j1 = big.map_batches(big_rows, batch_format="pyarrow").join(
        uni.map_batches(uni_named("n_w1"), batch_format="pyarrow"),
        join_type="inner",
        num_partitions=n_parts,
        on=("w1",),
        right_on=("w",),
    )

    # Ray's hash join folds the right key column into the left one —
    # j1 comes back as (w1, w2, n_ab, n_w1) directly
    j2 = j1.join(
        uni.map_batches(uni_named("n_w2"), batch_format="pyarrow"),
        join_type="inner",
        num_partitions=n_parts,
        on=("w2",),
        right_on=("w",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        n_ab = batch.column("n_ab").to_numpy(zero_copy_only=False)
        n1 = batch.column("n_w1").to_numpy(zero_copy_only=False)
        n2 = batch.column("n_w2").to_numpy(zero_copy_only=False)
        fits = (
            len(n_ab)
            and int(n_ab.max()) * total <= (2**63 - 1) // 1_000_000
            and int(n1.max()) * int(n2.max()) <= 2**63 - 1
        )
        if fits:
            lift = 1_000_000 * n_ab * total // (n1 * n2)
            lift = lift.astype(np.int64)
        else:  # exact big-int path for web-scale counts
            lift = np.array(
                [
                    1_000_000 * int(a) * total // (int(b) * int(c))
                    for a, b, c in zip(n_ab, n1, n2)
                ],
                dtype=np.int64,
            )
        return pa.table(
            {
                "w1": batch.column("w1"),
                "w2": batch.column("w2"),
                "n_ab": batch.column("n_ab"),
                "n_w1": batch.column("n_w1"),
                "n_w2": batch.column("n_w2"),
                "lift_ppm": pa.array(lift, type=pa.int64()),
            }
        )

    return j2.map_batches(finish, batch_format="pyarrow").sort(["w1", "w2"])


def doc_keywords(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Per-document top-k tf-idf keyword extraction (the "what is this
    page about" primitive a retrieval/labeling pipeline runs corpus-wide):
    (doc_id, rank, token, tf, df, score_i) with
    ``score_i = tf * (1e6 * N // df)`` — the exact integer surrogate of
    tf·idf (monotone in tf * N/df, so the top-k IS the tf-idf top-k up to
    the documented floor), ties broken (score desc, token asc).

    Distributed shape: tf partials per block (Arrow hash group_by), df
    from ONE grouped sum over the (doc, token) rows (they are distinct by
    construction), N from parquet METADATA (no extra pass), df attaches
    via the partitioned hash join (vocabulary-sized — never broadcast),
    and the per-doc top-k runs as one keyed collect whose group payload
    is a document's distinct tokens (doc-length bounded)."""
    import pyarrow.parquet as pq_meta

    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
        grouped_sum,
    )

    n_docs = pq_meta.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def tf_rows(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        did = np.repeat(doc_ids, np.diff(offs))
        t = pa.table(
            {"doc_id": pa.array(did, type=pa.int64()), "token": flat}
        )
        g = t.group_by(["doc_id", "token"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "token": g.column("token"),
                "tf": g.column("count_all").cast(pa.int64()),
            }
        )

    tf = ds.map_batches(tf_rows, batch_format="pyarrow").materialize()

    def df_ones(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "token": batch.column("token"),
                "df": pa.array([1] * len(batch), type=pa.int64()),
            }
        )

    df = grouped_sum(
        tf.map_batches(df_ones, batch_format="pyarrow"),
        keys=["token"],
        sum_cols=["df"],
    )
    n_parts = int(min(64, max(1, n_docs // 25_000)))
    joined = tf.join(
        df,
        join_type="inner",
        num_partitions=n_parts,
        on=("token",),
    )

    def score(batch: pa.Table) -> pa.Table:
        tfv = batch.column("tf").to_numpy(zero_copy_only=False)
        dfv = batch.column("df").to_numpy(zero_copy_only=False)
        idf = 1_000_000 * n_docs // dfv  # N fits int64 by construction
        if len(tfv) and int(tfv.max()) * int(idf.max()) <= 2**63 - 1:
            sc = (tfv * idf).astype(np.int64)
        else:  # exact big-int path
            sc = np.array(
                [int(a) * int(b) for a, b in zip(tfv, idf)],
                dtype=np.int64,
            )
        return batch.append_column("score_i", pa.array(sc))

    scored = joined.map_batches(score, batch_format="pyarrow")
    collected = collect_tuples(
        scored, ["doc_id"], ["token", "tf", "df", "score_i"]
    )
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("rank", pa.int64()),
            ("token", pa.string()),
            ("tf", pa.int64()),
            ("df", pa.int64()),
            ("score_i", pa.int64()),
        ]
    )

    def pick(key, items) -> pa.Table:
        if items is None:
            return out_schema.empty_table()
        top = sorted(items, key=lambda x: (-x[3], x[0]))[:k]
        n = len(top)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([key[0]] * n, type=pa.int64()),
                "rank": pa.array(range(1, n + 1), type=pa.int64()),
                "token": pa.array([t for t, _, _, _ in top]),
                "tf": pa.array([t for _, t, _, _ in top], type=pa.int64()),
                "df": pa.array([d for _, _, d, _ in top], type=pa.int64()),
                "score_i": pa.array(
                    [s for _, _, _, s in top], type=pa.int64()
                ),
            }
        )

    return flat_map_groups(collected, pick, ["doc_id"]).sort(
        ["doc_id", "rank"]
    )


def lang_top_tokens(sf_dir: str, k: int = 5) -> ray.data.Dataset:
    """EXACT per-language top-k tokens (the per-corpus-slice vocabulary
    digest a multilingual curation run reports): (lang, rank, token, n)
    with rank by (n desc, token asc).

    A language's vocabulary is unbounded at web scale, so the per-group
    collect idiom is the skew trap here; instead the (lang, token)
    count table — ONE grouped sum over block partials — flows through
    :func:`~ner_pytorch_ray.stages.groupby_utils.grouped_rank` (global
    sort + O(#blocks) carry chain, no group ever ships to one task) and
    a vectorized ``rank <= k`` filter."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_rank, grouped_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        langs = batch.column("lang").to_pylist()
        rep = np.diff(offs)
        lang_flat = pa.array(np.repeat(np.array(langs, dtype=object), rep))
        t = pa.table({"lang": lang_flat, "token": flat})
        g = t.group_by(["lang", "token"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g.column("lang"),
                "token": g.column("token"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    counts = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["lang", "token"],
        sum_cols=["n"],
    )
    ranked = grouped_rank(
        counts,
        part_keys=["lang"],
        order_keys=["n", "token"],
        descending=[True, False],
    )

    def pick(batch: pa.Table) -> pa.Table:
        keep = batch.filter(
            pc.less_equal(batch.column("rank"), pa.scalar(k))
        )
        return pa.table(
            {
                "lang": keep.column("lang"),
                "rank": keep.column("rank"),
                "token": keep.column("token"),
                "n": keep.column("n"),
            }
        )

    return ranked.map_batches(pick, batch_format="pyarrow").sort(
        ["lang", "rank"]
    )
