"""Inverted-index text search over the documents corpus.

The reference repo ranks k-NN neighbors over embeddings
(`/root/reference/word_rep.py:26-38`); this module adds the TERM side of
retrieval a web-scale corpus engine needs next to it:

- :func:`term_postings` — the inverted-index build: exact per-(doc, term)
  term frequencies (one corpus scan, block-local Arrow ``group_by`` — each
  document row lives in exactly one block, so block-local counts are
  final), then the classic impact-ordered index head: the top-k postings
  per term by (tf desc, doc_id asc).
- :func:`conjunctive_search` — multi-term AND retrieval with an
  exact-integer tf-idf score (the same ``(1e6 * N) // df`` idf surrogate
  the tf-idf operator uses, so scores are bit-identical cross-engine):
  one corpus scan emits (doc, term, tf) candidate rows for the query
  terms only, a k-row df aggregate prices each term, and a per-doc
  grouped-sum keeps docs matching ALL terms, top-k by (score desc,
  doc_id asc).

Shape for scale (100 TB):

- Both operators scan ``documents`` ONCE with column pruning
  (``doc_id, text``) and tokenize vectorized (``pc.split_pattern`` +
  ``pc.list_parent_indices`` + Arrow ``group_by`` — no Python loop over
  rows or tokens).
- ``conjunctive_search``'s shuffled payload is the CANDIDATE set — docs
  containing at least one query term — not the corpus; the df table is
  |query| rows and the final exchange carries 3-int rows grouped by
  doc_id.
- ``term_postings`` bounds the per-term collect with a BLOCK-LOCAL top-k
  partial first, so the collect group is k x #blocks rows, independent
  of document frequency (a hot stopword's postings never travel).  At
  extreme block counts add one more fold level (tree reduction) — noted
  inline.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ner_pytorch_ray.stages.groupby_utils import (
    collect_tuples,
    flat_map_groups,
    grouped_sum,
)

IDF_SCALE = 1_000_000  # idf 1.0 == 1e6 (same fixed point as tfidf_top_terms)


def _doc_term_tf(batch: pa.Table, terms: list[str] | None) -> pa.Table:
    """Vectorized (doc_id, w, tf) rows for one block of whole documents.

    Documents are row-atomic (one block holds whole docs), so the
    block-local count IS the exact per-document term frequency."""
    toks = pc.split_pattern(batch.column("text"), " ")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    doc = pc.take(batch.column("doc_id"), parent)
    t = pa.table({"doc_id": doc, "w": flat})
    if terms is not None:
        t = t.filter(pc.is_in(t.column("w"), value_set=pa.array(terms)))
    out = t.group_by(["doc_id", "w"]).aggregate([("w", "count")])
    return out.rename_columns(["doc_id", "w", "tf"])


def term_postings(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Impact-ordered inverted-index head: per term, document frequency +
    the top-k postings by (tf desc, doc_id asc).

    Output (term, doc_id, tf, rank) with rank 1..k, sorted by (term, rank).
    """
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    tf = docs.map_batches(
        lambda b: _doc_term_tf(b, None), batch_format="pyarrow"
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        # block-local top-k partial: bounds the per-term collect at
        # k rows per block regardless of term frequency.  (At extreme
        # block counts, repartition + a second local_topk pass folds
        # k x #blocks down again — same monotone partial.)
        idx = pc.sort_indices(
            batch,
            sort_keys=[("w", "ascending"), ("tf", "descending"),
                       ("doc_id", "ascending")],
        )
        s = batch.take(idx)
        if not len(s):
            return s
        import numpy as np

        w = np.asarray(s.column("w").to_pylist(), dtype=object)
        first = np.r_[True, w[1:] != w[:-1]]
        grp_start = np.maximum.accumulate(
            np.where(first, np.arange(len(w)), 0)
        )
        rank = np.arange(len(w)) - grp_start
        return s.filter(pa.array(rank < k))

    out_schema = pa.schema(
        [
            ("term", pa.string()),
            ("doc_id", pa.int64()),
            ("tf", pa.int64()),
            ("rank", pa.int64()),
        ]
    )

    def pick(key, items) -> pa.Table:
        if items is None:
            return out_schema.empty_table()
        top = sorted(items, key=lambda t: (-t[1], t[0]))[:k]
        return pa.Table.from_pydict(
            {
                "term": pa.array([key[0]] * len(top), type=pa.string()),
                "doc_id": pa.array([d for d, _ in top], type=pa.int64()),
                "tf": pa.array([f for _, f in top], type=pa.int64()),
                "rank": pa.array(range(1, len(top) + 1), type=pa.int64()),
            }
        )

    collected = collect_tuples(
        tf.map_batches(local_topk, batch_format="pyarrow"),
        ["w"],
        ["doc_id", "tf"],
        shuffle_blocks="auto",
    )
    return flat_map_groups(collected, pick, ["w"]).sort(["term", "rank"])


def conjunctive_search(
    sf_dir: str, terms: list[str], k: int = 10
) -> ray.data.Dataset:
    """Multi-term AND retrieval with exact-integer tf-idf scoring.

    Keeps documents containing EVERY query term; scores them
    ``sum over terms of tf * ((IDF_SCALE * N) // df)`` (df measured on the
    candidate set — a doc containing the term is by construction a
    candidate, so this equals corpus df); returns the top-k by
    (score desc, doc_id asc) as (doc_id, tf_total, score_i)."""
    if not terms:
        raise ValueError("conjunctive_search needs at least one query term")
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_docs = docs.count()
    # candidate rows: docs containing >= 1 query term (the index-driven
    # candidate set — the only thing that shuffles)
    cand = docs.map_batches(
        lambda b: _doc_term_tf(b, list(terms)), batch_format="pyarrow"
    ).materialize()
    # per-term document frequency: |terms| rows — bounded driver state
    df_rows = grouped_sum(
        cand.map_batches(
            lambda t: pa.table(
                {
                    "w": t.column("w"),
                    "df": pa.array([1] * len(t), type=pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        ["w"],
        sum_cols=["df"],
    ).take_all()
    idf = {
        r["w"]: (IDF_SCALE * n_docs) // r["df"] for r in df_rows
    }

    def score(batch: pa.Table) -> pa.Table:
        w = batch.column("w").to_pylist()
        tf = batch.column("tf")
        s = pa.array([idf[x] for x in w], type=pa.int64())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "nt": pa.array([1] * len(batch), type=pa.int64()),
                "tf_total": tf,
                "score_i": pc.multiply_checked(pc.cast(tf, pa.int64()), s),
            }
        )

    n_terms = len(terms)

    def keep_full(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("nt"), n_terms)).drop_columns(
            ["nt"]
        )

    hits = grouped_sum(
        cand.map_batches(score, batch_format="pyarrow"),
        ["doc_id"],
        sum_cols=["nt", "tf_total", "score_i"],
    ).map_batches(keep_full, batch_format="pyarrow")
    return hits.sort(["score_i", "doc_id"], descending=[True, False]).limit(k)


# ------------------------------------------------- trigram substring search
def build_trigram_index(
    sf_dir: str, path: str, n_buckets: int = 16
) -> dict:
    """Persist a character-TRIGRAM inverted index over the corpus as a
    bucketed layout (sources/bucketed.py) keyed by trigram — the
    Google-Code-Search design: exact substring search over a corpus too
    large to scan becomes (1) read the pattern's trigram postings from
    their buckets, (2) intersect, (3) verify only the candidates.

    The (tri, doc_id) table is ~|corpus chars| rows — an honest inverted
    index, paid ONCE; every later pattern query touches only its own
    trigrams' buckets."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def tri_rows(batch: pa.Table) -> pa.Table:
        out_t: list[str] = []
        out_d: list[int] = []
        for d, t in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            tris = {t[i : i + 3] for i in range(len(t) - 2)}
            out_t.extend(tris)
            out_d.extend([d] * len(tris))
        return pa.table(
            {
                "tri": pa.array(out_t, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
            }
        )

    from ner_pytorch_ray.sources.bucketed import bucketed_write

    return bucketed_write(
        docs.map_batches(tri_rows, batch_format="pyarrow"),
        "tri",
        n_buckets,
        path,
    )


def substring_search_indexed(
    sf_dir: str, pattern: str, index_path: str | None = None
) -> ray.data.Dataset:
    """Exact substring search through the trigram index: any document
    containing ``pattern`` contains every one of its trigrams (recall is
    exact by construction), so candidates = the conjunction of the
    pattern-trigram postings, and only candidates get the final
    ``contains`` verify via a doc_id-filtered parquet read — the corpus
    itself is never scanned at query time. Production note: with per-tri
    document frequencies in the manifest the conjunction would use only
    the rarest 2-3 trigrams; here all of them intersect (strictly fewer
    candidates, same answer). Output: (doc_id, n_hits) sorted."""
    if len(pattern) < 3:
        raise ValueError(
            "substring_search_indexed needs len(pattern) >= 3 — shorter "
            "patterns have no trigram and must full-scan instead"
        )
    import shutil
    import tempfile

    import pyarrow.compute as pc

    from ner_pytorch_ray.sources.bucketed import bucketed_lookup

    owns = index_path is None
    if owns:
        index_path = tempfile.mkdtemp(prefix="tri_index_")
        build_trigram_index(sf_dir, f"{index_path}/idx")
        lookup_path = f"{index_path}/idx"
    else:
        lookup_path = index_path
    try:
        tris = sorted({pattern[i : i + 3] for i in range(len(pattern) - 2)})
        postings = bucketed_lookup(lookup_path, tris)
        # conjunction: docs holding ALL pattern trigrams (postings are
        # the pattern's trigrams only — bounded; true candidates after
        # the AND are ~matches)
        import collections

        cnt = collections.Counter(postings.column("doc_id").to_pylist())
        cand = sorted(d for d, c in cnt.items() if c == len(tris))
        if not cand:
            return ray.data.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "n_hits": pa.array([], pa.int64()),
                    }
                )
            )
        # selective candidate fetch: parquet row-group predicate pushdown
        # on doc_id (candidates ~ matches after the AND; at real scale
        # the doc table would itself be a doc_id-bucketed layout and this
        # becomes a bucketed_lookup)
        import pyarrow.parquet as pqt

        cand_tbl = pqt.read_table(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text"],
            filters=[("doc_id", "in", cand)],
        )
        docs = ray.data.from_arrow(cand_tbl)

        def verify(batch: pa.Table) -> pa.Table:
            hits = pc.count_substring(batch.column("text"), pattern)
            t = pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "n_hits": pc.cast(hits, pa.int64()),
                }
            )
            return t.filter(pc.greater(t.column("n_hits"), 0))

        return docs.map_batches(verify, batch_format="pyarrow").sort(
            "doc_id"
        ).materialize()
    finally:
        if owns:
            shutil.rmtree(index_path, ignore_errors=True)


# ------------------------------------------------------------- BM25
BM25_K1_MILLI = 1200  # k1 = 1.2 in thousandths
BM25_B_MICRO = 750_000  # b = 0.75 in millionths
NORM_SCALE = 1_000_000


def bm25_search(
    sf_dir: str, terms: list[str], k: int = 10
) -> ray.data.Dataset:
    """Disjunctive (OR) BM25 retrieval with EXACT-INTEGER scoring — the
    ranked-retrieval sibling of :func:`conjunctive_search` (Robertson &
    Spärck Jones BM25, k1=1.2, b=0.75; public formula).

    Every float in the classic formula is replaced by a fixed-point
    integer with an explicit scale, so scores are bit-identical across
    engines and partitionings (the repo-wide exactness contract):

    - ``idf_i = (IDF_SCALE * N) // df`` (the tf-idf surrogate the other
      text operators use),
    - length norm ``norm_i = (1-b) + b * dl/avgdl`` in millionths:
      ``250_000 + (750_000 * dl * N) // total_dl``,
    - per-term contribution
      ``(idf_i * tf * 2200 // 1000) * NORM_SCALE // (tf * NORM_SCALE +
      1200 * norm_i // 1000)``.

    Arithmetic is size-routed per batch: the vectorized int64 path runs
    only when ``idf.max * tf.max * 2.2 * NORM_SCALE`` and
    ``b_micro * dl.max * N`` both fit ``2**63-1``; otherwise an exact
    per-row Python big-int fallback computes the same fixed-point values
    (the convention of collocations / doc_keywords / doc_cosine_pairs).

    One corpus scan emits candidate (doc, term, tf, dl) rows for the
    query terms only; a |terms|-row df aggregate prices each term; the
    shuffled payload is the candidate set, never the corpus. Returns
    top-k (doc_id, tf_total, score_i) by (score desc, doc_id asc)."""
    if not terms:
        raise ValueError("bm25_search needs at least one query term")
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_docs = docs.count()

    def len_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        return pa.table(
            {
                "dl": pa.array(
                    [int(pc.sum(pc.list_value_length(toks)).as_py() or 0)],
                    type=pa.int64(),
                )
            }
        )

    total_dl = int(
        docs.map_batches(len_partial, batch_format="pyarrow").sum("dl")
    )

    def cand_rows(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        dl = pc.list_value_length(toks).cast(pa.int64())
        tf_t = _doc_term_tf(batch, list(terms))
        dl_by_doc = pa.table(
            {"doc_id": batch.column("doc_id"), "dl": dl}
        )
        # docs are row-atomic per block: attach dl block-locally
        dl_map = {
            d: v
            for d, v in zip(
                dl_by_doc.column("doc_id").to_pylist(),
                dl_by_doc.column("dl").to_pylist(),
            )
        }
        return tf_t.append_column(
            "dl",
            pa.array(
                [dl_map[d] for d in tf_t.column("doc_id").to_pylist()],
                type=pa.int64(),
            ),
        )

    cand = docs.map_batches(cand_rows, batch_format="pyarrow").materialize()
    df_rows = grouped_sum(
        cand.map_batches(
            lambda t: pa.table(
                {
                    "w": t.column("w"),
                    "df": pa.array([1] * len(t), type=pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        ["w"],
        sum_cols=["df"],
    ).take_all()
    idf = {r["w"]: (IDF_SCALE * n_docs) // r["df"] for r in df_rows}

    def score(batch: pa.Table) -> pa.Table:
        import numpy as np

        w = batch.column("w").to_pylist()
        tf = np.asarray(
            batch.column("tf").to_numpy(zero_copy_only=False), dtype=np.int64
        )
        dl = np.asarray(
            batch.column("dl").to_numpy(zero_copy_only=False), dtype=np.int64
        )
        idf_i = np.array([idf[x] for x in w], dtype=np.int64)
        # Size-routed like collocations / doc_keywords: the worst int64
        # intermediates are idf*tf*2200*NORM_SCALE//1000 (numer * scale)
        # and BM25_B_MICRO*dl*N (the norm numerator). When either could
        # exceed 2**63-1 fall back to exact per-row Python big-ints.
        k1p1 = 1000 + BM25_K1_MILLI
        fits = len(tf) == 0 or (
            int(idf_i.max()) * int(tf.max()) * k1p1 // 1000 * NORM_SCALE
            <= 2**63 - 1
            and BM25_B_MICRO * int(dl.max()) * n_docs <= 2**63 - 1
        )
        if fits:
            # (1-b) + b*dl/avgdl in millionths, dl/avgdl = dl*N/total_dl
            norm_i = (NORM_SCALE - BM25_B_MICRO) + (
                BM25_B_MICRO * dl * n_docs
            ) // total_dl
            # idf * tf * (k1+1), k1+1 = 2.2 carried in thousandths
            numer = idf_i * tf * k1p1 // 1000
            denom = tf * NORM_SCALE + BM25_K1_MILLI * norm_i // 1000
            contrib = numer * NORM_SCALE // denom
        else:  # exact big-int path for web-scale N / df=1 terms
            contrib = np.array(
                [
                    (int(i) * int(t) * k1p1 // 1000)
                    * NORM_SCALE
                    // (
                        int(t) * NORM_SCALE
                        + BM25_K1_MILLI
                        * (
                            (NORM_SCALE - BM25_B_MICRO)
                            + BM25_B_MICRO * int(d) * n_docs // total_dl
                        )
                        // 1000
                    )
                    for i, t, d in zip(idf_i, tf, dl)
                ],
                dtype=np.int64,
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "tf_total": batch.column("tf"),
                "score_i": pa.array(contrib, type=pa.int64()),
            }
        )

    hits = grouped_sum(
        cand.map_batches(score, batch_format="pyarrow"),
        ["doc_id"],
        sum_cols=["tf_total", "score_i"],
    )
    return hits.sort(["score_i", "doc_id"], descending=[True, False]).limit(k)


# ------------------------------------------------- hybrid retrieval (RRF)
COS_SCALE = 1_000_000  # cos^2 carried in parts-per-million
RRF_SCALE = 1_000_000_000  # 1/(k + rank) carried in billionths
RRF_K = 60  # the standard Cormack et al. constant


def lexical_cosine_search(
    sf_dir: str, terms: list[str], k: int = 10
) -> ray.data.Dataset:
    """Whole-document lexical cosine retrieval with EXACT-INTEGER scoring —
    the vector-space sibling of :func:`bm25_search` (Salton's VSM with raw
    tf weights; public formula), and the second leg of
    :func:`hybrid_rrf_search`.

    The query vector is the term set with tf 1, so for non-negative tf
    vectors ranking by cosine equals ranking by
    ``cos2_ppm = 1e6 * num^2 // norm2`` where ``num = sum tf(doc, t)`` over
    query terms and ``norm2 = sum tf(doc, w)^2`` over ALL words — the same
    norm²-in-integer trick as :func:`~ner_pytorch_ray.pipelines.dedup.doc_cosine_pairs`
    (the constant query norm² divides out of the ranking).

    ONE column-pruned corpus scan; documents are row-atomic per block so
    every (doc_id, num, norm2) row is FINAL in its block — no shuffle at
    all until the top-k sort over the candidate set (docs holding >= 1
    query term). The square is size-routed: vectorized int64 when
    ``1e6 * num.max()^2`` fits, exact per-row Python big-ints otherwise
    (the bm25/collocations convention). Returns top-k
    (doc_id, num, norm2, cos2_ppm) by (cos2_ppm desc, doc_id asc)."""
    if not terms:
        raise ValueError("lexical_cosine_search needs at least one term")
    import numpy as np

    term_set = pa.array(sorted(set(terms)))
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("num", pa.int64()),
            ("norm2", pa.int64()),
            ("cos2_ppm", pa.int64()),
        ]
    )

    def score_rows(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        did = np.repeat(doc_ids, np.diff(offs))
        t = pa.table({"doc_id": pa.array(did, type=pa.int64()), "w": flat})
        g = t.group_by(["doc_id", "w"]).aggregate([([], "count_all")])
        if not len(g):
            return out_schema.empty_table()
        tf = g.column("count_all").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        gd = g.column("doc_id").to_numpy(zero_copy_only=False)
        is_q = pc.is_in(g.column("w"), value_set=term_set).to_numpy(
            zero_copy_only=False
        )
        order = np.argsort(gd, kind="stable")
        gd_s, tf_s, q_s = gd[order], tf[order], is_q[order]
        uniq, starts = np.unique(gd_s, return_index=True)
        norm2 = np.add.reduceat(tf_s * tf_s, starts)
        num = np.add.reduceat(np.where(q_s, tf_s, 0), starts)
        keep = num > 0
        uniq, norm2, num = uniq[keep], norm2[keep], num[keep]
        if not len(num):
            return out_schema.empty_table()
        if int(num.max()) ** 2 <= (2**63 - 1) // COS_SCALE:
            cos2 = COS_SCALE * num * num // norm2
        else:  # exact big-int path for web-scale document lengths
            cos2 = np.array(
                [
                    COS_SCALE * int(x) * int(x) // int(y)
                    for x, y in zip(num, norm2)
                ],
                dtype=np.int64,
            )
        return pa.Table.from_arrays(
            [
                pa.array(uniq.astype(np.int64)),
                pa.array(num.astype(np.int64)),
                pa.array(norm2.astype(np.int64)),
                pa.array(cos2.astype(np.int64)),
            ],
            schema=out_schema,
        )

    cand = docs.map_batches(score_rows, batch_format="pyarrow")
    return cand.sort(
        ["cos2_ppm", "doc_id"], descending=[True, False]
    ).limit(k)


def hybrid_rrf_search(
    sf_dir: str,
    terms: list[str],
    k: int = 10,
    pool: int = 50,
    rrf_k: int = RRF_K,
) -> ray.data.Dataset:
    """Reciprocal-Rank-Fusion hybrid retrieval (Cormack, Clarke &
    Büttcher 2009, SIGIR — public formula): fuse the BM25 top-``pool``
    and the lexical-cosine top-``pool`` lists into one ranking,

        ``rrf_i = sum over systems of RRF_SCALE // (rrf_k + rank)``

    in exact integers (absent-from-a-list contributes 0; its rank column
    reads 0). This is the standard first-stage retrieval for RAG corpora:
    a term-weighted ranker and a vector-space ranker disagree exactly
    where fusion helps.

    Scale shape: each leg is a full distributed retrieval whose OUTPUT is
    ``<= pool`` rows, so the fusion itself is driver-sized BY CONSTRUCTION
    (<= 2*pool rows — the deliberate small-result collect the repo's
    hygiene lint allows). Returns top-k
    (doc_id, bm25_rank, cos_rank, rrf_i) by (rrf_i desc, doc_id asc);
    ranks are 1-based positions in each system's (score desc, doc_id asc)
    order, 0 when the doc missed that system's pool."""
    bm = bm25_search(sf_dir, terms, k=pool).take_all()
    cs = lexical_cosine_search(sf_dir, terms, k=pool).take_all()
    # defensively re-derive each system's order from its score columns
    # (sort is the contract, but ranks must not depend on collect order)
    bm.sort(key=lambda r: (-r["score_i"], r["doc_id"]))
    cs.sort(key=lambda r: (-r["cos2_ppm"], r["doc_id"]))
    bm_rank = {r["doc_id"]: i + 1 for i, r in enumerate(bm)}
    cos_rank = {r["doc_id"]: i + 1 for i, r in enumerate(cs)}
    fused = []
    for d in sorted(set(bm_rank) | set(cos_rank)):
        br, cr = bm_rank.get(d, 0), cos_rank.get(d, 0)
        s = (RRF_SCALE // (rrf_k + br) if br else 0) + (
            RRF_SCALE // (rrf_k + cr) if cr else 0
        )
        fused.append((d, br, cr, s))
    fused.sort(key=lambda r: (-r[3], r[0]))
    fused = fused[:k]
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in fused], type=pa.int64()),
                "bm25_rank": pa.array(
                    [r[1] for r in fused], type=pa.int64()
                ),
                "cos_rank": pa.array([r[2] for r in fused], type=pa.int64()),
                "rrf_i": pa.array([r[3] for r in fused], type=pa.int64()),
            }
        )
    )
