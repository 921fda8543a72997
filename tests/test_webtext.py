"""Corpus-level webtext curation operators (pipelines/webtext.py):
rule-cascade semantics, sequential-recompute parity, keeper-rule
invariants, and a boilerplate-sentence hot-key test. The SQL-oracle
comparison for all four queries runs in test_kg_pipeline's driver-style
gate (they are plain oracle_sql entries)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------ corpus_filter
def test_filter_cascade_order():
    """FIRST failing rule names the reason; every reason is reachable."""
    from ner_pytorch_ray.pipelines.webtext import _filter_batch

    en_pad = "the a of and to " * 8  # 40 stopword tokens, clearly english
    docs = {
        # short AND non-english: too_short wins (cascade order)
        "too_short": "der die und",
        "long_token": en_pad + "x" * 25,
        "non_english": "der die und das ist " * 8,
        "low_stopword": " ".join(f"w{i}" for i in range(60)),
        "repetitive": en_pad + "b " * 60,
        "ok": en_pad + " ".join(f"w{i}" for i in range(20)),
    }
    batch = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array([t.strip() for t in docs.values()]),
        }
    )
    out = _filter_batch(batch)
    got = dict(zip(out.column("reason").to_pylist(), out.column("kept").to_pylist()))
    assert list(got) == list(docs)  # same order, same reasons
    assert got == {r: (1 if r == "ok" else 0) for r in docs}


def test_corpus_filter_matches_sequential(ray_session):
    """Distributed gate == plain-Python per-doc recompute (independent of
    partitioning/batching)."""
    from ner_pytorch_ray.pipelines.quality import lid_doc
    from ner_pytorch_ray.pipelines.webtext import corpus_filter

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    exp = {}
    for d, t in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()):
        toks = t.split(" ")
        n = len(toks)
        stop = sum(1 for w in toks if w in ("the", "a"))
        dup = n - len(set(toks))
        lang, _ = lid_doc(t, toks)
        if n < 20:
            reason = "too_short"
        elif n > 10_000:
            reason = "too_long"
        elif max(len(w) for w in toks) > 20:
            reason = "long_token"
        elif lang != "en":
            reason = "non_english"
        elif stop * 1000 < 30 * n:
            reason = "low_stopword"
        elif dup * 1000 > 650 * n:
            reason = "repetitive"
        else:
            reason = "ok"
        exp[d] = (lang, n, stop, dup, reason)

    rows = corpus_filter(SF).take_all()
    assert len(rows) == len(exp)
    reasons = set()
    for r in rows:
        lang, n, stop, dup, reason = exp[r["doc_id"]]
        assert (r["lang_pred"], r["n_tokens"], r["n_stopwords"]) == (lang, n, stop)
        assert (r["n1_dup"], r["reason"]) == (dup, reason)
        assert r["kept"] == (1 if reason == "ok" else 0)
        reasons.add(reason)
    assert "ok" in reasons and len(reasons) >= 3  # the gate discriminates


# ----------------------------------------------------------- sentence_dedup
def _brute_sentence_dedup(doc_ids, texts, sent_len=12):
    first = {}
    order = sorted(zip(doc_ids, texts))
    per_doc = {}
    for d, t in order:
        toks = t.split(" ")
        n_sents = (len(toks) + sent_len - 1) // sent_len
        dups = 0
        for s in range(n_sents):
            sent = " ".join(toks[s * sent_len : (s + 1) * sent_len])
            if sent in first:
                dups += 1
            else:
                first[sent] = (d, s)
        per_doc[d] = (n_sents, dups)
    return per_doc


def test_sentence_dedup_matches_sequential(ray_session):
    from ner_pytorch_ray.pipelines.webtext import sentence_dedup

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    exp = _brute_sentence_dedup(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    )
    rows = sentence_dedup(SF).take_all()
    assert len(rows) == len(exp)
    total_dups = 0
    for r in rows:
        assert (r["n_sents"], r["n_dup_sents"]) == exp[r["doc_id"]]
        total_dups += r["n_dup_sents"]
    assert total_dups > 0  # the synthetic corpus does contain repeats


def test_sentence_dedup_boilerplate_hot_key(ray_session, tmp_path):
    """One boilerplate sentence repeated in EVERY doc (the 100 TB skew
    case): the winner keeps one occurrence, every other occurrence —
    including extra repeats inside the winner doc — counts as duplicate."""
    from ner_pytorch_ray.pipelines.webtext import sentence_dedup

    boiler = " ".join(f"b{i}" for i in range(12))
    n_docs = 400
    texts, ids = [], []
    for d in range(n_docs):
        uniq = " ".join(f"d{d}w{i}" for i in range(12))
        # doc 0 carries the boilerplate TWICE (sent 0 and sent 2)
        parts = [boiler, uniq] + ([boiler] if d == 0 else [])
        ids.append(d)
        texts.append(" ".join(parts))
    pq.write_table(
        pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(texts),
            }
        ),
        tmp_path / "documents.parquet",
    )
    rows = {r["doc_id"]: r for r in sentence_dedup(str(tmp_path)).take_all()}
    assert rows[0]["n_sents"] == 3 and rows[0]["n_dup_sents"] == 1
    for d in range(1, n_docs):
        assert rows[d]["n_sents"] == 2 and rows[d]["n_dup_sents"] == 1


# -------------------------------------------------------- near_dup_clusters
def test_near_dup_clusters_keeper_invariants(ray_session):
    from ner_pytorch_ray.pipelines.dedup import ngram_jaccard_pairs
    from ner_pytorch_ray.pipelines.webtext import near_dup_clusters

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(SF, tau=0.5).take_all()
    ]
    assert pairs  # testdata plants near-dups
    rows = {r["doc_id"]: r for r in near_dup_clusters(SF, tau=0.5).take_all()}

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert len(rows) == n_docs

    # local union-find over the same pairs = expected clusters
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for d, r in rows.items():
        if d in parent:
            expect = find(d)
        else:
            expect = d  # singleton keeps itself
        assert r["cluster"] == expect, (d, r)
        assert r["kept"] == (1 if r["cluster"] == d else 0)
    # exactly one keeper per cluster
    clusters = {}
    for r in rows.values():
        clusters.setdefault(r["cluster"], []).append(r["kept"])
    assert all(sum(v) == 1 for v in clusters.values())


# ----------------------------------------------------------- sequence_pack
def test_sequence_pack_prefix_invariants(ray_session):
    """Global packing invariants: offsets are the exact prefix sum in
    doc_id order (token ranges tile [0, total) with no gaps/overlap), and
    sequence ranges match the offsets."""
    from ner_pytorch_ray.pipelines.webtext import sequence_pack

    seq_len = 128
    df = (
        sequence_pack(SF, seq_len=seq_len)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert len(df) == n_docs
    expect_start = np.concatenate(([0], np.cumsum(df.n_tokens.to_numpy())[:-1]))
    assert (df.tok_start.to_numpy() == expect_start).all()
    assert (df.seq_first == df.tok_start // seq_len).all()
    assert (
        df.seq_last == (df.tok_start + np.maximum(df.n_tokens, 1) - 1) // seq_len
    ).all()
    assert (df.n_tokens > 0).all()


# -------------------------------------------------------- boilerplate mining
def test_boilerplate_ngrams_matches_sequential(ray_session):
    from collections import Counter

    from ner_pytorch_ray.pipelines.webtext import boilerplate_ngrams

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    occ, df = Counter(), Counter()
    for t in tbl.column("text").to_pylist():
        toks = t.split(" ")
        grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        occ.update(grams)
        df.update(set(grams))
    expect = sorted(occ, key=lambda g: (-occ[g], g))[:10]

    rows = boilerplate_ngrams(SF, k=10).take_all()
    assert [r["gram"] for r in sorted(rows, key=lambda r: r["rank"])] == expect
    for r in rows:
        assert (r["n_occ"], r["n_docs"]) == (occ[r["gram"]], df[r["gram"]])


# ---------------------------------------------------- adaptive length filter
def test_adaptive_length_filter_threshold(ray_session):
    import math

    from ner_pytorch_ray.pipelines.webtext import adaptive_length_filter

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    counts = sorted(len(t.split(" ")) for t in tbl.column("text").to_pylist())
    thr = counts[max(1, math.ceil(0.1 * len(counts))) - 1]  # quantile_disc

    rows = adaptive_length_filter(SF, p=0.1).take_all()
    assert len(rows) == len(counts)
    for r in rows:
        assert r["threshold"] == thr
        assert r["kept"] == (1 if r["n_tokens"] >= thr else 0)
    kept_frac = sum(r["kept"] for r in rows) / len(rows)
    assert 0.8 <= kept_frac <= 0.95  # drops roughly the shortest decile


# ------------------------------------------------------- domain_token_stats
def test_domain_token_stats_matches_pandas(ray_session):
    import pandas as pd

    from ner_pytorch_ray.pipelines.webtext import domain_token_stats

    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    df["n_tokens"] = df["text"].str.split(" ").str.len()
    df["n_chars"] = df["text"].str.len()
    exp = (
        df.groupby(["source", "lang"])
        .agg(n_docs=("doc_id", "size"), n_tokens=("n_tokens", "sum"), n_chars=("n_chars", "sum"))
        .reset_index()
        .sort_values(["source", "lang"])
        .reset_index(drop=True)
    )
    got = domain_token_stats(SF).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, exp[["source", "lang", "n_docs", "n_tokens", "n_chars"]],
        check_dtype=False,
    )


def test_retrieval_corpus_build_consistency(ray_session):
    """Summary internally consistent with its components: docs kept ==
    corpus_filter's kept count, chunks == doc_chunks over kept docs,
    unique <= chunks, tokens == sum of kept-doc chunk sizes."""
    from ner_pytorch_ray.pipelines.scrub import doc_chunks
    from ner_pytorch_ray.pipelines.webtext import (
        corpus_filter,
        retrieval_corpus_build,
    )

    SF = "/root/testdata/sf0.001"
    row = retrieval_corpus_build(SF).take_all()[0]
    kept = {
        r["doc_id"]
        for r in corpus_filter(SF).take_all()
        if r["kept"] == 1
    }
    chunks = [
        r
        for r in doc_chunks(SF).take_all()
        if r["doc_id"] in kept
    ]
    assert row["n_docs_kept"] == len(kept)
    assert row["n_chunks"] == len(chunks)
    assert row["total_chunk_tokens"] == sum(r["n_tokens"] for r in chunks)
    uniq = len({r["chunk_text"] for r in chunks})
    assert row["n_unique_chunks"] == uniq <= row["n_chunks"]
