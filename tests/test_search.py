"""Inverted-index search (pipelines/search.py): postings build +
conjunctive tf-idf retrieval. Ground truth is a plain-Python recompute
from the same parquet; the SQL-oracle comparison runs via
tools/check_oracles.py."""

import collections

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"

IDF_SCALE = 1_000_000


def _tf_table():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    tf: dict = {}
    for doc, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        for w, c in collections.Counter(text.split(" ")).items():
            tf[(doc, w)] = c
    return tf


class TestTermPostings:
    def test_matches_sequential_recompute(self):
        from ner_pytorch_ray.pipelines.search import term_postings

        got = [
            (r["term"], r["doc_id"], r["tf"], r["rank"])
            for r in term_postings(SF, k=3).take_all()
        ]
        tf = _tf_table()
        by_term: dict = {}
        for (doc, w), c in tf.items():
            by_term.setdefault(w, []).append((doc, c))
        ref = []
        for w in sorted(by_term):
            top = sorted(by_term[w], key=lambda t: (-t[1], t[0]))[:3]
            ref.extend(
                (w, d, c, i + 1) for i, (d, c) in enumerate(top)
            )
        assert sorted(got) == sorted(ref)
        # ranks are 1..k and tf non-increasing within a term
        per = {}
        for w, d, c, rk in got:
            per.setdefault(w, []).append((rk, c))
        for rows in per.values():
            rows.sort()
            assert [rk for rk, _ in rows] == list(range(1, len(rows) + 1))
            assert all(
                rows[i][1] >= rows[i + 1][1] for i in range(len(rows) - 1)
            )


class TestConjunctiveSearch:
    TERMS = ["dup", "scan", "merge"]

    def test_matches_sequential_recompute(self):
        from ner_pytorch_ray.pipelines.search import conjunctive_search

        got = [
            (r["doc_id"], r["tf_total"], r["score_i"])
            for r in conjunctive_search(SF, self.TERMS, k=10).take_all()
        ]
        tf = _tf_table()
        n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
        df = collections.Counter(
            w for (_, w) in tf if w in self.TERMS
        )
        idf = {w: (IDF_SCALE * n_docs) // df[w] for w in self.TERMS}
        scores = {}
        for (doc, w), c in tf.items():
            if w in self.TERMS:
                nt, tt, sc = scores.get(doc, (0, 0, 0))
                scores[doc] = (nt + 1, tt + c, sc + c * idf[w])
        hits = [
            (doc, tt, sc)
            for doc, (nt, tt, sc) in scores.items()
            if nt == len(self.TERMS)
        ]
        hits.sort(key=lambda t: (-t[2], t[0]))
        assert got == hits[:10]
        assert got  # the fixture has conjunctive matches

    def test_empty_terms_raises(self):
        import pytest

        from ner_pytorch_ray.pipelines.search import conjunctive_search

        with pytest.raises(ValueError):
            conjunctive_search(SF, [])


class TestSubstringSearchIndexed:
    def test_matches_full_scan_and_index_reuse(self, tmp_path):
        from ner_pytorch_ray.pipelines.search import (
            build_trigram_index,
            substring_search_indexed,
        )

        t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        texts = dict(
            zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
        )

        def exact(pat):
            return sorted(
                (d, txt.count(pat)) for d, txt in texts.items() if pat in txt
            )

        # one persisted index serves multiple patterns
        build_trigram_index(SF, str(tmp_path / "idx"))
        for pat in ("hash join", "spark", "zz-absent-zz"):
            got = sorted(
                (r["doc_id"], r["n_hits"])
                for r in substring_search_indexed(
                    SF, pat, index_path=str(tmp_path / "idx")
                ).take_all()
            )
            assert got == exact(pat), pat

    def test_short_pattern_rejected(self):
        import pytest

        from ner_pytorch_ray.pipelines.search import substring_search_indexed

        with pytest.raises(ValueError, match="len\\(pattern\\)"):
            substring_search_indexed(SF, "ab")


class TestBm25Search:
    TERMS = ["dup", "scan", "merge"]

    def test_matches_sequential_recompute(self):
        from ner_pytorch_ray.pipelines.search import bm25_search

        got = [
            (r["doc_id"], r["tf_total"], r["score_i"])
            for r in bm25_search(SF, self.TERMS, k=10).take_all()
        ]
        t = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        )
        n_docs = t.num_rows
        dl = {
            doc: len(text.split(" "))
            for doc, text in zip(
                t.column("doc_id").to_pylist(),
                t.column("text").to_pylist(),
            )
        }
        total_dl = sum(dl.values())
        tf = _tf_table()
        df = collections.Counter(
            w for (_, w) in tf if w in self.TERMS
        )
        idf = {w: (IDF_SCALE * n_docs) // df[w] for w in self.TERMS}
        scores: dict = {}
        for (doc, w), c in tf.items():
            if w not in self.TERMS:
                continue
            norm_i = 250_000 + (750_000 * dl[doc] * n_docs) // total_dl
            numer = idf[w] * c * 2200 // 1000
            contrib = numer * 1_000_000 // (
                c * 1_000_000 + 1200 * norm_i // 1000
            )
            tt, sc = scores.get(doc, (0, 0))
            scores[doc] = (tt + c, sc + contrib)
        hits = [(doc, tt, sc) for doc, (tt, sc) in scores.items()]
        hits.sort(key=lambda x: (-x[2], x[0]))
        assert got == hits[:10]
        assert got

    def test_length_norm_orders_equal_tf(self):
        # two docs with the same tf must rank shorter-doc-first (the
        # whole point of the b-term); verify the property holds on the
        # fixture whenever it fires
        from ner_pytorch_ray.pipelines.search import bm25_search

        rows = bm25_search(SF, ["scan"], k=50).take_all()
        t = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        )
        dl = {
            doc: len(text.split(" "))
            for doc, text in zip(
                t.column("doc_id").to_pylist(),
                t.column("text").to_pylist(),
            )
        }
        by_tf: dict = {}
        for r in rows:
            by_tf.setdefault(r["tf_total"], []).append(r)
        checked = 0
        for tf_v, grp in by_tf.items():
            for a in grp:
                for b in grp:
                    if dl[a["doc_id"]] < dl[b["doc_id"]]:
                        assert a["score_i"] >= b["score_i"]
                        checked += 1
        assert checked > 0

    def test_empty_terms_raises(self):
        import pytest

        from ner_pytorch_ray.pipelines.search import bm25_search

        with pytest.raises(ValueError):
            bm25_search(SF, [])


class TestHybridRRF:
    def _seq_cosine(self, terms):
        tf = _tf_table()
        num: dict = {}
        norm2: dict = {}
        for (doc, w), c in tf.items():
            norm2[doc] = norm2.get(doc, 0) + c * c
            if w in terms:
                num[doc] = num.get(doc, 0) + c
        return {
            d: 1_000_000 * n * n // norm2[d] for d, n in num.items() if n > 0
        }

    def test_cosine_matches_sequential_recompute(self):
        from ner_pytorch_ray.pipelines.search import lexical_cosine_search

        terms = ["dup", "scan", "merge"]
        got = [
            (r["doc_id"], r["num"], r["norm2"], r["cos2_ppm"])
            for r in lexical_cosine_search(SF, terms, k=7).take_all()
        ]
        cos = self._seq_cosine(set(terms))
        ref_order = sorted(cos, key=lambda d: (-cos[d], d))[:7]
        assert [g[0] for g in got] == ref_order
        for d, n, n2, c in got:
            assert c == cos[d]
            assert c == 1_000_000 * n * n // n2

    def test_rrf_fuses_both_systems(self):
        from ner_pytorch_ray.pipelines.search import (
            RRF_SCALE,
            bm25_search,
            hybrid_rrf_search,
        )

        terms = ["dup", "scan", "merge"]
        pool = 20
        fused = hybrid_rrf_search(SF, terms, k=10, pool=pool).take_all()
        # ranks are 1-based, bounded by the pool, and at least one system
        # must have ranked every fused doc
        for r in fused:
            assert 0 <= r["bm25_rank"] <= pool
            assert 0 <= r["cos_rank"] <= pool
            assert r["bm25_rank"] or r["cos_rank"]
            want = (
                RRF_SCALE // (60 + r["bm25_rank"]) if r["bm25_rank"] else 0
            ) + (RRF_SCALE // (60 + r["cos_rank"]) if r["cos_rank"] else 0)
            assert r["rrf_i"] == want
        # fusion order is (rrf_i desc, doc_id asc)
        keys = [(-r["rrf_i"], r["doc_id"]) for r in fused]
        assert keys == sorted(keys)
        # the BM25 rank column reproduces the standalone BM25 order
        bm = bm25_search(SF, terms, k=pool).take_all()
        bm_rank = {r["doc_id"]: i + 1 for i, r in enumerate(bm)}
        for r in fused:
            if r["bm25_rank"]:
                assert bm_rank[r["doc_id"]] == r["bm25_rank"]

    def test_empty_terms_raise(self):
        import pytest

        from ner_pytorch_ray.pipelines.search import (
            hybrid_rrf_search,
            lexical_cosine_search,
        )

        with pytest.raises(ValueError):
            lexical_cosine_search(SF, [], k=3)
        with pytest.raises(ValueError):
            hybrid_rrf_search(SF, [], k=3)
