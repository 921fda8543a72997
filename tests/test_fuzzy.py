"""Fuzzy surface-form matching (pipelines/fuzzy.py): FastSS
deletion-neighborhood blocking + exact Levenshtein verify. Ground truth is
a brute-force all-pairs Levenshtein over a small synthetic vocabulary; the
SQL-oracle comparison runs via tools/check_oracles.py."""

import pyarrow as pa

import ray.data

from ner_pytorch_ray.pipelines.fuzzy import (
    deletion_neighborhood,
    fuzzy_surface_pairs,
    levenshtein,
)


def _brute_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j]
        for i, ca in enumerate(a, 1):
            cur.append(min(prev[i] + 1, cur[-1] + 1, prev[i - 1] + (ca != cb)))
        prev = cur
    return prev[len(a)]


VOCAB = [
    "google",
    "googel",
    "gogle",
    "googly",
    "apple",
    "appel",
    "appletree",
    "banana",
    "bananna",
    "ban",
    "bane",
    "a",
    "ab",
    "xyz",
    "xylophone",
    "entity",
    "entities",
    "entety",
]


class TestKernels:
    def test_levenshtein_matches_bruteforce(self):
        for a in VOCAB:
            for b in VOCAB:
                d = _brute_levenshtein(a, b)
                got = levenshtein(a, b, cap=3)
                assert got == min(d, 4), (a, b, got, d)

    def test_levenshtein_cap_early_exit(self):
        assert levenshtein("abcdefgh", "zyxwvuts", cap=2) == 3

    def test_deletion_neighborhood_contains_self_and_sizes(self):
        nb = deletion_neighborhood("abc", 2)
        assert "abc" in nb and "ab" in nb and "a" in nb and "bc" in nb
        # k=2 over len-3: itself + 3 one-deletions + 3 two-deletions
        assert nb == {"abc", "ab", "ac", "bc", "a", "b", "c"}

    def test_common_variant_implies_candidate(self):
        # the FastSS recall argument: ed(a,b)<=k => shared k-deletion variant
        for a in VOCAB:
            for b in VOCAB:
                if a < b and _brute_levenshtein(a, b) <= 2:
                    assert deletion_neighborhood(a, 2) & deletion_neighborhood(
                        b, 2
                    ), (a, b)


class TestPipeline:
    def _run(self, surfaces, max_dist=2, **kw):
        ds = ray.data.from_arrow(
            pa.table({"surface": pa.array(surfaces, type=pa.string())})
        )
        rows = fuzzy_surface_pairs(ds, max_dist=max_dist, **kw).take_all()
        return [(r["surf_a"], r["surf_b"], r["dist"]) for r in rows]

    def _expect(self, surfaces, max_dist=2, min_len=1):
        uniq = sorted({s for s in surfaces if len(s) >= min_len})
        out = []
        for i, a in enumerate(uniq):
            for b in uniq[i + 1 :]:
                d = _brute_levenshtein(a, b)
                if d <= max_dist:
                    out.append((a, b, d))
        return sorted(out)

    def test_matches_bruteforce(self):
        got = self._run(VOCAB)
        assert got == self._expect(VOCAB)

    def test_duplicate_surfaces_dedupe(self):
        got = self._run(VOCAB * 7)
        assert got == self._expect(VOCAB)

    def test_max_dist_1(self):
        got = self._run(VOCAB, max_dist=1)
        assert got == self._expect(VOCAB, max_dist=1)

    def test_min_len_gate(self):
        got = self._run(VOCAB, min_len=3)
        assert got == self._expect(VOCAB, min_len=3)

    def test_hot_bucket_raises(self):
        import pytest

        # 30 surfaces sharing the empty-string 2-deletion variant ("aa"… all
        # length-2 over one char) blow a max_bucket=5 guard
        hot = [c * 2 for c in "abcdefghijklmnopqrstuvwxyz"]
        with pytest.raises(Exception, match="max_bucket"):
            self._run(hot, max_bucket=5)

    def test_canonical_clusters_match_bruteforce_closure(self):
        from ner_pytorch_ray.pipelines.fuzzy import fuzzy_canonical_clusters

        ds = ray.data.from_arrow(
            pa.table({"surface": pa.array(VOCAB, type=pa.string())})
        )
        pairs = fuzzy_surface_pairs(ds, max_dist=2)
        got = sorted(
            (r["surface"], r["canonical"])
            for r in fuzzy_canonical_clusters(pairs).take_all()
        )
        # brute-force union-find over the same pair set
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        members = set()
        for a, b, _ in self._expect(VOCAB):
            members |= {a, b}
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expect = sorted((s, find(s)) for s in members)
        assert got == expect
        # chains merge across > max_dist endpoints: googel~google~googly
        canon = dict(got)
        assert canon["googly"] == canon["googel"]

    def test_partitioning_invariance(self):
        ds = ray.data.from_arrow(
            pa.table({"surface": pa.array(VOCAB * 3, type=pa.string())})
        ).repartition(7)
        rows = fuzzy_surface_pairs(ds, max_dist=2).take_all()
        got = [(r["surf_a"], r["surf_b"], r["dist"]) for r in rows]
        assert got == self._expect(VOCAB)


class TestMaxLen:
    def test_overlong_surfaces_excluded_by_spec(self):
        from ner_pytorch_ray.pipelines.fuzzy import fuzzy_surface_pairs

        long_a = "x" * 100
        long_b = "x" * 99  # within dist 1 of long_a, but over max_len
        ds = ray.data.from_arrow(
            pa.table(
                {"surface": pa.array(VOCAB + [long_a, long_b], pa.string())}
            )
        )
        rows = fuzzy_surface_pairs(ds, max_dist=2).take_all()
        surfs = {r["surf_a"] for r in rows} | {r["surf_b"] for r in rows}
        assert long_a not in surfs and long_b not in surfs
        # the rest of the vocabulary is unaffected
        got = sorted((r["surf_a"], r["surf_b"], r["dist"]) for r in rows)
        exp = TestPipeline()._expect(VOCAB)
        assert got == exp
