"""KG analytics layer (pipelines/kg_analytics.py): 2-hop metapaths,
exact-integer edge lift, ontology schema stats, weighted-LPA communities,
personalized PageRank. Ground truth is plain-Python recompute on hand-built
edge sets; the SQL-oracle comparison runs via tools/check_oracles.py."""

import pyarrow as pa
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


def _edges_ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([r[0] for r in rows], type=pa.string()),
                "b": pa.array([r[1] for r in rows], type=pa.string()),
                "w": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )
    )


def _sym(rows):
    return rows + [(b, a, w) for a, b, w in rows]


def _lpa_ref(rows, rounds):
    """Sequential weighted LPA: max summed weight, ties -> smallest label."""
    nodes = sorted({a for a, _, _ in rows})
    lab = {v: v for v in nodes}
    for _ in range(rounds):
        votes = {}
        for a, b, w in rows:
            key = (b, lab[a])
            votes[key] = votes.get(key, 0) + w
        new = {}
        for (v, lb), s in votes.items():
            cur = new.get(v)
            if cur is None or (-s, lb) < (-cur[0], cur[1]):
                new[v] = (s, lb)
        lab = {v: (new[v][1] if v in new else lab[v]) for v in nodes}
    return lab


class TestCommunities:
    def test_two_cliques_with_bridge(self):
        from ner_pytorch_ray.pipelines.kg_analytics import (
            communities_over_edges,
        )

        # two weighted triangles joined by one weak bridge: LPA must keep
        # them as separate communities (bridge weight < intra weight)
        tri1 = [("a1", "a2", 5), ("a2", "a3", 5), ("a1", "a3", 5)]
        tri2 = [("b1", "b2", 5), ("b2", "b3", 5), ("b1", "b3", 5)]
        bridge = [("a3", "b1", 1)]
        rows = _sym(tri1 + tri2 + bridge)
        got = {
            r["node"]: r["community"]
            for r in communities_over_edges(
                _edges_ds(rows), rounds=4, weight_col="w"
            ).take_all()
        }
        ref = _lpa_ref(rows, 4)
        assert got == ref
        assert len({got["a1"], got["a2"], got["a3"]}) == 1
        assert len({got["b1"], got["b2"], got["b3"]}) == 1
        assert got["a1"] != got["b1"]

    def test_multiblock_merge_path(self):
        # regression: the vote accumulator used to be a dict, which Ray
        # coerces to a union-struct when storing partial aggregates in
        # Arrow blocks — absent keys came back as None and crashed
        # vote_merge (int + NoneType) whenever one node's votes spanned
        # multiple partial blocks.  Many small blocks force that merge
        # path deterministically.
        from ner_pytorch_ray.pipelines.kg_analytics import (
            communities_over_edges,
        )

        # star-of-cliques: every hub node receives votes from neighbors
        # scattered across blocks
        rows = []
        for c in range(6):
            ns = [f"c{c}n{i}" for i in range(5)]
            rows += [
                (ns[i], ns[j], 3 + (i + j) % 4)
                for i in range(5)
                for j in range(i + 1, 5)
            ]
        rows += [(f"c{c}n0", f"c{(c+1)%6}n0", 1) for c in range(6)]
        sym = _sym(rows)
        got = {
            r["node"]: r["community"]
            for r in communities_over_edges(
                _edges_ds(sym).repartition(16), rounds=3, weight_col="w"
            ).take_all()
        }
        assert got == _lpa_ref(sym, 3)

    def test_partitioning_invariance(self):
        from ner_pytorch_ray.pipelines.kg_analytics import (
            communities_over_edges,
        )

        rows = _sym(
            [
                ("n%d" % i, "n%d" % ((i + 1) % 7), (i % 3) + 1)
                for i in range(7)
            ]
            + [("n0", "n3", 4), ("n2", "n5", 2)]
        )
        ref = _lpa_ref(rows, 3)
        for blocks in (1, 5):
            ds = _edges_ds(rows).repartition(blocks)
            got = {
                r["node"]: r["community"]
                for r in communities_over_edges(
                    ds, rounds=3, weight_col="w"
                ).take_all()
            }
            assert got == ref

    def test_small_graph_routing_matches_distributed(self):
        from ner_pytorch_ray.pipelines.kg_analytics import (
            communities_over_edges,
        )

        rows = _sym([("x", "y", 2), ("y", "z", 3), ("x", "z", 1)])
        dist = communities_over_edges(
            _edges_ds(rows), rounds=4, weight_col="w"
        ).take_all()
        local = communities_over_edges(
            _edges_ds(rows), rounds=4, weight_col="w", small_graph=10**6
        ).take_all()
        key = lambda r: r["node"]  # noqa: E731
        assert sorted(dist, key=key) == sorted(local, key=key)


class TestPPR:
    def test_teleport_mass_concentrates_on_seed(self):
        from ner_pytorch_ray.pipelines.graph_ops import pagerank_over_edges

        # star around 'hub' plus a far pair; PPR from 'leaf1' must rank
        # leaf1 and hub above the disconnected pair (which gets 0)
        rows = _sym(
            [
                ("hub", "leaf1", 1),
                ("hub", "leaf2", 1),
                ("hub", "leaf3", 1),
                ("p1", "p2", 1),
            ]
        )
        got = {
            r["node"]: r["rank"]
            for r in pagerank_over_edges(
                _edges_ds(rows),
                iters=3,
                node_type=pa.string(),
                weight_col="w",
                teleport=["leaf1"],
            ).take_all()
        }
        assert got["p1"] == 0 and got["p2"] == 0
        # the seed keeps the teleport base on top of the same hub
        # contribution its sibling leaves get (mass oscillates across the
        # bipartite star, so hub vs leaf ordering depends on iter parity —
        # the stable invariants are seed > siblings > 0 and hub > 0)
        assert got["leaf1"] > got["leaf2"] > 0
        assert got["leaf2"] == got["leaf3"]
        assert got["hub"] > 0

    def test_seed_absent_raises(self):
        from ner_pytorch_ray.pipelines.graph_ops import pagerank_over_edges

        rows = _sym([("a", "b", 1)])
        with pytest.raises(ValueError, match="no teleport seed"):
            pagerank_over_edges(
                _edges_ds(rows),
                iters=1,
                node_type=pa.string(),
                weight_col="w",
                teleport=["zzz"],
            ).take_all()

    def test_small_graph_routing_matches_distributed(self):
        from ner_pytorch_ray.pipelines.graph_ops import pagerank_over_edges

        rows = _sym([("a", "b", 2), ("b", "c", 1), ("a", "c", 3)])
        kwargs = dict(
            iters=3, node_type=pa.string(), weight_col="w", teleport=["b"]
        )
        dist = pagerank_over_edges(_edges_ds(rows), **kwargs).take_all()
        local = pagerank_over_edges(
            _edges_ds(rows), small_graph=10**6, **kwargs
        ).take_all()
        key = lambda r: r["node"]  # noqa: E731
        assert sorted(dist, key=key) == sorted(local, key=key)


class TestLiftAndPaths:
    def test_edge_lift_formula(self):
        """lift_ppm recomputed from the same pipeline's own edge/marginal
        counts (w, ca, cb are SQL-oracled; this pins the integer formula)."""
        from ner_pytorch_ray.pipelines.kg_analytics import (
            LIFT_SCALE,
            edge_lift,
        )

        rows = edge_lift(SF).take_all()
        assert rows
        t = _T(rows)  # the shared total-sentence constant
        for r in rows:
            assert r["lift_ppm"] == (LIFT_SCALE * r["weight"] * t) // (
                r["ca"] * r["cb"]
            )

    def test_paths_2hop_excludes_2cycles(self):
        from ner_pytorch_ray.pipelines.kg_analytics import metapaths_2hop

        rows = metapaths_2hop(SF).take_all()
        assert rows
        assert all(r["subj"] != r["obj"] for r in rows)
        assert all(r["n_mids"] >= 1 and r["path_weight"] >= 1 for r in rows)

    def test_schema_stats_types(self):
        from ner_pytorch_ray.pipelines.kg_analytics import schema_stats

        rows = schema_stats(SF).take_all()
        assert rows
        types = {r["subj_type"] for r in rows} | {
            r["obj_type"] for r in rows
        }
        assert types <= {"ORG", "PER", "LOC", "MISC"}


class TestValidatedTriples:
    def test_enforces_mined_signatures(self):
        from ner_pytorch_ray.pipelines.kg_analytics import (
            schema_stats,
            validated_triples,
        )

        sigs = {
            (r["subj_type"], r["pred"], r["obj_type"]): r["n_triples"]
            for r in schema_stats(SF).take_all()
        }
        kept = validated_triples(SF, min_support=3).take_all()
        assert kept

        def sig(r):
            return (
                r["subj"].split(":")[0].upper(),
                r["pred"],
                r["obj"].split(":")[0].upper(),
            )

        assert all(sigs[sig(r)] >= 3 for r in kept)
        # the gate actually binds: some signature is below support
        n_total = sum(sigs.values())
        n_kept = len(kept)
        assert n_kept < n_total
        assert n_kept == sum(n for n in sigs.values() if n >= 3)


class TestSparsifyAndEvidence:
    def test_sparsify_union_semantics(self):
        from ner_pytorch_ray.pipelines.kg_analytics import (
            _kg_symmetric_edges,
            sparsify_edges,
        )

        sym = {
            (r["a"], r["b"]): r["w"]
            for r in _kg_symmetric_edges(SF).take_all()
        }
        kept = {
            (r["subj"], r["obj"]): r["weight"]
            for r in sparsify_edges(SF, k=2).take_all()
        }
        assert kept
        # reference: per node top-2 by (w desc, b asc), union both sides
        by_node: dict = {}
        for (a, b), w in sym.items():
            by_node.setdefault(a, []).append((b, w))
        ref = {}
        for node, nbrs in by_node.items():
            for b, w in sorted(nbrs, key=lambda t: (-t[1], t[0]))[:2]:
                ref[(min(node, b), max(node, b))] = w
        assert kept == ref
        # it actually sparsifies on this graph (6-clique, degree 5 > 2)
        assert len(kept) < len(sym) // 2

    def test_evidence_supports_relations(self):
        from ner_pytorch_ray.pipelines.kg import relations_from_documents
        from ner_pytorch_ray.pipelines.kg_analytics import kg_evidence

        ev = kg_evidence(SF).take_all()
        assert ev
        # folding evidence rows reproduces every triple's weight exactly
        agg: dict = {}
        for r in ev:
            k = (r["subj"], r["pred"], r["obj"])
            agg[k] = agg.get(k, 0) + 1
        triples = {
            (r["subj"], r["pred"], r["obj"]): r["weight"]
            for r in relations_from_documents(SF).take_all()
        }
        assert agg == triples


class TestInverseRelations:
    def test_matches_sequential_recompute(self):
        from ner_pytorch_ray.pipelines.kg import triples_merged_cached
        from ner_pytorch_ray.pipelines.kg_analytics import inverse_relations

        got = {
            (r["pred_a"], r["pred_b"]): (r["n_pairs"], r["joint_weight"])
            for r in inverse_relations(SF).take_all()
        }
        # sequential recompute from the same triple table
        tri = triples_merged_cached(SF).take_all()
        fwd: dict = {}
        for r in tri:
            s, o = r["subj"], r["obj"]
            if s == o:
                continue
            a, b = min(s, o), max(s, o)
            fwd.setdefault((a, b), {True: [], False: []})[s == a].append(
                (r["pred"], r["weight"])
            )
        ref: dict = {}
        for sides in fwd.values():
            for p1, w1 in sides[True]:
                for p2, w2 in sides[False]:
                    n, jw = ref.get((p1, p2), (0, 0))
                    ref[(p1, p2)] = (n + 1, jw + w1 * w2)
        assert got == ref
        assert got  # non-degenerate on the fixture
        # every diagonal entry is a symmetry-support row for that pred
        assert any(a == b for a, b in got)


class TestRandomWalks:
    def _ref_walks(self, rows, walks_per_node, steps):
        """Sequential recompute: sorted adjacency + md5 threshold."""
        import bisect

        from ner_pytorch_ray.pipelines.kg_analytics import _walk_threshold

        adj = {}
        for a, b, w in rows:
            adj.setdefault(a, []).append((b, w))
        out = []
        for v in sorted(adj):
            nbrs = sorted(adj[v])
            for r in range(walks_per_node):
                cur = v
                out.append((v, r, 0, v))
                for k in range(1, steps + 1):
                    nb = sorted(adj[cur])
                    cums, acc = [], 0
                    for _, w in nb:
                        acc += w
                        cums.append(acc)
                    t = _walk_threshold(v, r, k, cur) % acc
                    cur = nb[bisect.bisect_right(cums, t)][0]
                    out.append((v, r, k, cur))
        return sorted(out)

    def test_matches_sequential_and_partitioning_invariant(self):
        from ner_pytorch_ray.pipelines.kg_analytics import (
            random_walks_over_edges,
        )

        rows = _sym(
            [
                ("a", "b", 3),
                ("b", "c", 1),
                ("c", "d", 5),
                ("a", "d", 2),
                ("b", "d", 4),
            ]
        )
        ref = self._ref_walks(rows, 2, 3)
        for blocks in (1, 4):
            got = sorted(
                (r["start"], r["walk_idx"], r["step"], r["node"])
                for r in random_walks_over_edges(
                    _edges_ds(rows).repartition(blocks),
                    walks_per_node=2,
                    steps=3,
                    weight_col="w",
                ).take_all()
            )
            assert got == ref

    def test_walk_edges_are_real_edges(self):
        from ner_pytorch_ray.pipelines.kg_analytics import kg_random_walks

        rows = kg_random_walks(SF, walks_per_node=1, steps=2).take_all()
        assert rows
        walks = {}
        for r in rows:
            walks.setdefault((r["start"], r["walk_idx"]), {})[r["step"]] = r[
                "node"
            ]
        for (start, _), pos in walks.items():
            assert pos[0] == start
            assert sorted(pos) == list(range(len(pos)))
            # consecutive nodes differ (no self-loops in the co-occurrence
            # graph, so a hop never stays put)
            for k in range(1, len(pos)):
                assert pos[k] != pos[k - 1]


class TestSkipgram:
    def test_pairs_symmetric_and_counted(self):
        from ner_pytorch_ray.pipelines.kg_analytics import (
            kg_random_walks,
            kg_skipgram_pairs,
        )

        pairs = kg_skipgram_pairs(
            SF, walks_per_node=2, steps=3, window=2
        ).take_all()
        assert pairs
        got = {(r["center"], r["context"]): r["n_pairs"] for r in pairs}
        # recompute from the walk corpus itself
        walks = {}
        for r in kg_random_walks(SF, walks_per_node=2, steps=3).take_all():
            walks.setdefault((r["start"], r["walk_idx"]), {})[r["step"]] = r[
                "node"
            ]
        ref: dict = {}
        for pos in walks.values():
            steps = sorted(pos)
            for i in steps:
                for j in steps:
                    if i != j and abs(i - j) <= 2:
                        k = (pos[i], pos[j])
                        ref[k] = ref.get(k, 0) + 1
        assert got == ref
        # skip-gram windows are symmetric: (a,b) and (b,a) counts match
        for (c, x), n in got.items():
            assert got[(x, c)] == n


def _T(rows):
    """Recover the total-sentence constant T from the reported integer
    fields: T is the unique integer with
    lift = (S*w*T)//(ca*cb)  for every row simultaneously."""
    from ner_pytorch_ray.pipelines.kg_analytics import LIFT_SCALE

    r = rows[0]
    lo = (r["lift_ppm"] * r["ca"] * r["cb"]) // (LIFT_SCALE * r["weight"])
    for t in range(max(1, lo), lo + r["ca"] * r["cb"] + 2):
        if all(
            x["lift_ppm"]
            == (LIFT_SCALE * x["weight"] * t) // (x["ca"] * x["cb"])
            for x in rows
        ):
            return t
    raise AssertionError("no consistent T")


class TestStarQuery:
    def test_matches_sequential_recompute(self):
        from ner_pytorch_ray.pipelines.kg import triples_merged_cached
        from ner_pytorch_ray.pipelines.kg_analytics import star_query

        cons = [("scan", "loc:"), ("merge", "org:")]
        got = [
            (r["subj"], r["n_matches"], r["total_weight"])
            for r in star_query(SF, constraints=cons).take_all()
        ]
        # sequential recompute: subjects covering EVERY constraint
        tri = triples_merged_cached(SF).take_all()
        per: dict = {}
        for r in tri:
            for cid, (pred, pre) in enumerate(cons):
                if r["pred"] == pred and r["obj"].startswith(pre):
                    cov, n, w = per.get(r["subj"], (set(), 0, 0))
                    per[r["subj"]] = (
                        cov | {cid},
                        n + 1,
                        w + r["weight"],
                    )
        ref = sorted(
            (s, n, w)
            for s, (cov, n, w) in per.items()
            if len(cov) == len(cons)
        )
        assert got == ref
        assert got  # the default constraints hit at sf0.001
        # the ALL-constraints gate binds: some subject matches only one
        assert any(len(cov) < len(cons) for cov, _, _ in per.values())

    def test_output_sorted_and_partial_subjects_excluded(self):
        from ner_pytorch_ray.pipelines.kg_analytics import star_query

        rows = star_query(SF).take_all()
        subjects = [r["subj"] for r in rows]
        assert subjects == sorted(subjects)
        assert len(subjects) == len(set(subjects))
