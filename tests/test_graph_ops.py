"""Graph operators over the dup-pair graph: hash-min connected components
and integer fixed-point PageRank (pipelines/graph_ops.py). Ground truth is
a plain-Python BFS / dict-loop recompute on a hand-built corpus whose
containment structure (chain, clique, isolated doc) is known by
construction; the SQL-oracle comparison runs via tools/check_oracles.py."""

import collections

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _crafted_corpus():
    """Containment structure by construction (prefix m=5, token-aligned):
    - chain 0-1-2 (diameter 2: doc0's prefix in doc1, doc1's in doc2,
      doc0's NOT in doc2) -> exercises multi-round propagation
    - pair 3-4 (shared prefix)
    - doc 5 isolated (unique tokens, >= 5 of them) -> excluded from output
    - doc 6 too short (< 5 tokens) -> excluded from the graph entirely
    """
    return [
        "a1 a2 a3 a4 a5 tail0",
        "b1 b2 b3 b4 b5 a1 a2 a3 a4 a5",
        "c1 c2 c3 c4 c5 b1 b2 b3 b4 b5",
        "s1 s2 s3 s4 s5 x",
        "s1 s2 s3 s4 s5 y",
        "u1 u2 u3 u4 u5 u6",
        "t1 t2",
    ]


def _ref_edges(texts, m=5):
    padded = {i: " " + t + " " for i, t in enumerate(texts)}
    edges = set()
    for i, t in enumerate(texts):
        toks = t.split(" ")
        if len(toks) < m:
            continue
        pref = " " + " ".join(toks[:m]) + " "
        for j, p in enumerate(padded.items()):
            jd, ptxt = p
            if jd == i or len(texts[jd].split(" ")) < m:
                continue
            if pref in ptxt:
                edges.add((i, jd))
                edges.add((jd, i))
    return edges


def test_dup_edges_crafted(ray_session, tmp_path):
    from ner_pytorch_ray.pipelines.graph_ops import dup_edges

    texts = _crafted_corpus()
    sf = _write_docs(tmp_path, texts)
    got = {(r["a"], r["b"]) for r in dup_edges(sf).take_all()}
    want = _ref_edges(texts)
    assert got == want
    # chain edges present, no 0-2 shortcut, short doc absent
    assert (0, 1) in got and (1, 2) in got and (0, 2) not in got
    assert not any(6 in e for e in got)


def test_connected_components_crafted(ray_session, tmp_path):
    from ner_pytorch_ray.pipelines.graph_ops import connected_components

    texts = _crafted_corpus()
    sf = _write_docs(tmp_path, texts)
    got = {
        r["node"]: r["component"]
        for r in connected_components(sf).take_all()
    }
    # chain 0-1-2 collapses to min id 0 (needs >1 propagation round);
    # pair 3-4 -> 3; isolated docs 5, 6 not in the graph
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}


def test_pagerank_crafted_exact_integers(ray_session, tmp_path):
    from ner_pytorch_ray.pipelines.graph_ops import pagerank, SCALE

    texts = _crafted_corpus()
    sf = _write_docs(tmp_path, texts)
    got = {r["node"]: r["rank"] for r in pagerank(sf, iters=5).take_all()}

    edges = _ref_edges(texts)
    nodes = sorted({a for a, _ in edges})
    N = len(nodes)
    deg = collections.Counter(a for a, _ in edges)
    r = {v: SCALE // N for v in nodes}
    for _ in range(5):
        nr = {v: (150 * SCALE) // (1000 * N) for v in nodes}
        for a, b in edges:
            nr[b] += (850 * r[a]) // (1000 * deg[a])
        r = nr
    assert got == r
    # middle of the chain (deg 2) outranks the endpoints (deg 1)
    assert got[1] > got[0] and got[1] > got[2]
    # total mass conserved up to floor-division loss
    assert 0 <= SCALE - sum(got.values()) < 2 * 1000 * N


def test_components_partition_invariance(ray_session, tmp_path):
    """Same fixpoint regardless of how the input file is blocked: hash-min
    uses only order-independent mins, so the label table must be
    bit-identical under different parallelism."""
    import ray
    from ner_pytorch_ray.pipelines.graph_ops import connected_components

    # enough docs to span several blocks: 10 chains of length 3
    texts = []
    for c in range(10):
        texts.append(f"a{c}1 a{c}2 a{c}3 a{c}4 a{c}5 tail{c}")
        texts.append(f"b{c}1 b{c}2 b{c}3 b{c}4 b{c}5 a{c}1 a{c}2 a{c}3 a{c}4 a{c}5")
        texts.append(f"c{c}1 c{c}2 c{c}3 c{c}4 c{c}5 b{c}1 b{c}2 b{c}3 b{c}4 b{c}5")
    sf = _write_docs(tmp_path, texts)
    out = sorted(
        (r["node"], r["component"])
        for r in connected_components(sf).take_all()
    )
    assert len(out) == 30
    want = sorted((3 * c + i, 3 * c) for c in range(10) for i in range(3))
    assert out == want


def test_pagerank_over_edges_weighted(ray_session):
    """Weighted generalization: hand-built 3-node weighted graph vs the
    arbitrary-precision dict-loop recompute of the same integer update."""
    import ray
    from ner_pytorch_ray.pipelines.graph_ops import pagerank_over_edges, SCALE

    ew = [("x", "y", 3), ("y", "x", 3), ("y", "z", 1), ("z", "y", 1)]
    t = pa.table(
        {
            "a": pa.array([e[0] for e in ew]),
            "b": pa.array([e[1] for e in ew]),
            "w": pa.array([e[2] for e in ew], type=pa.int64()),
        }
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank_over_edges(
            ray.data.from_arrow(t), iters=4, node_type=pa.string(),
            weight_col="w",
        ).take_all()
    }

    nodes = sorted({a for a, _, _ in ew})
    N = len(nodes)
    sw = collections.Counter()
    for a, _, w in ew:
        sw[a] += w
    r = {v: SCALE // N for v in nodes}
    for _ in range(4):
        nr = {v: (150 * SCALE) // (1000 * N) for v in nodes}
        for a, b, w in ew:
            nr[b] += (850 * r[a] * w) // (1000 * sw[a])
        r = nr
    assert got == r
    # x gets 3/4 of y's outflow vs z's 1/4
    assert got["x"] > got["z"]


def test_kg_pagerank_matches_edge_recompute(ray_session):
    """kg_pagerank over sf0.001 == the integer recompute from the batch
    kg_edges table (weights = co-sentence counts, symmetrized)."""
    from ner_pytorch_ray.pipelines.graph_ops import kg_pagerank, SCALE
    from ner_pytorch_ray.pipelines.kg import kg_from_documents

    edges_ds, _ = kg_from_documents(SF)
    ew = []
    for row in edges_ds.take_all():
        ew.append((row["subj"], row["obj"], row["weight"]))
        ew.append((row["obj"], row["subj"], row["weight"]))
    nodes = sorted({a for a, _, _ in ew})
    N = len(nodes)
    sw = collections.Counter()
    for a, _, w in ew:
        sw[a] += w
    r = {v: SCALE // N for v in nodes}
    for _ in range(3):
        nr = {v: (150 * SCALE) // (1000 * N) for v in nodes}
        for a, b, w in ew:
            nr[b] += (850 * r[a] * w) // (1000 * sw[a])
        r = nr

    got = {
        row["node"]: row["rank"]
        for row in kg_pagerank(SF, iters=3).take_all()
    }
    assert got == r


def test_components_over_edges_random_graphs(ray_session):
    """Seeded random graphs: distributed hash-min == BFS reference, for
    both int and string node types (string = lexicographic min)."""
    import random

    import ray
    from ner_pytorch_ray.pipelines.graph_ops import components_over_edges

    rng = random.Random(7)
    for trial in range(3):
        n = 30
        und = set()
        for _ in range(25):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                und.add((min(a, b), max(a, b)))
        edges = sorted(und | {(b, a) for a, b in und})
        # BFS reference
        adj = {}
        for a, b in edges:
            adj.setdefault(a, []).append(b)
        comp = {}
        for v in sorted(adj):
            if v in comp:
                continue
            stack, seen = [v], {v}
            while stack:
                u = stack.pop()
                for w in adj[u]:
                    if w not in seen:
                        seen.add(w)
                        stack.append(w)
            mnode = min(seen)
            for u in seen:
                comp[u] = mnode

        t_int = pa.table(
            {
                "a": pa.array([a for a, _ in edges], type=pa.int64()),
                "b": pa.array([b for _, b in edges], type=pa.int64()),
            }
        )
        got = {
            r["node"]: r["component"]
            for r in components_over_edges(ray.data.from_arrow(t_int)).take_all()
        }
        assert got == comp, f"int trial {trial}"

        # string nodes: n{i:03d} preserves the integer order lexicographically
        name = lambda i: f"n{i:03d}"
        t_str = pa.table(
            {
                "a": pa.array([name(a) for a, _ in edges]),
                "b": pa.array([name(b) for _, b in edges]),
            }
        )
        got_s = {
            r["node"]: r["component"]
            for r in components_over_edges(
                ray.data.from_arrow(t_str), node_type=pa.string()
            ).take_all()
        }
        assert got_s == {name(k): name(v) for k, v in comp.items()}, (
            f"str trial {trial}"
        )


def test_kg_components_single_cluster(ray_session):
    """All sf0.001 entities co-occur transitively -> one component rooted
    at the lexicographic minimum."""
    from ner_pytorch_ray.pipelines.graph_ops import kg_components

    rows = kg_components(SF).take_all()
    assert len(rows) > 1
    roots = {r["component"] for r in rows}
    assert roots == {min(r["node"] for r in rows)}


def test_triangles_over_edges_random_graphs(ray_session):
    """Seeded random graphs: distributed 2-round triangle enumeration ==
    brute-force itertools reference (int and string nodes)."""
    import itertools
    import random

    import ray
    from ner_pytorch_ray.pipelines.graph_ops import triangles_over_edges

    rng = random.Random(11)
    for trial in range(3):
        n = 18
        und = set()
        for _ in range(45):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                und.add((min(a, b), max(a, b)))
        asc = sorted(und)
        ref = collections.Counter()
        for x, y, z in itertools.combinations(range(n), 3):
            if (x, y) in und and (y, z) in und and (x, z) in und:
                ref[x] += 1
                ref[y] += 1
                ref[z] += 1

        t = pa.table(
            {
                "a": pa.array([a for a, _ in asc], type=pa.int64()),
                "b": pa.array([b for _, b in asc], type=pa.int64()),
            }
        )
        got = {
            r["node"]: r["n_triangles"]
            for r in triangles_over_edges(ray.data.from_arrow(t)).take_all()
        }
        assert got == dict(ref), f"trial {trial}"


def test_triangles_max_degree_guard(ray_session):
    """The hub guard raises instead of silently undercounting."""
    import ray
    from ner_pytorch_ray.pipelines.graph_ops import triangles_over_edges

    star = pa.table(
        {
            "a": pa.array([0] * 10, type=pa.int64()),
            "b": pa.array(range(1, 11), type=pa.int64()),
        }
    )
    with pytest.raises(Exception, match="max_degree"):
        triangles_over_edges(
            ray.data.from_arrow(star), max_degree=5
        ).take_all()


def test_link_prediction_chain_predicts_missing_edge(ray_session):
    """Path 0-1-2-3: pairs (0,2) and (1,3) share one neighbor and are NOT
    edges -> predicted; only_absent drops the existing edges."""
    import ray
    from ner_pytorch_ray.pipelines.graph_ops import link_prediction_over_edges

    asc = pa.table(
        {
            "a": pa.array([0, 1, 2], type=pa.int64()),
            "b": pa.array([1, 2, 3], type=pa.int64()),
        }
    )
    rows = link_prediction_over_edges(ray.data.from_arrow(asc)).take_all()
    scored = {(r["node_a"], r["node_b"]): (r["n_common"], r["is_edge"]) for r in rows}
    assert scored == {(0, 2): (1, 0), (1, 3): (1, 0), (1, 2): (0, 1)} or \
        scored == {(0, 2): (1, 0), (1, 3): (1, 0)}
    absent = link_prediction_over_edges(
        ray.data.from_arrow(asc), only_absent=True
    ).take_all()
    assert {(r["node_a"], r["node_b"]) for r in absent} == {(0, 2), (1, 3)}
    assert all(r["is_edge"] == 0 for r in absent)


def test_link_prediction_random_graphs(ray_session):
    """Common-neighbor counts == brute-force reference on seeded graphs."""
    import itertools
    import random

    import ray
    from ner_pytorch_ray.pipelines.graph_ops import link_prediction_over_edges

    rng = random.Random(23)
    n = 16
    und = set()
    for _ in range(30):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj = collections.defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    ref = {}
    for y, z in itertools.combinations(range(n), 2):
        c = len(adj[y] & adj[z])
        if c >= 1:
            ref[(y, z)] = (c, int((y, z) in und))

    asc = sorted(und)
    t = pa.table(
        {
            "a": pa.array([a for a, _ in asc], type=pa.int64()),
            "b": pa.array([b for _, b in asc], type=pa.int64()),
        }
    )
    rows = link_prediction_over_edges(ray.data.from_arrow(t)).take_all()
    got = {(r["node_a"], r["node_b"]): (r["n_common"], r["is_edge"]) for r in rows}
    assert got == ref


def test_graph_ops_empty_inputs(ray_session, tmp_path):
    """A corpus with no dup pairs: every graph op returns empty without
    crashing (no div-by-zero in pagerank, no schema loss)."""
    import ray
    from ner_pytorch_ray.pipelines.graph_ops import (
        connected_components,
        link_prediction_over_edges,
        pagerank,
        triangles_over_edges,
    )

    texts = [f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f" for i in range(8)]
    sf = _write_docs(tmp_path, texts)
    assert connected_components(sf).count() == 0
    assert pagerank(sf).count() == 0
    empty = pa.table(
        {
            "a": pa.array([], type=pa.int64()),
            "b": pa.array([], type=pa.int64()),
        }
    )
    assert triangles_over_edges(ray.data.from_arrow(empty)).count() == 0
    assert link_prediction_over_edges(ray.data.from_arrow(empty)).count() == 0


def test_kg_node_metrics_consistency(ray_session):
    """The dashboard equals its own parts: joins the standalone components
    / pagerank / triangles results and the mention stats at sf0.001."""
    from ner_pytorch_ray.pipelines.graph_ops import (
        kg_components,
        kg_node_metrics,
        kg_pagerank,
        kg_triangles,
    )

    got = {r["node"]: r for r in kg_node_metrics(SF).take_all()}
    comp = {r["node"]: r["component"] for r in kg_components(SF).take_all()}
    rank = {r["node"]: r["rank"] for r in kg_pagerank(SF, iters=3).take_all()}
    tri = {r["node"]: r["n_triangles"] for r in kg_triangles(SF).take_all()}
    assert set(got) >= set(comp)
    for node, row in got.items():
        assert row["component"] == comp.get(node, node)
        assert row["rank"] == rank.get(node, 0)
        assert row["n_triangles"] == tri.get(node, 0)
        assert row["n_mentions"] > 0 and row["n_surfaces"] > 0


def test_small_graph_routing_matches_distributed(ray_session):
    """The size-routed local paths are bit-identical to the distributed
    ones on the same seeded random graph (int and string node types)."""
    import random

    import ray
    from ner_pytorch_ray.pipelines.graph_ops import (
        components_over_edges,
        pagerank_over_edges,
        triangles_over_edges,
    )

    rng = random.Random(31)
    n = 20
    und = set()
    for _ in range(35):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            und.add((min(a, b), max(a, b)))
    asc = sorted(und)
    sym = sorted(und | {(b, a) for a, b in und})

    t_sym = pa.table(
        {
            "a": pa.array([a for a, _ in sym], type=pa.int64()),
            "b": pa.array([b for _, b in sym], type=pa.int64()),
        }
    )
    t_asc = pa.table(
        {
            "a": pa.array([a for a, _ in asc], type=pa.int64()),
            "b": pa.array([b for _, b in asc], type=pa.int64()),
        }
    )

    def rows(ds):
        return sorted(tuple(r.values()) for r in ds.take_all())

    for fn, t in (
        (components_over_edges, t_sym),
        (pagerank_over_edges, t_sym),
        (triangles_over_edges, t_asc),
    ):
        dist = rows(fn(ray.data.from_arrow(t)))
        local = rows(fn(ray.data.from_arrow(t), small_graph=10**6))
        assert dist == local, fn.__name__


def test_ra_link_prediction_hub_discount(ray_session):
    """Two-path graph a-m1-b / a-m2-b plus the direct edge (a, b), where
    hub m2 also serves 4 extras: RA must weight the rare middle m1
    (1e9//2) far above the hub m2 (1e9//6), and flag (a, b) as an
    existing edge while predicting (m1, m2)."""
    import ray

    from ner_pytorch_ray.pipelines.graph_ops import (
        ra_link_prediction_over_edges,
    )

    # nodes: a=0, b=1, m1=2, m2=3, extras 4..7; (0,1) is a real edge
    edges = [
        (0, 1),
        (0, 2),
        (1, 2),
        (0, 3),
        (1, 3),
        (3, 4),
        (3, 5),
        (3, 6),
        (3, 7),
    ]
    asc = pa.table(
        {
            "a": pa.array([min(e) for e in edges], type=pa.int64()),
            "b": pa.array([max(e) for e in edges], type=pa.int64()),
        }
    )
    rows = ra_link_prediction_over_edges(
        ray.data.from_arrow(asc).repartition(3)
    ).take_all()
    scored = {
        (r["node_a"], r["node_b"]): (
            r["n_common"],
            r["ra_score_i"],
            r["is_edge"],
        )
        for r in rows
    }
    # (0,1): common {m1 deg 2, m2 deg 6} -> 1e9//2 + 1e9//6; is an edge
    assert scored[(0, 1)] == (2, 10**9 // 2 + 10**9 // 6, 1)
    # (m1, m2): common {a deg 3, b deg 3} -> predicted missing link
    assert scored[(2, 3)] == (2, 2 * (10**9 // 3), 0)
    # extras pair via the hub only: weight 1e9//6 each
    assert scored[(4, 5)] == (1, 10**9 // 6, 0)


def test_ra_matches_brute_force_random(ray_session):
    import itertools
    import random

    import ray

    from ner_pytorch_ray.pipelines.graph_ops import (
        ra_link_prediction_over_edges,
    )

    rng = random.Random(11)
    n = 14
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(n), rng.randrange(n)) for _ in range(30)
            )
            if a != b
        }
    )
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    exp = {}
    for y, z in itertools.combinations(sorted(adj), 2):
        common = adj[y] & adj[z]
        if common:
            exp[(y, z)] = (
                len(common),
                sum(10**9 // len(adj[x]) for x in common),
                int(z in adj[y]),
            )
    asc = pa.table(
        {
            "a": pa.array([e[0] for e in edges], type=pa.int64()),
            "b": pa.array([e[1] for e in edges], type=pa.int64()),
        }
    )
    rows = ra_link_prediction_over_edges(
        ray.data.from_arrow(asc).repartition(5)
    ).take_all()
    got = {
        (r["node_a"], r["node_b"]): (
            r["n_common"],
            r["ra_score_i"],
            r["is_edge"],
        )
        for r in rows
    }
    assert got == exp


def test_hits_matches_sequential_recompute(ray_session):
    """Crafted directed weighted graph vs a plain-Python recompute of the
    exact integer spec, at two partitionings."""
    import ray

    from ner_pytorch_ray.pipelines.graph_ops import hits_over_edges

    edges = [(0, 1, 3), (0, 2, 1), (1, 2, 2), (3, 1, 1), (2, 3, 5)]
    scale = 10**9

    def seq(iters):
        nodes = sorted({a for a, _, _ in edges} | {b for _, b, _ in edges})
        h = {v: scale // len(nodes) for v in nodes}
        a = {v: 0 for v in nodes}
        for _ in range(iters):
            raw = {v: 0 for v in nodes}
            for u, v, w in edges:
                raw[v] += h[u] * w
            m = sum(raw.values())
            a = {v: (raw[v] * scale) // m for v in nodes}
            raw = {v: 0 for v in nodes}
            for u, v, w in edges:
                raw[u] += a[v] * w
            m = sum(raw.values())
            h = {v: (raw[v] * scale) // m for v in nodes}
        return {v: (h[v], a[v]) for v in nodes}

    t = pa.table(
        {
            "a": pa.array([e[0] for e in edges], type=pa.int64()),
            "b": pa.array([e[1] for e in edges], type=pa.int64()),
            "weight": pa.array([e[2] for e in edges], type=pa.int64()),
        }
    )
    exp = seq(2)
    for blocks in (1, 3):
        got = {
            r["node"]: (r["hub_i"], r["auth_i"])
            for r in hits_over_edges(
                ray.data.from_arrow(t).repartition(blocks),
                iters=2,
                weight_col="weight",
            ).take_all()
        }
        assert got == exp
    # sink node 3 has an out-edge? (3,1): yes — but node with no
    # out-edges in a direction must still appear: check node 1's shape
    assert set(exp) == {0, 1, 2, 3}


def test_sssp_two_hop_strong_beats_one_hop_rare(ray_session):
    """Weighted semantics differ from BFS hops: seed 0 with edges
    0-1 cost 3 (rare) and 0-2 cost 1, 2-1 cost 1 (strong) must label
    node 1 at dist 2, not 3; unreachable node 9 never appears."""
    import ray
    from ner_pytorch_ray.pipelines.graph_ops import sssp_over_edges

    und = [(0, 1, 3), (0, 2, 1), (2, 1, 1), (8, 9, 1)]
    sym = pa.table(
        {
            "a": pa.array(
                [e[0] for e in und] + [e[1] for e in und], type=pa.int64()
            ),
            "b": pa.array(
                [e[1] for e in und] + [e[0] for e in und], type=pa.int64()
            ),
            "cost": pa.array(
                [e[2] for e in und] * 2, type=pa.int64()
            ),
        }
    )
    seeds = ray.data.from_arrow(
        pa.table({"node": pa.array([0], type=pa.int64())})
    )
    got = {
        r["node"]: r["dist"]
        for r in sssp_over_edges(
            ray.data.from_arrow(sym), seeds, node_type=pa.int64()
        ).take_all()
    }
    assert got == {0: 0, 1: 2, 2: 1}


def test_sssp_matches_dijkstra_random(ray_session):
    """Distributed Bellman-Ford == heapq Dijkstra on seeded random
    weighted graphs, multi-source, under different block counts."""
    import heapq
    import random

    import ray
    from ner_pytorch_ray.pipelines.graph_ops import sssp_over_edges

    rng = random.Random(47)
    n = 24
    und = set()
    while len(und) < 40:
        a, b = rng.sample(range(n), 2)
        und.add((min(a, b), max(a, b)))
    edges = [(a, b, rng.randint(1, 5)) for a, b in sorted(und)]
    seeds = [0, 7]

    adj = {}
    for a, b, c in edges:
        adj.setdefault(a, []).append((b, c))
        adj.setdefault(b, []).append((a, c))
    dist = {s: 0 for s in seeds}
    heap = [(0, s) for s in seeds]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, 1 << 60):
            continue
        for v, c in adj.get(u, []):
            nd = d + c
            if nd < dist.get(v, 1 << 60):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))

    sym = pa.table(
        {
            "a": pa.array(
                [e[0] for e in edges] + [e[1] for e in edges],
                type=pa.int64(),
            ),
            "b": pa.array(
                [e[1] for e in edges] + [e[0] for e in edges],
                type=pa.int64(),
            ),
            "cost": pa.array([e[2] for e in edges] * 2, type=pa.int64()),
        }
    )
    seed_ds = ray.data.from_arrow(
        pa.table({"node": pa.array(seeds, type=pa.int64())})
    )
    for blocks in (1, 4):
        got = {
            r["node"]: r["dist"]
            for r in sssp_over_edges(
                ray.data.from_arrow(sym).repartition(blocks),
                seed_ds,
                node_type=pa.int64(),
            ).take_all()
        }
        assert got == dist


def test_jaccard_matches_brute_force_random(ray_session):
    """jaccard_ppm == floor(1e6*|∩|/|∪|) on seeded random graphs,
    degrees exact, is_edge flags correct, under different block counts."""
    import itertools
    import random

    import ray
    from ner_pytorch_ray.pipelines.graph_ops import (
        jaccard_link_scores_over_edges,
    )

    rng = random.Random(53)
    n = 16
    und = {
        (min(a, b), max(a, b))
        for a, b in (rng.sample(range(n), 2) for _ in range(36))
    }
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    exp = {}
    for y, z in itertools.combinations(sorted(adj), 2):
        inter = len(adj[y] & adj[z])
        if inter < 1:
            continue
        union = len(adj[y]) + len(adj[z]) - inter
        exp[(y, z)] = (
            inter,
            len(adj[y]),
            len(adj[z]),
            1_000_000 * inter // union,
            int((y, z) in und),
        )

    t = pa.table(
        {
            "a": pa.array([e[0] for e in sorted(und)], type=pa.int64()),
            "b": pa.array([e[1] for e in sorted(und)], type=pa.int64()),
        }
    )
    for blocks in (1, 4):
        got = {
            (r["node_a"], r["node_b"]): (
                r["n_common"],
                r["deg_a"],
                r["deg_b"],
                r["jaccard_ppm"],
                r["is_edge"],
            )
            for r in jaccard_link_scores_over_edges(
                ray.data.from_arrow(t).repartition(blocks)
            ).take_all()
        }
        assert got == exp


def test_katz_matches_sequential_recompute(ray_session):
    """Truncated Katz sum == sequential per-edge-floor recompute on a
    seeded random digraph-from-symmetric-edges, any block count; every
    node appears (isolated-from-inbound nodes score 0)."""
    import random

    import ray
    from ner_pytorch_ray.pipelines.graph_ops import katz_over_edges

    rng = random.Random(61)
    n = 14
    und = {
        (min(a, b), max(a, b))
        for a, b in (rng.sample(range(n), 2) for _ in range(24))
    }
    sym_pairs = sorted(und) + [(b, a) for a, b in sorted(und)]
    adj = {}
    for a, b in sym_pairs:
        adj.setdefault(a, []).append(b)
    scale, bd, iters = 1_000_000, 4, 3
    cur = {v: scale for v in adj}
    acc = {v: 0 for v in adj}
    for _ in range(iters):
        new = {v: 0 for v in adj}
        for u, ps in adj.items():
            c = cur[u] // bd
            for p in ps:
                new[p] += c
        cur = new
        for v in adj:
            acc[v] += cur[v]

    t = pa.table(
        {
            "a": pa.array([e[0] for e in sym_pairs], type=pa.int64()),
            "b": pa.array([e[1] for e in sym_pairs], type=pa.int64()),
        }
    )
    for blocks in (1, 4):
        got = {
            r["node"]: r["katz_i"]
            for r in katz_over_edges(
                ray.data.from_arrow(t).repartition(blocks), iters=iters
            ).take_all()
        }
        assert got == acc


def test_eccentricity_path_graph(ray_session):
    """Path 0-1-2-3: pivots (all 4 nodes) have ecc 3,2,2,3; a detached
    pair is invisible from the path pivots but contributes pivots of its
    own when within the k smallest."""
    import ray
    from ner_pytorch_ray.pipelines.graph_ops import eccentricity_over_edges

    und = [(0, 1), (1, 2), (2, 3)]
    sym = pa.table(
        {
            "a": pa.array(
                [e[0] for e in und] + [e[1] for e in und], type=pa.int64()
            ),
            "b": pa.array(
                [e[1] for e in und] + [e[0] for e in und], type=pa.int64()
            ),
        }
    )
    rows = eccentricity_over_edges(
        ray.data.from_arrow(sym), n_pivots=4, node_type=pa.int64()
    ).take_all()
    got = {r["pivot_node"]: (r["ecc"], r["n_reached"]) for r in rows}
    assert got == {0: (3, 4), 1: (2, 4), 2: (2, 4), 3: (3, 4)}
