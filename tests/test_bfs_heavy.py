"""Multi-source BFS hop distance (pipelines/graph_ops.bfs_hops_over_edges)
and guaranteed heavy hitters (pipelines/sketches.heavy_ngrams). Ground truth
is plain-Python BFS / Counter recompute on synthetic inputs built so the
distributed machinery is genuinely exercised: a long path graph (many
propagation rounds) and a zipf-skewed corpus whose vocabulary is far larger
than the Misra-Gries counter budget (real evictions in every block)."""

import collections

import numpy as np
import pyarrow as pa
import pytest


def _edges_ds(pairs, node_type=pa.int64()):
    import ray.data

    sym = set()
    for a, b in pairs:
        sym.add((a, b))
        sym.add((b, a))
    a, b = zip(*sorted(sym))
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(list(a), type=node_type),
                "b": pa.array(list(b), type=node_type),
            }
        )
    ).repartition(4)


def _seeds_ds(nodes, node_type=pa.int64()):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"node": pa.array(list(nodes), type=node_type)})
    )


def _ref_bfs(pairs, seeds):
    adj = collections.defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    return dist


def test_bfs_path_graph_many_rounds(ray_session):
    """A 12-node path seeded at one end needs 11 propagation rounds —
    exercises the fixpoint loop well past one shuffle."""
    from ner_pytorch_ray.pipelines.graph_ops import bfs_hops_over_edges

    pairs = [(i, i + 1) for i in range(11)]
    out = bfs_hops_over_edges(
        _edges_ds(pairs), _seeds_ds([0]), node_type=pa.int64(), max_iters=20
    ).to_pandas()
    got = dict(zip(out["node"], out["dist"]))
    assert got == {i: i for i in range(12)}


def test_bfs_multi_seed_min_and_unreachable(ray_session):
    """Two seeds in one component take the min hop count; a disconnected
    component with no seed never appears in the output."""
    from ner_pytorch_ray.pipelines.graph_ops import bfs_hops_over_edges

    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12)]
    seeds = [0, 4]
    out = bfs_hops_over_edges(
        _edges_ds(pairs), _seeds_ds(seeds), node_type=pa.int64()
    ).to_pandas()
    got = dict(zip(out["node"], out["dist"]))
    assert got == _ref_bfs(pairs, seeds)  # {0:0,1:1,2:2,3:1,4:0}
    assert 10 not in got and 11 not in got and 12 not in got


def test_bfs_string_nodes_matches_reference(ray_session):
    from ner_pytorch_ray.pipelines.graph_ops import bfs_hops_over_edges

    pairs = [("e:a", "e:b"), ("e:b", "e:c"), ("e:c", "e:d"), ("x:1", "x:2")]
    seeds = ["e:a"]
    out = bfs_hops_over_edges(
        _edges_ds(pairs, pa.string()),
        _seeds_ds(seeds, pa.string()),
        node_type=pa.string(),
    ).to_pandas()
    got = dict(zip(out["node"], out["dist"]))
    assert got == _ref_bfs(pairs, seeds)
    # output is sorted by node
    assert list(out["node"]) == sorted(out["node"])


def _zipf_corpus(vocab=400, n_tokens=20_000, doc_len=50):
    """Deterministic zipf-ish token stream: word i gets ~C/(i+1) copies;
    seeded shuffle mixes words across docs so every block sees the tail."""
    freqs = np.array([max(1, int(3000 / (i + 1))) for i in range(vocab)])
    toks = np.repeat(
        np.array([f"w{i:04d}" for i in range(vocab)], dtype=object), freqs
    )
    rng = np.random.default_rng(7)
    rng.shuffle(toks)
    toks = toks[:n_tokens]
    docs = [
        " ".join(toks[i : i + doc_len]) for i in range(0, len(toks), doc_len)
    ]
    return docs, toks


@pytest.mark.parametrize("denom", [20, 50])
def test_heavy_unigrams_exact_vs_counter(ray_session, denom):
    """With vocab (400) >> MG budget (2*denom-1 counters), per-block
    eviction really happens; the two-pass result must still equal the
    exact GROUP BY ... HAVING answer."""
    import ray.data

    from ner_pytorch_ray.pipelines.sketches import heavy_ngrams

    docs, toks = _zipf_corpus()
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(docs, type=pa.string())})
    ).repartition(8)
    out = heavy_ngrams(ds, text_col="text", n=1, denom=denom).to_pandas()

    counts = collections.Counter(toks.tolist())
    n = len(toks)
    expect = sorted(
        (t, c) for t, c in counts.items() if c * denom > n
    )
    assert expect, "fixture must produce at least one heavy hitter"
    assert len(expect) < len(counts), "fixture must also have light terms"
    assert list(zip(out["term"], out["cnt"])) == expect


def test_heavy_unigrams_partitioning_invariance(ray_session):
    """Same corpus, 1 block vs 16 blocks: identical output (the MG merge
    bound holds for any block layout; the verify pass is exact)."""
    import ray.data

    from ner_pytorch_ray.pipelines.sketches import heavy_ngrams

    docs, _ = _zipf_corpus(n_tokens=8_000)
    t = pa.table({"text": pa.array(docs, type=pa.string())})
    one = heavy_ngrams(
        ray.data.from_arrow(t).repartition(1), "text", n=1, denom=25
    ).to_pandas()
    many = heavy_ngrams(
        ray.data.from_arrow(t).repartition(16), "text", n=1, denom=25
    ).to_pandas()
    assert one.equals(many)


def test_mg_compress_error_bound():
    """Closed-form MG compression: <= k survivors and every estimate
    undercounts by at most n_block/(k+1)."""
    from ner_pytorch_ray.pipelines.sketches import _mg_compress

    rng = np.random.default_rng(3)
    counts = rng.integers(1, 200, size=300)
    terms = np.array([f"t{i}" for i in range(300)], dtype=object)
    n_block = int(counts.sum())
    for k in (5, 17, 64):
        st, sc = _mg_compress(terms.copy(), counts.copy(), k)
        assert len(st) <= k
        true = dict(zip(terms, counts))
        for t, c in zip(st, sc):
            assert c <= true[t]
            assert true[t] - c <= n_block // (k + 1) + 1


def test_kg_edge_lifetimes_matches_sql(ray_session):
    """Temporal KG edges at sf0.001: distinct-(pair, crawl) min/max/count
    must equal the DuckDB recompute of the same pseudo-crawl partition."""
    import importlib.util

    import duckdb

    from ner_pytorch_ray.pipelines.graph_ops import kg_edge_lifetimes

    sf = "/root/testdata/sf0.001"
    df = kg_edge_lifetimes(sf, n_crawls=3).to_pandas().reset_index(drop=True)

    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    odf = con.execute(mod.oracle_sql()["kg_edge_lifetimes"]).df()
    assert df.equals(odf)
    # lifetimes are consistent with the plain edge table: every edge of
    # kg_edge_lifetimes appears with 1 <= n_crawls <= 3 and ordered bounds
    assert ((df["n_crawls"] >= 1) & (df["n_crawls"] <= 3)).all()
    assert (df["first_crawl"] <= df["last_crawl"]).all()


def test_coreness_crafted_graph(ray_session):
    """Known decomposition by construction: a 4-clique (core 3) with a
    pendant chain (core 1) hanging off it, plus a separate triangle
    (core 2). The H-index fixpoint needs several rounds because the chain
    degrees must 'drain' before the clique estimates settle."""
    from ner_pytorch_ray.pipelines.graph_ops import coreness_over_edges

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 10), (10, 11), (11, 12)]
    tri = [(20, 21), (21, 22), (20, 22)]
    pairs = clique + chain + tri
    out = coreness_over_edges(_edges_ds(pairs)).to_pandas()
    got = dict(zip(out["node"], out["core"]))
    expect = {0: 3, 1: 3, 2: 3, 3: 3, 10: 1, 11: 1, 12: 1, 20: 2, 21: 2, 22: 2}
    assert got == expect


def test_coreness_star_hub(ray_session):
    """A star (hub degree 8, leaves degree 1) is all core 1 — degree alone
    would misreport the hub as 8; the H-index fold must pull it down."""
    from ner_pytorch_ray.pipelines.graph_ops import coreness_over_edges

    pairs = [(0, i) for i in range(1, 9)]
    out = coreness_over_edges(_edges_ds(pairs)).to_pandas()
    assert set(out["core"]) == {1}
