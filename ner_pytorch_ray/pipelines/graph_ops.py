"""Distributed graph operators over the duplicate-pair graph.

The containment dedup stage (``pipelines/dedup.py``: prefix/substring
containment, minhash LSH) emits *pairs*; turning pairs into canonical
duplicate CLUSTERS is the classic knowledge-graph merge step — the same
canonicalization the KG build applies to entity surfaces
(``stages/graph.py`` A4, reference ``train.py``-adjacent KG assembly), but
over the document-dup relation instead of surface equality:

- :func:`components_over_edges` / :func:`connected_components` /
  :func:`kg_components` — hash-min label propagation: every node ends
  with the minimum reachable node id (lexicographic for string entity
  ids). Deterministic (min is order-independent), oracle-able with a
  recursive SQL CTE.
- :func:`pagerank_over_edges` / :func:`pagerank` / :func:`kg_pagerank` —
  fixed-iteration (optionally weighted) PageRank with *scaled-integer*
  arithmetic: per-edge contributions are computed with integer floor
  division and summed as int64, so the result is bit-identical under any
  partitioning / summation order, and an unrolled SQL oracle can
  reproduce it exactly.
- :func:`triangles_over_edges` / :func:`kg_triangles` — 2-round wedge
  enumeration + marker-verified closure; explicit max_degree hub guard.
- :func:`link_prediction_over_edges` / :func:`dup_link_prediction` —
  common-neighbor scores over full adjacency with an is_edge flag (the
  KG-completion baseline).
- :func:`node_metrics_over_graph` / :func:`kg_node_metrics` — the
  per-entity dashboard assembled by one keyed collect over kind-tagged
  metric tables; size-routes its derivations below ``SMALL_GRAPH`` edges
  (local solve, bit-identical integer math).

Scale notes (100 TB):

- The dup graph is the OUTPUT of a bucketed candidate stage — orders of
  magnitude smaller than the corpus. Both operators iterate over
  (node, label) / (a, b, deg) tables only; document text never enters the
  loop.
- Each iteration is two bounded exchanges: a keyed collect that co-locates
  a node's label with its out-edges (group size = out-degree, capped
  upstream by ``max_bucket``), then a native groupby-min/sum over the
  emitted messages. No broadcast of the edge set, no driver-side adjacency.
- Iteration state is materialized each round (the small label table, NOT
  the corpus) so lineage does not grow with the iteration count.
- Hash-min converges in O(component diameter) rounds; dup clusters are
  shallow (mirror/quote chains), so ``max_iters`` is a guard, not a budget.
  The monotone label-sum doubles as a convergence test: it strictly
  decreases until the fixpoint, so one cheap aggregate per round detects
  termination without a change-count join.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

SCALE = 10**12  # PageRank fixed-point scale: rank 1.0 == 10**12
SMALL_GRAPH = 100_000  # size-routing threshold for the dashboard's derivations
DAMP_NUM, DAMP_DEN = 850, 1000  # damping 0.85 as an exact ratio


def dup_edges(
    sf_dir: str, m: int = 5, max_bucket: int = 100_000
) -> ray.data.Dataset:
    """Symmetrized, deduplicated edge list (a, b) of the containment dup
    graph: an edge for each ordered pair where one doc's prefix m-gram
    occurs token-aligned in the other (see ``dedup.prefix_containment``)."""
    from ner_pytorch_ray.pipelines.dedup import _containment_candidates
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    pairs = _containment_candidates(sf_dir, m, max_bucket)

    def both_dirs(batch: pa.Table) -> pa.Table:
        inner = batch.column("inner_doc")
        outer = batch.column("outer_doc")
        fwd = pa.table({"a": inner, "b": outer})
        rev = pa.table({"a": outer, "b": inner})
        both = pa.concat_tables([fwd, rev])
        return both.append_column(
            "one", pa.array([1] * len(both), type=pa.int64())
        )

    # distinct via a native groupby-sum on the (a, b) key, then drop count
    dedup = grouped_sum(
        pairs.map_batches(both_dirs, batch_format="pyarrow"),
        keys=["a", "b"],
        sum_cols=["one"],
    )
    return dedup.select_columns(["a", "b"])



def _propagate_min(
    labels: ray.data.Dataset,
    adj: ray.data.Dataset,
    node_type: pa.DataType = pa.int64(),
) -> ray.data.Dataset:
    """One hash-min round: each node's label flows to its out-neighbors;
    every node keeps the min of its own label and all incoming ones.
    The ``labels`` input may carry DUPLICATE node rows (e.g. one
    self-label per out-edge at init) — the group-min collapses them, so
    callers never need a canonicalizing exchange before the first round.

    The label->edges co-location uses the repo's keyed-collect union idiom
    (one row kind carries the label, the other the out-edges; a group is
    one node's state + fan-out), which measured faster than Dataset.join
    for small-row exchanges (see windows.py as-of join notes). The
    trailing grouped-min pipelines into the same execution as the collect
    (a native Arrow groupby, measured ~free) — a deferred-merge variant
    that skipped it traded that for a per-round fingerprint job and
    measured slower."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
        grouped_sum,
    )

    schema = pa.schema([("node", node_type), ("label", node_type)])

    def label_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": batch.column("node"),
                "peer": pa.array([None] * len(batch), type=node_type),
                "label": batch.column("label"),
            }
        )

    def edge_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": batch.column("a").cast(node_type),
                "peer": batch.column("b").cast(node_type),
                "label": pa.array([None] * len(batch), type=node_type),
            }
        )

    unioned = labels.map_batches(label_rows, batch_format="pyarrow").union(
        adj.map_batches(edge_rows, batch_format="pyarrow")
    )
    collected = collect_tuples(
        unioned, ["node"], ["peer", "label"], shuffle_blocks="auto"
    )

    def emit(key, items) -> pa.Table:
        if items is None:
            return schema.empty_table()
        lab = min(l for _, l in items if l is not None)
        nodes = [p for p, _ in items if p is not None]
        nodes.append(key[0])
        return pa.Table.from_pydict(
            {
                "node": pa.array(nodes, type=node_type),
                "label": pa.array([lab] * len(nodes), type=node_type),
            }
        )

    msgs = flat_map_groups(collected, emit, ["node"])
    return grouped_sum(msgs, keys=["node"], sum_cols=[], min_cols=["label"])


def _labels_fingerprint(labels: ray.data.Dataset, node_type: pa.DataType):
    """Order-independent convergence functional over a label table.

    int64 labels: the exact column sum — labels only decrease under
    hash-min, so the sum is strictly monotone and equality PROVES the
    fixpoint. String labels have no sum; instead an unbounded-int sum of
    per-row blake2b-128 digests (a Ray AggregateFn whose state is a
    Python int, so no int64 overflow), order-independent with a ~2^-128
    collision bound; a premature stop would anyway fail the exact oracle
    comparison downstream."""
    if pa.types.is_integer(node_type):
        return labels.sum("label")
    import hashlib

    from ray.data.aggregate import AggregateFn

    def acc_block(state: int, block) -> int:
        s = state
        for v in block.column("label").to_pylist():
            s += int.from_bytes(
                hashlib.blake2b(v.encode(), digest_size=16).digest(), "little"
            )
        return s

    agg = AggregateFn(
        init=lambda k: 0,
        accumulate_block=acc_block,
        merge=lambda a, b: a + b,
        name="digest",
    )
    row = labels.aggregate(agg)
    return row["digest"]


def components_over_edges(
    edges: ray.data.Dataset,
    node_type: pa.DataType = pa.int64(),
    max_iters: int = 50,
    small_graph: int = 0,
) -> ray.data.Dataset:
    """(node, component) over a SYMMETRIC edge table (a, b): hash-min
    label propagation to the minimum reachable node id (lexicographic min
    for string nodes — matching SQL MIN(VARCHAR) on ASCII ids).

    ``small_graph``: size-routing (the repo's embedding-near-dup
    precedent) — an edge table at or below this many rows is solved with
    one local BFS instead of ~diameter shuffle rounds (identical fixpoint:
    min over the connected component either way). Default 0 = always
    distributed, so oracle-gated queries exercise the distributed path."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    adj = edges.materialize()
    if small_graph and adj.count() <= small_graph:
        rows = adj.take_all()
        und = {}
        for r in rows:
            und.setdefault(r["a"], []).append(r["b"])
        comp = {}
        for v in sorted(und):
            if v in comp:
                continue
            stack, seen = [v], {v}
            while stack:
                u = stack.pop()
                for w in und[u]:
                    if w not in seen:
                        seen.add(w)
                        stack.append(w)
            root = min(seen)
            for u in seen:
                comp[u] = root
        ks = sorted(comp)
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "node": pa.array(ks, type=node_type),
                    "component": pa.array(
                        [comp[k] for k in ks], type=node_type
                    ),
                }
            )
        )

    def init_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("a").cast(node_type)
        return pa.Table.from_pydict({"node": a, "label": a})

    # duplicate init labels (one self-label per out-edge) feed straight
    # into round 1, whose group-min collapses them — no up-front
    # canonicalizing exchange
    labels = adj.map_batches(init_rows, batch_format="pyarrow")

    unset = object()
    prev: object = unset
    for _ in range(max_iters):
        labels = _propagate_min(labels, adj, node_type).materialize()
        cur = _labels_fingerprint(labels, node_type)
        if prev is not unset and cur == prev:  # unchanged == fixpoint
            break
        prev = cur

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["node", "component"])

    return labels.map_batches(rename, batch_format="pyarrow")


def connected_components(
    sf_dir: str, m: int = 5, max_bucket: int = 100_000, max_iters: int = 50
) -> ray.data.Dataset:
    """(node, component) for every doc in the containment dup graph;
    ``component`` is the minimum doc_id in the node's connected component
    (the cluster keeper — same keeper rule as ``dedup.exact_dedup``)."""
    return components_over_edges(
        dup_edges(sf_dir, m, max_bucket), max_iters=max_iters
    )


def kg_components(sf_dir: str, max_iters: int = 50) -> ray.data.Dataset:
    """Connected components of the CONSTRUCTED knowledge graph (entity
    co-occurrence edges from kg_edges' pair stage): the entity-cluster
    merge step. component = lexicographically smallest entity id
    reachable. Returns (node:string, component:string)."""
    from ner_pytorch_ray.pipelines.kg import linked_mentions_cached
    from ner_pytorch_ray.stages.graph import edge_partials_merged

    ew = edge_partials_merged(linked_mentions_cached(sf_dir))

    def symmetrize(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"a": batch.column("subj"), "b": batch.column("obj")})
        rev = pa.table({"a": batch.column("obj"), "b": batch.column("subj")})
        return pa.concat_tables([fwd, rev])

    sym = ew.map_batches(symmetrize, batch_format="pyarrow")
    return components_over_edges(
        sym, node_type=pa.string(), max_iters=max_iters
    )


def pagerank_over_edges(
    edges: ray.data.Dataset,
    iters: int = 5,
    scale: int = SCALE,
    node_type: pa.DataType = pa.int64(),
    weight_col: str | None = None,
    small_graph: int = 0,
    teleport: list | None = None,
) -> ray.data.Dataset:
    """(node, rank) after ``iters`` weighted-PageRank rounds over a
    SYMMETRIC edge table (a, b[, weight]), damping 0.85, int64 fixed-point
    ranks (rank 1.0 == scale).

    Exact-integer update (bit-identical under any partitioning):

        r0(v)   = scale // N
        r_k(v)  = (150 * scale) // (1000 * N)
                  + sum over in-edges (u, v) of
                    (850 * r_{k-1}(u) * w(u, v)) // (1000 * sw(u))

    ``teleport``: optional PERSONALIZED PageRank seed list (small by
    contract — a query's seed entities, shipped in task closures, never a
    shuffle side). With seeds, the teleport mass goes only to the seeds
    that exist in the node set (S): r0(v) = scale // |S| for v in S else
    0, and the per-round base term is paid only to seeds. Raises if no
    seed is present.

    where sw(u) = sum of u's out-edge weights (w == 1 without a
    ``weight_col``, making sw the degree). Contributions are computed in
    arbitrary-precision Python and floor-divided before the int64 sum, so
    there is no intermediate overflow and integer sums are
    summation-order independent. Every node of a symmetric graph has
    sw >= 1 — no dangling mass.

    Per iteration: one keyed collect co-locates a node's rank row with its
    out-edges (group size = out-degree), one native groupby-sum folds the
    emitted contributions; only the small (node, rank) state materializes
    per round, so lineage stays flat across iterations."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
        grouped_sum,
    )

    if small_graph:
        em = edges.materialize()
        if em.count() <= small_graph:
            rows = em.take_all()
            ew = [
                (r["a"], r["b"], int(r[weight_col]) if weight_col else 1)
                for r in rows
            ]
            nodes_l = sorted({a for a, _, _ in ew})
            if not nodes_l:
                return ray.data.from_arrow(
                    pa.schema(
                        [("node", node_type), ("rank", pa.int64())]
                    ).empty_table()
                )
            n_l = len(nodes_l)
            sw_l: dict = {}
            for a, _, w in ew:
                sw_l[a] = sw_l.get(a, 0) + w
            if teleport is not None:
                seeds_l = frozenset(teleport) & set(nodes_l)
                if not seeds_l:
                    raise ValueError("no teleport seed present in the graph")
                ns_l = len(seeds_l)
                r_l = {
                    v: (scale // ns_l if v in seeds_l else 0) for v in nodes_l
                }
                base_of = lambda v: (  # noqa: E731
                    (150 * scale) // (1000 * ns_l) if v in seeds_l else 0
                )
            else:
                r_l = {v: scale // n_l for v in nodes_l}
                base_l = (150 * scale) // (1000 * n_l)
                base_of = lambda v: base_l  # noqa: E731
            for _ in range(iters):
                nr = {v: base_of(v) for v in nodes_l}
                for a, b, w in ew:
                    nr[b] += (DAMP_NUM * r_l[a] * w) // (DAMP_DEN * sw_l[a])
                r_l = nr
            return ray.data.from_arrow(
                pa.Table.from_pydict(
                    {
                        "node": pa.array(nodes_l, type=node_type),
                        "rank": pa.array(
                            [r_l[v] for v in nodes_l], type=pa.int64()
                        ),
                    }
                )
            )
        edges = em

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        w = (
            batch.column(weight_col).cast(pa.int64())
            if weight_col
            else pa.array([1] * n, type=pa.int64())
        )
        return pa.Table.from_pydict(
            {
                "node": batch.column("a").cast(node_type),
                "peer": batch.column("b").cast(node_type),
                "w": w,
                "rank": pa.array([None] * n, type=pa.int64()),
            }
        )

    adj = edges.map_batches(edge_rows, batch_format="pyarrow").materialize()

    def node_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": batch.column("node"),
                "one": pa.array([1] * len(batch), type=pa.int64()),
            }
        )

    nodes = grouped_sum(
        adj.map_batches(node_rows, batch_format="pyarrow"),
        keys=["node"],
        sum_cols=["one"],
    ).select_columns(["node"]).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:  # empty graph: empty (node, rank) result, no div/0
        return ray.data.from_arrow(
            pa.schema(
                [("node", node_type), ("rank", pa.int64())]
            ).empty_table()
        )
    if teleport is not None:
        # |S| = seeds actually present; the seed list is small by contract,
        # so membership tests ride in task closures (no shuffle side).
        seed_set = frozenset(teleport)
        n_seeds = nodes.map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "n": pa.array(
                        [sum(1 for v in t.column("node").to_pylist()
                             if v in seed_set)],
                        type=pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("n")
        if not n_seeds:
            raise ValueError("no teleport seed present in the graph")
        base_seed = (150 * scale) // (1000 * n_seeds)
        r0_seed = scale // n_seeds

        def init_ranks(batch: pa.Table) -> pa.Table:
            vals = [
                r0_seed if v in seed_set else 0
                for v in batch.column("node").to_pylist()
            ]
            return pa.Table.from_pydict(
                {
                    "node": batch.column("node"),
                    "rank": pa.array(vals, type=pa.int64()),
                }
            )

        def base_for(node_col: pa.ChunkedArray) -> pa.Array:
            return pa.array(
                [base_seed if v in seed_set else 0
                 for v in node_col.to_pylist()],
                type=pa.int64(),
            )
    else:
        base = (150 * scale) // (1000 * n_nodes)
        r0 = scale // n_nodes

        def init_ranks(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {
                    "node": batch.column("node"),
                    "rank": pa.array([r0] * len(batch), type=pa.int64()),
                }
            )

        def base_for(node_col: pa.ChunkedArray) -> pa.Array:
            return pa.array([base] * len(node_col), type=pa.int64())

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()
    msg_schema = pa.schema([("node", node_type), ("contrib", pa.int64())])

    def rank_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "node": batch.column("node"),
                "peer": pa.array([None] * n, type=node_type),
                "w": pa.array([0] * n, type=pa.int64()),
                "rank": batch.column("rank"),
            }
        )

    def emit_contribs(key, items) -> pa.Table:
        if items is None:
            return msg_schema.empty_table()
        r = next(rk for p, _, rk in items if p is None)
        sw = sum(w for p, w, _ in items if p is not None)
        out_n, out_c = [key[0]], [0]  # keep the node present without in-edges
        for p, w, _ in items:
            if p is not None:
                out_n.append(p)
                out_c.append((DAMP_NUM * r * w) // (DAMP_DEN * sw))
        return pa.Table.from_pydict(
            {
                "node": pa.array(out_n, type=node_type),
                "contrib": pa.array(out_c, type=pa.int64()),
            }
        )

    def add_base(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.Table.from_pydict(
            {
                "node": batch.column("node"),
                "rank": pc.add(
                    batch.column("contrib"), base_for(batch.column("node"))
                ),
            }
        )

    for _ in range(iters):
        unioned = ranks.map_batches(rank_rows, batch_format="pyarrow").union(
            adj
        )
        collected = collect_tuples(
            unioned, ["node"], ["peer", "w", "rank"], shuffle_blocks="auto"
        )
        msgs = flat_map_groups(collected, emit_contribs, ["node"])
        summed = grouped_sum(msgs, keys=["node"], sum_cols=["contrib"])
        ranks = summed.map_batches(
            add_base, batch_format="pyarrow"
        ).materialize()

    return ranks


def pagerank(
    sf_dir: str,
    m: int = 5,
    max_bucket: int = 100_000,
    iters: int = 5,
    scale: int = SCALE,
) -> ray.data.Dataset:
    """Unweighted PageRank over the symmetric containment dup graph (see
    :func:`pagerank_over_edges`; w == 1 so sw == degree)."""
    return pagerank_over_edges(
        dup_edges(sf_dir, m, max_bucket), iters=iters, scale=scale
    )


def kg_pagerank(
    sf_dir: str, iters: int = 3, scale: int = SCALE
) -> ray.data.Dataset:
    """Weighted PageRank over the CONSTRUCTED knowledge graph: nodes are
    linked entity ids, edges the co-occurrence pairs of kg_edges with their
    co-sentence counts as weights (stages/graph.py edge_partials_merged;
    the sort stage is skipped — PageRank does not need ordered input).
    Returns (node:string, rank:int64)."""
    from ner_pytorch_ray.pipelines.kg import linked_mentions_cached
    from ner_pytorch_ray.stages.graph import edge_partials_merged

    ew = edge_partials_merged(linked_mentions_cached(sf_dir))

    def symmetrize(batch: pa.Table) -> pa.Table:
        fwd = pa.table(
            {
                "a": batch.column("subj"),
                "b": batch.column("obj"),
                "w": batch.column("weight"),
            }
        )
        rev = pa.table(
            {
                "a": batch.column("obj"),
                "b": batch.column("subj"),
                "w": batch.column("weight"),
            }
        )
        return pa.concat_tables([fwd, rev])

    sym = ew.map_batches(symmetrize, batch_format="pyarrow")
    return pagerank_over_edges(
        sym, iters=iters, scale=scale, node_type=pa.string(), weight_col="w"
    )



def _wedge_candidates(
    edges: ray.data.Dataset, node_type: pa.DataType, max_degree: int
):
    """Shared scaffold for triangle counting and common-neighbor scoring:
    keyed collect of adjacency by ``a``, per-node neighbor-pair wedge rows
    (y, z, x), plus the null-x marker rows for the edge table itself.
    ``edges`` is consumed by BOTH branches — callers pass it materialized.
    Returns (candidates_ds, marker_fn)."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    adj = collect_tuples(edges, ["a"], ["b"], shuffle_blocks="auto")
    cand_schema = pa.schema(
        [("y", node_type), ("z", node_type), ("x", node_type)]
    )

    def wedges(key, items) -> pa.Table:
        if items is None:
            return cand_schema.empty_table()
        peers = sorted({b for b, in items})
        if len(peers) > max_degree:
            raise ValueError(
                f"node {key[0]!r} degree {len(peers)} exceeds "
                f"max_degree={max_degree}; raise the guard deliberately"
            )
        ys, zs = [], []
        for i, y in enumerate(peers):
            for z in peers[i + 1 :]:
                ys.append(y)
                zs.append(z)
        return pa.Table.from_pydict(
            {
                "y": pa.array(ys, type=node_type),
                "z": pa.array(zs, type=node_type),
                "x": pa.array([key[0]] * len(ys), type=node_type),
            }
        )

    def marker_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "y": batch.column("a").cast(node_type),
                "z": batch.column("b").cast(node_type),
                "x": pa.array([None] * n, type=node_type),
            }
        )

    return flat_map_groups(adj, wedges, ["a"]), marker_rows


def triangles_over_edges(
    edges: ray.data.Dataset,
    node_type: pa.DataType = pa.int64(),
    max_degree: int = 100_000,
    small_graph: int = 0,
) -> ray.data.Dataset:
    """Per-node triangle counts (node, n_triangles) over a UNIQUE ascending
    edge table (a < b). Two bounded exchanges, never all-pairs:

      1. keyed collect by ``a`` -> each node's ascending neighbor list;
         emit a candidate row (y, z, x) per neighbor pair y < z (the wedge
         x-y, x-z closes iff edge (y, z) exists);
      2. keyed collect by (y, z) over candidates UNION the edge rows
         themselves (null-x marker): a group whose marker is present turns
         each candidate x into one triangle x < y < z; emit (x,1) (y,1)
         (z,1) and groupby-sum.

    Wedge volume is sum-over-nodes C(deg+(x), 2) under the id-ascending
    orientation (the same enumeration the SQL oracle uses). ``max_degree``
    is an EXPLICIT guard, not a silent cap: a hub whose ascending adjacency
    exceeds it raises rather than undercounting; raise it (or pre-filter
    hubs) deliberately. Nodes in no triangle are omitted."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
        grouped_sum,
    )

    if small_graph:
        em = edges.materialize()
        if em.count() <= small_graph:
            rows = [(r["a"], r["b"]) for r in em.take_all()]
            und = set(rows)
            asc: dict = {}
            for a, b in rows:
                asc.setdefault(a, []).append(b)
            import collections as _c

            cnt: dict = _c.Counter()
            for x, peers in asc.items():
                ps = sorted(set(peers))
                for i, y in enumerate(ps):
                    for z in ps[i + 1 :]:
                        if (y, z) in und:
                            cnt[x] += 1
                            cnt[y] += 1
                            cnt[z] += 1
            ks = sorted(cnt)
            return ray.data.from_arrow(
                pa.Table.from_pydict(
                    {
                        "node": pa.array(ks, type=node_type),
                        "n_triangles": pa.array(
                            [cnt[k] for k in ks], type=pa.int64()
                        ),
                    }
                )
            )
        edges = em

    edges = edges.materialize()  # consumed by both wedge and marker branches
    cands, marker_rows = _wedge_candidates(edges, node_type, max_degree)

    unioned = cands.union(
        edges.map_batches(marker_rows, batch_format="pyarrow")
    )
    verified = collect_tuples(unioned, ["y", "z"], ["x"], shuffle_blocks="auto")
    count_schema = pa.schema([("node", node_type), ("one", pa.int64())])

    def close(key, items) -> pa.Table:
        if items is None:
            return count_schema.empty_table()
        xs = [x for (x,) in items if x is not None]
        if len(xs) == len(items) or not xs:  # no marker, or no candidates
            return count_schema.empty_table()
        y, z = key
        nodes = []
        for x in xs:
            nodes.extend((x, y, z))
        return pa.Table.from_pydict(
            {
                "node": pa.array(nodes, type=node_type),
                "one": pa.array([1] * len(nodes), type=pa.int64()),
            }
        )

    counted = grouped_sum(
        flat_map_groups(verified, close, ["y", "z"]),
        keys=["node"],
        sum_cols=["one"],
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["node", "n_triangles"])

    return counted.map_batches(rename, batch_format="pyarrow")


def kg_triangles(sf_dir: str) -> ray.data.Dataset:
    """Per-entity triangle participation in the constructed KG's
    co-occurrence graph (kg_edges' ascending pairs): the local clustering
    signal of the entity graph."""
    from ner_pytorch_ray.pipelines.kg import linked_mentions_cached
    from ner_pytorch_ray.stages.graph import edge_partials_merged

    ew = edge_partials_merged(linked_mentions_cached(sf_dir))

    def ascending(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"a": batch.column("subj"), "b": batch.column("obj")}
        )

    return triangles_over_edges(
        ew.map_batches(ascending, batch_format="pyarrow"),
        node_type=pa.string(),
    )


def link_prediction_over_edges(
    edges: ray.data.Dataset,
    node_type: pa.DataType = pa.int64(),
    max_degree: int = 100_000,
    min_common: int = 1,
    only_absent: bool = False,
) -> ray.data.Dataset:
    """Common-neighbor scoring (the classic KG-completion / link-prediction
    baseline): every pair (y, z) sharing >= min_common neighbors, with an
    ``is_edge`` flag; ``only_absent=True`` keeps just the predicted-missing
    pairs. Input is the unique ascending edge table (a < b); output
    (node_a, node_b, n_common, is_edge) with node_a < node_b.

    Unlike :func:`triangles_over_edges`, the wedge enumeration here uses
    the FULL adjacency of the middle node (a common neighbor of (y, z) can
    rank anywhere relative to them), so wedge volume is
    sum-over-nodes C(deg(x), 2) — inherent to common-neighbor counting.
    ``max_degree`` raises on hubs rather than undercounting; stop-word-like
    super-connectors should be pre-filtered deliberately."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
        grouped_sum,
    )

    def sym_rows(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"a": batch.column("a"), "b": batch.column("b")})
        rev = pa.table({"a": batch.column("b"), "b": batch.column("a")})
        return pa.concat_tables([fwd, rev])

    edges = edges.materialize()  # consumed by the sym and marker branches
    sym = edges.map_batches(sym_rows, batch_format="pyarrow")
    cands, marker_rows = _wedge_candidates(sym, node_type, max_degree)

    unioned = cands.union(
        edges.map_batches(marker_rows, batch_format="pyarrow")
    )
    verified = collect_tuples(unioned, ["y", "z"], ["x"], shuffle_blocks="auto")
    out_schema = pa.schema(
        [
            ("node_a", node_type),
            ("node_b", node_type),
            ("n_common", pa.int64()),
            ("is_edge", pa.int64()),
        ]
    )

    def predict(key, items) -> pa.Table:
        if items is None:
            return out_schema.empty_table()
        xs = [x for (x,) in items if x is not None]
        is_edge = len(xs) != len(items)
        if len(xs) < min_common or (only_absent and is_edge):
            return out_schema.empty_table()
        y, z = key
        return pa.Table.from_pydict(
            {
                "node_a": pa.array([y], type=node_type),
                "node_b": pa.array([z], type=node_type),
                "n_common": pa.array([len(xs)], type=pa.int64()),
                "is_edge": pa.array([int(is_edge)], type=pa.int64()),
            }
        )

    return flat_map_groups(verified, predict, ["y", "z"])


def dup_link_prediction(
    sf_dir: str, m: int = 5, max_bucket: int = 100_000, min_common: int = 1
) -> ray.data.Dataset:
    """Common-neighbor scores on the containment dup graph. Pairs with
    is_edge == 0 are the link predictions — transitivity candidates worth
    an exact-verify pass (on this synthetic corpus dup clusters are
    cliques, so all scored pairs are existing edges; chains in the wild
    produce is_edge == 0 rows, covered by the crafted-graph tests)."""

    def ascending(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.less(batch.column("a"), batch.column("b"))
        t = batch.filter(keep)
        return pa.table({"a": t.column("a"), "b": t.column("b")})

    asc = dup_edges(sf_dir, m, max_bucket).map_batches(
        ascending, batch_format="pyarrow"
    )
    return link_prediction_over_edges(asc, min_common=min_common)


def node_metrics_over_graph(
    ew: ray.data.Dataset,
    stats: ray.data.Dataset,
    pagerank_iters: int = 3,
) -> ray.data.Dataset:
    """Assemble the per-entity dashboard from a weighted ascending edge
    table ``ew`` (a < b, w) plus per-entity ``stats`` (node, n_mentions,
    n_surfaces): derives components (symmetrized), weighted PageRank and
    triangles, then joins everything with ONE keyed collect over four
    kind-tagged metric tables (no N-way hash join). Defaults for entities
    outside the graph: component = the entity itself, rank = 0,
    n_triangles = 0. Output (node, n_mentions, n_surfaces, component,
    rank, n_triangles); string-typed nodes."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    ew = ew.materialize()  # consumed by three derivations

    def symmetrize(batch: pa.Table) -> pa.Table:
        fwd = pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "w": batch.column("w"),
            }
        )
        rev = pa.table(
            {
                "a": batch.column("b"),
                "b": batch.column("a"),
                "w": batch.column("w"),
            }
        )
        return pa.concat_tables([fwd, rev])

    def ascending(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch.column("a"), "b": batch.column("b")})

    # the dashboard size-routes its derivations (SMALL_GRAPH edges or
    # fewer solve locally — a 6-node graph should not pay ~10 shuffle
    # rounds); the standalone kg_/graph_ queries keep small_graph=0 so the
    # oracle gate always exercises the distributed path
    sym = ew.map_batches(symmetrize, batch_format="pyarrow")
    comps = components_over_edges(
        sym, node_type=pa.string(), small_graph=SMALL_GRAPH
    )
    ranks = pagerank_over_edges(
        sym,
        iters=pagerank_iters,
        node_type=pa.string(),
        weight_col="w",
        small_graph=SMALL_GRAPH,
    )
    tris = triangles_over_edges(
        ew.map_batches(ascending, batch_format="pyarrow"),
        node_type=pa.string(),
        small_graph=SMALL_GRAPH,
    )

    def tag_kind(kind: int, ival_col: str, sval_col: str | None = None):
        def tag(batch: pa.Table) -> pa.Table:
            n = len(batch)
            return pa.Table.from_pydict(
                {
                    "node": batch.column("node"),
                    "kind": pa.array([kind] * n, type=pa.int64()),
                    "ival": (
                        batch.column(ival_col)
                        if ival_col
                        else pa.array([0] * n, type=pa.int64())
                    ),
                    "ival2": (
                        batch.column("n_surfaces")
                        if kind == 0
                        else pa.array([0] * n, type=pa.int64())
                    ),
                    "sval": (
                        batch.column(sval_col)
                        if sval_col
                        else pa.array([None] * n, type=pa.string())
                    ),
                }
            )

        return tag

    unioned = (
        stats.map_batches(tag_kind(0, "n_mentions"), batch_format="pyarrow")
        .union(
            comps.map_batches(
                tag_kind(1, "", "component"), batch_format="pyarrow"
            )
        )
        .union(ranks.map_batches(tag_kind(2, "rank"), batch_format="pyarrow"))
        .union(
            tris.map_batches(
                tag_kind(3, "n_triangles"), batch_format="pyarrow"
            )
        )
    )
    collected = collect_tuples(
        unioned, ["node"], ["kind", "ival", "ival2", "sval"],
        shuffle_blocks="auto",
    )
    out_schema = pa.schema(
        [
            ("node", pa.string()),
            ("n_mentions", pa.int64()),
            ("n_surfaces", pa.int64()),
            ("component", pa.string()),
            ("rank", pa.int64()),
            ("n_triangles", pa.int64()),
        ]
    )

    def assemble(key, items) -> pa.Table:
        if items is None:
            return out_schema.empty_table()
        node = key[0]
        vals = {
            "n_mentions": 0,
            "n_surfaces": 0,
            "component": node,
            "rank": 0,
            "n_triangles": 0,
        }
        for kind, ival, ival2, sval in items:
            if kind == 0:
                vals["n_mentions"] = ival
                vals["n_surfaces"] = ival2
            elif kind == 1:
                vals["component"] = sval
            elif kind == 2:
                vals["rank"] = ival
            elif kind == 3:
                vals["n_triangles"] = ival
        return pa.Table.from_pydict(
            {
                "node": pa.array([node], type=pa.string()),
                "n_mentions": pa.array([vals["n_mentions"]], type=pa.int64()),
                "n_surfaces": pa.array([vals["n_surfaces"]], type=pa.int64()),
                "component": pa.array([vals["component"]], type=pa.string()),
                "rank": pa.array([vals["rank"]], type=pa.int64()),
                "n_triangles": pa.array(
                    [vals["n_triangles"]], type=pa.int64()
                ),
            }
        )

    return flat_map_groups(collected, assemble, ["node"])


def kg_node_metrics(
    sf_dir: str, pagerank_iters: int = 3
) -> ray.data.Dataset:
    """Entity dashboard over the constructed KG (see
    :func:`node_metrics_over_graph`): all inputs aggregate the SAME cached
    mention scan (kg.linked_mentions_cached)."""
    from ner_pytorch_ray.pipelines.kg import linked_mentions_cached
    from ner_pytorch_ray.stages.graph import (
        edge_partials_merged,
        node_partials_merged,
    )
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    linked = linked_mentions_cached(sf_dir)

    def ew_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch.column("subj"),
                "b": batch.column("obj"),
                "w": batch.column("weight"),
            }
        )

    ew = edge_partials_merged(linked).map_batches(
        ew_rows, batch_format="pyarrow"
    )

    def stat_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "node": batch.column("entity_id"),
                "n_mentions": batch.column("n_mentions"),
                "one": pa.array([1] * n, type=pa.int64()),
            }
        )

    stats = grouped_sum(
        node_partials_merged(linked).map_batches(
            stat_rows, batch_format="pyarrow"
        ),
        keys=["node"],
        sum_cols=["n_mentions", "one"],
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["node", "n_mentions", "n_surfaces"])

    stats = stats.map_batches(rename, batch_format="pyarrow")
    return node_metrics_over_graph(ew, stats, pagerank_iters=pagerank_iters)


def _propagate_hops(
    dists: ray.data.Dataset,
    adj: ray.data.Dataset,
    node_type: pa.DataType = pa.string(),
) -> ray.data.Dataset:
    """One BFS frontier round: every node that already has a distance
    sends dist+1 to its out-neighbors; each node keeps the min of its own
    distance and all incoming offers. Same keyed-collect union idiom as
    ``_propagate_min`` (label row + out-edge rows per group), message
    volume = reached-degree sum per round."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
        grouped_sum,
    )

    schema = pa.schema([("node", node_type), ("label", pa.int64())])

    def label_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": batch.column("node"),
                "peer": pa.array([None] * len(batch), type=node_type),
                "label": batch.column("label"),
            }
        )

    def edge_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": batch.column("a").cast(node_type),
                "peer": batch.column("b").cast(node_type),
                "label": pa.array([None] * len(batch), type=pa.int64()),
            }
        )

    unioned = dists.map_batches(label_rows, batch_format="pyarrow").union(
        adj.map_batches(edge_rows, batch_format="pyarrow")
    )
    collected = collect_tuples(
        unioned, ["node"], ["peer", "label"], shuffle_blocks="auto"
    )

    def emit(key, items) -> pa.Table:
        if items is None:
            return schema.empty_table()
        labs = [l for _, l in items if l is not None]
        if not labs:  # node not reached yet: no frontier to extend
            return schema.empty_table()
        d = min(labs)
        nodes = [p for p, _ in items if p is not None]
        out_d = [d + 1] * len(nodes)
        nodes.append(key[0])
        out_d.append(d)
        return pa.Table.from_pydict(
            {
                "node": pa.array(nodes, type=node_type),
                "label": pa.array(out_d, type=pa.int64()),
            }
        )

    msgs = flat_map_groups(collected, emit, ["node"])
    return grouped_sum(msgs, keys=["node"], sum_cols=[], min_cols=["label"])


def bfs_hops_over_edges(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    node_type: pa.DataType = pa.string(),
    max_iters: int = 16,
) -> ray.data.Dataset:
    """Multi-source BFS hop distance over a SYMMETRIC edge table (a, b):
    (node, dist) for every node reachable from any seed (column ``node``),
    dist = min #hops. One keyed-collect round per frontier level; only the
    small (node, dist) state materializes between rounds.

    Fixpoint proof for the early stop: the reached set only grows and each
    reached node's dist only decreases, so the (count, sum) pair is
    monotone and equality across a round proves the fixpoint."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    adj = edges.materialize()

    def init_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "node": batch.column("node").cast(node_type),
                "label": pa.array([0] * n, type=pa.int64()),
            }
        )

    dists = grouped_sum(
        seeds.map_batches(init_rows, batch_format="pyarrow"),
        keys=["node"],
        sum_cols=[],
        min_cols=["label"],
    ).materialize()

    def fingerprint(d: ray.data.Dataset) -> tuple:
        return (d.count(), d.sum("label") or 0)

    prev = fingerprint(dists)
    for _ in range(max_iters):
        dists = _propagate_hops(dists, adj, node_type).materialize()
        cur = fingerprint(dists)
        if cur == prev:
            break
        prev = cur

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["node", "dist"])

    return dists.map_batches(rename, batch_format="pyarrow").sort("node")


def kg_bfs_hops(
    sf_dir: str, seed_prefix: str = "org:", max_iters: int = 16
) -> ray.data.Dataset:
    """Hop distance from the ORG entities over the constructed KG's
    co-occurrence edges: how far every entity sits from the nearest
    organization mention. Seeds = KG nodes whose entity id starts with
    ``seed_prefix``. Returns (node:string, dist:int64), reachable nodes
    only, sorted by node."""
    import pyarrow.compute as pc

    from ner_pytorch_ray.pipelines.kg import linked_mentions_cached
    from ner_pytorch_ray.stages.graph import edge_partials_merged
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ew = edge_partials_merged(linked_mentions_cached(sf_dir))

    def symmetrize(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"a": batch.column("subj"), "b": batch.column("obj")})
        rev = pa.table({"a": batch.column("obj"), "b": batch.column("subj")})
        return pa.concat_tables([fwd, rev])

    sym = ew.map_batches(symmetrize, batch_format="pyarrow")

    def seed_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("a")
        kept = a.filter(pc.starts_with(a, seed_prefix))
        return pa.table(
            {
                "node": kept,
                "one": pa.array([1] * len(kept), type=pa.int64()),
            }
        )

    seeds = grouped_sum(
        sym.map_batches(seed_rows, batch_format="pyarrow"),
        keys=["node"],
        sum_cols=["one"],
    ).select_columns(["node"])
    return bfs_hops_over_edges(
        sym, seeds, node_type=pa.string(), max_iters=max_iters
    )


def kg_edge_lifetimes(sf_dir: str, n_crawls: int = 3) -> ray.data.Dataset:
    """Temporal KG edge table: for every co-occurrence triple, the first /
    last crawl it was observed in and in how many distinct crawls — the
    recency/stability signal an incremental crawl pipeline attaches to each
    edge. Crawl id derives deterministically from the page (doc_id mod
    ``n_crawls``), standing in for the warc_ts crawl partition of a real
    Common-Crawl layout.

    Scale shape: pair generation is block-local and vectorized (same
    repeat/arange index arithmetic as ``stages/graph._pairs_partial``);
    each block emits DISTINCT (subj, obj, crawl) partials, so the first
    shuffle moves at most |distinct triples| x n_crawls small rows; the
    lifetime fold is one more native grouped aggregate (min / max-via-
    negated-min / sum). Output sorted (subj, obj)."""
    import numpy as np
    import pyarrow.compute as pc

    from ner_pytorch_ray.pipelines.kg import linked_mentions_cached
    from ner_pytorch_ray.stages.graph import CO_OCCURS
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    empty = pa.schema(
        [
            ("subj", pa.string()),
            ("obj", pa.string()),
            ("crawl", pa.int64()),
            ("one", pa.int64()),
        ]
    )

    def pair_crawl_partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["url", "sent_id", "entity_id"]).combine_chunks()
        t = t.filter(pc.not_equal(t.column("entity_id"), ""))
        if t.num_rows == 0:
            return empty.empty_table()
        u_enc = t.column("url").combine_chunks().dictionary_encode()
        e_enc = t.column("entity_id").combine_chunks().dictionary_encode()
        u = u_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        e = e_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        e_dict = np.asarray(e_enc.dictionary.to_pylist(), dtype=object)
        # crawl of each distinct url: the page id digits after "doc-"
        doc_ids = pc.struct_field(
            pc.extract_regex(u_enc.dictionary, r"doc-(?P<d>[0-9]+)"), "d"
        )
        crawl_of_url = np.asarray(
            pc.cast(doc_ids, pa.int64()).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        ) % n_crawls
        s = np.asarray(
            t.column("sent_id").combine_chunks().to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )

        order = np.lexsort((e, s, u))
        u, s, e = u[order], s[order], e[order]
        if len(u) > 1:
            dup = (u[1:] == u[:-1]) & (s[1:] == s[:-1]) & (e[1:] == e[:-1])
            keep = np.r_[True, ~dup]
            u, s, e = u[keep], s[keep], e[keep]

        new = np.ones(len(u), dtype=bool)
        if len(u) > 1:
            new[1:] = (u[1:] != u[:-1]) | (s[1:] != s[:-1])
        starts = np.nonzero(new)[0]
        counts = np.diff(np.r_[starts, len(u)])
        idx = np.arange(len(u))
        pos = idx - np.repeat(starts, counts)
        reps = np.repeat(counts, counts) - 1 - pos
        total = int(reps.sum())
        if total == 0:
            return empty.empty_table()
        left = np.repeat(idx, reps)
        right = (
            np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps) + left + 1
        )

        e_rank = np.empty(len(e_dict), dtype=np.int64)
        e_rank[np.argsort(e_dict)] = np.arange(len(e_dict))
        ex, ey = e[left], e[right]
        swap = e_rank[ex] > e_rank[ey]
        ex, ey = np.where(swap, ey, ex), np.where(swap, ex, ey)
        crawl = crawl_of_url[u[left]]

        key = (ex * np.int64(len(e_dict)) + ey) * n_crawls + crawl
        uniq = np.unique(key)
        kc = uniq % n_crawls
        pair = uniq // n_crawls
        sx = (pair // len(e_dict)).astype(np.int64)
        sy = (pair % len(e_dict)).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "subj": pa.array(e_dict[sx].tolist(), type=pa.string()),
                "obj": pa.array(e_dict[sy].tolist(), type=pa.string()),
                "crawl": pa.array(kc.astype(np.int64), type=pa.int64()),
                "one": pa.array(np.ones(len(uniq), dtype=np.int64)),
            }
        )

    partials = linked_mentions_cached(sf_dir).map_batches(
        pair_crawl_partial, batch_format="pyarrow"
    )
    # global distinct (subj, obj, crawl)
    distinct = grouped_sum(
        partials, ["subj", "obj", "crawl"], sum_cols=["one"]
    )

    def fold_rows(batch: pa.Table) -> pa.Table:
        c = batch.column("crawl")
        return pa.table(
            {
                "subj": batch.column("subj"),
                "obj": batch.column("obj"),
                "crawl": c,
                "neg_crawl": pc.negate(c),
                "one": pa.array([1] * len(batch), type=pa.int64()),
            }
        )

    folded = grouped_sum(
        distinct.map_batches(fold_rows, batch_format="pyarrow"),
        ["subj", "obj"],
        sum_cols=["one"],
        min_cols=["crawl", "neg_crawl"],
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": batch.column("subj"),
                "pred": pa.array([CO_OCCURS] * len(batch), type=pa.string()),
                "obj": batch.column("obj"),
                "first_crawl": batch.column("crawl"),
                "last_crawl": pc.negate(batch.column("neg_crawl")),
                "n_crawls": batch.column("one"),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow").sort(
        ["subj", "obj"]
    )


def _h_index(vals) -> int:
    """Largest h such that at least h of ``vals`` are >= h."""
    vs = sorted(vals, reverse=True)
    h = 0
    for i, v in enumerate(vs, start=1):
        if v >= i:
            h = i
        else:
            break
    return h


def coreness_over_edges(
    edges: ray.data.Dataset,
    node_type: pa.DataType = pa.int64(),
    max_iters: int = 100,
) -> ray.data.Dataset:
    """k-core decomposition over a SYMMETRIC edge table (a, b):
    (node, core) where core = the largest k such that the node survives in
    the k-core (every member of a k-core has >= k neighbors inside it).

    Distributed H-index fixpoint (Montresor, De Pellegrini & Miorandi 2011,
    "Distributed k-Core Decomposition"): initialize every estimate at the
    node's degree; each round set est_v = min(est_v, H({est_u : u in
    N(v)})) where H is the Hirsch index of the neighbor estimates. The
    update is monotone non-increasing and converges exactly to the
    coreness. Estimates only decrease over a fixed node set, so the label
    sum is strictly monotone and equality across a round PROVES the
    fixpoint (same convergence functional as hash-min components).

    Per round: one keyed collect co-locates a node's estimate with its
    out-edges and fans the estimate out (message volume = edge count), a
    second keyed collect gathers each node's incoming estimates for the
    H-index fold (group size = degree — bounded upstream by the pair
    stage's ``max_bucket`` hub guard). Only the small (node, est) state
    materializes between rounds."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
        grouped_sum,
    )

    adj = edges.materialize()

    # init: est = degree (native grouped count over out-edges)
    def one_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("a").cast(node_type),
                "one": pa.array([1] * len(batch), type=pa.int64()),
            }
        )

    ests = (
        grouped_sum(
            adj.map_batches(one_rows, batch_format="pyarrow"),
            keys=["node"],
            sum_cols=["one"],
        )
        .map_batches(
            lambda b: b.rename_columns(["node", "label"]),
            batch_format="pyarrow",
        )
        .materialize()
    )

    msg_schema = pa.schema(
        [("node", node_type), ("label", pa.int64()), ("own", pa.int64())]
    )
    out_schema = pa.schema([("node", node_type), ("label", pa.int64())])

    def label_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": batch.column("node"),
                "peer": pa.array([None] * len(batch), type=node_type),
                "label": batch.column("label"),
            }
        )

    def edge_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": batch.column("a").cast(node_type),
                "peer": batch.column("b").cast(node_type),
                "label": pa.array([None] * len(batch), type=pa.int64()),
            }
        )

    def fanout(key, items) -> pa.Table:
        if items is None:
            return msg_schema.empty_table()
        own = min(l for _, l in items if l is not None)
        peers = [p for p, _ in items if p is not None]
        nodes = peers + [key[0]]
        labels = [own] * len(peers) + [own]
        owns = [0] * len(peers) + [1]
        return pa.Table.from_pydict(
            {
                "node": pa.array(nodes, type=node_type),
                "label": pa.array(labels, type=pa.int64()),
                "own": pa.array(owns, type=pa.int64()),
            }
        )

    def fold(key, items) -> pa.Table:
        if items is None:
            return out_schema.empty_table()
        own = min(l for l, s in items if s == 1)
        incoming = [l for l, s in items if s == 0]
        new = min(own, _h_index(incoming))
        return pa.Table.from_pydict(
            {
                "node": pa.array([key[0]], type=node_type),
                "label": pa.array([new], type=pa.int64()),
            }
        )

    prev = ests.sum("label")
    for _ in range(max_iters):
        unioned = ests.map_batches(
            label_rows, batch_format="pyarrow"
        ).union(adj.map_batches(edge_rows, batch_format="pyarrow"))
        collected = collect_tuples(
            unioned, ["node"], ["peer", "label"], shuffle_blocks="auto"
        )
        msgs = flat_map_groups(collected, fanout, ["node"])
        gathered = collect_tuples(
            msgs, ["node"], ["label", "own"], shuffle_blocks="auto"
        )
        ests = flat_map_groups(gathered, fold, ["node"]).materialize()
        cur = ests.sum("label")
        if cur == prev:  # estimates only decrease: equal sum == fixpoint
            break
        prev = cur

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["node", "core"])

    return ests.map_batches(rename, batch_format="pyarrow").sort("node")


def graph_coreness(
    sf_dir: str, m: int = 5, max_bucket: int = 100_000, max_iters: int = 100
) -> ray.data.Dataset:
    """Coreness of every doc in the containment dup graph — the density
    layer a curation pass uses to separate tight mirror cliques (high
    core) from incidental chains (core 1). Returns (node:int64,
    core:int64), sorted."""
    return coreness_over_edges(
        dup_edges(sf_dir, m, max_bucket), max_iters=max_iters
    )


def ra_link_prediction_over_edges(
    edges: ray.data.Dataset,
    node_type: pa.DataType = pa.int64(),
    max_degree: int = 100_000,
    min_common: int = 1,
    ra_scale: int = 1_000_000_000,
) -> ray.data.Dataset:
    """Resource-Allocation link prediction (Zhou, Lü & Zhang 2009,
    "Predicting missing links via local information"): score every pair
    sharing >= ``min_common`` neighbors by
    ``sum over common neighbors z of 1/deg(z)`` — the degree-discounted
    refinement of plain common-neighbor counting (a stop-word-like hub
    contributes almost nothing; a rare shared neighbor is strong
    evidence). RA is a sum of RATIONALS, so unlike Adamic-Adar's
    ``1/ln(deg)`` it stays exact in scaled integers:
    ``ra_score_i = sum of ra_scale // deg(z)`` (int64, bit-identical
    under any partitioning, floor-division-reproducible in SQL).

    Same two-exchange shape as :func:`link_prediction_over_edges`, with
    one structural bonus: the wedge group IS the middle node's full
    adjacency, so ``deg(z)`` is known in-place and the per-wedge weight
    ships with the candidate row — no separate degree join. Input is the
    unique ascending edge table (a < b); output
    (node_a, node_b, n_common, ra_score_i, is_edge) with node_a < node_b.
    """
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    def sym_rows(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"a": batch.column("a"), "b": batch.column("b")})
        rev = pa.table({"a": batch.column("b"), "b": batch.column("a")})
        return pa.concat_tables([fwd, rev])

    edges = edges.materialize()  # consumed by wedge and marker branches
    sym = edges.map_batches(sym_rows, batch_format="pyarrow")
    adj = collect_tuples(sym, ["a"], ["b"], shuffle_blocks="auto")
    cand_schema = pa.schema(
        [("y", node_type), ("z", node_type), ("w", pa.int64())]
    )

    def wedges(key, items) -> pa.Table:
        if items is None:
            return cand_schema.empty_table()
        peers = sorted({b for b, in items})
        if len(peers) > max_degree:
            raise ValueError(
                f"node {key[0]!r} degree {len(peers)} exceeds "
                f"max_degree={max_degree}; raise the guard deliberately"
            )
        w = ra_scale // len(peers)
        ys, zs = [], []
        for i, y in enumerate(peers):
            for z in peers[i + 1 :]:
                ys.append(y)
                zs.append(z)
        return pa.Table.from_pydict(
            {
                "y": pa.array(ys, type=node_type),
                "z": pa.array(zs, type=node_type),
                "w": pa.array([w] * len(ys), type=pa.int64()),
            }
        )

    def marker_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "y": batch.column("a").cast(node_type),
                "z": batch.column("b").cast(node_type),
                "w": pa.array([None] * n, type=pa.int64()),
            }
        )

    cands = flat_map_groups(adj, wedges, ["a"])
    unioned = cands.union(
        edges.map_batches(marker_rows, batch_format="pyarrow")
    )
    verified = collect_tuples(
        unioned, ["y", "z"], ["w"], shuffle_blocks="auto"
    )
    out_schema = pa.schema(
        [
            ("node_a", node_type),
            ("node_b", node_type),
            ("n_common", pa.int64()),
            ("ra_score_i", pa.int64()),
            ("is_edge", pa.int64()),
        ]
    )

    def predict(key, items) -> pa.Table:
        if items is None:
            return out_schema.empty_table()
        ws = [w for (w,) in items if w is not None]
        is_edge = len(ws) != len(items)
        if len(ws) < min_common:
            return out_schema.empty_table()
        y, z = key
        return pa.Table.from_pydict(
            {
                "node_a": pa.array([y], type=node_type),
                "node_b": pa.array([z], type=node_type),
                "n_common": pa.array([len(ws)], type=pa.int64()),
                "ra_score_i": pa.array([sum(ws)], type=pa.int64()),
                "is_edge": pa.array([int(is_edge)], type=pa.int64()),
            }
        )

    return flat_map_groups(verified, predict, ["y", "z"])


def kg_link_ra(sf_dir: str) -> ray.data.Dataset:
    """Resource-Allocation link scores over the constructed KG's
    co-occurrence graph (kg_edges' ascending pairs), sorted by
    (node_a, node_b)."""
    from ner_pytorch_ray.pipelines.kg import linked_mentions_cached
    from ner_pytorch_ray.stages.graph import edge_partials_merged

    ew = edge_partials_merged(linked_mentions_cached(sf_dir))

    def ascending(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"a": batch.column("subj"), "b": batch.column("obj")}
        )

    return ra_link_prediction_over_edges(
        ew.map_batches(ascending, batch_format="pyarrow"),
        node_type=pa.string(),
    ).sort(["node_a", "node_b"])


def hits_over_edges(
    edges: ray.data.Dataset,
    iters: int = 2,
    scale: int = 10**9,
    node_type: pa.DataType = pa.int64(),
    weight_col: str | None = None,
) -> ray.data.Dataset:
    """HITS hubs & authorities (Kleinberg 1999) over a DIRECTED weighted
    edge table (a, b[, weight]) in exact scaled integers: per iteration

        a_raw(v) = sum over in-edges  (u, v) of h(u) * w(u, v)
        a(v)     = a_raw(v) * scale // sum(a_raw)      (L1 normalize)
        h_raw(u) = sum over out-edges (u, v) of a(v) * w(u, v)
        h(u)     = h_raw(u) * scale // sum(h_raw)

    The raw sums stay in int64 (bounded by scale * total_weight — shrink
    ``scale`` if total edge weight nears 1e9); the normalization product
    ``raw * scale`` can exceed int64, so it runs in arbitrary-precision
    Python per node row (O(V) map, no shuffle) — the SQL oracle mirrors
    it with HUGEINT floor division. Every sum is integer, so the result
    is bit-identical under any partitioning.

    Per half-iteration: one keyed collect co-locates a node's score row
    with its out-edges (fwd for the authority step, reversed for the hub
    step), one native groupby-sum folds contributions, one O(V) aggregate
    reads the L1 mass. Returns (node, hub_i, auth_i) for every node."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
        grouped_sum,
    )

    def dir_rows(src: str, dst: str):
        def rows(batch: pa.Table) -> pa.Table:
            n = len(batch)
            w = (
                batch.column(weight_col).cast(pa.int64())
                if weight_col
                else pa.array([1] * n, type=pa.int64())
            )
            return pa.Table.from_pydict(
                {
                    "node": batch.column(src).cast(node_type),
                    "peer": batch.column(dst).cast(node_type),
                    "w": w,
                    "score": pa.array([None] * n, type=pa.int64()),
                }
            )

        return rows

    fwd = edges.map_batches(
        dir_rows("a", "b"), batch_format="pyarrow"
    ).materialize()
    rev = edges.map_batches(
        dir_rows("b", "a"), batch_format="pyarrow"
    ).materialize()

    def node_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": pa.chunked_array(
                    [
                        *batch.column("node").chunks,
                        *batch.column("peer").chunks,
                    ]
                ),
                "one": pa.array([1] * (2 * len(batch)), type=pa.int64()),
            }
        )

    nodes = (
        grouped_sum(
            fwd.map_batches(node_rows, batch_format="pyarrow"),
            keys=["node"],
            sum_cols=["one"],
        )
        .select_columns(["node"])
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.schema(
                [
                    ("node", node_type),
                    ("hub_i", pa.int64()),
                    ("auth_i", pa.int64()),
                ]
            ).empty_table()
        )
    h0 = scale // n_nodes

    def init_scores(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": batch.column("node"),
                "score": pa.array([h0] * len(batch), type=pa.int64()),
            }
        )

    msg_schema = pa.schema([("node", node_type), ("raw", pa.int64())])

    def score_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "node": batch.column("node"),
                "peer": pa.array([None] * n, type=node_type),
                "w": pa.array([0] * n, type=pa.int64()),
                "score": batch.column("score"),
            }
        )

    def emit(key, items) -> pa.Table:
        if items is None:
            return msg_schema.empty_table()
        # a node may have a score row but no out-edges in this direction
        s = next((sc for p, _, sc in items if p is None), 0) or 0
        out_n, out_r = [key[0]], [0]  # keep every node present
        for p, w, _ in items:
            if p is not None:
                out_n.append(p)
                out_r.append(s * w)
        return pa.Table.from_pydict(
            {
                "node": pa.array(out_n, type=node_type),
                "raw": pa.array(out_r, type=pa.int64()),
            }
        )

    def half_step(scores: ray.data.Dataset, adj) -> ray.data.Dataset:
        unioned = scores.map_batches(
            score_rows, batch_format="pyarrow"
        ).union(adj)
        collected = collect_tuples(
            unioned, ["node"], ["peer", "w", "score"], shuffle_blocks="auto"
        )
        raw = grouped_sum(
            flat_map_groups(collected, emit, ["node"]),
            keys=["node"],
            sum_cols=["raw"],
        ).materialize()
        mass = int(raw.sum("raw") or 0)

        def normalize(batch: pa.Table) -> pa.Table:
            vals = [
                (int(r) * scale) // mass if mass else 0
                for r in batch.column("raw").to_pylist()
            ]
            return pa.Table.from_pydict(
                {
                    "node": batch.column("node"),
                    "score": pa.array(vals, type=pa.int64()),
                }
            )

        return raw.map_batches(normalize, batch_format="pyarrow")

    h = nodes.map_batches(init_scores, batch_format="pyarrow").materialize()
    a = None
    for _ in range(iters):
        a = half_step(h, fwd).materialize()  # authorities from hubs
        h = half_step(a, rev).materialize()  # hubs from authorities

    def h_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "node": batch.column("node"),
                "hub_i": batch.column("score"),
                "auth_i": pa.array([0] * n, type=pa.int64()),
            }
        )

    def a_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "node": batch.column("node"),
                "hub_i": pa.array([0] * n, type=pa.int64()),
                "auth_i": batch.column("score"),
            }
        )

    merged = h.map_batches(h_rows, batch_format="pyarrow").union(
        a.map_batches(a_rows, batch_format="pyarrow")
    )
    return grouped_sum(
        merged, keys=["node"], sum_cols=["hub_i", "auth_i"]
    )


def kg_hits(sf_dir: str, iters: int = 2) -> ray.data.Dataset:
    """HITS over the constructed KG's directed co-occurrence edges
    (kg_edges' ascending (subj, obj) pairs, weights summed across
    predicates): (entity, hub_i, auth_i) sorted by entity."""
    from ner_pytorch_ray.pipelines.kg import linked_mentions_cached
    from ner_pytorch_ray.stages.graph import edge_partials_merged
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ew = edge_partials_merged(linked_mentions_cached(sf_dir))

    def ab(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch.column("subj"),
                "b": batch.column("obj"),
                "weight": batch.column("weight"),
            }
        )

    ed = grouped_sum(
        ew.map_batches(ab, batch_format="pyarrow"),
        keys=["a", "b"],
        sum_cols=["weight"],
    )
    out = hits_over_edges(
        ed, iters=iters, node_type=pa.string(), weight_col="weight"
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["entity", "hub_i", "auth_i"])

    return out.map_batches(rename, batch_format="pyarrow").sort("entity")


def _propagate_dists(
    dists: ray.data.Dataset,
    adj: ray.data.Dataset,
    node_type: pa.DataType = pa.string(),
) -> ray.data.Dataset:
    """One Bellman-Ford relaxation round: every node that already has a
    tentative distance sends dist+cost along each out-edge; each node
    keeps the min of its own distance and all incoming offers. Same
    keyed-collect union idiom as ``_propagate_hops`` but the edge rows
    carry a per-edge integer ``cost`` instead of the implicit +1."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
        grouped_sum,
    )

    schema = pa.schema([("node", node_type), ("label", pa.int64())])

    def label_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "node": batch.column("node"),
                "peer": pa.array([None] * n, type=node_type),
                "cost": pa.array([None] * n, type=pa.int64()),
                "label": batch.column("label"),
            }
        )

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "node": batch.column("a").cast(node_type),
                "peer": batch.column("b").cast(node_type),
                "cost": batch.column("cost").cast(pa.int64()),
                "label": pa.array([None] * n, type=pa.int64()),
            }
        )

    unioned = dists.map_batches(label_rows, batch_format="pyarrow").union(
        adj.map_batches(edge_rows, batch_format="pyarrow")
    )
    collected = collect_tuples(
        unioned, ["node"], ["peer", "cost", "label"], shuffle_blocks="auto"
    )

    def emit(key, items) -> pa.Table:
        if items is None:
            return schema.empty_table()
        labs = [l for _, _, l in items if l is not None]
        if not labs:  # node not reached yet: nothing to relax
            return schema.empty_table()
        d = min(labs)
        nodes = [p for p, _, _ in items if p is not None]
        out_d = [d + c for p, c, _ in items if p is not None]
        nodes.append(key[0])
        out_d.append(d)
        return pa.Table.from_pydict(
            {
                "node": pa.array(nodes, type=node_type),
                "label": pa.array(out_d, type=pa.int64()),
            }
        )

    msgs = flat_map_groups(collected, emit, ["node"])
    return grouped_sum(msgs, keys=["node"], sum_cols=[], min_cols=["label"])


def sssp_over_edges(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    node_type: pa.DataType = pa.string(),
    max_iters: int = 64,
) -> ray.data.Dataset:
    """Multi-source weighted single-source-shortest-paths over a SYMMETRIC
    edge table (a, b, cost) with POSITIVE integer costs: (node, dist) for
    every node reachable from any seed (column ``node``), dist = min total
    cost. Distributed Bellman-Ford: one keyed-collect relaxation round per
    iteration; only the small (node, dist) state materializes between
    rounds, message volume = reached-degree sum.

    Convergence: with positive costs a node's tentative distance only
    decreases and the reached set only grows, so the (count, sum)
    fingerprint is monotone and equality across a round proves the exact
    fixpoint — the early stop returns TRUE shortest distances, not a
    truncation. ``max_iters`` bounds the optimal path's HOP length
    (Bellman-Ford needs one round per hop of the longest optimal path).

    Scale note: group size per node = degree + 1 (same contract as
    ``bfs_hops_over_edges``); cap hub degree upstream if the graph has
    super-nodes. Rounds move only (node, dist) rows — the corpus never
    enters the loop."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    adj = edges.materialize()

    def init_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "node": batch.column("node").cast(node_type),
                "label": pa.array([0] * n, type=pa.int64()),
            }
        )

    dists = grouped_sum(
        seeds.map_batches(init_rows, batch_format="pyarrow"),
        keys=["node"],
        sum_cols=[],
        min_cols=["label"],
    ).materialize()

    def fingerprint(d: ray.data.Dataset) -> tuple:
        return (d.count(), d.sum("label") or 0)

    prev = fingerprint(dists)
    for _ in range(max_iters):
        dists = _propagate_dists(dists, adj, node_type).materialize()
        cur = fingerprint(dists)
        if cur == prev:
            break
        prev = cur

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["node", "dist"])

    return dists.map_batches(rename, batch_format="pyarrow").sort("node")


def kg_sssp(
    sf_dir: str, seed_prefix: str = "org:", max_iters: int = 64
) -> ray.data.Dataset:
    """Weighted shortest path from the ORG entities over the constructed
    KG's co-occurrence graph: co-occurrence count discounts the hop cost
    (``cost = 4 - min(weight, 3)`` ∈ {1,2,3} — frequently co-mentioned
    entities are "close"), so the metric differs from plain BFS hops
    wherever a 2-hop strong path beats a 1-hop rare edge. Returns
    (node:string, dist:int64), reachable nodes only, sorted by node.

    Reference tie-in: the KG assembly this walks is the distributed
    re-expression of the reference's mention extraction
    (``word_rep.py:118-141`` span semantics feed ``stages/mentions.py``);
    the shortest-path layer itself is new engine surface (SURVEY §2
    graph-analytics family)."""
    import pyarrow.compute as pc

    from ner_pytorch_ray.pipelines.kg import linked_mentions_cached
    from ner_pytorch_ray.stages.graph import edge_partials_merged
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ew = edge_partials_merged(linked_mentions_cached(sf_dir))

    def sym_cost(batch: pa.Table) -> pa.Table:
        w = batch.column("weight").cast(pa.int64())
        cost = pc.subtract(
            pa.scalar(4, type=pa.int64()),
            pc.min_element_wise(w, pa.scalar(3, type=pa.int64())),
        )
        fwd = pa.table(
            {"a": batch.column("subj"), "b": batch.column("obj"), "cost": cost}
        )
        rev = pa.table(
            {"a": batch.column("obj"), "b": batch.column("subj"), "cost": cost}
        )
        return pa.concat_tables([fwd, rev])

    sym = ew.map_batches(sym_cost, batch_format="pyarrow")

    def seed_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("a")
        kept = a.filter(pc.starts_with(a, seed_prefix))
        return pa.table(
            {
                "node": kept,
                "one": pa.array([1] * len(kept), type=pa.int64()),
            }
        )

    seeds = grouped_sum(
        sym.map_batches(seed_rows, batch_format="pyarrow"),
        keys=["node"],
        sum_cols=["one"],
    ).select_columns(["node"])
    return sssp_over_edges(
        sym, seeds, node_type=pa.string(), max_iters=max_iters
    )


def jaccard_link_scores_over_edges(
    edges: ray.data.Dataset,
    node_type: pa.DataType = pa.int64(),
    max_degree: int = 100_000,
    min_common: int = 1,
) -> ray.data.Dataset:
    """Neighborhood-Jaccard node similarity (the set-overlap cousin of
    common-neighbor / RA link prediction): for every pair sharing
    >= ``min_common`` neighbors, ``|N(y) ∩ N(z)| / |N(y) ∪ N(z)|`` in
    exact integer ppm — ``jaccard_ppm = 1e6 * n_common //
    (deg_y + deg_z - n_common)``. Output (node_a, node_b, n_common,
    deg_a, deg_b, jaccard_ppm, is_edge), node_a < node_b.

    Shape: the candidate pairs come from
    :func:`link_prediction_over_edges` (two keyed exchanges, wedge
    volume = sum C(deg, 2), hub guard raises); the endpoint degrees then
    attach via TWO annotate exchanges — candidate rows re-key by one
    endpoint at a time and union with the tiny (node, deg) table, one
    keyed collect each (group size = candidates incident to that node
    + 1 degree row, bounded by the same wedge volume). No driver-side
    joins, no broadcast of the degree table — it can be vocabulary-sized
    on a web-scale graph."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
        grouped_sum,
    )

    edges = edges.materialize()
    cands = link_prediction_over_edges(
        edges,
        node_type=node_type,
        max_degree=max_degree,
        min_common=min_common,
    )

    def sym_ones(batch: pa.Table) -> pa.Table:
        ab = pa.concat_tables(
            [
                pa.table({"node": batch.column("a").cast(node_type)}),
                pa.table({"node": batch.column("b").cast(node_type)}),
            ]
        )
        return ab.append_column(
            "deg", pa.array([1] * len(ab), type=pa.int64())
        )

    degrees = grouped_sum(
        edges.map_batches(sym_ones, batch_format="pyarrow"),
        keys=["node"],
        sum_cols=["deg"],
    ).materialize()

    def _annotate(cand_rows: ray.data.Dataset, key_col: str, out_deg: str,
                  carry: list[tuple[str, pa.DataType]]) -> ray.data.Dataset:
        """Union-tag fold: cand rows keyed by ``key_col`` + degree rows,
        one keyed collect; each cand row re-emits with ``out_deg``
        filled from the group's single degree row."""
        carry_names = [c for c, _ in carry]

        def cand_tagged(batch: pa.Table) -> pa.Table:
            cols = {"node": batch.column(key_col).cast(node_type)}
            for c, t in carry:
                cols[c] = batch.column(c).cast(t)
            cols["deg"] = pa.array([None] * len(batch), type=pa.int64())
            return pa.Table.from_pydict(cols)

        def deg_tagged(batch: pa.Table) -> pa.Table:
            cols = {"node": batch.column("node")}
            for c, t in carry:
                cols[c] = pa.array([None] * len(batch), type=t)
            cols["deg"] = batch.column("deg")
            return pa.Table.from_pydict(cols)

        unioned = cand_rows.map_batches(
            cand_tagged, batch_format="pyarrow"
        ).union(degrees.map_batches(deg_tagged, batch_format="pyarrow"))
        grouped = collect_tuples(
            unioned, ["node"], carry_names + ["deg"],
            shuffle_blocks="auto",
        )
        out_fields = (
            [("node", node_type)]
            + carry
            + [(out_deg, pa.int64())]
        )
        out_schema = pa.schema(out_fields)

        def emit(key, items) -> pa.Table:
            if items is None:
                return out_schema.empty_table()
            deg = max(
                (it[-1] for it in items if it[-1] is not None), default=None
            )
            rows = [it for it in items if it[-1] is None]
            if deg is None or not rows:
                return out_schema.empty_table()
            cols = {"node": pa.array([key[0]] * len(rows), type=node_type)}
            for j, (c, t) in enumerate(carry):
                cols[c] = pa.array([r[j] for r in rows], type=t)
            cols[out_deg] = pa.array([deg] * len(rows), type=pa.int64())
            return pa.Table.from_pydict(cols)

        return flat_map_groups(grouped, emit, ["node"])

    # pass 1: key by node_a, fill deg_a
    step1 = _annotate(
        cands,
        "node_a",
        "deg_a",
        [
            ("node_b", node_type),
            ("n_common", pa.int64()),
            ("is_edge", pa.int64()),
        ],
    )

    def rekey(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node_b": batch.column("node_b"),
                "node_a": batch.column("node"),
                "n_common": batch.column("n_common"),
                "is_edge": batch.column("is_edge"),
                "deg_a": batch.column("deg_a"),
            }
        )

    step2 = _annotate(
        step1.map_batches(rekey, batch_format="pyarrow"),
        "node_b",
        "deg_b",
        [
            ("node_a", node_type),
            ("n_common", pa.int64()),
            ("is_edge", pa.int64()),
            ("deg_a", pa.int64()),
        ],
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nc = batch.column("n_common")
        da = batch.column("deg_a")
        db = batch.column("deg_b")
        union = pc.subtract(pc.add(da, db), nc)
        jac = pc.divide(
            pc.multiply(pa.scalar(1_000_000, type=pa.int64()), nc), union
        )
        return pa.table(
            {
                "node_a": batch.column("node_a"),
                "node_b": batch.column("node"),
                "n_common": nc,
                "deg_a": da,
                "deg_b": db,
                "jaccard_ppm": jac,
                "is_edge": batch.column("is_edge"),
            }
        )

    return step2.map_batches(finish, batch_format="pyarrow")


def kg_node_jaccard(sf_dir: str) -> ray.data.Dataset:
    """Neighborhood-Jaccard similarity over the constructed KG's
    co-occurrence graph (kg_edges' ascending pairs), sorted by
    (node_a, node_b) — the entity-similarity signal the ER/linking
    family consumes (two entities whose co-mention neighborhoods overlap
    heavily are candidate aliases)."""
    from ner_pytorch_ray.pipelines.kg import linked_mentions_cached
    from ner_pytorch_ray.stages.graph import edge_partials_merged

    ew = edge_partials_merged(linked_mentions_cached(sf_dir))

    def ascending(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"a": batch.column("subj"), "b": batch.column("obj")}
        )

    return jaccard_link_scores_over_edges(
        ew.map_batches(ascending, batch_format="pyarrow"),
        node_type=pa.string(),
    ).sort(["node_a", "node_b"])


def katz_over_edges(
    edges: ray.data.Dataset,
    iters: int = 3,
    beta_den: int = 4,
    scale: int = 1_000_000,
    node_type: pa.DataType = pa.int64(),
) -> ray.data.Dataset:
    """Katz centrality (Katz 1953) over a SYMMETRIC edge table (a, b),
    truncated at ``iters`` hops, in exact integers: each node starts a
    unit of mass (``scale``), each round every node forwards
    ``cur // beta_den`` along each out-edge (the attenuation β = 1/beta_den
    applied as a PER-EDGE floor — summation-order independent, hence
    bit-identical under any partitioning), and katz_i(v) is the sum of
    the mass arriving over all rounds:

        c_0(u)  = scale
        c_t(v)  = sum over in-edges (u, v) of  c_{t-1}(u) // beta_den
        katz_i  = c_1 + ... + c_iters

    Distributed shape = :func:`pagerank_over_edges`: per round ONE keyed
    collect co-locates a node's (cur, acc) state row with its out-edges
    (group size = degree + 1), one grouped sum folds contributions and
    the carried accumulator; only (node, cur, acc) rows materialize
    between rounds. Output (node, katz_i), every node present, sorted.

    Scale note: mass grows by ~deg/beta_den per round — with the default
    3 rounds and int64 state, hub degrees up to ~1e5 stay far from
    overflow at scale=1e6; raise beta_den (stronger attenuation) before
    raising iters on hubby graphs."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
        grouped_sum,
    )

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "node": batch.column("a").cast(node_type),
                "peer": batch.column("b").cast(node_type),
                "cur": pa.array([None] * n, type=pa.int64()),
                "acc": pa.array([None] * n, type=pa.int64()),
            }
        )

    adj = edges.map_batches(edge_rows, batch_format="pyarrow").materialize()

    def node_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": batch.column("node"),
                "cur": pa.array([scale] * len(batch), type=pa.int64()),
                "acc": pa.array([0] * len(batch), type=pa.int64()),
            }
        )

    def dedup_nodes(batch: pa.Table) -> pa.Table:
        t = pa.table({"node": batch.column("node")})
        return t.group_by(["node"]).aggregate([([], "count_all")]).select(
            ["node"]
        )

    state = grouped_sum(
        adj.map_batches(dedup_nodes, batch_format="pyarrow").map_batches(
            lambda b: b.append_column(
                "one", pa.array([1] * len(b), type=pa.int64())
            ),
            batch_format="pyarrow",
        ),
        keys=["node"],
        sum_cols=["one"],
    ).map_batches(node_rows, batch_format="pyarrow").materialize()

    msg_schema = pa.schema(
        [("node", node_type), ("cur", pa.int64()), ("acc", pa.int64())]
    )

    def emit(key, items) -> pa.Table:
        if items is None:
            return msg_schema.empty_table()
        st = [(c, a) for _, c, a in items if c is not None]
        if not st:  # edges of a node outside the state (impossible by
            return msg_schema.empty_table()  # construction) — drop
        cur, acc = st[0]
        peers = [p for p, c, _ in items if c is None]
        contrib = cur // beta_den
        nodes = peers + [key[0]]
        curs = [contrib] * len(peers) + [0]
        accs = [0] * len(peers) + [acc]
        return pa.Table.from_pydict(
            {
                "node": pa.array(nodes, type=node_type),
                "cur": pa.array(curs, type=pa.int64()),
                "acc": pa.array(accs, type=pa.int64()),
            }
        )

    def with_peer(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": batch.column("node"),
                "peer": pa.array([None] * len(batch), type=node_type),
                "cur": batch.column("cur"),
                "acc": batch.column("acc"),
            }
        )

    for _ in range(iters):
        unioned = state.map_batches(
            with_peer, batch_format="pyarrow"
        ).union(adj)
        collected = collect_tuples(
            unioned, ["node"], ["peer", "cur", "acc"], shuffle_blocks="auto"
        )
        folded = grouped_sum(
            flat_map_groups(collected, emit, ["node"]),
            keys=["node"],
            sum_cols=["cur", "acc"],
        )

        def roll(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {
                    "node": batch.column("node"),
                    "cur": batch.column("cur"),
                    "acc": pc.add(
                        batch.column("acc"), batch.column("cur")
                    ),
                }
            )

        state = folded.map_batches(roll, batch_format="pyarrow").materialize()

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "katz_i": batch.column("acc"),
            }
        )

    return state.map_batches(finish, batch_format="pyarrow").sort("node")


def kg_katz(sf_dir: str, iters: int = 3) -> ray.data.Dataset:
    """Katz centrality over the constructed KG's co-occurrence graph
    (unweighted symmetric edges), the walk-counting complement of
    kg_pagerank/kg_hits: a node is central if MANY short walks reach it,
    not just high-degree neighbors. (entity, katz_i), sorted."""
    from ner_pytorch_ray.pipelines.kg import linked_mentions_cached
    from ner_pytorch_ray.stages.graph import edge_partials_merged

    ew = edge_partials_merged(linked_mentions_cached(sf_dir))

    def sym(batch: pa.Table) -> pa.Table:
        fwd = pa.table(
            {"a": batch.column("subj"), "b": batch.column("obj")}
        )
        rev = pa.table(
            {"a": batch.column("obj"), "b": batch.column("subj")}
        )
        return pa.concat_tables([fwd, rev])

    out = katz_over_edges(
        ew.map_batches(sym, batch_format="pyarrow"),
        iters=iters,
        node_type=pa.string(),
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["entity", "katz_i"])

    return out.map_batches(rename, batch_format="pyarrow").sort("entity")


def eccentricity_over_edges(
    edges: ray.data.Dataset,
    n_pivots: int = 4,
    node_type: pa.DataType = pa.string(),
    max_iters: int = 32,
) -> ray.data.Dataset:
    """Pivot eccentricities + diameter lower bound over a SYMMETRIC edge
    table (a, b): for the ``n_pivots`` lexicographically-smallest nodes
    (deterministic, no sampling seed to disagree about), run one
    multi-round BFS each and report (pivot_node, ecc, n_reached); the max ecc
    across pivots is the classic diameter LOWER bound (Magnien, Latapy &
    Habib 2009 — exact diameter needs all-pairs, pivots bound it in
    k * O(BFS)). Pivots are chosen by global sort + limit(k) (a k-row
    driver materialization, bounded by the parameter, not the data);
    each BFS loops only (node, dist) rows; ecc/n_reached are Dataset
    aggregates, never collected."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    edges = edges.materialize()

    def node_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("a").cast(node_type),
                "one": pa.array([1] * len(batch), type=pa.int64()),
            }
        )

    nodes = grouped_sum(
        edges.map_batches(node_rows, batch_format="pyarrow"),
        keys=["node"],
        sum_cols=["one"],
    )
    pivots = [
        r["node"] for r in nodes.sort("node").limit(n_pivots).take_all()
    ]
    out_rows = {"pivot_node": [], "ecc": [], "n_reached": []}
    for p in pivots:
        seed = ray.data.from_arrow(
            pa.table({"node": pa.array([p], type=node_type)})
        )
        hops = bfs_hops_over_edges(
            edges, seed, node_type=node_type, max_iters=max_iters
        )
        out_rows["pivot_node"].append(p)
        out_rows["ecc"].append(int(hops.max("dist") or 0))
        out_rows["n_reached"].append(int(hops.count()))
    return ray.data.from_arrow(
        pa.table(
            {
                "pivot_node": pa.array(
                    out_rows["pivot_node"], type=node_type
                ),
                "ecc": pa.array(out_rows["ecc"], type=pa.int64()),
                "n_reached": pa.array(
                    out_rows["n_reached"], type=pa.int64()
                ),
            }
        )
    )


def kg_eccentricity(sf_dir: str, n_pivots: int = 4) -> ray.data.Dataset:
    """Pivot eccentricities over the constructed KG's co-occurrence
    graph — the "how far apart can two entities be" diagnostic; max(ecc)
    lower-bounds the KG diameter. (pivot_node, ecc, n_reached), sorted."""
    from ner_pytorch_ray.pipelines.kg import linked_mentions_cached
    from ner_pytorch_ray.stages.graph import edge_partials_merged

    ew = edge_partials_merged(linked_mentions_cached(sf_dir))

    def sym(batch: pa.Table) -> pa.Table:
        fwd = pa.table(
            {"a": batch.column("subj"), "b": batch.column("obj")}
        )
        rev = pa.table(
            {"a": batch.column("obj"), "b": batch.column("subj")}
        )
        return pa.concat_tables([fwd, rev])

    return eccentricity_over_edges(
        ew.map_batches(sym, batch_format="pyarrow"),
        n_pivots=n_pivots,
        node_type=pa.string(),
    ).sort("pivot_node")
