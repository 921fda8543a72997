"""Deeper analytics over the CONSTRUCTED knowledge graph.

The reference stops at emitting tagged spans (`/root/reference/train.py`
evaluation loop); the KG layer this engine builds on top (stages/graph.py,
stages/relations.py) makes the classic downstream KG queries possible.
This module adds the ones a KG-construction service is actually asked for,
each shaped for the 100 TB regime:

- :func:`metapaths_2hop` — directed 2-hop metapath counts over the typed
  triple table: ``subj -pred1-> mid -pred2-> obj``, aggregated over the
  intermediate node. The join is Ray Data's PARTITIONED hash join
  (``Dataset.join`` on the mid entity) — a big-x-big self-join of the
  triple table, no broadcast, no driver materialization.
- :func:`edge_lift` — exact-integer association strength ("lift", the
  log-free core of PMI) for every co-occurrence edge:
  ``lift_ppm = (1e6 * w * T) // (ca * cb)`` over the distinct
  (sentence, entity) incidence set. Marginals are joined back onto the
  edge table with two partitioned hash joins (entity marginals are
  corpus-sized at web scale — NOT broadcastable).
- :func:`schema_stats` — the ontology signature distribution
  ``(subj_type, pred, obj_type)``: a pure vectorized projection +
  two-phase aggregate over the triple table.
- :func:`communities_over_edges` / :func:`kg_communities` — synchronous
  WEIGHTED label propagation (Raghavan et al. 2007, made deterministic):
  each round every node adopts the label with the maximum summed incident
  edge weight, ties broken by the lexicographically smallest label.
  Integer weight sums + total tie ordering make every round a pure
  function of the previous labeling, so the result is bit-identical under
  any partitioning and an unrolled SQL oracle reproduces it exactly.
- :func:`kg_ppr` — PERSONALIZED PageRank from a seed entity set
  (graph_ops.pagerank_over_edges with ``teleport=``): the "related
  entities" query KG products serve; same scaled-integer fixed-point
  update as kg_pagerank, so it is partitioning-proof and SQL-oracle-able.
- :func:`random_walks_over_edges` / :func:`kg_random_walks` /
  :func:`skipgram_pairs_over_walks` / :func:`kg_skipgram_pairs` — the
  node2vec/DeepWalk data path (Grover & Leskovec 2016; Perozzi et al.
  2014) made deterministic: md5-threshold next-hop selection (the same
  expression SQL evaluates), packed adjacency collected once, one keyed
  collect per step / per walk.
- :func:`validated_triples` — constraint mining + enforcement: mine
  (subj_type, pred, obj_type) signatures with sufficient support
  (bounded set, broadcast once per actor), stream triples through a
  vectorized semi-join.

Scale notes (100 TB): every input here is an AGGREGATED graph table
(triples / edges / incidence), orders of magnitude smaller than the
corpus; the corpus-sized stages (sentence scan, mention extraction) are
shared via linked_mentions_cached. Joins are partitioned hash joins keyed
on the entity id; LPA rounds move only (node, label, weight) message rows
and materialize the small label table per round (flat lineage, same
discipline as pagerank_over_edges).
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

LIFT_SCALE = 1_000_000  # lift 1.0 == 1e6 (parts-per-million fixed point)


def _join_partitions(n_rows: int) -> int:
    """Partition count for Dataset.join, sized from the (already
    aggregated, hence countable) input: each partition carries a fixed
    actor/dispatch cost, so small inputs get few partitions while web-scale
    tables fan out (same rule as windows.order_revenue_join)."""
    return int(min(64, max(2, n_rows // 250_000 + 2)))


# ---------------------------------------------------------------------------
# 2-hop metapaths
# ---------------------------------------------------------------------------


def metapaths_2hop(sf_dir: str) -> ray.data.Dataset:
    """Directed 2-hop metapath aggregate over the verb-pattern triples:

        (subj, pred1, pred2, obj,
         n_mids       = #distinct intermediate entities,
         path_weight  = sum over mids of w1 * w2)

    for every pair of triples ``subj -pred1-> mid`` and ``mid -pred2-> obj``
    with ``subj != obj`` (trivial 2-cycles excluded). The self-join runs as
    Ray Data's partitioned hash join keyed on the mid entity — at web scale
    both sides are the full triple table, so neither is broadcastable; skew
    on hub mids is bounded upstream by the relation extractor's per-sentence
    pair cap. Consumes the UNSORTED merged triples via the shared memo
    (the join hash-partitions on mid, so the flagship sort would be
    wasted work)."""
    from ner_pytorch_ray.pipelines.kg import triples_merged_cached

    tri = triples_merged_cached(sf_dir).select_columns(
        ["subj", "pred", "obj", "weight"]
    )  # aggregated triple table, ≪ corpus (already materialized)
    n_parts = _join_partitions(tri.count())

    def left_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": batch.column("subj"),
                "pred1": batch.column("pred"),
                "mid": batch.column("obj"),
                "w1": batch.column("weight"),
            }
        )

    def right_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "mid2": batch.column("subj"),
                "pred2": batch.column("pred"),
                "obj": batch.column("obj"),
                "w2": batch.column("weight"),
            }
        )

    joined = tri.map_batches(left_side, batch_format="pyarrow").join(
        tri.map_batches(right_side, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=n_parts,
        on=("mid",),
        right_on=("mid2",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        # pure Arrow combiner: drop 2-cycles, one hash group_by per block.
        # multiply_checked: raise (never wrap) if a web-scale weight
        # product ever exceeds int64.
        keep = pc.not_equal(batch.column("subj"), batch.column("obj"))
        t = batch.filter(keep)
        prod = pc.multiply_checked(t.column("w1"), t.column("w2"))
        flat = pa.table(
            {
                "subj": t.column("subj").combine_chunks(),
                "pred1": t.column("pred1").combine_chunks(),
                "pred2": t.column("pred2").combine_chunks(),
                "obj": t.column("obj").combine_chunks(),
                "pw": prod.combine_chunks()
                if isinstance(prod, pa.ChunkedArray)
                else prod,
            }
        )
        g = flat.group_by(["subj", "pred1", "pred2", "obj"]).aggregate(
            [("pw", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "subj": g.column("subj"),
                "pred1": g.column("pred1"),
                "pred2": g.column("pred2"),
                "obj": g.column("obj"),
                "n_mids": g.column("count_all").cast(pa.int64()),
                "path_weight": g.column("pw_sum").cast(pa.int64()),
            }
        )

    merged = grouped_sum(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["subj", "pred1", "pred2", "obj"],
        sum_cols=["n_mids", "path_weight"],
    )
    return merged.sort(["subj", "pred1", "pred2", "obj"])


# ---------------------------------------------------------------------------
# Edge lift (exact-integer association strength)
# ---------------------------------------------------------------------------


def edge_lift(sf_dir: str) -> ray.data.Dataset:
    """Association strength of every co-occurrence edge, exact in ppm:

        lift_ppm(a, b) = (1e6 * w(a,b) * T) // (c(a) * c(b))

    over the DISTINCT (url, sent_id, entity) incidence set: w = #sentences
    containing both, c(x) = #sentences containing x, T = #sentences with
    >= 1 mention. Everything is integer counts, so the result is exact
    under any partitioning and bit-equal to the DuckDB oracle (HUGEINT in
    SQL, arbitrary-precision Python here — the numerator overflows int64
    at web scale).

    Output: (subj, obj, weight, ca, cb, lift_ppm) sorted by (subj, obj).
    Marginals join back via partitioned hash joins — the entity marginal
    table is corpus-vocabulary-sized at 100 TB, never a broadcast."""
    from ner_pytorch_ray.pipelines.kg import linked_mentions_cached
    from ner_pytorch_ray.stages.graph import edge_partials_merged

    linked = linked_mentions_cached(sf_dir)

    def inc_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "url": batch.column("url").combine_chunks(),
                "sent_id": batch.column("sent_id").combine_chunks(),
                "entity_id": batch.column("entity_id").combine_chunks(),
            }
        )
        g = t.group_by(["url", "sent_id", "entity_id"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "url": g.column("url"),
                "sent_id": g.column("sent_id"),
                "entity_id": g.column("entity_id"),
                "one": pa.array([1] * len(g), type=pa.int64()),
            }
        )

    # distinct incidence rows (block-local distinct, then one exchange);
    # size = distinct (sentence, entity) pairs — the aggregated layer the
    # rest of the query runs on.
    inc = (
        grouped_sum(
            linked.map_batches(inc_partial, batch_format="pyarrow"),
            ["url", "sent_id", "entity_id"],
            sum_cols=["one"],
        )
        .select_columns(["url", "sent_id", "entity_id"])
        .materialize()
    )

    def sent_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "url": batch.column("url").combine_chunks(),
                "sent_id": batch.column("sent_id").combine_chunks(),
            }
        )
        g = t.group_by(["url", "sent_id"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "url": g.column("url"),
                "sent_id": g.column("sent_id"),
                "one": pa.array([1] * len(g), type=pa.int64()),
            }
        )

    # T: one scalar — the count of a distinct-aggregated (small) table.
    total_sents = grouped_sum(
        inc.map_batches(sent_partial, batch_format="pyarrow"),
        ["url", "sent_id"],
        sum_cols=["one"],
    ).count()

    marg = grouped_sum(
        inc.map_batches(
            lambda t: pa.table(
                {
                    "ent": t.column("entity_id"),
                    "c": pa.array([1] * len(t), type=pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        ["ent"],
        sum_cols=["c"],
    ).materialize()

    edges = (
        edge_partials_merged(linked)
        .select_columns(["subj", "obj", "weight"])
        .materialize()
    )
    n_parts = _join_partitions(edges.count())

    def marg_a(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["ent_a", "ca"])

    def marg_b(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["ent_b", "cb"])

    with_a = edges.join(
        marg.map_batches(marg_a, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=n_parts,
        on=("subj",),
        right_on=("ent_a",),
    )
    with_ab = with_a.join(
        marg.map_batches(marg_b, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=n_parts,
        on=("obj",),
        right_on=("ent_b",),
    )

    def lift(batch: pa.Table) -> pa.Table:
        # final small edge table: arbitrary-precision Python ints so
        # 1e6 * w * T never overflows (same discipline as the PageRank
        # contribution arithmetic).
        w = batch.column("weight").to_pylist()
        ca = batch.column("ca").to_pylist()
        cb = batch.column("cb").to_pylist()
        vals = [
            (LIFT_SCALE * wi * total_sents) // (cai * cbi)
            for wi, cai, cbi in zip(w, ca, cb)
        ]
        return pa.table(
            {
                "subj": batch.column("subj"),
                "obj": batch.column("obj"),
                "weight": batch.column("weight"),
                "ca": batch.column("ca"),
                "cb": batch.column("cb"),
                "lift_ppm": pa.array(vals, type=pa.int64()),
            }
        )

    return with_ab.map_batches(lift, batch_format="pyarrow").sort(
        ["subj", "obj"]
    )


# ---------------------------------------------------------------------------
# Ontology schema signature stats
# ---------------------------------------------------------------------------


def schema_stats(sf_dir: str) -> ray.data.Dataset:
    """Distribution of relation signatures ``(subj_type, pred, obj_type)``
    over the typed triples — entity types are the namespace prefix of the
    linked entity ids ('org:spark' -> 'ORG'). One vectorized projection +
    the standard two-phase aggregate (over the UNSORTED merged triples —
    this re-aggregates, so the flagship sort would be wasted); output
    sorted by the signature."""
    from ner_pytorch_ray.pipelines.kg import triples_merged_cached

    triples = triples_merged_cached(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        def ns(col: pa.ChunkedArray) -> pa.Array:
            split = pc.split_pattern(col, pattern=":", max_splits=1)
            return pc.utf8_upper(pc.list_element(split, 0))

        t = pa.table(
            {
                "subj_type": ns(batch.column("subj")).combine_chunks(),
                "pred": batch.column("pred").combine_chunks(),
                "obj_type": ns(batch.column("obj")).combine_chunks(),
                "w": batch.column("weight").combine_chunks(),
            }
        )
        g = t.group_by(["subj_type", "pred", "obj_type"]).aggregate(
            [("w", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "subj_type": g.column("subj_type"),
                "pred": g.column("pred"),
                "obj_type": g.column("obj_type"),
                "n_triples": g.column("count_all").cast(pa.int64()),
                "total_weight": g.column("w_sum").cast(pa.int64()),
            }
        )

    merged = grouped_sum(
        triples.map_batches(partial, batch_format="pyarrow"),
        ["subj_type", "pred", "obj_type"],
        sum_cols=["n_triples", "total_weight"],
    )
    return merged.sort(["subj_type", "pred", "obj_type"])


def validated_triples(sf_dir: str, min_support: int = 3) -> ray.data.Dataset:
    """Constraint mining + enforcement — the KG-construction quality gate:

    1. mine the ontology signatures ``(subj_type, pred, obj_type)`` whose
       triple count reaches ``min_support`` (data-derived schema, the same
       aggregate as :func:`schema_stats`);
    2. keep only triples matching a mined signature.

    The mined signature set is bounded by #types² × #predicates —
    broadcast once via ``ray.put`` and probed per batch (a semi-join
    against a provably small side; the TRIPLE side streams). Output:
    the surviving triples sorted by (subj, pred, obj)."""
    import ray as _ray

    from ner_pytorch_ray.pipelines.kg import triples_merged_cached

    triples = triples_merged_cached(sf_dir)

    def _ns(col: pa.ChunkedArray) -> pa.Array:
        split = pc.split_pattern(col, pattern=":", max_splits=1)
        return pc.utf8_upper(pc.list_element(split, 0))

    def sig_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "subj_type": _ns(batch.column("subj")).combine_chunks(),
                "pred": batch.column("pred").combine_chunks(),
                "obj_type": _ns(batch.column("obj")).combine_chunks(),
            }
        )
        g = t.group_by(["subj_type", "pred", "obj_type"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "subj_type": g.column("subj_type"),
                "pred": g.column("pred"),
                "obj_type": g.column("obj_type"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    sigs = grouped_sum(
        triples.map_batches(sig_partial, batch_format="pyarrow"),
        ["subj_type", "pred", "obj_type"],
        sum_cols=["n"],
    )
    allowed = {
        (r["subj_type"], r["pred"], r["obj_type"])
        for r in sigs.take_all()  # bounded: #types^2 x #preds
        if r["n"] >= min_support
    }
    allowed_ref = _ray.put(frozenset(allowed))

    class Enforce:
        """Actor-pool stage: fetch the mined signature set ONCE per actor
        (never per batch), probe vectorized columns against it."""

        def __init__(self, ref):
            self._allowed = _ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            st = _ns(batch.column("subj")).to_pylist()
            pr = batch.column("pred").to_pylist()
            ot = _ns(batch.column("obj")).to_pylist()
            keep = pa.array(
                [
                    (a, p, b) in self._allowed
                    for a, p, b in zip(st, pr, ot)
                ],
                type=pa.bool_(),
            )
            return batch.filter(keep)

    kept = triples.map_batches(
        Enforce,
        batch_format="pyarrow",
        concurrency=2,
        fn_constructor_args=(allowed_ref,),
    ).select_columns(["subj", "pred", "obj", "weight"])
    return kept.sort(["subj", "pred", "obj"])


# ---------------------------------------------------------------------------
# Weighted synchronous label propagation (community detection)
# ---------------------------------------------------------------------------


def communities_over_edges(
    edges: ray.data.Dataset,
    rounds: int = 4,
    node_type: pa.DataType = pa.string(),
    weight_col: str | None = None,
    small_graph: int = 0,
) -> ray.data.Dataset:
    """(node, community) after ``rounds`` synchronous weighted-LPA rounds
    over a SYMMETRIC edge table (a, b[, weight]).

    Deterministic update (bit-identical under any partitioning):

        label_0(v) = v
        label_k(v) = the label L maximizing sum of w(u, v) over neighbors
                     u with label_{k-1}(u) == L; ties -> smallest L.

    Integer weight sums are summation-order independent and (max sum,
    min label) is a total order, so each round is a pure function of the
    previous labeling — an unrolled SQL oracle (GROUP BY label + window
    rank) reproduces it exactly.

    Per round: TWO exchanges — one keyed collect co-locates a node's label
    with its out-edges (group size = out-degree, hub-capped upstream), then
    one groupby whose accumulator folds votes into a per-node
    {label: weight_sum} dict (block-local pre-aggregation included) and
    finalizes the argmax; only the small (node, label) state materializes
    per round."""
    from ray.data.aggregate import AggregateFn
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
                        [("node", node_type), ("community", node_type)]
                    ).empty_table()
                )
            lab = {v: v for v in nodes_l}
            for _ in range(rounds):
                votes: dict = {}
                for a, b, w in ew:
                    key = (b, lab[a])
                    votes[key] = votes.get(key, 0) + w
                new = {}
                for (v, lb), s in votes.items():
                    cur = new.get(v)
                    if cur is None or (-s, lb) < (-cur[0], cur[1]):
                        new[v] = (s, lb)
                lab = {v: new[v][1] if v in new else lab[v] for v in nodes_l}
            return ray.data.from_arrow(
                pa.Table.from_pydict(
                    {
                        "node": pa.array(nodes_l, type=node_type),
                        "community": pa.array(
                            [lab[v] for v in nodes_l], type=node_type
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
                "lab": pa.array([None] * n, type=node_type),
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

    nodes = (
        grouped_sum(
            adj.map_batches(node_rows, batch_format="pyarrow"),
            keys=["node"],
            sum_cols=["one"],
        )
        .select_columns(["node"])
        .materialize()
    )
    if nodes.count() == 0:
        return ray.data.from_arrow(
            pa.schema(
                [("node", node_type), ("community", node_type)]
            ).empty_table()
        )

    labels = nodes.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node": t.column("node"), "lab": t.column("node")}
        ),
        batch_format="pyarrow",
    ).materialize()

    vote_schema = pa.schema(
        [("node", node_type), ("lab", node_type), ("w", pa.int64())]
    )

    def label_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "node": batch.column("node"),
                "peer": pa.array([None] * n, type=node_type),
                "w": pa.array([0] * n, type=pa.int64()),
                "lab": batch.column("lab"),
            }
        )

    def emit_votes(key, items) -> pa.Table:
        if items is None:
            return vote_schema.empty_table()
        lab = next(lb for p, _, lb in items if p is None)
        out_n, out_l, out_w = [], [], []
        for p, w, _ in items:
            if p is not None:
                out_n.append(p)
                out_l.append(lab)
                out_w.append(w)
        return pa.Table.from_pydict(
            {
                "node": pa.array(out_n, type=node_type),
                "lab": pa.array(out_l, type=node_type),
                "w": pa.array(out_w, type=pa.int64()),
            }
        )

    # The partial accumulator is a SORTED LIST of (label, weight_sum)
    # pairs, NOT a dict: Ray stores partial aggregates inside Arrow
    # blocks, and a dict accumulator gets silently coerced to a struct
    # whose fields are the UNION of keys across rows — absent keys come
    # back as None and poison the merge (observed as `int + NoneType`
    # in vote_merge under multi-block partial layouts).  Lists of
    # mixed-type tuples take the exact pickled-object path instead
    # (same as collect_tuples' items), so they round-trip verbatim.

    def vote_acc(a: list, block) -> list:
        # integer sums: summation-order independent
        d = dict(a)
        for lb, w in zip(
            block.column("lab").to_pylist(), block.column("w").to_pylist()
        ):
            d[lb] = d.get(lb, 0) + w
        return sorted(d.items())

    def vote_merge(a: list, b: list) -> list:
        d = dict(a)
        for lb, w in b:
            d[lb] = d.get(lb, 0) + w
        return sorted(d.items())

    def vote_fin(pairs: list):
        # (max weight sum, min label) — a total order, so deterministic
        return min(pairs, key=lambda kv: (-kv[1], kv[0]))[0]

    for _ in range(rounds):
        unioned = labels.map_batches(
            label_rows, batch_format="pyarrow"
        ).union(adj)
        collected = collect_tuples(
            unioned, ["node"], ["peer", "w", "lab"], shuffle_blocks="auto"
        )
        votes = flat_map_groups(collected, emit_votes, ["node"])
        picked = votes.groupby("node").aggregate(
            AggregateFn(
                init=lambda k: [],
                accumulate_block=vote_acc,
                merge=vote_merge,
                finalize=vote_fin,
                name="lab",
            )
        )
        labels = picked.map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "node": t.column("node").cast(node_type),
                    "lab": t.column("lab").cast(node_type),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    return labels.map_batches(
        lambda t: t.rename_columns(["node", "community"]),
        batch_format="pyarrow",
    ).sort("node")


def _kg_symmetric_edges(sf_dir: str) -> ray.data.Dataset:
    """Symmetric weighted co-occurrence edges of the constructed KG
    (shared derivation with kg_pagerank)."""
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

    return ew.map_batches(symmetrize, batch_format="pyarrow")


def kg_communities(sf_dir: str, rounds: int = 4) -> ray.data.Dataset:
    """Weighted LPA communities over the constructed KG's co-occurrence
    graph. Returns (node:string, community:string) sorted by node."""
    return communities_over_edges(
        _kg_symmetric_edges(sf_dir),
        rounds=rounds,
        node_type=pa.string(),
        weight_col="w",
    )


def sparsify_edges(sf_dir: str, k: int = 2) -> ray.data.Dataset:
    """Degree-capped graph sparsification — the hub-taming step run before
    walk/embedding stages on web-scale graphs: every node keeps its top-k
    incident edges by (weight desc, neighbor asc — a total order), and an
    undirected edge survives if EITHER endpoint keeps it (the standard
    union sparsifier, so the result stays connected wherever either side
    cares). One keyed collect (group size = degree, hub-capped upstream)
    + one grouped distinct. Output (subj, obj, weight) sorted."""
    sym = _kg_symmetric_edges(sf_dir)

    def rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("a"),
                "b": batch.column("b"),
                "w": batch.column("w"),
            }
        )

    kept_schema = pa.schema(
        [("subj", pa.string()), ("obj", pa.string()), ("weight", pa.int64())]
    )

    def pick(key, items) -> pa.Table:
        if items is None:
            return kept_schema.empty_table()
        top = sorted(items, key=lambda t: (-t[1], t[0]))[:k]
        node = key[0]
        return pa.Table.from_pydict(
            {
                "subj": pa.array(
                    [min(node, b) for b, _ in top], type=pa.string()
                ),
                "obj": pa.array(
                    [max(node, b) for b, _ in top], type=pa.string()
                ),
                "weight": pa.array([w for _, w in top], type=pa.int64()),
            }
        )

    collected = collect_tuples(
        sym.map_batches(rows, batch_format="pyarrow"),
        ["node"],
        ["b", "w"],
        shuffle_blocks="auto",
    )
    kept = flat_map_groups(collected, pick, ["node"])
    # both endpoints may keep the same undirected edge (same weight):
    # fold to one row via a grouped min over the identical weights
    distinct = grouped_sum(
        kept.map_batches(
            lambda t: pa.table(
                {
                    "subj": t.column("subj"),
                    "obj": t.column("obj"),
                    "w0": t.column("weight"),
                }
            ),
            batch_format="pyarrow",
        ),
        ["subj", "obj"],
        sum_cols=[],
        min_cols=["w0"],
    )
    return distinct.map_batches(
        lambda t: t.rename_columns(["subj", "obj", "weight"]),
        batch_format="pyarrow",
    ).sort(["subj", "obj"])


def inverse_relations(sf_dir: str) -> ray.data.Dataset:
    """Relation-property mining over the triple table: which predicate
    PAIRS co-occur on REVERSED entity pairs?  For every (pred_a, pred_b)
    such that some entity pair holds both ``a -pred_a-> b`` and
    ``b -pred_b-> a`` (a < b, self-loops excluded):

        (pred_a, pred_b,
         n_pairs      = #distinct entity pairs with that combination,
         joint_weight = sum over pairs of w_fwd * w_bwd)

    Diagonal rows (pred_a == pred_b) measure a predicate's SYMMETRY
    support; off-diagonal heavy hitters are INVERSE-relation candidates
    (``owns``/``owned_by``) — the standard ontology-alignment signal mined
    from an extracted KG (cf. AMIE-style rule mining, public literature).

    Shape for scale: one keyed collect on the canonical unordered entity
    pair — group size is the number of distinct predicates asserted
    between two specific entities (tiny; bounded by the predicate
    vocabulary), NOT node degree — then a within-group forward x backward
    cross product and an integer grouped_sum over (pred_a, pred_b), whose
    keyspace is |preds|^2.  No joins, no driver materialization; consumes
    the shared materialized triple memo like the other analytics."""
    from ner_pytorch_ray.pipelines.kg import triples_merged_cached

    tri = triples_merged_cached(sf_dir).select_columns(
        ["subj", "pred", "obj", "weight"]
    )

    def rows(batch: pa.Table) -> pa.Table:
        s, o = batch.column("subj"), batch.column("obj")
        keep = pc.not_equal(s, o)  # self-loops are their own reverse
        s, o = s.filter(keep), o.filter(keep)
        pred = batch.column("pred").filter(keep)
        w = batch.column("weight").filter(keep)
        lt = pc.less(s, o)
        return pa.table(
            {
                "a": pc.if_else(lt, s, o),
                "b": pc.if_else(lt, o, s),
                # fwd=1: subj is the smaller endpoint (the SQL oracle's
                # t1 side); fwd=0: the reversed assertion
                "fwd": pc.cast(lt, pa.int64()),
                "pred": pred,
                "w": w,
            }
        )

    out_schema = pa.schema(
        [
            ("pred_a", pa.string()),
            ("pred_b", pa.string()),
            ("n_pairs", pa.int64()),
            ("joint_weight", pa.int64()),
        ]
    )

    def cross(key, items) -> pa.Table:
        if items is None:
            return out_schema.empty_table()
        f = [(p, w) for d, p, w in items if d]
        r = [(p, w) for d, p, w in items if not d]
        if not f or not r:
            return None
        pa_, pb_, jw = [], [], []
        for p1, w1 in f:
            for p2, w2 in r:
                pa_.append(p1)
                pb_.append(p2)
                jw.append(w1 * w2)
        return pa.Table.from_pydict(
            {
                "pred_a": pa.array(pa_, type=pa.string()),
                "pred_b": pa.array(pb_, type=pa.string()),
                "n_pairs": pa.array([1] * len(jw), type=pa.int64()),
                "joint_weight": pa.array(jw, type=pa.int64()),
            }
        )

    collected = collect_tuples(
        tri.map_batches(rows, batch_format="pyarrow"),
        ["a", "b"],
        ["fwd", "pred", "w"],
        shuffle_blocks="auto",
    )
    combos = flat_map_groups(collected, cross, ["a", "b"])
    return grouped_sum(
        combos, ["pred_a", "pred_b"], sum_cols=["n_pairs", "joint_weight"]
    ).sort(["pred_a", "pred_b"])


def kg_evidence(sf_dir: str) -> ray.data.Dataset:
    """Distinct relation-evidence (provenance) rows
    (url, sent_id, subj, pred, obj) — which page and sentence asserted
    each triple; the lineage surface KG consumers audit."""
    from ner_pytorch_ray.pipelines.kg import pages_from_documents
    from ner_pytorch_ray.stages.extract import extract_stage
    from ner_pytorch_ray.stages.gazetteer import gazetteer_tag_stage
    from ner_pytorch_ray.stages.relations import (
        relation_evidence_from_tagged,
    )
    from ner_pytorch_ray.stages.sentences import sentences_stage

    tagged = gazetteer_tag_stage(
        sentences_stage(extract_stage(pages_from_documents(sf_dir)))
    )
    return relation_evidence_from_tagged(tagged)


# ---------------------------------------------------------------------------
# Deterministic weighted random walks (node2vec-style corpus generation)
# ---------------------------------------------------------------------------


def _walk_threshold(start, walk_idx: int, step: int, cur) -> int:
    """Deterministic per-(walk, step) threshold: the first 12 hex chars of
    md5('start|walk_idx|step|cur') as an integer — the same expression a
    SQL oracle can evaluate (CAST('0x'||substring(md5(s),1,12) AS BIGINT)),
    so walk selection is reproducible everywhere."""
    import hashlib

    s = f"{start}|{walk_idx}|{step}|{cur}"
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:12], 16)


def random_walks_over_edges(
    edges: ray.data.Dataset,
    walks_per_node: int = 2,
    steps: int = 3,
    node_type: pa.DataType = pa.string(),
    weight_col: str | None = None,
    sort: bool = True,
) -> ray.data.Dataset:
    """Weighted random-walk corpus over a SYMMETRIC edge table
    (a, b[, weight]) — the node2vec/DeepWalk input generator (Grover &
    Leskovec 2016; Perozzi et al. 2014), made DETERMINISTIC so distributed
    runs are bit-reproducible and SQL-oracle-able:

        walk (v, r): w_0 = v;  at step k, from node c the next hop is the
        first neighbor (sorted by id) whose cumulative edge weight exceeds
        md5-threshold('v|r|k|c') mod sw(c).

    Output: one row per visited position, (start, walk_idx, step, node),
    step 0..steps.

    Scale shape: adjacency lists are collected ONCE (group size =
    out-degree, hub-capped upstream) and packed as binary cells; each step
    is then a single keyed collect that co-locates the walk frontier rows
    with their node's packed adjacency — L steps = L exchanges moving only
    (start, walk_idx, cur) rows, never the corpus. The md5 draw happens
    inside the group emit (a per-walk-row scalar, not a corpus scan)."""
    import pickle

    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples as _collect,
    )

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
                "b": batch.column("b").cast(node_type),
                "w": w,
            }
        )

    adj_schema = pa.schema([("node", node_type), ("adj", pa.binary())])

    def pack_adj(key, items) -> pa.Table:
        if items is None:
            return adj_schema.empty_table()
        nbrs = sorted(items)  # (b, w) sorted by neighbor id
        bs = [b for b, _ in nbrs]
        cums = []
        acc = 0
        for _, w in nbrs:
            acc += int(w)
            cums.append(acc)
        return pa.Table.from_pydict(
            {
                "node": pa.array([key[0]], type=node_type),
                "adj": pa.array(
                    [pickle.dumps((bs, cums), protocol=4)], type=pa.binary()
                ),
            }
        )

    adj = flat_map_groups(
        _collect(
            edges.map_batches(edge_rows, batch_format="pyarrow"),
            ["node"],
            ["b", "w"],
        ),
        pack_adj,
        ["node"],
    ).materialize()

    # adjacency rows are unioned with walk rows per step: tag via null adj
    def adj_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "node": batch.column("node"),
                "adj": batch.column("adj"),
                "start": pa.array([None] * n, type=node_type),
                "walk_idx": pa.array([None] * n, type=pa.int64()),
            }
        )

    adj_tagged = adj.map_batches(adj_rows, batch_format="pyarrow")

    def init_walks(batch: pa.Table) -> pa.Table:
        nodes = batch.column("node").to_pylist()
        starts, idxs = [], []
        for v in nodes:
            for r in range(walks_per_node):
                starts.append(v)
                idxs.append(r)
        return pa.Table.from_pydict(
            {
                "node": pa.array(starts, type=node_type),  # cur == start
                "adj": pa.array([None] * len(starts), type=pa.binary()),
                "start": pa.array(starts, type=node_type),
                "walk_idx": pa.array(idxs, type=pa.int64()),
            }
        )

    frontier = adj.select_columns(["node"]).map_batches(
        init_walks, batch_format="pyarrow"
    ).materialize()

    out_schema = pa.schema(
        [
            ("start", node_type),
            ("walk_idx", pa.int64()),
            ("step", pa.int64()),
            ("node", node_type),
        ]
    )

    def emit_step(step_k: int):
        def emit(key, items) -> pa.Table:
            if items is None:
                return pa.schema(
                    [
                        ("node", node_type),
                        ("adj", pa.binary()),
                        ("start", node_type),
                        ("walk_idx", pa.int64()),
                    ]
                ).empty_table()
            import bisect
            import pickle as _p

            packed = next(
                (a for a, s, _ in items if s is None and a is not None), None
            )
            walks = [(s, wi) for a, s, wi in items if s is not None]
            if packed is None or not walks:
                # node without adjacency (can't happen on symmetric edges)
                # or no walk currently here
                return pa.Table.from_pydict(
                    {
                        "node": pa.array([], type=node_type),
                        "adj": pa.array([], type=pa.binary()),
                        "start": pa.array([], type=node_type),
                        "walk_idx": pa.array([], type=pa.int64()),
                    }
                )
            bs, cums = _p.loads(packed)
            sw = cums[-1]
            cur = key[0]
            nxt, starts, idxs = [], [], []
            for s, wi in walks:
                t = _walk_threshold(s, wi, step_k, cur) % sw
                j = bisect.bisect_right(cums, t)
                nxt.append(bs[j])
                starts.append(s)
                idxs.append(wi)
            return pa.Table.from_pydict(
                {
                    "node": pa.array(nxt, type=node_type),
                    "adj": pa.array([None] * len(nxt), type=pa.binary()),
                    "start": pa.array(starts, type=node_type),
                    "walk_idx": pa.array(idxs, type=pa.int64()),
                }
            )

        return emit

    def positions(frontier_ds: ray.data.Dataset, step_k: int):
        return frontier_ds.map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "start": t.column("start"),
                    "walk_idx": t.column("walk_idx"),
                    "step": pa.array([step_k] * len(t), type=pa.int64()),
                    "node": t.column("node"),
                }
            ),
            batch_format="pyarrow",
        )

    outputs = [positions(frontier, 0)]
    for k in range(1, steps + 1):
        collected = _collect(
            frontier.select_columns(
                ["node", "adj", "start", "walk_idx"]
            ).union(adj_tagged),
            ["node"],
            ["adj", "start", "walk_idx"],
            shuffle_blocks="auto",
        )
        frontier = flat_map_groups(
            collected, emit_step(k), ["node"]
        ).materialize()
        outputs.append(positions(frontier, k))

    result = outputs[0]
    for o in outputs[1:]:
        result = result.union(o)
    # guard: empty-union schema
    _ = out_schema
    if not sort:  # downstream re-shuffles (e.g. skip-gram pairing)
        return result
    return result.sort(["start", "walk_idx", "step"])


def kg_random_walks(
    sf_dir: str, walks_per_node: int = 2, steps: int = 3
) -> ray.data.Dataset:
    """Deterministic weighted random walks over the constructed KG's
    co-occurrence graph — the training-corpus generator for skip-gram
    node embeddings. Returns (start, walk_idx, step, node)."""
    return random_walks_over_edges(
        _kg_symmetric_edges(sf_dir),
        walks_per_node=walks_per_node,
        steps=steps,
        node_type=pa.string(),
        weight_col="w",
    )


def skipgram_pairs_over_walks(
    walks: ray.data.Dataset,
    window: int = 2,
    node_type: pa.DataType = pa.string(),
) -> ray.data.Dataset:
    """(center, context, n_pairs) skip-gram training pairs from a walk
    corpus (start, walk_idx, step, node) — the second half of the
    node2vec/DeepWalk data path: pairs are all ordered position pairs
    within ``window`` steps of each other inside one walk.

    One keyed collect co-locates a walk's positions (group size = walk
    length + 1, a constant), pairs are emitted block-locally, and the
    final counts fold through the standard grouped sum. Output sorted by
    (center, context)."""
    pair_schema = pa.schema(
        [("center", node_type), ("context", node_type), ("n", pa.int64())]
    )

    def emit_pairs(key, items) -> pa.Table:
        if items is None:
            return pair_schema.empty_table()
        pos = sorted(items)  # (step, node), walk length is tiny
        cs, xs = [], []
        for i, (si, ni) in enumerate(pos):
            for sj, nj in pos:
                if sj != si and abs(sj - si) <= window:
                    cs.append(ni)
                    xs.append(nj)
        return pa.Table.from_pydict(
            {
                "center": pa.array(cs, type=node_type),
                "context": pa.array(xs, type=node_type),
                "n": pa.array([1] * len(cs), type=pa.int64()),
            }
        )

    collected = collect_tuples(
        walks, ["start", "walk_idx"], ["step", "node"], shuffle_blocks="auto"
    )
    pairs = flat_map_groups(collected, emit_pairs, ["start", "walk_idx"])
    merged = grouped_sum(pairs, ["center", "context"], sum_cols=["n"])
    return merged.map_batches(
        lambda t: t.rename_columns(["center", "context", "n_pairs"]),
        batch_format="pyarrow",
    ).sort(["center", "context"])


def kg_skipgram_pairs(
    sf_dir: str, walks_per_node: int = 2, steps: int = 3, window: int = 2
) -> ray.data.Dataset:
    """Skip-gram (center, context) pair counts from the deterministic KG
    walk corpus — ready-to-train input for skip-gram node embeddings."""
    walks = random_walks_over_edges(
        _kg_symmetric_edges(sf_dir),
        walks_per_node=walks_per_node,
        steps=steps,
        node_type=pa.string(),
        weight_col="w",
        sort=False,  # the pairing collect re-shuffles anyway
    )
    return skipgram_pairs_over_walks(walks, window=window)


def kg_ppr(
    sf_dir: str,
    seeds: tuple[str, ...] = ("org:spark",),
    iters: int = 3,
) -> ray.data.Dataset:
    """Personalized PageRank over the constructed KG from a seed entity
    set — 'entities related to X', the canonical KG neighborhood query.
    Returns (node:string, rank:int64), rank 1.0 == 10**12 fixed point."""
    from ner_pytorch_ray.pipelines.graph_ops import (
        SCALE,
        pagerank_over_edges,
    )

    return pagerank_over_edges(
        _kg_symmetric_edges(sf_dir),
        iters=iters,
        scale=SCALE,
        node_type=pa.string(),
        weight_col="w",
        teleport=list(seeds),
    )


def star_query(
    sf_dir: str,
    constraints: list[tuple[str, str]] | None = None,
) -> ray.data.Dataset:
    """SPARQL-style star basic-graph-pattern over the triple table: the
    subjects satisfying EVERY constraint ``(pred, obj_prefix)`` — e.g.
    "entities that *scan* some location AND *merge* some organization".

    Answered as a COUNTING SEMI-JOIN in two aggregation passes instead of
    a (k-1)-way self-join: each triple is tested against all k constraints
    vectorized (one scan of the aggregated triple table), matches emit
    (subj, constraint_id) partials, a grouped sum collapses them to
    distinct-constraint coverage per subject, and subjects covering all k
    survive. No join ever materializes candidate combinations, so a hub
    subject with millions of matching triples costs rows proportional to
    its matches, never their cross product.

    Returns (subj, n_matches, total_weight) sorted by subj: the count and
    summed weight of the subject's constraint-matching triples.
    """
    from ner_pytorch_ray.pipelines.kg import triples_merged_cached

    cons = list(
        constraints
        if constraints is not None
        else [("scan", "loc:"), ("merge", "org:")]
    )
    k = len(cons)
    tri = triples_merged_cached(sf_dir).select_columns(
        ["subj", "pred", "obj", "weight"]
    )
    schema = pa.schema(
        [
            ("subj", pa.string()),
            ("cid", pa.int64()),
            ("n", pa.int64()),
            ("w", pa.int64()),
        ]
    )

    def match_rows(batch: pa.Table) -> pa.Table:
        outs = []
        for cid, (pred, obj_prefix) in enumerate(cons):
            mask = pc.and_(
                pc.equal(batch.column("pred"), pa.scalar(pred)),
                pc.starts_with(batch.column("obj"), pattern=obj_prefix),
            )
            hit = batch.filter(mask)
            if hit.num_rows:
                outs.append(
                    pa.table(
                        {
                            "subj": hit.column("subj"),
                            "cid": pa.array(
                                [cid] * hit.num_rows, type=pa.int64()
                            ),
                            "n": pa.array(
                                [1] * hit.num_rows, type=pa.int64()
                            ),
                            "w": hit.column("weight").cast(pa.int64()),
                        }
                    )
                )
        if not outs:
            return schema.empty_table()
        return pa.concat_tables(outs)

    partials = tri.map_batches(match_rows, batch_format="pyarrow")
    per_constraint = grouped_sum(
        partials, keys=["subj", "cid"], sum_cols=["n", "w"]
    )

    def coverage_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": batch.column("subj"),
                "n_cons": pa.array([1] * batch.num_rows, type=pa.int64()),
                "n_matches": batch.column("n"),
                "total_weight": batch.column("w"),
            }
        )

    per_subj = grouped_sum(
        per_constraint.map_batches(coverage_rows, batch_format="pyarrow"),
        keys=["subj"],
        sum_cols=["n_cons", "n_matches", "total_weight"],
    )

    def keep_covered(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.equal(batch.column("n_cons"), pa.scalar(k)))
        return out.select(["subj", "n_matches", "total_weight"])

    return per_subj.map_batches(
        keep_covered, batch_format="pyarrow"
    ).sort("subj")
