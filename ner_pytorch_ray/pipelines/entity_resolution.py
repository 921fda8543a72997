"""Entity resolution over record tables — the KG-construction step that
clusters near-identical records into one canonical entity BEFORE they
become graph nodes.

Reference analogue: the linker's alias canonicalization collapses mention
surfaces onto one entity id via an exact alias bank
(``word_rep.py`` Word_Replacement, re-expressed in
``stages/linker.py:58``); entity resolution generalizes that to records
with NO pre-built bank, deriving the clusters from the records themselves.

Classic scalable three-phase shape (token blocking -> bounded per-block
candidate generation -> distributed transitive closure):

1. **BLOCK** — explode each record into (name token, exact-attr...) keyed
   rows. The match predicate (>= ``min_shared`` shared name tokens AND
   equal exact attrs) implies a shared block, so candidate recall is 100%
   by construction; no all-pairs comparison ever happens.
2. **VERIFY** — per block, emit candidate pairs; a pair's evidence is
   summed ACROSS blocks with a grouped sum (one row per shared token),
   then pairs below ``min_shared`` are dropped. Blocks larger than
   ``max_block`` raise: a hot token would explode quadratically, and at
   web scale the right response is a better blocking key (add an exact
   attribute), not a silent partial answer — the same stance as
   ``triangles_over_edges``'s hub guard.
3. **RESOLVE** — verified pairs become symmetric edges; hash-min
   connected components (:func:`~ner_pytorch_ray.pipelines.graph_ops.
   components_over_edges`) assign each record the minimum reachable
   record id as its canonical ``entity_id``. Singletons are filled in by
   one grouped-min union with the record table itself — NOT by threading
   |V| self-edges through every propagation round.

Everything moves (key, int64 id) rows; record payloads never ride through
a shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_PAIR_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("n_shared", pa.int64())]
)


def token_block_rows(
    batch: pa.Table, id_col: str, name_col: str, attr_cols: list[str]
) -> pa.Table:
    """Vectorized blocking explode: one (tok, attrs..., id) row per name
    token (split -> list_parent_indices, the term_postings idiom)."""
    toks = pc.split_pattern(batch.column(name_col), " ")
    parents = pc.list_parent_indices(toks)
    cols: dict = {"tok": pc.list_flatten(toks)}
    for c in attr_cols:
        cols[c] = pc.take(batch.column(c), parents)
    cols[id_col] = pc.take(batch.column(id_col), parents)
    return pa.table(cols)


def blocked_match_pairs(
    records: ray.data.Dataset,
    id_col: str,
    name_col: str,
    attr_cols: list[str] | None = None,
    min_shared: int = 1,
    max_block: int = 10_000,
) -> ray.data.Dataset:
    """Candidate-pair generation + verify: (a, b, n_shared) with
    a < b, equal ``attr_cols`` and >= ``min_shared`` distinct shared name
    tokens. Per-block pair cost is (block size)^2 bounded by
    ``max_block``; the verify evidence (n_shared) is a distributive sum,
    so hot pairs merge in combiners like any other grouped count."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
        grouped_sum,
    )

    attrs = list(attr_cols or [])

    blocks = records.map_batches(
        lambda b: token_block_rows(b, id_col, name_col, attrs),
        batch_format="pyarrow",
    )
    collected = collect_tuples(blocks, ["tok", *attrs], [id_col])

    def gen_pairs(key, items) -> pa.Table:
        if items is None:
            return _PAIR_SCHEMA.empty_table()
        # a token repeated inside one name must not double-count as
        # evidence: dedupe block-locally (cheaper than a distinct shuffle)
        uniq = {i for (i,) in items}
        if len(uniq) < 2:
            return _PAIR_SCHEMA.empty_table()
        if len(uniq) > max_block:
            raise ValueError(
                f"blocking key {key!r} has {len(uniq)} records "
                f"(max_block={max_block}); add an exact attribute to the "
                "blocking key instead of comparing a hot block all-pairs"
            )
        ids = np.sort(np.fromiter(uniq, dtype=np.int64, count=len(uniq)))
        ai, bi = np.triu_indices(len(ids), k=1)
        return pa.Table.from_arrays(
            [
                pa.array(ids[ai]),
                pa.array(ids[bi]),
                pa.array(np.ones(len(ai), dtype=np.int64)),
            ],
            schema=_PAIR_SCHEMA,
        )

    partials = flat_map_groups(collected, gen_pairs, ["tok", *attrs])
    merged = grouped_sum(partials, keys=["a", "b"], sum_cols=["n_shared"])
    if min_shared <= 1:
        return merged

    def verify(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater_equal(t.column("n_shared"), pa.scalar(min_shared))
        )

    return merged.map_batches(verify, batch_format="pyarrow")


def blocked_star_edges(
    records: ray.data.Dataset,
    id_col: str,
    name_col: str,
    attr_cols: list[str] | None = None,
    max_block: int = 100_000,
) -> ray.data.Dataset:
    """Connectivity-only candidate edges: per block, a STAR from the
    block's minimum record id to every other member — O(block) edges with
    the SAME transitive closure as the O(block^2) clique (every member is
    connected through the representative). This is the scale path when
    ``min_shared == 1`` (no cross-block evidence needed); a hot block
    costs linear edges, so ``max_block`` here only bounds the collect
    group's memory, not a quadratic blow-up."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    attrs = list(attr_cols or [])
    blocks = records.map_batches(
        lambda b: token_block_rows(b, id_col, name_col, attrs),
        batch_format="pyarrow",
    )
    collected = collect_tuples(blocks, ["tok", *attrs], [id_col])
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def gen_star(key, items) -> pa.Table:
        if items is None:
            return schema.empty_table()
        uniq = {i for (i,) in items}
        if len(uniq) < 2:
            return schema.empty_table()
        if len(uniq) > max_block:
            raise ValueError(
                f"blocking key {key!r} has {len(uniq)} records "
                f"(max_block={max_block})"
            )
        ids = np.sort(np.fromiter(uniq, dtype=np.int64, count=len(uniq)))
        return pa.Table.from_arrays(
            [pa.array(np.full(len(ids) - 1, ids[0])), pa.array(ids[1:])],
            schema=schema,
        )

    star = flat_map_groups(collected, gen_star, ["tok", *attrs])
    # the same (rep, member) edge arrives from every shared block: one
    # grouped dedupe keeps the components loop's input minimal
    from ray.data.aggregate import Count

    distinct = star.repartition(8).groupby(["a", "b"]).aggregate(Count())
    return distinct.map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow"
    )


def resolve_entities(
    records: ray.data.Dataset,
    pairs: ray.data.Dataset,
    id_col: str,
    max_iters: int = 50,
) -> ray.data.Dataset:
    """(id_col, entity_id): canonical id = min record id in the pair
    graph's connected component; records with no candidate pair keep
    their own id (filled by one grouped-min union, loop-free)."""
    from ner_pytorch_ray.pipelines.graph_ops import components_over_edges
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    def both_dirs(t: pa.Table) -> pa.Table:
        a, b = t.column("a"), t.column("b")
        return pa.table(
            {
                "a": pa.chunked_array([*a.chunks, *b.chunks]),
                "b": pa.chunked_array([*b.chunks, *a.chunks]),
            }
        )

    sym = pairs.map_batches(both_dirs, batch_format="pyarrow")
    comp = components_over_edges(sym, node_type=pa.int64(), max_iters=max_iters)

    def self_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).cast(pa.int64())
        return pa.table({"node": ids, "component": ids})

    unioned = comp.union(
        records.map_batches(self_rows, batch_format="pyarrow")
    )
    out = grouped_sum(
        unioned, keys=["node"], sum_cols=[], min_cols=["component"]
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([id_col, "entity_id"])

    return out.map_batches(rename, batch_format="pyarrow")


def resolve_records(
    records: ray.data.Dataset,
    id_col: str,
    name_col: str,
    attr_cols: list[str] | None = None,
    min_shared: int = 1,
    max_block: int = 10_000,
) -> ray.data.Dataset:
    """End-to-end entity resolution: block -> verify -> components ->
    canonical (id_col, entity_id) assignment covering every record.

    ``min_shared == 1`` needs no cross-block evidence, so candidate
    edges come from :func:`blocked_star_edges` (O(block) star edges,
    identical closure); ``min_shared >= 2`` pays the O(block^2) clique
    expansion that the evidence grouped-sum requires."""
    if min_shared <= 1:
        pairs = blocked_star_edges(
            records, id_col, name_col, attr_cols=attr_cols,
            max_block=max_block,
        ).materialize()
    else:
        pairs = blocked_match_pairs(
            records,
            id_col,
            name_col,
            attr_cols=attr_cols,
            min_shared=min_shared,
            max_block=max_block,
        ).materialize()
    return resolve_entities(records, pairs, id_col)


def part_entity_resolution(sf_dir: str) -> ray.data.Dataset:
    """Registered query: resolve the ``part`` catalog into canonical
    product entities — match = same ``p_size`` and >= 1 shared ``p_name``
    token, entity = transitive closure, canonical id = min p_partkey.
    Returns every part row: (p_partkey, entity_id) sorted by p_partkey."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_size"]
    )
    out = resolve_records(
        ds, id_col="p_partkey", name_col="p_name", attr_cols=["p_size"]
    )
    return out.sort("p_partkey")
