"""Fuzzy surface-form matching — edit-distance-bounded candidate pairs
over a surface/vocabulary table, the alias-candidate-generation step of
entity canonicalization.

Reference analogue: the linker's alias bank matches mention surfaces
EXACTLY (``word_rep.py`` keys chunks by the lower-cased joined surface,
``word_rep.py:123``); at web scale the same entity arrives with typos and
spelling variants ("googel", "gogle"), so canonicalization needs the
near-miss pairs too. This module finds every surface pair within
Levenshtein distance ``max_dist`` WITHOUT an all-pairs comparison, using
FastSS deletion-neighborhood blocking (Bocek et al. 2007, public):

1. **DISTINCT** — reduce the corpus to its distinct surfaces first
   (grouped sum over 16-byte-ish tokens); everything after runs over the
   vocabulary, never the corpus.
2. **BLOCK** — each surface emits every string reachable by deleting up
   to ``max_dist`` characters (its deletion neighborhood). If
   ``ed(a, b) <= k`` then deleting the <= k positions touched by the edit
   script from each side yields a COMMON string, so two surfaces within
   distance k always share a neighborhood key: candidate recall is 100%
   by construction.
3. **PAIR** — per neighborhood bucket, bounded all-pairs over the
   distinct member surfaces; buckets larger than ``max_bucket`` raise
   (the triangles hub-guard stance — at scale the right fix is a longer
   ``min_len`` or an attribute-qualified key, not a silent partial
   answer). Pairs sharing several variants dedupe in one grouped union.
4. **VERIFY** — shared variant only proves ``ed <= 2k``; an exact banded
   Levenshtein DP per candidate pair (candidates, not corpus) keeps the
   pairs truly within ``max_dist``.

Cost model at scale: a surface of length L emits O(L^k) variant rows of
short strings — linear in vocabulary size for fixed k, never quadratic in
corpus; the quadratic step is confined to buckets, which the guard bounds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_PAIR_SCHEMA = pa.schema(
    [("surf_a", pa.string()), ("surf_b", pa.string()), ("one", pa.int64())]
)

_OUT_SCHEMA = pa.schema(
    [("surf_a", pa.string()), ("surf_b", pa.string()), ("dist", pa.int64())]
)


def deletion_neighborhood(s: str, k: int) -> set[str]:
    """All strings reachable from ``s`` by deleting up to ``k`` chars
    (including ``s`` itself). Size O(len(s)^k) for fixed k."""
    frontier = {s}
    out = {s}
    for _ in range(k):
        nxt = set()
        for v in frontier:
            for i in range(len(v)):
                nxt.add(v[:i] + v[i + 1 :])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def levenshtein(a: str, b: str, cap: int) -> int:
    """Banded Levenshtein DP with early exit: returns min(ed(a, b), cap+1).
    O(len * cap) per pair — runs only on blocked candidates."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cur = [j] + [0] * la
        best = j
        for i in range(1, la + 1):
            c = min(
                prev[i] + 1,
                cur[i - 1] + 1,
                prev[i - 1] + (a[i - 1] != b[j - 1]),
            )
            cur[i] = c
            if c < best:
                best = c
        if best > cap:
            return cap + 1
        prev = cur
    return prev[la]


def fuzzy_surface_pairs(
    surfaces: ray.data.Dataset,
    surface_col: str = "surface",
    max_dist: int = 2,
    min_len: int = 1,
    max_len: int = 64,
    max_bucket: int = 10_000,
) -> ray.data.Dataset:
    """(surf_a, surf_b, dist) for every DISTINCT surface pair with
    ``levenshtein(surf_a, surf_b) <= max_dist`` and both lengths in
    ``[min_len, max_len]``; surf_a < surf_b, sorted. See module
    docstring for the blocking scheme and its exact-recall argument.

    ``max_len`` is part of the operator SPEC, not a silent cap: the
    deletion neighborhood is O(L^k) per surface, so a pathological
    1000-char token would emit ~1e6 variant rows; surfaces longer than
    ``max_len`` are excluded by definition (the SQL oracle applies the
    identical bound), mirroring how alias canonicalization treats
    over-long garbage tokens."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
        grouped_sum,
    )

    def distinct_rows(batch: pa.Table) -> pa.Table:
        col = batch.column(surface_col)
        ln = pc.utf8_length(col)
        col = col.filter(
            pc.and_(
                pc.greater_equal(ln, pa.scalar(min_len)),
                pc.less_equal(ln, pa.scalar(max_len)),
            )
        )
        uniq = col.unique()
        return pa.table(
            {"surface": uniq, "one": pa.array(np.ones(len(uniq), np.int64))}
        )

    distinct = grouped_sum(
        surfaces.map_batches(distinct_rows, batch_format="pyarrow"),
        keys=["surface"],
        sum_cols=["one"],
    ).select_columns(["surface"])

    def variant_rows(batch: pa.Table) -> pa.Table:
        # Python loop over DISTINCT surfaces only (the corpus was already
        # reduced above); per-surface work is the O(L^k) neighborhood.
        variants: list[str] = []
        owners: list[str] = []
        for s in batch.column("surface").to_pylist():
            for v in deletion_neighborhood(s, max_dist):
                variants.append(v)
                owners.append(s)
        return pa.table(
            {
                "variant": pa.array(variants, type=pa.string()),
                "surface": pa.array(owners, type=pa.string()),
            }
        )

    buckets = collect_tuples(
        distinct.map_batches(variant_rows, batch_format="pyarrow"),
        ["variant"],
        ["surface"],
    )

    def gen_pairs(key, items) -> pa.Table:
        if items is None:
            return _PAIR_SCHEMA.empty_table()
        uniq = sorted({s for (s,) in items})
        if len(uniq) < 2:
            return _PAIR_SCHEMA.empty_table()
        if len(uniq) > max_bucket:
            raise ValueError(
                f"deletion-neighborhood bucket {key!r} has {len(uniq)} "
                f"surfaces (max_bucket={max_bucket}); raise min_len or "
                "qualify the blocking key instead of comparing a hot "
                "bucket all-pairs"
            )
        ai, bi = np.triu_indices(len(uniq), k=1)
        arr = np.array(uniq, dtype=object)
        return pa.Table.from_arrays(
            [
                pa.array(arr[ai], type=pa.string()),
                pa.array(arr[bi], type=pa.string()),
                pa.array(np.ones(len(ai), dtype=np.int64)),
            ],
            schema=_PAIR_SCHEMA,
        )

    candidates = grouped_sum(
        flat_map_groups(buckets, gen_pairs, ["variant"]),
        keys=["surf_a", "surf_b"],
        sum_cols=["one"],
    ).select_columns(["surf_a", "surf_b"])

    def verify(batch: pa.Table) -> pa.Table:
        aa = batch.column("surf_a").to_pylist()
        bb = batch.column("surf_b").to_pylist()
        dists = [levenshtein(a, b, max_dist) for a, b in zip(aa, bb)]
        keep = [i for i, d in enumerate(dists) if d <= max_dist]
        return pa.Table.from_arrays(
            [
                pa.array([aa[i] for i in keep], type=pa.string()),
                pa.array([bb[i] for i in keep], type=pa.string()),
                pa.array([dists[i] for i in keep], type=pa.int64()),
            ],
            schema=_OUT_SCHEMA,
        )

    return candidates.map_batches(verify, batch_format="pyarrow").sort(
        ["surf_a", "surf_b"]
    )


def _vocab_dataset(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )

    def token_rows(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(batch.column("text"), pattern=" ")
        )
        return pa.table({"surface": toks})

    return ds.map_batches(token_rows, batch_format="pyarrow")


def surface_fuzzy_pairs(sf_dir: str, max_dist: int = 2) -> ray.data.Dataset:
    """Edit-distance-<=``max_dist`` pairs over the documents vocabulary
    (whitespace tokens) — the registered-query entry point."""
    return fuzzy_surface_pairs(_vocab_dataset(sf_dir), max_dist=max_dist)


def fuzzy_canonical_clusters(
    pairs: ray.data.Dataset, max_iters: int = 50
) -> ray.data.Dataset:
    """(surface, canonical) for every surface that participates in at
    least one fuzzy pair: surfaces within edit distance of each other
    chain into connected components (hash-min label propagation over the
    symmetrized pair table — :func:`components_over_edges` with STRING
    node ids), canonical = lexicographic min surface of the component.

    This is the surface-canonicalization step the KG node table needs
    when the same entity arrives with typos: the pair stage proposes
    near-misses, the closure merges chains ("googel"~"google"~"googly")
    even when the chain's endpoints exceed ``max_dist``. Unpaired
    surfaces are their own canonical and are deliberately NOT emitted —
    at web scale the vocabulary is ~1e8 rows of self-maps while the
    merged clusters are the small interesting output."""
    from ner_pytorch_ray.pipelines.graph_ops import components_over_edges

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch.column("surf_a")
        b = batch.column("surf_b")
        return pa.table(
            {
                "a": pa.concat_arrays(
                    [a.combine_chunks(), b.combine_chunks()]
                ),
                "b": pa.concat_arrays(
                    [b.combine_chunks(), a.combine_chunks()]
                ),
            }
        )

    comp = components_over_edges(
        pairs.map_batches(symmetrize, batch_format="pyarrow"),
        node_type=pa.string(),
        max_iters=max_iters,
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["surface", "canonical"])

    return comp.map_batches(rename, batch_format="pyarrow").sort(
        ["canonical", "surface"]
    )


def fuzzy_canonical_map(sf_dir: str, max_dist: int = 1) -> ray.data.Dataset:
    """Registered-query entry point: canonicalize the documents
    vocabulary by edit-distance-``max_dist`` clusters."""
    return fuzzy_canonical_clusters(
        surface_fuzzy_pairs(sf_dir, max_dist=max_dist)
    )
