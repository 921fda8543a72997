"""Graph materialization: linked mentions -> canonicalized nodes + deduped,
sorted edges (A4/D6/O8 in SURVEY.md).

Scale design:
  * **Pair generation is shuffle-free**: mentions of one sentence are
    contiguous within a block (mentions_stage contract), so co-sentence
    pairs are emitted inside ``map_batches``.
  * **All aggregations are two-phase**: a partial combine inside
    ``map_batches`` collapses each block to at most |distinct keys| rows
    *before* the shuffle, so the ``groupby`` moves pre-aggregated partials —
    this is the salted/combiner answer to head-entity skew called out in
    BASELINE.json (a hot entity contributes one partial row per block, not
    one row per mention).
  * Final ``sort`` orders edges by (subj, pred, obj) — the output contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

CO_OCCURS = "co_occurs_with"

_EDGE_EMPTY = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("weight", pa.int64()),
        ("sample_url", pa.string()),
    ]
)


def _pairs_partial(batch: pa.Table) -> pa.Table:
    """Co-sentence entity pairs, pre-aggregated within the block.

    Arrow/numpy-native (no pandas round-trip — this is the hottest combiner
    on the KG path): dictionary-encode url/entity once, lexsort to group
    mentions by sentence, generate each sentence's unordered pairs with
    repeat/arange index arithmetic (entity fan-out per sentence is tiny, so
    pair volume is ~k^2 per sentence with small k), then integer-key the
    (subj, obj) groups for the weight count and min-url reduce."""
    t = batch.select(["url", "sent_id", "entity_id"]).combine_chunks()
    t = t.filter(pc.not_equal(t.column("entity_id"), ""))
    if t.num_rows == 0:
        return _EDGE_EMPTY.empty_table()
    u_enc = t.column("url").combine_chunks().dictionary_encode()
    e_enc = t.column("entity_id").combine_chunks().dictionary_encode()
    u = u_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    e = e_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    u_dict = np.asarray(u_enc.dictionary.to_pylist(), dtype=object)
    e_dict = np.asarray(e_enc.dictionary.to_pylist(), dtype=object)
    s = np.asarray(
        t.column("sent_id").combine_chunks().to_numpy(zero_copy_only=False),
        dtype=np.int64,
    )

    # group by sentence, dedup repeated entities within a sentence
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

    # all within-sentence index pairs (i, j>i), fully vectorized
    idx = np.arange(len(u))
    pos = idx - np.repeat(starts, counts)
    reps = np.repeat(counts, counts) - 1 - pos
    total = int(reps.sum())
    if total == 0:
        return _EDGE_EMPTY.empty_table()
    left = np.repeat(idx, reps)
    right = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps) + left + 1

    # order each pair by entity STRING (groupby key semantics), not by
    # dictionary code (first-appearance order)
    e_rank = np.empty(len(e_dict), dtype=np.int64)
    e_rank[np.argsort(e_dict)] = np.arange(len(e_dict))
    ex, ey = e[left], e[right]
    swap = e_rank[ex] > e_rank[ey]
    ex, ey = np.where(swap, ey, ex), np.where(swap, ex, ey)

    # min sample_url by STRING order via url ranks
    u_sorted_ix = np.argsort(u_dict)
    u_rank = np.empty(len(u_dict), dtype=np.int64)
    u_rank[u_sorted_ix] = np.arange(len(u_dict))
    pair_url_rank = u_rank[u[left]]

    key = ex * np.int64(len(e_dict)) + ey
    uniq, inv = np.unique(key, return_inverse=True)
    weight = np.bincount(inv).astype(np.int64)
    min_ur = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(min_ur, inv, pair_url_rank)

    sx = (uniq // len(e_dict)).astype(np.int64)
    sy = (uniq % len(e_dict)).astype(np.int64)
    out_order = np.lexsort((e_rank[sy], e_rank[sx]))  # (subj, obj) string order
    sx, sy, weight, min_ur = (
        sx[out_order], sy[out_order], weight[out_order], min_ur[out_order]
    )
    url_by_rank = u_dict[u_sorted_ix]
    return pa.Table.from_pydict(
        {
            "subj": pa.array(e_dict[sx].tolist(), type=pa.string()),
            "pred": pa.array([CO_OCCURS] * len(sx), type=pa.string()),
            "obj": pa.array(e_dict[sy].tolist(), type=pa.string()),
            "weight": pa.array(weight, type=pa.int64()),
            "sample_url": pa.array(url_by_rank[min_ur].tolist(), type=pa.string()),
        }
    )


def edge_partials_merged(mentions: ray.data.Dataset) -> ray.data.Dataset:
    """linked mentions -> merged (but UNSORTED) edge aggregate rows.

    The aggregates are distributive (sum weight, min sample_url), so these
    rows are also the *mergeable state* of the incremental ingestion path
    (pipelines/incremental.py): partials from disjoint document deltas
    re-aggregate to exactly the batch answer."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    partial = mentions.map_batches(_pairs_partial, batch_format="pyarrow")
    return grouped_sum(
        partial, ["subj", "pred", "obj"], sum_cols=["weight"],
        min_cols=["sample_url"],
    )


def edges_from_linked(mentions: ray.data.Dataset) -> ray.data.Dataset:
    """linked mentions -> (subj, pred, obj, weight, sample_url), deduped,
    sorted by (subj, pred, obj)."""
    return edge_partials_merged(mentions).sort(["subj", "pred", "obj"])


def _nodes_partial(batch: pa.Table) -> pa.Table:
    """Block-local mention counts per (entity, type, surface) — pure Arrow
    (hash group_by), no pandas round-trip."""
    cols = ["entity_id", "tag_type", "surface"]
    t = batch.select(cols)
    t = t.filter(pc.not_equal(t.column("entity_id"), ""))
    g = t.group_by(cols).aggregate([([], "count_all")])
    return g.set_column(
        g.schema.get_field_index("count_all"),
        "n_mentions",
        g.column("count_all").cast(pa.int64()),
    )


def node_partials_merged(mentions: ray.data.Dataset) -> ray.data.Dataset:
    """linked mentions -> merged (UNSORTED) node aggregate rows; mergeable
    incremental state like :func:`edge_partials_merged`."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    partial = mentions.map_batches(_nodes_partial, batch_format="pyarrow")
    return grouped_sum(
        partial, ["entity_id", "tag_type", "surface"], sum_cols=["n_mentions"]
    )


def nodes_from_linked(mentions: ray.data.Dataset) -> ray.data.Dataset:
    """Canonicalization (A4): groupby (entity_id, tag_type, surface) with a
    block-local partial count before the shuffle; sorted output."""
    return node_partials_merged(mentions).sort(
        ["entity_id", "tag_type", "surface"]
    )
