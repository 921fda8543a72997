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
import pandas as pd
import pyarrow as pa

import ray.data

CO_OCCURS = "co_occurs_with"


def _pairs_partial(batch: pa.Table) -> pa.Table:
    """Co-sentence entity pairs, pre-aggregated within the block."""
    df = batch.select(["url", "sent_id", "entity_id"]).to_pandas()
    df = df[df["entity_id"] != ""]
    if df.empty:
        return pa.Table.from_pydict(
            {
                "subj": pa.array([], type=pa.string()),
                "pred": pa.array([], type=pa.string()),
                "obj": pa.array([], type=pa.string()),
                "weight": pa.array([], type=pa.int64()),
                "sample_url": pa.array([], type=pa.string()),
            }
        )
    # distinct entities per sentence, then a vectorized self-merge: one row
    # per (sentence, unordered entity pair) — entity fan-out per sentence is
    # small, so the merge is ~k^2 per sentence with tiny k
    df = df.drop_duplicates(["url", "sent_id", "entity_id"])
    m = df.merge(df, on=["url", "sent_id"])
    m = m[m["entity_id_x"] < m["entity_id_y"]]
    if m.empty:
        g = pd.DataFrame(
            {"entity_id_x": [], "entity_id_y": [], "weight": [], "sample_url": []}
        )
    else:
        g = (
            m.groupby(["entity_id_x", "entity_id_y"], sort=True)
            .agg(weight=("url", "size"), sample_url=("url", "min"))
            .reset_index()
        )
    return pa.Table.from_pydict(
        {
            "subj": pa.array(g["entity_id_x"], type=pa.string()),
            "pred": pa.array([CO_OCCURS] * len(g), type=pa.string()),
            "obj": pa.array(g["entity_id_y"], type=pa.string()),
            "weight": pa.array(g["weight"].to_numpy(dtype=np.int64)
                               if len(g) else [], type=pa.int64()),
            "sample_url": pa.array(g["sample_url"], type=pa.string()),
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
    cols = ["entity_id", "tag_type", "surface"]
    df = batch.select(cols).to_pandas()
    df = df[df["entity_id"] != ""]
    g = df.groupby(cols, sort=True, as_index=False).size()
    return pa.Table.from_pydict(
        {
            "entity_id": pa.array(g["entity_id"], type=pa.string()),
            "tag_type": pa.array(g["tag_type"], type=pa.string()),
            "surface": pa.array(g["surface"], type=pa.string()),
            "n_mentions": pa.array(g["size"].to_numpy(), type=pa.int64()),
        }
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
