"""Distributed conlleval (A5): per-block partial counters -> driver merge.

The reference scores the whole corpus in one pass (conlleval.py:85-212,
train.py:211-271). Here each block of (tags_true, tags_pred) sentence pairs
produces one tiny counter row inside ``map_batches``; the driver merges
counter rows (distributive) and finalizes P/R/F1 — no shuffle, no
materialization of the scored corpus.
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data

from ner_pytorch_ray.functions.conlleval import (
    ChunkCounts,
    count_chunks,
    evaluate_counts,
)


def _partial_counts(
    batch: pa.Table, true_col: str, pred_col: str
) -> pa.Table:
    c = ChunkCounts()
    trues = batch.column(true_col).to_pylist()
    preds = batch.column(pred_col).to_pylist()
    for t, p in zip(trues, preds):
        c.merge(count_chunks(t, p))
    return pa.Table.from_pydict({"counts_json": [json.dumps(c.to_lists())]})


def conlleval_score(
    ds: ray.data.Dataset, true_col: str = "tags_true", pred_col: str = "tags_pred"
) -> dict:
    """Span-level P/R/F1 over a dataset of tagged sentence pairs."""
    partials = ds.map_batches(
        lambda b: _partial_counts(b, true_col, pred_col), batch_format="pyarrow"
    )
    total = ChunkCounts()
    for b in partials.iter_batches(batch_format="pyarrow"):
        for s in b.column("counts_json").to_pylist():
            total.merge(ChunkCounts.from_lists(json.loads(s)))
    return evaluate_counts(total)
