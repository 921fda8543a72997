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


# ---------------------------------------------------------------- A6/A7
def _acc_partial(batch: pa.Table, true_col: str, pred_col: str) -> pa.Table:
    """Per-block counters for micro/macro accuracy + hit rate
    (adv_example_eval.py:198-215 semantics):
      micro    — over tokens with true != 'O', fraction pred == true;
      macro    — mean over sentences (with >= 1 non-O token) of the
                 per-sentence non-O accuracy;
      hit rate — fraction of sentences with >= 1 mismatch anywhere."""
    import numpy as np
    import pyarrow.compute as pc

    trues = batch.column(true_col)
    preds = batch.column(pred_col)
    if isinstance(trues, pa.ChunkedArray):
        trues = trues.combine_chunks()
    if isinstance(preds, pa.ChunkedArray):
        preds = preds.combine_chunks()
    lens = pc.list_value_length(trues).to_numpy().astype(np.int64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    ft = np.asarray(pc.list_flatten(trues), dtype=object)
    fp = np.asarray(pc.list_flatten(preds), dtype=object)

    eq = ft == fp
    non_o = ft != "O"
    sent_idx = np.repeat(np.arange(len(lens)), lens)

    correct_non_o = int((eq & non_o).sum())
    total_non_o = int(non_o.sum())

    per_sent_nonO = np.bincount(sent_idx, weights=non_o, minlength=len(lens))
    per_sent_correct = np.bincount(
        sent_idx, weights=(eq & non_o), minlength=len(lens)
    )
    has_nonO = per_sent_nonO > 0
    # per-sentence accuracies accumulate as integer billionths: float
    # summation order across blocks/merges cannot move the total
    macro_sum = int(
        np.rint(
            1_000_000_000
            * per_sent_correct[has_nonO]
            / per_sent_nonO[has_nonO]
        ).sum()
    )
    macro_n = int(has_nonO.sum())

    per_sent_err = np.bincount(sent_idx, weights=~eq, minlength=len(lens))
    hits = int((per_sent_err > 0).sum())

    return pa.Table.from_pydict(
        {
            "correct_non_o": pa.array([correct_non_o], type=pa.int64()),
            "total_non_o": pa.array([total_non_o], type=pa.int64()),
            "macro_sum": pa.array([macro_sum], type=pa.int64()),
            "macro_n": pa.array([macro_n], type=pa.int64()),
            "hit_sentences": pa.array([hits], type=pa.int64()),
            "n_sentences": pa.array([len(lens)], type=pa.int64()),
        }
    )


def tag_accuracy_metrics(
    ds: ray.data.Dataset,
    true_col: str = "tags_true",
    pred_col: str = "tags_pred",
) -> dict:
    """Micro/macro non-O tag accuracy + hit rate (A7), distributive."""
    partials = ds.map_batches(
        lambda b: _acc_partial(b, true_col, pred_col), batch_format="pyarrow"
    )
    tot = {
        "correct_non_o": 0,
        "total_non_o": 0,
        "macro_sum": 0,
        "macro_n": 0,
        "hit_sentences": 0,
        "n_sentences": 0,
    }
    for b in partials.iter_batches(batch_format="pyarrow"):
        for k in tot:
            tot[k] += sum(b.column(k).to_pylist())
    return {
        "micro_acc": (
            tot["correct_non_o"] / tot["total_non_o"]
            if tot["total_non_o"]
            else float("nan")
        ),
        "macro_acc": (
            tot["macro_sum"] / 1_000_000_000 / tot["macro_n"]
            if tot["macro_n"]
            else float("nan")
        ),
        "hit_rate": (
            tot["hit_sentences"] / tot["n_sentences"]
            if tot["n_sentences"]
            else float("nan")
        ),
        "n_sentences": tot["n_sentences"],
    }


def confusion_matrix(
    ds: ray.data.Dataset,
    true_col: str = "tags_true",
    pred_col: str = "tags_pred",
) -> ray.data.Dataset:
    """(true_tag, pred_tag, n) counts (A6, train.py:221,253,260-270) as a
    sorted Dataset: block-local value_counts over the joined tag pair, then
    a tiny grouped sum."""
    import pyarrow.compute as pc

    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    def partial(batch: pa.Table) -> pa.Table:
        trues = batch.column(true_col)
        preds = batch.column(pred_col)
        if isinstance(trues, pa.ChunkedArray):
            trues = trues.combine_chunks()
        if isinstance(preds, pa.ChunkedArray):
            preds = preds.combine_chunks()
        ft = pc.list_flatten(trues)
        fp = pc.list_flatten(preds)
        key = pc.binary_join_element_wise(ft, fp, "\x00")
        vc = key.value_counts()
        pairs = vc.field("values").to_pylist()
        split = [p.split("\x00", 1) for p in pairs]
        return pa.Table.from_pydict(
            {
                "true_tag": pa.array([s[0] for s in split], type=pa.string()),
                "pred_tag": pa.array([s[1] for s in split], type=pa.string()),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    merged = grouped_sum(partials, ["true_tag", "pred_tag"], sum_cols=["n"])
    return merged.sort(["true_tag", "pred_tag"])


# ------------------------------------------------------------------- S7
def predictions_table(
    ds: ray.data.Dataset,
    true_col: str = "tags_true",
    pred_col: str = "tags_pred",
) -> ray.data.Dataset:
    """Token-level prediction rows (url, sent_id, position, token, true,
    pred) — the engine's S7 sink shape (eval.py:157-163 wrote `word true
    pred` lines; key columns replace line order). Pair with
    ``.write_parquet(out)``."""
    import numpy as np
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        toks = batch.column("tokens")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        row_idx = np.repeat(np.arange(len(lens)), lens)
        offs = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            offs[:-1], lens
        )
        take = pa.array(row_idx)
        return pa.Table.from_pydict(
            {
                "url": pc.take(batch.column("url"), take),
                "sent_id": pc.take(batch.column("sent_id"), take),
                "position": pa.array(pos),
                "token": pc.list_flatten(toks),
                "true": pc.list_flatten(batch.column(true_col)),
                "pred": pc.list_flatten(batch.column(pred_col)),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")
