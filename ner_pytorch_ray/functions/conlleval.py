"""Distributive conlleval: span-level P/R/F1 as mergeable partial counters.

Reference semantics: /root/reference/conlleval.py:85-212 (count_chunks,
calc_metrics). The reference walks the whole corpus in one process; here the
same chunk-boundary algebra runs per sentence inside ``map_batches`` and the
resulting counters are summed (they are distributive — SURVEY.md §2.5 A5),
so F1 finalization happens on the driver over tiny state.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

from ner_pytorch_ray.functions.spans import split_tag, is_chunk_start, is_chunk_end


@dataclass
class ChunkCounts:
    """Mergeable conlleval counters (per chunk type + per tag)."""

    correct_chunks: dict = field(default_factory=lambda: defaultdict(int))
    true_chunks: dict = field(default_factory=lambda: defaultdict(int))
    pred_chunks: dict = field(default_factory=lambda: defaultdict(int))
    correct_tags: int = 0
    total_tags: int = 0

    def merge(self, other: "ChunkCounts") -> "ChunkCounts":
        for k, v in other.correct_chunks.items():
            self.correct_chunks[k] += v
        for k, v in other.true_chunks.items():
            self.true_chunks[k] += v
        for k, v in other.pred_chunks.items():
            self.pred_chunks[k] += v
        self.correct_tags += other.correct_tags
        self.total_tags += other.total_tags
        return self

    def to_lists(self) -> dict:
        """Arrow-friendly representation for shipping through a Dataset."""
        keys = sorted(
            set(self.correct_chunks) | set(self.true_chunks) | set(self.pred_chunks)
        )
        return {
            "types": keys,
            "correct": [self.correct_chunks[k] for k in keys],
            "true": [self.true_chunks[k] for k in keys],
            "pred": [self.pred_chunks[k] for k in keys],
            "correct_tags": self.correct_tags,
            "total_tags": self.total_tags,
        }

    @staticmethod
    def from_lists(d: dict) -> "ChunkCounts":
        c = ChunkCounts()
        for k, a, b, p in zip(d["types"], d["correct"], d["true"], d["pred"]):
            c.correct_chunks[k] += a
            c.true_chunks[k] += b
            c.pred_chunks[k] += p
        c.correct_tags = d["correct_tags"]
        c.total_tags = d["total_tags"]
        return c


def count_chunks(true_seq: list[str], pred_seq: list[str]) -> ChunkCounts:
    """Per-sentence conlleval counting (reference conlleval.py:99-158).

    The reference feeds whole-corpus concatenated sequences with sentence
    boundaries marked by 'O' resets; calling this per sentence and merging is
    equivalent because the walk state resets at sentence starts.
    """
    c = ChunkCounts()
    prev_true, prev_pred = "O", "O"
    correct_chunk: str | None = None

    for true_tag, pred_tag in zip(true_seq, pred_seq):
        if true_tag == pred_tag:
            c.correct_tags += 1
        c.total_tags += 1

        _, true_type = split_tag(true_tag)
        _, pred_type = split_tag(pred_tag)

        if correct_chunk is not None:
            true_end = is_chunk_end(prev_true, true_tag)
            pred_end = is_chunk_end(prev_pred, pred_tag)
            if pred_end and true_end:
                c.correct_chunks[correct_chunk] += 1
                correct_chunk = None
            elif pred_end != true_end or true_type != pred_type:
                correct_chunk = None

        true_start = is_chunk_start(prev_true, true_tag)
        pred_start = is_chunk_start(prev_pred, pred_tag)
        if true_start and pred_start and true_type == pred_type:
            correct_chunk = true_type
        if true_start:
            c.true_chunks[true_type] += 1
        if pred_start:
            c.pred_chunks[pred_type] += 1

        prev_true, prev_pred = true_tag, pred_tag

    if correct_chunk is not None:
        c.correct_chunks[correct_chunk] += 1
    return c


def calc_metrics(tp: int, p: int, t: int, percent: bool = True):
    """P/R/F1 from counts (reference conlleval.py:85-96)."""
    precision = tp / p if p else 0
    recall = tp / t if t else 0
    fb1 = (
        2 * precision * recall / (precision + recall) if precision + recall else 0
    )
    if percent:
        return 100 * precision, 100 * recall, 100 * fb1
    return precision, recall, fb1


def evaluate_counts(c: ChunkCounts) -> dict:
    """Final metrics from merged counters: overall + per-type P/R/F1."""
    tp = sum(c.correct_chunks.values())
    p = sum(c.pred_chunks.values())
    t = sum(c.true_chunks.values())
    prec, rec, f1 = calc_metrics(tp, p, t)
    per_type = {}
    for typ in sorted(set(c.true_chunks) | set(c.pred_chunks)):
        per_type[typ] = calc_metrics(
            c.correct_chunks[typ], c.pred_chunks[typ], c.true_chunks[typ]
        )
    return {
        "precision": prec,
        "recall": rec,
        "f1": f1,
        "accuracy": 100 * c.correct_tags / c.total_tags if c.total_tags else 0,
        "per_type": per_type,
    }
