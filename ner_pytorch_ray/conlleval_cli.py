"""conlleval CLI parity (/root/reference/conlleval.py:231-235): read
`token true pred` lines from stdin (blank line = sentence boundary, tags =
last two whitespace fields) and print overall + per-type P/R/F1.

    python -m ner_pytorch_ray.conlleval_cli < predictions.txt

Output is a compact `key value` report rather than the reference's
table layout — the numbers are the pinned contract (functions/conlleval.py
is differential-tested against the reference implementation)."""

from __future__ import annotations

import sys

from ner_pytorch_ray.functions.conlleval import (
    ChunkCounts,
    count_chunks,
    evaluate_counts,
)


def evaluate_lines(lines) -> dict:
    total = ChunkCounts()
    true_tags: list[str] = []
    pred_tags: list[str] = []
    for line in lines:
        line = line.rstrip("\n")
        if not line.strip():
            if true_tags:
                total.merge(count_chunks(true_tags, pred_tags))
                true_tags, pred_tags = [], []
            continue
        parts = line.split()
        true_tags.append(parts[-2])
        pred_tags.append(parts[-1])
    if true_tags:
        total.merge(count_chunks(true_tags, pred_tags))
    return evaluate_counts(total)


def main() -> int:
    m = evaluate_lines(sys.stdin)
    print(f"accuracy {m['accuracy']:.2f}")
    print(f"precision {m['precision']:.2f}")
    print(f"recall {m['recall']:.2f}")
    print(f"f1 {m['f1']:.2f}")
    for typ, (p, r, f) in sorted(m["per_type"].items()):
        print(f"{typ} precision {p:.2f} recall {r:.2f} f1 {f:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
