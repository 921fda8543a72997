"""A6/A7 metrics vs a per-sentence oracle mirroring
adv_example_eval.py:161-215 (pandas reference semantics)."""

import numpy as np
import pyarrow as pa


def _pairs_ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "tags_true": pa.array(
                    [r[0] for r in rows], type=pa.list_(pa.string())
                ),
                "tags_pred": pa.array(
                    [r[1] for r in rows], type=pa.list_(pa.string())
                ),
            }
        )
    )


def _oracle(rows):
    """Direct transliteration of the reference's evaluating_batch tail."""
    adv = 0
    macro = []
    t_all, p_all = [], []
    for true_tags, pred_tags in rows:
        t_all.extend(true_tags)
        p_all.extend(pred_tags)
        if sum(t != p for t, p in zip(true_tags, pred_tags)) > 0:
            adv += 1
        pairs = [(t, p) for t, p in zip(true_tags, pred_tags) if t != "O"]
        if pairs:
            macro.append(sum(t == p for t, p in pairs) / len(pairs))
    pairs_all = [(t, p) for t, p in zip(t_all, p_all) if t != "O"]
    return {
        "micro_acc": sum(t == p for t, p in pairs_all) / len(pairs_all),
        "macro_acc": float(np.mean(macro)),
        "hit_rate": adv / len(rows),
    }


ROWS = [
    (["S-ORG", "O", "B-LOC", "E-LOC"], ["S-ORG", "O", "B-LOC", "S-PER"]),
    (["O", "O"], ["O", "S-ORG"]),
    (["S-PER", "O"], ["S-PER", "O"]),
    (["B-ORG", "E-ORG", "O"], ["O", "E-ORG", "O"]),
]


def test_metrics_match_reference_oracle(ray_session):
    from ner_pytorch_ray.stages.evaluate import tag_accuracy_metrics

    got = tag_accuracy_metrics(_pairs_ds(ROWS))
    want = _oracle(ROWS)
    for k, v in want.items():
        # macro_acc accumulates per-sentence ratios as integer billionths
        # (summation-order independence); tolerance covers the quantization
        assert abs(got[k] - v) < 2e-9, (k, got[k], v)
    assert got["n_sentences"] == len(ROWS)


def test_metrics_partition_invariant(ray_session):
    from ner_pytorch_ray.stages.evaluate import tag_accuracy_metrics

    many = ROWS * 25
    a = tag_accuracy_metrics(_pairs_ds(many))
    b = tag_accuracy_metrics(_pairs_ds(many).repartition(7))
    for k in ("micro_acc", "macro_acc", "hit_rate"):
        assert abs(a[k] - b[k]) < 2e-9


def test_confusion_matrix_counts(ray_session):
    from ner_pytorch_ray.stages.evaluate import confusion_matrix

    out = {
        (r["true_tag"], r["pred_tag"]): r["n"]
        for r in confusion_matrix(_pairs_ds(ROWS)).take_all()
    }
    # oracle: plain Counter over flattened pairs
    from collections import Counter

    want = Counter()
    for t, p in ROWS:
        for a, b in zip(t, p):
            want[(a, b)] += 1
    assert out == dict(want)
