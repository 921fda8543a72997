"""Train-support operators: singleton UNK-ing (M6), prediction sink (S7),
per-group top-k (O4), O-run PPDB rewrite stage (C4)."""

import numpy as np
import pyarrow as pa


def test_insert_singletons_seeded(ray_session):
    import ray.data
    from ner_pytorch_ray.stages.encode import insert_singletons_stage

    rows = pa.Table.from_pydict(
        {
            "url": pa.array([f"u{i}" for i in range(50)], type=pa.string()),
            "sent_id": pa.array(range(50), type=pa.int64()),
            "word_ids": pa.array(
                [[5, 9, 7, 9, 3]] * 50, type=pa.list_(pa.int32())
            ),
        }
    )
    ds = ray.data.from_arrow(rows)
    out = insert_singletons_stage(
        ds, singleton_ids={9}, unk_id=1, p=0.5, seed=0
    ).take_all()
    got = {r["url"]: r["word_ids"] for r in out}
    # non-singletons untouched
    for w in got.values():
        assert w[0] == 5 and w[2] == 7 and w[4] == 3
        assert all(x in (9, 1) for x in (w[1], w[3]))
    # some replaced, some kept (p=0.5 over 100 draws)
    flat = [x for w in got.values() for x in (w[1], w[3])]
    assert 10 < flat.count(1) < 90
    # deterministic across re-execution and partitioning
    again = insert_singletons_stage(
        ray.data.from_arrow(rows).repartition(7),
        singleton_ids={9}, unk_id=1, p=0.5, seed=0,
    ).take_all()
    assert {r["url"]: r["word_ids"] for r in again} == got


def test_predictions_table_explodes(ray_session):
    import ray.data
    from ner_pytorch_ray.stages.evaluate import predictions_table

    ds = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "url": pa.array(["u1", "u2"], type=pa.string()),
                "sent_id": pa.array([0, 4], type=pa.int64()),
                "tokens": pa.array(
                    [["a", "b"], ["c"]], type=pa.list_(pa.string())
                ),
                "tags_true": pa.array(
                    [["O", "S-ORG"], ["O"]], type=pa.list_(pa.string())
                ),
                "tags_pred": pa.array(
                    [["O", "O"], ["S-PER"]], type=pa.list_(pa.string())
                ),
            }
        )
    )
    rows = sorted(
        predictions_table(ds).take_all(),
        key=lambda r: (r["url"], r["sent_id"], r["position"]),
    )
    assert [
        (r["url"], r["position"], r["token"], r["true"], r["pred"])
        for r in rows
    ] == [
        ("u1", 0, "a", "O", "O"),
        ("u1", 1, "b", "S-ORG", "O"),
        ("u2", 0, "c", "O", "S-PER"),
    ]


def test_topk_by_group(ray_session):
    import ray.data
    from ner_pytorch_ray.stages.groupby_utils import topk_by_group

    items = []
    for sid in range(3):
        for vid in range(6):
            items.append(
                {
                    "url": "u",
                    "sent_id": sid,
                    "variant_id": vid,
                    "loss": float((vid * 7 + sid) % 10),
                }
            )
    ds = ray.data.from_items(items).repartition(5)
    out = topk_by_group(
        ds, ["url", "sent_id"], "loss", "variant_id", k=2, descending=True
    ).take_all()
    assert len(out) == 6  # 3 groups x k=2
    for sid in range(3):
        grp = sorted(
            [r for r in out if r["sent_id"] == sid], key=lambda r: r["rank"]
        )
        losses = [(r["loss"], r["variant_id"]) for r in grp]
        want = sorted(
            [(float((v * 7 + sid) % 10), v) for v in range(6)],
            key=lambda x: (-x[0], x[1]),
        )[:2]
        assert losses == want


def test_ppdb_orun_stage(ray_session):
    import ray.data
    from ner_pytorch_ray.pipelines.adversarial import ppdb_orun_stage

    ds = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "url": pa.array(["u1", "u2"], type=pa.string()),
                "sent_id": pa.array([0, 0], type=pa.int64()),
                "tokens": pa.array(
                    [["spark", "is", "fast"], ["spark"]],
                    type=pa.list_(pa.string()),
                ),
                "tags": pa.array(
                    [["S-ORG", "O", "O"], ["S-ORG"]],
                    type=pa.list_(pa.string()),
                ),
            }
        )
    )
    out = ppdb_orun_stage(
        ds, {"fast": {"quick"}}
    ).take_all()
    # only the changed sentence emits; entity untouched, O-run rewritten
    assert len(out) == 1
    assert out[0]["url"] == "u1"
    assert out[0]["tokens"] == ["spark", "is", "quick"]
    assert out[0]["tags"] == ["S-ORG", "O", "O"]
