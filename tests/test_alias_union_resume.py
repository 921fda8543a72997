"""Alias-table union (D3/S9) and stage-parquet resume (S5)."""

import os

import pyarrow as pa


def test_union_alias_tables_dedup_first():
    from ner_pytorch_ray.stages.linker import union_alias_tables

    base = pa.Table.from_pylist(
        [
            {"entity_id": "org:spark", "tag_type": "ORG", "surface": "spark"},
            {"entity_id": "loc:stream", "tag_type": "LOC", "surface": "stream"},
        ]
    )
    yago = pa.Table.from_pylist(
        [
            # duplicate surface (case-insensitive) -> base wins
            {"entity_id": "org:SPARK2", "tag_type": "ORG", "surface": "Spark"},
            {"entity_id": "per:alice", "tag_type": "PER", "surface": "alice"},
        ]
    )
    out = union_alias_tables(base, yago)
    rows = {(r["tag_type"], r["surface"].lower()): r["entity_id"]
            for r in out.to_pylist()}
    assert rows == {
        ("ORG", "spark"): "org:spark",
        ("LOC", "stream"): "loc:stream",
        ("PER", "alice"): "per:alice",
    }


def test_materialize_stage_resumes(ray_session, tmp_path):
    import ray.data
    from ner_pytorch_ray.pipelines.adversarial import materialize_stage

    ds = ray.data.range(100)
    stage_dir = str(tmp_path / "stages")
    first = materialize_stage(ds, stage_dir, "s1")
    assert first.count() == 100
    assert os.path.exists(os.path.join(stage_dir, "s1", "_DONE"))

    # resume path must NOT recompute: feed a poisoned dataset — if it
    # executed, it would raise
    def boom(_):
        raise RuntimeError("stage re-executed instead of resuming")

    poisoned = ray.data.range(100).map_batches(boom)
    again = materialize_stage(poisoned, stage_dir, "s1")
    assert again.count() == 100
