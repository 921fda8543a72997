"""Multimodal plumbing: binary payload columns through an actor-pool stage."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_media_features_deterministic(ray_session):
    from ner_pytorch_ray.pipelines.multimodal import (
        synthesize_media_from_documents,
        media_features,
    )

    media = synthesize_media_from_documents(SF)
    out = media_features(media, feature_dim=8, fake_decode=True, batch_size=32)
    rows = sorted(out.take_all(), key=lambda r: r["media_id"])
    assert len(rows) == 500
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(0.0 <= v <= 1.0 for v in rows[0]["feature"])
    # deterministic across re-execution
    rows2 = sorted(
        media_features(
            synthesize_media_from_documents(SF), feature_dim=8, batch_size=17
        ).take_all(),
        key=lambda r: r["media_id"],
    )
    assert [r["feature"] for r in rows] == [r["feature"] for r in rows2]


def test_media_real_decode_is_marked_stub(ray_session):
    from ner_pytorch_ray.pipelines.multimodal import MediaFeatureActor

    actor = MediaFeatureActor(fake_decode=False)
    with pytest.raises(NotImplementedError, match="decode"):
        actor._decode_real(b"xx", "image")
