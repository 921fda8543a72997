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


def test_frame_sample_offsets_and_payload(ray_session):
    from ner_pytorch_ray.pipelines.multimodal import (
        frame_sample,
        synthesize_video_from_documents,
    )

    video = synthesize_video_from_documents("/root/testdata/sf0.001")
    clips = {r["media_id"]: r for r in video.take_all()}
    frames = frame_sample(video).take_all()
    assert frames
    per_clip = {}
    for f in frames:
        clip = clips[f["media_id"]]
        assert f["byte_offset"] == f["frame_idx"] * 256
        assert f["frame_payload"] == clip["payload"][
            f["byte_offset"] : f["byte_offset"] + 256
        ]
        per_clip[f["media_id"]] = per_clip.get(f["media_id"], 0) + 1
    assert max(per_clip.values()) <= 4  # max_frames cap


def test_frame_sample_real_backend_is_marked_stub(ray_session):
    import pytest as _pytest

    from ner_pytorch_ray.pipelines.multimodal import FrameSampleActor

    actor = FrameSampleActor(fake_decode=False)
    import pyarrow as pa

    with _pytest.raises(NotImplementedError):
        actor(pa.Table.from_pydict({"media_id": [1], "payload": [b"x"],
                                    "n_frames": [1]}))


def test_audio_window_features_deterministic(ray_session):
    from ner_pytorch_ray.pipelines.multimodal import (
        audio_window_features,
        synthesize_media_from_documents,
    )

    audio = synthesize_media_from_documents("/root/testdata/sf0.001", kind="audio")
    a = {(r["media_id"], r["window_id"]): r["feature"]
         for r in audio_window_features(audio).take_all()}
    b = {(r["media_id"], r["window_id"]): r["feature"]
         for r in audio_window_features(audio).take_all()}
    assert a == b and len(a) > 0
    assert all(len(f) == 8 for f in a.values())
