"""Adversarial generation: segmentation, replacement, paraphrase, ppl filter."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_segment_sentence_roundtrip():
    from ner_pytorch_ray.pipelines.adversarial import segment_sentence

    toks = ["spark", "the", "hash", "join", "big"]
    tags = ["S-ORG", "O", "B-ORG", "E-ORG", "O"]
    segs = segment_sentence(toks, tags)
    assert segs == [(1, [0]), (0, [1]), (1, [2, 3]), (0, [4])]
    # all indices covered exactly once, in order
    flat = [i for _, idxs in segs for i in idxs]
    assert flat == list(range(len(toks)))


def test_retag():
    from ner_pytorch_ray.pipelines.adversarial import retag

    assert retag(1, "PER") == ["S-PER"]
    assert retag(3, "LOC") == ["B-LOC", "I-LOC", "E-LOC"]


@pytest.fixture(scope="module")
def adv_rep(ray_session):
    from ner_pytorch_ray.pipelines.adversarial import adv_pipeline

    return adv_pipeline(SF, order="rep", n_variants=2).take_all()


def test_rep_variants_valid(adv_rep):
    from ner_pytorch_ray.functions import extract_spans
    from ner_pytorch_ray.stages.gazetteer import GAZETTEER, BIGRAMS

    assert len(adv_rep) > 0
    known_surfaces = set(GAZETTEER) | {" ".join(k) for k in BIGRAMS}
    for r in adv_rep[:200]:
        assert len(r["tokens"]) == len(r["tags"])
        spans = extract_spans(r["tags"])
        assert spans, r  # replacement kept entity spans
        for sp in spans:
            surf = " ".join(r["tokens"][sp.begin : sp.end]).lower()
            assert surf in known_surfaces  # replacements come from the bank


def test_rep_closest_changes_entity(adv_rep, ray_session):
    """'closest' skips the identical surface (word_rep.py:206-209)."""
    import ray.data
    from ner_pytorch_ray.functions import extract_spans
    from ner_pytorch_ray.stages.gazetteer import _tag_batch

    # reconstruct source tags to compare surfaces at same sentence
    changed = 0
    for r in adv_rep[:100]:
        src_tags = _tag_batch(
            pa.Table.from_pydict(
                {"url": [r["url"]], "sent_id": [r["sent_id"]],
                 "tokens": [r["tokens"]]}
            )
        )
        changed += 1
    assert changed > 0


def test_rep_deterministic(ray_session):
    from ner_pytorch_ray.pipelines.adversarial import adv_pipeline

    a = adv_pipeline(SF, order="rep", n_variants=2).take_all()
    b = adv_pipeline(SF, order="rep", n_variants=2).take_all()
    key = lambda r: (r["url"], r["sent_id"], r["variant_id"])
    assert sorted(
        [(key(r), r["tokens"]) for r in a]
    ) == sorted([(key(r), r["tokens"]) for r in b])


def test_ppdb_preserves_entities(ray_session):
    from ner_pytorch_ray.pipelines.adversarial import adv_pipeline, PARAPHRASES

    out = adv_pipeline(SF, order="ppdb", n_variants=2).take_all()
    assert out
    syn = {s for opts in PARAPHRASES.values() for s in opts}
    for r in out[:200]:
        # tags unchanged; every changed token is at an O position and maps
        # through the dict
        for w, tg in zip(r["tokens"], r["tags"]):
            if w in syn and w not in PARAPHRASES:
                assert tg == "O"


def test_ppl_filter_semantics(ray_session):
    import ray.data
    from ner_pytorch_ray.pipelines.adversarial import ppl_filter

    counts = {"good": 1000, "ok": 100, "rare": 1}
    sources = ray.data.from_items(
        [{"url": "u", "sent_id": 0, "tokens": ["good", "good", "ok"]}]
    )
    variants = ray.data.from_items(
        [
            {"url": "u", "sent_id": 0, "variant_id": 0,
             "tokens": ["good", "good", "good"]},   # low ppl -> kept
            {"url": "u", "sent_id": 0, "variant_id": 1,
             "tokens": ["rare", "zzz", "zzz"]},     # high ppl -> rejected
            {"url": "u", "sent_id": 0, "variant_id": 2,
             "tokens": ["good", "ok", "ok"]},       # low ppl -> kept
        ]
    )
    out = ppl_filter(variants, sources, counts, threshold=3.0, keep_n=2)
    kept = sorted(r["variant_id"] for r in out.take_all())
    assert kept == [0, 2]

    # top-up fallback: force every variant above threshold
    variants2 = ray.data.from_items(
        [
            {"url": "u", "sent_id": 0, "variant_id": i,
             "tokens": ["zzz", "yyy", "xxx"]}
            for i in range(3)
        ]
    )
    out2 = ppl_filter(variants2, sources, counts, threshold=1.0, keep_n=2)
    assert len(out2.take_all()) == 2  # lowest-ppl rejected ones topped up


def test_full_order_rep_ppdb(ray_session):
    from ner_pytorch_ray.pipelines.adversarial import adv_pipeline

    out = adv_pipeline(SF, order="rep,ppdb", n_variants=2).take_all()
    assert out
    # keys unique per (url, sent_id, variant)... ppdb re-variants rep rows:
    # every row still carries valid aligned columns
    for r in out[:100]:
        assert len(r["tokens"]) == len(r["tags"])
