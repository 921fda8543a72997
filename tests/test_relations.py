"""Verb-pattern relation extraction (stages/relations.py)."""

import pyarrow as pa
import pytest


def _tagged_ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "url": pa.array([r[0] for r in rows], type=pa.string()),
                "sent_id": pa.array([r[1] for r in rows], type=pa.int64()),
                "tokens": pa.array(
                    [r[2] for r in rows], type=pa.list_(pa.string())
                ),
                "tags": pa.array(
                    [r[3] for r in rows], type=pa.list_(pa.string())
                ),
            }
        )
    )


def test_first_verb_between_mentions(ray_session):
    from ner_pytorch_ray.stages.relations import relations_from_tagged

    ds = _tagged_ds(
        [
            # spark --scan--> stream (first verb wins over 'sort')
            (
                "u1",
                0,
                ["spark", "scan", "sort", "stream"],
                ["S-ORG", "O", "O", "S-LOC"],
            ),
            # no verb between -> nothing
            ("u1", 1, ["spark", "the", "stream"], ["S-ORG", "O", "S-LOC"]),
        ]
    )
    out = relations_from_tagged(ds).take_all()
    assert out == [
        {
            "subj": "org:spark",
            "pred": "scan",
            "obj": "loc:stream",
            "weight": 1,
            "sample_url": "u1",
        }
    ]


def test_verb_window_does_not_cross_sentences(ray_session):
    from ner_pytorch_ray.stages.relations import relations_from_tagged

    # verb is in the NEXT sentence: mention pair in sent 0 has no verb
    ds = _tagged_ds(
        [
            ("u1", 0, ["spark", "stream"], ["S-ORG", "S-LOC"]),
            ("u1", 1, ["scan", "table"], ["O", "S-LOC"]),
        ]
    )
    assert relations_from_tagged(ds).count() == 0


def test_weight_counts_sentences_and_min_url(ray_session):
    from ner_pytorch_ray.stages.relations import relations_from_tagged

    sent = (["spark", "merge", "stream"], ["S-ORG", "O", "S-LOC"])
    ds = _tagged_ds(
        [
            ("u2", 0, *sent),
            ("u1", 0, *sent),
            ("u1", 1, *sent),
        ]
    )
    out = relations_from_tagged(ds).take_all()
    assert len(out) == 1
    assert out[0]["weight"] == 3
    assert out[0]["sample_url"] == "u1"


def test_bigram_mention_participates(ray_session):
    from ner_pytorch_ray.stages.relations import relations_from_tagged

    ds = _tagged_ds(
        [
            (
                "u1",
                0,
                ["hash", "join", "group", "customer"],
                ["B-ORG", "E-ORG", "O", "S-PER"],
            )
        ]
    )
    out = relations_from_tagged(ds).take_all()
    assert out == [
        {
            "subj": "org:hash_join",
            "pred": "group",
            "obj": "per:customer",
            "weight": 1,
            "sample_url": "u1",
        }
    ]


def test_partition_invariance(ray_session):
    """Same multiset of relations regardless of block structure."""
    import ray.data
    from ner_pytorch_ray.stages.relations import relations_from_tagged

    rows = []
    verbs = ["scan", "filter", "merge", "the", "a"]
    gaz = ["spark", "customer", "stream", "table", "vector"]
    tags = {g: t for g, t in zip(gaz, ["S-ORG", "S-PER", "S-LOC", "S-LOC", "S-MISC"])}
    for i in range(40):
        toks = [gaz[i % 5], verbs[i % 5], gaz[(i + 2) % 5], verbs[(i + 1) % 5]]
        tg = [tags[toks[0]], "O", tags[toks[2]], "O"]
        rows.append((f"u{i % 7}", i, toks, tg))
    base = relations_from_tagged(_tagged_ds(rows)).take_all()
    ds2 = _tagged_ds(rows).repartition(13)
    again = relations_from_tagged(ds2).take_all()
    assert base == again
    assert len(base) > 0
