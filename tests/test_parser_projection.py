"""Dependency parse stand-in (C5), tree projection (C6), 'para' stage."""

import math
import random

import pyarrow as pa


def test_anneal_exact():
    from ner_pytorch_ray.functions.projection import anneal

    assert anneal(0.7, 1) == 0.7
    assert anneal(0.7, math.inf) == 0.5
    assert anneal(0.7, 0) == 1
    assert anneal(0.3, 0) == 0
    # t=2 flattens toward 0.5
    assert 0.5 < anneal(0.9, 2) < 0.9


def test_heads_to_children():
    from ner_pytorch_ray.functions.projection import heads_to_children

    # heads 1-based, 0 = root: tok0<-root, tok1<-tok0, tok2<-tok0
    ch = heads_to_children([0, 1, 1])
    assert ch == {-1: [0], 0: [1, 2]}


def test_pair_features_shape():
    from ner_pytorch_ray.functions.projection import pair_features

    xs, ids = pair_features([0, 1, 1], ["root", "nsubj", "obj"],
                            ["VERB", "NOUN", "NOUN"])
    # bucket {-1: [0]} yields no pairs; bucket 0: [0,1,2] -> 6 ordered pairs
    assert len(xs) == len(ids) == 6
    # parent's deprel feature is 'parent'
    feat = dict(zip(ids, xs))[(0, 1)]
    assert "l_deprel_parent" in feat and "r_deprel_nsubj" in feat


def test_project_tree_permutation_and_determinism():
    from ner_pytorch_ray.functions.projection import reorder_sentence

    heads = [0, 1, 1, 2]
    deprels = ["root", "nsubj", "obj", "det"]
    upos = ["VERB", "NOUN", "NOUN", "DET"]
    a = reorder_sentence(heads, deprels, upos, seed=5)
    b = reorder_sentence(heads, deprels, upos, seed=5)
    assert a == b
    assert sorted(a) == [0, 1, 2, 3]  # a permutation
    # subtree contiguity: token 3 (child of 1) stays adjacent to 1's block
    i1, i3 = a.index(1), a.index(3)
    assert abs(i1 - i3) == 1


def test_parser_actor_rules():
    from ner_pytorch_ray.stages.parser import ParserActor

    p = ParserActor()
    deps = p._parse(["spark", "scan", "the", "stream"])
    assert [d["upos"] for d in deps] == ["PROPN", "VERB", "DET", "PROPN"]
    assert deps[1] == {"head": 0, "deprel": "root", "upos": "VERB"}
    assert deps[0]["head"] == 2 and deps[0]["deprel"] == "nsubj"
    assert deps[2]["head"] == 2 and deps[2]["deprel"] == "det"
    assert deps[3]["head"] == 2 and deps[3]["deprel"] == "obj"
    # real backend is stubbed, clearly
    import pytest

    with pytest.raises(NotImplementedError):
        ParserActor(backend="udpipe")


def test_para_stage_preserves_entity_chunks(ray_session):
    import ray.data
    from ner_pytorch_ray.stages.parser import parser_stage, paraphrase_stage
    from ner_pytorch_ray.functions.spans import extract_spans

    rows = pa.Table.from_pydict(
        {
            "url": pa.array([f"u{i}" for i in range(30)], type=pa.string()),
            "sent_id": pa.array(range(30), type=pa.int64()),
            "tokens": pa.array(
                [["hash", "join", "scan", "the", "stream", "filter",
                  "customer"]] * 30,
                type=pa.list_(pa.string()),
            ),
            "tags": pa.array(
                [["B-ORG", "E-ORG", "O", "O", "S-LOC", "O", "S-PER"]] * 30,
                type=pa.list_(pa.string()),
            ),
        }
    )
    out = paraphrase_stage(parser_stage(ray.data.from_arrow(rows))).take_all()
    assert out  # at least some non-identity reorders across 30 seeds
    for r in out:
        assert sorted(r["tokens"]) == sorted(
            ["hash", "join", "scan", "the", "stream", "filter", "customer"]
        )
        spans = extract_spans(r["tags"])
        surfaces = {
            " ".join(r["tokens"][s.begin : s.end]) for s in spans
        }
        # entity chunks moved as units, never split
        assert surfaces == {"hash join", "stream", "customer"}


def test_para_stage_deterministic(ray_session):
    import ray.data
    from ner_pytorch_ray.stages.parser import parser_stage, paraphrase_stage

    rows = pa.Table.from_pydict(
        {
            "url": pa.array(["u1"], type=pa.string()),
            "sent_id": pa.array([0], type=pa.int64()),
            "tokens": pa.array(
                [["spark", "scan", "stream", "sort", "table"]],
                type=pa.list_(pa.string()),
            ),
            "tags": pa.array(
                [["S-ORG", "O", "S-LOC", "O", "S-LOC"]],
                type=pa.list_(pa.string()),
            ),
        }
    )
    a = paraphrase_stage(parser_stage(ray.data.from_arrow(rows))).take_all()
    b = paraphrase_stage(parser_stage(ray.data.from_arrow(rows))).take_all()
    assert a == b
