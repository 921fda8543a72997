"""Backend seams (VERDICT r2 #7): the real-model backends (UDPipe T6,
GPT-2 T7, BERT T8) are constructor arguments that raise clearly-marked
stub errors in this container, while the deterministic stand-ins keep the
oracled dataflow. Swapping a real model in on a GPU cluster is a
constructor arg, not a rewrite."""

import numpy as np
import pytest


def test_parser_backend_stub_raises():
    from ner_pytorch_ray.stages.parser import ParserActor

    with pytest.raises(NotImplementedError, match="UDPipe"):
        ParserActor(backend="udpipe")
    ParserActor(backend="rules")  # the stand-in constructs


def test_ppl_backend_stub_raises_and_unigram_matches():
    from ner_pytorch_ray.pipelines.adversarial import PplEstimator, UnigramLM

    counts = {"the": 10, "spark": 4, "stream": 2}
    with pytest.raises(NotImplementedError, match="gpt2"):
        PplEstimator(counts, backend="gpt2")
    with pytest.raises(ValueError):
        PplEstimator(counts, backend="llama")
    est = PplEstimator(counts, backend="unigram")
    ref = UnigramLM(counts)
    for toks in (["the", "spark"], ["unknown", "words"], ["stream"]):
        assert est.ppl(toks) == ref.ppl(toks)


def test_embedding_backend_stub_raises_and_pseudo_matches():
    from ner_pytorch_ray.pipelines.embeddings import (
        piece_embedding,
        resolve_embedding_backend,
        sentence_subword_matrix,
    )

    with pytest.raises(NotImplementedError, match="bert"):
        resolve_embedding_backend("bert")
    with pytest.raises(ValueError):
        resolve_embedding_backend("clip")
    assert resolve_embedding_backend("pseudo") is piece_embedding
    m1 = sentence_subword_matrix(["Spark", "streams"], dim=8)
    m2 = sentence_subword_matrix(["Spark", "streams"], dim=8, backend="pseudo")
    assert np.array_equal(m1, m2)
    assert np.array_equal(m1[0], np.zeros(8))  # [CLS] row


def test_tag_embedding_table_fails_fast_on_stub_backend():
    from ner_pytorch_ray.pipelines.embeddings import tag_embedding_table

    with pytest.raises(NotImplementedError, match="bert"):
        tag_embedding_table("/root/testdata/sf0.001", backend="bert")
