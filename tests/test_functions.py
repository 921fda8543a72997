"""Unit + differential tests for the pure function layer.

The reference's own conlleval.py / utils.py (stdlib+numpy only) serve as
oracles — we import them read-only and compare behavior on random inputs.
"""

import random

import pytest
from hypothesis import given, settings, strategies as st

from ner_pytorch_ray.functions import (
    zero_digits,
    unicode_to_ascii,
    cap_feature,
    iob2,
    iob_iobes,
    iobes_iob,
    update_tag_scheme,
    extract_spans,
    count_chunks,
    evaluate_counts,
    Span,
)

TYPES = ["PER", "LOC", "ORG", "MISC"]


def random_iob_tags(rng: random.Random, n: int) -> list[str]:
    """Random *valid-ish* IOB1 sequence (as CoNLL ships: I- may open)."""
    tags = []
    for _ in range(n):
        r = rng.random()
        if r < 0.5:
            tags.append("O")
        elif r < 0.75:
            tags.append(f"I-{rng.choice(TYPES)}")
        else:
            tags.append(f"B-{rng.choice(TYPES)}")
    return tags


# ---------------------------------------------------------------- textnorm
def test_zero_digits():
    assert zero_digits("ab12c3") == "ab00c0"
    assert zero_digits("1996-08-22") == "0000-00-00"
    assert zero_digits("no digits") == "no digits"


def test_unicode_to_ascii():
    assert unicode_to_ascii("Śl'usàrski") == "Sl'usarski"
    assert unicode_to_ascii("naïve café") == "naive cafe"
    assert unicode_to_ascii("a£b€c") == "abc"
    assert unicode_to_ascii("don't, stop; now.") == "don't, stop; now."


def test_cap_feature():
    assert cap_feature("hello") == 0
    assert cap_feature("HELLO") == 1
    assert cap_feature("Hello") == 2
    assert cap_feature("heLLo") == 3


def test_textnorm_matches_reference(reference_path):
    import importlib
    ref_utils = importlib.import_module("utils")
    for s in ["abc123", "x9y", "", "42", "a1b2c3d4"]:
        assert zero_digits(s) == ref_utils.zero_digits(s)


# ---------------------------------------------------------------- tagscheme
def test_iob1_to_iob2_repair():
    # IOB1: I- may open a chunk
    assert iob2(["I-PER", "I-PER", "O"]) == ["B-PER", "I-PER", "O"]
    assert iob2(["O", "I-LOC"]) == ["O", "B-LOC"]
    # type change forces B
    assert iob2(["I-PER", "I-LOC"]) == ["B-PER", "B-LOC"]
    # already IOB2 untouched
    assert iob2(["B-ORG", "I-ORG"]) == ["B-ORG", "I-ORG"]
    # invalid
    assert iob2(["E-PER"]) is None
    assert iob2(["X"]) is None


def test_iob_iobes_roundtrip():
    iob = ["B-PER", "O", "B-LOC", "I-LOC", "I-LOC", "O", "B-ORG"]
    iobes = iob_iobes(iob)
    assert iobes == ["S-PER", "O", "B-LOC", "I-LOC", "E-LOC", "O", "S-ORG"]
    assert iobes_iob(iobes) == iob


def test_tagscheme_matches_reference(reference_path):
    import importlib
    ref_utils = importlib.import_module("utils")
    rng = random.Random(7)
    for _ in range(300):
        tags = random_iob_tags(rng, rng.randint(1, 12))
        ref_in = list(tags)
        ok = ref_utils.iob2(ref_in)  # mutates in place
        ours = iob2(tags)
        if not ok:
            assert ours is None
            continue
        assert ours == ref_in
        assert iob_iobes(ours) == ref_utils.iob_iobes(ref_in)
        assert iobes_iob(iob_iobes(ours)) == ref_utils.iobes_iob(
            ref_utils.iob_iobes(ref_in)
        )


def test_update_tag_scheme():
    assert update_tag_scheme(["I-PER", "O"], "iobes") == ["S-PER", "O"]
    assert update_tag_scheme(["I-PER", "I-PER"], "iob") == ["B-PER", "I-PER"]
    with pytest.raises(Exception):
        update_tag_scheme(["S-PER"], "iobes")


# ---------------------------------------------------------------- spans
def test_extract_spans_basic():
    tags = ["S-PER", "O", "B-LOC", "I-LOC", "E-LOC", "O"]
    assert extract_spans(tags) == [Span(0, 1, "PER"), Span(2, 5, "LOC")]


def test_extract_spans_trailing_entity_sentinel():
    # sentence ends inside an entity — the reference appends a sentinel row
    # (word_rep.py:132-134); our flush-at-end must give the same span
    tags = ["O", "B-ORG", "I-ORG", "E-ORG"]
    assert extract_spans(tags) == [Span(1, 4, "ORG")]
    assert extract_spans(["S-PER"]) == [Span(0, 1, "PER")]


def test_extract_spans_adjacent_chunks():
    tags = ["S-PER", "S-PER", "B-LOC", "E-LOC"]
    assert extract_spans(tags) == [
        Span(0, 1, "PER"),
        Span(1, 2, "PER"),
        Span(2, 4, "LOC"),
    ]


def test_extract_spans_iob2_input():
    tags = ["B-PER", "I-PER", "B-PER", "O"]
    assert extract_spans(tags) == [Span(0, 2, "PER"), Span(2, 3, "PER")]


@given(
    st.lists(
        st.sampled_from(
            ["O"]
            + [f"{p}-{t}" for p in "BIES" for t in TYPES]
        ),
        min_size=0,
        max_size=20,
    )
)
@settings(max_examples=300, deadline=None)
def test_extract_spans_counts_match_conlleval(tags):
    """#spans from extract_spans == conlleval's true_chunks count (self-eval)."""
    c = count_chunks(tags, tags)
    spans = extract_spans(tags)
    assert len(spans) == sum(c.true_chunks.values())
    # spans never overlap and are in order
    for a, b in zip(spans, spans[1:]):
        assert a.end <= b.begin


# ---------------------------------------------------------------- conlleval
def test_conlleval_matches_reference(reference_path):
    import importlib
    ref = importlib.import_module("conlleval")
    rng = random.Random(13)
    # build a corpus of sentences; reference gets flat concatenation with
    # boundary resets via per-sentence calls being merged
    from ner_pytorch_ray.functions import ChunkCounts

    total = ChunkCounts()
    ref_true, ref_pred = [], []
    for _ in range(120):
        n = rng.randint(1, 15)
        t = random_iob_tags(rng, n)
        p = random_iob_tags(rng, n)
        t = iob2(t) or t
        p = iob2(p) or p
        total.merge(count_chunks(t, p))
        # reference's evaluate() joins sentences with 'O' boundary tokens
        ref_true.extend(t + ["O"])
        ref_pred.extend(p + ["O"])
    (rc, tc, pc, _, _, _) = ref.count_chunks(ref_true, ref_pred)
    assert dict(total.correct_chunks) == {k: v for k, v in rc.items() if v}
    assert dict(total.true_chunks) == {k: v for k, v in tc.items() if v}
    assert dict(total.pred_chunks) == {k: v for k, v in pc.items() if v}
    # P/R/F1 equality
    prec, rec, f1 = ref.calc_metrics(
        sum(rc.values()), sum(pc.values()), sum(tc.values())
    )
    m = evaluate_counts(total)
    assert (m["precision"], m["recall"], m["f1"]) == (prec, rec, f1)


def test_counts_serialization_roundtrip():
    from ner_pytorch_ray.functions import ChunkCounts

    c = count_chunks(["B-PER", "I-PER", "O"], ["B-PER", "O", "O"])
    d = c.to_lists()
    c2 = ChunkCounts.from_lists(d)
    assert evaluate_counts(c) == evaluate_counts(c2)


def test_first_subword_offsets_reference_semantics():
    """C7 (get_bert_embedding.py:59-63): start=1 ([CLS] at 0), each word
    takes the index of its first subword piece."""
    from ner_pytorch_ray.functions.subword import (
        first_subword_offsets,
        subword_tokenize,
    )

    toks = ["streaming", "db", ",", "x09"]
    starts, counts = first_subword_offsets(toks)
    assert counts == [len(subword_tokenize(w)) for w in toks]
    assert starts[0] == 1
    for i in range(1, len(toks)):
        assert starts[i] == starts[i - 1] + counts[i - 1]
    # pieces: 'streaming' -> ['stre','amin','g']; 'x09' -> ['x','09']
    assert subword_tokenize("streaming") == ["stre", "amin", "g"]
    assert subword_tokenize("x09") == ["x", "09"]


def test_chunk_subword_embedding_window_quirk():
    """Multi-word chunks pool len-in-WORDS rows from the first subword
    (the reference's window rule, get_bert_embedding.py:110-121), not the
    chunk's true subword span."""
    import numpy as np

    from ner_pytorch_ray.functions.subword import chunk_subword_embedding

    emb = np.arange(20, dtype=np.float64).reshape(10, 2)
    single = chunk_subword_embedding(3, 1, emb, "mean")
    assert (single == emb[3]).all()
    mean2 = chunk_subword_embedding(3, 2, emb, "mean")
    assert (mean2 == emb[3:5].mean(axis=0)).all()
    max2 = chunk_subword_embedding(3, 2, emb, "max")
    assert (max2 == emb[3:5].max(axis=0)).all()
    first_only = chunk_subword_embedding(3, 2, emb, "first")
    assert (first_only == emb[3]).all()


def test_tfidf_join_path_equals_broadcast(ray_session):
    """The broadcast-free (term-keyed collect) tf-idf path must emit
    exactly the broadcast path's rows."""
    from ner_pytorch_ray.pipelines.analysis import tfidf_top_terms

    sf = "/root/testdata/sf0.001"
    key = lambda r: (r["doc_id"], r["rank"], r["term"], r["tf"], r["df"],
                     r["score_i"])
    a = sorted(key(r) for r in tfidf_top_terms(sf).take_all())
    b = sorted(
        key(r) for r in tfidf_top_terms(sf, broadcast_df=False).take_all()
    )
    assert a == b and len(a) > 0
