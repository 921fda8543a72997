"""Paraphrase machinery pure functions vs reference semantics
(paraphrase_model.py:16-191, ppdb.py:12-117, gen_adv_pipline.py:187-191)."""

from collections import Counter


def test_check_single_quote():
    from ner_pytorch_ray.functions.paraphrase import check_single_quote

    assert check_single_quote("'s")
    assert check_single_quote("'ve")
    assert not check_single_quote("s'")
    assert not check_single_quote("word")
    assert not check_single_quote("'")


def test_combine_tag_merges_continuations_and_contractions():
    from ner_pytorch_ray.functions.paraphrase import combine_tag

    tokens = ["John", "'s", "dog", "New", "York", "City", ",", "yes"]
    tags = ["S-PER", "O", "O", "B-LOC", "I-LOC", "E-LOC", "O", "O"]
    units, unit_tags, order, punct = combine_tag(tokens, tags)
    assert units == ["John 's", "dog", "New York City", ",", "yes"]
    assert unit_tags == ["S-PER O", "O", "B-LOC I-LOC E-LOC", "O", "O"]
    assert order == tokens
    assert punct == Counter({",": 1})


def test_combine_tag_leading_continuation_not_merged():
    from ner_pytorch_ray.functions.paraphrase import combine_tag

    # res empty -> I- token starts its own unit (reference guard `if res`)
    units, unit_tags, _, _ = combine_tag(["York"], ["I-LOC"])
    assert units == ["York"]
    assert unit_tags == ["I-LOC"]


def test_convert_span_union():
    from ner_pytorch_ray.functions.paraphrase import convert_span

    # nested + overlapping -> interval union; unmatched left ignored
    t = ["(", "a", "(", "b", ")", ")", "c", "(", "d", ")"]
    assert convert_span(t, "(") == [[0, 5], [7, 9]]
    assert convert_span(["a", "b"], "(") == []
    assert convert_span(["(", "a"], "(") == []
    assert convert_span([")", "a"], "(") == []


def test_handle_pair_punct_merges():
    from ner_pytorch_ray.functions.paraphrase import handle_pair_punct

    t = ["x", "(", "a", "b", ")", "y"]
    g = ["O", "O", "S-ORG", "O", "O", "O"]
    texts, tags = handle_pair_punct(t, g, "(")
    assert texts == ["x", "( a b )", "y"]
    assert tags == ["O", "O S-ORG O O", "O"]
    # no brackets -> identity
    texts2, tags2 = handle_pair_punct(["a", "b"], ["O", "O"], "(")
    assert (texts2, tags2) == (["a", "b"], ["O", "O"])


def test_convert_to_string_detok():
    from ner_pytorch_ray.functions.paraphrase import convert_to_string

    assert convert_to_string(["Hello", ",", "World", "!"]) == "hello, world!"
    assert convert_to_string(["A", "'s", "B"]) == "a's b"


def test_parse_ppdb_filters():
    from ner_pytorch_ray.functions.paraphrase import parse_ppdb

    vocab = {"fast", "quick", "big", "large", "bigly", "runs", "running"}
    lines = [
        "x ||| fast ||| quick ||| f ||| Equivalence",
        "x ||| big ||| large ||| f ||| Equivalence",
        "x ||| big ||| bigly ||| f ||| Equivalence",      # same stem -> drop
        "x ||| runs ||| running ||| f ||| Equivalence",   # same stem -> drop
        "x ||| fast ||| zoom ||| f ||| Equivalence",      # OOV -> drop
        "x ||| fast ||| big ||| f ||| ForwardEntailment", # wrong rel -> drop
        "garbage line",
    ]
    d = parse_ppdb(lines, vocab)
    assert d == {
        "fast": {"quick"},
        "quick": {"fast"},
        "big": {"large"},
        "large": {"big"},
    }


def test_clean_paraphrases_second_pass():
    from ner_pytorch_ray.functions.paraphrase import clean_paraphrases

    d = {"run": {"sprint", "running"}, "walk": {"walking"}}
    out = clean_paraphrases(d)
    assert out == {"run": {"sprint"}}


def test_gen_paraphrases_deterministic_and_correct():
    from ner_pytorch_ray.functions.paraphrase import gen_paraphrases

    d = {
        "fast": {"quick", "speedy"},
        "very fast": {"blazing"},
        "big": {"large"},
    }
    # bigram hit takes precedence and consumes both tokens (INTENDED
    # semantics of ppdb.py:86-100; the reference's tokens[i]+' '+tokens[i]
    # bigram is a latent bug we do not replicate)
    out = gen_paraphrases("a very fast dog", d, seed=1)
    assert out == {"a blazing dog"}
    # unigram path: one pick per rank, seeded -> reproducible
    a = gen_paraphrases("a fast big dog", d, seed=7)
    b = gen_paraphrases("a fast big dog", d, seed=7)
    assert a == b
    assert all(("quick" in s or "speedy" in s) and "large" in s for s in a)
    assert gen_paraphrases("no hits here", d) == set()


def test_simple_stem():
    from ner_pytorch_ray.functions.paraphrase import simple_stem

    assert simple_stem("running") == simple_stem("runnings")
    assert simple_stem("Fast") == "fast"
    assert simple_stem("es") == "es"  # too short to strip
