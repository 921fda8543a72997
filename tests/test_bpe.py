"""Distributed BPE merge training (pipelines/bpe.py) vs the sequential
Counter-loop oracle, plus partitioning-invariance and the greedy-merge
unit semantics."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _seq_expected(sf):
    from tools.make_expected import bpe_expected

    return bpe_expected(sf, n_merges=12)


def test_merge_word_greedy_runs():
    from ner_pytorch_ray.pipelines.bpe import _merge_word

    # identical-symbol runs merge greedily left-to-right
    assert _merge_word(["a"] * 5, "a", "a") == ["aa", "aa", "a"]
    assert _merge_word(["a"] * 4, "a", "a") == ["aa", "aa"]
    assert _merge_word(["b", "a", "a", "a"], "a", "a") == ["b", "aa", "a"]
    # distinct pair
    assert _merge_word(["x", "y", "x", "y"], "y", "x") == ["x", "yx", "y"]
    # no occurrence
    assert _merge_word(["x", "y"], "a", "b") == ["x", "y"]


def test_bpe_train_matches_sequential(ray_session):
    from ner_pytorch_ray.pipelines.bpe import bpe_train

    got = bpe_train(SF, n_merges=12).to_pandas()
    exp = _seq_expected(SF)[0].to_pandas()
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))


def test_bpe_piece_stats_matches_sequential(ray_session):
    from ner_pytorch_ray.pipelines.bpe import bpe_piece_stats

    got = bpe_piece_stats(SF, n_merges=12).to_pandas()
    exp = _seq_expected(SF)[1].to_pandas()
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))


@pytest.mark.parametrize("blocks", [1, 7])
def test_bpe_partitioning_invariance(ray_session, blocks):
    """The merge list is bit-identical under any partitioning of the word
    table (exact int counts + associative total-order top-1)."""
    from ner_pytorch_ray.pipelines.bpe import symbolized_words, train_merges

    state = symbolized_words(SF).repartition(blocks)
    merges, _ = train_merges(state, n_merges=8, min_count=2)
    exp = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in _seq_expected(SF)[0].to_pylist()[:8]
    ]
    assert merges == exp


def test_bpe_word_filter_spec(ray_session):
    """Words over 32 chars / empty / newline-embedded never enter the
    vocabulary (both sides of the oracle apply the same cap)."""
    from ner_pytorch_ray.pipelines.bpe import WORD_MAX_CHARS, word_counts

    words = word_counts(SF).to_pandas()["word"]
    assert (words.str.len() > 0).all()
    assert (words.str.len() <= WORD_MAX_CHARS).all()
    assert not words.str.contains("\n").any()


def test_encode_word_equals_rank_order_application():
    from ner_pytorch_ray.pipelines.bpe import _encode_word, _merge_word

    # lowest-rank-first must equal sequential rank-order application
    # (any trained pair involving a token has higher rank than the
    # merges that built the token, so the orders agree)
    merges = [("l", "l"), ("e", "ll"), ("ell", "o"), ("h", "ello")]
    ranks = {p: i for i, p in enumerate(merges)}
    got = _encode_word("hello", ranks)
    seq = list("hello") + ["</w>"]
    for left, right in merges:
        seq = _merge_word(seq, left, right)
    assert got == seq == ["hello", "</w>"]
    # out-of-vocab word falls back to chars
    assert _encode_word("zq", ranks) == ["z", "q", "</w>"]


def test_bpe_encoded_lengths_matches_sequential(ray_session):
    from tools.make_expected import bpe_encode_expected

    from ner_pytorch_ray.pipelines.bpe import bpe_encoded_lengths

    got = bpe_encoded_lengths(SF, n_merges=12).to_pandas()
    exp = bpe_encode_expected(SF, n_merges=12).to_pandas()
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))


def test_pair_partials_sliced_list_array():
    """A sliced ListArray (offsets not starting at 0) must index freq by
    LOCAL list position and count no pre-window positions — the defensive
    contract the flat-offset kernels share (ADVICE r4 #3)."""
    import numpy as np
    import pyarrow as pa

    from ner_pytorch_ray.pipelines.bpe import _pairs_from_lists

    empty = pa.Table.from_pydict(
        {
            "left": pa.array([], type=pa.string()),
            "right": pa.array([], type=pa.string()),
            "cnt": pa.array([], type=pa.int64()),
        }
    )
    full = pa.array(
        [["x", "y", "z"], ["a", "b"], ["b", "c", "d"], ["e"]]
    )
    sliced = full.slice(1, 2)  # rows: [a b], [b c d]
    assert sliced.offsets.to_numpy()[0] != 0  # the case under test
    freq = np.array([10, 100], dtype=np.int64)
    got = (
        _pairs_from_lists(sliced, freq, empty)
        .to_pandas()
        .sort_values(["left", "right"])
        .reset_index(drop=True)
    )
    want = {("a", "b"): 10, ("b", "c"): 100, ("c", "d"): 100}
    assert {
        (l, r): c
        for l, r, c in zip(got["left"], got["right"], got["cnt"])
    } == want
