"""Hypothesis property tests for round-2 pure kernels: the island-merge
sessionization algebra, the LUT popcount, and subword offsets."""

import numpy as np
from hypothesis import given, settings, strategies as st


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=50),
)
@settings(max_examples=300, deadline=None)
def test_island_merge_equals_event_sessionization(ts, gap):
    """Splitting events arbitrarily into single-event islands and merging
    must reproduce event-level gaps-and-islands exactly (the equivalence
    windows.user_sessions relies on, for ANY partitioning)."""
    from ner_pytorch_ray.pipelines.windows import _merge_islands

    # event-level truth
    t = np.sort(np.array(ts, dtype=np.int64))
    new = np.ones(len(t), dtype=bool)
    new[1:] = (t[1:] - t[:-1]) > gap
    sid = np.cumsum(new) - 1
    want = []
    for s in range(int(sid[-1]) + 1):
        seg = t[sid == s]
        want.append([int(seg[0]), int(seg[-1]), len(seg)])

    # worst-case partitioning: every event its own island, arbitrary order
    islands = [(int(x), int(x), 1) for x in ts]
    got = _merge_islands(islands, gap)
    assert got == want

    # two-level merge (arbitrary split into halves) gives the same result
    mid = len(islands) // 2
    partial = _merge_islands(islands[:mid], gap) + _merge_islands(
        islands[mid:], gap
    )
    got2 = _merge_islands([tuple(x) for x in partial], gap)
    assert got2 == want


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1,
                max_size=50))
@settings(max_examples=200, deadline=None)
def test_lut_popcount_matches_bin_count(vals):
    from ner_pytorch_ray.pipelines.similarity import _popcount, _popcount16_lut

    lut = _popcount16_lut()
    x = np.array(vals, dtype=np.uint64)
    got = _popcount(x, lut)
    want = np.array([bin(v).count("1") for v in vals], dtype=np.int64)
    assert (got == want).all()


@given(st.lists(st.text(alphabet="abcz019.,-", min_size=1, max_size=12),
                min_size=1, max_size=15))
@settings(max_examples=200, deadline=None)
def test_subword_offsets_partition_of_stream(tokens):
    """Offsets tile the subword stream exactly: word i's pieces occupy
    [start_i, start_i + n_i), consecutive and starting at 1."""
    from ner_pytorch_ray.functions.subword import (
        first_subword_offsets,
        subword_tokenize,
    )

    starts, counts = first_subword_offsets(tokens)
    pos = 1
    for w, s, n in zip(tokens, starts, counts):
        assert s == pos
        assert n == len(subword_tokenize(w))
        pos += n
    # total pieces = pieces of the concatenated per-word tokenization
    assert pos - 1 == sum(len(subword_tokenize(w)) for w in tokens)
