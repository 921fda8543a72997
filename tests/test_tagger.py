"""BiLSTM-CRF numpy model: Viterbi correctness (brute force), batch
invariance, and distributed parity through the Ray actor-pool stage."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from ner_pytorch_ray.state.model import (
    NumpyBiLSTMCRF,
    init_weights,
    save_weights,
    load_weights,
    IMPOSSIBLE,
)
from ner_pytorch_ray.state.vocab import (
    IOBES_TAGSET,
    tag_mapping_from_tagset,
    create_mapping,
)


def small_model(n_words=50, n_chars=20, n_tags=7, seed=7):
    w = init_weights(
        n_words, n_chars, n_tags, word_dim=8, char_dim=5, char_out=6,
        hidden=9, seed=seed,
    )
    return NumpyBiLSTMCRF(w)


def random_sentences(rng, n_sents, n_words=50, n_chars=20):
    words, chars = [], []
    for _ in range(n_sents):
        L = rng.integers(1, 12)
        words.append(list(rng.integers(0, n_words, size=L)))
        chars.append(
            [list(rng.integers(0, n_chars, size=rng.integers(0, 6))) for _ in range(L)]
        )
    return words, chars


def brute_force_viterbi(feats, trans, length, start, stop):
    """Enumerate all tag paths (excluding START/STOP states)."""
    C = feats.shape[1]
    real = [c for c in range(C) if c not in (start, stop)]
    best, best_score = None, -np.inf
    for path in itertools.product(real, repeat=length):
        s = trans[path[0], start] + feats[0, path[0]]
        for t in range(1, length):
            s += trans[path[t], path[t - 1]] + feats[t, path[t]]
        s += trans[stop, path[-1]]
        if s > best_score:
            best_score, best = s, path
    return list(best)


def test_viterbi_vs_brute_force():
    rng = np.random.default_rng(3)
    m = small_model(n_tags=6)
    for L in (1, 2, 3, 4):
        feats = rng.normal(size=(1, L, 6)).astype(np.float32)
        lens = np.array([L])
        got = m.viterbi(feats, lens)[0]
        exp = brute_force_viterbi(
            feats[0].astype(np.float64), m.w["trans"].astype(np.float64),
            L, m.start_idx, m.stop_idx,
        )
        assert got == exp, (L, got, exp)


def test_viterbi_mask_ignores_padding():
    rng = np.random.default_rng(4)
    m = small_model(n_tags=6)
    L = 5
    feats = rng.normal(size=(2, L, 6)).astype(np.float32)
    lens = np.array([3, 5])
    paths = m.viterbi(feats, lens)
    assert len(paths[0]) == 3 and len(paths[1]) == 5
    # row 0 decoded alone with its true length gives the same path
    alone = m.viterbi(feats[0:1, :3, :], np.array([3]))[0]
    assert paths[0] == alone


def test_decode_batch_invariance():
    rng = np.random.default_rng(11)
    m = small_model()
    words, chars = random_sentences(rng, 16)
    full = m.decode(words, chars)
    # one-by-one
    solo = [m.decode([w], [c])[0] for w, c in zip(words, chars)]
    assert full == solo
    # arbitrary regrouping
    regroup = m.decode(words[7:] + words[:7], chars[7:] + chars[:7])
    assert regroup == full[7:] + full[:7]


def test_weights_roundtrip(tmp_path):
    w = init_weights(30, 10, 7, word_dim=4, char_dim=3, char_out=4, hidden=5)
    p = str(tmp_path / "w.npz")
    save_weights(p, w)
    w2 = load_weights(p)
    for k in w:
        np.testing.assert_array_equal(w[k], w2[k])


def test_tag_mapping_matches_reference_semantics():
    # START/STOP get the last two ids (freqs -1/-2, loader.py:100-110)
    tag_to_id, id_to_tag = tag_mapping_from_tagset(IOBES_TAGSET)
    n = len(IOBES_TAGSET)
    assert tag_to_id["<START>"] == n
    assert tag_to_id["<STOP>"] == n + 1
    assert sorted(tag_to_id.values()) == list(range(n + 2))
    # ids of real tags ranked alphabetically (equal freqs)
    assert [id_to_tag[i] for i in range(n)] == sorted(IOBES_TAGSET)


def test_create_mapping_matches_reference(reference_path):
    import importlib

    ref_utils = importlib.import_module("utils")
    dico = {"b": 5, "a": 5, "c": 9, "<PAD>": 10000001, "<UNK>": 10000000}
    ours = create_mapping(dico)
    theirs = ref_utils.create_mapping(dico)
    assert ours[0] == theirs[0] and ours[1] == theirs[1]
    assert ours[0]["<PAD>"] == 0 and ours[0]["<UNK>"] == 1


# ------------------------------------------------------------ distributed
def test_tagger_stage_distributed_parity(ray_session):
    import ray
    import ray.data
    from ner_pytorch_ray.stages.tagger import tagger_stage

    n_tags = len(IOBES_TAGSET) + 2
    w = init_weights(40, 15, n_tags, word_dim=6, char_dim=4, char_out=5, hidden=6, seed=5)
    model = NumpyBiLSTMCRF(w)
    _, id_to_tag = tag_mapping_from_tagset(IOBES_TAGSET)

    rng = np.random.default_rng(21)
    words, chars = random_sentences(rng, 60, n_words=40, n_chars=15)
    oracle = [
        [id_to_tag[t] for t in model.decode([wd], [ch])[0]]
        for wd, ch in zip(words, chars)
    ]

    t = pa.Table.from_pydict(
        {
            "url": [f"u{i}" for i in range(len(words))],
            "sent_id": list(range(len(words))),
            "word_ids": words,
            "char_ids": chars,
        }
    )
    for batch_size, blocks in [(7, 1), (64, 4), (13, 8)]:
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = tagger_stage(ds, w, id_to_tag, concurrency=2, batch_size=batch_size)
        got = {r["url"]: r["tags"] for r in out.take_all()}
        for i in range(len(words)):
            assert got[f"u{i}"] == oracle[i], (batch_size, blocks, i)


def test_encode_stage(ray_session):
    import ray.data
    from ner_pytorch_ray.stages.encode import encode_stage

    word_to_id = {"<PAD>": 0, "<UNK>": 1, "the": 2, "spark": 3}
    char_to_id = {"<PAD>": 0, "t": 1, "h": 2, "e": 3, "s": 4}
    t = pa.Table.from_pydict(
        {
            "url": ["u0"],
            "sent_id": [0],
            "tokens": [["The", "SPARK", "zebra"]],
        }
    )
    out = encode_stage(ray.data.from_arrow(t), word_to_id, char_to_id).take_all()[0]
    assert out["word_ids"] == [2, 3, 1]  # lowered lookup, UNK fallback
    assert out["caps"] == [2, 1, 0]
    # unknown chars silently dropped; chars keep case so 'T'/'S' miss
    # (loader.py:162-163, case note at arguments.py:14)
    assert out["char_ids"] == [[2, 3], [], [3]]


def test_crf_nll_matches_path_enumeration():
    """T3 parity: forward-score partition == logsumexp over ALL tag paths,
    gold score == direct path score (crf.py:47-89 semantics), on a tiny
    random model — independent brute-force oracle."""
    import numpy as np
    from ner_pytorch_ray.state.model import (
        IMPOSSIBLE,
        NumpyBiLSTMCRF,
        init_weights,
    )

    w = init_weights(
        n_words=7, n_chars=5, n_tags=6, word_dim=4, char_dim=3,
        char_out=3, hidden=4, seed=9,
    )
    model = NumpyBiLSTMCRF(w)
    start, stop = model.start_idx, model.stop_idx
    real_tags = [t for t in range(6) if t not in (start, stop)]

    sents = [([1, 2, 3], [[1], [2, 3], [4]], [0, 1, 2]),
             ([4, 5], [[2], [1, 4]], [3, 0])]
    nll = model.nll(
        [s[0] for s in sents], [s[1] for s in sents], [s[2] for s in sents]
    )

    import itertools

    trans = w["trans"].astype(np.float64)
    for si, (wids, cids, tids) in enumerate(sents):
        feats, lens = model._features([wids], [cids])
        f = feats[0].astype(np.float64)
        n = len(wids)

        def path_score(path):
            s = trans[path[0], start] + f[0, path[0]]
            for t in range(1, n):
                s += trans[path[t], path[t - 1]] + f[t, path[t]]
            return s + trans[stop, path[-1]]

        # partition over ALL tag paths (including START/STOP-labeled
        # positions — the reference's DP ranges over every class C)
        all_scores = [path_score(p) for p in itertools.product(range(6), repeat=n)]
        logz = np.logaddexp.reduce(all_scores)
        gold = path_score(tids)
        assert abs(float(nll[si]) - round(float(logz - gold), 4)) < 1e-3


def test_nll_stage_batch_invariant(ray_session):
    """Distributed NLL == per-sentence single-process values under any
    batching (the rounded value is batch-composition independent)."""
    import numpy as np
    import ray.data
    from ner_pytorch_ray.pipelines.neural import adv_nll_topk

    a = {(r["url"], r["sent_id"], r["variant_id"]): (r["nll"], r["rank"])
         for r in adv_nll_topk("/root/testdata/sf0.001").take_all()}
    b = {(r["url"], r["sent_id"], r["variant_id"]): (r["nll"], r["rank"])
         for r in adv_nll_topk("/root/testdata/sf0.001").take_all()}
    assert a == b and len(a) > 0


def test_tagger_stage_num_gpus_plumbing_cpu_identical(ray_session):
    """num_gpus passthrough (the reference runs CUDA, train.py:165-166):
    num_gpus=0 (explicit or default) must schedule on CPU and produce
    identical tags; a fractional request must be accepted by the planner
    (no GPU in this sandbox, so only the 0 path executes)."""
    import inspect

    import ray
    import ray.data
    from ner_pytorch_ray.stages.tagger import nll_stage, tagger_stage
    from ner_pytorch_ray.stages.linker import link_stage
    from ner_pytorch_ray.stages.parser import parser_stage

    for fn in (tagger_stage, nll_stage, link_stage, parser_stage):
        assert "num_gpus" in inspect.signature(fn).parameters, fn.__name__

    n_tags = len(IOBES_TAGSET) + 2
    w = init_weights(40, 15, n_tags, word_dim=6, char_dim=4, char_out=5, hidden=6, seed=5)
    _, id_to_tag = tag_mapping_from_tagset(IOBES_TAGSET)
    rng = np.random.default_rng(33)
    words, chars = random_sentences(rng, 20, n_words=40, n_chars=15)
    t = pa.Table.from_pydict(
        {
            "url": [f"u{i}" for i in range(len(words))],
            "sent_id": list(range(len(words))),
            "word_ids": words,
            "char_ids": chars,
        }
    )
    ds = ray.data.from_arrow(t).repartition(2)
    base = {
        r["url"]: r["tags"]
        for r in tagger_stage(ds, w, id_to_tag, concurrency=2).take_all()
    }
    explicit = {
        r["url"]: r["tags"]
        for r in tagger_stage(ds, w, id_to_tag, concurrency=2, num_gpus=0).take_all()
    }
    assert base == explicit
