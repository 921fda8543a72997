"""Finite-difference validation of the full-model analytic gradients
(state/backprop.py) — every parameter block the reference steps
(train.py:478-479) is checked against central differences of the
per-sentence CRF NLL."""

import numpy as np
import pytest

from ner_pytorch_ray.state.backprop import DENSE_BLOCKS, full_forward, full_grads
from ner_pytorch_ray.state.model import NumpyBiLSTMCRF, crf_grads, init_weights


def tiny_model(seed=3):
    return init_weights(
        n_words=12, n_chars=9, n_tags=7,
        word_dim=5, char_dim=4, char_out=4, hidden=6, seed=seed,
    )


def rand_sentence(rng, n_words=12, n_chars=9, L=6):
    wids = rng.integers(0, n_words, size=L).tolist()
    # include a zero-char word to hit the conv_b-only path
    cids = [rng.integers(0, n_chars, size=int(k)).tolist()
            for k in rng.integers(0, 5, size=L)]
    tags = rng.integers(0, 5, size=L).tolist()  # real tags only (START=5, STOP=6)
    return wids, cids, tags


def nll_of(w, wids, cids, tags, start, stop):
    feats, _ = full_forward(w, wids, cids)
    nll, _, _ = crf_grads(feats, np.asarray(tags), w["trans"], start, stop)
    return nll


# parameter blocks where the loss is differentiable everywhere we perturb;
# bih/bhh are covered through the combined "b" block (same gradient applied
# to both in the trainer)
_PARAM_OF_BLOCK = {
    "char_embed": "char_embed",
    "conv_w": "conv_w",
    "conv_b": "conv_b",
    "fc_w": "fc_w",
    "fc_b": "fc_b",
    "trans": "trans",
    "lstm_fw_Wih": "lstm_fw_Wih",
    "lstm_fw_Whh": "lstm_fw_Whh",
    "lstm_fw_b": "lstm_fw_bih",
    "lstm_bw_Wih": "lstm_bw_Wih",
    "lstm_bw_Whh": "lstm_bw_Whh",
    "lstm_bw_b": "lstm_bw_bih",
}


@pytest.mark.parametrize("block", list(DENSE_BLOCKS))
def test_dense_block_matches_finite_difference(block):
    rng = np.random.default_rng(11)
    w = tiny_model()
    start, stop = 5, 6
    wids, cids, tags = rand_sentence(rng)
    _, dense, _ = full_grads(w, wids, cids, tags, start, stop)
    g = dense[block]

    pname = _PARAM_OF_BLOCK[block]
    P = w[pname]
    eps = 1e-5
    # probe a handful of entries (including START/STOP-pinned ones for trans)
    flat_idx = rng.choice(P.size, size=min(12, P.size), replace=False)
    for fi in flat_idx:
        idx = np.unravel_index(fi, P.shape)
        if block == "trans" and (idx[0] == start or idx[1] == stop):
            assert g[idx] == 0.0  # pinned IMPOSSIBLE entries stay pinned
            continue
        w2 = {k: v.copy() for k, v in w.items()}
        w2[pname] = w2[pname].astype(np.float64)
        w2[pname][idx] += eps
        up = nll_of(w2, wids, cids, tags, start, stop)
        w2[pname][idx] -= 2 * eps
        dn = nll_of(w2, wids, cids, tags, start, stop)
        fd = (up - dn) / (2 * eps)
        assert abs(fd - g[idx]) < 5e-4, (block, idx, fd, g[idx])


def test_word_embed_rows_match_finite_difference():
    rng = np.random.default_rng(13)
    w = tiny_model()
    start, stop = 5, 6
    wids, cids, tags = rand_sentence(rng)
    _, _, (ids, rows) = full_grads(w, wids, cids, tags, start, stop)
    assert list(ids) == wids and rows.shape == (len(wids), w["word_embed"].shape[1])
    # aggregate per word id (a repeated word accumulates across occurrences)
    dense = np.zeros(w["word_embed"].shape, dtype=np.float64)
    np.add.at(dense, ids, rows)
    eps = 1e-5
    for wid in set(wids):
        for d in range(0, w["word_embed"].shape[1], 2):
            w2 = {k: v.copy() for k, v in w.items()}
            w2["word_embed"] = w2["word_embed"].astype(np.float64)
            w2["word_embed"][wid, d] += eps
            up = nll_of(w2, wids, cids, tags, start, stop)
            w2["word_embed"][wid, d] -= 2 * eps
            dn = nll_of(w2, wids, cids, tags, start, stop)
            fd = (up - dn) / (2 * eps)
            assert abs(fd - dense[wid, d]) < 5e-4, (wid, d, fd, dense[wid, d])


def test_full_forward_matches_inference_model():
    """The float64 training forward must agree with the float32 inference
    model (NumpyBiLSTMCRF) to float32 precision — same network, same
    semantics (per-word-valid max-pool, per-row recurrence)."""
    rng = np.random.default_rng(17)
    w = tiny_model(seed=8)
    model = NumpyBiLSTMCRF(w)
    for _ in range(5):
        wids, cids, _ = rand_sentence(rng)
        feats64, _ = full_forward(w, wids, cids)
        feats32, lens = model._features([wids], [cids])
        n = len(wids)
        assert np.allclose(feats64, feats32[0, :n], atol=5e-4)
