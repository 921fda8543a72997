"""Full-model analytic gradients for the numpy BiLSTM-CRF.

The reference backprops through the ENTIRE network and steps every
parameter (train.py:478-479 ``loss.backward(); optimizer.step()`` over the
model of model.py:34-219: char embeddings -> char CNN -> word embeddings ->
word BiLSTM -> linear -> CRF).  This module is the closed-form counterpart:
a per-sentence float64 forward that mirrors ``NumpyBiLSTMCRF``'s semantics
exactly (per-word-valid char max-pool, per-row LSTM recurrence, combined
``bih + bhh`` bias) plus the full reverse pass.

Per-sentence and float64 on purpose: gradients quantize to integers per
sentence (pipelines/training.py GRAD_SCALE convention) before any sum, so
the epoch gradient — and the whole SGD trajectory — is bit-identical under
any partitioning or CPU count, the same contract the CRF-head trainer
already satisfies.

Parameter blocks (all of init_weights' trainable state):
  dense  : conv_w, conv_b, fc_w, fc_b, trans,
           lstm_{fw,bw}_Wih, lstm_{fw,bw}_Whh, lstm_{fw,bw}_b  (b = bih+bhh
           gradient — applied to BOTH bias vectors, torch's convention for
           a sum of biases), char_embed (tiny: n_chars x char_dim)
  sparse : word_embed — returned as (touched row ids, gradient rows); the
           vocabulary-sized table never travels dense through the shuffle.

Every block is finite-difference tested (tests/test_backprop.py).
"""

from __future__ import annotations

import numpy as np

from ner_pytorch_ray.state.model import crf_grads, _sigmoid

# dense gradient blocks in a FIXED transport order (training partials pack
# them back-to-back as one int64 blob)
DENSE_BLOCKS = (
    "char_embed",
    "conv_w",
    "conv_b",
    "fc_w",
    "fc_b",
    "trans",
    "lstm_fw_Wih",
    "lstm_fw_Whh",
    "lstm_fw_b",
    "lstm_bw_Wih",
    "lstm_bw_Whh",
    "lstm_bw_b",
)


def dense_shapes(w: dict) -> dict[str, tuple]:
    H = int(w["meta"][6])
    return {
        "char_embed": w["char_embed"].shape,
        "conv_w": w["conv_w"].shape,
        "conv_b": w["conv_b"].shape,
        "fc_w": w["fc_w"].shape,
        "fc_b": w["fc_b"].shape,
        "trans": w["trans"].shape,
        "lstm_fw_Wih": w["lstm_fw_Wih"].shape,
        "lstm_fw_Whh": w["lstm_fw_Whh"].shape,
        "lstm_fw_b": (4 * H,),
        "lstm_bw_Wih": w["lstm_bw_Wih"].shape,
        "lstm_bw_Whh": w["lstm_bw_Whh"].shape,
        "lstm_bw_b": (4 * H,),
    }


# --------------------------------------------------------------- char CNN
def _char_forward(w: dict, char_ids: list[list[int]]):
    """[W] words -> cf [W, char_out] float64 + backward cache.

    Mirrors NumpyBiLSTMCRF._char_features: zeroed pad embeddings, conv k=3
    with pad 2, max-pool over each word's OWN valid region (len + 2)."""
    ce = w["char_embed"].astype(np.float64)
    cw = w["conv_w"].astype(np.float64)
    cb = w["conv_b"].astype(np.float64)
    n = len(char_ids)
    char_out = cw.shape[0]
    if n == 0:
        return np.zeros((0, char_out)), None
    lens = np.array([len(c) for c in char_ids], dtype=np.int64)
    lmax = max(int(lens.max()), 1)
    ids = np.zeros((n, lmax), dtype=np.int64)
    for i, cs in enumerate(char_ids):
        if cs:
            ids[i, : len(cs)] = cs
    mask = (np.arange(lmax)[None, :] < lens[:, None]).astype(np.float64)
    emb = ce[ids] * mask[:, :, None]  # [W, L, d_c]
    embp = np.pad(emb, ((0, 0), (2, 2), (0, 0)))
    Lc = lmax + 2
    conv = np.zeros((n, Lc, char_out), dtype=np.float64)
    for k in range(3):
        conv += embp[:, k : k + Lc, :] @ cw[:, k, :].T
    conv += cb[None, None, :]
    valid = np.maximum(lens + 2, 1)
    t_idx = np.arange(Lc)[None, :]
    conv_m = np.where((t_idx < valid[:, None])[:, :, None], conv, -np.inf)
    arg = conv_m.argmax(axis=1)  # [W, char_out] winning time step
    cf = conv_m.max(axis=1)
    return cf, (ids, mask, embp, arg, lens, lmax)


def _char_backward(w: dict, cache, d_cf: np.ndarray):
    """d_cf [W, char_out] -> (d_conv_w, d_conv_b, d_char_embed dense)."""
    cw = w["conv_w"].astype(np.float64)
    ids, mask, embp, arg, lens, lmax = cache
    n, Lc = embp.shape[0], lmax + 2
    char_out = cw.shape[0]
    d_conv = np.zeros((n, Lc, char_out), dtype=np.float64)
    ii = np.arange(n)[:, None]
    cc = np.arange(char_out)[None, :]
    d_conv[ii, arg, cc] = d_cf  # max-pool routes to the winning step
    d_cb = d_cf.sum(axis=0)
    d_cw = np.zeros_like(cw)
    d_embp = np.zeros_like(embp)
    for k in range(3):
        win = embp[:, k : k + Lc, :]
        # conv[., t, c] += win[., t, :] . cw[c, k, :]
        d_cw[:, k, :] += np.einsum("ntc,ntd->cd", d_conv, win)
        d_embp[:, k : k + Lc, :] += d_conv @ cw[:, k, :]
    d_emb = d_embp[:, 2 : 2 + lmax, :] * mask[:, :, None]
    d_ce = np.zeros_like(w["char_embed"], dtype=np.float64)
    flat_ids = ids[mask.astype(bool)]
    flat_grads = d_emb[mask.astype(bool)]
    np.add.at(d_ce, flat_ids, flat_grads)
    return d_cw, d_cb, d_ce


# ------------------------------------------------------------------- LSTM
def _lstm_forward(x: np.ndarray, Wih: np.ndarray, Whh: np.ndarray, b: np.ndarray):
    """Single-sequence LSTM: x [n, d_in] -> (hs [n+1, H], cs [n+1, H],
    gates [n, 4H] post-activation). hs[0]/cs[0] are the zero initial state."""
    n = x.shape[0]
    H = Whh.shape[1]
    hs = np.zeros((n + 1, H), dtype=np.float64)
    cs = np.zeros((n + 1, H), dtype=np.float64)
    gates = np.zeros((n, 4 * H), dtype=np.float64)
    xg = x @ Wih.T + b
    for t in range(n):
        g = xg[t] + hs[t] @ Whh.T
        i = _sigmoid(g[:H])
        f = _sigmoid(g[H : 2 * H])
        gg = np.tanh(g[2 * H : 3 * H])
        o = _sigmoid(g[3 * H :])
        cs[t + 1] = f * cs[t] + i * gg
        hs[t + 1] = o * np.tanh(cs[t + 1])
        gates[t] = np.concatenate([i, f, gg, o])
    return hs, cs, gates


def _lstm_backward(
    x: np.ndarray,
    hs: np.ndarray,
    cs: np.ndarray,
    gates: np.ndarray,
    Wih: np.ndarray,
    Whh: np.ndarray,
    dh_out: np.ndarray,
):
    """Reverse-time BPTT. dh_out [n, H] is dL/d h_t from above.
    Returns (d_Wih, d_Whh, d_b, d_x)."""
    n = x.shape[0]
    H = Whh.shape[1]
    d_Wih = np.zeros_like(Wih, dtype=np.float64)
    d_Whh = np.zeros_like(Whh, dtype=np.float64)
    d_b = np.zeros(4 * H, dtype=np.float64)
    d_x = np.zeros_like(x, dtype=np.float64)
    dh_next = np.zeros(H, dtype=np.float64)
    dc_next = np.zeros(H, dtype=np.float64)
    for t in range(n - 1, -1, -1):
        i = gates[t, :H]
        f = gates[t, H : 2 * H]
        gg = gates[t, 2 * H : 3 * H]
        o = gates[t, 3 * H :]
        tc = np.tanh(cs[t + 1])
        dh = dh_out[t] + dh_next
        do = dh * tc
        dc = dh * o * (1.0 - tc * tc) + dc_next
        di = dc * gg
        df = dc * cs[t]
        dg = dc * i
        da = np.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - gg * gg),
                do * o * (1.0 - o),
            ]
        )
        d_Wih += np.outer(da, x[t])
        d_Whh += np.outer(da, hs[t])
        d_b += da
        d_x[t] = da @ Wih
        dh_next = da @ Whh
        dc_next = dc * f
    return d_Wih, d_Whh, d_b, d_x


# ------------------------------------------------------------ full network
def full_forward(w: dict, word_ids: list[int], char_ids: list[list[int]]):
    """One sentence -> (feats [n, C] float64, cache). Per-sentence (no
    batch padding) so the values are batch-composition independent by
    construction."""
    wi = np.asarray(word_ids, dtype=np.int64)
    cf, char_cache = _char_forward(w, char_ids)
    we = w["word_embed"].astype(np.float64)[wi]
    x = np.concatenate([we, cf], axis=1)  # [n, d_in]
    fw = (
        w["lstm_fw_Wih"].astype(np.float64),
        w["lstm_fw_Whh"].astype(np.float64),
        (w["lstm_fw_bih"] + w["lstm_fw_bhh"]).astype(np.float64),
    )
    bw = (
        w["lstm_bw_Wih"].astype(np.float64),
        w["lstm_bw_Whh"].astype(np.float64),
        (w["lstm_bw_bih"] + w["lstm_bw_bhh"]).astype(np.float64),
    )
    hs_f, cs_f, gates_f = _lstm_forward(x, *fw)
    xr = x[::-1].copy()
    hs_b, cs_b, gates_b = _lstm_forward(xr, *bw)
    H = hs_f.shape[1]
    h = np.concatenate([hs_f[1:], hs_b[1:][::-1]], axis=1)  # [n, 2H]
    fc_w = w["fc_w"].astype(np.float64)
    fc_b = w["fc_b"].astype(np.float64)
    feats = h @ fc_w.T + fc_b
    cache = (wi, char_cache, x, xr, fw, bw, hs_f, cs_f, gates_f, hs_b, cs_b,
             gates_b, h, fc_w, H)
    return feats, cache


def full_grads(
    w: dict,
    word_ids: list[int],
    char_ids: list[list[int]],
    tag_ids,
    start_idx: int,
    stop_idx: int,
):
    """Per-sentence NLL + gradients for EVERY parameter block.

    Returns (nll, dense: dict[name -> float64 array per DENSE_BLOCKS],
    word_rows: (ids [k], grads [k, d_w]) — the sparse word-embedding rows,
    one entry per token occurrence, unaggregated)."""
    feats, cache = full_forward(w, word_ids, char_ids)
    (wi, char_cache, x, xr, fw, bw, hs_f, cs_f, gates_f, hs_b, cs_b,
     gates_b, h, fc_w, H) = cache
    nll, d_feats, d_trans = crf_grads(
        feats, tag_ids, w["trans"], start_idx, stop_idx
    )

    d_fc_w = d_feats.T @ h
    d_fc_b = d_feats.sum(axis=0)
    dh = d_feats @ fc_w  # [n, 2H]

    d_Wih_f, d_Whh_f, d_b_f, d_x_f = _lstm_backward(
        x, hs_f, cs_f, gates_f, fw[0], fw[1], dh[:, :H]
    )
    d_Wih_b, d_Whh_b, d_b_b, d_x_b = _lstm_backward(
        xr, hs_b, cs_b, gates_b, bw[0], bw[1], dh[:, H:][::-1]
    )
    d_x = d_x_f + d_x_b[::-1]

    d_w = w["word_embed"].shape[1]
    d_we_rows = d_x[:, :d_w]  # one gradient row per token occurrence
    d_cf = d_x[:, d_w:]
    d_cw, d_cb, d_ce = _char_backward(w, char_cache, d_cf)

    dense = {
        "char_embed": d_ce,
        "conv_w": d_cw,
        "conv_b": d_cb,
        "fc_w": d_fc_w,
        "fc_b": d_fc_b,
        "trans": d_trans,
        "lstm_fw_Wih": d_Wih_f,
        "lstm_fw_Whh": d_Whh_f,
        "lstm_fw_b": d_b_f,
        "lstm_bw_Wih": d_Wih_b,
        "lstm_bw_Whh": d_Whh_b,
        "lstm_bw_b": d_b_b,
    }
    return nll, dense, (wi, d_we_rows)
