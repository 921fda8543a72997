"""Numpy BiLSTM-CRF forward + Viterbi decode — the neural tagger's math.

A from-scratch numpy re-expression of the reference model's inference path
(no torch in this environment):

  - char CNN (k=3, padding 2, max-pool over time): model.py:68,157-161
  - word embedding + concat: model.py:70-75,178-189
  - bidirectional word LSTM: model.py:81-91,193-196
  - CRF linear + transitions (START/STOP rows at IMPOSSIBLE=-1e4):
    crf.py:29-34
  - masked Viterbi DP + per-row backtrace: crf.py:91-135

Two deliberate divergences from the torch code, both batch-hygiene fixes
(SURVEY.md §7.4 "Viterbi parity"):
  * the char-CNN max-pool runs over each word's own valid conv region
    (length lc+2), not the batch-padded width — torch's version lets zero
    padding of *other longer words* leak into the max, making outputs depend
    on batch composition;
  * the LSTM runs per-row-independent recurrences, so any batching of
    sentences yields identical per-sentence features.

All weights are deterministic (seeded) and saved/loaded as npz; decode is
invariant to batch composition — property-tested.
"""

from __future__ import annotations

import numpy as np

IMPOSSIBLE = -1e4


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _uniform(rng, shape, bound):
    return rng.uniform(-bound, bound, size=shape).astype(np.float32)


def init_weights(
    n_words: int,
    n_chars: int,
    n_tags: int,
    word_dim: int = 100,
    char_dim: int = 25,
    char_out: int = 25,
    hidden: int = 50,
    seed: int = 1234,
    word_embeds: np.ndarray | None = None,
) -> dict[str, np.ndarray]:
    """Deterministic model parameters (shapes per arguments.py:34-47 defaults,
    hidden shrunk for sandbox speed; START=n_tags-2, STOP=n_tags-1)."""
    rng = np.random.RandomState(seed)
    d_in = word_dim + char_out
    w = {
        "char_embed": _uniform(rng, (n_chars, char_dim), np.sqrt(3.0 / char_dim)),
        "conv_w": _uniform(rng, (char_out, 3, char_dim), np.sqrt(6.0 / (3 * char_dim))),
        "conv_b": np.zeros(char_out, dtype=np.float32),
        "word_embed": (
            word_embeds.astype(np.float32)
            if word_embeds is not None
            else _uniform(rng, (n_words, word_dim), np.sqrt(3.0 / word_dim))
        ),
        "fc_w": _uniform(rng, (n_tags, 2 * hidden), np.sqrt(6.0 / (2 * hidden))),
        "fc_b": np.zeros(n_tags, dtype=np.float32),
        "trans": rng.randn(n_tags, n_tags).astype(np.float32),
    }
    for direction in ("fw", "bw"):
        w[f"lstm_{direction}_Wih"] = _uniform(rng, (4 * hidden, d_in), np.sqrt(6.0 / d_in))
        w[f"lstm_{direction}_Whh"] = _uniform(rng, (4 * hidden, hidden), np.sqrt(6.0 / hidden))
        w[f"lstm_{direction}_bih"] = np.zeros(4 * hidden, dtype=np.float32)
        w[f"lstm_{direction}_bhh"] = np.zeros(4 * hidden, dtype=np.float32)
    # transition factor T[i, j] = score of j -> i (crf.py:31-34)
    start, stop = n_tags - 2, n_tags - 1
    w["trans"][start, :] = IMPOSSIBLE
    w["trans"][:, stop] = IMPOSSIBLE
    w["meta"] = np.array([n_words, n_chars, n_tags, word_dim, char_dim, char_out, hidden])
    return w


def save_weights(path: str, w: dict[str, np.ndarray]) -> None:
    np.savez_compressed(path, **w)


def load_weights(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


class NumpyBiLSTMCRF:
    """Inference-only BiLSTM-CRF over pre-encoded sentences."""

    def __init__(self, w: dict[str, np.ndarray]):
        self.w = w
        meta = w["meta"]
        self.n_tags = int(meta[2])
        self.hidden = int(meta[6])
        self.char_out = int(meta[5])
        self.start_idx = self.n_tags - 2
        self.stop_idx = self.n_tags - 1

    # ---------------------------------------------------------------- chars
    def _char_features(self, char_ids: list[list[int]]) -> np.ndarray:
        """[W, char_out] per word; max-pool over each word's own conv region."""
        w = self.w
        n = len(char_ids)
        if n == 0:
            return np.zeros((0, self.char_out), dtype=np.float32)
        lens = np.array([len(c) for c in char_ids], dtype=np.int64)
        lmax = max(int(lens.max()), 1)
        ids = np.zeros((n, lmax), dtype=np.int64)
        for i, cs in enumerate(char_ids):
            if cs:
                ids[i, : len(cs)] = cs
        emb = w["char_embed"][ids]  # [W, L, d_c]
        # zero out embedding at padded positions (conv padding is zeros)
        mask = (np.arange(lmax)[None, :] < lens[:, None]).astype(np.float32)
        emb = emb * mask[:, :, None]
        # pad 2 zeros each side along time
        emb = np.pad(emb, ((0, 0), (2, 2), (0, 0)))
        # conv k=3 over time: out[t] = sum_k emb[t+k] . conv_w[:,k,:]
        Lc = lmax + 2  # output length per conv arithmetic (L + 2*2 - 3 + 1)
        conv = np.zeros((n, Lc, self.char_out), dtype=np.float32)
        cw = w["conv_w"]  # [out, 3, d_c]
        for k in range(3):
            conv += emb[:, k : k + Lc, :] @ cw[:, k, :].T
        conv += w["conv_b"][None, None, :]
        # mask positions beyond each word's valid conv length (= len + 2)
        valid = np.maximum(lens + 2, 1)
        t_idx = np.arange(Lc)[None, :]
        conv = np.where((t_idx < valid[:, None])[:, :, None], conv, -np.inf)
        return conv.max(axis=1).astype(np.float32)

    # ---------------------------------------------------------------- lstm
    def _lstm_dir(self, x: np.ndarray, direction: str) -> np.ndarray:
        """x: [B, L, d_in] -> h: [B, L, H]; per-row independent recurrence."""
        w = self.w
        Wih = w[f"lstm_{direction}_Wih"]
        Whh = w[f"lstm_{direction}_Whh"]
        b = w[f"lstm_{direction}_bih"] + w[f"lstm_{direction}_bhh"]
        B, L, _ = x.shape
        H = self.hidden
        h = np.zeros((B, H), dtype=np.float32)
        c = np.zeros((B, H), dtype=np.float32)
        out = np.zeros((B, L, H), dtype=np.float32)
        xg = x @ Wih.T + b  # [B, L, 4H] — hoisted input projection
        for t in range(L):
            g = xg[:, t, :] + h @ Whh.T
            i = _sigmoid(g[:, :H])
            f = _sigmoid(g[:, H : 2 * H])
            gg = np.tanh(g[:, 2 * H : 3 * H])
            o = _sigmoid(g[:, 3 * H :])
            c = f * c + i * gg
            h = o * np.tanh(c)
            out[:, t, :] = h
        return out

    def hidden_states(
        self, word_ids_list: list[list[int]], char_ids_list: list[list[list[int]]]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Padded BiLSTM hidden states [B, L, 2H] + lengths [B] — the
        frozen-backbone output the trainable CRF head (fc + transitions)
        consumes in the distributed training epoch (train.py:404-516
        analog: embeddings/char-CNN/LSTM stay frozen, the head learns)."""
        w = self.w
        B = len(word_ids_list)
        lens = np.array([len(s) for s in word_ids_list], dtype=np.int64)
        L = max(int(lens.max()), 1) if B else 1

        flat_chars = [cs for sent in char_ids_list for cs in sent]
        cf = self._char_features(flat_chars)  # [ΣW, char_out]

        d_w = w["word_embed"].shape[1]
        x = np.zeros((B, L, d_w + self.char_out), dtype=np.float32)
        pos = 0
        for bi, sent in enumerate(word_ids_list):
            n = len(sent)
            x[bi, :n, :d_w] = w["word_embed"][np.asarray(sent, dtype=np.int64)]
            x[bi, :n, d_w:] = cf[pos : pos + n]
            pos += n

        h_fw = self._lstm_dir(x, "fw")
        # reverse per-row by true length
        x_rev = np.zeros_like(x)
        for bi, n in enumerate(lens):
            x_rev[bi, :n] = x[bi, :n][::-1]
        h_bw_r = self._lstm_dir(x_rev, "bw")
        h_bw = np.zeros_like(h_bw_r)
        for bi, n in enumerate(lens):
            h_bw[bi, :n] = h_bw_r[bi, :n][::-1]

        return np.concatenate([h_fw, h_bw], axis=2), lens  # [B, L, 2H]

    def _features(
        self, word_ids_list: list[list[int]], char_ids_list: list[list[list[int]]]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Padded emissions [B, L, C] + lengths [B]."""
        h, lens = self.hidden_states(word_ids_list, char_ids_list)
        feats = h @ self.w["fc_w"].T + self.w["fc_b"]
        return feats.astype(np.float32), lens

    # ---------------------------------------------------------------- viterbi
    def viterbi(self, feats: np.ndarray, lens: np.ndarray) -> list[list[int]]:
        """Masked Viterbi decode (crf.py:91-135 semantics)."""
        w = self.w
        B, L, C = feats.shape
        trans = w["trans"]  # [C, C], T[i, j] = j -> i
        bps = np.zeros((B, L, C), dtype=np.int64)
        max_score = np.full((B, C), IMPOSSIBLE, dtype=np.float32)
        max_score[:, self.start_idx] = 0.0
        mask = (np.arange(L)[None, :] < lens[:, None]).astype(np.float32)
        for t in range(L):
            acc = max_score[:, None, :] + trans[None, :, :]  # [B, C(to), C(from)]
            bps[:, t, :] = np.argmax(acc, axis=2)
            acc_max = np.max(acc, axis=2) + feats[:, t, :]
            m = mask[:, t][:, None]
            max_score = acc_max * m + max_score * (1.0 - m)
        max_score = max_score + trans[self.stop_idx][None, :]
        best_tag = np.argmax(max_score, axis=1)
        paths: list[list[int]] = []
        for b in range(B):
            tag = int(best_tag[b])
            n = int(lens[b])
            path = [tag]
            for t in range(n - 1, -1, -1):
                tag = int(bps[b, t, tag])
                path.append(tag)
            paths.append(path[-2::-1])  # drop START, reverse
        return paths

    def decode(
        self, word_ids_list: list[list[int]], char_ids_list: list[list[list[int]]]
    ) -> list[list[int]]:
        """Batch decode -> per-sentence tag-id paths (batch-invariant)."""
        if not word_ids_list:
            return []
        feats, lens = self._features(word_ids_list, char_ids_list)
        return self.viterbi(feats, lens)

    # ------------------------------------------------------------------- nll
    def _gold_score(
        self, feats: np.ndarray, tags: np.ndarray, lens: np.ndarray
    ) -> np.ndarray:
        """Score of the provided tag path (crf.py:67-90 __score_sentence):
        sum of masked emission + transition scores, START prepended, final
        transition to STOP from the last real tag."""
        B, L, C = feats.shape
        trans = self.w["trans"].astype(np.float64)
        mask = (np.arange(L)[None, :] < lens[:, None]).astype(np.float64)
        bi = np.arange(B)[:, None]
        ti = np.arange(L)[None, :]
        emit = feats.astype(np.float64)[bi, ti, tags]  # [B, L]
        prev = np.concatenate(
            [np.full((B, 1), self.start_idx, dtype=np.int64), tags[:, :-1]],
            axis=1,
        )
        tr = trans[tags, prev]  # [B, L]: prev -> tag
        last_tag = tags[np.arange(B), np.maximum(lens - 1, 0)]
        last = trans[self.stop_idx, last_tag]
        return ((emit + tr) * mask).sum(axis=1) + last

    def _forward_score(self, feats: np.ndarray, lens: np.ndarray) -> np.ndarray:
        """log partition via the masked forward algorithm
        (crf.py:137-159 __forward_algorithm)."""
        B, L, C = feats.shape
        trans = self.w["trans"].astype(np.float64)
        scores = np.full((B, C), IMPOSSIBLE, dtype=np.float64)
        scores[:, self.start_idx] = 0.0
        mask = (np.arange(L)[None, :] < lens[:, None]).astype(np.float64)
        f64 = feats.astype(np.float64)
        for t in range(L):
            # [B, to, from] = scores[B, from] + trans[to, from] + feat[B, to]
            acc = scores[:, None, :] + trans[None, :, :] + f64[:, t, :][:, :, None]
            mx = acc.max(axis=2)
            score_t = mx + np.log(np.exp(acc - mx[:, :, None]).sum(axis=2))
            m = mask[:, t][:, None]
            scores = score_t * m + scores * (1.0 - m)
        final = scores + trans[self.stop_idx][None, :]
        mx = final.max(axis=1)
        return mx + np.log(np.exp(final - mx[:, None]).sum(axis=1))

    def nll(
        self,
        word_ids_list: list[list[int]],
        char_ids_list: list[list[list[int]]],
        tag_ids_list: list[list[int]],
    ) -> np.ndarray:
        """T3: per-sentence CRF negative log-likelihood (crf.py:47-65 loss
        with avg=False — the reference's train.py:383-395 dynamic_inference
        ranks adversarial variants by exactly this). Batch-invariant: the
        DP is masked by true lengths, so any batching yields the same
        per-sentence values."""
        if not word_ids_list:
            return np.zeros(0, dtype=np.float64)
        feats, lens = self._features(word_ids_list, char_ids_list)
        L = feats.shape[1]
        tags = np.zeros((len(tag_ids_list), L), dtype=np.int64)
        for i, ts in enumerate(tag_ids_list):
            tags[i, : len(ts)] = ts
        return self._forward_score(feats, lens) - self._gold_score(
            feats, tags, lens
        )


# ===================================================================== head
# Trainable CRF head (fc + transitions) over the frozen BiLSTM backbone —
# the analytic-gradient core of the distributed training epoch
# (pipelines/training.py; reference lifecycle train.py:404-516, where
# loss.backward() differentiates the same NLL; here the CRF-layer gradient
# is computed in closed form via forward-backward marginals).


def _logsumexp(a: np.ndarray, axis: int) -> np.ndarray:
    mx = a.max(axis=axis, keepdims=True)
    return (mx + np.log(np.exp(a - mx).sum(axis=axis, keepdims=True))).squeeze(
        axis=axis
    )


def head_emissions(h: np.ndarray, fc_w: np.ndarray, fc_b: np.ndarray) -> np.ndarray:
    """[n, 2H] hidden states -> [n, C] emission scores (float64)."""
    return h.astype(np.float64) @ fc_w.astype(np.float64).T + fc_b.astype(
        np.float64
    )


def crf_grads(
    feats: np.ndarray,
    tag_ids: np.ndarray,
    trans: np.ndarray,
    start_idx: int,
    stop_idx: int,
) -> tuple[float, np.ndarray, np.ndarray]:
    """CRF-layer NLL + analytic gradients w.r.t. emissions and transitions.

    NLL = logZ - gold_score (crf.py:47-65 semantics). By forward-backward:
      * d/d emissions[t, c]   = unary marginal p(y_t = c)       - 1[gold]
      * d/d trans[i, j]       = pairwise marginal p(y_{t-1}=j, y_t=i)
                                (+ START/STOP expected counts)  - gold counts
    The structurally-pinned IMPOSSIBLE entries (row INTO start, column FROM
    stop — init_weights) get zero gradient so they stay pinned under SGD.
    All float64; returns (nll, d_feats [n,C], d_trans [C,C]). This is the
    shared CRF backward for BOTH the head-only trainer (crf_head_grads)
    and the full-model backprop (state/backprop.py)."""
    T = trans.astype(np.float64)
    n, C = feats.shape
    gold = np.asarray(tag_ids, dtype=np.int64)

    # forward
    alpha = np.empty((n, C), dtype=np.float64)
    alpha[0] = T[:, start_idx] + feats[0]
    for t in range(1, n):
        alpha[t] = _logsumexp(alpha[t - 1][None, :] + T, axis=1) + feats[t]
    log_z = float(_logsumexp((alpha[n - 1] + T[stop_idx])[None, :], axis=1)[0])

    # backward
    beta = np.empty((n, C), dtype=np.float64)
    beta[n - 1] = T[stop_idx]
    for t in range(n - 2, -1, -1):
        # acc[i, j] = trans[i, j] + feats[t+1, i] + beta[t+1, i]
        beta[t] = _logsumexp(T + (feats[t + 1] + beta[t + 1])[:, None], axis=0)

    # unary marginals / emission gradient
    m = np.exp(alpha + beta - log_z)  # [n, C]
    d_feats = m.copy()
    d_feats[np.arange(n), gold] -= 1.0

    # pairwise marginals / transition gradient — one broadcast exp over
    # [n-1, C(to), C(from)] instead of a python loop over t
    if n > 1:
        acc = (
            alpha[:-1, None, :]
            + T[None, :, :]
            + (feats[1:] + beta[1:])[:, :, None]
            - log_z
        )
        d_trans = np.exp(acc).sum(axis=0)
    else:
        d_trans = np.zeros((C, C), dtype=np.float64)
    d_trans[:, start_idx] += m[0]        # expected START -> y_0
    d_trans[stop_idx, :] += m[n - 1]     # expected y_last -> STOP
    prev = start_idx
    for t in range(n):
        d_trans[gold[t], prev] -= 1.0
        prev = int(gold[t])
    d_trans[stop_idx, prev] -= 1.0
    d_trans[start_idx, :] = 0.0  # pinned IMPOSSIBLE row (into START)
    d_trans[:, stop_idx] = 0.0   # pinned IMPOSSIBLE column (from STOP)

    # gold score -> nll
    emit = float(feats[np.arange(n), gold].sum())
    tr = float(T[gold[0], start_idx] + T[stop_idx, gold[n - 1]])
    if n > 1:
        tr += float(T[gold[1:], gold[:-1]].sum())
    nll = log_z - (emit + tr)
    return nll, d_feats, d_trans


def crf_head_grads(
    h: np.ndarray,
    tag_ids: np.ndarray,
    fc_w: np.ndarray,
    fc_b: np.ndarray,
    trans: np.ndarray,
    start_idx: int,
    stop_idx: int,
) -> tuple[float, np.ndarray, np.ndarray, np.ndarray]:
    """Per-sentence CRF NLL + analytic gradients for the trainable HEAD
    over frozen hidden states h [n, 2H]:
      d_fc_w = d_emissions^T @ h ; d_fc_b = sum_t d_emissions[t]
    (emission/transition gradients from the shared :func:`crf_grads`).
    Returns (nll, d_fc_w [C,2H], d_fc_b [C], d_trans [C,C])."""
    h = h.astype(np.float64)
    feats = head_emissions(h, fc_w, fc_b)  # [n, C]
    nll, d_feats, d_trans = crf_grads(feats, tag_ids, trans, start_idx, stop_idx)
    d_fc_w = d_feats.T @ h
    d_fc_b = d_feats.sum(axis=0)
    return nll, d_fc_w, d_fc_b, d_trans


def crf_head_nll(
    h: np.ndarray,
    tag_ids: np.ndarray,
    fc_w: np.ndarray,
    fc_b: np.ndarray,
    trans: np.ndarray,
    start_idx: int,
    stop_idx: int,
) -> float:
    """Forward-only per-sentence head NLL (same value as
    ``crf_head_grads``'s first return, ~3x cheaper — no backward pass, no
    pairwise marginals). Used to RANK adversarial variants before grads are
    computed only for the selected ones (train.py:383-395
    dynamic_inference semantics)."""
    h = h.astype(np.float64)
    T = trans.astype(np.float64)
    feats = head_emissions(h, fc_w, fc_b)
    n, _ = feats.shape
    gold = np.asarray(tag_ids, dtype=np.int64)
    alpha = T[:, start_idx] + feats[0]
    for t in range(1, n):
        alpha = _logsumexp(alpha[None, :] + T, axis=1) + feats[t]
    log_z = float(_logsumexp((alpha + T[stop_idx])[None, :], axis=1)[0])
    emit = float(feats[np.arange(n), gold].sum())
    tr = float(T[gold[0], start_idx] + T[stop_idx, gold[n - 1]])
    if n > 1:
        tr += float(T[gold[1:], gold[:-1]].sum())
    return log_z - (emit + tr)


def viterbi_path(
    feats: np.ndarray, trans: np.ndarray, start_idx: int, stop_idx: int
) -> list[int]:
    """Single-sentence Viterbi over precomputed emissions [n, C]
    (crf.py:91-135 semantics — used by the training dev-eval, where
    emissions come from cached hidden states and the LEARNED head)."""
    T = trans.astype(np.float64)
    n, C = feats.shape
    score = np.full(C, IMPOSSIBLE, dtype=np.float64)
    score[start_idx] = 0.0
    bps = np.zeros((n, C), dtype=np.int64)
    for t in range(n):
        acc = score[None, :] + T  # [to, from]
        bps[t] = np.argmax(acc, axis=1)
        score = acc.max(axis=1) + feats[t]
    score = score + T[stop_idx]
    tag = int(np.argmax(score))
    path = [tag]
    for t in range(n - 1, 0, -1):
        tag = int(bps[t, tag])
        path.append(tag)
    return path[::-1]
