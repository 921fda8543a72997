"""Distributed FULL-MODEL training — every parameter the reference steps.

The reference's training loop backprops through the entire network
(train.py:478-479: ``loss.backward(); clip_grad_norm; optimizer.step()``
over char embeddings, char CNN, word embeddings, word BiLSTM, linear, CRF —
model.py:34-219).  pipelines/training.py trains only the CRF head over a
frozen backbone; this module removes that restriction.

Ray-Data shape (one fused distributed pass per epoch, like EpochPassFn):

  1. **Encoded cache** (once): sentences -> vocab -> encode; gold labels
     fixed before training (teacher-head Viterbi over the INITIAL backbone,
     the same distillation convention as training.feature_cache, or the
     gazetteer annotation).  The cache holds (word_ids, char_ids, gold tag
     ids, is_dev, tags_true) — no hidden states, because the backbone now
     CHANGES every epoch and each pass re-runs the full forward.
  2. **Fused epoch pass** (FullPassFn task closure, current weights shipped
     once per epoch): train rows run forward + full backward
     (state/backprop.full_grads) per sentence; gradients quantize to
     INTEGERS per sentence (GRAD_SCALE) before any sum, so the epoch
     gradient — and the SGD trajectory and checkpoint — is bit-identical
     under any partitioning / CPU count.  Word-embedding gradients travel
     SPARSE (touched row ids + int rows): the vocabulary-sized table never
     moves dense through the reduce — at web scale a block's partial is
     bounded by its token count, not by |V|.  Dev rows run forward + Viterbi
     into distributive conlleval span counts.
  3. **Driver-side optimizer**: SGD + momentum + global-norm clip over ALL
     parameter blocks (the driver's master copy is the same float64 state a
     parameter server would shard at |V| ~ 1e8; here the optimizer state is
     MB-sized by construction — word_dim 50).

`quantized_sentence_grads` is the atomic unit shared VERBATIM by the
distributed pass and tools/make_expected.py's sequential recompute, so the
frozen `training_curve_full` oracle checks partitioning-invariance of the
whole trajectory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ner_pytorch_ray.state.backprop import (
    DENSE_BLOCKS,
    dense_shapes,
    full_forward,
    full_grads,
)
from ner_pytorch_ray.state.model import save_weights, viterbi_path
from ner_pytorch_ray.pipelines.training import (
    GRAD_SCALE,
    NLL_SCALE,
    _dev_of,
    teacher_head,
)

TRAINED_PARAMS = (
    "char_embed",
    "conv_w",
    "conv_b",
    "word_embed",
    "fc_w",
    "fc_b",
    "trans",
    "lstm_fw_Wih",
    "lstm_fw_Whh",
    "lstm_fw_bih",
    "lstm_fw_bhh",
    "lstm_bw_Wih",
    "lstm_bw_Whh",
    "lstm_bw_bih",
    "lstm_bw_bhh",
)


def _dense_size(shapes: dict[str, tuple]) -> int:
    return int(sum(np.prod(shapes[k]) for k in DENSE_BLOCKS))


def quantized_sentence_grads(
    w: dict,
    word_ids: list[int],
    char_ids: list[list[int]],
    tag_ids,
    start_idx: int,
    stop_idx: int,
    shapes: dict[str, tuple],
):
    """ONE sentence -> (nll_i, dense int64 flat vector, word ids [k],
    word int64 grad rows [k, d_w]).

    The quantization unit: float64 gradients are computed per sentence and
    rounded to GRAD_SCALE integers HERE — word rows aggregated per distinct
    word id within the sentence first — so any grouping of sentences into
    batches/blocks sums the same integers."""
    nll, dense, (wi, we_rows) = full_grads(
        w, word_ids, char_ids, tag_ids, start_idx, stop_idx
    )
    flat = np.concatenate([dense[k].ravel() for k in DENSE_BLOCKS])
    flat_i = np.rint(flat * GRAD_SCALE).astype(np.int64)
    # per-sentence aggregation over repeated words, then one rounding
    uniq, inv = np.unique(wi, return_inverse=True)
    agg = np.zeros((len(uniq), we_rows.shape[1]), dtype=np.float64)
    np.add.at(agg, inv, we_rows)
    agg_i = np.rint(agg * GRAD_SCALE).astype(np.int64)
    return int(round(nll * NLL_SCALE)), flat_i, uniq, agg_i


def full_feature_cache(
    sf_dir: str,
    seed: int,
    dev_mod: int = 5,
    labels: str = "teacher",
) -> tuple[ray.data.Dataset, dict, dict]:
    """Encoded + labeled sentence cache for full-model training.

    Labels are FIXED before training: "teacher" = Viterbi of a seed+1 head
    over the INITIAL frozen backbone's hidden states (training.FeatureActor
    convention — realizable, so the loss demonstrably falls); "gazetteer" =
    the corpus annotation (reference workflow)."""
    from ner_pytorch_ray.pipelines.neural import build_vocab_state, frozen_weights
    from ner_pytorch_ray.sources.pages import pages_from_documents
    from ner_pytorch_ray.stages.encode import encode_stage
    from ner_pytorch_ray.stages.extract import extract_stage
    from ner_pytorch_ray.stages.gazetteer import gazetteer_tag_stage
    from ner_pytorch_ray.stages.sentences import sentences_stage

    sents = sentences_stage(
        extract_stage(pages_from_documents(sf_dir)), zeros=True
    ).materialize()
    vocab = build_vocab_state(sents)
    weights = frozen_weights(vocab, seed)
    labeled = gazetteer_tag_stage(sents)
    encoded = encode_stage(labeled, vocab["word_to_id"], vocab["char_to_id"])
    teacher = teacher_head(vocab, seed + 1) if labels == "teacher" else None

    tag_to_id = dict(vocab["tag_to_id"])
    id_to_tag = {v: k for k, v in tag_to_id.items()}

    from ner_pytorch_ray.state.model import NumpyBiLSTMCRF, head_emissions

    model = NumpyBiLSTMCRF(weights)

    def label_rows(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        sids = batch.column("sent_id").to_pylist()
        word_ids = batch.column("word_ids").to_pylist()
        char_ids = batch.column("char_ids").to_pylist()
        tags = batch.column("tags").to_pylist()
        tb, gold_strs, ns = [], [], []
        for wds, cds, ts in zip(word_ids, char_ids, tags):
            if teacher is not None:
                h, _ = model.hidden_states([wds], [cds])
                hn = h[0, : len(wds)].astype("<f4")
                t_w, t_b, t_t = teacher
                feats = head_emissions(hn.astype(np.float64), t_w, t_b)
                tids = viterbi_path(
                    feats, t_t, model.start_idx, model.stop_idx
                )
                gold_strs.append([id_to_tag[t] for t in tids])
            else:
                tids = [tag_to_id[t] for t in ts]
                gold_strs.append(list(ts))
            tb.append(np.array(tids, dtype="<i8").tobytes())
            ns.append(len(wds))
        dev = [_dev_of(u, int(s), dev_mod) for u, s in zip(urls, sids)]
        return pa.Table.from_pydict(
            {
                "url": pa.array(urls, type=pa.string()),
                "sent_id": pa.array(sids, type=pa.int64()),
                "n_tokens": pa.array(ns, type=pa.int64()),
                "word_ids": batch.column("word_ids"),
                "char_ids": batch.column("char_ids"),
                "tb": pa.array(tb, type=pa.binary()),
                "is_dev": pa.array(dev, type=pa.bool_()),
                "tags_true": pa.array(gold_strs, type=pa.list_(pa.string())),
            }
        )

    cache = encoded.map_batches(label_rows, batch_size=256, batch_format="pyarrow")
    return cache.materialize(), vocab, weights


class FullPassFn:
    """Fused full-model epoch pass (task closure — current float64 weights
    embedded, one plasma object per epoch stage): train rows emit integer
    gradient partials for EVERY parameter block (dense flat blob + sparse
    word-embedding rows); dev rows emit conlleval span-count partials."""

    def __init__(self, w64, id_to_tag: dict[int, str], start_idx, stop_idx):
        self.w = ray.get(w64) if isinstance(w64, ray.ObjectRef) else w64
        self.id_to_tag = {int(k): v for k, v in id_to_tag.items()}
        self.start_idx, self.stop_idx = start_idx, stop_idx
        self.shapes = dense_shapes(self.w)
        self.dsize = _dense_size(self.shapes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        from ner_pytorch_ray.functions.conlleval import ChunkCounts, count_chunks

        acc = np.zeros(self.dsize, dtype=np.int64)
        wgrads: dict[int, np.ndarray] = {}
        nll_i = 0
        n_sent = 0
        n_tok = 0
        counts = ChunkCounts()
        tags_true = batch.column("tags_true").to_pylist()
        for wds, cds, tbb, dev, ts in zip(
            batch.column("word_ids").to_pylist(),
            batch.column("char_ids").to_pylist(),
            batch.column("tb").to_pylist(),
            batch.column("is_dev").to_pylist(),
            tags_true,
        ):
            gold = np.frombuffer(tbb, dtype="<i8")
            if dev:
                feats, _ = full_forward(self.w, wds, cds)
                path = viterbi_path(
                    feats, self.w["trans"], self.start_idx, self.stop_idx
                )
                counts.merge(
                    count_chunks(ts, [self.id_to_tag[t] for t in path])
                )
            else:
                s_nll, flat_i, uniq, agg_i = quantized_sentence_grads(
                    self.w, wds, cds, gold,
                    self.start_idx, self.stop_idx, self.shapes,
                )
                acc += flat_i
                for wid, row in zip(uniq, agg_i):
                    cur = wgrads.get(int(wid))
                    if cur is None:
                        wgrads[int(wid)] = row.copy()
                    else:
                        cur += row
                nll_i += s_nll
                n_sent += 1
                n_tok += len(wds)
        wid_sorted = sorted(wgrads)
        wid_arr = np.array(wid_sorted, dtype=np.int64)
        wrow_arr = (
            np.stack([wgrads[i] for i in wid_sorted])
            if wid_sorted
            else np.zeros((0, self.w["word_embed"].shape[1]), dtype=np.int64)
        )
        return pa.Table.from_pydict(
            {
                "n": pa.array([n_sent], type=pa.int64()),
                "n_tok": pa.array([n_tok], type=pa.int64()),
                "nll_i": pa.array([nll_i], type=pa.int64()),
                "gd": pa.array([acc.astype("<i8").tobytes()], type=pa.binary()),
                "wid": pa.array([wid_arr.astype("<i8").tobytes()], type=pa.binary()),
                "wrow": pa.array([wrow_arr.astype("<i8").tobytes()], type=pa.binary()),
                "counts_json": pa.array(
                    [json.dumps(counts.to_lists())], type=pa.string()
                ),
            }
        )


def full_epoch_pass(
    encoded: ray.data.Dataset,
    w64: dict,
    id_to_tag: dict[int, str],
    start_idx: int,
    stop_idx: int,
):
    """One fused distributed pass -> integer-exact full-model gradients +
    dev span F1 under the CURRENT weights. Returns
    (n, n_tok, nll_i, dense_int flat, word_int [n_words, d_w], f1)."""
    import json

    from ner_pytorch_ray.functions.conlleval import ChunkCounts, evaluate_counts

    shapes = dense_shapes(w64)
    dsize = _dense_size(shapes)
    d_w = w64["word_embed"].shape[1]
    fn = FullPassFn(w64, id_to_tag, start_idx, stop_idx)
    parts = encoded.map_batches(fn, batch_size=128, batch_format="pyarrow")
    n = 0
    n_tok = 0
    nll_i = 0
    dense_i = np.zeros(dsize, dtype=np.int64)
    word_i = np.zeros((w64["word_embed"].shape[0], d_w), dtype=np.int64)
    total = ChunkCounts()
    for b in parts.iter_batches(batch_format="pyarrow"):
        n += int(np.sum(b.column("n").to_numpy()))
        n_tok += int(np.sum(b.column("n_tok").to_numpy()))
        nll_i += int(np.sum(b.column("nll_i").to_numpy()))
        for blob in b.column("gd").to_pylist():
            dense_i += np.frombuffer(blob, dtype="<i8")
        for ib, rb in zip(b.column("wid").to_pylist(), b.column("wrow").to_pylist()):
            ids = np.frombuffer(ib, dtype="<i8")
            if len(ids):
                rows = np.frombuffer(rb, dtype="<i8").reshape(len(ids), d_w)
                np.add.at(word_i, ids, rows)
        for s in b.column("counts_json").to_pylist():
            total.merge(ChunkCounts.from_lists(json.loads(s)))
    f1 = float(evaluate_counts(total)["f1"])
    return n, n_tok, nll_i, dense_i, word_i, f1


def unpack_dense(flat: np.ndarray, shapes: dict[str, tuple]) -> dict[str, np.ndarray]:
    out = {}
    off = 0
    for k in DENSE_BLOCKS:
        sz = int(np.prod(shapes[k]))
        out[k] = flat[off : off + sz].reshape(shapes[k])
        off += sz
    return out


def sgd_step_full(
    params: dict[str, np.ndarray],
    momenta: dict[str, np.ndarray],
    grads: dict[str, np.ndarray],
    lr: float,
    momentum: float,
    clip: float,
) -> None:
    """In-place SGD + momentum with a GLOBAL-norm clip across every block
    (train.py:478-479 clip_grad_norm_ over model.parameters(); torch
    momentum convention buf = mu*buf + g; p -= lr*buf). The combined LSTM
    bias gradient applies to BOTH bih and bhh (the loss depends on their
    sum, so torch gives each the same gradient)."""
    # grads keys: DENSE_BLOCKS + "word_embed"
    gn = float(np.sqrt(sum(float((g * g).sum()) for g in grads.values())))
    scale = clip / gn if gn > clip else 1.0
    for name, g in grads.items():
        if name.endswith("_b") and name.startswith("lstm"):
            for suffix in ("ih", "hh"):
                pname = f"{name}{suffix}"  # lstm_fw_b + ih -> lstm_fw_bih
                v = momenta[pname]
                v *= momentum
                v += g * scale
                params[pname] -= lr * v
        else:
            v = momenta[name]
            v *= momentum
            v += g * scale
            params[name] -= lr * v


def _run_state_paths(run_dir: str) -> tuple[str, str]:
    import os

    return os.path.join(run_dir, "RUN.json"), os.path.join(run_dir, "state.npz")


def _save_run_state(
    run_dir, fingerprint, epoch, rows, params, momenta, pass_state, best_f1
) -> None:
    """Atomic epoch-granular snapshot: params + momenta + the pending pass
    partials (the NEXT update consumes them) + curve rows. npz first, then
    the RUN.json pointer — a crash between the two leaves the previous
    consistent snapshot in force."""
    import json
    import os

    os.makedirs(run_dir, exist_ok=True)
    run_json, state_npz = _run_state_paths(run_dir)
    arrs = {f"p_{k}": params[k] for k in TRAINED_PARAMS}
    arrs.update({f"m_{k}": momenta[k] for k in TRAINED_PARAMS})
    arrs["dense_i"] = pass_state["dense_i"]
    arrs["word_i"] = pass_state["word_i"]
    tmp = state_npz + ".tmp.npz"
    np.savez_compressed(tmp, **arrs)
    os.replace(tmp, state_npz)
    meta = {
        "fingerprint": fingerprint,
        "epoch": epoch,
        "rows": rows,
        "n": pass_state["n"],
        "n_tok": pass_state["n_tok"],
        "nll_i": pass_state["nll_i"],
        "best_f1": best_f1,
    }
    tmp = run_json + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, run_json)


def _load_run_state(run_dir, fingerprint):
    """Latest consistent snapshot, or None. A fingerprint mismatch (input
    or hyperparameters changed under an existing run_dir) raises."""
    import json
    import os

    run_json, state_npz = _run_state_paths(run_dir)
    if not (os.path.exists(run_json) and os.path.exists(state_npz)):
        return None
    with open(run_json) as f:
        meta = json.load(f)
    if meta["fingerprint"] != fingerprint:
        raise ValueError(
            f"run_dir {run_dir!r} holds a run with fingerprint "
            f"{meta['fingerprint']!r} but this invocation fingerprints "
            f"{fingerprint!r} (input or hyperparameters changed) — use a "
            "fresh run_dir"
        )
    with np.load(state_npz) as z:
        arrs = {k: z[k] for k in z.files}
    return meta, arrs


def train_loop_full(
    sf_dir: str,
    n_epochs: int = 3,
    lr: float = 1.0,
    lr_decay: float = 0.3,
    momentum: float = 0.5,
    clip: float = 5.0,
    seed: int = 1234,
    dev_mod: int = 5,
    labels: str = "teacher",
    checkpoint_path: str | None = None,
    run_dir: str | None = None,
) -> pa.Table:
    """Full-model epoch driver (train.py:404-516 with the WHOLE parameter
    set stepping, not just the CRF head). Full-batch GD: one fused
    distributed pass per epoch, one update of every parameter block per
    epoch; the trajectory is bit-identical under any partitioning (integer
    per-sentence gradient quantization — see quantized_sentence_grads).

    ``run_dir``: epoch-granular crash recovery — after every epoch the
    optimizer state (params, momenta, pending gradient partials, curve
    rows) snapshots atomically; a rerun with the same inputs and
    hyperparameters resumes at the first missing epoch and produces the
    IDENTICAL curve (integer state, no recomputation drift; tested).

    Returns the curve table (epoch, n_train, mean_nll, dev_f1) with an
    epoch-0 row for the initial weights."""
    from ner_pytorch_ray.state import manifests as mf

    encoded, vocab, weights = full_feature_cache(
        sf_dir, seed, dev_mod, labels=labels
    )
    n_tags = len(vocab["tag_to_id"])
    start_idx, stop_idx = n_tags - 2, n_tags - 1
    id_to_tag = {v: k for k, v in vocab["tag_to_id"].items()}
    shapes = dense_shapes(weights)

    fingerprint = mf.chained_fingerprint(
        mf.input_fingerprint(sf_dir, "train_full", 1, 0),
        f"hp:{lr}:{lr_decay}:{momentum}:{clip}:{seed}:{dev_mod}:{labels}",
    )
    resumed = _load_run_state(run_dir, fingerprint) if run_dir else None

    if resumed is not None:
        meta, arrs = resumed
        params = {k: arrs[f"p_{k}"] for k in TRAINED_PARAMS}
        params["meta"] = weights["meta"]
        momenta = {k: arrs[f"m_{k}"] for k in TRAINED_PARAMS}
        rows = [tuple(r) for r in meta["rows"]]
        start_epoch = int(meta["epoch"]) + 1
        best_f1 = float(meta["best_f1"])
        n, n_tok, nll_i = meta["n"], meta["n_tok"], meta["nll_i"]
        dense_i, word_i = arrs["dense_i"], arrs["word_i"]
    else:
        # float64 master copy of every trained parameter (+ frozen meta)
        params = {
            k: weights[k].astype(np.float64).copy() for k in TRAINED_PARAMS
        }
        params["meta"] = weights["meta"]
        momenta = {k: np.zeros_like(params[k]) for k in TRAINED_PARAMS}
        rows = []
        start_epoch = 1
        best_f1 = -1.0

    def save_best():
        if checkpoint_path is None:
            return
        out = {k: params[k].astype(np.float32) for k in TRAINED_PARAMS}
        out["meta"] = weights["meta"]
        save_weights(checkpoint_path, out)

    def snapshot(epoch):
        if run_dir is None:
            return
        _save_run_state(
            run_dir, fingerprint, epoch, rows, params, momenta,
            {
                "dense_i": dense_i, "word_i": word_i,
                "n": n, "n_tok": n_tok, "nll_i": nll_i,
            },
            best_f1,
        )

    if resumed is None:
        n, n_tok, nll_i, dense_i, word_i, f1 = full_epoch_pass(
            encoded, params, id_to_tag, start_idx, stop_idx
        )
        rows.append((0, 0, 0.0, f1))
        if f1 > best_f1:
            best_f1 = f1
            save_best()
        snapshot(0)
    for epoch in range(start_epoch, n_epochs + 1):
        mean_nll = (nll_i / NLL_SCALE) / n if n else 0.0
        grads = unpack_dense(
            dense_i.astype(np.float64) / GRAD_SCALE / max(n_tok, 1), shapes
        )
        grads["word_embed"] = (
            word_i.astype(np.float64) / GRAD_SCALE / max(n_tok, 1)
        )
        lr_t = lr / (1.0 + lr_decay * (epoch - 1))
        sgd_step_full(params, momenta, grads, lr_t, momentum, clip)
        n_prev = n
        n, n_tok, nll_i, dense_i, word_i, f1 = full_epoch_pass(
            encoded, params, id_to_tag, start_idx, stop_idx
        )
        rows.append((epoch, n_prev, round(mean_nll, 4), f1))
        if f1 > best_f1:
            best_f1 = f1
            save_best()
        snapshot(epoch)
    return pa.Table.from_pydict(
        {
            "epoch": pa.array([r[0] for r in rows], type=pa.int64()),
            "n_train": pa.array([r[1] for r in rows], type=pa.int64()),
            "mean_nll": pa.array([r[2] for r in rows], type=pa.float64()),
            "dev_f1": pa.array(
                [round(r[3], 6) for r in rows], type=pa.float64()
            ),
        }
    )
