"""Distributed training epoch — the reference's training lifecycle
(train.py:404-516: epoch loop -> forward_step loss -> loss.backward() ->
clip + SGD -> dev-F1 checkpoint via EarlyStopping) re-expressed Ray-Data-first.

Architecture (frozen backbone, trainable CRF head):

  1. **Feature cache** (one distributed pass, FeatureActor pool): every
     sentence runs through the frozen BiLSTM backbone ONCE; its [n, 2H]
     hidden-state matrix is cached as a float32 binary cell alongside the
     gazetteer gold tag ids. Epochs never re-run the backbone — the epoch
     pass touches only the (much smaller) cached features. At 100 TB the
     cache is written to parquet (``features_path``) instead of living in
     the object store; the deterministic (url, sent_id)-hash dev split
     travels as a column.
  2. **Fused epoch pass** (EpochPassFn): ONE distributed execution per
     epoch over the whole cache; each row routes inside the UDF — train
     rows emit the analytic CRF-head gradient
     (state/model.crf_head_grads — closed-form forward-backward where the
     reference calls loss.backward()) as integer partial sums (gradients
     scaled 1e6, NLL scaled 1e4; integer addition is order-independent,
     so the epoch gradient — and hence the whole SGD trajectory and the
     saved checkpoint — is bit-identical under any partitioning / CPU
     count, property-tested); dev rows emit Viterbi predictions reduced
     to distributive conlleval span counts (ChunkCounts JSON). Pass ``e``
     runs with head h_e and yields dev-F1(h_e) for this epoch's curve row
     plus grads(h_e) for the NEXT update — E+1 executions total instead
     of 2E+1, trajectory unchanged. (``epoch_gradient`` / ``dev_f1`` keep
     the standalone single-purpose passes.)
  3. **Driver-side optimizer**: the tiny head (fc_w, fc_b, trans) updates
     with SGD + momentum + global-norm clip (train.py:478-479
     clip_grad_norm semantics), exactly once per epoch (full-batch GD).
  4. **Checkpointing**: state/schedulers EarlyStopping on dev F1 drives
     best-checkpoint saves (pytorchtools.py:50-57 analog with
     save_weights as the sink).

Features are computed per-sentence (batch=1) in the cache pass: float32
GEMM is shape-dependent (~1e-7), and batch-composition-dependent features
would leak partitioning into the quantized gradients.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ner_pytorch_ray.state.model import (
    NumpyBiLSTMCRF,
    crf_head_grads,
    head_emissions,
    save_weights,
    viterbi_path,
)

GRAD_SCALE = 1_000_000
NLL_SCALE = 10_000


def _dev_of(url: str, sent_id: int, dev_mod: int) -> bool:
    """Deterministic keyed dev-split membership (md5, like _stable_u64)."""
    v = int.from_bytes(
        hashlib.md5(f"{url}|{sent_id}".encode()).digest()[:8], "little"
    )
    return (v & 0x7FFFFFFFFFFFFFFF) % dev_mod == 0


class FeatureActor:
    """Frozen-backbone pass: encoded+labeled sentences -> cached hidden
    states. One model load per actor; per-sentence (batch=1) forward.

    ``teacher`` (optional (fc_w, fc_b, trans)): when set, gold labels are
    the TEACHER head's Viterbi decode over the same hidden states
    (distillation labels — realizable by the student head, so the convex
    head NLL has a consistent optimum and dev F1 must climb); when None,
    gold labels are the row's own ``tags`` column (gazetteer annotation —
    the reference workflow, but generally NOT realizable by a linear head
    over a frozen random backbone)."""

    def __init__(
        self,
        weights_ref,
        tag_to_id: dict[str, int],
        dev_mod: int,
        teacher=None,
    ):
        w = ray.get(weights_ref) if isinstance(weights_ref, ray.ObjectRef) else weights_ref
        self.model = NumpyBiLSTMCRF(w)
        self.tag_to_id = dict(tag_to_id)
        self.id_to_tag = {v: k for k, v in self.tag_to_id.items()}
        self.dev_mod = dev_mod
        self.teacher = ray.get(teacher) if isinstance(teacher, ray.ObjectRef) else teacher

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        sids = batch.column("sent_id").to_pylist()
        word_ids = batch.column("word_ids").to_pylist()
        char_ids = batch.column("char_ids").to_pylist()
        tags = batch.column("tags").to_pylist()
        hb, tb, ns, gold_strs = [], [], [], []
        for w, c, ts in zip(word_ids, char_ids, tags):
            h, _ = self.model.hidden_states([w], [c])
            n = len(w)
            hn = h[0, :n]
            hb.append(hn.astype("<f4").tobytes())
            if self.teacher is not None:
                t_w, t_b, t_t = self.teacher
                feats = head_emissions(hn.astype("<f4").astype(np.float64), t_w, t_b)
                tids = viterbi_path(
                    feats, t_t, self.model.start_idx, self.model.stop_idx
                )
                gold_strs.append([self.id_to_tag[t] for t in tids])
            else:
                tids = [self.tag_to_id[t] for t in ts]
                gold_strs.append(list(ts))
            tb.append(np.array(tids, dtype="<i8").tobytes())
            ns.append(n)
        dev = [_dev_of(u, int(s), self.dev_mod) for u, s in zip(urls, sids)]
        return pa.Table.from_pydict(
            {
                "url": pa.array(urls, type=pa.string()),
                "sent_id": pa.array(sids, type=pa.int64()),
                "n_tokens": pa.array(ns, type=pa.int64()),
                "hb": pa.array(hb, type=pa.binary()),
                "tb": pa.array(tb, type=pa.binary()),
                "is_dev": pa.array(dev, type=pa.bool_()),
                "tags_true": pa.array(gold_strs, type=pa.list_(pa.string())),
            }
        )


def teacher_head(vocab: dict, seed: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """A differently-seeded head over the same backbone — the distillation
    label source (float64)."""
    from ner_pytorch_ray.pipelines.neural import frozen_weights

    tw = frozen_weights(vocab, seed)
    return (
        tw["fc_w"].astype(np.float64),
        tw["fc_b"].astype(np.float64),
        tw["trans"].astype(np.float64),
    )


def feature_cache(
    sf_dir: str,
    seed: int,
    dev_mod: int = 5,
    labels: str = "teacher",
    concurrency: int | tuple[int, int] | None = None,
    features_path: str | None = None,
) -> tuple[ray.data.Dataset, dict, dict]:
    """Build (materialized features ds, vocab, weights).

    ``labels``: "teacher" = distillation labels from a seed+1 head
    (realizable -> training demonstrably converges); "gazetteer" = the
    corpus's gazetteer annotation (reference workflow).

    ``concurrency``: None (default) ships FeatureActor as a plain TASK
    closure — the ~6 MB frozen weights pickle into ONE plasma object that
    every warm worker maps zero-copy, skipping the actor-pool ramp
    (~1.5-2 s). Pass a concurrency to get a real actor pool instead: the
    right mode when the backbone is a genuinely heavy model (GBs) whose
    per-task deserialization would dominate.

    ``features_path``: persist the cache as parquet (+ _DONE marker) and
    short-circuit subsequent runs from disk — the 100 TB mode, where the
    one expensive backbone pass survives process restarts and the object
    store holds only the streaming epoch reads. Default None keeps the
    cache in the object store for the life of the run."""
    import os

    if features_path is not None and os.path.exists(
        os.path.join(features_path, "_DONE")
    ):
        from ner_pytorch_ray.pipelines.neural import (
            build_vocab_state,
            frozen_weights,
        )
        from ner_pytorch_ray.sources.pages import pages_from_documents
        from ner_pytorch_ray.stages.extract import extract_stage
        from ner_pytorch_ray.stages.sentences import sentences_stage

        sents = sentences_stage(
            extract_stage(pages_from_documents(sf_dir)), zeros=True
        )
        vocab = build_vocab_state(sents)
        weights = frozen_weights(vocab, seed)
        return ray.data.read_parquet(features_path), vocab, weights
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
    if concurrency is None:
        # Task-closure mode: instantiate ONCE on the driver (weights stay
        # in-process numpy); the pickled callable lands in plasma as one
        # object every warm worker maps zero-copy — no actor-pool ramp.
        feats = encoded.map_batches(
            FeatureActor(weights, vocab["tag_to_id"], dev_mod, teacher),
            batch_size=256,
            batch_format="pyarrow",
        )
    else:
        wref = ray.put(weights)
        feats = encoded.map_batches(
            FeatureActor,
            fn_constructor_args=(wref, vocab["tag_to_id"], dev_mod, teacher),
            concurrency=concurrency,
            batch_size=256,
            batch_format="pyarrow",
        )
    if features_path is not None:
        import shutil

        if os.path.exists(features_path):
            shutil.rmtree(features_path)  # crashed partial write
        feats.write_parquet(features_path)
        with open(os.path.join(features_path, "_DONE"), "w") as f:
            f.write("done\n")
        return ray.data.read_parquet(features_path), vocab, weights
    return feats.materialize(), vocab, weights


class GradActor:
    """Epoch gradient partials: one integer-sum row per batch.

    Shipped as a plain TASK closure by ``epoch_gradient`` (the head is a
    ~12 KB tuple embedded in the UDF — an actor pool would pay a fresh
    ~1.5-2 s ramp every epoch for no state worth holding; the heavy model
    never leaves the feature-cache stage)."""

    def __init__(self, head, start_idx: int, stop_idx: int):
        self.fc_w, self.fc_b, self.trans = (
            ray.get(head) if isinstance(head, ray.ObjectRef) else head
        )
        self.start_idx, self.stop_idx = start_idx, stop_idx

    def __call__(self, batch: pa.Table) -> pa.Table:
        C, H2 = self.fc_w.shape
        gw = np.zeros((C, H2), dtype=np.int64)
        gb = np.zeros(C, dtype=np.int64)
        gt = np.zeros((C, C), dtype=np.int64)
        nll_i = 0
        n_sent = 0
        n_tok = 0
        for n, hb, tb in zip(
            batch.column("n_tokens").to_pylist(),
            batch.column("hb").to_pylist(),
            batch.column("tb").to_pylist(),
        ):
            h = np.frombuffer(hb, dtype="<f4").reshape(int(n), H2)
            tags = np.frombuffer(tb, dtype="<i8")
            nll, dw, db, dt = crf_head_grads(
                h, tags, self.fc_w, self.fc_b, self.trans,
                self.start_idx, self.stop_idx,
            )
            gw += np.rint(dw * GRAD_SCALE).astype(np.int64)
            gb += np.rint(db * GRAD_SCALE).astype(np.int64)
            gt += np.rint(dt * GRAD_SCALE).astype(np.int64)
            nll_i += int(round(nll * NLL_SCALE))
            n_sent += 1
            n_tok += int(n)
        return pa.Table.from_pydict(
            {
                "n": pa.array([n_sent], type=pa.int64()),
                "n_tok": pa.array([n_tok], type=pa.int64()),
                "nll_i": pa.array([nll_i], type=pa.int64()),
                "gw": pa.array([gw.astype("<i8").tobytes()], type=pa.binary()),
                "gb": pa.array([gb.astype("<i8").tobytes()], type=pa.binary()),
                "gt": pa.array([gt.astype("<i8").tobytes()], type=pa.binary()),
            }
        )


def epoch_gradient(
    feats: ray.data.Dataset,
    head: tuple[np.ndarray, np.ndarray, np.ndarray],
    start_idx: int,
    stop_idx: int,
    concurrency: int | tuple[int, int] = (1, 32),
) -> tuple[int, int, np.ndarray, np.ndarray, np.ndarray]:
    """One distributed epoch pass over the TRAIN split -> integer-exact
    (n_sentences, n_tokens, total_nll_i, sum_gw, sum_gb, sum_gt).

    Runs as stateless TASKS (closure ships the small head once per stage):
    reuses warm workers instead of paying an actor-pool ramp per epoch."""
    C, H2 = head[0].shape
    fn = GradActor(head, start_idx, stop_idx)
    train = feats.filter(expr="is_dev == False")
    parts = train.map_batches(
        fn,
        batch_size=256,
        batch_format="pyarrow",
    )
    n = 0
    n_tok = 0
    nll_i = 0
    gw = np.zeros((C, H2), dtype=np.int64)
    gb = np.zeros(C, dtype=np.int64)
    gt = np.zeros((C, C), dtype=np.int64)
    for b in parts.iter_batches(batch_format="pyarrow"):
        n += int(np.sum(b.column("n").to_numpy()))
        n_tok += int(np.sum(b.column("n_tok").to_numpy()))
        nll_i += int(np.sum(b.column("nll_i").to_numpy()))
        for blob in b.column("gw").to_pylist():
            gw += np.frombuffer(blob, dtype="<i8").reshape(C, H2)
        for blob in b.column("gb").to_pylist():
            gb += np.frombuffer(blob, dtype="<i8")
        for blob in b.column("gt").to_pylist():
            gt += np.frombuffer(blob, dtype="<i8").reshape(C, C)
    return n, n_tok, nll_i, gw, gb, gt


def sgd_step(
    head: tuple[np.ndarray, np.ndarray, np.ndarray],
    momenta: tuple[np.ndarray, np.ndarray, np.ndarray],
    grads: tuple[np.ndarray, np.ndarray, np.ndarray],
    lr: float,
    momentum: float,
    clip: float,
) -> None:
    """In-place SGD + momentum with global-norm clip (train.py:478-479:
    clip_grad_norm_ then optimizer.step; torch momentum convention
    buf = mu*buf + g; p -= lr*buf)."""
    gn = float(np.sqrt(sum(float((g * g).sum()) for g in grads)))
    scale = clip / gn if gn > clip else 1.0
    for p, v, g in zip(head, momenta, grads):
        v *= momentum
        v += g * scale
        p -= lr * v


class DevEvalActor:
    """Viterbi with the learned head over cached features -> tag pairs.
    Shipped as a plain task closure (see GradActor)."""

    def __init__(self, head, id_to_tag: dict[int, str], start_idx, stop_idx):
        self.fc_w, self.fc_b, self.trans = (
            ray.get(head) if isinstance(head, ray.ObjectRef) else head
        )
        self.id_to_tag = {int(k): v for k, v in id_to_tag.items()}
        self.start_idx, self.stop_idx = start_idx, stop_idx

    def __call__(self, batch: pa.Table) -> pa.Table:
        C, H2 = self.fc_w.shape
        preds = []
        for n, hb in zip(
            batch.column("n_tokens").to_pylist(), batch.column("hb").to_pylist()
        ):
            h = np.frombuffer(hb, dtype="<f4").reshape(int(n), H2)
            feats = head_emissions(h, self.fc_w, self.fc_b)
            path = viterbi_path(feats, self.trans, self.start_idx, self.stop_idx)
            preds.append([self.id_to_tag[t] for t in path])
        return pa.Table.from_pydict(
            {
                "tags_true": batch.column("tags_true"),
                "tags_pred": pa.array(preds, type=pa.list_(pa.string())),
            }
        )


def dev_f1(
    feats: ray.data.Dataset,
    head: tuple[np.ndarray, np.ndarray, np.ndarray],
    id_to_tag: dict[int, str],
    start_idx: int,
    stop_idx: int,
    concurrency: int | tuple[int, int] = (1, 32),
) -> float:
    from ner_pytorch_ray.stages.evaluate import conlleval_score

    fn = DevEvalActor(head, id_to_tag, start_idx, stop_idx)
    dev = feats.filter(expr="is_dev == True")
    pairs = dev.map_batches(
        fn,
        batch_size=256,
        batch_format="pyarrow",
    )
    return float(conlleval_score(pairs)["f1"])


class EpochPassFn:
    """FUSED epoch pass: one row per batch carrying BOTH the train-split
    integer gradient partials (GradActor semantics) and the dev-split
    conlleval span-count partials (ChunkCounts JSON, distributive A5
    machinery). One distributed execution per epoch instead of two
    (gradient pass + dev-eval pass) — the pass runs with head ``h_e`` and
    yields dev-F1(h_e) for this epoch's curve row plus grads(h_e) for the
    NEXT update, so the SGD trajectory is bit-identical to the two-pass
    form. Shipped as a plain task closure (see GradActor)."""

    def __init__(self, head, id_to_tag: dict[int, str], start_idx, stop_idx):
        self.fc_w, self.fc_b, self.trans = (
            ray.get(head) if isinstance(head, ray.ObjectRef) else head
        )
        self.id_to_tag = {int(k): v for k, v in id_to_tag.items()}
        self.start_idx, self.stop_idx = start_idx, stop_idx

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        from ner_pytorch_ray.functions.conlleval import (
            ChunkCounts,
            count_chunks,
        )

        C, H2 = self.fc_w.shape
        gw = np.zeros((C, H2), dtype=np.int64)
        gb = np.zeros(C, dtype=np.int64)
        gt = np.zeros((C, C), dtype=np.int64)
        nll_i = 0
        n_sent = 0
        n_tok = 0
        counts = ChunkCounts()
        tags_true = batch.column("tags_true").to_pylist()
        for n, hb, tb, dev, ts in zip(
            batch.column("n_tokens").to_pylist(),
            batch.column("hb").to_pylist(),
            batch.column("tb").to_pylist(),
            batch.column("is_dev").to_pylist(),
            tags_true,
        ):
            h = np.frombuffer(hb, dtype="<f4").reshape(int(n), H2)
            if dev:
                feats = head_emissions(h, self.fc_w, self.fc_b)
                path = viterbi_path(
                    feats, self.trans, self.start_idx, self.stop_idx
                )
                counts.merge(
                    count_chunks(ts, [self.id_to_tag[t] for t in path])
                )
            else:
                tags = np.frombuffer(tb, dtype="<i8")
                nll, dw, db, dt = crf_head_grads(
                    h, tags, self.fc_w, self.fc_b, self.trans,
                    self.start_idx, self.stop_idx,
                )
                gw += np.rint(dw * GRAD_SCALE).astype(np.int64)
                gb += np.rint(db * GRAD_SCALE).astype(np.int64)
                gt += np.rint(dt * GRAD_SCALE).astype(np.int64)
                nll_i += int(round(nll * NLL_SCALE))
                n_sent += 1
                n_tok += int(n)
        return pa.Table.from_pydict(
            {
                "n": pa.array([n_sent], type=pa.int64()),
                "n_tok": pa.array([n_tok], type=pa.int64()),
                "nll_i": pa.array([nll_i], type=pa.int64()),
                "gw": pa.array([gw.astype("<i8").tobytes()], type=pa.binary()),
                "gb": pa.array([gb.astype("<i8").tobytes()], type=pa.binary()),
                "gt": pa.array([gt.astype("<i8").tobytes()], type=pa.binary()),
                "counts_json": pa.array(
                    [json.dumps(counts.to_lists())], type=pa.string()
                ),
            }
        )


def epoch_pass(
    feats: ray.data.Dataset,
    head: tuple[np.ndarray, np.ndarray, np.ndarray],
    id_to_tag: dict[int, str],
    start_idx: int,
    stop_idx: int,
) -> tuple[int, int, int, np.ndarray, np.ndarray, np.ndarray, float]:
    """One fused distributed pass over the WHOLE feature cache (no split
    filter — each row routes inside the UDF) -> integer-exact train
    gradients + dev span F1, both under the CURRENT head."""
    import json

    from ner_pytorch_ray.functions.conlleval import ChunkCounts, evaluate_counts

    C, H2 = head[0].shape
    fn = EpochPassFn(head, id_to_tag, start_idx, stop_idx)
    parts = feats.map_batches(fn, batch_size=256, batch_format="pyarrow")
    n = 0
    n_tok = 0
    nll_i = 0
    gw = np.zeros((C, H2), dtype=np.int64)
    gb = np.zeros(C, dtype=np.int64)
    gt = np.zeros((C, C), dtype=np.int64)
    total = ChunkCounts()
    for b in parts.iter_batches(batch_format="pyarrow"):
        n += int(np.sum(b.column("n").to_numpy()))
        n_tok += int(np.sum(b.column("n_tok").to_numpy()))
        nll_i += int(np.sum(b.column("nll_i").to_numpy()))
        for blob in b.column("gw").to_pylist():
            gw += np.frombuffer(blob, dtype="<i8").reshape(C, H2)
        for blob in b.column("gb").to_pylist():
            gb += np.frombuffer(blob, dtype="<i8")
        for blob in b.column("gt").to_pylist():
            gt += np.frombuffer(blob, dtype="<i8").reshape(C, C)
        for s in b.column("counts_json").to_pylist():
            total.merge(ChunkCounts.from_lists(json.loads(s)))
    f1 = float(evaluate_counts(total)["f1"])
    return n, n_tok, nll_i, gw, gb, gt, f1


def train_loop(
    sf_dir: str,
    n_epochs: int = 3,
    lr: float = 6.0,
    lr_decay: float = 0.3,
    momentum: float = 0.5,
    clip: float = 5.0,
    seed: int = 1234,
    dev_mod: int = 5,
    labels: str = "teacher",
    checkpoint_path: str | None = None,
    features_path: str | None = None,
    patience: int = 7,
) -> pa.Table:
    """The epoch driver (train.py:404-516 analog). Full-batch GD: one
    FUSED distributed pass per epoch (train gradients + dev F1 together,
    see EpochPassFn), one head update per epoch; EarlyStopping saves the
    best checkpoint (backbone + learned head, float32 npz loadable by
    TaggerActor).

    Returns the training-curve table: one row per epoch with
    (epoch, n_train, mean_nll, dev_f1) — plus an epoch-0 row for the
    initial head, so improvement is visible in the output. mean_nll is the
    integer-exact epoch total divided on the driver; the whole trajectory
    is bit-identical under any partitioning (integer gradient sums)."""
    from ner_pytorch_ray.state.schedulers import EarlyStopping

    feats, vocab, weights = feature_cache(
        sf_dir, seed, dev_mod, labels=labels, features_path=features_path
    )
    n_tags = len(vocab["tag_to_id"])
    start_idx, stop_idx = n_tags - 2, n_tags - 1
    head = (
        weights["fc_w"].astype(np.float64).copy(),
        weights["fc_b"].astype(np.float64).copy(),
        weights["trans"].astype(np.float64).copy(),
    )
    momenta = tuple(np.zeros_like(p) for p in head)

    def save_best():
        if checkpoint_path is None:
            return
        out = dict(weights)
        out["fc_w"] = head[0].astype(np.float32)
        out["fc_b"] = head[1].astype(np.float32)
        out["trans"] = head[2].astype(np.float32)
        save_weights(checkpoint_path, out)

    stopper = EarlyStopping(
        patience=patience, save_fn=save_best, trace_func=lambda *_: None
    )
    rows = []
    # FUSED passes: pass ``e`` runs with head h_e and yields dev-F1(h_e)
    # (this epoch's curve row) AND grads(h_e) (the NEXT update) in one
    # distributed execution — E+1 executions instead of 2E+1, trajectory
    # bit-identical to the two-pass form (integer gradient sums).
    n, n_tok, nll_i, gw, gb, gt, f1 = epoch_pass(
        feats, head, vocab["id_to_tag"], start_idx, stop_idx
    )
    rows.append((0, 0, 0.0, f1))
    stopper(-f1)  # EarlyStopping minimizes; val "loss" = -F1
    for epoch in range(1, n_epochs + 1):
        mean_nll = (nll_i / NLL_SCALE) / n if n else 0.0
        # per-TOKEN mean (the per-sentence mean scales with sentence length
        # and makes full-batch steps overshoot); lr decays like the
        # reference's lr/(1 + decay*epoch) schedule (train.py:525 area)
        grads = tuple(
            g.astype(np.float64) / GRAD_SCALE / max(n_tok, 1)
            for g in (gw, gb, gt)
        )
        lr_t = lr / (1.0 + lr_decay * (epoch - 1))
        sgd_step(head, momenta, grads, lr_t, momentum, clip)
        n_prev = n
        n, n_tok, nll_i, gw, gb, gt, f1 = epoch_pass(
            feats, head, vocab["id_to_tag"], start_idx, stop_idx
        )
        rows.append((epoch, n_prev, round(mean_nll, 4), f1))
        stopper(-f1)
        if stopper.early_stop:
            break
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
