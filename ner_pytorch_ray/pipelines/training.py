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
        has_vid = "variant_id" in batch.column_names
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
        cols = {
            "url": pa.array(urls, type=pa.string()),
            "sent_id": pa.array(sids, type=pa.int64()),
            "n_tokens": pa.array(ns, type=pa.int64()),
            "hb": pa.array(hb, type=pa.binary()),
            "tb": pa.array(tb, type=pa.binary()),
            "is_dev": pa.array(dev, type=pa.bool_()),
            "tags_true": pa.array(gold_strs, type=pa.list_(pa.string())),
        }
        if has_vid:
            # adversarial-variant cache rows keep their variant identity
            cols["variant_id"] = batch.column("variant_id")
        return pa.Table.from_pydict(cols)


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
    ) and os.path.exists(os.path.join(features_path, "_vocab.json")):
        from ner_pytorch_ray.pipelines.neural import frozen_weights
        from ner_pytorch_ray.state.vocab import load_vocab

        # the vocab was persisted at cache-build time — resuming costs zero
        # distributed executions beyond the parquet read itself (the old
        # path re-ran sentences+vocab counting just to rebuild mappings)
        vocab = load_vocab(os.path.join(features_path, "_vocab.json"))
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

        from ner_pytorch_ray.state.vocab import save_vocab

        if os.path.exists(features_path):
            shutil.rmtree(features_path)  # crashed partial write
        feats.write_parquet(features_path)
        save_vocab(os.path.join(features_path, "_vocab.json"), vocab)
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


def adv_feature_cache(
    sf_dir: str,
    vocab: dict,
    weights: dict,
    seed: int,
    order: str = "rep",
    n_variants: int = 2,
    dev_mod: int = 5,
    labels: str = "teacher",
) -> ray.data.Dataset:
    """Adversarial-variant feature cache, PACKED one row per source
    sentence (train.py:318-341: adv examples generated offline, then
    consumed batch-aligned with their source sentence every epoch).

    Variants come from the adversarial pipeline (``order`` stage list, same
    --order contract as gen_adv_cli); each variant runs through the SAME
    frozen backbone / teacher labeling as the clean cache, dev-split rows
    are dropped (adv examples are train-time augmentation only), and a
    sentence's variants are co-located into ONE row via a keyed collect:
    ``variants`` = list of (variant_id, n_tokens, hb, tb) tuples.

    The pack is the scale design: the (url, sent_id) groupby shuffle runs
    ONCE at cache build and amortizes over every epoch — per-epoch adv
    passes are then plain shuffle-free map_batches where the
    dynamic-inference top-k selection (which needs all of a sentence's
    variants together) is group-local inside the UDF. Group payloads are
    bounded by n_variants x sentence length, never by corpus size."""
    from ner_pytorch_ray.pipelines.adversarial import adv_pipeline
    from ner_pytorch_ray.stages.encode import encode_stage
    from ner_pytorch_ray.stages.groupby_utils import collect_tuples

    variants = adv_pipeline(sf_dir, order=order, n_variants=n_variants)
    encoded = encode_stage(
        variants, vocab["word_to_id"], vocab["char_to_id"]
    )
    teacher = teacher_head(vocab, seed + 1) if labels == "teacher" else None
    feats = encoded.map_batches(
        FeatureActor(weights, vocab["tag_to_id"], dev_mod, teacher),
        batch_size=256,
        batch_format="pyarrow",
    ).filter(expr="is_dev == False")

    # asof's packed-combiner transport: pre-pack each variant row into ONE
    # binary cell BEFORE the keyed collect (a list of plain bytes converts
    # to a native Arrow list<binary> aggregate block; mixed-type tuples
    # would fall back to pickled-object blocks), then splice each group's
    # cells into one vid-ordered vpack cell — the materialized cache and
    # every epoch's reads stay zero-copy Arrow.
    import struct

    def prepack(batch: pa.Table) -> pa.Table:
        cells = [
            struct.pack("<qq", int(vid), int(n)) + hb + tb
            for vid, n, hb, tb in zip(
                batch.column("variant_id").to_pylist(),
                batch.column("n_tokens").to_pylist(),
                batch.column("hb").to_pylist(),
                batch.column("tb").to_pylist(),
            )
        ]
        return pa.Table.from_pydict(
            {
                "url": batch.column("url"),
                "sent_id": batch.column("sent_id"),
                "vcell": pa.array(cells, type=pa.binary()),
            }
        )

    packed = collect_tuples(
        feats.map_batches(prepack, batch_format="pyarrow"),
        ["url", "sent_id"],
        ["vcell"],
        name="variants",
    )

    def pack_cells(batch: pa.Table) -> pa.Table:
        cells = []
        for items in batch.column("variants").to_pylist():
            group = sorted(
                (bytes(it[0]) for it in items),
                key=lambda c: struct.unpack_from("<q", c, 0)[0],
            )
            cells.append(struct.pack("<q", len(group)) + b"".join(group))
        return pa.Table.from_pydict(
            {
                "url": batch.column("url"),
                "sent_id": batch.column("sent_id"),
                "vpack": pa.array(cells, type=pa.binary()),
            }
        )

    return packed.map_batches(pack_cells, batch_format="pyarrow").materialize()


def _iter_vpack(cell: bytes, h2: int):
    """Yield (variant_id, n_tokens, h [n,2H] f4 view, tags i8 view) from a
    packed variant cell — zero-copy np.frombuffer slices."""
    import struct

    k = struct.unpack_from("<q", cell, 0)[0]
    off = 8
    for _ in range(k):
        vid, n = struct.unpack_from("<qq", cell, off)
        off += 16
        hlen = n * h2 * 4
        h = np.frombuffer(cell, dtype="<f4", count=n * h2, offset=off).reshape(
            n, h2
        )
        off += hlen
        tags = np.frombuffer(cell, dtype="<i8", count=n, offset=off)
        off += n * 8
        yield int(vid), int(n), h, tags


class AdvPassFn:
    """Per-epoch adversarial gradient partials over the PACKED variant
    cache — one integer-sum row per batch (GradActor transport).

    mode="dynamic" (train.py:383-395 dynamic_inference): within each
    source sentence, rank variants by head NLL under the CURRENT head
    (forward-only crf_head_nll) and compute gradients only for the top-k
    highest-loss ones — ties break on variant_id asc, exactly the
    adjudicated ``topk_by_group`` semantics (O4). mode="non_gradient"
    (train.py:441-460): gradients over ALL variants. Selection happens
    group-locally inside the UDF (variants were co-located at cache
    build), so the per-sentence ranking is deterministic under any
    partitioning and the integer sums keep the whole trajectory
    bit-identical."""

    def __init__(self, head, start_idx: int, stop_idx: int, mode: str, topk: int):
        self.fc_w, self.fc_b, self.trans = (
            ray.get(head) if isinstance(head, ray.ObjectRef) else head
        )
        self.start_idx, self.stop_idx = start_idx, stop_idx
        self.mode = mode
        self.topk = topk

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ner_pytorch_ray.state.model import crf_head_nll

        C, H2 = self.fc_w.shape
        gw = np.zeros((C, H2), dtype=np.int64)
        gb = np.zeros(C, dtype=np.int64)
        gt = np.zeros((C, C), dtype=np.int64)
        nll_i = 0
        n_sel = 0
        n_tok = 0
        for cell in batch.column("vpack").to_pylist():
            its = list(_iter_vpack(cell, H2))  # vid-asc by construction
            if self.mode == "dynamic" and len(its) > self.topk:
                nlls = np.array(
                    [
                        crf_head_nll(
                            h, tags,
                            self.fc_w, self.fc_b, self.trans,
                            self.start_idx, self.stop_idx,
                        )
                        for _, _, h, tags in its
                    ]
                )
                # highest-loss first; stable over vid-asc input = vid tiebreak
                keep = np.argsort(-nlls, kind="stable")[: self.topk]
                its = [its[i] for i in sorted(keep)]
            for _, n, h, tags in its:
                nll, dw, db, dt = crf_head_grads(
                    h, tags, self.fc_w, self.fc_b, self.trans,
                    self.start_idx, self.stop_idx,
                )
                gw += np.rint(dw * GRAD_SCALE).astype(np.int64)
                gb += np.rint(db * GRAD_SCALE).astype(np.int64)
                gt += np.rint(dt * GRAD_SCALE).astype(np.int64)
                nll_i += int(round(nll * NLL_SCALE))
                n_sel += 1
                n_tok += int(n)
        return pa.Table.from_pydict(
            {
                "n": pa.array([n_sel], type=pa.int64()),
                "n_tok": pa.array([n_tok], type=pa.int64()),
                "nll_i": pa.array([nll_i], type=pa.int64()),
                "gw": pa.array([gw.astype("<i8").tobytes()], type=pa.binary()),
                "gb": pa.array([gb.astype("<i8").tobytes()], type=pa.binary()),
                "gt": pa.array([gt.astype("<i8").tobytes()], type=pa.binary()),
            }
        )


def adv_epoch_partials(
    packed: ray.data.Dataset,
    head: tuple[np.ndarray, np.ndarray, np.ndarray],
    start_idx: int,
    stop_idx: int,
    mode: str = "dynamic",
    topk: int = 5,
) -> tuple[int, int, int, np.ndarray, np.ndarray, np.ndarray]:
    """One shuffle-free adversarial pass -> integer-exact
    (n_selected, n_tokens, nll_i, sum_gw, sum_gb, sum_gt)."""
    C, H2 = head[0].shape
    fn = AdvPassFn(head, start_idx, stop_idx, mode, topk)
    parts = packed.map_batches(fn, batch_size=256, batch_format="pyarrow")
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
    adv_order: str | None = None,
    adv_mode: str = "dynamic",
    adv_topk: int = 5,
    adv_n_variants: int = 2,
    launch_epoch: int = 0,
    adv_ratio: float = 0.5,
    adv_warmup_epochs: int = 2,
    adv_warmup_style: str = "linear",
) -> pa.Table:
    """The epoch driver (train.py:404-516 analog). Full-batch GD: one
    FUSED distributed pass per epoch (train gradients + dev F1 together,
    see EpochPassFn), one head update per epoch; EarlyStopping saves the
    best checkpoint (backbone + learned head, float32 npz loadable by
    TaggerActor).

    Adversarial-loss mixing (train.py:421-470): when ``adv_order`` names
    an adversarial stage list (e.g. "rep" or "rep,ppdb"), variants are
    cached+packed once (adv_feature_cache) and every update whose 0-based
    epoch index >= ``launch_epoch`` adds one shuffle-free adversarial pass:
    grad = (1-ratio) * grad_clean + ratio * grad_adv, both per-token
    means, with ratio stepped per active epoch by the reference's
    WarmupWeight schedule (weight_scheduler.py:6-35; the reference steps
    it per batch — full-batch GD has one step per epoch).
    ``adv_mode``: "dynamic" = top-``adv_topk`` variants by current-head
    NLL per sentence (dynamic_inference); "non_gradient" = all variants.

    Returns the training-curve table: one row per epoch with
    (epoch, n_train, mean_nll, dev_f1) — plus an epoch-0 row for the
    initial head, so improvement is visible in the output. With adv mixing
    on, three columns are appended: (n_adv, mean_nll_adv, ratio). mean_nll
    is the integer-exact epoch total divided on the driver; the whole
    trajectory is bit-identical under any partitioning (integer gradient
    sums; the dynamic top-k selection is group-local and per-sentence
    deterministic)."""
    from ner_pytorch_ray.state.schedulers import EarlyStopping, WarmupWeight

    feats, vocab, weights = feature_cache(
        sf_dir, seed, dev_mod, labels=labels, features_path=features_path
    )
    packed_adv = None
    ratio_sched = None
    if adv_order is not None:
        packed_adv = adv_feature_cache(
            sf_dir, vocab, weights, seed,
            order=adv_order, n_variants=adv_n_variants,
            dev_mod=dev_mod, labels=labels,
        )
        ratio_sched = WarmupWeight(
            adv_ratio, adv_warmup_epochs, n_epochs, adv_warmup_style
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
    rows.append((0, 0, 0.0, f1, 0, 0.0, 0.0))
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
        ratio = 0.0
        n_adv = 0
        mean_nll_adv = 0.0
        if packed_adv is not None and (epoch - 1) >= launch_epoch:
            # adv grads at the SAME head the clean grads were computed with
            # (train.py:464: one combined loss, one backward per step)
            ratio = float(ratio_sched.step())
            n_adv, n_adv_tok, nll_adv_i, aw, ab, at = adv_epoch_partials(
                packed_adv, head, start_idx, stop_idx,
                mode=adv_mode, topk=adv_topk,
            )
            mean_nll_adv = (nll_adv_i / NLL_SCALE) / n_adv if n_adv else 0.0
            adv_grads = tuple(
                g.astype(np.float64) / GRAD_SCALE / max(n_adv_tok, 1)
                for g in (aw, ab, at)
            )
            grads = tuple(
                (1.0 - ratio) * gc + ratio * ga
                for gc, ga in zip(grads, adv_grads)
            )
        lr_t = lr / (1.0 + lr_decay * (epoch - 1))
        sgd_step(head, momenta, grads, lr_t, momentum, clip)
        n_prev = n
        n, n_tok, nll_i, gw, gb, gt, f1 = epoch_pass(
            feats, head, vocab["id_to_tag"], start_idx, stop_idx
        )
        rows.append(
            (epoch, n_prev, round(mean_nll, 4), f1,
             n_adv, round(mean_nll_adv, 4), round(ratio, 6))
        )
        stopper(-f1)
        if stopper.early_stop:
            break
    cols = {
        "epoch": pa.array([r[0] for r in rows], type=pa.int64()),
        "n_train": pa.array([r[1] for r in rows], type=pa.int64()),
        "mean_nll": pa.array([r[2] for r in rows], type=pa.float64()),
        "dev_f1": pa.array([round(r[3], 6) for r in rows], type=pa.float64()),
    }
    if packed_adv is not None:
        cols["n_adv"] = pa.array([r[4] for r in rows], type=pa.int64())
        cols["mean_nll_adv"] = pa.array(
            [r[5] for r in rows], type=pa.float64()
        )
        cols["ratio"] = pa.array([r[6] for r in rows], type=pa.float64())
    return pa.Table.from_pydict(cols)
