"""Full-model distributed training (pipelines/training_full.py): the
trajectory must be bit-identical under any partitioning (integer
per-sentence gradient quantization), the loss must fall, and the saved
checkpoint must load into the inference model."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_full_training_partitioning_invariant(ray_session):
    """Same curve, bit-for-bit, when the encoded cache is re-blocked and
    batch sizes differ — the integer-quantization contract."""
    import pyarrow as pa

    from ner_pytorch_ray.pipelines.training_full import (
        FullPassFn,
        full_epoch_pass,
        full_feature_cache,
    )

    encoded, vocab, weights = full_feature_cache(SF, seed=1234)
    n_tags = len(vocab["tag_to_id"])
    start, stop = n_tags - 2, n_tags - 1
    id_to_tag = {v: k for k, v in vocab["tag_to_id"].items()}
    params = {k: weights[k].astype(np.float64) for k in weights if k != "meta"}
    params["meta"] = weights["meta"]

    results = []
    for blocks in (2, 7):
        ds = encoded.repartition(blocks)
        results.append(
            full_epoch_pass(ds, params, id_to_tag, start, stop)
        )
    (n1, t1, l1, d1, w1, f1a), (n2, t2, l2, d2, w2, f1b) = results
    assert (n1, t1, l1) == (n2, t2, l2)
    assert np.array_equal(d1, d2)
    assert np.array_equal(w1, w2)
    assert f1a == f1b


def test_full_training_loss_falls_and_checkpoint_loads(ray_session, tmp_path):
    from ner_pytorch_ray.pipelines.training_full import train_loop_full
    from ner_pytorch_ray.state.model import NumpyBiLSTMCRF, load_weights

    ckpt = str(tmp_path / "full.npz")
    t = train_loop_full(SF, n_epochs=2, checkpoint_path=ckpt).to_pandas()
    assert t["epoch"].tolist() == [0, 1, 2]
    # the full-batch loss strictly decreases across real epochs
    nll = t["mean_nll"].tolist()[1:]
    assert nll == sorted(nll, reverse=True) and nll[-1] < nll[0]
    # checkpoint: all parameter blocks present and loadable by the tagger
    w = load_weights(ckpt)
    for k in (
        "char_embed", "conv_w", "conv_b", "word_embed", "fc_w", "fc_b",
        "trans", "lstm_fw_Wih", "lstm_bw_Whh", "lstm_fw_bih", "lstm_bw_bhh",
    ):
        assert k in w, k
    m = NumpyBiLSTMCRF(w)
    out = m.decode([[1, 2, 3]], [[[1], [2], [1, 2]]])
    assert len(out) == 1 and len(out[0]) == 3


def test_full_training_trains_backbone_not_just_head(ray_session):
    """The point of the full trainer: parameters OUTSIDE the CRF head move
    (word/char embeddings, LSTM, conv) — train.py:478-479 parity. One
    distributed epoch pass + one SGD step; every block must change."""
    from ner_pytorch_ray.pipelines.training import GRAD_SCALE
    from ner_pytorch_ray.pipelines.training_full import (
        TRAINED_PARAMS,
        full_epoch_pass,
        full_feature_cache,
        sgd_step_full,
        unpack_dense,
    )
    from ner_pytorch_ray.state.backprop import dense_shapes

    encoded, vocab, weights = full_feature_cache(SF, seed=1234)
    n_tags = len(vocab["tag_to_id"])
    start, stop = n_tags - 2, n_tags - 1
    id_to_tag = {v: k for k, v in vocab["tag_to_id"].items()}
    params = {k: weights[k].astype(np.float64).copy() for k in TRAINED_PARAMS}
    params["meta"] = weights["meta"]
    momenta = {k: np.zeros_like(params[k]) for k in TRAINED_PARAMS}
    shapes = dense_shapes(weights)

    n, n_tok, nll_i, dense_i, word_i, _ = full_epoch_pass(
        encoded, params, id_to_tag, start, stop
    )
    assert n > 0 and nll_i > 0
    grads = unpack_dense(dense_i.astype(np.float64) / GRAD_SCALE / n_tok, shapes)
    grads["word_embed"] = word_i.astype(np.float64) / GRAD_SCALE / n_tok
    before = {k: params[k].copy() for k in TRAINED_PARAMS}
    sgd_step_full(params, momenta, grads, lr=1.0, momentum=0.5, clip=5.0)
    for k in TRAINED_PARAMS:
        assert not np.array_equal(before[k], params[k]), f"{k} did not move"


def test_full_training_resume_equals_clean_run(ray_session, tmp_path):
    """Epoch-granular crash recovery: a run killed after epoch 1 and
    resumed must produce the IDENTICAL curve (integer state snapshots,
    no recomputation drift)."""
    import pandas as pd

    from ner_pytorch_ray.pipelines.training_full import train_loop_full

    clean = train_loop_full(SF, n_epochs=3).to_pandas()
    rd = str(tmp_path / "run")
    partial = train_loop_full(SF, n_epochs=1, run_dir=rd).to_pandas()
    assert len(partial) == 2  # epochs 0..1 — the "crash" point
    resumed = train_loop_full(SF, n_epochs=3, run_dir=rd).to_pandas()
    pd.testing.assert_frame_equal(resumed, clean)


def test_full_training_resume_fingerprint_mismatch(ray_session, tmp_path):
    from ner_pytorch_ray.pipelines.training_full import train_loop_full

    rd = str(tmp_path / "run")
    train_loop_full(SF, n_epochs=1, run_dir=rd)
    with pytest.raises(ValueError, match="fingerprint"):
        train_loop_full(SF, n_epochs=2, run_dir=rd, lr=0.5)
