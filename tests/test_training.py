"""Distributed training epoch (pipelines/training.py, train.py:404-516
analog): analytic-gradient parity vs numerical differentiation, dev-F1
improvement over epochs, partitioning-determinism of the integer epoch
gradient, and checkpoint loadability."""

import numpy as np
import pyarrow as pa
import pytest

from ner_pytorch_ray.state.model import (
    _logsumexp,
    crf_head_grads,
    head_emissions,
)

SF = "/root/testdata/sf0.001"


def _nll_of(h, tags, fc_w, fc_b, trans, start, stop):
    """Independent NLL (plain logsumexp forward pass) for the parity check."""
    feats = head_emissions(h, fc_w, fc_b)
    T = trans.astype(np.float64)
    n = len(tags)
    alpha = T[:, start] + feats[0]
    for t in range(1, n):
        alpha = _logsumexp(alpha[None, :] + T, axis=1) + feats[t]
    log_z = _logsumexp((alpha + T[stop])[None, :], axis=1)[0]
    emit = feats[np.arange(n), tags].sum()
    tr = T[tags[0], start] + T[stop, tags[-1]]
    if n > 1:
        tr += T[tags[1:], tags[:-1]].sum()
    return log_z - emit - tr


@pytest.mark.parametrize("n", [1, 2, 6])
def test_crf_head_grads_match_finite_differences(n):
    rng = np.random.RandomState(7 + n)
    C, H2 = 6, 5
    start, stop = C - 2, C - 1
    h = rng.randn(n, H2)
    fc_w = rng.randn(C, H2) * 0.3
    fc_b = rng.randn(C) * 0.1
    trans = rng.randn(C, C) * 0.5
    trans[start, :] = -1e4
    trans[:, stop] = -1e4
    tags = rng.randint(0, C - 2, size=n)

    nll, gw, gb, gt = crf_head_grads(h, tags, fc_w, fc_b, trans, start, stop)
    assert abs(nll - _nll_of(h, tags, fc_w, fc_b, trans, start, stop)) < 1e-10

    eps = 1e-6

    def fd(base, g, setter):
        for idx in np.ndindex(*base.shape):
            p = base.copy()
            p[idx] += eps
            hi = _nll_of(h, tags, *setter(p), start, stop)
            p[idx] -= 2 * eps
            lo = _nll_of(h, tags, *setter(p), start, stop)
            num = (hi - lo) / (2 * eps)
            assert abs(num - g[idx]) < 1e-6, (idx, num, g[idx])

    fd(fc_w, gw, lambda p: (p, fc_b, trans))
    fd(fc_b, gb, lambda p: (fc_w, p, trans))
    # pinned entries carry zero analytic gradient by design — numerical
    # gradient there is also ~0 (IMPOSSIBLE paths have weight e^-1e4)
    fd(trans, gt, lambda p: (fc_w, fc_b, p))


def _synth_features_table(n_sent=40, H2=8, C=6, seed=3):
    rng = np.random.RandomState(seed)
    rows = {"url": [], "sent_id": [], "n_tokens": [], "hb": [], "tb": [],
            "is_dev": [], "tags_true": []}
    for i in range(n_sent):
        n = rng.randint(1, 9)
        h = rng.randn(n, H2).astype("<f4")
        tags = rng.randint(0, C - 2, size=n).astype("<i8")
        rows["url"].append(f"u{i}")
        rows["sent_id"].append(i)
        rows["n_tokens"].append(n)
        rows["hb"].append(h.tobytes())
        rows["tb"].append(tags.tobytes())
        rows["is_dev"].append(False)
        rows["tags_true"].append(["O"] * n)
    return pa.Table.from_pydict(
        {
            "url": pa.array(rows["url"], type=pa.string()),
            "sent_id": pa.array(rows["sent_id"], type=pa.int64()),
            "n_tokens": pa.array(rows["n_tokens"], type=pa.int64()),
            "hb": pa.array(rows["hb"], type=pa.binary()),
            "tb": pa.array(rows["tb"], type=pa.binary()),
            "is_dev": pa.array(rows["is_dev"], type=pa.bool_()),
            "tags_true": pa.array(rows["tags_true"], type=pa.list_(pa.string())),
        }
    )


def test_epoch_gradient_partition_invariant(ray_session):
    """Integer gradient sums are bit-identical under any partitioning."""
    import ray

    from ner_pytorch_ray.pipelines.training import epoch_gradient

    C, H2 = 6, 8
    rng = np.random.RandomState(11)
    head = (rng.randn(C, H2), rng.randn(C), rng.randn(C, C))
    t = _synth_features_table(H2=H2, C=C)
    results = []
    for parts in (2, 7):
        ds = ray.data.from_arrow(t).repartition(parts)
        results.append(epoch_gradient(ds, head, C - 2, C - 1))
    (n1, k1, l1, a1, b1, c1), (n2, k2, l2, a2, b2, c2) = results
    assert (n1, k1, l1) == (n2, k2, l2)
    assert np.array_equal(a1, a2)
    assert np.array_equal(b1, b2)
    assert np.array_equal(c1, c2)


def test_train_loop_dev_f1_improves(ray_session, tmp_path):
    """The reference's lifecycle bar: dev F1 improves over >= 2 epochs on
    sf0.001 (teacher labels are realizable by the convex head NLL, so the
    curve must climb), mean NLL decreases, and the best checkpoint loads
    back into the inference model."""
    from ner_pytorch_ray.pipelines.training import train_loop
    from ner_pytorch_ray.state.model import NumpyBiLSTMCRF, load_weights

    ckpt = str(tmp_path / "best.npz")
    curve = train_loop(
        SF, n_epochs=3, checkpoint_path=ckpt, patience=10
    ).to_pydict()
    f1 = curve["dev_f1"]
    nll = curve["mean_nll"]
    assert len(f1) == 4  # epoch 0 (initial head) + 3 training epochs
    assert f1[2] > f1[1] and f1[3] > f1[2]  # improves over >= 2 epochs
    assert f1[3] > f1[0]
    assert nll[2] < nll[1] and nll[3] < nll[2]

    w = load_weights(ckpt)
    model = NumpyBiLSTMCRF(w)
    out = model.decode([[1, 2, 3]], [[[1], [2], [1, 2]]])
    assert len(out) == 1 and len(out[0]) == 3


def test_train_cli_runs(ray_session, capsys):
    from ner_pytorch_ray.train_cli import main

    rc = main(["--sf_dir", SF, "--epochs", "1", "--dev_mod", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "best dev F1" in out and "epoch   1" in out


def test_features_path_persists_and_resumes(ray_session, tmp_path):
    """features_path: the backbone pass persists to parquet; a rerun
    short-circuits from disk and produces the identical training curve."""
    import os

    from ner_pytorch_ray.pipelines.training import train_loop

    fdir = str(tmp_path / "feats")
    c1 = train_loop(SF, n_epochs=2, features_path=fdir, patience=10).to_pydict()
    assert os.path.exists(os.path.join(fdir, "_DONE"))
    mtimes = {
        f: os.path.getmtime(os.path.join(fdir, f)) for f in os.listdir(fdir)
    }
    c2 = train_loop(SF, n_epochs=2, features_path=fdir, patience=10).to_pydict()
    assert c1 == c2
    # the cache was not rewritten
    assert mtimes == {
        f: os.path.getmtime(os.path.join(fdir, f)) for f in os.listdir(fdir)
    }


def test_eval_cli_with_trained_checkpoint(ray_session, tmp_path, capsys):
    """Lifecycle closure: train -> checkpoint+vocab -> eval_cli scores the
    corpus with the learned head and writes the S7 prediction sink."""
    import glob
    import os

    import pyarrow.parquet as pq

    from ner_pytorch_ray.eval_cli import main as eval_main
    from ner_pytorch_ray.pipelines.training import train_loop

    ckpt = str(tmp_path / "best.npz")
    train_loop(SF, n_epochs=1, checkpoint_path=ckpt, patience=10)
    out = str(tmp_path / "preds")
    rc = eval_main(["--sf_dir", SF, "--checkpoint", ckpt, "--out", out])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "conlleval:" in printed and "micro acc" in printed
    n = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(out, "*.parquet"))
    )
    assert n > 0


def test_vocab_save_load_roundtrip(ray_session, tmp_path):
    from ner_pytorch_ray.pipelines.neural import build_vocab_state
    from ner_pytorch_ray.sources.pages import pages_from_documents
    from ner_pytorch_ray.stages.extract import extract_stage
    from ner_pytorch_ray.stages.sentences import sentences_stage
    from ner_pytorch_ray.state.vocab import load_vocab, save_vocab

    v = build_vocab_state(
        sentences_stage(extract_stage(pages_from_documents(SF)), zeros=True)
    )
    path = str(tmp_path / "vocab.json")
    save_vocab(path, v)
    v2 = load_vocab(path)
    for k in ("word_to_id", "char_to_id", "tag_to_id", "id_to_tag"):
        assert v2[k] == v[k]
