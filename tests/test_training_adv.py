"""Adversarial-loss mixing in the distributed training loop
(pipelines/training.py adv_* machinery; reference train.py:421-470:
loss = clean*(1-ratio) + adv*ratio, WarmupWeight ratio, launch_epoch gate,
dynamic_inference top-k-by-NLL variant selection train.py:383-395).

The end-to-end trajectory parity vs the single-process sequential
recompute is covered by the ``training_curve_adv`` expected-parquet
oracle (tools/check_oracles.py); these tests pin the distributed-specific
properties: partition invariance of the packed adv pass, forward-only NLL
parity, selection semantics, and the launch gate."""

import struct

import numpy as np
import pyarrow as pa

from ner_pytorch_ray.state.model import crf_head_grads, crf_head_nll

SF = "/root/testdata/sf0.001"


def test_crf_head_nll_matches_grads_nll():
    """Forward-only NLL is bit-identical to crf_head_grads' first return
    (same recursion, same float ops)."""
    rng = np.random.RandomState(5)
    C, H2 = 6, 5
    start, stop = C - 2, C - 1
    for n in (1, 2, 9):
        h = rng.randn(n, H2)
        fc_w = rng.randn(C, H2) * 0.3
        fc_b = rng.randn(C) * 0.1
        trans = rng.randn(C, C) * 0.5
        trans[start, :] = -1e4
        trans[:, stop] = -1e4
        tags = rng.randint(0, C - 2, size=n)
        full, _, _, _ = crf_head_grads(h, tags, fc_w, fc_b, trans, start, stop)
        fast = crf_head_nll(h, tags, fc_w, fc_b, trans, start, stop)
        assert fast == full


def _synth_packed_table(n_sent=25, max_var=7, H2=8, C=6, seed=9):
    """Packed adv cache rows: one vpack binary cell per source sentence."""
    rng = np.random.RandomState(seed)
    urls, sids, cells = [], [], []
    for i in range(n_sent):
        k = rng.randint(1, max_var + 1)
        buf = bytearray(struct.pack("<q", k))
        for vid in range(k):
            n = rng.randint(1, 9)
            h = rng.randn(n, H2).astype("<f4")
            tags = rng.randint(0, C - 2, size=n).astype("<i8")
            buf += struct.pack("<qq", vid, n)
            buf += h.tobytes()
            buf += tags.tobytes()
        urls.append(f"u{i}")
        sids.append(i)
        cells.append(bytes(buf))
    return pa.Table.from_pydict(
        {
            "url": pa.array(urls, type=pa.string()),
            "sent_id": pa.array(sids, type=pa.int64()),
            "vpack": pa.array(cells, type=pa.binary()),
        }
    )


def test_adv_pass_partition_invariant_and_mode_semantics(ray_session):
    """Integer adv-gradient sums are bit-identical under any partitioning;
    dynamic top-k selects exactly min(k, topk) variants per sentence and
    matches a direct per-group recompute."""
    import ray

    from ner_pytorch_ray.pipelines.training import (
        _iter_vpack,
        adv_epoch_partials,
    )

    C, H2 = 6, 8
    rng = np.random.RandomState(11)
    head = (rng.randn(C, H2), rng.randn(C), rng.randn(C, C))
    head[2][C - 2, :] = -1e4
    head[2][:, C - 1] = -1e4
    t = _synth_packed_table(H2=H2, C=C)

    results = {}
    for mode in ("dynamic", "non_gradient"):
        per_parts = []
        for parts in (2, 7):
            ds = ray.data.from_arrow(t).repartition(parts)
            per_parts.append(
                adv_epoch_partials(ds, head, C - 2, C - 1, mode=mode, topk=3)
            )
        (n1, k1, l1, a1, b1, c1), (n2, k2, l2, a2, b2, c2) = per_parts
        assert (n1, k1, l1) == (n2, k2, l2)
        assert np.array_equal(a1, a2)
        assert np.array_equal(b1, b2)
        assert np.array_equal(c1, c2)
        results[mode] = per_parts[0]

    # non_gradient covers every variant; dynamic keeps min(k, topk) each
    ks = [
        struct.unpack_from("<q", cell, 0)[0]
        for cell in t.column("vpack").to_pylist()
    ]
    assert results["non_gradient"][0] == sum(ks)
    assert results["dynamic"][0] == sum(min(k, 3) for k in ks)

    # direct recompute of the dynamic selection, per group
    exp_n_tok = 0
    exp_nll_i = 0
    for cell in t.column("vpack").to_pylist():
        its = list(_iter_vpack(cell, H2))
        nlls = np.array(
            [
                crf_head_nll(h, tg, head[0], head[1], head[2], C - 2, C - 1)
                for _, _, h, tg in its
            ]
        )
        keep = np.argsort(-nlls, kind="stable")[:3]
        for i in sorted(keep):
            _, n, h, tg = its[i]
            nll, _, _, _ = crf_head_grads(
                h, tg, head[0], head[1], head[2], C - 2, C - 1
            )
            exp_n_tok += n
            exp_nll_i += int(round(nll * 10_000))
    assert results["dynamic"][1] == exp_n_tok
    assert results["dynamic"][2] == exp_nll_i


def test_launch_gate_and_mixing_changes_trajectory(ray_session):
    """launch_epoch beyond the horizon reproduces the clean trajectory
    exactly (ratio never applied); an active launch changes it."""
    from ner_pytorch_ray.pipelines.training import train_loop

    plain = train_loop(SF, n_epochs=2, patience=10).to_pydict()
    gated = train_loop(
        SF, n_epochs=2, patience=10, adv_order="rep", launch_epoch=99
    ).to_pydict()
    for col in ("epoch", "n_train", "mean_nll", "dev_f1"):
        assert gated[col] == plain[col], col
    assert gated["n_adv"] == [0, 0, 0]
    assert gated["ratio"] == [0.0, 0.0, 0.0]

    active = train_loop(
        SF, n_epochs=2, patience=10, adv_order="rep", launch_epoch=0
    ).to_pydict()
    assert active["n_adv"][1] > 0
    assert active["ratio"][1] > 0.0
    assert active["mean_nll"] != plain["mean_nll"]  # epoch-2 NLL at mixed head


def test_train_cli_adv_flags(ray_session, capsys):
    from ner_pytorch_ray.train_cli import main

    rc = main(
        [
            "--sf_dir", SF, "--epochs", "2",
            "--adv_order", "rep", "--launch_epoch", "0",
            "--adv_mode", "non_gradient",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "ratio" in out and "best dev F1" in out
