"""Differential tests: schedulers vs the reference's own implementations
(weight_scheduler.py is torch-free; pytorchtools needs the stub)."""

import math


def test_warmup_weight_matches_reference(reference_path):
    import weight_scheduler as ref  # /root/reference

    from ner_pytorch_ray.state.schedulers import WarmupWeight

    for style in ("linear", "exponential", "constant", None):
        for alpha in (1.0, 2.5):
            r = ref.WarmupWeight(
                0.3, warmup_iter=10, num_iters=50, warmup_style=style, alpha=alpha
            )
            g = WarmupWeight(
                0.3, warmup_iter=10, num_iters=50, warmup_style=style, alpha=alpha
            )
            for step in range(1, 25):
                assert math.isclose(
                    g.step(step), r.step(step), rel_tol=1e-12
                ), (style, alpha, step)


def test_early_stopping_matches_reference(reference_path):
    import pytorchtools as ref  # /root/reference (torch stubbed)

    from ner_pytorch_ray.state.schedulers import EarlyStopping

    losses = [1.0, 0.9, 0.95, 0.94, 0.93, 0.8, 0.85, 0.86, 0.87, 0.88]
    saves = []
    g = EarlyStopping(patience=3, save_fn=lambda: saves.append(1),
                      trace_func=lambda s: None)

    # reference instance with the torch.save call neutralized
    r = ref.EarlyStopping(patience=3, trace_func=lambda s: None)
    r_saves = []
    r.save_checkpoint = lambda vl, m, o: (r_saves.append(1),
                                          setattr(r, "val_loss_min", vl))

    stopped_at_g = stopped_at_r = None
    for i, vl in enumerate(losses):
        if stopped_at_g is None:
            g(vl)
            if g.early_stop:
                stopped_at_g = i
        if stopped_at_r is None:
            r(vl, None, None)
            if r.early_stop:
                stopped_at_r = i

    assert stopped_at_g == stopped_at_r
    assert len(saves) == len(r_saves)
    assert g.counter == r.counter and g.best_score == r.best_score


def test_early_stopping_save_fn_wires_npz(tmp_path):
    """The pluggable sink: save_fn writes frozen weights on improvement."""
    import numpy as np

    from ner_pytorch_ray.state.model import init_weights, load_weights, save_weights
    from ner_pytorch_ray.state.schedulers import EarlyStopping

    w = init_weights(n_words=5, n_chars=4, n_tags=6, word_dim=4,
                     char_dim=3, char_out=3, hidden=4, seed=1)
    path = str(tmp_path / "ckpt.npz")
    es = EarlyStopping(patience=2, save_fn=lambda: save_weights(path, w),
                       trace_func=lambda s: None)
    es(1.0)
    loaded = load_weights(path)
    assert set(loaded) == set(w)
    assert np.array_equal(loaded["trans"], w["trans"])
