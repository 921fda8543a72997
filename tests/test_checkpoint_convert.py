"""Reference-checkpoint converter (tools/convert_reference_checkpoint.py):
torch-free validation of the name map against a synthetic state_dict with
the reference's exact parameter shapes (model.py:34-103, crf.py:22-34),
then a functional round-trip through the engine's NumpyBiLSTMCRF."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_reference_checkpoint import (  # noqa: E402
    IGNORED_PREFIXES,
    TORCH_TO_NPZ,
    convert_state_dict,
)

N_WORDS, N_CHARS, N_TAGS = 30, 12, 7
WORD_DIM, CHAR_DIM, CHAR_OUT, HIDDEN = 10, 5, 4, 6


def _synthetic_state_dict(rng):
    d_in = WORD_DIM + CHAR_OUT
    sd = {
        "char_embeds.weight": rng.randn(N_CHARS, CHAR_DIM),
        "char_cnn3.weight": rng.randn(CHAR_OUT, 1, 3, CHAR_DIM),
        "char_cnn3.bias": rng.randn(CHAR_OUT),
        "word_embeds.weight": rng.randn(N_WORDS, WORD_DIM),
        "crf.fc.weight": rng.randn(N_TAGS, 2 * HIDDEN),
        "crf.fc.bias": rng.randn(N_TAGS),
        "crf.transitions": rng.randn(N_TAGS, N_TAGS),
        # non-CNN-path params the converter must skip, not reject
        "hw_trans.weight": rng.randn(CHAR_OUT, CHAR_OUT),
        "hw_gate.bias": rng.randn(CHAR_OUT),
        "hidden2tag.weight": rng.randn(N_TAGS, 2 * HIDDEN),
    }
    for suffix in ("", "_reverse"):
        sd[f"lstm.weight_ih_l0{suffix}"] = rng.randn(4 * HIDDEN, d_in)
        sd[f"lstm.weight_hh_l0{suffix}"] = rng.randn(4 * HIDDEN, HIDDEN)
        sd[f"lstm.bias_ih_l0{suffix}"] = rng.randn(4 * HIDDEN)
        sd[f"lstm.bias_hh_l0{suffix}"] = rng.randn(4 * HIDDEN)
    return sd


def test_name_map_round_trips_init_weights_shapes():
    """Every npz key init_weights produces (except meta) is the image of
    exactly one torch name, and conversion reproduces init_weights'
    shapes for the same hyperparameters."""
    from ner_pytorch_ray.state.model import init_weights

    w0 = init_weights(
        N_WORDS,
        N_CHARS,
        N_TAGS,
        word_dim=WORD_DIM,
        char_dim=CHAR_DIM,
        char_out=CHAR_OUT,
        hidden=HIDDEN,
    )
    assert set(TORCH_TO_NPZ.values()) == set(w0) - {"meta"}

    rng = np.random.RandomState(0)
    w = convert_state_dict(_synthetic_state_dict(rng))
    for k in w0:
        assert w[k].shape == w0[k].shape, k
    assert w["meta"].tolist() == w0["meta"].tolist()
    assert all(w[k].dtype == np.float32 for k in w if k != "meta")


def test_converted_weights_run_inference():
    """The converted dict loads into NumpyBiLSTMCRF and decodes — the
    functional contract behind train.py:183-188 --reload."""
    from ner_pytorch_ray.state.model import NumpyBiLSTMCRF

    rng = np.random.RandomState(7)
    sd = _synthetic_state_dict(rng)
    # the reference keeps the CRF structural masks in the tensor itself
    sd["crf.transitions"][N_TAGS - 2, :] = -1e4
    sd["crf.transitions"][:, N_TAGS - 1] = -1e4
    model = NumpyBiLSTMCRF(convert_state_dict(sd))
    words = [[1, 2, 3], [4, 5]]
    chars = [[[1, 2], [3], [4, 5, 6]], [[7], [8, 9]]]
    tags = model.decode(words, chars)
    assert [len(t) for t in tags] == [3, 2]
    assert all(0 <= t < N_TAGS - 2 for seq in tags for t in seq)


def test_early_stopping_wrapper_and_tensor_duck_typing():
    """Accepts the {'state_dict': ..., 'optimizer': ...} wrapper
    (pytorchtools.py:56) and objects exposing .detach().cpu().numpy()."""

    class FakeTensor:
        def __init__(self, a):
            self.a = a

        def detach(self):
            return self

        def cpu(self):
            return self

        def numpy(self):
            return self.a

    rng = np.random.RandomState(1)
    sd = {k: FakeTensor(v) for k, v in _synthetic_state_dict(rng).items()}
    w = convert_state_dict({"state_dict": sd, "optimizer": {"lr": 0.015}})
    assert w["conv_w"].shape == (CHAR_OUT, 3, CHAR_DIM)


def test_unknown_param_rejected_missing_param_reported():
    rng = np.random.RandomState(2)
    sd = _synthetic_state_dict(rng)
    sd["mystery.weight"] = rng.randn(3, 3)
    with pytest.raises(KeyError, match="mystery"):
        convert_state_dict(sd)
    del sd["mystery.weight"]
    del sd["crf.transitions"]
    with pytest.raises(KeyError, match="trans"):
        convert_state_dict(sd)
    assert all(p.endswith(".") for p in IGNORED_PREFIXES)
