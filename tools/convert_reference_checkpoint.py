"""Convert a reference NER-pytorch torch checkpoint into the engine's npz
weight layout (round-4 verdict ask #2: checkpoint interop).

The reference saves either a bare ``model.state_dict()`` (train.py:511) or
``{'state_dict': ..., 'optimizer': ...}`` (pytorchtools.py:56-57, the
EarlyStopping path that ``train.py:183-188 --reload`` consumes). This tool
maps the tensors of the deployed configuration — ``use_crf=True,
char_mode='CNN'``, no cap embedding (train.py / arguments.py defaults) —
onto ``ner_pytorch_ray.state.model`` npz keys, so a model trained with the
reference can run inference on this engine:

    python tools/convert_reference_checkpoint.py checkpoint.pt out.npz

Torch is imported lazily and only for loading the file; the name map and
shape logic are pure numpy, so they are unit-testable in environments
without torch (tests/test_checkpoint_convert.py feeds a synthetic dict).

Reference param shapes (model.py:34-103, crf.py:22-34):
  char_embeds.weight        (n_chars, char_dim)          model.py:61
  char_cnn3.weight          (char_out, 1, 3, char_dim)   model.py:68
  char_cnn3.bias            (char_out,)
  word_embeds.weight        (n_words, word_dim)          model.py:70
  lstm.weight_ih_l0[+_reverse]  (4*hidden, word_dim+char_out)  model.py:83
  lstm.weight_hh_l0[+_reverse]  (4*hidden, hidden)
  lstm.bias_ih_l0[+_reverse]    (4*hidden,)
  lstm.bias_hh_l0[+_reverse]    (4*hidden,)
  crf.fc.weight             (n_tags, 2*hidden)           crf.py:29
  crf.fc.bias               (n_tags,)
  crf.transitions           (n_tags, n_tags)             crf.py:32

PyTorch LSTM gate order is (i, f, g, o) — identical to the engine's
``state/model.py`` step, so LSTM tensors copy through unchanged. The conv
tensor drops its singleton in_channels axis. ``meta`` is derived from the
shapes (state/model.py:79: [n_words, n_chars, n_tags, word_dim, char_dim,
char_out, hidden]).
"""

from __future__ import annotations

import sys

import numpy as np

TORCH_TO_NPZ = {
    "char_embeds.weight": "char_embed",
    "char_cnn3.weight": "conv_w",  # (C,1,3,D) -> squeeze in_channels
    "char_cnn3.bias": "conv_b",
    "word_embeds.weight": "word_embed",
    "lstm.weight_ih_l0": "lstm_fw_Wih",
    "lstm.weight_hh_l0": "lstm_fw_Whh",
    "lstm.bias_ih_l0": "lstm_fw_bih",
    "lstm.bias_hh_l0": "lstm_fw_bhh",
    "lstm.weight_ih_l0_reverse": "lstm_bw_Wih",
    "lstm.weight_hh_l0_reverse": "lstm_bw_Whh",
    "lstm.bias_ih_l0_reverse": "lstm_bw_bih",
    "lstm.bias_hh_l0_reverse": "lstm_bw_bhh",
    "crf.fc.weight": "fc_w",
    "crf.fc.bias": "fc_b",
    "crf.transitions": "trans",
}

# Params of configurations the engine does not run: the LSTM char mode
# (model.py:65), the highway/h2_h1 layers that the CNN forward leaves
# commented out (model.py:92-94,163-165), the no-CRF head (model.py:96),
# and the cap-embedding option (model.py:56). Silently skipped.
IGNORED_PREFIXES = (
    "char_lstm.",
    "hw_trans.",
    "hw_gate.",
    "h2_h1.",
    "hidden2tag.",
    "cap_embeds.",
)


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch.Tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def convert_state_dict(sd: dict) -> dict[str, np.ndarray]:
    """Map a reference state_dict (torch tensors or arrays) to the engine
    npz layout; derives ``meta`` and validates cross-shape consistency."""
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]  # EarlyStopping wrapper (pytorchtools.py:56)
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k in TORCH_TO_NPZ:
            a = _to_numpy(v)
            if k == "char_cnn3.weight":
                if a.ndim != 4 or a.shape[1] != 1:
                    raise ValueError(
                        f"char_cnn3.weight shape {a.shape}: expected "
                        "(char_out, 1, 3, char_dim)"
                    )
                a = a[:, 0, :, :]
            out[TORCH_TO_NPZ[k]] = a
        elif not k.startswith(IGNORED_PREFIXES):
            raise KeyError(f"unknown reference parameter: {k!r}")

    missing = sorted(set(TORCH_TO_NPZ.values()) - set(out))
    if missing:
        raise KeyError(f"checkpoint lacks mapped params: {missing}")

    n_words, word_dim = out["word_embed"].shape
    n_chars, char_dim = out["char_embed"].shape
    n_tags = out["trans"].shape[0]
    char_out = out["conv_b"].shape[0]
    hidden = out["lstm_fw_Whh"].shape[1]
    expect = {
        "conv_w": (char_out, 3, char_dim),
        "trans": (n_tags, n_tags),
        "fc_w": (n_tags, 2 * hidden),
        "fc_b": (n_tags,),
        "lstm_fw_Wih": (4 * hidden, word_dim + char_out),
        "lstm_bw_Wih": (4 * hidden, word_dim + char_out),
        "lstm_fw_Whh": (4 * hidden, hidden),
        "lstm_bw_Whh": (4 * hidden, hidden),
        "lstm_fw_bih": (4 * hidden,),
        "lstm_fw_bhh": (4 * hidden,),
        "lstm_bw_bih": (4 * hidden,),
        "lstm_bw_bhh": (4 * hidden,),
    }
    for k, shape in expect.items():
        if out[k].shape != shape:
            raise ValueError(f"{k} shape {out[k].shape}: expected {shape}")
    out["meta"] = np.array(
        [n_words, n_chars, n_tags, word_dim, char_dim, char_out, hidden]
    )
    return out


def main(argv: list[str]) -> int:
    if len(argv) != 2:
        print(__doc__)
        return 2
    src, dst = argv
    try:
        import torch
    except ImportError:
        print(
            "torch is not installed here — run this converter where the "
            "reference checkpoint was trained",
            file=sys.stderr,
        )
        return 1
    sd = torch.load(src, map_location="cpu")
    w = convert_state_dict(sd)

    from ner_pytorch_ray.state.model import save_weights

    save_weights(dst, w)
    print(f"wrote {dst}: {sorted(w)}")
    return 0


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    raise SystemExit(main(sys.argv[1:]))
