"""GloVe-format embedding reader (S2/S3) + deterministic pseudo-embeddings.

Reference semantics:
  * embedding text lines ``word v1 .. v100``; rows with wrong arity skipped
    (train.py:122-127);
  * pretrained-vocab set = first whitespace token per line (loader.py:188-193);
  * words missing from the file get U(-sqrt(0.06), sqrt(0.06)) rows
    (train.py:128-136) — here seeded per word for determinism (SURVEY §4).

Driver-side load + ``ray.put`` broadcast: the embedding matrix is the
classic small side (V x dim floats), read once, shipped by ref.
"""

from __future__ import annotations

import hashlib

import numpy as np


def read_glove_text(path: str, dim: int = 100) -> dict[str, np.ndarray]:
    """Parse GloVe text; skip wrong-arity rows (train.py:122-127)."""
    out: dict[str, np.ndarray] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip().split()
            if len(parts) == dim + 1:
                out[parts[0]] = np.asarray(parts[1:], dtype=np.float32)
    return out


def pretrained_vocab(path: str) -> set[str]:
    """First token per line (loader.py:188-193)."""
    with open(path, encoding="utf-8") as f:
        return {line.rstrip().split()[0].strip() for line in f if line.strip()}


def _seeded_vec(word: str, dim: int, scale: float) -> np.ndarray:
    seed = int.from_bytes(
        hashlib.blake2b(word.encode(), digest_size=4).digest(), "little"
    )
    rng = np.random.RandomState(seed)
    return rng.uniform(-scale, scale, size=dim).astype(np.float32)


def pseudo_glove(words: list[str], dim: int = 100) -> dict[str, np.ndarray]:
    """Deterministic per-word embeddings (the sandbox stand-in for a real
    GloVe file): each word's vector is seeded by its own hash, so any
    worker/driver computes identical vectors."""
    scale = float(np.sqrt(0.06))
    return {w: _seeded_vec(w, dim, scale) for w in words}


def build_embedding_matrix(
    id_to_word: dict[int, str],
    pretrained: dict[str, np.ndarray],
    dim: int = 100,
) -> np.ndarray:
    """Matrix build with lowercase fallback then seeded-random rows
    (train.py:128-136; reference uses unseeded np.random.uniform — we seed
    per word so retries reproduce, SURVEY §4 determinism note)."""
    n = len(id_to_word)
    m = np.empty((n, dim), dtype=np.float32)
    scale = float(np.sqrt(0.06))
    for i in range(n):
        w = id_to_word[i]
        if w in pretrained:
            m[i] = pretrained[w]
        elif w.lower() in pretrained:
            m[i] = pretrained[w.lower()]
        else:
            m[i] = _seeded_vec(w, dim, scale)
    return m
