"""Dependency-tree projection / reordering (C6) — pure functions.

Re-expression of /root/reference/dependency_paraphraser/projection.py:8-96
and utils.py:6-29 with one systemic change: every stochastic choice takes an
explicit ``random.Random`` (the reference shuffles/compares via the global
unseeded RNG — SURVEY §4 keyed determinism).

The tree representation is CoNLL-style: per-token ``head`` is 1-based with
0 = root (conll2ch semantics, utils.py:6-10: children keyed by head-1, root
bucket -1).
"""

from __future__ import annotations

import math
import random
from collections import defaultdict
from functools import cmp_to_key


def heads_to_children(heads: list[int]) -> dict[int, list[int]]:
    """conll2ch (utils.py:6-10): 1-based heads (0=root) -> {parent: [kids]}
    with 0-based ids and root bucket -1."""
    ch: dict[int, list[int]] = defaultdict(list)
    for i, h in enumerate(heads):
        ch[int(h) - 1].append(i)
    return dict(ch)


def anneal(p: float, t: float = 1) -> float:
    """Temperature-modified probability (utils.py:21-29), exact semantics."""
    if t == 1:
        return p
    if t == math.inf:
        return 0.5
    if t == 0:
        return int(p > 0.5)
    return 1 / (1 + math.exp(-(math.log(p / (1 - p)) / t)))


def pair_features(
    heads: list[int], deprels: list[str], upos: list[str]
) -> tuple[list[dict], list[tuple[int, int]]]:
    """sent2xy feature rows (projection.py:8-45): for every ordered pair of
    (parent + its children) within each tree bucket, l/r-prefixed deprel and
    pos indicator features; the parent's deprel feature is 'parent'."""
    ch = heads_to_children(heads)
    xs: list[dict] = []
    ids: list[tuple[int, int]] = []
    for parent_id, children_ids in ch.items():
        bucket = children_ids if parent_id == -1 else [parent_id] + children_ids
        for l_id in bucket:
            for r_id in bucket:
                if l_id == r_id:
                    continue
                feat = {}
                for lr, idx in (("r", r_id), ("l", l_id)):
                    dep = "parent" if idx == parent_id else deprels[idx]
                    feat[f"{lr}_deprel_{dep}"] = 1
                    feat[f"{lr}_pos_{upos[idx]}"] = 1
                xs.append(feat)
                ids.append((l_id, r_id))
    return xs, ids


def hash_projector_proba(features: dict) -> float:
    """Deterministic stand-in for the sklearn LogisticRegression projector
    pickle (paraphrase_model.py:28 loads one; unavailable here): logistic
    over hash-derived feature weights. Clearly NOT the trained model — same
    call shape, frozen deterministic output."""
    import hashlib

    z = 0.0
    for k, v in sorted(features.items()):
        h = hashlib.blake2b(k.encode(), digest_size=4).digest()
        w = int.from_bytes(h, "little") / 2**32 - 0.5
        z += w * v
    return 1 / (1 + math.exp(-z))


def project_tree(
    children: dict[int, list[int]],
    pair_to_proba: dict[tuple[int, int], float] | None,
    rng: random.Random,
    root_id: int = -1,
    temperature: float = 1,
    shuffle: bool = True,
) -> list[int]:
    """project_tree_randomly (projection.py:48-84): recursively order each
    parent+children bucket by the pairwise-probability noisy comparator
    (anneal + rng draw), else shuffle, else sorted."""
    if root_id not in children and root_id != -1:
        return [root_id]
    bucket = children[root_id][:]
    ids = bucket if root_id == -1 else [root_id] + bucket

    def comparator(l: int, r: int) -> float:
        raw = (pair_to_proba[(l, r)] + 1 - pair_to_proba[(r, l)]) / 2
        return rng.random() - anneal(raw, t=temperature)

    if pair_to_proba:
        rng.shuffle(ids)
        ids = sorted(ids, key=cmp_to_key(comparator))
    elif shuffle:
        rng.shuffle(ids)
    else:
        ids = sorted(ids)

    result: list[int] = []
    for tok_id in ids:
        if tok_id == root_id:
            result.append(tok_id)
        else:
            result.extend(
                project_tree(
                    children,
                    pair_to_proba,
                    rng,
                    root_id=tok_id,
                    temperature=temperature,
                    shuffle=shuffle,
                )
            )
    return result


def reorder_sentence(
    heads: list[int],
    deprels: list[str],
    upos: list[str],
    seed: int,
    temperature: float = 1,
    proba_fn=hash_projector_proba,
) -> list[int]:
    """make_tree_projection (projection.py:87-96): pairwise probas from the
    projector, then a seeded projection. Returns the token permutation."""
    xs, ids = pair_features(heads, deprels, upos)
    pair2proba = {pid: proba_fn(x) for pid, x in zip(ids, xs)}
    ch = heads_to_children(heads)
    return project_tree(
        ch,
        pair2proba,
        random.Random(seed),
        temperature=temperature,
    )
