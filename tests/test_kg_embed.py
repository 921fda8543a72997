"""Integer TransE over the constructed KG (pipelines/kg_embed.py):
partitioning invariance, gradient correctness vs a scalar recompute, and
optimization sanity. The frozen sequential oracle comparison runs in the
driver-style gate (tests/expected/kg_transe_curve.parquet)."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _toy_triples():
    return pa.table(
        {
            "subj": pa.array(["a", "a", "b", "c", "d", "d", "e"]),
            "pred": pa.array(["p", "q", "p", "q", "p", "q", "p"]),
            "obj": pa.array(["b", "c", "c", "d", "e", "a", "a"]),
        }
    )


def test_transe_partitioning_invariance(ray_session):
    """The whole training trajectory (loss, active count, state checksum
    per epoch) is bit-identical across block layouts and row orders."""
    import ray

    from ner_pytorch_ray.pipelines.kg_embed import transe_curve_ds

    t = _toy_triples()
    one = transe_curve_ds(ray.data.from_arrow(t), epochs=3)
    perm = np.random.default_rng(3).permutation(t.num_rows)
    many = transe_curve_ds(
        ray.data.from_arrow(t.take(perm.tolist())).repartition(5), epochs=3
    )
    assert one.to_pydict() == many.to_pydict()


def test_transe_gradient_matches_scalar(ray_session):
    """One distributed epoch == a from-scratch scalar recompute of the
    integer hinge gradients (independent accumulation path)."""
    import hashlib

    import ray

    from ner_pytorch_ray.pipelines.kg_embed import (
        MICRO,
        _init_vec,
        transe_curve_ds,
    )

    t = _toy_triples()
    dim, margin_sq, lr = 16, MICRO * MICRO, 10_000
    tri = sorted(set(zip(*[t.column(c).to_pylist() for c in ("subj", "pred", "obj")])))
    entities = sorted({s for s, _, _ in tri} | {o for _, _, o in tri})
    relations = sorted({p for _, p, _ in tri})
    E = {e: _init_vec("ent:" + e, dim).astype(object) for e in entities}
    R = {r: _init_vec("rel:" + r, dim).astype(object) for r in relations}

    def h64(s):
        return int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
        )

    ge = {e: np.zeros(dim, dtype=object) for e in entities}
    gr = {r: np.zeros(dim, dtype=object) for r in relations}
    loss = 0
    for s, p, o in tri:
        dp = E[s] + R[p] - E[o]
        d_pos = int((dp * dp).sum())
        for salt, ch in (("nt", False), ("nh", True)):
            ni = h64(f"{s}|{p}|{o}|{salt}") % len(entities)
            if ch and entities[ni] == s:
                ni = (ni + 1) % len(entities)
            if not ch and entities[ni] == o:
                ni = (ni + 1) % len(entities)
            c = entities[ni]
            dn = (E[c] + R[p] - E[o]) if ch else (E[s] + R[p] - E[c])
            hinge = margin_sq + d_pos - int((dn * dn).sum())
            if hinge <= 0:
                continue
            loss += hinge
            gp, gn = 2 * dp, 2 * dn
            gr[p] += gp - gn
            if ch:
                ge[s] += gp
                ge[o] += gn - gp
                ge[c] -= gn
            else:
                ge[s] += gp - gn
                ge[o] -= gp
                ge[c] += gn
    for e in entities:
        E[e] -= (lr * ge[e]) // MICRO
    for r in relations:
        R[r] -= (lr * gr[r]) // MICRO
    checksum = sum(int(abs(x)) for v in E.values() for x in v) + sum(
        int(abs(x)) for v in R.values() for x in v
    )

    got = transe_curve_ds(ray.data.from_arrow(t), epochs=1).to_pydict()
    assert got["loss_micro2"][0] == loss
    assert got["emb_checksum"][0] == checksum


def test_transe_loss_decreases(ray_session):
    """Full-batch GD on the real sf0.001 KG: final-epoch loss well below
    epoch 0 (the margin objective is actually being optimized)."""
    from ner_pytorch_ray.pipelines.kg_embed import kg_transe_curve

    curve = kg_transe_curve(SF, epochs=4).to_pydict()
    assert curve["loss_micro2"][-1] < 0.8 * curve["loss_micro2"][0]


def test_transe_hits_partitioning_invariance(ray_session):
    """Scores and hits are bit-identical for any input partitioning, and
    the hit flag is exactly (d_pos < both corruption distances)."""
    import pyarrow as pa

    import ray.data

    from ner_pytorch_ray.pipelines.kg_embed import transe_hits_ds

    ents = [f"e{i}" for i in range(12)]
    tri = [
        (ents[i % 12], f"r{i % 3}", ents[(i * 5 + 1) % 12])
        for i in range(24)
    ]
    t = pa.table(
        {
            "subj": pa.array([x[0] for x in tri], type=pa.string()),
            "pred": pa.array([x[1] for x in tri], type=pa.string()),
            "obj": pa.array([x[2] for x in tri], type=pa.string()),
        }
    )
    one = transe_hits_ds(
        ray.data.from_arrow(t).repartition(1), dim=8, epochs=3
    ).to_pandas()
    many = transe_hits_ds(
        ray.data.from_arrow(t).repartition(7), dim=8, epochs=3
    ).to_pandas()
    assert one.equals(many)
    assert (
        one["hit"]
        == ((one["d_pos"] < one["d_neg_tail"]) & (one["d_pos"] < one["d_neg_head"])).astype("int64")
    ).all()
    assert (one["d_pos"] >= 0).all()


def test_transe_driver_never_materializes_triples():
    """Scale contract (round-4 verdict #1): the distinct-triple table is
    corpus-sized, so the driver must never take_all() it. AST-lint the
    module: every ``.take_all()`` receiver must be one of the bounded
    datasets — the entity/relation vocab aggregates (model-sized) or the
    gradient partials (touched-vocab x dim). ``tri``/``distinct``/``triples``
    (triple-row datasets) must never be a take_all receiver."""
    import ast
    import inspect

    from ner_pytorch_ray.pipelines import kg_embed

    tree = ast.parse(inspect.getsource(kg_embed))
    forbidden_roots = {"tri", "distinct", "triples", "scored"}
    allowed_roots = {"ent_ds", "rel_ds", "partials", "summed"}

    def root_name(node):
        while isinstance(node, (ast.Attribute, ast.Call)):
            node = node.func if isinstance(node, ast.Call) else node.value
        return node.id if isinstance(node, ast.Name) else None

    seen = []
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in ("take_all", "to_pandas", "to_arrow")
        ):
            root = root_name(node.func.value)
            seen.append((node.lineno, root))
            assert root not in forbidden_roots, (
                f"line {node.lineno}: driver materializes the triple-row "
                f"dataset '{root}' — corpus-sized at web scale"
            )
            # `tri.groupby("pred").count().take_all()` roots at `tri` but
            # the receiver is the vocab aggregate; detect the .groupby in
            # the chain. Anything else rooted at a triple dataset fails
            # above; vocab/gradient roots pass here.
            assert root in allowed_roots or _chains_through_groupby(
                node.func.value
            ), f"line {node.lineno}: unexpected take_all receiver '{root}'"
    assert seen, "lint saw no take_all calls — receiver names moved?"


def _chains_through_groupby(node):
    import ast

    while isinstance(node, (ast.Attribute, ast.Call)):
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute):
            if node.func.attr in ("groupby", "count"):
                return True
        node = node.func if isinstance(node, ast.Call) else node.value
    return False
