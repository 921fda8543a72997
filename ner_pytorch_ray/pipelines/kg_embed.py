"""TransE knowledge-graph embeddings over the constructed triple table —
distributed full-batch gradient descent with EXACT integer arithmetic.

The reference pipeline stops at tagged mentions (NER-pytorch emits spans;
train.py:478-479 is token-level SGD); a KG-construction engine additionally
wants entity/relation embeddings over its own (subj, pred, obj) output for
link prediction and entity similarity (Bordes et al. 2013, TransE). This
module trains them the same way ``pipelines/training.py`` trains the
tagger: per-block ANALYTIC gradient partials summed as plain int64 —
integer addition is associative+commutative, so the model trajectory is
bit-identical under any partitioning, block order, or cluster size. No
float appears anywhere in the training loop:

- embeddings live in int64 MICRO units, initialized from blake2b(entity:k)
  (content-keyed: no dependence on row order or vocab numbering);
- the score is squared L2 in micro^2: d(h,r,t) = sum_k (h_k+r_k-t_k)^2;
- hinge activation (margin + d_pos - d_neg > 0) and its gradient
  2*(h+r-t) are exact integers;
- learning-rate scaling (floor division by 10^6) happens ONLY on the
  driver after the global gradient sum — never inside a partial, where
  per-block rounding would break partitioning invariance.

Scale shape: the triple table streams through ``map_batches`` (one pass
per epoch); per-block partials are (id, k, grad) rows over TOUCHED
entities only, combiner'd before one small shuffle per epoch. The model
(entity/relation embedding matrix) is broadcast per epoch via ``ray.put``
— the same frozen-backbone pattern as training.py. The driver holds one
int64 matrix of |entities| x dim; beyond driver memory the step itself
shards by entity-id range (the gradient table is already keyed by entity),
which is the documented growth path.

Negative sampling is content-keyed (blake2b of the triple), one corrupted
head and one corrupted tail per triple per epoch — deterministic without
any global RNG state.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

MICRO = 1_000_000
_INIT = 375_000  # ~0.375 in micro units ~ 6/sqrt(dim) / 4 for dim=16


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def _init_vec(name: str, dim: int) -> np.ndarray:
    """Content-keyed deterministic init in [-_INIT, _INIT] micro units."""
    return np.array(
        [(_h64(f"{name}:{k}") % (2 * _INIT + 1)) - _INIT for k in range(dim)],
        dtype=np.int64,
    )


def _neg_index(subj: str, pred: str, obj: str, salt: str, n: int) -> int:
    return _h64(f"{subj}|{pred}|{obj}|{salt}") % n


class _TransEState:
    """Driver-side model state: entity/relation int64 matrices + id maps."""

    def __init__(self, entities: list[str], relations: list[str], dim: int):
        self.entities = entities  # sorted
        self.relations = relations  # sorted
        self.eid = {e: i for i, e in enumerate(entities)}
        self.rid = {r: i for i, r in enumerate(relations)}
        self.E = np.stack([_init_vec("ent:" + e, dim) for e in entities])
        self.R = np.stack([_init_vec("rel:" + r, dim) for r in relations])
        self.dim = dim


_KIND_ENT, _KIND_REL, _KIND_LOSS, _KIND_ACTIVE = 0, 1, 2, 3


def _scatter_rows(idxs: np.ndarray, vecs: np.ndarray, kind: int) -> pa.Table:
    """Sum dim-vectors per index (sort + reduceat — vectorized combine),
    emit (kind, idx, k, g) rows for nonzero components."""
    order = np.argsort(idxs, kind="stable")
    idxs, vecs = idxs[order], vecs[order]
    starts = np.r_[0, np.nonzero(np.diff(idxs))[0] + 1]
    uniq = idxs[starts]
    summed = np.add.reduceat(vecs, starts, axis=0)
    nz = summed != 0
    ii, kk = np.nonzero(nz)
    return pa.table(
        {
            "kind": pa.array(np.full(len(ii), kind, dtype=np.int64)),
            "idx": pa.array(uniq[ii].astype(np.int64)),
            "k": pa.array(kk.astype(np.int64)),
            "g": pa.array(summed[ii, kk].astype(np.int64)),
        }
    )


class _GradPartial:
    """Integer hinge-loss gradient partial per triple block — an actor-pool
    callable: the broadcast model state is fetched ONCE per actor in
    ``__init__`` (zero-copy plasma read), never per batch. The math is
    fully vectorized (index gather, matrix diffs, scatter-reduce); only the
    content-keyed negative sampling hashes per row. Emits
    (kind, idx, k, g) rows plus (KIND_LOSS,0,0,sum_hinge) and
    (KIND_ACTIVE,0,0,n_active). Exact int64 sums — no scaling/rounding."""

    def __init__(self, state_ref, margin_sq: int):
        self.st: _TransEState = (
            ray.get(state_ref)
            if isinstance(state_ref, ray.ObjectRef)
            else state_ref
        )
        self.margin_sq = margin_sq

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _grad_partial(batch, self.st, self.margin_sq)


def _grad_partial(
    batch: pa.Table,
    st: _TransEState,
    margin_sq: int,
) -> pa.Table:
    E, R = st.E, st.R
    n_ent = len(st.entities)
    subj = batch.column("subj").to_pylist()
    pred = batch.column("pred").to_pylist()
    obj = batch.column("obj").to_pylist()
    n = len(subj)
    if n == 0:
        return pa.table(
            {
                "kind": pa.array([], type=pa.int64()),
                "idx": pa.array([], type=pa.int64()),
                "k": pa.array([], type=pa.int64()),
                "g": pa.array([], type=pa.int64()),
            }
        )
    hi = np.array([st.eid[s] for s in subj], dtype=np.int64)
    ri = np.array([st.rid[p] for p in pred], dtype=np.int64)
    ti = np.array([st.eid[o] for o in obj], dtype=np.int64)
    nt = np.array(
        [_neg_index(s, p, o, "nt", n_ent) for s, p, o in zip(subj, pred, obj)],
        dtype=np.int64,
    )
    nh = np.array(
        [_neg_index(s, p, o, "nh", n_ent) for s, p, o in zip(subj, pred, obj)],
        dtype=np.int64,
    )
    nt = np.where(nt == ti, (nt + 1) % n_ent, nt)
    nh = np.where(nh == hi, (nh + 1) % n_ent, nh)

    H, Rm, T = E[hi], R[ri], E[ti]
    diff_pos = H + Rm - T
    d_pos = np.einsum("ij,ij->i", diff_pos, diff_pos)

    ent_idx_parts: list[np.ndarray] = []
    ent_vec_parts: list[np.ndarray] = []
    rel_idx_parts: list[np.ndarray] = []
    rel_vec_parts: list[np.ndarray] = []
    loss = 0
    active = 0
    for corrupt_head, ni in ((False, nt), (True, nh)):
        diff_neg = (E[ni] + Rm - T) if corrupt_head else (H + Rm - E[ni])
        d_neg = np.einsum("ij,ij->i", diff_neg, diff_neg)
        hinge = margin_sq + d_pos - d_neg
        a = hinge > 0
        if not a.any():
            continue
        active += int(a.sum())
        loss += int(hinge[a].sum())
        gp = 2 * diff_pos[a]
        gn = 2 * diff_neg[a]
        rel_idx_parts.append(ri[a])
        rel_vec_parts.append(gp - gn)
        if corrupt_head:
            # d/dh=gp, d/dt=-gp+gn, d/dh'=-gn
            ent_idx_parts += [hi[a], ti[a], ni[a]]
            ent_vec_parts += [gp, gn - gp, -gn]
        else:
            # d/dh=gp-gn, d/dt=-gp, d/dt'=gn
            ent_idx_parts += [hi[a], ti[a], ni[a]]
            ent_vec_parts += [gp - gn, -gp, gn]

    parts = []
    if ent_idx_parts:
        parts.append(
            _scatter_rows(
                np.concatenate(ent_idx_parts),
                np.vstack(ent_vec_parts),
                _KIND_ENT,
            )
        )
        parts.append(
            _scatter_rows(
                np.concatenate(rel_idx_parts), np.vstack(rel_vec_parts), _KIND_REL
            )
        )
    parts.append(
        pa.table(
            {
                "kind": pa.array([_KIND_LOSS, _KIND_ACTIVE], type=pa.int64()),
                "idx": pa.array([0, 0], type=pa.int64()),
                "k": pa.array([0, 0], type=pa.int64()),
                "g": pa.array([loss, active], type=pa.int64()),
            }
        )
    )
    return pa.concat_tables(parts)


def _apply_step(st: _TransEState, grad_rows, lr_micro: int) -> tuple[int, int]:
    """Driver-side exact step: x -= (lr * g) // MICRO on globally-summed
    gradients (floor division happens ONLY here, after the global sum).
    Returns (sum_hinge, n_active)."""
    loss = active = 0
    for kind, idx, k, g in grad_rows:
        if kind == _KIND_LOSS:
            loss = g
        elif kind == _KIND_ACTIVE:
            active = g
        elif kind == _KIND_ENT:
            st.E[idx, k] -= (lr_micro * g) // MICRO
        else:
            st.R[idx, k] -= (lr_micro * g) // MICRO
    return loss, active


def _checksum(st: _TransEState) -> int:
    """Order-free state fingerprint in micro units (exact int sum)."""
    return int(np.abs(st.E).sum() + np.abs(st.R).sum())


_CURVE_SCHEMA = pa.schema(
    [
        ("epoch", pa.int64()),
        ("loss_micro2", pa.int64()),
        ("n_active", pa.int64()),
        ("emb_checksum", pa.int64()),
    ]
)


def transe_curve_ds(
    triples: ray.data.Dataset,
    dim: int = 16,
    epochs: int = 5,
    lr_micro: int = 10_000,
    margin_sq: int = MICRO * MICRO,
) -> pa.Table:
    """Train TransE over a (subj, pred, obj) Dataset; returns the per-epoch
    curve table (loss in micro^2 units, hinge-active count, state
    checksum). Bit-identical for any partitioning of ``triples``."""
    curve, _, _ = _transe_train(triples, dim, epochs, lr_micro, margin_sq)
    return curve


def _transe_train(
    triples: ray.data.Dataset,
    dim: int,
    epochs: int,
    lr_micro: int,
    margin_sq: int,
):
    """Shared training loop: returns (curve table, final state, the
    materialized distinct-triple Dataset)."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    # Distinct-triple table stays DISTRIBUTED: the epoch passes stream
    # over it (materialized once in the object store, spill-backed); the
    # driver never holds triple rows. Only the VOCAB — the distinct
    # entity/relation strings, i.e. the model itself — lands on the
    # driver, via two distinct aggregates over single key columns.
    distinct = triples.groupby(["subj", "pred", "obj"]).count()
    tri = distinct.select_columns(["subj", "pred", "obj"]).materialize()

    ent_ds = (
        tri.select_columns(["subj"])
        .rename_columns({"subj": "e"})
        .union(tri.select_columns(["obj"]).rename_columns({"obj": "e"}))
        .groupby("e")
        .count()
    )
    rel_ds = tri.groupby("pred").count()
    entities = sorted(r["e"] for r in ent_ds.take_all())  # vocab-sized
    relations = sorted(r["pred"] for r in rel_ds.take_all())  # vocab-sized
    st = _TransEState(entities, relations, dim)

    # Size the epoch-pass block count from the data, not a constant: aim
    # for ~32 MB blocks but never fewer blocks than cluster CPUs (so a
    # small KG still parallelizes the gradient pass).
    cpus = int(ray.cluster_resources().get("CPU", 8))
    target_block = 32 * 1024 * 1024
    nbytes = tri.size_bytes() or 0
    nparts = max(cpus, -(-nbytes // target_block))
    if tri.num_blocks() != nparts:
        tri = tri.repartition(nparts).materialize()

    # size routing (embedding-near-dup precedent): a small model ships in
    # the task closure (zero actor-ramp per epoch); a large one is
    # broadcast once per epoch via ray.put and fetched once per actor in
    # _GradPartial.__init__ (never per batch)
    small_model = st.E.nbytes + st.R.nbytes <= 4 * 1024 * 1024

    curve = []
    for epoch in range(epochs):
        if small_model:
            partials = tri.map_batches(
                _GradPartial(st, margin_sq), batch_format="pyarrow"
            )
        else:
            ref = ray.put(st)
            partials = tri.map_batches(
                _GradPartial,
                fn_constructor_args=(ref, margin_sq),
                concurrency=(1, 4),
                batch_format="pyarrow",
            )
        if small_model:
            # per-block partials are already combined; for a small model the
            # merged table is bounded by blocks x touched-vocab x dim, so
            # fold it driver-side and skip the shuffle's fixed cost. Integer
            # addition is order-free — identical to the groupby path.
            acc: dict[tuple[int, int, int], int] = {}
            for r in partials.take_all():
                kk = (r["kind"], r["idx"], r["k"])
                acc[kk] = acc.get(kk, 0) + r["g"]
            grad_rows = [(k[0], k[1], k[2], g) for k, g in acc.items()]
        else:
            summed = grouped_sum(
                partials, ["kind", "idx", "k"], sum_cols=["g"]
            )
            grad_rows = [
                (r["kind"], r["idx"], r["k"], r["g"])
                for r in summed.take_all()
            ]  # bounded: touched-vocab x dim
        loss, active = _apply_step(st, grad_rows, lr_micro)
        curve.append((epoch, loss, active, _checksum(st)))

    curve_t = pa.Table.from_pydict(
        {
            "epoch": pa.array([c[0] for c in curve], type=pa.int64()),
            "loss_micro2": pa.array([c[1] for c in curve], type=pa.int64()),
            "n_active": pa.array([c[2] for c in curve], type=pa.int64()),
            "emb_checksum": pa.array([c[3] for c in curve], type=pa.int64()),
        },
        schema=_CURVE_SCHEMA,
    )
    return curve_t, st, tri


def kg_transe_curve(sf_dir: str, dim: int = 16, epochs: int = 5) -> pa.Table:
    """TransE training curve over the engine's own constructed KG triples
    (pipelines/kg.relations_from_documents)."""
    from ner_pytorch_ray.pipelines.kg import relations_from_documents

    triples = relations_from_documents(sf_dir).select_columns(
        ["subj", "pred", "obj"]
    )
    return transe_curve_ds(triples, dim=dim, epochs=epochs)


class _ScorePartial:
    """Per-block TransE triple scoring with the trained model: exact
    integer distances d(h,r,t) in micro^2 for the positive and its two
    content-keyed corruptions (same 'nt'/'nh' salts as training). State is
    fetched once per actor for broadcast models; small models arrive in
    the task closure."""

    def __init__(self, state_ref):
        self.st: _TransEState = (
            ray.get(state_ref)
            if isinstance(state_ref, ray.ObjectRef)
            else state_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        st = self.st
        subj = batch.column("subj").to_pylist()
        pred = batch.column("pred").to_pylist()
        obj = batch.column("obj").to_pylist()
        n = len(subj)
        empty = pa.schema(
            [
                ("subj", pa.string()),
                ("pred", pa.string()),
                ("obj", pa.string()),
                ("d_pos", pa.int64()),
                ("d_neg_tail", pa.int64()),
                ("d_neg_head", pa.int64()),
                ("hit", pa.int64()),
            ]
        )
        if n == 0:
            return empty.empty_table()
        n_ent = len(st.entities)
        E, R = st.E, st.R
        hi = np.array([st.eid[s] for s in subj], dtype=np.int64)
        ri = np.array([st.rid[p] for p in pred], dtype=np.int64)
        ti = np.array([st.eid[o] for o in obj], dtype=np.int64)
        nt = np.array(
            [
                _neg_index(s, p, o, "nt", n_ent)
                for s, p, o in zip(subj, pred, obj)
            ],
            dtype=np.int64,
        )
        nh = np.array(
            [
                _neg_index(s, p, o, "nh", n_ent)
                for s, p, o in zip(subj, pred, obj)
            ],
            dtype=np.int64,
        )
        nt = np.where(nt == ti, (nt + 1) % n_ent, nt)
        nh = np.where(nh == hi, (nh + 1) % n_ent, nh)

        def dist(a, r, b):
            d = E[a] + R[r] - E[b]
            return np.einsum("ij,ij->i", d, d)

        d_pos = dist(hi, ri, ti)
        d_nt = dist(hi, ri, nt)
        d_nh = dist(nh, ri, ti)
        hit = ((d_pos < d_nt) & (d_pos < d_nh)).astype(np.int64)
        return pa.table(
            {
                "subj": batch.column("subj"),
                "pred": batch.column("pred"),
                "obj": batch.column("obj"),
                "d_pos": pa.array(d_pos.astype(np.int64)),
                "d_neg_tail": pa.array(d_nt.astype(np.int64)),
                "d_neg_head": pa.array(d_nh.astype(np.int64)),
                "hit": pa.array(hit),
            }
        )


def transe_hits_ds(
    triples: ray.data.Dataset,
    dim: int = 16,
    epochs: int = 5,
    lr_micro: int = 10_000,
    margin_sq: int = MICRO * MICRO,
) -> ray.data.Dataset:
    """Train TransE, then score every distinct triple against its two
    content-keyed corruptions — the link-prediction evaluation the
    embeddings exist for. Returns (subj, pred, obj, d_pos, d_neg_tail,
    d_neg_head, hit) sorted by triple; all distances exact int64 micro^2,
    so the table is bit-identical under any partitioning."""
    _, st, tri = _transe_train(triples, dim, epochs, lr_micro, margin_sq)
    small_model = st.E.nbytes + st.R.nbytes <= 4 * 1024 * 1024
    if small_model:
        scored = tri.map_batches(_ScorePartial(st), batch_format="pyarrow")
    else:
        ref = ray.put(st)
        scored = tri.map_batches(
            _ScorePartial,
            fn_constructor_args=(ref,),
            concurrency=(1, 4),
            batch_format="pyarrow",
        )
    return scored.sort(["subj", "pred", "obj"])


def kg_transe_hits(sf_dir: str, dim: int = 16, epochs: int = 5):
    """TransE link-prediction scores over the engine's own constructed KG
    triples."""
    from ner_pytorch_ray.pipelines.kg import relations_from_documents

    triples = relations_from_documents(sf_dir).select_columns(
        ["subj", "pred", "obj"]
    )
    return transe_hits_ds(triples, dim=dim, epochs=epochs)
