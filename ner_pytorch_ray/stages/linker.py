"""Entity linker: alias-table exact hit, else embedding-cosine k-NN.

Ray-Data re-expression of the reference's Word_Replacement / Neighbor_finder
(word_rep.py:26-38, 40-180, 183-215; J3/J4 in SURVEY.md §2.4):

  * the alias table (entity_id, tag_type, surface, vec) is the small side —
    broadcast once via ``ray.put`` and materialized per actor in
    ``__init__``, never per batch;
  * exact lookup = hash probe on (tag_type, lower surface)
    (reference word_rep.py:101-108);
  * fallback = cosine over L2-normalized per-type embedding matrices
    (reference uses FAISS Flat-IP after normalize_L2 == cosine; we use a
    numpy matmul — identical math, no FAISS in this sandbox);
  * ``link_method`` records which path linked each mention.

Mentions without a vec column can only exact-link; misses get
entity_id = "" and link_method = "none".
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def build_alias_state(alias_table: pa.Table) -> dict:
    """Precompute exact-lookup dict + per-type normalized matrices."""
    tag_types = alias_table.column("tag_type").to_pylist()
    surfaces = alias_table.column("surface").to_pylist()
    entity_ids = alias_table.column("entity_id").to_pylist()
    has_vec = "vec" in alias_table.column_names
    vecs = alias_table.column("vec").to_pylist() if has_vec else None

    # exact keys are "tag_type\x00lower_surface" strings so the probe side
    # can build them with one vectorized Arrow join + a C-speed Series.map
    exact: dict[str, str] = {}
    per_type: dict[str, dict] = {}
    for i, (t, s, e) in enumerate(zip(tag_types, surfaces, entity_ids)):
        exact.setdefault(t + "\x00" + s.lower(), e)
        if has_vec:
            d = per_type.setdefault(t, {"ids": [], "vecs": []})
            d["ids"].append(e)
            d["vecs"].append(vecs[i])
    mats = {}
    for t, d in per_type.items():
        m = np.asarray(d["vecs"], dtype=np.float32)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mats[t] = {"ids": d["ids"], "mat": m / norms}
    return {"exact": exact, "mats": mats}


class LinkerActor:
    """Stateful map_batches callable: alias state built once per actor."""

    def __init__(self, alias_ref, min_cosine: float = 0.5):
        state = ray.get(alias_ref) if isinstance(alias_ref, ray.ObjectRef) else alias_ref
        if isinstance(state, pa.Table):
            state = build_alias_state(state)
        self.exact = state["exact"]
        self.mats = state["mats"]
        self.min_cosine = min_cosine

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        has_vec = "vec" in batch.column_names
        vecs = (
            np.asarray(batch.column("vec").to_pylist(), dtype=np.float32)
            if has_vec and n
            else None
        )

        # exact pass: one Arrow key build + one C-speed map over the batch
        tt = batch.column("tag_type")
        if isinstance(tt, pa.ChunkedArray):
            tt = tt.combine_chunks()
        sf = batch.column("surface")
        if isinstance(sf, pa.ChunkedArray):
            sf = sf.combine_chunks()
        keys = pc.binary_join_element_wise(
            tt, pc.utf8_lower(sf), "\x00"
        )
        mapped = pd.Series(np.asarray(keys, dtype=object)).map(self.exact)
        hit = mapped.notna().to_numpy()
        entity_ids = mapped.fillna("").to_numpy(dtype=object).tolist()
        scores = np.where(hit, np.float32(1.0), np.float32(0.0)).astype(
            np.float32
        )
        methods = np.where(hit, "exact", "none").astype(object).tolist()
        miss_idx = np.nonzero(~hit)[0].tolist()
        tag_types = tt.to_pylist() if miss_idx else []

        # cosine fallback, batched per tag type (one matmul per type)
        if miss_idx and vecs is not None and self.mats:
            by_type: dict[str, list[int]] = {}
            for i in miss_idx:
                by_type.setdefault(tag_types[i], []).append(i)
            for t, idxs in by_type.items():
                m = self.mats.get(t)
                if m is None:
                    continue
                q = vecs[idxs]
                qn = np.linalg.norm(q, axis=1, keepdims=True)
                qn[qn == 0] = 1.0
                sims = (q / qn) @ m["mat"].T  # [k, n_aliases]
                best = np.argmax(sims, axis=1)
                for row, i in enumerate(idxs):
                    s = float(sims[row, best[row]])
                    if s >= self.min_cosine:
                        entity_ids[i] = m["ids"][best[row]]
                        scores[i] = s
                        methods[i] = "cosine"

        out = batch
        out = out.append_column("entity_id", pa.array(entity_ids, type=pa.string()))
        out = out.append_column("link_score", pa.array(scores))
        out = out.append_column("link_method", pa.array(methods, type=pa.string()))
        return out


def link_stage(
    mentions: ray.data.Dataset,
    alias_table: pa.Table,
    concurrency: int | tuple[int, int] = (1, 64),
    min_cosine: float = 0.5,
    batch_size: int | None = None,
    num_gpus: float = 0,
) -> ray.data.Dataset:
    """Broadcast the alias state once (ray.put) and link on an actor pool.

    ``batch_size=None`` means one task per input block: a fixed batch_size
    here makes Ray bundle many small upstream blocks into few fused tasks,
    which collapses the whole fused pipeline's parallelism.

    Exact-only alias tables (no ``vec`` column) skip the actor pool: the
    probe state is a small dict captured by a plain task UDF (pickled once
    per stage, cached in warm workers), which removes the actor-pool
    spin-up (~3 s on a cold first query) and lets the stage fuse with its
    upstream map. The cosine-capable path keeps the actor pool (matrices +
    per-actor state belong in ``__init__``).
    """
    state = build_alias_state(alias_table)
    if not state["mats"]:
        linker = LinkerActor(state, min_cosine)  # plain callable, no actors
        return mentions.map_batches(
            linker.__call__,
            batch_size=batch_size,
            batch_format="pyarrow",
        )
    state_ref = ray.put(state)
    # num_gpus reserves GPU fractions per linker actor (for an embedding-
    # model backend); 0 = CPU-only, identical numerics
    extra = {"num_gpus": num_gpus} if num_gpus else {}
    return mentions.map_batches(
        LinkerActor,
        fn_constructor_args=(state_ref, min_cosine),
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
        **extra,
    )


def gazetteer_alias_table() -> pa.Table:
    """Alias table for the frozen gazetteer (no vecs — exact-only linking)."""
    from ner_pytorch_ray.stages.gazetteer import GAZETTEER, BIGRAMS

    rows = [
        {"entity_id": eid, "tag_type": t, "surface": s}
        for s, (t, eid) in GAZETTEER.items()
    ] + [
        {"entity_id": eid, "tag_type": t, "surface": " ".join(ws)}
        for ws, (t, eid) in BIGRAMS.items()
    ]
    return pa.Table.from_pylist(rows)


def union_alias_tables(*tables: pa.Table) -> pa.Table:
    """D3/S9 (gen_adv_pipline.py:116-119 YAGO word-bank append): union of
    alias tables with exact dedup on (tag_type, lower surface) keeping the
    FIRST occurrence (word_rep.py:151-153 dedup-first semantics) — earlier
    tables take precedence."""
    seen: set[tuple[str, str]] = set()
    keep: list[pa.Table] = []
    for t in tables:
        mask = []
        for tt, s in zip(
            t.column("tag_type").to_pylist(), t.column("surface").to_pylist()
        ):
            key = (tt, s.lower())
            mask.append(key not in seen)
            seen.add(key)
        keep.append(t.filter(pa.array(mask)))
    cols = set(keep[0].column_names)
    if any(set(t.column_names) != cols for t in keep):
        keep = [t.select(sorted(cols & set(t.column_names))) for t in keep]
    return pa.concat_tables(keep, promote_options="default")
