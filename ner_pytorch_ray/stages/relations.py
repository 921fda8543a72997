"""Relation extraction: verb-pattern predicates between co-sentence mentions.

The reference's "relate" capability is its dependency machinery
(/root/reference/paraphrase_model.py:21-32 wraps a UDPipe parse per
sentence; /root/reference/dependency_paraphraser/udpipe.py:15-72 attaches
heads/deprels). UDPipe models are unavailable in this sandbox, so the
engine's relation extractor is the lightweight deterministic pattern the
SURVEY (§7.2 step 6) plans for: for each ordered pair of mentions in a
sentence, the FIRST verb-lexicon token strictly between them becomes the
predicate:

    subj = entity(m1), pred = verb, obj = entity(m2),  m1 before m2

Frozen semantics (SQL-oracle-able; the driver's DuckDB gate checks them):
  * mentions = gazetteer spans (stages/gazetteer.py), linked exactly;
  * candidate pairs: m1.end <= m2.begin (non-overlapping, ordered);
  * predicate: first token p with m1.end <= p < m2.begin and
    token in VERB_LEXICON; pairs with no verb between them emit nothing
    (plain co-occurrence is edges_from_linked's job);
  * one vote per (url, sent_id, subj, pred, obj); weight = #sentences,
    sample_url = min url — mirroring edges (stages/graph.py).

Everything is vectorized over FLAT token coordinates: sentences are
contiguous runs of the flattened batch, so "first verb between two flat
positions" is one ``np.searchsorted`` over the sorted verb positions —
no per-sentence Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ner_pytorch_ray.stages.mentions import vectorized_spans
from ner_pytorch_ray.stages.gazetteer import entity_for_surface

VERB_LEXICON = frozenset(
    {"scan", "filter", "merge", "sort", "group", "query"}
)

_EMPTY = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("weight", pa.int64()),
        ("sample_url", pa.string()),
    ]
)


def _relations_evidence_df(batch: pa.Table):
    """Shared vectorized core: distinct per-sentence relation EVIDENCE
    rows (url, sid, subj, pred, obj) for this block, or None."""
    tokens = batch.column("tokens")
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    tags = batch.column("tags")
    if isinstance(tags, pa.ChunkedArray):
        tags = tags.combine_chunks()

    lens = pc.list_value_length(tokens).to_numpy().astype(np.int64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])

    flat_tags = pc.list_flatten(tags)
    flat_toks = pc.list_flatten(tokens)
    if isinstance(flat_toks, pa.ChunkedArray):
        flat_toks = flat_toks.combine_chunks()

    begin, end, sent_of, start_tags = vectorized_spans(flat_tags, offsets)
    if not len(begin):
        return None

    # entity per mention (exact gazetteer link on the lowered surface)
    first_tok = pc.utf8_lower(pc.take(flat_toks, pa.array(begin)))
    surfaces = np.asarray(first_tok, dtype=object)
    span_len = end - begin
    multi = np.nonzero(span_len > 1)[0]
    if len(multi):
        all_idx = np.concatenate([np.arange(begin[i], end[i]) for i in multi])
        toks = pc.utf8_lower(pc.take(flat_toks, pa.array(all_idx))).to_pylist()
        pos = 0
        for i in multi:
            ln = int(span_len[i])
            surfaces[i] = " ".join(toks[pos : pos + ln])
            pos += ln
    ents = np.array(
        [
            (entity_for_surface(s) or (None, None))[1]
            for s in surfaces
        ],
        dtype=object,
    )
    linked = np.array([e is not None for e in ents], dtype=bool)
    if not linked.any():
        return None
    begin, end, sent_of, ents = (
        begin[linked],
        end[linked],
        sent_of[linked],
        ents[linked],
    )

    # verb positions in flat coordinates (dict-encoded membership)
    enc = flat_toks.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    uniq = enc.dictionary.to_pylist()
    verb_codes = {k for k, w in enumerate(uniq) if w in VERB_LEXICON}
    codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
    vmask = np.isin(codes, np.fromiter(verb_codes, dtype=np.int64)) if verb_codes else np.zeros(len(codes), bool)
    vpos = np.nonzero(vmask)[0]  # sorted ascending
    if not len(vpos):
        return None
    vtok = np.asarray(pc.take(flat_toks, pa.array(vpos)), dtype=object)

    # ordered co-sentence pairs via a self-merge on the sentence index
    df = pd.DataFrame({"sent": sent_of, "b": begin, "e": end, "ent": ents})
    m = df.merge(df, on="sent", suffixes=("_1", "_2"))
    m = m[m["e_1"] <= m["b_2"]]
    if m.empty:
        return None

    # first verb at flat position in [e_1, b_2): sentences are contiguous
    # flat ranges, so the window never crosses a sentence boundary
    e1 = m["e_1"].to_numpy()
    b2 = m["b_2"].to_numpy()
    vi = np.searchsorted(vpos, e1, side="left")
    ok = (vi < len(vpos)) & (vpos[np.minimum(vi, len(vpos) - 1)] < b2)
    m = m[ok]
    if m.empty:
        return None
    pred = vtok[vi[ok]]

    urls = np.asarray(batch.column("url"), dtype=object)
    sids = batch.column("sent_id").to_numpy()
    out = pd.DataFrame(
        {
            "url": urls[m["sent"].to_numpy()],
            "sid": sids[m["sent"].to_numpy()],
            "subj": m["ent_1"].to_numpy(),
            "pred": pred,
            "obj": m["ent_2"].to_numpy(),
        }
    )
    # one vote per sentence (block-local distinct before any shuffle)
    return out.drop_duplicates(["url", "sid", "subj", "pred", "obj"])


def _relations_partial(batch: pa.Table) -> pa.Table:
    """Block-local triple aggregate (weight + min sample_url) over the
    evidence core."""
    out = _relations_evidence_df(batch)
    if out is None:
        return _EMPTY.empty_table()
    g = (
        out.groupby(["subj", "pred", "obj"], sort=True)
        .agg(weight=("url", "size"), sample_url=("url", "min"))
        .reset_index()
    )
    return pa.Table.from_pydict(
        {
            "subj": pa.array(g["subj"], type=pa.string()),
            "pred": pa.array(g["pred"], type=pa.string()),
            "obj": pa.array(g["obj"], type=pa.string()),
            "weight": pa.array(g["weight"].to_numpy(dtype=np.int64), type=pa.int64()),
            "sample_url": pa.array(g["sample_url"], type=pa.string()),
        }
    )


_EV_EMPTY = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int64()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
    ]
)


def _relations_evidence_partial(batch: pa.Table) -> pa.Table:
    out = _relations_evidence_df(batch)
    if out is None:
        return _EV_EMPTY.empty_table()
    return pa.Table.from_pydict(
        {
            "url": pa.array(out["url"], type=pa.string()),
            "sent_id": pa.array(
                out["sid"].to_numpy(dtype=np.int64), type=pa.int64()
            ),
            "subj": pa.array(out["subj"], type=pa.string()),
            "pred": pa.array(out["pred"], type=pa.string()),
            "obj": pa.array(out["obj"], type=pa.string()),
        }
    )


def relation_evidence_from_tagged(
    tagged: ray.data.Dataset,
) -> ray.data.Dataset:
    """tagged sentences -> DISTINCT relation evidence rows
    (url, sent_id, subj, pred, obj) — the per-sentence PROVENANCE of every
    triple (which page and sentence asserted it), the lineage surface KG
    consumers audit. Block-local distinct, one grouped exchange, sorted."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ev = tagged.map_batches(
        _relations_evidence_partial, batch_format="pyarrow"
    )

    def one(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "one", pa.array([1] * len(batch), type=pa.int64())
        )

    keys = ["url", "sent_id", "subj", "pred", "obj"]
    distinct = grouped_sum(
        ev.map_batches(one, batch_format="pyarrow"), keys, sum_cols=["one"]
    ).select_columns(keys)
    return distinct.sort(keys)


def relation_partials_merged(tagged: ray.data.Dataset) -> ray.data.Dataset:
    """tagged sentences -> merged (but UNSORTED) triple aggregate rows —
    the input for downstream consumers that re-shuffle anyway (the 2-hop
    metapath join hash-partitions on the mid entity, so a pre-sort would
    be wasted work)."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    partial = tagged.map_batches(_relations_partial, batch_format="pyarrow")
    return grouped_sum(
        partial,
        ["subj", "pred", "obj"],
        sum_cols=["weight"],
        min_cols=["sample_url"],
    )


def relations_from_tagged(tagged: ray.data.Dataset) -> ray.data.Dataset:
    """tagged sentences -> (subj, pred, obj, weight, sample_url), deduped,
    sorted by (subj, pred, obj)."""
    return relation_partials_merged(tagged).sort(["subj", "pred", "obj"])
