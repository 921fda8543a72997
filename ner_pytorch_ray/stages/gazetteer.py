"""Gazetteer mention tagger — a deterministic, SQL-oracle-able tagger stage.

The engine supports two tagger backends behind the same stage contract
(sentences ``(url, sent_id, tokens)`` -> ``+ tags: list<string>`` in IOBES):

  * this gazetteer (dictionary) tagger — fully vectorized, deterministic,
    used by the flagship documents-derived pipeline so that the emitted
    mentions/triples are exactly reproducible in ANSI SQL (the driver's
    DuckDB correctness gate), and
  * the BiLSTM-CRF tagger actor pool (stages/tagger.py) — the neural
    analog of the reference model (model.py:34-219, crf.py:91-135),
    parity-tested against a single-process oracle.

The gazetteer plays the role of the reference's alias table / word-bank
exact-match path (word_rep.py:151-153, J4 in SURVEY.md §2.4).

Tagging is numpy-vectorized over the flattened token values of the whole
Arrow batch — no Python loop over rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# Frozen gazetteer over the synthetic web-text vocabulary. Surfaces are
# lower-case; matching is exact (the corpus is already lower-case).
GAZETTEER: dict[str, tuple[str, str]] = {
    "spark": ("ORG", "org:spark"),
    "customer": ("PER", "per:customer"),
    "stream": ("LOC", "loc:stream"),
    "table": ("LOC", "loc:table"),
    "vector": ("MISC", "misc:vector"),
}
# Multi-token surfaces (first tokens deliberately NOT unigram entities, so
# matches are always disjoint and greedy == exhaustive).
BIGRAMS: dict[tuple[str, str], tuple[str, str]] = {
    ("hash", "join"): ("ORG", "org:hash_join"),
}


def entity_for_surface(surface: str) -> tuple[str, str] | None:
    """(tag_type, entity_id) for a lower-case surface form, else None."""
    toks = tuple(surface.split(" "))
    if len(toks) == 1:
        return GAZETTEER.get(toks[0])
    return BIGRAMS.get(toks)


def _tag_batch(batch: pa.Table) -> pa.Table:
    """Dictionary-encode the batch's tokens once, then match on int codes —
    no per-word string comparison over the flattened values."""
    tokens = batch.column("tokens")
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    flat = pc.list_flatten(tokens)
    lens = pc.list_value_length(tokens).to_numpy().astype(np.int64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])

    enc = flat.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    uniq = enc.dictionary.to_pylist()  # small: batch-local vocab
    codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
    n = len(codes)
    code_of = {w: k for k, w in enumerate(uniq)}

    # tag table: 0 = 'O'; per gazetteer entry two ids (S- / B-,E-)
    tag_strings = ["O"]
    tag_idx = np.zeros(n, dtype=np.int32)

    # sentence-end boundary mask: True where position i and i+1 are in the
    # same sentence
    same_sent = np.ones(n, dtype=bool)
    if n:
        same_sent[offsets[1:] - 1] = False  # last token of each sentence

    # bigram matches first (span starts)
    for (w1, w2), (typ, _eid) in BIGRAMS.items():
        c1, c2 = code_of.get(w1), code_of.get(w2)
        if c1 is None or c2 is None or n == 0:
            continue
        m1 = codes == c1
        m2 = np.zeros(n, dtype=bool)
        m2[:-1] = codes[1:] == c2
        idx = np.nonzero(m1 & m2 & same_sent)[0]
        if len(idx):
            b_id = len(tag_strings)
            tag_strings += [f"B-{typ}", f"E-{typ}"]
            tag_idx[idx] = b_id
            tag_idx[idx + 1] = b_id + 1

    # unigrams (never overlap bigrams by construction)
    for w, (typ, _eid) in GAZETTEER.items():
        c = code_of.get(w)
        if c is None:
            continue
        hit = (codes == c) & (tag_idx == 0)
        if hit.any():
            s_id = len(tag_strings)
            tag_strings.append(f"S-{typ}")
            tag_idx[hit] = s_id

    flat_tags = pc.take(
        pa.array(tag_strings, type=pa.string()), pa.array(tag_idx)
    )
    tag_arr = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()).cast(pa.int32()), flat_tags
    )
    return batch.append_column("tags", tag_arr)


def gazetteer_tag_stage(ds: ray.data.Dataset) -> ray.data.Dataset:
    """sentences -> + tags (IOBES), vectorized dictionary matching."""
    return ds.map_batches(_tag_batch, batch_format="pyarrow")
