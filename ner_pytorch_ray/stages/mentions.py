"""Mention extraction: tagged sentences -> one row per entity mention (C1).

Span semantics are exactly conlleval's chunk algebra
(/root/reference/conlleval.py:44-82; used by word_rep.py:126-161 including
the trailing-entity sentinel) — but vectorized: tags are dictionary-encoded
once per batch and all start/end predicates run as numpy int ops over the
flattened tag values. A hypothesis test pins this against the pure
per-sentence ``extract_spans``.

Output schema: url, sent_id, mention_id:int64, begin:int32, end:int32,
tag_type:string, surface:string (lower-cased space-joined tokens — the
reference's chunk key, word_rep.py:123).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# prefix classes
_O, _B, _I, _E, _S = 0, 1, 2, 3, 4
_PFX_CODE = {"O": _O, "B": _B, "I": _I, "E": _E, "S": _S}


def _encode_tag_vocab(uniq: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Per unique tag string: (prefix class, type id). Tiny python loop."""
    pfx = np.empty(len(uniq), dtype=np.int8)
    type_names: dict[str, int] = {}
    typ = np.empty(len(uniq), dtype=np.int32)
    for k, t in enumerate(uniq):
        if t == "O":
            pfx[k] = _O
            typ[k] = -1
            continue
        p, _, rest = t.partition("-")
        pfx[k] = _PFX_CODE.get(p, _O)
        if pfx[k] == _O:
            typ[k] = -1
        else:
            typ[k] = type_names.setdefault(rest, len(type_names))
    return pfx, typ


def vectorized_spans(
    flat_tags: pa.Array, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, list[str]]:
    """Conlleval-exact span extraction over flattened per-sentence tags.

    Returns (begin_idx, end_idx, sent_of_span) in *flat* coordinates plus the
    unique-tag list for surface typing (type of a span = type at its first
    position, matching word_rep.py:144 which types the chunk by its last
    row's tag — equal for well-formed chunks; for type-switch boundaries
    conlleval starts a new chunk so first==last within our spans).
    """
    enc = flat_tags.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
    pfx_of, typ_of = _encode_tag_vocab(uniq)
    pfx = pfx_of[codes]
    typ = typ_of[codes]
    n = len(codes)

    prev_pfx = np.empty(n, dtype=np.int8)
    prev_typ = np.empty(n, dtype=np.int32)
    if n:
        prev_pfx[1:] = pfx[:-1]
        prev_typ[1:] = typ[:-1]
        prev_pfx[0] = _O
        prev_typ[0] = -1
        starts_of_sents = offsets[:-1]
        sos = starts_of_sents[(starts_of_sents >= 0) & (starts_of_sents < n)]
        prev_pfx[sos] = _O
        prev_typ[sos] = -1

    nonO = pfx != _O
    prevO = prev_pfx == _O
    # is_chunk_start (conlleval.py:66-81)
    is_start = nonO & (
        prevO
        | (prev_typ != typ)
        | (pfx == _B)
        | (pfx == _S)
        | (prev_pfx == _E)
        | (prev_pfx == _S)
    )

    # chunk-closing positions: O positions, new starts, sentence starts
    isO = ~nonO
    break_mask = is_start | isO
    break_pos = np.nonzero(break_mask)[0]
    all_breaks = np.union1d(break_pos, offsets)  # offsets include n at end

    begin = np.nonzero(is_start)[0]
    loc = np.searchsorted(all_breaks, begin, side="right")
    end = all_breaks[loc] if len(begin) else np.empty(0, dtype=np.int64)
    sent_of = np.searchsorted(offsets, begin, side="right") - 1
    return begin, end, sent_of, [uniq[c] for c in codes[begin]] if len(begin) else []


def _mentions_batch(batch: pa.Table) -> pa.Table:
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
    flat_toks_arr = pc.list_flatten(tokens)
    if isinstance(flat_toks_arr, pa.ChunkedArray):
        flat_toks_arr = flat_toks_arr.combine_chunks()

    begin, end, sent_of, start_tags = vectorized_spans(flat_tags, offsets)

    urls = batch.column("url")
    sent_ids = batch.column("sent_id")

    n_sp = len(begin)
    sent_begin = offsets[sent_of] if n_sp else np.empty(0, dtype=np.int64)
    # surface build: vectorized lower+take for 1-token spans (the common
    # case); python join only for the multi-token minority
    if n_sp:
        span_len = end - begin
        first_tok = pc.utf8_lower(pc.take(flat_toks_arr, pa.array(begin)))
        surfaces = np.asarray(first_tok, dtype=object)
        multi = np.nonzero(span_len > 1)[0]
        if len(multi):
            # one gather of exactly the multi-span tokens, then join
            all_idx = np.concatenate(
                [np.arange(begin[i], end[i]) for i in multi]
            )
            toks = pc.utf8_lower(
                pc.take(flat_toks_arr, pa.array(all_idx))
            ).to_pylist()
            pos = 0
            for i in multi:
                ln = int(span_len[i])
                surfaces[i] = " ".join(toks[pos:pos + ln])
                pos += ln
        surfaces = surfaces.tolist()
    else:
        surfaces = []
    tag_types = [t.partition("-")[2] for t in start_tags]

    # mention_id: ordinal within sentence
    mention_id = np.zeros(n_sp, dtype=np.int64)
    if n_sp:
        same = np.zeros(n_sp, dtype=np.int64)
        same[1:] = (sent_of[1:] == sent_of[:-1]).astype(np.int64)
        # running count within runs of equal sent_of
        run_start = np.nonzero(same == 0)[0]
        idx = np.arange(n_sp, dtype=np.int64)
        mention_id = idx - np.repeat(run_start, np.diff(np.append(run_start, n_sp)))

    return pa.Table.from_pydict(
        {
            "url": pc.take(urls, pa.array(sent_of)),
            "sent_id": pc.take(sent_ids, pa.array(sent_of)),
            "mention_id": pa.array(mention_id),
            "begin": pa.array((begin - sent_begin).astype(np.int32)),
            "end": pa.array((end - sent_begin).astype(np.int32)),
            "tag_type": pa.array(tag_types, type=pa.string()),
            "surface": pa.array(surfaces, type=pa.string()),
        }
    )


def mentions_stage(ds: ray.data.Dataset) -> ray.data.Dataset:
    """tagged sentences -> mention rows. Mentions of one sentence stay
    contiguous within a block (downstream pair generation relies on this)."""
    return ds.map_batches(_mentions_batch, batch_format="pyarrow")
