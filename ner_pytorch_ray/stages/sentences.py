"""Sentence stage: page text -> one row per sentence, fully vectorized.

Replaces the reference's ``load_sentences`` blank-line splitter
(loader.py:21-42) for web pages: a page's text is one sentence per line;
tokens are space-separated. All splitting uses Arrow kernels
(``pc.split_pattern``) — no Python loop over rows — and sentence identity is
carried as ``(url, sent_id)`` key columns, never block order
(SURVEY.md §2.10 ordering contract).

Output schema: url:string, sent_id:int64, lang:string, tokens:list<string>.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ner_pytorch_ray.functions.textnorm import zero_digits


def _split_sentences(batch: pa.Table, zeros: bool) -> pa.Table:
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    # digit->0 normalization (reference loader.py:29, applied per line);
    # vectorized Arrow regex — semantics identical to re.sub('\d','0',s)
    if zeros:
        text = pc.replace_substring_regex(text, pattern=r"\d", replacement="0")

    sent_lists = pc.split_pattern(text, pattern="\n")  # list<large_string>
    lens = pc.list_value_length(sent_lists).to_numpy().astype(np.int64)

    urls = batch.column("url")
    langs = batch.column("lang") if "lang" in batch.schema.names else None

    row_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    offsets = np.zeros(len(batch) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    sent_id = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
        offsets[:-1], lens
    )

    flat_sents = pc.list_flatten(sent_lists)
    tokens = pc.split_pattern(flat_sents, pattern=" ")

    cols = {
        "url": pc.take(urls, pa.array(row_idx)),
        "sent_id": pa.array(sent_id),
        "tokens": tokens,
    }
    if langs is not None:
        cols["lang"] = pc.take(langs, pa.array(row_idx))
    out = pa.Table.from_pydict(cols)
    # drop empty sentences (reference processor.py:60-61 empty-guard)
    mask = pc.and_(
        pc.greater(pc.list_value_length(out.column("tokens")), 0),
        pc.not_equal(flat_sents, ""),
    )
    return out.filter(mask)


def sentences_stage(
    ds: ray.data.Dataset, zeros: bool = True
) -> ray.data.Dataset:
    """text -> sentence rows (url, sent_id, tokens[, lang])."""
    return ds.map_batches(
        lambda b: _split_sentences(b, zeros), batch_format="pyarrow"
    )
