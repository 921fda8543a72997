"""Encode stage (M5): tokens -> word ids / char ids / caps, with broadcast
vocab mappings.

Reference semantics: /root/reference/loader.py:131-174 (prepare_dataset /
prepare_sentence): word id = mapping[lower(w) if lower else w] with <UNK>
fallback; chars unknown to the vocab are silently dropped (loader.py:162-163);
caps = cap_feature (loader.py:113-128).

The mappings are small read-only dicts shipped once per task via the
captured closure (Ray serializes the UDF once per stage, not per batch) —
the broadcast-small-side pattern (SURVEY.md §2.4 J1/J2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ner_pytorch_ray.functions.textnorm import cap_feature
from ner_pytorch_ray.state.vocab import UNK


def make_encode_fn(
    word_to_id: dict[str, int], char_to_id: dict[str, int], lower: bool = True
):
    unk_id = word_to_id[UNK]

    def _encode(batch: pa.Table) -> pa.Table:
        tokens = batch.column("tokens")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        lens = pc.list_value_length(tokens).to_numpy().astype(np.int64)
        offsets = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        flat = pc.list_flatten(tokens).to_pylist()

        # dictionary-encode per batch: resolve each *unique* token once
        uniq: dict[str, int] = {}
        codes = np.empty(len(flat), dtype=np.int64)
        for i, t in enumerate(flat):
            code = uniq.get(t)
            if code is None:
                code = len(uniq)
                uniq[t] = code
            codes[i] = code

        uniq_tokens = list(uniq.keys())
        wid_of = np.empty(len(uniq_tokens), dtype=np.int64)
        caps_of = np.empty(len(uniq_tokens), dtype=np.int8)
        chars_of: list[list[int]] = []
        for k, t in enumerate(uniq_tokens):
            key = t.lower() if lower else t
            wid_of[k] = word_to_id.get(key, unk_id)
            caps_of[k] = cap_feature(t) if t else 0
            chars_of.append([char_to_id[c] for c in t if c in char_to_id])

        word_ids = wid_of[codes]
        caps = caps_of[codes]
        char_ids = [chars_of[c] for c in codes]

        off32 = pa.array(offsets, type=pa.int64()).cast(pa.int32())
        out = batch.append_column(
            "word_ids",
            pa.ListArray.from_arrays(off32, pa.array(word_ids, type=pa.int32())),
        )
        out = out.append_column(
            "caps", pa.ListArray.from_arrays(off32, pa.array(caps, type=pa.int8()))
        )
        out = out.append_column(
            "char_ids",
            pa.ListArray.from_arrays(
                off32, pa.array(char_ids, type=pa.list_(pa.int32()))
            ),
        )
        return out

    return _encode


def encode_stage(
    sentences: ray.data.Dataset,
    word_to_id: dict[str, int],
    char_to_id: dict[str, int],
    lower: bool = True,
) -> ray.data.Dataset:
    return sentences.map_batches(
        make_encode_fn(word_to_id, char_to_id, lower), batch_format="pyarrow"
    )
