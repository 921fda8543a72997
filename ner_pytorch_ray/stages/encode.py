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


def insert_singletons_stage(
    encoded: ray.data.Dataset,
    singleton_ids: set[int],
    unk_id: int = 1,
    p: float = 0.5,
    seed: int = 0,
) -> ray.data.Dataset:
    """M6 (utils.py:145-155, inlined loader.py:228-232): train-time
    augmentation replacing singleton word ids with <UNK> with probability
    ``p``. The reference draws from an unseeded global RNG; here every draw
    is keyed by (url, sent_id, position, seed) so distributed re-execution
    and retries reproduce bit-identically (SURVEY §4)."""
    import hashlib

    sing = np.array(sorted(singleton_ids), dtype=np.int64)

    def aug(batch: pa.Table) -> pa.Table:
        wids = batch.column("word_ids")
        if isinstance(wids, pa.ChunkedArray):
            wids = wids.combine_chunks()
        lens = pc.list_value_length(wids).to_numpy().astype(np.int64)
        offsets = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        flat = np.asarray(
            pc.list_flatten(wids).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        ).copy()

        urls = batch.column("url").to_pylist()
        sids = batch.column("sent_id").to_pylist()
        is_sing = np.isin(flat, sing)
        for r in range(len(lens)):
            lo, hi = offsets[r], offsets[r + 1]
            idx = np.nonzero(is_sing[lo:hi])[0]
            if not len(idx):
                continue
            h = hashlib.blake2b(
                f"{urls[r]}|{sids[r]}|{seed}".encode(), digest_size=8
            ).digest()
            rng = np.random.RandomState(int.from_bytes(h[:4], "little"))
            draws = rng.rand(hi - lo)
            flat[lo + idx[draws[idx] < p]] = unk_id

        out32 = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int64()).cast(pa.int32()),
            pa.array(flat, type=pa.int32()),
        )
        i = batch.schema.get_field_index("word_ids")
        return batch.set_column(i, "word_ids", out32)

    return encoded.map_batches(aug, batch_format="pyarrow")
