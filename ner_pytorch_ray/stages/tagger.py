"""BiLSTM-CRF tagger stage (T1/T2): an actor pool holding the frozen model.

Ray-Data form of the reference's tagger inference (model.py:189-214 forward
+ crf.py:91-135 Viterbi): a callable CLASS passed to ``map_batches`` — the
model weights load once per actor in ``__init__`` (from an npz path or a
``ray.put`` ref), each ``__call__`` decodes one Arrow batch.

Intra-batch length-sorting (reference loader.py:239 / eval.py:122, M8)
cuts padding waste; outputs are re-aligned to input order before emit, so
row order is preserved exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ner_pytorch_ray.state.model import NumpyBiLSTMCRF, load_weights


class TaggerActor:
    def __init__(self, weights, id_to_tag: dict[int, str]):
        if isinstance(weights, ray.ObjectRef):
            weights = ray.get(weights)
        if isinstance(weights, str):
            weights = load_weights(weights)
        self.model = NumpyBiLSTMCRF(weights)
        self.id_to_tag = {int(k): v for k, v in id_to_tag.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        word_ids_col = batch.column("word_ids")
        char_ids_col = batch.column("char_ids")
        word_ids = word_ids_col.to_pylist()
        char_ids = char_ids_col.to_pylist()
        n = len(word_ids)
        if n == 0:
            return batch.append_column(
                "tags", pa.array([], type=pa.list_(pa.string()))
            )

        # sort by length desc (pad-waste reduction), decode, un-sort
        order = sorted(range(n), key=lambda i: -len(word_ids[i]))
        paths_sorted = self.model.decode(
            [word_ids[i] for i in order], [char_ids[i] for i in order]
        )
        paths: list[list[str]] = [None] * n  # type: ignore[list-item]
        for rank, i in enumerate(order):
            paths[i] = [self.id_to_tag[t] for t in paths_sorted[rank]]
        return batch.append_column(
            "tags", pa.array(paths, type=pa.list_(pa.string()))
        )


def tagger_stage(
    encoded: ray.data.Dataset,
    weights,
    id_to_tag: dict[int, str],
    concurrency: int | tuple[int, int] = (1, 64),
    batch_size: int = 256,
    num_gpus: float = 0,
) -> ray.data.Dataset:
    """encoded sentences -> + tags (IOBES strings) via the actor pool.

    ``num_gpus`` reserves GPU fractions per actor (the reference runs the
    tagger on CUDA, train.py:165-166); the numpy backend ignores the device
    but the scheduling plumbing is the same one a CUDA backend would use.
    Default 0 = CPU-only, identical numerics."""
    weights_ref = (
        weights if isinstance(weights, (str, ray.ObjectRef)) else ray.put(weights)
    )
    extra = {"num_gpus": num_gpus} if num_gpus else {}
    return encoded.map_batches(
        TaggerActor,
        fn_constructor_args=(weights_ref, id_to_tag),
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
        **extra,
    )


class NllActor:
    """T3: per-sentence CRF negative log-likelihood of the row's own tags
    (crf.py:47-65 loss, avg=False) — the ranking signal of the reference's
    dynamic inference (train.py:383-395). Same actor-pool shape as the
    tagger: weights once per actor, masked batch DP per call."""

    def __init__(self, weights, tag_to_id: dict[str, int]):
        if isinstance(weights, ray.ObjectRef):
            weights = ray.get(weights)
        if isinstance(weights, str):
            weights = load_weights(weights)
        self.model = NumpyBiLSTMCRF(weights)
        self.tag_to_id = dict(tag_to_id)

    def __call__(self, batch: pa.Table) -> pa.Table:
        word_ids = batch.column("word_ids").to_pylist()
        char_ids = batch.column("char_ids").to_pylist()
        tags = batch.column("tags").to_pylist()
        if not word_ids:
            return batch.append_column("nll", pa.array([], type=pa.float64()))
        tag_ids = [[self.tag_to_id[t] for t in ts] for ts in tags]
        # per-sentence (batch=1) compute: float32 GEMM is SHAPE-dependent
        # (~1e-7), so batched features would make the scalar depend on
        # batch composition and fail the frozen-oracle gate. Scoring is a
        # verification-grade path: bit-reproducibility beats the ~2x GEMM
        # batching win here (decode keeps batched features — argmax is
        # robust to 1e-7). Rounding stays as a documentation of precision.
        vals = np.array(
            [
                float(self.model.nll([w], [c], [t])[0])
                for w, c, t in zip(word_ids, char_ids, tag_ids)
            ],
            dtype=np.float64,
        )
        vals = np.round(vals, 4)
        return batch.append_column("nll", pa.array(vals, type=pa.float64()))


def nll_stage(
    encoded: ray.data.Dataset,
    weights,
    tag_to_id: dict[str, int],
    concurrency: int | tuple[int, int] = (1, 64),
    batch_size: int = 256,
    num_gpus: float = 0,
) -> ray.data.Dataset:
    """encoded+tagged sentences -> + nll (float64) via the actor pool.
    ``num_gpus`` as in :func:`tagger_stage` (0 = CPU, same numerics)."""
    weights_ref = (
        weights if isinstance(weights, (str, ray.ObjectRef)) else ray.put(weights)
    )
    extra = {"num_gpus": num_gpus} if num_gpus else {}
    return encoded.map_batches(
        NllActor,
        fn_constructor_args=(weights_ref, tag_to_id),
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
        **extra,
    )
