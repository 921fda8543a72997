"""S6: the tag-embedding sink (get_bert_embedding.py:83-139) — per distinct
(tag_type, surface), the pooled subword embedding of its chunk occurrences.

The reference runs each sentence through BERT, pools each entity chunk's
embedding with the first-subword window rule (C7, functions/subword.py) and
appends it to ``map_tag_to_embed[tag_type][surface]``; the saved bank
averages the occurrence list. BERT is unavailable here: the subword
embedding is the deterministic pseudo-GloVe of the piece string ([CLS] row
zero), so the OFFSET/POOLING/SINK machinery — what this module owns — is
exercised for real and reproducibly; a real encoder slots in behind
``piece_embedding``.

Scale shape: one map_batches pass emits per-occurrence chunk rows with a
block-local partial sum per (tag_type, surface) — the shuffle moves one
(vec-bytes, count) partial per key per block, never occurrence rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ner_pytorch_ray.functions.spans import extract_spans
from ner_pytorch_ray.functions.subword import (
    chunk_subword_embedding,
    first_subword_offsets,
    subword_tokenize,
)
from ner_pytorch_ray.sources.glove import pseudo_glove


def piece_embedding(pieces: list[str], dim: int) -> np.ndarray:
    """[n_pieces, dim] deterministic per-piece vectors (BERT stand-in)."""
    wv = pseudo_glove(sorted(set(pieces)), dim=dim)
    return np.stack([wv[p] for p in pieces]) if pieces else np.zeros((0, dim))


def resolve_embedding_backend(backend: str):
    """T8 backend seam (mirrors stages/parser.ParserActor's ``backend=``):
    ``"pseudo"`` = the deterministic per-piece vectors above; ``"bert"`` =
    the reference's real encoder (get_bert_embedding.py:24-132) — torch
    is not in this container, so it raises a clearly-marked stub error.
    The offset/pooling/sink machinery is backend-agnostic: a real encoder
    slots in as this one constructor-level choice."""
    if backend == "pseudo":
        return piece_embedding
    if backend == "bert":
        raise NotImplementedError(
            "backend='bert' needs torch+transformers (reference "
            "get_bert_embedding.py:24-132); unavailable in this container — "
            "use backend='pseudo'"
        )
    raise ValueError(f"unknown embedding backend {backend!r}")


def sentence_subword_matrix(
    tokens: list[str], dim: int, backend: str = "pseudo"
) -> np.ndarray:
    """[1 + n_subwords, dim]: row 0 = [CLS] (zeros), then every word's
    pieces in order — the matrix the offset rule (C7) indexes into."""
    pieces = [p for w in tokens for p in subword_tokenize(w)]
    emb = resolve_embedding_backend(backend)(pieces, dim)
    return np.vstack([np.zeros((1, dim), dtype=emb.dtype), emb])


def chunk_rows(
    tokens: list[str],
    tags: list[str],
    dim: int,
    pooling: str,
    backend: str = "pseudo",
):
    """Per entity chunk: (tag_type, lower surface, pooled vec)."""
    spans = extract_spans(tags)
    if not spans:
        return []
    starts, _ = first_subword_offsets(tokens)
    sub = sentence_subword_matrix(tokens, dim, backend)
    out = []
    for sp in spans:
        first = starts[sp.begin]
        n_words = sp.end - sp.begin
        vec = chunk_subword_embedding(first, n_words, sub, pooling)
        surface = " ".join(tokens[sp.begin : sp.end]).lower()
        out.append((sp.type, surface, vec.astype(np.float64)))
    return out


def vec_billionths(vec: np.ndarray) -> np.ndarray:
    """Quantize a chunk vector to integer billionths (int64). Integer sums
    are associative/commutative, so the distributed occurrence mean is
    bit-identical under ANY partitioning / collect order — float partials
    rounded at the end are NOT (a value near a 5e-7 boundary can flip the
    last rounded digit under a different summation order)."""
    return np.round(vec * 1e9).astype(np.int64)


def mean_from_billionths(total: np.ndarray, n: int) -> np.ndarray:
    """Finalize: scaled-integer total -> float mean rounded to 6 decimals
    (one deterministic float op per element, no order dependence)."""
    return np.round(total / 1e9 / n, 6)


def tag_embedding_table(
    sf_dir: str, dim: int = 16, pooling: str = "mean", backend: str = "pseudo"
) -> ray.data.Dataset:
    """The distributed sink: tagged sentences -> one row per distinct
    (tag_type, surface) with the MEAN pooled chunk embedding over all its
    occurrences and the occurrence count. Output columns: tag_type,
    surface, n_occurrences, embedding. Occurrence vectors accumulate in
    INTEGER billionths (``vec_billionths``) so the mean is
    summation-order-independent — exact under the driver's bit-exact
    oracle gate regardless of partitioning."""
    from ner_pytorch_ray.sources.pages import pages_from_documents
    from ner_pytorch_ray.stages.extract import extract_stage
    from ner_pytorch_ray.stages.gazetteer import gazetteer_tag_stage
    from ner_pytorch_ray.stages.sentences import sentences_stage
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    resolve_embedding_backend(backend)  # fail fast on stub backends

    tagged = gazetteer_tag_stage(
        sentences_stage(extract_stage(pages_from_documents(sf_dir)), zeros=True)
    )

    def partials(batch: pa.Table) -> pa.Table:
        tokens = batch.column("tokens").to_pylist()
        tags = batch.column("tags").to_pylist()
        acc: dict[tuple[str, str], list] = {}
        for toks, tgs in zip(tokens, tags):
            for t, s, vec in chunk_rows(toks, tgs, dim, pooling, backend):
                iv = vec_billionths(vec)
                st = acc.get((t, s))
                if st is None:
                    acc[(t, s)] = [iv, 1]
                else:
                    st[0] = st[0] + iv
                    st[1] += 1
        keys = sorted(acc)
        return pa.Table.from_pydict(
            {
                "tag_type": pa.array([k[0] for k in keys], type=pa.string()),
                "surface": pa.array([k[1] for k in keys], type=pa.string()),
                "vec": pa.array(
                    [acc[k][0].astype("<i8").tobytes() for k in keys],
                    type=pa.binary(),
                ),
                "n": pa.array([acc[k][1] for k in keys], type=pa.int64()),
            }
        )

    part = tagged.map_batches(partials, batch_format="pyarrow")
    collected = collect_tuples(
        part, ["tag_type", "surface"], ["vec", "n"], shuffle_blocks="auto"
    )
    empty = pa.schema(
        [
            ("tag_type", pa.string()),
            ("surface", pa.string()),
            ("n_occurrences", pa.int64()),
            ("embedding", pa.list_(pa.float64())),
        ]
    )

    def finalize(key, items) -> pa.Table:
        if items is None or not items:
            return empty.empty_table()
        t, s = key
        total = np.zeros(dim, dtype=np.int64)
        n = 0
        for vec_bytes, cnt in items:
            total = total + np.frombuffer(vec_bytes, dtype="<i8")
            n += int(cnt)
        mean = mean_from_billionths(total, n)
        return pa.Table.from_pydict(
            {
                "tag_type": pa.array([t], type=pa.string()),
                "surface": pa.array([s], type=pa.string()),
                "n_occurrences": pa.array([n], type=pa.int64()),
                "embedding": pa.array([mean.tolist()], type=pa.list_(pa.float64())),
            }
        )

    return flat_map_groups(
        collected, finalize, ["tag_type", "surface"], items_col="items"
    )
