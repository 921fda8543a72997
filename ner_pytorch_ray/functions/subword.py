"""C7: subword tokenization + first-subword offset assignment.

Reference semantics (/root/reference/get_bert_embedding.py:59-63): each word
of a sentence is subword-tokenized; the word is assigned the index of its
FIRST subword in the sentence's subword stream, starting at 1 (position 0 is
the [CLS] token). Chunk embeddings then pool the subword embeddings
``emb[first : first + len(chunk_words)]`` (:103-121) — note the reference
pools a window of len-in-WORDS positions from the first word's first
subword; we replicate that exactly.

The BERT tokenizer is NOT available in this container. ``subword_tokenize``
is a clearly-marked deterministic stand-in (greedy <=4-char alpha/digit
pieces, punctuation singletons — the same family as the BPE-ish counter in
pipelines/analysis.py) chosen to be ANSI-SQL-expressible:
``regexp_extract_all(word, '[a-z]{1,4}|[0-9]{1,4}|[^a-z0-9]')`` yields the
identical piece list, so the driver's DuckDB oracle can verify offsets.
A real WordPiece backend would slot in behind the same two functions.
"""

from __future__ import annotations

import re

import numpy as np

_PIECE_RE = re.compile(r"[a-z]{1,4}|[0-9]{1,4}|[^a-z0-9]")


def subword_tokenize(word: str) -> list[str]:
    """Deterministic subword pieces of one (lower-case) word."""
    return _PIECE_RE.findall(word)


def first_subword_offsets(tokens: list[str]) -> tuple[list[int], list[int]]:
    """(first_subword_index, n_subwords) per word; indices start at 1
    (position 0 = [CLS]), exactly get_bert_embedding.py:59-63."""
    starts: list[int] = []
    counts: list[int] = []
    start = 1
    for w in tokens:
        n = len(subword_tokenize(w))
        starts.append(start)
        counts.append(n)
        start += n
    return starts, counts


def chunk_subword_embedding(
    first_index: int,
    n_chunk_words: int,
    sub_emb: np.ndarray,
    pooling: str = "mean",
) -> np.ndarray:
    """Pool a chunk's embedding from the sentence subword-embedding matrix
    ``sub_emb`` ([1 + n_subwords, dim], row 0 = [CLS]) with the reference's
    window rule (:110-121): single-word chunks take the first subword's row;
    multi-word chunks pool ``len(chunk_words)`` rows from the first word's
    first subword (NOT the chunk's true subword span — reference parity)."""
    if n_chunk_words == 1:
        return sub_emb[first_index]
    window = sub_emb[first_index : first_index + n_chunk_words]
    if pooling == "max":
        return window.max(axis=0)
    if pooling == "mean":
        return window.mean(axis=0)
    return sub_emb[first_index]
