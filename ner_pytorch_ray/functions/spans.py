"""Span (chunk) algebra over IOB2/IOBES tag sequences.

Reference semantics:
  - split_tag / is_chunk_end / is_chunk_start: /root/reference/conlleval.py:33-82
  - chunk extraction incl. the trailing-entity sentinel path:
    /root/reference/word_rep.py:126-161 (create_tag_chunks) and
    /root/reference/word_rep.py:291-334 (create_adv_examples segmentation).

``extract_spans`` is the engine's C1 operator (SURVEY.md §2.8): a pure
function ``tags -> [Span(begin, end, type)]`` used by the mention stage's
``flat_map``. It is partition-consistent by construction (depends only on the
tag list of one sentence).
"""

from __future__ import annotations

from dataclasses import dataclass


def split_tag(chunk_tag: str) -> tuple[str, str | None]:
    """'B-PER' -> ('B', 'PER'); 'O' -> ('O', None). conlleval.py:33-42."""
    if chunk_tag == "O":
        return ("O", None)
    parts = chunk_tag.split("-", 1)
    if len(parts) == 1:
        return (parts[0], None)
    return (parts[0], parts[1])


def is_chunk_end(prev_tag: str, tag: str) -> bool:
    """Did a chunk end between prev_tag and tag? conlleval.py:44-63."""
    prefix1, type1 = split_tag(prev_tag)
    prefix2, type2 = split_tag(tag)
    if prefix1 == "O":
        return False
    if prefix2 == "O":
        return prefix1 != "O"
    if type1 != type2:
        return True
    return prefix2 in ("B", "S") or prefix1 in ("E", "S")


def is_chunk_start(prev_tag: str, tag: str) -> bool:
    """Did a chunk start between prev_tag and tag? conlleval.py:66-81."""
    prefix1, type1 = split_tag(prev_tag)
    prefix2, type2 = split_tag(tag)
    if prefix2 == "O":
        return False
    if prefix1 == "O":
        return prefix2 != "O"
    if type1 != type2:
        return True
    return prefix2 in ("B", "S") or prefix1 in ("E", "S")


@dataclass(frozen=True)
class Span:
    begin: int  # token index, inclusive
    end: int  # token index, exclusive
    type: str


def extract_spans(tags: list[str]) -> list[Span]:
    """Extract entity spans from an IOB2/IOBES tag sequence.

    Mirrors the reference's chunk walk (word_rep.py:126-161), including the
    sentinel behavior: a sentence ending inside an entity still closes that
    final chunk (the reference appends ``['.','_','_','O']``; we simply flush
    at end of sequence — identical span output).
    """
    spans: list[Span] = []
    prev = "O"
    start: int | None = None
    for i, tag in enumerate(tags):
        if start is not None and is_chunk_end(prev, tag):
            _, t = split_tag(prev)
            spans.append(Span(start, i, t or ""))
            start = None
        if start is None and is_chunk_start(prev, tag):
            start = i
        prev = tag
    if start is not None:
        _, t = split_tag(prev)
        spans.append(Span(start, len(tags), t or ""))
    return spans
