"""Pure, deterministic scalar/sequence functions (no Ray, no state).

These are the byte-identical contracts of the engine: text normalization,
tag-scheme conversion, span algebra, conlleval counters. Everything here is
unit-tested against the reference semantics (see docstring citations).
"""

from ner_pytorch_ray.functions.textnorm import (
    zero_digits,
    unicode_to_ascii,
    cap_feature,
)
from ner_pytorch_ray.functions.tagscheme import (
    iob2,
    iob_iobes,
    iobes_iob,
    update_tag_scheme,
)
from ner_pytorch_ray.functions.spans import (
    split_tag,
    is_chunk_start,
    is_chunk_end,
    extract_spans,
    Span,
)
from ner_pytorch_ray.functions.conlleval import (
    ChunkCounts,
    count_chunks,
    calc_metrics,
    evaluate_counts,
)

__all__ = [
    "zero_digits",
    "unicode_to_ascii",
    "cap_feature",
    "iob2",
    "iob_iobes",
    "iobes_iob",
    "update_tag_scheme",
    "split_tag",
    "is_chunk_start",
    "is_chunk_end",
    "extract_spans",
    "Span",
    "ChunkCounts",
    "count_chunks",
    "calc_metrics",
    "evaluate_counts",
]
