"""Vocabulary builds (A1/A2): distributed counting, driver-side mapping.

Reference semantics re-expressed for Ray Data:
  - create_dico / create_mapping: /root/reference/utils.py:44-67 —
    deterministic ids ranked by (-freq, key);
  - word_mapping: /root/reference/loader.py:69-85 — optional lowercasing,
    <PAD> freq 10000001 and <UNK> 10000000 (=> ids 0 and 1), words with
    freq < 3 dropped;
  - char_mapping: /root/reference/loader.py:88-97 — <PAD> freq 10000000;
  - tag_mapping: /root/reference/loader.py:100-110 — START/STOP appended
    with freqs -1/-2 (=> last two ids).

Counting runs as vectorized per-block ``value_counts`` partials + a small
``groupby().sum`` shuffle; the final rank-sort happens driver-side because
contiguous ids require a global order and the vocab is tiny relative to the
corpus (SURVEY.md §2.5 A2).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

PAD = "<PAD>"
UNK = "<UNK>"
START_TAG = "<START>"
STOP_TAG = "<STOP>"


def create_mapping(dico: dict[str, int]) -> tuple[dict[str, int], dict[int, str]]:
    """(-freq, key)-ranked contiguous ids (utils.py:59-67)."""
    sorted_items = sorted(dico.items(), key=lambda x: (-x[1], x[0]))
    id_to_item = {i: k for i, (k, _) in enumerate(sorted_items)}
    item_to_id = {k: i for i, k in id_to_item.items()}
    return item_to_id, id_to_item


def _count_column(
    ds: ray.data.Dataset, fn, name: str
) -> dict[str, int]:
    """Generic two-phase distributed counter; fn: batch -> flat string array."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = fn(batch)
        vc = vals.value_counts()
        return pa.Table.from_pydict(
            {
                name: vc.field("values").cast(pa.string()),
                "freq": vc.field("counts").cast(pa.int64()),
            }
        )

    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    merged = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow"), [name], sum_cols=["freq"]
    )
    out: dict[str, int] = {}
    for b in merged.iter_batches(batch_format="pyarrow"):
        for k, v in zip(b.column(name).to_pylist(), b.column("freq").to_pylist()):
            out[k] = out.get(k, 0) + v
    return out


def word_mapping(
    sentences: ray.data.Dataset, lower: bool = True, min_freq: int = 3
) -> tuple[dict[str, int], dict[int, str]]:
    """Word vocab from sentence rows (tokens: list<string>)."""

    def words_of(batch: pa.Table) -> pa.Array:
        flat = pc.list_flatten(batch.column("tokens"))
        return pc.utf8_lower(flat) if lower else flat

    dico = _count_column(sentences, words_of, "word")
    dico = {k: v for k, v in dico.items() if v >= min_freq}
    dico[PAD] = 10000001
    dico[UNK] = 10000000
    return create_mapping(dico)


def augment_with_pretrained(
    dico: dict[str, int],
    pretrained: set[str],
    words: "ray.data.Dataset | list[str] | None" = None,
) -> tuple[dict[str, int], dict[str, int], dict[int, str]]:
    """J2 (loader.py:176-211 augment_with_pretrained): extend the word dico
    with pretrained-embedding words at freq 0 before ranking.

    ``words`` selects the augmentation set:
      * None — every pretrained word joins the dico;
      * a list (or a Dataset of sentence rows, reduced distributively to
        its distinct tokens first) — typically the dev/test words; a word
        joins iff any of [word, word.lower(), zero_digits(word.lower())]
        has a pretrained embedding (the reference's exact membership test).

    Returns (augmented_dico, word_to_id, id_to_word) like the reference.
    """
    import re

    dico = dict(dico)
    if words is None:
        for word in sorted(pretrained):
            if word not in dico:
                dico[word] = 0
    else:
        if isinstance(words, ray.data.Dataset):
            # distinct tokens via the distributed counter; only the small
            # distinct-word table reaches the driver
            def words_of(batch: pa.Table) -> pa.Array:
                return pc.list_flatten(batch.column("tokens"))

            words = sorted(_count_column(words, words_of, "word"))
        for word in words:
            if (
                any(
                    x in pretrained
                    for x in [
                        word,
                        word.lower(),
                        re.sub(r"\d", "0", word.lower()),
                    ]
                )
                and word not in dico
            ):
                dico[word] = 0
    word_to_id, id_to_word = create_mapping(dico)
    return dico, word_to_id, id_to_word


def char_mapping(
    sentences: ray.data.Dataset,
) -> tuple[dict[str, int], dict[int, str]]:
    """Char vocab (case preserved — loader.py:88-97 counts raw words).

    Per-block partial: one C-speed ``Counter`` over the concatenated block
    text (chars are too fine-grained for arrow value_counts to pay off).
    """
    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        s = "".join(pc.list_flatten(batch.column("tokens")).to_pylist())
        c = Counter(s)
        return pa.Table.from_pydict(
            {
                "char": pa.array(list(c.keys()), type=pa.string()),
                "freq": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    merged = grouped_sum(
        sentences.map_batches(partial, batch_format="pyarrow"),
        ["char"],
        sum_cols=["freq"],
    )
    dico: dict[str, int] = {}
    for b in merged.iter_batches(batch_format="pyarrow"):
        for k, v in zip(b.column("char").to_pylist(), b.column("freq").to_pylist()):
            dico[k] = dico.get(k, 0) + v
    dico[PAD] = 10000000
    return create_mapping(dico)


def tag_mapping_from_tagset(tags: list[str]) -> tuple[dict[str, int], dict[int, str]]:
    """Deterministic tag mapping from a fixed tag inventory: ids by
    (-freq=0 rank, name) then START/STOP last (loader.py:100-110 semantics
    with synthetic equal freqs)."""
    dico = {t: 1 for t in tags}
    dico[START_TAG] = -1
    dico[STOP_TAG] = -2
    return create_mapping(dico)


IOBES_TAGSET = ["O"] + [
    f"{p}-{t}" for p in "BIES" for t in ("LOC", "MISC", "ORG", "PER")
]


def word_and_char_mapping(
    sentences: ray.data.Dataset, lower: bool = True, min_freq: int = 3
) -> tuple[
    tuple[dict[str, int], dict[int, str]], tuple[dict[str, int], dict[int, str]]
]:
    """Word + char vocab in ONE pass over the sentence stream.

    The per-block partial emits both kinds of counts tagged by a ``kind``
    column; a single groupby-sum shuffle merges them; the driver splits and
    ranks. Halves the corpus reads of separate word_mapping/char_mapping.
    """
    from collections import Counter

    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    def partial(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(batch.column("tokens"))
        words = pc.utf8_lower(flat) if lower else flat
        vc = words.value_counts()
        w_keys = vc.field("values").to_pylist()
        w_freqs = vc.field("counts").to_pylist()
        c = Counter("".join(flat.to_pylist()))
        return pa.Table.from_pydict(
            {
                "kind": pa.array(
                    ["w"] * len(w_keys) + ["c"] * len(c), type=pa.string()
                ),
                "key": pa.array(w_keys + list(c.keys()), type=pa.string()),
                "freq": pa.array(
                    [int(f) for f in w_freqs] + list(c.values()), type=pa.int64()
                ),
            }
        )

    merged = grouped_sum(
        sentences.map_batches(partial, batch_format="pyarrow"),
        ["kind", "key"],
        sum_cols=["freq"],
    )
    w_dico: dict[str, int] = {}
    c_dico: dict[str, int] = {}
    for b in merged.iter_batches(batch_format="pyarrow"):
        for kind, k, v in zip(
            b.column("kind").to_pylist(),
            b.column("key").to_pylist(),
            b.column("freq").to_pylist(),
        ):
            d = w_dico if kind == "w" else c_dico
            d[k] = d.get(k, 0) + v
    w_dico = {k: v for k, v in w_dico.items() if v >= min_freq}
    w_dico[PAD] = 10000001
    w_dico[UNK] = 10000000
    c_dico[PAD] = 10000000
    return create_mapping(w_dico), create_mapping(c_dico)


def save_vocab(path: str, vocab: dict) -> None:
    """Persist the vocab state (the reference pickles its mappings for
    eval.py:52-62 to reload; json keeps it portable/inspectable). Saves the
    four forward maps; inverses rebuild on load."""
    import json

    with open(path, "w", encoding="utf-8") as f:
        json.dump(
            {
                "word_to_id": vocab["word_to_id"],
                "char_to_id": vocab["char_to_id"],
                "tag_to_id": vocab["tag_to_id"],
            },
            f,
        )


def load_vocab(path: str) -> dict:
    import json

    with open(path, encoding="utf-8") as f:
        d = json.load(f)
    out = {
        "word_to_id": d["word_to_id"],
        "char_to_id": d["char_to_id"],
        "tag_to_id": d["tag_to_id"],
    }
    out["id_to_word"] = {v: k for k, v in out["word_to_id"].items()}
    out["id_to_char"] = {v: k for k, v in out["char_to_id"].items()}
    out["id_to_tag"] = {v: k for k, v in out["tag_to_id"].items()}
    return out
